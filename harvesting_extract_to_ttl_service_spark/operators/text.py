"""Text-analysis operators for large-scale training-data pipelines
(SURVEY.md §2C extension surface; no reference counterpart — the reference
only scrubs U+FFFD chars, /root/reference/lib/rdfa-extractor.js:72).

All pure `pyspark.sql.functions` column expressions — language ID, quality
scoring, token counting, fingerprinting run JVM-side inside whole-stage
codegen; no Python boundary, so a 100 TB corpus scan is I/O-bound, not
serde-bound.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker lists for the n-gram/stopword-hit
# language-ID heuristic. Deliberately small and deterministic.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "it", "for", "with"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "für"],
    "fr": ["le", "la", "les", "et", "est", "pas", "un", "une", "dans", "pour"],
    "es": ["el", "la", "los", "las", "es", "no", "un", "una", "por", "para"],
    "nl": ["de", "het", "een", "en", "van", "is", "niet", "met", "voor", "aan"],
}

EN_STOPWORDS = LANG_MARKERS["en"] + ["a", "an", "as", "at", "by", "on", "or"]

# BPE-ish token heuristic: word pieces, numbers, or single non-space symbols
# — a cheap proxy for subword token counts.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column) -> Column:
    """Whitespace tokenization (empty-string-safe)."""
    return F.filter(F.split(F.trim(text), r"\s+"), lambda t: t != "")


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Count of BPE-ish matches (letters runs + digit runs + symbols)."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0))


def char_count(text: Column) -> Column:
    return F.length(text)


def avg_token_len(text: Column) -> Column:
    t = tokens(text)
    return F.when(F.size(t) > 0,
                  F.aggregate(t, F.lit(0), lambda acc, x: acc + F.length(x))
                  / F.size(t))


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = [s.lower() for s in (stopwords or EN_STOPWORDS)]
    t = tokens(F.lower(text))
    hits = F.size(F.filter(t, lambda x: x.isin(sw)))
    return F.when(F.size(t) > 0, hits / F.size(t)).otherwise(F.lit(0.0))


def punct_ratio(text: Column) -> Column:
    n = F.length(text)
    punct = n - F.length(F.regexp_replace(text, r"[^\w\s]", ""))
    return F.when(n > 0, punct / n).otherwise(F.lit(0.0))


def uppercase_ratio(text: Column) -> Column:
    n = F.length(text)
    upper = n - F.length(F.regexp_replace(text, "[A-Z]", ""))
    return F.when(n > 0, upper / n).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Composite heuristic document-quality score in [0, 1]: rewards
    mid-length docs with sane word lengths and some stopwords, penalizes
    punctuation soup. Weights are arbitrary but fixed (training-data
    filtering heuristics in the C4/Gopher tradition)."""
    tc = token_count(text)
    len_ok = F.when((tc >= 10) & (tc <= 100000), F.lit(1.0)).otherwise(F.lit(0.0))
    awl = F.coalesce(avg_token_len(text), F.lit(0.0))
    wordlen_ok = F.when((awl >= 2.0) & (awl <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    sw = stopword_ratio(text)
    sw_ok = F.when(sw >= 0.01, F.lit(1.0)).otherwise(F.lit(0.0))
    p = punct_ratio(text)
    punct_ok = F.when(p <= 0.2, F.lit(1.0)).otherwise(F.lit(0.0))
    return (0.3 * len_ok + 0.2 * wordlen_ok + 0.3 * sw_ok + 0.2 * punct_ok)


def lang_id(text: Column, markers: dict[str, list[str]] | None = None) -> Column:
    """Stopword-marker language ID: pick the language with the most marker
    hits; 'und' (undetermined) when nothing matches. Deterministic
    tie-break: language code ascending."""
    markers = markers or LANG_MARKERS
    t = tokens(F.lower(text))
    scored = F.array(*[
        F.struct(
            F.size(F.filter(t, lambda x: x.isin([w.lower() for w in words])))
            .alias("hits"),
            F.lit(-rank).alias("neg_rank"),  # max(neg_rank) ⇒ first language code
            F.lit(lang).alias("lang"),
        )
        for rank, (lang, words) in enumerate(sorted(markers.items()))
    ])
    best = F.array_max(F.filter(scored, lambda s: s.hits > 0))
    return F.when(best.isNull(), F.lit("und")).otherwise(best.getField("lang"))


def fingerprint(text: Column, n_hex: int = 16) -> Column:
    """Deterministic document fingerprint: md5 over the normalized text
    (lowercased, whitespace-collapsed), truncated to ``n_hex`` hex chars.
    Content-derived, so stable across runs/engines (SURVEY.md §7 hard
    part d: prefer content hashes over uuids)."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.substring(F.md5(norm), 1, n_hex)


def rolling_hashes(text: Column, window: int = 8) -> Column:
    """Winnowing-style shingle hashes: md5 of each ``window``-word shingle
    (array column). Basis for robust near-dup fingerprints."""
    t = tokens(F.lower(text))
    n = F.size(t)
    idx = F.sequence(F.lit(1), F.greatest(n - window + 1, F.lit(1)))
    return F.transform(
        idx, lambda i: F.substring(F.md5(F.concat_ws(" ", F.slice(t, i, window))), 1, 16)
    )


def hot_passages(df: DataFrame, text_col: str = "text",
                 id_col: str = "doc_id", window: int = 8,
                 min_df: int = 2) -> DataFrame:
    """Cross-document repeated passages: rolling ``window``-word shingle
    hashes (:func:`rolling_hashes`) occurring in at least ``min_df``
    DISTINCT documents — the boilerplate detector behind substring-level
    dedup (navigation headers, footers, license blocks, templated
    paragraphs that document-level near-dup cannot see because the
    surrounding text differs).

    Returns ``(hash, n_docs)``. Scale shape: one explode of per-doc
    DISTINCT window hashes and one map-side-combinable count — the
    grouped key space is the passage vocabulary, which is far smaller
    than the token stream; no joins, no quadratic term."""
    e = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.array_distinct(
            rolling_hashes(F.col(text_col), window))).alias("hash"))
    return (e.groupBy("hash").agg(F.count("*").alias("n_docs"))
            .filter(F.col("n_docs") >= min_df))


def strip_repeated_substrings(df: DataFrame, text_col: str = "text",
                              id_col: str = "doc_id", window: int = 8,
                              min_df: int = 2,
                              hot: DataFrame | None = None) -> DataFrame:
    """Substring-level dedup — the window-granular form of
    'deduplicating training data' exact-substring removal: delete every
    token covered by a ``window``-word passage that repeats across
    ``min_df``+ documents, keeping the rest of each document intact.
    Document-level dedup keeps one copy of near-identical DOCS; this
    removes the shared boilerplate INSIDE otherwise-distinct docs.

    Pass a precomputed ``hot`` table (:func:`hot_passages` — e.g. built
    once for a corpus, or from a frozen reference crawl) to decouple
    detection from removal; by default it is derived from ``df`` itself.
    The hot set is boilerplate-vocabulary-sized → BROADCAST; coverage is
    a per-document column expression (no token ever leaves its row), so
    the only shuffle is the hot-start aggregation.

    Documents shorter than ``window`` hash as one truncated shingle, so
    two short identical docs strip to empty — exact-duplicate semantics
    at the document floor (run exact dedup first if that is not wanted).

    Returns ``df``'s columns with ``text_col`` rebuilt from the
    surviving tokens (original casing), plus ``n_tokens_before`` /
    ``n_tokens_removed``."""
    if hot is None:
        hot = hot_passages(df, text_col, id_col, window, min_df)
    starts = (
        df.select(F.col(id_col).alias("_sid"),
                  F.posexplode(rolling_hashes(F.col(text_col), window))
                  .alias("pos", "hash"))
        .join(F.broadcast(hot.select("hash")), "hash")
        .groupBy("_sid").agg(F.collect_set("pos").alias("_starts")))
    marked = (
        df.join(starts, df[id_col] == starts["_sid"], "left")
        .drop("_sid")
        .withColumn("_toks", tokens(F.col(text_col)))
        .withColumn("_kept", F.filter(
            F.transform(
                F.col("_toks"),
                lambda x, i: F.struct(
                    x.alias("t"),
                    F.coalesce(
                        ~F.exists("_starts",
                                  lambda s: (i >= s) & (i < s + window)),
                        F.lit(True)).alias("keep"))),
            lambda st: st["keep"])))
    out_cols = [
        F.concat_ws(" ", F.transform(F.col("_kept"), lambda st: st["t"]))
        .alias(text_col) if c == text_col else F.col(c)
        for c in df.columns
    ]
    return marked.select(
        *out_cols,
        F.size("_toks").alias("n_tokens_before"),
        (F.size("_toks") - F.size("_kept")).alias("n_tokens_removed"))


def shingle_positions(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id",
                      window: int = 8) -> DataFrame:
    """(id, pos, hash) rows: each ``window``-word rolling shingle of the
    lowercased token stream with its 1-based token position — the
    position-carrying form of :func:`rolling_hashes` (which discards
    positions because hot-passage counting doesn't need them)."""
    return df.select(
        F.col(id_col).alias("id"),
        F.posexplode(rolling_hashes(F.col(text_col), window))
        .alias("pos0", "hash")).select(
        "id", (F.col("pos0") + 1).alias("pos"), "hash")


# Default per-shingle document-frequency cap for the shared-span
# detector. A shingle present in d documents contributes O(d²) candidate
# rows to the hash equi-join, so ONE corpus-hot shingle (boilerplate, a
# license header) turns the detector quadratic — the single silent
# scale footgun this module had. 256 is ~2× the largest near-dup
# cluster the dedup policies tolerate before keep-one collapses it, far
# above any genuine pairwise-shared passage, and caps the per-hash term
# at a constant. Pass ``max_df=None`` to opt out EXPLICITLY (exhaustive
# small-corpus forensics only).
DEFAULT_SPAN_MAX_DF = 256


def common_span_pairs(df: DataFrame, text_col: str = "text",
                      id_col: str = "doc_id", window: int = 8,
                      min_span: int = 16,
                      max_df: int | None = DEFAULT_SPAN_MAX_DF
                      ) -> DataFrame:
    """Cross-document SHARED SPANS: for every document pair, every
    maximal run of identical consecutive tokens at least ``min_span``
    tokens long, with its start position in each document — the
    pair-level exact-substring dedup of the 'deduplicating training
    data' tradition (:func:`hot_passages` finds corpus-FREQUENT
    passages; this finds long verbatim overlap between two documents
    even when each passage occurs only twice).

    Plan: (1) position-carrying shingle rows; (2) hot-shingle drop
    (``max_df``, ON BY DEFAULT at :data:`DEFAULT_SPAN_MAX_DF`: shingles
    in more than that many documents leave the candidate join —
    boilerplate is :func:`hot_passages`' job, and a corpus-hot shingle
    would explode the join quadratically; ``max_df=None`` is the
    explicit unbounded opt-out);
    (3) hash equi-join (id_a < id_b) → matching coordinates;
    (4) gaps-and-islands along each pair's DIAGONAL pos_a − pos_b:
    consecutive shingle matches on one diagonal are one run, so a run
    of ``r`` matching shingles is a shared span of ``r + window − 1``
    tokens. The window partitions by (pair, diagonal) — fine-grained
    keys, no skew; within one diagonal pos_b is determined by pos_a, so
    positions are unique and row_number is stable.

    Returns ``(id_a, id_b, start_a, start_b, span_tokens)`` per maximal
    qualifying run. Scale shape: everything is keyed — shingle-hash
    equi-join with pinned reduce parallelism (the LSH join's measured
    AQE hazard), no all-pairs term once ``max_df`` bounds per-hash
    fan-out. Documents shorter than ``window`` contribute one truncated
    shingle (mirrored by the oracle); spans they join are nominally
    counted at full window width.

    ``min_span < window`` is REJECTED: a shared run shorter than the
    shingle window produces no matching shingle at all, so such a
    setting would silently under-report every span in
    ``[min_span, window-1]`` — shrink ``window`` instead (the same
    loud-refusal convention as dedup.py's ``blocks > max_hamming``
    guard)."""
    from pyspark.sql import Window

    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        _pin_join_parallelism,
        spread_for_cpu,
    )

    if min_span < window:
        raise ValueError(
            f"common_span_pairs: min_span={min_span} < window={window} "
            f"cannot be honored — runs shorter than the shingle window "
            f"leave no shingle to match, so spans in [{min_span}, "
            f"{window - 1}] would be silently missed. Lower window to "
            f"at most min_span (detection is exact for runs ≥ window).")

    sp = shingle_positions(spread_for_cpu(df), text_col, id_col, window)
    if max_df is not None:
        hot = (sp.groupBy("hash")
               .agg(F.count_distinct("id").alias("_df"))
               .filter(F.col("_df") > max_df).select("hash"))
        sp = sp.join(hot, "hash", "left_anti")
    # BOTH sides pinned deliberately (unlike the materialized self-joins,
    # which pin one side — dedup._pin_join_parallelism): sp is NOT
    # materialized here, and the two identical REPARTITION exchanges are
    # what lets AQE reuse the shingle_positions shuffle stage across the
    # join sides — dropping one pin would recompute that subtree.
    a = _pin_join_parallelism(sp, "hash").select(
        F.col("id").alias("id_a"), F.col("pos").alias("pa"), "hash")
    b = _pin_join_parallelism(sp, "hash").select(
        F.col("id").alias("id_b"), F.col("pos").alias("pb"), "hash")
    m = (a.join(b, "hash")
         .filter(F.col("id_a") < F.col("id_b"))
         .select("id_a", "id_b", "pa", "pb",
                 (F.col("pa") - F.col("pb")).alias("d")))
    w = Window.partitionBy("id_a", "id_b", "d").orderBy("pa")
    r = m.withColumn("isl", F.col("pa") - F.row_number().over(w))
    runs = (r.groupBy("id_a", "id_b", "d", "isl")
            .agg(F.min("pa").alias("start_a"), F.min("pb").alias("start_b"),
                 (F.count("*") + window - 1).alias("span_tokens")))
    return (runs.filter(F.col("span_tokens") >= min_span)
            .select("id_a", "id_b", "start_a", "start_b", "span_tokens"))


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have",
                    "with"]


def gopher_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """The Gopher-rule quality signals (Rae et al. 2021, Appendix A —
    the published heuristic battery most corpus builds start from), as
    pure column expressions in ONE projection:

    * ``n_words`` / ``mean_word_len`` — whitespace words;
    * ``symbol_word_ratio`` — '#' and ellipsis occurrences per word;
    * ``frac_bullet_lines`` / ``frac_ellipsis_lines`` — lines starting
      with a bullet mark / ending with an ellipsis;
    * ``frac_alpha_words`` — words containing at least one letter;
    * ``n_stop_hits`` — distinct members of the 8-word Gopher stopword
      set present.

    Complements :func:`quality_score` (a composite) and
    :func:`repetition_signals` (the Gopher repetition table) — these
    are the structural rules; :func:`gopher_filter` applies the
    published thresholds."""
    t = F.col(text_col)
    # ONE token array, lowered once: every signal that reads it is
    # case-invariant (sizes, per-token lengths, contains-a-letter), and
    # the stopword intersection needs the lowered form — so the cased
    # duplicate the first cut computed was pure repeated work inside
    # codegen (measurable on 100 kB documents).
    words = tokens(F.lower(t))
    n_words = F.size(words)
    mean_wl = F.when(n_words > 0,
                     F.aggregate(words, F.lit(0),
                                 lambda acc, w: acc + F.length(w))
                     / n_words).otherwise(F.lit(0.0))
    n_sym = (F.size(F.regexp_extract_all(t, F.lit(r"#"), 0))
             + F.size(F.regexp_extract_all(t, F.lit(r"\.\.\.|…"), 0)))
    sym_ratio = F.when(n_words > 0, n_sym / n_words).otherwise(F.lit(0.0))
    lines = F.filter(F.split(t, "\n"), lambda ln: F.trim(ln) != "")
    n_lines = F.size(lines)
    bullet = F.size(F.filter(
        lines, lambda ln: F.trim(ln).rlike(r"^[-*•]")))
    ellip = F.size(F.filter(
        lines, lambda ln: F.trim(ln).rlike(r"(\.\.\.|…)$")))
    alpha = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    stop_hits = F.size(F.array_intersect(
        F.array_distinct(words),
        F.array(*[F.lit(s) for s in GOPHER_STOPWORDS])))
    return df.select(
        *df.columns,
        n_words.cast("long").alias("n_words"),
        F.round(mean_wl, 4).alias("mean_word_len"),
        F.round(sym_ratio, 4).alias("symbol_word_ratio"),
        F.round(F.when(n_lines > 0, bullet / n_lines)
                .otherwise(F.lit(0.0)), 4).alias("frac_bullet_lines"),
        F.round(F.when(n_lines > 0, ellip / n_lines)
                .otherwise(F.lit(0.0)), 4).alias("frac_ellipsis_lines"),
        F.round(F.when(n_words > 0, alpha / n_words)
                .otherwise(F.lit(0.0)), 4).alias("frac_alpha_words"),
        stop_hits.cast("long").alias("n_stop_hits"))


def gopher_filter(df: DataFrame, text_col: str = "text",
                  min_words: int = 50, max_words: int = 100_000,
                  min_mean_word_len: float = 3.0,
                  max_mean_word_len: float = 10.0,
                  max_symbol_word_ratio: float = 0.1,
                  max_bullet_lines: float = 0.9,
                  max_ellipsis_lines: float = 0.3,
                  min_alpha_words: float = 0.8,
                  min_stop_hits: int = 2) -> DataFrame:
    """Apply the published Gopher thresholds over
    :func:`gopher_signals`; returns the surviving rows with the
    ORIGINAL columns (signals stay internal). One projection + one
    filter on the scan — composes in front of the funnel's
    `filter_documents`."""
    s = gopher_signals(df, text_col)
    keep = ((F.col("n_words") >= min_words)
            & (F.col("n_words") <= max_words)
            & (F.col("mean_word_len") >= min_mean_word_len)
            & (F.col("mean_word_len") <= max_mean_word_len)
            & (F.col("symbol_word_ratio") <= max_symbol_word_ratio)
            & (F.col("frac_bullet_lines") <= max_bullet_lines)
            & (F.col("frac_ellipsis_lines") <= max_ellipsis_lines)
            & (F.col("frac_alpha_words") >= min_alpha_words)
            & (F.col("n_stop_hits") >= min_stop_hits))
    return s.filter(keep).select(*df.columns)


def ngram_novelty(df: DataFrame, text_col: str = "text",
                  id_col: str = "doc_id", window: int = 8) -> DataFrame:
    """Per-document novelty: the fraction of the document's DISTINCT
    ``window``-word shingles that occur in NO other document — the
    memorization-risk / templatedness signal dual to
    :func:`hot_passages` (which surfaces the passages; this scores the
    documents). 1.0 = every passage unique to the doc; 0.0 = everything
    it says, some other document also says.

    Plan: per-doc distinct shingle hashes (explode + array_distinct,
    partition-local), document frequency per hash (map-side-combinable
    count over the shingle vocabulary), one equi-join back on the hash
    — everything keyed by the shingle vocabulary, no pair term at all,
    so this is strictly cheaper than any pair generator. Returns
    ``(id_col, n_shingles, novelty)``; documents shorter than the
    window contribute their single truncated shingle."""
    e = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.array_distinct(
            rolling_hashes(F.col(text_col), window))).alias("hash"))
    dfreq = e.groupBy("hash").agg(F.count("*").alias("_df"))
    return (e.join(dfreq, "hash")
            .groupBy("_id")
            .agg(F.count("*").alias("n_shingles"),
                 F.round(F.avg((F.col("_df") == 1).cast("int")), 6)
                 .alias("novelty"))
            .select(F.col("_id").alias(id_col), "n_shingles", "novelty"))


def strip_shared_spans(df: DataFrame, spans: DataFrame | None = None,
                       text_col: str = "text", id_col: str = "doc_id",
                       window: int = 8, min_span: int = 16,
                       max_df: int | None = DEFAULT_SPAN_MAX_DF
                       ) -> DataFrame:
    """The removal step over :func:`common_span_pairs`' detections:
    delete from each HIGHER-id document every token covered by a
    qualifying shared span (the lower-id copy survives intact — the
    same first-delivery-wins convention as every keep-one in this
    package, so the span text remains in the corpus exactly once per
    detected pair-run).

    ``spans`` defaults to running the detector with the given
    parameters; pass a precomputed frame to strip against an existing
    detection (e.g. one computed with a document-frequency cap).

    Plan — the rewrite never shuffles the corpus: spans aggregate to
    ONE RANGE LIST PER COVERED DOC (an array of (start, end) structs —
    one entry per span, not per covered token), that small table joins
    back on the id, and the rewrite is a pure column expression that
    keeps each token whose position falls in no range. Tokens never
    leave their row (contrast: explode-and-reassemble would shuffle the
    entire token stream — the exact cost the hot-passage strip also
    avoids). Per-token work is O(spans covering the doc), which the
    detector's min_span already bounds. Original casing is preserved —
    detection is case-folded, but positions index the raw whitespace
    token stream, which is case-identical. A fully covered document
    comes back as the empty string (kept, not dropped — dropping is a
    policy for the caller's filter stage).

    Returns ``df`` with ``text_col`` rewritten plus
    ``n_tokens_removed``."""
    if spans is None:
        spans = common_span_pairs(df, text_col, id_col, window,
                                  min_span, max_df)
    ranges = (spans.select(
        F.col("id_b").alias("_cid"),
        F.struct(
            F.col("start_b").alias("s"),
            (F.col("start_b") + F.col("span_tokens") - 1).alias("e"))
        .alias("_r"))
        .distinct()
        .groupBy("_cid").agg(F.collect_list("_r").alias("_cov")))
    joined = df.join(ranges, df[id_col] == ranges["_cid"], "left")
    toks = tokens(F.col(text_col))
    indexed = F.transform(
        toks, lambda t, i: F.struct(t.alias("t"), (i + 1).alias("p")))
    kept = F.filter(
        indexed,
        lambda s: ~F.exists(
            F.col("_cov"),
            lambda r: (s.getField("p") >= r.getField("s"))
            & (s.getField("p") <= r.getField("e"))))
    new_text = F.when(
        F.col("_cov").isNull(), F.col(text_col)).otherwise(
        F.concat_ws(" ", F.transform(kept, lambda s: s.getField("t"))))
    n_removed = F.when(F.col("_cov").isNull(), F.lit(0)).otherwise(
        F.size(toks) - F.size(kept))
    return joined.select(
        *[new_text.alias(c) if c == text_col else F.col(c)
          for c in df.columns],
        n_removed.cast("long").alias("n_tokens_removed"))


def unigram_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus unigram counts ``(t, ct)`` over lowercased whitespace
    tokens — the trainable half of :func:`unigram_logprob`. Persist the
    result (plain parquet) to FREEZE a reference model: scoring against
    frozen counts makes the LM score a pure per-document function, which
    is what lets it run identically in the batch and streaming funnels
    (a self-trained score is a corpus-level statistic and would drift
    between the two)."""
    return (df.select(F.explode(tokens(F.lower(F.col(text_col))))
                      .alias("t"))
            .groupBy("t").agg(F.count("*").alias("ct")))


def unigram_logprob(df: DataFrame, text_col: str = "text",
                    id_col: str = "doc_id", alpha: float = 0.5,
                    materialize_mode: str = "local_checkpoint",
                    model_counts: DataFrame | None = None,
                    hot_k: int = 1024) -> DataFrame:
    """Per-document mean unigram log-probability under the corpus's own
    unigram model — the perplexity-proxy quality score of the CCNet /
    language-model-filtering tradition (fluent text scores near the
    corpus mode; gibberish, boilerplate, and wrong-language text score
    low):

        score(d) = Σ_t c_d(t)·ln p(t) / Σ_t c_d(t)
        p(t)     = (C(t) + α) / (N + α·V)

    with corpus counts C, total tokens N, vocabulary size V, add-α
    smoothing, and lowercased whitespace tokens.

    Scale shape — two-level aggregation: per-(doc, token) counts FIRST
    (map-side combinable), so the vocab join's input is doc×distinct-
    token, not raw token instances; the corpus-wide counts come from a
    second groupBy over those partials (never a re-scan of the text);
    N and V enter as a one-row broadcast (the scalar-cross-join shape
    the plan audit whitelists for the mixture denominator). Each joined
    row is one (doc, token) pair, not one instance — but the hottest
    tokens ('the' ≈ every English doc) still concentrate O(n_docs) rows
    on one shuffle key, so the vocab join is HOT/COLD SPLIT: the top
    ``hot_k`` tokens by count (a tiny TakeOrdered, ≤hot_k rows) join the
    partials map-side as a broadcast, and only the long tail — whose
    per-key multiplicity is bounded by the (hot_k+1)-th hottest token's
    document frequency — takes the shuffle join. Values are identical
    either way (each partial row lands in exactly one branch);
    ``hot_k=0`` disables the split. This is the standard skew treatment
    that does not replicate the (possibly huge) full vocabulary the way
    salting would.

    By default the model IS the corpus — a corpus-level statistic, so
    the self-trained form is deliberately not a `build_training_corpus`
    stage (in a streaming funnel the accumulated counts would drift from
    a batch recompute). Pass ``model_counts`` (a ``(t, ct)`` table from
    :func:`unigram_counts`, e.g. read back from parquet) to score
    against a FROZEN reference model instead: the score then depends
    only on the document and the model, tokens absent from the model
    get the smoothed floor α/(N+αV), and the filter becomes safe for
    both funnels (``filter_documents`` ``min_avg_logprob``).

    Returns ``(id_col, n_tokens, avg_logprob)``."""
    from harvesting_extract_to_ttl_service_spark.operators.materialize import (
        materialize,
    )

    toks = df.select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.col(text_col)))).alias("t"))
    per_doc = toks.groupBy(id_col, "t").agg(F.count("*").alias("c"))
    if model_counts is None:
        # materialize the (doc, token) partials once: they feed BOTH
        # join sides (directly, and again through vocab → tot), and the
        # planner duplicates unreferenced subtrees rather than reuse
        # them — without the cut the text explode+count would run three
        # times.
        per_doc = materialize(per_doc, materialize_mode)
        vocab = per_doc.groupBy("t").agg(F.sum("c").alias("ct"))
    else:
        vocab = model_counts.select("t", "ct")
        if hot_k:
            # with a frozen model the partials feed only ONE join in the
            # unsplit plan, but the hot/cold split unions two branches
            # over per_doc — cut it or the text explode+count runs twice
            per_doc = materialize(per_doc, materialize_mode)
    tot = vocab.agg(F.sum("ct").alias("n_total"),
                    F.count("*").alias("v"))
    # left join + zero floor: identical to the inner join when the model
    # is the corpus itself (every token is in-vocab), and the smoothed
    # OOV probability α/(N+αV) against a frozen model
    lp = F.log((F.coalesce(F.col("ct"), F.lit(0)) + F.lit(alpha))
               / (F.col("n_total") + F.lit(alpha) * F.col("v")))
    if hot_k:
        # the hot-set order MUST be total (ties at the hot_k boundary
        # broken by the token itself): the `hot` subtree is evaluated
        # once per union branch, and a non-total TakeOrdered could pick
        # different tie members per evaluation — a token in one
        # evaluation's hot set but not the other's would be counted
        # twice (inner join + anti-join survival) or dropped by both
        hot = F.broadcast(
            vocab.orderBy(F.col("ct").desc(), "t").limit(hot_k))
        joined = (per_doc.join(hot, "t").unionByName(
            per_doc.join(hot.select("t"), "t", "left_anti")
            .join(vocab, "t", "left")))
    else:
        joined = per_doc.join(vocab, "t", "left")
    return (
        joined
        .crossJoin(F.broadcast(tot))
        .groupBy(id_col)
        .agg(F.sum("c").alias("n_tokens"),
             (F.sum(F.col("c") * lp) / F.sum("c")).alias("avg_logprob"))
    )


def _doc_bigrams(text: Column) -> Column:
    """Adjacent lowercased-token pairs as ``struct<t1, t2>`` — n−1
    bigrams for an n-token document, empty (not NULL, not an error) for
    documents with fewer than two tokens. The explicit n ≥ 2 guard
    matters: sequence(1, n−1) DESCENDS for n < 2 instead of being
    empty."""
    t = tokens(F.lower(text))
    n = F.size(t)
    pairs = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.struct(F.element_at(t, i).alias("t1"),
                           F.element_at(t, i + 1).alias("t2")))
    return F.when(n >= 2, pairs).otherwise(
        F.array().cast("array<struct<t1:string,t2:string>>"))


def bigram_model(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus bigram model ``(t1, t2, ct, ct1)``: count of each adjacent
    token pair plus the context total ``ct1 = Σ_t2 ct(t1, t2)``
    DENORMALIZED onto every row — the conditional-probability
    denominator travels with the pair, so scoring joins on the pair key
    only (pair keys are far less skewed than token keys: the hottest
    bigram's document frequency bounds the multiplicity, not the
    hottest token's). Persist to parquet to freeze a reference model,
    exactly like :func:`unigram_counts`."""
    bi = df.select(F.explode(_doc_bigrams(F.col(text_col))).alias("bg"))
    m = (bi.select("bg.t1", "bg.t2")
         .groupBy("t1", "t2").agg(F.count("*").alias("ct")))
    ctx = m.groupBy("t1").agg(F.sum("ct").alias("ct1"))
    # vocab-sized equi-join paid ONCE at train time, never at scoring
    return m.join(ctx, "t1")


def bigram_logprob(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id", alpha: float = 0.5,
                   materialize_mode: str = "local_checkpoint",
                   model: DataFrame | None = None) -> DataFrame:
    """Per-document mean bigram conditional log-probability — the
    second-order companion of :func:`unigram_logprob` (fluency is a
    sequence property: shuffled-but-in-vocabulary gibberish scores near
    the corpus mode under a unigram model and collapses under this one):

        score(d) = Σ_g c_d(g)·ln p(g) / Σ_g c_d(g)     g = (t1, t2)
        p(t2|t1) = (C(t1,t2) + α) / (C1(t1) + α·V)

    with corpus pair counts C, context totals C1, add-α smoothing, and
    V = the number of distinct continuation types in the model (the
    conditional distribution's support). Documents with fewer than two
    tokens have no bigrams and drop out, like token-less documents in
    the unigram scorer.

    Scale shape mirrors the unigram scorer: per-(doc, pair) partials
    first (map-side combinable), corpus counts from a second groupBy
    over those partials, V as a one-row broadcast. The scoring join is
    keyed on the PAIR — the model carries its own denominator
    (:func:`bigram_model`), so no token-keyed (skew-prone) join exists
    at score time and the unigram scorer's hot/cold split is not
    needed here.

    Pass ``model`` (a frozen :func:`bigram_model` table) to score
    against a reference corpus: pairs absent from the model floor at
    the conservative α/(0 + α·V) = 1/V — including seen-context/unseen-
    continuation pairs, whose true C1 the pair-denormalized layout no
    longer knows (documented trade: one join instead of two, exactness
    only in the self-trained form).

    Returns ``(id_col, n_bigrams, avg_logprob)``."""
    from harvesting_extract_to_ttl_service_spark.operators.materialize import (
        materialize,
    )

    bi = df.select(F.col(id_col),
                   F.explode(_doc_bigrams(F.col(text_col))).alias("bg"))
    per_doc = (bi.select(id_col, "bg.t1", "bg.t2")
               .groupBy(id_col, "t1", "t2").agg(F.count("*").alias("c")))
    if model is None:
        # the partials feed the model subtree AND the scoring join —
        # cut once or the text explode+count runs three times
        per_doc = materialize(per_doc, materialize_mode)
        m = per_doc.groupBy("t1", "t2").agg(F.sum("c").alias("ct"))
        ctx = m.groupBy("t1").agg(F.sum("ct").alias("ct1"))
        model = m.join(ctx, "t1")
    vrow = model.agg(F.countDistinct("t2").alias("v"))
    lp = F.log((F.coalesce(F.col("ct"), F.lit(0)) + F.lit(alpha))
               / (F.coalesce(F.col("ct1"), F.lit(0))
                  + F.lit(alpha) * F.col("v")))
    return (per_doc.join(model, ["t1", "t2"], "left")
            .crossJoin(F.broadcast(vrow))
            .groupBy(id_col)
            .agg(F.sum("c").alias("n_bigrams"),
                 (F.sum(F.col("c") * lp) / F.sum("c"))
                 .alias("avg_logprob")))


def repetition_signals(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Repetition-based quality signals (the Gopher-tradition filters the
    composite ``quality`` score doesn't cover): per document,

      * ``n_lines`` and ``dup_line_ratio`` — fraction of newline-split
        lines that are duplicates (boilerplate/template pages);
      * ``top_bigram_ratio`` — the most frequent word bigram's share of
        all bigram occurrences (stuck-key/keyword-stuffing pages).

    Line metrics are pure column expressions; the bigram mode needs a
    per-(doc, bigram) count, which is one explode + two map-side-partial
    aggregates — one row per doc reaches the final shuffle."""
    t = F.col(text_col)
    lines = F.split(t, "\n")
    dup_line = F.when(
        F.size(lines) > 0,
        1.0 - F.size(F.array_distinct(lines)) / F.size(lines)
    ).otherwise(F.lit(0.0))

    w = tokens(F.lower(t))
    # guard: sequence(1, 0) DESCENDS in Spark, so short docs need an
    # explicit empty-bigram branch
    bigrams = F.when(
        F.size(w) >= 2,
        F.transform(F.sequence(F.lit(1), F.size(w) - 1),
                    lambda i: F.concat_ws(" ", F.slice(w, i, 2)))
    ).otherwise(F.array().cast("array<string>"))
    ex = df.select(F.col(id_col).alias("_id"),
                   F.explode(bigrams).alias("g"))
    counts = (ex.groupBy("_id", "g").agg(F.count("*").alias("c"))
              .groupBy("_id").agg(F.max("c").alias("_mx"),
                                  F.sum("c").alias("_tot")))
    joined = df.join(counts, df[id_col] == counts["_id"], "left")
    top_bigram = F.when(F.col("_tot") > 0, F.col("_mx") / F.col("_tot")) \
        .otherwise(F.lit(0.0))
    return joined.select(
        *df.columns,
        F.size(lines).alias("n_lines"),
        F.round(dup_line, 4).alias("dup_line_ratio"),
        F.round(top_bigram, 4).alias("top_bigram_ratio"))


# Deliberately simple, engine-portable detector regexes (no lookaround —
# they must run identically under Spark's Java regex and DuckDB's RE2):
# a PII *signal* for filtering decisions, not a redaction guarantee.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"
PHONE_RE = r"\+?[0-9][0-9()\-. ]{7,}[0-9]"


def pii_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Contact-info counts per document — the cheap pre-filter a
    training-data pipeline runs before expensive PII scrubbing: email
    addresses, URLs, and phone-shaped digit runs. Pure column
    expressions (three regexp passes inside one projection)."""
    t = F.col(text_col)
    return df.select(
        *df.columns,
        F.size(F.regexp_extract_all(t, F.lit(EMAIL_RE), 0))
        .alias("n_emails"),
        F.size(F.regexp_extract_all(t, F.lit(URL_RE), 0)).alias("n_urls"),
        F.size(F.regexp_extract_all(t, F.lit(PHONE_RE), 0))
        .alias("n_phones"))


def hash_bucket_weights(spark, n_buckets: int,
                        salt: str = "clfw") -> DataFrame:
    """Deterministic pseudo-random weight table ``(bucket, weight)`` with
    weights in [-1, 1) — a stand-in for offline-trained classifier
    weights that both engines can re-derive bit-for-bit (demos, oracles,
    tests). Real deployments load their trained table instead."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        hash_fraction,
    )

    return spark.range(n_buckets).select(
        F.col("id").alias("bucket"),
        F.round(2 * hash_fraction(F.col("id"), salt) - 1, 6)
        .alias("weight"))


def hashed_linear_score(df: DataFrame, weights: DataFrame,
                        n_buckets: int = 1024, bias: float = 0.0,
                        text_col: str = "text", id_col: str = "doc_id",
                        salt: str = "clf") -> DataFrame:
    """FastText-style linear classifier INFERENCE over hashed bag-of-words
    features — the quality-classifier scoring pass of a training-data
    pipeline (CCNet/GPT-3 tradition: a tiny linear model trained offline
    against a reference corpus, applied to every crawl document):

        score = sigmoid(bias + Σ_b weight[b] · tf(b))

    where ``b = floor(hash_fraction(token) · n_buckets)`` (the hashing
    trick: fixed feature width, no vocabulary build) and ``tf(b)`` is the
    bucket's token-count share of the document.

    ``weights`` is ``(bucket: long, weight: double)`` — broadcast, never
    shuffled; buckets absent from it score 0 but still count toward the
    normalizer (a LEFT join, so a sparse model degrades gracefully
    instead of silently renormalizing). ``bucket`` must be unique per
    row (a trained model's key is); duplicates would double-count.

    Scale shape — same two-level aggregation as :func:`unigram_logprob`:
    (doc, bucket) partials finish map-side, so raw token instances never
    reach a join or shuffle; the weight join touches ≤ n_buckets rows
    per doc-bucket group. Rows with no tokens keep score
    sigmoid(bias). Returns ``df`` + ``n_tokens`` + ``clf_score``
    (rounded to 6 dp — cross-engine float-sum pinning, corpus_lm's
    convention)."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        hash_fraction,
    )
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        spread_for_cpu,
    )

    df = spread_for_cpu(df)
    ex = df.select(F.col(id_col).alias("_id"),
                   F.explode(tokens(F.lower(F.col(text_col)))).alias("t"))
    bucket = F.floor(hash_fraction(F.col("t"), salt)
                     * F.lit(n_buckets)).cast("long")
    pd_ = (ex.select("_id", bucket.alias("bucket"))
           .groupBy("_id", "bucket").agg(F.count("*").alias("_c")))
    # bucket-sorted fold instead of an unordered SUM: partition order
    # varies run to run, and a dot product whose rounded 6th decimal
    # sits on a half boundary would flip nondeterministically against
    # the oracle (observed on the multi-class sibling; same pin there
    # and in the DuckDB twin — the temperature_mixture float-order
    # convention)
    scored = (pd_.join(F.broadcast(weights), "bucket", "left")
              .groupBy("_id").agg(
                  F.sort_array(F.collect_list(F.struct(
                      F.col("bucket").alias("b"), F.col("_c").alias("c"),
                      F.coalesce(F.col("weight"), F.lit(0.0))
                      .alias("w")))).alias("_rows"))
              .select(
                  "_id",
                  F.aggregate("_rows", F.lit(0).cast("long"),
                              lambda a, r: a + r.getField("c"))
                  .alias("_n"),
                  F.aggregate("_rows", F.lit(0.0),
                              lambda a, r: a
                              + r.getField("c").cast("double")
                              * r.getField("w")).alias("_num"))
              .withColumn("_dot", F.col("_num") / F.col("_n"))
              .drop("_num"))
    joined = df.join(scored, df[id_col] == scored["_id"], "left")
    score = F.lit(1.0) / (
        F.lit(1.0)
        + F.exp(-(F.lit(float(bias))
                  + F.coalesce(F.col("_dot"), F.lit(0.0)))))
    return joined.select(
        *df.columns,
        F.coalesce(F.col("_n"), F.lit(0).cast("long")).alias("n_tokens"),
        F.round(score, 6).alias("clf_score"))


IPV4_RE = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"

# Redaction rules, applied IN ORDER — order is semantic, not cosmetic:
# emails first (their domains may contain dotted digits), then IPv4
# (dotted digit runs the phone rule would otherwise swallow), then
# phone-shaped digit runs. Replacement tokens contain no digits or '@',
# so an earlier replacement can never create a later match. Same
# no-lookaround portability contract as the detector regexes above.
PII_REDACT_RULES: list[tuple[str, str, str]] = [
    ("email", EMAIL_RE, "<EMAIL>"),
    ("ip", IPV4_RE, "<IP>"),
    ("phone", PHONE_RE, "<PHONE>"),
]


def redact_pii(df: DataFrame, text_col: str = "text",
               rules: list[tuple[str, str, str]] | None = None) -> DataFrame:
    """PII redaction — the scrub step downstream of
    :func:`pii_signals`' cheap pre-filter: rewrite ``text_col`` with
    every match of each rule's regex replaced by its placeholder token,
    and report per-kind match counts (``n_redacted_<kind>``) so the
    pipeline can audit redaction volume per document.

    Counts are taken on the text AS EACH RULE SEES IT (after the earlier
    rules' replacements), so ``sum(n_redacted_*)`` is exactly the number
    of placeholder tokens inserted — no double counting when patterns
    overlap (an IPv4 is also phone-shaped).

    Scale shape: a single projection of chained ``regexp_replace`` /
    ``regexp_extract_all`` column expressions — whole-stage codegen,
    no UDF, no shuffle, embarrassingly parallel over any partitioning.
    Reference analogue: the reference pipeline has no scrub stage (its
    payloads are public RDFa crawls); this is extension surface for the
    training-data funnel (SURVEY.md §2C)."""
    cur: Column = F.col(text_col)
    counts: list[Column] = []
    for kind, pat, repl in (rules or PII_REDACT_RULES):
        counts.append(F.size(F.regexp_extract_all(cur, F.lit(pat), 0))
                      .alias(f"n_redacted_{kind}"))
        cur = F.regexp_replace(cur, pat, repl)
    return df.select(
        *[cur.alias(c) if c == text_col else F.col(c) for c in df.columns],
        *counts)


def annotate_documents(df: DataFrame, text_col: str = "text",
                       id_col: str = "doc_id") -> DataFrame:
    """Text-analysis projection over a documents table (``id_col`` must be
    unique per row).

    Token-derived metrics (counts, avg length, stopword ratio, language
    hits) come from ONE explode + groupBy with flat aggregates instead of
    re-tokenizing per metric: split/HOF expressions evaluate interpreted
    and each metric re-ran the tokenizer, so the single-pass form is ~3×
    faster at sf0.1. Each doc's tokens are partition-local → the partial
    aggregate finishes map-side and one row per doc shuffles. Char-level
    metrics (BPE-ish count, punct ratio, fingerprint) stay per-row column
    expressions."""
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        spread_for_cpu,
    )

    langs = sorted(LANG_MARKERS)
    df = spread_for_cpu(df)
    ex = df.select(F.col(id_col).alias("_id"),
                   F.explode(tokens(F.col(text_col))).alias("w"))
    lw = F.lower(F.col("w"))
    aggs = [
        F.count("*").alias("_n_tokens"),
        F.sum(F.length("w")).alias("_sum_len"),
        F.sum(lw.isin([s.lower() for s in EN_STOPWORDS]).cast("int"))
        .alias("_sw_hits"),
    ] + [
        F.sum(lw.isin([x.lower() for x in LANG_MARKERS[lang]]).cast("int"))
        .alias(f"_hits_{lang}")
        for lang in langs
    ]
    m = ex.groupBy("_id").agg(*aggs)

    joined = df.join(m, df[id_col] == m["_id"], "left")
    t = F.col(text_col)
    n_tok = F.coalesce(F.col("_n_tokens"), F.lit(0).cast("long"))
    awl = F.when(n_tok > 0, F.col("_sum_len") / n_tok).otherwise(F.lit(0.0))
    swr = F.when(n_tok > 0, F.col("_sw_hits") / n_tok).otherwise(F.lit(0.0))
    pr = punct_ratio(t)
    quality = (
        0.3 * F.when((n_tok >= 10) & (n_tok <= 100000), 1.0).otherwise(0.0)
        + 0.2 * F.when((awl >= 2.0) & (awl <= 12.0), 1.0).otherwise(0.0)
        + 0.3 * F.when(swr >= 0.01, 1.0).otherwise(0.0)
        + 0.2 * F.when(pr <= 0.2, 1.0).otherwise(0.0)
    )
    scored = F.array(*[
        F.struct(
            F.coalesce(F.col(f"_hits_{lang}"), F.lit(0)).alias("hits"),
            F.lit(-rank).alias("neg_rank"),
            F.lit(lang).alias("lang"),
        )
        for rank, lang in enumerate(langs)
    ])
    best = F.array_max(F.filter(scored, lambda s: s.hits > 0))
    lang_pred = F.when(best.isNull(), F.lit("und")).otherwise(
        best.getField("lang"))

    return joined.select(
        *df.columns,
        n_tok.alias("n_tokens"),
        bpe_ish_token_count(t).alias("n_bpe_tokens"),
        F.round(awl, 4).alias("avg_token_len"),
        F.round(swr, 4).alias("stopword_ratio"),
        F.round(pr, 4).alias("punct_ratio"),
        F.round(quality, 4).alias("quality"),
        lang_pred.alias("lang_pred"),
        fingerprint(t).alias("fingerprint"),
    )


def hashed_text_embedding(df: DataFrame, dim: int = 32,
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          salt: str = "temb",
                          normalize: bool = True) -> DataFrame:
    """Signed feature-hashing text embedding — the model-free dense
    vectorizer that connects the TEXT corpus to the embedding stack
    (sign-LSH / IVF / SemDeDup / int8 all consume an
    ``array<double>``): each lowercased whitespace token hashes to one
    of ``dim`` buckets with a ±1 sign (signed hashing cancels collision
    bias in expectation — Weinberger et al.'s hashing trick), the
    document's vector is the signed bucket-count histogram, L2
    normalized so downstream cosine works out of the box.

    Classic cheap baseline, not a learned embedding: near-identical
    token multisets → near-identical vectors, which is exactly the
    lexical-similarity signal cluster-blocked dedup wants when no
    encoder is available (plug a real model's vectors in anywhere —
    the column contract is the same).

    Plan: each token instance is hashed ONCE (two md5s), partials
    collapse map-side to ≤ ``dim`` ``(doc, bucket, signed-count)`` rows
    per document, and one groupBy(doc) assembles the dense vector from
    a bucket map. The first cut computed the histogram as dim in-row
    folds over the token array — zero shuffle, but each fold
    re-evaluated every token's two hashes, O(dim·tokens) md5 calls per
    document (51 s for 480 fixture docs at dim=32, measured round 11);
    this shape is ~dim× less compute for a map-side-combinable shuffle
    of ≤ dim tiny rows per doc. Determinism is unchanged: the bucket
    histogram sums ±1 INTEGERS (exact in any order), and the only
    float folds — the norm (component order) and the division — stay
    pinned, so the SQL twin still reproduces the doubles bit-for-bit.
    Token-less documents — including NULL text, whose token array is
    coalesced to empty exactly like :func:`doc_embedding`'s NULL lane —
    embed as the zero vector with ``n_tokens=0`` (normalize divides
    only positive norms — no NULL/NaN lane): one output row per input
    row, always.

    Returns ``(id_col, n_tokens, embedding)``."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        hash_fraction,
    )
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        spread_for_cpu,
    )

    df = spread_for_cpu(df)
    # NULL text tokenizes to a NULL array, which would neither reach
    # the explode nor match size == 0 (size(NULL) is NULL) — coalesce
    # to the empty array so NULL-text docs ride the zero-vector lane.
    base = df.select(
        F.col(id_col).alias("_id"),
        F.coalesce(tokens(F.lower(F.col(text_col))),
                   F.array().cast("array<string>")).alias("_t"))
    ex = base.select("_id", F.explode("_t").alias("w"))
    bucket = F.floor(hash_fraction(F.col("w"), salt) * dim).cast("int")
    sign = F.when(hash_fraction(F.col("w"), salt + "s") < 0.5,
                  F.lit(-1)).otherwise(F.lit(1))
    hist = (ex.select("_id", bucket.alias("b"), sign.alias("s"))
            .groupBy("_id", "b")
            .agg(F.sum("s").alias("v"), F.count("*").alias("c")))
    agg = hist.groupBy("_id").agg(
        F.sum("c").alias("n_tokens"),
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("b", "v"))))
        .alias("_m"))
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(F.element_at("_m", i.cast("int")),
                             F.lit(0).cast("long")).cast("double"))
    assembled = agg.select("_id", "n_tokens", vec.alias("embedding"))
    if normalize:
        nrm = F.sqrt(F.aggregate("embedding", F.lit(0.0),
                                 lambda acc, x: acc + x * x))
        assembled = assembled.select(
            "_id", "n_tokens",
            F.when(nrm > 0,
                   F.transform("embedding",
                               lambda x: F.round(x / nrm, 6)))
            .otherwise(F.col("embedding")).alias("embedding"))
    # token-less docs never reach the explode — union their zero-vector
    # lane back (a filter + union, not a corpus-wide join)
    zero = F.array(*[F.lit(0.0)] * dim)
    zero_docs = (base.filter(F.size("_t") == 0)
                 .select("_id", F.lit(0).cast("long").alias("n_tokens"),
                         zero.alias("embedding")))
    return (assembled.unionByName(zero_docs)
            .select(F.col("_id").alias(id_col), "n_tokens", "embedding"))
