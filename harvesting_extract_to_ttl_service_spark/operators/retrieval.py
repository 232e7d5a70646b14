"""Lexical ranked retrieval (BM25) and lexical+vector hybrid fusion.

The reference service (lblod/harvesting-extract-to-ttl-service) delegates
every query to its SPARQL store and ships no ranked retrieval; this module
is training-data extension surface (SURVEY.md §2C): corpus-scale lexical
search over the ``documents`` table — an inverted posting table, BM25
scoring (Robertson/Spärck Jones, with Lucene's always-positive
``ln(1 + (N − df + ½)/(df + ½))`` idf), a batched multi-query variant, and
reciprocal-rank fusion (Cormack, Clarke & Buettcher 2009) to combine the
lexical ranking with the ANN stack's semantic ranking
(operators/similarity.py) into one hybrid retriever.

Scale notes (the 100 TB posture):

* :func:`postings` is one explode + one map-side-combinable groupBy — the
  same shape as every signature table in dedup.py; the document length
  rides each posting row (denormalized, the classic inverted-index
  layout), so scoring never joins back to the corpus.
* The single-query path filters postings to the query's terms FIRST — an
  IN-list that reaches a parquet scan as a pushed filter when the postings
  are persisted (streaming/lexical_stream.py adds a term-hash bucket
  partition on top, so the scan prunes whole directories) — per-query work
  is proportional to the query terms' posting lists, not the corpus.
* Document frequency, N and avgdl are one tiny aggregate each and join
  back by broadcast — never a corpus-sized shuffle. N/avgdl come from
  integer aggregates (count + sum of longs), so they are exact and
  partition-order-independent.
* The batched variant broadcasts the query-term table by default (query
  batches are small next to the corpus), so the posting table never
  shuffles; with ``broadcast_queries=False`` it shuffles on ``term``,
  where a stopword-like term's posting list is the skew risk —
  ``max_df_ratio`` prunes terms present in more than that fraction of
  documents before the join (the standard IR guard doubling as the skew
  guard).
* Per-document scores are pinned left folds over term-sorted contribution
  lists (the repo's float-fold discipline) — engine- and partition-order-
  independent, so the DuckDB oracle restatement matches bit-for-bit; rank
  is assigned over the ROUNDED score with an id tiebreak, so orderings
  can't diverge in the last ulp either.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.column import Column

from harvesting_extract_to_ttl_service_spark.operators.text import tokens

DEFAULT_K1 = 1.2
DEFAULT_B = 0.75
DEFAULT_RRF_K = 60


def terms(text: Column) -> Column:
    """Retrieval tokenization: lowercased whitespace tokens, NULL-safe
    (a NULL text is an empty document, not a dropped row)."""
    return F.coalesce(tokens(F.lower(text)),
                      F.array().cast("array<string>"))


def postings(df: DataFrame, text_col: str = "text",
             id_col: str = "doc_id") -> DataFrame:
    """Inverted posting table ``(id, term, tf, dl)``: one row per
    (document, distinct term), with the document's total token count
    denormalized onto every row. One explode + one map-side-combinable
    groupBy; documents with no tokens yield no rows (they still count in
    :func:`corpus_stats`)."""
    t = terms(F.col(text_col))
    base = df.select(F.col(id_col).alias("id"), t.alias("_t"))
    exploded = base.select(
        "id", F.size("_t").alias("dl"), F.explode("_t").alias("term"))
    # dl is constant per id, so first() is deterministic
    return exploded.groupBy("id", "term").agg(
        F.count("*").alias("tf"), F.first("dl").alias("dl"))


def corpus_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """One-row corpus statistics ``(n_docs, sum_dl, avgdl)``. Integer
    count + integer sum (exact, order-independent), avgdl derived as one
    double division — the broadcastable scalar side of every BM25 plan."""
    t = terms(F.col(text_col))
    return (df.select(F.size(t).alias("dl"))
            .agg(F.count("*").alias("n_docs"),
                 F.coalesce(F.sum("dl"), F.lit(0)).alias("sum_dl"))
            .withColumn("avgdl", F.col("sum_dl").cast("double")
                        / F.col("n_docs")))


def bm25f_postings(df: DataFrame, field_weights: dict[str, float],
                   id_col: str = "doc_id") -> DataFrame:
    """Field-weighted inverted postings ``(id, term, tf, dl)`` — the
    simple BM25F form (Robertson, Zaragoza & Taylor 2004): per
    (document, term) the WEIGHTED term frequency ``tf = Σ_f w_f·tf_f``
    and per document the weighted length ``dl = Σ_f w_f·len_f``, both
    doubles, after which the ordinary BM25 saturation applies
    unchanged — so :func:`score_postings` and :func:`bm25_contrib`
    consume these rows verbatim. Document frequency downstream counts
    a document once per term no matter how many fields matched (one
    output row per (id, term) — standard BM25F idf).

    Same cost class as :func:`postings`: one explode per field (the
    field set is a handful of columns, not data-sized), one union, one
    map-side-combinable groupBy. Each exploded token carries its
    field's weight, so ``sum(w)`` IS ``Σ_f w_f·tf_f``.

    Determinism note: the weighted sums are double additions; with
    binary-representable weights (1.0, 2.0, 0.5, …) every partial sum
    is exact and partition-order-independent — use such weights when
    bit-reproducibility against an oracle matters (the catalog member
    does). A document NULL/empty in every field yields no rows but
    still counts in :func:`bm25f_corpus_stats`."""
    fields = _checked_fields(field_weights)
    wdl = _weighted_dl(fields)
    parts = [
        df.select(F.col(id_col).alias("id"), wdl.alias("dl"),
                  F.explode(terms(F.col(name))).alias("term"),
                  F.lit(float(w)).alias("w"))
        for name, w in fields]
    ex = parts[0]
    for p in parts[1:]:
        ex = ex.unionByName(p)
    return ex.groupBy("id", "term").agg(
        F.sum("w").alias("tf"), F.first("dl").alias("dl"))


def bm25f_corpus_stats(df: DataFrame,
                       field_weights: dict[str, float]) -> DataFrame:
    """One-row weighted corpus statistics ``(n_docs, sum_dl, avgdl)``
    over the field-weighted document lengths — the BM25F twin of
    :func:`corpus_stats` (``sum_dl`` is a double here; exact and
    order-independent when the weights are binary-representable, see
    :func:`bm25f_postings`)."""
    fields = _checked_fields(field_weights)
    return (df.select(_weighted_dl(fields).alias("dl"))
            .agg(F.count("*").alias("n_docs"),
                 F.coalesce(F.sum("dl"), F.lit(0.0)).alias("sum_dl"))
            .withColumn("avgdl", F.col("sum_dl") / F.col("n_docs")))


def _checked_fields(field_weights: dict[str, float]
                    ) -> list[tuple[str, float]]:
    """Normalize a field→weight dict to a name-sorted list (the pinned
    union and fold order); refuse empty/invalid weights up front."""
    if not field_weights:
        raise ValueError("bm25f: field_weights must name at least one "
                         "field")
    fields = sorted((str(n), float(w)) for n, w in field_weights.items())
    for name, w in fields:
        if not (w > 0.0):
            raise ValueError(f"bm25f: weight for field {name!r} must "
                             f"be > 0, got {w}")
    return fields


def _weighted_dl(fields: list[tuple[str, float]]) -> Column:
    """Σ_f w_f·len(tokens(field_f)) as one in-row expression — the
    addition order is the pinned name-sorted field order, identical on
    every row."""
    out = None
    for name, w in fields:
        term_cnt = F.lit(float(w)) * F.size(terms(F.col(name)))
        out = term_cnt if out is None else out + term_cnt
    return out.cast("double")


def bm25f_topk(df: DataFrame, query_terms: list[str],
               field_weights: dict[str, float], k: int = 10,
               k1: float = DEFAULT_K1, b: float = DEFAULT_B,
               id_col: str = "doc_id") -> DataFrame:
    """Field-weighted BM25 top-k (BM25F, simple form) →
    ``(id_col, rank, n_terms_hit, score)``: weighted tf/dl from
    :func:`bm25f_postings`, weighted avgdl from
    :func:`bm25f_corpus_stats`, then exactly the single-field scoring
    chain — same pushed term filter, same broadcast scalars, same
    pinned fold, same rounded-rank tail. A ``{"text": 1.0}`` weighting
    degenerates to :func:`bm25_topk` row for row."""
    qt = clean_query_terms(query_terms)
    ps = (bm25f_postings(df, field_weights, id_col)
          .filter(F.col("term").isin(qt)))
    agg = score_postings(ps, bm25f_corpus_stats(df, field_weights),
                         k1, b)
    return top_ranked(agg, k, id_col)


def clean_query_terms(query_terms: list[str]) -> list[str]:
    """Query-side twin of :func:`terms`: lowercase, drop empties,
    distinct, sorted (the fold order every score uses)."""
    return sorted({t.lower() for t in query_terms
                   if t is not None and t.strip() != ""})


def bm25_contrib(k1: float = DEFAULT_K1, b: float = DEFAULT_B) -> Column:
    """Per-(document, term) BM25 contribution over columns
    ``tf, dl, df, n_docs, avgdl``:

        idf(term) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))

    with ``idf = ln(1 + (N − df + 0.5)/(df + 0.5))`` (Lucene's BM25 idf —
    positive even for terms present in most documents, which matters on
    small-vocabulary corpora). Operand order mirrors the oracle SQL
    (plans/catalog_llm._bm25_sql) token for token so the doubles match."""
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + F.lit(0.5))
                / (F.col("df") + F.lit(0.5)))
    denom = (F.col("tf") + F.lit(float(k1))
             * (F.lit(1.0) - F.lit(float(b))
                + F.lit(float(b)) * F.col("dl") / F.col("avgdl")))
    return idf * (F.col("tf") * F.lit(float(k1) + 1.0)) / denom


def score_postings(ps: DataFrame, stats: DataFrame,
                   k1: float = DEFAULT_K1, b: float = DEFAULT_B,
                   group_cols: list[str] | None = None) -> DataFrame:
    """Score a (pre-filtered) posting table against a one-row stats
    frame: document frequency from the postings themselves (after any
    query-term filter, df of a term = its row count per group-free term),
    broadcast joins for the two scalar sides, then a pinned left fold of
    the term-sorted contributions per document. Shared verbatim by the
    ad-hoc path (:func:`bm25_topk`) and the persisted-index path
    (streaming/lexical_stream.bm25_search) so the two can never drift.
    (:func:`bm25_topk_join` does NOT reuse this helper: its df is
    computed once per term across queries and its max_df pruning sits
    between the two joins, so it builds the same contribution + fold
    chain inline and shares :func:`bm25_contrib`/:func:`fold_scores`
    instead.)"""
    group_cols = group_cols or ["id"]
    dfreq = ps.groupBy("term").agg(F.count("*").alias("df"))
    scored = (ps.join(F.broadcast(dfreq), "term")
              .crossJoin(F.broadcast(stats))
              .withColumn("contrib", bm25_contrib(k1, b)))
    return fold_scores(scored, group_cols)


def fold_scores(scored: DataFrame, group_cols: list[str]) -> DataFrame:
    """Pinned per-document score: sort the (term, contrib) structs, left-
    fold the contributions from 0.0 in term order, round to 6 — the same
    fold the DuckDB oracle states with list(c ORDER BY term) +
    list_reduce. ``n_terms_hit`` rides along for match diagnostics."""
    return (scored.groupBy(*group_cols)
            .agg(F.sort_array(
                F.collect_list(F.struct("term", "contrib"))).alias("_c"))
            .select(*group_cols,
                    F.size("_c").alias("n_terms_hit"),
                    F.round(F.aggregate(
                        "_c", F.lit(0.0),
                        lambda a, x: a + x["contrib"]), 6).alias("score")))


def top_ranked(agg: DataFrame, k: int, id_col: str) -> DataFrame:
    """Shared top-k tail over a scored frame ``(id, n_terms_hit,
    score)``: rounded-score ordering with id tiebreak, limit, rank —
    used verbatim by the ad-hoc path (:func:`bm25_topk`) and the
    persisted-index path (streaming/lexical_stream.bm25_search) so a
    tiebreak or rounding change cannot land in one and break their
    row-for-row parity."""
    top = agg.orderBy(F.col("score").desc(), F.col("id")).limit(k)
    return (_ranked(top, k, [F.col("score").desc(), F.col("id")])
            .select(F.col("id").alias(id_col), "rank", "n_terms_hit",
                    "score"))


def _ranked(df: DataFrame, k: int, order_cols: list[Column],
            part_cols: list[str] | None = None) -> DataFrame:
    w = (Window.partitionBy(*part_cols) if part_cols
         else Window.partitionBy())
    return (df.withColumn("rank",
                          F.row_number().over(w.orderBy(*order_cols)))
            .filter(F.col("rank") <= k))


def bm25_topk(df: DataFrame, query_terms: list[str], k: int = 10,
              k1: float = DEFAULT_K1, b: float = DEFAULT_B,
              text_col: str = "text",
              id_col: str = "doc_id") -> DataFrame:
    """Single-query BM25 top-k: ``(id_col, rank, n_terms_hit, score)``.
    Postings filter to the query's terms before anything else (the
    pushed-filter path once persisted); df/N/avgdl broadcast back; one
    groupBy(id) fold; top-k = orderBy(rounded score, id) + limit, rank
    assigned over the surviving ≤k rows (the unpartitioned window is k
    rows by construction, never corpus-sized).

    Cost note: the ad-hoc path tokenizes the corpus TWICE per query —
    once for the postings, once for the one-row stats — because
    sharing the tokenized frame between the two subtrees would require
    materializing it (corpus-sized) per query. This is the documented
    rebuild-per-query path; amortizing both scans is exactly what the
    persisted index (streaming/lexical_stream.py — postings AND
    additive stats stored once) is for."""
    qt = clean_query_terms(query_terms)
    ps = postings(df, text_col, id_col).filter(F.col("term").isin(qt))
    agg = score_postings(ps, corpus_stats(df, text_col), k1, b)
    return top_ranked(agg, k, id_col)


def bm25_topk_join(queries: DataFrame, docs: DataFrame, k: int = 10,
                   k1: float = DEFAULT_K1, b: float = DEFAULT_B,
                   max_df_ratio: float | None = None,
                   broadcast_queries: bool = True,
                   query_tf: float | None = None,
                   qid_col: str = "query_id", qtext_col: str = "text",
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """Batched BM25: top-k per query row →
    ``(qid_col, id_col, rank, n_terms_hit, score)``. Query texts tokenize
    with the SAME tokenizer as documents (distinct terms — classic BM25
    ignores query-side tf for short queries). The candidate join
    broadcasts the query-term table by default (the posting table never
    shuffles); ``broadcast_queries=False`` plans a shuffle join on
    ``term`` for query batches too large to broadcast — there
    ``max_df_ratio`` is the skew guard (drop terms in more than that
    fraction of documents before joining; a pruned term contributes
    nothing, exactly as if it were OOV). df is computed once per term
    (not per query) over the postings restricted to the union of query
    terms.

    ``query_tf=k3`` enables Robertson's query-side saturation for LONG
    queries (document-as-query, more-like-this): each term's
    contribution is weighted by ``(k3+1)·qtf/(k3+qtf)`` where qtf is
    the term's count in the query text — ``k3=0`` degenerates to the
    default (weight 1 for any qtf), large ``k3`` approaches raw qtf
    weighting (Robertson & Walker's k3, classically 8–1000). The
    weight rides the (qid, term) row through the same joins, so the
    plan shape is unchanged; ``None`` (default) skips the query-side
    groupBy entirely."""
    qterms = query_terms_frame(queries, query_tf, qid_col, qtext_col)
    ps = postings(docs, text_col, id_col)
    stats = corpus_stats(docs, text_col)
    return score_query_join(qterms, ps, stats, k, k1, b,
                            max_df_ratio, broadcast_queries,
                            query_tf is not None, qid_col, id_col)


def query_terms_frame(queries: DataFrame, query_tf: float | None,
                      qid_col: str = "query_id",
                      qtext_col: str = "text") -> DataFrame:
    """Tokenized query batch ``(qid, term[, wq])`` — distinct terms by
    default; with ``query_tf=k3`` each row carries Robertson's
    query-side saturation weight. Shared by :func:`bm25_topk_join` and
    the persisted-index twin (streaming/lexical_stream.
    bm25_search_batch) so the query-side convention can never drift."""
    if query_tf is None:
        return queries.select(
            F.col(qid_col).alias("qid"),
            F.explode(F.array_distinct(terms(F.col(qtext_col))))
            .alias("term"))
    k3 = float(query_tf)
    if k3 < 0.0:
        raise ValueError(f"bm25 batched query: query_tf={query_tf} "
                         f"must be >= 0")
    return (queries.select(F.col(qid_col).alias("qid"),
                           F.explode(terms(F.col(qtext_col)))
                           .alias("term"))
            .groupBy("qid", "term")
            .agg(F.count("*").alias("qtf"))
            .select("qid", "term",
                    ((F.col("qtf") * F.lit(k3 + 1.0))
                     / (F.col("qtf") + F.lit(k3))).alias("wq")))


def score_query_candidates(qterms: DataFrame | None, ps: DataFrame,
                           stats: DataFrame, k1: float, b: float,
                           max_df_ratio: float | None,
                           broadcast_queries: bool, weighted: bool,
                           ps_prefiltered: bool = False,
                           single_query: bool = False) -> DataFrame:
    """THE query-scoring core — every batched/stored BM25 path ends
    here, so the df convention, max_df pruning point, contribution
    arithmetic and per-(query, doc) fold can never drift between
    them: df once per term over the union of query terms, max_df
    pruning applied to the big side BEFORE any query fan-out, query
    broadcast (or term-shuffle) join, one-row stats broadcast, pinned
    fold → ``(qid, id, n_terms_hit, score)``. The top-k TAIL is the
    caller's: per-query window for batches (:func:`score_query_join`),
    plain orderBy+limit for a single query (the stored single-query
    path — a per-qid window would pay a shuffle for one partition).

    ``ps_prefiltered=True`` declares the posting table ALREADY
    restricted to the query terms (the stored-index read pushes the
    term IN-list into the scan), so the df aggregate skips the
    restriction join — one less broadcast per query.
    ``single_query=True`` (requires prefiltered + unweighted, with
    ``qterms=None``) additionally skips the query fan-out join — a
    single unweighted query's term set IS the prefilter, so every
    surviving posting row is a candidate with weight 1 and a constant
    qid rides in as a literal; the stored single-query path's plan is
    then the minimal one (scan → df broadcast → stats broadcast →
    fold) with zero per-query query-side jobs."""
    if single_query:
        if not ps_prefiltered or weighted or qterms is not None:
            raise ValueError(
                "score_query_candidates: single_query=True requires "
                "ps_prefiltered=True, weighted=False and qterms=None "
                "— the prefilter IS the query")
    if ps_prefiltered:
        dfreq = ps.groupBy("term").agg(F.count("*").alias("df"))
    else:
        uniq = qterms.select("term").distinct()
        dfreq = (ps.join(F.broadcast(uniq), "term")
                 .groupBy("term").agg(F.count("*").alias("df")))
    if max_df_ratio is not None:
        dfreq = (dfreq.crossJoin(F.broadcast(stats.select("n_docs")))
                 .filter(F.col("df")
                         <= F.lit(float(max_df_ratio)) * F.col("n_docs"))
                 .drop("n_docs"))
    # dfreq is ≤ |query vocabulary| rows — always broadcastable; joining
    # postings→dfreq first also APPLIES the max_df pruning to the big side
    # before any query fan-out
    cand = ps.join(F.broadcast(dfreq), "term")
    if single_query:
        cand = cand.withColumn("qid", F.lit(0).cast("long"))
    else:
        cand = (cand.join(F.broadcast(qterms), "term")
                if broadcast_queries
                else cand.repartition("term").join(qterms, "term"))
    contrib = bm25_contrib(k1, b)
    if weighted:
        contrib = contrib * F.col("wq")
    scored = (cand.crossJoin(F.broadcast(stats))
              .withColumn("contrib", contrib))
    return fold_scores(scored, ["qid", "id"])


def score_query_join(qterms: DataFrame, ps: DataFrame,
                     stats: DataFrame, k: int, k1: float, b: float,
                     max_df_ratio: float | None,
                     broadcast_queries: bool, weighted: bool,
                     qid_col: str, id_col: str,
                     ps_prefiltered: bool = False) -> DataFrame:
    """Batched top-k per query over :func:`score_query_candidates` —
    shared verbatim by the ad-hoc path (:func:`bm25_topk_join`) and
    the persisted-index path (streaming/lexical_stream.
    bm25_search_batch)."""
    agg = score_query_candidates(qterms, ps, stats, k1, b,
                                 max_df_ratio, broadcast_queries,
                                 weighted, ps_prefiltered)
    out = _ranked(agg, k, [F.col("score").desc(), F.col("id")], ["qid"])
    return out.select(F.col("qid").alias(qid_col),
                      F.col("id").alias(id_col),
                      "rank", "n_terms_hit", "score")


def reciprocal_rank_fusion(rankings: list[tuple[str, DataFrame]],
                           rrf_k: int = DEFAULT_RRF_K,
                           id_col: str = "doc_id",
                           rank_col: str = "rank",
                           qid_col: str | None = None) -> DataFrame:
    """Reciprocal-rank fusion over named rankings:
    ``rrf_score(d) = Σ_sources 1/(rrf_k + rank_source(d))`` →
    ``(id_col, n_sources, rrf_score)``. Rank-only fusion needs no score
    calibration between lexical and vector retrievers — the reason it is
    the standard hybrid combiner. Each input must hold one row per id;
    ids missing from a source simply contribute nothing. The fold is
    pinned in source-name order (sorted struct list), so the double is
    reproducible no matter how the union's partitions land.

    ``qid_col`` names a per-QUERY grouping column present in every
    input (batched hybrid retrieval): fusion then runs per (query, id)
    and the column rides through the output — per query identical to
    fusing that query's rankings alone."""
    names = [n for n, _ in rankings]
    if len(set(names)) != len(names):
        raise ValueError(f"reciprocal_rank_fusion: duplicate source "
                         f"names {names}")
    tagged = None
    for name, r in rankings:
        cols = [F.lit(name).alias("src"),
                F.col(id_col).alias("id"),
                F.col(rank_col).cast("long").alias("rank")]
        if qid_col is not None:
            cols.insert(0, F.col(qid_col).alias("qid"))
        d = r.select(*cols)
        tagged = d if tagged is None else tagged.unionByName(d)
    assert tagged is not None
    keys = (["qid"] if qid_col is not None else []) + ["id"]
    out = (tagged.groupBy(*keys)
           .agg(F.sort_array(
               F.collect_list(F.struct("src", "rank"))).alias("_r")))
    head = ([F.col("qid").alias(qid_col)]
            if qid_col is not None else [])
    return out.select(
        *head, F.col("id").alias(id_col),
        F.size("_r").alias("n_sources"),
        F.round(F.aggregate(
            "_r", F.lit(0.0),
            lambda a, x: a + F.lit(1.0)
            / (F.lit(rrf_k) + x["rank"])), 6)
        .alias("rrf_score"))


def hybrid_topk(docs: DataFrame, vecs: DataFrame,
                query_terms: list[str], query_vec: list[float],
                k: int = 10, n_candidates: int = 50,
                rrf_k: int = DEFAULT_RRF_K,
                k1: float = DEFAULT_K1, b: float = DEFAULT_B,
                text_col: str = "text", id_col: str = "doc_id",
                vec_col: str = "embedding",
                vec_id_col: str = "vec_id") -> DataFrame:
    """Hybrid lexical+semantic retrieval: BM25 top-``n_candidates`` over
    the text corpus and exact cosine top-``n_candidates`` over the
    embedding table (ids must agree), fused by reciprocal rank →
    ``(id_col, rank, n_sources, rrf_score)``. Swap the cosine side for
    ivf_search / pq_adc_topk at scale — fusion only consumes (id, rank),
    so any retriever with a rank column plugs in."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        cosine_topk,
    )

    lex = bm25_topk(docs, query_terms, k=n_candidates, k1=k1, b=b,
                    text_col=text_col, id_col=id_col)
    sem = cosine_topk(vecs, query_vec, k=n_candidates, vec_col=vec_col,
                      id_col=vec_id_col)
    # cosine_topk returns ordered-but-unranked rows; rank them the way
    # they were selected (rounded score desc, id) — ≤ n_candidates rows
    sem = _ranked(sem, n_candidates,
                  [F.col("cos_sim").desc(), F.col(vec_id_col)]).select(
        F.col(vec_id_col).alias(id_col), "rank")
    fused = reciprocal_rank_fusion(
        [("lex", lex.select(id_col, "rank")), ("vec", sem)],
        rrf_k=rrf_k, id_col=id_col)
    top = (fused.orderBy(F.col("rrf_score").desc(), F.col(id_col))
           .limit(k))
    return (_ranked(top, k, [F.col("rrf_score").desc(), F.col(id_col)])
            .select(id_col, "rank", "n_sources", "rrf_score"))


def positional_postings(df: DataFrame, text_col: str = "text",
                        id_col: str = "doc_id") -> DataFrame:
    """Positional inverted postings ``(id, term, positions, tf, dl)`` —
    the :func:`postings` layout plus each term's 0-based token offsets,
    the structure phrase and proximity queries need. Same shape and
    cost class: one posexplode + one map-side-combinable groupBy."""
    t = terms(F.col(text_col))
    base = df.select(F.col(id_col).alias("id"), t.alias("_t"))
    exploded = base.select(
        "id", F.size("_t").alias("dl"),
        F.posexplode("_t").alias("pos", "term"))
    return (exploded.groupBy("id", "term")
            .agg(F.collect_list("pos").alias("positions"),
                 F.count("*").alias("tf"),
                 F.first("dl").alias("dl")))


def phrase_counts(df: DataFrame, phrase: list[str],
                  text_col: str = "text",
                  id_col: str = "doc_id") -> DataFrame:
    """Documents containing the EXACT phrase (adjacent tokens, in
    order), with its occurrence count: ``(id, phrase_tf, dl)``. The
    classic positional-index evaluation — word i's positions shift by
    −i and the arrays intersect, so a document matches iff the running
    intersection survives every word. Joins are keyed on the document
    id over TERM-FILTERED postings (each side is one word's posting
    list, not the corpus), and the running ``size > 0`` filter prunes
    non-matching docs after every join. Overlapping occurrences count
    individually ("a a a" contains "a a" twice — the positional-
    intersection convention); repeated phrase words need no special
    case, the same posting row just joins under two shifts."""
    words = clean_phrase(phrase)
    pp = positional_postings(df, text_col, id_col)
    return phrase_intersect(pp, words)


def clean_phrase(phrase: list[str]) -> list[str]:
    """Phrase normalization: lowercase, drop empties, KEEP order and
    repeats (unlike :func:`clean_query_terms` — a phrase is a sequence,
    not a set)."""
    words = [w.lower() for w in phrase
             if w is not None and w.strip() != ""]
    if not words:
        raise ValueError("phrase_counts: empty phrase")
    return words


def phrase_intersect(pp: DataFrame, words: list[str],
                     rarest_first: bool = True) -> DataFrame:
    """The positional-intersection core over an existing positional-
    postings frame ``(id, term, positions, dl, …)`` — shared verbatim by
    the ad-hoc path (:func:`phrase_counts`) and the persisted-index path
    (streaming/lexical_stream.phrase_search) so the two can never
    drift. ``words`` must already be normalized (:func:`clean_phrase`).

    ``rarest_first`` (default) orders the join chain by ascending
    document frequency instead of phrase order — the standard
    positional-index refinement: every intermediate is bounded by the
    rarest word processed so far, so a 6-word quote whose third word is
    rare costs rare-sized joins, not common-sized ones. The df counts
    come from one tiny aggregate over the already term-filtered posting
    lists (≤ phrase-length rows collected). Result-invariant: every
    word ``i`` shifts its offsets by ``−i`` regardless of processing
    order, so the running intersection is the same SET under any
    order — only the intermediate sizes change (tests pin the parity,
    SCALE.md the size drop). A phrase word absent from the corpus has
    df 0 and sorts first, emptying the chain at its cheapest point."""
    pp = pp.filter(F.col("term").isin(sorted(set(words))))
    chain = _phrase_chain_order(pp, words, rarest_first)
    i0, w0 = chain[0]
    base = (pp.filter(F.col("term") == w0)
            .select("id", F.transform(
                "positions", lambda x: x - i0).alias("acc"), "dl"))
    for i, w in chain[1:]:
        nxt = (pp.filter(F.col("term") == w)
               .select("id", F.transform(
                   "positions", lambda x: x - i).alias("_p")))
        base = (base.join(nxt, "id")
                .withColumn("acc", F.array_intersect("acc", "_p"))
                .drop("_p")
                .filter(F.size("acc") > 0))
    return base.select("id", F.size("acc").alias("phrase_tf"), "dl")


def _phrase_chain_order(pp: DataFrame, words: list[str],
                        rarest_first: bool) -> list[tuple[int, str]]:
    """Processing order for the phrase chain as (phrase-offset, word)
    pairs: phrase order, or ascending df with the phrase offset as the
    deterministic tiebreak (repeated words share one df). Exposed for
    the chain-order tests."""
    chain = list(enumerate(words))
    if not rarest_first or len(words) <= 1:
        return chain
    dfs = {r["term"]: r["cnt"]
           for r in pp.groupBy("term")
           .agg(F.count("*").alias("cnt")).collect()}
    return sorted(chain, key=lambda iw: (dfs.get(iw[1], 0), iw[0]))


def score_phrase_counts(pc: DataFrame, stats: DataFrame, k: int,
                        k1: float = DEFAULT_K1, b: float = DEFAULT_B,
                        id_col: str = "doc_id",
                        tf_name: str = "phrase_tf") -> DataFrame:
    """Rank positional matches ``(id, <tf_name>, dl)`` as one BM25 unit
    against a one-row stats frame — the scoring tail shared by
    :func:`phrase_topk`, :func:`proximity_topk` and their
    persisted-index twins (``tf_name`` names the occurrence-count
    column in both input and output). df = matching document count,
    computed from the matches themselves — the match table is
    materialized once (matching docs only, bounded) so the df
    aggregate and the scoring pass don't each re-run the join
    chain."""
    from harvesting_extract_to_ttl_service_spark.operators.materialize import (
        materialize,
    )

    pc = materialize(pc, "local_checkpoint")
    dfreq = pc.agg(F.count("*").alias("df"))
    scored = (pc.withColumnRenamed(tf_name, "tf")
              .crossJoin(F.broadcast(stats))
              .crossJoin(F.broadcast(dfreq))
              .select("id", F.col("tf").alias(tf_name),
                      F.round(bm25_contrib(k1, b), 6).alias("score")))
    top = scored.orderBy(F.col("score").desc(), F.col("id")).limit(k)
    return (_ranked(top, k, [F.col("score").desc(), F.col("id")])
            .select(F.col("id").alias(id_col), "rank", tf_name,
                    "score"))


def phrase_topk(df: DataFrame, phrase: list[str], k: int = 10,
                k1: float = DEFAULT_K1, b: float = DEFAULT_B,
                text_col: str = "text",
                id_col: str = "doc_id") -> DataFrame:
    """BM25 top-k treating the exact phrase as one indexing unit:
    tf = the document's phrase occurrences, df = how many documents
    contain the phrase at all, same saturation/length normalization —
    → ``(id_col, rank, phrase_tf, score)``. Reuses
    :func:`bm25_contrib` verbatim (single unit → no fold needed), so
    the scoring arithmetic is pinned to the same operand order the
    oracle states."""
    pc = phrase_counts(df, phrase, text_col, id_col)
    return score_phrase_counts(pc, corpus_stats(df, text_col), k,
                               k1, b, id_col)


def clean_prox_terms(terms_: list[str]) -> list[str]:
    """Proximity-query normalization: lowercase, drop empties, keep the
    FIRST term as the anchor (it defines the semantics — see
    :func:`proximity_counts`) and dedupe the rest (NEAR is a set
    condition; a repeated term adds nothing)."""
    words = [t.lower() for t in terms_
             if t is not None and t.strip() != ""]
    if not words:
        raise ValueError("proximity_counts: empty term list")
    anchor = words[0]
    seen, rest = {anchor}, []
    for w in words[1:]:
        if w not in seen:
            seen.add(w)
            rest.append(w)
    return [anchor] + rest


def proximity_intersect(pp: DataFrame, terms_: list[str],
                        window: int,
                        rarest_first: bool = True) -> DataFrame:
    """The NEAR-operator core over a positional-postings frame
    ``(id, term, positions, dl, …)`` — shared by the ad-hoc path
    (:func:`proximity_counts`) and the persisted-index path
    (streaming/lexical_stream.proximity_search). ``terms_`` must
    already be normalized (:func:`clean_prox_terms`).

    tf = the number of ANCHOR (first-term) occurrences that have every
    other term within ``±window`` token offsets — well defined because
    the anchor is fixed by the query, while the OTHER terms are pure
    conjunctive filters over the anchor's position list, so their
    processing order cannot change the result; ``rarest_first``
    (default) orders them by ascending df exactly like
    :func:`phrase_intersect`, pruning the intermediate earliest. Each
    step is one id-keyed join of term-filtered posting lists plus one
    nested higher-order filter (no UDF)."""
    if window < 1:
        raise ValueError(f"proximity_intersect: window={window} "
                         f"must be >= 1")
    anchor, others = terms_[0], terms_[1:]
    pp = pp.filter(F.col("term").isin(sorted(set(terms_))))
    base = (pp.filter(F.col("term") == anchor)
            .select("id", F.col("positions").alias("acc"), "dl"))
    chain = list(enumerate(others, 1))
    if rarest_first and len(others) > 1:
        dfs = {r["term"]: r["cnt"]
               for r in pp.filter(F.col("term").isin(others))
               .groupBy("term").agg(F.count("*").alias("cnt"))
               .collect()}
        chain.sort(key=lambda iw: (dfs.get(iw[1], 0), iw[0]))
    for _i, t in chain:
        nxt = (pp.filter(F.col("term") == t)
               .select("id", F.col("positions").alias("_p")))
        base = (base.join(nxt, "id")
                .withColumn("acc", F.filter(
                    "acc", lambda p: F.exists(
                        "_p", lambda q: F.abs(q - p)
                        <= F.lit(int(window)))))
                .drop("_p")
                .filter(F.size("acc") > 0))
    return base.select("id", F.size("acc").alias("prox_tf"), "dl")


def proximity_counts(df: DataFrame, terms_: list[str], window: int,
                     text_col: str = "text",
                     id_col: str = "doc_id") -> DataFrame:
    """Documents where every query term occurs within ``±window``
    tokens of the ANCHOR term (``terms_[0]``), with the qualifying
    anchor-occurrence count: ``(id, prox_tf, dl)`` — the classic NEAR
    operator over a positional index, the relaxation of
    :func:`phrase_counts` for when order and adjacency don't matter
    ("error" NEAR/5 "timeout")."""
    words = clean_prox_terms(terms_)
    pp = positional_postings(df, text_col, id_col)
    return proximity_intersect(pp, words, window)


def proximity_topk(df: DataFrame, terms_: list[str], window: int,
                   k: int = 10, k1: float = DEFAULT_K1,
                   b: float = DEFAULT_B, text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """BM25 top-k treating the NEAR group as one indexing unit
    (tf = qualifying anchor occurrences, df = documents where the
    group co-occurs within the window) →
    ``(id_col, rank, prox_tf, score)`` — the same one-unit scoring
    tail as :func:`phrase_topk`."""
    pc = proximity_counts(df, terms_, window, text_col, id_col)
    return score_phrase_counts(pc, corpus_stats(df, text_col), k,
                               k1, b, id_col, tf_name="prox_tf")


def raw_tokens(text: Column) -> Column:
    """Whitespace tokens of the ORIGINAL text — no lowercasing, NULL-
    safe. Same token boundaries as :func:`terms` (lowercasing never
    changes whitespace), so a raw window slice aligns token-for-token
    with a hit scan that matched case-insensitively."""
    return F.coalesce(tokens(text), F.array().cast("array<string>"))


def _snippet_frame(base: DataFrame, width: int,
                   max_snippets: int) -> DataFrame:
    """The per-row snippet core over a frame carrying ``_t`` (token
    array) and ``_qt`` (LOWERCASE query-term array — per row, so a
    batched caller can give every result row its own query's terms):
    0-based hit offsets where ``lower(token) ∈ _qt``, up to
    ``max_snippets`` windows of ``±width`` tokens re-joined to
    strings. Adds ``n_matches`` and ``snips``, drops the scratch
    columns. Pure column expressions — no UDF."""
    if width < 0:
        raise ValueError(f"snippets: width={width} must be >= 0")
    if max_snippets < 1:
        raise ValueError(
            f"snippets: max_snippets={max_snippets} must be >= 1")
    # the size>0 guard matters because sequence(0, -1) DESCENDS rather
    # than being empty
    hits = F.when(
        F.size("_t") > 0,
        F.filter(F.sequence(F.lit(0), F.size("_t") - F.lit(1)),
                 lambda i: F.array_contains(
                     F.col("_qt"), F.lower(F.element_at("_t", i + 1))))
    ).otherwise(F.array().cast("array<int>"))
    base = base.withColumn("_h", hits)
    first = F.slice("_h", 1, max_snippets)
    win = F.transform(
        first,
        lambda p: F.array_join(
            F.slice("_t",
                    F.greatest(p - F.lit(width), F.lit(0)) + F.lit(1),
                    F.least(p + F.lit(width),
                            F.size("_t") - F.lit(1))
                    - F.greatest(p - F.lit(width), F.lit(0))
                    + F.lit(1)),
            " "))
    return (base.withColumn("n_matches", F.size("_h"))
            .withColumn("snips", win)
            .drop("_t", "_qt", "_h"))


def snippets(df: DataFrame, query_terms: list[str], width: int = 3,
             max_snippets: int = 2, text_col: str = "text",
             id_col: str = "doc_id", raw: bool = False) -> DataFrame:
    """Search-result snippets: for every document matching ANY query
    term, up to ``max_snippets`` windows of ``±width`` tokens around
    the earliest hits, each window re-joined to one string →
    ``(id_col, n_matches, snips array<string>)``. Pure column
    expressions end to end (token split, hit-position scan, window
    slice, join) — no UDF, so snippet extraction rides the same scan
    as the ranking that selected the documents. Windows are token-
    aligned; overlapping hit windows are emitted per hit, not merged
    (the classic cheap convention). Non-matching and NULL/empty
    documents yield no rows.

    ``raw=False`` (default) slices the retrieval tokenizer's view —
    lowercase tokens, echoing exactly what MATCHED. ``raw=True``
    slices the ORIGINAL text split on the same whitespace boundaries
    (user-displayable casing) while the hit scan still matches
    case-insensitively — hit offsets and ``n_matches`` are identical
    between the two modes (the tests pin it), only the echoed casing
    differs."""
    qt = clean_query_terms(query_terms)
    tok = raw_tokens(F.col(text_col)) if raw else terms(F.col(text_col))
    base = df.select(
        F.col(id_col).alias("id"), tok.alias("_t"),
        F.array(*[F.lit(t) for t in qt]).cast("array<string>")
        .alias("_qt"))
    return (_snippet_frame(base, width, max_snippets)
            .filter(F.col("n_matches") > 0)
            .select(F.col("id").alias(id_col), "n_matches", "snips"))
