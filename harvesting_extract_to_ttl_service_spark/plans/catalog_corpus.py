"""Training-corpus construction catalog (SURVEY.md §2C extension surface):
deterministic stratified sampling, temperature data mixing, shard
assignment, and concatenate-and-chunk sequence packing over the
`documents` fixture — the post-dedup stage of an LLM data pipeline
(operators/corpus.py).

Every decision is an md5-derived hash function of the row id, so the
DuckDB oracle recomputes sample membership / shard ids / chunk offsets
bit-for-bit; the one cross-row float sum (the mixture denominator) is
folded over a stratum-sorted array in BOTH engines so addition order
cannot flip the hash.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.operators.corpus import (
    assign_shards,
    benchmark_contamination,
    benchmark_contamination_minhash,
    capped_stratified_sample,
    corpus_report,
    epoch_shuffle,
    hash_fraction_sql,
    pack_chunk_stats,
    pack_chunks,
    temperature_mixture,
)
from harvesting_extract_to_ttl_service_spark.operators.text import token_count
from harvesting_extract_to_ttl_service_spark.operators.web import url_host_sql
from harvesting_extract_to_ttl_service_spark.plans.suites import (
    member_sql,
    suite_df,
    suite_sql,
)
from harvesting_extract_to_ttl_service_spark.plans.tables import load

QUERIES = {}
ORACLES = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


# Whitespace tokens over the RAW text (operators/text.py `tokens` — no
# lowercasing, unlike the dedup shingle path).
_TOKS = "list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '')"

_SAMPLE_CAP = 100
_MIX_ALPHA = 0.5
_MIX_BUDGET = 1_000_000
_N_SHARDS = 8
_TS_BUDGET = 10_000  # << corpus token mass, so tsample rates land below 1
_PACK_BUDGET = 2_000

_SHARD_EXPR = (f"CAST(concat('0x', substr(md5(concat(CAST(doc_id AS VARCHAR),"
               f" ':shard')), 1, 8)) AS BIGINT) % {_N_SHARDS}")


@member_sql(f"""
WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang)
SELECT d.doc_id, d.lang
FROM documents d JOIN c ON d.lang = c.lang
WHERE {hash_fraction_sql('d.doc_id')} < least(1.0, {float(_SAMPLE_CAP)} / c.n)
""")
def corpus_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Capped stratified sampling: over-represented languages are
    downsampled toward {cap} expected docs via a deterministic per-row
    hash fraction — membership is a pure function of doc_id, verified
    row-for-row by the oracle (impossible with `rand()`/`df.sample`)."""
    docs = load(spark, sf_dir, "documents")
    return capped_stratified_sample(docs, cap=_SAMPLE_CAP).select(
        "doc_id", "lang")


@member_sql(f"""
WITH c AS (
  SELECT lang, count(*) AS n_docs,
         sum(len({_TOKS})) AS n_tokens,
         pow(count(*), {_MIX_ALPHA}) AS w
  FROM documents GROUP BY lang
), d AS (
  SELECT list_reduce(list(w ORDER BY lang), (x, y) -> x + y) AS denom FROM c
)
SELECT lang, n_docs, n_tokens,
       round(w / denom, 6) AS share,
       round({float(_MIX_BUDGET)} * w / denom, 0) AS alloc_tokens
FROM c, d
""")
def corpus_mix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature data mixing (share ∝ n^alpha, alpha=0.5): per-language
    token-budget allocation for corpus re-balancing; the denominator sum
    folds a lang-sorted array in both engines (float addition order)."""
    docs = load(spark, sf_dir, "documents")
    return temperature_mixture(docs, alpha=_MIX_ALPHA,
                               budget_tokens=_MIX_BUDGET)


@member_sql(f"""
SELECT {_SHARD_EXPR} AS shard, count(*) AS n_docs,
       sum(len({_TOKS})) AS n_tokens
FROM documents GROUP BY 1
""")
def corpus_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic shard assignment (md5 mod n — content-addressed and
    engine-portable, unlike Spark's seeded murmur `hash()`): per-shard doc
    and token totals, the balance check before a partitionBy('shard')
    training-shard write."""
    docs = assign_shards(load(spark, sf_dir, "documents"), _N_SHARDS)
    return docs.groupBy("shard").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count(F.col("text"))).alias("n_tokens"))


@member_sql(f"""
WITH t AS (
  SELECT doc_id, {_SHARD_EXPR} AS shard, len({_TOKS}) AS toks
  FROM documents
), s AS (
  SELECT shard, doc_id, toks,
         coalesce(sum(toks) OVER (PARTITION BY shard ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS start
  FROM t
)
SELECT shard, CAST(floor(start / {float(_PACK_BUDGET)}) AS BIGINT) AS chunk,
       count(*) AS n_docs, sum(toks) AS n_tokens
FROM s GROUP BY 1, 2
""")
def corpus_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concatenate-and-chunk packing: each shard's docs concatenate in id
    order and cut into {budget}-token context windows; a doc lands in the
    chunk where it starts. One window cumsum per shard — the shuffle is
    the shard partitioning itself, no global sort."""
    docs = assign_shards(load(spark, sf_dir, "documents"), _N_SHARDS)
    return pack_chunk_stats(docs, budget_tokens=_PACK_BUDGET)


def _decontam_oracle(shingle_n: int = 3, min_overlap: int = 2,
                     bench_from: int = 480) -> str:
    """DuckDB restatement of the shingle-overlap contamination check
    (lowercased word n-grams, per-doc distinct — the dedup `shingles`
    semantics, same fragments as catalog_llm's LSH oracles)."""
    from harvesting_extract_to_ttl_service_spark.plans.catalog_llm import (
        _WORDS,
        _grams_sql,
    )

    return f"""
WITH corpus AS (
  SELECT doc_id, {_WORDS} AS w FROM documents WHERE doc_id < {bench_from}
), bench AS (
  SELECT doc_id AS bench_id, {_WORDS} AS w
  FROM documents WHERE doc_id >= {bench_from}
), cg AS (
  SELECT doc_id, unnest({_grams_sql(shingle_n)}) AS g FROM corpus
), bg AS (
  SELECT bench_id, unnest({_grams_sql(shingle_n)}) AS g FROM bench
)
SELECT cg.doc_id, bg.bench_id, count(*) AS n_overlap
FROM cg JOIN bg USING (g)
GROUP BY 1, 2 HAVING count(*) >= {min_overlap}
"""


@member_sql(_decontam_oracle())
def corpus_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: corpus docs (id < 480) sharing ≥ 2
    distinct 3-gram shingles with any eval doc (id ≥ 480). The eval
    side's shingles broadcast; the corpus never shuffles its text."""
    docs = load(spark, sf_dir, "documents")
    return benchmark_contamination(
        docs.filter(F.col("doc_id") < 480),
        docs.filter(F.col("doc_id") >= 480))


_MH_DECONTAM_T = 0.3
_MH_HASHES = 32
_MH_BANDS = 16  # 2 rows/band — wide banding for moderate-similarity leakage


def _decontam_mh_oracle(num_hashes: int = _MH_HASHES,
                        bands: int = _MH_BANDS,
                        threshold: float = _MH_DECONTAM_T,
                        shingle_n: int = 3,
                        bench_from: int = 480,
                        n_para: int = 20) -> str:
    """DuckDB restatement of the banded-MinHash decontam: same signature
    family / coefficients as the dedup LSH oracles (catalog_llm), banded
    2 rows per band. The eval side = real tail docs (id ≥ 480) UNION
    planted paraphrases of docs 0..19 (every 6th raw token → 'xsub',
    bench_id = doc_id + 10000) — the oracle restates both the paraphrase
    CONSTRUCTION and its detection independently."""
    from harvesting_extract_to_ttl_service_spark.plans.catalog_llm import (
        _HASH32,
        _WORDS,
        _WORDS_RAW,
        _grams_sql,
        _minhash_sig_sql,
    )

    rows = num_hashes // bands
    sig = _minhash_sig_sql(num_hashes)
    grams = _grams_sql(shingle_n)
    return f"""
WITH braw AS (
  SELECT doc_id, text FROM documents WHERE doc_id >= {bench_from}
  UNION ALL
  SELECT doc_id + 10000 AS doc_id,
         array_to_string([CASE WHEN (i - 1) % 6 = 5 THEN 'xsub' ELSE w[i] END
                          for i in range(1, len(w) + 1)], ' ') AS text
  FROM (SELECT doc_id, {_WORDS_RAW} AS w
        FROM documents WHERE doc_id < {n_para})
), cw AS (
  SELECT doc_id, {_WORDS} AS w FROM documents WHERE doc_id < {bench_from}
), bw AS (
  SELECT doc_id, {_WORDS} AS w FROM braw
), csig AS (
  SELECT doc_id, {sig} AS sig FROM (
    SELECT doc_id, list_transform({grams}, g -> {_HASH32}) AS hs FROM cw)
), bsig AS (
  SELECT doc_id, {sig} AS sig FROM (
    SELECT doc_id, list_transform({grams}, g -> {_HASH32}) AS hs FROM bw)
), cband AS (
  SELECT doc_id, b,
         md5(array_to_string(sig[{rows}*b+1:{rows}*b+{rows}], ',')) AS bh
  FROM csig, (SELECT unnest(range(0, {bands})) AS b)
), bband AS (
  SELECT doc_id, b,
         md5(array_to_string(sig[{rows}*b+1:{rows}*b+{rows}], ',')) AS bh
  FROM bsig, (SELECT unnest(range(0, {bands})) AS b)
), cand AS (
  SELECT DISTINCT a.doc_id AS cid, b.doc_id AS bid
  FROM cband a JOIN bband b ON a.b = b.b AND a.bh = b.bh
), est AS (
  SELECT cid, bid,
         CAST(list_reduce(list_transform(list_zip(sa.sig, sb.sig),
                     z -> CASE WHEN z[1] = z[2] THEN 1 ELSE 0 END),
                     (x, y) -> x + y) AS DOUBLE) / {num_hashes} AS est
  FROM cand JOIN csig sa ON cid = sa.doc_id JOIN bsig sb ON bid = sb.doc_id
)
SELECT cid AS doc_id, bid AS bench_id, round(est, 4) AS est_jaccard
FROM est WHERE est >= {threshold}
"""


@member_sql(_decontam_mh_oracle())
def corpus_decontam_mh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded-MinHash decontamination (the paraphrase-robust mode of
    `build_training_corpus`): corpus docs (id < 480) whose estimated
    Jaccard vs any eval doc reaches 0.3. The eval side is the real tail
    (id ≥ 480) plus PLANTED light paraphrases of docs 0..19 (every 6th
    token substituted, bench_id = doc_id + 10000) — exactly the leakage
    shape exact-shingle decontam under-weights. The eval side's banded
    signature table broadcasts; banding is 16 bands × 2 rows so
    moderate-similarity pairs still collide (1-(1-j²)^16)."""
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        tokens,
    )

    docs = load(spark, sf_dir, "documents")
    toks = tokens(F.col("text"))
    para = docs.filter(F.col("doc_id") < 20).select(
        (F.col("doc_id") + 10000).alias("doc_id"),
        F.concat_ws(" ", F.transform(
            toks,
            lambda x, i: F.when(i % 6 == F.lit(5), F.lit("xsub"))
            .otherwise(x))).alias("text"))
    bench = docs.filter(F.col("doc_id") >= 480).select("doc_id", "text") \
        .unionByName(para)
    return benchmark_contamination_minhash(
        docs.filter(F.col("doc_id") < 480), bench,
        num_hashes=_MH_HASHES, bands=_MH_BANDS,
        threshold=_MH_DECONTAM_T,
    ).select("doc_id", "bench_id",
             F.round("est_jaccard", 4).alias("est_jaccard"))


# lowered whitespace tokens — the repetition bigrams tokenize like the
# dedup shingles (operators/text.py tokens(lower(text)))
_TOKS_LOW = "list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x != '')"


@member_sql(f"""
WITH t AS (
  SELECT doc_id, string_split(text, chr(10)) AS lines, {_TOKS_LOW} AS w
  FROM documents WHERE doc_id < 100
), bg AS (
  SELECT doc_id,
         unnest([array_to_string(w[i:i+1], ' ')
                 for i in range(1, greatest(len(w) - 1, 0) + 1)]) AS g
  FROM t WHERE len(w) >= 2
), bc AS (
  SELECT doc_id, g, count(*) AS c FROM bg GROUP BY 1, 2
), bs AS (
  SELECT doc_id, max(c) AS mx, sum(c) AS tot FROM bc GROUP BY 1
)
SELECT t.doc_id,
       len(lines) AS n_lines,
       round(CASE WHEN len(lines) > 0
             THEN 1.0 - CAST(len(list_distinct(lines)) AS DOUBLE) / len(lines)
             ELSE 0.0 END, 4) AS dup_line_ratio,
       round(coalesce(CAST(mx AS DOUBLE) / tot, 0.0), 4) AS top_bigram_ratio
FROM t LEFT JOIN bs ON t.doc_id = bs.doc_id
""")
def corpus_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition quality signals (duplicate-line ratio, top-bigram
    share) over the first 100 docs — the Gopher-style filters a corpus
    build runs alongside the composite quality score."""
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        repetition_signals,
    )

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return repetition_signals(docs).select(
        "doc_id", "n_lines", "dup_line_ratio", "top_bigram_ratio")


@member_sql("""
WITH t AS (
  SELECT doc_id,
         text || CASE doc_id % 4
           WHEN 0 THEN ' contact bob' || doc_id || '@example.com now'
           WHEN 1 THEN ' see https://ex.org/d/' || doc_id || ' page'
           WHEN 2 THEN ' call +3225551234 now'
           ELSE '' END AS text
  FROM documents WHERE doc_id < 200
)
SELECT doc_id,
       len(regexp_extract_all(text,
           '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS n_emails,
       len(regexp_extract_all(text, 'https?://[^\\s]+')) AS n_urls,
       len(regexp_extract_all(text,
           '\\+?[0-9][0-9()\\-. ]{7,}[0-9]')) AS n_phones
FROM t
""")
def corpus_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII/contact-info signal counts over docs with planted emails /
    URLs / phone numbers (the fixture corpus is clean, so the member
    synthesizes deterministic contact strings per doc_id class — the
    triage_dirty_literals pattern; the oracle restates construction AND
    detection independently). Detector regexes avoid lookaround so Java
    regex and RE2 agree match-for-match."""
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        pii_signals,
    )

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 4 == 0,
                   F.concat(F.lit(" contact bob"), F.col("doc_id"),
                            F.lit("@example.com now")))
            .when(F.col("doc_id") % 4 == 1,
                  F.concat(F.lit(" see https://ex.org/d/"),
                           F.col("doc_id"), F.lit(" page")))
            .when(F.col("doc_id") % 4 == 2, F.lit(" call +3225551234 now"))
            .otherwise(F.lit(""))).alias("text"))
    return pii_signals(injected).select(
        "doc_id", "n_emails", "n_urls", "n_phones")


# The redact oracle restates the sequential rule application as explicit
# stages: each stage counts the kind's matches on the PREVIOUS stage's
# text, then rewrites — exactly redact_pii's chained-expression contract.
_REDACT_EMAIL = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
_REDACT_IP = "\\b(?:[0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
_REDACT_PHONE = "\\+?[0-9][0-9()\\-. ]{7,}[0-9]"

_REDACT_SQL = f"""
WITH t0 AS (
  SELECT doc_id,
         text || CASE doc_id % 4
           WHEN 0 THEN ' contact bob' || doc_id || '@example.com now'
           WHEN 1 THEN ' server at 10.0.0.' || (doc_id % 250) || ' up'
           WHEN 2 THEN ' call +3225551234 now'
           ELSE '' END AS text
  FROM documents WHERE doc_id < 200
), s1 AS (
  SELECT doc_id,
         len(regexp_extract_all(text, '{_REDACT_EMAIL}'))
           AS n_redacted_email,
         regexp_replace(text, '{_REDACT_EMAIL}', '<EMAIL>', 'g') AS text
  FROM t0
), s2 AS (
  SELECT doc_id, n_redacted_email,
         len(regexp_extract_all(text, '{_REDACT_IP}')) AS n_redacted_ip,
         regexp_replace(text, '{_REDACT_IP}', '<IP>', 'g') AS text
  FROM s1
), s3 AS (
  SELECT doc_id, n_redacted_email, n_redacted_ip,
         len(regexp_extract_all(text, '{_REDACT_PHONE}'))
           AS n_redacted_phone,
         regexp_replace(text, '{_REDACT_PHONE}', '<PHONE>', 'g') AS text
  FROM s2
)
SELECT doc_id, n_redacted_email, n_redacted_ip, n_redacted_phone,
       substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')),
              1, 16) AS fp
FROM s3
"""


@member_sql(_REDACT_SQL)
def corpus_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction (operators/text.redact_pii): emails → <EMAIL>,
    IPv4 → <IP>, phone-shaped digit runs → <PHONE>, applied in that
    order over docs with planted contact strings (the corpus_pii
    pattern, plus an IP class). The fingerprint of the REWRITTEN text
    pins the full replacement output, not just the counts; the per-kind
    counts pin the no-double-counting order contract (an IPv4 is also
    phone-shaped, so counting on the pre-redaction text would differ)."""
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        fingerprint,
        redact_pii,
    )

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    injected = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.when(F.col("doc_id") % 4 == 0,
                   F.concat(F.lit(" contact bob"), F.col("doc_id"),
                            F.lit("@example.com now")))
            .when(F.col("doc_id") % 4 == 1,
                  F.concat(F.lit(" server at 10.0.0."),
                           F.col("doc_id") % 250, F.lit(" up")))
            .when(F.col("doc_id") % 4 == 2, F.lit(" call +3225551234 now"))
            .otherwise(F.lit(""))).alias("text"))
    return redact_pii(injected).select(
        "doc_id", "n_redacted_email", "n_redacted_ip", "n_redacted_phone",
        fingerprint(F.col("text")).alias("fp"))


@member_sql(f"""
WITH c AS (
  SELECT lang, count(*) AS n_docs,
         sum(len({_TOKS})) AS n_tokens,
         pow(count(*), {_MIX_ALPHA}) AS w
  FROM documents GROUP BY lang
), d AS (
  SELECT list_reduce(list(w ORDER BY lang), (x, y) -> x + y) AS denom FROM c
), r AS (
  SELECT lang,
         least(1.0, round({float(_TS_BUDGET)} * w / denom, 0) / n_tokens)
         AS rate
  FROM c, d
)
SELECT doc_id, lang FROM documents JOIN r USING (lang)
WHERE {hash_fraction_sql('doc_id', 'tsample')} < rate
""")
def corpus_tsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature sampling — the sampler realizing `corpus_mix`'s
    allocation: per-language keep rate alloc_tokens/n_tokens, membership
    a deterministic doc-id hash fraction (row-for-row oracle-verified;
    the rate reuses the mixture's rounded allocation so both engines
    compare against the identical double)."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        temperature_sample,
    )

    docs = load(spark, sf_dir, "documents")
    return temperature_sample(docs, alpha=_MIX_ALPHA,
                              budget_tokens=_TS_BUDGET).select(
        "doc_id", "lang")


@member_sql(f"""
WITH c AS (
  SELECT lang, count(*) AS n_docs,
         sum(len({_TOKS})) AS n_tokens,
         pow(count(*), {_MIX_ALPHA}) AS w
  FROM documents GROUP BY lang
), d AS (
  SELECT list_reduce(list(w ORDER BY lang), (x, y) -> x + y) AS denom FROM c
), a AS (
  SELECT lang, round({float(_TS_BUDGET)} * w / denom, 0) AS alloc
  FROM c, d
), t AS (
  SELECT doc_id, lang, len({_TOKS}) AS nt,
         sum(len({_TOKS})) OVER (
           PARTITION BY lang
           ORDER BY {hash_fraction_sql('doc_id', 'tsample')}, doc_id
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM documents
)
SELECT doc_id, lang FROM t JOIN a USING (lang)
WHERE cum - nt < alloc
""")
def corpus_tsample_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact token-prefix cut twin of `corpus_tsample`
    (temperature_sample_exact): per language, documents ordered by
    (hash fraction, doc_id) are kept while the running token sum leaves
    room in the mixture allocation — budget deviation is at most the
    last document, vs the rate sampler's O(√n) expected-value spread.
    The hash-fraction order is a pure double both engines compute
    bit-identically, so the prefix is row-for-row oracle-verified."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        temperature_sample_exact,
    )

    docs = load(spark, sf_dir, "documents")
    return temperature_sample_exact(docs, alpha=_MIX_ALPHA,
                                    budget_tokens=_TS_BUDGET).select(
        "doc_id", "lang")


_LM_ALPHA = 0.5


_LM_SQL = f"""
WITH tk AS (
  SELECT doc_id, unnest({_TOKS_LOW}) AS t FROM documents
), pd AS (
  SELECT doc_id, t, count(*) AS c FROM tk GROUP BY 1, 2
), vc AS (
  SELECT t, CAST(sum(c) AS BIGINT) AS ct FROM pd GROUP BY 1
), tot AS (
  SELECT CAST(sum(ct) AS BIGINT) AS n_total, count(*) AS v FROM vc
)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_tokens,
       round(sum(c * ln((ct + {_LM_ALPHA}) / (n_total + {_LM_ALPHA} * v)))
             / sum(c), 6) AS avg_logprob
FROM pd JOIN vc USING (t), tot
GROUP BY 1
"""


@member_sql(_LM_SQL)
def corpus_lm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unigram-LM perplexity-proxy quality score (CCNet-tradition): each
    document's mean token log-probability under the corpus's own
    add-α-smoothed unigram model. Two-level aggregation — (doc, token)
    partials feed both the vocab counts and the scoring join, so raw
    token instances never reach a join. The six-decimal round pins the
    cross-engine float agreement (sum order differs; values agree to
    ~1e-12)."""
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        unigram_logprob,
    )

    docs = load(spark, sf_dir, "documents")
    return unigram_logprob(docs, alpha=_LM_ALPHA).select(
        "doc_id", "n_tokens", F.round("avg_logprob", 6).alias("avg_logprob"))


_LM2_SQL = f"""
WITH tk AS (
  SELECT doc_id, {_TOKS_LOW} AS w FROM documents
), bg AS (
  SELECT doc_id,
         unnest([{{'t1': w[i], 't2': w[i + 1]}}
                 for i in range(1, len(w))], recursive := true)
  FROM tk WHERE len(w) >= 2
), pd AS (
  SELECT doc_id, t1, t2, count(*) AS c FROM bg GROUP BY 1, 2, 3
), m AS (
  SELECT t1, t2, CAST(sum(c) AS BIGINT) AS ct FROM pd GROUP BY 1, 2
), cx AS (
  SELECT t1, CAST(sum(ct) AS BIGINT) AS ct1 FROM m GROUP BY 1
), vt AS (
  SELECT count(DISTINCT t2) AS v FROM m
)
SELECT doc_id, CAST(sum(c) AS BIGINT) AS n_bigrams,
       round(sum(c * ln((ct + {_LM_ALPHA}) / (ct1 + {_LM_ALPHA} * v)))
             / sum(c), 6) AS avg_logprob
FROM pd JOIN m USING (t1, t2) JOIN cx USING (t1), vt
GROUP BY 1
"""


@member_sql(_LM2_SQL)
def corpus_lm2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram-LM fluency score (text.bigram_logprob): each document's
    mean conditional log-probability p(t2|t1) under the corpus's own
    add-α bigram model — the sequence-sensitive companion of the ``lm``
    member (in-vocabulary-but-shuffled text collapses here). The oracle
    independently re-derives the pair counts, the context totals, the
    continuation-type count V, and the per-document average; the
    six-decimal round pins the cross-engine sum-order float agreement,
    as in ``lm``."""
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        bigram_logprob,
    )

    docs = load(spark, sf_dir, "documents")
    return bigram_logprob(docs, alpha=_LM_ALPHA).select(
        "doc_id", "n_bigrams",
        F.round("avg_logprob", 6).alias("avg_logprob"))


_NOV_WINDOW = 8


@member_sql(f"""
WITH t AS (
  SELECT doc_id, {_TOKS_LOW} AS w FROM documents WHERE doc_id < 500
), ix AS (
  SELECT doc_id, w,
         unnest(generate_series(1, greatest(len(w) - {_NOV_WINDOW} + 1, 1)))
           AS pos
  FROM t
), sp AS (
  SELECT DISTINCT doc_id,
         substr(md5(array_to_string(w[pos:pos+{_NOV_WINDOW - 1}], ' ')),
                1, 16) AS hash
  FROM ix
), dfreq AS (
  SELECT hash, count(*) AS df FROM sp GROUP BY 1
)
SELECT doc_id, count(*) AS n_shingles,
       round(avg(CASE WHEN df = 1 THEN 1 ELSE 0 END), 6) AS novelty
FROM sp JOIN dfreq USING (hash)
GROUP BY 1
""")
def corpus_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document n-gram novelty (operators/text.ngram_novelty): the
    fraction of each doc's distinct 8-token shingles occurring in no
    other document — the memorization-risk signal dual to the
    hot-passage detector. Everything keyed by the shingle vocabulary
    (no pair term); the oracle re-derives positional shingles, document
    frequencies, and the per-doc mean."""
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        ngram_novelty,
    )

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 500)
    return ngram_novelty(docs, window=_NOV_WINDOW)


@member_sql(f"""
WITH u AS (
  SELECT doc_id, text,
         CASE doc_id % 4
           WHEN 0 THEN 'https://' || source || '.example.org/p/' || doc_id
           WHEN 1 THEN 'HTTP://' || upper(source) || '.Example.ORG:8080/q'
           WHEN 2 THEN 'https://cdn.example.net/x/' || doc_id
           ELSE 'relative/path/' || doc_id
         END AS url
  FROM documents WHERE doc_id < 300
), h AS (
  SELECT doc_id, text, {url_host_sql('url')} AS host FROM u
), per AS (
  SELECT host, count(*) AS n_docs,
         sum(len(list_filter(string_split_regex(trim(text), '\\s+'),
                             x -> x != ''))) AS n_tokens
  FROM h GROUP BY 1
)
SELECT host, n_docs, n_tokens,
       round(n_tokens / (sum(n_tokens) OVER ()), 6) AS token_share
FROM per
""")
def corpus_domains(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain corpus composition (operators/web.domain_stats): doc
    and token counts plus token-mass share per URL host, planted URL
    classes exercising case folding, explicit ports, a shared CDN host,
    and a no-host NULL lane. The oracle restates host extraction via
    url_host_sql and re-aggregates."""
    from harvesting_extract_to_ttl_service_spark.operators.web import (
        domain_stats,
    )

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    u = docs.select(
        "doc_id", "text",
        F.when(F.col("doc_id") % 4 == 0,
               F.concat(F.lit("https://"), F.col("source"),
                        F.lit(".example.org/p/"), F.col("doc_id")))
        .when(F.col("doc_id") % 4 == 1,
              F.concat(F.lit("HTTP://"), F.upper(F.col("source")),
                       F.lit(".Example.ORG:8080/q")))
        .when(F.col("doc_id") % 4 == 2,
              F.concat(F.lit("https://cdn.example.net/x/"),
                       F.col("doc_id")))
        .otherwise(F.concat(F.lit("relative/path/"), F.col("doc_id")))
        .alias("url"))
    return domain_stats(u)


_CLF_BUCKETS = 64
_CLF_BIAS = -0.1

_CLF_SQL = f"""
WITH tk AS (
  SELECT doc_id, unnest({_TOKS_LOW}) AS t FROM documents
), pd AS (
  SELECT doc_id,
         CAST(floor({hash_fraction_sql('t', 'clf')} * {_CLF_BUCKETS})
              AS BIGINT) AS bucket,
         count(*) AS c
  FROM tk GROUP BY 1, 2
), w AS (
  SELECT r.range AS bucket,
         round(2 * {hash_fraction_sql('r.range', 'clfw')} - 1, 6) AS weight
  FROM range({_CLF_BUCKETS}) r
), s AS (
  -- bucket-ordered fold (see the mclf oracle's dots note): matches the
  -- Spark side's bucket-sorted aggregate double-for-double
  SELECT doc_id,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list(c * coalesce(weight, 0) ORDER BY bucket)),
           (a, b) -> a + b) / sum(c) AS dot,
         CAST(sum(c) AS BIGINT) AS n_tokens
  FROM pd LEFT JOIN w USING (bucket) GROUP BY 1
)
SELECT doc_id, n_tokens,
       round(1 / (1 + exp(-({_CLF_BIAS} + dot))), 6) AS clf_score
FROM s
"""


@member_sql(_CLF_SQL)
def corpus_clf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature linear quality classifier inference
    (operators/text.hashed_linear_score): sigmoid(bias + Σ w[b]·tf(b))
    over hashing-trick bag-of-words buckets, weights a broadcast table
    both engines re-derive deterministically (hash_bucket_weights). The
    oracle restates bucketing, the left weight join (sparse-model
    semantics), the tf normalizer, and the sigmoid independently."""
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        hash_bucket_weights,
        hashed_linear_score,
    )

    docs = load(spark, sf_dir, "documents")
    w = hash_bucket_weights(spark, _CLF_BUCKETS)
    return hashed_linear_score(docs, w, n_buckets=_CLF_BUCKETS,
                               bias=_CLF_BIAS).select(
        "doc_id", "n_tokens", "clf_score")


@member_sql(f"""
WITH t AS (
  SELECT doc_id, text, {_TOKS} AS w, {_TOKS_LOW} AS lw
  FROM documents WHERE doc_id < 300
)
SELECT doc_id,
       CAST(len(w) AS BIGINT) AS n_words,
       CAST(len(list_intersect(list_distinct(lw),
            ['the','be','to','of','and','that','have','with']))
            AS BIGINT) AS n_stop_hits,
       round(CASE WHEN len(w) > 0 THEN
             list_reduce(list_transform(w, x -> len(x)), (a, b) -> a + b)
             / len(w) ELSE 0.0 END, 4) AS mean_word_len,
       round(CASE WHEN len(w) > 0 THEN
             (len(regexp_extract_all(text, '#'))
              + len(regexp_extract_all(text, '\\.\\.\\.|…'))) / len(w)
             ELSE 0.0 END, 4) AS symbol_word_ratio,
       round(CASE WHEN len(w) > 0 THEN
             len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
             / len(w) ELSE 0.0 END, 4) AS frac_alpha_words
FROM t
""")
def corpus_gopher(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher structural-quality signals (operators/text.gopher_signals
    — the published Rae et al. heuristic battery): word counts, mean
    word length, symbol-per-word ratio, alphabetic-word fraction, and
    the 8-word stopword presence count, each restated independently by
    the oracle. Line-level signals (bullet/ellipsis fractions) are
    exercised by multi-line unit fixtures — the corpus fixture is
    single-line."""
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        gopher_signals,
    )

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return gopher_signals(docs).select(
        "doc_id", "n_words", "n_stop_hits", "mean_word_len",
        "symbol_word_ratio", "frac_alpha_words")


# --- multi-class model import (functions/models.py) -------------------
# The checked-in fastText-style fixture model: the Spark side LOADS the
# file through the distributed parser (parse_vec_model →
# hash_vec_weights → lang_id_model), while the oracle re-parses the
# SAME file in plain Python at import time and inlines it as VALUES —
# so the loader chain itself is inside the verified path, and the
# DuckDB side restates bucketing, the token-sorted collision sum, the
# tf dot, the biases, and the argmax tie-break independently.
_MCLF_PATH = __import__("os").path.join(
    __import__("os").path.dirname(__file__), "..", "..", "fixtures",
    "lid_mini.vec")
_MCLF_LABELS = ["de", "en", "es", "fr", "zh"]
_MCLF_BIASES = [0.05, -0.02, 0.0, 0.01, -0.3]
_MCLF_BUCKETS = 64


def _mclf_model_values() -> str:
    # CAST every weight literal to DOUBLE: a bare "2.0" VALUES literal
    # is DECIMAL in DuckDB, and the collision fold / tf products would
    # then run in EXACT decimal arithmetic — off by an ulp from the
    # Spark side's double math exactly at round-half boundaries (bit at
    # round 11 via the mclfsub member, doc 119: .1758375 fell on the
    # boundary and the two engines rounded apart).
    rows = []
    with open(_MCLF_PATH) as f:
        f.readline()  # header
        for line in f:
            parts = line.split()
            for lb, w in zip(_MCLF_LABELS, parts[1:]):
                rows.append(f"('{parts[0]}', '{lb}', "
                            f"CAST({float(w)!r} AS DOUBLE))")
    return ", ".join(rows)


_MCLF_SQL = f"""
WITH model(token, cls, w) AS (VALUES {_mclf_model_values()}),
fold AS (
  SELECT CAST(floor({hash_fraction_sql('token', 'clf')} * {_MCLF_BUCKETS})
              AS BIGINT) AS bucket, cls,
         round(list_reduce(list(w ORDER BY token), (x, y) -> x + y), 6)
           AS weight
  FROM model GROUP BY 1, 2
), tk AS (
  SELECT doc_id, unnest({_TOKS_LOW}) AS t FROM documents
), pd AS (
  SELECT doc_id,
         CAST(floor({hash_fraction_sql('t', 'clf')} * {_MCLF_BUCKETS})
              AS BIGINT) AS bucket,
         count(*) AS c
  FROM tk GROUP BY 1, 2
), tot AS (
  SELECT doc_id, sum(c) AS n FROM pd GROUP BY 1
), heads(cls, bias) AS (
  VALUES {", ".join(f"('{lb}', CAST({b!r} AS DOUBLE))"
                    for lb, b in zip(_MCLF_LABELS, _MCLF_BIASES))}
), dots AS (
  -- bucket-ordered fold, NOT an unordered SUM: matches the Spark
  -- side's bucket-sorted aggregate exactly (the +0.0 terms Spark folds
  -- for non-model buckets are float-identity, so the nonzero
  -- subsequence in the same order yields the identical double)
  SELECT doc_id, cls,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list(c * weight ORDER BY bucket)), (a, b) -> a + b) AS num
  FROM pd JOIN fold USING (bucket) GROUP BY 1, 2
), logits AS (
  SELECT t.doc_id, h.cls, t.n,
         round(h.bias + coalesce(d.num, 0) / t.n, 6) AS logit
  FROM tot t CROSS JOIN heads h
  LEFT JOIN dots d ON d.doc_id = t.doc_id AND d.cls = h.cls
), win AS (
  SELECT doc_id, n, cls, logit FROM logits
  QUALIFY row_number() OVER (PARTITION BY doc_id
                             ORDER BY logit DESC, cls) = 1
)
SELECT d.doc_id,
       CAST(coalesce(w.n, 0) AS BIGINT) AS n_tokens,
       coalesce(w.cls, 'und') AS lang_pred,
       w.logit AS lang_logit
FROM documents d LEFT JOIN win w USING (doc_id)
"""


@member_sql(_MCLF_SQL)
def corpus_mclf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-backed multi-class language ID (functions/models.py
    lang_id_model over the checked-in fastText-style fixture export):
    the distributed .vec parse, the hashing-trick weight fold
    (collision policy: token-sorted sum), the k-headed tf dot with
    per-class biases, and the deterministic argmax (logit desc, label
    asc) are ALL exercised against an oracle that re-derives them from
    the same model file."""
    from harvesting_extract_to_ttl_service_spark.functions.models import (
        hash_vec_weights,
        lang_id_model,
        parse_vec_model,
    )

    docs = load(spark, sf_dir, "documents")
    weights = hash_vec_weights(
        parse_vec_model(spark, _MCLF_PATH, dim=len(_MCLF_LABELS)),
        _MCLF_LABELS, n_buckets=_MCLF_BUCKETS)
    return lang_id_model(docs, weights, _MCLF_LABELS,
                         biases=_MCLF_BIASES,
                         n_buckets=_MCLF_BUCKETS).select(
        "doc_id", "n_tokens", "lang_pred", "lang_logit")


# --- subword (char n-gram) LID (functions/models.py char_ngrams) ------
# The fastText-actual feature set: each token contributes itself plus
# its boundary-marked character 3-grams, all hashed into the shared
# bucket space; the fixture model carries n-gram rows (<sc, sch, ing,
# eau, ...) so unseen words still pull their language's weight. The
# oracle re-parses the subword fixture AND re-generates the exact
# feature multiset (word + '<'||t||'>' slices) independently.
_MCLFSUB_PATH = __import__("os").path.join(
    __import__("os").path.dirname(__file__), "..", "..", "fixtures",
    "lid_mini_sub.vec")
_MCLFSUB_DOCS = 200
_MCLFSUB_N = 3  # char_ngrams=(3, 3)


def _mclfsub_model_values() -> str:
    # CAST AS DOUBLE: see _mclf_model_values — decimal-exact folds
    # diverge from double math at round-half boundaries.
    rows = []
    with open(_MCLFSUB_PATH) as f:
        f.readline()  # header
        for line in f:
            parts = line.split()
            for lb, w in zip(_MCLF_LABELS, parts[1:]):
                rows.append(f"('{parts[0]}', '{lb}', "
                            f"CAST({float(w)!r} AS DOUBLE))")
    return ", ".join(rows)


_MCLFSUB_SQL = f"""
WITH model(token, cls, w) AS (VALUES {_mclfsub_model_values()}),
fold AS (
  SELECT CAST(floor({hash_fraction_sql('token', 'clf')} * {_MCLF_BUCKETS})
              AS BIGINT) AS bucket, cls,
         round(list_reduce(list(w ORDER BY token), (x, y) -> x + y), 6)
           AS weight
  FROM model GROUP BY 1, 2
), tk AS (
  SELECT doc_id, unnest({_TOKS_LOW}) AS t FROM documents
  WHERE doc_id < {_MCLFSUB_DOCS}
), ft AS (
  SELECT doc_id, unnest([t] || list_transform(
           range(1, length('<' || t || '>') - {_MCLFSUB_N - 1} + 1),
           i -> substr('<' || t || '>', i, {_MCLFSUB_N}))) AS t
  FROM tk
), pd AS (
  SELECT doc_id,
         CAST(floor({hash_fraction_sql('t', 'clf')} * {_MCLF_BUCKETS})
              AS BIGINT) AS bucket,
         count(*) AS c
  FROM ft GROUP BY 1, 2
), tot AS (
  SELECT doc_id, sum(c) AS n FROM pd GROUP BY 1
), heads(cls) AS (
  VALUES {", ".join(f"('{lb}')" for lb in _MCLF_LABELS)}
), dots AS (
  SELECT doc_id, cls,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list(c * weight ORDER BY bucket)), (a, b) -> a + b) AS num
  FROM pd JOIN fold USING (bucket) GROUP BY 1, 2
), logits AS (
  SELECT t.doc_id, h.cls, t.n,
         round(coalesce(d.num, 0) / t.n, 6) AS logit
  FROM tot t CROSS JOIN heads h
  LEFT JOIN dots d ON d.doc_id = t.doc_id AND d.cls = h.cls
), win AS (
  SELECT doc_id, n, cls, logit FROM logits
  QUALIFY row_number() OVER (PARTITION BY doc_id
                             ORDER BY logit DESC, cls) = 1
)
SELECT d.doc_id,
       CAST(coalesce(w.n, 0) AS BIGINT) AS n_tokens,
       coalesce(w.cls, 'und') AS lang_pred,
       w.logit AS lang_logit
FROM (SELECT doc_id FROM documents WHERE doc_id < {_MCLFSUB_DOCS}) d
LEFT JOIN win w USING (doc_id)
"""


@member_sql(_MCLFSUB_SQL)
def corpus_mclfsub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Subword-featured language ID (functions/models.py
    hashed_multiclass_score ``char_ngrams``): word + boundary-marked
    char-3-gram features hashed into the shared bucket space, scored
    against the subword fixture model — feature generation, bucketing,
    the token-sorted collision fold, the tf-per-feature dot, and the
    argmax all restated independently by the oracle."""
    from harvesting_extract_to_ttl_service_spark.functions.models import (
        hash_vec_weights,
        lang_id_model,
        parse_vec_model,
    )

    docs = (load(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < _MCLFSUB_DOCS))
    weights = hash_vec_weights(
        parse_vec_model(spark, _MCLFSUB_PATH, dim=len(_MCLF_LABELS)),
        _MCLF_LABELS, n_buckets=_MCLF_BUCKETS)
    return lang_id_model(docs, weights, _MCLF_LABELS,
                         n_buckets=_MCLF_BUCKETS,
                         char_ngrams=(_MCLFSUB_N, _MCLFSUB_N)).select(
        "doc_id", "n_tokens", "lang_pred", "lang_logit")


_WS_GAMMA = 2.0
_WS_FLOOR = 0.05


@member_sql(f"""
WITH clf AS ({_CLF_SQL}
)
SELECT doc_id FROM clf
WHERE {hash_fraction_sql('doc_id', 'wsample')}
      < {_WS_FLOOR} + {1.0 - _WS_FLOOR}
        * pow(least(1.0, greatest(0.0, coalesce(clf_score, 0.0))),
              {_WS_GAMMA})
""")
def corpus_wsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-weighted sampling (operators/corpus.score_weighted_sample)
    over the hashed-classifier score: keep probability
    floor + (1-floor)·score^gamma, membership the deterministic id hash
    fraction. The rate derives from the 6-dp-rounded score, so both
    engines compare the identical double."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        score_weighted_sample,
    )
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        hash_bucket_weights,
        hashed_linear_score,
    )

    docs = load(spark, sf_dir, "documents")
    scored = hashed_linear_score(docs, hash_bucket_weights(spark,
                                                           _CLF_BUCKETS),
                                 n_buckets=_CLF_BUCKETS, bias=_CLF_BIAS)
    return score_weighted_sample(scored, "clf_score", gamma=_WS_GAMMA,
                                 floor=_WS_FLOOR).select("doc_id")


_N_QBUCKETS = 4


@member_sql(f"""
WITH lm AS ({_LM_SQL}
), th AS (
  SELECT round(quantile_cont(avg_logprob, 0.25), 6) AS t0,
         round(quantile_cont(avg_logprob, 0.50), 6) AS t1,
         round(quantile_cont(avg_logprob, 0.75), 6) AS t2
  FROM lm
)
SELECT doc_id,
       (CASE WHEN avg_logprob >= t0 THEN 1 ELSE 0 END +
        CASE WHEN avg_logprob >= t1 THEN 1 ELSE 0 END +
        CASE WHEN avg_logprob >= t2 THEN 1 ELSE 0 END) AS bucket
FROM lm, th
""")
def corpus_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum bucketing (operators/corpus.score_buckets): quartile
    tiers of the unigram-LM quality score — thresholds from one tiny
    quantile aggregate (bounded driver collect of 3 doubles), bucket a
    pure column expression. The oracle recomputes thresholds with
    `quantile_cont` over the same 6-dp-rounded scores and re-counts."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        score_buckets,
    )
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        unigram_logprob,
    )

    docs = load(spark, sf_dir, "documents")
    scores = unigram_logprob(docs, alpha=_LM_ALPHA).select(
        "doc_id", F.round("avg_logprob", 6).alias("avg_logprob"))
    return score_buckets(scores, _N_QBUCKETS).select("doc_id", "bucket")


_SHUFFLE_EPOCH = 7


@member_sql(f"""
WITH t AS (
  SELECT doc_id, {_SHARD_EXPR} AS shard, len({_TOKS}) AS toks,
         {hash_fraction_sql('doc_id', f'epoch{_SHUFFLE_EPOCH}')} AS sk
  FROM documents
), s AS (
  SELECT shard, doc_id,
         coalesce(sum(toks) OVER (PARTITION BY shard ORDER BY sk, doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS start_offset
  FROM t
)
SELECT doc_id, shard,
       CAST(floor(start_offset / {float(_PACK_BUDGET)}) AS BIGINT) AS chunk,
       start_offset
FROM s
""")
def corpus_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded per-epoch global shuffle feeding the packer: concatenation
    order inside each shard is the epoch-{epoch} hash-fraction order, not
    id order. The per-document start_offset is the exact prefix sum over
    that order, so the oracle verifies the ENTIRE shuffled permutation —
    any out-of-place document shifts every later offset in its shard."""
    docs = assign_shards(load(spark, sf_dir, "documents"), _N_SHARDS)
    shuf = epoch_shuffle(docs, _SHUFFLE_EPOCH)
    return pack_chunks(shuf, _PACK_BUDGET, order_col="shuffle_key").select(
        "doc_id", "shard", "chunk", "start_offset")


_FP_SQL = ("substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')),"
           " 1, 16)")


@member_sql(f"""
WITH t AS (
  SELECT lang, len({_TOKS}) AS toks, {_FP_SQL} AS fp FROM documents
), per AS (
  SELECT lang AS stratum, count(*) AS n_docs, sum(toks) AS n_tokens,
         count(DISTINCT fp) AS n_distinct_texts,
         round(quantile_cont(toks, 0.5), 6) AS p50_tokens,
         round(quantile_cont(toks, 0.9), 6) AS p90_tokens
  FROM t GROUP BY 1
)
SELECT stratum, n_docs, n_tokens, n_distinct_texts,
       round(n_tokens / (sum(n_tokens) OVER ()), 6) AS token_share,
       p50_tokens, p90_tokens
FROM per
""")
def corpus_report_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-card statistics (operators/corpus.corpus_report): per-language
    doc/token counts, distinct normalized fingerprints, token-mass share,
    and exact token-length quantiles (Spark `percentile` vs DuckDB
    `quantile_cont` — both linear-interpolating, rounded to 6 dp)."""
    return corpus_report(load(spark, sf_dir, "documents"))


_CHUNK_MAX = 64
_CHUNK_OVERLAP = 8
_CHUNK_STEP = _CHUNK_MAX - _CHUNK_OVERLAP


@member_sql(f"""
WITH t AS (
  SELECT doc_id, {_TOKS} AS w FROM documents WHERE doc_id < 300
), p AS (
  SELECT doc_id, w,
         CASE WHEN len(w) <= {_CHUNK_MAX} THEN 1
              ELSE CAST(ceil((len(w) - {_CHUNK_MAX})
                        / CAST({_CHUNK_STEP} AS DOUBLE)) AS INT) + 1
         END AS np
  FROM t
), e AS (
  SELECT doc_id, w, unnest(range(0, np)) AS piece FROM p
), sl AS (
  SELECT doc_id, CAST(piece AS INT) AS piece,
         CAST(piece * {_CHUNK_STEP} + 1 AS BIGINT) AS piece_start,
         w[(piece * {_CHUNK_STEP} + 1):(piece * {_CHUNK_STEP}
            + {_CHUNK_MAX})] AS s
  FROM e
)
SELECT doc_id, piece, piece_start,
       CAST(len(s) AS BIGINT) AS n_tokens,
       substr(md5(array_to_string(s, ' ')), 1, 16) AS fp
FROM sl
""")
def corpus_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Long-document window/stride chunking
    (operators/corpus.split_long_documents): max_tokens pieces with an
    overlap stride, in-row slices, one posexplode. The oracle re-derives
    piece counts, start offsets, slice lengths, AND the reassembled
    piece text (fingerprinted) independently."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        split_long_documents,
    )
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        fingerprint,
    )

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 300)
    return split_long_documents(
        docs.select("doc_id", "text"), _CHUNK_MAX, _CHUNK_OVERLAP).select(
        "doc_id", "piece", "piece_start", "n_tokens",
        fingerprint(F.col("text")).alias("fp"))


_MIXSRC_BUDGET = 20_000
_MIXSRC_W = {"codeish": 1.0, "webish": 3.0, "wikiish": 1.0}
_MIXSRC_TOTAL_W = sum(_MIXSRC_W.values())


@member_sql(f"""
WITH u AS (
  SELECT CASE WHEN doc_id < 300 THEN 'webish'
              WHEN doc_id < 450 THEN 'codeish'
              ELSE 'wikiish' END AS source,
         doc_id, len({_TOKS}) AS toks
  FROM documents
), c AS (
  SELECT source, sum(toks) AS t FROM u GROUP BY 1
), r AS (
  SELECT source,
         CASE WHEN t <= 0 THEN 0.0 ELSE least(1.0,
           (CASE source {" ".join(
               f"WHEN '{k}' THEN {v / _MIXSRC_TOTAL_W!r}"
               for k, v in sorted(_MIXSRC_W.items()))} END)
           * {float(_MIXSRC_BUDGET)} / t) END AS rate
  FROM c
)
SELECT u.source, u.doc_id
FROM u JOIN r USING (source)
WHERE {hash_fraction_sql(
    "concat(u.source, '|', CAST(u.doc_id AS VARCHAR))", "mixsrc")}
      < r.rate
""")
def corpus_mixsrc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit-weight cross-source mixing
    (operators/corpus.mix_sources — '60% web, 20% code, 20% wiki' as a
    pipeline owner states it): three pseudo-sources carved from the
    documents fixture, per-source keep rate share·budget/tokens, with
    membership keyed by (source, id). The oracle re-derives the
    per-source token masses, the rate clamp, and every membership
    decision."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        mix_sources,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    frames = {
        "webish": docs.filter(F.col("doc_id") < 300),
        "codeish": docs.filter((F.col("doc_id") >= 300)
                               & (F.col("doc_id") < 450)),
        "wikiish": docs.filter(F.col("doc_id") >= 450),
    }
    return mix_sources(frames, _MIXSRC_W, _MIXSRC_BUDGET).select(
        "source", "doc_id")


# --- token-id shard emission (functions/tokenizer.py + pack_chunks) ---
# The Spark side runs the real chain: merges-file load → BPE encode with
# id emission under the derived vocab → shard assignment → packing in
# TRAINED-tokenizer units. The oracle restates ALL of it independently:
# it re-parses the same merges file in plain Python, re-derives the
# vocab table with its own few lines, and re-runs the greedy
# lowest-rank-first BPE loop as a recursive CTE over symbol lists — so
# the id sequences are verified end-to-end, not copied.
_TOKID_DOCS = 60
_TOKID_BUDGET = 512
_TOKID_BIG = 1_000_000
_BPE_FIXTURE = __import__("os").path.join(
    __import__("os").path.dirname(__file__), "..", "..", "fixtures",
    "bpe_mini_merges.txt")


def _tokid_merges() -> list[tuple[str, str]]:
    out = []
    with open(_BPE_FIXTURE) as f:
        for ln in f:
            s = ln.strip()
            if not s or s.startswith("#"):
                continue
            left, right = s.split(" ")
            out.append((left, right))
    return out


def _tokid_rank_map_sql() -> str:
    entries = ", ".join(f"'{left} {right}': {i}"
                        for i, (left, right) in
                        enumerate(_tokid_merges()))
    return f"MAP {{{entries}}}"


def _tokid_vocab_values(specials: tuple[str, ...] = ("<unk>",)) -> str:
    syms = {"</w>"}
    for left, right in _tokid_merges():
        syms.update((left, right, left + right))
    toks = list(specials) + sorted(syms)
    return ", ".join(f"('{t}', {i})" for i, t in enumerate(toks))


def _tokid_sql(specials: tuple[str, ...] = ("<unk>",),
               eos_id: int | None = None) -> str:
    """The tokids oracle, parameterized on the specials table and an
    optional document-separator id appended to every document's id
    list (and counted in the packing budget) — the SQL twin of
    operators/corpus.append_doc_separator. OOV stays id 0 (<unk>
    leads the specials in both variants)."""
    sep = "" if eos_id is None else f" || [{eos_id}]"
    return f"""
WITH RECURSIVE
rk AS (SELECT {_tokid_rank_map_sql()} AS m),
vocab(tok, tid) AS (VALUES {_tokid_vocab_values(specials)}),
docs AS (
  SELECT doc_id, {_TOKS} AS w FROM documents
  WHERE doc_id < {_TOKID_DOCS}
),
words AS (SELECT DISTINCT unnest(w) AS word FROM docs),
enc AS (
  SELECT word,
         list_append(list_transform(range(1, length(word) + 1),
                                    i -> word[i]), '</w>') AS syms
  FROM words
  UNION ALL
  SELECT word,
         syms[1:bi - 1] || [syms[bi] || syms[bi + 1]]
           || syms[(bi + 2):len(syms)]
  FROM (
    SELECT word, syms,
           list_position(pr, list_min(pr)) AS bi, list_min(pr) AS mr
    FROM (
      SELECT word, syms,
             list_transform(range(1, len(syms)), i ->
               coalesce(m[syms[i] || ' ' || syms[i + 1]][1],
                        {_TOKID_BIG})) AS pr
      FROM enc, rk
    )
  )
  WHERE mr < {_TOKID_BIG}
),
final AS (
  SELECT word, syms FROM (
    SELECT e.word, e.syms,
           coalesce(list_min(list_transform(range(1, len(e.syms)), i ->
             coalesce(m[e.syms[i] || ' ' || e.syms[i + 1]][1],
                      {_TOKID_BIG}))), {_TOKID_BIG}) AS mr
    FROM enc e, rk
  ) WHERE mr >= {_TOKID_BIG}
),
dw AS (
  SELECT doc_id, unnest(range(1, len(w) + 1)) AS wpos, w FROM docs
),
dsym AS (
  SELECT doc_id, wpos, unnest(range(1, len(f.syms) + 1)) AS spos, f.syms
  FROM (SELECT doc_id, wpos, w[wpos] AS word FROM dw) d
  JOIN final f USING (word)
),
ids AS (
  SELECT s.doc_id,
         list(coalesce(v.tid, 0) ORDER BY s.wpos, s.spos) AS idl
  FROM (SELECT doc_id, wpos, spos, syms[spos] AS sym FROM dsym) s
  LEFT JOIN vocab v ON v.tok = s.sym
  GROUP BY s.doc_id
),
alldocs AS (
  SELECT d.doc_id, coalesce(i.idl, []){sep} AS idl
  FROM docs d LEFT JOIN ids i USING (doc_id)
),
s AS (
  SELECT doc_id, {_SHARD_EXPR} AS shard, len(idl) AS n_tokens, idl,
         coalesce(sum(len(idl)) OVER (
             PARTITION BY {_SHARD_EXPR} ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
           0) AS start_offset
  FROM alldocs
)
SELECT doc_id, shard,
       CAST(floor(start_offset / {float(_TOKID_BUDGET)}) AS BIGINT)
         AS chunk,
       start_offset, CAST(n_tokens AS BIGINT) AS n_tokens,
       array_to_string(list_transform(idl, x -> CAST(x AS VARCHAR)), '-')
         AS ids
FROM s
"""


@member_sql(_tokid_sql())
def corpus_tokids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-id shard emission: the merges-file tokenizer import
    (functions/tokenizer.load_bpe_merges → bpe_token_count emit_ids
    under the bpe_vocab id table) feeding pack_chunks with the budget
    in trained units — every document's exact BPE id sequence plus its
    (shard, chunk, start_offset) packing coordinates, the row shape
    write_token_id_shards persists."""
    from harvesting_extract_to_ttl_service_spark.functions.tokenizer import (
        bpe_token_count,
        bpe_vocab,
        load_bpe_merges,
    )

    merges = load_bpe_merges(spark, _BPE_FIXTURE)
    vocab = bpe_vocab(merges)
    docs = (load(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < _TOKID_DOCS)
            .select("doc_id", "text"))
    enc = bpe_token_count(docs, merges, emit_ids=True, vocab=vocab)
    packed = pack_chunks(assign_shards(enc, _N_SHARDS), _TOKID_BUDGET,
                         count_col="n_bpe_tokens", keep=("bpe_ids",))
    return packed.select(
        "doc_id", "shard", "chunk", "start_offset", "n_tokens",
        F.concat_ws("-", F.transform("bpe_ids",
                                     lambda x: x.cast("string")))
        .alias("ids"))


@member_sql(_tokid_sql(specials=("<unk>", "<eos>"), eos_id=1))
def corpus_tokeos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-id shards WITH document separators — the tokids pipeline
    plus the reserved ``<eos>`` special (id 1: specials lead the vocab,
    ``<unk>`` keeps id 0) appended per document and counted in the
    budget (operators/corpus.append_doc_separator), so every packing
    coordinate is in loader units and no context window spans a
    document boundary without the separator marking the seam. The
    oracle re-runs the BPE loop under the shifted vocab and restates
    the appended id, the +1 counts, and the shifted offsets/chunks."""
    from harvesting_extract_to_ttl_service_spark.functions.tokenizer import (
        bpe_token_count,
        bpe_vocab,
        load_bpe_merges,
    )
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        append_doc_separator,
    )

    merges = load_bpe_merges(spark, _BPE_FIXTURE)
    vocab = bpe_vocab(merges, specials=("<unk>", "<eos>"))
    docs = (load(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < _TOKID_DOCS)
            .select("doc_id", "text"))
    enc = append_doc_separator(
        bpe_token_count(docs, merges, emit_ids=True, vocab=vocab),
        vocab["<eos>"])
    packed = pack_chunks(assign_shards(enc, _N_SHARDS), _TOKID_BUDGET,
                         count_col="n_bpe_tokens", keep=("bpe_ids",))
    return packed.select(
        "doc_id", "shard", "chunk", "start_offset", "n_tokens",
        F.concat_ws("-", F.transform("bpe_ids",
                                     lambda x: x.cast("string")))
        .alias("ids"))


_CORPUS_MEMBERS = [
    ("sample", corpus_sample, ["doc_id", "lang"], []),
    ("mix", corpus_mix, ["lang", "n_docs", "n_tokens"],
     ["share", "alloc_tokens"]),
    ("shards", corpus_shards, ["shard", "n_docs", "n_tokens"], []),
    ("pack", corpus_pack, ["shard", "chunk", "n_docs", "n_tokens"], []),
    ("decontam", corpus_decontam, ["doc_id", "bench_id", "n_overlap"], []),
    ("decontam_mh", corpus_decontam_mh, ["doc_id", "bench_id"],
     ["est_jaccard"]),
    ("rep", corpus_repetition, ["doc_id", "n_lines"],
     ["dup_line_ratio", "top_bigram_ratio"]),
    ("pii", corpus_pii, ["doc_id", "n_emails", "n_urls", "n_phones"], []),
    ("redact", corpus_redact,
     ["doc_id", "n_redacted_email", "n_redacted_ip", "n_redacted_phone",
      "fp"], []),
    ("lm", corpus_lm, ["doc_id", "n_tokens"], ["avg_logprob"]),
    ("lm2", corpus_lm2, ["doc_id", "n_bigrams"], ["avg_logprob"]),
    ("clf", corpus_clf, ["doc_id", "n_tokens"], ["clf_score"]),
    ("mclf", corpus_mclf, ["doc_id", "n_tokens", "lang_pred"],
     ["lang_logit"]),
    ("novelty", corpus_novelty, ["doc_id", "n_shingles"], ["novelty"]),
    ("wsample", corpus_wsample, ["doc_id"], []),
    ("gopher", corpus_gopher, ["doc_id", "n_words", "n_stop_hits"],
     ["mean_word_len", "symbol_word_ratio", "frac_alpha_words"]),
    ("domains", corpus_domains, ["host", "n_docs", "n_tokens"],
     ["token_share"]),
    ("tsample", corpus_tsample, ["doc_id", "lang"], []),
    ("mixsrc", corpus_mixsrc, ["source", "doc_id"], []),
    ("tsample_exact", corpus_tsample_exact, ["doc_id", "lang"], []),
    ("shuffle", corpus_shuffle,
     ["doc_id", "shard", "chunk", "start_offset"], []),
    ("buckets", corpus_buckets, ["doc_id", "bucket"], []),
    ("chunks", corpus_chunks,
     ["doc_id", "piece", "piece_start", "n_tokens", "fp"], []),
    ("report", corpus_report_q,
     ["stratum", "n_docs", "n_tokens", "n_distinct_texts"],
     ["token_share", "p50_tokens", "p90_tokens"]),
    ("tokids", corpus_tokids,
     ["doc_id", "shard", "chunk", "start_offset", "n_tokens", "ids"],
     []),
    ("tokeos", corpus_tokeos,
     ["doc_id", "shard", "chunk", "start_offset", "n_tokens", "ids"],
     []),
    ("mclfsub", corpus_mclfsub, ["doc_id", "n_tokens", "lang_pred"],
     ["lang_logit"]),
]


@q("corpus_suite", suite_sql(_CORPUS_MEMBERS))
def corpus_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-corpus suite (tagged union): capped stratified sampling,
    temperature mixing, shard balance, sequence-packing chunk stats, and
    benchmark decontamination — each member hash-verified against an
    independent SQL restatement."""
    return suite_df(spark, sf_dir, _CORPUS_MEMBERS)
