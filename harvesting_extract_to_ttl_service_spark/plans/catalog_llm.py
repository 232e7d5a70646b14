"""LLM-data-pipeline query catalog (SURVEY.md §2C): dedup (exact, MinHash
LSH, SimHash, n-gram Jaccard), embedding similarity search, text analysis,
multimodal plumbing — over the `documents` / `embeddings` fixtures.

Every hash primitive here is md5-derived specifically so the DuckDB oracle
can recompute signatures bit-for-bit (engine-portable determinism); the
oracle SQL for the MinHash/SimHash pipelines is generated from the same
coefficient tables the Spark operators use.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.operators.dedup import (
    _minhash_coeffs,
    _P,
    exact_duplicates,
    minhash_signature,
    minhash_similarity,
    ngram_jaccard_pairs,
    simhash_candidates,
    spread_for_cpu,
)
from harvesting_extract_to_ttl_service_spark.operators.multimodal import (
    documents_as_media,
    extract_image_features,
    resize_images,
)
from harvesting_extract_to_ttl_service_spark.operators.similarity import (
    cosine_topk,
    lsh_ann_topk,
)
from harvesting_extract_to_ttl_service_spark.operators.text import (
    EN_STOPWORDS,
    LANG_MARKERS,
    annotate_documents,
)
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


# --- shared SQL fragments (DuckDB) ----------------------------------------

_WORDS = "list_filter(string_split_regex(trim(lower(text)), '\\s+'), x -> x != '')"
_WORDS_RAW = "list_filter(string_split_regex(trim(text), '\\s+'), x -> x != '')"


def _grams_sql(n: int) -> str:
    """DuckDB twin of operators.text shingles(): distinct n-word shingles
    over the list column `w`."""
    return (f"list_distinct([array_to_string(w[i:i+{n - 1}], ' ') "
            f"for i in range(1, greatest(len(w) - {n - 1}, 1) + 1)])")


_HASH32 = "CAST(concat('0x', substr(md5(g), 1, 8)) AS BIGINT)"
_HASH60 = "CAST(concat('0x', substr(md5(g), 1, 15)) AS BIGINT)"
_NORM_TEXT = "regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')"


def _minhash_sig_sql(num_hashes: int) -> str:
    items = ", ".join(
        f"list_min([({a} * h + {b}) % {_P} for h in hs])"
        for a, b in _minhash_coeffs(num_hashes)
    )
    return f"[{items}]"


# --------------------------------------------------------------------------
# Dedup
# --------------------------------------------------------------------------

@q("doc_rolling_fingerprints", f"""
WITH w AS (
  SELECT doc_id, {_WORDS} AS w FROM documents WHERE doc_id < 100
), h AS (
  SELECT doc_id,
         [substr(md5(s), 1, 16)
          for s in [array_to_string(w[i:i+7], ' ')
                    for i in range(1, greatest(len(w) - 7, 1) + 1)]] AS hashes
  FROM w
)
SELECT doc_id,
       unnest([{{'pos': i - 1, 'hash': hashes[i]}}
               for i in range(1, len(hashes) + 1)], recursive := true)
FROM h
""")
def doc_rolling_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style rolling document fingerprints: md5 per 8-word
    shingle, posexploded to flat ``(doc_id, pos, hash)`` rows (array
    columns are not canonicalizable downstream), verified hash-for-hash
    against the independent DuckDB restatement."""
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        rolling_hashes,
    )

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id",
        F.posexplode(rolling_hashes(F.col("text"))).alias("pos", "hash"))


@member_sql(f"""
SELECT substr(md5({_NORM_TEXT}), 1, 16) AS fp,
       min(doc_id) AS canonical_id,
       count(*)    AS group_size
FROM documents GROUP BY 1
""")
def dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup on a 16-hex content fingerprint — shuffles 24 bytes per
    row, never the document text."""
    return exact_duplicates(load(spark, sf_dir, "documents"))


_NGRAM_DF_CAP = 8  # quadratic-pair guard: drop shingles in > cap docs


@member_sql(f"""
WITH w AS (
  SELECT doc_id, {_WORDS} AS w FROM documents WHERE doc_id % 2 = 0
), g0 AS (
  SELECT doc_id, unnest({_grams_sql(3)}) AS g FROM w
), g AS (
  SELECT g0.* FROM g0
  JOIN (SELECT g, count(*) AS df FROM g0 GROUP BY g) d ON g0.g = d.g
  WHERE d.df <= {_NGRAM_DF_CAP}
), sz AS (
  SELECT doc_id, count(*) AS n FROM g GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS c
  FROM g a JOIN g b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
       round(CAST(c AS DOUBLE) / (sa.n + sb.n - c), 4) AS jaccard
FROM inter
JOIN sz sa ON id_a = sa.doc_id
JOIN sz sb ON id_b = sb.doc_id
WHERE CAST(c AS DOUBLE) / (sa.n + sb.n - c) >= 0.2
""")
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard pairs ≥ 0.2: shingle-explode + equi-join on the
    shingle — only pairs sharing a shingle are materialized, never O(n²).
    The df-cap (dropping shingles in > {cap} docs) bounds the quadratic
    blow-up of boilerplate shingles; the oracle mirrors the cap, so the
    capped semantics are verified, not just the happy path."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 2 == 0)
    pairs = ngram_jaccard_pairs(docs, threshold=0.2,
                                max_shingle_df=_NGRAM_DF_CAP)
    return pairs.select("id_a", "id_b", F.round("jaccard", 4).alias("jaccard"))


@q("minhash_signatures", f"""
WITH w AS (
  SELECT doc_id, {_WORDS} AS w FROM documents WHERE doc_id % 20 = 0
), hsrc AS (
  SELECT doc_id, list_transform({_grams_sql(3)}, g -> {_HASH32}) AS hs FROM w
), sig AS (
  SELECT doc_id, {_minhash_sig_sql(8)} AS sig FROM hsrc
)
SELECT doc_id, sig[1] AS h0, sig[2] AS h1, sig[3] AS h2, sig[4] AS h3
FROM sig
""")
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures verified value-for-value against an independent
    SQL recomputation (same universal-hash coefficients, seed 42)."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 20 == 0)
    sig = docs.select(
        "doc_id", minhash_signature(F.col("text"), num_hashes=8).alias("sig"))
    return sig.select(
        "doc_id",
        F.col("sig").getItem(0).alias("h0"), F.col("sig").getItem(1).alias("h1"),
        F.col("sig").getItem(2).alias("h2"), F.col("sig").getItem(3).alias("h3"))


def _minhash_lsh_oracle(num_hashes: int = 32, bands: int = 8,
                        threshold: float = 0.3,
                        cand_cond: str = "") -> str:
    """``cand_cond`` is an extra predicate ANDed into the band join —
    used by the incremental member to restrict to pairs touching the new
    batch."""
    rows = num_hashes // bands
    return f"""
WITH w AS (
  SELECT doc_id, {_WORDS} AS w FROM documents
), hsrc AS (
  SELECT doc_id, list_transform({_grams_sql(3)}, g -> {_HASH32}) AS hs FROM w
), sig AS (
  SELECT doc_id, {_minhash_sig_sql(num_hashes)} AS sig FROM hsrc
), banded AS (
  SELECT doc_id, b,
         md5(array_to_string(sig[{rows}*b+1:{rows}*b+{rows}], ',')) AS bh
  FROM sig, (SELECT unnest(range(0, {bands})) AS b)
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM banded a JOIN banded b
    ON a.b = b.b AND a.bh = b.bh AND a.doc_id < b.doc_id {cand_cond}
), est AS (
  SELECT id_a, id_b,
         CAST(list_reduce(list_transform(list_zip(sa.sig, sb.sig),
                     z -> CASE WHEN z[1] = z[2] THEN 1 ELSE 0 END),
                     (x, y) -> x + y) AS DOUBLE) / {num_hashes} AS est_jaccard
  FROM cand JOIN sig sa ON id_a = sa.doc_id JOIN sig sb ON id_b = sb.doc_id
)
SELECT id_a, id_b, round(est_jaccard, 4) AS est_jaccard
FROM est WHERE est_jaccard >= {threshold}
"""


@q("minhash_lsh_pairs", _minhash_lsh_oracle())
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full MinHash→banding→candidate-join→estimate pipeline; the oracle
    re-derives every stage in SQL from the same coefficients."""
    docs = load(spark, sf_dir, "documents")
    pairs = minhash_similarity(docs, threshold=0.3)
    return pairs.select("id_a", "id_b",
                        F.round("est_jaccard", 4).alias("est_jaccard"))


def _dedup_clusters_oracle() -> str:
    """Recursive-CTE restatement of connected components over the LSH
    candidate pairs: reach(s, t) closes the symmetric edge relation, the
    component is min(t) — exactly hash-to-min's fixpoint."""
    return f"""
WITH RECURSIVE pairs AS (
{_minhash_lsh_oracle()}
), edges AS (
  SELECT id_a AS s, id_b AS t FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), reach(s, t) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s
)
SELECT s AS doc_id, CAST(min(t) AS BIGINT) AS cluster
FROM reach GROUP BY s
"""


@member_sql(_dedup_clusters_oracle())
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate pairs → duplicate GROUPS: hash-to-min connected
    components over the MinHash-LSH pair graph; every document gets its
    component's minimum doc_id as the canonical representative
    (singletons map to themselves). The keep-one step a production dedup
    needs after any pair generator."""
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        connected_components,
    )

    docs = load(spark, sf_dir, "documents")
    pairs = minhash_similarity(docs, threshold=0.3)
    comp = connected_components(
        pairs.select("id_a", "id_b"),
        docs.select(F.col("doc_id").alias("id")))
    return comp.select(F.col("id").alias("doc_id"),
                       F.col("component").alias("cluster"))


@member_sql(_minhash_lsh_oracle(
    cand_cond="AND (a.doc_id % 2 = 0 OR b.doc_id % 2 = 0)"))
def dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: the even-id docs play a NEW crawl batch, the
    odd-id docs the existing corpus whose LSH index (minhash_band_index)
    was built earlier — only the batch is shingled; the batch's banded
    table broadcasts against the index scan, so the corpus never
    re-tokenizes or shuffles. The oracle is the full-corpus LSH
    restatement restricted to pairs touching the batch — pinning that
    incremental == full recompute minus corpus×corpus."""
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        incremental_minhash_pairs,
        minhash_band_index,
    )

    docs = load(spark, sf_dir, "documents")
    new = docs.filter(F.col("doc_id") % 2 == 0)
    index = minhash_band_index(docs.filter(F.col("doc_id") % 2 == 1))
    pairs = incremental_minhash_pairs(new, index, threshold=0.3)
    return pairs.select("id_a", "id_b",
                        F.round("est_jaccard", 4).alias("est_jaccard"))


# shared fragment: per-doc rolling 8-word window hashes over doc_id<100
# with a PLANTED shared footer on every third doc (the fixture corpus has
# no cross-doc verbatim 8-grams of its own — the corpus_pii pattern: the
# oracle restates the construction AND the detection), + the cross-doc
# hot set. Footer-internal windows hash identically across docs because
# the rolling hash keys on window CONTENT, not position.
_FOOTER = ("subscribe to the newsletter for weekly updates and special "
           "offers today")
_HOT_BASE = f"""
WITH src AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 3 = 0 THEN ' {_FOOTER}' ELSE '' END
         AS text
  FROM documents WHERE doc_id < 100
), w AS (
  SELECT doc_id, {_WORDS} AS w FROM src
), h AS (
  SELECT doc_id,
         [substr(md5(s), 1, 16)
          for s in [array_to_string(w[i:i+7], ' ')
                    for i in range(1, greatest(len(w) - 7, 1) + 1)]] AS hashes
  FROM w
), e AS (
  SELECT DISTINCT doc_id, unnest(hashes) AS hash FROM h
), hot AS (
  SELECT hash, count(*) AS n_docs FROM e GROUP BY 1 HAVING count(*) >= 2
)"""


def _footered_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """docs 0..99 with the shared footer planted on every third doc."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    return docs.select(
        "doc_id",
        F.concat(F.col("text"),
                 F.when(F.col("doc_id") % 3 == 0, F.lit(f" {_FOOTER}"))
                 .otherwise(F.lit(""))).alias("text"))


@member_sql(_HOT_BASE + """
SELECT hash, n_docs FROM hot
""")
def dedup_hot_passages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document repeated passages (operators/text.hot_passages):
    rolling 8-word window hashes occurring in ≥2 distinct docs — the
    boilerplate detector behind substring-level dedup. The planted
    footer's internal windows are the hot set."""
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        hot_passages,
    )

    return hot_passages(_footered_docs(spark, sf_dir))


@member_sql(_HOT_BASE + """
, p AS (
  SELECT doc_id, unnest([{'pos': i - 1, 'hash': hashes[i]}
                         for i in range(1, len(hashes) + 1)],
                        recursive := true)
  FROM h
), st AS (
  SELECT doc_id, list(pos) AS ss
  FROM p JOIN hot USING (hash) GROUP BY 1
)
SELECT w.doc_id, len(w.w) AS n_tokens_before,
       len(w.w) - len(list_filter(range(0, len(w.w)),
           i -> len(list_filter(coalesce(ss, CAST([] AS BIGINT[])),
                                s -> i >= s AND i < s + 8)) = 0))
       AS n_tokens_removed
FROM w LEFT JOIN st USING (doc_id)
""")
def dedup_strip_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level dedup accounting
    (operators/text.strip_repeated_substrings): per doc, tokens before
    and tokens removed as covered by a cross-doc repeated window — the
    oracle restates footer planting, hot-set detection, AND positional
    coverage (the planted footer strips; original bodies survive)."""
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        strip_repeated_substrings,
    )

    return strip_repeated_substrings(_footered_docs(spark, sf_dir)).select(
        "doc_id", "n_tokens_before", "n_tokens_removed")


_SPLIT_WEIGHTS = {"train": 0.8, "holdout": 0.1, "test": 0.1}


def _split_oracle() -> str:
    """Leakage-safe split restated: recursive-CTE components over the
    LSH pair graph (the clusters oracle), then the SAME Python-float
    cumulative bounds as `split_bounds` in a CASE over the component's
    hash fraction — boundary-exact, since 0.8 + 0.1 is
    0.9000000000000001 in both places."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        hash_fraction_sql,
        split_bounds,
    )

    bounds = split_bounds(_SPLIT_WEIGHTS)
    case = " ".join(f"WHEN hf < {cum!r} THEN '{name}'"
                    for name, cum in bounds[:-1])
    return f"""
WITH RECURSIVE pairs AS (
{_minhash_lsh_oracle()}
), edges AS (
  SELECT id_a AS s, id_b AS t FROM pairs
  UNION
  SELECT id_b, id_a FROM pairs
), reach(s, t) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT r.s, e.t FROM reach r JOIN edges e ON r.t = e.s
), comp AS (
  SELECT s AS doc_id, CAST(min(t) AS BIGINT) AS component
  FROM reach GROUP BY s
)
SELECT doc_id, component,
       CASE {case} ELSE '{bounds[-1][0]}' END AS split
FROM (SELECT doc_id, component,
             {hash_fraction_sql('component', 'split')} AS hf FROM comp)
"""


@member_sql(_split_oracle())
def dedup_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-safe train/holdout/test split
    (operators/corpus.split_by_component): the split key is the near-dup
    CLUSTER representative, so a held-out document can never have a
    near-copy in train — the eval-integrity property a plain id-hash
    split silently violates. Components over the MinHash-LSH pair graph;
    the oracle re-derives clusters recursively and the boundary-exact
    CASE chain."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        split_by_component,
    )

    docs = load(spark, sf_dir, "documents")
    pairs = minhash_similarity(docs, threshold=0.3)
    return split_by_component(docs, pairs, _SPLIT_WEIGHTS).select(
        "doc_id", "component", "split")


_SPAN_WINDOW = 8
_SPAN_MIN = 10
# 12 marker tokens absent from the fixture vocabulary, shared verbatim
# by every doc_id % 3 == 0 document — a planted cross-doc span longer
# than _SPAN_MIN whose start position differs per document.
_SPAN_MARKER = ("alphaq betaq gammaq deltaq epsq zetaq etaq thetaq "
                "iotaq kappaq lambdaq muq")

_SPAN_SQL = f"""
WITH t AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(lower(
           CASE WHEN doc_id % 3 = 0
                THEN text || ' {_SPAN_MARKER}' ELSE text END)), '\\s+'),
           x -> x != '') AS w
  FROM documents WHERE doc_id < 60
), ix AS (
  SELECT doc_id, w,
         unnest(generate_series(1, greatest(len(w) - {_SPAN_WINDOW} + 1,
                                            1))) AS pos
  FROM t
), sp AS (
  SELECT doc_id, pos,
         substr(md5(array_to_string(w[pos:pos+{_SPAN_WINDOW - 1}], ' ')),
                1, 16) AS h
  FROM ix
), m AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b,
         a.pos AS pa, b.pos AS pb, a.pos - b.pos AS d
  FROM sp a JOIN sp b ON a.h = b.h AND a.doc_id < b.doc_id
), r AS (
  SELECT id_a, id_b, d, pa, pb,
         pa - row_number() OVER (PARTITION BY id_a, id_b, d ORDER BY pa)
           AS isl
  FROM m
), runs AS (
  SELECT id_a, id_b, min(pa) AS start_a, min(pb) AS start_b,
         count(*) + {_SPAN_WINDOW} - 1 AS span_tokens
  FROM r GROUP BY id_a, id_b, d, isl
)
SELECT id_a, id_b, start_a, start_b, span_tokens
FROM runs WHERE span_tokens >= {_SPAN_MIN}
"""


@member_sql(_SPAN_SQL)
def dedup_common_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document shared spans (operators/text.common_span_pairs):
    maximal runs of ≥ min_span identical consecutive tokens between
    document pairs, with start positions — pair-level substring dedup. The
    fixture plants a 12-token marker passage on every third document (at
    a per-doc position, since document lengths differ); the oracle
    re-derives positional shingles, the diagonal gaps-and-islands run
    merge, and the span arithmetic independently."""
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        common_span_pairs,
    )

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 60)
    planted = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 3 == 0,
               F.concat(F.col("text"), F.lit(" " + _SPAN_MARKER)))
        .otherwise(F.col("text")).alias("text"))
    return common_span_pairs(planted, window=_SPAN_WINDOW,
                             min_span=_SPAN_MIN)


_OVERLAP_FP = ("substr(md5(regexp_replace(lower(trim(text)), '\\s+', ' ', "
               "'g')), 1, 16)")

_OVERLAP_SQL = f"""
WITH fa AS (
  SELECT {_OVERLAP_FP} AS fp, count(*) AS na
  FROM documents WHERE doc_id % 2 = 0 GROUP BY 1
), fb AS (
  SELECT {_OVERLAP_FP} AS fp, count(*) AS nb
  FROM documents WHERE doc_id % 2 = 1 GROUP BY 1
), j AS (
  SELECT na, nb FROM fa FULL OUTER JOIN fb USING (fp)
)
SELECT CAST(coalesce(sum(na), 0) AS BIGINT) AS n_docs_a,
       CAST(count(na) AS BIGINT) AS n_texts_a,
       CAST(coalesce(sum(nb), 0) AS BIGINT) AS n_docs_b,
       CAST(count(nb) AS BIGINT) AS n_texts_b,
       CAST(count(CASE WHEN na IS NOT NULL AND nb IS NOT NULL
                  THEN 1 END) AS BIGINT) AS n_texts_shared,
       round(sum(CASE WHEN na IS NOT NULL THEN coalesce(nb, 0)
                 ELSE 0 END) / sum(nb), 6) AS frac_b_seen
FROM j
"""


@member_sql(_OVERLAP_SQL)
def dedup_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus overlap report (operators/dedup.corpus_overlap):
    'corpus a' = even doc_ids, 'corpus b' = odd — the new-crawl
    pre-flight (docs/distinct-texts per side, shared texts, and the
    fraction of b's documents already present in a). The fixture's
    natural exact duplicates straddle the parity split, so every
    counter is exercised; the oracle re-derives the full-outer
    fingerprint join and each aggregate."""
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        corpus_overlap,
    )

    docs = load(spark, sf_dir, "documents")
    return corpus_overlap(docs.filter(F.col("doc_id") % 2 == 0),
                          docs.filter(F.col("doc_id") % 2 == 1))


def _url_oracle() -> str:
    from harvesting_extract_to_ttl_service_spark.operators.web import (
        normalize_url_sql,
    )

    return f"""
WITH u AS (
  SELECT doc_id,
         CASE doc_id % 5
           WHEN 0 THEN 'HTTPS://Ex.ORG:443/a/' || (doc_id % 20)
                       || '/?utm_source=x&b=2&a=1#frag'
           WHEN 1 THEN 'https://ex.org/a/' || (doc_id % 20) || '?a=1&b=2'
           WHEN 2 THEN 'http://EX.org:80/a/' || (doc_id % 20) || '/'
           WHEN 3 THEN 'not a url at all ' || doc_id
           ELSE 'https://ex.org/b/' || doc_id || '?gclid=zz'
         END AS url
  FROM documents WHERE doc_id < 200
), n AS (
  SELECT doc_id, {normalize_url_sql('url')} AS norm_url FROM u
), k AS (
  SELECT doc_id, norm_url,
         row_number() OVER (PARTITION BY norm_url ORDER BY doc_id) AS rn
  FROM n WHERE norm_url IS NOT NULL
)
SELECT doc_id, norm_url FROM k WHERE rn = 1
UNION ALL
SELECT doc_id, norm_url FROM n WHERE norm_url IS NULL
"""


@member_sql(_url_oracle())
def dedup_url(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-keyed dedup (operators/web.py): canonicalize crawl URLs
    (case, default ports, tracking params, param order, trailing slash,
    fragment) and keep the min-id row per canonical form; unparseable
    URLs pass through on the NULL lane. The fixture plants five URL
    spelling classes per doc_id — classes 0 and 1 canonicalize to the
    SAME key so cross-class collapses are exercised, class 3 never
    parses. The oracle restates the full canonicalization via
    normalize_url_sql and replays keep-one independently."""
    from harvesting_extract_to_ttl_service_spark.operators.web import (
        drop_url_duplicates,
    )

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    k = F.col("doc_id") % 20
    u = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 5 == 0,
               F.concat(F.lit("HTTPS://Ex.ORG:443/a/"), k,
                        F.lit("/?utm_source=x&b=2&a=1#frag")))
        .when(F.col("doc_id") % 5 == 1,
              F.concat(F.lit("https://ex.org/a/"), k, F.lit("?a=1&b=2")))
        .when(F.col("doc_id") % 5 == 2,
              F.concat(F.lit("http://EX.org:80/a/"), k, F.lit("/")))
        .when(F.col("doc_id") % 5 == 3,
              F.concat(F.lit("not a url at all "), F.col("doc_id")))
        .otherwise(F.concat(F.lit("https://ex.org/b/"), F.col("doc_id"),
                            F.lit("?gclid=zz")))
        .alias("url"))
    return drop_url_duplicates(u, "url", "doc_id").select(
        "doc_id", F.col("_norm_url").alias("norm_url"))


def _mih_positions_sql() -> str:
    """The banded bit-sampling plan inlined as VALUES (tbl, i, p) —
    the oracle re-derives the 16-bit table keys from the SAME plan-time
    constants the Spark operator uses."""
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        banded_bit_positions,
    )

    rows = []
    for t, pos in enumerate(banded_bit_positions(60, 16, 16)):
        rows.extend(f"({t}, {i}, {p})" for i, p in enumerate(pos))
    return ", ".join(rows)


@member_sql(f"""
WITH w AS (
  SELECT doc_id, {_WORDS} AS w FROM documents WHERE doc_id < 1000
), g AS (
  SELECT doc_id, unnest({_grams_sql(2)}) AS g FROM w
), hh AS (
  SELECT doc_id, {_HASH60} AS hv FROM g
), bits AS (
  SELECT doc_id, k,
         sum(CASE WHEN (hv >> k) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM hh, (SELECT unnest(range(0, 60)) AS k)
  GROUP BY doc_id, k
), sh AS (
  SELECT doc_id,
         sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << k) ELSE 0 END) AS v
  FROM bits GROUP BY doc_id
), pos(tbl, i, p) AS (
  VALUES {{MIH_POSITIONS}}
), keys AS (
  SELECT s.doc_id, pos.tbl,
         sum(((s.v >> pos.p) & 1) << pos.i) AS key
  FROM sh s CROSS JOIN pos GROUP BY 1, 2
), cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM keys a JOIN keys b
    ON a.tbl = b.tbl AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT c.id_a, c.id_b, bit_count(xor(sa.v, sb.v)) AS hamming
FROM cand c
JOIN sh sa ON sa.doc_id = c.id_a
JOIN sh sb ON sb.doc_id = c.id_b
WHERE bit_count(xor(sa.v, sb.v)) <= 6
""".replace("{MIH_POSITIONS}", _mih_positions_sql()))
def dedup_mih(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded multi-index Hamming near-dup
    (operators/dedup.hamming_banded_pairs — the corpus-wide,
    probabilistic-recall sibling of the complete pigeonhole join in
    `simhash_pairs`): 16 tables of 16-bit sampled simhash keys, exact
    bit_count verify. The oracle re-derives the simhash table AND the
    banding from the same plan-time bit positions, so the emitted
    subset (which true pairs the banding looks at) is verified
    pair-for-pair, not just counted."""
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        hamming_banded_pairs,
        simhash_table,
    )

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 1000)
    sh = simhash_table(docs, bits=60)
    return hamming_banded_pairs(sh, bits=60, max_hamming=6,
                                n_tables=16, bits_per_table=16).select(
        F.col("id_a"), F.col("id_b"), F.col("hamming"))


_DEDUP_MEMBERS = [
    ("exact", dedup_exact_docs, ["fp", "canonical_id", "group_size"], []),
    ("ngram", dedup_ngram_jaccard, ["id_a", "id_b"], ["jaccard"]),
    ("clusters", dedup_clusters, ["doc_id", "cluster"], []),
    ("incr", dedup_incremental, ["id_a", "id_b"], ["est_jaccard"]),
    ("hot", dedup_hot_passages, ["hash", "n_docs"], []),
    ("strip", dedup_strip_stats,
     ["doc_id", "n_tokens_before", "n_tokens_removed"], []),
    ("split", dedup_split, ["doc_id", "component", "split"], []),
    ("url", dedup_url, ["doc_id", "norm_url"], []),
    ("span", dedup_common_spans,
     ["id_a", "id_b", "start_a", "start_b", "span_tokens"], []),
    ("mih", dedup_mih, ["id_a", "id_b", "hamming"], []),
    ("overlap", dedup_overlap,
     ["n_docs_a", "n_texts_a", "n_docs_b", "n_texts_b", "n_texts_shared"],
     ["frac_b_seen"]),
]


@q("dedup_suite", suite_sql(_DEDUP_MEMBERS))
def dedup_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup suite (tagged union, keeps the 50-entry window): exact
    fingerprint groups, capped n-gram Jaccard pairs, pair-graph →
    duplicate-group clustering via hash-to-min connected components
    (recursive-CTE oracle), and incremental batch-vs-index dedup
    (full-recompute oracle restricted to batch-touching pairs)."""
    return suite_df(spark, sf_dir, _DEDUP_MEMBERS)


@q("simhash_pairs", f"""
WITH w AS (
  SELECT doc_id, {_WORDS} AS w FROM documents
), g AS (
  SELECT doc_id, unnest({_grams_sql(2)}) AS g FROM w
), hh AS (
  SELECT doc_id, {_HASH60} AS hv FROM g
), bits AS (
  SELECT doc_id, k,
         sum(CASE WHEN (hv >> k) & 1 = 1 THEN 1 ELSE -1 END) AS s
  FROM hh, (SELECT unnest(range(0, 60)) AS k)
  GROUP BY doc_id, k
), sh AS (
  SELECT doc_id,
         sum(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << k) ELSE 0 END) AS v
  FROM bits GROUP BY doc_id
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.v, b.v)) AS hamming
FROM sh a JOIN sh b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.v, b.v)) <= 6
""")
def simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup: 60-bit fingerprints, pigeonhole block join with
    the minimum block count for the radius (hamming ≤ 6 ⇒ 7 variable-width
    blocks of 8-9 bits — the widest blocks that stay complete, so the
    bucket space is ~3k instead of 640 and the candidate join stays small).
    The oracle brute-forces all pairs — valid because the pigeonhole
    candidate set is provably complete, so blocked and brute-force answers
    are identical sets."""
    docs = load(spark, sf_dir, "documents")
    return simhash_candidates(docs, bits=60, max_hamming=6, blocks=7)


# --------------------------------------------------------------------------
# Similarity search
# --------------------------------------------------------------------------

_COS_SQL = """
WITH q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       round(
         list_reduce(list_transform(list_zip(e.embedding, q.qv),
                     z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)),
                     (a, b) -> a + b)
         / (sqrt(list_reduce(list_transform(e.embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                     (a, b) -> a + b))
            * sqrt(list_reduce(list_transform(q.qv,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                     (a, b) -> a + b))), 6) AS cos_sim
FROM embeddings e, q
WHERE e.vec_id <> 0
ORDER BY cos_sim DESC, e.vec_id
LIMIT 10
"""


@q("embedding_cosine_topk", _COS_SQL)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-10 vs the vec_id=0 embedding. The
    fold runs in double precision in identical order in both engines, so
    even unrounded values are bit-equal. The query vector attaches via a
    one-row broadcast cross join (cosine_topk_df) — no driver
    ``head()`` round-trip, ONE job per run instead of two (round 16,
    guide §5; mirrors the oracle's ``FROM embeddings e, q``)."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        cosine_topk_df,
    )

    emb = load(spark, sf_dir, "embeddings")
    q = emb.filter(F.col("vec_id") == 0).select("embedding")
    return cosine_topk_df(emb.filter(F.col("vec_id") != 0), q, k=10)


# The embeddings fixture is 64-dimensional at every SF; the oracle SQL is
# built at import time so the dimension must be static (the Spark side
# asserts it at run time).
_EMBED_DIM = 64
_NEARDUP_PLANES = 2  # 4 buckets over 200 vectors → real blocking with usable recall


def _zip_dot_sql(a: str, b: str) -> str:
    """DuckDB twin of similarity.dot(): zip → double-cast multiply → left
    fold, so the summation order (and hence every bit) matches Spark."""
    return (f"list_reduce(list_transform(list_zip({a}, {b}), "
            f"z -> CAST(z[1] AS DOUBLE) * CAST(z[2] AS DOUBLE)), "
            f"(x, y) -> x + y)")


_ANN_PLANES = 4  # 16 buckets → a query bucket holds enough rows for top-10


def _lsh_ann_oracle(k: int = 10) -> str:
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        _hyperplanes,
    )

    bucket_terms = []
    for p, plane in enumerate(_hyperplanes(_EMBED_DIM, _ANN_PLANES)):
        arr = "[" + ", ".join(repr(x) for x in plane) + "]"
        bucket_terms.append(
            f"(CASE WHEN {_zip_dot_sql('embedding', arr)} > 0 "
            f"THEN {1 << p} ELSE 0 END)")
    bucket = " + ".join(bucket_terms)
    nrm = ("sqrt(list_reduce(list_transform(embedding, "
           "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))")
    return f"""
WITH v AS (
  SELECT vec_id, embedding, {bucket} AS bucket, {nrm} AS vnorm
  FROM embeddings
), q AS (SELECT embedding AS qe, bucket AS qb, vnorm AS qn FROM v WHERE vec_id = 0)
SELECT v.vec_id,
       round({_zip_dot_sql('v.embedding', 'q.qe')} / (v.vnorm * q.qn), 6)
         AS cos_sim
FROM v, q
WHERE v.bucket = q.qb AND v.vec_id <> 0
ORDER BY cos_sim DESC, v.vec_id
LIMIT {k}
"""


@member_sql(_lsh_ann_oracle())
def lsh_ann_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate ANN: restrict to the query's random-hyperplane LSH
    bucket, exact cosine inside. The approximation is still deterministic
    (fixed hyperplane constants), so the oracle restates the bucket
    function AND the in-bucket top-k — the recall trade is verified, not
    just trusted."""
    emb = load(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return lsh_ann_topk(emb.filter(F.col("vec_id") != 0), list(qvec), k=10,
                        n_planes=_ANN_PLANES)


def _lsh_multiprobe_oracle(k: int = 10, probe_bits: int = 1) -> str:
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        _hyperplanes,
    )

    bucket_terms = []
    for p, plane in enumerate(_hyperplanes(_EMBED_DIM, _ANN_PLANES)):
        arr = "[" + ", ".join(repr(x) for x in plane) + "]"
        bucket_terms.append(
            f"(CASE WHEN {_zip_dot_sql('embedding', arr)} > 0 "
            f"THEN {1 << p} ELSE 0 END)")
    bucket = " + ".join(bucket_terms)
    nrm = ("sqrt(list_reduce(list_transform(embedding, "
           "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))")
    # the enumerated probe set IS the Hamming ball, so the oracle states
    # it directly as bit_count(xor(bucket, query_bucket)) <= probe_bits
    return f"""
WITH v AS (
  SELECT vec_id, embedding, {bucket} AS bucket, {nrm} AS vnorm
  FROM embeddings
), q AS (SELECT embedding AS qe, bucket AS qb, vnorm AS qn FROM v WHERE vec_id = 0)
SELECT v.vec_id,
       round({_zip_dot_sql('v.embedding', 'q.qe')} / (v.vnorm * q.qn), 6)
         AS cos_sim
FROM v, q
WHERE bit_count(xor(v.bucket, q.qb)) <= {probe_bits} AND v.vec_id <> 0
ORDER BY cos_sim DESC, v.vec_id
LIMIT {k}
"""


@member_sql(_lsh_multiprobe_oracle())
def lsh_ann_multiprobe_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe sign-LSH ANN: the query bucket plus all buckets one
    sign flip away (Hamming ball, driver-enumerated IN-list → partition
    pruning still applies), exact cosine inside the union — the recall
    knob for the sign-LSH path, twin of IVF's n_probe. The oracle states
    the ball as bit_count(xor(bucket, qbucket)) <= 1."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        lsh_ann_topk_multiprobe,
    )

    emb = load(spark, sf_dir, "embeddings")
    qvec = emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]
    return lsh_ann_topk_multiprobe(emb.filter(F.col("vec_id") != 0),
                                   list(qvec), k=10, n_planes=_ANN_PLANES,
                                   probe_bits=1)


def _lsh_neardup_oracle(threshold: float = 0.25, max_id: int = 200,
                        hamming: int = 0) -> str:
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        _hyperplanes,
    )

    bucket_terms = []
    for p, plane in enumerate(_hyperplanes(_EMBED_DIM, _NEARDUP_PLANES)):
        arr = "[" + ", ".join(repr(x) for x in plane) + "]"
        bucket_terms.append(
            f"(CASE WHEN {_zip_dot_sql('embedding', arr)} > 0 "
            f"THEN {1 << p} ELSE 0 END)")
    bucket = " + ".join(bucket_terms)
    nrm = ("sqrt(list_reduce(list_transform(embedding, "
           "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))")
    cond = ("a.bucket = b.bucket" if hamming == 0 else
            f"bit_count(xor(a.bucket, b.bucket)) <= {hamming}")
    return f"""
WITH v AS (
  SELECT vec_id, embedding, {bucket} AS bucket, {nrm} AS vnorm
  FROM embeddings WHERE vec_id < {max_id}
), pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round({_zip_dot_sql('a.embedding', 'b.embedding')}
               / (a.vnorm * b.vnorm), 6) AS cos_sim
  FROM v a JOIN v b ON {cond} AND a.vec_id < b.vec_id
)
SELECT id_a, id_b, cos_sim FROM pairs WHERE cos_sim >= {threshold}
"""


@q("embedding_cosine_neardup", _lsh_neardup_oracle())
def embedding_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (dedup category #5), routed
    through sign-LSH blocking: candidates from an equi-join on the
    hyperplane-sign bucket (plan-pinned: no BroadcastNestedLoopJoin), then
    exact rounded cosine ≥ 0.25 inside each bucket. The oracle restates the
    bucket function (deterministic hyperplane constants) and the fold, so
    the blocked semantics — including the recall trade — are verified, not
    just the refine step."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        lsh_blocked_pairs,
    )

    emb = (load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
           .select("vec_id", "embedding"))
    return lsh_blocked_pairs(emb, threshold=0.25, dim=_EMBED_DIM,
                             n_planes=_NEARDUP_PLANES)


# --------------------------------------------------------------------------
# Text analysis
# --------------------------------------------------------------------------

def _lang_pred_sql() -> str:
    langs = sorted(LANG_MARKERS)
    hits = {
        lang: ("len(list_filter(wl, x -> list_contains(["
               + ", ".join(f"'{w.lower()}'" for w in LANG_MARKERS[lang])
               + "], x)))")
        for lang in langs
    }
    m = "greatest(" + ", ".join(hits[lang] for lang in langs) + ")"
    cases = " ".join(
        f"WHEN {hits[lang]} = {m} THEN '{lang}'" for lang in langs
    )
    return f"CASE WHEN {m} = 0 THEN 'und' {cases} ELSE 'und' END"


_SW_LIST = "[" + ", ".join(f"'{w}'" for w in EN_STOPWORDS) + "]"

_TEXT_STATS_SQL = f"""
WITH base AS (
  SELECT doc_id, text, lang, source, n_chars,
         {_WORDS_RAW} AS w,
         {_WORDS} AS wl
  FROM documents
), m AS (
  SELECT *,
    len(w) AS n_tokens,
    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')) AS n_bpe_tokens,
    CASE WHEN len(w) > 0 THEN
      CAST(list_reduce(list_transform(w, x -> length(x)), (a, b) -> a + b)
           AS DOUBLE) / len(w)
    ELSE CAST(0.0 AS DOUBLE) END AS _awl,
    CASE WHEN len(wl) > 0 THEN
      CAST(len(list_filter(wl, x -> list_contains({_SW_LIST}, x)))
           AS DOUBLE) / len(wl)
    ELSE CAST(0.0 AS DOUBLE) END AS _swr,
    CASE WHEN length(text) > 0 THEN
      CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
           AS DOUBLE) / length(text)
    ELSE CAST(0.0 AS DOUBLE) END AS _pr
  FROM base
)
SELECT doc_id, text, lang, source, n_chars, n_tokens, n_bpe_tokens,
       round(_awl, 4) AS avg_token_len,
       round(_swr, 4) AS stopword_ratio,
       round(_pr, 4)  AS punct_ratio,
       round(CAST(
             0.3 * (CASE WHEN n_tokens BETWEEN 10 AND 100000 THEN 1.0 ELSE 0.0 END)
           + 0.2 * (CASE WHEN _awl >= 2.0 AND _awl <= 12.0 THEN 1.0 ELSE 0.0 END)
           + 0.3 * (CASE WHEN _swr >= 0.01 THEN 1.0 ELSE 0.0 END)
           + 0.2 * (CASE WHEN _pr <= 0.2 THEN 1.0 ELSE 0.0 END) AS DOUBLE), 4)
         AS quality,
       {_lang_pred_sql()} AS lang_pred,
       substr(md5({_NORM_TEXT}), 1, 16) AS fingerprint
FROM m
"""


@q("text_stats", _TEXT_STATS_SQL)
def text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full text-analysis projection (token counts, quality, lang-id,
    fingerprint) — single codegen'd scan, oracle restates every formula.
    The projection is CPU-dense (regex + HOFs per document) over a
    one-partition fixture scan, so spread to cores first (no-op on a
    many-partition corpus)."""
    return annotate_documents(spread_for_cpu(load(spark, sf_dir, "documents")))


@q("docs_by_source_lang", """
SELECT source, lang, count(*) AS n_docs,
       round(avg(n_chars), 4) AS avg_chars,
       CAST(sum(len(list_filter(string_split_regex(trim(text), '\\s+'),
                                x -> x != ''))) AS BIGINT) AS total_tokens
FROM documents
GROUP BY source, lang
""")
def docs_by_source_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harvesting_extract_to_ttl_service_spark.operators.text import token_count

    d = load(spark, sf_dir, "documents")
    return (
        d.groupBy("source", "lang")
        .agg(F.count("*").alias("n_docs"),
             F.round(F.avg("n_chars"), 4).alias("avg_chars"),
             F.sum(token_count(F.col("text"))).alias("total_tokens"))
    )


# --------------------------------------------------------------------------
# Multimodal plumbing
# --------------------------------------------------------------------------

@member_sql("""
SELECT doc_id AS media_id,
       64 + octet_length(encode(text)) % 512        AS width,
       64 + (octet_length(encode(text)) // 7) % 512 AS height,
       octet_length(encode(text))                   AS n_bytes,
       substr(md5(text), 1, 8)                      AS checksum
FROM documents
""")
def multimodal_image_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary-column decode plumbing: documents wrapped as opaque payloads,
    features extracted through the Arrow `mapInPandas` kernel (deterministic
    fake decoder — the real one is stubbed, see operators/multimodal.py)."""
    media = documents_as_media(load(spark, sf_dir, "documents"))
    # decoder pinned to the fake formulas: the oracle restates exactly
    # them, and a text payload starting with real magic bytes must not
    # silently switch kernels under a parity check
    feats = extract_image_features(media, decoder="fake")
    return feats.select("media_id", "width", "height", "n_bytes", "checksum")


@q("top_words", f"""
SELECT w AS word, count(*) AS n
FROM (SELECT unnest({_WORDS}) AS w FROM documents)
GROUP BY w ORDER BY n DESC, w LIMIT 20
""")
def top_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus word frequencies: tokenize → explode → count → top-k.
    Catalyst plans partial counts before the shuffle (map-side combine),
    so the exploded token stream never shuffles raw — only (word, count)
    pairs per partition."""
    from harvesting_extract_to_ttl_service_spark.operators.text import tokens

    docs = load(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens(F.lower("text"))).alias("word"))
        .groupBy("word").agg(F.count("*").alias("n"))
        .orderBy(F.col("n").desc(), "word").limit(20)
    )


@member_sql("""
SELECT doc_id AS media_id,
       CASE octet_length(encode(text)) % 4
            WHEN 0 THEN 8000 WHEN 1 THEN 16000
            WHEN 2 THEN 44100 ELSE 48000 END        AS sample_rate,
       round(octet_length(encode(text)) / 1024.0, 3) AS duration_s,
       octet_length(encode(text))                    AS n_bytes
FROM documents WHERE doc_id % 3 = 0
""")
def multimodal_audio_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-decode plumbing twin of multimodal_image_meta: documents
    wrapped as opaque audio payloads, probed by the deterministic stub
    kernel inside mapInPandas; the oracle restates rate/duration from the
    payload byte length (loudness needs byte arithmetic SQL can't restate
    cheaply, so it stays engine-side)."""
    from harvesting_extract_to_ttl_service_spark.operators.multimodal import (
        extract_audio_features,
    )

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") % 3 == 0)
    media = documents_as_media(docs)
    return extract_audio_features(media, decoder="fake").select(
        "media_id", "sample_rate", "duration_s", "n_bytes")


@member_sql("""
WITH cent AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id < 4
), sims AS (
  SELECT e.vec_id, c.cid,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv) AS sim
  FROM embeddings e CROSS JOIN cent c
  WHERE e.vec_id % 5 = 0
), ranked AS (
  SELECT vec_id, cid,
         row_number() OVER (PARTITION BY vec_id
                            ORDER BY sim DESC, cid) AS rn
  FROM sims
)
SELECT vec_id, CAST(cid AS INT) AS ivf_cell FROM ranked WHERE rn = 1
""")
def ivf_cell_assignment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF coarse quantization: nearest of 4 centroids (the first four
    embeddings) per vector, first centroid wins ties — the bucketed-ANN
    scale path's assignment step, restated independently by the oracle via
    a cross join + window."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        ivf_assign,
    )

    emb = load(spark, sf_dir, "embeddings")
    centroids = [list(r.embedding) for r in
                 emb.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()]
    sample = emb.filter(F.col("vec_id") % 5 == 0)
    return ivf_assign(sample, centroids).select("vec_id", "ivf_cell")


_IVF_TOPK_SQL = f"""
WITH cent AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id < 4
), q AS (SELECT embedding AS qv FROM embeddings WHERE vec_id = 0),
probe AS (
  SELECT cid FROM cent, q
  ORDER BY list_cosine_similarity(cv, CAST(qv AS DOUBLE[])) DESC, cid
  LIMIT 2
), cand AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id >= 4
), sims AS (
  SELECT e.vec_id, c.cid,
         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cv) AS sim
  FROM cand e CROSS JOIN cent c
), assigned AS (
  SELECT vec_id, cid FROM (
    SELECT vec_id, cid,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY sim DESC, cid) AS rn
    FROM sims) WHERE rn = 1
)
SELECT e.vec_id,
       round({_zip_dot_sql('e.embedding', 'q.qv')}
         / (sqrt(list_reduce(list_transform(e.embedding,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                     (a, b) -> a + b))
            * sqrt(list_reduce(list_transform(q.qv,
                     x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                     (a, b) -> a + b))), 6) AS cos_sim
FROM cand e JOIN assigned a ON e.vec_id = a.vec_id, q
WHERE a.cid IN (SELECT cid FROM probe)
ORDER BY cos_sim DESC, e.vec_id
LIMIT 10
"""


@member_sql(_IVF_TOPK_SQL)
def ivf_topk_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full IVF ANN search (the scale path beyond cell assignment): the
    2 nearest of 4 centroids to the vec_id=0 query are probed, candidates
    restricted to those cells, exact cosine top-10 within. The oracle
    restates centroid ranking, assignment, probing, and the final scores
    — both the driver-side probe choice and the distributed filter+top-k
    are verified."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        ivf_topk,
    )

    emb = load(spark, sf_dir, "embeddings")
    centroids = [list(r.embedding) for r in
                 emb.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()]
    qvec = list(emb.filter(F.col("vec_id") == 0).select("embedding").head()[0])
    return ivf_topk(emb.filter(F.col("vec_id") >= 4), qvec, centroids,
                    k=10, n_probe=2)


_KNN_JOIN_SQL = f"""
WITH cent AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id < 4
), q AS (
  SELECT vec_id AS query_id, embedding AS qv,
         sqrt(list_reduce(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))
           AS qnorm
  FROM embeddings WHERE vec_id % 7 = 0
), probe AS (
  SELECT query_id, cid FROM (
    SELECT q.query_id, c.cid,
           row_number() OVER (PARTITION BY q.query_id
             ORDER BY list_cosine_similarity(CAST(q.qv AS DOUBLE[]), c.cv)
                      DESC, c.cid) AS rn
    FROM q CROSS JOIN cent c) WHERE rn <= 2
), cand AS (
  SELECT vec_id, embedding,
         sqrt(list_reduce(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))
           AS vnorm
  FROM embeddings WHERE vec_id >= 4
), assigned AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, c.cid,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                             c.cv) DESC, c.cid) AS rn
    FROM cand e CROSS JOIN cent c) WHERE rn = 1
), scored AS (
  SELECT q.query_id, e.vec_id,
         round({_zip_dot_sql('e.embedding', 'q.qv')}
               / (e.vnorm * q.qnorm), 6) AS cos_sim
  FROM cand e
  JOIN assigned a ON e.vec_id = a.vec_id
  JOIN probe p ON a.cid = p.cid
  JOIN q ON q.query_id = p.query_id
)
SELECT query_id, vec_id, cos_sim, CAST(rank AS INT) AS rank FROM (
  SELECT query_id, vec_id, cos_sim,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY cos_sim DESC, vec_id) AS rank
  FROM scored) WHERE rank <= 3
"""


@member_sql(_KNN_JOIN_SQL)
def ivf_knn_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched kNN JOIN — every query row gets its top-3 neighbours in
    one job (`ivf_topk_join`): queries explode to their 2 nearest of 4
    centroids as a column expression, meet the cell-assigned corpus on a
    keyed equi-join, and a per-query window takes the top-k. The oracle
    restates the whole path — per-query centroid ranking, corpus
    assignment, probe join, and ranked scores — for ~1/7 of the
    embeddings as queries at once."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        ivf_topk_join,
    )

    emb = load(spark, sf_dir, "embeddings")
    centroids = [list(r.embedding) for r in
                 emb.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()]
    queries = (emb.filter(F.col("vec_id") % 7 == 0)
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    return ivf_topk_join(queries, emb.filter(F.col("vec_id") >= 4),
                         centroids, k=3, n_probe=2)


_DECON_SEM_T = 0.3
_DECON_SEM_SQL = f"""
WITH cent AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id < 4
), c AS (
  SELECT vec_id, embedding,
         sqrt(list_reduce(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))
           AS vnorm
  FROM embeddings WHERE vec_id >= 4 AND vec_id < 480
), b AS (
  SELECT vec_id AS bench_id, embedding AS bv,
         sqrt(list_reduce(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))
           AS bnorm
  FROM embeddings WHERE vec_id >= 480
), assigned AS (
  SELECT vec_id, cid FROM (
    SELECT e.vec_id, ct.cid,
           row_number() OVER (PARTITION BY e.vec_id
             ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                             ct.cv) DESC, ct.cid) AS rn
    FROM c e CROSS JOIN cent ct) WHERE rn = 1
), probe AS (
  SELECT bench_id, cid FROM (
    SELECT b.bench_id, ct.cid,
           row_number() OVER (PARTITION BY b.bench_id
             ORDER BY list_cosine_similarity(CAST(b.bv AS DOUBLE[]), ct.cv)
                      DESC, ct.cid) AS rn
    FROM b CROSS JOIN cent ct) WHERE rn <= 2
)
SELECT e.vec_id AS doc_id, b.bench_id,
       round({_zip_dot_sql('e.embedding', 'b.bv')}
             / (e.vnorm * b.bnorm), 6) AS cos_sim
FROM c e
JOIN assigned a ON e.vec_id = a.vec_id
JOIN probe p ON a.cid = p.cid
JOIN b ON b.bench_id = p.bench_id
WHERE round({_zip_dot_sql('e.embedding', 'b.bv')}
            / (e.vnorm * b.bnorm), 6) >= {_DECON_SEM_T}
"""


@member_sql(_DECON_SEM_SQL)
def decontam_semantic_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic benchmark decontamination
    (operators/corpus.benchmark_contamination_semantic): corpus vectors
    (vec_id 4..479) whose exact cosine to any eval vector (vec_id ≥
    480) reaches {t}, IVF-blocked — corpus assigned once (never
    exploded), the SMALL bench side probes its 2 nearest of 4 cells and
    broadcasts. The oracle restates assignment, per-bench probing, the
    blocked join, and every score — the paraphrase-leakage check
    shingle/MinHash decontam cannot do."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        benchmark_contamination_semantic,
    )

    emb = load(spark, sf_dir, "embeddings")
    centroids = [list(r.embedding) for r in
                 emb.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()]
    corpus = (emb.filter((F.col("vec_id") >= 4) & (F.col("vec_id") < 480))
              .select(F.col("vec_id").alias("doc_id"), "embedding"))
    bench = (emb.filter(F.col("vec_id") >= 480)
             .select(F.col("vec_id").alias("bench_id"), "embedding"))
    return benchmark_contamination_semantic(
        corpus, bench, centroids, threshold=_DECON_SEM_T, n_probe=2)


_SELF_TOPK_N = 40  # bounded slice: the member exists to verify the exact
_SELF_TOPK_SQL = f"""
WITH v AS (
  SELECT vec_id, embedding,
         sqrt(list_reduce(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))
           AS vnorm
  FROM embeddings WHERE vec_id < {_SELF_TOPK_N}
), pairs AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round({_zip_dot_sql('a.embedding', 'b.embedding')}
               / (a.vnorm * b.vnorm), 6) AS cos_sim
  FROM v a JOIN v b ON a.vec_id <> b.vec_id
)
SELECT id_a, id_b, cos_sim FROM (
  SELECT id_a, id_b, cos_sim,
         row_number() OVER (PARTITION BY id_a
                            ORDER BY cos_sim DESC, id_b) AS rn
  FROM pairs) WHERE rn <= 3
"""


@member_sql(_SELF_TOPK_SQL)
def cosine_self_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs per-vector top-k (`cosine_self_join_topk`) over a
    bounded 40-vector slice — the small-corpus exact baseline the bucketed
    members approximate; the oracle restates the full pairwise ranking
    with a window function. The operator is O(n²) by design and documented
    as such; `lsh_blocked_pairs` is the scale path."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        cosine_self_join_topk,
    )

    emb = load(spark, sf_dir, "embeddings").filter(
        F.col("vec_id") < _SELF_TOPK_N)
    return cosine_self_join_topk(emb, k=3)


@member_sql(_lsh_neardup_oracle(hamming=1))
def lsh_blocked_pairs_mp_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe blocked near-dup pairs: one side explodes over the
    Hamming-1 ball of its sign bucket, so boundary pairs whose buckets
    differ in one plane sign — the single-bucket member's recall loss —
    surface as candidates. The oracle restates the criterion directly as
    bit_count(xor(bucket_a, bucket_b)) <= 1, verifying each pair appears
    exactly once (one XOR mask per pair) with its exact cosine."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        lsh_blocked_pairs,
    )

    emb = (load(spark, sf_dir, "embeddings").filter(F.col("vec_id") < 200)
           .select("vec_id", "embedding"))
    return lsh_blocked_pairs(emb, threshold=0.25, dim=_EMBED_DIM,
                             n_planes=_NEARDUP_PLANES, probe_bits=1)


_SEM_DEDUP_SQL = f"""
WITH cent AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id < 4
), v AS (
  SELECT vec_id, embedding,
         sqrt(list_reduce(list_transform(embedding,
              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), (x, y) -> x + y))
           AS vnorm
  FROM embeddings WHERE vec_id >= 4
), assigned AS (
  SELECT vec_id, cid FROM (
    SELECT v.vec_id, c.cid,
           row_number() OVER (PARTITION BY v.vec_id
             ORDER BY list_cosine_similarity(CAST(v.embedding AS DOUBLE[]),
                                             c.cv) DESC, c.cid) AS rn
    FROM v CROSS JOIN cent c) WHERE rn = 1
)
SELECT id_a, id_b, cos_sim FROM (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         round({_zip_dot_sql('a.embedding', 'b.embedding')}
               / (a.vnorm * b.vnorm), 6) AS cos_sim
  FROM v a JOIN assigned aa ON a.vec_id = aa.vec_id
  JOIN v b ON a.vec_id < b.vec_id
  JOIN assigned ab ON b.vec_id = ab.vec_id AND aa.cid = ab.cid)
WHERE cos_sim >= 0.3
"""


@member_sql(_SEM_DEDUP_SQL)
def semantic_cluster_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-blocked semantic near-dup pairs (the SemDeDup shape):
    every corpus vector is assigned to its nearest of 4 centroids, exact
    cosine refines within each cell only. The oracle restates the
    argmax-cosine assignment (window-ranked, ties to the lowest cell id —
    the same rule as `ivf_assign`) and the within-cell pair scores, so
    blocking AND refinement are both verified. The data-adaptive twin of
    the random-hyperplane `blocked_mp` member."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        cluster_neardup_pairs,
    )

    emb = load(spark, sf_dir, "embeddings")
    centroids = [list(r.embedding) for r in
                 emb.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()]
    return cluster_neardup_pairs(emb.filter(F.col("vec_id") >= 4),
                                 centroids, threshold=0.3)


def _int_dot_sql(a: str, b: str) -> str:
    """DuckDB twin of similarity.int_dot(): exact BIGINT accumulation."""
    return (f"list_reduce(list_transform(list_zip({a}, {b}), "
            f"z -> CAST(z[1] AS BIGINT) * CAST(z[2] AS BIGINT)), "
            f"(x, y) -> x + y)")


_QUANT_SQL = f"""
WITH m AS (
  SELECT vec_id, embedding,
         list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE))))
           AS mabs
  FROM embeddings
), c AS (
  SELECT vec_id,
         CASE WHEN mabs > 0 THEN list_transform(embedding,
              x -> CAST(floor(CAST(x AS DOUBLE) * 127 / mabs + 0.5)
                        AS BIGINT))
         ELSE list_transform(embedding, x -> CAST(0 AS BIGINT)) END AS codes
  FROM m
), q AS (SELECT codes AS qc FROM c WHERE vec_id = 0)
SELECT c.vec_id,
       round(CAST({_int_dot_sql('c.codes', 'q.qc')} AS DOUBLE)
             / (sqrt(CAST({_int_dot_sql('c.codes', 'c.codes')} AS DOUBLE))
                * sqrt(CAST({_int_dot_sql('q.qc', 'q.qc')} AS DOUBLE))),
             6) AS cos_sim
FROM c, q
WHERE c.vec_id <> 0
ORDER BY cos_sim DESC, c.vec_id
LIMIT 10
"""


@member_sql(_QUANT_SQL)
def quantized_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """int8-quantized brute-force cosine top-10 vs the vec_id=0 vector
    (similarity.quantize_int8 + quantized_cosine_topk): per-vector
    symmetric scales cancel out of cosine, so the score is exact integer
    arithmetic — the compressed-storage twin of `embedding_cosine_topk`
    (float32 → 1 byte/dim ≈ 4× smaller scans at 100 TB). The oracle
    restates quantization (explicit floor-half-up) and the integer dot
    end-to-end; the query's codes come out of the SAME quantized table
    on both sides."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        quantize_int8,
        quantized_cosine_topk,
    )

    emb = load(spark, sf_dir, "embeddings")
    qt = quantize_int8(emb)
    qcodes = [int(c) for c in
              qt.filter(F.col("vec_id") == 0).select("codes").head()[0]]
    return quantized_cosine_topk(qt.filter(F.col("vec_id") != 0), qcodes,
                                 k=10)


# --- product quantization (operators/similarity.py pq_*) --------------
# Codebooks are data-derived and fully restatable (the IVF members'
# convention): sub-codebook b = the b-th 16-component slice of
# embeddings vec_id 0..15. The oracle re-derives the codebooks, every
# argmin-L2 code, the reconstruction norms, the ADC lookup tables, and
# the final cosine — all with the same component-ordered folds.
_PQ_M = 4
_PQ_KSUB = 16
_PQ_SUB = 16  # dim 64 / m
_PQ_K = 10

_PQ_SQL = f"""
WITH cb AS (
  SELECT b, vec_id AS j,
         embedding[b*{_PQ_SUB}+1 : b*{_PQ_SUB}+{_PQ_SUB}] AS c
  FROM embeddings, (SELECT unnest(range(0, {_PQ_M})) AS b)
  WHERE vec_id < {_PQ_KSUB}
), x AS (
  SELECT vec_id, b,
         embedding[b*{_PQ_SUB}+1 : b*{_PQ_SUB}+{_PQ_SUB}] AS xb
  FROM embeddings, (SELECT unnest(range(0, {_PQ_M})) AS b)
  WHERE vec_id >= {_PQ_KSUB}
), d AS (
  SELECT x.vec_id, x.b, cb.j,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(range(1, {_PQ_SUB} + 1),
             i -> (xb[i] - c[i]) * (xb[i] - c[i]))),
           (a, v) -> a + v) AS dist
  FROM x JOIN cb USING (b)
), code AS (
  SELECT vec_id, b, j AS cj FROM d
  QUALIFY row_number() OVER (PARTITION BY vec_id, b
                             ORDER BY dist, j) = 1
), q AS (
  SELECT embedding AS qv FROM embeddings WHERE vec_id = 0
), lut AS (
  SELECT cb.b, cb.j,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(range(1, {_PQ_SUB} + 1),
             i -> qv[cb.b*{_PQ_SUB}+i] * c[i])), (a, v) -> a + v) AS dp,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(range(1, {_PQ_SUB} + 1),
             i -> c[i] * c[i])), (a, v) -> a + v) AS n2
  FROM cb, q
), sc AS (
  SELECT code.vec_id,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(l.dp ORDER BY code.b)), (a, v) -> a + v) AS num,
         round(sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list(l.n2 ORDER BY code.b)), (a, v) -> a + v)), 6) AS pnorm
  FROM code JOIN lut l ON l.b = code.b AND l.j = code.cj
  GROUP BY code.vec_id
), qn AS (
  SELECT sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
    list_transform(qv, v -> v * v)), (a, v) -> a + v)) AS qnorm
  FROM q
)
SELECT vec_id, round(num / (pnorm * qnorm), 6) AS cos_sim
FROM sc, qn
WHERE pnorm > 0
ORDER BY cos_sim DESC, vec_id
LIMIT {_PQ_K}
"""


@member_sql(_PQ_SQL)
def pq_adc_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantized ADC top-10 vs the vec_id=0 vector
    (similarity.pq_encode + pq_adc_topk): m=4 blocks × ksub=16
    sub-centroids (the first 16 embeddings' slices — data-derived and
    restatable), argmin-L2 codes, reconstruction-norm cosine via
    driver-computed lookup tables. The order-of-magnitude compression
    path (m bytes/vector) next to int8's 4× — scoring never touches
    the original vectors."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
    )

    emb = load(spark, sf_dir, "embeddings")
    seeds = (emb.filter(F.col("vec_id") < _PQ_KSUB)
             .orderBy("vec_id").collect())
    books = [[[float(x) for x in r.embedding[b * _PQ_SUB:(b + 1) * _PQ_SUB]]
              for r in seeds] for b in range(_PQ_M)]
    qvec = [float(x) for x in
            emb.filter(F.col("vec_id") == 0).select("embedding")
            .head()[0]]
    codes = pq_encode(emb.filter(F.col("vec_id") >= _PQ_KSUB), books)
    return pq_adc_topk(codes, qvec, books, k=_PQ_K)


# --- residual PQ / IVFADC (operators/similarity.py pq_*_residual) -----
# Everything data-derived and restatable: coarse centroids = embeddings
# vec_id 0..3 (the IVF members' convention), residual codebooks = the
# m-block slices of the RESIDUALS of vec_id 4..19 w.r.t. their assigned
# cells. The oracle independently re-derives assignment (cosine
# ranking, first-cell ties), every residual, the codebooks, every
# argmin code, the full-reconstruction norms ‖centroid + r̂‖, the
# query-side block LUTs AND the per-cell q·centroid constant, and the
# final cosine — all with the same component-ordered folds and the
# same add order (cell term first, then blocks).
_PQR_M = 4
_PQR_SUB = 16  # dim 64 / m
_PQR_KSUB = 16

_PQRES_SQL = f"""
WITH cent AS (
  SELECT vec_id AS cid, CAST(embedding AS DOUBLE[]) AS cv
  FROM embeddings WHERE vec_id < 4
), pts AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v
  FROM embeddings WHERE vec_id >= 4
), assigned AS (
  SELECT vec_id, cid FROM (
    SELECT p.vec_id, c.cid,
           row_number() OVER (PARTITION BY p.vec_id
             ORDER BY list_cosine_similarity(p.v, c.cv) DESC,
                      c.cid) AS rn
    FROM pts p CROSS JOIN cent c) WHERE rn = 1
), resid AS (
  SELECT p.vec_id, a.cid,
         list_transform(range(1, {_PQR_M * _PQR_SUB} + 1),
                        i -> p.v[i] - c.cv[i]) AS rv
  FROM pts p JOIN assigned a USING (vec_id)
             JOIN cent c ON c.cid = a.cid
), cb AS (
  SELECT b, vec_id - 4 AS j,
         rv[b*{_PQR_SUB}+1 : b*{_PQR_SUB}+{_PQR_SUB}] AS c
  FROM resid, (SELECT unnest(range(0, {_PQR_M})) AS b)
  WHERE vec_id BETWEEN 4 AND {4 + _PQR_KSUB - 1}
), x AS (
  SELECT vec_id, cid, b,
         rv[b*{_PQR_SUB}+1 : b*{_PQR_SUB}+{_PQR_SUB}] AS xb
  FROM resid, (SELECT unnest(range(0, {_PQR_M})) AS b)
  WHERE vec_id >= {4 + _PQR_KSUB}
), d AS (
  SELECT x.vec_id, x.b, cb.j,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(range(1, {_PQR_SUB} + 1),
             i -> (xb[i] - c[i]) * (xb[i] - c[i]))),
           (a, v) -> a + v) AS dist
  FROM x JOIN cb USING (b)
), code AS (
  SELECT vec_id, b, j AS cj FROM d
  QUALIFY row_number() OVER (PARTITION BY vec_id, b
                             ORDER BY dist, j) = 1
), q AS (
  SELECT CAST(embedding AS DOUBLE[]) AS qv
  FROM embeddings WHERE vec_id = 0
), lut AS (
  SELECT cb.b, cb.j,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(range(1, {_PQR_SUB} + 1),
             i -> qv[cb.b*{_PQR_SUB}+i] * c[i])), (a, v) -> a + v) AS dp
  FROM cb, q
), qc AS (
  SELECT cid,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(range(1, {_PQR_M * _PQR_SUB} + 1),
             i -> qv[i] * cv[i])), (a, v) -> a + v) AS qcell
  FROM cent, q
), rh AS (
  SELECT code.vec_id, flatten(list(cb2.c ORDER BY code.b)) AS rhat
  FROM code JOIN cb cb2 ON cb2.b = code.b AND cb2.j = code.cj
  GROUP BY code.vec_id
), pn AS (
  SELECT r.vec_id,
         round(sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(range(1, {_PQR_M * _PQR_SUB} + 1),
             i -> (c.cv[i] + rh.rhat[i]) * (c.cv[i] + rh.rhat[i]))),
           (a, v) -> a + v)), 6) AS pnorm
  FROM rh JOIN resid r USING (vec_id) JOIN cent c ON c.cid = r.cid
), sc AS (
  SELECT code.vec_id,
         list_reduce(list_prepend(qc.qcell,
           list(l.dp ORDER BY code.b)), (a, v) -> a + v) AS num
  FROM code JOIN lut l ON l.b = code.b AND l.j = code.cj
            JOIN resid r2 ON r2.vec_id = code.vec_id
            JOIN qc ON qc.cid = r2.cid
  GROUP BY code.vec_id, qc.qcell
), qn AS (
  SELECT sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
    list_transform(qv, v -> v * v)), (a, v) -> a + v)) AS qnorm
  FROM q
)
SELECT s.vec_id, round(s.num / (p.pnorm * qn.qnorm), 6) AS cos_sim
FROM sc s JOIN pn p USING (vec_id), qn
WHERE p.pnorm > 0
ORDER BY cos_sim DESC, s.vec_id
LIMIT {_PQ_K}
"""


@member_sql(_PQRES_SQL)
def pq_residual_adc_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Residual-PQ (IVFADC) ADC top-10 vs the vec_id=0 vector
    (similarity.ivf_residuals + pq_encode_residual +
    pq_adc_topk_residual): codes quantize x − centroid(cell), pnorm
    stores ‖centroid + r̂‖, and the score adds the per-cell
    q·centroid constant to the block LUTs — the accuracy upgrade over
    the raw `pq` member at the same m (tests/test_ann_recall.py pins
    residual recall > raw recall on clustered vectors)."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        ivf_assign,
        ivf_residuals,
        pq_adc_topk_residual,
        pq_encode_residual,
    )

    emb = load(spark, sf_dir, "embeddings")
    cents = [list(r.embedding) for r in
             emb.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()]
    seed_res = (ivf_residuals(
        emb.filter((F.col("vec_id") >= 4)
                   & (F.col("vec_id") < 4 + _PQR_KSUB)),
        cents, materialize_mode="none")
        .orderBy("vec_id").collect())
    books = [[[float(x) for x in
               r.residual[b * _PQR_SUB:(b + 1) * _PQR_SUB]]
              for r in seed_res] for b in range(_PQR_M)]
    qvec = [float(x) for x in
            emb.filter(F.col("vec_id") == 0).select("embedding")
            .head()[0]]
    src = ivf_assign(emb.filter(F.col("vec_id") >= 4 + _PQR_KSUB), cents)
    codes = pq_encode_residual(src, books, cents)
    return pq_adc_topk_residual(codes, qvec, books, cents, k=_PQ_K)


from harvesting_extract_to_ttl_service_spark.operators.corpus import (  # noqa: E402
    hash_fraction_sql,
)

_TEMB_DIM = 32
_TEMB_SQL = f"""
WITH t AS (
  SELECT doc_id, {_WORDS} AS w FROM documents WHERE doc_id < 200
), s AS (
  SELECT doc_id, len(w) AS n_tokens,
         list_transform(w, x -> struct_pack(
           b := CAST(floor({{HF}} * {_TEMB_DIM}) AS INT),
           s := CASE WHEN {{HFS}} < 0.5 THEN -1.0 ELSE 1.0 END)) AS ps
  FROM t
), v AS (
  SELECT doc_id, n_tokens,
         list_transform(range(0, {_TEMB_DIM}), i ->
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list_transform(ps,
             p -> CASE WHEN p.b = i THEN p.s ELSE CAST(0.0 AS DOUBLE) END)),
             (a, b) -> a + b)) AS vec
  FROM s
), nv AS (
  SELECT doc_id, n_tokens, vec,
         sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(vec, x -> x * x)), (a, b) -> a + b)) AS nrm
  FROM v
), e AS (
  SELECT doc_id, n_tokens,
         CASE WHEN nrm > 0
              THEN list_transform(vec, x -> round(x / nrm, 6))
              ELSE vec END AS embedding
  FROM nv
)
SELECT doc_id, CAST(n_tokens AS BIGINT) AS n_tokens,
       embedding[1] AS e0, embedding[2] AS e1, embedding[3] AS e2
FROM e
""".replace("{HF}", hash_fraction_sql("x", "temb")) \
   .replace("{HFS}", hash_fraction_sql("x", "tembs"))


@member_sql(_TEMB_SQL)
def hashed_text_embedding_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signed feature-hashing text embedding (operators/text.py
    hashed_text_embedding): the model-free vectorizer that feeds the
    TEXT corpus into this suite's embedding stack — in-row fold, no
    shuffle, both engines add the floats in pinned (document, then
    component) order. Verified on the first three components per
    document (the suite's three value slots)."""
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        hashed_text_embedding,
    )

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    e = hashed_text_embedding(docs, dim=_TEMB_DIM)
    return e.select(
        "doc_id", "n_tokens",
        F.col("embedding").getItem(0).alias("e0"),
        F.col("embedding").getItem(1).alias("e1"),
        F.col("embedding").getItem(2).alias("e2"))


# --- model-backed document embeddings (functions/models.py) -----------
# The trained-vector replacement for the hashed baseline above: tf-
# weighted mean of the checked-in fastText-style fixture's token
# vectors. The Spark side runs the real loader chain (parse_vec_model →
# doc_embedding); the oracle re-parses the SAME .vec file in plain
# Python at import time (the mclf convention) and restates the
# covered-token counts, the token-sorted weighted fold, the mean, and
# the component-ordered L2 normalize independently.
_MEMB_DIM = 5
_MEMB_PATH = __import__("os").path.join(
    __import__("os").path.dirname(__file__), "..", "..", "fixtures",
    "lid_mini.vec")


def _memb_model_values(path: str = None) -> str:
    # CAST AS DOUBLE[]: bare numeric VALUES literals are DECIMAL in
    # DuckDB, and decimal-exact arithmetic diverges from the Spark
    # side's double math at round-half boundaries (the mclfsub lesson).
    rows = []
    with open(path or _MEMB_PATH) as f:
        f.readline()  # header
        for line in f:
            parts = line.split()
            vals = ", ".join(f"{float(x)!r}" for x in parts[1:])
            rows.append(f"('{parts[0]}', CAST([{vals}] AS DOUBLE[]))")
    return ", ".join(rows)


_MEMB_SQL = f"""
WITH model(t, v) AS (VALUES {{MEMB_MODEL}}),
d AS (
  SELECT doc_id, {_WORDS} AS w FROM documents WHERE doc_id < 200
), tk AS (
  SELECT doc_id, unnest(w) AS t FROM d
), cnt AS (
  SELECT doc_id, t, count(*) AS c FROM tk GROUP BY 1, 2
), cov AS (
  SELECT doc_id, sum(c) AS nm,
         list(struct_pack(t := t, cw := CAST(c AS DOUBLE), v := v)
              ORDER BY t) AS rows
  FROM cnt JOIN model USING (t) GROUP BY doc_id
), folded AS (
  SELECT doc_id, nm,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(rows, r -> r.cw)), (a, b) -> a + b) AS den,
         list_transform(range(0, {_MEMB_DIM}), j ->
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(rows, r -> r.cw * r.v[j + 1])),
             (a, b) -> a + b)) AS dots
  FROM cov
), mean AS (
  SELECT doc_id, nm,
         list_transform(dots, x -> x / den) AS m
  FROM folded
), norm AS (
  SELECT doc_id, nm, m,
         sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(m, x -> x * x)), (a, b) -> a + b)) AS nrm
  FROM mean
), emb AS (
  SELECT doc_id, nm,
         CASE WHEN nrm > 0 THEN list_transform(m, x -> round(x / nrm, 6))
              ELSE list_transform(m, x -> round(x, 6)) END AS e
  FROM norm
)
SELECT d.doc_id, CAST(len(d.w) AS BIGINT) AS n_tokens,
       CAST(coalesce(emb.nm, 0) AS BIGINT) AS n_model_tokens,
       emb.e[1] AS e0, emb.e[2] AS e1, emb.e[3] AS e2
FROM d LEFT JOIN emb USING (doc_id)
""".replace("{MEMB_MODEL}", _memb_model_values())


@member_sql(_MEMB_SQL)
def doc_embedding_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-backed document embedding (functions/models.doc_embedding):
    tf-weighted covered-token mean of the fixture model's vectors, L2
    normalized, NULL lane for uncovered docs — broadcast model join,
    one groupBy(doc), token-sorted float folds in both engines.
    Verified on the first three components (the suite's value slots);
    NULL-embedding docs surface as NULL slots."""
    from harvesting_extract_to_ttl_service_spark.functions.models import (
        doc_embedding,
        parse_vec_model,
    )

    docs = (load(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 200).select("doc_id", "text"))
    vecs = parse_vec_model(spark, _MEMB_PATH, dim=_MEMB_DIM)
    e = doc_embedding(docs, vecs, dim=_MEMB_DIM)
    return e.select(
        "doc_id", "n_tokens", "n_model_tokens",
        F.col("embedding").getItem(0).alias("e0"),
        F.col("embedding").getItem(1).alias("e1"),
        F.col("embedding").getItem(2).alias("e2"))


_MEMBSW_PATH = __import__("os").path.join(
    __import__("os").path.dirname(__file__), "..", "..", "fixtures",
    "lid_mini_sub.vec")

_MEMBSW_SQL = f"""
WITH model(t, v) AS (VALUES {{MEMB_MODEL}}),
d AS (
  SELECT doc_id, {_WORDS} AS w FROM documents WHERE doc_id < 200
), tk AS (
  SELECT doc_id, unnest(w) AS t FROM d
), cnt AS (
  SELECT doc_id, t, count(*) AS c FROM tk GROUP BY 1, 2
), uncov AS (
  SELECT DISTINCT t FROM cnt WHERE t NOT IN (SELECT t FROM model)
), grams AS (
  SELECT t, unnest(list_prepend(t,
    list_transform(range(1, length('<' || t || '>') - 1),
                   i -> substr('<' || t || '>', i, 3)))) AS g
  FROM uncov
), synth AS (
  SELECT grams.t,
         list(struct_pack(g := grams.g, v := m.v)
              ORDER BY grams.g) AS gr
  FROM grams JOIN model m ON m.t = grams.g
  GROUP BY grams.t
), synthv AS (
  SELECT t, list_transform(range(0, {_MEMB_DIM}), j ->
    round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
      list_transform(gr, r -> r.v[j + 1])), (a, b) -> a + b)
      / len(gr), 6)) AS v
  FROM synth
), ext AS (
  SELECT t, v, 0 AS sw FROM model
  UNION ALL SELECT t, v, 1 AS sw FROM synthv
), cov AS (
  SELECT doc_id,
         sum(CASE WHEN sw = 0 THEN c ELSE 0 END) AS nm,
         sum(CASE WHEN sw = 1 THEN c ELSE 0 END) AS nsw,
         list(struct_pack(t := t, cw := CAST(c AS DOUBLE), v := v)
              ORDER BY t) AS rows
  FROM cnt JOIN ext USING (t) GROUP BY doc_id
), folded AS (
  SELECT doc_id, nm, nsw,
         list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(rows, r -> r.cw)), (a, b) -> a + b) AS den,
         list_transform(range(0, {_MEMB_DIM}), j ->
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(rows, r -> r.cw * r.v[j + 1])),
             (a, b) -> a + b)) AS dots
  FROM cov
), mean AS (
  SELECT doc_id, nm, nsw,
         list_transform(dots, x -> x / den) AS m
  FROM folded
), norm AS (
  SELECT doc_id, nm, nsw, m,
         sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
           list_transform(m, x -> x * x)), (a, b) -> a + b)) AS nrm
  FROM mean
), emb AS (
  SELECT doc_id, nm, nsw,
         CASE WHEN nrm > 0 THEN list_transform(m, x -> round(x / nrm, 6))
              ELSE list_transform(m, x -> round(x, 6)) END AS e
  FROM norm
)
SELECT d.doc_id, CAST(len(d.w) AS BIGINT) AS n_tokens,
       CAST(coalesce(emb.nm, 0) AS BIGINT) AS n_model_tokens,
       CAST(coalesce(emb.nsw, 0) AS BIGINT) AS n_subword_tokens,
       emb.e[1] AS e0, emb.e[2] AS e1, emb.e[3] AS e2
FROM d LEFT JOIN emb USING (doc_id)
""".replace("{MEMB_MODEL}", _memb_model_values(_MEMBSW_PATH))


@member_sql(_MEMBSW_SQL)
def doc_embedding_subword_q(spark: SparkSession, sf_dir: str
                            ) -> DataFrame:
    """doc_embedding(char_ngrams=(3, 3)) — fastText's subword OOV
    convention over a model shipping boundary-marked 3-gram rows
    (fixtures/lid_mini_sub.vec): uncovered tokens embed as the
    gram-sorted mean of their covered n-gram vectors and join the
    weighted mean like covered tokens. The oracle independently
    re-derives the uncovered vocabulary, every synthesized vector, the
    extended-model fold, and the direct/synthesized instance counts."""
    from harvesting_extract_to_ttl_service_spark.functions.models import (
        doc_embedding,
        parse_vec_model,
    )

    docs = (load(spark, sf_dir, "documents")
            .filter(F.col("doc_id") < 200).select("doc_id", "text"))
    vecs = parse_vec_model(spark, _MEMBSW_PATH, dim=_MEMB_DIM)
    e = doc_embedding(docs, vecs, dim=_MEMB_DIM, char_ngrams=(3, 3))
    return e.select(
        "doc_id", "n_tokens", "n_model_tokens", "n_subword_tokens",
        F.col("embedding").getItem(0).alias("e0"),
        F.col("embedding").getItem(1).alias("e1"),
        F.col("embedding").getItem(2).alias("e2"))


# --- lexical retrieval: BM25 + hybrid RRF (operators/retrieval.py) ------
# k1/b are the classic BM25 defaults; every float literal in the oracle
# is CAST({x!r} AS DOUBLE) so both engines parse the exact same double
# (the DECIMAL-literal drift lesson). 'dup' is the fixture's one rare
# term (df≈25/500) — the query mixes it with three common terms so idf
# spans the fixture's whole range.
_BM25_TERMS = ("dup", "hash", "spark", "window")
_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_K = 10
_RRF_CAND = 20
_BM25J_QUERIES = [(0, "dup spark"), (1, "window hash merge"),
                  (2, "key value store dup")]
_BM25J_K = 5
_BM25J_MAXDF = 0.5


def _bm25_consts() -> tuple[str, str, str]:
    return (f"CAST({_BM25_K1!r} AS DOUBLE)",
            f"CAST({_BM25_K1 + 1.0!r} AS DOUBLE)",
            f"CAST({_BM25_B!r} AS DOUBLE)")


def _bm25_core_sql(term_filter: str, max_df: str | None = None) -> str:
    """Shared BM25 CTE chain (docs → stats → tf → df → contributions):
    the DuckDB twin of operators/retrieval's postings + corpus_stats +
    bm25_contrib, with the same pinned operand order. ``term_filter``
    is the SQL membership test over ``term``; ``max_df`` (a SQL double
    expression) adds the df-pruning CTE the batched operator applies
    when ``max_df_ratio`` is set."""
    k1, k1p1, b = _bm25_consts()
    dfk = (f""", dfk AS (
  SELECT d.term, d.df FROM dfq d CROSS JOIN st s
  WHERE d.df <= {max_df} * s.n_docs
)""" if max_df is not None else "")
    df_src = "dfk" if max_df is not None else "dfq"
    return f"""
dw AS (
  SELECT doc_id, {_WORDS} AS w FROM documents
), st AS (
  SELECT count(*) AS n_docs,
         CAST(sum(len(w)) AS DOUBLE) / count(*) AS avgdl
  FROM dw
), tf AS (
  SELECT doc_id, term, count(*) AS tf, min(dl) AS dl FROM (
    SELECT doc_id, len(w) AS dl, unnest(w) AS term FROM dw)
  WHERE {term_filter} GROUP BY doc_id, term
), dfq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
){dfk}, ctr AS (
  SELECT t.doc_id, t.term,
         ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (t.tf * {k1p1})
           / (t.tf + {k1} * (1.0 - {b} + {b} * t.dl / s.avgdl)) AS c
  FROM tf t JOIN {df_src} d USING (term) CROSS JOIN st s
)"""


_FOLD_C = ("round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE), "
           "list(c ORDER BY term)), (a, x) -> a + x), 6)")

_BM25_TLIST = ", ".join(f"'{t}'" for t in sorted(_BM25_TERMS))

_BM25_SQL = f"""
WITH {_bm25_core_sql(f"term IN ({_BM25_TLIST})")}, sc AS (
  SELECT doc_id, count(*) AS n_terms_hit, {_FOLD_C} AS score
  FROM ctr GROUP BY doc_id
)
SELECT doc_id, rank, n_terms_hit, score FROM (
  SELECT doc_id, n_terms_hit, score,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM sc)
WHERE rank <= {_BM25_K}
"""


@member_sql(_BM25_SQL)
def bm25_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-query BM25 top-10 (operators/retrieval.bm25_topk) over the
    full documents table: inverted postings filtered to the query terms,
    Lucene idf, one-row stats broadcast, pinned term-ordered score fold.
    The oracle independently re-derives postings, df, N/avgdl, every
    contribution, the fold, and the rounded-score ranking."""
    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        bm25_topk,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return bm25_topk(docs, list(_BM25_TERMS), k=_BM25_K,
                     k1=_BM25_K1, b=_BM25_B)


def _bm25_join_oracle() -> str:
    k1, k1p1, b = _bm25_consts()
    vals = ", ".join(f"({i}, '{t}')" for i, t in _BM25J_QUERIES)
    maxdf = f"CAST({_BM25J_MAXDF!r} AS DOUBLE)"
    return f"""
WITH qt AS (
  SELECT query_id, unnest(list_distinct({_WORDS})) AS term
  FROM (VALUES {vals}) AS t(query_id, text)
), {_bm25_core_sql("term IN (SELECT term FROM qt)", max_df=maxdf)}, ctq AS (
  SELECT q.query_id, t.doc_id, t.term, t.c
  FROM ctr t JOIN qt q USING (term)
), sc AS (
  SELECT query_id, doc_id, count(*) AS n_terms_hit,
         round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(c ORDER BY term)), (a, x) -> a + x), 6) AS score
  FROM ctq GROUP BY query_id, doc_id
)
SELECT query_id, doc_id, rank, n_terms_hit, score FROM (
  SELECT query_id, doc_id, n_terms_hit, score,
         row_number() OVER (PARTITION BY query_id
                            ORDER BY score DESC, doc_id) AS rank
  FROM sc)
WHERE rank <= {_BM25J_K}
"""


@member_sql(_bm25_join_oracle())
def bm25_join_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batched BM25 (operators/retrieval.bm25_topk_join): three query
    rows (one with an OOV term, one whose terms ALL prune away) top-5
    joined against the corpus with max_df pruning at 0.5 — only 'dup'
    (df≈5%) survives, so the member exercises the skew guard for real:
    queries 0 and 2 rank the dup-documents, query 1 returns nothing.
    The oracle restates query tokenization, the shared-df convention
    (per term, not per query), the pruning threshold, and the per-
    (query, doc) fold."""
    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        bm25_topk_join,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    queries = spark.createDataFrame(_BM25J_QUERIES,
                                    "query_id long, text string")
    return bm25_topk_join(queries, docs, k=_BM25J_K, k1=_BM25_K1,
                          b=_BM25_B, max_df_ratio=_BM25J_MAXDF)


_VNORM_SQL = ("sqrt(list_reduce(list_transform(embedding, "
              "x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), "
              "(x, y) -> x + y))")

_RRF_SQL = f"""
WITH {_bm25_core_sql(f"term IN ({_BM25_TLIST})")}, sc AS (
  SELECT doc_id, {_FOLD_C} AS score FROM ctr GROUP BY doc_id
), lex AS (
  SELECT doc_id, rank FROM (
    SELECT doc_id,
           row_number() OVER (ORDER BY score DESC, doc_id) AS rank
    FROM sc)
  WHERE rank <= {_RRF_CAND}
), q AS (
  SELECT embedding AS qv, {_VNORM_SQL} AS qn
  FROM embeddings WHERE vec_id = 0
), vv AS (
  SELECT vec_id, embedding, {_VNORM_SQL} AS vnorm FROM embeddings
), cosd AS (
  SELECT vec_id,
         round({_zip_dot_sql('vv.embedding', 'q.qv')}
               / (vv.vnorm * q.qn), 6) AS cos_sim
  FROM vv CROSS JOIN q
), vrank AS (
  SELECT vec_id AS doc_id, rank FROM (
    SELECT vec_id,
           row_number() OVER (ORDER BY cos_sim DESC, vec_id) AS rank
    FROM cosd)
  WHERE rank <= {_RRF_CAND}
), uni AS (
  SELECT 'lex' AS src, doc_id, rank FROM lex
  UNION ALL
  SELECT 'vec' AS src, doc_id, rank FROM vrank
), fused AS (
  SELECT doc_id, count(*) AS n_sources,
         round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CAST(1.0 AS DOUBLE) / (60 + rank) ORDER BY src)),
               (a, x) -> a + x), 6) AS rrf_score
  FROM uni GROUP BY doc_id
)
SELECT doc_id, rank, n_sources, rrf_score FROM (
  SELECT doc_id, n_sources, rrf_score,
         row_number() OVER (ORDER BY rrf_score DESC, doc_id) AS rank
  FROM fused)
WHERE rank <= {_BM25_K}
"""


@member_sql(_RRF_SQL)
def hybrid_rrf_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval (operators/retrieval.hybrid_topk): BM25 top-20
    over documents fused with exact-cosine top-20 over embeddings
    (query = vec_id 0's vector, data-derived like every ANN member) by
    reciprocal rank, k_rrf=60. The oracle restates BOTH retrievers end
    to end plus the source-ordered RRF fold."""
    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        hybrid_topk,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load(spark, sf_dir, "embeddings")
    qvec = [float(x) for x in
            emb.filter(F.col("vec_id") == 0).select("embedding").head()[0]]
    return hybrid_topk(docs, emb, list(_BM25_TERMS), qvec, k=_BM25_K,
                       n_candidates=_RRF_CAND, k1=_BM25_K1, b=_BM25_B)


_PHRASE = ("hash", "join")  # ~27 occurrences across ~26 docs per sf


def _phrase_oracle() -> str:
    k1, k1p1, b = _bm25_consts()
    pos = [
        (f"list_transform(list_filter(range(1, len(w) + 1), "
         f"i -> w[i] = '{wd}'), x -> x - {j})" if j else
         f"list_filter(range(1, len(w) + 1), i -> w[i] = '{wd}')")
        for j, wd in enumerate(_PHRASE)]
    inter = pos[0]
    for p in pos[1:]:
        inter = f"list_intersect({inter}, {p})"
    return f"""
WITH dw AS (
  SELECT doc_id, {_WORDS} AS w FROM documents
), st AS (
  SELECT count(*) AS n_docs,
         CAST(sum(len(w)) AS DOUBLE) / count(*) AS avgdl
  FROM dw
), pm AS (
  SELECT doc_id, dl, tf FROM (
    SELECT doc_id, len(w) AS dl, len({inter}) AS tf FROM dw)
  WHERE tf > 0
), dfq AS (
  SELECT count(*) AS dfp FROM pm
), sc AS (
  SELECT doc_id, tf AS phrase_tf,
         round(ln(1.0 + (s.n_docs - d.dfp + 0.5) / (d.dfp + 0.5))
               * (tf * {k1p1})
               / (tf + {k1} * (1.0 - {b} + {b} * dl / s.avgdl)),
               6) AS score
  FROM pm CROSS JOIN st s CROSS JOIN dfq d
)
SELECT doc_id, rank, phrase_tf, score FROM (
  SELECT doc_id, phrase_tf, score,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM sc)
WHERE rank <= {_BM25_K}
"""


@member_sql(_phrase_oracle())
def phrase_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-phrase BM25 top-10 (operators/retrieval.phrase_topk):
    positional postings, word i's offsets shifted by −i and
    intersected (the classic positional-index evaluation — offsets are
    0-based in Spark and 1-based in the oracle, which cancels under
    the relative shifts), the surviving occurrence count scored as one
    BM25 unit with df = documents containing the phrase. The oracle
    re-derives positions, the shifted intersection, phrase df, and the
    score."""
    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        phrase_topk,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return phrase_topk(docs, list(_PHRASE), k=_BM25_K,
                       k1=_BM25_K1, b=_BM25_B)


_BM25F_TERMS = ("src3", "dup", "hash")  # src3 hits ONLY the source field
_BM25F_W_SOURCE = 2.0
_BM25F_W_TEXT = 1.0


def _bm25f_oracle() -> str:
    """Field-weighted BM25 (simple BM25F) restated end to end: weighted
    tf = Σ_f w_f·tf_f and weighted dl = Σ_f w_f·len_f over (source×2,
    text×1), df once per (doc, term) regardless of how many fields
    matched, then the ordinary saturation/fold/rank chain. Weights are
    binary-representable so every double sum is exact in both
    engines."""
    k1, k1p1, b = _bm25_consts()
    ws = _WORDS.replace("lower(text)", "lower(source)")
    wsrc = f"CAST({_BM25F_W_SOURCE!r} AS DOUBLE)"
    wtxt = f"CAST({_BM25F_W_TEXT!r} AS DOUBLE)"
    tlist = ", ".join(f"'{t}'" for t in sorted(_BM25F_TERMS))
    return f"""
WITH dw AS (
  SELECT doc_id, {_WORDS} AS wt, {ws} AS wsf FROM documents
), fl AS (
  SELECT doc_id, {wsrc} * len(wsf) + {wtxt} * len(wt) AS dl, wt, wsf
  FROM dw
), st AS (
  SELECT count(*) AS n_docs, sum(dl) / count(*) AS avgdl FROM fl
), tok AS (
  SELECT doc_id, dl, unnest(wsf) AS term, {wsrc} AS w FROM fl
  UNION ALL
  SELECT doc_id, dl, unnest(wt) AS term, {wtxt} AS w FROM fl
), tf AS (
  SELECT doc_id, term, sum(w) AS tf, min(dl) AS dl FROM tok
  WHERE term IN ({tlist}) GROUP BY doc_id, term
), dfq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY term
), ctr AS (
  SELECT t.doc_id, t.term,
         ln(1.0 + (s.n_docs - d.df + 0.5) / (d.df + 0.5))
           * (t.tf * {k1p1})
           / (t.tf + {k1} * (1.0 - {b} + {b} * t.dl / s.avgdl)) AS c
  FROM tf t JOIN dfq d USING (term) CROSS JOIN st s
), sc AS (
  SELECT doc_id, count(*) AS n_terms_hit, {_FOLD_C} AS score
  FROM ctr GROUP BY doc_id
)
SELECT doc_id, rank, n_terms_hit, score FROM (
  SELECT doc_id, n_terms_hit, score,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM sc)
WHERE rank <= {_BM25_K}
"""


@member_sql(_bm25f_oracle())
def bm25f_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Field-weighted BM25 top-10 (operators/retrieval.bm25f_topk,
    simple BM25F): ``source`` weighted 2×, ``text`` 1× — the query
    mixes a source-only term (src3), the rare text term (dup) and a
    common text term (hash), so field weighting, weighted length
    normalization and cross-field df all shape the ranking. The oracle
    re-derives weighted tf/dl, the once-per-doc df, N/avgdl over
    weighted lengths, and the pinned fold."""
    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        bm25f_topk,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "source",
                                                   "text")
    return bm25f_topk(docs, list(_BM25F_TERMS),
                      {"source": _BM25F_W_SOURCE, "text": _BM25F_W_TEXT},
                      k=_BM25_K, k1=_BM25_K1, b=_BM25_B)


_PROX_TERMS = ("dup", "hash", "scan")  # anchor dup; NEAR/6 the others
_PROX_WINDOW = 6


def _prox_oracle() -> str:
    """NEAR-operator restatement: tf = anchor ('dup') occurrences with
    EVERY other term within ±window token offsets (1-based positions in
    the oracle vs 0-based in Spark — differences cancel under the
    |q−p| distance), df = matching docs, scored as one BM25 unit with
    the same pinned operand order as the phrase member."""
    k1, k1p1, b = _bm25_consts()
    anchor, rest = _PROX_TERMS[0], _PROX_TERMS[1:]

    def positions(t: str) -> str:
        return f"list_filter(range(1, len(w) + 1), i -> w[i] = '{t}')"

    conds = " AND ".join(
        f"len(list_filter({positions(t)}, "
        f"q -> abs(q - p) <= {_PROX_WINDOW})) > 0" for t in rest)
    return f"""
WITH dw AS (
  SELECT doc_id, {_WORDS} AS w FROM documents
), st AS (
  SELECT count(*) AS n_docs,
         CAST(sum(len(w)) AS DOUBLE) / count(*) AS avgdl
  FROM dw
), pm AS (
  SELECT doc_id, dl, tf FROM (
    SELECT doc_id, len(w) AS dl,
           len(list_filter({positions(anchor)}, p -> {conds})) AS tf
    FROM dw)
  WHERE tf > 0
), dfq AS (
  SELECT count(*) AS dfp FROM pm
), sc AS (
  SELECT doc_id, tf AS prox_tf,
         round(ln(1.0 + (s.n_docs - d.dfp + 0.5) / (d.dfp + 0.5))
               * (tf * {k1p1})
               / (tf + {k1} * (1.0 - {b} + {b} * dl / s.avgdl)),
               6) AS score
  FROM pm CROSS JOIN st s CROSS JOIN dfq d
)
SELECT doc_id, rank, prox_tf, score FROM (
  SELECT doc_id, prox_tf, score,
         row_number() OVER (ORDER BY score DESC, doc_id) AS rank
  FROM sc)
WHERE rank <= {_BM25_K}
"""


@member_sql(_prox_oracle())
def proximity_topk_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAR-operator BM25 top-10 (operators/retrieval.proximity_topk):
    anchor 'dup' with 'hash' AND 'scan' within ±6 token offsets —
    positional postings, the anchor-window conjunction (other terms
    rarest-first), qualifying anchor occurrences scored as one BM25
    unit. The oracle re-derives positions, both window conditions,
    the group df, and the score."""
    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        proximity_topk,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    return proximity_topk(docs, list(_PROX_TERMS), _PROX_WINDOW,
                          k=_BM25_K, k1=_BM25_K1, b=_BM25_B)


_ANN_MEMBERS = [
    ("temb", hashed_text_embedding_q, ["doc_id", "n_tokens"],
     ["e0", "e1", "e2"]),
    ("memb", doc_embedding_q, ["doc_id", "n_tokens", "n_model_tokens"],
     ["e0", "e1", "e2"]),
    ("membsw", doc_embedding_subword_q,
     ["doc_id", "n_tokens", "n_model_tokens", "n_subword_tokens"],
     ["e0", "e1", "e2"]),
    ("lsh_topk", lsh_ann_topk_q, ["vec_id"], ["cos_sim"]),
    ("lsh_multiprobe", lsh_ann_multiprobe_q, ["vec_id"], ["cos_sim"]),
    ("blocked_mp", lsh_blocked_pairs_mp_q, ["id_a", "id_b"], ["cos_sim"]),
    ("ivf_assign", ivf_cell_assignment, ["vec_id", "ivf_cell"], []),
    ("ivf_topk", ivf_topk_search, ["vec_id"], ["cos_sim"]),
    ("knn_join", ivf_knn_join_q, ["query_id", "vec_id", "rank"],
     ["cos_sim"]),
    ("sem_dedup", semantic_cluster_dedup_q, ["id_a", "id_b"], ["cos_sim"]),
    ("self_topk", cosine_self_topk_q, ["id_a", "id_b"], ["cos_sim"]),
    ("quant", quantized_topk_q, ["vec_id"], ["cos_sim"]),
    ("pq", pq_adc_topk_q, ["vec_id"], ["cos_sim"]),
    ("pqres", pq_residual_adc_topk_q, ["vec_id"], ["cos_sim"]),
    ("decon_sem", decontam_semantic_q, ["doc_id", "bench_id"],
     ["cos_sim"]),
    ("bm25", bm25_topk_q, ["doc_id", "rank", "n_terms_hit"], ["score"]),
    ("bm25f", bm25f_topk_q, ["doc_id", "rank", "n_terms_hit"],
     ["score"]),
    ("bm25j", bm25_join_q,
     ["query_id", "doc_id", "rank", "n_terms_hit"], ["score"]),
    ("rrf", hybrid_rrf_q, ["doc_id", "rank", "n_sources"],
     ["rrf_score"]),
    ("phrase", phrase_topk_q, ["doc_id", "rank", "phrase_tf"],
     ["score"]),
    ("prox", proximity_topk_q, ["doc_id", "rank", "prox_tf"],
     ["score"]),
]


@q("ann_suite", suite_sql(_ANN_MEMBERS))
def ann_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANN scale-path suite (tagged union, keeps the driver's 50-entry
    verification window): sign-LSH single- and multi-probe top-k, IVF
    cell assignment, IVF probe search, the batched kNN join, SemDeDup
    cluster-blocked near-dup pairs, and the exact all-pairs small-n
    baseline (self_topk) — each member keeps its own plan and full oracle
    restatement (bucket functions, Hamming-ball probe, centroid ranking,
    window-ranked exact pairs, final scores). Round 12 adds the lexical
    retrieval members: bm25 (single-query top-k), bm25j (batched join
    with max_df skew pruning), rrf (BM25 ⊕ cosine reciprocal-rank
    fusion — the hybrid retriever). Round 13 adds bm25f (field-weighted
    BM25F over source×2 + text×1) and prox (the NEAR operator: anchor
    occurrences with every other term within a token window)."""
    return suite_df(spark, sf_dir, _ANN_MEMBERS)


@member_sql("""
WITH g AS (
  SELECT doc_id, text,
         unnest(generate_series(
             0, greatest(octet_length(encode(text)) // 100, 1) - 1, 10)) AS fi
  FROM documents WHERE doc_id < 200
)
SELECT doc_id AS media_id, fi AS frame_index,
       substr(md5(text || CAST(fi AS VARCHAR)), 1, 8) AS frame_checksum
FROM g
""")
def multimodal_video_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame-sampling plumbing: every-10th stub frame per payload
    (frames fan out rows through the Arrow kernel); the oracle regenerates
    the frame grid with generate_series and the checksum from the same
    text bytes + decimal frame index."""
    from harvesting_extract_to_ttl_service_spark.operators.multimodal import (
        sample_video_frames,
    )

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200)
    return sample_video_frames(documents_as_media(docs), every_nth=10)


@member_sql("""
WITH m AS (
  SELECT doc_id AS media_id, text,
         64 + octet_length(encode(text)) % 512        AS sw,
         64 + (octet_length(encode(text)) // 7) % 512 AS sh
  FROM documents
), r AS (
  SELECT media_id, text, sw, sh,
         CASE WHEN greatest(sw, sh) <= 256 THEN sw
              ELSE greatest(1, sw * 256 // greatest(sw, sh)) END AS w,
         CASE WHEN greatest(sw, sh) <= 256 THEN sh
              ELSE greatest(1, sh * 256 // greatest(sw, sh)) END AS h
  FROM m
)
SELECT media_id, sw AS src_width, sh AS src_height, w AS width, h AS height,
       substr(md5(md5(text || '@' || w || 'x' || h)), 1, 8) AS checksum
FROM r
""")
def multimodal_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aspect-preserving resize plumbing: fake-decoded source dims →
    integer-math resize_target fit in a 256-box → deterministic fake
    resize kernel, all inside one Arrow mapInPandas stage. The oracle
    restates the dimension math (floor division) and the checksum of the
    emitted payload (the fake kernel emits an ASCII hexdigest precisely so
    md5-of-output stays SQL-restatable as a double md5)."""
    media = documents_as_media(load(spark, sf_dir, "documents"))
    out = resize_images(media, max_side=256, decoder="fake", kernel="fake")
    return out.select("media_id", "src_width", "src_height",
                      "width", "height", "checksum")


@member_sql("""
WITH px AS (
  SELECT doc_id AS media_id, unnest(range(0, 60)) AS i, md5(text) AS ph
  FROM documents WHERE doc_id < 200
), pv AS (
  SELECT media_id, i,
         CAST(concat('0x', substr(md5(ph || ':' || i), 1, 2)) AS INT) AS p
  FROM px
), m AS (
  SELECT media_id, avg(p) AS mean FROM pv GROUP BY 1
)
SELECT media_id,
       CAST(sum(CASE WHEN p > mean THEN (CAST(1 AS BIGINT) << i)
                ELSE CAST(0 AS BIGINT) END) AS BIGINT) AS ahash
FROM pv JOIN m USING (media_id)
GROUP BY 1
""")
def multimodal_image_phash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perceptual image hashing plumbing (operators/multimodal.
    image_ahash): 60-bit average hash over the deterministic fake pixel
    grid (md5 chain), computed in the Arrow mapInPandas kernel — the
    fingerprint feeding image near-dup (image_neardup_pairs reuses the
    SimHash pigeonhole join). The oracle re-derives every pixel, the
    mean threshold, and the bit packing from the payload text."""
    from harvesting_extract_to_ttl_service_spark.operators.multimodal import (
        image_ahash,
    )

    media = documents_as_media(
        load(spark, sf_dir, "documents").filter(F.col("doc_id") < 200))
    return image_ahash(media, kernel="fake")


_MULTIMODAL_MEMBERS = [
    ("image", multimodal_image_meta,
     ["media_id", "width", "height", "n_bytes", "checksum"], []),
    ("phash", multimodal_image_phash, ["media_id", "ahash"], []),
    ("resize", multimodal_image_resize,
     ["media_id", "src_width", "src_height", "width", "height", "checksum"],
     []),
    ("audio", multimodal_audio_meta,
     ["media_id", "sample_rate", "n_bytes"], ["duration_s"]),
    ("video", multimodal_video_frames,
     ["media_id", "frame_index", "frame_checksum"], []),
]


@q("multimodal_media_meta", suite_sql(_MULTIMODAL_MEMBERS))
def multimodal_media_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal decode plumbing (image + audio meta, video frame
    sampling): opaque binary payloads probed by the Arrow ``mapInPandas``
    kernels (operators/multimodal.py); the oracle restates each feature
    from the payload byte length."""
    return suite_df(spark, sf_dir, _MULTIMODAL_MEMBERS)
