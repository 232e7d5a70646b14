"""Persistent incremental BM25 index: micro-batch posting ingest +
stored-index search.

The ad-hoc path (operators/retrieval.bm25_topk) re-derives postings per
query; at corpus scale the postings are the thing you persist. This module
mirrors the ann_stream.py index discipline — per-batch overwrite
directories (replay-idempotent, no transactional store needed), a JSON
parameter sidecar that refuses mismatched readers up front, and a disk
layout whose partition columns make the search's pruning predicates
directory-level:

    <index_dir>/postings/batch=<id>/bucket=<hash(term) % n_buckets>/…
    <index_dir>/stats/batch=<id>/…          (one row: n_docs, sum_dl)
    <index_dir>/_bm25_params.json           (n_buckets, tokenizer, version)

* ``bucket`` is the md5-derived portable term hash mod ``n_buckets`` —
  search computes the query terms' buckets driver-side and the bucket
  IN-list prunes whole directories before the term IN-list is even
  evaluated (which itself reaches the parquet scan as a pushed filter).
* Corpus statistics are ADDITIVE integers per batch (doc count, token
  sum), so N and avgdl over any set of batches are exact sums — no
  rescan of the postings. Document ids must be unique across batches
  (the corpus_stream remap discipline); re-ingesting a doc would double
  its df.
* A replayed batch overwrites its own ``batch=<id>`` directory with
  byte-identical content (tokenization is deterministic), so crash/retry
  of the writing job needs no coordination.

Search calls operators/retrieval.score_postings — the SAME scoring code
the ad-hoc path uses — so stored-index results equal bm25_topk over the
union of the ingested batches row for row (tests/test_retrieval.py pins
this)."""

from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.column import Column

from harvesting_extract_to_ttl_service_spark.operators.dedup import (
    _portable_hash32,
)
from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
    DEFAULT_B,
    DEFAULT_K1,
    _ranked,
    clean_query_terms,
    corpus_stats,
    postings,
    score_postings,
)
from harvesting_extract_to_ttl_service_spark.streaming.dedup_stream import (
    _check_sidecar_params,
)

_TOKENIZER = "lower_ws"  # lowercased whitespace tokens (retrieval.terms)


def term_bucket(term: Column, n_buckets: int) -> Column:
    """Partition bucket of a term: md5-derived portable 32-bit hash mod
    ``n_buckets`` (the dedup.py hash discipline — engine-portable, never
    JVM-seed-dependent)."""
    return (_portable_hash32(term) % F.lit(n_buckets)).cast("int")


def term_bucket_py(term: str, n_buckets: int) -> int:
    """Driver-side twin of :func:`term_bucket` (same md5 prefix math) —
    used to turn query terms into the bucket IN-list before any I/O."""
    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:8], 16) \
        % n_buckets


def _check_bm25_sidecar(spark: SparkSession, index_dir: str,
                        n_buckets: int) -> None:
    """Bucket count and tokenizer are the index's identity: postings
    bucketed mod a different n_buckets would silently miss every pruned
    term, and a different tokenizer changes tf/dl everywhere — both
    refuse up front, like the IVF sidecar."""
    _check_sidecar_params(
        spark, index_dir,
        {"n_buckets": n_buckets, "tokenizer": _TOKENIZER, "version": 1},
        filename="_bm25_params.json")


def bm25_index_batch(docs: DataFrame, batch_id: int, index_dir: str,
                     n_buckets: int = 64, text_col: str = "text",
                     id_col: str = "doc_id") -> None:
    """Append one micro-batch of documents to the index: the posting
    table of THIS batch (explode + map-side-combinable groupBy — the
    only shuffle), partitioned by term bucket under ``batch=<id>``, plus
    the batch's one-row additive stats. Overwrite semantics per batch
    directory = replay idempotence."""
    spark = docs.sparkSession
    _check_bm25_sidecar(spark, index_dir, n_buckets)
    ps = (postings(docs, text_col, id_col)
          .withColumn("bucket", term_bucket(F.col("term"), n_buckets)))
    (ps.write.mode("overwrite").partitionBy("bucket")
     .parquet(f"{index_dir}/postings/batch={batch_id}"))
    (corpus_stats(docs, text_col).select("n_docs", "sum_dl")
     .coalesce(1).write.mode("overwrite")
     .parquet(f"{index_dir}/stats/batch={batch_id}"))


def bm25_search(spark: SparkSession, index_dir: str,
                query_terms: list[str], k: int = 10,
                k1: float = DEFAULT_K1, b: float = DEFAULT_B,
                n_buckets: int = 64,
                id_col: str = "doc_id") -> DataFrame:
    """Top-k BM25 over the accumulated index. The query terms' buckets
    are computed driver-side; the bucket IN-list prunes partition
    directories and the term IN-list reaches the parquet scan as a
    pushed filter (tests pin both in the plan), so per-query I/O is the
    probed posting lists, not the index. N/avgdl are the exact integer
    sums of the per-batch stats rows; document frequency comes from the
    probed postings themselves. Scoring is operators/retrieval.
    score_postings — identical to the ad-hoc path by construction."""
    _check_bm25_sidecar(spark, index_dir, n_buckets)
    qt = clean_query_terms(query_terms)
    buckets = sorted({term_bucket_py(t, n_buckets) for t in qt})
    ps = (spark.read.option("basePath", f"{index_dir}/postings")
          .parquet(f"{index_dir}/postings")
          .filter(F.col("bucket").isin(buckets))
          .filter(F.col("term").isin(qt)))
    stats = (spark.read.parquet(f"{index_dir}/stats")
             .agg(F.sum("n_docs").alias("n_docs"),
                  F.sum("sum_dl").alias("sum_dl"))
             .withColumn("avgdl", F.col("sum_dl").cast("double")
                         / F.col("n_docs")))
    agg = score_postings(ps, stats, k1, b)
    top = agg.orderBy(F.col("score").desc(), F.col("id")).limit(k)
    return (_ranked(top, k, [F.col("score").desc(), F.col("id")])
            .select(F.col("id").alias(id_col), "rank", "n_terms_hit",
                    "score"))


def run_bm25_index_stream(docs_stream: DataFrame, index_dir: str,
                          checkpoint_dir: str, n_buckets: int = 64,
                          text_col: str = "text",
                          id_col: str = "doc_id"):
    """Structured-Streaming ingest loop: every micro-batch lands as one
    replay-idempotent ``batch=<id>`` posting + stats pair. Exactly the
    ann_stream.run_ivf_index_stream shape — foreachBatch keyed on the
    engine's batch id, so a restarted query rewrites its in-flight batch
    byte-identically instead of duplicating it."""
    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        bm25_index_batch(batch_df, batch_id, index_dir,
                         n_buckets=n_buckets, text_col=text_col,
                         id_col=id_col)

    return (docs_stream.writeStream.foreachBatch(_ingest)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())
