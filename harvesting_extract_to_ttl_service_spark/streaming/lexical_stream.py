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
    clean_phrase,
    clean_query_terms,
    corpus_stats,
    phrase_intersect,
    positional_postings,
    postings,
    score_phrase_counts,
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
                        n_buckets: int,
                        positional: bool = False) -> None:
    """Bucket count and tokenizer are the index's identity: postings
    bucketed mod a different n_buckets would silently miss every pruned
    term, and a different tokenizer changes tf/dl everywhere — both
    refuse up front, like the IVF sidecar. ``positional`` is identity
    too (mixed batches would leave phrase queries silently blind to the
    non-positional ones); backfilled False for pre-upgrade indexes."""
    _check_sidecar_params(
        spark, index_dir,
        {"n_buckets": n_buckets, "tokenizer": _TOKENIZER, "version": 1,
         "positional": bool(positional)},
        filename="_bm25_params.json",
        defaults={"positional": False})


def _sidecar_positional(spark: SparkSession, index_dir: str) -> bool:
    """Read the index's positional flag (False for pre-upgrade
    sidecars) so read paths adapt instead of making callers restate
    it."""
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _read_json_sidecar,
    )

    params = _read_json_sidecar(spark, f"{index_dir}/_bm25_params.json")
    return bool(params.get("positional", False)) if params else False


def bm25_index_batch(docs: DataFrame, batch_id: int, index_dir: str,
                     n_buckets: int = 64, text_col: str = "text",
                     id_col: str = "doc_id",
                     positional: bool = False) -> None:
    """Append one micro-batch of documents to the index: the posting
    table of THIS batch (explode + map-side-combinable groupBy — the
    only shuffle), partitioned by term bucket under ``batch=<id>``, plus
    the batch's one-row additive stats. Overwrite semantics per batch
    directory = replay idempotence. ``positional=True`` stores each
    term's token offsets too (operators/retrieval.positional_postings —
    the price of stored phrase queries; sidecar-pinned, so positional
    and flat batches can never mix in one index)."""
    spark = docs.sparkSession
    _check_bm25_sidecar(spark, index_dir, n_buckets,
                        positional=positional)
    base = (positional_postings(docs, text_col, id_col) if positional
            else postings(docs, text_col, id_col))
    ps = base.withColumn("bucket", term_bucket(F.col("term"), n_buckets))
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
    score_postings — identical to the ad-hoc path by construction.
    Works on flat AND positional indexes (the positions column just
    rides along unused)."""
    _check_bm25_sidecar(spark, index_dir, n_buckets,
                        positional=_sidecar_positional(spark, index_dir))
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
                          id_col: str = "doc_id",
                          positional: bool = False):
    """Structured-Streaming ingest loop: every micro-batch lands as one
    replay-idempotent ``batch=<id>`` posting + stats pair. Exactly the
    ann_stream.run_ivf_index_stream shape — foreachBatch keyed on the
    engine's batch id, so a restarted query rewrites its in-flight batch
    byte-identically instead of duplicating it."""
    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        bm25_index_batch(batch_df, batch_id, index_dir,
                         n_buckets=n_buckets, text_col=text_col,
                         id_col=id_col, positional=positional)

    return (docs_stream.writeStream.foreachBatch(_ingest)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


def compact_bm25_index(spark: SparkSession, index_dir: str,
                       n_buckets: int = 64,
                       target_partitions: int | None = None) -> int:
    """Fold the per-batch posting/stats directories into one
    ``batch=-1`` each, PRESERVING the bucket partitioning (dropping it
    would turn every search back into a full scan) — the small-files
    maintenance job a long-running ingest stream needs, exactly like
    ann_stream.compact_ivf_index. Returns the number of posting batch
    partitions folded (0 = nothing to do).

    Crash safety is STRICTER than the IVF fold: a duplicated posting
    row would DOUBLE a term's tf and df (scores are sums, where the
    IVF top-k is per-id idempotent), so the write-new-then-delete-old
    ordering is not enough. This job therefore (1) writes both
    consolidated trees to underscore-hidden ``_compact_tmp_*``
    directories first — hidden from every reader; (2) flips the
    ``_bm25_params.json`` sidecar to an in-progress marker
    (``compacting: true``) so every search/ingest refuses LOUDLY
    (retrain_ivf_index's discipline — the extra key can never match a
    caller's expected params); (3) per side, deletes the folded batch
    dirs and renames the hidden tmp to ``batch=-1``; (4) clears the
    marker. At no point does a reader see postings twice. Recovery
    from any crash is re-running this job: with the marker set it
    NEVER recomputes from the (possibly partially deleted) batch dirs
    — it only promotes the surviving complete tmps, side by side, then
    clears the marker."""
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _read_json_sidecar,
        _write_json_sidecar,
    )
    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )

    fs, _ = _hadoop_fs(spark, index_dir)
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    side_final = {s: f"{index_dir}/{s}/batch=-1"
                  for s in ("postings", "stats")}
    side_tmp = {s: f"{index_dir}/_compact_tmp_{s}"
                for s in ("postings", "stats")}
    scar = f"{index_dir}/_bm25_params.json"

    def _batch_dirs(side: str) -> list:
        root = jpath(f"{index_dir}/{side}")
        if not fs.exists(root):
            return []
        return [st.getPath() for st in fs.listStatus(root)
                if st.getPath().getName().startswith("batch=")]

    def _promote(side: str) -> None:
        tmp = jpath(side_tmp[side])
        if not fs.exists(tmp):
            return  # this side already promoted (resume after crash)
        for b in _batch_dirs(side):
            fs.delete(b, True)
        fs.rename(tmp, jpath(side_final[side]))

    params = _read_json_sidecar(spark, scar)
    if params is None:
        raise ValueError(f"compact_bm25_index: no index at {index_dir}")
    if params.get("compacting"):
        # resume: promote whatever complete tmps survive, never rebuild
        if not any(fs.exists(jpath(side_tmp[s])) for s in side_tmp) \
                and not fs.exists(jpath(side_final["postings"])):
            raise ValueError(
                f"compact_bm25_index: {index_dir} is marked compacting "
                f"but has neither tmp nor consolidated data — restore "
                f"from the source stream")
        _promote("postings")
        _promote("stats")
        del params["compacting"]
        _write_json_sidecar(spark, scar, params)
        return 0
    _check_bm25_sidecar(spark, index_dir, n_buckets,
                        positional=bool(params.get("positional", False)))

    folded = [p for p in _batch_dirs("postings")
              if p.getName() != "batch=-1"]
    if not folded:
        return 0
    ps = (spark.read.option("basePath", f"{index_dir}/postings")
          .parquet(f"{index_dir}/postings").drop("batch"))
    if target_partitions is not None:
        ps = ps.repartition(target_partitions, F.col("bucket"))
    (ps.write.mode("overwrite").partitionBy("bucket")
     .parquet(side_tmp["postings"]))
    (spark.read.parquet(f"{index_dir}/stats")
     .agg(F.sum("n_docs").alias("n_docs"),
          F.sum("sum_dl").alias("sum_dl"))
     .coalesce(1).write.mode("overwrite")
     .parquet(side_tmp["stats"]))

    _write_json_sidecar(spark, scar, {**params, "compacting": True})
    _promote("postings")
    _promote("stats")
    _write_json_sidecar(spark, scar, params)
    return len(folded)


def phrase_search(spark: SparkSession, index_dir: str,
                  phrase: list[str], k: int = 10,
                  k1: float = DEFAULT_K1, b: float = DEFAULT_B,
                  n_buckets: int = 64,
                  id_col: str = "doc_id") -> DataFrame:
    """Exact-phrase BM25 top-k over a POSITIONAL index (built with
    ``bm25_index_batch(positional=True)``): bucket-pruned scan of the
    phrase words' posting lists, the shared shifted-offset intersection
    (operators/retrieval.phrase_intersect), the shared one-unit scoring
    tail (score_phrase_counts) — so stored results equal phrase_topk
    over the ingested documents row for row. A flat index refuses up
    front: without positions a phrase query would silently degrade to
    an AND query."""
    if not _sidecar_positional(spark, index_dir):
        raise ValueError(
            f"phrase_search: index at {index_dir} is not positional — "
            f"rebuild it with bm25_index_batch(positional=True); a "
            f"flat index cannot answer phrase queries")
    _check_bm25_sidecar(spark, index_dir, n_buckets, positional=True)
    words = clean_phrase(phrase)
    buckets = sorted({term_bucket_py(t, n_buckets) for t in set(words)})
    pp = (spark.read.option("basePath", f"{index_dir}/postings")
          .parquet(f"{index_dir}/postings")
          .filter(F.col("bucket").isin(buckets))
          .filter(F.col("term").isin(sorted(set(words)))))
    stats = (spark.read.parquet(f"{index_dir}/stats")
             .agg(F.sum("n_docs").alias("n_docs"),
                  F.sum("sum_dl").alias("sum_dl"))
             .withColumn("avgdl", F.col("sum_dl").cast("double")
                         / F.col("n_docs")))
    pc = phrase_intersect(pp, words)
    return score_phrase_counts(pc, stats, k, k1, b, id_col)
