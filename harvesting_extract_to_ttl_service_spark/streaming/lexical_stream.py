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
    clean_phrase,
    clean_query_terms,
    corpus_stats,
    phrase_intersect,
    positional_postings,
    postings,
    score_phrase_counts,
    score_postings,
    top_ranked,
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
    and flat batches can never mix in one index).

    Replay contract: a batch id at or below the last compaction's
    ``max_folded_batch`` (``_bm25_compaction.json``) REFUSES — its
    rows already live in ``batch=-1``, so rewriting ``batch=<id>``
    would double every tf and df the batch contributed. Replay
    idempotence holds for batches not yet folded; compact at quiesced
    moments (stream stopped, checkpoint committed)."""
    spark = docs.sparkSession
    _check_bm25_sidecar(spark, index_dir, n_buckets,
                        positional=positional)
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _read_json_sidecar,
    )

    comp = _read_json_sidecar(spark, f"{index_dir}/_bm25_compaction.json")
    if comp is not None and batch_id <= comp.get("max_folded_batch", -1):
        raise ValueError(
            f"bm25_index_batch: batch {batch_id} was already folded "
            f"into batch=-1 by a compaction (max_folded_batch="
            f"{comp['max_folded_batch']}) — replaying it would double "
            f"its postings' tf/df; re-ingest under a fresh batch id "
            f"only if the documents are genuinely new")
    base = (positional_postings(docs, text_col, id_col) if positional
            else postings(docs, text_col, id_col))
    ps = base.withColumn("bucket", term_bucket(F.col("term"), n_buckets))
    (ps.write.mode("overwrite").partitionBy("bucket")
     .parquet(f"{index_dir}/postings/batch={batch_id}"))
    (corpus_stats(docs, text_col).select("n_docs", "sum_dl")
     .coalesce(1).write.mode("overwrite")
     .parquet(f"{index_dir}/stats/batch={batch_id}"))


def _read_pruned_postings(spark: SparkSession, index_dir: str,
                          terms_: list[str], n_buckets: int) -> DataFrame:
    """The index read both search paths share: bucket IN-list from the
    driver-side term hashes (directory pruning), then the term IN-list
    (parquet pushed filter)."""
    buckets = sorted({term_bucket_py(t, n_buckets) for t in terms_})
    return (spark.read.option("basePath", f"{index_dir}/postings")
            .parquet(f"{index_dir}/postings")
            .filter(F.col("bucket").isin(buckets))
            .filter(F.col("term").isin(terms_)))


def _read_index_stats(spark: SparkSession, index_dir: str) -> DataFrame:
    """One-row N/avgdl from the exact integer sums of the per-batch
    stats rows — shared by both search paths."""
    return (spark.read.parquet(f"{index_dir}/stats")
            .agg(F.sum("n_docs").alias("n_docs"),
                 F.sum("sum_dl").alias("sum_dl"))
            .withColumn("avgdl", F.col("sum_dl").cast("double")
                        / F.col("n_docs")))


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
    ps = _read_pruned_postings(spark, index_dir, qt, n_buckets)
    agg = score_postings(ps, _read_index_stats(spark, index_dir), k1, b)
    return top_ranked(agg, k, id_col)


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
    ordering is not enough. This job therefore (1) flips the
    ``_bm25_params.json`` sidecar to an in-progress marker
    (``compacting: true``) BEFORE anything else, so every search AND
    every ingest refuses LOUDLY for the whole job (retrain_ivf_index's
    discipline — and critically, a batch that arrives while the
    consolidated trees are being written can neither be silently
    dropped by the fold nor silently missed by it); (2) writes both
    consolidated trees to underscore-hidden ``_compact_tmp_*``
    directories — hidden from every reader, completeness marked by
    Spark's own ``_SUCCESS`` file; (3) records the highest folded
    batch id in ``_bm25_compaction.json``; (4) per side, deletes the
    folded batch dirs and renames the tmp to ``batch=-1`` (a rename
    the Hadoop FS rejects raises WITH the marker still set — never a
    silently empty index); (5) clears the marker. At no point does a
    reader see postings twice or a half-fold. Recovery from any crash
    is re-running this job: incomplete tmps (no ``_SUCCESS``) mean no
    delete has happened yet, so it restarts the fold from the intact
    batch dirs; complete tmps are promoted as-is, never recomputed
    from possibly-half-deleted batches.

    The recorded ``max_folded_batch`` is the replay fence:
    :func:`bm25_index_batch` refuses any ``batch_id`` at or below it,
    because a source batch replayed AFTER its rows were folded into
    ``batch=-1`` would write them a second time — the per-batch
    replay-idempotence contract holds only for batches not yet
    folded. Compact at a quiesced moment (stream stopped, checkpoint
    committed); a post-compaction replay then fails loudly instead of
    doubling df."""
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
    comp_scar = f"{index_dir}/_bm25_compaction.json"

    def _batch_dirs(side: str) -> list:
        root = jpath(f"{index_dir}/{side}")
        if not fs.exists(root):
            return []
        return [st.getPath() for st in fs.listStatus(root)
                if st.getPath().getName().startswith("batch=")]

    def _tmp_complete(side: str) -> bool:
        return fs.exists(jpath(f"{side_tmp[side]}/_SUCCESS"))

    def _promote(side: str) -> None:
        tmp = jpath(side_tmp[side])
        if not fs.exists(tmp):
            return  # this side already promoted (resume after crash)
        for bdir in _batch_dirs(side):
            fs.delete(bdir, True)
        if not fs.rename(tmp, jpath(side_final[side])):
            # Hadoop rename reports failure by RETURN VALUE; swallowing
            # it here would clear the marker over an empty tree and
            # every search would silently return nothing
            raise IOError(
                f"compact_bm25_index: rename {side_tmp[side]} → "
                f"{side_final[side]} failed; compacting marker left "
                f"set — re-run to resume")

    def _write_and_promote(params: dict, folded_ids: list[int]) -> None:
        prev = _read_json_sidecar(spark, comp_scar) or {}
        _write_json_sidecar(
            spark, comp_scar,
            {"max_folded_batch": max([*folded_ids,
                                      prev.get("max_folded_batch", -1)])})
        _promote("postings")
        _promote("stats")
        clean = {k: v for k, v in params.items() if k != "compacting"}
        _write_json_sidecar(spark, scar, clean)

    def _fold(params: dict, folded: list) -> int:
        folded_ids = [int(p.getName().split("=", 1)[1]) for p in folded]
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
        _write_and_promote(params, folded_ids)
        return len(folded)

    params = _read_json_sidecar(spark, scar)
    if params is None:
        raise ValueError(f"compact_bm25_index: no index at {index_dir}")
    if params.get("compacting"):
        # resume — decide from what survives, destructive steps only
        # ever ran against COMPLETE tmps (the _SUCCESS gate):
        if _tmp_complete("postings") and _tmp_complete("stats"):
            # crash after the fold, before/midway through promotion
            folded_ids = [
                int(p.getName().split("=", 1)[1])
                for p in _batch_dirs("postings")
                if p.getName() != "batch=-1"]
            _write_and_promote(params, folded_ids)
            return 0
        if (not fs.exists(jpath(side_tmp["postings"]))
                and fs.exists(jpath(side_final["postings"]))):
            # postings promoted; finish stats if pending, then clear
            if fs.exists(jpath(side_tmp["stats"])):
                if not _tmp_complete("stats"):
                    raise ValueError(
                        f"compact_bm25_index: {index_dir} has promoted "
                        f"postings but an incomplete stats tmp — "
                        f"inspect manually")
                _promote("stats")
            _write_json_sidecar(
                spark, scar,
                {k: v for k, v in params.items() if k != "compacting"})
            return 0
        folded = [p for p in _batch_dirs("postings")
                  if p.getName() != "batch=-1"]
        if folded:
            # crash during the tmp writes: nothing was deleted (deletes
            # are gated on complete tmps) — drop the partial tmps and
            # restart the fold from the intact batch dirs
            for s in side_tmp.values():
                fs.delete(jpath(s), True)
            return _fold(params, folded)
        raise ValueError(
            f"compact_bm25_index: {index_dir} is marked compacting "
            f"but has neither tmp nor consolidated data — restore "
            f"from the source stream")
    _check_bm25_sidecar(spark, index_dir, n_buckets,
                        positional=bool(params.get("positional", False)))

    folded = [p for p in _batch_dirs("postings")
              if p.getName() != "batch=-1"]
    if not folded:
        return 0
    # marker FIRST: from here until the final sidecar write, every
    # ingest and search refuses — a batch landing mid-fold can neither
    # be missed by the consolidated tree nor deleted unfolded
    _write_json_sidecar(spark, scar, {**params, "compacting": True})
    return _fold(params, folded)


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
    pp = _read_pruned_postings(spark, index_dir, sorted(set(words)),
                               n_buckets)
    pc = phrase_intersect(pp, words)
    return score_phrase_counts(pc, _read_index_stats(spark, index_dir),
                               k, k1, b, id_col)
