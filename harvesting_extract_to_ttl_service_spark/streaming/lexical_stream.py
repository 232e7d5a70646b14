"""Persistent incremental BM25 index: micro-batch posting ingest +
stored-index search + read-transparent generational compaction.

The ad-hoc path (operators/retrieval.bm25_topk) re-derives postings per
query; at corpus scale the postings are the thing you persist. This module
mirrors the ann_stream.py index discipline — per-batch overwrite
directories (replay-idempotent, no transactional store needed), a JSON
parameter sidecar that refuses mismatched readers up front, and a disk
layout whose partition columns make the search's pruning predicates
directory-level:

    <index_dir>/postings/batch=<id>/bucket=<hash(term) % n_buckets>/…
    <index_dir>/stats/batch=<id>/…          (one row: n_docs, sum_dl)
    <index_dir>/doclens/batch=<id>/…        ((id, dl) doc-keyed sidecar —
                                             deletes harvest doomed
                                             docs' lengths here instead
                                             of scanning every term
                                             bucket; folds write the
                                             twin gen=<g>/doclens/seg=<s>)
    <index_dir>/gen=<g>/postings/seg=<s>/bucket=…   (generation g's
                                             consolidated SEGMENTS —
                                             a minor fold adds one,
                                             a major fold merges all)
    <index_dir>/gen=<g>/stats/seg=<s>/…     (one stats row per segment)
    <index_dir>/gen=<g>/_manifest_seg=<s>.json  (written LAST = that
                                             fold complete; records the
                                             full post-flip pointer)
    <index_dir>/tombstones/del=<d>/…        ((id, dl) of deleted docs —
                                             anti-joined at read,
                                             physically applied by a
                                             major fold)
    <index_dir>/_bm25_params.json           (n_buckets, tokenizer, …)
    <index_dir>/_bm25_generation.json       ({generation, segments,
                                             max_folded_batch,
                                             applied_dels} — THE atomic
                                             read pointer)
    <index_dir>/_bm25_compacting.json       (lease marker: owner token +
                                             expiring deadline + the
                                             fold's folding_through
                                             replay fence; fresh ingest
                                             and search are unaffected)

* ``bucket`` is the md5-derived portable term hash mod ``n_buckets`` —
  search computes the query terms' buckets driver-side and the bucket
  IN-list prunes whole directories before the term IN-list is even
  evaluated (which itself reaches the parquet scan as a pushed filter).
* Corpus statistics are ADDITIVE per batch (doc count, token sum), so N
  and avgdl over any set of batches are exact sums — no rescan of the
  postings. Document ids must be unique across batches (the
  corpus_stream remap discipline); re-ingesting a doc would double its
  df.
* **Batch visibility is atomic**: ingest writes the posting tree FIRST
  and the batch's stats row SECOND, and every reader derives the
  visible batch set from the stats directories that carry a
  ``_SUCCESS`` marker — so a crash (or a concurrent search) between
  the two writes sees NEITHER the postings nor the stats of the
  half-committed batch, never postings whose docs are missing from
  N/avgdl. A replayed batch overwrites both directories byte-identically
  (tokenization is deterministic), so crash/retry of the writing job
  needs no coordination.
* **Compaction is read-transparent AND never O(index) unless asked**
  (size-tiered generation scheme): a minor fold writes the unfolded
  batch dirs into one NEW segment of the current generation while
  searches keep reading exactly the segment/batch trees the pointer
  names — none of which the fold touches — then flips the one-file
  ``_bm25_generation.json`` pointer and only afterwards deletes the
  superseded trees; past the segment-count threshold the fold turns
  TIERED (the smallest half of the segments merge with the batches,
  the large half untouched); only ``full=True`` merges everything
  into ``gen=<g+1>/seg=0`` and physically applies the tombstones. A
  search resolves the pointer once and reads a consistent snapshot
  throughout; one compactor at a time is enforced by an expiring
  lease (streaming/generations.py), and every fold's bulk output is
  written to an owner-unique staging dir promoted only after a fresh
  ownership check.
* **Deletion is logical-then-physical** (:func:`bm25_delete_docs`):
  committed tombstone batches anti-join out of every probed posting
  set (tf and df drop immediately) and subtract a signed one-row
  correction from N/avgdl, so search-after-delete equals an index
  rebuilt without the docs; a major fold applies them physically.

Search calls operators/retrieval.score_query_join — the SAME scoring
core the ad-hoc batched path uses — so stored-index results equal
bm25_topk / bm25_topk_join over the union of the ingested batches row
for row (tests/test_retrieval.py pins this)."""

from __future__ import annotations

import hashlib
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.column import Column

from harvesting_extract_to_ttl_service_spark.operators.dedup import (
    _portable_hash32,
)
from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
    DEFAULT_B,
    DEFAULT_K1,
    bm25f_corpus_stats,
    bm25f_postings,
    clean_phrase,
    clean_query_terms,
    corpus_stats,
    phrase_intersect,
    positional_postings,
    postings,
    score_phrase_counts,
)
from harvesting_extract_to_ttl_service_spark.streaming.dedup_stream import (
    _check_sidecar_params,
)

_TOKENIZER = "lower_ws"  # lowercased whitespace tokens (retrieval.terms)

# compaction output sizing: aim for parquet files of about this many
# bytes per bucket split — the classic scan-friendly size, applied to
# the INPUT byte total so positional indexes (whose positions arrays
# make posting rows several times wider) automatically get
# proportionally more splits than flat ones
_COMPACT_TARGET_BYTES = 128 * 1024 * 1024


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


def _fields_key(field_weights: dict[str, float] | None):
    """Sidecar form of the BM25F field convention: name-sorted
    ``[[field, weight], …]`` (JSON-stable), or None for the plain
    single-field index. Index identity — weighted and unweighted
    postings, or two different weightings, can never mix."""
    if not field_weights:
        return None
    return [[str(n), float(w)] for n, w in sorted(field_weights.items())]


def _check_bm25_sidecar(spark: SparkSession, index_dir: str,
                        n_buckets: int,
                        positional: bool = False,
                        fields=None) -> None:
    """Bucket count and tokenizer are the index's identity: postings
    bucketed mod a different n_buckets would silently miss every pruned
    term, and a different tokenizer changes tf/dl everywhere — both
    refuse up front, like the IVF sidecar. ``positional`` and the BM25F
    ``fields`` convention are identity too (mixed batches would leave
    phrase queries silently blind to non-positional batches, and
    field-weighted tf/dl silently inconsistent); both backfilled for
    pre-upgrade indexes."""
    stored = _read_params(spark, index_dir)
    if stored and stored.get("compacting"):
        # an index left mid-compaction by the PRE-GENERATION compactor
        # (which flagged the params sidecar and staged _compact_tmp_*
        # trees) has no automatic resume path in this version — fail
        # with the manual recovery steps instead of a generic
        # parameter-mismatch diff
        raise ValueError(
            f"bm25 index at {index_dir} was left mid-compaction by a "
            f"pre-generation version (params sidecar has "
            f"compacting=true). Manual recovery: if a COMPLETE "
            f"_compact_tmp_* tree exists under the index, promote it "
            f"(rename) to postings/batch=-1 [+ stats/batch=-1] and "
            f"delete the batch dirs it folded; otherwise delete any "
            f"_compact_tmp_* trees (the original batch dirs are "
            f"intact). Then remove the 'compacting' key from "
            f"_bm25_params.json and re-run compact_bm25_index")
    _check_sidecar_params(
        spark, index_dir,
        {"n_buckets": n_buckets, "tokenizer": _TOKENIZER, "version": 1,
         "positional": bool(positional), "fields": fields},
        filename="_bm25_params.json",
        defaults={"positional": False, "fields": None})


def _read_params(spark: SparkSession, index_dir: str) -> dict | None:
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _read_json_sidecar,
    )

    return _read_json_sidecar(spark, f"{index_dir}/_bm25_params.json")


def _sidecar_positional(spark: SparkSession, index_dir: str) -> bool:
    """Read the index's positional flag (False for pre-upgrade
    sidecars) so read paths adapt instead of making callers restate
    it."""
    params = _read_params(spark, index_dir)
    return bool(params.get("positional", False)) if params else False


# --- the read pointer ------------------------------------------------------


class _IndexView(NamedTuple):
    """One search's resolved snapshot of the index: pointer state plus
    the visible unfolded batch ids and unapplied tombstone ids — all
    read ONCE per query so no two reads of one plan can straddle a
    concurrent pointer flip. ``segments is None`` marks the legacy
    pre-segment layout (a single flat tree directly under
    ``gen=<g>/postings``). ``seg_stats`` is the pointer's per-segment
    ``(n_docs, sum_dl)`` snapshot (None on pre-snapshot pointers) —
    when it covers every named segment, :func:`_read_index_stats`
    skips the segment-stats parquet read entirely."""

    gen: int
    segments: list | None
    fence: int
    applied_dels: int
    vis: list
    dels: list
    seg_stats: dict | None


def _parse_seg_stats(raw) -> dict | None:
    """Pointer/manifest form ``{"<seg>": [n_docs, sum_dl], …}`` →
    ``{seg: (n, dl)}``; None when the snapshot is absent (pre-upgrade
    pointers fall back to the segment stats parquet)."""
    if raw is None:
        return None
    return {int(k): (int(v[0]), int(v[1])) for k, v in raw.items()}


def _pointer(spark: SparkSession, index_dir: str
             ) -> tuple[int, list | None, int, int, dict | None]:
    """(generation, segments, max_folded_batch, applied_dels,
    seg_stats): the index's one-file read pointer. Generation −1 = no
    consolidated tree (all data lives in batch dirs); ``segments``
    None = a legacy flat generation tree (pre-segment fold) or no tree
    at all; ``applied_dels`` = the highest tombstone id a full fold has
    physically applied (readers ignore those del dirs — they may
    linger until cleanup); ``seg_stats`` = the fold-time cumulative
    stats snapshot per segment (None on pre-snapshot pointers). Falls
    back to the pre-generation ``_bm25_compaction.json`` fence for
    indexes last compacted by the legacy batch=-1 fold."""
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _read_json_sidecar,
    )

    ptr = _read_json_sidecar(spark, f"{index_dir}/_bm25_generation.json")
    if ptr is not None:
        segs = ptr.get("segments")
        return (int(ptr["generation"]),
                None if segs is None else sorted(int(s) for s in segs),
                int(ptr["max_folded_batch"]),
                int(ptr.get("applied_dels", -1)),
                _parse_seg_stats(ptr.get("seg_stats")))
    legacy = _read_json_sidecar(spark,
                                f"{index_dir}/_bm25_compaction.json")
    if legacy is not None:
        return -1, None, int(legacy.get("max_folded_batch", -1)), -1, None
    return -1, None, -1, -1, None


def _visible_batch_ids(spark: SparkSession, index_dir: str,
                       gen: int, fence: int) -> list[int]:
    """Batch ids the current pointer makes readable: committed (their
    stats directory carries ``_SUCCESS`` — the ingest commit point) and
    not folded (id > fence). The legacy ``batch=-1`` consolidated dir
    is visible only while no generation tree exists — once a
    generational fold absorbed it, its rows live in ``gen=<g>``."""
    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )

    fs, _ = _hadoop_fs(spark, index_dir)
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    root = jpath(f"{index_dir}/stats")
    if not fs.exists(root):
        return []
    ids = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not name.startswith("batch="):
            continue
        i = int(name.split("=", 1)[1])
        if i > fence or (i == -1 and gen < 0):
            if fs.exists(jpath(f"{index_dir}/stats/batch={i}/_SUCCESS")):
                ids.append(i)
    return sorted(ids)


def _visible_del_ids(spark: SparkSession, index_dir: str,
                     applied: int) -> list[int]:
    """Tombstone batch ids the current pointer makes active: committed
    (``_SUCCESS``) and not yet physically applied by a full fold
    (id > ``applied_dels``)."""
    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )

    fs, _ = _hadoop_fs(spark, index_dir)
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    root = jpath(f"{index_dir}/tombstones")
    if not fs.exists(root):
        return []
    ids = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not name.startswith("del="):
            continue
        d = int(name.split("=", 1)[1])
        if d > applied and fs.exists(
                jpath(f"{index_dir}/tombstones/del={d}/_SUCCESS")):
            ids.append(d)
    return sorted(ids)


def _index_view(spark: SparkSession, index_dir: str) -> _IndexView:
    """Resolve the pointer, visible batch set and active tombstone set
    ONCE per search, so no two reads of one query can straddle a
    concurrent pointer flip."""
    gen, segments, fence, applied, seg_stats = _pointer(spark, index_dir)
    return _IndexView(
        gen, segments, fence, applied,
        _visible_batch_ids(spark, index_dir, gen, fence),
        _visible_del_ids(spark, index_dir, applied), seg_stats)


def _postings_frames(spark: SparkSession, index_dir: str,
                     view: _IndexView,
                     buckets: list[int] | None = None) -> DataFrame:
    """Union of the readable posting trees: the consolidated
    generation's SEGMENTS named by the pointer (or the one flat legacy
    tree) plus the visible unfolded batch dirs, read by EXPLICIT path
    so partition discovery never touches a half-committed or
    superseded directory. Every tree keeps ``bucket`` as a
    directory-level partition column under its own basePath.

    ``buckets`` (the query's driver-side term-hash list) prunes the
    LISTING itself: Spark's file index enumerates every directory
    under the given paths BEFORE partition-filter pruning trims them,
    so a search that passed only tree roots would list
    segments×n_buckets directories per query — at a large-corpus
    config (4096 buckets, 8 segments) that is ~32k directory listings
    to read 2-8 posting lists. With ``buckets`` the read names the
    probed ``…/bucket=<b>`` leaf dirs explicitly (existence-checked —
    partitionBy writes only non-empty buckets), so listing cost
    tracks the query, not the index layout. Maintenance paths (folds,
    deletes) pass None and read whole trees."""
    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )

    fs, _ = _hadoop_fs(spark, index_dir)
    jpath = spark._jvm.org.apache.hadoop.fs.Path

    def _bucket_paths(parents: list[str]) -> list[str] | None:
        """Probed-bucket leaf dirs that exist under the parents; None
        = caller should read the whole parents (no bucket pruning
        requested, or nothing matched — the unpruned read then yields
        0 rows after the term filter, keeping 'no readable data'
        strictly about an EMPTY index). One listStatus per parent —
        not one exists() per (parent, bucket) — so object-store RPC
        count tracks the tree count, not the query's term count."""
        if buckets is None:
            return None
        want = {f"bucket={b}" for b in buckets}
        out = []
        for p in parents:
            pp = jpath(p)
            if not fs.exists(pp):
                continue
            for st in fs.listStatus(pp):
                name = st.getPath().getName()
                if name in want:
                    out.append(f"{p}/{name}")
        return out or None

    frames = []
    if view.gen >= 0:
        if view.segments is None:
            p = f"{index_dir}/gen={view.gen}/postings"
            sub = _bucket_paths([p])
            frames.append(spark.read.option("basePath", p)
                          .parquet(*(sub or [p])))
        elif view.segments:
            root = f"{index_dir}/gen={view.gen}/postings"
            parents = [f"{root}/seg={s}" for s in view.segments]
            sub = _bucket_paths(parents)
            frames.append(
                spark.read.option("basePath", root)
                .parquet(*(sub or parents)).drop("seg"))
    if view.vis:
        root = f"{index_dir}/postings"
        parents = [f"{root}/batch={i}" for i in view.vis]
        sub = _bucket_paths(parents)
        frames.append(spark.read.option("basePath", root)
                      .parquet(*(sub or parents)).drop("batch"))
    if not frames:
        raise ValueError(
            f"bm25 index at {index_dir} has no readable data (no "
            f"generation tree and no committed batches)")
    out = frames[0]
    for f2 in frames[1:]:
        out = out.unionByName(f2)
    return out


def _doclens_frames(spark: SparkSession, index_dir: str,
                    view: _IndexView) -> DataFrame | None:
    """The view's doc-keyed ``(id, dl)`` sidecar — the round-16 delete
    fast path. Ingest writes ``doclens/batch=<i>`` next to each posting
    batch and every fold derives ``gen=<g>/doclens/seg=<s>`` from the
    segment it just wrote, so a delete harvests the doomed docs'
    lengths from one tiny doc-keyed tree per batch/segment instead of
    scanning EVERY term bucket of the whole index (O(index) work per
    delete batch — the documented cost of the term-bucketed layout
    that this sidecar removes). Returns None when any visible tree
    lacks its sidecar (an index ingested before round 16): the caller
    falls back to the postings scan, and the index self-heals as folds
    rewrite segments."""
    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )

    fs, _ = _hadoop_fs(spark, index_dir)
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    paths = []
    if view.gen >= 0:
        if view.segments is None:
            # legacy flat generation tree — predates the sidecar
            return None
        paths += [f"{index_dir}/gen={view.gen}/doclens/seg={s}"
                  for s in view.segments]
    paths += [f"{index_dir}/doclens/batch={i}" for i in view.vis]
    if not paths:
        return None
    if not all(fs.exists(jpath(p)) for p in paths):
        return None
    return spark.read.parquet(*paths).select("id", "dl")


def _tombstones(spark: SparkSession, index_dir: str,
                view: _IndexView) -> DataFrame | None:
    """The view's active tombstone rows ``(id, dl)`` (None when there
    are none) — deleted doc ids with the document length they carried,
    recorded at delete time so the stats correction never rescans
    postings."""
    if not view.dels:
        return None
    root = f"{index_dir}/tombstones"
    return spark.read.parquet(
        *[f"{root}/del={d}" for d in view.dels]).select("id", "dl")


def _size_conf_bytes(spark: SparkSession) -> int:
    """``spark.sql.autoBroadcastJoinThreshold`` as bytes (−1 = never
    broadcast) — the same knob Spark's planner keys broadcast
    decisions on, so the tombstone join's mode matches what the
    cluster is sized for. Accepts the numeric and suffixed (k/m/g[b])
    forms the conf takes."""
    raw = str(spark.conf.get("spark.sql.autoBroadcastJoinThreshold",
                             "10485760")).strip().lower()
    mult = 1
    for suf, m in (("kb", 1 << 10), ("mb", 1 << 20), ("gb", 1 << 30),
                   ("k", 1 << 10), ("m", 1 << 20), ("g", 1 << 30),
                   ("b", 1)):
        if raw.endswith(suf):
            raw, mult = raw[:-len(suf)], m
            break
    try:
        return int(float(raw) * mult)
    except ValueError:
        return 10485760


def _dels_bytes(spark: SparkSession, index_dir: str,
                dels: list[int]) -> int:
    """Total on-disk bytes of the active tombstone batches — one
    driver-side content summary per del dir (a listing, no data job) —
    the size signal the anti-join mode switches on."""
    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )

    fs, _ = _hadoop_fs(spark, index_dir)
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    return sum(fs.getContentSummary(
        jpath(f"{index_dir}/tombstones/del={d}")).getLength()
        for d in dels)


def _anti_join_dels(df: DataFrame, spark: SparkSession, index_dir: str,
                    view: _IndexView, tomb_ids: DataFrame) -> DataFrame:
    """Anti-join the active tombstone ids out of ``df`` — BROADCAST
    while the del batches' bytes sit under the session's
    autoBroadcastJoinThreshold (the common case: deletion sets small
    next to the corpus), shuffle anti-join beyond it (mass dedup of a
    near-dup-heavy crawl can tombstone hundreds of millions of ids — a
    forced broadcast would OOM every executor). The size signal is the
    del dirs' byte total from the filesystem listing — no count job."""
    if _dels_bytes(spark, index_dir, view.dels) \
            <= _size_conf_bytes(spark):
        tomb_ids = F.broadcast(tomb_ids)
    return df.join(tomb_ids, "id", "left_anti")


def _read_pruned_postings(spark: SparkSession, index_dir: str,
                          terms_: list[str], n_buckets: int,
                          view: _IndexView) -> DataFrame:
    """The index read every search path shares: bucket IN-list from the
    driver-side term hashes (directory pruning on every tree in the
    view), the term IN-list (parquet pushed filter), then the tombstone
    anti-join (broadcast below the autoBroadcastJoinThreshold, shuffle
    anti-join above — :func:`_anti_join_dels`) so deleted documents
    drop out of tf AND df before any scoring. The bucket list prunes
    the file LISTING too (passed into :func:`_postings_frames`), so
    per-query driver cost tracks the probed buckets, not
    segments×n_buckets directories."""
    buckets = sorted({term_bucket_py(t, n_buckets) for t in terms_})
    ps = _postings_frames(spark, index_dir, view, buckets=buckets)
    ps = (ps.filter(F.col("bucket").isin(buckets))
          .filter(F.col("term").isin(terms_)))
    tomb = _tombstones(spark, index_dir, view)
    if tomb is not None:
        ps = _anti_join_dels(ps, spark, index_dir, view,
                             tomb.select("id"))
    return ps


def _read_index_stats(spark: SparkSession, index_dir: str,
                      view: _IndexView) -> DataFrame:
    """One-row N/avgdl from the exact additive sums of the generation
    segments' stats rows plus the visible per-batch stats rows, MINUS
    the active tombstones' one-row correction (−count, −Σdl — the
    additive design runs on signed sums) — all from the same view the
    postings read resolved, so the two can never disagree about which
    batches, segments or deletes exist."""
    frames = []
    if view.gen >= 0:
        if view.segments is None:
            frames.append(
                spark.read.parquet(f"{index_dir}/gen={view.gen}/stats")
                .select("n_docs", "sum_dl"))
        elif view.segments:
            snap = view.seg_stats
            if snap is not None and all(s in snap
                                        for s in view.segments):
                # the pointer carries every segment's fold-time
                # (n_docs, sum_dl) snapshot: the segment contribution
                # is a driver-side sum — parquet is read only for the
                # unfolded batches (usually a handful), shaving the
                # per-search fixed cost of one scan per segment
                n = sum(snap[s][0] for s in view.segments)
                dl = sum(snap[s][1] for s in view.segments)
                frames.append(spark.range(1).select(
                    F.lit(n).cast("long").alias("n_docs"),
                    F.lit(dl).cast("long").alias("sum_dl")))
            else:
                root = f"{index_dir}/gen={view.gen}/stats"
                frames.append(
                    spark.read.parquet(
                        *[f"{root}/seg={s}" for s in view.segments])
                    .select("n_docs", "sum_dl"))
    if view.vis:
        root = f"{index_dir}/stats"
        frames.append(spark.read.option("basePath", root)
                      .parquet(*[f"{root}/batch={i}" for i in view.vis])
                      .select("n_docs", "sum_dl"))
    if not frames:
        raise ValueError(
            f"bm25 index at {index_dir} has no readable stats")
    out = frames[0]
    for f2 in frames[1:]:
        out = out.unionByName(f2)
    tomb = _tombstones(spark, index_dir, view)
    if tomb is not None:
        corr = tomb.agg(
            (-F.count("*")).alias("n_docs"),
            (-F.coalesce(F.sum("dl"), F.lit(0))).alias("sum_dl"))
        out = out.unionByName(corr)
    return (out.agg(F.sum("n_docs").alias("n_docs"),
                    F.sum("sum_dl").alias("sum_dl"))
            .withColumn("avgdl", F.col("sum_dl").cast("double")
                        / F.col("n_docs")))


# --- ingest ----------------------------------------------------------------


def bm25_index_batch(docs: DataFrame, batch_id: int, index_dir: str,
                     n_buckets: int = 64, text_col: str = "text",
                     id_col: str = "doc_id",
                     positional: bool = False,
                     field_weights: dict[str, float] | None = None
                     ) -> None:
    """Append one micro-batch of documents to the index: the posting
    table of THIS batch (explode + map-side-combinable groupBy — the
    only shuffle), partitioned by term bucket under ``batch=<id>``, plus
    the batch's one-row additive stats. Overwrite semantics per batch
    directory = replay idempotence. ``positional=True`` stores each
    term's token offsets too (operators/retrieval.positional_postings —
    the price of stored phrase queries). ``field_weights`` builds a
    BM25F index instead (operators/retrieval.bm25f_postings — weighted
    double tf/dl over the named columns; ``text_col`` is ignored). Both
    are sidecar-pinned index identity, so positional/flat and
    weighted/unweighted batches can never mix in one index; positional
    BM25F is refused (token offsets are per-field, a cross-field phrase
    position is not well defined).

    Commit protocol: the posting tree is written FIRST, the stats row
    SECOND — and a batch is visible to searches only once its stats
    directory carries ``_SUCCESS``, so a crash between the two writes
    (or a search concurrent with this job) sees neither side of the
    half-committed batch. On a REPLAY of an already-committed batch the
    old stats directory is deleted up front — visibility drops BEFORE
    the posting overwrite begins, so a search concurrent with the
    replay (crash/retry of the writing job) can never resolve the batch
    as visible while its posting dir is half-rewritten; the replay then
    re-commits both sides. Because the visibility gate IS the
    ``_SUCCESS`` marker, ingest verifies the marker actually landed and
    fails loudly on committers configured not to write one
    (``mapreduce.fileoutputcommitter.marksuccessfuljobs=false``) —
    otherwise every committed batch would be silently invisible.

    Replay contract: a batch id at or below the index's
    ``max_folded_batch`` pointer REFUSES — its rows already live in a
    consolidated generation, so rewriting ``batch=<id>`` would double
    every tf and df the batch contributed. Replay idempotence holds for
    batches not yet folded. While a compaction is marked in progress
    (``_bm25_compacting.json``), only batch ids at or below the fold's
    published ``folding_through`` snapshot refuse (rewriting a
    directory the fold is scanning would silently lose rows in the
    consolidated tree); fresh higher ids ingest normally and survive
    the flip. Searches run undisturbed through everything."""
    spark = docs.sparkSession
    if positional and field_weights:
        raise ValueError(
            "bm25_index_batch: positional=True cannot combine with "
            "field_weights — token offsets are per-field, so a "
            "cross-field phrase position is not well defined")
    fields = _fields_key(field_weights)
    _check_bm25_sidecar(spark, index_dir, n_buckets,
                        positional=positional, fields=fields)
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _read_json_sidecar,
    )

    marker = _read_json_sidecar(spark,
                                f"{index_dir}/_bm25_compacting.json")
    if marker:
        # a running fold snapshots the batch set it will fold
        # (folding_through); batches ABOVE the snapshot are untouched
        # by the fold and stay above its replay fence, so fresh ingest
        # keeps flowing through a multi-hour fold — only a replay of a
        # batch the fold may be reading right now must refuse (the
        # overwrite would race the fold's scan: silent data loss in
        # the consolidated tree). A marker without the snapshot yet
        # (the fold is still listing — or a DELETE holds the lease,
        # whose postings harvest a replay could equally race) refuses
        # conservatively.
        through = marker.get("folding_through")
        if through is None or batch_id <= through:
            kind = ("deleting" if marker.get("deleting")
                    else f"compacting through batch {through}")
            raise ValueError(
                f"bm25_index_batch: index at {index_dir} is {kind} — "
                f"batch {batch_id} is (or may be) inside the running "
                f"maintenance job's scan, and rewriting it would race "
                f"that scan; re-run it after the job finishes (fresh "
                f"higher batch ids and all searches are unaffected)")
    _gen, _segs, fence, _applied, _snap = _pointer(spark, index_dir)
    if batch_id <= fence:
        raise ValueError(
            f"bm25_index_batch: batch {batch_id} was already folded "
            f"into a consolidated generation (max_folded_batch="
            f"{fence}) — replaying it would double its postings' "
            f"tf/df; re-ingest under a fresh batch id only if the "
            f"documents are genuinely new")
    if field_weights:
        base = bm25f_postings(docs, field_weights, id_col)
        stats = bm25f_corpus_stats(docs, field_weights)
    else:
        base = (positional_postings(docs, text_col, id_col) if positional
                else postings(docs, text_col, id_col))
        stats = corpus_stats(docs, text_col)
    ps = base.withColumn("bucket", term_bucket(F.col("term"), n_buckets))
    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )

    fs, _ = _hadoop_fs(spark, index_dir)
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    # REPLAY of a committed batch: drop its visibility FIRST (delete the
    # stats dir) so no search can resolve the batch as visible while the
    # posting overwrite below is mid-rewrite; a crash here leaves the
    # batch invisible (a stranded posting dir the compaction guard names
    # loudly) and the next replay re-commits it
    fs.delete(jpath(f"{index_dir}/stats/batch={batch_id}"), True)
    (ps.write.mode("overwrite").partitionBy("bucket")
     .parquet(f"{index_dir}/postings/batch={batch_id}"))
    # doc-keyed (id, dl) sidecar (round 16): derived by reading BACK the
    # postings just written — no recompute of the tokenize/explode
    # subtree, and the values cannot diverge from what the postings
    # carry. Deletes harvest doomed docs' lengths from this one tiny
    # tree instead of scanning every term bucket (_doclens_frames).
    # Written before the stats commit, so its visibility rides the same
    # _SUCCESS gate; a replay overwrites it with the rest.
    (spark.read.parquet(f"{index_dir}/postings/batch={batch_id}")
     .groupBy("id").agg(F.first("dl").alias("dl"))
     .write.mode("overwrite")
     .parquet(f"{index_dir}/doclens/batch={batch_id}"))
    _commit_stats(stats, f"{index_dir}/stats/batch={batch_id}")
    if not fs.exists(
            jpath(f"{index_dir}/stats/batch={batch_id}/_SUCCESS")):
        raise ValueError(
            f"bm25_index_batch: the committer wrote "
            f"{index_dir}/stats/batch={batch_id} WITHOUT a _SUCCESS "
            f"marker — this index's visibility protocol gates readers "
            f"on it, so every batch would be silently invisible. Set "
            f"mapreduce.fileoutputcommitter.marksuccessfuljobs=true "
            f"(it is the Hadoop default) and re-run the batch")


def _commit_stats(stats: DataFrame, path: str) -> None:
    """The batch's commit point: readers gate on this directory's
    ``_SUCCESS``, so the postings written before it stay invisible
    until it lands. Module-level so crash tests can inject a failure
    between the two ingest writes."""
    (stats.select("n_docs", "sum_dl")
     .coalesce(1).write.mode("overwrite").parquet(path))


def bm25_search(spark: SparkSession, index_dir: str,
                query_terms: list[str], k: int = 10,
                k1: float = DEFAULT_K1, b: float = DEFAULT_B,
                n_buckets: int = 64,
                id_col: str = "doc_id") -> DataFrame:
    """Top-k BM25 over the accumulated index. The query terms' buckets
    are computed driver-side; the bucket IN-list prunes partition
    directories and the term IN-list reaches the parquet scan as a
    pushed filter (tests pin both in the plan), so per-query I/O is the
    probed posting lists, not the index. N/avgdl are the exact additive
    sums of the generation + visible per-batch stats rows (tombstone-
    corrected); document frequency comes from the probed postings
    themselves. A single query IS a one-row batch: this routes through
    the same scoring core as :func:`bm25_search_batch`
    (operators/retrieval.score_query_candidates — the df convention,
    contribution arithmetic and pinned fold the ad-hoc batched join
    shares too), so there is exactly ONE stored-index scoring path;
    only the top-k TAIL differs (plain orderBy+limit — a per-query
    window would pay a shuffle for one partition), and the query-side
    frame is built directly from the cleaned terms, no tokenizer
    round-trip. Works on flat, positional AND BM25F indexes
    (the positions column just rides along unused; BM25F tf/dl are
    already weighted at ingest). Runs undisturbed during a
    compaction — the pointer is resolved once, and the fold never
    touches the trees that pointer names."""
    params = _read_params(spark, index_dir)
    _check_bm25_sidecar(
        spark, index_dir, n_buckets,
        positional=bool(params.get("positional")) if params else False,
        fields=params.get("fields") if params else None)
    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        score_query_candidates,
        top_ranked,
    )

    qt = clean_query_terms(query_terms)
    ps, stats = _stored_query_inputs(spark, index_dir, qt, n_buckets)
    # single unweighted query: the prefilter IS the query — no query
    # frame, no fan-out join, constant qid; plain orderBy+limit tail
    # (shared top_ranked) instead of a one-partition window shuffle
    agg = score_query_candidates(None, ps, stats, k1, b, None, True,
                                 False, ps_prefiltered=True,
                                 single_query=True)
    return top_ranked(agg.drop("qid"), k, id_col)


def _stored_query_inputs(spark: SparkSession, index_dir: str,
                         uniq: list[str],
                         n_buckets: int) -> tuple[DataFrame, DataFrame]:
    """The shared stored-index read: resolve the view ONCE, return the
    bucket-pruned term-pushed tombstone-corrected postings and the
    matching stats snapshot — the inputs every stored search hands to
    operators/retrieval.score_query_candidates (the one scoring core,
    shared with the ad-hoc batched join, so stored results equal the
    ad-hoc ones over the ingested batches row for row)."""
    view = _index_view(spark, index_dir)
    ps = _read_pruned_postings(spark, index_dir, uniq, n_buckets, view)
    return ps, _read_index_stats(spark, index_dir, view)


def bm25_search_batch(spark: SparkSession, queries: DataFrame,
                      index_dir: str, k: int = 10,
                      k1: float = DEFAULT_K1, b: float = DEFAULT_B,
                      max_df_ratio: float | None = None,
                      broadcast_queries: bool = True,
                      query_tf: float | None = None,
                      n_buckets: int = 64,
                      qid_col: str = "query_id",
                      qtext_col: str = "text",
                      id_col: str = "doc_id") -> DataFrame:
    """Batched BM25 over the PERSISTED index — the at-scale query
    shape: all queries in ONE plan (the 3–4× loop-throughput win
    SCALE.md's bm25 probe measures) over postings read once with the
    union of the batch's terms driving the bucket directory pruning
    and the pushed term filter. The query batch's distinct terms are
    collected driver-side (bounded: the batch's vocabulary — query
    batches are small next to the corpus; for corpus-sized "query"
    sets use the dedup operators instead). Scoring is
    operators/retrieval.score_query_join — the SAME core as the
    ad-hoc bm25_topk_join (shared df convention, max_df pruning
    before fan-out, query_tf saturation, pinned folds), so stored
    results equal the ad-hoc join over the ingested batches row for
    row (tests pin it). N/avgdl and per-query stats come from the
    same resolved view as the postings, so a concurrent pointer flip
    can't skew a batch mid-plan."""
    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        query_terms_frame,
    )

    params = _read_params(spark, index_dir)
    _check_bm25_sidecar(
        spark, index_dir, n_buckets,
        positional=bool(params.get("positional")) if params else False,
        fields=params.get("fields") if params else None)
    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        score_query_join,
    )

    qterms = query_terms_frame(queries, query_tf, qid_col, qtext_col)
    uniq = sorted({r["term"] for r in
                   qterms.select("term").distinct().collect()})
    ps, stats = _stored_query_inputs(spark, index_dir, uniq, n_buckets)
    return score_query_join(qterms, ps, stats, k, k1, b,
                            max_df_ratio, broadcast_queries,
                            query_tf is not None, qid_col, id_col,
                            ps_prefiltered=True)


def search_with_snippets(spark: SparkSession, queries: DataFrame,
                         index_dir: str, docs: DataFrame, k: int = 10,
                         width: int = 3, max_snippets: int = 2,
                         raw: bool = False,
                         k1: float = DEFAULT_K1, b: float = DEFAULT_B,
                         max_df_ratio: float | None = None,
                         broadcast_queries: bool = True,
                         query_tf: float | None = None,
                         n_buckets: int = 64,
                         qid_col: str = "query_id",
                         qtext_col: str = "text",
                         text_col: str = "text",
                         id_col: str = "doc_id") -> DataFrame:
    """Batched stored-index search WITH display snippets, one plan:
    :func:`bm25_search_batch` top-k per query, joined back to the
    document table for up to ``max_snippets`` ``±width``-token windows
    around each result's earliest hits →
    ``(qid_col, id_col, rank, n_terms_hit, score, n_matches, snips)``.

    The join-back is the only corpus touch snippets add: the ≤ k·|Q|
    result rows (already carrying each query's term array) BROADCAST
    into one scan of ``docs`` — the tests pin exactly one scan of the
    document source in the plan. Each result row's hits are scanned
    against ITS OWN query's terms (operators/retrieval._snippet_frame —
    the same pure-column core the standalone ``snippets`` operator
    uses), so a multi-query batch never cross-matches terms.

    ``raw=False`` echoes the retrieval tokenizer's lowercase tokens
    (exactly what matched); ``raw=True`` slices the ORIGINAL text on
    the same whitespace boundaries — user-displayable casing — while
    hits still match case-insensitively, so ``n_matches`` and the hit
    offsets are identical between modes. Every scored result matches
    ≥1 term by construction, so no rows are filtered here; passing a
    ``docs`` frame that is missing a result's document would surface
    as a dropped row (the inner join), loudly visible against the
    search's own output."""
    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        _snippet_frame,
        query_terms_frame,
        raw_tokens,
        terms,
    )

    res = bm25_search_batch(
        spark, queries, index_dir, k=k, k1=k1, b=b,
        max_df_ratio=max_df_ratio,
        broadcast_queries=broadcast_queries, query_tf=query_tf,
        n_buckets=n_buckets, qid_col=qid_col, qtext_col=qtext_col,
        id_col=id_col)
    qt = (query_terms_frame(queries, None, qid_col, qtext_col)
          .groupBy("qid").agg(F.collect_set("term").alias("_qt")))
    hits = (res.select(F.col(qid_col).alias("qid"),
                       F.col(id_col).alias("id"),
                       "rank", "n_terms_hit", "score")
            .join(F.broadcast(qt), "qid"))
    tok = (raw_tokens(F.col(text_col)) if raw
           else terms(F.col(text_col)))
    d = docs.select(F.col(id_col).alias("id"), tok.alias("_t"))
    base = d.join(F.broadcast(hits), "id")
    out = _snippet_frame(base, width, max_snippets)
    return out.select(F.col("qid").alias(qid_col),
                      F.col("id").alias(id_col),
                      "rank", "n_terms_hit", "score",
                      "n_matches", "snips")


def run_bm25_index_stream(docs_stream: DataFrame, index_dir: str,
                          checkpoint_dir: str, n_buckets: int = 64,
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          positional: bool = False,
                          field_weights: dict[str, float] | None = None,
                          compact_every: int | None = None,
                          max_segments: int = 8):
    """Structured-Streaming ingest loop: every micro-batch lands as one
    replay-idempotent ``batch=<id>`` posting + stats pair. Exactly the
    ann_stream.run_ivf_index_stream shape — foreachBatch keyed on the
    engine's batch id, so a restarted query rewrites its in-flight batch
    byte-identically instead of duplicating it.

    ``compact_every=n`` makes the stream SELF-MAINTAINING: whenever the
    committed-but-unfolded batch count (excluding the current batch)
    reaches ``n``, the ingest callback runs a fold bounded to
    ``max_batch = batch_id - 1``. That bound is what makes in-stream
    compaction replay-safe: foreachBatch guarantees every batch below
    the current one is checkpoint-committed (it will never replay), while
    the CURRENT batch may replay after a crash — bounded out of the
    fold, its replay stays above the new fence instead of refusing.
    Searches are undisturbed throughout (the fold is read-transparent),
    and minor folds keep the in-stream pause O(new data). A leftover
    lease from a crashed MAINTENANCE fold makes the batch fail loudly
    (the operator resolves the dead fold) rather than race it."""
    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        bm25_index_batch(batch_df, batch_id, index_dir,
                         n_buckets=n_buckets, text_col=text_col,
                         id_col=id_col, positional=positional,
                         field_weights=field_weights)
        if compact_every is None:
            return
        spark = batch_df.sparkSession
        gen, _segs, fence, _applied, _snap = _pointer(spark, index_dir)
        eligible = [i for i in
                    _visible_batch_ids(spark, index_dir, gen, fence)
                    if i < batch_id]
        if len(eligible) >= compact_every:
            compact_bm25_index(spark, index_dir, n_buckets=n_buckets,
                               max_segments=max_segments,
                               max_batch=batch_id - 1)

    return (docs_stream.writeStream.foreachBatch(_ingest)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


# --- document deletion (tombstones) ----------------------------------------


def bm25_delete_docs(spark: SparkSession, index_dir: str,
                     doc_ids: list, n_buckets: int = 64,
                     lease_seconds: float = 600.0,
                     steal_legacy: bool = False) -> int:
    """Delete documents from the persisted index — the operation a real
    pipeline hits early (dedup-after-ingest losers, takedowns, corpus
    refreshes) that an append-only index cannot express. Logical-then-
    physical, the LSM convention:

    * This job writes one TOMBSTONE batch
      ``<index_dir>/tombstones/del=<d>/`` holding ``(id, dl)`` — the
      deleted doc ids plus the document length each carried, captured
      NOW so the stats correction never needs the postings again.
      Visibility is atomic exactly like ingest: readers honor a del dir
      only once its ``_SUCCESS`` lands.
    * Every search anti-joins the active tombstones out of the probed
      postings (broadcast — deletion sets are small next to the
      corpus), so tf AND df drop immediately, and subtracts the
      tombstones' ``(−count, −Σdl)`` one-row correction from N/avgdl
      (the additive stats design runs on signed sums) — so
      search-after-delete equals an index REBUILT without the docs,
      row for row (the parity the tests pin).
    * A FULL compaction (``compact_bm25_index(full=True)``) applies
      the deletes physically: tombstoned postings drop out of the new
      generation, the folded stats subtract them, and the pointer's
      ``applied_dels`` retires the del dirs. MINOR and TIERED folds
      leave tombstones logical (a partial merge cannot apply a
      tombstone whose postings may also live in an untouched
      segment).
    * Replay fence interaction: a replayed source batch containing a
      deleted doc rewrites its postings, but the tombstone still
      anti-joins them — the doc is NOT resurrected (pinned by test).

    Ids already tombstoned are skipped (a double delete must not
    subtract twice); ids absent from the index contribute nothing (the
    ``(id, dl)`` rows are harvested from the doc-keyed ``doclens``
    sidecar with a pushed id IN-filter — one tiny tree per
    batch/segment, never the term buckets; a pre-sidecar index falls
    back to the full postings scan until its folds rewrite it). Returns
    the number of documents newly tombstoned. Deletes hold the SAME
    expiring maintenance lease as the compactor
    (``_bm25_compacting.json``, payload ``deleting``): a delete
    mid-fold could race the fold's stats snapshot, and two concurrent
    deletes could pick the same ``del=<d>`` slot and silently lose the
    first writer's tombstones — the lease excludes both. Ingest
    refuses while a delete holds the marker (it has no
    ``folding_through`` snapshot, the conservative branch); deletes
    are seconds, not hours, so ``lease_seconds`` defaults short. The
    id list is driver-side — bounded by the deletion set; for
    corpus-scale deletion sets use :func:`bm25_delete_docs_df`."""
    ids = list(dict.fromkeys(doc_ids))
    if not ids:
        return 0
    return _delete_docs(spark, index_dir, ids, None, n_buckets,
                        lease_seconds, steal_legacy)


def bm25_delete_docs_df(spark: SparkSession, index_dir: str,
                        ids_df: DataFrame, id_col: str = "id",
                        n_buckets: int = 64,
                        lease_seconds: float = 600.0,
                        steal_legacy: bool = False) -> int:
    """DataFrame-native twin of :func:`bm25_delete_docs` — the
    corpus-scale deletion path: the doomed id set stays distributed
    end to end (no driver-side collect, no forced broadcast), so a
    deletion set of hundreds of millions of ids (mass dedup of a
    near-dup-heavy crawl) writes its tombstone batch as one shuffle
    job. The already-tombstoned dedup and the postings harvest are
    plain joins Spark's planner (AQE) sizes itself; search-side
    anti-joins switch from broadcast to shuffle automatically once the
    del batches outgrow the autoBroadcastJoinThreshold
    (:func:`_anti_join_dels`). Same lease, slot, visibility and
    double-delete semantics as the list form; returns the count newly
    tombstoned."""
    return _delete_docs(
        spark, index_dir, None,
        ids_df.select(F.col(id_col).alias("id")).distinct(),
        n_buckets, lease_seconds, steal_legacy)


def _delete_docs(spark: SparkSession, index_dir: str,
                 ids: list | None, ids_df: DataFrame | None,
                 n_buckets: int, lease_seconds: float,
                 steal_legacy: bool) -> int:
    """Shared tombstone-write core of :func:`bm25_delete_docs` (pushed
    IN-filter fast path for small driver-side lists) and
    :func:`bm25_delete_docs_df` (distributed joins for corpus-scale
    sets)."""
    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.generations import (  # noqa: E501
        acquire_lease,
        release_lease,
    )

    params = _read_params(spark, index_dir)
    if params is None:
        raise ValueError(f"bm25_delete_docs: no index at {index_dir}")
    _check_bm25_sidecar(
        spark, index_dir, n_buckets,
        positional=bool(params.get("positional", False)),
        fields=params.get("fields"))
    marker = f"{index_dir}/_bm25_compacting.json"
    owner = acquire_lease(spark, marker, lease_seconds,
                          payload={"deleting": True},
                          steal_legacy=steal_legacy)
    try:
        view = _index_view(spark, index_dir)
        tomb = _tombstones(spark, index_dir, view)
        # round 16: harvest (id, dl) from the doc-keyed doclens sidecar
        # when every visible tree carries one — a delete batch then
        # touches one doc-keyed row per document instead of scanning
        # every term bucket of the whole index. Indexes ingested before
        # the sidecar fall back to the postings scan (and self-heal as
        # folds rewrite their segments).
        dls = _doclens_frames(spark, index_dir, view)
        src = dls if dls is not None else _postings_frames(
            spark, index_dir, view)
        if ids is not None:
            if tomb is not None:
                already = {r["id"] for r in
                           tomb.select("id").filter(F.col("id").isin(ids))
                           .distinct().collect()}
                ids = [i for i in ids if i not in already]
                if not ids:
                    return 0
            doomed = (src.filter(F.col("id").isin(ids))
                      .groupBy("id").agg(F.first("dl").alias("dl")))
        else:
            if tomb is not None:
                ids_df = _anti_join_dels(ids_df, spark, index_dir,
                                         view, tomb.select("id"))
            doomed = (src.join(ids_df, "id", "left_semi")
                      .groupBy("id").agg(F.first("dl").alias("dl")))
        fs, _ = _hadoop_fs(spark, index_dir)
        jpath = spark._jvm.org.apache.hadoop.fs.Path
        committed, uncommitted = [], []
        troot = jpath(f"{index_dir}/tombstones")
        if fs.exists(troot):
            for st in fs.listStatus(troot):
                name = st.getPath().getName()
                if not name.startswith("del="):
                    continue
                d = int(name.split("=", 1)[1])
                if d <= view.applied_dels:
                    continue  # retired slot awaiting cleanup — never
                    # reuse
                ok = fs.exists(
                    jpath(f"{index_dir}/tombstones/del={d}/_SUCCESS"))
                (committed if ok else uncommitted).append(d)
        # reuse the lowest uncommitted slot (a crashed delete retries
        # into the same dir), else the next id — always ABOVE the
        # pointer's applied_dels watermark (ids at or below it are
        # invisible by definition: the watermark means "physically
        # applied"). Slot uniqueness is lease-guaranteed: no other
        # delete can run between this listing and the write below
        nxt = (min(uncommitted) if uncommitted
               else (max(committed) + 1 if committed else 0))
        nxt = max(nxt, view.applied_dels + 1)
        out = f"{index_dir}/tombstones/del={nxt}"
        if ids is not None:
            doomed = doomed.coalesce(1)  # tiny by contract
        doomed.write.mode("overwrite").parquet(out)
        if not fs.exists(jpath(f"{out}/_SUCCESS")):
            raise ValueError(
                f"bm25_delete_docs: the committer wrote {out} WITHOUT "
                f"a _SUCCESS marker — readers gate tombstone "
                f"visibility on it. Set mapreduce.fileoutputcommitter."
                f"marksuccessfuljobs=true and re-run")
        n = spark.read.parquet(out).count()
        if n == 0:
            # none of the ids exist in the index — retract the empty
            # batch
            fs.delete(jpath(out), True)
        return n
    finally:
        release_lease(spark, marker, owner)


def delete_dedup_losers(spark: SparkSession, labels: DataFrame,
                        bm25_index_dir: str | None = None,
                        ivf_index_dir: str | None = None,
                        id_col: str = "id",
                        component_col: str = "component",
                        n_buckets: int = 64) -> dict:
    """The dedup→deletion bridge — the pipeline step the tombstones
    exist for: ``connected_components`` (operators/dedup.py) labels
    every document with its duplicate group's canonical (minimum)
    member id; every id that is NOT its own component is a LOSER the
    keep-one policy discards. This collects the losers and tombstones
    them out of the persisted BM25 and/or IVF indexes
    (:func:`bm25_delete_docs` / ann_stream.ivf_delete_vecs), so
    dedup-after-ingest actually removes the duplicates from SEARCH —
    the gap an append-only index cannot close. Returns
    ``{"losers": n, "bm25_deleted": …, "ivf_deleted": …}`` (the
    deleted counts can be lower: ids already tombstoned or never
    indexed are no-ops, so re-running after adding batches is safe).

    The loser id set stays DISTRIBUTED end to end — it flows through
    :func:`bm25_delete_docs_df` / ``ann_stream.ivf_delete_vecs_df``
    as a DataFrame (no driver-side collect), so mass dedup of a
    near-dup-heavy crawl whose losers number in the hundreds of
    millions still deletes in one shuffle job per index; search-side
    tombstone anti-joins switch from broadcast to shuffle once the
    del batches outgrow the autoBroadcastJoinThreshold. The only
    driver-side number is the loser COUNT in the return value. A
    corpus that is MOSTLY duplicates is still better rebuilt from the
    keep-one survivors than deleted down (less tombstone mass for
    every later search to subtract)."""
    losers = (labels.filter(F.col(id_col) != F.col(component_col))
              .select(F.col(id_col).alias("id")).distinct())
    out = {"losers": losers.count()}
    if bm25_index_dir is not None:
        out["bm25_deleted"] = bm25_delete_docs_df(
            spark, bm25_index_dir, losers, n_buckets=n_buckets)
    if ivf_index_dir is not None:
        from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (  # noqa: E501
            ivf_delete_vecs_df,
        )

        out["ivf_deleted"] = ivf_delete_vecs_df(spark, ivf_index_dir,
                                                losers)
    return out


# --- generational compaction ----------------------------------------------


def compact_bm25_index(spark: SparkSession, index_dir: str,
                       n_buckets: int = 64,
                       target_partitions: int | None = None,
                       retain_old: bool = False,
                       full: bool = False, max_segments: int = 8,
                       lease_seconds: float = 3600.0,
                       max_batch: int | None = None,
                       steal_legacy: bool = False) -> int:
    """Fold the per-batch posting/stats directories into the
    consolidated generation tree, then flip the one-file read pointer —
    the small-files maintenance job a long-running ingest stream needs,
    without taking the index offline for reads OR rewriting the whole
    index per run. Returns the number of batch partitions folded (0 =
    nothing to do, or a resumed run that only had to finish a previous
    fold's flip/cleanup).

    **Tiered (segmented) folds — no fold is ever O(index) unless
    asked for.** A generation holds multiple SEGMENT trees
    (``gen=<g>/postings/seg=<s>/bucket=…`` plus one stats row per
    segment). The default fold is MINOR: it merges ONLY the unfolded
    batch dirs into one NEW segment of the current generation — the
    existing segments are never read or rewritten, so fold bytes track
    the new batches' bytes, not the index (SCALE.md's foldbytes probe
    measures it). Once the segment count would exceed ``max_segments``
    the fold turns TIERED (size-tiered merging, the LSM convention):
    it merges the smallest half of the existing segments — by on-disk
    byte size, the classic merge-candidate policy — together with the
    batch dirs into one new segment of the SAME generation; the large
    segments are never touched, so fold cost tracks the small tier,
    not the index (with the count capped at a constant ``k`` segments
    this is the theoretically optimal ladder: amortized write
    amplification grows only as N^(1/k), vs a full rewrite every
    crossing before). A MAJOR fold — ``full=True`` only, or forced as
    the migration when the index still has the pre-segment flat
    layout — merges all segments plus the batch dirs into ``seg=0`` of
    generation ``g+1``, physically APPLIES the tombstones
    (:func:`bm25_delete_docs`) and retires their del dirs; tiered and
    minor folds leave tombstones logical (a partial merge cannot apply
    a tombstone whose postings may also live in an untouched segment
    without splitting its stats correction). Search unions the
    pointer's segment list exactly like it unions batch dirs, so
    serving cost grows by one directory per segment, bounded by
    ``max_segments``.

    Read transparency: searches resolve ``_bm25_generation.json`` once
    and then read exactly the segment/batch trees it names — trees
    this job only ever ADDS alongside (a fold writes a segment no
    pointer names yet) until the pointer atomically flips, after which
    the superseded trees are deleted. A search that resolved the OLD
    pointer and is still scanning when the deletes land fails loudly
    (missing files), never silently wrong; pass ``retain_old=True`` to
    defer all deletion to the NEXT compaction (the grace-period
    pattern) if in-flight queries may outlive a fold. Ingest is
    transparent too for FRESH batches: once the fold publishes its
    snapshot (``folding_through`` in the ``_bm25_compacting.json``
    marker), only batch ids at or below the snapshot refuse (a rewrite
    there would race the fold's scan of that very directory); higher
    ids land normally, stay visible through the flip (the new fence is
    the snapshot), and fold next time.

    **Single-compactor lease** (streaming/generations.py): the marker
    carries an owner token and an expiring deadline — a second
    compactor REFUSES while the lease is live, may take over only
    after expiry (resuming the dead fold's work through the normal
    crash-recovery path below), and every holder re-verifies ownership
    immediately before its pointer flip, so at most one fold ever
    commits even if two acquired an expired lease's window.

    Crash safety — duplicated postings would DOUBLE a term's tf and
    df, so every window re-runs to a consistent state, and NOTHING is
    deleted before the fold is durably complete:

    1. lease acquired (ingest replays fenced once the snapshot
       publishes);
    2. fold written to an OWNER-UNIQUE staging dir
       (``_stage_seg=<ts>_<owner>`` — generations.staging_path), then
       PROMOTED (renamed) to its target segment only after a fresh
       ownership check, so a zombie fold whose lease expired mid-write
       can never land task files inside the directory a takeover run
       will flip (its stage dir is garbage the next holder sweeps);
       the promoted segment is still invisible — no pointer names it;
    3. ``gen=<tg>/_manifest_seg=<ts>.json`` written LAST (behind one
       more ownership check) records the complete post-flip pointer
       state; its existence marks the fold complete;
    4. pointer flip (one-file overwrite — THE commit point);
    5. delete superseded trees (stats side first so a batch's
       visibility drops before its data does);
    6. lease released.

    Re-running this job resumes from any crash: a complete target
    manifest ⇒ flip + cleanup only (the fold is never recomputed from
    possibly-deleted inputs); a manifest-less partial target ⇒ deleted
    and refolded from the intact inputs (no delete has happened);
    leftovers below the pointer ⇒ cleanup. The recorded
    ``max_folded_batch`` is the replay fence: :func:`bm25_index_batch`
    refuses any ``batch_id`` at or below it. Quiesce the INGEST stream
    before compacting (checkpoint committed) so post-fold replays fail
    loudly instead of doubling df; searches need no quiescing.

    Output sizing: with ``target_partitions=None`` (default) the fold
    sizes itself from the INPUT byte total — for a MINOR fold that is
    the new batches' bytes only — one output file per bucket while the
    average bucket fits ``_COMPACT_TARGET_BYTES`` (~128 MB),
    hash-splitting within buckets beyond that (what makes POSITIONAL
    indexes safe to compact: their wider rows earn proportionally more
    splits). Pass ``target_partitions`` to pin the shuffle width
    explicitly instead.

    ``max_batch`` bounds the fold to batch ids AT OR BELOW it — the
    key that makes IN-STREAM auto-compaction replay-safe
    (:func:`run_bm25_index_stream` with ``compact_every``): the
    stream's CURRENT batch may be replayed after a restart (its
    checkpoint not yet committed), so the in-stream fold passes
    ``max_batch=batch_id-1`` and the replay stays above the new
    fence. Quiescing is only required for batches the fold actually
    covers."""
    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.generations import (  # noqa: E501
        _read_json_sidecar,
        _write_json_sidecar,
        acquire_lease,
        check_lease,
        promote_staged,
        refresh_lease,
        release_lease,
        staging_path,
        sweep_staging,
    )

    params = _read_params(spark, index_dir)
    if params is None:
        raise ValueError(f"compact_bm25_index: no index at {index_dir}")
    _check_bm25_sidecar(spark, index_dir, n_buckets,
                        positional=bool(params.get("positional", False)),
                        fields=params.get("fields"))
    fs, _ = _hadoop_fs(spark, index_dir)
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    marker = f"{index_dir}/_bm25_compacting.json"
    owner = acquire_lease(spark, marker, lease_seconds,
                          payload={"compacting": True},
                          steal_legacy=steal_legacy)

    def _done(n: int) -> int:
        release_lease(spark, marker, owner)
        return n

    gen, segments, fence, applied, snap = _pointer(spark, index_dir)

    # resume a crashed fold that already completed its write: the
    # legacy (pre-segment) single-tree manifest first, then the two
    # segmented candidates — the pending minor/tiered (next segment of
    # this generation) and the pending major (seg 0 of the next
    # generation)
    man = _read_json_sidecar(spark,
                             f"{index_dir}/gen={gen + 1}/_manifest.json")
    if man is not None:
        state = {"generation": gen + 1,
                 "max_folded_batch": int(man["max_folded_batch"])}
        check_lease(spark, marker, owner)
        _flip(spark, index_dir, state)
        if not retain_old:
            _cleanup(spark, index_dir, state)
        return _done(0)
    candidates = []
    if segments is not None:
        candidates.append((gen, (max(segments) + 1) if segments else 0))
    candidates.append((gen + 1 if gen >= 0 else 0, 0))
    for tg, ts in candidates:
        man = _read_json_sidecar(
            spark, f"{index_dir}/gen={tg}/_manifest_seg={ts}.json")
        if man is not None:
            state = {k: man[k] for k in
                     ("generation", "segments", "max_folded_batch",
                      "applied_dels")}
            state["seg_stats"] = man.get("seg_stats")
            check_lease(spark, marker, owner)
            _flip(spark, index_dir, state)
            if not retain_old:
                _cleanup(spark, index_dir, state)
            return _done(0)
        # a fold crashed mid-write (target tree, no manifest): no flip
        # => no delete ever ran — drop the partial output and refold
        # from the intact inputs
        if tg != gen:
            if fs.exists(jpath(f"{index_dir}/gen={tg}")):
                fs.delete(jpath(f"{index_dir}/gen={tg}"), True)
        else:
            for side in ("postings", "stats", "doclens"):
                p = jpath(f"{index_dir}/gen={tg}/{side}/seg={ts}")
                if fs.exists(p):
                    fs.delete(p, True)
    # dead fold attempts that never promoted: owner-unique _stage_*
    # dirs under either candidate generation's postings/stats parents
    sweep_staging(spark,
                  *[f"{index_dir}/gen={tg}/{side}"
                    for tg, _ts in candidates
                    for side in ("postings", "stats", "doclens")])
    if not retain_old:
        # leftovers of an EARLIER completed compaction whose cleanup
        # crashed (or ran with retain_old): everything below the
        # current pointer is superseded
        _cleanup(spark, index_dir,
                 {"generation": gen, "segments": segments,
                  "max_folded_batch": fence, "applied_dels": applied})

    vis = _visible_batch_ids(spark, index_dir, gen, fence)
    if max_batch is not None:
        vis = [i for i in vis if i <= max_batch]
    dels = _visible_del_ids(spark, index_dir, applied)
    major = full or gen < 0 or segments is None
    tiered = (not major) and bool(segments) \
        and len(segments) + 1 > max_segments
    if major:
        # never a gratuitous rewrite: a major no-ops when there is
        # nothing at all to read, and (without full=True) when there
        # is nothing NEW — no batches and no pending deletes
        if gen < 0 and not vis:
            return _done(0)
        if not full and not vis and not dels:
            return _done(0)
    elif not vis:
        return _done(0)
    new_fence = max([fence] + [i for i in vis if i >= 0])
    # stranded half-commits: a batch whose ingest crashed between the
    # posting write and the stats commit is INVISIBLE (by design) — but
    # if its id falls inside this fold's range, the flip would fence it
    # as "already folded" and the cleanup would delete its postings:
    # silent permanent loss of a batch that was never folded. Refuse
    # loudly instead; the operator replays the batch (committing it) or
    # deletes its postings dir, then re-runs the compaction.
    proot = jpath(f"{index_dir}/postings")
    posting_ids = [
        int(st.getPath().getName().split("=", 1)[1])
        for st in (fs.listStatus(proot) if fs.exists(proot) else [])
        if st.getPath().getName().startswith("batch=")]
    stranded = sorted(i for i in posting_ids
                      if fence < i <= new_fence and i not in set(vis))
    if stranded:
        release_lease(spark, marker, owner)
        raise ValueError(
            f"compact_bm25_index: batch(es) {stranded} at {index_dir} "
            f"have postings but no committed stats (an ingest crashed "
            f"between its two writes) and fall inside this fold's "
            f"range — folding would fence them unfolded. Replay each "
            f"batch (bm25_index_batch commits it) or delete its "
            f"postings/batch=<id> dir, then re-run the compaction")
    # publish the fold's snapshot: ingest of batch ids ABOVE it may now
    # proceed concurrently (the fold never reads them and the flip's
    # fence won't cover them); ids at or below it keep refusing
    refresh_lease(spark, marker, owner, lease_seconds,
                  payload={"compacting": True,
                           "folding_through": new_fence})
    import math

    merged: list[int] = []
    if major:
        tg, ts = (gen + 1 if gen >= 0 else 0), 0
        state = {"generation": tg, "segments": [0],
                 "max_folded_batch": new_fence,
                 "applied_dels": max([applied] + dels)}
        src_view = _IndexView(gen, segments, fence, applied, vis, dels,
                              snap)
        src = _postings_frames(spark, index_dir, src_view)
        tomb = _tombstones(spark, index_dir, src_view)
        if tomb is not None:
            # the physical apply: tombstoned docs drop out of the new
            # generation; the folded stats below already subtract them
            src = _anti_join_dels(src, spark, index_dir, src_view,
                                  tomb.select("id"))
        in_paths = []
        if gen >= 0:
            if segments is None:
                in_paths.append(f"{index_dir}/gen={gen}/postings")
            else:
                in_paths += [f"{index_dir}/gen={gen}/postings/seg={s}"
                             for s in segments]
    else:
        tg, ts = gen, (max(segments) + 1) if segments else 0
        if tiered:
            # size-tiered merge candidates: the smallest HALF of the
            # existing segments by on-disk bytes (ties by id) merge
            # with the batch dirs into the one new segment — the large
            # half is never read or rewritten, so no fold is O(index);
            # the max() guard keeps the post-fold count legal even if
            # a hand-edited pointer exceeds max_segments
            sizes = {s: fs.getContentSummary(jpath(
                f"{index_dir}/gen={gen}/postings/seg={s}")).getLength()
                for s in segments}
            order = sorted(segments, key=lambda s: (sizes[s], s))
            m = max(len(segments) + 1 - max_segments,
                    math.ceil(len(segments) / 2))
            merged = sorted(order[:m])
        keep = [s for s in segments if s not in set(merged)]
        state = {"generation": gen, "segments": sorted(keep + [ts]),
                 "max_folded_batch": new_fence,
                 "applied_dels": applied}
        # MINOR: sources are the batch dirs ONLY; TIERED adds the
        # merge candidates. Either way the surviving segments are
        # never read, and tombstones stay logical (they keep
        # anti-joining at read time until a FULL fold applies them —
        # a partial merge can't apply a tombstone whose postings may
        # also live in an untouched segment without splitting its
        # stats correction)
        src_view = _IndexView(gen, merged, fence, applied, vis, [],
                              snap)
        src = _postings_frames(spark, index_dir, src_view)
        in_paths = [f"{index_dir}/gen={gen}/postings/seg={s}"
                    for s in merged]
    in_paths += [f"{index_dir}/postings/batch={i}" for i in vis]
    if target_partitions is not None:
        src = src.repartition(target_partitions, F.col("bucket"))
    else:
        # auto-size the fold output from the INPUT bytes (so positional
        # indexes, whose positions arrays make rows several times
        # wider, automatically get more splits than flat ones at the
        # same doc count): one file per bucket while a bucket fits
        # ~128 MB, hash-split WITHIN buckets beyond that — search
        # pruning stays directory-level either way
        total = 0
        for p in in_paths:
            total += fs.getContentSummary(jpath(p)).getLength()
        splits = max(1, math.ceil(
            total / n_buckets / _COMPACT_TARGET_BYTES))
        if splits == 1:
            src = src.repartition(n_buckets, F.col("bucket"))
        else:
            src = src.repartition(
                n_buckets * splits, F.col("bucket"),
                F.pmod(F.xxhash64(F.col("id")), F.lit(splits)))
    # the new segment's one additive stats row, collected once (one
    # row — bounded) so the pointer's seg_stats snapshot can carry it
    srow = (_read_index_stats(spark, index_dir, src_view)
            .select("n_docs", "sum_dl").head())
    seg_n, seg_dl = int(srow["n_docs"] or 0), int(srow["sum_dl"] or 0)
    # per-segment stats snapshot for the flip state: survivors from
    # the old pointer's snapshot when present (else one tiny parquet
    # read each — the one-time migration for pre-snapshot pointers),
    # plus the new segment's fresh row
    seg_snapshot: dict[int, tuple[int, int]] = {}
    for s in state["segments"]:
        if s == ts:
            seg_snapshot[s] = (seg_n, seg_dl)
        elif snap is not None and s in snap:
            seg_snapshot[s] = snap[s]
        else:
            r = (spark.read.parquet(f"{index_dir}/gen={gen}/stats/seg={s}")
                 .agg(F.sum("n_docs"), F.sum("sum_dl")).head())
            seg_snapshot[s] = (int(r[0] or 0), int(r[1] or 0))
    state["seg_stats"] = {str(s): [v[0], v[1]]
                          for s, v in seg_snapshot.items()}
    # bulk output lands in owner-unique staging, promoted only after a
    # fresh ownership check — a zombie that lost the lease mid-write
    # aborts at promote and its stage dirs are swept by the next holder
    stage_p = staging_path(f"{index_dir}/gen={tg}/postings", ts, owner)
    stage_s = staging_path(f"{index_dir}/gen={tg}/stats", ts, owner)
    stage_d = staging_path(f"{index_dir}/gen={tg}/doclens", ts, owner)
    (src.write.mode("overwrite").partitionBy("bucket").parquet(stage_p))
    (spark.createDataFrame([(seg_n, seg_dl)], "n_docs long, sum_dl long")
     .coalesce(1).write.mode("overwrite").parquet(stage_s))
    # the segment's doc-keyed (id, dl) sidecar (round 16): derived from
    # the STAGED postings just written — a 2-column pruned read of
    # exactly the fold's output, so a major fold's physical tombstone
    # apply is reflected for free, and a legacy index (no batch
    # sidecars) self-heals as folds rewrite segments
    (spark.read.parquet(stage_p)
     .groupBy("id").agg(F.first("dl").alias("dl"))
     .write.mode("overwrite").parquet(stage_d))
    promote_staged(spark, marker, owner, [
        (stage_p, f"{index_dir}/gen={tg}/postings/seg={ts}"),
        (stage_s, f"{index_dir}/gen={tg}/stats/seg={ts}"),
        (stage_d, f"{index_dir}/gen={tg}/doclens/seg={ts}")])
    check_lease(spark, marker, owner)
    _write_json_sidecar(
        spark, f"{index_dir}/gen={tg}/_manifest_seg={ts}.json",
        {**state, "n_folded": len(vis), "merged_segments": merged})
    check_lease(spark, marker, owner)
    _flip(spark, index_dir, state)
    if not retain_old:
        _cleanup(spark, index_dir, state)
    return _done(len(vis))


def _flip(spark: SparkSession, index_dir: str, state: dict) -> None:
    """The compaction's commit point: overwrite the one-file read
    pointer with the manifest's recorded state. A reader that races
    the overwrite on a non-atomic filesystem sees a torn JSON and
    fails loudly (parse error), never a stale-generation/new-fence
    mix — all fields travel in the one write. A legacy (pre-segment)
    resume passes a state without ``segments``: the pointer keeps the
    legacy form so readers keep treating that tree as flat."""
    from harvesting_extract_to_ttl_service_spark.streaming.generations import (  # noqa: E501
        _write_json_sidecar,
    )

    ptr = {"generation": int(state["generation"]),
           "max_folded_batch": int(state["max_folded_batch"])}
    if state.get("segments") is not None:
        ptr["segments"] = [int(s) for s in state["segments"]]
        ptr["applied_dels"] = int(state.get("applied_dels", -1))
        if state.get("seg_stats") is not None:
            ptr["seg_stats"] = state["seg_stats"]
    _write_json_sidecar(spark, f"{index_dir}/_bm25_generation.json", ptr)


def _cleanup(spark: SparkSession, index_dir: str, state: dict) -> None:
    """Delete everything the pointer state supersedes: generation
    trees below ``generation``; segment trees of the current
    generation the pointer doesn't name (crashed minor folds that
    never flipped — any manifest-complete segment is flipped BEFORE
    cleanup runs, so it is never garbage here); batch dirs at or below
    the fence (stats side first, so a batch's visibility drops before
    its data does — including the legacy ``batch=-1`` dir once a
    generation absorbed it); and tombstone dirs at or below
    ``applied_dels`` (their deletes are physically applied in the
    current generation). Idempotent — a crashed cleanup just
    re-runs."""
    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )

    cur_gen = int(state["generation"])
    fence = int(state["max_folded_batch"])
    segments = state.get("segments")
    applied = int(state.get("applied_dels", -1))
    fs, _ = _hadoop_fs(spark, index_dir)
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    root = jpath(index_dir)
    if fs.exists(root):
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if name.startswith("gen="):
                if int(name.split("=", 1)[1]) < cur_gen:
                    fs.delete(st.getPath(), True)
    if segments is not None and cur_gen >= 0:
        keep = {int(s) for s in segments}
        for side in ("postings", "stats", "doclens"):
            sroot = jpath(f"{index_dir}/gen={cur_gen}/{side}")
            if not fs.exists(sroot):
                continue
            for st in fs.listStatus(sroot):
                name = st.getPath().getName()
                if name.startswith("_stage_"):
                    fs.delete(st.getPath(), True)  # dead fold attempt
                elif name.startswith("seg=") \
                        and int(name.split("=", 1)[1]) not in keep:
                    fs.delete(st.getPath(), True)
        # manifests of merged-away segments: spent (a manifest is only
        # read between its write and its flip, and future fold targets
        # always use a fresh higher id) — plain litter
        groot = jpath(f"{index_dir}/gen={cur_gen}")
        if fs.exists(groot):
            for st in fs.listStatus(groot):
                name = st.getPath().getName()
                if name.startswith("_manifest_seg=") \
                        and int(name[len("_manifest_seg="):]
                                .split(".", 1)[0]) not in keep:
                    fs.delete(st.getPath(), False)
    stale = set()
    for side in ("stats", "postings"):
        sroot = jpath(f"{index_dir}/{side}")
        if not fs.exists(sroot):
            continue
        for st in fs.listStatus(sroot):
            name = st.getPath().getName()
            if not name.startswith("batch="):
                continue
            i = int(name.split("=", 1)[1])
            if i <= fence and (i >= 0 or cur_gen >= 0):
                stale.add(i)
    for i in sorted(stale):
        for side in ("stats", "doclens", "postings"):  # stats first:
            # visibility drops before any data side does
            p = jpath(f"{index_dir}/{side}/batch={i}")
            if fs.exists(p):
                fs.delete(p, True)
    troot = jpath(f"{index_dir}/tombstones")
    if fs.exists(troot):
        for st in fs.listStatus(troot):
            name = st.getPath().getName()
            if name.startswith("del=") \
                    and int(name.split("=", 1)[1]) <= applied:
                fs.delete(st.getPath(), True)


# --- phrase + hybrid over the stored index --------------------------------


def phrase_search(spark: SparkSession, index_dir: str,
                  phrase: list[str], k: int = 10,
                  k1: float = DEFAULT_K1, b: float = DEFAULT_B,
                  n_buckets: int = 64,
                  id_col: str = "doc_id") -> DataFrame:
    """Exact-phrase BM25 top-k over a POSITIONAL index (built with
    ``bm25_index_batch(positional=True)``): bucket-pruned scan of the
    phrase words' posting lists, the shared shifted-offset intersection
    (operators/retrieval.phrase_intersect — rarest word first, its df
    read from the same pruned postings), the shared one-unit scoring
    tail (score_phrase_counts) — so stored results equal phrase_topk
    over the ingested documents row for row. The dfs that order the
    chain are computed AFTER the tombstone anti-join
    (:func:`_read_pruned_postings` applies it before this function
    ever aggregates), so deletions inform the join order too — stale
    df would only reorder joins (result-safe), but the pin removes
    even that drift (tests assert the post-delete dfs). A flat index
    refuses up front: without positions a phrase query would silently
    degrade to an AND query."""
    if not _sidecar_positional(spark, index_dir):
        raise ValueError(
            f"phrase_search: index at {index_dir} is not positional — "
            f"rebuild it with bm25_index_batch(positional=True); a "
            f"flat index cannot answer phrase queries")
    _check_bm25_sidecar(spark, index_dir, n_buckets, positional=True)
    words = clean_phrase(phrase)
    view = _index_view(spark, index_dir)
    pp = _read_pruned_postings(spark, index_dir, sorted(set(words)),
                               n_buckets, view)
    pc = phrase_intersect(pp, words)
    return score_phrase_counts(pc,
                               _read_index_stats(spark, index_dir, view),
                               k, k1, b, id_col)


def bm25_index_stats(spark: SparkSession, index_dir: str) -> dict:
    """Operational snapshot of a persisted index — the monitoring twin
    of ann_stream's drift report: the read pointer (generation, its
    segment list, replay fence, applied-tombstone watermark), the
    committed-but-unfolded batch ids and pending tombstone batch ids
    (their counts are the two maintenance-pressure signals: each is
    another directory every search must union/anti-join — a minor fold
    clears batches, a MAJOR fold clears tombstones), the in-progress
    compaction marker if any, the index identity (positional / fields
    / buckets), and the exact LOGICAL corpus totals (N, Σdl, avgdl —
    tombstone corrections applied) from the additive stats rows. One
    driver-side listing + one one-row aggregate — safe to poll; never
    scans postings."""
    params = _read_params(spark, index_dir)
    if params is None:
        raise ValueError(f"bm25_index_stats: no index at {index_dir}")
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _read_json_sidecar,
    )

    view = _index_view(spark, index_dir)
    marker = _read_json_sidecar(spark,
                                f"{index_dir}/_bm25_compacting.json")
    out = {"generation": view.gen,
           "segments": view.segments,
           "n_segments": (len(view.segments)
                          if view.segments is not None
                          else (1 if view.gen >= 0 else 0)),
           "max_folded_batch": view.fence,
           "unfolded_batches": view.vis, "n_unfolded": len(view.vis),
           "pending_del_batches": view.dels,
           # the size signal for scheduling a full=True fold (the only
           # fold that applies tombstones physically) and the same
           # byte total the search anti-join switches broadcast/shuffle
           # on
           "pending_del_bytes": _dels_bytes(spark, index_dir,
                                            view.dels),
           "applied_dels": view.applied_dels,
           "compacting": bool(marker) and not (marker or {}).get(
               "deleting"),
           "deleting": bool((marker or {}).get("deleting")),
           "folding_through": (marker or {}).get("folding_through"),
           "n_buckets": params.get("n_buckets"),
           "positional": bool(params.get("positional", False)),
           "fields": params.get("fields")}
    if view.gen >= 0 or view.vis:
        row = _read_index_stats(spark, index_dir, view).head()
        out.update(n_docs=row["n_docs"], sum_dl=row["sum_dl"],
                   avgdl=row["avgdl"])
    else:
        out.update(n_docs=0, sum_dl=0, avgdl=None)
    return out


def proximity_search(spark: SparkSession, index_dir: str,
                     terms_: list[str], window: int, k: int = 10,
                     k1: float = DEFAULT_K1, b: float = DEFAULT_B,
                     n_buckets: int = 64,
                     id_col: str = "doc_id") -> DataFrame:
    """NEAR-operator BM25 top-k over a POSITIONAL index: bucket-pruned
    scan of the query terms' posting lists, the shared anchor-window
    conjunction (operators/retrieval.proximity_intersect — other terms
    rarest-first), the shared one-unit scoring tail — so stored
    results equal proximity_topk over the ingested documents row for
    row. As in :func:`phrase_search`, the rarest-first ordering reads
    df from the tombstone-anti-joined postings (the anti-join sits
    below the df aggregation). A flat index refuses up front, exactly
    like :func:`phrase_search`."""
    if not _sidecar_positional(spark, index_dir):
        raise ValueError(
            f"proximity_search: index at {index_dir} is not positional"
            f" — rebuild it with bm25_index_batch(positional=True); a "
            f"flat index cannot answer proximity queries")
    _check_bm25_sidecar(spark, index_dir, n_buckets, positional=True)
    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        clean_prox_terms,
        proximity_intersect,
    )

    words = clean_prox_terms(terms_)
    view = _index_view(spark, index_dir)
    pp = _read_pruned_postings(spark, index_dir, sorted(set(words)),
                               n_buckets, view)
    pc = proximity_intersect(pp, words, window)
    return score_phrase_counts(pc,
                               _read_index_stats(spark, index_dir, view),
                               k, k1, b, id_col, tf_name="prox_tf")


def hybrid_search(spark: SparkSession, bm25_index_dir: str,
                  ivf_index_dir: str, query_terms: list[str],
                  query_vec: list[float],
                  centroids: list[list[float]],
                  k: int = 10, n_candidates: int = 50,
                  n_probe: int = 2, rrf_k: int = 60,
                  k1: float = DEFAULT_K1, b: float = DEFAULT_B,
                  n_buckets: int = 64,
                  id_col: str = "doc_id") -> DataFrame:
    """Hybrid lexical+semantic retrieval over PERSISTED indexes — the
    at-scale deployment shape of operators/retrieval.hybrid_topk:
    :func:`bm25_search` top-``n_candidates`` over the stored posting
    index (bucket-pruned, term-pushed) fused by reciprocal rank with
    ``ann_stream.ivf_search`` top-``n_candidates`` over the stored IVF
    index (cell-pruned; document ids must agree between the two
    stores) → ``(id_col, rank, n_sources, rrf_score)``. Fusion
    consumes only (id, rank), so per-query I/O is both indexes'
    pruned subtrees — neither corpus is rescanned. With ``n_probe`` =
    the full cell count the vector side is exact and results match the
    ad-hoc ``hybrid_topk`` row for row (the parity the tests pin);
    smaller ``n_probe`` trades recall for scan-bytes exactly as
    ivf_search documents."""
    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        _ranked,
        reciprocal_rank_fusion,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        ivf_search,
    )

    lex = bm25_search(spark, bm25_index_dir, query_terms,
                      k=n_candidates, k1=k1, b=b, n_buckets=n_buckets,
                      id_col=id_col)
    sem = ivf_search(spark, ivf_index_dir, query_vec, centroids,
                     k=n_candidates, n_probe=n_probe, id_col="vec_id")
    sem = _ranked(sem, n_candidates,
                  [F.col("cos_sim").desc(), F.col("vec_id")]).select(
        F.col("vec_id").alias(id_col), "rank")
    fused = reciprocal_rank_fusion(
        [("lex", lex.select(id_col, "rank")), ("vec", sem)],
        rrf_k=rrf_k, id_col=id_col)
    top = (fused.orderBy(F.col("rrf_score").desc(), F.col(id_col))
           .limit(k))
    return (_ranked(top, k, [F.col("rrf_score").desc(), F.col(id_col)])
            .select(id_col, "rank", "n_sources", "rrf_score"))


def hybrid_search_batch(spark: SparkSession, queries: DataFrame,
                        bm25_index_dir: str, ivf_index_dir: str,
                        centroids: list[list[float]],
                        k: int = 10, n_candidates: int = 50,
                        n_probe: int = 2, rrf_k: int = 60,
                        k1: float = DEFAULT_K1, b: float = DEFAULT_B,
                        n_buckets: int = 64,
                        qid_col: str = "query_id",
                        qtext_col: str = "text",
                        qvec_col: str = "embedding",
                        id_col: str = "doc_id") -> DataFrame:
    """Batched hybrid retrieval over the PERSISTED indexes — the
    at-scale serving shape of :func:`hybrid_search`: ONE lexical plan
    for the whole query batch (:func:`bm25_search_batch` — term-union
    bucket pruning) fused per query with ONE semantic plan
    (ann_stream.ivf_search_batch — probed-cell-union partition
    pruning) by reciprocal rank →
    ``(qid_col, id_col, rank, n_sources, rrf_score)``. ``queries``
    carries BOTH the text and the embedding column (ids must agree
    between the two stores). Per query the rows equal
    :func:`hybrid_search` with the same parameters (the parity the
    tests pin): both sides' batched operators are row-identical to
    their single-query twins, and the per-(query, id) RRF fold is the
    same pinned source-ordered sum."""
    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        _ranked,
        reciprocal_rank_fusion,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        ivf_search_batch,
    )

    lex = bm25_search_batch(
        spark, queries, bm25_index_dir, k=n_candidates, k1=k1, b=b,
        n_buckets=n_buckets, qid_col=qid_col, qtext_col=qtext_col,
        id_col=id_col)
    sem = ivf_search_batch(
        spark, ivf_index_dir, queries, centroids, k=n_candidates,
        n_probe=n_probe, q_vec_col=qvec_col, q_id_col=qid_col,
        id_col="vec_id")
    fused = reciprocal_rank_fusion(
        [("lex", lex.select(qid_col, id_col, "rank")),
         ("vec", sem.select(F.col(qid_col),
                            F.col("vec_id").alias(id_col), "rank"))],
        rrf_k=rrf_k, id_col=id_col, qid_col=qid_col)
    return (_ranked(fused, k,
                    [F.col("rrf_score").desc(), F.col(id_col)],
                    [qid_col])
            .select(qid_col, id_col, "rank", "n_sources",
                    "rrf_score"))
