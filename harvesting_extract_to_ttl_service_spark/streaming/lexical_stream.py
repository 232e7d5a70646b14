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
    <index_dir>/gen=<g>/postings/bucket=…   (consolidated generation g)
    <index_dir>/gen=<g>/stats/…
    <index_dir>/gen=<g>/_manifest.json      (written LAST = gen complete)
    <index_dir>/_bm25_params.json           (n_buckets, tokenizer, …)
    <index_dir>/_bm25_generation.json       ({generation, max_folded_batch}
                                             — THE atomic read pointer)
    <index_dir>/_bm25_compacting.json       (marker: refuses replays of
                                             in-fold batch ids and a
                                             second compactor; fresh
                                             ingest and search are
                                             unaffected)

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
* **Compaction is read-transparent** (generation scheme): the fold
  writes a consolidated tree under ``gen=<g+1>`` while searches keep
  reading ``gen=<g>`` + the unfolded batch dirs — none of which the
  fold touches — then flips the one-file ``_bm25_generation.json``
  pointer and only afterwards deletes the superseded trees. A search
  resolves the pointer once and reads a consistent snapshot throughout.

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
    bm25f_corpus_stats,
    bm25f_postings,
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


def _pointer(spark: SparkSession, index_dir: str) -> tuple[int, int]:
    """(generation, max_folded_batch): the index's one-file read
    pointer. Generation −1 = no consolidated tree (all data lives in
    batch dirs). Falls back to the pre-generation
    ``_bm25_compaction.json`` fence for indexes last compacted by the
    legacy batch=-1 fold."""
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _read_json_sidecar,
    )

    ptr = _read_json_sidecar(spark, f"{index_dir}/_bm25_generation.json")
    if ptr is not None:
        return int(ptr["generation"]), int(ptr["max_folded_batch"])
    legacy = _read_json_sidecar(spark,
                                f"{index_dir}/_bm25_compaction.json")
    if legacy is not None:
        return -1, int(legacy.get("max_folded_batch", -1))
    return -1, -1


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


def _index_view(spark: SparkSession,
                index_dir: str) -> tuple[int, int, list[int]]:
    """Resolve the pointer and visible batch set ONCE per search, so
    the postings read and the stats read of one query can never
    straddle a concurrent pointer flip."""
    gen, fence = _pointer(spark, index_dir)
    return gen, fence, _visible_batch_ids(spark, index_dir, gen, fence)


def _postings_frames(spark: SparkSession, index_dir: str,
                     gen: int, vis: list[int]) -> DataFrame:
    """Union of the readable posting trees: the consolidated
    ``gen=<g>/postings`` (if any) plus the visible unfolded batch dirs,
    read by EXPLICIT path so partition discovery never touches a
    half-committed or superseded directory. Both sides keep ``bucket``
    as a directory-level partition column under their own basePath."""
    frames = []
    if gen >= 0:
        p = f"{index_dir}/gen={gen}/postings"
        frames.append(spark.read.option("basePath", p).parquet(p))
    if vis:
        root = f"{index_dir}/postings"
        paths = [f"{root}/batch={i}" for i in vis]
        frames.append(spark.read.option("basePath", root)
                      .parquet(*paths).drop("batch"))
    if not frames:
        raise ValueError(
            f"bm25 index at {index_dir} has no readable data (no "
            f"generation tree and no committed batches)")
    out = frames[0]
    for f2 in frames[1:]:
        out = out.unionByName(f2)
    return out


def _read_pruned_postings(spark: SparkSession, index_dir: str,
                          terms_: list[str], n_buckets: int,
                          view: tuple[int, int, list[int]]) -> DataFrame:
    """The index read both search paths share: bucket IN-list from the
    driver-side term hashes (directory pruning on every tree in the
    view), then the term IN-list (parquet pushed filter)."""
    gen, _fence, vis = view
    ps = _postings_frames(spark, index_dir, gen, vis)
    buckets = sorted({term_bucket_py(t, n_buckets) for t in terms_})
    return (ps.filter(F.col("bucket").isin(buckets))
            .filter(F.col("term").isin(terms_)))


def _read_index_stats(spark: SparkSession, index_dir: str,
                      view: tuple[int, int, list[int]]) -> DataFrame:
    """One-row N/avgdl from the exact additive sums of the generation
    stats row plus the visible per-batch stats rows — the same view the
    postings read resolved, so the two can never disagree about which
    batches exist."""
    gen, _fence, vis = view
    frames = []
    if gen >= 0:
        frames.append(spark.read.parquet(f"{index_dir}/gen={gen}/stats")
                      .select("n_docs", "sum_dl"))
    if vis:
        root = f"{index_dir}/stats"
        frames.append(spark.read.option("basePath", root)
                      .parquet(*[f"{root}/batch={i}" for i in vis])
                      .select("n_docs", "sum_dl"))
    if not frames:
        raise ValueError(
            f"bm25 index at {index_dir} has no readable stats")
    out = frames[0]
    for f2 in frames[1:]:
        out = out.unionByName(f2)
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
        # (the fold is still listing) refuses conservatively.
        through = marker.get("folding_through")
        if through is None or batch_id <= through:
            raise ValueError(
                f"bm25_index_batch: index at {index_dir} is compacting"
                f" through batch {through} — batch {batch_id} is (or "
                f"may be) part of the running fold, and rewriting it "
                f"would race the fold's scan; re-run it after the "
                f"compaction finishes (fresh higher batch ids and all "
                f"searches are unaffected)")
    _gen, fence = _pointer(spark, index_dir)
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
    sums of the generation + visible per-batch stats rows; document
    frequency comes from the probed postings themselves. Scoring is
    operators/retrieval.score_postings — identical to the ad-hoc path
    by construction. Works on flat, positional AND BM25F indexes (the
    positions column just rides along unused; BM25F tf/dl are already
    weighted at ingest). Runs undisturbed during a compaction — the
    pointer is resolved once, and the fold never touches the trees that
    pointer names."""
    params = _read_params(spark, index_dir)
    _check_bm25_sidecar(
        spark, index_dir, n_buckets,
        positional=bool(params.get("positional")) if params else False,
        fields=params.get("fields") if params else None)
    qt = clean_query_terms(query_terms)
    view = _index_view(spark, index_dir)
    ps = _read_pruned_postings(spark, index_dir, qt, n_buckets, view)
    agg = score_postings(ps, _read_index_stats(spark, index_dir, view),
                         k1, b)
    return top_ranked(agg, k, id_col)


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
        score_query_join,
    )

    params = _read_params(spark, index_dir)
    _check_bm25_sidecar(
        spark, index_dir, n_buckets,
        positional=bool(params.get("positional")) if params else False,
        fields=params.get("fields") if params else None)
    qterms = query_terms_frame(queries, query_tf, qid_col, qtext_col)
    uniq = sorted({r["term"] for r in
                   qterms.select("term").distinct().collect()})
    view = _index_view(spark, index_dir)
    ps = _read_pruned_postings(spark, index_dir, uniq, n_buckets, view)
    stats = _read_index_stats(spark, index_dir, view)
    return score_query_join(qterms, ps, stats, k, k1, b,
                            max_df_ratio, broadcast_queries,
                            query_tf is not None, qid_col, id_col)


def run_bm25_index_stream(docs_stream: DataFrame, index_dir: str,
                          checkpoint_dir: str, n_buckets: int = 64,
                          text_col: str = "text",
                          id_col: str = "doc_id",
                          positional: bool = False,
                          field_weights: dict[str, float] | None = None):
    """Structured-Streaming ingest loop: every micro-batch lands as one
    replay-idempotent ``batch=<id>`` posting + stats pair. Exactly the
    ann_stream.run_ivf_index_stream shape — foreachBatch keyed on the
    engine's batch id, so a restarted query rewrites its in-flight batch
    byte-identically instead of duplicating it."""
    def _ingest(batch_df: DataFrame, batch_id: int) -> None:
        bm25_index_batch(batch_df, batch_id, index_dir,
                         n_buckets=n_buckets, text_col=text_col,
                         id_col=id_col, positional=positional,
                         field_weights=field_weights)

    return (docs_stream.writeStream.foreachBatch(_ingest)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start())


# --- generational compaction ----------------------------------------------


def compact_bm25_index(spark: SparkSession, index_dir: str,
                       n_buckets: int = 64,
                       target_partitions: int | None = None,
                       retain_old: bool = False) -> int:
    """Fold the per-batch posting/stats directories (plus the previous
    consolidated generation) into a NEW generation directory, then flip
    the one-file read pointer — the small-files maintenance job a
    long-running ingest stream needs, **without taking the index
    offline for reads**. Returns the number of batch partitions folded
    (0 = nothing to do, or a resumed run that only had to finish a
    previous fold's flip/cleanup).

    Read transparency: searches resolve ``_bm25_generation.json`` once
    and then read ``gen=<g>`` + the unfolded batch dirs — trees this
    job only ever ADDS alongside (the fold writes ``gen=<g+1>``, which
    no pointer names yet) until the pointer atomically flips, after
    which the superseded trees are deleted. A search that resolved the
    OLD pointer and is still scanning when the deletes land fails
    loudly (missing files), never silently wrong; pass
    ``retain_old=True`` to defer all deletion to the NEXT compaction
    (the grace-period pattern) if in-flight queries may outlive a fold.
    Ingest is transparent too for FRESH batches: once the fold
    publishes its snapshot (``folding_through`` in the
    ``_bm25_compacting.json`` marker), only batch ids at or below the
    snapshot refuse (a rewrite there would race the fold's scan of
    that very directory); higher ids land normally, stay visible
    through the flip (the new fence is the snapshot), and fold next
    time. One compactor at a time — the marker also makes a second
    concurrent compactor resume/finish the first's work rather than
    race it, but two folds genuinely running simultaneously are the
    operator's responsibility to avoid.

    Crash safety — duplicated postings would DOUBLE a term's tf and df,
    so every window re-runs to a consistent state, and NOTHING is
    deleted before the fold is durably complete:

    1. marker up (ingest fenced);
    2. fold written to ``gen=<g+1>/{postings,stats}`` — invisible,
       no pointer names it;
    3. ``gen=<g+1>/_manifest.json`` written LAST records the fold's
       replay fence; its existence marks the generation complete;
    4. pointer flip (one-file overwrite — THE commit point);
    5. delete superseded trees (old gen + folded batch dirs, stats
       side first so visibility drops before data does);
    6. marker down.

    Re-running this job resumes from any crash: a complete ``g+1``
    manifest ⇒ flip + cleanup only (the fold is never recomputed from
    possibly-deleted inputs); an incomplete ``gen=<g+1>`` ⇒ deleted
    and refolded from the intact batch dirs (no delete has happened);
    leftovers below the pointer ⇒ cleanup. The recorded
    ``max_folded_batch`` is the replay fence: :func:`bm25_index_batch`
    refuses any ``batch_id`` at or below it, because a source batch
    replayed AFTER its rows were folded would write them a second
    time. Quiesce the INGEST stream before compacting (checkpoint
    committed) so post-fold replays fail loudly instead of doubling
    df; searches need no quiescing.

    Output sizing: with ``target_partitions=None`` (default) the fold
    sizes itself from the INPUT byte total — one output file per
    bucket while the average bucket fits ``_COMPACT_TARGET_BYTES``
    (~128 MB), hash-splitting within buckets beyond that. Byte-based
    sizing is what makes POSITIONAL indexes safe to compact: their
    positions arrays make posting rows several times wider than flat
    ones at the same document count (SCALE.md's possize probe
    measures the ratio), and the split count scales with the bytes,
    not the row count. Pass ``target_partitions`` to pin the shuffle
    width explicitly instead."""
    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _read_json_sidecar,
        _write_json_sidecar,
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
    _write_json_sidecar(spark, marker, {"compacting": True})

    def _done(n: int) -> int:
        fs.delete(jpath(marker), False)
        return n

    gen, fence = _pointer(spark, index_dir)
    nxt = gen + 1
    man = _read_json_sidecar(spark,
                             f"{index_dir}/gen={nxt}/_manifest.json")
    if man is not None:
        # a previous fold completed but crashed before/while flipping
        # or cleaning up — finish its flip + cleanup, never refold
        new_fence = int(man["max_folded_batch"])
        _flip(spark, index_dir, nxt, new_fence)
        if not retain_old:
            _cleanup(spark, index_dir, nxt, new_fence)
        return _done(0)
    if fs.exists(jpath(f"{index_dir}/gen={nxt}")):
        # a fold crashed mid-write: no manifest ⇒ no flip ⇒ no delete
        # ever ran — drop the partial tree and refold from the intact
        # batch dirs
        fs.delete(jpath(f"{index_dir}/gen={nxt}"), True)
    if not retain_old:
        # leftovers of an EARLIER completed compaction whose cleanup
        # crashed (or ran with retain_old): everything below the
        # current pointer is superseded
        _cleanup(spark, index_dir, gen, fence)

    vis = _visible_batch_ids(spark, index_dir, gen, fence)
    if not vis:
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
        fs.delete(jpath(marker), False)
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
    _write_json_sidecar(spark, marker,
                        {"compacting": True,
                         "folding_through": new_fence})
    src = _postings_frames(spark, index_dir, gen, vis)
    if target_partitions is not None:
        src = src.repartition(target_partitions, F.col("bucket"))
    else:
        # auto-size the fold output from the INPUT bytes (so positional
        # indexes, whose positions arrays make rows several times
        # wider, automatically get more splits than flat ones at the
        # same doc count): one file per bucket while a bucket fits
        # ~128 MB, hash-split WITHIN buckets beyond that — search
        # pruning stays directory-level either way
        import math

        total = 0
        paths = [f"{index_dir}/gen={gen}/postings"] if gen >= 0 else []
        paths += [f"{index_dir}/postings/batch={i}" for i in vis]
        for p in paths:
            total += fs.getContentSummary(jpath(p)).getLength()
        splits = max(1, math.ceil(
            total / n_buckets / _COMPACT_TARGET_BYTES))
        if splits == 1:
            src = src.repartition(n_buckets, F.col("bucket"))
        else:
            src = src.repartition(
                n_buckets * splits, F.col("bucket"),
                F.pmod(F.xxhash64(F.col("id")), F.lit(splits)))
    (src.write.mode("overwrite").partitionBy("bucket")
     .parquet(f"{index_dir}/gen={nxt}/postings"))
    stats = _read_index_stats(spark, index_dir, (gen, fence, vis))
    (stats.select("n_docs", "sum_dl")
     .coalesce(1).write.mode("overwrite")
     .parquet(f"{index_dir}/gen={nxt}/stats"))
    _write_json_sidecar(
        spark, f"{index_dir}/gen={nxt}/_manifest.json",
        {"max_folded_batch": new_fence, "n_folded": len(vis)})
    _flip(spark, index_dir, nxt, new_fence)
    if not retain_old:
        _cleanup(spark, index_dir, nxt, new_fence)
    return _done(len(vis))


def _flip(spark: SparkSession, index_dir: str, gen: int,
          fence: int) -> None:
    """The compaction's commit point: overwrite the one-file read
    pointer. A reader that races the overwrite on a non-atomic
    filesystem sees a torn JSON and fails loudly (parse error), never
    a stale-generation/new-fence mix — both fields travel in the one
    write."""
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _write_json_sidecar,
    )

    _write_json_sidecar(spark, f"{index_dir}/_bm25_generation.json",
                        {"generation": gen, "max_folded_batch": fence})


def _cleanup(spark: SparkSession, index_dir: str, cur_gen: int,
             fence: int) -> None:
    """Delete everything the current pointer supersedes: generation
    trees below ``cur_gen`` and batch dirs at or below the fence
    (including the legacy ``batch=-1`` consolidated dir once a
    generation absorbed it). Stats side first, so a batch's visibility
    drops before its data does; idempotent, so a crashed cleanup just
    re-runs."""
    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )

    fs, _ = _hadoop_fs(spark, index_dir)
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    root = jpath(index_dir)
    if fs.exists(root):
        for st in fs.listStatus(root):
            name = st.getPath().getName()
            if name.startswith("gen="):
                if int(name.split("=", 1)[1]) < cur_gen:
                    fs.delete(st.getPath(), True)
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
        for side in ("stats", "postings"):  # stats first: visibility
            p = jpath(f"{index_dir}/{side}/batch={i}")
            if fs.exists(p):
                fs.delete(p, True)


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
    view = _index_view(spark, index_dir)
    pp = _read_pruned_postings(spark, index_dir, sorted(set(words)),
                               n_buckets, view)
    pc = phrase_intersect(pp, words)
    return score_phrase_counts(pc,
                               _read_index_stats(spark, index_dir, view),
                               k, k1, b, id_col)


def bm25_index_stats(spark: SparkSession, index_dir: str) -> dict:
    """Operational snapshot of a persisted index — the monitoring twin
    of ann_stream's drift report: the read pointer (generation, replay
    fence), the committed-but-unfolded batch ids (their COUNT is the
    compaction-pressure signal: each unfolded batch is another
    directory every search must union), the in-progress compaction
    marker if any, the index identity (positional / fields / buckets),
    and the exact corpus totals (N, Σdl, avgdl) from the additive
    stats rows. One driver-side listing + one one-row aggregate — safe
    to poll; never scans postings."""
    params = _read_params(spark, index_dir)
    if params is None:
        raise ValueError(f"bm25_index_stats: no index at {index_dir}")
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _read_json_sidecar,
    )

    gen, fence = _pointer(spark, index_dir)
    vis = _visible_batch_ids(spark, index_dir, gen, fence)
    marker = _read_json_sidecar(spark,
                                f"{index_dir}/_bm25_compacting.json")
    out = {"generation": gen, "max_folded_batch": fence,
           "unfolded_batches": vis, "n_unfolded": len(vis),
           "compacting": bool(marker),
           "folding_through": (marker or {}).get("folding_through"),
           "n_buckets": params.get("n_buckets"),
           "positional": bool(params.get("positional", False)),
           "fields": params.get("fields")}
    if gen >= 0 or vis:
        row = _read_index_stats(spark, index_dir,
                                (gen, fence, vis)).head()
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
    row. A flat index refuses up front, exactly like
    :func:`phrase_search`."""
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
