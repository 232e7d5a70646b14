"""Streaming incremental dedup — the operational loop around
`operators/dedup.minhash_band_index` / `incremental_minhash_pairs`: a
document stream deduped micro-batch by micro-batch against a growing
parquet LSH index.

Per batch:
  1. build the batch's banded signature table (the only tokenization in
     the whole loop — the corpus is never re-shingled);
  2. join it against every PREVIOUS batch's index partition → near-dup
     pairs (batch×corpus ∪ batch×batch), written per batch;
  3. append the banded table as the batch's own index partition.

Exactly-once without a transactional store: both writes go to
``<dir>/batch=<batch_id>`` with overwrite, so a replayed micro-batch
(failure before the checkpoint commit) rewrites its own partitions
byte-identically instead of duplicating them — and the index read
EXCLUDES the current batch's partition, so a replay never pairs the
batch against its own half-written signatures. This is the streaming
twin of the reference's fire-and-forget per-entry processing
(/root/reference/app.js:35-38) applied to the dedup surface: one
set-oriented job per delta of documents.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.operators.dedup import (
    incremental_minhash_pairs,
    minhash_band_index,
)
from harvesting_extract_to_ttl_service_spark.operators.materialize import (
    materialize,
)


def _check_index_params(spark: SparkSession, index_dir: str,
                        num_hashes: int, bands: int,
                        shingle_n: int) -> None:
    """MinHash-index form of :func:`_check_sidecar_params`."""
    _check_sidecar_params(
        spark, index_dir,
        {"num_hashes": num_hashes, "bands": bands, "shingle_n": shingle_n})


def _check_sidecar_params(spark: SparkSession, index_dir: str,
                          want: dict,
                          filename: str = "_lsh_params.json",
                          defaults: dict | None = None,
                          migration_notes: dict | None = None) -> None:
    """Verify (or record, on first write) an index's build parameters in
    a JSON sidecar next to the data. A parameter mismatch is
    UNDETECTABLE from the table schema — band hashes / sign buckets
    would simply cover different inputs and silently miss pairs — so the
    parameters live next to the data, like parquet's own ``_metadata``.
    Hadoop FS API: the index may live on hdfs/s3a.

    ``defaults`` backfills keys ABSENT from a stored sidecar before the
    comparison — the upgrade path for parameters added after an index
    was built, whose default value is behavior-identical to the old
    code (a pre-upgrade index must keep working at the defaults, not
    hard-fail every batch).

    ``migration_notes`` maps a sidecar key to a remediation sentence
    appended to the mismatch error when THAT key is ABSENT from the
    stored sidecar (after ``defaults`` backfill) — the signature of a
    pre-upgrade store — so a known breaking change (e.g. a
    key-derivation rewrite) fails with instructions naming the change,
    not a generic parameter diff."""
    import json

    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )

    fs, _ = _hadoop_fs(spark, index_dir)
    jpath = spark._jvm.org.apache.hadoop.fs.Path(
        f"{index_dir}/{filename}")
    if fs.exists(jpath):
        stream = fs.open(jpath)
        try:
            data = bytearray()
            buf = spark._jvm.java.io.BufferedReader(
                spark._jvm.java.io.InputStreamReader(stream, "UTF-8"))
            line = buf.readLine()
            while line is not None:
                data.extend((line + "\n").encode())
                line = buf.readLine()
        finally:
            stream.close()
        have = json.loads(bytes(data).decode())
        for k, v in (defaults or {}).items():
            have.setdefault(k, v)
        if have != want:
            notes = " ".join(
                note for k, note in (migration_notes or {}).items()
                if k not in have)
            raise ValueError(
                f"dedup index at {index_dir} was built with {have}, "
                f"query uses {want}: pairs would be silently missed — "
                f"rebuild the index or match its parameters"
                + (f". {notes}" if notes else ""))
        return
    out = fs.create(jpath, True)
    try:
        out.write(json.dumps(want).encode())
    finally:
        out.close()


def read_state_except(spark: SparkSession, state_dir: str,
                      batch_id: int) -> DataFrame | None:
    """A ``<dir>/batch=<id>`` partitioned state table minus the current
    batch's partition (absent on the first batch; a replayed batch must
    not see its own previous half-write). Partition pruning makes the
    exclusion a file-listing filter, not a scan. The shared primitive
    under every piece of cross-batch streaming state in this package —
    the LSH index, the component labels, the corpus fingerprint store.

    "No state yet" is decided by an explicit Hadoop-FS existence probe —
    NOT by catching the read's exception: a transient FS failure (s3a
    hiccup, permission blip) on batch N>0 must surface and fail the
    batch, because silently processing the batch against nothing loses
    its cross-batch results PERMANENTLY (the batch's own state partition
    is still appended, so no replay regenerates them). Genuinely absent
    / first-batch state is only ever a listing with no prior ``batch=*``
    partition. Returns the filtered DataFrame WITH its ``batch`` column
    (callers drop or resolve on it), or None."""
    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )

    fs, root = _hadoop_fs(spark, state_dir)
    if not fs.exists(root):
        return None
    own = f"batch={batch_id}"
    prior = [s for s in fs.listStatus(root)
             if s.isDirectory()
             and s.getPath().getName().startswith("batch=")
             and s.getPath().getName() != own]
    if not prior:
        # first batch (or a replayed first batch whose own half-write is
        # the only partition): nothing to process against
        return None
    raw = spark.read.option("basePath", state_dir).parquet(state_dir)
    return raw.filter(F.col("batch") != batch_id)


def _read_index_except(spark: SparkSession, index_dir: str,
                       batch_id: int) -> DataFrame | None:
    """The accumulated LSH index minus the current batch's partition
    (:func:`read_state_except`)."""
    idx = read_state_except(spark, index_dir, batch_id)
    return None if idx is None else idx.drop("batch")


def dedup_batch(docs: DataFrame, batch_id: int, index_dir: str,
                pairs_dir: str, text_col: str = "text",
                id_col: str = "doc_id", num_hashes: int = 32,
                bands: int = 8, shingle_n: int = 3,
                threshold: float = 0.5,
                materialize_mode: str = "persist",
                components_dir: str | None = None) -> None:
    """Process one micro-batch: emit its near-dup pairs and extend the
    index. Usable directly for driver-managed batch loops, or via
    :func:`run_dedup_stream` under Structured Streaming.

    The banded table is materialized once and feeds BOTH the pair join
    and the index append (two actions — without the cut the signature
    aggregation would run twice). Default mode is 'persist'
    (MEMORY_AND_DISK): lineage survives executor loss, and the handle is
    unpersisted before return so long-lived streaming drivers don't
    accumulate cache entries.

    ``components_dir`` (optional) additionally folds the batch's pairs
    into the persistent cross-batch id→component table
    (:func:`update_components`) — without it, streaming consumers that
    need duplicate GROUPS (keep-one) must re-run connected components
    over all accumulated pair partitions. The merge reads the batch's
    just-written pairs parquet rather than re-executing the pair plan —
    the banded join is the expensive stage of the batch, and the label
    propagation only needs its (tiny) output."""
    spark = docs.sparkSession
    _check_index_params(spark, index_dir, num_hashes, bands, shingle_n)
    newb = minhash_band_index(docs, text_col, id_col, num_hashes, bands,
                              shingle_n)
    newb = materialize(newb, materialize_mode)
    try:
        index = _read_index_except(spark, index_dir, batch_id)
        if index is not None:
            pairs = incremental_minhash_pairs(
                docs, index, text_col, id_col, num_hashes, bands,
                shingle_n, threshold, new_index=newb)
        else:
            # first batch: within-batch pairs only (vs_self of the same
            # operator — an empty index side would be a schema-only join)
            pairs = incremental_minhash_pairs(
                docs, newb.limit(0), text_col, id_col, num_hashes, bands,
                shingle_n, threshold, new_index=newb)
        pairs.write.mode("overwrite").parquet(f"{pairs_dir}/batch={batch_id}")
        newb.write.mode("overwrite").parquet(f"{index_dir}/batch={batch_id}")
    finally:
        if materialize_mode == "persist":
            newb.unpersist()
    if components_dir is not None:
        update_components(
            docs, spark.read.parquet(f"{pairs_dir}/batch={batch_id}"),
            components_dir, batch_id, id_col=id_col)


def read_components(spark: SparkSession,
                    components_dir: str) -> DataFrame | None:
    """Current ``(id, component)`` labels from the cross-batch component
    table — per id, the label written by the HIGHEST batch (later
    batches re-label the ids their pairs touched; a compacted ``batch=-1``
    partition naturally loses to every real batch). None if the table
    does not exist yet.

    A consumer-edge/maintenance read, so it necessarily touches the full
    table — but resolution goes through :func:`_resolve_labels`'s
    map-side-combinable aggregate rather than a Window: partial maxes
    collapse the per-id rows BEFORE the exchange (the delta rows per id
    are few), and there is no per-partition sort."""
    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )

    fs, root = _hadoop_fs(spark, components_dir)
    if not fs.exists(root):
        return None
    if not any(s.isDirectory()
               and s.getPath().getName().startswith("batch=")
               for s in fs.listStatus(root)):
        return None
    raw = spark.read.option("basePath", components_dir) \
        .parquet(components_dir)
    return _resolve_labels(raw)


def _resolve_labels(rows: DataFrame) -> DataFrame:
    """Highest-batch-wins per-id resolution of raw ``(id, component,
    batch)`` label rows → ``(id, component)``. One map-side-combinable
    aggregate — ``max(struct(batch, component))`` — not a Window: a
    Window over the full store forces ``Exchange hashpartitioning(id)``
    of the store BELOW any later join (Catalyst cannot push a join
    under a Window), which is exactly the store shuffle the merge must
    avoid. Callers pass an already-RESTRICTED subset (the output of a
    broadcast probe against batch-derived keys), so the aggregate's
    shuffle moves only frontier-sized rows. (id, batch) is unique by
    construction — each batch partition holds at most one label per id —
    so the struct max picks exactly the latest batch's component."""
    return (rows.groupBy("id")
            .agg(F.max(F.struct("batch", "component")).alias("_m"))
            .select("id", F.col("_m.component").alias("component")))


def _touched_frontier(raw: DataFrame, endpoints: DataFrame) -> DataFrame:
    """Current ``(id, component)`` labels of every id whose CURRENT
    component is touched by the batch's pair ``endpoints`` — the only
    part of the stored label table the incremental merge needs.

    Store-scan discipline (the 100 TB contract, pinned by
    tests/test_dedup_stream.py's plan test): the raw store is probed
    three times, each time by a BROADCAST join keyed on a batch-derived
    side, and is never itself exchanged —

      1. ``raw ⋈ broadcast(endpoints)`` on id → the endpoint ids' raw
         rows; resolving THAT subset yields their current components
         (per-id resolution only needs the id's own rows, all of which
         the id-equi-join preserves);
      2. ``raw ⋉ broadcast(touched)`` on component → candidate ids:
         every id that EVER carried a touched label (a superset of the
         frontier — some candidates since moved to untouched
         components);
      3. ``raw ⋈ broadcast(candidate ids)`` on id → the candidates'
         full row sets, resolved per id and then semi-joined back to
         ``touched`` to drop the stale candidates.

    Every ``Exchange hashpartitioning(id)`` in the resulting plan sits
    ABOVE a broadcast join, i.e. shuffles only matched (frontier-sized)
    rows; the store side contributes scans only."""
    ep_now = _resolve_labels(raw.join(F.broadcast(endpoints), "id"))
    touched = ep_now.select("component").distinct()
    cand_ids = (raw.join(F.broadcast(touched), "component", "left_semi")
                .select("id").distinct())
    return (_resolve_labels(raw.join(F.broadcast(cand_ids), "id"))
            .join(F.broadcast(touched), "component", "left_semi"))


def update_components(batch_ids: DataFrame, pairs: DataFrame,
                      components_dir: str, batch_id: int,
                      id_col: str = "doc_id") -> None:
    """Merge one micro-batch's near-dup pairs into the persistent
    id→component table — the step that turns the streaming loop's PAIRS
    into stable cross-batch duplicate GROUPS (keep-one needs a cluster
    representative, and without stored labels every consumer would have
    to re-run connected_components over ALL accumulated pairs).

    Incremental union-find, frontier-restricted:
      1. the batch's pair endpoints identify the TOUCHED stored
         components; everything else is untouched and never read into
         the propagation (:func:`_touched_frontier` — the stored table
         is only ever probed by broadcast joins, never shuffled);
      2. stored labels become star edges (id — component) for the
         touched components only, unioned with the batch's pairs;
      3. :func:`~harvesting_extract_to_ttl_service_spark.operators.dedup.
         connected_components` runs over just that frontier (near-dup
         clusters are shallow stars, so this converges in 1-2 rounds);
      4. the batch's partition ``<dir>/batch=<batch_id>`` (overwrite —
         same replay-idempotent layout as the pairs/index writes) gets a
         row for EVERY id of the batch, plus the stored rows whose label
         moved. Writing all batch ids unconditionally — not just
         new-or-changed ones — is a consumer contract: keep-one readers
         (streaming/corpus_stream.py) resolve a batch's representatives
         from ``components/batch=<id>`` ALONE, and on a replay after
         compaction the batch's ids already sit (unchanged) in
         ``batch=-1``, so a changed-only delta would omit them and the
         reader would silently lose the batch's representatives. The
         per-id resolution at read time stays "highest batch wins"
         (:func:`read_components`).

    The final labels equal a full recompute's: union-find merging is
    order-independent, and component = min member id on both paths.
    Streaming caveat (inherent, not a bug): a LATER doc with a SMALLER
    id than an already-shipped cluster representative re-labels the
    cluster; keep-one consumers that already emitted the old
    representative simply also keep the new doc — streaming can't
    unship history."""
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        connected_components,
    )

    spark = batch_ids.sparkSession
    new_ids = batch_ids.select(F.col(id_col).alias("id")).distinct()
    pairs = pairs.select("id_a", "id_b")
    raw = read_state_except(spark, components_dir, batch_id)

    if raw is None:
        labels = connected_components(pairs, new_ids)
        changed = labels
    else:
        endpoints = (pairs.select(F.col("id_a").alias("id"))
                     .unionByName(pairs.select(F.col("id_b").alias("id")))
                     .distinct())
        frontier = materialize(_touched_frontier(raw, endpoints),
                               "local_checkpoint")
        ids = (frontier.select("id")
               .unionByName(new_ids)
               .distinct())
        star = (frontier.filter(F.col("id") != F.col("component"))
                .select(F.col("id").alias("id_a"),
                        F.col("component").alias("id_b")))
        labels = connected_components(pairs.unionByName(star), ids)
        # labels' ids ∩ stored ids = the frontier exactly (untouched
        # components never enter the propagation), so the old-label
        # lookup joins the broadcastable frontier, not the full store.
        # Kept: every batch id (the consumer contract above) + frontier
        # rows whose label moved.
        changed = (labels.alias("n")
                   .join(F.broadcast(frontier.alias("o")), "id", "left")
                   .join(F.broadcast(new_ids.withColumn(
                       "_new", F.lit(True))), "id", "left")
                   .filter(F.col("_new").isNotNull()
                           | (F.col("n.component") != F.col("o.component")))
                   .select("id", F.col("n.component").alias("component")))
    changed.write.mode("overwrite").parquet(
        f"{components_dir}/batch={batch_id}")


def compact_components(spark: SparkSession, components_dir: str,
                       target_partitions: int | None = None) -> int:
    """Fold the per-batch label deltas into one resolved ``batch=-1``
    partition (same namenode-scale motivation as
    :func:`compact_dedup_index`). Resolution happens HERE (highest batch
    wins), so the compacted partition holds one row per id; -1 loses to
    any later real batch, and a batch replayed after compaction merges
    against the compacted state and rewrites only its own delta."""
    resolved = read_components(spark, components_dir)
    if resolved is None:
        return 0
    idx = spark.read.option("basePath", components_dir) \
        .parquet(components_dir)
    batches = [r.batch for r in idx.select("batch").distinct().collect()
               if r.batch != -1]
    if not batches:
        return 0
    if target_partitions is not None:
        resolved = resolved.repartition(target_partitions)
    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )

    fs, _ = _hadoop_fs(spark, components_dir)
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    tmp = f"{components_dir}/_compact_tmp"
    resolved.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite") \
        .parquet(f"{components_dir}/batch=-1")
    for b in batches:
        fs.delete(jpath(f"{components_dir}/batch={b}"), True)
    fs.delete(jpath(tmp), True)
    return len(batches)


def compact_dedup_index(spark: SparkSession, index_dir: str,
                        target_partitions: int | None = None) -> int:
    """Fold the accumulated per-batch index partitions into one
    consolidated ``batch=-1`` partition (micro-batches write small files;
    a year of 5-minute batches is ~100k partition directories whose
    listing alone dominates the index read at namenode scale).

    Safe under the replay protocol: -1 is never a real micro-batch id, so
    the current-batch exclusion filter keeps working, and a batch
    replayed AFTER compaction still overwrites only its own (now
    redundant-but-harmless) ``batch=<id>`` directory. Returns the number
    of row-partitions compacted away. Run it from maintenance, not from
    inside the stream — it rewrites history partitions the stream only
    ever appends to.

    Deliberately IN-PLACE, unlike the BM25/IVF generational folds
    (streaming/lexical_stream.py, streaming/ann_stream.py): those
    indexes serve EXTERNAL searches that cannot be quiesced, so their
    folds must be read-transparent; this table's only readers are the
    stream's own batches (quiesced by this function's contract) and
    maintenance jobs, duplicates from a crash are harmless (pairs
    dedupe downstream), and rows are never lost (the consolidated
    write lands before any delete). If external readers ever need to
    race this fold, port the generational pointer scheme — it exists
    in-repo."""
    idx = spark.read.option("basePath", index_dir).parquet(index_dir)
    batches = [r.batch for r in idx.select("batch").distinct().collect()
               if r.batch != -1]
    if not batches:
        return 0
    consolidated = idx.filter(F.col("batch") != -1).drop("batch")
    if target_partitions is not None:
        consolidated = consolidated.repartition(target_partitions)
    # write the new consolidated partition FIRST, then drop the folded
    # batch dirs — a crash between the two duplicates index rows, which
    # only duplicates candidate pairs (distinct downstream), never loses
    # them
    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )

    fs, _ = _hadoop_fs(spark, index_dir)
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    existing = spark.read.parquet(f"{index_dir}/batch=-1") \
        if fs.exists(jpath(f"{index_dir}/batch=-1")) else None
    out = (consolidated.unionByName(existing)
           if existing is not None else consolidated)
    tmp = f"{index_dir}/_compact_tmp"
    out.write.mode("overwrite").parquet(tmp)
    spark.read.parquet(tmp).write.mode("overwrite") \
        .parquet(f"{index_dir}/batch=-1")
    # all deletes via the Hadoop FileSystem API — index_dir may be
    # hdfs://, s3a://, not just local disk
    for b in batches:
        fs.delete(jpath(f"{index_dir}/batch={b}"), True)
    fs.delete(jpath(tmp), True)
    return len(batches)


def run_dedup_stream(docs_stream: DataFrame, index_dir: str, pairs_dir: str,
                     checkpoint: str, text_col: str = "text",
                     id_col: str = "doc_id", num_hashes: int = 32,
                     bands: int = 8, shingle_n: int = 3,
                     threshold: float = 0.5,
                     trigger_available_now: bool = True,
                     on_batch: Callable[[int], None] | None = None,
                     components_dir: str | None = None):
    """Attach the incremental dedup loop to a streaming document source.
    Returns the started StreamingQuery; checkpointed batch ids + the
    batch=<id> overwrite layout make restarts replay-idempotent.
    ``components_dir`` additionally maintains the cross-batch duplicate
    clusters (:func:`update_components`)."""

    def batch_fn(df: DataFrame, batch_id: int) -> None:
        dedup_batch(df, batch_id, index_dir, pairs_dir, text_col, id_col,
                    num_hashes, bands, shingle_n, threshold,
                    components_dir=components_dir)
        if on_batch is not None:
            on_batch(batch_id)

    writer = (
        docs_stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def embedding_dedup_batch(vecs: DataFrame, batch_id: int, index_dir: str,
                          pairs_dir: str, dim: int,
                          vec_col: str = "embedding",
                          id_col: str = "vec_id",
                          n_planes: int = 8, threshold: float = 0.9,
                          materialize_mode: str = "persist",
                          broadcast_new: bool = True,
                          components_dir: str | None = None,
                          probe_bits: int = 0) -> None:
    """The EMBEDDING twin of :func:`dedup_batch`: semantic (cosine)
    near-dup detection micro-batch by micro-batch against a growing
    sign-LSH index — one ``(id, bucket, v, vnorm)`` row per vector,
    stored per batch under the same replay-idempotent ``batch=<id>``
    layout, with the same store-side discipline (batch broadcast, index
    scanned on the bucket equi-join, never shuffled; set
    ``broadcast_new=False`` for batches whose vectors exceed broadcast
    size — the join then shuffles BOTH sides on the bucket key, the
    index's one non-flat mode).

    Emits ``(id_a, id_b, cos_sim)`` pairs (batch×index ∪ batch×batch)
    with the exact rounded cosine refined inside each bucket — candidate
    recall follows the sign-LSH bucketing
    (operators/similarity.lsh_blocked_pairs): cross-bucket near-dups are
    missed, the safe direction for dedup. ``probe_bits>0`` recovers the
    near-boundary losses by exploding the BATCH side over the Hamming
    ball of its buckets (multi-probe — the store is still only probed by
    an equi-join; candidate volume scales by the mask count on the
    batch side only). The accumulated pairs over any batch split equal
    one `lsh_blocked_pairs` run over the union with the same
    ``probe_bits`` (buckets and masks are deterministic), which is the
    parity the tests pin; ``probe_bits`` is pinned in the
    ``_ann_params.json`` sidecar because a mid-stream change would make
    the pair stream's recall batch-dependent.

    ``components_dir`` maintains the same cross-batch id→component table
    as the text path (:func:`update_components` — the two paths share
    it), so keep-one decisions stay stable as batches arrive. The
    ``_ann_params.json`` sidecar pins (n_planes, dim) for the index's
    lifetime; `compact_dedup_index` folds this index's partitions too
    (it is layout-generic)."""
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        _pin_join_parallelism,
    )
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        dot,
        lsh_bucket,
        norm,
        probe_masks,
    )

    spark = vecs.sparkSession
    _check_sidecar_params(spark, index_dir,
                          {"n_planes": n_planes, "dim": dim,
                           "probe_bits": probe_bits},
                          filename="_ann_params.json",
                          defaults={"probe_bits": 0})
    newb = (vecs.select(F.col(id_col).alias("id"),
                        F.col(vec_col).alias("v"))
            .withColumn("bucket", lsh_bucket(F.col("v"), dim, n_planes))
            .withColumn("vnorm", norm(F.col("v"))))
    newb = materialize(newb, materialize_mode)

    def pair_cols(joined: DataFrame) -> DataFrame:
        # project per branch BEFORE the union (the joined frame carries
        # both sides' id/v/bucket/vnorm — duplicate names can't union)
        return joined.select(
            F.least(F.col("a.id"), F.col("b.id")).alias("id_a"),
            F.greatest(F.col("a.id"), F.col("b.id")).alias("id_b"),
            F.round(dot(F.col("a.v"), F.col("b.v"))
                    / (F.col("a.vnorm") * F.col("b.vnorm")), 6)
            .alias("cos_sim"))

    try:
        index = _read_index_except(spark, index_dir, batch_id)
        # multi-probe: the BATCH side explodes over its Hamming ball
        # (store rows keep their exact bucket — the index is never
        # rewritten for a recall knob). probe_bits=0 aliases the bucket,
        # keeping the single-probe plan shape unchanged.
        if probe_bits:
            probe_new = newb.withColumn("_probe", F.explode(F.array(*[
                F.col("bucket").bitwiseXOR(F.lit(m))
                for m in probe_masks(n_planes, probe_bits)])))
        else:
            probe_new = newb.withColumn("_probe", F.col("bucket"))
        new_side = (F.broadcast(probe_new) if broadcast_new
                    else _pin_join_parallelism(probe_new, "_probe"))
        # id inequality: same replay-after-compaction guard as the
        # MinHash path — a replayed batch finds its own vectors in the
        # compacted batch=-1 partition
        if index is None:
            index = newb.limit(0)
        vs_index = pair_cols(new_side.alias("a").join(
            index.alias("b"),
            (F.col("a._probe") == F.col("b.bucket"))
            & (F.col("a.id") != F.col("b.id"))))
        # one-sided pin on a materialized frame; under 'none' the bare
        # side pins its own join key too (dedup._pin_join_parallelism:
        # an unmaterialized bare side would recompute the bucket/norm
        # subtree or coalesce to one task)
        a_self = _pin_join_parallelism(probe_new, "_probe")
        b_self = (_pin_join_parallelism(newb, "bucket")
                  if materialize_mode == "none" else newb)
        vs_self = pair_cols(a_self.alias("a").join(
            b_self.alias("b"),
            (F.col("a._probe") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id"))))
        # one distinct over the union: a pair surfacing from both
        # branches (replay-after-compaction) collapses here, and cos_sim
        # is a deterministic function of the two vectors
        pairs = (vs_index.unionByName(vs_self).distinct()
                 .filter(F.col("cos_sim") >= threshold))
        pairs.write.mode("overwrite").parquet(
            f"{pairs_dir}/batch={batch_id}")
        newb.write.mode("overwrite").parquet(
            f"{index_dir}/batch={batch_id}")
    finally:
        if materialize_mode == "persist":
            newb.unpersist()
    if components_dir is not None:
        update_components(
            vecs, spark.read.parquet(f"{pairs_dir}/batch={batch_id}"),
            components_dir, batch_id, id_col=id_col)


def run_embedding_dedup_stream(vecs_stream: DataFrame, index_dir: str,
                               pairs_dir: str, checkpoint: str, dim: int,
                               vec_col: str = "embedding",
                               id_col: str = "vec_id",
                               n_planes: int = 8, threshold: float = 0.9,
                               trigger_available_now: bool = True,
                               on_batch: Callable[[int], None] | None = None,
                               components_dir: str | None = None,
                               probe_bits: int = 0):
    """Attach the embedding dedup loop to a streaming vector source —
    the semantic twin of :func:`run_dedup_stream`, same checkpoint +
    batch=<id> replay contract."""

    def batch_fn(df: DataFrame, batch_id: int) -> None:
        embedding_dedup_batch(df, batch_id, index_dir, pairs_dir, dim,
                              vec_col, id_col, n_planes, threshold,
                              components_dir=components_dir,
                              probe_bits=probe_bits)
        if on_batch is not None:
            on_batch(batch_id)

    writer = (
        vecs_stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def hamming_dedup_batch(sh: DataFrame, batch_id: int, index_dir: str,
                        pairs_dir: str, bits: int = 60,
                        max_hamming: int = 6, n_tables: int = 16,
                        bits_per_table: int = 16, seed: int = 0xDA7A,
                        id_col: str = "id", sh_col: str = "sh",
                        materialize_mode: str = "persist",
                        broadcast_new: bool = True,
                        components_dir: str | None = None) -> None:
    """The HAMMING-fingerprint twin of :func:`dedup_batch` /
    :func:`embedding_dedup_batch` — perceptual image hashes or SimHash
    deduplicated micro-batch by micro-batch against a growing banded
    multi-index (operators/dedup.hamming_banded_index): one
    ``(id, sh, tbl, key)`` row per fingerprint per table, stored per
    batch under the same replay-idempotent ``batch=<id>`` layout, with
    the same store-side discipline (batch broadcast, index scanned on
    the (tbl, key) equi-join, never shuffled; ``broadcast_new=False``
    for over-broadcast-size batches).

    Emits ``(id_a, id_b, hamming)`` pairs (batch×index ∪ batch×batch,
    exact bit_count verify ≤ ``max_hamming``) via
    operators/dedup.incremental_hamming_pairs — recall follows the
    banded join's (operators/dedup.banded_hamming_recall; 1.0 for
    exact-duplicate hashes). The accumulated pairs over any batch split
    equal one `hamming_banded_pairs` run over the union (keys are
    plan-time constants), the parity the tests pin. The
    ``_mih_params.json`` sidecar pins (bits, n_tables, bits_per_table,
    seed, max_hamming) PLUS the concrete bit-position lists for the
    index's lifetime — a mid-stream change to any of them would make
    the pair stream's recall batch-dependent, and verifying the lists
    (not just the seed) catches a derivation drift too;
    `compact_dedup_index` folds this index's partitions too (it is
    layout-generic).

    ``components_dir`` maintains the same cross-batch id→component
    table as the text and embedding paths (:func:`update_components` —
    all three share it), so keep-one decisions stay stable as batches
    arrive. Pipeline shape for images: image_ahash (Arrow kernel) →
    this loop — only (media_id, 60-bit hash) rows ever reach state."""
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        banded_bit_positions,
        hamming_banded_index,
        incremental_hamming_pairs,
    )

    spark = sh.sparkSession
    # The sidecar pins the CONCRETE position lists, not just the seed:
    # the seed only identifies the plan if the derivation function never
    # changes, whereas the lists are the plan — a stored index whose
    # keys were cut from different samples fails loudly here instead of
    # silently missing pairs. (banded_bit_positions is itself portable
    # md5-Fisher–Yates, so lists and seed should never disagree; the
    # lists are the belt to that suspender.)
    _check_sidecar_params(
        spark, index_dir,
        {"bits": bits, "n_tables": n_tables,
         "bits_per_table": bits_per_table, "seed": seed,
         "max_hamming": max_hamming,
         "positions": banded_bit_positions(bits, n_tables,
                                           bits_per_table, seed),
         "bit_plan": "md5-fisher-yates"},
        filename="_mih_params.json",
        # An r11 sidecar carries matching md5-derived positions but
        # predates the bit_plan tag — backfill it (behavior-identical).
        # A pre-r11 sidecar has NO positions key at all, so the
        # positions mismatch fires the derivation-change note below.
        defaults={"bit_plan": "md5-fisher-yates"},
        migration_notes={
            "positions": (
                "The bit-position derivation changed from "
                "random.Random.sample to portable md5-Fisher-Yates "
                "(round 11): indexes persisted under the old plan "
                "must be rebuilt (re-key the fingerprints with "
                "hamming_banded_index and rewrite the partitions) — "
                "their keys were cut from different bit samples."),
        })
    base = sh.select(F.col(id_col).alias("id"), F.col(sh_col).alias("sh"))
    newb = hamming_banded_index(base, bits, n_tables, bits_per_table, seed)
    newb = materialize(newb, materialize_mode)
    try:
        index = _read_index_except(spark, index_dir, batch_id)
        if index is None:
            index = newb.limit(0)
        pairs = incremental_hamming_pairs(
            base, index, bits, max_hamming, n_tables, bits_per_table,
            seed, broadcast_new=broadcast_new,
            materialize_mode="none", new_index=newb)
        pairs.write.mode("overwrite").parquet(
            f"{pairs_dir}/batch={batch_id}")
        newb.write.mode("overwrite").parquet(
            f"{index_dir}/batch={batch_id}")
    finally:
        if materialize_mode == "persist":
            newb.unpersist()
    if components_dir is not None:
        update_components(
            sh.select(F.col(id_col).alias("id")),
            spark.read.parquet(f"{pairs_dir}/batch={batch_id}"),
            components_dir, batch_id, id_col="id")


def run_hamming_dedup_stream(sh_stream: DataFrame, index_dir: str,
                             pairs_dir: str, checkpoint: str,
                             bits: int = 60, max_hamming: int = 6,
                             n_tables: int = 16, bits_per_table: int = 16,
                             seed: int = 0xDA7A,
                             id_col: str = "id", sh_col: str = "sh",
                             trigger_available_now: bool = True,
                             on_batch: Callable[[int], None] | None = None,
                             components_dir: str | None = None):
    """Attach the Hamming dedup loop to a streaming fingerprint source —
    the perceptual-hash twin of :func:`run_dedup_stream` /
    :func:`run_embedding_dedup_stream`, same checkpoint + batch=<id>
    replay contract."""

    def batch_fn(df: DataFrame, batch_id: int) -> None:
        hamming_dedup_batch(df, batch_id, index_dir, pairs_dir, bits,
                            max_hamming, n_tables, bits_per_table, seed,
                            id_col, sh_col,
                            components_dir=components_dir)
        if on_batch is not None:
            on_batch(batch_id)

    writer = (
        sh_stream.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
