"""Streaming training-corpus construction — the batch corpus funnel
(`operators/corpus.build_training_corpus`) re-composed micro-batch by
micro-batch against persistent cross-batch state. This is the operating
loop the whole package builds toward: a production crawl pipeline does
not re-filter and re-dedup the accumulated corpus per delivery — it runs
each new batch of documents through

  1. per-document quality/language/repetition/PII filters
     (`operators/corpus.filter_documents` — stateless, shared verbatim
     with the batch funnel);
  2. exact dedup against a persistent content-fingerprint store (plus
     keep-one within the batch);
  3. near-dup dedup against the persistent LSH index
     (`streaming/dedup_stream.dedup_batch`), with keep-one decided by
     the cross-batch component labels (`update_components`);
  4. decontamination against a benchmark/eval set (stateless broadcast
     join — the benchmark side is eval-set-sized);
  5. append of the surviving documents to the corpus output,

and ships only the batch's survivors. The corpus is never re-read,
re-shingled, or re-shuffled: per batch, every cross-batch interaction is
a keyed equi-join against a parquet state table (fingerprints, banded
signatures, component labels) — the flat-cost operating mode that makes
the funnel viable at 100 TB where the batch funnel's full recompute is a
one-off job.

Exactly-once follows the dedup-stream protocol (dedup_stream.py module
docstring): every state and output write lands in ``<dir>/batch=<id>``
with overwrite, and every state READ excludes the current batch's own
partition (`read_state_except`), so a replayed micro-batch rewrites its
partitions byte-identically instead of duplicating or self-pairing.

Parity with the batch funnel: processing the same documents in any batch
split yields the same survivor set as one `build_training_corpus` run,
PROVIDED doc ids are assigned in arrival order (monotone across
batches). Both paths keep the minimum id per duplicate group; streaming
additionally cannot un-ship a document, so if a LATER batch delivered a
smaller-id near-duplicate of an already-shipped survivor, both would
ship. With arrival-ordered ids that case cannot arise, and the funnel
parity is exact (tests/test_corpus_stream.py proves it on a 3-batch
replayed stream). The precondition is ENFORCEABLE
(``corpus_batch(enforce_monotone_ids=True)`` fails out-of-order batches
against a persistent id watermark) and RESTORABLE
(:func:`remap_arrival_ids` re-keys a disordered source with
deterministic arrival-ordered ids, keeping the source id as a lineage
column).

Reference analogue: /root/reference/app.js:35-38 — the per-delta
fire-and-forget processing loop — applied to the corpus-construction
surface instead of the TTL-extraction surface.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from harvesting_extract_to_ttl_service_spark.operators.corpus import (
    decontam_stage,
    filter_documents,
)
from harvesting_extract_to_ttl_service_spark.operators.dedup import (
    drop_exact_duplicates,
)
from harvesting_extract_to_ttl_service_spark.operators.materialize import (
    materialize,
)
from harvesting_extract_to_ttl_service_spark.operators.text import (
    fingerprint,
)
from harvesting_extract_to_ttl_service_spark.streaming.dedup_stream import (
    dedup_batch,
    read_state_except,
)


# arrival-id layout for remap_arrival_ids: batch in the high bits, then
# bucket, then the within-bucket rank — strictly monotone across batches
# by construction, unique within a batch, and computed with per-bucket
# parallelism (no single-partition global window).
_REMAP_BATCH_SHIFT = 40           # bits below the batch id
_REMAP_BUCKET_BITS = 12           # ≤4096 buckets
_REMAP_RANK_BITS = _REMAP_BATCH_SHIFT - _REMAP_BUCKET_BITS  # 2^28 rows/bucket


def remap_arrival_ids(docs: DataFrame, batch_id: int,
                      id_col: str = "doc_id",
                      n_buckets: int = 256) -> DataFrame:
    """Re-key one micro-batch with ARRIVAL-ORDERED ids — the ingest
    operator that makes the funnel-parity precondition (module
    docstring: doc ids monotone across batches) TRUE for sources that
    deliver re-crawled, reordered, or source-assigned ids.

    New id = ``batch_id·2^40 + bucket·2^28 + rank``: strictly larger
    than every earlier batch's ids (batch in the high bits), unique
    within the batch ((bucket, rank) is unique), and DETERMINISTIC — the
    bucket is a hash of the source id and the rank is a row_number
    ordered by (source id, full-row hash) within the bucket, so a
    replayed batch re-derives byte-identical ids (the exactly-once
    protocol depends on that) even when the batch carries DUPLICATE
    source ids (the same URL crawled twice in one window — without the
    content tiebreaker their ids could swap between runs, re-keying
    state rows to different texts on replay). Within-batch order is
    irrelevant to parity: both funnels see a within-batch duplicate
    group whole and keep its min id, whichever member that is.

    Scale shape: the only shuffle is ``repartition(bucket)`` of the
    BATCH (never the corpus) and the window sorts per bucket — no
    single-partition global window, no driver collect. Capacity guards:
    batch_id < 2^23, rank < 2^28 per bucket (raise_error in the rank
    expression — a >68B-doc micro-batch should fail loudly, not wrap).

    The source id survives as ``<id_col>_src`` for lineage joins back to
    the upstream system. Returns ``docs``' columns with ``id_col``
    re-keyed and the lineage column appended."""
    from pyspark.sql import Window

    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        hash_fraction,
    )

    if not 0 <= batch_id < (1 << (63 - _REMAP_BATCH_SHIFT)):
        raise ValueError(f"batch_id={batch_id} outside the arrival-id "
                         f"layout's {63 - _REMAP_BATCH_SHIFT}-bit range")
    if not 1 <= n_buckets <= (1 << _REMAP_BUCKET_BITS):
        raise ValueError(f"n_buckets={n_buckets}: 1..4096")
    src = f"{id_col}_src"
    if src in docs.columns:
        raise ValueError(f"{src!r} already present: refusing to clobber "
                         f"the lineage column")
    bucket = F.floor(hash_fraction(F.col(src), "arrival")
                     * F.lit(n_buckets)).cast("long")
    # full-row hash tiebreaker: rows with the same source id order by
    # their content, so only fully-identical rows can tie — and swapping
    # those is a no-op
    row_hash = F.xxhash64(*[F.col(c) if c != id_col else F.col(src)
                            for c in docs.columns])
    w = Window.partitionBy("_bkt").orderBy(F.col(src), row_hash)
    rank = F.row_number().over(w).cast("long") - F.lit(1)
    rank = F.when(rank < F.lit(1 << _REMAP_RANK_BITS), rank).otherwise(
        F.raise_error(F.lit("remap_arrival_ids: bucket rank overflow "
                            "(>2^28 rows in one bucket) — raise "
                            "n_buckets")))
    out_cols = [c for c in docs.columns if c != id_col]
    return (docs.withColumnRenamed(id_col, src)
            .withColumn("_bkt", bucket)
            .repartition("_bkt")
            .withColumn(
                id_col,
                (F.lit(batch_id << _REMAP_BATCH_SHIFT)
                 + F.col("_bkt") * F.lit(1 << _REMAP_RANK_BITS)
                 + rank).cast("long"))
            .select(id_col, *out_cols, src))


def _check_monotone_ids(docs: DataFrame, batch_id: int, corpus_dir: str,
                        id_col: str) -> None:
    """Enforce the funnel-parity precondition instead of assuming it:
    fail the batch LOUDLY if any of its ids is ≤ the high-water mark of
    the ids already ingested (module docstring — a smaller-id late
    arrival would silently break batch/stream keep-one parity, the one
    precondition a user can violate without any symptom).

    State: one ``(src_batch, max_id)`` row per batch under
    ``idwatermark/batch=<id>`` — watermark-sized, not corpus-sized. The
    comparison is against EARLIER batches only (``src_batch <
    batch_id``): a replayed batch was already validated when first
    accepted, and the batches accepted after it were validated against
    ITS watermark — re-checking it against their (higher) marks would
    fail every replay. The in-row ``src_batch`` column (not just the
    partition name) is what keeps that restriction working AFTER
    compaction folds the rows into ``batch=-1``. The min/max aggregate
    over the batch is the check's only extra action."""
    spark = docs.sparkSession
    lo, hi = docs.select(F.min(id_col), F.max(id_col)).first()
    if lo is None:
        return  # empty batch: no ids consumed, no watermark to advance
    prior = read_state_except(spark, f"{corpus_dir}/idwatermark", batch_id)
    if prior is not None:
        hwm = (prior.filter(F.col("src_batch") < batch_id)
               .select(F.max("max_id")).first()[0])
        if hwm is not None and lo <= hwm:
            raise ValueError(
                f"corpus_batch: batch {batch_id} delivers id {lo} ≤ the "
                f"ingested high-water mark {hwm} — ids must be monotone "
                f"across batches for stream/batch funnel parity. Remap "
                f"the source ids with remap_arrival_ids, or fix the "
                f"source's delivery order")
    # schema follows the id column's type (string/long/... ids are all
    # valid — the monotone precondition only needs an ordering), rather
    # than hard-coding long
    id_type = docs.schema[id_col].dataType
    (spark.createDataFrame(
        [(batch_id, hi)],
        T.StructType([T.StructField("src_batch", T.LongType()),
                      T.StructField("max_id", id_type)]))
     .coalesce(1).write.mode("overwrite")
     .parquet(f"{corpus_dir}/idwatermark/batch={batch_id}"))


def _url_dedup_stage(filtered: DataFrame, batch_id: int, corpus_dir: str,
                     url_col: str, id_col: str) -> DataFrame:
    """Streaming twin of the batch funnel's URL-dedup stage
    (operators/corpus.build_training_corpus ``url_col``): keep-one per
    canonical URL within the batch, then drop rows whose canonical URL
    already sits in the ``urls/batch=*`` store; rows that fail to
    canonicalize (NULL key) pass through untouched, exactly like the
    batch stage's NULL lane.

    Store rows are ``(id, u)`` — ``u`` = the FULL 32-hex md5 of the
    canonical URL (fixed width; the raw URL never persists) keyed by
    the doc id that claimed it, which is what makes the
    replay-after-compaction own-id anti-join (the fingerprint store's
    guard) work here too. The full 128-bit digest matters: a 64-bit
    prefix starts birthday-colliding around ~5×10⁹ distinct URLs —
    squarely web-crawl scale — and a collision here silently DROPS an
    unrelated later document (and diverges from the batch funnel,
    which dedups on the canonical URL itself). 2⁻¹²⁸ keeps the
    collision lane out of reach while staying fixed-width.
    UPGRADE NOTE: stores written by the earlier 16-hex cut hold keys
    the full-width probe can never match — such a store now FAILS
    LOUDLY (an in-plan width guard on every stored key, the
    _check_sidecar_params discipline applied to a format that has no
    sidecar): silently mixing widths would re-admit the entire
    pre-upgrade URL set with no error. Re-key the store (one pass
    over the raw URLs) or rebuild it, as the error says.
    Probe shape mirrors the fingerprint probe exactly: batch side
    BROADCASTS, store side only SCANS."""
    from harvesting_extract_to_ttl_service_spark.operators.web import (
        drop_url_duplicates,
    )

    spark = filtered.sparkSession
    keyed = (drop_url_duplicates(filtered, url_col, id_col)
             .withColumn("_u", F.when(
                 F.col("_norm_url").isNotNull(),
                 F.md5(F.col("_norm_url"))))
             .drop("_norm_url"))
    stored = read_state_except(spark, f"{corpus_dir}/urls", batch_id)
    if stored is not None:
        own_ids = keyed.select(F.col(id_col).alias("id"))
        stored = stored.join(F.broadcast(own_ids), "id", "left_anti")
        batch_us = keyed.filter(F.col("_u").isNotNull()) \
            .select("_u").distinct()
        # In-plan key-width guard (inside the SURVIVING _u column — the
        # repo's when/raise_error discipline): a store written by the
        # pre-upgrade 16-hex cut can never match a 32-hex probe, so a
        # legacy key is a loud error, not a silent recall-zero.
        stored_u = F.when(
            F.length("u") == 32, F.col("u")
        ).otherwise(F.raise_error(F.concat(
            F.lit(f"url-dedup store at {corpus_dir}/urls holds a key "
                  f"of width "), F.length("u"),
            F.lit(" (expected 32-hex md5): this store predates the "
                  "full-width key format and its keys can never match "
                  "new probes — re-key it from the raw URLs or rebuild "
                  "it before resuming the stream"))))
        hit = (stored.select(stored_u.alias("_u"))
               .join(F.broadcast(batch_us), "_u", "left_semi")
               .distinct())
        kept = keyed.join(F.broadcast(hit), "_u", "left_anti")
    else:
        kept = keyed
    # materialization cut BEFORE the store write: the write is an action,
    # and without the cut the whole upstream subtree (filter_documents +
    # the keep-one window) would execute once here and AGAIN when the
    # fingerprint stage materializes downstream — the duplicate-subtree
    # hazard SCALE.md's round-5 audit measured at 2-5×.
    kept = materialize(kept, "local_checkpoint")
    (kept.filter(F.col("_u").isNotNull())
     .select(F.col(id_col).alias("id"), F.col("_u").alias("u"))
     .write.mode("overwrite")
     .parquet(f"{corpus_dir}/urls/batch={batch_id}"))
    return kept.drop("_u")


def corpus_batch(docs: DataFrame, batch_id: int, corpus_dir: str,
                 benchmark: DataFrame | None = None, *,
                 min_quality: float = 0.4,
                 langs: list[str] | None = None,
                 max_dup_line_ratio: float | None = None,
                 max_top_bigram_ratio: float | None = None,
                 max_pii_signals: int | None = None,
                 min_avg_logprob: float | None = None,
                 lm_counts: DataFrame | None = None,
                 lm_alpha: float = 0.5,
                 min_avg_bigram_logprob: float | None = None,
                 bigram_model_counts: DataFrame | None = None,
                 bigram_alpha: float = 0.5,
                 strip_hot: DataFrame | None = None,
                 strip_window: int = 8,
                 redact: bool = False,
                 gopher: bool | dict = False,
                 lid_model: dict | None = None,
                 quality_model: dict | None = None,
                 near_dup_threshold: float | None = 0.7,
                 decontam_min_overlap: int = 2,
                 decontam_mode: str = "shingle",
                 decontam_threshold: float = 0.5,
                 decontam_dim: int = 32,
                 decontam_k: int = 8,
                 decontam_n_probe: int = 2,
                 decontam_centroids: list[list[float]] | None = None,
                 num_hashes: int = 32, bands: int = 8, shingle_n: int = 3,
                 n_shards: int | None = None,
                 budget_tokens: int | None = None,
                 url_col: str | None = None,
                 text_col: str = "text", id_col: str = "doc_id",
                 materialize_mode: str = "persist",
                 enforce_monotone_ids: bool = False) -> None:
    """Run one micro-batch of documents through the corpus funnel
    against the persistent state under ``corpus_dir``:

    * ``fingerprints/batch=<id>`` — ``(id, fp)`` content fingerprints of
      each batch's exact-unique survivors (the exact-dedup store);
    * ``urls/batch=<id>`` (``url_col`` given) — ``(id, u)`` canonical-URL
      hashes claimed by each batch (the crawl-dedup store,
      :func:`_url_dedup_stage` — runs BEFORE content dedup, mirroring
      the batch funnel's stage order);
    * ``index/`` ``pairs/`` ``components/`` — the LSH index, near-dup
      pairs, and component labels maintained by
      :func:`~.dedup_stream.dedup_batch`;
    * ``corpus/batch=<id>`` — the batch's surviving documents
      (``docs``' original columns — the funnel's output);
    * ``shards/batch=<id>/shard=<k>`` (when ``n_shards`` +
      ``budget_tokens`` are set) — the batch's survivors packed into
      training shards (``operators/corpus.write_training_shards``:
      hash-assigned shard, context-window packing coordinates). Shard
      assignment is a pure hash of the doc id, so a given shard's
      training stream is the concatenation of its ``batch=*/shard=<k>``
      files in batch order — a plain two-level partitioned read, no
      re-shuffle of history when new batches arrive.

    Funnel parameters mirror ``build_training_corpus`` (which fixes the
    same 32/8/3 MinHash defaults); ``cap_per_lang`` has no streaming
    twin — a per-language cap is a property of the ACCUMULATED corpus,
    so apply ``capped_stratified_sample`` to the corpus output when the
    stream quiesces (or per training run), not per batch.

    Scale notes: every cross-batch interaction broadcasts the BATCH side
    and only scans the store — the fingerprint probe (semi-join with the
    batch's fps broadcast), the LSH index probe
    (``incremental_minhash_pairs`` ``broadcast_new``), and the component
    merge; the accumulated state is never shuffled. Decontamination
    broadcasts the benchmark side, never the corpus.

    ``enforce_monotone_ids=True`` checks the parity precondition (ids
    monotone across batches) against a persistent id high-water mark and
    FAILS the batch on violation (:func:`_check_monotone_ids`) — turn it
    on for sources whose delivery order is not under this pipeline's
    control, or re-key such sources with :func:`remap_arrival_ids`."""
    spark = docs.sparkSession
    if enforce_monotone_ids:
        _check_monotone_ids(docs, batch_id, corpus_dir, id_col)
    filtered = filter_documents(
        docs, min_quality, langs, max_dup_line_ratio, max_top_bigram_ratio,
        max_pii_signals, min_avg_logprob, lm_counts, lm_alpha,
        min_avg_bigram_logprob, bigram_model_counts, bigram_alpha,
        strip_hot, strip_window, redact=redact, gopher=gopher,
        lid_model=lid_model, quality_model=quality_model,
        text_col=text_col, id_col=id_col)

    if url_col is not None:
        filtered = _url_dedup_stage(filtered, batch_id, corpus_dir,
                                    url_col, id_col)

    # exact dedup: keep-one within the batch, then drop texts already in
    # the store (first delivery wins — with arrival-ordered ids that IS
    # the batch funnel's min-id-per-fingerprint). The store keeps
    # fingerprints of every exact-unique doc that ENTERED the near-dup
    # stage — including docs later dropped by near-dup/decontam — so a
    # future exact copy of a dropped doc stays dropped, exactly as the
    # batch funnel's global min-id collapse would have dropped it.
    # one materialization feeds the store probe, the fingerprint write,
    # the LSH index/pairs writes, and the survivor selection — without
    # it the annotate+filter projection would re-run once per action.
    uniq = materialize(
        drop_exact_duplicates(filtered, text_col, id_col)
        .withColumn("_fp", fingerprint(F.col(text_col))),
        materialize_mode)
    try:
        stored_fp = read_state_except(spark, f"{corpus_dir}/fingerprints",
                                      batch_id)
        if stored_fp is not None:
            # batch side BROADCASTS, store side only SCANS — the same
            # shape as the LSH index probe (incremental_minhash_pairs
            # broadcast_new): a plain anti-join against the store would
            # SHUFFLE the corpus-sized store every batch, which is the
            # cost the streaming loop exists to avoid. `hit` (store fps
            # present in this batch) is ≤ batch-sized, so the final
            # anti-join broadcasts too.
            #
            # Replay-after-compaction guard (the a.id != b.id twin of
            # the LSH paths): after compact_corpus_state folds the
            # fingerprints into batch=-1, a replayed batch finds its OWN
            # fingerprints in the store (read_state_except can no longer
            # exclude them by partition) — without this anti-join on the
            # batch's own ids, `kept` would come out empty and the
            # replay would overwrite corpus/batch=<id> with nothing,
            # permanently losing the batch's survivors. Fingerprint rows
            # are keyed by the doc id that wrote them and ids are unique
            # across batches, so excluding the batch's ids excludes
            # exactly the batch's own prior rows.
            own_ids = uniq.select(F.col(id_col).alias("id"))
            stored_fp = stored_fp.join(F.broadcast(own_ids), "id",
                                       "left_anti")
            batch_fps = uniq.select("_fp").distinct()
            hit = (stored_fp.select(F.col("fp").alias("_fp"))
                   .join(F.broadcast(batch_fps), "_fp", "left_semi")
                   .distinct())
            kept = uniq.join(F.broadcast(hit), "_fp", "left_anti")
        else:
            kept = uniq
        (kept.select(F.col(id_col).alias("id"), F.col("_fp").alias("fp"))
         .write.mode("overwrite")
         .parquet(f"{corpus_dir}/fingerprints/batch={batch_id}"))
        batch_docs = kept.drop("_fp")

        if near_dup_threshold is not None:
            dedup_batch(batch_docs, batch_id, f"{corpus_dir}/index",
                        f"{corpus_dir}/pairs", text_col, id_col,
                        num_hashes, bands, shingle_n, near_dup_threshold,
                        components_dir=f"{corpus_dir}/components")
            # keep-one: a batch doc survives iff it is its component's
            # representative (min id). The batch's own label partition
            # covers every batch id — update_components writes a row for
            # EVERY id of the batch unconditionally, a contract that
            # matters on replay-after-compaction where the ids' labels
            # already sit unchanged in batch=-1 — so no global
            # resolution read is needed here.
            own = spark.read.parquet(
                f"{corpus_dir}/components/batch={batch_id}")
            reps = (own.filter(F.col("id") == F.col("component"))
                    .select(F.col("id").alias(id_col)))
            survivors = batch_docs.join(reps, id_col, "left_semi")
        else:
            survivors = batch_docs

        if benchmark is not None:
            # the stage shared verbatim with build_training_corpus —
            # stream==batch decontam parity by construction (semantic
            # mode included: the blocking centroids are a deterministic
            # function of the frozen benchmark, so per-batch retraining
            # reproduces the same cells; pass decontam_centroids to
            # skip that small per-batch job)
            survivors = decontam_stage(
                survivors, benchmark, text_col, id_col,
                mode=decontam_mode, min_overlap=decontam_min_overlap,
                threshold=decontam_threshold,
                semantic_dim=decontam_dim, semantic_k=decontam_k,
                semantic_n_probe=decontam_n_probe,
                semantic_centroids=decontam_centroids)

        survivors.write.mode("overwrite").parquet(
            f"{corpus_dir}/corpus/batch={batch_id}")
        if n_shards is not None:
            if budget_tokens is None:
                raise ValueError("n_shards requires budget_tokens "
                                 "(context-window size for packing)")
            from harvesting_extract_to_ttl_service_spark.operators.corpus import (
                write_training_shards,
            )

            # pack from the just-written survivors parquet, not the live
            # plan: the survivor plan ends in two joins past the
            # materialization cut, and the shard write is a second
            # action over the same rows
            write_training_shards(
                spark.read.parquet(f"{corpus_dir}/corpus/batch={batch_id}"),
                f"{corpus_dir}/shards/batch={batch_id}", n_shards,
                budget_tokens, text_col, id_col)
    finally:
        if materialize_mode == "persist":
            uniq.unpersist()


def read_corpus(spark: SparkSession, corpus_dir: str) -> DataFrame:
    """The accumulated corpus output: union of every batch's survivors
    (one directory listing — no per-batch driver loop). Raises if the
    stream has not produced any batch yet."""
    return (spark.read.option("basePath", f"{corpus_dir}/corpus")
            .parquet(f"{corpus_dir}/corpus").drop("batch"))


def read_training_shard(spark: SparkSession, corpus_dir: str,
                        shard: int, id_col: str = "doc_id") -> DataFrame:
    """One shard's training stream across every batch, in load order —
    the read contract of the per-batch shard writer: rows ordered by
    (batch, start_offset, id), which a loader concatenates and chunks
    sequentially (chunk = floor(start_offset / budget) is monotone in
    start_offset within a batch, so this equals (batch, chunk, id)
    order). The id tie-break is load-bearing: start_offset ties ARE
    possible — a zero-token document (e.g. a text stripped empty by
    strip_repeated_substrings) advances the running offset by 0 — and
    without it the load order would be nondeterministic across runs,
    while the shard writer itself already pins (shard, chunk, id). The
    ``shard = k`` filter is a partition-pruning predicate — the scan
    touches only the ``batch=*/shard=k`` subtrees, never the other
    shards' files."""
    return (spark.read.option("basePath", f"{corpus_dir}/shards")
            .parquet(f"{corpus_dir}/shards")
            .filter(F.col("shard") == shard)
            .orderBy("batch", "start_offset", id_col))


def finalize_corpus(spark: SparkSession, corpus_dir: str,
                    out_dir: str | None = None, *,
                    cap_per_lang: int | None = None,
                    cap_strata_col: str = "lang",
                    temperature_alpha: float | None = None,
                    temperature_budget_tokens: int | None = None,
                    temperature_exact: bool = False,
                    n_shards: int = 16, budget_tokens: int = 2048,
                    shuffle_epoch: int | None = None,
                    bpe_merges: list[tuple[str, str]] | None = None,
                    emit_token_ids: bool = False,
                    eos_token: str | None = None,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> DataFrame:
    """The quiesce-time finalization job over a STREAMED corpus — the
    step :func:`corpus_batch` deliberately defers: per-language caps and
    temperature sampling are properties of the ACCUMULATED corpus (their
    rates come from corpus-level counts), so a production pipeline runs
    them once per training run, not per micro-batch. This packages that
    composition:

      1. :func:`read_corpus` — the accumulated survivors (one
         partitioned read, no per-batch driver loop);
      2. ``cap_per_lang`` → the SAME capped-stratified-sample stage the
         batch funnel runs (``operators/corpus.capped_sample_stage``,
         shared verbatim — including the predicted-language fallback
         when ``cap_strata_col`` is absent), so finalize-over-stream
         equals ``build_training_corpus(cap_per_lang=...)`` over the
         same documents exactly (the parity
         tests/test_corpus_stream.py pins);
      3. ``temperature_alpha`` (+ ``temperature_budget_tokens``) →
         ``temperature_sample_stage``: realize a temperature-``alpha``
         token-budget mixture over the capped corpus
         (``temperature_exact=True`` for the token-prefix cut — the
         post-cap strata are already bounded, the setting where the
         per-stratum sort is cheap and the O(1-doc) budget precision
         pays);
      4. ``out_dir`` given → ``write_training_shards``: the final
         training artifact (shard-partitioned, context-window-packed,
         loader-ordered), REPLACING ``out_dir`` — unlike the per-batch
         incremental ``shards/`` tree, a finalized artifact is a
         point-in-time snapshot of the whole corpus, re-cut per
         training run. ``shuffle_epoch`` makes that cut a seeded
         per-epoch global shuffle (``operators/corpus.epoch_shuffle``):
         run finalize once per epoch with epoch = 0, 1, ... for
         independently-ordered, exactly-reproducible training artifacts.

    ``bpe_merges`` (functions/tokenizer.load_bpe_merges) switches EVERY
    token unit in this job — the temperature mixture's counts and the
    shard/packing budgets — to the trained tokenizer, via one Arrow
    counting pass whose ``n_bpe_tokens`` column also ships inside the
    artifact (a training loader can audit its budgets without
    re-tokenizing). The finalized artifact is where trained units
    matter: the per-batch incremental ``shards/`` tree keeps the cheap
    whitespace unit.

    ``emit_token_ids=True`` (requires ``bpe_merges``) makes the SAME
    Arrow pass also emit ``bpe_ids`` (token ids under the derived
    vocab, functions/tokenizer.bpe_vocab — no second encode), and the
    written artifact becomes the DIRECTLY-TRAINABLE id-array form:
    text dropped, ``_vocab.json`` sidecar next to the manifest, read
    back with operators/corpus.read_token_id_shard /
    read_token_id_vocab — the stream-quiesce twin of
    operators/corpus.write_token_id_shards. ``eos_token`` (requires
    ``emit_token_ids``) reserves the document separator in the vocab
    and appends its id per document BEFORE any budgeted stage
    (operators/corpus.append_doc_separator), so temperature budgets
    and packing coordinates are all in loader units and context
    windows never span a document boundary unmarked; the convention
    rides the manifest (``eos_token``/``eos_id``).

    Returns the finalized survivors (lazy; ``out_dir=None`` for a
    dry/inspection run). Every stage is a broadcast-rate hash filter or
    a shard-partitioned write — no global sort, no corpus shuffle beyond
    the one shard repartition the writer needs.

    Snapshot semantics vs a still-running stream: the corpus partition
    listing is pinned when this function READS the directory, so a batch
    landing afterwards is wholly excluded — finalization sees a
    batch-boundary-consistent snapshot, never a torn batch (each batch's
    survivors are one ``corpus/batch=<id>`` overwrite). Re-run
    finalize_corpus to pick up later batches; a snapshot test pins this.

    Reference analogue: the task-completion sweep that closes each
    harvesting job after its per-delta processing
    (/root/reference/lib/pipeline-import.js:109-116) — here the "sweep"
    is the corpus-level sampling the per-batch loop cannot do."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        _stratum_frame,
        capped_stratified_sample,
        temperature_sample,
        temperature_sample_exact,
        write_training_shards,
    )

    if temperature_alpha is not None and temperature_budget_tokens is None:
        raise ValueError("temperature_alpha requires "
                         "temperature_budget_tokens (the token "
                         "budget the mixture realizes)")
    if emit_token_ids and bpe_merges is None:
        raise ValueError("emit_token_ids requires bpe_merges — token "
                         "ids are defined by the trained tokenizer")
    if eos_token is not None and not emit_token_ids:
        raise ValueError("eos_token requires emit_token_ids — the "
                         "separator is an id-array convention")
    survivors = read_corpus(spark, corpus_dir)
    count_col = None
    vocab = None
    if bpe_merges is not None:
        from harvesting_extract_to_ttl_service_spark.functions.tokenizer import (
            bpe_token_count,
            bpe_vocab,
        )

        if emit_token_ids:
            vocab = (bpe_vocab(bpe_merges) if eos_token is None
                     else bpe_vocab(bpe_merges,
                                    specials=("<unk>", eos_token)))
        survivors = bpe_token_count(survivors, bpe_merges, text_col,
                                    id_col, emit_ids=emit_token_ids,
                                    vocab=vocab)
        if eos_token is not None:
            from harvesting_extract_to_ttl_service_spark.operators.corpus import (  # noqa: E501
                append_doc_separator,
            )

            # count the separator BEFORE any budgeted stage, so
            # temperature budgets and packing coordinates are all in
            # the units the loader consumes
            survivors = append_doc_separator(survivors,
                                             vocab[eos_token])
        count_col = "n_bpe_tokens"
    if cap_per_lang is not None or temperature_alpha is not None:
        # resolve the stratum frame ONCE for both sampling stages — with
        # the predicted-language fallback, going through the per-stage
        # helpers would re-annotate (a full tokenize pass) per stage.
        # Sampling decisions are identical to the stage helpers': same
        # annotation, same counts, same hash-fraction membership.
        orig = survivors.columns
        sdf, col = _stratum_frame(survivors, cap_strata_col, text_col,
                                  id_col)
        if cap_per_lang is not None:
            sdf = capped_stratified_sample(sdf, cap_per_lang,
                                           strata_col=col, id_col=id_col)
        if temperature_alpha is not None:
            sampler = (temperature_sample_exact if temperature_exact
                       else temperature_sample)
            sdf = sampler(sdf, strata_col=col, text_col=text_col,
                          id_col=id_col, alpha=temperature_alpha,
                          budget_tokens=temperature_budget_tokens,
                          count_col=count_col)
        survivors = sdf.select(*orig)
    if out_dir is not None:
        from harvesting_extract_to_ttl_service_spark.operators.corpus import (
            write_shard_manifest,
        )

        to_write = survivors
        if emit_token_ids:
            to_write = survivors.drop(text_col)
        write_training_shards(to_write, out_dir, n_shards,
                              budget_tokens, text_col, id_col,
                              shuffle_epoch=shuffle_epoch,
                              count_col=count_col)
        if emit_token_ids:
            from harvesting_extract_to_ttl_service_spark.operators.corpus import (  # noqa: E501
                write_vocab_sidecar,
            )

            write_vocab_sidecar(spark, out_dir, vocab)
        # the finalized artifact ships with its integrity contract: a
        # loader runs check_shard_manifest before training
        extra = (None if eos_token is None
                 else {"eos_token": eos_token,
                       "eos_id": vocab[eos_token]})
        write_shard_manifest(spark, out_dir, budget_tokens,
                             shuffle_epoch=shuffle_epoch, extra=extra)
    return survivors


def compact_corpus_state(spark: SparkSession, corpus_dir: str,
                         target_partitions: int | None = None
                         ) -> dict[str, int]:
    """Maintenance: fold each of the stream's per-batch STATE tables into
    one consolidated ``batch=-1`` partition — a year of 5-minute batches
    is ~100k partition directories per table, and their listing alone
    would dominate every state read at namenode scale. Fingerprints and
    the LSH index are append-only facts (plain fold,
    :func:`~.dedup_stream.compact_dedup_index`); component labels resolve
    highest-batch-wins before folding
    (:func:`~.dedup_stream.compact_components`).

    The corpus OUTPUT partitions are deliberately untouched: they are the
    deliverable, and downstream consumers may have shipped them already.
    Run from maintenance, not from inside the stream — compaction
    rewrites history partitions the stream only ever appends to; a batch
    replayed after compaction rewrites only its own (now redundant but
    harmless) partitions. Returns per-table folded-partition counts."""
    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.dedup_stream import (
        compact_components,
        compact_dedup_index,
    )

    out = {}
    # idwatermark folds with the generic append-only compactor: the rows
    # keep their in-row src_batch, so the replay self-exclusion in
    # _check_monotone_ids still works from batch=-1
    # urls is append-only (id, u) facts like fingerprints — same fold
    for name, compactor in (("fingerprints", compact_dedup_index),
                            ("index", compact_dedup_index),
                            ("components", compact_components),
                            ("idwatermark", compact_dedup_index),
                            ("urls", compact_dedup_index)):
        path = f"{corpus_dir}/{name}"
        fs, root = _hadoop_fs(spark, path)
        # a table may be absent by configuration (near_dup_threshold=None
        # runs no LSH index / components) — absence is not an error here
        out[name] = (compactor(spark, path, target_partitions)
                     if fs.exists(root) else 0)
    return out


def run_corpus_stream(docs_stream: DataFrame, corpus_dir: str,
                      checkpoint: str,
                      benchmark: DataFrame | None = None,
                      trigger_available_now: bool = True,
                      on_batch: Callable[[int], None] | None = None,
                      **funnel_kwargs):
    """Attach the corpus funnel to a streaming document source. Returns
    the started StreamingQuery; checkpointed batch ids + the batch=<id>
    overwrite layout make restarts replay-idempotent. ``funnel_kwargs``
    pass through to :func:`corpus_batch` (thresholds, language
    allowlist, decontamination mode, LSH parameters)."""

    def batch_fn(df: DataFrame, batch_id: int) -> None:
        corpus_batch(df, batch_id, corpus_dir, benchmark, **funnel_kwargs)
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
