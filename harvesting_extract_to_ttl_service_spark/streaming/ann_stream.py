"""Streaming IVF ANN index — a persistent approximate-nearest-neighbor
index over an embedding column, built micro-batch by micro-batch and
searched with partition pruning.

The batch operators (`operators/similarity.ivf_topk`) re-assign cells on
every query — fine for one-off jobs, wrong for the operating mode where
embeddings arrive continuously and are searched repeatedly: a 100 TB
corpus must pay the cell assignment ONCE per vector (at ingest), store
the index partitioned by cell, and have every search read only the
probed cells' files. This module is that mode:

  * :func:`ivf_index_batch` — assign one micro-batch to its FROZEN
    centroids (trained once, e.g. `train_ivf_centroids` over an early
    sample) and append it under ``<index_dir>/batch=<id>/ivf_cell=<c>``;
    same replay-idempotent ``batch=<id>`` overwrite layout as the dedup
    indexes (module docstring of :mod:`.dedup_stream`). Per-vector norms
    are stored, so queries never recompute them.
  * :func:`ivf_search` — rank the centroids against the query
    driver-side, then read ONLY the ``n_probe`` nearest cells: the cell
    filter is a partition-pruning predicate over the two-level
    ``batch=*/ivf_cell=<c>`` tree, so search I/O scales with the probed
    cells' share of the corpus, not the corpus.
  * :func:`compact_ivf_index` — fold the per-batch partitions into the
    generational segment tree (``gen=<g>/seg=<s>/ivf_cell=<c>``)
    PRESERVING the cell partitioning (the namenode-scale motivation of
    :func:`.dedup_stream.compact_dedup_index`; a fold that dropped the
    cell dirs would turn every search back into a full scan). The fold
    is the BM25 index's tiered read-transparent protocol: minor folds
    cost O(new data), the pointer flip is atomic, searches run
    undisturbed throughout, and one compactor at a time is enforced by
    an expiring lease.
  * :func:`ivf_delete_vecs` — tombstoned deletion: anti-joined out of
    every search immediately, physically applied by a major fold.

The centroid list is the index's identity: a search (or a later batch)
against different centroids would probe the wrong cells and silently
return garbage, so the centroids are pinned by an md5 digest in the
``_ivf_params.json`` sidecar (the `.dedup_stream._check_sidecar_params`
pattern) and every entry point verifies it.

Reference analogue: the reference delegates all querying to an external
store it keeps updated per delta (/root/reference/app.js:35-38); here
the "store" is a parquet tree whose update is one set-oriented job per
micro-batch.
"""

from __future__ import annotations

import hashlib
import json
import math
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.operators.similarity import (
    dot,
    ivf_assign,
    norm,
)
from harvesting_extract_to_ttl_service_spark.streaming.dedup_stream import (
    _check_sidecar_params,
)
from harvesting_extract_to_ttl_service_spark.streaming.generations import (
    _read_json_sidecar,
    _write_json_sidecar,
)


def _centroid_digest(centroids: list[list[float]]) -> str:
    """Deterministic identity of a centroid list: md5 over the exact
    float reprs (any change to k, dim, or a single coordinate changes
    the digest)."""
    payload = json.dumps([[repr(float(x)) for x in c] for c in centroids])
    return hashlib.md5(payload.encode()).hexdigest()


def _pq_digest(codebooks: list[list[list[float]]]) -> str:
    """PQ-codebook twin of :func:`_centroid_digest`: any change to m,
    ksub, sub, or one coordinate changes the digest."""
    payload = json.dumps([[[repr(float(x)) for x in c] for c in book]
                          for book in codebooks])
    return hashlib.md5(payload.encode()).hexdigest()


def _check_ivf_sidecar(spark: SparkSession, index_dir: str,
                       centroids: list[list[float]],
                       quantized: bool = False,
                       pq_codebooks: list[list[list[float]]] | None = None,
                       pq_residual: bool = False) -> None:
    # `quantized` / `pq_md5` / `pq_residual` are part of the index's
    # identity like the centroids: an int8 index has no `v` column to
    # float-search, a PQ index has neither, PQ codes cut from different
    # codebooks mean different vectors, and RESIDUAL codes are relative
    # to each row's cell centroid (raw-decoding them reconstructs
    # garbage) — so mixing modes/codebooks must refuse up front.
    # Backfilled for indexes built before each flag existed (all
    # float/raw — behavior-identical defaults).
    _check_sidecar_params(
        spark, index_dir,
        {"k": len(centroids), "dim": len(centroids[0]),
         "centroids_md5": _centroid_digest(centroids),
         "quantized": quantized,
         "pq_md5": (None if pq_codebooks is None
                    else _pq_digest(pq_codebooks)),
         "pq_residual": bool(pq_codebooks is not None and pq_residual)},
        filename="_ivf_params.json",
        defaults={"quantized": False, "pq_md5": None,
                  "pq_residual": False})


# --- the read pointer (the BM25 index's generation discipline, ported) ------


class _IvfView(NamedTuple):
    """One search's resolved snapshot of the IVF index: pointer state
    plus the visible unfolded batch ids and active tombstone ids — all
    read once, so no two reads of one plan can straddle a concurrent
    pointer flip. ``segments is None`` only while no generation tree
    exists (IVF generations were born segmented)."""

    gen: int
    segments: list | None
    fence: int
    applied_dels: int
    vis: list
    dels: list


def _ivf_pointer(spark: SparkSession,
                 index_dir: str) -> tuple[int, list | None, int, int]:
    """(generation, segments, max_folded_batch, applied_dels) from
    ``_ivf_generation.json``; (−1, None, −1, −1) for a pre-generation
    index (all data in batch dirs, legacy ``batch=-1`` included)."""
    ptr = _read_json_sidecar(spark, f"{index_dir}/_ivf_generation.json")
    if ptr is None:
        return -1, None, -1, -1
    segs = ptr.get("segments")
    return (int(ptr["generation"]),
            None if segs is None else sorted(int(s) for s in segs),
            int(ptr["max_folded_batch"]),
            int(ptr.get("applied_dels", -1)))


def _ivf_visible_batches(spark: SparkSession, index_dir: str,
                         gen: int, fence: int) -> list[int]:
    """Committed (own ``_SUCCESS``) batch dirs the pointer makes
    readable (id > fence; legacy ``batch=-1`` only while no generation
    tree exists)."""
    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )

    fs, _ = _hadoop_fs(spark, index_dir)
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    root = jpath(index_dir)
    if not fs.exists(root):
        return []
    ids = []
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if not name.startswith("batch="):
            continue
        i = int(name.split("=", 1)[1])
        if i > fence or (i == -1 and gen < 0):
            if fs.exists(jpath(f"{index_dir}/batch={i}/_SUCCESS")):
                ids.append(i)
    return sorted(ids)


def _ivf_visible_dels(spark: SparkSession, index_dir: str,
                      applied: int) -> list[int]:
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


def _ivf_view(spark: SparkSession, index_dir: str) -> _IvfView:
    gen, segments, fence, applied = _ivf_pointer(spark, index_dir)
    return _IvfView(
        gen, segments, fence, applied,
        _ivf_visible_batches(spark, index_dir, gen, fence),
        _ivf_visible_dels(spark, index_dir, applied))


def _ivf_frames(spark: SparkSession, index_dir: str,
                view: _IvfView | None = None,
                apply_dels: bool = True,
                cells: list[int] | None = None) -> DataFrame:
    """Union of the readable index trees — the generation's segments
    plus the visible unfolded batch dirs, read by EXPLICIT path so
    partition discovery never touches a half-committed or superseded
    directory; every tree keeps ``ivf_cell`` as a directory-level
    partition column under its own basePath, so probe filters still
    prune at the directory level. Active tombstones anti-join out
    (broadcast) unless ``apply_dels=False`` (the fold's own read does
    its apply explicitly).

    ``cells`` (the search's driver-ranked probe list) prunes the file
    LISTING itself: Spark's file index enumerates every directory
    under the given paths before partition filters trim them, so a
    search passing only tree roots lists segments×k cell dirs per
    query. With ``cells`` the read names the probed
    ``…/ivf_cell=<c>`` leaf dirs explicitly (existence-checked —
    partitionBy writes only non-empty cells), so per-query driver
    cost tracks n_probe, not the index layout. Maintenance paths
    (folds, deletes, retrain, drift) pass None."""
    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )

    view = view if view is not None else _ivf_view(spark, index_dir)
    fs, _ = _hadoop_fs(spark, index_dir)
    jpath = spark._jvm.org.apache.hadoop.fs.Path

    def _cell_paths(parents: list[str]) -> list[str] | None:
        # one listStatus per parent (not one exists() per pair), so
        # object-store RPC count tracks the tree count, not n_probe
        if cells is None:
            return None
        want = {f"ivf_cell={c}" for c in cells}
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
    if view.gen >= 0 and view.segments:
        root = f"{index_dir}/gen={view.gen}"
        parents = [f"{root}/seg={s}" for s in view.segments]
        sub = _cell_paths(parents)
        frames.append(
            spark.read.option("basePath", root)
            .parquet(*(sub or parents))
            .drop("seg"))
    if view.vis:
        parents = [f"{index_dir}/batch={i}" for i in view.vis]
        sub = _cell_paths(parents)
        frames.append(
            spark.read.option("basePath", index_dir)
            .parquet(*(sub or parents))
            .drop("batch"))
    if not frames:
        raise ValueError(
            f"ivf index at {index_dir} has no readable data (no "
            f"generation tree and no committed batches)")
    out = frames[0]
    for f2 in frames[1:]:
        out = out.unionByName(f2)
    if apply_dels and view.dels:
        from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
            _dels_bytes,
            _size_conf_bytes,
        )

        troot = f"{index_dir}/tombstones"
        tomb = spark.read.parquet(
            *[f"{troot}/del={d}" for d in view.dels]).select("id")
        # broadcast below the autoBroadcastJoinThreshold (the common
        # case), shuffle anti-join beyond it — the size signal is the
        # del dirs' byte total from the listing, no count job
        if _dels_bytes(spark, index_dir, view.dels) \
                <= _size_conf_bytes(spark):
            tomb = F.broadcast(tomb)
        out = out.join(tomb, "id", "left_anti")
    return out


def ivf_index_batch(vecs: DataFrame, batch_id: int, index_dir: str,
                    centroids: list[list[float]],
                    vec_col: str = "embedding",
                    id_col: str = "vec_id",
                    quantize: bool = False,
                    pq_codebooks: list[list[list[float]]] | None = None,
                    pq_residual: bool = False) -> None:
    """Append one micro-batch of vectors to the persistent IVF index:
    one `ivf_assign` projection (pure column expression — no shuffle
    beyond the partitioned write) + one ``batch=<id>`` overwrite,
    partitioned by cell. A replayed batch rewrites its own directory
    byte-identically (assignment is deterministic given the pinned
    centroids), so the index needs no transactional store.

    ``quantize=True`` stores int8 codes + per-vector scale instead of
    the float vector (operators/similarity.quantize_int8 — ~4× smaller
    index; assignment still runs on the FLOAT input, so cell membership
    is identical to the float index), plus the integer code norm so
    quantized searches never recompute it. ``pq_codebooks`` stores
    m-byte PRODUCT-QUANTIZED codes + reconstruction norm instead
    (operators/similarity.pq_encode — the order-of-magnitude
    compression; same float-input assignment, so cell membership again
    matches the float index). ``pq_residual=True`` upgrades the PQ
    store to classic IVFADC (Jégou et al. 2011): codes quantize the
    RESIDUAL ``x − centroid(cell)`` instead of the raw vector
    (operators/similarity.pq_encode_residual — train the codebooks on
    residuals via ivf_residuals + train_pq_codebooks), concentrating
    the m bytes on within-cell variance for measurably higher recall
    at the same m (tests/test_ann_recall.py); ``pnorm`` stores the
    full-reconstruction norm ``‖centroid + r̂‖`` so search shape is
    unchanged. The mode AND the codebook digest are pinned in the
    sidecar — float searches against a compressed index, probes cut
    from different codebooks, or raw-ADC reads of residual codes,
    refuse up front."""
    if quantize and pq_codebooks is not None:
        raise ValueError("ivf_index_batch: quantize (int8) and "
                         "pq_codebooks are mutually exclusive modes")
    if pq_residual and pq_codebooks is None:
        raise ValueError("ivf_index_batch: pq_residual requires "
                         "pq_codebooks (residual-trained)")
    spark = vecs.sparkSession
    _check_ivf_sidecar(spark, index_dir, centroids, quantized=quantize,
                       pq_codebooks=pq_codebooks,
                       pq_residual=pq_residual)
    marker = _read_json_sidecar(spark,
                                f"{index_dir}/_ivf_compacting.json")
    if marker:
        # same contract as the BM25 ingest fence: a replay of a batch
        # the running fold may be scanning would race it (silent loss
        # in the consolidated tree); fresh higher ids flow through
        through = marker.get("folding_through")
        if through is None or batch_id <= through:
            kind = ("deleting" if marker.get("deleting")
                    else f"compacting through batch {through}")
            raise ValueError(
                f"ivf_index_batch: index at {index_dir} is {kind} — "
                f"batch {batch_id} is (or may be) inside the running "
                f"maintenance job's scan; re-run it after the job "
                f"finishes (fresh higher batch ids and all searches "
                f"are unaffected)")
    _gen, _segs, fence, _applied = _ivf_pointer(spark, index_dir)
    if batch_id <= fence:
        raise ValueError(
            f"ivf_index_batch: batch {batch_id} was already folded "
            f"into a consolidated generation (max_folded_batch="
            f"{fence}) — replaying it would duplicate its vectors; "
            f"re-ingest under a fresh batch id only if the vectors "
            f"are genuinely new")
    assigned = ivf_assign(vecs.select(F.col(id_col).alias("id"),
                                      F.col(vec_col).alias("v")),
                          centroids, vec_col="v")
    if pq_residual:
        from harvesting_extract_to_ttl_service_spark.operators.similarity import (
            pq_encode_residual,
        )

        # residual encode keys off the SAME ivf_cell the row is stored
        # under — still projection-shaped (its internal cuts are
        # shuffle-free), no join
        assigned = pq_encode_residual(assigned, pq_codebooks, centroids,
                                      vec_col="v")
    elif pq_codebooks is not None:
        from harvesting_extract_to_ttl_service_spark.operators.similarity import (
            pq_encode,
        )

        # encode is a projection over the SAME rows — the cell column
        # rides along, no join, no extra exchange
        assigned = pq_encode(assigned, pq_codebooks, vec_col="v")
    elif quantize:
        from harvesting_extract_to_ttl_service_spark.operators.similarity import (
            int_dot,
            quantize_int8,
        )

        # quantization is a projection over the SAME rows — it rides the
        # assignment select, no join, no extra exchange
        assigned = quantize_int8(assigned, vec_col="v").withColumn(
            "cnorm",
            F.sqrt(int_dot(F.col("codes"), F.col("codes")).cast("double")))
    else:
        assigned = assigned.withColumn("vnorm", norm(F.col("v")))
    (assigned.write.mode("overwrite").partitionBy("ivf_cell")
     .parquet(f"{index_dir}/batch={batch_id}"))
    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )

    fs, _ = _hadoop_fs(spark, index_dir)
    if not fs.exists(spark._jvm.org.apache.hadoop.fs.Path(
            f"{index_dir}/batch={batch_id}/_SUCCESS")):
        raise ValueError(
            f"ivf_index_batch: the committer wrote "
            f"{index_dir}/batch={batch_id} WITHOUT a _SUCCESS marker — "
            f"readers gate batch visibility on it. Set "
            f"mapreduce.fileoutputcommitter.marksuccessfuljobs=true "
            f"(the Hadoop default) and re-run the batch")


def ivf_search(spark: SparkSession, index_dir: str,
               query_vec: list[float], centroids: list[list[float]],
               k: int = 10, n_probe: int = 2,
               id_col: str = "vec_id",
               quantized: bool = False,
               pq_codebooks: list[list[list[float]]] | None = None,
               pq_residual: bool = False) -> DataFrame:
    """Top-k cosine search over the accumulated index. The ``n_probe``
    nearest cells are ranked driver-side (the centroid list is tiny and
    already local); the cell IN-filter reaches the scan as a
    partition-pruning predicate, so only ``batch=*/ivf_cell=<probed>``
    subtrees are read. Results equal `operators/similarity.ivf_topk`
    over the same vectors with the same centroids (the parity the tests
    pin) — but the per-vector assignment and norm were paid at ingest,
    not per query.

    ``quantized=True`` searches an int8 index (built with
    ``ivf_index_batch(quantize=True)``): the query quantizes driver-side
    with the same floor-half-up formula and candidates score in exact
    integer arithmetic against the stored codes (per-vector scales
    cancel out of cosine — operators/similarity.quantized_cosine_topk's
    math, over the pruned cells only). ``pq_codebooks`` searches a PQ
    index (built with ``ivf_index_batch(pq_codebooks=...)``) by ADC:
    per-block lookup tables computed once driver-side, per-candidate
    work = m array lookups — IVF prunes WHICH vectors to score, PQ
    makes scoring them cheap, the classic pairing.
    ``pq_residual=True`` searches a residual (IVFADC) index: the
    numerator splits as ``q·centroid(cell) + Σ_b LUT[b][code_b]`` —
    the same block LUTs (against the residual codebooks) plus one
    driver-computed constant per PROBED cell (n_probe doubles), so
    per-candidate work stays m+1 lookups. Mode or codebook mismatch
    against the sidecar refuses before any I/O."""
    if quantized and pq_codebooks is not None:
        raise ValueError("ivf_search: quantized (int8) and "
                         "pq_codebooks are mutually exclusive modes")
    if pq_residual and pq_codebooks is None:
        raise ValueError("ivf_search: pq_residual requires "
                         "pq_codebooks")
    _check_ivf_sidecar(spark, index_dir, centroids, quantized=quantized,
                       pq_codebooks=pq_codebooks,
                       pq_residual=pq_residual)

    def _cos(a: list[float], b: list[float]) -> float:
        num = sum(float(x) * float(y) for x, y in zip(a, b))
        return num / (math.sqrt(sum(float(x) ** 2 for x in a))
                      * math.sqrt(sum(float(y) ** 2 for y in b)))

    probed = sorted(range(len(centroids)),
                    key=lambda i: (-_cos(query_vec, centroids[i]), i))[:n_probe]
    idx = _ivf_frames(spark, index_dir, cells=probed)
    idx = idx.filter(F.col("ivf_cell").isin(probed))
    if pq_codebooks is not None:
        from harvesting_extract_to_ttl_service_spark.operators.similarity import (
            _fold_sum,
            _pq_shapes,
        )

        m, ksub, sub = _pq_shapes(pq_codebooks)
        if len(query_vec) != m * sub:
            raise ValueError(
                f"ivf_search: query dim {len(query_vec)} != m·sub "
                f"{m * sub}")
        lut = [[_fold_sum([float(query_vec[b * sub + i]) * float(c[i])
                           for i in range(sub)])
                for c in book] for b, book in enumerate(pq_codebooks)]
        qn = math.sqrt(_fold_sum([float(x) * float(x)
                                  for x in query_vec]))
        if pq_residual:
            # q·centroid per PROBED cell, driver-folded in component
            # order (matches pq_adc_topk_residual's qcell folds, so
            # stored-index search == the batch operator bit-for-bit)
            qc = {c: _fold_sum([float(q) * float(x) for q, x in
                                zip(query_vec, centroids[c])])
                  for c in probed}
            num = F.element_at(
                F.map_from_arrays(
                    F.array(*[F.lit(c) for c in probed]),
                    F.array(*[F.lit(qc[c]) for c in probed])),
                F.col("ivf_cell").cast("int"))
        else:
            num = F.lit(0.0)
        for b in range(m):
            num = num + F.element_at(
                F.array(*[F.lit(v) for v in lut[b]]),
                F.col("codes").getItem(b) + 1)
        score = num / (F.col("pnorm") * F.lit(qn))
        idx = idx.filter(F.col("pnorm") > 0)
    elif quantized:
        from harvesting_extract_to_ttl_service_spark.operators.similarity import (
            int_dot,
            quantize_vec_int8,
        )

        qcodes, _ = quantize_vec_int8(query_vec)
        qn = math.sqrt(sum(c * c for c in qcodes))
        qc = F.array(*[F.lit(int(c)) for c in qcodes])
        score = (int_dot(F.col("codes"), qc).cast("double")
                 / (F.col("cnorm") * F.lit(qn)))
    else:
        qn = math.sqrt(sum(float(x) ** 2 for x in query_vec))
        q = F.array(*[F.lit(float(x)) for x in query_vec])
        score = dot(F.col("v"), q) / (F.col("vnorm") * F.lit(qn))
    return (
        idx.select(F.col("id").alias(id_col),
                   F.round(score, 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), id_col)
        .limit(k)
    )


def ivf_search_batch(spark: SparkSession, index_dir: str,
                     queries: DataFrame, centroids: list[list[float]],
                     k: int = 10, n_probe: int = 2,
                     q_vec_col: str = "embedding",
                     q_id_col: str = "query_id",
                     id_col: str = "vec_id",
                     pq_codebooks: list[list[list[float]]] | None = None,
                     pq_residual: bool = False) -> DataFrame:
    """Batched kNN join against the STORED index — the many-queries twin
    of :func:`ivf_search` (one driver-ranked probe per call) built on
    the same plan as `operators/similarity.ivf_topk_join`: each query
    explodes to its ``n_probe`` nearest cells (a column expression), the
    index is met by an equi-join on the cell, and a per-query window
    takes the top-k.

    Partition pruning with a DataFrame of queries: the probed-cell SET
    is collected driver-side first (bounded by the centroid count — one
    small job over the query batch) and applied as an IN-filter, so the
    scan still touches only ``batch=*/ivf_cell=<probed>`` subtrees; the
    query side then broadcasts into the join. ``pq_codebooks`` searches
    a PQ index: each candidate scores as cosine(q, x̂) with the
    reconstruction looked up per block from the codebook literal
    (compute parity with the float path, but over the m-byte index —
    single-query ADC tables don't apply when every query differs; the
    win here is scanned bytes). ``pq_residual=True`` searches a
    residual (IVFADC) index: the exploded query side — already one row
    per (query, probed cell) — gains a ``q·centroid(cell)`` column
    computed on the BROADCAST side (per query-cell pair, never per
    candidate), and the numerator adds it to the per-block residual
    dots. Returns ``(q_id_col, id_col, cos_sim, rank)``, per query
    equal to :func:`ivf_search` with the same parameters."""
    from pyspark.sql import Window

    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        _fold_sum,
        _pq_shapes,
        _probe_cells,
    )

    if pq_residual and pq_codebooks is None:
        raise ValueError("ivf_search_batch: pq_residual requires "
                         "pq_codebooks")
    _check_ivf_sidecar(spark, index_dir, centroids,
                       pq_codebooks=pq_codebooks,
                       pq_residual=pq_residual)
    q = (queries.select(F.col(q_id_col).alias("qid"),
                        F.col(q_vec_col).alias("qv"))
         .withColumn("qnorm", norm(F.col("qv")))
         .withColumn("ivf_cell",
                     F.explode(_probe_cells("qv", centroids, n_probe))))
    if pq_residual:
        # q·centroid(cell) per (query, probed cell) — computed once on
        # the tiny exploded query side; dot() left-folds components in
        # order, the same double as the single-query driver fold
        cent = F.array(*[F.array(*[F.lit(float(x)) for x in c])
                         for c in centroids])
        q = q.withColumn(
            "qcell", dot(F.col("qv"),
                         F.element_at(cent, F.col("ivf_cell") + 1)))
    cells = sorted(r.ivf_cell for r in
                   q.select("ivf_cell").distinct().collect())
    idx = (_ivf_frames(spark, index_dir, cells=cells)
           .filter(F.col("ivf_cell").isin(cells)))
    if pq_codebooks is not None:
        m, ksub, sub = _pq_shapes(pq_codebooks)
        # per-block dot of the query slice against the coded
        # sub-centroid; the block LUTs are pq_adc_topk's python folds,
        # so batched results equal the single-query path bit-for-bit
        # (dot() and _fold_sum left-fold the same component order;
        # residual mode prepends the qcell term, matching the
        # single-query add order: cell constant first, then blocks)
        num = F.col("qcell") if pq_residual else F.lit(0.0)
        for b, book in enumerate(pq_codebooks):
            table = F.array(*[F.array(*[F.lit(float(x)) for x in c])
                              for c in book])
            num = num + dot(
                F.slice(F.col("qv"), b * sub + 1, sub),
                F.element_at(table, F.col("codes").getItem(b) + 1))
        score = num / (F.col("pnorm") * F.col("qnorm"))
        idx = idx.filter(F.col("pnorm") > 0)
    else:
        score = (dot(F.col("qv"), F.col("v"))
                 / (F.col("qnorm") * F.col("vnorm")))
    w = (Window.partitionBy("qid")
         .orderBy(F.col("cos_sim").desc(), F.col("id")))
    return (
        idx.join(F.broadcast(q), "ivf_cell")
        .select("qid", "id", F.round(score, 6).alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias(q_id_col), F.col("id").alias(id_col),
                "cos_sim", "rank")
    )


def ivf_delete_vecs(spark: SparkSession, index_dir: str,
                    vec_ids: list, lease_seconds: float = 600.0,
                    steal_legacy: bool = False) -> int:
    """Delete vectors from the persisted IVF index — the BM25 index's
    tombstone discipline (streaming/lexical_stream.bm25_delete_docs)
    without the stats side (cosine top-k has no corpus statistics to
    correct): one committed tombstone batch
    ``<index_dir>/tombstones/del=<d>/`` of ids, anti-joined out of
    every search's candidate set (broadcast while small, shuffle
    anti-join once the del batches outgrow the
    autoBroadcastJoinThreshold), physically applied and retired by the
    next MAJOR fold or retrain via the pointer's ``applied_dels``
    watermark. A replayed source batch containing a deleted vector
    does not resurrect it. Ids already tombstoned or absent from the
    index are no-ops; returns the count newly tombstoned. Deletes hold
    the SAME expiring maintenance lease as the compactor
    (``_ivf_compacting.json``, payload ``deleting``): a delete
    mid-fold could race the fold, and two concurrent deletes could
    pick the same ``del=<d>`` slot and silently lose the first
    writer's tombstones — the lease excludes both. The id list is
    driver-side — bounded by the deletion set; for corpus-scale sets
    use :func:`ivf_delete_vecs_df`."""
    ids = list(dict.fromkeys(vec_ids))
    if not ids:
        return 0
    return _ivf_delete(spark, index_dir, ids, None, lease_seconds,
                       steal_legacy)


def ivf_delete_vecs_df(spark: SparkSession, index_dir: str,
                       ids_df: DataFrame, id_col: str = "id",
                       lease_seconds: float = 600.0,
                       steal_legacy: bool = False) -> int:
    """DataFrame-native twin of :func:`ivf_delete_vecs` — the
    corpus-scale deletion path: the doomed id set stays distributed
    end to end (no driver-side collect, no forced broadcast), so mass
    dedup losers numbering in the hundreds of millions write their
    tombstone batch as one shuffle job, and search-side anti-joins
    switch to shuffle automatically past the broadcast threshold.
    Same lease, slot, visibility and double-delete semantics as the
    list form; returns the count newly tombstoned."""
    return _ivf_delete(
        spark, index_dir, None,
        ids_df.select(F.col(id_col).alias("id")).distinct(),
        lease_seconds, steal_legacy)


def _ivf_delete(spark: SparkSession, index_dir: str,
                ids: list | None, ids_df: DataFrame | None,
                lease_seconds: float, steal_legacy: bool) -> int:
    """Shared tombstone-write core of :func:`ivf_delete_vecs` (pushed
    IN-filter fast path) and :func:`ivf_delete_vecs_df` (distributed
    joins)."""
    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.generations import (  # noqa: E501
        acquire_lease,
        release_lease,
    )

    if _read_json_sidecar(spark, f"{index_dir}/_ivf_params.json") \
            is None:
        raise ValueError(f"ivf_delete_vecs: no index at {index_dir}")
    marker = f"{index_dir}/_ivf_compacting.json"
    owner = acquire_lease(spark, marker, lease_seconds,
                          payload={"deleting": True},
                          steal_legacy=steal_legacy)
    try:
        view = _ivf_view(spark, index_dir)
        if view.dels:
            troot = f"{index_dir}/tombstones"
            tomb = spark.read.parquet(
                *[f"{troot}/del={d}" for d in view.dels]).select("id")
            if ids is not None:
                already = {r["id"] for r in
                           tomb.filter(F.col("id").isin(ids))
                           .distinct().collect()}
                ids = [i for i in ids if i not in already]
                if not ids:
                    return 0
            else:
                ids_df = ids_df.join(tomb, "id", "left_anti")
        if ids is not None:
            present = (_ivf_frames(spark, index_dir, view,
                                   apply_dels=False)
                       .filter(F.col("id").isin(ids))
                       .select("id").distinct())
        else:
            present = (_ivf_frames(spark, index_dir, view,
                                   apply_dels=False)
                       .select("id")
                       .join(ids_df, "id", "left_semi").distinct())
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
        # slot uniqueness is lease-guaranteed: no other delete can run
        # between this listing and the write below
        nxt = (min(uncommitted) if uncommitted
               else (max(committed) + 1 if committed else 0))
        nxt = max(nxt, view.applied_dels + 1)
        out = f"{index_dir}/tombstones/del={nxt}"
        if ids is not None:
            present = present.coalesce(1)  # tiny by contract
        present.write.mode("overwrite").parquet(out)
        if not fs.exists(jpath(f"{out}/_SUCCESS")):
            raise ValueError(
                f"ivf_delete_vecs: the committer wrote {out} WITHOUT a "
                f"_SUCCESS marker — readers gate tombstone visibility "
                f"on it. Set mapreduce.fileoutputcommitter."
                f"marksuccessfuljobs=true and re-run")
        n = spark.read.parquet(out).count()
        if n == 0:
            fs.delete(jpath(out), True)
        return n
    finally:
        release_lease(spark, marker, owner)


def compact_ivf_index(spark: SparkSession, index_dir: str,
                      target_partitions: int | None = None,
                      retain_old: bool = False,
                      full: bool = False, max_segments: int = 8,
                      lease_seconds: float = 3600.0,
                      max_batch: int | None = None,
                      steal_legacy: bool = False) -> int:
    """Fold the per-batch index partitions into the consolidated
    generation tree, PRESERVING the ``ivf_cell`` partitioning (dropping
    it would turn every search back into a full scan — the generic
    :func:`.dedup_stream.compact_dedup_index` is NOT layout-safe here).

    This is the BM25 index's tiered generational protocol
    (streaming/lexical_stream.compact_bm25_index) ported verbatim minus
    the stats side: a MINOR fold (default) merges only the unfolded
    batch dirs into one new segment ``gen=<g>/seg=<s>/ivf_cell=…`` —
    O(new data); past ``max_segments`` the fold turns TIERED
    (size-tiered merging): the smallest half of the segments by
    on-disk bytes merge with the batch dirs into one new segment of
    the same generation, the large half untouched — no fold is ever
    O(index) unless asked for (the N^(1/k) ladder the BM25 twin's
    docstring derives); a MAJOR fold (``full=True`` only, or the
    pre-segment migration) merges all segments + batches into
    ``seg=0`` of ``gen=<g+1>`` and physically applies the
    :func:`ivf_delete_vecs` tombstones (tiered/minor folds leave them
    logical). Bulk output lands in an owner-unique staging dir
    promoted only after a fresh ownership check (generations.
    promote_staged), so a zombie fold that lost its lease mid-write
    can never land files in the directory a takeover flips. Searches
    resolve the one-file ``_ivf_generation.json`` pointer once and read
    exactly the trees it names — the fold only ADDS until the pointer
    atomically flips (manifest written LAST marks the fold complete),
    after which the superseded trees are deleted (``retain_old=True``
    defers that to the next run). Replaced the pre-generation in-place
    ``batch=-1`` overwrite, which a concurrent search could race
    (transiently missing candidates) and a crash between promote and
    delete could double. One compactor at a time is enforced by the
    expiring lease in ``_ivf_compacting.json``; a replay of a folded
    batch refuses at the ``max_folded_batch`` fence, and fresh ingest
    flows through a running fold once its ``folding_through`` snapshot
    publishes. ``max_batch`` bounds the fold to ids at or below it —
    what makes in-stream auto-compaction replay-safe
    (:func:`run_ivf_index_stream` with ``compact_every``; see the BM25
    twin's docstring for the reasoning). Returns the number of batch
    partitions folded."""
    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.generations import (  # noqa: E501
        acquire_lease,
        check_lease,
        promote_staged,
        refresh_lease,
        release_lease,
        staging_path,
        sweep_staging,
    )

    fs, _ = _hadoop_fs(spark, index_dir)
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    marker = f"{index_dir}/_ivf_compacting.json"
    owner = acquire_lease(spark, marker, lease_seconds,
                          payload={"compacting": True},
                          steal_legacy=steal_legacy)

    def _done(n: int) -> int:
        release_lease(spark, marker, owner)
        return n

    gen, segments, fence, applied = _ivf_pointer(spark, index_dir)
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
            check_lease(spark, marker, owner)
            _ivf_flip(spark, index_dir, state)
            if not retain_old:
                _ivf_cleanup(spark, index_dir, state)
            return _done(0)
        if tg != gen:
            if fs.exists(jpath(f"{index_dir}/gen={tg}")):
                fs.delete(jpath(f"{index_dir}/gen={tg}"), True)
        else:
            p = jpath(f"{index_dir}/gen={tg}/seg={ts}")
            if fs.exists(p):
                fs.delete(p, True)
    # dead fold attempts that never promoted (owner-unique _stage_*)
    sweep_staging(spark, *[f"{index_dir}/gen={tg}"
                           for tg, _ts in candidates])
    if not retain_old:
        _ivf_cleanup(spark, index_dir,
                     {"generation": gen, "segments": segments,
                      "max_folded_batch": fence,
                      "applied_dels": applied})

    vis = _ivf_visible_batches(spark, index_dir, gen, fence)
    if max_batch is not None:
        vis = [i for i in vis if i <= max_batch]
    dels = _ivf_visible_dels(spark, index_dir, applied)
    major = full or gen < 0 or segments is None
    tiered = (not major) and bool(segments) \
        and len(segments) + 1 > max_segments
    if major:
        if gen < 0 and not vis:
            return _done(0)
        if not full and not vis and not dels:
            return _done(0)
    elif not vis:
        return _done(0)
    new_fence = max([fence] + [i for i in vis if i >= 0])
    # stranded guard (same reasoning as BM25): an uncommitted batch dir
    # (no _SUCCESS — a crashed write) inside the fold's range would be
    # fenced-then-deleted unfolded; refuse loudly instead
    root = jpath(index_dir)
    batch_ids = [
        int(st.getPath().getName().split("=", 1)[1])
        for st in (fs.listStatus(root) if fs.exists(root) else [])
        if st.getPath().getName().startswith("batch=")]
    stranded = sorted(i for i in batch_ids
                      if fence < i <= new_fence and i not in set(vis))
    if stranded:
        release_lease(spark, marker, owner)
        raise ValueError(
            f"compact_ivf_index: batch(es) {stranded} at {index_dir} "
            f"have no _SUCCESS commit marker (a write crashed) and "
            f"fall inside this fold's range — folding would fence "
            f"them unfolded. Replay each batch (ivf_index_batch "
            f"commits it) or delete its batch=<id> dir, then re-run")
    refresh_lease(spark, marker, owner, lease_seconds,
                  payload={"compacting": True,
                           "folding_through": new_fence})
    merged: list[int] = []
    if major:
        tg, ts = (gen + 1 if gen >= 0 else 0), 0
        state = {"generation": tg, "segments": [0],
                 "max_folded_batch": new_fence,
                 "applied_dels": max([applied] + dels)}
        src_view = _IvfView(gen, segments, fence, applied, vis, dels)
        src = _ivf_frames(spark, index_dir, src_view, apply_dels=True)
    else:
        tg, ts = gen, (max(segments) + 1) if segments else 0
        if tiered:
            # size-tiered merge candidates: the smallest HALF of the
            # segments by on-disk bytes (ties by id) merge with the
            # batch dirs; the large half is never read or rewritten
            sizes = {s: fs.getContentSummary(jpath(
                f"{index_dir}/gen={gen}/seg={s}")).getLength()
                for s in segments}
            order = sorted(segments, key=lambda s: (sizes[s], s))
            m = max(len(segments) + 1 - max_segments,
                    math.ceil(len(segments) / 2))
            merged = sorted(order[:m])
        keep = [s for s in segments if s not in set(merged)]
        state = {"generation": gen, "segments": sorted(keep + [ts]),
                 "max_folded_batch": new_fence,
                 "applied_dels": applied}
        src_view = _IvfView(gen, merged, fence, applied, vis, [])
        src = _ivf_frames(spark, index_dir, src_view, apply_dels=False)
    if target_partitions is not None:
        src = src.repartition(target_partitions, F.col("ivf_cell"))
    # owner-unique staging, promoted only after a fresh ownership check
    stage = staging_path(f"{index_dir}/gen={tg}", ts, owner)
    (src.write.mode("overwrite").partitionBy("ivf_cell").parquet(stage))
    promote_staged(spark, marker, owner,
                   [(stage, f"{index_dir}/gen={tg}/seg={ts}")])
    check_lease(spark, marker, owner)
    _write_json_sidecar(
        spark, f"{index_dir}/gen={tg}/_manifest_seg={ts}.json",
        {**state, "n_folded": len(vis), "merged_segments": merged})
    check_lease(spark, marker, owner)
    _ivf_flip(spark, index_dir, state)
    if not retain_old:
        _ivf_cleanup(spark, index_dir, state)
    return _done(len(vis))


def _ivf_flip(spark: SparkSession, index_dir: str, state: dict) -> None:
    """The fold's commit point — one-file pointer overwrite, all fields
    in one write (torn read = loud parse error, never a mixed state)."""
    _write_json_sidecar(
        spark, f"{index_dir}/_ivf_generation.json",
        {"generation": int(state["generation"]),
         "segments": [int(s) for s in state["segments"]],
         "max_folded_batch": int(state["max_folded_batch"]),
         "applied_dels": int(state.get("applied_dels", -1))})


def _ivf_cleanup(spark: SparkSession, index_dir: str,
                 state: dict) -> None:
    """Delete everything the pointer state supersedes: generations
    below it, unnamed segments of the current generation, batch dirs
    at or below the fence (the legacy ``batch=-1`` included once a
    generation absorbed it), and applied tombstone dirs. Idempotent."""
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
    if not fs.exists(root):
        return
    for st in fs.listStatus(root):
        name = st.getPath().getName()
        if name.startswith("gen=") \
                and int(name.split("=", 1)[1]) < cur_gen:
            fs.delete(st.getPath(), True)
        elif name.startswith("batch="):
            i = int(name.split("=", 1)[1])
            if i <= fence and (i >= 0 or cur_gen >= 0):
                fs.delete(st.getPath(), True)
    if segments is not None and cur_gen >= 0:
        keep = {int(s) for s in segments}
        groot = jpath(f"{index_dir}/gen={cur_gen}")
        if fs.exists(groot):
            for st in fs.listStatus(groot):
                name = st.getPath().getName()
                if name.startswith("_stage_"):
                    fs.delete(st.getPath(), True)  # dead fold attempt
                elif name.startswith("seg=") \
                        and int(name.split("=", 1)[1]) not in keep:
                    fs.delete(st.getPath(), True)
                elif name.startswith("_manifest_seg=") \
                        and int(name[len("_manifest_seg="):]
                                .split(".", 1)[0]) not in keep:
                    # spent manifest of a merged-away segment (only
                    # read between its write and its flip) — litter
                    fs.delete(st.getPath(), False)
    troot = jpath(f"{index_dir}/tombstones")
    if fs.exists(troot):
        for st in fs.listStatus(troot):
            name = st.getPath().getName()
            if name.startswith("del=") \
                    and int(name.split("=", 1)[1]) <= applied:
                fs.delete(st.getPath(), True)


def retrain_ivf_index(spark: SparkSession, index_dir: str,
                      k: int | None = None, max_iter: int = 10,
                      tol: float = 1e-4,
                      target_partitions: int | None = None,
                      pq_codebooks: list[list[list[float]]] | None = None,
                      lease_seconds: float = 3600.0,
                      max_batch: int | None = None,
                      steal_legacy: bool = False) -> list[list[float]]:
    """IVF maintenance: re-center a DRIFTED index. Centroids are
    digest-frozen by design (a mid-stream change would make search
    recall batch-dependent), so a stream whose vector distribution has
    drifted away from the original training sample keeps paying
    boundary-recall losses forever. This job re-trains k-means over the
    ACCUMULATED index, rewrites it layout-preservingly under the new
    cells as a NEW GENERATION (``gen=<g+1>/seg=0``, still partitioned
    by ``ivf_cell`` — searches keep partition-pruning, and a search
    concurrent with the retrain reads a complete old snapshot until
    the atomic pointer flip), re-pins the sidecar to the new digest,
    and returns the new centroids for the caller to resume
    :func:`ivf_index_batch` / :func:`ivf_search` with. ``k`` defaults
    to the index's current cell count; quantized indexes retrain on
    the dequantized vectors (same lossy floats every component
    consumes) and keep their stored codes byte-wise; active tombstones
    are applied and retired by the rewrite.

    Crash safety — LOUD, never silent: the sidecar flips to an
    in-progress marker (``retraining: true``) BEFORE any data moves,
    and only the final step removes it. `_check_sidecar_params`
    refuses a marked sidecar (the extra key can never match a
    search's expected params), so a crash mid-rewrite leaves every
    search/ingest failing with the stored-params message instead of
    probing wrong cells; recovery is re-running this job, which is
    idempotent over the surviving rows: cell assignments are
    recomputed FROM THE VECTORS (the stored ivf_cell is never
    trusted), duplicate ids collapse via dropDuplicates(id), and the
    generational write deletes nothing before its pointer flip. A
    retrain that FAILS (as opposed to a killed driver) releases its
    maintenance lease on the way out, so the re-run works immediately
    instead of waiting out ``lease_seconds``; ``max_batch`` bounds the
    rewrite to batch ids at or below it (the in-stream replay
    discipline — see compact_ivf_index).

    Replay note: after a retrain, a replayed source batch would write
    ``batch=<id>`` rows ASSIGNED UNDER THE NEW CENTROIDS (assignment
    is a pure function of vector and pinned centroids), which is
    exactly what the consolidated rows already are — the
    replay-idempotence contract survives the re-centering."""
    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )

    fs, _ = _hadoop_fs(spark, index_dir)
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    side = jpath(f"{index_dir}/_ivf_params.json")
    if not fs.exists(side):
        raise ValueError(f"no _ivf_params.json under {index_dir} — "
                         f"not an IVF index")
    stream = fs.open(side)
    try:
        buf = spark._jvm.java.io.BufferedReader(
            spark._jvm.java.io.InputStreamReader(stream, "UTF-8"))
        data = []
        line = buf.readLine()
        while line is not None:
            data.append(line)
            line = buf.readLine()
    finally:
        stream.close()
    params = json.loads("\n".join(data))
    params.setdefault("quantized", False)
    params.setdefault("pq_md5", None)
    params.setdefault("pq_residual", False)
    params.pop("retraining", None)  # recovering from a crashed retrain
    if params["pq_residual"]:
        # Residual codes are RELATIVE to their cell's centroid: new
        # centroids invalidate every stored code, and the re-encode
        # would have no crash-safe recovery (a crash mid-rewrite
        # leaves rows encoded against centroids the sidecar no longer
        # records — reconstruction becomes ambiguous, exactly the
        # silent-garbage class this module refuses everywhere else).
        # Recentering a residual index is a REBUILD from the source
        # vectors, not a retrain.
        raise ValueError(
            f"index at {index_dir} is residual-PQ (IVFADC): its codes "
            f"quantize x - centroid(cell), so re-centering invalidates "
            f"every stored code — rebuild the index from the source "
            f"vectors (retrain centroids there, re-run "
            f"ivf_index_batch(pq_residual=True) with "
            f"residual-retrained codebooks) instead of retraining "
            f"in place")
    quantized = params["quantized"]
    if params["pq_md5"] is not None:
        if pq_codebooks is None:
            raise ValueError(
                f"index at {index_dir} is product-quantized "
                f"(pq_md5={params['pq_md5']}): pass the SAME codebooks "
                f"to retrain — the stored codes are meaningless "
                f"without them")
        if _pq_digest(pq_codebooks) != params["pq_md5"]:
            raise ValueError(
                f"retrain_ivf_index: supplied codebooks digest "
                f"{_pq_digest(pq_codebooks)} != the index's "
                f"{params['pq_md5']} — wrong codebooks would "
                f"reconstruct garbage")
    elif pq_codebooks is not None:
        raise ValueError(f"index at {index_dir} is not "
                         f"product-quantized — drop pq_codebooks")
    k = k if k is not None else params["k"]
    # the retrain IS a maintenance fold: hold the compactor lease so a
    # concurrent compact_ivf_index can't race the generational rewrite
    from harvesting_extract_to_ttl_service_spark.streaming.generations import (  # noqa: E501
        acquire_lease,
        check_lease,
        release_lease,
    )

    marker = f"{index_dir}/_ivf_compacting.json"
    lease_owner = acquire_lease(spark, marker, lease_seconds,
                                payload={"compacting": True,
                                         "retraining": True},
                                steal_legacy=steal_legacy)
    try:
        return _retrain_ivf_locked(
            spark, index_dir, k, max_iter, tol, target_partitions,
            pq_codebooks, max_batch, marker, lease_owner, fs, side,
            params)
    except BaseException:
        # a FAILED retrain releases its lease so the documented
        # recovery — "re-run this job" — works immediately instead of
        # waiting out the lease; the retraining-marked sidecar keeps
        # every crash window loud regardless
        release_lease(spark, marker, lease_owner)
        raise


def _retrain_ivf_locked(spark, index_dir, k, max_iter, tol,
                        target_partitions, pq_codebooks, max_batch,
                        marker, lease_owner, fs, side, params
                        ) -> list[list[float]]:
    """Body of :func:`retrain_ivf_index` run under the maintenance
    lease (released by the caller on any failure)."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        dequantize_int8,
        train_ivf_centroids,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.generations import (  # noqa: E501
        check_lease,
        promote_staged,
        release_lease,
        staging_path,
        sweep_staging,
    )

    quantized = params["quantized"]
    k = k if k is not None else params["k"]
    view = _ivf_view(spark, index_dir)
    if max_batch is not None:
        # the in-stream discipline (run_ivf_index_stream): the CURRENT
        # batch may replay after a crash, so it stays above the new
        # fence — bounded out of the rewrite exactly like compact's
        # max_batch
        view = view._replace(
            vis=[i for i in view.vis if i <= max_batch])
    idx = (_ivf_frames(spark, index_dir, view)  # tombstones applied
           .drop("ivf_cell").dropDuplicates(["id"]))
    if pq_codebooks is not None:
        # reconstruct x̂ = concat of the coded sub-centroids — the same
        # lossy floats every ADC search scores, so recentering sees the
        # index's actual geometry; codes stay byte-wise untouched
        parts = []
        for b, book in enumerate(pq_codebooks):
            table = F.array(*[F.array(*[F.lit(float(x)) for x in c])
                              for c in book])
            parts.append(F.element_at(table,
                                      F.col("codes").getItem(b) + 1))
        train_src = idx.withColumn("v", F.concat(*parts))
    elif quantized:
        train_src = idx.withColumn(
            "v", dequantize_int8(F.col("codes"), F.col("scale")))
    else:
        train_src = idx
    centroids = train_ivf_centroids(train_src, k, params["dim"],
                                    vec_col="v", id_col="id",
                                    max_iter=max_iter, tol=tol)

    def _write_sidecar(d: dict) -> None:
        out = fs.create(side, True)
        try:
            out.write(json.dumps(d).encode())
        finally:
            out.close()

    new_params = {"k": k, "dim": params["dim"],
                  "centroids_md5": _centroid_digest(centroids),
                  "quantized": quantized,
                  "pq_md5": params["pq_md5"],
                  "pq_residual": False}
    _write_sidecar({**new_params, "retraining": True})

    reassigned = ivf_assign(train_src, centroids, vec_col="v")
    if quantized or pq_codebooks is not None:
        reassigned = reassigned.drop("v")  # codes are the stored payload
    if target_partitions is not None:
        reassigned = reassigned.repartition(target_partitions,
                                            F.col("ivf_cell"))
    # generational rewrite (the compact_ivf_index protocol): the new
    # assignment lands as gen=<g+1>/seg=0 — invisible until the pointer
    # flips — so a search concurrent with the retrain reads a complete
    # OLD snapshot throughout, and the crash window between flip and
    # cleanup only leaves superseded (pointer-excluded) trees behind.
    # The retraining-marked sidecar above keeps every window LOUD.
    nxt = view.gen + 1 if view.gen >= 0 else 0
    new_fence = max([view.fence] + [i for i in view.vis if i >= 0])
    state = {"generation": nxt, "segments": [0],
             "max_folded_batch": new_fence,
             "applied_dels": max([view.applied_dels] + view.dels)}
    # owner-unique staging, promoted after a fresh ownership check —
    # the same zombie-proof publish the compactors use
    sweep_staging(spark, f"{index_dir}/gen={nxt}")
    stage = staging_path(f"{index_dir}/gen={nxt}", 0, lease_owner)
    (reassigned.write.mode("overwrite").partitionBy("ivf_cell")
     .parquet(stage))
    promote_staged(spark, marker, lease_owner,
                   [(stage, f"{index_dir}/gen={nxt}/seg=0")])
    check_lease(spark, marker, lease_owner)
    _write_json_sidecar(
        spark, f"{index_dir}/gen={nxt}/_manifest_seg=0.json",
        {**state, "n_folded": len(view.vis), "retrained": True})
    check_lease(spark, marker, lease_owner)
    _ivf_flip(spark, index_dir, state)
    _ivf_cleanup(spark, index_dir, state)
    _write_sidecar(new_params)
    release_lease(spark, marker, lease_owner)
    return centroids


def run_ivf_index_stream(vecs_stream: DataFrame, index_dir: str,
                         checkpoint: str, centroids: list[list[float]],
                         vec_col: str = "embedding",
                         id_col: str = "vec_id",
                         trigger_available_now: bool = True,
                         on_batch=None, quantize: bool = False,
                         pq_codebooks: list[list[list[float]]] | None
                         = None, pq_residual: bool = False,
                         compact_every: int | None = None,
                         max_segments: int = 8,
                         retrain_on_drift: float | None = None,
                         drift_check_every: int = 1,
                         on_retrain=None):
    """Attach the IVF indexer to a streaming vector source — same
    checkpoint + batch=<id> replay contract as the dedup streams.
    ``compact_every=n`` makes the stream self-maintaining exactly like
    the BM25 twin (lexical_stream.run_bm25_index_stream): once ``n``
    committed batches below the current one accumulate, the callback
    runs a minor fold bounded to ``max_batch = batch_id - 1`` — the
    current batch may replay after a crash, so it is never folded from
    inside the stream; searches are undisturbed throughout.

    ``retrain_on_drift=r`` closes the drift loop the same way: every
    ``drift_check_every`` batches the callback runs
    :func:`ivf_drift_report` against the recorded training baseline
    (``record_ivf_dispersion`` must have been run — the report fails
    loudly otherwise), and when either dispersion ratio exceeds ``r``
    it calls the generational :func:`retrain_ivf_index` bounded to
    ``max_batch = batch_id - 1`` (the same replay discipline), then
    REWRITES the current batch under the new centroids (it was
    assigned under the old ones moments ago; its id is above the new
    fence, so the overwrite is the normal replay path) and re-records
    the drift baseline from the retrained index's own vectors — so
    the next report measures against the new geometry and a
    stationary stream never retrains twice. Searches run undisturbed
    throughout (the retrain is a read-transparent generational
    rewrite). FLOAT indexes only: a quantized/PQ stream refuses up
    front (re-recording the baseline needs the raw vectors).
    ``on_retrain(batch_id, new_centroids)`` is called after each
    retrain — a restarted stream must be handed the CURRENT centroids
    (read ``_ivf_params.json`` or keep the callback's last value);
    starting it with the stale list fails loudly on the digest pin."""
    if retrain_on_drift is not None and (quantize
                                         or pq_codebooks is not None):
        raise ValueError(
            "run_ivf_index_stream: retrain_on_drift requires a FLOAT "
            "index — re-recording the drift baseline after a retrain "
            "needs the raw vectors, which quantized/PQ indexes do not "
            "store; run drift reports + retrains out of band instead")
    state = {"centroids": centroids}

    def batch_fn(df: DataFrame, batch_id: int) -> None:
        cents = state["centroids"]
        ivf_index_batch(df, batch_id, index_dir, cents, vec_col,
                        id_col, quantize=quantize,
                        pq_codebooks=pq_codebooks,
                        pq_residual=pq_residual)
        spark = df.sparkSession
        if compact_every is not None:
            gen, _segs, fence, _ad = _ivf_pointer(spark, index_dir)
            eligible = [i for i in _ivf_visible_batches(
                spark, index_dir, gen, fence) if i < batch_id]
            if len(eligible) >= compact_every:
                compact_ivf_index(spark, index_dir,
                                  max_segments=max_segments,
                                  max_batch=batch_id - 1)
        if retrain_on_drift is not None \
                and (batch_id + 1) % drift_check_every == 0:
            gen, _segs, fence, _ad = _ivf_pointer(spark, index_dir)
            eligible = [i for i in _ivf_visible_batches(
                spark, index_dir, gen, fence) if i < batch_id]
            # the retrain is bounded to batch_id-1, so it needs at
            # least one covered batch (or a generation tree) to
            # rewrite — batch 0 alone can only be measured, not folded
            if gen >= 0 or eligible:
                rep = ivf_drift_report(spark, index_dir, cents,
                                       ratio_threshold=retrain_on_drift)
                if rep["drifted"]:
                    new_c = retrain_ivf_index(spark, index_dir,
                                              max_batch=batch_id - 1)
                    # the current batch was assigned under the OLD
                    # centroids and sits above the new fence: rewrite
                    # it under the new ones (the normal replay path)
                    ivf_index_batch(df, batch_id, index_dir, new_c,
                                    vec_col, id_col)
                    state["centroids"] = new_c
                    # re-pin the baseline to the new geometry from the
                    # retrained index's own vectors
                    idxv = (_ivf_frames(spark, index_dir)
                            .select(F.col("v").alias("embedding")))
                    record_ivf_dispersion(spark, index_dir, new_c,
                                          idxv)
                    if on_retrain is not None:
                        on_retrain(batch_id, new_c)
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


def ivf_index_stats(spark: SparkSession, index_dir: str) -> dict:
    """Operational snapshot of a persisted IVF index — the pointer
    (generation, segments, replay fence, applied-tombstone watermark),
    the committed-but-unfolded batch ids and pending tombstone ids
    (the two maintenance-pressure signals: each is another directory
    every search unions/anti-joins), the pending tombstones' byte
    total (the same size the search anti-join switches
    broadcast/shuffle on, and the signal for scheduling a ``full=True``
    fold — the only fold that applies tombstones physically), the
    in-progress maintenance marker if any, and the index identity
    (k, dim, mode flags). Driver-side listings only — safe to poll,
    never scans vectors. The BM25 twin is
    lexical_stream.bm25_index_stats; the drift/recall monitor is
    :func:`ivf_drift_report`."""
    from harvesting_extract_to_ttl_service_spark.streaming.lexical_stream import (  # noqa: E501
        _dels_bytes,
    )

    params = _read_json_sidecar(spark, f"{index_dir}/_ivf_params.json")
    if params is None:
        raise ValueError(f"ivf_index_stats: no index at {index_dir}")
    view = _ivf_view(spark, index_dir)
    marker = _read_json_sidecar(spark,
                                f"{index_dir}/_ivf_compacting.json")
    return {"generation": view.gen,
            "segments": view.segments,
            "n_segments": (len(view.segments)
                           if view.segments is not None else 0),
            "max_folded_batch": view.fence,
            "unfolded_batches": view.vis, "n_unfolded": len(view.vis),
            "pending_del_batches": view.dels,
            "pending_del_bytes": _dels_bytes(spark, index_dir,
                                             view.dels),
            "applied_dels": view.applied_dels,
            "compacting": bool(marker) and not (marker or {}).get(
                "deleting"),
            "deleting": bool((marker or {}).get("deleting")),
            "retraining": bool((marker or {}).get("retraining")),
            "folding_through": (marker or {}).get("folding_through"),
            "k": params.get("k"), "dim": params.get("dim"),
            "quantized": bool(params.get("quantized", False)),
            "pq": params.get("pq_md5") is not None,
            "pq_residual": bool(params.get("pq_residual", False))}


def ivf_dispersion(vecs: DataFrame, centroids: list[list[float]],
                   vec_col: str = "embedding") -> dict:
    """Cosine dispersion of a vector set around its assigned centroids:
    ``dist = 1 − cos(v, centroid(cell))`` per row (assignment =
    `ivf_assign`'s rule), aggregated to ``{n, mean_dist, p95_dist}``
    (6 dp; p95 via ``percentile_approx`` — a monitoring statistic, the
    scalable sketch is the point). Zero-norm vectors are excluded
    (cosine undefined). One projection + one global aggregate."""
    cent = F.array(*[F.array(*[F.lit(float(x)) for x in c])
                     for c in centroids])
    cnorms = F.array(*[
        F.lit(math.sqrt(sum(float(x) * float(x) for x in c)))
        for c in centroids])
    assigned = ivf_assign(
        vecs.select(F.col(vec_col).alias("v")), centroids, vec_col="v")
    sim = (dot(F.col("v"), F.element_at(cent, F.col("ivf_cell") + 1))
           / (norm(F.col("v"))
              * F.element_at(cnorms, F.col("ivf_cell") + 1)))
    row = (assigned.filter(norm(F.col("v")) > 0)
           .select((F.lit(1.0) - sim).alias("dist"))
           .agg(F.count("*").alias("n"),
                F.round(F.avg("dist"), 6).alias("mean_dist"),
                F.round(F.percentile_approx("dist", 0.95), 6)
                .alias("p95_dist"))
           .first())
    return {"n": row.n, "mean_dist": row.mean_dist,
            "p95_dist": row.p95_dist}


def record_ivf_dispersion(spark: SparkSession, index_dir: str,
                          centroids: list[list[float]],
                          train_vecs: DataFrame,
                          vec_col: str = "embedding") -> dict:
    """Pin the TRAINING-TIME dispersion next to the index
    (``_ivf_drift.json``): run this once over the sample the centroids
    were trained on (or the first indexed batches), and
    :func:`ivf_drift_report` later compares the accumulated index
    against it — the cheap signal for WHEN :func:`retrain_ivf_index`
    pays, instead of retraining on a timer. The record is keyed to the
    centroid digest: recording against different centroids than the
    index's refuses (a drift baseline for the wrong geometry would
    make every later report nonsense)."""
    params = _read_json_sidecar(spark, f"{index_dir}/_ivf_params.json")
    if params is None:
        raise ValueError(f"no _ivf_params.json under {index_dir} — "
                         f"not an IVF index")
    want = _centroid_digest(centroids)
    if params["centroids_md5"] != want:
        raise ValueError(
            f"record_ivf_dispersion: centroid digest {want} != the "
            f"index's {params['centroids_md5']} — record the baseline "
            f"with the index's own centroids")
    d = ivf_dispersion(train_vecs, centroids, vec_col)
    d["centroids_md5"] = want
    _write_json_sidecar(spark, f"{index_dir}/_ivf_drift.json", d)
    return d


def ivf_drift_report(spark: SparkSession, index_dir: str,
                     centroids: list[list[float]],
                     pq_codebooks: list[list[list[float]]] | None = None,
                     ratio_threshold: float = 1.5) -> dict:
    """Has the stream drifted away from the index's centroids? Compare
    the ACCUMULATED index's dispersion (distance to assigned centroid,
    :func:`ivf_dispersion` — quantized indexes measure the dequantized
    codes, PQ indexes the reconstructions: the floats searches actually
    score) against the training-time baseline
    (:func:`record_ivf_dispersion`). Returns ``{trained, current,
    mean_ratio, p95_ratio, drifted}`` — ``drifted`` when either ratio
    exceeds ``ratio_threshold``; a stationary stream sits near 1.0.
    The operator signal for scheduling :func:`retrain_ivf_index`
    (float/int8/raw-PQ) or a rebuild (residual PQ): boundary-recall
    losses grow with exactly this dispersion. One index scan, no
    writes."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        dequantize_int8,
    )

    params = _read_json_sidecar(spark, f"{index_dir}/_ivf_params.json")
    if params is None:
        raise ValueError(f"no _ivf_params.json under {index_dir} — "
                         f"not an IVF index")
    params.setdefault("quantized", False)
    params.setdefault("pq_md5", None)
    params.setdefault("pq_residual", False)
    want = _centroid_digest(centroids)
    if params["centroids_md5"] != want:
        raise ValueError(
            f"ivf_drift_report: centroid digest {want} != the index's "
            f"{params['centroids_md5']}")
    trained = _read_json_sidecar(spark, f"{index_dir}/_ivf_drift.json")
    if trained is None:
        raise ValueError(
            f"no _ivf_drift.json under {index_dir} — run "
            f"record_ivf_dispersion over the training sample first")
    if trained["centroids_md5"] != want:
        raise ValueError(
            f"ivf_drift_report: the drift baseline was recorded for "
            f"centroids {trained['centroids_md5']}, the index now "
            f"pins {want} — re-record after retraining")
    idx = _ivf_frames(spark, index_dir)
    if params["pq_md5"] is not None:
        if pq_codebooks is None or _pq_digest(pq_codebooks) \
                != params["pq_md5"]:
            raise ValueError(
                f"index at {index_dir} is product-quantized: pass the "
                f"SAME codebooks to reconstruct its vectors")
        parts = []
        sub = len(pq_codebooks[0][0])
        for b, book in enumerate(pq_codebooks):
            table = F.array(*[F.array(*[F.lit(float(x)) for x in c])
                              for c in book])
            parts.append(F.element_at(table,
                                      F.col("codes").getItem(b) + 1))
        rhat = F.concat(*parts)
        if params["pq_residual"]:
            cent = F.array(*[F.array(*[F.lit(float(x)) for x in c])
                             for c in centroids])
            vec = F.zip_with(
                F.element_at(cent, F.col("ivf_cell") + 1), rhat,
                lambda x, y: x + y)
        else:
            vec = rhat
        src = idx.select(vec.alias("embedding"))
    elif params["quantized"]:
        src = idx.select(dequantize_int8(
            F.col("codes"), F.col("scale")).alias("embedding"))
    else:
        src = idx.select(F.col("v").alias("embedding"))
    current = ivf_dispersion(src, centroids)
    mean_ratio = (round(current["mean_dist"] / trained["mean_dist"], 4)
                  if trained["mean_dist"] else None)
    p95_ratio = (round(current["p95_dist"] / trained["p95_dist"], 4)
                 if trained["p95_dist"] else None)
    drifted = any(r is not None and r > ratio_threshold
                  for r in (mean_ratio, p95_ratio))
    return {"trained": trained, "current": current,
            "mean_ratio": mean_ratio, "p95_ratio": p95_ratio,
            "drifted": drifted}
