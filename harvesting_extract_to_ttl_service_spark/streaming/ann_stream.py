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
  * :func:`compact_ivf_index` — fold the per-batch partitions into
    ``batch=-1`` PRESERVING the cell partitioning (the namenode-scale
    motivation of :func:`.dedup_stream.compact_dedup_index`; a fold that
    dropped the cell dirs would turn every search back into a full
    scan).

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
    idx = spark.read.option("basePath", index_dir).parquet(index_dir)
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
    idx = (spark.read.option("basePath", index_dir).parquet(index_dir)
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


def compact_ivf_index(spark: SparkSession, index_dir: str,
                      target_partitions: int | None = None) -> int:
    """Fold the per-batch index partitions into ``batch=-1``, PRESERVING
    the ``ivf_cell`` partitioning (dropping it would turn every search
    back into a full scan — the generic
    :func:`.dedup_stream.compact_dedup_index` is NOT layout-safe here).
    Same crash ordering as the generic fold: the consolidated partition
    is written first, the folded batch dirs dropped after — a crash
    between the two duplicates rows, which only duplicates search
    candidates (the top-k is per-id idempotent), never loses them.
    Returns the number of batch partitions folded."""
    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )

    idx = spark.read.option("basePath", index_dir).parquet(index_dir)
    batches = [r.batch for r in idx.select("batch").distinct().collect()
               if r.batch != -1]
    if not batches:
        return 0
    out = idx.drop("batch")
    if target_partitions is not None:
        out = out.repartition(target_partitions, F.col("ivf_cell"))
    fs, _ = _hadoop_fs(spark, index_dir)
    jpath = spark._jvm.org.apache.hadoop.fs.Path
    tmp = f"{index_dir}/_compact_tmp"
    out.write.mode("overwrite").partitionBy("ivf_cell").parquet(tmp)
    (spark.read.option("basePath", tmp).parquet(tmp)
     .write.mode("overwrite").partitionBy("ivf_cell")
     .parquet(f"{index_dir}/batch=-1"))
    for b in batches:
        fs.delete(jpath(f"{index_dir}/batch={b}"), True)
    fs.delete(jpath(tmp), True)
    return len(batches)


def retrain_ivf_index(spark: SparkSession, index_dir: str,
                      k: int | None = None, max_iter: int = 10,
                      tol: float = 1e-4,
                      target_partitions: int | None = None,
                      pq_codebooks: list[list[list[float]]] | None = None
                      ) -> list[list[float]]:
    """IVF maintenance: re-center a DRIFTED index. Centroids are
    digest-frozen by design (a mid-stream change would make search
    recall batch-dependent), so a stream whose vector distribution has
    drifted away from the original training sample keeps paying
    boundary-recall losses forever. This job re-trains k-means over the
    ACCUMULATED index, rewrites it layout-preservingly under the new
    cells (one consolidated ``batch=-1``, still partitioned by
    ``ivf_cell`` — searches keep partition-pruning), re-pins the
    sidecar to the new digest, and returns the new centroids for the
    caller to resume :func:`ivf_index_batch` / :func:`ivf_search`
    with. ``k`` defaults to the index's current cell count; quantized
    indexes retrain on the dequantized vectors (same lossy floats
    every component consumes) and keep their stored codes byte-wise.

    Crash safety — LOUD, never silent: the sidecar flips to an
    in-progress marker (``retraining: true``) BEFORE any data moves,
    and only the final step removes it. `_check_sidecar_params`
    refuses a marked sidecar (the extra key can never match a
    search's expected params), so a crash mid-rewrite leaves every
    search/ingest failing with the stored-params message instead of
    probing wrong cells; recovery is re-running this job, which is
    idempotent over the surviving rows: cell assignments are
    recomputed FROM THE VECTORS (the stored ivf_cell is never
    trusted), and duplicate ids from a crash between the batch=-1
    write and the old-batch deletes collapse via dropDuplicates(id).

    Replay note: after a retrain, a replayed source batch would write
    ``batch=<id>`` rows ASSIGNED UNDER THE NEW CENTROIDS (assignment
    is a pure function of vector and pinned centroids), which is
    exactly what the consolidated rows already are — the
    replay-idempotence contract survives the re-centering."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        dequantize_int8,
        train_ivf_centroids,
    )
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

    idx = (spark.read.option("basePath", index_dir).parquet(index_dir)
           .drop("batch", "ivf_cell").dropDuplicates(["id"]))
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
    batches = [r.batch for r in
               (spark.read.option("basePath", index_dir)
                .parquet(index_dir).select("batch").distinct().collect())]
    tmp = f"{index_dir}/_retrain_tmp"
    reassigned.write.mode("overwrite").partitionBy("ivf_cell").parquet(tmp)
    (spark.read.option("basePath", tmp).parquet(tmp)
     .write.mode("overwrite").partitionBy("ivf_cell")
     .parquet(f"{index_dir}/batch=-1"))
    for b in batches:
        if b != -1:
            fs.delete(jpath(f"{index_dir}/batch={b}"), True)
    fs.delete(jpath(tmp), True)
    _write_sidecar(new_params)
    return centroids


def run_ivf_index_stream(vecs_stream: DataFrame, index_dir: str,
                         checkpoint: str, centroids: list[list[float]],
                         vec_col: str = "embedding",
                         id_col: str = "vec_id",
                         trigger_available_now: bool = True,
                         on_batch=None, quantize: bool = False,
                         pq_codebooks: list[list[list[float]]] | None
                         = None, pq_residual: bool = False):
    """Attach the IVF indexer to a streaming vector source — same
    checkpoint + batch=<id> replay contract as the dedup streams."""

    def batch_fn(df: DataFrame, batch_id: int) -> None:
        ivf_index_batch(df, batch_id, index_dir, centroids, vec_col,
                        id_col, quantize=quantize,
                        pq_codebooks=pq_codebooks,
                        pq_residual=pq_residual)
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
    idx = spark.read.option("basePath", index_dir).parquet(index_dir)
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
