"""Similarity search over embedding columns (SURVEY.md §2C extension
surface): brute-force cosine top-k as the exact baseline, plus LSH- and
IVF-bucketed approximate variants as the scale path.

The dot products are `zip_with`/`aggregate` column expressions — JVM-side,
no Python. At 100 TB the brute-force path is a single scan per query
vector (fine for few queries); the bucketed paths cut the candidate set by
orders of magnitude for query workloads, trading recall.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.operators.materialize import materialize


def dot(a: Column, b: Column) -> Column:
    # cast to double BEFORE the multiply: float32 products then double
    # accumulation is engine-dependent; double all the way is deterministic
    # and matches the DuckDB oracle bit-for-bit.
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.transform(a, lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0), lambda acc, x: acc + x))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def cosine_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """Exact brute-force cosine top-k against a constant query vector.
    One scan; per-row work is a fused fold over the array — no shuffle
    except the final top-k (orderBy + limit → TakeOrdered, which keeps
    only k rows per partition)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(F.col(id_col),
                  F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_topk_df(df: DataFrame, query: DataFrame, k: int = 10,
                   vec_col: str = "embedding", id_col: str = "vec_id",
                   query_vec_col: str = "embedding") -> DataFrame:
    """:func:`cosine_topk` with the query vector coming from a ONE-ROW
    DataFrame instead of a driver-side list: a broadcast cross join (a
    bounded one-row BroadcastNestedLoopJoin — the repo's pinned scalar
    pattern) attaches the vector to every row, so there is no
    ``collect()``/``head()`` round-trip in the query path and the whole
    top-k is a single job (round 16, guide §5). Values are bit-identical
    to the literal path — :func:`dot`/:func:`norm` cast both sides to
    double before any arithmetic."""
    q = query.select(F.col(query_vec_col).alias("_qv"))
    return (
        df.crossJoin(F.broadcast(q))
        .select(F.col(id_col),
                F.round(cosine(F.col(vec_col), F.col("_qv")), 6)
                .alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def cosine_self_join_topk(df: DataFrame, k: int = 5, vec_col: str = "embedding",
                          id_col: str = "vec_id") -> DataFrame:
    """All-pairs exact top-k neighbours per vector — DELIBERATELY O(n²):
    a cross join (theta-join on id inequality) over the full corpus. Use
    only for small/medium corpora (exact evaluation, recall baselines);
    at scale the pair space explodes and :func:`lsh_blocked_pairs` (sign-
    LSH bucketed equi-join) or :func:`ivf_topk` is the answer. Catalogued
    as the ``self_topk`` member of ``ann_suite`` over a bounded slice,
    with a window-function oracle restating the per-vector ranking."""
    from pyspark.sql import Window

    a = df.select(F.col(id_col).alias("id_a"), F.col(vec_col).alias("va"))
    b = df.select(F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("id_a") != F.col("id_b")).select(
        "id_a", "id_b", F.round(cosine(F.col("va"), F.col("vb")), 6).alias("cos_sim"))
    w = Window.partitionBy("id_a").orderBy(F.col("cos_sim").desc(), F.col("id_b"))
    return (
        pairs.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= k)
        .drop("_rn")
    )


def quantize_int8(df: DataFrame, vec_col: str = "embedding") -> DataFrame:
    """Per-vector symmetric int8 quantization of an embedding column —
    the storage-compression step of a 100 TB vector corpus (float32 →
    1 byte/dim + one scale/vector ≈ 4× smaller scans, and the integer
    dot products downstream are EXACT cross-engine, no float-fold
    ordering concerns):

        scale  = max_i |x_i| / 127
        code_i = floor(x_i · 127 / max_abs + 0.5)   (∈ [-127, 127])

    The explicit floor(...+0.5) round-half-up is engine-portable (Spark
    `round` is HALF_UP, DuckDB's is HALF_EVEN — spelling the floor keeps
    both engines bit-identical). An all-zero vector quantizes to
    all-zero codes with scale 0. Pure column expressions, one
    projection, no shuffle. Returns every non-vector column of ``df``
    (the vector column is REPLACED — this is compression, not
    annotation) plus ``codes`` and ``scale``."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    mabs = F.array_max(F.transform(v, F.abs))
    codes = F.when(
        mabs > 0,
        F.transform(v, lambda x: F.floor(x * 127 / mabs + 0.5).cast("int"))
    ).otherwise(F.transform(v, lambda x: F.lit(0)))
    return df.select(*[c for c in df.columns if c != vec_col],
                     codes.alias("codes"), (mabs / 127.0).alias("scale"))


def dequantize_int8(codes: Column, scale: Column) -> Column:
    """Reconstruct the (lossy) double vector: code_i · scale."""
    return F.transform(codes, lambda c: c.cast("double") * scale)


def quantize_vec_int8(vec: list[float]) -> tuple[list[int], float]:
    """Driver-side Python mirror of :func:`quantize_int8` for a single
    query vector (both run the same floor-half-up formula in double
    precision, so a query quantized here scores identically to one
    quantized in-plan)."""
    m = max(abs(float(x)) for x in vec)
    if m == 0:
        return [0] * len(vec), 0.0
    return ([math.floor(float(x) * 127 / m + 0.5) for x in vec],
            m / 127)


def int_dot(a: Column, b: Column) -> Column:
    """Exact integer dot product of two code arrays (long accumulator:
    64-dim int8·int8 sums stay far inside long range)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("long") * y.cast("long")),
        F.lit(0).cast("long"), lambda acc, x: acc + x)


def quantized_cosine_topk(qdf: DataFrame, query_codes: list[int],
                          k: int = 10, codes_col: str = "codes",
                          id_col: str = "vec_id") -> DataFrame:
    """Brute-force cosine top-k over int8-quantized vectors. Cosine is
    scale-free — the per-vector scales cancel — so the whole score is
    integer arithmetic plus two square roots: exact, portable, and
    cheaper per row than the float fold. Same plan shape as
    :func:`cosine_topk` (scan + TakeOrdered)."""
    qc = F.array(*[F.lit(int(c)) for c in query_codes])
    qn = math.sqrt(sum(int(c) * int(c) for c in query_codes))
    d = int_dot(F.col(codes_col), qc).cast("double")
    n = F.sqrt(int_dot(F.col(codes_col), F.col(codes_col)).cast("double"))
    return (qdf.select(
        F.col(id_col),
        F.round(d / (n * F.lit(qn)), 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k))


def _hyperplanes(dim: int, n_planes: int) -> list[list[float]]:
    """Deterministic pseudo-random unit hyperplanes (seedless LCG on
    (plane, dim) — reproducible across runs, no RNG state)."""
    planes = []
    for p in range(n_planes):
        v = []
        for d in range(dim):
            x = math.sin(1.0 + 37.0 * p + 101.0 * d) * 43758.5453
            v.append(2.0 * (x - math.floor(x)) - 1.0)
        planes.append(v)
    return planes


def lsh_bucket(vec: Column, dim: int, n_planes: int = 8) -> Column:
    """Random-hyperplane (sign) LSH bucket id: bit p = sign(vec · plane_p).
    Cosine-similar vectors collide with high probability."""
    bucket = F.lit(0)
    for p, plane in enumerate(_hyperplanes(dim, n_planes)):
        pv = F.array(*[F.lit(x) for x in plane])
        bucket = bucket + F.when(dot(vec, pv) > 0, F.lit(1 << p)).otherwise(F.lit(0))
    return bucket


def lsh_ann_topk(df: DataFrame, query_vec: list[float], k: int = 10,
                 vec_col: str = "embedding", id_col: str = "vec_id",
                 n_planes: int = 8) -> DataFrame:
    """Approximate top-k: restrict the scan to the query's LSH bucket, then
    exact cosine inside it. At scale the table is stored partitioned by
    bucket → partition pruning turns this into a sub-percent scan."""
    dim = len(query_vec)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qbucket = None
    for p, plane in enumerate(_hyperplanes(dim, n_planes)):
        s = sum(a * b for a, b in zip(query_vec, plane))
        bit = 1 << p if s > 0 else 0
        qbucket = bit if qbucket is None else qbucket | bit
    return (
        df.withColumn("_bucket", lsh_bucket(F.col(vec_col), dim, n_planes))
        .filter(F.col("_bucket") == qbucket)
        .select(F.col(id_col),
                F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def lsh_ann_topk_multiprobe(df: DataFrame, query_vec: list[float],
                            k: int = 10, vec_col: str = "embedding",
                            id_col: str = "vec_id", n_planes: int = 8,
                            probe_bits: int = 1) -> DataFrame:
    """Multi-probe sign-LSH top-k: scan the query's bucket PLUS every
    bucket within ``probe_bits`` sign flips of it (Hamming ball over the
    plane bits), then exact cosine inside the union. The probed set is
    driver-enumerated (``C(n_planes, ≤probe_bits)`` ids — tiny) so the
    filter stays an IN-list over the bucket column and partition pruning
    still applies on a bucket-partitioned layout. Near-boundary
    neighbours whose single plane sign differs — the sign-LSH recall
    loss — are recovered at the cost of probing ``1 + n_planes`` (for
    ``probe_bits=1``) of the ``2^n_planes`` buckets."""
    from itertools import combinations

    dim = len(query_vec)
    qbucket = 0
    for p, plane in enumerate(_hyperplanes(dim, n_planes)):
        s = sum(a * b for a, b in zip(query_vec, plane))
        qbucket |= (1 << p) if s > 0 else 0
    probed = {qbucket}
    for r in range(1, probe_bits + 1):
        for flips in combinations(range(n_planes), r):
            b = qbucket
            for f in flips:
                b ^= 1 << f
            probed.add(b)
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.withColumn("_bucket", lsh_bucket(F.col(vec_col), dim, n_planes))
        .filter(F.col("_bucket").isin(sorted(probed)))
        .select(F.col(id_col),
                F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )


def keep_component_reps(df: DataFrame, pairs: DataFrame, id_col: str,
                        max_iter: int = 20) -> DataFrame:
    """Shared keep-one tail of every embedding dedup: near-dup pairs →
    connected components → keep each cluster's minimum-id row (the
    component representative). Returns the surviving rows of ``df``."""
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        connected_components,
    )

    comp = connected_components(
        pairs.select("id_a", "id_b"),
        df.select(F.col(id_col).alias("id")), max_iter=max_iter)
    reps = (comp.filter(F.col("id") == F.col("component"))
            .select(F.col("id").alias(id_col)))
    return df.join(reps, id_col, "left_semi")


def drop_embedding_neardups(df: DataFrame, threshold: float, dim: int,
                            vec_col: str = "embedding",
                            id_col: str = "vec_id", n_planes: int = 8,
                            max_iter: int = 20,
                            materialize_mode: str = "local_checkpoint",
                            probe_bits: int = 0) -> DataFrame:
    """Semantic (embedding-cosine) dedup, keep-one: LSH-blocked near-dup
    pairs → connected components → keep each cluster's minimum-id row.
    The embedding twin of the text pipeline's MinHash→cluster→keep-one
    path, sharing its pieces (lsh_blocked_pairs here,
    operators/dedup.connected_components for the closure). Returns the
    surviving rows of ``df``; recall follows :func:`lsh_blocked_pairs`'s
    bucketing (cross-bucket near-dups are kept, not dropped — the safe
    direction for a dedup; raise ``probe_bits`` to drop more of the
    near-boundary duplicates)."""
    pairs = lsh_blocked_pairs(df, threshold, dim, vec_col, id_col,
                              n_planes, materialize_mode, probe_bits)
    return keep_component_reps(df, pairs, id_col, max_iter)


def probe_masks(n_planes: int, probe_bits: int) -> list[int]:
    """Driver-enumerated XOR masks covering the Hamming ball of radius
    ``probe_bits`` over ``n_planes`` sign bits — ``C(n_planes,
    ≤probe_bits)`` ints, the multi-probe expansion set shared by the
    top-k prober and the blocked pair join. Mask 0 (the bucket itself)
    comes first."""
    from itertools import combinations

    masks = [0]
    for r in range(1, probe_bits + 1):
        for flips in combinations(range(n_planes), r):
            m = 0
            for f in flips:
                m |= 1 << f
            masks.append(m)
    return masks


def lsh_blocked_pairs(df: DataFrame, threshold: float, dim: int,
                      vec_col: str = "embedding", id_col: str = "vec_id",
                      n_planes: int = 8,
                      materialize_mode: str = "local_checkpoint",
                      probe_bits: int = 0) -> DataFrame:
    """Embedding near-duplicate pairs via sign-LSH blocking: candidates
    come from an EQUI-join on the hyperplane-sign bucket (never an
    all-pairs nested-loop), then the exact rounded cosine refines within
    each bucket. Recall < 1 by construction (cross-bucket near-dups are
    missed) — the trade that makes the pair space tractable at 100 TB;
    lower ``n_planes``, union several plane sets, or raise
    ``probe_bits`` to recover it.

    ``probe_bits>0`` is MULTI-PROBE blocking (the pair-join twin of
    :func:`lsh_ann_topk_multiprobe`): one join side explodes each vector
    to every bucket within ``probe_bits`` sign flips of its own
    (driver-enumerated masks, C(n_planes, ≤probe_bits) per row), so a
    near-boundary pair whose buckets differ in ≤``probe_bits`` plane
    signs — THE sign-LSH recall loss — becomes a candidate. Still an
    equi-join (probed-bucket = bucket); each qualifying pair surfaces
    exactly once because exactly one mask equals the two buckets' XOR,
    so no dedup pass is needed. Candidate volume scales by the mask
    count on one side — the recall/cost knob.

    Scale rule for ``n_planes``: in-bucket work is quadratic in bucket
    size, so pick ≈ log2(n_vectors / target_bucket_size) planes — a few
    hundred vectors per bucket keeps the refine step trivial. A small
    plane count (the fixture demo uses 2) is a RECALL knob only at small
    n; at corpus scale it degenerates toward all-pairs.

    Per-vector norms are computed once before the join (per pair would
    recompute each side's norm for every candidate)."""
    b = (df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
         .withColumn("bucket", lsh_bucket(F.col("v"), dim, n_planes))
         .withColumn("vnorm", norm(F.col("v"))))
    # one computation of the bucket/norm stage feeding both self-join
    # sides (the planner duplicates identical subtrees under a broadcast
    # strategy — see operators/dedup.py _banded_pairs); the cut strategy
    # is the caller's fault-tolerance choice, operators/materialize.py
    b = materialize(b, materialize_mode)
    # pin the reduce parallelism of the in-bucket refine (quadratic
    # per-bucket compute from a tiny shuffle input — the shape AQE's
    # size-based coalescing serializes; see dedup._pin_join_parallelism)
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        _pin_join_parallelism,
    )

    # one-sided pin on a MATERIALIZED frame (the bare side can broadcast
    # free); under 'none' both sides pin the same (keys, count) exchange
    # so AQE reuses the unmaterialized subtree's shuffle stage instead of
    # recomputing it on the bare side (round 16, the dedup.py rule)
    pin_bare = materialize_mode == "none"
    if probe_bits:
        probe = b.withColumn("_probe", F.explode(F.array(*[
            F.col("bucket").bitwiseXOR(F.lit(m))
            for m in probe_masks(n_planes, probe_bits)])))
        a = _pin_join_parallelism(probe, "_probe").alias("a")
        # NB: probe/bare key DIFFER here (_probe vs bucket) — under
        # 'none' the bare side pins on its own join key; the exchanges
        # are not identical (no AQE reuse), but the bucket subtree is
        # at least not coalesced to one task
        c = (_pin_join_parallelism(b, "bucket") if pin_bare else b).alias("c")
        cond = ((F.col("a._probe") == F.col("c.bucket"))
                & (F.col("a.id") < F.col("c.id")))
    else:
        a = _pin_join_parallelism(b, "bucket").alias("a")
        c = (_pin_join_parallelism(b, "bucket") if pin_bare else b).alias("c")
        cond = ((F.col("a.bucket") == F.col("c.bucket"))
                & (F.col("a.id") < F.col("c.id")))
    return (
        a.join(c, cond)
        .select(F.col("a.id").alias("id_a"), F.col("c.id").alias("id_b"),
                F.round(dot(F.col("a.v"), F.col("c.v"))
                        / (F.col("a.vnorm") * F.col("c.vnorm")), 6)
                .alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )


def ivf_assign(df: DataFrame, centroids: list[list[float]],
               vec_col: str = "embedding") -> DataFrame:
    """IVF coarse quantization: assign each vector to its nearest centroid
    (argmax cosine; first centroid wins ties). Centroids are a driver-side
    list (trained elsewhere, e.g. on a sample via k-means); assignment is a
    pure column expression.

    Implemented as argmax over a sims array — NOT an iterated
    ``when(sim > best.sim, …).otherwise(best)`` fold, which references the
    running ``best`` subtree twice per centroid and grows the expression
    tree exponentially in the centroid count.

    The ranking score is ``dot(v, c) / |c|`` with the centroid norm folded
    to a driver-side constant: argmax over cosine = argmax over dot/|c|
    because the vector's own norm is a positive common factor — so the
    per-centroid ``norm(vec)`` subtree (which Catalyst would re-inline
    once per centroid, the no-CSE blowup the docstrings above warn about)
    is never built at all. 256 centroids × 64 dims plans and runs in
    bounded time (see tests/test_similarity_scale.py)."""
    sims = F.array(*[
        dot(F.col(vec_col), F.array(*[F.lit(float(x)) for x in c]))
        / F.lit(math.sqrt(sum(float(x) * float(x) for x in c)))
        for c in centroids
    ])
    return df.withColumn(
        "ivf_cell",
        (F.array_position(sims, F.array_max(sims)) - 1).cast("int"))


def ivf_topk(df: DataFrame, query_vec: list[float],
             centroids: list[list[float]], k: int = 10, n_probe: int = 2,
             vec_col: str = "embedding", id_col: str = "vec_id") -> DataFrame:
    """IVF ANN search: rank the centroids against the query DRIVER-side
    (the centroid list is tiny and already local), restrict the corpus to
    the ``n_probe`` nearest cells via :func:`ivf_assign`, and run exact
    cosine top-k inside them. ``n_probe`` is the recall/latency knob. At
    scale the table is stored partitioned by ``ivf_cell``, so the filter
    becomes partition pruning and only the probed cells are read."""

    def _cos(a: list[float], b: list[float]) -> float:
        num = sum(float(x) * float(y) for x, y in zip(a, b))
        return num / (math.sqrt(sum(float(x) ** 2 for x in a))
                      * math.sqrt(sum(float(y) ** 2 for y in b)))

    probed = sorted(range(len(centroids)),
                    key=lambda i: (-_cos(query_vec, centroids[i]), i))[:n_probe]
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        ivf_assign(df, centroids, vec_col)
        .filter(F.col("ivf_cell").isin(probed))
        .select(F.col(id_col),
                F.round(cosine(F.col(vec_col), q), 6).alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), F.col(id_col))
        .limit(k)
    )

def _probe_cells(vec_col_name: str, centroids: list[list[float]],
                 n_probe: int) -> Column:
    """Array of the ``n_probe`` nearest cell ids for each row's vector —
    the per-row, column-expression twin of :func:`ivf_topk`'s
    driver-side centroid ranking (ties broken by cell id, same rule).
    Ranking score is ``dot(v, c)/|c|`` with the centroid norm folded to
    a constant (argmax-equivalent to cosine; see :func:`ivf_assign`)."""
    scored = F.array(*[
        F.struct(
            (-(dot(F.col(vec_col_name),
                   F.array(*[F.lit(float(x)) for x in c]))
               / F.lit(math.sqrt(sum(float(x) * float(x) for x in c)))))
            .alias("ns"),
            F.lit(i).alias("c"))
        for i, c in enumerate(centroids)
    ])
    # sort_array on structs orders by (ns asc = sim desc, then c asc)
    return F.slice(F.sort_array(scored), 1, n_probe).getField("c")


def ivf_topk_join(queries: DataFrame, vecs: DataFrame,
                  centroids: list[list[float]], k: int = 10,
                  n_probe: int = 2, q_vec_col: str = "embedding",
                  q_id_col: str = "query_id", vec_col: str = "embedding",
                  id_col: str = "vec_id") -> DataFrame:
    """Batched kNN JOIN: for EVERY query row, its top-``k`` cosine
    neighbours among ``vecs`` — the production shape of similarity
    search (a training pipeline scores thousands of probes per run, not
    one), where looping :func:`ivf_topk` per query would launch one job
    per probe.

    Scale shape: each query ranks the centroid list in a single column
    expression and explodes to its ``n_probe`` cells (query-side fanout
    only — queries are the small side); the corpus is assigned once
    (`ivf_assign`) and met by a keyed equi-join on the cell; the final
    per-query top-k is a window over each query's candidates (bounded
    by its probed cells' population). No all-pairs product anywhere.
    Per-side norms are computed once before the join.

    Returns ``(q_id_col, id_col, cos_sim, rank)`` with rank 1..k by
    (cos_sim desc, id) — a total, engine-portable order. Per query, the
    rows equal a single-query :func:`ivf_topk` call with the same
    centroids/k/n_probe (ties in the centroid ranking and the top-k are
    broken identically)."""
    from pyspark.sql import Window

    q = (queries.select(F.col(q_id_col).alias("qid"),
                        F.col(q_vec_col).alias("qv"))
         .withColumn("qnorm", norm(F.col("qv")))
         .withColumn("ivf_cell",
                     F.explode(_probe_cells("qv", centroids, n_probe))))
    v = (ivf_assign(vecs.select(F.col(id_col).alias("vid"),
                                F.col(vec_col).alias("v")),
                    centroids, vec_col="v")
         .withColumn("vnorm", norm(F.col("v"))))
    w = (Window.partitionBy("qid")
         .orderBy(F.col("cos_sim").desc(), F.col("vid")))
    return (
        q.join(v, "ivf_cell")
        .select("qid", "vid",
                F.round(dot(F.col("qv"), F.col("v"))
                        / (F.col("qnorm") * F.col("vnorm")), 6)
                .alias("cos_sim"))
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(F.col("qid").alias(q_id_col), F.col("vid").alias(id_col),
                "cos_sim", "rank")
    )


def cluster_neardup_pairs(df: DataFrame, centroids: list[list[float]],
                          threshold: float, vec_col: str = "embedding",
                          id_col: str = "vec_id", n_probe: int = 1,
                          materialize_mode: str = "local_checkpoint"
                          ) -> DataFrame:
    """Cluster-blocked embedding near-dup pairs (the SemDeDup shape,
    Abbas et al. 2023): assign every vector to its nearest of ``k``
    LEARNED centroids (:func:`ivf_assign` — e.g. from
    :func:`train_ivf_centroids`), then refine with exact cosine only
    WITHIN each cell. The second of the two blocking families for
    semantic dedup — :func:`lsh_blocked_pairs` blocks on random
    hyperplane signs, this blocks on data-adaptive k-means cells, which
    concentrates true near-dups far better when the corpus is clustered
    (the common case for crawled text).

    Scale shape: one assignment pass (pure column expression), one
    equi-join on ``ivf_cell`` — candidate volume is Σ|cell|², bounded by
    choosing k ≈ n/target_cell_size, and never an all-pairs product.
    Recall < 1 at cell boundaries; ``n_probe > 1`` recovers it by also
    meeting each vector's ``n_probe`` nearest cells (both directions:
    pair (a, b) is a candidate when either endpoint's probe list covers
    the other's primary cell), at the cost of a distinct over the
    surviving pairs.

    Returns ``(id_a, id_b, cos_sim)`` with ``id_a < id_b``, one row per
    pair, exact rounded cosine ≥ ``threshold``."""
    b = (df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"))
         .withColumn("vnorm", norm(F.col("v"))))
    b = ivf_assign(b, centroids, vec_col="v")
    # one computation of the assign/norm stage feeds both self-join sides
    # (identical non-exchange subtrees are not reused by the planner —
    # the SCALE.md round-5 finding; strategy per operators/materialize.py)
    b = materialize(b, materialize_mode)
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        _pin_join_parallelism,
    )

    # same pin rule as lsh_blocked_pairs: one-sided on a materialized
    # frame, both sides under 'none' (AQE exchange-stage reuse)
    pin_bare = materialize_mode == "none"
    if n_probe > 1:
        probe = b.withColumn(
            "ivf_cell", F.explode(_probe_cells("v", centroids, n_probe)))
        # one-sided pin (see dedup._pin_join_parallelism)
        a = _pin_join_parallelism(probe, "ivf_cell").alias("a")
        c = (_pin_join_parallelism(b, "ivf_cell") if pin_bare else b
             ).alias("c")
        # symmetric probing needs both directions (a's probe list may
        # cover c's primary but not vice versa), so the join keys id
        # inequality and least/greatest + distinct canonicalize the pair
        cond = ((F.col("a.ivf_cell") == F.col("c.ivf_cell"))
                & (F.col("a.id") != F.col("c.id")))
        pair_ids = [F.least(F.col("a.id"), F.col("c.id")).alias("id_a"),
                    F.greatest(F.col("a.id"), F.col("c.id")).alias("id_b")]
    else:
        a = _pin_join_parallelism(b, "ivf_cell").alias("a")
        c = (_pin_join_parallelism(b, "ivf_cell") if pin_bare else b
             ).alias("c")
        cond = ((F.col("a.ivf_cell") == F.col("c.ivf_cell"))
                & (F.col("a.id") < F.col("c.id")))
        pair_ids = [F.col("a.id").alias("id_a"), F.col("c.id").alias("id_b")]
    pairs = (
        a.join(c, cond)
        .select(*pair_ids,
                F.round(dot(F.col("a.v"), F.col("c.v"))
                        / (F.col("a.vnorm") * F.col("c.vnorm")), 6)
                .alias("cos_sim"))
        .filter(F.col("cos_sim") >= threshold)
    )
    # a probed pair can meet in up to two cells (each endpoint probing
    # the other's primary); the distinct runs over the REFINED pairs —
    # tiny relative to the candidate set — so its shuffle is cheap
    return pairs.distinct() if n_probe > 1 else pairs


def drop_cluster_neardups(df: DataFrame, centroids: list[list[float]],
                          threshold: float, vec_col: str = "embedding",
                          id_col: str = "vec_id", n_probe: int = 1,
                          max_iter: int = 20,
                          materialize_mode: str = "local_checkpoint"
                          ) -> DataFrame:
    """SemDeDup keep-one: :func:`cluster_neardup_pairs` → connected
    components → keep each cluster's minimum-id row (shared tail with
    :func:`drop_embedding_neardups`). Missed cross-cell near-dups are
    KEPT, the safe direction for a dedup; raise ``n_probe`` to drop more
    boundary duplicates."""
    pairs = cluster_neardup_pairs(df, centroids, threshold, vec_col,
                                  id_col, n_probe, materialize_mode)
    return keep_component_reps(df, pairs, id_col, max_iter)


def train_ivf_centroids(df: DataFrame, k: int, dim: int,
                        vec_col: str = "embedding",
                        id_col: str = "vec_id",
                        max_iter: int = 10,
                        tol: float = 1e-4) -> list[list[float]]:
    """Distributed Lloyd's k-means over an embedding column — the trainer
    that makes the IVF path (:func:`ivf_assign` / :func:`ivf_topk`)
    self-contained. Returns k driver-side centroids (k × dim floats —
    control-plane sized by design; the corpus never leaves the executors).

    Per iteration: one :func:`ivf_assign` projection (argmax over a sims
    array, no per-centroid subtree blowup) + one explode-by-dimension
    aggregation — ``posexplode`` fans each vector into dim rows and a
    map-side-combinable AVG per (cell, dim) collapses them, so the
    shuffle carries k × dim partial sums per partition, independent of
    corpus size. Convergence = max centroid drift (L∞ over all cells)
    below ``tol``, checked driver-side on the k × dim result.

    Initialization is deterministic AND id-layout-free: the k vectors
    whose md5 hash fraction of the id is smallest (operators/corpus.py
    :func:`hash_fraction` — a uniform pseudo-random order that is a pure
    function of the id, so re-runs pick the same seeds on any cluster
    layout). orderBy+limit over the fraction is TakeOrdered — k rows per
    partition reach the driver, no global sort — and, unlike the naive
    ``orderBy(id).limit(k)``, it cannot collapse onto a degenerate
    leading-id cluster (ids are often assigned in insertion order, so
    the smallest ids tend to be near-identical early documents). An
    empty cell keeps its previous centroid (standard Lloyd fallback), so
    k never shrinks mid-run."""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        hash_fraction,
    )

    init = (df.select(id_col, vec_col)
            .orderBy(hash_fraction(F.col(id_col), salt="kmeans-init"),
                     id_col)
            .limit(k).collect())
    if len(init) < k:
        raise ValueError(f"k={k} exceeds corpus size {len(init)}")
    centroids = [[float(x) for x in row[vec_col]] for row in init]

    for _ in range(max_iter):
        assigned = ivf_assign(df.select(vec_col), centroids, vec_col)
        sums = (
            assigned.select("ivf_cell",
                            F.posexplode(F.col(vec_col)).alias("d", "x"))
            .groupBy("ivf_cell", "d").agg(F.avg("x").alias("m"))
            .collect()
        )
        new_centroids = [list(c) for c in centroids]
        by_cell: dict[int, list[float]] = {}
        for row in sums:
            by_cell.setdefault(row.ivf_cell, [0.0] * dim)[row.d] = row.m
        for cell, vec in by_cell.items():
            new_centroids[cell] = vec
        drift = max(
            abs(a - b)
            for c_new, c_old in zip(new_centroids, centroids)
            for a, b in zip(c_new, c_old))
        centroids = new_centroids
        if drift < tol:
            break
    return centroids


# --- product quantization (IVF-PQ's compression half) -----------------
#
# PQ (Jégou et al. 2011): split each dim-vector into m contiguous
# sub-blocks, quantize every block to one of ksub learned sub-centroids,
# store m small codes per vector — dim×4 bytes shrink to m bytes
# (m=8, dim=512: 64×), and search scores candidates WITHOUT
# reconstructing, via per-block lookup tables (ADC). The int8 path
# above compresses 4×; this is the order-of-magnitude path a 100 TB
# embedding corpus actually needs, and the standard pairing with the
# IVF index (IVF prunes WHICH vectors to score, PQ makes scoring them
# cheap).
#
# Determinism discipline (the repo's oracle contract): sub-centroid
# assignment is an argmin over component-ordered L2 folds with
# ties → smallest code; every cross-component float fold fixes its
# order (left fold, 0.0 init) so a SQL restatement reproduces the
# doubles bit-for-bit; ADC lookup tables are driver-computed with the
# same fold order.


def _pq_shapes(codebooks: list[list[list[float]]]) -> tuple[int, int, int]:
    m = len(codebooks)
    if m == 0:
        raise ValueError("pq: empty codebook list")
    ksub = len(codebooks[0])
    sub = len(codebooks[0][0])
    for b, book in enumerate(codebooks):
        if len(book) != ksub or any(len(c) != sub for c in book):
            raise ValueError(
                f"pq: codebook {b} is ragged — every block needs the "
                f"same ksub={ksub} centroids of sub={sub} components")
    return m, ksub, sub


def _pq_code(subv: Column, book: list[list[float]]) -> Column:
    """argmin-L2 sub-centroid code for one block: component-ordered
    squared-distance folds, array_min struct tie-break to the smallest
    code — the same deterministic argmin shape as ivf_assign."""
    cands = []
    for j, c in enumerate(book):
        cl = F.array(*[F.lit(float(x)) for x in c])
        d = F.aggregate(
            F.zip_with(subv, cl,
                       lambda x, y: (x.cast("double") - y)
                       * (x.cast("double") - y)),
            F.lit(0.0), lambda a, x: a + x)
        cands.append(F.struct(d.alias("d"), F.lit(j).alias("j")))
    return F.array_min(F.array(*cands)).getField("j")


def _fold_sum(terms: list[float]) -> float:
    acc = 0.0
    for t in terms:
        acc += float(t)
    return acc


def pq_encode(df: DataFrame, codebooks: list[list[list[float]]],
              vec_col: str = "embedding") -> DataFrame:
    """Encode vectors to PQ codes: every column but ``vec_col`` rides
    through (the :func:`quantize_int8` convention — an ``ivf_cell``
    annotation stays on its row with no join), plus ``codes``
    (array<int>, length m) and ``pnorm`` — the reconstruction's L2 norm
    (blocks are orthogonal coordinate segments, so
    ‖x̂‖² = Σ_b ‖c_{b,code_b}‖²), precomputed from the codebook norms
    and stored so cosine ADC never touches the codebooks at search
    time. Pure projection — no shuffle, no join; expression work is
    m·ksub folds of sub components per row (linear in dim·ksub), the
    trade that buys m-byte storage."""
    m, ksub, sub = _pq_shapes(codebooks)
    codes = F.array(*[
        _pq_code(F.slice(F.col(vec_col), b * sub + 1, sub), codebooks[b])
        for b in range(m)])
    n2 = [[_fold_sum([x * x for x in c]) for c in book]
          for book in codebooks]
    keep = [c for c in df.columns if c != vec_col]
    out = df.select(*keep, codes.alias("codes"))
    p2 = F.lit(0.0)
    for b in range(m):
        p2 = p2 + F.element_at(
            F.array(*[F.lit(v) for v in n2[b]]),
            F.col("codes").getItem(b) + 1)
    return out.select(*keep, "codes",
                      F.round(F.sqrt(p2), 6).alias("pnorm"))


def pq_adc_topk(codes_df: DataFrame, query_vec: list[float],
                codebooks: list[list[list[float]]], k: int = 10,
                id_col: str = "vec_id") -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the query stays exact,
    every candidate scores as cosine(q, x̂) via per-block lookup tables
    LUT[b][j] = q_b·c_{b,j} computed ONCE driver-side (m·ksub doubles
    — control-plane sized), so the per-row work is m array lookups and
    one add chain, never a dim-length fold. Approximate by exactly the
    quantization error (the only approximation — scores on the
    reconstructions are exact and deterministic, so a SQL oracle
    reproduces them bit-for-bit). Zero-reconstruction rows (pnorm 0 —
    cosine undefined) are excluded, the zero-vector convention the
    hashed embedding documents. Returns ``(id_col, cos_sim)``."""
    m, ksub, sub = _pq_shapes(codebooks)
    if len(query_vec) != m * sub:
        raise ValueError(
            f"pq_adc_topk: query dim {len(query_vec)} != m·sub "
            f"{m * sub}")
    lut = [[_fold_sum([float(query_vec[b * sub + i]) * float(c[i])
                       for i in range(sub)])
            for c in book] for b, book in enumerate(codebooks)]
    qnorm = math.sqrt(_fold_sum([float(x) * float(x)
                                 for x in query_vec]))
    num = F.lit(0.0)
    for b in range(m):
        num = num + F.element_at(
            F.array(*[F.lit(v) for v in lut[b]]),
            F.col("codes").getItem(b) + 1)
    return (
        codes_df.filter(F.col("pnorm") > 0)
        .select(F.col(id_col),
                F.round(num / (F.col("pnorm") * F.lit(qnorm)), 6)
                .alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), id_col)
        .limit(k)
    )


def train_pq_codebooks(df: DataFrame, m: int, ksub: int, dim: int,
                       vec_col: str = "embedding",
                       id_col: str = "vec_id",
                       max_iter: int = 10,
                       tol: float = 1e-4) -> list[list[list[float]]]:
    """Per-block L2 k-means sub-codebooks — the trainer that makes the
    PQ path self-contained: ONE Spark job per Lloyd iteration for ALL
    m blocks. Each row posexplodes to its m block slices (an in-row
    generator, no shuffle), a lazily-evaluated when-chain applies the
    matching block's argmin (only the matched branch's ksub folds run
    per row — CASE semantics, so total fold work stays m·ksub per
    vector, identical to per-block jobs), and a single
    groupBy(block, code, component) AVG collects m·ksub·sub partials —
    map-side-combinable, corpus-size-independent. The first cut looped
    the blocks as m separate jobs per iteration; the blocks are
    independent aggregations over the SAME rows, so fusing them cuts
    the m× job-submission overhead that dominated at fixture scale
    (SCALE.md: 85.5 s → re-measured after the fuse) without changing
    any fold.

    Initialization is the IVF trainer's deterministic, id-layout-free
    trick per block: the ksub vectors with the smallest md5 hash
    fractions seed every block's codebook (same seed ROWS across
    blocks — each block slices its own segment). Empty codes keep
    their previous sub-centroid; convergence is L∞ drift over all
    blocks below ``tol``. (AVG over doubles is partition-order
    dependent in BOTH shapes — trained codebooks are snapshot
    artifacts, digest-pinned at use; determinism of the ENCODE given a
    codebook is what the oracle contract pins.)"""
    from harvesting_extract_to_ttl_service_spark.operators.corpus import (
        hash_fraction,
    )

    if dim % m:
        raise ValueError(f"train_pq_codebooks: dim={dim} not divisible "
                         f"by m={m}")
    sub = dim // m
    init = (df.select(id_col, vec_col)
            .orderBy(hash_fraction(F.col(id_col), salt="pq-init"),
                     id_col)
            .limit(ksub).collect())
    if len(init) < ksub:
        raise ValueError(f"ksub={ksub} exceeds corpus size {len(init)}")
    books = [[[float(x) for x in row[vec_col][b * sub:(b + 1) * sub]]
              for row in init] for b in range(m)]

    for _ in range(max_iter):
        sliced = df.select(
            F.posexplode(F.array(*[
                F.slice(F.col(vec_col), b * sub + 1, sub)
                for b in range(m)])).alias("b", "subv"))
        code = None
        for b, book in enumerate(books):
            branch = _pq_code(F.col("subv"), book)
            code = (F.when(F.col("b") == b, branch) if code is None
                    else code.when(F.col("b") == b, branch))
        sums = (sliced.select("b", code.alias("code"), "subv")
                .select("b", "code",
                        F.posexplode(F.col("subv")).alias("d", "x"))
                .groupBy("b", "code", "d").agg(F.avg("x").alias("mu"))
                .collect())
        new_books = [[list(c) for c in book] for book in books]
        for row in sums:
            new_books[row.b][row.code][row.d] = row.mu
        drift = max(abs(a - o)
                    for nb, ob in zip(new_books, books)
                    for cn, co in zip(nb, ob)
                    for a, o in zip(cn, co))
        books = new_books
        if drift < tol:
            break
    return books


def ivf_residuals(df: DataFrame, centroids: list[list[float]],
                  vec_col: str = "embedding",
                  out_col: str = "residual",
                  materialize_mode: str = "local_checkpoint"
                  ) -> DataFrame:
    """Residual vectors w.r.t. each row's assigned IVF cell —
    ``r = x − centroid(cell)`` (classic IVFADC, Jégou/Douze/Schmid
    2011): the coarse quantizer absorbs the between-cell variance, so
    a product quantizer trained on THESE vectors spends its entire
    code budget on the within-cell variance and reconstructs with far
    lower error at the same m. This is the trainer feed for residual
    PQ: ``train_pq_codebooks(ivf_residuals(vecs, cents), …,
    vec_col='residual')`` — assignment here is :func:`ivf_assign`
    (argmax cosine, first-cell ties), the SAME rule
    :func:`pq_encode_residual` and the IVF index use, so trained
    codebooks see exactly the residual distribution they will encode.

    Returns ``df`` + ``ivf_cell`` + ``out_col``. The residual is an
    in-plan expression over a k·dim centroid literal table; the
    default materialization cut keeps downstream per-centroid folds
    (k-means training, `_pq_code` argmins) from inlining a copy of it
    per candidate — the duplicate-subtree hazard SCALE.md documents.
    Pass ``materialize_mode='none'`` when the consumer is a single
    projection."""
    from harvesting_extract_to_ttl_service_spark.operators.materialize import (  # noqa: E501
        materialize,
    )

    cent = F.array(*[F.array(*[F.lit(float(x)) for x in c])
                     for c in centroids])
    out = ivf_assign(df, centroids, vec_col).withColumn(
        out_col,
        F.zip_with(F.col(vec_col),
                   F.element_at(cent, F.col("ivf_cell") + 1),
                   lambda x, y: x.cast("double") - y))
    return materialize(out, materialize_mode)


def pq_encode_residual(df: DataFrame,
                       codebooks: list[list[list[float]]],
                       centroids: list[list[float]],
                       vec_col: str = "embedding",
                       cell_col: str = "ivf_cell",
                       materialize_mode: str = "local_checkpoint"
                       ) -> DataFrame:
    """RESIDUAL product-quantization encode — the IVFADC refinement of
    :func:`pq_encode`: each vector's code quantizes ``x −
    centroid(cell)`` instead of ``x`` itself, so the stored m bytes
    describe only the within-cell variance the coarse quantizer left
    behind (``codebooks`` must be trained on residuals —
    :func:`ivf_residuals` + :func:`train_pq_codebooks`). The stored
    ``pnorm`` is the norm of the FULL reconstruction ``x̂ =
    centroid(cell) + r̂`` — the vector ADC cosine actually scores —
    so search never needs the codebooks to normalize, exactly like
    the raw path.

    ``cell_col`` must already carry the :func:`ivf_assign` cell (the
    index ingest computes it anyway; requiring it keeps encode a pure
    function of (vector, cell) and guarantees the cell used for the
    residual IS the cell the row is stored under — a mismatch would
    reconstruct against the wrong centroid).

    Plan shape — three projections with two materialization cuts, all
    shuffle-free: (1) the residual column (one k·dim centroid-table
    lookup + zip_with; cut so the m·ksub argmin folds in step 2 fold
    over a DATA column instead of inlining the lookup per candidate),
    (2) the argmin codes (same expression budget as :func:`pq_encode`;
    cut so step 3's m per-block lookups don't re-inline m·ksub folds
    each), (3) ``pnorm`` = one centroid lookup + m sub-centroid
    lookups + a component-ordered fold over the reconstruction —
    every term a literal-valued double given (cell, codes), so the
    fold is exactly restatable in SQL. Returns all columns but
    ``vec_col``, plus ``codes`` and ``pnorm``."""
    from harvesting_extract_to_ttl_service_spark.operators.materialize import (  # noqa: E501
        materialize,
    )

    m, ksub, sub = _pq_shapes(codebooks)
    dim = len(centroids[0])
    if dim != m * sub:
        raise ValueError(
            f"pq_encode_residual: centroid dim {dim} != m·sub "
            f"{m * sub}")
    if cell_col not in df.columns:
        raise ValueError(
            f"pq_encode_residual: no {cell_col!r} column — run "
            f"ivf_assign first (the residual is relative to the "
            f"STORED cell)")
    cent = F.array(*[F.array(*[F.lit(float(x)) for x in c])
                     for c in centroids])
    keep = [c for c in df.columns if c != vec_col]
    res = df.select(
        *keep,
        F.zip_with(F.col(vec_col),
                   F.element_at(cent, F.col(cell_col) + 1),
                   lambda x, y: x.cast("double") - y).alias("_rv"))
    res = materialize(res, materialize_mode)
    codes = F.array(*[
        _pq_code(F.slice(F.col("_rv"), b * sub + 1, sub), codebooks[b])
        for b in range(m)])
    coded = materialize(res.select(*keep, codes.alias("codes")),
                        materialize_mode)
    tables = [F.array(*[F.array(*[F.lit(float(x)) for x in c])
                        for c in book]) for book in codebooks]
    rhat = F.concat(*[
        F.element_at(tables[b], F.col("codes").getItem(b) + 1)
        for b in range(m)])
    rec = F.zip_with(F.element_at(cent, F.col(cell_col) + 1), rhat,
                     lambda x, y: x + y)
    p2 = F.aggregate(rec, F.lit(0.0), lambda a, x: a + x * x)
    return coded.select(*keep, "codes",
                        F.round(F.sqrt(p2), 6).alias("pnorm"))


def pq_adc_topk_residual(codes_df: DataFrame, query_vec: list[float],
                         codebooks: list[list[list[float]]],
                         centroids: list[list[float]], k: int = 10,
                         id_col: str = "vec_id",
                         cell_col: str = "ivf_cell") -> DataFrame:
    """Asymmetric-distance top-k over RESIDUAL PQ codes
    (:func:`pq_encode_residual` output): the reconstruction is
    ``x̂ = centroid(cell) + r̂``, so the cosine numerator splits as
    ``q·x̂ = q·centroid(cell) + Σ_b LUT[b][code_b]`` — the SAME
    per-block lookup tables as :func:`pq_adc_topk` (built against the
    residual codebooks) plus ONE per-cell constant, both driver-side
    (k + m·ksub doubles — control-plane sized). Per-row work stays m+1
    array lookups and an add chain; the denominator uses the stored
    reconstruction norm. Scores are exact over the reconstructions
    (deterministic — the add order is cell term first, then blocks in
    order, matching the left-fold restatement), so residual ADC's only
    approximation is the (smaller) residual quantization error.
    Zero-reconstruction rows are excluded as in the raw path. Returns
    ``(id_col, cos_sim)``. Cell-pruned search over a stored index:
    ``streaming/ann_stream.ivf_search(pq_residual=True)``."""
    m, ksub, sub = _pq_shapes(codebooks)
    if len(query_vec) != m * sub:
        raise ValueError(
            f"pq_adc_topk_residual: query dim {len(query_vec)} != "
            f"m·sub {m * sub}")
    if len(centroids[0]) != m * sub:
        raise ValueError(
            f"pq_adc_topk_residual: centroid dim {len(centroids[0])} "
            f"!= m·sub {m * sub}")
    lut = [[_fold_sum([float(query_vec[b * sub + i]) * float(c[i])
                       for i in range(sub)])
            for c in book] for b, book in enumerate(codebooks)]
    qcell = [_fold_sum([float(q) * float(x)
                        for q, x in zip(query_vec, c)])
             for c in centroids]
    qnorm = math.sqrt(_fold_sum([float(x) * float(x)
                                 for x in query_vec]))
    num = F.element_at(F.array(*[F.lit(v) for v in qcell]),
                       F.col(cell_col) + 1)
    for b in range(m):
        num = num + F.element_at(
            F.array(*[F.lit(v) for v in lut[b]]),
            F.col("codes").getItem(b) + 1)
    return (
        codes_df.filter(F.col("pnorm") > 0)
        .select(F.col(id_col),
                F.round(num / (F.col("pnorm") * F.lit(qnorm)), 6)
                .alias("cos_sim"))
        .orderBy(F.col("cos_sim").desc(), id_col)
        .limit(k)
    )
