"""ivf_assign centroid-count scaling: the score is dot(v,c)/|c| with the
centroid norm a driver-side constant, so the plan must stay linear in the
centroid count (the naive per-centroid cosine() re-inlines norm(vec) once
per centroid — a quadratic expression-tree blowup)."""

import math
import time

import pytest
from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.operators.similarity import (
    ivf_assign,
)

DIM = 64
N_CENTROIDS = 256


def _centroids():
    out = []
    for c in range(N_CENTROIDS):
        v = [math.sin(1.0 + 13.0 * c + 7.0 * d) for d in range(DIM)]
        out.append(v)
    return out


def test_quantize_int8_roundtrip_and_bounds(spark):
    from pyspark.sql import functions as F

    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        dequantize_int8,
        quantize_int8,
    )

    rows = [(0, [0.5, -1.0, 0.25, 0.0]),
            (1, [3.0, 3.0, 3.0, 3.0]),
            (2, [0.0, 0.0, 0.0, 0.0])]   # all-zero vector edge case
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qt = quantize_int8(df)
    got = {r.vec_id: r for r in qt.collect()}
    assert got[0].codes == [64, -127, 32, 0]  # floor(0.5*127/1 + 0.5) = 64
    assert got[0].scale == 1.0 / 127
    assert got[1].codes == [127, 127, 127, 127]
    assert got[2].codes == [0, 0, 0, 0] and got[2].scale == 0.0
    # reconstruction error ≤ scale/2 per component
    rec = (qt.join(df, "vec_id")
           .select("vec_id", "scale",
                   F.zip_with(dequantize_int8(F.col("codes"),
                                              F.col("scale")),
                              F.col("embedding"),
                              lambda a, b: F.abs(a - b)).alias("err"))
           .collect())
    for r in rec:
        assert all(e <= r.scale / 2 + 1e-12 for e in r.err), r


def test_quantized_cosine_topk_close_to_exact(spark):
    import math
    import random

    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        cosine_topk,
        quantize_int8,
        quantized_cosine_topk,
    )

    rng = random.Random(7)
    rows = [(i, [rng.gauss(0, 1) for _ in range(16)]) for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    qvec = rows[0][1]
    exact = {r.vec_id: r.cos_sim
             for r in cosine_topk(df.filter("vec_id != 0"), qvec, k=10)
             .collect()}
    qt = quantize_int8(df)
    qcodes = qt.filter("vec_id = 0").head().codes
    approx = {r.vec_id: r.cos_sim
              for r in quantized_cosine_topk(qt.filter("vec_id != 0"),
                                             qcodes, k=10).collect()}
    # int8 cosine error is ~1e-2 worst case at dim 16; the top sets
    # should mostly agree and scores should be close where they overlap
    assert len(set(exact) & set(approx)) >= 8
    for v in set(exact) & set(approx):
        assert math.isclose(exact[v], approx[v], abs_tol=0.03)


def test_ivf_assign_256_centroids_bounded(spark):
    rows = [(i, [math.cos(0.5 * i + 0.1 * d) for d in range(DIM)])
            for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    t0 = time.perf_counter()
    out = ivf_assign(df, _centroids())
    cells = out.groupBy().agg(F.min("ivf_cell"), F.max("ivf_cell")).first()
    dt = time.perf_counter() - t0
    assert 0 <= cells[0] <= cells[1] <= N_CENTROIDS - 1
    # plan + run; generous bound — the blowup form takes minutes/OOMs
    assert dt < 120, f"ivf_assign with 256 centroids took {dt:.1f}s"


def test_ivf_assign_matches_exact_cosine_argmax(spark):
    rows = [(i, [math.cos(0.5 * i + 0.1 * d) for d in range(DIM)])
            for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = _centroids()[:16]
    got = {r.vec_id: r.ivf_cell for r in ivf_assign(df, cents).collect()}
    for vec_id, emb in rows:
        best, best_cos = None, None
        for ci, c in enumerate(cents):
            d = sum(a * b for a, b in zip(emb, c))
            cos = d / (math.sqrt(sum(a * a for a in emb))
                       * math.sqrt(sum(b * b for b in c)))
            if best_cos is None or cos > best_cos:
                best, best_cos = ci, cos
        assert got[vec_id] == best, vec_id


def _pycos(a, b):
    d = sum(x * y for x, y in zip(a, b))
    return d / (math.sqrt(sum(x * x for x in a))
                * math.sqrt(sum(y * y for y in b)))


def test_ivf_topk_equals_exact_within_probed_cells(spark):
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        ivf_topk,
    )

    rows = [(i, [math.cos(0.5 * i + 0.1 * d) for d in range(DIM)])
            for i in range(80)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = _centroids()[:8]
    query = rows[0][1]
    got = [(r.vec_id, r.cos_sim)
           for r in ivf_topk(df, query, cents, k=5, n_probe=2).collect()]

    probed = sorted(range(len(cents)),
                    key=lambda i: (-_pycos(query, cents[i]), i))[:2]
    assigned = {r.vec_id: r.ivf_cell for r in ivf_assign(df, cents).collect()}
    want = sorted(((vid, round(_pycos(emb, query), 6)) for vid, emb in rows
                   if assigned[vid] in probed),
                  key=lambda t: (-t[1], t[0]))[:5]
    assert [v for v, _ in got] == [v for v, _ in want]
    for (_, g), (_, w) in zip(got, want):
        assert abs(g - w) < 1e-6


def test_multiprobe_superset_of_single_probe(spark):
    """probe_bits=0 is exactly the single-bucket search; probe_bits=1 must
    search a superset, so its top-k cosines dominate pointwise."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        lsh_ann_topk,
        lsh_ann_topk_multiprobe,
    )

    rows = [(i, [math.cos(0.5 * i + 0.1 * d) for d in range(DIM)])
            for i in range(200)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    query = rows[0][1]
    single = [r.cos_sim for r in
              lsh_ann_topk(df, query, k=10, n_planes=4).collect()]
    zero = [r.cos_sim for r in
            lsh_ann_topk_multiprobe(df, query, k=10, n_planes=4,
                                    probe_bits=0).collect()]
    multi = [r.cos_sim for r in
             lsh_ann_topk_multiprobe(df, query, k=10, n_planes=4,
                                     probe_bits=1).collect()]
    assert zero == single
    assert len(multi) >= len(single)
    for m, s in zip(multi, single):
        assert m >= s - 1e-9


def test_train_ivf_centroids_recovers_blobs(spark):
    """Lloyd's k-means on three well-separated deterministic blobs must
    place one centroid per blob (within tolerance of the blob mean), and
    ivf_assign with the trained centroids must put every vector in its
    blob's cell."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        ivf_assign,
        train_ivf_centroids,
    )

    means = [[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0]]
    rows = []
    i = 0
    for b, m in enumerate(means):
        for j in range(20):
            off = [((j * 7 + d * 3) % 5 - 2) * 0.1 for d in range(3)]
            rows.append((i, [m[d] + off[d] for d in range(3)], b))
            i += 1
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, blob int")

    cents = train_ivf_centroids(df, k=3, dim=3, max_iter=15)
    assert len(cents) == 3
    # every blob mean is approximated by exactly one centroid
    matched = set()
    for m in means:
        best = min(range(3), key=lambda c: sum(
            (cents[c][d] - m[d]) ** 2 for d in range(3)))
        assert all(abs(cents[best][d] - m[d]) < 0.5 for d in range(3))
        matched.add(best)
    assert matched == {0, 1, 2}

    # assignment purity: each blob lands wholly in one cell
    out = ivf_assign(df, cents).select("blob", "ivf_cell").distinct().collect()
    by_blob = {}
    for r in out:
        by_blob.setdefault(r.blob, set()).add(r.ivf_cell)
    assert all(len(cells) == 1 for cells in by_blob.values())
    assert len({c for cells in by_blob.values() for c in cells}) == 3


def test_train_ivf_centroids_k_too_large_raises(spark):
    import pytest

    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        train_ivf_centroids,
    )

    df = spark.createDataFrame([(0, [1.0, 0.0])],
                               "vec_id long, embedding array<double>")
    with pytest.raises(ValueError, match="exceeds corpus size"):
        train_ivf_centroids(df, k=5, dim=2)


def test_ivf_cell_partitioned_layout_prunes(spark, tmp_path):
    """The ivf_topk docstring's scale claim, pinned: a table written
    partitionBy('ivf_cell') and filtered to the probed cells shows
    partition-filter pruning in the scan (only probed cells are read)."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        ivf_assign,
    )

    rows = [(i, [float(i % 7), float((i * 3) % 5), 1.0]) for i in range(100)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = [[1.0, 0.0, 0.0], [0.0, 1.0, 0.0], [0.0, 0.0, 1.0]]
    out = str(tmp_path / "ivf")
    ivf_assign(df, cents).write.partitionBy("ivf_cell").parquet(out)

    stored = spark.read.parquet(out)
    probed = stored.filter(stored.ivf_cell.isin([0, 2]))
    plan = probed._jdf.queryExecution().executedPlan().toString()
    # the IN-list lands in the scan's PartitionFilters (e.g.
    # "PartitionFilters: [ivf_cell#35 IN (0,2)]"), NOT PushedFilters —
    # only probed cells' directories are listed/read
    import re

    m = re.search(r"PartitionFilters: \[ivf_cell#\d+ IN \(0,2\)\]", plan)
    assert m, plan[:500]
    # pruning is real, not cosmetic: only the probed cells' rows surface
    import os
    cells_on_disk = {d for d in os.listdir(out) if d.startswith("ivf_cell=")}
    assert len(cells_on_disk) >= 2
    assert probed.select("ivf_cell").distinct().count() <= 2


@pytest.mark.slow
def test_drop_embedding_neardups_keep_one(spark, sf_dir):
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        drop_embedding_neardups,
        lsh_blocked_pairs,
    )
    from pyspark.sql import functions as F

    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .filter(F.col("vec_id") < 200).select("vec_id", "embedding"))
    dim = len(emb.first().embedding)
    pairs = [(r.id_a, r.id_b) for r in
             lsh_blocked_pairs(emb, threshold=0.25, dim=dim,
                               n_planes=2).collect()]
    # python union-find over the same pairs → expected survivors
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = [r.vec_id for r in emb.select("vec_id").collect()]
    for i in ids:
        find(i)
    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {i for i in ids if find(i) == i}

    got = {r.vec_id for r in drop_embedding_neardups(
        emb, threshold=0.25, dim=dim, n_planes=2).collect()}
    assert got == expected
    assert pairs  # the fixture must actually exercise the dedup
    assert len(got) < len(ids)


def test_train_ivf_centroids_adversarial_leading_ids(spark):
    """Seeding must not collapse onto a degenerate leading-id cluster:
    ids 0..9 are EXACT duplicates of one vector (insertion-ordered
    corpora front-load near-identical early docs — the case the old
    ``orderBy(id).limit(k)`` init seeded all k centroids from). The
    hash-fraction init draws seeds uniformly over ids, and Lloyd must
    still recover all three blob means."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        ivf_assign,
        train_ivf_centroids,
    )

    means = [[10.0, 0.0, 0.0], [0.0, 10.0, 0.0], [0.0, 0.0, 10.0]]
    rows = [(i, [10.0, 0.0, 0.0], 0) for i in range(10)]
    for i in range(10, 70):
        b = i % 3
        off = [((i * 7 + d * 3) % 5 - 2) * 0.1 for d in range(3)]
        rows.append((i, [means[b][d] + off[d] for d in range(3)], b))
    df = spark.createDataFrame(
        rows, "vec_id long, embedding array<double>, blob int")

    cents = train_ivf_centroids(df, k=3, dim=3, max_iter=15)
    matched = set()
    for m in means:
        best = min(range(3), key=lambda c: sum(
            (cents[c][d] - m[d]) ** 2 for d in range(3)))
        assert all(abs(cents[best][d] - m[d]) < 0.5 for d in range(3))
        matched.add(best)
    assert matched == {0, 1, 2}
    # assignment purity: each blob lands wholly in one cell
    out = ivf_assign(df, cents).select("blob", "ivf_cell").distinct().collect()
    by_blob = {}
    for r in out:
        by_blob.setdefault(r.blob, set()).add(r.ivf_cell)
    assert all(len(cells) == 1 for cells in by_blob.values())


def _exact_pairs(rows, threshold):
    """Python brute-force near-dup pairs over [(id, vec)] rows."""
    out = set()
    for i, (ia, va) in enumerate(rows):
        for ib, vb in rows[i + 1:]:
            if round(_pycos(va, vb), 6) >= threshold:
                out.add((min(ia, ib), max(ia, ib)))
    return out


def test_cluster_neardup_single_cell_is_brute_force(spark, sf_dir):
    """With one centroid every vector shares the cell, so the blocked
    pairs must equal the exact all-pairs result — the blocking layer
    verified against ground truth with the recall trade switched off."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        cluster_neardup_pairs,
    )
    from pyspark.sql import functions as F

    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .filter(F.col("vec_id") < 60).select("vec_id", "embedding"))
    rows = [(r.vec_id, list(r.embedding)) for r in emb.collect()]
    dim = len(rows[0][1])
    expected = _exact_pairs(rows, 0.2)
    got = {(r.id_a, r.id_b) for r in cluster_neardup_pairs(
        emb, [[1.0] * dim], threshold=0.2).collect()}
    assert got == expected
    assert expected  # fixture must exercise the refine step


def test_cluster_neardup_pairs_block_on_assigned_cell(spark, sf_dir):
    """Every emitted pair shares the argmax-cosine cell of both
    endpoints, its cosine is exact and ≥ threshold, and cross-cell
    near-dups are absent (the documented recall trade at n_probe=1)."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        cluster_neardup_pairs,
        ivf_assign,
    )
    from pyspark.sql import functions as F

    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", "embedding"))
    cents = [list(r.embedding) for r in
             emb.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()]
    corpus = emb.filter(F.col("vec_id") >= 4)
    cell = {r.vec_id: r.ivf_cell
            for r in ivf_assign(corpus, cents).collect()}
    vec = {r.vec_id: list(r.embedding) for r in corpus.collect()}
    got = {(r.id_a, r.id_b): r.cos_sim for r in cluster_neardup_pairs(
        corpus, cents, threshold=0.3).collect()}
    assert got
    for (a, b), cs in got.items():
        assert a < b
        assert cell[a] == cell[b]
        assert cs >= 0.3
        assert abs(cs - round(_pycos(vec[a], vec[b]), 6)) < 1e-9
    # completeness within cells: every same-cell pair over threshold is in
    expected = {p for p in _exact_pairs(list(vec.items()), 0.3)
                if cell[p[0]] == cell[p[1]]}
    assert set(got) == expected


def test_cluster_neardup_multiprobe_superset_and_unique(spark, sf_dir):
    """n_probe=2 recovers boundary pairs: the result is a strict-or-equal
    superset of n_probe=1, each pair appears exactly once, and every
    extra pair is a genuine cross-cell near-dup."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        cluster_neardup_pairs,
        ivf_assign,
    )
    from pyspark.sql import functions as F

    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", "embedding"))
    cents = [list(r.embedding) for r in
             emb.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()]
    corpus = emb.filter(F.col("vec_id") >= 4)
    one = cluster_neardup_pairs(corpus, cents, threshold=0.25).collect()
    two = cluster_neardup_pairs(corpus, cents, threshold=0.25,
                                n_probe=2).collect()
    keys1 = {(r.id_a, r.id_b) for r in one}
    keys2 = [(r.id_a, r.id_b) for r in two]
    assert len(keys2) == len(set(keys2))  # one row per pair after probing
    assert set(keys2) >= keys1
    cell = {r.vec_id: r.ivf_cell
            for r in ivf_assign(corpus, cents).collect()}
    for a, b in set(keys2) - keys1:
        assert cell[a] != cell[b]  # the recovered pairs cross a boundary


@pytest.mark.slow
def test_drop_cluster_neardups_keep_one(spark, sf_dir):
    """Keep-one semantics equal a python union-find over the same pairs
    (the drop_embedding_neardups contract, cluster-blocked)."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        cluster_neardup_pairs,
        drop_cluster_neardups,
    )
    from pyspark.sql import functions as F

    emb = (spark.read.parquet(f"{sf_dir}/embeddings.parquet")
           .select("vec_id", "embedding"))
    cents = [list(r.embedding) for r in
             emb.filter(F.col("vec_id") < 4).orderBy("vec_id").collect()]
    corpus = emb.filter(F.col("vec_id") >= 4)
    pairs = [(r.id_a, r.id_b) for r in
             cluster_neardup_pairs(corpus, cents, threshold=0.3).collect()]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    ids = [r.vec_id for r in corpus.select("vec_id").collect()]
    for i in ids:
        find(i)
    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    expected = {i for i in ids if find(i) == i}
    got = {r.vec_id for r in drop_cluster_neardups(
        corpus, cents, threshold=0.3).collect()}
    assert got == expected
    assert pairs and len(got) < len(ids)
