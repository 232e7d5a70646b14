"""Streaming IVF ANN index (streaming/ann_stream.py): search parity
with the batch operator, replay idempotence, cell partition pruning,
centroid pinning, and layout-preserving compaction."""

import pytest

# streaming index soaks — excluded from the default fast tier (pytest.ini)
pytestmark = pytest.mark.slow

import os

import pytest

from harvesting_extract_to_ttl_service_spark.operators.similarity import (
    ivf_topk,
    train_ivf_centroids,
)
from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
    compact_ivf_index,
    ivf_index_batch,
    ivf_search,
    run_ivf_index_stream,
)

V_SCHEMA = "vec_id long, embedding array<double>"
DIM = 8


def _vecs(spark, ids):
    """Deterministic spread-out vectors: unit-ish vectors leaning toward
    axis (i mod DIM) with an id-dependent perturbation."""
    rows = [(i, [1.0 if d == i % DIM else 0.1 * ((i * 7 + d) % 5)
                 for d in range(DIM)]) for i in ids]
    return spark.createDataFrame(rows, V_SCHEMA)


@pytest.fixture(scope="module")
def centroids(spark):
    return train_ivf_centroids(_vecs(spark, range(64)), k=4, dim=DIM)


def test_ivf_stream_search_matches_batch_topk(spark, tmp_path, centroids):
    """Two streamed batches, one search: results equal ivf_topk over the
    union with the same centroids/k/n_probe — assignment at ingest
    changes nothing about the answer, only when the work happens."""
    idir = str(tmp_path / "ivf")
    ivf_index_batch(_vecs(spark, range(0, 32)), 0, idir, centroids)
    ivf_index_batch(_vecs(spark, range(32, 64)), 1, idir, centroids)

    query = [1.0] + [0.05] * (DIM - 1)
    got = ivf_search(spark, idir, query, centroids, k=5, n_probe=2)
    want = ivf_topk(_vecs(spark, range(64)), query, centroids, k=5,
                    n_probe=2)
    assert [tuple(r) for r in got.collect()] \
        == [tuple(r) for r in want.collect()]

    # the cell filter partition-prunes: only probed cells' files are read
    plan = got._jdf.queryExecution().executedPlan().toString()
    pf = plan[plan.find("PartitionFilters"):].split("]")[0]
    assert "ivf_cell" in pf, plan


def test_ivf_index_replay_and_sidecar(spark, tmp_path, centroids):
    """A replayed batch rewrites its own partition identically; an index
    built with different centroids is refused (probing the wrong cells
    would silently return garbage)."""
    idir = str(tmp_path / "ivf")
    ivf_index_batch(_vecs(spark, range(0, 16)), 0, idir, centroids)
    query = [1.0] + [0.0] * (DIM - 1)
    before = [tuple(r) for r in ivf_search(
        spark, idir, query, centroids, k=3).collect()]

    ivf_index_batch(_vecs(spark, range(0, 16)), 0, idir, centroids)
    assert [tuple(r) for r in ivf_search(
        spark, idir, query, centroids, k=3).collect()] == before
    n = spark.read.option("basePath", idir).parquet(idir).count()
    assert n == 16  # no duplicated rows

    other = [[float(d == i) for d in range(DIM)] for i in range(4)]
    with pytest.raises(ValueError, match="silently missed"):
        ivf_index_batch(_vecs(spark, range(16, 20)), 1, idir, other)
    with pytest.raises(ValueError, match="silently missed"):
        ivf_search(spark, idir, query, other, k=3).collect()


def test_quantized_ivf_index_search_and_mode_pinning(spark, tmp_path,
                                                     centroids):
    """An int8 index (quantize=True) searches in exact integer
    arithmetic: results equal quantized_cosine_topk over the SAME
    vectors restricted to the probed cells; a float search against the
    int8 index (or vice versa) refuses via the sidecar; replay
    rewrites identically; compaction preserves results."""
    from pyspark.sql import functions as F

    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        ivf_assign,
        quantize_int8,
        quantized_cosine_topk,
        quantize_vec_int8,
    )

    idir = str(tmp_path / "ivfq")
    ivf_index_batch(_vecs(spark, range(0, 32)), 0, idir, centroids,
                    quantize=True)
    ivf_index_batch(_vecs(spark, range(32, 64)), 1, idir, centroids,
                    quantize=True)

    query = [1.0] + [0.05] * (DIM - 1)
    got = [tuple(r) for r in ivf_search(
        spark, idir, query, centroids, k=5, n_probe=2,
        quantized=True).collect()]

    # independent expectation: quantize the union, restrict to the two
    # probed cells (re-derived via ivf_assign on floats), brute-force
    # integer-cosine top-k
    all_vecs = _vecs(spark, range(64))
    assigned = ivf_assign(all_vecs, centroids)
    import math

    def cos(a, b):
        return (sum(x * y for x, y in zip(a, b))
                / (math.sqrt(sum(x * x for x in a))
                   * math.sqrt(sum(y * y for y in b))))

    probed = sorted(range(len(centroids)),
                    key=lambda i: (-cos(query, centroids[i]), i))[:2]
    cand = assigned.filter(F.col("ivf_cell").isin(probed)) \
        .select("vec_id", "embedding")
    qcodes, _ = quantize_vec_int8(query)
    want = [tuple(r) for r in quantized_cosine_topk(
        quantize_int8(cand), qcodes, k=5).collect()]
    assert got == want

    # mode mismatch refuses both ways
    with pytest.raises(ValueError):
        ivf_search(spark, idir, query, centroids, k=5, quantized=False)
    fdir = str(tmp_path / "ivff")
    ivf_index_batch(_vecs(spark, range(0, 16)), 0, fdir, centroids)
    with pytest.raises(ValueError):
        ivf_search(spark, fdir, query, centroids, k=5, quantized=True)

    # replay + compaction keep the quantized answer
    ivf_index_batch(_vecs(spark, range(0, 32)), 0, idir, centroids,
                    quantize=True)
    assert [tuple(r) for r in ivf_search(
        spark, idir, query, centroids, k=5, n_probe=2,
        quantized=True).collect()] == got
    assert compact_ivf_index(spark, idir) == 2
    assert [tuple(r) for r in ivf_search(
        spark, idir, query, centroids, k=5, n_probe=2,
        quantized=True).collect()] == got


def test_ivf_compact_preserves_cells_and_results(spark, tmp_path,
                                                 centroids):
    """Compaction folds batch partitions into the generational segment
    tree while KEEPING the ivf_cell directory level (the pruning the
    index exists for), search results unchanged, post-compaction
    batches still append, a replay of a folded batch refuses at the
    fence, and the next fold is MINOR (a new segment — the existing
    one untouched)."""
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _ivf_frames,
        _read_json_sidecar,
    )

    idir = str(tmp_path / "ivf")
    ivf_index_batch(_vecs(spark, range(0, 24)), 0, idir, centroids)
    ivf_index_batch(_vecs(spark, range(24, 48)), 1, idir, centroids)
    query = [0.2] * DIM
    before = [tuple(r) for r in ivf_search(
        spark, idir, query, centroids, k=4).collect()]

    assert compact_ivf_index(spark, idir) == 2
    assert [tuple(r) for r in ivf_search(
        spark, idir, query, centroids, k=4).collect()] == before
    # the folded segment keeps per-cell directories
    cells = [d for d in os.listdir(f"{idir}/gen=0/seg=0")
             if d.startswith("ivf_cell=")]
    assert cells
    assert _read_json_sidecar(spark, f"{idir}/_ivf_generation.json") \
        == {"generation": 0, "segments": [0],
            "max_folded_batch": 1, "applied_dels": -1}
    # a replay of a folded batch refuses at the fence
    with pytest.raises(ValueError, match="already folded"):
        ivf_index_batch(_vecs(spark, range(0, 24)), 1, idir, centroids)

    ivf_index_batch(_vecs(spark, range(48, 56)), 2, idir, centroids)
    assert _ivf_frames(spark, idir).count() == 56
    # the second fold is MINOR: seg=1 appears, seg=0 untouched
    import time as _time

    mtime0 = os.path.getmtime(f"{idir}/gen=0/seg=0")
    _time.sleep(0.01)
    assert compact_ivf_index(spark, idir) == 1
    assert _read_json_sidecar(spark, f"{idir}/_ivf_generation.json") \
        == {"generation": 0, "segments": [0, 1],
            "max_folded_batch": 2, "applied_dels": -1}
    assert os.path.getmtime(f"{idir}/gen=0/seg=0") == mtime0
    assert [tuple(r) for r in ivf_search(
        spark, idir, query, centroids, k=4).collect()] == \
        [tuple(r) for r in ivf_topk(
            _vecs(spark, range(56)), query, centroids, k=4).collect()]


def test_retrain_ivf_index_recenters_and_repins(spark, tmp_path,
                                                centroids):
    """The drift-maintenance job: retrain re-centers over the ACCUMULATED
    index, search with the NEW centroids equals a fresh ivf_topk over
    the same vectors, the OLD centroids refuse (digest re-pinned), the
    layout stays cell-partitioned, and ingest resumes under the new
    digest."""
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        retrain_ivf_index,
    )

    idir = str(tmp_path / "ivf")
    # centroids fixture was trained on 0..63; ingest includes a drifted
    # tail (ids 64..95 lean on shifted axes)
    ivf_index_batch(_vecs(spark, range(0, 48)), 0, idir, centroids)
    ivf_index_batch(_vecs(spark, range(48, 96)), 1, idir, centroids)

    new_cents = retrain_ivf_index(spark, idir)
    assert len(new_cents) == len(centroids)
    assert new_cents != centroids

    query = [1.0] + [0.05] * (DIM - 1)
    got = [tuple(r) for r in ivf_search(
        spark, idir, query, new_cents, k=5, n_probe=2).collect()]
    want = [tuple(r) for r in ivf_topk(
        _vecs(spark, range(96)), query, new_cents, k=5,
        n_probe=2).collect()]
    assert got == want

    # the old centroids can never probe this index again
    with pytest.raises(ValueError, match="built with"):
        ivf_search(spark, idir, query, centroids, k=5)
    # layout: one consolidated generation segment, still cell-partitioned
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _ivf_frames,
    )

    assert not any(d.startswith("batch=") for d in os.listdir(idir))
    assert any(d.startswith("ivf_cell=")
               for d in os.listdir(f"{idir}/gen=0/seg=0"))
    # ingest resumes under the new digest; the old one refuses
    ivf_index_batch(_vecs(spark, range(96, 104)), 2, idir, new_cents)
    assert _ivf_frames(spark, idir).count() == 104
    with pytest.raises(ValueError, match="built with"):
        ivf_index_batch(_vecs(spark, range(104, 108)), 3, idir,
                        centroids)


def test_retrain_ivf_index_crash_marker_and_recovery(spark, tmp_path,
                                                     centroids):
    """A crashed retrain leaves the in-progress sidecar marker, which
    makes EVERY search/ingest refuse loudly (never silent wrong-cell
    probes); re-running the job recovers, including collapsing the
    duplicate ids a mid-swap crash can leave."""
    import json as _json

    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        retrain_ivf_index,
    )

    idir = str(tmp_path / "ivf")
    ivf_index_batch(_vecs(spark, range(0, 32)), 0, idir, centroids)

    # simulate the crash window: marker written, old batch dir also
    # duplicated into batch=-1 (the worst mid-swap state)
    side = f"{idir}/_ivf_params.json"
    crc = f"{idir}/._ivf_params.json.crc"
    params = _json.loads(open(side).read())
    os.path.exists(crc) and os.unlink(crc)
    with open(side, "w") as f:
        f.write(_json.dumps({**params, "retraining": True}))
    dup = spark.read.option("basePath", idir).parquet(idir).drop("batch")
    dup.write.mode("overwrite").partitionBy("ivf_cell") \
        .parquet(f"{idir}/batch=-1")
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _ivf_frames,
    )

    query = [1.0] + [0.05] * (DIM - 1)
    with pytest.raises(ValueError, match="built with"):
        ivf_search(spark, idir, query, centroids, k=5)
    with pytest.raises(ValueError, match="built with"):
        ivf_index_batch(_vecs(spark, range(32, 40)), 1, idir, centroids)

    new_cents = retrain_ivf_index(spark, idir)
    idx = _ivf_frames(spark, idir)
    assert idx.count() == 32                       # duplicates collapsed
    got = [tuple(r) for r in ivf_search(
        spark, idir, query, new_cents, k=5, n_probe=2).collect()]
    want = [tuple(r) for r in ivf_topk(
        _vecs(spark, range(32)), query, new_cents, k=5,
        n_probe=2).collect()]
    assert got == want


def test_retrain_ivf_index_quantized_keeps_codes(spark, tmp_path,
                                                 centroids):
    """Quantized indexes retrain on the dequantized floats and keep the
    stored int8 codes byte-wise; quantized search works under the new
    digest and the float mode still refuses."""
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        retrain_ivf_index,
    )

    idir = str(tmp_path / "ivf")
    ivf_index_batch(_vecs(spark, range(0, 48)), 0, idir, centroids,
                    quantize=True)
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _ivf_frames,
    )

    before = {r.id: (list(r.codes), r.scale) for r in
              _ivf_frames(spark, idir)
              .select("id", "codes", "scale").collect()}

    new_cents = retrain_ivf_index(spark, idir)
    after = {r.id: (list(r.codes), r.scale) for r in
             _ivf_frames(spark, idir)
             .select("id", "codes", "scale").collect()}
    assert after == before

    query = [1.0] + [0.05] * (DIM - 1)
    got = ivf_search(spark, idir, query, new_cents, k=5, n_probe=2,
                     quantized=True).collect()
    assert len(got) == 5 and got[0].cos_sim >= got[-1].cos_sim
    with pytest.raises(ValueError, match="built with"):
        ivf_search(spark, idir, query, new_cents, k=5, quantized=False)


def test_ivf_pq_index_search_and_mode_pinning(spark, tmp_path,
                                              centroids):
    """The IVF-PQ pairing: ingest stores m-byte PQ codes (cell
    membership identical to the float index — assignment runs on the
    float input), ADC search over the pruned cells equals pq_adc_topk
    restricted to those cells, and mode/codebook mismatches refuse."""
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        pq_adc_topk,
        pq_encode,
        train_pq_codebooks,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        retrain_ivf_index,
    )

    m, ksub = 4, 8
    books = train_pq_codebooks(_vecs(spark, range(64)), m, ksub, DIM,
                               max_iter=3)
    idir = str(tmp_path / "ivfpq")
    ivf_index_batch(_vecs(spark, range(0, 32)), 0, idir, centroids,
                    pq_codebooks=books)
    ivf_index_batch(_vecs(spark, range(32, 64)), 1, idir, centroids,
                    pq_codebooks=books)

    idx = spark.read.option("basePath", idir).parquet(idir)
    assert set(idx.columns) == {"id", "codes", "pnorm", "ivf_cell",
                                "batch"}
    # cell membership matches the float index's
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        ivf_assign,
    )

    want_cells = {r.vec_id: r.ivf_cell for r in ivf_assign(
        _vecs(spark, range(64)), centroids).collect()}
    got_cells = {r.id: r.ivf_cell for r in idx.collect()}
    assert got_cells == want_cells

    # ADC search over the probed cells == pq_adc_topk restricted to them
    import math as _math

    query = [1.0] + [0.05] * (DIM - 1)
    got = [tuple(r) for r in ivf_search(
        spark, idir, query, centroids, k=5, n_probe=2,
        pq_codebooks=books).collect()]

    def _cosq(a, b):
        num = sum(float(x) * float(y) for x, y in zip(a, b))
        return num / (_math.sqrt(sum(x * x for x in a))
                      * _math.sqrt(sum(y * y for y in b)))

    top2 = sorted(range(len(centroids)),
                  key=lambda i: (-_cosq(query, centroids[i]), i))[:2]
    cand_ids = [i for i, c in want_cells.items() if c in top2]
    want = [tuple(r) for r in pq_adc_topk(
        pq_encode(_vecs(spark, cand_ids), books), query, books,
        k=5).collect()]
    assert got == want

    # mode / codebook pinning
    with pytest.raises(ValueError, match="built with"):
        ivf_search(spark, idir, query, centroids, k=5)  # float mode
    other = train_pq_codebooks(_vecs(spark, range(64)), m, 4, DIM,
                               max_iter=1)
    with pytest.raises(ValueError, match="built with"):
        ivf_search(spark, idir, query, centroids, k=5,
                   pq_codebooks=other)
    with pytest.raises(ValueError, match="mutually exclusive"):
        ivf_index_batch(_vecs(spark, range(64, 66)), 2, idir, centroids,
                        quantize=True, pq_codebooks=books)

    # batched PQ kNN join == the single-query PQ loop, row for row
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        ivf_search_batch,
    )

    queries = _vecs(spark, range(0, 12, 3)) \
        .withColumnRenamed("vec_id", "query_id")
    batched = {(r.query_id, r.rank): (r.vec_id, r.cos_sim)
               for r in ivf_search_batch(
                   spark, idir, queries, centroids, k=4, n_probe=2,
                   pq_codebooks=books).collect()}
    for qr in queries.collect():
        single = ivf_search(spark, idir, list(qr.embedding), centroids,
                            k=4, n_probe=2, pq_codebooks=books).collect()
        for rank, r in enumerate(single, start=1):
            assert batched[(qr.query_id, rank)] \
                == (r.vec_id, r.cos_sim), (qr.query_id, rank)

    # retrain: codes byte-wise identical, requires the SAME codebooks
    before = {r.id: list(r.codes) for r in idx.collect()}
    with pytest.raises(ValueError, match="pass the SAME codebooks"):
        retrain_ivf_index(spark, idir)
    with pytest.raises(ValueError, match="digest"):
        retrain_ivf_index(spark, idir, pq_codebooks=other)
    new_cents = retrain_ivf_index(spark, idir, pq_codebooks=books)
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _ivf_frames,
    )

    after = {r.id: list(r.codes) for r in
             _ivf_frames(spark, idir).collect()}
    assert after == before
    got2 = ivf_search(spark, idir, query, new_cents, k=5, n_probe=2,
                      pq_codebooks=books).collect()
    assert len(got2) == 5


def test_run_ivf_index_stream_end_to_end(spark, tmp_path, centroids):
    """The foreachBatch wiring: a file stream drained under a checkpoint
    indexes each delivery exactly once."""
    import json as _json

    sdir = str(tmp_path / "vecs")
    idir = str(tmp_path / "ivf")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(sdir)
    rows = [(i, [1.0 if d == i % DIM else 0.0 for d in range(DIM)])
            for i in range(10)]
    with open(f"{sdir}/b0.json", "w") as f:
        for i, v in rows:
            f.write(_json.dumps({"vec_id": i, "embedding": v}) + "\n")

    st = spark.readStream.schema(V_SCHEMA).json(sdir)
    q = run_ivf_index_stream(st, idir, ckpt, centroids)
    q.awaitTermination(120)
    assert spark.read.option("basePath", idir).parquet(idir).count() == 10


def test_ivf_topk_join_per_query_equals_single_query(spark, centroids):
    """The batched kNN join's rows for each query equal a single-query
    ivf_topk call with the same centroids/k/n_probe — the batching
    changes job count, not answers."""
    from pyspark.sql import functions as F

    corpus = _vecs(spark, range(8, 64))
    queries = (_vecs(spark, range(0, 8))
               .select(F.col("vec_id").alias("query_id"), "embedding"))
    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        ivf_topk_join,
    )

    joined = ivf_topk_join(queries, corpus, centroids, k=4, n_probe=2)
    rows = joined.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.cos_sim))
    assert set(by_q) == set(range(0, 8))  # every query answered
    for qid, got in by_q.items():
        qvec = [1.0 if d == qid % DIM else 0.1 * ((qid * 7 + d) % 5)
                for d in range(DIM)]
        want = [(i + 1, r.vec_id, r.cos_sim) for i, r in enumerate(
            ivf_topk(corpus, qvec, centroids, k=4, n_probe=2).collect())]
        assert sorted(got) == want, qid


def test_ivf_search_batch_matches_single_searches(spark, tmp_path,
                                                  centroids):
    """The stored-index batched search equals per-query ivf_search calls,
    and its scan is pruned to the UNION of the queries' probed cells."""
    from pyspark.sql import functions as F

    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        ivf_search_batch,
    )

    idir = str(tmp_path / "ivf")
    ivf_index_batch(_vecs(spark, range(8, 40)), 0, idir, centroids)
    ivf_index_batch(_vecs(spark, range(40, 64)), 1, idir, centroids)
    queries = (_vecs(spark, range(0, 6))
               .select(F.col("vec_id").alias("query_id"), "embedding"))

    batched = ivf_search_batch(spark, idir, queries, centroids, k=3,
                               n_probe=2)
    rows = batched.collect()
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append((r.rank, r.vec_id, r.cos_sim))
    for qid in range(0, 6):
        qvec = [1.0 if d == qid % DIM else 0.1 * ((qid * 7 + d) % 5)
                for d in range(DIM)]
        want = [(i + 1, r.vec_id, r.cos_sim) for i, r in enumerate(
            ivf_search(spark, idir, qvec, centroids, k=3,
                       n_probe=2).collect())]
        assert sorted(by_q[qid]) == want, qid

    plan = batched._jdf.queryExecution().executedPlan().toString()
    pf = plan[plan.find("PartitionFilters"):].split("]")[0]
    assert "ivf_cell" in pf and " IN " in pf, plan


def test_ivf_residual_pq_index_search_and_pinning(spark, tmp_path,
                                                  centroids):
    """IVFADC: the residual index stores codes of x − centroid(cell)
    (cell membership still identical to the float index), stored-index
    ADC search equals pq_adc_topk_residual over the probed cells,
    batched == single row for row, replays rewrite byte-identically,
    and the sidecar pins the residual mode — raw-PQ reads of residual
    codes and in-place retrains refuse loudly."""
    import math as _math

    from harvesting_extract_to_ttl_service_spark.operators.similarity import (
        ivf_assign,
        ivf_residuals,
        pq_adc_topk_residual,
        pq_encode_residual,
        train_pq_codebooks,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        ivf_search_batch,
        retrain_ivf_index,
    )

    m, ksub = 4, 8
    books = train_pq_codebooks(
        ivf_residuals(_vecs(spark, range(64)), centroids),
        m, ksub, DIM, vec_col="residual", max_iter=3)
    idir = str(tmp_path / "ivfadc")
    ivf_index_batch(_vecs(spark, range(0, 32)), 0, idir, centroids,
                    pq_codebooks=books, pq_residual=True)
    ivf_index_batch(_vecs(spark, range(32, 64)), 1, idir, centroids,
                    pq_codebooks=books, pq_residual=True)

    idx = spark.read.option("basePath", idir).parquet(idir)
    assert set(idx.columns) == {"id", "codes", "pnorm", "ivf_cell",
                                "batch"}
    want_cells = {r.vec_id: r.ivf_cell for r in ivf_assign(
        _vecs(spark, range(64)), centroids).collect()}
    assert {r.id: r.ivf_cell for r in idx.collect()} == want_cells

    # stored-index ADC search == the batch operator over probed cells
    query = [1.0] + [0.05] * (DIM - 1)

    def _cosq(a, b):
        num = sum(float(x) * float(y) for x, y in zip(a, b))
        return num / (_math.sqrt(sum(x * x for x in a))
                      * _math.sqrt(sum(y * y for y in b)))

    got = [tuple(r) for r in ivf_search(
        spark, idir, query, centroids, k=5, n_probe=2,
        pq_codebooks=books, pq_residual=True).collect()]
    top2 = sorted(range(len(centroids)),
                  key=lambda i: (-_cosq(query, centroids[i]), i))[:2]
    cand_ids = [i for i, c in want_cells.items() if c in top2]
    twin = pq_encode_residual(
        ivf_assign(_vecs(spark, cand_ids), centroids), books, centroids)
    want = [tuple(r) for r in pq_adc_topk_residual(
        twin, query, books, centroids, k=5, id_col="vec_id").collect()]
    assert got == want

    # batched == single, row for row
    queries = _vecs(spark, range(0, 12, 3)) \
        .withColumnRenamed("vec_id", "query_id")
    batched = {(r.query_id, r.rank): (r.vec_id, r.cos_sim)
               for r in ivf_search_batch(
                   spark, idir, queries, centroids, k=4, n_probe=2,
                   pq_codebooks=books, pq_residual=True).collect()}
    for qr in queries.collect():
        single = ivf_search(spark, idir, list(qr.embedding), centroids,
                            k=4, n_probe=2, pq_codebooks=books,
                            pq_residual=True).collect()
        for rank, r in enumerate(single, start=1):
            assert batched[(qr.query_id, rank)] \
                == (r.vec_id, r.cos_sim), (qr.query_id, rank)

    # replay: batch 1 rewritten, search unchanged
    ivf_index_batch(_vecs(spark, range(32, 64)), 1, idir, centroids,
                    pq_codebooks=books, pq_residual=True)
    assert [tuple(r) for r in ivf_search(
        spark, idir, query, centroids, k=5, n_probe=2,
        pq_codebooks=books, pq_residual=True).collect()] == got

    # mode pinning: raw-PQ / float reads of residual codes refuse, as
    # do residual searches of a raw index
    with pytest.raises(ValueError, match="built with"):
        ivf_search(spark, idir, query, centroids, k=5,
                   pq_codebooks=books)
    with pytest.raises(ValueError, match="built with"):
        ivf_search(spark, idir, query, centroids, k=5)
    with pytest.raises(ValueError, match="requires"):
        ivf_search(spark, idir, query, centroids, k=5,
                   pq_residual=True)
    rawdir = str(tmp_path / "rawpq")
    ivf_index_batch(_vecs(spark, range(0, 32)), 0, rawdir, centroids,
                    pq_codebooks=books)
    with pytest.raises(ValueError, match="built with"):
        ivf_search(spark, rawdir, query, centroids, k=5,
                   pq_codebooks=books, pq_residual=True)

    # in-place retrain refuses: residual codes die with their centroids
    with pytest.raises(ValueError, match="rebuild the index"):
        retrain_ivf_index(spark, idir, pq_codebooks=books)

    # encode guards: residual encode demands the cell column; index
    # ingest demands residual-trained codebooks be passed
    with pytest.raises(ValueError, match="ivf_cell"):
        pq_encode_residual(_vecs(spark, range(4)), books, centroids)
    with pytest.raises(ValueError, match="requires"):
        ivf_index_batch(_vecs(spark, range(4)), 2, idir, centroids,
                        pq_residual=True)


def test_ivf_drift_monitor(spark, tmp_path, centroids):
    """The WHEN-to-retrain signal: a stationary stream reports ratios
    near 1.0 and does not trip; a drifted batch (vectors far from every
    training centroid) trips the report; digest/baseline mismatches
    refuse. The quantized index measures the dequantized codes."""
    from pyspark.sql import functions as F

    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        ivf_drift_report,
        record_ivf_dispersion,
        retrain_ivf_index,
    )

    idir = str(tmp_path / "drift")
    train = _vecs(spark, range(0, 32))
    ivf_index_batch(train, 0, idir, centroids)
    base = record_ivf_dispersion(spark, idir, centroids, train)
    assert base["n"] == 32 and base["mean_dist"] > 0

    # stationary: the same generator's later ids — same distribution
    ivf_index_batch(_vecs(spark, range(32, 64)), 1, idir, centroids)
    rep = ivf_drift_report(spark, idir, centroids)
    assert not rep["drifted"], rep
    assert 0.5 < rep["mean_ratio"] < 1.5

    # drifted: vectors pointing AWAY from every training direction
    drifted_rows = [(100 + i, [-3.0 if d == i % DIM else -0.4 - 0.05 * d
                               for d in range(DIM)]) for i in range(32)]
    ivf_index_batch(spark.createDataFrame(drifted_rows, V_SCHEMA), 2,
                    idir, centroids)
    rep2 = ivf_drift_report(spark, idir, centroids)
    assert rep2["drifted"], rep2
    assert rep2["mean_ratio"] > rep["mean_ratio"]

    # wrong centroids refuse, for both record and report
    other = [[1.0] * DIM for _ in range(2)]
    with pytest.raises(ValueError, match="digest"):
        record_ivf_dispersion(spark, idir, other, train)
    with pytest.raises(ValueError, match="digest"):
        ivf_drift_report(spark, idir, other)

    # after a retrain the old baseline refuses (stale geometry) until
    # re-recorded against the new centroids
    new_cents = retrain_ivf_index(spark, idir)
    with pytest.raises(ValueError, match="re-record"):
        ivf_drift_report(spark, idir, new_cents)
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _ivf_frames,
    )

    record_ivf_dispersion(
        spark, idir, new_cents,
        _ivf_frames(spark, idir)
        .select(F.col("v").alias("embedding")))
    rep3 = ivf_drift_report(spark, idir, new_cents)
    assert not rep3["drifted"], rep3   # baseline == current by design

    # missing baseline refuses
    idir2 = str(tmp_path / "nodrift")
    ivf_index_batch(train, 0, idir2, centroids)
    with pytest.raises(ValueError, match="_ivf_drift"):
        ivf_drift_report(spark, idir2, centroids)

    # int8 index: report measures the dequantized codes
    idir3 = str(tmp_path / "qdrift")
    ivf_index_batch(train, 0, idir3, centroids, quantize=True)
    record_ivf_dispersion(spark, idir3, centroids, train)
    repq = ivf_drift_report(spark, idir3, centroids)
    assert not repq["drifted"] and 0.5 < repq["mean_ratio"] < 1.5


# --- round-14: generational protocol (crash windows, lease, tombstones) -----


def test_ivf_search_during_fold_and_crash_resume(spark, tmp_path,
                                                 centroids, monkeypatch):
    """The BM25 crash-window suite ported to IVF: searches DURING a
    paused fold read the intact pre-flip view; fresh ingest flows once
    the snapshot publishes while in-fold replays refuse; resume
    finishes the flip without refolding; post-flip/pre-cleanup crashes
    leave only pointer-excluded trees; and the replay fence survives."""
    import harvesting_extract_to_ttl_service_spark.streaming.ann_stream as ax  # noqa: E501
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _ivf_frames,
        _read_json_sidecar,
    )

    idir = str(tmp_path / "ivfcrash")
    ivf_index_batch(_vecs(spark, range(0, 24)), 0, idir, centroids)
    ivf_index_batch(_vecs(spark, range(24, 48)), 1, idir, centroids)
    query = [0.2] * DIM

    def boom(*a, **kw):
        raise RuntimeError("crash before flip")

    # window: fold written + manifest down, flip never ran
    monkeypatch.setattr(ax, "_ivf_flip", boom)
    with pytest.raises(RuntimeError, match="crash before flip"):
        compact_ivf_index(spark, idir, lease_seconds=0.0)
    monkeypatch.undo()
    marker = _read_json_sidecar(spark, f"{idir}/_ivf_compacting.json")
    assert marker["folding_through"] == 1
    # search during the window: pre-flip view, correct results
    assert [tuple(r) for r in ivf_search(
        spark, idir, query, centroids, k=4).collect()] == \
        [tuple(r) for r in ivf_topk(
            _vecs(spark, range(48)), query, centroids, k=4).collect()]
    # in-fold replay refuses; fresh ingest flows and is searchable
    with pytest.raises(ValueError, match="compacting through"):
        ivf_index_batch(_vecs(spark, range(0, 24)), 1, idir, centroids)
    ivf_index_batch(_vecs(spark, range(48, 56)), 7, idir, centroids)
    assert _ivf_frames(spark, idir).count() == 56
    # resume = flip + cleanup only; the mid-fold batch survives
    assert compact_ivf_index(spark, idir) == 0
    assert _read_json_sidecar(spark, f"{idir}/_ivf_generation.json") \
        == {"generation": 0, "segments": [0],
            "max_folded_batch": 1, "applied_dels": -1}
    assert _ivf_frames(spark, idir).count() == 56
    with pytest.raises(ValueError, match="already folded"):
        ivf_index_batch(_vecs(spark, range(0, 24)), 1, idir, centroids)

    # window: crash after flip, before cleanup — stale trees are
    # pointer-excluded, resume sweeps them
    real_cleanup = ax._ivf_cleanup
    calls = {"n": 0}

    def no_cleanup(*a, **kw):
        calls["n"] += 1
        if calls["n"] >= 2:
            raise RuntimeError("crash before cleanup")
        return real_cleanup(*a, **kw)

    monkeypatch.setattr(ax, "_ivf_cleanup", no_cleanup)
    with pytest.raises(RuntimeError, match="crash before cleanup"):
        compact_ivf_index(spark, idir, lease_seconds=0.0)
    monkeypatch.undo()
    assert os.path.exists(f"{idir}/batch=7")
    assert _ivf_frames(spark, idir).count() == 56  # not doubled
    assert compact_ivf_index(spark, idir) == 0
    assert not os.path.exists(f"{idir}/batch=7")
    assert _ivf_frames(spark, idir).count() == 56

    # a second compactor refuses while a lease is live
    import time as _time

    from harvesting_extract_to_ttl_service_spark.streaming.generations import (  # noqa: E501
        _write_json_sidecar,
    )

    _write_json_sidecar(spark, f"{idir}/_ivf_compacting.json",
                        {"compacting": True, "owner": "other",
                         "deadline": _time.time() + 3600})
    with pytest.raises(ValueError, match="held by owner other"):
        compact_ivf_index(spark, idir)
    _write_json_sidecar(spark, f"{idir}/_ivf_compacting.json",
                        {"compacting": True, "owner": "other",
                         "deadline": _time.time() - 1})
    assert compact_ivf_index(spark, idir) == 0  # takeover, nothing to do


def test_ivf_delete_vecs_matches_rebuild_and_survives_folds(
        spark, tmp_path, centroids):
    """Tombstoned vectors drop out of single and batched search exactly
    like a rebuild without them; a minor fold keeps them logical, a
    major fold applies them physically and retires the del dirs; a
    replayed batch does not resurrect a deleted vector; double deletes
    and unknown ids are no-ops."""
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _ivf_frames,
        _read_json_sidecar,
        ivf_delete_vecs,
        ivf_search_batch,
    )

    idir = str(tmp_path / "ivfdel")
    ivf_index_batch(_vecs(spark, range(0, 24)), 0, idir, centroids)
    ivf_index_batch(_vecs(spark, range(24, 48)), 1, idir, centroids)
    # establish a generation first so the later fold is MINOR
    assert compact_ivf_index(spark, idir) == 2
    query = [0.2] * DIM
    top = [r.vec_id for r in ivf_search(
        spark, idir, query, centroids, k=4).collect()]
    victims = top[:2]
    assert ivf_delete_vecs(spark, idir, victims) == 2
    kept_ids = [i for i in range(48) if i not in victims]
    want = [tuple(r) for r in ivf_topk(
        _vecs(spark, kept_ids), query, centroids, k=4).collect()]
    assert [tuple(r) for r in ivf_search(
        spark, idir, query, centroids, k=4).collect()] == want
    # batched search honors the tombstones too
    qdf = spark.createDataFrame([(0, query)],
                                "query_id long, embedding array<double>")
    got_b = {(r.query_id, r.vec_id) for r in ivf_search_batch(
        spark, idir, qdf, centroids, k=4).collect()}
    assert got_b == {(0, t[0]) for t in want}
    # double delete + unknown id: no-ops
    assert ivf_delete_vecs(spark, idir, victims + [9999]) == 0

    # minor fold: tombstone stays pending, results unchanged
    ivf_index_batch(_vecs(spark, range(48, 56)), 5, idir, centroids)
    assert compact_ivf_index(spark, idir) == 1
    assert compact_ivf_index(spark, idir) == 0
    assert os.path.exists(f"{idir}/tombstones/del=0")
    want2 = [tuple(r) for r in ivf_topk(
        _vecs(spark, [i for i in range(56) if i not in victims]),
        query, centroids, k=4).collect()]
    assert [tuple(r) for r in ivf_search(
        spark, idir, query, centroids, k=4).collect()] == want2

    # major fold applies: del dir retired, rows physically gone
    assert compact_ivf_index(spark, idir, full=True) == 0
    assert not os.path.exists(f"{idir}/tombstones/del=0")
    ptr = _read_json_sidecar(spark, f"{idir}/_ivf_generation.json")
    assert ptr["applied_dels"] == 0
    idx = _ivf_frames(spark, idir)
    assert idx.filter(idx.id.isin(victims)).count() == 0
    assert [tuple(r) for r in ivf_search(
        spark, idir, query, centroids, k=4).collect()] == want2

    # replay-resurrection: delete from an unfolded batch, replay it
    ivf_index_batch(_vecs(spark, range(56, 60)), 9, idir, centroids)
    assert ivf_delete_vecs(spark, idir, [57]) == 1
    ivf_index_batch(_vecs(spark, range(56, 60)), 9, idir, centroids)
    assert _ivf_frames(spark, idir).filter("id = 57").count() == 0


def test_ivf_stream_with_auto_compaction(spark, tmp_path, centroids):
    """Self-maintaining IVF ingest: with compact_every=2 and one file
    per micro-batch, folds fire as committed batches accumulate and
    search equals the batch operator over everything at the end — no
    manual maintenance call."""
    import json as _json

    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _ivf_pointer,
        _ivf_visible_batches,
    )

    sdir = str(tmp_path / "src")
    idir = str(tmp_path / "autoivf")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(sdir)
    all_rows = [(i, [1.0 if d == i % DIM else 0.1 * ((i * 7 + d) % 5)
                     for d in range(DIM)]) for i in range(40)]
    for b in range(4):
        with open(f"{sdir}/b{b}.json", "w") as f:
            for i, v in all_rows[b * 10:(b + 1) * 10]:
                f.write(_json.dumps({"vec_id": i, "embedding": v})
                        + "\n")
    st = (spark.readStream.schema(V_SCHEMA)
          .option("maxFilesPerTrigger", 1).json(sdir))
    q = run_ivf_index_stream(st, idir, ckpt, centroids,
                             compact_every=2)
    q.awaitTermination(180)
    gen, _segs, fence, _ad = _ivf_pointer(spark, idir)
    assert gen >= 0                      # at least one fold fired
    assert len(_ivf_visible_batches(spark, idir, gen, fence)) <= 2
    query = [0.2] * DIM
    assert [tuple(r) for r in ivf_search(
        spark, idir, query, centroids, k=5, n_probe=2).collect()] == \
        [tuple(r) for r in ivf_topk(
            _vecs(spark, range(40)), query, centroids, k=5,
            n_probe=2).collect()]


# --- round-15: tiered merges, df-native deletion, drift-triggered retrain ----


def test_ivf_tiered_fold_keeps_generation(spark, tmp_path, centroids):
    """Past max_segments the IVF fold turns TIERED: the smallest half
    of the segments merge with the batches into one new segment of the
    SAME generation (no automatic O(index) merge), parity holds, and
    full=True still merges everything into gen+1."""
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _read_json_sidecar,
    )

    idir = str(tmp_path / "ivftiered")
    for i in range(3):
        ivf_index_batch(_vecs(spark, range(i * 16, (i + 1) * 16)), i,
                        idir, centroids)
        assert compact_ivf_index(spark, idir, max_segments=2) == 1
    ptr = _read_json_sidecar(spark, f"{idir}/_ivf_generation.json")
    assert ptr["generation"] == 0
    assert len(ptr["segments"]) == 2 and 2 in ptr["segments"]
    survivor = [s for s in ptr["segments"] if s != 2][0]
    merged = [s for s in (0, 1) if s != survivor][0]
    assert os.path.exists(f"{idir}/gen=0/seg={survivor}")
    assert not os.path.exists(f"{idir}/gen=0/seg={merged}")
    query = [0.2] * DIM
    want = [tuple(r) for r in ivf_topk(
        _vecs(spark, range(48)), query, centroids, k=5,
        n_probe=2).collect()]
    assert [tuple(r) for r in ivf_search(
        spark, idir, query, centroids, k=5,
        n_probe=2).collect()] == want
    assert compact_ivf_index(spark, idir, full=True) == 0
    ptr2 = _read_json_sidecar(spark, f"{idir}/_ivf_generation.json")
    assert ptr2["generation"] == 1 and ptr2["segments"] == [0]
    assert not os.path.exists(f"{idir}/gen=0")
    assert [tuple(r) for r in ivf_search(
        spark, idir, query, centroids, k=5,
        n_probe=2).collect()] == want


def test_ivf_delete_vecs_df_matches_list(spark, tmp_path, centroids):
    """The DataFrame-native vector delete equals the list form (same
    tombstones, same search-after-delete results), double df-deletes
    are no-ops, and a live maintenance lease excludes a second
    deleter (the del-slot race)."""
    import time

    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        ivf_delete_vecs_df,
    )
    from harvesting_extract_to_ttl_service_spark.streaming.generations import (
        _write_json_sidecar,
    )

    idir = str(tmp_path / "ivfdfdel")
    ivf_index_batch(_vecs(spark, range(0, 24)), 0, idir, centroids)
    ivf_index_batch(_vecs(spark, range(24, 48)), 1, idir, centroids)
    ids_df = spark.createDataFrame([(3,), (7,), (3,), (9999,)],
                                   "id long")
    assert ivf_delete_vecs_df(spark, idir, ids_df) == 2
    query = [0.2] * DIM
    kept = [i for i in range(48) if i not in (3, 7)]
    want = [tuple(r) for r in ivf_topk(
        _vecs(spark, kept), query, centroids, k=4).collect()]
    assert [tuple(r) for r in ivf_search(
        spark, idir, query, centroids, k=4).collect()] == want
    assert ivf_delete_vecs_df(spark, idir, ids_df) == 0

    marker = f"{idir}/_ivf_compacting.json"
    _write_json_sidecar(spark, marker,
                        {"deleting": True, "owner": "other",
                         "deadline": time.time() + 60})
    with pytest.raises(ValueError, match="held by owner other"):
        ivf_delete_vecs_df(spark, idir, ids_df)
    with pytest.raises(ValueError, match="deleting"):
        ivf_index_batch(_vecs(spark, range(48, 50)), 2, idir, centroids)
    os.unlink(marker)


def test_ivf_stream_drift_triggered_retrain(spark, tmp_path, centroids):
    """The self-maintaining drift loop: a stationary stream NEVER
    retrains; an injected distribution shift triggers EXACTLY ONE
    retrain (bounded to already-committed batches, current batch
    rewritten under the new centroids, baseline re-recorded); searches
    work throughout; a further batch of the now-known distribution
    does not retrain again."""
    import json as _json

    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        _ivf_frames,
        _read_json_sidecar,
        record_ivf_dispersion,
    )

    sdir = str(tmp_path / "src")
    idir = str(tmp_path / "driftidx")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(sdir)

    def write_file(name, rows):
        with open(f"{sdir}/{name}", "w") as f:
            for i, v in rows:
                f.write(_json.dumps({"vec_id": i, "embedding": v})
                        + "\n")

    def stat_rows(ids):
        return [(i, [1.0 if d == i % DIM else 0.1 * ((i * 7 + d) % 5)
                     for d in range(DIM)]) for i in ids]

    def drift_rows(ids):
        return [(i, [-3.0 if d == i % DIM else -0.4 - 0.05 * d
                     for d in range(DIM)]) for i in ids]

    def run(cents, **kw):
        st = (spark.readStream.schema(V_SCHEMA)
              .option("maxFilesPerTrigger", 1).json(sdir))
        q = run_ivf_index_stream(st, idir, ckpt, cents, **kw)
        q.awaitTermination(180)

    # phase 1: two stationary batches, no drift policy yet
    write_file("b0.json", stat_rows(range(0, 16)))
    write_file("b1.json", stat_rows(range(16, 32)))
    run(centroids)
    record_ivf_dispersion(spark, idir, centroids,
                          _vecs(spark, range(32)))

    retrains = []

    def on_retrain(batch_id, cents):
        retrains.append((batch_id, cents))

    # phase 2: one more STATIONARY batch under the drift policy — no
    # retrain fires
    write_file("b2.json", stat_rows(range(32, 48)))
    run(centroids, retrain_on_drift=1.5, on_retrain=on_retrain)
    assert retrains == []

    # phase 3: a DRIFTED batch — exactly one retrain
    write_file("b3.json", drift_rows(range(100, 132)))
    run(centroids, retrain_on_drift=1.5, on_retrain=on_retrain)
    assert len(retrains) == 1
    batch_id, new_c = retrains[0]
    # sidecar re-pinned: old centroids refuse, new ones serve ALL rows
    with pytest.raises(ValueError, match="silently missed"):
        ivf_search(spark, idir, [0.2] * DIM, centroids, k=4).collect()
    all_rows = (stat_rows(range(48))
                + drift_rows(range(100, 132)))
    assert _ivf_frames(spark, idir).count() == len(all_rows)
    query = [0.2] * DIM
    want = [tuple(r) for r in ivf_topk(
        spark.createDataFrame(all_rows, V_SCHEMA), query, new_c, k=5,
        n_probe=len(new_c)).collect()]
    assert [tuple(r) for r in ivf_search(
        spark, idir, query, new_c, k=5,
        n_probe=len(new_c)).collect()] == want
    # baseline was re-recorded against the new geometry
    drift = _read_json_sidecar(spark, f"{idir}/_ivf_drift.json")
    assert drift["centroids_md5"] == _read_json_sidecar(
        spark, f"{idir}/_ivf_params.json")["centroids_md5"]

    # phase 4: another batch of the SAME (formerly drifted)
    # distribution — the re-recorded baseline absorbs it, no retrain
    write_file("b4.json", drift_rows(range(200, 216)))
    run(new_c, retrain_on_drift=1.5, on_retrain=on_retrain)
    assert len(retrains) == 1
    assert _ivf_frames(spark, idir).count() == len(all_rows) + 16

    # refusal: drift policy on a quantized stream is refused up front
    with pytest.raises(ValueError, match="FLOAT"):
        run_ivf_index_stream(
            spark.readStream.schema(V_SCHEMA).json(sdir), idir, ckpt,
            new_c, quantize=True, retrain_on_drift=1.5)


def test_ivf_index_stats_lifecycle(spark, tmp_path, centroids):
    """The IVF monitoring snapshot (bm25_index_stats' twin) tracks the
    pointer, batch/tombstone pressure (with the del byte total), and
    the index identity through ingest → fold → delete."""
    from harvesting_extract_to_ttl_service_spark.streaming.ann_stream import (
        ivf_delete_vecs,
        ivf_index_stats,
    )

    idir = str(tmp_path / "ivfstats")
    with pytest.raises(ValueError, match="no index"):
        ivf_index_stats(spark, idir)
    ivf_index_batch(_vecs(spark, range(0, 24)), 0, idir, centroids)
    ivf_index_batch(_vecs(spark, range(24, 48)), 1, idir, centroids)
    s = ivf_index_stats(spark, idir)
    assert (s["generation"], s["max_folded_batch"]) == (-1, -1)
    assert s["unfolded_batches"] == [0, 1]
    assert s["pending_del_batches"] == [] and s["pending_del_bytes"] == 0
    assert s["k"] == 4 and s["dim"] == DIM and not s["quantized"]
    assert not s["compacting"] and not s["deleting"]

    assert compact_ivf_index(spark, idir) == 2
    ivf_delete_vecs(spark, idir, [3, 5])
    s2 = ivf_index_stats(spark, idir)
    assert (s2["generation"], s2["segments"]) == (0, [0])
    assert s2["unfolded_batches"] == []
    assert s2["pending_del_batches"] == [0]
    assert s2["pending_del_bytes"] > 0
    assert s2["applied_dels"] == -1

    assert compact_ivf_index(spark, idir, full=True) == 0
    s3 = ivf_index_stats(spark, idir)
    assert s3["pending_del_batches"] == [] and s3["applied_dels"] == 0
    assert s3["pending_del_bytes"] == 0
