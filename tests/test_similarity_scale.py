"""ivf_assign centroid-count scaling: the score is dot(v,c)/|c| with the
centroid norm a driver-side constant, so the plan must stay linear in the
centroid count (the naive per-centroid cosine() re-inlines norm(vec) once
per centroid — a quadratic expression-tree blowup)."""

import math
import time

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
