"""connected_components production shaping: blocked convergence checks
(fewer driver-side count jobs), reliable checkpointing, and explicit
non-convergence signalling (max_iter exhaustion must not ship bad
clusters silently)."""

import pytest
from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.operators.dedup import (
    connected_components,
)


def _chain(spark, n):
    """Path graph 0-1-2-…-(n-1): diameter n-1, worst case for hash-to-min
    (the min label crawls one hop per round)."""
    ids = spark.createDataFrame([(i,) for i in range(n)], "id long")
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "id_a long, id_b long")
    return pairs, ids


def _components(df):
    return {r.id: r.component for r in df.collect()}


def test_chain_converges_to_min_label(spark):
    pairs, ids = _chain(spark, 8)
    out = connected_components(pairs, ids, max_iter=20, check_every=3)
    assert _components(out) == {i: 0 for i in range(8)}


def test_two_components_and_singleton(spark):
    ids = spark.createDataFrame([(i,) for i in range(7)], "id long")
    pairs = spark.createDataFrame(
        [(0, 1), (1, 2), (4, 5), (5, 6)], "id_a long, id_b long")
    out = connected_components(pairs, ids, max_iter=10)
    assert _components(out) == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 4, 6: 4}


def test_convergence_exactly_at_max_iter_does_not_raise(spark):
    # diameter 3 chain needs exactly 3 rounds; with check_every=3 the
    # block-level check still sees changed>0, so only the one-round probe
    # can prove convergence — exercises the disambiguation path.
    pairs, ids = _chain(spark, 4)
    out = connected_components(pairs, ids, max_iter=3, check_every=3)
    assert _components(out) == {i: 0 for i in range(4)}


def test_nonconvergence_raises_by_default(spark):
    pairs, ids = _chain(spark, 10)  # diameter 9 > max_iter
    with pytest.raises(RuntimeError, match="max_iter=3"):
        connected_components(pairs, ids, max_iter=3)


def test_nonconvergence_warn_returns_partial_labels(spark):
    pairs, ids = _chain(spark, 10)
    with pytest.warns(RuntimeWarning, match="transitive closure"):
        out = connected_components(pairs, ids, max_iter=3,
                                   on_nonconvergence="warn")
    comp = _components(out)
    # partial propagation: the far end of the chain hasn't seen label 0
    assert comp[1] == 0 and comp[9] != 0


def test_invalid_args_rejected(spark):
    pairs, ids = _chain(spark, 3)
    with pytest.raises(ValueError, match="on_nonconvergence"):
        connected_components(pairs, ids, on_nonconvergence="explode")
    with pytest.raises(ValueError, match="check_every"):
        connected_components(pairs, ids, check_every=0)


def test_reliable_checkpoint(spark, tmp_path):
    spark.sparkContext.setCheckpointDir(str(tmp_path / "ckpt"))
    pairs, ids = _chain(spark, 6)
    out = connected_components(pairs, ids, max_iter=10,
                               reliable_checkpoint=True)
    assert _components(out) == {i: 0 for i in range(6)}


def _jobs_for(spark, group, fn):
    sc = spark.sparkContext
    sc.setJobGroup(group, group)
    try:
        fn()
    finally:
        sc.setJobGroup("", "")
    return len(sc.statusTracker().getJobIdsForGroup(group))


def test_blocked_checks_schedule_fewer_driver_jobs(spark):
    # Fix the propagation-round count (non-converging chain, ignore mode)
    # so the two variants differ ONLY in convergence-check frequency:
    # K=3 must schedule strictly fewer driver jobs than K=1.
    pairs, ids = _chain(spark, 12)

    def run(k):
        connected_components(pairs, ids, max_iter=6, check_every=k,
                             on_nonconvergence="ignore")

    jobs_k1 = _jobs_for(spark, "cc_k1", lambda: run(1))
    jobs_k3 = _jobs_for(spark, "cc_k3", lambda: run(3))
    assert jobs_k3 < jobs_k1
