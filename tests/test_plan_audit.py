"""Whole-catalog physical-plan audit: every queries() entry is planned
and checked for the anti-patterns that kill 100 TB runs —
CartesianProduct (unkeyed pair blow-up), BroadcastNestedLoopJoin
(per-row probe of a non-hashable join), and BatchEvalPython
(row-at-a-time Python UDF; only Arrow-batched Python crossings are
allowed). A new catalog entry that accidentally plans one of these fails
here before it ever reaches the driver's bench."""

import os

import pytest

import __spark_entry__ as entry_mod

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")

QUERIES = entry_mod.queries()

# Entries where a BroadcastNestedLoopJoin is the INTENDED shape, each
# with the reason it is scale-safe:
#   ann_suite     — the self_topk member is the documented exact all-pairs
#                   small-corpus baseline (the suite's other members ARE
#                   the scale path), and the broadcast side is bounded.
#   corpus_suite  — the mixture denominator is a one-row broadcast
#                   (a scalar) cross-joined onto a strata-sized frame,
#                   and the mclf member cross-joins the k-row broadcast
#                   label/bias table onto per-doc totals (k = number of
#                   model classes, a constant).
BNLJ_OK = {"ann_suite", "corpus_suite"}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_has_no_antipatterns(spark, name):
    plan = (QUERIES[name](spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan, name
    if name not in BNLJ_OK:
        assert "BroadcastNestedLoopJoin" not in plan, name
    # Python may cross the boundary only Arrow-batched (ArrowEvalPython,
    # MapInPandas, FlatMapGroupsInPandas*) — never row-at-a-time
    assert "BatchEvalPython" not in plan, name


def test_catalog_contract():
    """The driver verifies at most 50 entries in registration order:
    exactly 50 registered, every oracle names a query, and only the two
    by-design rows-only entries lack oracles."""
    oracles = entry_mod.oracle_sql()
    assert len(QUERIES) == 50
    assert set(oracles) <= set(QUERIES)
    assert set(QUERIES) - set(oracles) == {
        "approx_distinct_customers", "streaming_task_progress"}
