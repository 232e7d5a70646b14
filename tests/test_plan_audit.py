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

# Entries where BroadcastNestedLoopJoins are INTENDED, pinned to the
# EXACT member-level count (not a suite-wide pass, which would let a
# new member smuggle in an unintended nested-loop join). Every pinned
# BNLJ is a bounded broadcast:
#   ann_suite (10)   — self_topk: the documented exact all-pairs
#                      small-corpus baseline (the suite's other members
#                      ARE the scale path), broadcast side bounded;
#                      bm25 (1) + bm25f (1) + rrf's inner bm25 (1): the
#                      one-row corpus-stats scalar cross-joined onto
#                      the scored postings; bm25j (2): the same stats
#                      row on the scored side plus on the max_df
#                      pruning filter; phrase (2) + prox (2): the
#                      stats row and the one-row group-df onto the
#                      matched docs.
#   corpus_suite (6) — one-row broadcast scalars cross-joined onto
#                      bounded frames: mix (the mixture denominator),
#                      lm (the corpus token total), lm2 (the bigram
#                      model's continuation-type count), tsample +
#                      tsample_exact (the temperature rate scalar),
#                      buckets (the quantile-thresholds row).
# A count BELOW the pin is also a failure: it means a member's shape
# changed and this table is stale — re-derive it, don't loosen it.
BNLJ_EXPECTED = {"ann_suite": 10, "corpus_suite": 6,
                 # the one-row query-vector cross join (cosine_topk_df):
                 # replaced the driver head() round-trip in round 16
                 "embedding_cosine_topk": 1}


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_plan_has_no_antipatterns(spark, name):
    plan = (QUERIES[name](spark, SF_DIR)
            ._jdf.queryExecution().executedPlan().toString())
    assert "CartesianProduct" not in plan, name
    assert plan.count("BroadcastNestedLoopJoin") \
        == BNLJ_EXPECTED.get(name, 0), name
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
