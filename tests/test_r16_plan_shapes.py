"""Round-16 optimization pins: plan shapes established by the r16 pass,
asserted so a refactor can't silently undo them.

1. Narrow materialization cut: the MinHash/SimHash candidate pipelines
   checkpoint the one-row-per-doc signature table (plan shows a Scan
   ExistingRDD), not the banded/blocked explosion of it — the banded
   form re-derives per join side as a cheap projection.
2. Filter-before-distinct: the pair verifiers apply the exact-verify
   predicate (hamming radius / jaccard threshold) BELOW the dedup
   aggregate, so the distinct's exchange carries only true-pair mass
   (328k collision rows -> 992 survivors at sf0.1 radius 6), never the
   quadratic candidate volume.
3. embedding_cosine_topk runs as ONE job: the query vector attaches via
   a one-row broadcast cross join (BroadcastNestedLoopJoin) instead of a
   driver head() round-trip, and the top-k stays a TakeOrderedAndProject
   (no global sort).
4. sessionize_events is a single plain aggregation (max, not
   count_distinct): no distinct-expand pass, and the aggregate reuses
   the window's user_id partitioning.
"""

import os

import pytest

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _optimized(df) -> str:
    return df._jdf.queryExecution().optimizedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    from harvesting_extract_to_ttl_service_spark.plans.tables import load

    return load(spark, SF_DIR, "documents")


def test_minhash_cut_is_signature_table(docs):
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        minhash_similarity,
    )

    plan = _plan(minhash_similarity(docs, threshold=0.3))
    # the checkpoint cut shows up as an RDD scan; the banded posexplode
    # is re-derived ABOVE it (per side), so the stored rows are the
    # narrow signature table, not bands x signature duplication
    assert "Scan ExistingRDD" in plan, plan
    assert "posexplode" in plan.lower() or "Generate" in plan, plan
    # still exactly one user repartition (the one-sided pin)
    assert plan.count("REPARTITION_BY_NUM") == 1, plan


def test_simhash_filter_below_distinct(docs):
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        simhash_candidates,
    )

    df = simhash_candidates(docs, bits=60, max_hamming=6, blocks=7)
    opt = _optimized(df)
    # parent-first rendering: the dedup Aggregate must come BEFORE (i.e.
    # sit above) the hamming radius Filter — the exact-verify predicate
    # runs under the distinct, shrinking its exchange to true pairs
    agg_at = opt.index("Aggregate")
    filt_at = opt.index("Filter")
    assert agg_at < filt_at, opt
    assert "Scan ExistingRDD" in _plan(df), "sh-table cut missing"


def test_minhash_filter_below_distinct(docs):
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        minhash_similarity,
    )

    opt = _optimized(minhash_similarity(docs, threshold=0.3))
    # the threshold predicate lives under the pair-dedup Aggregate; the
    # signature re-attach joins sit above it
    agg_at = opt.index("Aggregate")
    filt_at = opt.index("Filter")
    assert agg_at < filt_at, opt


def test_cosine_topk_single_job_shape(spark):
    from harvesting_extract_to_ttl_service_spark.plans.catalog_llm import (
        embedding_cosine_topk,
    )

    plan = _plan(embedding_cosine_topk(spark, SF_DIR))
    # one-row scalar attach, not a collected literal; bounded by design
    assert plan.count("BroadcastNestedLoopJoin") == 1, plan
    # top-k must stay a TakeOrdered (per-partition k), never a global sort
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange rangepartitioning" not in plan, plan


def test_sessionize_single_aggregate(spark):
    from harvesting_extract_to_ttl_service_spark.plans.catalog_core import (
        sessionize_events,
    )

    plan = _plan(sessionize_events(spark, SF_DIR))
    # max() is a plain aggregate: partial+final HashAggregate pair, no
    # distinct expansion (a count_distinct plan carries a third
    # aggregate over (user_id, session_id))
    assert plan.count("HashAggregate") <= 2, plan
    # the window already hash-partitioned by user_id; the aggregate must
    # not add its own exchange (one for the window, none after)
    assert plan.count("Exchange") == 1, plan
