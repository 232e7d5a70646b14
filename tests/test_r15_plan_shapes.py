"""Round-15 optimization pins: physical-plan shapes that the r15
optimization pass established, asserted so a refactor can't silently
undo them.

1. One-sided self-join pinning (dedup._pin_join_parallelism docstring):
   the banded/blocked candidate self-joins carry EXACTLY ONE
   REPARTITION_BY_NUM exchange — the probe side. The bare side feeds
   the broadcast (small scale) or gets its own ENSURE_REQUIREMENTS
   exchange (large scale) without a wasted user repartition under a
   BroadcastExchange.

2. Codegen barrier in the import pipeline (materialize.codegen_barrier):
   the valid-triples plan contains a CollectMetrics node between triage
   and the valid projection, splitting the >64 KB fused codegen unit
   that otherwise fails Janino compilation and drops the whole stage to
   interpreted eval.
"""

import os

import pytest
from pyspark.sql import functions as F

SF_DIR = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.001")


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


@pytest.fixture(scope="module")
def docs(spark):
    from harvesting_extract_to_ttl_service_spark.plans.tables import load

    return load(spark, SF_DIR, "documents")


def test_minhash_self_join_pins_one_side(docs):
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        minhash_similarity,
    )

    plan = _plan(minhash_similarity(docs, threshold=0.3))
    # exactly one user repartition (the probe-side pin); the bare side
    # must never carry a second REPARTITION under its exchange. (The
    # former BroadcastHashJoin assertion was dropped per the r15 advice:
    # it coupled this pin test to autoBroadcastJoinThreshold defaults
    # and fixture size — the join strategy is the planner's call.)
    assert plan.count("REPARTITION_BY_NUM") == 1, plan


def test_simhash_self_join_pins_one_side(docs):
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        simhash_candidates,
    )

    plan = _plan(simhash_candidates(docs, bits=60, max_hamming=6, blocks=7))
    assert plan.count("REPARTITION_BY_NUM") == 1, plan


def test_pipeline_valid_has_codegen_barrier(spark):
    from harvesting_extract_to_ttl_service_spark.plans.catalog_extract import (
        import_pipeline_e2e,
    )

    plan = _plan(import_pipeline_e2e(spark, SF_DIR))
    assert "CollectMetrics" in plan, (
        "the triage codegen barrier is gone — the fused triage+valid "
        "codegen unit overflows Janino's 64 KB limit and the whole "
        "stage silently runs interpreted (see materialize.codegen_barrier)")


def test_codegen_barrier_is_transparent(spark):
    from harvesting_extract_to_ttl_service_spark.operators.materialize import (
        codegen_barrier,
    )

    df = spark.range(10).select(F.col("id"), (F.col("id") * 2).alias("y"))
    out = codegen_barrier(df, "t").orderBy("id").collect()
    assert [(r.id, r.y) for r in out] == [(i, 2 * i) for i in range(10)]
    # two barriers over the same lineage in one query must not collide
    # (names are uniqued per call)
    u = codegen_barrier(df, "t").unionAll(codegen_barrier(df, "t"))
    assert u.count() == 20
