"""Physical-plan quality pins: these assert the plan SHAPE (pushed
filters, broadcast joins, bounded shuffle counts) so a regression that
silently turns a broadcast into a sort-merge join or drops a pushdown
fails loudly, not just slowly."""

import __spark_entry__ as entry_mod

SF = "/root/testdata/sf0.01"


def _plan(spark, name, mode="formatted"):
    df = entry_mod.queries()[name](spark, SF)
    jpe = df._jdf.queryExecution()
    em = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    return jpe.explainString(em)


def test_q6_filters_push_to_parquet(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    assert "PushedFilters: [" in plan
    # shipdate range + discount + quantity all reach the scan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    for col in ("l_shipdate", "l_discount", "l_quantity"):
        assert col in pushed, f"{col} not pushed: {pushed}"


def test_q6_prunes_columns(spark):
    plan = _plan(spark, "q6_forecast_revenue")
    schema = plan.split("ReadSchema: ", 1)[1].splitlines()[0]
    # 4-column projection out of 11 lineitem columns
    assert "l_extendedprice" in schema and "l_orderkey" not in schema


def test_q5_broadcasts_dims_no_sort_merge(spark):
    plan = _plan(spark, "q5_region_revenue")
    assert plan.count("BroadcastHashJoin") >= 3   # supplier/nation/region
    assert "SortMergeJoin" not in plan


def test_star_join_is_single_shuffle(spark):
    plan = _plan(spark, "b3_star_join_customers", mode="simple")
    # pivot-based star join: one hashpartitioning exchange on subject,
    # not one join per predicate
    assert plan.count("Exchange hashpartitioning") <= 2


def test_q2_broadcasts_dims(spark):
    plan = _plan(spark, "q2_min_cost_supplier")
    # part and supplier are explicit broadcasts; the unit⋈best join keys
    # on (partkey, double) and must stay a hash/sort join, never a
    # nested-loop (no usable equi-key would mean a plan bug)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_q4_semi_join_with_pushed_date_window(spark):
    plan = _plan(spark, "q4_order_priority")
    assert "LeftSemi" in plan
    pushed = plan.split("PushedFilters: [", 1)[1].split("]", 1)[0]
    assert "o_orderdate" in pushed, f"date window not pushed: {pushed}"


def test_bucketed_join_has_no_join_exchange(spark):
    plan = _plan(spark, "bucketed_join_order_revenue", mode="simple")
    # co-bucketed scan feeds the merge join directly; the only shuffle
    # left is the 3-row final aggregate
    assert "SortMergeJoin" in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_cosine_neardup_is_bucket_join_not_nested_loop(spark):
    plan = _plan(spark, "embedding_cosine_neardup", mode="simple")
    # sign-LSH blocking: candidates come from an equi-join on the bucket
    # column — an all-pairs BroadcastNestedLoopJoin here is the exact
    # pattern that cannot scale past a bounded demo
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan


def test_triage_has_no_python_udf(spark):
    plan = _plan(spark, "triage_dirty_literals", mode="simple")
    for marker in ("BatchEvalPython", "ArrowEvalPython", "PythonUDF"):
        assert marker not in plan


def test_resolve_page_bodies_broadcasts_metadata(spark):
    """The metadata maps (physical→page, page→url) are control-plane
    sized and must broadcast to the heavy contents side — a sort-merge
    join here would shuffle every html body by key at corpus scale."""
    from pyspark.sql import functions as F

    from harvesting_extract_to_ttl_service_spark.schema import TRIPLE_SCHEMA
    from harvesting_extract_to_ttl_service_spark.sources.files import (
        resolve_page_bodies,
    )

    NIE = "http://www.semanticdesktop.org/ontologies/2007/01/19/nie#"
    metadata = spark.createDataFrame(
        [("share://f1.html", NIE + "dataSource", "share://p1.html",
          "iri", None, None, None),
         ("share://p1.html", NIE + "url", "http://ex/1",
          "iri", None, None, None)], TRIPLE_SCHEMA)
    contents = spark.createDataFrame(
        [("share://f1.html", "<div/>")], "physical_uri string, html string")
    df = resolve_page_bodies(metadata, contents)
    jpe = df._jdf.queryExecution()
    em = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "simple")
    plan = jpe.explainString(em)
    assert plan.count("BroadcastHashJoin") >= 2
    assert "SortMergeJoin" not in plan
