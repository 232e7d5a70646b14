"""Graph-partitioned parquet triple store: roundtrip, graph scoping, and
partition pruning visible in the physical plan."""

from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.schema import TRIPLE_SCHEMA
from harvesting_extract_to_ttl_service_spark.sources.triple_store import (
    load_triples,
    save_triples,
)


def _triples(spark):
    rows = [
        ("urn:s1", "urn:p", "a", "literal", None, None, "urn:g:one"),
        ("urn:s2", "urn:p", "b", "literal", None, None, "urn:g:one"),
        ("urn:s3", "urn:p", "c", "literal", None, None, "urn:g:two"),
        ("urn:s4", "urn:p", "d", "literal", None, None, None),  # → default
    ]
    return spark.createDataFrame(rows, TRIPLE_SCHEMA)


def test_roundtrip_and_graph_scope(spark, tmp_path):
    path = str(tmp_path / "store")
    save_triples(_triples(spark), path)

    allg = load_triples(spark, path)
    assert allg.count() == 4
    assert set(allg.columns) == set(TRIPLE_SCHEMA.fieldNames())

    one = load_triples(spark, path, graph="urn:g:one")
    assert {r.subject for r in one.collect()} == {"urn:s1", "urn:s2"}
    # null graph lands in the default partition, not dropped
    default = load_triples(spark, path, graph="urn:g:default")
    assert default.count() == 1


def test_partition_pruning_in_plan(spark, tmp_path):
    path = str(tmp_path / "store")
    save_triples(_triples(spark), path)
    df = load_triples(spark, path, graph="urn:g:one")
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan
    # the graph predicate must be a partition filter, not a data filter
    pf = [ln for ln in plan.splitlines() if "PartitionFilters" in ln][0]
    assert "graph" in pf


def test_append_per_graph(spark, tmp_path):
    path = str(tmp_path / "store")
    save_triples(_triples(spark), path)
    extra = spark.createDataFrame(
        [("urn:s9", "urn:p", "z", "literal", None, None, "urn:g:two")],
        TRIPLE_SCHEMA)
    save_triples(extra, path)
    assert load_triples(spark, path, graph="urn:g:two").count() == 2
    assert load_triples(spark, path, graph="urn:g:one").count() == 2


def test_bucketed_star_join_no_shuffle(spark):
    from harvesting_extract_to_ttl_service_spark.sources.triple_store import (
        load_bucketed_triples,
        save_triples_bucketed,
    )

    save_triples_bucketed(_triples(spark), "t_bucketed_test", buckets=4)
    tb = load_bucketed_triples(spark, "t_bucketed_test")
    assert tb.count() == 4

    # subject-keyed aggregation over the bucketed table plans no exchange
    agg = tb.groupBy("subject").count()
    agg.count()
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange hashpartitioning") == 0

    # and a subject self-join is also exchange-free
    j = tb.alias("a").join(tb.alias("b"), "subject")
    j.count()
    jplan = j._jdf.queryExecution().executedPlan().toString()
    assert jplan.count("Exchange hashpartitioning") == 0


def test_tpch_triples_single_scan_per_table(spark):
    """Round-5 perf pin: the fixture triple view emits per-row triples via
    one explode per base table — the union-of-selects shape scanned
    customer 3x and orders/nation 2x per query."""
    from harvesting_extract_to_ttl_service_spark.plans.catalog_triples import (
        tpch_triples,
    )

    t = tpch_triples(spark, "/root/testdata/sf0.001")
    plan = t._jdf.queryExecution().executedPlan().toString()
    for table in ("nation", "region", "customer", "orders"):
        assert plan.count(f"{table}.parquet") == 1, table
