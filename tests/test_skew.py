"""salted_agg phase-2 merge safety: the merge must be explicit or
inferable — a guessed merge (e.g. summing an avg) silently corrupts
results, so unknown aliases raise instead."""

import pytest
from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.operators.skew import salted_agg


def _fixture(spark):
    return spark.createDataFrame(
        [("a", i * 1.0) for i in range(10)] + [("b", 100.0)],
        ["k", "v"],
    )


def test_unknown_alias_prefix_raises(spark):
    df = _fixture(spark)
    with pytest.raises(ValueError, match="avg_v"):
        salted_agg(df, ["k"], [F.avg("v").alias("avg_v")], salt_buckets=4)


def test_explicit_merge_overrides_inference(spark):
    df = _fixture(spark)
    out = salted_agg(
        df, ["k"],
        [F.sum("v").alias("total"), F.count("*").alias("n")],
        salt_buckets=4,
        merge={"total": F.sum, "n": F.sum},
    ).orderBy("k").collect()
    assert [(r.k, r.total, r.n) for r in out] == [("a", 45.0, 10), ("b", 100.0, 1)]


def test_inferred_merge_matches_unsalted(spark):
    df = _fixture(spark)
    out = salted_agg(
        df, ["k"],
        [F.count("*").alias("count_n"), F.sum("v").alias("sum_v"),
         F.min("v").alias("min_v"), F.max("v").alias("max_v")],
        salt_buckets=4,
    ).orderBy("k").collect()
    plain = (df.groupBy("k")
             .agg(F.count("*").alias("count_n"), F.sum("v").alias("sum_v"),
                  F.min("v").alias("min_v"), F.max("v").alias("max_v"))
             .orderBy("k").collect())
    assert out == plain
