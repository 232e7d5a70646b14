"""Parquet table loaders for the driver fixtures (TESTDATA.md)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts is parquet TIMESTAMP(NANOS) — Spark's reader rejects it
        # outright, so read nanos as long and rebuild the timestamp.
        # Integer `div` (not `/`): 1.7e18 nanos exceeds double's 53-bit
        # mantissa, float division silently loses microseconds. Session TZ
        # pinned UTC so the rebuilt instants render identically to DuckDB's
        # naive-UTC reading regardless of the caller session's zone.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
