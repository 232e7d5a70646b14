"""Parquet table loaders for the driver fixtures (TESTDATA.md)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, TimestampNTZType

TABLES = ["region", "nation", "customer", "supplier", "part", "orders",
          "lineitem", "events", "documents", "embeddings"]


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name == "events":
        # events.ts has shipped as both parquet TIMESTAMP(NANOS) (which
        # Spark's reader surfaces as long only under nanosAsLong) and plain
        # TIMESTAMP(MICROS); branch on the loaded dtype so either fixture
        # generation works. Integer `div` (not `/`): 1.7e18 nanos exceeds
        # double's 53-bit mantissa, float division silently loses
        # microseconds. Session TZ pinned UTC so the instants render
        # identically to DuckDB's naive-UTC reading regardless of the
        # caller session's zone.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        ts_type = df.schema["ts"].dataType
        if isinstance(ts_type, LongType):
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        elif isinstance(ts_type, TimestampNTZType):
            # Normalize NTZ → TIMESTAMP: with the session TZ pinned UTC the
            # instants are unchanged, and downstream code (epoch-second
            # casts, window math) only accepts TIMESTAMP.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
        return df
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")
