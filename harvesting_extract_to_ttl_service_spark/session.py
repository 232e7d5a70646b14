"""SparkSession factory tuned for the engine.

Local testing runs a single JVM (local[N]); the configuration is chosen so
the same code scales to a real cluster: AQE on (runtime re-plan, skew-join
handling), shuffle partitions sized explicitly, Arrow enabled for the few
Pandas-UDF operators, session timezone pinned to UTC so results compare
bit-for-bit against the DuckDB oracle.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession


def get_spark(app_name: str = "harvesting_extract_to_ttl_service_spark",
              cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 4)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # Respect the advisory partition size when coalescing instead of
        # padding out to defaultParallelism: measured ~5 s off the sf0.1
        # bench (tiny control-plane shuffles stop costing a 32-task stage
        # each). The known hazard — size-based coalescing serializes a
        # COMPUTE-dense join whose shuffle input is small but whose
        # output explodes (the 10x-probe SimHash block join: ~6 MB
        # shuffle → 26M join rows, 6 s → 23 s on one task) — is handled
        # where it lives: the expansion-prone self-joins pin their
        # reduce parallelism explicitly (dedup._pin_join_parallelism),
        # which AQE never coalesces.
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst",
                "false")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "4096")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # static config — needed for bucketed tables (saveAsTable). Default
        # is a fresh temp dir per session: a persistent dir would leak
        # table locations across sessions while the in-memory catalog
        # forgets them, making every re-save fail with
        # LOCATION_ALREADY_EXISTS. A real deployment overrides this and
        # uses a real metastore.
        .config("spark.sql.warehouse.dir",
                os.environ.get("SPARK_GRAFT_WAREHOUSE") or
                tempfile.mkdtemp(prefix="spark_graft_warehouse_"))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
