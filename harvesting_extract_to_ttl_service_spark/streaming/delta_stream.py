"""Structured-Streaming front door: the delta-changeset stream and the
per-batch import job.

Reference mapping (SURVEY.md §2A A1-A3/A17/A25/A26, §3.1):
  * ``POST /delta`` JSON body            app.js:28-30, lib/delta.js
    → a file/directory stream of JSON-lines changesets; each micro-batch
    is the body of one-or-more POSTs. ``from_json`` with the explicit
    DELTA_SCHEMA — no schema inference on the hot path.
  * flatten + filter + project           lib/delta.js:9-17
    → ``explode(inserts)`` + predicate/object filter + subject projection.
  * fire-and-forget per task             app.js:35-38
    → set-oriented: every task in the micro-batch is processed in ONE
    Spark job inside ``foreachBatch`` (no per-task loop).
  * startup recovery busy→failed        app.js:16, lib/task.js:24-63
    → ``fail_busy_tasks`` batch upsert before the stream starts; under a
    checkpointed query, restart semantics come from the checkpoint.

Scale: the stream shuffles only task URIs (tiny); the heavy work — page
extraction and triage — runs as batch DataFrame transforms per micro-batch
and inherits their partitioning. Watermark-based dedup of task URIs keeps
the state store bounded.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.operators.relational import upsert
from harvesting_extract_to_ttl_service_spark.schema import (
    DELTA_SCHEMA,
    STATUS_BUSY,
    STATUS_FAILED,
    STATUS_SCHEDULED,
)

ADMS_STATUS = "http://www.w3.org/ns/adms#status"


def read_delta_stream(spark: SparkSession, path: str) -> DataFrame:
    """Stream of changesets: JSON-lines files, one changeset object per
    line (the reference's POST body is an array of these, README.md:38-60).
    Explicit schema — a malformed line yields null struct, not a crash."""
    return (
        spark.readStream.schema(DELTA_SCHEMA)
        .option("maxFilesPerTrigger", 64)
        .json(path)
    )


def parse_delta_lines(lines: DataFrame, col: str = "value") -> DataFrame:
    """Batch twin for already-read text lines (POST bodies captured to a
    log): ``from_json`` with DELTA_SCHEMA."""
    return lines.select(
        F.from_json(F.col(col), DELTA_SCHEMA).alias("d")
    ).select("d.inserts", "d.deletes")


def scheduled_task_uris(changesets: DataFrame,
                        predicate: str = ADMS_STATUS,
                        obj: str = STATUS_SCHEDULED) -> DataFrame:
    """Delta.getInsertsFor(adms:status, scheduled) → [taskUri]
    (lib/delta.js:13-17): flatten inserts, keep matching (predicate,
    object), project subject values. Works on batch and streaming frames."""
    ins = changesets.select(F.explode("inserts").alias("t"))
    return (
        ins.filter((F.col("t.predicate.value") == predicate)
                   & (F.col("t.object.value") == obj))
        .select(F.col("t.subject.value").alias("task_uri"))
    )


def fail_busy_tasks(status: DataFrame, now_iso: str) -> DataFrame:
    """Startup recovery (lib/task.js:24-63): every busy task flips to
    failed with a fresh modified stamp — an idempotent upsert on the status
    table (columns ``task_uri, status, modified``)."""
    stale = status.filter(F.col("status") == STATUS_BUSY)
    upd = stale.select(
        "task_uri",
        F.lit(STATUS_FAILED).alias("status"),
        F.lit(now_iso).alias("modified"),
    )
    return upsert(status, upd, ["task_uri"])


def run_import_stream(
    spark: SparkSession,
    delta_path: str,
    process_tasks: Callable[[DataFrame, int], None],
    checkpoint: str,
    trigger_available_now: bool = True,
):
    """Wire the delta stream to a per-micro-batch task processor.

    ``process_tasks(task_uris_df, batch_id)`` receives the DISTINCT
    scheduled-task URIs of the batch and runs the heavy batch pipeline
    (pages → extract → triage → sinks) — the set-oriented replacement for
    the reference's un-awaited per-task ``runImportPipeline`` calls.
    Checkpointing makes restart idempotent (the streaming analogue of the
    busy→failed recovery sweep)."""
    tasks = scheduled_task_uris(read_delta_stream(spark, delta_path))

    def batch_fn(df: DataFrame, batch_id: int) -> None:
        process_tasks(df.distinct(), batch_id)

    writer = (
        tasks.writeStream.foreachBatch(batch_fn)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
    )
    if trigger_available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
