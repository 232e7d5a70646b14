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

import hashlib
import json
import os
import time
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from harvesting_extract_to_ttl_service_spark.operators.relational import upsert
from harvesting_extract_to_ttl_service_spark.schema import (
    DELTA_SCHEMA,
    STATUS_BUSY,
    STATUS_FAILED,
    STATUS_SCHEDULED,
)

ADMS_STATUS = "http://www.w3.org/ns/adms#status"


def ingest_delta_post(body: str, stream_dir: str,
                      dedup_window_s: int | None = 300) -> str | None:
    """Turn one ``POST /delta`` body (an array of changesets, or a bare
    changeset — README.md:38-60) into a JSON-lines file the file-stream
    source picks up, one changeset per line. Pure control-plane Python:
    bodies are delta-notification-sized, never data-plane.

    Files are content-addressed (md5 of the normalized payload) and the
    name is salted with a coarse ``dedup_window_s`` time bucket: duplicate
    DELIVERIES of one notification (notifier retries, double-sends) land
    on an existing name — the current or previous bucket's, so a delivery
    straddling a bucket edge still dedups — and are ingested once, while
    a byte-identical changeset legitimately re-POSTed later (e.g. the
    same task re-scheduled after a failure) gets a fresh name and re-runs
    the import, matching the reference's run-on-every-POST semantics
    beyond the redelivery window (effective window: between W and 2W
    seconds). ``dedup_window_s=None`` restores unbounded content-address
    dedup (exactly-once per distinct payload, ever).

    The write goes to a dot-prefixed temp file first (invisible to
    Spark's file source) and is renamed into place atomically. Returns
    the file path, or None for an empty body (the reference answers 204
    there, app.js:31-34)."""
    data = json.loads(body)
    if isinstance(data, dict):
        data = [data]
    if not isinstance(data, list) or not all(isinstance(c, dict) for c in data):
        raise ValueError("delta body must be a changeset object or an "
                         "array of changeset objects")
    if not data:
        return None
    payload = "".join(
        json.dumps(c, separators=(",", ":"), sort_keys=True) + "\n"
        for c in data)
    digest = hashlib.md5(payload.encode()).hexdigest()
    if dedup_window_s:
        bucket = int(time.time() // dedup_window_s)
        candidates = [f"{digest}.{bucket}.json", f"{digest}.{bucket - 1}.json"]
    else:
        candidates = [digest + ".json"]
    for cand in candidates:
        existing = os.path.join(stream_dir, cand)
        if os.path.exists(existing):
            return existing
    name = candidates[0]
    dst = os.path.join(stream_dir, name)
    os.makedirs(stream_dir, exist_ok=True)
    # per-writer temp name: two concurrent deliveries of the SAME body
    # must not interleave writes into one shared temp file (the server is
    # threaded); both then atomically replace with identical content
    import threading

    tmp = os.path.join(
        stream_dir,
        f".{name}.{os.getpid()}.{threading.get_ident()}.tmp")
    with open(tmp, "w") as f:
        f.write(payload)
    os.replace(tmp, dst)
    return dst


def serve_delta_endpoint(stream_dir: str, port: int = 0,
                         host: str = "127.0.0.1"):
    """Live HTTP front door mirroring the reference service's surface
    (app.js:24-38): ``GET /`` health text, ``POST /delta`` with an
    application/json changeset body → ingested into ``stream_dir`` for
    the running import stream. Returns an unstarted
    ``ThreadingHTTPServer`` (port 0 = ephemeral; ``server_address[1]``
    has the bound port) — call ``serve_forever()`` on a thread.
    ``host`` defaults to loopback for tests; a containerized deployment
    whose delta-notifier lives on another host passes ``'0.0.0.0'``
    (the reference's express server binds all interfaces).

    Divergence note: the reference answers 204 when the body contains no
    *scheduled-task* inserts; here the scheduled filter lives in the
    stream (scheduled_task_uris), so 204 only signals an empty body."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    class Handler(BaseHTTPRequestHandler):
        def do_GET(self):  # noqa: N802 — http.server API
            self.send_response(200)
            self.end_headers()
            self.wfile.write(b"Hello harvesting-import-service")

        def do_POST(self):  # noqa: N802
            if self.path != "/delta":
                self.send_response(404)
                self.end_headers()
                return
            ctype = self.headers.get("content-type", "")
            if not ctype.startswith("application/json"):
                self.send_response(400)
                self.end_headers()
                return
            length = int(self.headers.get("content-length", 0) or 0)
            body = self.rfile.read(length).decode("utf-8")
            try:
                written = ingest_delta_post(body, stream_dir)
            except (ValueError, json.JSONDecodeError):
                self.send_response(400)
                self.end_headers()
                return
            self.send_response(200 if written else 204)
            self.end_headers()

        def log_message(self, *args):  # quiet: no per-request stderr spam
            pass

    return ThreadingHTTPServer((host, port), Handler)


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
    log). A line may be ONE changeset object or a whole POST body (an
    ARRAY of changesets): ``from_json`` with ``array<DELTA_SCHEMA>``
    permissively wraps a bare object into a 1-element array, so a single
    parse covers both shapes; malformed lines parse to null and explode
    to nothing."""
    return lines.select(
        F.explode(F.from_json(F.col(col), T.ArrayType(DELTA_SCHEMA)))
        .alias("d")
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
