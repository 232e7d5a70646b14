"""The composed live-service twin — the reference's whole ``app.js``
lifecycle as one callable:

  1. startup recovery: stale busy tasks → failed
     (``failBusyImportTasks()``, app.js:16, lib/task.js:24-63)
  2. HTTP front door: ``GET /`` health + ``POST /delta`` changeset bodies
     (app.js:24-38) ingested into the stream directory
  3. checkpointed import stream: each micro-batch's scheduled-task set
     runs ONE set-oriented import pipeline (extract → triage → TTL
     sinks + status/error outputs) — the replacement for the reference's
     un-awaited per-entry ``runImportPipeline(entry)`` loop

A user of the reference service points their delta-notifier at the
returned port and gets the same observable behavior: TTL trees on disk,
task status transitions, error blocks — backed by Spark jobs instead of
a sequential Node loop.
"""

from __future__ import annotations

import threading
from dataclasses import dataclass, field
from collections.abc import Mapping
from typing import Any, Callable

from pyspark.sql import DataFrame, SparkSession

from harvesting_extract_to_ttl_service_spark.plans.pipeline_import import (
    run_import_pipeline,
)
from harvesting_extract_to_ttl_service_spark.streaming.delta_stream import (
    fail_busy_tasks,
    run_import_stream,
    serve_delta_endpoint,
)


@dataclass
class ServiceHandle:
    """Running service state: the bound HTTP server, its thread, the
    streaming query, recovered startup statuses, and the per-batch
    pipeline results (appended as batches complete)."""

    server: Any
    thread: threading.Thread
    query: Any
    recovered_status: DataFrame | None
    batch_results: list[Mapping[str, DataFrame]] = field(default_factory=list)

    @property
    def port(self) -> int:
        return self.server.server_address[1]

    def await_termination(self, timeout_s: int = 300) -> None:
        self.query.awaitTermination(timeout_s)

    def stop(self) -> None:
        try:
            self.query.stop()
        finally:
            self.server.shutdown()
            self.server.server_close()
            self.thread.join(timeout=10)


def run_service(
    spark: SparkSession,
    control: DataFrame,
    page_bodies: DataFrame,
    stream_dir: str,
    checkpoint: str,
    out_dir: str | None = None,
    graph: str | None = None,
    status: DataFrame | None = None,
    now_iso: str = "1970-01-01T00:00:00Z",
    port: int = 0,
    host: str = "127.0.0.1",
    compat: bool = False,
    compat_tz: str | None = None,
    write_debug_ttls: bool = False,
    fail_on_page_error: bool = False,
    trigger_available_now: bool = True,
    on_batch: Callable[[Mapping[str, DataFrame], int], None] | None = None,
) -> ServiceHandle:
    """Start the service twin. ``control`` is the task/job triple set,
    ``page_bodies`` the resolved page inputs (compose them from metadata
    triples + a share directory via ``sources.files.resolve_page_bodies``
    when they aren't pre-joined). ``status`` is an optional
    ``(task_uri, status, modified)`` table swept busy→failed before the
    stream starts. ``on_batch`` observes each batch's pipeline outputs
    (e.g. to upsert status_updates into a store); results are also kept
    on the returned handle."""
    import os

    os.makedirs(stream_dir, exist_ok=True)  # stream source needs it upfront
    recovered = fail_busy_tasks(status, now_iso) if status is not None else None

    server = serve_delta_endpoint(stream_dir, port, host)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()

    handle = ServiceHandle(server=server, thread=thread, query=None,
                           recovered_status=recovered)

    def process(task_uris: DataFrame, batch_id: int) -> None:
        res = run_import_pipeline(
            control, page_bodies, out_dir=out_dir, graph=graph,
            write_debug_ttls=write_debug_ttls, now_iso=now_iso,
            fail_on_page_error=fail_on_page_error, compat=compat,
            compat_tz=compat_tz, task_filter=task_uris)
        handle.batch_results.append(res)
        if on_batch is not None:
            on_batch(res, batch_id)

    try:
        handle.query = run_import_stream(
            spark, stream_dir, process, checkpoint,
            trigger_available_now=trigger_available_now)
    except Exception:
        # don't leak a listening server when the stream fails to start
        server.shutdown()
        server.server_close()
        raise
    return handle
