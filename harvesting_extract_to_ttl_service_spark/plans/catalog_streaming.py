"""Streaming-surface catalog entries (SURVEY.md §2A A1-A3 + §2C streaming).

The delta-changeset decode is oracle-checked: changeset JSON is built
deterministically from ``orders`` with Spark, parsed back through the real
DELTA_SCHEMA ``from_json`` path, and DuckDB restates the expected task list
directly from ``orders``. The windowed operators run the *streaming* code
path (readStream → watermark → window → memory sink via availableNow);
availableNow over a static staged directory is deterministic, so each
windowed member carries a direct SQL oracle restatement of the window
math (full rows+schema+hash check); only the custom stateful operator
stays rows-only.
"""

from __future__ import annotations

import atexit
import shutil
import tempfile
import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.plans.suites import (
    member_sql,
    suite_df,
    suite_sql,
)
from harvesting_extract_to_ttl_service_spark.plans.tables import load
from harvesting_extract_to_ttl_service_spark.schema import STATUS_SCHEDULED
from harvesting_extract_to_ttl_service_spark.streaming.delta_stream import (
    ADMS_STATUS,
    parse_delta_lines,
    scheduled_task_uris,
)
from harvesting_extract_to_ttl_service_spark.streaming.windows import (
    session_aggregate,
    sliding_counts,
    stream_stream_interval_join,
    tumbling_counts,
)

QUERIES = {}
ORACLES = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


@q("delta_scheduled_tasks", f"""
SELECT 'urn:task:' || o_orderkey AS task_uri
FROM orders
WHERE o_orderkey % 5 = 0 AND o_orderstatus = 'O'
""")
def delta_scheduled_tasks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders → synthetic delta-changeset JSON lines → real from_json
    decode → flatten/filter/project (lib/delta.js:9-17). Open orders with
    key % 5 == 0 carry the scheduled-status insert; everything else is
    noise the filter must reject."""
    o = load(spark, sf_dir, "orders")
    status_obj = F.when(
        (F.col("o_orderkey") % 5 == 0) & (F.col("o_orderstatus") == "O"),
        STATUS_SCHEDULED,
    ).otherwise("urn:status:other")
    line = F.to_json(F.struct(
        F.array(F.struct(
            F.struct(F.lit("uri").alias("type"),
                     F.concat(F.lit("urn:task:"), "o_orderkey").alias("value"),
                     ).alias("subject"),
            F.struct(F.lit("uri").alias("type"),
                     F.lit(ADMS_STATUS).alias("value")).alias("predicate"),
            F.struct(F.lit("uri").alias("type"),
                     status_obj.alias("value")).alias("object"),
        )).alias("inserts"),
        F.array().alias("deletes"),
    ))
    lines = o.select(line.alias("value"))
    return scheduled_task_uris(parse_delta_lines(lines))


# Every scratch dir this module creates (staged fixtures, checkpoints) is
# tracked and removed at interpreter exit — a long test run or many-session
# process must not leave events_stream_*/ckpt_* litter in /tmp.
_TEMP_DIRS: list[str] = []


def _tracked_mkdtemp(prefix: str) -> str:
    d = tempfile.mkdtemp(prefix=prefix)
    _TEMP_DIRS.append(d)
    return d


@atexit.register
def _cleanup_temp_dirs() -> None:
    for d in _TEMP_DIRS:
        shutil.rmtree(d, ignore_errors=True)
    _TEMP_DIRS.clear()
    _STAGED_EVENTS.clear()  # stale pointers must not outlive their dirs


def _run_available_now(sdf: DataFrame, spark: SparkSession,
                       mode: str = "complete") -> DataFrame:
    """Append mode for stream-stream joins (inner join matches emit in the
    micro-batch they occur; complete mode is unsupported for joins),
    complete for the windowed aggregates."""
    name = "q" + uuid.uuid4().hex
    ckpt = _tracked_mkdtemp(prefix="ckpt_")
    query = (sdf.writeStream.format("memory").queryName(name)
             .outputMode(mode).option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
    query.awaitTermination(300)
    return spark.table(name)


_STAGED_EVENTS: dict[tuple[str, str], str] = {}


def _events_stream(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stage the events fixture into a streamable directory, once per
    (session, sf_dir) — the file-stream source wants a directory (and a
    normalized µs ``ts``), but re-materializing per call would rewrite the
    fixture on every invocation and leak /tmp dirs across runs. Keyed by
    applicationId like ``_bucketed_table``'s session-warehouse idempotence
    (catalog_core.py:743-772)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    batch = load(spark, sf_dir, "events")
    staged = _STAGED_EVENTS.get(key)
    if staged is None:
        staged = _tracked_mkdtemp(prefix="events_stream_")
        batch.write.mode("overwrite").parquet(staged)
        _STAGED_EVENTS[key] = staged
    return spark.readStream.schema(batch.schema).parquet(staged)


@member_sql("""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS window_start,
       strftime(date_trunc('hour', ts) + INTERVAL 1 HOUR,
                '%Y-%m-%d %H:%M:%S')                         AS window_end,
       event_type, count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM events GROUP BY 1, 2, 3
""")
def streaming_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True streaming execution (file stream → watermark → tumbling window
    → memory sink). availableNow over a static staged directory lands in a
    single micro-batch (≤ maxFilesPerTrigger files), so the initial
    watermark admits every row and complete mode keeps all windows — the
    result is deterministic and the oracle restates it directly
    (hour-aligned ``F.window`` ≡ ``date_trunc('hour')``)."""
    out = _run_available_now(
        tumbling_counts(_events_stream(spark, sf_dir)), spark)
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
        .alias("window_start"),
        F.date_format("window_end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        "event_type", "n_events",
        F.round("sum_value", 2).alias("sum_value"))


@member_sql("""
SELECT strftime(make_timestamp(
           CAST((floor(epoch(ts) / 1800) - off.o) * 1800 AS BIGINT)
           * 1000000), '%Y-%m-%d %H:%M:%S') AS window_start,
       strftime(make_timestamp(
           CAST(((floor(epoch(ts) / 1800) - off.o) * 1800 + 3600) AS BIGINT)
           * 1000000), '%Y-%m-%d %H:%M:%S') AS window_end,
       count(*) AS n_events
FROM events CROSS JOIN (VALUES (0), (1)) off(o)
GROUP BY 1, 2
""")
def streaming_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sliding windows (1h size / 30min slide — every event in
    2 windows), same availableNow determinism as the tumbling member; the
    oracle regenerates both window alignments per event on the 30-minute
    epoch grid (the batch twin event_sliding_windows restates start-only;
    this one pins both bounds through the streaming path)."""
    out = _run_available_now(
        sliding_counts(_events_stream(spark, sf_dir)), spark)
    return out.select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss")
        .alias("window_start"),
        F.date_format("window_end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        "n_events")


@member_sql("""
WITH flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
                OR ts > lag(ts) OVER w + INTERVAL 30 MINUTE
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id, ts, value,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f')  AS session_start,
       strftime(max(ts) + INTERVAL 30 MINUTE,
                '%Y-%m-%d %H:%M:%S.%f')           AS session_end,
       count(*) AS n_events,
       round(sum(value), 2) AS sum_value
FROM sess GROUP BY user_id, session_id
""")
def streaming_session_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming session_window per user, oracle-restated as lag+cumsum
    sessionization. Empirically (PySpark 4.1.2) ``session_window`` MERGES
    an event arriving at exactly lag(ts)+gap into the prior session, so a
    new session starts only when ``ts > lag(ts) + 30 min`` (strict ``>``
    in the oracle, matching the batch ``sessionize_events`` twin); window
    end is last event + gap. Timestamps keep microsecond precision
    through the format."""
    out = _run_available_now(
        session_aggregate(_events_stream(spark, sf_dir)), spark)
    return out.select(
        "user_id",
        F.date_format("session_start", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .alias("session_start"),
        F.date_format("session_end", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .alias("session_end"),
        "n_events",
        F.round("sum_value", 2).alias("sum_value"))


def _page_results(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-page result rows synthesized from orders (task =
    key % 50, n_triples = key % 7) — shared by the stateful streaming
    operator and its batch-twin oracle."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        F.concat(F.lit("urn:task:"),
                 (F.col("o_orderkey") % 50).cast("string")).alias("task_uri"),
        F.concat(F.lit("share://page"), "o_orderkey").alias("page_uri"),
        (F.col("o_orderkey") % 7).cast("long").alias("n_triples"),
    )


@q("task_progress_batch", """
SELECT 'urn:task:' || (o_orderkey % 50) AS task_uri,
       count(*)                          AS pages_done,
       CAST(sum(o_orderkey % 7) AS BIGINT) AS triples_total,
       'busy'                            AS status
FROM orders GROUP BY 1
""")
def task_progress_batch_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the applyInPandasWithState progress tracker — the
    totals the keyed state converges to after one pass."""
    from harvesting_extract_to_ttl_service_spark.streaming.stateful import (
        task_progress_batch,
    )

    return task_progress_batch(_page_results(spark, sf_dir))


@q("streaming_task_progress")  # custom stateful operator: rows-only check
def streaming_task_progress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandasWithState per-task progress over a file stream of the
    synthesized page results; oracle coverage comes from the batch twin."""
    from harvesting_extract_to_ttl_service_spark.streaming.stateful import (
        task_progress,
    )

    staged = _tracked_mkdtemp(prefix="page_results_")
    batch = _page_results(spark, sf_dir)
    batch.write.mode("overwrite").parquet(staged)
    n_staged = batch.count()
    stream = spark.readStream.schema(batch.schema).parquet(staged)

    name = "q" + uuid.uuid4().hex
    ckpt = _tracked_mkdtemp(prefix="ckpt_")
    query = (task_progress(stream).writeStream.format("memory")
             .queryName(name).outputMode("append")
             .option("checkpointLocation", ckpt)
             .trigger(availableNow=True).start())
    # A ProcessingTimeTimeout stateful query NEVER self-terminates — the
    # engine keeps firing empty micro-batches forever so state timers
    # can flush ('stale' rows), and `noNewData` never latches, so both
    # awaitTermination(N) and processAllAvailable() block to their
    # limit. The old fixed `awaitTermination(300)` burned a hard 300 s
    # per call and then LEAKED the running query, whose /tmp checkpoint
    # churn threw state-store errors for the rest of the session
    # (measured: 377 zero-row batches). Instead: poll the progress feed
    # until the staged rows are committed (progress is reported after a
    # batch commits), then stop. The returned rows are identical: timer
    # flushes emit only 'stale' rows, which the busy filter always
    # excluded (round 16).
    import time as _time

    try:
        deadline = _time.monotonic() + 300
        while _time.monotonic() < deadline:
            done = sum(int(p["numInputRows"])
                       for p in query.recentProgress)
            if done >= n_staged:
                break
            _time.sleep(0.2)
        else:
            raise TimeoutError(
                f"streaming_task_progress: only {done}/{n_staged} rows "
                f"committed within 300s")
    finally:
        query.stop()
    return spark.table(name).filter(F.col("status") == "busy")


@member_sql("""
SELECT a.user_id AS user_id,
       a.event_id AS click_id,
       b.event_id AS purchase_id,
       strftime(a.ts, '%Y-%m-%d %H:%M:%S.%f') AS click_ts,
       strftime(b.ts, '%Y-%m-%d %H:%M:%S.%f') AS purchase_ts,
       round(b.value, 2) AS purchase_value
FROM events a JOIN events b
  ON a.user_id = b.user_id
 AND b.ts >= a.ts AND b.ts <= a.ts + INTERVAL 1 HOUR
WHERE a.event_type = 'click' AND b.event_type = 'purchase'
""")
def streaming_click_purchase_join(spark: SparkSession,
                                  sf_dir: str) -> DataFrame:
    """True stream-stream join execution: two filtered views of the same
    file stream (a self-join), watermarked on both sides, matched on
    user_id with purchases inside [click, click + 1 hour]. availableNow
    over the static staged directory lands both sides in one micro-batch,
    so every true match emits before termination and the batch self-join
    oracle restates the full result."""
    ev = _events_stream(spark, sf_dir)
    clicks = ev.filter(F.col("event_type") == "click").select(
        "user_id", F.col("event_id").alias("click_id"),
        F.col("ts").alias("click_ts"))
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user_id"),
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("purchase_ts"),
        F.col("value").alias("purchase_value"))
    joined = stream_stream_interval_join(
        clicks, purchases, left_key="user_id", right_key="p_user_id",
        left_ts="click_ts", right_ts="purchase_ts", within="1 hour")
    out = _run_available_now(joined, spark, mode="append")
    return out.select(
        "user_id", "click_id", "purchase_id",
        F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .alias("click_ts"),
        F.date_format("purchase_ts", "yyyy-MM-dd HH:mm:ss.SSSSSS")
        .alias("purchase_ts"),
        F.round("purchase_value", 2).alias("purchase_value"))


_STREAMING_WINDOW_MEMBERS = [
    ("tumbling", streaming_tumbling_counts,
     ["window_start", "window_end", "event_type", "n_events"], ["sum_value"]),
    ("sliding", streaming_sliding_counts,
     ["window_start", "window_end", "n_events"], []),
    ("session", streaming_session_aggregate,
     ["user_id", "session_start", "session_end", "n_events"], ["sum_value"]),
    ("ssjoin", streaming_click_purchase_join,
     ["user_id", "click_id", "purchase_id", "click_ts", "purchase_ts"],
     ["purchase_value"]),
]


@q("streaming_windows", suite_sql(_STREAMING_WINDOW_MEMBERS))
def streaming_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """True streaming execution of tumbling + session windows (file stream
    -> watermark -> window -> memory sink via availableNow). availableNow
    + complete mode over a static staged directory is deterministic, so
    each member carries a direct oracle restatement (window math in SQL)
    — full rows+schema+hash check, no longer rows-only."""
    return suite_df(spark, sf_dir, _STREAMING_WINDOW_MEMBERS)
