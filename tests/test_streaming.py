"""Streaming surface tests: delta-changeset stream → scheduled task URIs →
foreachBatch processing (checkpointed), startup recovery upsert, and the
watermarked window operators checked against their batch twins."""

import json

import pytest
from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.schema import (
    STATUS_BUSY,
    STATUS_FAILED,
    STATUS_SCHEDULED,
    STATUS_SUCCESS,
)
from harvesting_extract_to_ttl_service_spark.streaming.delta_stream import (
    ADMS_STATUS,
    fail_busy_tasks,
    parse_delta_lines,
    run_import_stream,
    scheduled_task_uris,
)
from harvesting_extract_to_ttl_service_spark.streaming.windows import (
    dedup_events,
    session_aggregate,
    sliding_counts,
    tumbling_counts,
)


def _term(v, t="uri"):
    return {"type": t, "value": v}


def _changeset(*inserts):
    return {"inserts": list(inserts), "deletes": []}


def _status_insert(task, status):
    return {"subject": _term(task), "predicate": _term(ADMS_STATUS),
            "object": _term(status)}


def _write_delta_file(path, changesets):
    with open(path, "w") as f:
        for c in changesets:
            f.write(json.dumps(c) + "\n")


DELTAS = [
    _changeset(
        _status_insert("http://task/1", STATUS_SCHEDULED),
        {"subject": _term("http://noise"), "predicate": _term("http://p"),
         "object": _term("x", "literal")},
    ),
    _changeset(_status_insert("http://task/2", STATUS_SCHEDULED)),
    _changeset(_status_insert("http://task/3", STATUS_SUCCESS)),  # not scheduled
]


def test_scheduled_task_uris_batch(spark):
    lines = spark.createDataFrame(
        [(json.dumps(c),) for c in DELTAS], "value string")
    uris = scheduled_task_uris(parse_delta_lines(lines))
    assert sorted(r.task_uri for r in uris.collect()) == [
        "http://task/1", "http://task/2"]


def test_run_import_stream(spark, tmp_path):
    delta_dir = tmp_path / "delta"
    delta_dir.mkdir()
    _write_delta_file(delta_dir / "batch0.json", DELTAS)

    seen: list[str] = []

    def process(df, batch_id):
        seen.extend(r.task_uri for r in df.collect())

    q = run_import_stream(spark, str(delta_dir), process,
                          checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert sorted(seen) == ["http://task/1", "http://task/2"]

    # restart with no new files → checkpoint prevents reprocessing
    seen.clear()
    q = run_import_stream(spark, str(delta_dir), process,
                          checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert seen == []

    # a new file is picked up incrementally
    _write_delta_file(delta_dir / "batch1.json",
                      [_changeset(_status_insert("http://task/9",
                                                 STATUS_SCHEDULED))])
    q = run_import_stream(spark, str(delta_dir), process,
                          checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert seen == ["http://task/9"]


def test_fail_busy_tasks(spark):
    status = spark.createDataFrame(
        [("http://task/1", STATUS_BUSY, "t0"),
         ("http://task/2", STATUS_SUCCESS, "t0")],
        "task_uri string, status string, modified string")
    out = fail_busy_tasks(status, "t1")
    rows = {r.task_uri: (r.status, r.modified) for r in out.collect()}
    assert rows["http://task/1"] == (STATUS_FAILED, "t1")
    assert rows["http://task/2"] == (STATUS_SUCCESS, "t0")


@pytest.fixture()
def events_stream(spark, tmp_path):
    """Small deterministic event set materialized as parquet, read back as
    a stream; returns (streaming_df, batch_df)."""
    batch = spark.createDataFrame(
        [(i, f"2024-01-01 0{i % 3}:{(i * 7) % 60:02d}:00", i % 2,
          "error" if i % 3 == 0 else "click", float(i))
         for i in range(30)],
        "event_id long, ts_s string, user_id long, event_type string, value double",
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "user_id", "event_type", "value")
    p = str(tmp_path / "events")
    batch.write.parquet(p)
    stream = spark.readStream.schema(batch.schema).parquet(p)
    return stream, batch


def _run_to_memory(spark, sdf, name, mode="append"):
    q = (sdf.writeStream.format("memory").queryName(name)
         .outputMode(mode).trigger(availableNow=True).start())
    q.awaitTermination(120)
    return spark.table(name)


def _sorted_rows(df):
    return sorted(map(tuple, df.collect()))


def test_tumbling_counts_matches_batch(spark, events_stream):
    stream, batch = events_stream
    got = _run_to_memory(spark, tumbling_counts(stream), "t_tumbling",
                         mode="complete")
    want = tumbling_counts(batch)  # same code path on bounded data
    assert _sorted_rows(got) == _sorted_rows(want)
    assert got.count() > 0


def test_sliding_counts_matches_batch(spark, events_stream):
    stream, batch = events_stream
    got = _run_to_memory(spark, sliding_counts(stream), "t_sliding",
                         mode="complete")
    assert _sorted_rows(got) == _sorted_rows(sliding_counts(batch))


def test_session_aggregate_matches_batch(spark, events_stream):
    stream, batch = events_stream
    got = _run_to_memory(spark, session_aggregate(stream), "t_session",
                         mode="complete")
    assert _sorted_rows(got) == _sorted_rows(session_aggregate(batch))
    assert got.count() > 0


def test_dedup_events_stream(spark, tmp_path):
    batch = spark.createDataFrame(
        [(1, "2024-01-01 00:00:00", 1.0), (1, "2024-01-01 00:00:00", 1.0),
         (2, "2024-01-01 00:05:00", 2.0)],
        "event_id long, ts_s string, value double",
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"), "value")
    p = str(tmp_path / "dups")
    batch.write.parquet(p)
    stream = spark.readStream.schema(
        "event_id long, ts timestamp, value double").parquet(p)
    got = _run_to_memory(spark, dedup_events(stream), "t_dedup")
    assert got.count() == 2
