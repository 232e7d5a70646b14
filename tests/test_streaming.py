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
    ingest_delta_post,
    parse_delta_lines,
    run_import_stream,
    scheduled_task_uris,
    serve_delta_endpoint,
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


def test_parse_delta_lines_accepts_post_body_arrays(spark):
    """One line may be a whole POST body (array of changesets) — the
    reference's req.body shape (README.md:38-60) — or a bare changeset;
    malformed lines drop instead of crashing."""
    lines = spark.createDataFrame(
        [(json.dumps(DELTAS),),          # full POST body on one line
         (json.dumps(DELTAS[1]),),       # bare changeset
         ("{not json",)],                # malformed
        "value string")
    uris = scheduled_task_uris(parse_delta_lines(lines))
    assert sorted(r.task_uri for r in uris.collect()) == [
        "http://task/1", "http://task/2", "http://task/2"]


def test_ingest_delta_post_idempotent(tmp_path):
    d = str(tmp_path / "delta")
    p1 = ingest_delta_post(json.dumps(DELTAS), d)
    assert p1 is not None and not p1.split("/")[-1].startswith(".")
    with open(p1) as f:
        assert len(f.read().strip().split("\n")) == 3  # one changeset/line
    # redelivered body → same content-addressed file, no duplicate
    assert ingest_delta_post(json.dumps(DELTAS), d) == p1
    import os
    assert len([f for f in os.listdir(d) if not f.startswith(".")]) == 1
    # empty body → nothing ingested (the 204 path)
    assert ingest_delta_post("[]", d) is None
    with pytest.raises(ValueError):
        ingest_delta_post('["not-a-changeset"]', d)


def test_delta_http_front_door(spark, tmp_path):
    """Live POST /delta → stream dir → run_import_stream picks the tasks
    up: the reference's app.js:24-38 surface end to end."""
    import threading
    import urllib.request

    delta_dir = str(tmp_path / "delta")
    srv = serve_delta_endpoint(delta_dir)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        # health endpoint
        with urllib.request.urlopen(f"http://127.0.0.1:{port}/") as r:
            assert r.status == 200 and b"Hello" in r.read()
        # POST the array-of-changesets body
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/delta",
            data=json.dumps(DELTAS).encode(),
            headers={"content-type": "application/json"})
        with urllib.request.urlopen(req) as r:
            assert r.status == 200
        # empty body → 204 (reference's no-tasks answer)
        req2 = urllib.request.Request(
            f"http://127.0.0.1:{port}/delta", data=b"[]",
            headers={"content-type": "application/json"})
        with urllib.request.urlopen(req2) as r:
            assert r.status == 204
    finally:
        srv.shutdown()
        srv.server_close()

    seen: list[str] = []
    q = run_import_stream(spark, delta_dir,
                          lambda df, _b: seen.extend(
                              r.task_uri for r in df.collect()),
                          checkpoint=str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    assert sorted(seen) == ["http://task/1", "http://task/2"]


def test_events_stream_staged_once_per_session(spark):
    """_events_stream re-materializes the events fixture into a stream
    directory ONCE per (session, sf_dir) — a second invocation must reuse
    the staged files, not rewrite them (VERDICT r03: per-call staging was
    per-run waste and unbounded /tmp growth)."""
    import os

    from harvesting_extract_to_ttl_service_spark.plans.catalog_streaming import (
        _STAGED_EVENTS,
        _events_stream,
    )

    sf = "/root/testdata/sf0.001"
    _events_stream(spark, sf)
    key = (spark.sparkContext.applicationId, sf)
    staged = _STAGED_EVENTS[key]
    stamp = sorted((f, os.path.getmtime(os.path.join(staged, f)))
                   for f in os.listdir(staged))
    _events_stream(spark, sf)
    assert _STAGED_EVENTS[key] == staged
    assert sorted((f, os.path.getmtime(os.path.join(staged, f)))
                  for f in os.listdir(staged)) == stamp


def test_fail_busy_tasks(spark):
    status = spark.createDataFrame(
        [("http://task/1", STATUS_BUSY, "t0"),
         ("http://task/2", STATUS_SUCCESS, "t0")],
        "task_uri string, status string, modified string")
    out = fail_busy_tasks(status, "t1")
    rows = {r.task_uri: (r.status, r.modified) for r in out.collect()}
    assert rows["http://task/1"] == (STATUS_FAILED, "t1")
    assert rows["http://task/2"] == (STATUS_SUCCESS, "t0")


def test_run_service_end_to_end(spark, tmp_path):
    """The whole app.js lifecycle twin: startup recovery sweeps the stale
    busy task, a live POST /delta schedules task 1, the checkpointed
    stream runs ONE set-oriented import for that task only, and the TTL
    tree + status updates come out the other side."""
    import json as _json
    import os
    import urllib.request

    from harvesting_extract_to_ttl_service_spark.schema import (
        EXTRACTING_OPERATION,
        RDF_TYPE,
        STATUS_SUCCESS,
        TASK_TYPE,
        TRIPLE_SCHEMA,
    )
    from harvesting_extract_to_ttl_service_spark.service import run_service

    G = "urn:g:jobs"

    def t(s, p, o):
        return (s, p, o, "iri", None, None, G)

    control_rows = []
    for k in ("1", "2"):  # both scheduled; only task 1 arrives via delta
        control_rows += [
            t(f"urn:task:{k}", RDF_TYPE, TASK_TYPE),
            t(f"urn:task:{k}", ADMS_STATUS, STATUS_SCHEDULED),
            t(f"urn:task:{k}", "http://redpencil.data.gift/vocabularies/tasks/operation",
              EXTRACTING_OPERATION),
            t(f"urn:task:{k}", "http://redpencil.data.gift/vocabularies/tasks/inputContainer",
              f"urn:container:{k}"),
            t(f"urn:container:{k}",
              "http://redpencil.data.gift/vocabularies/tasks/hasFile",
              f"share://p{k}.html"),
        ]
    control = spark.createDataFrame(control_rows, TRIPLE_SCHEMA)
    bodies = spark.createDataFrame(
        [("share://p1.html", "http://ex/page/1",
          '<div about="http://ex/d1"><span property="dct:title">T1</span></div>'),
         ("share://p2.html", "http://ex/page/2",
          '<div about="http://ex/d2"><span property="dct:title">T2</span></div>')],
        "page_uri string, url string, html string")
    status = spark.createDataFrame(
        [("urn:task:9", STATUS_BUSY, "t0")],
        "task_uri string, status string, modified string")

    out_dir = str(tmp_path / "out")
    handle = run_service(
        spark, control, bodies,
        stream_dir=str(tmp_path / "delta"),
        checkpoint=str(tmp_path / "ckpt"),
        out_dir=out_dir, graph=G, status=status, now_iso="t1",
        trigger_available_now=False)  # live mode: keep listening for POSTs
    try:
        # startup recovery flipped the stale busy task
        rec = {r.task_uri: (r.status, r.modified)
               for r in handle.recovered_status.collect()}
        assert rec["urn:task:9"] == (STATUS_FAILED, "t1")

        body = _json.dumps([{"inserts": [
            {"subject": {"type": "uri", "value": "urn:task:1"},
             "predicate": {"type": "uri", "value": ADMS_STATUS},
             "object": {"type": "uri", "value": STATUS_SCHEDULED}}],
            "deletes": []}]).encode()
        req = urllib.request.Request(
            f"http://127.0.0.1:{handle.port}/delta", data=body,
            headers={"content-type": "application/json"})
        with urllib.request.urlopen(req) as r:
            assert r.status == 200

        import time
        res = None
        deadline = time.time() + 120
        while time.time() < deadline:
            done = [r for r in handle.batch_results
                    if r["tasks"].count() > 0]
            if done:
                res = done[0]
                break
            time.sleep(1)
        assert res is not None, "no non-empty batch arrived within 120s"
        # only the POSTed task ran, despite task 2 also being scheduled
        assert [r.task_uri for r in res["tasks"].collect()] == ["urn:task:1"]
        assert [(r.task_uri, r.status)
                for r in res["status_updates"].collect()] == [
            ("urn:task:1", STATUS_SUCCESS)]
        vals = {(r.subject, r.object_value) for r in res["valid"].collect()}
        assert ("http://ex/d1", "T1") in vals
        assert all(s != "http://ex/d2" for s, _ in vals)
        assert os.path.isdir(f"{out_dir}/valid")
    finally:
        handle.stop()


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


def test_session_window_exact_gap_boundary(spark, tmp_path):
    """Pins the session_window merge boundary (the session streaming
    oracle's >= vs > choice): an event arriving EXACTLY gap after its
    predecessor merges into the prior session; one second beyond starts a
    new one. A Spark upgrade flipping inclusive/exclusive merge behavior
    fails here loudly instead of silently flipping catalog results."""
    batch = spark.createDataFrame(
        [(1, "2024-01-01 10:00:00", 1, "click", 1.0),
         (2, "2024-01-01 10:30:00", 1, "click", 1.0),   # exactly +gap
         (3, "2024-01-01 10:00:00", 2, "click", 1.0),
         (4, "2024-01-01 10:30:01", 2, "click", 1.0)],  # gap + 1s
        "event_id long, ts_s string, user_id long, event_type string, value double",
    ).select("event_id", F.col("ts_s").cast("timestamp").alias("ts"),
             "user_id", "event_type", "value")
    p = str(tmp_path / "boundary_events")
    batch.write.parquet(p)
    stream = spark.readStream.schema(batch.schema).parquet(p)
    got = _run_to_memory(spark, session_aggregate(stream, gap="30 minutes"),
                         "t_boundary", mode="complete")
    sessions = {u: sorted((r.session_start.isoformat(), r.n_events)
                          for r in got.collect() if r.user_id == u)
                for u in (1, 2)}
    # exact-gap event MERGES → user 1 has one 2-event session
    assert sessions[1] == [("2024-01-01T10:00:00", 2)]
    # one second past the gap → user 2 splits into two sessions
    assert sessions[2] == [("2024-01-01T10:00:00", 1),
                           ("2024-01-01T10:30:01", 1)]


def test_ingest_delta_post_dedup_window(tmp_path, monkeypatch):
    """Content-address dedup is scoped to the redelivery window: retries
    of one notification (same bytes, within ~the window, even straddling
    a bucket edge) ingest once; a byte-identical changeset legitimately
    re-POSTed after the window gets a fresh file and re-runs the import
    (the reference re-runs on every POST)."""
    from harvesting_extract_to_ttl_service_spark.streaming import delta_stream

    body = json.dumps(
        [_changeset(_status_insert("http://task/9", STATUS_SCHEDULED))])
    d = str(tmp_path / "stream")
    now = [1000.0]
    monkeypatch.setattr(delta_stream.time, "time", lambda: now[0])

    p1 = delta_stream.ingest_delta_post(body, d)           # bucket 3
    now[0] = 1250.0                                        # bucket 4
    assert delta_stream.ingest_delta_post(body, d) == p1   # straddle dedups
    now[0] = 1601.0                                        # bucket 5
    p2 = delta_stream.ingest_delta_post(body, d)
    assert p2 != p1                                        # re-run later
    # unbounded mode restores exactly-once-per-payload-ever
    now[0] = 99999.0
    p3 = delta_stream.ingest_delta_post(body, d, dedup_window_s=None)
    assert delta_stream.ingest_delta_post(
        body, d, dedup_window_s=None) == p3


def test_streaming_scratch_dirs_cleaned_at_exit(spark):
    """Every scratch dir the streaming catalog creates (staged events,
    checkpoints) is registered for exit-time cleanup, and the cleanup
    hook removes them and resets the staging cache — no events_stream_*
    litter after a suite run."""
    import os

    from harvesting_extract_to_ttl_service_spark.plans import catalog_streaming

    catalog_streaming._events_stream(spark, "/root/testdata/sf0.001")
    key = (spark.sparkContext.applicationId, "/root/testdata/sf0.001")
    staged = catalog_streaming._STAGED_EVENTS[key]
    assert staged in catalog_streaming._TEMP_DIRS
    catalog_streaming._cleanup_temp_dirs()
    assert not os.path.exists(staged)
    assert catalog_streaming._STAGED_EVENTS == {}
    assert catalog_streaming._TEMP_DIRS == []
    # the staging cache repopulates transparently after a cleanup
    catalog_streaming._events_stream(spark, "/root/testdata/sf0.001")
    assert os.path.exists(catalog_streaming._STAGED_EVENTS[key])


def test_stream_stream_interval_join_matches_batch(spark, events_stream):
    """Self-join of one stream: clicks matched to the same user's errors
    within 1 hour after the click. The streaming result (append mode —
    inner-join matches emit in their micro-batch) must equal the same
    operator applied to the bounded frame, and a hand-checked pair must
    be present."""
    from harvesting_extract_to_ttl_service_spark.streaming.windows import (
        stream_stream_interval_join,
    )

    def sides(df):
        clicks = df.filter(F.col("event_type") == "click").select(
            "user_id", F.col("event_id").alias("click_id"),
            F.col("ts").alias("click_ts"))
        errors = df.filter(F.col("event_type") == "error").select(
            F.col("user_id").alias("e_user_id"),
            F.col("event_id").alias("error_id"),
            F.col("ts").alias("error_ts"))
        return clicks, errors

    stream, batch = events_stream
    sc, se = sides(stream)
    # fixture shape: errors land at hour 0, clicks at hours 1-2 — so the
    # populated direction is clicks within 1 hour AFTER an error
    got = _run_to_memory(
        spark,
        stream_stream_interval_join(
            se, sc, left_key="e_user_id", right_key="user_id",
            left_ts="error_ts", right_ts="click_ts", within="1 hour"),
        "t_ssjoin", mode="append")
    bc, be = sides(batch)
    want = stream_stream_interval_join(
        be, bc, left_key="e_user_id", right_key="user_id",
        left_ts="error_ts", right_ts="click_ts", within="1 hour")
    assert _sorted_rows(got) == _sorted_rows(want)
    assert got.count() > 0
    # boundary semantics: the window is inclusive on both ends
    import datetime as dt

    rows = {(r.click_id, r.error_id) for r in got.collect()}
    for r in want.collect():
        delta = r.click_ts - r.error_ts
        assert dt.timedelta(0) <= delta <= dt.timedelta(hours=1)
    assert rows  # non-empty by fixture construction
