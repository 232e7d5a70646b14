"""Shared maintenance-fold primitives for the persisted indexes: JSON
sidecar I/O through the Hadoop FileSystem API (the index may live on
hdfs/s3a) and the expiring single-compactor LEASE.

The lease closes the "two simultaneous compactors" window the marker
file alone could not: the compacting marker now carries an owner token
and a deadline, a second compactor REFUSES while the lease is live,
and may take over only after expiry (the previous holder is presumed
dead; its partial work is handled by the fold's normal crash-resume
path). Acquisition is read-then-write, not compare-and-swap — a
portable CAS does not exist across HDFS/S3/local — so two compactors
starting inside one read-write window can still both believe they hold
it; what the lease guarantees is that at most one fold COMMITS: every
holder re-verifies ownership (:func:`check_lease`) immediately before
its pointer flip and aborts loudly if the lease was taken, and
:func:`release_lease` only removes a marker the caller still owns.
Long-running holders additionally write all bulk output to
OWNER-UNIQUE staging directories promoted (renamed) only after a
fresh ownership check, so a zombie whose lease expired mid-write can
never land task files inside a directory a takeover run will flip.

Clock-skew assumption: lease deadlines are wall-clock times written
by one driver and compared by another, so cross-machine clock skew
silently shortens (or lengthens) the exclusion window — size
``lease_seconds`` with your fleet's worst-case skew as margin (NTP
keeps this in the low seconds; leases are minutes-to-hours).

Used by streaming/lexical_stream.py (the BM25 index) and
streaming/ann_stream.py (the IVF index)."""

from __future__ import annotations

import json
import time
import uuid

from pyspark.sql import SparkSession


def _read_json_sidecar(spark: SparkSession, path: str) -> dict | None:
    """Hadoop-FS JSON read (the index may live on hdfs/s3a); None when
    absent."""
    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )

    fs, _ = _hadoop_fs(spark, path)
    jpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    if not fs.exists(jpath):
        return None
    stream = fs.open(jpath)
    try:
        buf = spark._jvm.java.io.BufferedReader(
            spark._jvm.java.io.InputStreamReader(stream, "UTF-8"))
        data = []
        line = buf.readLine()
        while line is not None:
            data.append(line)
            line = buf.readLine()
    finally:
        stream.close()
    return json.loads("\n".join(data))


def _write_json_sidecar(spark: SparkSession, path: str, d: dict) -> None:
    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )

    fs, _ = _hadoop_fs(spark, path)
    out = fs.create(spark._jvm.org.apache.hadoop.fs.Path(path), True)
    try:
        out.write(json.dumps(d).encode())
    finally:
        out.close()


def _delete_path(spark: SparkSession, path: str,
                 recursive: bool = False) -> None:
    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )

    fs, _ = _hadoop_fs(spark, path)
    fs.delete(spark._jvm.org.apache.hadoop.fs.Path(path), recursive)


def acquire_lease(spark: SparkSession, marker_path: str,
                  lease_seconds: float,
                  payload: dict | None = None,
                  steal_legacy: bool = False) -> str:
    """Take the maintenance lease at ``marker_path`` and return the
    owner token. A LIVE lease held by someone else refuses loudly. An
    expired lease is taken over: the previous holder is presumed dead
    and its partial work is resumed by the fold's normal crash-recovery
    logic. A bare pre-lease marker with no deadline (the pre-upgrade
    ``{"compacting": true}`` form) REFUSES by default — during a
    mixed-version rollout the pre-upgrade compactor that wrote it may
    be genuinely still running, and there is no deadline to say
    otherwise; pass ``steal_legacy=True`` only after verifying no
    pre-upgrade job is alive. ``payload`` keys (e.g.
    ``compacting``/``folding_through``) ride in the same marker file so
    ingest keeps reading them from the one place it always has."""
    now = time.time()
    cur = _read_json_sidecar(spark, marker_path)
    if cur is not None:
        deadline = cur.get("deadline")
        if deadline is None and not steal_legacy:
            raise ValueError(
                f"maintenance marker at {marker_path} has no lease "
                f"deadline — it was written by a pre-lease version, "
                f"and the job that wrote it may still be running. "
                f"Verify no pre-upgrade maintenance job is alive, then "
                f"re-run with steal_legacy=True to take it over")
        if deadline is not None and float(deadline) > now:
            raise ValueError(
                f"maintenance lease at {marker_path} is held by owner "
                f"{cur.get('owner')} until {deadline} (unix time) — "
                f"another fold is (or very recently was) running; "
                f"re-run after it finishes or after the lease expires")
    owner = uuid.uuid4().hex
    _write_json_sidecar(
        spark, marker_path,
        {**(payload or {}), "owner": owner,
         "deadline": now + float(lease_seconds)})
    return owner


def check_lease(spark: SparkSession, marker_path: str,
                owner: str) -> None:
    """Verify the caller still owns the lease — called immediately
    before the fold's commit point (the pointer flip). A missing marker
    or a different owner means another compactor took over after this
    one's lease expired: abort WITHOUT flipping or deleting anything
    (the takeover run owns the index's future now; this fold's partial
    output is the garbage its cleanup sweeps)."""
    cur = _read_json_sidecar(spark, marker_path)
    if cur is None or cur.get("owner") != owner:
        raise ValueError(
            f"maintenance lease at {marker_path} was lost (now held by "
            f"{None if cur is None else cur.get('owner')}) — another "
            f"compactor took over after this one's lease expired; "
            f"aborting without committing (the takeover run resumes or "
            f"redoes the work)")


def refresh_lease(spark: SparkSession, marker_path: str, owner: str,
                  lease_seconds: float,
                  payload: dict | None = None) -> None:
    """Extend an owned lease (and update its payload — e.g. publish the
    fold's ``folding_through`` snapshot) in one marker write. Refuses if
    the lease was lost, exactly like :func:`check_lease`."""
    check_lease(spark, marker_path, owner)
    _write_json_sidecar(
        spark, marker_path,
        {**(payload or {}), "owner": owner,
         "deadline": time.time() + float(lease_seconds)})


def staging_path(parent: str, ts: int, owner: str) -> str:
    """Owner-unique staging directory for a fold's bulk output: the
    fold WRITES here and only RENAMES to ``seg=<ts>`` after a fresh
    ownership check (:func:`promote_staged`), so a zombie compactor
    whose lease expired mid-write commits its task files into ITS OWN
    staging dir — never into the directory a takeover run will flip.
    The leading underscore keeps Hadoop/Spark listings from ever
    treating it as data."""
    return f"{parent}/_stage_seg={ts}_{owner}"


def sweep_staging(spark: SparkSession, *parents: str) -> None:
    """Delete stale ``_stage_*`` directories under each parent — dead
    fold attempts whose owner lost the lease (or crashed) before
    promoting. Safe while a zombie is still writing to one: the
    zombie's later write may recreate garbage there, but it can never
    promote (its pre-rename ownership check fails), and the next sweep
    removes it again. Only the current lease holder calls this."""
    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )

    for parent in parents:
        fs, _ = _hadoop_fs(spark, parent)
        p = spark._jvm.org.apache.hadoop.fs.Path(parent)
        if not fs.exists(p):
            continue
        for st in fs.listStatus(p):
            if st.getPath().getName().startswith("_stage_"):
                fs.delete(st.getPath(), True)


def promote_staged(spark: SparkSession, marker_path: str, owner: str,
                   renames: list[tuple[str, str]]) -> None:
    """Atomically-enough publish a fold's staged output: verify the
    caller STILL owns the lease, then rename each ``(staged, final)``
    pair into place. A holder that lost its lease aborts here — its
    staging dirs become garbage the next holder's sweep removes — so
    a takeover's final directories can never receive a zombie's
    files. The residual window is one marker read before a
    millisecond-scale rename, the same read-then-write window the
    lease's docstring already documents."""
    from harvesting_extract_to_ttl_service_spark.sources.files import (
        _hadoop_fs,
    )

    check_lease(spark, marker_path, owner)
    for src, dst in renames:
        fs, _ = _hadoop_fs(spark, src)
        jpath = spark._jvm.org.apache.hadoop.fs.Path
        d = jpath(dst)
        if fs.exists(d):
            fs.delete(d, True)
        if not fs.rename(jpath(src), d):
            raise ValueError(
                f"promote_staged: rename {src} -> {dst} failed — the "
                f"filesystem refused the move; the staged output is "
                f"intact, re-run the fold to retry")


def release_lease(spark: SparkSession, marker_path: str,
                  owner: str) -> bool:
    """Delete the marker iff the caller still owns it (a lost lease is
    left for its new owner). Returns whether a delete happened."""
    cur = _read_json_sidecar(spark, marker_path)
    if cur is not None and cur.get("owner") == owner:
        _delete_path(spark, marker_path, False)
        return True
    return False
