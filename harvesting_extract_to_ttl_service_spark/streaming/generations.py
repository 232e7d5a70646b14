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
                  payload: dict | None = None) -> str:
    """Take the maintenance lease at ``marker_path`` and return the
    owner token. A LIVE lease held by someone else refuses loudly. An
    expired lease — or a bare pre-lease marker with no deadline (the
    pre-upgrade ``{"compacting": true}`` form) — is taken over: the
    previous holder is presumed dead and its partial work is resumed by
    the fold's normal crash-recovery logic. ``payload`` keys (e.g.
    ``compacting``/``folding_through``) ride in the same marker file so
    ingest keeps reading them from the one place it always has."""
    now = time.time()
    cur = _read_json_sidecar(spark, marker_path)
    if cur is not None:
        deadline = cur.get("deadline")
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


def release_lease(spark: SparkSession, marker_path: str,
                  owner: str) -> bool:
    """Delete the marker iff the caller still owns it (a lost lease is
    left for its new owner). Returns whether a delete happened."""
    cur = _read_json_sidecar(spark, marker_path)
    if cur is not None and cur.get("owner") == owner:
        _delete_path(spark, marker_path, False)
        return True
    return False
