"""Materialization-point strategy for plans whose subtree feeds two
consumers (self-join sides, valid/error output branches).

Catalyst does not reuse two identical subtrees when it picks a broadcast
strategy for one side (and AQE stage reuse only matches identical
*exchanges*), so the expensive shared stage of a self-join — shingle
hashing, signature aggregation, the Python extraction stage — runs once
per consumer unless the plan is cut at the shared point. HOW to cut is a
fault-tolerance/speed tradeoff the caller owns:

``local_checkpoint``
    Fastest: blocks live on executors, lineage is dropped. An executor
    loss (or dynamic-allocation decommission) AFTER materialization fails
    the job — there is nothing left to recompute from. The right default
    for short interactive jobs and fixed single-node deployments.
``checkpoint``
    Reliable storage (requires ``sc.setCheckpointDir``): survives
    executor loss; pays a write to the checkpoint filesystem. The right
    choice for long multi-stage jobs on a real cluster.
``persist``
    ``MEMORY_AND_DISK`` cache — KEEPS lineage, so a lost block recomputes
    instead of failing the job. Middle ground: no checkpoint dir needed,
    fault-tolerant, but the shared stage can silently re-run on block
    loss and the cache entry lives until ``unpersist()`` (callers running
    inside a long-lived driver should unpersist when done — the SQL cache
    manager pins cached plans, they are not garbage-collected).
``none``
    No cut: the planner may duplicate the subtree. Always correct, can be
    the fastest option when the shared stage is trivially cheap.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

MATERIALIZE_MODES = ("local_checkpoint", "checkpoint", "persist", "none")


def materialize(df: DataFrame, mode: str = "local_checkpoint",
                eager: bool = False) -> DataFrame:
    """Cut (or not) the plan at this point per ``mode`` (see module doc).
    ``eager=False`` defers the work to the first action, so callers that
    never execute a consumer pay nothing (``persist``/``none`` are always
    lazy)."""
    if mode == "local_checkpoint":
        return df.localCheckpoint(eager=eager)
    if mode == "checkpoint":
        return df.checkpoint(eager=eager)
    if mode == "persist":
        from pyspark import StorageLevel

        return df.persist(StorageLevel.MEMORY_AND_DISK)
    if mode == "none":
        return df
    raise ValueError(
        f"unknown materialize mode {mode!r}; one of {MATERIALIZE_MODES}")
