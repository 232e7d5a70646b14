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

import itertools

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MATERIALIZE_MODES = ("local_checkpoint", "checkpoint", "persist", "none")


def codegen_barrier(df: DataFrame, label: str = "barrier") -> DataFrame:
    """Split the whole-stage-codegen unit at this point WITHOUT
    materializing anything (round 15).

    Why it exists: Janino refuses generated methods over 64 KB. A plan
    that fuses two expression-heavy operators — e.g. the import
    pipeline's triage filter (the full validity + repair when-chains)
    and the downstream valid-projection (the same chains, re-inlined by
    CollapseProject/predicate pushdown) — into ONE codegen unit exceeds
    the limit, logs ``ERROR CodeGenerator: Failed to compile`` three
    times per action, and silently falls back to INTERPRETED evaluation
    for the entire fused stage (the verify-skill gotcha). Each half
    compiles fine on its own (triage_dirty_literals carries the same
    24-parser chain in one unit without issue).

    Mechanism: ``observe()`` inserts a CollectMetrics node, which does
    not implement CodegenSupport, so codegen restarts above it — two
    smaller units instead of one oversized one — while rows stream
    through untouched (the observed metric is one ``count(1)`` per
    partition; no shuffle, no buffering, works under foreachBatch).
    Unlike :func:`materialize` modes this is free at any scale.

    Measured on import_pipeline_e2e at sf0.1 (min of 4, interleaved):
    3.89 s with the doomed compiles + interpreted fallback → 2.79 s
    with the barrier, 0 compile failures, byte-identical output.

    The observation name is uniqued per call (a deterministic
    per-process counter, NOT uuid4: plans of logically identical queries
    stay byte-comparable across runs — golden-plan diffs, plan-string
    pins — while two pipeline instances composed into one query still
    can't collide)."""
    return df.observe(f"_{label}_{next(_BARRIER_IDS)}",
                      F.count(F.lit(1)).alias("rows"))


_BARRIER_IDS = itertools.count()


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
