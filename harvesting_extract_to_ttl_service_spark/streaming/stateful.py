"""Custom stateful streaming operator via ``applyInPandasWithState``
(SURVEY.md §2C streaming surface: "custom stateful operators").

Use case mirrored from the reference's control plane: a live per-task
progress tracker. The reference mutates task status in Virtuoso as pages
complete (/root/reference/lib/task.js:158-187) and recovers stale 'busy'
tasks only at restart (lib/task.js:24-63). Here the same bookkeeping is a
keyed state machine over the page-result stream: per key the state holds
(pages_done, triples_total, last_ts) and emits an updated progress row per
micro-batch; keys idle past the timeout are flushed with status 'stale' —
the streaming-native form of the busy→failed sweep.

Scale: state lives in the state store keyed by task — O(active tasks), not
O(pages); timeouts bound staleness without a driver-side sweep.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql import types as T

PROGRESS_SCHEMA = T.StructType([
    T.StructField("task_uri", T.StringType(), False),
    T.StructField("pages_done", T.LongType(), False),
    T.StructField("triples_total", T.LongType(), False),
    T.StructField("status", T.StringType(), False),   # busy | stale
])

_STATE_SCHEMA = T.StructType([
    T.StructField("pages_done", T.LongType(), False),
    T.StructField("triples_total", T.LongType(), False),
])


def _update(key: tuple, pdfs: Iterator[pd.DataFrame],
            state: GroupState) -> Iterator[pd.DataFrame]:
    (task_uri,) = key
    if state.hasTimedOut:
        pages, triples = state.get if state.exists else (0, 0)
        state.remove()
        yield pd.DataFrame([{
            "task_uri": task_uri, "pages_done": pages,
            "triples_total": triples, "status": "stale",
        }])
        return
    pages, triples = state.get if state.exists else (0, 0)
    for pdf in pdfs:
        pages += len(pdf)
        triples += int(pdf["n_triples"].sum())
    state.update((pages, triples))
    state.setTimeoutDuration(60_000)
    yield pd.DataFrame([{
        "task_uri": task_uri, "pages_done": pages,
        "triples_total": triples, "status": "busy",
    }])


def task_progress(page_results: DataFrame) -> DataFrame:
    """Streaming per-task progress: input rows are per-page results
    ``(task_uri, page_uri, n_triples)``; output is one updated progress row
    per task per micro-batch, with idle tasks flushed as 'stale' on the
    processing-time timeout."""
    return (
        page_results.groupBy("task_uri").applyInPandasWithState(
            _update,
            outputStructType=PROGRESS_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


def task_progress_batch(page_results: DataFrame) -> DataFrame:
    """Bounded-data twin (for oracle checks): the same totals computed as a
    plain aggregate — what the streaming state converges to after one pass
    with no timeouts."""
    from pyspark.sql import functions as F

    return (
        page_results.groupBy("task_uri")
        .agg(F.count("*").alias("pages_done"),
             F.sum("n_triples").cast("long").alias("triples_total"),
             F.lit("busy").alias("status"))
    )
