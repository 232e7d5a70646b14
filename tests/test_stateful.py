"""Custom stateful streaming operator (applyInPandasWithState): streaming
per-task progress must converge to the batch aggregate on bounded input."""

import pytest
from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.streaming.stateful import (
    task_progress,
    task_progress_batch,
)


def _page_results(spark, tmp_path):
    batch = spark.createDataFrame(
        [("urn:task:1", f"share://p{i}.html", i % 5 + 1) for i in range(10)]
        + [("urn:task:2", "share://q1.html", 7)],
        "task_uri string, page_uri string, n_triples long")
    p = str(tmp_path / "page_results")
    batch.write.parquet(p)
    stream = spark.readStream.schema(batch.schema).parquet(p)
    return stream, batch


@pytest.mark.slow
def test_task_progress_stateful(spark, tmp_path):
    stream, batch = _page_results(spark, tmp_path)
    q = (task_progress(stream).writeStream.format("memory")
         .queryName("t_progress").outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    rows = spark.table("t_progress").collect()
    busy = {(r.task_uri, r.pages_done, r.triples_total)
            for r in rows if r.status == "busy"}
    want = {(r.task_uri, r.pages_done, r.triples_total)
            for r in task_progress_batch(batch).collect()}
    assert busy == want
    assert ("urn:task:1", 10, sum(i % 5 + 1 for i in range(10))) in busy
    # under availableNow the trailing batch fires the processing-time
    # timeout: each task flushes once as 'stale' with the same totals
    stale = {(r.task_uri, r.pages_done, r.triples_total)
             for r in rows if r.status == "stale"}
    assert stale in (set(), want)
