#!/usr/bin/env python
"""Round-15 stage-split profiler: times each expensive catalog query's
component stages through the noop sink (guide §1.4), min-of-N like
bench.py, with job descriptions for UI mapping (§1.5).

Usage: python scripts_r15_profile.py [repeats]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from harvesting_extract_to_ttl_service_spark import get_spark  # noqa: E402
from harvesting_extract_to_ttl_service_spark.plans.tables import load  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEATS = int(sys.argv[1]) if len(sys.argv) > 1 else 3


def timed(spark, name, build):
    best = float("inf")
    for _ in range(REPEATS):
        spark.sparkContext.setJobDescription(name)
        t0 = time.perf_counter()
        build().write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    spark.sparkContext.setJobDescription(None)
    print(f"{name:55s} {best:7.3f}s")
    return best


def main():
    spark = get_spark("profile_r15")
    # same warmup as bench.py
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    (nation.select(F.explode(F.split("n_name", "")).alias("c"),
                   F.md5("n_name").alias("h"))
     .groupBy("c").agg(F.count("*").alias("n"), F.min("h").alias("m"))
     .write.format("noop").mode("overwrite").save())
    nation.alias("a").join(nation.alias("b"), "n_regionkey").count()

    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        minhash_band_index,
        minhash_signature_table,
        minhash_similarity,
        simhash_candidates,
        simhash_table,
    )

    docs = load(spark, SF_DIR, "documents")

    # --- minhash_lsh_pairs split ---
    timed(spark, "minhash: signature_table only",
          lambda: minhash_signature_table(docs))
    timed(spark, "minhash: band_index (sig + band hash)",
          lambda: minhash_band_index(docs))
    timed(spark, "minhash: full similarity (lc + join)",
          lambda: minhash_similarity(docs, threshold=0.3))

    # --- simhash_pairs split ---
    timed(spark, "simhash: simhash_table only",
          lambda: simhash_table(docs))
    timed(spark, "simhash: full candidates",
          lambda: simhash_candidates(docs, bits=60, max_hamming=6, blocks=7))

    # --- import pipeline split ---
    from harvesting_extract_to_ttl_service_spark.operators.extract import (
        extract_pages,
    )
    from harvesting_extract_to_ttl_service_spark.plans.catalog_extract import (
        _N_DOCS,
        _control_graph,
        _page_bodies,
    )
    from harvesting_extract_to_ttl_service_spark.plans.pipeline_import import (
        enumerate_pages,
        load_scheduled_tasks,
        run_import_pipeline,
    )

    pdocs = docs.filter(F.col("doc_id") < _N_DOCS)
    control = _control_graph(pdocs)
    bodies = _page_bodies(pdocs)
    timed(spark, "pipeline: control graph only", lambda: control)
    timed(spark, "pipeline: tasks star join",
          lambda: load_scheduled_tasks(control, "urn:g:jobs"))
    timed(spark, "pipeline: task_pages",
          lambda: enumerate_pages(
              load_scheduled_tasks(control, "urn:g:jobs"), control,
              "urn:g:jobs"))

    def pages_df():
        tasks = load_scheduled_tasks(control, "urn:g:jobs")
        tp = enumerate_pages(tasks, control, "urn:g:jobs")
        return (tp.select("page_uri").distinct()
                .join(bodies.select("page_uri", "url", "html"), "page_uri"))

    timed(spark, "pipeline: pages+bodies join", pages_df)
    timed(spark, "pipeline: + extract_pages (MapInPandas)",
          lambda: extract_pages(pages_df(), with_provenance=True))
    timed(spark, "pipeline: full e2e valid",
          lambda: run_import_pipeline(control, bodies, graph="urn:g:jobs")
          ["valid"].select("task_uri", "subject", "predicate",
                           "object_value", "object_type"))

    # --- text_stats split ---
    from harvesting_extract_to_ttl_service_spark.operators.dedup import (
        spread_for_cpu,
    )
    from harvesting_extract_to_ttl_service_spark.operators.text import (
        annotate_documents,
    )
    timed(spark, "text_stats: full",
          lambda: annotate_documents(spread_for_cpu(docs)))

    # --- triage ---
    import bench
    for name in ("triage_dirty_literals", "q3_shipping_priority",
                 "q5_region_revenue", "b4_chain_join_customer_region",
                 "q1_pricing_summary", "sessionize_events"):
        fn = bench._resolve(name)
        timed(spark, f"catalog: {name}", lambda fn=fn: fn(spark, SF_DIR))


if __name__ == "__main__":
    main()
