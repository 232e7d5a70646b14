#!/usr/bin/env python
"""Driver bench contract: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line:

    {"metric": "headline_wall_sec", "value": N, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is executed to completion through the `noop` sink (full plan
runs — scan, shuffle, aggregate — but no driver-side collect, so the
measurement is engine time, not result-transfer time).
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from harvesting_extract_to_ttl_service_spark import get_spark  # noqa: E402
import __spark_entry__ as entry_mod  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Representative slice of SURVEY.md §2: relational core (scan/agg, joins,
# windows, sessionize, as-of/range), triple-store shapes (codec+triage,
# star/chain joins), and the LLM-pipeline operators (dedup, LSH, ANN, text).
HEADLINE = [
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q5_region_revenue",
    "q6_forecast_revenue",
    "segment_order_stats",
    "window_top3_orders_per_customer",
    "sessionize_events",
    "asof_join_signup_purchase",
    "range_join_error_burst",
    "triage_dirty_literals",
    "b3_star_join_customers",
    "b4_chain_join_customer_region",
    "dedup_exact_docs",
    "minhash_lsh_pairs",
    "simhash_pairs",
    "embedding_cosine_topk",
    "text_stats",
    "rdfa_extract_docs",
    "import_pipeline_e2e",
]


def _sf_from_dir(d: str) -> float:
    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else -1.0


def _resolve(name):
    """Headline queries stay individually timed across rounds even when
    their catalog entry folded into a tagged-union suite: fall back to the
    (still-present) member function on the catalog module."""
    queries = entry_mod.queries()
    if name in queries:
        return queries[name]
    for cat in entry_mod._CATALOGS:
        if hasattr(cat, name):
            return getattr(cat, name)
    raise KeyError(name)


def main() -> None:
    spark = get_spark("bench")
    # Warm the JVM before timing: session startup, Janino/whole-stage
    # codegen classloading, shuffle + Arrow machinery. Uses the tiny
    # nation table and throwaway expressions — no headline query (or its
    # compiled plan) is pre-run, so each measured number still includes
    # its own plan's analysis+codegen cost.
    from pyspark.sql import functions as F
    nation = spark.read.parquet(f"{SF_DIR}/nation.parquet")
    (nation.select(F.explode(F.split("n_name", "")).alias("c"),
                   F.md5("n_name").alias("h"))
     .groupBy("c").agg(F.count("*").alias("n"), F.min("h").alias("m"))
     .write.format("noop").mode("overwrite").save())
    nation.alias("a").join(nation.alias("b"), "n_regionkey").count()

    # Each query runs REPEATS times and reports the min: a single
    # contended run on a noisy driver machine can otherwise masquerade as
    # a multi-x regression (r02 recorded 4.7x on sessionize_events that a
    # controlled rerun could not reproduce; round-5 controlled reruns of
    # an identical tree spread 17.9-20.8 s total). Min-of-3 still pays
    # each plan's own analysis+codegen cost on the first run, so the
    # reported number reflects steady-state engine time.
    repeats = int(os.environ.get("SPARK_GRAFT_BENCH_REPEATS", "3"))
    per_query: dict[str, float] = {}
    total = 0.0
    for name in HEADLINE:
        fn = _resolve(name)
        best = float("inf")
        for _ in range(repeats):
            t0 = time.perf_counter()
            fn(spark, SF_DIR).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        per_query[name] = round(best, 3)
        total += best

    print(json.dumps({
        "metric": "headline_wall_sec",
        "value": round(total, 3),
        "unit": "sec",
        "queries": per_query,
        "sf": _sf_from_dir(SF_DIR),
        "runs_per_query": repeats,
    }))


if __name__ == "__main__":
    main()
