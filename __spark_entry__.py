"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs each
``queries()[name]`` at sf=0.01 and compares it against the matching
``oracle_sql()[name]`` via DuckDB (row-count + schema + order-insensitive
value-hash → CORRECTNESS_r{N}.json).

Implementations live in ``harvesting_extract_to_ttl_service_spark.plans.catalog_*``;
this module just merges the catalogs (SURVEY.md §2 coverage):
  catalog_llm       — §2C dedup / similarity+ANN / text analysis / multimodal
  catalog_extract   — §2A extraction + the composed import pipeline
  catalog_streaming — §2A delta decode + §2C streaming windows/stateful
  catalog_triples   — §2A codec+triage(+compat), §2B star/chain/upsert/semi
  catalog_core      — §2C joins/aggregates/windows/set-ops/scalar/time

The correctness harness verifies at most 50 entries (registration
order), and the merged catalog is kept at EXACTLY 50 via tagged-union
suites (plans/suites.py) — before adding an entry, fold something.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from harvesting_extract_to_ttl_service_spark.plans import (  # noqa: E402
    catalog_core,
    catalog_corpus,
    catalog_extract,
    catalog_llm,
    catalog_streaming,
    catalog_triples,
)

# Order matters: the correctness harness checks entries in registration
# order with a bounded window, so the catalogs whose queries are hardest
# to re-derive (LLM pipeline, extraction, streaming) register first.
# catalog_corpus takes the 50th (final) slot.
_CATALOGS = (catalog_llm, catalog_extract, catalog_streaming,
             catalog_triples, catalog_core, catalog_corpus)


def _utc(fn: Callable[[SparkSession, str], DataFrame]
         ) -> Callable[[SparkSession, str], DataFrame]:
    """Pin the session timezone to UTC before building the plan: the
    catalog's timestamp renderings (date_format) are session-TZ-dependent
    and every oracle assumes UTC; the driver's session may not."""

    def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
        return fn(spark, sf_dir)

    return wrapped


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q5 shape: 6-way join + aggregate) on sf0.001."""
    return _utc(catalog_core.q5_region_revenue)(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    out: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for cat in _CATALOGS:
        out.update({name: _utc(fn) for name, fn in cat.QUERIES.items()})
    return out


def oracle_sql() -> dict[str, str]:
    out: dict[str, str] = {}
    for cat in _CATALOGS:
        out.update(cat.ORACLES)
    return out
