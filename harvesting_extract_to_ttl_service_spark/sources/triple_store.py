"""Parquet-backed triple store partitioned by named graph.

The reference keeps quads in an external Virtuoso store and scopes every
query with ``GRAPH ?g { … }`` (/root/reference/constants.js:33-36 and e.g.
lib/task.js:84). Here the store is a parquet layout:

    <root>/graph=<urlencoded-iri>/part-*.parquet

so a fixed-graph query prunes to one directory at planning time
(PartitionFilters in the scan — verified by test), a wildcard-graph query
scans all partitions with ``graph`` recovered from the path, and writes
append per-graph without touching other graphs' files.

Scale notes: partition by ``graph`` only (graphs are few and large);
within a graph rely on parquet row-group statistics over ``subject`` /
``predicate`` — both benefit from the sort-on-write below, which also
yields good run-length/dictionary compression for predicate-heavy data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.schema import TRIPLE_COLS


def save_triples(df: DataFrame, path: str, mode: str = "append",
                 sort: bool = True) -> None:
    """Write TRIPLE_SCHEMA rows partitioned by graph. ``sort`` clusters by
    (predicate, subject) within partitions so predicate-filtered scans can
    skip row groups on min/max stats."""
    out = df.select(*TRIPLE_COLS)
    out = out.withColumn("graph", F.coalesce("graph", F.lit("urn:g:default")))
    if sort:
        out = out.sortWithinPartitions("predicate", "subject")
    out.write.partitionBy("graph").mode(mode).parquet(path)


def load_triples(spark: SparkSession, path: str,
                 graph: str | None = None) -> DataFrame:
    """Read the store; a fixed graph becomes a partition-pruned scan, a
    wildcard (None) carries the graph column through."""
    df = spark.read.parquet(path).select(*TRIPLE_COLS)
    if graph is not None:
        df = df.filter(F.col("graph") == graph)
    return df


def save_triples_bucketed(df: DataFrame, table: str, buckets: int = 64,
                          mode: str = "overwrite") -> None:
    """Catalog-table variant bucketed by ``subject``: every subject-keyed
    operation — the B3 star pivot, subject self-joins, provenance dedup —
    reads co-located buckets and runs with ZERO exchanges (asserted by
    test). This is the layout for the 100 TB star-join workload; the
    graph-partitioned path layout above is the layout for graph-scoped
    scans — pick per workload, or both (bucket within partition)."""
    (df.select(*TRIPLE_COLS)
       .write.bucketBy(buckets, "subject").sortBy("subject")
       .mode(mode).format("parquet").saveAsTable(table))


def load_bucketed_triples(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
