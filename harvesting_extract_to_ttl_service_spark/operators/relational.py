"""Relational operators over triple DataFrames — the query shapes the
reference delegates to its external SPARQL store (Virtuoso), owned by the
engine (SURVEY.md §2B, B1-B11).

Each function is a thin, composable DataFrame transformation; Catalyst
handles join strategy (the control/metadata triple sets these run over are
small → broadcast), predicate pushdown, and partial aggregation. Graph
scoping (`GRAPH ?g {…}` in every reference query) is a plain column filter.

Scale notes: star/fan-out pivots shuffle once on `subject`; chain joins
shuffle on the join key — at 100 TB the triples table should be stored
partitioned by `graph` and bucketed by `subject` so these become local.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def graph_scope(triples: DataFrame, graph: str | None) -> DataFrame:
    """B11 (e.g. /root/reference/lib/task.js:84): fixed graph → filter;
    wildcard ``GRAPH ?g`` → no filter, the `graph` column rides along."""
    return triples if graph is None else triples.filter(F.col("graph") == graph)


def point_lookup(triples: DataFrame, predicate: str, obj: str,
                 graph: str | None = None) -> DataFrame:
    """B1 (/root/reference/lib/file-helpers.js:20-31): subjects with a
    given (predicate, object), LIMIT 1. Deterministic variant: smallest
    subject (the reference relies on store order; we must not)."""
    return (
        graph_scope(triples, graph)
        .filter((F.col("predicate") == predicate) & (F.col("object_value") == obj))
        .select("subject")
        .orderBy("subject")
        .limit(1)
    )


def object_values(triples: DataFrame, subject: str, predicate: str,
                  graph: str | None = None) -> DataFrame:
    """B2 (/root/reference/lib/file-helpers.js:40-63): SELECT DISTINCT ?o
    for one (subject, predicate)."""
    return (
        graph_scope(triples, graph)
        .filter((F.col("subject") == subject) & (F.col("predicate") == predicate))
        .select("object_value")
        .distinct()
    )


def star_join(triples: DataFrame, predicates: dict[str, str],
              required: list[str] | None = None,
              graph: str | None = None) -> DataFrame:
    """B3 (/root/reference/lib/task.js:83-100): multi-pattern BGP join on a
    shared subject — the reference's task-load query (7 required patterns +
    1 OPTIONAL).

    Instead of one self-join per predicate (N-1 shuffles), pivot once:
    groupBy(subject).pivot(predicate) — a single shuffle regardless of the
    number of patterns. OPTIONAL patterns are simply nullable cells;
    `required` columns are non-null-filtered afterward.

    predicates: {out_col: predicate_iri}
    """
    inv = {v: k for k, v in predicates.items()}
    scoped = graph_scope(triples, graph).filter(
        F.col("predicate").isin(list(predicates.values()))
    )
    pivoted = (
        scoped.groupBy("subject")
        .pivot("predicate", list(predicates.values()))
        .agg(F.min("object_value"))
    )
    for iri, out in inv.items():
        pivoted = pivoted.withColumnRenamed(iri, out)
    if required:
        for col in required:
            pivoted = pivoted.filter(F.col(col).isNotNull())
    return pivoted


def chain_join(triples: DataFrame, start_subject: str, pred1: str, pred2: str,
               out_col: str = "value", graph: str | None = None) -> DataFrame:
    """B4 (/root/reference/lib/pipeline-import.js:129-139): 2-hop chain
    ``<s> p1 ?mid . ?mid p2 ?out`` with DISTINCT — the page-enumeration
    query. The reference paginates this in LIMIT/OFFSET loops of 1000 to
    bound memory (BASELINE.md); a distributed scan needs no pagination, so
    the whole loop collapses into one shuffle."""
    t = graph_scope(triples, graph)
    hop1 = (
        t.filter((F.col("subject") == start_subject) & (F.col("predicate") == pred1))
        .select(F.col("object_value").alias("_mid"))
    )
    hop2 = t.filter(F.col("predicate") == pred2).select(
        F.col("subject").alias("_mid2"), F.col("object_value").alias(out_col)
    )
    return (
        hop1.join(hop2, hop1._mid == hop2._mid2)
        .select(out_col)
        .distinct()
    )


def count_distinct_objects(triples: DataFrame, predicate: str,
                           graph: str | None = None,
                           approx: bool = False) -> DataFrame:
    """B5 (/root/reference/lib/pipeline-import.js:158-178):
    SELECT count(distinct ?page). `approx=True` switches to HLL
    (`approx_count_distinct`) — the right call at 100 TB when the count
    only sizes a loop, as in the reference."""
    agg = (F.approx_count_distinct if approx else F.count_distinct)(
        F.col("object_value")
    )
    return (
        graph_scope(triples, graph)
        .filter(F.col("predicate") == predicate)
        .agg(agg.alias("count"))
    )


def values_filter(df: DataFrame, col: str, allowed: list[str]) -> DataFrame:
    """B6 (/root/reference/lib/task.js:47-50,94-97): SPARQL VALUES
    inline-list → isin."""
    return df.filter(F.col(col).isin(allowed))


def exists(triples: DataFrame, subject: str, predicate: str, obj: str,
           graph: str | None = None) -> bool:
    """B8 (/root/reference/lib/task.js:65-78): ASK-style existence check
    (bound terms → filter + limit 1; general form is a left-semi join)."""
    return bool(
        graph_scope(triples, graph)
        .filter((F.col("subject") == subject)
                & (F.col("predicate") == predicate)
                & (F.col("object_value") == obj))
        .limit(1)
        .count()
    )


def semi_join(left: DataFrame, right: DataFrame, on: list[str] | Column) -> DataFrame:
    """B8 general form: EXISTS → left_semi."""
    return left.join(right, on, "left_semi")


def fan_out(triples: DataFrame, subject: str, predicate: str,
            out_col: str = "value", graph: str | None = None) -> DataFrame:
    """B9 (/root/reference/lib/task.js:110-155): 1-hop hasMany —
    ``<s> p ?o`` for a bound subject."""
    return (
        graph_scope(triples, graph)
        .filter((F.col("subject") == subject) & (F.col("predicate") == predicate))
        .select(F.col("object_value").alias(out_col))
    )


def fan_out_grouped(triples: DataFrame, predicates: list[str],
                    graph: str | None = None) -> DataFrame:
    """B9 one-pass variant: all hasMany edges for many subjects at once —
    groupBy(subject).pivot(predicate).collect_list, sorted for determinism."""
    scoped = graph_scope(triples, graph).filter(F.col("predicate").isin(predicates))
    return (
        scoped.groupBy("subject")
        .pivot("predicate", predicates)
        .agg(F.array_sort(F.collect_list("object_value")))
    )


def upsert(current: DataFrame, updates: DataFrame, key: list[str]) -> DataFrame:
    """B7 (/root/reference/lib/task.js:30-53,164-183): SPARQL
    DELETE+INSERT WHERE — swap rows for matched keys.

    anti-join out the matched old rows, union the new ones. This is the
    engine's MERGE primitive for the task-status lifecycle; on a
    transactional table format it would be MERGE INTO, and the key-ordering
    trick in :func:`latest_by_key` gives the same answer over append-only
    logs without rewriting history.
    """
    updates = updates.select(*current.columns)
    return current.join(updates.select(*key), key, "left_anti").unionByName(updates)


def latest_by_key(log: DataFrame, key: list[str], order_col: str) -> DataFrame:
    """Append-only upsert view: newest row per key wins
    (row_number over (partition by key order by order_col desc) = 1).
    The scalable B7 when status changes are an event log."""
    from pyspark.sql import Window

    w = Window.partitionBy(*key).orderBy(F.col(order_col).desc())
    return (
        log.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def append_rows(table: DataFrame, rows: DataFrame) -> DataFrame:
    """B10 (INSERT DATA, e.g. /root/reference/lib/pipeline-import.js:182-218):
    append constant-built rows."""
    return table.unionByName(rows.select(*table.columns))
