"""Tagged-union composite catalog entries ("suites").

The correctness harness verifies a bounded number of catalog entries, so
closely-related operator demos fold into ONE tagged-union entry: every
member query keeps its own (unchanged) plan and its rows stay fully
value-hashed — the union just frees entries for operators that need
standalone verification.

Coercion contract (must match between engines, so keep it dumb):
  * ``part``   — literal member tag;
  * ``k``      — '|'-joined string key from the member's string/integer
                 columns, NULLs → ``@NULL@`` (both engines render integers
                 identically as strings; doubles never enter ``k``);
  * ``v1..v3`` — the member's double columns (already rounded by the
                 member query so summation order can't flip the hash),
                 missing slots NULL.

A member is declared as ``(part, fn, k_cols, v_cols)`` where ``fn`` was
decorated with ``@member_sql(...)`` to carry its oracle SQL; ``suite_df``
unions the coerced Spark results, ``suite_sql`` wraps each member's oracle
SQL as a subquery with the same coercion, so both sides stay in lockstep
by construction.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

NULL_MARK = "@NULL@"
_V_SLOTS = 3

Member = tuple[str, Callable[[SparkSession, str], DataFrame],
               list[str], list[str]]


def member_sql(oracle: str):
    """Attach the member's oracle SQL to its query function (read by
    ``suite_sql``) without registering it as a standalone catalog entry."""

    def deco(fn):
        fn.oracle_sql = oracle
        return fn

    return deco


def _coerce_df(df: DataFrame, part: str, k_cols: list[str],
               v_cols: list[str]) -> DataFrame:
    assert len(v_cols) <= _V_SLOTS
    sel = [
        F.lit(part).alias("part"),
        F.concat_ws("|", *[
            F.coalesce(F.col(c).cast("string"), F.lit(NULL_MARK))
            for c in k_cols
        ]).alias("k"),
    ]
    for i in range(_V_SLOTS):
        col = (F.col(v_cols[i]).cast("double") if i < len(v_cols)
               else F.lit(None).cast("double"))
        sel.append(col.alias(f"v{i + 1}"))
    return df.select(*sel)


def suite_df(spark: SparkSession, sf_dir: str,
             members: list[Member]) -> DataFrame:
    out: DataFrame | None = None
    for part, fn, k_cols, v_cols in members:
        d = _coerce_df(fn(spark, sf_dir), part, k_cols, v_cols)
        out = d if out is None else out.unionByName(d)
    assert out is not None
    return out


def suite_sql(members: list[Member]) -> str:
    parts = []
    for part, fn, k_cols, v_cols in members:
        sql = getattr(fn, "oracle_sql", None)
        assert sql is not None, f"suite member {part} has no oracle SQL"
        ks = ", ".join(
            f"coalesce(CAST({c} AS VARCHAR), '{NULL_MARK}')" for c in k_cols)
        vs = ", ".join(
            (f"CAST({v_cols[i]} AS DOUBLE) AS v{i + 1}" if i < len(v_cols)
             else f"CAST(NULL AS DOUBLE) AS v{i + 1}")
            for i in range(_V_SLOTS))
        parts.append(
            f"SELECT '{part}' AS part, concat_ws('|', {ks}) AS k, {vs}\n"
            f"FROM (\n{sql}\n) AS _{part}")
    return "\nUNION ALL\n".join(parts)
