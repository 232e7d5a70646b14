"""Skew-mitigation operators: salted aggregation and salted broadcast-side
replication for hot keys.

AQE's skew-join split (on in session.py) handles most cases at runtime;
these are the explicit forms for when the skew is known ahead of time —
e.g. the provenance subject of a boilerplate page appearing in millions of
triples, or a single graph receiving most writes.

Both produce results identical to their unsalted twins (oracle-checked in
the catalog); only the shuffle key distribution changes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


_MERGE_BY_PREFIX = {"count": F.sum, "sum": F.sum, "min": F.min, "max": F.max}


def salted_agg(df: DataFrame, keys: list[str], aggs: list[Column],
               salt_buckets: int = 16,
               merge: dict[str, object] | None = None) -> DataFrame:
    """Two-phase aggregation with a synthetic salt on the hot key: phase 1
    aggregates (key, salt) — spreading one hot key over ``salt_buckets``
    reducers — phase 2 merges per key. Only works for decomposable
    aggregates.

    The phase-2 merge per output column comes from ``merge`` (alias →
    aggregate fn, e.g. ``{"n": F.sum, "lo": F.min}``). Without ``merge``
    it is inferred from the alias prefix (count→sum, sum→sum, min→min,
    max→max) and anything else raises: a silently-wrong merge (e.g. an
    ``avg`` phase-1 aggregate summed in phase 2) is a correctness bug, not
    a default. Re-express non-decomposable aggregates before salting
    (avg = sum/count over two salted columns).

    With AQE this is rarely needed for joins, but a groupBy on a key where
    one value holds >1 partition's worth of rows still funnels into one
    task — salting is the fix the optimizer cannot apply for you (it cannot
    know the aggregate is the bottleneck before running phase 1).
    """
    salted = df.withColumn(
        "_salt", (F.abs(F.xxhash64(*keys, F.monotonically_increasing_id()))
                  % salt_buckets))
    phase1 = salted.groupBy(*keys, "_salt").agg(*aggs)

    merged_aggs = []
    for c in phase1.columns:
        if c in keys or c == "_salt":
            continue
        if merge is not None and c in merge:
            fn = merge[c]
        else:
            fn = _MERGE_BY_PREFIX.get(c.split("_", 1)[0])
            if fn is None:
                raise ValueError(
                    f"salted_agg cannot infer a phase-2 merge for column "
                    f"{c!r}: pass merge={{{c!r}: <agg fn>}} or alias the "
                    f"phase-1 aggregate with a count_/sum_/min_/max_ prefix")
        merged_aggs.append(fn(c).alias(c))
    return phase1.groupBy(*keys).agg(*merged_aggs)


def replicate_broadcast_join(big: DataFrame, small: DataFrame,
                             key: str, salt_buckets: int = 8) -> DataFrame:
    """Salted equi-join for a skewed big side: the big side gets a random
    salt in [0, buckets), the small side is replicated once per salt value,
    and the join key becomes (key, salt) — one hot key now lands on
    ``salt_buckets`` reducers instead of one. Row multiplicity is
    unchanged (each big row matches exactly its salt's replica)."""
    b = big.withColumn(
        "_salt", (F.abs(F.xxhash64(F.col(key),
                                   F.monotonically_increasing_id()))
                  % salt_buckets))
    salts = F.explode(
        F.sequence(F.lit(0), F.lit(salt_buckets - 1)).cast("array<long>"))
    s = small.withColumn("_salt", salts)
    return b.join(s, [key, "_salt"]).drop("_salt")
