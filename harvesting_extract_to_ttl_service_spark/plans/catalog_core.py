"""Core relational query catalog: SURVEY.md §2C joins / aggregates /
windows / set-ops / scalar fns / time buckets over the TPC-H-ish fixtures,
each paired with an ANSI-SQL DuckDB oracle.

Conventions (driver contract, /root/repo/__spark_entry__.py):
  * every computed column aliased identically in Spark and SQL;
  * double aggregates rounded (2 dp money, 4 dp ratios) so
    floating-point summation order can't flip the value hash;
  * timestamps rendered as strings (Spark reads the fixture timestamps as
    NTZ; DuckDB as naive — string rendering is identical).

Scale notes are inline — each query states its shuffle/broadcast shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.plans.suites import (
    member_sql,
    suite_df,
    suite_sql,
)
from harvesting_extract_to_ttl_service_spark.plans.tables import load

QUERIES = {}
ORACLES = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


# --------------------------------------------------------------------------
# TPC-H-style aggregates & joins
# --------------------------------------------------------------------------

@q("q1_pricing_summary", """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)                                   AS sum_qty,
       round(sum(l_extendedprice), 2)                              AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)           AS sum_disc_price,
       round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
       round(avg(l_quantity), 4)                                   AS avg_qty,
       round(avg(l_extendedprice), 4)                              AS avg_price,
       round(avg(l_discount), 4)                                   AS avg_disc,
       count(*)                                                    AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
""")
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape. One scan + one partial/final hash aggregate on a
    6-group key — Catalyst plans map-side combine; no join."""
    li = load(spark, sf_dir, "lineitem")
    disc = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc), 2).alias("sum_disc_price"),
            F.round(F.sum(disc * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@q("q3_shipping_priority", """
SELECT l_orderkey,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       strftime(o_orderdate, '%Y-%m-%d')                 AS orderdate,
       o_orderpriority
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY l_orderkey, o_orderdate, o_orderpriority
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""")
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join fact → top-k.
    customer is the small side → broadcast; lineitem⋈orders shuffles on
    orderkey; final top-10 is TakeOrdered (no global sort)."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderdate") < "1998-03-15")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > "1998-03-15")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
        .select("l_orderkey", "revenue",
                F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
                "o_orderpriority")
        .orderBy(F.col("revenue").desc(), "l_orderkey")
        .limit(10)
    )


@q("q5_region_revenue", """
SELECT n_name, round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
FROM customer JOIN orders   ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
              JOIN nation   ON s_nationkey = n_nationkey
              JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'EUROPE'
  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY n_name
""")
def q5_region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join. nation/region/supplier are small →
    broadcast; the only shuffles are lineitem⋈orders (orderkey) and the
    customer join (custkey). Flagship query (`entry`)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01") & (F.col("o_orderdate") < "1998-01-01"))
    li = load(spark, sf_dir, "lineitem")
    s = load(spark, sf_dir, "supplier")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(s), (li.l_suppkey == s.s_suppkey)
              & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("n_name")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"))
    )


@q("q6_forecast_revenue", """
SELECT round(sum(l_extendedprice * l_discount), 2) AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
  AND l_discount BETWEEN 0.03 AND 0.07
  AND l_quantity < 24
""")
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure scan+filter+agg — every predicate pushes to parquet."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter((F.col("l_shipdate") >= "1997-01-01")
                  & (F.col("l_shipdate") < "1998-01-01")
                  & (F.col("l_discount").between(0.03, 0.07))
                  & (F.col("l_quantity") < 24))
        .agg(F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2)
             .alias("revenue"))
    )


@member_sql("""
SELECT c_custkey, c_name,
       round(sum(o_totalprice), 2) AS total_spent,
       count(*)                    AS n_orders
FROM customer JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey, c_name
ORDER BY total_spent DESC, c_custkey
LIMIT 25
""")
def top_customers_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.round(F.sum("o_totalprice"), 2).alias("total_spent"),
             F.count("*").alias("n_orders"))
        .orderBy(F.col("total_spent").desc(), "c_custkey")
        .limit(25)
    )


@member_sql("""
SELECT c_mktsegment,
       count(*)                     AS n_orders,
       round(sum(o_totalprice), 2)  AS total,
       round(avg(o_totalprice), 4)  AS avg_price,
       count(DISTINCT o_custkey)    AS n_customers
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""")
def segment_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact⋈broadcast-dim + multi-agg incl. count distinct."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = load(spark, sf_dir, "orders")
    return (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .agg(F.count("*").alias("n_orders"),
             F.round(F.sum("o_totalprice"), 2).alias("total"),
             F.round(F.avg("o_totalprice"), 4).alias("avg_price"),
             F.count_distinct("o_custkey").alias("n_customers"))
    )


# --------------------------------------------------------------------------
# Window functions
# --------------------------------------------------------------------------

@member_sql("""
SELECT o_custkey, o_orderkey, rank, round(o_totalprice, 2) AS totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rank
  FROM orders
) WHERE rank <= 3
""")
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group: one shuffle on the partition key; rank prunes
    before anything else touches the rows."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.col("o_totalprice").desc(),
                                                F.col("o_orderkey"))
    return (
        o.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("o_custkey", "o_orderkey", "rank",
                F.round("o_totalprice", 2).alias("totalprice"))
    )


@member_sql("""
SELECT l_suppkey, l_orderkey, l_linenumber,
       round(sum(l_extendedprice) OVER (
         PARTITION BY l_suppkey
         ORDER BY l_shipdate, l_orderkey, l_linenumber
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_revenue
FROM lineitem
WHERE l_suppkey % 50 = 0
""")
def window_running_supplier_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running sum with a total (unique-key) ordering so the frame is
    deterministic."""
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_suppkey") % 50 == 0)
    w = (Window.partitionBy("l_suppkey")
         .orderBy("l_shipdate", "l_orderkey", "l_linenumber")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return li.select(
        "l_suppkey", "l_orderkey", "l_linenumber",
        F.round(F.sum("l_extendedprice").over(w), 2).alias("running_revenue"))


@member_sql("""
SELECT o_custkey, o_orderkey,
       date_diff('day',
                 lag(o_orderdate) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey),
                 o_orderdate) AS gap_days
FROM orders
WHERE o_custkey % 10 = 0
""")
def window_order_gap_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") % 10 == 0)
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderdate").over(w)
    return o.select(
        "o_custkey", "o_orderkey",
        F.datediff(F.col("o_orderdate"), prev).cast("long").alias("gap_days"))


@member_sql("""
WITH flagged AS (
  SELECT user_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
                OR date_diff('second', lag(ts) OVER w, ts) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sess AS (
  SELECT user_id,
         sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id, count(DISTINCT session_id) AS n_sessions,
       round(CAST(count(*) AS DOUBLE) / count(DISTINCT session_id), 4)
         AS avg_events_per_session
FROM sess GROUP BY user_id
""")
def sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization (30-min gap): lag + cumulative-sum session ids
    — the batch twin of streaming `session_window` (streaming/ module)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = (Window.partitionBy("user_id").orderBy("ts")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    gap = F.col("ts").cast("long") - F.lag(F.col("ts")).over(w).cast("long")
    flagged = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), F.lit(1)).otherwise(F.lit(0)))
    sess = flagged.withColumn("session_id", F.sum("new_session").over(wrun))
    # count_distinct(session_id) == max(session_id), provably: session_id
    # is a running sum of 0/1 flags whose first value per user is 1 (the
    # lag is NULL), so per user its image is exactly {1..K} — and K (the
    # max) is the total flag sum, invariant under ts-tie orderings. max()
    # is a plain aggregate (map-side partial, no distinct expansion), so
    # the groupBy reuses the window's user_id partitioning with no extra
    # pass (round 16, guide §2.4; oracle stays count(DISTINCT ...) and
    # hashes identical).
    return (
        sess.groupBy("user_id")
        .agg(F.max("session_id").alias("n_sessions"),
             F.round(F.count("*") / F.max("session_id"), 4)
             .alias("avg_events_per_session"))
    )


# --------------------------------------------------------------------------
# Rollup / cube / pivot / set ops
# --------------------------------------------------------------------------

@member_sql("""
SELECT l_returnflag, l_linestatus,
       grouping(l_returnflag, l_linestatus) AS gid,
       round(sum(l_quantity), 2) AS sum_qty, count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""")
def rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.grouping_id().alias("gid"),
             F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
             F.count("*").alias("n"))
        .select("l_returnflag", "l_linestatus", "gid", "sum_qty", "n")
    )


@member_sql("""
SELECT o_orderstatus, o_orderpriority,
       grouping(o_orderstatus, o_orderpriority) AS gid,
       count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
""")
def cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load(spark, sf_dir, "orders")
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(F.grouping_id().alias("gid"),
             F.count("*").alias("n"),
             F.round(F.sum("o_totalprice"), 2).alias("total"))
        .select("o_orderstatus", "o_orderpriority", "gid", "n", "total")
    )


@member_sql("""
SELECT c_mktsegment,
       round(coalesce(sum(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 0), 2) AS status_o,
       round(coalesce(sum(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 0), 2) AS status_f,
       round(coalesce(sum(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 0), 2) AS status_p
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment
""")
def pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = load(spark, sf_dir, "orders")
    piv = (
        o.join(F.broadcast(c), o.o_custkey == c.c_custkey)
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["O", "F", "P"])
        .agg(F.sum("o_totalprice"))
    )
    return piv.select(
        "c_mktsegment",
        F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("status_o"),
        F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("status_f"),
        F.round(F.coalesce(F.col("P"), F.lit(0.0)), 2).alias("status_p"))


@q("setop_active_rich_customers", """
SELECT c_custkey FROM customer WHERE c_acctbal > 5000
INTERSECT
SELECT o_custkey AS c_custkey FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_orderstatus = 'F'
""")
def setop_active_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT/EXCEPT — Catalyst executes both as aggregated joins
    (left-semi / left-anti on distinct sets)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    rich = c.filter(F.col("c_acctbal") > 5000).select("c_custkey")
    active = (
        o.filter((F.col("o_orderdate") >= "1997-01-01")
                 & (F.col("o_orderdate") < "1998-01-01"))
        .select(F.col("o_custkey").alias("c_custkey")))
    failed = (o.filter(F.col("o_orderstatus") == "F")
              .select(F.col("o_custkey").alias("c_custkey")))
    return rich.intersect(active).exceptAll(failed.distinct()).distinct()


# --------------------------------------------------------------------------
# Scalar functions / JSON / time buckets
# --------------------------------------------------------------------------

@member_sql("""
SELECT event_type,
       count(*)                                        AS n,
       CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
       round(avg(value), 4)                            AS avg_value
FROM events
GROUP BY event_type
""")
def json_event_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON scalar extraction (`get_json_object`) stays JVM-side."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(F.count("*").alias("n"),
             F.sum(F.get_json_object("props", "$.k").cast("long")).alias("sum_k"),
             F.round(F.avg("value"), 4).alias("avg_value"))
    )


@member_sql("""
SELECT p_partkey,
       upper(substr(p_name, 1, 8))                       AS name_prefix,
       length(p_name)                                    AS name_len,
       concat(p_brand, ':', p_type)                      AS brand_type,
       replace(p_type, ' ', '_')                         AS type_slug,
       round(p_retailprice * 1.1, 2)                     AS marked_up
FROM part WHERE p_partkey % 20 = 0
""")
def part_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = load(spark, sf_dir, "part").filter(F.col("p_partkey") % 20 == 0)
    return p.select(
        "p_partkey",
        F.upper(F.substring("p_name", 1, 8)).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.concat_ws(":", "p_brand", "p_type").alias("brand_type"),
        F.replace(F.col("p_type"), F.lit(" "), F.lit("_")).alias("type_slug"),
        F.round(F.col("p_retailprice") * 1.1, 2).alias("marked_up"))


@member_sql("""
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour_start,
       event_type, count(*) AS n, round(sum(value), 2) AS total_value
FROM events
GROUP BY 1, 2
""")
def event_time_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1h aggregation — the batch twin of the streaming
    tumbling-window query (streaming/windows.py)."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.date_format(F.date_trunc("hour", "ts"),
                                "yyyy-MM-dd HH:mm:ss").alias("hour_start"),
                  "event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 2).alias("total_value"))
    )


@member_sql("""
SELECT strftime(make_timestamp(CAST((floor(epoch(ts) / 1800) - off.o) * 1800 AS BIGINT)
                               * 1000000),
                '%Y-%m-%d %H:%M:%S') AS window_start,
       count(*) AS n
FROM events CROSS JOIN (VALUES (0), (1)) off(o)
GROUP BY 1
""")
def event_sliding_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1h size / 30min slide) in batch: `F.window`
    assigns each event to its ⌈size/slide⌉ = 2 windows."""
    e = load(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(F.date_format(F.col("w.start"), "yyyy-MM-dd HH:mm:ss")
                .alias("window_start"), "n")
    )


@member_sql("""
SELECT p.event_id, p.user_id,
       strftime(max(s.ts), '%Y-%m-%d %H:%M:%S') AS last_signup_ts
FROM events p LEFT JOIN events s
  ON s.user_id = p.user_id AND s.event_type = 'signup' AND s.ts <= p.ts
WHERE p.event_type = 'purchase'
GROUP BY p.event_id, p.user_id
""")
def asof_join_signup_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (Spark has no native one): union both streams, sort
    within user, carry the last signup ts forward with
    last(ignorenulls) — one shuffle on user_id, no O(n²) pair join.
    The oracle states the same semantics as join+max."""
    e = load(spark, sf_dir, "events")
    tagged = e.filter(F.col("event_type").isin("signup", "purchase")).select(
        "event_id", "user_id", "ts", "event_type",
        F.when(F.col("event_type") == "signup", F.col("ts")).alias("signup_ts"))
    w = (Window.partitionBy("user_id")
         .orderBy(F.col("ts"),
                  F.when(F.col("event_type") == "signup", F.lit(0)).otherwise(F.lit(1)),
                  F.col("event_id"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = tagged.withColumn(
        "last_signup", F.last("signup_ts", ignorenulls=True).over(w))
    return (
        carried.filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id",
                F.date_format("last_signup", "yyyy-MM-dd HH:mm:ss")
                .alias("last_signup_ts"))
    )


@member_sql("""
SELECT e.event_id, count(f.event_id) AS events_within_1h
FROM events e LEFT JOIN events f
  ON f.user_id = e.user_id AND f.ts > e.ts
 AND f.ts <= e.ts + INTERVAL 1 HOUR
WHERE e.event_type = 'error'
GROUP BY e.event_id
""")
def range_join_error_burst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) join: equi on user_id + range on ts. Catalyst executes
    the equi part as the join key and the range as a post-filter, so the
    pair space is bounded per user."""
    e = load(spark, sf_dir, "events")
    err = e.filter(F.col("event_type") == "error").select(
        F.col("event_id").alias("e_id"), F.col("user_id").alias("e_user"),
        F.col("ts").alias("e_ts"))
    f = e.select(F.col("event_id").alias("f_id"), F.col("user_id").alias("f_user"),
                 F.col("ts").alias("f_ts"))
    return (
        err.join(f, (F.col("f_user") == F.col("e_user"))
                 & (F.col("f_ts") > F.col("e_ts"))
                 & (F.col("f_ts") <= F.col("e_ts") + F.expr("INTERVAL 1 HOUR")),
                 "left")
        .groupBy(F.col("e_id").alias("event_id"))
        .agg(F.count("f_id").alias("events_within_1h"))
    )


@member_sql("""
SELECT user_id, event_type, event_id AS first_event_id
FROM (
  SELECT user_id, event_type, event_id,
         row_number() OVER (PARTITION BY user_id, event_type
                            ORDER BY ts, event_id) AS rn
  FROM events
) WHERE rn = 1
""")
def dedup_events_first_per_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keyed dedup keeping the earliest row — the deterministic batch twin
    of streaming dropDuplicates-within-watermark."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", F.col("event_id").alias("first_event_id"))
    )


# --------------------------------------------------------------------------
# Outer/anti joins, grouping sets, approximate aggregates
# --------------------------------------------------------------------------

@member_sql("""
SELECT c_custkey, c_mktsegment,
       count(o_orderkey)                        AS n_orders,
       round(coalesce(sum(o_totalprice), 0), 2) AS total
FROM customer LEFT JOIN orders
  ON c_custkey = o_custkey AND o_orderstatus = 'O'
WHERE c_custkey % 10 = 0
GROUP BY c_custkey, c_mktsegment
""")
def left_join_customer_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join with a join-side predicate: customers keep their row
    (zero counts) when no open order matches — the null-extension semantics
    the equi-join catalog entries don't cover."""
    c = load(spark, sf_dir, "customer").filter(F.col("c_custkey") % 10 == 0)
    o = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "O")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey", "c_mktsegment")
        .agg(F.count("o_orderkey").alias("n_orders"),
             F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2)
             .alias("total"))
    )


@member_sql("""
SELECT c_custkey, c_mktsegment FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
""")
def anti_join_customers_no_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT EXISTS → left-anti join (the complement of B8's semi-join)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").select(F.col("o_custkey").alias("c_custkey"))
    return c.join(o, "c_custkey", "left_anti").select("c_custkey", "c_mktsegment")


@member_sql("""
SELECT coalesce(c.nk, s.nk) AS nationkey,
       coalesce(n_cust, 0)  AS n_cust,
       coalesce(n_supp, 0)  AS n_supp
FROM (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer
      WHERE c_acctbal > 9000 GROUP BY c_nationkey) c
FULL OUTER JOIN
     (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier
      GROUP BY s_nationkey) s
ON c.nk = s.nk
""")
def full_outer_nation_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join: nations with only rich customers, only suppliers,
    or both — null-extension on both sides."""
    c = (load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
         .groupBy(F.col("c_nationkey").alias("nk_c"))
         .agg(F.count("*").alias("n_cust")))
    s = (load(spark, sf_dir, "supplier")
         .groupBy(F.col("s_nationkey").alias("nk_s"))
         .agg(F.count("*").alias("n_supp")))
    return (
        c.join(s, c.nk_c == s.nk_s, "full_outer")
        .select(F.coalesce("nk_c", "nk_s").alias("nationkey"),
                F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
                F.coalesce("n_supp", F.lit(0)).alias("n_supp"))
    )


@member_sql("""
SELECT o_orderstatus, o_orderpriority,
       count(*) AS n, round(sum(o_totalprice), 2) AS total
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                        (o_orderstatus, o_orderpriority))
""")
def grouping_sets_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (beyond rollup/cube): Spark SQL form —
    Catalyst expands to one Expand + single aggregate, not three scans."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("_gs_orders")
    return spark.sql("""
        SELECT o_orderstatus, o_orderpriority,
               count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM _gs_orders
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority),
                                (o_orderstatus, o_orderpriority))
    """)


@q("approx_distinct_customers")  # HLL estimate: rows-only (no exact oracle)
def approx_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the at-scale form of B5's
    COUNT(DISTINCT): constant memory per partition, no exact shuffle of
    the distinct set. Estimate ⇒ rows-only driver check; the exact twin
    (segment_order_stats, b5_count_distinct_nations) is oracle-checked."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_orderstatus")
        .agg(F.approx_count_distinct("o_custkey", 0.02).alias("approx_customers"),
             F.count_distinct("o_custkey").alias("exact_customers"))
        .withColumn("rel_err",
                    F.round(F.abs(F.col("approx_customers")
                                  - F.col("exact_customers"))
                            / F.col("exact_customers"), 4))
    )


@member_sql("""
SELECT k AS prop_key,
       count(*)                            AS n,
       CAST(sum(CAST(v AS BIGINT)) AS BIGINT) AS sum_v
FROM (SELECT unnest(json_keys(props::JSON))                        AS k,
             json_extract_string(props::JSON, unnest(json_keys(props::JSON))) AS v
      FROM events)
GROUP BY k
""")
def json_map_explode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """events.props as a real MapType via from_json (SURVEY.md §1.5) —
    schema-on-read into map<string,string>, exploded to key rows, grouped.
    Unlike get_json_object this handles arbitrary keys, not fixed paths."""
    e = load(spark, sf_dir, "events")
    m = F.from_json("props", "map<string,string>")
    return (
        e.select(F.explode(m).alias("prop_key", "v"))
        .groupBy("prop_key")
        .agg(F.count("*").alias("n"),
             F.sum(F.col("v").cast("long")).alias("sum_v"))
    )


@member_sql("""
SELECT o_orderstatus,
       count(*)                    AS count_n,
       round(sum(o_totalprice), 2) AS sum_total
FROM orders GROUP BY o_orderstatus
""")
def salted_status_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salted two-phase aggregation on a deliberately skewed key (orders
    has ~3 status values → 3 reducers unsalted). Result is identical to
    the plain groupBy — only the phase-1 shuffle key distribution differs."""
    from harvesting_extract_to_ttl_service_spark.operators.skew import salted_agg

    o = load(spark, sf_dir, "orders")
    out = salted_agg(
        o, ["o_orderstatus"],
        [F.count("*").alias("count_n"), F.sum("o_totalprice").alias("sum_total")],
        salt_buckets=16,
    )
    return out.select("o_orderstatus", "count_n",
                      F.round("sum_total", 2).alias("sum_total"))


@member_sql("""
SELECT n_name, count(*) AS n_cust
FROM customer JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
""")
def salted_replicated_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Salt-and-replicate join (hot big-side key spread over 8 reducers,
    small side replicated per salt). Row multiplicity must be unchanged
    vs the plain join — that is exactly what the oracle asserts."""
    from harvesting_extract_to_ttl_service_spark.operators.skew import (
        replicate_broadcast_join,
    )

    c = (load(spark, sf_dir, "customer")
         .select(F.col("c_nationkey").alias("nk")))
    n = (load(spark, sf_dir, "nation")
         .select(F.col("n_nationkey").alias("nk"), "n_name"))
    return (replicate_broadcast_join(c, n, "nk", salt_buckets=8)
            .groupBy("n_name").agg(F.count("*").alias("n_cust")))


def _bucketed_table(spark: SparkSession, sf_dir: str, table: str, key: str,
                    buckets: int = 8) -> DataFrame:
    """Materialize a fixture table bucketed+sorted by its join key in the
    session warehouse (idempotent per session+sf). Bucketing is the
    pre-shuffle: co-bucketed tables join with no Exchange — at 100 TB
    this turns the recurring orders⋈lineitem shuffle into a one-time
    layout cost, same trick as the subject-bucketed triple store
    (sources/triple_store.py)."""
    import hashlib
    import os
    import shutil
    from urllib.parse import urlparse

    tag = hashlib.md5(sf_dir.encode()).hexdigest()[:8]
    name = f"{table}_bkt{buckets}_{tag}"
    if not spark.catalog.tableExists(name):
        # A prior session may have left the managed location on disk with no
        # catalog entry (fresh in-memory catalog + default warehouse in cwd),
        # in which case CREATE fails with LOCATION_ALREADY_EXISTS regardless
        # of mode("overwrite"). Clear both the entry and the stale directory.
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        warehouse = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse")
        parsed = urlparse(warehouse)
        wh_path = parsed.path if parsed.scheme in ("file", "") else None
        if wh_path:
            shutil.rmtree(os.path.join(wh_path, name), ignore_errors=True)
        (load(spark, sf_dir, table).write
         .bucketBy(buckets, key).sortBy(key)
         .mode("overwrite").format("parquet").saveAsTable(name))
    return spark.table(name)


@q("bucketed_join_order_revenue", """
SELECT o_orderstatus,
       round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       count(*) AS n_items
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderstatus
""")
def bucketed_join_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zero-exchange fact⋈fact join: orders and lineitem co-bucketed on
    orderkey, merge-join hint so the co-location (not a broadcast) is
    what the plan exploits. Only the 3-row final aggregate shuffles —
    tests/test_plans.py pins exchange-count ≤ 1. Result is layout-
    independent, which is exactly what the oracle asserts."""
    o = _bucketed_table(spark, sf_dir, "orders", "o_orderkey")
    li = _bucketed_table(spark, sf_dir, "lineitem", "l_orderkey")
    return (
        li.hint("merge").join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderstatus")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
             .alias("revenue"),
             F.count("*").alias("n_items"))
    )


@q("q2_min_cost_supplier", """
WITH unit AS (
  SELECT l_partkey, l_suppkey, min(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
), best AS (
  SELECT l_partkey AS b_partkey, min(unit_cost) AS min_cost
  FROM unit GROUP BY l_partkey
)
SELECT p_partkey, p_brand, s_suppkey, s_name,
       round(unit_cost, 2)  AS min_unit_cost,
       round(s_acctbal, 2)  AS acctbal
FROM unit
JOIN best     ON l_partkey = b_partkey AND unit_cost = min_cost
JOIN part     ON p_partkey = l_partkey
JOIN supplier ON s_suppkey = l_suppkey
WHERE p_size <= 10
ORDER BY acctbal DESC, p_partkey, s_suppkey
LIMIT 20
""")
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (correlated MIN subquery): cheapest supplier per
    part, decorated and top-k'd. The fixtures have no partsupp table, so
    unit cost is derived from lineitem (reference delegates all querying
    to SPARQL — SURVEY.md §2B; this is the min-per-group join shape).

    Scale: the per-(part,supp) aggregate and the per-part min reuse the
    same partkey-prefixed shuffle key; the min side re-joins on
    (partkey, exact double) — IEEE division is bit-identical across
    engines, so the equality is safe (rounding happens only on output).
    part/supplier are dims → broadcast. Top-20 is TakeOrdered."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_size") <= 10)
    s = load(spark, sf_dir, "supplier")
    unit = (li.groupBy("l_partkey", "l_suppkey")
            .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity"))
                 .alias("unit_cost")))
    best = (unit.groupBy(F.col("l_partkey").alias("b_partkey"))
            .agg(F.min("unit_cost").alias("min_cost")))
    return (
        unit.join(best, (unit.l_partkey == best.b_partkey)
                  & (unit.unit_cost == best.min_cost))
        .join(F.broadcast(p), F.col("p_partkey") == unit.l_partkey)
        .join(F.broadcast(s), F.col("s_suppkey") == unit.l_suppkey)
        .select("p_partkey", "p_brand", "s_suppkey", "s_name",
                F.round("unit_cost", 2).alias("min_unit_cost"),
                F.round("s_acctbal", 2).alias("acctbal"))
        .orderBy(F.col("acctbal").desc(), "p_partkey", "s_suppkey")
        .limit(20)
    )


@q("q17_small_quantity_revenue", """
WITH part_avg AS (
  SELECT l_partkey AS a_partkey, avg(l_quantity) AS avg_qty
  FROM lineitem GROUP BY l_partkey
)
SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
FROM lineitem
JOIN part     ON p_partkey = l_partkey
JOIN part_avg ON a_partkey = l_partkey
WHERE p_brand = 'Brand#23'
  AND l_quantity < 0.5 * avg_qty
""")
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: correlated scalar aggregate (per-part average
    quantity) decorrelated into an aggregate + self-join — exactly what
    Catalyst's subquery decorrelation would plan, written explicitly.

    Scale: both the per-part average and the probe side shuffle once on
    l_partkey (AQE coalesces); the brand filter rides the broadcast dim
    join and prunes before the threshold compare. avg over doubles is
    engine-ordered — the 0.5× threshold compare is robust to the tiny
    summation-order wobble except for measure-zero exact ties."""
    li = load(spark, sf_dir, "lineitem")
    p = load(spark, sf_dir, "part").filter(F.col("p_brand") == "Brand#23")
    part_avg = (li.groupBy(F.col("l_partkey").alias("a_partkey"))
                .agg(F.avg("l_quantity").alias("avg_qty")))
    return (
        li.join(F.broadcast(p), F.col("p_partkey") == li.l_partkey)
        .join(part_avg, F.col("a_partkey") == li.l_partkey)
        .filter(F.col("l_quantity") < 0.5 * F.col("avg_qty"))
        .agg(F.round(F.sum("l_extendedprice") / 7.0, 2).alias("avg_yearly"))
    )


@q("q4_order_priority", """
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-07-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey
                AND l_shipdate >= o_orderdate + INTERVAL 60 DAY)
GROUP BY o_orderpriority
""")
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: EXISTS → left-semi join with a non-equi residual
    (late shipment: shipped ≥60 days after order), then a tiny aggregate.

    Scale: the date window prunes orders at the scan (pushed filter);
    the semi-join shuffles both sides on orderkey once and the interval
    predicate evaluates as a join residual — no second pass, no
    count-distinct. Aggregate output is ~5 rows."""
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1997-01-01")
        & (F.col("o_orderdate") < "1997-07-01"))
    li = load(spark, sf_dir, "lineitem")
    late = (li.l_shipdate
            >= F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"))
    return (
        o.join(li, (o.o_orderkey == li.l_orderkey) & late, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("order_count"))
    )


# --------------------------------------------------------------------------
# Tagged-union suites: related operator demos folded into one verified
# entry each (plans/suites.py) so the bounded correctness window covers the
# whole catalog. Every member keeps its own plan + oracle; the union is a
# zero-cost projection.
# --------------------------------------------------------------------------

_CUSTOMER_ORDER_MEMBERS = [
    ("top_customers", top_customers_by_revenue,
     ["c_custkey", "c_name", "n_orders"], ["total_spent"]),
    ("segment_stats", segment_order_stats,
     ["c_mktsegment", "n_orders", "n_customers"], ["total", "avg_price"]),
]


@q("customer_order_stats", suite_sql(_CUSTOMER_ORDER_MEMBERS))
def customer_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2C aggregations: top-k revenue ranking + multi-aggregate (incl.
    COUNT DISTINCT) over the customer⋈orders join."""
    return suite_df(spark, sf_dir, _CUSTOMER_ORDER_MEMBERS)


@member_sql("""
SELECT o_custkey, o_orderkey,
       rank() OVER w AS rnk,
       dense_rank() OVER w AS drnk,
       ntile(4) OVER w AS quartile,
       round(percent_rank() OVER w, 6) AS pct_rank,
       round(cume_dist() OVER w, 6) AS cume,
       lead(o_orderkey) OVER w AS next_order
FROM orders
WHERE o_custkey % 100 = 0
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
""")
def window_ranking_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full ranking family over one window spec — rank, dense_rank,
    ntile, percent_rank, cume_dist, lead — all share a single sort within
    one shuffle (Catalyst plans ONE Window operator when the specs
    agree)."""
    o = load(spark, sf_dir, "orders").filter(F.col("o_custkey") % 100 == 0)
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey")
    return o.select(
        "o_custkey", "o_orderkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume"),
        F.lead("o_orderkey").over(w).alias("next_order"))


_WINDOW_MEMBERS = [
    ("ranking", window_ranking_family,
     ["o_custkey", "o_orderkey", "rnk", "drnk", "quartile", "next_order"],
     ["pct_rank", "cume"]),
    ("top3", window_top3_orders_per_customer,
     ["o_custkey", "o_orderkey", "rank"], ["totalprice"]),
    ("running", window_running_supplier_revenue,
     ["l_suppkey", "l_orderkey", "l_linenumber"], ["running_revenue"]),
    ("gap", window_order_gap_days, ["o_custkey", "o_orderkey"], ["gap_days"]),
    ("sessionize", sessionize_events,
     ["user_id", "n_sessions"], ["avg_events_per_session"]),
    ("first_per_key", dedup_events_first_per_key,
     ["user_id", "event_type", "first_event_id"], []),
]


@q("window_suite", suite_sql(_WINDOW_MEMBERS))
def window_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2C windows: top-k per group, running sum, lag/gap, batch
    sessionization, keyed first-row dedup — each a one-shuffle window op."""
    return suite_df(spark, sf_dir, _WINDOW_MEMBERS)


_GROUPING_MEMBERS = [
    ("rollup", rollup_flag_status,
     ["l_returnflag", "l_linestatus", "gid", "n"], ["sum_qty"]),
    ("cube", cube_status_priority,
     ["o_orderstatus", "o_orderpriority", "gid", "n"], ["total"]),
    ("gsets", grouping_sets_order_stats,
     ["o_orderstatus", "o_orderpriority", "n"], ["total"]),
    ("pivot", pivot_status_by_segment,
     ["c_mktsegment"], ["status_o", "status_f", "status_p"]),
]


@q("grouping_suite", suite_sql(_GROUPING_MEMBERS))
def grouping_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2C multi-dimensional aggregation: ROLLUP / CUBE / GROUPING SETS
    (one Expand + single aggregate each) and pivot-to-wide."""
    return suite_df(spark, sf_dir, _GROUPING_MEMBERS)


_SCALAR_JSON_MEMBERS = [
    ("json_path", json_event_values, ["event_type", "n", "sum_k"], ["avg_value"]),
    ("map_explode", json_map_explode, ["prop_key", "n", "sum_v"], []),
    ("string_funcs", part_string_funcs,
     ["p_partkey", "name_prefix", "name_len", "brand_type", "type_slug"],
     ["marked_up"]),
]


@q("scalar_json_suite", suite_sql(_SCALAR_JSON_MEMBERS))
def scalar_json_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2C scalar/JSON functions: fixed-path JSON extraction, schema-on-read
    MapType explode, string-function projection — all JVM-side codegen."""
    return suite_df(spark, sf_dir, _SCALAR_JSON_MEMBERS)


_TIME_BUCKET_MEMBERS = [
    ("tumbling", event_time_buckets, ["hour_start", "event_type", "n"],
     ["total_value"]),
    ("sliding", event_sliding_windows, ["window_start", "n"], []),
]


@q("time_bucket_suite", suite_sql(_TIME_BUCKET_MEMBERS))
def time_bucket_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2C time buckets: tumbling (date_trunc) and sliding (F.window)
    aggregation — the batch twins of streaming/windows.py."""
    return suite_df(spark, sf_dir, _TIME_BUCKET_MEMBERS)


_INTERVAL_JOIN_MEMBERS = [
    ("asof", asof_join_signup_purchase,
     ["event_id", "user_id", "last_signup_ts"], []),
    ("range", range_join_error_burst, ["event_id", "events_within_1h"], []),
]


@q("interval_join_suite", suite_sql(_INTERVAL_JOIN_MEMBERS))
def interval_join_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2C beyond-equi joins: as-of (sorted carry-forward, no O(n²)) and
    range join (equi key + interval residual)."""
    return suite_df(spark, sf_dir, _INTERVAL_JOIN_MEMBERS)


_OUTER_JOIN_MEMBERS = [
    ("left", left_join_customer_order_counts,
     ["c_custkey", "c_mktsegment", "n_orders"], ["total"]),
    ("anti", anti_join_customers_no_orders, ["c_custkey", "c_mktsegment"], []),
    ("full", full_outer_nation_activity, ["nationkey", "n_cust", "n_supp"], []),
]


@q("outer_join_suite", suite_sql(_OUTER_JOIN_MEMBERS))
def outer_join_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2C outer joins: LEFT OUTER with join-side predicate, NOT EXISTS →
    left-anti, FULL OUTER with two-sided null extension."""
    return suite_df(spark, sf_dir, _OUTER_JOIN_MEMBERS)


_SKEW_MEMBERS = [
    ("salted_agg", salted_status_counts, ["o_orderstatus", "count_n"],
     ["sum_total"]),
    ("salted_join", salted_replicated_join, ["n_name", "n_cust"], []),
]


@q("skew_suite", suite_sql(_SKEW_MEMBERS))
def skew_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2C skew handling: salted two-phase aggregation and
    salt-and-replicate join (operators/skew.py) — results must equal the
    unsalted forms, which is exactly what the oracles assert."""
    return suite_df(spark, sf_dir, _SKEW_MEMBERS)


@q("stats_aggregates", """
SELECT l_returnflag,
       count(*) AS n,
       round(quantile_cont(l_extendedprice, 0.5), 2)  AS median_price,
       round(quantile_cont(l_extendedprice, 0.95), 2) AS p95_price,
       round(stddev_samp(l_extendedprice), 2)         AS sd_price,
       round(corr(l_quantity, l_extendedprice), 4)    AS qty_price_corr
FROM lineitem GROUP BY l_returnflag
""")
def stats_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2C statistical aggregates: exact interpolated percentiles (both
    engines use linear type-7 interpolation), sample stddev, Pearson
    correlation — one hash aggregate; percentile is the only non-partial
    one (it buffers per group), which is why the at-scale default is
    approx_percentile (see approx_distinct_customers for the HLL twin of
    the same trade)."""
    li = load(spark, sf_dir, "lineitem")
    pct = F.expr("percentile(l_extendedprice, array(0.5D, 0.95D))")
    return (
        li.groupBy("l_returnflag")
        .agg(F.count("*").alias("n"),
             F.round(pct.getItem(0), 2).alias("median_price"),
             F.round(pct.getItem(1), 2).alias("p95_price"),
             F.round(F.stddev_samp("l_extendedprice"), 2).alias("sd_price"),
             F.round(F.corr("l_quantity", "l_extendedprice"), 4)
             .alias("qty_price_corr"))
    )
