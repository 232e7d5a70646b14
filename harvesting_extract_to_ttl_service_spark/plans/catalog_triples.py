"""Triple-model query catalog: the reference's locally-executed dataflow
(SURVEY.md §2A — N-Triples codec, triage) and SPARQL-delegated query shapes
(§2B — star/chain joins, count-distinct, upsert, semi-join, fan-out),
exercised over a triple set deterministically derived from the TPC-H
fixtures so every query has a DuckDB oracle.

The derivation (`tpch_triples` below ↔ `_CTE` SQL) maps rows to triples:
  nation   → (urn:nation:K,   urn:p:name,    n_name)            literal
             (urn:nation:K,   urn:p:region,  urn:region:K)      iri
  region   → (urn:region:K,   urn:p:name,    r_name)            literal
  customer → (urn:customer:K, urn:p:nation,  urn:nation:K)      iri
             (urn:customer:K, urn:p:segment, c_mktsegment)      literal
             (urn:customer:K, urn:p:acctbal, str(c_acctbal))    ^^xsd:integer
  orders   → (urn:order:K,    urn:p:customer, urn:customer:K)   iri
             (urn:order:K,    urn:p:status,  o_orderstatus)     literal
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.functions.ntriples import (
    decode_ntriples,
    encode_ntriples,
)
from harvesting_extract_to_ttl_service_spark.operators.relational import (
    semi_join,
    star_join,
    upsert,
)
from harvesting_extract_to_ttl_service_spark.operators.dedup import (
    spread_for_cpu,
)
from harvesting_extract_to_ttl_service_spark.operators.triage import triage
from harvesting_extract_to_ttl_service_spark.plans.suites import (
    member_sql,
    suite_df,
    suite_sql,
)
from harvesting_extract_to_ttl_service_spark.plans.tables import load
from harvesting_extract_to_ttl_service_spark.schema import (
    RDF_LANGSTRING,
    XSD_BOOLEAN,
    XSD_DATE,
    XSD_DATETIME,
    XSD_INT,
    XSD_INTEGER,
    XSD_STRING,
)

QUERIES = {}
ORACLES = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn
    return deco


GRAPH = "urn:g:tpch"

_CTE = """
WITH triples(subject, predicate, object_value, object_type, datatype, language, graph) AS (
  SELECT 'urn:nation:' || n_nationkey, 'urn:p:name', n_name,
         'literal', NULL, NULL, 'urn:g:tpch' FROM nation
  UNION ALL
  SELECT 'urn:nation:' || n_nationkey, 'urn:p:region', 'urn:region:' || n_regionkey,
         'iri', NULL, NULL, 'urn:g:tpch' FROM nation
  UNION ALL
  SELECT 'urn:region:' || r_regionkey, 'urn:p:name', r_name,
         'literal', NULL, NULL, 'urn:g:tpch' FROM region
  UNION ALL
  SELECT 'urn:customer:' || c_custkey, 'urn:p:nation', 'urn:nation:' || c_nationkey,
         'iri', NULL, NULL, 'urn:g:tpch' FROM customer
  UNION ALL
  SELECT 'urn:customer:' || c_custkey, 'urn:p:segment', c_mktsegment,
         'literal', NULL, NULL, 'urn:g:tpch' FROM customer
  UNION ALL
  SELECT 'urn:customer:' || c_custkey, 'urn:p:acctbal', CAST(c_acctbal AS VARCHAR),
         'literal', 'http://www.w3.org/2001/XMLSchema#integer', NULL, 'urn:g:tpch'
  FROM customer
  UNION ALL
  SELECT 'urn:order:' || o_orderkey, 'urn:p:customer', 'urn:customer:' || o_custkey,
         'iri', NULL, NULL, 'urn:g:tpch' FROM orders
  UNION ALL
  SELECT 'urn:order:' || o_orderkey, 'urn:p:status', o_orderstatus,
         'literal', NULL, NULL, 'urn:g:tpch' FROM orders
)
"""


def _lit_triple(subject, predicate, value, datatype=None, language=None,
                object_type="literal"):
    return [
        subject.alias("subject"),
        F.lit(predicate).alias("predicate"),
        value.alias("object_value"),
        F.lit(object_type).alias("object_type"),
        (datatype if isinstance(datatype, F.Column) else F.lit(datatype))
        .cast("string").alias("datatype"),
        F.lit(language).cast("string").alias("language"),
        F.lit(GRAPH).alias("graph"),
    ]


# Analyzed-plan memo for tpch_triples, keyed (applicationId, sf_dir):
# 15 catalog entries derive from this one synthesis, and re-building it
# re-analyzes the 4-scan/8-branch explode tree every call (~0.3-0.5 s of
# driver time per query at sf0.1, ~half of b3/b4's wall clock). Reusing
# the DataFrame OBJECT is a view definition reused across queries — the
# logical plan is immutable and nothing is persisted, so execution is
# byte-identical; only the redundant re-analysis disappears. Entries from
# finished applications are purged on the next miss.
_TRIPLES_MEMO: dict[tuple[str, str], DataFrame] = {}


def tpch_triples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark twin of `_CTE` — triple view over nation/region/customer/orders.

    Each base table is scanned ONCE, with its per-row triples emitted via
    one explode over an array of triple structs — the union-of-selects
    shape would scan customer 3× and orders/nation 2× per query (a 3×
    read-amplification that the 100 TB scan pays in full; the SQL CTE's
    UNION ALL branches are how DuckDB states it, not how Spark should run
    it)."""
    key = (spark.sparkContext.applicationId, sf_dir)
    memo = _TRIPLES_MEMO.get(key)
    if memo is not None:
        return memo
    for k in [k for k in _TRIPLES_MEMO
              if k[0] != spark.sparkContext.applicationId]:
        del _TRIPLES_MEMO[k]
    def fan_out(df, *triples):
        return df.select(F.explode(F.array(*[
            F.struct(*t) for t in triples])).alias("t")).select("t.*")

    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region")
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    nk = F.concat(F.lit("urn:nation:"), F.col("n_nationkey"))
    ck = F.concat(F.lit("urn:customer:"), F.col("c_custkey"))
    ok = F.concat(F.lit("urn:order:"), F.col("o_orderkey"))
    parts = [
        fan_out(
            nation,
            _lit_triple(nk, "urn:p:name", F.col("n_name")),
            _lit_triple(nk, "urn:p:region",
                        F.concat(F.lit("urn:region:"), F.col("n_regionkey")),
                        object_type="iri")),
        fan_out(
            region,
            _lit_triple(F.concat(F.lit("urn:region:"), F.col("r_regionkey")),
                        "urn:p:name", F.col("r_name"))),
        fan_out(
            customer,
            _lit_triple(ck, "urn:p:nation",
                        F.concat(F.lit("urn:nation:"), F.col("c_nationkey")),
                        object_type="iri"),
            _lit_triple(ck, "urn:p:segment", F.col("c_mktsegment")),
            _lit_triple(ck, "urn:p:acctbal", F.col("c_acctbal").cast("string"),
                        datatype=XSD_INTEGER)),
        fan_out(
            orders,
            _lit_triple(ok, "urn:p:customer",
                        F.concat(F.lit("urn:customer:"), F.col("o_custkey")),
                        object_type="iri"),
            _lit_triple(ok, "urn:p:status", F.col("o_orderstatus"))),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    _TRIPLES_MEMO[key] = out
    return out


# --------------------------------------------------------------------------
# A9/A10 — N-Triples codec
# --------------------------------------------------------------------------

@member_sql(_CTE + """
SELECT '<' || subject || '> <' || predicate || '> "' || object_value || '" .' AS nt
FROM triples WHERE predicate = 'urn:p:name'
""")
def ntriples_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = tpch_triples(spark, sf_dir).filter(F.col("predicate") == "urn:p:name")
    return encode_ntriples(t).select("nt")


@member_sql(_CTE + """
SELECT subject, predicate, object_value, object_type
FROM triples WHERE predicate IN ('urn:p:segment', 'urn:p:customer')
""")
def ntriples_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """encode → decode must reproduce the source triples (property test at
    fixture scale, oracle-checked against the relational origin)."""
    t = tpch_triples(spark, sf_dir).filter(
        F.col("predicate").isin("urn:p:segment", "urn:p:customer"))
    lines = encode_ntriples(t).select(F.col("nt").alias("value"))
    return decode_ntriples(lines).select(
        "subject", "predicate", "object_value", "object_type")


@member_sql(_CTE + """
SELECT CASE WHEN subject LIKE 'urn:nation:%' THEN 'n:' || substr(subject, 12)
            WHEN subject LIKE 'urn:region:%' THEN 'r:' || substr(subject, 12)
            ELSE '<' || subject || '>' END
       || ' p:name "' || object_value || '" .' AS ttl
FROM triples WHERE predicate = 'urn:p:name'
""")
def turtle_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-compacted Turtle statements (functions/ntriples.py
    encode_turtle): subject/predicate IRIs compact to pfx:local where a
    declared namespace + safe local name match, everything else stays
    <...>; byte-checked against the oracle's CASE restatement."""
    from harvesting_extract_to_ttl_service_spark.functions.ntriples import (
        encode_turtle,
    )

    t = tpch_triples(spark, sf_dir).filter(F.col("predicate") == "urn:p:name")
    return encode_turtle(t, {"p": "urn:p:", "n": "urn:nation:",
                             "r": "urn:region:"}).select("ttl")


# --------------------------------------------------------------------------
# A13-A15 — triage over a deterministic dirty-literal mixture
# --------------------------------------------------------------------------

@q("triage_dirty_literals", """
SELECT 'urn:order:' || o_orderkey AS subject,
  CASE o_orderkey % 10
    WHEN 0 THEN 'valid'
    WHEN 1 THEN CASE WHEN o_orderstatus = 'O' THEN 'fixed' ELSE 'valid' END
    WHEN 2 THEN 'valid'
    WHEN 3 THEN 'fixed'
    WHEN 4 THEN 'valid'
    WHEN 5 THEN 'fixed'
    WHEN 6 THEN 'fixed'
    WHEN 7 THEN 'dropped'
    ELSE 'fixed' END AS verdict,
  CASE o_orderkey % 10
    WHEN 1 THEN CASE WHEN o_orderstatus = 'O' THEN 'true' END
    WHEN 3 THEN strftime(o_orderdate, '%Y-%m-%d')
    WHEN 5 THEN CAST(o_custkey AS VARCHAR)
    WHEN 6 THEN o_orderstatus
    WHEN 8 THEN strftime(o_orderdate, '%Y-%m-%d') || 'T09:05:03'
    WHEN 9 THEN strftime(o_orderdate, '%Y-%m-%d') END AS fixed_object_value,
  CASE o_orderkey % 10
    WHEN 1 THEN CASE WHEN o_orderstatus = 'O'
                     THEN 'http://www.w3.org/2001/XMLSchema#boolean' END
    WHEN 3 THEN 'http://www.w3.org/2001/XMLSchema#date'
    WHEN 5 THEN 'http://www.w3.org/2001/XMLSchema#integer'
    WHEN 6 THEN 'http://www.w3.org/2001/XMLSchema#string'
    WHEN 8 THEN 'http://www.w3.org/2001/XMLSchema#dateTime'
    WHEN 9 THEN 'http://www.w3.org/2001/XMLSchema#date' END AS fixed_datatype
FROM orders
""")
def triage_dirty_literals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic dirty mixture over orders — one datatype-rule class
    per o_orderkey % 10 (SURVEY.md §1.2 table):
      0 plain literal             → valid
      1 xsd:boolean 'TRUE'/'true' → fixed (case) / valid
      2 xsd:date ISO              → valid
      3 xsd:date slash form       → fixed (canonicalized)
      4 xsd:integer               → valid
      5 xsd:int                   → fixed (recast to xsd:integer)
      6 rdf:langString, no tag    → fixed (recast to xsd:string)
      7 unknown datatype          → dropped
      8 xsd:dateTime RFC-2822     → fixed ('Sun, 07 May 2023 9:05:03 GMT')
      9 xsd:date month-name form  → fixed ('May 7 2023', no comma)
    Classes 8/9 exercise the JS-Date.parse envelope widening
    (fixTriple.js:148-162). The oracle restates the EXPECTED verdicts
    independently in SQL (it never sees the dirty inputs, only the
    canonical repaired forms)."""
    o = load(spark, sf_dir, "orders")
    cls = F.col("o_orderkey") % 10
    value = (
        F.when(cls == 0, F.col("o_orderstatus"))
        .when(cls == 1, F.when(F.col("o_orderstatus") == "O", "TRUE").otherwise("true"))
        .when(cls == 2, F.date_format("o_orderdate", "yyyy-MM-dd"))
        .when(cls == 3, F.date_format("o_orderdate", "yyyy/MM/dd"))
        .when(cls == 4, F.col("o_custkey").cast("string"))
        .when(cls == 5, F.col("o_custkey").cast("string"))
        .when(cls == 6, F.col("o_orderstatus"))
        .when(cls == 8, F.concat(F.date_format("o_orderdate", "EEE, dd MMM yyyy"),
                                 F.lit(" 9:05:03 GMT")))
        .when(cls == 9, F.date_format("o_orderdate", "MMMM d yyyy"))
        .otherwise(F.col("o_orderstatus"))
    )
    datatype = (
        F.when(cls == 1, XSD_BOOLEAN)
        .when(cls == 2, XSD_DATE)
        .when(cls == 3, XSD_DATE)
        .when(cls == 4, XSD_INTEGER)
        .when(cls == 5, XSD_INT)
        .when(cls == 6, RDF_LANGSTRING)
        .when(cls == 7, "urn:dt:custom")
        .when(cls == 8, XSD_DATETIME)
        .when(cls == 9, XSD_DATE)
    )
    # The repair chain is CPU-dense (regex + java.time parses) while the
    # orders scan is one partition at fixture scale — spread to cores
    # before the projection (no-op on a real many-partition corpus).
    dirty = spread_for_cpu(o).select(
        F.concat(F.lit("urn:order:"), F.col("o_orderkey")).alias("subject"),
        F.lit("urn:p:dirty").alias("predicate"),
        value.alias("object_value"),
        F.lit("literal").alias("object_type"),
        datatype.cast("string").alias("datatype"),
        F.lit(None).cast("string").alias("language"),
        F.lit(GRAPH).alias("graph"),
    )
    return triage(dirty).select("subject", "verdict", "fixed_object_value",
                                "fixed_datatype")


@member_sql("""
SELECT 'urn:order:' || o_orderkey AS subject,
       'fixed' AS verdict,
       CASE WHEN o_orderkey % 2 = 0
            THEN strftime(o_orderdate, '%Y-%m-%-d')
            ELSE strftime(o_orderdate, '%Y-%m-%-d') || 'T9:5:3'
       END AS fixed_object_value,
       CASE WHEN o_orderkey % 2 = 0
            THEN 'http://www.w3.org/2001/XMLSchema#date'
            ELSE 'http://www.w3.org/2001/XMLSchema#dateTime'
       END AS fixed_datatype
FROM orders
""")
def triage_compat_dates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compat-mode triage (triage(compat=True)): every row carries a
    repairable slash-form date (even keys) or dateTime (odd keys), and
    the repaired literal must re-emit in the reference's non-padded
    JS-Date form — month zero-padded, day/hour/minute/second NOT
    (fixTriple.js:152-156,201-208). The oracle restates those exact
    strings with DuckDB's %-d non-padded directive."""
    o = load(spark, sf_dir, "orders")
    even = F.col("o_orderkey") % 2 == 0
    value = F.when(
        even, F.date_format("o_orderdate", "yyyy/MM/dd"),
    ).otherwise(
        F.concat(F.date_format("o_orderdate", "yyyy/MM/dd"), F.lit(" 9:5:3")))
    dirty = spread_for_cpu(o).select(
        F.concat(F.lit("urn:order:"), F.col("o_orderkey")).alias("subject"),
        F.lit("urn:p:when").alias("predicate"),
        value.alias("object_value"),
        F.lit("literal").alias("object_type"),
        F.when(even, XSD_DATE).otherwise(XSD_DATETIME).alias("datatype"),
        F.lit(None).cast("string").alias("language"),
        F.lit(GRAPH).alias("graph"),
    )
    return triage(dirty, compat=True).select(
        "subject", "verdict", "fixed_object_value", "fixed_datatype")


def _fidelity_members():
    from harvesting_extract_to_ttl_service_spark.plans.catalog_extract import (
        rdfa_inlist_docs,
        rdfa_time_docs,
        rdfa_xmlns_docs,
    )

    return [
        ("inlist", rdfa_inlist_docs,
         ["page_uri", "subject", "predicate", "object_value", "object_type"],
         []),
        ("compat", triage_compat_dates,
         ["subject", "verdict", "fixed_object_value", "fixed_datatype"], []),
        ("xmlns", rdfa_xmlns_docs,
         ["page_uri", "subject", "predicate", "object_value", "object_type"],
         []),
        ("time", rdfa_time_docs,
         ["page_uri", "subject", "predicate", "object_value", "datatype"],
         []),
    ]


_FIDELITY_MEMBERS = _fidelity_members()


@q("fidelity_suite", suite_sql(_FIDELITY_MEMBERS))
def fidelity_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reference-fidelity suite (tagged union, keeps the driver's
    50-entry verification window): RDFa @inlist rdf:List construction
    (full chain incl. deterministic bnode labels) and compat-mode
    date/dateTime repair re-emission (the reference's non-padded JS-Date
    output form)."""
    return suite_df(spark, sf_dir, _FIDELITY_MEMBERS)


# --------------------------------------------------------------------------
# B3/B4/B5 — star join, chain join, count-distinct
# --------------------------------------------------------------------------

@q("b3_star_join_customers", _CTE + """
SELECT 'urn:customer:' || c_custkey AS subject,
       'urn:nation:' || c_nationkey AS nation,
       c_mktsegment                 AS segment,
       CAST(c_acctbal AS VARCHAR)   AS acctbal
FROM customer
""")
def b3_star_join_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Task-load star query shape (/root/reference/lib/task.js:83-100):
    pivot = one shuffle for the whole star, vs N-1 self-joins."""
    t = tpch_triples(spark, sf_dir)
    return star_join(
        t,
        {"nation": "urn:p:nation", "segment": "urn:p:segment",
         "acctbal": "urn:p:acctbal"},
        required=["nation", "segment", "acctbal"],
        graph=GRAPH,
    ).filter(F.col("subject").startswith("urn:customer:"))


@q("b4_chain_join_customer_region", _CTE + """
SELECT DISTINCT t1.subject AS customer, t3.object_value AS region_name
FROM triples t1
JOIN triples t2 ON t1.object_value = t2.subject AND t2.predicate = 'urn:p:region'
JOIN triples t3 ON t2.object_value = t3.subject AND t3.predicate = 'urn:p:name'
WHERE t1.predicate = 'urn:p:nation'
""")
def b4_chain_join_customer_region(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-enumeration chain-join shape
    (/root/reference/lib/pipeline-import.js:129-139), generalized to all
    start subjects: customer →nation →region →name, DISTINCT. The
    reference's LIMIT/OFFSET pagination loop collapses into one scan."""
    t = tpch_triples(spark, sf_dir)
    c2n = t.filter(F.col("predicate") == "urn:p:nation").select(
        F.col("subject").alias("customer"), F.col("object_value").alias("n"))
    n2r = t.filter(F.col("predicate") == "urn:p:region").select(
        F.col("subject").alias("n2"), F.col("object_value").alias("r"))
    r2name = t.filter(F.col("predicate") == "urn:p:name").select(
        F.col("subject").alias("r2"), F.col("object_value").alias("region_name"))
    return (
        c2n.join(n2r, c2n.n == n2r.n2)
        .join(r2name, n2r.r == r2name.r2)
        .select("customer", "region_name")
        .distinct()
    )


@q("b5_count_distinct_nations", _CTE + """
SELECT count(DISTINCT object_value) AS count
FROM triples WHERE predicate = 'urn:p:nation'
""")
def b5_count_distinct_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    from harvesting_extract_to_ttl_service_spark.operators.relational import (
        count_distinct_objects,
    )

    t = tpch_triples(spark, sf_dir)
    return count_distinct_objects(t, "urn:p:nation", graph=GRAPH)


# --------------------------------------------------------------------------
# B7/B8/B9 — upsert, semi-join, fan-out
# --------------------------------------------------------------------------

@q("b7_upsert_status", _CTE + """
SELECT CASE WHEN o_totalprice > 200000 THEN 'archived' ELSE o_orderstatus END
         AS status,
       count(*) AS n
FROM orders GROUP BY 1
""")
def b7_upsert_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Status upsert (DELETE+INSERT WHERE,
    /root/reference/lib/task.js:158-187): anti-join out matched rows,
    union replacements; verified via the post-upsert status distribution."""
    orders = load(spark, sf_dir, "orders")
    current = tpch_triples(spark, sf_dir).filter(
        F.col("predicate") == "urn:p:status")
    updates = orders.filter(F.col("o_totalprice") > 200000).select(
        F.concat(F.lit("urn:order:"), F.col("o_orderkey")).alias("subject"),
        F.lit("urn:p:status").alias("predicate"),
        F.lit("archived").alias("object_value"),
        F.lit("literal").alias("object_type"),
        F.lit(None).cast("string").alias("datatype"),
        F.lit(None).cast("string").alias("language"),
        F.lit(GRAPH).alias("graph"),
    )
    merged = upsert(current, updates, ["subject", "predicate"])
    return (merged.groupBy(F.col("object_value").alias("status"))
            .agg(F.count("*").alias("n")))


@q("b8_semi_join_customers_with_orders", _CTE + """
SELECT DISTINCT t.subject AS customer
FROM triples t
WHERE t.predicate = 'urn:p:segment'
  AND EXISTS (SELECT 1 FROM triples o
              WHERE o.predicate = 'urn:p:customer'
                AND o.object_value = t.subject)
""")
def b8_semi_join_customers_with_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Existence check as left-semi join
    (/root/reference/lib/task.js:65-78 general form)."""
    t = tpch_triples(spark, sf_dir)
    customers = t.filter(F.col("predicate") == "urn:p:segment").select(
        F.col("subject").alias("customer")).distinct()
    order_edges = t.filter(F.col("predicate") == "urn:p:customer").select(
        F.col("object_value").alias("customer"))
    return semi_join(customers, order_edges, ["customer"])


@q("b9_fanout_customer_orders", _CTE + """
SELECT object_value AS customer,
       count(*) AS n_orders,
       string_agg(subject, ',' ORDER BY subject) AS order_list
FROM triples
WHERE predicate = 'urn:p:customer'
  AND CAST(replace(object_value, 'urn:customer:', '') AS BIGINT) % 25 = 0
GROUP BY object_value
""")
def b9_fanout_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """hasMany fan-out (/root/reference/lib/task.js:110-155) grouped in one
    pass; the member list is sorted so the aggregate is deterministic."""
    t = tpch_triples(spark, sf_dir)
    edges = t.filter(
        (F.col("predicate") == "urn:p:customer")
        & (F.replace(F.col("object_value"), F.lit("urn:customer:"), F.lit(""))
           .cast("long") % 25 == 0))
    return (
        edges.groupBy(F.col("object_value").alias("customer"))
        .agg(F.count("*").alias("n_orders"),
             F.array_join(F.array_sort(F.collect_list("subject")), ",")
             .alias("order_list"))
    )


# --------------------------------------------------------------------------
# B1/B2/B6/B10/B11 — point lookup, distinct projection, VALUES filter,
# INSERT DATA append, graph scoping
# --------------------------------------------------------------------------

@member_sql(_CTE + """
SELECT subject FROM triples
WHERE predicate = 'urn:p:nation' AND object_value = 'urn:nation:7'
ORDER BY subject LIMIT 1
""")
def b1_point_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point lookup with LIMIT 1 (/root/reference/lib/file-helpers.js:20-31).
    Ordered so the single row is deterministic (the reference takes
    whichever binding Virtuoso returns first)."""
    from harvesting_extract_to_ttl_service_spark.operators.relational import (
        point_lookup,
    )

    t = tpch_triples(spark, sf_dir)
    return point_lookup(t, "urn:p:nation", "urn:nation:7",
                        graph=GRAPH).orderBy("subject").limit(1)


@member_sql(_CTE + """
SELECT DISTINCT object_value AS url FROM triples
WHERE subject = 'urn:customer:42' AND predicate = 'urn:p:nation'
""")
def b2_distinct_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SELECT DISTINCT ?url (/root/reference/lib/file-helpers.js:40-63)."""
    from harvesting_extract_to_ttl_service_spark.operators.relational import (
        object_values,
    )

    t = tpch_triples(spark, sf_dir)
    return object_values(t, "urn:customer:42", "urn:p:nation",
                         graph=GRAPH).withColumnRenamed("object_value", "url")


@member_sql(_CTE + """
SELECT object_value AS segment, count(*) AS n
FROM triples
WHERE predicate = 'urn:p:segment'
  AND object_value IN ('BUILDING', 'MACHINERY')
GROUP BY object_value
""")
def b6_values_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """VALUES ?operation { … } IN-list filter
    (/root/reference/lib/task.js:47-50,94-97)."""
    from harvesting_extract_to_ttl_service_spark.operators.relational import (
        values_filter,
    )

    t = tpch_triples(spark, sf_dir).filter(F.col("predicate") == "urn:p:segment")
    return (values_filter(t, "object_value", ["BUILDING", "MACHINERY"])
            .groupBy(F.col("object_value").alias("segment"))
            .agg(F.count("*").alias("n")))


@member_sql(_CTE + """
SELECT predicate, count(*) AS n FROM (
  SELECT subject, predicate, object_value FROM triples
  WHERE predicate = 'urn:p:status'
  UNION ALL
  SELECT 'urn:order:' || o_orderkey, 'urn:p:indexed', 'true'
  FROM orders WHERE o_orderkey % 10 = 0
) GROUP BY predicate
""")
def b10_insert_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INSERT DATA append (/root/reference/lib/pipeline-import.js:182-218):
    constant-built rows unioned onto an existing triple set."""
    from harvesting_extract_to_ttl_service_spark.operators.relational import (
        append_rows,
    )

    t = tpch_triples(spark, sf_dir).filter(F.col("predicate") == "urn:p:status")
    new_rows = (
        load(spark, sf_dir, "orders").filter(F.col("o_orderkey") % 10 == 0)
        .select(*_lit_triple(
            F.concat(F.lit("urn:order:"), F.col("o_orderkey")),
            "urn:p:indexed", F.lit("true")))
    )
    return (append_rows(t, new_rows)
            .groupBy("predicate").agg(F.count("*").alias("n")))


@member_sql(_CTE + """
SELECT graph, count(*) AS n FROM (
  SELECT * FROM triples
  UNION ALL
  SELECT subject, predicate, object_value, object_type, datatype, language,
         'urn:g:other' FROM triples WHERE predicate = 'urn:p:name'
) WHERE graph = 'urn:g:tpch' GROUP BY graph
""")
def b11_graph_scoped_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GRAPH-scoped match (/root/reference/constants.js:33-36 named-graph
    wrapping → a plain filter on the graph column; wildcard graph = no
    filter but the column is carried through)."""
    from harvesting_extract_to_ttl_service_spark.operators.relational import (
        graph_scope,
    )

    t = tpch_triples(spark, sf_dir)
    other = (t.filter(F.col("predicate") == "urn:p:name")
             .withColumn("graph", F.lit("urn:g:other")))
    return (graph_scope(t.unionByName(other), GRAPH)
            .groupBy("graph").agg(F.count("*").alias("n")))


# --------------------------------------------------------------------------
# Tagged-union suites (plans/suites.py): small §2A/§2B shapes folded into
# one verified entry each so the bounded correctness window covers the
# whole catalog.
# --------------------------------------------------------------------------

_NTRIPLES_MEMBERS = [
    ("encode", ntriples_encode, ["nt"], []),
    ("turtle", turtle_encode, ["ttl"], []),
    ("roundtrip", ntriples_decode_roundtrip,
     ["subject", "predicate", "object_value", "object_type"], []),
]


@q("ntriples_codec", suite_sql(_NTRIPLES_MEMBERS))
def ntriples_codec(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2A A9/A10/A21: N-Triples serialization (encoded lines checked
    byte-for-byte) and the encode→decode roundtrip landing back on the
    relational origin."""
    return suite_df(spark, sf_dir, _NTRIPLES_MEMBERS)


_B_LOOKUP_MEMBERS = [
    ("b1_point", b1_point_lookup, ["subject"], []),
    ("b2_distinct", b2_distinct_projection, ["url"], []),
    ("b6_values", b6_values_filter, ["segment", "n"], []),
]


@q("b_lookup_suite", suite_sql(_B_LOOKUP_MEMBERS))
def b_lookup_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2B B1/B2/B6: point lookup + LIMIT, DISTINCT projection, VALUES
    IN-list filter."""
    return suite_df(spark, sf_dir, _B_LOOKUP_MEMBERS)


_B_WRITE_MEMBERS = [
    ("b10_append", b10_insert_append, ["predicate", "n"], []),
    ("b11_graph", b11_graph_scoped_match, ["graph", "n"], []),
]


@q("b_write_suite", suite_sql(_B_WRITE_MEMBERS))
def b_write_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2B B10/B11: INSERT DATA append and GRAPH-scoped match over a
    multi-graph triple set."""
    return suite_df(spark, sf_dir, _B_WRITE_MEMBERS)
