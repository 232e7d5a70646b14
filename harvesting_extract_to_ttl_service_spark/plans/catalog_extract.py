"""Extraction-surface catalog entries (SURVEY.md §2A A8/A11/A12).

RDFa extraction itself is a Python-side parser, but its behavior is still
oracle-checkable: the pages are synthesized *deterministically* from the
``documents`` fixture, so DuckDB can state the expected triple set in pure
SQL without parsing HTML. The Spark side builds real HTML, runs the real
``mapInPandas`` extractor over it, and must land on exactly the same rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.operators.extract import (
    extraction_pipeline,
)
from harvesting_extract_to_ttl_service_spark.plans.tables import load
from harvesting_extract_to_ttl_service_spark.schema import RDF_LANGSTRING

QUERIES = {}
ORACLES = {}


def q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLES[name] = oracle
        return fn

    return deco


_N_DOCS = 300  # doc_id < 300 → bounded runtime at any SF

# Expected output, restated independently: per page the extractor yields a
# title literal, a language langString, and one provenance triple for the
# (single) distinct subject. Keep the SQL in lockstep with _doc_html below.
_EXTRACT_ORACLE = f"""
WITH docs AS (
    SELECT doc_id, lang,
           array_to_string((string_split(text, ' '))[1:3], ' ') AS title,
           'urn:doc:' || doc_id  AS subj,
           'http://ex/page/' || doc_id AS url
    FROM documents WHERE doc_id < {_N_DOCS}
)
SELECT subj AS subject, 'http://purl.org/dc/terms/title' AS predicate,
       title AS object_value, 'literal' AS object_type,
       CAST(NULL AS VARCHAR) AS datatype, CAST(NULL AS VARCHAR) AS language
FROM docs
UNION ALL
SELECT subj, 'http://purl.org/dc/terms/description', 'doc ' || doc_id,
       'literal', '{RDF_LANGSTRING}', lang
FROM docs
UNION ALL
SELECT subj, 'http://www.w3.org/ns/prov#wasDerivedFrom', url, 'iri',
       NULL, NULL
FROM docs
"""


def _doc_html() -> F.Column:
    """Deterministic RDFa page for one documents row (keep in lockstep with
    _EXTRACT_ORACLE)."""
    title = F.concat_ws(" ", F.slice(F.split("text", " "), 1, 3))
    return F.format_string(
        '<html><body><div about="urn:doc:%s">'
        '<span property="dct:title">%s</span>'
        '<span property="dct:description" lang="%s">doc %s</span>'
        "</div></body></html>",
        F.col("doc_id").cast("string"), title, F.col("lang"),
        F.col("doc_id").cast("string"),
    )


_PIPELINE_ORACLE = f"""
WITH docs AS (
    SELECT doc_id, lang,
           array_to_string((string_split(text, ' '))[1:3], ' ') AS title,
           'urn:task:' || (doc_id % 4) AS task_uri,
           'urn:doc:' || doc_id        AS subj,
           'http://ex/page/' || doc_id AS url
    FROM documents WHERE doc_id < {_N_DOCS}
)
SELECT task_uri, subj AS subject,
       'http://purl.org/dc/terms/title' AS predicate,
       title AS object_value, 'literal' AS object_type
FROM docs
UNION ALL
SELECT task_uri, subj, 'http://purl.org/dc/terms/description',
       'doc ' || doc_id, 'literal'
FROM docs
UNION ALL
SELECT task_uri, subj, 'http://www.w3.org/ns/prov#wasDerivedFrom', url, 'iri'
FROM docs
"""


@q("import_pipeline_e2e", _PIPELINE_ORACLE)
def import_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full §3.1 pipeline over a synthetic control graph + document
    pages: scheduled-task star join → page enumeration → extraction →
    triage → valid triples with provenance — and the oracle restates the
    expected valid set (all clean here, so valid = extracted ∪ prov)
    directly from documents."""
    from harvesting_extract_to_ttl_service_spark.plans.pipeline_import import (
        ADMS_STATUS,
        TASK_HAS_FILE,
        TASK_INPUT_CONTAINER,
        TASK_OPERATION,
        run_import_pipeline,
    )
    from harvesting_extract_to_ttl_service_spark.schema import (
        EXTRACTING_OPERATION,
        RDF_TYPE,
        STATUS_SCHEDULED,
        TASK_TYPE,
    )

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < _N_DOCS)
    g = "urn:g:jobs"

    def const_triples(s, p, o):
        return docs.select(
            s.alias("subject"), F.lit(p).alias("predicate"), o.alias("object_value"),
            F.lit("iri").alias("object_type"),
            F.lit(None).cast("string").alias("datatype"),
            F.lit(None).cast("string").alias("language"),
            F.lit(g).alias("graph"),
        )

    task = F.concat(F.lit("urn:task:"), (F.col("doc_id") % 4).cast("string"))
    container = F.concat(F.lit("urn:container:"),
                         (F.col("doc_id") % 4).cast("string"))
    page = F.concat(F.lit("share://doc"), F.col("doc_id"), F.lit(".html"))
    control = (
        const_triples(task, RDF_TYPE, F.lit(TASK_TYPE))
        .unionByName(const_triples(task, ADMS_STATUS, F.lit(STATUS_SCHEDULED)))
        .unionByName(const_triples(task, TASK_OPERATION,
                                   F.lit(EXTRACTING_OPERATION)))
        .unionByName(const_triples(task, TASK_INPUT_CONTAINER, container))
        .unionByName(const_triples(container, TASK_HAS_FILE, page))
        .distinct()
    )
    bodies = docs.select(
        page.alias("page_uri"),
        F.concat(F.lit("http://ex/page/"), "doc_id").alias("url"),
        _doc_html().alias("html"),
    )
    res = run_import_pipeline(control, bodies, graph=g)
    return res["valid"].select("task_uri", "subject", "predicate",
                               "object_value", "object_type")


@q("rdfa_extract_docs", _EXTRACT_ORACLE)
def rdfa_extract_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents → synthetic RDFa pages → real extraction pipeline
    (mapInPandas parse → content spill → provenance inject)."""
    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < _N_DOCS)
    pages = docs.select(
        F.concat(F.lit("share://doc"), "doc_id").alias("page_uri"),
        F.concat(F.lit("http://ex/page/"), "doc_id").alias("url"),
        F.lit(None).cast("string").alias("path"),
        _doc_html().alias("html"),
    )
    triples, _spilled = extraction_pipeline(pages)
    return triples.select("subject", "predicate", "object_value",
                          "object_type", "datatype", "language")
