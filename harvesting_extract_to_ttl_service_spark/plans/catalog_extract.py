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
