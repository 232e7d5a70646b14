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
from harvesting_extract_to_ttl_service_spark.plans.suites import member_sql
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


_G = "urn:g:jobs"


def _control_graph(docs: DataFrame) -> DataFrame:
    """Synthetic scheduled-task control graph: doc → task (doc_id % 4) →
    container → hasFile page (shared by import_pipeline_e2e and the
    poisoned-page variant; keep in lockstep with the oracles).

    Materialized (localCheckpoint) since round 16: the pipeline's
    control-plane framing consumes the control graph 4× (task star join
    + hasFile enumeration, each on two consumer paths), and because this
    FIXTURE derives the control triples from documents.parquet, every
    consumption re-scanned the document corpus — 8 of the e2e plan's 9
    parquet scans were control-graph rescans (guide §6). Cutting here
    computes the control graph once (2 scans, in its own tiny job) while
    the framing above it still executes its two consumer paths in
    parallel from the cached rows — the r15/r16-measured reason NOT to
    checkpoint the (10× costlier) task_pages framing itself: that cut
    serialized a job the idle cores absorbed for free (interleaved
    min-of-5 at sf0.1: task_pages manifest 2.68 s vs 1.89 s baseline;
    control cut 2.25 s vs 2.16 s — flat locally, 9→1 scans in the
    executed plan). In production the control graph is a genuinely
    separate control-plane store scanned independently of the page
    corpus; this cut makes the fixture's I/O profile match that."""
    from harvesting_extract_to_ttl_service_spark.plans.pipeline_import import (
        ADMS_STATUS,
        TASK_HAS_FILE,
        TASK_INPUT_CONTAINER,
        TASK_OPERATION,
    )
    from harvesting_extract_to_ttl_service_spark.schema import (
        EXTRACTING_OPERATION,
        RDF_TYPE,
        STATUS_SCHEDULED,
        TASK_TYPE,
    )

    def triple(s, p, o):
        return F.struct(
            s.alias("subject"), F.lit(p).alias("predicate"),
            o.alias("object_value"),
            F.lit("iri").alias("object_type"),
            F.lit(None).cast("string").alias("datatype"),
            F.lit(None).cast("string").alias("language"),
            F.lit(_G).alias("graph"),
        )

    def fan_out(df, *triples):
        return df.select(F.explode(F.array(*triples)).alias("t")).select("t.*")

    # task-level triples derive from the 4 distinct task keys, not one
    # copy per document then distinct — control plane stays 4-row small
    # and the big dedup shuffle disappears from every pipeline entry.
    # One explode emits all 4 task triples per key (a 4-way union would
    # repeat the docs scan + distinct per branch).
    keys = docs.select((F.col("doc_id") % 4).cast("string").alias("k")).distinct()
    task = F.concat(F.lit("urn:task:"), F.col("k"))
    container = F.concat(F.lit("urn:container:"), F.col("k"))
    doc_container = F.concat(F.lit("urn:container:"),
                             (F.col("doc_id") % 4).cast("string"))
    page = F.concat(F.lit("share://doc"), F.col("doc_id"), F.lit(".html"))
    return (
        fan_out(keys,
                triple(task, RDF_TYPE, F.lit(TASK_TYPE)),
                triple(task, ADMS_STATUS, F.lit(STATUS_SCHEDULED)),
                triple(task, TASK_OPERATION, F.lit(EXTRACTING_OPERATION)),
                triple(task, TASK_INPUT_CONTAINER, container))
        .unionByName(fan_out(docs, triple(doc_container, TASK_HAS_FILE, page)))
        .localCheckpoint(eager=False)
    )


def _page_bodies(docs: DataFrame, poison_mod: int | None = None) -> DataFrame:
    """Page bodies for the control graph; ``poison_mod`` nulls the html of
    every doc_id ≡ 7 (mod poison_mod) to exercise the error path."""
    page = F.concat(F.lit("share://doc"), F.col("doc_id"), F.lit(".html"))
    html = _doc_html()
    if poison_mod is not None:
        html = F.when(F.col("doc_id") % poison_mod == 7,
                      F.lit(None).cast("string")).otherwise(html)
    return docs.select(
        page.alias("page_uri"),
        F.concat(F.lit("http://ex/page/"), "doc_id").alias("url"),
        html.alias("html"),
    )


@q("import_pipeline_e2e", _PIPELINE_ORACLE)
def import_pipeline_e2e(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full §3.1 pipeline over a synthetic control graph + document
    pages: scheduled-task star join → page enumeration → extraction →
    triage → valid triples with provenance — and the oracle restates the
    expected valid set (all clean here, so valid = extracted ∪ prov)
    directly from documents."""
    from harvesting_extract_to_ttl_service_spark.plans.pipeline_import import (
        run_import_pipeline,
    )

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < _N_DOCS)
    res = run_import_pipeline(_control_graph(docs), _page_bodies(docs),
                              graph=_G)
    return res["valid"].select("task_uri", "subject", "predicate",
                               "object_value", "object_type")


_ERR_MSG = "ValueError: null html body"  # operators/extract.py null-body raise


def _errors_oracle() -> str:
    from harvesting_extract_to_ttl_service_spark.plans.pipeline_import import (
        ADMS_STATUS,
    )
    from harvesting_extract_to_ttl_service_spark.schema import (
        ERROR_TYPE,
        ERROR_URI_PREFIX,
        MU_UUID,
        OSLC_MESSAGE,
        RDF_TYPE,
        STATUS_FAILED,
        STATUS_SUCCESS,
        TASK_ERROR,
    )

    return f"""
WITH docs AS (SELECT doc_id FROM documents WHERE doc_id < {_N_DOCS}),
err AS (
  SELECT 'urn:task:' || (doc_id % 4) AS task_uri,
         'share://doc' || doc_id || '.html' AS page_uri
  FROM docs WHERE doc_id % 10 = 7
), e AS (
  SELECT task_uri,
         md5(task_uri || '|' || page_uri || '|{_ERR_MSG}') AS id
  FROM err
), tasks AS (
  SELECT DISTINCT 'urn:task:' || (doc_id % 4) AS task_uri FROM docs
), failed AS (SELECT DISTINCT task_uri FROM e)
SELECT '{ERROR_URI_PREFIX}' || id AS subject, '{RDF_TYPE}' AS predicate,
       '{ERROR_TYPE}' AS object_value, 'iri' AS object_type FROM e
UNION ALL
SELECT '{ERROR_URI_PREFIX}' || id, '{MU_UUID}', id, 'literal' FROM e
UNION ALL
SELECT '{ERROR_URI_PREFIX}' || id, '{OSLC_MESSAGE}', '{_ERR_MSG}', 'literal'
FROM e
UNION ALL
SELECT task_uri, '{TASK_ERROR}', '{ERROR_URI_PREFIX}' || id, 'iri' FROM e
UNION ALL
SELECT t.task_uri, '{ADMS_STATUS}',
       CASE WHEN f.task_uri IS NOT NULL
            THEN '{STATUS_FAILED}' ELSE '{STATUS_SUCCESS}' END, 'iri'
FROM tasks t LEFT JOIN failed f ON t.task_uri = f.task_uri
"""


@q("import_pipeline_errors", _errors_oracle())
def import_pipeline_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The failure path of the §3.1 pipeline: pages with doc_id ≡ 7
    (mod 10) carry a null body, so extraction raises per page and the run
    must (a) render each error as the reference's appendTaskError triple
    block — typed oslc:Error resource with mu:uuid + oslc:message and a
    task:error link (lib/task.js:189-206) — and (b) mark exactly the
    affected tasks failed (fail_on_page_error maps the task-level catch of
    lib/pipeline-import.js:111-115 onto page granularity). The oracle
    restates error ids (content-derived md5), messages, links, and the
    failed/success status split directly from documents."""
    from harvesting_extract_to_ttl_service_spark.plans.pipeline_import import (
        ADMS_STATUS,
        run_import_pipeline,
    )

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < _N_DOCS)
    res = run_import_pipeline(_control_graph(docs),
                              _page_bodies(docs, poison_mod=10),
                              graph=_G, fail_on_page_error=True)
    error_triples = res["error_triples"].select(
        "subject", "predicate", "object_value", "object_type")
    status_rows = res["status_updates"].select(
        F.col("task_uri").alias("subject"),
        F.lit(ADMS_STATUS).alias("predicate"),
        F.col("status").alias("object_value"),
        F.lit("iri").alias("object_type"))
    return error_triples.unionByName(status_rows)


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


# @inlist rdf:List construction, oracle-restated: each page carries one
# two-item dct:creator list, so the per-document bnode counter mints
# exactly _:b0/_:b1 and DuckDB can state the whole chain in SQL.
_RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
_INLIST_ORACLE = f"""
WITH docs AS (
    SELECT doc_id,
           'share://doc' || doc_id AS page_uri,
           'urn:doc:' || doc_id    AS subj
    FROM documents WHERE doc_id < {_N_DOCS}
)
SELECT page_uri, subj AS subject,
       'http://purl.org/dc/terms/creator' AS predicate,
       '_:b0' AS object_value, 'bnode' AS object_type FROM docs
UNION ALL
SELECT page_uri, '_:b0', '{_RDF_NS}first', 'a' || doc_id, 'literal' FROM docs
UNION ALL
SELECT page_uri, '_:b0', '{_RDF_NS}rest', '_:b1', 'bnode' FROM docs
UNION ALL
SELECT page_uri, '_:b1', '{_RDF_NS}first', 'b' || doc_id, 'literal' FROM docs
UNION ALL
SELECT page_uri, '_:b1', '{_RDF_NS}rest', '{_RDF_NS}nil', 'iri' FROM docs
"""


@member_sql(_INLIST_ORACLE)
def rdfa_inlist_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RDFa @inlist over synthesized pages: two sibling inlist spans per
    document accumulate into one rdf:first/rdf:rest/rdf:nil chain
    (operators/extract.py local list mapping); the oracle restates the
    full chain including the deterministic per-page bnode labels."""
    from harvesting_extract_to_ttl_service_spark.operators.extract import (
        extract_pages,
    )

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < _N_DOCS)
    html = F.format_string(
        '<div about="urn:doc:%s">'
        '<span property="dct:creator" inlist="">a%s</span>'
        '<span property="dct:creator" inlist="">b%s</span></div>',
        F.col("doc_id").cast("string"), F.col("doc_id").cast("string"),
        F.col("doc_id").cast("string"),
    )
    pages = docs.select(
        F.concat(F.lit("share://doc"), "doc_id").alias("page_uri"),
        F.concat(F.lit("http://ex/page/"), "doc_id").alias("url"),
        html.alias("html"),
    )
    return extract_pages(pages).select(
        "page_uri", "subject", "predicate", "object_value", "object_type")


# RDFa-1.0 xmlns: prefix declarations (legacy government CMS markup): the
# declared prefix must resolve CURIEs exactly like @prefix, and @prefix
# must win for a prefix both declare.
_XMLNS_ORACLE = f"""
WITH docs AS (
    SELECT doc_id,
           array_to_string((string_split(text, ' '))[1:2], ' ') AS title,
           'share://doc' || doc_id AS page_uri,
           'urn:doc:' || doc_id    AS subj
    FROM documents WHERE doc_id < {_N_DOCS}
)
SELECT page_uri, subj AS subject,
       'http://purl.org/dc/elements/1.1/title' AS predicate,
       title AS object_value, 'literal' AS object_type FROM docs
UNION ALL
SELECT page_uri, subj, 'http://xmlns.com/foaf/0.1/name',
       'author ' || doc_id, 'literal' FROM docs
"""


@member_sql(_XMLNS_ORACLE)
def rdfa_xmlns_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RDFa-1.0-style ``xmlns:pfx`` declarations over synthesized pages:
    ``xmlns:dc11`` resolves the title CURIE, and a nested ``prefix``
    re-declaration of ``foaf`` overrides the ancestor's (deliberately
    wrong) ``xmlns:foaf`` — both the merge and the precedence rule are
    oracle-restated (operators/extract.py xmlns handling; the reference's
    extractor lib/rdfa-extractor.js:76-84 inherits the same behavior from
    its DOM RDFa processor)."""
    from harvesting_extract_to_ttl_service_spark.operators.extract import (
        extract_pages,
    )

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < _N_DOCS)
    title = F.concat_ws(" ", F.slice(F.split("text", " "), 1, 2))
    html = F.format_string(
        '<div xmlns:dc11="http://purl.org/dc/elements/1.1/"'
        ' xmlns:foaf="http://xmlns.com/foaf/0.1/WRONG-" about="urn:doc:%s">'
        '<span property="dc11:title">%s</span>'
        '<div prefix="foaf: http://xmlns.com/foaf/0.1/">'
        '<span property="foaf:name">author %s</span></div></div>',
        F.col("doc_id").cast("string"), title,
        F.col("doc_id").cast("string"),
    )
    pages = docs.select(
        F.concat(F.lit("share://doc"), "doc_id").alias("page_uri"),
        F.concat(F.lit("http://ex/page/"), "doc_id").alias("url"),
        html.alias("html"),
    )
    return extract_pages(pages).select(
        "page_uri", "subject", "predicate", "object_value", "object_type")


# HTML5 <time datetime="…"> attribute objects with the HTML+RDFa datatype
# sniff: per doc one xsd:date, one xsd:dateTime, and one xsd:gYear literal.
_XSD = "http://www.w3.org/2001/XMLSchema#"
_TIME_ORACLE = f"""
WITH docs AS (
    SELECT doc_id,
           '2024-03-' || lpad(CAST(doc_id % 28 + 1 AS VARCHAR), 2, '0')
             AS day,
           CAST(2000 + doc_id % 30 AS VARCHAR) AS yr,
           'share://doc' || doc_id AS page_uri,
           'urn:doc:' || doc_id    AS subj
    FROM documents WHERE doc_id < {_N_DOCS}
)
SELECT page_uri, subj AS subject,
       'http://purl.org/dc/terms/issued' AS predicate,
       day AS object_value, '{_XSD}date' AS datatype FROM docs
UNION ALL
SELECT page_uri, subj, 'http://purl.org/dc/terms/modified',
       day || 'T09:05:03', '{_XSD}dateTime' FROM docs
UNION ALL
SELECT page_uri, subj, 'http://purl.org/dc/terms/temporal',
       yr, '{_XSD}gYear' FROM docs
"""


@member_sql(_TIME_ORACLE)
def rdfa_time_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HTML5 ``<time datetime="…">`` objects over synthesized pages: the
    attribute supplies the literal and the HTML+RDFa sniff auto-types it
    (date / dateTime / gYear exercised per document); the oracle restates
    values AND sniffed datatypes (operators/extract.py _DATETIME_SNIFF)."""
    from harvesting_extract_to_ttl_service_spark.operators.extract import (
        extract_pages,
    )

    docs = load(spark, sf_dir, "documents").filter(F.col("doc_id") < _N_DOCS)
    day = F.concat(F.lit("2024-03-"),
                   F.lpad((F.col("doc_id") % 28 + 1).cast("string"), 2, "0"))
    html = F.format_string(
        '<div about="urn:doc:%s">'
        '<time property="dct:issued" datetime="%s">session day</time>'
        '<time property="dct:modified" datetime="%sT09:05:03">at</time>'
        '<time property="dct:temporal" datetime="%s">year</time></div>',
        F.col("doc_id").cast("string"), day, day,
        (F.col("doc_id") % 30 + 2000).cast("string"),
    )
    pages = docs.select(
        F.concat(F.lit("share://doc"), "doc_id").alias("page_uri"),
        F.concat(F.lit("http://ex/page/"), "doc_id").alias("url"),
        html.alias("html"),
    )
    return extract_pages(pages).select(
        "page_uri", "subject", "predicate", "object_value", "datatype")
