"""Core data model: the flat triple schema and RDF vocabulary constants.

Reference mapping (SURVEY.md §1.5): the reference keeps quads in an n3
``Store`` (/root/reference/lib/rdfa-extractor.js:7-8,60) and ships N-Triples
text between stages. Here a triple set is a DataFrame with flat string
columns so that every downstream operator is a plain Catalyst column
expression — no structs, no UDFs in the hot path.
"""

from __future__ import annotations

from pyspark.sql import types as T

# --- namespaces -----------------------------------------------------------
XSD = "http://www.w3.org/2001/XMLSchema#"
RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
RDFS = "http://www.w3.org/2000/01/rdf-schema#"
GEO = "http://www.opengis.net/ont/geosparql#"
PROV = "http://www.w3.org/ns/prov#"
DCT = "http://purl.org/dc/terms/"
ADMS = "http://www.w3.org/ns/adms#"
MU = "http://mu.semte.ch/vocabularies/core/"
TASK = "http://redpencil.data.gift/vocabularies/tasks/"
COGS = "http://vocab.deri.ie/cogs#"
NIE = "http://www.semanticdesktop.org/ontologies/2007/01/19/nie#"
NFO = "http://www.semanticdesktop.org/ontologies/2007/03/22/nfo#"
BESLUIT = "http://data.vlaanderen.be/ns/besluit#"
DBPEDIA = "http://dbpedia.org/ontology/"

# --- datatype IRIs (the reference's de-facto type system, SURVEY.md §1.2) --
XSD_STRING = XSD + "string"
XSD_BOOLEAN = XSD + "boolean"
XSD_DATE = XSD + "date"
XSD_DATETIME = XSD + "dateTime"
XSD_INTEGER = XSD + "integer"
XSD_INT = XSD + "int"
XSD_TIME = XSD + "time"
XSD_DURATION = XSD + "duration"
XSD_GYEAR = XSD + "gYear"
XSD_GYEARMONTH = XSD + "gYearMonth"
RDF_LANGSTRING = RDF + "langString"
RDF_HTML = RDF + "HTML"
RDF_XMLLITERAL = RDF + "XMLLiteral"
RDFS_LITERAL = RDFS + "Literal"
GEO_WKT = GEO + "wktLiteral"
RDF_TYPE = RDF + "type"
RDF_FIRST = RDF + "first"
RDF_REST = RDF + "rest"
RDF_NIL = RDF + "nil"

PROV_WAS_DERIVED_FROM = PROV + "wasDerivedFrom"
PROV_VALUE = PROV + "value"
# NOT the besluit# namespace — the reference hard-codes this exact IRI
# (/root/reference/lib/rdfa-extractor.js:13-14)
EXTRACTED_DECISION_CONTENT = (
    "http://lblod.data.gift/vocabularies/besluit/extractedDecisionContent"
)

# --- task/status constants (/root/reference/constants.js:6-31) ------------
STATUS_SCHEDULED = "http://redpencil.data.gift/id/concept/JobStatus/scheduled"
STATUS_BUSY = "http://redpencil.data.gift/id/concept/JobStatus/busy"
STATUS_SUCCESS = "http://redpencil.data.gift/id/concept/JobStatus/success"
STATUS_FAILED = "http://redpencil.data.gift/id/concept/JobStatus/failed"
TASK_TYPE = "http://redpencil.data.gift/vocabularies/tasks/Task"
IMPORTING_OPERATION = "http://lblod.data.gift/id/jobs/concept/TaskOperation/importing"
EXTRACTING_OPERATION = "http://lblod.data.gift/id/jobs/concept/TaskOperation/extracting"

# --- error-entity constants (/root/reference/constants.js:17-18,29 and
# lib/task.js:189-206 appendTaskError) -------------------------------------
ERROR_TYPE = "http://open-services.net/ns/core#Error"
ERROR_URI_PREFIX = "http://redpencil.data.gift/id/jobs/error/"
MU_UUID = MU + "uuid"
OSLC_MESSAGE = "http://open-services.net/ns/core#message"
TASK_ERROR = TASK + "error"

# --- object_type tags ------------------------------------------------------
OT_IRI = "iri"
OT_LITERAL = "literal"
OT_BNODE = "bnode"

# --- schemas ---------------------------------------------------------------
# Flat triple/quad row (SURVEY.md §1.5). graph carries the named-graph IRI
# (the reference's Virtuoso GRAPH ?g {...} scoping → a plain column here).
TRIPLE_SCHEMA = T.StructType([
    T.StructField("subject", T.StringType(), False),
    T.StructField("predicate", T.StringType(), False),
    T.StructField("object_value", T.StringType(), True),
    T.StructField("object_type", T.StringType(), False),
    T.StructField("datatype", T.StringType(), True),
    T.StructField("language", T.StringType(), True),
    T.StructField("graph", T.StringType(), True),
])

TRIPLE_COLS = [f.name for f in TRIPLE_SCHEMA.fields]

# Delta changeset (/root/reference/lib/delta.js, README.md:38-60):
# a JSON array of {inserts: [...], deletes: [...]} where each term is
# {type, value}.
_TERM = T.StructType([
    T.StructField("type", T.StringType(), True),
    T.StructField("value", T.StringType(), True),
])
_DELTA_TRIPLE = T.StructType([
    T.StructField("subject", _TERM, True),
    T.StructField("predicate", _TERM, True),
    T.StructField("object", _TERM, True),
])
DELTA_SCHEMA = T.StructType([
    T.StructField("inserts", T.ArrayType(_DELTA_TRIPLE), True),
    T.StructField("deletes", T.ArrayType(_DELTA_TRIPLE), True),
])

# Document/page input for the extraction pipeline (FIXTURES.md §B3).
PAGE_SCHEMA = T.StructType([
    T.StructField("page_uri", T.StringType(), False),
    T.StructField("url", T.StringType(), True),
    T.StructField("path", T.StringType(), True),
    T.StructField("html", T.StringType(), True),
])
