"""PySpark-native analytics engine with the data-processing capabilities of
lblod/harvesting-extract-to-ttl-service (reference: /root/reference/, studied
behaviorally — see SURVEY.md).

The reference is a row-at-a-time Node.js RDF ETL microservice; this engine
re-expresses every operator it executes (locally or via SPARQL delegation)
as idiomatic Spark DataFrame transformations over a flat triple schema,
plus large-scale LLM-data-pipeline extensions (dedup, similarity search,
text analysis, multimodal plumbing).

Layout:
  schema        — TRIPLE_SCHEMA + RDF/XSD constants (SURVEY.md §1.5)
  functions/    — column-expression libraries (N-Triples codec, terms)
  operators/    — triage, relational (B1-B11), dedup, similarity, text
  sources/      — delta changesets, RDFa document extraction
  plans/        — end-to-end pipeline compositions
  streaming/    — Structured Streaming surface
"""

from harvesting_extract_to_ttl_service_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
