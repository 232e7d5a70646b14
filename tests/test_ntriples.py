"""N-Triples codec: encode∘decode roundtrip + golden lines (SURVEY.md §5.3)."""

from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.functions.ntriples import (
    decode_ntriples,
    encode_ntriples,
)
from harvesting_extract_to_ttl_service_spark.schema import (
    RDF_LANGSTRING,
    TRIPLE_SCHEMA,
    XSD_DATE,
    XSD_STRING,
)

TRIPLES = [
    # subject, predicate, object_value, object_type, datatype, language, graph
    ("http://a", "http://p", "http://b", "iri", None, None, None),
    ("http://a", "http://p", "plain text", "literal", None, None, None),
    ("http://a", "http://p", "typed", "literal", XSD_STRING, None, None),
    ("http://a", "http://p", "hallo", "literal", RDF_LANGSTRING, "nl", None),
    ("http://a", "http://p", "2023-05-07", "literal", XSD_DATE, None, None),
    ("http://a", "http://p", 'quote " back \\ newline \n tab \t', "literal",
     None, None, None),
    ("_:b0", "http://p", "_:b1", "bnode", None, None, None),
]

GOLDEN = {
    "http://b": "<http://a> <http://p> <http://b> .",
    "hallo": '<http://a> <http://p> "hallo"@nl .',
    "2023-05-07":
        '<http://a> <http://p> "2023-05-07"^^<http://www.w3.org/2001/XMLSchema#date> .',
    "_:b1": "_:b0 <http://p> _:b1 .",
}


def test_roundtrip(spark):
    df = spark.createDataFrame(TRIPLES, TRIPLE_SCHEMA)
    lines = encode_ntriples(df).select(F.col("nt").alias("value"))
    back = decode_ntriples(lines)
    got = {
        (r.subject, r.predicate, r.object_value, r.object_type, r.language)
        for r in back.collect()
    }
    want = {(s, p, o, t, lang) for s, p, o, t, _dt, lang, _g in TRIPLES}
    assert got == want
    # typed-string and plain literals both decode with null/xsd-string dt folded
    assert back.count() == len(TRIPLES)


def test_golden_lines(spark):
    df = spark.createDataFrame(TRIPLES, TRIPLE_SCHEMA)
    lines = {r.object_value: r.nt for r in encode_ntriples(df).collect()}
    for k, v in GOLDEN.items():
        assert lines[k] == v, (k, lines[k])


def test_parse_error_flagged(spark):
    lines = spark.createDataFrame(
        [("this is not ntriples",), ('<http://a> <http://p> "ok" .',)], ["value"])
    out = decode_ntriples(lines, keep_errors=True)
    rows = {r.value: r for r in out.collect()}
    assert not rows["this is not ntriples"].parse_ok
    assert rows["this is not ntriples"].subject is None
    assert rows['<http://a> <http://p> "ok" .'].parse_ok
