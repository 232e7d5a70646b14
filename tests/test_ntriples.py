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


def test_uchar_escape_decode(spark):
    lines = spark.createDataFrame([
        # \u BMP escape (A), \U non-BMP escape (𝄞 U+1D11E), and an escaped
        # backslash followed by 'u0041' which must NOT decode
        (1, '<http://a> <http://p> "x\\u0041y" .'),
        (2, '<http://a> <http://p> "clef \\U0001D11E" .'),
        (3, '<http://a> <http://p> "raw \\\\u0041" .'),
        (4, '<http://a> <http://p> "caf\\u00E9" .'),
    ], ["id", "value"])
    got = {r.id: r.object_value
           for r in decode_ntriples(lines, keep_errors=True).collect()}
    assert got[1] == "xAy"
    assert got[2] == "clef \U0001D11E"
    assert got[3] == "raw \\u0041"
    assert got[4] == "café"


def test_sentinel_chars_flag_invalid(spark):
    lines = spark.createDataFrame([
        # raw U+0001 / U+0000 inside the literal satisfy the grammar but
        # collide with the decoder sentinels → parse_ok = false, and the
        # undecodable NUL escape likewise
        (1, '<http://a> <http://p> "bad\x01sep" .'),
        (2, '<http://a> <http://p> "bad\x00nul" .'),
        (3, '<http://a> <http://p> "esc\\u0000nul" .'),
        (4, '<http://a> <http://p> "fine" .'),
    ], ["id", "value"])
    got = {r.id: r.parse_ok
           for r in decode_ntriples(lines, keep_errors=True).collect()}
    assert got == {1: False, 2: False, 3: False, 4: True}


def test_sentinel_roundtrip_via_escapes(spark):
    # a value containing U+0001 encodes to the backslash-u0001
    # escape and decodes back exactly
    df = spark.createDataFrame(
        [("http://a", "http://p", "ctl\x01char", "literal", None, None, None)],
        TRIPLE_SCHEMA)
    lines = encode_ntriples(df).select(F.col("nt").alias("value"))
    [line] = lines.collect()
    assert "\\u0001" in line.value and "\x01" not in line.value
    [back] = decode_ntriples(lines).collect()
    assert back.object_value == "ctl\x01char"


def test_escaped_backslash_u0000_text_is_valid(spark):
    # backslash + 'u0000' as literal TEXT (not a NUL escape): the encoded
    # line contains an ESCAPED backslash before 'u0000' and must decode
    # back verbatim, not be flagged as a sentinel collision
    df = spark.createDataFrame(
        [("http://a", "http://p", "\\u0000 as text", "literal",
          None, None, None)], TRIPLE_SCHEMA)
    lines = encode_ntriples(df).select(F.col("nt").alias("value"))
    out = decode_ntriples(lines, keep_errors=True).collect()
    assert out[0].parse_ok
    assert out[0].object_value == "\\u0000 as text"


def test_turtle_encoder_golden(spark):
    from harvesting_extract_to_ttl_service_spark.functions.ntriples import (
        encode_turtle,
        turtle_prefix_header,
    )
    from harvesting_extract_to_ttl_service_spark.schema import XSD_DATE

    RDF = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
    prefixes = {"ex": "http://ex/ns#", "xsd": "http://www.w3.org/2001/XMLSchema#",
                "long": "http://ex/ns#sub/"}
    rows = [
        # compaction on every position; rdf:type → a
        ("http://ex/ns#s1", RDF + "type", "http://ex/ns#T", "iri",
         None, None, None),
        # datatype IRI compacts too
        ("http://ex/ns#s1", "http://ex/ns#born", "2023-05-07", "literal",
         XSD_DATE, None, None),
        # unknown namespace stays <...>
        ("http://other/x", "http://ex/ns#p", "http://other/y", "iri",
         None, None, None),
        # unsafe local name (slash) falls back to <...>
        ("http://ex/ns#a/b", "http://ex/ns#p", "v", "literal",
         None, None, None),
        # longest namespace wins
        ("http://ex/ns#sub/ok", "http://ex/ns#p", "v", "literal",
         None, None, None),
        # langString + bnodes unchanged
        ("_:b0", "http://ex/ns#p", "hallo", "literal",
         "http://www.w3.org/1999/02/22-rdf-syntax-ns#langString", "nl", None),
    ]
    df = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    got = {r.subject: r.ttl for r in encode_turtle(df, prefixes).collect()}
    assert got["http://ex/ns#s1"] in (
        "ex:s1 a ex:T .", 'ex:s1 ex:born "2023-05-07"^^xsd:date .')
    lines = {r.ttl for r in encode_turtle(df, prefixes).collect()}
    assert "ex:s1 a ex:T ." in lines
    assert 'ex:s1 ex:born "2023-05-07"^^xsd:date .' in lines
    assert "<http://other/x> ex:p <http://other/y> ." in lines
    assert '<http://ex/ns#a/b> ex:p "v" .' in lines
    assert 'long:ok ex:p "v" .' in lines
    assert '_:b0 ex:p "hallo"@nl .' in lines
    header = turtle_prefix_header(prefixes)
    assert header.splitlines()[0] == "@prefix ex: <http://ex/ns#> ."
    assert "@prefix xsd: <http://www.w3.org/2001/XMLSchema#> ." in header


def test_write_ttl_turtle_mode(spark, tmp_path):
    import os

    from harvesting_extract_to_ttl_service_spark.sources.files import write_ttl

    rows = [("http://ex/ns#s", "http://ex/ns#p", "v", "literal", None, None,
             None, "share://p1")]
    df = spark.createDataFrame(
        rows, "subject string, predicate string, object_value string, "
        "object_type string, datatype string, language string, graph string, "
        "page_uri string")
    out = str(tmp_path / "ttl")
    write_ttl(df, out, turtle_prefixes={"ex": "http://ex/ns#"})
    header = open(os.path.join(out, "_prefixes.ttl")).read()
    assert header == "@prefix ex: <http://ex/ns#> .\n"
    # partition dir name is URL-encoded by Spark; find it robustly
    dirs = [d for d in os.listdir(out) if d.startswith("page_uri=")]
    assert len(dirs) == 1
    lines = []
    for p in os.listdir(os.path.join(out, dirs[0])):
        if p.startswith("part-"):
            lines += open(os.path.join(out, dirs[0], p)).read().splitlines()
    assert lines == ['ex:s ex:p "v" .']


def test_compact_ttl_tree(spark, tmp_path):
    """Two write_ttl batches leave multiple part files per partition dir;
    compaction rewrites to exactly one file per dir with identical
    content."""
    import glob
    import os

    from harvesting_extract_to_ttl_service_spark.sources.files import (
        compact_ttl_tree,
        write_ttl,
    )

    def batch(vals):
        rows = [("http://s/" + v, "http://p", v, "literal", None, None,
                 None, "p1") for v in vals]
        return spark.createDataFrame(
            rows, "subject string, predicate string, object_value string, "
            "object_type string, datatype string, language string, "
            "graph string, page_uri string").repartition(4)

    src = str(tmp_path / "src")
    dst = str(tmp_path / "dst")
    write_ttl(batch(["a", "b", "c", "d"]), src)
    # second batch appends more parts into the same partition via dynamic
    # overwrite of a DIFFERENT page — plus rewrite p1 with more rows
    write_ttl(batch(["a", "b", "c", "d", "e", "f", "g", "h"]), src)

    stats = compact_ttl_tree(spark, src, dst)
    assert stats["rows"] == 8
    assert stats["files_after"] < stats["files_before"]
    dirs = [d for d in os.listdir(dst) if d.startswith("page_uri=")]
    assert len(dirs) == 1
    parts = glob.glob(os.path.join(dst, dirs[0], "part-*"))
    assert len(parts) == 1
    src_lines = set()
    for p in glob.glob(os.path.join(src, "**", "part-*"), recursive=True):
        src_lines |= set(open(p).read().splitlines())
    dst_lines = set(open(parts[0]).read().splitlines())
    assert dst_lines == src_lines

    # missing partition column → explicit error, not a silent flat rewrite
    import pytest
    flat = str(tmp_path / "flat")
    spark.createDataFrame([("x",)], "value string").write.text(flat)
    with pytest.raises(ValueError, match="partition column"):
        compact_ttl_tree(spark, flat, str(tmp_path / "out2"))


def test_encoder_null_term_surfaces(spark):
    """A null term must never silently serialize as a shortened (but
    superficially valid) statement — raise by default, skip/keep on
    request (ADVICE r5: concat_ws silently skipped null components)."""
    import pytest
    from py4j.protocol import Py4JJavaError

    from harvesting_extract_to_ttl_service_spark.functions.ntriples import (
        encode_turtle,
    )

    rows = [
        ("http://a", "http://p", "ok", "literal", None, None, None),
        ("http://a", "http://p", None, "literal", None, None, None),
    ]
    df = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    with pytest.raises(Exception, match="null term") as ei:
        encode_ntriples(df).collect()
    assert isinstance(ei.value, Py4JJavaError) or "null term" in str(ei.value)
    with pytest.raises(Exception, match="null term"):
        encode_turtle(df, {"ex": "http://ex/"}).collect()

    kept = encode_ntriples(df, on_null="keep").collect()
    assert sorted([r.nt is None for r in kept]) == [False, True]
    skipped = encode_ntriples(df, on_null="skip").collect()
    assert [r.nt for r in skipped] == ['<http://a> <http://p> "ok" .']

    with pytest.raises(ValueError, match="on_null"):
        encode_ntriples(df, on_null="explode")


def test_write_ttl_prefix_header_conflict(spark, tmp_path):
    """Same prefix map across micro-batches → single stable header;
    a different map must refuse to overwrite it (earlier partitions were
    encoded under the old map)."""
    import os

    import pytest

    from harvesting_extract_to_ttl_service_spark.sources.files import write_ttl

    def batch(page):
        rows = [("http://ex/ns#s", "http://ex/ns#p", "v", "literal", None,
                 None, None, page)]
        return spark.createDataFrame(
            rows, "subject string, predicate string, object_value string, "
            "object_type string, datatype string, language string, "
            "graph string, page_uri string")

    out = str(tmp_path / "ttl")
    write_ttl(batch("p1"), out, turtle_prefixes={"ex": "http://ex/ns#"})
    # same map: idempotent no-op
    write_ttl(batch("p2"), out, turtle_prefixes={"ex": "http://ex/ns#"})
    assert open(os.path.join(out, "_prefixes.ttl")).read() == \
        "@prefix ex: <http://ex/ns#> .\n"
    with pytest.raises(ValueError, match="disagrees"):
        write_ttl(batch("p3"), out, turtle_prefixes={"ex": "http://other/"})
    # the conflict must fail BEFORE touching any partition: no p3 tree,
    # and no partition re-encoded under the rejected map
    assert not [d for d in os.listdir(out) if "p3" in d]
    header_now = open(os.path.join(out, "_prefixes.ttl")).read()
    assert header_now == "@prefix ex: <http://ex/ns#> .\n"


def test_compact_ttl_tree_carries_prefix_header(spark, tmp_path):
    """Compacting a Turtle-mode tree must carry _prefixes.ttl: prefixed
    names without their @prefix block are a different document."""
    import os

    from harvesting_extract_to_ttl_service_spark.sources.files import (
        compact_ttl_tree,
        write_ttl,
    )

    rows = [("http://ex/ns#s", "http://ex/ns#p", "v", "literal", None, None,
             None, "p1")]
    df = spark.createDataFrame(
        rows, "subject string, predicate string, object_value string, "
        "object_type string, datatype string, language string, graph string, "
        "page_uri string")
    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_ttl(df, src, turtle_prefixes={"ex": "http://ex/ns#"})
    compact_ttl_tree(spark, src, dst)
    assert open(os.path.join(dst, "_prefixes.ttl")).read() == \
        "@prefix ex: <http://ex/ns#> .\n"
