"""Extraction-surface tests (FIXTURES.md §B3/§B5): RDFa subset extractor,
provenance injection, special-HTML content spill, fault isolation, and the
file source/sink plumbing."""

import gzip
import os

from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.operators.extract import (
    extract_pages,
    extract_rdfa,
    extraction_pipeline,
    inject_provenance,
)
from harvesting_extract_to_ttl_service_spark.schema import (
    EXTRACTED_DECISION_CONTENT,
    PAGE_SCHEMA,
    PROV_WAS_DERIVED_FROM,
    RDF_FIRST,
    RDF_HTML,
    RDF_LANGSTRING,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
)
from harvesting_extract_to_ttl_service_spark.sources.files import (
    file_metadata_triples,
    read_pages,
    write_ttl,
)

BASE = "http://example.org/doc/1"

RDFA_BODY = """
<html><body>
  <div about="http://ex/decision/1" typeof="besluit:Besluit"
       prefix="ex: http://ex/ns#">
    <span property="dct:title">Budget 2024</span>
    <span property="ex:amount" content="1000"
          datatype="xsd:integer">one thousand</span>
    <span property="dct:description" lang="nl">Begroting</span>
    <a rel="dct:source" href="/source.html">src</a>
  </div>
</body></html>
"""


def test_extract_rdfa_subset():
    triples = extract_rdfa(RDFA_BODY, BASE)
    tset = {(s, p, o, ot, dt, lang) for s, p, o, ot, dt, lang in triples}
    S = "http://ex/decision/1"
    assert (S, RDF_TYPE, "http://data.vlaanderen.be/ns/besluit#Besluit",
            "iri", None, None) in tset
    assert (S, "http://purl.org/dc/terms/title", "Budget 2024",
            "literal", None, None) in tset
    assert (S, "http://ex/ns#amount", "1000", "literal",
            "http://www.w3.org/2001/XMLSchema#integer", None) in tset
    assert (S, "http://purl.org/dc/terms/description", "Begroting",
            "literal", RDF_LANGSTRING, "nl") in tset
    # href resolved against the document base
    assert (S, "http://purl.org/dc/terms/source",
            "http://example.org/source.html", "iri", None, None) in tset


def test_extract_rev_attribute():
    # @rev reverses the link: (resource, pred, subject)
    body = """
    <div about="http://ex/paper">
      <a rev="dct:references" href="http://ex/citing">cited by</a>
    </div>"""
    triples = extract_rdfa(body, BASE)
    assert ("http://ex/citing", "http://purl.org/dc/terms/references",
            "http://ex/paper", "iri", None, None) in triples


def test_extract_hanging_rel_chains_to_nested_subjects():
    # rel with no resource on its own element hangs; EVERY nested element
    # that establishes a subject completes it (RDFa incomplete triples)
    body = """
    <div about="http://ex/committee" rel="ex:member" prefix="ex: http://ex/ns#">
      <div about="http://ex/alice"><span property="dct:title">A</span></div>
      <div about="http://ex/bob">B</div>
    </div>"""
    triples = extract_rdfa(body, BASE)
    assert ("http://ex/committee", "http://ex/ns#member",
            "http://ex/alice", "iri", None, None) in triples
    assert ("http://ex/committee", "http://ex/ns#member",
            "http://ex/bob", "iri", None, None) in triples
    # the nested property attaches to the nested subject, not the parent
    assert ("http://ex/alice", "http://purl.org/dc/terms/title", "A",
            "literal", None, None) in triples


def test_extract_property_typeof_typed_bnode():
    # @property + @typeof (no about/resource): the object is a fresh
    # typed bnode, children inherit it — NOT a text literal
    body = """
    <div about="http://ex/doc">
      <span property="dct:creator" typeof="ex:Person"
            prefix="ex: http://ex/ns#">
        <span property="ex:name">Ada</span>
      </span>
    </div>"""
    triples = extract_rdfa(body, BASE)
    tset = {t for t in triples}
    bnodes = {o for s, p, o, ot, dt, lang in tset
              if p == "http://purl.org/dc/terms/creator"}
    assert len(bnodes) == 1
    [b] = bnodes
    assert b.startswith("_:")
    assert ("http://ex/doc", "http://purl.org/dc/terms/creator", b,
            "bnode", None, None) in tset
    assert (b, RDF_TYPE, "http://ex/ns#Person", "iri", None, None) in tset
    assert (b, "http://ex/ns#name", "Ada", "literal", None, None) in tset


def _follow_list(triples, head):
    """Walk an rdf:first/rdf:rest chain; returns the item values in order."""
    first = {s: (o, ot, dt, lang) for s, p, o, ot, dt, lang in triples
             if p == RDF_FIRST}
    rest = {s: o for s, p, o, ot, dt, lang in triples if p == RDF_REST}
    items = []
    node = head
    while node != RDF_NIL:
        items.append(first[node])
        node = rest[node]
    return items


def test_extract_inlist_builds_rdf_list():
    # @inlist: sibling elements with the same subject+predicate accumulate
    # into ONE rdf:List in document order (RDFa Core local list mapping,
    # lib/rdfa-extractor.js:76-84 delegates to the full processor)
    body = """
    <div about="http://ex/doc">
      <span property="dct:creator" inlist="">First</span>
      <span property="dct:creator" inlist="">Second</span>
      <a rel="dct:source" inlist="" href="http://ex/s1">s1</a>
      <a rel="dct:source" inlist="" href="http://ex/s2">s2</a>
    </div>"""
    triples = extract_rdfa(body, BASE)
    heads = {p: (o, ot) for s, p, o, ot, dt, lang in triples
             if s == "http://ex/doc" and p.startswith("http://purl.org/")}
    # one list head per predicate, as a bnode
    creator_head, creator_ot = heads["http://purl.org/dc/terms/creator"]
    assert creator_ot == "bnode" and creator_head.startswith("_:")
    assert [v for v, *_ in _follow_list(triples, creator_head)] == [
        "First", "Second"]
    source_head, _ = heads["http://purl.org/dc/terms/source"]
    items = _follow_list(triples, source_head)
    assert [(v, ot) for v, ot, *_ in items] == [
        ("http://ex/s1", "iri"), ("http://ex/s2", "iri")]
    # exactly one plain (non-list) triple per predicate: the head link
    assert sum(1 for s, p, *_ in triples
               if s == "http://ex/doc"
               and p == "http://purl.org/dc/terms/creator") == 1


def test_extract_inlist_scoped_per_subject():
    # a new subject gets a fresh list mapping: two docs → two lists, and
    # literal metadata (datatype/lang) rides into rdf:first
    body = """
    <div about="http://ex/a" prefix="ex: http://ex/ns#">
      <span property="ex:v" inlist="" content="1"
            datatype="xsd:integer">one</span>
      <div about="http://ex/b">
        <span property="ex:v" inlist="" lang="nl">twee</span>
      </div>
    </div>"""
    triples = extract_rdfa(body, BASE)
    head_a = next(o for s, p, o, *_ in triples
                  if s == "http://ex/a" and p == "http://ex/ns#v")
    head_b = next(o for s, p, o, *_ in triples
                  if s == "http://ex/b" and p == "http://ex/ns#v")
    assert head_a != head_b
    assert _follow_list(triples, head_a) == [
        ("1", "literal", "http://www.w3.org/2001/XMLSchema#integer", None)]
    assert _follow_list(triples, head_b) == [
        ("twee", "literal", RDF_LANGSTRING, "nl")]


def test_extract_scrubs_replacement_chars():
    body = '<div about="http://ex/s"><span property="dct:title">a�b</span></div>'
    triples = extract_rdfa(body, BASE)
    assert ("http://ex/s", "http://purl.org/dc/terms/title", "ab",
            "literal", None, None) in triples


def _pages_df(spark, rows):
    return spark.createDataFrame(rows, PAGE_SCHEMA)


def test_extract_pages_and_provenance(spark):
    pages = _pages_df(spark, [
        ("share://p1.html", "http://ex/page/1", "/share/p1.html", RDFA_BODY),
        ("share://p2.html", "http://ex/page/2", "/share/p2.html",
         '<div about="http://ex/decision/1"><span property="dct:title">Other</span></div>'),
    ])
    out = inject_provenance(extract_pages(pages))
    prov = out.filter(F.col("predicate") == PROV_WAS_DERIVED_FROM)
    # one prov triple per distinct subject per page (FIXTURES.md §B5);
    # the same subject on two pages gets one per page
    rows = {(r.subject, r.object_value) for r in prov.collect()}
    assert ("http://ex/decision/1", "http://ex/page/1") in rows
    assert ("http://ex/decision/1", "http://ex/page/2") in rows
    assert prov.count() == prov.select("page_uri", "subject").distinct().count()


def test_extract_fault_isolation(spark):
    pages = _pages_df(spark, [
        ("share://ok.html", "http://ex/page/ok", None,
         '<div about="http://ex/s"><span property="dct:title">T</span></div>'),
        ("share://bad.html", "http://ex/page/bad", None, None),  # null body
    ])
    out = extract_pages(pages)
    errs = out.filter(F.col("error").isNotNull())
    assert errs.count() == 1
    assert errs.first().page_uri == "share://bad.html"
    # the good page still extracted — failure is row-local, not job-fatal
    assert out.filter(F.col("error").isNull()).count() >= 1


def test_content_spill(spark):
    body = (
        '<div about="http://ex/decision/9">'
        '<div property="prov:value" datatype="rdf:HTML"><p>Full decision</p></div>'
        "</div>"
    )
    pages = _pages_df(spark, [
        ("share://p9.html", "http://ex/page/9", "/share/p9.html", body)])
    triples, spilled = extraction_pipeline(pages)

    spill_rows = spilled.collect()
    assert len(spill_rows) == 1
    assert "<p>Full decision</p>" in spill_rows[0].content
    file_uri = spill_rows[0].file_uri

    main = triples.filter(F.col("predicate") == EXTRACTED_DECISION_CONTENT)
    row = main.first()
    # predicate rewritten prov:value → extractedDecisionContent, object
    # swapped to the (content-addressed) file IRI, datatype cleared
    assert row.object_value == file_uri
    assert row.object_type == "iri"
    assert row.datatype is None
    assert triples.filter(F.col("datatype") == RDF_HTML).count() == 0


def test_read_pages_gz_and_sink(spark, tmp_path):
    d = tmp_path / "share"
    d.mkdir()
    (d / "a.html").write_text(RDFA_BODY)
    with gzip.open(d / "b.html.gz", "wt") as f:
        f.write('<div about="http://ex/s2"><span property="dct:title">B</span></div>')

    pages = read_pages(spark, str(d))
    assert pages.count() == 2
    assert {r.html[:4] for r in pages.collect()} == {"\n<ht", "<div"}

    triples, _ = extraction_pipeline(pages)
    ok = triples.filter(F.col("error").isNull()).drop("error")
    out_dir = str(tmp_path / "out")
    write_ttl(ok.withColumn("graph", F.lit(None).cast("string")), out_dir)
    parts = [p for p in os.listdir(out_dir) if p.startswith("page_uri=")]
    assert len(parts) == 2  # one output dir per page


def test_file_metadata_triples(spark):
    files = spark.createDataFrame(
        [("http://data.lblod.info/id/files/abc", "content.html", "text/html",
          1234, "html", "http://ex/page/1")],
        "file_uri string, filename string, format string, size long, "
        "extension string, source string",
    ).withColumn("created", F.lit("2024-01-02 03:04:05").cast("timestamp"))
    md = file_metadata_triples(files)
    rows = {(r.subject, r.predicate, r.object_value) for r in md.collect()}
    assert ("http://data.lblod.info/id/files/abc",
            "http://www.semanticdesktop.org/ontologies/2007/03/22/nfo#fileSize",
            "1234") in rows
    assert ("share://abc.html",
            "http://www.semanticdesktop.org/ontologies/2007/01/19/nie#dataSource",
            "http://data.lblod.info/id/files/abc") in rows
    assert md.count() == 8


def test_hanging_rel_not_completed_by_property_href_child():
    # a child consuming @href as a property OBJECT does not establish a
    # new subject — it must neither complete the ancestor's hanging rel
    # (which would mint a bogus self-triple) nor stop deeper descendants
    # from completing it
    body = """
    <div about="http://ex/a" rel="ex:knows" prefix="ex: http://ex/ns#">
      <span href="http://ex/b" property="ex:name">Bob</span>
      <div about="http://ex/c">C</div>
    </div>"""
    triples = extract_rdfa(body, BASE)
    knows = {(s, o) for s, p, o, ot, dt, lang in triples
             if p == "http://ex/ns#member" or p == "http://ex/ns#knows"}
    assert ("http://ex/a", "http://ex/a") not in knows  # no self-triple
    assert ("http://ex/a", "http://ex/c") in knows
    # the span's href is the property object
    assert ("http://ex/a", "http://ex/ns#name", "http://ex/b",
            "iri", None, None) in triples


def test_strict_completion_inherited_subject():
    """strict_completion=True follows RDFa Core step 12: a non-skipped
    child (here @property-only) completes the parent's hanging @rel with
    its INHERITED subject — the spec's degenerate self-triple — while the
    default subset still completes on minted subjects only."""
    body = """
    <div about="http://ex/a" rel="ex:knows" prefix="ex: http://ex/ns#">
      <span property="ex:name">Bob</span>
      <div about="http://ex/c">C</div>
    </div>"""
    strict = extract_rdfa(body, BASE, strict_completion=True)
    knows = [(s, o) for s, p, o, *_ in strict if p == "http://ex/ns#knows"]
    assert ("http://ex/a", "http://ex/a") in knows  # spec self-triple
    # incomplete triples are carried to EACH child independently (same
    # as the minted-subject chaining test), so the sibling completes too
    assert ("http://ex/a", "http://ex/c") in knows

    default = extract_rdfa(body, BASE)
    knows_d = [(s, o) for s, p, o, *_ in default if p == "http://ex/ns#knows"]
    assert ("http://ex/a", "http://ex/a") not in knows_d
    assert ("http://ex/a", "http://ex/c") in knows_d


def test_hanging_rev_onto_bnode_subject_is_bnode_object():
    body = """
    <div typeof="ex:Org" rev="ex:member" prefix="ex: http://ex/ns#">
      <span about="http://ex/alice">x</span>
    </div>"""
    triples = extract_rdfa(body, BASE)
    member = [(s, o, ot) for s, p, o, ot, dt, lang in triples
              if p == "http://ex/ns#member"]
    assert len(member) == 1
    s, o, ot = member[0]
    assert s == "http://ex/alice" and o.startswith("_:") and ot == "bnode"


def test_extract_xmlns_prefix_declarations():
    """RDFa-1.0-style xmlns:pfx declarations (old CMS output) merge into
    the prefix map like @prefix, inherit into the subtree, and @prefix
    wins when both declare the same prefix."""
    body = """
    <div xmlns:dc11="http://purl.org/dc/elements/1.1/"
         xmlns:foaf="http://xmlns.com/foaf/0.1/x-"
         about="http://ex/doc">
      <span property="dc11:title">Old CMS Title</span>
      <div prefix="foaf: http://xmlns.com/foaf/0.1/">
        <span property="foaf:name">Alice</span>
      </div>
    </div>"""
    triples = extract_rdfa(body, BASE)
    tset = {(s, p, o) for s, p, o, *_ in triples}
    # xmlns: declaration resolves the CURIE and inherits down
    assert ("http://ex/doc", "http://purl.org/dc/elements/1.1/title",
            "Old CMS Title") in tset
    # @prefix beats the ancestor xmlns: for the same prefix
    assert ("http://ex/doc", "http://xmlns.com/foaf/0.1/name",
            "Alice") in tset


def test_extract_time_datetime_objects():
    """<time datetime="…"> supplies the object value with the HTML+RDFa
    datatype sniff; @content beats @datetime; explicit @datatype beats
    the sniff; non-time elements ignore a datetime attribute."""
    XSD = "http://www.w3.org/2001/XMLSchema#"
    body = """
    <div about="http://ex/session" prefix="ex: http://ex/ns#">
      <time property="ex:day" datetime="2023-05-07">May the 7th</time>
      <time property="ex:at" datetime="2023-05-07T09:05:03">then</time>
      <time property="ex:tod" datetime="09:05:03">morning</time>
      <time property="ex:dur" datetime="PT2H30M">long</time>
      <time property="ex:ym" datetime="2023-05">that month</time>
      <time property="ex:year" datetime="2023">that year</time>
      <time property="ex:free" datetime="someday" lang="en">free</time>
      <time property="ex:explicit" datetime="2023"
            datatype="xsd:string">typed</time>
      <time property="ex:content" datetime="2023-05-07"
            content="override">x</time>
      <span property="ex:span" datetime="2023-05-07">not a time el</span>
    </div>"""
    triples = extract_rdfa(body, BASE)
    by_p = {p: (o, dt, lang) for s, p, o, ot, dt, lang in triples}
    E = "http://ex/ns#"
    assert by_p[E + "day"] == ("2023-05-07", XSD + "date", None)
    assert by_p[E + "at"] == ("2023-05-07T09:05:03", XSD + "dateTime", None)
    assert by_p[E + "tod"] == ("09:05:03", XSD + "time", None)
    assert by_p[E + "dur"] == ("PT2H30M", XSD + "duration", None)
    assert by_p[E + "ym"] == ("2023-05", XSD + "gYearMonth", None)
    assert by_p[E + "year"] == ("2023", XSD + "gYear", None)
    # unrecognized shape → plain literal, language still applies
    assert by_p[E + "free"] == ("someday", RDF_LANGSTRING, "en")
    # explicit @datatype beats the sniff
    assert by_p[E + "explicit"] == ("2023", XSD + "string", None)
    # @content beats @datetime
    assert by_p[E + "content"] == ("override", None, None)
    # datetime on a non-time element is ignored → text content
    assert by_p[E + "span"] == ("not a time el", None, None)


def test_extraction_pipeline_single_python_stage(spark):
    """Round-5 perf pin: the extraction pipeline (and the composed import
    pipeline's valid output) must keep exactly ONE mapInPandas stage in
    the plan. Provenance is emitted in-worker (extract_pages
    with_provenance) precisely so no union branch duplicates the Python
    extraction subtree — a second copy executes the extraction twice per
    job (the pre-round-5 shape)."""
    pages = _pages_df(spark, [
        ("share://p1.html", "http://ex/page/1", "/share/p1.html", RDFA_BODY)])
    triples, _spilled = extraction_pipeline(pages)
    plan = triples._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("MapInPandas") == 1
    # provenance rows are still produced (in-worker, not as a union branch)
    assert triples.filter(
        F.col("predicate") == PROV_WAS_DERIVED_FROM).count() >= 1


def test_import_pipeline_valid_single_python_stage(spark):
    from harvesting_extract_to_ttl_service_spark.plans.pipeline_import import (
        run_import_pipeline,
    )
    from harvesting_extract_to_ttl_service_spark.schema import (
        RDF_TYPE,
        STATUS_SCHEDULED,
        TASK_TYPE,
        EXTRACTING_OPERATION,
    )
    from harvesting_extract_to_ttl_service_spark.plans.pipeline_import import (
        ADMS_STATUS,
        TASK_HAS_FILE,
        TASK_INPUT_CONTAINER,
        TASK_OPERATION,
    )

    def t(s, p, o, ot="iri"):
        return (s, p, o, ot, None, None, None)

    control = spark.createDataFrame(
        [t("urn:task:1", RDF_TYPE, TASK_TYPE),
         t("urn:task:1", ADMS_STATUS, STATUS_SCHEDULED),
         t("urn:task:1", TASK_OPERATION, EXTRACTING_OPERATION),
         t("urn:task:1", TASK_INPUT_CONTAINER, "urn:c:1"),
         t("urn:c:1", TASK_HAS_FILE, "share://p1.html")],
        "subject string, predicate string, object_value string, "
        "object_type string, datatype string, language string, graph string")
    bodies = _pages_df(spark, [
        ("share://p1.html", "http://ex/page/1", "/share/p1.html", RDFA_BODY)])
    res = run_import_pipeline(control, bodies)
    for out in ("valid", "invalid", "corrected"):
        plan = res[out]._jdf.queryExecution().optimizedPlan().toString()
        assert plan.count("MapInPandas") == 1, out
    # error block: one explode over a 4-struct array, not a 4-way union —
    # and the error rows are cut (lazy localCheckpoint), so the plan shows
    # the extraction subtree at most once (0 = hidden behind the
    # checkpoint node, which materializes it exactly once)
    plan = res["error_triples"]._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("MapInPandas") <= 1
    # spilled-file metadata: one explode over an 8-struct array
    plan = res["spilled_metadata"]._jdf.queryExecution().optimizedPlan().toString()
    assert plan.count("MapInPandas") == 1
