"""Golden triage cases — one per row of the SURVEY.md §1.2 datatype table
(FIXTURES.md §B4), asserting validateTriple.js + fixTriple.js semantics,
plus the triage partition invariants and fix-idempotence property."""

import pytest
from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.operators.triage import (
    corrected_triples,
    dropped_triples,
    invalid_triples,
    triage,
    valid_triples,
)
from harvesting_extract_to_ttl_service_spark.schema import (
    GEO_WKT,
    RDF_HTML,
    RDF_LANGSTRING,
    RDF_XMLLITERAL,
    RDFS_LITERAL,
    TRIPLE_SCHEMA,
    XSD_BOOLEAN,
    XSD_DATE,
    XSD_DATETIME,
    XSD_INT,
    XSD_INTEGER,
    XSD_STRING,
)

S, P = "http://s", "http://p"

# (case_id-as-subject, object_value, object_type, datatype, language)
#   → expected verdict, expected fixed object (value, datatype) or None
CASES = [
    ("iri-ok", "http://b", "iri", None, None, "valid", None),
    ("bnode-obj", "_:b0", "bnode", None, None, "dropped", None),
    ("plain-ok", "x", "literal", None, None, "valid", None),
    ("string-ok", "x", "literal", XSD_STRING, None, "valid", None),
    ("langstring-ok", "x", "literal", RDF_LANGSTRING, "nl", "valid", None),
    ("langstring-empty", "x", "literal", RDF_LANGSTRING, None, "fixed",
     ("x", XSD_STRING)),
    ("rdfs-literal", "x", "literal", RDFS_LITERAL, None, "fixed", ("x", XSD_STRING)),
    ("xmlliteral", "<x/>", "literal", RDF_XMLLITERAL, None, "fixed",
     ("<x/>", XSD_STRING)),
    ("html-ok", "<p>x</p>", "literal", RDF_HTML, None, "valid", None),
    ("bool-ok", "true", "literal", XSD_BOOLEAN, None, "valid", None),
    ("bool-case", "TRUE", "literal", XSD_BOOLEAN, None, "fixed",
     ("true", XSD_BOOLEAN)),
    ("bool-bad", "yes", "literal", XSD_BOOLEAN, None, "dropped", None),
    ("date-ok", "2023-05-07", "literal", XSD_DATE, None, "valid", None),
    ("date-tz-ok", "2023-05-07Z", "literal", XSD_DATE, None, "valid", None),
    ("date-fixable", "2023/05/07", "literal", XSD_DATE, None, "fixed",
     ("2023-05-07", XSD_DATE)),
    # single-digit components: the reference repairs these via the lax JS
    # Date parser (fixTriple.js:148-162); we canonicalize to zero-padded
    ("date-short", "2023-5-7", "literal", XSD_DATE, None, "fixed",
     ("2023-05-07", XSD_DATE)),
    ("date-bad", "notadate", "literal", XSD_DATE, None, "dropped", None),
    ("datetime-ok", "2023-05-07T09:05:03Z", "literal", XSD_DATETIME, None,
     "valid", None),
    ("datetime-frac-ok", "2023-05-07T09:05:03.123+02:00", "literal",
     XSD_DATETIME, None, "valid", None),
    ("datetime-fixable", "2023/05/07 09:05:03", "literal", XSD_DATETIME, None,
     "fixed", ("2023-05-07T09:05:03", XSD_DATETIME)),
    ("datetime-short", "2023-5-7T9:5:3", "literal", XSD_DATETIME, None,
     "fixed", ("2023-05-07T09:05:03", XSD_DATETIME)),
    # JS Date.parse envelope (fixTriple.js:148-162): month-name forms with
    # and without comma, day-first European, and RFC-2822 with weekday and
    # zone tokens — all repair in the reference, so they repair here
    ("date-month-name", "May 7, 2023", "literal", XSD_DATE, None, "fixed",
     ("2023-05-07", XSD_DATE)),
    ("date-month-name-nocomma", "May 7 2023", "literal", XSD_DATE, None,
     "fixed", ("2023-05-07", XSD_DATE)),
    ("date-day-first", "7 November 2023", "literal", XSD_DATE, None, "fixed",
     ("2023-11-07", XSD_DATE)),
    ("date-rfc-short-month", "07 Oct 2023", "literal", XSD_DATE, None,
     "fixed", ("2023-10-07", XSD_DATE)),
    ("datetime-rfc2822", "Sat, 07 Oct 2023 9:05:03 GMT", "literal",
     XSD_DATETIME, None, "fixed", ("2023-10-07T09:05:03", XSD_DATETIME)),
    ("date-full-weekday", "Thursday, 7 December 2023", "literal", XSD_DATE,
     None, "fixed", ("2023-12-07", XSD_DATE)),
    ("date-multi-space", "May  7   2023", "literal", XSD_DATE, None,
     "fixed", ("2023-05-07", XSD_DATE)),
    ("datetime-month-name-no-sec", "May 7 2023 9:05", "literal", XSD_DATETIME,
     None, "fixed", ("2023-05-07T09:05:00", XSD_DATETIME)),
    ("integer-ok", "42", "literal", XSD_INTEGER, None, "valid", None),
    # Number() quirk: floats pass xsd:integer (validateTriple.js:136-139)
    ("integer-float-quirk", "4.2", "literal", XSD_INTEGER, None, "valid", None),
    ("integer-bad", "four", "literal", XSD_INTEGER, None, "dropped", None),
    # Number() edge parity: isNaN(Number('NaN')) is true in JS even though
    # Spark's double cast parses it; 0x/0b/0o radix prefixes are valid JS
    # Numbers the cast rejects; Infinity is a non-NaN JS Number
    ("integer-nan", "NaN", "literal", XSD_INTEGER, None, "dropped", None),
    ("integer-hex", "0x1A", "literal", XSD_INTEGER, None, "valid", None),
    ("integer-bin", "0b101", "literal", XSD_INTEGER, None, "valid", None),
    ("integer-inf", "Infinity", "literal", XSD_INTEGER, None, "valid", None),
    ("int-recast", "42", "literal", XSD_INT, None, "fixed", ("42", XSD_INTEGER)),
    ("int-bad", "four", "literal", XSD_INT, None, "dropped", None),
    ("wkt-ok", "POINT(1 2)", "literal", GEO_WKT, None, "valid", None),
    ("wkt-http-ok", "<http://crs.org/x> POINT(1 2)", "literal", GEO_WKT, None,
     "valid", None),
    ("wkt-https", "<https://crs.org/x> POINT(1 2)", "literal", GEO_WKT, None,
     "fixed", ("<http://crs.org/x> POINT(1 2)", GEO_WKT)),
    ("wkt-empty", "", "literal", GEO_WKT, None, "dropped", None),
    ("unknown-datatype", "x", "literal", "http://example/custom", None,
     "dropped", None),
]


def _df(spark):
    rows = [(f"http://case/{cid}", P, ov, ot, dt, lang, None)
            for cid, ov, ot, dt, lang, _, _ in CASES]
    # bnode subject case (any position → dropped, fixTriple.js:25-27)
    rows.append(("_:bsub", P, "x", "literal", None, None, None))
    return spark.createDataFrame(rows, TRIPLE_SCHEMA)


def test_golden_verdicts(spark):
    out = triage(_df(spark)).collect()
    by_subject = {r.subject: r for r in out}
    for cid, _ov, _ot, _dt, _lang, want_verdict, want_fix in CASES:
        r = by_subject[f"http://case/{cid}"]
        assert r.verdict == want_verdict, (cid, r.verdict, want_verdict)
        if want_fix is not None:
            assert (r.fixed_object_value, r.fixed_datatype) == want_fix, (
                cid, (r.fixed_object_value, r.fixed_datatype), want_fix)
    assert by_subject["_:bsub"].verdict == "dropped"


def test_triage_invariants(spark):
    t = triage(_df(spark))
    n = t.count()
    valid = valid_triples(t)
    invalid = invalid_triples(t)
    corrected = corrected_triples(t)
    dropped = dropped_triples(t)
    n_pass = t.filter(F.col("verdict") == "valid").count()
    assert valid.count() == n_pass + corrected.count()
    assert invalid.count() == corrected.count() + dropped.count()
    assert n == n_pass + invalid.count()
    # corrected ⊆ invalid (original forms)
    assert corrected.exceptAll(invalid).count() == 0


@pytest.mark.slow
def test_fix_idempotent(spark):
    """A repaired triple must validate (validate∘fix property)."""
    t = triage(_df(spark))
    repaired = valid_triples(t)  # fixed rows now in fixed form
    re_triaged = triage(repaired)
    assert re_triaged.filter(F.col("verdict") != "valid").count() == 0


def test_compat_mode_js_date_goldens(spark):
    """compat=True reproduces the reference's JS-Date re-emission
    bug-for-bug (fixTriple.js:152-156, 201-208): month zero-padded for
    Jan-Sep only by accident of two-digit months, day/hour/minute/second
    NOT padded. Default mode stays canonical."""
    rows = [
        ("d-slash", "2023/05/07", XSD_DATE),
        ("d-short", "2023-5-7", XSD_DATE),
        ("d-late", "2023/11/23", XSD_DATE),
        ("dt-slash", "2023/05/07 09:05:03", XSD_DATETIME),
        ("dt-short", "2023-5-7T9:5:3", XSD_DATETIME),
    ]
    df = spark.createDataFrame(
        [(f"http://s/{k}", P, v, "literal", dt, None, None)
         for k, v, dt in rows], TRIPLE_SCHEMA)

    compat = {r.subject.split("/")[-1]: r.fixed_object_value
              for r in triage(df, compat=True).collect()}
    assert compat == {
        "d-slash": "2023-05-7",
        "d-short": "2023-05-7",
        "d-late": "2023-11-23",
        "dt-slash": "2023-05-7T9:5:3",
        "dt-short": "2023-05-7T9:5:3",
    }

    canonical = {r.subject.split("/")[-1]: r.fixed_object_value
                 for r in triage(df).collect()}
    assert canonical == {
        "d-slash": "2023-05-07",
        "d-short": "2023-05-07",
        "d-late": "2023-11-23",
        "dt-slash": "2023-05-07T09:05:03",
        "dt-short": "2023-05-07T09:05:03",
    }


def test_java_double_suffixes_rejected(spark):
    """Java Double.parseDouble accepts '1.5d'/'1.5f'/hex-floats; JS
    Number() does not — the grammar-based check must drop them."""
    rows = [(f"http://s/{i}", P, v, "literal", XSD_INTEGER, None, None)
            for i, v in enumerate(["1.5d", "1.5f", "0x1.8p1", "42.", ".5",
                                   "+.5e3", "1e999"])]
    out = {r.subject: r.verdict
           for r in triage(spark.createDataFrame(rows, TRIPLE_SCHEMA)).collect()}
    assert out["http://s/0"] == "dropped"   # 1.5d
    assert out["http://s/1"] == "dropped"   # 1.5f
    assert out["http://s/2"] == "dropped"   # hex float
    assert out["http://s/3"] == "valid"     # '42.' is valid JS
    assert out["http://s/4"] == "valid"     # '.5'
    assert out["http://s/5"] == "valid"     # '+.5e3'
    assert out["http://s/6"] == "valid"     # overflow -> Infinity, not NaN


def test_js_whitespace_padded_numerics(spark):
    """Number() trims all JS whitespace (tab/LF/NBSP), not just spaces."""
    rows = [(f"http://s/{i}", P, v, "literal", XSD_INTEGER, None, None)
            for i, v in enumerate(["\t42", "1.5\n", " 42\t ", " 7",
                                   "4 2"])]
    out = {r.subject: r.verdict
           for r in triage(spark.createDataFrame(rows, TRIPLE_SCHEMA)).collect()}
    assert out["http://s/0"] == "valid"
    assert out["http://s/1"] == "valid"
    assert out["http://s/2"] == "valid"
    assert out["http://s/3"] == "valid"    # NBSP-padded
    assert out["http://s/4"] == "dropped"  # interior whitespace is not


def test_compat_tz_shifts_only_zone_carrying_inputs(spark):
    """compat_tz pins the JS-local divergence (fixTriple.js:152-156,
    201-208): a reference deployed in a non-UTC zone re-emits repaired
    instants through local Date getters, shifting exactly the inputs
    that carried an explicit zone marker (the GMT/UTC suffix forms — the
    only zone-carrying shapes the repair parse accepts). Zone-less
    inputs parse local and re-emit local in JS → component identity,
    never shifted."""
    rows = [
        # 23:30 UTC → 01:30 next day in Europe/Brussels (CEST, +2 in May)
        ("dt-gmt", "Sun, 07 May 2023 23:30:00 GMT", XSD_DATETIME),
        # zone-less: must be identical with and without compat_tz
        ("dt-naive", "2023/05/07 23:30:00", XSD_DATETIME),
        # date with a zone marker: midnight UTC is the previous evening
        # in America/New_York → the DAY shifts
        ("d-gmt", "Sun, 07 May 2023 GMT", XSD_DATE),
    ]
    df = spark.createDataFrame(
        [(f"http://s/{k}", P, v, "literal", dt, None, None)
         for k, v, dt in rows], TRIPLE_SCHEMA)

    def fixed(**kw):
        return {r.subject.split("/")[-1]: r.fixed_object_value
                for r in triage(df, **kw).collect()}

    # default: naive-UTC (byte parity with a TZ=UTC reference)
    assert fixed(compat=True) == {
        "dt-gmt": "2023-05-7T23:30:0",
        "dt-naive": "2023-05-7T23:30:0",
        "d-gmt": "2023-05-7",
    }
    # Brussels deployment: the GMT instant crosses midnight
    brussels = fixed(compat=True, compat_tz="Europe/Brussels")
    assert brussels["dt-gmt"] == "2023-05-8T1:30:0"
    assert brussels["dt-naive"] == "2023-05-7T23:30:0"  # unshifted
    # New York deployment: the date's DAY shifts backwards
    ny = fixed(compat=True, compat_tz="America/New_York")
    assert ny["d-gmt"] == "2023-05-6"
    assert ny["dt-naive"] == "2023-05-7T23:30:0"
    # compat_tz also applies to canonical (non-compat) re-emission
    assert fixed(compat_tz="Europe/Brussels")["dt-gmt"] == "2023-05-08T01:30:00"
