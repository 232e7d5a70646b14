"""Property-based checks (SURVEY.md §5.3, hypothesis): N-Triples
encode∘decode roundtrip over adversarial literal content, and triage
partition invariants / repair idempotence over generated dirty batches."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
import pytest
from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.functions.ntriples import (
    decode_ntriples,
    encode_ntriples,
)
from harvesting_extract_to_ttl_service_spark.operators.triage import (
    corrected_triples,
    dropped_triples,
    invalid_triples,
    triage,
    valid_triples,
)
from harvesting_extract_to_ttl_service_spark.schema import (
    TRIPLE_SCHEMA,
    XSD_BOOLEAN,
    XSD_DATE,
    XSD_INTEGER,
)

# Lexical forms that stress the escaper: quotes, backslashes, control
# chars, unicode, the escape sequences themselves as text (\\u0041 must
# roundtrip as TEXT, not decode), and the decoder's U+0001 sentinel
# (escaped on encode). U+0000 is deliberately absent: its only escape
# form (backslash-u0000) is rejected by the decoder (sentinel collision,
# store-layer-invalid anyway), so NUL literals cannot roundtrip.
_literals = st.lists(
    st.one_of(
        st.characters(min_codepoint=0x20, max_codepoint=0x7E),
        st.sampled_from(['"', "\\", "\n", "\r", "\t", "é", "€", "中", "𝄞",
                         "\x01"]),
        # multi-char tokens: escape sequences as literal TEXT — these must
        # survive the roundtrip verbatim, not decode
        st.sampled_from(["\\u0041", "\\U0001D11E", "\\\\u00E9"]),
    ),
    max_size=40,
).map("".join)

_SETTINGS = dict(max_examples=6, deadline=None,
                 suppress_health_check=[HealthCheck.too_slow])


@given(values=st.lists(_literals, min_size=1, max_size=40))
@settings(**_SETTINGS)
def test_roundtrip_property(spark, values):
    rows = [
        (f"http://s/{i}", "http://p", v, "literal", None, None, None)
        for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    lines = encode_ntriples(df).select(F.col("nt").alias("value"))
    back = decode_ntriples(lines, "value")
    got = {(r.subject, r.object_value) for r in back.collect()}
    want = {(f"http://s/{i}", v) for i, v in enumerate(values)}
    assert got == want


_dirty_objects = st.one_of(
    st.tuples(st.sampled_from(["true", "false", "TRUE", "False", "yes", ""]),
              st.just(XSD_BOOLEAN)),
    st.tuples(st.sampled_from(["2023-05-07", "2023-5-7", "2023/05/07",
                               "notadate", "7 May 2023", ""]),
              st.just(XSD_DATE)),
    st.tuples(st.sampled_from(["42", "4.2", "x", ""]), st.just(XSD_INTEGER)),
    st.tuples(st.text(max_size=10), st.just("urn:dt:unknown")),
    st.tuples(st.text(max_size=10), st.none()),
)


@given(objs=st.lists(_dirty_objects, min_size=1, max_size=60))
@settings(**_SETTINGS)
@pytest.mark.slow
def test_triage_partition_invariants(spark, objs):
    rows = [
        (f"http://s/{i}", "http://p", v, "literal", dt, None, None)
        for i, (v, dt) in enumerate(objs)
    ]
    df = spark.createDataFrame(rows, TRIPLE_SCHEMA)
    t = triage(df).cache()
    n = t.count()
    n_valid_first = t.filter(F.col("is_valid")).count()
    valid, invalid = valid_triples(t), invalid_triples(t)
    corrected, dropped = corrected_triples(t), dropped_triples(t)

    # valid = passed ∪ repaired ; corrected ⊆ invalid ;
    # dropped = invalid ∖ corrected ; everything accounted for
    assert valid.count() == n_valid_first + corrected.count()
    assert invalid.count() == corrected.count() + dropped.count()
    assert n == n_valid_first + invalid.count()

    # repair idempotence: triaging the valid output changes nothing
    t2 = triage(valid)
    assert t2.filter(~F.col("is_valid")).count() == 0
    t.unpersist()


# --- RDFa extractor robustness (pure Python, no Spark) --------------------
# Per-page fault isolation (extract_pages) catches exceptions, but the
# parser itself must not throw on garbage: a crash-per-page corpus would
# produce 100% error rows. Mix free text with RDFa-ish fragments so the
# attribute-handling paths (prefix parsing, CURIE resolution, inlist,
# hanging rel, typeof bnodes) all get fuzzed, not just the tokenizer.

_rdfa_fragments = st.sampled_from([
    '<div about="http://x/a" rel="dct:x">',
    '<span property="dct:t" inlist="">v</span>',
    '<span property="x:y" prefix="x: http://x#">v</span>',
    '<span property=":" datatype=":::">v</span>',
    '<a rel="dct:s" href="/r">r</a>', "</div>", "</span>",
    '<div typeof="ex:T" rev="ex:m">', '<p property="dct:t">',
    '<div prefix="broken">', '<div prefix="a: b: c:">',
    '<span about="[safe]" property="p">v</span>',
    '<meta content="c" property="dct:m"/>',
    "<div inlist>", "&amp;", "&bogus;", "<!-- c -->", "<![CDATA[x]]>",
])


_json_values = st.recursive(
    st.one_of(st.none(), st.booleans(), st.integers(), st.text(max_size=20)),
    lambda children: st.one_of(
        st.lists(children, max_size=4),
        st.dictionaries(st.text(max_size=8), children, max_size=4)),
    max_leaves=10)


@given(body=st.one_of(st.text(max_size=60), _json_values))
@settings(max_examples=200, deadline=None)
def test_ingest_delta_post_never_crashes(tmp_path_factory, body):
    """The front door must answer every body with ingest-or-ValueError
    (HTTP 400), never an unhandled exception (HTTP 500)."""
    import json

    from harvesting_extract_to_ttl_service_spark.streaming.delta_stream import (
        ingest_delta_post,
    )

    d = str(tmp_path_factory.mktemp("delta"))
    raw = body if isinstance(body, str) else json.dumps(body)
    try:
        out = ingest_delta_post(raw, d)
    except (ValueError, json.JSONDecodeError):
        return
    assert out is None or out.endswith(".json")


@given(parts=st.lists(
    st.one_of(st.text(max_size=40), _rdfa_fragments), max_size=20))
@settings(max_examples=200, deadline=None)
def test_extract_rdfa_never_raises(parts):
    from harvesting_extract_to_ttl_service_spark.operators.extract import (
        extract_rdfa,
    )

    html = "".join(parts)
    for strict in (False, True):
        triples = extract_rdfa(html, "http://base/doc", strict_completion=strict)
        for s, p, o, ot, dt, lang in triples:
            assert s and p and ot in ("iri", "literal", "bnode")
            assert o is not None


# ---------------------------------------------------------------------------
# resize_target (multimodal): pure integer math, no Spark needed
# ---------------------------------------------------------------------------

@settings(deadline=None)  # first call pays the module import
@given(w=st.integers(1, 100_000), h=st.integers(1, 100_000),
       max_side=st.integers(1, 4096))
def test_resize_target_properties(w, h, max_side):
    from harvesting_extract_to_ttl_service_spark.operators.multimodal import (
        resize_target,
    )

    nw, nh = resize_target(w, h, max_side)
    # inside the box, never zero
    assert 1 <= nw <= max(w, max_side) and 1 <= nh <= max(h, max_side)
    assert max(nw, nh) <= max(max_side, 1)
    # never upscales
    assert nw <= w and nh <= h
    # no-op when already inside the box
    if max(w, h) <= max_side:
        assert (nw, nh) == (w, h)
    else:
        # the longest side lands exactly on the box edge
        assert max(nw, nh) == max_side or max(nw, nh) == 1
        # aspect ratio preserved within floor-rounding: the true scaled
        # value of the short side is within 1 of the integer result
        scale = max_side / max(w, h)
        if w >= h:
            assert abs(nh - h * scale) <= 1
        else:
            assert abs(nw - w * scale) <= 1
    # idempotent
    assert resize_target(nw, nh, max_side) == (nw, nh)


# ---------------------------------------------------------------------------
# Turtle prefix compaction: expanding pfx:local with the prefix map must
# recover the original IRI (compaction is information-preserving)
# ---------------------------------------------------------------------------

_TURTLE_PREFIXES = {"ex": "http://ex/ns#", "sub": "http://ex/ns#sub/"}


@settings(deadline=None, suppress_health_check=[HealthCheck.too_slow],
          max_examples=30)
@given(local=st.text(
    alphabet=st.characters(min_codepoint=0x21, max_codepoint=0x7E,
                           exclude_characters='<>"{}|^`\\'),
    min_size=1, max_size=20))
def test_turtle_compaction_expands_back(spark, local):
    from harvesting_extract_to_ttl_service_spark.functions.ntriples import (
        compact_iri,
    )

    iri = "http://ex/ns#" + local
    row = (spark.range(1)
           .select(compact_iri(F.lit(iri), _TURTLE_PREFIXES).alias("t"))
           .first())
    token = row.t
    if token.startswith("<"):
        # fell back to full form: must reproduce the IRI verbatim
        assert token == f"<{iri}>"
    else:
        pfx, _, rest = token.partition(":")
        assert _TURTLE_PREFIXES[pfx] + rest == iri


# --- retrieval properties (operators/retrieval.py) -------------------------

# token alphabet kept small so generated corpora share terms (df > 1)
# but include unicode + mixed case to stress the lowercasing contract
_words = st.sampled_from(["cat", "Cat", "dog", "fish", "the", "é", "中",
                          "x1", "a"])
_texts = st.one_of(
    st.none(),
    st.lists(_words, max_size=8).map(" ".join),
)


# the single sequential BM25 mirror lives next to the unit tests —
# pytest's default rootdir-prepend import mode puts tests/ on sys.path
from test_retrieval import _mirror_bm25  # noqa: E402


def _py_bm25(docs, qterms):
    return {d: s for d, (_hits, s)
            in _mirror_bm25(qterms, docs=docs).items()}


@given(texts=st.lists(_texts, min_size=1, max_size=10),
       query=st.lists(_words, min_size=1, max_size=3))
@settings(**_SETTINGS)
def test_bm25_matches_mirror_property(spark, texts, query):
    """bm25_topk over arbitrary small corpora (NULLs, empties, unicode,
    mixed case, repeated terms) equals the sequential mirror on both
    membership and score."""
    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        bm25_topk,
    )

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {r.doc_id: r.score
           for r in bm25_topk(df, query, k=len(docs) + 1).collect()}
    assert got == _py_bm25(docs, query)


@given(texts=st.lists(_texts, min_size=1, max_size=8),
       phrase=st.lists(_words, min_size=1, max_size=3))
@settings(**_SETTINGS)
def test_phrase_counts_matches_scan_property(spark, texts, phrase):
    """phrase_counts (positional intersection) equals a direct sliding-
    window scan counting overlapping occurrences of the lowercased
    phrase."""
    from harvesting_extract_to_ttl_service_spark.operators.retrieval import (
        phrase_counts,
    )

    docs = list(enumerate(texts))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    p = [w.lower() for w in phrase]
    want = {}
    for i, t in docs:
        toks = (t or "").lower().split()
        c = sum(1 for j in range(len(toks) - len(p) + 1)
                if toks[j:j + len(p)] == p)
        if c:
            want[i] = c
    got = {r.id: r.phrase_tf for r in phrase_counts(df, phrase).collect()}
    assert got == want
