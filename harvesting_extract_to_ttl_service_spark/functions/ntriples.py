"""N-Triples encoder/decoder as pure column expressions.

Reference behavior covered (SURVEY.md §2A A9/A10/A21):
  * serialize: n3 Store → N-Triples lines, trimmed, empties dropped
    (/root/reference/lib/rdfa-extractor.js:103-114)
  * parse: one line → quad, parse error → invalid
    (/root/reference/lib/validateTriple.js:10-25, lib/fixTriple.js:10-17)
  * escaping: sparqlEscape* equivalents (reference uses the mu template's
    escape helpers; here the N-Triples string escape rules)

Everything is `pyspark.sql.functions` — JVM-side, whole-stage-codegen
friendly; no Python UDFs. The decoder is a regex over `spark.read.text`
lines, which at scale means a parallel scan with no Python boundary.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.schema import (
    OT_BNODE,
    OT_IRI,
    OT_LITERAL,
    RDF_LANGSTRING,
    XSD_STRING,
)

# Sentinel used to make backslash-escape substitution order-correct in a
# chain of regexp_replace calls (no lookaround state machine needed).
_SENT = "\x00"


def escape_literal(col: Column) -> Column:
    """Escape a lexical form for inclusion in an N-Triples double-quoted
    literal: backslash, quote, LF, CR, TAB, plus the two control chars the
    decoder uses as internal sentinels (U+0000/U+0001 → ``\\uXXXX`` so an
    encode→decode roundtrip never ships a raw sentinel byte)."""
    c = F.regexp_replace(col, r"\\", r"\\\\")
    c = F.regexp_replace(c, '"', '\\\\"')
    c = F.regexp_replace(c, "\n", "\\\\n")
    c = F.regexp_replace(c, "\r", "\\\\r")
    c = F.regexp_replace(c, "\t", "\\\\t")
    c = F.regexp_replace(c, "\x00", r"\\u0000")
    c = F.regexp_replace(c, "\x01", r"\\u0001")
    return c


def _decode_uchar_escapes(c: Column) -> Column:
    """Decode ``\\uXXXX`` / ``\\UXXXXXXXX`` numeric escapes (N-Triples
    UCHAR, which the reference's N3.Parser decodes) as pure column
    expressions: split the string before each candidate escape, then per
    segment hex-decode the code point via UTF-16BE (non-BMP code points
    are converted to their surrogate pair arithmetically — Spark's
    ``decode`` has no UTF-32 charset).

    MUST run while escaped backslashes are still hidden as ``_SENT``:
    that is what distinguishes a genuine ``\\u0041`` escape from the text
    ``\\\\u0041`` (escaped backslash followed by 'u0041'). The whole pass
    is gated on a cheap ``rlike`` so escape-free literals (the common
    case) skip the split entirely."""

    def seg(p: Column) -> Column:
        rest4 = p.substr(F.lit(7), F.length(p))
        cp8 = F.conv(F.substring(p, 3, 8), 16, 10).cast("long")
        rest8 = p.substr(F.lit(11), F.length(p))
        hi = F.floor((cp8 - 0x10000) / 0x400) + 0xD800
        lo = (cp8 - 0x10000) % 0x400 + 0xDC00
        sup = F.decode(
            F.unhex(F.concat(F.lpad(F.hex(hi), 4, "0"),
                             F.lpad(F.hex(lo), 4, "0"))), "UTF-16BE")
        bmp8 = F.decode(F.unhex(F.lpad(F.hex(cp8), 4, "0")), "UTF-16BE")
        return (
            F.when(p.rlike(r"^\\u[0-9A-Fa-f]{4}"),
                   F.concat(F.decode(F.unhex(F.substring(p, 3, 4)),
                                     "UTF-16BE"), rest4))
            .when(p.rlike(r"^\\U[0-9A-Fa-f]{8}"),
                  F.concat(F.when(cp8 < 0x10000, bmp8).otherwise(sup), rest8))
            .otherwise(p))

    decoded = F.array_join(
        F.transform(F.split(c, r"(?=\\[uU])"), seg), "")
    return F.when(c.rlike(r"\\[uU]"), decoded).otherwise(c)


def unescape_literal(col: Column) -> Column:
    """Inverse of :func:`escape_literal` (two-pass with sentinel so that
    ``\\\\n`` decodes to backslash+n, not backslash+LF), including
    ``\\uXXXX``/``\\UXXXXXXXX`` numeric escapes. ``\\u0000`` is NOT
    decodable (U+0000 is the sentinel); :func:`decode_ntriples` marks
    lines carrying it invalid before this runs."""
    c = F.regexp_replace(col, r"\\\\", _SENT)
    c = F.regexp_replace(c, r"\\n", "\n")
    c = F.regexp_replace(c, r"\\r", "\r")
    c = F.regexp_replace(c, r"\\t", "\t")
    c = F.regexp_replace(c, r'\\"', '"')
    c = _decode_uchar_escapes(c)
    c = F.regexp_replace(c, _SENT, r"\\")
    return c


def term_to_nt(value: Column, object_type: Column, datatype: Column,
               language: Column) -> Column:
    """Render one term as its N-Triples token.

    Plain / xsd:string literals are written bare (n3's Writer does the
    same); langString carries ``@tag``; other datatypes ``^^<iri>``.
    """
    literal = F.concat(F.lit('"'), escape_literal(value), F.lit('"'))
    literal = (
        F.when(
            (datatype == RDF_LANGSTRING) & (F.coalesce(language, F.lit("")) != ""),
            F.concat(literal, F.lit("@"), language),
        )
        .when(
            datatype.isNotNull() & (datatype != XSD_STRING) & (datatype != RDF_LANGSTRING),
            F.concat(literal, F.lit("^^<"), datatype, F.lit(">")),
        )
        .otherwise(literal)
    )
    return (
        F.when(object_type == OT_IRI, F.concat(F.lit("<"), value, F.lit(">")))
        .when(object_type == OT_BNODE, value)  # value already '_:b0'-style
        .otherwise(literal)
    )


def subject_to_nt(subject: Column) -> Column:
    """Subjects are IRIs unless they carry the '_:' bnode prefix."""
    return F.when(subject.startswith("_:"), subject).otherwise(
        F.concat(F.lit("<"), subject, F.lit(">"))
    )


def _null_guard(line: Column, df: DataFrame, out_col: str,
                on_null: str, encoder: str) -> DataFrame:
    """Attach the (null-propagating) ``line`` to ``df`` under the
    ``on_null`` policy. A row with any NULL term yields a NULL line —
    a ``concat_ws`` formulation instead silently SKIPS the null component,
    serializing e.g. ``<subj> <pred> .`` — a malformed-but-plausible
    statement a downstream parser may even accept as something else.

      * ``'raise'`` (default): fail the job naming the bad row — a null
        term reaching a serializer is an upstream bug (triage routes
        invalid rows away; error rows have their own sink);
      * ``'skip'``: drop null-term rows;
      * ``'keep'``: keep the NULL line for the caller to handle."""
    if on_null not in ("raise", "skip", "keep"):
        raise ValueError(f"on_null={on_null!r}: one of 'raise', 'skip', "
                         f"'keep'")
    if on_null == "raise":
        line = F.coalesce(line, F.raise_error(F.concat_ws(
            " ",
            F.lit(f"{encoder}: null term in triple row; subject="),
            F.coalesce(F.col("subject"), F.lit("<null>")),
            F.lit("predicate="),
            F.coalesce(F.col("predicate"), F.lit("<null>")),
        )))
    out = df.withColumn(out_col, line)
    if on_null == "skip":
        out = out.filter(F.col(out_col).isNotNull())
    return out


def encode_ntriples(df: DataFrame, out_col: str = "nt",
                    on_null: str = "raise") -> DataFrame:
    """Add a column with the full N-Triples line for each triple row
    (reference: rdfSerializer application/n-triples + trim + drop-empty,
    /root/reference/lib/rdfa-extractor.js:108-113). Null-term rows
    surface per ``on_null`` (:func:`_null_guard`) instead of silently
    serializing shortened statements."""
    line = F.concat(
        subject_to_nt(F.col("subject")),
        F.lit(" <"), F.col("predicate"), F.lit("> "),
        term_to_nt(F.col("object_value"), F.col("object_type"),
                   F.col("datatype"), F.col("language")),
        F.lit(" ."),
    )
    return _null_guard(line, df, out_col, on_null, "encode_ntriples")


# One regex, evaluated per capture group. Groups:
#  1 subject IRI   2 subject bnode
#  3 predicate IRI
#  4 object IRI    5 object bnode
#  6 object literal lexical (escaped)  7 language tag  8 datatype IRI
_NT_LINE = (
    r'^\s*(?:<([^<>"\s]*)>|(_:\S+))'
    r'\s+<([^<>"\s]*)>'
    r'\s+(?:<([^<>"\s]*)>|(_:\S+)|"((?:[^"\\]|\\.)*)"(?:@([A-Za-z][A-Za-z0-9-]*)|\^\^<([^<>"\s]*)>)?)'
    r"\s*\.\s*$"
)


# Group separator for the single-pass group extraction below; U+0001 cannot
# appear in conforming N-Triples source text.
_GSEP = "\x01"


def decode_ntriples(lines: DataFrame, col: str = "value",
                    graph: str | None = None,
                    keep_errors: bool = False) -> DataFrame:
    """Parse a DataFrame of N-Triples text lines into TRIPLE_SCHEMA columns.

    A line that does not match the grammar gets ``parse_ok = false`` and
    null terms — the reference treats a parse error as an invalid triple
    (/root/reference/lib/validateTriple.js:13-15), so downstream triage
    maps ``parse_ok = false`` → dropped.

    Perf note: the grammar regex is evaluated ONCE per row (all eight
    capture groups are spliced into a single ``_g`` array via
    regexp_replace + split). Evaluating ``regexp_extract`` per group
    instead blows generated code past the JVM 64 KB method limit and drops
    the stage out of whole-stage codegen — observed, not hypothetical.
    """
    c = F.col(col)
    repl = _GSEP.join(f"${i}" for i in range(1, 9))
    # Raw U+0000/U+0001 ARE permitted inside literals by the grammar
    # ([^"\\]), but they collide with the decoder's internal sentinels and
    # would silently mis-split the capture groups / corrupt the backslash
    # restore — mark such lines invalid instead of mis-parsing them. Same
    # for the backslash-u0000 escape (whose decoded value is the
    # sentinel); the reference stack rejects NUL literals at the store.
    # The escape guard needs backslash-run parity: an ESCAPED backslash
    # followed by the text 'u0000' (raw form `\\u0000`) is a legal NUL-free
    # literal, so only an odd backslash run before u0000 is a real escape.
    unsafe = (c.contains(_SENT) | c.contains(_GSEP)
              | c.rlike(r"(^|[^\\])(\\\\)*\\(u0000|U00000000)"))
    lines = (
        lines.withColumn("parse_ok", c.rlike(_NT_LINE) & ~unsafe)
        .withColumn("_g", F.split(F.regexp_replace(c, _NT_LINE, repl), _GSEP))
    )
    g = lambda i: F.col("_g").getItem(i - 1)  # noqa: E731
    parsed = (
        lines.withColumn(
            "subject",
            F.when(F.col("parse_ok"),
                   F.when(g(2) != "", g(2)).otherwise(g(1))),
        )
        .withColumn("predicate", F.when(F.col("parse_ok"), g(3)))
        .withColumn(
            "object_type",
            F.when(~F.col("parse_ok"), F.lit(None).cast("string"))
            .when(g(4) != "", F.lit(OT_IRI))
            .when(g(5) != "", F.lit(OT_BNODE))
            .otherwise(F.lit(OT_LITERAL)),
        )
        .withColumn(
            "object_value",
            F.when(~F.col("parse_ok"), F.lit(None).cast("string"))
            .when(g(4) != "", g(4))
            .when(g(5) != "", g(5))
            .otherwise(unescape_literal(g(6))),
        )
        .withColumn(
            "language",
            F.when(F.col("parse_ok") & (g(7) != ""), g(7)),
        )
        .withColumn(
            "datatype",
            F.when(~F.col("parse_ok"), F.lit(None).cast("string"))
            .when(g(7) != "", F.lit(RDF_LANGSTRING))
            .when(g(8) != "", g(8))
            .otherwise(F.lit(None).cast("string")),
        )
        .withColumn("graph", F.lit(graph).cast("string"))
        .drop("_g")
    )
    if not keep_errors:
        parsed = parsed.filter(F.col("parse_ok"))
    return parsed


def read_ntriples(spark, path: str, graph: str | None = None,
                  keep_errors: bool = True) -> DataFrame:
    """Scan `.nt` files (gz handled by extension — reference gunzips
    explicitly at /root/reference/lib/rdfa-extractor.js:65-68; Spark's text
    source selects the codec from the filename).

    ``keep_errors`` defaults to True because the reference treats a line
    that fails to parse as an INVALID triple, not as absent
    (/root/reference/lib/validateTriple.js:13-15) — triage maps
    ``parse_ok = false`` to 'dropped', so counts match. Pass False to
    silently skip garbage lines instead."""
    lines = spark.read.text(path)
    lines = lines.filter(F.trim(F.col("value")) != "")
    return decode_ntriples(lines, "value", graph=graph,
                           keep_errors=keep_errors)

# ---------------------------------------------------------------------------
# Turtle encoder (prefix compaction)
# ---------------------------------------------------------------------------

# Conservative PN_LOCAL subset: compaction only fires when the remainder
# after the namespace is a simple name (letters/digits/_/-, not starting
# with '-', no dots — dots carry end-of-statement ambiguity in Turtle).
_PN_LOCAL_SAFE = r"^[A-Za-z0-9_][A-Za-z0-9_-]*$"


def compact_iri(iri: Column, prefixes: dict[str, str]) -> Column:
    """IRI → ``pfx:local`` when it starts with a declared namespace and the
    remainder is a safe local name; otherwise ``<iri>``. Longest namespace
    wins (checked first), so nested namespaces compact to the most
    specific prefix. Pure column expressions — a CASE chain, one
    ``startswith`` + anchored rlike per declared prefix."""
    out = F.concat(F.lit("<"), iri, F.lit(">"))
    for pfx, ns in sorted(prefixes.items(), key=lambda kv: len(kv[1])):
        local = F.substr(iri, F.lit(len(ns) + 1), F.length(iri))
        out = F.when(
            iri.startswith(ns) & local.rlike(_PN_LOCAL_SAFE),
            F.concat(F.lit(pfx + ":"), local),
        ).otherwise(out)
    return out


def term_to_turtle(value: Column, object_type: Column, datatype: Column,
                   language: Column, prefixes: dict[str, str]) -> Column:
    """Turtle object token: like :func:`term_to_nt`, with IRIs (including
    datatype IRIs) prefix-compacted."""
    literal = F.concat(F.lit('"'), escape_literal(value), F.lit('"'))
    literal = (
        F.when(
            (datatype == RDF_LANGSTRING)
            & (F.coalesce(language, F.lit("")) != ""),
            F.concat(literal, F.lit("@"), language),
        )
        .when(
            datatype.isNotNull() & (datatype != XSD_STRING)
            & (datatype != RDF_LANGSTRING),
            F.concat(literal, F.lit("^^"), compact_iri(datatype, prefixes)),
        )
        .otherwise(literal)
    )
    return (
        F.when(object_type == OT_IRI, compact_iri(value, prefixes))
        .when(object_type == OT_BNODE, value)
        .otherwise(literal)
    )


def turtle_prefix_header(prefixes: dict[str, str]) -> str:
    """The ``@prefix`` block to prepend to a Turtle document using
    :func:`encode_turtle` lines (sorted for deterministic output)."""
    return "\n".join(f"@prefix {pfx}: <{ns}> ."
                     for pfx, ns in sorted(prefixes.items()))


def encode_turtle(df: DataFrame, prefixes: dict[str, str],
                  out_col: str = "ttl", on_null: str = "raise") -> DataFrame:
    """Add a Turtle statement column per triple row: subject / predicate /
    object with prefix compaction (``rdf:type`` additionally renders as
    ``a``). One triple per line — valid Turtle, no subject/predicate
    grouping, so the encoder stays a pure projection (grouping would be a
    per-subject sort + aggregation for cosmetics only). N-Triples output
    (:func:`encode_ntriples`) remains the reference-parity surface
    (the reference's .ttl files contain N-Triples lines,
    /root/reference/lib/rdfa-extractor.js:108-113); this is the
    prefix-compacted form a downstream consumer of /share trees reads."""
    rdf_type = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
    subj = F.when(F.col("subject").startswith("_:"), F.col("subject")) \
        .otherwise(compact_iri(F.col("subject"), prefixes))
    pred = F.when(F.col("predicate") == rdf_type, F.lit("a")) \
        .otherwise(compact_iri(F.col("predicate"), prefixes))
    line = F.concat(
        subj, F.lit(" "), pred, F.lit(" "),
        term_to_turtle(F.col("object_value"), F.col("object_type"),
                       F.col("datatype"), F.col("language"), prefixes),
        F.lit(" ."),
    )
    return _null_guard(line, df, out_col, on_null, "encode_turtle")
