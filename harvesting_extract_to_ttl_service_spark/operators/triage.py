"""Triple validation, repair, and 3-way triage — the reference's semantic
heart, compiled to Catalyst column expressions (no UDFs).

Reference parity (SURVEY.md §1.2 / §2A A13-A15):
  * validateTriple / validateTerm   /root/reference/lib/validateTriple.js:9-139
  * fixTriple / fixTerm (+fixers)   /root/reference/lib/fixTriple.js:9-214
  * 3-way triage split              /root/reference/lib/pipeline-import.js:220-241

Divergence (deliberate, documented per SURVEY.md §1.2 "quirks"): the
reference repairs dates/dateTimes through JS ``new Date`` and re-emits
non-zero-padded local-time components (e.g. ``2023-5-7T9:5:3``). We
normalize to canonical zero-padded UTC forms instead (the survey's
recommended default). ``compat=True`` reproduces the non-padded *format*
bug-for-bug, with one remaining timezone divergence: JS ``Date`` getters
re-emit components in the process's LOCAL zone, so a reference deployed
in e.g. Europe/Brussels shifts every zone-carrying input (the
``… GMT``/``… UTC`` RFC-2822 forms — the only zone-carrying shapes that
survive the repair parse) by the local offset, while zone-less inputs
pass through unshifted (JS parses those as local time and re-emits local
→ identity). Default behavior here renders all instants naive-UTC —
byte-parity with a UTC-running reference (``TZ=UTC``, what the goldens
pin); ``compat_tz='Europe/Brussels'`` reproduces a reference deployed in
that zone by shifting exactly the zone-carrying inputs
(fixTriple.js:152-156,201-208). Everything else — including the
``Number()`` quirk that lets floats pass xsd:integer validation and the
first-occurrence-only ``https``→``http`` substitution in WKT CRS repair
— is replicated.

Triage invariants (pipeline-import.js:229-239):
  valid     = passed-first-pass ∪ repaired   (repaired in fixed form)
  invalid   = everything that failed the first pass (original form)
  corrected = originals of the repaired subset  (⊆ invalid)
  dropped   = invalid ∖ corrected
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.schema import (
    GEO_WKT,
    OT_BNODE,
    OT_LITERAL,
    RDF_HTML,
    RDF_LANGSTRING,
    RDF_XMLLITERAL,
    RDFS_LITERAL,
    XSD_BOOLEAN,
    XSD_DATE,
    XSD_DATETIME,
    XSD_INT,
    XSD_INTEGER,
    XSD_STRING,
)

# JS regexes from validateTriple.js:111-112 and 124-125, translated verbatim
# (4+ year digits, optional offset/Z; dateTime adds T HH:MM:SS[.frac]).
DATE_RE = r"^-?[0-9]{4,}-[0-9]{2}-[0-9]{2}(([-+][0-9]{2}:[0-9]{2})|Z)?$"
DATETIME_RE = (
    r"^-?[0-9]{4,}-[0-9]{2}-[0-9]{2}T[0-9]{2}:[0-9]{2}:[0-9]{2}"
    r"(\.[0-9]+)?(([-+][0-9]{2}:[0-9]{2})|Z)?$"
)

# Formats tried (in order) when repairing a broken date/dateTime literal,
# after separator normalization ('/'→'-', 'date time'→'dateTtime',
# RFC-2822 weekday/zone stripped). JS `new Date()` accepts a menagerie
# (fixTriple.js:148-162 funnels everything through V8 Date.parse); these
# cover the realistic harvest inputs: slash dates, single-digit
# components, datetimes missing T/seconds, US month names with and
# without comma ('May 7, 2023' / 'May 7 2023'), day-first European forms
# ('7 May 2023'), and RFC-2822 ('Sun, 07 May 2023 09:05:03 GMT' — Spark
# cannot PARSE day-of-week fields, so the weekday token is stripped in
# normalization and 'd MMM y' takes over). Single-letter pattern fields
# (y/M/d/H/m/s) are lenient — they match both '5' and '05' — so one
# format covers the reference's non-padded JS-Date outputs too. The list
# is kept deliberately short: every format adds a generated-code
# DateTimeFormatter and the repair chain must stay within the JVM's
# 64 KB method limit to keep whole-stage codegen alive.
_DATE_FIX_FMTS = ["y-M-d", "M-d-y"]
_DATE_FIX_TEXT_FMTS = ["MMMM d, y", "MMMM d y", "d MMMM y", "d MMM y"]
_DATETIME_FIX_FMTS = ["y-M-d'T'H:m:s", "y-M-d'T'H:m", "y-M-d"]
_DATETIME_FIX_TEXT_FMTS = ["d MMM y H:m:s", "MMMM d y H:m:s", "MMMM d y H:m"]

# Month-name forms are recognizable by two consecutive letters (the lone
# 'T' separator of normalized ISO forms never matches): gating the text
# formats behind this keeps the common all-numeric repair path at its
# original 2-3-format cost instead of paying 4-6 failing java.time
# text parses per row.
_HAS_MONTH_NAME = "[A-Za-z]{2}"


def _norm_datetime_sep(v: Column) -> Column:
    """'2023/05/07 09:05' → '2023-05-07T09:05' so one format list covers
    slash/space variants; also strip the RFC-2822 weekday prefix
    ('Sun, 07 May …' → '07 May …', since Spark patterns cannot parse
    day-of-week text) and a trailing GMT/UTC zone name (the instants are
    already treated naive-UTC end to end)."""
    c = F.regexp_replace(F.trim(v), "/", "-")
    # collapse whitespace runs: the format chain uses single literal
    # spaces (java.time is strict about them; JS Date.parse is not)
    c = F.regexp_replace(c, r"\s+", " ")
    # 'Sun,' / 'Sunday,' — month names at the start are never
    # comma-terminated in a JS-parseable date, so this only eats weekdays
    c = F.regexp_replace(c, r"^[A-Za-z]{3,9},\s*", "")
    c = F.regexp_replace(c, r"\s(GMT|UTC)$", "")
    return F.regexp_replace(c, r"^(-?\d{4,}-\d{1,2}-\d{1,2})\s+", "$1T")


# JS WhiteSpace ∪ LineTerminator (what Number() trims): \s covers
# tab/LF/VT/FF/CR/space; the rest are NBSP, Ogham, the U+2000 block,
# LS/PS, NNBSP, MMSP, ideographic space, BOM.
_JS_WS = ("[\\s\\u00a0\\u1680\\u2000-\\u200a\\u2028\\u2029\\u202f"
          "\\u205f\\u3000\\ufeff]")

# One anchored pattern for the whole ECMA StringNumericLiteral grammar:
# optional JS-whitespace padding around an OPTIONAL body (empty/blank →
# 0 → valid) that is either an unsigned radix literal (0x/0b/0o — no
# sign allowed) or a signed decimal / Infinity. Built as a single regex
# so the check is ONE rlike per call site: Catalyst does no CSE across
# when-branches, and the previous trim-then-3-tests shape re-inlined the
# big whitespace regexp_replace into every reference (~1.5× regression
# on the triage bench, VERDICT r02).
_JS_NUMERIC_RE = (
    "^" + _JS_WS + "*"
    "(0[xX][0-9a-fA-F]+|0[bB][01]+|0[oO][0-7]+"
    "|[+-]?(Infinity|([0-9]+(\\.[0-9]*)?|\\.[0-9]+)([eE][+-]?[0-9]+)?))?"
    + _JS_WS + "*$"
)


def _is_numeric_js(value: Column) -> Column:
    """JS ``!isNaN(Number(v))`` (validateTriple.js:136-139): empty/blank
    strings coerce to 0 (valid); otherwise the ECMA StringNumericLiteral
    grammar decides — implemented as that grammar directly rather than a
    double cast, because the cast both over-accepts (Java-isms like
    ``1.5d``/``1.5f`` suffixes and the non-grammar literal ``NaN``, all of
    which JS maps to NaN → invalid) and under-accepts (unsigned radix
    prefixes ``0x1A``/``0b101``/``0o17``, valid JS Numbers). ``Infinity``
    and overflow forms like ``1e999`` are in the grammar → valid, matching
    ``isNaN(Infinity) === false``. Number() trims ALL JS WhiteSpace (tab/
    LF/CR/FF/NBSP/BOM…), not just spaces — the trim lives INSIDE the
    single anchored pattern as leading/trailing ``WS*``."""
    return value.rlike(_JS_NUMERIC_RE)


def _wkt_crs(value: Column) -> Column:
    """Extract the ``<http(s)://…>`` CRS URL embedded in a WKT literal
    (validateTriple.js:77)."""
    return F.regexp_extract(value, r"<(https?://[^\s>]+)>", 1)


def is_valid_object(object_type: Column, object_value: Column,
                    datatype: Column, language: Column) -> Column:
    """validateTerm for the object position (validateTriple.js:33-69)."""
    v = object_value
    return (
        F.when(object_type == OT_BNODE, F.lit(False))
        .when(object_type != OT_LITERAL, F.lit(True))      # IRI: no datatype
        .when(datatype.isNull(), F.lit(True))               # plain literal
        .when(datatype == RDFS_LITERAL, F.lit(False))
        .when(datatype == RDF_LANGSTRING,
              F.coalesce(language, F.lit("")) != "")
        .when(datatype == XSD_STRING, F.lit(True))
        .when(datatype == RDF_HTML, F.lit(True))
        .when(datatype == RDF_XMLLITERAL, F.lit(False))
        .when(datatype == XSD_BOOLEAN, v.isin("true", "false"))
        .when(datatype == XSD_DATE, v.rlike(DATE_RE))
        .when(datatype == XSD_DATETIME, v.rlike(DATETIME_RE))
        .when(datatype == XSD_INTEGER, _is_numeric_js(v))
        .when(datatype == GEO_WKT,
              (F.length(F.coalesce(v, F.lit(""))) > 0)
              & ((_wkt_crs(v) == "") | _wkt_crs(v).startswith("http://")))
        .otherwise(F.lit(False))                            # unknown datatype
    )


def is_valid_triple(subject: Column, object_type: Column, object_value: Column,
                    datatype: Column, language: Column,
                    parse_ok: Column | None = None) -> Column:
    """validateTriple (validateTriple.js:9-26): parse error → false; any
    BlankNode term → false; subjects/predicates are IRIs (always valid),
    so the object decides."""
    valid = (
        ~subject.startswith("_:")
        & is_valid_object(object_type, object_value, datatype, language)
    )
    if parse_ok is not None:
        valid = parse_ok & valid
    return valid


def _replace_first(value: Column, find: str, repl: str) -> Column:
    """JS ``String.replace(substr, r)`` replaces only the FIRST occurrence
    (fixTriple.js:109) — Spark's regexp_replace replaces all, so splice via
    instr/substring."""
    pos = F.instr(value, find)
    return F.when(pos == 0, value).otherwise(
        F.concat(
            F.substring(value, F.lit(1), pos - 1),
            F.lit(repl),
            F.substr(value, pos + len(find)),
        )
    )


def _try_fmts(n: Column, numeric_fmts: list[str],
              text_fmts: list[str]) -> Column:
    """First-match parse over the format chain, with the month-name
    formats attempted ONLY for values that can contain a month name
    (when-branches evaluate lazily per row in codegen)."""
    numeric = F.coalesce(*[F.try_to_timestamp(n, F.lit(f))
                           for f in numeric_fmts])
    texty = F.coalesce(*[F.try_to_timestamp(n, F.lit(f))
                         for f in text_fmts])
    return F.when(n.rlike(_HAS_MONTH_NAME), texty).otherwise(numeric)


def _apply_compat_tz(v: Column, ts: Column, compat_tz: str | None) -> Column:
    """JS-local re-emission twin (module-docstring divergence note): when
    ``compat_tz`` names the reference deployment's zone, inputs that
    carried an explicit zone marker — the ``… GMT``/``… UTC`` suffix
    forms, the only zone-carrying shapes the repair parse accepts — are
    instants in UTC and shift into that zone before re-emission, exactly
    as JS ``Date`` getters would. Zone-less inputs are parsed local and
    re-emitted local by JS (component identity), so they never shift."""
    if compat_tz is None:
        return ts
    had_zone = F.trim(v).rlike(r"\s(GMT|UTC)$")
    return F.when(had_zone, F.from_utc_timestamp(ts, compat_tz)).otherwise(ts)


def _fix_date(v: Column, compat: bool = False,
              compat_tz: str | None = None) -> Column:
    """``compat=True`` reproduces the reference's JS-Date re-emission
    bug-for-bug (fixTriple.js:152-156): month zero-padded, day NOT —
    ``2023-05-7``. Default mode emits the canonical zero-padded form
    (the documented divergence in the module docstring). ``compat_tz``
    additionally shifts zone-carrying inputs into the reference
    deployment's local zone (see :func:`_apply_compat_tz`)."""
    n = _norm_datetime_sep(v)
    ts = _try_fmts(n, _DATE_FIX_FMTS, _DATE_FIX_TEXT_FMTS)
    ts = _apply_compat_tz(v, ts, compat_tz)
    return F.date_format(ts, "yyyy-MM-d" if compat else "yyyy-MM-dd")


def _fix_datetime(v: Column, compat: bool = False,
                  compat_tz: str | None = None) -> Column:
    """``compat=True``: month padded, day/hour/minute/second NOT
    (fixTriple.js:201-208) — ``2023-05-7T9:5:3``. ``compat_tz``: see
    :func:`_apply_compat_tz`."""
    n = _norm_datetime_sep(v)
    ts = _try_fmts(n, _DATETIME_FIX_FMTS, _DATETIME_FIX_TEXT_FMTS)
    ts = _apply_compat_tz(v, ts, compat_tz)
    return F.date_format(
        ts, "yyyy-MM-d'T'H:m:s" if compat else "yyyy-MM-dd'T'HH:mm:ss")


def fix_object(object_type: Column, object_value: Column, datatype: Column,
               language: Column, compat: bool = False,
               compat_tz: str | None = None) -> Column:
    """fixTerm for an invalid object (fixTriple.js:60-96). Returns a single
    struct column ``(value, datatype)``; value null ⇔ unrepairable
    (repaired literals never carry a language tag — fixLiteral recasts
    langString to xsd:string).

    One when-chain producing a struct — not three parallel chains — so the
    repair logic appears exactly once in the generated code. Only consulted
    where first-pass validation failed, mirroring fixTerm's
    ``if (validateTerm(term)) return term`` short-circuit.
    """
    v = object_value
    null_s = F.lit(None).cast("string")

    def fix(val: Column, dt: Column) -> Column:
        return F.struct(val.alias("value"), F.when(val.isNotNull(), dt).alias("datatype"))

    no_fix = fix(null_s, null_s)
    return (
        F.when(object_type == OT_BNODE, no_fix)
        .when(datatype.isNull() | (object_type != OT_LITERAL), no_fix)
        # fixLiteral: rdfs:Literal / langString / XMLLiteral → xsd:string
        .when(datatype.isin(RDFS_LITERAL, RDF_LANGSTRING, RDF_XMLLITERAL),
              fix(v, F.lit(XSD_STRING)))
        # fixBoolean: lowercase then re-check (fixTriple.js:130-140)
        .when(datatype == XSD_BOOLEAN,
              fix(F.when(F.lower(v).isin("true", "false"), F.lower(v)),
                  F.lit(XSD_BOOLEAN)))
        # fixDate / fixDateTime: reparse + re-emit (canonical by default,
        # the reference's non-padded JS-Date form with compat=True)
        .when(datatype == XSD_DATE,
              fix(_fix_date(v, compat, compat_tz), F.lit(XSD_DATE)))
        .when(datatype == XSD_DATETIME,
              fix(_fix_datetime(v, compat, compat_tz), F.lit(XSD_DATETIME)))
        # fixInteger: xsd:int → xsd:integer when numeric (fixTriple.js:86-89)
        .when(datatype == XSD_INT,
              fix(F.when(_is_numeric_js(v), v), F.lit(XSD_INTEGER)))
        # fixWktLiteral: first 'https' → 'http' (fixTriple.js:98-123)
        .when((datatype == GEO_WKT) & (F.length(F.coalesce(v, F.lit(""))) > 0),
              fix(F.when(_wkt_crs(v) != "", _replace_first(v, "https", "http"))
                  .otherwise(v),
                  F.lit(GEO_WKT)))
        .otherwise(no_fix)
    )


def triage(df: DataFrame, compat: bool = False,
           compat_tz: str | None = None) -> DataFrame:
    """Annotate a TRIPLE_SCHEMA DataFrame with triage columns
    (correctAndRepairTriples, pipeline-import.js:220-241):

      is_valid        first-pass validateTriple verdict
      verdict         'valid' | 'fixed' | 'dropped'
      fixed_object_value / fixed_datatype / fixed_language
                      repaired object term (only for verdict='fixed')

    ``compat=True`` re-emits repaired dates/dateTimes in the reference's
    non-padded JS-Date form (``2023-05-7T9:5:3``) instead of the default
    canonical form; ``compat_tz`` (e.g. ``'Europe/Brussels'``) further
    shifts zone-carrying inputs into the reference deployment's local
    zone, reproducing a non-UTC reference — see the module-docstring
    divergence note.

    One projection — Catalyst folds the whole thing into a single
    whole-stage-codegen stage over the scan. Over a parquet-backed triple
    table (the at-scale path) the stage compiles well inside the JVM 64 KB
    method limit. The fully-fused composition of extract + triage + the
    valid-projection (which re-inlines these chains) DOES overflow the
    limit and used to fall back to interpreted eval for the whole stage;
    the import pipeline now splits the codegen unit after triage
    (operators/materialize.codegen_barrier) so both halves compile —
    compositions of comparable width should do the same.
    """
    parse_ok = F.col("parse_ok") if "parse_ok" in df.columns else None
    valid = is_valid_triple(F.col("subject"), F.col("object_type"),
                            F.col("object_value"), F.col("datatype"),
                            F.col("language"), parse_ok)
    df = df.withColumn("is_valid", valid)

    fixed = fix_object(F.col("object_type"), F.col("object_value"),
                       F.col("datatype"), F.col("language"), compat,
                       compat_tz)
    # a triple with a bnode subject is unrepairable (fixTriple.js:25-27)
    fixable = ~F.col("subject").startswith("_:")
    if parse_ok is not None:
        fixable = F.col("parse_ok") & fixable
    df = (
        df.withColumn("_fix", F.when(~F.col("is_valid") & fixable, fixed))
        .withColumn("fixed_object_value", F.col("_fix.value"))
        .withColumn("fixed_datatype", F.col("_fix.datatype"))
        .withColumn("fixed_language", F.lit(None).cast("string"))
        .drop("_fix")
        .withColumn(
            "verdict",
            F.when(F.col("is_valid"), F.lit("valid"))
            .when(F.col("fixed_object_value").isNotNull(), F.lit("fixed"))
            .otherwise(F.lit("dropped")))
    )
    return df


def _as_triples(df: DataFrame, extra_cols: tuple[str, ...] = ()) -> list[str]:
    keep = tuple(extra_cols) + (
        "subject", "predicate", "object_value", "object_type",
        "datatype", "language", "graph")
    return [c for c in df.columns if c in keep]


def valid_triples(triaged: DataFrame,
                  extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """valid = passed ∪ repaired, repaired rows in their fixed form
    (pipeline-import.js:236). ``extra_cols`` (e.g. task/page keys for
    partitioned writes) ride along unchanged."""
    cols = _as_triples(triaged, extra_cols)
    fixed_form = {
        "object_value": F.coalesce(F.col("fixed_object_value"), F.col("object_value")),
        "datatype": F.when(F.col("verdict") == "fixed", F.col("fixed_datatype"))
                     .otherwise(F.col("datatype")),
        "language": F.when(F.col("verdict") == "fixed", F.col("fixed_language"))
                     .otherwise(F.col("language")),
    }
    out = triaged.filter(F.col("verdict").isin("valid", "fixed"))
    return out.select(*[
        fixed_form.get(c, F.col(c)).alias(c) for c in cols
    ])


def invalid_triples(triaged: DataFrame,
                    extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """invalid = all first-pass failures, original form
    (pipeline-import.js:229-230)."""
    return triaged.filter(~F.col("is_valid")).select(
        *_as_triples(triaged, extra_cols))


def corrected_triples(triaged: DataFrame,
                      extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """corrected = originals of the repaired subset (pipeline-import.js:237)."""
    return triaged.filter(F.col("verdict") == "fixed").select(
        *_as_triples(triaged, extra_cols))


def dropped_triples(triaged: DataFrame,
                    extra_cols: tuple[str, ...] = ()) -> DataFrame:
    return triaged.filter(F.col("verdict") == "dropped").select(
        *_as_triples(triaged, extra_cols))
