"""RDFa extraction: HTML documents → triple DataFrame.

This is the one operator the reference delegates to an opaque library
(`@lblod/graph-rdfa-processor` + jsdom, /root/reference/lib/rdfa-extractor.js:72-84)
and therefore the one place this engine crosses into Python. Everything
around it — provenance injection, content spill, triage — is DataFrame-side.

Coverage (a documented RDFa 1.1 Lite subset, fixture-driven per SURVEY.md
§7 "hard parts"): ``vocab``, ``prefix``, ``about``, ``resource``, ``href``,
``src``, ``typeof``, ``property``, ``rel``, ``content``, ``datatype``,
``lang``/``xml:lang`` with inheritance, bnodes for ``typeof`` without
``about``, ``inlist`` rdf:List construction (document-order
rdf:first/rdf:rest/rdf:nil chains; not collected for hanging @rel),
RDFa-1.0-style ``xmlns:pfx`` prefix declarations (legacy government CMS
output; merged like ``prefix``, with ``prefix`` winning on conflict —
prefixes arrive lowercased because HTML attribute names are
case-insensitive, matching browser-DOM RDFa processors), and HTML5
``<time datetime="…">`` attribute objects with the HTML+RDFa datatype
sniff (auto-typed xsd:dateTime/date/time/duration/gYearMonth/gYear; no
match → plain literal). The ``specialHtmlPredicates`` rewrite
(``prov:value`` → ``extractedDecisionContent`` for ``rdf:HTML``-typed
objects, rdfa-extractor.js:76-84) happens inside the extractor, as in the
reference (whose `@lblod/graph-rdfa-processor` handles both edges,
lib/rdfa-extractor.js:76-84).

Scale design: the extractor runs as ``mapInPandas`` — Arrow-batched, one
Python worker per core, no driver involvement. A failed parse yields an
``error`` row instead of failing the job (the reference's per-page
try/continue, pipeline-import.js:63-70). Pages are independent rows, so a
100 TB corpus parallelizes to however many executors hold the scan.
"""

from __future__ import annotations

import html.parser
import re
from collections.abc import Iterator
from urllib.parse import urljoin

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from harvesting_extract_to_ttl_service_spark.schema import (
    EXTRACTED_DECISION_CONTENT,
    OT_BNODE,
    OT_IRI,
    OT_LITERAL,
    PROV_VALUE,
    PROV_WAS_DERIVED_FROM,
    RDF_FIRST,
    RDF_HTML,
    RDF_LANGSTRING,
    RDF_NIL,
    RDF_REST,
    RDF_TYPE,
    XSD_DATE,
    XSD_DATETIME,
    XSD_DURATION,
    XSD_GYEAR,
    XSD_GYEARMONTH,
    XSD_TIME,
)

# --------------------------------------------------------------------------
# Pure-Python RDFa subset processor (runs inside the Arrow batch UDF)
# --------------------------------------------------------------------------

_VOID_TAGS = frozenset(
    "area base br col embed hr img input link meta param source track wbr".split()
)

# RDFa initial-context prefixes commonly used by the harvested corpus; the
# `prefix` attribute can add/override.
_DEFAULT_PREFIXES = {
    "rdf": "http://www.w3.org/1999/02/22-rdf-syntax-ns#",
    "rdfs": "http://www.w3.org/2000/01/rdf-schema#",
    "xsd": "http://www.w3.org/2001/XMLSchema#",
    "prov": "http://www.w3.org/ns/prov#",
    "dct": "http://purl.org/dc/terms/",
    "dcterms": "http://purl.org/dc/terms/",
    "foaf": "http://xmlns.com/foaf/0.1/",
    "schema": "http://schema.org/",
    "skos": "http://www.w3.org/2004/02/skos/core#",
    "besluit": "http://data.vlaanderen.be/ns/besluit#",
    "mandaat": "http://data.vlaanderen.be/ns/mandaat#",
    "eli": "http://data.europa.eu/eli/ontology#",
}


class _Elem:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: dict[str, str]):
        self.tag = tag
        self.attrs = attrs
        self.children: list[_Elem | str] = []


class _TreeBuilder(html.parser.HTMLParser):
    """Minimal DOM builder (stdlib only — the container has no lxml/bs4)."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = _Elem("#root", {})
        self._stack = [self.root]

    def handle_starttag(self, tag, attrs):
        el = _Elem(tag, {k: (v if v is not None else "") for k, v in attrs})
        self._stack[-1].children.append(el)
        if tag not in _VOID_TAGS:
            self._stack.append(el)

    def handle_startendtag(self, tag, attrs):
        self._stack[-1].children.append(
            _Elem(tag, {k: (v if v is not None else "") for k, v in attrs}))

    def handle_endtag(self, tag):
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                break

    def handle_data(self, data):
        if data:
            self._stack[-1].children.append(data)


def _text_of(el: _Elem) -> str:
    parts: list[str] = []
    stack: list[_Elem | str] = [el]
    while stack:
        n = stack.pop()
        if isinstance(n, str):
            parts.append(n)
        else:
            stack.extend(reversed(n.children))
    return "".join(parts)


def _html_of(el: _Elem) -> str:
    """Serialize children back to HTML (inner HTML, for rdf:HTML objects)."""
    out: list[str] = []

    def ser(n: _Elem | str) -> None:
        if isinstance(n, str):
            out.append(n)
            return
        attrs = "".join(f' {k}="{v}"' for k, v in n.attrs.items())
        if n.tag in _VOID_TAGS and not n.children:
            out.append(f"<{n.tag}{attrs}/>")
        else:
            out.append(f"<{n.tag}{attrs}>")
            for c in n.children:
                ser(c)
            out.append(f"</{n.tag}>")

    for c in el.children:
        ser(c)
    return "".join(out)


_ABS_IRI = re.compile(r"^[A-Za-z][A-Za-z0-9+.-]*:")

# HTML+RDFa 1.1 "date-time value" datatype sniff for <time datetime="…">:
# first matching pattern types the literal; no match → plain literal.
# Order matters — dateTime before date before gYearMonth before gYear.
_DATETIME_SNIFF: list[tuple[re.Pattern, str]] = [
    (re.compile(r"^-?\d{4,}-\d{2}-\d{2}T\d{2}:\d{2}(:\d{2}(\.\d+)?)?"
                r"(Z|[+-]\d{2}:\d{2})?$"), XSD_DATETIME),
    (re.compile(r"^-?\d{4,}-\d{2}-\d{2}(Z|[+-]\d{2}:\d{2})?$"), XSD_DATE),
    (re.compile(r"^\d{2}:\d{2}(:\d{2}(\.\d+)?)?(Z|[+-]\d{2}:\d{2})?$"),
     XSD_TIME),
    (re.compile(r"^-?P(?=\d|T\d)(\d+Y)?(\d+M)?(\d+D)?"
                r"(T(?=\d)(\d+H)?(\d+M)?(\d+(\.\d+)?S)?)?$"), XSD_DURATION),
    (re.compile(r"^-?\d{4,}-\d{2}$"), XSD_GYEARMONTH),
    (re.compile(r"^-?\d{4,}$"), XSD_GYEAR),
]


def _sniff_datetime_datatype(value: str) -> str | None:
    for pat, dt in _DATETIME_SNIFF:
        if pat.match(value):
            return dt
    return None


class _RdfaExtractor:
    def __init__(self, base_uri: str, strict_completion: bool = False):
        self.base = base_uri
        self.bnode_n = 0
        self.triples: list[tuple] = []
        # RDFa Core 1.1 step 12: an element that is not "skipped" (it
        # carries rel/rev/property/typeof) completes the ancestors'
        # incomplete triples even when its subject is merely INHERITED —
        # for a hanging @rel whose child has only @property this emits
        # the spec's degenerate (s, rel, s) self-triple. Default False:
        # the subset completes only on MINTED subjects (the form real
        # chaining markup uses; pinned by tests/test_extract.py).
        self.strict_completion = strict_completion

    def _bnode(self) -> str:
        self.bnode_n += 1
        return f"_:b{self.bnode_n - 1}"

    def _resolve_term(self, term: str, prefixes: dict, vocab: str | None):
        """CURIE/term → IRI for property/typeof/rel/datatype positions."""
        if not term:
            return None
        if ":" in term:
            pfx, rest = term.split(":", 1)
            if pfx in prefixes and not rest.startswith("//"):
                return prefixes[pfx] + rest
            if _ABS_IRI.match(term):
                return term
            return None
        if vocab:
            return vocab + term
        return None

    def _resolve_ref(self, ref: str, prefixes: dict):
        """about/resource/href/src → IRI (CURIE allowed in about/resource)."""
        if ref.startswith("[") and ref.endswith("]"):  # safe CURIE
            ref = ref[1:-1]
        if ref.startswith("_:"):
            return ref
        if ":" in ref:
            pfx, rest = ref.split(":", 1)
            if pfx in prefixes and not rest.startswith("//"):
                return prefixes[pfx] + rest
        return urljoin(self.base, ref)

    def _emit(self, s, p, o, ot, dt=None, lang=None):
        self.triples.append((s, p, o, ot, dt, lang))

    def walk(self, el: _Elem, subject: str, lang, vocab, prefixes,
             pending=(), pending_rev=(), list_mapping=None) -> None:
        """``pending``/``pending_rev`` carry hanging @rel/@rev predicates
        (a rel/rev with no resource on its own element, RDFa Core
        "incomplete triples"): the nearest descendant that establishes a
        new subject completes them.

        ``list_mapping`` is the RDFa Core "local list mapping" backing
        @inlist (rdf:List construction): {predicate IRI → [collected
        (value, type, datatype, lang) items]}. A fresh mapping is created
        whenever a new subject is established; the element that created
        it emits the rdf:first/rdf:rest/rdf:nil chains after its subtree
        is walked, so sibling @inlist elements with the same predicate
        accumulate into ONE list in document order. Subset note (pinned
        by tests/test_extract.py): @inlist on a HANGING @rel (no resource
        on the element) is not collected — it falls back to the plain
        incomplete-triple behavior."""
        a = el.attrs
        # RDFa-1.0-style xmlns:pfx declarations (old government CMS markup)
        # merge exactly like `prefix`; `prefix` wins on conflict per the
        # RDFa Core 1.1 declaration-precedence rule. HTML parsing lowercases
        # attribute names, so the declared prefix arrives lowercased — the
        # same behavior as DOM-based RDFa processors over text/html.
        xmlns_decls = {k[6:]: v for k, v in a.items()
                       if k.startswith("xmlns:") and len(k) > 6 and v}
        if xmlns_decls or "prefix" in a:
            prefixes = dict(prefixes)
            prefixes.update(xmlns_decls)
        if "prefix" in a:
            toks = a["prefix"].split()
            for i in range(0, len(toks) - 1, 2):
                if toks[i].endswith(":"):
                    prefixes[toks[i][:-1]] = toks[i + 1]
        if "vocab" in a and a["vocab"]:
            vocab = a["vocab"]
        lang = a.get("lang") or a.get("xml:lang") or lang

        properties = [t for t in a.get("property", "").split() if t]
        rels = [t for t in a.get("rel", "").split() if t]
        revs = [t for t in a.get("rev", "").split() if t]
        typeof = [t for t in a.get("typeof", "").split() if "typeof" in a]
        res_ref = a.get("resource") or a.get("href") or a.get("src")

        # --- new subject resolution (RDFa Lite subset + typed resources) ---
        # `established` is true only when THIS element's attributes minted
        # the subject (about / resource-as-subject / typeof): that — not
        # the mere presence of @href consumed as a property object — is
        # what completes an ancestor's hanging rel/rev by default. Strict
        # RDFa Core 1.1 step 12 also completes when the subject is merely
        # inherited (so a property-only child of a hanging rel yields the
        # spec's degenerate (s, rel, s) self-triple) — available via
        # ``strict_completion=True``; the default never emits
        # self-triples from inheritance (tests/test_extract.py pins both
        # modes).
        typed_obj = None  # bnode that is the OBJECT of property (typeof case)
        established = True
        if "about" in a:
            new_subject = self._resolve_ref(a["about"], prefixes)
        elif res_ref is not None and not properties and not rels and not revs:
            new_subject = self._resolve_ref(res_ref, prefixes)
        elif typeof and properties and res_ref is None:
            # RDFa 1.1 typed resource: @property + @typeof (no about/
            # resource) mints a bnode that becomes the property's OBJECT;
            # @typeof types the bnode; children inherit it as subject.
            typed_obj = self._bnode()
            new_subject = typed_obj
        elif typeof:
            new_subject = self._bnode()
        else:
            new_subject = subject
            established = False

        # --- complete hanging rel/rev from an ancestor ---
        # subset: minted subjects only; strict (RDFa Core step 12): any
        # non-skipped element (one carrying rel/rev/property alongside
        # the typeof/about cases) completes with its — possibly
        # inherited — subject.
        completes = established or (
            self.strict_completion
            and bool(properties or rels or revs))
        if completes:
            for ps, ppred in pending:
                self._emit(ps, ppred, new_subject,
                           OT_BNODE if new_subject.startswith("_:") else OT_IRI)
            for ps, ppred in pending_rev:
                self._emit(new_subject, ppred, ps,
                           OT_BNODE if ps.startswith("_:") else OT_IRI)
            pending, pending_rev = (), ()

        for t in typeof:
            iri = self._resolve_term(t, prefixes, vocab)
            if iri:
                self._emit(new_subject, RDF_TYPE, iri, OT_IRI)

        # --- local list mapping (@inlist): new subject → new mapping;
        # the creating element emits the chains after its subtree ---
        owns_lists = list_mapping is None or established
        if owns_lists:
            list_mapping = {}
        in_list = "inlist" in a

        # --- rel/rev: linked resource on the same element, else hang ---
        child_pending = list(pending)
        child_pending_rev = list(pending_rev)
        if res_ref is not None:
            obj = self._resolve_ref(res_ref, prefixes)
            for r in rels:
                iri = self._resolve_term(r, prefixes, vocab)
                if iri:
                    if in_list:
                        list_mapping.setdefault(iri, []).append(
                            (obj, OT_BNODE if obj.startswith("_:") else OT_IRI,
                             None, None))
                        continue
                    self._emit(new_subject, iri, obj,
                               OT_BNODE if obj.startswith("_:") else OT_IRI)
            for r in revs:
                iri = self._resolve_term(r, prefixes, vocab)
                if iri:
                    self._emit(obj, iri, new_subject,
                               OT_BNODE if new_subject.startswith("_:")
                               else OT_IRI)
        else:
            for r in rels:
                iri = self._resolve_term(r, prefixes, vocab)
                if iri:
                    child_pending.append((new_subject, iri))
            for r in revs:
                iri = self._resolve_term(r, prefixes, vocab)
                if iri:
                    child_pending_rev.append((new_subject, iri))

        # --- property ---
        for pterm in properties:
            pred = self._resolve_term(pterm, prefixes, vocab)
            if not pred:
                continue
            dt_attr = a.get("datatype")
            dt = (self._resolve_term(dt_attr, prefixes, vocab)
                  if dt_attr else None)
            if typed_obj is not None:
                self._emit(subject, pred, typed_obj, OT_BNODE)
                continue
            if "content" in a:
                obj, ot, langv = a["content"], OT_LITERAL, lang
            elif el.tag == "time" and "datetime" in a:
                # HTML5 <time datetime="…">: the attribute supplies the
                # object value (beating element content and resource
                # attributes; @content still wins above). Explicit
                # @datatype is honored; otherwise the HTML+RDFa date-time
                # sniff auto-types the literal, and an unrecognized shape
                # stays a plain (language-taggable) literal.
                obj, ot, langv = a["datetime"], OT_LITERAL, lang
                if dt is None and dt_attr is None:
                    dt = _sniff_datetime_datatype(obj)
            elif res_ref is not None and not rels and dt_attr is None:
                obj = self._resolve_ref(res_ref, prefixes)
                ot, dt, langv = OT_IRI, None, None
            elif dt == RDF_HTML:
                obj, ot, langv = _html_of(el), OT_LITERAL, None
            else:
                obj, ot, langv = _text_of(el).strip(), OT_LITERAL, lang
            if ot == OT_LITERAL and dt is None and langv:
                dt = RDF_LANGSTRING
            # specialHtmlPredicates rewrite (rdfa-extractor.js:76-84)
            if pred == PROV_VALUE and dt == RDF_HTML:
                pred = EXTRACTED_DECISION_CONTENT
            if in_list:
                list_mapping.setdefault(pred, []).append(
                    (obj, ot, dt, langv if dt == RDF_LANGSTRING else None))
                continue
            self._emit(new_subject, pred, obj, ot, dt,
                       langv if dt == RDF_LANGSTRING else None)

        for c in el.children:
            if isinstance(c, _Elem):
                self.walk(c, new_subject, lang, vocab, prefixes,
                          tuple(child_pending), tuple(child_pending_rev),
                          list_mapping)

        # --- emit accumulated rdf:List chains for mappings created here ---
        if owns_lists:
            for pred, items in list_mapping.items():
                nodes = [self._bnode() for _ in items]
                self._emit(new_subject, pred, nodes[0], OT_BNODE)
                for i, (val, ot, dt, lv) in enumerate(items):
                    self._emit(nodes[i], RDF_FIRST, val, ot, dt, lv)
                    nxt = nodes[i + 1] if i + 1 < len(items) else RDF_NIL
                    self._emit(nodes[i], RDF_REST, nxt,
                               OT_BNODE if nxt.startswith("_:") else OT_IRI)


def extract_rdfa(html_text: str, base_uri: str,
                 strict_completion: bool = False) -> list[tuple]:
    """One document → [(subject, predicate, object_value, object_type,
    datatype, language)]. U+FFFD chars are scrubbed before parse
    (rdfa-extractor.js:72). ``strict_completion=True`` switches hanging
    rel/rev completion to spec-faithful RDFa Core step-12 (inherited
    subjects complete too, including the degenerate self-triple case)."""
    builder = _TreeBuilder()
    builder.feed(html_text.replace("�", ""))
    ex = _RdfaExtractor(base_uri, strict_completion=strict_completion)
    ex.walk(builder.root, base_uri, None, None, dict(_DEFAULT_PREFIXES))
    return ex.triples


# --------------------------------------------------------------------------
# DataFrame operators
# --------------------------------------------------------------------------

EXTRACT_SCHEMA = T.StructType([
    T.StructField("page_uri", T.StringType(), True),
    T.StructField("url", T.StringType(), True),
    T.StructField("subject", T.StringType(), True),
    T.StructField("predicate", T.StringType(), True),
    T.StructField("object_value", T.StringType(), True),
    T.StructField("object_type", T.StringType(), True),
    T.StructField("datatype", T.StringType(), True),
    T.StructField("language", T.StringType(), True),
    T.StructField("error", T.StringType(), True),
])


def extract_pages(pages: DataFrame, with_provenance: bool = False) -> DataFrame:
    """PAGE_SCHEMA DataFrame → extracted triples (+``error`` column).

    ``mapInPandas`` so each Arrow batch of pages is processed by one Python
    worker; output rows are triples, so one page fans out to N rows without
    an explode. Extraction failure → one row with ``error`` set and null
    terms (per-page fault isolation, pipeline-import.js:63-70).

    ``with_provenance=True`` emits the per-page ``prov:wasDerivedFrom``
    rows inside the worker (first-seen subject dedup, exactly the
    reference's SourceAwareStoreWriter, rdfa-extractor.js:45-54). Subject
    dedup is page-local state, so doing it here instead of as a
    DataFrame-side ``distinct()`` union (``inject_provenance``) removes a
    shuffle AND a second copy of this mapInPandas subtree from the plan —
    a union of two branches over the same Python stage executes the
    extraction twice per job."""

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            rows: list[tuple] = []
            for page_uri, url, html_text in zip(
                    pdf["page_uri"], pdf["url"], pdf["html"]):
                try:
                    if html_text is None:
                        raise ValueError("null html body")
                    triples = extract_rdfa(html_text, url)
                    for t in triples:
                        rows.append((page_uri, url, *t, None))
                    if with_provenance:
                        for s in dict.fromkeys(t[0] for t in triples):
                            rows.append((page_uri, url, s,
                                         PROV_WAS_DERIVED_FROM, url, OT_IRI,
                                         None, None, None))
                except Exception as e:  # noqa: BLE001 — fault isolation
                    rows.append((page_uri, url, None, None, None, None,
                                 None, None, f"{type(e).__name__}: {e}"))
            yield pd.DataFrame(rows, columns=[f.name for f in EXTRACT_SCHEMA])

    return pages.select("page_uri", "url", "html").mapInPandas(
        run, schema=EXTRACT_SCHEMA)


def inject_provenance(extracted: DataFrame) -> DataFrame:
    """Add one ``(s, prov:wasDerivedFrom, url)`` per distinct subject per
    page (SourceAwareStoreWriter, rdfa-extractor.js:45-54). Set-oriented:
    ``distinct()`` replaces the reference's first-seen array scan."""
    prov = (
        extracted.filter(F.col("subject").isNotNull())
        .select("page_uri", "url", "subject").distinct()
        .select(
            "page_uri", "url", "subject",
            F.lit(PROV_WAS_DERIVED_FROM).alias("predicate"),
            F.col("url").alias("object_value"),
            F.lit(OT_IRI).alias("object_type"),
            F.lit(None).cast("string").alias("datatype"),
            F.lit(None).cast("string").alias("language"),
            F.lit(None).cast("string").alias("error"),
        )
    )
    return extracted.unionByName(prov)


# Deterministic content-addressed file id (SURVEY.md §7 hard part (d):
# content hashes, not uuids, so golden files and oracle runs are stable).
def _content_file_uri() -> F.Column:
    return F.concat(
        F.lit("http://data.lblod.info/id/files/"),
        F.sha2(F.col("object_value"), 256).substr(1, 32),
    )


def spill_html_content(extracted: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Split out oversized ``extractedDecisionContent`` HTML literals
    (SourceAwareStoreWriter branch, rdfa-extractor.js:26-44): the content
    moves to a side file (second return value: ``file_uri, content, url``)
    and the triple's object becomes the file IRI."""
    is_spill = (
        (F.col("predicate") == EXTRACTED_DECISION_CONTENT)
        & (F.col("datatype") == RDF_HTML)
    )
    spilled = (
        extracted.filter(is_spill)
        .select(
            _content_file_uri().alias("file_uri"),
            F.col("object_value").alias("content"),
            F.lit("content.html").alias("name"),
            F.col("url").alias("source"),
            F.lit("text/html").alias("content_type"),
            F.lit("html").alias("extension"),
        )
        .distinct()
    )
    main = (
        extracted.withColumn(
            "object_value",
            F.when(is_spill, _content_file_uri()).otherwise(F.col("object_value")))
        .withColumn("object_type",
                    F.when(is_spill, F.lit(OT_IRI)).otherwise(F.col("object_type")))
        .withColumn("datatype",
                    F.when(is_spill, F.lit(None).cast("string"))
                    .otherwise(F.col("datatype")))
    )
    return main, spilled


def extraction_pipeline(pages: DataFrame) -> tuple[DataFrame, DataFrame]:
    """pages → (triples+error DF, spilled-content DF): extract (with
    in-worker provenance — see ``extract_pages``), rewrite + spill special
    HTML content. The result feeds ``operators.triage.triage`` and the TTL
    sinks. Provenance rows never match the spill predicate (their
    predicate is prov:wasDerivedFrom with no datatype), so emitting them
    before the spill rewrite is equivalent to the reference's
    after-the-store injection — and keeps exactly ONE extraction stage in
    the final plan."""
    extracted = extract_pages(pages, with_provenance=True)
    main, spilled = spill_html_content(extracted)
    return main, spilled
