"""URL canonicalization and URL-keyed deduplication — the crawl-side
front door of a training-data pipeline (CommonCrawl-style corpora carry
one row per FETCH, and the same page is fetched under dozens of URL
spellings: scheme/host case, default ports, tracking parameters, param
order, trailing slashes, fragments).

Everything here is a pure column expression over portable regex/array
primitives (``regexp_extract`` / ``regexp_replace`` / ``split`` /
``array_sort``), so the DuckDB oracle restates normalization
bit-for-bit and the Spark plan stays inside whole-stage codegen — no
UDF, no shuffle until the keep-one window, which groups by the
normalized URL exactly like content dedup groups by fingerprint.

Reference analogue: none — the reference service consumes URLs only as
opaque task payloads (`/root/reference/lib/pipeline-import.js`); this is
extension surface for the LLM-corpus funnel (SURVEY.md §2C).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme://host[:port]  — RFC 3986 scheme charset; host = authority up
# to the first /, ?, or #. No lookaround (Java regex + RE2 portability).
_SCHEME_RE = r"^([A-Za-z][A-Za-z0-9+.-]*)://"
_HOST_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://([^/?#]+)"
# userinfo prefix of the authority ("user:pass@"). Stripped before the
# host is used as a canonical/grouping key: keeping it would let
# `user@host` defeat or spoof suffix-based allow/block matching and
# split per-domain stats (credentials are also not part of the
# resource identity for dedup purposes). Greedy `.*@` because RFC 3986
# ends userinfo at the LAST '@' of the authority (an unencoded '@' may
# appear inside a password); applied to the already-extracted authority,
# which contains no '/', so greediness cannot cross into the path.
_USERINFO_RE = r"^.*@"
_PATH_RE = r"^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]+([^?#]*)"
_QUERY_RE = r"\?([^#]*)"

# tracking parameters dropped during canonicalization (the usual
# Google/Facebook click-attribution set; extend per deployment)
TRACKING_PARAM_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid|ref)="


def normalize_url(url: Column) -> Column:
    """Canonical form of an absolute http(s) URL:

    * scheme and host lowercased (path/query stay case-sensitive);
    * default port stripped (``:80`` for http, ``:443`` for https);
    * fragment dropped;
    * tracking query parameters dropped (:data:`TRACKING_PARAM_RE`),
      the survivors sorted lexicographically and rejoined;
    * trailing path slashes trimmed, empty path rendered as ``/``.

    Returns NULL for strings that do not parse as ``scheme://host...``
    (callers route those to a reject lane rather than silently keeping
    arbitrary keys). Pure column expression — evaluated in-scan."""
    no_frag = F.regexp_replace(url, r"#.*", "")
    scheme = F.lower(F.regexp_extract(no_frag, _SCHEME_RE, 1))
    hostport = F.lower(F.regexp_replace(
        F.regexp_extract(no_frag, _HOST_RE, 1), _USERINFO_RE, ""))
    host = F.when(scheme == "http",
                  F.regexp_replace(hostport, r":80$", "")) \
        .when(scheme == "https", F.regexp_replace(hostport, r":443$", "")) \
        .otherwise(hostport)
    raw_path = F.regexp_extract(no_frag, _PATH_RE, 1)
    trimmed = F.regexp_replace(raw_path, r"/+$", "")
    path = F.when(trimmed == "", F.lit("/")).otherwise(trimmed)
    query = F.regexp_extract(no_frag, _QUERY_RE, 1)
    params = F.array_sort(F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(TRACKING_PARAM_RE)))
    qnorm = F.when(F.size(params) > 0,
                   F.concat(F.lit("?"), F.concat_ws("&", params))) \
        .otherwise(F.lit(""))
    return F.when((scheme == "") | (hostport == ""),
                  F.lit(None).cast("string")) \
        .otherwise(F.concat(scheme, F.lit("://"), host, path, qnorm))


def normalize_url_sql(url_expr: str) -> str:
    """DuckDB restatement of :func:`normalize_url` (oracle twin — keep
    the two in lockstep)."""
    no_frag = f"regexp_replace({url_expr}, '#.*', '')"
    scheme = f"lower(regexp_extract({no_frag}, '{_SCHEME_RE}', 1))"
    hostport = (f"lower(regexp_replace(regexp_extract({no_frag}, "
                f"'{_HOST_RE}', 1), '{_USERINFO_RE}', ''))")
    host = (f"CASE WHEN {scheme} = 'http' "
            f"THEN regexp_replace({hostport}, ':80$', '') "
            f"WHEN {scheme} = 'https' "
            f"THEN regexp_replace({hostport}, ':443$', '') "
            f"ELSE {hostport} END")
    trimmed = (f"regexp_replace(regexp_extract({no_frag}, '{_PATH_RE}', 1),"
               f" '/+$', '')")
    path = f"CASE WHEN {trimmed} = '' THEN '/' ELSE {trimmed} END"
    params = (f"list_sort(list_filter(string_split("
              f"regexp_extract({no_frag}, '\\?([^#]*)', 1), '&'), "
              f"p -> p != '' AND NOT regexp_matches(p, "
              f"'{TRACKING_PARAM_RE}')))")
    qnorm = (f"CASE WHEN len({params}) > 0 "
             f"THEN '?' || array_to_string({params}, '&') ELSE '' END")
    return (f"CASE WHEN {scheme} = '' OR {hostport} = '' THEN NULL "
            f"ELSE {scheme} || '://' || {host} || {path} || {qnorm} END")


def url_host(url: Column) -> Column:
    """Lowercased host of an absolute URL, any ``:port`` stripped; NULL
    when the string has no ``scheme://host`` shape. Pure column
    expression (the grouping key for per-domain corpus statistics)."""
    hostport = F.lower(F.regexp_replace(
        F.regexp_extract(url, _HOST_RE, 1), _USERINFO_RE, ""))
    host = F.regexp_replace(hostport, r":[0-9]+$", "")
    return F.when(host == "", F.lit(None).cast("string")).otherwise(host)


def url_host_sql(url_expr: str) -> str:
    """DuckDB restatement of :func:`url_host` (oracle twin)."""
    host = (f"regexp_replace(lower(regexp_replace(regexp_extract("
            f"{url_expr}, '{_HOST_RE}', 1), '{_USERINFO_RE}', '')), "
            f"':[0-9]+$', '')")
    return f"CASE WHEN {host} = '' THEN NULL ELSE {host} END"


def domain_stats(df: DataFrame, url_col: str = "url",
                 text_col: str = "text",
                 id_col: str = "doc_id") -> DataFrame:
    """Per-domain corpus composition — the source-mix report a web-scale
    corpus publishes (and the input to per-domain caps, the URL-keyed
    analogue of ``capped_stratified_sample``): document count, token
    count, and token-mass share per host; rows whose URL has no host
    group under NULL. One grouped aggregation over a pure-expression
    key plus a domains-sized window for the share — the corpus is
    scanned once and only domain-level rows shuffle."""
    from pyspark.sql import Window

    from harvesting_extract_to_ttl_service_spark.operators.text import (
        token_count,
    )

    per = (df.groupBy(url_host(F.col(url_col)).alias("host"))
           .agg(F.count("*").alias("n_docs"),
                F.sum(token_count(F.col(text_col))).alias("n_tokens")))
    share = F.col("n_tokens") / F.sum("n_tokens").over(
        Window.partitionBy())
    return per.select("host", "n_docs", "n_tokens",
                      F.round(share, 6).alias("token_share"))


def _host_matches(host: Column, domains: list[str]) -> Column:
    """True iff ``host`` equals one of ``domains`` or is a subdomain of
    one (suffix semantics: 'example.org' covers 'cdn.example.org' but
    NOT 'notexample.org')."""
    arr = F.array(*[F.lit(d.lower()) for d in domains])
    return F.exists(arr, lambda d: (host == d)
                    | host.endswith(F.concat(F.lit("."), d)))


def filter_domains(df: DataFrame, url_col: str = "url",
                   allow: list[str] | None = None,
                   block: list[str] | None = None) -> DataFrame:
    """Domain allow/block filtering — the blocklist pass of a crawl
    pipeline. ``block``: drop rows whose URL host is (a subdomain of)
    any listed domain; ``allow``: keep ONLY such rows; both: allow
    first, then block (carve-outs). Rows with no parseable host are
    DROPPED under ``allow`` (they cannot prove membership) and KEPT
    under ``block`` (they cannot match a blocked domain) — the
    conservative reading of each list.

    The lists are literal arrays in the plan (blocklists are
    config-sized); the filter is a pure column expression on the scan —
    no join, no shuffle."""
    if allow is None and block is None:
        raise ValueError("filter_domains: pass allow=, block=, or both")
    host = url_host(F.col(url_col))
    out = df
    if allow is not None:
        out = out.filter(host.isNotNull() & _host_matches(host, allow))
    if block is not None:
        out = out.filter(host.isNull() | ~_host_matches(host, block))
    return out


def drop_url_duplicates(df: DataFrame, url_col: str = "url",
                        id_col: str = "doc_id") -> DataFrame:
    """Keep the min-id row per canonical URL (first delivery wins — the
    same keep-one convention as content dedup, so the two stages compose
    without reordering surprises). Rows whose URL does not canonicalize
    (NULL key) are PASSED THROUGH untouched, one per row: failing to
    parse is not evidence of duplication, and collapsing all NULL keys
    into one row would silently delete unrelated documents.

    Adds the canonical key as ``_norm_url`` so downstream stages (and
    tests) can see the grouping key. Shuffle shape: one hash exchange on
    the canonical URL — the key space is the distinct-page count, no
    skew beyond genuinely hot pages (AQE handles those)."""
    from pyspark.sql import Window

    keyed = df.withColumn("_norm_url", normalize_url(F.col(url_col)))
    w = Window.partitionBy("_norm_url").orderBy(F.col(id_col))
    dups = (keyed.filter(F.col("_norm_url").isNotNull())
            .withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1).drop("_rn"))
    return dups.unionByName(keyed.filter(F.col("_norm_url").isNull()))
