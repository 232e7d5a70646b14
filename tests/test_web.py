"""URL canonicalization + URL-keyed dedup (operators/web.py)."""

from pyspark.sql import functions as F

from harvesting_extract_to_ttl_service_spark.operators.web import (
    drop_url_duplicates,
    normalize_url,
    normalize_url_sql,
)


def _norm(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)],
                               "i long, url string")
    rows = (df.select("i", normalize_url(F.col("url")).alias("n"))
            .collect())
    return [r.n for r in sorted(rows, key=lambda r: r.i)]


def test_normalize_url_canonical_forms(spark):
    got = _norm(spark, [
        "HTTPS://Ex.ORG:443/A/b/?utm_source=x&b=2&a=1#frag",
        "https://ex.org/A/b?a=1&b=2",
        "http://EX.org:80/",
        "http://ex.org",
        "https://ex.org:8443/x",        # non-default port survives
        "https://ex.org/x?fbclid=1&gclid=2&msclkid=3&ref=r&utm_a=1",
        "ftp://ex.org/file",            # non-http scheme: port untouched
        "not a url at all",
        "",
    ])
    assert got[0] == "https://ex.org/A/b?a=1&b=2"
    assert got[1] == "https://ex.org/A/b?a=1&b=2"
    assert got[2] == "http://ex.org/"
    assert got[3] == "http://ex.org/"
    assert got[4] == "https://ex.org:8443/x"
    assert got[5] == "https://ex.org/x"
    assert got[6] == "ftp://ex.org/file"
    assert got[7] is None
    assert got[8] is None


def test_normalize_url_matches_duckdb_twin(spark):
    import duckdb

    urls = [
        "HTTPS://Ex.ORG:443/A/b/?utm_source=x&b=2&a=1#frag",
        "https://ex.org/A/b?a=1&b=2",
        "http://EX.org:80///",
        "https://ex.org/x?z=9&fbclid=1&a=2",
        "https://ex.org:8443/x/",
        "nope",
    ]
    spark_vals = _norm(spark, urls)
    con = duckdb.connect()
    # inline quoted literals: '?' placeholders collide with the '?'
    # inside the regex patterns themselves
    duck_vals = [
        con.execute("SELECT " + normalize_url_sql(
            "'" + u.replace("'", "''") + "'")).fetchone()[0]
        for u in urls
    ]
    assert spark_vals == duck_vals


def test_drop_url_duplicates_keep_min_and_null_lane(spark):
    df = spark.createDataFrame([
        (1, "https://ex.org/p?b=2&a=1"),
        (2, "HTTPS://EX.ORG/p/?a=1&b=2&utm_x=t"),   # same canonical as 1
        (3, "https://ex.org/q"),
        (4, "garbage one"),
        (5, "garbage two"),                          # NULL keys both kept
    ], "doc_id long, url string")
    out = drop_url_duplicates(df).collect()
    kept = sorted(r.doc_id for r in out)
    assert kept == [1, 3, 4, 5]
    by_id = {r.doc_id: r._norm_url for r in out}
    assert by_id[1] == "https://ex.org/p?a=1&b=2"
    assert by_id[4] is None and by_id[5] is None
