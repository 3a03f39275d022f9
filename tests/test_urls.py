"""URL canonicalization: pinned contract cases, the Spark<->DuckDB
mirror battery (the driver-oracle for url_canonical_dedup depends on the
two engines producing byte-identical canonical forms), and the
canonical keep-first dedup."""

import pytest
from pyspark.sql import functions as F

MESSY = [
    # (input, canonical)
    ("https://Example.COM/Page", "https://example.com/Page"),
    ("HTTPS://WWW.Site.COM:443/a/b", "https://www.site.com/a/b"),
    ("http://host.com:80/x", "http://host.com/x"),
    ("http://host.com:8080/x", "http://host.com:8080/x"),
    ("https://h.com/p?utm_source=rss&utm_medium=feed", "https://h.com/p"),
    ("https://h.com/p?b=2&a=1", "https://h.com/p?a=1&b=2"),
    ("https://h.com/p?a=1&b=2#section-3", "https://h.com/p?a=1&b=2"),
    ("https://h.com/p?fbclid=XYZ&q=term", "https://h.com/p?q=term"),
    ("https://h.com/", "https://h.com"),
    ("https://h.com", "https://h.com"),
    ("  https://h.com/x  ", "https://h.com/x"),
    ("host.com/path?b=1&a=2", "host.com/path?a=2&b=1"),
    ("ftp://Files.Org:21/pub", "ftp://files.org:21/pub"),  # non-http port kept
    ("https://h.com/p?utm_x=1&utm_y=2", "https://h.com/p"),
    ("https://h.com/p?gclid", "https://h.com/p"),
    ("https://h.com/p?gclidx=1", "https://h.com/p?gclidx=1"),  # not a prefix match
    ("https://h.com/a%2Fb?X=1", "https://h.com/a%2Fb?X=1"),  # pct-enc kept verbatim
    ("https://h.com/#only-fragment", "https://h.com"),
]


def test_canonical_url_pinned_cases(spark):
    from readur_spark.functions.urls import canonical_url_col

    df = spark.createDataFrame([(u,) for u, _ in MESSY], "url string")
    got = [
        r["c"]
        for r in df.select(canonical_url_col(F.col("url")).alias("c")).collect()
    ]
    assert got == [c for _, c in MESSY]


def test_canonical_url_duckdb_mirror_battery(spark):
    # the oracle in __spark_entry__ re-implements canonicalization in
    # DuckDB SQL; this pins the two engines byte-identical on the messy
    # battery PLUS a generated grid of variants
    import duckdb

    from __spark_entry__ import _CANONICAL_URL_SQL
    from readur_spark.functions.urls import canonical_url_col

    urls = [u for u, _ in MESSY] + [
        f"HTTPS://WWW.Site{i % 7}.COM:443/page/{i % 13}"
        + ["", "/", "?utm_source=x", f"?b={i}&a=1", f"?a=1&b={i}#f{i}"][i % 5]
        for i in range(200)
    ]
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    got_spark = [
        r["c"]
        for r in df.select(canonical_url_col(F.col("url")).alias("c")).collect()
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE u(url VARCHAR)")
    con.executemany("INSERT INTO u VALUES (?)", [(u,) for u in urls])
    got_duck = [
        r[0]
        for r in con.execute(
            f"SELECT {_CANONICAL_URL_SQL.format(url='url')} FROM u"
        ).fetchall()
    ]
    assert got_spark == got_duck


def test_dedup_by_canonical_url_keep_first(spark):
    from readur_spark.functions.urls import dedup_by_canonical_url

    rows = [
        (1, "https://site.com/a"),
        (2, "HTTPS://SITE.COM:443/a#x"),  # same canonical as 1
        (3, "https://site.com/a?utm_source=rss"),  # same canonical as 1
        (4, "https://site.com/a?x=1"),  # distinct
        (5, "https://site.com/a?x=1"),  # exact dup of 4
    ]
    df = spark.createDataFrame(rows, "doc_id long, url string")
    out = dedup_by_canonical_url(df)
    got = {r["doc_id"]: r["canonical_url"] for r in out.collect()}
    assert got == {
        1: "https://site.com/a",
        4: "https://site.com/a?x=1",
    }
    # original columns survive
    assert set(out.columns) == {"doc_id", "url", "canonical_url"}


def test_dedup_keeps_all_docs_without_usable_url(spark):
    """NULL / empty-canonical urls mean 'unknown URL', not 'same page':
    all such docs survive the crawl-frontier dedup (review finding)."""
    from readur_spark.functions.urls import dedup_by_canonical_url

    rows = [
        (1, "https://a.com/x"),
        (2, "https://A.com/x"),  # canonical dup of 1
        (3, None),
        (4, None),
        (5, ""),
        (6, "   "),  # trims to empty canonical
    ]
    docs = spark.createDataFrame(rows, "doc_id long, url string")
    ids = sorted(
        r["doc_id"] for r in dedup_by_canonical_url(docs).collect()
    )
    assert ids == [1, 3, 4, 5, 6]
