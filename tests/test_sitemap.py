"""Sitemap source (`sources.sitemap`): urlset parse (entities, CDATA,
optional fields), index recursion with seen-set cycle safety, depth
bound, hermetic fetch injection."""

import pytest

from data_pipelines_spark.sources.sitemap import (
    is_sitemap_index,
    parse_sitemap_entries,
    parse_sitemap_index,
    read_sitemaps,
)

URLSET = """<?xml version="1.0" encoding="UTF-8"?>
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <url>
    <loc>http://ex.org/a?x=1&amp;y=2</loc>
    <lastmod>2024-01-05</lastmod>
    <changefreq>daily</changefreq>
    <priority>0.8</priority>
  </url>
  <url><loc><![CDATA[http://ex.org/cdata&raw]]></loc></url>
  <url><lastmod>2024-01-01</lastmod></url>
  <url>
    <loc>
      http://ex.org/whitespace
    </loc>
    <priority>not-a-number</priority>
  </url>
</urlset>
"""

INDEX = """<?xml version="1.0"?>
<sitemapindex xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
  <sitemap><loc>http://ex.org/s1.xml</loc></sitemap>
  <sitemap><loc>http://ex.org/s2.xml</loc><lastmod>2024-02-02</lastmod></sitemap>
</sitemapindex>
"""


def test_parse_urlset(spark):
    df = spark.createDataFrame(
        [("http://ex.org/sitemap.xml", URLSET)], "sitemap string, content string"
    )
    rows = {r["loc"]: r for r in parse_sitemap_entries(df).collect()}
    # entity decode + full fields
    assert "http://ex.org/a?x=1&y=2" in rows
    r = rows["http://ex.org/a?x=1&y=2"]
    assert (r["lastmod"], r["changefreq"], r["priority"]) == (
        "2024-01-05", "daily", 0.8,
    )
    # CDATA unwraps, raw & kept
    assert "http://ex.org/cdata&raw" in rows
    # loc-less entry dropped; whitespace trimmed; bad priority -> NULL
    assert len(rows) == 3
    assert rows["http://ex.org/whitespace"]["priority"] is None


def test_parse_index_and_detector(spark):
    df = spark.createDataFrame(
        [("http://ex.org/idx.xml", INDEX)], "sitemap string, content string"
    )
    kids = sorted(r["child"] for r in parse_sitemap_index(df).collect())
    assert kids == ["http://ex.org/s1.xml", "http://ex.org/s2.xml"]
    from pyspark.sql import functions as F

    flags = df.select(is_sitemap_index(F.col("content")).alias("f")).collect()
    assert flags[0]["f"] is True


def _stub_fetch(bodies):
    """Hermetic fetch: url -> (ok, content) from a dict."""
    def fetch(spark, urls):
        rows = [
            (u, True, bytearray(bodies[u].encode()))
            for u in urls if u in bodies
        ]
        return spark.createDataFrame(
            rows, "url string, ok boolean, content binary"
        )
    return fetch


def test_read_sitemaps_recurses_index(spark):
    bodies = {
        "http://ex.org/idx.xml": INDEX,
        "http://ex.org/s1.xml": URLSET,
        "http://ex.org/s2.xml": (
            "<urlset><url><loc>http://ex.org/only</loc></url></urlset>"
        ),
    }
    out = read_sitemaps(
        spark, ["http://ex.org/idx.xml"], fetch=_stub_fetch(bodies)
    )
    locs = sorted(r["loc"] for r in out.collect())
    assert locs == sorted([
        "http://ex.org/a?x=1&y=2",
        "http://ex.org/cdata&raw",
        "http://ex.org/whitespace",
        "http://ex.org/only",
    ])


def test_read_sitemaps_fetches_each_url_exactly_once(spark):
    """ADVICE r9 regression: the bodies were unpersisted before the
    lazily-built entry frames materialized, so consuming the result
    re-ran the fetch — every sitemap hit the network twice. The eager
    stub above can't see that (it fetches at call time), so this stub
    fetches INSIDE a distributed op and counts executions with an
    accumulator; re-execution would double the count."""
    bodies = {
        "http://ex.org/idx.xml": INDEX,
        "http://ex.org/s1.xml": URLSET,
        "http://ex.org/s2.xml": (
            "<urlset><url><loc>http://ex.org/only</loc></url></urlset>"
        ),
    }
    fetch_count = spark.sparkContext.accumulator(0)

    def lazy_fetch(spark_, urls):
        def run(batches):
            for pdf in batches:
                for u in pdf["url"]:
                    fetch_count.add(1)
                yield __import__("pandas").DataFrame(
                    {
                        "url": pdf["url"],
                        "ok": [u in bodies for u in pdf["url"]],
                        "content": [
                            bodies.get(u, "").encode() for u in pdf["url"]
                        ],
                    }
                )
        return (
            spark_.createDataFrame([(u,) for u in urls], "url string")
            .repartition(2)
            .mapInPandas(run, "url string, ok boolean, content binary")
        )

    out = read_sitemaps(
        spark, ["http://ex.org/idx.xml"], fetch=lazy_fetch
    )
    assert out.count() == 4
    out.collect()  # consume a second time — still no refetch
    assert fetch_count.value == 3  # idx + s1 + s2, each exactly once


def test_read_sitemaps_cycle_is_safe_and_depth_bounds(spark):
    cyc = {
        "http://ex.org/a.xml": (
            "<sitemapindex><sitemap><loc>http://ex.org/b.xml</loc>"
            "</sitemap></sitemapindex>"
        ),
        "http://ex.org/b.xml": (
            "<sitemapindex><sitemap><loc>http://ex.org/a.xml</loc>"
            "</sitemap></sitemapindex>"
        ),
    }
    # pure cycle: terminates with zero entries, no raise
    out = read_sitemaps(
        spark, ["http://ex.org/a.xml"], fetch=_stub_fetch(cyc)
    )
    assert out.count() == 0

    # genuine over-deep nesting raises
    deep = {
        f"http://ex.org/d{i}.xml": (
            "<sitemapindex><sitemap>"
            f"<loc>http://ex.org/d{i + 1}.xml</loc>"
            "</sitemap></sitemapindex>"
        )
        for i in range(6)
    }
    with pytest.raises(ValueError, match="max_depth"):
        read_sitemaps(
            spark, ["http://ex.org/d0.xml"],
            fetch=_stub_fetch(deep), max_depth=2,
        )
