#!/usr/bin/env python
"""Worked example: the crawl ACQUISITION side, end to end.

`corpus_pipeline.py` curates text that already arrived; this example is
the stage before it — how pages are discovered, permission-gated,
fetched, archived, and selectively re-read, all in the 100 TB shapes
(per-file tasks, broadcast rule joins, range reads), exercised tiny and
hermetic (file:// URLs, no network):

    sitemap discovery (index recursion)
      → robots.txt permission gate (RFC 9309 longest-match)
      → URL canonicalization + exact URL dedup
      → distributed fetch (bounded retry)
      → WARC archive shards + CDX index (WET export path)
      → index-driven SELECTIVE re-read (range-read one member/record)
      → HTML → text extraction

    python examples/crawl_frontier_pipeline.py
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from data_pipelines_spark.functions.web import canonicalize_url, html_to_text
from data_pipelines_spark.operators.robots import (
    filter_by_robots,
    parse_robots,
)
from data_pipelines_spark.session import get_spark
from data_pipelines_spark.sources.fetch import fetch_binary
from data_pipelines_spark.sources.sitemap import read_sitemaps
from data_pipelines_spark.sources.warc import (
    read_cdx_index,
    read_warc_selective,
    write_warc_shards,
)

N_PAGES = 40


def build_site(root: str) -> str:
    """A tiny static site: pages, a robots.txt, a sharded sitemap."""
    os.makedirs(f"{root}/private", exist_ok=True)
    for i in range(N_PAGES):
        sub = "private" if i % 5 == 0 else "."
        with open(f"{root}/{sub}/p{i}.html", "w") as f:
            f.write(
                f"<html><head><title>Page {i}</title></head>"
                f"<body><p>Body of page {i} &amp; more</p></body></html>"
            )
    with open(f"{root}/robots.txt", "w") as f:
        f.write(
            "User-agent: *\nDisallow: /private/\nCrawl-delay: 1\n"
            f"Sitemap: file://{root}/index.xml\n"
        )
    # sitemap index → two shards; private pages are listed (the gate,
    # not the sitemap, is what must keep them out)
    half = N_PAGES // 2
    for s, lo, hi in (("s1", 0, half), ("s2", half, N_PAGES)):
        with open(f"{root}/{s}.xml", "w") as f:
            f.write("<urlset>")
            for i in range(lo, hi):
                sub = "private/" if i % 5 == 0 else ""
                # tracking params + fragments: canonicalization fodder
                f.write(
                    f"<url><loc>file://{root}/{sub}p{i}.html"
                    f"?utm_source=feed#top</loc></url>"
                )
            f.write("</urlset>")
    with open(f"{root}/index.xml", "w") as f:
        f.write(
            "<sitemapindex>"
            f"<sitemap><loc>file://{root}/s1.xml</loc></sitemap>"
            f"<sitemap><loc>file://{root}/s2.xml</loc></sitemap>"
            "</sitemapindex>"
        )
    return f"file://{root}/index.xml"


def main() -> None:
    spark = get_spark(app_name="crawl-frontier-example")
    spark.sparkContext.setLogLevel("ERROR")
    site = tempfile.mkdtemp(prefix="crawl_site_")
    out_dir = tempfile.mkdtemp(prefix="crawl_wet_")
    build_site(site)

    # 0. robots.txt is read FIRST: it carries both the permission rules
    # and the sitemap pointer (+ the politeness budget)
    from data_pipelines_spark.operators.robots import (
        crawl_delays,
        robots_sitemaps,
    )

    host = "demo.example"
    with open(f"{site}/robots.txt") as f:
        robots = spark.createDataFrame(
            [(host, f.read())], "host string, content string"
        )
    sitemap_urls = [r["sitemap"] for r in robots_sitemaps(robots).collect()]
    delays = {r["host"]: r["crawl_delay"]
              for r in crawl_delays(robots, agent="examplebot").collect()}
    print(f"robots: {len(sitemap_urls)} sitemap(s), "
          f"crawl-delay={delays.get(host)}s")

    # 1. discovery: sitemap index recursion → URL frontier
    frontier = read_sitemaps(spark, sitemap_urls)
    print(f"discovered: {frontier.count()} urls")

    # 2. politeness: the same robots rules gate the frontier BEFORE any
    # fetch. The local files stand in for a host — the frontier's
    # public face is http://demo.example/<path>, mapped back to file://
    # only at fetch time (exactly a crawler's url-vs-storage split).
    public = frontier.select(
        F.regexp_replace(
            "loc", f"^file://{site}", f"http://{host}"
        ).alias("url")
    )
    allowed = filter_by_robots(
        public, parse_robots(robots), agent="examplebot"
    )
    print(f"robots-allowed: {allowed.count()} of {public.count()} urls")

    # 3. canonicalize + URL-level dedup (tracking params, fragments)
    canon = allowed.select(
        canonicalize_url(F.col("url")).alias("url")
    ).distinct()
    n_urls = canon.count()
    print(f"canonical distinct: {n_urls} urls")

    # 4. distributed fetch (public URL → storage URL)
    urls = [
        r["url"].replace(f"http://{host}", f"file://{site}")
        for r in canon.collect()  # frontier-file-sized
    ]
    pages = fetch_binary(spark, urls).where("ok").select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.col("url"),
        F.decode("content", "UTF-8").alias("html"),
    )

    # 5. extract + archive as WARC shards with a CDX index
    docs = pages.select(
        "doc_id", "url", html_to_text(F.col("html")).alias("text")
    )
    manifest = write_warc_shards(
        docs, out_dir, 3, uri_col="url", index=True
    ).collect()
    total = sum(r["n_records"] for r in manifest)
    print(f"archived: {total} records in {len(manifest)} shards "
          f"(+ CDX sidecars)")

    # 6. selective re-read: fetch ONE specific page back by index —
    # bytes touched = that member, not the shard
    idx = read_cdx_index(spark, [r["index_path"] for r in manifest])
    one = idx.where(F.col("target_uri").contains("p7.html"))
    rec = read_warc_selective(spark, one).collect()
    assert len(rec) == 1 and "Body of page 7" in rec[0]["text"]
    sel_bytes = one.collect()[0]["member_length"]
    all_bytes = sum(r["n_bytes"] for r in manifest)
    print(f"selective read: 1 record, {sel_bytes} of {all_bytes} bytes "
          f"touched ({100.0 * sel_bytes / all_bytes:.1f}%)")

    expected = N_PAGES - N_PAGES // 5  # private pages gated out
    assert total == expected, (total, expected)
    print("OK")


if __name__ == "__main__":
    main()
