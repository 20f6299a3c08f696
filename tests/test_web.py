"""URL/domain curation functions."""

from __future__ import annotations

from pyspark.sql import functions as F

from data_pipelines_spark.functions.web import (
    domain_cap_sample,
    filter_blocked_domains,
    registered_domain,
    url_host,
)


def _urls(spark, urls):
    return spark.createDataFrame(
        [(i, u) for i, u in enumerate(urls)], "doc_id long, url string"
    )


def test_url_host_and_registered_domain(spark):
    df = _urls(spark, [
        "https://news.example.com/a/b?q=1",
        "http://user:pw@Sub.Example.CO.UK:8080/x",
        "https://example.org",
        "ftp://a.b.c.d.example.com.au/f",
        "not a url",
        None,
    ]).select(
        "doc_id",
        url_host(F.col("url")).alias("host"),
        registered_domain(F.col("url")).alias("dom"),
    )
    got = {r["doc_id"]: (r["host"], r["dom"]) for r in df.collect()}
    assert got[0] == ("news.example.com", "example.com")
    assert got[1] == ("sub.example.co.uk", "example.co.uk")   # creds+port stripped
    assert got[2] == ("example.org", "example.org")           # bare eTLD+1
    assert got[3] == ("a.b.c.d.example.com.au", "example.com.au")
    assert got[4] == (None, None)
    assert got[5] == (None, None)


def test_filter_blocked_domains(spark):
    docs = _urls(spark, [
        "https://spam.bad.com/x",
        "https://ok.example.org/y",
        "garbage",                      # unparseable -> kept
    ])
    block = spark.createDataFrame([("bad.com",)], "domain string")
    kept = sorted(r["doc_id"] for r in
                  filter_blocked_domains(docs, block).collect())
    assert kept == [1, 2]


def test_domain_cap_sample_deterministic(spark):
    docs = _urls(spark, [f"https://d{i % 4}.example.com/p{i}"
                         for i in range(2000)])
    out = domain_cap_sample(docs, 0.25)
    a = sorted(r["doc_id"] for r in out.collect())
    b = sorted(r["doc_id"] for r in out.collect())
    assert a == b                      # reproducible
    assert 300 <= len(a) <= 700        # ~25% of 2000
    # every domain individually capped around the target rate
    per_dom = (
        domain_cap_sample(docs, 0.25)
        .groupBy(registered_domain(F.col("url")).alias("d")).count().collect()
    )
    # all four subdomains share one registered domain
    assert len(per_dom) == 1 and 300 <= per_dom[0]["count"] <= 700
    # cap 1.0 keeps everything; unparseable URLs always kept
    mixed = _urls(spark, ["junk", "https://x.example.com/a"])
    assert domain_cap_sample(mixed, 1.0).count() == 2
    assert domain_cap_sample(mixed, 0.0).where(
        F.col("url") == "junk").count() == 1


def test_domain_count_cap(spark):
    from data_pipelines_spark.functions.web import domain_count_cap

    # one huge domain (1500 docs), one small (20), one junk URL
    urls = [f"https://big.example.com/p{i}" for i in range(1500)]
    urls += [f"https://small.example.org/p{i}" for i in range(20)]
    urls += ["junk"]
    docs = _urls(spark, urls)
    out = domain_count_cap(docs, max_docs_per_domain=100)
    a = sorted(r["doc_id"] for r in out.collect())
    assert a == sorted(r["doc_id"] for r in out.collect())   # deterministic
    big = [i for i in a if i < 1500]
    small = [i for i in a if 1500 <= i < 1520]
    assert 50 <= len(big) <= 160          # ~100 expected from the big domain
    assert len(small) == 20               # small domains keep everything
    assert 1520 in a                      # unparseable URL kept
    # schema passthrough: cap columns are dropped
    assert out.columns == docs.columns


def test_url_host_fqdn_dot_and_ipv6(spark):
    """Probe regressions: a trailing-dot FQDN is the same host (never
    the bare TLD), and bracketed IPv6 literals unwrap instead of
    degenerating to '['."""
    df = _urls(spark, [
        "http://example.com./trail",
        "http://a.b.example.co.uk./x",
        "http://[2001:db8::1]:8080/p",
        "ftp://[::1]/x",
    ]).select(
        "doc_id",
        url_host(F.col("url")).alias("host"),
        registered_domain(F.col("url")).alias("dom"),
    )
    got = {r["doc_id"]: (r["host"], r["dom"]) for r in df.collect()}
    assert got[0] == ("example.com", "example.com")
    assert got[1] == ("a.b.example.co.uk", "example.co.uk")
    assert got[2] == ("2001:db8::1", "2001:db8::1")
    assert got[3] == ("::1", "::1")


def test_canonicalize_url(spark):
    from data_pipelines_spark.functions.web import canonicalize_url

    cases = [
        # scheme/host case, default port, fragment
        ("HTTP://Example.COM:80/Path/File?b=2&a=1#frag",
         "http://example.com/Path/File?a=1&b=2"),
        # https default port dropped; non-default kept
        ("https://example.com:443/x", "https://example.com/x"),
        ("https://example.com:8443/x", "https://example.com:8443/x"),
        # tracking params stripped, remaining sorted, empty query dropped
        ("https://a.com/p?utm_source=x&q=1&fbclid=abc",
         "https://a.com/p?q=1"),
        ("https://a.com/p?utm_source=x", "https://a.com/p"),
        # bare authority gets the root path
        ("https://a.com", "https://a.com/"),
        # creds never enter the canonical key
        ("http://user:pw@a.com/x", "http://a.com/x"),
        # non-URL -> NULL
        ("not a url", None),
        (None, None),
    ]
    df = _urls(spark, [c[0] for c in cases]).select(
        "doc_id", canonicalize_url(F.col("url")).alias("c")
    )
    got = {r["doc_id"]: r["c"] for r in df.collect()}
    for i, (_, want) in enumerate(cases):
        assert got[i] == want, (i, cases[i][0], got[i])


def test_canonicalize_url_groups_tracking_variants(spark):
    """The point of the canonical form: the same resource reached via
    different tracking links collapses to one key."""
    from data_pipelines_spark.functions.web import canonicalize_url

    variants = [
        "https://news.site.org/story?id=7&utm_campaign=a",
        "https://NEWS.site.org/story?id=7",
        "https://news.site.org:443/story?utm_source=tw&id=7#top",
    ]
    df = _urls(spark, variants).select(canonicalize_url(F.col("url")).alias("c"))
    assert df.distinct().count() == 1


def test_canonicalize_url_ipv6_port_and_ip_domains(spark):
    """Probe regressions: (a) a bracketed-IPv6 authority keeps its
    brackets and its non-default port in the canonical form — before the
    fix [::1]:8080 and [::1]:9090 collapsed to one dedup key with the
    port silently dropped; (b) an IP-literal host IS its registered
    domain — truncating 192.168.0.1 to '0.1' pooled unrelated IPs into
    one cap/blocklist bucket."""
    from data_pipelines_spark.functions.web import canonicalize_url

    cases = [
        ("http://[::1]:8080/x", "http://[::1]:8080/x", "::1"),
        ("http://[::1]:9090/x", "http://[::1]:9090/x", "::1"),
        # IPv6 default port drops like any other host's
        ("https://[2001:db8::1]:443/p", "https://[2001:db8::1]/p", "2001:db8::1"),
        ("http://[2001:db8::1]:443/p", "http://[2001:db8::1]:443/p", "2001:db8::1"),
        ("http://192.168.0.1/x", "http://192.168.0.1/x", "192.168.0.1"),
        ("http://10.0.0.1:8080/x", "http://10.0.0.1:8080/x", "10.0.0.1"),
    ]
    df = _urls(spark, [c[0] for c in cases]).select(
        "doc_id",
        canonicalize_url(F.col("url")).alias("c"),
        registered_domain(F.col("url")).alias("dom"),
    )
    got = {r["doc_id"]: (r["c"], r["dom"]) for r in df.collect()}
    for i, (_, want_c, want_d) in enumerate(cases):
        assert got[i] == (want_c, want_d), (i, cases[i][0], got[i])


# ---------------------------------------------------------------------------
# HTML → text extraction
# ---------------------------------------------------------------------------

from data_pipelines_spark.functions.web import (  # noqa: E402
    extract_links,
    extract_title,
    html_to_text,
)


def _extract(spark, html):
    df = spark.createDataFrame([(html,)], "html string")
    return df.select(html_to_text(F.col("html")).alias("t")).first()["t"]


def test_html_to_text_basic_page(spark):
    html = (
        "<!DOCTYPE html><html><head><title>My &amp; Title</title>"
        "<style>body { color: red }</style>"
        "<script type='text/javascript'>var x = '<p>not text</p>';</script>"
        "</head><body>"
        "<h1>Heading</h1>"
        "<p>First <b>bold</b> paragraph.</p>"
        "<!-- a comment <p>hidden</p> -->"
        "<p>Second&nbsp;para with &lt;tags&gt; &amp; entities.</p>"
        "</body></html>"
    )
    assert _extract(spark, html) == (
        "My & Title\nHeading\nFirst bold paragraph.\n"
        "Second para with <tags> & entities."
    )


def test_html_to_text_rules(spark):
    # inline tags separate words only at the tag position
    assert _extract(spark, "a</b>b don<b></b>t") == "a b don t"
    # br/hr become newlines; 3+ blank lines collapse to one paragraph break
    assert _extract(spark, "a<br>b<br/><br />\n\n<hr>c") == "a\nb\n\nc"
    # double-escaped entity stays literal text
    assert _extract(spark, "x &amp;lt; y") == "x &lt; y"
    # script content with attributes and case variance vanishes
    assert _extract(spark, "A<SCRIPT src='x'>if (a<b) {}</script>B") == "A B"
    # exotic numeric entities pass through for the quality tier
    assert _extract(spark, "a &#8212; b") == "a &#8212; b"
    # NULL stays NULL (fetch failure is not an empty document)
    df = spark.createDataFrame([(None,)], "html string")
    assert df.select(html_to_text(F.col("html")).alias("t")).first()["t"] is None


def test_extract_title_and_links(spark):
    html = (
        '<html><head><TITLE> A &quot;quoted&quot;\n  title </TITLE></head>'
        '<body><a href="http://x.org/1">one</a>'
        "<a class='z' HREF='/rel'>two</a><a name=anchor>no href</a></body>"
    )
    df = spark.createDataFrame([(0, html), (1, "<p>no title</p>")],
                               "i long, html string")
    out = df.select(
        "i",
        extract_title(F.col("html")).alias("title"),
        extract_links(F.col("html")).alias("links"),
    ).orderBy("i").collect()
    assert out[0]["title"] == 'A "quoted" title'
    assert out[0]["links"] == ["http://x.org/1", "/rel"]
    assert out[1]["title"] is None
    assert out[1]["links"] == []


def test_registered_domain_psl(spark):
    from data_pipelines_spark.functions.web import registered_domain_psl

    psl = spark.createDataFrame(
        [("// comment",), ("",), ("com",), ("ar",), ("com.ar",),
         ("uk",), ("co.uk",), ("jp",), ("*.ck",), ("!www.ck",)],
        "rule string",
    )
    cases = [
        (1, "http://a.b.example.com/x", "example.com"),
        (2, "https://deep.sub.example.com.ar/", "example.com.ar"),  # 3-label suffix
        (3, "http://example.co.uk", "example.co.uk"),
        (4, "http://shop.example.jp", "example.jp"),
        (5, "http://www.xx.ck/", "www.xx.ck"),      # wildcard *.ck
        (6, "http://xx.ck/", None),                  # host IS a public suffix
        (7, "http://www.ck/", "www.ck"),             # exception beats wildcard
        (8, "http://sub.www.ck/", "www.ck"),
        (9, "http://example.zz/", "example.zz"),     # implicit '*' rule
        (10, "http://zz/", None),                    # bare unknown TLD
        (11, "http://192.168.0.1:8080/", "192.168.0.1"),
        (12, "not a url", None),
        (13, "http://com.ar/", None),                # exact suffix host
    ]
    df = spark.createDataFrame(
        [(i, u) for i, u, _ in cases], "doc_id long, url string"
    )
    out = registered_domain_psl(df, psl, id_col="doc_id")
    got = {r["doc_id"]: r["registered_domain"] for r in out.collect()}
    for i, _, want in cases:
        assert got[i] == want, (i, got[i], want)
    # generated-id path keeps row count and drops the helper id
    out2 = registered_domain_psl(df, psl)
    assert out2.count() == len(cases)
    assert set(out2.columns) == {"doc_id", "url", "registered_domain"}


def test_registered_domain_psl_matches_heuristic_on_head(spark):
    """On the heuristic's own suffix head the two implementations must
    agree — the PSL version is a strict generalization."""
    from data_pipelines_spark.functions.web import (
        _TWO_LABEL_SUFFIXES,
        registered_domain,
        registered_domain_psl,
    )
    from pyspark.sql import functions as F

    tlds = sorted({s.split(".")[-1] for s in _TWO_LABEL_SUFFIXES})
    psl = spark.createDataFrame(
        [(s,) for s in _TWO_LABEL_SUFFIXES] + [(t,) for t in tlds]
        + [("com",), ("org",)],
        "rule string",
    )
    urls = [
        (1, "http://a.b.example.co.uk/"),
        (2, "http://example.com.au"),
        (3, "http://www.example.com/"),
        (4, "http://example.org"),
        (5, "http://only.co.jp/"),
    ]
    df = spark.createDataFrame(urls, "doc_id long, url string")
    both = registered_domain_psl(df, psl, id_col="doc_id").withColumn(
        "heur", registered_domain(F.col("url"))
    )
    for r in both.collect():
        assert r["registered_domain"] == r["heur"], r
