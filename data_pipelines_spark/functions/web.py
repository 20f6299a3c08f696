"""URL/domain column functions for web-corpus curation.

Crawl-derived corpora filter by URL before anything touches the text:
domain blocklists, per-domain caps (one domain must not dominate the
training mix), and URL-pattern rules are the cheapest, earliest gate in
the pipeline. All native expressions — regexp + string ops, no UDFs —
so they fuse into the scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# scheme://host[:port]/...  -> host (lowercased, port and creds stripped)
_HOST_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?([^/:?#]+)"
# bracketed IPv6 authority: scheme://[::1]:8080/ -> ::1
_HOST6_RE = r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?\[([^\]]+)\]"

# Multi-label public suffixes that need three labels for a registered
# domain (a pragmatic head of the public-suffix list; a real deployment
# swaps in the full PSL as a broadcast lookup).
_TWO_LABEL_SUFFIXES = (
    "co.uk", "ac.uk", "gov.uk", "org.uk", "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp", "com.br", "com.cn", "com.mx", "co.in",
    "co.kr", "com.tw", "com.sg", "co.za",
)


def url_host(url: Column) -> Column:
    """Hostname of a URL (lowercase; credentials/port/path stripped,
    trailing FQDN dot removed, bracketed IPv6 literals unwrapped);
    null for non-URLs."""
    host6 = F.regexp_extract(url, _HOST6_RE, 1)
    host = F.lower(
        F.when(host6 != "", host6).otherwise(F.regexp_extract(url, _HOST_RE, 1))
    )
    # "example.com." is the same FQDN as "example.com"; keeping the dot
    # would map it to the bare TLD in registered_domain.
    host = F.regexp_replace(host, r"\.$", "")
    return F.when(host != "", host)


def registered_domain(url: Column) -> Column:
    """eTLD+1 ("example.co.uk" from "a.b.example.co.uk") — the key for
    per-domain caps and blocklists; label-count heuristic over a
    suffix-list head. IP-literal hosts (IPv4 dotted quads, IPv6) have no
    registrable suffix: the host itself is the key — truncating
    192.168.0.1 to "0.1" would pool unrelated IPs into one cap bucket."""
    # Expression-size note: `host` is itself a multi-regexp tree and
    # every reference below INLINES a copy into the generated code, so
    # this function deliberately uses substring_index / dot-count forms
    # (1 host reference each) over split/element_at (which would embed
    # split(host) five times) — the difference between fitting in a
    # 64 KB whole-stage-codegen method and falling back to interpreted
    # eval when fused with a join stage (observed with domain_count_cap).
    host = url_host(url)
    is_ip = host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$") | host.contains(":")
    # label count - 1 == dot count; avoids materializing split(host)
    n_dots = F.length(host) - F.length(F.translate(host, ".", ""))
    last2 = F.substring_index(host, ".", -2)
    is_two_label = last2.isin(*_TWO_LABEL_SUFFIXES)
    take3 = F.substring_index(host, ".", -3)
    return F.when(host.isNull(), F.lit(None).cast("string")).when(
        is_ip | (n_dots <= 1), host
    ).when(is_two_label & (n_dots >= 2), take3).otherwise(last2)


def registered_domain_psl(
    docs: DataFrame,
    psl: DataFrame,
    url_col: str = "url",
    out_col: str = "registered_domain",
    id_col: str | None = None,
) -> DataFrame:
    """eTLD+1 with FULL Public Suffix List semantics — the upgrade path
    `registered_domain`'s docstring promises (its two-label head
    mis-keys e.g. ``*.com.ar``). ``psl`` is one ``rule`` string column
    holding the PSL in its published format: plain suffixes
    (``com.ar``), wildcards (``*.ck`` — the ``*`` matches exactly one
    label), exceptions (``!www.ck`` — wins over any wildcard), ``//``
    comment lines tolerated. Appends ``out_col`` (NULL when the host is
    itself a public suffix, unparseable, or absent); IP-literal hosts
    key as themselves, same rationale as `registered_domain`.

    Algorithm (publicsuffix.org/list/): among matching rules an
    exception wins outright (public suffix = the rule minus its
    leftmost label), else the longest match; no match → the implicit
    ``*`` rule (public suffix = the TLD). Registered domain = public
    suffix + one more host label.

    Plan shape at 100 TB: label-aligned candidate suffixes explode
    ~4 rows/doc (capped at the longest rule in the list), broadcast
    hash join against the dimension-sized rule table (~10k rows), one
    grouped argmax back to doc grain keyed by ``id_col`` (default: a
    generated row id from ``monotonically_increasing_id`` — pass a real
    key for deterministic lineage under retries). No window over an
    unbounded partition, no UDFs.
    """
    rule = F.trim(F.col("rule"))
    rules = (
        psl.select(rule.alias("rule"))
        .where(
            (F.col("rule") != "") & ~F.col("rule").startswith("//")
        )
        .select(
            F.col("rule"),
            F.col("rule").startswith("!").alias("is_exc"),
            F.regexp_replace(F.col("rule"), r"^!", "").alias("base"),
        )
        .select(
            "is_exc",
            F.col("base").startswith("*.").alias("is_wild"),
            F.regexp_replace("base", r"^\*\.", "").alias("key"),
        )
        .select(
            "is_exc",
            "is_wild",
            "key",
            (
                F.length("key")
                - F.length(F.translate("key", ".", ""))
                + 1
            ).alias("key_labels"),
        )
        .select(
            "key",
            "is_exc",
            # public-suffix label count this rule implies on a match
            F.when(F.col("is_exc"), F.col("key_labels") - 1)
            .when(F.col("is_wild"), F.col("key_labels") + 1)
            .otherwise(F.col("key_labels"))
            .alias("ps_labels"),
            F.col("key_labels").alias("match_labels"),
        )
    )
    [max_k] = rules.agg(F.max("match_labels")).first()  # 1-row collect
    max_k = int(max_k or 1)

    drop_id = id_col is None
    rid = id_col or "__rd_rid"
    keyed = docs if id_col else docs.withColumn(
        rid, F.monotonically_increasing_id()
    )
    host = url_host(F.col(url_col))
    is_ip = host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$") | host.contains(":")
    base = keyed.withColumn("__host", host).withColumn(
        "__n",
        F.length("__host")
        - F.length(F.translate(F.col("__host"), ".", ""))
        + 1,
    ).withColumn("__is_ip", is_ip)

    cand = base.where(
        F.col("__host").isNotNull() & ~F.col("__is_ip")
    ).select(
        rid,
        "__host",
        "__n",
        F.explode(
            F.sequence(F.lit(1), F.least(F.col("__n"), F.lit(max_k)))
        ).alias("__k"),
    ).select(
        rid,
        "__host",
        "__n",
        "__k",
        F.expr("substring_index(__host, '.', -__k)").alias("__suffix"),
    )

    matched = cand.join(
        F.broadcast(rules),
        (F.col("__suffix") == F.col("key"))
        & (F.col("__k") == F.col("match_labels")),
    )
    best = matched.groupBy(rid).agg(
        F.max(
            F.struct(
                F.col("is_exc").cast("int").alias("p"),
                # exceptions outrank everything; ps sign-flipped under
                # the exception branch is unnecessary — the PSL
                # guarantees at most one exception matches
                F.col("ps_labels").alias("ps"),
            )
        ).alias("__best")
    ).select(rid, F.col("__best.ps").alias("__ps"))

    out = base.join(best, rid, "left").withColumn(
        "__ps_final",
        F.when(F.col("__is_ip"), F.lit(0)).otherwise(
            F.coalesce(F.col("__ps"), F.lit(1))  # implicit '*' rule
        ),
    ).withColumn(
        out_col,
        F.when(F.col("__host").isNull(), F.lit(None).cast("string"))
        .when(F.col("__is_ip"), F.col("__host"))
        .when(
            F.col("__n") >= F.col("__ps_final") + 1,
            F.expr("substring_index(__host, '.', -(__ps_final + 1))"),
        ),
    ).drop("__host", "__n", "__is_ip", "__ps", "__ps_final")
    return out.drop(rid) if drop_id else out


def filter_blocked_domains(
    docs: DataFrame,
    blocklist: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Drop documents whose registered domain is blocklisted.

    The blocklist is dimension-sized (thousands to low millions of
    domains) next to the corpus — broadcast anti-join, the same 100 TB
    shape as benchmark decontamination. ``blocklist`` needs one
    ``domain`` column; rows with un-parseable URLs are KEPT (they fail
    toward manual review, not silent loss)."""
    keyed = docs.withColumn("__dom", registered_domain(F.col(url_col)))
    return keyed.join(
        F.broadcast(blocklist.select(F.col("domain").alias("__dom"))),
        "__dom",
        "left_anti",
    ).drop("__dom")


def domain_count_cap(
    docs: DataFrame,
    max_docs_per_domain: int,
    url_col: str = "url",
    id_col: str = "doc_id",
    salt: str = "domaincap",
    portable: bool = False,
) -> DataFrame:
    """Absolute per-domain cap: keep ~``max_docs_per_domain`` documents
    from each registered domain, deterministically.

    Expected-count form: each doc flips its hash coin against
    N / count(domain), so a domain with 10M pages contributes ~N docs
    while small domains keep everything — without the per-domain
    row_number window whose giant-domain partitions would skew at
    corpus scale. One aggregation + one join on the domain key (AQE
    broadcasts the count side when it fits); unparseable URLs are kept.
    """
    from data_pipelines_spark.operators.corpus import hash_fraction

    keyed = docs.withColumn("__dom", registered_domain(F.col(url_col)))
    counts = keyed.where(F.col("__dom").isNotNull()).groupBy("__dom").agg(
        F.count(F.lit(1)).alias("__dom_cnt")
    )
    coin = hash_fraction(
        F.concat_ws("/", F.col("__dom"), F.col(id_col).cast("string")),
        salt,
        portable,
    )
    rate = F.least(
        F.lit(1.0), F.lit(float(max_docs_per_domain)) / F.col("__dom_cnt")
    )
    return (
        keyed.join(counts, "__dom", "left")
        .where(F.col("__dom").isNull() | (coin < rate))
        .drop("__dom", "__dom_cnt")
    )


def domain_cap_sample(
    docs: DataFrame,
    max_frac_per_domain: float,
    url_col: str = "url",
    id_col: str = "doc_id",
    salt: str = "domaincap",
    portable: bool = False,
) -> DataFrame:
    """Per-domain frequency cap: deterministically keep at most
    ``max_frac_per_domain`` of each registered domain's documents — the
    anti-SEO-spam mixing rule (no domain should dominate the corpus).
    Same hash-coin machinery as stratified sampling: a pure narrow
    filter, no shuffle, reproducible across runs."""
    from data_pipelines_spark.operators.corpus import hash_fraction

    keyed = docs.withColumn("__dom", registered_domain(F.col(url_col)))
    coin = hash_fraction(
        F.concat_ws("/", F.col("__dom"), F.col(id_col).cast("string")),
        salt,
        portable,
    )
    return keyed.where(
        F.col("__dom").isNull() | (coin < F.lit(float(max_frac_per_domain)))
    ).drop("__dom")


# Tracking parameters stripped by canonicalize_url — the ubiquitous
# analytics/click-id keys; extend per deployment.
TRACKING_PARAMS = (
    "utm_source", "utm_medium", "utm_campaign", "utm_term", "utm_content",
    "gclid", "fbclid", "msclkid", "mc_cid", "mc_eid", "ref", "igshid",
)


def canonicalize_url(url: Column, strip_params: tuple[str, ...] = TRACKING_PARAMS) -> Column:
    """Canonical URL form for URL-level dedup and grouping:

    - scheme and host lowercased (path case preserved — it is
      significant), credentials kept out of the key via the host parse;
    - default ports dropped (``:80`` for http, ``:443`` for https);
    - fragment removed (never sent to the server);
    - tracking query parameters (``strip_params``) removed, remaining
      parameters sorted by name so parameter order doesn't split
      identical resources;
    - trailing ``?`` / lone trailing slash on the root path normalized.

    Returns NULL for non-URLs (same contract as :func:`url_host`). All
    native expressions — regexp + split/filter/sort — so the
    canonicalization fuses into the scan, the right place for the
    cheapest-first curation gate.
    """
    scheme = F.lower(F.regexp_extract(url, r"^([a-zA-Z][a-zA-Z0-9+.-]*)://", 1))
    host = url_host(url)
    # An IPv6 authority is bracketed in URL syntax (RFC 3986): re-bracket
    # the parsed host and take the port from AFTER the closing bracket —
    # the bare [^/:?#]+ port regex stops at the first ':' inside the
    # address and would both drop the port (collapsing [::1]:8080 and
    # [::1]:9090 to one canonical key) and emit an unparseable host.
    is_v6 = F.regexp_extract(url, _HOST6_RE, 1) != ""
    host = F.when(is_v6, F.concat(F.lit("["), host, F.lit("]"))).otherwise(host)
    port = F.when(
        is_v6,
        F.regexp_extract(
            url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?\[[^\]]+\]:(\d+)", 1
        ),
    ).otherwise(
        F.regexp_extract(
            url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/@]*@)?[^/:?#]+:(\d+)", 1
        )
    )
    keep_port = ~(
        (port == "")
        | ((scheme == "http") & (port == "80"))
        | ((scheme == "https") & (port == "443"))
    )
    # path = everything from the first '/' after authority, up to ? or #
    rest = F.regexp_extract(url, r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)", 1)
    path = F.when(rest == "", F.lit("/")).otherwise(rest)
    query = F.regexp_extract(url, r"\?([^#]*)", 1)
    strip_set = F.array(*[F.lit(s) for s in strip_params])
    params = F.filter(
        F.split(query, "&"),
        lambda p: (p != "")
        & ~F.array_contains(strip_set, F.lower(F.split(p, "=").getItem(0))),
    )
    qs = F.array_join(F.array_sort(params), "&")
    return F.when(
        host.isNotNull(),
        F.concat(
            scheme,
            F.lit("://"),
            host,
            F.when(keep_port, F.concat(F.lit(":"), port)).otherwise(F.lit("")),
            path,
            F.when(qs != "", F.concat(F.lit("?"), qs)).otherwise(F.lit("")),
        ),
    )


# ---------------------------------------------------------------------------
# HTML → text extraction (the WET step)
# ---------------------------------------------------------------------------

# Decoded in order; &amp; is LAST so double-escaped input ("&amp;lt;")
# correctly yields the literal entity text ("&lt;"), not "<".
_NAMED_ENTITIES = (
    ("&nbsp;", " "),
    ("&lt;", "<"),
    ("&gt;", ">"),
    ("&quot;", '"'),
    ("&#39;", "'"),
    ("&apos;", "'"),
    ("&amp;", "&"),
)

# Elements whose closing tag ends a visual block: their boundary becomes
# a newline so C4-style line filters (`operators.corpus.c4_line_filter`)
# see the same line structure a browser renders.
_BLOCK_CLOSERS = (
    "p|div|h[1-6]|li|ul|ol|dl|dd|dt|tr|table|blockquote|pre|"
    "section|article|header|footer|nav|aside|figure|figcaption|"
    "title|option|form|fieldset|address"
)


def html_to_text(html: Column) -> Column:
    """Visible text of an HTML document — the WARC→WET conversion step,
    C4/CCNet-style, as ONE native regexp-replace chain (zero UDFs, so a
    100k-file crawl read fuses extraction into the scan stage).

    Rules (what Common Crawl's WET extractor and the C4 preprocessor
    encode; reference for the pipeline position only — the reference
    repo ingests curated rasters and has no HTML stage):

    - ``<script>``/``<style>``/``<noscript>``/``<template>`` blocks and
      HTML comments vanish WITH their content (code/CSS must never leak
      into training text);
    - ``<br>``/``<hr>`` and closing block-level tags become newlines;
      every other tag (incl. doctype/PIs) becomes ONE space (later
      collapsed) — inline markup must not glue words together, so
      "a</b>b" is "a b"; the cost is a spurious space where markup
      splits a word ("don<b>'t</b>" → "don 't"), the trade C4's
      extractor also makes;
    - the common named/apostrophe entities decode (``&amp;`` last, so
      double-escaped text stays literal); exotic numeric entities are
      left as-is for the quality tier to score, decoding them needs a
      codepoint table no regexp computes;
    - whitespace canonicalizes: runs of spaces/tabs/CRs collapse to one
      space, spaces around newlines drop, 3+ newlines collapse to the
      paragraph separator ``\\n\\n``, ends trimmed.

    NULL html → NULL (a fetch failure stays a failure, it does not
    become an empty document that passes min-length filters).
    """
    t = F.regexp_replace(
        html,
        r"(?is)<(script|style|noscript|template)\b[^>]*>.*?</\1\s*>",
        " ",
    )
    t = F.regexp_replace(t, r"(?s)<!--.*?-->", " ")
    t = F.regexp_replace(t, r"(?i)<(?:br|hr)\s*/?\s*>", "\n")
    t = F.regexp_replace(t, r"(?is)</(?:" + _BLOCK_CLOSERS + r")\s*>", "\n")
    t = F.regexp_replace(t, r"(?s)<[^>]*>", " ")
    for ent, repl in _NAMED_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(repl))
    t = F.regexp_replace(t, r"[ \t\f\r\x0b]+", " ")
    t = F.regexp_replace(t, r" ?\n ?", "\n")
    t = F.regexp_replace(t, r"\n{3,}", "\n\n")
    return F.regexp_replace(t, r"^\s+|\s+$", "")


def extract_title(html: Column) -> Column:
    """``<title>`` text (entity-decoded, whitespace-collapsed, trimmed);
    NULL when absent or empty — titles key URL-level dedup families and
    feed the document metadata columns."""
    t = F.regexp_extract(html, r"(?is)<title[^>]*>(.*?)</title\s*>", 1)
    for ent, repl in _NAMED_ENTITIES:
        t = F.replace(t, F.lit(ent), F.lit(repl))
    t = F.regexp_replace(t, r"\s+", " ")
    t = F.regexp_replace(t, r"^ | $", "")
    return F.when(t != "", t)


def extract_links(html: Column) -> Column:
    """``href`` targets of anchor tags, document order (array<string>;
    empty array when none) — the crawl-frontier edge list. Quoted
    attribute forms only (unquoted hrefs are vanishingly rare in real
    crawls and ambiguous to delimit)."""
    hrefs = F.regexp_extract_all(
        html, F.lit(r'(?is)<a\b[^>]*\bhref\s*=\s*["\x27]([^"\x27]*)["\x27]'), 1
    )
    return F.when(html.isNotNull(), F.coalesce(hrefs, F.array()))
