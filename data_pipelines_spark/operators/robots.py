"""robots.txt parsing and URL permission — crawl politeness (RFC 9309).

A crawl pipeline's fetch frontier must be filtered against each host's
robots.txt BEFORE fetching (and a curation pipeline re-checks when a
corpus's provenance policy requires it — e.g. respecting retroactive
opt-outs). Both are relational problems at scale: ~millions of small
rule files on one side, billions of URLs on the other. Everything here
is native expressions — the parse is a per-host line window (a robots
file is ~100 lines, so the window partition is tiny by construction),
the permission check is a broadcast join + longest-match argmax.

Semantics implemented (RFC 9309 + the Googlebot conventions that
de-facto define the format):

- Groups: one or more consecutive ``User-agent:`` lines followed by
  ``Allow:`` / ``Disallow:`` rules; a rule belongs to every agent of
  its group. Comments (``#``) and unknown directives are ignored;
  blank lines do NOT end a group (RFC 9309 §2.1).
- Agent selection: the group whose agent token (case-insensitive)
  matches the crawler name wins; ``*`` is the fallback; if several
  groups name the same agent their rules merge.
- Path matching: ``*`` matches any char sequence, ``$`` anchors the
  end; otherwise a rule matches as a prefix. Longest pattern wins;
  on a tie ``Allow`` wins. An empty ``Disallow:`` means allow-all.
  No matching rule → allowed (and a host with no robots rows at all
  → allowed: absence of robots.txt is permission, RFC 9309 §2.3.1.4).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

ROBOTS_RULES_SCHEMA = (
    "host string, agent string, allow boolean, pattern string, "
    "pattern_len int, regex string"
)


def _robots_groups(
    robots: DataFrame, host_col: str, content_col: str,
    keys: tuple[str, ...],
) -> DataFrame:
    """Shared line → (host, line_no, key, value, grp) parse: posexplode
    lines, strip comments, keep the requested directives, assign group
    ids (a group starts at each User-agent line not preceded by one —
    windows partitioned by HOST, so the partition is one ~100-line
    file). Two window passes because windows cannot nest: the lag lands
    first, the running sum reads the materialized flag."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(content_col), r"\r?\n")).alias(
            "line_no", "raw"
        ),
    ).select(
        "host",
        "line_no",
        F.trim(F.regexp_replace("raw", r"#.*$", "")).alias("line"),
    ).where(F.col("line") != "")

    kv = lines.select(
        "host",
        "line_no",
        F.lower(F.trim(F.regexp_extract("line", r"^([^:]+):", 1))).alias(
            "key"
        ),
        F.trim(F.regexp_extract("line", r"^[^:]+:(.*)$", 1)).alias("value"),
    ).where(F.col("key").isin("user-agent", *keys))

    w = Window.partitionBy("host").orderBy("line_no")
    is_agent = (F.col("key") == "user-agent").cast("int")
    flagged = kv.select(
        "host", "line_no", "key", "value",
        (is_agent
         * (1 - F.coalesce(F.lag(is_agent).over(w), F.lit(0)))
         ).alias("__starts"),
    )
    return flagged.select(
        "host", "line_no", "key", "value",
        F.sum("__starts").over(
            w.rowsBetween(Window.unboundedPreceding, 0)
        ).alias("grp"),
    )


def robots_sitemaps(robots: DataFrame, host_col: str = "host",
                    content_col: str = "content") -> DataFrame:
    """``Sitemap:`` directives → ``(host, sitemap)`` — host-wide per
    RFC 9309 §2.2.4 (they live outside any group), so no group logic:
    the discovery hand-off into `sources.sitemap.read_sitemaps`."""
    return _robots_groups(
        robots, host_col, content_col, ("sitemap",)
    ).where(
        (F.col("key") == "sitemap") & (F.col("value") != "")
    ).select("host", F.col("value").alias("sitemap")).distinct()


def crawl_delays(
    robots: DataFrame,
    agent: str = "*",
    host_col: str = "host",
    content_col: str = "content",
) -> DataFrame:
    """``Crawl-delay:`` per host for one crawler identity →
    ``(host, crawl_delay double)``. Group-scoped like Allow/Disallow
    (the de-facto Bing/Yandex extension): the specific-agent group
    wins over ``*``; several delays in the winning scope keep the most
    conservative (max); unparseable values are NULL and drop."""
    a = agent.lower()
    marked = _robots_groups(
        robots, host_col, content_col, ("crawl-delay",)
    )
    agents = marked.where(F.col("key") == "user-agent").select(
        "host", "grp", F.lower(F.col("value")).alias("agent")
    ).distinct()
    delays = marked.where(
        (F.col("key") == "crawl-delay") & (F.col("grp") > 0)
    ).select(
        "host", "grp",
        F.expr("try_cast(value AS DOUBLE)").alias("delay"),
    ).where(F.col("delay").isNotNull())
    scoped = agents.join(delays, ["host", "grp"]).where(
        F.col("agent").isin(a, "*")
    )
    specific = scoped.where(F.col("agent") == a).select(
        "host", F.lit(True).alias("__has_specific")
    ).distinct()
    chosen = scoped.join(specific, "host", "left").where(
        (F.col("agent") == a) | F.col("__has_specific").isNull()
    )
    return chosen.groupBy("host").agg(
        F.max("delay").alias("crawl_delay")
    )


def parse_robots(robots: DataFrame, host_col: str = "host",
                 content_col: str = "content") -> DataFrame:
    """(host, content) robots.txt bodies → one rule row per
    (host, agent, directive): ``(host, agent, allow, pattern,
    pattern_len, regex)``. ``regex`` is the path pattern compiled to an
    anchored Java/RE2-safe regex (``*`` → ``.*``, ``$`` → end anchor,
    everything else literal-escaped) so the permission check stays a
    native ``RLIKE``.

    Relational parse: posexplode lines → classify → group ids via two
    running-count windows partitioned BY HOST (a robots file is ~100
    lines; the window never sees more than one file). Agents of a group
    cross-join its rules through an equi-join on (host, group).
    """
    marked = _robots_groups(
        robots, host_col, content_col, ("user-agent", "allow", "disallow")
    )
    agents = marked.where(F.col("key") == "user-agent").select(
        "host", "grp", F.lower(F.col("value")).alias("agent")
    ).distinct()
    dirs = marked.where(
        F.col("key").isin("allow", "disallow") & (F.col("grp") > 0)
    ).select(
        "host",
        "grp",
        (F.col("key") == "allow").alias("allow"),
        F.col("value").alias("pattern"),
    ).where(
        # empty Disallow: = allow everything = no rule (RFC 9309);
        # empty Allow: is meaningless and likewise dropped
        F.col("pattern") != ""
    )

    # pattern → anchored regex: escape metachars (including $ — only a
    # TRAILING $ is the end anchor per RFC 9309, a mid-pattern one is
    # literal), then * → .*, then un-escape the trailing anchor
    esc = F.regexp_replace(
        F.col("pattern"), r"([.^+?(){}\[\]|\\$])", r"\\$1"
    )
    esc = F.regexp_replace(esc, r"\*", ".*")
    regex = F.concat(
        F.lit("^"),
        F.when(
            F.col("pattern").endswith("$"),
            # replace the escaped trailing \$ with the real anchor
            F.regexp_replace(esc, r"\\\$$", r"\$"),
        ).otherwise(F.concat(esc, F.lit(".*"))),
    )

    return agents.join(dirs, ["host", "grp"]).select(
        "host",
        "agent",
        "allow",
        "pattern",
        F.length("pattern").cast("int").alias("pattern_len"),
        regex.alias("regex"),
    )


def filter_by_robots(
    urls: DataFrame,
    rules: DataFrame,
    agent: str = "*",
    url_col: str = "url",
    keep: str = "allowed",
) -> DataFrame:
    """Filter a URL frontier by parsed robots rules for one crawler
    identity. ``keep='allowed'`` (the fetch frontier), ``'disallowed'``
    (audit), or ``'all'`` (append an ``allowed`` boolean instead of
    filtering).

    Group selection per RFC 9309: rules whose agent equals ``agent``
    (case-insensitive) if any exist FOR THAT HOST, else the host's
    ``*`` group. Longest pattern wins; Allow wins ties; no match or no
    rules for the host → allowed.

    Plan shape: rules are dimension-sized (one file per host, ~dozens
    of rows each) → broadcast; URL side stays narrow (host + path
    extracted in the scan stage); the match is a broadcast join +
    RLIKE + one grouped argmax keyed by the URL row. No windows over
    URL-sized partitions, no UDFs.
    """
    from data_pipelines_spark.functions.web import url_host

    if keep not in ("allowed", "disallowed", "all"):
        raise ValueError("keep must be allowed|disallowed|all")
    a = agent.lower()

    # per host: does a specific group for this agent exist?
    specific = rules.where(F.col("agent") == a).select(
        "host", F.lit(True).alias("__has_specific")
    ).distinct()
    eligible = (
        rules.where(F.col("agent").isin(a, "*"))
        .join(specific, "host", "left")
        .where(
            (F.col("agent") == a)
            | F.col("__has_specific").isNull()  # fall back to '*'
        )
        .select("host", "allow", "pattern_len", "regex")
    )

    keyed = urls.withColumn("__rid", F.monotonically_increasing_id())
    probe = keyed.select(
        "__rid",
        url_host(F.col(url_col)).alias("__host"),
        F.coalesce(
            F.nullif(
                F.regexp_extract(
                    F.col(url_col),
                    r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^#]*)",
                    1,
                ),
                F.lit(""),
            ),
            F.lit("/"),
        ).alias("__path"),
    )

    hits = probe.join(
        F.broadcast(eligible),
        (probe["__host"] == eligible["host"])
        & F.expr("__path RLIKE regex"),
    )
    verdict = hits.groupBy("__rid").agg(
        F.max(
            F.struct(
                F.col("pattern_len").alias("l"),
                F.col("allow").alias("a"),
            )
        ).alias("__best")
    ).select("__rid", F.col("__best.a").alias("__allow"))

    out = keyed.join(verdict, "__rid", "left").withColumn(
        "allowed", F.coalesce(F.col("__allow"), F.lit(True))
    ).drop("__allow")
    if keep == "all":
        return out.drop("__rid")
    if keep == "allowed":
        return out.where(F.col("allowed")).drop("allowed", "__rid")
    return out.where(~F.col("allowed")).drop("allowed", "__rid")
