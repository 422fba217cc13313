"""robots.txt parsing and URL allow/deny filtering (RFC 9309).

Crawl compliance is a first-class stage of any web-corpus pipeline: before
fetching — or before *keeping* — a page, the crawler must honor the host's
robots.txt. This module turns a (host, robots-body) table into a rules
table and filters a URL table against it with the RFC's longest-match
semantics, entirely in JVM expressions.

Semantics implemented (RFC 9309, with the documented simplifications):

- lines are split on ``\\r?\\n``; ``#`` comments stripped; directives are
  matched case-insensitively; unknown directives ignored;
- consecutive ``User-agent`` lines open ONE group sharing the rules that
  follow (a UA line whose predecessor directive is not UA starts a new
  group — the RFC's group-merging rule);
- product-token matching is exact-or-``*`` (lowercased), not the RFC's
  prefix match — crawler names in the wild are matched verbatim;
- if ANY group names the crawler specifically, only those groups apply;
  otherwise the ``*`` groups apply (RFC: most specific user-agent wins);
- rule paths support ``*`` wildcards and the ``$`` end anchor; the
  longest path spec wins; at equal length ``Allow`` wins (the RFC tie
  rule); an empty-value ``Disallow:`` matches nothing and is dropped;
- no applicable rule — or no robots.txt row for the host — means ALLOW.

Scale shape: parsing explodes each robots BODY once (the robots table is
per-host — orders of magnitude smaller than the corpus) and uses two
windows partitioned by host (group-start lag, group-id running sum);
the filter is one equi-join on host (rules per host are bounded by the
file, so join output is O(urls · rules/host), never quadratic in hosts)
followed by one groupBy(url-id) whose max(struct(len, allow, spec))
picks the winner without a window sort. Matching stays JVM: pure-prefix
rules use startswith; wildcard/anchored rules use a per-row compiled
regex translated from the spec (escape metachars, ``*`` → ``.*``,
trailing ``$`` → anchor).

Reference framing: sourcemeta/jsonschema has no crawl surface; this
extends the webtext curation suite (SURVEY.md §2.10) alongside
urltools/linkgraph.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from jsonschema_spark.operators.urltools import url_parts

_DIRECTIVE_RE = r"^([A-Za-z-]+)\s*:"
_VALUE_RE = r"^[A-Za-z-]+\s*:\s*(\S*)"


def spec_to_regex(spec: Column) -> Column:
    """Translate a robots path spec to a Java-regex string: escape regex
    metachars (backslash FIRST), ``*`` → ``.*``, trailing ``$`` → a real
    end anchor, and anchor the whole spec at the start."""
    ends = spec.endswith("$")
    core = F.when(ends, spec.substr(F.lit(1), F.length(spec) - 1)).otherwise(spec)
    esc = F.regexp_replace(core, r"([\\.\[\]\{\}\(\)\+\?\^\$\|])", r"\\$1")
    wild = F.regexp_replace(esc, r"\*", ".*")
    return F.concat(F.lit("^"), wild, F.when(ends, F.lit("$")).otherwise(F.lit("")))


def robots_rules_df(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """Parse robots bodies into the rules applicable to ``agent``.

    Output: (host, allow boolean, spec, spec_len, spec_re) — one row per
    applicable Allow/Disallow rule with a non-empty path spec.
    """
    a = agent.strip().lower()
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), r"\r?\n")).alias("li", "_raw"),
    ).select(
        "host", "li",
        F.trim(F.regexp_replace("_raw", r"#.*$", "")).alias("_line"),
    )
    d = lines.select(
        "host", "li",
        F.lower(F.regexp_extract("_line", _DIRECTIVE_RE, 1)).alias("dir"),
        F.regexp_extract("_line", _VALUE_RE, 1).alias("val"),
    ).where(F.col("dir") != "")
    # keep EVERY directive line through boundary detection: any non-UA
    # directive (Crawl-delay, Sitemap, …) ends a user-agent cluster per
    # RFC 9309 §2.1 — filtering to ua/allow/disallow first would merge
    # two clusters separated only by such a line
    w = Window.partitionBy("host").orderBy("li")
    grouped = d.withColumn(
        "_start",
        (
            (F.col("dir") == "user-agent")
            & (F.coalesce(F.lag("dir").over(w), F.lit("")) != "user-agent")
        ).cast("int"),
    ).withColumn(
        "gid",
        F.sum("_start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    )
    # drop anything before the first User-agent line (rule lines outside a
    # group are invalid per the RFC)
    grouped = grouped.where(F.col("gid") >= 1)
    agents = grouped.where(F.col("dir") == "user-agent").groupBy("host", "gid").agg(
        F.max(F.when(F.lower("val") == a, 1).otherwise(0)).alias("_named"),
        F.max(F.when(F.col("val") == "*", 1).otherwise(0)).alias("_star"),
    )
    host_named = agents.groupBy("host").agg(F.max("_named").alias("_has_named"))
    applicable = (
        agents.join(host_named, "host")
        .where(
            ((F.col("_has_named") == 1) & (F.col("_named") == 1))
            | ((F.col("_has_named") == 0) & (F.col("_star") == 1))
        )
        .select("host", "gid")
    )
    rules = (
        grouped.where(F.col("dir").isin("allow", "disallow") & (F.col("val") != ""))
        .join(applicable, ["host", "gid"])
        .select(
            "host",
            (F.col("dir") == "allow").alias("allow"),
            F.col("val").alias("spec"),
            F.length("val").cast("long").alias("spec_len"),
            spec_to_regex(F.col("val")).alias("spec_re"),
        )
    )
    return rules


def robots_filter(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
    id_col: str = "doc_id",
    default_allow: bool = True,
) -> DataFrame:
    """Filter a URL table against a parsed rules table (robots_rules_df).

    Output: (id_col, url_col, allowed, rule_spec, rule_len) — the winning
    rule per URL under longest-match / allow-wins-ties, or nulls + the
    default verdict when no rule matches. The match target is
    path + '?query' (RFC 9309 §2.2.2); an empty path matches as '/'.
    """
    parts = url_parts(F.col(url_col))
    target = F.concat(
        F.when(parts["path"] == "", F.lit("/")).otherwise(parts["path"]),
        F.when(parts["query"] != "", F.concat(F.lit("?"), parts["query"])).otherwise(
            F.lit("")
        ),
    )
    u = urls.select(
        F.col(id_col), F.col(url_col),
        F.lower(parts["host"]).alias("host"), target.alias("_t"),
    )
    pure_prefix = ~F.col("spec").contains("*") & ~F.col("spec").contains("$")
    m = (
        u.join(rules, "host")
        .where(
            F.when(pure_prefix, F.col("_t").startswith(F.col("spec")))
            .otherwise(F.expr("_t rlike spec_re"))
        )
        .groupBy(id_col)
        .agg(
            F.max(
                F.struct(
                    F.col("spec_len"),
                    F.col("allow").cast("int").alias("a"),
                    F.col("spec"),
                )
            ).alias("_win")
        )
        .select(
            id_col,
            (F.col("_win.a") == 1).alias("_allowed"),
            F.col("_win.spec").alias("rule_spec"),
            F.col("_win.spec_len").alias("rule_len"),
        )
    )
    return (
        u.select(id_col, url_col)
        .join(m, id_col, "left")
        .select(
            id_col,
            url_col,
            F.coalesce("_allowed", F.lit(bool(default_allow))).alias("allowed"),
            "rule_spec",
            "rule_len",
        )
    )


def robots_crawl_delay(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
    agent: str = "*",
) -> DataFrame:
    """Per-host Crawl-delay (de-facto directive, group-scoped like
    Allow/Disallow) for ``agent`` → (host, crawl_delay_ms).

    Group selection matches ``robots_rules_df`` exactly: an
    agent-specific group silences the ``*`` group for that host — so a
    named group WITHOUT a Crawl-delay line means NO delay for that agent
    even when the ``*`` group has one (the host is absent from the
    output; callers supply their own default). Seconds parse through
    try_cast(double) — malformed values are dropped, never a task-kill —
    and floor(s·1000) gives integer milliseconds; multiple applicable
    lines take the max (the conservative crawler reading).

    One posexplode per body + two window passes over directive lines —
    robots tables are host-sized, never corpus-sized."""
    a = agent.strip().lower()
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.posexplode(F.split(F.col(body_col), r"\r?\n")).alias("li", "_raw"),
    ).select(
        "host", "li",
        F.trim(F.regexp_replace("_raw", r"#.*$", "")).alias("_line"),
    )
    d = lines.select(
        "host", "li",
        F.lower(F.regexp_extract("_line", _DIRECTIVE_RE, 1)).alias("dir"),
        F.regexp_extract("_line", _VALUE_RE, 1).alias("val"),
    ).where(F.col("dir") != "")
    # boundary detection must see EVERY directive line: any non-UA
    # directive ends a user-agent cluster (filtering to ua+crawl-delay
    # first would merge clusters separated only by Allow/Disallow lines)
    w = Window.partitionBy("host").orderBy("li")
    grouped = d.withColumn(
        "_start",
        (
            (F.col("dir") == "user-agent")
            & (F.coalesce(F.lag("dir").over(w), F.lit("")) != "user-agent")
        ).cast("int"),
    ).withColumn(
        "gid",
        F.sum("_start").over(w.rowsBetween(Window.unboundedPreceding, 0)),
    ).where(F.col("gid") >= 1)
    agents = grouped.where(F.col("dir") == "user-agent").groupBy("host", "gid").agg(
        F.max(F.when(F.lower("val") == a, 1).otherwise(0)).alias("_named"),
        F.max(F.when(F.col("val") == "*", 1).otherwise(0)).alias("_star"),
    )
    host_named = agents.groupBy("host").agg(F.max("_named").alias("_has_named"))
    applicable = (
        agents.join(host_named, "host")
        .where(
            ((F.col("_has_named") == 1) & (F.col("_named") == 1))
            | ((F.col("_has_named") == 0) & (F.col("_star") == 1))
        )
        .select("host", "gid")
    )
    return (
        grouped.where((F.col("dir") == "crawl-delay") & (F.col("val") != ""))
        .join(applicable, ["host", "gid"])
        .select(
            "host",
            F.floor(F.col("val").try_cast("double") * 1000)
            .cast("long").alias("_ms"),
        )
        .where(F.col("_ms").isNotNull() & (F.col("_ms") >= 0))
        .groupBy("host")
        .agg(F.max("_ms").alias("crawl_delay_ms"))
    )


def frontier_schedule(
    urls: DataFrame,
    delays: DataFrame,
    url_col: str = "url",
    default_delay_ms: int = 1000,
) -> DataFrame:
    """Delay-aware politeness schedule: per-host fetch sequence × the
    host's Crawl-delay → the earliest permitted fetch offset for every
    url. (url, host, seq_in_host, delay_ms, not_before_ms) with
    not_before_ms = (seq_in_host − 1) · delay_ms.

    The window partitions BY HOST — per-host frontier slices, never a
    global sort (hosts are the natural parallelism unit of a polite
    crawler; pair with ``frontier_interleave`` when a single totally-
    ordered fetch sequence is required). Deterministic: within a host,
    urls fetch in lexicographic order."""
    parts = url_parts(F.col(url_col))
    u = urls.select(F.col(url_col), F.lower(parts["host"]).alias("host"))
    seq = F.row_number().over(
        Window.partitionBy("host").orderBy(url_col))
    j = u.join(F.broadcast(delays), "host", "left").select(
        url_col, "host", seq.alias("seq_in_host"),
        F.coalesce(F.col("crawl_delay_ms"), F.lit(default_delay_ms))
        .cast("long").alias("delay_ms"),
    )
    return j.withColumn(
        "not_before_ms",
        ((F.col("seq_in_host") - 1) * F.col("delay_ms")).cast("long"),
    )


def robots_sitemaps(
    robots: DataFrame,
    host_col: str = "host",
    body_col: str = "robots_txt",
) -> DataFrame:
    """Sitemap discovery from robots.txt → (host, sitemap_url), distinct.

    Sitemap is HOST-WIDE, not group-scoped (RFC 9309 treats it as an
    'other record'; sitemaps.org defines it) — so no group machinery:
    one posexplode + a case-insensitive directive match, keeping the
    value verbatim (absolute URL per the spec; relative values are kept
    as-is for the caller to resolve). Feeds ``sitemap.sitemap_entries``
    with the fetch list a compliant crawler starts from."""
    lines = robots.select(
        F.col(host_col).alias("host"),
        F.explode(F.split(F.col(body_col), r"\r?\n")).alias("_raw"),
    ).select(
        "host",
        F.trim(F.regexp_replace("_raw", r"#.*$", "")).alias("_line"),
    )
    return (
        lines.where(
            F.lower(F.regexp_extract("_line", _DIRECTIVE_RE, 1)) == "sitemap")
        .select(
            "host",
            F.trim(F.regexp_extract("_line", r"^[A-Za-z-]+\s*:\s*(.*)$", 1))
            .alias("sitemap_url"),
        )
        .where(F.col("sitemap_url") != "")
        .distinct()
    )
