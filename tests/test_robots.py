"""robots.txt parsing + URL filtering (operators/robots.py, RFC 9309)."""
from pyspark.sql import functions as F

from jsonschema_spark.operators.robots import (
    robots_filter,
    robots_rules_df,
    spec_to_regex,
)


def _rules(spark, body, agent="*", host="a.org"):
    df = spark.createDataFrame([(host, body)], ["host", "robots_txt"])
    return {
        (r["spec"], r["allow"]): r
        for r in robots_rules_df(df, agent=agent).collect()
    }


def _verdicts(spark, body, urls, agent="*"):
    robots = spark.createDataFrame([("a.org", body)], ["host", "robots_txt"])
    u = spark.createDataFrame(list(enumerate(urls)), ["doc_id", "url"])
    out = robots_filter(u, robots_rules_df(robots, agent=agent))
    return {r["url"]: r["allowed"] for r in out.collect()}


def test_group_merging_and_comments(spark):
    """Consecutive UA lines share one group; comments and unknown
    directives are ignored; CRLF accepted; directives case-insensitive."""
    body = (
        "# header comment\r\n"
        "User-agent: alpha\r\n"
        "USER-AGENT: beta  # stacked\r\n"
        "DISALLOW: /x\r\n"
        "Crawl-delay: 9\r\n"
        "\r\n"
        "User-agent: gamma\r\n"
        "Disallow: /y\r\n"
    )
    assert set(_rules(spark, body, agent="beta")) == {("/x", False)}
    assert set(_rules(spark, body, agent="alpha")) == {("/x", False)}
    assert set(_rules(spark, body, agent="gamma")) == {("/y", False)}


def test_specific_agent_beats_star_and_rules_before_ua_dropped(spark):
    body = (
        "Disallow: /orphan\n"  # before any UA group: invalid, dropped
        "User-agent: *\nDisallow: /a\n"
        "User-agent: mybot\nDisallow: /b\n"
    )
    assert set(_rules(spark, body, agent="mybot")) == {("/b", False)}
    assert set(_rules(spark, body, agent="other")) == {("/a", False)}


def test_longest_match_tie_and_anchors(spark):
    body = (
        "User-agent: *\n"
        "Disallow: /dir\n"
        "Allow: /dir/pub\n"
        "Disallow: /a*z$\n"
        "Allow: /same\nDisallow: /same\n"  # equal length -> Allow wins
        "Disallow:\n"  # empty value: matches nothing
    )
    v = _verdicts(
        spark, body,
        [
            "https://a.org/dir/secret",   # /dir (len 4) only -> deny
            "https://a.org/dir/pub/f",    # /dir/pub (len 8) beats /dir -> allow
            "https://a.org/aMIDz",        # wildcard + $ anchor -> deny
            "https://a.org/aMIDz2",       # $ anchor fails -> allow
            "https://a.org/same",         # tie -> allow
            "https://a.org/other",        # no rule -> default allow
            "https://a.org",              # empty path matches as '/'
        ],
    )
    assert v == {
        "https://a.org/dir/secret": False,
        "https://a.org/dir/pub/f": True,
        "https://a.org/aMIDz": False,
        "https://a.org/aMIDz2": True,
        "https://a.org/same": True,
        "https://a.org/other": True,
        "https://a.org": True,
    }


def test_query_string_in_match_target_and_unknown_host(spark):
    body = "User-agent: *\nAllow: /p$\nDisallow: /p\n"
    robots = spark.createDataFrame([("a.org", body)], ["host", "robots_txt"])
    u = spark.createDataFrame(
        [(1, "https://a.org/p"), (2, "https://a.org/p?x=1"),
         (3, "https://nowhere.org/p")],
        ["doc_id", "url"],
    )
    out = {
        r["doc_id"]: r["allowed"]
        for r in robots_filter(u, robots_rules_df(robots)).collect()
    }
    # the $ anchor sees path+query: '?x=1' defeats the Allow
    assert out == {1: True, 2: False, 3: True}


def test_spec_to_regex_escapes_metachars(spark):
    df = spark.createDataFrame(
        [("/a.b(c)+?[x]|{2}\\d",), ("/w*e$",)], ["s"]
    ).select(spec_to_regex(F.col("s")).alias("re"))
    got = [r["re"] for r in df.collect()]
    assert got[0] == r"^/a\.b\(c\)\+\?\[x\]\|\{2\}\\d"
    assert got[1] == "^/w.*e$"
    # the escaped pattern matches only the literal text
    chk = spark.createDataFrame(
        [("/a.b(c)+?[x]|{2}\\d", True), ("/aXb(c)+?[x]|{2}\\d", False)],
        ["t", "want"],
    ).select(F.regexp_like(F.col("t"), F.lit(got[0])).alias("m"), "want").collect()
    assert all(r["m"] == r["want"] for r in chk)


def test_sitemap_entries_fields_and_edge_cases(spark):
    """Case-insensitive tags, entity decode, whitespace trim, bogus
    priority -> NULL (not a task-killing ANSI error), loc-less entries
    dropped, sitemapindex children tagged kind='sitemap', NULL xml
    yields no rows."""
    from jsonschema_spark.operators.sitemap import sitemap_entries

    xml = (
        "<urlset>"
        "<url><loc> https://a.org/p?x=1&amp;y=2 </loc>"
        "<lastmod>2024-01-05</lastmod><priority>0.8</priority></url>"
        "<URL><LOC>https://a.org/q</LOC></URL>"
        "<url><priority>bogus</priority><loc>https://a.org/r</loc></url>"
        "<url><lastmod>2024-01-01</lastmod></url>"
        "</urlset>"
    )
    idx = ("<sitemapindex><sitemap><loc>https://b.org/sm2.xml</loc>"
           "<lastmod>2024-02-01</lastmod></sitemap></sitemapindex>")
    df = spark.createDataFrame(
        [("a.org", xml), ("b.org", idx), ("c.org", None)],
        ["host", "sitemap_xml"],
    )
    rows = [
        (r["host"], r["kind"], r["loc"], r["lastmod"], r["priority_milli"])
        for r in sitemap_entries(df).orderBy("host", "loc").collect()
    ]
    assert rows == [
        ("a.org", "url", "https://a.org/p?x=1&y=2", "2024-01-05", 800),
        ("a.org", "url", "https://a.org/q", None, None),
        ("a.org", "url", "https://a.org/r", None, None),
        ("b.org", "sitemap", "https://b.org/sm2.xml", "2024-02-01", None),
    ]


def test_sitemap_plan_is_single_explode_no_python(spark):
    from jsonschema_spark.operators.sitemap import sitemap_entries

    df = spark.createDataFrame([("a.org", "<url><loc>u</loc></url>")],
                               ["host", "sitemap_xml"])
    plan = sitemap_entries(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan
    assert plan.count("Generate") == 1


def test_crawl_delay_groups_and_schedule(spark):
    """robots_crawl_delay: group-scoped like Allow/Disallow (named group
    without a delay silences the * group's delay); malformed values
    dropped; fractional seconds floor to ms; a non-UA directive ENDS a
    user-agent cluster (RFC 9309 §2.1 — regression for the cluster-merge
    bug); frontier_schedule spaces fetches per host by the delay."""
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.robots import (
        frontier_schedule, robots_crawl_delay, robots_rules_df)

    bodies = [
        # h1: * delay 5; named 'bot' group WITHOUT delay
        ("h1", "User-agent: *\nDisallow: /a\nCrawl-delay: 5\n"
               "User-agent: bot\nDisallow: /b\n"),
        # h2: only * group, fractional delay
        ("h2", "User-agent: *\nCrawl-delay: 1.5\nDisallow: /x\n"),
        # h3: malformed delay
        ("h3", "User-agent: *\nCrawl-delay: soon\n"),
        # h4: crawl-delay SEPARATES two ua clusters: 'a' gets the delay,
        # 'b' is a fresh cluster with only the Disallow
        ("h4", "User-agent: a\nCrawl-delay: 2\nUser-agent: b\nDisallow: /x\n"),
    ]
    robots = spark.createDataFrame(bodies, "host string, robots_txt string")
    star = {r["host"]: r["crawl_delay_ms"]
            for r in robots_crawl_delay(robots, agent="*").collect()}
    assert star == {"h1": 5000, "h2": 1500}
    bot = {r["host"]: r["crawl_delay_ms"]
           for r in robots_crawl_delay(robots, agent="bot").collect()}
    assert "h1" not in bot  # named group has no delay → no inherited 5s
    a = {r["host"]: r["crawl_delay_ms"]
         for r in robots_crawl_delay(robots, agent="a").collect()}
    assert a.get("h4") == 2000
    b = {r["host"]: r["crawl_delay_ms"]
         for r in robots_crawl_delay(robots, agent="b").collect()}
    assert "h4" not in b
    # cluster separation also holds for rules: 'a' has NO rules on h4
    ra = robots_rules_df(robots, agent="a").where(F.col("host") == "h4")
    assert ra.count() == 0
    rb = robots_rules_df(robots, agent="b").where(F.col("host") == "h4")
    assert [r["spec"] for r in rb.collect()] == ["/x"]
    # schedule: per-host sequence × delay
    urls = spark.createDataFrame(
        [("https://h1/p1",), ("https://h1/p2",), ("https://h1/p3",),
         ("https://h9/q",)], "url string")
    delays = robots_crawl_delay(robots, agent="*")
    sched = {r["url"]: (r["seq_in_host"], r["delay_ms"], r["not_before_ms"])
             for r in frontier_schedule(urls, delays).collect()}
    assert sched["https://h1/p1"] == (1, 5000, 0)
    assert sched["https://h1/p2"] == (2, 5000, 5000)
    assert sched["https://h1/p3"] == (3, 5000, 10000)
    assert sched["https://h9/q"] == (1, 1000, 0)  # default


def test_robots_sitemaps(spark):
    """Sitemap is host-wide (outside any group, case-insensitive,
    full-line value), deduplicated; hosts without one are absent."""
    from jsonschema_spark.operators.robots import robots_sitemaps

    robots = spark.createDataFrame([
        ("h1", "Sitemap: https://h1/sm.xml\nUser-agent: *\nDisallow: /a\n"
               "sitemap: https://h1/sm2.xml\nSitemap: https://h1/sm.xml\n"),
        ("h2", "User-agent: *\nDisallow: /\n"),
    ], "host string, robots_txt string")
    got = sorted((r["host"], r["sitemap_url"])
                 for r in robots_sitemaps(robots).collect())
    assert got == [("h1", "https://h1/sm.xml"), ("h1", "https://h1/sm2.xml")]
