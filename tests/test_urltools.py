"""URL canonicalization / host stats (operators/urltools.py).

Hand-computed normalization fixtures, idempotence, and the per-domain
aggregate shapes. The DuckDB-mirror gate for these lives in
__spark_entry__ (url_normalize / host_stats / url_dedup queries).
"""
import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators.urltools import (
    host_of,
    host_stats_df,
    is_valid_url,
    normalize_url,
    normalize_urls_df,
    registered_domain,
    url_dedup_df,
    url_parts,
)

CASES = [
    # (raw, normalized)
    ("HTTP://WWW.Example.COM:80/a/b", "http://www.example.com/a/b"),
    ("https://example.com:443/", "https://example.com/"),
    ("https://example.com:8443/x", "https://example.com:8443/x"),
    ("http://example.com", "http://example.com/"),
    ("http://example.com/a//b///c", "http://example.com/a/b/c"),
    ("http://example.com/p?b=2&a=1", "http://example.com/p?a=1&b=2"),
    ("http://example.com/p?utm_source=x&a=1&fbclid=9", "http://example.com/p?a=1"),
    ("http://example.com/p?utm_source=x", "http://example.com/p"),
    ("http://example.com/p?a=1#frag", "http://example.com/p?a=1"),
    ("http://example.com/#top", "http://example.com/"),
    ("http://example.com:8080/q?gclid=1&z=3&msclkid=2&utm_medium=m",
     "http://example.com:8080/q?z=3"),
]


def test_normalize_fixtures(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], ["url"])
    got = [r["n"] for r in
           df.select(normalize_url(F.col("url")).alias("n")).collect()]
    assert got == [n for _, n in CASES]


def test_normalize_idempotent(spark):
    df = spark.createDataFrame([(r,) for r, _ in CASES], ["url"])
    once = df.select(normalize_url(F.col("url")).alias("url"))
    twice = once.select(normalize_url(F.col("url")).alias("url"))
    assert [r["url"] for r in once.collect()] == \
           [r["url"] for r in twice.collect()]


def test_parts_and_validity(spark):
    df = spark.createDataFrame(
        [("HTTPS://Host.Org:81/p/q?a=1#z",), ("not a url",), ("ftp://x/y",)],
        ["url"],
    )
    p = url_parts(F.col("url"))
    rows = df.select(
        p["scheme"].alias("s"), p["host"].alias("h"), p["port"].alias("po"),
        p["path"].alias("pa"), p["query"].alias("q"), p["fragment"].alias("f"),
        is_valid_url(F.col("url")).alias("ok"),
    ).collect()
    r = rows[0]
    assert (r["s"], r["h"], r["po"], r["pa"], r["q"], r["f"], r["ok"]) == \
           ("HTTPS", "Host.Org", "81", "/p/q", "a=1", "z", True)
    assert rows[1]["ok"] is False and rows[1]["h"] == ""
    assert rows[2]["ok"] is False and rows[2]["s"] == "ftp"


@pytest.mark.parametrize("url,dom", [
    ("http://a.b.example.co.uk/x", "example.co.uk"),
    ("http://www.example.com/x", "example.com"),
    ("http://example.com/x", "example.com"),
    ("http://deep.sub.site.org/x", "site.org"),
    ("http://localhost/x", "localhost"),
    ("http://shop.com.au/x", "shop.com.au"),  # 2-label host on a 2-level suffix
    # full-PSL cases beyond the legacy TWO_LEVEL_SUFFIXES subset
    ("http://a.example.org.uk/x", "example.org.uk"),
    ("http://x.example.com.sg/x", "example.com.sg"),
    ("http://x.pvt.k12.ma.us/x", "x.pvt.k12.ma.us"),   # 4-label exact rule
    ("http://foo.bar.ck/x", "foo.bar.ck"),             # wildcard *.ck
    ("http://a.foo.bar.ck/x", "foo.bar.ck"),
    ("http://www.ck/x", "www.ck"),                     # exception !www.ck
    ("http://a.www.ck/x", "www.ck"),
    ("http://a.city.kobe.jp/x", "city.kobe.jp"),       # exception beats *.kobe.jp
    ("http://a.b.kobe.jp/x", "a.b.kobe.jp"),           # wildcard *.kobe.jp
    ("http://a.b.unknowntld/x", "b.unknowntld"),       # default rule '*'
])
def test_registered_domain(spark, url, dom):
    df = spark.createDataFrame([(url,)], ["url"])
    assert df.select(registered_domain(F.col("url")).alias("d")) \
             .collect()[0]["d"] == dom


def test_registered_domain_private_section(spark):
    from jsonschema_spark.operators.urltools import public_suffix

    df = spark.createDataFrame(
        [("http://user.github.io/x",), ("http://b.user.blogspot.com/x",)],
        ["url"])
    icann = [r["d"] for r in
             df.select(registered_domain(F.col("url")).alias("d")).collect()]
    priv = [r["d"] for r in
            df.select(registered_domain(F.col("url"), include_private=True)
                      .alias("d")).collect()]
    assert icann == ["github.io", "blogspot.com"]
    assert priv == ["user.github.io", "user.blogspot.com"]
    ps = [r["p"] for r in
          df.select(public_suffix(F.col("url"), include_private=True)
                    .alias("p")).collect()]
    assert ps == ["github.io", "blogspot.com"]


def test_public_suffix(spark):
    from jsonschema_spark.operators.urltools import public_suffix

    cases = [
        ("http://a.b.example.co.uk/x", "co.uk"),
        ("http://www.example.com/x", "com"),
        ("http://a.foo.bar.ck/x", "bar.ck"),      # wildcard
        ("http://a.city.kobe.jp/x", "kobe.jp"),   # exception
        ("http://a.b.unknowntld/x", "unknowntld"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], ["url"])
    got = [r["p"] for r in
           df.select(public_suffix(F.col("url")).alias("p")).collect()]
    assert got == [w for _, w in cases]


def test_host_stats_psl_grouping(spark):
    """PSL suffixes group per-site stats correctly: subdomains of an
    org.uk / com.sg registration collapse to one registered domain
    instead of being mis-grouped under ('org.uk', 'com.sg')."""
    df = spark.createDataFrame([
        ("http://a.news.org.uk/1", 1), ("http://b.news.org.uk/2", 2),
        ("http://shop.example.com.sg/1", 4), ("http://example.com.sg/2", 8),
        ("http://other.org.uk/1", 16),
    ], ["url", "sz"])
    rows = {r["reg_domain"]: r for r in
            host_stats_df(df, "url", size_col="sz").collect()}
    assert set(rows) == {"news.org.uk", "example.com.sg", "other.org.uk"}
    assert rows["news.org.uk"]["n_pages"] == 2
    assert rows["example.com.sg"]["total_size"] == 12


def test_domain_cap_psl_grouping(spark):
    """domain_cap keyed on registered_domain: a PSL ccTLD site's
    subdomains share ONE cap bucket."""
    from jsonschema_spark.operators.curate import domain_cap_sample

    rows = [(f"http://s{i % 4}.big.co.uk/{i}", i) for i in range(40)]
    rows += [(f"http://small.com.sg/{i}", 100 + i) for i in range(3)]
    df = spark.createDataFrame(rows, ["url", "doc_id"]) \
        .withColumn("grp", registered_domain(F.col("url")))
    out = domain_cap_sample(df, id_col="doc_id", group_col="grp", cap=5)
    per = {r["grp"]: r["cnt"] for r in
           out.groupBy("grp").agg(F.count("*").alias("cnt")).collect()}
    assert per == {"big.co.uk": 5, "small.com.sg": 3}


def test_host_stats(spark):
    df = spark.createDataFrame([
        ("http://www.site.com/a?utm_source=1", 10),
        ("HTTP://SITE.com:80/a", 20),        # same reg_domain, DIFFERENT url
        ("http://site.com/a", 30),           # dup of previous after norm
        ("http://other.co.uk/b", 5),
    ], ["url", "sz"])
    rows = {r["reg_domain"]: r for r in
            host_stats_df(df, "url", size_col="sz").collect()}
    assert rows["site.com"]["n_pages"] == 3
    assert rows["site.com"]["n_urls"] == 2  # www vs bare host stay distinct
    assert rows["site.com"]["total_size"] == 60
    assert rows["other.co.uk"]["n_pages"] == 1


def test_url_dedup_keep_latest(spark):
    df = spark.createDataFrame([
        ("http://a.com/p?b=2&a=1", 100, "old"),
        ("http://A.com:80/p?a=1&b=2&utm_source=x", 200, "new"),
        ("http://b.com/q", 50, "only"),
    ], ["url", "ts", "tag"])
    out = {r["url_norm"]: r for r in
           url_dedup_df(df, "url", order_cols=("ts",)).collect()}
    assert len(out) == 2
    assert out["http://a.com/p?a=1&b=2"]["tag"] == "new"
    assert out["http://b.com/q"]["tag"] == "only"


def test_normalize_df_columns(spark):
    df = spark.createDataFrame([("http://www.x.example.co.uk:80/a//b",)],
                               ["url"])
    r = normalize_urls_df(df).collect()[0]
    assert r["url_norm"] == "http://www.x.example.co.uk/a/b"
    assert r["host"] == "www.x.example.co.uk"
    assert r["reg_domain"] == "example.co.uk"


def test_url_signature_and_crawler_traps(spark):
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.urltools import (
        crawler_traps_df,
        url_signature,
    )

    urls = [
        ("https://a.org/cal/2024/1/5?sess=deadbeef1234&page=2",
         "/cal/N/N/N?sess=V&page=V"),
        ("https://a.org/item/00ff00ff00", "/item/H"),   # 8+ hex -> H
        ("https://a.org/p42x/9", "/pNx/N"),
        ("https://a.org/plain", "/plain"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in urls], ["url"])
    got = [r["sig"] for r in
           df.select(url_signature(F.col("url")).alias("sig")).collect()]
    assert got == [s for _, s in urls]
    # trap: 12 instances of one template on one host; one-offs stay quiet;
    # duplicate URLs count once (distinct instances, not fetches)
    rows = [(f"https://t.org/d/{i}?p={i}",) for i in range(12)] * 2
    rows += [("https://t.org/unique1",), ("https://t.org/unique2x",)]
    traps = crawler_traps_df(spark.createDataFrame(rows, ["url"]),
                             min_urls=10).collect()
    assert len(traps) == 1
    t = traps[0]
    assert (t["host"], t["sig"], t["n_urls"]) == ("t.org", "/d/N?p=V", 12)
    assert t["sample_url"] == "https://t.org/d/0?p=0"


def test_link_stats_no_explode(spark):
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.linkgraph import link_stats_df

    pages = spark.createDataFrame(
        [("a.org",
          '<a href="https://a.org/x">i</a><a href="https://b.org/y">e</a>'
          '<a href="https://b.org/z">e2</a><a href="https://c.org/w">e3</a>'),
         ("b.org", "no links here")],
        ["src_host", "html"],
    ).select("src_host", F.encode("html", "UTF-8").alias("html"))
    got = {r["src_host"]: (r["n_links"], r["n_internal"], r["n_external"],
                           r["n_ext_hosts"])
           for r in link_stats_df(pages).collect()}
    assert got == {"a.org": (4, 1, 3, 2), "b.org": (0, 0, 0, 0)}
    plan = link_stats_df(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Generate" not in plan and "Exchange" not in plan


def test_frontier_interleave_host_diversity(spark):
    """Round k fully precedes round k+1; within a round every host
    appears exactly once; higher priority goes first within a host."""
    from jsonschema_spark.operators.urltools import frontier_interleave

    rows = [(f"https://{h}.org/p{i}", 10 - i)
            for h in ("a", "b", "c") for i in range(4)]
    df = spark.createDataFrame(rows, ["url", "prio"])
    out = frontier_interleave(df, priority_col="prio") \
        .orderBy("fetch_order").collect()
    assert [r["fetch_order"] for r in out] == list(range(1, 13))
    # rounds are contiguous, 3 hosts per round, all distinct
    for k in range(4):
        chunk = out[3 * k:3 * k + 3]
        assert all(r["round"] == k + 1 for r in chunk)
        hosts = {r["url"].split("/")[2] for r in chunk}
        assert len(hosts) == 3
    # within one host, priority descends with round
    a = [r for r in out if "a.org" in r["url"]]
    assert [r["prio"] for r in a] == [10, 9, 8, 7]


# --- recrawl_priority -------------------------------------------------------


def test_recrawl_priority_change_rates(spark):
    from jsonschema_spark.operators.urltools import recrawl_priority

    rows = [
        # u1: observed 4x, changes at snap 2 only -> 1 change / 3 gaps
        ("u1", 0, "a"), ("u1", 1, "a"), ("u1", 2, "b"), ("u1", 3, "b"),
        # u2: observed snaps 0,2,3 (snap 1 missed); sig differs at every
        # CONSECUTIVE OBSERVATION -> 2 changes / 2 gaps
        ("u2", 0, "a"), ("u2", 2, "b"), ("u2", 3, "c"),
        # u3: single observation -> rate NULL
        ("u3", 1, "z"),
        # u4: never changes
        ("u4", 0, "k"), ("u4", 3, "k"),
    ]
    df = spark.createDataFrame(rows, "url string, snap_id long, sig string")
    got = {r["url"]: r for r in recrawl_priority(df).collect()}
    assert (got["u1"]["n_obs"], got["u1"]["n_changes"],
            got["u1"]["change_rate_ppm"]) == (4, 1, 333333)
    assert (got["u2"]["n_obs"], got["u2"]["n_changes"],
            got["u2"]["change_rate_ppm"]) == (3, 2, 1000000)
    assert got["u3"]["n_obs"] == 1 and got["u3"]["change_rate_ppm"] is None
    assert got["u4"]["n_changes"] == 0 and got["u4"]["change_rate_ppm"] == 0
    assert got["u2"]["last_sig"] == "c" and got["u2"]["first_snap"] == 0
    assert got["u2"]["last_snap"] == 3


def test_recrawl_priority_partition_invariance(spark):
    from jsonschema_spark.operators.urltools import recrawl_priority

    rows = [(f"u{u}", s, f"v{(s * (u % 3 + 1)) // 3}")
            for u in range(37) for s in range(4) if (u + s) % 5]
    df = spark.createDataFrame(rows, "url string, snap_id long, sig string")
    a = sorted(map(tuple, recrawl_priority(df).collect()))
    b = sorted(map(tuple, recrawl_priority(df.repartition(17)).collect()))
    assert a == b and len(a) == 37


def test_url_param_policy_hand_computed(spark):
    from jsonschema_spark.operators.urltools import url_param_policy

    rows = [
        # utm is strip-safe on h1: 3 base groups, each 2 url variants
        # differing only in utm, same content sig.
        ("http://h1/a?page=1&utm=x", "A"),
        ("http://h1/a?utm=y&page=1", "A"),      # param order noise
        ("http://h1/a?page=2&utm=x", "B"),
        ("http://h1/a?page=2&utm=z", "B"),
        ("http://h1/b?page=1&utm=x", "C"),
        ("http://h1/b?page=1&utm=y", "C"),
        # page CHANGES content on h1: same base (minus page), sigs differ
        # -> its groups are non-invariant. (The pairs above also give
        # page evidence groups: {page=1,page=2} under base a?utm=x.)
        # sess: only ONE evidence group -> below min_support.
        ("http://h1/c?sess=1", "D"),
        ("http://h1/c?sess=2", "D"),
        # refetch of one url with sig churn must NOT fake invariance
        ("http://h1/a?page=1&utm=x", "A2"),
    ]
    df = spark.createDataFrame(rows, "url string, sig string")
    got = {(r["host"], r["param"]): r
           for r in url_param_policy(df, "url", "sig").collect()}
    utm = got[("h1", "utm")]
    assert (utm["n_groups"], utm["n_invariant"], utm["strip_safe"]) == \
        (3, 3, True)
    assert utm["invariant_ppm"] == 1000000
    page = got[("h1", "page")]
    assert page["strip_safe"] is False and page["n_invariant"] == 0
    sess = got[("h1", "sess")]
    assert (sess["n_groups"], sess["n_invariant"], sess["strip_safe"]) == \
        (1, 1, False)  # invariant but support < 3


def test_url_param_policy_partition_invariance(spark):
    from jsonschema_spark.operators.urltools import url_param_policy

    rows = [(f"http://h{i % 3}/p{i % 5}?page={i % 2}"
             + (f"&utm={i % 7}" if i % 5 < 2 else "")
             + (f"&sess={i}" if i % 11 == 0 else ""),
             f"s{(i % 3, i % 5, i % 2)}")
            for i in range(200)]
    df = spark.createDataFrame(rows, "url string, sig string")
    a = sorted(map(tuple, url_param_policy(df).collect()))
    b = sorted(map(tuple, url_param_policy(df.repartition(13)).collect()))
    assert a == b and len(a) >= 3


def test_typosquat_pairs_hand_computed(spark):
    from jsonschema_spark.operators.urltools import typosquat_pairs

    trusted = spark.createDataFrame(
        [("example.com",), ("google.com",), ("paypal.com",),
         ("abcde.com",), ("abcdef.com",)], "h string")
    cands = spark.createDataFrame(
        [("examp1e.com",),   # substitution
         ("exampl.com",),    # deletion
         ("examplee.com",),  # insertion
         ("example.com",),   # equal AND trusted: excluded twice over
         ("goggle.com",),    # substitution vs google
         ("gooogle.com",),   # insertion vs google
         ("paypa1.net",),    # many edits: no pair
         ("elpmaxe.com",),   # reversed: no pair
         ("abcdef.com",),    # trusted itself, though 1 edit from abcde
         (None,)], "host string")
    got = {(r["host"], r["trusted_host"]) for r in
           typosquat_pairs(cands, "host", trusted, "h").collect()}
    assert got == {
        ("examp1e.com", "example.com"),
        ("exampl.com", "example.com"),
        ("examplee.com", "example.com"),
        ("goggle.com", "google.com"),
        ("gooogle.com", "google.com"),
    }


def test_deletion1_blocking_complete_vs_bruteforce(spark):
    """FastSS completeness on a generated corpus: the neighborhood
    join finds EXACTLY the levenshtein==1 pairs the brute-force cross
    join finds."""
    import pyspark.sql.functions as F
    from jsonschema_spark.operators.urltools import typosquat_pairs

    base = spark.range(40).select(
        F.concat(F.lit("host"), F.col("id").cast("string"),
                 F.lit(".example.org")).alias("h"))
    # mutate: drop char 3, swap char 5 for 'z', or append 'x'
    cands = spark.range(120).select(
        F.concat(F.lit("host"), (F.col("id") % 40).cast("string"),
                 F.lit(".example.org")).alias("h0"),
        (F.col("id") % 3).alias("m")
    ).select(
        F.when(F.col("m") == 0,
               F.concat(F.expr("substr(h0, 1, 2)"),
                        F.expr("substr(h0, 4, length(h0))")))
        .when(F.col("m") == 1,
              F.concat(F.expr("substr(h0, 1, 4)"), F.lit("z"),
                       F.expr("substr(h0, 6, length(h0))")))
        .otherwise(F.concat(F.col("h0"), F.lit("x"))).alias("host"))
    got = typosquat_pairs(cands, "host", base, "h")
    brute = (
        cands.distinct().crossJoin(base)
        .where(F.levenshtein("host", "h") == 1)
        .join(base.select(F.col("h").alias("host")).distinct(),
              "host", "left_anti")
        .select("host", F.col("h").alias("trusted_host")).distinct()
    )
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, brute.collect()))
    assert a == b and len(a) > 0


def test_path_rollup_hand_computed(spark):
    from jsonschema_spark.operators.urltools import path_rollup

    df = spark.createDataFrame(
        [("https://a.com/x/y/z.html?q=1",),
         ("https://a.com/x/q",),
         ("http://b.com/",),
         (None,)],
        "url string")
    got = {(r["host"], r["depth"], r["prefix"]): r["n_urls"]
           for r in path_rollup(df, "url").collect()}
    assert got == {
        ("a.com", 0, "/"): 2,
        ("a.com", 1, "/x"): 2,
        ("a.com", 2, "/x/y"): 1,
        ("a.com", 2, "/x/q"): 1,
        ("a.com", 3, "/x/y/z.html"): 1,
        ("b.com", 0, "/"): 1,
    }
    # depth cap: deep paths stop at max_depth
    deep = spark.createDataFrame(
        [("https://c.com/a/b/c/d/e",)], "url string")
    d2 = {r["depth"] for r in
          path_rollup(deep, "url", max_depth=2).collect()}
    assert d2 == {0, 1, 2}
