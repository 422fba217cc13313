"""Link-graph extraction + integer PageRank (operators/linkgraph.py).

Hand-computed 3-node rank trace, href extraction semantics (case,
entities, fragments), self-loop/malformed handling, and a DuckDB mirror
parity check on the same tiny graph.
"""
import duckdb
from pyspark.sql import functions as F

from jsonschema_spark.operators.linkgraph import (
    extract_links,
    host_rank_df,
    host_rank_sql,
    link_edges_df,
)


def test_extract_links_semantics(spark):
    html = (
        '<a href="https://a.com/x">1</a>'
        '<A HREF="https://b.com/y?p=1&amp;q=2">2</A>'          # case + entity
        '<a href="https://c.com/z#frag">3</a>'                  # stops at #
        '<a href="/relative">4</a>'                             # not absolute
        "<a href='https://d.com/s'>5</a>"                       # single-quoted: skipped
    )
    df = spark.createDataFrame([(html,)], "h string")
    [links] = df.select(extract_links(F.col("h"), binary=False).alias("l")).collect()
    assert links["l"] == [
        "https://a.com/x", "https://b.com/y?p=1&q=2", "https://c.com/z",
    ]


def test_link_edges_drops_self_loops_and_dedups(spark):
    html = ('<a href="https://me.com/1">s</a><a href="https://x.com/1">x</a>'
            '<a href="https://X.com/2">x2</a>').encode()
    df = spark.createDataFrame([("me.com", html)], "src_host string, html binary")
    edges = {(r["src_host"], r["dst_host"]) for r in link_edges_df(df).collect()}
    assert edges == {("me.com", "x.com")}  # self-loop gone, hosts lowercased+deduped


def _tiny_edges(spark):
    return spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("a", "c")], "src_host string, dst_host string")


def test_host_rank_hand_computed(spark):
    # r0 = 1e6 each. outdeg: a=2, b=1.
    # iter1: inmass b=500000, c=500000 (from a), a=1000000 (from b)
    #   r1: a = 150000 + 850000 = 1000000; b = c = 150000 + 425000 = 575000
    # iter2: a's share 500000 -> b,c; b->a share 575000; c leaks (no outlinks)
    #   r2: a = 150000 + (85*575000)//100 = 638750; b = c = 575000
    got = {r["host"]: r["rank_ppm"] for r in host_rank_df(_tiny_edges(spark), n_iter=2).collect()}
    assert got == {"a": 638750, "b": 575000, "c": 575000}


def test_host_rank_matches_duckdb_mirror(spark):
    spark_ranks = sorted(
        (r["host"], r["rank_ppm"])
        for r in host_rank_df(_tiny_edges(spark), n_iter=4).collect())
    edges_cte = ("SELECT * FROM (VALUES ('a','b'), ('b','a'), ('a','c'))"
                 " t(src_host, dst_host)")
    duck = duckdb.sql(host_rank_sql(edges_cte, n_iter=4) + " ORDER BY host").fetchall()
    assert spark_ranks == [(h, int(r)) for h, r in duck]


def test_anchor_text_semantics(spark):
    from jsonschema_spark.operators.linkgraph import anchor_text_df

    html = (
        '<a href="https://a.com/x">Click <b>here</b> now</a>'     # nested tag
        '<a href="https://b.com/y"><img src="i.png"></a>'          # image-only: dropped
        '<a href="https://c.com/z">R&amp;D&nbsp;team</a>'          # entities
        '<a href="/rel">relative dropped</a>'
    ).encode()
    df = spark.createDataFrame([("me.com", html)], "src_host string, html binary")
    got = {(r["dst_host"], r["anchor"]) for r in anchor_text_df(df).collect()}
    assert got == {("a.com", "Click here now"), ("c.com", "R&D team")}


def test_anchor_text_duckdb_parity(spark):
    import duckdb as _duck

    from jsonschema_spark.operators.linkgraph import anchor_text_df, anchor_text_sql

    html = ('<a href="https://a.com/1">one</a><A HREF="https://B.com/2">Two '
            'words</A><a href="https://c.com/3#f">frag&amp;ment</a>')
    df = spark.createDataFrame([("s.com", html)], "src_host string, html string")
    spark_rows = sorted(
        tuple(r) for r in anchor_text_df(df, binary=False).collect())
    pages = f"SELECT 's.com' AS src_host, '{html.replace(chr(39), chr(39)*2)}' AS html"
    duck = sorted(tuple(r) for r in _duck.sql(anchor_text_sql(pages)).fetchall())
    assert spark_rows == duck and len(duck) == 3


def test_hits_hand_computed_two_rounds(spark):
    """Kleinberg HITS on a 4-node graph: a,d pure hubs, c pure authority,
    b mixed — every value traced by hand through 2 normalize-by-max
    rounds (ar1: b=2e6,c=3e6 -> a1: b=666666; hr1: a=d=1666666,b=1e6 ->
    h1: b=600000; ar2: c=2.6e6 -> a2: b=769230; hr2: a=d=1769230 ->
    h2: b=565217)."""
    from jsonschema_spark.operators.linkgraph import host_hits_df

    edges = spark.createDataFrame(
        [("a", "b"), ("a", "c"), ("d", "b"), ("d", "c"), ("b", "c")],
        ["src_host", "dst_host"],
    )
    got = {
        r["host"]: (r["hub_ppm"], r["auth_ppm"])
        for r in host_hits_df(edges, n_iter=2).collect()
    }
    assert got == {
        "a": (1_000_000, 0),
        "d": (1_000_000, 0),
        "b": (565_217, 769_230),
        "c": (0, 1_000_000),
    }


def test_hits_duckdb_parity_and_plan(spark):
    """Spark HITS == the unrolled DuckDB mirror on a random-ish graph;
    plan contains no cross join and no Python stages."""
    import duckdb

    from jsonschema_spark.operators.linkgraph import host_hits_df, host_hits_sql

    pairs = sorted({(f"h{(i * 7) % 13}", f"h{(i * 11 + 3) % 13}") for i in range(40)})
    pairs = [(s, d) for s, d in pairs if s != d]
    edges = spark.createDataFrame(pairs, ["src_host", "dst_host"])
    out = host_hits_df(edges, n_iter=4)
    got = {r["host"]: (r["hub_ppm"], r["auth_ppm"]) for r in out.collect()}
    vals = ", ".join(f"('{s}', '{d}')" for s, d in pairs)
    sql = host_hits_sql(
        f"SELECT * FROM (VALUES {vals}) AS v(src_host, dst_host)", n_iter=4
    )
    want = {
        h: (int(hub), int(auth))
        for h, hub, auth in duckdb.connect().execute(sql).fetchall()
    }
    assert got == want
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_host_reciprocity(spark):
    from jsonschema_spark.operators.linkgraph import host_reciprocity

    edges = [
        ("a", "b"), ("b", "a"),          # reciprocated pair
        ("a", "c"),                      # one-way
        ("c", "d"), ("d", "c"), ("c", "e"),
        ("e", "e"),                      # self-loop: ignored entirely
        ("a", "b"),                      # duplicate edge: counted once
    ]
    df = spark.createDataFrame(edges, "src_host string, dst_host string")
    got = {r["host"]: (r["n_out"], r["n_recip"], r["recip_ppm"])
           for r in host_reciprocity(df).collect()}
    assert got["a"] == (2, 1, 500000)
    assert got["b"] == (1, 1, 1000000)
    assert got["c"] == (2, 1, 500000)
    assert got["d"] == (1, 1, 1000000)
    assert "e" not in got  # only edge was a self-loop


def test_trustrank_hand_computed(spark):
    from jsonschema_spark.operators.linkgraph import trustrank_df

    # edges: a->b, b->a, a->c; seeds={a}; outdeg a=2, b=1
    # r0: a=1e6, b=c=0
    # iter1: inmass b=c=500000 (from a), a=0 (b holds 0)
    #   a = 150000 + 0 = 150000; b = c = 0 + 425000 = 425000
    # iter2: a's share 75000 -> b,c; b->a 425000; c leaks
    #   a = 150000 + (85*425000)//100 = 511250
    #   b = c = 0 + (85*75000)//100 = 63750
    edges = _tiny_edges(spark)
    seeds = spark.createDataFrame([("a",)], "host string")
    got = {r["host"]: r["trust_ppm"]
           for r in trustrank_df(edges, seeds, n_iter=2).collect()}
    assert got == {"a": 511250, "b": 63750, "c": 63750}


def test_trustrank_matches_duckdb_mirror(spark):
    from jsonschema_spark.operators.linkgraph import (trustrank_df,
                                                      trustrank_sql)

    edges = _tiny_edges(spark)
    # seed 'z' is NOT in the graph: must contribute nothing and emit no row
    seeds = spark.createDataFrame([("a",), ("z",)], "host string")
    spark_ranks = sorted(
        (r["host"], r["trust_ppm"])
        for r in trustrank_df(edges, seeds, n_iter=4).collect())
    edges_cte = ("SELECT * FROM (VALUES ('a','b'), ('b','a'), ('a','c'))"
                 " t(src_host, dst_host)")
    seeds_cte = "SELECT * FROM (VALUES ('a'), ('z')) t(host)"
    duck = duckdb.sql(trustrank_sql(edges_cte, seeds_cte, n_iter=4)
                      + " ORDER BY host").fetchall()
    assert spark_ranks == [(h, int(r)) for h, r in duck]
    assert all(h != "z" for h, _ in spark_ranks)


def test_trustrank_spam_island_gets_zero(spark):
    from jsonschema_spark.operators.linkgraph import trustrank_df

    # trusted component a<->b plus a disconnected link farm s1<->s2:
    # the farm ranks HIGH on plain PageRank but gets ZERO trust.
    edges = spark.createDataFrame(
        [("a", "b"), ("b", "a"), ("s1", "s2"), ("s2", "s1")],
        "src_host string, dst_host string")
    seeds = spark.createDataFrame([("a",)], "host string")
    got = {r["host"]: r["trust_ppm"]
           for r in trustrank_df(edges, seeds, n_iter=3).collect()}
    assert got["s1"] == 0 and got["s2"] == 0
    assert got["a"] > 0 and got["b"] > 0
