"""Generic HTML -> text extraction (operators/htmltext.py).

Covers: semantics of each documented step on hand-written pages,
cross-engine byte parity Spark == DuckDB over the gnarly-case corpus,
null/binary handling, and the n_lines block-structure signal.
"""
import duckdb
import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators.htmltext import (
    STEPS,
    extract_text_html,
    html_text_df,
    html_text_sql,
)

CASES = [
    # (html, expected extracted text)
    (
        '<!DOCTYPE html><html><head><title>T</title>'
        "<script>var x=1; if (x<2) { x=3; }</script></head>"
        '<body><!-- c --><nav>Home | About</nav><div class="main">'
        "<p>Hello &amp;lt; world &quot;q&quot; &#39;a&#39;</p>"
        "<ul><li>one</li><li>two&nbsp;&nbsp;three</li></ul></div>"
        "<style>.a { color: red; }</style><footer>(c) 2026</footer>"
        "</body></html>",
        "Home | About\nHello &lt; world \"q\" 'a'\none\ntwo three\n(c) 2026",
    ),
    # multi-byte text + whitespace collapse across block tags
    ("<p>café 中文 naïve</p>\n\n<div>  spaced   out </div>",
     "café 中文 naïve\nspaced out"),
    # script case-insensitivity, multiline script bodies, <BR> is a block
    ('<script src="x.js"></script><SCRIPT>\nmultiline</script>text<BR>after',
     "text\nafter"),
    # inline tag stripped without newline; attribute with entities
    ('<a href="https://x.com/a?b=1&amp;c=2">link text</a> trailing',
     "link text trailing"),
    ("", ""),
    # entity decode is exactly one level (&amp;amp; -> &amp;)
    ("<p>a &lt;tag&gt; literal &amp;amp; doubled</p>",
     "a <tag> literal &amp; doubled"),
    ("no tags at all", "no tags at all"),
    ("<table><tr><td>c1</td><td>c2</td></tr></table>", "c1\nc2"),
    # comment containing markup is dropped before tag handling
    ("<!-- <script>evil()</script> -->safe", "safe"),
    # head content (title) is metadata, not text
    ("<head><title>Page Title</title><meta x=1></head><p>body</p>", "body"),
]


def test_steps_are_shared_contract():
    # the oracle mirror is generated from the SAME step list
    sql = html_text_sql("x")
    n_re = sum(1 for k, _, _ in STEPS if k == "re")
    n_lit = sum(1 for k, _, _ in STEPS if k == "lit")
    assert sql.count("regexp_replace(") == n_re
    assert sql.count("replace(") == n_re + n_lit  # regexp_replace contains it


@pytest.mark.parametrize("html,expected", CASES)
def test_duckdb_semantics(html, expected):
    got = duckdb.sql(
        "SELECT " + html_text_sql("?::VARCHAR"), params=[html]
    ).fetchone()[0]
    assert got == expected


def test_spark_duckdb_byte_parity(spark):
    rows = [(i, h) for i, (h, _) in enumerate(CASES)] + [(len(CASES), None)]
    df = spark.createDataFrame(rows, "i int, h string")
    got = {
        r["i"]: r["t"]
        for r in df.select(
            "i", extract_text_html(F.col("h"), binary=False).alias("t")
        ).collect()
    }
    for i, (_, expected) in enumerate(CASES):
        assert got[i] == expected, f"case {i}"
    assert got[len(CASES)] is None  # null-in-null-out


def test_binary_path_and_line_count(spark):
    html = "<p>a</p><p>b 中</p><div></div>"
    df = spark.createDataFrame([(1, html.encode()), (2, None)],
                               "doc_id int, html binary")
    out = {r["doc_id"]: r for r in html_text_df(df, "doc_id").collect()}
    assert out[1]["text_extracted"] == "a\nb 中"
    assert out[1]["n_chars"] == 5  # codepoints, not bytes
    assert out[1]["n_lines"] == 2
    assert out[2]["text_extracted"] is None
    assert out[2]["n_chars"] == 0 and out[2]["n_lines"] == 0


def test_main_content_density_heuristic(spark):
    """Nav/footer (link-dense) and sub-minimum blocks dropped, prose
    kept in document order; low-density inline link survives; every doc
    survives (null html -> NULL text, zero counts)."""
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.htmltext import main_content_df

    html = (
        "<html><head><title>t</title></head><body>"
        "<nav><a href='/'>Home</a> | <a href='/a'>About</a> | "
        "<a href='/c'>Contact page</a></nav>"
        "<p>First long main paragraph with plenty of prose text and no "
        "links anywhere inside of it at all.</p>"
        "<p>Second real paragraph, long enough and containing "
        "<a href='x'>one tiny link</a> inside lots of surrounding prose "
        "so the density stays well below the cutoff.</p>"
        "<div>tiny</div>"
        "<footer><a href='/p'>Privacy</a> <a href='/t'>Terms</a> "
        "<a href='/i'>Imprint</a></footer></body></html>"
    )
    df = spark.createDataFrame([(1, html), (2, None)], ["doc_id", "h"]) \
        .select("doc_id", F.encode("h", "UTF-8").alias("html"))
    rows = {r["doc_id"]: r.asDict()
            for r in main_content_df(df).collect()}
    r1 = rows[1]
    assert r1["n_blocks_total"] == 5 and r1["n_blocks_kept"] == 2
    lines = r1["main_text"].split("\n")
    assert lines[0].startswith("First long main paragraph")
    assert lines[1].startswith("Second real paragraph")
    assert "Privacy" not in r1["main_text"] and "Home" not in r1["main_text"]
    assert rows[2]["main_text"] is None and rows[2]["n_blocks_total"] == 0


def test_main_content_thresholds_move_the_boundary(spark):
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.htmltext import main_content_df

    html = "<p>0123456789012345</p><p><a href='x'>half link text</a> padded out to length</p>"
    df = spark.createDataFrame([(1, html)], ["doc_id", "h"]) \
        .select("doc_id", F.encode("h", "UTF-8").alias("html"))
    # block 1 has 16 chars: kept at min_chars=10, dropped at 25
    loose = main_content_df(df, min_chars=10, max_link_density_ppm=999_999)
    assert loose.collect()[0]["n_blocks_kept"] == 2
    strict = main_content_df(df, min_chars=10, max_link_density_ppm=100_000)
    assert strict.collect()[0]["n_blocks_kept"] == 1  # linky block dropped


def test_charset_guess_binary_and_string_paths(spark):
    """BOM (utf-8/utf-16 LE/BE) beats declarations; HTML5 meta, legacy
    http-equiv and XML-decl forms all detected; aliases normalized;
    default utf-8; both paths agree on BOM-less ASCII."""
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.htmltext import charset_guess

    rows = [
        (1, "\xef\xbb\xbf<meta charset='latin1'>x".encode("latin-1")),
        (2, b'<html><head><meta charset="Windows-1252"></head>x'),
        (3, b"<meta http-equiv='C' content='text/html; charset=ISO8859-1'>"),
        (4, b"<?xml version='1.0' encoding='UTF8'?><root/>"),
        (5, b"<html>nothing declared</html>"),
        (6, "\xff\xfeX\x00".encode("latin-1")),
        (7, "\xfe\xff\x00X".encode("latin-1")),
    ]
    bdf = spark.createDataFrame(rows, "doc_id: long, html: binary")
    got = {r["doc_id"]: (r["bom"], r["charset_declared"], r["charset"])
           for r in charset_guess(bdf).collect()}
    assert got[1] == ("utf-8", "latin1", "utf-8")   # BOM wins
    assert got[2] == (None, "windows-1252", "windows-1252")
    assert got[3] == (None, "iso8859-1", "iso-8859-1")
    assert got[4] == (None, "utf8", "utf-8")
    assert got[5] == (None, None, "utf-8")
    assert got[6][0] == "utf-16le" and got[7][0] == "utf-16be"
    # string path agrees on BOM-less ASCII inputs
    sdf = spark.createDataFrame(
        [(i, b.decode("latin-1")) for i, b in rows[1:5]],
        "doc_id: long, html: string",
    )
    got_s = {r["doc_id"]: (r["bom"], r["charset_declared"], r["charset"])
             for r in charset_guess(sdf, binary=False).collect()}
    assert got_s == {k: got[k] for k in got_s}


# --- page metadata (html_meta_df / resolve_href / canonical_dedup_df) ----

META_CASES = [
    # attribute order + quote-style variants, entity/newline title fold
    (0, '<html lang="EN-us"><head><title> A &amp;\n B </title>'
        '<meta name="description" content="d0"><link rel="canonical" '
        'href="https://EX.org/p/0?utm_source=x&b=1"></head><body>x</body>',
     'https://ex.org/a0',
     ("A & B", "d0", "en-us", None, False, False,
      "https://EX.org/p/0?utm_source=x&b=1")),
    (1, "<html LANG='fr'><head><META content='d1' name='description'>"
        "<meta name='robots' content='NOINDEX, follow'>"
        "<link href='/p/0' rel='canonical'></head>",
     'https://EX.org:443/a1',
     (None, "d1", "fr", "noindex, follow", True, False, "/p/0")),
    # 'none' implies noindex AND nofollow
    (2, '<html><head><meta name="robots" content="none"></head>',
     'https://ex.org/a2',
     (None, None, None, "none", True, True, None)),
    # unquoted lang attr, protocol-relative canonical
    (3, '<html lang=de><head><title>T3</title>'
        '<link rel="canonical" href="//ex.org/p/0"></head>',
     'http://ex.org/a3',
     ("T3", None, "de", None, False, False, "//ex.org/p/0")),
    # path-relative canonical extracted raw; resolution falls back
    (4, '<html><head><link rel="canonical" href="rel/path"></head>',
     'https://ex.org/a4',
     (None, None, None, None, False, False, "rel/path")),
    # 'nofollow' alone does not set noindex; noindex as substring of a
    # longer token does NOT match (token semantics)
    (5, "<html><head><meta name='robots' content='nofollow,noindexish'>"
        "</head>", 'https://ex.org/a5',
     (None, None, None, "nofollow,noindexish", False, True, None)),
]


@pytest.fixture(scope="module")
def meta_pages(spark):
    rows = [(i, h, u) for i, h, u, _ in META_CASES]
    return spark.createDataFrame(rows, "doc_id long, html string, url string")


def test_html_meta_fields(meta_pages):
    from jsonschema_spark.operators.htmltext import html_meta_df

    got = {r["doc_id"]: r for r in
           html_meta_df(meta_pages, binary=False).collect()}
    for i, _, _, exp in META_CASES:
        r = got[i]
        assert (r["title"], r["meta_description"], r["html_lang"],
                r["robots_meta"], r["noindex"], r["nofollow"],
                r["canonical_href"]) == exp, f"doc {i}"


def test_html_meta_sql_parity(meta_pages):
    """DuckDB mirror byte-parity over the variant corpus."""
    from jsonschema_spark.operators.htmltext import html_meta_df, html_meta_sql

    sp = [tuple(r) for r in
          html_meta_df(meta_pages, binary=False).orderBy("doc_id").collect()]
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, html TEXT)")
    con.executemany("INSERT INTO t VALUES (?, ?)",
                    [(i, h) for i, h, _, _ in META_CASES])
    dk = con.sql(html_meta_sql("SELECT doc_id, html FROM t")
                 + " ORDER BY doc_id").fetchall()
    assert sp == [tuple(r) for r in dk]


def test_html_meta_binary_and_null(spark):
    from jsonschema_spark.operators.htmltext import html_meta_df

    df = spark.createDataFrame(
        [(0, "<html><head><title>Bé</title></head>".encode()),
         (1, None)],
        "doc_id long, html binary")
    rows = {r["doc_id"]: r for r in html_meta_df(df).collect()}
    assert rows[0]["title"] == "Bé"
    assert rows[1]["title"] is None and rows[1]["noindex"] is False


def test_resolve_href_forms(spark):
    from jsonschema_spark.operators.htmltext import resolve_href

    df = spark.createDataFrame(
        [("https://Host.Org/base/x?q=1",)], "url string")
    out = df.select(
        *[resolve_href(F.lit(h), F.col("url")).alias(f"c{k}")
          for k, h in enumerate(
              ["https://other.org/abs", "//cdn.org/p", "/root/p",
               "rel/p", None])]).first()
    assert out["c0"] == "https://other.org/abs"
    assert out["c1"] == "https://cdn.org/p"
    assert out["c2"] == "https://host.org/root/p"
    assert out["c3"] is None and out["c4"] is None


def test_canonical_dedup_clusters(meta_pages):
    """Docs 0/1/3 all canonicalize to .../p/0 variants; doc 0's tracking
    param is stripped but ?b=1 survives (distinct target), docs 1 and 3
    share https://ex.org/p/0 after default-port strip + protocol-relative
    resolution ... doc 3 is http (scheme preserved). Fallback docs (2, 4,
    5) are their own singletons."""
    from jsonschema_spark.operators.htmltext import canonical_dedup_df

    out = {r["canon_url"]: r for r in
           canonical_dedup_df(meta_pages, binary=False).collect()}
    assert out["https://ex.org/p/0?b=1"]["keep_id"] == 0
    assert out["https://ex.org/p/0"]["n_pages"] == 1  # doc 1 (443 stripped)
    assert out["https://ex.org/p/0"]["keep_id"] == 1
    assert out["http://ex.org/p/0"]["keep_id"] == 3  # protocol-relative
    # fallbacks normalize their own url
    assert out["https://ex.org/a2"]["n_pages"] == 1
    assert out["https://ex.org/a4"]["keep_id"] == 4
    assert len(out) == 6


# --- embedded JSON-LD extraction ------------------------------------------

JSONLD_PAGES = [
    (0, '<html><head><script>var x = {"not":"matched"};</script>'
        '<script type="application/ld+json">{"@type":"Article","headline":"A"}'
        "</script><script TYPE='application/ld+json'> {\"@type\":\"Product\"} "
        "</script></head><body>b</body></html>"),
    (1, "<html><body>no blocks</body></html>"),
    (2, '<html><head><SCRIPT type="application/ld+json">broken {json'
        "</SCRIPT></head></html>"),
    (3, '<html><script type="application/ld+json" async>'
        '{"@type":"X",\n "multi":"line"}</script></html>'),
]


def test_embedded_jsonld_extraction(spark):
    from jsonschema_spark.operators.htmltext import embedded_jsonld_df

    df = spark.createDataFrame(JSONLD_PAGES, "doc_id long, html string")
    rows = sorted(
        (r["doc_id"], r["block_idx"], r["jsonld"])
        for r in embedded_jsonld_df(df, binary=False).collect())
    assert rows == [
        (0, 0, '{"@type":"Article","headline":"A"}'),
        (0, 1, ' {"@type":"Product"} '),
        (2, 0, "broken {json"),
        (3, 0, '{"@type":"X",\n "multi":"line"}'),
    ]


def test_embedded_jsonld_sql_parity(spark):
    from jsonschema_spark.operators.htmltext import (
        embedded_jsonld_df, embedded_jsonld_sql)

    df = spark.createDataFrame(JSONLD_PAGES, "doc_id long, html string")
    sp = sorted(map(tuple,
                    embedded_jsonld_df(df, binary=False).collect()))
    con = duckdb.connect()
    con.execute("CREATE TABLE t (doc_id BIGINT, html TEXT)")
    con.executemany("INSERT INTO t VALUES (?, ?)", JSONLD_PAGES)
    dk = sorted(map(tuple, con.sql(
        embedded_jsonld_sql("SELECT doc_id, html FROM t")).fetchall()))
    assert sp == dk


def test_embedded_jsonld_validate_composition(spark):
    """Extraction feeds the engine's VARIANT validator directly:
    malformed islands are data (valid=false), typed blocks validate."""
    from jsonschema_spark.operators.htmltext import embedded_jsonld_df
    from jsonschema_spark.operators.validate import validate

    df = spark.createDataFrame(JSONLD_PAGES, "doc_id long, html string")
    blocks = embedded_jsonld_df(df, binary=False)
    out = validate(blocks, {"type": "object", "required": ["@type"]},
                   doc_col="jsonld")
    got = {(r["doc_id"], r["block_idx"]): r["valid"] for r in out.collect()}
    assert got == {(0, 0): True, (0, 1): True, (2, 0): False, (3, 0): True}
