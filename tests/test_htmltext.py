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
