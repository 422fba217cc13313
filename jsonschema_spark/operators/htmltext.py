"""Generic HTML -> text extraction, Spark-first.

The north-rule input table carries ``html:binary`` next to ``text:string``
with a per-row invariant "byte-identical extracted text per url"
(BASELINE.json input_hint). ``sources/pages.py:extract_text`` handles the
synthetic fixed-wrapper payload byte-exactly; THIS module is the general
extractor for real crawl HTML — the trafilatura/resiliparse step of a
webtext pipeline, re-expressed as a deterministic regex chain.

Scale shape: the WHOLE extraction is a fixed sequence of JVM
``regexp_replace``/``replace`` calls inside the scan projection — zero
Python, zero shuffles, fully codegen, streams at parquet-scan speed on a
1000-executor cluster. No DOM is built (a DOM parser is per-row Python —
the 10-100x-slower path this engine reserves for semantics regex cannot
express).

Cross-engine contract: the step list ``STEPS`` below is the single source
of truth — the Spark path and the DuckDB oracle (``html_text_sql``) apply
the SAME pattern strings in the SAME order. Only RE2∩Java-safe constructs
are used (no backreferences, no lookaround; inline ``(?is)`` flags and
non-greedy ``.*?`` are common to both engines). Replacements are literals
(never group refs), so ``$1``-vs-``\\1`` dialect differences cannot bite.

Extraction semantics (documented order):
1.  drop HTML comments ``<!-- ... -->`` (first, so commented-out markup
    never reaches later steps);
2.  drop ``<script>``/``<style>`` elements INCLUDING their content;
3.  drop the whole ``<head>`` element (title/meta are metadata, not text);
4.  block-level open/close tags become a newline (paragraph structure
    survives extraction — quality signals downstream use line shape);
5.  every remaining tag is stripped;
6.  the five core named entities + ``&nbsp;`` are decoded, ``&amp;``
    LAST so double-encoded text decodes one level only (HTML semantics);
7.  whitespace is normalized: horizontal runs -> one space, runs
    containing a newline -> one newline, leading/trailing trimmed.

Documented limits (regex-chain, not a tokenizer): a raw ``<`` in TEXT
(spec-invalid HTML — must be ``&lt;``) can eat up to the next ``>``; an
attribute value containing a literal ``>`` ends the tag early; numeric
character references beyond ``&#39;`` pass through undecoded. Real crawl
extraction layers an HTML5 tokenizer over this; the chain is the
scan-speed approximation and every behavior above is deterministic.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# (kind, pattern-or-literal, replacement); kind: "re" or "lit".
# ORDER IS SEMANTICS — see module docstring. Shared verbatim with the
# DuckDB oracle via html_text_sql().
STEPS: tuple[tuple[str, str, str], ...] = (
    ("re", r"(?s)<!--.*?-->", " "),
    ("re", r"(?is)<script\b.*?</script\s*>", " "),
    ("re", r"(?is)<style\b.*?</style\s*>", " "),
    ("re", r"(?is)<head\b.*?</head\s*>", " "),
    ("re",
     r"(?i)</?(?:p|div|br|li|ul|ol|h[1-6]|tr|td|th|table|thead|tbody"
     r"|section|article|header|footer|nav|aside|blockquote|pre|hr|form"
     r"|dl|dt|dd|figure|figcaption)\b[^>]*>",
     "\n"),
    ("re", r"(?s)<[^>]*>", ""),
    ("lit", "&nbsp;", " "),
    ("lit", "&lt;", "<"),
    ("lit", "&gt;", ">"),
    ("lit", "&quot;", '"'),
    ("lit", "&#39;", "'"),
    ("lit", "&apos;", "'"),
    ("lit", "&amp;", "&"),   # LAST: &amp;lt; -> &lt;, one decode level
    ("re", r"[ \t\r\x0B\f]+", " "),
    ("re", r"\s*\n\s*", "\n"),
    ("re", r"^\s+|\s+$", ""),
)


def extract_text_html(html_col: Column, *, binary: bool = True) -> Column:
    """Extracted plain text from an HTML column, null-in-null-out.

    ``binary=True`` (the table shape) UTF-8-decodes first. Pure JVM:
    one codegen projection, applicable inside any scan."""
    out = F.decode(html_col, "UTF-8") if binary else html_col
    for kind, pat, rep in STEPS:
        if kind == "re":
            out = F.regexp_replace(out, pat, rep)
        else:
            out = F.replace(out, F.lit(pat), F.lit(rep))
    return out


def html_text_df(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    *,
    binary: bool = True,
) -> DataFrame:
    """(id, text_extracted, n_chars, n_lines) per row.

    n_lines counts newline-separated non-empty blocks (0 for empty/null),
    the block-structure signal step 4 preserves."""
    txt = extract_text_html(F.col(html_col), binary=binary)
    ext = F.coalesce(txt, F.lit(""))
    return df.select(
        F.col(id_col),
        txt.alias("text_extracted"),
        F.coalesce(F.length(txt), F.lit(0)).cast("long").alias("n_chars"),
        F.when(F.length(ext) == 0, F.lit(0))
         .otherwise(F.length(F.regexp_replace(ext, r"[^\n]", "")) + 1)
         .cast("long").alias("n_lines"),
    )


def _sql_quote(s: str) -> str:
    """DuckDB string literal for a pattern/replacement, newline-safe."""
    if s == "\n":
        return "chr(10)"
    return "'" + s.replace("'", "''") + "'"


def html_text_sql(expr: str) -> str:
    """DuckDB expression applying STEPS to ``expr`` — the oracle mirror.

    DuckDB regexp_replace needs the explicit 'g' option (Spark is global
    by default); patterns are passed verbatim."""
    out = expr
    for kind, pat, rep in STEPS:
        if kind == "re":
            out = f"regexp_replace({out}, {_sql_quote(pat)}, {_sql_quote(rep)}, 'g')"
        else:
            out = f"replace({out}, {_sql_quote(pat)}, {_sql_quote(rep)})"
    return out
