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


def apply_steps(col: Column, steps=STEPS) -> Column:
    """Apply a (kind, pattern, replacement) step chain to a Column."""
    out = col
    for kind, pat, rep in steps:
        if kind == "re":
            out = F.regexp_replace(out, pat, rep)
        else:
            out = F.replace(out, F.lit(pat), F.lit(rep))
    return out


def extract_text_html(html_col: Column, *, binary: bool = True) -> Column:
    """Extracted plain text from an HTML column, null-in-null-out.

    ``binary=True`` (the table shape) UTF-8-decodes first. Pure JVM:
    one codegen projection, applicable inside any scan."""
    return apply_steps(F.decode(html_col, "UTF-8") if binary else html_col)


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
    return steps_sql(expr, STEPS)


def steps_sql(expr: str, steps) -> str:
    """DuckDB expression applying a step chain to ``expr``."""
    out = expr
    for kind, pat, rep in steps:
        if kind == "re":
            out = f"regexp_replace({out}, {_sql_quote(pat)}, {_sql_quote(rep)}, 'g')"
        else:
            out = f"replace({out}, {_sql_quote(pat)}, {_sql_quote(rep)})"
    return out


# --- main-content extraction (text-density heuristic) --------------------------

# the block boundary is STEPS[4]'s tag set; PRE drops invisible content,
# POST turns one block fragment into normalized text
PRE_STEPS = STEPS[:4]
BLOCK_SPLIT_RE = STEPS[4][1]
POST_STEPS = STEPS[5:]
ANCHOR_INNER_RE = r"(?is)<a\b[^>]*>(.*?)</a\s*>"


def main_content_df(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    *,
    binary: bool = True,
    min_chars: int = 25,
    max_link_density_ppm: int = 330_000,
) -> DataFrame:
    """Main-content extraction — the boilerpipe/jusText/trafilatura core
    heuristic that generic tag stripping (html_text_df) deliberately is
    not: navigation, footers and link farms are short and link-dense,
    article prose is long and link-sparse. Blocks (split at the same
    block-tag boundary the generic chain turns into newlines) are KEPT
    when text length ≥ ``min_chars`` AND link density ≤
    ``max_link_density_ppm``, where link density =
    floor(1e6 · anchor-text chars / block chars) — anchor text measured
    on the tag-stripped ``<a>`` inner content, both lengths after the
    SAME normalization chain, so the ratio is engine-exact.

    Every input doc survives (null html / zero kept blocks → NULL
    main_text, counts 0 — the dup_span_remove contract).

    Output: (id_col, main_text, n_blocks_total, n_blocks_kept, n_chars);
    blocks rejoin in document order separated by newlines;
    n_blocks_total counts non-empty blocks.

    Scale shape: one pure-JVM projection (PRE chain + split) → ONE
    posexplode → per-block codegen stats → ONE groupBy(id) whose
    conditional collect_list reassembles kept blocks (text shuffles
    once, inherent to reassembly) → left join back to the input ids.
    Zero Python anywhere.
    """
    src = F.decode(F.col(html_col), "UTF-8") if binary else F.col(html_col)
    pre = apply_steps(src, PRE_STEPS)
    ex = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(pre, BLOCK_SPLIT_RE)).alias("_pos", "_b"),
    )
    block_text = apply_steps(F.col("_b"), POST_STEPS)
    anchor_text = apply_steps(
        F.array_join(
            F.regexp_extract_all(F.col("_b"), F.lit(ANCHOR_INNER_RE), 1), " "
        ),
        POST_STEPS,
    )
    st = ex.select(
        "_id", "_pos",
        block_text.alias("_t"),
        F.length(block_text).alias("_bl"),
        F.length(anchor_text).alias("_al"),
    ).withColumn(
        "_ppm",
        F.when(F.col("_bl") > 0,
               F.floor(F.col("_al") * F.lit(1_000_000) / F.col("_bl")))
        .cast("long"),
    ).withColumn(
        "_keep",
        (F.col("_bl") >= min_chars)
        & (F.col("_ppm") <= max_link_density_ppm),
    )
    agg = st.groupBy("_id").agg(
        F.sum((F.col("_bl") > 0).cast("long")).alias("n_blocks_total"),
        F.sum(F.col("_keep").cast("long")).alias("n_blocks_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.when(F.col("_keep"),
                               F.struct(F.col("_pos"), F.col("_t")))
                    )
                ),
                lambda s: s["_t"],
            ),
            "\n",
        ).alias("_mt"),
    )
    return (
        df.select(F.col(id_col))
        .join(agg, F.col(id_col) == F.col("_id"), "left")
        .select(
            id_col,
            F.when(F.col("n_blocks_kept") > 0, F.col("_mt")).alias("main_text"),
            F.coalesce("n_blocks_total", F.lit(0)).cast("long")
            .alias("n_blocks_total"),
            F.coalesce("n_blocks_kept", F.lit(0)).cast("long")
            .alias("n_blocks_kept"),
            F.coalesce(
                F.when(F.col("n_blocks_kept") > 0, F.length("_mt")), F.lit(0)
            ).cast("long").alias("n_chars"),
        )
    )


def main_content_sql(src: str, min_chars: int = 25,
                     max_link_density_ppm: int = 330_000) -> str:
    """DuckDB mirror over a CTE body producing (doc_id, html TEXT)."""
    pre = steps_sql("html", PRE_STEPS)
    post_t = steps_sql("blk", POST_STEPS)
    # DuckDB: regexp_extract_all + array_to_string yields NULL (not '')
    # when nothing matches — Spark's array_join yields '' — so coalesce
    # or every anchor-free block scores a NULL density and gets dropped
    post_a = steps_sql(
        "coalesce(array_to_string(regexp_extract_all(blk, "
        f"{_sql_quote(ANCHOR_INNER_RE)}, 1), ' '), '')",
        POST_STEPS,
    )
    return f"""
WITH h AS (SELECT doc_id, {pre} AS pre FROM ({src})),
bl0 AS (SELECT doc_id,
               string_split_regex(pre, {_sql_quote(BLOCK_SPLIT_RE)}) AS bls
        FROM h),
b AS (SELECT doc_id, i AS pos, bls[i] AS blk
      FROM bl0, LATERAL (SELECT unnest(range(1, len(bls)+1)) AS i) ix),
s AS (SELECT doc_id, pos, {post_t} AS t, {post_a} AS at FROM b),
k AS (SELECT doc_id, pos, t, length(t) AS bl,
             CASE WHEN length(t) > 0
                  THEN floor(length(at) * 1000000 / length(t))::BIGINT
             END AS ppm
      FROM s),
a AS (SELECT doc_id,
             count(*) FILTER (WHERE bl > 0)::BIGINT AS n_blocks_total,
             count(*) FILTER (WHERE bl >= {min_chars}
                              AND ppm <= {max_link_density_ppm})::BIGINT
                 AS n_blocks_kept,
             string_agg(t, chr(10) ORDER BY pos)
                 FILTER (WHERE bl >= {min_chars}
                         AND ppm <= {max_link_density_ppm}) AS mt
      FROM k GROUP BY 1)
SELECT d.doc_id,
       CASE WHEN coalesce(a.n_blocks_kept, 0) > 0 THEN a.mt END AS main_text,
       coalesce(a.n_blocks_total, 0)::BIGINT AS n_blocks_total,
       coalesce(a.n_blocks_kept, 0)::BIGINT AS n_blocks_kept,
       coalesce(CASE WHEN a.n_blocks_kept > 0 THEN length(a.mt) END, 0)::BIGINT
           AS n_chars
FROM (SELECT doc_id FROM ({src})) d LEFT JOIN a USING (doc_id)"""


# --- charset detection (the decode step for html:binary) -----------------------

_META_CHARSET_RE = r'(?i)<meta\s+charset\s*=\s*["\x27]?([A-Za-z0-9_\-]+)'
_META_HTTP_EQUIV_RE = r'(?i)content\s*=\s*["\x27][^"\x27]*charset=([A-Za-z0-9_\-]+)'
_XML_DECL_RE = r'(?i)<\?xml[^>]*encoding\s*=\s*["\x27]([A-Za-z0-9_\-]+)'

# minimal alias normalization, mirrored verbatim in the oracle CASE
_CHARSET_ALIASES = (
    ("utf8", "utf-8"),
    ("latin-1", "iso-8859-1"),
    ("latin1", "iso-8859-1"),
    ("iso8859-1", "iso-8859-1"),
    ("win-1252", "windows-1252"),
    ("cp1252", "windows-1252"),
)


def charset_guess(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    *,
    binary: bool = True,
    sniff_bytes: int = 4096,
) -> DataFrame:
    """Charset detection for crawled pages — the step BEFORE any decode
    of an ``html:binary`` column (decoding with the wrong charset
    corrupts every downstream text operator silently).

    Detection order (WHATWG-encoding-flavored, documented subset):
    1. byte-order mark (UTF-8 / UTF-16 LE/BE) — authoritative;
    2. ``<meta charset=…>`` (HTML5), then the legacy http-equiv
       ``content=…charset=…`` form, then an XML-declaration encoding,
       all searched in the first ``sniff_bytes`` bytes decoded as
       ISO-8859-1 (every byte maps to a char, so the sniff itself can
       never throw);
    3. default ``utf-8``.
    Declared names are lowercased and alias-normalized (utf8 → utf-8,
    latin1/iso8859-1 → iso-8859-1, cp1252 → windows-1252).

    Output: (id_col, bom, charset_declared, charset). Pure codegen scan
    projection — zero Python, zero shuffles.

    ``binary=False`` accepts a string column (BOM = a leading U+FEFF) —
    the oracle-replayable path; the byte path is pytest-pinned.
    """
    raw = F.col(html_col)
    if binary:
        head = F.hex(F.substring(raw, 1, 4))
        bom = (
            F.when(head.startswith("EFBBBF"), "utf-8")
            .when(head.startswith("FFFE"), "utf-16le")
            .when(head.startswith("FEFF"), "utf-16be")
        )
        sniff = F.decode(F.substring(raw, 1, sniff_bytes), "ISO-8859-1")
    else:
        bom = F.when(F.substring(raw, 1, 1) == "﻿", "utf-8")
        sniff = F.substring(raw, 1, sniff_bytes)
    declared = F.lower(
        F.coalesce(
            *[
                F.when(F.regexp_extract(sniff, pat, 1) != "",
                       F.regexp_extract(sniff, pat, 1))
                for pat in (_META_CHARSET_RE, _META_HTTP_EQUIV_RE,
                            _XML_DECL_RE)
            ]
        )
    )
    norm = declared
    for alias, canon in _CHARSET_ALIASES:
        norm = F.when(declared == alias, canon).otherwise(norm)
    return df.select(
        F.col(id_col),
        bom.alias("bom"),
        declared.alias("charset_declared"),
        F.coalesce(bom, norm, F.lit("utf-8")).alias("charset"),
    )


def charset_guess_sql(src: str, sniff_bytes: int = 4096) -> str:
    """DuckDB mirror over a CTE body producing (doc_id, html TEXT) —
    the string path (binary=False)."""
    aliases = " ".join(
        f"WHEN '{a}' THEN '{c}'" for a, c in _CHARSET_ALIASES
    )
    pats = (_META_CHARSET_RE, _META_HTTP_EQUIV_RE, _XML_DECL_RE)
    decl = "coalesce(" + ", ".join(
        f"nullif(regexp_extract(sniff, {_sql_quote(p)}, 1), '')" for p in pats
    ) + ")"
    return f"""
WITH s AS (SELECT doc_id,
                  CASE WHEN substr(html, 1, 1) = chr(65279)
                       THEN 'utf-8' END AS bom,
                  substr(html, 1, {sniff_bytes}) AS sniff
           FROM ({src})),
d AS (SELECT doc_id, bom, lower({decl}) AS declared FROM s)
SELECT doc_id, bom, declared AS charset_declared,
       coalesce(bom, CASE declared {aliases} ELSE declared END,
                'utf-8') AS charset
FROM d"""


# --- page metadata: title / meta description / html lang / robots meta /
# --- rel=canonical ------------------------------------------------------
#
# The crawl-curation steps between fetch and text extraction: page-level
# indexing consent (<meta name="robots">), duplicate-cluster hints
# (<link rel="canonical">), and the title/description/lang fields every
# corpus card reports. Reference analogue: none (the reference validates
# documents, it does not crawl) — this is §2.10 webtext-pipeline surface.
#
# Same cross-engine contract as STEPS: every pattern below is RE2∩Java
# safe (inline (?is), non-greedy .*?, no lookaround/backrefs) and is
# shared VERBATIM with the DuckDB oracle via html_meta_sql(). Attribute
# order and quote style both vary in the wild, so each attribute field is
# a coalesce over (name-first, content-first) pattern variants; a miss is
# NULL (nullif(.,'')), never an error.

TITLE_RE = r"(?is)<title\b[^>]*>(.*?)</title"
HTML_LANG_RE = r"(?is)<html\b[^>]*?\blang\s*=\s*[\"']?([A-Za-z][A-Za-z0-9-]*)"
CANONICAL_RES = (
    r"(?is)<link\b[^>]*\brel\s*=\s*[\"']canonical[\"'][^>]*"
    r"\bhref\s*=\s*[\"']([^\"'>]+)",
    r"(?is)<link\b[^>]*\bhref\s*=\s*[\"']([^\"'>]+)[\"'][^>]*"
    r"\brel\s*=\s*[\"']canonical",
)
_META_NAME_FIRST = (
    r"(?is)<meta\b[^>]*\bname\s*=\s*[\"']{name}[\"'][^>]*"
    r"\bcontent\s*=\s*[\"']([^\"'>]*)"
)
_META_CONTENT_FIRST = (
    r"(?is)<meta\b[^>]*\bcontent\s*=\s*[\"']([^\"'>]*)[\"'][^>]*"
    r"\bname\s*=\s*[\"']{name}[\"']"
)
# robots-meta directives are comma-separated tokens; 'none' == noindex +
# nofollow (Google/Bing documented semantics).
ROBOTS_NOINDEX_RE = r"(^|[ ,;])(noindex|none)([ ,;]|$)"
ROBOTS_NOFOLLOW_RE = r"(^|[ ,;])(nofollow|none)([ ,;]|$)"

# Entity decode + title-style whitespace fold (newlines INCLUDED -> one
# space) — the entity block of STEPS plus a flat \s+ fold.
META_TEXT_STEPS: tuple[tuple[str, str, str], ...] = STEPS[6:13] + (
    ("re", r"\s+", " "),
    ("re", r"^\s+|\s+$", ""),
)


def meta_content_res(name: str) -> tuple[str, str]:
    """(name-first, content-first) extraction patterns for a meta tag."""
    return (_META_NAME_FIRST.format(name=name),
            _META_CONTENT_FIRST.format(name=name))


def _first_extract(col: Column, pats) -> Column:
    """First non-empty group-1 match across patterns; NULL if none."""
    return F.coalesce(
        *[F.nullif(F.regexp_extract(col, p, 1), F.lit("")) for p in pats],
        F.lit(None).cast("string"),
    )


def html_meta_df(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    *,
    binary: bool = True,
    keep_cols: tuple = (),
) -> DataFrame:
    """Per-page metadata: (id, title, meta_description, html_lang,
    robots_meta, noindex, nofollow, canonical_href).

    Pure codegen scan projection — zero Python, zero shuffles; streams at
    parquet-scan speed on any cluster size. title/meta_description are
    entity-decoded and whitespace-folded (META_TEXT_STEPS); html_lang and
    robots_meta are lowercased; noindex/nofollow implement the
    comma-token directive semantics incl. ``none``; canonical_href is the
    RAW attribute value (resolve with :func:`resolve_href`).
    """
    h = F.decode(F.col(html_col), "UTF-8") if binary else F.col(html_col)
    robots = F.lower(_first_extract(h, meta_content_res("robots")))
    return df.select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        apply_steps(_first_extract(h, (TITLE_RE,)),
                    META_TEXT_STEPS).alias("title"),
        apply_steps(_first_extract(h, meta_content_res("description")),
                    META_TEXT_STEPS).alias("meta_description"),
        F.lower(_first_extract(h, (HTML_LANG_RE,))).alias("html_lang"),
        robots.alias("robots_meta"),
        F.coalesce(robots.rlike(ROBOTS_NOINDEX_RE),
                   F.lit(False)).alias("noindex"),
        F.coalesce(robots.rlike(ROBOTS_NOFOLLOW_RE),
                   F.lit(False)).alias("nofollow"),
        _first_extract(h, CANONICAL_RES).alias("canonical_href"),
    )


def resolve_href(href: Column, base_url: Column) -> Column:
    """Resolve an extracted href against the page URL — absolute,
    protocol-relative (``//host/…``) and root-relative (``/path``) forms;
    path-relative forms (rare for rel=canonical) resolve to NULL so the
    caller's coalesce falls back to the page URL itself. Pure codegen.
    """
    from .urltools import url_parts

    parts = url_parts(base_url)
    is_abs = href.rlike(r"^[A-Za-z][A-Za-z0-9+.-]*://")
    return (
        F.when(href.isNull(), F.lit(None).cast("string"))
        .when(is_abs, href)
        .when(href.startswith("//"),
              F.concat(F.lower(parts["scheme"]), F.lit(":"), href))
        .when(href.startswith("/"),
              F.concat(F.lower(parts["scheme"]), F.lit("://"),
                       F.lower(parts["host"]), href))
        .otherwise(F.lit(None).cast("string"))
    )


def canonical_dedup_df(
    df: DataFrame,
    id_col: str = "doc_id",
    url_col: str = "url",
    html_col: str = "html",
    *,
    binary: bool = True,
) -> DataFrame:
    """Canonical-URL duplicate clustering: every page maps to its
    normalized rel=canonical target (falling back to its own normalized
    URL when the tag is absent or path-relative), then ONE groupBy per
    target keeps the smallest (id, url) representative and counts the
    cluster — the crawl-dedup step that collapses print/mobile/tracking
    variants BEFORE any content hashing.

    Output: (canon_url, n_pages, keep_id, keep_url). Scale shape: scan
    projection + one map-side-partial groupBy on the canonical target —
    no joins, no windows; skewed mega-clusters aggregate, never explode.
    """
    meta = html_meta_df(
        df, id_col, html_col, binary=binary, keep_cols=(url_col,))
    from .urltools import normalize_url

    target = normalize_url(
        F.coalesce(
            resolve_href(F.col("canonical_href"), F.col(url_col)),
            F.col(url_col),
        )
    )
    return (
        meta.select(
            target.alias("canon_url"),
            F.struct(F.col(id_col).alias("i"),
                     F.col(url_col).alias("u")).alias("rep"),
        )
        .groupBy("canon_url")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.min("rep").alias("rep"),
        )
        .select(
            "canon_url", "n_pages",
            F.col("rep.i").alias("keep_id"),
            F.col("rep.u").alias("keep_url"),
        )
    )


def html_meta_sql(src: str) -> str:
    """DuckDB mirror of html_meta_df over a CTE body producing
    (doc_id, html TEXT) — same pattern constants, same coalesce order,
    same entity/whitespace steps (META_TEXT_STEPS via steps_sql)."""
    def first(pats):
        return "coalesce(" + ", ".join(
            f"nullif(regexp_extract(html, {_sql_quote(p)}, 1), '')"
            for p in pats) + ")"

    title = steps_sql(first((TITLE_RE,)), META_TEXT_STEPS)
    desc = steps_sql(first(meta_content_res("description")),
                     META_TEXT_STEPS)
    robots = f"lower({first(meta_content_res('robots'))})"
    return f"""
SELECT doc_id,
       {title} AS title,
       {desc} AS meta_description,
       lower({first((HTML_LANG_RE,))}) AS html_lang,
       {robots} AS robots_meta,
       coalesce(regexp_matches({robots},
                {_sql_quote(ROBOTS_NOINDEX_RE)}), false) AS noindex,
       coalesce(regexp_matches({robots},
                {_sql_quote(ROBOTS_NOFOLLOW_RE)}), false) AS nofollow,
       {first(CANONICAL_RES)} AS canonical_href
FROM ({src})"""


# --- embedded structured data: <script type="application/ld+json"> -------
#
# The jsonschema × webtext composition point: crawled pages CARRY JSON
# documents (schema.org JSON-LD islands), and the engine's VARIANT
# validator consumes them directly — extract_blocks → validate(doc_col=)
# → violation rows, all inside one Spark plan. Reference analogue:
# `jsonschema validate` over .json instance files; here the instances
# live inside the html column of the crawl table.

JSONLD_SCRIPT_RE = (
    r"(?is)<script\b[^>]*\btype\s*=\s*[\"']application/ld\+json[\"']"
    r"[^>]*>(.*?)</script"
)


def embedded_jsonld_df(
    df: DataFrame,
    id_col: str = "doc_id",
    html_col: str = "html",
    *,
    binary: bool = True,
) -> DataFrame:
    """One row per embedded JSON-LD block: (id, block_idx 0-based,
    jsonld string — RAW block text, whitespace preserved; parse/validate
    downstream so malformed islands are data, not errors).

    Plain <script> JS blocks never match (the type attribute is part of
    the pattern). Pure codegen: regexp_extract_all + ONE posexplode —
    zero Python, zero shuffles; pages without blocks emit no rows."""
    h = F.decode(F.col(html_col), "UTF-8") if binary else F.col(html_col)
    blocks = F.regexp_extract_all(h, F.lit(JSONLD_SCRIPT_RE), F.lit(1))
    return df.select(
        F.col(id_col), F.posexplode(blocks).alias("block_idx", "jsonld")
    ).select(
        id_col, F.col("block_idx").cast("long").alias("block_idx"), "jsonld"
    )


def embedded_jsonld_sql(src: str) -> str:
    """DuckDB mirror over (doc_id, html TEXT): same pattern, 0-based
    ordinality via the LATERAL-range idiom."""
    return f"""
SELECT doc_id, (ix.i - 1)::BIGINT AS block_idx, bs[ix.i] AS jsonld
FROM (SELECT doc_id,
             regexp_extract_all(html, {_sql_quote(JSONLD_SCRIPT_RE)}, 1) AS bs
      FROM ({src})),
     LATERAL (SELECT unnest(range(1, len(bs) + 1)) AS i) ix"""
