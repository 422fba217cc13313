"""Sitemap parsing (sitemaps.org XML) — the crawl-discovery counterpart
to robots.txt compliance (operators/robots.py).

A crawler's URL inventory for a host comes from its sitemaps: either a
urlset (``<url><loc>…</loc><lastmod>…</lastmod><priority>…</priority>``)
or a sitemapindex pointing at child sitemaps. This module extracts both
from a (host, xml) column pair with the same machinery the anchor-text
miner uses: whole ``<url>``/``<sitemap>`` elements found by ONE
``regexp_extract_all`` in the scan projection, per-element fields by
anchored lazy regexes — pure JVM, one explode, zero Python, zero
shuffles (RE2∩Java-safe patterns: ``(?is)`` + lazy ``.*?`` parse
identically in the DuckDB oracle).

Semantics (sitemaps.org protocol, documented simplifications):
- ``kind`` = 'url' for urlset entries, 'sitemap' for index entries —
  one pass handles mixed/malformed files; feed 'sitemap' rows back
  through fetch + this operator for the transitive closure;
- ``loc`` is entity-decoded for the XML-mandatory ``&amp;`` (the one
  entity legal in a URL) and trimmed; elements without a ``<loc>`` are
  dropped (they identify nothing);
- ``lastmod`` is kept as the raw W3C datetime string (cast downstream —
  oracle hashes compare strings bit-for-bit, timestamps would not);
- ``priority`` is floor-milli int (0.8 → 800); absent → NULL; the
  protocol default 0.5 is the CONSUMER's choice, not silently filled in.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

_ELEM_RE = r"(?is)<(?:url|sitemap)>(.*?)</(?:url|sitemap)>"
_SM_ELEM_RE = r"(?is)<sitemap>.*?</sitemap>"
_LOC_RE = r"(?is)<loc>\s*(.*?)\s*</loc>"
_LASTMOD_RE = r"(?is)<lastmod>\s*(.*?)\s*</lastmod>"
_PRIORITY_RE = r"(?is)<priority>\s*(.*?)\s*</priority>"


def _field(block: Column, pat: str) -> Column:
    v = F.regexp_extract(block, pat, 1)
    return F.when(v != "", v)


def sitemap_entries(
    df: DataFrame, host_col: str = "host", xml_col: str = "sitemap_xml"
) -> DataFrame:
    """Explode sitemap XML into (host, kind, loc, lastmod,
    priority_milli) rows — see module docstring for the contract."""
    ent = df.select(
        F.col(host_col).alias("host"),
        F.explode(
            F.regexp_extract_all(F.col(xml_col), F.lit(_ELEM_RE), 0)
        ).alias("_e"),
    )
    body = F.regexp_extract("_e", _ELEM_RE, 1)
    loc = _field(body, _LOC_RE)
    return ent.select(
        "host",
        F.when(F.lower(F.col("_e")).startswith("<sitemap"), F.lit("sitemap"))
        .otherwise(F.lit("url")).alias("kind"),
        F.replace(loc, F.lit("&amp;"), F.lit("&")).alias("loc"),
        _field(body, _LASTMOD_RE).alias("lastmod"),
        # try_cast: ANSI mode throws on a malformed priority string, and
        # one bad row must not kill a 100 TB scan
        F.floor(_field(body, _PRIORITY_RE).try_cast("double") * 1000)
        .cast("long").alias("priority_milli"),
    ).where(F.col("loc").isNotNull())


def sitemap_entries_sql(src: str) -> str:
    """DuckDB mirror over a CTE body producing (host, sitemap_xml)."""
    return f"""
SELECT host,
       CASE WHEN lower(e) LIKE '<sitemap%' THEN 'sitemap' ELSE 'url' END AS kind,
       replace(nullif(trim(regexp_extract(e, '{_LOC_RE}', 1)), ''),
               '&amp;', '&') AS loc,
       nullif(trim(regexp_extract(e, '{_LASTMOD_RE}', 1)), '') AS lastmod,
       floor(try_cast(nullif(trim(regexp_extract(e, '{_PRIORITY_RE}', 1)), '')
                      AS DOUBLE) * 1000)::BIGINT AS priority_milli
FROM (SELECT host, unnest(regexp_extract_all(sitemap_xml,
             '{_ELEM_RE}', 0)) AS e
      FROM ({src}))
WHERE nullif(trim(regexp_extract(e, '{_LOC_RE}', 1)), '') IS NOT NULL"""
