"""HTTP response-header cache semantics → recrawl routing.

A crawl stores the raw response headers next to the payload (WARC
response records carry them verbatim); RFC 9111 cache directives are
the server's OWN statement of how long the page stays fresh, and a
recrawl scheduler that ignores them refetches immutable assets and
caches volatile ones. This module turns the header blob into the
routing decision — pure codegen regex over one string column, no
Python, no shuffles.

Design notes:
- Directives are read ONLY from their own header line ((?m)^name: ...)
  — a body or unrelated header containing the literal "no-store" must
  not flip the policy.
- The Expires date is re-rendered to an ISO string by pure regex + a
  12-way month CASE — no engine date parsing, so the DuckDB oracle is
  bit-stable (engine timestamp parsing differs in locale/tz handling;
  see the naive-timestamp trap in CLAUDE.md).
- max-age is try_cast'ed: an adversarial max-age=99999999999999999999
  yields NULL, never a task-killing ANSI error (same contract as
  sources/warc.py Content-Length).

Reference analogue: the reference's HTTP resolver honors registry
caching for ``$ref`` fetches (src/core http surface); here it is the
data-plane operator the recrawl scheduler consumes.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

MONTHS = ("jan", "feb", "mar", "apr", "may", "jun",
          "jul", "aug", "sep", "oct", "nov", "dec")

# RFC 7231 IMF-fixdate, lowercased: 'wed, 21 oct 2015 07:28:00 gmt'
_EXPIRES_RE = (r"(?m)^expires:\s*[a-z]{3}, "
               r"(\d{2}) ([a-z]{3}) (\d{4}) (\d{2}:\d{2}:\d{2}) gmt")


def month_num(mon: Column) -> Column:
    """3-letter month name (lowercase) → zero-padded '01'..'12'."""
    out = F.lit(None).cast("string")
    expr = None
    for i, m in enumerate(MONTHS, start=1):
        cond = mon == m
        val = F.lit(f"{i:02d}")
        expr = F.when(cond, val) if expr is None else expr.when(cond, val)
    return expr.otherwise(out)


def cache_policy_df(
    df: DataFrame, id_col: str, headers_col: str
) -> DataFrame:
    """Per-response cache policy: (id, max_age_s, no_store, no_cache,
    private, has_etag, has_last_modified, expires_iso, policy).

    ``policy`` is the recrawl route:
    - 'no-cache'   — no-store / no-cache / max-age=0: fetch fresh;
    - 'hourly' / 'daily' / 'weekly' — max-age buckets (<1h, <1d, ≥1d);
    - 'expires'    — only an Expires date given (compare downstream);
    - 'conditional'— ETag / Last-Modified present: revalidate cheaply
      with If-None-Match / If-Modified-Since;
    - 'unknown'    — server said nothing; heuristic recrawl.
    """
    hl = F.lower(F.col(headers_col))
    cc = F.regexp_extract(hl, r"(?m)^cache-control:([^\r\n]*)", 1)
    ma_str = F.regexp_extract(cc, r"max-age=(\d+)", 1)
    max_age = F.when(ma_str != "", ma_str.try_cast("long"))
    no_store = F.contains(cc, F.lit("no-store"))
    no_cache = F.contains(cc, F.lit("no-cache"))
    private = F.contains(cc, F.lit("private"))
    has_etag = hl.rlike(r"(?m)^etag:")
    has_lm = hl.rlike(r"(?m)^last-modified:")
    dd = F.regexp_extract(hl, _EXPIRES_RE, 1)
    mon = F.regexp_extract(hl, _EXPIRES_RE, 2)
    yyyy = F.regexp_extract(hl, _EXPIRES_RE, 3)
    hms = F.regexp_extract(hl, _EXPIRES_RE, 4)
    expires_iso = F.when(
        (dd != "") & month_num(mon).isNotNull(),
        F.concat(yyyy, F.lit("-"), month_num(mon), F.lit("-"), dd,
                 F.lit(" "), hms))
    policy = (
        F.when(no_store | no_cache | (max_age == 0), F.lit("no-cache"))
        .when(max_age < 3600, F.lit("hourly"))
        .when(max_age < 86400, F.lit("daily"))
        .when(max_age.isNotNull(), F.lit("weekly"))
        .when(expires_iso.isNotNull(), F.lit("expires"))
        .when(has_etag | has_lm, F.lit("conditional"))
        .otherwise(F.lit("unknown"))
    )
    return df.where(F.col(headers_col).isNotNull()).select(
        F.col(id_col),
        max_age.alias("max_age_s"),
        no_store.cast("long").alias("no_store"),
        no_cache.cast("long").alias("no_cache"),
        private.cast("long").alias("private"),
        has_etag.cast("long").alias("has_etag"),
        has_lm.cast("long").alias("has_last_modified"),
        expires_iso.alias("expires_iso"),
        policy.alias("policy"),
    )
