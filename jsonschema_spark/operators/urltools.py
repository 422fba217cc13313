"""URL canonicalization and host-level statistics for web-crawl curation.

The north-rule input table is Common-Crawl-style pages keyed by ``url``.
Before any url-keyed operation (exact url dedup, host-partitioned
boilerplate removal, per-domain sampling budgets) the url must be
CANONICALIZED — crawls carry the same page as ``HTTP://WWW.Example.com:80/a``
and ``http://www.example.com/a``. sourcemeta/jsonschema's table-scale story
(SURVEY.md §2.9: uniqueness + referential checks over url/host) assumes this
normalization exists; these operators provide it Spark-first.

Scale shape: every function here is a PURE COLUMN PROJECTION — regexp
parse + string ops inside the scan, zero shuffles, zero Python, fully
codegen. The only higher-order function (tracking-param filter) runs over
a handful of query params per row. ``host_stats`` adds exactly one
groupBy(registered_domain) with map-side partial aggregation.

Cross-engine contract: ONE regex (`_URL_RE`) with identical group numbers
and only RE2∩Java-safe constructs is used by both the Spark path and the
DuckDB oracle mirror, so normalized strings are byte-identical.

Normalization steps (documented order, each mirrored in the oracle):
1. lowercase scheme and host;
2. strip default ports (http:80, https:443); other ports kept;
3. collapse duplicate slashes in the PATH component; empty path -> "/";
4. drop tracking query params (utm_*, fbclid, gclid, msclkid), sort the
   survivors bytewise, re-join with "&"; empty query -> no "?";
5. drop the fragment.

``registered_domain`` matches the full Public Suffix List (ICANN section,
7380 rules; PRIVATE section opt-in via ``include_private=True``) shipped as
packaged data files under ``jsonschema_spark/data/`` (see PSL_LICENSE.md).
The match is a PURE COLUMN EXPRESSION: the rule sets are split by label
count into frozensets and probed via ``isin`` (Catalyst converts lists past
``inSetConversionThreshold`` into InSet — a single JVM hash-set probe per
candidate suffix, ~8 probes per row, zero shuffles, zero Python, no join).
If the data files are absent (stripped deployment), the legacy 16-entry
``TWO_LEVEL_SUFFIXES`` heuristic is the fallback.

PSL semantics implemented (https://publicsuffix.org/list/ algorithm):
exception rule (``!``) beats everything and makes the public suffix one
label shorter than the rule; otherwise the LONGEST matching rule wins,
where ``*.parent`` matches any single label under ``parent``; the default
rule ``*`` makes every unknown TLD its own public suffix. Registered
domain = public suffix + one label; a host that IS a public suffix (or
shorter) returns itself — total function, never NULL, never an error.
"""
from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, functions as F

_DATA_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "data")
PSL_ICANN_PATH = os.path.join(_DATA_DIR, "public_suffix_icann.dat")
PSL_PRIVATE_PATH = os.path.join(_DATA_DIR, "public_suffix_private.dat")

# RE2∩Java-safe absolute-URL parse (crawl URLs are always absolute
# http/https). Groups: 1 scheme, 2 host, 3 :port, 4 path, 5 ?query, 6 #frag.
_URL_RE = r"^([^:/?#]+)://([^/?#:]*)(:[0-9]+)?([^?#]*)(\?[^#]*)?(#.*)?$"

# tracking params dropped by step 4 (shared with the oracle mirror)
TRACKING_RE = r"^(utm_[^=]*|fbclid|gclid|msclkid)="

# legacy second-level suffix subset — FALLBACK ONLY, used when the packaged
# PSL data files are missing (see module docstring).
TWO_LEVEL_SUFFIXES = (
    "co.uk", "org.uk", "ac.uk", "gov.uk",
    "com.au", "net.au", "org.au",
    "co.jp", "ne.jp", "or.jp",
    "com.br", "com.cn", "com.mx", "co.in", "co.kr", "co.za",
)

_psl_cache: dict[bool, dict | None] = {}


def load_psl(include_private: bool = False) -> dict | None:
    """Parse the packaged Public Suffix List into label-count-keyed rule
    sets: ``{"exact": {k: frozenset}, "wild": {k: frozenset of parents},
    "exc": {k: frozenset}, "max_len": int}`` where ``max_len`` is the
    largest possible public-suffix length under these rules. 1-label exact
    rules are dropped — the default rule ``*`` already yields the same
    suffix length, so they change nothing. Returns None (→ legacy
    fallback) when the ICANN data file is absent. Cached per flag."""
    key = bool(include_private)
    if key in _psl_cache:
        return _psl_cache[key]
    paths = [PSL_ICANN_PATH] + ([PSL_PRIVATE_PATH] if include_private else [])
    if not os.path.exists(paths[0]):
        _psl_cache[key] = None
        return None
    exact: dict[int, set] = {}
    wild: dict[int, set] = {}
    exc: dict[int, set] = {}
    for p in paths:
        if not os.path.exists(p):
            continue
        with open(p, encoding="utf-8") as fh:
            for rule in fh:
                rule = rule.strip().lower()
                if not rule or rule.startswith("//"):
                    continue
                if rule.startswith("!"):
                    r = rule[1:]
                    exc.setdefault(r.count(".") + 1, set()).add(r)
                elif rule.startswith("*."):
                    r = rule[2:]
                    wild.setdefault(r.count(".") + 1, set()).add(r)
                else:
                    k = rule.count(".") + 1
                    if k >= 2:
                        exact.setdefault(k, set()).add(rule)
    max_len = max([1, *exact.keys(), *(k + 1 for k in wild.keys())])
    # TLDs that carry ANY multi-label rule (209 of ~1500 for the ICANN
    # list): a host whose last label is outside this set can only match
    # the default rule '*', so the probe chain short-circuits to the
    # default after ONE InSet probe — the fast path for the .com/.org
    # bulk of a crawl (measured 1.45x -> ~1.0x on host_stats, sf0.1).
    gate = {r.rsplit(".", 1)[-1]
            for d in (exact, wild, exc)
            for rules in d.values() for r in rules}
    psl = {
        "exact": {k: frozenset(v) for k, v in exact.items()},
        "wild": {k: frozenset(v) for k, v in wild.items()},
        "exc": {k: frozenset(v) for k, v in exc.items()},
        "max_len": max_len,
        "gate_tlds": frozenset(gate),
    }
    _psl_cache[key] = psl
    return psl


def psl_match_plan(include_private: bool = False) -> list[tuple[int, int]] | None:
    """The ordered probe plan shared by the Spark expression and the
    DuckDB oracle mirror: a list of (candidate_label_count, rule_kind)
    pairs where rule_kind 0=exception, 1=exact, 2=wildcard-parent —
    in match-precedence order (exceptions first, then longest-match
    descending). Both engines walk this identical plan, so registered
    domains agree byte-for-byte."""
    psl = load_psl(include_private)
    if psl is None:
        return None
    plan: list[tuple[int, int]] = []
    for k in sorted(psl["exc"], reverse=True):
        plan.append((k, 0))
    for k in range(psl["max_len"], 1, -1):
        if k in psl["exact"]:
            plan.append((k, 1))
        if (k - 1) in psl["wild"]:
            plan.append((k, 2))
    return plan


def _grp(url: Column, i: int) -> Column:
    return F.regexp_extract(url, _URL_RE, i)


def url_parts(url: Column) -> dict[str, Column]:
    """Parse an absolute URL into its components (unnormalized).

    Returns a dict of Column: scheme, host, port (string, '' if absent),
    path, query ('' if absent, no '?'), fragment ('' if absent, no '#').
    Non-matching strings parse to all-empty components (never null, never
    a task-killing error — one malformed row must not fail a 100 TB scan).
    """
    return {
        "scheme": _grp(url, 1),
        "host": _grp(url, 2),
        "port": F.when(_grp(url, 3) != "", F.substring(_grp(url, 3), 2, 10))
                 .otherwise(F.lit("")),
        "path": _grp(url, 4),
        "query": F.when(_grp(url, 5) != "",
                        F.substring(_grp(url, 5), 2, 1_000_000))
                  .otherwise(F.lit("")),
        "fragment": F.when(_grp(url, 6) != "",
                           F.substring(_grp(url, 6), 2, 1_000_000))
                     .otherwise(F.lit("")),
    }


def normalize_url(url: Column) -> Column:
    """Canonical form of ``url`` as one Column expression (steps 1-5 in the
    module docstring). Pure codegen projection; safe on malformed rows
    (regex no-match -> '://' skeleton, flagged by ``is_valid_url``)."""
    scheme = F.lower(_grp(url, 1))
    host = F.lower(_grp(url, 2))
    port = _grp(url, 3)  # ':NNN' or ''
    keep_port = (
        (port != "")
        & ~((scheme == F.lit("http")) & (port == F.lit(":80")))
        & ~((scheme == F.lit("https")) & (port == F.lit(":443")))
    )
    port_n = F.when(keep_port, port).otherwise(F.lit(""))
    path = _grp(url, 4)
    path_n = F.regexp_replace(path, "/{2,}", "/")
    path_n = F.when(path_n == "", F.lit("/")).otherwise(path_n)
    q = _grp(url, 5)  # '?a=1&b=2' or ''
    params = F.split(F.substring(q, 2, 1_000_000), "&")
    kept = F.array_sort(
        F.filter(params, lambda p: ~p.rlike(TRACKING_RE) & (p != ""))
    )
    q_n = F.when(
        (q != "") & (F.size(kept) > 0),
        F.concat(F.lit("?"), F.array_join(kept, "&")),
    ).otherwise(F.lit(""))
    return F.concat(scheme, F.lit("://"), host, port_n, path_n, q_n)


def is_valid_url(url: Column) -> Column:
    """True when the row parses as an absolute http(s) URL."""
    return F.lower(_grp(url, 1)).isin("http", "https") & (_grp(url, 2) != "")


def host_of(url: Column) -> Column:
    """Lowercased host component."""
    return F.lower(_grp(url, 2))


def _psl_column(host: Column, include_private: bool, want: str) -> Column:
    """Shared PSL matcher over a host Column: ``want`` selects the output
    — 'reg' (public suffix + 1 label) or 'ps' (the public suffix itself).
    One when-chain in plan precedence order; each branch is a guarded
    InSet probe over the last-k labels (substring_index — no array
    materialization). Short-circuits at the first (highest-precedence)
    match, ≤ ~8 probes/row over the ICANN list."""
    psl = load_psl(include_private)
    plan = psl_match_plan(include_private)
    n = F.size(F.split(host, r"\."))

    def lk(k: int) -> Column:
        # last k labels; whole host when the host has fewer than k labels
        return F.substring_index(host, ".", -k)

    kind_sets = {0: psl["exc"], 1: psl["exact"], 2: psl["wild"]}

    def inset(probe: Column, rules) -> Column:
        # Column.isin(*values) makes one py4j round trip PER literal —
        # ~5 s of driver time for the 7380-rule list. isInCollection
        # ships the whole list in ONE call (py4j auto-converts it to a
        # java.util.ArrayList) and plans the identical InSet probe.
        return Column(probe._jc.isInCollection(sorted(rules)))

    out = None
    for k, kind in plan:
        rules = kind_sets[kind].get(k if kind != 2 else k - 1)
        cond = (n >= k) & inset(lk(k if kind != 2 else k - 1), rules)
        if kind == 0:        # exception: public suffix = rule minus 1 label
            val = lk(k) if want == "reg" else lk(k - 1)
        else:                # exact/wildcard match of length k
            val = lk(k + 1) if want == "reg" else lk(k)
        out = F.when(cond, val) if out is None else out.when(cond, val)
    default = lk(2) if want == "reg" else lk(1)
    if out is None:
        return default
    # TLD fast-path gate: only ~200 TLDs carry multi-label rules; any
    # other last label can only hit the default rule '*'. CASE WHEN
    # short-circuits per row, so the .com/.org bulk of a crawl pays ONE
    # InSet probe instead of walking the whole precedence chain —
    # byte-identical output (a non-gated TLD matches no rule anyway).
    return F.when(~inset(lk(1), psl["gate_tlds"]), default) \
        .otherwise(out.otherwise(default))


def registered_domain(url: Column, include_private: bool = False) -> Column:
    """eTLD+1 under the full Public Suffix List (packaged ICANN section;
    ``include_private=True`` adds the PRIVATE section — github.io,
    blogspot.com, …): the unit of per-site statistics, skew salting and
    sampling budgets. 'www.' and other subdomain labels collapse into the
    registrable owner; ``org.uk`` / ``com.sg`` / ``*.ck``-style ccTLD
    registrations group correctly. Pure codegen projection (InSet probes,
    no join, no Python); falls back to the TWO_LEVEL_SUFFIXES heuristic
    only if the data file is missing."""
    host = host_of(url)
    if load_psl(include_private) is None:
        labels = F.split(host, r"\.")
        n = F.size(labels)
        last2 = F.concat_ws(".", F.element_at(labels, -2),
                            F.element_at(labels, -1))
        last3 = F.concat_ws(".", F.element_at(labels, -3),
                            F.element_at(labels, -2),
                            F.element_at(labels, -1))
        return (
            F.when(n <= 1, host)
            .when((n >= 3) & last2.isin(*TWO_LEVEL_SUFFIXES), last3)
            .otherwise(last2)
        )
    return _psl_column(host, include_private, "reg")


def public_suffix(url: Column, include_private: bool = False) -> Column:
    """The public suffix (eTLD) of the url's host under the packaged PSL
    — the part under which names are registrable ('co.uk' for
    'a.b.co.uk'). Same pure-projection matcher as registered_domain."""
    if load_psl(include_private) is None:
        raise FileNotFoundError(
            "public_suffix requires the packaged PSL data file "
            f"({PSL_ICANN_PATH})")
    return _psl_column(host_of(url), include_private, "ps")


def normalize_urls_df(
    df: DataFrame, url_col: str = "url", out_col: str = "url_norm"
) -> DataFrame:
    """Add (out_col, host, reg_domain) — one scan projection."""
    u = F.col(url_col)
    return df.withColumns({
        out_col: normalize_url(u),
        "host": host_of(u),
        "reg_domain": registered_domain(u),
    })


def host_stats_df(
    df: DataFrame,
    url_col: str = "url",
    size_col: str | None = None,
) -> DataFrame:
    """Per-registered-domain crawl statistics: page count, distinct
    canonical urls (exact url-level dedup size), and total payload bytes
    when ``size_col`` is given.

    ONE groupBy on reg_domain (map-side partials); the heavy-tailed host
    distribution of real crawls makes this the table you consult before
    choosing salting/sampling strategies — and it is itself skew-safe
    because count/countDistinct partials shrink each host to one row per
    task before the shuffle."""
    u = F.col(url_col)
    base = df.select(
        registered_domain(u).alias("reg_domain"),
        normalize_url(u).alias("_un"),
        *( [F.col(size_col).alias("_sz")] if size_col else [] ),
    )
    aggs = [
        F.count(F.lit(1)).alias("n_pages"),
        F.countDistinct("_un").alias("n_urls"),
    ]
    if size_col:
        aggs.append(F.sum("_sz").cast("long").alias("total_size"))
    return base.groupBy("reg_domain").agg(*aggs)


def url_dedup_df(
    df: DataFrame,
    url_col: str = "url",
    order_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Keep ONE row per canonical url — the crawl-recrawl discipline.

    The kept row is the lexicographic MAXIMUM of (order_cols..., remaining
    columns...) — e.g. order_cols=("warc_ts",) keeps the newest fetch,
    deterministic on ties via the remaining columns. Same shape as
    dedup.keep_latest: ONE groupBy
    max(struct(order, payload)) with map-side partials — no window sort,
    no shuffle of more than one surviving row per url per task."""
    cols = [c for c in df.columns]
    key = normalize_url(F.col(url_col)).alias("_uk")
    order = [F.col(c) for c in order_cols] + [
        F.col(c) for c in cols if c not in order_cols
    ]
    packed = df.select(key, F.struct(*order).alias("_row"))
    kept = packed.groupBy("_uk").agg(F.max("_row").alias("_row"))
    return kept.select(F.col("_uk").alias("url_norm"),
                       *[F.col(f"_row.{c}").alias(c) for c in cols])


def url_signature(url: Column) -> Column:
    """Structural signature of a URL path+query: digit runs → ``N``,
    long hex runs (ids/hashes, 8+) → ``H``, query VALUES → ``V`` (keys
    kept — they carry the structure). Two URLs share a signature iff
    they are the same *template* instantiated with different values —
    calendar pages, session ids, faceted-search permutations. Pure JVM."""
    path = F.regexp_extract(url, _URL_RE, 4)
    query = F.regexp_extract(url, _URL_RE, 5)
    sig = F.regexp_replace(path, r"[0-9a-fA-F]{8,}", "H")
    sig = F.regexp_replace(sig, r"[0-9]+", "N")
    q = F.regexp_replace(query, r"=[^&#]*", "=V")
    return F.concat(sig, q)


def crawler_traps_df(
    df: DataFrame,
    url_col: str = "url",
    min_urls: int = 100,
) -> DataFrame:
    """Crawler-trap / infinite-space detection: per (host, url-template
    signature), how many distinct URLs instantiate the template. A
    calendar widget, session-id space or faceted search explodes one
    signature into unbounded URLs — the classic crawl-frontier poison.
    Flag signatures with ≥ ``min_urls`` distinct instances and cap or
    skip them in the frontier.

    Output: (host, sig, n_urls, sample_url) — ``sample_url`` = the
    min() exemplar for triage.

    Scale shape: ONE groupBy on (host, sig) with map-side partials —
    the signature is in the key, so one pathological host cannot
    hot-spot a partition; count DISTINCT urls is exact via a (host,
    sig, url) pre-aggregate (the top_ngrams discipline)."""
    u = df.select(
        host_of(F.col(url_col)).alias("host"),
        url_signature(F.col(url_col)).alias("sig"),
        F.col(url_col).alias("_u"),
    )
    per_url = u.groupBy("host", "sig", "_u").agg(F.count(F.lit(1)).alias("_c"))
    return (
        per_url.groupBy("host", "sig")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_urls"),
            F.min("_u").alias("sample_url"),
        )
        .where(F.col("n_urls") >= min_urls)
    )


def frontier_interleave(
    df: DataFrame,
    url_col: str = "url",
    priority_col: str | None = None,
    host_col: str | None = None,
) -> DataFrame:
    """Politeness interleaving for a fetch frontier: order URLs so
    consecutive fetches hit DIFFERENT hosts — round k serves every
    host's k-th-best URL before any host's (k+1)-th. A priority-sorted
    frontier without this hammers one host with its whole budget (and a
    per-host rate limiter then idles the fleet).

    fetch_order = dense rank of (round, portable-host-hash, url) where
    round = row_number within host by (priority DESC, url). The host
    hash (md5-56) spreads hosts deterministically inside each round —
    oracle-replayable, unlike a JVM hashCode.

    Output: input columns + ``round`` + ``fetch_order`` (both 1-based).

    Scale shape: ONE window per host (hosts rank in parallel) + the
    global sequence via the zipWithIndex-on-sorted pattern — NEVER a
    single-partition row_number over the whole frontier (a crawl
    frontier is corpus-sized). The frontier is range-partitioned on
    (round, host-hash, url) so partitions hold contiguous key ranges,
    each partition numbers its own rows locally (parallel per-partition
    windows), and exact cumulative partition offsets (one tiny
    n_partitions-row aggregate, broadcast back) lift local numbers to
    the identical global sequence. The ranged intermediate is
    localCheckpoint-ed so partition ids stay stable between the offset
    count and the numbering pass.
    """
    from pyspark.sql.window import Window

    host = F.col(host_col) if host_col else host_of(F.col(url_col))
    prio = (F.col(priority_col).desc()
            if priority_col else F.col(url_col).asc())
    w = Window.partitionBy(host).orderBy(prio, F.col(url_col).asc())
    hh = F.conv(F.substring(F.md5(host), 1, 14), 16, 10).cast("long")
    out = (
        df.withColumn("round", F.row_number().over(w).cast("long"))
        .withColumn("_hh", hh)
    )
    n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        out.repartitionByRange(
            n_parts, F.col("round"), F.col("_hh"), F.col(url_col)
        )
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    offsets = (
        ranged.groupBy("_pid")
        .agg(F.count(F.lit(1)).alias("_cnt"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_cnt").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1
                    )
                ),
                F.lit(0),
            ).cast("long"),
        )
        .select("_pid", "_off")
    )
    wl = Window.partitionBy("_pid").orderBy(
        F.col("round").asc(), F.col("_hh").asc(), F.col(url_col).asc()
    )
    return (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn(
            "fetch_order",
            (F.row_number().over(wl).cast("long") + F.col("_off")),
        )
        .drop("_pid", "_off", "_hh")
    )


def snapshot_delta_df(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    hash_col: str,
) -> DataFrame:
    """Crawl-snapshot delta — the recrawl-scheduling primitive: per key
    (canonical url), classify what happened between two snapshots as
    ``new`` (only in the new snapshot), ``gone`` (only in the old),
    ``changed`` (both, different content hash) or ``unchanged``.

    Inputs must be key-unique (run ``url_dedup_df`` first — documented
    contract, not checked: a duplicate key would fan out the full-outer
    join). One shuffle-on-key full-outer join, AQE-skew-safe; combined
    with ``stats.kmv_sketch`` snapshot algebra this gives both the exact
    per-url ledger (this) and the sketch-sized overlap estimate (that)
    at either end of the cost spectrum.

    Output: (key_col, h_old, h_new, status)."""
    o = old.select(F.col(key_col).alias("_k"), F.col(hash_col).alias("h_old"))
    n = new.select(F.col(key_col).alias("_k"), F.col(hash_col).alias("h_new"))
    j = o.join(n, "_k", "full_outer")
    status = (
        F.when(F.col("h_old").isNull(), F.lit("new"))
        .when(F.col("h_new").isNull(), F.lit("gone"))
        .when(F.col("h_old") != F.col("h_new"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    return j.select(
        F.col("_k").alias(key_col), "h_old", "h_new", status.alias("status")
    )


def recrawl_priority(
    df: DataFrame,
    url_col: str = "url",
    snap_col: str = "snap_id",
    sig_col: str = "sig",
) -> DataFrame:
    """Per-URL change-rate estimation over a crawl-snapshot SERIES — the
    Cho & Garcia-Molina recrawl-scheduling input that ``snapshot_delta_df``
    (two snapshots) generalizes to: how often does this page change when
    we look at it?

    Input: one row per (url, snapshot) observation with a content
    signature — (url, snap) must be unique (run ``url_dedup_df`` per
    snapshot first, same documented contract as ``snapshot_delta_df``:
    conflicting sigs inside one snapshot make the lag order, and hence
    the change count, partitioning-dependent); a url absent from a
    snapshot simply has no row (missed
    fetches shrink n_obs, they do not fabricate changes — changes are
    counted between CONSECUTIVE OBSERVATIONS of the url, the estimator a
    sparse observation series supports).

    Output per url: (url, n_obs, n_changes, change_rate_ppm =
    1e6·n_changes/(n_obs−1), NULL when n_obs < 2, first_snap, last_snap,
    last_sig). Rate is the recrawl priority; combine with host politeness
    (frontier_schedule) downstream.

    Scale shape: ONE per-url window (lag over snap order — partitioned
    by the high-cardinality url key, never global) + ONE map-side-partial
    groupBy(url). Integer arithmetic throughout — oracle-replayable."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(url_col).orderBy(F.col(snap_col).asc())
    prev = F.lag(F.col(sig_col)).over(w)
    obs = df.select(
        F.col(url_col), F.col(snap_col), F.col(sig_col)
    ).withColumn(
        "_chg",
        F.when(prev.isNull(), F.lit(0))
        .when(prev != F.col(sig_col), F.lit(1)).otherwise(F.lit(0)),
    )
    g = obs.groupBy(url_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_obs"),
        F.sum("_chg").cast("long").alias("n_changes"),
        F.min(snap_col).cast("long").alias("first_snap"),
        F.max(snap_col).cast("long").alias("last_snap"),
        F.max(F.struct(F.col(snap_col).alias("s"),
                       F.col(sig_col).alias("g"))).alias("_last"),
    )
    return g.select(
        url_col, "n_obs", "n_changes",
        F.when(F.col("n_obs") >= 2,
               F.floor(F.col("n_changes") * 1_000_000
                       / (F.col("n_obs") - 1))
               .cast("long")).alias("change_rate_ppm"),
        "first_snap", "last_snap",
        F.col("_last.g").alias("last_sig"),
    )


def url_param_policy(
    df: DataFrame,
    url_col: str = "url",
    sig_col: str = "sig",
    min_support: int = 3,
    invariant_min_ppm: int = 950_000,
) -> DataFrame:
    """LEARN which query parameters are content-irrelevant (strip-safe)
    from content-signature evidence — the crawl-canonicalization step
    that turns ``?utm_source=…``/session-id noise into a per-host strip
    rule instead of a hand-maintained blocklist (normalize_url's
    TRACKING_RE covers only the universal offenders).

    Method (the classic "learning URL rewrite rules from duplicate
    content" setup, cf. Dasgupta/Kumar/Sasturkar, WWW 2008 — ours is the
    evidence-counting core): for each (host, param) take every BASE
    GROUP — URLs identical after removing that one param (other params
    bytewise-sorted so order noise doesn't split groups) — having ≥2
    distinct URL variants. The group is INVARIANT when all variants
    share one content signature. A param is strip-safe for the host
    when ≥ ``min_support`` evidence groups exist and ≥
    ``invariant_min_ppm`` of them are invariant.

    Input contract: ``sig_col`` is a content signature (hash of the
    EXTRACTED text, not raw bytes, so ads/timestamps don't defeat the
    invariance test — pair with htmltext + hash56 upstream); refetches
    of one URL are collapsed to min(sig) first, so an unstable page
    (sig churn across fetches) conservatively reads as one signature
    per URL and cannot FAKE invariance across different URLs.

    Output per (host, param): n_groups, n_invariant, invariant_ppm
    (floor 1e6·n_invariant/n_groups), strip_safe boolean.

    Scale shape: one pre-groupBy(url) collapse, ONE bounded explode
    (distinct param keys per URL — a handful), two map-side-partial
    groupBys keyed (host,param,base) then (host,param). The HOF
    filter/sort runs over the per-row param array (≤ tens of elements);
    no window, no self-join, no Python. At crawl scale the
    (host,param,base) key is near-unique → partial aggregation shrinks
    each group to one row per task before the shuffle."""
    u = F.col(url_col)
    pages = (
        df.select(u.alias("_url"), F.col(sig_col).alias("_sig"))
        .groupBy("_url").agg(F.min("_sig").alias("_sig"))
    )
    pre = F.regexp_extract(F.col("_url"), r"^([^?#]*)", 1)
    qy = F.regexp_extract(F.col("_url"), r"\?([^#]*)", 1)
    parsed = pages.select(
        "_url", "_sig",
        F.regexp_extract(F.col("_url"), _URL_RE, 2).alias("host"),
        pre.alias("_pre"),
        F.split(qy, "&").alias("_params"),
    ).where(qy != "")
    keys = parsed.select(
        "_url", "_sig", "host", "_pre", "_params",
        F.explode(F.array_distinct(F.transform(
            F.col("_params"),
            lambda p: F.substring_index(p, "=", 1),
        ))).alias("param"),
    )
    others = F.filter(
        F.col("_params"),
        lambda p: F.substring_index(p, "=", 1) != F.col("param"),
    )
    based = keys.select(
        "host", "param", "_url", "_sig",
        F.concat(F.col("_pre"), F.lit("|"),
                 F.array_join(F.array_sort(others), "&")).alias("_base"),
    )
    groups = based.groupBy("host", "param", "_base").agg(
        F.countDistinct("_url").alias("_n_urls"),
        F.countDistinct("_sig").alias("_n_sigs"),
    ).where(F.col("_n_urls") >= 2)
    pol = groups.groupBy("host", "param").agg(
        F.count(F.lit(1)).cast("long").alias("n_groups"),
        F.sum(F.when(F.col("_n_sigs") == 1, 1).otherwise(0))
        .cast("long").alias("n_invariant"),
    )
    ppm = F.floor(F.col("n_invariant") * 1_000_000 / F.col("n_groups"))
    return pol.select(
        "host", "param", "n_groups", "n_invariant",
        ppm.cast("long").alias("invariant_ppm"),
        ((F.col("n_groups") >= min_support)
         & (ppm >= invariant_min_ppm)).alias("strip_safe"),
    )


# Publication-date-in-URL patterns. Validity is IN the regex (year
# 1990-2029, month 01-12, day 01-31) so no post-hoc date parsing is
# needed and the DuckDB oracle shares each pattern verbatim
# (Java∩RE2-safe: classes + alternation only).
_URLDATE_Y = r"(199\d|20[0-2]\d)"
_URLDATE_M = r"(0[1-9]|1[0-2])"
_URLDATE_D = r"(0[1-9]|[12]\d|3[01])"
URLDATE_DAY_SLASH_RE = f"/{_URLDATE_Y}/{_URLDATE_M}/{_URLDATE_D}(/|$)"
URLDATE_MON_SLASH_RE = f"/{_URLDATE_Y}/{_URLDATE_M}(/|$)"
URLDATE_DAY_DASH_RE = (
    f"(^|[^0-9]){_URLDATE_Y}-{_URLDATE_M}-{_URLDATE_D}($|[^0-9])")


def url_pub_date(df: DataFrame, url_col: str) -> DataFrame:
    """Publication-date estimate from the URL path — the freshness
    prior news/blog CMSes leak for free (/2023/05/21/post.html,
    ...-2023-05-21.html): recrawl schedulers and recency-weighted
    samplers consume it when no on-page date exists. Precedence:
    /Y/M/D/ path > Y-M-D slug > /Y/M/ path; month-only dates fill
    day=01 and report precision='month'; anything else (including
    regex-invalid month 13 or day 32 — validity is in the pattern)
    yields NULLs. Pure codegen scan projection; no shuffle, no Python.

    Output: input columns + (pub_date 'YYYY-MM-DD', date_precision
    'day'|'month'|NULL)."""
    u = F.col(url_col)

    def ex(re: str, grp: int) -> Column:
        return F.regexp_extract(u, re, grp)

    ds = [ex(URLDATE_DAY_SLASH_RE, i) for i in (1, 2, 3)]
    dd = [ex(URLDATE_DAY_DASH_RE, i) for i in (2, 3, 4)]
    ms = [ex(URLDATE_MON_SLASH_RE, i) for i in (1, 2)]

    def iso(y: Column, m: Column, d) -> Column:
        return F.concat(y, F.lit("-"), m, F.lit("-"),
                        d if isinstance(d, Column) else F.lit(d))

    pub = (F.when(ds[0] != "", iso(*ds))
           .when(dd[0] != "", iso(*dd))
           .when(ms[0] != "", iso(ms[0], ms[1], "01")))
    prec = (F.when((ds[0] != "") | (dd[0] != ""), F.lit("day"))
            .when(ms[0] != "", F.lit("month")))
    return df.select("*", pub.alias("pub_date"),
                     prec.alias("date_precision"))


def deletion1_variants(s: Column, min_variant_len: int = 4) -> Column:
    """FastSS deletion-1 neighborhood of a string: the array
    [s, s minus char 1, s minus char 2, ...] — the complete blocking
    key set for edit-distance ≤ 1 (two strings are within one edit
    IFF their neighborhoods intersect; substitutions meet at the
    shared-deletion variant, insertions/deletions at the identity of
    the shorter). Variants shorter than ``min_variant_len`` are
    dropped (junk keys like single chars would hot-spot the join);
    pairs of strings shorter than min_variant_len+1 are therefore out
    of contract."""
    idx = F.sequence(F.lit(0), F.length(s))
    var = F.transform(
        idx,
        lambda i: F.when(i == 0, s).otherwise(
            F.concat(s.substr(F.lit(1), i - 1),
                     s.substr(i + 1, F.length(s)))),
    )
    return F.array_distinct(
        F.filter(var, lambda v: F.length(v) >= min_variant_len))


def typosquat_pairs(
    candidates: DataFrame,
    host_col: str,
    trusted: DataFrame,
    trusted_col: str,
    min_variant_len: int = 4,
) -> DataFrame:
    """Typosquat detection: candidate hosts within ONE edit
    (insertion / deletion / substitution) of a trusted host, excluding
    hosts that ARE trusted — the lookalike-domain lens that complements
    homoglyph skeleton matching (confusable GLYPHS there, keyboard
    TYPOS here: gogle.com, examp1e.com, exampleе… one edit each).

    Scale shape — deletion-neighborhood blocking, never all-pairs:
    both sides explode into their deletion-1 variants (fan-out =
    host length + 1, bounded ~40), the equi-join on the variant key
    meets every true pair (FastSS completeness), then one exact
    ``levenshtein == 1`` filter kills the distance-2 collisions
    (transpositions etc.) and an anti-join removes candidates that
    appear in the trusted list themselves. The variant key is
    high-entropy (near-full hostnames); distinct-ifying both exploded
    sides before the join bounds any duplicate-host mass.

    Output: distinct ``(host, trusted_host)`` pairs.
    """
    ch = F.col(host_col)
    th = F.col(trusted_col)
    cv = (
        candidates.select(ch.alias("host")).where(ch.isNotNull())
        .distinct()
        .select("host", F.explode(
            deletion1_variants(F.col("host"), min_variant_len))
            .alias("_v"))
    )
    tv = (
        trusted.select(th.alias("trusted_host")).where(th.isNotNull())
        .distinct()
        .select("trusted_host", F.explode(
            deletion1_variants(F.col("trusted_host"), min_variant_len))
            .alias("_v"))
    )
    pairs = (
        cv.join(tv, "_v")
        .select("host", "trusted_host").distinct()
        .where(F.levenshtein(F.col("host"), F.col("trusted_host")) == 1)
    )
    t_set = trusted.select(th.alias("host")).distinct()
    return pairs.join(t_set, "host", "left_anti")


def path_rollup(
    df: DataFrame,
    url_col: str,
    max_depth: int = 3,
) -> DataFrame:
    """URL directory rollup: page counts aggregated at every path
    prefix up to ``max_depth`` — the site-structure census that
    drives per-directory crawl budgets and finds the /tag/ or
    /calendar/ subtrees that trap crawlers. Per (host, prefix):

    ``(host, depth, prefix, n_urls)``

    depth 0 is the host root (prefix '/'); a URL contributes one row
    to EACH of its ancestor prefixes (fan-out ≤ max_depth+1, bounded
    literal). One explode + one map-side-combinable groupBy; query
    strings and fragments are not path (stripped in the scan).
    """
    u = F.col(url_col)
    host = host_of(u)
    path = F.regexp_extract(u, r"^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)",
                            1)
    segs = F.filter(F.split(path, "/"), lambda s: s != "")
    idx = F.sequence(F.lit(0), F.least(F.size(segs),
                                       F.lit(int(max_depth))))
    pref = F.transform(
        idx,
        lambda d: F.struct(
            d.cast("int").alias("depth"),
            F.concat(F.lit("/"), F.array_join(F.slice(segs, 1, d), "/"))
            .alias("prefix")))
    ex = (
        df.where(u.isNotNull() & (host != ""))
        .select(host.alias("host"), F.explode(pref).alias("_p"))
        .select("host", F.col("_p.depth").alias("depth"),
                F.col("_p.prefix").alias("prefix"))
    )
    return ex.groupBy("host", "depth", "prefix").agg(
        F.count(F.lit(1)).cast("long").alias("n_urls"))
