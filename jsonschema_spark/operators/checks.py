"""Declarative table-level check suites — the Deequ/Great-Expectations
analogue of the reference's schema validation, aimed at the TABLE
contract rather than the per-row document: completeness, cardinality,
value domains, bounds, format rates, functional dependencies and
cross-table aggregate reconciliation.

Reference parity: sourcemeta/jsonschema validates one JSON document at
a time (src/command_validate.cc); at warehouse scale the same contract
questions arrive as *column* assertions ("o_orderkey is a key",
"o_orderstatus ∈ {O,F,P}", "totalprice equals the lineitem roll-up").
These operators express that surface Spark-first.

Scale design notes (100 TB):

- ``check_suite`` evaluates every algebraic metric (count, non-null,
  sum, min, max, regex-match count, containment count) in ONE global
  aggregation over ONE scan — map-side partials collapse each task to
  a single row, the exchange moves n_tasks rows. ``distinctness``
  checks add Spark's Expand-based multi-count-distinct to the same
  agg: the scan stays single, shuffled rows multiply by the number of
  distinct columns (documented cost; at crawl scale prefer the HLL
  sketch route in operators/stats.py when ±2 % suffices).
- All reported metrics are integers (counts, scaled units, ppm with
  explicit floor) so value-hashes are bit-stable across engines.
- ``fd_violations`` is two narrow exchanges: groupBy(lhs, rhs) on the
  high-entropy composite key (skew-free), then groupBy(lhs) with
  map-side partials.
- ``reconcile_sum`` quantizes to integer units PER ROW before summing
  (float sums are order-dependent; integer sums are exact), so the
  parent/child comparison is deterministic under any partitioning.
"""
from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Open-bound sentinel for lo/hi — large enough to never bind, small
# enough that |metric| + sentinel arithmetic stays far from int64.
OPEN_BOUND = 1 << 62

_CHECK_TYPES = (
    "size_min",
    "completeness",
    "distinctness",
    "distinctness_approx",
    "min_ge",
    "max_le",
    "mean_scaled_between",
    "match_ppm",
    "contained_ppm",
)


def _ppm(num: Column, den: Column) -> Column:
    return F.floor((num * 1_000_000).cast("double") / den)


def _quant(col: Column, scale: int) -> Column:
    """Per-row integer quantization. scale=1 truncates toward -inf
    (floor), matching DuckDB floor() for negatives too."""
    if scale == 1:
        return F.floor(col.cast("double")).cast("long")
    return F.floor(col * F.lit(float(scale))).cast("long")


def check_suite(
    df: DataFrame,
    checks: Sequence[dict],
    by: Sequence[str] = (),
) -> DataFrame:
    """Evaluate a declarative list of table-level constraints in one
    aggregation pass; returns one row per check (× group when ``by``
    is given — the per-partition contract verdict: the whole suite
    per language / per shard / per day, still ONE scan, the groupBy
    collapsing map-side; group keys prefix the output columns;
    ``distinctness_approx`` is global-only and rejected under ``by``):

    ``(check_name, check_type, col_name, metric, lo, hi, status)``

    where ``status`` is 'pass' iff ``lo <= metric <= hi`` (a NULL
    metric — e.g. min of an all-NULL column — fails). Check dicts:

    - ``{"check": "size_min", "min": n}`` — metric = row count.
    - ``{"check": "completeness", "col": c, "min_ppm": p}`` — metric =
      non-NULL share of all rows, integer ppm.
    - ``{"check": "distinctness", "col": c, "min_ppm": p}`` — metric =
      exact distinct non-NULL values / rows, ppm (the PK check at
      1_000_000). Composite form: ``"cols": [c1, c2, ...]`` counts
      distinct canonical row renderings (NULL-sentinel, \\x01-joined)
      via the portable 56-bit hash — SQL count(DISTINCT c1, c2)
      semantics differ across engines on NULLs, the rendering does
      not; a 56-bit collision under-counts by 1 in ~10^16 pairs.
    - ``{"check": "distinctness_approx", "col": c, "min_ppm": p,
      "p": 12}`` — same metric from the portable HLL sketch (±~2 % at
      p=12): the crawl-scale path. Exact distinct on a near-unique key
      shuffles every row (map-side partials can't collapse what never
      repeats — measured 1.1× super-linear at 16M rows); the sketch is
      one extra tiny aggregation whose exchange is ≤2^p rows. Still
      oracle-exact: the estimate is a deterministic integer function
      of the md5-56 hashes. The upper bound is open (the estimate may
      exceed 10^6 ppm slightly).
    - ``{"check": "min_ge", "col": c, "ge": v, "scale": s}`` /
      ``{"check": "max_le", "col": c, "le": v, "scale": s}`` — metric =
      min/max of floor(col*scale) (scale default 1).
    - ``{"check": "mean_scaled_between", "col": c, "lo": a, "hi": b,
      "scale": s}`` — metric = floor(sum(floor(col*scale)) / n_nonnull),
      one IEEE division so engines agree bit-for-bit.
    - ``{"check": "match_ppm", "col": c, "pattern": re, "min_ppm": p}``
      — share of non-NULL values matching the (Java-and-RE2-safe)
      regex, ppm of non-NULL.
    - ``{"check": "contained_ppm", "col": c, "allowed": [...],
      "min_ppm": p}`` — share of non-NULL values in the allow-list,
      ppm of non-NULL.

    ``match_ppm`` / ``contained_ppm`` also accept ``max_ppm`` (default
    1_000_000) for ceiling checks — "the PII/boilerplate/marker rate
    must stay BELOW x" — with ``min_ppm`` defaulting to 0 when only a
    ceiling is given.

    Every check may carry ``"name"``; defaults to ``c{i}``.
    """
    aggs: dict[str, Column] = {
        "n_rows": F.count(F.lit(1)).cast("long"),
    }

    def need(alias: str, expr: Column) -> str:
        if alias not in aggs:
            aggs[alias] = expr
        return alias

    def nonnull(c: str) -> str:
        return need(
            f"nn_{c}", F.sum(F.col(c).isNotNull().cast("long"))
        )

    # (name, ctype, colname, metric_builder(agg row cols), lo, hi)
    specs: list[tuple] = []
    approx_rows: list[DataFrame] = []
    for i, ck in enumerate(checks):
        t = ck["check"]
        if t not in _CHECK_TYPES:
            raise ValueError(f"unknown check type {t!r}")
        name = ck.get("name", f"c{i}")
        c = ck.get("col", "")
        scale = int(ck.get("scale", 1))
        if t == "size_min":
            metric = F.col("n_rows")
            lo, hi = int(ck["min"]), OPEN_BOUND
        elif t == "completeness":
            a = nonnull(c)
            metric = _ppm(F.col(a), F.col("n_rows"))
            lo, hi = int(ck["min_ppm"]), 1_000_000
        elif t == "distinctness":
            if "cols" in ck:
                cs = list(ck["cols"])
                c = ",".join(cs)
                a = need(f"ndh_{i}",
                         F.countDistinct(row_fingerprint_hash(cs))
                         .cast("long"))
            else:
                a = need(f"nd_{c}",
                         F.countDistinct(F.col(c)).cast("long"))
            metric = _ppm(F.col(a), F.col("n_rows"))
            lo, hi = int(ck["min_ppm"]), 1_000_000
        elif t == "distinctness_approx":
            from jsonschema_spark.operators.stats import (
                hll_estimate,
                hll_sketch,
            )
            p_hll = int(ck.get("p", 12))
            approx_rows.append(
                hll_estimate(hll_sketch(df, c, p_hll), p_hll)
                .select(F.col("est_milli").alias(f"hd_{i}")))
            # est_milli = floor(est·1000) → ppm of rows in one more op
            metric = F.floor((F.col(f"hd_{i}") * 1000).cast("double")
                             / F.col("n_rows"))
            lo, hi = int(ck["min_ppm"]), OPEN_BOUND
        elif t == "min_ge":
            a = need(f"mn_{c}_{scale}",
                     F.min(_quant(F.col(c), scale)))
            metric = F.col(a)
            lo, hi = int(ck["ge"]), OPEN_BOUND
        elif t == "max_le":
            a = need(f"mx_{c}_{scale}",
                     F.max(_quant(F.col(c), scale)))
            metric = F.col(a)
            lo, hi = -OPEN_BOUND, int(ck["le"])
        elif t == "mean_scaled_between":
            s = need(f"sq_{c}_{scale}",
                     F.sum(_quant(F.col(c), scale)))
            n = nonnull(c)
            metric = F.floor(F.col(s).cast("double") / F.col(n))
            lo, hi = int(ck["lo"]), int(ck["hi"])
        elif t == "match_ppm":
            a = need(f"rx_{i}",
                     F.sum(F.col(c).rlike(ck["pattern"]).cast("long")))
            metric = _ppm(F.col(a), F.col(nonnull(c)))
            lo = int(ck.get("min_ppm", 0))
            hi = int(ck.get("max_ppm", 1_000_000))
        else:  # contained_ppm
            a = need(f"in_{i}",
                     F.sum(F.col(c).isin(list(ck["allowed"]))
                           .cast("long")))
            metric = _ppm(F.col(a), F.col(nonnull(c)))
            lo = int(ck.get("min_ppm", 0))
            hi = int(ck.get("max_ppm", 1_000_000))
        specs.append((name, t, c, metric, lo, hi))

    if by:
        if approx_rows:
            raise ValueError(
                "distinctness_approx is global-only: the HLL estimate "
                "folds one sketch row, not one per group — use exact "
                "distinctness under `by`")
        row = df.groupBy(*[F.col(c) for c in by]).agg(
            *[v.alias(k) for k, v in aggs.items()])
    else:
        row = df.agg(*[v.alias(k) for k, v in aggs.items()])
        for est in approx_rows:
            # one-row × one-row broadcast joins: the sketch states
            # fold into the same single result row
            row = row.crossJoin(F.broadcast(est))
    entries = []
    for name, t, c, metric, lo, hi in specs:
        m = metric.cast("long")
        entries.append(F.struct(
            F.lit(name).alias("check_name"),
            F.lit(t).alias("check_type"),
            F.lit(c).alias("col_name"),
            m.alias("metric"),
            F.lit(lo).cast("long").alias("lo"),
            F.lit(hi).cast("long").alias("hi"),
            F.when((m >= lo) & (m <= hi), F.lit("pass"))
            .otherwise(F.lit("fail")).alias("status"),
        ))
    return row.select(*by,
                      F.explode(F.array(*entries)).alias("r")) \
        .select(*by, "r.*")


def check_drift(
    old_results: DataFrame,
    new_results: DataFrame,
) -> DataFrame:
    """Metric drift between two snapshots' ``check_suite`` outputs —
    the monitoring loop: store each run's result rows next to the
    snapshot manifest, and this join answers "what moved, and did
    anything that used to hold stop holding?".

    Per check (full-outer on check_name, so added/retired checks
    surface too): old/new metric, ``delta = new - old``, and
    ``verdict`` ∈ {'regressed' (pass→fail — page someone),
    'recovered' (fail→pass), 'added', 'retired', 'steady'}. Check
    results are ≤dozens of rows; this plan is driver-trivial by
    design — the expensive part already happened inside the two
    suites.
    """
    o = old_results.select(
        "check_name", F.col("metric").alias("old_metric"),
        F.col("status").alias("_os"))
    nw = new_results.select(
        "check_name", F.col("metric").alias("new_metric"),
        F.col("status").alias("_ns"))
    j = o.join(nw, "check_name", "full_outer")
    return j.select(
        "check_name", "old_metric", "new_metric",
        (F.col("new_metric") - F.col("old_metric")).alias("delta"),
        F.when(F.col("_os").isNull(), F.lit("added"))
        .when(F.col("_ns").isNull(), F.lit("retired"))
        .when((F.col("_os") == "pass") & (F.col("_ns") == "fail"),
              F.lit("regressed"))
        .when((F.col("_os") == "fail") & (F.col("_ns") == "pass"),
              F.lit("recovered"))
        .otherwise(F.lit("steady")).alias("verdict"),
    )


def suggest_checks(
    df: DataFrame,
    cols: Optional[Sequence[str]] = None,
    domain_max: int = 8,
) -> DataFrame:
    """Constraint suggestion (the Deequ ConstraintSuggestion
    analogue): profile the table once and propose the check_suite a
    curator would write by hand — the bootstrap step of the
    profile → suggest → check → reconcile loop. Per column:

    - ``completeness`` with the OBSERVED non-null ppm as the floor
      (every column);
    - ``distinctness`` when the column is a key candidate (distinct
      == non-null count), with the OBSERVED distinct-per-row ppm as
      the floor (1_000_000 only when also fully complete — the
      check_suite metric divides by ALL rows, so a nullable key's
      observed floor is what actually holds);
    - ``min_ge`` / ``max_le`` with observed floor()-quantized bounds
      (numeric columns);
    - ``contained_ppm`` with the observed value domain as a sorted
      CSV when a string column has ≤ ``domain_max`` distinct values.

    Output: ``(col_name, check, param, observed)`` — param is the
    suggested threshold / domain rendered as a string, observed the
    integer metric it came from.

    Two passes by construction (like Deequ): ONE aggregation computes
    every count/bound/cardinality (count-distincts fused via Expand);
    domains are then collected ONLY for the ≤domain_max-cardinality
    columns the first pass identified — collect_set over a column
    with a proven tiny domain is map-side-bounded state, never a
    corpus-wide collect. The pass boundary is a driver action on ONE
    profile row.
    """
    from pyspark.sql.types import (
        DoubleType,
        FloatType,
        IntegerType,
        LongType,
        ShortType,
        StringType,
    )

    fields = [f for f in df.schema.fields
              if cols is None or f.name in cols]
    num_t = (IntegerType, LongType, ShortType, DoubleType, FloatType)
    aggs: list[Column] = [F.count(F.lit(1)).cast("long").alias("n")]
    for f in fields:
        c = F.col(f.name)
        aggs.append(F.sum(c.isNotNull().cast("long"))
                    .alias(f"nn_{f.name}"))
        aggs.append(F.countDistinct(c).cast("long")
                    .alias(f"nd_{f.name}"))
        if isinstance(f.dataType, num_t):
            q = F.floor(c.cast("double")).cast("long")
            aggs.append(F.min(q).alias(f"mn_{f.name}"))
            aggs.append(F.max(q).alias(f"mx_{f.name}"))
    prof = df.agg(*aggs).collect()[0]

    n = prof["n"]
    domain_cols = [
        f.name for f in fields
        if isinstance(f.dataType, StringType)
        and 0 < prof[f"nd_{f.name}"] <= domain_max
    ]
    domains: dict[str, str] = {}
    if domain_cols:
        drow = df.agg(*[
            F.array_join(F.array_sort(F.collect_set(F.col(c))), ",")
            .alias(c) for c in domain_cols]).collect()[0]
        domains = {c: drow[c] for c in domain_cols}

    out: list[tuple] = []
    for f in fields:
        nn, nd = prof[f"nn_{f.name}"], prof[f"nd_{f.name}"]
        comp_ppm = (nn * 1_000_000) // n if n else 0
        out.append((f.name, "completeness", str(comp_ppm), comp_ppm))
        if nn > 0 and nd == nn:
            d_ppm = (nd * 1_000_000) // n
            out.append((f.name, "distinctness", str(d_ppm), d_ppm))
        if isinstance(f.dataType, num_t) and nn > 0:
            out.append((f.name, "min_ge", str(prof[f"mn_{f.name}"]),
                        prof[f"mn_{f.name}"]))
            out.append((f.name, "max_le", str(prof[f"mx_{f.name}"]),
                        prof[f"mx_{f.name}"]))
        if f.name in domains:
            out.append((f.name, "contained_ppm", domains[f.name],
                        (nd * 1_000_000) // n))
    return df.sparkSession.createDataFrame(
        out, "col_name string, check string, param string, "
             "observed long")


NULL_SENTINEL = "<NULL>"
FIELD_SEP = "\x01"


def row_fingerprint_hash(cols: Sequence[str]) -> Column:
    """Canonical row rendering (NULL → sentinel, fields joined by
    \\x01) hashed to the portable 56-bit md5 value — the shared basis
    of ``table_fingerprint`` and per-row bucket tagging in incremental
    revalidation. Column ORDER is part of the fingerprint."""
    from jsonschema_spark.operators.dedup import hash56

    rendered = F.concat_ws(
        FIELD_SEP,
        *[F.coalesce(F.col(c).cast("string"), F.lit(NULL_SENTINEL))
          for c in cols],
    )
    return hash56(rendered)


def table_fingerprint(
    df: DataFrame,
    cols: Sequence[str],
    n_buckets: int = 64,
) -> DataFrame:
    """Order-independent table checksum for replica / snapshot / engine
    equality at any scale: render each row to a canonical string
    (NULL → sentinel, fields joined by \\x01), hash to the portable
    56-bit md5 value, and fold per hash-prefix bucket into

    ``(bucket, n_rows, xor56, modsum)``

    - ``xor56`` = bit-XOR of row hashes: order-independent, never
      overflows; an even-multiplicity duplicate pair cancels, which is
      why ``modsum`` rides along;
    - ``modsum`` = exact int64 sum of (hash mod 1_000_003): multiset-
      sensitive; bounded by rows·10^6, so ANSI-safe to ~9·10^12 rows.

    Two fingerprints are equal iff the tables are (with 56-bit
    confidence) equal as multisets — no sort, no join, one scan and
    one tiny ``n_buckets``-row exchange; a mismatch localizes to a
    bucket, so the binary-search drill-down re-reads 1/n_buckets of
    the data. Caller contract: pass string/integer columns (cast
    floats/timestamps to an explicit text rendering first — engine
    default float→string renderings differ).
    """
    h = row_fingerprint_hash(cols)
    return (
        df.select((h % n_buckets).alias("bucket"), h.alias("_h"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.bit_xor("_h").cast("long").alias("xor56"),
            F.sum(F.col("_h") % 1_000_003).cast("long").alias("modsum"),
        )
    )


def fingerprint_diff(
    old: DataFrame,
    new: DataFrame,
    cols: Sequence[str],
    n_buckets: int = 64,
) -> DataFrame:
    """Bucket-level diff of two table fingerprints — the incremental-
    revalidation planner: a bucket whose (count, XOR, modsum) triple
    is unchanged provably (56-bit) holds the same row multiset, so a
    downstream validator re-reads ONLY changed buckets — 1/n_buckets
    granularity without storing per-row state, resumable across
    snapshots because the fingerprint is pure data.

    Output per bucket: old/new row counts (0 when absent) and
    ``changed``. Full-outer join on the ≤n_buckets keys — a
    broadcast-sized plan however large the underlying tables are.
    """
    fa = table_fingerprint(old, cols, n_buckets).select(
        "bucket", F.col("n_rows").alias("old_rows"),
        F.col("xor56").alias("_xa"), F.col("modsum").alias("_ma"))
    fb = table_fingerprint(new, cols, n_buckets).select(
        "bucket", F.col("n_rows").alias("new_rows"),
        F.col("xor56").alias("_xb"), F.col("modsum").alias("_mb"))
    j = fa.join(fb, "bucket", "full_outer")
    changed = ~(
        (F.coalesce(F.col("old_rows"), F.lit(-1))
         == F.coalesce(F.col("new_rows"), F.lit(-1)))
        & (F.coalesce(F.col("_xa"), F.lit(-1))
           == F.coalesce(F.col("_xb"), F.lit(-1)))
        & (F.coalesce(F.col("_ma"), F.lit(-1))
           == F.coalesce(F.col("_mb"), F.lit(-1)))
    )
    return j.select(
        "bucket",
        F.coalesce(F.col("old_rows"), F.lit(0)).cast("long")
        .alias("old_rows"),
        F.coalesce(F.col("new_rows"), F.lit(0)).cast("long")
        .alias("new_rows"),
        changed.alias("changed"),
    )


def partition_anomaly(
    df: DataFrame,
    bucket_col: Column,
    lo_ppm: int = 500_000,
    hi_ppm: int = 2_000_000,
) -> DataFrame:
    """Row-count anomaly detection across partitions of a table (the
    per-day / per-shard sanity check that catches a half-written
    ingest or a double-loaded day before training does): per bucket,
    rows and the integer ratio to the LOWER MEDIAN bucket, flagged
    'low' / 'high' / 'ok' against ppm thresholds.

    The median is exact and cross-engine: bucket counts are bounded
    (days, shards), so they collapse into ONE row via
    array_sort(collect_list) — the allowed global-agg-of-partials
    shape — and the lower median is one element_at; no single-
    partition window anywhere. The tiny one-row median broadcasts
    back over the bucket rows.
    """
    g = df.groupBy(bucket_col.alias("bucket")).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"))
    med = g.agg(
        F.array_sort(F.collect_list("n_rows")).alias("a"),
    ).select(
        F.element_at(
            "a", ((F.size("a") + 1) / 2).cast("int")
        ).alias("median_rows"),
    )
    out = g.crossJoin(F.broadcast(med))
    ratio = F.floor((F.col("n_rows") * 1_000_000).cast("double")
                    / F.col("median_rows"))
    return out.select(
        "bucket", "n_rows", "median_rows",
        ratio.cast("long").alias("ratio_ppm"),
        F.when(ratio < lo_ppm, F.lit("low"))
        .when(ratio > hi_ppm, F.lit("high"))
        .otherwise(F.lit("ok")).alias("status"),
    )


def fd_violations(
    df: DataFrame,
    lhs_cols: Sequence[str],
    rhs_col: str,
) -> DataFrame:
    """Functional-dependency check lhs → rhs: return every lhs key
    determined by MORE than one distinct rhs value, with row mass and
    the min/max witnesses. A NULL rhs counts as its own determination
    (one NULL group — both engines group NULLs together); ``rhs_min``
    / ``rhs_max`` skip NULLs (SQL aggregate semantics).

    Two narrow exchanges: groupBy(lhs, rhs) first — the composite key
    has at least per-key-pair entropy, so a hot lhs key cannot skew
    this stage worse than its own distinct-rhs fan-out — then
    groupBy(lhs) over the already-collapsed pairs with map-side
    partials.
    """
    lhs = [F.col(c) for c in lhs_cols]
    g1 = df.groupBy(*lhs, F.col(rhs_col).alias("_rhs")) \
        .agg(F.count(F.lit(1)).alias("_c"))
    g2 = g1.groupBy(*[F.col(c) for c in lhs_cols]).agg(
        F.sum("_c").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_distinct_rhs"),
        F.min("_rhs").alias("rhs_min"),
        F.max("_rhs").alias("rhs_max"),
    )
    return g2.where(F.col("n_distinct_rhs") > 1)


# floor(1e6·log10(1+1/d)) — Benford first-digit expectation, pinned as
# integer literals so no engine evaluates a log
BENFORD_PPM = (301029, 176091, 124938, 96910, 79181,
               66946, 57991, 51152, 45757)


def benford_profile(df: DataFrame, col: str) -> DataFrame:
    """First-significant-digit profile vs Benford's law — the numeric-
    sanity check that catches fabricated, truncated, or unit-mangled
    measure columns (amounts, sizes, durations) without any reference
    snapshot: natural multi-scale data follows log-uniform mantissas;
    capped, defaulted or invented data does not.

    Rows with |value| ≥ 1 only (the law concerns leading digits of
    magnitudes). The digit is extracted INTEGER-portably — first char
    of floor(abs(x))::bigint rendered as a string; double→string
    rendering differs across engines, bigint digits do not. Output
    per digit 1-9: observed count, observed ppm, expected ppm and
    ``dev_ppm = obs - exp``; digits absent from the data still get a
    row (the full |deviation| sum is Σ|dev_ppm| downstream). One scan,
    one 9-key groupBy, a 9-row digit spine outer-joined so the
    profile shape is fixed.
    """
    v = F.floor(F.abs(F.col(col))).cast("long")
    d = F.substring(v.cast("string"), 1, 1).cast("int")
    g = (
        df.where(F.col(col).isNotNull() & (F.abs(F.col(col)) >= 1))
        .select(d.alias("digit"))
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    spark = df.sparkSession
    spine = spark.range(1, 10).select(
        F.col("id").cast("int").alias("digit"),
        F.element_at(
            F.array(*[F.lit(p) for p in BENFORD_PPM]),
            F.col("id").cast("int")).cast("long").alias("expected_ppm"),
    )
    j = spine.join(g, "digit", "left")
    n = F.coalesce(F.col("n_rows"), F.lit(0)).cast("long")
    tot = j.agg(F.sum(n).alias("_t"))
    out = j.crossJoin(F.broadcast(tot))
    # No qualifying rows (|x| >= 1) means _t == 0: ANSI division would
    # throw — emit NULL observed/dev (metric unmeasurable) instead.
    obs = F.when(F.col("_t") > 0,
                 F.floor((n * 1_000_000).cast("double") / F.col("_t")))
    return out.select(
        "digit", n.alias("n_rows"),
        obs.cast("long").alias("observed_ppm"),
        "expected_ppm",
        (obs - F.col("expected_ppm")).cast("long").alias("dev_ppm"),
    )


def json_key_census(df: DataFrame, json_col: str) -> DataFrame:
    """Top-level key census over a JSON text column — the
    schema-inference precursor ("which fields exist at what rate")
    that feeds ``suggest_checks``-style contract writing for
    semi-structured payloads: per key, row count and presence ppm of
    ALL rows (so missing-because-malformed and missing-because-absent
    both count against presence — the contract consumer's view).

    One explode of the engine-parsed key array + one groupBy with
    map-side partials; non-objects, malformed JSON and NULLs
    contribute no keys (Spark json_object_keys → NULL; the SQL mirror
    guards with json_valid, whose absence THROWS in DuckDB — the
    engines differ in failure mode, not in counts).
    """
    tot = df.agg(F.count(F.lit(1)).cast("long").alias("_t"))
    g = (
        df.select(F.explode(F.json_object_keys(F.col(json_col)))
                  .alias("json_key"))
        .groupBy("json_key")
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    return g.crossJoin(F.broadcast(tot)).select(
        "json_key", "n_rows",
        F.floor((F.col("n_rows") * 1_000_000).cast("double")
                / F.col("_t")).cast("long").alias("presence_ppm"),
    )


def fd_compliance(
    df: DataFrame,
    lhs_cols: Sequence[str],
    rhs_col: str,
) -> DataFrame:
    """Approximate-FD compliance (the TANE g3 measure): the share of
    rows that would survive if every lhs key kept only its MAJORITY
    rhs value — "l_partkey → l_suppkey holds at 991234 ppm" is the
    actionable form of an almost-dependency that ``fd_violations``
    can only enumerate. One row out: (n_rows, n_keys,
    compliant_rows, compliance_ppm).

    Majority ties need no break: only the max count matters. Same
    two-narrow-exchange shape as fd_violations, plus one global agg
    of the per-key maxima.
    """
    lhs = [F.col(c) for c in lhs_cols]
    g1 = df.groupBy(*lhs, F.col(rhs_col).alias("_rhs")) \
        .agg(F.count(F.lit(1)).alias("_c"))
    g2 = g1.groupBy(*[F.col(c) for c in lhs_cols]).agg(
        F.sum("_c").alias("_n"), F.max("_c").alias("_m"))
    return g2.agg(
        F.sum("_n").cast("long").alias("n_rows"),
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("_m").cast("long").alias("compliant_rows"),
    ).select(
        "*",
        F.floor((F.col("compliant_rows") * 1_000_000).cast("double")
                / F.col("n_rows")).cast("long")
        .alias("compliance_ppm"),
    )


def reconcile_sum(
    parent: DataFrame,
    parent_key: str,
    stated_col: str,
    child: DataFrame,
    child_key: str,
    part: Column,
    scale: int = 100,
    tol_units: int = 0,
) -> DataFrame:
    """Cross-table aggregate reconciliation: does the parent's stated
    total equal the sum of its child parts? (orders.o_totalprice vs
    the lineitem charge roll-up — the classic warehouse contract.)

    Both sides quantize to integer units PER ROW first —
    floor(value * scale) — then sum exactly in int64: a float sum is
    partition-order-dependent, an integer sum is not, so the verdict
    is deterministic under any parallelism. ``part`` is a Column
    expression over the child table evaluated in the scan.

    Output per parent key: ``stated_units``, ``parts_units`` (0 when
    childless), ``n_parts``, ``diff_units = parts - stated`` and
    ``status`` ∈ {'ok', 'mismatch', 'no_parts'}.

    Scale shape: child groupBy(key) with map-side partials collapses
    the fact table before the join; the parent↔child join is the
    canonical co-partitioned key join (bucket both by the key at the
    lake layer and it never shuffles at all). Parents keep a LEFT
    join so missing children surface; orphaned children are the
    referential operator's job (operators/referential.py).
    """
    cents = F.floor(part * F.lit(float(scale))).cast("long")
    cs = child.select(
        F.col(child_key).alias("_k"), cents.alias("_q"),
    ).groupBy("_k").agg(
        F.sum("_q").cast("long").alias("_parts"),
        F.count(F.lit(1)).cast("long").alias("_np"),
    )
    stated = F.floor(F.col(stated_col) * F.lit(float(scale))) \
        .cast("long")
    p = parent.select(
        F.col(parent_key).alias("_k"), stated.alias("stated_units"),
    )
    j = p.join(cs, "_k", "left")
    parts = F.coalesce(F.col("_parts"), F.lit(0).cast("long"))
    diff = parts - F.col("stated_units")
    return j.select(
        F.col("_k").alias(parent_key),
        F.col("stated_units"),
        parts.alias("parts_units"),
        F.coalesce(F.col("_np"), F.lit(0).cast("long"))
        .alias("n_parts"),
        diff.alias("diff_units"),
        F.when(F.col("_parts").isNull(), F.lit("no_parts"))
        .when(F.abs(diff) <= tol_units, F.lit("ok"))
        .otherwise(F.lit("mismatch")).alias("status"),
    )
