"""Table-level column statistics — one-pass profiles, quantiles, drift.

The reference has no table-level aggregation (SURVEY.md §2.6); these
operators generalize its per-row checks to table scale per the north_rule:
per-partition one-pass sketches (count / null-rate / min-max / distinct),
quantiles, and KS-style categorical drift against a baseline split.

Two variants throughout:
- ``exact=True``  — exact aggregates, used by the DuckDB-oracle correctness
  gate (count_distinct, exact percentile).
- ``exact=False`` — sketch versions for the 100 TB path
  (``approx_count_distinct`` = HyperLogLog++, ``percentile_approx`` =
  t-digest-style). Mergeable, map-side partial, no extra shuffle beyond the
  final single-row reduce (Spark runs these as partial+final aggregates —
  the treeAggregate analogue is built into whole-stage agg).

All aggregates for a profile run in ONE pass over the table (one ``agg``),
so a 100 TB profile costs a single scan.
"""

from __future__ import annotations

from typing import Optional, Sequence

import pandas as pd  # module top: pandas_udf string type hints resolve here

from pyspark.sql import Column, DataFrame, functions as F


def profile_long(df: DataFrame, cols: Optional[Sequence[str]] = None, exact: bool = True) -> DataFrame:
    """Per-column profile in long format:
    (column, n, n_null, n_distinct, min_v:string, max_v:string).

    One aggregation pass; ``exact=False`` swaps count_distinct for HLL++.
    """
    names = list(cols) if cols is not None else [f.name for f in df.schema.fields]
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in names:
        col = F.col(c)
        distinct = F.count_distinct(col) if exact else F.approx_count_distinct(col)
        aggs += [
            F.count(col).alias(f"{c}__nn"),
            distinct.alias(f"{c}__nd"),
            F.min(col).cast("string").alias(f"{c}__min"),
            F.max(col).cast("string").alias(f"{c}__max"),
        ]
    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(c).alias("column"),
                F.col("__n").alias("n"),
                (F.col("__n") - F.col(f"{c}__nn")).alias("n_null"),
                F.col(f"{c}__nd").alias("n_distinct"),
                F.col(f"{c}__min").alias("min_v"),
                F.col(f"{c}__max").alias("max_v"),
            )
            for c in names
        ]
    )
    return one.select(F.explode(rows).alias("r")).select("r.*")


def numeric_quantiles(
    df: DataFrame, col: str, ps: Sequence[float] = (0.25, 0.5, 0.75), exact: bool = True
) -> DataFrame:
    """Quantiles of a numeric column → rows (pct:int, milli:bigint).

    The value is reported as ``floor(value*1000)`` so exact mode compares
    bit-stable against the SQL oracle (both engines use linear interpolation;
    the milli-floor absorbs float formatting, not semantics). ``exact=False``
    uses ``percentile_approx`` (t-digest-style sketch) for the scale path.
    """
    src = F.col(col).cast("double")
    if exact:
        q = F.percentile(src, F.lit(list(ps)))
    else:
        q = F.percentile_approx(src, F.lit(list(ps)), F.lit(10000))
    one = df.agg(q.alias("qs"))
    pcts = [int(round(p * 100)) for p in ps]
    pairs = F.arrays_zip(F.lit(pcts).alias("pct"), F.col("qs").alias("v"))
    return (
        one.select(F.explode(pairs).alias("r"))
        .select(
            F.col("r.pct").alias("pct"),
            F.floor(F.col("r.v") * 1000).cast("long").alias("milli"),
        )
    )


def category_drift(df: DataFrame, col: str, split: Column) -> DataFrame:
    """Categorical distribution drift between two row populations of the
    same table (baseline = ``split`` true, current = false) — the KS-style
    check from the north_rule, in exact integer arithmetic:

    per category: (category, n_base, n_cur, diff_ppm) where diff_ppm =
    floor(|n_base*tot_cur - n_cur*tot_base| * 1e6 / (tot_base*tot_cur)) —
    the L1 share difference in parts-per-million, exactly (no float).

    One pass: conditional-sum aggregation, then totals via a single-row
    cross join (broadcast — no shuffle of the grouped result).
    """
    grouped = df.groupBy(F.col(col).alias("category")).agg(
        F.sum(F.when(split, 1).otherwise(0)).alias("n_base"),
        F.sum(F.when(split, 0).otherwise(1)).alias("n_cur"),
    )
    totals = grouped.agg(
        F.sum("n_base").alias("tot_base"), F.sum("n_cur").alias("tot_cur")
    )
    j = grouped.crossJoin(F.broadcast(totals))
    diff = F.abs(F.col("n_base") * F.col("tot_cur") - F.col("n_cur") * F.col("tot_base"))
    return j.select(
        "category",
        "n_base",
        "n_cur",
        F.floor(diff * 1000000 / (F.col("tot_base") * F.col("tot_cur"))).cast("long").alias("diff_ppm"),
    )


def numeric_drift(
    df: DataFrame,
    col: str,
    split: Column,
    quantize: Optional[Column] = None,
) -> DataFrame:
    """Exact two-sample KS statistic between two row populations of the
    same table (baseline = ``split`` true, current = false) — the
    north-rule numeric drift check: max empirical-CDF gap over every
    distinct value, reported in integer ppm so the oracle hash-matches.

    Scale shape: one groupBy on the value (uniform), then the global
    cumulative CDF via the zipWithIndex-on-sorted pattern — the distinct
    values are range-partitioned, each partition cumsums locally
    (parallel windows) and exact per-partition prefix totals (one tiny
    n_partitions-row aggregate, broadcast back) lift local sums to the
    global CDF. NEVER a single-partition window: an unquantized long
    column can have millions of distinct values (for a continuous double
    column pass ``quantize`` — e.g. ``F.floor(F.col(c) * 100)``).
    Integer-division CDF arithmetic throughout (`div`, not float /:
    cum*1e6 overflows the double mantissa at corpus scale).

    Returns one row: (ks_ppm, n_base, n_cur).
    """
    from pyspark.sql.window import Window

    v = (quantize if quantize is not None else F.col(col).cast("long")).alias("v")
    g = (
        df.filter(F.col(col).isNotNull())
        .groupBy(v)
        .agg(
            F.sum(F.when(split, 1).otherwise(0)).cast("long").alias("nb"),
            F.sum(F.when(split, 0).otherwise(1)).cast("long").alias("nc"),
        )
    )
    n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        g.repartitionByRange(n_parts, F.col("v"))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)  # pid stable between offsets + cumsum
    )
    prefix = Window.orderBy("_pid").rowsBetween(Window.unboundedPreceding, -1)
    offsets = (
        ranged.groupBy("_pid")
        .agg(F.sum("nb").alias("_sb"), F.sum("nc").alias("_sc"))
        .select(
            "_pid",
            F.coalesce(F.sum("_sb").over(prefix), F.lit(0)).cast("long").alias("_ob"),
            F.coalesce(F.sum("_sc").over(prefix), F.lit(0)).cast("long").alias("_oc"),
        )
    )
    totals = ranged.agg(
        F.coalesce(F.sum("nb"), F.lit(0)).cast("long").alias("tb"),
        F.coalesce(F.sum("nc"), F.lit(0)).cast("long").alias("tc"),
    )
    cum = Window.partitionBy("_pid").orderBy("v").rowsBetween(
        Window.unboundedPreceding, 0)
    d = (
        ranged.join(F.broadcast(offsets), "_pid")
        .join(F.broadcast(totals))
        .select(
            (F.sum("nb").over(cum) + F.col("_ob")).alias("cb"),
            (F.sum("nc").over(cum) + F.col("_oc")).alias("cc"),
            "tb",
            "tc",
        )
    ).select(
        F.abs(
            F.expr("(cb * 1000000) div greatest(tb, 1)")
            - F.expr("(cc * 1000000) div greatest(tc, 1)")
        ).alias("gap"),
        "tb",
        "tc",
    )
    return d.agg(
        F.max("gap").alias("ks_ppm"),
        F.max("tb").alias("n_base"),
        F.max("tc").alias("n_cur"),
    )


def sessionize(
    df: DataFrame,
    user_col: str,
    ts_col: str,
    gap: str = "30 minutes",
    value_col: Optional[str] = None,
) -> DataFrame:
    """Gap-based sessionization with Spark's NATIVE session windows:
    events of one user whose timestamps are < gap apart merge into one
    session → (user, session_start, session_end, n_events[, value_milli]).

    Scale shape (verified plan): partial HashAggregate on (user,
    event-window) map-side → ONE exchange of partially-aggregated rows →
    Sort + MergingSessions + final HashAggregate. One shuffle and one
    per-partition sort total — the classic lag()-window formulation costs
    the same exchange plus TWO full window passes (lag, running sum) and
    a second aggregate. Per-user work is inherently sequential; a bot
    user with 10^9 events is bounded by spillable external sort, and the
    session rows it emits stay proportional to its true session count.

    Session end = last event ts + gap (the native session_window
    convention); the merge boundary is INCLUSIVE — a next event at exactly
    prev_ts + gap joins the session (verified against Spark 4.1).
    Output timestamps are formatted strings (microseconds) and the
    optional value roll-up is an exact floor-milli integer sum, keeping
    the row hash engine-portable.
    """
    aggs = [F.count(F.lit(1)).alias("n_events")]
    if value_col is not None:
        aggs.append(
            F.sum(F.floor(F.col(value_col) * 1000).cast("long")).alias("value_milli")
        )
    fmt = "yyyy-MM-dd HH:mm:ss.SSSSSS"
    return (
        df.groupBy(F.col(user_col), F.session_window(F.col(ts_col), gap).alias("_w"))
        .agg(*aggs)
        .select(
            F.col(user_col),
            F.date_format(F.col("_w.start"), fmt).alias("session_start"),
            F.date_format(F.col("_w.end"), fmt).alias("session_end"),
            *[F.col(c) for c in ("n_events",) + (("value_milli",) if value_col else ())],
        )
    )


def pairwise_corr(df: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """Exact Pearson correlation between two integer columns — the
    engine-portable variant of ``F.corr`` (whose streaming float update
    is partial-aggregation-order dependent in the last ulp, so no SQL
    oracle can replay it).

    One aggregation computes the six exact int64 sums (n, Σx, Σy, Σx²,
    Σy², Σxy); the coefficient is ONE shared-op-order formula —
    ``floor((n·Σxy − Σx·Σy)::double · 1e6 / sqrt((n·Σx² − Σx²)::double ·
    (n·Σy² − Σy²)))`` — bit-identical across engines (IEEE sqrt is
    correctly rounded everywhere). NULL when either variance is zero or
    no complete pairs exist. Rows with a NULL on either side are dropped
    (pairwise-complete).

    Int contract: the formula computes n·Σx², n·Σy², n·Σxy, so the real
    bound is n·Σx² ≈ n²·E[x²] < 2⁶³ (NOT just n·max(x²) — the products
    scale with n², so at large n the aggregation ANSI-throws while each
    input is still small). ANSI overflow throws loudly, not silently —
    winsorize or downscale heavy-tailed columns first, and cap n·Σx²
    (quantiles/profile_long give the bounds; e.g. |x|≤10³ holds to
    n≈3·10⁶ rows, |x|≤10 to n≈3·10⁸).

    Output: one row (n, sum_x, sum_y, corr_ppm).
    """
    x = F.col(x_col).cast("long")
    y = F.col(y_col).cast("long")
    d = df.where(x.isNotNull() & y.isNotNull()).select(
        x.alias("_x"), y.alias("_y")
    )
    a = d.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum("_x"), F.lit(0)).alias("sum_x"),
        F.coalesce(F.sum("_y"), F.lit(0)).alias("sum_y"),
        F.coalesce(F.sum(F.col("_x") * F.col("_x")), F.lit(0)).alias("_sxx"),
        F.coalesce(F.sum(F.col("_y") * F.col("_y")), F.lit(0)).alias("_syy"),
        F.coalesce(F.sum(F.col("_x") * F.col("_y")), F.lit(0)).alias("_sxy"),
    )
    num = F.col("n") * F.col("_sxy") - F.col("sum_x") * F.col("sum_y")
    va = F.col("n") * F.col("_sxx") - F.col("sum_x") * F.col("sum_x")
    vb = F.col("n") * F.col("_syy") - F.col("sum_y") * F.col("sum_y")
    return a.select(
        F.col("n").cast("long").alias("n"),
        F.col("sum_x").cast("long").alias("sum_x"),
        F.col("sum_y").cast("long").alias("sum_y"),
        F.when(
            (va > 0) & (vb > 0),
            F.floor(
                num.cast("double") * F.lit(1_000_000.0)
                / F.sqrt(va.cast("double") * vb)
            ),
        ).cast("long").alias("corr_ppm"),
    )


def contingency_chi2(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """Pearson chi-square test of independence between two categorical
    columns, plus Cramér's V — the association lens behind "does lang
    depend on source?" / "is the failure rate independent of the
    shard?". One summary row:

    ``(n_rows, n_a, n_b, dof, chi2_ppm, cramers_v_milli)``

    - ``chi2_ppm`` = Σ_cells floor(10⁶·(obs·n − rt·ct)²/(rt·ct·n)) —
      the classic statistic scaled by 10⁶ and floored PER CELL before
      the integer sum, so the total is order-independent and
      bit-stable across engines (each cell is the same three IEEE
      multiplies + one divide on exact integer inputs; per-cell floor
      under-counts by < n_cells µunits, documented bias).
    - zero-observed cells COUNT (they contribute the expected mass):
      the cell spine is the full margin cross product, built from the
      grouped table, never from the corpus.
    - NULL categories are real categories (sentinel-rendered).
    - ``cramers_v_milli`` = floor(1000·sqrt(chi2/(n·min(n_a−1,
      n_b−1)))) — IEEE sqrt is correctly rounded, so portable; NULL
      when either margin is constant (dof 0).

    Scale shape: ONE corpus exchange (groupBy on the (a,b) pair key);
    margins, spine, expected terms and the final fold all run on the
    grouped table, whose size is the CATEGORY-pair count, not the row
    count — this is an operator for categorical (bounded-domain)
    columns, like category_drift. Determinism contract: cell products
    obs·n are computed in doubles — exact below 2⁵³ (n ≲ 10¹² with
    obs ≤ n ≲ 10⁶ distinct pairs is fine), and still bit-identical
    across engines beyond it (same rounding on the same inputs).
    """
    a = F.coalesce(F.col(a_col).cast("string"), F.lit("<NULL>"))
    b = F.coalesce(F.col(b_col).cast("string"), F.lit("<NULL>"))
    g = (
        df.select(a.alias("_a"), b.alias("_b"))
        .groupBy("_a", "_b")
        .agg(F.count(F.lit(1)).cast("long").alias("_c"))
    )
    ga = g.groupBy("_a").agg(F.sum("_c").cast("long").alias("_rt"))
    gb = g.groupBy("_b").agg(F.sum("_c").cast("long").alias("_ct"))
    spine = ga.crossJoin(gb)
    cells = spine.join(g, ["_a", "_b"], "left").select(
        "_a", "_b", "_rt", "_ct",
        F.coalesce(F.col("_c"), F.lit(0)).cast("long").alias("_obs"))
    tot = g.agg(F.sum("_c").cast("long").alias("_n"))
    ce = cells.crossJoin(F.broadcast(tot))
    d = (F.col("_obs").cast("double") * F.col("_n")
         - F.col("_rt").cast("double") * F.col("_ct"))
    term = F.floor(
        d * d * F.lit(1_000_000.0)
        / (F.col("_rt").cast("double") * F.col("_ct") * F.col("_n"))
    ).cast("long")
    out = ce.agg(
        F.max("_n").cast("long").alias("n_rows"),
        F.countDistinct("_a").cast("long").alias("n_a"),
        F.countDistinct("_b").cast("long").alias("n_b"),
        F.sum(term).cast("long").alias("chi2_ppm"),
    )
    mind = F.least(F.col("n_a") - 1, F.col("n_b") - 1)
    dof = ((F.col("n_a") - 1) * (F.col("n_b") - 1)).cast("long")
    v = F.floor(
        F.sqrt(F.col("chi2_ppm").cast("double")
               / (F.col("n_rows").cast("double") * mind
                  * F.lit(1_000_000.0))) * F.lit(1000.0)
    ).cast("long")
    return out.select(
        "n_rows", "n_a", "n_b", dof.alias("dof"), "chi2_ppm",
        F.when(mind > 0, v).alias("cramers_v_milli"),
    )


# ---------------------------------------------------------------------------
# Portable HyperLogLog — the one-pass mergeable distinct sketch, oracle-exact
# ---------------------------------------------------------------------------
#
# ``approx_count_distinct`` (Spark's HLL++) is the built-in scale path used
# by profile_long(exact=False), but its sketch is engine-private: no SQL
# oracle can replay it and no artifact can prove its per-partition merge is
# what ran. This block implements the classic HyperLogLog (Flajolet et al.
# 2007) from scratch on the portable md5-56 hash so BOTH the sketch state
# and the estimate are bit-identical in Spark and DuckDB:
#
#   bucket   = h mod 2^p                    (low p hash bits)
#   rank     = leading-zeros of the remaining w = 56-p bits, + 1
#            = w - length(bin(h div 2^p)) + 1   (pure integer/string ops —
#              no float log2, whose last-ulp rounding differs per engine)
#   sketch   = groupBy(bucket).max(rank)    (THE mergeable partial: Spark
#              runs it map-side per partition then merges — the
#              treeAggregate analogue built into whole-stage agg; a saved
#              sketch unions with any other by the same groupBy-max)
#   S        = Σ_buckets 2^(R - rank_j) with R = w+1 and empty buckets at
#              rank 0 — the harmonic-mean denominator as an EXACT int64
#              (max m·2^R = 2^(p+w+1) = 2^57 at p=8 — ANSI-safe)
#   estimate = α_m · m² · 2^R / S, one float op-order shared with the SQL
#              mirror (pow(2,k) is exact in doubles; α_m literal identical).
#
# No low-range (linear-counting) correction in the portable estimate: it
# needs ln(), which differs in the last ulp across engines (CLAUDE.md).
# Use p small enough that n > 2.5·2^p — the raw-HLL regime — or read
# v_empty from the output and apply the correction downstream.


def hll_cols(col: str, p: int) -> tuple[Column, Column]:
    """The stateless (bucket, rank) projection behind the sketch — shared
    by the batch operator and the streaming aggregation
    (``streaming.validate.stream_hll_sketch``)."""
    from jsonschema_spark.operators.dedup import hash56

    if not 4 <= p <= 16:
        raise ValueError("p must be in [4, 16]")
    w = 56 - p
    h = hash56(F.col(col).cast("string"))
    bucket = (h % F.lit(2 ** p)).cast("int").alias("bucket")
    rem = F.floor(h / F.lit(2 ** p)).cast("long")
    rank = (
        F.when(rem == 0, F.lit(w + 1))
        .otherwise(F.lit(w) - F.length(F.bin(rem)) + 1)
        .cast("int")
        .alias("rank")
    )
    return bucket, rank


def hll_sketch(df: DataFrame, col: str, p: int = 12) -> DataFrame:
    """Portable HLL partial for one column → (bucket:int, max_rank:int),
    non-empty buckets only (≤ 2^p rows). NULLs are excluded (matching
    count_distinct). Mergeable: union any number of sketches and re-run
    ``hll_merge`` — sketch(A ∪ B) ≡ merge(sketch(A), sketch(B))."""
    bucket, rank = hll_cols(col, p)
    return (
        df.where(F.col(col).isNotNull())
        .select(bucket, rank)
        .groupBy("bucket")
        .agg(F.max("rank").alias("max_rank"))
    )


def hll_merge(*sketches: DataFrame) -> DataFrame:
    """Union of any number of hll_sketch outputs (same p) — one groupBy-max.
    This is how per-partition / per-snapshot sketch state (e.g. the
    checkpoint manifest's uniqueness lineage) rolls up without rescanning."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bucket").agg(F.max("max_rank").alias("max_rank"))


def hll_alpha(p: int) -> float:
    """The standard HLL bias constant α_m (Flajolet et al. 2007)."""
    m = 2 ** p
    if m == 16:
        return 0.673
    if m == 32:
        return 0.697
    if m == 64:
        return 0.709
    return 0.7213 / (1.0 + 1.079 / m)


def hll_estimate(sketch: DataFrame, p: int) -> DataFrame:
    """Cardinality estimate from a portable sketch → ONE row
    (m, v_empty, s_sum, est_milli).

    s_sum is the exact-integer harmonic denominator (empty buckets count
    2^R); est_milli = floor(α_m · m² · 2^R / s_sum · 1000) with a single
    shared op order so DuckDB reproduces it bit-for-bit. v_empty > 0 with
    a small estimate means the linear-counting regime — widen the corpus
    or apply m·ln(m/v_empty) downstream (engine-local, not oracle-stable).
    """
    w = 56 - p
    big_r = w + 1
    m = 2 ** p
    alpha = hll_alpha(p)
    agg = sketch.agg(
        F.count(F.lit(1)).alias("_nb"),
        F.coalesce(
            F.sum(F.expr(f"shiftleft(cast(1 as bigint), {big_r} - max_rank)")),
            F.lit(0),
        ).alias("_s_used"),
    )
    s_sum = (F.col("_s_used") + (F.lit(m) - F.col("_nb")) * F.lit(2 ** big_r)).alias("s_sum")
    out = agg.select(
        F.lit(m).cast("long").alias("m"),
        (F.lit(m) - F.col("_nb")).cast("long").alias("v_empty"),
        s_sum,
    )
    est = F.floor(
        F.lit(alpha) * F.lit(float(2 ** (2 * p + big_r))) / F.col("s_sum").cast("double")
        * F.lit(1000.0)
    ).cast("long")
    return out.withColumn("est_milli", est)


def distinct_approx(df: DataFrame, col: str, p: int = 12) -> DataFrame:
    """One-pass portable distinct-count sketch + estimate for a column:
    the oracle-attestable analogue of ``approx_count_distinct`` (url
    uniqueness at crawl scale — north_rule). One aggregation over the
    table (map-side partials), one 2^p-row reduce."""
    return hll_estimate(hll_sketch(df, col, p), p)


# ---------------------------------------------------------------------------
# Portable count-min sketch — mergeable heavy-hitter counts, oracle-exact
# ---------------------------------------------------------------------------
#
# The frequency companion to the HLL block above (Cormode & Muthukrishnan
# 2005): d independent hash rows × w integer counters. Everything is
# integer sums over portable md5-56 buckets, so the sketch state, its
# merges and every point estimate are bit-identical across Spark, DuckDB
# and Python — unlike Misra-Gries/SpaceSaving, whose state depends on
# arrival order and can never be replayed by a SQL oracle. Guarantees:
# est ≥ true always (counters only over-count), and
# est ≤ true + εN with probability 1−δ for w = ⌈e/ε⌉, d = ⌈ln 1/δ⌉.
# Use: hot-url / hot-host / hot-token detection at crawl scale where the
# exact top-k (textstats.top_ngrams, search.bm25) would first need a
# corpus-wide distinct aggregation; the sketch is d·w rows of state,
# mergeable across partitions/snapshots by plain addition.


def _cms_probes(col: str, d: int, w: int) -> Column:
    """The d (row, bucket) probes for one value — row-salted portable
    hashes, shared by sketch build and lookup (and mirrored in SQL)."""
    from jsonschema_spark.operators.dedup import hash56

    return F.array(
        *[
            F.struct(
                F.lit(i).alias("row"),
                (
                    hash56(F.concat(F.lit(f"{i}:"), F.col(col).cast("string")))
                    % F.lit(w)
                ).cast("int").alias("bucket"),
            )
            for i in range(d)
        ]
    )


def cms_sketch(df: DataFrame, col: str, d: int = 4, w: int = 1024) -> DataFrame:
    """Count-min sketch of a column → (row:int, bucket:int, cnt:long),
    non-empty counters only (≤ d·w rows). Each input row contributes 1
    (pre-aggregate with a weight column upstream if needed — counters
    add). One explode of d tiny structs + one groupBy with map-side
    partials; NULLs excluded."""
    if d < 1 or w < 2:
        raise ValueError("need d >= 1 hash rows and w >= 2 buckets")
    return (
        df.where(F.col(col).isNotNull())
        .select(F.explode(_cms_probes(col, d, w)).alias("rb"))
        .groupBy(
            F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket")
        )
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Union of count-min sketches (same d, w): counters ADD — the
    per-partition / per-snapshot rollup, like hll_merge but with sum."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("row", "bucket").agg(F.sum("cnt").alias("cnt"))


def cms_join_size(
    sk_a: DataFrame, sk_b: DataFrame, d: int = 4,
) -> DataFrame:
    """Pre-flight join-cardinality estimate from two count-min
    sketches (the AGMS/CM inner-product result, Alon et al. 1999 /
    Cormode & Muthukrishnan 2005): |A ⋈ B| on a key = Σ_k cA(k)·cB(k),
    and the bucket-wise dot product of each hash row OVER-estimates it
    (colliding keys only add cross terms), so ``min`` over the d rows
    is an upper bound within ε·nA·nB with probability 1−δ. This is
    the broadcast-vs-salt-vs-shuffle decision BEFORE the 100 TB join
    — two ≤d·w-row sketches (built map-side, mergeable across
    snapshots) answer what the join would cost without running it.

    One ≤d·w-row join + one d-row aggregate; every arithmetic step
    is exact int64 (oracle-replayable). Bound: per-row dot ≤ nA·nB
    must stay < 2^63 — past ~3·10^9 rows a side, sketch a
    deterministic hash-sample and scale (ANSI throws rather than
    silently wrapping).
    """
    a = sk_a.select("row", "bucket", F.col("cnt").alias("_ca"))
    b = sk_b.select("row", "bucket", F.col("cnt").alias("_cb"))
    dots = (
        a.join(b, ["row", "bucket"])
        .groupBy("row")
        .agg(F.sum(F.col("_ca") * F.col("_cb")).alias("_dot"))
    )
    rows = sk_a.sparkSession.range(d).select(
        F.col("id").cast("int").alias("row"))
    return rows.join(dots, "row", "left").agg(
        F.min(F.coalesce(F.col("_dot"), F.lit(0))).cast("long")
        .alias("est_join_rows"))


def cms_lookup(
    sketch: DataFrame, items: DataFrame, col: str, d: int = 4, w: int = 1024
) -> DataFrame:
    """Point-estimate counts for a set of candidate values →
    (<col>, n_est). est = min over the d probed counters (0 when a
    counter is empty). The sketch is ≤ d·w rows — broadcast, so lookup
    is one explode + broadcast-join + groupBy-min over the candidates."""
    probed = items.select(
        F.col(col), F.explode(_cms_probes(col, d, w)).alias("rb")
    ).select(col, F.col("rb.row").alias("row"), F.col("rb.bucket").alias("bucket"))
    j = probed.join(F.broadcast(sketch), ["row", "bucket"], "left")
    return (
        j.groupBy(col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("n_est"))
    )


# ---------------------------------------------------------------------------
# Portable histogram sketch — mergeable quantiles + bounded-state KS drift
# ---------------------------------------------------------------------------
#
# The distribution companion to the HLL (distinct) and count-min
# (frequency) sketches above: a fixed-width n_bins integer histogram —
# the one-pass mergeable summary behind t-digest-style quantile/drift
# monitoring, in a form every engine replays bit-exactly (pure integer
# binning and rank-select; `percentile_approx` stays the engine-private
# alternative). State is n_bins rows FOREVER; counters add under union,
# so per-partition / per-snapshot sketches roll up by plain sum — and the
# same bins power a bounded-state KS drift check whose resolution is the
# bin width (`numeric_drift` above is the exact-KS path when per-value
# resolution is worth a corpus-wide distinct aggregation).
#
# Plan shape: groupBy(bin) runs with map-side partials; the reduction to
# ONE row collects the ≤ n_bins (bin, cnt) structs through the allowed
# global-agg-of-partials exchange, and quantile/KS extraction is a
# single projection over that tiny sorted array (higher-order aggregate —
# interpreted per element, n_bins elements, once). Nothing corpus-sized
# ever funnels into one task.
#
# Integer contracts (ANSI-safe): values clamp to [lo, hi] BEFORE the
# bin multiply, so (v-lo)·n_bins ≤ span·n_bins < 2^63 needs only
# span·n_bins in range; rank = (N−1)·p_ppm needs N < 2^63/10^6 ≈ 9·10^12
# rows; the KS gap uses the same per-side `div` formula as numeric_drift
# (cum·10^6 < 2^63 at the same bound).


def _hist_bin(colname: str, lo: int, hi: int, n_bins: int) -> Column:
    """bin = div((clamp(v) − lo)·n_bins, span), capped at n_bins−1 —
    exact integer `div` (operands are clamped non-negative)."""
    v = f"least(greatest(cast({colname} as bigint), {lo}), {hi})"
    return F.expr(
        f"cast(least((({v} - {lo}) * {n_bins}) div {hi - lo}, "
        f"{n_bins - 1}) as int)"
    )


def hist_sketch(
    df: DataFrame, col: str, lo: int, hi: int, n_bins: int = 256
) -> DataFrame:
    """Fixed-width histogram of a numeric column → (bin:int, cnt:long),
    non-empty bins only. Values clamp into the end bins (pick lo/hi from
    ``profile_long`` min/max); NULLs excluded. One groupBy with map-side
    partials — the sketch build costs the scan."""
    if hi <= lo or n_bins < 2:
        raise ValueError("need hi > lo and n_bins >= 2")
    return (
        df.where(F.col(col).isNotNull())
        .select(_hist_bin(col, lo, hi, n_bins).alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(*sketches: DataFrame) -> DataFrame:
    """Union of histogram sketches (same lo/hi/n_bins): counters add."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("bin").agg(F.sum("cnt").alias("cnt"))


def hist_quantiles(
    sketch: DataFrame,
    lo: int,
    hi: int,
    n_bins: int,
    ps_ppm: Sequence[int] = (250_000, 500_000, 750_000),
) -> DataFrame:
    """Rank-select quantiles from a histogram sketch → one row per
    requested quantile: (p_ppm, bin, edge_lo_milli, edge_hi_milli, rank,
    total). rank = (total−1)·p_ppm div 10^6 + 1 (1-based); the answer bin
    is the first whose cumulative count reaches the rank; the bin edges
    bracket the true quantile to one bin width. Pure integer — the SQL
    oracle replays every value."""
    one = sketch.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("bin"), F.col("cnt")))
        ).alias("h"),
        F.coalesce(F.sum("cnt"), F.lit(0)).cast("long").alias("total"),
    )
    rows = one.select(
        F.explode(F.array(*[F.lit(int(p)) for p in ps_ppm])).alias("p_ppm"),
        "h",
        "total",
    ).withColumn("rank", F.expr("(total - 1) * p_ppm div 1000000 + 1"))
    pick = F.expr(
        "aggregate(h, named_struct('cum', cast(0 as bigint), 'bin', -1), "
        "(acc, x) -> IF(acc.bin >= 0, acc, "
        "  named_struct('cum', acc.cum + x.cnt, "
        "               'bin', IF(acc.cum + x.cnt >= rank, x.bin, -1))), "
        "acc -> acc.bin)"
    )
    span = hi - lo
    return rows.select(
        "p_ppm",
        pick.alias("bin"),
        (F.lit(lo * 1000) + F.expr(f"bin * {span} * 1000 div {n_bins}")).alias("_tmp_lo"),
        "rank",
        "total",
    ).select(
        "p_ppm",
        "bin",
        (F.lit(lo * 1000) + F.expr(f"cast(bin as bigint) * {span} * 1000 div {n_bins}"))
        .cast("long").alias("edge_lo_milli"),
        (F.lit(lo * 1000) + F.expr(f"(cast(bin as bigint) + 1) * {span} * 1000 div {n_bins}"))
        .cast("long").alias("edge_hi_milli"),
        "rank",
        "total",
    )


def hist_drift(
    df: DataFrame,
    col: str,
    split: Column,
    lo: int,
    hi: int,
    n_bins: int = 256,
) -> DataFrame:
    """Bounded-state KS drift between two row populations of the same
    table over the shared histogram bins — same output row and same
    per-side integer-`div` CDF formula as the exact ``numeric_drift``
    ((ks_ppm, n_base, n_cur)), but state is n_bins counters instead of a
    corpus-wide distinct aggregation: KS resolution trades down to one
    bin width, cost trades down to one scan + one tiny reduce. This is
    the drift check a STREAMING monitor can maintain (counters add)."""
    g = (
        df.where(F.col(col).isNotNull())
        .select(
            _hist_bin(col, lo, hi, n_bins).alias("bin"),
            F.when(split, 1).otherwise(0).alias("_b"),
        )
        .groupBy("bin")
        .agg(
            F.sum("_b").cast("long").alias("nb"),
            F.sum(F.lit(1) - F.col("_b")).cast("long").alias("nc"),
        )
    )
    one = g.agg(
        F.array_sort(
            F.collect_list(F.struct(F.col("bin"), F.col("nb"), F.col("nc")))
        ).alias("h"),
        F.coalesce(F.sum("nb"), F.lit(0)).cast("long").alias("tb"),
        F.coalesce(F.sum("nc"), F.lit(0)).cast("long").alias("tc"),
    )
    ks = F.expr(
        "aggregate(h, named_struct('cb', cast(0 as bigint), "
        "                          'cc', cast(0 as bigint), "
        "                          'ks', cast(0 as bigint)), "
        "(acc, x) -> named_struct("
        "  'cb', acc.cb + x.nb, 'cc', acc.cc + x.nc, "
        "  'ks', greatest(acc.ks, abs("
        "     (acc.cb + x.nb) * 1000000 div greatest(tb, 1) "
        "   - (acc.cc + x.nc) * 1000000 div greatest(tc, 1)))), "
        "acc -> acc.ks)"
    )
    return one.select(
        ks.cast("long").alias("ks_ppm"),
        F.col("tb").alias("n_base"),
        F.col("tc").alias("n_cur"),
    )


# ---------------------------------------------------------------------------
# Portable KMV / theta sketch — distinct counts AND set-operation estimates
# ---------------------------------------------------------------------------
#
# The set-operation companion to the HLL block above (Bar-Yossef et al.
# 2002 k-minimum-values; Dasgupta et al. 2016 theta-sketch framework).
# HLL merges under UNION only; crawl curation constantly asks the
# intersection question — "how many urls do two snapshots share", "what
# fraction of corpus B is already in corpus A" — which HLL cannot answer
# without inclusion-exclusion error blowup. KMV keeps the k smallest
# DISTINCT portable md5-56 hash values; because "k smallest distinct
# hashes" is a pure function of the value SET, the sketch state is
# bit-identical across Spark, DuckDB and any partitioning, and a DuckDB
# oracle replays it verbatim (DISTINCT → ORDER BY → LIMIT k).
#
#   state    = k smallest distinct hv (≤ k rows of one BIGINT)
#   estimate = (k-1) · 2^56 / θ with θ = the k-th smallest (exact count
#              when the sketch holds the whole set: n_kept < k)
#   union    = merge sketches, re-truncate to k (associative, idempotent)
#   A ∩ B    = |{hv in BOTH sketches, hv < θ_union}| · 2^56 / θ_union —
#              the theta trick: below θ_union both sketches are complete
#              samples of the same fixed hash prefix, so matches form an
#              unbiased intersection sample. Jaccard = n_match / k.
#
# Plan shape at crawl scale: the distinct is a groupBy, so Spark collapses
# duplicates map-side (partial HashAggregate) and the exchange moves only
# per-partition-DISTINCT hashes — the exact-distinct lower bound — then
# orderBy(hv).limit(k) plans TakeOrderedAndProject (parallel per-partition
# top-k, never a single-partition sort). Post-sketch ops touch ≤ k rows.
# No streaming form: a KMV heap is arrival-order-bounded state that
# flatMapGroupsWithState could hold, but the result would not be a plain
# replayable aggregation like the HLL/CMS/histogram monitors — use those
# for streams, KMV for batch snapshot algebra.


def kmv_sketch(df: DataFrame, col: str, k: int = 1024) -> DataFrame:
    """Portable KMV sketch of a column → (hv:long), the k smallest
    distinct md5-56 hash values (≤ k rows). NULLs excluded (matching
    count_distinct). Deterministic: a pure function of the value set."""
    from jsonschema_spark.operators.dedup import hash56

    if not 16 <= k <= 65536:
        raise ValueError("k must be in [16, 65536]")
    return (
        df.where(F.col(col).isNotNull())
        .select(hash56(F.col(col).cast("string")).alias("hv"))
        .distinct()
        .orderBy("hv")
        .limit(k)
    )


def kmv_merge(*sketches: DataFrame, k: int) -> DataFrame:
    """Union of any number of kmv_sketch outputs (same k) — union,
    distinct, re-truncate. merge(sketch(A), sketch(B)) ≡ sketch(A ∪ B),
    so per-partition / per-snapshot sketch state rolls up losslessly."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct().orderBy("hv").limit(k)


def kmv_estimate(sketch: DataFrame, k: int) -> DataFrame:
    """Cardinality estimate from a KMV sketch → ONE row
    (k, n_kept, theta, est_milli). Exact (n_kept·1000) while the sketch
    holds the whole set; otherwise floor((k-1)·2^56/θ·1000) with one
    float op order shared with the SQL mirror (2^56 and k-1 are exact
    doubles; n_kept ≤ 2^16 keeps every product exact)."""
    agg = sketch.agg(
        F.count(F.lit(1)).alias("_n"),
        F.coalesce(F.max("hv"), F.lit(0)).alias("_mx"),
    )
    est = (
        F.when(F.col("_n") < k, F.col("_n").cast("long") * 1000)
        .otherwise(
            F.floor(
                F.lit(float(k - 1)) * F.lit(float(2 ** 56))
                / F.col("_mx").cast("double") * F.lit(1000.0)
            ).cast("long")
        )
    )
    return agg.select(
        F.lit(k).cast("long").alias("k"),
        F.col("_n").cast("long").alias("n_kept"),
        F.col("_mx").cast("long").alias("theta"),
        est.alias("est_milli"),
    )


def kmv_overlap(sketch_a: DataFrame, sketch_b: DataFrame, k: int) -> DataFrame:
    """Theta-style set-operation estimates from two KMV sketches → ONE row
    (k, n_union_kept, theta, n_match, jaccard_ppm, est_union_milli,
    est_inter_milli).

    θ is the union sketch's k-th smallest hash (2^56 when the union is
    complete, i.e. n_union_kept < k — then every estimate is exact).
    n_match counts hashes present in BOTH input sketches below θ; the
    intersection estimate is n_match·2^56/θ and Jaccard is the integer
    ppm n_match/n_union_kept. Every join/aggregate here touches ≤ k rows
    per side — the corpus was only scanned by kmv_sketch."""
    u = kmv_merge(sketch_a, sketch_b, k=k)
    th = u.agg(
        F.count(F.lit(1)).alias("n_union_kept"),
        F.coalesce(F.max("hv"), F.lit(0)).alias("_mx"),
    ).select(
        F.col("n_union_kept").cast("long").alias("n_union_kept"),
        F.when(F.col("n_union_kept") < k, F.lit(2 ** 56))
        .otherwise(F.col("_mx")).cast("long").alias("theta"),
    )
    inter = sketch_a.join(sketch_b, "hv").select("hv")
    cnt = (
        inter.crossJoin(F.broadcast(th.select("theta")))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("hv") < F.col("theta"), 1)), F.lit(0)
            ).cast("long").alias("n_match")
        )
    )
    one = th.crossJoin(F.broadcast(cnt))
    est_union = (
        F.when(F.col("n_union_kept") < k,
               F.col("n_union_kept") * 1000)
        .otherwise(
            F.floor(
                F.lit(float(k - 1)) * F.lit(float(2 ** 56))
                / F.col("theta").cast("double") * F.lit(1000.0)
            ).cast("long")
        )
    )
    est_inter = F.floor(
        F.col("n_match").cast("double") * F.lit(float(2 ** 56))
        / F.col("theta").cast("double") * F.lit(1000.0)
    ).cast("long")
    jac = (
        F.when(F.col("n_union_kept") == 0, F.lit(0).cast("long"))
        .otherwise(
            F.expr("n_match * 1000000 div n_union_kept").cast("long")
        )
    )
    return one.select(
        F.lit(k).cast("long").alias("k"),
        "n_union_kept", "theta", "n_match",
        jac.alias("jaccard_ppm"),
        est_union.alias("est_union_milli"),
        est_inter.alias("est_inter_milli"),
    )


# ---------------------------------------------------------------------------
# Portable Bloom filter — bounded-state membership, oracle-exact
# ---------------------------------------------------------------------------
#
# The membership companion completing the portable-sketch family (HLL =
# cardinality, CMS = frequency, histogram = distribution, KMV = set
# algebra, Bloom = membership). Spark's own BloomFilter (referential.py's
# scale path) is engine-private state no SQL oracle can replay; this one
# is k_h salted portable md5-56 hashes mod m bits, so the ENTIRE bit set,
# its merges (union = bitwise OR = distinct union of set-bit indices) and
# every probe verdict are bit-identical across Spark, DuckDB and Python.
# Guarantees: NO false negatives ever; false-positive rate ≈
# (1 - e^(-k_h·n/m))^k_h — size m for the corpus, the state stays ≤ m
# rows no matter how many values stream in (the streaming monitor form is
# a plain groupBy aggregation, streaming/validate.stream_bloom_sketch).
# Use: crawl-scale referential / decontamination prefilter where shipping
# the full key set (broadcast join) no longer fits but m bits do.


def bloom_cols(col: str, m_bits: int, k_hashes: int) -> Column:
    """The stateless per-value projection: array of k_h salted bit
    positions — shared by the batch builder and the streaming monitor."""
    from jsonschema_spark.operators.dedup import hash56

    if not 64 <= m_bits <= 1 << 30:
        raise ValueError("m_bits must be in [64, 2^30]")
    if not 1 <= k_hashes <= 16:
        raise ValueError("k_hashes must be in [1, 16]")
    return F.array(*[
        (hash56(F.concat(F.lit(f"b{j}:"), F.col(col).cast("string")))
         % F.lit(m_bits)).cast("long")
        for j in range(k_hashes)
    ])


def bloom_sketch(df: DataFrame, col: str, m_bits: int = 65536,
                 k_hashes: int = 3) -> DataFrame:
    """Portable Bloom state for one column → (bit:long), the distinct set
    bit positions (≤ m_bits rows, ≤ k_h·n before dedup). NULLs excluded.
    One explode + one distinct whose map-side partial is bounded at
    m_bits rows per task — the shuffle never exceeds partitions·m."""
    return (
        df.where(F.col(col).isNotNull())
        .select(F.explode(bloom_cols(col, m_bits, k_hashes)).alias("bit"))
        .distinct()
    )


def bloom_merge(*sketches: DataFrame) -> DataFrame:
    """Union of any number of bloom_sketch outputs (same m, k) — bitwise
    OR as a distinct union. merge(sketch(A), sketch(B)) ≡ sketch(A ∪ B)."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.distinct()


def bloom_probe(sketch: DataFrame, probes: DataFrame, col: str,
                m_bits: int = 65536, k_hashes: int = 3) -> DataFrame:
    """Membership verdict per probe row → (col, n_hit, maybe_member).
    maybe_member = all k_h bit positions set (no false negatives; false
    positives at the sized-for rate). Plan: explode probe bits →
    broadcast-able join against the ≤ m-row bit set → groupBy(probe)
    counting hits — the probe side never sorts, the sketch side is
    bounded state."""
    p = (
        probes.where(F.col(col).isNotNull())
        .select(F.col(col).alias("_v"),
                F.explode(bloom_cols(col, m_bits, k_hashes)).alias("bit"))
    )
    hits = (
        p.join(F.broadcast(sketch.select(F.col("bit").alias("_sb"))),
               p["bit"] == F.col("_sb"), "left")
        .groupBy("_v")
        .agg(F.sum(F.when(F.col("_sb").isNotNull(), 1).otherwise(0))
             .cast("long").alias("n_hit"))
    )
    return hits.select(
        F.col("_v").alias(col),
        "n_hit",
        (F.col("n_hit") == k_hashes).alias("maybe_member"),
    )


# --- t-digest: adaptive-accuracy mergeable quantile sketch ----------------
#
# The north-star names "t-digest quantiles for warc_ts and text length"
# explicitly. hist_sketch above is the fixed-bin, bit-stable,
# oracle-replayable sibling; THIS is the classic adaptive sketch (Dunning
# & Ertl, "Computing extremely accurate quantiles using t-digests"):
# centroid weights bounded by the k1 scale function, so accuracy is
# ~q(1-q)·4/δ — tails far sharper than any fixed binning, no lo/hi
# choice needed, state bounded at ≤δ centroids regardless of input size.
#
# Build is the ONE-SHOT k-binning construction: sort, take midpoint ranks
# q_i = (cum_i − w_i/2)/N, bin by floor(k1(q_i)) with
# k1(q) = (δ/2π)·asin(2q−1), emit one weighted-mean centroid per bin —
# fully numpy-vectorized (no per-value Python loop), deterministic given
# the input multiset of (value[, weight]) pairs. Merging re-runs the same
# binning over the union of centroid lists, so partition partials merge
# exactly like snapshot rollups (associativity within the documented
# accuracy envelope — the t-digest, unlike the sketches above, is NOT a
# pure set function: centroid placement depends on partition boundaries.
# Quantile ESTIMATES carry the accuracy bound regardless; anything
# needing bit-stable state uses hist_sketch/kmv_sketch instead).
#
# Scale shape: mapInPandas partition partials (≤δ centroid rows per
# partition, Arrow-batched) → ONE global agg of partials
# (collect_list into a single bounded array — the allowed exchange) →
# final merge + quantile extraction as scalar numpy over ≤n_parts·δ
# centroids. The corpus is touched once, nothing corpus-sized ever
# funnels to one task.

TDIGEST_SCHEMA = "mean double, weight long"


def _tdigest_compress(means, weights, compression: int):
    """One-shot k1-binning compression of (means, weights) -> centroid
    arrays; numpy-vectorized, deterministic for a given input ORDER of
    equal means (inputs are sorted by (mean, weight) first)."""
    import numpy as np

    order = np.lexsort((weights, means))
    m = np.asarray(means, dtype=np.float64)[order]
    w = np.asarray(weights, dtype=np.int64)[order]
    n = w.sum()
    if len(m) <= 1 or n == 0:
        return m, w
    cum = np.cumsum(w)
    q_mid = (cum - w / 2.0) / n
    k = np.floor(
        (compression / (2.0 * np.pi))
        * np.arcsin(np.clip(2.0 * q_mid - 1.0, -1.0, 1.0))
        + compression / 4.0
    )
    # group consecutive equal-k runs
    new_grp = np.concatenate(([True], k[1:] != k[:-1]))
    gid = np.cumsum(new_grp) - 1
    n_g = gid[-1] + 1
    gw = np.zeros(n_g, dtype=np.int64)
    np.add.at(gw, gid, w)
    gm = np.zeros(n_g, dtype=np.float64)
    np.add.at(gm, gid, m * w)
    gm = gm / gw
    return gm, gw


def tdigest_sketch(
    df: DataFrame,
    col: str,
    compression: int = 100,
) -> DataFrame:
    """Build a t-digest over a numeric column. Returns ONE row:
    (centroids array<struct<mean double, weight long>>, n_rows long).
    NULLs are excluded (SQL aggregate semantics)."""
    if not (10 <= compression <= 10_000):
        raise ValueError("tdigest_sketch: compression must be in [10, 1e4]")

    def partial(it):
        import numpy as np
        import pandas as pd

        vals = []
        for pdf in it:
            v = pd.to_numeric(pdf[col], errors="coerce").dropna()
            if len(v):
                vals.append(v.to_numpy(dtype=np.float64))
        if not vals:
            return
        v = np.concatenate(vals)
        gm, gw = _tdigest_compress(v, np.ones(len(v), dtype=np.int64),
                                   compression)
        yield pd.DataFrame({"mean": gm, "weight": gw})

    partials = df.select(F.col(col).cast("double").alias(col)) \
        .where(F.col(col).isNotNull()) \
        .mapInPandas(partial, schema=TDIGEST_SCHEMA)
    one = partials.groupBy().agg(
        F.collect_list(F.struct("mean", "weight")).alias("_parts"),
        F.sum("weight").cast("long").alias("n_rows"),
    )

    @F.pandas_udf("array<struct<mean:double,weight:bigint>>")
    def merge_udf(parts: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for arr in parts:
            if arr is None or len(arr) == 0:
                out.append([])
                continue
            means = np.array([c["mean"] for c in arr])
            ws = np.array([c["weight"] for c in arr])
            gm, gw = _tdigest_compress(means, ws, compression)
            out.append([{"mean": float(a), "weight": int(b)}
                        for a, b in zip(gm, gw)])
        return pd.Series(out)

    return one.select(
        merge_udf(F.col("_parts")).alias("centroids"),
        F.coalesce(F.col("n_rows"), F.lit(0)).alias("n_rows"),
    )


def tdigest_merge(*sketches: DataFrame, compression: int = 100) -> DataFrame:
    """Union t-digests (snapshot rollup): re-bin the concatenated
    centroid lists — same accuracy envelope as building over the union."""
    from functools import reduce

    allp = reduce(lambda a, b: a.unionByName(b), sketches) \
        .select(F.explode("centroids").alias("c"), "n_rows")
    one = allp.groupBy().agg(
        F.collect_list("c").alias("_parts"),
        F.sum(F.col("c.weight")).cast("long").alias("n_rows"),
    )

    @F.pandas_udf("array<struct<mean:double,weight:bigint>>")
    def merge_udf(parts: pd.Series) -> pd.Series:
        import numpy as np

        out = []
        for arr in parts:
            means = np.array([c["mean"] for c in arr])
            ws = np.array([c["weight"] for c in arr])
            gm, gw = _tdigest_compress(means, ws, compression)
            out.append([{"mean": float(a), "weight": int(b)}
                        for a, b in zip(gm, gw)])
        return pd.Series(out)

    return one.select(merge_udf(F.col("_parts")).alias("centroids"),
                      "n_rows")


def tdigest_quantile_py(centroids, n: int, q: float) -> float:
    """Quantile estimate from a centroid list (standard midpoint
    interpolation). Pure Python/numpy — centroids are sketch-sized."""
    import numpy as np

    if centroids is None or len(centroids) == 0 or n == 0:
        return float("nan")
    m = np.array([c["mean"] for c in centroids])
    w = np.array([c["weight"] for c in centroids], dtype=np.float64)
    if len(m) == 1:
        return float(m[0])
    cum = np.cumsum(w) - w / 2.0  # centroid midpoint ranks
    target = q * n
    if target <= cum[0]:
        return float(m[0])
    if target >= cum[-1]:
        return float(m[-1])
    i = int(np.searchsorted(cum, target) )
    lo, hi = cum[i - 1], cum[i]
    f = (target - lo) / (hi - lo)
    return float(m[i - 1] + f * (m[i] - m[i - 1]))


def tdigest_quantiles(
    sketch: DataFrame,
    ps: Sequence[float] = (0.01, 0.25, 0.5, 0.75, 0.99),
    compression: int = 100,
) -> DataFrame:
    """Quantile estimates from a t-digest sketch row: one output row per
    p — (p_ppm, q_est double). Post-sketch work touches ≤δ centroids."""
    ps = list(ps)

    @F.pandas_udf("array<double>")
    def q_udf(cent: pd.Series, n: pd.Series) -> pd.Series:
        return pd.Series([
            [tdigest_quantile_py(c, int(nn), p) for p in ps]
            for c, nn in zip(cent, n)
        ])

    arr = sketch.select(
        q_udf(F.col("centroids"), F.col("n_rows")).alias("qs"))
    pairs = arr.select(F.posexplode("qs").alias("i", "q_est"))
    p_arr = F.array(*[F.lit(int(p * 1_000_000)) for p in ps])
    return pairs.select(
        F.element_at(p_arr, F.col("i").cast("int") + 1).cast("long")
        .alias("p_ppm"),
        F.col("q_est"),
    )


def hot_keys(df: DataFrame, key_cols: Sequence[str], k: int = 20) -> DataFrame:
    """Heavy-hitter report for a prospective shuffle key — the
    measurement that decides salting / AQE-skew-join / broadcast before
    a 100 TB job, instead of discovering the straggler at hour three.

    Output: top-``k`` keys by row count with (cnt, share_ppm, rnk);
    ties break to the ascending key (deterministic cross-engine).

    Scale shape: ONE map-side-partial groupBy(key) — the count table is
    keys-sized — then ``orderBy().limit(k)`` = TakeOrderedAndProject
    (each partition forwards only its own top-k; never a global sort),
    a broadcast one-row total for the share, and a window over the k
    survivors only. The hot key itself cannot hurt THIS job: partial
    aggregation collapses it map-side before the exchange."""
    from pyspark.sql.window import Window

    keys = [F.col(c) for c in key_cols]
    g = df.groupBy(*keys).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    tot = g.agg(F.sum("cnt").alias("_n"))
    order = [F.col("cnt").desc()] + [F.col(c).asc() for c in key_cols]
    top = g.orderBy(*order).limit(k)
    w = Window.orderBy(*order)
    return top.crossJoin(F.broadcast(tot)).select(
        *key_cols,
        "cnt",
        F.floor(F.col("cnt") * 1_000_000 / F.col("_n")).cast("long")
        .alias("share_ppm"),
        F.row_number().over(w).cast("long").alias("rnk"),
    )


def key_size_histogram(df: DataFrame, key_cols: Sequence[str]) -> DataFrame:
    """Key-size distribution as a log2 histogram — the whole shape of
    the skew in O(64) output rows: bucket = bit length of the per-key
    row count (``length(bin(cnt))``, portable Spark↔DuckDB for positive
    int64 — the same trick as the HLL rank), with per-bucket key count,
    row mass, row share and max key size. Reading it: a healthy key has
    its mass in low buckets; a bucket-40 entry IS the salting decision.

    Scale shape: groupBy(key) with map-side partials (keys-sized), then
    a groupBy over ≤64 buckets, then one broadcast one-row total. No
    windows, no sorts, nothing key-cardinality-sized leaves the second
    aggregation."""
    keys = [F.col(c) for c in key_cols]
    g = df.groupBy(*keys).agg(F.count(F.lit(1)).cast("long").alias("cnt"))
    h = g.groupBy(
        F.length(F.bin(F.col("cnt"))).cast("long").alias("cnt_bits")
    ).agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum("cnt").cast("long").alias("n_rows"),
        F.max("cnt").cast("long").alias("max_cnt"),
    )
    tot = h.agg(F.sum("n_rows").alias("_n"))
    return h.crossJoin(F.broadcast(tot)).select(
        "cnt_bits", "n_keys", "n_rows", "max_cnt",
        F.floor(F.col("n_rows") * 1_000_000 / F.col("_n")).cast("long")
        .alias("rows_share_ppm"),
    )


def volume_trend(
    df: DataFrame,
    ts_col: str,
    unit: str = "day",
) -> DataFrame:
    """Exact least-squares trend of row volume per calendar bucket —
    the "is this metric drifting up day over day?" monitor. One
    summary row:

    ``(n_buckets, total_rows, first_bucket, last_bucket, slope_milli)``

    ``slope_milli`` = floor(1000·(nΣxy − ΣxΣy)/(nΣx² − (Σx)²)) —
    rows per ``unit`` per unit, from EXACT int64 sums with one IEEE
    division (the pairwise_corr recipe); NULL when fewer than two
    buckets. x is the bucket index on a FULL calendar spine between
    the observed min and max — empty buckets count as zero volume
    (a gap day is evidence of decline, not absence of evidence).

    One corpus exchange (the bucket groupBy, map-side combinable);
    the spine, the zero-fill and the final fold all run at calendar
    cardinality. ``unit`` ∈ {'day', 'week', 'month'}; bucket
    arithmetic is exact wall-time field math (never epoch — the
    tz-proof currency for naive data).
    """
    if unit not in ("day", "week", "month"):
        raise ValueError("unit must be day|week|month")
    b = F.to_date(F.date_trunc(unit, F.col(ts_col)))
    g = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(b.alias("_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("_y"))
    )
    rng = g.agg(F.min("_b").alias("_lo"), F.max("_b").alias("_hi"),
                F.sum("_y").cast("long").alias("_tot"))
    step = {"day": "interval 1 day", "week": "interval 1 week",
            "month": "interval 1 month"}[unit]
    spine = rng.select(
        "_lo", "_hi", "_tot",
        F.explode(F.sequence(
            F.col("_lo"), F.col("_hi"),
            F.expr(step))).alias("_b"))
    if unit == "month":
        x = ((F.year("_b") - F.year("_lo")) * 12
             + (F.month("_b") - F.month("_lo"))).cast("long")
    elif unit == "week":
        x = (F.datediff("_b", "_lo") / 7).cast("long")
    else:
        x = F.datediff("_b", "_lo").cast("long")
    j = spine.join(g, "_b", "left").select(
        "_lo", "_hi", "_tot", x.alias("_x"),
        F.coalesce(F.col("_y"), F.lit(0)).cast("long").alias("_yy"))
    a = j.agg(
        F.count(F.lit(1)).cast("long").alias("n_buckets"),
        F.max("_tot").cast("long").alias("total_rows"),
        F.date_format(F.max("_lo"), "yyyy-MM-dd").alias("first_bucket"),
        F.date_format(F.max("_hi"), "yyyy-MM-dd").alias("last_bucket"),
        F.sum("_x").alias("_sx"),
        F.sum("_yy").alias("_sy"),
        F.sum(F.col("_x") * F.col("_yy")).alias("_sxy"),
        F.sum(F.col("_x") * F.col("_x")).alias("_sxx"),
    )
    num = F.col("n_buckets") * F.col("_sxy") - F.col("_sx") * F.col("_sy")
    den = F.col("n_buckets") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    return a.select(
        "n_buckets", "total_rows", "first_bucket", "last_bucket",
        F.when(den > 0,
               F.floor(num.cast("double") * F.lit(1000.0) / den))
        .cast("long").alias("slope_milli"),
    )


def volume_anomaly(
    df: DataFrame,
    ts_col: str,
    unit: str = "day",
    z_milli_threshold: int = 3000,
) -> DataFrame:
    """Per-period volume burst/collapse detection: each calendar
    bucket's row count scored as an exact-arithmetic z-score against
    the mean/std of ALL buckets (zero-filled spine — a silent day IS
    an anomaly). Per bucket:

    ``(bucket, n_rows, z_milli, status)``

    ``z_milli`` = floor(1000·(n·y − Σy)/sqrt(n·Σy² − (Σy)²)) — the
    pairwise_corr recipe: exact int64 sums, ONE IEEE sqrt + division,
    bit-stable cross-engine; NULL when the variance is zero. status ∈
    {'high', 'low', 'ok'} vs ±``z_milli_threshold``. Complements
    partition_anomaly (median-ratio lens) with the variance lens for
    time series where scale drifts.

    One corpus exchange (bucket groupBy); the spine, global sums and
    scoring run at calendar cardinality.
    """
    if unit not in ("day", "week", "month"):
        raise ValueError("unit must be day|week|month")
    b = F.to_date(F.date_trunc(unit, F.col(ts_col)))
    g = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(b.alias("_b"))
        .agg(F.count(F.lit(1)).cast("long").alias("_y"))
    )
    rng = g.agg(F.min("_b").alias("_lo"), F.max("_b").alias("_hi"))
    step = {"day": "interval 1 day", "week": "interval 1 week",
            "month": "interval 1 month"}[unit]
    spine = rng.select(F.explode(F.sequence(
        F.col("_lo"), F.col("_hi"), F.expr(step))).alias("_b"))
    filled = spine.join(g, "_b", "left").select(
        "_b", F.coalesce(F.col("_y"), F.lit(0)).cast("long").alias("_y"))
    tots = filled.agg(
        F.count(F.lit(1)).cast("long").alias("_n"),
        F.sum("_y").cast("long").alias("_sy"),
        F.sum(F.col("_y") * F.col("_y")).cast("long").alias("_syy"),
    )
    j = filled.crossJoin(F.broadcast(tots))
    var = F.col("_n") * F.col("_syy") - F.col("_sy") * F.col("_sy")
    z = F.floor(
        (F.col("_n") * F.col("_y") - F.col("_sy")).cast("double")
        * F.lit(1000.0) / F.sqrt(var.cast("double"))
    ).cast("long")
    zc = F.when(var > 0, z)
    return j.select(
        F.date_format("_b", "yyyy-MM-dd").alias("bucket"),
        F.col("_y").alias("n_rows"),
        zc.alias("z_milli"),
        F.when(zc > z_milli_threshold, F.lit("high"))
        .when(zc < -z_milli_threshold, F.lit("low"))
        .otherwise(F.lit("ok")).alias("status"),
    )


def ab_test(
    df: DataFrame,
    variant: Column,
    success: Column,
) -> DataFrame:
    """Two-proportion z-test between variant A (``variant`` true) and
    B — the directional form of a 2×2 chi-square (z² = χ²), pinned to
    one shared IEEE op order so the statistic is bit-stable
    cross-engine. One row:

    ``(n_a, n_b, succ_a, succ_b, rate_a_ppm, rate_b_ppm, z_milli)``

    z = (p_a − p_b)/sqrt(p̂(1−p̂)(1/n_a + 1/n_b)) with p̂ the pooled
    rate; all inputs exact int64 counts from ONE conditional-sum
    aggregation over ONE scan; NULL z when either arm is empty or the
    pooled variance is zero. Rows where ``success`` is NULL count as
    failures (document the predicate, not the data, decides).
    """
    sa = F.sum(F.when(variant & success, 1).otherwise(0)).cast("long")
    sb = F.sum(F.when(~variant & success, 1).otherwise(0)).cast("long")
    na = F.sum(variant.cast("long")).cast("long")
    nb = F.sum((~variant).cast("long")).cast("long")
    one = df.agg(na.alias("n_a"), nb.alias("n_b"),
                 sa.alias("succ_a"), sb.alias("succ_b"))
    pa = F.col("succ_a").cast("double") / F.col("n_a")
    pb = F.col("succ_b").cast("double") / F.col("n_b")
    pp = ((F.col("succ_a") + F.col("succ_b")).cast("double")
          / (F.col("n_a") + F.col("n_b")))
    se2 = (pp * (F.lit(1.0) - pp)
           * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b")))
    z = F.floor((pa - pb) * F.lit(1000.0) / F.sqrt(se2)).cast("long")
    return one.select(
        "n_a", "n_b", "succ_a", "succ_b",
        F.when(F.col("n_a") > 0,
               F.floor(F.col("succ_a").cast("double") * F.lit(1e6)
                       / F.col("n_a"))).cast("long").alias("rate_a_ppm"),
        F.when(F.col("n_b") > 0,
               F.floor(F.col("succ_b").cast("double") * F.lit(1e6)
                       / F.col("n_b"))).cast("long").alias("rate_b_ppm"),
        F.when((F.col("n_a") > 0) & (F.col("n_b") > 0) & (se2 > 0), z)
        .alias("z_milli"),
    )


def winsorize_by_group(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo_p: float = 0.05,
    hi_p: float = 0.95,
) -> DataFrame:
    """Per-group percentile winsorization: clip ``value_col`` to its
    group's [lo_p, hi_p] exact percentiles — the heavy-tail
    preprocessing step before any n·Σx²-bounded exact statistic
    (pairwise_corr, ab_test) or spill-prone aggregate. Input columns
    pass through plus:

    ``(<value>_clipped, clip_flag ∈ {'lo', 'hi', NULL})``

    Group percentile bounds come from ONE groupBy agg (exact
    ``percentile`` — linear interpolation, the same double arithmetic
    both engines) joined back by the group key — groups must be
    bounded categories (languages, shards), so the bounds table
    broadcasts. NULL values pass through unclipped with NULL flag.
    """
    v = F.col(value_col).cast("double")
    bounds = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.percentile(v, F.lit(float(lo_p))).alias("_lo"),
        F.percentile(v, F.lit(float(hi_p))).alias("_hi"),
    )
    j = df.join(
        F.broadcast(bounds), F.col(group_col) == F.col("_g"), "left")
    clipped = F.when(v < F.col("_lo"), F.col("_lo")) \
        .when(v > F.col("_hi"), F.col("_hi")).otherwise(v)
    flag = F.when(v < F.col("_lo"), F.lit("lo")) \
        .when(v > F.col("_hi"), F.lit("hi"))
    return j.select(
        *[F.col(c) for c in df.columns],
        clipped.alias(f"{value_col}_clipped"),
        flag.alias("clip_flag"),
    )


def top_k_per_group(
    df: DataFrame,
    group_cols: Sequence[str],
    order_by: Sequence[Column],
    k: int,
) -> DataFrame:
    """Generic top-k within each group — the grouped counterpart of
    the global orderBy+limit pattern: ONE partitioned window
    (row_number over the caller's deterministic ``order_by``; pass a
    unique tiebreak column last or equal rows rank arbitrarily),
    filtered to rank ≤ k. Adds ``rnk`` (1-based). The window is
    PARTITIONED by the group keys, so no single-task funnel exists at
    any group count; a hot group costs its own sort only. For the
    GLOBAL top-k use orderBy+limit instead (TakeOrderedAndProject)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*[F.col(c) for c in group_cols]) \
        .orderBy(*order_by)
    return (
        df.withColumn("rnk", F.row_number().over(w).cast("long"))
        .where(F.col("rnk") <= k)
    )


def group_median_mad(
    df: DataFrame,
    group_col: str,
    value_col: str,
) -> DataFrame:
    """Robust per-group center/spread: exact interpolated median and
    MAD (median absolute deviation) — the outlier-proof profile that
    mean/std checks misread on heavy-tailed web data ("the median doc
    is 2.1 KB with MAD 0.9 KB" survives one 2 GB page; the mean does
    not). Per group:

    ``(group, n_rows, median_milli, mad_milli)``

    Two passes by construction (MAD needs the median first), each ONE
    group agg — never a per-group collect: exact ``percentile``
    (linear interpolation, identical double arithmetic both engines)
    computes the median; the group medians broadcast back and a
    second agg takes the median of |x − med|. Values floored to
    milli for bit-stable hashes. NULLs drop (SQL aggregate
    semantics).
    """
    v = F.col(value_col).cast("double")
    med = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.count(v).cast("long").alias("n_rows"),
        F.percentile(v, F.lit(0.5)).alias("_med"),
    )
    j = df.join(F.broadcast(med),
                F.col(group_col) == F.col("_g"))
    mad = j.groupBy("_g").agg(
        F.percentile(F.abs(v - F.col("_med")), F.lit(0.5)).alias("_mad"))
    out = med.join(mad, "_g")
    return out.select(
        F.col("_g").alias(group_col), "n_rows",
        F.floor(F.col("_med") * 1000).cast("long")
        .alias("median_milli"),
        F.floor(F.col("_mad") * 1000).cast("long").alias("mad_milli"),
    )


def activity_heatmap(df: DataFrame, ts_col: str) -> DataFrame:
    """Day-of-week × hour-of-day activity heatmap over a full 7×24
    spine (absent cells at zero) — the seasonality fingerprint that
    separates human traffic (diurnal, weekday-heavy) from schedulers
    (flat or metronomic). Per cell:

    ``(dow, hour, n_rows, share_ppm)``

    dow 1=Monday..7=Sunday (ISO — ``dayofweek`` is locale-shifted in
    some engines, so weekday is computed from the tz-proof DATE field
    arithmetic both engines share); wall-time extraction is the
    portable currency for naive timestamps. One corpus exchange into
    ≤168 cells; the spine cross-join is literal-sized.
    """
    # Monday=1: DuckDB isodow == Spark (dayofweek + 5) % 7 + 1
    dow = ((F.dayofweek(F.col(ts_col)) + 5) % 7 + 1).cast("int")
    hr = F.hour(F.col(ts_col)).cast("int")
    g = (
        df.where(F.col(ts_col).isNotNull())
        .groupBy(dow.alias("dow"), hr.alias("hour"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_rows"))
    )
    spark = df.sparkSession
    spine = spark.range(1, 8).select(
        F.col("id").cast("int").alias("dow")).crossJoin(
        spark.range(0, 24).select(F.col("id").cast("int")
                                  .alias("hour")))
    j = spine.join(g, ["dow", "hour"], "left")
    n = F.coalesce(F.col("n_rows"), F.lit(0)).cast("long")
    tot = j.agg(F.sum(n).alias("_t"))
    return j.crossJoin(F.broadcast(tot)).select(
        "dow", "hour", n.alias("n_rows"),
        F.floor((n * 1_000_000).cast("double") / F.col("_t"))
        .cast("long").alias("share_ppm"),
    )


def robust_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    z_milli_threshold: int = 3500,
) -> DataFrame:
    """Robust per-group outlier census via the modified z-score
    (Iglewicz–Hoaglin): |0.6745·(x − median)/MAD| > threshold — the
    action group_median_mad's profile implies, immune to the outliers
    it hunts (mean/std methods mask their own targets). Per group:

    ``(group, n_rows, n_out_low, n_out_high, outlier_ppm)``

    Same two-group-agg shape as group_median_mad (median, then MAD of
    deviations, both exact interpolated percentiles — identical double
    arithmetic cross-engine), bounds broadcast back, one scan flags
    rows, one final group agg counts. The 0.6745 consistency constant
    and the z arithmetic share one pinned op order. A zero-MAD group
    (>50 % identical values) flags nothing (documented: scale is
    unmeasurable, not clean); NULLs drop.
    """
    v = F.col(value_col).cast("double")
    med = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.percentile(v, F.lit(0.5)).alias("_med"))
    j1 = df.join(F.broadcast(med), F.col(group_col) == F.col("_g"))
    mad = j1.groupBy("_g").agg(
        F.percentile(F.abs(v - F.col("_med")), F.lit(0.5))
        .alias("_mad"))
    b = med.join(mad, "_g")
    j = df.join(F.broadcast(b), F.col(group_col) == F.col("_g"))
    z = (F.lit(0.6745) * (v - F.col("_med")) * F.lit(1000.0)
         / F.col("_mad"))
    zc = F.when(v.isNotNull() & (F.col("_mad") > 0), F.floor(z))
    lo = (zc < -z_milli_threshold).cast("long")
    hi = (zc > z_milli_threshold).cast("long")
    g = j.groupBy(F.col("_g").alias(group_col)).agg(
        F.count(v).cast("long").alias("n_rows"),
        F.coalesce(F.sum(lo), F.lit(0)).cast("long").alias("n_out_low"),
        F.coalesce(F.sum(hi), F.lit(0)).cast("long")
        .alias("n_out_high"),
    )
    return g.select(
        group_col, "n_rows", "n_out_low", "n_out_high",
        # A group whose values are all NULL has n_rows == 0 (count of
        # non-NULL): guard the ratio — ANSI Spark throws on /0.
        F.when(
            F.col("n_rows") > 0,
            F.floor(((F.col("n_out_low") + F.col("n_out_high"))
                     * 1_000_000).cast("double") / F.col("n_rows")))
        .cast("long").alias("outlier_ppm"),
    )
