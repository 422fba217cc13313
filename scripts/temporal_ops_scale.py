"""Scale points for the temporal/association operators: as-of join,
funnel, cohort retention, Markov transitions, chi-square, grouped
check suites.

Two-size (4x) protocol, appends to BENCH_sf1.json (same shape as
meta_ops_scale.py). Structural claims under test:
- asof_join is ONE exchange + one per-key sort (union-sort), so wall
  tracks the sort of per-key rows — never an |L|x|R| candidate pass;
- funnel is one exchange into per-user sorted arrays + one fold pass;
- cohort_retention's only corpus-sized stage is the per-user groupBy
  (the period set is calendar-bounded);
- markov_transitions = one partitioned window + a |types|^2 groupBy;
- contingency_chi2 = ONE pair-key exchange, everything downstream at
  category-pair cardinality;
- check_suite(by=) keeps the one-scan shape of the global suite (the
  groupBy collapses map-side into n_groups rows per task).
Integer checksums double as determinism proofs across the two sizes'
shared prefix (users are reused, event streams are deterministic).
"""
from __future__ import annotations

import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

from pyspark.sql import functions as F  # noqa: E402

from jsonschema_spark.session import get_spark  # noqa: E402

CORES = os.environ.get("SPARK_GRAFT_CPUS", "16")
ROWS = int(os.environ.get("TEMPORAL_SCALE_ROWS", "4000000"))
ONLY = set(filter(None,
                  os.environ.get("TEMPORAL_SCALE_OPS", "").split(",")))
# asof/funnel sort fat-ish rows per user key: size partitions to the
# sort, not the core count (snapshot_delta rule)
SHUFFLE = os.environ.get("TEMPORAL_SCALE_SHUFFLE", "128")

TYPES = ("signup", "view", "click", "purchase", "error", "share")


def main() -> int:
    from jsonschema_spark.operators.checks import check_suite
    from jsonschema_spark.operators.stats import contingency_chi2
    from jsonschema_spark.operators.temporal import (
        asof_join,
        cohort_retention,
        funnel,
        markov_transitions,
    )

    spark = get_spark("temporal_ops_scale", cores=CORES,
                      shuffle_partitions=int(SHUFFLE))
    results = {}

    def point(op, n, fn):
        if ONLY and op not in ONLY:
            return
        t0 = time.perf_counter()
        out = fn()
        wall = round(time.perf_counter() - t0, 2)
        results.setdefault(op, []).append(
            {"n": n, "wall_s": wall, "rows_per_s": round(n / wall),
             "checksum": out})
        print(op, n, wall, "s", flush=True)

    def events(n):
        # ~100 events/user, 90 days, 6 types, deterministic hashes
        i = F.col("id")
        u = (F.abs(F.xxhash64(i)) % (n // 100 + 1)).alias("user_id")
        ts = F.timestamp_seconds(
            1_700_000_000 + F.abs(F.xxhash64(i, F.lit(1)))
            % (90 * 86400)).alias("ts")
        t = F.element_at(
            F.array(*[F.lit(s) for s in TYPES]),
            (F.abs(F.xxhash64(i, F.lit(2))) % 6 + 1).cast("int")
        ).alias("event_type")
        v = ((F.abs(F.xxhash64(i, F.lit(3))) % 100_000) / F.lit(100.0)
             ).alias("value")
        return spark.range(0, n, numPartitions=64).select(
            i.alias("event_id"), u, ts, t, v).localCheckpoint(eager=True)

    def run_asof(d):
        left = d.where(F.col("event_type") == "purchase") \
            .select("user_id", "ts", "event_id")
        right = d.where(F.col("event_type") == "click") \
            .select("user_id", "ts",
                    F.col("event_id").alias("click_id"))
        out = asof_join(left, right, "user_id", "ts", "ts",
                        ["click_id"], tolerance_s=3600)
        return [tuple(out.agg(
            F.count("*"), F.count("click_id"), F.sum("asof_gap_us"),
            F.sum("click_id")).collect()[0])]

    def run_funnel(d, strategy="fold"):
        out = funnel(d, "user_id", "ts", "event_type",
                     ["signup", "view", "click", "purchase"],
                     strategy=strategy)
        return [tuple(out.agg(
            F.count("*"), F.sum("n_users"),
            F.sum("conversion_ppm")).collect()[0])]

    def run_cohort(d):
        out = cohort_retention(d, "user_id", "ts")
        return [tuple(out.agg(
            F.count("*"), F.sum("n_users"),
            F.sum("retention_ppm")).collect()[0])]

    def run_markov(d):
        out = markov_transitions(d, "user_id", "ts", "event_type",
                                 id_col="event_id")
        return [tuple(out.agg(
            F.count("*"), F.sum("n_pairs"),
            F.sum("row_ppm")).collect()[0])]

    def run_chi2(d):
        dd = d.select("event_type",
                      (F.col("user_id") % 7).cast("string").alias("shard"))
        return [tuple(contingency_chi2(dd, "event_type", "shard")
                      .collect()[0])]

    def run_suite_by(d):
        out = check_suite(d, [
            {"name": "size", "check": "size_min", "min": 1},
            {"name": "v_comp", "check": "completeness", "col": "value",
             "min_ppm": 1},
            {"name": "v_mean", "check": "mean_scaled_between",
             "col": "value", "scale": 100, "lo": 0, "hi": 10**9},
            {"name": "u_card", "check": "distinctness",
             "col": "user_id", "min_ppm": 1},
        ], by=["event_type"])
        return [tuple(out.agg(
            F.count("*"), F.sum("metric"),
            F.sum((F.col("status") == "pass").cast("long"))
        ).collect()[0])]

    # warmup (JVM + codegen + Arrow)
    w = events(100_000)
    run_asof(w); run_funnel(w); run_cohort(w)
    run_markov(w); run_chi2(w); run_suite_by(w)
    w.unpersist()

    for mult in (1, 4):
        n = ROWS * mult
        d = events(n)
        point("asof_join_1h", n, lambda d=d: run_asof(d))
        point("funnel_4step", n, lambda d=d: run_funnel(d))
        point("funnel_4step_passes", n,
              lambda d=d: run_funnel(d, strategy="passes"))
        point("cohort_retention_wk", n, lambda d=d: run_cohort(d))
        point("markov_transitions", n, lambda d=d: run_markov(d))
        point("contingency_chi2", n, lambda d=d: run_chi2(d))
        point("check_suite_by", n, lambda d=d: run_suite_by(d))
        d.unpersist()

    out = {"stage": "temporal_ops_scale", "cores": int(CORES),
           "shuffle_partitions": int(SHUFFLE), "ops": {}}
    ok = True
    for op, pts in results.items():
        ratio = round(pts[1]["wall_s"] / pts[0]["wall_s"] / 4, 2)
        out["ops"][op] = {"points": pts, "wall_vs_linear_at_4x": ratio}
        ok &= ratio < 1.5
    bench_path = os.path.join(ROOT, "BENCH_sf1.json")
    doc = json.load(open(bench_path))
    doc["points"].append(out)
    with open(bench_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(out))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
