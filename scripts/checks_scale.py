"""Scale points for the table-contract validation family
(operators/checks.py): check_suite, table_fingerprint, fd_violations,
reconcile_sum.

Two-size (4x) protocol, appends to BENCH_sf1.json (same shape as
sketch_scale.py / meta_ops_scale.py). Structural claims under test:

- check_suite: ONE scan, ONE global agg; the two exact count-distincts
  triple the exchanged rows via Expand but partials collapse per task
  → wall ~ linear scan;
- table_fingerprint: scan + md5 + a 64-row exchange → linear, md5 is
  the cost;
- fd_violations: two narrow exchanges (composite-key groupBy, then lhs
  groupBy over collapsed pairs) → linear in rows;
- reconcile_sum: child map-side-partial groupBy + one key join →
  linear; integer-cents quantization makes the checksum exact.

Integer checksums double as determinism / partition-invariance proofs
across the two sizes' different partition counts.

Run: SPARK_GRAFT_CPUS=16 CHECKS_SCALE_ROWS=4000000 \
       python scripts/checks_scale.py
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
ROWS = int(os.environ.get("CHECKS_SCALE_ROWS", "4000000"))
# Exact-distinct (Expand) aggregation and the parent⊕child key join
# both SORT shuffled rows: at 16M+ rows x cores==partitions the
# per-task sort spills (the snapshot_delta finding) — size partitions
# to the sort, not the core count.
SHUFFLE = os.environ.get("CHECKS_SCALE_SHUFFLE")


def main() -> int:
    from jsonschema_spark.operators.checks import (
        check_suite,
        fd_violations,
        reconcile_sum,
        table_fingerprint,
    )

    spark = get_spark("checks_scale", cores=CORES,
                      shuffle_partitions=int(SHUFFLE) if SHUFFLE
                      else None)
    results: dict = {}

    def point(op, n, fn):
        t0 = time.perf_counter()
        out = fn()
        wall = round(time.perf_counter() - t0, 2)
        results.setdefault(op, []).append(
            {"n": n, "wall_s": wall, "rows_per_s": round(n / wall),
             "checksum": out})
        print(op, n, wall, "s", flush=True)

    def parent(n):
        i = F.col("id")
        return spark.range(0, n, numPartitions=64).select(
            i.alias("pk"),
            (i % (n // 10)).alias("ck"),
            F.when(i % 3 == 0, F.lit("O")).when(i % 3 == 1, F.lit("F"))
            .otherwise(F.lit("P")).alias("status"),
            F.concat(((i % 5) + 1).cast("string"), F.lit("-PRI"))
            .alias("priority"),
            # stated total of 4 child parts; every 10th off by a cent
            (((i % 1000) + 1) * 4 / F.lit(100.0)
             + F.when(i % 10 == 0, F.lit(0.01)).otherwise(F.lit(0.0)))
            .alias("price"),
        ).localCheckpoint(eager=True)

    def child(n):
        i = F.col("id")
        return spark.range(0, 4 * n, numPartitions=64).select(
            (i % n).alias("fk"),
            (((i % n) % 1000 + 1) / F.lit(100.0)).alias("amt"),
        ).localCheckpoint(eager=True)

    CHECKS = [
        {"name": "size", "check": "size_min", "min": 1},
        {"name": "pk", "check": "distinctness", "col": "pk",
         "min_ppm": 1_000_000},
        {"name": "ck_card", "check": "distinctness", "col": "ck",
         "min_ppm": 50_000},
        {"name": "status_dom", "check": "contained_ppm",
         "col": "status", "allowed": ["O", "F", "P"],
         "min_ppm": 1_000_000},
        {"name": "pri_fmt", "check": "match_ppm", "col": "priority",
         "pattern": "^[1-5]-PRI$", "min_ppm": 1_000_000},
        {"name": "price_mean", "check": "mean_scaled_between",
         "col": "price", "scale": 100, "lo": 0, "hi": 10**9},
    ]
    FP_COLS = ["pk", "ck", "status", "priority"]
    # same suite with the exact Expand-distincts swapped for the HLL
    # path — the crawl-scale configuration
    CHECKS_APPROX = [
        ({**c, "check": "distinctness_approx"}
         if c["check"] == "distinctness" else c)
        for c in CHECKS
    ]

    # warmup: JVM + codegen + Expand path + join path
    w, wc = parent(100_000), child(100_000)
    check_suite(w, CHECKS).agg(F.count("*")).collect()
    table_fingerprint(w, FP_COLS).agg(F.count("*")).collect()
    reconcile_sum(w, "pk", "price", wc, "fk", F.col("amt")) \
        .agg(F.count("*")).collect()
    w.unpersist(); wc.unpersist()

    for mult in (1, 4):
        n = ROWS * mult
        p = parent(n)
        point("check_suite", n, lambda d=p: [tuple(
            (r["check_name"], r["metric"], r["status"])
            for r in sorted(check_suite(d, CHECKS).collect(),
                            key=lambda r: r["check_name"]))])
        point("check_suite_approx", n, lambda d=p: [tuple(
            (r["check_name"], r["metric"], r["status"])
            for r in sorted(check_suite(d, CHECKS_APPROX).collect(),
                            key=lambda r: r["check_name"]))])
        point("table_fingerprint", n, lambda d=p: [tuple(
            table_fingerprint(d, FP_COLS)
            .agg(F.sum("n_rows"), F.bit_xor("xor56"), F.sum("modsum"),
                 F.count("*")).collect()[0])])
        point("fd_violations", n, lambda d=p: [tuple(
            fd_violations(d, ["ck"], "status")
            .agg(F.count("*"), F.sum("n_rows"), F.sum("n_distinct_rhs"))
            .collect()[0])])
        # reconcile materializes parent + 4x-child checkpoints AND
        # sorts the join: at n=16M (80M effective rows) the 8g
        # single-JVM heap OOMs outright — the half-base points keep
        # the measurement memory-resident so it measures the PLAN.
        p.unpersist()
        p = parent(n // 2)
        c = child(n // 2)
        point("reconcile_sum", 5 * (n // 2), lambda dp=p, dc=c: [tuple(
            reconcile_sum(dp, "pk", "price", dc, "fk", F.col("amt"))
            .groupBy("status").agg(
                F.count("*").alias("c"),
                F.sum(F.abs(F.col("diff_units"))).alias("s"))
            .agg(F.array_sort(
                F.collect_list(F.struct("status", "c", "s"))))
            .collect()[0][0])])
        p.unpersist(); c.unpersist()

    path = os.path.join(ROOT, "BENCH_sf1.json")
    data = json.load(open(path)) if os.path.exists(path) else {}
    data.setdefault("checks_ops_scale", {}).update({
        "rows_base": ROWS, "cores": CORES,
        "shuffle_partitions": SHUFFLE, "ops": results})
    with open(path, "w") as f:
        json.dump(data, f, indent=1)
    for op, pts in results.items():
        if len(pts) == 2:
            lin = round((pts[1]["wall_s"] / pts[0]["wall_s"]) / 4, 2)
            print(f"{op}: 4x wall ratio vs linear = {lin}x")
    return 0


if __name__ == "__main__":
    sys.exit(main())
