"""Scale points for the crawl-snapshot operators (snapshot_delta,
frontier_schedule).

Two-size (4x) protocol like web_ops_scale.py; appends to BENCH_sf1.json.
- snapshot_delta: ONE full-outer shuffle join on the canonical key over
  two n-row snapshots with planted delta rates (1/11 gone, 1/5 changed,
  n/50 new) — wall should track n ~linearly (AQE handles the join);
  checksum = per-status counts (integer, partition-invariant).
- frontier_schedule: per-host windows (n/1000 hosts x ~1000 urls) + a
  broadcast delay join — the politeness scheduler's cost driver is the
  per-host sort, never a global one; checksum = sum of not_before_ms.
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
ROWS = int(os.environ.get("SNAP_SCALE_ROWS", "4000000"))


def main() -> int:
    from jsonschema_spark.operators.robots import frontier_schedule
    from jsonschema_spark.operators.urltools import snapshot_delta_df

    spark = get_spark("snapshot_ops_scale", cores=CORES)
    results = {}

    def point(op, n, fn):
        t0 = time.perf_counter()
        out = fn()
        wall = round(time.perf_counter() - t0, 2)
        results.setdefault(op, []).append(
            {"n": n, "wall_s": wall, "rows_per_s": round(n / wall),
             "checksum": out})
        print(op, n, wall, "s", flush=True)

    def snaps(n):
        base = spark.range(0, n, numPartitions=64).select(
            F.concat(F.lit("https://h"), (F.col("id") % (n // 1000))
                     .cast("string"), F.lit(".org/p"),
                     F.col("id").cast("string")).alias("url"),
            F.col("id"))
        old = base.select(
            "url", F.md5(F.col("id").cast("string")).alias("h"))
        new = base.where(F.col("id") % 11 != 0).select(
            "url",
            F.md5(F.when(F.col("id") % 5 == 0,
                         F.concat(F.col("id").cast("string"), F.lit("v2")))
                  .otherwise(F.col("id").cast("string"))).alias("h"),
        ).unionByName(
            spark.range(0, n // 50).select(
                F.concat(F.lit("https://hx.org/n"),
                         F.col("id").cast("string")).alias("url"),
                F.md5(F.col("id").cast("string")).alias("h")))
        return (old.localCheckpoint(eager=True),
                new.localCheckpoint(eager=True), base)

    # warmup
    o, nw, b = snaps(100000)
    snapshot_delta_df(o, nw, "url", "h").groupBy("status").count().collect()
    o.unpersist(); nw.unpersist()

    for mult in (1, 4):
        n = ROWS * mult
        old, new, base = snaps(n)
        point("snapshot_delta", n, lambda o=old, nn=new: sorted(
            (r["status"], r["count"]) for r in
            snapshot_delta_df(o, nn, "url", "h")
            .groupBy("status").count().collect()))
        urls = base.select("url").localCheckpoint(eager=True)
        delays = spark.createDataFrame(
            [(f"h{i}.org", 1000 + (i % 5) * 500) for i in range(50)],
            "host string, crawl_delay_ms long")
        point("frontier_schedule", n, lambda u=urls, d=delays: [
            int(frontier_schedule(u, d).agg(
                F.sum("not_before_ms")).collect()[0][0])])
        old.unpersist(); new.unpersist(); urls.unpersist()

    out = {"stage": "snapshot_ops_scale", "cores": int(CORES), "ops": {}}
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
