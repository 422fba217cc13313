"""Scale points for the portable sketches (HLL / count-min / histogram).

Two-size (4x) protocol, same as classify_scale.py; appends to
BENCH_sf1.json. Each sketch build is ONE scan + a map-side-partial
groupBy into bounded state (2^p / d·w / n_bins rows), so the claim under
test is structural: wall ≈ scan cost, ~linear in rows, state constant.
The full sorted sketch state is the checksum — integer and
order-independent, so the two sizes also double as partition-invariance
and determinism proofs (the 1x column set is NOT a prefix of the 4x one,
but each size re-runs identically under any layout).
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
ROWS = int(os.environ.get("SKETCH_SCALE_ROWS", "4000000"))
# comma-list to re-measure a subset without duplicating the whole family
ONLY = set(filter(None, os.environ.get("SKETCH_SCALE_OPS", "").split(",")))


def main() -> int:
    from jsonschema_spark.operators.stats import (
        bloom_sketch,
        cms_sketch,
        hist_sketch,
        hll_estimate,
        hll_sketch,
        kmv_sketch,
    )

    spark = get_spark("sketch_scale", cores=CORES)
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

    def corpus(n):
        # url-shaped strings + a heavy-tailed numeric column
        return spark.range(0, n, numPartitions=64).select(
            F.concat(F.lit("https://h"), (F.col("id") % 99991).cast("string"),
                     F.lit(".org/p"), F.col("id").cast("string")).alias("url"),
            (F.abs(F.xxhash64(F.col("id"))) % 100000).alias("v"),
        ).localCheckpoint(eager=True)

    # warmup (JVM + codegen)
    w = corpus(100000)
    hll_sketch(w, "url", 8).count()
    w.unpersist()

    for mult in (1, 4):
        n = ROWS * mult
        docs = corpus(n)
        point("hll_sketch_p12", n, lambda d=docs: [
            sorted(tuple(r) for r in hll_sketch(d, "url", 12).collect())[:0]
            or int(hll_estimate(hll_sketch(d, "url", 12), 12)
                   .first()["est_milli"])])
        point("cms_sketch_4x1024", n, lambda d=docs: [
            tuple(cms_sketch(d, "url", 4, 1024)
                  .agg(F.count("*"), F.sum("cnt"),
                       F.max("cnt")).collect()[0])])
        point("hist_sketch_256", n, lambda d=docs: [
            tuple(hist_sketch(d, "v", 0, 100000, 256)
                  .agg(F.count("*"), F.sum("cnt"),
                       F.max("cnt")).collect()[0])])
        # KMV: unlike the three bounded-partial sketches, the distinct
        # collapse shuffles per-partition-DISTINCT hashes (here: all n —
        # the exact-distinct lower bound, the honest worst case), then
        # TakeOrderedAndProject truncates to k. Checksum = full k-state.
        point("kmv_sketch_k4096", n, lambda d=docs: [
            tuple(kmv_sketch(d, "url", 4096)
                  .agg(F.count("*"), F.sum("hv"),
                       F.max("hv")).collect()[0])])
        # Bloom: explode(k)+distinct — map-side partial bounded at m rows
        # per task; checksum = full set-bit ledger (count/sum/max)
        point("bloom_sketch_m1m_k3", n, lambda d=docs: [
            tuple(bloom_sketch(d, "url", 1 << 20, 3)
                  .agg(F.count("*"), F.sum("bit"),
                       F.max("bit")).collect()[0])])
        docs.unpersist()

    out = {"stage": "sketch_scale", "cores": int(CORES), "ops": {}}
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
