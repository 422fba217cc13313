"""Scaling-efficiency evidence: the same jobs at two parallelism levels.

The north_rule requires throughput scaling efficiency ≥ 0.8 from N to 4N
executors; in this sandbox the two "cluster sizes" are local[N] and
local[4N] over the same cached parquet input.

This host is a noisy-neighbor VM (observed 10× wall-clock swings between
minutes), so a single A/B pair is meaningless. Measurement protocol:
ROUNDS alternating fresh-JVM measurements (N, 4N, N, 4N, …), each JVM
warms every job once (codegen + page cache) then times it once; the
per-level result is the MEDIAN across rounds, which cancels slow-host
windows that hit both levels equally.

Usage: python scripts/scaling.py [N] [N4] [rounds]   (default 4 16 3)
       python scripts/scaling.py --one <cores>       (internal: one JVM)
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RESULT_PATH = "/tmp/jsonschema_spark_bench/scaling_report.json"
JOBS = ("validate_fast", "violations", "dedup_url")


def measure_one(cores: int) -> dict:
    from pyspark.sql import functions as F

    from bench import PAGES_ROWS, _ensure_pages
    from jsonschema_spark import validate, violations
    from jsonschema_spark.session import get_spark
    from jsonschema_spark.sources.pages import WEBPAGE_SCHEMA

    spark = get_spark(f"scaling_{cores}", cores=cores, shuffle_partitions=max(cores * 2, 16))
    pages = spark.read.parquet(_ensure_pages(spark))

    jobs = {
        "validate_fast": lambda: validate(pages, WEBPAGE_SCHEMA).groupBy("valid").count().collect(),
        "violations": lambda: violations(pages, WEBPAGE_SCHEMA, id_cols=["url"]).count(),
        # real shuffle that scales with the input: exact url dedup
        "dedup_url": lambda: pages.groupBy(F.md5("url")).count().filter(F.col("count") > 1).count(),
    }
    out = {"cores": cores, "pages_rows": PAGES_ROWS, "timings": {}}
    for name, fn in jobs.items():
        fn()  # warm run: codegen, OS page cache, JVM heap expansion
        # median of 3 timed runs per JVM: a single timed run is hostage to
        # one noisy-neighbor minute (observed 14.1-30.4 s spread on the
        # identical violations job within a day); the intra-JVM median
        # rejects a transient that hits one run without biasing the level
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn()
            ts.append(round(time.perf_counter() - t0, 3))
        out["timings"][name] = sorted(ts)[1]
        out.setdefault("raw", {})[name] = ts
    spark.stop()
    return out


def main() -> None:
    # default 4 → 16: this host exposes 32 vCPUs but sustains only ~13-16
    # effective cores (measured with a multiprocessing burn), so 4→16 is
    # the largest honest N→4N pair; pass "8 32" to measure the vCPU pair
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    n4 = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 3
    env = dict(os.environ)
    samples: dict[int, dict[str, list]] = {n: {j: [] for j in JOBS}, n4: {j: [] for j in JOBS}}
    pages_rows = None
    for r in range(rounds):
        for cores in (n, n4):
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--one", str(cores)],
                capture_output=True, text=True, env=env, timeout=1800,
            )
            line = p.stdout.strip().splitlines()[-1]
            res = json.loads(line)
            pages_rows = res["pages_rows"]
            for j in JOBS:
                samples[cores][j].append(res["timings"][j])
            print(f"round {r} cores {cores}: {res['timings']}", file=sys.stderr)
    med = {c: {j: round(statistics.median(v), 3) for j, v in js.items()} for c, js in samples.items()}
    factor = n4 / n
    eff = {j: round((med[n][j] / med[n4][j]) / factor, 3) for j in JOBS}
    report = {
        "protocol": f"{rounds} alternating fresh-JVM rounds, median per level",
        "pages_rows": pages_rows,
        "n_cores": n,
        "n4_cores": n4,
        "samples_n": samples[n],
        "samples_n4": samples[n4],
        "timings_n": med[n],
        "timings_n4": med[n4],
        "docs_per_sec_n": round(pages_rows / med[n]["validate_fast"]),
        "docs_per_sec_n4": round(pages_rows / med[n4]["validate_fast"]),
        "scaling_efficiency": eff,
    }
    os.makedirs(os.path.dirname(RESULT_PATH), exist_ok=True)
    with open(RESULT_PATH, "w") as f:
        json.dump(report, f, indent=2)
    print(json.dumps(report, indent=2))


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--one":
        print(json.dumps(measure_one(int(sys.argv[2]))))
    else:
        main()
