"""Idle A/B for the PSL probe cost (VERDICT r4 directive 5).

host_stats / url_normalize read ~1.5x their r3 walls at sf0.1 after the
full-PSL InSet probe chain landed (r3 used the 16-suffix legacy
heuristic). This isolates the probe: the SAME queries, alternating
A = full ICANN PSL probe chain (current default) with
B = legacy TWO_LEVEL_SUFFIXES fallback (the r3 shape), several rounds
in one warm JVM, medians reported. Run on an OTHERWISE IDLE box
(CLAUDE.md contamination rule) — timings taken while any other Spark
job runs are garbage.

Usage: python scripts/psl_ab.py [sf_dir] [rounds]
"""
import json
import statistics
import sys
import time

sys.path.insert(0, ".")

from pyspark.sql import functions as F  # noqa: E402

from jsonschema_spark.session import get_spark  # noqa: E402
from jsonschema_spark.operators import urltools  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    rounds = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    spark = get_spark("psl_ab", cores=32)

    import __spark_entry__ as e

    walls: dict[str, list[float]] = {}

    def run(tag: str, qname: str) -> None:
        df = e.queries()[qname](spark, sf_dir)
        t0 = time.time()
        # aggregate over the computed columns so nothing is pruned
        df.agg(F.count(F.lit(1)),
               F.sum(F.length(df.columns[1]))).collect()
        walls.setdefault(f"{qname}/{tag}", []).append(time.time() - t0)

    real_cache = dict(urltools._psl_cache)
    urltools.load_psl()  # warm the parse
    real_cache = dict(urltools._psl_cache)

    # one unrecorded warmup each
    for qname in ("url_normalize", "host_stats"):
        run("warmup", qname)

    for _ in range(rounds):
        for qname in ("url_normalize", "host_stats"):
            urltools._psl_cache.clear()
            urltools._psl_cache.update(real_cache)
            run("psl", qname)
            urltools._psl_cache.clear()
            urltools._psl_cache[False] = None  # force legacy fallback
            run("legacy", qname)
    urltools._psl_cache.clear()
    urltools._psl_cache.update(real_cache)

    out = {}
    for k, v in walls.items():
        if k.endswith("warmup"):
            continue
        out[k] = {"median_s": round(statistics.median(v), 3),
                  "all": [round(x, 3) for x in v]}
    for q in ("url_normalize", "host_stats"):
        a = out[f"{q}/psl"]["median_s"]
        b = out[f"{q}/legacy"]["median_s"]
        out[f"{q}/psl_over_legacy"] = round(a / b, 3) if b else None
    print(json.dumps({"sf_dir": sf_dir, "rounds": rounds,
                      "psl_ab": out}))


if __name__ == "__main__":
    main()
