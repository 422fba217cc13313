"""budget_sample crawl-scale point (VERDICT r3 #7): run the hash-prefix
histogram cutoff path (exact=False) at two corpus sizes 10x apart and
record wall + output rows, plus an exact≡approx row-set check at the
small size — evidence that the approx path (a) matches the window form
and (b) scales ~linearly with no single-task stratum sort.

    python scripts/budget_scale.py [--rows 4000000] [--small 400000] [--cores 16]

Appends one point to BENCH_sf1.json (metric: budget_sample).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
BENCH_DIR = "/tmp/jsonschema_spark_bench"


def ensure_docs(spark, rows: int) -> str:
    from jsonschema_spark.sources.docs import documents_df

    path = os.path.join(BENCH_DIR, f"docs_{rows}")
    if not os.path.exists(os.path.join(path, "_SUCCESS")):
        documents_df(spark, rows, num_partitions=64).write.mode(
            "overwrite").parquet(path)
    return path


def run_one(spark, path: str, budget: int, exact: bool,
            n_buckets: int) -> dict:
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.curate import budget_sample

    df = spark.read.parquet(path)
    t0 = time.perf_counter()
    out = budget_sample(df, "doc_id", "text", budget, stratify_col="lang",
                        exact=exact, n_buckets=n_buckets)
    # aggregate over the computed column so nothing optimizes away
    row = out.agg(F.count(F.lit(1)).alias("n"),
                  F.max("cum_tokens").alias("max_cum")).collect()[0]
    return {"rows": row["n"], "max_cum": row["max_cum"],
            "sec": round(time.perf_counter() - t0, 2)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=4_000_000)
    ap.add_argument("--small", type=int, default=400_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--n-buckets", type=int, default=4096)
    args = ap.parse_args()

    from jsonschema_spark.session import get_spark

    spark = get_spark("budget-scale", cores=args.cores)
    p_small = ensure_docs(spark, args.small)
    p_big = ensure_docs(spark, args.rows)

    # budget ∝ corpus so the sampler keeps ~the same fraction at both
    # sizes (an absolute budget would make the big run MOSTLY bucket
    # drops and understate the window work)
    budget_small = args.small * 20
    budget_big = args.rows * 20

    # equivalence at the small size: identical (doc_id, cum_tokens) sets
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.curate import budget_sample

    df_s = spark.read.parquet(p_small)
    ex = budget_sample(df_s, "doc_id", "text", budget_small,
                       stratify_col="lang")
    apx = budget_sample(df_s, "doc_id", "text", budget_small,
                        stratify_col="lang", exact=False,
                        n_buckets=args.n_buckets)
    sym_diff = ex.select("doc_id", "cum_tokens").exceptAll(
        apx.select("doc_id", "cum_tokens")).count() + \
        apx.select("doc_id", "cum_tokens").exceptAll(
            ex.select("doc_id", "cum_tokens")).count()

    small = run_one(spark, p_small, budget_small, False, args.n_buckets)
    big = run_one(spark, p_big, budget_big, False, args.n_buckets)
    small_exact = run_one(spark, p_small, budget_small, True, args.n_buckets)

    ratio = args.rows / args.small
    point = {
        "metric": "budget_sample approx (hash-prefix histogram cutoff) scale point",
        "cores": args.cores,
        "n_buckets": args.n_buckets,
        "corpus_ratio": ratio,
        "equivalence_sym_diff_rows": sym_diff,
        "small": {"input_rows": args.small, "budget": budget_small, **small},
        "small_exact_window_form": small_exact,
        "big": {"input_rows": args.rows, "budget": budget_big, **big},
        "growth_vs_linear": round(big["sec"] / (small["sec"] * ratio), 3),
    }
    bench_path = os.path.join(ROOT, "BENCH_sf1.json")
    doc = json.load(open(bench_path)) if os.path.exists(bench_path) else {
        "metric": "scale points", "points": []}
    doc.setdefault("points", []).append(point)
    with open(bench_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(point))


if __name__ == "__main__":
    main()
