"""SemDeDup vs exact embedding near-dup at scale.

    python scripts/semantic_scale.py [--small 50000] [--rows 500000]
                                     [--cores 16] [--dims 64]

Deterministic synthetic embeddings (pure Column expressions over
spark.range — every value a hash of (id, dim), plus planted near-dup
PAIRS at a fixed rate so both paths have real positives). Times:

- exact blocked all-pairs at --small (O(n²·d) — the brute tier),
- semantic (cluster-pruned) at --small → measured pruning factor,
- semantic at --rows, where exact is (ratio²×) off the table — the
  scale path the operator exists for.

Appends a point to BENCH_sf1.json.
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


def synth_embeddings(spark, rows: int, dims: int):
    """Deterministic (vec_id, embedding) — ~0.5% of rows are a near-copy
    of the previous row (same direction, tiny per-dim jitter), so near-dup
    pairs exist at every scale."""
    from pyspark.sql import functions as F

    base = spark.range(0, rows, numPartitions=64)
    i = F.col("id")
    dup = (i % 200 == 199) & (i > 0)
    src = F.when(dup, i - 1).otherwise(i)

    def dim_val(src_col, jitter):
        # hash -> [-0.5, 0.5); jitter shifts by <=0.01
        return F.transform(
            F.sequence(F.lit(1), F.lit(dims)),
            lambda j: (
                (F.pmod(F.xxhash64(src_col, j), F.lit(1000)) - 500).cast("double")
                / 1000.0
                + jitter
            ),
        )
    jit = F.when(dup, (F.pmod(F.xxhash64(i), F.lit(21)) - 10).cast("double") / 1000.0).otherwise(F.lit(0.0))
    return base.select(i.alias("vec_id"), dim_val(src, jit).alias("embedding"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=20_000)
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--dims", type=int, default=64)
    ap.add_argument("--threshold", type=int, default=995_000)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from jsonschema_spark.operators.dedup import embedding_near_dup_pairs
    from jsonschema_spark.operators.similarity import semantic_dedup_pairs
    from jsonschema_spark.session import get_spark

    spark = get_spark("semantic-scale", cores=args.cores)
    os.makedirs(BENCH_DIR, exist_ok=True)

    def ensure(rows):
        path = os.path.join(BENCH_DIR, f"emb_{rows}_{args.dims}")
        if not os.path.exists(os.path.join(path, "_SUCCESS")):
            synth_embeddings(spark, rows, args.dims).write.mode("overwrite").parquet(path)
        return spark.read.parquet(path)

    point = {
        "metric": "semantic_dedup_pairs vs exact blocked all-pairs",
        "cores": args.cores, "dims": args.dims, "threshold": args.threshold,
    }

    small = ensure(args.small)
    t0 = time.perf_counter()
    n_exact = embedding_near_dup_pairs(
        small, "vec_id", "embedding", min_cos_micro=args.threshold,
        n_blocks=16).count()
    point["exact_small"] = {"rows": args.small, "pairs": n_exact,
                            "sec": round(time.perf_counter() - t0, 1)}

    n_cells_small = max(8, args.small // 4000)
    t0 = time.perf_counter()
    n_sem = semantic_dedup_pairs(
        small, "vec_id", "embedding", min_cos_micro=args.threshold,
        n_centroids=n_cells_small, n_blocks=4).count()
    point["semantic_small"] = {"rows": args.small, "pairs": n_sem,
                               "n_centroids": n_cells_small,
                               "sec": round(time.perf_counter() - t0, 1)}

    big = ensure(args.rows)
    n_cells_big = max(8, args.rows // 4000)
    t0 = time.perf_counter()
    n_sem_big = semantic_dedup_pairs(
        big, "vec_id", "embedding", min_cos_micro=args.threshold,
        n_centroids=n_cells_big, n_blocks=4).count()
    point["semantic_big"] = {"rows": args.rows, "pairs": n_sem_big,
                             "n_centroids": n_cells_big,
                             "sec": round(time.perf_counter() - t0, 1)}

    es, ss, sb = point["exact_small"], point["semantic_small"], point["semantic_big"]
    point["summary"] = {
        "speedup_at_small": round(es["sec"] / max(ss["sec"], 0.1), 2),
        "recall_at_small_ppm": round(1e6 * ss["pairs"] / max(es["pairs"], 1)),
        "big_wall_vs_linear": round((sb["sec"] / max(ss["sec"], 0.1))
                                    / (args.rows / args.small), 3),
    }

    bench_path = os.path.join(ROOT, "BENCH_sf1.json")
    doc = json.load(open(bench_path)) if os.path.exists(bench_path) else {"points": []}
    doc["points"].append(point)
    json.dump(doc, open(bench_path, "w"), indent=1)
    print(json.dumps(point))


if __name__ == "__main__":
    main()
