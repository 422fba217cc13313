"""dup_span_remove scale check: the removal action at a 10x corpus step.

    python scripts/span_scale.py [--small 200000] [--rows 2000000] [--cores 16]

Same protocol as scripts/sf1_pipeline.py (deterministic documents
generator, planted duplicate rates, stage built INSIDE the timed block
because the window explode checkpoints eagerly at construction): any
super-linear blowup shows as wall ratio >> corpus ratio or removed-rows
ratio >> corpus ratio. portable=False (8-byte xxhash64 window keys — the
crawl-scale path). Appends a point to BENCH_sf1.json.
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
            "overwrite"
        ).parquet(path)
    return path


def run_one(spark, path: str, span_tokens: int) -> dict:
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.dedup import dup_span_remove

    df = spark.read.parquet(path).select("doc_id", "text")
    t0 = time.perf_counter()
    out = dup_span_remove(
        df, "doc_id", "text", span_tokens=span_tokens, min_count=2, portable=False
    )
    agg = out.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tok"),
        F.sum("n_removed").alias("rm"),
        F.sum(F.length("text_clean")).alias("chars"),  # forces reassembly
    ).collect()[0]
    wall = round(time.perf_counter() - t0, 2)
    return {
        "n_docs": agg["n_docs"],
        "n_tokens": agg["tok"],
        "n_removed": agg["rm"],
        "sec": wall,
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--small", type=int, default=200_000)
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--span-tokens", type=int, default=20)
    args = ap.parse_args()

    from jsonschema_spark.session import get_spark

    spark = get_spark("span-scale", cores=args.cores)
    os.makedirs(BENCH_DIR, exist_ok=True)

    point = {
        "metric": "dup_span_remove rows + wall at 10x corpus step",
        "cores": args.cores,
        "span_tokens": args.span_tokens,
        "portable": False,
    }
    for name, n in (("small", args.small), ("big", args.rows)):
        path = ensure_docs(spark, n)
        point[name] = run_one(spark, path, args.span_tokens)

    s, b = point["small"], point["big"]
    ratio = args.rows / args.small
    point["growth"] = {
        "corpus_ratio": ratio,
        "removed_ratio_vs_linear": round((b["n_removed"] / max(s["n_removed"], 1)) / ratio, 3),
        "wall_ratio_vs_linear": round((b["sec"] / max(s["sec"], 0.01)) / ratio, 3),
    }

    bench_path = os.path.join(ROOT, "BENCH_sf1.json")
    doc = json.load(open(bench_path)) if os.path.exists(bench_path) else {"points": []}
    doc["points"].append(point)
    json.dump(doc, open(bench_path, "w"), indent=1)
    print(json.dumps(point))


if __name__ == "__main__":
    main()
