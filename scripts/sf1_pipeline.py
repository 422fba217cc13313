"""sf1-scale dedup/curation pipeline bench (VERDICT r2 #7): run the
curation stages at two corpus sizes 10x apart and record per-stage
rows-in/rows-out + wall time, so any super-linear pair-stage blowup the
sf0.1 numbers hide is visible as a rows ratio >> corpus ratio.

    python scripts/sf1_pipeline.py [--rows 2000000] [--small 200000] [--cores 16]

The input is the deterministic documents generator
(jsonschema_spark/sources/docs.py) with duplicate/boilerplate structure
planted at fixed RATES — stage outputs must therefore scale ~linearly
with corpus size; the boilerplate hot band is defused by max_band_df
(otherwise it alone contributes (0.01*n)^2/2 pairs: quadratic).

Writes BENCH_sf1.json at the repo root; prints it as one JSON line.
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


def run_pipeline(spark, path: str, max_band_df: int, k: int, bands: int,
                 portable: bool = False) -> dict:
    from pyspark.sql import functions as F

    from jsonschema_spark.operators.dedup import (
        dedup_clusters,
        keep_canonical,
        minhash_lsh_pairs,
    )
    from jsonschema_spark.operators.textstats import webtext_keep

    stages: dict[str, dict] = {}

    def stage(name, fn):
        # operators run eager checkpoints at CONSTRUCTION time, so each
        # stage builds its own DataFrame inside the timed block
        t0 = time.perf_counter()
        df, n = fn()
        stages[name] = {"rows": n, "sec": round(time.perf_counter() - t0, 2)}
        return df

    docs = spark.read.parquet(path)
    n_in = docs.count()

    def s_quality():
        kept = docs.filter(
            webtext_keep(F.col("text"), 50, 100000, 2)
        ).localCheckpoint(eager=True)
        return kept, kept.count()

    kept = stage("quality_kept", s_quality)

    def s_pairs():
        # portable=False: the scale path draws minhash permutations from
        # seeded xxhash64 instead of the oracle-replayable md5 form — same
        # recall semantics, k cheap JVM intrinsics instead of k md5 rounds
        pairs = minhash_lsh_pairs(kept, "doc_id", "text", k=k, bands=bands,
                                  max_band_df=max_band_df, portable=portable)
        pairs = pairs.localCheckpoint(eager=True)
        return pairs, pairs.count()

    pairs = stage("lsh_pairs", s_pairs)

    def s_clusters():
        clusters = dedup_clusters(pairs).localCheckpoint(eager=True)
        return clusters, clusters.count()

    clusters = stage("clusters", s_clusters)
    stage("curated",
          lambda: (None, keep_canonical(kept, clusters, "doc_id").count()))
    total = round(sum(s["sec"] for s in stages.values()), 2)
    return {"input_rows": n_in, "stages": stages, "total_sec": total}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=2_000_000)
    ap.add_argument("--small", type=int, default=200_000)
    ap.add_argument("--cores", type=int, default=16)
    ap.add_argument("--max-band-df", type=int, default=256)
    ap.add_argument("--k", type=int, default=12)
    ap.add_argument("--bands", type=int, default=4)
    args = ap.parse_args()

    from jsonschema_spark.session import get_spark

    spark = get_spark("sf1-pipeline", cores=args.cores)
    big_path = ensure_docs(spark, args.rows)
    small_path = ensure_docs(spark, args.small)

    small = run_pipeline(spark, small_path, args.max_band_df, args.k, args.bands)
    big = run_pipeline(spark, big_path, args.max_band_df, args.k, args.bands)

    ratio = args.rows / args.small
    blowup = {
        name: round(big["stages"][name]["rows"]
                    / max(small["stages"][name]["rows"], 1) / ratio, 3)
        for name in big["stages"]
    }
    out = {
        "metric": "curation pipeline per-stage rows + wall at 10x corpus step",
        "cores": args.cores,
        "corpus_ratio": ratio,
        "max_band_df": args.max_band_df,
        "k": args.k,
        "bands": args.bands,
        # LSH candidate count has an intrinsic n^2 * P_fp term with
        # P_fp = bands * J_background^rows_per_band — banding precision
        # must SCALE with corpus size (rows_per_band up as n up) or the
        # false-positive term dominates; rows_per_band=3 keeps it
        # negligible through 10^7 docs, 4-5 at crawl scale
        "note": "rows_per_band = k/bands; see BASELINE.md sf1 section",
        "small": small,
        "big": big,
        # per-stage (rows_big/rows_small)/corpus_ratio — 1.0 = exactly
        # linear; >1 super-linear (the failure this bench exists to catch)
        "stage_growth_vs_linear": blowup,
        "super_linear": [k for k, v in blowup.items() if v > 1.5],
    }
    # append as a measured point (never clobber previously recorded points)
    bench_path = os.path.join(ROOT, "BENCH_sf1.json")
    doc = {"metric": out["metric"], "points": []}
    if os.path.exists(bench_path):
        try:
            prev = json.load(open(bench_path))
            if "points" in prev:
                doc = prev
        except (json.JSONDecodeError, OSError):
            pass
    doc["points"].append(out)
    with open(bench_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(out))
    return 0 if not out["super_linear"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
