"""Scale points for the retrieval / chunking / clustering / robots ops.

Same protocol as web_ops_scale.py: each operator runs at two input sizes
(4x apart) in one JVM; report throughput at both plus the size-4x wall
ratio (sub-~linear expected — fixed job overhead amortizes; anything
super-linear flags a stage that would not survive crawl scale). Appends
points to BENCH_sf1.json. Aggregates run over computed columns so the
expressions under test cannot be pruned away.

Shapes measured:
- bm25_topk: 3-term query over synthetic open-vocab docs — the corpus
  must never shuffle (hits are filtered at the explode);
- chunk_docs: pure projection — wall should track tokens ~linearly;
- kmeans_fixed (k=8, 2 rounds, d=32): per-round argmin pass + (ci,pos)
  groupBy — wall tracks n·d;
- robots_filter: 1 rule-table build over 200k hosts + host join.
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
SMALL_DOCS = int(os.environ.get("SESSION_SCALE_DOCS", "1000000"))
SMALL_VECS = int(os.environ.get("SESSION_SCALE_VECS", "200000"))

_WORDS = ("data", "spark", "crawl", "query", "shard", "graph", "index",
          "filter", "merge", "batch", "token", "model")


def _docs(spark, n):
    i = F.col("id")
    word = lambda k: F.element_at(  # noqa: E731
        F.array(*[F.lit(w) for w in _WORDS]),
        (F.abs(F.xxhash64(i, F.lit(k))) % len(_WORDS) + 1).cast("int"))
    # open-vocab tail token so term stats are not a closed set
    tail = F.concat(F.lit("w"), (F.abs(F.xxhash64(i, F.lit(99))) % 1000000)
                    .cast("string"))
    body = F.concat_ws(" ", *[word(k) for k in range(48)], tail)
    return spark.range(0, n, numPartitions=64).select(
        i.alias("doc_id"), body.alias("text"))


def main() -> int:
    from jsonschema_spark.operators.curate import chunk_docs
    from jsonschema_spark.operators.robots import robots_filter, robots_rules_df
    from jsonschema_spark.operators.search import bm25_topk
    from jsonschema_spark.operators.similarity import kmeans_fixed

    spark = get_spark("session_ops_scale", cores=CORES)
    results = {}

    def point(op, n, fn):
        t0 = time.perf_counter()
        out = fn()
        wall = round(time.perf_counter() - t0, 2)
        results.setdefault(op, []).append(
            {"n": n, "wall_s": wall, "rows_per_s": round(n / wall),
             "checksum": out})
        print(op, n, wall, "s", flush=True)

    for mult in (1, 4):
        n = SMALL_DOCS * mult
        docs = _docs(spark, n).localCheckpoint(eager=True)
        point("bm25_topk", n, lambda d=docs: [
            tuple(bm25_topk(d, "doc_id", "text",
                            ["crawl", "token", "w12345"], k=20)
                  .agg(F.sum("score_ppm"), F.sum("n_hits")).collect()[0])])
        point("chunk_docs", n, lambda d=docs: [
            tuple(chunk_docs(d, chunk_tokens=16, stride=12)
                  .agg(F.count("*"), F.sum("n_tok")).collect()[0])])
        docs.unpersist()

    for mult in (1, 4):
        n = SMALL_VECS * mult
        i = F.col("id")
        vecs = spark.range(0, n, numPartitions=64).select(
            i.alias("vec_id"),
            F.array(*[
                ((F.abs(F.xxhash64(i, F.lit(j))) % 2001 - 1000) / 1000.0)
                .cast("float") for j in range(32)
            ]).alias("embedding"))
        def run_kmeans(v=vecs):
            out, _ = kmeans_fixed(v, "vec_id", "embedding", k=8, iters=2)
            return [tuple(out.agg(F.count("*"), F.sum("cell")).collect()[0])]
        point("kmeans_k8_2it_d32", n, run_kmeans)

    for mult in (1, 4):
        n = SMALL_DOCS * mult
        i = F.col("id")
        host = F.concat(F.lit("h"), (i % 200000).cast("string"),
                        F.lit(".example.org"))
        urls = spark.range(0, n, numPartitions=64).select(
            i.alias("doc_id"),
            F.concat(
                F.lit("https://"), host,
                F.element_at(F.array(F.lit("/private/x"), F.lit("/private/ok"),
                                     F.lit("/pub"), F.lit("/t123p")),
                             (i % 4 + 1).cast("int"))).alias("url"))
        hosts = spark.range(0, 200000).select(
            F.concat(F.lit("h"), F.col("id").cast("string"),
                     F.lit(".example.org")).alias("host"),
            F.lit("User-agent: *\nDisallow: /private\nAllow: /private/ok$\n"
                  "Disallow: /t*p\n").alias("robots_txt"))
        rules = robots_rules_df(hosts).localCheckpoint(eager=True)
        point("robots_filter", n, lambda u=urls, r=rules: [
            tuple(robots_filter(u, r)
                  .agg(F.count("*"),
                       F.sum(F.col("allowed").cast("long"))).collect()[0])])

    out = {"stage": "session_ops_scale", "cores": int(CORES), "ops": {}}
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
