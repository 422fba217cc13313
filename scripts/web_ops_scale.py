"""Scale points for the web-graph / export operators.

Runs each of the session's crawl operators at two input sizes (4x apart)
in one JVM and reports throughput at both plus the size-4x wall ratio —
the same no-super-linear-stage evidence sf1_pipeline.py records for the
dedup pipeline. Appends points to BENCH_sf1.json.

Operators and shapes measured:
- html_extract: the full regex chain over synthesized crawl chrome (the
  exact construction the oracle query uses) — a pure scan projection, so
  wall should track bytes scanned ~linearly;
- anchor_text: element extraction + per-element parsing + counting agg;
- host_rank (3 iterations): synthetic power-law-ish edge graph — wall
  tracks edge count; per-iteration join+agg is the cost driver;
- shard packing: one window per source over (id, n_tokens) rows.

Timing protocol: aggregate over the COMPUTED columns (a bare count()
would let Spark prune away the very expressions under test), single JVM,
big-after-small ordering. One run per point — this is a linearity check,
not a median benchmark (scripts/scaling.py carries the alternating-rounds
protocol for the north-rule numbers).
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
SMALL_PAGES = int(os.environ.get("WEB_SCALE_PAGES", "1000000"))
SMALL_EDGES = int(os.environ.get("WEB_SCALE_EDGES", "2000000"))


def _chrome_pages(spark, n):
    """n pages of crawl chrome + hash text (the html_extract query shape,
    regenerated at any scale; codegen range->project, no Python)."""
    i = F.col("id")
    word = lambda k: F.element_at(  # noqa: E731
        F.array(*[F.lit(w) for w in
                  ("data", "spark", "crawl", "query", "shard", "graph",
                   "café", "filter")]),
        (F.abs(F.xxhash64(i, F.lit(k))) % 8 + 1).cast("int"))
    body = F.concat_ws(" ", *[word(k) for k in range(40)])
    html = F.concat(
        F.lit('<!DOCTYPE html><html><head><title>p</title><script>if (a<b)'
              ' { t("x"); }</script><style>.m { c: r; }</style></head>'
              '<body><!-- c --><nav>Home | R&amp;D</nav><a href="https://h'),
        (F.abs(F.xxhash64(i, F.lit(101))) % 200000).cast("string"),
        F.lit('.example.org/a">read more</a><a href="https://h'),
        (F.abs(F.xxhash64(i, F.lit(102))) % 200000).cast("string"),
        F.lit('.example.org/b">'), word(41), F.lit('</a><p>'), body,
        F.lit("</p></body></html>"),
    )
    src = F.concat(F.lit("h"), (i % 200000).cast("string"),
                   F.lit(".example.org"))
    return spark.range(0, n, numPartitions=64).select(
        src.alias("src_host"), F.encode(html, "UTF-8").alias("html"))


def main() -> int:
    from jsonschema_spark.operators.curate import shard_stats
    from jsonschema_spark.operators.htmltext import html_text_df
    from jsonschema_spark.operators.linkgraph import anchor_text_df, host_rank_df

    spark = get_spark("web_ops_scale", cores=CORES)
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
        n = SMALL_PAGES * mult
        pages = _chrome_pages(spark, n).localCheckpoint(eager=True)
        point("html_extract", n, lambda p=pages: [
            tuple(html_text_df(p, "src_host")
                  .agg(F.sum("n_chars"), F.sum("n_lines")).collect()[0])])
        point("anchor_text", n, lambda p=pages: [
            tuple(anchor_text_df(p)
                  .agg(F.count("*"), F.sum(F.length("anchor"))).collect()[0])])
        pages.unpersist()

    for mult in (1, 4):
        n = SMALL_EDGES * mult
        i = F.col("id")
        edges = spark.range(0, n, numPartitions=64).select(
            F.concat(F.lit("h"), (i % 200000).cast("string")).alias("src_host"),
            F.concat(F.lit("h"), (F.abs(F.xxhash64(i, F.lit(7)))
                                  % 200000).cast("string")).alias("dst_host"),
        ).where(F.col("src_host") != F.col("dst_host"))
        point("host_rank_3it", n, lambda e=edges: [
            tuple(host_rank_df(e, n_iter=3)
                  .agg(F.count("*"), F.sum("rank_ppm")).collect()[0])])

    for mult in (1, 4):
        n = SMALL_PAGES * mult
        i = F.col("id")
        docs = spark.range(0, n, numPartitions=64).select(
            i.alias("doc_id"),
            F.concat(F.lit("src"), (i % 20).cast("string")).alias("source"),
            (F.abs(F.xxhash64(i, F.lit(3))) % 300).alias("n_tokens"))
        point("shard_pack", n, lambda d=docs: [
            tuple(shard_stats(d, target_tokens=100_000)
                  .agg(F.count("*"), F.sum("tok_sum")).collect()[0])])

    out = {"stage": "web_ops_scale", "cores": int(CORES), "ops": {}}
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
