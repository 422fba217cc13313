"""Scale points for the round-4 third-session operators: page metadata
extraction, canonical-URL dedup, mojibake repair, cross-doc sequence
packing, t-digest build.

Two-size (4x) protocol, appends to BENCH_sf1.json (same shape as
sketch_scale.py). Structural claims under test:
- html_meta / mojibake are pure scan projections → wall ~ linear scan;
- canonical_dedup adds ONE map-side-partial groupBy on the canonical
  target → shuffle volume = distinct targets;
- pack_sequences' only global state is the n_partitions-row offset
  table (packing by a precomputed count column so the point measures
  the packing machinery, not tokenization — tokenize cost is priced in
  the gopher/embed points);
- tdigest partials are bounded at ≤δ centroid rows per partition, so
  build == scan cost and merge input is n_parts·δ rows regardless of n.
Integer checksums double as determinism/partition-invariance proofs
(tdigest records n/centroid-count only — its state is partitioning-
dependent by design; the accuracy contract is test-pinned).
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
ROWS = int(os.environ.get("META_SCALE_ROWS", "4000000"))
ONLY = set(filter(None, os.environ.get("META_SCALE_OPS", "").split(",")))
# recrawl_priority at 16M rows spills its per-url window sort at the
# default cores==shuffle-partitions sizing (measured 2.25x super-linear;
# same cause as the snapshot_delta finding) — 128 partitions reads 0.36x.
SHUFFLE = os.environ.get("META_SCALE_SHUFFLE")


def main() -> int:
    from jsonschema_spark.operators.curate import pack_sequences
    from jsonschema_spark.operators.htmltext import (
        canonical_dedup_df, html_meta_df)
    from jsonschema_spark.operators.stats import tdigest_sketch
    from jsonschema_spark.operators.textstats import mojibake_stats_df

    spark = get_spark("meta_ops_scale", cores=CORES,
                      shuffle_partitions=int(SHUFFLE) if SHUFFLE else None)
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

    def pages(n):
        i = F.col("id")
        s = lambda c: c.cast("string")  # noqa: E731
        host = F.concat(F.lit("h"), (i % 99991).cast("string"),
                        F.lit(".example.org"))
        url = F.concat(F.lit("https://"), host, F.lit("/p/"), s(i))
        canon = (
            F.when(i % 3 == 0,
                   F.concat(F.lit('<link rel="canonical" href="https://'),
                            host, F.lit("/c/"), s(i % 1000003),
                            F.lit('?utm_source=x&a=1">')))
            .when(i % 3 == 1,
                  F.concat(F.lit("<link href='/c/"), s(i % 1000003),
                           F.lit("' rel='canonical'>")))
            .otherwise(F.lit("")))
        robots = F.when(i % 9 == 4,
                        F.lit('<meta name="robots" content="noindex">')) \
            .otherwise(F.lit(""))
        html = F.concat(
            F.lit("<html lang=en><head><title>Page &amp; "), s(i),
            F.lit('</title><meta name="description" content="d '), s(i),
            F.lit('">'), robots, canon,
            F.lit("</head><body>b</body></html>"))
        return spark.range(0, n, numPartitions=64).select(
            i.alias("doc_id"), url.alias("url"), html.alias("html"),
        ).localCheckpoint(eager=True)

    def moji_docs(n):
        i = F.col("id")
        base = F.concat(
            F.lit("plain body text segment "), i.cast("string"),
            F.lit(" with enough length to look like a paragraph of web"
                  " prose rather than a token"))
        t = F.when(i % 3 == 0,
                   F.concat(base, F.lit(" cafÃ© â€“ itâ€™s Â°C"))) \
            .otherwise(base)
        return spark.range(0, n, numPartitions=64).select(
            i.alias("doc_id"), t.alias("text")).localCheckpoint(eager=True)

    def counted_docs(n):
        i = F.col("id")
        return spark.range(0, n, numPartitions=64).select(
            i.alias("doc_id"),
            ((i * 7) % 1000 + 1).cast("long").alias("n_tok"),
            ((F.abs(F.xxhash64(i)) % 10_000_000) / F.lit(1000.0))
            .alias("v"),
        ).localCheckpoint(eager=True)

    OLD_OPS = {"html_meta", "canonical_dedup", "mojibake_stats",
               "pack_sequences_2048", "tdigest_build_d100"}
    run_old = not ONLY or bool(ONLY & OLD_OPS)
    # warmup (JVM + codegen + Arrow)
    w = pages(100_000) if run_old else None
    if run_old:
        html_meta_df(w, binary=False).agg(F.count("*")).collect()
        w2 = counted_docs(100_000)
        tdigest_sketch(w2, "v").collect()
        pack_sequences(w2, tokens_count_col="n_tok", seq_len=2048) \
            .agg(F.count("*")).collect()
        w.unpersist(); w2.unpersist()

    for mult in (1, 4) if run_old else ():
        n = ROWS * mult
        pg = pages(n)
        point("html_meta", n, lambda d=pg: [tuple(
            html_meta_df(d, binary=False)
            .agg(F.count("*"), F.sum(F.length("title")),
                 F.sum(F.col("noindex").cast("long")),
                 F.sum(F.length("canonical_href"))).collect()[0])])
        point("canonical_dedup", n, lambda d=pg: [tuple(
            canonical_dedup_df(d, binary=False)
            .agg(F.count("*"), F.sum("n_pages"), F.sum("keep_id"),
                 F.max("n_pages")).collect()[0])])
        pg.unpersist()
        md = moji_docs(n)
        point("mojibake_stats", n, lambda d=md: [tuple(
            mojibake_stats_df(d)
            .agg(F.count("*"), F.sum("n_chars_fixed"),
                 F.sum(F.col("changed").cast("long"))).collect()[0])])
        md.unpersist()
        cd = counted_docs(n)
        point("pack_sequences_2048", n, lambda d=cd: [tuple(
            pack_sequences(d, tokens_count_col="n_tok", seq_len=2048)
            .agg(F.count("*"), F.sum("n_tokens"), F.sum("n_docs"),
                 F.max("seq_id")).collect()[0])])
        point("tdigest_build_d100", n, lambda d=cd: [
            (lambda r: (int(r["n_rows"]), len(r["centroids"])))(
                tdigest_sketch(d, "v").collect()[0])])
        cd.unpersist()

    from jsonschema_spark.operators.embed import embedding_project_df
    from jsonschema_spark.operators.linkgraph import host_reciprocity
    from jsonschema_spark.operators.urltools import recrawl_priority

    def vec_docs(n, dim=64):
        i = F.col("id")
        vec = F.transform(
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda j: ((F.xxhash64(i, j) % 1000) / F.lit(500.0) - 1.0)
            .cast("float"))
        return spark.range(0, n, numPartitions=64).select(
            i.alias("vec_id"), vec.alias("embedding")
        ).localCheckpoint(eager=True)

    def snap_obs(n):
        # n observations = n/4 urls x 4 snapshots, version speeds by mod
        i = F.col("id")
        u = (i / 4).cast("long")
        s = (i % 4).cast("long")
        return spark.range(0, n, numPartitions=64).select(
            F.concat(F.lit("https://h"), (u % 99991).cast("string"),
                     F.lit(".org/p/"), u.cast("string")).alias("url"),
            s.alias("snap_id"),
            F.concat(F.lit("v"), ((s * (u % 3 + 1)) / 3).cast("long")
                     .cast("string"), F.lit(":"),
                     u.cast("string")).alias("sig"),
        ).localCheckpoint(eager=True)

    def edge_table(n):
        # quadratic lattice + every 5th edge REVERSED (guaranteed
        # reciprocity so the semi-join leg does real work)
        i = F.col("id")
        a = F.concat(F.lit("h"), ((i / 5).cast("long") % 200003)
                     .cast("string"))
        b = F.concat(F.lit("h"), (((i / 5).cast("long") ** 2 + 1) % 200003)
                     .cast("string"))
        rev = i % 5 == 0
        return spark.range(0, n, numPartitions=64).select(
            F.when(rev, b).otherwise(a).alias("src_host"),
            F.when(rev, a).otherwise(b).alias("dst_host"),
        ).localCheckpoint(eager=True)

    if not ONLY or ONLY & {"embedding_project_64_16", "recrawl_priority",
                           "host_reciprocity"}:
        wv = vec_docs(100_000)
        embedding_project_df(wv, "vec_id", "embedding", 64, 16) \
            .agg(F.count("*")).collect()
        wv.unpersist()
        for mult in (1, 4):
            n = ROWS * mult
            vd = vec_docs(n // 4)  # vectors are 64 floats: 1M/4M rows
            point("embedding_project_64_16", n // 4, lambda d=vd: [tuple(
                embedding_project_df(d, "vec_id", "embedding", 64, 16)
                .select("vec_id", F.explode("proj").alias("v"))
                .agg(F.count("*"), F.sum("v"),
                     F.sum(F.abs("v"))).collect()[0])])
            vd.unpersist()
            so = snap_obs(n)
            point("recrawl_priority", n, lambda d=so: [tuple(
                recrawl_priority(d)
                .agg(F.count("*"), F.sum("n_changes"),
                     F.sum("change_rate_ppm")).collect()[0])])
            so.unpersist()
            et = edge_table(n)
            point("host_reciprocity", n, lambda d=et: [tuple(
                host_reciprocity(d)
                .agg(F.count("*"), F.sum("n_recip"),
                     F.sum("recip_ppm")).collect()[0])])
            et.unpersist()

    out = {"stage": "meta_ops_scale", "cores": int(CORES), "ops": {}}
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
