"""Scale points for the round-4 fourth-session operators: URL
param-policy learning, stupid-backoff trigram LM, TrustRank, MIME
sniffing.

Two-size (4x) protocol, appends to BENCH_sf1.json (same shape as
meta_ops_scale.py). Structural claims under test:
- url_param_policy: one bounded explode (≤3 param keys/url) + two
  map-side-partial groupBys on near-unique (host,param,base) keys —
  shuffle volume ~ param-key rows, no window/self-join;
- stupid_backoff: model tables bounded by min_count pruning (closed
  head vocab + open tail), scoring = explode + 3 BROADCAST joins + one
  groupBy(doc) — corpus never shuffles;
- trustrank: 3 fixpoint iterations over a 200k-host graph — per-iter
  cost ~ edges, rank-table size constant in edge count;
- mime_sniff census: pure codegen scan projection + one tiny groupBy.
Integer checksums double as determinism/partition-invariance proofs.
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
ROWS = int(os.environ.get("S4_SCALE_ROWS", "2000000"))
ONLY = set(filter(None, os.environ.get("S4_SCALE_OPS", "").split(",")))
SHUFFLE = os.environ.get("S4_SCALE_SHUFFLE")


def main() -> int:
    from jsonschema_spark.operators.lm import stupid_backoff_score
    from jsonschema_spark.operators.linkgraph import trustrank_df
    from jsonschema_spark.operators.multimodal import mime_profile_df
    from jsonschema_spark.operators.urltools import url_param_policy

    spark = get_spark("session4_ops_scale", cores=CORES,
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

    def url_table(n):
        # n/4 four-variant base groups over ~100k hosts: 2/3 of groups
        # vary utm (sig constant -> invariant evidence), 1/3 vary page
        # (sig follows page -> non-invariant evidence)
        i = F.col("id")
        s = lambda c: c.cast("string")  # noqa: E731
        g = (i / 4).cast("long")
        v = i % 4
        host = F.concat(F.lit("h"), s(g % 99991), F.lit(".example.org"))
        path = F.concat(F.lit("/p/"), s((g / 99991).cast("long")))
        vary_page = g % 3 == 0
        page = F.when(vary_page, v).otherwise(g % 2)
        utm = F.when(vary_page, g % 11).otherwise(v)
        url = F.concat(F.lit("https://"), host, path,
                       F.lit("?page="), s(page), F.lit("&utm="), s(utm))
        sig = F.conv(F.substring(F.md5(F.concat(host, path, s(page))),
                                 1, 14), 16, 10)
        return spark.range(0, n, numPartitions=64).select(
            url.alias("url"), sig.alias("sig")).localCheckpoint(eager=True)

    def doc_table(n, toks=16):
        # closed 5k-word head + open tail (1 in 8 tokens corpus-unique)
        # so min_count=2 pruning does real work
        i = F.col("id")
        word = lambda j: F.when(  # noqa: E731
            (F.xxhash64(i, F.lit(j)) % 8) == 0,
            F.concat(F.lit("u"), F.abs(F.xxhash64(i, F.lit(j + 100)))
                     .cast("string")),
        ).otherwise(
            F.concat(F.lit("w"), (F.abs(F.xxhash64(i, F.lit(j + 200)))
                                  % 5000).cast("string")))
        text = F.concat_ws(" ", *[word(j) for j in range(toks)])
        return spark.range(0, n, numPartitions=64).select(
            i.alias("doc_id"), text.alias("text")).localCheckpoint(eager=True)

    def edge_table(n):
        i = F.col("id")
        a = F.concat(F.lit("h"), (i % 200003).cast("string"))
        b = F.concat(F.lit("h"), ((i * i + 1) % 200003).cast("string"))
        return spark.range(0, n, numPartitions=64).select(
            a.alias("src_host"), b.alias("dst_host")).localCheckpoint(
                eager=True)

    def payload_table(n):
        # real magic prefixes cycled by mod — pure JVM unhex, no Python
        i = F.col("id")
        pay = (
            F.when(i % 7 == 0, F.unhex(F.lit("89504E470D0A1A0A0000000D")))
            .when(i % 7 == 1, F.unhex(F.lit("474946383961100010")))
            .when(i % 7 == 2, F.unhex(F.lit("FFD8FFE000104A46")))
            .when(i % 7 == 3, F.unhex(F.concat(
                F.lit("52494646"), F.lpad(F.hex(i % 256), 8, "0"),
                F.lit("57415645"))))
            .when(i % 7 == 4, F.unhex(F.lit("000000106674797069736F6D")))
            .when(i % 7 == 5, F.unhex(F.lit("255044462D312E35")))
            .otherwise(F.unhex(F.lpad(F.hex(i), 16, "0"))))
        return spark.range(0, n, numPartitions=64).select(
            pay.alias("payload")).localCheckpoint(eager=True)

    # warmup (JVM + codegen + broadcast machinery)
    wu = url_table(100_000)
    url_param_policy(wu).agg(F.count("*")).collect()
    wu.unpersist()
    wd = doc_table(50_000)
    stupid_backoff_score(wd, "doc_id", "text", min_count=2) \
        .agg(F.count("*")).collect()
    wd.unpersist()

    seeds = spark.createDataFrame([(f"h{k}",) for k in range(100)],
                                  "host string")
    for mult in (1, 4):
        n = ROWS * mult
        ut = url_table(n)
        point("url_param_policy", n, lambda d=ut: [tuple(
            url_param_policy(d)
            .agg(F.count("*"), F.sum("n_groups"), F.sum("n_invariant"),
                 F.sum(F.col("strip_safe").cast("long")))
            .collect()[0])])
        ut.unpersist()
        dt = doc_table(n // 2)  # 16 tokens/doc -> 8M/32M tokens
        point("stupid_backoff_mc2", n // 2, lambda d=dt: [tuple(
            stupid_backoff_score(d, "doc_id", "text", min_count=2)
            .agg(F.count("*"), F.sum("sb_score_ppm"), F.sum("n_tier3"),
                 F.sum("n_tier2"), F.sum("n_tier1"), F.sum("n_oov"))
            .collect()[0])])
        dt.unpersist()
        et = edge_table(n)
        point("trustrank_3iter", n, lambda d=et: [tuple(
            trustrank_df(d, seeds, n_iter=3)
            .agg(F.count("*"), F.sum("trust_ppm"),
                 F.max("trust_ppm")).collect()[0])])
        et.unpersist()
        pt = payload_table(n * 2)
        point("mime_sniff_census", n * 2, lambda d=pt: [tuple(
            sorted(map(tuple, mime_profile_df(d).collect())))])
        pt.unpersist()

    out = {"stage": "session4_ops_scale", "cores": int(CORES), "ops": {}}
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
