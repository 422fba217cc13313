"""Scale points for the association/text operators of the round-4
seventh session: collocations, corpus-diff terms, vocab growth,
typosquat blocking, cross-group KMV overlap, session rules, grouped
winsorization.

Two-size (4x) protocol, appends to BENCH_sf1.json (same shape as
temporal_ops_scale.py). Structural claims under test:
- collocations / corpus_diff / vocab_growth are explode -> map-side
  groupBy shapes: wall ~ token volume, joins only touch the pruned
  (min_count) or vocabulary-sized tables;
- typosquat_pairs' fan-out is host length, its join key near-full
  hostnames — wall ~ candidate volume, never |C|x|T|;
- kmv_group_jaccard collapses to <=k rows/group before the
  group-pair stage (group count fixed, corpus grows);
- session_rules' per-session state is type-domain-bounded;
- winsorize_by_group is one group agg + one broadcast join back.
Integer checksums double as determinism proofs.
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
ROWS = int(os.environ.get("ASSOC_SCALE_ROWS", "1000000"))  # docs/events
ONLY = set(filter(None, os.environ.get("ASSOC_SCALE_OPS", "").split(",")))
SHUFFLE = os.environ.get("ASSOC_SCALE_SHUFFLE", "128")

TYPES = ("signup", "view", "click", "purchase", "error", "share")


def main() -> int:
    from jsonschema_spark.operators.dedup import kmv_group_jaccard
    from jsonschema_spark.operators.stats import winsorize_by_group
    from jsonschema_spark.operators.temporal import session_rules
    from jsonschema_spark.operators.textstats import (
        collocations,
        corpus_diff_terms,
        vocab_growth,
    )
    from jsonschema_spark.operators.urltools import typosquat_pairs

    spark = get_spark("assoc_ops_scale", cores=CORES,
                      shuffle_partitions=int(SHUFFLE))
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

    def docs(n, toks=32, vocab=50021):
        # 32-token docs over a closed-ish vocab; the first two tokens
        # draw from a 61-word head so frequent BIGRAMS exist (a
        # uniform 50k vocab never clears collocations' min_count);
        # date + group + split
        i = F.col("id")

        def tok(j):
            head = F.concat(
                F.lit("h"), (F.abs(F.xxhash64(i, j)) % 61)
                .cast("string"))
            tail = F.concat(
                F.lit("w"), (F.abs(F.xxhash64(i, j)) % vocab)
                .cast("string"))
            return F.when(j <= 1, head).otherwise(tail)

        text = F.concat_ws(" ", F.transform(
            F.sequence(F.lit(0), F.lit(toks - 1)), tok))
        return spark.range(0, n, numPartitions=64).select(
            i.alias("doc_id"), text.alias("text"),
            F.date_add(F.to_date(F.lit("2024-01-01")),
                       (i % 90).cast("int")).alias("d"),
            (i % 200).cast("string").alias("grp"),
            (i % 2 == 0).alias("sp"),
            ((F.abs(F.xxhash64(i, F.lit(9))) % 100_000) / F.lit(100.0))
            .alias("v"),
        ).localCheckpoint(eager=True)

    def events(n):
        i = F.col("id")
        return spark.range(0, n, numPartitions=64).select(
            i.alias("event_id"),
            (F.abs(F.xxhash64(i)) % (n // 100 + 1)).alias("user_id"),
            F.timestamp_seconds(
                1_700_000_000 + F.abs(F.xxhash64(i, F.lit(1)))
                % (90 * 86400)).alias("ts"),
            F.element_at(
                F.array(*[F.lit(s) for s in TYPES]),
                (F.abs(F.xxhash64(i, F.lit(2))) % 6 + 1).cast("int")
            ).alias("event_type"),
        ).localCheckpoint(eager=True)

    def hosts(n):
        i = F.col("id")
        base = F.concat(F.lit("host"), (i % 10_000).cast("string"),
                        F.lit(".example.org"))
        m = F.col("m")
        h = (
            F.when(m == 1, F.concat(F.expr("substr(host0, 1, p - 1)"),
                                    F.expr("substr(host0, p + 1, 64)")))
            .when(m == 2, F.concat(F.expr("substr(host0, 1, p)"),
                                   F.lit("x"),
                                   F.expr("substr(host0, p + 1, 64)")))
            .otherwise(F.col("host0")))
        return spark.range(0, n, numPartitions=64).select(
            base.alias("host0"),
            (i % 9 + 5).cast("int").alias("p"),
            (i % 3).alias("m"),
        ).select(h.alias("host")).localCheckpoint(eager=True)

    trusted = spark.range(0, 10_000).select(
        F.concat(F.lit("host"), F.col("id").cast("string"),
                 F.lit(".example.org")).alias("h")
    ).localCheckpoint(eager=True)

    def run_coll(d):
        out = collocations(d, "text", min_count=10, k=50)
        return [tuple(out.agg(F.count("*"), F.sum("n_ab"),
                              F.sum("lift_ppm")).collect()[0])]

    def run_diff(d):
        out = corpus_diff_terms(d, "text", F.col("sp"),
                                min_count=10, k=50)
        return [tuple(out.agg(F.count("*"), F.sum("n_a"),
                              F.sum("ratio_ppm")).collect()[0])]

    def run_growth(d):
        out = vocab_growth(d, "d", "text")
        return [tuple(out.agg(F.count("*"), F.sum("n_tokens"),
                              F.sum("n_new_types")).collect()[0])]

    def run_typo(d):
        out = typosquat_pairs(d, "host", trusted, "h")
        return [tuple(out.agg(F.count("*")).collect()[0])]

    def run_kmv(d):
        out = kmv_group_jaccard(
            d.select("grp", F.explode(F.split("text", " "))
                     .alias("tok")),
            "grp", F.col("tok"), k=128)
        return [tuple(out.agg(F.count("*"), F.sum("n_both"),
                              F.sum("jaccard_ppm")).collect()[0])]

    def run_rules(d):
        out = session_rules(d, "user_id", "ts", "event_type",
                            gap="2 hours", min_support=5)
        return [tuple(out.agg(F.count("*"), F.sum("n_both"),
                              F.sum("lift_ppm")).collect()[0])]

    def run_wins(d):
        out = winsorize_by_group(d, "grp", "v")
        return [tuple(out.agg(
            F.count("*"),
            F.sum(F.floor(F.col("v_clipped") * 100).cast("long")),
            F.sum((F.col("clip_flag").isNotNull()).cast("long"))
        ).collect()[0])]

    # warmup
    w = docs(50_000); we = events(50_000); wh = hosts(50_000)
    run_coll(w); run_diff(w); run_growth(w); run_kmv(w); run_wins(w)
    run_rules(we); run_typo(wh)
    w.unpersist(); we.unpersist(); wh.unpersist()

    for mult in (1, 4):
        n = ROWS * mult
        d = docs(n)
        point("collocations_mc10", n, lambda d=d: run_coll(d))
        point("corpus_diff_mc10", n, lambda d=d: run_diff(d))
        point("vocab_growth_day", n, lambda d=d: run_growth(d))
        point("kmv_group_jaccard_128", n, lambda d=d: run_kmv(d))
        point("winsorize_200grp", n, lambda d=d: run_wins(d))
        d.unpersist()
        e = events(n)
        point("session_rules_2h", n, lambda e=e: run_rules(e))
        e.unpersist()
        h = hosts(n)
        point("typosquat_10k_trusted", n, lambda h=h: run_typo(h))
        h.unpersist()

    out = {"stage": "assoc_ops_scale", "cores": int(CORES),
           "shuffle_partitions": int(SHUFFLE), "ops": {}}
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
