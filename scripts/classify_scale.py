"""Scale points for the trainable hashed quality classifier.

Two-size (4x) protocol, same as crawl_ops_scale.py; appends to
BENCH_sf1.json. Both halves of the operator are measured:

- TRAIN at n and 4n labeled docs (fast xxhash64 bucketing, bits=12,
  3 iterations — per-iteration cost is one corpus aggregation into
  model-sized rows, so wall must stay ~linear in n);
- SCORE at n and 4n docs with a fixed trained model (scan projection +
  one groupBy(doc) — the corpus-scale path).

Checksums are integer aggregates over the computed columns (sum of
margins / probabilities) so the expressions cannot be pruned, and —
because the arithmetic is all-integer — they are partition-invariant:
the 1x and 4x runs double-check determinism across different shuffle
layouts, not just speed.
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
TRAIN_DOCS = int(os.environ.get("CLS_SCALE_TRAIN", "100000"))
SCORE_DOCS = int(os.environ.get("CLS_SCALE_SCORE", "1000000"))


def _corpus(spark, n: int, labeled: bool):
    """Deterministic synthetic docs: ~24 planted-vocabulary tokens chosen
    by the label parity + 6 open-vocabulary tokens (hash-random ids) so
    bucket counts aren't degenerate."""
    i = F.col("id")
    y = (i % 2).cast("int")
    planted = [
        F.concat(F.when(y == 1, F.lit("good")).otherwise(F.lit("junk")),
                 (F.abs(F.xxhash64(i, F.lit(k))) % 40).cast("string"))
        for k in range(24)
    ]
    open_vocab = [
        F.concat(F.lit("w"), (F.abs(F.xxhash64(i, F.lit(100 + k))) % 100000)
                 .cast("string"))
        for k in range(6)
    ]
    cols = [i.alias("doc_id"),
            F.concat_ws(" ", *planted, *open_vocab).alias("text")]
    if labeled:
        cols.append(y.alias("label"))
    return spark.range(0, n, numPartitions=64).select(*cols)


def main() -> int:
    from jsonschema_spark.operators.classify import (
        classifier_score,
        train_classifier,
    )

    spark = get_spark("classify_scale", cores=CORES)
    results = {}

    def point(op, n, fn):
        t0 = time.perf_counter()
        out = fn()
        wall = round(time.perf_counter() - t0, 2)
        results.setdefault(op, []).append(
            {"n": n, "wall_s": wall, "rows_per_s": round(n / wall),
             "checksum": out})
        print(op, n, wall, "s", flush=True)

    weights = {}
    for mult in (1, 4):
        n = TRAIN_DOCS * mult
        lab = _corpus(spark, n, labeled=True).localCheckpoint(eager=True)

        def train(df=lab, size=n):
            w = train_classifier(df, "doc_id", "text", "label",
                                 bits=12, iters=3, portable=False)
            weights[size] = w
            return [sum(w), min(w), max(w)]

        point("classifier_train_3it", n, train)
        lab.unpersist()

    w = weights[TRAIN_DOCS * 4]
    for mult in (1, 4):
        n = SCORE_DOCS * mult
        docs = _corpus(spark, n, labeled=False).localCheckpoint(eager=True)
        point("classifier_score", n, lambda d=docs: [
            tuple(classifier_score(d, "doc_id", "text", w, portable=False)
                  .agg(F.count("*"), F.sum("score_ppm"),
                       F.sum("p_ppm")).collect()[0])])
        docs.unpersist()

    out = {"stage": "classify_scale", "cores": int(CORES), "ops": {}}
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
