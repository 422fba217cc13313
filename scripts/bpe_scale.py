"""Scale points for the trainable BPE tokenizer (operators/bpe.py).

Two-size (4x) protocol, same as classify_scale.py; appends to
BENCH_sf1.json. Both halves of the operator are measured over the
deterministic documents generator (sources/docs.py — open-vocabulary
webtext model):

- TRAIN at n and 4n docs, fixed 12 merge rounds: the corpus is shuffled
  once into the (word, count) table, then every round is vocab-sized —
  wall must stay ~linear in the corpus pass (the vocab grows ~Heaps-law
  sublinearly). The learned merge LIST is the checksum: training is
  partition-invariant, so the 1x corpus (a prefix of the 4x corpus by
  generator design — doc_id-stable) pins determinism across layouts.
- ENCODE at m and 4m docs with a FIXED merge table, both paths:
  the chained-replace JVM projection (zero Python) and the Arrow pandas
  memoized encoder. Integer checksums (sum n_words / n_tokens) over the
  computed columns stop Catalyst pruning the expression under test and
  double as cross-path and cross-size agreement proofs.
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
TRAIN_DOCS = int(os.environ.get("BPE_SCALE_TRAIN", "200000"))
ENCODE_DOCS = int(os.environ.get("BPE_SCALE_ENCODE", "1000000"))
N_MERGES = 12


def main() -> int:
    from jsonschema_spark.operators.bpe import (
        bpe_encode_pandas,
        bpe_token_counts_df,
        bpe_train,
    )
    from jsonschema_spark.sources.docs import documents_df

    spark = get_spark("bpe_scale", cores=CORES)
    results = {}

    def point(op, n, fn):
        t0 = time.perf_counter()
        out = fn()
        wall = round(time.perf_counter() - t0, 2)
        results.setdefault(op, []).append(
            {"n": n, "wall_s": wall, "rows_per_s": round(n / wall),
             "checksum": out})
        print(op, n, wall, "s", flush=True)

    # warmup: JVM/codegen/Arrow spin-up would otherwise land entirely in
    # the FIRST timed point and fake a sub-linear train ratio
    warm = documents_df(spark, 20000, num_partitions=16) \
        .select("doc_id", "text").localCheckpoint(eager=True)
    bpe_train(warm, "text", 2)
    bpe_encode_pandas(warm, "doc_id", "text",
                      [(0, "e", "r", 1)]).agg(F.sum("n_tokens")).collect()
    warm.unpersist()

    tables = {}
    for mult in (1, 4):
        n = TRAIN_DOCS * mult
        docs = documents_df(spark, n, num_partitions=64) \
            .select("doc_id", "text").localCheckpoint(eager=True)

        def train(df=docs, size=n):
            m = bpe_train(df, "text", N_MERGES)
            tables[size] = m
            return [[rk, l, r, c] for rk, l, r, c in m]

        point(f"bpe_train_{N_MERGES}r", n, train)
        docs.unpersist()

    merges = tables[TRAIN_DOCS]
    for mult in (1, 4):
        n = ENCODE_DOCS * mult
        docs = documents_df(spark, n, num_partitions=64) \
            .select("doc_id", "text").localCheckpoint(eager=True)
        point("bpe_encode_jvm", n, lambda d=docs: [
            tuple(bpe_token_counts_df(d, "doc_id", "text", merges)
                  .agg(F.sum("n_words"), F.sum("n_tokens"),
                       F.sum("fertility_ppm")).collect()[0])])
        point("bpe_encode_pandas", n, lambda d=docs: [
            tuple(bpe_encode_pandas(d, "doc_id", "text", merges)
                  .agg(F.sum("n_words"), F.sum("n_tokens"),
                       F.sum("fertility_ppm")).collect()[0])])
        docs.unpersist()

    out = {"stage": "bpe_scale", "cores": int(CORES), "ops": {}}
    ok = True
    for op, pts in results.items():
        ratio = round(pts[1]["wall_s"] / pts[0]["wall_s"] / 4, 2)
        out["ops"][op] = {"points": pts, "wall_vs_linear_at_4x": ratio}
        ok &= ratio < 1.5
    # cross-path agreement at both encode sizes
    jvm = results["bpe_encode_jvm"]
    pd_ = results["bpe_encode_pandas"]
    agree = all(a["checksum"] == b["checksum"] for a, b in zip(jvm, pd_))
    out["encode_paths_agree"] = agree
    ok &= agree
    bench_path = os.path.join(ROOT, "BENCH_sf1.json")
    doc = json.load(open(bench_path))
    doc["points"].append(out)
    with open(bench_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(out))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
