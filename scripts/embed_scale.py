"""Scale points for the hashed-text-embedding producer (operators/embed).

Two-size (4x) protocol like classify_scale.py; appends to BENCH_sf1.json.
The build is ONE token explode -> ONE (id, bucket)-pair groupBy (text
never reshuffles) -> per-doc map assembly bounded by dim, so the claim
under test is structural: wall ~ linear in tokens. Checksums come from
embedding_stats_df's integer (nnz, norm_sq, position-sensitive checksum)
sums — bit-stable, so the two sizes double as determinism/partition-
invariance proofs, and the portable(md5) vs fast(xxhash64) paths are
measured side by side at 1x to price the portability tax.
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
ROWS = int(os.environ.get("EMBED_SCALE_ROWS", "250000"))
DIM = 64


def main() -> int:
    from jsonschema_spark.operators.embed import embedding_stats_df
    from jsonschema_spark.sources.docs import documents_df

    spark = get_spark("embed_scale", cores=CORES)
    results = {}

    def point(op, n, fn):
        t0 = time.perf_counter()
        out = fn()
        wall = round(time.perf_counter() - t0, 2)
        results.setdefault(op, []).append(
            {"n_docs": n, "wall_s": wall, "docs_per_s": round(n / wall),
             "checksum": out})
        print(op, n, wall, "s", flush=True)

    def stats_sum(d, portable):
        one = embedding_stats_df(d, "doc_id", "text", DIM,
                                 portable=portable).agg(
            F.sum("nnz"), F.sum("norm_sq"), F.sum("checksum")).collect()[0]
        return [int(x) for x in one]

    # warmup
    w = documents_df(spark, 20000).localCheckpoint(eager=True)
    stats_sum(w, False)
    w.unpersist()

    for mult in (1, 4):
        n = ROWS * mult
        docs = documents_df(spark, n).localCheckpoint(eager=True)
        point("embed_fast_xxhash", n, lambda d=docs: stats_sum(d, False))
        if mult == 1:
            point("embed_portable_md5", n, lambda d=docs: stats_sum(d, True))
        docs.unpersist()

    out = {"stage": "embed_scale", "cores": int(CORES), "dim": DIM, "ops": {}}
    ok = True
    for op, pts in results.items():
        entry = {"points": pts}
        if len(pts) == 2:
            ratio = round(pts[1]["wall_s"] / pts[0]["wall_s"] / 4, 2)
            entry["wall_vs_linear_at_4x"] = ratio
            ok &= ratio < 1.5
        out["ops"][op] = entry
    bench_path = os.path.join(ROOT, "BENCH_sf1.json")
    doc = json.load(open(bench_path))
    doc["points"].append(out)
    with open(bench_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(out))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
