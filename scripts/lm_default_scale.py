"""Default-config LM scale point (VERDICT r4 directive 3 'done'
criterion): stupid_backoff_score with NO manual min_count at 1M/4M
docs. Under the auto defaults the run must (a) derive a non-trivial
count cutoff from the corpus token count, (b) take the shuffle-join
fallback when the N/min_count bound exceeds BROADCAST_MAX_ROWS, and
(c) hold near-linear wall scaling — the r4 'weak' was that the
DEFAULT configuration broadcast the unpruned corpus-scale model.

Same generated corpus as session4_ops_scale.doc_table (closed 5k-word
head + open tail, 16 tokens/doc) so the two measurements compare.
Appends to BENCH_sf1.json. Run idle (CLAUDE.md contamination rule).

Usage: [LM_SCALE_ROWS=1000000] python scripts/lm_default_scale.py
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
ROWS = int(os.environ.get("LM_SCALE_ROWS", "1000000"))


def main() -> int:
    from jsonschema_spark.operators import lm

    spark = get_spark("lm_default_scale", cores=CORES)

    def doc_table(n, toks=16):
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
            i.alias("doc_id"), text.alias("text")).localCheckpoint(
                eager=True)

    # warmup (JVM + codegen + join machinery)
    wd = doc_table(50_000)
    lm.stupid_backoff_score(wd, "doc_id", "text") \
        .agg(F.count("*")).collect()
    wd.unpersist()

    pts = []
    for mult in (1, 4):
        n = ROWS * mult
        dt = doc_table(n)
        n_tok = n * 16
        mc = lm._auto_min_count(n_tok, None)
        bc = (n_tok // mc) <= lm.BROADCAST_MAX_ROWS
        t0 = time.perf_counter()
        row = (lm.stupid_backoff_score(dt, "doc_id", "text")
               .agg(F.count("*"), F.sum("sb_score_ppm"),
                    F.sum("n_tier3"), F.sum("n_tier2"),
                    F.sum("n_tier1"), F.sum("n_oov")).collect()[0])
        wall = round(time.perf_counter() - t0, 2)
        dt.unpersist()
        pts.append({"n_docs": n, "n_tokens": n_tok,
                    "auto_min_count": mc, "broadcast": bc,
                    "wall_s": wall, "docs_per_s": round(n / wall),
                    "checksum": list(map(int, row))})
        print(pts[-1], flush=True)

    ratio = round(pts[1]["wall_s"] / pts[0]["wall_s"] / 4, 2)
    out = {"stage": "lm_default_scale", "cores": int(CORES),
           "points": pts, "wall_vs_linear_at_4x": ratio,
           "note": ("default config (min_count=None): auto cutoff + "
                    "size-gated broadcast; no manual tuning")}
    bench_path = os.path.join(ROOT, "BENCH_sf1.json")
    doc = json.load(open(bench_path))
    doc.setdefault("points", []).append(out)
    with open(bench_path, "w") as f:
        json.dump(doc, f, indent=1)
    print(json.dumps(out))
    return 0 if ratio < 1.5 else 1


if __name__ == "__main__":
    sys.exit(main())
