"""Two-size scale points for JSON-Schema inference (operators/infer.py).

Same discipline as the other *_scale scripts: the SAME job at 1× and 4×
rows on a warm JVM (first run untimed — the bpe_scale trap: a cold 1×
point absorbs ~6 s of JVM/Arrow startup and fakes a sub-linear ratio),
ratio-vs-linear reported, checksum printed so both sizes are attested
to compute the same thing. Appends to BENCH_sf1.json under
``infer_scale``.

The plan is scan-shaped by design: one census groupBy collapsing to
#keys rows, then one explode(#keys)×scan with map-side partials into a
#keys-row exchange; the enum window partitions by json_key over the
(key, distinct-sval) pre-agg, which the synthetic payload bounds at
#keys × ~60 rows. Expect ~linear.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from jsonschema_spark.operators.infer import infer_json_stats  # noqa: E402
from jsonschema_spark.session import get_spark  # noqa: E402

ROWS_1X = int(os.environ.get("INFER_SCALE_ROWS", "4000000"))
CORES = os.environ.get("SPARK_GRAFT_CPUS", "16")


def payload_df(spark, n: int):
    c = F.col("id")
    tag = F.element_at(
        F.array(F.lit("alpha"), F.lit("beta"), F.lit("gamma")),
        (c % 3).cast("int") + 1)
    p = (
        F.when(c % 11 == 0, F.lit("{oops"))
        .when(c % 13 == 0, F.lit("[1, 2]"))
        .otherwise(F.concat(
            F.lit('{"k": '), (c % 100).cast("string"),
            F.lit(', "tag": "'), tag,
            F.lit('", "score": '), (c % 17).cast("string"), F.lit(".5"),
            F.lit(', "note": '),
            F.when(c % 5 == 0, F.lit("null")).otherwise(
                F.concat(F.lit('"n'), (c % 50).cast("string"), F.lit('"'))),
            F.lit(', "meta": {"a": 1}, "ids": ['),
            (c % 4).cast("string"), F.lit("]}"))))
    return spark.range(n, numPartitions=128).select(p.alias("p"))


def run(spark, n: int):
    df = payload_df(spark, n)
    t0 = time.perf_counter()
    rows = infer_json_stats(df, "p").collect()
    wall = time.perf_counter() - t0
    chk = sum(r["n_present"] for r in rows) + sum(
        r["n_distinct_str"] for r in rows)
    return wall, len(rows), chk


def main() -> None:
    spark = get_spark("infer_scale", cores=CORES, shuffle_partitions=128)
    run(spark, 200_000)  # warm: codegen, Arrow, heap
    w1, k1, c1 = run(spark, ROWS_1X)
    w4, k4, c4 = run(spark, ROWS_1X * 4)
    ratio = round(w4 / (4 * w1), 3)
    out = {
        "rows_1x": ROWS_1X,
        "wall_1x_s": round(w1, 2),
        "wall_4x_s": round(w4, 2),
        "ratio_vs_linear": ratio,
        "docs_per_sec_4x": round(ROWS_1X * 4 / w4),
        "n_keys": k4,
        "checksum_1x": c1,
        "checksum_4x": c4,
        "cores": CORES,
    }
    print(json.dumps(out))
    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "BENCH_sf1.json")
    data = json.load(open(path)) if os.path.exists(path) else {}
    data["infer_scale"] = out
    json.dump(data, open(path, "w"), indent=1)


if __name__ == "__main__":
    main()
