"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE compact JSON line (<2 KB so the driver's tail capture never
truncates it): {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {flagship + 10 slowest: sec}, "n_queries": N, "sf": ...,
"docs_per_sec": ..., "cores": ..., "scaling": {...}} — the full
per-query timing/row map is written to BENCH_local.json alongside.

The flagship measurement is fast-mode validation throughput over a
synthetic Common-Crawl-style pages table generated at N rows (no I/O —
isolates the engine's validation pass, the reference's
`validate --benchmark --loop` analogue, command_validate.cc:83-133),
plus the sf-dir operator queries from __spark_entry__.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

import __spark_entry__ as entrymod  # noqa: E402
from jsonschema_spark import validate, violations  # noqa: E402
from jsonschema_spark.session import get_spark  # noqa: E402
from jsonschema_spark.sources.pages import WEBPAGE_SCHEMA, pages_df  # noqa: E402

PAGES_ROWS = int(os.environ.get("BENCH_PAGES_ROWS", "1000000"))
PAGES_CACHE = os.environ.get("BENCH_PAGES_DIR", f"/tmp/jsonschema_spark_bench/pages_{PAGES_ROWS}")


def _run(df) -> int:
    return df.count()


def _ensure_pages(spark) -> str:
    """Materialize the synthetic pages table once (untimed setup — the
    bench measures the validation engine, not the data generator)."""
    if not os.path.exists(os.path.join(PAGES_CACHE, "_SUCCESS")):
        pages_df(spark, PAGES_ROWS, num_partitions=64).write.mode("overwrite").parquet(PAGES_CACHE)
    return PAGES_CACHE


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cores = os.environ.get("SPARK_GRAFT_CPUS", "32")
    sf = float(sf_dir.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in sf_dir else 0.1
    spark = get_spark("bench", cores=cores)

    pages_path = _ensure_pages(spark)
    pages = spark.read.parquet(pages_path)
    # warm the scan path once (footer reads, codegen init)
    _run(pages.select(F.count(F.lit(1))))

    timings: dict[str, float] = {}
    rows: dict[str, int] = {}

    def bench(name, fn):
        t0 = time.perf_counter()
        n = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        rows[name] = n

    # flagship: fast validation, parquet scan → verdict agg, one codegen pass
    bench(
        "validate_pages_fast",
        lambda: _run(validate(pages, WEBPAGE_SCHEMA).groupBy("valid").count()),
    )
    # exhaustive mode: violation rows exploded (only failing rows materialize)
    bench(
        "violations_pages",
        lambda: _run(violations(pages, WEBPAGE_SCHEMA, id_cols=["url"])),
    )

    qs = entrymod.queries()
    for name, fn in qs.items():
        bench(name, lambda fn=fn: _run(fn(spark, sf_dir)))

    # scale-path variants (VERDICT r2 #9): the oracle queries above run the
    # exact no-cutoff mirrors so DuckDB can replay them; these time the
    # guarded invocations a 100 TB run would actually use.
    from jsonschema_spark.operators.dedup import jaccard_pairs, minhash_lsh_pairs

    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    bench(
        "dedup_jaccard_pairs_maxdf",
        lambda: _run(jaccard_pairs(docs, "doc_id", "text", shingle_n=3,
                                   min_ppm=500000, max_df=200)),
    )
    bench(
        "dedup_minhash_pairs_maxbanddf",
        lambda: _run(minhash_lsh_pairs(docs, "doc_id", "text", k=12, bands=6,
                                       max_band_df=200, portable=False)),
    )
    from jsonschema_spark.operators.lm import ngram_lm_score
    from pyspark.sql import functions as _F

    bench(
        "lm_score_fast",
        lambda: _run(ngram_lm_score(
            docs, "doc_id", "text",
            ref_df=docs.where(_F.col("source").isin("src0", "src1", "src2")),
            min_count=2, portable=False)),
    )
    from jsonschema_spark.operators.textstats import repetition_stats

    bench(
        "gopher_repetition_fast",
        lambda: _run(repetition_stats(docs, "doc_id", "text", portable=False)),
    )

    total = round(sum(timings.values()), 3)
    docs_per_sec = round(PAGES_ROWS / timings["validate_pages_fast"]) if timings.get("validate_pages_fast") else None
    out = {
        "metric": "headline query wall time",
        "value": total,
        "unit": "sec",
        "sf": sf,
        "cores": cores,
        "pages_rows": PAGES_ROWS,
        "docs_per_sec": docs_per_sec,
    }
    # attach the latest N→4N scaling evidence (scripts/scaling.py output)
    scaling_path = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_scaling_2_8.json")
    if os.path.exists(scaling_path):
        with open(scaling_path) as f:
            sc = json.load(f)
        # prefer the most recent confirmation section when present
        latest = sc.get("round5_confirmation",
                        sc.get("round4_final_confirmation",
                               sc.get("round4_confirmation", sc)))
        out["scaling"] = {
            "pair": f"local[{sc['n_cores']}] -> local[{sc['n4_cores']}]",
            "efficiency": latest["scaling_efficiency"],
            # keep the stdout line well under the driver's 2 KB tail
            # capture: compact protocol summary here, full narrative in
            # BENCH_scaling_2_8.json under the section named below
            "protocol": (
                "6 batches x 3 alternating fresh-JVM rounds over ~4.5h, "
                "16M rows; headline = clean-window batch (median-of-3 "
                "runs/JVM); capacity (min/level over 18 samples) "
                + json.dumps(latest.get("capacity_min_efficiency", {}))
                + "; pooled median under 4 loaded batches "
                + json.dumps(latest.get("pooled_median_efficiency", {}))
                + "; r4 clean-window 0.902/0.818/0.869 on byte-unchanged "
                "path; full narrative: BENCH_scaling_2_8.json "
                "round5_confirmation"
                if "pooled_median_efficiency" in latest
                else latest.get("protocol")),
            "docs_per_sec_n4": latest.get("docs_per_sec_n4"),
        }
    # full per-query detail goes to BENCH_local.json; the stdout line must
    # stay under ~2 KB or the driver's tail capture truncates it mid-line
    # (BENCH_r03.json arrived with parsed:null for exactly that reason) —
    # so the printed "queries" map carries the flagship entries + the 10
    # slowest operator queries, with the rest summarized.
    full = dict(out, queries=timings, rows=rows)
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_local.json"), "w") as f:
        json.dump(full, f, indent=1)
    headline = [
        "validate_pages_fast", "violations_pages",
        "dedup_jaccard_pairs_maxdf", "dedup_minhash_pairs_maxbanddf",
        "lm_score_fast", "gopher_repetition_fast",
    ]
    slow = sorted(
        (k for k in timings if k not in headline),
        key=lambda k: -timings[k],
    )[:10]
    out["queries"] = {k: timings[k] for k in headline + slow if k in timings}
    out["n_queries"] = len(timings)
    out["queries_detail"] = "BENCH_local.json"
    line = json.dumps(out)
    assert len(line) < 2000, f"driver line too long: {len(line)}"
    print(line)


if __name__ == "__main__":
    main()
