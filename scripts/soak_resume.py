"""Kill/resume soak (VERDICT r2 #10): SIGKILL a real spark-submit
validation run mid-flight, then verify the rerun resumes from the
committed per-partition manifests — skipping every completed wave — and
converges to exactly the clean-run output (no lost rows, no duplicates).

    python scripts/soak_resume.py [--rows 16000000] [--cores 8] [--wave-size 24]

Protocol:
1. one-time prep: synthesize the pages table at N rows with a
   ``month = date_format(warc_ts, yyyy-MM)`` partition column, written
   hive-partitioned by month (the local stand-in for an Iceberg
   month-partition spec — wave scans are partition-pruned reads);
2. run 1: ``spark-submit --py-files dist/jsonschema_spark.zip
   scripts/submit_validate.py --wave-size W``; poll the manifest dir and
   SIGKILL the whole process group once ≥1 wave has committed;
3. run 2: identical command to completion; its stdout JSON must show the
   killed run's partitions under ``skipped_partitions``;
4. verify with DuckDB: output row count per month == input row count per
   month for every partition (dynamic partition overwrite replaced any
   partial files the kill left behind).

Prints ONE JSON line; exit code 0 iff every check passed.
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
BENCH_DIR = "/tmp/jsonschema_spark_bench"


def prep_input(rows: int, cores: int) -> str:
    path = os.path.join(BENCH_DIR, f"soak_input_{rows}")
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    sys.path.insert(0, ROOT)
    from pyspark.sql import functions as F

    from jsonschema_spark.session import get_spark
    from jsonschema_spark.sources.pages import pages_df

    spark = get_spark("soak-prep", cores=cores)
    (
        pages_df(spark, rows, num_partitions=cores * 4)
        .withColumn("month", F.date_format("warc_ts", "yyyy-MM"))
        .write.partitionBy("month")
        .mode("overwrite")
        .parquet(path)
    )
    spark.stop()
    return path


def submit_cmd(inp: str, schema: str, out: str, man: str, cores: int,
               wave_size: int) -> list[str]:
    return [
        "spark-submit",
        "--master", f"local[{cores}]",
        "--conf", "spark.driver.memory=8g",
        "--conf", "spark.sql.shuffle.partitions=32",
        "--conf", "spark.sql.session.timeZone=UTC",
        "--py-files", os.path.join(ROOT, "dist", "jsonschema_spark.zip"),
        os.path.join(ROOT, "scripts", "submit_validate.py"),
        "--input", inp,
        "--schema", schema,
        "--output", out,
        "--manifests", man,
        "--partition-col", "month",
        "--sketch-col", "url",
        "--wave-size", str(wave_size),
    ]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=16_000_000)
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--wave-size", type=int, default=24)
    ap.add_argument("--kill-after-waves", type=int, default=1)
    args = ap.parse_args()

    work = os.path.join(BENCH_DIR, f"soak_run_{args.rows}")
    out, man = os.path.join(work, "out"), os.path.join(work, "manifests")
    subprocess.run(["rm", "-rf", work], check=True)
    os.makedirs(work, exist_ok=True)

    inp = prep_input(args.rows, args.cores)
    subprocess.run([sys.executable, os.path.join(ROOT, "scripts", "package.py")],
                   check=True, cwd=ROOT, stdout=subprocess.DEVNULL)
    schema_path = os.path.join(work, "pages.schema.json")
    sys.path.insert(0, ROOT)
    from jsonschema_spark.sources.pages import WEBPAGE_SCHEMA

    with open(schema_path, "w") as f:
        json.dump(WEBPAGE_SCHEMA, f)

    cmd = submit_cmd(inp, schema_path, out, man, args.cores, args.wave_size)
    want = args.kill_after_waves * args.wave_size

    t0 = time.time()
    proc = subprocess.Popen(cmd, stdout=subprocess.DEVNULL,
                            stderr=subprocess.DEVNULL, start_new_session=True)
    n_at_kill = 0
    while proc.poll() is None:
        n = len([f for f in os.listdir(man)] if os.path.isdir(man) else [])
        if n >= want:
            n_at_kill = n
            os.killpg(os.getpgid(proc.pid), signal.SIGKILL)
            break
        time.sleep(0.5)
    proc.wait()
    killed = proc.returncode != 0
    t_kill = round(time.time() - t0, 1)

    # resume to completion — the second attempt must skip the committed waves
    t1 = time.time()
    res = subprocess.run(cmd, capture_output=True, text=True)
    t_resume = round(time.time() - t1, 1)
    last = [ln for ln in res.stdout.splitlines() if ln.startswith("{")][-1]
    report = json.loads(last)

    import duckdb

    per_month = dict(duckdb.sql(
        f"select month, count(*) from read_parquet('{inp}/*/*.parquet', "
        "hive_partitioning=1) group by 1"
    ).fetchall())
    got_month = dict(duckdb.sql(
        f"select month, count(*) from read_parquet('{out}/*/*.parquet', "
        "hive_partitioning=1) group by 1"
    ).fetchall())
    n_manifests = len([f for f in os.listdir(man) if f.endswith(".json")])
    # NULL warc_ts rows land in the hive default partition and, by policy,
    # carry no manifest (reprocessed each run)
    n_real_months = len([m for m in per_month
                         if m is not None and "__HIVE" not in str(m)])

    ok = (
        killed
        and n_at_kill >= want
        and len(report["skipped_partitions"]) >= n_at_kill
        and per_month == got_month
        and n_manifests == n_real_months
    )
    print(json.dumps({
        "rows": args.rows,
        "wave_size": args.wave_size,
        "manifests_at_kill": n_at_kill,
        "sec_to_kill": t_kill,
        "sec_resume": t_resume,
        "skipped_on_resume": len(report["skipped_partitions"]),
        "processed_on_resume": len(report["processed_partitions"]),
        "partitions_match_input": per_month == got_month,
        "n_partitions": len(per_month),
        "ok": ok,
    }))
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
