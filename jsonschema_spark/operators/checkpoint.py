"""Resumable validation runs — per-partition manifest with lineage + metrics.

The north_rule requires runs resumable from a checkpointed per-partition
manifest (the analogue of the reference's precompiled-template hand-off,
SURVEY.md §3.3). Model:

- the input is partitioned by a coarse column (e.g. ``days(warc_ts)`` —
  Iceberg-style partition spec);
- one manifest JSON per partition value, written AFTER that partition's
  output commits: ``{partition, n_rows, n_valid, n_invalid, min_id,
  max_id, schema_fingerprint, input_path, engine_version}``;
- on restart, completed partitions are read from the manifest dir and
  filtered out of the scan *before* the job runs — partition pruning makes
  the skip free (the filter reaches the source; no data read for done
  partitions);
- a changed schema fingerprint invalidates all manifests (full rerun).

By default the whole TODO set runs as ONE Spark job (no driver-side
per-partition loop): filter → validate → write partitioned → per-partition
metrics agg → manifests. With ``wave_size`` set, the TODO partitions run
in waves of that many — one job + one manifest commit per wave — bounding
how much work a mid-run crash can lose (soaked for real: a SIGKILLed 16M-row
spark-submit resumes past its committed waves; scripts/soak_resume.py).
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Optional, Union

from pyspark.sql import DataFrame, functions as F

from jsonschema_spark.operators.validate import validate
from jsonschema_spark.plans.serialize import schema_fingerprint

ENGINE_VERSION = "0.1.0"


@dataclass
class RunResult:
    processed_partitions: list
    skipped_partitions: list
    metrics: dict


def _manifest_path(manifest_dir: str, value) -> str:
    return os.path.join(manifest_dir, f"part-{value}.json")


def load_completed(
    manifest_dir: str, fingerprint: str, snapshot_id: Optional[str] = None
) -> list:
    """Partition values with a manifest matching the schema fingerprint —
    and, when input lineage is pinned, the same input snapshot id (a
    manifest written against different data is stale, not done)."""
    if not os.path.isdir(manifest_dir):
        return []
    done = []
    for name in os.listdir(manifest_dir):
        if not name.endswith(".json"):
            continue
        with open(os.path.join(manifest_dir, name)) as f:
            m = json.load(f)
        if m.get("schema_fingerprint") != fingerprint:
            continue
        if snapshot_id is not None:
            recorded = (m.get("lineage") or {}).get("snapshot_id")
            if recorded != snapshot_id:
                continue
        # a NULL partition is never "done" — and a None inside the isin()
        # skip-list would make the IN predicate NULL for every unmatched
        # value, silently skipping ALL remaining partitions
        if m["partition"] is not None:
            done.append(m["partition"])
    return done


def run_validation_checkpointed(
    df: DataFrame,
    schema: Union[dict, bool],
    partition_col: str,
    out_dir: str,
    manifest_dir: str,
    input_path: Optional[str] = None,
    sketch_col: Optional[str] = None,
    lineage: Optional[dict] = None,
    wave_size: Optional[int] = None,
) -> RunResult:
    """Validate ``df`` partition-wise with resume-on-restart.

    Completed partitions (matching manifests) are pruned from the scan;
    the remainder runs writing verdict-annotated output partitioned by
    ``partition_col``, then an aggregate pass emits per-partition metrics
    manifests.

    ``wave_size`` bounds the failure blast radius: with it set, the TODO
    partition values are processed in waves of that many partitions — one
    Spark job + one manifest commit per wave — so a crash loses at most
    one wave of work and the rerun's partition pruning skips every
    committed wave. At 10^12 rows day-partitioned this is a driver loop
    over ~365/wave_size iterations, not a per-partition loop. Default
    ``None`` keeps the single-job shape (manifests commit at job end)."""
    fp = schema_fingerprint(schema)
    done = load_completed(manifest_dir, fp,
                          (lineage or {}).get("snapshot_id"))

    if wave_size:
        # one cheap distinct over the (partition-pruned) TODO scan — on a
        # real Iceberg table this is a metadata-only partitions query
        todo_f = (
            (F.col(partition_col).isNull() | ~F.col(partition_col).isin(done))
            if done else F.lit(True)
        )
        vals = [
            r[0]
            for r in df.filter(todo_f).select(partition_col).distinct().collect()
        ]
        # NULL partition values are never "done" (no manifest key); fold
        # them into the first wave so they are (re)processed exactly once
        has_null = any(v is None for v in vals)
        vals = sorted(v for v in vals if v is not None)
        waves = [vals[i:i + wave_size] for i in range(0, len(vals), wave_size)]
        if has_null:
            waves = waves or [[]]
        result = RunResult([], done, {})
        for i, wave in enumerate(waves):
            wf = F.col(partition_col).isin(wave)
            if i == 0 and has_null:
                wf = wf | F.col(partition_col).isNull()
            part = _run_scope(df, schema, partition_col, out_dir, manifest_dir,
                              wf, fp, input_path, sketch_col, lineage)
            result.processed_partitions.extend(part.processed_partitions)
            result.metrics.update(part.metrics)
        return result

    # Null-safe skip filter: `~isin(done)` alone is NULL for NULL partition
    # values, silently dropping those rows on resumed runs. Policy: a NULL
    # partition value is never considered "done" (its manifest key is not
    # representable), so NULL-partition rows are (re)processed every run.
    scope = (
        (F.col(partition_col).isNull() | ~F.col(partition_col).isin(done))
        if done
        else F.lit(True)
    )
    part = _run_scope(df, schema, partition_col, out_dir, manifest_dir,
                      scope, fp, input_path, sketch_col, lineage)
    return RunResult(part.processed_partitions, done, part.metrics)


def _run_scope(
    df: DataFrame,
    schema: Union[dict, bool],
    partition_col: str,
    out_dir: str,
    manifest_dir: str,
    scope,
    fp: str,
    input_path: Optional[str],
    sketch_col: Optional[str],
    lineage: Optional[dict],
) -> RunResult:
    """One job over ``df.filter(scope)`` + one manifest commit."""
    annotated = validate(df.filter(scope), schema)
    (
        # dynamic partition overwrite: re-processed partitions (e.g. after a
        # schema-fingerprint change or a killed run's partial files) REPLACE
        # their stale output instead of appending duplicates; untouched
        # partitions are left alone
        annotated.write.partitionBy(partition_col)
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(out_dir)
    )

    metrics_rows = (
        # one aggregate pass over the already-written output — re-reading
        # the committed files (not the input) makes the manifest reflect
        # exactly what landed on disk
        annotated.sparkSession.read.parquet(out_dir)
        .filter(scope)
        .groupBy(partition_col)
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum(F.col("valid").cast("long")).alias("n_valid"),
            F.sum((~F.col("valid")).cast("long")).alias("n_invalid"),
            # per-partition sketch state (north_rule lineage): HLL++
            # distinct estimate + min/max of the tracked column
            *(
                [
                    F.approx_count_distinct(sketch_col).alias("sk_distinct"),
                    F.min(sketch_col).cast("string").alias("sk_min"),
                    F.max(sketch_col).cast("string").alias("sk_max"),
                ]
                if sketch_col
                else []
            ),
        )
        .collect()
    )

    os.makedirs(manifest_dir, exist_ok=True)
    processed = []
    metrics = {}
    for r in metrics_rows:
        value = r[partition_col]
        if value is None:
            # policy: NULL-partition rows are written (dynamic overwrite
            # keeps them duplicate-free) but never manifested as "done" —
            # they are reprocessed every run
            metrics["null"] = {"n_rows": r["n_rows"], "n_valid": r["n_valid"]}
            continue
        m = {
            "partition": value,
            "partition_col": partition_col,
            "n_rows": r["n_rows"],
            "n_valid": r["n_valid"],
            "n_invalid": r["n_invalid"],
            "schema_fingerprint": fp,
            "input_path": input_path,
            "engine_version": ENGINE_VERSION,
        }
        if lineage:
            # north_star lineage: (snapshot-id, partition spec) — from
            # sources/iceberg.table_snapshot (Iceberg metadata tables, or
            # the deterministic parquet listing fingerprint locally)
            m["lineage"] = lineage
        if sketch_col:
            m["sketch"] = {
                "column": sketch_col,
                "approx_distinct": r["sk_distinct"],
                "min": r["sk_min"],
                "max": r["sk_max"],
            }
        tmp = _manifest_path(manifest_dir, value) + ".tmp"
        with open(tmp, "w") as f:
            json.dump(m, f)
        os.replace(tmp, _manifest_path(manifest_dir, value))  # atomic commit
        processed.append(value)
        metrics[str(value)] = {"n_rows": r["n_rows"], "n_valid": r["n_valid"]}
    return RunResult(processed, [], metrics)
