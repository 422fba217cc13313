"""Snapshot-pinned table source (sources/iceberg.py) + manifest lineage.

No Iceberg jar ships in this container, so these tests exercise the
plain-parquet tier — the SAME TableRef contract the Iceberg tier
returns; the catalog branch is probed (classpath check returns False)."""

import time

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators.checkpoint import run_validation_checkpointed
from jsonschema_spark.sources.iceberg import (
    iceberg_available,
    read_table,
    table_snapshot,
)


def test_runtime_probe_is_honest(spark):
    assert iceberg_available(spark) is False  # no jar in this container


def test_parquet_snapshot_deterministic_and_change_sensitive(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(0, 10).write.parquet(p)
    s1 = table_snapshot(spark, p)
    s2 = table_snapshot(spark, p)
    assert s1 == s2 and s1["source"] == "parquet" and len(s1["snapshot_id"]) == 16
    time.sleep(0.01)
    spark.range(10, 20).write.mode("append").parquet(p)
    assert table_snapshot(spark, p)["snapshot_id"] != s1["snapshot_id"]


def test_read_table_pins_and_detects_drift(spark, tmp_path):
    p = str(tmp_path / "t")
    spark.range(0, 5).write.parquet(p)
    ref = read_table(spark, p)
    assert ref.df.count() == 5 and ref.source == "parquet"
    # same snapshot: re-open succeeds
    assert read_table(spark, p, snapshot_id=ref.snapshot_id).snapshot_id == ref.snapshot_id
    time.sleep(0.01)
    spark.range(5, 9).write.mode("append").parquet(p)
    with pytest.raises(ValueError, match="input changed"):
        read_table(spark, p, snapshot_id=ref.snapshot_id)


def test_checkpoint_manifests_carry_lineage(spark, tmp_path):
    import json
    import os

    p = str(tmp_path / "in")
    spark.range(0, 40).select(
        (F.col("id") % 2).alias("day"), F.col("id").alias("v")
    ).write.parquet(p)
    table = read_table(spark, p)
    out, man = str(tmp_path / "out"), str(tmp_path / "man")
    lineage = {"snapshot_id": table.snapshot_id,
               "partition_spec": table.partition_spec, "source": table.source}
    schema = {"properties": {"v": {"minimum": 0}}}
    r1 = run_validation_checkpointed(table.df, schema, "day", out, man,
                                     lineage=lineage)
    assert sorted(r1.processed_partitions) == [0, 1]
    with open(os.path.join(man, "part-0.json")) as f:
        m = json.load(f)
    assert m["lineage"]["snapshot_id"] == table.snapshot_id
    # same snapshot resume: everything skipped
    r2 = run_validation_checkpointed(table.df, schema, "day", out, man,
                                     lineage=lineage)
    assert r2.processed_partitions == [] and sorted(r2.skipped_partitions) == [0, 1]
    # different snapshot: manifests are STALE, partitions rerun
    r3 = run_validation_checkpointed(
        table.df, schema, "day", out, man,
        lineage={**lineage, "snapshot_id": "deadbeef00000000"})
    assert sorted(r3.processed_partitions) == [0, 1]
