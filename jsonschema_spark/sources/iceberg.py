"""Iceberg table source — snapshot-pinned reads + lineage capture.

The north_rule targets Iceberg tables of Common-Crawl-style pages: runs
must pin a snapshot (so a resumed job never mixes data from two commits)
and checkpoint manifests must carry `(snapshot-id, partition spec)`
lineage. Two tiers:

- **Iceberg runtime present** (the production path — cluster images ship
  the iceberg-spark-runtime jar): `read_table("catalog.db.pages",
  snapshot_id=...)` becomes `spark.read.option("snapshot-id", ...)
  .table(...)`; `table_snapshot` reads the current snapshot id and the
  partition spec from the Iceberg metadata tables
  (`<table>.snapshots` / `<table>.partitions`) — time travel, schema
  evolution and hidden partitioning all come from Iceberg itself.
- **Plain-parquet fallback** (this container has no Iceberg jar):
  a *deterministic* snapshot id is derived from the file listing
  (sorted (relative-path, size, mtime_ns) → sha256 prefix). That gives
  the same contract — "the data I resumed on is the data I started on"
  — verifiable without the catalog: if any file changed, the snapshot
  id changes and stale manifests are detectable.

Both tiers return the same `TableRef` shape so operators never branch.
"""

from __future__ import annotations

import hashlib
import os
from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class TableRef:
    """Resolved input: a DataFrame plus its lineage coordinates."""

    df: DataFrame
    snapshot_id: str
    partition_spec: str
    source: str  # "iceberg" | "parquet"


def iceberg_available(spark: SparkSession) -> bool:
    """True iff the Iceberg Spark runtime is on the session classpath."""
    try:
        spark._jvm.java.lang.Class.forName(  # noqa: SLF001 — classpath probe
            "org.apache.iceberg.spark.source.SparkTable"
        )
        return True
    except Exception:
        return False


def _parquet_snapshot_id(path: str) -> str:
    """Deterministic content fingerprint of a parquet directory/file:
    sha256 over the sorted (relpath, size, mtime_ns) listing."""
    entries = []
    if os.path.isdir(path):
        for root, _, files in os.walk(path):
            for name in sorted(files):
                if name.startswith(("_", ".")):
                    continue  # _SUCCESS / hidden markers don't carry data
                full = os.path.join(root, name)
                st = os.stat(full)
                entries.append(
                    (os.path.relpath(full, path), st.st_size, st.st_mtime_ns))
    else:
        st = os.stat(path)
        entries.append((os.path.basename(path), st.st_size, st.st_mtime_ns))
    h = hashlib.sha256()
    for rel, size, mtime in sorted(entries):
        h.update(f"{rel}\x00{size}\x00{mtime}\n".encode())
    return h.hexdigest()[:16]


def table_snapshot(spark: SparkSession, ref: str) -> dict:
    """Lineage coordinates of a table reference without reading data."""
    if _is_catalog_ref(ref) and iceberg_available(spark):
        snap = spark.sql(
            f"SELECT snapshot_id FROM {ref}.snapshots "
            "ORDER BY committed_at DESC LIMIT 1"
        ).collect()
        spec = spark.sql(f"DESCRIBE TABLE EXTENDED {ref}").collect()
        spec_str = ";".join(
            r["data_type"] for r in spec if r["col_name"].startswith("Part")
        )
        return {
            "snapshot_id": str(snap[0]["snapshot_id"]) if snap else "empty",
            "partition_spec": spec_str or "unpartitioned",
            "source": "iceberg",
        }
    return {
        "snapshot_id": _parquet_snapshot_id(ref),
        "partition_spec": "path",  # plain files: layout is the path itself
        "source": "parquet",
    }


def _is_catalog_ref(ref: str) -> bool:
    # catalog.db.table vs filesystem path
    return "/" not in ref and not os.path.exists(ref) and ref.count(".") >= 1


def read_table(
    spark: SparkSession,
    ref: str,
    snapshot_id: Optional[str] = None,
) -> TableRef:
    """Open ``ref`` pinned to a snapshot (current one if not given)."""
    if _is_catalog_ref(ref) and iceberg_available(spark):
        meta = table_snapshot(spark, ref)
        sid = snapshot_id or meta["snapshot_id"]
        reader = spark.read
        if sid not in ("empty", None):
            reader = reader.option("snapshot-id", sid)
        return TableRef(reader.table(ref), str(sid), meta["partition_spec"], "iceberg")
    meta = table_snapshot(spark, ref)
    if snapshot_id is not None and snapshot_id != meta["snapshot_id"]:
        raise ValueError(
            f"input changed since checkpoint: snapshot {meta['snapshot_id']} "
            f"!= pinned {snapshot_id} — plain files cannot time-travel; "
            "rerun from scratch or use an Iceberg catalog"
        )
    return TableRef(spark.read.parquet(ref), meta["snapshot_id"],
                    meta["partition_spec"], "parquet")
