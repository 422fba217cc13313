"""spark-submit entry point: resumable schema validation over a table.

The north_rule's deployment shape — submitted to a multi-executor cluster
with the engine shipped as a zip:

    python scripts/package.py                  # → dist/jsonschema_spark.zip
    spark-submit --master <cluster> \
        --py-files dist/jsonschema_spark.zip \
        scripts/submit_validate.py \
        --input  s3://bucket/pages/           \
        --schema schemas/pages.schema.json    \
        --output s3://bucket/verdicts/        \
        --manifests /shared/manifests         \
        --partition-col day [--sketch-col url]

Runs the checkpointed validation job (operators/checkpoint.py): completed
partitions (matching manifests) are pruned from the scan before the job
runs; output is written partition-overwrite-dynamic; one manifest JSON per
partition carries lineage (schema fingerprint, input path, metrics, sketch
state). Re-running after a failure resumes from the manifests.
"""

from __future__ import annotations

import argparse
import json


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input", required=True)
    p.add_argument("--schema", required=True, help="JSON or YAML schema file")
    p.add_argument("--output", required=True)
    p.add_argument("--manifests", required=True)
    p.add_argument("--partition-col", required=True)
    p.add_argument("--sketch-col", default=None)
    p.add_argument("--snapshot-id", default=None,
                   help="pin the input to an Iceberg snapshot (resume safety)")
    p.add_argument("--wave-size", type=int, default=None,
                   help="partitions per manifest-commit wave (bounds how "
                        "much work a crash can lose; default: one job)")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    # master/executors come from spark-submit; only job-level conf here
    spark = (
        SparkSession.builder.appName("jsonschema-spark-validate")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.adaptive.enabled", "true")
        .getOrCreate()
    )

    from jsonschema_spark.operators.checkpoint import run_validation_checkpointed
    from jsonschema_spark.sources.iceberg import read_table
    from jsonschema_spark.sources.readers import load_schema_file

    schema = load_schema_file(args.schema)
    # snapshot-pinned open: Iceberg catalog ref on the cluster, parquet
    # path (with a deterministic listing fingerprint) locally — either way
    # the run's lineage lands in every per-partition manifest
    table = read_table(spark, args.input, snapshot_id=args.snapshot_id)
    result = run_validation_checkpointed(
        table.df,
        schema,
        args.partition_col,
        args.output,
        args.manifests,
        input_path=args.input,
        sketch_col=args.sketch_col,
        lineage={"snapshot_id": table.snapshot_id,
                 "partition_spec": table.partition_spec,
                 "source": table.source},
        wave_size=args.wave_size,
    )
    print(
        json.dumps(
            {
                "processed_partitions": result.processed_partitions,
                "skipped_partitions": result.skipped_partitions,
                "metrics": result.metrics,
            },
            default=str,
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
