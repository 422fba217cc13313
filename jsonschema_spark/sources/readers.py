"""Instance sources — JSON file trees, JSONL, gzip JSONL.

The reference streams instances from files, directory walks (with
--extension / --ignore), JSONL and .jsonl.gz (/root/reference/src/
input.h:279-338, SURVEY.md §1.3). Spark equivalents — everything lands in
one shape: a DataFrame ``(src:string, doc:string)``, one row per JSON
document, ready for `validate(df, schema, doc_col="doc")`.

Scale notes: `text` reads split by line and parallelize across files;
gzip is whole-file (non-splittable) — parallelism = #files, which is the
right mental model for Common-Crawl-style dumps (many .gz shards).
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, functions as F


def _apply_ignore(df: DataFrame, ignore: Optional[Sequence[str]]) -> DataFrame:
    for frag in ignore or []:
        df = df.filter(~F.col("src").contains(frag))
    return df


def read_jsonl(
    spark: SparkSession,
    path: str,
    recursive: bool = True,
    ignore: Optional[Sequence[str]] = None,
) -> DataFrame:
    """JSONL (and .jsonl.gz — Spark decodes the codec transparently):
    one row per line, blank lines dropped."""
    df = (
        spark.read.option("recursiveFileLookup", str(recursive).lower())
        .text(path)
        .select(F.input_file_name().alias("src"), F.col("value").alias("doc"))
        .filter(F.length(F.trim(F.col("doc"))) > 0)
    )
    return _apply_ignore(df, ignore)


def read_json_dir(
    spark: SparkSession,
    path: str,
    extension: str = ".json",
    recursive: bool = True,
    ignore: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Directory of single-document JSON files (the `--extension` /
    `--ignore` walk): wholetext read, one row per file."""
    df = (
        spark.read.option("wholetext", "true")
        .option("recursiveFileLookup", str(recursive).lower())
        .option("pathGlobFilter", f"*{extension}")
        .text(path)
        .select(F.input_file_name().alias("src"), F.col("value").alias("doc"))
    )
    return _apply_ignore(df, ignore)


def read_instances(
    spark: SparkSession,
    path: str,
    ignore: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Extension dispatch: .jsonl/.jsonl.gz → line mode, else whole-file."""
    if path.endswith((".jsonl", ".jsonl.gz", ".ndjson")):
        return read_jsonl(spark, path, ignore=ignore)
    return read_json_dir(spark, path, ignore=ignore)
