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

import pandas as pd
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
    # NB: wholetext must be the reader KWARG — the string option form is
    # silently ignored (each line would become its own document)
    df = (
        spark.read.option("recursiveFileLookup", str(recursive).lower())
        .option("pathGlobFilter", f"*{extension}")
        .text(path, wholetext=True)
        .select(F.input_file_name().alias("src"), F.col("value").alias("doc"))
    )
    return _apply_ignore(df, ignore)


def read_yaml_dir(
    spark: SparkSession,
    path: str,
    recursive: bool = True,
    ignore: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Directory of YAML instances (read_yaml_or_json analogue,
    /root/reference/src/command_validate.cc:403-430): whole-file read,
    converted to JSON document strings by an Arrow-batched pudf (YAML has
    no JVM-side parser; conversion happens once per file, executor-side —
    the doc then flows through the normal VARIANT path)."""
    import json

    from pyspark.sql.types import StringType

    try:
        import yaml  # noqa: F401
    except ImportError as e:  # pragma: no cover
        raise RuntimeError("YAML sources require pyyaml") from e

    @F.pandas_udf(StringType())
    def to_json_doc(s: pd.Series) -> pd.Series:
        import yaml as _yaml

        def conv(text):
            if text is None:
                return None
            try:
                return json.dumps(_yaml.safe_load(text), ensure_ascii=False)
            except _yaml.YAMLError:
                return None  # unparseable → NULL doc → parse-failure verdict

        return s.map(conv)

    base = (
        spark.read.option("recursiveFileLookup", str(recursive).lower())
        .option("pathGlobFilter", "*.y*ml")
        .text(path, wholetext=True)
        .select(F.input_file_name().alias("src"), to_json_doc(F.col("value")).alias("doc"))
    )
    return _apply_ignore(base, ignore)


def load_schema_file(path: str):
    """Driver-side schema loading, JSON or YAML by extension
    (read_yaml_or_json)."""
    import json

    if path.endswith((".yaml", ".yml")):
        import yaml

        with open(path) as f:
            return yaml.safe_load(f)
    with open(path) as f:
        return json.load(f)


def read_instances(
    spark: SparkSession,
    path: str,
    ignore: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Extension dispatch: .jsonl/.jsonl.gz → line mode, .yaml/.yml →
    YAML conversion, else whole-file JSON."""
    if path.endswith((".jsonl", ".jsonl.gz", ".ndjson")):
        return read_jsonl(spark, path, ignore=ignore)
    if path.endswith((".yaml", ".yml")):
        return read_yaml_dir(spark, path, ignore=ignore)
    return read_json_dir(spark, path, ignore=ignore)
