"""Per-row invariants — byte-identical extracted text per url.

The BASELINE.json input_hint requires enforcing that the stored ``text``
column is byte-identical to what text-extraction recovers from ``html``,
verified with a zero-copy Arrow binary comparison. Two implementations:

- ``text_invariant_ok``: pure-JVM Column (decode + slice + compare) —
  the fast path, whole-stage codegen;
- ``arrow_bytes_equal``: Arrow-batched pandas UDF comparing the raw byte
  buffers of two binary columns. Arrow transfers the binary arrays
  without row-wise Python objects; the comparison walks the offsets and
  one flat data buffer per column (memoryview slices — no copies).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd
import pyarrow as pa
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import BooleanType

from jsonschema_spark.sources.pages import extract_text


def text_invariant_ok(html_col: Column, text_col: Column) -> Column:
    """JVM fast path: extract_text(html) == text, null-safe (both-null OK)."""
    return extract_text(html_col).eqNullSafe(text_col)


@F.pandas_udf(BooleanType())
def arrow_bytes_equal(a: pd.Series, b: pd.Series) -> pd.Series:
    """Zero-copy Arrow binary equality: compares value buffers via
    memoryview slices of the Arrow arrays (no per-row bytes objects
    beyond the final verdicts)."""
    aa = pa.Array.from_pandas(a, type=pa.binary())
    bb = pa.Array.from_pandas(b, type=pa.binary())
    av = memoryview(aa.buffers()[1]).cast("i")
    bv = memoryview(bb.buffers()[1]).cast("i")
    ad = memoryview(aa.buffers()[2]) if aa.buffers()[2] is not None else memoryview(b"")
    bd = memoryview(bb.buffers()[2]) if bb.buffers()[2] is not None else memoryview(b"")
    out = []
    for i in range(len(aa)):
        a_null, b_null = not aa[i].is_valid, not bb[i].is_valid
        if a_null or b_null:
            out.append(a_null and b_null)
        else:
            ia, ib = i + aa.offset, i + bb.offset
            out.append(ad[av[ia] : av[ia + 1]] == bd[bv[ib] : bv[ib + 1]])
    return pd.Series(out, dtype="object")


def text_invariant_violations(df: DataFrame, mode: str = "jvm") -> DataFrame:
    """Rows violating the extracted-text invariant.

    mode='jvm' (default, codegen) or 'arrow' (the zero-copy binary
    comparison UDF over (extracted-bytes, stored-bytes))."""
    if mode == "jvm":
        ok = text_invariant_ok(F.col("html"), F.col("text"))
    else:
        extracted = F.encode(extract_text(F.col("html")), "UTF-8")
        stored = F.encode(F.col("text"), "UTF-8")
        ok = arrow_bytes_equal(extracted, stored)
    return df.filter(~F.coalesce(ok, F.lit(False)))
