"""Canonical JSON rendering for deep structural equality.

The reference's ``const``/``enum``/``uniqueItems`` compare whole JSON
values structurally (AssertionEqual evaluator_dispatch.h:697-712,
AssertionUnique :814-818): object key order is irrelevant and numbers
compare by value (1 == 1.0). Spark's ``to_json`` preserves source key
order and renders 1.0 as "1.0", so raw JSON-string comparison diverges.

Canonical form: sort object keys recursively, collapse integral floats to
integers, compact separators. Two JSON values are reference-equal iff
their canonical renderings are byte-equal (booleans stay distinct from
numbers: ``true`` vs ``1``).

These run as Arrow-batched pandas UDFs — the documented slow path, used
ONLY for container-valued comparisons (scalar const/enum/uniqueItems stay
pure JVM expressions).
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import Column, functions as F
from pyspark.sql.types import BooleanType, StringType


def _canon(v):
    if isinstance(v, bool):
        return v
    if isinstance(v, float) and v.is_integer():
        return int(v)
    if isinstance(v, dict):
        return {k: _canon(x) for k, x in v.items()}
    if isinstance(v, list):
        return [_canon(x) for x in v]
    return v


def canonical_dumps(value) -> str:
    """Canonical compact JSON of a python JSON value."""
    return json.dumps(_canon(value), sort_keys=True, separators=(",", ":"), ensure_ascii=False)


@F.pandas_udf(StringType())
def _canonical_json_udf(s: pd.Series) -> pd.Series:
    def canon(x):
        if x is None:
            return None
        try:
            return canonical_dumps(json.loads(x))
        except (ValueError, TypeError):
            return None

    return s.map(canon)


@F.pandas_udf(BooleanType())
def _unique_canonical_udf(s: pd.Series) -> pd.Series:
    """s = JSON rendering of an array; True iff all elements are distinct
    under canonical (deep, number-normalized) equality. Non-array input →
    vacuous True (the caller's type guard governs)."""

    def uniq(x):
        if x is None:
            return None
        try:
            arr = json.loads(x)
        except (ValueError, TypeError):
            return True
        if not isinstance(arr, list):
            return True
        seen = [canonical_dumps(e) for e in arr]
        return len(set(seen)) == len(seen)

    return s.map(uniq)


def canonical_json(col: Column) -> Column:
    """Canonical rendering of a JSON-string column (NULL on parse failure)."""
    return _canonical_json_udf(col)


def unique_canonical(json_array_col: Column) -> Column:
    """Deep uniqueItems over a JSON-array-string column."""
    return _unique_canonical_udf(json_array_col)
