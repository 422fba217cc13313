"""jsonschema_spark — a PySpark-native JSON-Schema-style validation engine.

A from-scratch re-expression of the capabilities of the sourcemeta/jsonschema
CLI (reference: /root/reference, v16.7.0) on top of Spark DataFrames:

- ``compile_schema(schema)``      → driver-side compiled plan (pure Python)
- ``validate(df, schema, ...)``   → df + ``valid``/``violations`` columns
- ``violations(df, schema, ...)`` → exploded violation rows in the
  reference's standard-output shape (keywordLocation,
  absoluteKeywordLocation, instanceLocation, error) — see
  /root/reference/vendor/blaze/src/output/output_standard.cc:47-100

The compiler inverts the reference's row-at-a-time interpreter
(/root/reference/vendor/blaze/src/evaluator) into columnar predicates: one
compiled *schema* becomes a batch of Column expressions applied to millions
of rows per partition, fully inside Catalyst/Tungsten codegen. Nested JSON
documents are handled via Spark 4 VARIANT (see plans/context.py).
"""

from jsonschema_spark.operators.validate import (
    annotate,
    validate,
    violations,
    verdict_counts,
)
from jsonschema_spark.plans.compiler import compile_schema, CompiledSchema

__version__ = "0.1.0"

__all__ = [
    "annotate",
    "validate",
    "violations",
    "verdict_counts",
    "compile_schema",
    "CompiledSchema",
    "__version__",
]
