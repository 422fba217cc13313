"""Schema/plan introspection — the `jsonschema inspect` analogue.

The reference dumps the frame (every schema location, its keyword, URI,
references — /root/reference/src/command_inspect.cc). We walk the schema
in compile order and report, per keyword location, the *execution
strategy* the compiler will pick against a given table schema:

- ``static``  — constant-folds at compile time (e.g. `type` on a typed
  flat column);
- ``column``  — native Column expression (codegen);
- ``pandas``  — Arrow-batched pandas UDF (the `format: regex` slow path);
- ``applicator`` — structural node with children.
"""

from __future__ import annotations

from typing import Optional, Union

from pyspark.sql import types as T

from jsonschema_spark.plans.compiler import _KEYWORD_ORDER, _ptr_escape

_APPLICATORS = {
    "properties", "patternProperties", "additionalProperties", "propertyNames",
    "dependentSchemas", "prefixItems", "items", "contains", "allOf", "anyOf",
    "oneOf", "not", "if", "$ref",
}
_PANDAS_KEYWORDS: dict[str, set] = {"format": {"regex"}}


def _strategy(key: str, value, col_dtype: Optional[T.DataType]) -> str:
    if key in _APPLICATORS:
        return "applicator"
    if key == "format" and value in _PANDAS_KEYWORDS["format"]:
        return "pandas"
    if key == "type" and col_dtype is not None:
        return "static"
    return "column"


def inspect_schema(
    schema: Union[dict, bool],
    df_schema: Optional[T.StructType] = None,
) -> list[dict]:
    """Flat listing of every keyword location:
    (keywordLocation, keyword, value, strategy)."""
    out: list[dict] = []
    fields = {f.name: f.dataType for f in df_schema.fields} if df_schema is not None else {}

    def walk(node, kw: str, col_dtype):
        if not isinstance(node, dict):
            out.append({"keywordLocation": kw, "keyword": "<boolean schema>",
                        "value": node, "strategy": "static"})
            return
        for key in _KEYWORD_ORDER:
            if key not in node:
                continue
            val = node[key]
            kwp = f"{kw}/{_ptr_escape(key)}"
            out.append({
                "keywordLocation": kwp,
                "keyword": key,
                "value": val if not isinstance(val, (dict, list)) else f"<{type(val).__name__}>",
                "strategy": _strategy(key, val, col_dtype),
            })
            if key == "properties" and isinstance(val, dict):
                for name, sub in val.items():
                    walk(sub, f"{kwp}/{_ptr_escape(name)}", fields.get(name) if kw == "" else None)
            elif key in ("items", "additionalProperties", "propertyNames", "not", "contains") and isinstance(val, dict):
                walk(val, kwp, None)
            elif key in ("allOf", "anyOf", "oneOf", "prefixItems") and isinstance(val, list):
                for i, sub in enumerate(val):
                    walk(sub, f"{kwp}/{i}", col_dtype if key != "prefixItems" else None)
            elif key in ("patternProperties", "dependentSchemas") and isinstance(val, dict):
                for pat, sub in val.items():
                    walk(sub, f"{kwp}/{_ptr_escape(pat)}", None)
            elif key == "if":
                for branch in ("if", "then", "else"):
                    if branch in node:
                        walk(node[branch], f"{kw}/{branch}", col_dtype)
    walk(schema, "", None)
    return out


def explain_schema(schema: Union[dict, bool], df_schema: Optional[T.StructType] = None) -> str:
    """Human-readable plan dump."""
    lines = []
    for e in inspect_schema(schema, df_schema):
        lines.append(f"{e['keywordLocation']:<50} {e['keyword']:<22} [{e['strategy']}]")
    return "\n".join(lines)
