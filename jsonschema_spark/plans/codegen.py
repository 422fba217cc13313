"""Schema → Spark StructType derivation — the `jsonschema codegen`
analogue (the reference emits TypeScript types,
/root/reference/src/command_codegen.cc; the natural Spark target is a
DataFrame schema).

Rules:
- object + properties → StructType; a field is non-nullable iff listed in
  ``required``;
- integer → LongType, number → DoubleType, string → StringType
  (format date-time → TimestampType, date → DateType when
  ``use_format_types``), boolean → BooleanType, null → NullType;
- array + items → ArrayType(items-type);
- type lists / missing type → the widest common Spark type (StringType
  fallback — documented lossy corner);
- $ref (same-document) resolved before derivation.
"""

from __future__ import annotations

from typing import Union

from pyspark.sql import types as T


def _resolve_local_ref(ref: str, root: dict):
    node = root
    for raw in ref.lstrip("#/").split("/"):
        if not raw:
            continue
        token = raw.replace("~1", "/").replace("~0", "~")
        node = node[token]
    return node


def _dtype(schema: Union[dict, bool], root: dict, use_format_types: bool) -> T.DataType:
    if schema is True or schema == {}:
        return T.StringType()
    if schema is False:
        return T.NullType()
    if "$ref" in schema and isinstance(schema["$ref"], str) and schema["$ref"].startswith("#"):
        return _dtype(_resolve_local_ref(schema["$ref"], root), root, use_format_types)
    t = schema.get("type")
    if isinstance(t, list):
        t = t[0] if len(t) == 1 else None
    if t == "integer":
        return T.LongType()
    if t == "number":
        return T.DoubleType()
    if t == "boolean":
        return T.BooleanType()
    if t == "null":
        return T.NullType()
    if t == "string":
        if use_format_types and schema.get("format") == "date-time":
            return T.TimestampType()
        if use_format_types and schema.get("format") == "date":
            return T.DateType()
        return T.StringType()
    if t == "array":
        items = schema.get("items", True)
        prefix = schema.get("prefixItems")
        if isinstance(prefix, list) and prefix:
            return T.ArrayType(_dtype(prefix[0], root, use_format_types))
        return T.ArrayType(_dtype(items if not isinstance(items, list) else items[0], root, use_format_types))
    if t == "object" or "properties" in schema:
        required = set(schema.get("required", []) or [])
        fields = [
            T.StructField(name, _dtype(sub, root, use_format_types), nullable=name not in required)
            for name, sub in (schema.get("properties", {}) or {}).items()
        ]
        if fields:
            return T.StructType(fields)
        ap = schema.get("additionalProperties")
        if isinstance(ap, dict):
            return T.MapType(T.StringType(), _dtype(ap, root, use_format_types))
        return T.MapType(T.StringType(), T.StringType())
    # enum/const-only schemas: infer from the constant values
    values = schema.get("enum", [schema["const"]] if "const" in schema else None)
    if values:
        if all(isinstance(v, bool) for v in values):
            return T.BooleanType()
        if all(isinstance(v, int) and not isinstance(v, bool) for v in values):
            return T.LongType()
        if all(isinstance(v, (int, float)) and not isinstance(v, bool) for v in values):
            return T.DoubleType()
        if all(isinstance(v, str) for v in values):
            return T.StringType()
    return T.StringType()


def struct_type_for(schema: Union[dict, bool], use_format_types: bool = False) -> T.StructType:
    """Top-level derivation; the schema must describe an object."""
    root = schema if isinstance(schema, dict) else {}
    dt = _dtype(schema, root, use_format_types)
    if not isinstance(dt, T.StructType):
        raise ValueError("top-level schema does not describe an object with properties")
    return dt
