"""`jsonschema fmt` analogue — canonical keyword ordering + prettify.

The reference formats schemas by reordering every subschema's keys by a
fixed keyword-priority table and pretty-printing with configurable
indentation (/root/reference/src/command_fmt.cc;
/root/reference/vendor/blaze/src/format/format.cc:14-123 `keyword_rank`).
The rank table below reproduces that table verbatim — it is the
output-conformance contract (same reasoning as the violation-message
catalog): a formatted schema must byte-match the reference's ordering.

Only SCHEMA positions are reordered; the entries of `properties`/
`patternProperties`/`$defs` maps and `const`/`enum`/`default` data values
keep their source order (the reference reorders frame-identified
subschemas only, format.cc:146-167).
"""

from __future__ import annotations

import json
from typing import Union

from jsonschema_spark.plans.upgrade import _SCHEMA_LISTS, _SCHEMA_MAPS, _SCHEMA_VALUES

# vendor/blaze/src/format/format.cc:17-110 keyword_rank, verbatim order
_RANK_ORDER = [
    "$schema", "$id", "id", "$vocabulary", "$anchor", "$dynamicAnchor",
    "$recursiveAnchor",
    "title", "description", "$comment", "examples", "deprecated",
    "readOnly", "writeOnly", "default",
    "x-",  # placeholder rank for x--prefixed metadata keywords
    "$ref", "$dynamicRef", "$recursiveRef",
    "type", "disallow", "extends", "const", "enum", "optional", "requires",
    "allOf", "anyOf", "oneOf", "not", "if", "then", "else",
    "exclusiveMaximum", "maximum", "maximumCanEqual",
    "exclusiveMinimum", "minimum", "minimumCanEqual",
    "multipleOf", "divisibleBy", "maxDecimal",
    "pattern", "format", "maxLength", "minLength",
    "contentEncoding", "contentMediaType", "contentSchema",
    "maxItems", "minItems", "uniqueItems", "maxContains", "minContains",
    "contains", "prefixItems", "items", "additionalItems", "unevaluatedItems",
    "required", "maxProperties", "minProperties", "propertyNames",
    "properties", "patternProperties", "additionalProperties",
    "unevaluatedProperties", "dependentRequired", "dependencies",
    "dependentSchemas",
    "$defs", "definitions",
]
_RANK = {k: i for i, k in enumerate(_RANK_ORDER)}
_DEFAULT_RANK = len(_RANK_ORDER)


def _keyword_key(name: str):
    if name.startswith("x-"):
        return (_RANK["x-"], name)
    return (_RANK.get(name, _DEFAULT_RANK), name)


def _reorder(node: Union[dict, bool, list]):
    """Rebuild a schema node with canonically-ordered keys, recursing
    through schema positions only."""
    if not isinstance(node, dict):
        return node
    out = {}
    for key in sorted(node, key=_keyword_key):
        val = node[key]
        if key in _SCHEMA_MAPS and isinstance(val, dict):
            out[key] = {name: _reorder(sub) for name, sub in val.items()}
        elif key in _SCHEMA_VALUES and isinstance(val, (dict, bool)):
            out[key] = _reorder(val)
        elif key in _SCHEMA_LISTS and isinstance(val, list):
            out[key] = [_reorder(x) for x in val]
        elif key == "items" and isinstance(val, list):  # legacy tuple form
            out[key] = [_reorder(x) for x in val]
        else:
            out[key] = val
    return out


def format_schema(schema: Union[dict, bool], indent: int = 2,
                  keep_ordering: bool = False) -> str:
    """Formatted rendering (trailing newline included, like the CLI)."""
    doc = schema if keep_ordering else _reorder(schema)
    return json.dumps(doc, indent=indent, ensure_ascii=False) + "\n"


def fmt_check(text: str, indent: int = 2, keep_ordering: bool = False) -> bool:
    """The `fmt --check` analogue: is ``text`` already formatted?"""
    return format_schema(json.loads(text), indent, keep_ordering) == text


def fmt_paths(
    paths,
    check: bool = False,
    indent: int = 2,
    keep_ordering: bool = False,
    extension: str = ".json",
    ignore=(),
) -> dict:
    """The CLI's file/directory form: format (or --check) every schema
    file under ``paths``. Returns {path: "ok" | "formatted" | "fail"} —
    `fail` only in check mode; otherwise files are rewritten in place."""
    import os

    results: dict = {}

    def one(fp):
        with open(fp) as f:
            text = f.read()
        if fmt_check(text, indent, keep_ordering):
            results[fp] = "ok"
            return
        if check:
            results[fp] = "fail"
            return
        with open(fp, "w") as f:
            f.write(format_schema(json.loads(text), indent, keep_ordering))
        results[fp] = "formatted"

    ignored = [os.path.abspath(i) for i in ignore]
    for p in paths:
        if os.path.isdir(p):
            for root, dirs, files in os.walk(p):
                if any(os.path.abspath(root).startswith(i) for i in ignored):
                    dirs[:] = []
                    continue
                for name in sorted(files):
                    if name.endswith(extension):
                        one(os.path.join(root, name))
        else:
            one(p)
    return results
