"""Schema lint — anti-pattern rules, the `jsonschema lint` analogue.

A curated subset of the reference's 46 linter rules
(/root/reference/vendor/blaze/src/alterschema/linter/) re-expressed over
plain dicts, plus ``lint_fix`` applying the auto-fixable ones (the
`--fix` analogue). Each finding: {path, rule, severity, message}.
"""

from __future__ import annotations

import copy
import re
from typing import Union

_BOUND_PAIRS = [
    ("minimum", "maximum"),
    ("exclusiveMinimum", "exclusiveMaximum"),
    ("minLength", "maxLength"),
    ("minItems", "maxItems"),
    ("minProperties", "maxProperties"),
    ("minContains", "maxContains"),
]


def _findings(node: dict, path: str) -> list[dict]:
    out = []

    def add(rule, severity, message):
        out.append({"path": path or "/", "rule": rule, "severity": severity, "message": message})

    if "enum" in node:
        if node["enum"] == []:
            add("enum_empty", "error", "enum with no values matches nothing")
        if "type" in node:
            add("enum_with_type", "warning", "type is redundant next to enum")
        seen, dupes = set(), set()
        for v in node["enum"]:
            key = repr(v)
            (dupes if key in seen else seen).add(key)
        if dupes:
            add("duplicate_enum_values", "warning", f"enum has duplicate values: {sorted(dupes)}")
    if "const" in node and "type" in node:
        add("const_with_type", "warning", "type is redundant next to const")
    if "const" in node and "enum" in node:
        add("const_with_enum", "warning", "enum is redundant next to const")
    req = node.get("required")
    if isinstance(req, list) and len(set(req)) != len(req):
        add("duplicate_required_values", "warning", "required lists a property twice")
    for lo, hi in _BOUND_PAIRS:
        if lo in node and hi in node and isinstance(node[lo], (int, float)) and isinstance(node[hi], (int, float)):
            if node[lo] > node[hi]:
                add("unsatisfiable_bounds", "error", f"{lo} ({node[lo]}) exceeds {hi} ({node[hi]}) — matches nothing")
    if "multipleOf" in node and isinstance(node["multipleOf"], (int, float)) and node["multipleOf"] <= 0:
        add("multiple_of_nonpositive", "error", "multipleOf must be > 0")
    for kw in ("allOf", "anyOf", "oneOf"):
        if isinstance(node.get(kw), list) and len(node[kw]) == 1:
            add("single_branch_combinator", "warning", f"{kw} with a single subschema is an unnecessary wrapper")
    if "if" in node and "then" not in node and "else" not in node:
        add("if_without_consequence", "warning", "if without then/else has no effect")
    if ("then" in node or "else" in node) and "if" not in node:
        add("consequence_without_if", "warning", "then/else without if has no effect")
    if node.get("additionalProperties") is False and isinstance(req, list):
        declared = set(node.get("properties", {}) or {})
        pats = [re.compile(p) for p in (node.get("patternProperties", {}) or {})]
        for name in req:
            if name not in declared and not any(p.search(name) for p in pats):
                add("required_undeclared_property", "error",
                    f"required property {name!r} can never exist in this closed object")
    for kw in ("minLength", "maxLength", "minItems", "maxItems", "minProperties", "maxProperties"):
        if kw in node and isinstance(node[kw], int) and node[kw] < 0:
            add("negative_bound", "error", f"{kw} must be non-negative")
    if isinstance(node.get("items"), list):
        add("tuple_items_legacy", "warning", "array-form items is the draft-7 tuple form; use prefixItems")
    return out


def _walk(node: Union[dict, bool], path: str, out: list[dict]) -> None:
    if not isinstance(node, dict):
        return
    out.extend(_findings(node, path))
    for key in ("properties", "patternProperties", "dependentSchemas", "$defs", "definitions"):
        if isinstance(node.get(key), dict):
            for name, sub in node[key].items():
                _walk(sub, f"{path}/{key}/{name}", out)
    for key in ("items", "additionalProperties", "propertyNames", "not", "contains", "if", "then", "else"):
        if isinstance(node.get(key), dict):
            _walk(node[key], f"{path}/{key}", out)
    for key in ("allOf", "anyOf", "oneOf", "prefixItems"):
        if isinstance(node.get(key), list):
            for i, sub in enumerate(node[key]):
                _walk(sub, f"{path}/{key}/{i}", out)


def lint_schema(schema: Union[dict, bool]) -> list[dict]:
    out: list[dict] = []
    _walk(schema, "", out)
    return out


_FIXABLE = {"enum_with_type", "const_with_type", "const_with_enum", "duplicate_enum_values",
            "duplicate_required_values", "single_branch_combinator", "if_without_consequence"}


def lint_fix(schema: Union[dict, bool]) -> Union[dict, bool]:
    """Apply the auto-fixable subset (the `lint --fix` analogue);
    returns a new schema.

    Fix rules are applied at SCHEMA positions only — the walker recurses
    through keyword-aware applicator locations (same dispatch as ``_walk``),
    never into the entries of ``properties``/``patternProperties``/``$defs``
    maps as if they were keywords, and never into ``const``/``enum``/
    ``default`` data values (a property literally named "enum" must keep
    its sibling definitions untouched)."""
    if not isinstance(schema, dict):
        return schema
    out = copy.deepcopy(schema)

    def fix(node):
        if not isinstance(node, dict):
            return node
        if "enum" in node and "type" in node:
            node.pop("type")
        if "const" in node:
            node.pop("type", None)
            node.pop("enum", None)
        if "enum" in node and isinstance(node["enum"], list):
            seen, dedup = set(), []
            for v in node["enum"]:
                if repr(v) not in seen:
                    seen.add(repr(v))
                    dedup.append(v)
            node["enum"] = dedup
        if isinstance(node.get("required"), list):
            node["required"] = list(dict.fromkeys(node["required"]))
        for kw in ("allOf", "anyOf", "oneOf"):
            if isinstance(node.get(kw), list) and len(node[kw]) == 1 and isinstance(node[kw][0], dict):
                inner = node.pop(kw)[0]
                for k, v in inner.items():
                    node.setdefault(k, v)
        if "if" in node and "then" not in node and "else" not in node:
            node.pop("if")
        for key in ("properties", "patternProperties", "dependentSchemas", "$defs", "definitions"):
            if isinstance(node.get(key), dict):
                for sub in node[key].values():
                    fix(sub)
        for key in ("items", "additionalProperties", "propertyNames", "not", "contains",
                    "if", "then", "else", "unevaluatedProperties", "unevaluatedItems"):
            if isinstance(node.get(key), dict):
                fix(node[key])
        for key in ("allOf", "anyOf", "oneOf", "prefixItems"):
            if isinstance(node.get(key), list):
                for x in node[key]:
                    fix(x)
        return node

    return fix(out)
