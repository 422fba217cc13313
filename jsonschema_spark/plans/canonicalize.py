"""Schema canonicalization — semantic rewrite rules before compilation.

The reference ships a 126-rule canonicalizer
(/root/reference/vendor/blaze/src/canonicalizer/rules/, driver
canonicalize.cc:36-50) that rewrites schemas into simpler equivalent
forms so the compiler sees fewer shapes. This is the high-value subset
(each rule cites its reference analogue); ``canonicalize`` runs them to a
fixpoint, mirroring the postprocess fixpoint loop (postprocess.h:407-408).

Plan-level wins: flattened allOf keeps the conjunction shallow (fewer
nested _and_combine layers), folded bounds emit one comparison instead of
two, and unsatisfiable nodes become the false schema (compiles to a
constant — dead-code elimination downstream).
"""

from __future__ import annotations

import copy
from typing import Union

from jsonschema_spark.plans.upgrade import _walk_schema

_BOUND_PAIRS = [
    ("minimum", "maximum"),
    ("minLength", "maxLength"),
    ("minItems", "maxItems"),
    ("minProperties", "maxProperties"),
]


def _is_unsatisfiable(node: dict) -> bool:
    for lo, hi in _BOUND_PAIRS:
        if (
            isinstance(node.get(lo), (int, float))
            and isinstance(node.get(hi), (int, float))
            and not isinstance(node.get(lo), bool)
            and not isinstance(node.get(hi), bool)
            and node[lo] > node[hi]
        ):
            return True
    if node.get("enum") == []:
        return True
    if (
        isinstance(node.get("exclusiveMinimum"), (int, float))
        and isinstance(node.get("exclusiveMaximum"), (int, float))
        and node["exclusiveMinimum"] >= node["exclusiveMaximum"]
    ):
        return True
    return False


def _rewrite_node(node: dict, changed: list) -> None:
    def mark():
        changed.append(True)

    # enum_singleton_to_const (rules/enum_to_const.h analogue)
    if isinstance(node.get("enum"), list) and len(node["enum"]) == 1 and "const" not in node:
        node["const"] = node.pop("enum")[0]
        mark()
    # duplicate enum values dropped (deep repr equality)
    if isinstance(node.get("enum"), list):
        seen, dedup = set(), []
        for v in node["enum"]:
            if repr(v) not in seen:
                seen.add(repr(v))
                dedup.append(v)
        if len(dedup) != len(node["enum"]):
            node["enum"] = dedup
            mark()
    # exclusive/inclusive bound folding (rules: exclusive_* implication)
    if (
        isinstance(node.get("exclusiveMinimum"), (int, float))
        and isinstance(node.get("minimum"), (int, float))
    ):
        if node["exclusiveMinimum"] >= node["minimum"]:
            node.pop("minimum")
        else:
            node.pop("exclusiveMinimum")
        mark()
    if (
        isinstance(node.get("exclusiveMaximum"), (int, float))
        and isinstance(node.get("maximum"), (int, float))
    ):
        if node["exclusiveMaximum"] <= node["maximum"]:
            node.pop("maximum")
        else:
            node.pop("exclusiveMaximum")
        mark()
    # allOf flattening: nested allOf entries splice into the parent list
    # (rules/flatten_allof.h analogue)
    allof = node.get("allOf")
    if isinstance(allof, list):
        flat: list = []
        for sub in allof:
            if isinstance(sub, dict) and set(sub) == {"allOf"} and isinstance(sub["allOf"], list):
                flat.extend(sub["allOf"])
                mark()
            elif sub is True or sub == {}:
                mark()  # no-op branch dropped
            else:
                flat.append(sub)
        if not flat:
            node.pop("allOf")
            mark()
        else:
            node["allOf"] = flat
    # single-element allOf hoisted when keys don't collide
    allof = node.get("allOf")
    if (
        isinstance(allof, list)
        and len(allof) == 1
        and isinstance(allof[0], dict)
        and not (set(allof[0]) & set(node) - {"allOf"})
    ):
        inner = node.pop("allOf")[0]
        node.update(inner)
        mark()
    # double negation: not.not → allOf wrapper (rules/double_negation.h)
    nt = node.get("not")
    if isinstance(nt, dict) and set(nt) == {"not"} and isinstance(nt["not"], (dict, bool)):
        inner = node.pop("not")["not"]
        node.setdefault("allOf", []).append(inner if isinstance(inner, dict) else ({} if inner else {"not": {}}))
        mark()
    # type array singleton → string (rules/type_array_to_string.h)
    if isinstance(node.get("type"), list):
        types = list(dict.fromkeys(node["type"]))
        if len(types) == 1:
            node["type"] = types[0]
            mark()
        elif len(types) != len(node["type"]):
            node["type"] = types
            mark()
    # if without consequences is dead (rules/if_without_then_else.h)
    if "if" in node and "then" not in node and "else" not in node:
        node.pop("if")
        mark()
    # no-op defaults dropped (rules/*_default.h family)
    for kw, noop in (("minLength", 0), ("minItems", 0), ("minProperties", 0), ("multipleOf", 1)):
        if node.get(kw) == noop and not isinstance(node.get(kw), bool):
            node.pop(kw)
            mark()
    if node.get("uniqueItems") is False:
        node.pop("uniqueItems")
        mark()
    # unsatisfiable node → false schema marker (rules/unsatisfiable_*.h):
    # expressed as {"not": {}} which the compiler folds to constant False
    if _is_unsatisfiable(node) and node.get("not") != {}:
        node.clear()
        node["not"] = {}
        mark()


def canonicalize(schema: Union[dict, bool]) -> Union[dict, bool]:
    """Fixpoint canonical rewrite; returns a NEW schema."""
    if not isinstance(schema, dict):
        return schema
    out = copy.deepcopy(schema)
    for _ in range(10):  # fixpoint with a safety bound
        changed: list = []
        _walk_schema(out, lambda n: _rewrite_node(n, changed))
        if not changed:
            break
    return out
