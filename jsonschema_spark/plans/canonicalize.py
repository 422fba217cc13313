"""Schema canonicalization — semantic rewrite rules before compilation.

The reference ships a 126-rule canonicalizer
(/root/reference/vendor/blaze/src/canonicalizer/rules/, driver
canonicalize.cc:36-50) that rewrites schemas into simpler equivalent
forms so the compiler sees fewer shapes. This module re-expresses the
modern-dialect subset (~40 rules; each cites its reference analogue —
the remainder are draft-0-3 disallow/extends forms handled by
plans/upgrade.py first, plus framing-only rules like dialect-URI
normalization); ``canonicalize`` runs them to a fixpoint, mirroring the
postprocess fixpoint loop (postprocess.h:407-408).

Plan-level wins: flattened allOf keeps the conjunction shallow (fewer
nested _and_combine layers), folded bounds emit one comparison instead of
two, and unsatisfiable nodes become the false schema (compiles to a
constant — dead-code elimination downstream).
"""

from __future__ import annotations

import copy
from typing import Union

from jsonschema_spark.functions.canonical import canonical_dumps
from jsonschema_spark.plans.upgrade import _walk_schema

_ALL_TYPES = {"null", "boolean", "integer", "number", "string", "array", "object"}

_BOUND_PAIRS = [
    ("minimum", "maximum"),
    ("minLength", "maxLength"),
    ("minItems", "maxItems"),
    ("minProperties", "maxProperties"),
]


def _is_plain_num(v) -> bool:
    return isinstance(v, (int, float)) and not isinstance(v, bool)


def _type_ok_py(v, t: str) -> bool:
    from jsonschema_spark.plans.pyeval import _type_ok

    return _type_ok(v, t)


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


def _mentions_unevaluated(node) -> bool:
    if isinstance(node, dict):
        if "unevaluatedProperties" in node or "unevaluatedItems" in node:
            return True
        return any(_mentions_unevaluated(v) for v in node.values())
    if isinstance(node, list):
        return any(_mentions_unevaluated(v) for v in node)
    return False


def _rewrite_node(node: dict, changed: list, annotations_matter: bool = False) -> None:
    """``annotations_matter``: the document uses unevaluated* somewhere, so
    rules that would ERASE annotation sources (a successful anyOf branch's
    properties marks, a bare `if`'s marks) are disabled — dropping them
    changes which properties count as evaluated (2020-12 core §11)."""
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
    # double negation: not.not → allOf wrapper (rules/double_negation.h).
    # Annotation-gated: `not` discards its subtree's annotations, but an
    # allOf hoist lets them escape and mark properties as evaluated — a
    # verdict flip under unevaluated* (same gating as anyOf-true / bare-if)
    nt = node.get("not")
    if (
        not annotations_matter
        and isinstance(nt, dict) and set(nt) == {"not"} and isinstance(nt["not"], (dict, bool))
    ):
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
    # if without consequences is dead (rules/if_without_then_else.h) —
    # UNLESS annotations matter: a bare `if`'s successful-branch marks feed
    # unevaluated* even with no then/else
    if "if" in node and "then" not in node and "else" not in node and not annotations_matter:
        node.pop("if")
        mark()
    # empty then/else branches are no-ops (then_empty/else_empty analogues;
    # {} contributes neither assertions nor annotations)
    for kw in ("then", "else"):
        if node.get(kw) is True or node.get(kw) == {}:
            node.pop(kw)
            mark()
    # constant condition folding (if_then_else_implicit.h analogue): a
    # boolean-constant `if` selects its branch statically; the untaken
    # branch never contributes. Annotation-gated like bare-if: moving the
    # taken branch into allOf changes its annotation scope relative to the
    # conditional structure under unevaluated*
    if annotations_matter:
        pass
    elif node.get("if") is True or node.get("if") == {}:
        node.pop("if")
        taken = node.pop("then", None)
        node.pop("else", None)
        if isinstance(taken, dict) and taken:
            node.setdefault("allOf", []).append(taken)
        elif taken is False:
            node.clear()
            node["not"] = {}
            mark()
            return
        mark()
    elif node.get("if") is False or (
        isinstance(node.get("if"), dict)
        and node["if"].get("not") == {}
        and len(node["if"]) == 1
    ):
        node.pop("if")
        node.pop("then", None)
        taken = node.pop("else", None)
        if isinstance(taken, dict) and taken:
            node.setdefault("allOf", []).append(taken)
        elif taken is False:
            node.clear()
            node["not"] = {}
            mark()
            return
        mark()
    # no-op defaults dropped (rules/*_default.h family)
    for kw, noop in (("minLength", 0), ("minItems", 0), ("minProperties", 0)):
        if node.get(kw) == noop and not isinstance(node.get(kw), bool):
            node.pop(kw)
            mark()
    # multipleOf 1 is a no-op ONLY for integers (0.5 % 1 != 0) — the
    # reference gates multiple_of_default.h on type == "integer"
    if (
        node.get("multipleOf") == 1
        and not isinstance(node.get("multipleOf"), bool)
        and node.get("type") == "integer"
    ):
        node.pop("multipleOf")
        mark()
    if node.get("uniqueItems") is False:
        node.pop("uniqueItems")
        mark()
    # --- anyOf/oneOf branch algebra ----------------------------------------
    # (anyof_true_simplify / anyof_remove_false_schemas / flatten_nested_anyof /
    #  duplicate_anyof_branches / single_branch_anyof analogues)
    anyof = node.get("anyOf")
    if isinstance(anyof, list):
        if any(b is True or b == {} for b in anyof) and not annotations_matter:
            # one always-true branch satisfies the whole anyOf — but the
            # OTHER branches' annotations would be erased with it, so this
            # only fires when no unevaluated* consumes annotations
            node.pop("anyOf")
            mark()
        else:
            flat: list = []
            for b in anyof:
                if b is False or (isinstance(b, dict) and b.get("not") == {} and len(b) == 1):
                    mark()  # false branch contributes nothing
                elif isinstance(b, dict) and set(b) == {"anyOf"} and isinstance(b["anyOf"], list):
                    flat.extend(b["anyOf"])
                    mark()
                else:
                    flat.append(b)
            dedup_b, seen_b = [], set()
            for b in flat:
                kb = canonical_dumps(b)
                if kb not in seen_b:
                    seen_b.add(kb)
                    dedup_b.append(b)
            if len(dedup_b) != len(flat):
                mark()
            if not dedup_b:
                node.clear()
                node["not"] = {}  # all branches false → unsatisfiable
                mark()
                return
            if len(dedup_b) == 1 and isinstance(dedup_b[0], dict) and not (
                set(dedup_b[0]) & set(node) - {"anyOf"}
            ):
                node.pop("anyOf")
                node.update(dedup_b[0])
                mark()
            else:
                node["anyOf"] = dedup_b
    oneof = node.get("oneOf")
    if isinstance(oneof, list):
        kept = [b for b in oneof
                if not (b is False or (isinstance(b, dict) and b.get("not") == {} and len(b) == 1))]
        if len(kept) != len(oneof):  # oneof_false_simplify
            if not kept:
                node.clear()
                node["not"] = {}
                mark()
                return
            node["oneOf"] = kept
            mark()
        if len(kept) == 1 and isinstance(kept[0], dict) and not (
            set(kept[0]) & set(node) - {"oneOf"}
        ):  # single_branch_oneof
            node.pop("oneOf")
            node.update(kept[0])
            mark()
    # allOf containing a false branch → unsatisfiable (allof_false_simplify)
    if isinstance(node.get("allOf"), list) and any(
        b is False or (isinstance(b, dict) and b.get("not") == {} and len(b) == 1)
        for b in node["allOf"]
    ):
        node.clear()
        node["not"] = {}
        mark()
        return
    # duplicate allOf branches are idempotent (duplicate_allof_branches)
    if isinstance(node.get("allOf"), list):
        dedup_a, seen_a = [], set()
        for b in node["allOf"]:
            kb = canonical_dumps(b)
            if kb not in seen_a:
                seen_a.add(kb)
                dedup_a.append(b)
        if len(dedup_a) != len(node["allOf"]):
            node["allOf"] = dedup_a
            mark()
    # --- const/enum vs type ------------------------------------------------
    # const satisfying the sibling type → type redundant; contradicting it →
    # unsatisfiable (const_with_type / unsatisfiable_type_and_enum family)
    if "const" in node and "type" in node:
        ts = node["type"] if isinstance(node["type"], list) else [node["type"]]
        if any(_type_ok_py(node["const"], t) for t in ts):
            node.pop("type")
        else:
            node.clear()
            node["not"] = {}
        mark()
        return
    # enum values filtered by sibling type, then type dropped (enum_filter_by_type)
    if isinstance(node.get("enum"), list) and "type" in node:
        ts = node["type"] if isinstance(node["type"], list) else [node["type"]]
        kept_e = [v for v in node["enum"] if any(_type_ok_py(v, t) for t in ts)]
        node["enum"] = kept_e
        node.pop("type")
        mark()
        if not kept_e:
            node.clear()
            node["not"] = {}
            return
    # equal inclusive numeric bounds collapse to const (equal_numeric_bounds_to_const)
    t_num = node.get("type")
    if (
        _is_plain_num(node.get("minimum"))
        and node.get("minimum") == node.get("maximum")
        and "const" not in node
        and "enum" not in node
        and (t_num in ("integer", "number")
             or (isinstance(t_num, list) and t_num and set(t_num) <= {"integer", "number"}))
    ):
        ts = t_num if isinstance(t_num, list) else [t_num]
        if any(_type_ok_py(node["minimum"], t) for t in ts):
            lo = node.pop("minimum")
            node.pop("maximum")
            node.pop("type")
            node["const"] = lo
            mark()
        else:
            # bound contradicts the sibling type (e.g. integer ∧ min=max=1.5):
            # unsatisfiable, NOT const — collapsing to const would flip the
            # verdict for that very value
            node.clear()
            node["not"] = {}
            mark()
            return
    # integer-typed exclusive bounds fold to inclusive (exclusive_*_integer_to_*)
    if node.get("type") == "integer":
        em = node.get("exclusiveMinimum")
        if _is_plain_num(em) and float(em).is_integer() and "minimum" not in node:
            node["minimum"] = int(em) + 1
            node.pop("exclusiveMinimum")
            mark()
        ex = node.get("exclusiveMaximum")
        if _is_plain_num(ex) and float(ex).is_integer() and "maximum" not in node:
            node["maximum"] = int(ex) - 1
            node.pop("exclusiveMaximum")
            mark()
    # --- dead / implied keywords -------------------------------------------
    for kw in ("minContains", "maxContains"):  # *_contains_without_contains
        if kw in node and "contains" not in node:
            node.pop(kw)
            mark()
    if (
        isinstance(node.get("maxContains"), int)
        and isinstance(node.get("maxItems"), int)
        and node["maxContains"] >= node["maxItems"]
    ):  # max_contains_covered_by_max_items
        node.pop("maxContains")
        mark()
    if (
        isinstance(node.get("minProperties"), int)
        and isinstance(node.get("required"), list)
        and node["minProperties"] <= len(set(node["required"]))
    ):  # min_properties_covered_by_required
        node.pop("minProperties")
        mark()
    if isinstance(node.get("required"), list):
        uniq_r = list(dict.fromkeys(node["required"]))
        if len(uniq_r) != len(node["required"]):  # duplicate_required_values
            node["required"] = uniq_r
            mark()
    for kw in ("then", "else"):  # then_without_if / else_without_if
        if kw in node and "if" not in node:
            node.pop(kw)
            mark()
    if node.get("not") is False or (
        isinstance(node.get("not"), dict)
        and node["not"].get("not") == {}
        and len(node["not"]) == 1
    ):  # not_false: never matches the false schema → always true
        node.pop("not")
        mark()
    if "$comment" in node:  # comment_drop
        node.pop("$comment")
        mark()
    # empty applicator maps are no-ops (empty_*_drop family)
    for kw in ("$defs", "definitions", "dependentSchemas", "dependentRequired",
               "dependencies", "patternProperties", "properties"):
        if node.get(kw) == {}:
            node.pop(kw)
            mark()
    if isinstance(node.get("dependentRequired"), dict):
        trimmed = {k: v for k, v in node["dependentRequired"].items() if v != []}
        if len(trimmed) != len(node["dependentRequired"]):  # dependent_required_tautology
            if trimmed:
                node["dependentRequired"] = trimmed
            else:
                node.pop("dependentRequired")
            mark()
    # full type union is no constraint (type_union_implicit)
    if isinstance(node.get("type"), list) and set(node["type"]) >= _ALL_TYPES - {"integer"}:
        node.pop("type")
        mark()
    # no in-place applicators → unevaluated* degrade to the static keywords
    # (unevaluated_properties_to_additional_properties / unevaluated_items_to_items):
    # turns runtime mark-tracking into the compiler's static fast path
    _INPLACE = ("allOf", "anyOf", "oneOf", "if", "then", "else",
                "dependentSchemas", "$ref", "$dynamicRef", "$recursiveRef")
    if (
        "unevaluatedProperties" in node
        and "additionalProperties" not in node
        and not any(k in node for k in _INPLACE)
    ):
        node["additionalProperties"] = node.pop("unevaluatedProperties")
        mark()
    if (
        "unevaluatedItems" in node
        and "items" not in node
        and "contains" not in node  # contains marks hits evaluated; items would not
        and not any(k in node for k in _INPLACE)
    ):
        node["items"] = node.pop("unevaluatedItems")
        mark()
    # unsatisfiable node → false schema marker (rules/unsatisfiable_*.h):
    # expressed as {"not": {}} which the compiler folds to constant False
    if _is_unsatisfiable(node) and node.get("not") != {}:
        node.clear()
        node["not"] = {}
        mark()


def _collect_refs(node, out: set) -> None:
    if isinstance(node, dict):
        for kw in ("$ref", "$dynamicRef", "$recursiveRef"):
            v = node.get(kw)
            if isinstance(v, str):
                out.add(v)
        for v in node.values():
            _collect_refs(v, out)
    elif isinstance(node, list):
        for v in node:
            _collect_refs(v, out)


def _has_identifiers(node) -> bool:
    """An entry carrying $id/$anchor/$dynamicAnchor (or nesting one) may be
    referenced by URI or anchor name — never safe to drop by pointer."""
    if isinstance(node, dict):
        if any(k in node for k in ("$id", "$anchor", "$dynamicAnchor")):
            return True
        return any(_has_identifiers(v) for v in node.values())
    if isinstance(node, list):
        return any(_has_identifiers(v) for v in node)
    return False


def _drop_orphan_defs(root: dict, changed: list) -> None:
    """orphan_definitions.h analogue — remove top-level $defs/definitions
    entries no pointer reference reaches. Conservative: any non-pointer
    reference in the document (anchor or absolute URI) or an entry with
    identifiers disables dropping entirely."""
    refs: set = set()
    _collect_refs(root, refs)
    if any(not r.startswith("#/") for r in refs):
        return  # anchors / external URIs could reach defs invisibly
    for kw in ("$defs", "definitions"):
        defs = root.get(kw)
        if not isinstance(defs, dict):
            continue
        prefix = f"#/{kw}/"
        keep = {}
        for name, sub in defs.items():
            token = name.replace("~", "~0").replace("/", "~1")
            used = any(r == f"{prefix}{token}" or r.startswith(f"{prefix}{token}/")
                       for r in refs)
            if used or _has_identifiers(sub):
                keep[name] = sub
        if len(keep) != len(defs):
            changed.append(True)
            if keep:
                root[kw] = keep
            else:
                root.pop(kw)


def canonicalize(schema: Union[dict, bool]) -> Union[dict, bool]:
    """Fixpoint canonical rewrite; returns a NEW schema."""
    if not isinstance(schema, dict):
        return schema
    out = copy.deepcopy(schema)
    annotations_matter = _mentions_unevaluated(out)
    for _ in range(10):  # fixpoint with a safety bound
        changed: list = []
        _walk_schema(out, lambda n: _rewrite_node(n, changed, annotations_matter))
        _drop_orphan_defs(out, changed)
        if not changed:
            break
    return out
