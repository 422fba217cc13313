"""Canonicalizer rules (plans/canonicalize.py) — targeted per-rule cases
plus a metamorphic safety net: canonicalization must never change what a
schema accepts (validate_py(s, x) == validate_py(canonicalize(s), x))."""

import random

from jsonschema_spark import canonicalize
from jsonschema_spark.plans.pyeval import validate_py

FALSE = {"not": {}}


def test_anyof_true_branch_drops_anyof():
    assert "anyOf" not in canonicalize({"anyOf": [{"type": "string"}, True]})
    assert "anyOf" not in canonicalize({"anyOf": [{}, {"minimum": 3}]})


def test_anyof_false_branches_removed_and_flattened():
    s = canonicalize({"anyOf": [False, {"anyOf": [{"minimum": 1}, {"minimum": 2}]},
                                {"minimum": 1}]})
    assert s == {"anyOf": [{"minimum": 1}, {"minimum": 2}]}  # dedup too


def test_anyof_all_false_is_unsatisfiable():
    assert canonicalize({"anyOf": [False, FALSE]}) == FALSE


def test_single_branch_anyof_hoisted():
    assert canonicalize({"anyOf": [{"minimum": 3}]}) == {"minimum": 3}


def test_oneof_false_simplify_and_single_branch():
    assert canonicalize({"oneOf": [{"minimum": 1}, False]}) == {"minimum": 1}
    assert canonicalize({"oneOf": [False]}) == FALSE


def test_allof_false_simplify():
    assert canonicalize({"allOf": [{"minimum": 1}, False]}) == FALSE


def test_duplicate_allof_branches():
    s = canonicalize({"allOf": [{"minimum": 1}, {"minimum": 1}, {"maximum": 9}]})
    assert s == {"minimum": 1, "maximum": 9} or s == {"allOf": [{"minimum": 1}, {"maximum": 9}]}


def test_const_with_type_matching_drops_type():
    assert canonicalize({"const": 5, "type": "integer"}) == {"const": 5}
    assert canonicalize({"const": 5.0, "type": "integer"}) == {"const": 5.0}


def test_const_with_type_contradiction_is_false():
    assert canonicalize({"const": "x", "type": "integer"}) == FALSE


def test_enum_filter_by_type():
    # the surviving singleton then collapses to const (enum_to_const)
    assert canonicalize({"enum": [1, "a", 2.5], "type": "integer"}) == {"const": 1}
    assert canonicalize({"enum": [1, "a", 2], "type": "integer"}) == {"enum": [1, 2]}
    assert canonicalize({"enum": ["a", "b"], "type": "integer"}) == FALSE


def test_equal_numeric_bounds_to_const():
    assert canonicalize({"type": "integer", "minimum": 4, "maximum": 4}) == {"const": 4}
    # absent / non-numeric type: rule must NOT fire (bounds don't bind non-numbers)
    s = canonicalize({"minimum": 4, "maximum": 4})
    assert s == {"minimum": 4, "maximum": 4}


def test_integer_exclusive_bounds_fold():
    s = canonicalize({"type": "integer", "exclusiveMinimum": 0, "exclusiveMaximum": 10})
    assert s == {"type": "integer", "minimum": 1, "maximum": 9}


def test_contains_bounds_without_contains_drop():
    assert canonicalize({"minContains": 2, "maxContains": 5}) == {}
    kept = canonicalize({"contains": {"minimum": 1}, "minContains": 2})
    assert kept == {"contains": {"minimum": 1}, "minContains": 2}


def test_max_contains_covered_by_max_items():
    s = canonicalize({"contains": {"minimum": 1}, "maxContains": 5, "maxItems": 3})
    assert "maxContains" not in s


def test_min_properties_covered_by_required():
    s = canonicalize({"required": ["a", "b"], "minProperties": 2})
    assert "minProperties" not in s
    s2 = canonicalize({"required": ["a"], "minProperties": 2})
    assert s2["minProperties"] == 2


def test_then_else_without_if_dropped():
    assert canonicalize({"then": {"minimum": 1}, "else": {"maximum": 2}}) == {}


def test_not_false_always_true():
    assert canonicalize({"not": False}) == {}
    assert canonicalize({"not": {"not": {}}}) == {}


def test_comment_and_empty_maps_dropped():
    s = canonicalize({"$comment": "hi", "$defs": {}, "properties": {},
                      "dependentRequired": {"a": []}})
    assert s == {}


def test_type_union_implicit():
    full = ["null", "boolean", "integer", "number", "string", "array", "object"]
    assert canonicalize({"type": full}) == {}
    assert canonicalize({"type": ["string", "number"]}) == {"type": ["string", "number"]}


def test_unevaluated_to_static_rewrites():
    s = canonicalize({"properties": {"a": True}, "unevaluatedProperties": False})
    assert s == {"properties": {"a": True}, "additionalProperties": False}
    # in-place applicators present (non-collapsible allOf) → must NOT rewrite
    s2 = canonicalize({"allOf": [{"properties": {"a": True}},
                                 {"properties": {"b": True}}],
                       "unevaluatedProperties": False})
    assert "unevaluatedProperties" in s2
    s3 = canonicalize({"prefixItems": [True], "unevaluatedItems": False})
    assert s3 == {"prefixItems": [True], "items": False}
    s4 = canonicalize({"contains": {"minimum": 1}, "unevaluatedItems": False})
    assert "unevaluatedItems" in s4


# --- metamorphic safety net -------------------------------------------------

def _instances(rng):
    vals = [None, True, False, 0, 1, 2, 7, -3, 2.5, 1.0, "en", "de", "", "xxxx",
            [1, 2], [1, 1.0], [], {"a": 1}, {"a": 1, "s": "en"},
            {"a": 2, "b": 0.5, "s": "de", "xs": [1, 2, 3]},
            {"b": 3.3, "o": {"p": 9}}, {"s": "héllo", "xs": [5, -2]}]
    return rng.sample(vals, k=8)


def test_canonicalize_preserves_semantics():
    import tests.test_metamorphic as tm

    rng = random.Random(20260818)
    for _ in range(150):
        schema = tm._rand_schema(rng)
        canon = canonicalize(schema)
        for inst in _instances(rng):
            assert validate_py(schema, inst) == validate_py(canon, inst), (
                schema, canon, inst)


def test_annotation_sources_preserved_under_unevaluated():
    # a successful anyOf branch's properties mark keys as evaluated — the
    # always-true-branch drop must NOT fire when unevaluated* consumes them
    s = {"anyOf": [True, {"properties": {"a": {"type": "string"}}}],
         "unevaluatedProperties": False}
    c = canonicalize(s)
    assert validate_py(s, {"a": "x"}) is True
    assert validate_py(c, {"a": "x"}) is True, c
    # bare `if` annotations likewise
    s2 = {"if": {"properties": {"a": {}}, "required": ["a"]},
          "unevaluatedProperties": False}
    c2 = canonicalize(s2)
    assert validate_py(s2, {"a": 1}) is validate_py(c2, {"a": 1}) is True
    # without unevaluated* in scope the simplifications still fire
    assert "anyOf" not in canonicalize({"anyOf": [True, {"properties": {"a": {}}}]})
    assert "if" not in canonicalize({"if": {"required": ["a"]}})


def test_constant_if_folding():
    # if: true → then becomes an unconditional conjunct; else unreachable
    s = canonicalize({"if": True, "then": {"minimum": 3}, "else": {"maximum": 1}})
    assert validate_py(s, 5) is True and validate_py(s, 2) is False
    assert "if" not in s and "else" not in s
    # if: false → else applies; then unreachable
    s2 = canonicalize({"if": False, "then": {"minimum": 3}, "else": {"maximum": 1}})
    assert validate_py(s2, 1) is True and validate_py(s2, 2) is False
    # false-schema condition folds the same way
    s3 = canonicalize({"if": {"not": {}}, "else": {"maximum": 1}})
    assert validate_py(s3, 1) is True and validate_py(s3, 2) is False
    # constant condition into a false branch → unsatisfiable
    assert canonicalize({"if": True, "then": False}) == FALSE
    assert canonicalize({"if": False, "else": False}) == FALSE


def test_empty_then_else_dropped():
    s = canonicalize({"if": {"minimum": 0}, "then": {}, "else": True})
    assert "then" not in s and "else" not in s


def test_orphan_defs_dropped():
    s = canonicalize({"$defs": {"used": {"type": "integer"},
                                "orphan": {"type": "string"},
                                "chain": {"$ref": "#/$defs/orphan2"},
                                "orphan2": {"minimum": 1}},
                      "$ref": "#/$defs/used"})
    # orphan + the chain that only orphans referenced are cascaded away
    assert set(s["$defs"]) == {"used"}
    # anchors / whole-doc refs disable dropping entirely (conservative)
    s2 = canonicalize({"$defs": {"a": {"$anchor": "x"}, "b": {}},
                       "properties": {"p": {"$ref": "#x"}}})
    assert set(s2["$defs"]) == {"a", "b"}
    s3 = canonicalize({"$defs": {"a": {}}, "properties": {"p": {"$ref": "#"}}})
    assert "a" in s3["$defs"]


def test_double_negation_gated_on_annotations():
    # not.not → allOf would let the inner subtree's annotations escape a
    # `not` (which discards them) and flip verdicts under unevaluated*
    s = {"not": {"not": {"properties": {"a": {"type": "integer"}}}},
         "unevaluatedProperties": False}
    c = canonicalize(s)
    assert validate_py(s, {"a": 1}) is validate_py(c, {"a": 1}) is False, c
    # without unevaluated* in scope the rewrite still fires
    c2 = canonicalize({"not": {"not": {"minimum": 3}}})
    assert validate_py(c2, 5) is True and validate_py(c2, 1) is False
    assert "not" not in c2


def test_constant_if_fold_gated_on_annotations():
    s = {"if": True, "then": {"properties": {"a": {}}},
         "unevaluatedProperties": False}
    c = canonicalize(s)
    assert validate_py(s, {"a": 1}) is validate_py(c, {"a": 1}) is True, c


def test_equal_bounds_const_respects_type():
    # integer ∧ minimum=maximum=1.5 is unsatisfiable — must NOT become
    # const 1.5 (which would accept 1.5)
    s = {"type": "integer", "minimum": 1.5, "maximum": 1.5}
    c = canonicalize(s)
    assert validate_py(s, 1.5) is validate_py(c, 1.5) is False, c
    # satisfiable equal bounds still collapse
    c2 = canonicalize({"type": "number", "minimum": 1.5, "maximum": 1.5})
    assert c2 == {"const": 1.5}
    c3 = canonicalize({"type": "integer", "minimum": 3, "maximum": 3})
    assert c3 == {"const": 3}
