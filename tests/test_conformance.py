"""Conformance corpus — official-JSON-Schema-Test-Suite-style cases.

The reference pins the official suite through blaze (SURVEY.md §5.3);
this is a compact re-derivation of its semantics-critical cases (written
from the 2020-12 spec, not copied), run through the tree path. Each case:
(schema, [(instance_json, expected_valid), ...]).
"""

import json

import pytest

from jsonschema_spark import validate

CASES = [
    # --- type ---------------------------------------------------------------
    ("integer accepts int and integral real, rejects fraction/string/bool-ish",
     {"type": "integer"},
     [("1", True), ("1.0", True), ("1.5", False), ('"1"', False), ("true", False), ("null", False)]),
    ("number accepts ints", {"type": "number"}, [("1", True), ("1.5", True), ('"x"', False)]),
    ("type union", {"type": ["string", "null"]},
     [('"a"', True), ("null", True), ("5", False), ("[]", False)]),
    ("object/array tags", {"type": "object"},
     [("{}", True), ("[]", False), ('"{}"', False)]),
    # --- const / enum -------------------------------------------------------
    ("const null", {"const": None}, [("null", True), ("0", False), ('""', False)]),
    ("const false vs 0", {"const": False}, [("false", True), ("0", False)]),
    ("const 1 vs 1.0 vs true", {"const": 1}, [("1", True), ("1.0", True), ("true", False)]),
    ("enum heterogeneous", {"enum": [1, "1", [1], {"a": 1}, None]},
     [("1", True), ('"1"', True), ("[1]", True), ('{"a": 1}', True), ("null", True),
      ("2", False), ("[2]", False), ('{"a": 2}', False)]),
    # --- numeric ------------------------------------------------------------
    ("bounds inclusive", {"minimum": 1, "maximum": 3},
     [("1", True), ("3", True), ("0.999", False), ("3.001", False), ('"x"', True)]),
    ("exclusive bounds", {"exclusiveMinimum": 1, "exclusiveMaximum": 3},
     [("1", False), ("3", False), ("2", True)]),
    ("multipleOf int", {"multipleOf": 2}, [("4", True), ("5", False), ("4.0", True)]),
    ("multipleOf fraction", {"multipleOf": 0.5},
     [("1.5", True), ("1.25", False), ("3", True)]),
    # --- string -------------------------------------------------------------
    ("length is code points", {"minLength": 2, "maxLength": 3},
     [('"ab"', True), ('"abc"', True), ('"a"', False), ('"abcd"', False),
      ('"\\u00e9\\u00e9"', True)]),  # two é code points, 4 UTF-8 bytes
    ("pattern is unanchored search", {"pattern": "b+"},
     [('"abc"', True), ('"aaa"', False)]),
    # --- object -------------------------------------------------------------
    ("required", {"required": ["a", "b"]},
     [('{"a":1,"b":2}', True), ('{"a":1}', False), ("{}", False), ("[]", True), ("5", True)]),
    ("null property satisfies required", {"required": ["a"]},
     [('{"a": null}', True), ("{}", False)]),
    ("properties ignores absent", {"properties": {"a": {"type": "integer"}}},
     [("{}", True), ('{"a": 1}', True), ('{"a": "x"}', False)]),
    ("min/maxProperties", {"minProperties": 1, "maxProperties": 2},
     [("{}", False), ('{"a":1}', True), ('{"a":1,"b":2,"c":3}', False)]),
    ("dependentRequired", {"dependentRequired": {"a": ["b"]}},
     [("{}", True), ('{"b":1}', True), ('{"a":1,"b":1}', True), ('{"a":1}', False)]),
    ("dependentSchemas", {"dependentSchemas": {"a": {"minProperties": 2}}},
     [("{}", True), ('{"a":1,"b":2}', True), ('{"a":1}', False)]),
    ("propertyNames", {"propertyNames": {"maxLength": 2}},
     [("{}", True), ('{"ab":1}', True), ('{"abc":1}', False)]),
    ("patternProperties + additionalProperties",
     {"properties": {"a": {"type": "integer"}},
      "patternProperties": {"^x": {"type": "string"}},
      "additionalProperties": False},
     [('{"a":1}', True), ('{"x1":"s"}', True), ('{"a":1,"x2":"t"}', True),
      ('{"b":1}', False), ('{"x1":1}', False)]),
    ("additionalProperties schema",
     {"properties": {"a": {}}, "additionalProperties": {"type": "integer"}},
     [('{"a":"anything","z":3}', True), ('{"z":"s"}', False)]),
    # --- array --------------------------------------------------------------
    ("items all elements", {"items": {"type": "integer"}},
     [("[]", True), ("[1,2]", True), ('[1,"x"]', False), ('"notarray"', True)]),
    ("prefixItems then items",
     {"prefixItems": [{"type": "string"}], "items": {"type": "integer"}},
     [('["a",1,2]', True), ('["a","b"]', False), ("[1]", False), ("[]", True)]),
    ("prefixItems longer than instance", {"prefixItems": [{"type": "string"}, {"type": "integer"}]},
     [('["a"]', True), ("[]", True), ('["a",1]', True), ('["a","b"]', False)]),
    ("min/maxItems", {"minItems": 1, "maxItems": 2},
     [("[1]", True), ("[]", False), ("[1,2,3]", False)]),
    ("uniqueItems scalars", {"uniqueItems": True},
     [("[1,2]", True), ("[1,1]", False), ('["a","b"]', True), ("[]", True),
      ('[0, false]', True), ('[1, true]', True)]),  # number/bool distinct
    ("contains default min 1", {"contains": {"type": "string"}},
     [('[1,"a"]', True), ("[1,2]", False), ("[]", False)]),
    ("minContains 0 with contains", {"contains": {"type": "string"}, "minContains": 0},
     [("[]", True), ("[1]", True)]),
    ("maxContains", {"contains": {"type": "integer"}, "maxContains": 2},
     [("[1,2]", True), ("[1,2,3]", False)]),
    # --- combinators ----------------------------------------------------------
    ("allOf", {"allOf": [{"minimum": 1}, {"maximum": 3}]},
     [("2", True), ("0", False), ("4", False)]),
    ("anyOf", {"anyOf": [{"type": "string"}, {"minimum": 5}]},
     [('"s"', True), ("7", True), ("1", False)]),
    ("oneOf exactly one", {"oneOf": [{"minimum": 1}, {"maximum": 3}]},
     [("0", True), ("5", True), ("2", False)]),
    ("not", {"not": {"type": "integer"}}, [('"a"', True), ("1", False), ("1.5", True)]),
    ("if-then no else", {"if": {"type": "integer"}, "then": {"minimum": 0}},
     [("5", True), ("-5", False), ('"s"', True)]),
    ("if-else no then", {"if": {"type": "integer"}, "else": {"type": "string"}},
     [("5", True), ('"s"', True), ("1.5", False)]),
    ("boolean schema true/false branches", {"anyOf": [False, {"type": "integer"}]},
     [("1", True), ('"x"', False)]),
    ("false schema rejects everything", False, [("1", False), ("null", False), ("{}", False)]),
    ("empty schema accepts everything", {}, [("1", True), ("null", True), ('"x"', True)]),
    # --- $ref / $defs ---------------------------------------------------------
    ("$ref to $defs", {"$defs": {"pos": {"minimum": 0}}, "$ref": "#/$defs/pos"},
     [("1", True), ("-1", False)]),
    ("$ref with sibling keywords (2020-12)",
     {"$defs": {"pos": {"minimum": 0}}, "$ref": "#/$defs/pos", "maximum": 10},
     [("5", True), ("-1", False), ("11", False)]),
    # --- unevaluated ----------------------------------------------------------
    ("unevaluatedProperties sees allOf",
     {"allOf": [{"properties": {"a": {}}}], "unevaluatedProperties": False},
     [('{"a":1}', True), ('{"b":1}', False)]),
    ("unevaluatedItems sees prefixItems",
     {"prefixItems": [{}], "unevaluatedItems": False},
     [("[1]", True), ("[1,2]", False), ("[]", True)]),
    # --- disjunctive unevaluated* (runtime marks) ---------------------------
    ("unevaluatedProperties across anyOf branches",
     {"anyOf": [{"required": ["a"], "properties": {"a": {}}},
                {"required": ["b"], "properties": {"b": {}}}],
      "unevaluatedProperties": False},
     [('{"a":1}', True), ('{"b":1}', True), ('{"a":1,"b":1}', True),
      ('{"a":1,"z":1}', False), ("{}", False)]),
    ("unevaluatedProperties: failed branch contributes nothing",
     {"anyOf": [{"required": ["a"], "properties": {"a": {}, "x": {}}},
                {"required": ["b"], "properties": {"b": {}}}],
      "unevaluatedProperties": False},
     [('{"b":1,"x":1}', False), ('{"a":1,"x":1}', True)]),
    ("unevaluatedItems sees contains hits",
     {"contains": {"type": "string"}, "unevaluatedItems": {"type": "integer"}},
     [('["a", 1]', True), ('["a", 1.5]', False), ('["a"]', True)]),
    ("unevaluatedProperties via if/then",
     {"if": {"required": ["mode"]},
      "then": {"properties": {"mode": {}, "opt": {}}},
      "unevaluatedProperties": False},
     [('{"mode":1,"opt":2}', True), ('{"mode":1,"zzz":2}', False), ("{}", True)]),
    # --- dynamic references -------------------------------------------------
    ("$dynamicRef single-document tree",
     {"$dynamicAnchor": "n", "type": "object",
      "properties": {"v": {"type": "integer"},
                     "kids": {"type": "array", "items": {"$dynamicRef": "#n"}}}},
     [('{"v":1}', True), ('{"v":1,"kids":[{"v":2}]}', True),
      ('{"v":1,"kids":[{"v":"x"}]}', False)]),
    ("$recursiveRef plain root recursion",
     {"type": "object",
      "properties": {"v": {"type": "integer"}, "next": {"$recursiveRef": "#"}}},
     [('{"v":1,"next":{"v":2}}', True), ('{"v":1,"next":{"v":"x"}}', False)]),
    # --- embedded resources -------------------------------------------------
    ("embedded $id opens its own anchor scope",
     {"$id": "https://example.com/root.json",
      "$defs": {"sub": {"$id": "https://example.com/sub.json",
                        "$defs": {"p": {"$anchor": "pos", "minimum": 0}},
                        "$ref": "#pos"}},
      "$ref": "#/$defs/sub"},
     [("1", True), ("-1", False)]),
    # --- subtle interactions --------------------------------------------------
    ("contains counts satisfy minContains AND maxContains together",
     {"contains": {"type": "integer"}, "minContains": 2, "maxContains": 3},
     [("[1,2]", True), ('[1,2,3,"x"]', True), ("[1]", False), ("[1,2,3,4]", False)]),
    ("propertyNames composes with patternProperties",
     {"propertyNames": {"pattern": "^[a-z]+$"},
      "patternProperties": {"^a": {"type": "integer"}}},
     [('{"ab":1}', True), ('{"ab":"x"}', False), ('{"AB":1}', False), ('{"zz":"ok"}', True)]),
    ("exclusive bounds with float instance values",
     {"exclusiveMinimum": 0.5, "exclusiveMaximum": 1.5},
     [("0.5", False), ("1.0", True), ("1.5", False), ("0.500001", True)]),
    ("required through dependentSchemas trigger chain",
     {"dependentSchemas": {"a": {"dependentRequired": {"b": ["c"]}}}},
     [('{"a":1}', True), ('{"a":1,"b":2,"c":3}', True), ('{"a":1,"b":2}', False),
      ('{"b":2}', True)]),
    ("not over combinator",
     {"not": {"anyOf": [{"type": "string"}, {"minimum": 10}]}},
     # null: minimum is vacuous for non-numbers → inner anyOf passes → not fails
     [("5", True), ("15", False), ('"s"', False), ("null", False)]),
    ("nested unevaluatedItems sees allOf prefixItems",
     {"allOf": [{"prefixItems": [{"type": "integer"}]}],
      "unevaluatedItems": {"type": "string"}},
     [('[1,"a"]', True), ("[1,2]", False), ("[1]", True)]),
    ("uniqueItems with mixed-type scalars",
     {"uniqueItems": True},
     [('[1,"1"]', True), ("[null,false,0]", True), ('[{"a":1},{"a":1.0}]', False)]),
    ("pattern on property names via propertyNames pattern",
     {"propertyNames": {"pattern": "^x-"}},
     [('{"x-a":1,"x-b":2}', True), ('{"x-a":1,"y":2}', False), ("{}", True)]),
    ("anchor ref inside allOf branch",
     {"$defs": {"pos": {"$anchor": "p", "exclusiveMinimum": 0}},
      "allOf": [{"$ref": "#p"}, {"multipleOf": 2}]},
     [("4", True), ("-4", False), ("3", False)]),
    ("if/then/else cascade with object conditions",
     {"if": {"required": ["mode"]},
      "then": {"required": ["value"]},
      "else": {"maxProperties": 1}},
     [('{"mode":1,"value":2}', True), ('{"mode":1}', False),
      ('{"other":1}', True), ('{"a":1,"b":2}', False)]),
]


@pytest.mark.parametrize("desc,schema,checks", CASES, ids=[c[0] for c in CASES])
def test_conformance(spark, desc, schema, checks):
    docs = spark.createDataFrame(
        [(i, payload) for i, (payload, _) in enumerate(checks)], "i long, doc string"
    )
    got = {r["i"]: r["valid"] for r in validate(docs, schema, doc_col="doc").collect()}
    expected = {i: want for i, (_, want) in enumerate(checks)}
    mismatches = {
        checks[i][0]: (got[i], want) for i, want in expected.items() if got[i] != want
    }
    assert not mismatches, f"{desc}: instance -> (got, want): {mismatches}"


ADVERSARIAL = [
    ("int64 const beyond 2^53 is exact",
     {"const": 9007199254740993},
     [("9007199254740993", True), ("9007199254740992", False), ("9007199254740993.0", False)]),
    ("enum with big ints", {"enum": [9007199254740993, 1]},
     [("9007199254740993", True), ("9007199254740992", False), ("1", True), ("1.0", True)]),
    ("uniqueItems nested arrays", {"uniqueItems": True},
     [("[[1],[2]]", True), ("[[1],[1]]", False), ('[[1],[1.0]]', False), ('[{"a":[1]},{"a":[1]}]', False)]),
    ("enum 1.0 matches 1", {"enum": [1]}, [("1.0", True), ("1.5", False)]),
    ("pattern with regex metachars", {"pattern": "^a\\.b$"},
     [('"a.b"', True), ('"axb"', False)]),
    ("escaped property names in pointers",
     {"properties": {"a/b": {"type": "integer"}, "c~d": {"type": "integer"}},
      "required": ["a/b"]},
     [('{"a/b": 1, "c~d": 2}', True), ('{"a/b": "x"}', False), ('{"c~d": 1}', False)]),
    ("contains exactly zero", {"contains": {"type": "string"}, "minContains": 0, "maxContains": 0},
     [("[1,2]", True), ('["a"]', False), ("[]", True)]),
    ("deeply nested properties",
     {"properties": {"a": {"properties": {"b": {"properties": {"c": {"const": 1}}}}}}},
     [('{"a":{"b":{"c":1}}}', True), ('{"a":{"b":{"c":2}}}', False), ('{"a":{}}', True)]),
    ("allOf of objects merges constraints",
     {"allOf": [{"required": ["a"]}, {"properties": {"a": {"minimum": 5}}}]},
     [('{"a": 7}', True), ('{"a": 3}', False), ("{}", False)]),
    ("oneOf with subschema objects",
     {"oneOf": [{"required": ["a"]}, {"required": ["b"]}]},
     [('{"a":1}', True), ('{"b":1}', True), ('{"a":1,"b":1}', False), ("{}", False)]),
    ("nested arrays items of items",
     {"items": {"items": {"type": "integer"}}},
     [("[[1],[2,3]]", True), ('[[1],["x"]]', False), ("[]", True)]),
]


@pytest.mark.parametrize("desc,schema,checks", ADVERSARIAL, ids=[c[0] for c in ADVERSARIAL])
def test_conformance_adversarial(spark, desc, schema, checks):
    docs = spark.createDataFrame(
        [(i, payload) for i, (payload, _) in enumerate(checks)], "i long, doc string"
    )
    got = {r["i"]: r["valid"] for r in validate(docs, schema, doc_col="doc").collect()}
    mismatches = {
        checks[i][0]: (got[i], want)
        for i, (_, want) in enumerate(checks)
        if got[i] != want
    }
    assert not mismatches, f"{desc}: instance -> (got, want): {mismatches}"


@pytest.mark.parametrize("desc,schema,checks", CASES + ADVERSARIAL,
                         ids=[c[0] + " (pyeval)" for c in CASES + ADVERSARIAL])
def test_conformance_python_evaluator(desc, schema, checks):
    """The SAME corpus through the driver-side evaluator — engine and
    evaluator must agree with the spec independently."""
    from jsonschema_spark.plans.pyeval import validate_py

    mismatches = {
        payload: (validate_py(schema, json.loads(payload)), want)
        for payload, want in checks
        if validate_py(schema, json.loads(payload)) != want
    }
    assert not mismatches, f"{desc}: instance -> (got, want): {mismatches}"
