"""Driver-side reference evaluator (plans/pyeval.py) + the lint rules it
unlocks (valid_default.h / valid_examples.h / invalid_external_ref.h
analogues)."""

import pytest

from jsonschema_spark.plans.lint import lint_fix, lint_schema
from jsonschema_spark.plans.pyeval import EvalError, validate_py


CASES = [
    # (schema, instance, expected)
    ({"type": "integer"}, 3, True),
    ({"type": "integer"}, 3.0, True),   # int⊂real unification
    ({"type": "integer"}, True, False),  # bool is not a number
    ({"type": "number"}, 3, True),
    ({"type": ["string", "null"]}, None, True),
    ({"const": {"a": 1, "b": 2}}, {"b": 2, "a": 1}, True),  # deep equality, key order
    ({"const": 1}, 1.0, True),          # 1 == 1.0
    ({"const": 1}, True, False),
    ({"enum": [[1, 2], "x"]}, [1.0, 2], True),
    ({"minimum": 2, "maximum": 4}, 3, True),
    ({"exclusiveMinimum": 2}, 2, False),
    ({"multipleOf": 0.01}, 19.99, True),  # exact decimal ladder
    ({"multipleOf": 2}, 7, False),
    ({"minLength": 2, "maxLength": 3}, "ab", True),
    ({"pattern": "^a+$"}, "aaa", True),
    ({"format": "ipv4"}, "10.0.0.256", False),
    ({"format": "uuid"}, "123e4567-e89b-12d3-a456-426614174000", True),
    ({"minItems": 1, "uniqueItems": True}, [1, 1.0], False),  # 1 == 1.0 dup
    ({"prefixItems": [{"type": "integer"}], "items": {"type": "string"}},
     [1, "a", "b"], True),
    ({"prefixItems": [{"type": "integer"}], "items": {"type": "string"}},
     [1, "a", 2], False),
    ({"contains": {"const": 5}, "minContains": 2}, [5, 1, 5], True),
    ({"contains": {"const": 5}, "maxContains": 1}, [5, 5], False),
    ({"required": ["a"], "properties": {"a": {"type": "integer"}}}, {"a": 1}, True),
    ({"required": ["a"]}, {}, False),
    ({"dependentRequired": {"a": ["b"]}}, {"a": 1}, False),
    ({"dependentSchemas": {"a": {"required": ["b"]}}}, {"a": 1, "b": 2}, True),
    ({"patternProperties": {"^s_": {"type": "string"}}}, {"s_x": 1}, False),
    ({"additionalProperties": False, "properties": {"a": True}}, {"a": 1, "b": 2}, False),
    ({"propertyNames": {"maxLength": 2}}, {"abc": 1}, False),
    ({"allOf": [{"minimum": 2}, {"maximum": 4}]}, 3, True),
    ({"anyOf": [{"type": "string"}, {"minimum": 10}]}, 12, True),
    ({"oneOf": [{"type": "integer"}, {"minimum": 10}]}, 12, False),  # both match
    ({"not": {"type": "string"}}, "x", False),
    ({"if": {"minimum": 5}, "then": {"multipleOf": 5}}, 10, True),
    ({"if": {"minimum": 5}, "then": {"multipleOf": 5}}, 7, False),
    ({"if": {"minimum": 5}, "else": {"multipleOf": 2}}, 4, True),
    ({"$defs": {"pos": {"minimum": 0}}, "$ref": "#/$defs/pos"}, -1, False),
    ({"$defs": {"pos": {"$anchor": "p", "minimum": 0}}, "$ref": "#p"}, 1, True),
]


@pytest.mark.parametrize("schema,instance,expected", CASES)
def test_validate_py_matrix(schema, instance, expected):
    assert validate_py(schema, instance) is expected


def test_unevaluated_properties_disjunctive():
    schema = {
        "anyOf": [{"properties": {"a": {"type": "integer"}}, "required": ["a"]},
                  {"properties": {"b": {"type": "integer"}}, "required": ["b"]}],
        "unevaluatedProperties": False,
    }
    assert validate_py(schema, {"a": 1}) is True
    assert validate_py(schema, {"a": 1, "z": 2}) is False
    # both branches pass → both key sets evaluated
    assert validate_py(schema, {"a": 1, "b": 2}) is True


def test_unevaluated_items_after_prefix():
    schema = {"prefixItems": [{"type": "integer"}], "unevaluatedItems": False}
    assert validate_py(schema, [1]) is True
    assert validate_py(schema, [1, 2]) is False


def test_recursive_ref_bounded():
    schema = {
        "$defs": {"node": {
            "type": "object",
            "properties": {"v": {"type": "integer"},
                           "kids": {"type": "array",
                                    "items": {"$ref": "#/$defs/node"}}},
            "required": ["v"],
        }},
        "$ref": "#/$defs/node",
    }
    good = {"v": 1, "kids": [{"v": 2, "kids": [{"v": 3}]}]}
    bad = {"v": 1, "kids": [{"kids": []}]}
    assert validate_py(schema, good) is True
    assert validate_py(schema, bad) is False


def test_external_resolver():
    registry = {"https://example.com/pos.json": {"minimum": 0}}
    schema = {"$ref": "https://example.com/pos.json"}
    assert validate_py(schema, 5, resolver=registry) is True
    assert validate_py(schema, -5, resolver=registry) is False
    with pytest.raises(EvalError):
        validate_py({"$ref": "https://example.com/missing.json"}, 5)


# --- lint rules unlocked by the evaluator -----------------------------------

def test_lint_valid_default():
    schema = {"type": "object",
              "properties": {"port": {"type": "integer", "minimum": 1,
                                      "default": "not-a-port"}}}
    rules = {f["rule"] for f in lint_schema(schema)}
    assert "valid_default" in rules
    schema["properties"]["port"]["default"] = 8080
    assert "valid_default" not in {f["rule"] for f in lint_schema(schema)}


def test_lint_valid_default_through_ref():
    schema = {"$defs": {"pos": {"type": "integer", "minimum": 0}},
              "properties": {"n": {"$ref": "#/$defs/pos", "default": -3}}}
    assert "valid_default" in {f["rule"] for f in lint_schema(schema)}


def test_lint_valid_examples():
    schema = {"type": "string", "examples": ["ok", 42]}
    findings = [f for f in lint_schema(schema) if f["rule"] == "valid_examples"]
    assert len(findings) == 1 and "examples[1]" in findings[0]["message"]


def test_lint_invalid_external_ref():
    schema = {"properties": {"x": {"$ref": "https://example.com/nope.json"}}}
    assert "invalid_external_ref" in {f["rule"] for f in lint_schema(schema)}
    ok = lint_schema(schema, resolver={"https://example.com/nope.json": {"type": "integer"}})
    assert "invalid_external_ref" not in {f["rule"] for f in ok}


def test_lint_description_trailing_period_and_fix():
    schema = {"type": "string", "description": "A name."}
    assert "description_trailing_period" in {f["rule"] for f in lint_schema(schema)}
    assert lint_fix(schema)["description"] == "A name"


def test_lint_property_names_type_default_and_fix():
    schema = {"propertyNames": {"type": "string", "maxLength": 5}}
    assert "property_names_type_default" in {f["rule"] for f in lint_schema(schema)}
    assert lint_fix(schema)["propertyNames"] == {"maxLength": 5}


def test_lint_simple_properties_identifiers():
    schema = {"properties": {"valid_name": True, "kebab-case": True}}
    hits = [f for f in lint_schema(schema) if f["rule"] == "simple_properties_identifiers"]
    assert len(hits) == 1 and "kebab-case" in hits[0]["message"]


def test_lint_draft3_defaults():
    rules = {f["rule"] for f in lint_schema({"type": "integer", "divisibleBy": 1,
                                             "disallow": [],
                                             "extends": {"$ref": "#/$defs/x"},
                                             "$defs": {"x": {}}})}
    assert {"divisible_by_default", "disallow_default",
            "unnecessary_extends_wrapper"} <= rules


def test_lint_dialect_gating():
    d7 = {"$schema": "http://json-schema.org/draft-07/schema#",
          "definitions": {"x": {}},
          "items": [{"type": "integer"}],
          "allOf": [{"$ref": "#/definitions/x"}]}
    rules7 = {f["rule"] for f in lint_schema(d7)}
    # draft-07: definitions IS the keyword, tuple items is legal, and
    # hoisting a lone allOf-$ref would CHANGE semantics ($ref ignores siblings)
    assert "definitions_to_defs" not in rules7
    assert "tuple_items_legacy" not in rules7
    assert "unnecessary_allof_ref_wrapper_modern" not in rules7
    modern = dict(d7)
    modern["$schema"] = "https://json-schema.org/draft/2020-12/schema"
    rules12 = {f["rule"] for f in lint_schema(modern)}
    assert {"definitions_to_defs", "tuple_items_legacy",
            "unnecessary_allof_ref_wrapper_modern"} <= rules12
    # explicit dialect overrides the declared one
    assert "definitions_to_defs" in {
        f["rule"] for f in lint_schema(d7, dialect="2019-09")}


def test_pyeval_cross_resource_dynamic_scope():
    """The evaluator must agree with the compiler on cross-resource
    $dynamicRef/$recursiveRef (outermost-resource-wins semantics)."""
    LIST = {"$id": "https://example.com/list.json",
            "$defs": {"default-elem": {"$dynamicAnchor": "elem"}},
            "type": "array", "items": {"$dynamicRef": "#elem"}}
    INTLIST = {"$id": "https://example.com/intlist.json",
               "$defs": {"int-elem": {"$dynamicAnchor": "elem",
                                      "type": "integer", "maximum": 90}},
               "$ref": "https://example.com/list.json"}
    reg = {"https://example.com/list.json": LIST}
    assert validate_py(INTLIST, [95], resolver=reg) is False
    assert validate_py(INTLIST, ["x"], resolver=reg) is False
    assert validate_py(INTLIST, [1, 2], resolver=reg) is True
    assert validate_py(LIST, ["x"]) is True  # base alone: anything goes

    BASE = {"$id": "https://example.com/base.json", "$recursiveAnchor": True,
            "type": "object",
            "properties": {"v": {"type": "integer"},
                           "next": {"$recursiveRef": "#"}}}
    EXT = {"$id": "https://example.com/ext.json", "$recursiveAnchor": True,
           "required": ["tag"], "$ref": "https://example.com/base.json"}
    reg2 = {"https://example.com/base.json": BASE}
    assert validate_py(EXT, {"tag": "t", "v": 1, "next": {"v": 2}},
                       resolver=reg2) is False  # inner lacks tag
    assert validate_py(EXT, {"tag": "t", "next": {"tag": "u"}},
                       resolver=reg2) is True
    assert validate_py(BASE, {"v": 1, "next": {"v": 2}}) is True
