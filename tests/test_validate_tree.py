"""Nested/JSON-tree path: documents in a string column, parsed to VARIANT.

Exercises the loop operators (items, prefixItems, contains, uniqueItems,
patternProperties, propertyNames, additionalProperties) the reference
implements in evaluator_dispatch.h Groups C/E.
"""

from jsonschema_spark import annotate, validate, violations


def docs(spark, *payloads):
    return spark.createDataFrame([(i, p) for i, p in enumerate(payloads)], "i long, doc string")


def verdicts(spark, schema, *payloads):
    out = validate(docs(spark, *payloads), schema, doc_col="doc").orderBy("i").collect()
    return [r.valid for r in out]


def test_tree_type_and_required(spark):
    schema = {"type": "object", "required": ["a"], "properties": {"a": {"type": "integer"}}}
    assert verdicts(
        spark, schema, '{"a": 1}', '{"a": 1.0}', '{"a": 1.5}', '{"a": "x"}', "{}", "[1]", "3"
    ) == [True, True, False, False, False, False, False]


def test_tree_null_vs_missing(spark):
    # JSON null satisfies presence (required) but fails type checks
    schema = {"required": ["a"], "properties": {"a": {"type": "null"}}}
    assert verdicts(spark, schema, '{"a": null}', "{}", '{"a": 1}') == [True, False, False]


def test_tree_string_constraints(spark):
    schema = {"properties": {"s": {"minLength": 2, "maxLength": 4, "pattern": "^a"}}}
    assert verdicts(
        spark, schema, '{"s": "ab"}', '{"s": "a"}', '{"s": "abcde"}', '{"s": "bb"}', '{"s": 5}'
    ) == [True, False, False, False, True]


def test_tree_items(spark):
    schema = {"properties": {"xs": {"type": "array", "items": {"type": "integer", "minimum": 0}}}}
    assert verdicts(
        spark, schema, '{"xs": [1,2,3]}', '{"xs": []}', '{"xs": [1,-2]}', '{"xs": [1,"a"]}'
    ) == [True, True, False, False]


def test_tree_prefix_items(spark):
    schema = {
        "properties": {
            "t": {
                "prefixItems": [{"type": "string"}, {"type": "integer"}],
                "items": {"type": "boolean"},
            }
        }
    }
    assert verdicts(
        spark,
        schema,
        '{"t": ["a", 1, true, false]}',
        '{"t": ["a"]}',
        '{"t": [1, 1]}',
        '{"t": ["a", 1, "no"]}',
    ) == [True, True, False, False]


def test_tree_contains_min_max(spark):
    schema = {
        "properties": {
            "xs": {"contains": {"type": "integer"}, "minContains": 2, "maxContains": 3}
        }
    }
    assert verdicts(
        spark,
        schema,
        '{"xs": [1, 2, "a"]}',
        '{"xs": [1, "a"]}',
        '{"xs": [1,2,3,4]}',
    ) == [True, False, False]


def test_tree_unique_items(spark):
    schema = {"properties": {"xs": {"uniqueItems": True}}}
    assert verdicts(
        spark,
        schema,
        '{"xs": [1, 2, 3]}',
        '{"xs": [1, 2, 1]}',
        '{"xs": [{"a":1}, {"a":1}]}',
        '{"xs": [{"a":1}, {"a":2}]}',
    ) == [True, False, False, True]


def test_tree_min_max_items_and_props(spark):
    schema = {
        "properties": {"xs": {"minItems": 1, "maxItems": 2}},
        "minProperties": 1,
        "maxProperties": 2,
    }
    assert verdicts(
        spark, schema, '{"xs": [1]}', '{"xs": []}', '{"xs": [1,2,3]}', "{}", '{"a":1,"b":2,"c":3}'
    ) == [True, False, False, False, False]


def test_tree_pattern_properties(spark):
    schema = {"patternProperties": {"^x_": {"type": "integer"}}}
    assert verdicts(
        spark, schema, '{"x_a": 1, "y": "s"}', '{"x_a": "bad"}', '{"y": "ok"}'
    ) == [True, False, True]


def test_tree_additional_properties(spark):
    schema = {
        "properties": {"a": {}},
        "patternProperties": {"^x_": {}},
        "additionalProperties": False,
    }
    assert verdicts(
        spark, schema, '{"a": 1, "x_b": 2}', '{"a": 1, "z": 2}', "{}"
    ) == [True, False, True]
    out = violations(
        docs(spark, '{"a": 1, "z": 2}'), schema, id_cols=["i"], doc_col="doc"
    ).collect()
    assert out[0].instanceLocation == "/z"
    assert out[0].error == 'The object value was not expected to define the property "z"'


def test_tree_additional_properties_schema(spark):
    schema = {"properties": {"a": {}}, "additionalProperties": {"type": "integer"}}
    assert verdicts(
        spark, schema, '{"a": "s", "z": 2}', '{"a": "s", "z": "bad"}'
    ) == [True, False]


def test_tree_property_names(spark):
    schema = {"propertyNames": {"pattern": "^[a-z]+$", "maxLength": 3}}
    assert verdicts(
        spark, schema, '{"ab": 1}', '{"ABCD": 1}', '{"abcd": 1}', "{}"
    ) == [True, False, False, True]


def test_tree_nested_objects(spark):
    schema = {
        "properties": {
            "meta": {
                "type": "object",
                "required": ["id"],
                "properties": {
                    "id": {"type": "integer"},
                    "tags": {"type": "array", "items": {"type": "string"}},
                },
            }
        }
    }
    assert verdicts(
        spark,
        schema,
        '{"meta": {"id": 3, "tags": ["a"]}}',
        '{"meta": {"tags": ["a"]}}',
        '{"meta": {"id": 3, "tags": [1]}}',
        "{}",
    ) == [True, False, False, True]


def test_tree_instance_location_in_arrays(spark):
    schema = {"properties": {"xs": {"items": {"type": "integer"}}}}
    out = violations(
        docs(spark, '{"xs": [1, "bad", 3]}'), schema, id_cols=["i"], doc_col="doc"
    ).collect()
    locs = [(r.keywordLocation, r.instanceLocation) for r in out]
    assert ("/properties/xs/items/type", "/xs/1") in locs
    assert ("/properties/xs/items", "/xs") in locs


def test_tree_enum_const_deep(spark):
    schema = {"properties": {"v": {"enum": [1, "a", [1, 2], {"k": True}]}}}
    assert verdicts(
        spark,
        schema,
        '{"v": 1}',
        '{"v": "a"}',
        '{"v": [1,2]}',
        '{"v": {"k": true}}',
        '{"v": 2}',
        '{"v": [1,3]}',
    ) == [True, True, True, True, False, False]


def test_tree_combinators(spark):
    schema = {
        "properties": {
            "n": {
                "if": {"type": "integer"},
                "then": {"minimum": 0},
                "else": {"type": "string"},
            }
        }
    }
    assert verdicts(
        spark, schema, '{"n": 5}', '{"n": -5}', '{"n": "s"}', '{"n": 1.5}'
    ) == [True, False, True, False]


def test_tree_dependent_schemas(spark):
    schema = {"dependentSchemas": {"credit": {"required": ["billing"]}}}
    assert verdicts(
        spark, schema, '{"credit": 1, "billing": "x"}', '{"credit": 1}', "{}"
    ) == [True, False, True]


def test_tree_parse_failure(spark):
    out = annotate(docs(spark, "not json"), {"type": "object"}, doc_col="doc").collect()
    assert out[0].valid is False
    assert out[0].violations[0].error == "The instance could not be parsed as JSON"


def test_tree_number_semantics(spark):
    schema = {"properties": {"x": {"multipleOf": 0.5, "minimum": 0}}}
    assert verdicts(
        spark, schema, '{"x": 2.5}', '{"x": 2.3}', '{"x": 3}', '{"x": -1}'
    ) == [True, False, True, False]


def test_tree_deep_equality_key_order_and_numbers(spark):
    """Reference deep equality (dispatch.h:697-712): object key order is
    irrelevant and 1 == 1.0 — for const, enum, and uniqueItems."""
    schema = {"properties": {"c": {"const": {"a": 1, "b": [2, {"x": 3}]}}}}
    assert verdicts(
        spark, schema,
        '{"c": {"a": 1, "b": [2, {"x": 3}]}}',
        '{"c": {"b": [2, {"x": 3}], "a": 1}}',   # reordered keys: equal
        '{"c": {"a": 1.0, "b": [2.0, {"x": 3}]}}',  # 1.0 == 1: equal
        '{"c": {"a": 1, "b": [2, {"x": 4}]}}',
    ) == [True, True, True, False]
    enum_schema = {"properties": {"e": {"enum": [{"k": 1, "l": 2}, [10, 20]]}}}
    assert verdicts(
        spark, enum_schema,
        '{"e": {"l": 2, "k": 1}}',
        '{"e": [10.0, 20]}',
        '{"e": {"k": 1}}',
    ) == [True, True, False]


def test_tree_unique_items_deep(spark):
    schema = {"properties": {"xs": {"uniqueItems": True}}}
    assert verdicts(
        spark, schema,
        '{"xs": [1, 1.0]}',                           # 1 == 1.0 ⇒ duplicate
        '{"xs": [{"a":1,"b":2}, {"b":2,"a":1}]}',     # reordered ⇒ duplicate
        '{"xs": [1, "1"]}',                           # number vs string ⇒ unique
        '{"xs": [true, 1]}',                          # boolean vs number ⇒ unique
        '{"xs": [{"a":1}, {"a":2}]}',
    ) == [False, False, True, True, True]
