"""TypeScript codegen golden tests — expected outputs copied verbatim from
the reference's golden scripts (/root/reference/test/codegen/
pass_typescript.sh, pass_typescript_name.sh, pass_typescript_ref.sh,
pass_typescript_ref_id.sh, fail_unsupported_keyword.sh,
fail_unsupported_keyword_value.sh)."""

import pytest

from jsonschema_spark.plans.codegen_ts import CodegenUnsupportedError, typescript


def test_pass_typescript():
    schema = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
        },
        "required": ["name"],
    }
    expected = """export type SchemaName = string;

export type SchemaAge = number;

export interface Schema {
  "name": SchemaName;
  "age"?: SchemaAge;
  [key: string]: unknown | undefined;
}
"""
    assert typescript(schema) == expected


def test_pass_typescript_name():
    schema = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "age": {"type": "integer"},
        },
        "required": ["name"],
    }
    expected = """export type PersonName = string;

export type PersonAge = number;

export interface Person {
  "name": PersonName;
  "age"?: PersonAge;
  [key: string]: unknown | undefined;
}
"""
    assert typescript(schema, name="Person") == expected


ADDRESS = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "type": "object",
    "properties": {
        "street": {"type": "string"},
        "city": {"type": "string"},
    },
    "required": ["street", "city"],
}

REF_EXPECTED = """export type {p}Name = string;

export type {p}Address = _{p}Address;

export type {p}AddressStreet = string;

export type {p}AddressCity = string;

export interface _{p}Address {{
  "street": {p}AddressStreet;
  "city": {p}AddressCity;
  [key: string]: unknown | undefined;
}}

export interface {p} {{
  "name": {p}Name;
  "address"?: {p}Address;
  [key: string]: unknown | undefined;
}}
"""


def test_pass_typescript_ref():
    schema = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "address": {"$ref": "./schemas/address.json"},
        },
        "required": ["name"],
    }
    out = typescript(schema, name="Person",
                     resolver={"./schemas/address.json": ADDRESS})
    assert out == REF_EXPECTED.format(p="Person")


def test_pass_typescript_ref_id():
    schema = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "$id": "https://example.com/person",
        "type": "object",
        "properties": {
            "name": {"type": "string"},
            "address": {"$ref": "https://example.com/address"},
        },
        "required": ["name"],
    }
    address = dict(ADDRESS, **{"$id": "https://example.com/address"})
    out = typescript(schema, resolver={"https://example.com/address": address})
    assert out == REF_EXPECTED.format(p="Schema")


def test_fail_unsupported_keyword():
    schema = {
        "$schema": "https://json-schema.org/draft/2020-12/schema",
        "type": "object",
        "properties": {"foo": {"not": {"type": "string"}}},
    }
    with pytest.raises(CodegenUnsupportedError) as ei:
        typescript(schema)
    assert ei.value.message == "Unsupported keyword in subschema"
    assert ei.value.keyword == "not"
    assert ei.value.location == "/properties/foo"


def test_fail_unsupported_keyword_value():
    with pytest.raises(CodegenUnsupportedError) as ei:
        typescript({"$schema": "https://json-schema.org/draft/2020-12/schema",
                    "type": 1})
    assert ei.value.message == "Expected a string value"
    assert ei.value.keyword == "type"
    assert ei.value.location == ""


def test_enum_const_array_record_shapes():
    """Beyond the goldens: enum unions, const, arrays, tuples, Record
    collapses and the typed-additional union index signature."""
    assert typescript({"enum": ["a", 1, True]}) == \
        'export type Schema = "a" | 1 | true;\n'
    assert typescript({"const": "x"}) == 'export type Schema = "x";\n'
    assert typescript({"type": "array", "items": {"type": "integer"}}) == (
        "export type Schema = SchemaItems[];\n\n"
        "export type SchemaItems = number;\n")
    assert typescript({"type": "array"}) == "export type Schema = unknown[];\n"
    assert typescript({"type": "object",
                       "additionalProperties": {"type": "string"}}) == (
        "export type SchemaAdditionalProperties = string;\n\n"
        "export type Schema = Record<string, SchemaAdditionalProperties>;\n")
    assert typescript({"type": "object"}) == \
        "export type Schema = Record<string, unknown>;\n"
    out = typescript({
        "type": "object",
        "properties": {"id": {"type": "integer"}},
        "additionalProperties": {"type": "string"},
    })
    assert "[key: string]:" in out and "SchemaId |" in out and \
        "SchemaAdditionalProperties |" in out and "undefined;" in out
    # closed object: no index signature at all
    closed = typescript({"type": "object",
                         "properties": {"id": {"type": "integer"}},
                         "additionalProperties": False})
    assert "[key" not in closed


def test_readonly_and_quoting_and_mangle():
    out = typescript({
        "type": "object",
        "properties": {
            "created-at": {"type": "string", "readOnly": True},
            "9lives": {"type": "integer"},
            'we"ird': {"type": "boolean"},
        },
    })
    assert '  readonly "created-at"?: SchemaCreatedAt;' in out
    assert '  "9lives"?: Schema_9lives;' in out
    assert '  "we\\"ird"?: SchemaWeIrd;' in out


def test_pattern_prefix_index_signature():
    out = typescript({
        "type": "object",
        "properties": {"id": {"type": "integer"}},
        "patternProperties": {"^x-": {"type": "string"}},
        "additionalProperties": False,
    })
    assert "[key: `x-${string}`]: SchemaX" in out
