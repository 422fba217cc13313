"""rdf command analogue (operators/rdf.py): x-jsonld-* annotations →
JSON-LD expanded form, gated on validity."""

import json

from pyspark.sql import functions as F

from jsonschema_spark.operators.rdf import rdf_df, to_jsonld

SCHEMA = {
    "type": "object",
    "x-jsonld-type": "https://schema.org/Person",
    "required": ["name"],
    "properties": {
        "name": {
            "type": "string",
            "x-jsonld-id": "https://schema.org/name",
            "x-jsonld-language": "en",
        },
        "born": {
            "type": "string",
            "x-jsonld-id": "https://schema.org/birthDate",
            "x-jsonld-datatype": "http://www.w3.org/2001/XMLSchema#date",
        },
        "age": {"type": "integer", "x-jsonld-id": "https://schema.org/age"},
        "internal_note": {"type": "string"},  # no mapping → dropped
        "knows": {
            "type": "array",
            "x-jsonld-id": "https://schema.org/knows",
            "items": {
                "type": "object",
                "x-jsonld-type": "https://schema.org/Person",
                "properties": {
                    "name": {"type": "string", "x-jsonld-id": "https://schema.org/name"},
                },
            },
        },
        "blob": {"x-jsonld-id": "https://example.com/blob", "x-jsonld-json": True},
    },
}


def test_expanded_form_driver_side():
    inst = {"name": "Ada", "born": "1815-12-10", "age": 36,
            "internal_note": "secret", "knows": [{"name": "Charles"}],
            "blob": {"any": ["shape", 1]}}
    node = to_jsonld(SCHEMA, inst)
    assert node["@type"] == ["https://schema.org/Person"]
    assert node["https://schema.org/name"] == [{"@value": "Ada", "@language": "en"}]
    assert node["https://schema.org/birthDate"] == [
        {"@value": "1815-12-10", "@type": "http://www.w3.org/2001/XMLSchema#date"}]
    assert node["https://schema.org/age"] == [{"@value": 36}]
    assert "internal_note" not in json.dumps(node)
    assert node["https://schema.org/knows"] == [
        {"@type": ["https://schema.org/Person"],
         "https://schema.org/name": [{"@value": "Charles"}]}]
    assert node["https://example.com/blob"] == [
        {"@value": {"any": ["shape", 1]}, "@type": "@json"}]


def test_rdf_df_gates_on_validity(spark):
    df = spark.createDataFrame(
        [(1, '{"name": "Ada", "age": 36}'),
         (2, '{"age": 99}')],  # missing required name → invalid → NULL
        "id long, doc string",
    )
    rows = {r["id"]: (r["valid"], r["jsonld"])
            for r in rdf_df(df, SCHEMA, "doc").collect()}
    assert rows[2] == (False, None)
    valid, jsonld = rows[1]
    assert valid is True
    node = json.loads(jsonld)
    assert node["https://schema.org/age"] == [{"@value": 36}]
