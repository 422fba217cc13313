"""Flat-column fast-path validation: keyword semantics + violation rows.

Mirrors the reference's golden-output test style
(/root/reference/test/validate/fail_2020_12.sh, fail_json.sh): exact error
wording, locations, and evaluation order.
"""

import pytest
from pyspark.sql import Row, functions as F

from jsonschema_spark import annotate, validate, violations, verdict_counts


def rows(spark, data, schema_ddl):
    return spark.createDataFrame(data, schema_ddl)


def test_type_mismatch_golden(spark):
    # the reference's flagship golden: {"foo": 1} vs properties.foo type string
    # (/root/reference/test/validate/fail_json.sh)
    df = rows(spark, [(1,)], "foo long")
    schema = {"type": "object", "properties": {"foo": {"type": "string"}}}
    out = violations(df, schema, id_cols=["foo"]).collect()
    assert len(out) == 2
    assert out[0].keywordLocation == "/properties/foo/type"
    assert out[0].instanceLocation == "/foo"
    assert out[0].error == "The value was expected to be of type string but it was of type integer"
    assert out[1].keywordLocation == "/properties"
    assert out[1].instanceLocation == ""
    assert (
        out[1].error
        == "The object value was expected to validate against the single defined property subschema"
    )


def test_required(spark):
    df = rows(spark, [("a", None), (None, None), ("b", "x")], "u string, t string")
    schema = {"type": "object", "required": ["u", "t"]}
    got = annotate(df, schema).select("valid", "violations").collect()
    assert [r.valid for r in got] == [False, False, True]
    # missing one property
    assert got[0].violations[0].error == (
        'The object value was expected to define properties "u", and "t"'
        ' but did not define the property "t"'
    )
    # missing both (missing list sorted, per the reference's std::set)
    assert got[1].violations[0].error == (
        'The object value was expected to define properties "u", and "t"'
        ' but did not define properties "t", and "u"'
    )
    assert got[1].violations[0].keywordLocation == "/required"


def test_required_single(spark):
    df = rows(spark, [(None,)], "u string")
    out = annotate(df, {"required": ["u"]}).collect()
    assert out[0].violations[0].error == 'The object value was expected to define the property "u"'


def test_enum_and_pattern(spark):
    df = rows(spark, [("en", "https://x.com/a"), ("zz", "ftp:bad")], "lang string, url string")
    schema = {
        "properties": {
            "lang": {"enum": ["en", "de", "fr"]},
            "url": {"pattern": "^https?://"},
        }
    }
    out = annotate(df, schema).collect()
    assert out[0].valid is True
    assert out[1].valid is False
    errs = [v.error for v in out[1].violations]
    assert (
        'The string value "zz" was expected to equal one of the following values: "de", "en", and "fr"'
        in errs
    )


def test_pattern_prefix_fastpath_message(spark):
    df = rows(spark, [("ftp:bad",)], "url string")
    out = annotate(df, {"properties": {"url": {"pattern": "^https://"}}}).collect()
    assert out[0].violations[0].error == (
        'The string value "ftp:bad" was expected to match the regular expression "^https://"'
    )


def test_length_code_points(spark):
    # 'café中' = 5 code points (7 utf-8 bytes) — must count code points
    # (json_value.cc:509-524 semantics)
    df = rows(spark, [("café中",)], "t string")
    ok = validate(df, {"properties": {"t": {"minLength": 5, "maxLength": 5}}}).collect()
    assert ok[0].valid is True
    out = annotate(df, {"properties": {"t": {"maxLength": 4}}}).collect()
    assert out[0].violations[0].error == (
        'The string value "café中" was expected to consist of at most 4 characters'
        " but it consisted of 5 characters"
    )


def test_numeric_bounds(spark):
    df = rows(spark, [(5.0,), (49.5,), (51.0,)], "q double")
    schema = {"properties": {"q": {"minimum": 1, "maximum": 50}}}
    got = [r.valid for r in validate(df, schema).collect()]
    assert got == [True, True, False]
    out = annotate(df, schema).collect()
    assert out[2].violations[0].error == (
        "The number value 51.0 was expected to be less than or equal to the integer 50"
    )


def test_exclusive_bounds_equal_message(spark):
    df = rows(spark, [(50,)], "q long")
    out = annotate(df, {"properties": {"q": {"exclusiveMinimum": 50}}}).collect()
    assert out[0].violations[0].error == (
        "The integer value 50 was expected to be greater than the integer 50, but they were equal"
    )


def test_multiple_of(spark):
    df = rows(spark, [(10,), (7,)], "n long")
    got = [r.valid for r in validate(df, {"properties": {"n": {"multipleOf": 5}}}).collect()]
    assert got == [True, False]
    # real column, 0.5 divisor (the x.0 % 0.5 exact case, json_value.cc:801-857)
    df2 = rows(spark, [(2.5,), (2.53,)], "x double")
    got2 = [r.valid for r in validate(df2, {"properties": {"x": {"multipleOf": 0.5}}}).collect()]
    assert got2 == [True, False]
    # non-binary divisor routes to the exact-decimal pandas UDF
    df3 = rows(spark, [(0.3,), (0.35,)], "x double")
    got3 = [r.valid for r in validate(df3, {"properties": {"x": {"multipleOf": 0.1}}}).collect()]
    assert got3 == [True, False]


def test_type_integer_accepts_integral_real(spark):
    df = rows(spark, [(3.0,), (3.5,)], "x double")
    got = [r.valid for r in validate(df, {"properties": {"x": {"type": "integer"}}}).collect()]
    assert got == [True, False]


def test_const_and_type_list(spark):
    df = rows(spark, [("a", 1.0)], "s string, n double")
    assert validate(df, {"properties": {"s": {"const": "a"}}}).collect()[0].valid is True
    assert validate(df, {"properties": {"s": {"const": "b"}}}).collect()[0].valid is False
    assert validate(df, {"properties": {"n": {"type": ["string", "number"]}}}).collect()[0].valid


def test_additional_properties_false(spark):
    df = rows(spark, [("a", "b")], "x string, y string")
    schema = {"properties": {"x": {}}, "additionalProperties": False}
    out = annotate(df, schema).collect()
    assert out[0].valid is False
    v = out[0].violations[0]
    assert v.keywordLocation == "/additionalProperties"
    assert v.instanceLocation == "/y"
    assert v.error == 'The object value was not expected to define the property "y"'


def test_dependent_required(spark):
    df = rows(spark, [("h", None), ("h", "t"), (None, None)], "html string, text string")
    schema = {"dependentRequired": {"html": ["text"]}}
    got = annotate(df, schema).collect()
    assert [r.valid for r in got] == [False, True, True]
    assert got[0].violations[0].error == (
        'Because the object value defined the property "html",'
        ' it was also expected to define the property "text"'
    )


def test_logical_combinators(spark):
    df = rows(spark, [("zh", "x"), ("zh", ""), ("en", "")], "lang string, text string")
    schema = {
        "if": {"properties": {"lang": {"const": "zh"}}},
        "then": {"properties": {"text": {"minLength": 1}}},
    }
    got = [r.valid for r in validate(df, schema).collect()]
    assert got == [True, False, True]

    any_of = {"anyOf": [{"properties": {"lang": {"const": "zh"}}}, {"properties": {"text": {"minLength": 1}}}]}
    got2 = [r.valid for r in validate(df, any_of).collect()]
    assert got2 == [True, True, False]

    one_of = {"oneOf": [{"properties": {"lang": {"const": "zh"}}}, {"properties": {"text": {"minLength": 1}}}]}
    got3 = [r.valid for r in validate(df, one_of).collect()]
    assert got3 == [False, True, False]

    not_s = {"not": {"properties": {"lang": {"const": "zh"}}}}
    got4 = [r.valid for r in validate(df, not_s).collect()]
    assert got4 == [False, False, True]


def test_ref_inlining(spark):
    df = rows(spark, [("en",), ("zz",)], "lang string")
    schema = {
        "$defs": {"lang": {"enum": ["en", "de"]}},
        "properties": {"lang": {"$ref": "#/$defs/lang"}},
    }
    got = [r.valid for r in validate(df, schema).collect()]
    assert got == [True, False]
    out = annotate(df, schema).collect()
    assert out[1].violations[0].keywordLocation == "/properties/lang/$ref/enum"


def test_false_schema(spark):
    df = rows(spark, [("x",)], "a string")
    out = annotate(df, {"properties": {"a": False}}).collect()
    assert out[0].valid is False
    assert out[0].violations[0].error == "No instance is expected to succeed against the false schema"


def test_format_uri_datetime(spark):
    df = rows(
        spark,
        [("https://x.com/a", "2021-06-01T12:00:00Z"), ("not a uri", "2021-13-01T99:00:00Z")],
        "u string, ts string",
    )
    schema = {"properties": {"u": {"format": "uri"}, "ts": {"format": "date-time"}}}
    got = [r.valid for r in validate(df, schema).collect()]
    assert got == [True, False]
    out = annotate(df, schema).collect()
    errs = [v.error for v in out[1].violations]
    assert 'The string value "not a uri" was expected to represent a valid URI' in errs


def test_verdict_counts(spark):
    df = rows(spark, [("en",), ("zz",), ("de",)], "lang string")
    got = verdict_counts(df, {"properties": {"lang": {"enum": ["en", "de"]}}}).collect()[0]
    assert (got.n_rows, got.n_valid, got.n_invalid) == (3, 2, 1)


def test_timestamp_column_as_datetime_string(spark):
    df = spark.sql("select timestamp'2021-06-01 12:00:00' as warc_ts")
    schema = {"properties": {"warc_ts": {"type": "string", "format": "date-time"}}}
    assert validate(df, schema).collect()[0].valid is True


def test_standard_output_shapes(spark):
    import json as _json

    from jsonschema_spark import standard_output

    df = spark.createDataFrame([("en",), ("zz",)], "lang string")
    schema = {"$id": "https://x/s.json", "properties": {"lang": {"enum": ["en"]}}}
    out = {r["lang"]: _json.loads(r["report"]) for r in standard_output(df, schema).collect()}
    assert out["en"] == {"valid": True}
    assert out["zz"]["valid"] is False
    errs = out["zz"]["errors"]
    assert errs and errs[-1]["keywordLocation"] == "/properties"
    assert errs[0]["instanceLocation"] == "/lang"
    assert errs[0]["absoluteKeywordLocation"].startswith("https://x/s.json#")
    flag = {r["lang"]: _json.loads(r["report"]) for r in standard_output(df, schema, fmt="flag").collect()}
    assert flag == {"en": {"valid": True}, "zz": {"valid": False}}


def test_property_verdicts(spark):
    from jsonschema_spark import property_verdicts

    df = spark.createDataFrame(
        [(1, "en", 10), (2, "zz", 10), (3, "en", -5), (None, "en", 10)],
        "doc_id long, lang string, n long",
    )
    schema = {
        "required": ["doc_id"],
        "properties": {
            "lang": {"enum": ["en", "de"]},
            "n": {"minimum": 0},
        },
    }
    byid = {(r["doc_id"], r["lang"], r["n"]): (r["ok_doc_id"], r["ok_lang"], r["ok_n"]) for r in property_verdicts(df, schema).collect()}
    assert byid[(1, "en", 10)] == (True, True, True)
    assert byid[(2, "zz", 10)] == (True, False, True)
    assert byid[(3, "en", -5)] == (True, True, False)
    assert byid[(None, "en", 10)][0] is False  # required doc_id missing


def test_instance_cols_restricts_flat_instance(spark):
    """Bookkeeping columns outside instance_cols are invisible to
    closed-object keywords."""
    from jsonschema_spark import validate

    df = spark.createDataFrame([(1, "meta", 5)], "_id long, _tag string, v long")
    closed = {"properties": {"v": {"type": "integer"}},
              "unevaluatedProperties": False}
    # full row: _id/_tag are unevaluated extras -> invalid
    assert validate(df, closed).first()["valid"] is False
    assert validate(df, closed, instance_cols=["v"]).first()["valid"] is True
    counted = {"maxProperties": 1}
    assert validate(df, counted).first()["valid"] is False
    assert validate(df, counted, instance_cols=["v"]).first()["valid"] is True


def test_instance_cols_typo_raises(spark):
    import pytest as _pytest

    from jsonschema_spark import validate

    df = spark.createDataFrame([(1,)], "v long")
    with _pytest.raises(ValueError, match="instance_cols"):
        validate(df, {"required": ["v"]}, instance_cols=["vv"])


def test_root_inapplicable_keywords_vacuous(spark):
    """The flat row is statically an object: scalar/array keywords at the
    ROOT must compile to a vacuous pass (EVALUATE_BEGIN precondition-skip),
    never crash — regression for FlatRowCtx scalar accessors."""
    from jsonschema_spark import validate

    df = spark.createDataFrame([(1,)], "x long")
    vacuous = [
        {"minLength": 3}, {"pattern": "^a"}, {"format": "email"},
        {"minimum": 5}, {"exclusiveMaximum": 0}, {"multipleOf": 2},
        {"minItems": 1}, {"uniqueItems": True},
        {"contains": {"type": "integer"}},
        {"prefixItems": [{"type": "string"}]},
        {"items": {"type": "string"}},
    ]
    for sch in vacuous:
        assert validate(df, sch).first()["valid"] is True, sch
    # but keywords that DO apply to objects still assert
    for sch in ({"const": 3}, {"enum": [1, 2]}, {"type": "string"}):
        assert validate(df, sch).first()["valid"] is False, sch


def test_verdict_counts_cube_granularities(spark):
    """cube() verdicts: the grand total (gid=3) equals the sum of the most
    detailed level (gid=0); per-dim roll-ups carry the right gid bits; a
    rolled-up NULL is distinguishable from a NULL data value by gid."""
    from jsonschema_spark.operators.validate import verdict_counts_cube

    df = spark.createDataFrame(
        [(1, "a", "en"), (2, "a", None), (3, "b", "de"), (4, "b", "de")],
        "doc_id long, source string, lang string",
    )
    schema = {"properties": {"lang": {"enum": ["en", "de"]}}, "required": ["lang"]}
    rows = verdict_counts_cube(df, schema, ["source", "lang"]).collect()
    by_gid: dict = {}
    for r in rows:
        by_gid.setdefault(r["gid"], []).append(r)
    assert sum(r["n_rows"] for r in by_gid[0]) == 4
    total = by_gid[3][0]
    assert (total["n_rows"], total["n_valid"], total["n_invalid"]) == (4, 3, 1)
    # gid=0 contains the REAL (a, NULL) cell; gid=1 the lang roll-ups
    assert any(r["source"] == "a" and r["lang"] is None and r["n_rows"] == 1
               for r in by_gid[0])
    assert any(r["source"] == "a" and r["n_rows"] == 2 for r in by_gid[1])
