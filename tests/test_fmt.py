"""`fmt` analogue (plans/fmt.py) — canonical keyword ordering matches the
reference's keyword_rank table and docs/format.markdown worked example."""

import json

from jsonschema_spark import fmt_check, format_schema


def test_docs_worked_example():
    # /root/reference/docs/format.markdown: the fictitious schema and its
    # expected formatted output, byte-for-byte
    messy = json.loads(
        '{ "$schema":"https://json-schema.org/draft/2020-12/schema",'
        '"type": "string","pattern": "^(?!0000)\\\\d{4}$",'
        '"$id": "https://example.com/iso8601/v1.json",'
        '"title":    "ISO 8601 four-digit year (YYYY)" }'
    )
    expected = (
        '{\n'
        '  "$schema": "https://json-schema.org/draft/2020-12/schema",\n'
        '  "$id": "https://example.com/iso8601/v1.json",\n'
        '  "title": "ISO 8601 four-digit year (YYYY)",\n'
        '  "type": "string",\n'
        '  "pattern": "^(?!0000)\\\\d{4}$"\n'
        '}\n'
    )
    assert format_schema(messy) == expected


def test_subschemas_reordered_but_data_untouched():
    schema = {
        "properties": {
            "zz_first_declared": {"maximum": 2, "type": "integer", "minimum": 1},
            "aa_second": {"const": {"b": 1, "a": 2}},
        },
        "$id": "https://example.com/x.json",
        "required": ["zz_first_declared"],
    }
    out = json.loads(format_schema(schema))
    # property subschema keys reordered: type before maximum/minimum
    assert list(out["properties"]["zz_first_declared"]) == ["type", "maximum", "minimum"]
    # properties MAP keeps declaration order; const DATA keeps key order
    assert list(out["properties"]) == ["zz_first_declared", "aa_second"]
    assert list(out["properties"]["aa_second"]["const"]) == ["b", "a"]
    # top level: $id, then required, then properties ... then $defs
    assert list(out) == ["$id", "required", "properties"]


def test_unknown_and_x_keywords():
    out = json.loads(format_schema({"zcustom": 1, "x-meta": 2, "type": "string"}))
    # x- keywords rank as metadata (before $ref/type); unknown keywords last
    assert list(out) == ["x-meta", "type", "zcustom"]


def test_fmt_check_and_keep_ordering():
    formatted = format_schema({"type": "string", "$id": "https://e.com/a"})
    assert fmt_check(formatted)
    assert not fmt_check('{"type": "string"}')
    kept = format_schema({"pattern": "a", "type": "string"}, keep_ordering=True)
    assert list(json.loads(kept)) == ["pattern", "type"]


def test_indentation_option():
    out = format_schema({"type": "string"}, indent=4)
    assert out == '{\n    "type": "string"\n}\n'


def test_tuple_items_subschemas():
    schema = {"items": [{"minimum": 0, "type": "integer"}]}
    out = json.loads(format_schema(schema))
    assert list(out["items"][0]) == ["type", "minimum"]


def test_fmt_paths_check_and_rewrite(tmp_path):
    from jsonschema_spark.plans.fmt import fmt_paths

    good = tmp_path / "good.json"
    good.write_text(format_schema({"type": "string"}))
    bad = tmp_path / "sub" / "bad.json"
    bad.parent.mkdir()
    bad.write_text('{"pattern": "a", "type": "string"}')
    (tmp_path / "notes.txt").write_text("not a schema")
    ignored = tmp_path / "vendor"
    ignored.mkdir()
    (ignored / "skip.json").write_text("{}")

    res = fmt_paths([str(tmp_path)], check=True, ignore=[str(ignored)])
    assert res == {str(good): "ok", str(bad): "fail"}
    res2 = fmt_paths([str(tmp_path)], ignore=[str(ignored)])
    assert res2[str(bad)] == "formatted"
    out = json.loads(bad.read_text())
    assert list(out) == ["type", "pattern"]  # canonical order applied
    assert fmt_paths([str(bad)], check=True) == {str(bad): "ok"}
