"""CTRF byte-format parity for the test runner (VERDICT r4 directive 4).

Reproduces three of the reference's own golden scripts —
/root/reference/test/test/pass_single_resolve_json.sh,
pass_single_no_description_json.sh, fail_false_single_resolve_json.sh —
byte for byte: same schema/test fixture content, the goldens' exact sed
filter (drop duration/start/stop/threadId lines), and a literal diff
against the expected text those scripts embed (with the version and
tmp filePath substituted exactly as the scripts do via $VERSION /
$(realpath $TMP)).
"""
import json
import os

from jsonschema_spark.operators.testrunner import (
    _case_lines,
    ctrf_report,
    prettify_json,
)

SCHEMA = {
    "id": "https://example.com",
    "$schema": "http://json-schema.org/draft-04/schema#",
    "type": "string",
}

VERSION = "9.9.9"  # stands in for the scripts' $VERSION substitution


def _render_filtered(spark, test_json_text, tmp_path):
    p = tmp_path / "test.json"
    p.write_text(test_json_text)
    rep, ok, empty = ctrf_report(
        spark, [str(p)],
        resolver=lambda uri: SCHEMA,
        tool_version=VERSION)
    out = prettify_json(rep) + "\n"
    # the goldens' exact sed filter
    filtered = "".join(
        line for line in out.splitlines(keepends=True)
        if not any(f'"{k}":' in line
                   for k in ("duration", "start", "stop", "threadId")))
    return filtered, ok, empty, str(p)


def test_ctrf_pass_single_resolve_golden(spark, tmp_path):
    test_json = """{
  "target": "https://example.com",
  "tests": [
    {
      "description": "First test",
      "valid": true,
      "data": "foo"
    },
    {
      "description": "Invalid type",
      "valid": false,
      "data": 1
    }
  ]
}
"""
    filtered, ok, empty, path = _render_filtered(spark, test_json, tmp_path)
    assert ok and not empty
    expected = """{
  "reportFormat": "CTRF",
  "specVersion": "0.0.0",
  "results": {
    "tool": {
      "name": "jsonschema",
      "version": "%s"
    },
    "summary": {
      "tests": 2,
      "passed": 2,
      "failed": 0,
      "pending": 0,
      "skipped": 0,
      "other": 0,
    },
    "tests": [
      {
        "name": "First test",
        "status": "passed",
        "suite": [ "https://example.com" ],
        "type": "unit",
        "filePath": "%s",
        "line": 4,
        "retries": 0,
        "flaky": false,
      },
      {
        "name": "Invalid type",
        "status": "passed",
        "suite": [ "https://example.com" ],
        "type": "unit",
        "filePath": "%s",
        "line": 9,
        "retries": 0,
        "flaky": false,
      }
    ]
  }
}
""" % (VERSION, path, path)
    assert filtered == expected


def test_ctrf_pass_single_no_description_golden(spark, tmp_path):
    test_json = """{
  "target": "https://example.com",
  "tests": [
    {
      "valid": true,
      "data": "foo"
    }
  ]
}
"""
    filtered, ok, empty, path = _render_filtered(spark, test_json, tmp_path)
    assert ok and not empty
    expected = """{
  "reportFormat": "CTRF",
  "specVersion": "0.0.0",
  "results": {
    "tool": {
      "name": "jsonschema",
      "version": "%s"
    },
    "summary": {
      "tests": 1,
      "passed": 1,
      "failed": 0,
      "pending": 0,
      "skipped": 0,
      "other": 0,
    },
    "tests": [
      {
        "name": "<no description>",
        "status": "passed",
        "suite": [ "https://example.com" ],
        "type": "unit",
        "filePath": "%s",
        "line": 4,
        "retries": 0,
        "flaky": false,
      }
    ]
  }
}
""" % (VERSION, path)
    assert filtered == expected


def test_ctrf_fail_false_single_resolve_golden(spark, tmp_path):
    test_json = """{
  "target": "https://example.com",
  "tests": [
    {
      "description": "Should fail but passes",
      "valid": false,
      "data": "valid-string"
    }
  ]
}
"""
    filtered, ok, empty, path = _render_filtered(spark, test_json, tmp_path)
    assert not ok and not empty  # the script asserts exit code 2
    expected = """{
  "reportFormat": "CTRF",
  "specVersion": "0.0.0",
  "results": {
    "tool": {
      "name": "jsonschema",
      "version": "%s"
    },
    "summary": {
      "tests": 1,
      "passed": 0,
      "failed": 1,
      "pending": 0,
      "skipped": 0,
      "other": 0,
    },
    "tests": [
      {
        "name": "Should fail but passes",
        "status": "failed",
        "suite": [ "https://example.com" ],
        "type": "unit",
        "filePath": "%s",
        "line": 4,
        "retries": 0,
        "flaky": false,
        "message": "Passed but was expected to fail"
      }
    ]
  }
}
""" % (VERSION, path)
    assert filtered == expected


def test_ctrf_pass_multi_target_resolve_golden(spark, tmp_path):
    """pass_multi_target_resolve_json.sh: a 2-target suite emits each
    test once PER target, targets outer / cases inner, each tagged
    with its own suite array."""
    schemas = {
        "https://example.com/one": {
            "id": "https://example.com/one",
            "$schema": "http://json-schema.org/draft-04/schema#",
            "type": ["string", "number"],
        },
        "https://example.com/two": {
            "id": "https://example.com/two",
            "$schema": "http://json-schema.org/draft-04/schema#",
            "type": ["string", "number"],
        },
    }
    test_json = """{
  "target": [
    "https://example.com/one",
    "https://example.com/two"
  ],
  "tests": [
    {
      "description": "String is valid",
      "valid": true,
      "data": "foo"
    },
    {
      "description": "Object is invalid",
      "valid": false,
      "data": {}
    }
  ]
}
"""
    p = tmp_path / "test.json"
    p.write_text(test_json)
    rep, ok, empty = ctrf_report(
        spark, [str(p)], resolver=lambda uri: schemas[uri],
        tool_version=VERSION)
    assert ok and not empty
    out = prettify_json(rep) + "\n"
    filtered = "".join(
        line for line in out.splitlines(keepends=True)
        if not any(f'"{k}":' in line
                   for k in ("duration", "start", "stop", "threadId")))
    path = str(p)
    blocks = []
    for tgt in ("one", "two"):
        for name, line in (("String is valid", 7),
                           ("Object is invalid", 12)):
            blocks.append("""      {
        "name": "%s",
        "status": "passed",
        "suite": [ "https://example.com/%s" ],
        "type": "unit",
        "filePath": "%s",
        "line": %d,
        "retries": 0,
        "flaky": false,
      }""" % (name, tgt, path, line))
    expected = """{
  "reportFormat": "CTRF",
  "specVersion": "0.0.0",
  "results": {
    "tool": {
      "name": "jsonschema",
      "version": "%s"
    },
    "summary": {
      "tests": 4,
      "passed": 4,
      "failed": 0,
      "pending": 0,
      "skipped": 0,
      "other": 0,
    },
    "tests": [
%s
    ]
  }
}
""" % (VERSION, ",\n".join(blocks))
    assert filtered == expected


def test_ctrf_report_is_valid_against_ctrf_schema(spark, tmp_path):
    """The goldens also validate output.json against the vendored CTRF
    spec schema — replay that check through OUR validator (pyeval)."""
    from jsonschema_spark.plans.pyeval import validate_py

    ctrf_schema_path = (
        "/root/reference/vendor/ctrf/specification/schema-0.0.0.json")
    if not os.path.exists(ctrf_schema_path):
        import pytest
        pytest.skip("reference CTRF schema not present")
    with open(ctrf_schema_path) as fh:
        ctrf_schema = json.load(fh)
    p = tmp_path / "test.json"
    p.write_text(json.dumps({
        "target": "https://example.com",
        "tests": [
            {"description": "ok", "valid": True, "data": "x"},
            {"description": "broken", "valid": True, "data": 5},
        ],
    }, indent=2))
    rep, ok, _ = ctrf_report(spark, [str(p)],
                             resolver=lambda uri: SCHEMA,
                             tool_version=VERSION)
    assert not ok  # "broken" fails with a trace entry
    assert validate_py(ctrf_schema, rep)
    # and a deliberately broken report must NOT validate
    bad = json.loads(json.dumps(rep))
    bad["results"]["summary"]["tests"] = "two"
    assert not validate_py(ctrf_schema, bad)


def test_case_lines_tokenizer():
    text = """{
  "target": "t",
  "nested": {"tests": [{"x": 1}]},
  "tests": [
    {"a": "has { and ] in string"},
    {
      "b": 2
    }
  ]
}"""
    # only the TOP-LEVEL tests array counts; braces inside strings and
    # the decoy "tests" key at depth 2 are ignored
    assert _case_lines(text) == [5, 6]


def test_prettify_line_width_and_empties():
    # array of scalars too wide for one line wraps one-per-line
    long_items = ["x" * 30, "y" * 30, "z" * 30]
    doc = {"k": long_items, "e": [], "o": {}, "n": None, "i": 7}
    out = prettify_json(doc)
    assert '"k": [\n    "' in out          # wrapped
    assert '"e": []' in out
    assert '"o": {}' in out
    assert '"n": null' in out and '"i": 7' in out
    # short scalar array stays inline with the [ a, b ] spacing
    assert prettify_json({"s": [1, 2]}) == '{\n  "s": [ 1, 2 ]\n}'
