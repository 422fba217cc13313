"""Schema unit-test runner — the `jsonschema test` analogue.

Consumes the reference's suite format (/root/reference/docs/test.markdown:
34-106): ``{target: <schema|uri>, tests: [{description, valid,
data|dataPath}]}``. All cases of a suite are evaluated in ONE DataFrame
pass (one row per case, JSON-encoded, through the tree-path validator) —
the batched inversion of the reference's per-case loop
(/root/reference/vendor/blaze/src/test/test_runner.cc).

Produces a CTRF-style JSON report (the `--json` shape,
/root/reference/src/command_test.cc:328-493 report_as_ctrf).
"""

from __future__ import annotations

import json
from typing import Callable, Optional, Union

from pyspark.sql import SparkSession

from jsonschema_spark.operators.validate import annotate

Resolver = Callable[[str], Union[dict, bool]]


def run_suite(
    spark: SparkSession,
    suite: dict,
    resolver: Optional[Resolver] = None,
) -> dict:
    """Run one suite; returns a CTRF-style report dict."""
    target = suite["target"]
    schema = resolver(target) if isinstance(target, str) else target
    cases = suite.get("tests", [])
    if not cases:
        return {
            "results": {
                "tool": {"name": "jsonschema_spark"},
                "summary": {"tests": 0, "passed": 0, "failed": 0},
                "tests": [],
                "empty": True,
            }
        }
    rows = [
        (i, json.dumps(c["data"]), bool(c.get("valid", True)), c.get("description", f"case {i}"))
        for i, c in enumerate(cases)
    ]
    df = spark.createDataFrame(rows, "idx long, doc string, expected boolean, description string")
    annotated = annotate(df, schema, doc_col="doc")
    results = annotated.select("idx", "expected", "description", "valid", "violations").collect()

    tests = []
    passed = 0
    for r in sorted(results, key=lambda x: x["idx"]):
        ok = bool(r["valid"]) == bool(r["expected"])
        passed += ok
        entry = {
            "name": r["description"],
            "status": "passed" if ok else "failed",
            "expected_valid": bool(r["expected"]),
            "actual_valid": bool(r["valid"]),
        }
        if not ok and not r["valid"]:
            entry["errors"] = [
                {
                    "keywordLocation": v["keywordLocation"],
                    "instanceLocation": v["instanceLocation"],
                    "error": v["error"],
                }
                for v in (r["violations"] or [])
            ]
        tests.append(entry)
    return {
        "results": {
            "tool": {"name": "jsonschema_spark"},
            "summary": {"tests": len(tests), "passed": passed, "failed": len(tests) - passed},
            "tests": tests,
        }
    }


def run_suites(spark: SparkSession, suites: list[dict], resolver: Optional[Resolver] = None) -> dict:
    """Aggregate report over many suites (the directory-walk analogue)."""
    reports = [run_suite(spark, s, resolver) for s in suites]
    summary = {
        "tests": sum(r["results"]["summary"]["tests"] for r in reports),
        "passed": sum(r["results"]["summary"]["passed"] for r in reports),
        "failed": sum(r["results"]["summary"]["failed"] for r in reports),
    }
    return {"results": {"tool": {"name": "jsonschema_spark"}, "summary": summary,
                        "suites": [r["results"] for r in reports]}}


# --- CTRF byte-format parity (`jsonschema test --json`) ----------------
#
# The reference emits a specific CTRF JSON document
# (src/command_test.cc:328-493 report_as_ctrf) rendered by sourcemeta's
# prettifier (vendor/core/src/core/json/stringify.h:446-553); its own
# goldens (test/test/*_json.sh) sed out duration/start/stop/threadId and
# byte-diff the rest. ctrf_report + prettify_json reproduce that byte
# shape so a user can point a CTRF-parsing CI dashboard at either tool.

_LINE_WIDTH = 80  # stringify.h:21


def _ctrf_escape(s: str) -> str:
    """String escaping per stringify.h:200-405: short escapes for
    \\b \\t \\n \\f \\r, uppercase \\u00XX for other control chars."""
    out = ['"']
    short = {'"': '\\"', "\\": "\\\\", "\b": "\\b", "\t": "\\t",
             "\n": "\\n", "\f": "\\f", "\r": "\\r"}
    for ch in s:
        if ch in short:
            out.append(short[ch])
        elif ord(ch) < 0x20:
            out.append("\\u%04X" % ord(ch))
        else:
            out.append(ch)
    out.append('"')
    return "".join(out)


def _ctrf_scalar(v) -> str:
    if v is None:
        return "null"
    if v is True:
        return "true"
    if v is False:
        return "false"
    if isinstance(v, float):
        # stringify.h:74-107: signed zeros as 0.0/-0.0; integral reals
        # as fixed digits + ".0"; otherwise shortest-round-trip
        # (std::to_chars default == Python repr for doubles)
        import math
        from decimal import Decimal
        if v == 0.0:
            return "-0.0" if math.copysign(1.0, v) < 0 else "0.0"
        if v.is_integer():
            # to_chars(fixed) = SHORTEST round-trip digits in fixed
            # notation (1e25 -> 1 then 25 zeros, NOT the exact binary
            # expansion Python's :.0f would print)
            return format(Decimal(repr(v)).normalize(), "f") + ".0"
        return repr(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, str):
        return _ctrf_escape(v)
    raise TypeError(f"unsupported JSON scalar: {type(v)}")


def prettify_json(doc, indentation: int = 0, indent_by: int = 2,
                  property_size: int = 0) -> str:
    """Byte-mirror of sourcemeta::core::prettify (stringify.h:446-553):
    objects always multi-line in insertion order at 2-space indents;
    arrays print on ONE line as ``[ a, b ]`` when every element is a
    scalar and the line fits under the 80-column budget (counting the
    current indent and the ``"key": `` prefix), else one element per
    line. Scalars per _ctrf_scalar."""
    pad = " " * (indentation * indent_by)
    pad1 = " " * ((indentation + 1) * indent_by)
    if isinstance(doc, dict):
        if not doc:
            return "{}"
        parts = ["{"]
        items = list(doc.items())
        for i, (k, v) in enumerate(items):
            key = _ctrf_escape(k) + ": "
            body = prettify_json(v, indentation + 1, indent_by, len(key))
            tail = "," if i + 1 < len(items) else ""
            parts.append(f"\n{pad1}{key}{body}{tail}")
        parts.append(f"\n{pad}}}")
        return "".join(parts)
    if isinstance(doc, list):
        effective = indentation * indent_by + property_size
        inline = effective < _LINE_WIDTH
        if inline:
            buf = "["
            for i, v in enumerate(doc):
                if isinstance(v, (dict, list)):
                    inline = False
                    break
                buf += " " + _ctrf_scalar(v)
                buf += " " if i + 1 == len(doc) else ","
                if len(buf) + effective >= _LINE_WIDTH:
                    inline = False
                    break
            if inline:
                return buf + "]"
        if not doc:
            return "[]"
        parts = ["["]
        for i, v in enumerate(doc):
            body = prettify_json(v, indentation + 1, indent_by)
            tail = "," if i + 1 < len(doc) else ""
            parts.append(f"\n{pad1}{body}{tail}")
        parts.append(f"\n{pad}]")
        return "".join(parts)
    return _ctrf_scalar(doc)


def _case_lines(text: str) -> list[int]:
    """1-indexed line number of each test case object's opening ``{``
    inside the top-level ``"tests"`` array — what the reference records
    as the test's position (command_test.cc emits position.line). A
    small tokenizer (string/escape-aware depth walk), not a JSON
    parser: Python's json module exposes no positions."""
    lines: list[int] = []
    line = 1
    depth = 0
    in_str = False
    esc = False
    cur_str: list[str] = []
    last_key: Optional[str] = None
    expecting_key = [False]  # per-depth: next string is a key
    tests_depth: Optional[int] = None  # depth INSIDE the tests array
    i = 0
    while i < len(text):
        ch = text[i]
        if ch == "\n":
            line += 1
        if in_str:
            if esc:
                esc = False
            elif ch == "\\":
                esc = True
            elif ch == '"':
                in_str = False
                s = "".join(cur_str)
                if len(expecting_key) > depth and expecting_key[depth]:
                    last_key = s
            else:
                cur_str.append(ch)
        elif ch == '"':
            in_str = True
            cur_str = []
        elif ch == "{":
            if tests_depth is not None and depth == tests_depth:
                lines.append(line)
            depth += 1
            while len(expecting_key) <= depth:
                expecting_key.append(False)
            expecting_key[depth] = True
        elif ch == "}":
            depth -= 1
        elif ch == "[":
            if last_key == "tests" and depth == 1 and tests_depth is None:
                tests_depth = depth + 1
            depth += 1
            while len(expecting_key) <= depth:
                expecting_key.append(False)
            expecting_key[depth] = False
        elif ch == "]":
            depth -= 1
            if tests_depth is not None and depth < tests_depth:
                tests_depth = None
        elif ch == ":":
            if len(expecting_key) > depth:
                expecting_key[depth] = False
        elif ch == ",":
            if len(expecting_key) > depth:
                expecting_key[depth] = True
        i += 1
    return lines


def ctrf_report(
    spark: SparkSession,
    suite_paths: list[str],
    resolver: Optional[Resolver] = None,
    tool_name: str = "jsonschema",
    tool_version: str = "0.0.0",
) -> tuple[dict, bool, bool]:
    """Run suites from FILES and build the exact CTRF document the
    reference's ``jsonschema test --json`` prints (command_test.cc:
    328-493): field order, ``<no description>`` fallback, per-test
    suite/type/filePath/line/retries/flaky/threadId, the
    "Passed but was expected to fail" message, and the
    tests/passed/failed/pending/skipped/other/start/stop summary.
    Returns (report_dict, all_passed, any_empty_suite) — the latter two
    are the reference's exit-code signals (EXIT_EXPECTED_FAILURE /
    EXIT_OTHER_INPUT_ERROR). Render with ``prettify_json(report) +
    "\\n"`` for the byte stream its goldens diff.

    Evaluation is the same one-DataFrame-pass-per-suite batch as
    run_suite; durations/timestamps are real (the goldens sed them
    out). Failing-because-invalid tests carry a ``trace`` field with
    our violation lines — CTRF-valid, not byte-matched (the reference
    prints its SimpleOutput trace there)."""
    import os
    import threading
    import time

    t_start = int(time.time() * 1000)
    tests: list[dict] = []
    total_passed = 0
    total_failed = 0
    any_empty = False
    thread_id = str(threading.get_ident())

    for path in suite_paths:
        with open(path, "r", encoding="utf-8") as fh:
            text = fh.read()
        suite = json.loads(text)
        case_lines = _case_lines(text)
        cases = suite.get("tests", [])
        if not cases:
            any_empty = True
            continue
        target = suite["target"]
        targets = target if isinstance(target, list) else [target]
        base = os.path.dirname(os.path.abspath(path))
        datas = []
        for c in cases:
            if "dataPath" in c:
                with open(os.path.join(base, c["dataPath"]),
                          encoding="utf-8") as dfh:
                    datas.append(dfh.read())
            else:
                datas.append(json.dumps(c["data"]))
        for tgt in targets:
            schema = resolver(tgt) if isinstance(tgt, str) else tgt
            rows = [(i, datas[i], bool(c.get("valid", True)))
                    for i, c in enumerate(cases)]
            df = spark.createDataFrame(
                rows, "idx long, doc string, expected boolean")
            c0 = time.time()
            results = {
                r["idx"]: r for r in
                annotate(df, schema, doc_col="doc")
                .select("idx", "expected", "valid", "violations")
                .collect()
            }
            dur_ms = max(int((time.time() - c0) * 1000 // len(cases)), 0)
            for i, c in enumerate(cases):
                r = results[i]
                ok = bool(r["valid"]) == bool(r["expected"])
                entry = {
                    "name": c.get("description") or "<no description>",
                    "status": "passed" if ok else "failed",
                    "duration": dur_ms,
                    "suite": [tgt if isinstance(tgt, str)
                              else "<inline schema>"],
                    "type": "unit",
                    "filePath": os.path.abspath(path),
                    "line": (case_lines[i]
                             if i < len(case_lines) else 0),
                    "retries": 0,
                    "flaky": False,
                    "threadId": thread_id,
                }
                if ok:
                    total_passed += 1
                else:
                    total_failed += 1
                    if not bool(r["expected"]) and bool(r["valid"]):
                        entry["message"] = ("Passed but was "
                                            "expected to fail")
                    else:
                        entry["trace"] = "\n".join(
                            "{} at instance {}: {}".format(
                                v["keywordLocation"],
                                v["instanceLocation"] or '""',
                                v["error"])
                            for v in (r["violations"] or []))
                tests.append(entry)

    t_stop = int(time.time() * 1000)
    report = {
        "reportFormat": "CTRF",
        "specVersion": "0.0.0",
        "results": {
            "tool": {"name": tool_name, "version": tool_version},
            "summary": {
                "tests": total_passed + total_failed,
                "passed": total_passed,
                "failed": total_failed,
                "pending": 0,
                "skipped": 0,
                "other": 0,
                "start": t_start,
                "stop": t_stop,
            },
            "tests": tests,
        },
    }
    return report, total_failed == 0, any_empty
