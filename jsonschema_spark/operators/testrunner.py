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
