"""Universal physical-plan sweep over EVERY driver query.

tests/test_plan_shape.py pins named per-operator plan properties; this
file is the regression NET: every `__spark_entry__.queries()` entry is
built (sf0.001) and its physical plan scanned for the two silent
scale-killers the round-3 audit found instances of:

1. a corpus-sized ``Exchange SinglePartition`` funnel (the unpartitioned
   window / global row_number pattern — Spark itself warns "Moving all
   data to a single partition"). Allowed shapes, recognized structurally:
   - global aggregation of map-side partials (child is a ``partial_``
     HashAggregate/SortAggregate — only one row per upstream partition
     moves);
   - inside a ``BroadcastExchange`` subtree (model-sized side);
   - subtree bounded by a limit (``TakeOrderedAndProject`` /
     ``GlobalLimit`` / ``LocalLimit`` / ``CollectLimit`` below the
     exchange — k rows move, not the corpus).
2. a ``CartesianProduct`` anywhere (candidate generation must never
   degenerate to all-pairs; the exact brute-force similarity tier plans
   a BroadcastNestedLoopJoin, which is a different node and stays
   allowed deliberately — it is the documented small-n path).

A query with a new, justified exception belongs in ALLOW with a comment,
not in a weaker global rule.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF_DIR = "/root/testdata/sf0.001"

# query -> reason a flagged node is acceptable there (empty today: every
# shipped plan passes the structural rules; add entries ONLY with a
# scale argument, never to silence a regression)
ALLOW_SINGLE_PARTITION: dict[str, str] = {}
ALLOW_CARTESIAN: dict[str, str] = {}


def _plan(df, mode="simple") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def _indent(line: str) -> int:
    """Tree depth of a plan line = offset of its operator text (the
    EXPLAIN tree uses ':'/'+'/'-'/' ' prefixes of 3 chars per level)."""
    i = 0
    while i < len(line) and line[i] in " :+-":
        i += 1
    return i


def _single_partition_violations(plan: str) -> list[str]:
    lines = plan.splitlines()
    bad = []
    for i, ln in enumerate(lines):
        if "Exchange SinglePartition" not in ln:
            continue
        d = _indent(ln)
        # (a) global partial-agg pattern: the exchange's child carries
        # partial_* aggregate functions — only partials cross the wire
        child = lines[i + 1] if i + 1 < len(lines) else ""
        if "partial_" in child:
            continue
        # (b) inside a broadcast subtree: nearest shallower ancestor that
        # is an exchange boundary is a BroadcastExchange
        inside_broadcast = False
        for j in range(i - 1, -1, -1):
            if _indent(lines[j]) < d:
                if "BroadcastExchange" in lines[j]:
                    inside_broadcast = True
                    d = _indent(lines[j])  # keep climbing
                elif "Exchange" in lines[j]:
                    break
                else:
                    d = _indent(lines[j])
        if inside_broadcast:
            continue
        # (c) bounded input: a limit node anywhere in the exchange's
        # subtree (deeper lines until indent returns to <= exchange's)
        d = _indent(ln)
        bounded = False
        for j in range(i + 1, len(lines)):
            if lines[j].strip() and _indent(lines[j]) <= d:
                break
            if any(t in lines[j] for t in
                   ("TakeOrderedAndProject", "GlobalLimit", "LocalLimit",
                    "CollectLimit")):
                bounded = True
                break
        if bounded:
            continue
        bad.append(ln.strip())
    return bad


def test_every_query_plan_is_scale_shaped(spark):
    failures = []
    for name, fn in entrymod.queries().items():
        try:
            df = fn(spark, SF_DIR)
            plan = _plan(df)
        except Exception as exc:  # a query that cannot BUILD is a failure
            failures.append(f"{name}: build error {type(exc).__name__}: {exc}")
            continue
        if name not in ALLOW_CARTESIAN and "CartesianProduct" in plan:
            failures.append(f"{name}: CartesianProduct in plan")
        if name not in ALLOW_SINGLE_PARTITION:
            for v in _single_partition_violations(plan):
                failures.append(f"{name}: unbounded single-partition funnel: {v}")
    assert not failures, "\n".join(failures)
