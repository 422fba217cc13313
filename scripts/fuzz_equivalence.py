#!/usr/bin/env python
"""Acceptance-preservation fuzzer for the schema-rewrite tools.

Generates recursive random schemas far richer than the metamorphic net's
flat generator (nested combinators, const/enum/type conflicts, local
$defs/$ref pointers, prefixItems/contains, dependent*, unevaluated*,
numeric-bound edge values) plus adversarial instances, and checks — all
driver-side, no Spark:

  1. validate_py(s, x) == validate_py(canonicalize(s), x)
  2. validate_py(s, x) == validate_py(lint_fix(s), x)
  3. canonicalize(canonicalize(s)) == canonicalize(s)   (idempotence)
  4. neither tool crashes on any generated schema

This is the harness that would have caught every schema-rewrite bug the
round-2 advisor found (not.not annotation erasure, equal-bounds-vs-type
const collapse, single-branch inline conflicts, $ref danglers): those all
need schema SHAPES the committed 150-schema net cannot produce.

Usage: python scripts/fuzz_equivalence.py [n_schemas] [seed]
Exits nonzero on first divergence, printing a minimal repro triple.
"""
from __future__ import annotations

import copy
import json
import random
import sys

sys.path.insert(0, ".")

from jsonschema_spark.plans.canonicalize import canonicalize
from jsonschema_spark.plans.lint import lint_fix
from jsonschema_spark.plans.pyeval import EvalError, validate_py

NUMS = [0, 1, -1, 2, 3, 1.5, 2.5, -3, 0.5, 10, 1.0, 2.0]
STRS = ["", "a", "ab", "en", "xxxx", "héllo", "a1", "zz"]


def _leaf(rng: random.Random) -> dict:
    r = rng.random()
    if r < 0.25:
        s: dict = {"type": rng.choice(
            ["integer", "number", "string", "boolean", "null", "array",
             "object", ["integer", "string"], ["number", "null"]])}
        if rng.random() < 0.5 and s["type"] in ("integer", "number"):
            lo = rng.choice(NUMS)
            s[rng.choice(["minimum", "exclusiveMinimum"])] = lo
            if rng.random() < 0.7:
                # equal, crossing, or wider bounds — all three matter
                s[rng.choice(["maximum", "exclusiveMaximum"])] = rng.choice(
                    [lo, lo + 1, lo - 1, rng.choice(NUMS)])
            if rng.random() < 0.3:
                s["multipleOf"] = rng.choice([1, 2, 0.5, 3])
        if rng.random() < 0.4 and s["type"] == "string":
            if rng.random() < 0.5:
                s["minLength"] = rng.randint(0, 3)
            if rng.random() < 0.5:
                s["maxLength"] = rng.randint(0, 4)
            if rng.random() < 0.3:
                s["pattern"] = rng.choice(["^a", "b$", "^[a-z]+$", "\\d"])
        return s
    if r < 0.4:
        return {"const": rng.choice(NUMS + STRS + [True, None, [1, 2], {"k": 1}])}
    if r < 0.55:
        vals = rng.sample(NUMS + STRS + [True, False, None], k=rng.randint(1, 4))
        s = {"enum": vals}
        if rng.random() < 0.5:
            s["type"] = rng.choice(["integer", "string", "number",
                                    ["integer", "boolean"]])
        if rng.random() < 0.3:
            s["const"] = rng.choice(vals + [rng.choice(NUMS)])
        return s
    if r < 0.65:
        return {}  # true schema
    if r < 0.72:
        return {"not": {}}  # false schema
    if r < 0.85:
        s = {"type": "array"}
        if rng.random() < 0.5:
            s["minItems"] = rng.randint(0, 2)
        if rng.random() < 0.4:
            s["uniqueItems"] = True
        return s
    return {"required": [rng.choice(["a", "b", "s"])]}


def _node(rng: random.Random, depth: int) -> dict:
    if depth <= 0:
        return _leaf(rng)
    r = rng.random()
    if r < 0.30:
        return _leaf(rng)
    if r < 0.42:
        kw = rng.choice(["anyOf", "oneOf", "allOf"])
        n = rng.randint(1, 3)
        branches = [_node(rng, depth - 1) for _ in range(n)]
        if rng.random() < 0.35:
            # adjacency-coupled branch: hoisting it next to the coupled
            # parent sibling below must be blocked
            branches[0] = rng.choice([
                {"properties": {"a": _leaf(rng)}},
                {"patternProperties": {"^a": _leaf(rng)}},
                {"items": _leaf(rng)},
                {"prefixItems": [_leaf(rng)]},
                {"contains": _leaf(rng)},
                {"if": _leaf(rng)},
            ])
        s: dict = {kw: branches}
        if rng.random() < 0.5:  # siblings next to the combinator
            s.update(rng.choice([
                _leaf(rng),
                {"additionalProperties": rng.choice([False, {"type": "integer"}])},
                {"prefixItems": [_leaf(rng)]},
                {"items": _leaf(rng)},
                {"minContains": rng.randint(0, 2)},
                {"maxContains": rng.randint(0, 2)},
                {"contains": _leaf(rng)},
                {"then": _node(rng, depth - 1)},
                {"else": _leaf(rng)},
                {"unevaluatedProperties": rng.choice([False, {"type": "integer"}])},
            ]))
        if rng.random() < 0.2:
            s[kw] = s[kw] + [rng.choice([True, False])]
        return s
    if r < 0.5:
        s = {"not": _node(rng, depth - 1)}
        if rng.random() < 0.3:  # not.not
            s = {"not": s}
        return s
    if r < 0.6:
        s = {}
        if rng.random() < 0.8:
            s["if"] = rng.choice([True, False, {}, {"not": {}},
                                  _node(rng, depth - 1)])
        if rng.random() < 0.8:
            s["then"] = rng.choice([True, False, _node(rng, depth - 1)])
        if rng.random() < 0.6:
            s["else"] = rng.choice([True, False, _node(rng, depth - 1)])
        return s
    if r < 0.75:
        props = {k: _node(rng, depth - 1)
                 for k in rng.sample(["a", "b", "s", "o"], k=rng.randint(1, 3))}
        s = {"type": "object", "properties": props}
        if rng.random() < 0.4:
            s["required"] = rng.sample(list(props), k=1)
        if rng.random() < 0.3:
            s["additionalProperties"] = rng.choice(
                [False, {"type": "integer"}, _leaf(rng)])
        if rng.random() < 0.25:
            s["minProperties"] = rng.randint(0, 2)
        if rng.random() < 0.2:
            s["dependentRequired"] = {"a": ["b"]}
        if rng.random() < 0.15:
            s["dependentSchemas"] = {"a": _node(rng, depth - 1)}
        if rng.random() < 0.15:
            s.pop("type", None)
            s["unevaluatedProperties"] = rng.choice([False, {"type": "integer"}])
        return s
    if r < 0.88:
        s = {"type": "array", "items": _node(rng, depth - 1)}
        if rng.random() < 0.4:
            s["prefixItems"] = [_node(rng, depth - 1)
                                for _ in range(rng.randint(1, 2))]
        if rng.random() < 0.3:
            s["contains"] = _node(rng, depth - 1)
            if rng.random() < 0.5:
                s["minContains"] = rng.randint(0, 2)
            if rng.random() < 0.5:
                s["maxContains"] = rng.randint(0, 3)
        if rng.random() < 0.3:
            s["minItems"] = rng.randint(0, 2)
            if rng.random() < 0.5:
                s["maxItems"] = rng.randint(0, 3)
        return s
    # $defs + local pointer refs — the shape destructive rewrites dangle on
    defs = {"d1": _node(rng, depth - 1), "d2": _leaf(rng)}
    body = _node(rng, depth - 1)
    s = {"$defs": defs}
    s.update(body if isinstance(body, dict) else {})
    # plant refs INTO def subtrees (not just at them) when possible
    tgt = rng.choice(["#/$defs/d1", "#/$defs/d2"])
    if rng.random() < 0.5 and isinstance(defs["d1"], dict) and "properties" in defs["d1"]:
        k = next(iter(defs["d1"]["properties"]))
        tgt = f"#/$defs/d1/properties/{k}"
    slot = rng.random()
    if slot < 0.4:
        s.setdefault("properties", {})["r"] = {"$ref": tgt}
    elif slot < 0.7:
        s["allOf"] = s.get("allOf", []) + [{"$ref": tgt}]
    else:
        s["items"] = {"$ref": tgt}
    return s


INSTANCES = [
    None, True, False, 0, 1, -1, 2, 3, 1.5, 2.5, 1.0, 0.5, 10, -3,
    "", "a", "ab", "en", "xxxx", "héllo", "a1",
    [], [1], [1, 2], [1, 1], [1, 1.0], ["a", "b"], [1, "a"], [[1]],
    {}, {"a": 1}, {"a": 1, "b": 2}, {"a": "x"}, {"s": "en"},
    {"a": 1, "s": "en", "o": {"k": 1}}, {"b": 1.5}, {"r": 1}, {"r": "a"},
    {"a": [1, 2], "b": {"c": 3}},
]


def _instances(rng: random.Random):
    return rng.sample(INSTANCES, k=14)


def main() -> int:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 2000
    seed = int(sys.argv[2]) if len(sys.argv) > 2 else 20260817
    rng = random.Random(seed)
    n_div = 0
    for i in range(n):
        schema = _node(rng, rng.randint(1, 3))
        orig = copy.deepcopy(schema)
        try:
            canon = canonicalize(schema)
            fixed = lint_fix(schema)
            canon2 = canonicalize(copy.deepcopy(canon))
        except Exception as e:  # noqa: BLE001
            print(f"[{i}] CRASH {type(e).__name__}: {e}\n  schema={json.dumps(orig)}")
            return 1
        assert schema == orig, f"[{i}] canonicalize/lint_fix MUTATED input: {json.dumps(orig)}"
        if canon2 != canon:
            print(f"[{i}] NOT IDEMPOTENT\n  schema={json.dumps(orig)}\n"
                  f"  canon ={json.dumps(canon)}\n  canon2={json.dumps(canon2)}")
            n_div += 1
        for inst in _instances(rng):
            try:
                v0 = validate_py(orig, inst)
            except (EvalError, RecursionError):
                continue  # schema the evaluator itself rejects — skip
            for name, rewritten in (("canonicalize", canon), ("lint_fix", fixed)):
                try:
                    v1 = validate_py(rewritten, inst)
                except (EvalError, RecursionError) as e:
                    print(f"[{i}] {name} output fails to evaluate: {e}\n"
                          f"  schema={json.dumps(orig)}\n  out={json.dumps(rewritten)}\n"
                          f"  inst={json.dumps(inst)}")
                    n_div += 1
                    continue
                if v0 != v1:
                    print(f"[{i}] {name} VERDICT FLIP {v0}->{v1}\n"
                          f"  schema={json.dumps(orig)}\n  out={json.dumps(rewritten)}\n"
                          f"  inst={json.dumps(inst)}")
                    n_div += 1
        if n_div >= 20:
            print("... stopping after 20 divergences")
            return 1
    print(f"OK: {n} schemas x ~14 instances, 0 divergences" if not n_div
          else f"{n_div} divergences")
    return 1 if n_div else 0


if __name__ == "__main__":
    raise SystemExit(main())
