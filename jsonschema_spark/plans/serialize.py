"""Compiled-plan serialization — the `jsonschema compile` analogue.

The reference serializes its instruction Template to versioned JSON for
later `validate --template` runs (/root/reference/src/command_compile.cc:
137-209, JSON_VERSION{5} evaluator.h:47). Our physical plan is Column
expressions regenerated from the schema in milliseconds, so the durable
artifact is the *normalized schema + engine version + fingerprint*: enough
to (a) rebuild the identical plan, (b) detect drift (checkpoint manifests
embed the fingerprint), (c) introspect (`inspect` analogue in
plans/inspect.py).
"""

from __future__ import annotations

import hashlib
import json
from typing import Union

from jsonschema_spark.plans.compiler import CompiledSchema, SchemaError

PLAN_VERSION = 1


def canonical_json(schema: Union[dict, bool]) -> str:
    return json.dumps(schema, sort_keys=True, separators=(",", ":"), ensure_ascii=False)


def schema_fingerprint(schema: Union[dict, bool]) -> str:
    """sha256 of the canonical schema JSON — the plan identity used by
    checkpoint manifests and template round-trips."""
    return hashlib.sha256(canonical_json(schema).encode("utf-8")).hexdigest()


def plan_to_json(cs: CompiledSchema) -> dict:
    return {
        "version": PLAN_VERSION,
        "engine": "jsonschema_spark",
        "base_uri": cs.base_uri,
        "format_assertion": cs.format_assertion,
        "fingerprint": schema_fingerprint(cs.schema),
        "schema": cs.schema,
    }


def plan_from_json(doc: dict) -> CompiledSchema:
    if doc.get("version") != PLAN_VERSION:
        raise SchemaError(f"unsupported plan version {doc.get('version')!r}")
    cs = CompiledSchema(doc["schema"], doc.get("base_uri", ""), doc.get("format_assertion", True))
    fp = schema_fingerprint(cs.schema)
    if doc.get("fingerprint") not in (None, fp):
        raise SchemaError("plan fingerprint mismatch — schema was modified")
    return cs


def dump_plan(cs: CompiledSchema, path: str) -> None:
    with open(path, "w") as f:
        json.dump(plan_to_json(cs), f, indent=2, sort_keys=True)


def load_plan(path: str) -> CompiledSchema:
    with open(path) as f:
        return plan_from_json(json.load(f))
