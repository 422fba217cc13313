"""Dialect normalization — the `jsonschema upgrade` analogue.

The reference migrates draft3→…→2020-12 through 12 upgrade rules
(/root/reference/vendor/blaze/src/alterschema/upgrade/). We normalize any
draft-4/6/7/2019-09 schema into the single 2020-12-subset dialect the
compiler consumes:

- ``definitions``            → ``$defs`` (+ rewrite ``$ref`` pointers)
- array-form ``items``       → ``prefixItems`` (+ ``additionalItems`` → ``items``)
- draft-4 boolean ``exclusiveMinimum/Maximum`` → numeric form
- ``dependencies``           → ``dependentRequired`` / ``dependentSchemas``
- draft-4 integer-only ``type: integer`` stays (2020-12 keeps int⊂number)
- ``id`` (draft-4)           → ``$id``
- ``$recursiveRef: "#"``     → ``$dynamicRef`` left unsupported (flagged)

Returns a NEW schema dict; input is never mutated.
"""

from __future__ import annotations

import copy
from typing import Union

DIALECT_2020 = "https://json-schema.org/draft/2020-12/schema"


def _rewrite_refs(node, mapping: dict[str, str]):
    if isinstance(node, dict):
        for k, v in list(node.items()):
            if k == "$ref" and isinstance(v, str):
                for old, new in mapping.items():
                    if v == old or v.startswith(old + "/"):
                        node[k] = new + v[len(old):]
                        break
            else:
                _rewrite_refs(v, mapping)
    elif isinstance(node, list):
        for x in node:
            _rewrite_refs(x, mapping)


def _upgrade_node(node) -> None:
    if not isinstance(node, dict):
        return
    # draft-4 id → $id
    if "id" in node and isinstance(node["id"], str) and "$id" not in node:
        node["$id"] = node.pop("id")
    # definitions → $defs
    if "definitions" in node and "$defs" not in node:
        node["$defs"] = node.pop("definitions")
    # tuple items → prefixItems; additionalItems → items
    if isinstance(node.get("items"), list):
        node["prefixItems"] = node.pop("items")
        if "additionalItems" in node:
            node["items"] = node.pop("additionalItems")
    elif "additionalItems" in node and "items" not in node:
        node["items"] = node.pop("additionalItems")
    # draft-4 boolean exclusive bounds
    if isinstance(node.get("exclusiveMinimum"), bool):
        flag = node.pop("exclusiveMinimum")
        if flag and "minimum" in node:
            node["exclusiveMinimum"] = node.pop("minimum")
    if isinstance(node.get("exclusiveMaximum"), bool):
        flag = node.pop("exclusiveMaximum")
        if flag and "maximum" in node:
            node["exclusiveMaximum"] = node.pop("maximum")
    # draft-3: extends → allOf, divisibleBy → multipleOf, disallow → not
    if "extends" in node:
        ext = node.pop("extends")
        subs = ext if isinstance(ext, list) else [ext]
        node.setdefault("allOf", []).extend(subs)
    if "divisibleBy" in node and "multipleOf" not in node:
        node["multipleOf"] = node.pop("divisibleBy")
    if "disallow" in node and "not" not in node:
        dis = node.pop("disallow")
        types = [t for t in (dis if isinstance(dis, list) else [dis]) if isinstance(t, str)]
        if types:
            node["not"] = {"type": types if len(types) > 1 else types[0]}
    # dependencies → dependentRequired / dependentSchemas
    if isinstance(node.get("dependencies"), dict):
        deps = node.pop("dependencies")
        dreq, dsch = {}, {}
        for name, v in deps.items():
            if isinstance(v, list):
                dreq[name] = v
            else:
                dsch[name] = v
        if dreq:
            node.setdefault("dependentRequired", {}).update(dreq)
        if dsch:
            node.setdefault("dependentSchemas", {}).update(dsch)
    for v in node.values():
        if isinstance(v, dict):
            _upgrade_node(v)
        elif isinstance(v, list):
            for x in v:
                _upgrade_node(x)


def upgrade_schema(schema: Union[dict, bool]) -> Union[dict, bool]:
    """Normalize a legacy-draft schema to the 2020-12 subset."""
    if not isinstance(schema, dict):
        return schema
    out = copy.deepcopy(schema)
    _upgrade_node(out)
    _rewrite_refs(out, {"#/definitions": "#/$defs"})
    out["$schema"] = DIALECT_2020
    return out


_LEGACY_MARKERS = ("definitions", "additionalItems", "dependencies", "id",
                   "extends", "disallow", "divisibleBy")


def needs_upgrade(schema: Union[dict, bool]) -> bool:
    if not isinstance(schema, dict):
        return False
    dialect = schema.get("$schema", "")
    if dialect and "2020-12" not in dialect:
        return True

    def scan(node) -> bool:
        if isinstance(node, dict):
            if any(k in node for k in _LEGACY_MARKERS) or isinstance(node.get("items"), list) \
               or isinstance(node.get("exclusiveMinimum"), bool) or isinstance(node.get("exclusiveMaximum"), bool):
                return True
            return any(scan(v) for v in node.values())
        if isinstance(node, list):
            return any(scan(x) for x in node)
        return False

    return scan(schema)
