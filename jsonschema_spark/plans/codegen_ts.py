"""Schema → TypeScript type emission — the `jsonschema codegen --target
typescript` analogue (/root/reference/src/command_codegen.cc,
/root/reference/vendor/blaze/src/codegen/codegen_typescript.cc,
codegen_mangle.cc; golden scripts /root/reference/test/codegen/
pass_typescript*.sh, byte-matched in tests/test_codegen_ts.py).

Shape rules, matching the reference emitter:
- every subschema becomes one `export type` / `export interface`
  declaration, named by PascalCase-mangling the property path under the
  root name (``PersonAddressStreet``); name collisions get `_` prefixes
  (that is why a $ref'd object interface is `_PersonAddress` while the
  referencing alias keeps `PersonAddress`);
- property names are always double-quoted; optional (non-required) members
  get `?`, `readOnly: true` members get `readonly`;
- `additionalProperties` absent/true → `[key: string]: unknown |
  undefined;`, typed → the documented union-supertype index signature,
  memberless objects collapse to `Record<...>`;
- unsupported keywords raise :class:`CodegenUnsupportedError` carrying the
  keyword + JSON-pointer location, mirroring the reference's exit-3
  diagnostics (test/codegen/fail_unsupported_keyword.sh).
"""

from __future__ import annotations

import json
from typing import Union

_COMMON_KWS = frozenset({
    "$schema", "$id", "$anchor", "$dynamicAnchor", "$defs", "$vocabulary",
    "type", "title", "description", "default", "deprecated", "readOnly",
    "writeOnly", "examples", "$comment",
})
_WHITELIST = {
    "string": _COMMON_KWS | {"minLength", "maxLength", "pattern", "format",
                             "contentEncoding", "contentMediaType", "contentSchema"},
    "number": _COMMON_KWS | {"minimum", "maximum", "exclusiveMinimum",
                             "exclusiveMaximum", "multipleOf"},
    "integer": _COMMON_KWS | {"minimum", "maximum", "exclusiveMinimum",
                              "exclusiveMaximum", "multipleOf"},
    "boolean": _COMMON_KWS,
    "null": _COMMON_KWS,
    "object": _COMMON_KWS | {"properties", "required", "additionalProperties",
                             "minProperties", "maxProperties", "propertyNames",
                             "patternProperties"},
    "array": _COMMON_KWS | {"items", "prefixItems", "minItems", "maxItems",
                            "uniqueItems", "contains", "minContains", "maxContains"},
    "enum": _COMMON_KWS | {"enum", "const"},
    "ref": _COMMON_KWS | {"$ref"},
    "any": _COMMON_KWS,
}
_SCALARS = {"string": "string", "integer": "number", "number": "number",
            "boolean": "boolean", "null": "null"}


class CodegenUnsupportedError(ValueError):
    """codegen cannot express this subschema (reference exit code 3)."""

    def __init__(self, message: str, keyword: str, location: str):
        super().__init__(f"{message}\n  at keyword {keyword}\n"
                         f"  at document location \"{location}\"")
        self.message = message
        self.keyword = keyword
        self.location = location


def _symbol_to_identifier(prefix: str, symbol: list[str]) -> str:
    """Port of codegen_mangle.cc:symbol_to_identifier — word-start
    capitalization, digits prefixed with `_` at segment start, `_`/`$`
    kept, all other characters split words."""
    result = prefix
    for segment in symbol:
        at_word_start = True
        at_segment_start = True
        for ch in segment:
            if ch.isascii() and ch.isalpha():
                result += ch.upper() if at_word_start else ch
                at_word_start = at_segment_start = False
            elif ch.isascii() and ch.isdigit():
                if at_segment_start:
                    result += "_"
                result += ch
                at_word_start = at_segment_start = False
            elif ch in "_$":
                result += ch
                at_word_start = at_segment_start = False
            else:
                at_word_start = True
    if not result:
        return "_"
    if result[0].isdigit():
        result = "_" + result
    return result


def _escape_member(name: str) -> str:
    out = []
    for ch in name:
        if ch == "\\":
            out.append("\\\\")
        elif ch == '"':
            out.append('\\"')
        elif ch in "\b\f\n\r\t":
            out.append({"\b": "\\b", "\f": "\\f", "\n": "\\n",
                        "\r": "\\r", "\t": "\\t"}[ch])
        elif ord(ch) < 0x20:
            out.append(f"\\u{ord(ch):04x}")
        else:
            out.append(ch)
    return "".join(out)


def _ptr_str(pointer: tuple) -> str:
    if pointer and pointer[0].startswith("\x00"):
        return ""  # location inside an externally-resolved document
    return "".join(f"/{seg}" for seg in pointer)


class _Emitter:
    def __init__(self, prefix: str, resolver: dict | None):
        self.prefix = prefix
        self.resolver = resolver or {}
        self.cache: dict[str, tuple] = {}
        self.by_pointer: dict[tuple, str] = {}
        self.decls: list[str] = []
        self.emitted: set[tuple] = set()

    def mangle(self, pointer: tuple, symbol: list[str]) -> str:
        # one name per pointer: a second $ref to the same target must
        # reuse the name its declaration was emitted under, not mint a
        # fresh (never-declared) alias from its own symbol path
        if pointer in self.by_pointer:
            return self.by_pointer[pointer]
        name = _symbol_to_identifier(self.prefix, symbol)
        while True:
            if name in self.cache:
                if self.cache[name] == pointer:
                    return name
                name = "_" + name
            else:
                self.cache[name] = pointer
                self.by_pointer[pointer] = name
                return name

    def _check(self, schema: dict, kind: str, pointer: tuple) -> None:
        allowed = _WHITELIST[kind]
        for kw in schema:
            if kw not in allowed:
                raise CodegenUnsupportedError("Unsupported keyword in subschema",
                                              kw, _ptr_str(pointer))

    def emit(self, schema: Union[dict, bool], pointer: tuple,
             symbol: list[str]) -> str:
        name = self.mangle(pointer, symbol)
        if pointer in self.emitted:
            return name
        self.emitted.add(pointer)

        if schema is False:
            self.decls.append(f"export type {name} = never;")
            return name
        if schema is True or schema == {}:
            self.decls.append(f"export type {name} = unknown;")
            return name
        if not isinstance(schema, dict):
            raise CodegenUnsupportedError("Expected a schema", "?", _ptr_str(pointer))

        if "$ref" in schema:
            self._check(schema, "ref", pointer)
            target_schema, target_pointer = self._resolve(schema["$ref"], pointer)
            target_name = self.mangle(target_pointer, symbol)
            self.decls.append(f"export type {name} = {target_name};")
            self.emit(target_schema, target_pointer, symbol)
            return name

        if "enum" in schema or "const" in schema:
            self._check(schema, "enum", pointer)
            values = schema["enum"] if "enum" in schema else [schema["const"]]
            union = " | ".join(json.dumps(v, ensure_ascii=False) for v in values)
            self.decls.append(f"export type {name} = {union};")
            return name

        t = schema.get("type")
        if t is None:
            self._check(schema, "any", pointer)
            self.decls.append(f"export type {name} = unknown;")
            return name
        if not isinstance(t, str):
            raise CodegenUnsupportedError("Expected a string value", "type",
                                          _ptr_str(pointer))

        if t in _SCALARS:
            self._check(schema, t, pointer)
            self.decls.append(f"export type {name} = {_SCALARS[t]};")
            return name

        if t == "array":
            self._check(schema, "array", pointer)
            prefix_items = schema.get("prefixItems")
            if isinstance(prefix_items, list) and prefix_items:
                parts = [
                    self.mangle(pointer + ("prefixItems", str(i)), symbol + [f"item{i}"])
                    for i in range(len(prefix_items))
                ]
                self.decls.append(f"export type {name} = [{', '.join(parts)}];")
                for i, sub in enumerate(prefix_items):
                    self.emit(sub, pointer + ("prefixItems", str(i)), symbol + [f"item{i}"])
                return name
            items = schema.get("items")
            if items is None or items is True or items == {}:
                self.decls.append(f"export type {name} = unknown[];")
                return name
            item_name = self.mangle(pointer + ("items",), symbol + ["items"])
            self.decls.append(f"export type {name} = {item_name}[];")
            self.emit(items, pointer + ("items",), symbol + ["items"])
            return name

        if t == "object":
            self._check(schema, "object", pointer)
            return self._emit_object(schema, pointer, symbol, name)

        raise CodegenUnsupportedError("Unsupported keyword value", "type",
                                      _ptr_str(pointer))

    def _resolve(self, ref: str, pointer: tuple):
        if ref.startswith("#"):
            raise CodegenUnsupportedError("Unsupported keyword in subschema",
                                          "$ref", _ptr_str(pointer))
        doc = self.resolver.get(ref)
        if doc is None:
            raise CodegenUnsupportedError("Could not resolve reference", "$ref",
                                          _ptr_str(pointer))
        # synthetic pointer namespace so two refs to one target share a block
        return doc, ("\x00ref", ref)

    def _emit_object(self, schema: dict, pointer: tuple, symbol: list[str],
                     name: str) -> str:
        props = schema.get("properties", {}) or {}
        required = set(schema.get("required", []) or [])
        pats = schema.get("patternProperties", {}) or {}
        ap = schema.get("additionalProperties")

        member_names = {}
        for prop, sub in props.items():
            member_names[prop] = self.emit(
                sub, pointer + ("properties", prop), symbol + [prop])

        pat_entries = []  # (pattern, prefix-or-None, mangled name)
        for pat, sub in pats.items():
            pname = self.emit(sub, pointer + ("patternProperties", pat),
                              symbol + [pat])
            prefix = None
            if pat.startswith("^"):
                body = pat[1:]
                if body and not any(c in ".^$*+?()[]{}|\\" for c in body):
                    prefix = body
            pat_entries.append((pat, prefix, pname))

        typed_additional = False
        additional_name = None
        if isinstance(ap, dict):
            additional_name = self.emit(
                ap, pointer + ("additionalProperties",),
                symbol + ["additionalProperties"])
            typed_additional = True
        allows_any = ap is None or ap is True

        if typed_additional and not props and not pat_entries:
            self.decls.append(
                f"export type {name} = Record<string, {additional_name}>;")
            return name
        if allows_any and not props and not pat_entries:
            self.decls.append(f"export type {name} = Record<string, unknown>;")
            return name

        lines = [f"export interface {name} {{"]
        for prop in props:
            opt = "" if prop in required else "?"
            ro = "readonly " if isinstance(props[prop], dict) and \
                props[prop].get("readOnly") is True else ""
            lines.append(f'  {ro}"{_escape_member(prop)}"{opt}: {member_names[prop]};')
        for pat, prefix, pname in pat_entries:
            if prefix is None:
                continue
            sig = f"  [key: `{prefix}${{string}}`]: {pname}"
            for other_pat, other_prefix, other_name in pat_entries:
                if other_pat == pat or other_prefix is None:
                    continue
                if prefix.startswith(other_prefix):
                    sig += f" & {other_name}"
            lines.append(sig + ";")
        has_non_prefix_pattern = any(p is None for _, p, _ in pat_entries)
        if allows_any:
            lines.append("  [key: string]: unknown | undefined;")
        elif typed_additional or has_non_prefix_pattern:
            lines.append("  [key: string]:")
            lines.append("    // As a notable limitation, TypeScript requires index signatures")
            lines.append("    // to also include the types of all of its properties, so we must")
            lines.append("    // match a superset of what JSON Schema allows")
            for prop in props:
                lines.append(f"    {member_names[prop]} |")
            for _, _, pname in pat_entries:
                lines.append(f"    {pname} |")
            if typed_additional:
                lines.append(f"    {additional_name} |")
            lines.append("    undefined;")
        lines.append("}")
        self.decls.append("\n".join(lines))
        return name


def typescript(schema: Union[dict, bool], name: str = "Schema",
               resolver: dict | None = None) -> str:
    """Emit TypeScript declarations for ``schema``; ``resolver`` maps $ref
    URIs/relative paths to their schema documents. Output byte-matches the
    reference golden scripts (test/codegen/pass_typescript*.sh)."""
    emitter = _Emitter(name, resolver)
    emitter.emit(schema, (), [])
    return "\n\n".join(emitter.decls) + "\n"
