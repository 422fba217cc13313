"""Driver-side schema compiler: JSON Schema → Spark Column expressions.

The reference compiles a schema into an instruction tree interpreted one
instance at a time (/root/reference/vendor/blaze/src/compiler/compile.cc:202-497).
We compile the same keyword semantics into *columnar* predicates: each
keyword yields a boolean `ok` Column plus (in exhaustive mode) a violation
array Column, composed bottom-up through the logical applicators. Catalyst
then handles pushdown/pruning/codegen — no custom rules needed (SURVEY.md §4).

Compile-time rewrites mirrored from the reference's postprocess pass
(/root/reference/vendor/blaze/src/compiler/postprocess.h:393-630):
- `$ref` inlining (always — the analogue of jump inlining; cycles rejected)
- static type folding: on typed flat columns, `type` assertions and type
  guards constant-fold to True/False at compile time (the analogue of the
  fused `AssertionPropertyType*` instructions)
- dead-code elimination: statically-true checks vanish from the plan
- short-circuit conjunction: violation reporting follows the reference's
  LogicalAnd first-failure semantics (evaluator_dispatch.h:1254-1267) —
  the first failing child's errors are reported, then the parent's own entry
  (golden shape: /root/reference/test/validate/fail_json.sh)

Evaluation state the reference tracks per-instance (evaluate_path,
instance_location — evaluator.h:217-276) is static here: keyword locations
are compile-time strings; instance locations are strings except inside
array loops, where they are built with `concat(loc, '/', i)`.

Violation rows follow the standard Basic output shape
(/root/reference/vendor/blaze/src/output/output_standard.cc:47-100).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional, Union

from pyspark.sql import Column, functions as F, types as T

from jsonschema_spark.functions.formats import FORMATS, format_ok
from jsonschema_spark.functions.numeric import divisible_ok
from jsonschema_spark.functions.strings import pattern_ok
from jsonschema_spark.plans import messages as M
from jsonschema_spark.plans.context import (
    B,
    Cond,
    Ctx,
    FlatColCtx,
    FlatRowCtx,
    VariantCtx,
    and_,
    not_,
    or_,
)

VIOL_FIELDS = "keywordLocation:string,absoluteKeywordLocation:string,instanceLocation:string,error:string"
VIOL_STRUCT_DT = f"struct<{VIOL_FIELDS}>"
VIOLS_DT = f"array<{VIOL_STRUCT_DT}>"


def empty_viols() -> Column:
    return F.array().cast(VIOLS_DT)


class SchemaError(ValueError):
    pass


@dataclass
class Compiled:
    """Result of compiling one schema node against a context."""

    ok: Cond
    viols: Optional[Column] = None  # None ⇔ statically no violations

    def viols_col(self) -> Column:
        return self.viols if self.viols is not None else empty_viols()


@dataclass
class Config:
    base_uri: str = ""
    mode: str = "exhaustive"  # 'fast' skips violation building entirely
    format_assertion: bool = True
    root: dict | bool = True
    # True  = reference LogicalAnd semantics: report only the first failing
    #         conjunct's violations (evaluator_dispatch.h:1254-1267)
    # False = report every failing conjunct (SQL-oracle-friendly mode)
    short_circuit: bool = True
    # uri → schema dict registry for external $ref (the bundle/resolver
    # analogue, /root/reference/src/resolver.h); local-only when None
    resolver: Optional[dict] = None
    # Recursive $ref unroll budget (the reference's inline-threshold
    # analogue, compile.cc:268-348 / compiler.h:98-99). A self-recursive
    # target is inlined up to this depth; instances whose data nests
    # DEEPER than the unrolled plan fail with a depth-exceeded violation
    # (conservative-reject, never a silent pass). On the flat path the
    # static column schema usually terminates recursion earlier: a
    # statically-absent child compiles to a constant pass (dead-code
    # elimination, postprocess.h:26-55 analogue).
    max_ref_depth: int = 6
    # --trace sink: when set, compile_node appends (keywordLocation,
    # instanceLocation, ok Cond) per keyword instruction in evaluation
    # order. Internal fast-mode recompiles (not/if conditions, branch-ok
    # gates) intentionally DROP the sink — only the primary plan traces.
    trace_sink: Optional[list] = None
    # Static dynamic scope: the chain of (resource, base_uri) pairs entered
    # along the current compile path, outermost first (the reference's
    # runtime resource stack, evaluator.h — statically known here because
    # every reference is inlined). Empty ⇔ just the root resource. The URI
    # rides along so a $dynamicRef that wins in an OUTER resource compiles
    # its target under THAT resource's root/base (fragment $refs inside the
    # target resolve against the right document).
    dynamic_scope: tuple = ()
    # Parser-grade idn-hostname/idn-email/iri validation via pandas UDF
    # (functions/formats.py:format_ok_strict); False = pure-JVM regex
    # approximations (the documented default — oracle-expressible)
    format_strict: bool = False

    @property
    def want_viols(self) -> bool:
        return self.mode != "fast"

    def fast(self) -> "Config":
        return Config(self.base_uri, "fast", self.format_assertion, self.root,
                      self.short_circuit, self.resolver, self.max_ref_depth,
                      dynamic_scope=self.dynamic_scope,
                      format_strict=self.format_strict)

    def with_root(self, root, base_uri: str) -> "Config":
        scope = self.dynamic_scope or ((self.root, self.base_uri),)
        return Config(base_uri, self.mode, self.format_assertion, root,
                      self.short_circuit, self.resolver, self.max_ref_depth,
                      self.trace_sink, scope + ((root, base_uri),), self.format_strict)


def _viol(cfg: Config, kw: str, loc: Union[str, Column], error: Column) -> Column:
    loc_col = F.lit(loc) if isinstance(loc, str) else loc
    return F.array(
        F.struct(
            F.lit(kw).alias("keywordLocation"),
            F.lit(f"{cfg.base_uri}#{kw}").alias("absoluteKeywordLocation"),
            loc_col.alias("instanceLocation"),
            error.alias("error"),
        )
    ).cast(VIOLS_DT)


def _leaf(cfg: Config, cond: Cond, kw: str, ctx: Ctx, error_builder) -> Compiled:
    """A leaf assertion: violation iff cond is false."""
    if cond is True:
        return Compiled(True)
    if not cfg.want_viols:
        return Compiled(cond)
    err = error_builder()
    v = _viol(cfg, kw, ctx.loc, err)
    if cond is False:
        return Compiled(False, v)
    return Compiled(cond, F.when(B(cond), empty_viols()).otherwise(v))


def _guarded(guard: Cond, inner: Compiled, cfg: Config) -> Compiled:
    """Apply a type/presence precondition: if guard fails, vacuous pass
    (EVALUATE_BEGIN precondition-skip, evaluator_dispatch.h:71-123)."""
    if guard is True:
        return inner
    if guard is False or inner.ok is True:
        return Compiled(True)
    ok = or_(not_(guard), inner.ok)
    if not cfg.want_viols or inner.viols is None:
        return Compiled(ok)
    return Compiled(ok, F.when(B(guard), inner.viols).otherwise(empty_viols()))


def _and_combine(parts: list[Compiled], cfg: Config, own: Optional[tuple] = None) -> Compiled:
    """Conjunction with reference short-circuit violation semantics: report
    the first failing part's violations (plus the parent's own entry when
    `own=(kw, ctx, error_builder)` is given)."""
    live = [p for p in parts if p.ok is not True]
    ok = and_(*[p.ok for p in live])
    if ok is True:
        return Compiled(True)
    if not cfg.want_viols:
        return Compiled(ok)
    own_v = None
    if own is not None:
        kw, ctx, error_builder = own
        own_v = _viol(cfg, kw, ctx.loc, error_builder())

    def with_own(v: Column) -> Column:
        return F.concat(v, own_v) if own_v is not None else v

    if not cfg.short_circuit:
        parts_v = [
            F.when(not_(B(p.ok)), p.viols_col()).otherwise(empty_viols()) for p in live
        ]
        allv = F.concat(*parts_v) if len(parts_v) > 1 else parts_v[0]
        viols = F.when(B(ok), empty_viols()).otherwise(with_own(allv))
        return Compiled(ok, viols)

    chain = None
    for p in live:
        fail = not_(B(p.ok))
        v = with_own(p.viols_col())
        chain = F.when(fail, v) if chain is None else chain.when(fail, v)
    viols = chain.otherwise(empty_viols())
    return Compiled(ok, viols)


# ---------------------------------------------------------------------------
# Keyword ordering — deterministic walker order (documented; the reference's
# exact walker order lives in sourcemeta::core::SchemaWalker)
# ---------------------------------------------------------------------------

_KEYWORD_ORDER = [
    "$ref",
    "$dynamicRef",
    "$recursiveRef",
    "type",
    "const",
    "enum",
    "required",
    "dependentRequired",
    "minProperties",
    "maxProperties",
    "properties",
    "patternProperties",
    "additionalProperties",
    "propertyNames",
    "dependentSchemas",
    "minItems",
    "maxItems",
    "uniqueItems",
    "prefixItems",
    "items",
    "contains",
    "minLength",
    "maxLength",
    "pattern",
    "format",
    "minimum",
    "maximum",
    "exclusiveMinimum",
    "exclusiveMaximum",
    "multipleOf",
    "allOf",
    "anyOf",
    "oneOf",
    "not",
    "if",
    # evaluated after every other applicator, like the reference
    "unevaluatedProperties",
    "unevaluatedItems",
]

# Dynamic-scope reference keywords (ControlDynamicAnchorJump,
# dispatch.h:1523-1549). The reference resolves these against a RUNTIME
# resource stack; because this compiler inlines every reference, the
# dynamic scope at each compile point is statically known
# (Config.dynamic_scope), so the full cross-resource semantics resolve at
# compile time:
#   $dynamicRef: "#frag" → initial resolution in the current resource;
#     if the target carries $dynamicAnchor "frag", the OUTERMOST resource
#     in the scope chain declaring that $dynamicAnchor wins (2020-12
#     core §8.2.3.2); otherwise plain-$anchor behavior.
#   $recursiveRef: "#"  → current resource root, unless it sets
#     $recursiveAnchor: true, in which case the outermost resource with
#     $recursiveAnchor: true wins (2019-09 semantics).
_DYNAMIC_KEYWORDS = ("$dynamicRef", "$recursiveRef")


def _resource_anchors(root, name: str, dynamic_only: bool):
    """Anchors named ``name`` within ONE schema resource — the walk stops
    at embedded `$id` boundaries (an embedded resource's anchors belong to
    that resource, not its host)."""
    hits = []

    def walk(n, is_root):
        if isinstance(n, dict):
            if not is_root and isinstance(n.get("$id"), str):
                return
            if n.get("$dynamicAnchor") == name or (
                not dynamic_only and n.get("$anchor") == name
            ):
                hits.append(n)
            for v in n.values():
                walk(v, False)
        elif isinstance(n, list):
            for x in n:
                walk(x, False)

    walk(root, True)
    return hits


def _resolve_dynamic_ref(key: str, val, cfg: Config):
    """Static resolution of $dynamicRef/$recursiveRef against the
    compile-time dynamic scope (outermost resource first). Returns
    ``(target_node, owning_resource, owning_base_uri)`` so the caller can
    compile the target under the WINNING resource's root/base — fragment
    $refs inside a cross-resource dynamic target must resolve against the
    document that declared the anchor, not the referencing one."""
    scope = cfg.dynamic_scope or ((cfg.root, cfg.base_uri),)
    if key == "$recursiveRef":
        if val != "#":
            raise SchemaError(f"$recursiveRef must be '#', got {val!r}")
        if isinstance(cfg.root, dict) and cfg.root.get("$recursiveAnchor") is True:
            for res, uri in scope:
                if isinstance(res, dict) and res.get("$recursiveAnchor") is True:
                    return res, res, uri
        return cfg.root, cfg.root, cfg.base_uri
    if not (isinstance(val, str) and val.startswith("#") and not val.startswith("#/")):
        raise SchemaError(
            f"$dynamicRef with non-fragment or pointer target {val!r} requires "
            "runtime dynamic-scope resolution — unsupported"
        )
    name = val[1:]
    initial = _resource_anchors(cfg.root, name, dynamic_only=False)
    if len(initial) != 1:
        raise SchemaError(
            f"$dynamicRef {val!r} needs exactly one in-document anchor for "
            f"static resolution (found {len(initial)})"
        )
    target = initial[0]
    if isinstance(target, dict) and target.get("$dynamicAnchor") == name:
        for res, uri in scope:  # outermost-first: the defining property of dynamic scope
            hits = _resource_anchors(res, name, dynamic_only=True)
            if len(hits) > 1:
                raise SchemaError(
                    f"$dynamicRef {val!r} needs exactly one anchor per resource "
                    f"(found {len(hits)})"
                )
            if hits:
                return hits[0], res, uri
    return target, cfg.root, cfg.base_uri

_TYPE_NAMES = {"null", "boolean", "integer", "number", "string", "array", "object"}


def _ptr_escape(token: str) -> str:
    return token.replace("~", "~0").replace("/", "~1")


def _walk_pointer(root, pointer: str, ref: str):
    node: Union[dict, bool, list] = root
    if pointer:
        for raw in pointer.lstrip("/").split("/"):
            token = raw.replace("~1", "/").replace("~0", "~")
            if isinstance(node, dict) and token in node:
                node = node[token]
            elif isinstance(node, list) and token.isdigit():
                node = node[int(token)]
            else:
                raise SchemaError(f"cannot resolve $ref {ref}")
    return node


def _find_anchor(node, name: str):
    if isinstance(node, dict):
        if node.get("$anchor") == name:
            return node
        for v in node.values():
            hit = _find_anchor(v, name)
            if hit is not None:
                return hit
    elif isinstance(node, list):
        for x in node:
            hit = _find_anchor(x, name)
            if hit is not None:
                return hit
    return None


def _collect_embedded_resources(node, base: str, out: dict, is_root: bool = True) -> None:
    """uri → subschema for every embedded `$id` resource (nested scopes
    compose: an inner $id resolves against its enclosing base). Walks
    SCHEMA positions only — const/enum data values are never resources."""
    from urllib.parse import urljoin

    from jsonschema_spark.plans.upgrade import _SCHEMA_LISTS, _SCHEMA_MAPS, _SCHEMA_VALUES

    if not isinstance(node, dict):
        return
    sid = node.get("$id")
    if isinstance(sid, str) and not is_root:
        base = urljoin(base or "", sid)
        out.setdefault(base, node)
    for key in _SCHEMA_MAPS:
        if isinstance(node.get(key), dict):
            for sub in node[key].values():
                _collect_embedded_resources(sub, base, out, False)
    for key in _SCHEMA_VALUES:
        v = node.get(key)
        if isinstance(v, dict):
            _collect_embedded_resources(v, base, out, False)
        elif isinstance(v, list):
            for x in v:
                _collect_embedded_resources(x, base, out, False)
    for key in _SCHEMA_LISTS:
        if isinstance(node.get(key), list):
            for x in node[key]:
                _collect_embedded_resources(x, base, out, False)


def _resolve_ref(ref: str, cfg: Config) -> tuple[dict | bool, Config]:
    """Resolve a `$ref`: same-document fragments directly — JSON Pointers
    (`#/...`) or `$anchor` names (`#name`); absolute URIs through the
    resolver registry (the bundle/remote-resolution analogue — the target
    document becomes the new resolution root, so its own fragments
    resolve within it)."""
    if ref.startswith("#"):
        fragment = ref[1:]
        if fragment and not fragment.startswith("/"):
            hit = _find_anchor(cfg.root, fragment)
            if hit is None:
                raise SchemaError(f"cannot resolve $anchor reference {ref}")
            return hit, cfg
        return _walk_pointer(cfg.root, fragment, ref), cfg
    uri, _, fragment = ref.partition("#")
    registry = cfg.resolver or {}
    target = registry.get(uri)
    if target is None and cfg.base_uri:
        # relative reference against the base URI
        from urllib.parse import urljoin

        absolute = urljoin(cfg.base_uri, uri)
        target = registry.get(absolute)
        uri = absolute if target is not None else uri
    if target is None:
        raise SchemaError(f"external $ref not in resolver registry: {ref}")
    node = _walk_pointer(target, fragment, ref)
    return node, cfg.with_root(target, uri)


def compile_node(
    schema: Union[dict, bool],
    ctx: Ctx,
    kw: str,
    cfg: Config,
    ref_stack: tuple = (),
) -> Compiled:
    """Compile one (sub)schema against a context. Assumes the value exists;
    presence gating happens at the application site."""
    if schema is True or schema == {}:
        return Compiled(True)
    if schema is False:
        return _leaf(cfg, False, kw, ctx, M.msg_false_schema)
    if not isinstance(schema, dict):
        raise SchemaError(f"invalid schema node at {kw or '<root>'}")
    # Embedded schema resource: a non-root `$id` opens a new resolution
    # scope — fragment refs/anchors inside it resolve against THIS
    # subdocument, and relative URIs against its (base-resolved) $id.
    # (The reference frames every resource; SchemaFrame, frame.h:38-60.)
    sid = schema.get("$id")
    if isinstance(sid, str) and schema is not cfg.root:
        from urllib.parse import urljoin

        cfg = cfg.with_root(schema, urljoin(cfg.base_uri or "", sid))

    parts: list[Compiled] = []
    present_keys = [k for k in _KEYWORD_ORDER if k in schema]

    for key in present_keys:
        val = schema[key]
        kwp = f"{kw}/{_ptr_escape(key)}"
        _n_before = len(parts)
        if key == "$ref":
            target, sub_cfg = _resolve_ref(val, cfg)
            ref_key = (cfg.base_uri, val)
            if ref_stack.count(ref_key) >= cfg.max_ref_depth:
                # recursion budget exhausted: data nesting deeper than the
                # unrolled plan is conservatively REJECTED (documented
                # limit; shallower data is validated exactly)
                parts.append(
                    _leaf(cfg, False, kwp, ctx,
                          lambda d=cfg.max_ref_depth: M.msg_ref_depth(d))
                )
            else:
                sub = compile_node(target, ctx, kwp, sub_cfg, ref_stack + (ref_key,))
                if sub.ok is not True:
                    parts.append(
                        _and_combine([sub], cfg, own=(kwp, ctx, lambda c=ctx: M.msg_ref(c)))
                    )
        elif key in _DYNAMIC_KEYWORDS:
            target, res, res_uri = _resolve_dynamic_ref(key, val, cfg)
            sub_cfg = cfg if res is cfg.root else cfg.with_root(res, res_uri)
            ref_key = (cfg.base_uri, f"{key}:{val}")
            if ref_stack.count(ref_key) >= cfg.max_ref_depth:
                parts.append(
                    _leaf(cfg, False, kwp, ctx,
                          lambda d=cfg.max_ref_depth: M.msg_ref_depth(d))
                )
            else:
                sub = compile_node(target, ctx, kwp, sub_cfg, ref_stack + (ref_key,))
                if sub.ok is not True:
                    parts.append(
                        _and_combine([sub], cfg, own=(kwp, ctx, lambda c=ctx: M.msg_ref(c)))
                    )
        elif key == "type":
            parts.append(_k_type(val, ctx, kwp, cfg))
        elif key == "const":
            parts.append(_leaf(cfg, ctx.eq_const(val), kwp, ctx, lambda c=ctx, v=val: M.msg_const(c, v)))
        elif key == "enum":
            parts.append(_k_enum(val, ctx, kwp, cfg))
        elif key == "required":
            parts.append(_k_required(val, ctx, kwp, cfg))
        elif key == "dependentRequired":
            parts.append(_k_dependent_required(val, ctx, kwp, cfg))
        elif key == "minProperties":
            g = ctx.is_type("object")
            parts.append(_guarded(g, _leaf(cfg, ctx.obj_size() >= val, kwp, ctx, lambda c=ctx, v=val: M.msg_min_properties(c, v)), cfg))
        elif key == "maxProperties":
            g = ctx.is_type("object")
            parts.append(_guarded(g, _leaf(cfg, ctx.obj_size() <= val, kwp, ctx, lambda c=ctx, v=val: M.msg_max_properties(c, v)), cfg))
        elif key == "properties":
            parts.append(_k_properties(val, ctx, kwp, cfg, ref_stack))
        elif key == "patternProperties":
            parts.append(_k_pattern_properties(val, ctx, kwp, cfg, ref_stack))
        elif key == "additionalProperties":
            parts.append(_k_additional_properties(schema, val, ctx, kwp, cfg, ref_stack))
        elif key == "propertyNames":
            parts.append(_k_property_names(val, ctx, kwp, cfg, ref_stack))
        elif key == "dependentSchemas":
            parts.append(_k_dependent_schemas(val, ctx, kwp, cfg, ref_stack))
        elif key == "minItems":
            g = ctx.is_type("array")
            parts.append(_guarded(g, _leaf(cfg, ctx.arr_size() >= val, kwp, ctx, lambda c=ctx, v=val: M.msg_min_items(c, v)), cfg))
        elif key == "maxItems":
            g = ctx.is_type("array")
            parts.append(_guarded(g, _leaf(cfg, ctx.arr_size() <= val, kwp, ctx, lambda c=ctx, v=val: M.msg_max_items(c, v)), cfg))
        elif key == "uniqueItems":
            if val:
                parts.append(_k_unique_items(ctx, kwp, cfg))
        elif key == "prefixItems":
            parts.append(_k_prefix_items(val, ctx, kwp, cfg, ref_stack))
        elif key == "items":
            if isinstance(val, list):  # draft-7 tuple form
                parts.append(_k_prefix_items(val, ctx, kwp, cfg, ref_stack))
            else:
                start = len(schema.get("prefixItems", [])) if isinstance(schema.get("prefixItems"), list) else 0
                parts.append(_k_items(val, ctx, kwp, cfg, start, ref_stack))
        elif key == "contains":
            parts.append(_k_contains(schema, val, ctx, kwp, cfg, ref_stack))
        elif key == "minLength":
            g = ctx.is_type("string")
            parts.append(_guarded(g, _leaf(cfg, F.length(ctx.str_val()) >= val, kwp, ctx, lambda c=ctx, v=val: M.msg_min_length(c, v)), cfg))
        elif key == "maxLength":
            g = ctx.is_type("string")
            parts.append(_guarded(g, _leaf(cfg, F.length(ctx.str_val()) <= val, kwp, ctx, lambda c=ctx, v=val: M.msg_max_length(c, v)), cfg))
        elif key == "pattern":
            g = ctx.is_type("string")
            parts.append(_guarded(g, _leaf(cfg, pattern_ok(ctx.str_val(), val), kwp, ctx, lambda c=ctx, v=val: M.msg_regex(c, v)), cfg))
        elif key == "format":
            if cfg.format_assertion and val in FORMATS:
                if cfg.format_strict:
                    from jsonschema_spark.functions.formats import format_ok_strict as _fmt_build
                else:
                    _fmt_build = format_ok
                g = ctx.is_type("string")
                parts.append(_guarded(g, _leaf(cfg, _fmt_build(val, ctx.str_val()), kwp, ctx, lambda c=ctx, v=val: M.msg_format(c, v)), cfg))
        elif key == "minimum":
            g = ctx.is_type("number")
            parts.append(_guarded(g, _leaf(cfg, ctx.num_val() >= float(val), kwp, ctx, lambda c=ctx, v=val: M.msg_greater_equal(c, v)), cfg))
        elif key == "maximum":
            g = ctx.is_type("number")
            parts.append(_guarded(g, _leaf(cfg, ctx.num_val() <= float(val), kwp, ctx, lambda c=ctx, v=val: M.msg_less_equal(c, v)), cfg))
        elif key == "exclusiveMinimum":
            g = ctx.is_type("number")
            parts.append(_guarded(g, _leaf(cfg, ctx.num_val() > float(val), kwp, ctx, lambda c=ctx, v=val: M.msg_greater(c, v)), cfg))
        elif key == "exclusiveMaximum":
            g = ctx.is_type("number")
            parts.append(_guarded(g, _leaf(cfg, ctx.num_val() < float(val), kwp, ctx, lambda c=ctx, v=val: M.msg_less(c, v)), cfg))
        elif key == "multipleOf":
            g = ctx.is_type("number")
            tag = ctx.tag()
            is_int_col = tag == "integer" if isinstance(tag, str) else False
            parts.append(_guarded(g, _leaf(cfg, divisible_ok(ctx.num_val(), val, is_int_col), kwp, ctx, lambda c=ctx, v=val: M.msg_multiple_of(c, v)), cfg))
        elif key == "allOf":
            parts.append(_k_all_of(val, ctx, kwp, cfg, ref_stack))
        elif key == "anyOf":
            parts.append(_k_any_of(val, ctx, kwp, cfg, ref_stack))
        elif key == "oneOf":
            parts.append(_k_one_of(val, ctx, kwp, cfg, ref_stack))
        elif key == "not":
            parts.append(_k_not(val, ctx, kwp, cfg, ref_stack))
        elif key == "if":
            parts.append(_k_conditional(schema, ctx, kw, cfg, ref_stack))
        elif key == "unevaluatedProperties":
            parts.append(_k_unevaluated_properties(schema, val, ctx, kwp, cfg, ref_stack))
        elif key == "unevaluatedItems":
            parts.append(_k_unevaluated_items(schema, val, ctx, kwp, cfg, ref_stack))
        # --trace analogue: record each keyword instruction's location and
        # verdict in evaluation order (Pre/Post log, output_trace.cc).
        # Only STATIC instance locations are recordable: compiles inside
        # higher-order-function lambdas (per-element/per-key loops) build
        # Columns bound to lambda variables that cannot be referenced
        # outside the loop — their parent applicator entry still traces.
        if (
            cfg.trace_sink is not None
            and len(parts) > _n_before
            and isinstance(ctx.loc, str)
        ):
            cfg.trace_sink.append((kwp, ctx.loc, parts[-1].ok))

    # §2.7 extension hook: registered custom keyword compilers (the
    # Compiler std::function analogue, compiler.h:77-80) run after the
    # built-in dispatch, composing into the same conjunction
    from jsonschema_spark.plans.registry import KEYWORD_COMPILERS

    for key, spec in KEYWORD_COMPILERS.items():
        if key in schema and key not in _KEYWORD_ORDER:
            kwp = f"{kw}/{_ptr_escape(key)}"
            cond = spec.build(schema[key], ctx)
            leaf = _leaf(cfg, cond, kwp, ctx,
                         lambda c=ctx, v=schema[key], s=spec: s.message(c, v))
            if spec.type_guard:
                leaf = _guarded(ctx.is_type(spec.type_guard), leaf, cfg)
            parts.append(leaf)

    return _and_combine(parts, cfg)


# --- individual keywords -----------------------------------------------------


def _k_type(val, ctx: Ctx, kwp: str, cfg: Config) -> Compiled:
    types = [val] if isinstance(val, str) else list(val)
    for t in types:
        if not isinstance(t, str):
            # drafts 0-3 allow schema entries in a `type` union — that
            # shape must go through plans/upgrade.upgrade_schema first
            raise SchemaError(
                f"non-string type entry {t!r} at {kwp} — legacy "
                "type-union-of-schemas requires upgrade_schema()")
        if t not in _TYPE_NAMES:
            raise SchemaError(f"unknown type {t!r} at {kwp}")
    cond = or_(*[ctx.is_type(t) for t in types])
    exp = types[0] if len(types) == 1 else types
    return _leaf(cfg, cond, kwp, ctx, lambda c=ctx, e=exp: M.msg_type(c, e))


def _k_enum(val: list, ctx: Ctx, kwp: str, cfg: Config) -> Compiled:
    if not val:
        return _leaf(cfg, False, kwp, ctx, lambda c=ctx: M.msg_enum_empty(c))
    cond = or_(*[ctx.eq_const(v) for v in val])
    return _leaf(cfg, cond, kwp, ctx, lambda c=ctx, v=val: M.msg_enum(c, v))


def _k_required(val: list, ctx: Ctx, kwp: str, cfg: Config) -> Compiled:
    if not val:
        return Compiled(True)
    presents = [B(ctx.get_prop(n).present) for n in val]
    statics = [ctx.get_prop(n).present for n in val]
    if len(val) == 1:
        inner = _leaf(cfg, statics[0], kwp, ctx, lambda n=val[0]: M.msg_required_single(n))
    else:
        cond = and_(*statics)
        inner = _leaf(
            cfg, cond, kwp, ctx,
            lambda names=list(val), pc=statics: M.msg_required_multi(names, pc),
        )
    return _guarded(ctx.is_type("object"), inner, cfg)


def _k_dependent_required(val: dict, ctx: Ctx, kwp: str, cfg: Config) -> Compiled:
    parts = []
    for trigger, deps in val.items():
        trig_present = ctx.get_prop(trigger).present
        deps_present = and_(*[ctx.get_prop(d).present for d in deps])
        cond = or_(not_(trig_present), deps_present)
        missing = [d for d in deps]
        parts.append(
            _leaf(cfg, cond, kwp, ctx, lambda t=trigger, m=missing: M.msg_dependent_required(t, m))
        )
    return _guarded(ctx.is_type("object"), _and_combine(parts, cfg), cfg)


def _apply_subschema(sub_schema, child: Ctx, kwp: str, cfg: Config, ref_stack) -> Compiled:
    """Apply a subschema to a possibly-absent value (absent ⇒ vacuous pass).

    A STATICALLY absent child (no such column/field) constant-folds to a
    pass without compiling the subschema at all — the dead-code-elimination
    analogue, and what terminates recursive $ref on the flat path (the
    physical struct depth bounds the unroll)."""
    if child.present is False:
        return Compiled(True)
    sub = compile_node(sub_schema, child, kwp, cfg, ref_stack)
    return _guarded(child.present, sub, cfg)


def _k_properties(val: dict, ctx: Ctx, kwp: str, cfg: Config, ref_stack) -> Compiled:
    parts = []
    for name, sub_schema in val.items():
        child = ctx.get_prop(name)
        parts.append(_apply_subschema(sub_schema, child, f"{kwp}/{_ptr_escape(name)}", cfg, ref_stack))
    inner = _and_combine(parts, cfg, own=(kwp, ctx, lambda c=ctx, n=len(val): M.msg_properties(n)))
    return _guarded(ctx.is_type("object"), inner, cfg)


def _static_prop_names(ctx: Ctx) -> Optional[list[str]]:
    if isinstance(ctx, FlatRowCtx):
        return ctx.prop_names()
    if isinstance(ctx, FlatColCtx) and isinstance(ctx.dtype, T.StructType):
        # nested struct: field names are static too (a NULL field counts
        # as absent, same convention as the top-level row)
        return [f.name for f in ctx.dtype.fields]
    return None


def _k_pattern_properties(val: dict, ctx: Ctx, kwp: str, cfg: Config, ref_stack) -> Compiled:
    from jsonschema_spark.functions.strings import permissive_search_py

    static_names = _static_prop_names(ctx)
    parts = []
    for pattern, sub_schema in val.items():
        kwpp = f"{kwp}/{_ptr_escape(pattern)}"
        if static_names is not None:
            for name in static_names:
                if permissive_search_py(pattern, name):
                    child = ctx.get_prop(name)
                    parts.append(_apply_subschema(sub_schema, child, kwpp, cfg, ref_stack))
        else:
            entries = ctx.obj_entries_factory()
            if entries is None:
                raise SchemaError("patternProperties unsupported for this context")
            keys, prop_ctx = entries
            matching = F.filter(keys, lambda k: pattern_ok(k, pattern))
            ok = F.forall(matching, lambda k: B(compile_node(sub_schema, prop_ctx(k), kwpp, cfg, ref_stack).ok))
            if cfg.want_viols:
                per_key = F.flatten(
                    F.transform(
                        matching,
                        lambda k: compile_node(sub_schema, prop_ctx(k), kwpp, cfg, ref_stack).viols_col(),
                    )
                ).cast(VIOLS_DT)
                parts.append(Compiled(ok, per_key))
            else:
                parts.append(Compiled(ok))
    inner = _and_combine(parts, cfg)
    return _guarded(ctx.is_type("object"), inner, cfg)


def _k_additional_properties(schema: dict, val, ctx: Ctx, kwp: str, cfg: Config, ref_stack) -> Compiled:
    declared = set(schema.get("properties", {}) or {})
    patterns = [p for p in (schema.get("patternProperties", {}) or {})]
    return _k_extra_properties(declared, patterns, val, ctx, kwp, cfg, ref_stack)


def _k_extra_properties(
    declared: set, patterns: list, val, ctx: Ctx, kwp: str, cfg: Config, ref_stack
) -> Compiled:
    """Shared body of additionalProperties and (static) unevaluatedProperties:
    apply ``val`` to every property not in ``declared`` / matching ``patterns``."""
    from jsonschema_spark.functions.strings import permissive_search_py

    static_names = _static_prop_names(ctx)

    if static_names is not None:
        extra = [
            n
            for n in static_names
            if n not in declared and not any(permissive_search_py(p, n) for p in patterns)
        ]
        parts = []
        for name in extra:
            child = ctx.get_prop(name)
            if val is False:
                inner = _leaf(cfg, False, kwp, child, lambda n=name: M.msg_additional_property(n))
                parts.append(_guarded(child.present, inner, cfg))
            else:
                parts.append(_apply_subschema(val, child, kwp, cfg, ref_stack))
        return _guarded(ctx.is_type("object"), _and_combine(parts, cfg), cfg)

    entries = ctx.obj_entries_factory()
    if entries is None:
        raise SchemaError("additionalProperties unsupported for this context")
    keys, prop_ctx = entries
    is_extra = lambda k: and_(  # noqa: E731
        ~k.isin(list(declared)) if declared else True,
        *[not_(pattern_ok(k, p)) for p in patterns],
    )
    extra_keys = F.filter(keys, lambda k: B(is_extra(k)))
    return _apply_to_extra_keys(extra_keys, prop_ctx, val, ctx, kwp, cfg, ref_stack)


def _apply_to_extra_keys(
    extra_keys: Column, prop_ctx, val, ctx: Ctx, kwp: str, cfg: Config, ref_stack
) -> Compiled:
    """Apply ``val`` (False = reject, schema = validate) to the dynamic key
    set ``extra_keys`` — shared tail of additionalProperties and dynamic
    unevaluatedProperties."""
    if val is False:
        ok = F.size(extra_keys) == 0
        if cfg.want_viols:
            viols = F.transform(
                extra_keys,
                lambda k: F.struct(
                    F.lit(kwp).alias("keywordLocation"),
                    F.lit(f"{cfg.base_uri}#{kwp}").alias("absoluteKeywordLocation"),
                    _loc_concat(ctx, k).alias("instanceLocation"),
                    M.msg_additional_property(k).alias("error"),
                ),
            ).cast(VIOLS_DT)
            inner = Compiled(ok, F.when(B(ok), empty_viols()).otherwise(viols))
        else:
            inner = Compiled(ok)
    else:
        ok = F.forall(extra_keys, lambda k: B(compile_node(val, prop_ctx(k), kwp, cfg, ref_stack).ok))
        if cfg.want_viols:
            viols = F.flatten(
                F.transform(extra_keys, lambda k: compile_node(val, prop_ctx(k), kwp, cfg, ref_stack).viols_col())
            ).cast(VIOLS_DT)
            inner = Compiled(ok, viols)
        else:
            inner = Compiled(ok)
    return _guarded(ctx.is_type("object"), inner, cfg)


def _loc_concat(ctx: Ctx, key: Column) -> Column:
    base = F.lit(ctx.loc) if isinstance(ctx.loc, str) else ctx.loc
    return F.concat(base, F.lit("/"), key)


def _k_property_names(val, ctx: Ctx, kwp: str, cfg: Config, ref_stack) -> Compiled:
    keys = ctx.obj_keys()

    def key_ctx(k: Column) -> Ctx:
        return FlatColCtx(k, T.StringType(), _loc_concat(ctx, k))

    ok = F.forall(keys, lambda k: B(compile_node(val, key_ctx(k), kwp, cfg, ref_stack).ok))
    if cfg.want_viols:
        viols = F.flatten(
            F.transform(keys, lambda k: compile_node(val, key_ctx(k), kwp, cfg, ref_stack).viols_col())
        ).cast(VIOLS_DT)
        inner = Compiled(ok, F.when(B(ok), empty_viols()).otherwise(viols))
    else:
        inner = Compiled(ok)
    return _guarded(ctx.is_type("object"), inner, cfg)


def _k_dependent_schemas(val: dict, ctx: Ctx, kwp: str, cfg: Config, ref_stack) -> Compiled:
    parts = []
    for trigger, sub_schema in val.items():
        child = ctx.get_prop(trigger)
        sub = compile_node(sub_schema, ctx, f"{kwp}/{_ptr_escape(trigger)}", cfg, ref_stack)
        parts.append(_guarded(child.present, sub, cfg))
    return _guarded(ctx.is_type("object"), _and_combine(parts, cfg), cfg)


def _k_unique_items(ctx: Ctx, kwp: str, cfg: Config) -> Compiled:
    """AssertionUnique (dispatch.h:814-818): deep distinctness.

    Fast path: typed scalar arrays (flat columns) — pure JVM
    ``array_distinct`` (exact: one Spark array holds one numeric type).
    Slow path: VARIANT arrays and container-element arrays — canonical
    deep equality in an Arrow pudf (key order irrelevant, 1 == 1.0)."""
    if ctx.is_type("array") is False:
        return Compiled(True)  # statically non-array (e.g. flat row root)
    from jsonschema_spark.functions.canonical import unique_canonical

    arr = ctx.arr()
    needs_canonical = isinstance(ctx, VariantCtx)
    if not needs_canonical:
        dt = getattr(ctx, "dtype", None)
        et = dt.elementType if isinstance(dt, T.ArrayType) else None
        needs_canonical = isinstance(et, (T.StructType, T.MapType, T.ArrayType))
    if needs_canonical:
        cond = unique_canonical(ctx.json_repr())
    else:
        cond = F.size(F.array_distinct(arr)) == F.size(arr)
    inner = _leaf(cfg, cond, kwp, ctx, lambda c=ctx: M.msg_unique_items(c))
    return _guarded(ctx.is_type("array"), inner, cfg)


def _k_prefix_items(val: list, ctx: Ctx, kwp: str, cfg: Config, ref_stack) -> Compiled:
    if ctx.is_type("array") is False:
        return Compiled(True)  # statically non-array (e.g. flat row root)
    factory = ctx.element_ctx_factory()
    arr = ctx.arr()
    parts = []
    for i, sub_schema in enumerate(val):
        elem = factory(F.try_element_at(arr, F.lit(i + 1)), F.lit(i))
        has_elem = ctx.arr_size() > i
        sub = compile_node(sub_schema, elem, f"{kwp}/{i}", cfg, ref_stack)
        parts.append(_guarded(has_elem, sub, cfg))
    inner = _and_combine(parts, cfg, own=(kwp, ctx, lambda n=len(val) + 1: M.msg_prefix_items(n)))
    return _guarded(ctx.is_type("array"), inner, cfg)


def _k_items(val, ctx: Ctx, kwp: str, cfg: Config, start: int, ref_stack) -> Compiled:
    if ctx.is_type("array") is False:
        return Compiled(True)  # statically non-array (e.g. flat row root)
    factory = ctx.element_ctx_factory()
    arr = ctx.arr()

    def elem_ok(x: Column, i: Column) -> Column:
        c = compile_node(val, factory(x, i), kwp, cfg, ref_stack)
        gated = or_(i < start, c.ok) if start else c.ok
        return B(gated)

    ok = F.forall(F.transform(arr, elem_ok), lambda b: b)
    if cfg.want_viols:

        def elem_viols(x: Column, i: Column) -> Column:
            c = compile_node(val, factory(x, i), kwp, cfg, ref_stack)
            v = c.viols_col()
            if start:
                v = F.when(i < start, empty_viols()).otherwise(v)
            return v

        own = _viol(cfg, kwp, ctx.loc, M.msg_items_from(start) if start else M.msg_items())
        viols = F.when(
            B(ok), empty_viols()
        ).otherwise(F.concat(F.flatten(F.transform(arr, elem_viols)).cast(VIOLS_DT), own))
        inner = Compiled(ok, viols)
    else:
        inner = Compiled(ok)
    return _guarded(ctx.is_type("array"), inner, cfg)


def _k_contains(schema: dict, val, ctx: Ctx, kwp: str, cfg: Config, ref_stack) -> Compiled:
    minimum = schema.get("minContains", 1)
    maximum = schema.get("maxContains")
    if ctx.is_type("array") is False:
        return Compiled(True)  # statically non-array (e.g. flat row root)
    factory = ctx.element_ctx_factory()
    arr = ctx.arr()

    def elem_ok(x: Column, i: Column) -> Column:
        return B(compile_node(val, factory(x, i), kwp, cfg, ref_stack).ok)

    count = F.size(F.filter(F.transform(arr, elem_ok), lambda b: b))
    cond = count >= minimum if maximum is None else (count >= minimum) & (count <= maximum)
    if minimum == 0 and maximum is None:
        return Compiled(True)
    inner = _leaf(cfg, cond, kwp, ctx, lambda mi=minimum, ma=maximum: M.msg_contains(mi, ma))
    return _guarded(ctx.is_type("array"), inner, cfg)


def _k_all_of(val: list, ctx: Ctx, kwp: str, cfg: Config, ref_stack) -> Compiled:
    parts = [compile_node(s, ctx, f"{kwp}/{i}", cfg, ref_stack) for i, s in enumerate(val)]
    return _and_combine(parts, cfg, own=(kwp, ctx, lambda c=ctx, n=len(val): M.msg_all_of(c, n)))


def _k_any_of(val: list, ctx: Ctx, kwp: str, cfg: Config, ref_stack) -> Compiled:
    parts = [compile_node(s, ctx, f"{kwp}/{i}", cfg, ref_stack) for i, s in enumerate(val)]
    ok = or_(*[p.ok for p in parts])
    if ok is True or not cfg.want_viols:
        return Compiled(ok)
    own = _viol(cfg, kwp, ctx.loc, M.msg_any_of(ctx, len(val)))
    all_viols = F.concat(*[p.viols_col() for p in parts], own)
    return Compiled(ok, F.when(B(ok), empty_viols()).otherwise(all_viols))


def _k_one_of(val: list, ctx: Ctx, kwp: str, cfg: Config, ref_stack) -> Compiled:
    parts = [compile_node(s, ctx, f"{kwp}/{i}", cfg, ref_stack) for i, s in enumerate(val)]
    count = None
    for p in parts:
        c = B(p.ok).cast("int")
        count = c if count is None else count + c
    ok = count == 1
    if not cfg.want_viols:
        return Compiled(ok)
    own = _viol(cfg, kwp, ctx.loc, M.msg_one_of(ctx, len(val)))
    branch_viols = F.concat(*[p.viols_col() for p in parts], own)
    viols = (
        F.when(B(ok), empty_viols())
        .when(count == 0, branch_viols)
        .otherwise(own)
    )
    return Compiled(ok, viols)


def _k_not(val, ctx: Ctx, kwp: str, cfg: Config, ref_stack) -> Compiled:
    # compile the negated child in fast mode: its violations are meaningless
    sub_cfg = cfg.fast()
    sub = compile_node(val, ctx, kwp, sub_cfg, ref_stack)
    return _leaf(cfg, not_(sub.ok), kwp, ctx, lambda c=ctx: M.msg_not(c))


def _k_conditional(schema: dict, ctx: Ctx, kw: str, cfg: Config, ref_stack) -> Compiled:
    fast_cfg = cfg.fast()
    cond = compile_node(schema["if"], ctx, f"{kw}/if", fast_cfg, ref_stack)
    then_c = compile_node(schema["then"], ctx, f"{kw}/then", cfg, ref_stack) if "then" in schema else Compiled(True)
    else_c = compile_node(schema["else"], ctx, f"{kw}/else", cfg, ref_stack) if "else" in schema else Compiled(True)
    if isinstance(cond.ok, bool):
        # constant-condition folding (postprocess.h:601-624 analogue)
        chosen = then_c if cond.ok else else_c
        if chosen.ok is True or not cfg.want_viols:
            return Compiled(chosen.ok)
        own = _viol(cfg, f"{kw}/if", ctx.loc, M.msg_conditional(ctx))
        return Compiled(chosen.ok, F.when(B(chosen.ok), empty_viols()).otherwise(F.concat(chosen.viols_col(), own)))
    ok = F.when(B(cond.ok), B(then_c.ok)).otherwise(B(else_c.ok))
    if not cfg.want_viols:
        return Compiled(ok)
    own = _viol(cfg, f"{kw}/if", ctx.loc, M.msg_conditional(ctx))
    viols = (
        F.when(B(cond.ok) & ~B(then_c.ok), F.concat(then_c.viols_col(), own))
        .when(~B(cond.ok) & ~B(else_c.ok), F.concat(else_c.viols_col(), own))
        .otherwise(empty_viols())
    )
    return Compiled(ok, viols)


# --- unevaluatedProperties / unevaluatedItems ---------------------------------
#
# The reference needs runtime evaluation marks with checkpoint/rewind for
# these (evaluator.h:217-276); its compiler also statically analyses which
# schemas can skip tracking (unevaluated.cc, the `track` bit). Two tiers:
#
# 1. STATIC (fast path): when every property/item evaluation is CONJUNCTIVE
#    (the node itself, allOf children, $ref targets), the evaluated set is
#    known at compile time and unevaluated* reduces to
#    additionalProperties / items-from-k — zero runtime overhead.
# 2. DYNAMIC (the checkpoint/rewind analogue): disjunctive evaluation
#    (anyOf/oneOf/if-then-else/dependentSchemas branches evaluating
#    properties, contains marking items) compiles to per-key / per-item
#    "evaluated" predicates — each branch's contribution is gated on that
#    branch VALIDATING (fast-mode recompile of the branch), which is
#    exactly the annotations-only-from-successful-subschemas rule the
#    mark rollback implements. `not` contributes nothing (its annotations
#    never propagate). Branch contributions at the node's own level
#    (properties/patternProperties) are unconditioned — if they fail the
#    node fails anyway, matching the reference's conjunctive shortcut.

_BRANCHING_KEYS = ("anyOf", "oneOf", "not", "if", "then", "else", "dependentSchemas")


def _subtree_mentions(node, keys: tuple) -> bool:
    if isinstance(node, dict):
        if any(k in node for k in keys):
            return True
        return any(_subtree_mentions(v, keys) for v in node.values())
    if isinstance(node, list):
        return any(_subtree_mentions(x, keys) for x in node)
    return False


def _conjunctive_contributors(schema, cfg: Config, seen: tuple = ()) -> list:
    """The node plus transitive allOf / $ref children — subschemas whose
    annotations are always evaluated when the node is."""
    out = [schema]
    if not isinstance(schema, dict):
        return out
    for sub in schema.get("allOf") or []:
        if isinstance(sub, dict):
            out.extend(_conjunctive_contributors(sub, cfg, seen))
    ref = schema.get("$ref")
    if isinstance(ref, str) and ref not in seen:
        target, sub_cfg = _resolve_ref(ref, cfg)
        out.extend(_conjunctive_contributors(target, sub_cfg, seen + (ref,)))
    for dk in _DYNAMIC_KEYWORDS:
        dval = schema.get(dk)
        if isinstance(dval, str) and (dk, dval) not in seen:
            target, res, res_uri = _resolve_dynamic_ref(dk, dval, cfg)
            sub_cfg = cfg if res is cfg.root else cfg.with_root(res, res_uri)
            out.extend(_conjunctive_contributors(target, sub_cfg, seen + ((dk, dval),)))
    return out


def _branch_ok(sub_schema, ctx: Ctx, kw: str, cfg: Config, ref_stack) -> Cond:
    """Fast-mode verdict of a subschema — gates annotation contributions
    from disjunctive branches (the mark-rollback analogue)."""
    return compile_node(sub_schema, ctx, kw, cfg.fast(), ref_stack).ok


def _key_evaluated(schema, k: Column, ctx: Ctx, cfg: Config, ref_stack, is_root: bool = True) -> Cond:
    """Cond: the instance property named ``k`` is evaluated by ``schema``
    at this location — the runtime evaluated-property-set predicate."""
    if not isinstance(schema, dict):
        return False
    conds: list[Cond] = []
    props = schema.get("properties") or {}
    if props:
        conds.append(k.isin(list(props.keys())))
    for p in (schema.get("patternProperties") or {}):
        conds.append(pattern_ok(k, p))
    if "additionalProperties" in schema:
        conds.append(True)
    if not is_root and "unevaluatedProperties" in schema:
        conds.append(True)
    for sub in schema.get("allOf") or []:
        conds.append(and_(_branch_ok(sub, ctx, "", cfg, ref_stack),
                          _key_evaluated(sub, k, ctx, cfg, ref_stack, False)))
    for key in ("anyOf", "oneOf"):
        for sub in schema.get(key) or []:
            conds.append(and_(_branch_ok(sub, ctx, "", cfg, ref_stack),
                              _key_evaluated(sub, k, ctx, cfg, ref_stack, False)))
    if "if" in schema:
        if_ok = _branch_ok(schema["if"], ctx, "", cfg, ref_stack)
        conds.append(and_(if_ok, _key_evaluated(schema["if"], k, ctx, cfg, ref_stack, False)))
        if "then" in schema:
            conds.append(and_(if_ok, _branch_ok(schema["then"], ctx, "", cfg, ref_stack),
                              _key_evaluated(schema["then"], k, ctx, cfg, ref_stack, False)))
        if "else" in schema:
            conds.append(and_(not_(if_ok), _branch_ok(schema["else"], ctx, "", cfg, ref_stack),
                              _key_evaluated(schema["else"], k, ctx, cfg, ref_stack, False)))
    for trigger, sub in (schema.get("dependentSchemas") or {}).items():
        conds.append(and_(ctx.get_prop(trigger).present,
                          _branch_ok(sub, ctx, "", cfg, ref_stack),
                          _key_evaluated(sub, k, ctx, cfg, ref_stack, False)))
    ref = schema.get("$ref")
    if isinstance(ref, str):
        ref_key = (cfg.base_uri, ref)
        if ref_stack.count(ref_key) < cfg.max_ref_depth:
            target, sub_cfg = _resolve_ref(ref, cfg)
            conds.append(_key_evaluated(target, k, ctx, sub_cfg, ref_stack + (ref_key,), False))
    # $dynamicRef/$recursiveRef targets evaluate properties too — omitting
    # them would spuriously reject under dynamic unevaluated*
    for dk in _DYNAMIC_KEYWORDS:
        dval = schema.get(dk)
        if isinstance(dval, str):
            ref_key = (cfg.base_uri, f"{dk}:{dval}")
            if ref_stack.count(ref_key) < cfg.max_ref_depth:
                target, res, res_uri = _resolve_dynamic_ref(dk, dval, cfg)
                sub_cfg = cfg if res is cfg.root else cfg.with_root(res, res_uri)
                conds.append(_key_evaluated(target, k, ctx, sub_cfg,
                                            ref_stack + (ref_key,), False))
    # `not` contributes nothing: its annotations never propagate
    return or_(*conds)


def _item_evaluated(schema, x: Column, i: Column, ctx: Ctx, cfg: Config, ref_stack, is_root: bool = True) -> Cond:
    """Cond: array element ``x`` at index ``i`` is evaluated by ``schema``
    at this location (prefixItems positions, items, contains matches)."""
    if not isinstance(schema, dict):
        return False
    factory = ctx.element_ctx_factory()
    conds: list[Cond] = []
    items = schema.get("items")
    if items is not None and not isinstance(items, list):
        conds.append(True)
    pi = items if isinstance(items, list) else schema.get("prefixItems")
    if isinstance(pi, list) and pi:
        conds.append(i < len(pi))
    if not is_root and "unevaluatedItems" in schema:
        conds.append(True)
    if "contains" in schema:
        # matched elements are evaluated (LoopContains annotations)
        conds.append(compile_node(schema["contains"], factory(x, i), "", cfg.fast(), ref_stack).ok)
    for sub in schema.get("allOf") or []:
        conds.append(and_(_branch_ok(sub, ctx, "", cfg, ref_stack),
                          _item_evaluated(sub, x, i, ctx, cfg, ref_stack, False)))
    for key in ("anyOf", "oneOf"):
        for sub in schema.get(key) or []:
            conds.append(and_(_branch_ok(sub, ctx, "", cfg, ref_stack),
                              _item_evaluated(sub, x, i, ctx, cfg, ref_stack, False)))
    if "if" in schema:
        if_ok = _branch_ok(schema["if"], ctx, "", cfg, ref_stack)
        conds.append(and_(if_ok, _item_evaluated(schema["if"], x, i, ctx, cfg, ref_stack, False)))
        if "then" in schema:
            conds.append(and_(if_ok, _branch_ok(schema["then"], ctx, "", cfg, ref_stack),
                              _item_evaluated(schema["then"], x, i, ctx, cfg, ref_stack, False)))
        if "else" in schema:
            conds.append(and_(not_(if_ok), _branch_ok(schema["else"], ctx, "", cfg, ref_stack),
                              _item_evaluated(schema["else"], x, i, ctx, cfg, ref_stack, False)))
    for trigger, sub in (schema.get("dependentSchemas") or {}).items():
        conds.append(and_(ctx.get_prop(trigger).present,
                          _branch_ok(sub, ctx, "", cfg, ref_stack),
                          _item_evaluated(sub, x, i, ctx, cfg, ref_stack, False)))
    ref = schema.get("$ref")
    if isinstance(ref, str):
        ref_key = (cfg.base_uri, ref)
        if ref_stack.count(ref_key) < cfg.max_ref_depth:
            target, sub_cfg = _resolve_ref(ref, cfg)
            conds.append(_item_evaluated(target, x, i, ctx, sub_cfg, ref_stack + (ref_key,), False))
    for dk in _DYNAMIC_KEYWORDS:
        dval = schema.get(dk)
        if isinstance(dval, str):
            ref_key = (cfg.base_uri, f"{dk}:{dval}")
            if ref_stack.count(ref_key) < cfg.max_ref_depth:
                target, res, res_uri = _resolve_dynamic_ref(dk, dval, cfg)
                sub_cfg = cfg if res is cfg.root else cfg.with_root(res, res_uri)
                conds.append(_item_evaluated(target, x, i, ctx, sub_cfg,
                                             ref_stack + (ref_key,), False))
    return or_(*conds)


def _k_unevaluated_properties(schema: dict, val, ctx: Ctx, kwp: str, cfg: Config, ref_stack) -> Compiled:
    names: set = set()
    patterns: list = []
    dynamic = False
    for c in _conjunctive_contributors(schema, cfg):
        if not isinstance(c, dict):
            continue
        if "additionalProperties" in c:
            # every remaining property is already evaluated (or rejected)
            return Compiled(True)
        names.update((c.get("properties") or {}).keys())
        patterns.extend((c.get("patternProperties") or {}).keys())
        for k in _BRANCHING_KEYS:
            v = c.get(k)
            if v is not None and _subtree_mentions(
                v, ("properties", "patternProperties", "additionalProperties", "unevaluatedProperties")
            ):
                dynamic = True
    if not dynamic:
        return _k_extra_properties(names, patterns, val, ctx, kwp, cfg, ref_stack)
    return _k_unevaluated_properties_dynamic(schema, val, ctx, kwp, cfg, ref_stack)


def _k_unevaluated_properties_dynamic(schema: dict, val, ctx: Ctx, kwp: str, cfg: Config, ref_stack) -> Compiled:
    static_names = _static_prop_names(ctx)
    if static_names is not None:
        parts: list[Compiled] = []
        for name in static_names:
            child = ctx.get_prop(name)
            evaluated = _key_evaluated(schema, F.lit(name), ctx, cfg, ref_stack)
            if val is False:
                cond = or_(not_(child.present), evaluated)
                parts.append(_leaf(cfg, cond, kwp, child, lambda n=name: M.msg_additional_property(n)))
            else:
                sub = compile_node(val, child, kwp, cfg, ref_stack)
                applies = and_(child.present, not_(evaluated))
                ok = or_(not_(B(applies)), sub.ok)
                if cfg.want_viols and sub.viols is not None:
                    v = F.when(B(applies), sub.viols).otherwise(empty_viols())
                    parts.append(Compiled(ok, v))
                else:
                    parts.append(Compiled(ok))
        return _guarded(ctx.is_type("object"), _and_combine(parts, cfg), cfg)
    entries = ctx.obj_entries_factory()
    if entries is None:
        raise SchemaError("unevaluatedProperties unsupported for this context")
    keys, prop_ctx = entries
    uneval_keys = F.filter(
        keys, lambda k: ~B(_key_evaluated(schema, k, ctx, cfg, ref_stack))
    )
    return _apply_to_extra_keys(uneval_keys, prop_ctx, val, ctx, kwp, cfg, ref_stack)


def _k_unevaluated_items(schema: dict, val, ctx: Ctx, kwp: str, cfg: Config, ref_stack) -> Compiled:
    prefix = 0
    dynamic = False
    for c in _conjunctive_contributors(schema, cfg):
        if not isinstance(c, dict):
            continue
        items = c.get("items")
        if items is not None and not isinstance(items, list):
            return Compiled(True)  # `items` already evaluates every element
        if "contains" in c:
            dynamic = True
        pi = items if isinstance(items, list) else c.get("prefixItems")
        if isinstance(pi, list):
            prefix = max(prefix, len(pi))
        for k in _BRANCHING_KEYS:
            v = c.get(k)
            if v is not None and _subtree_mentions(
                v, ("items", "prefixItems", "contains", "unevaluatedItems")
            ):
                dynamic = True
    if not dynamic:
        return _k_items(val, ctx, kwp, cfg, prefix, ref_stack)
    return _k_unevaluated_items_dynamic(schema, val, ctx, kwp, cfg, ref_stack)


def _k_unevaluated_items_dynamic(schema: dict, val, ctx: Ctx, kwp: str, cfg: Config, ref_stack) -> Compiled:
    factory = ctx.element_ctx_factory()
    arr = ctx.arr()

    def elem_ok(x: Column, i: Column) -> Column:
        ev = _item_evaluated(schema, x, i, ctx, cfg, ref_stack)
        c = compile_node(val, factory(x, i), kwp, cfg, ref_stack)
        return B(or_(ev, c.ok))

    ok = F.forall(F.transform(arr, elem_ok), lambda b: b)
    if cfg.want_viols:

        def elem_viols(x: Column, i: Column) -> Column:
            ev = _item_evaluated(schema, x, i, ctx, cfg, ref_stack)
            c = compile_node(val, factory(x, i), kwp, cfg, ref_stack)
            return F.when(B(ev), empty_viols()).otherwise(c.viols_col())

        viols = F.when(B(ok), empty_viols()).otherwise(
            F.flatten(F.transform(arr, elem_viols)).cast(VIOLS_DT)
        )
        inner = Compiled(ok, viols)
    else:
        inner = Compiled(ok)
    return _guarded(ctx.is_type("array"), inner, cfg)


# ---------------------------------------------------------------------------
# Public API
# ---------------------------------------------------------------------------


@dataclass
class CompiledSchema:
    """Driver-side compiled plan (the Template analogue, evaluator.h:38-44).

    Pure-Python + Column-expression object; broadcastable by closure capture
    (the schema dict is tiny — executors only ever see generated expressions).
    """

    schema: Union[dict, bool]
    base_uri: str = ""
    format_assertion: bool = True
    resolver: Optional[dict] = None  # uri → schema registry for external $ref
    max_ref_depth: int = 6  # recursive-$ref unroll budget (Config doc)
    # --entrypoint analogue: when set, `schema` is the compiled subschema
    # but fragments/$refs still resolve against this full document
    resolution_root: Optional[Union[dict, bool]] = None
    # parser-grade idn-*/iri validation (pandas UDF path) — see Config
    format_strict: bool = False

    def __post_init__(self):
        doc = self.resolution_root if self.resolution_root is not None else self.schema
        if isinstance(doc, dict):
            self.base_uri = doc.get("$id", self.base_uri)
            # embedded `$id` resources become resolvable targets — a $ref
            # to an embedded resource's URI (absolute or base-relative)
            # lands on that subschema with its own resolution scope
            embedded: dict = {}
            _collect_embedded_resources(doc, self.base_uri, embedded)
            if embedded:
                merged = dict(self.resolver or {})
                for uri, node in embedded.items():
                    merged.setdefault(uri, node)
                self.resolver = merged

    def _cfg(self, mode: str, short_circuit: bool = True) -> Config:
        root = self.resolution_root if self.resolution_root is not None else self.schema
        return Config(self.base_uri, mode, self.format_assertion, root,
                      short_circuit, self.resolver, self.max_ref_depth,
                      format_strict=self.format_strict)

    def compile_flat(
        self, df_schema: T.StructType, mode: str = "exhaustive", short_circuit: bool = True
    ) -> Compiled:
        """Compile against a flat DataFrame row (columns = properties)."""
        ctx = FlatRowCtx(df_schema)
        return compile_node(self.schema, ctx, "", self._cfg(mode, short_circuit))

    def compile_variant(
        self, doc_col: Column, mode: str = "exhaustive", short_circuit: bool = True
    ) -> Compiled:
        """Compile against a VARIANT column holding parsed JSON documents."""
        ctx = VariantCtx(doc_col, "")
        return compile_node(self.schema, ctx, "", self._cfg(mode, short_circuit))


def compile_schema(
    schema: Union[dict, bool],
    base_uri: str = "",
    format_assertion: bool = True,
    resolver: Optional[dict] = None,
    max_ref_depth: int = 6,
    format_strict: bool = False,
) -> CompiledSchema:
    return CompiledSchema(schema, base_uri, format_assertion, resolver,
                          max_ref_depth, format_strict=format_strict)


def compile_entrypoint(
    schema: Union[dict, bool],
    entrypoint: str,
    format_assertion: bool = True,
    resolver: Optional[dict] = None,
    max_ref_depth: int = 6,
) -> CompiledSchema:
    """The ``--entrypoint`` analogue (command_validate.cc:296,322-332):
    compile the subschema at a JSON-pointer fragment (``#/$defs/item`` or
    ``/$defs/item``) or ``#anchor``, while ``$ref``s inside it keep
    resolving against the FULL document."""
    if not isinstance(schema, dict):
        raise SchemaError("entrypoint requires an object schema")
    frag = entrypoint[1:] if entrypoint.startswith("#") else entrypoint
    if frag and not frag.startswith("/"):
        node = _find_anchor(schema, frag)
        if node is None:
            raise SchemaError(f"cannot resolve entrypoint anchor {entrypoint}")
    else:
        node = _walk_pointer(schema, frag, entrypoint)
    return CompiledSchema(node, "", format_assertion, resolver, max_ref_depth,
                          resolution_root=schema)
