"""Validation operators — the engine's `jsonschema validate` analogue.

The reference loops instances through a compiled template
(/root/reference/src/command_validate.cc:374-415). Here the compiled schema
becomes Column expressions evaluated in a single pass over the DataFrame:

- ``validate``    — fast mode: one boolean ``valid`` column, pure codegen
  (the `--fast` / Mode::FastValidation analogue — main.cc:46-51)
- ``annotate``    — exhaustive mode: ``valid`` + ``violations`` array column
- ``violations``  — exploded violation rows in the standard Basic shape
  (output_standard.cc:47-100): keywordLocation, absoluteKeywordLocation,
  instanceLocation, error

Only failing rows ever materialize violation structs (hot/cold split — the
InstructionExtra analogue, evaluator_instruction.h:256-271).
"""

from __future__ import annotations

from typing import Optional, Sequence, Union

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

from jsonschema_spark.plans.compiler import (
    CompiledSchema,
    VIOLS_DT,
    compile_schema,
    empty_viols,
)
from jsonschema_spark.plans.context import B


def _as_compiled(schema: Union[dict, bool, CompiledSchema]) -> CompiledSchema:
    if isinstance(schema, CompiledSchema):
        return schema
    return compile_schema(schema)


_PARSE_FAIL_MSG = "The instance could not be parsed as JSON"
_VARIANT_TMP = "__jss_variant"


def annotate(
    df: DataFrame,
    schema: Union[dict, bool, CompiledSchema],
    doc_col: Optional[str] = None,
    valid_col: str = "valid",
    violations_col: str = "violations",
    short_circuit: bool = True,
) -> DataFrame:
    """Exhaustive validation: adds `valid` boolean + `violations` array.

    ``short_circuit=True`` follows the reference's LogicalAnd first-failure
    reporting; ``False`` reports every failing conjunct (oracle-friendly)."""
    cs = _as_compiled(schema)
    if doc_col is None:
        compiled = cs.compile_flat(df.schema, mode="exhaustive", short_circuit=short_circuit)
        ok, viols = B(compiled.ok), compiled.viols_col()
        return df.withColumns({valid_col: ok, violations_col: viols})
    # parse ONCE behind a projection: the compiled plan references the
    # variant column many times (guards, accessors, message text) — parsing
    # inline would re-run parse_json per reference (measured ~3×)
    pre = df.withColumn(_VARIANT_TMP, F.try_parse_json(F.col(doc_col)))
    v = F.col(_VARIANT_TMP)
    compiled = cs.compile_variant(v, mode="exhaustive", short_circuit=short_circuit)
    # NULL document string == unparseable: both fail with the parse message
    parse_ok = v.isNotNull()
    ok = parse_ok & B(compiled.ok)
    parse_viol = F.array(
        F.struct(
            F.lit("").alias("keywordLocation"),
            F.lit(f"{cs.base_uri}#").alias("absoluteKeywordLocation"),
            F.lit("").alias("instanceLocation"),
            F.lit(_PARSE_FAIL_MSG).alias("error"),
        )
    ).cast(VIOLS_DT)
    viols = F.when(~parse_ok, parse_viol).otherwise(compiled.viols_col())
    return pre.withColumns({valid_col: ok, violations_col: viols}).drop(_VARIANT_TMP)


def validate(
    df: DataFrame,
    schema: Union[dict, bool, CompiledSchema],
    doc_col: Optional[str] = None,
    valid_col: str = "valid",
    instance_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Fast validation: adds only the boolean verdict (no violation detail),
    keeping the whole plan inside whole-stage codegen.

    ``instance_cols`` (flat path only) restricts the instance object to a
    column subset — id/bookkeeping columns outside it are invisible to the
    schema (matters for closed-object keywords: additionalProperties,
    unevaluatedProperties, propertyNames, min/maxProperties)."""
    cs = _as_compiled(schema)
    if doc_col is None:
        row_schema = df.schema
        if instance_cols is not None:
            keep = set(instance_cols)
            missing = keep - {f.name for f in df.schema.fields}
            if missing:
                # a silently-dropped typo would make required properties
                # "absent" and flip every verdict
                raise ValueError(f"instance_cols not in DataFrame: {sorted(missing)}")
            row_schema = T.StructType([f for f in df.schema.fields if f.name in keep])
        compiled = cs.compile_flat(row_schema, mode="fast")
        return df.withColumn(valid_col, B(compiled.ok))
    pre = df.withColumn(_VARIANT_TMP, F.try_parse_json(F.col(doc_col)))
    v = F.col(_VARIANT_TMP)
    compiled = cs.compile_variant(v, mode="fast")
    ok = v.isNotNull() & B(compiled.ok)
    return pre.withColumn(valid_col, ok).drop(_VARIANT_TMP)


def violations(
    df: DataFrame,
    schema: Union[dict, bool, CompiledSchema],
    id_cols: Sequence[str],
    doc_col: Optional[str] = None,
    short_circuit: bool = True,
) -> DataFrame:
    """Violation rows: (id_cols..., keywordLocation, absoluteKeywordLocation,
    instanceLocation, error) — one row per failed assertion, in evaluation
    order. Only failing rows are exploded."""
    annotated = annotate(df, schema, doc_col=doc_col, short_circuit=short_circuit)
    exploded = (
        annotated.filter(~F.col("valid"))
        .select(*id_cols, F.posexplode("violations").alias("_pos", "_v"))
        .select(
            *id_cols,
            F.col("_v.keywordLocation").alias("keywordLocation"),
            F.col("_v.absoluteKeywordLocation").alias("absoluteKeywordLocation"),
            F.col("_v.instanceLocation").alias("instanceLocation"),
            F.col("_v.error").alias("error"),
        )
    )
    return exploded


def violations_with_positions(
    df: DataFrame,
    schema: Union[dict, bool, CompiledSchema],
    id_cols: Sequence[str],
    doc_col: str,
    short_circuit: bool = True,
) -> DataFrame:
    """Violation rows with the reference's ``instancePosition`` column —
    1-based [startLine, startCol, endLine, endCol] span of the instance
    location in the SOURCE document text (output_standard.cc:85; golden
    test/validate/fail_json.sh). Positions come from a one-pass scanner
    over the original text, computed for FAILING rows only (cold path).
    doc_col sources only: flat rows have no source text to span."""
    from jsonschema_spark.functions.positions import instance_position

    annotated = annotate(df, schema, doc_col=doc_col, short_circuit=short_circuit)
    return (
        annotated.filter(~F.col("valid"))
        .select(*id_cols, F.col(doc_col).alias("__doc"), F.explode("violations").alias("_v"))
        .select(
            *id_cols,
            F.col("_v.keywordLocation").alias("keywordLocation"),
            F.col("_v.absoluteKeywordLocation").alias("absoluteKeywordLocation"),
            F.col("_v.instanceLocation").alias("instanceLocation"),
            instance_position(F.col("__doc"), F.col("_v.instanceLocation")).alias(
                "instancePosition"
            ),
            F.col("_v.error").alias("error"),
        )
    )


def property_verdicts(
    df: DataFrame,
    schema: Union[dict, bool, CompiledSchema],
    doc_col: Optional[str] = None,
    prefix: str = "ok_",
) -> DataFrame:
    """Per-property boolean verdict columns (``ok_<name>``) — the
    data-quality-dashboard projection: each schema property's subschema
    (plus its required bit) evaluated independently, all in the same
    single pass. A property column is True when the value is absent-and-
    not-required or present-and-valid."""
    from jsonschema_spark.plans.compiler import _apply_subschema, and_
    from jsonschema_spark.plans.context import B, FlatRowCtx, VariantCtx

    cs = _as_compiled(schema)
    node = cs.schema if isinstance(cs.schema, dict) else {}
    props = node.get("properties", {}) or {}
    required = set(node.get("required", []) or [])
    cfg = cs._cfg("fast")
    if doc_col is None:
        ctx = FlatRowCtx(df.schema)
    else:
        ctx = VariantCtx(F.try_parse_json(F.col(doc_col)), "")
    cols = {}
    for name, sub_schema in props.items():
        child = ctx.get_prop(name)
        ok = _apply_subschema(sub_schema, child, f"/properties/{name}", cfg, ()).ok
        if name in required:
            ok = and_(ok, child.present)
        cols[f"{prefix}{name}"] = B(ok)
    for name in required - set(props):
        cols[f"{prefix}{name}"] = B(ctx.get_prop(name).present)
    return df.withColumns(cols)


def standard_output(
    df: DataFrame,
    schema: Union[dict, bool, CompiledSchema],
    doc_col: Optional[str] = None,
    fmt: str = "basic",
    out_col: str = "report",
    annotations: bool = False,
    positions: bool = False,
) -> DataFrame:
    """Standard JSON output column — the `--json` analogue
    (output_standard.cc:47-100): fmt='flag' → {"valid": bool};
    fmt='basic' → {"valid": bool, "errors": [{keywordLocation,
    absoluteKeywordLocation, instanceLocation, error}, ...]} (errors
    omitted for valid rows, matching the reference's Flag/Basic shapes).

    ``annotations=True`` adds the golden ``annotations[]`` block to valid
    rows (test/validate/pass_json.sh); ``positions=True`` (doc_col only)
    inserts ``instancePosition`` spans into every entry
    (test/validate/fail_json.sh) — the full field-for-field Basic shape."""
    if fmt == "flag":
        v = validate(df, schema, doc_col=doc_col)
        report = F.to_json(F.struct(F.col("valid").alias("valid")))
        return v.withColumn(out_col, report).drop("valid")
    if fmt != "basic":
        raise ValueError(f"unknown output format {fmt!r} (flag|basic)")
    a = annotate(df, schema, doc_col=doc_col)
    ann_col = None
    if annotations:
        from jsonschema_spark.operators.annotations import annotations_col
        from jsonschema_spark.plans.context import FlatRowCtx, VariantCtx

        cs = _as_compiled(schema)
        if doc_col is None:
            ctx = FlatRowCtx(df.schema)
        else:
            ctx = VariantCtx(F.try_parse_json(F.col(doc_col)), "")
        ann_col = annotations_col(cs, ctx)
    if positions and doc_col is not None:
        return _standard_output_positions(a, doc_col, ann_col, out_col)
    valid_report = (
        F.to_json(F.struct(F.col("valid").alias("valid"), ann_col.alias("annotations")))
        if ann_col is not None
        else F.to_json(F.struct(F.col("valid").alias("valid")))
    )
    report = F.when(F.col("valid"), valid_report).otherwise(
        F.to_json(
            F.struct(F.col("valid").alias("valid"), F.col("violations").alias("errors"))
        )
    )
    return a.withColumn(out_col, report).drop("valid", "violations")


def _standard_output_positions(annotated: DataFrame, doc_col: str, ann_col, out_col: str) -> DataFrame:
    """Assemble the Basic report with instancePosition spans: one scan of
    the source text per row (Arrow-batched; entries share the scan)."""
    import json as _json

    from pyspark.sql.types import StringType

    from jsonschema_spark.functions.positions import position_of, scan_spans, _line_col

    @F.pandas_udf(StringType())
    def assemble(valid: pd.Series, doc: pd.Series, viols: pd.Series, anns: pd.Series) -> pd.Series:
        def build(v, d, errs_json, anns_json):
            entries_key = "annotations" if v else "errors"
            raw = _json.loads(anns_json if v else errs_json) or []
            try:
                spans = scan_spans(d) if d is not None else {}
            except (ValueError, IndexError):
                spans = {}
            out = []
            for e in raw:
                loc = e.get("instanceLocation", "")
                ent = {
                    "keywordLocation": e["keywordLocation"],
                    "absoluteKeywordLocation": e["absoluteKeywordLocation"],
                    "instanceLocation": loc,
                }
                if loc in spans:
                    so, eo = spans[loc]
                    sl, sc = _line_col(d, so)
                    el, ec = _line_col(d, eo)
                    ent["instancePosition"] = [sl, sc, el, ec]
                if v:
                    ent["annotation"] = _json.loads(e["annotation"])
                else:
                    ent["error"] = e["error"]
                out.append(ent)
            rep = {"valid": bool(v)}
            if out or not v:
                rep[entries_key] = out
            return _json.dumps(rep, separators=(",", ":"), ensure_ascii=False)

        return pd.Series([build(v, d, ej, aj) for v, d, ej, aj in zip(valid, doc, viols, anns)])

    anns_json = F.to_json(ann_col) if ann_col is not None else F.lit("[]")
    report = assemble(
        F.col("valid"), F.col(doc_col), F.to_json(F.col("violations")), anns_json
    )
    return annotated.withColumn(out_col, report).drop("valid", "violations")


def verdict_counts(
    df: DataFrame,
    schema: Union[dict, bool, CompiledSchema],
    doc_col: Optional[str] = None,
    by: Sequence[str] = (),
) -> DataFrame:
    """Per-group (or global) pass/fail counts — the per-partition verdict
    aggregate from the north_rule. One pass, map-side partial aggregation."""
    v = validate(df, schema, doc_col=doc_col)
    agg = [
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.sum(F.col("valid").cast("long")), F.lit(0)).alias("n_valid"),
        F.coalesce(F.sum((~F.col("valid")).cast("long")), F.lit(0)).alias("n_invalid"),
    ]
    if by:
        return v.groupBy(*by).agg(*agg)
    return v.agg(*agg)


def verdict_counts_cube(
    df: DataFrame,
    schema: Union[dict, bool, CompiledSchema],
    dims: Sequence[str],
    doc_col: Optional[str] = None,
) -> DataFrame:
    """Pass/fail verdict counts at EVERY grouping granularity of ``dims``
    in one pass — ``cube()``: per (dim1, dim2, …), per each dim alone,
    and the grand total. ``gid`` is the grouping id (bitmask of rolled-up
    dims, 0 = most detailed, 2^len(dims)−1 = grand total): it
    disambiguates a rolled-up NULL from a NULL dim VALUE in the data —
    required for an exact oracle, since DuckDB's CUBE emits both.

    Scale shape: Spark expands the cube map-side (one row per input row
    per grouping set, partially aggregated before the single exchange) —
    2^d × the agg rows, not 2^d scans. The reference has no grouping
    sets at all (SURVEY §2.6); this is the north_rule's per-partition
    verdict aggregate generalized to roll-up reporting."""
    v = validate(df, schema, doc_col=doc_col)
    agg = [
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.sum(F.col("valid").cast("long")), F.lit(0)).alias("n_valid"),
        F.coalesce(F.sum((~F.col("valid")).cast("long")), F.lit(0)).alias("n_invalid"),
    ]
    return (
        v.cube(*dims)
        .agg(F.grouping_id().cast("long").alias("gid"), *agg)
        .select(*dims, "gid", "n_rows", "n_valid", "n_invalid")
    )


def sampled_verdict(
    df: DataFrame,
    schema: Union[dict, bool, CompiledSchema],
    key_col: str,
    sample_ppm: int,
    doc_col: Optional[str] = None,
    instance_cols: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Deterministic-sample validation estimate — the cheap gate BEFORE
    committing a 100 TB validation run: validate only rows whose
    portable 56-bit key hash lands under ``sample_ppm``, report the
    sampled verdict counts and the extrapolated invalid rate. The
    sample is a pure function of the key (no RNG, no seed state), so
    any engine — and any later re-run — selects the identical rows;
    reference: `jsonschema validate` gives per-document verdicts
    (src/command_validate.cc), this answers "roughly how bad is the
    table" at 1/N the cost.

    One scan, one global aggregation: (n_total, n_sampled, n_valid,
    n_invalid, est_invalid_ppm = floor(1e6·invalid/sampled)).
    """
    from jsonschema_spark.operators.dedup import hash56

    v = validate(df, schema, doc_col=doc_col,
                 instance_cols=instance_cols)
    ins = (hash56(F.col(key_col).cast("string"))
           % 1_000_000) < sample_ppm
    n_inv = F.sum((ins & ~F.col("valid")).cast("long")).cast("long")
    return v.agg(
        F.count(F.lit(1)).cast("long").alias("n_total"),
        F.sum(ins.cast("long")).cast("long").alias("n_sampled"),
        F.sum((ins & F.col("valid")).cast("long")).cast("long")
        .alias("n_valid"),
        n_inv.alias("n_invalid"),
    ).select(
        "*",
        # ANSI Spark throws DIVIDE_BY_ZERO even for double division:
        # guard the empty-sample case (NULL est, the NULL-metric-fails
        # convention) instead of aborting the job.
        F.when(
            F.col("n_sampled") > 0,
            F.floor((F.col("n_invalid") * 1_000_000).cast("double")
                    / F.col("n_sampled")).cast("long"))
        .alias("est_invalid_ppm"),
    )


def violation_pareto(
    df: DataFrame,
    schema: Union[dict, bool, CompiledSchema],
    id_cols: Sequence[str],
    k: int = 10,
    doc_col: Optional[str] = None,
) -> DataFrame:
    """Violation Pareto: the top-k failing keyword locations with
    counts and corpus share — "which constraint is responsible for the
    damage" before anyone reads a million violation rows. Counts the
    EXHAUSTIVE violation set (short_circuit=False): a Pareto over
    short-circuited rows would under-count every constraint evaluated
    after another failure and skew the ranking. Plan shape is the
    hot_keys recipe: groupBy(keywordLocation) with map-side partials,
    orderBy+limit = TakeOrderedAndProject (per-partition top-k, never
    a global sort), share from a broadcast one-row total, rank window
    over only the k survivors; ties break to the ascending location
    cross-engine.
    """
    from pyspark.sql import Window

    v = violations(df, schema, id_cols=list(id_cols), doc_col=doc_col,
                   short_circuit=False)
    g = v.groupBy("keywordLocation").agg(
        F.count(F.lit(1)).cast("long").alias("n_violations"))
    tot = g.agg(F.sum("n_violations").alias("_t"))
    top = g.orderBy(F.col("n_violations").desc(),
                    F.col("keywordLocation")).limit(k)
    w = Window.orderBy(F.col("n_violations").desc(),
                       F.col("keywordLocation"))
    return top.crossJoin(F.broadcast(tot)).select(
        "keywordLocation", "n_violations",
        F.floor((F.col("n_violations") * 1_000_000).cast("double")
                / F.col("_t")).cast("long").alias("share_ppm"),
    ).withColumn("rnk", F.row_number().over(w).cast("long"))
