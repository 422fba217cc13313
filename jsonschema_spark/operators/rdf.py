"""`rdf` command analogue — promote valid instances to JSON-LD.

The reference evaluates an instance against a schema annotated with
`x-jsonld-*` keywords and, when valid, prints the instance in JSON-LD
EXPANDED form (/root/reference/docs/rdf.markdown;
src/command_rdf.cc) — the schema doubles as the `@context`, so meaning
can't drift from validation.

Subset implemented (the annotation vocabulary's core):
- `x-jsonld-id`        property subschema → predicate IRI
- `x-jsonld-type`      object subschema   → node `@type` (IRI or list)
- `x-jsonld-datatype`  scalar subschema   → typed literal `@type`
- `x-jsonld-language`  string subschema   → language-tagged literal
- `x-jsonld-json`      any subschema      → opaque `@json` literal
Flatten/compact forms and `@reverse`/`@graph`/`@container` are documented
out-of-subset (the reference itself marks the command experimental).

Expansion rules (JSON-LD 1.1 expanded document form): properties without
an `x-jsonld-id` mapping are dropped; scalars become `{"@value": v}`
objects (plus `@type`/`@language`); every predicate's value is an array.

Spark shape: the expansion runs row-wise over JSON documents — an
Arrow-batched pandas UDF (`jsonld_expand`), composed behind `validate`
so only valid rows are promoted (exactly the CLI's gate).
"""

from __future__ import annotations

import json
from typing import Optional, Union

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import StringType


def _scalar_literal(node_schema: dict, v):
    if node_schema.get("x-jsonld-json") is True:
        return {"@value": v, "@type": "@json"}
    out = {"@value": v}
    dt = node_schema.get("x-jsonld-datatype")
    if isinstance(dt, str):
        out["@type"] = dt
    elif isinstance(v, str):
        lang = node_schema.get("x-jsonld-language")
        if isinstance(lang, str):
            out["@language"] = lang
    return out


def _expand(schema: Union[dict, bool], v):
    """Expanded form of one value under its subschema annotations; None ⇒
    dropped (no term mapping)."""
    if not isinstance(schema, dict):
        schema = {}
    if schema.get("x-jsonld-json") is True:
        return {"@value": v, "@type": "@json"}
    if isinstance(v, dict):
        node: dict = {}
        ntype = schema.get("x-jsonld-type")
        if isinstance(ntype, str):
            node["@type"] = [ntype]
        elif isinstance(ntype, list):
            node["@type"] = list(ntype)
        props = schema.get("properties") or {}
        for name, val in v.items():
            sub = props.get(name)
            if not isinstance(sub, dict):
                continue
            iri = sub.get("x-jsonld-id")
            if not isinstance(iri, str):
                continue
            if isinstance(val, list):
                items_schema = sub.get("items") if isinstance(sub.get("items"), dict) else sub
                expanded = [_expand(items_schema, x) for x in val]
                node[iri] = [e for e in expanded if e is not None]
            else:
                e = _expand(sub, val)
                if e is not None:
                    node[iri] = [e]
        return node or None
    if isinstance(v, list):
        items_schema = schema.get("items") if isinstance(schema.get("items"), dict) else {}
        return [e for e in (_expand(items_schema, x) for x in v) if e is not None]
    return _scalar_literal(schema, v)


def to_jsonld(schema: Union[dict, bool], instance) -> Optional[dict]:
    """Driver-side: one instance → JSON-LD expanded node object (or None
    when nothing maps)."""
    return _expand(schema if isinstance(schema, dict) else {}, instance)


def jsonld_expand(doc_col: Column, schema: Union[dict, bool]) -> Column:
    """JSON-document column → expanded JSON-LD string column."""

    @F.pandas_udf(StringType())
    def _udf(s: pd.Series) -> pd.Series:
        def one(text):
            if text is None:
                return None
            node = to_jsonld(schema, json.loads(text))
            return None if node is None else json.dumps(
                node, sort_keys=True, separators=(",", ":"), ensure_ascii=False)

        return s.map(one)

    return _udf(doc_col)


def rdf_df(
    df: DataFrame,
    schema: Union[dict, bool],
    doc_col: str,
    out_col: str = "jsonld",
    **validate_kwargs,
) -> DataFrame:
    """The full command shape: validate, then promote VALID rows only
    (invalid rows carry NULL, mirroring the CLI's refuse-to-emit)."""
    from jsonschema_spark.operators.validate import validate

    val = validate(df, schema, doc_col=doc_col, **validate_kwargs)
    return val.withColumn(
        out_col,
        F.when(F.col("valid"), jsonld_expand(F.col(doc_col), schema)),
    )
