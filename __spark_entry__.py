"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: violation rows for the `documents` table at
sf0.001 in the reference's standard Basic output shape.

``queries()`` / ``oracle_sql()`` — one entry per implemented operator from
SURVEY.md §2, each with a DuckDB-runnable ANSI-SQL oracle expressing the
same semantics. Exact-arithmetic tricks keep the value-hash stable across
engines: float aggregates are reported as ``floor(x*1000)`` bigints,
timestamps as formatted strings, and message text is built with the same
concat logic on both sides.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import DataFrame, SparkSession, functions as F

from jsonschema_spark import compile_schema, validate, violations, verdict_counts
from jsonschema_spark.operators.stats import category_drift, numeric_quantiles, profile_long

# ---------------------------------------------------------------------------
# Fixture schemas (planted to produce real violations on the synthetic data)
# ---------------------------------------------------------------------------

DOC_LANGS = ["de", "en", "es", "fr"]  # 'zh' excluded → enum violations

DOCS_SCHEMA = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "$id": "https://example.com/documents.schema.json",
    "type": "object",
    "required": ["doc_id", "text", "lang"],
    "properties": {
        "doc_id": {"type": "integer", "minimum": 0},
        "text": {"type": "string", "minLength": 1, "maxLength": 400},
        "lang": {"type": "string", "enum": DOC_LANGS},
        "source": {"type": "string", "pattern": "^src[0-9]$"},
        "n_chars": {"type": "integer", "minimum": 1, "maximum": 300},
    },
}

EVENTS_PAYLOAD_SCHEMA = {
    "$id": "https://example.com/event-payload.schema.json",
    "type": "object",
    "required": ["k"],
    "properties": {"k": {"type": "integer", "minimum": 0, "maximum": 50}},
}

_BASE = DOCS_SCHEMA["$id"]

# The SQL predicate mirror of DOCS_SCHEMA (absent/null property ⇒ vacuous)
_DOCS_VALID_SQL = """
    (doc_id IS NOT NULL AND text IS NOT NULL AND lang IS NOT NULL)
    AND (doc_id IS NULL OR doc_id >= 0)
    AND (text IS NULL OR (length(text) >= 1 AND length(text) <= 400))
    AND (lang IS NULL OR lang IN ('de','en','es','fr'))
    AND (source IS NULL OR regexp_matches(source, '^src[0-9]$'))
    AND (n_chars IS NULL OR (n_chars >= 1 AND n_chars <= 300))
"""

# events payload: JSON object with required integer k in [0, 50]
_EVENTS_VALID_SQL = """
    (props IS NOT NULL AND json_valid(props)
     AND json_extract(props, '$.k') IS NOT NULL
     AND try_cast(props ->> '$.k' AS DOUBLE) IS NOT NULL
     AND try_cast(props ->> '$.k' AS DOUBLE) = floor(try_cast(props ->> '$.k' AS DOUBLE))
     AND try_cast(props ->> '$.k' AS DOUBLE) >= 0
     AND try_cast(props ->> '$.k' AS DOUBLE) <= 50)
"""


def _t(sf_dir: str, name: str):
    return f"{sf_dir}/{name}.parquet"


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(_t(sf_dir, "documents"))


# ---------------------------------------------------------------------------
# Queries (Spark side)
# ---------------------------------------------------------------------------


def q_validate_docs_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return verdict_counts(_docs(spark, sf_dir), DOCS_SCHEMA)


def q_validate_docs_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    return verdict_counts(_docs(spark, sf_dir), DOCS_SCHEMA, by=["lang"])


def q_violations_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return violations(_docs(spark, sf_dir), DOCS_SCHEMA, id_cols=["doc_id"], short_circuit=False)


def q_validate_events_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(_t(sf_dir, "events"))
    v = validate(ev, EVENTS_PAYLOAD_SCHEMA, doc_col="props")
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("valid").cast("long")).alias("n_valid"),
        F.sum((~F.col("valid")).cast("long")).alias("n_invalid"),
    )


def q_violations_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tree-path violation rows with exact reference message wording
    (dynamic type tags via schema_of_variant)."""
    ev = spark.read.parquet(_t(sf_dir, "events"))
    return violations(
        ev, EVENTS_PAYLOAD_SCHEMA, id_cols=["event_id"], doc_col="props", short_circuit=False
    )


NESTED_ORDER_SCHEMA = {
    "$id": "https://example.com/order-doc.schema.json",
    "type": "object",
    "required": ["id", "status", "amounts"],
    "properties": {
        "id": {"type": "integer", "minimum": 1},
        "status": {"type": "string", "enum": ["F", "O", "P"]},
        "amounts": {
            "type": "array",
            "minItems": 2,
            "items": {"type": "number", "exclusiveMinimum": 0},
            "contains": {"minimum": 100000},
        },
        "meta": {
            "type": "object",
            "required": ["priority"],
            "properties": {"priority": {"type": "string", "pattern": "^[1-3]-"}},
        },
    },
}


def q_validate_nested_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tree-path engine over synthesized nested JSON documents (object →
    array items / contains / nested object pattern), verdict counts by
    status; the oracle evaluates the same predicates on the flat columns."""
    o = spark.read.parquet(_t(sf_dir, "orders"))
    doc = F.to_json(
        F.struct(
            F.col("o_orderkey").alias("id"),
            F.col("o_orderstatus").alias("status"),
            F.array(F.col("o_totalprice"), F.col("o_totalprice") * 2).alias("amounts"),
            F.struct(F.col("o_orderpriority").alias("priority")).alias("meta"),
        )
    )
    v = validate(o.withColumn("doc", doc), NESTED_ORDER_SCHEMA, doc_col="doc")
    return v.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("valid").cast("long")).alias("n_valid"),
        F.sum((~F.col("valid")).cast("long")).alias("n_invalid"),
    )


PROPS_LOOP_SCHEMA = {
    "$id": "https://example.com/props-loop.schema.json",
    "type": "object",
    "patternProperties": {"^v_": {"type": "number", "maximum": 250}},
    "propertyNames": {"pattern": "^(v_[a-z]+|note)$"},
    "additionalProperties": {"type": "string"},
}


def q_validate_pattern_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tree-path property loops (patternProperties / propertyNames /
    additionalProperties) over dynamic-keyed JSON built from events:
    key = v_<event_type> (X_error for error events). Valid ⟺ not error
    and value ≤ 250 — the oracle re-derives that from the flat columns."""
    ev = spark.read.parquet(_t(sf_dir, "events"))
    key = F.when(F.col("event_type") == "error", F.lit("X_error")).otherwise(
        F.concat(F.lit("v_"), F.col("event_type"))
    )
    doc = F.concat(
        F.lit('{"'), key, F.lit('": '), F.col("value").cast("string"),
        F.lit(', "note": "'), F.col("event_type"), F.lit('"}'),
    )
    v = validate(ev.withColumn("doc", doc), PROPS_LOOP_SCHEMA, doc_col="doc")
    return v.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("valid").cast("long")).alias("n_valid"),
        F.sum((~F.col("valid")).cast("long")).alias("n_invalid"),
    )


# ---------------------------------------------------------------------------
# Keyword-family coverage queries (SURVEY §2.2): every keyword group gets a
# green CORRECTNESS row, not just a pytest. Each schema is planted so the
# synthetic data produces a real pass/fail split on every branch.
# ---------------------------------------------------------------------------

COMBO_BASE = "https://example.com/combo.schema.json"

COMBO_SCHEMA = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "$id": COMBO_BASE,
    "type": "object",
    "allOf": [
        {"not": {"properties": {"lang": {"const": "zh"}}}},
        {"dependentRequired": {"source": ["n_chars"]}},
    ],
    "anyOf": [
        {"properties": {"source": {"pattern": "^src1"}}},
        {"properties": {"n_chars": {"minimum": 200}}},
    ],
    "oneOf": [
        {"properties": {"n_chars": {"multipleOf": 2}}},
        {"properties": {"n_chars": {"minimum": 300}}},
    ],
    "if": {"properties": {"lang": {"const": "en"}}},
    "then": {"properties": {"n_chars": {"minimum": 100}}},
    "else": {"properties": {"n_chars": {"maximum": 500}}},
    "dependentSchemas": {"text": {"properties": {"n_chars": {"minimum": 50}}}},
}


def q_validate_combinators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """allOf/anyOf/oneOf/not/if-then-else + const + dependentRequired +
    dependentSchemas in one flat-path compile (Group D, dispatch.h:1207-1435)."""
    return verdict_counts(_docs(spark, sf_dir), COMBO_SCHEMA, by=["lang"])


def q_violations_combinators(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Violation rows for the combinator schema (exhaustive, all failing
    conjuncts) — exercises the anyOf all-branch reporting, the oneOf
    zero-vs-many split, and the conditional's /if own-entry."""
    return violations(
        _docs(spark, sf_dir), COMBO_SCHEMA, id_cols=["doc_id"], short_circuit=False
    )


LADDER_BASE = "https://example.com/lineitem-ladder.schema.json"

LADDER_SCHEMA = {
    "$id": LADDER_BASE,
    "type": "object",
    "properties": {
        # the four multipleOf exactness-ladder branches (json_value.cc:801-857):
        "l_orderkey": {"type": "integer", "multipleOf": 3},        # int % int
        "l_quantity": {"type": "number", "multipleOf": 2},         # real / int divisor
        "l_extendedprice": {"type": "number", "multipleOf": 0.25},  # pow-2 scaling
        "l_discount": {"type": "number", "multipleOf": 0.03},      # decimal pudf
    },
}


def q_validate_multipleof(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jsonschema_spark.operators.validate import property_verdicts

    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    pv = property_verdicts(li, LADDER_SCHEMA)
    return pv.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("ok_l_orderkey").cast("long")).alias("n_div3"),
        F.sum(F.col("ok_l_quantity").cast("long")).alias("n_div2"),
        F.sum(F.col("ok_l_extendedprice").cast("long")).alias("n_div_quarter"),
        F.sum(F.col("ok_l_discount").cast("long")).alias("n_div_3cent"),
    )


UNIQ_BASE = "https://example.com/uniq.schema.json"

UNIQ_SCHEMA = {
    "$id": UNIQ_BASE,
    "$defs": {"poscode": {"$anchor": "pos", "type": "integer", "minimum": 1}},
    "type": "object",
    "required": ["codes", "seq", "key"],
    "properties": {
        "codes": {"type": "array", "uniqueItems": True},
        "seq": {
            "type": "array",
            "prefixItems": [{"const": "hdr"}, {"$ref": "#pos"}],
            "items": {"type": "integer", "maximum": 100},
        },
        "key": {"$ref": "#/$defs/poscode"},
    },
}


def q_validate_uniq_prefix_ref(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tree-path uniqueItems + prefixItems + items-from-k + $ref (pointer
    AND $anchor forms) + const over synthesized mixed-type JSON docs.

    Planted failures: codes duplicates when orderkey%5==0; seq[1] < 1 when
    orderkey%50==0; seq[2] > 100 when orderkey%150 > 100."""
    o = spark.read.parquet(_t(sf_dir, "orders"))
    second = F.when(
        F.col("o_orderkey") % 5 == 0, F.col("o_orderstatus")
    ).otherwise(F.substring(F.col("o_orderpriority"), 1, 1))
    doc = F.concat(
        F.lit('{"codes": ["'), F.col("o_orderstatus"), F.lit('", "'), second,
        F.lit('"], "seq": ["hdr", '), (F.col("o_orderkey") % 50).cast("string"),
        F.lit(", "), (F.col("o_orderkey") % 150).cast("string"),
        F.lit('], "key": '), F.col("o_orderkey").cast("string"), F.lit("}"),
    )
    v = validate(o.withColumn("doc", doc), UNIQ_SCHEMA, doc_col="doc")
    return v.groupBy(F.col("o_orderstatus").alias("status")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("valid").cast("long")).alias("n_valid"),
        F.sum((~F.col("valid")).cast("long")).alias("n_invalid"),
    )


UNEVAL_BASE = "https://example.com/uneval.schema.json"

UNEVAL_SCHEMA = {
    "$id": UNEVAL_BASE,
    "anyOf": [
        {"required": ["a"], "properties": {"a": {"type": "integer"}}},
        {"required": ["b"], "properties": {"b": {"type": "integer"}}},
    ],
    "unevaluatedProperties": False,
}


def q_validate_unevaluated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Disjunctive unevaluatedProperties (runtime evaluated-key predicates,
    the checkpoint/rewind analogue): four planted doc shapes per event —
    {"a"}, {"b"}, {"a","z"} (z never evaluated), {"a","b"} — with error
    events making "a" a string so branch 0 fails and "a" itself becomes
    unevaluated."""
    ev = spark.read.parquet(_t(sf_dir, "events"))
    v = (F.col("event_id") % 100).cast("string")
    a_val = F.when(F.col("event_type") == "error", F.lit('"s"')).otherwise(v)
    m = F.col("event_id") % 4
    doc = (
        F.when(m == 0, F.concat(F.lit('{"a": '), a_val, F.lit("}")))
        .when(m == 1, F.concat(F.lit('{"b": '), v, F.lit("}")))
        .when(m == 2, F.concat(F.lit('{"a": '), a_val, F.lit(', "z": 1}')))
        .otherwise(F.concat(F.lit('{"a": '), a_val, F.lit(', "b": '), v, F.lit("}")))
    )
    val = validate(ev.withColumn("doc", doc), UNEVAL_SCHEMA, doc_col="doc")
    return val.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("valid").cast("long")).alias("n_valid"),
        F.sum((~F.col("valid")).cast("long")).alias("n_invalid"),
    )


_UNEVAL_SQL = """
SELECT event_type, count(*) AS n_rows,
       sum(CASE WHEN ok THEN 1 ELSE 0 END)::BIGINT AS n_valid,
       sum(CASE WHEN ok THEN 0 ELSE 1 END)::BIGINT AS n_invalid
FROM (SELECT event_type,
             CASE (event_id % 4)
               WHEN 1 THEN TRUE          -- {"b": int}
               WHEN 2 THEN FALSE         -- "z" is never evaluated
               ELSE event_type <> 'error' -- {"a"} / {"a","b"}: branch 0 must hold
             END AS ok
      FROM events)
GROUP BY 1
"""


ANNOT_BASE = "https://example.com/annot.schema.json"

ANNOT_SCHEMA = {
    "$id": ANNOT_BASE,
    "title": "Docs",
    "properties": {
        "lang": {"type": "string", "enum": DOC_LANGS, "description": "language"},
        "n_chars": {"type": "integer", "minimum": 50, "x-unit": "chars"},
    },
}


def q_annotations_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Annotation emission (AnnotationEmit analogue): title at the root,
    the properties name-list, a meta-data keyword and an unknown x-*
    keyword on children — each gated on its node validating (annotations
    from failing schema objects are dropped)."""
    from jsonschema_spark.operators.annotations import annotations

    return annotations(_docs(spark, sf_dir), ANNOT_SCHEMA, id_cols=["doc_id"])


_ANNOT_SQL = f"""
WITH d AS (
  SELECT doc_id,
         ((lang IS NULL OR lang IN ('de','en','es','fr'))
          AND (n_chars IS NULL OR n_chars >= 50)) AS root_ok,
         (lang IS NOT NULL AND lang IN ('de','en','es','fr')) AS lang_ok,
         (n_chars IS NOT NULL AND n_chars >= 50) AS nchars_ok,
         lang, n_chars
  FROM documents
)
SELECT doc_id, '/title' AS keywordLocation, '{ANNOT_BASE}#/title' AS absoluteKeywordLocation,
       '' AS instanceLocation, '["Docs"]' AS annotation
FROM d WHERE root_ok
UNION ALL
SELECT doc_id, '/properties', '{ANNOT_BASE}#/properties', '',
       concat('[',
              CASE WHEN lang IS NOT NULL THEN '"lang"' ELSE '' END,
              CASE WHEN lang IS NOT NULL AND n_chars IS NOT NULL THEN ',' ELSE '' END,
              CASE WHEN n_chars IS NOT NULL THEN '"n_chars"' ELSE '' END,
              ']')
FROM d WHERE root_ok
UNION ALL
SELECT doc_id, '/properties/lang/description', '{ANNOT_BASE}#/properties/lang/description',
       '/lang', '["language"]'
FROM d WHERE root_ok AND lang_ok
UNION ALL
SELECT doc_id, '/properties/n_chars/x-unit', '{ANNOT_BASE}#/properties/n_chars/x-unit',
       '/n_chars', '["chars"]'
FROM d WHERE root_ok AND nchars_ok
"""


RECURSE_BASE = "https://example.com/thread.schema.json"

RECURSE_SCHEMA = {
    "$id": RECURSE_BASE,
    "$defs": {
        "node": {
            "type": "object",
            "required": ["v"],
            "properties": {
                "v": {"type": "integer", "minimum": 0},
                "reply": {"$ref": "#/$defs/node"},
            },
        }
    },
    "$ref": "#/$defs/node",
}


def q_validate_recursive(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-recursive $ref (comment-thread shape) on the tree path — the
    compiler unrolls the reference to max_ref_depth (default 6); fixture
    threads nest 1–4 levels, so validation is exact. Planted failures:
    v < 0 at every level when event_id % 97 < 3."""
    ev = spark.read.parquet(_t(sf_dir, "events"))
    levels = (F.col("event_id") % 4).cast("int")
    v = (F.col("event_id") % 97 - 3).cast("string")
    unit = F.concat(F.lit('{"v": '), v, F.lit(', "reply": '))
    doc = F.concat(
        F.repeat(unit, levels),
        F.lit('{"v": '), v, F.lit("}"),
        F.repeat(F.lit("}"), levels),
    )
    val = validate(ev.withColumn("doc", doc), RECURSE_SCHEMA, doc_col="doc")
    return val.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("valid").cast("long")).alias("n_valid"),
        F.sum((~F.col("valid")).cast("long")).alias("n_invalid"),
    )


_RECURSE_SQL = """
SELECT event_type, count(*) AS n_rows,
       sum(CASE WHEN (event_id % 97) >= 3 THEN 1 ELSE 0 END)::BIGINT AS n_valid,
       sum(CASE WHEN (event_id % 97) >= 3 THEN 0 ELSE 1 END)::BIGINT AS n_invalid
FROM events GROUP BY 1
"""


# Cross-resource dynamic scope: the extending resource's $dynamicAnchor
# overrides the base list's element schema (2020-12 core §8.2.3.2;
# reference runtime stack dispatch.h:1523-1549 — resolved statically here
# because every reference is inlined, see compiler._resolve_dynamic_ref).
DYN_LIST_BASE = {
    "$id": "https://example.com/list.schema.json",
    "$defs": {"default-elem": {"$dynamicAnchor": "elem"}},
    "type": "array",
    "items": {"$dynamicRef": "#elem"},
}
DYN_INT_LIST = {
    "$id": "https://example.com/intlist.schema.json",
    "$defs": {"int-elem": {"$dynamicAnchor": "elem", "type": "integer",
                           "maximum": 90}},
    "$ref": "https://example.com/list.schema.json",
}


def q_validate_dynamic_ref(spark: SparkSession, sf_dir: str) -> DataFrame:
    """$dynamicRef across resources on the tree path: the int-list
    extension constrains the generic list's elements. Synthesized docs:
    [e%7, e%97] with a planted string element when e%5 == 0 — valid iff
    no string AND every int <= 90."""
    ev = spark.read.parquet(_t(sf_dir, "events"))
    e = F.col("event_id")
    doc = F.concat(
        F.lit("["), (e % 7).cast("string"), F.lit(", "),
        F.when(e % 5 == 0, F.lit('"x", ')).otherwise(F.lit("")),
        (e % 97).cast("string"), F.lit("]"),
    )
    cs = compile_schema(
        DYN_INT_LIST,
        resolver={"https://example.com/list.schema.json": DYN_LIST_BASE},
    )
    val = validate(ev.withColumn("doc", doc), cs, doc_col="doc")
    return val.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("valid").cast("long")).alias("n_valid"),
        F.sum((~F.col("valid")).cast("long")).alias("n_invalid"),
    )


_DYNREF_SQL = """
SELECT event_type, count(*) AS n_rows,
       sum(CASE WHEN (event_id % 5) <> 0 AND (event_id % 97) <= 90
                THEN 1 ELSE 0 END)::BIGINT AS n_valid,
       sum(CASE WHEN (event_id % 5) <> 0 AND (event_id % 97) <= 90
                THEN 0 ELSE 1 END)::BIGINT AS n_invalid
FROM events GROUP BY 1
"""


ENTRY_DOC_SCHEMA = {
    "$id": "https://example.com/entry.schema.json",
    "$defs": {
        "amount": {"type": "integer", "minimum": 0, "maximum": 100},
        "order": {"type": "object", "required": ["amt"],
                  "properties": {"amt": {"$ref": "#/$defs/amount"}}},
    },
    "type": "object",
    "required": ["orders"],
}


def q_validate_entrypoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """--entrypoint analogue: validate instances against the subschema at
    #/$defs/order while its $refs keep resolving against the FULL document
    (the whole-document schema would reject these instances outright)."""
    from jsonschema_spark import compile_entrypoint

    ev = spark.read.parquet(_t(sf_dir, "events"))
    e = F.col("event_id")
    doc = F.concat(F.lit('{"amt": '), (e % 150 - 10).cast("string"), F.lit("}"))
    cs = compile_entrypoint(ENTRY_DOC_SCHEMA, "#/$defs/order")
    val = validate(ev.withColumn("doc", doc), cs, doc_col="doc")
    return val.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("valid").cast("long")).alias("n_valid"),
        F.sum((~F.col("valid")).cast("long")).alias("n_invalid"),
    )


_ENTRYPOINT_SQL = """
SELECT event_type, count(*) AS n_rows,
       sum(CASE WHEN (event_id % 150) BETWEEN 10 AND 110
                THEN 1 ELSE 0 END)::BIGINT AS n_valid,
       sum(CASE WHEN (event_id % 150) BETWEEN 10 AND 110
                THEN 0 ELSE 1 END)::BIGINT AS n_invalid
FROM events GROUP BY 1
"""


BINPACK_SCHEMA = {
    "type": "object", "required": ["k", "lang"],
    "additionalProperties": False,
    "properties": {
        "k": {"type": "integer", "minimum": 0, "maximum": 250},
        "lang": {"enum": ["de", "en", "es", "fr"]},
        "msg": {"type": "string"},
    },
}


def q_binpack_sizes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-driven binary codec (encode/decode analogue): byte sizes are
    fully determined by the plan — presence varint (1) + bounded-int k (1)
    + enum lang (1) + string msg (1 + len) — so DuckDB can compute them
    exactly; round-trip equality is asserted per row."""
    from jsonschema_spark.functions.canonical import canonical_json
    from jsonschema_spark.operators.binpack import binpack_decode, binpack_encode

    ev = spark.read.parquet(_t(sf_dir, "events"))
    e = F.col("event_id")
    doc = F.concat(
        F.lit('{"k": '), (e % 251).cast("string"),
        F.lit(', "lang": "'),
        F.element_at(F.array(F.lit("de"), F.lit("en"), F.lit("es"), F.lit("fr")),
                     (e % 4 + 1).cast("int")),
        F.lit('", "msg": "m'), e.cast("string"), F.lit('"}'),
    )
    enc = ev.select("event_type", "event_id", doc.alias("doc")).withColumn(
        "bin", binpack_encode(F.col("doc"), BINPACK_SCHEMA)
    )
    out = enc.withColumn("doc2", binpack_decode(F.col("bin"), BINPACK_SCHEMA))
    return out.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.length("bin").cast("long")).alias("n_bytes"),
        F.sum((canonical_json(F.col("doc")) == F.col("doc2")).cast("long")).alias("n_roundtrip_ok"),
    )


_BINPACK_SQL = """
SELECT event_type, count(*) AS n_rows,
       sum(5 + length(event_id::VARCHAR))::BIGINT AS n_bytes,
       count(*)::BIGINT AS n_roundtrip_ok
FROM events GROUP BY 1
"""


# format-family fixtures: three literals per format, selected per row by
# event_id % 3. Every literal is dialect-safe (Java∩RE2 regex subset), so
# the SAME regex text runs on both engines; the count per format proves the
# template pair agrees. ("regex" is compile-try in Spark; its oracle uses a
# bracket-balance check that agrees on these fixtures — documented approx.)
_FMT_TRIPLES: dict[str, tuple[str, str, str]] = {
    "uri": ("https://example.com/a?b=1", "ftp://host/path#frag", "http://exa mple.com/"),
    "uri-reference": ("/path/to?q=1", "../rel/ref", "%2"),
    "iri": ("mailto:user@example.com", "urn:isbn:0451450523", "not a uri"),
    "iri-reference": ("//host/x", "frag", " spaced ref"),
    "uri-template": ("/users/{id}", "/map{?x,y}", "/bad{unclosed"),
    "date-time": ("2024-02-29T12:30:45Z", "2021-06-01t23:59:60+05:30", "2021-13-01T00:00:00Z"),
    "date": ("2023-04-30", "2020-02-29", "2021-02-30"),
    "time": ("23:59:59Z", "00:00:00+09:30", "24:00:00Z"),
    "partial-time": ("12:34:56", "23:59:60", "12:34:56Z"),
    "duration": ("P3Y6M4DT12H30M5S", "PT0.5S", "P"),
    "ipv4": ("192.168.0.1", "255.255.255.255", "256.1.1.1"),
    "ipv6": ("2001:db8::8a2e:370:7334", "::1", "fe80:::1"),
    "hostname": ("example.com", "a-b.c-d.e", "host-.example.com"),
    "idn-hostname": ("example.com", "xn--bcher-kva.example", "-bad.example"),
    "email": ("user.name@example.com", "u+tag@sub.example.org", "u@@example.com"),
    "idn-email": ("a@b.co", "x_y@ex.com", "no-at-sign"),
    "uuid": (
        "123e4567-e89b-12d3-a456-426614174000",
        "00000000-0000-0000-0000-000000000000",
        "123e4567e89b12d3a456426614174000",
    ),
    "json-pointer": ("/a/b~1c", "", "a/b"),
    "relative-json-pointer": ("0#", "2/a/b", "/a"),
    "color": ("#fff", "maroon", "#ff"),
    "regex": ("^a[b-d]+$", "x|y", "(ab"),
}


def q_validate_formats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All 21 logical string formats (§2.4) in one pass: per-format valid
    counts over fixture strings cycled by event_id."""
    from jsonschema_spark.functions.formats import format_ok

    ev = spark.read.parquet(_t(sf_dir, "events"))
    fmts = sorted(_FMT_TRIPLES)
    sel = {
        f: F.element_at(
            F.array(*[F.lit(x) for x in _FMT_TRIPLES[f]]),
            (F.pmod(F.col("event_id"), F.lit(3)) + 1).cast("int"),
        )
        for f in fmts
    }
    agg = ev.agg(
        F.count(F.lit(1)).alias("_n"),
        *[F.sum(format_ok(f, sel[f]).cast("long")).alias(f"_ok{i}") for i, f in enumerate(fmts)],
    )
    entries = F.array(
        *[
            F.struct(
                F.lit(f).alias("fmt"),
                F.col("_n").alias("n_rows"),
                F.col(f"_ok{i}").alias("n_ok"),
            )
            for i, f in enumerate(fmts)
        ]
    )
    return agg.select(F.explode(entries).alias("e")).select("e.fmt", "e.n_rows", "e.n_ok")


def q_profile_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile_long(_docs(spark, sf_dir), ["doc_id", "text", "lang", "source", "n_chars"])


def q_quantiles_n_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    return numeric_quantiles(_docs(spark, sf_dir), "n_chars", [0.25, 0.5, 0.75])


def q_drift_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    return category_drift(_docs(spark, sf_dir), "lang", F.col("doc_id") % 2 == 0)


def q_drift_n_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample KS over text length (baseline = even doc_ids):
    max ECDF gap in integer ppm over every distinct value."""
    from jsonschema_spark.operators.stats import numeric_drift

    return numeric_drift(_docs(spark, sf_dir), "n_chars", F.col("doc_id") % 2 == 0)


_DRIFT_NUM_SQL = """
WITH g AS (
  SELECT n_chars AS v,
         sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS nb,
         sum(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END)::BIGINT AS nc
  FROM documents WHERE n_chars IS NOT NULL GROUP BY 1
),
c AS (
  SELECT sum(nb) OVER (ORDER BY v) AS cb, sum(nc) OVER (ORDER BY v) AS cc,
         sum(nb) OVER () AS tb, sum(nc) OVER () AS tc
  FROM g
)
SELECT max(abs((cb * 1000000) // greatest(tb, 1)
             - (cc * 1000000) // greatest(tc, 1)))::BIGINT AS ks_ppm,
       max(tb)::BIGINT AS n_base, max(tc)::BIGINT AS n_cur
FROM c
"""


def q_dedup_exact_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.count_distinct(F.md5(F.col("text"))).alias("n_distinct_text"),
        (F.count(F.lit(1)) - F.count_distinct(F.md5(F.col("text")))).alias("n_dup_docs"),
    )


def q_dedup_exact_keep_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return d.groupBy(F.md5(F.col("text")).alias("text_key")).agg(
        F.min("doc_id").alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )


def q_referential_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    return (
        d.filter(~F.col("lang").isin(DOC_LANGS) | F.col("lang").isNull())
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n_bad"))
    )


def q_referential_orders_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = spark.read.parquet(_t(sf_dir, "orders"))
    c = spark.read.parquet(_t(sf_dir, "customer")).select("c_custkey")
    j = o.join(F.broadcast(c), o.o_custkey == c.c_custkey, "left")
    return j.agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.count("c_custkey").alias("n_matched"),
        (F.count(F.lit(1)) - F.count("c_custkey")).alias("n_orphans"),
    )


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = spark.read.parquet(_t(sf_dir, "events"))
    return ev.groupBy(
        F.date_format(F.date_trunc("hour", F.col("ts")), "yyyy-MM-dd HH:mm:ss").alias("hour"),
        F.col("event_type"),
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.floor(F.col("value") * 1000).cast("long")).alias("value_milli"),
    )


def q_binary_sha256(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = _docs(spark, sf_dir)
    payload = F.encode(F.col("text"), "UTF-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        F.sha2(payload, 256).alias("sha"),
    )


# --- dedup family (documents) ------------------------------------------------
# unigram shingles on this synthetic corpus (32-word vocabulary → real overlap)


def q_dedup_minhash_sig(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jsonschema_spark.operators.dedup import minhash_signatures_df

    sig = minhash_signatures_df(_docs(spark, sf_dir), "doc_id", "text", k=12, shingle_n=1)
    entries = F.array(
        *[
            F.struct(F.lit(j).cast("long").alias("seed"), F.col(f"mh{j}").alias("mh"))
            for j in range(12)
        ]
    )
    return sig.select(F.col("_id").alias("doc_id"), F.explode(entries).alias("e")).select(
        "doc_id", "e.seed", "e.mh"
    )


def _docs_with_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ planted near-duplicates (first token dropped) of the
    first 50 docs — gives the pair queries real positives while 3-gram
    shingling keeps the candidate space scale-sane (no degenerate
    buckets, unlike unigrams on this tiny synthetic vocabulary)."""
    d = _docs(spark, sf_dir).select("doc_id", "text")
    mut = d.filter(F.col("doc_id") < 50).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.regexp_replace(F.col("text"), r"^\S+\s*", "").alias("text"),
    )
    return d.unionAll(mut)


def q_dedup_minhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jsonschema_spark.operators.dedup import minhash_lsh_pairs

    return minhash_lsh_pairs(
        _docs_with_near_dups(spark, sf_dir), "doc_id", "text", k=12, bands=6, shingle_n=3
    )


def q_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the MinHash-LSH candidate pairs →
    (doc_id, cluster_id): the cluster-formation step a dedup pipeline
    runs after pair generation (keep-min-id canonical convention).
    Oracle: recursive-CTE transitive closure over the same pair set."""
    from jsonschema_spark.operators.dedup import dedup_clusters, minhash_lsh_pairs

    pairs = minhash_lsh_pairs(
        _docs_with_near_dups(spark, sf_dir), "doc_id", "text", k=12, bands=6, shingle_n=3
    )
    return dedup_clusters(pairs).orderBy("doc_id")


def q_dedup_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact all-pairs Jaccard (no cutoff) — deliberately, so the DuckDB
    oracle is an exact mirror. The corpus-scale invocation sets
    ``max_df`` (hot-shingle cutoff + exact rescoring) or composes
    ``jaccard_on_candidates`` with MinHash-LSH candidates; both tested in
    test_pipeline_ops."""
    from jsonschema_spark.operators.dedup import jaccard_pairs

    return jaccard_pairs(
        _docs_with_near_dups(spark, sf_dir), "doc_id", "text", shingle_n=3, min_ppm=500000
    )


def q_dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-shaped SimHash (explode → one codegen aggregation) — the
    expression form ``dedup.simhash`` stays available as a per-column
    fallback but runs 32 interpreted higher-order passes per row."""
    from jsonschema_spark.operators.dedup import simhash_df

    sim = simhash_df(_docs(spark, sf_dir), "doc_id", "text", bits=32)
    return sim.select(F.col("_id").alias("doc_id"), F.col("_sim").alias("sim"))


def q_dedup_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jsonschema_spark.operators.dedup import simhash_pairs

    return simhash_pairs(_docs(spark, sf_dir), "doc_id", "text", bits=32, n_bands=4, max_hamming=3)


def q_dedup_embedding_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jsonschema_spark.operators.dedup import embedding_near_dup_pairs

    e = spark.read.parquet(_t(sf_dir, "embeddings"))
    return embedding_near_dup_pairs(e, "vec_id", "embedding", min_cos_micro=450000)


# --- similarity search (embeddings) -------------------------------------------


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jsonschema_spark.operators.similarity import topk_bruteforce

    e = spark.read.parquet(_t(sf_dir, "embeddings"))
    return topk_bruteforce(e, e.filter(F.col("vec_id") < 10), "vec_id", "embedding", k=5)


def q_ann_topk_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jsonschema_spark.operators.similarity import topk_signlsh

    e = spark.read.parquet(_t(sf_dir, "embeddings"))
    return topk_signlsh(e, e.filter(F.col("vec_id") < 10), "vec_id", "embedding", k=5, sign_bits=8)


# --- text analysis (documents) -------------------------------------------------


def q_ann_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (the coarse-quantizer scale path named in the brief):
    in-engine centroids (one k-means step from hash-partitioned init),
    cell assignment as a literal projection, n_probe=2 of 8 cells,
    exact in-cell rescoring."""
    from jsonschema_spark.operators.similarity import topk_ivf

    emb = spark.read.parquet(_t(sf_dir, "embeddings"))
    q = emb.filter(F.col("vec_id") < 10)
    return topk_ivf(emb, q, "vec_id", "embedding", k=5, n_centroids=8, n_probe=2)


def _ann_ivf_sql() -> str:
    # deferred: _QEMB/_COS_MICRO are defined later in the module
    return f"""
{_QEMB},
pd AS (SELECT vec_id % 8 AS ci, i,
              floor((sum(qe[i])::BIGINT)::DOUBLE / count(*))::BIGINT AS cv
       FROM q, (SELECT unnest(range(1, 65)) AS i) ix GROUP BY 1, 2),
cent AS (SELECT ci, list(cv ORDER BY i) AS cv FROM pd GROUP BY ci),
d AS (SELECT q.vec_id, q.qe, c.ci,
             list_sum([(q.qe[i]-c.cv[i])*(q.qe[i]-c.cv[i]) for i in range(1, 65)]) AS dist
      FROM q, cent c),
asg AS (SELECT vec_id, qe, ci,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, ci ASC) AS rn
        FROM d),
corp AS (SELECT vec_id, qe, ci FROM asg WHERE rn = 1),
qp AS (SELECT vec_id, qe, ci FROM asg WHERE rn <= 2 AND vec_id < 10),
s AS (SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id, {_COS_MICRO} AS cos_micro
      FROM qp a JOIN corp b ON a.ci = b.ci AND b.vec_id != a.vec_id)
SELECT q_id, neighbor_id, rnk::BIGINT AS rnk, cos_micro FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id
                               ORDER BY cos_micro DESC, neighbor_id ASC) AS rnk
  FROM s) WHERE rnk <= 5
"""


def q_text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jsonschema_spark.operators.textstats import text_quality

    out = text_quality(_docs(spark, sf_dir), "doc_id", "text")
    return out.withColumn("is_quality", F.col("is_quality").cast("int"))


def q_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jsonschema_spark.operators.textstats import langid

    return langid(_docs(spark, sf_dir), "doc_id", "text")


def q_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    from jsonschema_spark.operators.textstats import fingerprints

    return fingerprints(_docs(spark, sf_dir), "doc_id", "text")


def q_webtext_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher/C4 doc-level quality filters over the documents table —
    word bounds scaled to the fixture corpus (<=400 chars), every ratio
    exact-integer ppm so DuckDB hash-matches."""
    from jsonschema_spark.operators.textstats import webtext_filters

    return webtext_filters(_docs(spark, sf_dir), "doc_id", "text",
                           min_words=10, max_words=100000, min_stopwords=1)



def q_gopher_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher repetition filters (Rae et al. 2021 Table A1): per-doc
    character-coverage of the most frequent {2,3,4}-gram and of duplicated
    {5,6}-grams, floor-ppm, plus the threshold conjunction. One scan, one
    tagged explode over all five n-gram families, two shuffles."""
    from jsonschema_spark.operators.textstats import repetition_stats

    return repetition_stats(_docs(spark, sf_dir), "doc_id", "text")


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split: portable md5 bucket in
    [0, 1e6) over 'split:doc_id', cumulative-ppm range assignment
    (98/1/1). Pure projection — zero shuffle; id-stable under corpus
    growth."""
    from jsonschema_spark.operators.curate import hash_split

    return hash_split(_docs(spark, sf_dir), "doc_id")


def q_clean_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Webtext normalization: control chars → space, whitespace runs
    collapsed, trimmed; before/after char counts. Pure-JVM regexp passes
    in the scan projection."""
    from jsonschema_spark.operators.textstats import clean_text

    return clean_text(_docs(spark, sf_dir), "doc_id", "text")


def q_token_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus token-budget accounting: whitespace words + GPT-2-style
    pretokenizer counts (RE2∩Java-safe regex — the SAME pattern text runs
    on both engines)."""
    from jsonschema_spark.operators.textstats import token_budget

    return token_budget(_docs(spark, sf_dir), "doc_id", "text")


def q_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style fluency scoring (Wenzek et al. 2020): an add-one bigram
    model trained IN-ENGINE on the reference-domain subset (source src0-2),
    every doc scored by mean smoothed bigram probability in integer ppm
    (bit-stable stand-in for negative perplexity — no transcendental log).
    Model side: one explode + one groupBy, broadcast to the scoring side;
    scoring: explode → two broadcast joins → one groupBy(doc)."""
    from jsonschema_spark.operators.lm import ngram_lm_score

    d = _docs(spark, sf_dir)
    ref = d.where(F.col("source").isin("src0", "src1", "src2"))
    return ngram_lm_score(d, "doc_id", "text", ref_df=ref)


def q_dsir_weight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023): hashed unigram buckets
    (portable md5 → 1024 buckets), per-bucket add-one probabilities for the
    target domain (source src0-2) vs the raw corpus, per-doc weight =
    Σ_tokens (p_target_ppm − p_raw_ppm). The 1024 bucket weights embed as
    one literal array, so scoring is a pure scan projection + one
    groupBy(doc) — zero joins."""
    from jsonschema_spark.operators.lm import dsir_weight

    d = _docs(spark, sf_dir)
    target = d.where(F.col("source").isin("src0", "src1", "src2"))
    return dsir_weight(d, "doc_id", "text", target_df=target, raw_df=d)


# labeled fixture for the trainable quality classifier: deterministic,
# ASCII-only (the Python training mirror's tokenizer contract), planted
# prose-vs-spam vocabulary plus open-vocab filler so buckets aren't
# degenerate. Embedded (not read from sf_dir) so oracle_sql() can train
# the bit-identical Python mirror without engine or file access.
_CLS_POS = ["research", "study", "history", "theory", "analysis",
            "evidence", "century", "language"]
_CLS_NEG = ["buy", "cheap", "click", "free", "winner", "casino", "pills",
            "offer"]


def _cls_fixture() -> list:
    rows = []
    for i in range(60):
        y = i % 2
        vocab = _CLS_POS if y else _CLS_NEG
        words = [vocab[(i * 3 + j) % len(vocab)] for j in range(8)]
        words.append(f"tok{i % 17}")
        rows.append((" ".join(words), y))
    return rows


# BPE training fixture: morphology-rich ASCII prose with shared stems and
# open-vocab filler, so early merges are linguistically meaningful
# (suffix families) and pair counts have no artificial ties. Embedded so
# oracle_sql() can train the bit-identical pure-Python mirror
# (operators/bpe.py:bpe_train_local) without engine or file access.
_BPE_FIXTURE = [
    "the lowest lower low slowest slower slow walker walked walking walks",
    "running runner runs run newest newer new tested testing tester tests",
    "the widest wider wide rider riding rides reading reader reads read",
    "builder building builds build strongest stronger strong longest longer",
    "teacher teaching teaches taught thinker thinking thinks think",
    "the crawling crawler crawls crawl indexing indexer indexes index",
    "token tokens tokenizer tokenized subword subwords merging merges",
    "fastest faster fast deepest deeper deep greatest greater great",
]
_BPE_N_MERGES = 20


def _bpe_fixture_word_counts() -> list:
    """(word, count) over the fixture via the same [a-z]+ contract the
    Spark side plans — pure Python, for the oracle's training mirror."""
    import re as _re

    counts: dict[str, int] = {}
    for t in _BPE_FIXTURE:
        for w in _re.findall("[a-z]+", t.lower()):
            counts[w] = counts.get(w, 0) + 1
    return sorted(counts.items())


def _bpe_local_merges() -> list:
    from jsonschema_spark.operators.bpe import bpe_train_local

    return bpe_train_local(_bpe_fixture_word_counts(), _BPE_N_MERGES)


def q_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trainable BPE subword vocabulary (Sennrich et al. 2016), learned
    IN SPARK: each round is pure JVM (adjacent-pair explode over the
    vocab-sized word table → integer-sum groupBy → total-order top-1 →
    one codegen replace()), so the learned (rank, left, right,
    pair_count) table is partition-invariant and bit-identical to the
    pure-Python mirror the oracle inlines — a deviation anywhere in the
    distributed training loop flips the value hash."""
    from jsonschema_spark.operators.bpe import bpe_train, merges_df

    fx = spark.createDataFrame(
        [(i, t) for i, t in enumerate(_BPE_FIXTURE)], "ex_id long, text string"
    )
    return merges_df(spark, bpe_train(fx, "text", _BPE_N_MERGES))


def q_bpe_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token accounting under the learned BPE table —
    (doc_id, n_words, n_tokens, fertility_ppm): the whole document
    encodes as ONE chained-replace JVM column over the boundary-safe
    delimited-symbol form (every merge = one left-to-right replace pass —
    see operators/bpe.py), token count = count of '|'; zero Python, zero
    shuffle. The DuckDB mirror replays the identical replace chain, so
    encoding is hash-attested over the real corpus (training is attested
    by bpe_merges; merge-table equality Spark≡Python is test-pinned)."""
    from jsonschema_spark.operators.bpe import bpe_token_counts_df

    return bpe_token_counts_df(
        _docs(spark, sf_dir), "doc_id", "text", _bpe_local_merges()
    )


_EMB_DIM = 64


def q_hashed_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-engine text embeddings via the hashing trick (signed hashed
    bag-of-words, Weinberger et al. 2009) — the array<float> producer
    that feeds the ANN/SemDeDup suite without a model service. The
    attestation rows (nnz, norm_sq, position-sensitive checksum) are
    computed from the SAME integer (bucket, signed-count) pairs the
    vector assembles from, so a component error anywhere flips the
    hash; tokenless docs pin the all-zero vector."""
    from jsonschema_spark.operators.embed import embedding_stats_df

    return embedding_stats_df(
        _docs(spark, sf_dir), "doc_id", "text", _EMB_DIM
    )


def _hashed_embedding_sql() -> str:
    d = _EMB_DIM
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
h AS (SELECT doc_id,
             CAST(('0x' || substr(md5(tk), 1, 14)) AS BIGINT) AS hv FROM tok),
g AS (SELECT doc_id, CAST(hv % {d} AS INTEGER) AS b,
             sum(1 - 2 * ((hv // {d}) % 2))::BIGINT AS v
      FROM h GROUP BY 1, 2),
a AS (SELECT doc_id,
             sum(CASE WHEN v <> 0 THEN 1 ELSE 0 END)::BIGINT AS nnz,
             sum(v * v)::BIGINT AS norm_sq,
             sum(v * (b + 1))::BIGINT AS checksum
      FROM g GROUP BY 1)
SELECT d.doc_id, coalesce(a.nnz, 0)::BIGINT AS nnz,
       coalesce(a.norm_sq, 0)::BIGINT AS norm_sq,
       coalesce(a.checksum, 0)::BIGINT AS checksum
FROM documents d LEFT JOIN a USING (doc_id)"""


_HIST_LO, _HIST_HI, _HIST_NB = 0, 4096, 256


def q_hist_quantiles_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable fixed-width histogram sketch over n_chars → rank-select
    quantiles (25/50/75/95): the one-pass bounded-state quantile monitor
    (percentile_approx's oracle-attestable sibling) — groupBy(bin) with
    map-side partials, ONE tiny reduce, pure-integer rank select, so the
    DuckDB mirror replays bin, edges, rank and total bit-for-bit."""
    from jsonschema_spark.operators.stats import hist_quantiles, hist_sketch

    sk = hist_sketch(_docs(spark, sf_dir), "n_chars",
                     _HIST_LO, _HIST_HI, _HIST_NB)
    return hist_quantiles(sk, _HIST_LO, _HIST_HI, _HIST_NB,
                          (250_000, 500_000, 750_000, 950_000)) \
        .orderBy("p_ppm")


_TS_NB = 288  # 5-minute bins over the day


def q_hist_quantiles_ts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The north-star 'quantiles for warc_ts' analogue: the SAME
    mergeable histogram sketch over the fetch timestamp's time-of-day
    (seconds since midnight, 5-minute bins) — the fetch-schedule monitor
    a crawl runs per snapshot. Wall-time field extraction (hour/min/sec)
    is the tz-proof portable integer for naive parquet timestamps: both
    engines read the stored wall clock, no epoch/session-tz coupling."""
    from jsonschema_spark.operators.stats import hist_quantiles, hist_sketch

    ev = spark.read.parquet(_t(sf_dir, "events")).select(
        (F.hour("ts") * 3600 + F.minute("ts") * 60 + F.second("ts"))
        .cast("long").alias("sec_day"))
    sk = hist_sketch(ev, "sec_day", 0, 86400, _TS_NB)
    return hist_quantiles(sk, 0, 86400, _TS_NB,
                          (250_000, 500_000, 750_000, 950_000)) \
        .orderBy("p_ppm")


def q_drift_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded-state KS drift over the shared histogram bins — the
    streaming-maintainable sibling of the exact drift_n_chars (same
    output row, same per-side integer-div CDF formula; resolution = one
    bin width, state = n_bins counters instead of a corpus-wide distinct
    aggregation)."""
    from jsonschema_spark.operators.stats import hist_drift

    return hist_drift(_docs(spark, sf_dir), "n_chars",
                      F.col("doc_id") % 2 == 0,
                      _HIST_LO, _HIST_HI, _HIST_NB)


def _hist_bin_sql(v: str) -> str:
    lo, hi, nb = _HIST_LO, _HIST_HI, _HIST_NB
    c = f"least(greatest(cast({v} as bigint), {lo}), {hi})"
    return f"cast(least((({c} - {lo}) * {nb}) // {hi - lo}, {nb - 1}) as int)"


def _hist_quantiles_sql() -> str:
    lo, hi, nb = _HIST_LO, _HIST_HI, _HIST_NB
    return f"""
WITH b AS (SELECT {_hist_bin_sql('n_chars')} AS bin FROM documents
           WHERE n_chars IS NOT NULL),
sk AS (SELECT bin, count(*)::BIGINT AS cnt FROM b GROUP BY 1),
c AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum,
             sum(cnt) OVER () AS total FROM sk),
p AS (SELECT unnest([250000, 500000, 750000, 950000]) AS p_ppm),
t AS (SELECT max(total)::BIGINT AS total FROM c),
r AS (SELECT p.p_ppm, (t.total - 1) * p.p_ppm // 1000000 + 1 AS rank,
             t.total FROM p, t),
pick AS (SELECT r.p_ppm,
                (SELECT min(bin) FROM c WHERE cum >= r.rank) AS bin,
                r.rank, r.total
         FROM r)
SELECT p_ppm, bin,
       ({lo} * 1000 + bin::BIGINT * {hi - lo} * 1000 // {nb})::BIGINT AS edge_lo_milli,
       ({lo} * 1000 + (bin::BIGINT + 1) * {hi - lo} * 1000 // {nb})::BIGINT AS edge_hi_milli,
       rank::BIGINT AS rank, total
FROM pick ORDER BY p_ppm"""


def _hist_quantiles_ts_sql() -> str:
    lo, hi, nb = 0, 86400, _TS_NB
    v = "(hour(ts) * 3600 + minute(ts) * 60 + second(ts))"
    c = f"least(greatest(cast({v} as bigint), {lo}), {hi})"
    b = f"cast(least((({c} - {lo}) * {nb}) // {hi - lo}, {nb - 1}) as int)"
    return f"""
WITH b AS (SELECT {b} AS bin FROM events WHERE ts IS NOT NULL),
sk AS (SELECT bin, count(*)::BIGINT AS cnt FROM b GROUP BY 1),
c AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum,
             sum(cnt) OVER () AS total FROM sk),
p AS (SELECT unnest([250000, 500000, 750000, 950000]) AS p_ppm),
t AS (SELECT max(total)::BIGINT AS total FROM c),
r AS (SELECT p.p_ppm, (t.total - 1) * p.p_ppm // 1000000 + 1 AS rank,
             t.total FROM p, t),
pick AS (SELECT r.p_ppm,
                (SELECT min(bin) FROM c WHERE cum >= r.rank) AS bin,
                r.rank, r.total
         FROM r)
SELECT p_ppm, bin,
       ({lo} * 1000 + bin::BIGINT * {hi - lo} * 1000 // {nb})::BIGINT AS edge_lo_milli,
       ({lo} * 1000 + (bin::BIGINT + 1) * {hi - lo} * 1000 // {nb})::BIGINT AS edge_hi_milli,
       rank::BIGINT AS rank, total
FROM pick ORDER BY p_ppm"""


def _drift_hist_sql() -> str:
    return f"""
WITH b AS (SELECT {_hist_bin_sql('n_chars')} AS bin,
                  CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END AS s
           FROM documents WHERE n_chars IS NOT NULL),
g AS (SELECT bin, sum(s)::BIGINT AS nb, sum(1 - s)::BIGINT AS nc
      FROM b GROUP BY 1),
c AS (SELECT sum(nb) OVER (ORDER BY bin) AS cb,
             sum(nc) OVER (ORDER BY bin) AS cc,
             sum(nb) OVER () AS tb, sum(nc) OVER () AS tc FROM g)
SELECT max(abs((cb * 1000000) // greatest(tb, 1)
             - (cc * 1000000) // greatest(tc, 1)))::BIGINT AS ks_ppm,
       max(tb)::BIGINT AS n_base, max(tc)::BIGINT AS n_cur
FROM c"""


_CMS_D, _CMS_W = 4, 512


def q_token_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable count-min sketch (Cormode-Muthukrishnan) — the mergeable
    heavy-hitter frequency sketch next to HLL's distinct sketch: d=4
    row-salted md5-56 hash rows x w=512 integer counters built in one
    explode + groupBy over the token stream, then point estimates for the
    exact top-15 tokens via a broadcast lookup (min over the d probed
    counters). Output (token, n_exact, n_est, overcount) — integer
    end-to-end, so sketch state, estimates and the >= 0 overcount
    guarantee are all hash-attested against the identical DuckDB replay."""
    from jsonschema_spark.operators.dedup import tokens
    from jsonschema_spark.operators.stats import cms_lookup, cms_sketch

    toks = _docs(spark, sf_dir).select(
        F.explode(tokens(F.col("text"))).alias("token")
    )
    truth = (
        toks.groupBy("token")
        .agg(F.count(F.lit(1)).alias("n_exact"))
        .orderBy(F.col("n_exact").desc(), "token")
        .limit(15)
    )
    sk = cms_sketch(toks, "token", _CMS_D, _CMS_W)
    est = cms_lookup(sk, truth.select("token"), "token", _CMS_D, _CMS_W)
    return (
        truth.join(est, "token")
        .select(
            "token", "n_exact", "n_est",
            (F.col("n_est") - F.col("n_exact")).cast("long").alias("overcount"),
        )
    )


def _token_cms_sql() -> str:
    d, w = _CMS_D, _CMS_W
    return f"""
WITH t AS (SELECT doc_id, {{toks}} AS toks FROM documents),
tok AS (SELECT unnest(toks) AS token FROM t),
truth AS (SELECT token, count(*)::BIGINT AS n_exact FROM tok GROUP BY 1
          ORDER BY n_exact DESC, token LIMIT 15),
probes AS (SELECT token, ix.i AS row,
                  CAST(CAST(('0x' || substr(md5(ix.i::VARCHAR || ':' || token), 1, 14)) AS BIGINT)
                       % {w} AS INTEGER) AS bucket
           FROM tok, LATERAL (SELECT unnest(range(0, {d})) AS i) ix),
sk AS (SELECT row, bucket, count(*)::BIGINT AS cnt FROM probes GROUP BY 1, 2),
lkp AS (SELECT tr.token, ix.i AS row,
               CAST(CAST(('0x' || substr(md5(ix.i::VARCHAR || ':' || tr.token), 1, 14)) AS BIGINT)
                    % {w} AS INTEGER) AS bucket
        FROM truth tr, LATERAL (SELECT unnest(range(0, {d})) AS i) ix),
est AS (SELECT l.token, min(coalesce(sk.cnt, 0))::BIGINT AS n_est
        FROM lkp l LEFT JOIN sk ON sk.row = l.row AND sk.bucket = l.bucket
        GROUP BY 1)
SELECT truth.token, n_exact, n_est, (n_est - n_exact)::BIGINT AS overcount
FROM truth JOIN est USING (token)"""


def q_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trainable hashed linear quality classifier (the CCNet/LLaMA
    wiki-vs-crawl filter; Wenzek et al. 2020 §4.3): train IN SPARK on the
    embedded labeled fixture (integer-exact logistic loop,
    operators/classify.py:train_classifier), then score every document —
    literal-weight-array scan projection + one groupBy(doc), zero joins
    against model state. The oracle trains the pure-Python mirror on the
    same fixture and replays scoring in SQL: a weight mismatch anywhere in
    the TRAINING loop would flip the value hash, so this attests training
    and scoring end-to-end."""
    from jsonschema_spark.operators.classify import (
        classifier_score,
        train_classifier,
    )

    lab = spark.createDataFrame(
        [(i, t, y) for i, (t, y) in enumerate(_cls_fixture())],
        "ex_id long, text string, label int",
    )
    w = train_classifier(lab, "ex_id", "text", "label", bits=6, iters=3)
    d = _docs(spark, sf_dir)
    return classifier_score(d, "doc_id", "text", w)


def q_dedup_keep_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recrawl dedup discipline: one row per user_id, latest ts wins, ties
    toward the larger event_id — ONE groupBy taking max(struct(...)) with
    map-side partial aggregation (no window sort)."""
    from jsonschema_spark.operators.dedup import dedup_keep_latest

    ev = spark.read.parquet(_t(sf_dir, "events"))
    kept = dedup_keep_latest(
        ev.select("user_id", "ts", "event_id", "event_type", "value"),
        ["user_id"], "ts", "event_id")
    return kept.select(
        "user_id",
        F.date_format("ts", "yyyy-MM-dd HH:mm:ss").alias("ts"),
        "event_id", "event_type",
        F.floor(F.col("value") * 1000).cast("long").alias("value_milli"),
        "n_versions")


def q_budget_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic stratified token-budget sampling: per language, docs
    ordered by a portable md5 hash (id-stable shuffle), kept while the
    running token total stays within 2000 — window cumsum over ~24-byte
    projected triples, text never shuffled."""
    from jsonschema_spark.operators.curate import budget_sample

    return budget_sample(
        _docs(spark, sf_dir), "doc_id", "text", 2000, stratify_col="lang")


def q_budget_sample_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The crawl-scale budget sampler (hash-prefix histogram cutoff,
    exact=False): bucket = top bits of the portable hash, ONE tiny
    (stratum, bucket) token histogram, broadcast bucket offsets, and
    per-bucket windows — no stratum ever sorts in one task. Output is
    row-identical to the exact window form (equivalence test-proven +
    4M-row scale point in BENCH_sf1.json), so the SAME oracle SQL
    attests it."""
    from jsonschema_spark.operators.curate import budget_sample

    return budget_sample(
        _docs(spark, sf_dir), "doc_id", "text", 2000, stratify_col="lang",
        exact=False, n_buckets=64)


def q_public_suffix_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-public-suffix crawl profile (urls + distinct registrable
    domains) under the packaged Public Suffix List: the eTLD matcher is a
    pure InSet probe chain (no join, no Python) and the oracle replays
    the identical probe plan from the same packaged data file via
    read_text CTEs — exercising exact rules (com.sg), exceptions
    (city.kobe.jp) and the default rule in one query."""
    from jsonschema_spark.operators.urltools import (
        public_suffix, registered_domain)

    df = _docs(spark, sf_dir).select("doc_id", "source") \
        .withColumn("url", _messy_url())
    return (
        df.select(public_suffix(F.col("url")).alias("public_suffix"),
                  registered_domain(F.col("url")).alias("reg_domain"))
        .groupBy("public_suffix")
        .agg(F.count(F.lit(1)).alias("n_urls"),
             F.count_distinct(F.col("reg_domain")).alias("n_reg_domains"))
    )


def q_multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real media-header decode through mapInPandas: payloads are genuine
    PNG/GIF/JPEG/WAV/MP4 container headers (synthesized deterministically
    from doc_id — operators/multimodal.py:synth_media_bytes) and the
    "headers" decoder extracts dimensions/duration/sample-rate by pure
    byte parsing (no pillow/ffmpeg). The oracle recomputes every planted
    field arithmetically, so a parser regression breaks the hash."""
    from jsonschema_spark.operators.multimodal import extract_features, media_from_documents

    media = media_from_documents(_docs(spark, sf_dir), payload="media")
    return extract_features(media, decoder="headers").select(
        "media_id", "kind", "format", "n_bytes",
        "width", "height", "duration_ms", "sample_rate_hz", "channels")


# ---------------------------------------------------------------------------
# Oracles (DuckDB side)
# ---------------------------------------------------------------------------

# json-escape a text column the way the engine's messages do
_ESC = "('\"' || replace(replace(text, chr(92), chr(92)||chr(92)), '\"', chr(92)||'\"') || '\"')"

_VIOL_SQL = f"""
WITH d AS (SELECT * FROM documents),
fail AS (SELECT * FROM d WHERE NOT ({_DOCS_VALID_SQL})),
v AS (
  -- /required (missing-property list, sorted; head keeps schema order)
  SELECT doc_id, '/required' AS keywordLocation, '{_BASE}#/required' AS absoluteKeywordLocation,
         '' AS instanceLocation,
         'The object value was expected to define properties "doc_id", "text", and "lang"' ||
         CASE WHEN len(m.miss) = 1 THEN ' but did not define the property ' || m.miss[1]
              ELSE ' but did not define properties ' ||
                   array_to_string(m.miss[1:len(m.miss)-1], ', ') || ', and ' || m.miss[-1]
         END AS error
  FROM fail, LATERAL (SELECT list_filter([
        CASE WHEN doc_id IS NULL THEN '"doc_id"' END,
        CASE WHEN lang   IS NULL THEN '"lang"'   END,
        CASE WHEN text   IS NULL THEN '"text"'   END], x -> x IS NOT NULL) AS miss) m
  WHERE doc_id IS NULL OR text IS NULL OR lang IS NULL
UNION ALL
  SELECT doc_id, '/properties/doc_id/minimum', '{_BASE}#/properties/doc_id/minimum', '/doc_id',
         'The integer value ' || doc_id::VARCHAR ||
         ' was expected to be greater than or equal to the integer 0'
  FROM fail WHERE doc_id IS NOT NULL AND NOT (doc_id >= 0)
UNION ALL
  SELECT doc_id, '/properties/text/minLength', '{_BASE}#/properties/text/minLength', '/text',
         'The string value ' || {_ESC} ||
         ' was expected to consist of at least 1 character but it consisted of ' ||
         length(text)::VARCHAR || CASE WHEN length(text)=1 THEN ' character' ELSE ' characters' END
  FROM fail WHERE text IS NOT NULL AND NOT (length(text) >= 1)
UNION ALL
  SELECT doc_id, '/properties/text/maxLength', '{_BASE}#/properties/text/maxLength', '/text',
         'The string value ' || {_ESC} ||
         ' was expected to consist of at most 400 characters but it consisted of ' ||
         length(text)::VARCHAR || CASE WHEN length(text)=1 THEN ' character' ELSE ' characters' END
  FROM fail WHERE text IS NOT NULL AND NOT (length(text) <= 400)
UNION ALL
  SELECT doc_id, '/properties/lang/enum', '{_BASE}#/properties/lang/enum', '/lang',
         'The string value "' || lang ||
         '" was expected to equal one of the following values: "de", "en", "es", and "fr"'
  FROM fail WHERE lang IS NOT NULL AND lang NOT IN ('de','en','es','fr')
UNION ALL
  SELECT doc_id, '/properties/source/pattern', '{_BASE}#/properties/source/pattern', '/source',
         'The string value "' || source ||
         '" was expected to match the regular expression "^src[0-9]$"'
  FROM fail WHERE source IS NOT NULL AND NOT regexp_matches(source, '^src[0-9]$')
UNION ALL
  SELECT doc_id, '/properties/n_chars/minimum', '{_BASE}#/properties/n_chars/minimum', '/n_chars',
         'The integer value ' || n_chars::VARCHAR ||
         ' was expected to be greater than or equal to the integer 1'
  FROM fail WHERE n_chars IS NOT NULL AND NOT (n_chars >= 1)
UNION ALL
  SELECT doc_id, '/properties/n_chars/maximum', '{_BASE}#/properties/n_chars/maximum', '/n_chars',
         'The integer value ' || n_chars::VARCHAR ||
         ' was expected to be less than or equal to the integer 300'
  FROM fail WHERE n_chars IS NOT NULL AND NOT (n_chars <= 300)
UNION ALL
  -- the parent /properties applicator entry (one per row with any property failure)
  SELECT doc_id, '/properties', '{_BASE}#/properties', '',
         'The object value was expected to validate against the 5 defined properties subschemas'
  FROM fail WHERE NOT (
        (doc_id IS NULL OR doc_id >= 0)
    AND (text IS NULL OR (length(text) >= 1 AND length(text) <= 400))
    AND (lang IS NULL OR lang IN ('de','en','es','fr'))
    AND (source IS NULL OR regexp_matches(source, '^src[0-9]$'))
    AND (n_chars IS NULL OR (n_chars >= 1 AND n_chars <= 300)))
)
SELECT * FROM v
"""

_PROFILE_SQL = " UNION ALL ".join(
    f"""SELECT '{c}' AS "column", count(*) AS n, count(*) - count({c}) AS n_null,
        count(DISTINCT {c}) AS n_distinct,
        min({c})::VARCHAR AS min_v, max({c})::VARCHAR AS max_v FROM documents"""
    for c in ["doc_id", "text", "lang", "source", "n_chars"]
)

_QUANTILES_SQL = " UNION ALL ".join(
    f"SELECT {int(p * 100)}::INT AS pct, floor(quantile_cont(n_chars::DOUBLE, {p}) * 1000)::BIGINT AS milli FROM documents"
    for p in (0.25, 0.5, 0.75)
)

_DRIFT_SQL = """
WITH g AS (
  SELECT lang AS category,
         sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END)::BIGINT AS n_base,
         sum(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END)::BIGINT AS n_cur
  FROM documents GROUP BY lang
), t AS (SELECT sum(n_base) AS tot_base, sum(n_cur) AS tot_cur FROM g)
SELECT category, n_base, n_cur,
       floor(abs(n_base*tot_cur - n_cur*tot_base) * 1000000 / (tot_base*tot_cur))::BIGINT AS diff_ppm
FROM g, t
"""

# --- keyword-family oracles ----------------------------------------------------

# per-keyword boolean mirrors of COMBO_SCHEMA (absent/null ⇒ vacuous pass)
_COMBO_FLAGS = """
  SELECT doc_id, text, lang, source, n_chars,
         (lang IS NOT NULL AND lang <> 'zh')                 AS b_not,
         (source IS NULL OR n_chars IS NOT NULL)             AS b_dep,
         (source IS NULL OR regexp_matches(source, '^src1')) AS b_any1,
         (n_chars IS NULL OR n_chars % 2 = 0)                AS b_one1,
         (n_chars IS NULL OR n_chars >= 300)                 AS b_one2,
         (n_chars IS NULL OR n_chars >= 200)                 AS b_any2,
         (lang IS NULL OR lang = 'en')                       AS b_if,
         (n_chars IS NULL OR n_chars >= 100)                 AS b_then,
         (n_chars IS NULL OR n_chars <= 500)                 AS b_else,
         (text IS NULL OR n_chars IS NULL OR n_chars >= 50)  AS b_dsch
  FROM documents
"""

_COMBO_VALID = """
  (b_not AND b_dep AND (b_any1 OR b_any2)
   AND ((CASE WHEN b_one1 THEN 1 ELSE 0 END + CASE WHEN b_one2 THEN 1 ELSE 0 END) = 1)
   AND (CASE WHEN b_if THEN b_then ELSE b_else END)
   AND b_dsch)
"""

_COMBINATORS_SQL = f"""
WITH f AS ({_COMBO_FLAGS})
SELECT lang, count(*) AS n_rows,
       sum(CASE WHEN {_COMBO_VALID} THEN 1 ELSE 0 END)::BIGINT AS n_valid,
       sum(CASE WHEN {_COMBO_VALID} THEN 0 ELSE 1 END)::BIGINT AS n_invalid
FROM f GROUP BY lang
"""

_SINGLE_PROP = "The object value was expected to validate against the single defined property subschema"

_VIOL_COMBO_SQL = f"""
WITH f0 AS ({_COMBO_FLAGS}),
f AS (SELECT *,
        (CASE WHEN b_one1 THEN 1 ELSE 0 END + CASE WHEN b_one2 THEN 1 ELSE 0 END) AS one_cnt,
        (NOT b_any1 AND NOT b_any2) AS f_any
      FROM f0)
SELECT doc_id, '/allOf/0/not' AS keywordLocation,
       '{COMBO_BASE}#/allOf/0/not' AS absoluteKeywordLocation, '' AS instanceLocation,
       'The object value was expected to not validate against the given subschema, but it did' AS error
FROM f WHERE NOT b_not
UNION ALL
SELECT doc_id, '/allOf/1/dependentRequired', '{COMBO_BASE}#/allOf/1/dependentRequired', '',
       'Because the object value defined the property "source", it was also expected to define the property "n_chars"'
FROM f WHERE NOT b_dep
UNION ALL
SELECT doc_id, '/allOf', '{COMBO_BASE}#/allOf', '',
       'The object value was expected to validate against the 2 given subschemas'
FROM f WHERE NOT b_not OR NOT b_dep
UNION ALL
SELECT doc_id, '/anyOf/0/properties/source/pattern', '{COMBO_BASE}#/anyOf/0/properties/source/pattern', '/source',
       'The string value "' || source || '" was expected to match the regular expression "^src1"'
FROM f WHERE f_any
UNION ALL
SELECT doc_id, '/anyOf/0/properties', '{COMBO_BASE}#/anyOf/0/properties', '', '{_SINGLE_PROP}'
FROM f WHERE f_any
UNION ALL
SELECT doc_id, '/anyOf/1/properties/n_chars/minimum', '{COMBO_BASE}#/anyOf/1/properties/n_chars/minimum', '/n_chars',
       'The integer value ' || n_chars::VARCHAR || ' was expected to be greater than or equal to the integer 200'
FROM f WHERE f_any
UNION ALL
SELECT doc_id, '/anyOf/1/properties', '{COMBO_BASE}#/anyOf/1/properties', '', '{_SINGLE_PROP}'
FROM f WHERE f_any
UNION ALL
SELECT doc_id, '/anyOf', '{COMBO_BASE}#/anyOf', '',
       'The object value was expected to validate against at least one of the 2 given subschemas'
FROM f WHERE f_any
UNION ALL
SELECT doc_id, '/oneOf/0/properties/n_chars/multipleOf', '{COMBO_BASE}#/oneOf/0/properties/n_chars/multipleOf', '/n_chars',
       'The integer value ' || n_chars::VARCHAR || ' was expected to be divisible by the integer 2'
FROM f WHERE one_cnt = 0
UNION ALL
SELECT doc_id, '/oneOf/0/properties', '{COMBO_BASE}#/oneOf/0/properties', '', '{_SINGLE_PROP}'
FROM f WHERE one_cnt = 0
UNION ALL
SELECT doc_id, '/oneOf/1/properties/n_chars/minimum', '{COMBO_BASE}#/oneOf/1/properties/n_chars/minimum', '/n_chars',
       'The integer value ' || n_chars::VARCHAR || ' was expected to be greater than or equal to the integer 300'
FROM f WHERE one_cnt = 0
UNION ALL
SELECT doc_id, '/oneOf/1/properties', '{COMBO_BASE}#/oneOf/1/properties', '', '{_SINGLE_PROP}'
FROM f WHERE one_cnt = 0
UNION ALL
SELECT doc_id, '/oneOf', '{COMBO_BASE}#/oneOf', '',
       'The object value was expected to validate against one and only one of the 2 given subschemas'
FROM f WHERE one_cnt <> 1
UNION ALL
SELECT doc_id, '/then/properties/n_chars/minimum', '{COMBO_BASE}#/then/properties/n_chars/minimum', '/n_chars',
       'The integer value ' || n_chars::VARCHAR || ' was expected to be greater than or equal to the integer 100'
FROM f WHERE b_if AND NOT b_then
UNION ALL
SELECT doc_id, '/then/properties', '{COMBO_BASE}#/then/properties', '', '{_SINGLE_PROP}'
FROM f WHERE b_if AND NOT b_then
UNION ALL
SELECT doc_id, '/else/properties/n_chars/maximum', '{COMBO_BASE}#/else/properties/n_chars/maximum', '/n_chars',
       'The integer value ' || n_chars::VARCHAR || ' was expected to be less than or equal to the integer 500'
FROM f WHERE NOT b_if AND NOT b_else
UNION ALL
SELECT doc_id, '/else/properties', '{COMBO_BASE}#/else/properties', '', '{_SINGLE_PROP}'
FROM f WHERE NOT b_if AND NOT b_else
UNION ALL
SELECT doc_id, '/if', '{COMBO_BASE}#/if', '',
       'The object value was expected to validate against the given conditional'
FROM f WHERE (b_if AND NOT b_then) OR (NOT b_if AND NOT b_else)
UNION ALL
SELECT doc_id, '/dependentSchemas/text/properties/n_chars/minimum',
       '{COMBO_BASE}#/dependentSchemas/text/properties/n_chars/minimum', '/n_chars',
       'The integer value ' || n_chars::VARCHAR || ' was expected to be greater than or equal to the integer 50'
FROM f WHERE text IS NOT NULL AND n_chars IS NOT NULL AND n_chars < 50
UNION ALL
SELECT doc_id, '/dependentSchemas/text/properties', '{COMBO_BASE}#/dependentSchemas/text/properties', '', '{_SINGLE_PROP}'
FROM f WHERE text IS NOT NULL AND n_chars IS NOT NULL AND n_chars < 50
"""


def _multipleof_sql() -> str:
    from jsonschema_spark.functions.numeric import divisible_duckdb

    frags = {
        "n_div3": divisible_duckdb("l_orderkey", 3, True),
        "n_div2": divisible_duckdb("l_quantity", 2, False),
        "n_div_quarter": divisible_duckdb("l_extendedprice", 0.25, False),
        "n_div_3cent": divisible_duckdb("l_discount", 0.03, False),
    }
    sums = ", ".join(
        f"sum(CASE WHEN {sql} THEN 1 ELSE 0 END)::BIGINT AS {name}" for name, sql in frags.items()
    )
    return f"SELECT count(*) AS n_rows, {sums} FROM lineitem"


_UNIQ_SQL = """
SELECT o_orderstatus AS status, count(*) AS n_rows,
       sum(CASE WHEN ok THEN 1 ELSE 0 END)::BIGINT AS n_valid,
       sum(CASE WHEN ok THEN 0 ELSE 1 END)::BIGINT AS n_invalid
FROM (SELECT o_orderstatus,
             ((o_orderkey % 5) <> 0           -- codes uniqueItems
              AND (o_orderkey % 50) <> 0      -- seq[1] $ref #pos minimum 1
              AND (o_orderkey % 150) <= 100   -- items-from-2 maximum 100
             ) AS ok
      FROM orders)
GROUP BY 1
"""


def _formats_sql() -> str:
    from jsonschema_spark.functions.formats import format_duckdb

    # bracket-balance stand-in for the compile-try 'regex' format (agrees on
    # the three fixture literals; DuckDB cannot compile-try)
    balance = (
        "(length(s) - length(replace(s, '(', '')) = length(s) - length(replace(s, ')', ''))"
        " AND length(s) - length(replace(s, '[', '')) = length(s) - length(replace(s, ']', '')))"
    )
    parts = []
    for f in sorted(_FMT_TRIPLES):
        a, b, c = (x.replace("'", "''") for x in _FMT_TRIPLES[f])
        sel = f"CASE (event_id % 3) WHEN 0 THEN '{a}' WHEN 1 THEN '{b}' ELSE '{c}' END"
        pred = balance if f == "regex" else format_duckdb(f, "s")
        parts.append(
            f"SELECT '{f}' AS fmt, count(*) AS n_rows, "
            f"sum(CASE WHEN {pred} THEN 1 ELSE 0 END)::BIGINT AS n_ok "
            f"FROM (SELECT {sel} AS s FROM events)"
        )
    return " UNION ALL ".join(parts)


_EVENTS_HOURLY_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
       count(*) AS n_events, sum(floor(value * 1000)::BIGINT)::BIGINT AS value_milli
FROM events GROUP BY 1, 2
"""

# --- dedup / similarity / textstats oracle fragments ---------------------------
# portable 56-bit hash (md5-prefix), identical to dedup.hash56


def _h56(s: str) -> str:
    return f"('0x'||substr(md5({s}),1,14))::BIGINT"


_TOKS = (
    "CASE WHEN length(trim(text))=0 THEN []::VARCHAR[] "
    "ELSE string_split_regex(trim(lower(text)), '\\s+') END"
)
_DOC_TOKS = f"WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents)"
# unigram shingles = distinct tokens (signature query: per-doc, never joins)
_DOC_SH = f"{_DOC_TOKS}, sh AS (SELECT doc_id, list_distinct(toks) AS s FROM t)"

# documents ∪ planted near-dups, 3-gram shingles (pair queries)
_AUG = (
    "aug AS (SELECT doc_id, text FROM documents UNION ALL "
    "SELECT doc_id + 100000, regexp_replace(text, '^\\S+\\s*', '') "
    "FROM documents WHERE doc_id < 50)"
)
_AUG_TOKS = _TOKS.replace("text", "aug.text")
_AUG_SH = f"""WITH {_AUG},
t AS (SELECT doc_id, {_AUG_TOKS} AS toks FROM aug),
sh AS (SELECT doc_id,
       CASE WHEN len(toks) >= 3
            THEN list_distinct([array_to_string(toks[i:i+2], ' ')
                                for i in range(1, len(toks)-2+1)])
            ELSE []::VARCHAR[] END AS s FROM t)"""

_MINHASH_SIG_SQL = f"""
{_DOC_SH}
SELECT doc_id, j::BIGINT AS seed,
       list_min([{_h56("j::VARCHAR||':'||x")} for x in s]) AS mh
FROM sh, (SELECT unnest(range(0, 12)) AS j)
WHERE len(s) > 0
"""

_SIG12 = "[" + ", ".join(
    "list_min([" + _h56(f"'{j}:'||x") + " for x in s])" for j in range(12)
) + "]"

_MINHASH_PAIRS_SQL = f"""
{_AUG_SH},
sig AS (SELECT doc_id, {_SIG12} AS sig FROM sh WHERE len(s) > 0),
bands AS (
  SELECT doc_id, b.j AS band,
         sig[2*b.j+1]::VARCHAR || '_' || sig[2*b.j+2]::VARCHAR AS band_key
  FROM sig, (SELECT unnest(range(0, 6)) AS j) b
)
SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared_bands
FROM bands a JOIN bands b ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
GROUP BY 1, 2
"""

# transitive closure (with self-loops) over the symmetrized pair graph;
# min reachable id per node = the component label
_CLUSTERS_SQL = f"""
WITH RECURSIVE pairs AS ({_MINHASH_PAIRS_SQL}),
edges AS (
  SELECT id_a AS x, id_b AS y FROM pairs
  UNION
  SELECT id_b AS x, id_a AS y FROM pairs
),
reach(x, y) AS (
  SELECT x, y FROM edges
  UNION
  SELECT x, x FROM edges
  UNION
  SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x
)
SELECT x AS doc_id, min(y) AS cluster_id FROM reach GROUP BY 1 ORDER BY 1
"""

_JACCARD_SQL = f"""
{_AUG_SH},
sz AS (SELECT doc_id, len(s) AS n FROM sh WHERE len(s) > 0),
inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
common AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id GROUP BY 1, 2
)
SELECT id_a, id_b, n_common,
       floor(n_common * 1000000 / (sa.n + sb.n - n_common))::BIGINT AS jaccard_ppm
FROM common JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
WHERE floor(n_common * 1000000 / (sa.n + sb.n - n_common))::BIGINT >= 500000
"""

_SIMHASH_EXPR = (
    "list_sum([CASE WHEN 2*len(list_filter(hs, h -> (h >> b) & 1 = 1)) > len(hs) "
    "THEN (1::BIGINT << b) ELSE 0 END for b in range(0, 32)])::BIGINT"
)
# token-less / null-text docs are dropped (len(hs) > 0), mirroring
# simhash_df's explode semantics — they cannot be near-dups of anything
_SIMHASH_BASE = f"""
{_DOC_TOKS},
h AS (SELECT doc_id, list_transform(toks, x -> {_h56("x")}) AS hs FROM t),
simt AS (SELECT doc_id, coalesce({_SIMHASH_EXPR}, 0) AS sim FROM h WHERE len(hs) > 0)
"""

_SIMHASH_SQL = f"{_SIMHASH_BASE} SELECT doc_id, sim FROM simt"

_SIMHASH_PAIRS_SQL = f"""
{_SIMHASH_BASE},
bands AS (
  SELECT doc_id, sim, b.j AS band, (sim >> (8*b.j)) & 255 AS key
  FROM simt, (SELECT unnest(range(0, 4)) AS j) b
),
pairs AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         bit_count(xor(a.sim, b.sim)) AS hamming
  FROM bands a JOIN bands b
    ON a.band = b.band AND a.key = b.key AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, hamming::BIGINT AS hamming FROM pairs WHERE hamming <= 3
"""

_QEMB = "WITH q AS (SELECT vec_id, [floor(x::DOUBLE*100)::BIGINT for x in embedding] AS qe FROM embeddings)"
_COS_MICRO = (
    "floor(1000000.0 * list_sum([a.qe[i]*b.qe[i] for i in range(1,65)])::DOUBLE / "
    "sqrt((list_sum([a.qe[i]*a.qe[i] for i in range(1,65)]) * "
    "list_sum([b.qe[i]*b.qe[i] for i in range(1,65)]))::DOUBLE))::BIGINT"
)

_EMB_PAIRS_SQL = f"""
{_QEMB}
SELECT a.vec_id AS id_a, b.vec_id AS id_b, {_COS_MICRO} AS cos_micro
FROM q a JOIN q b ON a.vec_id < b.vec_id
WHERE {_COS_MICRO} >= 450000
"""

_ANN_TOPK_SQL = f"""
{_QEMB},
s AS (
  SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id, {_COS_MICRO} AS cos_micro
  FROM q a JOIN q b ON a.vec_id < 10 AND b.vec_id != a.vec_id
)
SELECT q_id, neighbor_id, rnk::BIGINT AS rnk, cos_micro FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_micro DESC, neighbor_id ASC) AS rnk
  FROM s) WHERE rnk <= 5
"""

_SIGN_BUCKET = "list_sum([CASE WHEN {v}.embedding[i+1] >= 0 THEN (1::BIGINT << i) ELSE 0 END for i in range(0,8)])"

_ANN_TOPK_LSH_SQL = f"""
{_QEMB},
qb AS (SELECT q.*, {_SIGN_BUCKET.format(v="e")} AS bkt
       FROM q JOIN embeddings e USING (vec_id)),
s AS (
  SELECT a.vec_id AS q_id, b.vec_id AS neighbor_id, {_COS_MICRO} AS cos_micro
  FROM qb a JOIN qb b ON a.vec_id < 10 AND b.vec_id != a.vec_id AND a.bkt = b.bkt
)
SELECT q_id, neighbor_id, rnk::BIGINT AS rnk, cos_micro FROM (
  SELECT *, row_number() OVER (PARTITION BY q_id ORDER BY cos_micro DESC, neighbor_id ASC) AS rnk
  FROM s) WHERE rnk <= 5
"""

_STOPWORDS_SQL = "('the','a','and','of','to','in','is','it')"

_TEXT_QUALITY_SQL = f"""
{_DOC_TOKS},
m AS (
  SELECT d.doc_id, len(t.toks) AS n_tokens,
         coalesce(list_sum(list_transform(t.toks, x -> length(x)))::BIGINT, 0) AS sum_token_len,
         floor(length(regexp_replace(regexp_replace(d.text, '[\\p{{L}}\\p{{N}}]', '', 'g'), '\\s', '', 'g'))
               * 1000000 / greatest(length(d.text), 1))::BIGINT AS punct_ppm,
         floor(len(list_filter(t.toks, x -> x IN {_STOPWORDS_SQL}))
               * 1000000 / greatest(len(t.toks), 1))::BIGINT AS stopword_ppm
  FROM documents d JOIN t ON d.doc_id = t.doc_id
)
SELECT doc_id, n_tokens, sum_token_len, punct_ppm, stopword_ppm,
       CASE WHEN n_tokens >= 5 AND n_tokens <= 100000 AND punct_ppm < 300000 AND stopword_ppm > 0
            THEN 1 ELSE 0 END AS is_quality
FROM m
"""

_WEBTEXT_SQL = f"""
{_DOC_TOKS},
ln AS (SELECT doc_id, string_split(text, chr(10)) AS ls FROM documents
       WHERE text IS NOT NULL),
m AS (
  SELECT d.doc_id,
         len(t.toks)::BIGINT AS n_words,
         floor(coalesce(list_sum(list_transform(t.toks, x -> length(x))), 0)
               * 1000 / greatest(len(t.toks), 1))::BIGINT AS mean_word_len_milli,
         floor(((length(d.text) - length(replace(d.text, '#', '')))
                + (length(d.text) - length(replace(d.text, '...', ''))) / 3)
               * 1000000 / greatest(len(t.toks), 1))::BIGINT AS sym_ppm,
         floor(len(list_filter(ln.ls, l -> regexp_matches(l, '^\\s*[-*•]')))
               * 1000000 / greatest(len(ln.ls), 1))::BIGINT AS bullet_ppm,
         floor(len(list_filter(ln.ls, l -> regexp_matches(l, '\\.\\.\\.\\s*$')))
               * 1000000 / greatest(len(ln.ls), 1))::BIGINT AS ellipsis_end_ppm,
         floor(len(list_filter(ln.ls, l -> regexp_matches(l, '[.!?]\\s*$')))
               * 1000000 / greatest(len(ln.ls), 1))::BIGINT AS term_punct_ppm,
         floor(len(list_filter(t.toks, x -> regexp_matches(x, '\\p{{L}}')))
               * 1000000 / greatest(len(t.toks), 1))::BIGINT AS alpha_word_ppm,
         len(list_intersect(list_distinct(t.toks),
             ['the','be','to','of','and','that','have','with']))::BIGINT AS n_gopher_stopwords,
         contains(lower(d.text), 'lorem ipsum') AS has_lorem,
         contains(d.text, '{{') AS has_brace
  FROM documents d JOIN t ON d.doc_id = t.doc_id JOIN ln ON d.doc_id = ln.doc_id
  WHERE d.text IS NOT NULL
)
SELECT doc_id, n_words, mean_word_len_milli, sym_ppm, bullet_ppm,
       ellipsis_end_ppm, term_punct_ppm, alpha_word_ppm, n_gopher_stopwords,
       CASE WHEN n_words BETWEEN 10 AND 100000
             AND mean_word_len_milli BETWEEN 3000 AND 10000
             AND sym_ppm <= 100000 AND bullet_ppm <= 900000
             AND ellipsis_end_ppm <= 300000 AND alpha_word_ppm >= 800000
             AND n_gopher_stopwords >= 1 AND NOT has_lorem AND NOT has_brace
            THEN 1 ELSE 0 END::BIGINT AS keep
FROM m
"""


def _hash_split_sql() -> str:
    """Mirror of curate.hash_split with the DEFAULT_SPLITS ppm ladder."""
    from jsonschema_spark.operators.curate import DEFAULT_SPLITS

    bucket = _h56("'split:' || doc_id::VARCHAR") + " % 1000000"
    acc, whens = 0, []
    for name, ppm in DEFAULT_SPLITS[:-1]:
        acc += ppm
        whens.append(f"WHEN b < {acc} THEN '{name}'")
    return f"""
WITH h AS (SELECT doc_id, {bucket} AS b FROM documents)
SELECT doc_id, b::BIGINT AS bucket_ppm,
       CASE {' '.join(whens)} ELSE '{DEFAULT_SPLITS[-1][0]}' END AS split
FROM h"""


def _repetition_sql() -> str:
    """Mirror of textstats.repetition_stats: same tokenization (_TOKS),
    same coverage definition (count*char-length of the space-joined gram),
    same single-IEEE-division floor-ppm, same Table A1 thresholds."""
    from jsonschema_spark.operators.textstats import (
        REPETITION_DUP_NS, REPETITION_MAX_PPM, REPETITION_TOP_NS)

    ns = sorted({*REPETITION_TOP_NS, *REPETITION_DUP_NS})
    legs = "\n  UNION ALL\n".join(
        f"""  SELECT doc_id, chars, {n} AS n,
         unnest(list_transform(range(1, len(toks) - {n} + 2),
                i -> array_to_string(toks[i : i + {n - 1}], ' '))) AS gm
  FROM t"""
        for n in ns
    )
    # most-frequent gram (tie -> longest) via one packed-int64 max:
    # (count << 31) | glen, decoded back to count*glen coverage
    tops = ",\n".join(
        f"""   floor(coalesce((max(CASE WHEN n = {n} THEN c * 2147483648 + glen END) >> 31)
                  * (max(CASE WHEN n = {n} THEN c * 2147483648 + glen END) & 2147483647), 0)
         * 1000000 / chars)::BIGINT AS top{n}_ppm"""
        for n in REPETITION_TOP_NS
    )
    dups = ",\n".join(
        f"""   floor(coalesce(sum(CASE WHEN n = {n} AND c >= 2 THEN c * glen END), 0)
         * 1000000 / chars)::BIGINT AS dup{n}_ppm"""
        for n in REPETITION_DUP_NS
    )
    names = [f"top{n}_ppm" for n in REPETITION_TOP_NS] + [
        f"dup{n}_ppm" for n in REPETITION_DUP_NS]
    outs = ",\n".join(f"       coalesce(st.{c}, 0)::BIGINT AS {c}" for c in names)
    conds = " AND ".join(
        f"coalesce(st.top{n}_ppm, 0) <= {REPETITION_MAX_PPM[('top', n)]}"
        for n in REPETITION_TOP_NS
    ) + " AND " + " AND ".join(
        f"coalesce(st.dup{n}_ppm, 0) <= {REPETITION_MAX_PPM[('dup', n)]}"
        for n in REPETITION_DUP_NS
    )
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks, greatest(length(text), 1) AS chars
           FROM documents WHERE text IS NOT NULL),
g AS (
{legs}
),
cnt AS (SELECT doc_id, chars, n, gm, length(gm) AS glen, count(*) AS c
        FROM g GROUP BY doc_id, chars, n, gm),
st AS (SELECT doc_id, chars,
{tops},
{dups}
  FROM cnt GROUP BY doc_id, chars)
SELECT s.doc_id,
{outs},
       CASE WHEN {conds} THEN 1 ELSE 0 END::BIGINT AS keep
FROM (SELECT doc_id FROM documents WHERE text IS NOT NULL) s
LEFT JOIN st ON s.doc_id = st.doc_id
"""


def _token_budget_sql() -> str:
    from jsonschema_spark.operators.textstats import BPE_TOKEN_RE

    pat = BPE_TOKEN_RE.replace("'", "''")
    return f"""
{_DOC_TOKS}
SELECT d.doc_id, len(t.toks)::BIGINT AS n_ws_tokens,
       len(regexp_extract_all(d.text, '{pat}'))::BIGINT AS n_bpe_tokens,
       length(d.text)::BIGINT AS n_chars,
       floor(len(regexp_extract_all(d.text, '{pat}')) * 100
             / greatest(len(t.toks), 1))::BIGINT AS bpe_per_100_words
FROM documents d JOIN t ON d.doc_id = t.doc_id
WHERE d.text IS NOT NULL
"""


def q_curate_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation pipeline end-to-end: quality filter →
    MinHash-LSH pairs → connected components → canonical keep; output =
    surviving docs + their BPE token budget."""
    from jsonschema_spark.operators.curate import curate_corpus
    from jsonschema_spark.operators.textstats import bpe_token_count

    curated = curate_corpus(
        _docs(spark, sf_dir), "doc_id", "text",
        min_words=10, max_words=100000, min_stopwords=1,
        k=12, bands=6, shingle_n=3,
    )
    return curated.select(
        "doc_id", bpe_token_count(F.col("text")).alias("n_bpe_tokens")
    ).orderBy("doc_id")


def _curate_sql() -> str:
    from jsonschema_spark.operators.textstats import BPE_TOKEN_RE

    pat = BPE_TOKEN_RE.replace("'", "''")
    return f"""
WITH RECURSIVE
wt AS ({_WEBTEXT_SQL}),
kept AS (SELECT d.doc_id, d.text FROM documents d
         JOIN wt ON d.doc_id = wt.doc_id WHERE wt.keep = 1),
kt AS (SELECT doc_id, CASE WHEN length(trim(text))=0 THEN []::VARCHAR[]
                           ELSE string_split_regex(trim(lower(text)), '\\s+')
                      END AS toks FROM kept),
sh AS (SELECT doc_id,
       CASE WHEN len(toks) >= 3
            THEN list_distinct([array_to_string(toks[i:i+2], ' ')
                                for i in range(1, len(toks)-2+1)])
            ELSE []::VARCHAR[] END AS s FROM kt),
sig AS (SELECT doc_id, {_SIG12} AS sig FROM sh WHERE len(s) > 0),
bands AS (SELECT doc_id, b.j AS band,
                 sig[2*b.j+1]::VARCHAR || '_' || sig[2*b.j+2]::VARCHAR AS band_key
          FROM sig, (SELECT unnest(range(0, 6)) AS j) b),
pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
edges AS (SELECT id_a AS x, id_b AS y FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach(x, y) AS (SELECT x, y FROM edges
                UNION SELECT x, x FROM edges
                UNION SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x),
comp AS (SELECT x AS doc_id, min(y) AS cluster_id FROM reach GROUP BY 1)
SELECT k.doc_id, len(regexp_extract_all(k.text, '{pat}'))::BIGINT AS n_bpe_tokens
FROM kept k LEFT JOIN comp c ON k.doc_id = c.doc_id
WHERE c.cluster_id IS NULL OR c.cluster_id = k.doc_id
ORDER BY 1
"""


def q_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII redaction with per-category counts over documents with planted
    PII (every third doc gains an email, an IP, a phone and a long id
    run) — redacted text and counts hash-matched exactly."""
    from jsonschema_spark.operators.textstats import pii_scrub

    d = _docs(spark, sf_dir)
    planted = d.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.col("text"), F.lit(" contact u"), F.col("doc_id").cast("string"),
                F.lit("@example.com at 10.0.0."), (F.col("doc_id") % 200).cast("string"),
                F.lit(" call +4915112345678 ref 9000000"),
                (F.col("doc_id") + 100).cast("string"),
            ),
        ).otherwise(F.col("text")),
    )
    return pii_scrub(planted, "doc_id", "text")


def q_contamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: 5-gram overlap between the corpus and a
    simulated eval set (docs 0-19). Corpus duplicates of an eval doc are
    exactly what the check must flag."""
    from jsonschema_spark.operators.dedup import contamination_pairs

    d = _docs(spark, sf_dir)
    bench = d.filter(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("bid"), F.col("text").alias("btext"))
    out = contamination_pairs(d, bench, "doc_id", "text", "bid", "btext",
                              shingle_n=5)
    return out.filter(F.col("corpus_id") != F.col("bench_id"))


_CONTAM_SQL = f"""
{_DOC_TOKS},
sh5 AS (SELECT doc_id,
        CASE WHEN len(toks) >= 5
             THEN list_distinct([array_to_string(toks[i:i+4], ' ')
                                 for i in range(1, len(toks)-4+1)])
             ELSE []::VARCHAR[] END AS s FROM t),
g AS (SELECT doc_id, unnest(s) AS g FROM sh5)
SELECT c.doc_id AS corpus_id, b.doc_id AS bench_id,
       count(*) AS n_shared_ngrams
FROM g c JOIN g b ON c.g = b.g AND b.doc_id < 20 AND c.doc_id <> b.doc_id
GROUP BY 1, 2
"""


def q_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The drop step over contamination_pairs: corpus docs (id >= 20)
    sharing >= 3 distinct 5-grams with any simulated eval doc (ids 0-19)
    are removed; output = surviving doc_ids."""
    from jsonschema_spark.operators.dedup import decontaminate

    d = _docs(spark, sf_dir)
    bench = d.filter(F.col("doc_id") < 20).select(
        F.col("doc_id").alias("bid"), F.col("text").alias("btext"))
    kept = decontaminate(
        d.filter(F.col("doc_id") >= 20), bench, "doc_id", "text",
        "bid", "btext", shingle_n=5, min_shared_ngrams=3)
    return kept.select("doc_id").orderBy("doc_id")


def _decontaminate_sql() -> str:
    return f"""
{_DOC_TOKS},
sh5 AS (SELECT doc_id,
        CASE WHEN len(toks) >= 5
             THEN list_distinct([array_to_string(toks[i:i+4], ' ')
                                 for i in range(1, len(toks)-4+1)])
             ELSE []::VARCHAR[] END AS s FROM t),
g AS (SELECT doc_id, unnest(s) AS g FROM sh5),
hits AS (SELECT c.doc_id FROM g c JOIN g b ON c.g = b.g
         WHERE b.doc_id < 20 AND c.doc_id >= 20
         GROUP BY c.doc_id, b.doc_id HAVING count(*) >= 3)
SELECT d.doc_id FROM documents d
WHERE d.doc_id >= 20
  AND NOT EXISTS (SELECT 1 FROM hits h WHERE h.doc_id = d.doc_id)
ORDER BY 1
"""


def q_line_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style corpus-level line dedup over documents with a planted
    shared footer (every even doc): the footer survives only in its first
    occurrence; duplicate docs lose their whole line."""
    from jsonschema_spark.operators.dedup import line_dedup

    d = _docs(spark, sf_dir).filter(F.col("text").isNotNull()).withColumn(
        "text2",
        F.when(F.col("doc_id") % 2 == 0,
               F.concat(F.col("text"), F.lit("\nshared footer boilerplate line")))
        .otherwise(F.col("text")),
    )
    return line_dedup(d, "doc_id", "text2")


_LINE_DEDUP_SQL = """
WITH d AS (SELECT doc_id,
                  CASE WHEN doc_id % 2 = 0
                       THEN text || chr(10) || 'shared footer boilerplate line'
                       ELSE text END AS text2
           FROM documents WHERE text IS NOT NULL),
s AS (SELECT doc_id, string_split(text2, chr(10)) AS ls FROM d),
l AS (SELECT doc_id, i - 1 AS pos, ls[i] AS line
      FROM s, LATERAL (SELECT unnest(range(1, len(ls) + 1)) AS i) ix),
r AS (SELECT doc_id, pos, line,
             row_number() OVER (PARTITION BY md5(line) ORDER BY doc_id, pos) AS rn
      FROM l)
SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text_deduped,
       count(*) AS n_lines_kept
FROM r WHERE rn = 1 GROUP BY doc_id
"""


def _pii_sql() -> str:
    from jsonschema_spark.operators.textstats import PII_PATTERNS

    plant = ("CASE WHEN doc_id % 3 = 0 THEN text || ' contact u' || doc_id::VARCHAR "
             "|| '@example.com at 10.0.0.' || (doc_id % 200)::VARCHAR "
             "|| ' call +4915112345678 ref 9000000' || (doc_id + 100)::VARCHAR "
             "ELSE text END")
    cols, clean = [], "p.text"
    for name, pat, token in PII_PATTERNS:
        esc = pat.replace("'", "''")
        cols.append(f"len(regexp_extract_all({clean}, '{esc}'))::BIGINT AS n_{name}")
        clean = f"regexp_replace({clean}, '{esc}', '{token}', 'g')"
    return f"""
WITH p AS (SELECT doc_id, {plant} AS text FROM documents WHERE text IS NOT NULL)
SELECT doc_id, {', '.join(cols)}, {clean} AS text_clean FROM p
"""


def _langid_sql() -> str:
    from jsonschema_spark.operators.textstats import LANG_MARKERS

    scores = {
        lang: f"len(list_filter(toks, x -> x IN ({', '.join(repr(w) for w in ws)})))"
        for lang, ws in LANG_MARKERS.items()
    }
    ordered = sorted(scores)
    best = f"greatest({', '.join(scores[lg] for lg in ordered)})"
    pred = "CASE " + " ".join(
        f"WHEN {scores[lg]} = {best} THEN '{lg}'" for lg in ordered
    ) + " END"
    return f"""
{_DOC_TOKS}
SELECT doc_id, {pred} AS pred_lang, {best}::BIGINT AS score FROM t
"""


_FINGERPRINT_SQL = f"""
{_DOC_TOKS}
SELECT doc_id,
       list_reduce(list_prepend(0::BIGINT, list_transform(toks, x -> {_h56("x")})),
                   (acc, h) -> (acc*31 + h) % 1000000007) AS fp
FROM t
"""


# ---------------------------------------------------------------------------
# Contract functions
# ---------------------------------------------------------------------------


def _messy_url():
    """Deterministic Common-Crawl-style MESSY url per (doc_id, source):
    mixed-case scheme/host, default + explicit ports, duplicate path
    slashes, unsorted query with tracking params, fragments — every
    normalization step (operators/urltools.py) is exercised. The DuckDB
    oracle rebuilds the identical string (_MESSY_URL_SQL)."""
    c, src = F.col("doc_id"), F.col("source")
    return F.concat(
        F.when(c % 3 == 0, F.lit("HTTP")).when(c % 3 == 1, F.lit("https"))
         .otherwise(F.lit("http")),
        F.lit("://"),
        F.when(c % 4 == 0, F.lit("WWW.")).otherwise(F.lit("")),
        F.when(c % 2 == 0, F.upper(src)).otherwise(src),
        F.when(c % 5 == 0, F.lit(".example.CO.UK"))
         .when(c % 5 == 1, F.lit(".Crawl-Site.ORG"))
         .when(c % 5 == 2, F.lit(".example.COM.SG"))
         .when(c % 5 == 3, F.lit(".city.KOBE.jp"))
         .otherwise(F.lit(".example.com")),
        F.when(c % 7 == 0, F.lit(":80")).when(c % 7 == 1, F.lit(":8080"))
         .when(c % 7 == 2, F.lit(":443")).otherwise(F.lit("")),
        F.lit("/a//b/"), (c % 20).cast("string"),
        F.when(c % 2 == 0, F.lit("?b=2&utm_source=x&a=1")).otherwise(F.lit("")),
        F.when(c % 6 == 0, F.lit("#sec")).otherwise(F.lit("")),
    )


_MESSY_URL_SQL = """(
  CASE doc_id%3 WHEN 0 THEN 'HTTP' WHEN 1 THEN 'https' ELSE 'http' END
  || '://'
  || CASE WHEN doc_id%4=0 THEN 'WWW.' ELSE '' END
  || CASE WHEN doc_id%2=0 THEN upper(source) ELSE source END
  || CASE doc_id%5 WHEN 0 THEN '.example.CO.UK' WHEN 1 THEN '.Crawl-Site.ORG'
          WHEN 2 THEN '.example.COM.SG' WHEN 3 THEN '.city.KOBE.jp'
          ELSE '.example.com' END
  || CASE doc_id%7 WHEN 0 THEN ':80' WHEN 1 THEN ':8080' WHEN 2 THEN ':443' ELSE '' END
  || '/a//b/' || (doc_id%20)::VARCHAR
  || CASE WHEN doc_id%2=0 THEN '?b=2&utm_source=x&a=1' ELSE '' END
  || CASE WHEN doc_id%6=0 THEN '#sec' ELSE '' END
)"""


def q_url_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL canonicalization over crawl-messy urls — pure codegen scan
    projection (one shared RE2∩Java regex, lowercased scheme/host,
    default-port strip, slash collapse, tracking-param drop + bytewise
    query sort, fragment drop) plus host / registered-domain extraction."""
    from jsonschema_spark.operators.urltools import normalize_urls_df

    df = _docs(spark, sf_dir).select("doc_id", "source") \
        .withColumn("url", _messy_url())
    return normalize_urls_df(df).select("doc_id", "url_norm", "host",
                                        "reg_domain")


def q_host_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-registered-domain crawl stats (page count, distinct canonical
    urls, total chars) — ONE skew-safe groupBy with map-side partials."""
    from jsonschema_spark.operators.urltools import host_stats_df

    df = _docs(spark, sf_dir).select("doc_id", "source", "n_chars") \
        .withColumn("url", _messy_url())
    return host_stats_df(df, "url", size_col="n_chars")


def q_url_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact url-level dedup after canonicalization, keep-latest-fetch:
    ONE groupBy max(struct(ts, payload)) per canonical url."""
    from jsonschema_spark.operators.urltools import url_dedup_df

    df = _docs(spark, sf_dir).select("doc_id", "source") \
        .withColumn("url", _messy_url()) \
        .withColumn("fetch_ts", (F.col("doc_id") * 37) % 1000)
    kept = url_dedup_df(df.select("url", "fetch_ts", "doc_id"),
                        "url", order_cols=("fetch_ts",))
    return kept.select("url_norm", "fetch_ts", "doc_id")


_HLL_P = 8  # m=256 buckets; 20k urls >> 2.5m=640 — raw-HLL regime


def _hll_crawl_log(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 40×-docs crawl log (20k urls at sf0.01): every messy
    url re-fetched under 40 distinct path variants — the url-uniqueness
    sketch input. The DuckDB oracle rebuilds the identical strings."""
    return (
        _docs(spark, sf_dir).select("doc_id", "source")
        .withColumn("url", _messy_url())
        .select("url", F.explode(F.sequence(F.lit(1), F.lit(40))).alias("i"))
        .select(
            F.concat(F.col("url"), F.lit("/r/"), F.col("i").cast("string"))
            .alias("u")
        )
    )


def q_url_hll_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable HyperLogLog sketch state for url uniqueness (north_rule):
    the ENTIRE mergeable per-partition sketch — (bucket, max leading-zero
    rank) over the portable md5-56 hash — is the query output, so the
    driver gate attests the sketch bit-for-bit against DuckDB, not just a
    summary. One groupBy-max (map-side partials = the treeAggregate
    analogue); ≤ 2^p rows ever leave the executors."""
    from jsonschema_spark.operators.stats import hll_sketch

    return hll_sketch(_hll_crawl_log(spark, sf_dir), "u", _HLL_P) \
        .orderBy("bucket")


def q_url_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass approximate distinct-url count from the portable HLL
    sketch, next to the exact count and the realized error in ppm —
    (m, v_empty, s_sum, est_milli, n_exact, err_ppm). est_milli is ONE
    shared-op-order float formula (α_m·m²·2^R/S) over the exact-integer
    harmonic denominator, bit-identical across engines."""
    from jsonschema_spark.operators.stats import distinct_approx

    log_df = _hll_crawl_log(spark, sf_dir)
    est = distinct_approx(log_df, "u", _HLL_P)
    exact = log_df.agg(F.count_distinct(F.col("u")).alias("n_exact"))
    j = est.crossJoin(F.broadcast(exact))
    err = F.floor(
        F.abs(F.col("est_milli") - F.lit(1000) * F.col("n_exact")) * 1000
        / F.col("n_exact")
    ).cast("long")
    return j.select("m", "v_empty", "s_sum", "est_milli", "n_exact",
                    err.alias("err_ppm"))


def _hll_sql_parts() -> tuple[str, str]:
    """(log+sketch CTE prefix, constants) shared by the two HLL mirrors —
    the SAME bucket/rank integer recipe the operator plans, over the same
    rebuilt crawl-log strings."""
    p = _HLL_P
    w, m = 56 - p, 2 ** p
    prefix = f"""
u AS (SELECT doc_id, {_MESSY_URL_SQL} AS url FROM documents),
log AS (SELECT url || '/r/' || i::VARCHAR AS u
        FROM u, LATERAL (SELECT unnest(range(1, 41)) AS i) ix),
h AS (SELECT CAST(('0x' || substr(md5(u), 1, 14)) AS BIGINT) AS hv FROM log),
b AS (SELECT CAST(hv % {m} AS INTEGER) AS bucket,
             CAST(hv // {m} AS BIGINT) AS rem FROM h),
sk AS (SELECT bucket,
              MAX(CASE WHEN rem = 0 THEN {w + 1}
                  ELSE {w} - length(bin(rem)) + 1 END)::INTEGER AS max_rank
       FROM b GROUP BY bucket)"""
    return prefix, ""


def _hll_sketch_sql() -> str:
    prefix, _ = _hll_sql_parts()
    return f"WITH {prefix} SELECT bucket, max_rank FROM sk ORDER BY bucket"


def q_streaming_hll_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """STREAMING-path attestation (VERDICT r4 directive 6): the crawl
    log re-reads as a Structured Stream in 3 micro-batches
    (maxFilesPerTrigger=1) through the stream_hll_sketch monitor; the
    availableNow drain's FINAL complete-mode state is the query output.
    The state IS the portable HLL (streaming/validate.py:
    stream_hll_sketch — a bounded 2^p-row groupBy-max with no
    watermark), so the DuckDB batch replay of the sketch recipe must
    hash-match the drained stream bit-for-bit — the driver gate
    attests the streaming engine path, not a batch stand-in."""
    from jsonschema_spark.streaming.validate import (
        drain_sketch_state, stream_hll_sketch)

    out = drain_sketch_state(
        spark, _hll_crawl_log(spark, sf_dir),
        lambda s: stream_hll_sketch(s, "u", _HLL_P),
        "/tmp/jsonschema_spark_stream_gate/hll_log",
        query_name="streaming_hll_state")
    return out.orderBy("bucket")


def _hll_distinct_sql() -> str:
    from jsonschema_spark.operators.stats import hll_alpha

    p = _HLL_P
    w, m = 56 - p, 2 ** p
    big_r = w + 1
    alpha = hll_alpha(p)
    pow_lit = float(2 ** (2 * p + big_r))
    prefix, _ = _hll_sql_parts()
    return f"""WITH {prefix},
agg AS (SELECT count(*) AS nb,
               coalesce(sum((CAST(1 AS BIGINT) << ({big_r} - max_rank))), 0) AS s_used
        FROM sk),
est AS (SELECT CAST({m} AS BIGINT) AS m,
               CAST({m} - nb AS BIGINT) AS v_empty,
               CAST(s_used + ({m} - nb) * {2 ** big_r} AS BIGINT) AS s_sum
        FROM agg),
ex AS (SELECT count(DISTINCT u) AS n_exact FROM log)
SELECT m, v_empty, s_sum,
       CAST(FLOOR({alpha!r} * {pow_lit!r} / CAST(s_sum AS DOUBLE) * 1000.0) AS BIGINT) AS est_milli,
       CAST(n_exact AS BIGINT) AS n_exact,
       CAST(FLOOR((abs(CAST(FLOOR({alpha!r} * {pow_lit!r} / CAST(s_sum AS DOUBLE) * 1000.0) AS BIGINT) - 1000 * n_exact) * 1000) / n_exact) AS BIGINT) AS err_ppm
FROM est, ex"""


_KMV_K = 256  # union sketch σ ≈ 1/√(k-2) ≈ 6.3% — snapshot-algebra regime


def _kmv_snapshot(spark: SparkSession, sf_dir: str, lo: int, hi: int) -> DataFrame:
    """Deterministic crawl snapshot: every messy url under path variants
    lo..hi. Two snapshots with overlapping variant ranges share exactly
    (overlap × n_urls) distinct urls — the KMV overlap ground truth."""
    return (
        _docs(spark, sf_dir).select("doc_id", "source")
        .withColumn("url", _messy_url())
        .select("url",
                F.explode(F.sequence(F.lit(lo), F.lit(hi))).alias("i"))
        .select(
            F.concat(F.col("url"), F.lit("/r/"), F.col("i").cast("string"))
            .alias("u")
        )
    )


def q_url_kmv_sketch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable KMV sketch state for url-set algebra: the k smallest
    distinct md5-56 hashes of a crawl snapshot — the ENTIRE mergeable
    sketch is the query output, attested bit-for-bit against DuckDB's
    DISTINCT → ORDER BY → LIMIT k replay. Map-side duplicate collapse +
    TakeOrderedAndProject; ≤ k rows ever reach the driver."""
    from jsonschema_spark.operators.stats import kmv_sketch

    return kmv_sketch(
        _kmv_snapshot(spark, sf_dir, 1, 30), "u", _KMV_K).orderBy("hv")


def q_url_kmv_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-style snapshot algebra two HLLs cannot do: union AND
    intersection estimates for two crawl snapshots with a planted
    overlap (variants 1-30 vs 21-50 → 1/5 of the union shared), next to
    the exact counts — (k, n_union_kept, theta, n_match, jaccard_ppm,
    est_union_milli, est_inter_milli, n_union_exact, n_inter_exact).
    Every estimate is one shared-op-order float formula over the
    deterministic sketch, so the driver gate attests the whole algebra."""
    from jsonschema_spark.operators.stats import kmv_overlap, kmv_sketch

    snap_a = _kmv_snapshot(spark, sf_dir, 1, 30)
    snap_b = _kmv_snapshot(spark, sf_dir, 21, 50)
    est = kmv_overlap(kmv_sketch(snap_a, "u", _KMV_K),
                      kmv_sketch(snap_b, "u", _KMV_K), _KMV_K)
    exact = (
        snap_a.select("u").unionByName(snap_b.select("u"))
        .agg(F.count_distinct("u").alias("n_union_exact"))
        .crossJoin(
            snap_a.join(snap_b, "u").agg(
                F.count_distinct("u").alias("n_inter_exact"))
        )
    )
    return est.crossJoin(F.broadcast(exact))


def _kmv_sql_parts() -> str:
    """Shared CTE prefix for the two KMV mirrors: both snapshots and both
    sketches, the SAME distinct-hash/order/limit recipe the operator
    plans, over the same rebuilt crawl-snapshot strings."""
    k = _KMV_K
    return f"""
u AS (SELECT doc_id, {_MESSY_URL_SQL} AS url FROM documents),
snap_a AS (SELECT url || '/r/' || i::VARCHAR AS u
           FROM u, LATERAL (SELECT unnest(range(1, 31)) AS i) ix),
snap_b AS (SELECT url || '/r/' || i::VARCHAR AS u
           FROM u, LATERAL (SELECT unnest(range(21, 51)) AS i) ix),
sk_a AS (SELECT DISTINCT CAST(('0x' || substr(md5(u), 1, 14)) AS BIGINT) AS hv
         FROM snap_a ORDER BY hv LIMIT {k}),
sk_b AS (SELECT DISTINCT CAST(('0x' || substr(md5(u), 1, 14)) AS BIGINT) AS hv
         FROM snap_b ORDER BY hv LIMIT {k})"""


def _kmv_sketch_sql() -> str:
    return f"WITH {_kmv_sql_parts()} SELECT hv FROM sk_a ORDER BY hv"


def _kmv_overlap_sql() -> str:
    k = _KMV_K
    two56 = 2 ** 56
    return f"""WITH {_kmv_sql_parts()},
un AS (SELECT DISTINCT hv FROM (SELECT hv FROM sk_a UNION ALL SELECT hv FROM sk_b)
       ORDER BY hv LIMIT {k}),
th AS (SELECT CAST(count(*) AS BIGINT) AS n_union_kept,
              CAST(CASE WHEN count(*) < {k} THEN {two56}
                   ELSE max(hv) END AS BIGINT) AS theta
       FROM un),
mt AS (SELECT CAST(coalesce(sum(CASE WHEN i.hv < th.theta THEN 1 END), 0) AS BIGINT)
              AS n_match
       FROM (SELECT sk_a.hv FROM sk_a JOIN sk_b USING (hv)) i, th),
ex AS (SELECT CAST(count(DISTINCT u) AS BIGINT) AS n_union_exact
       FROM (SELECT u FROM snap_a UNION ALL SELECT u FROM snap_b)),
ei AS (SELECT CAST(count(DISTINCT snap_a.u) AS BIGINT) AS n_inter_exact
       FROM snap_a JOIN snap_b USING (u))
SELECT CAST({k} AS BIGINT) AS k, n_union_kept, theta, n_match,
       CAST(CASE WHEN n_union_kept = 0 THEN 0
            ELSE n_match * 1000000 // n_union_kept END AS BIGINT) AS jaccard_ppm,
       CAST(CASE WHEN n_union_kept < {k} THEN n_union_kept * 1000
            ELSE CAST(FLOOR({float(k - 1)!r} * {float(two56)!r}
                 / CAST(theta AS DOUBLE) * 1000.0) AS BIGINT)
            END AS BIGINT) AS est_union_milli,
       CAST(FLOOR(CAST(n_match AS DOUBLE) * {float(two56)!r}
            / CAST(theta AS DOUBLE) * 1000.0) AS BIGINT) AS est_inter_milli,
       n_union_exact, n_inter_exact
FROM th, mt, ex, ei"""


_BLOOM_M, _BLOOM_K = 8192, 3


def q_url_bloom_bits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Portable Bloom filter state for the url set — the ENTIRE set-bit
    ledger (k salted md5-56 positions mod m per url, distinct), attested
    bit-for-bit against DuckDB's replay. This is the oracle-checkable
    sibling of referential.py's engine-private Spark BloomFilter: the
    bounded-state membership side of the sketch family (north_rule's
    broadcast bloom referential checks)."""
    from jsonschema_spark.operators.stats import bloom_sketch

    urls = _docs(spark, sf_dir).select("doc_id", "source") \
        .withColumn("u", _messy_url())
    return bloom_sketch(urls, "u", _BLOOM_M, _BLOOM_K).orderBy("bit")


def q_bloom_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark-contamination prefilter with BOUNDED state: build the
    Bloom over the benchmark's content signatures (docs 0-49), probe
    every corpus signature — members can never be missed (no false
    negatives), non-members pass at the sized-for FP rate; verdicts are
    deterministic so the gate attests build AND probe. The full-key
    broadcast join (dedup.contamination) is the exact sibling; this is
    the shape that still works when the benchmark key set outgrows a
    broadcast."""
    from jsonschema_spark.operators.stats import bloom_probe, bloom_sketch

    d = _docs(spark, sf_dir).select(
        F.col("doc_id"), F.md5("text").alias("sig"))
    bench = d.where(F.col("doc_id") < 50)
    sk = bloom_sketch(bench, "sig", _BLOOM_M, _BLOOM_K)
    return bloom_probe(sk, d, "sig", _BLOOM_M, _BLOOM_K).orderBy("sig")


def _bloom_bits_cte(values_cte: str, col: str) -> str:
    m, k = _BLOOM_M, _BLOOM_K
    h = _h56(f"'b' || j || ':' || {col}")
    return f"""
pb AS (SELECT {h} % {m} AS bit
       FROM {values_cte}, (SELECT unnest(range(0, {k})) AS j) jx),
bits AS (SELECT DISTINCT bit FROM pb WHERE bit IS NOT NULL)"""


def _bloom_bits_sql() -> str:
    return f"""
WITH u AS (SELECT {_MESSY_URL_SQL} AS u FROM documents),
{_bloom_bits_cte('u', 'u')}
SELECT bit FROM bits ORDER BY bit"""


def _bloom_decontaminate_sql() -> str:
    m, k = _BLOOM_M, _BLOOM_K
    h = _h56("'b' || j || ':' || sig")
    return f"""
WITH d AS (SELECT doc_id, md5(text) AS sig FROM documents),
bench AS (SELECT sig FROM d WHERE doc_id < 50),
{_bloom_bits_cte('bench', 'sig')},
probes AS (SELECT DISTINCT sig FROM d WHERE sig IS NOT NULL),
pr AS (SELECT sig, {h} % {m} AS bit
       FROM probes, (SELECT unnest(range(0, {k})) AS j) jx),
hits AS (SELECT pr.sig,
                sum(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END)::BIGINT
                AS n_hit
         FROM pr LEFT JOIN bits b ON pr.bit = b.bit GROUP BY 1)
SELECT sig, n_hit, n_hit = {k} AS maybe_member
FROM hits ORDER BY sig"""


def _incremental_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The synthetic 'new crawl': exact recrawls (doc_id<50), near dups
    with the first token stripped (50-99), and genuinely novel pages
    (100-149) — ids offset by 200000. The DuckDB oracle rebuilds the
    identical table (_INCR_NEW_SQL)."""
    d = _docs(spark, sf_dir).where(F.col("doc_id") < 150)
    novel = F.concat_ws(" ", *[
        F.concat(F.lit(f"nv{s}"), F.col("doc_id").cast("string"))
        for s in "abcde"
    ])
    return d.select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.when(F.col("doc_id") < 50, F.col("text"))
         .when(F.col("doc_id") < 100,
               F.regexp_replace("text", r"^\S+\s*", ""))
         .otherwise(novel).alias("text"),
    )


def q_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-crawl dedup: new docs surviving BOTH the exact
    text-hash anti-join and the asymmetric new-vs-corpus MinHash-LSH
    candidate join (operators/dedup.py:dedup_against_corpus)."""
    from jsonschema_spark.operators.dedup import dedup_against_corpus

    kept = dedup_against_corpus(
        _incremental_new_docs(spark, sf_dir), _docs(spark, sf_dir),
        "doc_id", "text", k=12, bands=6, shingle_n=3)
    return kept.select("doc_id", F.length("text").cast("long").alias("n_chars"))


def q_dup_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span accounting (suffix-array dedup stand-in, Lee et
    al. 2022): exact 8-token windows occurring >=2 times corpus-wide
    (multiplicity, within-doc included) per document, in floor-ppm."""
    from jsonschema_spark.operators.dedup import dup_span_stats

    return dup_span_stats(_docs(spark, sf_dir), "doc_id", "text",
                          span_tokens=8)


_MIX_TARGET = {"en": 400000, "de": 300000, "fr": 200000, "es": 100000}


def q_mixture_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture reweighting applied as deterministic id-stable
    sampling: per-lang weights = ratio-of-ratios vs the binding group
    (integer-ppm, one double op order both engines), keep when
    hash56(mix:id) % 1e6 < weight. Langs outside the target drop."""
    from jsonschema_spark.operators.curate import mixture_sample

    kept = mixture_sample(_docs(spark, sf_dir), "doc_id", "lang", _MIX_TARGET)
    return kept.select("doc_id", "lang").orderBy("doc_id")


def _mixture_sample_sql() -> str:
    h = _h56("'mix:' || doc_id::VARCHAR")
    case = " ".join(
        f"WHEN '{k}' THEN {v}" for k, v in sorted(_MIX_TARGET.items())
    )
    return f"""
WITH c AS (SELECT lang AS grp, count(*) AS n FROM documents GROUP BY 1),
t AS (SELECT grp, n, CASE grp {case} ELSE 0 END AS tp FROM c),
b AS (SELECT tp AS tb, n AS nb FROM t WHERE tp > 0
      ORDER BY tp::DOUBLE / n::DOUBLE DESC, grp ASC LIMIT 1),
w AS (SELECT grp, CASE WHEN tp > 0
                       THEN floor(1000000.0 * (tp*nb)::DOUBLE / (n*tb)::DOUBLE)::BIGINT
                       ELSE 0 END AS wppm FROM t, b)
SELECT d.doc_id, d.lang FROM documents d JOIN w ON d.lang = w.grp
WHERE {h} % 1000000 < w.wppm
ORDER BY 1
"""


def q_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """α=1/2 temperature mixing with targets DERIVED from corpus counts
    (multilingual-training standard: share ∝ √n_g — no external target
    dict): per-lang weights floor(1e6·s_g·n_b/(n_g·s_b)) with
    s = floor(sqrt(n)) — bit-stable because IEEE sqrt is correctly
    rounded in every engine — plus the realized kept counts from the
    id-stable hash sampler, so the gate attests derivation AND
    application. (lang, n_docs, s, weight_ppm, n_kept)."""
    from jsonschema_spark.operators.curate import (
        temperature_sample, temperature_weights)

    d = _docs(spark, sf_dir).select("doc_id", "lang")
    w = temperature_weights(d, "lang")
    kept = temperature_sample(d, "doc_id", "lang") \
        .groupBy("lang").agg(F.count(F.lit(1)).alias("n_kept"))
    return (
        w.join(kept, "lang", "left")
        .select("lang", "n_docs", "s", "weight_ppm",
                F.coalesce(F.col("n_kept"), F.lit(0)).cast("long")
                .alias("n_kept"))
        .orderBy("lang")
    )


def _temperature_mixture_sql() -> str:
    h = _h56("'temp:' || doc_id::VARCHAR")
    return f"""
WITH c AS (SELECT lang AS grp, count(*)::BIGINT AS n_docs
           FROM documents GROUP BY 1),
s AS (SELECT grp, n_docs,
             CAST(floor(sqrt(CAST(n_docs AS DOUBLE))) AS BIGINT) AS s
      FROM c),
b AS (SELECT s AS sb, n_docs AS nb FROM s
      ORDER BY CAST(s AS DOUBLE) / CAST(n_docs AS DOUBLE) DESC, grp ASC
      LIMIT 1),
w AS (SELECT grp, n_docs, s.s,
             least(1000000,
                   CAST(floor(1000000.0 * CAST(s.s * b.nb AS DOUBLE)
                        / CAST(s.n_docs * b.sb AS DOUBLE)) AS BIGINT))
             AS weight_ppm
      FROM s, b),
k AS (SELECT d.lang AS grp, count(*)::BIGINT AS n_kept
      FROM documents d JOIN w ON d.lang = w.grp
      WHERE {h} % 1000000 < w.weight_ppm GROUP BY 1)
SELECT w.grp AS lang, n_docs, s, weight_ppm,
       coalesce(n_kept, 0)::BIGINT AS n_kept
FROM w LEFT JOIN k USING (grp) ORDER BY lang"""


def q_snapshot_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-url crawl-snapshot ledger (the recrawl scheduler's
    input): full-outer join on canonical key classifying every url as
    new / gone / changed / unchanged between two snapshots — planted
    deltas: every 11th url vanishes, every 5th changes content, 50
    novel urls appear. The sketch-sized sibling is url_kmv_overlap."""
    from jsonschema_spark.operators.urltools import snapshot_delta_df

    d = _docs(spark, sf_dir).select("doc_id", "text")
    key = F.concat(F.lit("u"), F.col("doc_id").cast("string"))
    old = d.select(key.alias("url"),
                   F.substring(F.md5("text"), 1, 14).alias("h"))
    new_base = d.where(F.col("doc_id") % 11 != 0).select(
        key.alias("url"),
        F.substring(
            F.md5(F.when(F.col("doc_id") % 5 == 0,
                         F.concat(F.col("text"), F.lit(" v2")))
                  .otherwise(F.col("text"))), 1, 14).alias("h"))
    added = spark.range(1, 51).select(
        F.concat(F.lit("n"), F.col("id").cast("string")).alias("url"),
        F.substring(F.md5(F.col("id").cast("string")), 1, 14).alias("h"))
    return snapshot_delta_df(
        old, new_base.unionByName(added), "url", "h").orderBy("url")


_SNAPSHOT_DELTA_SQL = """
WITH old AS (SELECT 'u' || doc_id::VARCHAR AS url,
                    substr(md5(text), 1, 14) AS h FROM documents),
nb AS (SELECT 'u' || doc_id::VARCHAR AS url,
              substr(md5(CASE WHEN doc_id % 5 = 0 THEN text || ' v2'
                              ELSE text END), 1, 14) AS h
       FROM documents WHERE doc_id % 11 <> 0),
ad AS (SELECT 'n' || i::VARCHAR AS url, substr(md5(i::VARCHAR), 1, 14) AS h
       FROM (SELECT unnest(range(1, 51)) AS i)),
new AS (SELECT * FROM nb UNION ALL SELECT * FROM ad),
j AS (SELECT coalesce(o.url, n.url) AS url, o.h AS h_old, n.h AS h_new
      FROM old o FULL OUTER JOIN new n ON o.url = n.url)
SELECT url, h_old, h_new,
       CASE WHEN h_old IS NULL THEN 'new'
            WHEN h_new IS NULL THEN 'gone'
            WHEN h_old <> h_new THEN 'changed'
            ELSE 'unchanged' END AS status
FROM j ORDER BY url"""


def q_vocab_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language vocabulary-growth diagnostics (Heaps/Zipf lens):
    tokens, types, hapax share and type-token ratio in integer ppm —
    one explode + two map-side-partial groupBys, join from doc counts
    so tokenless groups keep zeros."""
    from jsonschema_spark.operators.textstats import vocab_stats

    # the synthetic corpus has a CLOSED 32-word vocabulary (hapax ≡ 0 —
    # the round-3 trap); mix in open-vocabulary tokens: one unique token
    # per doc (true hapax mass) and one lang-shared token on even ids
    # (a repeated type), so every output column carries signal
    d = _docs(spark, sf_dir).select(
        "lang",
        F.concat(
            F.col("text"), F.lit(" uq"), F.col("doc_id").cast("string"),
            F.when(F.col("doc_id") % 2 == 0,
                   F.concat(F.lit(" shared"), F.col("lang")))
            .otherwise(F.lit(""))).alias("text"))
    return vocab_stats(d, "text", "lang").orderBy("lang")


_VOCAB_STATS_SQL = f"""
WITH aug AS (SELECT lang,
                    text || ' uq' || doc_id::VARCHAR ||
                    CASE WHEN doc_id % 2 = 0 THEN ' shared' || lang
                         ELSE '' END AS text
             FROM documents),
t AS (SELECT lang, {_TOKS} AS toks FROM aug),
tok AS (SELECT lang, unnest(toks) AS tk FROM t),
tc AS (SELECT lang, tk, count(*)::BIGINT AS c FROM tok GROUP BY 1, 2),
g AS (SELECT lang, sum(c)::BIGINT AS n_tokens, count(*)::BIGINT AS n_types,
             sum(CASE WHEN c = 1 THEN 1 ELSE 0 END)::BIGINT AS hapax
      FROM tc GROUP BY 1),
d AS (SELECT lang, count(*)::BIGINT AS n_docs FROM documents GROUP BY 1)
SELECT d.lang, n_docs,
       coalesce(n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(n_types, 0)::BIGINT AS n_types,
       coalesce(hapax, 0)::BIGINT AS hapax,
       CASE WHEN coalesce(n_types, 0) > 0
            THEN hapax * 1000000 // n_types ELSE 0 END::BIGINT AS hapax_ppm,
       CASE WHEN coalesce(n_tokens, 0) > 0
            THEN n_types * 1000000 // n_tokens ELSE 0 END::BIGINT AS ttr_ppm
FROM d LEFT JOIN g USING (lang) ORDER BY lang"""


def q_shingle_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-level novelty of a new crawl vs the corpus, measured by
    KMV set algebra over word 3-gram shingles (not urls): overlap/Jaccard
    between the corpus shingle set and the incremental crawl's
    (_incremental_new_docs: 1/3 recrawls, 1/3 near-dups, 1/3 novel) —
    the sketch-sized answer to 'how much of this snapshot is new text'.
    Pure composition of shipped operators: word_shingles → explode →
    kmv_sketch → kmv_overlap."""
    from jsonschema_spark.operators.dedup import word_shingles
    from jsonschema_spark.operators.stats import kmv_overlap, kmv_sketch

    def sh(df: DataFrame) -> DataFrame:
        return df.select(
            F.explode(word_shingles(F.col("text"), 3)).alias("sh"))

    corpus = sh(_docs(spark, sf_dir))
    new = sh(_incremental_new_docs(spark, sf_dir))
    return kmv_overlap(kmv_sketch(corpus, "sh", _KMV_K),
                       kmv_sketch(new, "sh", _KMV_K), _KMV_K)


def _shingle_novelty_sql() -> str:
    k = _KMV_K
    two56 = 2 ** 56
    novel = " || ' ' || ".join(
        f"('nv{s}' || doc_id::VARCHAR)" for s in "abcde")
    return f"""
WITH newdocs AS (
  SELECT doc_id + 200000 AS doc_id,
         CASE WHEN doc_id < 50 THEN text
              WHEN doc_id < 100 THEN regexp_replace(text, '^\\S+\\s*', '')
              ELSE {novel} END AS text
  FROM documents WHERE doc_id < 150),
ct AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
csh AS (SELECT doc_id, {_SHINGLE3} AS s FROM ct),
nt AS (SELECT doc_id, {_TOKS} AS toks FROM newdocs),
nsh AS (SELECT doc_id, {_SHINGLE3} AS s FROM nt),
sk_a AS (SELECT DISTINCT {_h56('sh')} AS hv
         FROM (SELECT unnest(s) AS sh FROM csh) ORDER BY hv LIMIT {k}),
sk_b AS (SELECT DISTINCT {_h56('sh')} AS hv
         FROM (SELECT unnest(s) AS sh FROM nsh) ORDER BY hv LIMIT {k}),
un AS (SELECT DISTINCT hv FROM (SELECT hv FROM sk_a UNION ALL SELECT hv FROM sk_b)
       ORDER BY hv LIMIT {k}),
th AS (SELECT CAST(count(*) AS BIGINT) AS n_union_kept,
              CAST(CASE WHEN count(*) < {k} THEN {two56}
                   ELSE max(hv) END AS BIGINT) AS theta
       FROM un),
mt AS (SELECT CAST(coalesce(sum(CASE WHEN i.hv < th.theta THEN 1 END), 0) AS BIGINT)
              AS n_match
       FROM (SELECT sk_a.hv FROM sk_a JOIN sk_b USING (hv)) i, th)
SELECT CAST({k} AS BIGINT) AS k, n_union_kept, theta, n_match,
       CAST(CASE WHEN n_union_kept = 0 THEN 0
            ELSE n_match * 1000000 // n_union_kept END AS BIGINT) AS jaccard_ppm,
       CAST(CASE WHEN n_union_kept < {k} THEN n_union_kept * 1000
            ELSE CAST(FLOOR({float(k - 1)!r} * {float(two56)!r}
                 / CAST(theta AS DOUBLE) * 1000.0) AS BIGINT)
            END AS BIGINT) AS est_union_milli,
       CAST(FLOOR(CAST(n_match AS DOUBLE) * {float(two56)!r}
            / CAST(theta AS DOUBLE) * 1000.0) AS BIGINT) AS est_inter_milli
FROM th, mt"""


def q_compression_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """zlib compression-ratio quality signal (repetitive spam compresses
    far below natural text). NON-SQL-expressible (no DEFLATE in DuckDB):
    rows-only correctness by design; exact values pinned by the
    python-mirror unit test."""
    from jsonschema_spark.operators.textstats import compression_ratio

    return compression_ratio(_docs(spark, sf_dir), "doc_id", "text")


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease proxy: three JVM regexp_count calls in the
    scan projection + one fixed-op-order double formula (milli-points)."""
    from jsonschema_spark.operators.textstats import readability

    return readability(_docs(spark, sf_dir), "doc_id", "text")


_READABILITY_SQL = f"""
WITH t AS (SELECT doc_id, text, {_TOKS} AS toks FROM documents),
c AS (SELECT doc_id,
             coalesce(len(toks), 0)::BIGINT AS n_words,
             greatest(1, coalesce(len(regexp_extract_all(text, '[.!?]+')), 0))::BIGINT AS n_sentences,
             coalesce(len(regexp_extract_all(lower(text), '[aeiouy]+')), 0)::BIGINT AS n_syllables
      FROM t)
SELECT doc_id, n_words, n_sentences, n_syllables,
       CASE WHEN n_words > 0
            THEN floor(206835.0 - 1015.0 * n_words / n_sentences
                                - 84600.0 * n_syllables / n_words)::BIGINT
       END AS flesch_milli
FROM c
"""


def q_winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing (MOSS) local fingerprints: min 5-gram hash per sliding
    4-window, leftmost tie-break, consecutive dedup — one window min per
    doc, mirrored frame-for-frame in the oracle."""
    from jsonschema_spark.operators.textstats import winnow_fingerprints

    return winnow_fingerprints(_docs(spark, sf_dir), "doc_id", "text", k=5, w=4)


def _winnow_sql(k: int = 5, w: int = 4) -> str:
    h = _h56(f"array_to_string(toks[i:i+{k - 1}], ' ')")
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
g AS (SELECT doc_id, i - 1 AS pos, {h} AS h
      FROM t, LATERAL (SELECT unnest(range(1, len(toks)-{k}+2)) AS i) ix
      WHERE len(toks) >= {k}),
sel AS (SELECT doc_id,
               min({{'h': h, 'pos': pos}}) OVER (PARTITION BY doc_id ORDER BY pos
                    ROWS BETWEEN CURRENT ROW AND {w - 1} FOLLOWING) AS m
        FROM g)
SELECT DISTINCT doc_id, m.pos::BIGINT AS pos, m.h AS gram_h56 FROM sel
"""


def q_tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 characteristic terms per doc by TF * integer-IDF-surrogate
    (floor(1e6*N/df) — ln-free so scores are exact int64 both engines)."""
    from jsonschema_spark.operators.textstats import tfidf_top_terms

    return tfidf_top_terms(_docs(spark, sf_dir), "doc_id", "text", k=5)


def _tfidf_sql(k: int = 5) -> str:
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
x AS (SELECT doc_id, unnest(toks) AS term FROM t),
tf AS (SELECT doc_id, term, count(*) AS tf FROM x GROUP BY 1, 2),
dft AS (SELECT term, count(*) AS dft FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n FROM documents),
s AS (SELECT tf.doc_id, tf.term, tf.tf,
             floor(n.n * 1000000 / dft.dft)::BIGINT AS idf_ppm
      FROM tf JOIN dft USING (term), n),
r AS (SELECT *, (tf * idf_ppm)::BIGINT AS score,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY tf * idf_ppm DESC, term ASC) AS rnk
      FROM s)
SELECT doc_id, term, tf::BIGINT AS tf, idf_ppm, score, rnk::BIGINT AS rnk
FROM r WHERE rnk <= {k}
"""


def q_prototypicality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSL-prototypes pruning metric (Sorscher et al. 2022): quantized
    cosine of each embedding to its OWN cluster centroid — low = outlier,
    high = redundant prototype; zero joins, zero shuffles."""
    from jsonschema_spark.operators.similarity import prototypicality

    e = spark.read.parquet(_t(sf_dir, "embeddings"))
    return prototypicality(e, "vec_id", "embedding", n_centroids=8)


def _prototypicality_sql() -> str:
    dot_qc = "list_sum([c.qe[i]*ct.cv[i] for i in range(1, 65)])"
    dot_qq = "list_sum([c.qe[i]*c.qe[i] for i in range(1, 65)])"
    dot_cc = "list_sum([ct.cv[i]*ct.cv[i] for i in range(1, 65)])"
    return f"""
{_QEMB},
pd AS (SELECT vec_id % 8 AS ci, i,
              floor((sum(qe[i])::BIGINT)::DOUBLE / count(*))::BIGINT AS cv
       FROM q, (SELECT unnest(range(1, 65)) AS i) ix GROUP BY 1, 2),
cent AS (SELECT ci, list(cv ORDER BY i) AS cv FROM pd GROUP BY ci),
d AS (SELECT q.vec_id, q.qe, c.ci,
             list_sum([(q.qe[i]-c.cv[i])*(q.qe[i]-c.cv[i]) for i in range(1, 65)]) AS dist
      FROM q, cent c),
asg AS (SELECT vec_id, qe, ci,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, ci ASC) AS rn
        FROM d),
corp AS (SELECT vec_id, qe, ci FROM asg WHERE rn = 1)
SELECT c.vec_id, c.ci::BIGINT AS ci,
       floor(1000000.0 * {dot_qc}::DOUBLE /
             sqrt(({dot_qq} * {dot_cc})::DOUBLE))::BIGINT AS cos_centroid_micro
FROM corp c JOIN cent ct ON c.ci = ct.ci
"""


def q_leakage_safe_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-keyed train/val/test split: every doc of one source lands in
    the same split (near-dup siblings cannot straddle train/test)."""
    from jsonschema_spark.operators.curate import leakage_safe_split

    return leakage_safe_split(
        _docs(spark, sf_dir), "doc_id", "source",
        splits=(("train", 800000), ("val", 100000), ("test", 100000)))


def _leakage_split_sql() -> str:
    h = _h56("'split:' || source")
    return f"""
SELECT doc_id, source, ({h} % 1000000)::BIGINT AS bucket_ppm,
       CASE WHEN {h} % 1000000 < 800000 THEN 'train'
            WHEN {h} % 1000000 < 900000 THEN 'val'
            ELSE 'test' END AS split
FROM documents
"""


def q_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banding-quality measurement IN-ENGINE ("measure, don\'t guess"):
    recall of the MinHash-LSH candidate set against the exact Jaccard
    truth set (>= 0.5) on the planted-near-dup corpus, plus the candidate
    count the banding paid for it. One row: (n_true, n_cand, n_hit,
    recall_ppm)."""
    from jsonschema_spark.operators.dedup import jaccard_pairs, minhash_lsh_pairs

    d = _docs_with_near_dups(spark, sf_dir)
    exact = jaccard_pairs(d, "doc_id", "text", shingle_n=3,
                          min_ppm=500000).select("id_a", "id_b")
    cand = (minhash_lsh_pairs(d, "doc_id", "text", k=12, bands=6)
            .select("id_a", "id_b").distinct())
    joined = exact.join(cand.withColumn("_c", F.lit(1)), ["id_a", "id_b"], "left")
    row = joined.agg(
        F.count(F.lit(1)).alias("n_true"),
        F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("n_hit"),
    ).crossJoin(cand.agg(F.count(F.lit(1)).alias("n_cand")))
    return row.select(
        "n_true", "n_cand", "n_hit",
        F.floor(F.col("n_hit") * F.lit(1_000_000) /
                F.greatest(F.col("n_true"), F.lit(1))).cast("long").alias("recall_ppm"),
    )


def _lsh_recall_sql() -> str:
    return f"""
{_AUG_SH},
sz AS (SELECT doc_id, len(s) AS n FROM sh WHERE len(s) > 0),
inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
truth AS (SELECT id_a, id_b FROM common
          JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
          WHERE floor(n_common * 1000000 / (sa.n + sb.n - n_common))::BIGINT >= 500000),
sig AS (SELECT doc_id, {_SIG12} AS sig FROM sh WHERE len(s) > 0),
bands AS (SELECT doc_id, b.j AS band,
                 sig[2*b.j+1]::VARCHAR || '_' || sig[2*b.j+2]::VARCHAR AS band_key
          FROM sig, (SELECT unnest(range(0, 6)) AS j) b),
cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         FROM bands a JOIN bands b
           ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id)
SELECT (SELECT count(*) FROM truth)::BIGINT AS n_true,
       (SELECT count(*) FROM cand)::BIGINT AS n_cand,
       (SELECT count(*) FROM truth t JOIN cand c
          ON t.id_a = c.id_a AND t.id_b = c.id_b)::BIGINT AS n_hit,
       floor((SELECT count(*) FROM truth t JOIN cand c
                ON t.id_a = c.id_a AND t.id_b = c.id_b) * 1000000
             / greatest((SELECT count(*) FROM truth), 1))::BIGINT AS recall_ppm
"""


_QUOTE_FILLER = (" quotefarm filler alpha beta gamma delta epsilon zeta"
                 " eta theta iota kappa lambda mu nu xi omicron pi rho")


def q_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment near-dups: docs 0-9 are each embedded inside
    a longer planted quote-farm doc (id+200000) — containment flags the
    embedding at ~1e6 ppm where Jaccard stays low."""
    from jsonschema_spark.operators.dedup import containment_pairs

    d = _docs(spark, sf_dir).select("doc_id", "text")
    quotes = d.filter(F.col("doc_id") < 10).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(_QUOTE_FILLER)).alias("text"),
    )
    return containment_pairs(
        d.unionAll(quotes), "doc_id", "text", shingle_n=3, min_ppm=900000)


def _containment_sql() -> str:
    filler = _QUOTE_FILLER
    return f"""
WITH aug AS (SELECT doc_id, text FROM documents UNION ALL
             SELECT doc_id + 200000, text || \'{filler}\'
             FROM documents WHERE doc_id < 10),
t AS (SELECT doc_id, {_AUG_TOKS} AS toks FROM aug),
sh AS (SELECT doc_id,
       CASE WHEN len(toks) >= 3
            THEN list_distinct([array_to_string(toks[i:i+2], ' ')
                                for i in range(1, len(toks)-2+1)])
            ELSE []::VARCHAR[] END AS s FROM t),
sz AS (SELECT doc_id, len(s) AS n FROM sh WHERE len(s) > 0),
inv AS (SELECT doc_id, unnest(s) AS g FROM sh),
common AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
           FROM inv a JOIN inv b ON a.g = b.g AND a.doc_id < b.doc_id
           GROUP BY 1, 2)
SELECT id_a, id_b, n_common,
       floor(n_common * 1000000 / (sa.n + sb.n - n_common))::BIGINT AS jaccard_ppm,
       floor(n_common * 1000000 / least(sa.n, sb.n))::BIGINT AS containment_ppm
FROM common JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
WHERE floor(n_common * 1000000 / least(sa.n, sb.n))::BIGINT >= 900000
"""


def q_semantic_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup recall vs exact all-pairs at the same cosine threshold —
    quantifies the documented cross-cluster miss honestly: (n_true,
    n_cand, n_hit, recall_ppm). NOTE the fixture is the WORST case for
    cell co-location: cos >= 0.45 pairs over near-random embeddings are
    weakly similar, so they scatter across the 8 cells (measured recall
    ~0.21 here). Real semantic duplicates sit at cos >= 0.95 and land in
    the same cell — the paper's regime; the measurement exists so the
    trade is a NUMBER, not a hope, and moves with n_centroids/threshold."""
    from jsonschema_spark.operators.dedup import embedding_near_dup_pairs
    from jsonschema_spark.operators.similarity import semantic_dedup_pairs

    e = spark.read.parquet(_t(sf_dir, "embeddings"))
    exact = embedding_near_dup_pairs(
        e, "vec_id", "embedding", min_cos_micro=450000).select("id_a", "id_b")
    sem = (semantic_dedup_pairs(e, "vec_id", "embedding",
                                min_cos_micro=450000, n_centroids=8)
           .select("id_a", "id_b").distinct())
    joined = exact.join(sem.withColumn("_c", F.lit(1)), ["id_a", "id_b"], "left")
    row = joined.agg(
        F.count(F.lit(1)).alias("n_true"),
        F.coalesce(F.sum("_c"), F.lit(0)).cast("long").alias("n_hit"),
    ).crossJoin(sem.agg(F.count(F.lit(1)).alias("n_cand")))
    return row.select(
        "n_true", "n_cand", "n_hit",
        F.floor(F.col("n_hit") * F.lit(1_000_000) /
                F.greatest(F.col("n_true"), F.lit(1))).cast("long").alias("recall_ppm"),
    )


def _semantic_recall_sql() -> str:
    return f"""
{_QEMB},
pd AS (SELECT vec_id % 8 AS ci, i,
              floor((sum(qe[i])::BIGINT)::DOUBLE / count(*))::BIGINT AS cv
       FROM q, (SELECT unnest(range(1, 65)) AS i) ix GROUP BY 1, 2),
cent AS (SELECT ci, list(cv ORDER BY i) AS cv FROM pd GROUP BY ci),
d AS (SELECT q.vec_id, q.qe, c.ci,
             list_sum([(q.qe[i]-c.cv[i])*(q.qe[i]-c.cv[i]) for i in range(1, 65)]) AS dist
      FROM q, cent c),
asg AS (SELECT vec_id, qe, ci,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, ci ASC) AS rn
        FROM d),
corp AS (SELECT vec_id, qe, ci FROM asg WHERE rn = 1),
truth AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM q a JOIN q b ON a.vec_id < b.vec_id
          WHERE {_COS_MICRO} >= 450000),
cand AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
         FROM corp a JOIN corp b ON a.ci = b.ci AND a.vec_id < b.vec_id
         WHERE {_COS_MICRO} >= 450000)
SELECT (SELECT count(*) FROM truth)::BIGINT AS n_true,
       (SELECT count(*) FROM cand)::BIGINT AS n_cand,
       (SELECT count(*) FROM truth t JOIN cand c
          ON t.id_a = c.id_a AND t.id_b = c.id_b)::BIGINT AS n_hit,
       floor((SELECT count(*) FROM truth t JOIN cand c
                ON t.id_a = c.id_a AND t.id_b = c.id_b) * 1000000
             / greatest((SELECT count(*) FROM truth), 1))::BIGINT AS recall_ppm
"""


def q_pipeline_end2end(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full crawl-curation pipeline in one query — per-domain cap →
    Gopher/C4 quality gate → MinHash-LSH near-dup components → canonical
    keep → per-source doc + BPE-token accounting. Every stage is the
    shipped operator; the oracle replays all of it in one recursive CTE."""
    from jsonschema_spark.operators.curate import curate_corpus, domain_cap_sample
    from jsonschema_spark.operators.textstats import bpe_token_count

    d = _docs(spark, sf_dir).select("doc_id", "source", "text")
    capped = domain_cap_sample(d, "doc_id", "source", cap=30).drop("n_group")
    curated = curate_corpus(
        capped, "doc_id", "text",
        min_words=10, max_words=100000, min_stopwords=1,
        k=12, bands=6, shingle_n=3,
    )
    return (
        curated.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(bpe_token_count(F.col("text"))).cast("long").alias("n_bpe_tokens"),
        )
        .orderBy("source")
    )


def _pipeline_end2end_sql() -> str:
    from jsonschema_spark.operators.textstats import BPE_TOKEN_RE

    pat = BPE_TOKEN_RE.replace("'", "''")
    h = _h56("'domcap:' || doc_id::VARCHAR")
    return f"""
WITH RECURSIVE
capr AS (SELECT doc_id, source,
                row_number() OVER (PARTITION BY source
                                   ORDER BY {h}, doc_id) AS rn
         FROM documents),
capd AS (SELECT d.doc_id, d.source, d.text
         FROM capr c JOIN documents d USING (doc_id) WHERE c.rn <= 30),
wt AS ({_WEBTEXT_SQL}),
kept AS (SELECT cd.doc_id, cd.source, cd.text FROM capd cd
         JOIN wt ON cd.doc_id = wt.doc_id WHERE wt.keep = 1),
kt AS (SELECT doc_id, CASE WHEN length(trim(text))=0 THEN []::VARCHAR[]
                           ELSE string_split_regex(trim(lower(text)), '\\s+')
                      END AS toks FROM kept),
sh AS (SELECT doc_id,
       CASE WHEN len(toks) >= 3
            THEN list_distinct([array_to_string(toks[i:i+2], ' ')
                                for i in range(1, len(toks)-2+1)])
            ELSE []::VARCHAR[] END AS s FROM kt),
sig AS (SELECT doc_id, {_SIG12} AS sig FROM sh WHERE len(s) > 0),
bands AS (SELECT doc_id, b.j AS band,
                 sig[2*b.j+1]::VARCHAR || '_' || sig[2*b.j+2]::VARCHAR AS band_key
          FROM sig, (SELECT unnest(range(0, 6)) AS j) b),
pairs AS (SELECT a.doc_id AS id_a, b.doc_id AS id_b
          FROM bands a JOIN bands b
            ON a.band = b.band AND a.band_key = b.band_key AND a.doc_id < b.doc_id
          GROUP BY 1, 2),
edges AS (SELECT id_a AS x, id_b AS y FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach(x, y) AS (SELECT x, y FROM edges
                UNION SELECT x, x FROM edges
                UNION SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x),
comp AS (SELECT x AS doc_id, min(y) AS cluster_id FROM reach GROUP BY 1),
final AS (SELECT k.* FROM kept k LEFT JOIN comp c ON k.doc_id = c.doc_id
          WHERE c.cluster_id IS NULL OR c.cluster_id = k.doc_id)
SELECT source, count(*) AS n_docs,
       sum(len(regexp_extract_all(text, '{pat}')))::BIGINT AS n_bpe_tokens
FROM final GROUP BY source ORDER BY source
"""


def q_top_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide top-20 bigrams with occurrence + doc frequency —
    stop-phrase mining for max_df / boilerplate cutoffs."""
    from jsonschema_spark.operators.textstats import top_ngrams

    return top_ngrams(_docs(spark, sf_dir), "doc_id", "text", n=2, k=20)


def _top_ngrams_sql(n: int = 2, k: int = 20) -> str:
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
g AS (SELECT doc_id, array_to_string(toks[i:i+{n - 1}], ' ') AS g
      FROM t, LATERAL (SELECT unnest(range(1, len(toks)-{n}+2)) AS i) ix
      WHERE len(toks) >= {n}),
agg AS (SELECT g AS gram, count(*)::BIGINT AS n_occurrences,
               count(DISTINCT doc_id)::BIGINT AS n_docs
        FROM g GROUP BY 1),
r AS (SELECT *, row_number() OVER (ORDER BY n_occurrences DESC, gram ASC) AS rnk
      FROM agg)
SELECT gram, n_occurrences, n_docs, rnk::BIGINT AS rnk FROM r WHERE rnk <= {k}
"""


def q_validate_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Verdict counts at every (source, lang) grouping granularity in one
    pass (cube + grouping id) — roll-up reporting the reference cannot
    express (SURVEY 2.6)."""
    from jsonschema_spark.operators.validate import verdict_counts_cube

    return verdict_counts_cube(_docs(spark, sf_dir), DOCS_SCHEMA, ["source", "lang"])


_VALIDATE_CUBE_SQL = f"""
SELECT source, lang, grouping(source, lang)::BIGINT AS gid,
       count(*) AS n_rows,
       sum(CASE WHEN {_DOCS_VALID_SQL} THEN 1 ELSE 0 END)::BIGINT AS n_valid,
       sum(CASE WHEN {_DOCS_VALID_SQL} THEN 0 ELSE 1 END)::BIGINT AS n_invalid
FROM documents GROUP BY CUBE (source, lang)
"""


def q_nfc_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode NFC canonicalization over documents with planted
    DECOMPOSED text (every third doc gains ' cafe' + combining acute +
    an Angstrom sign): composed output, changed flag, char deltas."""
    from jsonschema_spark.operators.textstats import nfc_normalize

    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(
            (F.col("doc_id") % 3 == 0) & F.col("text").isNotNull(),
            F.concat(F.col("text"), F.lit(" cafe\u0301 \u212bngstrom")),
        ).otherwise(F.col("text")).alias("text2"),
    )
    return nfc_normalize(d, "doc_id", "text2")


_NFC_SQL = """
WITH d AS (SELECT doc_id,
                  CASE WHEN doc_id % 3 = 0 AND text IS NOT NULL
                       THEN text || ' cafe' || chr(769) || ' ' || chr(8491) || 'ngstrom'
                       ELSE text END AS text2
           FROM documents)
SELECT doc_id, nfc_normalize(text2) AS text_nfc,
       CASE WHEN text2 IS NULL THEN false
            ELSE nfc_normalize(text2) <> text2 END AS changed,
       coalesce(length(text2), 0)::BIGINT AS n_chars,
       coalesce(length(nfc_normalize(text2)), 0)::BIGINT AS n_chars_nfc
FROM d
"""


def q_dup_span_remove(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The substring-dedup REMOVAL action (Lee et al. 2022): tokens
    covered by any 8-token window repeated >=2 times corpus-wide are cut,
    survivors rejoin in order (canonical token stream)."""
    from jsonschema_spark.operators.dedup import dup_span_remove

    return dup_span_remove(
        _docs(spark, sf_dir), "doc_id", "text", span_tokens=8, min_count=2)


def _dup_span_remove_sql(n: int = 8) -> str:
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
w AS (SELECT doc_id, i, array_to_string(toks[i:i+{n - 1}], ' ') AS g
      FROM t, LATERAL (SELECT unnest(range(1, len(toks)-{n}+2)) AS i) ix
      WHERE len(toks) >= {n}),
hot AS (SELECT g FROM w GROUP BY g HAVING count(*) >= 2),
cov AS (SELECT DISTINCT w.doc_id, w.i + j.j AS cpos
        FROM w JOIN hot USING (g), (SELECT unnest(range(0, {n})) AS j) j),
tok AS (SELECT doc_id, i AS tpos, toks[i] AS tok
        FROM t, LATERAL (SELECT unnest(range(1, len(toks)+1)) AS i) ix),
kept AS (SELECT tok.* FROM tok WHERE NOT EXISTS
         (SELECT 1 FROM cov c WHERE c.doc_id = tok.doc_id AND c.cpos = tok.tpos)),
re AS (SELECT doc_id, string_agg(tok, ' ' ORDER BY tpos) AS text_clean,
              count(*) AS n_kept FROM kept GROUP BY 1)
SELECT t.doc_id, coalesce(re.text_clean, '') AS text_clean,
       coalesce(len(t.toks), 0)::BIGINT AS n_tokens,
       (coalesce(len(t.toks), 0) - coalesce(re.n_kept, 0))::BIGINT AS n_removed
FROM t LEFT JOIN re ON t.doc_id = re.doc_id
ORDER BY 1
"""


def q_boilerplate_strip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Site-scoped boilerplate removal: a planted per-source footer (on
    75% of each source's docs) is stripped everywhere in that source,
    while the same-shaped line is kept where its in-source df is 1."""
    from jsonschema_spark.operators.textstats import boilerplate_strip

    d = _docs(spark, sf_dir).where(F.col("text").isNotNull()).select(
        "doc_id", "source",
        F.when(F.col("doc_id") % 4 != 3,
               F.concat(F.col("text"), F.lit("\nfooter of "), F.col("source")))
         .otherwise(F.col("text")).alias("text2"))
    return boilerplate_strip(d, "doc_id", "text2", "source")


def q_domain_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain document cap (heavy-tail host guard): keep each
    source's 15 smallest id-stable portable-hash docs, exact window
    mode; n_group carries the pre-cap size for auditability."""
    from jsonschema_spark.operators.curate import domain_cap_sample

    kept = domain_cap_sample(
        _docs(spark, sf_dir).select("doc_id", "source"),
        "doc_id", "source", cap=15)
    return kept.select("doc_id", "source", "n_group")


def q_sessionize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization with Spark's NATIVE session windows
    (groupBy(user, session_window(ts, gap)): one exchange of map-side
    partially-aggregated rows, then Sort + MergingSessions — vs two full
    window passes for the classic lag() formulation). 12 h gap over the
    events table → 3292 sessions at sf0.01."""
    from jsonschema_spark.operators.stats import sessionize

    ev = spark.read.parquet(_t(sf_dir, "events"))
    return sessionize(ev, "user_id", "ts", gap="12 hours", value_col="value")


_SESSIONIZE_SQL = """
WITH s AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 43200000000
              THEN 1 ELSE 0 END AS new_s
  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
),
g AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                 ROWS UNBOUNDED PRECEDING) AS sid FROM s)
SELECT user_id, strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS session_start,
       strftime(max(ts) + INTERVAL 12 HOUR, '%Y-%m-%d %H:%M:%S.%f') AS session_end,
       count(*) AS n_events, sum(floor(value*1000)::BIGINT) AS value_milli
FROM g GROUP BY user_id, sid
"""


def q_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): embeddings clustered by the
    deterministic coarse quantizer, cosine near-dup pairs searched WITHIN
    each cluster only (the paper's n²→n²/k pruning), connected components,
    keep the min-id canonical row. Output = surviving vec_ids."""
    from jsonschema_spark.operators.similarity import semantic_dedup

    e = spark.read.parquet(_t(sf_dir, "embeddings"))
    kept = semantic_dedup(e, "vec_id", "embedding", min_cos_micro=450000, n_centroids=8)
    return kept.select("vec_id").orderBy("vec_id")


def _semantic_dedup_sql() -> str:
    return f"""
WITH RECURSIVE
q AS (SELECT vec_id, [floor(x::DOUBLE*100)::BIGINT for x in embedding] AS qe FROM embeddings),
pd AS (SELECT vec_id % 8 AS ci, i,
              floor((sum(qe[i])::BIGINT)::DOUBLE / count(*))::BIGINT AS cv
       FROM q, (SELECT unnest(range(1, 65)) AS i) ix GROUP BY 1, 2),
cent AS (SELECT ci, list(cv ORDER BY i) AS cv FROM pd GROUP BY ci),
d AS (SELECT q.vec_id, q.qe, c.ci,
             list_sum([(q.qe[i]-c.cv[i])*(q.qe[i]-c.cv[i]) for i in range(1, 65)]) AS dist
      FROM q, cent c),
asg AS (SELECT vec_id, qe, ci,
               row_number() OVER (PARTITION BY vec_id ORDER BY dist ASC, ci ASC) AS rn
        FROM d),
corp AS (SELECT vec_id, qe, ci FROM asg WHERE rn = 1),
pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b
          FROM corp a JOIN corp b ON a.ci = b.ci AND a.vec_id < b.vec_id
          WHERE {{cos}} >= 450000),
edges AS (SELECT id_a AS x, id_b AS y FROM pairs
          UNION SELECT id_b, id_a FROM pairs),
reach(x, y) AS (SELECT x, y FROM edges
                UNION SELECT x, x FROM edges
                UNION SELECT r.x, e.y FROM reach r JOIN edges e ON r.y = e.x),
comp AS (SELECT x AS vec_id, min(y) AS cluster_id FROM reach GROUP BY 1)
SELECT e.vec_id FROM embeddings e LEFT JOIN comp c ON e.vec_id = c.vec_id
WHERE c.cluster_id IS NULL OR c.cluster_id = e.vec_id
ORDER BY 1
""".replace("{cos}", _COS_MICRO)


# Deterministic rich-HTML wrapper for the html_extract query: doc text
# embedded in realistic crawl chrome (head/script/style/comments/nav/
# entities/block structure). The SAME pieces build the page in Spark and
# in the oracle, so extraction parity is tested end-to-end. No single
# quotes in any piece (SQL-literal safe).
_HTML_P = (
    '<!DOCTYPE html><html><head><title>Doc ',
    '</title><script>if (a<b) { track("',
    '"); }</script><style>.m { color: red; }</style></head><body>'
    '<!-- crawl ',
    ' --><nav>Home | Sitemap | R&amp;D</nav><div class="main"><h1>Doc ',
    '</h1><p>',
    '</p><ul><li>tag&nbsp;one</li><li>n&#39;est</li></ul></div>'
    '<footer>(c) example.org</footer></body></html>',
)


def q_html_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic HTML -> text extraction (the trafilatura/resiliparse step):
    documents wrapped in deterministic crawl chrome (script/style/head/
    comments/nav/entities), extracted by the pure-JVM regex chain
    (operators/htmltext.py STEPS — shared verbatim with the oracle), then
    chars/lines/portable-hash per doc. One codegen projection end-to-end:
    zero Python, zero shuffles."""
    from jsonschema_spark.operators.dedup import hash56
    from jsonschema_spark.operators.htmltext import html_text_df

    d = _docs(spark, sf_dir)
    ids = F.col("doc_id").cast("string")
    p = _HTML_P
    html = F.encode(
        F.concat(F.lit(p[0]), ids, F.lit(p[1]), ids, F.lit(p[2]), ids,
                 F.lit(p[3]), ids, F.lit(p[4]), F.col("text"), F.lit(p[5])),
        "UTF-8",
    )
    out = html_text_df(d.select("doc_id", html.alias("html")))
    return out.select(
        "doc_id", "n_chars", "n_lines",
        hash56(F.col("text_extracted")).alias("text_h56"),
    )


def _html_extract_sql() -> str:
    from jsonschema_spark.operators.htmltext import html_text_sql

    p = _HTML_P
    build = (
        f"'{p[0]}' || i || '{p[1]}' || i || '{p[2]}' || i || "
        f"'{p[3]}' || i || '{p[4]}' || text || '{p[5]}'"
    )
    return f"""
WITH h AS (SELECT doc_id, {build} AS html
           FROM (SELECT doc_id, doc_id::VARCHAR AS i, text FROM documents)),
e AS (SELECT doc_id, {html_text_sql('html')} AS t FROM h)
SELECT doc_id,
       coalesce(length(t), 0)::BIGINT AS n_chars,
       (CASE WHEN t IS NULL OR length(t) = 0 THEN 0
             ELSE length(regexp_replace(t, '[^\\n]', '', 'g')) + 1
        END)::BIGINT AS n_lines,
       {_h56('t')} AS text_h56
FROM e"""


def q_host_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Host link graph + fixed-iteration integer PageRank (the crawl
    centrality prior curation samplers weight by). Pages synthesized
    deterministically: each doc links to 3 hash-derived hosts (one
    uppercase HREF, one &amp;-escaped query) — link extraction, edge
    building and 3 rank hops all exercised; all arithmetic int64 so the
    unrolled DuckDB mirror matches bit-for-bit."""
    from jsonschema_spark.operators.linkgraph import host_rank_df, link_edges_df

    i = F.col("doc_id")
    src = F.concat(F.lit("h"), (i % 50).cast("string"), F.lit(".example.org"))
    html = F.concat(
        F.lit('<html><body><a href="https://h'),
        ((i * 7 + 1) % 50).cast("string"),
        F.lit('.example.org/a">x</a><A HREF="https://h'),
        ((i * 13 + 2) % 50).cast("string"),
        F.lit('.example.org/b?x=1&amp;y=2">y</A><a href="https://h'),
        ((i * 29 + 3) % 50).cast("string"),
        F.lit('.example.org/c">z</a></body></html>'),
    )
    pages = _docs(spark, sf_dir).select(
        src.alias("src_host"), F.encode(html, "UTF-8").alias("html"))
    return host_rank_df(link_edges_df(pages), n_iter=3).orderBy("host")


def _host_rank_sql() -> str:
    from jsonschema_spark.operators.linkgraph import (
        HOST_RE, HREF_RE, host_rank_sql)

    html = (
        "'<html><body><a href=\"https://h' || ((doc_id*7+1)%50)::VARCHAR"
        " || '.example.org/a\">x</a><A HREF=\"https://h' ||"
        " ((doc_id*13+2)%50)::VARCHAR"
        " || '.example.org/b?x=1&amp;y=2\">y</A><a href=\"https://h' ||"
        " ((doc_id*29+3)%50)::VARCHAR || '.example.org/c\">z</a></body></html>'"
    )
    edges = f"""
SELECT DISTINCT src_host, dst_host FROM (
  SELECT src_host,
         lower(regexp_extract(replace(u, '&amp;', '&'), '{HOST_RE}', 1)) AS dst_host
  FROM (SELECT 'h' || (doc_id % 50)::VARCHAR || '.example.org' AS src_host,
               unnest(regexp_extract_all({html}, '{HREF_RE}', 1)) AS u
        FROM documents))
WHERE dst_host <> '' AND dst_host <> src_host"""
    return host_rank_sql(edges, n_iter=3) + " ORDER BY host"


def q_host_hits(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-iteration HITS hubs/authorities over the same synthesized
    link graph as host_rank — the complementary centrality (link farms
    are hubs with no authority). Normalize-by-max keeps every score in
    ppm; the unrolled DuckDB mirror replays all 3 rounds."""
    from jsonschema_spark.operators.linkgraph import host_hits_df, link_edges_df

    i = F.col("doc_id")
    src = F.concat(F.lit("h"), (i % 50).cast("string"), F.lit(".example.org"))
    html = F.concat(
        F.lit('<html><body><a href="https://h'),
        ((i * 7 + 1) % 50).cast("string"),
        F.lit('.example.org/a">x</a><A HREF="https://h'),
        ((i * 13 + 2) % 50).cast("string"),
        F.lit('.example.org/b?x=1&amp;y=2">y</A><a href="https://h'),
        ((i * 29 + 3) % 50).cast("string"),
        F.lit('.example.org/c">z</a></body></html>'),
    )
    pages = _docs(spark, sf_dir).select(
        src.alias("src_host"), F.encode(html, "UTF-8").alias("html"))
    return host_hits_df(link_edges_df(pages), n_iter=3).orderBy("host")


def _host_hits_sql() -> str:
    from jsonschema_spark.operators.linkgraph import (
        HOST_RE, HREF_RE, host_hits_sql)

    html = (
        "'<html><body><a href=\"https://h' || ((doc_id*7+1)%50)::VARCHAR"
        " || '.example.org/a\">x</a><A HREF=\"https://h' ||"
        " ((doc_id*13+2)%50)::VARCHAR"
        " || '.example.org/b?x=1&amp;y=2\">y</A><a href=\"https://h' ||"
        " ((doc_id*29+3)%50)::VARCHAR || '.example.org/c\">z</a></body></html>'"
    )
    edges = f"""
SELECT DISTINCT src_host, dst_host FROM (
  SELECT src_host,
         lower(regexp_extract(replace(u, '&amp;', '&'), '{HOST_RE}', 1)) AS dst_host
  FROM (SELECT 'h' || (doc_id % 50)::VARCHAR || '.example.org' AS src_host,
               unnest(regexp_extract_all({html}, '{HREF_RE}', 1)) AS u
        FROM documents))
WHERE dst_host <> '' AND dst_host <> src_host"""
    return host_hits_sql(edges, n_iter=3) + " ORDER BY host"


def q_export_shards(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-budget shard packing (WebDataset/Megatron export layout):
    greedy order-preserving packing per source — shard boundary at every
    1000 tokens of cumulative exclusive mass, docs never split. ONE
    window per source (groups pack in parallel); cumsum-and-divide stays
    int64 ``div`` so the oracle matches exactly. Output = the per-shard
    manifest the export writer consumes."""
    from jsonschema_spark.operators.curate import shard_stats
    from jsonschema_spark.operators.dedup import tokens

    d = _docs(spark, sf_dir).select(
        "doc_id", "source",
        F.coalesce(F.size(tokens(F.col("text"))), F.lit(0)).cast("long").alias("n_tokens"),
    )
    return shard_stats(d, "doc_id", "n_tokens", "source",
                       target_tokens=1000).orderBy("shard")


_EXPORT_SHARDS_SQL = f"""
WITH t AS (SELECT doc_id, source,
                  coalesce(len({_TOKS}), 0)::BIGINT AS n_tokens
           FROM documents),
a AS (SELECT doc_id, source, n_tokens,
             coalesce(sum(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             // 1000 AS shard_idx
      FROM t)
SELECT source || '/' || shard_idx::VARCHAR AS shard,
       count(*)::BIGINT AS n_docs, sum(n_tokens)::BIGINT AS tok_sum,
       min(doc_id) AS id_lo, max(doc_id) AS id_hi
FROM a GROUP BY 1"""


_ANCHOR_WORDS = ("news", "shop", "login", "about", "contact", "blog",
                 "docs", "api")


def q_anchor_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anchor-text mining: what linking pages call each target host (the
    classic web relevance signal). Pages carry a worded anchor, an
    image-only link (dropped — no visible text) and an entity-laden
    anchor; output = (dst_host, anchor, n) counts."""
    from jsonschema_spark.operators.linkgraph import anchor_text_df

    i = F.col("doc_id")
    w = F.array(*[F.lit(x) for x in _ANCHOR_WORDS])
    pick = lambda e: F.element_at(w, (e % 8 + 1).cast("int"))  # noqa: E731
    html = F.concat(
        F.lit('<html><body><a href="https://h'),
        ((i * 7 + 1) % 50).cast("string"),
        F.lit('.example.org/a">'), pick(i), F.lit(" "), pick(i * 3 + 1),
        F.lit('</a><a href="https://h'),
        ((i * 13 + 2) % 50).cast("string"),
        F.lit('.example.org/b"><img src="i.png"></a><a href="https://h'),
        ((i * 29 + 3) % 50).cast("string"),
        F.lit('.example.org/c">Read&nbsp;more &amp; info</a></body></html>'),
    )
    pages = _docs(spark, sf_dir).select(
        F.concat(F.lit("h"), (i % 50).cast("string"),
                 F.lit(".example.org")).alias("src_host"),
        F.encode(html, "UTF-8").alias("html"),
    )
    return (
        anchor_text_df(pages)
        .groupBy("dst_host", "anchor")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy("dst_host", "anchor")
    )


def _anchor_terms_sql() -> str:
    from jsonschema_spark.operators.linkgraph import anchor_text_sql

    wl = "[" + ", ".join(f"'{x}'" for x in _ANCHOR_WORDS) + "]"
    html = (
        "'<html><body><a href=\"https://h' || ((doc_id*7+1)%50)::VARCHAR ||"
        f" '.example.org/a\">' || {wl}[(doc_id%8)::INT + 1] || ' ' ||"
        f" {wl}[((doc_id*3+1)%8)::INT + 1] ||"
        " '</a><a href=\"https://h' || ((doc_id*13+2)%50)::VARCHAR ||"
        " '.example.org/b\"><img src=\"i.png\"></a><a href=\"https://h' ||"
        " ((doc_id*29+3)%50)::VARCHAR ||"
        " '.example.org/c\">Read&nbsp;more &amp; info</a></body></html>'"
    )
    pages = (f"SELECT 'h' || (doc_id % 50)::VARCHAR || '.example.org' AS src_host, "
             f"{html} AS html FROM documents")
    return (f"SELECT dst_host, anchor, count(*)::BIGINT AS n FROM "
            f"({anchor_text_sql(pages)}) GROUP BY 1, 2")


_MC_P = (
    '<html><head><title>t</title></head><body>'
    '<nav><a href="/">Home</a> | <a href="/about">About us</a> | '
    '<a href="/contact">Contact page</a></nav><p>',
    '</p><p>Short stub with <a href="/x">a link</a> here.</p>'
    '<div>tiny</div><footer><a href="/p">Privacy</a> '
    '<a href="/t">Terms of use</a> <a href="/i">Imprint</a></footer>'
    '</body></html>',
)


def q_main_content(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Main-content extraction (boilerpipe/jusText text-density
    heuristic): link-dense nav/footer and sub-minimum blocks dropped,
    prose kept — per-block link density computed on the SAME normalized
    chain both engines share. Documents wrapped in deterministic
    link-heavy chrome; the doc body is the only block that survives."""
    from jsonschema_spark.operators.dedup import hash56
    from jsonschema_spark.operators.htmltext import main_content_df

    d = _docs(spark, sf_dir)
    html = F.encode(
        F.concat(F.lit(_MC_P[0]), F.col("text"), F.lit(_MC_P[1])), "UTF-8")
    out = main_content_df(d.select("doc_id", html.alias("html")))
    return out.select(
        "doc_id", "n_blocks_total", "n_blocks_kept", "n_chars",
        hash56(F.coalesce(F.col("main_text"), F.lit(""))).alias("main_h56"),
    )


def _main_content_sql() -> str:
    from jsonschema_spark.operators.htmltext import main_content_sql

    p0 = _MC_P[0].replace("'", "''")
    p1 = _MC_P[1].replace("'", "''")
    src = (f"SELECT doc_id, '{p0}' || text || '{p1}' AS html FROM documents")
    return f"""
WITH mc AS ({main_content_sql(src)})
SELECT doc_id, n_blocks_total, n_blocks_kept, n_chars,
       {_h56("coalesce(main_text, '')")} AS main_h56
FROM mc"""


def q_frontier_interleave(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Politeness interleaving: round k serves every host's k-th-best URL
    before any host's (k+1)-th — consecutive fetches hit different hosts;
    deterministic within-round spread via the portable host hash."""
    from jsonschema_spark.operators.urltools import frontier_interleave

    i = F.col("doc_id")
    urls = _docs(spark, sf_dir).select(
        F.concat(F.lit("https://h"), (i % 10).cast("string"),
                 F.lit(".example.org/p"), i.cast("string")).alias("url"),
        ((i * 7) % 100).alias("prio"),
    )
    return frontier_interleave(urls, priority_col="prio")


def _frontier_sql() -> str:
    from jsonschema_spark.operators.urltools import _URL_RE

    return f"""
WITH u AS (SELECT 'https://h' || (doc_id % 10)::VARCHAR || '.example.org/p'
                  || doc_id::VARCHAR AS url,
                  ((doc_id * 7) % 100)::BIGINT AS prio
           FROM documents),
r AS (SELECT url, prio,
             lower(regexp_extract(url, '{_URL_RE}', 2)) AS host,
             row_number() OVER (
                 PARTITION BY lower(regexp_extract(url, '{_URL_RE}', 2))
                 ORDER BY prio DESC, url)::BIGINT AS round
      FROM u)
SELECT url, prio, round,
       row_number() OVER (
           ORDER BY round,
                    {_h56("lower(regexp_extract(url, '" + _URL_RE + "', 2))")},
                    url)::BIGINT AS fetch_order
FROM r"""


_TPL = (
    ('<html><head><title>x</title></head><body><div><p>',
     '</p></div></body></html>'),
    ('<html><body><table><tr><td>', '</td></tr></table></body></html>'),
    ('<html><body><article><h1>t</h1><p>',
     '</p><footer>f</footer></article></body></html>'),
)
_TAG_RE = r"(?i)</?([a-zA-Z][a-zA-Z0-9]*)"


def q_template_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page-template clustering: SimHash over the TAG stream (layout,
    not content) groups pages by template regardless of body text —
    the structural near-dup signal behind template spam and scraped-site
    detection. Three synthesized templates with per-doc content → exactly
    three clusters; composition of extract-tags + the shipped simhash."""
    from jsonschema_spark.operators.dedup import simhash_df

    i = F.col("doc_id")
    html = F.concat(F.lit(_TPL[0][0]), F.col("text"), F.lit(_TPL[0][1]))
    for k, (pre, post) in list(enumerate(_TPL))[1:]:
        html = F.when(i % 3 == k,
                      F.concat(F.lit(pre), F.col("text"), F.lit(post))
                      ).otherwise(html)
    tags = F.array_join(
        F.transform(
            F.regexp_extract_all(html, F.lit(_TAG_RE), 1),
            lambda t: F.lower(t),
        ),
        " ",
    )
    d = _docs(spark, sf_dir).select("doc_id", tags.alias("tags"))
    sims = simhash_df(d, "doc_id", "tags")
    return (
        sims.groupBy(F.col("_sim").alias("template_sim"))
        .agg(F.count(F.lit(1)).cast("long").alias("n_pages"),
             F.min("_id").alias("sample_doc"))
        .orderBy("template_sim")
    )


def _template_clusters_sql() -> str:
    html = "CASE " + " ".join(
        f"WHEN doc_id % 3 = {k} THEN '{pre}' || text || '{post}'"
        for k, (pre, post) in enumerate(_TPL)
    ) + " END"
    return f"""
WITH ph AS (SELECT doc_id, {html} AS html FROM documents),
t AS (SELECT doc_id,
             list_transform(regexp_extract_all(html, '{_TAG_RE}', 1),
                            x -> lower(x)) AS toks
      FROM ph),
h AS (SELECT doc_id, list_transform(toks, x -> {_h56('x')}) AS hs FROM t),
simt AS (SELECT doc_id, coalesce({_SIMHASH_EXPR}, 0) AS sim FROM h
         WHERE len(hs) > 0)
SELECT sim AS template_sim, count(*)::BIGINT AS n_pages,
       min(doc_id) AS sample_doc
FROM simt GROUP BY 1 ORDER BY 1"""


def q_crawler_traps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawler-trap detection: URL-template signatures (digits→N, long
    hex→H, query values→V) counted per host — calendar/session/faceted
    spaces explode one signature into unbounded URLs. Fixture: every doc
    adds a calendar-trap instance plus a one-off page; only the trap
    signatures clear min_urls."""
    from jsonschema_spark.operators.urltools import crawler_traps_df

    i = F.col("doc_id")
    trap = F.concat(
        F.lit("https://h"), (i % 10).cast("string"),
        F.lit(".example.org/cal/20"), (i % 24).cast("string"),
        F.lit("/"), (i % 12).cast("string"),
        F.lit("?page="), i.cast("string"))
    oneoff = F.concat(
        F.lit("https://h"), (i % 10).cast("string"),
        F.lit(".example.org/article/slug"), i.cast("string"), F.lit("x"))
    d = _docs(spark, sf_dir)
    urls = d.select(trap.alias("url")).union(d.select(oneoff.alias("url")))
    return crawler_traps_df(urls, min_urls=5)


def _crawler_traps_sql(min_urls: int = 5) -> str:
    from jsonschema_spark.operators.urltools import _URL_RE

    g = lambda n: f"regexp_extract(url, '{_URL_RE}', {n})"  # noqa: E731
    sig = (f"regexp_replace(regexp_replace({g(4)}, '[0-9a-fA-F]{{8,}}', 'H', 'g'),"
           f" '[0-9]+', 'N', 'g')"
           f" || regexp_replace({g(5)}, '=[^&#]*', '=V', 'g')")
    return f"""
WITH u AS (
  SELECT 'https://h' || (doc_id % 10)::VARCHAR || '.example.org/cal/20'
         || (doc_id % 24)::VARCHAR || '/' || (doc_id % 12)::VARCHAR
         || '?page=' || doc_id::VARCHAR AS url FROM documents
  UNION ALL
  SELECT 'https://h' || (doc_id % 10)::VARCHAR || '.example.org/article/slug'
         || doc_id::VARCHAR || 'x' FROM documents),
s AS (SELECT lower({g(2)}) AS host, {sig} AS sig, url FROM u),
p AS (SELECT host, sig, url FROM s GROUP BY 1, 2, 3)
SELECT host, sig, count(*)::BIGINT AS n_urls, min(url) AS sample_url
FROM p GROUP BY 1, 2 HAVING count(*) >= {min_urls}"""


def q_link_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-page outlink stats (the link-farm feature block): total /
    internal / external links and distinct external hosts, computed by
    higher-order aggregates over the extracted link array — no explode,
    zero shuffles."""
    from jsonschema_spark.operators.linkgraph import link_stats_df

    i = F.col("doc_id")
    src = F.concat(F.lit("h"), i.cast("string"), F.lit(".example.org"))
    html = F.concat(
        F.lit('<a href="https://h'), i.cast("string"),
        F.lit('.example.org/self">i</a><a href="https://h'),
        ((i * 7 + 1) % 50).cast("string"),
        F.lit('.example.org/a">x</a><a href="https://h'),
        ((i * 7 + 1) % 50).cast("string"),
        F.lit('.example.org/b?x=1&amp;y=2">y</a><a href="https://h'),
        ((i * 29 + 3) % 50).cast("string"),
        F.lit('.example.org/c">z</a>'),
    )
    pages = _docs(spark, sf_dir).select(
        src.alias("src_host"), F.encode(html, "UTF-8").alias("html"))
    out = link_stats_df(pages)
    return out.select(
        "src_host", "n_links", "n_internal", "n_external", "n_ext_hosts")


def _link_stats_sql() -> str:
    from jsonschema_spark.operators.linkgraph import HOST_RE, HREF_RE

    html = (
        "'<a href=\"https://h' || doc_id::VARCHAR ||"
        " '.example.org/self\">i</a><a href=\"https://h' ||"
        " ((doc_id*7+1)%50)::VARCHAR ||"
        " '.example.org/a\">x</a><a href=\"https://h' ||"
        " ((doc_id*7+1)%50)::VARCHAR ||"
        " '.example.org/b?x=1&amp;y=2\">y</a><a href=\"https://h' ||"
        " ((doc_id*29+3)%50)::VARCHAR || '.example.org/c\">z</a>'"
    )
    hosts = (f"list_transform(regexp_extract_all({html}, '{HREF_RE}', 1), "
             f"u -> lower(regexp_extract(replace(u, '&amp;', '&'), "
             f"'{HOST_RE}', 1)))")
    return f"""
WITH p AS (SELECT 'h' || doc_id::VARCHAR || '.example.org' AS src_host,
                  {hosts} AS hosts
           FROM documents),
e AS (SELECT src_host, hosts,
             list_filter(hosts, h -> h <> lower(src_host) AND h <> '') AS ext
      FROM p)
SELECT src_host, len(hosts)::BIGINT AS n_links,
       len(list_filter(hosts, h -> h = lower(src_host)))::BIGINT AS n_internal,
       len(ext)::BIGINT AS n_external,
       len(list_distinct(ext))::BIGINT AS n_ext_hosts
FROM e"""


def q_charset_guess(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Charset detection (the decode step before any text operator can
    touch html): BOM / HTML5 meta charset / legacy http-equiv / XML
    declaration / utf-8 default, with alias normalization. Fixture
    cycles all five declaration shapes by doc_id; string path (the
    byte/BOM path is pytest-pinned)."""
    from jsonschema_spark.operators.htmltext import charset_guess

    i = F.col("doc_id")
    variants = F.array(
        F.lit('<html><head><meta charset="Windows-1252"></head>'),
        F.lit("<html><meta http-equiv='Content-Type' "
              "content='text/html; charset=ISO8859-1'>"),
        F.lit('<?xml version="1.0" encoding="UTF8"?><root>'),
        F.lit("<html><body>nothing declared"),
        F.concat(F.lit("﻿"), F.lit("<html>bom page")),
    )
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(F.element_at(variants, (i % 5 + 1).cast("int")),
                 F.col("text")).alias("html"),
    )
    return charset_guess(d, binary=False)


def _charset_sql() -> str:
    from jsonschema_spark.operators.htmltext import charset_guess_sql

    v = (
        "['<html><head><meta charset=\"Windows-1252\"></head>', "
        "'<html><meta http-equiv=''Content-Type'' "
        "content=''text/html; charset=ISO8859-1''>', "
        "'<?xml version=\"1.0\" encoding=\"UTF8\"?><root>', "
        "'<html><body>nothing declared', "
        "chr(65279) || '<html>bom page']"
    )
    src = (f"SELECT doc_id, {v}[(doc_id % 5)::INT + 1] || text AS html "
           f"FROM documents")
    return charset_guess_sql(src)


def q_ccnet_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet head/middle/tail split: in-engine bigram-LM fluency score →
    per-language ntile(3) over (score DESC, id) — the keep-the-
    perplexity-head recipe as one composition of shipped operators."""
    from jsonschema_spark.operators.curate import quality_buckets
    from jsonschema_spark.operators.lm import ngram_lm_score

    d = _docs(spark, sf_dir)
    ref = d.where(F.col("source").isin("src0", "src1", "src2"))
    scored = ngram_lm_score(d, "doc_id", "text", ref_df=ref) \
        .join(d.select("doc_id", "lang"), "doc_id")
    return quality_buckets(scored, "doc_id", "lm_score_ppm", "lang") \
        .select("doc_id", "lang", "lm_score_ppm", "bucket", "bucket_label")


def _ccnet_buckets_sql() -> str:
    return f"""
WITH L AS ({_LM_SCORE_SQL}),
b AS (SELECT d.doc_id, d.lang, L.lm_score_ppm,
             ntile(3) OVER (PARTITION BY d.lang
                            ORDER BY L.lm_score_ppm DESC, d.doc_id)::BIGINT
                 AS bucket
      FROM documents d JOIN L USING (doc_id))
SELECT doc_id, lang, lm_score_ppm, bucket,
       ['head', 'middle', 'tail'][bucket::INT] AS bucket_label
FROM b"""


def q_sitemap_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap parsing (the crawl-discovery side of robots compliance):
    per-host XML synthesized with url entries (entity-escaped query,
    lastmod, priority) plus a sitemapindex child every 5th host; whole
    elements found by ONE regexp_extract_all, fields by anchored lazy
    regexes — RE2∩Java-identical, mirrored verbatim in the oracle."""
    from jsonschema_spark.operators.sitemap import sitemap_entries

    i = F.col("doc_id")
    xml = F.concat(
        F.lit("<urlset><url><loc> https://h"), (i % 50).cast("string"),
        F.lit(".example.org/p"), i.cast("string"),
        F.lit("?a=1&amp;b=2 </loc><lastmod>2024-01-0"),
        (i % 9 + 1).cast("string"),
        F.lit("</lastmod><priority>0."), (i % 10).cast("string"),
        F.lit("</priority></url><URL><LOC>https://h"),
        (i % 50).cast("string"), F.lit(".example.org/q"), i.cast("string"),
        F.lit("</LOC></URL>"),
        F.when((i % 5) == 0, F.concat(
            F.lit("<sitemap><loc>https://h"), (i % 50).cast("string"),
            F.lit(".example.org/sm"), i.cast("string"),
            F.lit(".xml</loc></sitemap>"))).otherwise(F.lit("")),
        F.lit("</urlset>"),
    )
    d = _docs(spark, sf_dir).select(
        F.concat(F.lit("h"), (i % 50).cast("string"),
                 F.lit(".example.org")).alias("host"),
        xml.alias("sitemap_xml"),
    )
    return sitemap_entries(d)


def _sitemap_sql() -> str:
    from jsonschema_spark.operators.sitemap import sitemap_entries_sql

    xml = (
        "'<urlset><url><loc> https://h' || (doc_id % 50)::VARCHAR ||"
        " '.example.org/p' || doc_id::VARCHAR ||"
        " '?a=1&amp;b=2 </loc><lastmod>2024-01-0' || (doc_id % 9 + 1)::VARCHAR ||"
        " '</lastmod><priority>0.' || (doc_id % 10)::VARCHAR ||"
        " '</priority></url><URL><LOC>https://h' || (doc_id % 50)::VARCHAR ||"
        " '.example.org/q' || doc_id::VARCHAR || '</LOC></URL>' ||"
        " CASE WHEN doc_id % 5 = 0 THEN"
        " '<sitemap><loc>https://h' || (doc_id % 50)::VARCHAR ||"
        " '.example.org/sm' || doc_id::VARCHAR || '.xml</loc></sitemap>'"
        " ELSE '' END || '</urlset>'"
    )
    src = (f"SELECT 'h' || (doc_id % 50)::VARCHAR || '.example.org' AS host, "
           f"{xml} AS sitemap_xml FROM documents")
    return sitemap_entries_sql(src)


def q_crawl_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end crawl-side composition: pages → link extraction → host
    graph → 2-round integer PageRank prior → uncrawled-host frontier
    (anti-join) → robots.txt compliance (parsed + longest-match) → top-100
    fetch queue by (rank, url). Every stage is the shipped operator; the
    oracle replays link extraction and the rank rounds and mirrors the
    frontier/robots/priority logic."""
    from jsonschema_spark.operators.linkgraph import (
        HOST_RE, extract_links, host_rank_df, link_edges_df)
    from jsonschema_spark.operators.robots import robots_filter, robots_rules_df

    i = F.col("doc_id")
    src = F.concat(F.lit("h"), (i % 50).cast("string"), F.lit(".example.org"))
    html = F.concat(
        F.lit('<html><body><a href="https://h'),
        ((i * 7 + 1) % 100).cast("string"),
        F.lit('.example.org/a">x</a><a href="https://h'),
        ((i * 13 + 2) % 100).cast("string"),
        F.lit('.example.org/b?x=1&amp;y=2">y</a><a href="https://h'),
        ((i * 29 + 3) % 100).cast("string"),
        F.lit('.example.org/c">z</a></body></html>'),
    )
    pages = _docs(spark, sf_dir).select(
        src.alias("src_host"), F.encode(html, "UTF-8").alias("html"))
    ranks = host_rank_df(link_edges_df(pages), n_iter=2)
    links = pages.select(F.explode(extract_links(F.col("html"))).alias("url")) \
        .select("url", F.lower(F.regexp_extract("url", HOST_RE, 1)).alias("host")) \
        .distinct()
    crawled = pages.select(F.col("src_host").alias("host")).distinct()
    frontier = links.join(crawled, "host", "left_anti")
    hosts = frontier.select("host").distinct()
    hnum = F.regexp_extract("host", r"h([0-9]+)", 1).cast("int")
    robots = hosts.select(
        "host",
        F.when(hnum % 3 == 0,
               F.lit("User-agent: *\nDisallow: /a\n"))
        .otherwise(F.lit("User-agent: *\nDisallow:\n")).alias("robots_txt"),
    )
    allowed = robots_filter(
        frontier.withColumn("fid", F.col("url")), robots_rules_df(robots),
        url_col="url", id_col="fid",
    ).where(F.col("allowed")).select(F.col("fid").alias("url"))
    queue = (
        allowed.select(
            "url", F.lower(F.regexp_extract("url", HOST_RE, 1)).alias("host"))
        .join(ranks, "host")
        .orderBy(F.col("rank_ppm").desc(), F.col("url").asc())
        .limit(100)
    )
    from pyspark.sql.window import Window
    w = Window.orderBy(F.col("rank_ppm").desc(), F.col("url").asc())
    return queue.withColumn("rnk", F.row_number().over(w).cast("long"))


def _crawl_frontier_sql() -> str:
    from jsonschema_spark.operators.linkgraph import (
        HOST_RE, HREF_RE, host_rank_sql)
    from jsonschema_spark.operators.urltools import _URL_RE as _URL_RE_SQL

    html = (
        "'<html><body><a href=\"https://h' || ((doc_id*7+1)%100)::VARCHAR"
        " || '.example.org/a\">x</a><a href=\"https://h' ||"
        " ((doc_id*13+2)%100)::VARCHAR"
        " || '.example.org/b?x=1&amp;y=2\">y</a><a href=\"https://h' ||"
        " ((doc_id*29+3)%100)::VARCHAR || '.example.org/c\">z</a></body></html>'"
    )
    edges = f"""
SELECT DISTINCT src_host, dst_host FROM (
  SELECT src_host,
         lower(regexp_extract(replace(u, '&amp;', '&'), '{HOST_RE}', 1)) AS dst_host
  FROM (SELECT 'h' || (doc_id % 50)::VARCHAR || '.example.org' AS src_host,
               unnest(regexp_extract_all({html}, '{HREF_RE}', 1)) AS u
        FROM documents))
WHERE dst_host <> '' AND dst_host <> src_host"""
    ranks = host_rank_sql(edges, n_iter=2)
    return f"""
WITH lk AS (SELECT DISTINCT replace(u, '&amp;', '&') AS url
            FROM (SELECT unnest(regexp_extract_all({html}, '{HREF_RE}', 1)) AS u
                  FROM documents)),
l AS (SELECT url, lower(regexp_extract(url, '{HOST_RE}', 1)) AS host FROM lk),
fr AS (SELECT url, host,
              regexp_extract(host, 'h([0-9]+)', 1)::INT AS hn,
              regexp_extract(url, '{_URL_RE_SQL}', 4) AS path
       FROM l
       WHERE NOT EXISTS (SELECT 1 FROM documents d
                         WHERE 'h' || (d.doc_id % 50)::VARCHAR
                               || '.example.org' = l.host)),
al AS (SELECT url, host FROM fr
       WHERE NOT (hn % 3 = 0 AND starts_with(path, '/a'))),
rk AS ({ranks})
SELECT al.url, al.host, rk.rank_ppm,
       row_number() OVER (ORDER BY rk.rank_ppm DESC, al.url)::BIGINT AS rnk
FROM al JOIN rk ON al.host = rk.host
ORDER BY rk.rank_ppm DESC, al.url LIMIT 100"""


def q_warc_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WARC ingestion round-trip: documents serialized into concatenated
    WARC/1.0 files (10 records each, CRLF framing, Content-Length), then
    exploded back by the JVM record parser. The oracle computes the
    GROUND TRUTH of what was serialized (RE2 has no lookahead so it
    cannot replay the split) — parser output must equal it field-for-
    field, payload compared by portable 56-bit hash."""
    from jsonschema_spark.operators.dedup import hash56
    from jsonschema_spark.sources.warc import warc_records

    i = F.col("doc_id")
    body = F.concat(F.lit("<html><body>"), F.col("text"), F.lit("</body></html>"))
    rec = F.concat(
        F.lit("WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: https://h"),
        (i % 50).cast("string"), F.lit(".example.org/p"), i.cast("string"),
        F.lit("\r\nWARC-Date: 2024-01-0"), (i % 9 + 1).cast("string"),
        F.lit("T00:00:00Z\r\nContent-Length: "),
        F.length(body).cast("string"),
        F.lit("\r\n\r\n"), body, F.lit("\r\n\r\n"),
    )
    files = (
        _docs(spark, sf_dir)
        .select(F.expr("doc_id div 10").alias("file_id"),
                F.struct(i.alias("i"), rec.alias("r")).alias("s"))
        .groupBy("file_id")
        .agg(F.concat_ws(
            "", F.transform(F.array_sort(F.collect_list("s")),
                            lambda s: s["r"])).alias("warc"))
    )
    out = warc_records(files, "file_id", "warc")
    return out.select(
        "file_id", "rec_idx", "warc_type", "target_uri", "warc_date",
        "content_length", hash56(F.col("payload")).alias("payload_h"),
    )


_WARC_SQL = f"""
WITH b AS (SELECT doc_id, '<html><body>' || text || '</body></html>' AS body
           FROM documents)
SELECT (doc_id // 10)::BIGINT AS file_id,
       (doc_id % 10)::BIGINT AS rec_idx,
       'response' AS warc_type,
       'https://h' || (doc_id % 50)::VARCHAR || '.example.org/p'
           || doc_id::VARCHAR AS target_uri,
       '2024-01-0' || (doc_id % 9 + 1)::VARCHAR || 'T00:00:00Z' AS warc_date,
       length(body)::BIGINT AS content_length,
       {_h56('body')} AS payload_h
FROM b"""


def q_corr_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact Pearson correlation (n_chars vs token count) — the
    engine-portable variant of F.corr: six exact int64 sums in ONE
    aggregation, the coefficient one shared-op-order double formula
    (IEEE sqrt is correctly rounded everywhere)."""
    from jsonschema_spark.operators.dedup import tokens
    from jsonschema_spark.operators.stats import pairwise_corr

    d = _docs(spark, sf_dir).select(
        "n_chars", F.size(tokens(F.col("text"))).alias("n_toks"))
    return pairwise_corr(d, "n_chars", "n_toks")


_CORR_SQL = f"""
WITH t AS (SELECT n_chars, len({_TOKS}) AS n_toks FROM documents),
a AS (SELECT count(*)::BIGINT AS n,
             coalesce(sum(n_chars), 0)::BIGINT AS sx,
             coalesce(sum(n_toks), 0)::BIGINT AS sy,
             coalesce(sum(n_chars * n_chars), 0)::BIGINT AS sxx,
             coalesce(sum(n_toks * n_toks), 0)::BIGINT AS syy,
             coalesce(sum(n_chars * n_toks), 0)::BIGINT AS sxy
      FROM t WHERE n_chars IS NOT NULL AND n_toks IS NOT NULL)
SELECT n, sx AS sum_x, sy AS sum_y,
       CASE WHEN (n * sxx - sx * sx) > 0 AND (n * syy - sy * sy) > 0
            THEN floor((n * sxy - sx * sy)::DOUBLE * 1000000.0
                       / sqrt((n * sxx - sx * sx)::DOUBLE
                              * (n * syy - sy * sy)))::BIGINT
       END AS corr_ppm
FROM a"""


def q_script_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unicode-script composition per doc (the language-ID prefilter):
    docs augmented with hash-derived Cyrillic/CJK/Greek runs so every
    class fires; one regexp_count per class in the scan projection,
    dominant = greatest(struct(count, -priority, name))."""
    from jsonschema_spark.operators.textstats import script_profile

    i = F.col("doc_id")
    t = F.concat(
        F.col("text"), F.lit(" "),
        F.repeat(F.lit("д"), (i % 4).cast("int")),
        F.repeat(F.lit("汉"), (i % 3).cast("int")),
        F.repeat(F.lit("α"), (i % 2).cast("int")),
    )
    d = _docs(spark, sf_dir).select("doc_id", t.alias("text"))
    return script_profile(d, "doc_id", "text")


def _script_profile_sql() -> str:
    from jsonschema_spark.operators.textstats import SCRIPT_CLASSES

    cnt = {
        name: f"coalesce(len(regexp_extract_all(t, '{pat}')), 0)::BIGINT"
        for name, pat in SCRIPT_CLASSES
    }
    cols = ",\n       ".join(f"{cnt[name]} AS {name}" for name, _ in SCRIPT_CLASSES)
    structs = ", ".join(
        f"{{'c': {name}, 'p': {-i}, 's': '{name}'}}"
        for i, (name, _) in enumerate(SCRIPT_CLASSES)
    )
    names = ", ".join(name for name, _ in SCRIPT_CLASSES)
    return f"""
WITH d AS (SELECT doc_id,
                  text || ' ' || repeat('д', (doc_id % 4)::INT)
                       || repeat('汉', (doc_id % 3)::INT)
                       || repeat('α', (doc_id % 2)::INT) AS t
           FROM documents),
c AS (SELECT doc_id, coalesce(length(t), 0)::BIGINT AS n_chars,
       {cols}
      FROM d),
g AS (SELECT *, list_max([{structs}]) AS dom FROM c)
SELECT doc_id, n_chars, {names},
       CASE WHEN struct_extract(dom, 'c') > 0
            THEN struct_extract(dom, 's') END AS dominant_script
FROM g"""


_ROBOTS_BASE = (
    "User-agent: badbot\nDisallow: /\n\nUser-agent: *\nDisallow: /private\n"
    "Allow: /private/ok$\nDisallow: /t*p\nDisallow:\nCrawl-delay: 5\n"
    "Sitemap: /sitemap.xml\n"
)
_ROBOTS_EXTRA = ("\nUser-agent: ccbot\nDisallow: /block\n"
                 "Sitemap: /sitemap-cc.xml\n")
_ROBOTS_PATHS = ["/private/x", "/private/ok", "/public", "/t123p",
                 "/block/z", "/private/ok?x=1"]


def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl compliance: RFC 9309 robots.txt parsing (group merging,
    specific-agent precedence, * wildcards, $ anchors, empty-Disallow
    drop) + longest-match/allow-wins URL filtering for agent 'ccbot'.
    Hosts ≡ 0 (mod 7) carry a ccbot-specific group that overrides their
    * group; the '?x=1' path defeats the $-anchored Allow."""
    from jsonschema_spark.operators.robots import robots_filter, robots_rules_df

    d = _docs(spark, sf_dir)
    i = F.col("doc_id")
    host = F.concat(F.lit("h"), (i % 50).cast("string"), F.lit(".example.org"))
    paths = F.array(*[F.lit(p) for p in _ROBOTS_PATHS])
    urls = d.select(
        "doc_id",
        F.concat(F.lit("https://"), host,
                 F.element_at(paths, (i % 6 + 1).cast("int"))).alias("url"),
    )
    hosts = d.select((i % 50).alias("hid")).distinct()
    robots = hosts.select(
        F.concat(F.lit("h"), F.col("hid").cast("string"),
                 F.lit(".example.org")).alias("host"),
        F.concat(
            F.lit(_ROBOTS_BASE),
            F.when(F.col("hid") % 7 == 0, F.lit(_ROBOTS_EXTRA)).otherwise(F.lit("")),
        ).alias("robots_txt"),
    )
    return robots_filter(urls, robots_rules_df(robots, agent="ccbot"))


def _robots_sql() -> str:
    from jsonschema_spark.operators.urltools import _URL_RE

    paths = "[" + ", ".join(f"'{p}'" for p in _ROBOTS_PATHS) + "]"
    g = lambda n: f"regexp_extract(url, '{_URL_RE}', {n})"  # noqa: E731
    return f"""
WITH hosts AS (SELECT DISTINCT (doc_id % 50) AS hid FROM documents),
rb AS (SELECT 'h' || hid::VARCHAR || '.example.org' AS host,
              '{_ROBOTS_BASE}' ||
              CASE WHEN hid % 7 = 0 THEN '{_ROBOTS_EXTRA}' ELSE '' END AS body
       FROM hosts),
ln AS (SELECT host, i AS li, trim(regexp_replace(lines[i], '#.*$', '')) AS line
       FROM (SELECT host, string_split_regex(body, '\\r?\\n') AS lines FROM rb),
            LATERAL (SELECT unnest(range(1, len(lines)+1)) AS i) ix),
d AS (SELECT host, li,
             lower(regexp_extract(line, '^([A-Za-z-]+)\\s*:', 1)) AS dir,
             regexp_extract(line, '^[A-Za-z-]+\\s*:\\s*(\\S*)', 1) AS val
      FROM ln
      -- every directive line survives to boundary detection (a non-UA
      -- directive such as Crawl-delay ends a user-agent cluster)
      WHERE lower(regexp_extract(line, '^([A-Za-z-]+)\\s*:', 1)) <> ''),
g0 AS (SELECT *, CASE WHEN dir = 'user-agent'
                       AND coalesce(lag(dir) OVER (PARTITION BY host ORDER BY li), '')
                           <> 'user-agent'
                      THEN 1 ELSE 0 END AS st FROM d),
gg AS (SELECT *, sum(st) OVER (PARTITION BY host ORDER BY li
                               ROWS UNBOUNDED PRECEDING) AS gid FROM g0),
ag AS (SELECT host, gid,
              max(CASE WHEN lower(val) = 'ccbot' THEN 1 ELSE 0 END) AS named,
              max(CASE WHEN val = '*' THEN 1 ELSE 0 END) AS star
       FROM gg WHERE dir = 'user-agent' AND gid >= 1 GROUP BY 1, 2),
hn AS (SELECT host, max(named) AS has_named FROM ag GROUP BY 1),
app AS (SELECT ag.host, ag.gid FROM ag JOIN hn USING (host)
        WHERE (has_named = 1 AND named = 1) OR (has_named = 0 AND star = 1)),
rules AS (SELECT gg.host, (dir = 'allow') AS allow, val AS spec,
                 length(val)::BIGINT AS spec_len,
                 -- same metachar set as robots.spec_to_regex (backslash,
                 -- .[]{{}}()+?^$|), so the mirror cannot desync if a
                 -- future fixture rule path gains a metachar
                 '^' || replace(regexp_replace(
                     CASE WHEN val LIKE '%$' THEN substr(val, 1, length(val)-1)
                          ELSE val END,
                     '([\\.\\[\\]\\{{\\}}\\(\\)\\+\\?\\^\\$\\|\\\\])',
                     '\\\\\\1', 'g'), '*', '.*')
                 || CASE WHEN val LIKE '%$' THEN '$' ELSE '' END AS spec_re
          FROM gg JOIN app USING (host, gid)
          WHERE dir IN ('allow', 'disallow') AND val <> '' AND gid >= 1),
urls AS (SELECT doc_id,
                'https://h' || (doc_id % 50)::VARCHAR || '.example.org'
                || {paths}[(doc_id % 6)::INT + 1] AS url
         FROM documents),
u AS (SELECT doc_id, url, lower({g(2)}) AS host,
             (CASE WHEN {g(4)} = '' THEN '/' ELSE {g(4)} END
              || CASE WHEN {g(5)} <> '' THEN {g(5)} ELSE '' END) AS t
      FROM urls),
m AS (SELECT u.doc_id, r.allow, r.spec, r.spec_len
      FROM u JOIN rules r ON u.host = r.host
      WHERE CASE WHEN r.spec NOT LIKE '%*%' AND r.spec NOT LIKE '%$%'
                 THEN starts_with(u.t, r.spec)
                 ELSE regexp_matches(u.t, r.spec_re) END),
win AS (SELECT doc_id,
               max({{'l': spec_len, 'a': allow::INT, 's': spec}}) AS w
        FROM m GROUP BY 1)
SELECT u.doc_id, u.url,
       coalesce(struct_extract(w, 'a') = 1, true) AS allowed,
       struct_extract(w, 's') AS rule_spec,
       struct_extract(w, 'l') AS rule_len
FROM u LEFT JOIN win USING (doc_id)"""


def q_crawl_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delay-aware politeness schedule: per-host Crawl-delay parsed from
    robots.txt under the SAME group-selection semantics as robots_filter
    (hosts ≡ 0 (mod 7) have a ccbot group WITHOUT a Crawl-delay, so the
    * group's 5 s does NOT apply to ccbot there → the 1 s default), then
    per-host fetch sequencing × delay = the earliest permitted fetch
    offset per url. The window partitions by host — per-host frontier
    slices, never a global sort."""
    from jsonschema_spark.operators.robots import (
        frontier_schedule, robots_crawl_delay)

    d = _docs(spark, sf_dir)
    i = F.col("doc_id")
    host = F.concat(F.lit("h"), (i % 50).cast("string"),
                    F.lit(".example.org"))
    paths = F.array(*[F.lit(p) for p in _ROBOTS_PATHS])
    urls = d.select(
        F.concat(F.lit("https://"), host,
                 F.element_at(paths, (i % 6 + 1).cast("int"))).alias("url")
    ).distinct()  # a frontier is a url SET (dup urls would also tie the
    # per-host row_number non-deterministically)
    hosts = d.select((i % 50).alias("hid")).distinct()
    robots = hosts.select(
        F.concat(F.lit("h"), F.col("hid").cast("string"),
                 F.lit(".example.org")).alias("host"),
        F.concat(
            F.lit(_ROBOTS_BASE),
            F.when(F.col("hid") % 7 == 0, F.lit(_ROBOTS_EXTRA))
            .otherwise(F.lit("")),
        ).alias("robots_txt"),
    )
    delays = robots_crawl_delay(robots, agent="ccbot")
    return frontier_schedule(urls, delays).orderBy("url")


def _crawl_schedule_sql() -> str:
    paths = "[" + ", ".join(f"'{p}'" for p in _ROBOTS_PATHS) + "]"
    return f"""
WITH hosts AS (SELECT DISTINCT (doc_id % 50) AS hid FROM documents),
rb AS (SELECT 'h' || hid::VARCHAR || '.example.org' AS host,
              '{_ROBOTS_BASE}' ||
              CASE WHEN hid % 7 = 0 THEN '{_ROBOTS_EXTRA}' ELSE '' END AS body
       FROM hosts),
ln AS (SELECT host, i AS li, trim(regexp_replace(lines[i], '#.*$', '')) AS line
       FROM (SELECT host, string_split_regex(body, '\\r?\\n') AS lines FROM rb),
            LATERAL (SELECT unnest(range(1, len(lines)+1)) AS i) ix),
d AS (SELECT host, li,
             lower(regexp_extract(line, '^([A-Za-z-]+)\\s*:', 1)) AS dir,
             regexp_extract(line, '^[A-Za-z-]+\\s*:\\s*(\\S*)', 1) AS val
      FROM ln
      WHERE lower(regexp_extract(line, '^([A-Za-z-]+)\\s*:', 1)) <> ''),
g0 AS (SELECT *, CASE WHEN dir = 'user-agent'
                       AND coalesce(lag(dir) OVER (PARTITION BY host ORDER BY li), '')
                           <> 'user-agent'
                      THEN 1 ELSE 0 END AS st FROM d),
gg AS (SELECT *, sum(st) OVER (PARTITION BY host ORDER BY li
                               ROWS UNBOUNDED PRECEDING) AS gid FROM g0),
ag AS (SELECT host, gid,
              max(CASE WHEN lower(val) = 'ccbot' THEN 1 ELSE 0 END) AS named,
              max(CASE WHEN val = '*' THEN 1 ELSE 0 END) AS star
       FROM gg WHERE dir = 'user-agent' AND gid >= 1 GROUP BY 1, 2),
hn AS (SELECT host, max(named) AS has_named FROM ag GROUP BY 1),
app AS (SELECT ag.host, ag.gid FROM ag JOIN hn USING (host)
        WHERE (has_named = 1 AND named = 1) OR (has_named = 0 AND star = 1)),
dl AS (SELECT gg.host,
              max(CAST(floor(try_cast(val AS DOUBLE) * 1000) AS BIGINT))
              AS crawl_delay_ms
       FROM gg JOIN app USING (host, gid)
       WHERE dir = 'crawl-delay' AND val <> ''
         AND floor(try_cast(val AS DOUBLE) * 1000) >= 0
       GROUP BY 1),
urls AS (SELECT DISTINCT
                'https://h' || (doc_id % 50)::VARCHAR || '.example.org'
                || {paths}[(doc_id % 6)::INT + 1] AS url,
                'h' || (doc_id % 50)::VARCHAR || '.example.org' AS host
         FROM documents),
sq AS (SELECT url, host,
              row_number() OVER (PARTITION BY host ORDER BY url)
              AS seq_in_host
       FROM urls)
SELECT sq.url, sq.host, sq.seq_in_host::BIGINT AS seq_in_host,
       coalesce(dl.crawl_delay_ms, 1000)::BIGINT AS delay_ms,
       ((sq.seq_in_host - 1) * coalesce(dl.crawl_delay_ms, 1000))::BIGINT
       AS not_before_ms
FROM sq LEFT JOIN dl USING (host) ORDER BY url"""


def q_robots_sitemap_urls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sitemap discovery from robots.txt (host-wide 'other record', no
    group scoping): every host advertises /sitemap.xml; ccbot hosts add
    /sitemap-cc.xml — the fetch list sitemap_entries starts from."""
    from jsonschema_spark.operators.robots import robots_sitemaps

    d = _docs(spark, sf_dir)
    hosts = d.select((F.col("doc_id") % 50).alias("hid")).distinct()
    robots = hosts.select(
        F.concat(F.lit("h"), F.col("hid").cast("string"),
                 F.lit(".example.org")).alias("host"),
        F.concat(
            F.lit(_ROBOTS_BASE),
            F.when(F.col("hid") % 7 == 0, F.lit(_ROBOTS_EXTRA))
            .otherwise(F.lit("")),
        ).alias("robots_txt"),
    )
    return robots_sitemaps(robots).orderBy("host", "sitemap_url")


def _robots_sitemaps_sql() -> str:
    return f"""
WITH hosts AS (SELECT DISTINCT (doc_id % 50) AS hid FROM documents),
rb AS (SELECT 'h' || hid::VARCHAR || '.example.org' AS host,
              '{_ROBOTS_BASE}' ||
              CASE WHEN hid % 7 = 0 THEN '{_ROBOTS_EXTRA}' ELSE '' END AS body
       FROM hosts),
ln AS (SELECT host, trim(regexp_replace(l, '#.*$', '')) AS line
       FROM (SELECT host, unnest(string_split_regex(body, '\\r?\\n')) AS l
             FROM rb)),
sm AS (SELECT host,
              trim(regexp_extract(line, '^[A-Za-z-]+\\s*:\\s*(.*)$', 1))
              AS sitemap_url
       FROM ln
       WHERE lower(regexp_extract(line, '^([A-Za-z-]+)\\s*:', 1)) = 'sitemap')
SELECT DISTINCT host, sitemap_url FROM sm
WHERE sitemap_url <> '' ORDER BY host, sitemap_url"""


def q_kmeans_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic fixed-iteration Lloyd k-means over the embeddings
    table (k=4, 3 rounds, exact integer arithmetic): the trained upgrade
    of the IVF/SemDeDup coarse quantizer. Oracle unrolls the identical
    rounds — hash init means, argmin assignment with (dist, ci)
    tie-break, floor(sum/count) updates with empty-cell carry."""
    from jsonschema_spark.operators.similarity import kmeans_fixed

    e = spark.read.parquet(_t(sf_dir, "embeddings"))
    out, _ = kmeans_fixed(e, "vec_id", "embedding", k=4, iters=3)
    return out


def _kmeans_sql(k: int = 4, iters: int = 3, scale: int = 100) -> str:
    sqd = "list_sum(list_transform(list_zip(p.q, c.cv), x -> (x[1]-x[2])*(x[1]-x[2])))"

    def means(src: str) -> str:
        return (
            f"(SELECT ci, list(cvd ORDER BY pos) AS cv FROM (\n"
            f"   SELECT a.ci, ix.pos, floor(sum(a.q[ix.pos]) / count(*))::BIGINT AS cvd\n"
            f"   FROM {src} a, LATERAL (SELECT unnest(range(1, len(a.q)+1)) AS pos) ix\n"
            f"   GROUP BY 1, 2) GROUP BY 1)"
        )

    def assign(cent: str) -> str:
        return (
            f"(SELECT vec_id, q, ci FROM (\n"
            f"   SELECT p.vec_id, p.q, c.ci,\n"
            f"          row_number() OVER (PARTITION BY p.vec_id\n"
            f"                             ORDER BY {sqd}, c.ci) AS rn\n"
            f"   FROM pts p CROSS JOIN {cent} c) WHERE rn = 1)"
        )

    ctes = [
        f"pts AS (SELECT vec_id, [floor(x::DOUBLE*{scale})::BIGINT for x in embedding] AS q FROM embeddings)",
        f"a0 AS (SELECT vec_id, q, (vec_id % {k})::INT AS ci FROM pts)",
        f"c1 AS {means('a0')}",
    ]
    for t in range(1, iters + 1):
        ctes.append(f"a{t} AS {assign(f'c{t}')}")
        if t < iters:
            ctes.append(f"c{t + 1}raw AS {means(f'a{t}')}")
            ctes.append(
                f"c{t + 1} AS (SELECT p.ci, coalesce(r.cv, p.cv) AS cv "
                f"FROM c{t} p LEFT JOIN c{t + 1}raw r USING (ci))"
            )
    return ("WITH " + ",\n".join(ctes)
            + f"\nSELECT vec_id, ci::BIGINT AS cell FROM a{iters}")


def q_chunk_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-token-window chunking with overlapping stride (32-token
    chunks every 24 tokens — the Megatron/GPT context-window prep step).
    Pure per-row codegen: zero shuffles, zero Python."""
    from jsonschema_spark.operators.curate import chunk_docs

    return chunk_docs(_docs(spark, sf_dir), "doc_id", "text",
                      chunk_tokens=32, stride=24)


def _chunk_docs_sql(ct: int = 32, s: int = 24) -> str:
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
ex AS (SELECT doc_id, toks, len(toks)::BIGINT AS n,
              unnest(range(0, len(toks), {s}))::BIGINT AS st
       FROM t WHERE len(toks) >= 1)
SELECT doc_id, (st // {s})::BIGINT AS chunk_idx, st AS start_tok,
       least({ct}, n - st)::BIGINT AS n_tok,
       array_to_string(toks[st + 1 : least(st + {ct}, n)::INT], ' ') AS chunk_text
FROM ex"""


_BM25_TERMS = ["dup", "customer", "spark"]


def q_bm25_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranked retrieval (Okapi BM25, integer-exact variant): top-15 docs
    for a three-term query mixing a rare term ('dup', df~25 at sf0.01)
    with two common ones — the idf surrogate must dominate the ranking.
    Corpus never shuffles; hits leave the scan pre-filtered."""
    from jsonschema_spark.operators.search import bm25_topk

    return bm25_topk(_docs(spark, sf_dir), "doc_id", "text", _BM25_TERMS, k=15)


def _bm25_sql(k: int = 15, k1m: int = 1200, bm: int = 750) -> str:
    terms = ", ".join(f"'{t}'" for t in sorted(set(_BM25_TERMS)))
    a = k1m + 1000
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
st AS (SELECT count(*)::BIGINT AS n, sum(len(toks))::BIGINT AS sumdl FROM t),
hit AS (SELECT doc_id, len(toks)::BIGINT AS dl, unnest(toks) AS w FROM t),
tf AS (SELECT doc_id, dl, w, count(*)::BIGINT AS tf FROM hit
       WHERE w IN ({terms}) GROUP BY 1, 2, 3),
dft AS (SELECT w, count(*)::BIGINT AS dfw FROM tf GROUP BY 1),
sc AS (SELECT doc_id, tf,
              floor(dl * 1000000
                    / greatest(floor(sumdl / n)::BIGINT, 1))::BIGINT AS dlnorm,
              floor(n * 1000000 / dfw)::BIGINT AS idf
       FROM tf JOIN dft USING (w) CROSS JOIN st),
sc2 AS (SELECT doc_id, tf,
               (tf * 1000000000000
                + {k1m} * ({(1000 - bm) * 1000000} + {bm} * dlnorm)) AS den,
               idf
        FROM sc),
sc3 AS (SELECT doc_id, tf,
               floor(tf * {a} * 1e15 / den)::BIGINT AS tfn, idf
        FROM sc2),
agg AS (SELECT doc_id, count(*)::BIGINT AS n_hit_terms,
               sum(tf)::BIGINT AS n_hits,
               sum(floor(tfn * idf::DOUBLE / 1000000)::BIGINT)::BIGINT AS score_ppm
        FROM sc3 GROUP BY 1)
SELECT doc_id, n_hit_terms, n_hits, score_ppm,
       row_number() OVER (ORDER BY score_ppm DESC, doc_id)::BIGINT AS rnk
FROM agg ORDER BY score_ppm DESC, doc_id LIMIT {k}"""


def _page_meta_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic page fixture for the page-metadata suite: html built
    purely from doc_id/lang/source (varying attribute ORDER, QUOTE style
    and presence; entity + newline in title; robots directives incl.
    'none'; canonical in absolute/root-relative/protocol-relative forms
    with an uppercase host and a tracking param to exercise resolution +
    normalization). Returns (doc_id, url, html:string)."""
    i = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    host = F.concat(F.lit("h"), s(i % 50), F.lit(".example.org"))
    url = F.concat(F.lit("https://"), host, F.lit("/page/"), s(i),
                   F.lit("?x="), s(i % 7))
    lang_attr = F.when(
        i % 3 == 0,
        F.concat(F.lit(' lang="'), F.upper(F.col("lang")), F.lit('"')),
    ).otherwise(F.lit(""))
    title = F.when(
        i % 5 != 4,
        F.concat(F.lit("<title> Doc &amp; "), s(i), F.lit("\n of "),
                 F.col("source"), F.lit(" </title>")),
    ).otherwise(F.lit(""))
    desc = (
        F.when(i % 7 == 6, F.lit(""))
        .when(i % 2 == 0,
              F.concat(F.lit('<meta name="description" content="desc '),
                       s(i), F.lit(' &quot;q&quot;">')))
        .otherwise(F.concat(F.lit("<META content='desc "), s(i),
                            F.lit(" &quot;q&quot;' name='description'>")))
    )
    robots = (
        F.when(i % 9 == 1, F.lit('<meta name="robots" content="NOINDEX, follow">'))
        .when(i % 9 == 4, F.lit("<meta content='nofollow' name='robots'>"))
        .when(i % 9 == 7, F.lit('<meta name="robots" content="none">'))
        .otherwise(F.lit(""))
    )
    cpath = F.concat(F.lit("/canon/"), s(i % 40))
    canon = (
        F.when(i % 6 == 0,
               F.concat(F.lit('<link rel="canonical" href="https://H'),
                        s(i % 50), F.lit(".EXample.org"), cpath,
                        F.lit('?utm_campaign=z&a=1">')))
        .when(i % 6 == 2,
              F.concat(F.lit("<link href='"), cpath,
                       F.lit("' rel='canonical'>")))
        .when(i % 6 == 4,
              F.concat(F.lit('<link rel="canonical" href="//h'), s(i % 50),
                       F.lit(".example.org"), cpath, F.lit('">')))
        .otherwise(F.lit(""))
    )
    html = F.concat(F.lit("<html"), lang_attr, F.lit("><head>"), title,
                    desc, robots, canon,
                    F.lit("</head><body>b</body></html>"))
    return _docs(spark, sf_dir).select(
        "doc_id", url.alias("url"), html.alias("html"))


def q_page_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Page metadata extraction (title / meta description / html lang /
    robots-meta directives / rel=canonical): the indexing-consent and
    corpus-card step between fetch and text extraction. Pure codegen scan
    projection — zero Python, zero shuffles (operators/htmltext.py
    pattern constants shared verbatim with the oracle)."""
    from jsonschema_spark.operators.htmltext import html_meta_df

    return html_meta_df(_page_meta_pages(spark, sf_dir), binary=False)


def q_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-URL duplicate clustering: resolve each page's
    rel=canonical (absolute / protocol-relative / root-relative;
    path-relative falls back to the page URL), normalize, ONE groupBy per
    target keeping the smallest (id, url) representative — the crawl
    dedup step BEFORE content hashing. No joins, no windows."""
    from jsonschema_spark.operators.htmltext import canonical_dedup_df

    return canonical_dedup_df(_page_meta_pages(spark, sf_dir),
                              binary=False)


_PAGE_META_HTML_SQL = """
SELECT doc_id,
       'https://h' || (doc_id % 50)::VARCHAR || '.example.org/page/'
         || doc_id::VARCHAR || '?x=' || (doc_id % 7)::VARCHAR AS url,
       '<html'
       || CASE WHEN doc_id % 3 = 0
               THEN ' lang="' || upper(lang) || '"' ELSE '' END
       || '><head>'
       || CASE WHEN doc_id % 5 <> 4
               THEN '<title> Doc &amp; ' || doc_id::VARCHAR || chr(10)
                    || ' of ' || source || ' </title>' ELSE '' END
       || CASE WHEN doc_id % 7 = 6 THEN ''
               WHEN doc_id % 2 = 0
               THEN '<meta name="description" content="desc '
                    || doc_id::VARCHAR || ' &quot;q&quot;">'
               ELSE '<META content=''desc ' || doc_id::VARCHAR
                    || ' &quot;q&quot;'' name=''description''>' END
       || CASE WHEN doc_id % 9 = 1
               THEN '<meta name="robots" content="NOINDEX, follow">'
               WHEN doc_id % 9 = 4
               THEN '<meta content=''nofollow'' name=''robots''>'
               WHEN doc_id % 9 = 7
               THEN '<meta name="robots" content="none">' ELSE '' END
       || CASE WHEN doc_id % 6 = 0
               THEN '<link rel="canonical" href="https://H'
                    || (doc_id % 50)::VARCHAR || '.EXample.org/canon/'
                    || (doc_id % 40)::VARCHAR || '?utm_campaign=z&a=1">'
               WHEN doc_id % 6 = 2
               THEN '<link href=''/canon/' || (doc_id % 40)::VARCHAR
                    || ''' rel=''canonical''>'
               WHEN doc_id % 6 = 4
               THEN '<link rel="canonical" href="//h'
                    || (doc_id % 50)::VARCHAR || '.example.org/canon/'
                    || (doc_id % 40)::VARCHAR || '">' ELSE '' END
       || '</head><body>b</body></html>' AS html
FROM documents"""


def _page_meta_sql() -> str:
    from jsonschema_spark.operators.htmltext import html_meta_sql

    return html_meta_sql(_PAGE_META_HTML_SQL)


def _canonical_dedup_sql() -> str:
    """Mirror of canonical_dedup_df: same extraction patterns
    (html_meta_sql), same href-resolution CASE order, same normalization
    chain (_URL_RE groups, tracking filter, bytewise param sort), same
    min(struct) representative."""
    from jsonschema_spark.operators.htmltext import html_meta_sql
    from jsonschema_spark.operators.urltools import TRACKING_RE, _URL_RE

    g = lambda src, n: f"regexp_extract({src}, '{_URL_RE}', {n})"  # noqa: E731
    return f"""
WITH pages AS ({_PAGE_META_HTML_SQL}),
meta AS (SELECT m.doc_id, p.url, m.canonical_href
         FROM ({html_meta_sql('SELECT doc_id, html FROM pages')}) m
         JOIN pages p USING (doc_id)),
res AS (SELECT doc_id, url,
          CASE WHEN canonical_href IS NULL THEN url
               WHEN regexp_matches(canonical_href,
                                   '^[A-Za-z][A-Za-z0-9+.-]*://')
               THEN canonical_href
               WHEN canonical_href LIKE '//%'
               THEN lower({g('url', 1)}) || ':' || canonical_href
               WHEN canonical_href LIKE '/%'
               THEN lower({g('url', 1)}) || '://' || lower({g('url', 2)})
                    || canonical_href
               ELSE url END AS t
        FROM meta),
p AS (SELECT doc_id, url,
        lower({g('t', 1)}) AS scheme,
        lower({g('t', 2)}) AS host,
        {g('t', 3)} AS port,
        regexp_replace({g('t', 4)}, '/{{2,}}', '/', 'g') AS path,
        list_sort(list_filter(
          string_split(substr({g('t', 5)}, 2), '&'),
          x -> NOT regexp_matches(x, '{TRACKING_RE}') AND x <> '')) AS kept
      FROM res),
n AS (SELECT doc_id, url,
        scheme || '://' || host
        || CASE WHEN port='' OR (scheme='http' AND port=':80')
                  OR (scheme='https' AND port=':443') THEN '' ELSE port END
        || CASE WHEN path='' THEN '/' ELSE path END
        || CASE WHEN len(kept)=0 THEN ''
                ELSE '?' || array_to_string(kept, '&') END AS canon_url
      FROM p)
SELECT canon_url, count(*)::BIGINT AS n_pages,
       struct_extract(min({{'i': doc_id, 'u': url}}), 'i') AS keep_id,
       struct_extract(min({{'i': doc_id, 'u': url}}), 'u') AS keep_url
FROM n GROUP BY 1"""


def _moji(ch: str) -> str:
    return ch.encode("utf-8").decode("cp1252")


# deterministic encoding-damage snippets, generated from the SAME
# byte-model the repair table is generated from (so the fixture cannot
# drift from the operator): appended to every doc_id % 4 == 0 / == 2 row.
_MOJI_SNIP_A = (" caf" + _moji("é") + " it" + _moji("’") + "s "
                + _moji("–") + " ok")
_MOJI_SNIP_B = (" " + _moji("“") + "q" + _moji("…") + " " + _moji("°")
                + "C " + _moji("ß"))


def q_mojibake_repair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-damage (mojibake) detection + repair — the ftfy step:
    UTF-8-misdecoded-as-cp1252 sequences repaired by a fixed
    generated-from-the-byte-model replace chain (58 literal codegen
    replaces, zero Python, zero shuffle; operators/textstats.py
    MOJIBAKE_TABLE shared verbatim with the oracle). Fixture plants
    snippets on doc_id%4∈{0,2}; odd rows must read changed=false."""
    from jsonschema_spark.operators.dedup import hash56
    from jsonschema_spark.operators.textstats import mojibake_stats_df

    i = F.col("doc_id")
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.when(i % 4 == 0, F.concat(F.col("text"), F.lit(_MOJI_SNIP_A)))
         .when(i % 4 == 2, F.concat(F.col("text"), F.lit(_MOJI_SNIP_B)))
         .otherwise(F.col("text")).alias("text"),
    )
    out = mojibake_stats_df(d)
    return out.select(
        "doc_id", "changed", "n_chars_fixed",
        hash56(F.col("text_fixed")).alias("fixed_h56"),
    )


def _mojibake_repair_sql() -> str:
    from jsonschema_spark.operators.textstats import fix_mojibake_sql

    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    fixed = fix_mojibake_sql("text2")
    return f"""
WITH d AS (SELECT doc_id,
                  CASE WHEN doc_id % 4 = 0 THEN text || {q(_MOJI_SNIP_A)}
                       WHEN doc_id % 4 = 2 THEN text || {q(_MOJI_SNIP_B)}
                       ELSE text END AS text2
           FROM documents),
f AS (SELECT doc_id, text2, {fixed} AS tf FROM d)
SELECT doc_id, text2 <> tf AS changed,
       (length(text2) - length(tf))::BIGINT AS n_chars_fixed,
       {_h56('tf')} AS fixed_h56
FROM f"""


_PACK_LEN = 64


def q_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-document pretraining sequence packing (GPT concat-and-split):
    all docs in id order become one virtual token stream split at fixed
    64-token boundaries — per-sequence ledger of tokens/docs/boundary
    crossings. Global token offsets via the zipWithIndex-on-sorted
    recipe (range partition + parallel per-partition cumsums + broadcast
    n_partitions-row offsets), ONE bounded explode, ONE map-side-partial
    groupBy — no corpus-sized single-partition window anywhere."""
    from jsonschema_spark.operators.curate import pack_sequences

    return pack_sequences(_docs(spark, sf_dir), seq_len=_PACK_LEN)


def _pack_sequences_sql() -> str:
    L = _PACK_LEN
    return f"""
{_DOC_TOKS},
c AS (SELECT doc_id, len(toks)::BIGINT AS cnt FROM t WHERE len(toks) > 0),
s AS (SELECT doc_id, cnt,
             sum(cnt) OVER (ORDER BY doc_id
                            ROWS UNBOUNDED PRECEDING)::BIGINT AS e
      FROM c),
sp AS (SELECT doc_id, (e - cnt) AS st, e FROM s),
x AS (SELECT doc_id, st, e, q.seq_id
      FROM sp, LATERAL (SELECT unnest(range(st // {L}, (e-1) // {L} + 1))
                        AS seq_id) q),
g AS (SELECT seq_id,
             sum(least(e, (seq_id+1)*{L}) - greatest(st, seq_id*{L}))::BIGINT
               AS n_tokens,
             count(*)::BIGINT AS n_docs,
             sum(CASE WHEN st >= seq_id*{L} THEN 1 ELSE 0 END)::BIGINT
               AS n_docs_started,
             min(doc_id) AS first_doc, max(doc_id) AS last_doc
      FROM x GROUP BY 1)
SELECT seq_id, n_tokens, n_docs, n_docs_started, first_doc, last_doc,
       (n_tokens = {L}) AS is_full,
       (n_tokens * 1000000 // {L})::BIGINT AS fill_ppm
FROM g"""


_TD_PS = (0.01, 0.25, 0.5, 0.75, 0.99)


def q_tdigest_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """t-digest quantiles for text length (the north-star names the
    sketch): distributed build (mapInPandas partition partials ≤δ
    centroids each → ONE allowed global-agg-of-partials → numpy merge),
    estimates checked against the corpus IN SPARK — realized rank of
    each estimate must sit within 40000 ppm of its target (theory at
    δ=100 is ~5000 ppm + ≤12000 ppm from duplicate-value steps).
    exact_milli rides along as the hash-attested exact quantile (same
    percentile interpolation both engines); the oracle attests the BOUND
    (literal true) since the adaptive sketch is engine-private by design
    — hist_sketch is the bit-stable oracle-replayable sibling."""
    from jsonschema_spark.operators.stats import (
        tdigest_quantiles, tdigest_sketch)

    docs = _docs(spark, sf_dir)
    sk = tdigest_sketch(docs, "n_chars", compression=100)
    est = tdigest_quantiles(sk, _TD_PS)
    p_arr = F.array(*[F.lit(int(p * 1_000_000)) for p in _TD_PS])
    exact = (
        docs.agg(F.percentile(F.col("n_chars").cast("double"),
                              F.lit(list(_TD_PS))).alias("qs"))
        .select(F.posexplode("qs").alias("i", "v"))
        .select(
            F.element_at(p_arr, F.col("i").cast("int") + 1).cast("long")
            .alias("p_ppm"),
            F.floor(F.col("v") * 1000).cast("long").alias("exact_milli"),
        )
    )
    ranks = (
        docs.crossJoin(F.broadcast(est))
        .groupBy("p_ppm")
        .agg(
            F.sum(F.when(F.col("n_chars") <= F.col("q_est"), 1)
                  .otherwise(0)).alias("n_le"),
            F.count(F.lit(1)).alias("n"),
        )
        .select(
            "p_ppm",
            (F.abs(F.col("n_le") * 1_000_000 / F.col("n") - F.col("p_ppm"))
             <= 40_000).alias("rank_ok"),
        )
    )
    return exact.join(ranks, "p_ppm").select("p_ppm", "exact_milli",
                                             "rank_ok")


def _tdigest_chars_sql() -> str:
    return " UNION ALL ".join(
        f"SELECT {int(p * 1_000_000)}::BIGINT AS p_ppm, "
        f"floor(quantile_cont(n_chars::DOUBLE, {p}) * 1000)::BIGINT "
        f"AS exact_milli, true AS rank_ok FROM documents"
        for p in _TD_PS
    )


_JSONLD_SCHEMA = {
    "type": "object",
    "required": ["@type"],
    "allOf": [
        {
            "if": {"properties": {"@type": {"const": "Article"}},
                   "required": ["@type"]},
            "then": {
                "required": ["headline"],
                "properties": {
                    "headline": {"type": "string"},
                    "wordCount": {"type": "integer", "minimum": 0},
                    "inLanguage": {"enum": ["en", "de", "fr", "es"]},
                },
            },
        },
        {
            "if": {"properties": {"@type": {"const": "Product"}},
                   "required": ["@type"]},
            "then": {
                "required": ["name"],
                "properties": {"price": {"type": "number", "minimum": 0}},
            },
        },
    ],
}


def _jsonld_pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pages whose <head> carries schema.org JSON-LD islands beside a
    noise JS block: every doc an Article block (headline omitted on
    i%7==3, wordCount mis-typed string on i%5==2, inLanguage 'zz' on
    i%11==6, malformed JSON — closing brace dropped — on i%13==9), even
    ids a second Product block (negative price on i%8==4)."""
    i = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    headline = F.when(i % 7 == 3, F.lit("")).otherwise(
        F.concat(F.lit('"headline":"Doc '), s(i), F.lit('",')))
    wc = F.when(i % 5 == 2,
                F.concat(F.lit('"wordCount":"'), s(i % 900), F.lit('"')))\
        .otherwise(F.concat(F.lit('"wordCount":'), s(i % 900)))
    lang = F.when(i % 11 == 6, F.lit("zz")).otherwise(F.col("lang"))
    art = F.when(i % 13 == 9, F.expr("substring(a, 1, length(a)-1)"))\
        .otherwise(F.col("a"))
    price = F.when(i % 8 == 4, F.lit("-5.5")).otherwise(
        F.concat(s(i % 50), F.lit(".5")))
    prod = F.when(
        i % 2 == 0,
        F.concat(F.lit("<script TYPE='application/ld+json'>"
                       '{"@type":"Product","name":"P'), s(i),
                 F.lit('","price":'), price, F.lit("}</script>")),
    ).otherwise(F.lit(""))
    base = _docs(spark, sf_dir).select(
        "doc_id", "lang",
        F.concat(
            F.lit('{"@context":"https://schema.org","@type":"Article",'),
            headline, wc, F.lit(',"inLanguage":"'), lang, F.lit('"}'))
        .alias("a"))
    html = F.concat(
        F.lit("<html><head><script>var x=1; // {not json}</script>"
              '<script type="application/ld+json">'),
        art, F.lit("</script>"), prod,
        F.lit("</head><body>t</body></html>"))
    return base.select("doc_id", html.alias("html"))


def q_jsonld_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The jsonschema × webtext flagship composition: JSON-LD islands
    extracted from crawl HTML (embedded_jsonld_df — typed <script>
    filter, noise JS never matches) and validated by THE ENGINE'S OWN
    VARIANT validator with a per-@type if/then schema — malformed JSON
    is data (valid=false), never a task-killing error. One codegen
    extraction + the fast-validate projection; no Python, no joins."""
    from jsonschema_spark.operators.htmltext import embedded_jsonld_df
    from jsonschema_spark.operators.validate import validate

    blocks = embedded_jsonld_df(_jsonld_pages(spark, sf_dir),
                                binary=False)
    out = validate(blocks, _JSONLD_SCHEMA, doc_col="jsonld")
    return out.select(
        "doc_id", "block_idx",
        F.get_json_object("jsonld", "$['@type']").alias("jtype"),
        "valid",
    )


def _jsonld_validate_sql() -> str:
    from jsonschema_spark.operators.htmltext import embedded_jsonld_sql

    pages = """
SELECT doc_id,
       '<html><head><script>var x=1; // {not json}</script>'
       || '<script type="application/ld+json">'
       || CASE WHEN doc_id % 13 = 9 THEN substr(a, 1, length(a)-1)
               ELSE a END
       || '</script>'
       || CASE WHEN doc_id % 2 = 0
               THEN '<script TYPE=''application/ld+json''>'
                    || '{"@type":"Product","name":"P' || doc_id::VARCHAR
                    || '","price":'
                    || CASE WHEN doc_id % 8 = 4 THEN '-5.5'
                            ELSE (doc_id % 50)::VARCHAR || '.5' END
                    || '}</script>'
               ELSE '' END
       || '</head><body>t</body></html>' AS html
FROM (SELECT doc_id,
             '{"@context":"https://schema.org","@type":"Article",'
             || CASE WHEN doc_id % 7 = 3 THEN ''
                     ELSE '"headline":"Doc ' || doc_id::VARCHAR || '",' END
             || CASE WHEN doc_id % 5 = 2
                     THEN '"wordCount":"' || (doc_id % 900)::VARCHAR || '"'
                     ELSE '"wordCount":' || (doc_id % 900)::VARCHAR END
             || ',"inLanguage":"'
             || CASE WHEN doc_id % 11 = 6 THEN 'zz' ELSE lang END
             || '"}' AS a
      FROM documents)"""
    jt = """json_extract_string(jsonld, '$."@type"')"""
    return f"""
WITH b AS ({embedded_jsonld_sql(pages)})
SELECT doc_id, block_idx,
       CASE WHEN json_valid(jsonld) THEN {jt} END AS jtype,
       CASE
         WHEN NOT json_valid(jsonld) THEN false
         WHEN json_extract(jsonld, '$."@type"') IS NULL THEN false
         WHEN {jt} = 'Article' THEN
              json_extract(jsonld, '$.headline') IS NOT NULL
              AND json_type(jsonld, '$.headline') = 'VARCHAR'
              AND (json_extract(jsonld, '$.wordCount') IS NULL
                   OR (json_type(jsonld, '$.wordCount')
                         IN ('BIGINT', 'UBIGINT')
                       AND json_extract(jsonld, '$.wordCount')::BIGINT
                           >= 0))
              AND (json_extract(jsonld, '$.inLanguage') IS NULL
                   OR (json_type(jsonld, '$.inLanguage') = 'VARCHAR'
                       AND json_extract_string(jsonld, '$.inLanguage')
                           IN ('en', 'de', 'fr', 'es')))
         WHEN {jt} = 'Product' THEN
              json_extract(jsonld, '$.name') IS NOT NULL
              AND (json_extract(jsonld, '$.price') IS NULL
                   OR (json_type(jsonld, '$.price')
                         IN ('BIGINT', 'UBIGINT', 'DOUBLE')
                       AND json_extract(jsonld, '$.price')::DOUBLE >= 0))
         ELSE true
       END AS valid
FROM b"""


def q_recrawl_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-URL change-rate over a 4-snapshot crawl series (Cho &
    Garcia-Molina recrawl scheduling): urls skip snapshots on a mod-7
    lattice (missed fetches shrink n_obs, never fabricate changes) and
    content versions advance at per-url speeds (every snap / every 2nd /
    every 3rd) — ONE per-url lag window + ONE groupBy, all integer."""
    from jsonschema_spark.operators.urltools import recrawl_priority

    i = F.col("doc_id")
    base = _docs(spark, sf_dir).where(i < 150).select("doc_id")
    s = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("snap_id")
    obs = base.select("doc_id", s).where(
        (F.col("doc_id") + F.col("snap_id")) % 7 != 0)
    speed = (F.col("doc_id") % 3 + 1).cast("long")  # versions per 3 snaps
    ver = (F.col("snap_id") * speed / F.lit(3)).cast("long")
    rows = obs.select(
        F.concat(F.lit("https://h"), (F.col("doc_id") % 50).cast("string"),
                 F.lit(".example.org/p/"), F.col("doc_id").cast("string"))
        .alias("url"),
        F.col("snap_id").cast("long").alias("snap_id"),
        F.concat(F.lit("v"), ver.cast("string"), F.lit(":"),
                 F.col("doc_id").cast("string")).alias("sig"),
    )
    return recrawl_priority(rows)


def _recrawl_priority_sql() -> str:
    return """
WITH b AS (SELECT doc_id FROM documents WHERE doc_id < 150),
o AS (SELECT doc_id, s.snap_id
      FROM b, LATERAL (SELECT unnest(range(0, 4)) AS snap_id) s
      WHERE (doc_id + snap_id) % 7 <> 0),
r AS (SELECT
        'https://h' || (doc_id % 50)::VARCHAR || '.example.org/p/'
          || doc_id::VARCHAR AS url,
        snap_id::BIGINT AS snap_id,
        'v' || ((snap_id * (doc_id % 3 + 1)) // 3)::VARCHAR || ':'
          || doc_id::VARCHAR AS sig
      FROM o),
c AS (SELECT url, snap_id, sig,
             CASE WHEN lag(sig) OVER w IS NULL THEN 0
                  WHEN lag(sig) OVER w <> sig THEN 1 ELSE 0 END AS chg
      FROM r WINDOW w AS (PARTITION BY url ORDER BY snap_id)),
g AS (SELECT url, count(*)::BIGINT AS n_obs, sum(chg)::BIGINT AS n_changes,
             min(snap_id) AS first_snap, max(snap_id) AS last_snap,
             struct_extract(max({'s': snap_id, 'g': sig}), 'g') AS last_sig
      FROM c GROUP BY 1)
SELECT url, n_obs, n_changes,
       CASE WHEN n_obs >= 2
            THEN floor(n_changes * 1000000.0 / (n_obs - 1))::BIGINT END
         AS change_rate_ppm,
       first_snap, last_snap, last_sig
FROM g"""


def q_host_reciprocity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-link spam signal per host: one edge per doc on a
    quadratic-residue lattice (src h(i%40) → dst h((i²+1)%40)), so
    reciprocity emerges from number theory and both engines derive the
    identical edge set — ONE self-join on the composite key + ONE
    groupBy; output is host-table-sized."""
    from jsonschema_spark.operators.linkgraph import host_reciprocity

    i = F.col("doc_id")
    h = lambda c: F.concat(F.lit("h"), c.cast("string"),  # noqa: E731
                           F.lit(".example.org"))
    edges = _docs(spark, sf_dir).select(
        h(i % 40).alias("src_host"),
        h((i * i + 1) % 40).alias("dst_host"),
    ).where(F.col("src_host") != F.col("dst_host"))
    return host_reciprocity(edges)


def _host_reciprocity_sql() -> str:
    return """
WITH e AS (SELECT DISTINCT
             'h' || (doc_id % 40)::VARCHAR || '.example.org' AS s,
             'h' || ((doc_id * doc_id + 1) % 40)::VARCHAR
               || '.example.org' AS d
           FROM documents
           WHERE (doc_id % 40) <> ((doc_id * doc_id + 1) % 40)),
rc AS (SELECT e.s, count(*)::BIGINT AS n_recip
       FROM e WHERE EXISTS (SELECT 1 FROM e r
                            WHERE r.s = e.d AND r.d = e.s)
       GROUP BY 1),
o AS (SELECT s, count(*)::BIGINT AS n_out FROM e GROUP BY 1)
SELECT o.s AS host, n_out, coalesce(n_recip, 0) AS n_recip,
       floor(coalesce(n_recip, 0) * 1000000.0 / n_out)::BIGINT AS recip_ppm
FROM o LEFT JOIN rc ON o.s = rc.s"""


def q_embedding_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Johnson-Lindenstrauss ±1 projection 64→8 over the embeddings
    table — the ANN prefilter that cuts vector bytes before
    sign-LSH/IVF bucketing. Quantize-first integer arithmetic makes the
    Arrow numpy-matmul path, the JVM explode→groupBy path and the
    DuckDB mirror bit-identical (path equality test-pinned); exploded
    (vec_id, j, v) output attests every projected component."""
    from jsonschema_spark.operators.embed import embedding_project_df

    emb = spark.read.parquet(_t(sf_dir, "embeddings"))
    out = embedding_project_df(emb, "vec_id", "embedding", 64, 8)
    return out.select(
        "vec_id", F.posexplode("proj").alias("j", "v")
    ).select("vec_id", F.col("j").cast("long").alias("j"), "v")


def _embedding_project_sql() -> str:
    sign = ("CASE WHEN " + _h56("'proj:'||(i)::VARCHAR||':'||j::VARCHAR")
            + " % 2 = 0 THEN 1 ELSE -1 END")
    return f"""
WITH q AS (SELECT vec_id, ix.i - 1 AS i,
                  floor(embedding[ix.i]::DOUBLE * 100)::BIGINT AS qv
           FROM embeddings,
                LATERAL (SELECT unnest(range(1, len(embedding) + 1)) AS i)
                  ix),
x AS (SELECT vec_id, i, qv, jj.j
      FROM q, LATERAL (SELECT unnest(range(0, 8)) AS j) jj)
SELECT vec_id, j::BIGINT AS j, sum(qv * {sign})::BIGINT AS v
FROM x GROUP BY 1, 2"""


_EPOCH_B, _EPOCH_E = 420_000, 3


def q_epoch_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-repetition planning under a token budget (Muennighoff
    data-constrained scaling): equal share per source, capped at
    max_epochs repetitions, capped groups' leftover waterfalls to the
    rest — exact integer waterfilling via the sorted-capacity closed
    form over the G-row source table (bounded windows only)."""
    from jsonschema_spark.operators.curate import epoch_plan

    return epoch_plan(_docs(spark, sf_dir), "source", "n_chars",
                      token_budget=_EPOCH_B, max_epochs=_EPOCH_E)


def _epoch_plan_sql() -> str:
    B, E = _EPOCH_B, _EPOCH_E
    return f"""
WITH g AS (SELECT source AS grp, sum(n_chars)::BIGINT AS n
           FROM documents GROUP BY 1),
r AS (SELECT grp, n, (n * {E})::BIGINT AS cap,
             row_number() OVER w AS k,
             sum(n * {E}) OVER (w ROWS UNBOUNDED PRECEDING)::BIGINT AS cum,
             count(*) OVER ()::BIGINT AS ng
      FROM g WINDOW w AS (ORDER BY n * {E}, grp)),
c AS (SELECT *, (cum - cap) + cap * (ng - k + 1) <= {B} AS capped FROM r),
t AS (SELECT sum(CASE WHEN capped THEN cap ELSE 0 END)::BIGINT AS capsum,
             sum(CASE WHEN capped THEN 0 ELSE 1 END)::BIGINT AS nfree
      FROM c)
SELECT grp AS source, n AS n_tokens, cap AS cap_tokens,
       CASE WHEN capped THEN cap
            ELSE least(({B} - capsum) // greatest(nfree, 1), cap)
       END AS alloc_tokens,
       (CASE WHEN capped THEN cap
             ELSE least(({B} - capsum) // greatest(nfree, 1), cap)
        END * 1000) // n AS epochs_milli,
       capped
FROM c, t"""


def q_wet_export(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WET export — the engine WRITES the Common-Crawl extracted-text
    exchange format it ingests: crawl-chrome-wrapped docs → html→text
    extraction → WET conversion records (Content-Length in BYTES —
    a planted é on doc_id%4==1 keeps chars≠bytes honest), then each
    record is re-parsed IN SPARK by the exact byte-walk warc_records
    parser and roundtrip_ok attests payload/uri/length equality row by
    row. Serialization is pure codegen concat; the oracle rebuilds the
    identical record string (strlen == octet_length) and asserts the
    round-trip bound as literal true."""
    from jsonschema_spark.operators.dedup import hash56
    from jsonschema_spark.operators.htmltext import html_text_df
    from jsonschema_spark.sources.warc import warc_records, wet_serialize_df

    d = _docs(spark, sf_dir)
    i = F.col("doc_id")
    ids = i.cast("string")
    p = _HTML_P
    text2 = F.when(i % 4 == 1, F.concat(F.col("text"), F.lit(" café")))\
        .otherwise(F.col("text"))
    html = F.encode(
        F.concat(F.lit(p[0]), ids, F.lit(p[1]), ids, F.lit(p[2]), ids,
                 F.lit(p[3]), ids, F.lit(p[4]), text2, F.lit(p[5])),
        "UTF-8")
    ext = html_text_df(d.select("doc_id", html.alias("html")))
    uri = F.concat(F.lit("https://h"), (i % 50).cast("string"),
                   F.lit(".example.org/p/"), ids)
    wet = wet_serialize_df(
        ext.select("doc_id", uri.alias("uri"),
                   F.col("text_extracted").alias("text")),
        "doc_id", "uri", "text")
    back = warc_records(
        wet.select(F.col("doc_id").alias("file_id"),
                   F.col("wet").alias("warc")), exact=True)
    j = wet.join(
        back.select(F.col("file_id").alias("doc_id"), "warc_type",
                    "target_uri", "content_length", "payload"),
        "doc_id")
    ok = ((F.col("warc_type") == "conversion")
          & (F.col("content_length") == F.col("n_payload_bytes"))
          & (F.col("payload") == F.regexp_extract(
              F.col("wet"), r"(?s)\r\n\r\n(.*)\r\n\r\n$", 1)))
    return j.select(
        "doc_id", "n_payload_bytes",
        hash56(F.col("wet")).alias("wet_h56"),
        ok.alias("roundtrip_ok"),
    )


def _wet_export_sql() -> str:
    from jsonschema_spark.operators.htmltext import html_text_sql

    p = _HTML_P
    build = (
        f"'{p[0]}' || i || '{p[1]}' || i || '{p[2]}' || i || "
        f"'{p[3]}' || i || '{p[4]}' || text2 || '{p[5]}'"
    )
    crlf = "chr(13) || chr(10)"
    return f"""
WITH h AS (SELECT doc_id, {build} AS html
           FROM (SELECT doc_id, doc_id::VARCHAR AS i,
                        CASE WHEN doc_id % 4 = 1 THEN text || ' café'
                             ELSE text END AS text2
                 FROM documents WHERE text IS NOT NULL)),
e AS (SELECT doc_id, coalesce({html_text_sql('html')}, '') AS t FROM h),
w AS (SELECT doc_id, strlen(t)::BIGINT AS n_payload_bytes,
             'WARC/1.0' || {crlf} || 'WARC-Type: conversion' || {crlf}
             || 'WARC-Target-URI: https://h' || (doc_id % 50)::VARCHAR
             || '.example.org/p/' || doc_id::VARCHAR || {crlf}
             || 'Content-Type: text/plain' || {crlf}
             || 'Content-Length: ' || strlen(t)::VARCHAR
             || {crlf} || {crlf} || t || {crlf} || {crlf} AS wet
      FROM e)
SELECT doc_id, n_payload_bytes, {_h56('wet')} AS wet_h56,
       true AS roundtrip_ok
FROM w"""


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: violation rows (reference short-circuit semantics) for the
    documents table at sf0.001."""
    df = _docs(spark, "/root/testdata/sf0.001")
    return violations(df, DOCS_SCHEMA, id_cols=["doc_id"])


def q_homoglyph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Homoglyph-spam accounting (UTS #39 confusable subset): Cyrillic
    а planted into every 5th doc and Cyrillic о into every 7th — the
    engine counts confusables, flags latin+confusable MIXED tokens (the
    phishing-lure signature) and emits the skeleton hash that catches
    disguised duplicates byte-level dedup misses. Pure codegen scan;
    oracle replays the same plant + translate + regex in DuckDB."""
    from jsonschema_spark.operators.textstats import homoglyph_stats_df

    d = _docs(spark, sf_dir)
    t = F.col("text")
    t = F.when(F.col("doc_id") % 5 == 0,
               F.regexp_replace(t, "a", "а")).otherwise(t)
    t = F.when(F.col("doc_id") % 7 == 0,
               F.regexp_replace(t, "o", "о")).otherwise(t)
    return homoglyph_stats_df(d.select("doc_id", t.alias("text")),
                              "doc_id", "text")


def _homoglyph_sql() -> str:
    from jsonschema_spark.operators.textstats import (CONFUSABLE_FROM,
                                                      CONFUSABLE_TO)

    cf = CONFUSABLE_FROM
    mixed_re = (f"[^ \\t\\n]*(?:[a-z][^ \\t\\n]*[{cf}]"
                f"|[{cf}][^ \\t\\n]*[a-z])[^ \\t\\n]*")
    return f"""
WITH p AS (SELECT doc_id,
    CASE WHEN doc_id % 5 = 0 THEN replace(text, 'a', 'а')
         ELSE text END AS t0 FROM documents),
p2 AS (SELECT doc_id,
    CASE WHEN doc_id % 7 = 0 THEN replace(t0, 'o', 'о')
         ELSE t0 END AS t FROM p),
l AS (SELECT doc_id, lower(t) AS low FROM p2)
SELECT doc_id,
  (length(low) - length(translate(low, '{cf}', '')))::BIGINT
    AS n_confusables,
  len(regexp_extract_all(low, '{mixed_re}'))::BIGINT AS n_mixed_tokens,
  {_h56(f"translate(low, '{cf}', '{CONFUSABLE_TO}')")} AS skeleton_hash
FROM l"""


def q_mixed_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-LINE language ID rolled up to a code-switching profile (the
    CCNet per-paragraph practice): marker lines in fr/de/en and an
    unknown line planted on doc_id mod classes so documents genuinely
    code-switch; the engine reports line counts, distinct languages,
    the dominant language + its ppm share and the `mixed` routing flag.
    Oracle replays the identical plant, per-line argmax (ascending
    tie-break) and struct-argmin dominant in DuckDB."""
    from jsonschema_spark.operators.textstats import mixed_lang_stats

    d = _docs(spark, sf_dir)
    t = F.col("text")
    t = F.when(F.col("doc_id") % 3 == 0,
               F.concat(t, F.lit("\nle chat et les des la"))).otherwise(t)
    t = F.when(F.col("doc_id") % 4 == 0,
               F.concat(t, F.lit("\nder und das nicht ist hier"))).otherwise(t)
    t = F.when(F.col("doc_id") % 5 == 0,
               F.concat(t, F.lit("\nthe and of it is fine"))).otherwise(t)
    t = F.when(F.col("doc_id") % 7 == 0,
               F.concat(t, F.lit("\n\nzzz qqq rrr"))).otherwise(t)
    out = mixed_lang_stats(d.select("doc_id", t.alias("text")),
                           "doc_id", "text")
    return out.withColumn("mixed", F.col("mixed").cast("int"))


def _mixed_lang_sql() -> str:
    from jsonschema_spark.operators.textstats import LANG_MARKERS

    scores = {
        lang: ("len(list_filter(ltoks, x -> x IN ("
               + ", ".join(repr(w) for w in ws) + ")))")
        for lang, ws in LANG_MARKERS.items()
    }
    ordered = sorted(scores)
    best = f"greatest({', '.join(scores[lg] for lg in ordered)})"
    pred = ("CASE WHEN " + best + " = 0 THEN NULL " + " ".join(
        f"WHEN {scores[lg]} = {best} THEN '{lg}'" for lg in ordered
    ) + " END")
    nl = "chr(10)"
    return f"""
WITH p AS (SELECT doc_id,
    CASE WHEN doc_id % 3 = 0
         THEN text || {nl} || 'le chat et les des la' ELSE text END AS t0
  FROM documents),
p2 AS (SELECT doc_id, CASE WHEN doc_id % 4 = 0
    THEN t0 || {nl} || 'der und das nicht ist hier' ELSE t0 END AS t1 FROM p),
p3 AS (SELECT doc_id, CASE WHEN doc_id % 5 = 0
    THEN t1 || {nl} || 'the and of it is fine' ELSE t1 END AS t2 FROM p2),
p4 AS (SELECT doc_id, CASE WHEN doc_id % 7 = 0
    THEN t2 || {nl} || {nl} || 'zzz qqq rrr' ELSE t2 END AS t FROM p3),
ln AS (SELECT doc_id, line FROM p4,
         LATERAL (SELECT unnest(string_split(t, {nl})) AS line) lx
       WHERE trim(line) <> ''),
sc AS (SELECT doc_id, {pred} AS lang
       FROM (SELECT doc_id,
               string_split_regex(trim(lower(line)), '\\s+') AS ltoks
             FROM ln)),
g1 AS (SELECT doc_id, lang, count(*)::BIGINT AS cnt
       FROM sc GROUP BY 1, 2),
g2 AS (SELECT doc_id,
         sum(cnt)::BIGINT AS n_lines,
         coalesce(sum(CASE WHEN lang IS NULL THEN cnt END), 0)::BIGINT
           AS n_unknown_lines,
         count(CASE WHEN lang IS NOT NULL THEN 1 END)::BIGINT AS n_langs,
         min(CASE WHEN lang IS NOT NULL
                  THEN {{'nc': -cnt, 'lg': lang}} END) AS dom
       FROM g1 GROUP BY 1),
g3 AS (SELECT doc_id, n_lines, n_unknown_lines, n_langs,
         dom.lg AS dominant_lang,
         CASE WHEN n_lines - n_unknown_lines > 0
              THEN floor(((-dom.nc) * 1000000)::DOUBLE
                         / (n_lines - n_unknown_lines))::BIGINT
         END AS dominant_ppm
       FROM g2)
SELECT d.doc_id,
       coalesce(n_lines, 0) AS n_lines,
       coalesce(n_unknown_lines, 0) AS n_unknown_lines,
       coalesce(n_langs, 0) AS n_langs,
       dominant_lang, dominant_ppm,
       coalesce(n_langs >= 2 AND dominant_ppm < 900000, false)::INT
         AS mixed
FROM (SELECT DISTINCT doc_id FROM documents) d
LEFT JOIN g3 ON d.doc_id = g3.doc_id"""


_DQ_BOILER = "the shared boilerplate page of this crawl and more and more"


def q_domain_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Domain-level quality prior (FineWeb wholesale-domain practice)
    over the messy-url corpus with exact-duplicate boilerplate planted
    on doc_id%31==7 so dup_ppm is non-trivial: per PSL registered
    domain — doc count, token mass, Gopher-keep share, corpus-dup
    share and the keep/review/drop route."""
    from jsonschema_spark.operators.curate import domain_quality_df

    c = F.col("doc_id")
    t = F.when(c % 31 == 7, F.lit(_DQ_BOILER)).otherwise(F.col("text"))
    d = _docs(spark, sf_dir).select("doc_id", "source", t.alias("text")) \
        .withColumn("url", _messy_url())
    return domain_quality_df(d, "url", "text", min_words=10,
                             max_words=100000, min_stopwords=1)


def _domain_quality_sql() -> str:
    from jsonschema_spark.operators.urltools import _URL_RE

    wt = _WEBTEXT_SQL.replace("FROM documents", "FROM pdocs")
    kppm = "floor((k * 1000000)::DOUBLE / n_docs)"
    return f"""WITH {_psl_sql_ctes()},
pdocs AS (SELECT doc_id, source,
            CASE WHEN doc_id % 31 = 7 THEN '{_DQ_BOILER}'
                 ELSE text END AS text
          FROM documents),
wt AS ({wt}),
m AS (SELECT doc_id, {_MESSY_URL_SQL} AS url FROM pdocs),
hs AS (SELECT doc_id, host, string_split(host, '.') AS ls
       FROM (SELECT doc_id,
               lower(regexp_extract(url, '{_URL_RE}', 2)) AS host
             FROM m)),
rd AS (SELECT doc_id, {_psl_reg_sql(want='reg')} AS reg_domain FROM hs),
hh AS (SELECT doc_id, {_h56('text')} AS h FROM pdocs
       WHERE text IS NOT NULL),
dc AS (SELECT h, count(*) AS c FROM hh GROUP BY 1),
per AS (SELECT rd.reg_domain, wt.keep, wt.n_words, (dc.c > 1)::INT AS dup
        FROM hh JOIN dc USING (h) JOIN rd USING (doc_id)
        JOIN wt USING (doc_id)),
g AS (SELECT reg_domain, count(*)::BIGINT AS n_docs,
        sum(keep)::BIGINT AS k, sum(dup)::BIGINT AS d,
        sum(n_words)::BIGINT AS n_tokens
      FROM per GROUP BY 1)
SELECT reg_domain, n_docs, n_tokens,
  floor((n_tokens * 1000)::DOUBLE / n_docs)::BIGINT AS mean_tokens_milli,
  {kppm}::BIGINT AS keep_ppm,
  floor((d * 1000000)::DOUBLE / n_docs)::BIGINT AS dup_ppm,
  CASE WHEN {kppm} >= 500000 THEN 'keep'
       WHEN {kppm} >= 200000 THEN 'review'
       ELSE 'drop' END AS route
FROM g"""


_OPEN_BOUND = 1 << 62


def q_check_suite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deequ-style declarative table contract over orders: size,
    completeness, PK distinctness, cardinality, value domain, format
    rate, bounds and scaled mean — ALL algebraic metrics in one
    aggregation pass (one scan, map-side partials), the two exact
    count-distincts fused via Spark's Expand in the same agg."""
    from jsonschema_spark.operators.checks import check_suite

    o = spark.read.parquet(_t(sf_dir, "orders"))
    return check_suite(o, [
        {"name": "size", "check": "size_min", "min": 1000},
        {"name": "orderdate_complete", "check": "completeness",
         "col": "o_orderdate", "min_ppm": 1_000_000},
        {"name": "orderkey_pk", "check": "distinctness",
         "col": "o_orderkey", "min_ppm": 1_000_000},
        {"name": "custkey_card", "check": "distinctness",
         "col": "o_custkey", "min_ppm": 500_000},
        {"name": "status_domain", "check": "contained_ppm",
         "col": "o_orderstatus", "allowed": ["O", "F", "P"],
         "min_ppm": 1_000_000},
        {"name": "priority_format", "check": "match_ppm",
         "col": "o_orderpriority", "pattern": "^[1-5]-[A-Z ]+$",
         "min_ppm": 1_000_000},
        {"name": "price_min", "check": "min_ge",
         "col": "o_totalprice", "scale": 100, "ge": 0},
        {"name": "price_mean", "check": "mean_scaled_between",
         "col": "o_totalprice", "scale": 100,
         "lo": 1_000_000, "hi": 50_000_000},
        # the crawl-scale PK check: HLL estimate instead of the exact
        # Expand distinct (±2 % at p=12, hence the 900k floor)
        {"name": "orderkey_uniq_approx", "check": "distinctness_approx",
         "col": "o_orderkey", "min_ppm": 900_000, "p": 12},
        # composite cardinality via the canonical row-hash rendering
        {"name": "status_priority_card", "check": "distinctness",
         "cols": ["o_orderstatus", "o_orderpriority"], "min_ppm": 1},
    ])


def _check_suite_sql() -> str:
    from jsonschema_spark.operators.stats import hll_alpha

    open_b = _OPEN_BOUND
    ppm = "floor(({n} * 1000000)::DOUBLE / {d})::BIGINT"

    def row(name, ctype, col, metric, lo, hi, from_="a"):
        return (f"SELECT '{name}' AS check_name, '{ctype}' AS "
                f"check_type, '{col}' AS col_name, {metric} AS metric, "
                f"{lo}::BIGINT AS lo, {hi}::BIGINT AS hi, "
                f"CASE WHEN {metric} >= {lo} AND {metric} <= {hi} "
                f"THEN 'pass' ELSE 'fail' END AS status FROM {from_}")

    rows = [
        row("size", "size_min", "", "n_rows", 1000, open_b),
        row("orderdate_complete", "completeness", "o_orderdate",
            ppm.format(n="nn_date", d="n_rows"), 1_000_000, 1_000_000),
        row("orderkey_pk", "distinctness", "o_orderkey",
            ppm.format(n="nd_ok", d="n_rows"), 1_000_000, 1_000_000),
        row("custkey_card", "distinctness", "o_custkey",
            ppm.format(n="nd_ck", d="n_rows"), 500_000, 1_000_000),
        row("status_domain", "contained_ppm", "o_orderstatus",
            ppm.format(n="in_st", d="nn_st"), 1_000_000, 1_000_000),
        row("priority_format", "match_ppm", "o_orderpriority",
            ppm.format(n="rx_pr", d="nn_pr"), 1_000_000, 1_000_000),
        row("price_min", "min_ge", "o_totalprice", "mn_tp",
            0, open_b),
        row("price_mean", "mean_scaled_between", "o_totalprice",
            "floor(sq_tp::DOUBLE / nn_tp)::BIGINT",
            1_000_000, 50_000_000),
        row("orderkey_uniq_approx", "distinctness_approx",
            "o_orderkey",
            "floor((est_milli * 1000)::DOUBLE / n_rows)::BIGINT",
            900_000, open_b, from_="a, hest"),
        row("status_priority_card", "distinctness",
            "o_orderstatus,o_orderpriority",
            ppm.format(n="nd_sp", d="n_rows"), 1, 1_000_000),
    ]
    union = "\nUNION ALL\n".join(rows)
    p_hll, w = 12, 44
    m = 2 ** p_hll
    alpha = hll_alpha(p_hll)
    pow_lit = float(2 ** (2 * p_hll + w + 1))
    hll_ctes = f""",
hh AS (SELECT ('0x' || substr(md5(o_orderkey::VARCHAR), 1, 14))::BIGINT
         AS hv FROM orders WHERE o_orderkey IS NOT NULL),
hb AS (SELECT hv % {m} AS bucket, hv // {m} AS rem FROM hh),
hsk AS (SELECT bucket, MAX(CASE WHEN rem = 0 THEN {w + 1}
                ELSE {w} - length(bin(rem)) + 1 END) AS max_rank
        FROM hb GROUP BY 1),
hagg AS (SELECT count(*) AS nb,
           coalesce(sum((CAST(1 AS BIGINT) << ({w + 1} - max_rank))), 0)
             AS s_used
         FROM hsk),
hest AS (SELECT CAST(FLOOR({alpha!r} * {pow_lit!r}
           / CAST(s_used + ({m} - nb) * {2 ** (w + 1)} AS DOUBLE)
           * 1000.0) AS BIGINT) AS est_milli
         FROM hagg)"""
    return f"""WITH a AS (SELECT
  count(*)::BIGINT AS n_rows,
  count(o_orderdate)::BIGINT AS nn_date,
  count(DISTINCT o_orderkey)::BIGINT AS nd_ok,
  count(DISTINCT o_custkey)::BIGINT AS nd_ck,
  count(o_orderstatus)::BIGINT AS nn_st,
  sum((o_orderstatus IN ('O','F','P'))::INT)::BIGINT AS in_st,
  count(o_orderpriority)::BIGINT AS nn_pr,
  sum(regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$')::INT)::BIGINT
    AS rx_pr,
  min(floor(o_totalprice * 100.0))::BIGINT AS mn_tp,
  sum(floor(o_totalprice * 100.0)::BIGINT)::BIGINT AS sq_tp,
  count(o_totalprice)::BIGINT AS nn_tp,
  count(DISTINCT ('0x' || substr(md5(
      coalesce(o_orderstatus, '<NULL>') || chr(1)
      || coalesce(o_orderpriority, '<NULL>')), 1, 14))::BIGINT)
    ::BIGINT AS nd_sp
FROM orders){hll_ctes}
{union}"""


def q_check_suite_by(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME declarative contract evaluated PER PARTITION — the
    per-language / per-shard / per-day verdict form: check_suite with
    by=['o_orderstatus'] runs the whole suite once per status in ONE
    scan (the groupBy collapses map-side; the exchange moves
    n_groups x n_metrics values), group key prefixed to every check
    row. The question a curator actually asks is not "does the table
    pass" but "WHICH slice broke"."""
    from jsonschema_spark.operators.checks import check_suite

    o = spark.read.parquet(_t(sf_dir, "orders"))
    return check_suite(o, [
        {"name": "size", "check": "size_min", "min": 100},
        {"name": "orderdate_complete", "check": "completeness",
         "col": "o_orderdate", "min_ppm": 1_000_000},
        {"name": "custkey_card", "check": "distinctness",
         "col": "o_custkey", "min_ppm": 500_000},
        {"name": "priority_format", "check": "match_ppm",
         "col": "o_orderpriority", "pattern": "^[1-5]-[A-Z ]+$",
         "min_ppm": 1_000_000},
        {"name": "price_mean", "check": "mean_scaled_between",
         "col": "o_totalprice", "scale": 100,
         "lo": 1_000_000, "hi": 50_000_000},
    ], by=["o_orderstatus"])


def _check_suite_by_sql() -> str:
    open_b = _OPEN_BOUND
    ppm = "floor(({n} * 1000000)::DOUBLE / {d})::BIGINT"

    def row(name, ctype, col, metric, lo, hi):
        return (f"SELECT o_orderstatus, '{name}' AS check_name, "
                f"'{ctype}' AS check_type, '{col}' AS col_name, "
                f"{metric} AS metric, "
                f"{lo}::BIGINT AS lo, {hi}::BIGINT AS hi, "
                f"CASE WHEN {metric} >= {lo} AND {metric} <= {hi} "
                f"THEN 'pass' ELSE 'fail' END AS status FROM a")

    rows = [
        row("size", "size_min", "", "n_rows", 100, open_b),
        row("orderdate_complete", "completeness", "o_orderdate",
            ppm.format(n="nn_date", d="n_rows"), 1_000_000, 1_000_000),
        row("custkey_card", "distinctness", "o_custkey",
            ppm.format(n="nd_ck", d="n_rows"), 500_000, 1_000_000),
        row("priority_format", "match_ppm", "o_orderpriority",
            ppm.format(n="rx_pr", d="nn_pr"), 1_000_000, 1_000_000),
        row("price_mean", "mean_scaled_between", "o_totalprice",
            "floor(sq_tp::DOUBLE / nn_tp)::BIGINT",
            1_000_000, 50_000_000),
    ]
    union = "\nUNION ALL\n".join(rows)
    return f"""WITH a AS (SELECT o_orderstatus,
  count(*)::BIGINT AS n_rows,
  count(o_orderdate)::BIGINT AS nn_date,
  count(DISTINCT o_custkey)::BIGINT AS nd_ck,
  count(o_orderpriority)::BIGINT AS nn_pr,
  sum(regexp_matches(o_orderpriority, '^[1-5]-[A-Z ]+$')::INT)::BIGINT
    AS rx_pr,
  sum(floor(o_totalprice * 100.0)::BIGINT)::BIGINT AS sq_tp,
  count(o_totalprice)::BIGINT AS nn_tp
FROM orders GROUP BY 1)
{union}"""


_TS_US = "yyyy-MM-dd HH:mm:ss.SSSSSS"


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (the brief's canonical missing-in-Spark operator):
    every purchase event matched to the same user's LATEST prior
    click within a 1-hour tolerance — union-sort formulation, one
    exchange on user_id + one per-key sort, zero candidate blow-up
    (vs the |L|x|R|-per-key theta join a naive range join plans). The
    DuckDB oracle replays it with a native ASOF LEFT JOIN, so the
    semantics (inclusive equality, left-join shape, tolerance
    nulling) are attested against an independent implementation."""
    from jsonschema_spark.operators.temporal import asof_join

    ev = spark.read.parquet(_t(sf_dir, "events"))
    left = ev.where(F.col("event_type") == "purchase") \
        .select("user_id", "ts", "event_id")
    right = ev.where(F.col("event_type") == "click") \
        .select("user_id", "ts", F.col("event_id").alias("click_id"))
    out = asof_join(left, right, "user_id", "ts", "ts", ["click_id"],
                    tolerance_s=3600)
    return out.select(
        "user_id", "event_id",
        F.date_format("ts", _TS_US).alias("ts"),
        F.date_format("asof_ts", _TS_US).alias("asof_ts"),
        "asof_gap_us", "click_id")


_ASOF_JOIN_SQL = """
WITH l AS (SELECT user_id, ts, event_id FROM events
           WHERE event_type = 'purchase'),
     r AS (SELECT user_id, ts AS rts, event_id AS click_id FROM events
           WHERE event_type = 'click')
SELECT l.user_id, l.event_id,
       strftime(l.ts, '%Y-%m-%d %H:%M:%S.%f') AS ts,
       CASE WHEN epoch_us(l.ts) - epoch_us(rts) <= 3600000000
            THEN strftime(rts, '%Y-%m-%d %H:%M:%S.%f') END AS asof_ts,
       CASE WHEN epoch_us(l.ts) - epoch_us(rts) <= 3600000000
            THEN epoch_us(l.ts) - epoch_us(rts) END::BIGINT
         AS asof_gap_us,
       CASE WHEN epoch_us(l.ts) - epoch_us(rts) <= 3600000000
            THEN click_id END AS click_id
FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.rts
"""


def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered-funnel conversion signup→view→click→purchase over a
    deterministic 2/7 event sample (the sparsity that gives the
    funnel a real gradient: 147→133→113→85 users at sf0.01). The
    Spark plan is ONE exchange (per-user sorted-array fold, greedy
    earliest-feasible cursor); the oracle replays the equivalent
    k-pass min-after-previous chain — the two being equal IS the
    greedy-equals-iterative proof, attested on data."""
    from jsonschema_spark.operators.temporal import funnel

    ev = spark.read.parquet(_t(sf_dir, "events")) \
        .where(F.col("event_id") % 7 < 2)
    return funnel(ev, "user_id", "ts", "event_type",
                  ["signup", "view", "click", "purchase"])


_FUNNEL_SQL = """
WITH ev AS MATERIALIZED (SELECT user_id, ts, event_type FROM events
    WHERE event_id % 7 < 2),
s1 AS MATERIALIZED (SELECT user_id, min(ts) AS t FROM ev
    WHERE event_type = 'signup' GROUP BY 1),
s2 AS MATERIALIZED (SELECT e.user_id, min(e.ts) AS t FROM ev e
    JOIN s1 ON e.user_id = s1.user_id
    WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY 1),
s3 AS MATERIALIZED (SELECT e.user_id, min(e.ts) AS t FROM ev e
    JOIN s2 ON e.user_id = s2.user_id
    WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY 1),
s4 AS MATERIALIZED (SELECT e.user_id, min(e.ts) AS t FROM ev e
    JOIN s3 ON e.user_id = s3.user_id
    WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY 1),
c AS (SELECT (SELECT count(*) FROM s1)::BIGINT AS n1,
             (SELECT count(*) FROM s2)::BIGINT AS n2,
             (SELECT count(*) FROM s3)::BIGINT AS n3,
             (SELECT count(*) FROM s4)::BIGINT AS n4)
SELECT 1::BIGINT AS step, 'signup' AS step_type, n1 AS n_users,
  CASE WHEN n1 > 0 THEN floor((n1 * 1000000)::DOUBLE / n1)::BIGINT END
    AS conversion_ppm FROM c
UNION ALL SELECT 2, 'view', n2,
  CASE WHEN n1 > 0 THEN floor((n2 * 1000000)::DOUBLE / n1)::BIGINT END
  FROM c
UNION ALL SELECT 3, 'click', n3,
  CASE WHEN n1 > 0 THEN floor((n3 * 1000000)::DOUBLE / n1)::BIGINT END
  FROM c
UNION ALL SELECT 4, 'purchase', n4,
  CASE WHEN n1 > 0 THEN floor((n4 * 1000000)::DOUBLE / n1)::BIGINT END
  FROM c
"""


def q_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention over a deterministic 1/11 event sample
    (sparse enough that first-seen weeks spread across 4 cohorts at
    sf0.01): users cohorted by first-event week, activity counted per
    week offset, retention ppm vs cohort size. Join-free
    single-exchange plan — per-user (first_week, week-set) collapses
    in one groupBy; the set is bounded by the calendar."""
    from jsonschema_spark.operators.temporal import cohort_retention

    ev = spark.read.parquet(_t(sf_dir, "events")) \
        .where(F.col("event_id") % 11 == 0)
    return cohort_retention(ev, "user_id", "ts", period="week")


_COHORT_RETENTION_SQL = """
WITH ev AS MATERIALIZED (
  SELECT user_id, date_trunc('week', ts) AS p FROM events
  WHERE event_id % 11 = 0 AND user_id IS NOT NULL AND ts IS NOT NULL),
f AS (SELECT user_id, min(p) AS c FROM ev GROUP BY 1),
a AS (SELECT DISTINCT e.user_id, f.c, e.p
      FROM ev e JOIN f ON e.user_id = f.user_id),
g AS (SELECT strftime(c, '%Y-%m-%d') AS cohort,
             (date_diff('day', c, p) // 7)::BIGINT AS "offset",
             count(DISTINCT user_id)::BIGINT AS n_users
      FROM a GROUP BY 1, 2),
w AS (SELECT *, max(CASE WHEN "offset" = 0 THEN n_users END)
        OVER (PARTITION BY cohort) AS cu FROM g)
SELECT cohort, "offset", n_users, cu::BIGINT AS cohort_users,
       floor((n_users * 1000000)::DOUBLE / cu)::BIGINT
         AS retention_ppm
FROM w
"""


def q_chi2_lang_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence + Cramér's V between documents.lang and
    documents.source — the categorical-association check ("is the
    language mix the same across sources?"). ONE corpus exchange
    (pair-key groupBy); margins, the full cell spine (zero-observed
    cells contribute expected mass) and the per-cell-floored integer
    chi2 fold all run on the tiny grouped table."""
    from jsonschema_spark.operators.stats import contingency_chi2

    return contingency_chi2(
        spark.read.parquet(_t(sf_dir, "documents")), "lang", "source")


_CHI2_LANG_SOURCE_SQL = """
WITH g AS (SELECT coalesce(lang::VARCHAR, '<NULL>') AS a,
                  coalesce(source::VARCHAR, '<NULL>') AS b,
                  count(*)::BIGINT AS c
           FROM documents GROUP BY 1, 2),
ga AS (SELECT a, sum(c)::BIGINT AS rt FROM g GROUP BY 1),
gb AS (SELECT b, sum(c)::BIGINT AS ct FROM g GROUP BY 1),
tot AS (SELECT sum(c)::BIGINT AS n FROM g),
cells AS (SELECT ga.a, gb.b, rt, ct, coalesce(g.c, 0)::BIGINT AS obs
          FROM ga CROSS JOIN gb
          LEFT JOIN g ON g.a = ga.a AND g.b = gb.b),
ce AS (SELECT cells.*, n,
              (obs::DOUBLE * n - rt::DOUBLE * ct) AS d
       FROM cells, tot),
agg AS (SELECT max(n)::BIGINT AS n_rows,
               count(DISTINCT a)::BIGINT AS n_a,
               count(DISTINCT b)::BIGINT AS n_b,
               sum(floor(d * d * 1000000.0
                         / (rt::DOUBLE * ct * n))::BIGINT)::BIGINT
                 AS chi2_ppm
        FROM ce)
SELECT n_rows, n_a, n_b, ((n_a - 1) * (n_b - 1))::BIGINT AS dof,
       chi2_ppm,
       CASE WHEN least(n_a - 1, n_b - 1) > 0 THEN
         floor(sqrt(chi2_ppm::DOUBLE
                    / (n_rows::DOUBLE * least(n_a - 1, n_b - 1)
                       * 1000000.0)) * 1000.0)::BIGINT END
         AS cramers_v_milli
FROM agg
"""


def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    streams ("after an error, what happens next?"): one partitioned
    lead() window + one groupBy bounded by |type-domain|²; row
    normalization runs over the tiny matrix, never the corpus."""
    from jsonschema_spark.operators.temporal import markov_transitions

    ev = spark.read.parquet(_t(sf_dir, "events"))
    return markov_transitions(ev, "user_id", "ts", "event_type",
                              id_col="event_id")


_EVENT_TRANSITIONS_SQL = """
WITH ev AS (SELECT user_id, ts, event_id, event_type FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL
              AND event_type IS NOT NULL),
s AS (SELECT event_type AS src,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS dst
      FROM ev),
p AS (SELECT src, dst, count(*)::BIGINT AS n_pairs FROM s
      WHERE dst IS NOT NULL GROUP BY 1, 2)
SELECT src, dst, n_pairs,
       floor((n_pairs * 1000000)::DOUBLE
             / sum(n_pairs) OVER (PARTITION BY src))::BIGINT AS row_ppm
FROM p
"""


_TYPOSQUAT_TRUSTED = ("example.com", "google.com", "paypal.com",
                      "amazon.com", "wikipedia.org")


def q_typosquat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typosquat detection via FastSS deletion-1 neighborhoods:
    deterministic squats planted over the documents spine (per doc:
    pick a trusted host, delete or insert at a rotating position),
    then the blocking join — explode both sides into deletion
    variants, equi-join, exact levenshtein==1 confirm, anti-join
    the trusted list. Never all-pairs; the oracle IS all-pairs
    (5-host trusted side), so the blocking's completeness is attested
    against brute force on real volume."""
    from jsonschema_spark.operators.urltools import typosquat_pairs

    d = spark.read.parquet(_t(sf_dir, "documents"))
    i = F.col("doc_id")
    base = F.element_at(
        F.array(*[F.lit(t) for t in _TYPOSQUAT_TRUSTED]),
        (i % 5 + 1).cast("int"))
    p = i % 9 + 1
    m = i % 3
    host = (
        F.when(m == 1, F.concat(base.substr(F.lit(1), p - 1),
                                base.substr(p + 1, F.length(base))))
        .when(m == 2, F.concat(base.substr(F.lit(1), p), F.lit("x"),
                               base.substr(p + 1, F.length(base))))
        .otherwise(base))
    cands = d.select(host.alias("host"))
    trusted = spark.createDataFrame(
        [(t,) for t in _TYPOSQUAT_TRUSTED], "h string")
    return typosquat_pairs(cands, "host", trusted, "h")


def _typosquat_sql() -> str:
    vals = ", ".join(f"('{t}')" for t in _TYPOSQUAT_TRUSTED)
    arr = ", ".join(f"'{t}'" for t in _TYPOSQUAT_TRUSTED)
    return f"""
WITH tr(h) AS (VALUES {vals}),
c AS (SELECT [{arr}][(doc_id % 5 + 1)::INT] AS base,
             (doc_id % 9 + 1)::INT AS p, (doc_id % 3)::INT AS m
      FROM documents),
cand AS (SELECT DISTINCT
  CASE WHEN m = 1 THEN substr(base, 1, p - 1)
                       || substr(base, p + 1, len(base))
       WHEN m = 2 THEN substr(base, 1, p) || 'x'
                       || substr(base, p + 1, len(base))
       ELSE base END AS host
  FROM c)
SELECT DISTINCT host, h AS trusted_host
FROM cand CROSS JOIN tr
WHERE levenshtein(host, h) = 1
  AND host NOT IN (SELECT h FROM tr)
"""


def q_volume_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact least-squares daily trend of error-event volume ("is the
    error rate drifting up?"): one corpus exchange into per-day
    counts, zero-filled calendar spine (a gap day is evidence), int64
    sums, ONE IEEE division for the slope."""
    from jsonschema_spark.operators.stats import volume_trend

    ev = spark.read.parquet(_t(sf_dir, "events")) \
        .where(F.col("event_type") == "error")
    return volume_trend(ev, "ts", unit="day")


_VOLUME_TREND_SQL = """
WITH g AS (SELECT date_trunc('day', ts)::DATE AS b,
                  count(*)::BIGINT AS y
           FROM events WHERE event_type = 'error' AND ts IS NOT NULL
           GROUP BY 1),
r AS (SELECT min(b) AS lo, max(b) AS hi, sum(y)::BIGINT AS tot FROM g),
sp AS (SELECT lo, hi, tot,
              unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE AS b
       FROM r),
j AS (SELECT lo, hi, tot, date_diff('day', lo, b)::BIGINT AS x,
             coalesce(y, 0)::BIGINT AS yy
      FROM sp LEFT JOIN g USING (b)),
a AS (SELECT count(*)::BIGINT AS n_buckets, max(tot)::BIGINT
        AS total_rows,
        strftime(max(lo), '%Y-%m-%d') AS first_bucket,
        strftime(max(hi), '%Y-%m-%d') AS last_bucket,
        sum(x)::BIGINT AS sx, sum(yy)::BIGINT AS sy,
        sum(x * yy)::BIGINT AS sxy, sum(x * x)::BIGINT AS sxx
      FROM j)
SELECT n_buckets, total_rows, first_bucket, last_bucket,
  CASE WHEN (n_buckets * sxx - sx * sx) > 0 THEN
    floor((n_buckets * sxy - sx * sy)::DOUBLE * 1000.0
          / (n_buckets * sxx - sx * sx))::BIGINT END AS slope_milli
FROM a
"""


def q_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 collocations by lift (the log-free PMI surrogate) over
    the documents corpus: min_count floor applied to the bigram table
    BEFORE the unigram joins, top-k via TakeOrderedAndProject, rank
    window over the 20 survivors only."""
    from jsonschema_spark.operators.textstats import collocations

    return collocations(_docs(spark, sf_dir), "text",
                        min_count=10, k=20)


def _collocations_sql() -> str:
    return f"""{_DOC_TOKS},
u AS (SELECT unnest(toks) AS w FROM t),
uc AS (SELECT w, count(*)::BIGINT AS n FROM u GROUP BY 1),
tot AS (SELECT sum(n)::BIGINT AS n_total FROM uc),
bg AS (SELECT toks[i] AS w1, toks[i + 1] AS w2 FROM t,
       LATERAL (SELECT unnest(range(1, len(toks))) AS i) ix),
bc AS (SELECT w1, w2, count(*)::BIGINT AS n_ab FROM bg
       GROUP BY 1, 2 HAVING count(*) >= 10),
j AS (SELECT w1, w2, n_ab, a.n AS n_w1, b.n AS n_w2,
             floor(n_ab::DOUBLE * n_total * 1000000.0
                   / (a.n::DOUBLE * b.n))::BIGINT AS lift_ppm
      FROM bc JOIN uc a ON bc.w1 = a.w JOIN uc b ON bc.w2 = b.w, tot),
r AS (SELECT *, row_number() OVER (ORDER BY lift_ppm DESC, w1, w2)
        ::BIGINT AS rnk FROM j)
SELECT w1, w2, n_ab, n_w1, n_w2, lift_ppm, rnk FROM r WHERE rnk <= 20
"""


def q_interarrival(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inter-arrival cadence summary over per-user event streams —
    exact integer-µs gaps from one partitioned lag window, floor-mean,
    interpolated p50/p90 floored to µs."""
    from jsonschema_spark.operators.temporal import interarrival_stats

    ev = spark.read.parquet(_t(sf_dir, "events"))
    return interarrival_stats(ev, "user_id", "ts", id_col="event_id")


_INTERARRIVAL_SQL = """
WITH ev AS (SELECT user_id, ts, event_id FROM events
            WHERE user_id IS NOT NULL AND ts IS NOT NULL),
g AS (SELECT epoch_us(ts) - epoch_us(lag(ts) OVER (
        PARTITION BY user_id ORDER BY ts, event_id)) AS gap FROM ev),
gg AS (SELECT gap FROM g WHERE gap IS NOT NULL)
SELECT count(*)::BIGINT AS n_gaps,
  floor(sum(gap)::DOUBLE / count(*))::BIGINT AS mean_us,
  min(gap)::BIGINT AS min_us, max(gap)::BIGINT AS max_us,
  floor(quantile_cont(gap::DOUBLE, 0.5))::BIGINT AS p50_us,
  floor(quantile_cont(gap::DOUBLE, 0.9))::BIGINT AS p90_us
FROM gg
"""


def q_volume_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day volume z-scores over a deterministically PLANTED spike
    (the %3 sample keeps base volume; day 15 keeps everything → ~3×):
    exact int64 sums, one IEEE sqrt, zero-filled spine — the burst
    that partition_anomaly's median-ratio lens and this variance lens
    must both catch."""
    from jsonschema_spark.operators.stats import volume_anomaly

    ev = spark.read.parquet(_t(sf_dir, "events")).where(
        (F.col("event_id") % 3 == 0) | (F.dayofmonth("ts") == 15))
    return volume_anomaly(ev, "ts", z_milli_threshold=3000)


_VOLUME_ANOMALY_SQL = """
WITH e AS (SELECT ts FROM events
           WHERE (event_id % 3 = 0 OR day(ts) = 15)
             AND ts IS NOT NULL),
g AS (SELECT date_trunc('day', ts)::DATE AS b, count(*)::BIGINT AS y
      FROM e GROUP BY 1),
r AS (SELECT min(b) AS lo, max(b) AS hi FROM g),
sp AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE
         AS b FROM r),
f AS (SELECT sp.b, coalesce(y, 0)::BIGINT AS y
      FROM sp LEFT JOIN g USING (b)),
tt AS (SELECT count(*)::BIGINT AS n, sum(y)::BIGINT AS sy,
              sum(y * y)::BIGINT AS syy FROM f),
z AS (SELECT strftime(b, '%Y-%m-%d') AS bucket, y AS n_rows,
        CASE WHEN (n * syy - sy * sy) > 0 THEN
          floor((n * y - sy)::DOUBLE * 1000.0
                / sqrt((n * syy - sy * sy)::DOUBLE))::BIGINT END
          AS z_milli
      FROM f, tt)
SELECT bucket, n_rows, z_milli,
  CASE WHEN z_milli > 3000 THEN 'high'
       WHEN z_milli < -3000 THEN 'low'
       ELSE 'ok' END AS status
FROM z
"""


def q_rrf_fuse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reciprocal-rank fusion of two 100-deep document rankings
    (longest-doc rank ⊕ portable-hash pseudo-relevance rank) — the
    calibration-free hybrid-retrieval merge with EXACT integer
    1/(k+r) terms (per-term nano floor, order-free sum)."""
    from jsonschema_spark.operators.dedup import hash56
    from jsonschema_spark.operators.search import rrf_fuse
    from pyspark.sql.window import Window

    d = _docs(spark, sf_dir).where(F.col("text").isNotNull()) \
        .select("doc_id", "n_chars", hash56(F.col("text")).alias("_h")) \
        .localCheckpoint(eager=True)
    a = d.orderBy(F.col("n_chars").desc(), "doc_id").limit(100)
    a = a.withColumn("rnk", F.row_number().over(
        Window.orderBy(F.col("n_chars").desc(), "doc_id")))
    b = d.orderBy(F.col("_h").asc(), "doc_id").limit(100)
    b = b.withColumn("rnk", F.row_number().over(
        Window.orderBy(F.col("_h").asc(), "doc_id")))
    return rrf_fuse([a, b], "doc_id", "rnk", k=60, topk=20)


def _rrf_fuse_sql() -> str:
    h = _h56("text")
    return f"""
WITH d AS (SELECT doc_id, n_chars, {h} AS hh FROM documents
           WHERE text IS NOT NULL),
a AS (SELECT doc_id, row_number() OVER (ORDER BY n_chars DESC, doc_id)
        AS rnk FROM d ORDER BY n_chars DESC, doc_id LIMIT 100),
b AS (SELECT doc_id, row_number() OVER (ORDER BY hh, doc_id)
        AS rnk FROM d ORDER BY hh, doc_id LIMIT 100),
u AS (SELECT doc_id, floor(1000000000.0 / (rnk::DOUBLE + 60.0))
        ::BIGINT AS s FROM a
      UNION ALL
      SELECT doc_id, floor(1000000000.0 / (rnk::DOUBLE + 60.0))
        ::BIGINT AS s FROM b),
g AS (SELECT doc_id, count(*)::BIGINT AS n_lists,
             sum(s)::BIGINT AS rrf_nano FROM u GROUP BY 1),
r AS (SELECT *, row_number() OVER (ORDER BY rrf_nano DESC, doc_id)
        ::BIGINT AS rnk FROM g)
SELECT doc_id, n_lists, rrf_nano, rnk FROM r WHERE rnk <= 20
"""


def q_corpus_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokens that distinguish English documents from the rest —
    add-one-smoothed rate ratio (the log-odds ranking without the
    log), one conditional-sum exchange, min_count prune before
    ranking, top-20 by ratio."""
    from jsonschema_spark.operators.textstats import corpus_diff_terms

    d = _docs(spark, sf_dir).where(F.col("text").isNotNull())
    return corpus_diff_terms(d, "text", F.col("lang") == "en",
                             min_count=10, k=20)


def _corpus_diff_sql() -> str:
    return f"""
WITH t0 AS (SELECT (lang = 'en') AS sp, {_TOKS} AS toks
            FROM documents WHERE text IS NOT NULL),
u AS (SELECT sp, unnest(toks) AS w FROM t0),
g AS (SELECT w, sum(CASE WHEN sp THEN 1 ELSE 0 END)::BIGINT AS n_a,
             sum(CASE WHEN sp THEN 0 ELSE 1 END)::BIGINT AS n_b
      FROM u GROUP BY 1),
tt AS (SELECT sum(n_a)::BIGINT AS na, sum(n_b)::BIGINT AS nb,
              count(*)::BIGINT AS v FROM g),
j AS (SELECT w AS token, n_a, n_b,
        floor((n_a + 1)::DOUBLE * (nb + v) * 1000000.0
              / ((n_b + 1)::DOUBLE * (na + v)))::BIGINT AS ratio_ppm
      FROM g, tt WHERE n_a >= 10),
r AS (SELECT *, row_number() OVER (ORDER BY ratio_ppm DESC, token)
        ::BIGINT AS rnk FROM j)
SELECT token, n_a, n_b, ratio_ppm, rnk FROM r WHERE rnk <= 20
"""


def q_funnel_durations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert per funnel step (same 2/7 sample and greedy
    fold as q_funnel, state extended with the per-step matched
    timestamps): mean exact-µs distance from the step-1 event over
    users who reached each step."""
    from jsonschema_spark.operators.temporal import funnel_durations

    ev = spark.read.parquet(_t(sf_dir, "events")) \
        .where(F.col("event_id") % 7 < 2)
    return funnel_durations(ev, "user_id", "ts", "event_type",
                            ["signup", "view", "click", "purchase"])


def _funnel_durations_sql() -> str:
    steps = ["signup", "view", "click", "purchase"]
    rows = []
    for i, s in enumerate(steps, 1):
        rows.append(
            f"SELECT {i}::BIGINT AS step, '{s}' AS step_type, "
            f"count(*)::BIGINT AS n_users, "
            f"CASE WHEN count(*) > 0 THEN "
            f"floor(sum(epoch_us(s.t) - epoch_us(f.t))::DOUBLE "
            f"/ count(*))::BIGINT END AS mean_us_from_first "
            f"FROM s{i} s JOIN s1 f ON s.user_id = f.user_id")
    union = "\nUNION ALL\n".join(rows)
    return f"""
WITH ev AS MATERIALIZED (SELECT user_id, ts, event_type FROM events
    WHERE event_id % 7 < 2),
s1 AS MATERIALIZED (SELECT user_id, min(ts) AS t FROM ev
    WHERE event_type = 'signup' GROUP BY 1),
s2 AS MATERIALIZED (SELECT e.user_id, min(e.ts) AS t FROM ev e
    JOIN s1 ON e.user_id = s1.user_id
    WHERE e.event_type = 'view' AND e.ts > s1.t GROUP BY 1),
s3 AS MATERIALIZED (SELECT e.user_id, min(e.ts) AS t FROM ev e
    JOIN s2 ON e.user_id = s2.user_id
    WHERE e.event_type = 'click' AND e.ts > s2.t GROUP BY 1),
s4 AS MATERIALIZED (SELECT e.user_id, min(e.ts) AS t FROM ev e
    JOIN s3 ON e.user_id = s3.user_id
    WHERE e.event_type = 'purchase' AND e.ts > s3.t GROUP BY 1)
{union}"""


def q_ab_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-proportion z over events: arm A = even users, success =
    purchase, with a deterministic planted lift in arm A (every 11th
    event) — the directional 2×2 test, one conditional-sum scan,
    shared-op-order IEEE statistic."""
    from jsonschema_spark.operators.stats import ab_test

    ev = spark.read.parquet(_t(sf_dir, "events"))
    v = F.col("user_id") % 2 == 0
    s = (F.col("event_type") == "purchase") \
        | (v & (F.col("event_id") % 11 == 0))
    return ab_test(ev, v, s)


_AB_TEST_SQL = """
WITH e AS (SELECT (user_id % 2 = 0) AS v,
  (event_type = 'purchase'
   OR (user_id % 2 = 0 AND event_id % 11 = 0)) AS s FROM events),
c AS (SELECT sum(v::INT)::BIGINT AS n_a,
             sum((NOT v)::INT)::BIGINT AS n_b,
             sum((v AND s)::INT)::BIGINT AS succ_a,
             sum((NOT v AND s)::INT)::BIGINT AS succ_b FROM e),
p AS (SELECT *, (succ_a + succ_b)::DOUBLE / (n_a + n_b) AS pp FROM c)
SELECT n_a, n_b, succ_a, succ_b,
  CASE WHEN n_a > 0 THEN
    floor(succ_a::DOUBLE * 1000000.0 / n_a)::BIGINT END AS rate_a_ppm,
  CASE WHEN n_b > 0 THEN
    floor(succ_b::DOUBLE * 1000000.0 / n_b)::BIGINT END AS rate_b_ppm,
  CASE WHEN n_a > 0 AND n_b > 0
        AND (pp * (1.0 - pp) * (1.0 / n_a + 1.0 / n_b)) > 0 THEN
    floor((succ_a::DOUBLE / n_a - succ_b::DOUBLE / n_b) * 1000.0
          / sqrt(pp * (1.0 - pp) * (1.0 / n_a + 1.0 / n_b)))::BIGINT
  END AS z_milli
FROM p
"""


def q_vocab_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve over a deterministic 30-day document
    calendar (day = doc_id mod 30): per day, token occurrences and
    never-seen-before token types — the Heaps-over-time freshness
    lens. Two map-side-combinable exchanges (bucket totals, per-token
    first-seen minima)."""
    from jsonschema_spark.operators.textstats import vocab_growth

    d = _docs(spark, sf_dir).where(F.col("text").isNotNull()).select(
        F.date_add(F.to_date(F.lit("2024-01-01")),
                   (F.col("doc_id") % 30).cast("int")).alias("d"),
        "text")
    return vocab_growth(d, "d", "text")


def _vocab_growth_sql() -> str:
    toks = _TOKS
    return f"""
WITH d0 AS (SELECT (DATE '2024-01-01' + (doc_id % 30)::INT) AS d, text
            FROM documents WHERE text IS NOT NULL),
t AS (SELECT d, {toks} AS toks FROM d0),
u AS (SELECT d, unnest(toks) AS w FROM t),
occ AS (SELECT d, count(*)::BIGINT AS n_tokens FROM u GROUP BY 1),
fs AS (SELECT w, min(d) AS d FROM u GROUP BY 1),
nw AS (SELECT d, count(*)::BIGINT AS n_new_types FROM fs GROUP BY 1),
r AS (SELECT min(d) AS lo, max(d) AS hi FROM occ),
sp AS (SELECT unnest(generate_series(lo, hi, INTERVAL 1 DAY))::DATE
         AS d FROM r)
SELECT strftime(sp.d, '%Y-%m-%d') AS bucket,
       coalesce(n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(n_new_types, 0)::BIGINT AS n_new_types
FROM sp LEFT JOIN occ ON sp.d = occ.d LEFT JOIN nw ON sp.d = nw.d
"""


def q_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source vocabulary-overlap matrix from per-source KMV
    sketches (k=128): every source pair's token-set Jaccard estimate
    — "which sources speak the same language / re-crawl each other"
    at sketch cost, never a cross-source token join. 20 sources →
    190 pair rows, each computed on ≤k-element arrays."""
    from jsonschema_spark.operators.dedup import kmv_group_jaccard, tokens

    d = _docs(spark, sf_dir).where(F.col("text").isNotNull()).select(
        "source", F.explode(tokens(F.col("text"))).alias("tok"))
    return kmv_group_jaccard(d, "source", F.col("tok"), k=128)


def _source_overlap_sql() -> str:
    h = _h56("w")
    return f"""
WITH u0 AS (SELECT source AS g, unnest({_TOKS}) AS w FROM documents
            WHERE text IS NOT NULL AND source IS NOT NULL),
hh AS (SELECT DISTINCT g, {h} AS hv FROM u0),
r AS (SELECT g, hv, row_number() OVER (PARTITION BY g ORDER BY hv)
        AS rn FROM hh),
sk AS (SELECT g, list_sort(list(hv)) AS s FROM r WHERE rn <= 128
       GROUP BY 1),
p AS (SELECT a.g AS g1, b.g AS g2, a.s AS sa, b.s AS sb
      FROM sk a JOIN sk b ON a.g < b.g),
c AS (SELECT g1, g2, sa, sb,
             list_sort(list_distinct(sa || sb))[1:128] AS u FROM p)
SELECT g1, g2, len(u)::BIGINT AS k_used,
  len(list_filter(u, x -> list_contains(sa, x)
                   AND list_contains(sb, x)))::BIGINT AS n_both,
  floor(len(list_filter(u, x -> list_contains(sa, x)
                         AND list_contains(sb, x)))::BIGINT
        * 1000000.0 / len(u))::BIGINT AS jaccard_ppm
FROM c
"""


def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-status winsorization of o_totalprice at exact [p5, p95]:
    bounds from ONE group agg broadcast back; summary per group
    (clip counts + exact-milli clipped sum) keeps the gate row count
    bounded while attesting every row's clip decision through the
    sum."""
    from jsonschema_spark.operators.stats import winsorize_by_group

    o = spark.read.parquet(_t(sf_dir, "orders"))
    w = winsorize_by_group(o, "o_orderstatus", "o_totalprice",
                           lo_p=0.05, hi_p=0.95)
    return w.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum((F.col("clip_flag") == "lo").cast("long")).cast("long")
        .alias("n_lo"),
        F.sum((F.col("clip_flag") == "hi").cast("long")).cast("long")
        .alias("n_hi"),
        F.sum(F.floor(F.col("o_totalprice_clipped") * 1000)
              .cast("long")).cast("long").alias("sum_clipped_milli"),
    )


_WINSORIZE_SQL = """
WITH b AS (SELECT o_orderstatus AS g,
                  quantile_cont(o_totalprice, 0.05) AS lo,
                  quantile_cont(o_totalprice, 0.95) AS hi
           FROM orders GROUP BY 1),
j AS (SELECT o.o_orderstatus,
        CASE WHEN o_totalprice < lo THEN lo
             WHEN o_totalprice > hi THEN hi
             ELSE o_totalprice END AS c,
        CASE WHEN o_totalprice < lo THEN 'lo'
             WHEN o_totalprice > hi THEN 'hi' END AS f
      FROM orders o JOIN b ON o.o_orderstatus = b.g)
SELECT o_orderstatus, count(*)::BIGINT AS n_rows,
  sum((f = 'lo')::INT)::BIGINT AS n_lo,
  sum((f = 'hi')::INT)::BIGINT AS n_hi,
  sum(floor(c * 1000)::BIGINT)::BIGINT AS sum_clipped_milli
FROM j GROUP BY 1
"""


def q_session_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Association rules over 2-hour session baskets of the event
    stream (support/confidence/lift per ordered type pair —
    co-occurrence, where event_transitions is adjacency): native
    session_window baskets, |types|²-bounded pair fan-out, every
    count join broadcast."""
    from jsonschema_spark.operators.temporal import session_rules

    ev = spark.read.parquet(_t(sf_dir, "events"))
    return session_rules(ev, "user_id", "ts", "event_type",
                         gap="2 hours", min_support=5)


_SESSION_RULES_SQL = """
WITH ev AS (SELECT user_id, ts, event_id, event_type FROM events
  WHERE user_id IS NOT NULL AND ts IS NOT NULL
    AND event_type IS NOT NULL),
s AS (SELECT user_id, ts, event_id, event_type,
   CASE WHEN lag(ts) OVER w IS NULL
         OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 7200000000
        THEN 1 ELSE 0 END AS new_s
   FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
g AS (SELECT *, sum(new_s) OVER (PARTITION BY user_id
        ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sid FROM s),
b AS (SELECT user_id, sid, list_distinct(list(event_type)) AS tl
      FROM g GROUP BY 1, 2),
n AS (SELECT count(*)::BIGINT AS n_sessions FROM b),
si AS (SELECT t, count(*)::BIGINT AS c FROM
       (SELECT unnest(tl) AS t FROM b) GROUP BY 1),
pr AS (SELECT x.sx AS src, y.sy AS dst FROM b,
       unnest(tl) AS x(sx), unnest(tl) AS y(sy) WHERE sx <> sy),
pc AS (SELECT src, dst, count(*)::BIGINT AS n_both FROM pr
       GROUP BY 1, 2 HAVING count(*) >= 5),
j AS (SELECT pc.src, pc.dst, n_both, a.c AS n_src, d.c AS n_dst,
             n_sessions
      FROM pc JOIN si a ON pc.src = a.t JOIN si d ON pc.dst = d.t, n)
SELECT src, dst, n_both, n_src, n_dst,
  floor((n_both * 1000000)::DOUBLE / n_sessions)::BIGINT
    AS support_ppm,
  floor((n_both * 1000000)::DOUBLE / n_src)::BIGINT
    AS confidence_ppm,
  floor(n_both::DOUBLE * n_sessions * 1000000.0
        / (n_src::DOUBLE * n_dst))::BIGINT AS lift_ppm
FROM j
"""


def q_top_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Generic grouped top-k: the 5 highest-value orders per status —
    ONE partitioned window (no single-task funnel at any group
    count), deterministic orderkey tiebreak, prices as exact milli
    ints."""
    from jsonschema_spark.operators.stats import top_k_per_group

    o = spark.read.parquet(_t(sf_dir, "orders"))
    t = top_k_per_group(
        o, ["o_orderstatus"],
        [F.col("o_totalprice").desc(), F.col("o_orderkey")], 5)
    return t.select(
        "o_orderstatus", "o_orderkey",
        F.floor(F.col("o_totalprice") * 1000).cast("long")
        .alias("price_milli"), "rnk")


_TOP_PER_STATUS_SQL = """
WITH r AS (SELECT o_orderstatus, o_orderkey,
             floor(o_totalprice * 1000)::BIGINT AS price_milli,
             row_number() OVER (PARTITION BY o_orderstatus
               ORDER BY o_totalprice DESC, o_orderkey)::BIGINT AS rnk
           FROM orders)
SELECT o_orderstatus, o_orderkey, price_milli, rnk FROM r
WHERE rnk <= 5
"""


def q_median_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-status center/spread of o_totalprice: exact
    interpolated median + MAD (two group aggs, medians broadcast
    back) — the heavy-tail-proof profile mean/std checks misread."""
    from jsonschema_spark.operators.stats import group_median_mad

    o = spark.read.parquet(_t(sf_dir, "orders"))
    return group_median_mad(o, "o_orderstatus", "o_totalprice")


_MEDIAN_MAD_SQL = """
WITH m AS (SELECT o_orderstatus AS g,
             count(o_totalprice)::BIGINT AS n_rows,
             quantile_cont(o_totalprice, 0.5) AS med
           FROM orders GROUP BY 1),
d AS (SELECT m.g, abs(o_totalprice - med) AS dev
      FROM orders o JOIN m ON o.o_orderstatus = m.g
      WHERE o_totalprice IS NOT NULL),
md AS (SELECT g, quantile_cont(dev, 0.5) AS mad FROM d GROUP BY 1)
SELECT m.g AS o_orderstatus, n_rows,
       floor(med * 1000)::BIGINT AS median_milli,
       floor(mad * 1000)::BIGINT AS mad_milli
FROM m JOIN md ON m.g = md.g
"""


def q_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week × hour-of-day activity heatmap over the event
    stream (full 7×24 spine, ISO Monday=1, wall-time extraction —
    the tz-proof currency): the human-vs-scheduler seasonality
    fingerprint."""
    from jsonschema_spark.operators.stats import activity_heatmap

    return activity_heatmap(
        spark.read.parquet(_t(sf_dir, "events")), "ts")


_HEATMAP_SQL = """
WITH g AS (SELECT isodow(ts)::INT AS dow, hour(ts)::INT AS hour,
                  count(*)::BIGINT AS n
           FROM events WHERE ts IS NOT NULL GROUP BY 1, 2),
sp AS (SELECT d::INT AS dow, h::INT AS hour FROM
       (SELECT unnest(range(1, 8)) AS d) a,
       (SELECT unnest(range(0, 24)) AS h) b),
j AS (SELECT sp.dow, sp.hour, coalesce(n, 0)::BIGINT AS n_rows
      FROM sp LEFT JOIN g ON sp.dow = g.dow AND sp.hour = g.hour),
t AS (SELECT sum(n_rows)::BIGINT AS tt FROM j)
SELECT dow, hour, n_rows,
  floor((n_rows * 1000000)::DOUBLE / tt)::BIGINT AS share_ppm
FROM j, t
"""


def _rollup_url() -> Column:
    c = F.col("doc_id")
    return F.concat(
        F.lit("https://"), F.col("source"), F.lit(".example.org"),
        F.when(c % 4 == 0, F.lit("/"))
        .when(c % 4 == 1, F.concat(F.lit("/p/"),
                                   (c % 50).cast("string")))
        .when(c % 4 == 2, F.concat(F.lit("/p/"),
                                   (c % 50).cast("string"),
                                   F.lit("/c")))
        .otherwise(F.concat(F.lit("/t/"), (c % 7).cast("string"),
                            F.lit("/x/"), (c % 5).cast("string"))),
        F.when(c % 2 == 0, F.lit("?q=1")).otherwise(F.lit("")),
    )


def q_path_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL directory rollup over a deterministic site-structure
    fixture (roots, /p/N, /p/N/c, /t/N/x/M subtrees): page counts at
    every path prefix to depth 3 — the per-directory crawl-budget /
    trap-subtree census. Bounded explode (≤depth+1 per url), one
    map-side groupBy."""
    from jsonschema_spark.operators.urltools import path_rollup

    d = _docs(spark, sf_dir).select("doc_id", "source") \
        .withColumn("url", _rollup_url())
    return path_rollup(d, "url")


_PATH_CENSUS_SQL = """
WITH u AS (SELECT source || '.example.org' AS host,
  CASE doc_id % 4 WHEN 0 THEN '/'
    WHEN 1 THEN '/p/' || (doc_id % 50)::VARCHAR
    WHEN 2 THEN '/p/' || (doc_id % 50)::VARCHAR || '/c'
    ELSE '/t/' || (doc_id % 7)::VARCHAR || '/x/'
         || (doc_id % 5)::VARCHAR END AS path
  FROM documents),
s AS (SELECT host,
        list_filter(string_split(path, '/'), x -> x <> '') AS segs
      FROM u),
e AS (SELECT host, d::INT AS depth,
        '/' || coalesce(array_to_string(segs[1:d], '/'), '') AS prefix
      FROM s, LATERAL (SELECT unnest(range(0,
        least(len(segs), 3) + 1)) AS d) ix)
SELECT host, depth, prefix, count(*)::BIGINT AS n_urls
FROM e GROUP BY 1, 2, 3
"""


def q_robust_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modified-z outlier census per status over prices with a
    deterministic planted 50× spike on every 211th order key — the
    median/MAD method flags exactly the plants that a mean/std gate
    would partially mask (the spikes inflate std by ~4×)."""
    from jsonschema_spark.operators.stats import robust_outliers

    o = spark.read.parquet(_t(sf_dir, "orders")).select(
        "o_orderstatus",
        (F.col("o_totalprice")
         * F.when(F.col("o_orderkey") % 211 == 0, 50).otherwise(1))
        .alias("price"))
    return robust_outliers(o, "o_orderstatus", "price")


_ROBUST_OUTLIERS_SQL = """
WITH o AS (SELECT o_orderstatus AS g,
  o_totalprice * CASE WHEN o_orderkey % 211 = 0 THEN 50 ELSE 1 END
    AS v FROM orders),
m AS (SELECT g, quantile_cont(v, 0.5) AS med FROM o GROUP BY 1),
d AS (SELECT o.g, abs(v - med) AS dev FROM o JOIN m ON o.g = m.g
      WHERE v IS NOT NULL),
md AS (SELECT g, quantile_cont(dev, 0.5) AS mad FROM d GROUP BY 1),
j AS (SELECT o.g, v, med, mad FROM o JOIN m ON o.g = m.g
      JOIN md ON o.g = md.g),
z AS (SELECT g, v,
        CASE WHEN v IS NOT NULL AND mad > 0 THEN
          floor(0.6745 * (v - med) * 1000.0 / mad) END AS zc
      FROM j),
a AS (SELECT g AS o_orderstatus, count(v)::BIGINT AS n_rows,
        sum((zc < -3500)::INT)::BIGINT AS n_out_low,
        sum((zc > 3500)::INT)::BIGINT AS n_out_high
      FROM z GROUP BY 1)
SELECT o_orderstatus, n_rows, n_out_low, n_out_high,
  floor(((n_out_low + n_out_high) * 1000000)::DOUBLE / n_rows)
    ::BIGINT AS outlier_ppm
FROM a
"""


def q_suggest_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Constraint suggestion over orders: the profile pass proposes
    the check_suite a curator would write — completeness floors,
    key-candidate distinctness (o_orderkey; o_orderdate iff its
    timestamps happen to be unique — both engines decide from the
    same count), numeric bounds, small string domains as sorted
    CSVs."""
    from jsonschema_spark.operators.checks import suggest_checks

    return suggest_checks(spark.read.parquet(_t(sf_dir, "orders")))


def _suggest_checks_sql() -> str:
    spec = [("o_orderkey", "num"), ("o_custkey", "num"),
            ("o_orderstatus", "str"), ("o_totalprice", "num"),
            ("o_orderdate", "other"), ("o_orderpriority", "str")]
    aggs = ["count(*)::BIGINT AS n"]
    rows = []
    for name, kind in spec:
        aggs.append(f"count({name})::BIGINT AS nn_{name}")
        aggs.append(f"count(DISTINCT {name})::BIGINT AS nd_{name}")
        if kind == "num":
            aggs.append(f"min(floor({name}::DOUBLE))::BIGINT"
                        f" AS mn_{name}")
            aggs.append(f"max(floor({name}::DOUBLE))::BIGINT"
                        f" AS mx_{name}")
        comp = f"((nn_{name} * 1000000) // n)"
        rows.append(
            f"SELECT '{name}' AS col_name, 'completeness' AS \"check\","
            f" {comp}::VARCHAR AS param, {comp}::BIGINT AS observed"
            f" FROM a")
        rows.append(
            f"SELECT '{name}', 'distinctness',"
            f" ((nd_{name} * 1000000) // n)::VARCHAR,"
            f" ((nd_{name} * 1000000) // n)::BIGINT FROM a"
            f" WHERE nn_{name} > 0 AND nd_{name} = nn_{name}")
        if kind == "num":
            rows.append(f"SELECT '{name}', 'min_ge',"
                        f" mn_{name}::VARCHAR, mn_{name} FROM a"
                        f" WHERE nn_{name} > 0")
            rows.append(f"SELECT '{name}', 'max_le',"
                        f" mx_{name}::VARCHAR, mx_{name} FROM a"
                        f" WHERE nn_{name} > 0")
        if kind == "str":
            dom = (f"(SELECT array_to_string(list_sort("
                   f"list(DISTINCT {name})), ',') FROM orders"
                   f" WHERE {name} IS NOT NULL)")
            rows.append(f"SELECT '{name}', 'contained_ppm', {dom},"
                        f" ((nd_{name} * 1000000) // n)::BIGINT FROM a"
                        f" WHERE nd_{name} BETWEEN 1 AND 8")
    union = "\nUNION ALL\n".join(rows)
    return (f"WITH a AS (SELECT {', '.join(aggs)} FROM orders)\n"
            f"{union}")


def q_fd_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency audit l_partkey → l_suppkey over
    lineitem: every part supplied by more than one supplier, with row
    mass and min/max witnesses. Two narrow exchanges (composite-key
    groupBy, then lhs groupBy with map-side partials)."""
    from jsonschema_spark.operators.checks import fd_violations

    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    return fd_violations(li, ["l_partkey"], "l_suppkey")


_FD_CHECK_SQL = """
WITH g1 AS (SELECT l_partkey, l_suppkey AS _rhs, count(*)::BIGINT AS c
            FROM lineitem GROUP BY 1, 2),
g2 AS (SELECT l_partkey, sum(c)::BIGINT AS n_rows,
         count(*)::BIGINT AS n_distinct_rhs,
         min(_rhs) AS rhs_min, max(_rhs) AS rhs_max
       FROM g1 GROUP BY 1)
SELECT * FROM g2 WHERE n_distinct_rhs > 1"""


def q_benford(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-digit Benford profile of o_totalprice — the reference-
    free numeric-sanity lens; the synthetic uniform prices genuinely
    DEVIATE from the law, which is exactly the signal shape the
    check exists to flag (dev_ppm per digit, all 9 rows pinned by a
    digit spine)."""
    from jsonschema_spark.operators.checks import benford_profile

    return benford_profile(
        spark.read.parquet(_t(sf_dir, "orders")), "o_totalprice")


def _benford_sql() -> str:
    from jsonschema_spark.operators.checks import BENFORD_PPM

    vals = ", ".join(f"({i + 1}, {p})" for i, p in enumerate(BENFORD_PPM))
    return f"""
WITH b(digit, expected_ppm) AS (VALUES {vals}),
g AS (SELECT substr(floor(abs(o_totalprice))::BIGINT::VARCHAR, 1, 1)
         ::INT AS digit,
       count(*)::BIGINT AS n_rows
      FROM orders
      WHERE o_totalprice IS NOT NULL AND abs(o_totalprice) >= 1
      GROUP BY 1),
j AS (SELECT b.digit, coalesce(g.n_rows, 0)::BIGINT AS n_rows,
        b.expected_ppm::BIGINT AS expected_ppm
      FROM b LEFT JOIN g USING (digit)),
t AS (SELECT sum(n_rows)::BIGINT AS tot FROM j)
SELECT digit, n_rows,
  floor((n_rows * 1000000)::DOUBLE / tot)::BIGINT AS observed_ppm,
  expected_ppm,
  (floor((n_rows * 1000000)::DOUBLE / tot) - expected_ppm)::BIGINT
    AS dev_ppm
FROM j, t"""


def q_json_key_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-level JSON key census over events.props with all three
    absence kinds planted: extra keys (event_id%7), malformed JSON
    (%11 — parses to nothing in Spark, json_valid-guarded in the
    mirror where it would THROW), top-level arrays (%13 — NULL keys
    in Spark, [] in DuckDB; both contribute no rows)."""
    from jsonschema_spark.operators.checks import json_key_census

    e = spark.read.parquet(_t(sf_dir, "events"))
    c = F.col("event_id")
    j = (F.when(c % 11 == 0, F.lit("oops"))
         .when(c % 13 == 0, F.lit("[1, 2]"))
         .when(c % 7 == 0,
               F.concat(F.lit('{"k": '), (c % 100).cast("string"),
                        F.lit(', "tag": "x", "lang": "en"}')))
         .otherwise(F.col("props")))
    return json_key_census(e.select(j.alias("p")), "p")


_JSON_KEY_CENSUS_SQL = """
WITH j AS (SELECT CASE WHEN event_id % 11 = 0 THEN 'oops'
                WHEN event_id % 13 = 0 THEN '[1, 2]'
                WHEN event_id % 7 = 0 THEN
                  '{"k": ' || (event_id % 100)::VARCHAR
                  || ', "tag": "x", "lang": "en"}'
                ELSE props END AS p
           FROM events),
t AS (SELECT count(*)::BIGINT AS total FROM j),
ks AS (SELECT unnest(CASE WHEN p IS NOT NULL AND json_valid(p)
                          THEN json_keys(p)
                          ELSE []::VARCHAR[] END) AS json_key
       FROM j),
g AS (SELECT json_key, count(*)::BIGINT AS n_rows FROM ks GROUP BY 1)
SELECT json_key, n_rows,
  floor((n_rows * 1000000)::DOUBLE / total)::BIGINT AS presence_ppm
FROM g, t"""


def q_infer_props_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-Schema inference (operators/infer.py): the per-key typed
    profile over a planted payload exercising the whole cross-engine
    type lattice — integer (bounds), enum string, fractional number,
    boolean, null|string union, object, array — plus malformed docs,
    top-level arrays, a sparse key (%7 branch) and a path-unsafe key
    ("weird.key", censused but excluded from the typed profile by
    KEY_RE on BOTH sides). The DuckDB mirror re-derives every row
    with dynamic json_type paths — two independent type-lattice
    implementations agreeing per key."""
    from jsonschema_spark.operators.infer import infer_json_stats

    e = spark.read.parquet(_t(sf_dir, "events"))
    c = F.col("event_id")
    tag = F.element_at(
        F.array(F.lit("alpha"), F.lit("beta"), F.lit("gamma")),
        (c % 3).cast("int") + 1)
    payload = (
        F.when(c % 11 == 0, F.lit("{oops"))
        .when(c % 13 == 0, F.lit("[1, 2]"))
        .when(c % 7 == 0, F.concat(
            F.lit('{"k": '), (c % 100).cast("string"),
            F.lit(', "extra": "x", "weird.key": 1}')))
        .otherwise(F.concat(
            F.lit('{"k": '), (c % 100).cast("string"),
            F.lit(', "tag": "'), tag,
            F.lit('", "score": '), (c % 17).cast("string"), F.lit(".5"),
            F.lit(', "flag": '),
            F.when(c % 2 == 0, F.lit("true")).otherwise(F.lit("false")),
            F.lit(', "note": '),
            F.when(c % 5 == 0, F.lit("null")).otherwise(
                F.concat(F.lit('"n'), (c % 50).cast("string"), F.lit('"'))),
            F.lit(', "meta": {"a": 1}, "ids": ['),
            (c % 4).cast("string"), F.lit("]}"))))
    return infer_json_stats(e.select(payload.alias("p")), "p")


_INFER_PAYLOAD_SQL = """
  SELECT CASE WHEN event_id % 11 = 0 THEN '{oops'
       WHEN event_id % 13 = 0 THEN '[1, 2]'
       WHEN event_id % 7 = 0 THEN
         '{"k": ' || (event_id % 100)::VARCHAR
         || ', "extra": "x", "weird.key": 1}'
       ELSE '{"k": ' || (event_id % 100)::VARCHAR || ', "tag": "'
         || list_extract(['alpha','beta','gamma'],
                         (event_id % 3)::INT + 1)
         || '", "score": ' || (event_id % 17)::VARCHAR || '.5, "flag": '
         || CASE WHEN event_id % 2 = 0 THEN 'true' ELSE 'false' END
         || ', "note": '
         || CASE WHEN event_id % 5 = 0 THEN 'null'
                 ELSE '"n' || (event_id % 50)::VARCHAR || '"' END
         || ', "meta": {"a": 1}, "ids": [' || (event_id % 4)::VARCHAR
         || ']}'
  END AS p FROM events"""

# Dynamic-path mirror of operators/infer.py:infer_json_stats — DuckDB
# json_type accepts a column path, so the whole per-key typed profile
# (census cap, KEY_RE filter, lattice mapping, bounds, enum window)
# replays without key literals.
_INFER_PROPS_SQL = f"""
WITH base AS ({_INFER_PAYLOAD_SQL}),
src AS (SELECT try_cast(p AS JSON) AS j FROM base),
obj AS (SELECT j FROM src WHERE j IS NOT NULL AND json_type(j) = 'OBJECT'),
nobj AS (SELECT count(*)::BIGINT AS n_objects FROM obj),
census AS (SELECT k AS json_key, count(*) AS n
           FROM obj, LATERAL (SELECT unnest(json_keys(j)) AS k) kx
           GROUP BY 1),
keys AS (SELECT json_key FROM (
           SELECT json_key, n,
                  row_number() OVER (ORDER BY n DESC, json_key) AS r
           FROM census) rk
         WHERE r <= 64
           AND regexp_matches(json_key, '^[A-Za-z0-9_@-]+$')),
pairs AS (
  -- DYNAMIC-path json_type returns SQL NULL for a json-null value
  -- (the literal-path form returns 'NULL'); pairs only enumerates
  -- PRESENT keys, so NULL dt unambiguously means json null.
  SELECT ks.json_key,
         coalesce(json_type(o.j, '$."' || ks.json_key || '"'),
                  'NULL') AS dt,
         json_extract_string(o.j, '$."' || ks.json_key || '"') AS raw
  FROM obj o, keys ks
  WHERE list_contains(json_keys(o.j), ks.json_key)),
vals AS (
  SELECT json_key,
    CASE dt WHEN 'OBJECT' THEN 'object' WHEN 'ARRAY' THEN 'array'
            WHEN 'VARCHAR' THEN 'string' WHEN 'BOOLEAN' THEN 'boolean'
            WHEN 'DOUBLE' THEN 'number' WHEN 'NULL' THEN 'null'
            WHEN 'UBIGINT' THEN 'integer' WHEN 'BIGINT' THEN 'integer'
            WHEN 'HUGEINT' THEN 'integer' ELSE 'other' END AS jtype,
    raw FROM pairs),
tv AS (
  SELECT json_key, jtype,
    CASE WHEN jtype = 'integer' THEN try_cast(raw AS BIGINT) END AS ival,
    CASE WHEN jtype IN ('integer', 'number')
          AND abs(try_cast(raw AS DOUBLE)) < 9.0e15
         THEN floor(try_cast(raw AS DOUBLE) * 1000)::BIGINT END AS milli,
    CASE WHEN jtype = 'string' THEN raw END AS sval
  FROM vals),
prof AS (
  SELECT json_key, count(*)::BIGINT AS n_present,
    array_to_string(list_sort(list(DISTINCT jtype)), ',') AS types_csv,
    sum(CASE WHEN jtype = 'null' THEN 1 ELSE 0 END)::BIGINT AS n_null,
    min(ival) AS int_lo, max(ival) AS int_hi,
    min(milli) AS num_lo_milli, max(milli) AS num_hi_milli,
    max(CASE WHEN jtype = 'string' THEN length(sval) END)::BIGINT
      AS str_maxlen
  FROM tv GROUP BY 1),
sv AS (SELECT json_key, sval FROM tv WHERE jtype = 'string' GROUP BY 1, 2),
en AS (SELECT json_key, count(*)::BIGINT AS n_distinct_str,
         CASE WHEN count(*) <= 16
              THEN string_agg(sval, '|' ORDER BY sval) END AS enum_csv
       FROM sv GROUP BY 1)
SELECT p.json_key, p.n_present,
  (p.n_present = n.n_objects) AS required,
  p.types_csv, p.n_null, p.int_lo, p.int_hi,
  p.num_lo_milli, p.num_hi_milli, p.str_maxlen,
  coalesce(e.n_distinct_str, 0)::BIGINT AS n_distinct_str, e.enum_csv
FROM prof p LEFT JOIN en e USING (json_key), nobj n
ORDER BY 1"""


def q_fd_compliance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate-FD rate for l_partkey → l_suppkey (TANE g3): the
    one-number form of the 2000-key violation list — how many rows
    survive keeping each part's majority supplier."""
    from jsonschema_spark.operators.checks import fd_compliance

    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    return fd_compliance(li, ["l_partkey"], "l_suppkey")


_FD_COMPLIANCE_SQL = """
WITH g1 AS (SELECT l_partkey, l_suppkey, count(*)::BIGINT AS c
            FROM lineitem GROUP BY 1, 2),
g2 AS (SELECT l_partkey, sum(c)::BIGINT AS n, max(c)::BIGINT AS mx
       FROM g1 GROUP BY 1),
a AS (SELECT sum(n)::BIGINT AS n_rows, count(*)::BIGINT AS n_keys,
        sum(mx)::BIGINT AS compliant_rows
      FROM g2)
SELECT n_rows, n_keys, compliant_rows,
  floor((compliant_rows * 1000000)::DOUBLE / n_rows)::BIGINT
    AS compliance_ppm
FROM a"""


def q_reconcile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table aggregate reconciliation: o_totalprice vs the
    lineitem charge roll-up sum(extprice*(1-disc)*(1+tax)), both sides
    quantized to integer cents PER ROW before the exact int64 sum so
    the verdict is partition-order independent. Top-100 worst
    mismatches via TakeOrderedAndProject (never a global sort);
    childless orders surface as no_parts."""
    from jsonschema_spark.operators.checks import reconcile_sum

    o = spark.read.parquet(_t(sf_dir, "orders"))
    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    part = (F.col("l_extendedprice")
            * (F.lit(1.0) - F.col("l_discount"))
            * (F.lit(1.0) + F.col("l_tax")))
    r = reconcile_sum(o, "o_orderkey", "o_totalprice",
                      li, "l_orderkey", part)
    return r.orderBy(F.abs(F.col("diff_units")).desc(),
                     F.col("o_orderkey")).limit(100)


_RECONCILE_ORDERS_SQL = """
WITH cs AS (SELECT l_orderkey AS k,
       sum(floor(l_extendedprice * (1 - l_discount) * (1 + l_tax)
                 * 100.0)::BIGINT)::BIGINT AS parts,
       count(*)::BIGINT AS np
     FROM lineitem GROUP BY 1),
p AS (SELECT o_orderkey AS k,
        floor(o_totalprice * 100.0)::BIGINT AS stated
      FROM orders)
SELECT k AS o_orderkey, stated AS stated_units,
  coalesce(parts, 0)::BIGINT AS parts_units,
  coalesce(np, 0)::BIGINT AS n_parts,
  (coalesce(parts, 0) - stated)::BIGINT AS diff_units,
  CASE WHEN parts IS NULL THEN 'no_parts'
       WHEN abs(coalesce(parts, 0) - stated) <= 0 THEN 'ok'
       ELSE 'mismatch' END AS status
FROM p LEFT JOIN cs USING (k)
ORDER BY abs(coalesce(parts, 0) - stated) DESC, k
LIMIT 100"""


def q_table_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-independent table checksum over documents (replica /
    snapshot / engine equality without a sort): canonical row
    rendering → portable 56-bit hash → per-bucket (count, XOR,
    mod-sum). One scan + one 64-row exchange; a mismatch localizes to
    1/64 of the data."""
    from jsonschema_spark.operators.checks import table_fingerprint

    return table_fingerprint(
        _docs(spark, sf_dir), ["doc_id", "lang", "source", "text"], 64)


_TABLE_FINGERPRINT_SQL = f"""
WITH r AS (SELECT concat_ws(chr(1),
    coalesce(doc_id::VARCHAR, '<NULL>'),
    coalesce(lang, '<NULL>'),
    coalesce(source, '<NULL>'),
    coalesce(text, '<NULL>')) AS s FROM documents),
h AS (SELECT {_h56('s')} AS h FROM r)
SELECT h % 64 AS bucket, count(*)::BIGINT AS n_rows,
       bit_xor(h)::BIGINT AS xor56,
       sum(h % 1000003)::BIGINT AS modsum
FROM h GROUP BY 1"""


def q_partition_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-partition row-count anomaly vs the lower-median bucket,
    with a genuinely anomalous plant: bucket 3 loses its even doc_ids
    (half-written ingest), bucket 7 is loaded twice (double ingest).
    Median via the allowed collect-into-one-row global agg — no
    single-partition window."""
    from jsonschema_spark.operators.checks import partition_anomaly

    c = F.col("doc_id")
    d = _docs(spark, sf_dir).select(c, (c % 12).alias("b"))
    d = d.where(~((F.col("b") == 3) & (c % 2 == 0)))
    d = d.unionAll(d.where(F.col("b") == 7))
    return partition_anomaly(d, F.col("b"),
                             lo_ppm=600_000, hi_ppm=1_500_000)


_PARTITION_ANOMALY_SQL = """
WITH base AS (SELECT doc_id, doc_id % 12 AS b FROM documents
              WHERE NOT (doc_id % 12 = 3 AND doc_id % 2 = 0)),
u AS (SELECT * FROM base UNION ALL SELECT * FROM base WHERE b = 7),
g AS (SELECT b AS bucket, count(*)::BIGINT AS n_rows
      FROM u GROUP BY 1),
m AS (SELECT a[(len(a) + 1) // 2] AS median_rows
      FROM (SELECT list_sort(list(n_rows)) AS a FROM g)),
j AS (SELECT bucket, n_rows, median_rows,
        floor((n_rows * 1000000)::DOUBLE / median_rows)::BIGINT
          AS ratio_ppm
      FROM g, m)
SELECT bucket, n_rows, median_rows, ratio_ppm,
  CASE WHEN ratio_ppm < 600000 THEN 'low'
       WHEN ratio_ppm > 1500000 THEN 'high'
       ELSE 'ok' END AS status
FROM j"""


_FP_COLS = ["doc_id", "lang", "source", "text"]


def _fp_new_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'next snapshot' of documents with all three churn kinds
    planted deterministically: edits (doc_id%97==5 text suffix),
    deletes (doc_id%101==7 dropped), inserts (doc_id%103==11
    re-keyed +1_000_000 with synthetic text)."""
    c = F.col("doc_id")
    base = _docs(spark, sf_dir)
    edited = base.where(~((c % 101) == 7)).withColumn(
        "text",
        F.when((c % 97) == 5,
               F.concat(F.col("text"), F.lit(" [edited]")))
        .otherwise(F.col("text")))
    ins = base.where((c % 103) == 11).select(
        (c + 1_000_000).alias("doc_id"),
        F.concat(F.lit("inserted row "), c.cast("string")).alias("text"),
        F.col("lang"), F.col("source"),
        F.lit(50).cast("long").alias("n_chars"))
    return edited.unionByName(ins)


_FP_NEW_SQL = """
newd AS (
  SELECT doc_id,
         CASE WHEN doc_id % 97 = 5 THEN text || ' [edited]'
              ELSE text END AS text,
         lang, source, n_chars
  FROM documents WHERE NOT (doc_id % 101 = 7)
  UNION ALL
  SELECT doc_id + 1000000, 'inserted row ' || doc_id::VARCHAR,
         lang, source, 50::BIGINT
  FROM documents WHERE doc_id % 103 = 11)"""

_FP_RENDER = ("concat_ws(chr(1), coalesce(doc_id::VARCHAR, '<NULL>'), "
              "coalesce(lang, '<NULL>'), coalesce(source, '<NULL>'), "
              "coalesce(text, '<NULL>'))")


def _fp_diff_ctes() -> str:
    return f"""{_FP_NEW_SQL},
fa AS (SELECT h % 64 AS bucket, count(*)::BIGINT AS n,
         bit_xor(h)::BIGINT AS x, sum(h % 1000003)::BIGINT AS m
       FROM (SELECT {_h56(_FP_RENDER)} AS h FROM documents) GROUP BY 1),
fb AS (SELECT h % 64 AS bucket, count(*)::BIGINT AS n,
         bit_xor(h)::BIGINT AS x, sum(h % 1000003)::BIGINT AS m
       FROM (SELECT {_h56(_FP_RENDER)} AS h FROM newd) GROUP BY 1),
d AS (SELECT coalesce(fa.bucket, fb.bucket) AS bucket,
        coalesce(fa.n, 0)::BIGINT AS old_rows,
        coalesce(fb.n, 0)::BIGINT AS new_rows,
        NOT (coalesce(fa.n, -1) = coalesce(fb.n, -1)
             AND coalesce(fa.x, -1) = coalesce(fb.x, -1)
             AND coalesce(fa.m, -1) = coalesce(fb.m, -1)) AS changed
      FROM fa FULL OUTER JOIN fb ON fa.bucket = fb.bucket)"""


def q_fingerprint_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucket-level snapshot diff over the planted-churn corpus: which
    1/64 slices of the table changed between snapshots (edits, deletes
    and inserts all land in specific buckets; untouched buckets prove
    themselves unchanged with no row-level state)."""
    from jsonschema_spark.operators.checks import fingerprint_diff

    return fingerprint_diff(_docs(spark, sf_dir),
                            _fp_new_docs(spark, sf_dir), _FP_COLS, 64)


def _fingerprint_diff_sql() -> str:
    return f"WITH {_fp_diff_ctes()}\nSELECT * FROM d"


def q_incremental_validate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental revalidation — the resumable-manifest story: diff
    the snapshot fingerprints, then run DOCS_SCHEMA validation ONLY
    over new-snapshot rows landing in changed buckets (the ≤64-key
    bucket list broadcasts into the scan as a semi-join filter; at
    100 TB the validator re-reads 1/64 granularity instead of the
    table). Per changed bucket: rows, valid, invalid."""
    from jsonschema_spark.operators.checks import (
        fingerprint_diff,
        row_fingerprint_hash,
    )

    base = _docs(spark, sf_dir)
    new = _fp_new_docs(spark, sf_dir)
    ch = fingerprint_diff(base, new, _FP_COLS, 64) \
        .where(F.col("changed")).select("bucket")
    tagged = new.withColumn(
        "bucket", row_fingerprint_hash(_FP_COLS) % 64)
    sel = tagged.join(F.broadcast(ch), "bucket")
    v = validate(sel, DOCS_SCHEMA,
                 instance_cols=["doc_id", "text", "lang", "source",
                                "n_chars"])
    return v.groupBy("bucket").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.col("valid").cast("long")).cast("long")
        .alias("n_valid"),
        F.sum((~F.col("valid")).cast("long")).cast("long")
        .alias("n_invalid"),
    )


def _incremental_validate_sql() -> str:
    return f"""WITH {_fp_diff_ctes()},
tag AS (SELECT *, {_h56(_FP_RENDER)} % 64 AS bucket FROM newd)
SELECT bucket, count(*)::BIGINT AS n_rows,
  sum(CASE WHEN {_DOCS_VALID_SQL} THEN 1 ELSE 0 END)::BIGINT AS n_valid,
  sum(CASE WHEN {_DOCS_VALID_SQL} THEN 0 ELSE 1 END)::BIGINT
    AS n_invalid
FROM tag
WHERE bucket IN (SELECT bucket FROM d WHERE changed)
GROUP BY 1"""


def q_salted_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-defused join attestation: a planted hot key (every third
    lineitem collapses onto orderkey 7 — a ~33 % single-key share no
    plain shuffle join should eat) joins orders via salt-and-replicate;
    the per-status roll-up is row-identical to the plain join the
    oracle runs, which is the operator's whole contract."""
    from jsonschema_spark.operators.referential import salted_join

    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    o = spark.read.parquet(_t(sf_dir, "orders"))
    hot = F.when(F.col("l_orderkey") % 3 == 0, F.lit(7)) \
        .otherwise(F.col("l_orderkey"))
    f = li.select(hot.alias("k"),
                  F.floor(F.col("l_quantity")).cast("long").alias("q"))
    d = o.select(F.col("o_orderkey").alias("dk"), "o_orderstatus")
    j = salted_join(f, d, "k", "dk", n_salts=16)
    return j.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("q").cast("long").alias("qty"))


_SALTED_JOIN_SQL = """
WITH f AS (SELECT CASE WHEN l_orderkey % 3 = 0 THEN 7
                       ELSE l_orderkey END AS k,
                  floor(l_quantity)::BIGINT AS q
           FROM lineitem),
j AS (SELECT o_orderstatus, q FROM f JOIN orders ON k = o_orderkey)
SELECT o_orderstatus, count(*)::BIGINT AS n_rows,
       sum(q)::BIGINT AS qty
FROM j GROUP BY 1"""


def q_host_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Link-farm clique detection: per-host triangle counts over a
    deterministic host graph (24-cycle + distance-2 chords from
    doc_ids (every consecutive host triple closes), plus a planted K4 link farm on q0..q3) via degree-ordered
    wedge counting — each triangle exactly once, wedge fan-out bounded
    by the orientation."""
    from jsonschema_spark.operators.linkgraph import triangle_counts

    c = F.col("doc_id")
    h = lambda e: F.concat(F.lit("h"), e.cast("string"))  # noqa: E731
    d = _docs(spark, sf_dir)
    e1 = d.select(h(c % 24).alias("src"), h((c + 1) % 24).alias("dst"))
    e2 = d.select(h(c % 24).alias("src"), h((c + 2) % 24).alias("dst"))
    pairs = [("q0", "q1"), ("q0", "q2"), ("q0", "q3"),
             ("q1", "q2"), ("q1", "q3"), ("q2", "q3")]
    k4 = d.where(c % 125 == 1).select(F.explode(F.array(*[
        F.struct(F.lit(x).alias("src"), F.lit(y).alias("dst"))
        for x, y in pairs])).alias("e")).select("e.src", "e.dst")
    return triangle_counts(e1.unionAll(e2).unionAll(k4))


_HOST_TRIANGLES_SQL = """
WITH raw AS (
  SELECT 'h' || (doc_id % 24)::VARCHAR AS src,
         'h' || ((doc_id + 1) % 24)::VARCHAR AS dst FROM documents
  UNION ALL
  SELECT 'h' || (doc_id % 24)::VARCHAR,
         'h' || ((doc_id + 2) % 24)::VARCHAR FROM documents
  UNION ALL
  SELECT v.src, v.dst
  FROM (VALUES ('q0','q1'),('q0','q2'),('q0','q3'),
               ('q1','q2'),('q1','q3'),('q2','q3')) v(src, dst)
  WHERE EXISTS (SELECT 1 FROM documents WHERE doc_id % 125 = 1)
),
e0 AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
       FROM raw
       WHERE src IS NOT NULL AND dst IS NOT NULL AND src <> dst),
dg AS (SELECT n, count(*)::BIGINT AS dgc
       FROM (SELECT unnest([a, b]) AS n FROM e0) GROUP BY 1),
ed AS (SELECT a, b, x.dgc AS da, y.dgc AS db
       FROM e0 JOIN dg x ON e0.a = x.n JOIN dg y ON e0.b = y.n),
e AS (SELECT CASE WHEN row(da, a) < row(db, b) THEN a ELSE b END AS u,
             CASE WHEN row(da, a) < row(db, b) THEN b ELSE a END AS v,
             CASE WHEN row(da, a) < row(db, b) THEN db ELSE da END
               AS dv
      FROM ed),
w AS (SELECT p.u AS u, p.v AS v, q.v AS w
      FROM e p JOIN e q
        ON p.u = q.u AND row(p.dv, p.v) < row(q.dv, q.v)),
t AS (SELECT w.u, w.v, w.w FROM w
      JOIN e c ON w.v = c.u AND w.w = c.v),
x AS (SELECT unnest([u, v, w]) AS host FROM t)
SELECT host, count(*)::BIGINT AS n_triangles FROM x GROUP BY 1"""


def q_join_size_est(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-flight join-cardinality estimate (AGMS/CM inner product):
    two d×w count-min sketches of the join keys answer what
    lineitem ⋈ orders would produce without running it — the
    broadcast-vs-salt-vs-shuffle decision input. Attested beside the
    exact size with the realized overcount in ppm (CMS only ever
    over-counts)."""
    from jsonschema_spark.operators.stats import cms_join_size, cms_sketch

    d, w = 4, 1024
    li = spark.read.parquet(_t(sf_dir, "lineitem"))
    o = spark.read.parquet(_t(sf_dir, "orders"))
    est = cms_join_size(cms_sketch(li, "l_orderkey", d, w),
                        cms_sketch(o, "o_orderkey", d, w), d)
    ca = li.groupBy(F.col("l_orderkey").alias("k")) \
        .agg(F.count(F.lit(1)).alias("_ca"))
    cb = o.groupBy(F.col("o_orderkey").alias("k")) \
        .agg(F.count(F.lit(1)).alias("_cb"))
    exact = ca.join(cb, "k").agg(
        F.sum(F.col("_ca") * F.col("_cb")).cast("long")
        .alias("exact_rows"))
    j = est.crossJoin(exact)
    return j.select(
        "est_join_rows", "exact_rows",
        F.floor(((F.col("est_join_rows") - F.col("exact_rows"))
                 * 1_000_000).cast("double") / F.col("exact_rows"))
        .cast("long").alias("overcount_ppm"))


def _join_size_est_sql() -> str:
    d, w = 4, 1024
    probe = ("CAST(CAST(('0x' || substr(md5(ix.i::VARCHAR || ':' || "
             "v::VARCHAR), 1, 14)) AS BIGINT) % {w} AS INTEGER)")
    return f"""
WITH pa AS (SELECT l_orderkey AS v FROM lineitem
            WHERE l_orderkey IS NOT NULL),
pb AS (SELECT o_orderkey AS v FROM orders
       WHERE o_orderkey IS NOT NULL),
ska AS (SELECT row, bucket, count(*)::BIGINT AS cnt
        FROM (SELECT ix.i AS row, {probe.format(w=w)} AS bucket
              FROM pa, LATERAL (SELECT unnest(range(0, {d})) AS i) ix)
        GROUP BY 1, 2),
skb AS (SELECT row, bucket, count(*)::BIGINT AS cnt
        FROM (SELECT ix.i AS row, {probe.format(w=w)} AS bucket
              FROM pb, LATERAL (SELECT unnest(range(0, {d})) AS i) ix)
        GROUP BY 1, 2),
dots AS (SELECT a.row, sum(a.cnt * b.cnt)::BIGINT AS dot
         FROM ska a JOIN skb b
           ON a.row = b.row AND a.bucket = b.bucket
         GROUP BY 1),
est AS (SELECT min(coalesce(dot, 0))::BIGINT AS est_join_rows
        FROM (SELECT unnest(range(0, {d})) AS row) r
        LEFT JOIN dots USING (row)),
ex AS (SELECT count(*)::BIGINT AS exact_rows
       FROM pa JOIN pb ON pa.v = pb.v)
SELECT est_join_rows, exact_rows,
  floor(((est_join_rows - exact_rows) * 1000000)::DOUBLE
        / exact_rows)::BIGINT AS overcount_ppm
FROM est, ex"""


def q_sampled_verdict(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 25 %-sample validation estimate over documents —
    the cheap gate before a full run: hash-selected rows are identical
    in any engine/re-run, one scan, one aggregation."""
    from jsonschema_spark.operators.validate import sampled_verdict

    return sampled_verdict(_docs(spark, sf_dir), DOCS_SCHEMA,
                           "doc_id", 250_000)


_SAMPLED_VERDICT_SQL = f"""
WITH s AS (SELECT *,
    (('0x' || substr(md5(doc_id::VARCHAR), 1, 14))::BIGINT % 1000000
     < 250000) AS ins,
    ({_DOCS_VALID_SQL}) AS ok
  FROM documents),
a AS (SELECT count(*)::BIGINT AS n_total,
        sum(CASE WHEN ins THEN 1 ELSE 0 END)::BIGINT AS n_sampled,
        sum(CASE WHEN ins AND ok THEN 1 ELSE 0 END)::BIGINT AS n_valid,
        sum(CASE WHEN ins THEN
              (CASE WHEN ok THEN 0 ELSE 1 END) ELSE 0 END)::BIGINT
          AS n_invalid
      FROM s)
SELECT n_total, n_sampled, n_valid, n_invalid,
  floor((n_invalid * 1000000)::DOUBLE / n_sampled)::BIGINT
    AS est_invalid_ppm
FROM a"""


def q_violation_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 failing keyword locations over documents with counts and
    corpus share — the 'which constraint is responsible' view; the
    hot_keys plan shape (TakeOrderedAndProject, broadcast total,
    window over 10 survivors)."""
    from jsonschema_spark.operators.validate import violation_pareto

    return violation_pareto(_docs(spark, sf_dir), DOCS_SCHEMA,
                            ["doc_id"], k=10)


def _violation_pareto_sql() -> str:
    return f"""WITH viol AS ({_VIOL_SQL}),
g AS (SELECT keywordLocation, count(*)::BIGINT AS n_violations
      FROM viol GROUP BY 1),
t AS (SELECT sum(n_violations) AS tot FROM g),
top AS (SELECT * FROM g
        ORDER BY n_violations DESC, keywordLocation LIMIT 10)
SELECT keywordLocation, n_violations,
  floor((n_violations * 1000000)::DOUBLE / tot)::BIGINT AS share_ppm,
  row_number() OVER (ORDER BY n_violations DESC, keywordLocation)
    ::BIGINT AS rnk
FROM top, t"""


_DOC_SUITE = [
    {"name": "size", "check": "size_min", "min": 100},
    {"name": "text_complete", "check": "completeness", "col": "text",
     "min_ppm": 900_000},
    {"name": "docid_pk", "check": "distinctness", "col": "doc_id",
     "min_ppm": 1_000_000},
    {"name": "lang_domain", "check": "contained_ppm", "col": "lang",
     "allowed": ["de", "en", "es", "fr"], "min_ppm": 1_000_000},
    # ceiling check: NO text may carry the edit marker — the planted
    # snapshot edits break exactly this, firing 'regressed'
    {"name": "edited_marker", "check": "match_ppm", "col": "text",
     "pattern": r" \[edited\]$", "max_ppm": 0},
    {"name": "nchars_mean", "check": "mean_scaled_between",
     "col": "n_chars", "scale": 1, "lo": 1, "hi": 1000},
]


def q_check_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Check-metric drift between snapshots: the same 6-check contract
    evaluated over the old documents and the planted-churn next
    snapshot, joined into (old, new, delta, verdict). The edit-marker
    ceiling regresses (pass → fail) — the page-someone row — while
    completeness/PK/domain/mean stay steady under churn."""
    from jsonschema_spark.operators.checks import check_drift, check_suite

    old = check_suite(_docs(spark, sf_dir), _DOC_SUITE)
    new = check_suite(_fp_new_docs(spark, sf_dir), _DOC_SUITE)
    return check_drift(old, new)


def _doc_suite_sql(src: str) -> str:
    """(check_name, metric, status) rows of _DOC_SUITE over ``src`` —
    the same metric/threshold recipe check_suite plans."""
    ppm = "floor(({n} * 1000000)::DOUBLE / {d})::BIGINT"
    agg = f"""(SELECT count(*)::BIGINT AS n,
      count(text)::BIGINT AS nn_t,
      count(DISTINCT doc_id)::BIGINT AS nd_id,
      count(lang)::BIGINT AS nn_l,
      sum((lang IN ('de','en','es','fr'))::INT)::BIGINT AS in_l,
      sum(regexp_matches(text, ' \\[edited\\]$')::INT)::BIGINT AS rx_t,
      count(n_chars)::BIGINT AS nn_c,
      sum(floor(n_chars::DOUBLE)::BIGINT)::BIGINT AS sq_c
    FROM {src})"""
    checks = [
        ("size", "n", 100, _OPEN_BOUND),
        ("text_complete", ppm.format(n="nn_t", d="n"),
         900_000, 1_000_000),
        ("docid_pk", ppm.format(n="nd_id", d="n"),
         1_000_000, 1_000_000),
        ("lang_domain", ppm.format(n="in_l", d="nn_l"),
         1_000_000, 1_000_000),
        ("edited_marker", ppm.format(n="rx_t", d="nn_t"), 0, 0),
        ("nchars_mean", "floor(sq_c::DOUBLE / nn_c)::BIGINT", 1, 1000),
    ]
    rows = [
        (f"SELECT '{nm}' AS check_name, {m} AS metric, "
         f"CASE WHEN {m} >= {lo} AND {m} <= {hi} THEN 'pass' "
         f"ELSE 'fail' END AS status FROM ag_{src}")
        for nm, m, lo, hi in checks
    ]
    return f"ag_{src} AS {agg}, su_{src} AS ({' UNION ALL '.join(rows)})"


def _check_drift_sql() -> str:
    return f"""WITH {_FP_NEW_SQL},
{_doc_suite_sql('documents')},
{_doc_suite_sql('newd')}
SELECT coalesce(o.check_name, nw.check_name) AS check_name,
  o.metric AS old_metric, nw.metric AS new_metric,
  (nw.metric - o.metric)::BIGINT AS delta,
  CASE WHEN o.check_name IS NULL THEN 'added'
       WHEN nw.check_name IS NULL THEN 'retired'
       WHEN o.status = 'pass' AND nw.status = 'fail' THEN 'regressed'
       WHEN o.status = 'fail' AND nw.status = 'pass' THEN 'recovered'
       ELSE 'steady' END AS verdict
FROM su_documents o FULL OUTER JOIN su_newd nw
  ON o.check_name = nw.check_name"""


_BL_TERMS_RE = r"\b(casino|lottery)\b"


def q_blocklist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UT1-style blocklist routing over the messy-url corpus with
    planted content: doc_id%9==0 gains two term hits (blocked at
    max_hits=2), %9==1 gains one (soft, kept); messy-url doc_id%5
    classes 1 and 3 land on the two blocked registered domains. Pure
    codegen scan — PSL InSet probe + one regexp_count, no shuffle."""
    from jsonschema_spark.operators.curate import blocklist_route

    c = F.col("doc_id")
    t = F.when(c % 9 == 0,
               F.concat(F.col("text"),
                        F.lit(" Casino night casino prize"))) \
        .when(c % 9 == 1,
              F.concat(F.col("text"), F.lit(" LOTTERY winner"))) \
        .otherwise(F.col("text"))
    d = _docs(spark, sf_dir).select(c, "source", t.alias("text")) \
        .withColumn("url", _messy_url())
    out = blocklist_route(d, "url", "text",
                          ["crawl-site.org", "city.kobe.jp"],
                          ["casino", "lottery"], max_hits=2)
    return out.select("doc_id", "reg_domain", "term_hits", "route")


def _blocklist_sql() -> str:
    from jsonschema_spark.operators.urltools import _URL_RE

    return f"""WITH {_psl_sql_ctes()},
pdocs AS (SELECT doc_id, source,
            CASE WHEN doc_id % 9 = 0
                 THEN text || ' Casino night casino prize'
                 WHEN doc_id % 9 = 1 THEN text || ' LOTTERY winner'
                 ELSE text END AS text
          FROM documents),
m AS (SELECT doc_id, text, {_MESSY_URL_SQL} AS url FROM pdocs),
hs AS (SELECT doc_id, text, host, string_split(host, '.') AS ls
       FROM (SELECT doc_id, text,
               lower(regexp_extract(url, '{_URL_RE}', 2)) AS host
             FROM m)),
rd AS (SELECT doc_id,
         {_psl_reg_sql(want='reg')} AS reg_domain,
         coalesce(len(regexp_extract_all(
             lower(text), '{_BL_TERMS_RE}')), 0)::BIGINT AS term_hits
       FROM hs)
SELECT doc_id, reg_domain, term_hits,
  CASE WHEN reg_domain IN ('crawl-site.org', 'city.kobe.jp')
       THEN 'blocked_domain'
       WHEN term_hits >= 2 THEN 'blocked_content'
       ELSE 'keep' END AS route
FROM rd"""


def q_url_pub_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publication-date extraction from CMS-style URL paths: /Y/M/D/
    blog paths, /Y/M/ archives, Y-M-D slugs and undated pages planted
    per doc_id%4, with months sweeping 1..16 so regex-invalid dates
    (month 13-16) genuinely occur and must yield NULLs."""
    from jsonschema_spark.operators.urltools import url_pub_date

    c = F.col("doc_id")
    y = (c % 10 + 2015).cast("string")
    m = F.lpad((c % 16 + 1).cast("string"), 2, "0")
    d = F.lpad((c % 28 + 1).cast("string"), 2, "0")
    url = F.concat(
        F.lit("https://s"), (c % 20).cast("string"), F.lit(".example.org"),
        F.when(c % 4 == 0, F.concat(F.lit("/blog/"), y, F.lit("/"), m,
                                    F.lit("/"), d, F.lit("/post.html")))
        .when(c % 4 == 1, F.concat(F.lit("/news/"), y, F.lit("/"), m,
                                   F.lit("/")))
        .when(c % 4 == 2, F.concat(F.lit("/p/item-"), y, F.lit("-"), m,
                                   F.lit("-"), d, F.lit(".html")))
        .otherwise(F.concat(F.lit("/about/page"), c.cast("string"),
                            F.lit(".html"))))
    docs = _docs(spark, sf_dir).select("doc_id", url.alias("url"))
    return url_pub_date(docs, "url")


def _url_pub_date_sql() -> str:
    from jsonschema_spark.operators.urltools import (
        URLDATE_DAY_DASH_RE, URLDATE_DAY_SLASH_RE, URLDATE_MON_SLASH_RE)

    return f"""
WITH b AS (SELECT doc_id,
    (doc_id % 10 + 2015)::VARCHAR AS y,
    lpad((doc_id % 16 + 1)::VARCHAR, 2, '0') AS m,
    lpad((doc_id % 28 + 1)::VARCHAR, 2, '0') AS d
  FROM documents),
u AS (SELECT doc_id,
    'https://s' || (doc_id % 20)::VARCHAR || '.example.org' ||
    CASE WHEN doc_id % 4 = 0
         THEN '/blog/' || y || '/' || m || '/' || d || '/post.html'
         WHEN doc_id % 4 = 1 THEN '/news/' || y || '/' || m || '/'
         WHEN doc_id % 4 = 2
         THEN '/p/item-' || y || '-' || m || '-' || d || '.html'
         ELSE '/about/page' || doc_id::VARCHAR || '.html' END AS url
  FROM b),
x AS (SELECT doc_id, url,
    regexp_extract(url, '{URLDATE_DAY_SLASH_RE}', 1) AS s1,
    regexp_extract(url, '{URLDATE_DAY_SLASH_RE}', 2) AS s2,
    regexp_extract(url, '{URLDATE_DAY_SLASH_RE}', 3) AS s3,
    regexp_extract(url, '{URLDATE_DAY_DASH_RE}', 2) AS h1,
    regexp_extract(url, '{URLDATE_DAY_DASH_RE}', 3) AS h2,
    regexp_extract(url, '{URLDATE_DAY_DASH_RE}', 4) AS h3,
    regexp_extract(url, '{URLDATE_MON_SLASH_RE}', 1) AS m1,
    regexp_extract(url, '{URLDATE_MON_SLASH_RE}', 2) AS m2
  FROM u)
SELECT doc_id, url,
    CASE WHEN s1 <> '' THEN s1 || '-' || s2 || '-' || s3
         WHEN h1 <> '' THEN h1 || '-' || h2 || '-' || h3
         WHEN m1 <> '' THEN m1 || '-' || m2 || '-01' END AS pub_date,
    CASE WHEN s1 <> '' OR h1 <> '' THEN 'day'
         WHEN m1 <> '' THEN 'month' END AS date_precision
FROM x"""


def q_cache_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9111 cache directives → recrawl routing over synthetic-but-
    real response headers: no-store on mod-11, max-age sweeping the
    no-cache/hourly/daily/weekly buckets, ETag / Last-Modified /
    IMF-fixdate Expires on their own mod classes. Expires re-rendered
    to ISO by pure regex + month CASE (no engine date parsing — the
    cross-engine tz/locale trap), adversarial max-age overflow
    try_cast-safe."""
    from jsonschema_spark.operators.httpmeta import cache_policy_df

    c = F.col("doc_id")
    crlf = F.lit("\r\n")
    cc = (F.when(c % 11 == 0,
                 F.concat(crlf, F.lit("Cache-Control: no-store, private")))
          .when(c % 7 != 3,
                F.concat(crlf, F.lit("Cache-Control: public, max-age="),
                         ((c % 90) * 1000).cast("string")))
          .otherwise(F.lit("")))
    etag = F.when(c % 3 == 0, F.concat(
        crlf, F.lit("ETag: \"e"), c.cast("string"), F.lit("\"")))
    lm = F.when(c % 13 == 0, F.concat(
        crlf, F.lit("Last-Modified: Thu, 01 Jan 2026 00:00:00 GMT")))
    exp = F.when(c % 5 == 0, F.concat(
        crlf, F.lit("Expires: Wed, "),
        F.lpad(((c % 28) + 1).cast("string"), 2, "0"),
        F.lit(" Oct 2026 07:28:00 GMT")))
    hdrs = F.concat(
        F.lit("HTTP/1.1 200 OK"), crlf, F.lit("Content-Type: text/html"),
        cc, F.coalesce(etag, F.lit("")), F.coalesce(lm, F.lit("")),
        F.coalesce(exp, F.lit("")))
    d = _docs(spark, sf_dir).select("doc_id", hdrs.alias("hdrs"))
    return cache_policy_df(d, "doc_id", "hdrs")


def _cache_policy_sql() -> str:
    from jsonschema_spark.operators.httpmeta import MONTHS

    crlf = "chr(13) || chr(10)"
    mon_case = "CASE m " + " ".join(
        f"WHEN '{m}' THEN '{i:02d}'" for i, m in enumerate(MONTHS, 1)
    ) + " END"
    exp_re = (r"(?m)^expires:\s*[a-z]{3}, "
              r"(\d{2}) ([a-z]{3}) (\d{4}) (\d{2}:\d{2}:\d{2}) gmt")
    return f"""
WITH h AS (SELECT doc_id,
    'HTTP/1.1 200 OK' || {crlf} || 'Content-Type: text/html'
    || CASE WHEN doc_id % 11 = 0
            THEN {crlf} || 'Cache-Control: no-store, private'
            WHEN doc_id % 7 <> 3
            THEN {crlf} || 'Cache-Control: public, max-age='
                 || ((doc_id % 90) * 1000)::VARCHAR
            ELSE '' END
    || CASE WHEN doc_id % 3 = 0
            THEN {crlf} || 'ETag: "e' || doc_id::VARCHAR || '"'
            ELSE '' END
    || CASE WHEN doc_id % 13 = 0
            THEN {crlf} || 'Last-Modified: Thu, 01 Jan 2026 00:00:00 GMT'
            ELSE '' END
    || CASE WHEN doc_id % 5 = 0
            THEN {crlf} || 'Expires: Wed, '
                 || lpad(((doc_id % 28) + 1)::VARCHAR, 2, '0')
                 || ' Oct 2026 07:28:00 GMT'
            ELSE '' END AS hdrs
  FROM documents),
l AS (SELECT doc_id, lower(hdrs) AS hl FROM h),
x AS (SELECT doc_id, hl,
    regexp_extract(hl, '(?m)^cache-control:([^\\r\\n]*)', 1) AS cc,
    regexp_extract(hl, '{exp_re}', 1) AS dd,
    regexp_extract(hl, '{exp_re}', 2) AS m,
    regexp_extract(hl, '{exp_re}', 3) AS yyyy,
    regexp_extract(hl, '{exp_re}', 4) AS hms
  FROM l),
y AS (SELECT doc_id,
    CASE WHEN regexp_extract(cc, 'max-age=(\\d+)', 1) <> ''
         THEN try_cast(regexp_extract(cc, 'max-age=(\\d+)', 1) AS BIGINT)
    END AS max_age_s,
    contains(cc, 'no-store')::BIGINT AS no_store,
    contains(cc, 'no-cache')::BIGINT AS no_cache,
    contains(cc, 'private')::BIGINT AS private,
    regexp_matches(hl, '(?m)^etag:')::BIGINT AS has_etag,
    regexp_matches(hl, '(?m)^last-modified:')::BIGINT
      AS has_last_modified,
    CASE WHEN dd <> '' AND {mon_case} IS NOT NULL
         THEN yyyy || '-' || {mon_case} || '-' || dd || ' ' || hms
    END AS expires_iso
  FROM x)
SELECT *, CASE WHEN no_store = 1 OR no_cache = 1 OR max_age_s = 0
               THEN 'no-cache'
          WHEN max_age_s < 3600 THEN 'hourly'
          WHEN max_age_s < 86400 THEN 'daily'
          WHEN max_age_s IS NOT NULL THEN 'weekly'
          WHEN expires_iso IS NOT NULL THEN 'expires'
          WHEN has_etag = 1 OR has_last_modified = 1 THEN 'conditional'
          ELSE 'unknown' END AS policy
FROM y"""


def _skew_key() -> Column:
    c = F.col("doc_id")
    return F.concat(
        F.lit("h"),
        F.when(c % 2 == 0, F.lit(0)).otherwise(c % 97).cast("string"))


_SKEW_KK = ("SELECT 'h' || (CASE WHEN doc_id % 2 = 0 THEN 0 "
            "ELSE doc_id % 97 END)::VARCHAR AS k FROM documents")


def q_hot_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy-hitter report over a deliberately skewed synthetic key
    (every even doc lands on h0): the pre-shuffle measurement that
    decides salting/broadcast. TakeOrderedAndProject top-k, never a
    global sort; share from a broadcast one-row total."""
    from jsonschema_spark.operators.stats import hot_keys

    d = _docs(spark, sf_dir).select(_skew_key().alias("k"))
    return hot_keys(d, ["k"], k=10)


_HOT_KEYS_SQL = f"""
WITH kk AS ({_SKEW_KK}),
g AS (SELECT k, count(*)::BIGINT AS cnt FROM kk GROUP BY 1),
t AS (SELECT sum(cnt) AS n FROM g),
top AS (SELECT k, cnt FROM g ORDER BY cnt DESC, k ASC LIMIT 10)
SELECT k, cnt, floor((cnt * 1000000)::DOUBLE / n)::BIGINT AS share_ppm,
       row_number() OVER (ORDER BY cnt DESC, k ASC)::BIGINT AS rnk
FROM top, t"""


def q_key_skew_hist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Log2 key-size histogram over the same skewed key — the whole
    skew shape in ≤64 rows (bucket = bit length of the per-key count,
    portable via length(bin(cnt)) in both engines)."""
    from jsonschema_spark.operators.stats import key_size_histogram

    d = _docs(spark, sf_dir).select(_skew_key().alias("k"))
    return key_size_histogram(d, ["k"])


_KEY_SKEW_HIST_SQL = f"""
WITH kk AS ({_SKEW_KK}),
g AS (SELECT k, count(*)::BIGINT AS cnt FROM kk GROUP BY 1),
h AS (SELECT length(bin(cnt))::BIGINT AS cnt_bits,
             count(*)::BIGINT AS n_keys, sum(cnt)::BIGINT AS n_rows,
             max(cnt)::BIGINT AS max_cnt
      FROM g GROUP BY 1),
t AS (SELECT sum(n_rows) AS n FROM h)
SELECT cnt_bits, n_keys, n_rows, max_cnt,
       floor((n_rows * 1000000)::DOUBLE / n)::BIGINT AS rows_share_ppm
FROM h, t"""


_CODE_PY = ("\ndef f(x):\n    return x + 1\nclass Foo:\n"
            "    import os\n    my_val = 2")
_CODE_CC = "\nint main() {\n  println(theVal);\n  return 0;\n}"


def q_code_detect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Code-vs-prose routing over documents with Python planted on
    doc_id%4==0 and a C-style block on doc_id%6==1 — the StarCoder-side
    complement of Gopher's has_brace DROP rule. Every signal (line
    endings, indentation, brace density, keyword/identifier counts) and
    the 2-of-5 vote replayed verbatim in DuckDB (all regexes
    Java∩RE2-safe; keyword single-match-per-start argument in
    textstats.CODE_KEYWORDS)."""
    from jsonschema_spark.operators.textstats import code_detect_df

    d = _docs(spark, sf_dir)
    t = F.col("text")
    t = F.when(F.col("doc_id") % 4 == 0,
               F.concat(t, F.lit(_CODE_PY))).otherwise(t)
    t = F.when(F.col("doc_id") % 6 == 1,
               F.concat(t, F.lit(_CODE_CC))).otherwise(t)
    return code_detect_df(d.select("doc_id", t.alias("text")),
                          "doc_id", "text")


def _code_detect_sql() -> str:
    from jsonschema_spark.operators.textstats import (
        BRACE_CHARS, CAMEL_RE, CODE_KEYWORD_RE, SNAKE_RE)

    py = "E'" + _CODE_PY.replace("\n", r"\n") + "'"
    cc = "E'" + _CODE_CC.replace("\n", r"\n") + "'"
    return f"""
WITH p AS (SELECT doc_id,
    CASE WHEN doc_id % 4 = 0 THEN text || {py} ELSE text END AS t0
  FROM documents WHERE text IS NOT NULL),
p2 AS (SELECT doc_id,
    CASE WHEN doc_id % 6 = 1 THEN t0 || {cc} ELSE t0 END AS t FROM p),
s AS (SELECT doc_id, t,
    list_filter(string_split(t, chr(10)), l -> trim(l) <> '') AS lines
  FROM p2),
m AS (SELECT doc_id, t, len(lines)::BIGINT AS n_lines,
    greatest(len(lines), 1) AS nl1,
    greatest(length(t), 1) AS len1,
    len(list_filter(lines, l -> regexp_matches(l, '[;{{}}]\\s*$')))
      AS semi_end,
    len(list_filter(lines, l -> regexp_matches(l, '^(\\t| {{4}})')))
      AS indent,
    length(t) - length(translate(t, '{BRACE_CHARS}', '')) AS n_brace,
    len(regexp_extract_all(t, '{CODE_KEYWORD_RE}'))::BIGINT AS n_kw,
    len(regexp_extract_all(t, '{CAMEL_RE}'))::BIGINT AS n_camel,
    len(regexp_extract_all(t, '{SNAKE_RE}'))::BIGINT AS n_snake
  FROM s),
r AS (SELECT doc_id, n_lines,
    floor((semi_end * 1000000)::DOUBLE / nl1)::BIGINT AS semi_end_ppm,
    floor((indent * 1000000)::DOUBLE / nl1)::BIGINT AS indent_ppm,
    floor((n_brace * 1000000)::DOUBLE / len1)::BIGINT AS brace_ppm,
    n_kw AS n_keywords, n_camel, n_snake
  FROM m)
SELECT *, ((semi_end_ppm >= 150000)::INT + (indent_ppm >= 300000)::INT
         + (brace_ppm >= 20000)::INT + (n_keywords >= 3)::INT
         + (n_camel + n_snake >= 3)::INT >= 2)::BIGINT AS is_code
FROM r"""


def q_redirect_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redirect-chain resolution by pointer jumping over a synthetic hop
    graph: per-doc chains down to mod-5 terminals, a 13-node chain that
    overruns the 8-hop horizon mid-chain, and a planted 2-cycle — the
    three behaviors (resolve, truncate, loop) all attested per row
    against a DuckDB recursive-CTE replay capped at the same horizon."""
    from jsonschema_spark.operators.linkgraph import resolve_redirects

    def u(c):
        return F.concat(F.lit("https://r"), c.cast("string"),
                        F.lit(".example.org/"))

    d = _docs(spark, sf_dir).select("doc_id")
    base = d.where(F.col("doc_id") % 5 != 0).select(
        u(F.col("doc_id")).alias("src"),
        u(F.col("doc_id") - 1).alias("dst"))
    ch = spark.range(12).select(
        F.concat(F.lit("chain"), F.col("id").cast("string")).alias("src"),
        F.concat(F.lit("chain"), (F.col("id") + 1).cast("string"))
        .alias("dst"))
    loop = spark.createDataFrame([("loopA", "loopB"), ("loopB", "loopA")],
                                 "src string, dst string")
    out = resolve_redirects(base.unionAll(ch).unionAll(loop),
                            "src", "dst", max_hops=8)
    return out.withColumn("resolved", F.col("resolved").cast("int"))


_REDIRECT_RESOLVE_SQL = """
WITH RECURSIVE e AS (
  SELECT 'https://r' || doc_id::VARCHAR || '.example.org/' AS src,
         'https://r' || (doc_id - 1)::VARCHAR || '.example.org/' AS dst
  FROM documents WHERE doc_id % 5 <> 0
  UNION ALL
  SELECT 'chain' || i::VARCHAR, 'chain' || (i + 1)::VARCHAR
  FROM (SELECT unnest(range(0, 12)) AS i)
  UNION ALL SELECT 'loopA', 'loopB'
  UNION ALL SELECT 'loopB', 'loopA'),
p AS (SELECT src AS node, min(dst) AS ptr FROM e GROUP BY 1),
w AS (
  SELECT node, ptr, 1 AS hops FROM p
  UNION ALL
  SELECT w.node, p.ptr, w.hops + 1 FROM w JOIN p ON w.ptr = p.node
  WHERE w.hops < 8),
f AS (SELECT node, arg_max(ptr, hops) AS final_url,
             max(hops)::BIGINT AS n_hops
      FROM w GROUP BY 1)
SELECT node AS url, final_url, n_hops,
       CASE WHEN final_url IN (SELECT node FROM p) THEN 0 ELSE 1 END
         AS resolved
FROM f"""


def q_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking (LBFS/FastCDC lineage): boundaries open
    where the 3-token gram hash ≡ 0 mod 16, chunks are the
    insertion-robust unit of storage dedup. Every chunk row (position,
    length, portable chunk hash) attested against a DuckDB replay of
    the identical cumsum-over-boundary-flags construction."""
    from jsonschema_spark.operators.dedup import cdc_chunks_df

    return cdc_chunks_df(_docs(spark, sf_dir), "doc_id", "text")


def _cdc_chunks_sql() -> str:
    gram = "toks[j0+1] || ' ' || toks[j0+2] || ' ' || toks[j0+3]"
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
tok AS (SELECT doc_id, j - 1 AS j0, toks[j] AS tok, len(toks) AS L, toks
        FROM t, LATERAL (SELECT unnest(range(1, len(toks)+1)) AS j) ix),
fl AS (SELECT doc_id, j0, tok,
         CASE WHEN j0 > 0 AND j0 + 3 <= L
              AND {_h56(gram)} % 16 = 0
              THEN 1 ELSE 0 END AS bf
       FROM tok),
ck AS (SELECT doc_id, j0, tok,
              sum(bf) OVER (PARTITION BY doc_id ORDER BY j0) AS chunk_id
       FROM fl)
SELECT doc_id, chunk_id::BIGINT AS chunk_id,
       min(j0)::BIGINT AS start_tok, count(*)::BIGINT AS n_toks,
       {_h56("string_agg(tok, ' ' ORDER BY j0)")} AS chunk_hash
FROM ck GROUP BY 1, 2"""


def q_mime_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Magic-byte MIME sniffing over REAL container bytes: synthetic
    PNG/GIF/JPEG/WAV/MP4 headers (synth_media_bytes) with pdf/gzip/zip/
    garbage payloads planted on doc_id%10 ∈ {9,8,7,6} — the Spark side
    reads the bytes (pure codegen hex CASE, no UDF); the oracle
    recomputes the answer arithmetically from doc_id, so a sniffer
    regression breaks the hash."""
    from jsonschema_spark.operators.multimodal import (media_from_documents,
                                                       sniff_mime)

    media = media_from_documents(_docs(spark, sf_dir), payload="media")
    i = F.col("media_id")
    pay = (
        F.when(i % 10 == 9, F.unhex(F.lit("255044462D312E35")))
        .when(i % 10 == 8, F.unhex(F.lit("1F8B080000000000")))
        .when(i % 10 == 7, F.unhex(F.lit("504B030414000600")))
        .when(i % 10 == 6, F.unhex(F.lit("DEADBEEF")))
        .otherwise(F.col("payload"))
    )
    return media.select("media_id", sniff_mime(pay).alias("mime"))


def _mime_sniff_sql() -> str:
    return """
SELECT doc_id AS media_id,
       CASE WHEN doc_id % 10 = 9 THEN 'application/pdf'
            WHEN doc_id % 10 = 8 THEN 'application/gzip'
            WHEN doc_id % 10 = 7 THEN 'application/zip'
            WHEN doc_id % 10 = 6 THEN 'application/octet-stream'
            WHEN doc_id % 3 = 1 THEN 'audio/x-wav'
            WHEN doc_id % 3 = 2 THEN 'video/mp4'
            WHEN (doc_id % 9) // 3 = 0 THEN 'image/png'
            WHEN (doc_id % 9) // 3 = 1 THEN 'image/gif'
            ELSE 'image/jpeg' END AS mime
FROM documents"""


def q_trustrank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded TrustRank (Gyöngyi et al. VLDB 2004) over the
    quadratic-residue host lattice (src h(i%40) → dst h((i²+1)%40),
    multi-edges kept as weight) with h0-h2 as the trusted seed set —
    trust attenuates with link distance from the seeds; integer-ppm
    arithmetic makes the 3-iteration fixpoint bit-stable."""
    from jsonschema_spark.operators.linkgraph import trustrank_df

    i = F.col("doc_id")
    h = lambda c: F.concat(F.lit("h"), c.cast("string"),  # noqa: E731
                           F.lit(".example.org"))
    edges = _docs(spark, sf_dir).select(
        h(i % 40).alias("src_host"),
        h((i * i + 1) % 40).alias("dst_host"),
    ).where(F.col("src_host") != F.col("dst_host"))
    seeds = spark.createDataFrame(
        [("h0.example.org",), ("h1.example.org",), ("h2.example.org",)],
        "host string")
    return trustrank_df(edges, seeds, n_iter=3)


def _trustrank_sql() -> str:
    from jsonschema_spark.operators.linkgraph import trustrank_sql

    edges_cte = (
        "SELECT 'h' || (doc_id % 40)::VARCHAR || '.example.org' AS src_host,"
        " 'h' || ((doc_id * doc_id + 1) % 40)::VARCHAR || '.example.org'"
        " AS dst_host FROM documents"
        " WHERE (doc_id % 40) <> ((doc_id * doc_id + 1) % 40)")
    seeds_cte = ("SELECT * FROM (VALUES ('h0.example.org'),"
                 " ('h1.example.org'), ('h2.example.org')) t(host)")
    return trustrank_sql(edges_cte, seeds_cte, n_iter=3)


def q_stupid_backoff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stupid-backoff trigram LM scoring (Brants et al. 2007) trained
    in-engine on the reference-domain subset (source src0-2) with
    min_count=2 pruning — every tier one exact int64 division (0.4·x ≡
    2x div 5), so the backoff-tier census and the ppm score hash-match
    DuckDB bit-for-bit. Scoring: one explode → three broadcast joins →
    one groupBy(doc)."""
    from jsonschema_spark.operators.lm import stupid_backoff_score

    d = _docs(spark, sf_dir)
    ref = d.where(F.col("source").isin("src0", "src1", "src2"))
    return stupid_backoff_score(d, "doc_id", "text", ref_df=ref,
                                min_count=2)


def _stupid_backoff_sql() -> str:
    return f"""
WITH reft AS (SELECT {{toks}} AS toks FROM documents
              WHERE source IN {{refsrc}}),
pos AS (SELECT toks[i] AS w1,
               CASE WHEN i + 1 <= len(toks) THEN toks[i+1] END AS w2,
               CASE WHEN i + 2 <= len(toks) THEN toks[i+2] END AS w3
        FROM reft, LATERAL (SELECT unnest(range(1, len(toks)+1)) AS i) ix),
cc1 AS (SELECT w1 AS w, count(*)::BIGINT AS c1 FROM pos GROUP BY 1),
cc2 AS (SELECT w1, w2, count(*)::BIGINT AS c2 FROM pos
        WHERE w2 IS NOT NULL GROUP BY 1, 2),
cc3 AS (SELECT w1, w2, w3, count(*)::BIGINT AS c3 FROM pos
        WHERE w3 IS NOT NULL GROUP BY 1, 2, 3 HAVING count(*) >= 2),
nn AS (SELECT count(*)::BIGINT AS n FROM pos),
t AS (SELECT doc_id, {{toks}} AS toks FROM documents),
dtr AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2, toks[i+2] AS w3
        FROM t, LATERAL (SELECT unnest(range(1, len(toks)-1)) AS i) ix
        WHERE len(toks) >= 3),
sc AS (SELECT doc_id,
        CASE WHEN tr.c3 IS NOT NULL THEN (1000000 * tr.c3) // x2.c2
             WHEN bn.c2 IS NOT NULL THEN (2000000 * bn.c2) // (5 * x1.c1)
             WHEN u.c1 IS NOT NULL
               THEN (4000000 * u.c1) // (25 * (SELECT n FROM nn))
             ELSE 0 END AS p,
        CASE WHEN tr.c3 IS NOT NULL THEN 3
             WHEN bn.c2 IS NOT NULL THEN 2
             WHEN u.c1 IS NOT NULL THEN 1 ELSE 0 END AS tier
     FROM dtr
     LEFT JOIN cc3 tr ON tr.w1 = dtr.w1 AND tr.w2 = dtr.w2
                     AND tr.w3 = dtr.w3
     LEFT JOIN cc2 x2 ON x2.w1 = dtr.w1 AND x2.w2 = dtr.w2
     LEFT JOIN (SELECT * FROM cc2 WHERE c2 >= 2) bn
            ON bn.w1 = dtr.w2 AND bn.w2 = dtr.w3
     LEFT JOIN cc1 x1 ON x1.w = dtr.w2
     LEFT JOIN (SELECT * FROM cc1 WHERE c1 >= 2) u ON u.w = dtr.w3),
agg AS (SELECT doc_id, count(*)::BIGINT AS n, sum(p)::BIGINT AS s,
               sum(CASE WHEN tier = 3 THEN 1 ELSE 0 END)::BIGINT AS t3,
               sum(CASE WHEN tier = 2 THEN 1 ELSE 0 END)::BIGINT AS t2,
               sum(CASE WHEN tier = 1 THEN 1 ELSE 0 END)::BIGINT AS t1,
               sum(CASE WHEN tier = 0 THEN 1 ELSE 0 END)::BIGINT AS t0
        FROM sc GROUP BY 1)
SELECT d.doc_id, coalesce(agg.n, 0)::BIGINT AS n_trigrams,
       coalesce(agg.s // agg.n, 0)::BIGINT AS sb_score_ppm,
       coalesce(agg.t3, 0)::BIGINT AS n_tier3,
       coalesce(agg.t2, 0)::BIGINT AS n_tier2,
       coalesce(agg.t1, 0)::BIGINT AS n_tier1,
       coalesce(agg.t0, 0)::BIGINT AS n_oov
FROM documents d LEFT JOIN agg USING (doc_id)""".format(
        toks=_TOKS, refsrc=_REF_SRC)


def q_url_param_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Learn strip-safe query params from content-signature evidence
    (urltools.url_param_policy). Fixture: 7 hosts × 13 paths; ``page``
    changes the content signature, ``utm`` (present on 40% of urls)
    never does, ``sess`` is a high-cardinality session id — the learner
    must mark utm strip-safe, page content-bearing, and leave sess
    below min_support. The oracle replays the full algorithm
    (base-group construction with sorted residual params) in DuckDB."""
    from jsonschema_spark.operators.dedup import hash56
    from jsonschema_spark.operators.urltools import url_param_policy

    i = F.col("doc_id")
    s = lambda c: c.cast("string")  # noqa: E731
    host = F.concat(F.lit("h"), s(i % 7), F.lit(".example.org"))
    path = F.concat(F.lit("/p/"), s(i % 13))
    url = F.concat(
        F.lit("https://"), host, path, F.lit("?page="), s(i % 2),
        F.when(i % 5 < 2, F.concat(F.lit("&utm="), s(i % 11)))
        .otherwise(F.lit("")),
        F.when(i % 17 == 0, F.concat(F.lit("&sess="), s(i)))
        .otherwise(F.lit("")),
    )
    sig = hash56(F.concat(host, path, F.lit("#"), s(i % 2)))
    rows = _docs(spark, sf_dir).select(url.alias("url"),
                                       sig.cast("string").alias("sig"))
    return url_param_policy(rows, "url", "sig")


def _url_param_policy_sql() -> str:
    sig = _h56("'h' || (doc_id % 7)::VARCHAR || '.example.org/p/' || "
               "(doc_id % 13)::VARCHAR || '#' || (doc_id % 2)::VARCHAR")
    return f"""
WITH raw AS (
  SELECT 'https://h' || (doc_id % 7)::VARCHAR || '.example.org/p/'
         || (doc_id % 13)::VARCHAR || '?page=' || (doc_id % 2)::VARCHAR
         || CASE WHEN doc_id % 5 < 2
                 THEN '&utm=' || (doc_id % 11)::VARCHAR ELSE '' END
         || CASE WHEN doc_id % 17 = 0
                 THEN '&sess=' || doc_id::VARCHAR ELSE '' END AS u,
         {sig}::VARCHAR AS sig
  FROM documents),
pages AS (SELECT u, min(sig) AS sig FROM raw GROUP BY 1),
parsed AS (SELECT u, sig,
    regexp_extract(u, '^([^:/?#]+)://([^/?#:]*)', 2) AS host,
    regexp_extract(u, '^([^?#]*)', 1) AS pre,
    string_split(regexp_extract(u, '\\?([^#]*)', 1), '&') AS params
  FROM pages WHERE regexp_extract(u, '\\?([^#]*)', 1) <> ''),
keyed AS (SELECT u, sig, host, pre, params, kx.param
  FROM parsed, LATERAL (SELECT unnest(list_distinct(list_transform(
       params, x -> split_part(x, '=', 1)))) AS param) kx),
based AS (SELECT host, param, u, sig,
    -- coalesce: DuckDB array_to_string([]) is NULL, Spark array_join '' —
    -- the round-3 trap; a NULL base would fuse every no-residual URL into
    -- one bogus evidence group per (host,param)
    pre || '|' || coalesce(array_to_string(list_sort(list_filter(
      params, x -> split_part(x, '=', 1) <> param)), '&'), '') AS base
  FROM keyed),
grp AS (SELECT host, param, base,
               count(DISTINCT u) AS n_urls, count(DISTINCT sig) AS n_sigs
        FROM based GROUP BY 1, 2, 3),
pol AS (SELECT host, param, count(*)::BIGINT AS n_groups,
               sum(CASE WHEN n_sigs = 1 THEN 1 ELSE 0 END)::BIGINT
                 AS n_invariant
        FROM grp WHERE n_urls >= 2 GROUP BY 1, 2)
SELECT host, param, n_groups, n_invariant,
       floor(n_invariant * 1000000.0 / n_groups)::BIGINT AS invariant_ppm,
       (n_groups >= 3
        AND floor(n_invariant * 1000000.0 / n_groups) >= 950000)
         AS strip_safe
FROM pol"""


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    # ORDER MATTERS for the driver's correctness gate, which attests
    # entries in dict order and may truncate by count/time budget.
    # Rounds 1-4 cumulatively attested 102 of the 190 queries; the front
    # block is the remaining 88 with no driver row ever, fronted per
    # VERDICT r4 directive #1 so the round-5 gate attests them.
    return {
        # --- round-5 front block: the 88 queries with NO driver
        # CORRECTNESS row in any of rounds 1-4 (VERDICT r4 directive 1).
        # The gate attests in dict order and truncates by TIME budget,
        # so the block is ordered cheapest-first by measured sf0.01 gate
        # wall (ORACLE_SELFCHECK_r05.md): 50 rows cost 37.6s vs 61.7s
        # under the family grouping — the same budget attests ~20 more
        # rows. streaming_hll_state (the directive-6 streaming-path
        # attestation, ~12s of stream machinery) is pinned at position
        # 25 so it lands safely inside any budget that reached 50 rows
        # in round 4.
        "leakage_safe_split": q_leakage_safe_split,
        "readability": q_readability,
        "budget_sample": q_budget_sample,
        "charset_guess": q_charset_guess,
        "link_stats": q_link_stats,
        "html_extract": q_html_extract,
        "dedup_keep_latest": q_dedup_keep_latest,
        "corr_profile": q_corr_profile,
        "chunk_docs": q_chunk_docs,
        "nfc_normalize": q_nfc_normalize,
        "compression_ratio": q_compression_ratio,
        "domain_cap": q_domain_cap,
        "sitemap_entries": q_sitemap_entries,
        "mojibake_repair": q_mojibake_repair,
        "bpe_token_counts": q_bpe_token_counts,
        "drift_hist": q_drift_hist,
        "validate_cube": q_validate_cube,
        "export_shards": q_export_shards,
        "warc_records": q_warc_records,
        "snapshot_delta": q_snapshot_delta,
        "url_kmv_sketch": q_url_kmv_sketch,
        "url_bloom_bits": q_url_bloom_bits,
        "robots_sitemap_urls": q_robots_sitemap_urls,
        "crawler_traps": q_crawler_traps,
        "streaming_hll_state": q_streaming_hll_state,
        "sessionize_events": q_sessionize_events,
        "recrawl_priority": q_recrawl_priority,
        "hist_quantiles_chars": q_hist_quantiles_chars,
        "hist_quantiles_ts": q_hist_quantiles_ts,
        "anchor_terms": q_anchor_terms,
        "page_meta": q_page_meta,
        "boilerplate_strip": q_boilerplate_strip,
        "embedding_project": q_embedding_project,
        "url_dedup": q_url_dedup,
        "url_hll_sketch": q_url_hll_sketch,
        "script_profile": q_script_profile,
        "host_reciprocity": q_host_reciprocity,
        "top_ngrams": q_top_ngrams,
        "homoglyph": q_homoglyph,
        "epoch_plan": q_epoch_plan,
        "vocab_stats": q_vocab_stats,
        "mixture_sample": q_mixture_sample,
        "url_distinct_hll": q_url_distinct_hll,
        "bloom_decontaminate": q_bloom_decontaminate,
        "hashed_embedding": q_hashed_embedding,
        "canonical_dedup": q_canonical_dedup,
        "main_content": q_main_content,
        "wet_export": q_wet_export,
        "bm25_search": q_bm25_search,
        "containment_pairs": q_containment_pairs,
        "token_cms": q_token_cms,
        "frontier_interleave": q_frontier_interleave,
        "budget_sample_approx": q_budget_sample_approx,
        "tfidf_top_terms": q_tfidf_top_terms,
        "winnow_fingerprints": q_winnow_fingerprints,
        "dup_spans": q_dup_spans,
        "jsonld_validate": q_jsonld_validate,
        "temperature_mixture": q_temperature_mixture,
        "lm_score": q_lm_score,
        "url_normalize": q_url_normalize,
        "dsir_weight": q_dsir_weight,
        "prototypicality": q_prototypicality,
        "pack_sequences": q_pack_sequences,
        "shingle_novelty": q_shingle_novelty,
        "url_param_policy": q_url_param_policy,
        "tdigest_chars": q_tdigest_chars,
        "dup_span_remove": q_dup_span_remove,
        "robots_filter": q_robots_filter,
        "ccnet_buckets": q_ccnet_buckets,
        "host_stats": q_host_stats,
        "kmeans_cells": q_kmeans_cells,
        "url_kmv_overlap": q_url_kmv_overlap,
        "host_rank": q_host_rank,
        "template_clusters": q_template_clusters,
        "cdc_chunks": q_cdc_chunks,
        "crawl_schedule": q_crawl_schedule,
        "stupid_backoff": q_stupid_backoff,
        "mime_sniff": q_mime_sniff,
        "semantic_dedup": q_semantic_dedup,
        "host_hits": q_host_hits,
        "semantic_recall": q_semantic_recall,
        "dedup_incremental": q_dedup_incremental,
        "crawl_frontier": q_crawl_frontier,
        "public_suffix_stats": q_public_suffix_stats,
        "trustrank": q_trustrank,
        "lsh_recall": q_lsh_recall,
        "pipeline_end2end": q_pipeline_end2end,
        "bpe_merges": q_bpe_merges,
        "quality_classifier": q_quality_classifier,
        # --- driver-attested in rounds 1-4 (all green) ---
        "mixed_lang": q_mixed_lang,
        "redirect_resolve": q_redirect_resolve,
        "code_detect": q_code_detect,
        "hot_keys": q_hot_keys,
        "key_skew_hist": q_key_skew_hist,
        "cache_policy": q_cache_policy,
        "url_pub_date": q_url_pub_date,
        "domain_quality": q_domain_quality,
        "check_suite": q_check_suite,
        "check_suite_by": q_check_suite_by,
        "suggest_checks": q_suggest_checks,
        "fd_check": q_fd_check,
        "fd_compliance": q_fd_compliance,
        "json_key_census": q_json_key_census,
        "infer_props_schema": q_infer_props_schema,
        "benford": q_benford,
        "asof_join": q_asof_join,
        "funnel": q_funnel,
        "cohort_retention": q_cohort_retention,
        "chi2_lang_source": q_chi2_lang_source,
        "event_transitions": q_event_transitions,
        "typosquat": q_typosquat,
        "volume_trend": q_volume_trend,
        "collocations": q_collocations,
        "interarrival": q_interarrival,
        "volume_anomaly": q_volume_anomaly,
        "rrf_fuse": q_rrf_fuse,
        "corpus_diff": q_corpus_diff,
        "funnel_durations": q_funnel_durations,
        "ab_test": q_ab_test,
        "vocab_growth": q_vocab_growth,
        "source_overlap": q_source_overlap,
        "winsorize": q_winsorize,
        "session_rules": q_session_rules,
        "top_per_status": q_top_per_status,
        "median_mad": q_median_mad,
        "heatmap": q_heatmap,
        "path_census": q_path_census,
        "robust_outliers": q_robust_outliers,
        "reconcile_orders": q_reconcile_orders,
        "table_fingerprint": q_table_fingerprint,
        "partition_anomaly": q_partition_anomaly,
        "blocklist": q_blocklist,
        "fingerprint_diff": q_fingerprint_diff,
        "incremental_validate": q_incremental_validate,
        "check_drift": q_check_drift,
        "sampled_verdict": q_sampled_verdict,
        "violation_pareto": q_violation_pareto,
        "salted_join": q_salted_join,
        "host_triangles": q_host_triangles,
        "join_size_est": q_join_size_est,
        "fingerprint": q_fingerprint,
        "multimodal_features": q_multimodal_features,
        "validate_docs_counts": q_validate_docs_counts,
        "validate_docs_by_lang": q_validate_docs_by_lang,
        "violations_docs": q_violations_docs,
        "validate_events_payload": q_validate_events_payload,
        "validate_nested_orders": q_validate_nested_orders,
        "validate_pattern_props": q_validate_pattern_props,
        "violations_events": q_violations_events,
        "validate_combinators": q_validate_combinators,
        "violations_combinators": q_violations_combinators,
        "validate_multipleof": q_validate_multipleof,
        "validate_uniq_prefix_ref": q_validate_uniq_prefix_ref,
        "validate_recursive": q_validate_recursive,
        "validate_dynamic_ref": q_validate_dynamic_ref,
        "binpack_sizes": q_binpack_sizes,
        "validate_entrypoint": q_validate_entrypoint,
        "validate_unevaluated": q_validate_unevaluated,
        "annotations_docs": q_annotations_docs,
        "validate_formats": q_validate_formats,
        "profile_docs": q_profile_docs,
        "quantiles_n_chars": q_quantiles_n_chars,
        "drift_lang": q_drift_lang,
        "drift_n_chars": q_drift_n_chars,
        "dedup_exact_counts": q_dedup_exact_counts,
        "dedup_exact_keep_first": q_dedup_exact_keep_first,
        "referential_lang": q_referential_lang,
        "referential_orders_customer": q_referential_orders_customer,
        "events_hourly": q_events_hourly,
        "binary_sha256": q_binary_sha256,
        "dedup_minhash_sig": q_dedup_minhash_sig,
        "dedup_minhash_pairs": q_dedup_minhash_pairs,
        "dedup_clusters": q_dedup_clusters,
        "dedup_jaccard_pairs": q_dedup_jaccard_pairs,
        "dedup_simhash": q_dedup_simhash,
        "dedup_simhash_pairs": q_dedup_simhash_pairs,
        "dedup_embedding_pairs": q_dedup_embedding_pairs,
        "ann_topk": q_ann_topk,
        "ann_topk_lsh": q_ann_topk_lsh,
        "ann_topk_ivf": q_ann_topk_ivf,
        "text_quality": q_text_quality,
        "webtext_filters": q_webtext_filters,
        "gopher_repetition": q_gopher_repetition,
        "hash_split": q_hash_split,
        "clean_text": q_clean_text,
        "token_budget": q_token_budget,
        "curate_docs": q_curate_docs,
        "pii_scrub": q_pii_scrub,
        "contamination": q_contamination,
        "decontaminate_docs": q_decontaminate,
        "line_dedup": q_line_dedup,
        "langid": q_langid,
    }


_REF_SRC = "('src0', 'src1', 'src2')"

# add-one bigram LM trained on the src0-2 subset, every doc scored by mean
# smoothed bigram probability in floor-ppm (mirror of operators/lm.py:
# ngram_lm_score — same tokenization, same integer formula order)
_LM_SCORE_SQL = f"""
WITH reft AS (SELECT {_TOKS} AS toks FROM documents WHERE source IN {_REF_SRC}),
rbg AS (SELECT toks[i] AS w1, toks[i+1] AS w2
        FROM reft, LATERAL (SELECT unnest(range(1, len(toks))) AS i) ix
        WHERE len(toks) >= 2),
cc2 AS (SELECT w1, w2, count(*)::BIGINT AS c2 FROM rbg GROUP BY 1, 2),
cc1 AS (SELECT w1, sum(c2)::BIGINT AS c1 FROM cc2 GROUP BY 1),
vv AS (SELECT count(DISTINCT w) AS v FROM (SELECT unnest(toks) AS w FROM reft)),
t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
dbg AS (SELECT doc_id, toks[i] AS w1, toks[i+1] AS w2
        FROM t, LATERAL (SELECT unnest(range(1, len(toks))) AS i) ix
        WHERE len(toks) >= 2),
sc AS (SELECT doc_id,
              floor((coalesce(cc2.c2, 0) + 1) * 1000000
                    / (coalesce(cc1.c1, 0) + (SELECT v FROM vv)))::BIGINT AS p
       FROM dbg LEFT JOIN cc2 USING (w1, w2) LEFT JOIN cc1 USING (w1)),
agg AS (SELECT doc_id, count(*)::BIGINT AS n_bigrams,
               floor(sum(p)::DOUBLE / count(*))::BIGINT AS s
        FROM sc GROUP BY 1)
SELECT d.doc_id, coalesce(agg.n_bigrams, 0)::BIGINT AS n_bigrams,
       coalesce(agg.s, 0)::BIGINT AS lm_score_ppm
FROM documents d LEFT JOIN agg USING (doc_id)"""

# DSIR hashed-unigram importance weights: 1024 md5 buckets, add-one ppm
# probabilities target (src0-2) vs raw (all), per-doc sum (mirror of
# operators/lm.py:dsir_weight / dsir_bucket_weights)
_DSIR_SQL = f"""
WITH t AS (SELECT doc_id, source, {_TOKS} AS toks FROM documents),
tok AS (SELECT doc_id, source,
               ({_h56('w')} % 1024) AS b
        FROM (SELECT doc_id, source, unnest(toks) AS w FROM t)),
ct AS (SELECT b, count(*)::BIGINT AS c FROM tok WHERE source IN {_REF_SRC} GROUP BY 1),
cr AS (SELECT b, count(*)::BIGINT AS c FROM tok GROUP BY 1),
tt AS (SELECT count(*)::BIGINT AS n FROM tok WHERE source IN {_REF_SRC}),
tr AS (SELECT count(*)::BIGINT AS n FROM tok),
wt AS (SELECT tok.doc_id,
              ((coalesce(ct.c, 0) + 1) * 1000000) // ((SELECT n FROM tt) + 1024)
            - ((coalesce(cr.c, 0) + 1) * 1000000) // ((SELECT n FROM tr) + 1024) AS w
       FROM tok LEFT JOIN ct USING (b) LEFT JOIN cr USING (b)),
agg AS (SELECT doc_id, count(*)::BIGINT AS n_tokens, sum(w)::BIGINT AS s
        FROM wt GROUP BY 1)
SELECT d.doc_id, coalesce(agg.n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(agg.s, 0)::BIGINT AS dsir_weight_ppm
FROM documents d LEFT JOIN agg USING (doc_id)"""

def _classifier_sql() -> str:
    """Mirror of q_quality_classifier's SCORING pass: the weight vector is
    trained by the pure-Python mirror (classify.train_classifier_local) on
    the same embedded fixture — proven bit-identical to the Spark trainer
    by tests/test_classify.py — and inlined as a 65-int list literal; the
    hard sigmoid's Python-floor division replays as (z - pymod(z,4)) // 4
    (remainder-free, so DuckDB truncation == floor)."""
    from jsonschema_spark.operators.classify import train_classifier_local

    w = train_classifier_local(_cls_fixture(), bits=6, iters=3)
    wlit = "[" + ", ".join(str(x) for x in w) + "]"
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
f AS (SELECT doc_id, ({_h56('w')} % 64)::INT AS b, count(*)::BIGINT AS c
      FROM (SELECT doc_id, unnest(toks) AS w FROM t) GROUP BY 1, 2
      UNION ALL SELECT doc_id, 64, 1::BIGINT FROM documents),
m AS (SELECT doc_id, sum(c * ({wlit})[b + 1])::BIGINT AS z FROM f GROUP BY 1)
SELECT t.doc_id, len(t.toks)::BIGINT AS n_tokens, m.z AS score_ppm,
       least(greatest(500000 + (m.z - ((m.z % 4 + 4) % 4)) // 4, 0),
             1000000)::BIGINT AS p_ppm
FROM t JOIN m USING (doc_id)"""


def _bpe_merges_sql() -> str:
    """Ground truth for the DISTRIBUTED training loop: the pure-Python
    mirror (bpe.bpe_train_local — proven bit-identical to bpe_train by
    tests/test_bpe.py) trains on the same embedded fixture and the result
    inlines as VALUES; any deviation in the Spark loop flips the hash."""
    rows = ",\n       ".join(
        f"({rk}, '{l}', '{r}', {n})" for rk, l, r, n in _bpe_local_merges()
    )
    return f"""
SELECT * FROM (VALUES
       {rows}) AS t(rank, "left", "right", pair_count)"""


def _bpe_token_counts_sql() -> str:
    """Replays the identical chained-replace encode: per char ' c|', word
    terminator ' </w>|', then one replace() per merge in rank order —
    the same left-to-right non-overlapping pass semantics (standard
    replace resumes AFTER the emitted replacement in both engines)."""
    enc = "enc0"
    for _, l, r, _ in _bpe_local_merges():
        enc = f"replace({enc}, ' {l}| {r}|', ' {l}{r}|')"
    return f"""
WITH w AS (SELECT doc_id,
                  regexp_extract_all(lower(text), '[a-z]+') AS ws
           FROM documents),
e AS (SELECT doc_id, len(ws)::BIGINT AS n_words,
             array_to_string(list_transform(ws,
                 x -> regexp_replace(x, '(.)', ' \\1|', 'g') || ' </w>|'),
                 '') AS enc0
      FROM w),
n AS (SELECT doc_id, n_words,
             (length({enc}) - length(replace({enc}, '|', '')))::BIGINT AS n_tokens
      FROM e)
SELECT doc_id, n_words, n_tokens,
       CASE WHEN n_words > 0
            THEN floor(n_tokens * 1000000 / n_words)::BIGINT END AS fertility_ppm
FROM n"""


_KEEP_LATEST_SQL = """
WITH r AS (SELECT user_id, ts, event_id, event_type, value,
                  row_number() OVER (PARTITION BY user_id
                                     ORDER BY ts DESC, event_id DESC) AS rn,
                  count(*) OVER (PARTITION BY user_id) AS n_versions
           FROM events)
SELECT user_id, strftime(ts, '%Y-%m-%d %H:%M:%S') AS ts, event_id, event_type,
       floor(value * 1000)::BIGINT AS value_milli, n_versions::BIGINT AS n_versions
FROM r WHERE rn = 1"""


def _budget_sample_sql(budget: int = 2000) -> str:
    return f"""
WITH t AS (SELECT doc_id, lang, len({_TOKS})::BIGINT AS n_tokens,
                  {_h56("'budget:' || doc_id::VARCHAR")} AS h
           FROM documents),
c AS (SELECT doc_id, lang, n_tokens,
             sum(n_tokens) OVER (PARTITION BY lang ORDER BY h, doc_id
                                 ROWS UNBOUNDED PRECEDING)::BIGINT AS cum_tokens
      FROM t)
SELECT doc_id, lang, n_tokens, cum_tokens FROM c WHERE cum_tokens <= {budget}"""


def _psl_sql_ctes() -> str:
    """CTEs loading the packaged Public Suffix List (ICANN section) into
    kind-classified rule tables for the oracle mirror: pex exact rules,
    pw wildcard parents, pe exception rules — each with its label count
    ``k``. read_text replays the exact data file the Spark matcher
    embeds, so both engines see identical rule sets."""
    from jsonschema_spark.operators.urltools import PSL_ICANN_PATH

    return f"""
pslraw AS (SELECT trim(unnest(string_split(content, chr(10)))) AS rule
           FROM read_text('{PSL_ICANN_PATH}')),
psl AS (SELECT lower(rule) AS rule FROM pslraw
        WHERE rule <> '' AND rule NOT LIKE '//%'),
pex AS (SELECT rule, len(string_split(rule, '.')) AS k FROM psl
        WHERE rule NOT LIKE '!%' AND rule NOT LIKE '*.%'
          AND rule LIKE '%.%'),
pw AS (SELECT substr(rule, 3) AS rule,
              len(string_split(substr(rule, 3), '.')) AS k
       FROM psl WHERE rule LIKE '*.%'),
pe AS (SELECT substr(rule, 2) AS rule,
              len(string_split(substr(rule, 2), '.')) AS k
       FROM psl WHERE rule LIKE '!%')"""


def _psl_reg_sql(host: str = "host", ls: str = "ls",
                 want: str = "reg") -> str:
    """Registered-domain (``want='reg'``) or public-suffix
    (``want='ps'``) CASE expression walking the SAME probe plan as
    urltools._psl_column (exceptions first, then longest-match
    descending): one guarded IN-probe per plan entry, byte-identical
    output to the Spark InSet chain."""
    from jsonschema_spark.operators.urltools import psl_match_plan

    def lk(j: int) -> str:
        return (f"(CASE WHEN len({ls}) >= {j} THEN "
                f"array_to_string({ls}[len({ls})-{j}+1:], '.') "
                f"ELSE {host} END)")

    tbl = {0: "pe", 1: "pex", 2: "pw"}
    branches = []
    for k, kind in psl_match_plan(False):
        probe_k = k - 1 if kind == 2 else k
        cond = (f"len({ls}) >= {k} AND {lk(probe_k)} IN "
                f"(SELECT rule FROM {tbl[kind]} WHERE k = {probe_k})")
        if kind == 0:        # exception: public suffix = rule minus 1 label
            val = lk(k) if want == "reg" else lk(k - 1)
        else:
            val = lk(k + 1) if want == "reg" else lk(k)
        branches.append(f"WHEN {cond} THEN {val}")
    default = lk(2) if want == "reg" else lk(1)
    return "CASE " + " ".join(branches) + f" ELSE {default} END"


def _url_norm_core_sql() -> str:
    """Shared CTE chain: messy url -> parsed parts -> normalized url +
    host + registered domain (mirror of operators/urltools.py steps 1-5,
    same regex, same group numbers, same bytewise param sort, same
    PSL probe plan for the registered domain)."""
    from jsonschema_spark.operators.urltools import TRACKING_RE, _URL_RE

    return f"""
{_psl_sql_ctes()},
u AS (SELECT doc_id, source, n_chars, {_MESSY_URL_SQL} AS url FROM documents),
p AS (SELECT doc_id, n_chars, url,
        lower(regexp_extract(url, '{_URL_RE}', 1)) AS scheme,
        lower(regexp_extract(url, '{_URL_RE}', 2)) AS host,
        regexp_extract(url, '{_URL_RE}', 3) AS port,
        regexp_replace(regexp_extract(url, '{_URL_RE}', 4),
                       '/{{2,}}', '/', 'g') AS path,
        list_sort(list_filter(
          string_split(substr(regexp_extract(url, '{_URL_RE}', 5), 2), '&'),
          x -> NOT regexp_matches(x, '{TRACKING_RE}') AND x <> '')) AS kept
      FROM u),
ph AS (SELECT *, string_split(host, '.') AS ls FROM p),
n AS (SELECT doc_id, n_chars, url, host,
        scheme || '://' || host
        || CASE WHEN port='' OR (scheme='http' AND port=':80')
                  OR (scheme='https' AND port=':443') THEN '' ELSE port END
        || CASE WHEN path='' THEN '/' ELSE path END
        || CASE WHEN len(kept)=0 THEN ''
                ELSE '?' || array_to_string(kept, '&') END AS url_norm,
        {_psl_reg_sql()} AS reg_domain
      FROM ph)"""


_SHINGLE3 = ("CASE WHEN len(toks) >= 3 "
             "THEN list_distinct([array_to_string(toks[i:i+2], ' ') "
             "for i in range(1, len(toks)-2+1)]) "
             "ELSE []::VARCHAR[] END")


def _dedup_incremental_sql() -> str:
    """Mirror of dedup_against_corpus over the synthetic new crawl:
    exact md5 anti-join (NOT EXISTS — null-safe, a NULL in an IN-list
    silently drops every row), then the asymmetric band join on the same
    portable 12-hash / 6-band signatures as _MINHASH_PAIRS_SQL."""
    novel = " || ' ' || ".join(
        f"('nv{s}' || doc_id::VARCHAR)" for s in "abcde")
    return f"""
WITH newdocs AS (
  SELECT doc_id + 200000 AS doc_id,
         CASE WHEN doc_id < 50 THEN text
              WHEN doc_id < 100 THEN regexp_replace(text, '^\\S+\\s*', '')
              ELSE {novel} END AS text
  FROM documents WHERE doc_id < 150),
ex AS (SELECT n.doc_id, n.text FROM newdocs n
       WHERE NOT EXISTS (SELECT 1 FROM documents d
                         WHERE md5(d.text) = md5(n.text))),
nt AS (SELECT doc_id, {_TOKS} AS toks FROM ex),
nsh AS (SELECT doc_id, {_SHINGLE3} AS s FROM nt),
nsig AS (SELECT doc_id, {_SIG12} AS sig FROM nsh WHERE len(s) > 0),
nbands AS (SELECT doc_id, b.j AS band,
                  sig[2*b.j+1]::VARCHAR || '_' || sig[2*b.j+2]::VARCHAR AS band_key
           FROM nsig, (SELECT unnest(range(0, 6)) AS j) b),
rt AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
rsh AS (SELECT doc_id, {_SHINGLE3} AS s FROM rt),
rsig AS (SELECT doc_id, {_SIG12} AS sig FROM rsh WHERE len(s) > 0),
rbands AS (SELECT doc_id, b.j AS band,
                  sig[2*b.j+1]::VARCHAR || '_' || sig[2*b.j+2]::VARCHAR AS band_key
           FROM rsig, (SELECT unnest(range(0, 6)) AS j) b),
hits AS (SELECT DISTINCT n.doc_id FROM nbands n
         JOIN rbands r ON n.band = r.band AND n.band_key = r.band_key)
SELECT e.doc_id, length(e.text)::BIGINT AS n_chars FROM ex e
WHERE NOT EXISTS (SELECT 1 FROM hits h WHERE h.doc_id = e.doc_id)"""


def _dup_spans_sql(n: int = 8) -> str:
    """Mirror of dup_span_stats: every n-token window with multiplicity,
    hot grams = total count >= 2, ppm via the same double-divide-floor."""
    return f"""
WITH t AS (SELECT doc_id, {_TOKS} AS toks FROM documents),
g AS (SELECT doc_id, array_to_string(toks[i:i+{n - 1}], ' ') AS g
      FROM t, LATERAL (SELECT unnest(range(1, len(toks)-{n}+2)) AS i) ix
      WHERE len(toks) >= {n}),
pd AS (SELECT doc_id, g, count(*) AS m FROM g GROUP BY 1, 2),
tot AS (SELECT g FROM pd GROUP BY g HAVING sum(m) >= 2),
agg AS (SELECT pd.doc_id, sum(pd.m) AS n_spans,
               coalesce(sum(CASE WHEN tot.g IS NOT NULL THEN pd.m END), 0) AS n_dup
        FROM pd LEFT JOIN tot ON pd.g = tot.g GROUP BY 1)
SELECT doc_id, n_spans::BIGINT AS n_spans, n_dup::BIGINT AS n_dup_spans,
       floor(n_dup * 1000000 / n_spans)::BIGINT AS dup_span_ppm
FROM agg
UNION ALL
SELECT doc_id, 0::BIGINT, 0::BIGINT, 0::BIGINT
FROM t WHERE len(toks) < {n}"""


_BOILERPLATE_SQL = """
WITH d AS (SELECT doc_id, source,
                  CASE WHEN doc_id % 4 <> 3
                       THEN text || chr(10) || 'footer of ' || source
                       ELSE text END AS text2
           FROM documents WHERE text IS NOT NULL),
s AS (SELECT doc_id, source, string_split(text2, chr(10)) AS ls FROM d),
l AS (SELECT doc_id, source, i - 1 AS pos, ls[i] AS line
      FROM s, LATERAL (SELECT unnest(range(1, len(ls) + 1)) AS i) ix),
hot AS (SELECT source, md5(line) AS lk FROM l GROUP BY 1, 2
        HAVING count(DISTINCT doc_id) >= 2),
kept AS (SELECT l.* FROM l WHERE NOT EXISTS
          (SELECT 1 FROM hot h
           WHERE h.source = l.source AND h.lk = md5(l.line)))
SELECT doc_id, source, string_agg(line, chr(10) ORDER BY pos) AS text_stripped,
       count(*) AS n_lines_kept
FROM kept GROUP BY 1, 2
"""


def _domain_cap_sql(cap: int = 30) -> str:
    h = _h56("'domcap:' || doc_id::VARCHAR")
    return f"""
WITH c AS (SELECT source, count(*) AS n_group FROM documents GROUP BY 1),
r AS (SELECT doc_id, source,
             row_number() OVER (PARTITION BY source
                                ORDER BY {h}, doc_id) AS rn
      FROM documents)
SELECT r.doc_id, r.source, c.n_group
FROM r JOIN c USING (source) WHERE rn <= {cap}"""


def _url_normalize_sql() -> str:
    return (f"WITH {_url_norm_core_sql()} "
            "SELECT doc_id, url_norm, host, reg_domain FROM n")


def _public_suffix_stats_sql() -> str:
    """Per-public-suffix url/domain counts: same messy-url corpus, same
    lowercased host extraction, and the SAME PSL probe plan replayed from
    the packaged data file (want='ps' / want='reg' variants of the CASE
    chain)."""
    from jsonschema_spark.operators.urltools import _URL_RE

    return f"""WITH {_psl_sql_ctes()},
m AS (SELECT {_MESSY_URL_SQL} AS url FROM documents),
hs AS (SELECT host, string_split(host, '.') AS ls
       FROM (SELECT lower(regexp_extract(url, '{_URL_RE}', 2)) AS host
             FROM m)),
x AS (SELECT {_psl_reg_sql(want='ps')} AS public_suffix,
             {_psl_reg_sql(want='reg')} AS reg_domain
      FROM hs)
SELECT public_suffix, count(*)::BIGINT AS n_urls,
       count(DISTINCT reg_domain)::BIGINT AS n_reg_domains
FROM x GROUP BY 1"""


def _host_stats_sql() -> str:
    return f"""WITH {_url_norm_core_sql()}
SELECT reg_domain, count(*)::BIGINT AS n_pages,
       count(DISTINCT url_norm)::BIGINT AS n_urls,
       sum(n_chars)::BIGINT AS total_size
FROM n GROUP BY 1"""


def _url_dedup_sql() -> str:
    # mirror of url_dedup_df's max(struct(fetch_ts, url, doc_id)):
    # lexicographic max == ORDER BY each field DESC
    return f"""WITH {_url_norm_core_sql()},
r AS (SELECT url_norm, (doc_id*37)%1000 AS fetch_ts, doc_id,
             row_number() OVER (PARTITION BY url_norm
                                ORDER BY (doc_id*37)%1000 DESC,
                                         url DESC, doc_id DESC) AS rn
      FROM n)
SELECT url_norm, fetch_ts, doc_id FROM r WHERE rn = 1"""


def oracle_sql() -> dict[str, str]:
    return {
        "mixed_lang": _mixed_lang_sql(),
        "redirect_resolve": _REDIRECT_RESOLVE_SQL,
        "code_detect": _code_detect_sql(),
        "hot_keys": _HOT_KEYS_SQL,
        "key_skew_hist": _KEY_SKEW_HIST_SQL,
        "cache_policy": _cache_policy_sql(),
        "url_pub_date": _url_pub_date_sql(),
        "domain_quality": _domain_quality_sql(),
        "check_suite": _check_suite_sql(),
        "check_suite_by": _check_suite_by_sql(),
        "suggest_checks": _suggest_checks_sql(),
        "fd_check": _FD_CHECK_SQL,
        "fd_compliance": _FD_COMPLIANCE_SQL,
        "json_key_census": _JSON_KEY_CENSUS_SQL,
        "infer_props_schema": _INFER_PROPS_SQL,
        "benford": _benford_sql(),
        "asof_join": _ASOF_JOIN_SQL,
        "funnel": _FUNNEL_SQL,
        "cohort_retention": _COHORT_RETENTION_SQL,
        "chi2_lang_source": _CHI2_LANG_SOURCE_SQL,
        "event_transitions": _EVENT_TRANSITIONS_SQL,
        "typosquat": _typosquat_sql(),
        "volume_trend": _VOLUME_TREND_SQL,
        "collocations": _collocations_sql(),
        "interarrival": _INTERARRIVAL_SQL,
        "volume_anomaly": _VOLUME_ANOMALY_SQL,
        "rrf_fuse": _rrf_fuse_sql(),
        "corpus_diff": _corpus_diff_sql(),
        "funnel_durations": _funnel_durations_sql(),
        "ab_test": _AB_TEST_SQL,
        "vocab_growth": _vocab_growth_sql(),
        "source_overlap": _source_overlap_sql(),
        "winsorize": _WINSORIZE_SQL,
        "session_rules": _SESSION_RULES_SQL,
        "top_per_status": _TOP_PER_STATUS_SQL,
        "median_mad": _MEDIAN_MAD_SQL,
        "heatmap": _HEATMAP_SQL,
        "path_census": _PATH_CENSUS_SQL,
        "robust_outliers": _ROBUST_OUTLIERS_SQL,
        "reconcile_orders": _RECONCILE_ORDERS_SQL,
        "table_fingerprint": _TABLE_FINGERPRINT_SQL,
        "partition_anomaly": _PARTITION_ANOMALY_SQL,
        "blocklist": _blocklist_sql(),
        "fingerprint_diff": _fingerprint_diff_sql(),
        "incremental_validate": _incremental_validate_sql(),
        "check_drift": _check_drift_sql(),
        "sampled_verdict": _SAMPLED_VERDICT_SQL,
        "violation_pareto": _violation_pareto_sql(),
        "salted_join": _SALTED_JOIN_SQL,
        "host_triangles": _HOST_TRIANGLES_SQL,
        "join_size_est": _join_size_est_sql(),
        "homoglyph": _homoglyph_sql(),
        "cdc_chunks": _cdc_chunks_sql(),
        "mime_sniff": _mime_sniff_sql(),
        "trustrank": _trustrank_sql(),
        "stupid_backoff": _stupid_backoff_sql(),
        "url_param_policy": _url_param_policy_sql(),
        "page_meta": _page_meta_sql(),
        "mojibake_repair": _mojibake_repair_sql(),
        "pack_sequences": _pack_sequences_sql(),
        "tdigest_chars": _tdigest_chars_sql(),
        "jsonld_validate": _jsonld_validate_sql(),
        "recrawl_priority": _recrawl_priority_sql(),
        "host_reciprocity": _host_reciprocity_sql(),
        "embedding_project": _embedding_project_sql(),
        "epoch_plan": _epoch_plan_sql(),
        "wet_export": _wet_export_sql(),
        "canonical_dedup": _canonical_dedup_sql(),
        "url_hll_sketch": _hll_sketch_sql(),
        # streaming drain state == the batch sketch (associative/
        # commutative agg of a stateless projection) — same SQL replay
        "streaming_hll_state": _hll_sketch_sql(),
        "url_distinct_hll": _hll_distinct_sql(),
        "url_kmv_sketch": _kmv_sketch_sql(),
        "url_kmv_overlap": _kmv_overlap_sql(),
        "temperature_mixture": _temperature_mixture_sql(),
        "snapshot_delta": _SNAPSHOT_DELTA_SQL,
        "vocab_stats": _VOCAB_STATS_SQL,
        "shingle_novelty": _shingle_novelty_sql(),
        "url_bloom_bits": _bloom_bits_sql(),
        "bloom_decontaminate": _bloom_decontaminate_sql(),
        "crawl_schedule": _crawl_schedule_sql(),
        "robots_sitemap_urls": _robots_sitemaps_sql(),
        "bpe_merges": _bpe_merges_sql(),
        "bpe_token_counts": _bpe_token_counts_sql(),
        "token_cms": _token_cms_sql().format(toks=_TOKS),
        "hist_quantiles_chars": _hist_quantiles_sql(),
        "hist_quantiles_ts": _hist_quantiles_ts_sql(),
        "drift_hist": _drift_hist_sql(),
        "hashed_embedding": _hashed_embedding_sql(),
        "validate_docs_counts": f"""
            SELECT count(*) AS n_rows,
                   sum(CASE WHEN {_DOCS_VALID_SQL} THEN 1 ELSE 0 END)::BIGINT AS n_valid,
                   sum(CASE WHEN {_DOCS_VALID_SQL} THEN 0 ELSE 1 END)::BIGINT AS n_invalid
            FROM documents""",
        "validate_docs_by_lang": f"""
            SELECT lang, count(*) AS n_rows,
                   sum(CASE WHEN {_DOCS_VALID_SQL} THEN 1 ELSE 0 END)::BIGINT AS n_valid,
                   sum(CASE WHEN {_DOCS_VALID_SQL} THEN 0 ELSE 1 END)::BIGINT AS n_invalid
            FROM documents GROUP BY lang""",
        "violations_docs": _VIOL_SQL,
        "validate_events_payload": f"""
            SELECT event_type, count(*) AS n_rows,
                   sum(CASE WHEN {_EVENTS_VALID_SQL} THEN 1 ELSE 0 END)::BIGINT AS n_valid,
                   sum(CASE WHEN {_EVENTS_VALID_SQL} THEN 0 ELSE 1 END)::BIGINT AS n_invalid
            FROM events GROUP BY event_type""",
        "validate_nested_orders": """
            SELECT o_orderstatus AS status, count(*) AS n_rows,
                   sum(CASE WHEN ok THEN 1 ELSE 0 END)::BIGINT AS n_valid,
                   sum(CASE WHEN ok THEN 0 ELSE 1 END)::BIGINT AS n_invalid
            FROM (SELECT o_orderstatus,
                         (o_orderkey >= 1
                          AND o_orderstatus IN ('F','O','P')
                          AND o_totalprice > 0 AND o_totalprice * 2 > 0
                          AND (o_totalprice >= 100000 OR o_totalprice * 2 >= 100000)
                          AND regexp_matches(o_orderpriority, '^[1-3]-')) AS ok
                  FROM orders)
            GROUP BY 1""",
        "violations_events": """
            WITH f AS (SELECT event_id, try_cast(props ->> '$.k' AS BIGINT) AS k
                       FROM events
                       WHERE try_cast(props ->> '$.k' AS BIGINT) > 50)
            SELECT event_id, '/properties/k/maximum' AS keywordLocation,
                   'https://example.com/event-payload.schema.json#/properties/k/maximum' AS absoluteKeywordLocation,
                   '/k' AS instanceLocation,
                   'The integer value ' || k::VARCHAR ||
                   ' was expected to be less than or equal to the integer 50' AS error
            FROM f
            UNION ALL
            SELECT event_id, '/properties',
                   'https://example.com/event-payload.schema.json#/properties', '',
                   'The object value was expected to validate against the single defined property subschema'
            FROM f""",
        "validate_combinators": _COMBINATORS_SQL,
        "violations_combinators": _VIOL_COMBO_SQL,
        "validate_multipleof": _multipleof_sql(),
        "validate_uniq_prefix_ref": _UNIQ_SQL,
        "validate_recursive": _RECURSE_SQL,
        "validate_dynamic_ref": _DYNREF_SQL,
        "binpack_sizes": _BINPACK_SQL,
        "validate_entrypoint": _ENTRYPOINT_SQL,
        "validate_unevaluated": _UNEVAL_SQL,
        "annotations_docs": _ANNOT_SQL,
        "validate_formats": _formats_sql(),
        "validate_pattern_props": """
            SELECT event_type, count(*) AS n_rows,
                   sum(CASE WHEN event_type != 'error' AND value <= 250 THEN 1 ELSE 0 END)::BIGINT AS n_valid,
                   sum(CASE WHEN event_type != 'error' AND value <= 250 THEN 0 ELSE 1 END)::BIGINT AS n_invalid
            FROM events GROUP BY 1""",
        "profile_docs": _PROFILE_SQL,
        "quantiles_n_chars": _QUANTILES_SQL,
        "drift_lang": _DRIFT_SQL,
        "drift_n_chars": _DRIFT_NUM_SQL,
        "dedup_exact_counts": """
            SELECT count(*) AS n_docs, count(DISTINCT md5(text)) AS n_distinct_text,
                   count(*) - count(DISTINCT md5(text)) AS n_dup_docs
            FROM documents""",
        "dedup_exact_keep_first": """
            SELECT md5(text) AS text_key, min(doc_id) AS keep_id, count(*) AS n_copies
            FROM documents GROUP BY 1""",
        "referential_lang": """
            SELECT lang, count(*) AS n_bad FROM documents
            WHERE lang IS NULL OR lang NOT IN ('de','en','es','fr') GROUP BY lang""",
        "referential_orders_customer": """
            SELECT count(*) AS n_orders, count(c.c_custkey) AS n_matched,
                   count(*) - count(c.c_custkey) AS n_orphans
            FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey""",
        "events_hourly": _EVENTS_HOURLY_SQL,
        "binary_sha256": """
            SELECT doc_id, strlen(text) AS n_bytes, sha256(text) AS sha FROM documents""",
        "dedup_minhash_sig": _MINHASH_SIG_SQL,
        "dedup_minhash_pairs": _MINHASH_PAIRS_SQL,
        "dedup_clusters": _CLUSTERS_SQL,
        "dedup_jaccard_pairs": _JACCARD_SQL,
        "dedup_simhash": _SIMHASH_SQL,
        "dedup_simhash_pairs": _SIMHASH_PAIRS_SQL,
        "dedup_embedding_pairs": _EMB_PAIRS_SQL,
        "ann_topk": _ANN_TOPK_SQL,
        "ann_topk_lsh": _ANN_TOPK_LSH_SQL,
        "ann_topk_ivf": _ann_ivf_sql(),
        "text_quality": _TEXT_QUALITY_SQL,
        "webtext_filters": _WEBTEXT_SQL,
        "gopher_repetition": _repetition_sql(),
        "hash_split": _hash_split_sql(),
        "clean_text": """
SELECT doc_id,
       trim(regexp_replace(regexp_replace(text, '[\\x00-\\x1f\\x7f]', ' ', 'g'),
                           '\\s+', ' ', 'g')) AS text_clean,
       length(text)::BIGINT AS n_chars_raw,
       length(trim(regexp_replace(regexp_replace(text, '[\\x00-\\x1f\\x7f]', ' ', 'g'),
                                  '\\s+', ' ', 'g')))::BIGINT AS n_chars_clean
FROM documents WHERE text IS NOT NULL""",
        "token_budget": _token_budget_sql(),
        "curate_docs": _curate_sql(),
        "pii_scrub": _pii_sql(),
        "contamination": _CONTAM_SQL,
        "decontaminate_docs": _decontaminate_sql(),
        "line_dedup": _LINE_DEDUP_SQL,
        "langid": _langid_sql(),
        "fingerprint": _FINGERPRINT_SQL,
        # mirrors operators/multimodal.py:synth_media_fields — the Spark
        # side PARSES real container-header bytes; the oracle recomputes
        # the planted fields arithmetically (byte sizes are the fixed
        # header lengths emitted by synth_media_bytes)
        "multimodal_features": """
            SELECT doc_id AS media_id,
                   CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                        ELSE 'video' END AS kind,
                   CASE WHEN doc_id % 3 = 1 THEN 'wav'
                        WHEN doc_id % 3 = 2 THEN 'mp4'
                        WHEN (doc_id % 9) // 3 = 0 THEN 'png'
                        WHEN (doc_id % 9) // 3 = 1 THEN 'gif'
                        ELSE 'jpeg' END AS format,
                   (CASE WHEN doc_id % 3 = 1 THEN 44
                         WHEN doc_id % 3 = 2 THEN 232
                         WHEN (doc_id % 9) // 3 = 0 THEN 33
                         WHEN (doc_id % 9) // 3 = 1 THEN 14
                         ELSE 34 END)::BIGINT AS n_bytes,
                   (CASE WHEN doc_id % 3 IN (0, 2)
                         THEN 16 + (doc_id * 7) % 1000 END)::INT AS width,
                   (CASE WHEN doc_id % 3 IN (0, 2)
                         THEN 16 + (doc_id * 13) % 800 END)::INT AS height,
                   (CASE WHEN doc_id % 3 IN (1, 2)
                         THEN 100 + (doc_id * 31) % 60000 END)::BIGINT AS duration_ms,
                   (CASE WHEN doc_id % 3 = 1
                         THEN 8000 * (1 + doc_id % 5) END)::INT AS sample_rate_hz,
                   (CASE WHEN doc_id % 3 = 1
                         THEN 1 + doc_id % 2 END)::INT AS channels
            FROM documents""",
        "lm_score": _LM_SCORE_SQL,
        "dsir_weight": _DSIR_SQL,
        "quality_classifier": _classifier_sql(),
        "dedup_keep_latest": _KEEP_LATEST_SQL,
        "budget_sample": _budget_sample_sql(2000),
        "url_normalize": _url_normalize_sql(),
        "host_stats": _host_stats_sql(),
        "url_dedup": _url_dedup_sql(),
        "dedup_incremental": _dedup_incremental_sql(),
        "dup_spans": _dup_spans_sql(8),
        "dup_span_remove": _dup_span_remove_sql(8),
        "nfc_normalize": _NFC_SQL,
        "readability": _READABILITY_SQL,
        "winnow_fingerprints": _winnow_sql(),
        "tfidf_top_terms": _tfidf_sql(),
        "prototypicality": _prototypicality_sql(),
        "leakage_safe_split": _leakage_split_sql(),
        "lsh_recall": _lsh_recall_sql(),
        "containment_pairs": _containment_sql(),
        "semantic_recall": _semantic_recall_sql(),
        "pipeline_end2end": _pipeline_end2end_sql(),
        "top_ngrams": _top_ngrams_sql(),
        "validate_cube": _VALIDATE_CUBE_SQL,
        "mixture_sample": _mixture_sample_sql(),
        "boilerplate_strip": _BOILERPLATE_SQL,
        "domain_cap": _domain_cap_sql(15),
        "semantic_dedup": _semantic_dedup_sql(),
        "sessionize_events": _SESSIONIZE_SQL,
        "html_extract": _html_extract_sql(),
        "host_rank": _host_rank_sql(),
        "host_hits": _host_hits_sql(),
        "export_shards": _EXPORT_SHARDS_SQL,
        "anchor_terms": _anchor_terms_sql(),
        "bm25_search": _bm25_sql(),
        "chunk_docs": _chunk_docs_sql(),
        "kmeans_cells": _kmeans_sql(),
        "robots_filter": _robots_sql(),
        "warc_records": _WARC_SQL,
        "crawl_frontier": _crawl_frontier_sql(),
        "sitemap_entries": _sitemap_sql(),
        "ccnet_buckets": _ccnet_buckets_sql(),
        "main_content": _main_content_sql(),
        "charset_guess": _charset_sql(),
        "crawler_traps": _crawler_traps_sql(),
        "template_clusters": _template_clusters_sql(),
        "frontier_interleave": _frontier_sql(),
        "link_stats": _link_stats_sql(),
        "corr_profile": _CORR_SQL,
        "script_profile": _script_profile_sql(),
        # row-identical to the exact window form by construction
        # (tests/test_pipeline_ops.py equivalence + plan guard), so the
        # same SQL attests the histogram-cutoff path
        "budget_sample_approx": _budget_sample_sql(2000),
        "public_suffix_stats": _public_suffix_stats_sql(),
    }
