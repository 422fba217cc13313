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

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, functions as F

from jsonschema_spark import validate, violations, verdict_counts
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


def q_profile_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return profile_long(_docs(spark, sf_dir), ["doc_id", "text", "lang", "source", "n_chars"])


def q_quantiles_n_chars(spark: SparkSession, sf_dir: str) -> DataFrame:
    return numeric_quantiles(_docs(spark, sf_dir), "n_chars", [0.25, 0.5, 0.75])


def q_drift_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    return category_drift(_docs(spark, sf_dir), "lang", F.col("doc_id") % 2 == 0)


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
         sum(CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END) AS n_base,
         sum(CASE WHEN doc_id % 2 = 0 THEN 0 ELSE 1 END) AS n_cur
  FROM documents GROUP BY lang
), t AS (SELECT sum(n_base) AS tot_base, sum(n_cur) AS tot_cur FROM g)
SELECT category, n_base, n_cur,
       floor(abs(n_base*tot_cur - n_cur*tot_base) * 1000000 / (tot_base*tot_cur))::BIGINT AS diff_ppm
FROM g, t
"""

_EVENTS_HOURLY_SQL = """
SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, event_type,
       count(*) AS n_events, sum(floor(value * 1000)::BIGINT) AS value_milli
FROM events GROUP BY 1, 2
"""


# ---------------------------------------------------------------------------
# Contract functions
# ---------------------------------------------------------------------------


def entry(spark: SparkSession) -> DataFrame:
    """Flagship: violation rows (reference short-circuit semantics) for the
    documents table at sf0.001."""
    df = _docs(spark, "/root/testdata/sf0.001")
    return violations(df, DOCS_SCHEMA, id_cols=["doc_id"])


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "validate_docs_counts": q_validate_docs_counts,
        "validate_docs_by_lang": q_validate_docs_by_lang,
        "violations_docs": q_violations_docs,
        "validate_events_payload": q_validate_events_payload,
        "profile_docs": q_profile_docs,
        "quantiles_n_chars": q_quantiles_n_chars,
        "drift_lang": q_drift_lang,
        "dedup_exact_counts": q_dedup_exact_counts,
        "dedup_exact_keep_first": q_dedup_exact_keep_first,
        "referential_lang": q_referential_lang,
        "referential_orders_customer": q_referential_orders_customer,
        "events_hourly": q_events_hourly,
        "binary_sha256": q_binary_sha256,
    }


def oracle_sql() -> dict[str, str]:
    return {
        "validate_docs_counts": f"""
            SELECT count(*) AS n_rows,
                   sum(CASE WHEN {_DOCS_VALID_SQL} THEN 1 ELSE 0 END) AS n_valid,
                   sum(CASE WHEN {_DOCS_VALID_SQL} THEN 0 ELSE 1 END) AS n_invalid
            FROM documents""",
        "validate_docs_by_lang": f"""
            SELECT lang, count(*) AS n_rows,
                   sum(CASE WHEN {_DOCS_VALID_SQL} THEN 1 ELSE 0 END) AS n_valid,
                   sum(CASE WHEN {_DOCS_VALID_SQL} THEN 0 ELSE 1 END) AS n_invalid
            FROM documents GROUP BY lang""",
        "violations_docs": _VIOL_SQL,
        "validate_events_payload": f"""
            SELECT event_type, count(*) AS n_rows,
                   sum(CASE WHEN {_EVENTS_VALID_SQL} THEN 1 ELSE 0 END) AS n_valid,
                   sum(CASE WHEN {_EVENTS_VALID_SQL} THEN 0 ELSE 1 END) AS n_invalid
            FROM events GROUP BY event_type""",
        "profile_docs": _PROFILE_SQL,
        "quantiles_n_chars": _QUANTILES_SQL,
        "drift_lang": _DRIFT_SQL,
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
    }
