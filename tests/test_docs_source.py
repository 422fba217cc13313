"""The deterministic documents generator behind the sf1 pipeline bench:
fixed duplicate/boilerplate rates, pure codegen projection, stable output."""

from pyspark.sql import functions as F

from jsonschema_spark.sources.docs import documents_df


def _fingerprint(df):
    # bounded per-row term: ANSI mode throws on long-sum overflow
    return df.agg(
        F.sum(F.pmod(F.xxhash64("doc_id", "text", "lang", "source"), F.lit(1 << 40)))
    ).collect()[0][0]


def test_documents_df_deterministic(spark):
    assert _fingerprint(documents_df(spark, 5000)) == _fingerprint(
        documents_df(spark, 5000)
    )


def test_documents_df_prefix_stable(spark):
    """Row i's content depends only on i — a 2x corpus contains the 1x
    corpus as its doc_id prefix (scale steps compare like with like)."""
    small = documents_df(spark, 3000)
    big = documents_df(spark, 6000).filter(F.col("doc_id") < 3000)
    assert _fingerprint(small) == _fingerprint(big)


def test_documents_df_planted_rates(spark):
    df = documents_df(spark, 20000).cache()
    n = df.count()
    boiler = df.filter(F.col("text").startswith("subscribe to our")).count()
    dup_rows = (
        df.groupBy("text").count().filter("count > 1").agg(F.sum("count")).collect()[0][0]
    )
    assert 0.005 * n < boiler < 0.02 * n
    assert dup_rows > 0.03 * n  # planted exact-dup + boilerplate mass
    short = df.filter(F.size(F.split("text", " ")) < 12).count()
    assert 0.10 * n < short < 0.20 * n
    df.unpersist()


def test_documents_df_is_pure_codegen(spark):
    """No Python, no shuffle — the generator must be a range → project
    plan so data synthesis is never the bottleneck of what it feeds."""
    s = documents_df(spark, 100)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in s and "EvalPython" not in s
