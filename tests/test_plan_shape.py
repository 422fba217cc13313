"""Physical-plan regression guards — the scale-discipline contract.

These assert the properties the 100 TB posture depends on, so a refactor
can't silently regress them: the hot validation path stays inside
whole-stage codegen with no Python eval, filters and column pruning
reach the parquet scan, candidate-pair joins never degenerate to a
cross product, and the codec path uses Arrow batching (never
row-at-a-time BatchEvalPython)."""

import contextlib
import io

import pytest
from pyspark.sql import functions as F

from jsonschema_spark import validate

DOCS = "/root/testdata/sf0.001/documents.parquet"

SCHEMA = {"required": ["doc_id"],
          "properties": {"lang": {"enum": ["en", "de", "fr", "es"]},
                         "n_chars": {"minimum": 1, "maximum": 400}}}


def _plan(df, mode="formatted") -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


def test_fast_validate_is_pure_codegen(spark):
    df = validate(spark.read.parquet(DOCS), SCHEMA)
    plan = _plan(df)
    # formatted mode marks whole-stage-codegen stages as "[codegen id : N]"
    # (simple mode shows them as the "*(N)" prefix)
    assert "[codegen id : 1]" in plan and "*(1)" in _plan(df, "simple")
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    assert "Exchange" not in plan  # verdict column = zero shuffles


def test_filter_pushdown_reaches_scan(spark):
    df = spark.read.parquet(DOCS).filter(F.col("lang") == "en")
    plan = _plan(validate(df, SCHEMA))
    assert "PushedFilters: [IsNotNull(lang), EqualTo(lang,en)]" in plan


def test_column_pruning_reaches_scan(spark):
    df = validate(spark.read.parquet(DOCS), SCHEMA).select("doc_id", "valid")
    plan = _plan(df)
    # html/text-sized columns are never read for this projection
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln][0]
    assert "text" not in read_schema and "source" not in read_schema
    assert "doc_id" in read_schema and "lang" in read_schema


def test_pair_join_is_not_cross_product(spark):
    from jsonschema_spark.operators.dedup import minhash_lsh_pairs

    pairs = minhash_lsh_pairs(spark.read.parquet(DOCS), "doc_id", "text")
    plan = _plan(pairs, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_codec_path_is_arrow_batched(spark):
    from jsonschema_spark.operators.binpack import binpack_encode

    df = spark.read.parquet(DOCS).select(
        F.to_json(F.struct("doc_id", "lang")).alias("doc"))
    plan = _plan(df.select(binpack_encode(F.col("doc"))))
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan  # row-at-a-time Python is banned


def test_quality_filter_is_python_free(spark):
    from jsonschema_spark.operators.textstats import webtext_filters

    plan = _plan(webtext_filters(spark.read.parquet(DOCS), "doc_id", "text"))
    assert "EvalPython" not in plan  # neither Batch- nor Arrow-


def test_sessionize_single_exchange_no_python(spark):
    from jsonschema_spark.operators.stats import sessionize

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    df = sessionize(ev, "user_id", "ts", gap="12 hours", value_col="value")
    # native session windows: partial agg map-side, ONE exchange, then
    # Sort + MergingSessions — and never a per-event Python stage
    simple = _plan(df, "simple")
    assert simple.count("Exchange") == 1
    assert "MergingSessions" in simple
    assert "EvalPython" not in _plan(df)


def test_semantic_dedup_pairs_no_cross_product_arrow_only(spark):
    from jsonschema_spark.operators.similarity import semantic_dedup_pairs

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    pairs = semantic_dedup_pairs(emb, "vec_id", "embedding", n_centroids=4)
    plan = _plan(pairs, "simple")
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    full = _plan(pairs)
    # cell assignment + in-cell scoring are Arrow-batched, never row-at-a-time
    assert "BatchEvalPython" not in full


def test_prototypicality_zero_shuffle_projection(spark):
    from jsonschema_spark.operators.similarity import prototypicality

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = _plan(prototypicality(emb, "vec_id", "embedding", n_centroids=4), "simple")
    # after the collected centroid agg, scoring is a pure projection:
    # no exchange, no join in the returned plan
    assert "Exchange" not in plan
    assert "Join" not in plan


def test_leakage_split_pure_projection(spark):
    from jsonschema_spark.operators.curate import leakage_safe_split

    d = spark.read.parquet(DOCS)
    plan = _plan(leakage_safe_split(d, "doc_id", "source"), "simple")
    assert "Exchange" not in plan and "EvalPython" not in plan


def test_tfidf_no_cross_product(spark):
    from jsonschema_spark.operators.textstats import tfidf_top_terms

    d = spark.read.parquet(DOCS)
    plan = _plan(tfidf_top_terms(d, "doc_id", "text"), "simple")
    assert "CartesianProduct" not in plan
    # the one-row N aggregate joins via broadcast nested loop ON PURPOSE
    # (a single-row build side); the term join must be a hash join
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan or "BroadcastHashJoin" in plan


def test_html_extract_pure_codegen_projection(spark):
    from jsonschema_spark.operators.htmltext import html_text_df

    pages = spark.createDataFrame(
        [(1, b"<p>x</p>")], "doc_id long, html binary")
    plan = _plan(html_text_df(pages), "simple")
    # the whole regex chain runs inside the scan projection
    assert "Exchange" not in plan and "EvalPython" not in plan
    assert "*(1)" in plan


def test_bm25_broadcast_only_filter_on_explode(spark):
    """bm25: query-term filter fused with the explode (the corpus never
    shuffles unfiltered), joins broadcast-only, zero Python."""
    from jsonschema_spark.operators.search import bm25_topk

    df = spark.read.parquet(DOCS)
    plan = _plan(bm25_topk(df, "doc_id", "text", ["data", "spark", "row"], k=5),
                 "simple")
    assert "SortMergeJoin" not in plan and "CartesianProduct" not in plan
    assert "Python" not in plan
    # the tf table is checkpointed (one corpus explode feeds both the
    # df-counts aggregate and the scoring join) — the filtered explode
    # lives inside the RDD lineage, so the SQL plan scans ExistingRDD
    assert "Scan ExistingRDD" in plan
    # the only parquet scan left is the N/Σdl scalar agg, pruned to text
    assert plan.count("FileScan parquet") == 1
    assert "ReadSchema: struct<text:string>" in plan


def test_script_profile_zero_exchange_projection(spark):
    from jsonschema_spark.operators.textstats import script_profile

    df = spark.read.parquet(DOCS)
    plan = _plan(script_profile(df, "doc_id", "text"), "simple")
    assert "Exchange" not in plan and "Python" not in plan


def test_robots_filter_no_cross_product(spark):
    from jsonschema_spark.operators.robots import robots_filter, robots_rules_df

    robots = spark.createDataFrame(
        [("a.org", "User-agent: *\nDisallow: /x\n")], ["host", "robots_txt"])
    urls = spark.createDataFrame([(1, "https://a.org/x")], ["doc_id", "url"])
    plan = _plan(robots_filter(urls, robots_rules_df(robots)), "simple")
    assert "CartesianProduct" not in plan
    assert "Python" not in plan


def test_top_ngrams_no_full_vocabulary_window(spark):
    """top_ngrams must rank via TakeOrderedAndProject (parallel
    per-partition top-k), NEVER a row_number window over the full
    distinct-gram table — at crawl scale that funnels billions of rows
    through one task (VERDICT r3 finding #1)."""
    from jsonschema_spark.operators.textstats import top_ngrams

    df = spark.read.parquet(DOCS)
    plan = _plan(top_ngrams(df, "doc_id", "text", n=2, k=5), "simple")
    assert "TakeOrderedAndProject" in plan
    # the single-partition funnel is gone entirely: the only Window sits
    # ABOVE the limit (ranks the k survivors), so no SinglePartition
    # exchange exists anywhere in the plan
    assert "Exchange SinglePartition" not in plan
    lines = plan.splitlines()
    w_idx = [i for i, ln in enumerate(lines) if "Window" in ln]
    t_idx = [i for i, ln in enumerate(lines) if "TakeOrderedAndProject" in ln]
    assert len(w_idx) == 1 and len(t_idx) == 1
    assert w_idx[0] < t_idx[0]  # tree prints root-first: window above limit


def test_frontier_interleave_no_global_window(spark):
    """frontier_interleave's fetch_order must come from range-partition +
    per-partition row_number + broadcast offsets — the only
    SinglePartition exchange allowed is the tiny (≤ shuffle partitions)
    offsets cumsum on the broadcast side (VERDICT r3 finding #2)."""
    from jsonschema_spark.operators.urltools import frontier_interleave

    urls = spark.read.parquet(DOCS).select(
        F.concat(F.lit("https://h"), (F.col("doc_id") % 7).cast("string"),
                 F.lit(".org/p/"), F.col("doc_id").cast("string")).alias("url"),
        (F.col("doc_id") % 13).alias("prio"),
    )
    plan = _plan(frontier_interleave(urls, priority_col="prio"), "simple")
    # the corpus-side window is partitioned by the range-partition id
    assert "windowspecdefinition(_pid" in plan
    assert "BroadcastHashJoin" in plan
    lines = plan.splitlines()
    sp = [i for i, ln in enumerate(lines) if "Exchange SinglePartition" in ln]
    be = [i for i, ln in enumerate(lines) if "BroadcastExchange" in ln]
    assert len(sp) == 1 and len(be) == 1
    assert sp[0] > be[0]  # the funnel lives INSIDE the broadcast subtree


def test_warc_jvm_path_python_free(spark):
    from jsonschema_spark.sources.warc import warc_records

    df = spark.createDataFrame([(1, "WARC/1.0\r\n\r\nx\r\n\r\n")],
                               ["file_id", "warc"])
    assert "Python" not in _plan(warc_records(df), "simple")
