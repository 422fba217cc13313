"""jsonschema_spark — a PySpark-native JSON-Schema-style validation engine.

A from-scratch re-expression of the capabilities of the sourcemeta/jsonschema
CLI (reference: /root/reference, v16.7.0) on top of Spark DataFrames:

- ``compile_schema(schema)``      → driver-side compiled plan (pure Python)
- ``validate(df, schema, ...)``   → df + ``valid``/``violations`` columns
- ``violations(df, schema, ...)`` → exploded violation rows in the
  reference's standard-output shape (keywordLocation,
  absoluteKeywordLocation, instanceLocation, error) — see
  /root/reference/vendor/blaze/src/output/output_standard.cc:47-100

The compiler inverts the reference's row-at-a-time interpreter
(/root/reference/vendor/blaze/src/evaluator) into columnar predicates: one
compiled *schema* becomes a batch of Column expressions applied to millions
of rows per partition, fully inside Catalyst/Tungsten codegen. Nested JSON
documents are handled via Spark 4 VARIANT (see plans/context.py).
"""

from jsonschema_spark.operators.validate import (
    annotate,
    property_verdicts,
    standard_output,
    validate,
    violations,
    violations_with_positions,
    verdict_counts,
)
from jsonschema_spark.operators.annotations import annotations
from jsonschema_spark.operators.trace import trace
from jsonschema_spark.plans.compiler import compile_entrypoint, compile_schema, CompiledSchema
from jsonschema_spark.plans.registry import register_keyword, unregister_keyword
from jsonschema_spark.plans.configfile import find_config, load_config, resolver_from_config
from jsonschema_spark.plans.codegen import struct_type_for
from jsonschema_spark.plans.inspect import explain_schema, inspect_schema
from jsonschema_spark.plans.lint import lint_fix, lint_schema
from jsonschema_spark.plans.metaschema import is_valid_schema, metaschema_errors
from jsonschema_spark.plans.serialize import (
    dump_plan,
    load_plan,
    plan_from_json,
    plan_to_json,
    schema_fingerprint,
)
from jsonschema_spark.operators.testrunner import (ctrf_report,
                                                   prettify_json,
                                                   run_suite, run_suites)
from jsonschema_spark.plans.bundle import bundle
from jsonschema_spark.plans.canonicalize import canonicalize
from jsonschema_spark.plans.fmt import fmt_check, format_schema
from jsonschema_spark.plans.pyeval import validate_py
from jsonschema_spark.sources.http_resolver import http_resolver, resolve_remote_refs
from jsonschema_spark.sources.warc import (
    warc_records,
    wet_record,
    wet_serialize_df,
)
from jsonschema_spark.operators.curate import (
    budget_sample,
    chunk_docs,
    epoch_plan,
    pack_sequences,
    curate_corpus,
    curation_report,
    domain_cap_sample,
    hash_split,
    leakage_safe_split,
    mixture_sample,
    mixture_weights,
    temperature_sample,
    temperature_weights,
    quality_buckets,
    shard_assign,
    shard_stats,
)
from jsonschema_spark.operators.dedup import (
    auto_rows_per_band,
    cdc_chunk_stats,
    cdc_chunks_df,
    cross_corpus_lsh_pairs,
    dedup_against_corpus,
    dedup_clusters,
    dedup_keep_latest,
    decontaminate,
    dup_span_remove,
    dup_span_stats,
    jaccard_pairs,
    keep_canonical,
    line_dedup,
    minhash_lsh_pairs,
    minhash_signatures_df,
)
from jsonschema_spark.operators.textstats import (
    boilerplate_strip,
    fix_mojibake,
    homoglyph_skeleton,
    homoglyph_stats_df,
    mojibake_stats_df,
    vocab_stats,
    script_profile,
    clean_text,
    compression_ratio,
    nfc_normalize,
    readability,
    tfidf_top_terms,
    winnow_fingerprints,
)
from jsonschema_spark.operators.embed import (
    embedding_project_df,
    hashed_embedding_df,
)
from jsonschema_spark.operators.robots import (
    frontier_schedule,
    robots_crawl_delay,
    robots_sitemaps,
    robots_filter,
    robots_rules_df,
)
from jsonschema_spark.operators.infer import (
    infer_json_schema,
    infer_json_stats,
)
from jsonschema_spark.operators.search import bm25_topk, term_stats
from jsonschema_spark.operators.sitemap import sitemap_entries
from jsonschema_spark.operators.similarity import (
    kmeans_fixed,
    prototypicality,
    semantic_dedup,
    semantic_dedup_pairs,
)
from jsonschema_spark.operators.stats import (
    bloom_merge,
    bloom_probe,
    bloom_sketch,
    cms_lookup,
    cms_merge,
    cms_sketch,
    distinct_approx,
    hist_drift,
    hist_merge,
    hist_quantiles,
    hist_sketch,
    hll_estimate,
    hll_merge,
    hll_sketch,
    kmv_estimate,
    kmv_merge,
    kmv_overlap,
    kmv_sketch,
    pairwise_corr,
    sessionize,
    tdigest_merge,
    tdigest_quantiles,
    tdigest_sketch,
)
from jsonschema_spark.operators.bpe import (
    bpe_encode_pandas,
    bpe_token_counts_df,
    bpe_train,
)
from jsonschema_spark.operators.urltools import (
    crawler_traps_df,
    frontier_interleave,
    host_stats_df,
    normalize_url,
    url_signature,
    normalize_urls_df,
    public_suffix,
    registered_domain,
    recrawl_priority,
    snapshot_delta_df,
    url_dedup_df,
    url_param_policy,
)
from jsonschema_spark.operators.htmltext import (
    canonical_dedup_df,
    charset_guess,
    embedded_jsonld_df,
    extract_text_html,
    html_meta_df,
    html_text_df,
    main_content_df,
    resolve_href,
)
from jsonschema_spark.operators.linkgraph import (
    anchor_text_df,
    host_reciprocity,
    extract_links,
    host_hits_df,
    link_stats_df,
    host_rank_df,
    link_edges_df,
    trustrank_df,
)
from jsonschema_spark.operators.lm import (dsir_weight, ngram_lm_score,
                                           stupid_backoff_score)
from jsonschema_spark.operators.binpack import (
    binpack_decode,
    binpack_encode,
    decode_df,
    decode_instance,
    encode_df,
    encode_instance,
    encoding_plan,
)
from jsonschema_spark.plans.upgrade import needs_upgrade, upgrade_schema

__version__ = "0.1.0"

__all__ = [
    "auto_rows_per_band",
    "infer_json_schema",
    "infer_json_stats",
    "annotate",
    "validate",
    "violations",
    "violations_with_positions",
    "annotations",
    "trace",
    "verdict_counts",
    "standard_output",
    "property_verdicts",
    "compile_schema",
    "compile_entrypoint",
    "register_keyword",
    "unregister_keyword",
    "find_config",
    "load_config",
    "resolver_from_config",
    "CompiledSchema",
    "struct_type_for",
    "explain_schema",
    "inspect_schema",
    "lint_schema",
    "lint_fix",
    "is_valid_schema",
    "metaschema_errors",
    "plan_to_json",
    "plan_from_json",
    "dump_plan",
    "load_plan",
    "schema_fingerprint",
    "run_suite",
    "run_suites",
    "ctrf_report",
    "prettify_json",
    "bundle",
    "canonicalize",
    "format_schema",
    "fmt_check",
    "validate_py",
    "http_resolver",
    "resolve_remote_refs",
    "binpack_encode",
    "binpack_decode",
    "encode_df",
    "decode_df",
    "encode_instance",
    "decode_instance",
    "encoding_plan",
    "curate_corpus",
    "curation_report",
    "budget_sample",
    "domain_cap_sample",
    "hash_split",
    "cross_corpus_lsh_pairs",
    "dedup_against_corpus",
    "dedup_clusters",
    "dedup_keep_latest",
    "dup_span_stats",
    "jaccard_pairs",
    "keep_canonical",
    "line_dedup",
    "minhash_lsh_pairs",
    "minhash_signatures_df",
    "boilerplate_strip",
    "clean_text",
    "normalize_url",
    "normalize_urls_df",
    "extract_text_html",
    "html_meta_df",
    "embedded_jsonld_df",
    "canonical_dedup_df",
    "resolve_href",
    "html_text_df",
    "main_content_df",
    "fix_mojibake",
    "mojibake_stats_df",
    "pack_sequences",
    "epoch_plan",
    "embedding_project_df",
    "hashed_embedding_df",
    "tdigest_sketch",
    "tdigest_merge",
    "tdigest_quantiles",
    "charset_guess",
    "crawler_traps_df",
    "link_stats_df",
    "url_signature",
    "frontier_interleave",
    "recrawl_priority",
    "host_reciprocity",
    "url_param_policy",
    "homoglyph_stats_df",
    "homoglyph_skeleton",
    "cdc_chunks_df",
    "cdc_chunk_stats",
    "trustrank_df",
    "stupid_backoff_score",
    "extract_links",
    "link_edges_df",
    "host_rank_df",
    "host_hits_df",
    "anchor_text_df",
    "shard_assign",
    "shard_stats",
    "chunk_docs",
    "bm25_topk",
    "term_stats",
    "kmeans_fixed",
    "robots_rules_df",
    "robots_filter",
    "pairwise_corr",
    "script_profile",
    "warc_records",
    "wet_record",
    "wet_serialize_df",
    "sitemap_entries",
    "quality_buckets",
    "public_suffix",
    "registered_domain",
    "host_stats_df",
    "url_dedup_df",
    "dsir_weight",
    "ngram_lm_score",
    "upgrade_schema",
    "needs_upgrade",
    "__version__",
]
