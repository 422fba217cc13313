"""End-to-end corpus curation — the composed training-data pipeline.

What a user of the reference ultimately runs over web text, as ONE
composition of this repo's operators:

    quality filter  →  near-dup pairs  →  components  →  canonical keep

- `webtext_keep` is a pure Column predicate: the filter runs inside the
  scan projection (no join, no shuffle) and prunes the corpus BEFORE the
  expensive dedup stages — at 100 TB the order of stages is the
  difference between shingling the whole crawl and shingling the ~half
  that survives quality filtering.
- MinHash-LSH candidate pairs + connected components + anti-join keep
  are the dedup.py operators (each individually oracle-gated); the
  composition is oracle-gated too (`curate_docs`).

`curate_corpus` returns the curated rows; `curation_report` returns the
funnel counts (input → quality-kept → canonical) in one pass each.
"""

from __future__ import annotations

from typing import Sequence

import pandas as pd  # module top: pandas_udf string type hints resolve here

from pyspark.sql import DataFrame, functions as F

from jsonschema_spark.operators.dedup import (
    dedup_clusters,
    keep_canonical,
    minhash_lsh_pairs,
    tokens as dedup_tokens,
)
from jsonschema_spark.operators.textstats import webtext_keep


def curate_corpus(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100000,
    min_stopwords: int = 2,
    k: int = 12,
    bands: int = 6,
    shingle_n: int = 3,
    max_band_df: int | None = None,
    portable: bool = True,
) -> DataFrame:
    kept = df.filter(
        webtext_keep(F.col(text_col), min_words, max_words, min_stopwords)
    )
    # the kept set feeds two stages (pair generation + final keep):
    # checkpoint once so the quality filter isn't recomputed per consumer
    kept = kept.localCheckpoint(eager=False)
    pairs = minhash_lsh_pairs(kept, id_col, text_col, k=k, bands=bands,
                              shingle_n=shingle_n, max_band_df=max_band_df,
                              portable=portable)
    clusters = dedup_clusters(pairs)
    return keep_canonical(kept, clusters, id_col)


def curation_report(
    df: DataFrame,
    id_col: str,
    text_col: str,
    **kwargs,
) -> dict:
    """Funnel counts: {'input': n, 'quality_kept': n, 'curated': n}.
    Input and quality-kept come from ONE pass (conditional count over the
    scan); only the curated tally needs the pipeline's own action."""
    keep = webtext_keep(F.col(text_col),
                        kwargs.get("min_words", 50),
                        kwargs.get("max_words", 100000),
                        kwargs.get("min_stopwords", 2))
    row = df.agg(
        F.count(F.lit(1)).alias("n_in"),
        F.count(F.when(keep, 1)).alias("n_kept"),
    ).collect()[0]
    n_cur = curate_corpus(df, id_col, text_col, **kwargs).count()
    return {"input": row["n_in"], "quality_kept": row["n_kept"], "curated": n_cur}


DEFAULT_SPLITS: tuple[tuple[str, int], ...] = (
    ("train", 980000), ("val", 10000), ("test", 10000))


def hash_split(
    df: DataFrame,
    id_col: str,
    splits: tuple[tuple[str, int], ...] = DEFAULT_SPLITS,
    salt: str = "split",
) -> DataFrame:
    """Deterministic train/val/test assignment: a portable md5 bucket in
    [0, 1e6) over `salt:id` picks the split by cumulative ppm ranges.
    Id-stable — growing the corpus never reassigns an existing doc, and
    changing `salt` draws an independent partition (the standard
    held-out-set discipline for training corpora). Pure projection: zero
    shuffle, zero Python, composes under the scan's column pruning.

    `splits` is an ordered (name, ppm) list summing to 1,000,000.
    """
    from jsonschema_spark.operators.dedup import hash56

    total = sum(p for _, p in splits)
    if total != 1000000:
        raise ValueError(f"split ppm must sum to 1000000, got {total}")
    bucket = hash56(
        F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))
    ) % 1000000
    expr = F.lit(splits[-1][0])
    acc = 0
    conds = []
    for name, ppm in splits[:-1]:
        acc += ppm
        conds.append((acc, name))
    for acc, name in reversed(conds):
        expr = F.when(bucket < acc, name).otherwise(expr)
    return df.select(
        F.col(id_col),
        bucket.cast("long").alias("bucket_ppm"),
        expr.alias("split"),
    )


def budget_sample(
    df: DataFrame,
    id_col: str,
    text_col: str,
    budget_tokens: int,
    stratify_col: str | None = None,
    salt: str = "budget",
    exact: bool = True,
    n_buckets: int = 4096,
) -> DataFrame:
    """Deterministic token-budget sampling: within each stratum (e.g.
    language), order documents by a portable md5 hash of `salt:id` (an
    id-stable shuffle — growing the corpus never reorders existing docs
    relative to each other) and keep docs while the running token total
    stays within `budget_tokens`. The first doc that would overflow the
    budget, and everything after it, is dropped. Output keeps the running
    total (`cum_tokens`) for auditability.

    ``exact=True`` (small strata): one window cumulative sum per stratum —
    a shuffle on the stratum key plus a per-stratum sort of (hash, id,
    n_tokens) TRIPLES (not documents: the projection drops `text` before
    the sort, so the shuffle moves ~24 bytes/doc). One stratum sorts in
    one task — the scale risk at crawl corpus sizes.

    ``exact=False`` (the crawl-scale path) returns the IDENTICAL rows
    without ever sorting a stratum in one task, via hash-prefix bucketing:

    1. bucket = the top ``log2(n_buckets)`` bits of the 56-bit hash —
       monotone in the hash, so bucket order IS prefix order;
    2. ONE groupBy (stratum, bucket) token histogram — strata×n_buckets
       rows, map-side combined, broadcastable;
    3. per-stratum cumulative bucket sums locate every bucket whose
       PREFIX START is already past the budget — dropped wholesale by a
       broadcast join (this is the win: ~budget/corpus of the data
       survives to the next step);
    4. the surviving buckets (usually one partial + the full ones) get
       per-BUCKET windows ordered by (hash, id), offset by the broadcast
       bucket prefix sums — parallel across n_buckets·strata partitions,
       each sorting ~n/n_buckets rows.

    Equivalence holds because hash ties can only land in the same bucket
    and the within-bucket order (hash, id) extends the global order.
    Pick ``n_buckets ≥ stratum_rows / 10^7`` so the largest per-bucket
    sort fits a task; the histogram stays tiny up to 2^20 buckets.
    """
    from pyspark.sql.window import Window

    from jsonschema_spark.operators.dedup import hash56, tokens

    h = hash56(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    slim = df.select(
        F.col(id_col),
        *([F.col(stratify_col)] if stratify_col else []),
        h.alias("_h"),
        F.size(tokens(F.col(text_col))).alias("n_tokens"),
    )
    out_cols = [id_col] + ([stratify_col] if stratify_col else []) \
        + ["n_tokens"]
    if exact:
        part = (Window.partitionBy(stratify_col) if stratify_col
                else Window.partitionBy())
        w = part.orderBy("_h", id_col).rowsBetween(
            Window.unboundedPreceding, 0)
        cum = slim.select(
            *out_cols, F.sum("n_tokens").over(w).alias("cum_tokens"))
        return cum.where(F.col("cum_tokens") <= budget_tokens)

    bits = (n_buckets - 1).bit_length()
    if n_buckets != 1 << bits:
        raise ValueError(f"n_buckets must be a power of two, got {n_buckets}")
    strat = [stratify_col] if stratify_col else []
    bucketed = slim.withColumn(
        "_b", F.shiftrightunsigned(F.col("_h"), 56 - bits))
    hist = bucketed.groupBy(*strat, "_b").agg(
        F.sum("n_tokens").alias("_bt"))
    # per-stratum prefix sum over buckets: strata × n_buckets rows — the
    # only window over this tiny table, partitioned by stratum
    wh = (Window.partitionBy(stratify_col) if stratify_col
          else Window.partitionBy()).orderBy("_b").rowsBetween(
        Window.unboundedPreceding, -1)
    offsets = hist.select(
        *strat, "_b",
        F.coalesce(F.sum("_bt").over(wh), F.lit(0)).alias("_off"),
    ).where(F.col("_off") <= budget_tokens)
    wb = Window.partitionBy(*strat, "_b").orderBy("_h", F.col(id_col)) \
        .rowsBetween(Window.unboundedPreceding, 0)
    cum = (
        bucketed.join(F.broadcast(offsets), [*strat, "_b"])
        .withColumn(
            "cum_tokens",
            (F.col("_off") + F.sum("n_tokens").over(wb)).cast("long"))
    )
    return cum.where(F.col("cum_tokens") <= budget_tokens).select(
        *out_cols, "cum_tokens")


def domain_cap_sample(
    df: DataFrame,
    id_col: str,
    group_col: str,
    cap: int,
    exact: bool = True,
    salt: str = "domcap",
) -> DataFrame:
    """Cap every group (registered domain / source / host — pair with
    operators/urltools.py) at ``cap`` documents, chosen deterministically
    by an id-stable portable hash — the standard crawl-curation guard
    against one template farm dominating the corpus (heavy-tailed host
    distributions put >1% of Common-Crawl pages on a handful of domains).

    ``exact=True``: keep each group's ``cap`` smallest ``hash(salt:id)``
    rows — one window row_number per group over (hash, id) PAIRS (text is
    not in the sort: the projection joins back by id). A single
    pathological group sorts in one task; at crawl scale flip to
    ``exact=False``.

    ``exact=False`` (the 100 TB path): keep a row when
    ``hash % 1e6 < 1e6·cap/n_group`` — a pure scan predicate after ONE
    count aggregate joined back on the group key. Group sizes follow
    Binomial(n, cap/n): the cap is hit within ±√cap, nothing sorts,
    nothing hot-spots (the decision is per-ROW, made from the row's own
    hash + the group's count). Id-stable: recrawls keep the same sample
    modulo the count drift.

    Output: the kept rows (all df columns) plus ``n_group``."""
    from jsonschema_spark.operators.dedup import hash56

    h = hash56(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    counts = df.groupBy(group_col).agg(F.count(F.lit(1)).alias("n_group"))
    if exact:
        from pyspark.sql.window import Window

        w = Window.partitionBy(group_col).orderBy("_h", id_col)
        slim = df.select(F.col(id_col), F.col(group_col), h.alias("_h"))
        kept_ids = (
            slim.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") <= cap)
            .select(id_col)
        )
        return (
            df.join(kept_ids, [id_col], "left_semi")
            .join(counts, [group_col], "left")
        )
    keep_ppm = F.least(
        F.lit(1_000_000),
        F.floor(F.lit(1_000_000) * cap / F.col("n_group")),
    )
    return (
        df.join(counts, [group_col], "left")
        .where(F.pmod(h, F.lit(1_000_000)) < keep_ppm)
    )


def mixture_weights(
    df: DataFrame, group_col: str, target_ppm: dict, salt: str = "mix"
) -> DataFrame:
    """Per-group DOWN-sampling weights realizing a target training
    mixture (the apply step of data-mixing recipes — fixed curated
    proportions à la The Pile / DoReMi-learned weights): the group with
    the highest target/actual ratio is the BINDING group and keeps
    everything (sampling cannot upsample); every other group keeps
    weight_g = (target_g/n_g) / (target_bind/n_bind), as integer ppm.
    Groups absent from ``target_ppm`` get weight 0 (dropped).

    Exactness: the ratio of ratios is computed as ONE double multiply +
    ONE divide over exact int64 cross-products —
    floor(1e6·(t_g·n_bind) / (n_g·t_bind)) — the identical op order the
    SQL oracle uses, so weights hash-match bit-for-bit. The binding group
    is argmax of (t/n double, group) — deterministic tie-break.

    One count aggregate over the corpus; everything downstream operates
    on the tiny per-group table. Returns (group, n_docs, target_ppm,
    weight_ppm)."""
    pairs = []
    for k in sorted(target_ppm):
        pairs += [F.lit(k), F.lit(int(target_ppm[k]))]
    tmap = F.create_map(*pairs)
    counts = (
        df.groupBy(F.col(group_col).alias("grp"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("target_ppm", F.coalesce(tmap[F.col("grp")], F.lit(0)).cast("long"))
    )
    binding = (
        counts.where(F.col("target_ppm") > 0)
        .orderBy(
            (F.col("target_ppm").cast("double") / F.col("n_docs").cast("double")).desc(),
            F.col("grp").asc(),
        )
        .limit(1)
        .select(F.col("target_ppm").alias("_tb"), F.col("n_docs").alias("_nb"))
    )
    return (
        counts.crossJoin(F.broadcast(binding))
        .select(
            F.col("grp").alias(group_col),
            "n_docs",
            "target_ppm",
            F.when(
                F.col("target_ppm") > 0,
                F.floor(
                    F.lit(1000000.0)
                    * (F.col("target_ppm") * F.col("_nb")).cast("double")
                    / (F.col("n_docs") * F.col("_tb")).cast("double")
                ),
            )
            .otherwise(F.lit(0))
            .cast("long")
            .alias("weight_ppm"),
        )
    )


def mixture_sample(
    df: DataFrame, id_col: str, group_col: str, target_ppm: dict, salt: str = "mix"
) -> DataFrame:
    """Apply ``mixture_weights`` as deterministic id-stable sampling:
    keep a row iff ``hash56(salt:id) % 1e6 < weight_ppm(group)``. One
    count aggregate + a broadcast of the tiny weight table + a pure scan
    predicate — nothing sorts, the per-row decision cannot hot-spot
    (same shape as domain_cap_sample's approx mode); realized group sizes
    land within Binomial noise of the target mixture."""
    from jsonschema_spark.operators.dedup import hash56

    w = mixture_weights(df, group_col, target_ppm, salt).select(
        F.col(group_col).alias("_grp"), "weight_ppm"
    )
    h = hash56(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    return (
        df.join(F.broadcast(w), df[group_col] == F.col("_grp"))
        .where(F.pmod(h, F.lit(1_000_000)) < F.col("weight_ppm"))
        .drop("_grp", "weight_ppm")
    )


def temperature_weights(df: DataFrame, group_col: str) -> DataFrame:
    """Temperature-based mixing weights DERIVED from corpus counts —
    the multilingual-training standard (α = 1/2 sampling temperature:
    target share ∝ n_g^0.5, the mBERT/XLM-R exponent) instead of
    ``mixture_weights``' externally-given targets. Down-sampling only,
    so the group with the highest (target/actual) ratio binds: under
    α = 1/2 that ratio is ∝ 1/√n_g, hence the SMALLEST group keeps
    everything and every larger group keeps
    weight_g = √(n_b/n_g) as floor(1e6·s_g·n_b / (n_g·s_b)) ppm with
    s = floor(sqrt(n)).

    α is fixed at 1/2 on purpose: IEEE-754 sqrt is CORRECTLY ROUNDED in
    every engine, so floor(sqrt(n)) over exact int64 counts is
    bit-identical across Spark, DuckDB and numpy — while a general n^α
    needs pow/exp/ln, whose last-ulp rounding differs per engine
    (CLAUDE.md). floor(sqrt) == isqrt for n < 2^52 (the double gap at
    √n stays below the distance to the next integer). Everything
    downstream of the one count aggregate operates on the tiny per-group
    table; no collect, no driver-side dict. Returns
    (group, n_docs, s, weight_ppm)."""
    counts = (
        df.groupBy(F.col(group_col).alias("grp"))
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .withColumn("s", F.floor(F.sqrt(F.col("n_docs").cast("double"))).cast("long"))
    )
    binding = (
        counts.orderBy(
            (F.col("s").cast("double") / F.col("n_docs").cast("double")).desc(),
            F.col("grp").asc(),
        )
        .limit(1)
        .select(F.col("s").alias("_sb"), F.col("n_docs").alias("_nb"))
    )
    return counts.crossJoin(F.broadcast(binding)).select(
        F.col("grp").alias(group_col),
        "n_docs",
        "s",
        F.least(
            F.lit(1000000),
            F.floor(
                F.lit(1000000.0)
                * (F.col("s") * F.col("_nb")).cast("double")
                / (F.col("n_docs") * F.col("_sb")).cast("double")
            ),
        )
        .cast("long")
        .alias("weight_ppm"),
    )


def temperature_sample(
    df: DataFrame, id_col: str, group_col: str, salt: str = "temp"
) -> DataFrame:
    """Apply ``temperature_weights`` as deterministic id-stable sampling
    (keep iff hash56(salt:id) % 1e6 < weight_ppm(group)) — one count
    aggregate, a broadcast of the per-group weight table, then a pure
    scan predicate: the per-row decision cannot hot-spot at crawl scale
    and the kept set is a pure function of (ids, group sizes)."""
    from jsonschema_spark.operators.dedup import hash56

    w = temperature_weights(df, group_col).select(
        F.col(group_col).alias("_grp"), "weight_ppm"
    )
    h = hash56(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    return (
        df.join(F.broadcast(w), df[group_col] == F.col("_grp"))
        .where(F.pmod(h, F.lit(1_000_000)) < F.col("weight_ppm"))
        .drop("_grp", "weight_ppm")
    )


def leakage_safe_split(
    df: DataFrame,
    id_col: str,
    group_col: str,
    splits: tuple[tuple[str, int], ...] = DEFAULT_SPLITS,
    salt: str = "split",
) -> DataFrame:
    """Train/val/test assignment keyed on the GROUP hash (registered
    domain / source / host — pair with urltools.registered_domain)
    instead of the doc id: every document of one group lands in the SAME
    split, so near-duplicates and templated siblings of one site cannot
    straddle train/test (the standard leakage guard hash_split alone
    does not give). Same id-stable cumulative-ppm ladder, still a pure
    projection — zero shuffle, zero Python; realized split SIZES now
    carry group-level (not doc-level) binomial noise, so expect wider
    deviation when a few groups dominate (that is the point: cap first
    with domain_cap_sample if sizes must be tight).

    Output: (id_col, group_col, bucket_ppm, split)."""
    from jsonschema_spark.operators.dedup import hash56

    total = sum(p for _, p in splits)
    if total != 1000000:
        raise ValueError(f"split ppm must sum to 1000000, got {total}")
    bucket = hash56(
        F.concat(F.lit(salt + ":"), F.col(group_col).cast("string"))
    ) % 1000000
    expr = F.lit(splits[-1][0])
    acc = 0
    conds = []
    for name, ppm in splits[:-1]:
        acc += ppm
        conds.append((acc, name))
    for acc, name in reversed(conds):
        expr = F.when(bucket < acc, name).otherwise(expr)
    return df.select(
        F.col(id_col),
        F.col(group_col),
        bucket.cast("long").alias("bucket_ppm"),
        expr.alias("split"),
    )


def shard_assign(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    group_col: str = "source",
    target_tokens: int = 100_000,
) -> DataFrame:
    """Token-budget shard packing for training-data export.

    Training exports (WebDataset / Megatron-style) want shards of roughly
    ``target_tokens`` tokens, docs never split, order deterministic.
    Greedy order-preserving packing: within each group, docs sorted by id
    are laid out contiguously and a shard boundary falls at every
    ``target_tokens`` of cumulative EXCLUSIVE mass — a doc starts a new
    shard when the tokens before it already fill the current one. Shards
    overshoot by at most one doc (docs never split); a doc larger than
    the target gets a shard to itself plus the spillover rule.

    Output: input columns + ``shard`` ("<group>/<k>") + ``shard_idx``.

    Scale shape: ONE window per group (PARTITION BY group ORDER BY id) —
    groups pack in parallel across the cluster, and sort-by-id within a
    group is the export order the writer needs anyway. Window frame is
    the running sum (ROWS UNBOUNDED PRECEDING AND 1 PRECEDING), identical
    in Spark and DuckDB. A SINGLE giant group serializes into one task —
    at that shape, split packing two-level: per-partition token totals
    (tiny) prefix-summed once, then partition-local cumsums offset by the
    prefix; same math, no global sort. The one-window form here is the
    per-source layout real exports use.

    Int contract: cumulative token counts and ``div`` stay int64 — exact
    in both engines (doubles would drift at crawl-scale cumsums).
    """
    # SQL-expr form so the cumsum-and-divide stays in int64 `div`
    # (Column has no integer-division operator; double division would
    # round wrong above 2^53 cumulative tokens).
    shard_idx = F.expr(
        f"cast(coalesce(sum(cast(coalesce({token_col}, 0) as bigint)) over "
        f"(partition by {group_col} order by {id_col} "
        f"rows between unbounded preceding and 1 preceding), 0) "
        f"div {int(target_tokens)} as bigint)"
    )
    return df.withColumn("shard_idx", shard_idx).withColumn(
        "shard",
        F.concat(F.col(group_col).cast("string"), F.lit("/"),
                 F.col("shard_idx").cast("string")),
    )


def shard_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    token_col: str = "n_tokens",
    group_col: str = "source",
    target_tokens: int = 100_000,
) -> DataFrame:
    """Per-shard manifest: (shard, n_docs, tok_sum, id_lo, id_hi).

    The export writer's unit of work — and the evidence the packing is
    correct: every tok_sum is < target + max doc size, ids contiguous."""
    a = shard_assign(df, id_col, token_col, group_col, target_tokens)
    toks = F.coalesce(F.col(token_col).cast("long"), F.lit(0))
    return a.groupBy("shard").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum(toks).alias("tok_sum"),
        F.min(id_col).alias("id_lo"),
        F.max(id_col).alias("id_hi"),
    )


def chunk_docs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_tokens: int = 128,
    stride: int | None = None,
) -> DataFrame:
    """Fixed-token-window chunking with stride — the Megatron/GPT
    preprocessing step between curation and shard packing: long documents
    become training sequences of at most ``chunk_tokens`` whitespace
    tokens, consecutive chunks ``stride`` tokens apart (default = no
    overlap; stride < chunk_tokens gives the classic overlapping-context
    windows).

    Chunk rule: starts at 0, stride, 2·stride, … while start < n_tokens;
    the final chunk may be shorter (training loaders pad or pack it —
    see shard_assign). Empty/whitespace-only/null docs emit NO rows
    (there is nothing to train on), documented asymmetry with
    dup_span_remove's every-doc-survives contract.

    Output: (id_col, chunk_idx, start_tok, n_tok, chunk_text).

    Scale shape: pure per-row codegen — tokenize, F.sequence over starts,
    ONE posexplode, F.slice + array_join; zero shuffles, zero Python. A
    chunk never spans documents, so no cross-row state exists and the
    operator composes with any upstream filter inside the same scan
    stage. Output row count is Σ ceil(n_i/stride) — bounded by
    (total tokens)/stride, the familiar token-budget arithmetic.
    """
    if chunk_tokens < 1 or (stride is not None and stride < 1):
        raise ValueError("chunk_docs: chunk_tokens and stride must be >= 1")
    s = stride if stride is not None else chunk_tokens
    toks = dedup_tokens(F.col(text_col))
    base = df.select(
        F.col(id_col), toks.alias("_toks"), F.size(toks).alias("_n")
    )
    starts = F.when(
        F.col("_n") >= 1, F.sequence(F.lit(0), F.col("_n") - 1, F.lit(s))
    ).otherwise(F.array().cast("array<int>"))
    ex = base.select(
        id_col, "_toks", "_n", F.posexplode(starts).alias("chunk_idx", "_start")
    )
    return ex.select(
        id_col,
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.col("_start").cast("long").alias("start_tok"),
        F.least(F.lit(chunk_tokens), F.col("_n") - F.col("_start"))
        .cast("long")
        .alias("n_tok"),
        F.array_join(
            F.slice("_toks", F.col("_start") + 1, F.lit(chunk_tokens)), " "
        ).alias("chunk_text"),
    )


def quality_buckets(
    df: DataFrame,
    id_col: str = "doc_id",
    score_col: str = "score",
    group_col: str | None = None,
    n_buckets: int = 3,
    labels: tuple[str, ...] = ("head", "middle", "tail"),
) -> DataFrame:
    """CCNet's head/middle/tail split (Wenzek et al. 2020): rank documents
    by a quality score WITHIN each group (language, source) and cut into
    ``n_buckets`` equal-count bands — bucket 1 = best. The classic use is
    keeping the perplexity head per language; pair with
    ``lm.ngram_lm_score`` (where HIGH score = fluent).

    Deterministic and engine-portable: ``ntile`` over
    (score DESC, id ASC) — both engines define ntile by row count with
    larger buckets first, and the id tie-break pins every row. When
    ``labels`` has ``n_buckets`` entries a ``bucket_label`` column is
    added; pass ``labels=()`` to skip it.

    Scale shape: ONE window per group — groups rank in parallel; within a
    group this is the same sort the export would do anyway. (A single
    giant group serializes into one task: at that shape pre-bucket by an
    APPROXIMATE quantile of the score — percentile_approx — and ntile
    within the small residual band instead.)

    Output: input columns + ``bucket`` (1-based long) [+ bucket_label].
    """
    from pyspark.sql.window import Window

    if n_buckets < 1:
        raise ValueError("quality_buckets: n_buckets must be >= 1")
    part = Window.partitionBy(group_col) if group_col else Window.partitionBy()
    w = part.orderBy(F.col(score_col).desc(), F.col(id_col).asc())
    out = df.withColumn("bucket", F.ntile(n_buckets).over(w).cast("long"))
    if labels and len(labels) == n_buckets:
        arr = F.array(*[F.lit(x) for x in labels])
        out = out.withColumn(
            "bucket_label", F.element_at(arr, F.col("bucket").cast("int"))
        )
    return out


def pack_sequences(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    seq_len: int = 2048,
    tokens_count_col: str | None = None,
) -> DataFrame:
    """GPT-style pretraining sequence packing: concatenate every document
    (in ``id_col`` order) into ONE virtual token stream and split it at
    fixed ``seq_len`` boundaries — the cross-document packing step after
    curation that turns a corpus into equal-length training sequences
    with zero padding waste (only the final sequence can be short).
    ``chunk_docs`` is the within-doc sibling (a chunk never crosses
    docs); this is the cross-doc form every large pretraining run uses.

    Token counts default to whitespace tokens (``tokens()``); pass
    ``tokens_count_col`` to pack by an upstream tokenizer's counts (e.g.
    bpe_token_counts_df). Empty/null docs carry zero tokens and are
    excluded (nothing to pack — documented).

    Output, one row per training sequence: (seq_id 0-based, n_tokens,
    n_docs, n_docs_started, first_doc, last_doc, is_full, fill_ppm).
    n_docs counts every doc contributing ≥1 token to the sequence;
    n_docs_started counts docs whose FIRST token lands in it — the
    boundary-crossing ledger (n_docs − n_docs_started docs carried in
    from the previous sequence).

    Scale shape: the only global state is the running token offset,
    computed with the zipWithIndex-on-sorted recipe (range-partition by
    id → localCheckpoint for pid stability → parallel per-partition
    cumulative sums → ONE n_partitions-row offset aggregate broadcast
    back) — NEVER a single-partition window over the corpus. Each doc
    then explodes to its ⌈span/seq_len⌉ covered sequences (output is
    bounded by total_tokens/seq_len + n_docs rows) and ONE
    map-side-partial groupBy(seq_id) builds the ledger.
    """
    from pyspark.sql.window import Window

    if seq_len < 1:
        raise ValueError("pack_sequences: seq_len must be >= 1")
    cnt = (F.col(tokens_count_col) if tokens_count_col
           else F.size(dedup_tokens(F.col(text_col)))).cast("long")
    base = (
        df.select(F.col(id_col), cnt.alias("_cnt"))
        .where(F.col("_cnt") > 0)
    )
    n_parts = int(
        df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    ranged = (
        base.repartitionByRange(n_parts, F.col(id_col))
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    offsets = (
        ranged.groupBy("_pid")
        .agg(F.sum("_cnt").alias("_tot"))
        .withColumn(
            "_off",
            F.coalesce(
                F.sum("_tot").over(
                    Window.orderBy("_pid").rowsBetween(
                        Window.unboundedPreceding, -1)),
                F.lit(0),
            ).cast("long"),
        )
        .select("_pid", "_off")
    )
    wl = Window.partitionBy("_pid").orderBy(F.col(id_col).asc())
    spans = (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn(
            "_end",
            (F.sum("_cnt").over(
                wl.rowsBetween(Window.unboundedPreceding, 0))
             + F.col("_off")).cast("long"),
        )
        .withColumn("_start", F.col("_end") - F.col("_cnt"))
    )
    L = F.lit(int(seq_len)).cast("long")
    seq = F.explode(
        F.sequence(
            (F.col("_start") / L).cast("long"),
            ((F.col("_end") - 1) / L).cast("long"),
        )
    ).alias("seq_id")
    contrib = spans.select(
        F.col(id_col), "_start", "_end", seq
    ).select(
        id_col,
        "seq_id",
        (F.least(F.col("_end"), (F.col("seq_id") + 1) * L)
         - F.greatest(F.col("_start"), F.col("seq_id") * L)).alias("_tok"),
        (F.col("_start") >= F.col("seq_id") * L).alias("_started"),
    )
    return (
        contrib.groupBy("seq_id")
        .agg(
            F.sum("_tok").cast("long").alias("n_tokens"),
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum(F.col("_started").cast("long")).cast("long")
            .alias("n_docs_started"),
            F.min(id_col).alias("first_doc"),
            F.max(id_col).alias("last_doc"),
        )
        .select(
            "seq_id", "n_tokens", "n_docs", "n_docs_started",
            "first_doc", "last_doc",
            (F.col("n_tokens") == seq_len).alias("is_full"),
            ((F.col("n_tokens") * F.lit(1_000_000)) / F.lit(int(seq_len)))
            .cast("long").alias("fill_ppm"),
        )
    )


def epoch_plan(
    df: DataFrame,
    group_col: str,
    tokens_col: str,
    token_budget: int,
    max_epochs: int = 4,
) -> DataFrame:
    """Data-repetition planning under a token budget (the
    data-constrained-scaling mix step, cf. Muennighoff et al. 2023):
    give every source an EQUAL share of ``token_budget``, but no source
    may repeat more than ``max_epochs`` times — small sources cap out
    and their unused share waterfalls to the rest.

    Exact integer waterfilling via the sorted-capacity closed form: with
    capacities c_g = n_g·max_epochs sorted ascending (ties by group
    name, ASCII == SQL binary collation), group k is capped iff
    cum_{k-1} + c_k·(G−k+1) ≤ B, and the uncapped level is
    L = (B − Σ_capped c) div (#uncapped). Exact Python ints — the DuckDB
    mirror replays the identical arithmetic with SQL windows.

    Output per group: (group, n_tokens, cap_tokens, alloc_tokens,
    epochs_milli = 1000·alloc/n floored, capped). Σ alloc = B minus the
    final integer-division remainder (< #groups), or Σ cap when the
    budget exceeds every cap.

    Scale shape: ONE map-side-partial groupBy to the G-row source table,
    collected into ONE row through the allowed global-agg-of-partials
    exchange (the hist_quantiles/tdigest pattern — no unpartitioned
    window anywhere), planned by one Arrow scalar UDF over the tiny
    array, exploded back. G is source cardinality — a mixing plan is
    inherently group-table-sized."""
    if token_budget < 0 or max_epochs < 1:
        raise ValueError("epoch_plan: bad budget/max_epochs")
    B, E = int(token_budget), int(max_epochs)
    g = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.sum(F.col(tokens_col)).cast("long").alias("n_tokens"))
    one = g.agg(F.collect_list(
        F.struct(F.col("grp").alias("g"),
                 F.col("n_tokens").alias("n"))).alias("xs"))

    @F.pandas_udf(
        "array<struct<g:string,n:bigint,c:bigint,a:bigint,cp:boolean>>")
    def plan_udf(xs: pd.Series) -> pd.Series:
        out = []
        for arr in xs:
            items = sorted((int(x["n"]) * E, str(x["g"]), int(x["n"]))
                           for x in arr)
            G = len(items)
            cum = 0
            flags = []
            for k, (c, _, _) in enumerate(items, 1):
                flags.append(cum + c * (G - k + 1) <= B)
                cum += c
            capsum = sum(c for (c, _, _), f in zip(items, flags) if f)
            nfree = sum(1 for f in flags if not f)
            level = (B - capsum) // nfree if nfree else 0
            out.append([
                {"g": gname, "n": n, "c": c,
                 "a": c if f else min(level, c), "cp": bool(f)}
                for (c, gname, n), f in zip(items, flags)
            ])
        return pd.Series(out)

    ex = one.select(F.explode(plan_udf(F.col("xs"))).alias("r"))
    return ex.select(
        F.col("r.g").alias(group_col),
        F.col("r.n").alias("n_tokens"),
        F.col("r.c").alias("cap_tokens"),
        F.col("r.a").alias("alloc_tokens"),
        F.floor(F.col("r.a") * 1000 / F.col("r.n")).cast("long")
        .alias("epochs_milli"),
        F.col("r.cp").alias("capped"),
    )


def domain_quality_df(
    df: DataFrame,
    url_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100000,
    min_stopwords: int = 2,
    keep_ppm_keep: int = 500_000,
    keep_ppm_review: int = 200_000,
) -> DataFrame:
    """Domain-level quality prior — the FineWeb/CC practice of judging
    REGISTERED DOMAINS, not just documents: a domain whose pages almost
    never survive the doc-level filter is spam/boilerplate wholesale,
    and dropping it at the frontier saves the fetch, not just the
    tokens. Per PSL registered domain:

    - n_docs, n_tokens, mean_tokens_milli;
    - keep_ppm: share of docs passing the Gopher/C4 ``webtext_keep``
      predicate (same thresholds → same semantics as the doc filter);
    - dup_ppm: share of docs whose exact text hash appears more than
      once in the CORPUS (cross-domain mirrors count — a domain of
      copies of other sites' pages is the signal);
    - route: 'keep' / 'review' / 'drop' by keep_ppm thresholds.

    Scale shape: the per-doc projection (domain, keep, n_words, hash56)
    is computed IN the scan — the text column never rides a shuffle —
    and localCheckpointed once because it feeds both sides of the dup
    join (self-joins recompute otherwise). Then: hash-groupBy (entropy
    key, skew-free), join back on the hash, ONE groupBy(reg_domain)
    with map-side partials (the heavy-tailed domain distribution
    collapses per-task before the exchange). Three exchanges total,
    all on narrow rows.
    """
    from jsonschema_spark.operators.dedup import hash56
    from jsonschema_spark.operators.textstats import token_count
    from jsonschema_spark.operators.urltools import registered_domain

    t = F.col(text_col)
    base = df.where(t.isNotNull()).select(
        registered_domain(F.col(url_col)).alias("reg_domain"),
        webtext_keep(t, min_words, max_words, min_stopwords)
        .cast("long").alias("_keep"),
        token_count(t).cast("long").alias("_nw"),
        hash56(t).alias("_h"),
    ).localCheckpoint(eager=True)
    dc = base.groupBy("_h").agg(F.count(F.lit(1)).alias("_c"))
    per = base.join(dc, "_h")
    g = per.groupBy("reg_domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_keep").cast("long").alias("_k"),
        F.sum((F.col("_c") > 1).cast("long")).cast("long").alias("_d"),
        F.sum("_nw").cast("long").alias("n_tokens"),
    )
    keep_ppm = F.floor(F.col("_k") * 1_000_000 / F.col("n_docs"))
    dup_ppm = F.floor(F.col("_d") * 1_000_000 / F.col("n_docs"))
    mean_milli = F.floor(F.col("n_tokens") * 1000 / F.col("n_docs"))
    return g.select(
        "reg_domain", "n_docs", "n_tokens",
        mean_milli.cast("long").alias("mean_tokens_milli"),
        keep_ppm.cast("long").alias("keep_ppm"),
        dup_ppm.cast("long").alias("dup_ppm"),
        F.when(keep_ppm >= keep_ppm_keep, F.lit("keep"))
        .when(keep_ppm >= keep_ppm_review, F.lit("review"))
        .otherwise(F.lit("drop")).alias("route"),
    )


def blocklist_route(
    df: DataFrame,
    url_col: str,
    text_col: str,
    blocked_domains: Sequence[str],
    terms: Sequence[str],
    max_hits: int = 1,
) -> DataFrame:
    """UT1-style blocklist routing (RefinedWeb/FineWeb URL-filtering
    practice): a hard domain blocklist plus a soft content-term vote.

    - ``reg_domain`` via the PSL probe; ``blocked_domain`` when it is
      in the blocklist — shipped as ONE InSet probe (isInCollection:
      a single py4j call however large the UT1 list is, no join, no
      broadcast table);
    - ``term_hits`` = whole-word matches of the term alternation over
      the lowercased text, ONE regexp_count in the scan. Terms must be
      regex-safe lowercase words; with ``\\b`` on both sides exactly
      one alternative can match at any start (a shorter prefix
      alternative would have to end inside a word — not a boundary),
      so Java-greedy and RE2-longest counts agree;
    - ``route``: 'blocked_domain' > 'blocked_content' (hits >=
      max_hits) > 'keep'. NULL text scores 0 hits.

    Pure-codegen scan projection: zero joins, zero shuffles, zero
    Python — the filter a 100 TB crawl applies to every page.
    """
    from pyspark.sql import Column as _C

    from jsonschema_spark.operators.urltools import registered_domain

    reg = registered_domain(F.col(url_col))
    if blocked_domains:
        blocked = _C(reg._jc.isInCollection(sorted(blocked_domains)))
    else:
        blocked = F.lit(False)
    pat = r"\b(" + "|".join(terms) + r")\b"
    hits = F.coalesce(
        F.regexp_count(F.lower(F.col(text_col)), F.lit(pat)),
        F.lit(0),
    ).cast("long")
    return df.select(
        "*",
        reg.alias("reg_domain"),
        hits.alias("term_hits"),
        F.when(blocked, F.lit("blocked_domain"))
        .when(hits >= max_hits, F.lit("blocked_content"))
        .otherwise(F.lit("keep")).alias("route"),
    )
