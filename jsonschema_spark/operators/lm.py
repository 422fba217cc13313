"""Corpus language-model scoring for training-data curation.

Two published webtext-curation signals the reference's table-scale story
does not cover, expressed Spark-first:

- ``ngram_lm_score`` — CCNet-style fluency scoring (Wenzek et al. 2020
  score web text with a reference-domain KenLM and keep the low-perplexity
  head). Here the reference LM is an add-one-smoothed bigram model TRAINED
  IN-ENGINE on a reference subset of the corpus itself, and the score is an
  integer-ppm mean bigram probability — a monotone stand-in for negative
  perplexity that is bit-stable across Spark and DuckDB (no transcendental
  log/exp whose last-ulp differs between JVM and libm).

- ``dsir_weight`` — DSIR-style importance weights (Xie et al. 2023:
  hashed n-gram features, importance = log p_target/p_raw summed over
  features). Same integer-exact treatment: per-bucket add-one probabilities
  in ppm, token weight = p_target_ppm − p_raw_ppm (the first-order
  surrogate of the log-ratio: monotone in p_t/p_r around small
  probabilities), summed over the document's tokens with multiplicity.
  A float log-ratio variant is available behind ``exact_log=True`` for
  in-engine use where cross-engine bit-stability is not required.

Scale shape (both operators):
- the MODEL side is aggregated with one groupBy over exploded tokens
  (map-side partial aggregation; bigram/bucket cardinality is bounded by
  ``min_count`` pruning / the fixed bucket count, not corpus size), then
  BROADCAST to the scoring side — scoring never shuffles the corpus;
- the SCORING side is explode → broadcast-join → one groupBy(doc) —
  two shuffles of (doc_id, small ints) total, no Python anywhere;
- dsir's 2**bucket_bits weights collapse to a literal array lookup
  (the IVF-centroid trick), making scoring a pure scan projection.

Reference framing: sourcemeta/jsonschema has no LM surface; these extend
the table-scale curation suite (SURVEY.md §2.9) alongside the Gopher/C4
filters in operators/textstats.py.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from jsonschema_spark.operators.dedup import hash56, tokens

PPM = 1_000_000

# Safe-by-default model sizing (the auto-rows_per_band precedent): both
# knobs derive from the ONE number the model build already computes —
# the reference token count N — so they cost zero extra jobs. The
# count-cutoff type bound (#ngrams with count >= c is <= N/c, with
# equality only in the degenerate all-distinct corpus) gives:
# - auto min_count = ceil(N / AUTO_MODEL_MAX_ROWS): every numerator
#   table is capped at AUTO_MODEL_MAX_ROWS rows; 1 (no pruning) for any
#   corpus under AUTO_MODEL_MAX_ROWS tokens, so small-scale results and
#   oracle hashes are unchanged.
# - broadcast gate: est_rows = N // min_count is an UPPER bound on the
#   pruned table's rows; past BROADCAST_MAX_ROWS the model joins fall
#   back to shuffle hash joins on the n-gram key (the classify.py
#   size-gated-broadcast pattern) — AQE still picks broadcast at
#   runtime when the built table turns out small.
AUTO_MODEL_MAX_ROWS = 10_000_000
BROADCAST_MAX_ROWS = 5_000_000


def _auto_min_count(n_tokens: int, min_count: int | None) -> int:
    """Resolve the user's min_count: explicit values pass through
    (floored at 1); None derives the count cutoff that caps every
    numerator table at AUTO_MODEL_MAX_ROWS rows."""
    if min_count is not None:
        return max(int(min_count), 1)
    return max(1, -(-int(n_tokens) // AUTO_MODEL_MAX_ROWS))


def _maybe_broadcast(table: DataFrame, n_tokens: int,
                     min_count: int) -> DataFrame:
    """Size-gate a model-table broadcast on the N/min_count row upper
    bound — conservative (never broadcasts a table bigger than the
    bound), and zero extra jobs (no count() of the table itself)."""
    if int(n_tokens) // max(int(min_count), 1) <= BROADCAST_MAX_ROWS:
        return F.broadcast(table)
    return table


def _doc_tokens(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(F.col(id_col), tokens(F.col(text_col)).alias("_toks"))


def bigram_model(
    ref_df: DataFrame,
    text_col: str = "text",
    min_count: int | None = None,
) -> tuple[DataFrame, DataFrame, int, int]:
    """Train the add-one bigram model on the reference subset.

    Returns (bigram_counts, prefix_counts, vocab_size, n_tokens):
    - bigram_counts: (w1, w2, c2) with c2 >= min_count
    - prefix_counts: (w1, c1) where c1 = Σ_w2 c2 BEFORE pruning (the
      smoothed probabilities stay a proper distribution per prefix);
      rows with c1 < min_count are dropped — count monotonicity keeps
      every surviving bigram's prefix, and a dropped rare prefix falls
      through to the c1=0 smoothed denominator
    - vocab_size: distinct token types in the reference corpus (the
      add-one denominator's V)
    - n_tokens: total reference token count (drives the auto min_count
      and the scoring side's broadcast gate)

    ``min_count=None`` (default) auto-derives the cutoff from n_tokens
    so the pruned tables are bounded regardless of corpus size (see
    ``_auto_min_count`` — 1, i.e. unpruned, below 10M tokens).

    One explode of the reference corpus feeds all three aggregates.
    """
    toks = ref_df.select(tokens(F.col(text_col)).alias("_toks"))
    sz = F.size("_toks")
    n_tokens = int(toks.agg(F.sum(sz)).collect()[0][0] or 0)
    min_count = _auto_min_count(n_tokens, min_count)
    pairs = toks.where(sz >= 2).select(
        F.explode(
            F.arrays_zip(
                F.slice("_toks", 1, sz - 1).alias("w1"),
                F.slice("_toks", 2, sz - 1).alias("w2"),
            )
        ).alias("bg")
    ).select(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
    bigrams = pairs.groupBy("w1", "w2").agg(
        F.count(F.lit(1)).alias("c2"))
    if n_tokens <= AUTO_MODEL_MAX_ROWS:
        # small corpus: pin the counts once (prefixes + both scoring
        # joins consume them; without the checkpoint the explode would
        # re-run per consumer) — the table is bounded by n_tokens here
        bigrams = bigrams.localCheckpoint(eager=True)
        prefixes = bigrams.groupBy("w1").agg(F.sum("c2").alias("c1"))
    else:
        # crawl scale: NOTHING corpus-sized is pinned (the
        # trigram_model contract — the r4 unpruned-checkpoint OOM was
        # exactly this shape); prefixes re-aggregate the explode
        # directly (identical counts), trading one extra linear scan
        # for an O(distinct-bigrams) resident table
        prefixes = pairs.groupBy("w1").agg(
            F.count(F.lit(1)).cast("long").alias("c1"))
    if min_count > 1:
        bigrams = bigrams.where(F.col("c2") >= min_count)
        # prefix ROWS prune under the same cutoff (values are the
        # unpruned sums): c2 <= c1, so every surviving bigram's prefix
        # row survives; a pruned rare prefix falls through to the
        # c1=0 smoothed denominator — the count-cutoff contract.
        prefixes = prefixes.where(F.col("c1") >= min_count)
    vocab = toks.select(F.explode("_toks").alias("w")).agg(
        F.countDistinct("w").alias("v")
    ).collect()[0]["v"]
    return bigrams, prefixes, int(vocab), n_tokens


def ngram_lm_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ref_df: DataFrame | None = None,
    ref_text_col: str | None = None,
    min_count: int | None = None,
    portable: bool = True,
) -> DataFrame:
    """Score every document by mean smoothed bigram probability under a
    model trained on ``ref_df`` (defaults to ``df`` itself — in-domain
    fluency). Output: (id_col, n_bigrams, lm_score_ppm) where
    lm_score_ppm = floor( Σ_bigrams floor(PPM·(c2+1)/(c1+V)) / n_bigrams ),
    integer-exact in any engine. Documents with < 2 tokens score 0.

    CCNet keeps the low-perplexity head; here that is the HIGH
    lm_score_ppm head (probability, not perplexity — same ordering,
    reversed sign). ``min_count`` prunes the model tables; the DEFAULT
    (None) auto-derives the cutoff from the reference token count so
    the model is bounded on ANY corpus (unpruned below 10M tokens —
    small-scale results unchanged), and the model joins broadcast only
    while the N/min_count row bound fits executor memory, falling back
    to shuffle hash joins past it (``_maybe_broadcast``). Pruned
    bigrams fall back to the unseen-bigram smoothed score, which is
    the standard count-cutoff LM approximation.

    ``portable=False`` keys BOTH broadcast joins on ``xxhash64`` longs
    instead of bigram strings (the dedup/dsir fast-path split: only
    model/scorer consistency matters in-engine, and both sides hash the
    same way; a 64-bit collision merges two bigram counts — ppm-level
    noise at realistic model sizes). Measured 1.8x at 2M docs, local[8],
    5 alternating rounds: string median 52.8 s vs hashed 29.5 s,
    identical score sums — long join keys compare O(1) and the broadcast
    hashmap shrinks to (long, count) entries. The oracle-replayable
    string family stays the default.
    """
    ref = ref_df if ref_df is not None else df
    bigrams, prefixes, v, n_ref = bigram_model(
        ref, ref_text_col or text_col, min_count=min_count
    )
    mc = _auto_min_count(n_ref, min_count)
    toks = _doc_tokens(df, id_col, text_col)
    sz = F.size("_toks")
    doc_bg = toks.select(
        id_col,
        F.when(
            sz >= 2,
            F.arrays_zip(
                F.slice("_toks", 1, sz - 1).alias("w1"),
                F.slice("_toks", 2, sz - 1).alias("w2"),
            ),
        ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
        .alias("_bgs"),
    ).select(id_col, F.explode_outer("_bgs").alias("bg"))
    if portable:
        doc_bg = doc_bg.select(
            id_col, F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2")
        )
        bg_keys, pf_keys = ["w1", "w2"], ["w1"]
        present = F.col("w1").isNotNull()
    else:
        # xxhash64(NULL, ...) returns the seed, not NULL — guard so the
        # explode_outer sentinel row for token-less docs stays unjoined
        doc_bg = doc_bg.select(
            id_col,
            F.when(F.col("bg").isNotNull(),
                   F.xxhash64("bg.w1", "bg.w2")).alias("h2"),
            F.when(F.col("bg").isNotNull(), F.xxhash64("bg.w1")).alias("h1"),
        )
        bigrams = bigrams.select(F.xxhash64("w1", "w2").alias("h2"), "c2")
        prefixes = prefixes.select(F.xxhash64("w1").alias("h1"), "c1")
        bg_keys, pf_keys = ["h2"], ["h1"]
        present = F.col("h1").isNotNull()
    scored = (
        doc_bg
        .join(_maybe_broadcast(bigrams, n_ref, mc), bg_keys, "left")
        .join(_maybe_broadcast(prefixes, n_ref, mc), pf_keys, "left")
        .select(
            id_col,
            F.when(
                present,
                F.floor(
                    (F.coalesce("c2", F.lit(0)) + 1) * PPM
                    / (F.coalesce("c1", F.lit(0)) + v)
                ),
            ).alias("_p_ppm"),
        )
    )
    return scored.groupBy(id_col).agg(
        F.count("_p_ppm").alias("n_bigrams"),
        F.coalesce(
            F.floor(F.sum("_p_ppm") / F.greatest(F.count("_p_ppm"), F.lit(1))),
            F.lit(0),
        ).cast("long").alias("lm_score_ppm"),
    )


def _bucket(w, b_n: int, portable: bool):
    """Token → bucket. portable=True uses the md5 56-bit hash any engine
    reproduces (the oracle path); portable=False uses JVM xxhash64 —
    ~only consistency between the weight table and the scoring pass
    matters, and both run in-engine (same fast/portable split as
    dedup.minhash_signatures_df)."""
    if portable:
        return (hash56(w) % b_n).cast("int")
    return F.pmod(F.xxhash64(w), F.lit(b_n)).cast("int")


def dsir_bucket_weights(
    target_df: DataFrame,
    raw_df: DataFrame,
    text_col: str = "text",
    bucket_bits: int = 10,
    portable: bool = True,
) -> list[int]:
    """Per-bucket importance weights, returned as a dense python list of
    length 2**bucket_bits (driver-side size is the FIXED bucket count,
    never corpus-bound): weight[b] = p_target_ppm(b) − p_raw_ppm(b) with
    p_ppm(b) = floor(PPM·(cnt[b]+1)/(total+B)) — add-one over B buckets.
    Token → bucket via the portable 56-bit md5 hash, so any engine can
    reproduce the assignment."""
    b_n = 1 << bucket_bits

    def counts(src: DataFrame) -> dict[int, int]:
        rows = (
            src.select(F.explode(tokens(F.col(text_col))).alias("w"))
            .select(_bucket(F.col("w"), b_n, portable).alias("b"))
            .groupBy("b").agg(F.count(F.lit(1)).alias("c"))
            .collect()
        )
        return {r["b"]: r["c"] for r in rows}

    ct, cr = counts(target_df), counts(raw_df)
    tot_t, tot_r = sum(ct.values()), sum(cr.values())
    out = []
    for b in range(b_n):
        pt = (ct.get(b, 0) + 1) * PPM // (tot_t + b_n)
        pr = (cr.get(b, 0) + 1) * PPM // (tot_r + b_n)
        out.append(pt - pr)
    return out


def dsir_weight(
    df: DataFrame,
    id_col: str,
    text_col: str,
    target_df: DataFrame,
    raw_df: DataFrame | None = None,
    bucket_bits: int = 10,
    portable: bool = True,
) -> DataFrame:
    """DSIR importance weight per document: Σ_tokens weight[bucket(token)]
    (with multiplicity), plus n_tokens. ``raw_df`` defaults to ``df``.
    The 2**bucket_bits weights are embedded as ONE literal array, so the
    scoring pass is explode → element_at → groupBy(doc): the per-token
    lookup happens inside the scan projection, zero joins. (A/B'd against
    a shuffle-free per-row ``F.aggregate`` over the token array at 2M
    docs: explode+groupBy wins 29 s vs 35 s — higher-order lambdas are
    interpreted per element, the explode pipeline stays in codegen and
    map-side partial aggregation keeps the shuffle at one row per doc.)
    ``portable=False`` swaps the md5 bucket hash for JVM xxhash64 on both
    the model and scoring sides — the scale path when no cross-engine
    replay is needed."""
    weights = dsir_bucket_weights(
        target_df, raw_df if raw_df is not None else df, text_col,
        bucket_bits, portable=portable,
    )
    b_n = len(weights)
    lit = F.array(*[F.lit(w) for w in weights])
    tok = df.select(
        F.col(id_col), F.explode_outer(tokens(F.col(text_col))).alias("w")
    )
    per_tok = tok.select(
        id_col,
        F.when(
            F.col("w").isNotNull(),
            F.element_at(lit, _bucket(F.col("w"), b_n, portable) + 1),
        ).alias("_w"),
    )
    return per_tok.groupBy(id_col).agg(
        F.count("_w").alias("n_tokens"),
        F.coalesce(F.sum("_w"), F.lit(0)).cast("long").alias("dsir_weight_ppm"),
    )


def trigram_model(
    ref_df: DataFrame,
    text_col: str = "text",
    min_count: int | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame, int]:
    """Train the stupid-backoff trigram model (Brants et al. 2007,
    "Large Language Models in Machine Translation" — the web-scale LM
    whose whole point is that counts + backoff beat smoothing when the
    corpus is the web).

    Returns (tri, bi, uni, n_tokens):
    - tri: (w1, w2, w3, c3, ctx2) — trigram count + its bigram-context
      count, pre-joined so scoring needs no separate context lookup
    - bi:  (w2, w3, bc2, ctx1) — bigram count keyed on the LAST two
      scoring tokens + its unigram-context count
    - uni: (w3, uc1)
    - n_tokens: total reference token count (the unigram denominator)

    ``min_count`` prunes ALL THREE numerator tables (uni included —
    the open-vocabulary tail of a crawl otherwise grows the broadcast
    unigram table with corpus size; a pruned rare unigram falls through
    to OOV, the standard count-cutoff contract). The DEFAULT (None)
    auto-derives the cutoff from n_tokens (``_auto_min_count``: 1 —
    unpruned — below 10M tokens, so small corpora are unchanged; at
    crawl scale the cutoff caps every table at AUTO_MODEL_MAX_ROWS
    rows by the count-cutoff type bound). Count monotonicity
    (c3 ≤ c2(w1,w2) ≤ c1(w1)) guarantees every kept numerator's
    CONTEXT row survives the same cutoff, so pruning never strands a
    lookup; context VALUES (ctx2, ctx1) are attached from the unpruned
    aggregates (identical numbers — pruning drops rows, not counts).

    Scale shape: each count table derives from its own MINIMAL explode
    (uni/bi/tri positions) with map-side-partial count aggregation, and
    N is one ``sum(size(tokens))`` scan with no explode at all — the
    model build is a handful of linear passes over the reference corpus
    and NOTHING corpus-sized is materialized, checkpointed or pinned
    (the first draft checkpointed the unpruned padded-trigram table —
    distinct trigrams grow with the corpus on an open vocabulary, and
    the 4M-doc scale point OOMed exactly there; count shuffles instead
    spill gracefully when shuffle partitions are sized to the sort).
    The unpruned bigram aggregation is consumed twice (ctx2 source +
    numerator) and recomputes rather than persisting — two extra scans
    beat an O(distinct-bigrams) resident table."""
    toks = ref_df.select(tokens(F.col(text_col)).alias("_toks"))
    sz = F.size("_toks")
    n_tokens = int(
        toks.agg(F.sum(sz)).collect()[0][0] or 0)
    min_count = _auto_min_count(n_tokens, min_count)
    c1 = toks.select(F.explode("_toks").alias("w1")).groupBy("w1").agg(
        F.count(F.lit(1)).cast("long").alias("c1"))
    c2 = toks.where(sz >= 2).select(
        F.explode(F.arrays_zip(
            F.slice("_toks", 1, sz - 1).alias("w1"),
            F.slice("_toks", 2, sz - 1).alias("w2"),
        )).alias("bg")
    ).select("bg.w1", "bg.w2").groupBy("w1", "w2").agg(
        F.count(F.lit(1)).cast("long").alias("c2"))
    c3 = toks.where(sz >= 3).select(
        F.explode(F.arrays_zip(
            F.slice("_toks", 1, sz - 2).alias("w1"),
            F.slice("_toks", 2, sz - 2).alias("w2"),
            F.slice("_toks", 3, sz - 2).alias("w3"),
        )).alias("tg")
    ).select("tg.w1", "tg.w2", "tg.w3").groupBy("w1", "w2", "w3").agg(
        F.count(F.lit(1)).cast("long").alias("c3"))
    if min_count > 1:
        c3 = c3.where(F.col("c3") >= min_count)
    tri = c3.join(c2.withColumnRenamed("c2", "ctx2"), ["w1", "w2"])
    bi_num = c2.where(F.col("c2") >= min_count) if min_count > 1 else c2
    bi = bi_num.join(
        c1.withColumnRenamed("c1", "ctx1"), ["w1"]
    ).select(F.col("w1").alias("w2"), F.col("w2").alias("w3"),
             F.col("c2").alias("bc2"), "ctx1")
    uni_num = c1.where(F.col("c1") >= min_count) if min_count > 1 else c1
    uni = uni_num.select(F.col("w1").alias("w3"), F.col("c1").alias("uc1"))
    return tri, bi, uni, n_tokens


def stupid_backoff_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    ref_df: DataFrame | None = None,
    ref_text_col: str | None = None,
    min_count: int | None = None,
) -> DataFrame:
    """Score every document with a stupid-backoff trigram LM trained on
    ``ref_df`` (Brants et al. 2007; fixed backoff α = 0.4):

        S(w3 | w1 w2) = c3/ctx2            if the trigram was seen
                      = 0.4·bc2/ctx1        elif the (w2,w3) bigram was
                      = 0.16·uc1/N          elif w3 is in-vocabulary
                      = 0                   else (OOV)

    reported in integer ppm — 0.4·x ≡ (2·x) div 5 and 0.16·x ≡ (4·x)
    div 25 keep EVERY tier one exact int64 division (no doubles, no
    transcendental), so scores are bit-stable across engines. Int
    contract: 4e6·count < 2⁶³ → reference corpora to ~2.3e12 tokens.

    Output per document: n_trigrams (scored positions: doc length − 2),
    sb_score_ppm = (Σ tier scores) div n_trigrams, and the backoff-tier
    census (n_tier3, n_tier2, n_tier1, n_oov) — the census is the
    CCNet-style quality signal in itself (fluent prose hits tier 3;
    gibberish drowns in tier 1/OOV). Docs under 3 tokens score 0.

    Scale shape: scoring is one explode into (w1,w2,w3) triples + THREE
    model left joins (count-pruned via ``min_count`` — the DEFAULT
    auto-derives a cutoff that bounds every table regardless of corpus
    size, see trigram_model; pruned n-grams fall through to the next
    tier, which is exactly the stupid-backoff contract) + one map-side-
    partial groupBy(doc). The joins broadcast only while the
    N/min_count row bound fits executor memory and fall back to
    shuffle hash joins past it (``_maybe_broadcast``) — the corpus
    itself never shuffles on the broadcast path."""
    ref = ref_df if ref_df is not None else df
    tri, bi, uni, n = trigram_model(
        ref, ref_text_col or text_col, min_count=min_count)
    mc = _auto_min_count(n, min_count)
    toks = _doc_tokens(df, id_col, text_col)
    sz = F.size("_toks")
    trips = toks.select(
        id_col,
        F.when(
            sz >= 3,
            F.arrays_zip(
                F.slice("_toks", 1, sz - 2).alias("w1"),
                F.slice("_toks", 2, sz - 2).alias("w2"),
                F.slice("_toks", 3, sz - 2).alias("w3"),
            ),
        ).otherwise(
            F.array().cast("array<struct<w1:string,w2:string,w3:string>>")
        ).alias("_tgs"),
    ).select(id_col, F.explode_outer("_tgs").alias("tg")).select(
        id_col, F.col("tg.w1").alias("w1"),
        F.col("tg.w2").alias("w2"), F.col("tg.w3").alias("w3"),
    )
    joined = (
        trips
        .join(_maybe_broadcast(tri, n, mc), ["w1", "w2", "w3"], "left")
        .join(_maybe_broadcast(bi, n, mc), ["w2", "w3"], "left")
        .join(_maybe_broadcast(uni, n, mc), ["w3"], "left")
    )
    sentinel = F.col("w1").isNull()  # explode_outer row for short docs
    p = (
        F.when(sentinel, F.lit(None).cast("long"))
        .when(F.col("c3").isNotNull(),
              F.expr("(1000000 * c3) div ctx2"))
        .when(F.col("bc2").isNotNull(),
              F.expr("(2000000 * bc2) div (5 * ctx1)"))
        .when(F.col("uc1").isNotNull(),
              F.expr(f"(4000000 * uc1) div (25 * {max(n, 1)})"))
        .otherwise(F.lit(0))
    )
    tier = (
        F.when(sentinel, F.lit(None).cast("int"))
        .when(F.col("c3").isNotNull(), F.lit(3))
        .when(F.col("bc2").isNotNull(), F.lit(2))
        .when(F.col("uc1").isNotNull(), F.lit(1))
        .otherwise(F.lit(0))
    )
    scored = joined.select(id_col, p.alias("_p"), tier.alias("_tier"))

    def _n_tier(t: int):
        return F.sum(F.when(F.col("_tier") == t, 1).otherwise(0)) \
            .cast("long")

    return scored.groupBy(id_col).agg(
        F.count("_p").cast("long").alias("n_trigrams"),
        F.coalesce(
            F.expr("sum(_p) div greatest(count(_p), 1)"), F.lit(0)
        ).cast("long").alias("sb_score_ppm"),
        _n_tier(3).alias("n_tier3"),
        _n_tier(2).alias("n_tier2"),
        _n_tier(1).alias("n_tier1"),
        _n_tier(0).alias("n_oov"),
    )
