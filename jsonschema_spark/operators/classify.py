"""In-engine trainable hashed linear quality classifier.

The third published webtext-curation signal family after the Gopher/C4
heuristics (operators/textstats.py) and the generative LM / importance
weights (operators/lm.py): a DISCRIMINATIVE linear classifier over hashed
bag-of-words features — the CCNet / LLaMA "wiki-vs-crawl" quality filter
(Wenzek et al. 2020 §4.3; Touvron et al. 2023 train a fastText-style
classifier to keep pages "referenced by Wikipedia"). fastText with the
hashing trick IS a linear model over hashed n-gram counts; the training
loop here is the same shape (bag-of-features → linear margin → squashing
→ gradient), re-expressed Spark-first and integer-exact.

Everything is integer arithmetic so results are bit-stable across Spark,
DuckDB and Python and INVARIANT under partitioning (integer sums are
associative/commutative — no float-accumulation order sensitivity, so
local[2] ≡ local[32] ≡ a 1000-executor cluster, exactly):

- token → bucket via the portable 56-bit md5 hash (``portable=True``,
  the oracle path) or JVM xxhash64 (fast path) — same split as
  operators/lm.py:_bucket;
- margin  z_ppm  = Σ_b c_b · w_ppm[b]  (counts × ppm weights, int64);
- probability is the HARD sigmoid  p = clamp(1/2 + z/4, 0, 1)  ⇒
  p_ppm = clamp(500_000 + z_ppm ÷ 4, 0, 1_000_000) with Python-floor
  division (emulated in SQL as (a − pymod(a,4)) ÷ 4) — piecewise-linear,
  so no transcendental exp whose last ulp differs across engines;
- gradient  G_b = Σ_docs (p_ppm − y·10⁶) · c_b  (int64, exact);
- update  Δw_b = −(lr_ppm · G_b) // (n_train · 10⁶)  on the DRIVER in
  Python ints (the weight vector is 2^bits+1 entries — model-sized, never
  corpus-sized; same bounded-collect tier as DSIR's 1024 buckets), then
  clamped to ±``clamp_ppm`` and re-broadcast as a literal array.

Scale shape:
- feature extraction is ONE explode + ONE groupBy(doc, bucket) shuffle of
  (id, int, int) triples, localCheckpoint'ed once and reused across all
  training iterations (self-referencing plans recompute otherwise);
- each training iteration is: literal-array lookup (scan projection) →
  groupBy(doc) → broadcast the per-doc p back onto features →
  groupBy(bucket) with map-side partials into ≤ 2^bits+1 rows. The corpus
  is never reshuffled after the feature checkpoint;
- scoring with a trained/loaded model is a pure scan projection + one
  groupBy(doc): zero joins (the DSIR literal-array trick).

Overflow contract (Spark 4 ANSI throws on int64 overflow):
- |w_ppm| ≤ clamp_ppm (default 8·10⁶ = ±8 logits), c_b ≤ tokens/doc, so
  |z_ppm| ≤ tokens/doc · clamp_ppm — 10⁶-token documents stay < 2^53
  (the bound under which the remainder-free double division in ``_pydiv``
  is exact) and far under 2^63;
- |G_b| ≤ n_train · 10⁶ · max c_b: keep n_train · max_doc_tokens < 2^43
  (≈ 8 billion labeled examples × 1k tokens) — a labeled TRAINING set,
  not the corpus being scored, so this is no practical limit.

Reference framing: sourcemeta/jsonschema has no classifier surface; this
extends the table-scale curation suite (SURVEY.md §2.10) alongside
ngram_lm_score / dsir_weight.
"""
from __future__ import annotations

import hashlib

from pyspark.sql import DataFrame, functions as F

from jsonschema_spark.operators.dedup import tokens
from jsonschema_spark.operators.lm import _bucket

PPM = 1_000_000


def train_classifier_local(
    rows: list[tuple[str, int]],
    bits: int = 8,
    iters: int = 3,
    lr_ppm: int = 500_000,
    clamp_ppm: int = 8_000_000,
) -> list[int]:
    """Pure-Python mirror of :func:`train_classifier` (portable hash path)
    over ``(text, label)`` rows — same tokenization, same md5-56 bucketing,
    same integer formulas, proven bit-identical to the Spark trainer by
    tests/test_classify.py. The oracle uses it to derive deterministic
    weight literals for the DuckDB replay of ``classifier_score`` (SQL
    cannot train: the loop is iterative driver logic). ASCII corpora only:
    Java ``\\s`` is ASCII-whitespace while ``str.split()`` is unicode."""
    b_n = 1 << bits
    feats: list[tuple[dict[int, int], int]] = []
    for text, y in rows:
        toks = text.strip().lower().split() if text.strip() else []
        cnt: dict[int, int] = {}
        for wd in toks:
            b = int(hashlib.md5(wd.encode()).hexdigest()[:14], 16) % b_n
            cnt[b] = cnt.get(b, 0) + 1
        cnt[b_n] = 1  # bias
        feats.append((cnt, y))
    n = len(feats)
    w = [0] * (b_n + 1)
    if n == 0:
        return w
    for _ in range(iters):
        grads = [0] * (b_n + 1)
        for cnt, y in feats:
            z = sum(c * w[b] for b, c in cnt.items())
            p = min(max(500_000 + z // 4, 0), PPM)
            err = p - y * PPM
            for b, c in cnt.items():
                grads[b] += err * c
        for b in range(b_n + 1):
            if grads[b]:
                delta = -(lr_ppm * grads[b]) // (n * PPM)
                w[b] = max(-clamp_ppm, min(clamp_ppm, w[b] + delta))
    return w


def _pydiv(col, d: int):
    """Python-floor integer division of an int64 column by a small positive
    literal, exact on both engines: subtract the non-negative pmod first so
    the division is remainder-free (truncation == floor == exact double
    for |col| < 2^53; see module overflow contract)."""
    return ((col - F.pmod(col, F.lit(d))) / F.lit(d)).cast("long")


def hashed_features(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 8,
    portable: bool = True,
) -> DataFrame:
    """Per-document hashed bag-of-words: (id, b, c) bucket counts over
    2^bits unigram buckets PLUS one bias row (b = 2^bits, c = 1) per
    document — empty documents still carry the bias feature, so every
    document gets a margin."""
    b_n = 1 << bits
    toks = (
        df.select(F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_w"))
        .select(F.col(id_col), _bucket(F.col("_w"), b_n, portable).alias("b"))
        .groupBy(id_col, "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    bias = df.select(
        F.col(id_col), F.lit(b_n).cast("int").alias("b"), F.lit(1).cast("long").alias("c")
    )
    return toks.unionByName(bias)


def _margin(feats: DataFrame, id_col: str, weights_ppm: list[int]) -> DataFrame:
    """(id, z_ppm) from feature counts × a literal weight array — the
    lookup is a scan projection (element_at on a 2^bits+1 literal), the
    only shuffle is the groupBy(id)."""
    arr = F.array(*[F.lit(int(w)).cast("long") for w in weights_ppm])
    return (
        feats.select(
            F.col(id_col),
            (F.col("c") * F.element_at(arr, F.col("b").cast("int") + 1)).alias("_cw"),
        )
        .groupBy(id_col)
        .agg(F.sum("_cw").alias("z_ppm"))
    )


def _hard_sigmoid_ppm(z_col):
    """p_ppm = clamp(500000 + z_ppm ÷ 4, 0, 10⁶) — Python-floor division."""
    return F.least(
        F.greatest(F.lit(500_000).cast("long") + _pydiv(z_col, 4), F.lit(0).cast("long")),
        F.lit(PPM).cast("long"),
    )


def train_classifier(
    train_df: DataFrame,
    id_col: str,
    text_col: str,
    label_col: str,
    bits: int = 8,
    iters: int = 3,
    lr_ppm: int = 500_000,
    clamp_ppm: int = 8_000_000,
    portable: bool = True,
) -> list[int]:
    """Train the hashed linear classifier on a labeled DataFrame
    (``label_col``: 1 = keep/target, 0 = reject/raw). Returns the weight
    vector as a Python list of 2^bits+1 ppm ints (last entry = bias) —
    model-sized driver state, exactly reproducible on any engine and any
    partitioning (all-integer arithmetic; see module docstring)."""
    b_n = 1 << bits
    feats = hashed_features(train_df, id_col, text_col, bits, portable)
    feats = feats.localCheckpoint(eager=True)  # reused every iteration
    labels = train_df.select(
        F.col(id_col), (F.col(label_col).cast("long") * PPM).alias("_y_ppm")
    )
    n_train = labels.count()
    if n_train == 0:
        return [0] * (b_n + 1)

    # per-doc label/error tables are n_train-sized: broadcast them while
    # they fit an executor (typical labeled sets), shuffle-join past that
    # — AQE still picks broadcast at runtime if the side turns out small
    bcast = F.broadcast if n_train <= 10_000_000 else (lambda d: d)
    w = [0] * (b_n + 1)
    for _ in range(iters):
        p = (
            _margin(feats, id_col, w)
            .join(bcast(labels), id_col)
            .select(F.col(id_col), (_hard_sigmoid_ppm(F.col("z_ppm")) - F.col("_y_ppm")).alias("_err"))
        )
        grads = (
            feats.join(bcast(p), id_col)
            .groupBy("b")
            .agg(F.sum(F.col("_err") * F.col("c")).alias("g"))
            .collect()
        )
        for r in grads:  # ≤ 2^bits+1 rows — model-sized, never corpus-sized
            delta = -(lr_ppm * int(r["g"])) // (n_train * PPM)  # Python floor
            w[r["b"]] = max(-clamp_ppm, min(clamp_ppm, w[r["b"]] + delta))
    return w


def classifier_score(
    df: DataFrame,
    id_col: str,
    text_col: str,
    weights_ppm: list[int],
    portable: bool = True,
) -> DataFrame:
    """Score a corpus with a trained (or loaded) weight vector: (id,
    n_tokens, score_ppm, p_ppm). ``score_ppm`` is the raw margin (rank by
    it; it is exact), ``p_ppm`` the hard-sigmoid probability in ppm.
    Plan: scan projection (literal-array lookup) + one groupBy(doc) for
    the margin, one groupBy for token counts — zero joins against model
    state, so this runs at full corpus scale."""
    bits = (len(weights_ppm) - 1).bit_length() - 1
    assert (1 << bits) + 1 == len(weights_ppm), "weights must be 2^bits+1 long"
    feats = hashed_features(df, id_col, text_col, bits, portable)
    m = _margin(feats, id_col, weights_ppm)
    ntok = df.select(F.col(id_col), F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"))
    return ntok.join(m, id_col).select(
        F.col(id_col),
        F.col("n_tokens"),
        F.col("z_ppm").alias("score_ppm"),
        _hard_sigmoid_ppm(F.col("z_ppm")).alias("p_ppm"),
    )
