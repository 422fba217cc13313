"""Hashed linear quality classifier (operators/classify.py).

The invariants that matter at cluster scale:
- training is EXACTLY partition-invariant (integer sums only);
- training matches a pure-Python mirror bit-for-bit (the same property
  the DuckDB oracle then replays via unrolled CTEs);
- it learns: planted vocabulary separation reaches high held-out accuracy
  in a few iterations;
- empty documents carry the bias feature and still get scored.
"""
import hashlib

import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators.classify import (
    PPM,
    classifier_score,
    hashed_features,
    train_classifier,
    train_classifier_local,
)

POS_WORDS = ["alpha", "beta", "gamma", "delta", "epsilon"]
NEG_WORDS = ["zork", "quux", "fnord", "blivet", "gonk"]


def _mk_corpus(spark, n=120):
    rows = []
    for i in range(n):
        y = i % 2
        vocab = POS_WORDS if y else NEG_WORDS
        # deterministic "open vocabulary" filler so buckets aren't degenerate
        words = [vocab[(i * 7 + j) % 5] for j in range(8)] + [f"w{i % 23}"]
        rows.append((i, " ".join(words), y))
    return spark.createDataFrame(rows, "doc_id long, text string, label int")


def _h56_py(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:14], 16)


def test_training_matches_python_mirror_exactly(spark):
    df = _mk_corpus(spark, 80)
    w_spark = train_classifier(df, "doc_id", "text", "label", bits=6, iters=3)
    rows = [(r["text"], r["label"]) for r in df.collect()]
    w_py = train_classifier_local(rows, bits=6, iters=3, lr_ppm=500_000, clamp_ppm=8_000_000)
    assert w_spark == w_py


def test_training_is_partition_invariant(spark):
    df = _mk_corpus(spark, 90)
    w3 = train_classifier(df.repartition(3), "doc_id", "text", "label", bits=6, iters=2)
    w17 = train_classifier(df.repartition(17), "doc_id", "text", "label", bits=6, iters=2)
    assert w3 == w17


def test_planted_signal_converges(spark):
    train = _mk_corpus(spark, 100)
    w = train_classifier(train, "doc_id", "text", "label", bits=8, iters=4)
    # held-out docs (fresh ids, same vocabulary split)
    held = spark.createDataFrame(
        [(1000 + i, " ".join((POS_WORDS if i % 2 else NEG_WORDS)[j % 5] for j in range(6)), i % 2)
         for i in range(40)],
        "doc_id long, text string, label int",
    )
    scored = classifier_score(held, "doc_id", "text", w)
    acc = (
        scored.join(held.select("doc_id", "label"), "doc_id")
        .select(((F.col("p_ppm") >= 500_000).cast("int") == F.col("label")).cast("int").alias("ok"))
        .agg(F.avg("ok")).collect()[0][0]
    )
    assert acc >= 0.95, f"held-out accuracy {acc}"


def test_empty_doc_gets_bias_only_score(spark):
    df = spark.createDataFrame([(1, ""), (2, "   "), (3, "alpha beta")],
                               "doc_id long, text string")
    w = [0] * 65
    w[-1] = 2_000_000  # bias only
    out = {r["doc_id"]: r for r in classifier_score(df, "doc_id", "text", w).collect()}
    assert out[1]["n_tokens"] == 0 and out[1]["score_ppm"] == 2_000_000
    assert out[2]["score_ppm"] == 2_000_000
    assert out[1]["p_ppm"] == PPM  # clamp(500000 + 2e6//4) = 1e6
    assert len(out) == 3


def test_hard_sigmoid_floor_division_negative_margin(spark):
    # z_ppm = -3: python floor -3//4 = -1 → p = 499999 (NOT 500000 via
    # truncation) — pins the pydiv cross-engine floor semantics.
    df = spark.createDataFrame([(1, "neg")], "doc_id long, text string")
    bits = 4
    from jsonschema_spark.operators.classify import _bucket  # noqa: F401
    b = _h56_py("neg") % (1 << bits)
    w = [0] * ((1 << bits) + 1)
    w[b] = -3
    r = classifier_score(df, "doc_id", "text", w).collect()[0]
    assert r["score_ppm"] == -3 and r["p_ppm"] == 499_999


def test_feature_counts_include_bias(spark):
    df = spark.createDataFrame([(7, "x x y")], "doc_id long, text string")
    rows = hashed_features(df, "doc_id", "text", bits=4).collect()
    assert sum(r["c"] for r in rows) == 4  # 3 tokens + bias
    assert any(r["b"] == 16 and r["c"] == 1 for r in rows)


def test_weight_clamp(spark):
    df = _mk_corpus(spark, 40)
    w = train_classifier(df, "doc_id", "text", "label", bits=4, iters=6,
                         lr_ppm=50_000_000, clamp_ppm=1_000_000)
    assert all(-1_000_000 <= x <= 1_000_000 for x in w)


def test_score_portable_vs_fast_rank_agreement(spark):
    """The xxhash64 fast path trains a DIFFERENT (but equally valid)
    bucketing; both must separate the planted vocabulary."""
    df = _mk_corpus(spark, 80)
    w = train_classifier(df, "doc_id", "text", "label", bits=8, iters=4, portable=False)
    scored = classifier_score(df, "doc_id", "text", w, portable=False)
    acc = (
        scored.join(df.select("doc_id", "label"), "doc_id")
        .select(((F.col("p_ppm") >= 500_000).cast("int") == F.col("label")).cast("int").alias("ok"))
        .agg(F.avg("ok")).collect()[0][0]
    )
    assert acc >= 0.95
