"""Trainable BPE tokenizer — mirror exactness, representation safety,
encode-path agreement, contract edges (operators/bpe.py)."""
import pytest
from pyspark.sql import functions as F

from jsonschema_spark.operators.bpe import (
    END,
    bpe_encode_pandas,
    bpe_token_counts_df,
    bpe_train,
    bpe_train_local,
    encode_word_local,
    word_counts_df,
)

CORPUS = [
    "the lowest lower low slowest slower slow",
    "running runner runs run newest newer new",
    "the widest wider wide rider riding rides",
    "aaaa aaaa baaa",  # consecutive-run + tie material
]


def _df(spark):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )


def _wc(spark):
    return [
        (r["word"], r["n"])
        for r in word_counts_df(_df(spark), "text").collect()
    ]


def test_train_mirror_exact_and_partition_invariant(spark):
    """The distributed loop reproduces the pure-Python mirror merge for
    merge — rank, pair AND count — and is invariant under repartitioning
    (integer sums + total-order arg-max)."""
    local = bpe_train_local(_wc(spark), 18)
    dist = bpe_train(_df(spark), "text", 18)
    assert dist == local
    dist7 = bpe_train(_df(spark).repartition(7), "text", 18)
    assert dist7 == local
    # checkpoint cadence is an execution detail, not a semantic one
    dist1 = bpe_train(_df(spark), "text", 18, checkpoint_every=1)
    assert dist1 == local


def test_encode_paths_agree(spark):
    """JVM chained-replace == Arrow pandas encoder == Python mirror on
    every document."""
    merges = bpe_train_local(_wc(spark), 18)
    import re

    jvm = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["fertility_ppm"])
        for r in bpe_token_counts_df(_df(spark), "doc_id", "text", merges).collect()
    }
    pd_ = {
        r["doc_id"]: (r["n_words"], r["n_tokens"], r["fertility_ppm"])
        for r in bpe_encode_pandas(_df(spark), "doc_id", "text", merges).collect()
    }
    assert jvm == pd_
    for i, t in enumerate(CORPUS):
        ws = re.findall("[a-z]+", t.lower())
        nt = sum(len(encode_word_local(w, merges)) for w in ws)
        assert jvm[i] == (len(ws), nt, (nt * 1_000_000) // len(ws))


def test_representation_boundary_safety():
    """The delimited-symbol form blocks suffix and prefix false matches:
    merge (a,b) must not fire when 'a' is the tail of another symbol or
    'b' a prefix of one — and consecutive runs merge left-to-right."""
    # suffix: after (z,a), the word 'zab' holds symbols [za, b]; (a,b)
    # must NOT see the 'a' inside 'za'
    merges = [(0, "z", "a", 9), (1, "a", "b", 9)]
    assert encode_word_local("zab", merges) == ["za", "b", END]
    # prefix: symbols [a, bc]; (a,b) must not split 'bc'
    merges2 = [(0, "b", "c", 9), (1, "a", "b", 9)]
    assert encode_word_local("abc", merges2) == ["a", "bc", END]
    # consecutive run, single left-to-right pass per merge
    merges3 = [(0, "a", "a", 9)]
    assert encode_word_local("aaaa", merges3) == ["aa", "aa", END]
    assert encode_word_local("aaa", merges3) == ["aa", "a", END]
    merges4 = [(0, "a", "a", 9), (1, "aa", "aa", 9)]
    assert encode_word_local("aaaa", merges4) == ["aaaa", END]


def test_rank_order_equals_classic_greedy(spark):
    """On corpora without duplicate-derivation merges (the documented
    contract corner), the rank-order pass equals the classic
    lowest-rank-first greedy loop — pinned over every fixture word."""
    merges = bpe_train_local(_wc(spark), 18)
    ranks = {(l, r): k for k, l, r, _ in merges}

    def greedy(word):
        syms = list(word) + [END]
        while len(syms) > 1:
            best = None
            for i in range(len(syms) - 1):
                rk = ranks.get((syms[i], syms[i + 1]))
                if rk is not None and (best is None or rk < best[0]):
                    best = (rk, syms[i], syms[i + 1])
            if best is None:
                break
            _, l, r = best
            out, i = [], 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        return syms

    for w, _ in _wc(spark):
        assert encode_word_local(w, merges) == greedy(w), w


def test_min_count_stop_and_empty(spark):
    """Training stops before emitting a merge seen fewer than min_count
    times; an empty corpus yields no merges; wordless docs count zero
    tokens with NULL fertility."""
    one = spark.createDataFrame([(0, "ab cd")], "doc_id long, text string")
    # every pair occurs once — default min_count=2 learns nothing
    assert bpe_train(one, "text", 5) == []
    assert bpe_train_local([("ab", 1), ("cd", 1)], 5) == []
    empty = spark.createDataFrame([(0, "123 !!")], "doc_id long, text string")
    assert bpe_train(empty, "text", 3) == []
    row = bpe_token_counts_df(empty, "doc_id", "text", []).first()
    assert (row["n_words"], row["n_tokens"], row["fertility_ppm"]) == (0, 0, None)
