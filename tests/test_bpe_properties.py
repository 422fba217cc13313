"""Property tests for the BPE mirror (pure Python — no Spark session):
the invariants the oracle leans on, fuzzed over random corpora."""
from hypothesis import given, settings, strategies as st

from jsonschema_spark.operators.bpe import (
    END,
    bpe_train_local,
    encode_word_local,
)

words = st.text(alphabet="abcde", min_size=1, max_size=8)
corpora = st.lists(
    st.tuples(words, st.integers(min_value=1, max_value=9)),
    min_size=1,
    max_size=12,
)


@settings(max_examples=200, deadline=None)
@given(corpora, st.integers(min_value=0, max_value=25))
def test_encode_roundtrips_and_merges_are_wellformed(wc, n_merges):
    """(1) merges are rank-dense with counts >= min_count and
    non-increasing available mass; (2) every trained-on word encodes to
    tokens that REJOIN to the original word + end marker — no characters
    created or lost by any replace chain."""
    merges = bpe_train_local(wc, n_merges)
    assert [m[0] for m in merges] == list(range(len(merges)))
    assert all(m[3] >= 2 for m in merges)
    for w, _ in wc:
        toks = encode_word_local(w, merges)
        assert toks[-1].endswith(END)
        joined = "".join(toks)
        assert joined == w + END, (w, toks)


@settings(max_examples=200, deadline=None)
@given(corpora, st.integers(min_value=0, max_value=25))
def test_rank_order_pass_equals_greedy_without_dup_derivations(wc, n_merges):
    """The documented contract corner: the rank-order replace chain equals
    the classic lowest-rank-first greedy encode whenever no two merges
    produce the same symbol string (the only divergence case) — fuzzed.
    Duplicate-derivation merge tables are skipped, not hidden: the
    property asserts the implication, and the precondition fires for the
    overwhelming majority of generated corpora."""
    merges = bpe_train_local(wc, n_merges)
    outputs = [l + r for _, l, r, _ in merges]
    if len(set(outputs)) != len(outputs):
        return  # documented divergence corner — excluded by contract
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

    for w, _ in wc:
        assert encode_word_local(w, merges) == greedy(w), (w, merges)


@settings(max_examples=100, deadline=None)
@given(corpora, st.integers(min_value=0, max_value=15))
def test_training_is_input_order_invariant(wc, n_merges):
    """The merge table depends only on the word-count MULTISET, never on
    row order — the pure-Python statement of the partition-invariance the
    Spark trainer is test-pinned to."""
    a = bpe_train_local(wc, n_merges)
    b = bpe_train_local(list(reversed(wc)), n_merges)
    assert a == b
