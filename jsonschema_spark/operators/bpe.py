"""In-engine trainable BPE subword tokenizer — train merges, encode, count.

Byte-pair encoding (Sennrich et al. 2016) is the vocabulary every modern
LLM data pipeline ultimately feeds; `textstats.bpe_token_count` estimates
budgets at PRE-tokenization granularity, this module learns and applies a
real merge table. Reference framing: sourcemeta/jsonschema has no
tokenizer surface; this extends the table-scale curation suite
(SURVEY.md §2.10) alongside the quality classifier (operators/classify.py),
and follows the same bit-reproducible training discipline.

Semantics (shared EXACTLY by the Spark engine, the pure-Python mirror and
the DuckDB oracle mirror):

- words = ``[a-z]+`` runs of the lowercased text (ASCII letter runs —
  identical in Java, RE2 and Python regex); every word ends with the
  end-of-word symbol ``</w>`` so merges can learn suffixes and can never
  cross word boundaries (``</w>`` is always a rightmost symbol, so no
  learned merge ever has it on the LEFT).
- training round r: count adjacent symbol pairs over the distinct-word
  table weighted by word frequency (overlapping occurrences count, as in
  Sennrich's ``get_stats``), take the arg-max pair under the TOTAL order
  (count desc, left asc, right asc) — deterministic and partition-
  invariant (integer sums) — and merge it everywhere in one left-to-right
  non-overlapping pass; stop early when the best count < ``min_count``.
- encoding applies the learned merges IN RANK ORDER, one left-to-right
  non-overlapping pass per merge. For a single merge one pass is a
  fixpoint (the merged symbol ``l+r`` can never re-create the pair
  ``(l, r)``), so this equals the classic lowest-rank-first greedy loop
  except in the duplicate-derivation corner (two different merges
  producing the SAME symbol string, where greedy would re-apply an
  earlier rank to later-created symbols) — the rank-order pass is the
  DOCUMENTED contract here precisely because it is also expressible as a
  pure ``replace()`` chain in any SQL engine.

The delimited-symbol representation that makes one merge == one
``replace()``: a symbol sequence is stored as ``" s1| s2| s3|"`` — every
symbol prefixed by a space and terminated by ``|`` (neither appears in a
symbol: symbols are [a-z]+ strings or ``</w>``). Replacing
``" l| r|"`` with ``" lr|"`` is then exactly one left-to-right
non-overlapping merge pass: the leading space blocks suffix false-matches
(``" a| b|"`` cannot match inside ``" xa| b|"``), the terminator blocks
prefix false-matches (cannot match ``" a| bc|"``), and because standard
``replace`` resumes scanning AFTER the emitted replacement, consecutive
runs merge exactly like the sequential pass (``" a| a| a|"`` →
``" aa| a|"``). Token count = count of ``|``.

Scale shape (100 TB):
- the corpus is shuffled ONCE (word → count groupBy with map-side
  partials); every training round then touches only the VOCAB-sized
  word table: pairs explode → groupBy sum → ``orderBy().limit(1)``
  (TakeOrderedAndProject — parallel top-1, no global sort) → ONE
  codegen ``replace`` projection, localCheckpoint'ed so lineage stays
  flat. No Python anywhere in training.
- a production 30k-merge vocab means 30k sequential driver rounds — that
  is BPE's intrinsic data dependency, not a Spark artifact. The standard
  practice applies: learn merges on a deterministic hash-sample of the
  corpus (``curate.hash_split`` / ``budget_sample`` — vocab statistics
  converge at ~10⁷ words), then encode the FULL corpus with the learned
  table.
- encoding ships two equivalent paths (tested identical):
  ``bpe_encode_expr`` — a chained-``replace`` JVM column, zero Python,
  whole-stage-codegen until janino's 64KB method limit (~hundreds of
  merges; past it Spark falls back to interpreted eval gracefully,
  CLAUDE.md round-2) — the oracle path; and ``bpe_encode_pandas`` — an
  Arrow-batched pandas UDF with a per-batch memoized word→count dict
  (real corpora repeat words heavily), the production path for large
  merge tables.
"""
from __future__ import annotations

import re
from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

WORD_RE = "[a-z]+"
END = "</w>"

Merge = tuple[int, str, str, int]  # (rank, left, right, pair_count)


# ---------------------------------------------------------------------------
# shared representation helpers
# ---------------------------------------------------------------------------


def _sym_str(word: str) -> str:
    """Python mirror of the delimited-symbol initial representation."""
    return "".join(f" {c}|" for c in word) + f" {END}|"


def _enc_init_expr(word: Column) -> Column:
    """JVM initial representation: every char → ``" c|"``, then the
    end-of-word symbol. One regexp_replace in the scan projection."""
    return F.concat(
        F.regexp_replace(word, "(.)", " $1|"), F.lit(f" {END}|")
    )


def _words_expr(text: Column) -> Column:
    return F.regexp_extract_all(F.lower(text), F.lit(WORD_RE), 0)


# ---------------------------------------------------------------------------
# training — pure-Python mirror (the oracle's source of truth)
# ---------------------------------------------------------------------------


def bpe_train_local(
    word_counts: Sequence[tuple[str, int]],
    n_merges: int,
    min_count: int = 2,
) -> list[Merge]:
    """Reference implementation over a (word, count) table — bit-identical
    to ``bpe_train`` (asserted by tests): same pair counting (overlaps
    count), same total-order arg-max, same single-pass merge."""
    vocab: dict[tuple[str, ...], int] = {}
    for w, c in word_counts:
        syms = tuple(list(w) + [END])
        vocab[syms] = vocab.get(syms, 0) + c
    merges: list[Merge] = []
    for rank in range(n_merges):
        pairs: dict[tuple[str, str], int] = {}
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                p = (syms[i], syms[i + 1])
                pairs[p] = pairs.get(p, 0) + c
        if not pairs:
            break
        # total order: count desc, then (left, right) asc
        (l, r), n = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        if n < min_count:
            break
        merges.append((rank, l, r, n))
        nxt: dict[tuple[str, ...], int] = {}
        for syms, c in vocab.items():
            out: list[str] = []
            i = 0
            while i < len(syms):
                if i < len(syms) - 1 and syms[i] == l and syms[i + 1] == r:
                    out.append(l + r)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            t = tuple(out)
            nxt[t] = nxt.get(t, 0) + c
        vocab = nxt
    return merges


def encode_word_local(word: str, merges: Sequence[Merge]) -> list[str]:
    """Python mirror of encoding: merges in rank order, one left-to-right
    pass each (the documented contract — see module docstring)."""
    s = _sym_str(word)
    for _, l, r, _ in merges:
        s = s.replace(f" {l}| {r}|", f" {l}{r}|")
    return [t.lstrip() for t in s.split("|") if t]


# ---------------------------------------------------------------------------
# training — distributed
# ---------------------------------------------------------------------------


def word_counts_df(df: DataFrame, text_col: str) -> DataFrame:
    """(word, n) over the corpus — THE one corpus-wide shuffle of
    training; everything after is vocab-sized."""
    return (
        df.select(F.explode(_words_expr(F.col(text_col))).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def bpe_train(
    df: DataFrame,
    text_col: str,
    n_merges: int,
    min_count: int = 2,
    word_counts: Optional[DataFrame] = None,
    checkpoint_every: int = 8,
) -> list[Merge]:
    """Learn a BPE merge table IN SPARK. Returns the model-sized merge
    list (driver-side, like the classifier's weight vector / DSIR's 1024
    buckets — a bounded collect tier, never corpus-sized).

    Each round is pure JVM: split → adjacent-pair explode → groupBy sum
    (map-side partials) → ``orderBy(count desc, l, r).limit(1)`` (parallel
    top-1) → one ``replace`` projection over the word table. The table is
    localCheckpoint'ed every ``checkpoint_every`` rounds: between
    checkpoints lineage is only a chain of ≤ ``checkpoint_every``
    single-expression Projects (cheap to recompute per round), so most
    rounds cost ONE Spark job instead of two — the sequential rounds are
    BPE's intrinsic data dependency and per-job overhead dominates at
    vocab scale. Integer counts + a total-order arg-max make the learned
    table partition-invariant and bit-identical to ``bpe_train_local``.
    """
    wc = word_counts if word_counts is not None else word_counts_df(df, text_col)
    tbl = wc.select(
        _enc_init_expr(F.col("word")).alias("enc"), F.col("n")
    ).localCheckpoint(eager=True)
    ckpt = tbl

    merges: list[Merge] = []
    for rank in range(n_merges):
        syms = F.expr(
            "filter(transform(split(enc, '[|]'), x -> ltrim(x)), x -> x <> '')"
        )
        pairs = F.expr(
            "transform(slice(_syms, 1, size(_syms) - 1), "
            "(x, i) -> struct(x AS l, element_at(_syms, i + 2) AS r))"
        )
        best = (
            tbl.select(F.col("n"), syms.alias("_syms"))
            .select(F.col("n"), F.explode(pairs).alias("p"))
            .groupBy(F.col("p.l").alias("l"), F.col("p.r").alias("r"))
            .agg(F.sum("n").alias("cnt"))
            .orderBy(F.col("cnt").desc(), "l", "r")
            .limit(1)
            .collect()
        )
        if not best or best[0]["cnt"] < min_count:
            break
        l, r, cnt = best[0]["l"], best[0]["r"], int(best[0]["cnt"])
        merges.append((rank, l, r, cnt))
        tbl = tbl.select(
            F.replace(
                F.col("enc"), F.lit(f" {l}| {r}|"), F.lit(f" {l}{r}|")
            ).alias("enc"),
            "n",
        )
        if (rank + 1) % checkpoint_every == 0:
            tbl = tbl.localCheckpoint(eager=True)
            ckpt.unpersist()
            ckpt = tbl
    ckpt.unpersist()
    return merges


def merges_df(spark: SparkSession, merges: Sequence[Merge]) -> DataFrame:
    """The learned merge table as rows (rank, left, right, pair_count)."""
    return spark.createDataFrame(
        list(merges), "rank int, left string, right string, pair_count long"
    )


# ---------------------------------------------------------------------------
# encoding
# ---------------------------------------------------------------------------


def bpe_encode_expr(text: Column, merges: Sequence[Merge]) -> Column:
    """Encoded delimited-symbol string for a whole document — words are
    individually wrapped (each ends with ``</w>``) so no merge crosses a
    boundary, and the doc encodes as ONE chained-``replace`` column:
    zero Python, codegen while the chain fits janino's method limit."""
    word_enc = F.array_join(
        F.transform(_words_expr(text), lambda w: _enc_init_expr(w)), ""
    )
    enc = word_enc
    for _, l, r, _ in merges:
        enc = F.replace(enc, F.lit(f" {l}| {r}|"), F.lit(f" {l}{r}|"))
    return enc


def bpe_token_counts_df(
    df: DataFrame, id_col: str, text_col: str, merges: Sequence[Merge]
) -> DataFrame:
    """Per-document token accounting under a learned merge table:
    (id, n_words, n_tokens, fertility_ppm) where fertility is
    tokens-per-word in ppm (floor) — the standard tokenizer-quality
    metric. Pure scan projection (token count = count of ``|`` in the
    encoded string); no shuffle at all."""
    enc = bpe_encode_expr(F.col(text_col), merges)
    n_tokens = (
        F.length(enc) - F.length(F.replace(enc, F.lit("|"), F.lit("")))
    ).cast("long")
    n_words = F.size(_words_expr(F.col(text_col))).cast("long")
    return df.select(
        F.col(id_col),
        n_words.alias("n_words"),
        n_tokens.alias("n_tokens"),
        F.when(
            n_words > 0, F.floor(n_tokens * F.lit(1_000_000) / n_words)
        ).cast("long").alias("fertility_ppm"),
    )


def bpe_encode_pandas(
    df: DataFrame, id_col: str, text_col: str, merges: Sequence[Merge]
) -> DataFrame:
    """Arrow-batched encoder for production merge tables (the path past
    the codegen limit): per batch, words are encoded once into a memoized
    dict (real corpora repeat words heavily — the memo turns per-token
    work into per-DISTINCT-word work). Output schema matches
    ``bpe_token_counts_df``; tested identical on shared inputs."""
    import pandas as pd  # module-top import rule applies to UDF hints only

    rules = [(f" {l}| {r}|", f" {l}{r}|") for _, l, r, _ in merges]
    word_re = re.compile(WORD_RE)

    def part(batches):
        memo: dict[str, int] = {}

        def n_toks(word: str) -> int:
            got = memo.get(word)
            if got is None:
                s = _sym_str(word)
                for pat, rep in rules:
                    s = s.replace(pat, rep)
                got = s.count("|")
                memo[word] = got
            return got

        for pdf in batches:
            ids = pdf[id_col]
            nw, nt = [], []
            for t in pdf[text_col]:
                ws = word_re.findall((t or "").lower())
                nw.append(len(ws))
                nt.append(sum(n_toks(w) for w in ws))
            out = pd.DataFrame({id_col: ids, "n_words": nw, "n_tokens": nt})
            out["fertility_ppm"] = [
                (t * 1_000_000) // w if w else None
                for t, w in zip(out["n_tokens"], out["n_words"])
            ]
            yield out

    schema = (
        f"{id_col} long, n_words long, n_tokens long, fertility_ppm long"
    )
    return df.select(id_col, text_col).mapInPandas(part, schema)
