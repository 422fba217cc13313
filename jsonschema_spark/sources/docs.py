"""Deterministic documents-table generator (documents.parquet shape at
arbitrary scale) — the sf1+ input for the dedup/curation pipeline bench.

Same columns as /root/testdata/sf*/documents.parquet
(doc_id, text, lang, source, n_chars) with planted duplicate structure at
fixed RATES so stage output sizes must scale linearly with n_rows:

- ~5%  exact duplicates  (row borrows the text seed of an earlier row)
- ~2%  near duplicates   (borrowed seed, one word swapped)
- ~1%  boilerplate       (ONE identical short doc — the hot-band skew case)
- ~15% too short         (< min_words; quality filter fodder)

Everything is hash-derived from doc_id: no RNG, no driver-side data, a
pure codegen projection over ``spark.range`` at any row count.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

_VOCAB = [
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "row", "table", "stream", "merge",
    "data", "vector", "join", "shard", "page", "crawl", "text", "token",
    "index", "block", "cache", "plan", "stage", "skew", "salt", "probe",
    "the", "and", "of", "to", "in", "for", "is", "on",
]

_BOILER = "subscribe to our newsletter terms of service privacy policy all rights reserved"


def _h(seed: int, col: Column) -> Column:
    return F.abs(F.xxhash64(col, F.lit(seed)))


def documents_df(spark: SparkSession, n_rows: int,
                 num_partitions: int | None = None) -> DataFrame:
    base = spark.range(0, n_rows, numPartitions=num_partitions)
    i = F.col("id")

    sel = _h(1, i) % 100
    # exact dup: borrow seed of the row 1..1000 places earlier; near dup:
    # same borrow, then one word swapped (position + replacement hashed)
    borrow = F.greatest(i - 1 - (_h(2, i) % 1000), F.lit(0))
    seed = F.when((sel >= 1) & (sel < 8), borrow).otherwise(i)

    short = (sel >= 8) & (sel < 23)
    n_words = F.when(short, _h(3, seed) % 8 + 3).otherwise(_h(3, seed) % 150 + 55)

    # ~25% of words carry a distinctive hashed token from a 100k space:
    # without them a small closed vocabulary gives random doc pairs a
    # nonzero shingle Jaccard, and at n^2 pair scale even J ~ 1e-3
    # percolates LSH candidates into one giant component (real webtext
    # has a heavy-tailed open vocabulary; this models it)
    words = F.transform(
        F.sequence(F.lit(0), n_words - 1),
        lambda j: F.when(
            F.pmod(F.xxhash64(seed, j, F.lit(11)), F.lit(4)) == 0,
            F.concat(F.lit("t"), F.pmod(F.xxhash64(seed, j, F.lit(13)), F.lit(100000)).cast("string")),
        ).otherwise(
            F.element_at(
                F.array(*[F.lit(w) for w in _VOCAB]),
                ((F.xxhash64(seed, j, F.lit(7)) % len(_VOCAB) + len(_VOCAB))
                 % len(_VOCAB)).cast("int") + 1,
            )
        ),
    )
    near = (sel >= 6) & (sel < 8)
    words = F.when(
        near,
        F.transform(
            words,
            lambda w, j: F.when(
                j == _h(4, i) % 40,
                F.element_at(F.array(*[F.lit(w) for w in _VOCAB]),
                             (_h(5, i) % len(_VOCAB)).cast("int") + 1),
            ).otherwise(w),
        ),
    ).otherwise(words)
    text = F.when(sel < 1, F.lit(_BOILER)).otherwise(F.array_join(words, " "))

    lang = F.element_at(
        F.array(F.lit("en"), F.lit("en"), F.lit("en"), F.lit("de"),
                F.lit("fr"), F.lit("es"), F.lit("zh")),
        (_h(6, i) % 7).cast("int") + 1,
    )
    return base.select(
        i.alias("doc_id"),
        text.alias("text"),
        lang.alias("lang"),
        F.concat(F.lit("src"), (_h(7, i) % 10).cast("string")).alias("source"),
        F.length(text).alias("n_chars"),
    )
