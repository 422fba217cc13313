"""Referential-integrity checks — the table-level `$ref` analogue
(SURVEY.md §2.6): membership of a fact column in a dimension key set.

Three strategies, chosen by dimension size (north_rule: broadcast bloom
filters with salted repartitioning for skew):

1. ``isin`` literal list — tiny static allowlists (lang codes). Catalyst
   compiles to an InSet; zero shuffle.
2. Broadcast exact anti-join — dimension fits in the broadcast limit.
   Zero shuffle of the fact table.
3. ``BroadcastBloom`` — dimension too big for an exact broadcast hash
   relation but its *bloom* fits (100M urls ≈ 120 MB at 1% fpp): built
   distributed (per-partition numpy bitmaps, OR-merged via treeAggregate),
   broadcast once, probed by an Arrow-batched pandas UDF. Bloom negatives
   are definite violations; positives are verified with an exact join
   against only the surviving (tiny) fraction.

For non-broadcastable joins with skewed fact keys, ``salted_counts``
shows the explicit salting pattern (hot keys split across ``n_salts``
reducers; AQE skew-join handles the residual).
"""

from __future__ import annotations

import math
from typing import Iterable, Optional

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import BooleanType


def in_allowlist(col: Column, allowed: Iterable) -> Column:
    """Strategy 1: literal allowlist membership (InSet, codegen)."""
    return col.isin(list(allowed))


def anti_join_orphans(fact: DataFrame, key: str, dim: DataFrame, dim_key: str) -> DataFrame:
    """Strategy 2: rows whose key has no dimension match (broadcast left
    anti join — fact table never shuffles)."""
    return fact.join(F.broadcast(dim.select(dim_key)), fact[key] == dim[dim_key], "left_anti")


class BroadcastBloom:
    """Driver-side bloom filter state (bits, m, k). Deterministic
    Kirsch-Mitzenmacher double hashing over TWO JVM-side ``xxhash64``
    values of the key — hashing never happens in Python: the build hashes
    each dimension key once inside the scan projection, and the probe's
    pandas UDF only does whole-array numpy bit gathers over precomputed
    (h1, h2) columns (Arrow transport AND vectorized compute)."""

    def __init__(self, bits: np.ndarray, m: int, k: int):
        self.bits = bits  # uint8 bitmap, length m/8
        self.m = m
        self.k = k

    @staticmethod
    def params(expected: int, fpp: float = 0.01) -> tuple[int, int]:
        m = max(64, int(-expected * math.log(fpp) / (math.log(2) ** 2)))
        m = (m + 7) // 8 * 8
        k = max(1, round(m / expected * math.log(2))) if expected else 1
        return m, k

    @staticmethod
    def indices(h1: np.ndarray, h2: np.ndarray, m: int, k: int) -> np.ndarray:
        """(n, k) bit positions from xxhash64 pairs: (h1 + i·(h2|1)) mod m,
        in uint64 wraparound arithmetic (identical on build and probe)."""
        u1 = h1.astype(np.int64).view(np.uint64)
        u2 = h2.astype(np.int64).view(np.uint64) | np.uint64(1)
        i = np.arange(k, dtype=np.uint64)[None, :]
        return (u1[:, None] + i * u2[:, None]) % np.uint64(m)

    @staticmethod
    def set_bits(bits: np.ndarray, idx: np.ndarray) -> None:
        # ufunc.at: unbuffered |= — plain fancy-indexed |= silently drops
        # updates when two hash positions land in the same byte
        flat = idx.ravel()
        np.bitwise_or.at(bits, flat // 8, (np.uint8(1) << (flat % 8).astype(np.uint8)))

    def probe_many(self, h1: np.ndarray, h2: np.ndarray) -> np.ndarray:
        idx = self.indices(h1, h2, self.m, self.k)
        return ((self.bits[idx // 8] >> (idx % 8).astype(np.uint8)) & 1).all(axis=1)


def _hash_cols(col: Column) -> tuple[Column, Column]:
    """Two independent 64-bit JVM hashes of the (stringified) key.
    The second appends a constant column — xxhash64 folds it into the
    stream, yielding an independent hash of the same value."""
    s = col.cast("string")
    return F.xxhash64(s), F.xxhash64(s, F.lit(1))


def build_bloom(dim: DataFrame, key: str, expected: Optional[int] = None, fpp: float = 0.01) -> BroadcastBloom:
    """Build a bloom of the dimension keys, distributed: keys are hashed
    JVM-side in the scan projection; each partition sets its bits with one
    vectorized numpy pass; partition bitmaps OR-merge via treeReduce
    (log-depth — 1000 executors merge in ~3 rounds, not 1000)."""
    if expected is None:
        expected = dim.select(F.approx_count_distinct(key)).first()[0] or 1
    m, k = BroadcastBloom.params(expected, fpp)

    h1, h2 = _hash_cols(F.col(key))
    hashed = dim.filter(F.col(key).isNotNull()).select(h1.alias("h1"), h2.alias("h2"))

    def part_bitmap(rows):
        bits = np.zeros(m // 8, dtype=np.uint8)
        pairs = list(rows)
        if pairs:
            a1 = np.fromiter((r[0] for r in pairs), dtype=np.int64, count=len(pairs))
            a2 = np.fromiter((r[1] for r in pairs), dtype=np.int64, count=len(pairs))
            BroadcastBloom.set_bits(bits, BroadcastBloom.indices(a1, a2, m, k))
        yield bits

    bits = hashed.rdd.mapPartitions(part_bitmap).treeReduce(lambda a, b: a | b, depth=3)
    return BroadcastBloom(bits, m, k)


def bloom_might_contain(spark, bloom: BroadcastBloom, col: Column) -> Column:
    """Strategy 3 probe: h1/h2 computed JVM-side (two-seed xxhash64), then
    one Arrow-batched pandas UDF doing whole-array numpy gathers — no
    per-row Python anywhere. False ⇒ definitely not a member (safe to
    fail the row); True ⇒ verify survivors with an exact join. NULL keys
    probe as NULL."""
    bc = spark.sparkContext.broadcast((bloom.bits, bloom.m, bloom.k))

    @F.pandas_udf(BooleanType())
    def probe(h1: pd.Series, h2: pd.Series) -> pd.Series:
        bits, m, k = bc.value
        bf = BroadcastBloom(bits, m, k)
        return pd.Series(bf.probe_many(h1.to_numpy(dtype=np.int64), h2.to_numpy(dtype=np.int64)))

    c1, c2 = _hash_cols(col)
    return F.when(col.isNull(), F.lit(None).cast("boolean")).otherwise(probe(c1, c2))


def referential_violations(
    spark,
    fact: DataFrame,
    key: str,
    dim: DataFrame,
    dim_key: str,
    bloom: Optional[BroadcastBloom] = None,
) -> DataFrame:
    """Rows of ``fact`` whose key is not in ``dim``. With a bloom, the
    exact verification join only sees bloom-positive rows (at 1% fpp the
    join input shrinks ~100× when most keys are orphans, or passes
    through matched keys without shuffling the fact table)."""
    if bloom is None:
        return anti_join_orphans(fact, key, dim, dim_key)
    probed = fact.withColumn("__maybe", bloom_might_contain(spark, bloom, F.col(key)))
    definite = probed.filter(~F.col("__maybe")).drop("__maybe")
    survivors = probed.filter(F.col("__maybe")).drop("__maybe")
    verified = anti_join_orphans(survivors, key, dim, dim_key)
    return definite.unionByName(verified)


def salted_counts(fact: DataFrame, key: str, n_salts: int = 16) -> DataFrame:
    """Two-stage skew-defused count per key: stage 1 aggregates on
    (key, salt) — the hot key spreads over ``n_salts`` reducers — stage 2
    merges the partials. The salt hashes ``monotonically_increasing_id``,
    which depends on partition layout: per-salt PARTIALS can differ across
    runs, but the stage-2 merge makes the final per-key counts exact and
    layout-independent. (`rand()` would work too; the hash avoids a
    nondeterministic-expression re-execution hazard under task retry.)"""
    salted = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    partial = salted.groupBy(key, "__salt").agg(F.count(F.lit(1)).alias("__partial"))
    return partial.groupBy(key).agg(F.sum("__partial").alias("n"))


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    n_salts: int = 16,
) -> DataFrame:
    """Skew-defused inner equi-join — the ACTION the `hot_keys` /
    `key_size_histogram` measurements call for when one fact key
    carries a double-digit share: salt the fact side (hot key spreads
    over ``n_salts`` reducers), replicate the dim side ``n_salts``
    times, join on (key, salt). The result is row-for-row the plain
    inner join — duplicate dim keys included, since a fact row meets
    exactly its own salt's replica of every matching dim row — at the
    cost of shuffling the dim side ×n_salts (cheap when dim ≪ fact,
    which is exactly the skewed-fact regime; when dim fits in memory
    prefer broadcast(), which needs no salt at all; AQE's skew-join
    handles the middle ground at runtime).

    The salt hashes the whole fact row (deterministic under task
    retry, unlike rand()); its distribution only affects balance,
    never the result multiset.
    """
    struct_cols = [F.col(c) for c in fact.columns]
    f = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(F.struct(*struct_cols)),
                         F.lit(n_salts)))
    # generators can't nest in expressions (no cast around explode);
    # the int salt coerces fine against the hashed long in the join key
    d = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1))))
    cond = (f[fact_key] == d[dim_key]) & (f["__salt"] == d["__salt"])
    return f.join(d, cond, "inner").drop("__salt")
