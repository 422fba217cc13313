"""Approximate-nearest-neighbor search over an embedding column.

Brute-force cosine top-k is the correctness baseline; the scale path is a
sign-LSH bucketed variant (random-hyperplane sketch degenerates to
coordinate signs for the first ``sign_bits`` dims — deterministic and
engine-portable). Both are pure DataFrame plans:

- queries are broadcast (small side) → no shuffle of the corpus;
- ranking = window row_number per query, partial top-k pushed map-side by
  AQE when k << partition size;
- all scoring in quantized-integer space (dedup.cosine_micro) so results
  hash-match the SQL oracle bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window

from jsonschema_spark.operators.dedup import dot_q, quantize_embedding


def _cos_micro_pre(qq: Column, cq: Column, qn: Column, cn: Column) -> Column:
    """cosine with per-vector norms precomputed (norms cost O(n), not
    O(n·pairs)); float op order matches dedup.cosine_micro exactly."""
    return F.floor(
        F.lit(1000000.0) * dot_q(qq, cq).cast("double") / F.sqrt((qn * cn).cast("double"))
    ).cast("long")


def _scored(corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str, scale: int) -> DataFrame:
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"), quantize_embedding(F.col(vec_col), scale).alias("_cq")
    ).withColumn("_cn", dot_q(F.col("_cq"), F.col("_cq")))
    q = queries.select(
        F.col(id_col).alias("q_id"), quantize_embedding(F.col(vec_col), scale).alias("_qq")
    ).withColumn("_qn", dot_q(F.col("_qq"), F.col("_qq")))
    return (
        c.join(F.broadcast(q), F.col("q_id") != F.col("neighbor_id"))
        .select(
            "q_id",
            "neighbor_id",
            _cos_micro_pre(F.col("_qq"), F.col("_cq"), F.col("_qn"), F.col("_cn")).alias("cos_micro"),
        )
    )


def _topk(scored: DataFrame, k: int) -> DataFrame:
    w = Window.partitionBy("q_id").orderBy(F.col("cos_micro").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("q_id", "neighbor_id", "rnk", "cos_micro")
    )


def topk_bruteforce(
    corpus: DataFrame, queries: DataFrame, id_col: str, vec_col: str, k: int = 5, scale: int = 100
) -> DataFrame:
    """Exact top-k by quantized cosine → (q_id, neighbor_id, rnk,
    cos_micro); ties broken by neighbor_id (deterministic)."""
    return _topk(_scored(corpus, queries, id_col, vec_col, scale), k)


def sign_bucket(vec: Column, sign_bits: int = 8) -> Column:
    """LSH bucket = sign bits of the first ``sign_bits`` coordinates."""
    total = F.lit(0).cast("long")
    for i in range(sign_bits):
        total = total + F.when(F.element_at(vec, i + 1) >= 0, F.lit(1 << i)).otherwise(F.lit(0))
    return total


def topk_signlsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    sign_bits: int = 8,
    scale: int = 100,
) -> DataFrame:
    """Bucketed ANN: candidates restricted to the query's sign-LSH bucket,
    then exact rescoring + top-k inside the bucket. At corpus scale the
    bucket join replaces the broadcast-crossJoin with a hash join keyed on
    the bucket (2^sign_bits-way partition pruning of the pair space)."""
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        quantize_embedding(F.col(vec_col), scale).alias("_cq"),
        sign_bucket(F.col(vec_col), sign_bits).alias("_bkt"),
    ).withColumn("_cn", dot_q(F.col("_cq"), F.col("_cq")))
    q = queries.select(
        F.col(id_col).alias("q_id"),
        quantize_embedding(F.col(vec_col), scale).alias("_qq"),
        sign_bucket(F.col(vec_col), sign_bits).alias("_qbkt"),
    ).withColumn("_qn", dot_q(F.col("_qq"), F.col("_qq")))
    scored = (
        c.join(F.broadcast(q), (F.col("_bkt") == F.col("_qbkt")) & (F.col("q_id") != F.col("neighbor_id")))
        .select(
            "q_id",
            "neighbor_id",
            _cos_micro_pre(F.col("_qq"), F.col("_cq"), F.col("_qn"), F.col("_cn")).alias("cos_micro"),
        )
    )
    return _topk(scored, k)


# --- IVF (inverted-file) ANN -------------------------------------------------


def ivf_centroids_df(
    df: DataFrame, id_col: str, vec_col: str, n_centroids: int = 8, scale: int = 100
) -> DataFrame:
    """Coarse-quantizer centroids computed IN-ENGINE: one k-means step from
    hash-partitioned init (cell j = floor(mean) of vectors with
    id % n_centroids == j for numeric ids; non-numeric ids go through the
    portable 56-bit md5 prefix first, so string keys neither crash nor
    depend on JVM hash quality). Deterministic, engine-portable (the SQL
    oracle computes the identical centroids: ``id % n`` /
    ``conv(substr(md5(id),1,14),16,10) % n``), and one aggregation over
    the corpus — no driver-side training loop. Returns (ci, cv array<long>)."""
    id_field = df.schema[id_col].dataType.typeName()
    if id_field in ("byte", "short", "integer", "long"):
        cell = F.pmod(F.col(id_col), F.lit(n_centroids))
    else:
        cell = F.pmod(
            F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 14), 16, 10)
            .cast("long"),
            F.lit(n_centroids),
        )
    q = df.select(
        cell.alias("ci"),
        F.posexplode(quantize_embedding(F.col(vec_col), scale)).alias("pos", "v"),
    )
    # floor(exact-int sum / count) in ONE double division — engine `avg`
    # implementations may differ in the last ulp; this formula cannot
    per_dim = q.groupBy("ci", "pos").agg(
        F.floor(F.sum("v").cast("double") / F.count(F.lit(1))).cast("long").alias("cv")
    )
    return (
        per_dim.groupBy("ci")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cv"))), lambda s: s["cv"]
            ).alias("cv")
        )
    )


def _cell_assign_udf(cents: list):
    """Vectorized nearest-centroid assignment over Arrow batches.
    dist = |x|² − 2x·c + |c|²; |x|² is constant per row, so argmin over
    (−2x·c + |c|²) suffices and stays in exact int64. np.argmin's
    first-min tie-break equals the oracle's ORDER BY (dist, ci) rn=1."""
    from pyspark.sql.types import IntegerType

    C = np.array([cv for _, cv in cents], dtype=np.int64)
    Cn = (C * C).sum(axis=1)

    @F.pandas_udf(IntegerType())
    def _assign(s: pd.Series) -> pd.Series:
        X = np.stack(s.to_numpy()).astype(np.int64)
        d = -2 * (X @ C.T) + Cn[None, :]
        return pd.Series(d.argmin(axis=1).astype("int32"))

    return _assign


def _sqdist_lit(vec: Column, centroid: list) -> Column:
    c = F.array(*[F.lit(int(v)) for v in centroid])
    return F.aggregate(
        F.zip_with(vec, c, lambda x, y: (x - y) * (x - y)),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def topk_ivf(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 5,
    n_centroids: int = 8,
    n_probe: int = 2,
    scale: int = 100,
) -> DataFrame:
    """IVF ANN: corpus rows live in exactly one centroid cell; each query
    probes its ``n_probe`` nearest cells and rescoring is exact in-cell.

    Scale shape: the centroid table is tiny — collected once and embedded
    as literals, so cell ASSIGNMENT is a pure projection (zero shuffle
    over the corpus); the probe join keys on the cell id (n_probe rows per
    query, queries broadcast); pair space pruned ~n_probe/n_centroids.
    """
    cents = sorted(
        [(r["ci"], list(r["cv"])) for r in
         ivf_centroids_df(corpus, id_col, vec_col, n_centroids, scale).collect()]
    )

    def assign_cols(vec: Column):
        darr = F.array(*[_sqdist_lit(vec, cv) for _, cv in cents])
        return darr

    # corpus-side assignment: vectorized numpy matmul over Arrow batches —
    # the expression form is k interpreted array passes per row (the
    # documented Catalyst higher-order cost); exact-int arithmetic, so the
    # cell ids are IDENTICAL either way (np.argmin = first-min tie-break)
    _assign = _cell_assign_udf(cents)

    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        quantize_embedding(F.col(vec_col), scale).alias("_cq"),
    ).withColumn("_cn", dot_q(F.col("_cq"), F.col("_cq")))
    c = c.withColumn("_ci", _assign(F.col("_cq")))

    q = queries.select(
        F.col(id_col).alias("q_id"),
        quantize_embedding(F.col(vec_col), scale).alias("_qq"),
    ).withColumn("_qn", dot_q(F.col("_qq"), F.col("_qq")))
    darr_q = assign_cols(F.col("_qq"))
    probe_structs = F.array(
        *[F.struct(darr_q[i].alias("d"), F.lit(i).alias("i")) for i in range(len(cents))]
    )
    probes = F.transform(F.slice(F.array_sort(probe_structs), 1, n_probe), lambda s: s["i"])
    q = q.withColumn("_ci", F.explode(probes))

    scored = c.join(
        F.broadcast(q), (c["_ci"] == q["_ci"]) & (F.col("q_id") != F.col("neighbor_id"))
    ).select(
        "q_id",
        "neighbor_id",
        _cos_micro_pre(q["_qq"], F.col("_cq"), q["_qn"], F.col("_cn")).alias("cos_micro"),
    )
    return _topk(scored, k)


# --- SemDeDup (semantic deduplication) ----------------------------------------


def semantic_cells(
    df: DataFrame, id_col: str, vec_col: str, n_centroids: int = 8,
    scale: int = 100, kmeans_iters: int = 0
) -> DataFrame:
    """Assign every row to its nearest coarse-quantizer cell → df columns
    plus ``_ci`` (int cell id) and ``_q`` (quantized vector).

    Scale shape: centroids are one aggregation over the corpus
    (ivf_centroids_df) collected as n_centroids tiny rows; assignment is a
    pure Arrow-batched projection against those literals — ZERO shuffle of
    the corpus. Deterministic and oracle-replayable (same centroid
    formula, first-min tie-break).

    ``kmeans_iters > 0`` refines the hash-init centroids with that many
    Lloyd rounds (kmeans_fixed) before the final assignment — tighter
    cells mean fewer cross-cell misses for SemDeDup and better probe
    locality for IVF, at one extra corpus aggregation per round. 0 keeps
    the one-step quantizer the shipped oracle queries replay."""
    if kmeans_iters > 0:
        assigned, cent_list = kmeans_fixed(
            df.select(F.col(id_col), F.col(vec_col)), id_col, vec_col,
            k=n_centroids, iters=kmeans_iters, scale=scale,
        )
        cents = sorted((int(ci), list(cv)) for ci, cv in cent_list)
    else:
        cents = sorted(
            [(r["ci"], list(r["cv"])) for r in
             ivf_centroids_df(df, id_col, vec_col, n_centroids, scale).collect()]
        )
    assign = _cell_assign_udf(cents)
    ids = F.array(*[F.lit(ci) for ci, _ in cents])
    q = df.withColumn("_q", quantize_embedding(F.col(vec_col), scale))
    return q.withColumn(
        "_ci", F.element_at(ids, assign(F.col("_q")) + 1).cast("int")
    )


def semantic_dedup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    min_cos_micro: int = 450000,
    n_centroids: int = 8,
    scale: int = 100,
    n_blocks: int = 4,
    kmeans_iters: int = 0,
) -> DataFrame:
    """SemDeDup candidate pairs (Abbas et al. 2023, "SemDeDup:
    data-efficient learning at web-scale through semantic deduplication"):
    embeddings are clustered by the deterministic coarse quantizer and
    cosine near-duplicates are searched ONLY within each cluster —
    the paper's pruning that turns exact all-pairs O(n²·d) into
    Σ_c n_c²·d ≈ n²·d/k under balanced cells. Cross-cluster near-dups are
    missed by design (the documented recall trade; raise n_centroids with
    corpus size so cells stay bounded, k ∝ n keeps per-cell work linear).

    Plan: centroid agg → literal-projection cell assignment (no shuffle)
    → same-cell block-pair cogrouped matmul (dedup.blocked_cosine_pairs
    keyed on (_ci, pa, pb)), so one giant cell still cannot exceed
    per-task memory ≈ (cell/n_blocks)·d·8 bytes."""
    from jsonschema_spark.operators.dedup import blocked_cosine_pairs

    cells = semantic_cells(df, id_col, vec_col, n_centroids, scale,
                           kmeans_iters=kmeans_iters)
    q = cells.select(F.col(id_col).alias("_id"), "_q", "_ci")
    return blocked_cosine_pairs(q, min_cos_micro, n_blocks, cell_col="_ci")


def semantic_dedup(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    min_cos_micro: int = 450000,
    n_centroids: int = 8,
    scale: int = 100,
    n_blocks: int = 4,
    kmeans_iters: int = 0,
) -> DataFrame:
    """SemDeDup end-to-end: within-cluster cosine pairs → connected
    components → keep the min-id canonical row per duplicate group
    (deterministic, engine-portable stand-in for the paper's
    keep-farthest-from-centroid choice; the keep POLICY is orthogonal to
    the pruning structure). Returns surviving rows of ``df``."""
    from jsonschema_spark.operators.dedup import dedup_clusters, keep_canonical

    pairs = semantic_dedup_pairs(
        df, id_col, vec_col, min_cos_micro, n_centroids, scale, n_blocks,
        kmeans_iters=kmeans_iters,
    )
    return keep_canonical(df, dedup_clusters(pairs), id_col)


def prototypicality(
    df: DataFrame, id_col: str, vec_col: str, n_centroids: int = 8, scale: int = 100
) -> DataFrame:
    """Per-point prototypicality: quantized cosine between each embedding
    and ITS OWN cluster centroid (Sorscher et al. 2022 "Beyond neural
    scaling laws" SSL-prototypes pruning metric — low scorers are
    outliers/noise candidates, high scorers are redundant prototypes;
    prune from either end by rank). Companion to semantic_dedup on the
    same deterministic coarse quantizer.

    Scale shape: centroids = ONE aggregation collected as n tiny rows;
    everything per-row after that is a projection against centroid
    LITERALS — cell assignment (vectorized argmin pudf) and the cosine
    (dot with the assigned centroid via element_at over a literal
    array-of-arrays) — ZERO joins, ZERO shuffles. The dot products are
    Catalyst higher-order expressions (interpreted per element, 3·d ops
    per row); fold them into the assignment pudf if they ever dominate a
    bench.

    Output: (id_col, ci, cos_centroid_micro)."""
    cents = sorted(
        [(r["ci"], list(r["cv"])) for r in
         ivf_centroids_df(df, id_col, vec_col, n_centroids, scale).collect()]
    )
    assign = _cell_assign_udf(cents)
    cells = df.withColumn("_q", quantize_embedding(F.col(vec_col), scale)).withColumn(
        "_ci", assign(F.col("_q"))
    )
    cent_arr = F.array(*[
        F.array(*[F.lit(int(v)) for v in cv]) for _, cv in cents
    ])
    cv = F.element_at(cent_arr, F.col("_ci") + 1)
    return cells.select(
        F.col(id_col),
        F.col("_ci").cast("long").alias("ci"),
        F.floor(
            F.lit(1000000.0)
            * dot_q(F.col("_q"), cv).cast("double")
            / F.sqrt((dot_q(F.col("_q"), F.col("_q")) * dot_q(cv, cv)).cast("double"))
        ).cast("long").alias("cos_centroid_micro"),
    )


# --- fixed-iteration distributed k-means (Lloyd) -------------------------------


def _centroid_means(assigned: DataFrame) -> dict[int, list[int]]:
    """Per-cell per-dim floor(exact-int sum / count) from an assignment
    frame (_ci, _q) — ONE aggregation whose shuffle carries k·d rows
    (map-side partials absorb the n·d explode), then a k-row collect."""
    per_dim = (
        assigned.select("_ci", F.posexplode("_q").alias("pos", "v"))
        .groupBy("_ci", "pos")
        .agg(F.floor(F.sum("v").cast("double") / F.count(F.lit(1))).cast("long").alias("cv"))
    )
    rows = (
        per_dim.groupBy("_ci")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "cv"))), lambda s: s["cv"]
            ).alias("cv")
        )
        .collect()
    )
    return {int(r["_ci"]): [int(v) for v in r["cv"]] for r in rows}


def kmeans_fixed(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    k: int = 8,
    iters: int = 2,
    scale: int = 100,
) -> tuple[DataFrame, list[tuple[int, list[int]]]]:
    """Deterministic fixed-iteration Lloyd k-means over an embedding
    column — the trained upgrade of the one-step coarse quantizer behind
    IVF/SemDeDup, and the engine-portable counterpart of MLlib's KMeans
    (whose random init / float sums no SQL oracle can replay).

    All arithmetic is exact integer: vectors quantize to floor(x·scale)
    int64, assignment is argmin of exact int squared distance (ties →
    lowest cell id; np.argmin's first-min ≡ the oracle's ORDER BY
    (dist, ci)), centroid update is per-dim floor(sum/count) in one
    int64→double division. Init = floor-means under the hash partition
    ``id % k`` (md5-hash56 for non-numeric ids — the ivf_centroids_df
    rule), so any engine reproduces every round bit-for-bit.

    Rounds: c₁ = init means; for t = 1..iters: aₜ = assign(cₜ), and for
    t < iters, cₜ₊₁ = means(aₜ) with EMPTY CELLS CARRYING cₜ forward (a
    cell no point chose keeps its centroid — the standard Lloyd rule;
    an init cell with no points is dropped outright, so pick k ≤ n).
    Returns (assignment df: input + ``cell``, centroids under which the
    assignment was made, sorted by cell id).

    Scale shape per round: one Arrow-batched numpy argmin pass over the
    quantized vectors (k·d literal matrix broadcast inside the UDF — no
    join), one (ci,pos) groupBy collecting k·d rows to the driver. The
    quantized corpus is localCheckpoint'ed ONCE — every round rescans the
    materialized int vectors, not the float parquet + interpreted
    quantize transform. Driver state is k·d ints per round, never
    corpus-bound.
    """
    if k < 1 or iters < 1:
        raise ValueError("kmeans_fixed: k and iters must be >= 1")
    id_t = df.schema[id_col].dataType.typeName()
    if id_t in ("byte", "short", "integer", "long"):
        init_cell = F.pmod(F.col(id_col), F.lit(k))
    else:
        init_cell = F.pmod(
            F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 14), 16, 10)
            .cast("long"),
            F.lit(k),
        )
    q = df.select(
        F.col(id_col),
        quantize_embedding(F.col(vec_col), scale).alias("_q"),
        init_cell.cast("int").alias("_ci"),
    ).localCheckpoint(eager=True)
    cents = _centroid_means(q)
    assigned = None
    for t in range(iters):
        cent_list = sorted(cents.items())
        udf = _cell_assign_udf(cent_list)
        # the UDF returns the POSITION in cent_list; map back to cell ids
        # (identical unless an init cell was empty and dropped)
        ids = F.array(*[F.lit(ci) for ci, _ in cent_list])
        assigned = q.select(
            id_col, "_q",
            F.element_at(ids, udf(F.col("_q")) + 1).alias("_ci"),
        )
        if t < iters - 1:
            new = _centroid_means(assigned)
            cents = {ci: new.get(ci, cv) for ci, cv in cents.items()}
    out = assigned.select(F.col(id_col), F.col("_ci").cast("long").alias("cell"))
    return out, sorted(cents.items())
