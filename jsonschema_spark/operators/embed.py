"""In-engine text embeddings via the hashing trick (signed bag-of-words).

Closes the loop between the text operators and the vector operators: the
ANN / SemDeDup / near-dup suite (operators/similarity.py, dedup.py)
consumes any ``array<float>`` column — usually model embeddings carried
in the table — and this module PRODUCES such a column from raw text
inside the engine, with no model service: the classic feature-hashing /
SimHash-style signed projection (Weinberger et al. 2009, "Feature
Hashing for Large Scale Multitask Learning"): every token hashes to a
bucket in [0, dim) and a sign ±1; the embedding is the per-bucket signed
count. Random-projection folklore applies — cosine over these vectors
approximates token-multiset similarity, which is exactly the signal
near-dup detection wants (it is SimHash before the final sign()).

Everything is integer counting until the final cast, so the vectors are
bit-stable across engines and partitionings, and the DuckDB oracle
replays per-document norms/checksums exactly.

Scale shape: ONE explode + ONE groupBy(doc, bucket) shuffle of (id, int,
int) triples (never the text), then a per-document map assembly bounded
by dim; empty/tokenless documents keep an all-zero vector via the left
join back to the id spine. ``portable=False`` swaps the md5-56 hash for
JVM xxhash64 — same fast/portable split as minhash/lm/dsir.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

from jsonschema_spark.operators.dedup import hash56, tokens


def _tok_hash(tok: Column, portable: bool) -> Column:
    if portable:
        return hash56(tok)
    return F.abs(F.xxhash64(tok))


def hashed_embedding_df(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = 64,
    portable: bool = True,
) -> DataFrame:
    """(id, emb:array<float>) — signed hashed bag-of-words embedding.

    bucket = h mod dim, sign = ±1 from the next hash bit; emb[b] is the
    signed token count of bucket b (exact int64 before the float cast,
    so |counts| < 2^24 keeps even the float32 representation exact).
    Plugs directly into ``similarity.topk_bruteforce / topk_ivf /
    semantic_dedup`` and ``dedup.embedding_near_dup_pairs``."""
    if dim < 2:
        raise ValueError("dim must be >= 2")
    t = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_tok")
    ).withColumn("_h", _tok_hash(F.col("_tok"), portable))
    g = (
        t.select(
            id_col,
            (F.col("_h") % F.lit(dim)).cast("int").alias("_b"),
            (F.lit(1) - 2 * (F.expr(f"_h div {dim}") % 2)).cast("long").alias("_s"),
        )
        .groupBy(id_col, "_b")
        .agg(F.sum("_s").alias("_v"))
    )
    maps = g.groupBy(id_col).agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("_b"), F.col("_v")))
        ).alias("_m")
    )
    vec = F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: F.coalesce(
            F.element_at(F.col("_m"), i.cast("int")), F.lit(0)
        ).cast("float"),
    )
    return (
        df.select(id_col)
        .join(maps, id_col, "left")
        .select(F.col(id_col), vec.alias("emb"))
    )


def embedding_stats_df(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dim: int = 64,
    portable: bool = True,
) -> DataFrame:
    """Per-document embedding attestation rows — (id, nnz, norm_sq,
    checksum) computed from the same (bucket, signed-count) pairs the
    vector is assembled from, all integer: nnz = non-zero buckets,
    norm_sq = Σv², checksum = Σv·(bucket+1) (position-sensitive, so any
    component error flips it). This is what the SQL oracle replays;
    ``hashed_embedding_df`` assembles the identical pairs into the
    array."""
    t = df.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("_tok")
    ).withColumn("_h", _tok_hash(F.col("_tok"), portable))
    g = (
        t.select(
            id_col,
            (F.col("_h") % F.lit(dim)).cast("int").alias("_b"),
            (F.lit(1) - 2 * (F.expr(f"_h div {dim}") % 2)).cast("long").alias("_s"),
        )
        .groupBy(id_col, "_b")
        .agg(F.sum("_s").alias("_v"))
    )
    agg = g.groupBy(id_col).agg(
        F.sum(F.when(F.col("_v") != 0, 1).otherwise(0)).cast("long").alias("nnz"),
        F.sum(F.col("_v") * F.col("_v")).cast("long").alias("norm_sq"),
        F.sum(F.col("_v") * (F.col("_b") + 1)).cast("long").alias("checksum"),
    )
    return (
        df.select(id_col)
        .join(agg, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("nnz", F.lit(0)).cast("long").alias("nnz"),
            F.coalesce("norm_sq", F.lit(0)).cast("long").alias("norm_sq"),
            F.coalesce("checksum", F.lit(0)).cast("long").alias("checksum"),
        )
    )


# --- random-sign projection (Johnson-Lindenstrauss dimension cut) --------

PROJ_SALT = "proj"


def projection_signs(dim_in: int, dim_out: int) -> list:
    """The deterministic ±1 projection matrix: s(i,j) = +1 iff the
    portable md5-56 hash of ``proj:i:j`` is even — the same hash family
    every portable operator uses, so the DuckDB oracle derives the
    IDENTICAL matrix from SQL md5()."""
    import hashlib

    out = []
    for i in range(dim_in):
        row = []
        for j in range(dim_out):
            h = int(hashlib.md5(
                f"{PROJ_SALT}:{i}:{j}".encode()).hexdigest()[:14], 16)
            row.append(1 if h % 2 == 0 else -1)
        out.append(row)
    return out


def embedding_project_df(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    dim_in: int,
    dim_out: int,
    *,
    scale: int = 100,
    arrow: bool = True,
) -> DataFrame:
    """Project ``array<float>`` embeddings to ``dim_out`` integer
    components with a deterministic ±1 sign matrix (Achlioptas 2003 —
    database-friendly random projections; the JL lemma gives distance
    preservation ~1/√dim_out). The ANN prefilter path: cut 768→64 before
    sign-LSH/IVF so the bucketing stage moves 12× fewer bytes.

    Vectors are quantized first (floor(x·scale), the repo-wide exact
    convention), so BOTH paths and the DuckDB oracle produce bit-identical
    integers: ``arrow=True`` is one numpy int matmul per Arrow batch
    (production); ``arrow=False`` is the pure-JVM explode → groupBy plan
    the oracle replays (posexplode over components × a dim_in·dim_out
    literal sign matrix — gate-sized inputs only).

    Output: (id_col, proj array<long>, dim_out elements). Rows with NULL
    embeddings are dropped (nothing to project — documented).
    """
    if dim_in < 1 or dim_out < 1 or dim_in * dim_out > 1_000_000:
        raise ValueError("embedding_project_df: bad dims")
    signs = projection_signs(dim_in, dim_out)
    base = df.select(F.col(id_col), F.col(vec_col)) \
        .where(F.col(vec_col).isNotNull())
    if arrow:
        import numpy as np

        S = np.array(signs, dtype=np.int64)
        id_type = [f for f in df.schema.fields
                   if f.name == id_col][0].dataType.simpleString()

        def fn(it):
            import numpy as np
            import pandas as pd

            for pdf in it:
                if not len(pdf):
                    continue
                V = np.array([np.asarray(v, dtype=np.float64)
                              for v in pdf[vec_col]])
                if V.shape[1] != dim_in:
                    raise ValueError(
                        f"embedding_project_df: expected dim {dim_in}, "
                        f"got {V.shape[1]}")
                P = np.floor(V * scale).astype(np.int64) @ S
                yield pd.DataFrame({id_col: pdf[id_col],
                                    "proj": [p.tolist() for p in P]})

        return base.mapInPandas(fn, f"{id_col} {id_type}, proj array<bigint>")
    from jsonschema_spark.operators.dedup import quantize_embedding

    q = quantize_embedding(F.col(vec_col), scale)
    sarr = F.array(*[F.array(*[F.lit(s) for s in row]) for row in signs])
    ex = base.select(F.col(id_col), F.posexplode(q).alias("_i", "_q"))
    exj = ex.select(
        id_col, "_q",
        F.posexplode(F.element_at(sarr, F.col("_i").cast("int") + 1))
        .alias("_j", "_s"))
    g = exj.groupBy(id_col, "_j").agg(
        F.sum(F.col("_q") * F.col("_s")).cast("long").alias("_v"))
    out = g.groupBy(id_col).agg(
        F.array_sort(F.collect_list(F.struct("_j", "_v"))).alias("_ps"))
    return out.select(
        id_col,
        F.transform("_ps", lambda s: s["_v"]).alias("proj"))
