"""Ranked retrieval over the corpus — the query side of a web-text engine.

``bm25_topk`` scores documents against a bag-of-terms query with the
Okapi BM25 shape (Robertson et al., TREC-3) and returns the global top-k.
Retrieval is what makes a curated corpus *inspectable* at scale: find the
documents a benchmark question leaks from, pull exemplars for a quality
label, audit what a filter kept — all without collecting the corpus.

Engine-portable arithmetic (the repo-wide oracle discipline):

- the tf saturation / length normalization factor is computed from integer
  inputs in ONE fixed-order expression —
  ``tfn_ppm = floor(tf·(k1+1000) · 1e15 / DEN)`` with
  ``DEN = tf·1e12 + k1·((1000−b)·1e6 + b·dlnorm_ppm)`` exact int64
  (k1, b are MILLI-valued ints; ``dlnorm_ppm = floor(1e6·dl/avgdl)``,
  ``avgdl = floor(Σdl/N)`` — one division then floor, the engine-exact
  mean: built-in avg() differs in the last ulp across engines) and the
  final ratio one int64→double multiply +
  divide + floor, bit-identical in Spark and DuckDB;
- idf uses the repo's ln-free integer surrogate ``idf_ppm =
  floor(1e6·N/df_t)`` (same family as textstats.tfidf_top_terms):
  strictly monotone in true idf per term, so single-term rankings agree
  with log-idf BM25 exactly; multi-term rankings weight rare terms more
  aggressively than the log damping would — a documented, deterministic
  variant (transcendental log differs in the last ulp across engines);
- per-term score = ``floor(tfn_ppm·idf_ppm / 1e6)`` via one double
  product (both factors exceed int32 so the int64 product could overflow
  ANSI arithmetic at crawl-scale N; the double product is order-free and
  identical both engines), summed per doc in exact int64 — the SUM is
  integer so partial-aggregation order cannot perturb it.

Scale shape:
- the corpus never shuffles: one projection computes (dl, token) pairs
  and the ``isin(query_terms)`` filter lands NEXT TO THE EXPLODE inside
  the same codegen stage, so only query-term hits leave the scan;
- per-(doc,term) tf is ONE groupBy with map-side partials; term document
  frequencies derive from that tiny table (≤ |q| rows after the second
  groupBy) and broadcast back;
- N/Σdl is one scalar aggregate broadcast as a literal row;
- top-k is an orderBy(score, id).limit(k) over the already-aggregated
  hit table (docs containing ≥1 query term) — AQE takes partial top-k
  map-side; only k rows reach the driver-side window that stamps rnk.

Reference framing: sourcemeta/jsonschema has no retrieval surface
(SURVEY.md §2.6 — no sorts/joins at all); this extends the table-scale
curation/analytics suite alongside textstats.tfidf_top_terms.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from jsonschema_spark.operators.dedup import tokens

PPM = 1_000_000


def term_stats(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Inverted-index term statistics: (term, df, cf) — document frequency
    and collection frequency per distinct token. One explode + one
    (doc,term) pre-aggregate + one term groupBy (the top_ngrams shape:
    the pre-aggregate keeps the distinct-doc count skew-safe because the
    term is in BOTH shuffle keys). Persist/bucket this by term to serve
    repeated queries without rescanning the corpus."""
    t = df.select(
        F.col(id_col).alias("_id"), F.explode(tokens(F.col(text_col))).alias("term")
    )
    per_doc = t.groupBy("_id", "term").agg(F.count(F.lit(1)).alias("_tf"))
    return per_doc.groupBy("term").agg(
        F.count(F.lit(1)).cast("long").alias("df"),
        F.sum("_tf").cast("long").alias("cf"),
    )


def bm25_topk(
    df: DataFrame,
    id_col: str,
    text_col: str,
    query_terms: list[str],
    k: int = 10,
    k1_milli: int = 1200,
    b_milli: int = 750,
) -> DataFrame:
    """Top-k documents for a bag-of-terms query under integer-exact BM25
    (k1 = k1_milli/1000, b = b_milli/1000; defaults are the classic
    1.2 / 0.75). Query terms are lowercased and deduplicated with the
    corpus tokenizer's normalization.

    Output: (id_col, n_hit_terms, n_hits, score_ppm, rnk) — distinct query
    terms present, total term occurrences, the summed per-term score, and
    the 1-based rank. Ties break on ascending id. Docs sharing no term
    with the query never leave the scan stage.
    """
    terms = sorted({t.strip().lower() for t in query_terms if t and t.strip()})
    if not terms:
        raise ValueError("bm25_topk: empty query")
    if k1_milli < 0 or not (0 <= b_milli <= 1000):
        raise ValueError("bm25_topk: k1_milli must be >= 0, b_milli in [0,1000]")

    toks = df.select(
        F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_toks")
    )
    # scalar corpus stats: N docs, Σdl -> avgdl = floor(Σdl/N) (one integer
    # division; engine avg() can differ in the last ulp)
    stats = toks.agg(
        F.count(F.lit(1)).alias("_n"), F.sum(F.size("_toks")).alias("_sumdl")
    )
    hits = (
        toks.select("_id", F.size("_toks").alias("_dl"), F.explode("_toks").alias("_t"))
        .where(F.col("_t").isin(terms))
    )
    # tf feeds BOTH the per-term df aggregate and the scoring join — without
    # the checkpoint the corpus scan+explode runs once per consumer
    tf = (
        hits.groupBy("_id", "_dl", "_t")
        .agg(F.count(F.lit(1)).alias("_tf"))
        .localCheckpoint(eager=False)
    )
    dft = tf.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    a = k1_milli + 1000
    scored = (
        tf.join(F.broadcast(dft), "_t")
        .crossJoin(F.broadcast(stats))
        .withColumn("_avgdl", F.floor(F.col("_sumdl") / F.col("_n")).cast("long"))
        .withColumn(
            "_dlnorm",
            F.floor(F.col("_dl") * F.lit(PPM) / F.greatest("_avgdl", F.lit(1))).cast("long"),
        )
        .withColumn(
            "_den",
            (
                F.col("_tf") * F.lit(1_000_000_000_000)
                + F.lit(k1_milli)
                * (F.lit((1000 - b_milli) * PPM) + F.lit(b_milli) * F.col("_dlnorm"))
            ).cast("long"),
        )
        # ONE int64->double multiply + divide + floor, identical op order in
        # the SQL oracle; _tf*a stays exact int64 first
        .withColumn(
            "_tfn",
            F.floor(F.col("_tf") * F.lit(a) * F.lit(1.0e15) / F.col("_den")).cast("long"),
        )
        .withColumn("_idf", F.floor(F.col("_n") * F.lit(PPM) / F.col("_df")).cast("long"))
        # double product: tfn_ppm*idf_ppm can exceed int64 at crawl-scale N
        # (ANSI would throw); one multiply + divide + floor is bit-stable
        .withColumn(
            "_s", F.floor(F.col("_tfn") * F.col("_idf").cast("double") / F.lit(PPM)).cast("long")
        )
    )
    per_doc = scored.groupBy("_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_hit_terms"),
        F.sum("_tf").cast("long").alias("n_hits"),
        F.sum("_s").cast("long").alias("score_ppm"),
    )
    top = per_doc.orderBy(F.col("score_ppm").desc(), F.col("_id").asc()).limit(k)
    w = Window.orderBy(F.col("score_ppm").desc(), F.col("_id").asc())
    return top.withColumn("rnk", F.row_number().over(w).cast("long")).select(
        F.col("_id").alias(id_col), "n_hit_terms", "n_hits", "score_ppm", "rnk"
    )


def rrf_fuse(
    rankings: "Sequence[DataFrame]",
    id_col: str,
    rank_col: str,
    k: int = 60,
    topk: int = 20,
) -> DataFrame:
    """Reciprocal-rank fusion (Cormack et al. 2009) of N ranked lists
    — the standard hybrid-retrieval merge (BM25 ⊕ dense ⊕ freshness)
    that needs no score calibration, only ranks. Per id:

    ``(id, n_lists, rrf_nano, rnk)``

    ``rrf_nano`` = Σ_lists floor(10⁹/(k + rank)) — the classic
    1/(k+r) sum as EXACT integers (a float sum is
    accumulation-order-dependent; the per-term floor at nano
    granularity keeps ~6 significant digits of the classic score and
    is order-free). Absent ids contribute nothing (standard RRF).
    Final ties break on id.

    Plan: union the tagged lists (ranked lists are top-k-bounded
    inputs by construction), ONE map-side-combinable groupBy(id),
    orderBy+limit top-k (TakeOrderedAndProject), rank window over the
    k survivors only.
    """
    from pyspark.sql.window import Window

    parts = []
    for d in rankings:
        parts.append(d.select(
            F.col(id_col).alias("_id"),
            F.floor(F.lit(1_000_000_000.0)
                    / (F.col(rank_col).cast("double") + F.lit(float(k))))
            .cast("long").alias("_s")))
    u = parts[0]
    for p in parts[1:]:
        u = u.unionByName(p)
    g = u.groupBy("_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_lists"),
        F.sum("_s").cast("long").alias("rrf_nano"))
    top = g.orderBy(F.col("rrf_nano").desc(), "_id").limit(topk)
    w = Window.orderBy(F.col("rrf_nano").desc(), "_id")
    return top.withColumn("rnk", F.row_number().over(w).cast("long")) \
        .withColumnRenamed("_id", id_col)
