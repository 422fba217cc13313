"""Deduplication operators for training-data pipelines.

Beyond the reference's per-row ``uniqueItems`` (SURVEY.md §2.6), these are
the table-scale dedup family a 100 TB corpus pipeline needs: exact
(hash-groupBy), MinHash + LSH banding, SimHash with hamming banding, word
n-gram Jaccard, and quantized-embedding cosine near-dup.

Engine-portability: every hash is the *portable 56-bit md5 prefix*
(``conv(substr(md5(s),1,14),16,10)``) so the DuckDB oracle computes the
exact same signatures; ratios are reported in integer parts-per-million to
keep value-hashes bit-stable across engines.

Scale notes (100 TB path):
- everything is expression-only (no Python): codegen end-to-end;
- LSH banding turns the O(n²) pair space into per-bucket joins; the band
  join keys are high-entropy hashes, so the shuffle is uniform unless the
  corpus has giant exact-dup clusters — for those, exact-dedup FIRST (cheap
  groupBy on full-text hash), then MinHash on the survivors;
- signatures are one `select` over the scan — no shuffle until the
  candidate join itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

TOKEN_RE = r"\s+"


def hash56(col: Column) -> Column:
    """Portable 56-bit hash: first 14 hex chars of md5, base-16 → long.
    Identical in Spark and DuckDB (and any engine with md5)."""
    return F.conv(F.substring(F.md5(col), 1, 14), 16, 10).cast("long")


def tokens(text: Column) -> Column:
    t = F.split(F.trim(F.lower(text)), TOKEN_RE)
    return F.when(F.length(F.trim(text)) == 0, F.array().cast("array<string>")).otherwise(t)


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct word n-grams (space-joined).

    Built from n whole-array slices zipped elementwise — O(tokens) work
    per row. (The naive per-position ``slice`` inside ``transform`` is an
    interpreted O(tokens²) per row: higher-order lambdas are not
    codegen'd.)"""
    toks = tokens(text)
    if n == 1:
        return F.array_distinct(toks)
    sz = F.size(toks)
    cols = [F.slice(toks, i + 1, sz - (n - 1)).alias(f"g{i}") for i in range(n)]
    zipped = F.arrays_zip(*cols)
    grams = F.transform(zipped, lambda s: F.concat_ws(" ", *[s[f"g{i}"] for i in range(n)]))
    return F.when(sz >= n, F.array_distinct(grams)).otherwise(F.array().cast("array<string>"))


def word_shingle_hashes(text: Column, n: int = 3) -> Column:
    """Distinct word-n-gram hashes WITHOUT materializing shingle strings:
    hash each token once, then combine n consecutive token hashes with a
    fixed-width ``xxhash64(long, ..., long)`` — no per-shingle string
    allocation, and the downstream explode/shuffle rows are 8-byte longs
    instead of ~25-byte strings. Same Jaccard semantics as
    ``word_shingles`` modulo 64-bit hash collisions (negligible); used by
    the non-portable (scale) minhash path."""
    toks = tokens(text)
    th = F.transform(toks, lambda t: F.xxhash64(t))
    if n == 1:
        return F.array_distinct(th)
    sz = F.size(th)
    cols = [F.slice(th, i + 1, sz - (n - 1)).alias(f"g{i}") for i in range(n)]
    zipped = F.arrays_zip(*cols)
    grams = F.transform(zipped, lambda s: F.xxhash64(*[s[f"g{i}"] for i in range(n)]))
    return F.when(sz >= n, F.array_distinct(grams)).otherwise(F.array().cast("array<long>"))


# --- exact ------------------------------------------------------------------


def dedup_exact(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """Exact dedup: keep the min-id row per distinct text (hash-groupBy —
    one shuffle on a uniform 128-bit key; no skew by construction)."""
    return df.groupBy(F.md5(F.col(text_col)).alias("text_key")).agg(
        F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies")
    )


# --- MinHash + LSH ----------------------------------------------------------


def _minhash_one(sh: Column, j: int) -> Column:
    prefix = f"{j}:"
    return F.array_min(F.transform(sh, lambda s: hash56(F.concat(F.lit(prefix), s))))


def minhash_signature(text: Column, k: int = 12, shingle_n: int = 3) -> Column:
    """Array of k MinHash values: min over shingles of hash56(seed:shingle).

    Expression form — fine for small k×shingle counts; the table-scale
    path is ``minhash_signatures_df`` (explode → map-side partial min agg),
    which evaluates each shingle hash exactly once."""
    sh = word_shingles(text, shingle_n)
    return F.array(*[_minhash_one(sh, j) for j in range(k)])


def minhash_signatures_df(
    df: DataFrame, id_col: str, text_col: str, k: int = 12, shingle_n: int = 3,
    portable: bool = True
) -> DataFrame:
    """Per-doc MinHash signatures as columns mh0..mh{k-1} — the scale
    shape: explode distinct shingles once, hash k ways per shingle row,
    then ONE aggregation (map-side partial mins compress each partition
    to one row per doc before the shuffle). Docs with no shingles drop
    out (they cannot participate in similarity).

    ``portable=True`` (default) hashes with hash56 (md5-derived) so DuckDB
    can replay the exact signatures — the oracle-mirrored form. The k md5
    rounds per shingle dominate pipeline cost at scale, so
    ``portable=False`` switches to the textbook linear-permutation
    family: ONE ``xxhash64`` per shingle (string hashing is the expensive
    part, proportional to length — Catalyst's subexpression elimination
    evaluates it once), then k affine maps h_j = (a_j·h + b_j) mod p over
    a 31-bit base hash (p = 2^31-1; 31-bit operands keep every product
    inside int64 — Spark 4 ANSI mode THROWS on long overflow). The
    signatures differ numerically but are an equally valid MinHash
    sample — pair RECALL semantics are unchanged, only which hash family
    draws the permutations."""
    if portable:
        sh = df.select(
            F.col(id_col).alias("_id"),
            F.explode(word_shingles(F.col(text_col), shingle_n)).alias("_s"),
        )
        hashes = [
            hash56(F.concat(F.lit(f"{j}:"), F.col("_s"))).alias(f"mh{j}")
            for j in range(k)
        ]
    else:
        import random

        p31 = (1 << 31) - 1
        rng = random.Random(0x5EED)
        coef = [(rng.randrange(1, p31), rng.randrange(0, p31)) for _ in range(k)]
        # shingle-hash explode: 8-byte long rows, no shingle strings built
        sh = df.select(
            F.col(id_col).alias("_id"),
            F.explode(word_shingle_hashes(F.col(text_col), shingle_n)).alias("_s"),
        )
        h = F.col("_s").bitwiseAND(F.lit(p31))
        hashes = [
            ((F.lit(a) * h + F.lit(b)) % F.lit(p31)).alias(f"mh{j}")
            for j, (a, b) in enumerate(coef)
        ]
    hashed = sh.select("_id", *hashes)
    return hashed.groupBy("_id").agg(*[F.min(f"mh{j}").alias(f"mh{j}") for j in range(k)])


def auto_rows_per_band(n_docs: int) -> int:
    """Percolation-law default for LSH band width (rows per band).

    A band key is a conjunction of ``rows_per_band`` MinHash values, so a
    background (non-duplicate) pair collides in one band with probability
    ≈ J_bg^rows_per_band, and the EXPECTED candidate count carries an
    intrinsic n²·bands·J_bg^rows_per_band term. Measured on this engine's
    sf1 pipeline (BENCH_sf1.json round 3): rows_per_band=2 percolates —
    candidate count goes super-linear — near 10^6 docs at modest
    background Jaccard; 3 holds to ~10^7; 4 to ~10^9; crawl scale needs
    5. Wider bands trade recall (per-band match probability J^rows) for
    that quadratic suppression — callers pinning recall must pass
    ``bands`` explicitly."""
    if n_docs < 10**6:
        return 2
    if n_docs < 10**7:
        return 3
    if n_docs < 10**9:
        return 4
    return 5


def minhash_bands(sig: Column, bands: int, rows_per_band: int) -> Column:
    """Array of (band_idx, band_key) structs; band_key = joined slice."""
    entries = []
    for b in range(bands):
        sl = F.slice(sig, b * rows_per_band + 1, rows_per_band)
        key = F.array_join(F.transform(sl, lambda x: x.cast("string")), "_")
        entries.append(F.struct(F.lit(b).alias("band"), key.alias("band_key")))
    return F.array(*entries)


def _banded_table(
    df: DataFrame, id_col: str, text_col: str, k: int, bands: int,
    shingle_n: int, portable: bool, max_band_df: int | None,
) -> DataFrame:
    """(_id, band, band_key) rows for LSH joins — signature agg, band
    explode, ONE eager localCheckpoint (every join side reads the
    checkpoint instead of recomputing the aggregation; tiny: k longs per
    doc), optional hot-band cutoff (see minhash_lsh_pairs)."""
    rows_per_band = k // bands
    sig = minhash_signatures_df(df, id_col, text_col, k, shingle_n,
                                portable=portable)
    band_entries = [
        F.struct(
            F.lit(b).alias("band"),
            F.concat_ws(
                "_", *[F.col(f"mh{b * rows_per_band + r}").cast("string") for r in range(rows_per_band)]
            ).alias("band_key"),
        )
        for b in range(bands)
    ]
    bandsdf = sig.select(
        "_id", F.explode(F.array(*band_entries)).alias("b")
    ).select("_id", F.col("b.band").alias("band"), F.col("b.band_key").alias("band_key"))
    bandsdf = bandsdf.localCheckpoint(eager=True)
    if max_band_df is not None:
        cold_keys = (
            bandsdf.groupBy("band", "band_key")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_band_df)
            .drop("_df")
        )
        bandsdf = bandsdf.join(cold_keys, ["band", "band_key"], "left_semi")
    return bandsdf


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 12,
    bands: int | None = None,
    shingle_n: int = 3,
    max_band_df: int | None = None,
    portable: bool = True,
) -> DataFrame:
    """LSH candidate pairs: docs sharing ≥1 band → (id_a, id_b,
    n_shared_bands). Null/shingle-less docs never produce candidates.

    ``bands=None`` (default) derives the band count from the corpus size
    via the percolation law (``auto_rows_per_band``): one ``count()``
    action (metadata-only on parquet scans), then
    ``bands = k // auto_rows_per_band(n)``. At n < 10^6 this is the
    historical k=12/bands=6 configuration exactly; explicit ``bands``
    stays byte-stable regardless of corpus size (the oracle queries pin
    it).

    Plan: one scan → signature select → explode bands (k/bands values per
    band) → self-equi-join on (band, band_key) — a hash join on uniform
    keys; AQE handles residual bucket skew.

    ``max_band_df`` is the corpus-scale skew guard (the banding analogue
    of ``jaccard_pairs``'s ``max_df``): a band key shared by c documents
    emits c·(c-1)/2 candidate pairs, so one degenerate bucket — empty
    pages, boilerplate templates — shared by 0.1% of a 10^12-doc crawl
    would emit ~5·10^17 pairs. AQE's skew-join split rebalances the join
    TASKS but cannot shrink that output. With ``max_band_df`` set, band
    keys whose document frequency exceeds it are dropped from the index
    before the join (one extra count-aggregate + semi-join, shuffling on
    the same (band, band_key) the join itself uses). Members of an
    over-cap bucket are near-identical boilerplate; exact dedup or a
    per-bucket canonical pick handles them separately. Default None keeps
    the exact LSH semantics (the oracle mirror)."""
    if bands is None:
        bands = max(1, k // auto_rows_per_band(df.count()))
    bandsdf = _banded_table(df, id_col, text_col, k, bands, shingle_n,
                            portable, max_band_df)
    a, b = bandsdf.alias("a"), bandsdf.alias("b")
    return (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.band_key") == F.col("b.band_key")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


# --- n-gram Jaccard ---------------------------------------------------------


def _shingle_sets(df: DataFrame, id_col: str, text_col: str, shingle_n: int) -> DataFrame:
    """(_id, _sh) distinct-shingle arrays, checkpointed once (both sides of
    any self-join read the checkpoint instead of recomputing)."""
    sh = df.select(
        F.col(id_col).alias("_id"), word_shingles(F.col(text_col), shingle_n).alias("_sh")
    )
    return sh.localCheckpoint(eager=True)


def _score_candidate_pairs(sh: DataFrame, pairs: DataFrame, min_ppm: int) -> DataFrame:
    """Exact Jaccard for the given (id_a, id_b) candidate pairs, from the
    full shingle sets (array_intersect — candidate count × set size work,
    not inverted-index quadratic)."""
    a = sh.select(F.col("_id").alias("id_a"), F.col("_sh").alias("_sha"))
    b = sh.select(F.col("_id").alias("id_b"), F.col("_sh").alias("_shb"))
    j = (
        pairs.select("id_a", "id_b")
        .join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect(F.col("_sha"), F.col("_shb"))).alias("n_common"),
            F.size("_sha").alias("_na"),
            F.size("_shb").alias("_nb"),
        )
        .filter(F.col("n_common") > 0)
    )
    out = j.select(
        "id_a",
        "id_b",
        "n_common",
        F.floor(
            F.col("n_common") * 1000000 / (F.col("_na") + F.col("_nb") - F.col("n_common"))
        )
        .cast("long")
        .alias("jaccard_ppm"),
    )
    return out.filter(F.col("jaccard_ppm") >= min_ppm) if min_ppm else out


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    min_ppm: int = 0,
    max_df: int | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard for all pairs sharing ≥1 shingle:
    (id_a, id_b, n_common, jaccard_ppm). jaccard_ppm =
    floor(1e6 * |A∩B| / (|A|+|B|-|A∩B|)) — integer-exact.

    Plan: explode distinct shingles → self-join on shingle (the inverted-
    index join) → pair-count agg → join back per-doc set sizes.

    ``max_df`` is the corpus-scale guard: shingles appearing in more than
    ``max_df`` documents are dropped from the inverted index BEFORE the
    self-join (one hot shingle otherwise produces a quadratic bucket), and
    the surviving candidate pairs are rescored EXACTLY from the full
    shingle sets. Scores are exact; the only recall loss is pairs whose
    every shared shingle is hot — which at a sane threshold are stop-phrase
    collisions, not near-duplicates. At corpus scale, compose with LSH
    instead: ``jaccard_on_candidates(df, minhash_lsh_pairs(...))``."""
    sh = _shingle_sets(df, id_col, text_col, shingle_n)
    inv = sh.select("_id", F.explode("_sh").alias("g"))
    if max_df is not None:
        rare = (
            inv.groupBy("g")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("g")
        )
        inv = inv.join(rare, "g", "left_semi")
        a, b = inv.alias("a"), inv.alias("b")
        cand = (
            a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a._id") < F.col("b._id")))
            .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
            .distinct()
        )
        return _score_candidate_pairs(sh, cand, min_ppm)
    sizes = sh.select("_id", F.size("_sh").alias("_n")).filter(F.col("_n") > 0)
    a, b = inv.alias("a"), inv.alias("b")
    common = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("n_a"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("n_b"))
    out = (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_common",
            F.floor(
                F.col("n_common") * 1000000 / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            )
            .cast("long")
            .alias("jaccard_ppm"),
        )
    )
    return out.filter(F.col("jaccard_ppm") >= min_ppm) if min_ppm else out


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    min_ppm: int = 500000,
    max_df: int | None = None,
) -> DataFrame:
    """ASYMMETRIC near-dup detection — shingle containment
    floor(1e6·|A∩B| / min(|A|,|B|)) — catching what Jaccard structurally
    cannot: a short document quoted or embedded inside a much longer one
    scores containment ≈ 1e6 while its Jaccard ≈ |small|/|big| stays
    under any sane threshold (aggregator sites, quote farms, page-plus-
    boilerplate wrappers). Same inverted-index join + exact rescoring
    plan as ``jaccard_pairs`` (one extra column in the final projection),
    same ``max_df`` hot-shingle guard; emits both scores so one pass
    serves both policies.

    Output: (id_a, id_b, n_common, jaccard_ppm, containment_ppm),
    filtered on containment_ppm ≥ min_ppm."""
    sh = _shingle_sets(df, id_col, text_col, shingle_n)
    inv = sh.select("_id", F.explode("_sh").alias("g"))
    if max_df is not None:
        rare = (
            inv.groupBy("g")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") <= max_df)
            .select("g")
        )
        inv = inv.join(rare, "g", "left_semi")
    sizes = sh.select("_id", F.size("_sh").alias("_n")).filter(F.col("_n") > 0)
    a, b = inv.alias("a"), inv.alias("b")
    common = (
        a.join(b, (F.col("a.g") == F.col("b.g")) & (F.col("a._id") < F.col("b._id")))
        .groupBy(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("_id").alias("id_a"), F.col("_n").alias("n_a"))
    sb = sizes.select(F.col("_id").alias("id_b"), F.col("_n").alias("n_b"))
    out = (
        common.join(sa, "id_a")
        .join(sb, "id_b")
        .select(
            "id_a",
            "id_b",
            "n_common",
            F.floor(
                F.col("n_common") * 1000000
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).cast("long").alias("jaccard_ppm"),
            F.floor(
                F.col("n_common") * 1000000 / F.least(F.col("n_a"), F.col("n_b"))
            ).cast("long").alias("containment_ppm"),
        )
    )
    return out.filter(F.col("containment_ppm") >= min_ppm) if min_ppm else out


def jaccard_on_candidates(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str,
    text_col: str,
    shingle_n: int = 3,
    min_ppm: int = 0,
) -> DataFrame:
    """Exact Jaccard rescoring of externally-generated candidate pairs
    (id_a, id_b) — the LSH-compose path: ``minhash_lsh_pairs`` proposes,
    this verifies. Work is O(candidates · set size); no inverted-index
    self-join at all."""
    sh = _shingle_sets(df, id_col, text_col, shingle_n)
    return _score_candidate_pairs(sh, pairs, min_ppm)


# --- SimHash ------------------------------------------------------------------


def simhash(text: Column, bits: int = 32) -> Column:
    """SimHash over the token multiset: bit b set iff strictly more token
    hashes have bit b set than clear."""
    hs = F.transform(tokens(text), lambda t: hash56(t))
    n = F.size(hs)
    total = F.lit(0).cast("long")
    for b in range(bits):
        ones = F.size(F.filter(hs, _bit_set(b)))
        total = total + F.when(ones * 2 > n, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
    return total


def _bit_set(b: int):
    return lambda h: F.shiftrightunsigned(h, b).bitwiseAND(1) == 1


def simhash_df(df: DataFrame, id_col: str, text_col: str, bits: int = 32) -> DataFrame:
    """Per-doc SimHash as a DataFrame (_id, _sim) — the scale shape:
    explode tokens, hash each ONCE, then ``bits`` conditional ±1 sums in a
    single codegen aggregation (bit b set ⟺ more ones than zeros ⟺
    Σ±1 > 0). ~10× faster than the expression form, which runs ``bits``
    interpreted higher-order passes per row. Docs with no tokens drop out
    (they cannot be near-duplicates of anything)."""
    h = df.select(
        F.col(id_col).alias("_id"), F.explode(tokens(F.col(text_col))).alias("_t")
    ).select("_id", hash56(F.col("_t")).alias("_h"))
    aggs = [
        F.sum(
            F.when(F.shiftrightunsigned(F.col("_h"), b).bitwiseAND(1) == 1, 1).otherwise(-1)
        ).alias(f"_b{b}")
        for b in range(bits)
    ]
    g = h.groupBy("_id").agg(*aggs)
    sim = None
    for b in range(bits):
        term = F.when(F.col(f"_b{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        sim = term if sim is None else sim + term
    return g.select("_id", sim.alias("_sim"))


def simhash_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    bits: int = 32,
    n_bands: int = 4,
    max_hamming: int = 6,
) -> DataFrame:
    """Near-dup candidates by SimHash banding: docs sharing ≥1 of n_bands
    byte-chunks, with hamming(sim_a, sim_b) ≤ max_hamming →
    (id_a, id_b, hamming). Banding guarantees recall for
    hamming < n_bands (pigeonhole)."""
    chunk = bits // n_bands
    mask = (1 << chunk) - 1
    sim = simhash_df(df, id_col, text_col, bits).localCheckpoint(eager=True)
    bandsdf = sim.select(
        "_id",
        "_sim",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("band"),
                        F.shiftrightunsigned(F.col("_sim"), i * chunk).bitwiseAND(mask).alias("key"),
                    )
                    for i in range(n_bands)
                ]
            )
        ).alias("b"),
    ).select("_id", "_sim", F.col("b.band").alias("band"), F.col("b.key").alias("key"))
    a, b = bandsdf.alias("a"), bandsdf.alias("b")
    pairs = (
        a.join(b, (F.col("a.band") == F.col("b.band")) & (F.col("a.key") == F.col("b.key")) & (F.col("a._id") < F.col("b._id")))
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(F.col("a._sim").bitwiseXOR(F.col("b._sim"))).alias("hamming"),
        )
    )
    # filter before distinct: dedup shuffles only surviving pairs
    return pairs.filter(F.col("hamming") <= max_hamming).distinct()


# --- embedding cosine near-dup ------------------------------------------------


def quantize_embedding(vec: Column, scale: int = 100) -> Column:
    """float array → integer array (floor(x*scale)) for exact cross-engine
    arithmetic."""
    return F.transform(vec, lambda x: F.floor(x.cast("double") * scale).cast("long"))


def dot_q(a: Column, b: Column) -> Column:
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0).cast("long"), lambda acc, x: acc + x)


def cosine_micro(a: Column, b: Column) -> Column:
    """floor(1e6 * cos(a,b)) on quantized vectors — deterministic IEEE
    double ops on exact integer inputs, identical across engines."""
    d = dot_q(a, b).cast("double")
    na, nb = dot_q(a, a), dot_q(b, b)
    return F.floor(F.lit(1000000.0) * d / F.sqrt((na * nb).cast("double"))).cast("long")


def embedding_near_dup_pairs(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    min_cos_micro: int = 450000,
    scale: int = 100,
    n_blocks: int = 8,
) -> DataFrame:
    """All pairs with quantized cosine ≥ threshold → (id_a, id_b,
    cos_micro). Exact (no candidate pruning) — the LSH-pruned scale path
    is ``similarity.topk_signlsh``; the cluster-pruned one is
    ``similarity.semantic_dedup_pairs``.

    Distributed block-pair matmul: rows are hashed into ``n_blocks``
    blocks; each row is replicated to the n_blocks block-PAIRS it belongs
    to (an explode — no driver materialization, no broadcast of the
    corpus), and each of the n_blocks·(n_blocks+1)/2 pair-groups scores
    its two blocks against each other with one exact int64 numpy matmul
    inside a cogrouped ``applyInPandas``. Total work stays O(n²·d) —
    inherent for exact all-pairs — but memory per task is bounded by
    (n/n_blocks)·d·8 bytes: size ``n_blocks`` so one block fits an
    executor. Shuffle volume is n_blocks× the quantized input (int64
    vectors), uniform by construction (md5-quality block hash).
    """
    q = df.select(
        F.col(id_col).alias("_id"), quantize_embedding(F.col(vec_col), scale).alias("_q")
    )
    return blocked_cosine_pairs(q, min_cos_micro, n_blocks)


def blocked_cosine_pairs(
    q: DataFrame,
    min_cos_micro: int,
    n_blocks: int,
    cell_col: str | None = None,
) -> DataFrame:
    """Block-pair cogrouped-matmul scorer over ``(_id long, _q
    array<long>)`` rows (see embedding_near_dup_pairs for the shape
    argument). When ``cell_col`` is given the shuffle key becomes
    (cell, pa, pb): only rows of the SAME cell are ever scored against
    each other — the semantic-dedup pruning — while per-task memory stays
    bounded by the block size even for a giant cell."""
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    q = q.withColumn(
        "_blk", F.pmod(F.xxhash64(F.col("_id").cast("string")), F.lit(n_blocks)).cast("int")
    )
    pair_entries = F.array(
        *[
            F.struct(
                F.least(F.col("_blk"), F.lit(j)).alias("pa"),
                F.greatest(F.col("_blk"), F.lit(j)).alias("pb"),
            )
            for j in range(n_blocks)
        ]
    )
    keys = ([cell_col] if cell_col else []) + ["pa", "pb"]
    rep = q.select("*", F.explode(pair_entries).alias("_p")).select(
        *([c for c in q.columns] + [F.col("_p.pa").alias("pa"), F.col("_p.pb").alias("pb")])
    )

    out_schema = T.StructType(
        [
            T.StructField("id_a", T.LongType()),
            T.StructField("id_b", T.LongType()),
            T.StructField("cos_micro", T.LongType()),
        ]
    )
    empty = pd.DataFrame({"id_a": [], "id_b": [], "cos_micro": []})

    def _cos(dots, na, nb):
        # float op order matches the Column/SQL formula exactly:
        # floor(1e6 * dot / sqrt(na*nb)) — integer inputs, one fp divide
        return np.floor(
            (1000000.0 * dots) / np.sqrt((na[:, None] * nb[None, :]).astype(np.float64))
        ).astype(np.int64)

    def score(key, pdf):
        pa, pb = key[-2], key[-1]
        if pa == pb:
            ids = pdf["_id"].to_numpy(dtype=np.int64)
            mat = np.stack(pdf["_q"].to_numpy()).astype(np.int64)
            norms = (mat * mat).sum(axis=1)
            cos = _cos(mat @ mat.T, norms, norms)
            mask = (ids[:, None] < ids[None, :]) & (cos >= min_cos_micro)
            ai, bj = np.nonzero(mask)
            return pd.DataFrame({"id_a": ids[ai], "id_b": ids[bj], "cos_micro": cos[ai, bj]})
        a, b = pdf[pdf["_blk"] == pa], pdf[pdf["_blk"] == pb]
        if len(a) == 0 or len(b) == 0:
            return empty
        a_ids = a["_id"].to_numpy(dtype=np.int64)
        b_ids = b["_id"].to_numpy(dtype=np.int64)
        a_mat = np.stack(a["_q"].to_numpy()).astype(np.int64)
        b_mat = np.stack(b["_q"].to_numpy()).astype(np.int64)
        cos = _cos(a_mat @ b_mat.T, (a_mat * a_mat).sum(axis=1), (b_mat * b_mat).sum(axis=1))
        ai, bj = np.nonzero(cos >= min_cos_micro)
        ida, idb = a_ids[ai], b_ids[bj]
        # each unordered cross-block pair appears exactly once; normalize order
        return pd.DataFrame(
            {
                "id_a": np.minimum(ida, idb),
                "id_b": np.maximum(ida, idb),
                "cos_micro": cos[ai, bj],
            }
        )

    return rep.groupBy(*keys).applyInPandas(score, out_schema)


def dedup_clusters(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iters: int = 20,
    driver_max_edges: int = 5_000_000,
) -> DataFrame:
    """Connected components over candidate pairs → (doc_id, cluster_id).

    The step after pair generation in a real dedup pipeline: pairs from
    minhash_lsh_pairs / simhash_pairs / embedding_near_dup_pairs form an
    undirected graph; each component keeps ONE canonical document
    (cluster_id = the component's minimum id, the keep-min-id convention
    of dedup_exact).

    Two tiers — the pair graph is orders of magnitude smaller than the
    corpus, so tier choice keys on EDGE count, not input size:
    - ≤ ``driver_max_edges``: union-find on the driver (one collect of the
      edge list, milliseconds of CPU) — even a 100 TB corpus commonly
      produces a pair graph this small after LSH banding;
    - larger: distributed min-label propagation WITH pointer jumping —
      each round every node takes min(own, neighbors', and its label's
      label). The label graph is a forest pointing at smaller ids, so the
      label-of-label join halves every pointer chain per round: O(log
      diameter) rounds total, vs O(diameter) for plain propagation.
      Duplicate-of-duplicate chains (mirror-of-mirror pages) routinely
      give components of diameter in the thousands — plain propagation
      provably stalls there (surfaced by the sf1 pipeline bench at 2M
      docs). Two shuffles per round; localCheckpoint truncates the
      growing lineage; convergence check exits early.
    """
    edges = pairs.select(F.col(id_a).alias("x"), F.col(id_b).alias("y"))
    edges = edges.union(edges.select(F.col("y").alias("x"), F.col("x").alias("y")))
    edges = edges.distinct().localCheckpoint(eager=True)
    n_edges = edges.count()
    if n_edges == 0:
        return edges.select(F.col("x").alias("doc_id"), F.col("y").alias("cluster_id"))
    if n_edges <= driver_max_edges:
        parent: dict = {}

        def find(a):
            while parent[a] != a:
                parent[a] = parent[parent[a]]
                a = parent[a]
            return a

        for r in edges.collect():
            x, y = r["x"], r["y"]
            parent.setdefault(x, x)
            parent.setdefault(y, y)
            rx, ry = find(x), find(y)
            if rx != ry:
                parent[ry] = rx
        root_min: dict = {}
        for node in parent:
            root = find(node)
            m = root_min.get(root)
            if m is None or node < m:
                root_min[root] = node
        rows = [(node, root_min[find(node)]) for node in parent]
        from pyspark.sql.types import StructField, StructType

        id_type = pairs.schema[id_a].dataType  # preserve string/uuid/long ids
        return pairs.sparkSession.createDataFrame(
            rows,
            StructType([StructField("doc_id", id_type),
                        StructField("cluster_id", id_type)]),
        )
    labels = (
        edges.select(F.col("x").alias("id"))
        .distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iters):
        neighbor_min = (
            edges.join(labels, edges.y == labels.id)
            .groupBy("x")
            .agg(F.min("label").alias("nmin"))
        )
        stepped = labels.join(neighbor_min, labels.id == neighbor_min.x, "left").select(
            "id",
            F.col("label").alias("_old"),
            F.least(F.col("label"), F.coalesce("nmin", "label")).alias("label"),
        ).localCheckpoint(eager=True)
        # ^ stepped feeds BOTH sides of the pointer-jump self-join below;
        # without the checkpoint the neighbor-min join+agg is planned (and
        # executed) twice per round (CLAUDE.md self-join rule)
        # pointer jump (path halving): label ← label(label). Every label IS
        # some node's id, so the self-join is total; parents only shrink.
        parents = stepped.select(
            F.col("id").alias("pid"), F.col("label").alias("plabel")
        )
        new_labels = (
            stepped.join(parents, stepped.label == parents.pid)
            .select(
                "id",
                F.least("label", "plabel").alias("label"),
                (F.least("label", "plabel") < F.col("_old")).alias("_chg"),
            )
            .localCheckpoint(eager=True)
        )
        changed = new_labels.filter(F.col("_chg")).limit(1).count()
        labels = new_labels.drop("_chg")
        if changed == 0:
            break
    else:
        # silent non-convergence would hand keep_canonical a component with
        # multiple "canonical" labels — fail loudly instead
        raise RuntimeError(
            f"dedup_clusters did not converge in {max_iters} rounds "
            "(component diameter exceeds max_iters); raise max_iters"
        )
    return labels.select(F.col("id").alias("doc_id"), F.col("label").alias("cluster_id"))


def keep_canonical(
    df: DataFrame,
    clusters: DataFrame,
    id_col: str,
) -> DataFrame:
    """Drop every non-canonical near-duplicate: keep rows whose id is its
    cluster's label (singletons — ids absent from `clusters` — survive).
    Plain anti-join: AQE broadcasts the loser set when it is small; at
    100 TB the loser side can be most of the corpus, so no forced
    broadcast here."""
    losers = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select("doc_id")
    return df.join(losers, df[id_col] == losers.doc_id, "left_anti")


def cross_corpus_lsh_pairs(
    new_df: DataFrame,
    ref_df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 12,
    bands: int | None = None,
    shingle_n: int = 3,
    max_band_df: int | None = None,
    portable: bool = True,
) -> DataFrame:
    """Asymmetric LSH: (new_id, ref_id, n_shared_bands) for every NEW
    document sharing ≥1 MinHash band with an EXISTING-corpus document —
    the incremental-crawl analogue of ``minhash_lsh_pairs``. Both sides
    are banded independently (each gets its own signature aggregation and
    hot-band cutoff) and meet in ONE equi-join on (band, band_key); no
    ``a < b`` triangle condition — the sides are disjoint corpora.

    Scale note: the REF side of a crawl refresh is the big one (the
    accumulated corpus). Its banded table is a pure function of the
    corpus — at 100 TB persist it once (bucketed by (band, band_key)) and
    reuse it across refreshes instead of recomputing signatures per run;
    this function recomputes both sides for self-contained semantics.

    ``bands=None`` sizes the band width by the percolation law against
    the REF corpus count (the side whose scale drives candidate
    percolation); both sides must band identically for keys to meet."""
    if bands is None:
        bands = max(1, k // auto_rows_per_band(ref_df.count()))
    nb = _banded_table(new_df, id_col, text_col, k, bands, shingle_n,
                       portable, max_band_df)
    rb = _banded_table(ref_df, id_col, text_col, k, bands, shingle_n,
                       portable, max_band_df)
    return (
        nb.alias("n")
        .join(rb.alias("r"),
              (F.col("n.band") == F.col("r.band"))
              & (F.col("n.band_key") == F.col("r.band_key")))
        .groupBy(F.col("n._id").alias("new_id"), F.col("r._id").alias("ref_id"))
        .agg(F.count(F.lit(1)).alias("n_shared_bands"))
    )


def dedup_against_corpus(
    new_df: DataFrame,
    ref_df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 12,
    bands: int | None = None,
    shingle_n: int = 3,
    max_band_df: int | None = None,
    portable: bool = True,
    near: bool = True,
) -> DataFrame:
    """Incremental-crawl dedup discipline: return the NEW rows that are
    neither exact nor (``near=True``) near duplicates of the existing
    corpus. Two-stage, cheap-first:

    1. EXACT: anti-join on the text hash (md5 portable / xxhash64 fast) —
       one co-partitioned shuffle on a uniform key, no skew. This alone
       removes the recrawl bulk (unchanged pages) before any shingling.
    2. NEAR: LSH candidates of the survivors vs the corpus
       (``cross_corpus_lsh_pairs``); any candidate kills the new doc.
       LSH candidacy is the standard refresh policy (MinHash banding
       errs toward dropping boilerplate look-alikes); thread the pairs
       through ``jaccard_on_candidates`` first if a verified-Jaccard
       threshold is required.

    Output: all new_df columns, only surviving rows."""
    h = (F.md5(F.col(text_col)) if portable
         else F.xxhash64(F.col(text_col)).cast("string"))
    ref_keys = ref_df.select(h.alias("_tk")).distinct()
    survivors = (
        new_df.withColumn("_tk", h)
        .join(ref_keys, ["_tk"], "left_anti")
        .drop("_tk")
    )
    if not near:
        return survivors
    # near pass only sees exact-survivors: the candidate join shrinks with
    # the recrawl overlap instead of paying full corpus x corpus banding
    survivors = survivors.localCheckpoint(eager=False)
    hits = cross_corpus_lsh_pairs(
        survivors, ref_df, id_col, text_col, k, bands, shingle_n,
        max_band_df, portable,
    ).select(F.col("new_id").alias("_hit")).distinct()
    return survivors.join(
        hits, survivors[id_col] == F.col("_hit"), "left_anti")


def contamination_pairs(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    bench_id_col: str,
    bench_text_col: str,
    shingle_n: int = 8,
) -> DataFrame:
    """Benchmark decontamination: (corpus_id, bench_id, n_shared_ngrams)
    for every corpus document sharing at least one word n-gram with an
    evaluation document (the standard 8-gram-overlap test-set leak check;
    train docs flagged here get dropped before training).

    Scale shape: the corpus side streams (explode → hashed n-grams, no
    corpus-side shuffle before the join); the benchmark side is tiny by
    definition and is broadcast, so the whole check is one map-side join +
    one aggregation on the (rare) matching pairs.
    """
    c = corpus.select(
        F.col(id_col).alias("corpus_id"),
        F.explode(word_shingles(F.col(text_col), shingle_n)).alias("_g"),
    ).select("corpus_id", hash56(F.col("_g")).alias("_h"))
    b = bench.select(
        F.col(bench_id_col).alias("bench_id"),
        F.explode(word_shingles(F.col(bench_text_col), shingle_n)).alias("_g"),
    ).select("bench_id", hash56(F.col("_g")).alias("_h"))
    return (
        c.join(F.broadcast(b), "_h")
        .groupBy("corpus_id", "bench_id")
        .agg(F.count(F.lit(1)).alias("n_shared_ngrams"))
    )


def decontaminate(
    corpus: DataFrame,
    bench: DataFrame,
    id_col: str,
    text_col: str,
    bench_id_col: str,
    bench_text_col: str,
    shingle_n: int = 8,
    min_shared_ngrams: int = 1,
) -> DataFrame:
    """GPT-3/PaLM-style test-set decontamination, the DROP step on top of
    ``contamination_pairs``: remove every corpus document sharing ≥
    ``min_shared_ngrams`` distinct word n-grams with ANY single benchmark
    document. Returns the surviving corpus rows.

    Scale shape: the benchmark side is tiny by definition → broadcast
    hash join against streamed corpus n-grams (no corpus-side shuffle
    before the join); flagged ids are rare → the final left_anti is
    AQE-broadcast. One corpus scan end-to-end."""
    hits = (
        contamination_pairs(
            corpus, bench, id_col, text_col, bench_id_col, bench_text_col, shingle_n
        )
        .filter(F.col("n_shared_ngrams") >= min_shared_ngrams)
        .select("corpus_id")
        .distinct()
    )
    return corpus.join(hits, corpus[id_col] == hits.corpus_id, "left_anti")


def line_dedup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    keep_first: bool = True,
) -> DataFrame:
    """C4-style corpus-level LINE dedup: a line occurring in multiple
    documents (boilerplate, navigation, license banners) survives only in
    its first occurrence (min (doc_id, position)); every other copy is
    dropped and the documents are reassembled in original line order.

    Scale shape: posexplode → ONE window over the line-hash key (uniform
    md5 partitioning, no skew) → re-aggregate per document. Two shuffles
    total, both on high-entropy keys. A document whose every line was a
    duplicate drops out entirely (nothing left to keep).
    """
    from pyspark.sql.window import Window

    lines = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line"),
    )
    key = Window.partitionBy(F.md5(F.col("_line")))
    if keep_first:
        ranked = lines.withColumn("_rank", F.row_number().over(key.orderBy("_id", "_pos")))
        kept = ranked.filter(F.col("_rank") == 1)
    else:
        # strict mode: EVERY copy of a corpus-duplicated line is dropped
        ranked = lines.withColumn("_n", F.count(F.lit(1)).over(key))
        kept = ranked.filter(F.col("_n") == 1)
    return (
        kept.groupBy("_id")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                    lambda s: s["_line"],
                ),
                "\n",
            ).alias("text_deduped"),
            F.count(F.lit(1)).alias("n_lines_kept"),
        )
        .select(F.col("_id").alias(id_col), "text_deduped", "n_lines_kept")
    )


def span_grams(text: Column, n: int, portable: bool = True) -> Column:
    """Word n-grams WITH multiplicity (every window position, unlike the
    set-semantics ``word_shingles``) — the unit of duplicated-span
    accounting. Same O(tokens) slice-zip construction; portable=False
    yields combined xxhash64 longs instead of strings."""
    return span_grams_from_tokens(tokens(text), n, portable)


def span_grams_from_tokens(toks: Column, n: int, portable: bool = True) -> Column:
    """span_grams over an already-tokenized column — gram index i is the
    0-based START TOKEN of the window (dup_span_remove depends on this
    alignment to map hot windows back to covered token positions)."""
    if not portable:
        toks = F.transform(toks, lambda t: F.xxhash64(t))
    sz = F.size(toks)
    cols = [F.slice(toks, i + 1, sz - (n - 1)).alias(f"g{i}") for i in range(n)]
    zipped = F.arrays_zip(*cols)
    if portable:
        grams = F.transform(
            zipped, lambda s: F.concat_ws(" ", *[s[f"g{i}"] for i in range(n)]))
        empty = F.array().cast("array<string>")
    else:
        grams = F.transform(
            zipped, lambda s: F.xxhash64(*[s[f"g{i}"] for i in range(n)]))
        empty = F.array().cast("array<long>")
    return F.when(sz >= n, grams).otherwise(empty)


def dup_span_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_tokens: int = 20,
    min_count: int = 2,
    portable: bool = True,
) -> DataFrame:
    """Per-document duplicated-span accounting — the scalable stand-in
    for suffix-array substring dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better": substrings of ~50 tokens
    repeated anywhere in the corpus are memorization fuel). A span here
    is an exact ``span_tokens``-token window; it is DUPLICATED when its
    n-gram occurs ≥ ``min_count`` times corpus-wide (counting multiplicity,
    within-doc repeats included — same semantics as the suffix array).

    Output: (id_col, n_spans, n_dup_spans, dup_span_ppm) for EVERY doc
    (docs shorter than span_tokens get 0/0/0). Filter
    ``dup_span_ppm >= threshold`` to drop template-heavy docs (the
    RefinedWeb policy), or use n_dup_spans as a removal budget.

    Plan: explode windows → groupBy(doc, gram) m [shuffle 1, map-side
    partials] → gram totals from the (doc,gram) partials [shuffle 2,
    one row per distinct gram] filtered to hot grams → join back on gram
    [shuffle 3] → ONE groupBy(doc). Everything after the explode carries
    (doc_id, gram-hash, count) triples — the text never shuffles.
    ``portable=False`` keeps windows as combined xxhash64 longs (8-byte
    shuffle rows, no window strings materialized) — the crawl-scale path;
    portable=True builds oracle-replayable gram strings."""
    grams = df.select(
        F.col(id_col).alias("_id"),
        F.explode_outer(span_grams(F.col(text_col), span_tokens, portable))
        .alias("_g"),
    )
    # hot-gram totals derive FROM per_doc: checkpoint the shared
    # intermediate or both join sides re-run the explode+aggregation
    per_doc = grams.groupBy("_id", "_g").agg(
        F.count("_g").alias("_m")).localCheckpoint(eager=True)
    hot = (
        per_doc.groupBy("_g").agg(F.sum("_m").alias("_c"))
        .where(F.col("_c") >= min_count)
        .select("_g")
    )
    joined = per_doc.join(
        hot.withColumn("_dup", F.lit(1)), ["_g"], "left")
    return joined.groupBy("_id").agg(
        F.sum("_m").cast("long").alias("n_spans"),
        F.coalesce(F.sum(F.when(F.col("_dup").isNotNull(), F.col("_m"))),
                   F.lit(0)).cast("long").alias("n_dup_spans"),
    ).select(
        F.col("_id").alias(id_col), "n_spans", "n_dup_spans",
        F.when(F.col("n_spans") > 0,
               F.floor(F.col("n_dup_spans") * 1_000_000 / F.col("n_spans")))
         .otherwise(F.lit(0)).cast("long").alias("dup_span_ppm"),
    )


def dup_span_remove(
    df: DataFrame,
    id_col: str,
    text_col: str,
    span_tokens: int = 20,
    min_count: int = 2,
    portable: bool = True,
) -> DataFrame:
    """The REMOVAL action of substring dedup (Lee et al. 2022) on top of
    ``dup_span_stats``' accounting: every token position covered by ≥1
    duplicated window (an exact ``span_tokens``-token n-gram occurring ≥
    ``min_count`` times corpus-wide, multiplicity) is cut, and survivors
    rejoin with single spaces in original order. Output text is the
    CANONICAL token stream (trim/lower/whitespace-collapse — the same
    stream the spans were counted over), so results are engine-portable.

    Output: (id_col, text_clean, n_tokens, n_removed) for EVERY input doc
    (null/short docs pass through with n_removed=0; a doc whose every
    token was duplicated comes back with text_clean='').

    Plan: window posexplode [checkpointed once — both the hot-gram total
    and the join-back read it] → hot grams ≥ min_count → duplicated
    window STARTS (rare by construction) → covered positions (explode k
    per dup start, distinct) → token posexplode anti-join on (doc, pos) →
    ONE reassembly groupBy. Gram/position rows shuffle as (id, long)
    pairs; the token stream shuffles exactly once, for the inherent
    reassembly. ``portable=False`` carries 8-byte combined-xxhash64
    window keys (the crawl-scale path)."""
    k = span_tokens
    base = df.select(
        F.col(id_col).alias("_id"), tokens(F.col(text_col)).alias("_toks")
    )
    w = base.select(
        "_id",
        F.posexplode(span_grams_from_tokens(F.col("_toks"), k, portable)).alias(
            "_pos", "_g"
        ),
    ).localCheckpoint(eager=True)
    hot = (
        w.groupBy("_g").agg(F.count(F.lit(1)).alias("_c"))
        .where(F.col("_c") >= min_count)
        .select("_g")
    )
    covered = (
        w.join(hot, "_g")
        .select(
            F.col("_id").alias("_cid"),
            F.explode(F.sequence(F.col("_pos"), F.col("_pos") + F.lit(k - 1))).alias(
                "_cpos"
            ),
        )
        .distinct()
    )
    tokpos = base.select(
        "_id", F.posexplode(F.col("_toks")).alias("_tpos", "_tok")
    )
    kept = tokpos.join(
        covered,
        (tokpos["_id"] == covered["_cid"]) & (tokpos["_tpos"] == covered["_cpos"]),
        "left_anti",
    )
    re = kept.groupBy("_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_tpos", "_tok"))),
                lambda s: s["_tok"],
            ),
            " ",
        ).alias("text_clean"),
        F.count(F.lit(1)).alias("_n_kept"),
    )
    n_tokens = F.when(F.col("_toks").isNull(), F.lit(0)).otherwise(F.size("_toks"))
    return (
        base.select("_id", n_tokens.cast("long").alias("n_tokens"))
        .join(re, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            F.coalesce(F.col("text_clean"), F.lit("")).alias("text_clean"),
            F.col("n_tokens"),
            (F.col("n_tokens") - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_removed"),
        )
    )


def dedup_keep_latest(
    df: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """Keep the most recent row per key — the Common-Crawl recrawl
    discipline (one row per url, latest warc_ts wins; here generically
    keyed). Ties on the timestamp break toward the LARGEST tiebreak value
    so the winner is deterministic cross-engine.

    Scale shape: ONE groupBy over the keys taking max(struct(ts, tiebreak,
    payload...)) — struct max is lexicographic, so this is argmax-by-
    (ts, tiebreak) with full map-side partial aggregation. No window, no
    sort, no second pass: a window row_number() would sort every key
    group; the struct-max streams. Payload columns ride inside the struct.
    """
    payload = [c for c in df.columns if c not in key_cols]
    ordered = [ts_col, tiebreak_col] + [
        c for c in payload if c not in (ts_col, tiebreak_col)
    ]
    agg = df.groupBy(*key_cols).agg(
        F.max(F.struct(*ordered)).alias("_top"),
        F.count(F.lit(1)).alias("n_versions"),
    )
    return agg.select(
        *key_cols,
        *[F.col(f"_top.{c}").alias(c) for c in ordered],
        "n_versions",
    )


def cdc_chunks_df(
    df: DataFrame,
    id_col: str,
    text_col: str,
    gram_n: int = 3,
    boundary_div: int = 16,
) -> DataFrame:
    """Content-defined chunking over token streams (the LBFS recipe —
    Muthitacharoen et al., SOSP 2001 — that FastCDC/Venti storage dedup
    descends from): a chunk boundary opens at every token position p>0
    whose ``gram_n``-token window hashes to 0 mod ``boundary_div``, so
    boundaries are CONTENT-LOCAL — inserting one token early in a
    document shifts only the chunk it lands in; every later chunk keeps
    its identity, which is exactly what fixed-width ``chunk_docs``
    cannot do and why CDC is the insertion-robust unit for chunk-level
    corpus dedup. Expected chunk length ≈ ``boundary_div`` tokens.

    Output one row per chunk: (id_col, chunk_id, start_tok, n_toks,
    chunk_hash) — chunk_id is the 0-based running index inside the doc,
    start_tok the 0-based first-token position, chunk_hash the portable
    md5-56 of the space-joined tokens (cross-doc equal chunks collide
    on purpose; dedupe/count on it). Docs shorter than ``gram_n``
    tokens are one chunk; empty docs emit no row.

    Scale shape: boundary flags are computed ARRAY-SIDE (one
    interpreted transform pass over the gram array), then ONE
    posexplode into (doc, pos, tok, flag) rows, ONE per-doc window
    cumsum (partitioned on the high-cardinality doc key, never global)
    and ONE groupBy(doc, chunk) whose map-side partials collapse tokens
    to chunk rows. The text column never rides the shuffle — only
    (doc_id, pos, token) triples do."""
    from pyspark.sql.window import Window

    toks = tokens(F.col(text_col))
    grams = span_grams_from_tokens(toks, gram_n)
    flags = F.transform(
        grams,
        lambda g, p: ((p > 0) & (hash56(g) % boundary_div == 0))
        .cast("int"),
    )
    base = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.arrays_zip(toks.alias("tok"), flags.alias("bf"))),
    ).select(
        "_id", F.col("pos").alias("_j"), F.col("col.tok").alias("_tok"),
        F.coalesce("col.bf", F.lit(0)).alias("_bf"),
    )
    w = Window.partitionBy("_id").orderBy("_j") \
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    rows = base.select(
        "_id", "_j", "_tok", F.sum("_bf").over(w).alias("_chunk"))
    return rows.groupBy("_id", "_chunk").agg(
        F.min("_j").cast("long").alias("start_tok"),
        F.count(F.lit(1)).cast("long").alias("n_toks"),
        hash56(F.array_join(F.transform(
            F.array_sort(F.collect_list(F.struct("_j", "_tok"))),
            lambda s: s["_tok"]), " ")).alias("chunk_hash"),
    ).select(
        F.col("_id").alias(id_col),
        F.col("_chunk").cast("long").alias("chunk_id"),
        "start_tok", "n_toks", "chunk_hash",
    )


def cdc_chunk_stats(chunks: DataFrame) -> DataFrame:
    """Corpus chunk-dedup ledger over ``cdc_chunks_df`` output — the
    storage-dedup measurement: ONE aggregation. dup_chunk_ppm is the
    fraction of chunk instances whose content occurs elsewhere in the
    corpus (1e6·(n_chunks − n_distinct)/n_chunks); dup_token_ppm weighs
    by chunk length (tokens you would NOT store under
    dedup-by-chunk-hash)."""
    per_hash = chunks.groupBy("chunk_hash").agg(
        F.count(F.lit(1)).alias("_m"),
        F.sum("n_toks").alias("_t"),
        F.max("n_toks").alias("_t1"),
    )
    return per_hash.agg(
        F.sum("_m").cast("long").alias("n_chunks"),
        F.count(F.lit(1)).cast("long").alias("n_distinct"),
        F.sum("_t").cast("long").alias("n_tokens"),
        F.floor((F.sum("_m") - F.count(F.lit(1))) * 1_000_000
                / F.sum("_m")).cast("long").alias("dup_chunk_ppm"),
        F.floor((F.sum("_t") - F.sum("_t1")) * 1_000_000
                / F.sum("_t")).cast("long").alias("dup_token_ppm"),
    )


def kmv_group_jaccard(
    df: DataFrame,
    group_col: str,
    value_col: Column,
    k: int = 256,
) -> DataFrame:
    """Cross-GROUP duplication matrix from per-group KMV sketches:
    for every pair of groups (sources, snapshots, shards), the
    k-minimum-values Jaccard estimate of their value-set overlap —
    "which sources are re-crawling each other" at sketch cost, never
    a cross-group value join. Per unordered pair (g1 < g2):

    ``(g1, g2, k_used, n_both, jaccard_ppm)``

    with jaccard = n_both / k_used over the k smallest DISTINCT
    portable-56-bit hashes of the two sketches' union (the standard
    KMV pair estimate; k_used < k when the union is small — then the
    estimate is EXACT). Integer-only: bit-stable cross-engine.

    Scale shape: one distinct + one partitioned-window top-k collapse
    each group to ≤k hash rows (shuffle volume = per-partition
    distinct, the exact-distinct lower bound); the pair stage runs on
    ≤k-element ARRAYS per group — groups must be bounded (sources,
    not urls); the HOF passes are O(k log k) per pair.
    """
    from pyspark.sql.window import Window

    h = hash56(value_col)
    g = (
        df.where(F.col(group_col).isNotNull())
        .select(F.col(group_col).alias("_g"), h.alias("_h"))
        .distinct()
    )
    w = Window.partitionBy("_g").orderBy("_h")
    sk = (
        g.withColumn("_r", F.row_number().over(w))
        .where(F.col("_r") <= k)
        .groupBy("_g")
        .agg(F.array_sort(F.collect_list("_h")).alias("_sk"))
    )
    a = sk.select(F.col("_g").alias("g1"), F.col("_sk").alias("_a"))
    b = sk.select(F.col("_g").alias("g2"), F.col("_sk").alias("_b"))
    pairs = a.join(b, F.col("g1") < F.col("g2"))
    u = F.slice(F.array_sort(F.array_distinct(
        F.concat(F.col("_a"), F.col("_b")))), 1, k)
    both = F.filter(u, lambda x: F.array_contains(F.col("_a"), x)
                    & F.array_contains(F.col("_b"), x))
    k_used = F.size(u).cast("long")
    n_both = F.size(both).cast("long")
    return pairs.select(
        "g1", "g2", k_used.alias("k_used"), n_both.alias("n_both"),
        F.floor((n_both * 1_000_000).cast("double") / k_used)
        .cast("long").alias("jaccard_ppm"),
    )
