"""Text analysis operators: token stats, quality scoring, language ID,
document fingerprinting.

All ratios are integer parts-per-million over exact integer counts, so the
DuckDB oracle hash-matches. Everything is JVM expressions (split/filter/
aggregate) — zero Python in the hot path; one `select` per document pass.
"""

from __future__ import annotations

import pandas as pd  # module top: pandas_udf string type hints resolve here

from pyspark.sql import Column, DataFrame, functions as F

from jsonschema_spark.operators.dedup import hash56, tokens

STOPWORDS = ["the", "a", "and", "of", "to", "in", "is", "it"]

# tiny marker-word profiles for the n-gram-free language-ID heuristic;
# deterministic over any vocabulary (scores may tie → ordered tie-break)
LANG_MARKERS: dict[str, list[str]] = {
    "de": ["der", "die", "und", "nicht", "das", "ist"],
    "en": ["the", "and", "of", "to", "is", "it"],
    "es": ["el", "la", "de", "que", "es", "los"],
    "fr": ["le", "la", "et", "les", "des", "est"],
}

FP_PRIME = 1000000007
FP_MULT = 31


def token_count(text: Column) -> Column:
    return F.size(tokens(text))


def sum_token_len(text: Column) -> Column:
    return F.aggregate(
        F.transform(tokens(text), lambda t: F.length(t).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )


def punct_ppm(text: Column) -> Column:
    """Non-alphanumeric, non-space code points per million."""
    stripped = F.regexp_replace(F.regexp_replace(text, r"[\p{L}\p{N}]", ""), r"\s", "")
    return F.floor(F.length(stripped) * 1000000 / F.greatest(F.length(text), F.lit(1))).cast("long")


def stopword_ppm(text: Column) -> Column:
    toks = tokens(text)
    hits = F.size(F.filter(toks, lambda t: t.isin(STOPWORDS)))
    return F.floor(hits * 1000000 / F.greatest(F.size(toks), F.lit(1))).cast("long")


def text_quality(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_tokens, sum_token_len, punct_ppm, stopword_ppm, is_quality) —
    heuristic quality gate: enough tokens, sane punctuation density,
    some stopword mass (natural language, not boilerplate)."""
    t = F.col(text_col)
    n = token_count(t)
    pp = punct_ppm(t)
    sp = stopword_ppm(t)
    return df.select(
        F.col(id_col).alias("doc_id"),
        n.alias("n_tokens"),
        sum_token_len(t).alias("sum_token_len"),
        pp.alias("punct_ppm"),
        sp.alias("stopword_ppm"),
        ((n >= 5) & (n <= 100000) & (pp < 300000) & (sp > 0)).alias("is_quality"),
    )


def langid(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Marker-word language ID: per-language hit count over the token
    multiset; argmax with language-name-ascending tie-break →
    (doc_id, pred_lang, score)."""
    toks = tokens(F.col(text_col))

    def score(ws: list[str]) -> Column:
        return F.size(F.filter(toks, lambda t: t.isin(ws)))

    scores = {lang: score(ws) for lang, ws in LANG_MARKERS.items()}
    ordered = sorted(scores)  # tie-break: first language in asc order wins
    best_lang = F.lit(ordered[0])
    best_score = scores[ordered[0]]
    for lang in ordered[1:]:
        better = scores[lang] > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, scores[lang]).otherwise(best_score)
    return df.select(
        F.col(id_col).alias("doc_id"), best_lang.alias("pred_lang"), best_score.cast("long").alias("score")
    )


def fingerprint(text: Column) -> Column:
    """Rolling polynomial hash over token hash56s:
    fold(acc*31 + h) mod 1e9+7 — an order-sensitive document fingerprint
    (content AND sequence), unlike the order-free MinHash."""
    hs = F.transform(tokens(text), lambda t: hash56(t))
    return F.aggregate(
        hs,
        F.lit(0).cast("long"),
        lambda acc, h: (acc * FP_MULT + h) % FP_PRIME,
    )


def fingerprints(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    return df.select(F.col(id_col).alias("doc_id"), fingerprint(F.col(text_col)).alias("fp"))


def webtext_filters(
    df: DataFrame,
    id_col: str,
    text_col: str,
    min_words: int = 50,
    max_words: int = 100000,
    min_stopwords: int = 2,
) -> DataFrame:
    """Gopher/C4-style web-text quality filters — the published doc-level
    heuristics (Rae et al. 2021 appendix A; Raffel et al. 2020 §2.2)
    as one pure-JVM pass: word-count bounds, mean word length 3–10,
    symbol(#/…)-to-word ratio ≤ 10%, ≤ 90% bullet lines, ≤ 30%
    ellipsis-ending lines, ≥ 80% alphabetic words, ≥ 2 distinct Gopher
    stopwords, no "lorem ipsum", no '{'. All ratios are exact-integer ppm
    (oracle-stable); `keep` is the conjunction.
    """
    t = F.col(text_col)
    cols, keep = _webtext_exprs(t, min_words, max_words, min_stopwords)
    return df.filter(t.isNotNull()).select(
        F.col(id_col),
        *[c.alias(name) for name, c in cols],
        keep.cast("long").alias("keep"),
    )


def webtext_keep(t: Column, min_words: int = 50, max_words: int = 100000,
                 min_stopwords: int = 2) -> Column:
    """The keep predicate alone — composable as a pure filter (no join,
    no shuffle; see curate_corpus)."""
    return t.isNotNull() & _webtext_exprs(t, min_words, max_words, min_stopwords)[1]


def _webtext_exprs(t: Column, min_words: int, max_words: int,
                   min_stopwords: int):
    toks = tokens(t)
    n = F.size(toks)
    n1 = F.greatest(n, F.lit(1))
    mean_milli = F.floor(sum_token_len(t) * 1000 / n1).cast("long")
    n_hash = F.length(t) - F.length(F.replace(t, F.lit("#"), F.lit("")))
    n_ell = (F.length(t) - F.length(F.replace(t, F.lit("..."), F.lit("")))) / 3
    sym_ppm = F.floor((n_hash + n_ell) * 1000000 / n1).cast("long")
    lines = F.split(t, "\n")
    nl1 = F.greatest(F.size(lines), F.lit(1))
    bullet_ppm = F.floor(
        F.size(F.filter(lines, lambda l: l.rlike(r"^\s*[-*•]"))) * 1000000 / nl1
    ).cast("long")
    ell_end_ppm = F.floor(
        F.size(F.filter(lines, lambda l: l.rlike(r"\.\.\.\s*$"))) * 1000000 / nl1
    ).cast("long")
    term_ppm = F.floor(
        F.size(F.filter(lines, lambda l: l.rlike(r"[.!?]\s*$"))) * 1000000 / nl1
    ).cast("long")
    alpha_ppm = F.floor(
        F.size(F.filter(toks, lambda x: x.rlike(r"\p{L}"))) * 1000000 / n1
    ).cast("long")
    gopher_stop = F.array(*[F.lit(w) for w in
                            ("the", "be", "to", "of", "and", "that", "have", "with")])
    n_stop = F.size(F.array_intersect(F.array_distinct(toks), gopher_stop)).cast("long")
    has_lorem = F.contains(F.lower(t), F.lit("lorem ipsum"))
    has_brace = F.contains(t, F.lit("{"))
    keep = (
        n.between(min_words, max_words)
        & mean_milli.between(3000, 10000)
        & (sym_ppm <= 100000)
        & (bullet_ppm <= 900000)
        & (ell_end_ppm <= 300000)
        & (alpha_ppm >= 800000)
        & (n_stop >= min_stopwords)
        & ~has_lorem
        & ~has_brace
    )
    cols = [
        ("n_words", n.cast("long")),
        ("mean_word_len_milli", mean_milli),
        ("sym_ppm", sym_ppm),
        ("bullet_ppm", bullet_ppm),
        ("ellipsis_end_ppm", ell_end_ppm),
        ("term_punct_ppm", term_ppm),
        ("alpha_word_ppm", alpha_ppm),
        ("n_gopher_stopwords", n_stop),
    ]
    return cols, keep


def clean_text(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Webtext normalization pass: control characters (C0 + DEL) become
    spaces, whitespace runs collapse to one space, ends trimmed. Two
    pure-JVM regexp_replace passes inside the scan projection — zero
    shuffle, zero Python; the before/after char counts make shrinkage
    auditable downstream."""
    t = F.col(text_col)
    no_ctrl = F.regexp_replace(t, "[\\x00-\\x1f\\x7f]", " ")
    collapsed = F.trim(F.regexp_replace(no_ctrl, r"\s+", " "))
    return df.where(t.isNotNull()).select(
        F.col(id_col),
        collapsed.alias("text_clean"),
        F.length(t).cast("long").alias("n_chars_raw"),
        F.length(collapsed).cast("long").alias("n_chars_clean"),
    )


REPETITION_TOP_NS = (2, 3, 4)
REPETITION_DUP_NS = (5, 6)
# Gopher Table A1 removal thresholds (fraction of characters), in ppm:
# most-common {2,3,4}-gram coverage > 0.20/0.18/0.16; duplicated
# {5,6}-gram coverage > 0.15/0.14.
REPETITION_MAX_PPM = {
    ("top", 2): 200000, ("top", 3): 180000, ("top", 4): 160000,
    ("dup", 5): 150000, ("dup", 6): 140000,
}


def _word_grams(toks: Column, n: int) -> Column:
    """Non-distinct word n-grams (space-joined) — same slice/zip build as
    ``dedup.word_shingles`` (O(tokens) per row) but KEEPING multiplicity:
    repetition stats are about how often a gram repeats."""
    if n == 1:
        return toks
    sz = F.size(toks)
    cols = [F.slice(toks, i + 1, sz - (n - 1)).alias(f"g{i}") for i in range(n)]
    zipped = F.arrays_zip(*cols)
    grams = F.transform(zipped, lambda s: F.concat_ws(" ", *[s[f"g{i}"] for i in range(n)]))
    return F.when(sz >= n, grams).otherwise(F.array().cast("array<string>"))


def _tag_grams(grams: Column, n: int) -> Column:
    # factory keeps n out of the higher-order lambda's parameter list
    # (two-param transform lambdas silently bind the element index)
    return F.transform(
        grams, lambda g: F.struct(F.lit(n).cast("int").alias("n"), g.alias("g"))
    )


def repetition_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    top_ns: tuple[int, ...] = REPETITION_TOP_NS,
    dup_ns: tuple[int, ...] = REPETITION_DUP_NS,
    thresholds: dict | None = None,
    portable: bool = True,
) -> DataFrame:
    """Gopher repetition filters (Rae et al. 2021 appendix A, Table A1):
    per document, the fraction of characters covered by (a) the MOST
    FREQUENT word n-gram for n in `top_ns` (count ties broken toward the
    longer gram — deterministic cross-engine, unlike insertion-order
    argmax) and (b) all word n-grams that occur more than once for n in
    `dup_ns`. Coverage of a gram with count c and char-length L is c*L
    (occurrences may overlap; the standard published approximation), the
    denominator is length(text), and every ratio is floor-ppm so the
    DuckDB oracle hash-matches. The top-gram argmax is one packed-int64
    max — (count << 31) | len — so no window/second aggregation is
    needed. `keep` is the conjunction of the Table A1 thresholds.

    Scale shape: ONE scan of (id, text); all n-gram families are built as
    arrays in a single projection, tagged with n, flattened and exploded
    once (a sentinel n=0 element keeps gram-less short docs alive through
    the explode, so no spine re-scan/join is needed); then groupBy
    (doc, n, gram) with map-side partial counts and one per-doc
    conditional aggregation. Two shuffles, zero joins, independent of
    len(top_ns)+len(dup_ns). ``portable=False`` replaces the gram STRING
    in the shuffle key with (xxhash64, char-length) — 12-byte rows
    instead of up-to-gram-length strings, same fast/portable split as
    minhash/dsir/span_grams (counts exact up to 2^-64 hash collisions;
    the shipped oracle query keeps the portable family).

    Reference analogue: the reference engine has no corpus operators; this
    extends the webtext_filters family (sourcemeta/jsonschema validates
    docs one-by-one — corpus-level curation is the Spark-native addition).
    """
    th = REPETITION_MAX_PPM if thresholds is None else thresholds
    ns = sorted({*top_ns, *dup_ns})
    t = F.col(text_col)
    toks = tokens(t)
    sentinel = F.array(F.struct(F.lit(0).cast("int").alias("n"), F.lit("").alias("g")))
    combined = F.concat(
        sentinel, F.flatten(F.array(*[_tag_grams(_word_grams(toks, n), n) for n in ns]))
    )
    base = df.where(t.isNotNull()).select(
        F.col(id_col).alias("doc_id"),
        F.length(t).alias("_chars"),
        combined.alias("_gs"),
    )
    ex = base.select(
        "doc_id", "_chars", F.explode("_gs").alias("_s")
    ).select("doc_id", "_chars", F.col("_s.n").alias("_n"), F.col("_s.g").alias("_g"))
    if portable:
        cnt = (
            ex.groupBy("doc_id", "_chars", "_n", "_g")
            .agg(F.count(F.lit(1)).alias("_c"))
            .select("doc_id", "_chars", "_n", F.length("_g").alias("_glen"), "_c")
        )
    else:
        hashed = ex.select(
            "doc_id", "_chars", "_n",
            F.xxhash64(F.col("_g")).alias("_gh"), F.length("_g").alias("_glen"),
        )
        cnt = (
            hashed.groupBy("doc_id", "_chars", "_n", "_gh", "_glen")
            .agg(F.count(F.lit(1)).alias("_c"))
            .select("doc_id", "_chars", "_n", "_glen", "_c")
        )
    chars1 = F.greatest(F.col("_chars"), F.lit(1))
    cov = F.col("_c") * F.col("_glen")
    p31 = 1 << 31  # glen < 2^31 always; packed max = lexicographic (c, glen)
    aggs = []
    for n in top_ns:
        packed = F.max(
            F.when(F.col("_n") == n, F.col("_c") * F.lit(p31) + F.col("_glen"))
        )
        top_cov = F.shiftright(packed, 31) * packed.bitwiseAND(F.lit(p31 - 1))
        aggs.append(
            F.floor(
                F.coalesce(top_cov, F.lit(0)) * 1000000 / chars1
            ).cast("long").alias(f"top{n}_ppm")
        )
    for n in dup_ns:
        aggs.append(
            F.floor(
                F.coalesce(F.sum(F.when((F.col("_n") == n) & (F.col("_c") >= 2), cov)), F.lit(0))
                * 1000000 / chars1
            ).cast("long").alias(f"dup{n}_ppm")
        )
    st = cnt.groupBy("doc_id", "_chars").agg(*aggs)
    names = [f"top{n}_ppm" for n in top_ns] + [f"dup{n}_ppm" for n in dup_ns]
    keep = F.lit(True)
    for n in top_ns:
        keep = keep & (F.col(f"top{n}_ppm") <= th[("top", n)])
    for n in dup_ns:
        keep = keep & (F.col(f"dup{n}_ppm") <= th[("dup", n)])
    return st.select(
        F.col("doc_id"), *[F.col(c) for c in names], keep.cast("long").alias("keep")
    )


# GPT-2-style pretokenizer, restricted to the Java∩RE2 common subset (the
# published pattern's `'s|'t|...` contractions and trailing-space lookahead
# need lookahead, which RE2 lacks — the oracle must run the SAME regex):
# a token is an optional leading space + letter run, digit run, or
# non-space-symbol run. Whitespace between tokens is not counted.
BPE_TOKEN_RE = r" ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_token_count(text: Column) -> Column:
    """Subword-ish token count (BPE pretokenization granularity) — the
    budget estimator a training pipeline runs before real tokenization.
    Pure JVM: one regexp_extract_all + size."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_TOKEN_RE), 0)).cast("long")


def token_budget(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, n_ws_tokens, n_bpe_tokens, n_chars, bpe_per_100_words):
    corpus token-budget accounting at both granularities."""
    t = F.col(text_col)
    ws = token_count(t)
    bpe = bpe_token_count(t)
    return df.filter(t.isNotNull()).select(
        F.col(id_col),
        ws.cast("long").alias("n_ws_tokens"),
        bpe.alias("n_bpe_tokens"),
        F.length(t).cast("long").alias("n_chars"),
        F.floor(bpe * 100 / F.greatest(ws, F.lit(1))).cast("long").alias("bpe_per_100_words"),
    )


# PII patterns in the Java∩RE2 common subset (no lookaround) — redaction
# order matters: emails first (their digits would otherwise match the
# id-run pattern), then ips, phones, long digit runs.
PII_PATTERNS = [
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("ipv4", r"\b((25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\.){3}(25[0-5]|2[0-4]\d|1\d\d|[1-9]?\d)\b", "<IP>"),
    ("phone", r"\+\d{8,15}|\b\d{3}[-.]\d{3}[-.]\d{4}\b", "<PHONE>"),
    ("id_number", r"\b\d{9,}\b", "<ID>"),
]


def pii_scrub(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Redact emails / IPv4s / phone numbers / long digit runs and count
    each category — one pure-JVM pass (sequential regexp_replace; counts
    taken before the preceding category's redaction can consume them)."""
    t = F.col(text_col)
    out_cols = [F.col(id_col)]
    clean = t
    for name, pat, token in PII_PATTERNS:
        out_cols.append(
            F.size(F.regexp_extract_all(clean, F.lit(pat), 0)).cast("long").alias(f"n_{name}")
        )
        clean = F.regexp_replace(clean, pat, token)
    return df.filter(t.isNotNull()).select(*out_cols, clean.alias("text_clean"))


def boilerplate_strip(
    df: DataFrame,
    id_col: str,
    text_col: str,
    group_col: str,
    min_df: int = 2,
) -> DataFrame:
    """Site-scoped boilerplate removal: a LINE appearing in >= ``min_df``
    distinct documents of the same group (host / registered domain — pair
    with operators/urltools.py) is navigation/footer/cookie-banner
    boilerplate and is stripped from EVERY document in that group; the
    survivors are reassembled in original line order. This is the
    host-scoped sibling of ``dedup.line_dedup`` (C4 keeps one global
    copy; site-scoped removal is the CCNet/RefinedWeb recipe — a phrase
    common across one site is boilerplate even when rare globally).

    Output: (id_col, group_col, text_stripped, n_lines_kept). Documents
    whose every line was boilerplate drop out (same policy as
    line_dedup; drop or quarantine them downstream).

    Scale shape: posexplode -> groupBy(group, line-md5) countDistinct
    [shuffle 1, high-entropy key: the LINE hash is in it, so one giant
    host cannot hot-spot a partition] -> anti-join back on the same key
    [shuffle 2, co-partitioned] -> groupBy(doc) reassembly [shuffle 3 —
    inherent: line surgery must move text]. The exploded lines feed both
    the frequency side and the join probe side: checkpointed once."""
    lines = df.select(
        F.col(group_col).alias("_grp"),
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), "\n")).alias("_pos", "_line"),
    ).withColumn("_lk", F.md5("_line")).localCheckpoint(eager=True)
    hot = (
        lines.groupBy("_grp", "_lk")
        .agg(F.countDistinct("_id").alias("_df"))
        .where(F.col("_df") >= min_df)
        .select("_grp", "_lk")
    )
    kept = lines.join(hot, ["_grp", "_lk"], "left_anti")
    return (
        kept.groupBy("_id", "_grp")
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_line"))),
                    lambda s: s["_line"],
                ),
                "\n",
            ).alias("text_stripped"),
            F.count(F.lit(1)).alias("n_lines_kept"),
        )
        .select(F.col("_id").alias(id_col), F.col("_grp").alias(group_col),
                "text_stripped", "n_lines_kept")
    )


def nfc_normalize(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Unicode NFC normalization of the text column — the standard
    pre-tokenization canonicalization (composes combining marks, so the
    same word extracted by different tools hashes identically; NFC does
    NOT fold compatibility forms like ﬁ→fi — that is NFKC and it is
    lossy, deliberately not done here).

    Arrow-batched pandas ``.str.normalize('NFC')`` — a vectorized ICU-free
    pass, no per-row Python loop; nulls pass through. Engine-portable:
    Python unicodedata and DuckDB ``nfc_normalize`` agree (verified over
    combining marks, double diacritics, ligatures, CJK). ``changed`` and
    the length columns are JVM-side comparisons on the result.

    Output: (id_col, text_nfc, changed, n_chars, n_chars_nfc)."""
    from pyspark.sql.types import StringType

    @F.pandas_udf(StringType())
    def _nfc(s: pd.Series) -> pd.Series:
        return s.str.normalize("NFC")

    return df.select(
        F.col(id_col),
        _nfc(F.col(text_col)).alias("text_nfc"),
        F.col(text_col).alias("_orig"),
    ).select(
        F.col(id_col),
        "text_nfc",
        (~F.col("text_nfc").eqNullSafe(F.col("_orig"))).alias("changed"),
        F.coalesce(F.length("_orig"), F.lit(0)).cast("long").alias("n_chars"),
        F.coalesce(F.length("text_nfc"), F.lit(0)).cast("long").alias("n_chars_nfc"),
    )


def _zlib_len_udf(level: int):
    @F.pandas_udf("long")
    def _clen(s: pd.Series) -> pd.Series:
        import zlib

        return pd.Series(
            [
                None if t is None else len(zlib.compress(t.encode("utf-8"), level))
                for t in s
            ],
            dtype="Int64",
        )

    return _clen


def compression_ratio(df: DataFrame, id_col: str, text_col: str, level: int = 6) -> DataFrame:
    """zlib(DEFLATE) compression ratio as a repetitiveness/quality signal
    (the CCNet/quality-classifier heuristic: template spam and keyword
    stuffing compress to a fraction of natural text; near-random noise
    stays ≈ 1e6 ppm). One Arrow-batched Python pass — the per-row work is
    a C-level DEFLATE call, no shuffle, and only (id, two longs) leave
    the stage; the ratio is a JVM-side exact integer formula.

    Genuinely non-SQL-expressible (DuckDB has no DEFLATE function), so
    the driver's correctness row is rows-only by design; the
    python-mirror unit test pins exact values instead.

    Output: (id_col, n_bytes, n_bytes_zlib, ratio_ppm)."""
    clen = _zlib_len_udf(level)
    payload = F.encode(F.col(text_col), "UTF-8")
    out = df.select(
        F.col(id_col),
        F.coalesce(F.octet_length(payload), F.lit(0)).cast("long").alias("n_bytes"),
        F.coalesce(clen(F.col(text_col)), F.lit(0)).cast("long").alias("n_bytes_zlib"),
    )
    return out.withColumn(
        "ratio_ppm",
        F.when(
            F.col("n_bytes") > 0,
            F.floor(F.col("n_bytes_zlib") * F.lit(1_000_000) / F.col("n_bytes")),
        )
        .otherwise(F.lit(0))
        .cast("long"),
    )


def readability(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Flesch reading-ease proxy over the raw text — the standard
    cheap-quality signal next to the Gopher/C4 ratios. Syllables are
    approximated as ASCII vowel-group runs (the classic heuristic) and
    sentences as terminal-punctuation runs, so the whole operator is
    THREE JVM regexp_count calls inside the scan projection — zero
    Python, zero shuffle, and every count is exact, making the one
    fixed-op-order double formula engine-portable:

        flesch_milli = floor(206835 − 1015·words/sentences
                                    − 84600·syllables/words)

    Docs with no words (or no sentence punctuation → sentences floored
    at 1) get flesch_milli NULL rather than a fake score.

    Output: (id_col, n_words, n_sentences, n_syllables, flesch_milli)."""
    t = F.col(text_col)
    words = F.coalesce(F.size(tokens(t)), F.lit(0)).cast("long")
    sents = F.greatest(
        F.lit(1), F.coalesce(F.regexp_count(t, F.lit(r"[.!?]+")), F.lit(0))
    ).cast("long")
    syls = F.coalesce(
        F.regexp_count(F.lower(t), F.lit(r"[aeiouy]+")), F.lit(0)
    ).cast("long")
    flesch = F.floor(
        F.lit(206835.0)
        - F.lit(1015.0) * words / sents
        - F.lit(84600.0) * syls / words
    ).cast("long")
    return df.select(
        F.col(id_col),
        words.alias("n_words"),
        sents.alias("n_sentences"),
        syls.alias("n_syllables"),
        F.when(words > 0, flesch).alias("flesch_milli"),
    )


def winnow_fingerprints(
    df: DataFrame,
    id_col: str,
    text_col: str,
    k: int = 5,
    w: int = 4,
) -> DataFrame:
    """Winnowing fingerprints (Schleimer, Wilkerson & Aiken 2003 — the
    MOSS algorithm): hash every k-token gram, slide a w-gram window and
    select each window's MINIMUM hash (ties → leftmost position), then
    deduplicate consecutive selections. Guarantees any match of length ≥
    w+k-1 tokens shares a fingerprint — LOCAL fingerprints for partial
    overlap/plagiarism detection, where the whole-doc rolling hash
    (``fingerprint``) only catches identical documents.

    Plan: gram posexplode → ONE window min(struct(hash, pos)) per doc
    (rows w-frame — Spark and the SQL oracle share frame semantics and
    the struct tie-break) → distinct. Tail windows shrink below w grams
    (both engines truncate frames identically): a superset of the
    classic selection, so the ≥ w+k−1 match guarantee is preserved and
    docs with fewer than w grams still fingerprint (their global min).
    The window partitions by doc id:
    per-doc work is linear and a single giant doc is the only skew unit
    (cap upstream via webtext max_words).

    Output: (id_col, pos, gram_h56) — one row per selected fingerprint."""
    from pyspark.sql.window import Window

    from jsonschema_spark.operators.dedup import span_grams

    g = df.select(
        F.col(id_col).alias("_id"),
        F.posexplode(span_grams(F.col(text_col), k)).alias("_pos", "_g"),
    ).select("_id", "_pos", hash56(F.col("_g")).alias("_h"))
    win = (
        Window.partitionBy("_id")
        .orderBy("_pos")
        .rowsBetween(Window.currentRow, w - 1)
    )
    sel = g.select(
        "_id", F.min(F.struct("_h", "_pos")).over(win).alias("_m")
    ).where(F.col("_m").isNotNull())
    return (
        sel.select(
            F.col("_id").alias(id_col),
            F.col("_m._pos").alias("pos"),
            F.col("_m._h").alias("gram_h56"),
        )
        .distinct()
    )


def tfidf_top_terms(
    df: DataFrame, id_col: str, text_col: str, k: int = 5
) -> DataFrame:
    """Top-k characteristic terms per document by TF·IDF — with an
    ln-free integer IDF surrogate, idf_ppm = floor(1e6·N/df_t), so every
    score is EXACT int64 arithmetic (transcendental log differs in the
    last ulp across engines; the surrogate is strictly monotone in 1/df_t,
    so per-doc rankings agree with true idf whenever tf ties — and the
    ranking is what the operator returns). Ties → lexicographic term.

    Plan: token explode → ONE groupBy(doc, term) for tf [shuffle 1,
    map-side partials, checkpointed — the term-df aggregate derives from
    it] → groupBy(term) countDistinct-free df (count of (doc,term) rows
    per term) [shuffle 2, one row per distinct term] → join back on term
    [shuffle 3] → per-doc top-k window [shuffle 4 on doc id]. The text
    never shuffles; N is one scalar aggregate.

    Output: (id_col, term, tf, idf_ppm, score, rnk), rnk 1..k."""
    from pyspark.sql.window import Window

    t = df.select(F.col(id_col).alias("_id"), F.explode(tokens(F.col(text_col))).alias("_t"))
    tf = t.groupBy("_id", "_t").agg(F.count(F.lit(1)).alias("tf")).localCheckpoint(eager=True)
    dft = tf.groupBy("_t").agg(F.count(F.lit(1)).alias("_df"))
    n_docs = df.select(F.count(F.lit(1)).alias("_n"))
    scored = (
        tf.join(dft, "_t")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("idf_ppm", F.floor(F.col("_n") * F.lit(1_000_000) / F.col("_df")).cast("long"))
        .withColumn("score", (F.col("tf") * F.col("idf_ppm")).cast("long"))
    )
    w = Window.partitionBy("_id").orderBy(F.col("score").desc(), F.col("_t").asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= k)
        .select(
            F.col("_id").alias(id_col),
            F.col("_t").alias("term"),
            F.col("tf").cast("long").alias("tf"),
            "idf_ppm",
            "score",
            F.col("rnk").cast("long").alias("rnk"),
        )
    )


def top_ngrams(
    df: DataFrame, id_col: str, text_col: str, n: int = 2, k: int = 20
) -> DataFrame:
    """Corpus-wide most frequent word n-grams with occurrence AND
    document frequency — stop-phrase mining: the data-driven way to pick
    the ``max_df`` / ``max_band_df`` hot-key cutoffs and boilerplate
    candidates instead of guessing them.

    Plan: window explode → ONE groupBy(gram) computing count(*) and
    approx-free count(DISTINCT doc) via a (doc,gram) pre-aggregate →
    global top-k (orderBy + limit over the already-aggregated gram table;
    AQE pushes partial top-k map-side). Ties → lexicographic gram.

    Output: (gram, n_occurrences, n_docs, rnk), rnk 1..k."""
    from jsonschema_spark.operators.dedup import span_grams
    from pyspark.sql.window import Window

    g = df.select(
        F.col(id_col).alias("_id"),
        F.explode(span_grams(F.col(text_col), n)).alias("_g"),
    )
    per_doc = g.groupBy("_id", "_g").agg(F.count(F.lit(1)).alias("_m"))
    agg = per_doc.groupBy("_g").agg(
        F.sum("_m").cast("long").alias("n_occurrences"),
        F.count(F.lit(1)).cast("long").alias("n_docs"),
    )
    # orderBy+limit = TakeOrderedAndProject: each partition keeps its own
    # top-k and only k rows per partition reach the driver-side merge —
    # NEVER a row_number window over the full gram vocabulary, which at
    # crawl scale funnels billions of distinct grams through ONE task
    # (same plan bm25_topk uses, search.py). The window ranks only the k
    # survivors.
    top = agg.orderBy(F.col("n_occurrences").desc(), F.col("_g").asc()).limit(k)
    w = Window.orderBy(F.col("n_occurrences").desc(), F.col("_g").asc())
    return (
        top.withColumn("rnk", F.row_number().over(w))
        .select(F.col("_g").alias("gram"), "n_occurrences", "n_docs",
                F.col("rnk").cast("long").alias("rnk"))
    )


# Unicode script classes as explicit codepoint ranges — the SAME pattern
# text runs on Java regex and RE2 (both accept \x{hhhh} in classes), so
# the oracle shares each class verbatim. Order = dominance tie-break
# priority (earlier wins at equal counts).
SCRIPT_CLASSES = (
    ("latin", r"[A-Za-z]"),
    ("digit", r"[0-9]"),
    ("cyrillic", r"[\x{0400}-\x{04FF}]"),
    ("greek", r"[\x{0370}-\x{03FF}]"),
    ("arabic", r"[\x{0600}-\x{06FF}]"),
    ("cjk", r"[\x{4E00}-\x{9FFF}]"),
    ("hangul", r"[\x{AC00}-\x{D7AF}]"),
    ("kana", r"[\x{3040}-\x{30FF}]"),
)


def script_profile(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Per-document Unicode-script composition — the language-ID
    prefilter crawl pipelines run before any model-based classifier
    (CJK/Cyrillic/Arabic text should never reach an English quality
    gate, and mixed-script spam is its own signal).

    One ``regexp_count`` per script class inside the scan projection —
    zero Python, zero shuffles. ``dominant_script`` is the argmax with
    ties broken by class-list order via one greatest(struct(count,
    −position, name)) expression (NULL when no class matches at all).

    Output: (id_col, n_chars, <one count per class>, dominant_script).
    """
    t = F.col(text_col)
    counts = {
        name: F.coalesce(F.regexp_count(t, F.lit(pat)), F.lit(0)).cast("long")
        for name, pat in SCRIPT_CLASSES
    }
    dom = F.greatest(
        *[
            F.struct(
                counts[name].alias("c"),
                F.lit(-i).alias("p"),
                F.lit(name).alias("s"),
            )
            for i, (name, _) in enumerate(SCRIPT_CLASSES)
        ]
    )
    return df.select(
        F.col(id_col),
        F.coalesce(F.length(t), F.lit(0)).cast("long").alias("n_chars"),
        *[counts[name].alias(name) for name, _ in SCRIPT_CLASSES],
        F.when(dom["c"] > 0, dom["s"]).alias("dominant_script"),
    )


def vocab_stats(df: DataFrame, text_col: str, group_col: str) -> DataFrame:
    """Per-group vocabulary-growth diagnostics — the corpus-quality lens
    Heaps'/Zipf's laws look through: token count, type (distinct-token)
    count, hapax legomena share and type-token ratio per group (language,
    source, quality bucket). A healthy natural-language slice shows high
    hapax share and a TTR falling with corpus size; templated/spam slices
    collapse both.

    Plan: ONE token explode → groupBy(group, token) with map-side
    partials [shuffle 1, the per-group vocabulary] → groupBy(group) over
    vocabulary-sized rows [shuffle 2, group-count-sized] → left join from
    the per-group doc counts so tokenless groups keep zeros. Integer ppm
    everywhere (no floats to drift cross-engine).

    Output: (group_col, n_docs, n_tokens, n_types, hapax,
    hapax_ppm, ttr_ppm)."""
    t = df.select(
        F.col(group_col).alias("_g"),
        F.explode(tokens(F.col(text_col))).alias("_t"),
    )
    tc = t.groupBy("_g", "_t").agg(F.count(F.lit(1)).alias("c"))
    g = tc.groupBy("_g").agg(
        F.sum("c").cast("long").alias("n_tokens"),
        F.count(F.lit(1)).cast("long").alias("n_types"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0)).cast("long")
        .alias("hapax"),
    )
    d = df.groupBy(F.col(group_col).alias("_g")).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"))
    out = d.join(g, "_g", "left").select(
        F.col("_g").alias(group_col),
        "n_docs",
        F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
        F.coalesce(F.col("n_types"), F.lit(0)).alias("n_types"),
        F.coalesce(F.col("hapax"), F.lit(0)).alias("hapax"),
    )
    return out.select(
        "*",
        F.when(F.col("n_types") > 0,
               F.expr("hapax * 1000000 div n_types"))
        .otherwise(F.lit(0)).cast("long").alias("hapax_ppm"),
        F.when(F.col("n_tokens") > 0,
               F.expr("n_types * 1000000 div n_tokens"))
        .otherwise(F.lit(0)).cast("long").alias("ttr_ppm"),
    )


# --- mojibake (encoding-damage) detection + repair -----------------------
#
# The ftfy step of a webtext pipeline, re-expressed as a FIXED repair
# table: the UTF-8 byte sequence of each target character, misdecoded as
# Windows-1252 (the single dominant crawl encoding error: a UTF-8 page
# served/decoded as cp1252 turns every é into 'Ã©', every ’ into 'â€™').
# The table is GENERATED from the target characters at import time —
# moji = ch.encode('utf-8').decode('cp1252') — so it cannot drift from
# the encodings it models; characters whose UTF-8 bytes hit the five
# cp1252-unmapped bytes (0x81 8D 8F 90 9D — e.g. '”') are skipped.
#
# Repair is a chain of LITERAL replace() calls in a deterministic order
# (3-byte forms first, then bytewise-ascending) — replace() scans
# left-to-right and resumes after each emitted replacement identically in
# Spark, DuckDB and Python, so the repaired text is bit-identical across
# engines. ONE pass repairs single mojibake; doubly-encoded text needs
# passes=2 (documented, not iterated-to-fixpoint — a fixed chain keeps
# the whole repair inside codegen). False-positive contract: text that
# legitimately contains a moji sequence (e.g. an article ABOUT mojibake)
# is "repaired" — the fixed-table tradeoff every scan-speed variant of
# ftfy makes.

_MOJIBAKE_CHARS = (
    "éèêëàáâãäåæçîïíìñóòôõöøœúùûüýÿß"
    "ÉÈÀÂÃÄÅÇÖÜ"  # Ã and Å make passes=2 close the double-encoded C3/C5
                  # families: pass 1 leaves 'Ãƒ©'-style residue whose 'Ãƒ'
                  # must itself be a table row
    "‘’“–—…•"
    " °€£©®«»·¿¡½"
)


def _moji_table() -> tuple:
    out = []
    for ch in _MOJIBAKE_CHARS:
        try:
            moji = ch.encode("utf-8").decode("cp1252")
        except UnicodeDecodeError:  # hits a cp1252-unmapped byte
            continue
        out.append((moji, ch))
    # longer sequences first, then bytewise order: the C2-family pass
    # runs before the C3-family pass that could emit its prefix char,
    # making the single-pass result order-deterministic.
    out.sort(key=lambda t: (-len(t[0]), t[0]))
    return tuple(out)


MOJIBAKE_TABLE: tuple = _moji_table()


def fix_mojibake(text: Column, passes: int = 1) -> Column:
    """cp1252-mojibake-repaired text: one chained-literal-replace pass
    per ``passes`` (len(MOJIBAKE_TABLE) × passes codegen replace calls,
    zero Python, zero shuffle — scan-speed on any cluster size)."""
    out = text
    for _ in range(passes):
        for moji, ch in MOJIBAKE_TABLE:
            out = F.replace(out, F.lit(moji), F.lit(ch))
    return out


def fix_mojibake_py(s: str, passes: int = 1) -> str:
    """Pure-Python mirror (tests / driver-side strings)."""
    for _ in range(passes):
        for moji, ch in MOJIBAKE_TABLE:
            s = s.replace(moji, ch)
    return s


def fix_mojibake_sql(expr: str, passes: int = 1) -> str:
    """DuckDB mirror: the identical replace chain, nested inside-out."""
    def q(s: str) -> str:
        return "'" + s.replace("'", "''") + "'"

    out = expr
    for _ in range(passes):
        for moji, ch in MOJIBAKE_TABLE:
            out = f"replace({out}, {q(moji)}, {q(ch)})"
    return out


def mojibake_stats_df(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    passes: int = 1,
) -> DataFrame:
    """Per-doc encoding-damage ledger: (id, text_fixed, changed,
    n_chars_fixed). ``n_chars_fixed`` = length shrink (every repair
    collapses a 2-3 char moji sequence to 1 char), the corpus-level
    mojibake-rate numerator. Pure scan projection."""
    t = F.col(text_col)
    fixed = fix_mojibake(t, passes)
    return df.select(
        F.col(id_col),
        fixed.alias("text_fixed"),
        (t != fixed).alias("changed"),
        (F.length(t) - F.length(fixed)).cast("long").alias("n_chars_fixed"),
    )


# UTS #39-style confusable subset: the Cyrillic/Greek letters that render
# identically to Latin in most fonts — the homoglyph alphabet of phishing
# hosts ("pаypal" with U+0430) and cloaked spam. Single-char map so BOTH
# engines apply it with one translate(); order is paired positionally.
CONFUSABLE_FROM = "аеорсхуіѕјԛѡαον"   # 12 Cyrillic + 3 Greek
CONFUSABLE_TO = "aeopcxyisjqwaov"


def homoglyph_skeleton(col: Column) -> Column:
    """Confusable skeleton (UTS #39 idea, single-char subset): map
    Latin-lookalike Cyrillic/Greek letters onto their Latin twins so
    visually-identical strings compare equal. Pure JVM translate."""
    return F.translate(col, CONFUSABLE_FROM, CONFUSABLE_TO)


def homoglyph_stats_df(
    df: DataFrame,
    id_col: str,
    text_col: str,
) -> DataFrame:
    """Per-document homoglyph-spam accounting — the signal that catches
    content disguised from exact/shingle dedup and keyword filters by
    swapping Latin letters for Cyrillic/Greek twins (classic cloaking
    and phishing-lure trick; ASCII-only prose scores 0 everywhere):

    - n_confusables: count of confusable characters;
    - n_mixed_tokens: tokens mixing a Latin letter with a confusable in
      EITHER order — legitimate all-Cyrillic text does NOT fire this,
      "pаypal" does;
    - skeleton_hash: portable md5-56 of the skeletonized lowercase text
      — dedup on it to catch homoglyph-disguised duplicates that defeat
      every byte-level hash.

    Pure scan projection: one lower, one translate, one
    regexp_extract_all — zero shuffles, zero Python, fully codegen."""
    low = F.lower(F.col(text_col))
    skel = homoglyph_skeleton(low)
    cf = CONFUSABLE_FROM
    mixed_re = (f"[^ \\t\\n]*(?:[a-z][^ \\t\\n]*[{cf}]"
                f"|[{cf}][^ \\t\\n]*[a-z])[^ \\t\\n]*")
    return df.select(
        F.col(id_col),
        (F.length(low) - F.length(F.translate(low, cf, "")))
        .cast("long").alias("n_confusables"),
        F.size(F.regexp_extract_all(low, F.lit(mixed_re), 0))
        .cast("long").alias("n_mixed_tokens"),
        hash56(skel).alias("skeleton_hash"),
    )


def mixed_lang_stats(
    df: DataFrame,
    id_col: str,
    text_col: str,
    dominant_min_ppm: int = 900_000,
) -> DataFrame:
    """Per-LINE language ID rolled up to a document code-switching
    profile — the CCNet practice (Wenzek et al. 2020 run langid per
    paragraph precisely because crawled pages splice languages:
    boilerplate in one, content in another, spam in three). Each
    non-blank line gets the marker-word argmax (same scorer and
    ascending-language tie-break as ``langid``; zero marker hits →
    unknown), then ONE groupBy(doc, line_lang) + ONE groupBy(doc):

    - n_lines / n_unknown_lines;
    - n_langs: distinct languages among scored lines;
    - dominant_lang / dominant_ppm: majority language and its share of
      scored lines (argmax, ties to the ascending-first language via
      min(struct(-count, lang)) — the cross-engine-safe argmax);
    - mixed: n_langs ≥ 2 AND dominant_ppm < ``dominant_min_ppm`` — the
      code-switching flag a monolingual filter should route to
      per-SEGMENT extraction instead of dropping the whole doc.

    Docs with no scored lines keep a row (dominant NULL). Line arrays
    are bounded per row; both shuffles move (doc_id, lang, count)."""
    lines = df.select(
        F.col(id_col).alias("_id"),
        F.explode(F.split(F.col(text_col), "\n")).alias("_line"),
    ).where(F.trim(F.col("_line")) != "")
    ltoks = tokens(F.col("_line"))

    def score(ws: list[str]) -> Column:
        return F.size(F.filter(ltoks, lambda t: t.isin(ws)))

    scores = {lang: score(ws) for lang, ws in LANG_MARKERS.items()}
    ordered = sorted(scores)
    best_lang = F.lit(ordered[0])
    best_score = scores[ordered[0]]
    for lang in ordered[1:]:
        better = scores[lang] > best_score
        best_lang = F.when(better, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(better, scores[lang]).otherwise(best_score)
    scored = lines.select(
        "_id",
        F.when(best_score > 0, best_lang).alias("_lang"),
    )
    g1 = scored.groupBy("_id", "_lang").agg(
        F.count(F.lit(1)).cast("long").alias("_cnt"))
    dom = F.min(F.when(F.col("_lang").isNotNull(),
                       F.struct((-F.col("_cnt")).alias("nc"),
                                F.col("_lang").alias("lg"))))
    g2 = g1.groupBy("_id").agg(
        F.sum("_cnt").cast("long").alias("n_lines"),
        F.coalesce(F.sum(F.when(F.col("_lang").isNull(), F.col("_cnt"))),
                   F.lit(0)).cast("long").alias("n_unknown_lines"),
        F.count(F.when(F.col("_lang").isNotNull(), 1))
        .cast("long").alias("n_langs"),
        dom.alias("_dom"),
    )
    n_scored = F.col("n_lines") - F.col("n_unknown_lines")
    dom_cnt = -F.col("_dom.nc")
    dom_ppm = F.when(
        n_scored > 0, F.floor(dom_cnt * 1_000_000 / n_scored)).cast("long")
    out = g2.select(
        F.col("_id"), "n_lines", "n_unknown_lines", "n_langs",
        F.col("_dom.lg").alias("dominant_lang"),
        dom_ppm.alias("dominant_ppm"),
        ((F.col("n_langs") >= 2)
         & F.coalesce(dom_ppm < dominant_min_ppm, F.lit(False)))
        .alias("mixed"),
    )
    base = df.select(F.col(id_col).alias("_id")).distinct()
    return base.join(out, "_id", "left").select(
        F.col("_id").alias(id_col),
        *[F.coalesce(c, F.lit(0)).alias(c)
          for c in ["n_lines", "n_unknown_lines", "n_langs"]],
        "dominant_lang", "dominant_ppm",
        F.coalesce("mixed", F.lit(False)).alias("mixed"),
    )


# Code keywords for the code-vs-prose router: chosen to be common across
# C/Java/Python/JS but RARE in English prose (no bare if/for/else). With
# \b on both sides exactly ONE alternative can match at any start (a
# shorter prefix alternative would have to end inside a word — not a
# boundary), so Java-greedy and RE2-longest counts agree — the same
# single-match argument documented for the homoglyph mixed-token regex.
CODE_KEYWORDS = (
    "function", "namespace", "println", "typedef", "import", "lambda",
    "printf", "public", "return", "static", "struct", "class", "const",
    "endif", "elif", "void", "def", "var",
)
CODE_KEYWORD_RE = r"\b(" + "|".join(CODE_KEYWORDS) + r")\b"
CAMEL_RE = r"\b[a-z][a-z0-9]*[A-Z][A-Za-z0-9]*\b"
SNAKE_RE = r"\b[a-z][a-z0-9]*(_[a-z0-9]+)+\b"
BRACE_CHARS = "{}()[];"


def code_detect_df(
    df: DataFrame, id_col: str, text_col: str
) -> DataFrame:
    """Code-vs-prose routing — the signal Gopher throws away (its
    ``has_brace`` rule DROPS anything code-shaped; ``webtext_filters``)
    and a code-corpus pipeline (The Stack / StarCoder lineage) needs to
    KEEP and route. One pure-codegen scan, no Python, no joins:

    - semi_end_ppm / indent_ppm: share of non-blank lines ending in
      ``;``/``{``/``}`` resp. starting with a tab or ≥4 spaces;
    - brace_ppm: ``{}()[];`` chars per million chars (translate, not
      regex);
    - n_keywords: whole-word hits of 18 cross-language keywords chosen
      to be rare in prose (``CODE_KEYWORDS``; case-sensitive);
    - n_camel / n_snake: camelCase and snake_case identifier counts —
      prose has essentially none, code of either bracing style has many;
    - is_code: ≥2 of the five families fire (line endings, indentation,
      brace density, keywords, identifiers). A voting rule is robust to
      single-family spoofs (a legal document full of ``(a)(b)`` subsection
      markers fires brace density alone and stays prose).

    All ratios exact-integer ppm; every regex is Java∩RE2-safe and the
    DuckDB oracle shares it verbatim. Scale shape: scan projection only
    — the line split is per-row bounded, nothing shuffles."""
    t = F.col(text_col)
    lines = F.filter(F.split(t, "\n"), lambda l: F.trim(l) != "")
    n_lines = F.size(lines)
    nl1 = F.greatest(n_lines, F.lit(1))
    semi_end = F.size(F.filter(lines, lambda l: l.rlike(r"[;{}]\s*$")))
    indent = F.size(F.filter(lines, lambda l: l.rlike(r"^(\t| {4})")))
    len1 = F.greatest(F.length(t), F.lit(1))
    n_brace = F.length(t) - F.length(
        F.translate(t, BRACE_CHARS, ""))
    n_kw = F.regexp_count(t, F.lit(CODE_KEYWORD_RE))
    n_camel = F.regexp_count(t, F.lit(CAMEL_RE))
    n_snake = F.regexp_count(t, F.lit(SNAKE_RE))
    semi_ppm = F.floor(semi_end * 1_000_000 / nl1).cast("long")
    indent_ppm = F.floor(indent * 1_000_000 / nl1).cast("long")
    brace_ppm = F.floor(n_brace * 1_000_000 / len1).cast("long")
    votes = (
        (semi_ppm >= 150_000).cast("int")
        + (indent_ppm >= 300_000).cast("int")
        + (brace_ppm >= 20_000).cast("int")
        + (n_kw >= 3).cast("int")
        + (n_camel + n_snake >= 3).cast("int")
    )
    return df.where(t.isNotNull()).select(
        F.col(id_col),
        n_lines.cast("long").alias("n_lines"),
        semi_ppm.alias("semi_end_ppm"),
        indent_ppm.alias("indent_ppm"),
        brace_ppm.alias("brace_ppm"),
        n_kw.cast("long").alias("n_keywords"),
        n_camel.cast("long").alias("n_camel"),
        n_snake.cast("long").alias("n_snake"),
        (votes >= 2).cast("long").alias("is_code"),
    )


def collocations(
    df: DataFrame,
    text_col: str,
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Top-k collocations (adjacent word pairs) ranked by LIFT —
    n_ab·N/(n_a·n_b), the log-free monotone surrogate for PMI (ln
    differs in the last ulp across engines; ranking needs only the
    ratio) — the phrase-mining step that feeds tokenizer vocab
    seeding and boilerplate-phrase lists.

    Output: ``(w1, w2, n_ab, n_w1, n_w2, lift_ppm, rnk)``, rnk 1..k,
    ties broken lexicographically.

    Plan: unigram and bigram explodes each collapse in ONE
    map-side-combinable groupBy; the ``min_count`` floor is applied to
    the bigram table BEFORE the two unigram joins (the long tail —
    most of any corpus's bigram mass — never reaches a join); the
    join keys are vocabulary words (hot-word fan-out is bounded by
    that word's distinct neighbors); top-k is orderBy+limit
    (TakeOrderedAndProject — per-partition top-k, never a global
    window; the rank window runs over the k survivors). lift_ppm =
    floor(n_ab·N·10⁶/(n_w1·n_w2)) in doubles with one shared op
    order — bit-stable cross-engine.
    """
    from jsonschema_spark.operators.dedup import span_grams, tokens
    from pyspark.sql.window import Window

    t = F.col(text_col)
    uni = (
        df.select(F.explode(tokens(t)).alias("_w"))
        .groupBy("_w").agg(F.count(F.lit(1)).cast("long").alias("_n"))
    )
    tot = uni.agg(F.sum("_n").cast("long").alias("_N"))
    bi = (
        df.select(F.explode(span_grams(t, 2)).alias("_g"))
        .groupBy("_g").agg(F.count(F.lit(1)).cast("long").alias("n_ab"))
        .where(F.col("n_ab") >= min_count)
    )
    sp = F.split(F.col("_g"), " ")
    bi2 = bi.select(sp.getItem(0).alias("w1"),
                    sp.getItem(1).alias("w2"), "n_ab")
    a = uni.select(F.col("_w").alias("w1"), F.col("_n").alias("n_w1"))
    b = uni.select(F.col("_w").alias("w2"), F.col("_n").alias("n_w2"))
    j = bi2.join(a, "w1").join(b, "w2").crossJoin(F.broadcast(tot))
    lift = F.floor(
        F.col("n_ab").cast("double") * F.col("_N") * F.lit(1_000_000.0)
        / (F.col("n_w1").cast("double") * F.col("n_w2"))
    ).cast("long")
    scored = j.select("w1", "w2", "n_ab", "n_w1", "n_w2",
                      lift.alias("lift_ppm"))
    top = scored.orderBy(F.col("lift_ppm").desc(), "w1", "w2").limit(k)
    w = Window.orderBy(F.col("lift_ppm").desc(), "w1", "w2")
    return top.withColumn("rnk",
                          F.row_number().over(w).cast("long"))


def corpus_diff_terms(
    df: DataFrame,
    text_col: str,
    split: Column,
    min_count: int = 5,
    k: int = 20,
) -> DataFrame:
    """Terms that DISTINGUISH one sub-corpus from another (split true
    = side A): per token, add-one-smoothed rate ratio

    ``ratio_ppm = floor(10⁶·(n_a+1)·(N_b+V) / ((n_b+1)·(N_a+V)))``

    (V = vocabulary size — the Dirichlet-smoothed relative rate, the
    log-odds ranking without the log: the ratio is a monotone
    surrogate, and every input is an exact integer so the double
    formula is one shared op order). Top-k by ratio, ties on token.
    The "what words make source A different" lens for corpus QA and
    contamination triage.

    ONE corpus exchange: a single conditional-sum groupBy(token)
    computes both sides' counts; totals and V fold to one broadcast
    row; ``min_count`` (on the A side) prunes before ranking; top-k
    is orderBy+limit, rank over survivors.
    """
    from jsonschema_spark.operators.dedup import tokens
    from pyspark.sql.window import Window

    g = (
        df.select(split.alias("_sp"),
                  F.explode(tokens(F.col(text_col))).alias("_w"))
        .groupBy("_w")
        .agg(F.sum(F.when(F.col("_sp"), 1).otherwise(0)).cast("long")
             .alias("n_a"),
             F.sum(F.when(F.col("_sp"), 0).otherwise(1)).cast("long")
             .alias("n_b"))
    )
    tots = g.agg(F.sum("n_a").cast("long").alias("_na"),
                 F.sum("n_b").cast("long").alias("_nb"),
                 F.count(F.lit(1)).cast("long").alias("_v"))
    j = g.where(F.col("n_a") >= min_count) \
        .crossJoin(F.broadcast(tots))
    ratio = F.floor(
        (F.col("n_a") + 1).cast("double")
        * (F.col("_nb") + F.col("_v")) * F.lit(1_000_000.0)
        / ((F.col("n_b") + 1).cast("double")
           * (F.col("_na") + F.col("_v")))
    ).cast("long")
    scored = j.select(F.col("_w").alias("token"), "n_a", "n_b",
                      ratio.alias("ratio_ppm"))
    top = scored.orderBy(F.col("ratio_ppm").desc(), "token").limit(k)
    w = Window.orderBy(F.col("ratio_ppm").desc(), "token")
    return top.withColumn("rnk", F.row_number().over(w).cast("long"))


def vocab_growth(
    df: DataFrame,
    ts_col: str,
    text_col: str,
    unit: str = "day",
) -> DataFrame:
    """Vocabulary growth curve: per calendar bucket, total token
    occurrences and the count of token TYPES never seen in any
    earlier bucket — the Heaps-law-over-time freshness lens ("is this
    crawl still discovering language, or re-reading the same pages?").
    Output per bucket (zero-filled calendar spine):

    ``(bucket, n_tokens, n_new_types)``

    Two exchanges, both map-side-combinable: (bucket) for occurrence
    totals and (token) for first-seen minima — a token's first bucket
    is a pure min, so the computation is partition-order free; no
    corpus-sized state ever sits on one node.
    """
    if unit not in ("day", "week", "month"):
        raise ValueError("unit must be day|week|month")
    from jsonschema_spark.operators.dedup import tokens

    b = F.to_date(F.date_trunc(unit, F.col(ts_col)))
    ex = df.where(F.col(ts_col).isNotNull()).select(
        b.alias("_b"), F.explode(tokens(F.col(text_col))).alias("_w"))
    occ = ex.groupBy("_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_tokens"))
    first = ex.groupBy("_w").agg(F.min("_b").alias("_b"))
    new_types = first.groupBy("_b").agg(
        F.count(F.lit(1)).cast("long").alias("n_new_types"))
    rng = occ.agg(F.min("_b").alias("_lo"), F.max("_b").alias("_hi"))
    step = {"day": "interval 1 day", "week": "interval 1 week",
            "month": "interval 1 month"}[unit]
    spine = rng.select(F.explode(F.sequence(
        F.col("_lo"), F.col("_hi"), F.expr(step))).alias("_b"))
    return (
        spine.join(occ, "_b", "left").join(new_types, "_b", "left")
        .select(
            F.date_format("_b", "yyyy-MM-dd").alias("bucket"),
            F.coalesce(F.col("n_tokens"), F.lit(0)).cast("long")
            .alias("n_tokens"),
            F.coalesce(F.col("n_new_types"), F.lit(0)).cast("long")
            .alias("n_new_types"),
        )
    )
