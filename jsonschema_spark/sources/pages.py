"""Deterministic Common-Crawl-style pages table (the graft input shape).

Synthesizes `(url:string, warc_ts:timestamp, html:binary, text:string,
lang:string)` per FIXTURES.md §1 — planted violation rates, one Zipf-hot
host for skew exercises, duplicate urls for uniqueness checks, multi-byte
text for code-point-length traps — entirely as Column expressions over
``spark.range``: no driver-side data, no RNG state. Every value is a pure
hash of the row id (xxhash64), so any scale factor regenerates identically
and the generator itself scales to 10^12 rows (range is split across
partitions; each partition generates independently).

The per-row invariant target (BASELINE.json input_hint): ``text`` is
byte-identical to what ``extract_text(html)`` recovers — html embeds text
between fixed tags, and extraction strips them with byte-exact slicing.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

WORDS = [
    "the", "fast", "key", "order", "sort", "table", "scan", "merge", "part",
    "window", "small", "hash", "join", "batch", "stream", "spark", "data",
    "query", "row", "slow", "filter", "customer", "line", "value", "column",
    "big", "agg", "group", "vector", "café", "中文", "naïve",
]

LANGS = ["en", "de", "fr", "es", "zh", "ru", "pt", "ja", "it", "nl"]
BAD_LANGS = ["zz", "en_US", ""]

EPOCH_LO = 1356998400  # 2013-01-01
EPOCH_HI = 1785542400  # 2026-08-01
HTML_PRE = "<html><body>"
HTML_POST = "</body></html>"


def _h(seed: int, col: Column) -> Column:
    return F.abs(F.xxhash64(col, F.lit(seed)))


def pages_df(spark: SparkSession, n_rows: int, num_partitions: int | None = None) -> DataFrame:
    """Generate the pages table. Deterministic in (n_rows) only."""
    base = spark.range(0, n_rows, numPartitions=num_partitions)
    i = F.col("id")

    # ~0.5% duplicate urls: those rows borrow the previous row's url seed
    dup = (i % 200 == 199) & (i > 0)
    url_seed = F.when(dup, i - 1).otherwise(i)

    # Zipf-ish hosts: ~20% of rows on one hot host (skew target)
    hh = _h(1, url_seed)
    host = (
        F.when(hh % 100 < 20, F.lit("hot.example.com"))
        .otherwise(F.concat(F.lit("host-"), (hh % 5000).cast("string"), F.lit(".example.org")))
    )
    good_url = F.concat(F.lit("https://"), host, F.lit("/p/"), F.hex(_h(2, url_seed)))
    # ~1% malformed urls (no scheme / embedded space)
    malformed = _h(3, url_seed) % 1000 < 10
    url = F.when(
        malformed,
        F.concat(F.lit("not a scheme/"), (_h(2, url_seed) % 100000).cast("string")),
    ).otherwise(good_url)

    # warc_ts: uniform in window; ~0.3% null; ~0.2% out of range (1970/2099)
    tsel = _h(4, i) % 1000
    epoch = EPOCH_LO + (_h(5, i) % (EPOCH_HI - EPOCH_LO))
    warc_ts = (
        F.when(tsel < 3, F.lit(None).cast("long"))
        .when(tsel < 4, F.lit(18000000))     # 1970-08
        .when(tsel < 5, F.lit(4070908800))   # 2099-01
        .otherwise(epoch)
    ).cast("timestamp")

    # text: hash-chosen words, ~1% empty, ~0.5% null; multi-byte words included
    n_words = _h(6, i) % 180 + 3
    words_arr = F.array(*[F.lit(w) for w in WORDS])
    body = F.array_join(
        F.transform(
            F.sequence(F.lit(1), n_words),
            lambda k: F.element_at(words_arr, (F.abs(F.xxhash64(i, k, F.lit(7))) % len(WORDS) + 1).cast("int")),
        ),
        " ",
    )
    xsel = _h(8, i) % 1000
    text = (
        F.when(xsel < 5, F.lit(None).cast("string"))
        .when(xsel < 15, F.lit(""))
        .otherwise(body)
    )

    html = F.when(
        text.isNotNull(),
        F.encode(F.concat(F.lit(HTML_PRE), text, F.lit(HTML_POST)), "UTF-8"),
    ).otherwise(F.lit(None).cast("binary"))

    lsel = _h(9, i) % 1000
    lang = (
        F.when(lsel < 4, F.lit(BAD_LANGS[0]))
        .when(lsel < 7, F.lit(BAD_LANGS[1]))
        .when(lsel < 10, F.lit(BAD_LANGS[2]))
        .otherwise(
            F.element_at(
                F.array(*[F.lit(lg) for lg in LANGS]),
                (_h(10, i) % len(LANGS) + 1).cast("int"),
            )
        )
    )

    return base.select(
        url.alias("url"),
        warc_ts.alias("warc_ts"),
        html.alias("html"),
        text.alias("text"),
        lang.alias("lang"),
    )


def extract_text(html_col: Column) -> Column:
    """Recover the extracted text from the html payload, byte-exact.

    The per-row invariant (BASELINE.json input_hint): this must be
    byte-identical to the stored ``text`` per url. Pure JVM slicing —
    decode, strip the fixed wrapper."""
    decoded = F.decode(html_col, "UTF-8")
    return F.substring(
        decoded,
        len(HTML_PRE) + 1,
        F.length(decoded) - len(HTML_PRE) - len(HTML_POST),
    ).cast("string")


WEBPAGE_SCHEMA = {
    "$schema": "https://json-schema.org/draft/2020-12/schema",
    "$id": "https://example.com/webpage.schema.json",
    "type": "object",
    "required": ["url", "warc_ts", "text", "lang"],
    "properties": {
        "url": {"type": "string", "format": "uri", "pattern": "^https?://", "maxLength": 2048},
        "warc_ts": {"type": "string", "format": "date-time"},
        "html": {"type": "string"},
        "text": {"type": "string", "minLength": 1, "maxLength": 1000000},
        "lang": {"type": "string", "enum": LANGS},
    },
    "additionalProperties": False,
}
