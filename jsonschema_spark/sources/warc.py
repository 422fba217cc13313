"""WARC (ISO 28500) record extraction — Common-Crawl-style ingestion.

The north-star input is "Common-Crawl-style web pages"; the archive
format those arrive in is WARC: concatenated records, each a header block
(``WARC/1.0`` version line + ``Name: value`` lines) and a payload,
separated by a blank line, records separated by two CRLFs. This module
turns a column of WARC-file text into one row per record, two ways:

- ``warc_records(..., exact=False)`` — the JVM fast path: ONE regex
  lookahead split on the record boundary + per-record header extraction,
  all inside the scan projection (zero Python). CAVEAT: a payload that
  itself contains a line starting ``WARC/1.0`` splits early — the
  classic delimiter-in-payload hazard. Fine for response-HTML crawls
  (servers don't emit WARC version lines mid-page); not fine for
  warc-inside-warc archives.
- ``warc_records(..., exact=True)`` — the Content-Length-aware parser
  the WARC spec actually prescribes: walk the file slicing each payload
  by its declared byte length, so payload bytes are NEVER scanned for
  delimiters. One Arrow-batched ``mapInPandas`` pass; per-row work is a
  linear scan of the file. The walk operates on the UTF-8 BYTES of the
  file (Content-Length is a byte count, not a character count), so
  non-ASCII payloads frame correctly and never desync later records.
  This is the path for untrusted archives; the unit suite proves both
  paths agree on well-formed files and that ONLY the exact path
  survives a payload containing a WARC version line.

Both paths tolerate malformed records (missing headers → NULL fields,
never a task-killing error — one bad record must not fail a 100 TB
scan). Record offsets are per-file indexes, so downstream operators can
cite (file_id, rec_idx) lineage the way CC indexes cite (warc, offset).

Scale shape: both paths are per-row projections — no shuffle; files are
the unit of parallelism (CC ships ~1 GB WARCs; repartition by file count
upstream). Reference framing: sourcemeta/jsonschema reads JSON/JSONL
only (SURVEY.md §1.3); this is engine-side source surface for the graft
input table.
"""
from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import LongType, StringType, StructField, StructType

# split keeps the delimiter with the NEXT element (lookahead, zero-width)
_REC_SPLIT = r"(?=WARC/1\.[01]\r?\n)"
_HDR_BODY_SPLIT = r"\r?\n\r?\n"


def _hdr(headers: Column, name: str) -> Column:
    v = F.regexp_extract(headers, rf"(?mi)^{name}:[ \t]*([^\r\n]*)", 1)
    return F.when(v != "", F.trim(v))


_FIELDS = [
    ("warc_type", "WARC-Type"),
    ("target_uri", "WARC-Target-URI"),
    ("warc_date", "WARC-Date"),
    ("record_id", "WARC-Record-ID"),
]

_OUT_SCHEMA = StructType(
    [
        StructField("file_id", LongType()),
        StructField("rec_idx", LongType()),
        StructField("warc_type", StringType()),
        StructField("target_uri", StringType()),
        StructField("warc_date", StringType()),
        StructField("record_id", StringType()),
        StructField("content_length", LongType()),
        StructField("payload", StringType()),
    ]
)


def warc_records(
    df: DataFrame,
    id_col: str = "file_id",
    text_col: str = "warc",
    exact: bool = False,
) -> DataFrame:
    """Explode WARC-file text into records.

    Output: (file_id, rec_idx, warc_type, target_uri, warc_date,
    record_id, content_length, payload) — header fields NULL when
    absent; ``payload`` excludes the record-separator blank lines. The
    JVM path trims the payload to ``content_length`` CHARACTERS when the
    header is present (an ASCII chars == bytes assumption — on
    non-ASCII payloads its slice is approximate, which is acceptable
    because its framing is the delimiter split, not the length). The
    exact path slices real BYTE counts, as the spec prescribes. A
    malformed Content-Length (non-numeric, overflowing) yields NULL
    ``content_length`` and the delimiter-framed payload on both paths —
    never a task-killing ANSI cast error.
    """
    if exact:
        return _warc_records_exact(df, id_col, text_col)
    recs = df.select(
        F.col(id_col).alias("file_id"),
        F.posexplode(F.split(F.col(text_col), _REC_SPLIT)).alias("_i", "_rec"),
    ).where(F.col("_rec").rlike(r"^WARC/1\.[01]\r?\n"))
    # rec_idx must count RECORDS, not split slots (slot 0 is any garbage
    # before the first version line) — renumber per file
    from pyspark.sql.window import Window

    w = Window.partitionBy("file_id").orderBy("_i")
    parts = F.split("_rec", _HDR_BODY_SPLIT, 2)
    hdrs = F.element_at(parts, 1)
    raw_payload = F.regexp_replace(
        F.coalesce(F.element_at(parts, 2), F.lit("")), r"(\r?\n)+$", ""
    )
    # try_cast: 'Content-Length: abc' or a >int64 value must yield NULL,
    # not an ANSI CAST_INVALID_INPUT that kills the whole 100 TB scan
    cl = _hdr(hdrs, "Content-Length").try_cast("long")
    # substr length is int-typed: clamp before the narrowing cast
    cl_len = F.least(cl, F.lit(2147483647)).try_cast("int")
    return (
        recs.withColumn("rec_idx", F.row_number().over(w).cast("long") - 1)
        .select(
            "file_id",
            "rec_idx",
            *[_hdr(hdrs, h).alias(n) for n, h in _FIELDS],
            cl.alias("content_length"),
            F.when(cl.isNotNull(), raw_payload.substr(F.lit(1), cl_len))
            .otherwise(raw_payload)
            .alias("payload"),
        )
    )


def _warc_records_exact(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Content-Length-aware record walk (the spec's framing): payload
    BYTES are sliced by declared length, never scanned for delimiters.

    The walk runs over the file's UTF-8 bytes — WARC Content-Length is a
    byte count, so a character-indexed slice would over-read any
    non-ASCII payload and desync framing for every subsequent record.
    Header names/values and payloads are decoded back to str
    (errors='replace') for the string output schema; a well-formed
    record's payload slice ends on a record boundary, so the decode is
    lossless there.
    """
    import re

    hdr_re = re.compile(rb"^([A-Za-z0-9-]+):[ \t]*(.*?)\r?$")
    ver_re = re.compile(rb"WARC/1\.[01]\r?\n")
    blank_re = re.compile(rb"\r?\n\r?\n")
    sep_ver_re = re.compile(rb"\r?\n\r?\nWARC/1\.[01]\r?\n")
    tail_nl_re = re.compile(rb"(\r?\n)+$")

    def parse_file(fid, text):
        data = text.encode("utf-8", "surrogatepass")
        pos, idx = 0, 0
        n = len(data)
        while pos < n:
            m = ver_re.match(data, pos)
            if not m:
                nxt = ver_re.search(data, pos)
                if not nxt:
                    return
                pos = nxt.start()
                continue
            hdr_end = blank_re.search(data, m.end())
            if not hdr_end:
                return
            fields = {}
            for line in data[m.end():hdr_end.start()].split(b"\n"):
                hm = hdr_re.match(line)
                if hm:
                    fields[hm.group(1).decode("ascii", "replace").lower()] = (
                        hm.group(2).strip().decode("utf-8", "replace")
                    )
            cl = fields.get("content-length")
            cl_i = int(cl) if cl is not None and cl.isdigit() else None
            if cl_i is not None and cl_i > 0x7FFFFFFFFFFFFFFF:
                # mirror the JVM try_cast('long'): an out-of-long-range
                # length is malformed, not a license to swallow the file
                cl_i = None
            body_start = hdr_end.end()
            if cl_i is not None:
                payload = data[body_start:body_start + cl_i]
                pos = body_start + cl_i
            else:  # malformed: fall back to next version line
                nxt = sep_ver_re.search(data, body_start)
                end = nxt.start() if nxt else n
                # mirror the JVM path: no declared length -> payload ends
                # at the separator, trailing newline runs stripped
                payload = tail_nl_re.sub(b"", data[body_start:end])
                pos = end
            yield (fid, idx,
                   fields.get("warc-type"), fields.get("warc-target-uri"),
                   fields.get("warc-date"), fields.get("warc-record-id"),
                   cl_i, payload.decode("utf-8", "replace"))
            idx += 1

    def run(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for fid, text in zip(pdf["_fid"], pdf["_txt"]):
                if text is not None:
                    rows.extend(parse_file(fid, text))
            yield pd.DataFrame(
                rows, columns=[f.name for f in _OUT_SCHEMA.fields]
            )

    src = df.select(F.col(id_col).alias("_fid"), F.col(text_col).alias("_txt"))
    return src.mapInPandas(run, _OUT_SCHEMA)


# --- WET serialization (the Common-Crawl extracted-text sink) ------------


def wet_record(uri: Column, text: Column, date: Column | None = None) -> Column:
    """One WET ``conversion`` record string (the Common-Crawl WET shape):
    version line, WARC-Type/Target-URI[/Date]/Content-Type headers, a
    Content-Length counted in BYTES (octet_length — the spec's octet
    count, not chars; DuckDB's strlen mirrors it exactly), blank line,
    payload, record separator. Pure codegen concat — the engine WRITES
    the same exchange format ``warc_records`` reads, so a WET export
    round-trips through the exact (byte-walk) parser by construction."""
    parts = [
        F.lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: "),
        uri,
    ]
    if date is not None:
        parts += [F.lit("\r\nWARC-Date: "), date]
    parts += [
        F.lit("\r\nContent-Type: text/plain\r\nContent-Length: "),
        F.octet_length(text).cast("string"),
        F.lit("\r\n\r\n"), text, F.lit("\r\n\r\n"),
    ]
    return F.concat(*parts)


def wet_serialize_df(
    df: DataFrame,
    id_col: str,
    uri_col: str,
    text_col: str,
    date_col: str | None = None,
) -> DataFrame:
    """Per-page WET records: (id, wet, n_payload_bytes). Group into
    shard files downstream with curate.shard_assign + concat — record
    strings are self-framing, so any grouping is valid WET. NULL text
    serializes as an empty payload (Content-Length: 0), never an error."""
    text = F.coalesce(F.col(text_col), F.lit(""))
    return df.select(
        F.col(id_col),
        wet_record(F.col(uri_col), text,
                   F.col(date_col) if date_col else None).alias("wet"),
        F.octet_length(text).cast("long").alias("n_payload_bytes"),
    )
