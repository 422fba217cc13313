"""Multimodal columns — opaque binary payloads with typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns plus a
``map<string,string>`` metadata column; feature extraction runs as
Arrow-batched ``mapInPandas`` (whole-partition iterator — one Python
round-trip per batch, not per row). Three decoder tiers:

- ``decoder="headers"`` — REAL pure-Python container-header parsers
  (PNG IHDR, GIF logical screen, JPEG SOF, WAV RIFF fmt/data chunks,
  MP4 ISO-BMFF mvhd/tkhd): dimensions, duration, sample rate and channel
  count extracted by byte parsing, no pillow/ffmpeg needed. This is the
  production metadata path — at 100 TB you want header fields without
  decoding pixels.
- ``decoder="stub"`` — deterministic fake derived from the payload digest
  (kept for plumbing tests that feed non-media bytes).
- ``decoder="pixels"`` — raises NotImplementedError at the exact seam
  where a pillow/ffmpeg PIXEL-level call (resize, frame extraction)
  plugs in; those libraries are not in this container.
"""

from __future__ import annotations

import hashlib
import struct
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, functions as F, types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),  # image | audio | video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType(), False),
        T.StructField("kind", T.StringType(), False),
        T.StructField("format", T.StringType(), True),
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("sample_rate_hz", T.IntegerType(), True),
        T.StructField("channels", T.IntegerType(), True),
    ]
)

_NO_FEATURES = {"format": None, "width": None, "height": None,
                "duration_ms": None, "sample_rate_hz": None, "channels": None}


# ---------------------------------------------------------------------------
# Pure-Python container-header parsers (the "headers" decoder tier).
# Each consumes raw bytes and reads ONLY the container header — no pixel /
# sample decode, so a truncated-after-header payload (common in crawled
# corpora) still yields its metadata.
# ---------------------------------------------------------------------------


def parse_image_header(b: bytes) -> Optional[dict]:
    """PNG (IHDR), GIF (logical screen descriptor) or JPEG (SOF frame
    header) dimensions; None when the signature matches no format."""
    if b[:8] == b"\x89PNG\r\n\x1a\n" and len(b) >= 24 and b[12:16] == b"IHDR":
        w, h = struct.unpack(">II", b[16:24])
        return {"format": "png", "width": w, "height": h}
    if b[:6] in (b"GIF87a", b"GIF89a") and len(b) >= 10:
        w, h = struct.unpack("<HH", b[6:10])
        return {"format": "gif", "width": w, "height": h}
    if b[:2] == b"\xff\xd8":
        i = 2
        while i + 4 <= len(b):
            if b[i] != 0xFF:
                i += 1
                continue
            marker = b[i + 1]
            if marker in (0x01, 0xD8, 0xD9) or 0xD0 <= marker <= 0xD7:
                i += 2          # parameterless markers
                continue
            if i + 4 > len(b):
                break
            seglen = struct.unpack(">H", b[i + 2:i + 4])[0]
            # SOF0..SOF15 except DHT(C4)/JPG(C8)/DAC(CC) carry dimensions:
            # [len][precision][height][width]...
            if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
                if i + 9 <= len(b):
                    h, w = struct.unpack(">HH", b[i + 5:i + 9])
                    return {"format": "jpeg", "width": w, "height": h}
                return None
            i += 2 + seglen
    return None


def parse_wav_header(b: bytes) -> Optional[dict]:
    """RIFF/WAVE chunk walk: fmt → channels/sample-rate/bit-depth, data →
    declared byte size. duration_ms = data_size / byte_rate (declared size,
    so truncated payloads still report their nominal duration)."""
    if len(b) < 12 or b[:4] != b"RIFF" or b[8:12] != b"WAVE":
        return None
    i, rate, ch, bits, data_sz = 12, None, None, None, None
    while i + 8 <= len(b):
        cid = b[i:i + 4]
        sz = struct.unpack("<I", b[i + 4:i + 8])[0]
        if cid == b"fmt " and sz >= 16 and i + 24 <= len(b):
            ch, rate = struct.unpack("<HI", b[i + 10:i + 16])
            bits = struct.unpack("<H", b[i + 22:i + 24])[0]
        elif cid == b"data":
            data_sz = sz
        i += 8 + sz + (sz & 1)   # chunks are word-aligned
    if rate and ch and bits and data_sz is not None:
        # sub-byte sample widths (e.g. 4-bit IMA ADPCM) give a zero
        # whole-byte rate — use bit-rate math so a real crawled file
        # can't divide-by-zero and kill the task
        bit_rate = rate * ch * bits
        if bit_rate <= 0:
            return None
        return {"format": "wav", "sample_rate_hz": rate, "channels": ch,
                "duration_ms": data_sz * 8 * 1000 // bit_rate}
    return None


def _iso_boxes(b: bytes, i: int, end: int):
    while i + 8 <= end:
        sz = struct.unpack(">I", b[i:i + 4])[0]
        if sz < 8 or i + sz > end:
            return
        yield b[i + 4:i + 8], i + 8, i + sz
        i += sz


def parse_mp4_header(b: bytes) -> Optional[dict]:
    """ISO-BMFF box walk: moov/mvhd → timescale+duration, moov/trak/tkhd →
    presentation width/height (16.16 fixed point)."""
    if len(b) < 12 or b[4:8] != b"ftyp":
        return None
    out = None
    for typ, s, e in _iso_boxes(b, 0, len(b)):
        if typ != b"moov":
            continue
        out = {"format": "mp4", "width": None, "height": None, "duration_ms": None}
        for t2, s2, e2 in _iso_boxes(b, s, e):
            if t2 == b"mvhd" and s2 + 20 <= e2:
                if b[s2] == 1 and s2 + 32 <= e2:   # version 1: 64-bit times
                    ts, dur = struct.unpack(">IQ", b[s2 + 20:s2 + 32])
                else:                               # version 0
                    ts, dur = struct.unpack(">II", b[s2 + 12:s2 + 20])
                if ts:
                    out["duration_ms"] = dur * 1000 // ts
            elif t2 == b"trak":
                for t3, s3, e3 in _iso_boxes(b, s2, e2):
                    if t3 == b"tkhd" and s3 + 84 <= e3:
                        w_fx, h_fx = struct.unpack(">II", b[e3 - 8:e3])
                        if w_fx and h_fx:
                            out["width"] = w_fx >> 16
                            out["height"] = h_fx >> 16
    return out


def parse_media_header(b: bytes) -> dict:
    """Dispatch on magic bytes; all-None features when no parser matches
    (unknown container is data, not an error, at corpus scale)."""
    got = parse_image_header(b) or parse_wav_header(b) or parse_mp4_header(b)
    return {**_NO_FEATURES, **got} if got else dict(_NO_FEATURES)


def _decode_stub(payload: bytes, kind: str) -> dict:
    """Deterministic fake decode: dimensions/duration derived from the
    payload digest. Replace with pillow/ffmpeg in `_decode_real`."""
    d = hashlib.sha256(payload).digest()
    if kind == "image":
        return {"width": 16 + d[0] % 64 * 16, "height": 16 + d[1] % 64 * 16, "duration_ms": None}
    if kind in ("audio", "video"):
        ms = 1000 + int.from_bytes(d[2:5], "big") % 600000
        w = 16 + d[0] % 64 * 16 if kind == "video" else None
        h = 16 + d[1] % 64 * 16 if kind == "video" else None
        return {"width": w, "height": h, "duration_ms": ms}
    return {"width": None, "height": None, "duration_ms": None}


def _decode_headers(payload: bytes, kind: str) -> dict:
    return parse_media_header(payload)


def _decode_pixels(payload: bytes, kind: str) -> dict:
    raise NotImplementedError(
        "pixel/sample-level decode (resize, frame extraction) requires "
        "pillow/ffmpeg — plug the library call in here; the surrounding "
        "Arrow batching, schema and partitioning are production-shaped"
    )


_DECODERS = {"stub": _decode_stub, "headers": _decode_headers,
             "pixels": _decode_pixels}


def extract_features(df: DataFrame, decoder: str = "stub") -> DataFrame:
    """Per-media features via mapInPandas (Arrow batches, zero per-row
    Python overhead beyond the decode call itself)."""
    decode = _DECODERS[decoder]

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                if payload is None:
                    feats.append({**_NO_FEATURES, "n_bytes": None, "sha": None})
                    continue
                b = bytes(payload)
                f = {**_NO_FEATURES, **decode(b, kind)}
                f["n_bytes"] = len(b)
                f["sha"] = hashlib.sha256(b).hexdigest()
                feats.append(f)
            fdf = pd.DataFrame(feats)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "format": fdf["format"],
                    "n_bytes": fdf["n_bytes"].astype("Int64"),
                    "sha": fdf["sha"],
                    "width": fdf["width"].astype("Int32"),
                    "height": fdf["height"].astype("Int32"),
                    "duration_ms": fdf["duration_ms"].astype("Int64"),
                    "sample_rate_hz": fdf["sample_rate_hz"].astype("Int32"),
                    "channels": fdf["channels"].astype("Int32"),
                }
            )

    return df.mapInPandas(run, FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Frame-sampling plan for video rows: one row per sampled timestamp
    (the decode of each frame is the stubbed seam). Demonstrates the
    explode-shaped plan: duration → sequence of sample offsets."""
    feats = extract_features(df.filter(F.col("kind") == "video"))
    return (
        feats.withColumn(
            "sample_ms",
            F.explode(F.sequence(F.lit(0), F.col("duration_ms"), F.lit(every_ms))),
        )
        .select("media_id", "sample_ms", "width", "height")
    )


# ---------------------------------------------------------------------------
# Deterministic media synthesis: REAL container headers whose fields are
# exact integer functions of media_id. The payload is genuine PNG/GIF/JPEG/
# WAV/MP4 header bytes (truncated after the header, like crawled media
# often is), so the "headers" decoder exercises real byte parsing while a
# SQL oracle can recompute every expected field arithmetically.
# ---------------------------------------------------------------------------

def synth_media_fields(media_id: int) -> dict:
    """The planted field values for ``synth_media_bytes(media_id)`` —
    keep in lockstep with the SQL mirror in __spark_entry__."""
    kind = ("image", "audio", "video")[media_id % 3]
    w = 16 + (media_id * 7) % 1000
    h = 16 + (media_id * 13) % 800
    ms = 100 + (media_id * 31) % 60000
    if kind == "image":
        fmt = ("png", "gif", "jpeg")[(media_id % 9) // 3]
        return {"kind": kind, "format": fmt, "width": w, "height": h,
                "duration_ms": None, "sample_rate_hz": None, "channels": None}
    if kind == "audio":
        rate = 8000 * (1 + media_id % 5)   # 8/16/24/32/40 kHz — all % 500 == 0
        ch = 1 + media_id % 2
        return {"kind": kind, "format": "wav", "width": None, "height": None,
                "duration_ms": ms, "sample_rate_hz": rate, "channels": ch}
    return {"kind": kind, "format": "mp4", "width": w, "height": h,
            "duration_ms": ms, "sample_rate_hz": None, "channels": None}


def synth_media_bytes(media_id: int) -> bytes:
    f = synth_media_fields(media_id)
    if f["format"] == "png":
        ihdr = struct.pack(">II", f["width"], f["height"]) + b"\x08\x02\x00\x00\x00"
        return (b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
                + ihdr + b"\x00\x00\x00\x00")                      # 33 bytes
    if f["format"] == "gif":
        return (b"GIF89a" + struct.pack("<HH", f["width"], f["height"])
                + b"\x00\x00\x00" + b"\x3b")                       # 14 bytes
    if f["format"] == "jpeg":
        app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00" + b"\x00" * 9
        sof = (b"\xff\xc0" + struct.pack(">H", 11) + b"\x08"
               + struct.pack(">HH", f["height"], f["width"]) + b"\x01\x11\x00")
        return b"\xff\xd8" + app0 + sof + b"\xff\xd9"              # 35 bytes
    if f["format"] == "wav":
        rate, ch, bits = f["sample_rate_hz"], f["channels"], 16
        byte_rate = rate * ch * (bits // 8)
        data_sz = f["duration_ms"] * (byte_rate // 1000)   # exact: rate % 500 == 0
        fmt = struct.pack("<HHIIHH", 1, ch, rate, byte_rate, ch * bits // 8, bits)
        return (b"RIFF" + struct.pack("<I", 36 + data_sz) + b"WAVE"
                + b"fmt " + struct.pack("<I", 16) + fmt
                + b"data" + struct.pack("<I", data_sz))            # 44 bytes
    # mp4: ftyp + moov(mvhd v0 + trak(tkhd v0))
    mvhd = (struct.pack(">I", 108) + b"mvhd" + b"\x00\x00\x00\x00"
            + struct.pack(">II", 0, 0)                      # ctime/mtime
            + struct.pack(">II", 1000, f["duration_ms"])    # timescale, duration
            + b"\x00" * 80)
    tkhd = (struct.pack(">I", 92) + b"tkhd" + b"\x00\x00\x00\x00"
            + b"\x00" * 72
            + struct.pack(">II", f["width"] << 16, f["height"] << 16))
    moov = struct.pack(">I", 8 + 108 + 8 + 92) + b"moov" + mvhd \
        + struct.pack(">I", 8 + 92) + b"trak" + tkhd
    ftyp = struct.pack(">I", 16) + b"ftyp" + b"isom" + struct.pack(">I", 512)
    return ftyp + moov                                             # 232 bytes


def media_from_documents(docs: DataFrame, id_col: str = "doc_id",
                         text_col: str = "text",
                         payload: str = "text") -> DataFrame:
    """Deterministic synthetic media table from the documents fixture.

    payload="text": utf-8 bytes of the text column (opaque-binary plumbing;
    pairs with the stub decoder). payload="media": real container-header
    bytes from ``synth_media_bytes`` (pairs with the "headers" decoder and
    an arithmetic SQL oracle). kind cycles image/audio/video either way.
    """
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    if payload == "media":
        @F.pandas_udf(T.BinaryType())
        def build(ids: pd.Series) -> pd.Series:
            return ids.map(lambda i: synth_media_bytes(int(i)))

        payload_col = build(F.col(id_col))
    else:
        payload_col = F.encode(F.col(text_col), "UTF-8")
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        payload_col.alias("payload"),
        F.create_map(F.lit("src"), F.lit("documents")).alias("meta"),
    )


def sniff_mime(col: Column) -> Column:
    """Magic-byte MIME sniffing as a PURE COLUMN EXPRESSION — the
    content-type gate a multimodal ingest runs before routing payloads
    to decoders (server-reported Content-Type headers lie; the bytes
    don't). One F.hex over the first 16 bytes, then a codegen CASE
    chain over hex prefixes — zero Python, zero shuffles, no UDF.

    Detects: PNG, GIF (87a/89a), JPEG, RIFF-WAVE (audio/x-wav),
    RIFF-WEBP, ISO-BMFF ftyp (video/mp4), PDF, gzip, zip. Everything
    else (including empty payloads) → application/octet-stream; NULL
    payload → NULL. Container-before-codec caveat documented: a .docx
    is a zip and sniffs as one — that is what the bytes say."""
    hx = F.hex(F.substring(col, 1, 16))

    def pre(p: str) -> Column:
        return hx.startswith(p)

    return (
        F.when(col.isNull(), F.lit(None).cast("string"))
        .when(pre("89504E470D0A1A0A"), F.lit("image/png"))
        .when(pre("474946383761") | pre("474946383961"), F.lit("image/gif"))
        .when(pre("FFD8FF"), F.lit("image/jpeg"))
        .when(pre("52494646") & (F.substring(hx, 17, 8) == "57415645"),
              F.lit("audio/x-wav"))
        .when(pre("52494646") & (F.substring(hx, 17, 8) == "57454250"),
              F.lit("image/webp"))
        .when(F.substring(hx, 9, 8) == "66747970", F.lit("video/mp4"))
        .when(pre("25504446"), F.lit("application/pdf"))
        .when(pre("1F8B"), F.lit("application/gzip"))
        .when(pre("504B0304"), F.lit("application/zip"))
        .otherwise(F.lit("application/octet-stream"))
    )


def mime_profile_df(df: DataFrame, payload_col: str = "payload") -> DataFrame:
    """Corpus MIME census: sniff every payload, ONE groupBy(mime) with
    map-side partials — the table you consult before sizing decoder
    fleets. Columns: (mime, n, total_bytes)."""
    return df.select(
        sniff_mime(F.col(payload_col)).alias("mime"),
        F.octet_length(F.col(payload_col)).cast("long").alias("_sz"),
    ).groupBy("mime").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum("_sz").cast("long").alias("total_bytes"),
    )
