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
        byte_rate = rate * ch * (bits // 8)
        return {"format": "wav", "sample_rate_hz": rate, "channels": ch,
                "duration_ms": data_sz * 1000 // byte_rate}
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


def media_from_documents(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Deterministic synthetic media table from the documents fixture
    (payload = utf-8 bytes; kind cycles image/audio/video)."""
    kind = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col(id_col) % 3 + 1).cast("int"),
    )
    return docs.select(
        F.col(id_col).alias("media_id"),
        kind.alias("kind"),
        F.encode(F.col(text_col), "UTF-8").alias("payload"),
        F.create_map(F.lit("src"), F.lit("documents")).alias("meta"),
    )
