"""Multimodal columns — opaque binary payloads with typed metadata.

Images/audio/video ride through the pipeline as ``binary`` columns plus a
``map<string,string>`` metadata column; feature extraction runs as
Arrow-batched ``mapInPandas`` (whole-partition iterator — one Python
round-trip per batch, not per row). The actual media DECODE step is
STUBBED (pillow/ffmpeg are not in this container): ``decoder="stub"``
produces a deterministic fake derived from the payload bytes so the
Spark-side plumbing — schema, batch shape, partitioning — is real and
tested; ``decoder="real"`` raises NotImplementedError at the exact seam
where a pillow/ffmpeg call plugs in.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

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
        T.StructField("n_bytes", T.LongType(), True),
        T.StructField("sha", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
    ]
)


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


def _decode_real(payload: bytes, kind: str) -> dict:
    raise NotImplementedError(
        "real media decode requires pillow/ffmpeg — plug the library call in "
        "here; the surrounding Arrow batching, schema and partitioning are "
        "production-shaped"
    )


def extract_features(df: DataFrame, decoder: str = "stub") -> DataFrame:
    """Per-media features via mapInPandas (Arrow batches, zero per-row
    Python overhead beyond the decode call itself)."""
    decode = _decode_stub if decoder == "stub" else _decode_real

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = []
            for payload, kind in zip(pdf["payload"], pdf["kind"]):
                if payload is None:
                    feats.append({"n_bytes": None, "sha": None, "width": None,
                                  "height": None, "duration_ms": None})
                    continue
                b = bytes(payload)
                f = decode(b, kind)
                f["n_bytes"] = len(b)
                f["sha"] = hashlib.sha256(b).hexdigest()
                feats.append(f)
            fdf = pd.DataFrame(feats)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "kind": pdf["kind"],
                    "n_bytes": fdf["n_bytes"].astype("Int64"),
                    "sha": fdf["sha"],
                    "width": fdf["width"].astype("Int32"),
                    "height": fdf["height"].astype("Int32"),
                    "duration_ms": fdf["duration_ms"].astype("Int64"),
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
