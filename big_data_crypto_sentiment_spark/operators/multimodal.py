"""Multimodal column plumbing (BASELINE-mandated extension; no
reference twin).

Image/audio/video ride as opaque `binary` columns with typed metadata
(schemas.MEDIA_SCHEMA). The Spark-side machinery — schema, partitioning,
Arrow batch shapes, mapInPandas signatures — is real and tested.
`decode_media` is a REAL pure-Python container-header codec for the
formats whose metadata sits at fixed offsets (PNG / GIF / BMP / WAV —
published file-format specs, no libraries needed); formats that require
an entropy decoder to get metadata (JPEG SOF scan, MP4 box walk, …)
raise NotImplementedError and fall back to the clearly-marked
deterministic fake, so pipelines still exercise end to end.

Scale notes: mapInPandas streams Arrow batches — payload bytes never
materialize as a full-partition list; batch size is bounded by
spark.sql.execution.arrow.maxRecordsPerBatch. Feature extraction adds
columns without shuffling; only a later groupBy/join would.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_FEATURE_SCHEMA = T.StructType([
    T.StructField("media_id", T.LongType()),
    T.StructField("kind", T.StringType()),
    T.StructField("n_bytes", T.LongType()),
    T.StructField("magic", T.StringType()),
    T.StructField("content_sha", T.StringType()),
    T.StructField("decoded_width", T.IntegerType()),
    T.StructField("decoded_height", T.IntegerType()),
    T.StructField("decoded_duration_ms", T.LongType()),
    T.StructField("decode_status", T.StringType()),
])


def decode_media(payload: bytes, kind: str) -> dict:
    """Pure-Python container-header metadata decode, magic-dispatched.

    Returns {"width", "height", "duration_ms"} (absent axes None).
    Formats parsed — all from their published specs' fixed offsets:
      PNG  signature + IHDR chunk: width/height big-endian u32 at
           bytes 16/20 (the IHDR chunk is required to come first).
      GIF  GIF87a/GIF89a: logical-screen width/height little-endian
           u16 at bytes 6/8.
      BMP  'BM' + BITMAPINFOHEADER: width/height little-endian i32 at
           bytes 18/22 (negative height = top-down row order → abs).
      WAV  RIFF/WAVE chunk walk: byte-rate from the fmt chunk,
           duration = data-chunk size / byte-rate.
    Raises ValueError for a recognized magic with a truncated or
    malformed header ("corrupt"), NotImplementedError for formats
    whose metadata needs an entropy decoder (JPEG/MP4/...) — callers
    fall back to the deterministic fake for those."""
    if payload.startswith(b"\x89PNG\r\n\x1a\n"):
        if len(payload) < 24 or payload[12:16] != b"IHDR":
            raise ValueError("truncated or non-IHDR-first PNG")
        return {"width": int.from_bytes(payload[16:20], "big"),
                "height": int.from_bytes(payload[20:24], "big"),
                "duration_ms": None}
    if payload[:6] in (b"GIF87a", b"GIF89a"):
        if len(payload) < 10:
            raise ValueError("truncated GIF header")
        return {"width": int.from_bytes(payload[6:8], "little"),
                "height": int.from_bytes(payload[8:10], "little"),
                "duration_ms": None}
    if payload[:2] == b"BM":
        if len(payload) < 26:
            raise ValueError("truncated BMP header")
        w = int.from_bytes(payload[18:22], "little", signed=True)
        h = int.from_bytes(payload[22:26], "little", signed=True)
        return {"width": abs(w), "height": abs(h), "duration_ms": None}
    if payload[:4] == b"RIFF" and payload[8:12] == b"WAVE":
        pos, byte_rate, data_size = 12, None, None
        while pos + 8 <= len(payload):
            cid = payload[pos:pos + 4]
            csz = int.from_bytes(payload[pos + 4:pos + 8], "little")
            if cid == b"fmt " and pos + 20 <= len(payload):
                byte_rate = int.from_bytes(
                    payload[pos + 16:pos + 20], "little")
            elif cid == b"data":
                data_size = csz
            pos += 8 + csz + (csz & 1)  # RIFF chunks are word-aligned
        if not byte_rate or data_size is None:
            raise ValueError("WAV missing fmt/data chunk")
        return {"width": None, "height": None,
                "duration_ms": data_size * 1000 // byte_rate}
    raise NotImplementedError(
        f"no {kind} codec for magic {payload[:4]!r} in this environment")


def fake_decode(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in: pseudo-dimensions from the content hash
    (stable across runs/partitionings, so tests can golden it)."""
    h = hashlib.sha256(payload).digest()
    return 16 + h[0] % 240, 16 + h[1] % 240


def extract_media_features(df: DataFrame,
                           use_real_codec: bool = False) -> DataFrame:
    """mapInPandas feature extraction over MEDIA_SCHEMA-shaped rows."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = []
            for row in pdf.itertuples(index=False):
                payload = bytes(row.payload) if row.payload is not None else b""
                w = h = dur = None
                status = "fake"
                if use_real_codec:
                    try:
                        meta = decode_media(payload, row.kind)
                        w, h = meta["width"], meta["height"]
                        dur = meta["duration_ms"]
                        status = "decoded"
                    except NotImplementedError:
                        w, h = fake_decode(payload)
                        status = "stubbed"
                    except ValueError:
                        status = "corrupt"
                else:
                    w, h = fake_decode(payload)
                out.append((
                    row.media_id, row.kind, len(payload),
                    payload[:4].hex(), hashlib.sha256(payload).hexdigest(),
                    w, h, dur, status,
                ))
            yield pd.DataFrame(
                out, columns=[f.name for f in MEDIA_FEATURE_SCHEMA])

    return df.mapInPandas(extract, MEDIA_FEATURE_SCHEMA)


def sample_frames(df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video frame-sampling plumbing: evenly-spaced frame offsets from
    duration metadata (the decode of each frame is the stubbed step)."""
    import pyspark.sql.functions as F
    idx = F.sequence(F.lit(0), F.lit(n_frames - 1))
    return (df.filter(F.col("kind") == "video")
              .select("media_id", "duration_ms",
                      F.transform(
                          idx,
                          lambda i: (F.col("duration_ms") * i
                                     / F.lit(n_frames)).cast("long"))
                       .alias("frame_offsets_ms")))
