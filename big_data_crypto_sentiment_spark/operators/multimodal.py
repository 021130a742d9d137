"""Multimodal column plumbing (BASELINE-mandated extension; no
reference twin).

Image/audio/video ride as opaque `binary` columns with typed metadata
(schemas.MEDIA_SCHEMA). The Spark-side machinery — schema, partitioning,
Arrow batch shapes, mapInPandas signatures — is real and tested; the
codec step is STUBBED (`decode_media` raises NotImplementedError: no
image/audio libraries in this container) with a clearly-marked
deterministic fake used by default so pipelines exercise end to end.

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
    T.StructField("decode_status", T.StringType()),
])


def decode_media(payload: bytes, kind: str):
    """REAL codec hook — intentionally unimplemented in this container
    (no PIL/ffmpeg). Swap this for an actual decoder in production."""
    raise NotImplementedError(
        f"no {kind} codec available in this environment")


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
                status = "fake"
                if use_real_codec:
                    try:
                        w, h = decode_media(payload, row.kind)
                        status = "decoded"
                    except NotImplementedError:
                        w, h = fake_decode(payload)
                        status = "stubbed"
                else:
                    w, h = fake_decode(payload)
                out.append((
                    row.media_id, row.kind, len(payload),
                    payload[:4].hex(), hashlib.sha256(payload).hexdigest(),
                    w, h, status,
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
