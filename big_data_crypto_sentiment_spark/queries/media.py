"""Multimodal feature-extraction query: documents.text re-cast as opaque
binary payloads (MEDIA_SCHEMA shape) pushed through the mapInPandas
extractor — so the Arrow-batched binary plumbing itself is value-checked:
DuckDB recomputes byte length, magic bytes, sha256, and the
deterministic fake-decode dimensions from the same bytes."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.multimodal import extract_media_features
from ._util import table

_KINDS = ("image", "audio", "video")


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = table(spark, sf_dir, "documents")
    kind = F.element_at(F.array(*[F.lit(k) for k in _KINDS]),
                        (F.col("doc_id") % 3 + 1).cast("int"))
    return d.select(
        F.col("doc_id").alias("media_id"),
        kind.alias("kind"),
        F.encode("text", "UTF-8").alias("payload"),
        F.lit(None).cast("string").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    return extract_media_features(media_from_documents(spark, sf_dir))


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize plumbing, hash-checkable slice: the integer target-dim
    math from the deterministic fake dims. The stub payload (binary)
    stays out of the driver projection — its determinism is pinned by
    pytest (test_sinks_multimodal.py)."""
    from ..operators.multimodal import resize_images
    out = resize_images(media_from_documents(spark, sf_dir))
    return out.select("media_id", "src_width", "src_height",
                      "width", "height",
                      F.col("resized").cast("int").alias("resized"))


def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame-sampling plumbing (r12 sample_frame_pixels), the
    hash-checkable slice: the fixture's pseudo-video payloads are text
    bytes — no real container — so every row rides the stubbed-codec
    tier: n_frames output rows per video with deterministic
    index/status and null timestamps (text can't carry an mvhd
    duration). What the driver hash pins is the mapInPandas row
    EXPLOSION and the tier dispatch; the FRM1 marker payload (binary)
    stays out of the projection — its sha determinism is pytest-pinned
    (test_video_frames.py). Rows whose text accidentally spells a GIF
    magic are excluded on BOTH sides (none exist at any SF — the
    filter makes the pair correct by construction, not by fixture
    luck; 0xFF/0xD8 JPEG magic can't occur in UTF-8 text at all)."""
    from ..operators.multimodal import sample_frame_pixels
    m = media_from_documents(spark, sf_dir).filter(
        ~F.col("payload").substr(1, 6).cast("string")
         .isin("GIF87a", "GIF89a"))
    return sample_frame_pixels(m, n_frames=4).select(
        "media_id", "frame_idx", "frame_ts_ms", "width", "height",
        "frame_status")


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio-feature plumbing (r12 extract_audio_features), the
    hash-checkable slice: the fixture's pseudo-audio payloads are text
    bytes — no real container — so every row rides the fake tier
    (sha-derived deterministic pseudo-duration, null signal stats),
    pinning the mapInPandas tier dispatch and the stub math under the
    driver hash. Real WAV-PCM signal math (RMS/peak/zero-crossings on
    synthesized waveforms) is pinned by pytest
    (test_audio_features.py). Rows whose text accidentally spells a
    recognized container magic are excluded on BOTH sides (none exist
    at any SF — correct by construction, not fixture luck)."""
    from ..operators.multimodal import extract_audio_features
    t6 = F.col("payload").substr(1, 6).cast("string")
    m = media_from_documents(spark, sf_dir).filter(
        ~t6.isin("GIF87a", "GIF89a")
        & (t6.substr(1, 2) != "BM")
        & (t6.substr(1, 4) != "RIFF") & (t6.substr(1, 4) != "fLaC")
        & (F.col("payload").substr(5, 4).cast("string") != "ftyp"))
    return extract_audio_features(m)


QUERIES = {"media_features": q_media_features,
           "media_resize": q_media_resize,
           "media_frames": q_media_frames,
           "audio_features": q_audio_features}

# hex-pair → int without casts DuckDB lacks: positional lookup in the
# hex alphabet (strpos is 1-based)
_HEXVAL = ("((strpos('0123456789abcdef', substr(sha, {a}, 1)) - 1) * 16"
           " + strpos('0123456789abcdef', substr(sha, {b}, 1)) - 1)")

ORACLE = {
    "audio_features": f"""
WITH f AS (
  SELECT doc_id AS media_id, lower(sha256(text)) AS sha
  FROM documents
  WHERE doc_id % 3 = 1
    AND substr(text, 1, 6) NOT IN ('GIF87a', 'GIF89a')
    AND substr(text, 1, 2) != 'BM'
    AND substr(text, 1, 4) NOT IN ('RIFF', 'fLaC')
    AND substr(text, 5, 4) != 'ftyp'
)
SELECT media_id,
       CAST(NULL AS INT) AS sample_rate,
       CAST(NULL AS INT) AS channels,
       CAST(NULL AS BIGINT) AS n_frames,
       CAST((16 + {_HEXVAL.format(a=1, b=2)} % 240) * 256
            + (16 + {_HEXVAL.format(a=3, b=4)} % 240) AS BIGINT)
         AS duration_ms,
       CAST(NULL AS DOUBLE) AS rms,
       CAST(NULL AS DOUBLE) AS peak,
       CAST(NULL AS DOUBLE) AS zero_crossing_rate,
       'fake' AS audio_status
FROM f
""",
    "media_frames": """
WITH v AS (
  SELECT doc_id AS media_id FROM documents
  WHERE doc_id % 3 = 2
    AND substr(text, 1, 6) NOT IN ('GIF87a', 'GIF89a')
)
SELECT media_id, CAST(i AS INT) AS frame_idx,
       CAST(NULL AS BIGINT) AS frame_ts_ms,
       CAST(NULL AS INT) AS width, CAST(NULL AS INT) AS height,
       'stubbed-codec' AS frame_status
FROM v, unnest(generate_series(0, 3)) AS t(i)
""",
    "media_features": f"""
WITH m AS (
  SELECT doc_id AS media_id,
         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
                         ELSE 'video' END AS kind,
         encode(text) AS payload,
         text
  FROM documents
), f AS (
  -- sha256 of the VARCHAR hashes its UTF-8 bytes = python sha256(payload)
  SELECT media_id, kind, payload, text,
         lower(sha256(text)) AS sha
  FROM m
)
SELECT media_id, kind,
       octet_length(payload) AS n_bytes,
       lower(hex(encode(substr(text, 1, 4)))) AS magic,  -- fixture text is ASCII: first 4 chars = first 4 bytes
       sha AS content_sha,
       CAST(16 + {_HEXVAL.format(a=1, b=2)} % 240 AS INT) AS decoded_width,
       CAST(16 + {_HEXVAL.format(a=3, b=4)} % 240 AS INT) AS decoded_height,
       CAST(NULL AS BIGINT) AS decoded_duration_ms,
       'fake' AS decode_status
FROM f
""",
    # // is floor division on positive ints in BOTH engines (Python //
    # in the pandas UDF, DuckDB's integer-division operator here)
    "media_resize": f"""
WITH f AS (
  SELECT doc_id AS media_id, lower(sha256(text)) AS sha
  FROM documents WHERE doc_id % 3 = 0
), d AS (
  SELECT media_id,
         CAST(16 + {_HEXVAL.format(a=1, b=2)} % 240 AS INT) AS w,
         CAST(16 + {_HEXVAL.format(a=3, b=4)} % 240 AS INT) AS h
  FROM f
)
SELECT media_id, w AS src_width, h AS src_height,
       CAST(CASE WHEN GREATEST(w, h) > 224
                 THEN GREATEST(1, w * 224 // GREATEST(w, h))
                 ELSE w END AS INT) AS width,
       CAST(CASE WHEN GREATEST(w, h) > 224
                 THEN GREATEST(1, h * 224 // GREATEST(w, h))
                 ELSE h END AS INT) AS height,
       CAST(GREATEST(w, h) > 224 AS INT) AS resized
FROM d
""",
}
