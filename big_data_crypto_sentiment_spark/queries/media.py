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


def _fixture_payload_udf(kind: str):
    """Lazily-built Arrow-batched payload builder: REAL container
    bytes (media_fixtures closed forms) on the designated doc_id
    residues, the raw text bytes elsewhere (the fake/stub tier)."""
    from pyspark.sql.functions import pandas_udf

    import pandas as pd

    from ..operators import media_fixtures as MF

    def build(doc_id, text):
        out = []
        for d, t in zip(doc_id, text):
            d = int(d)
            m = d % 9
            if kind == "audio" and m == 1:
                out.append(MF.wav_pcm_bytes(d))
            elif kind == "audio" and m == 4:
                out.append(MF.flac_bytes(d))
            elif kind == "video" and m == 2:
                out.append(MF.gif_animated_bytes(d))
            else:
                out.append((t or "").encode("utf-8"))
        return pd.Series(out)

    return pandas_udf(build, "binary")


def _media_fixture_frame(spark: SparkSession, sf_dir: str, kind: str,
                         real_residues: tuple[int, ...],
                         text_keep) -> DataFrame:
    """MEDIA_SCHEMA frame over one kind's doc subset: real container
    payloads on `real_residues` (doc_id % 9), text payloads (with the
    magic-exclusion filter `text_keep`) elsewhere."""
    mod3 = {"image": 0, "audio": 1, "video": 2}[kind]
    d = (table(spark, sf_dir, "documents")
         .filter(F.col("doc_id") % 3 == mod3)
         .filter((F.col("doc_id") % 9).isin(*real_residues)
                 | text_keep))
    return d.select(
        F.col("doc_id").alias("media_id"),
        F.lit(kind).alias("kind"),
        _fixture_payload_udf(kind)(F.col("doc_id"), F.col("text"))
         .alias("payload"),
        F.lit(None).cast("string").alias("mime"),
        F.lit(None).cast("int").alias("width"),
        F.lit(None).cast("int").alias("height"),
        F.lit(None).cast("long").alias("duration_ms"),
    )


def q_media_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling with the REAL decode tier under the driver hash
    (r12 verdict #2): video docs at doc_id%9==2 carry spec-built
    4-frame animated GIFs (media_fixtures closed forms), so their
    rows exercise decode_gif_frames — LZW, GCE delays→timestamps,
    disposal coalescing — and ship an exact integer pixel_sum the
    DuckDB twin recomputes from the palette/index closed form. The
    remaining video docs keep text payloads, pinning the
    stubbed-codec tier dispatch and the mapInPandas row explosion as
    before (rows whose text spells a GIF magic are excluded on BOTH
    sides; none exist at any SF — correct by construction)."""
    from ..operators.multimodal import sample_frame_pixels
    text_keep = ~F.substring(F.col("text"), 1, 6) \
        .isin("GIF87a", "GIF89a")
    m = _media_fixture_frame(spark, sf_dir, "video", (2,), text_keep)
    return sample_frame_pixels(m, n_frames=4,
                               encode_payload=False).select(
        "media_id", "frame_idx", "frame_ts_ms", "width", "height",
        "pixel_sum", "frame_status")


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio features with the REAL decode tiers under the driver hash
    (r12 verdict #2): audio docs at doc_id%9==1 carry spec-built WAV
    PCM16 payloads and doc_id%9==4 the SAME closed-form samples as
    FLAC (verbatim subframes) — so the hash pins decode_wav_samples
    AND decode_flac_samples producing identical integer-exact
    rms/peak/zero-crossing/duration values that the DuckDB twin
    recomputes from the sample closed form. The doc_id%9==7 docs keep
    text payloads, pinning the fake-tier sha-stub dispatch as before
    (text spelling a recognized container magic excluded on BOTH
    sides; none exist at any SF)."""
    from ..operators.multimodal import extract_audio_features
    t6 = F.substring(F.col("text"), 1, 6)
    text_keep = (~t6.isin("GIF87a", "GIF89a")
                 & (F.substring(F.col("text"), 1, 2) != "BM")
                 & (F.substring(F.col("text"), 1, 4) != "RIFF")
                 & (F.substring(F.col("text"), 1, 4) != "fLaC")
                 & (F.substring(F.col("text"), 5, 4) != "ftyp"))
    m = _media_fixture_frame(spark, sf_dir, "audio", (1, 4), text_keep)
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
    # decoded branch: the media_fixtures closed forms replayed in SQL
    # — exact integer sums (order-free), identical IEEE division/sqrt,
    # explicit half-up 6dp (floor(v·1e6+0.5)/1e6) matching the
    # operator's pinned tie rule. WAV (doc%9=1) and FLAC (doc%9=4)
    # rows carry the SAME samples, so the hash also certifies the two
    # decoders agree bit-for-bit.
    "audio_features": f"""
WITH rl AS (
  SELECT doc_id, 64 + doc_id % 61 AS n
  FROM documents WHERE doc_id % 3 = 1 AND doc_id % 9 IN (1, 4)
), samp AS (
  SELECT r.doc_id, r.n, g.i,
         ((r.doc_id * 7919 + g.i * 104729) % 65536) - 32768 AS v
  FROM rl r, LATERAL unnest(generate_series(0, r.n - 1)) AS g(i)
), lagged AS (
  SELECT doc_id, n, v,
         lag(v) OVER (PARTITION BY doc_id ORDER BY i) AS prev
  FROM samp
), agg AS (
  SELECT doc_id, n,
         CAST(SUM(v * v) AS BIGINT) AS ss,
         CAST(MAX(ABS(v)) AS BIGINT) AS maxabs,
         CAST(SUM(CASE WHEN prev IS NOT NULL
                        AND (v < 0) != (prev < 0)
                  THEN 1 ELSE 0 END) AS BIGINT) AS chg
  FROM lagged GROUP BY doc_id, n
), decoded AS (
  SELECT doc_id AS media_id,
         CAST(8000 AS INT) AS sample_rate,
         CAST(1 AS INT) AS channels,
         CAST(n AS BIGINT) AS n_frames,
         CAST((n * 1000) // 8000 AS BIGINT) AS duration_ms,
         floor(sqrt(CAST(ss AS DOUBLE)
                    / CAST(1073741824 * n AS DOUBLE)) * 1e6 + 0.5)
           / 1e6 AS rms,
         floor(CAST(maxabs AS DOUBLE) / 32768 * 1e6 + 0.5) / 1e6
           AS peak,
         floor(CAST(chg AS DOUBLE) / CAST(n - 1 AS DOUBLE) * 1e6
               + 0.5) / 1e6 AS zero_crossing_rate,
         'decoded' AS audio_status
  FROM agg
), fk AS (
  SELECT doc_id AS media_id, lower(sha256(text)) AS sha
  FROM documents
  WHERE doc_id % 3 = 1 AND doc_id % 9 NOT IN (1, 4)
    AND substr(text, 1, 6) NOT IN ('GIF87a', 'GIF89a')
    AND substr(text, 1, 2) != 'BM'
    AND substr(text, 1, 4) NOT IN ('RIFF', 'fLaC')
    AND substr(text, 5, 4) != 'ftyp'
)
SELECT * FROM decoded
UNION ALL
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
FROM fk
""",
    # decoded branch: 4 coalesced full-screen GIF frames per doc%9=2
    # video doc — timestamps from the 100 ms GCE delays, dims from
    # the logical screen, pixel_sum from the palette/index closed form
    "media_frames": """
WITH gifsum AS (
  SELECT d.doc_id, f.f,
         CAST(SUM(((d.doc_id * 13 + f.f * 29 + p.p) % 256)
                  + (((d.doc_id * 13 + f.f * 29 + p.p) % 256) * 3)
                    % 256
                  + (((d.doc_id * 13 + f.f * 29 + p.p) % 256) * 7)
                    % 256) AS BIGINT) AS psum
  FROM (SELECT doc_id FROM documents
        WHERE doc_id % 3 = 2 AND doc_id % 9 = 2) d,
       unnest(generate_series(0, 3)) AS f(f),
       unnest(generate_series(0, 47)) AS p(p)
  GROUP BY 1, 2
), stub AS (
  SELECT doc_id AS media_id FROM documents
  WHERE doc_id % 3 = 2 AND doc_id % 9 != 2
    AND substr(text, 1, 6) NOT IN ('GIF87a', 'GIF89a')
)
SELECT doc_id AS media_id, CAST(f AS INT) AS frame_idx,
       CAST(f * 100 AS BIGINT) AS frame_ts_ms,
       CAST(8 AS INT) AS width, CAST(6 AS INT) AS height,
       psum AS pixel_sum,
       'decoded' AS frame_status
FROM gifsum
UNION ALL
SELECT media_id, CAST(i AS INT) AS frame_idx,
       CAST(NULL AS BIGINT) AS frame_ts_ms,
       CAST(NULL AS INT) AS width, CAST(NULL AS INT) AS height,
       CAST(NULL AS BIGINT) AS pixel_sum,
       'stubbed-codec' AS frame_status
FROM stub, unnest(generate_series(0, 3)) AS t(i)
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
