"""r12 audio decode + features: WAV PCM samples (8/16-bit, mono and
stereo) through real signal math, tiered against metadata-only and
unknown payloads. Waveforms are synthesized with known closed-form
RMS / peak / zero-crossing values."""

import struct

import numpy as np
import pytest

from big_data_crypto_sentiment_spark.operators.multimodal import (
    decode_wav_samples,
    extract_audio_features,
)


def _wav(samples, rate=8000, bits=16):
    """samples: (n, ch) int16 ndarray → spec-forward RIFF/WAVE PCM."""
    n, ch = samples.shape
    if bits == 16:
        data = samples.astype("<i2").tobytes()
    else:
        data = ((samples.astype(np.int32) >> 8) + 128) \
            .astype(np.uint8).tobytes()
    block = ch * bits // 8
    fmt = struct.pack("<HHIIHH", 1, ch, rate, rate * block, block,
                      bits)
    body = (b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_wav_pcm16_square_wave_known_stats():
    # period-2 square at half scale: rms = peak = 0.5, zcr = 1.0
    sq = np.tile(np.array([[16384], [-16384]], dtype=np.int16),
                 (400, 1))
    s, rate = decode_wav_samples(_wav(sq, rate=8000))
    assert rate == 8000 and s.shape == (800, 1)
    assert (s == sq).all()


def test_wav_stereo_and_8bit():
    # stereo 16-bit roundtrip
    rng = np.random.default_rng(9)
    st = rng.integers(-32768, 32768, size=(100, 2)).astype(np.int16)
    s, _ = decode_wav_samples(_wav(st))
    assert (s == st).all()
    # 8-bit unsigned recenters: value v maps to (v - 128) << 8
    mono = (np.arange(-128, 128) << 8).astype(np.int16)[:, None]
    s8, _ = decode_wav_samples(_wav(mono, bits=8))
    assert (s8 == mono).all()


def test_wav_gates_and_corruption():
    sq = np.zeros((4, 1), dtype=np.int16)
    good = _wav(sq)
    # float PCM (format tag 3) -> NotImplementedError
    bad_tag = good.replace(struct.pack("<HH", 1, 1),
                           struct.pack("<HH", 3, 1), 1)
    with pytest.raises(NotImplementedError):
        decode_wav_samples(bad_tag)
    # truncated chunk -> ValueError
    with pytest.raises(ValueError):
        decode_wav_samples(good[:-3])
    with pytest.raises(NotImplementedError):
        decode_wav_samples(b"not audio at all")


def test_audio_features_tiers_end_to_end(spark):
    from big_data_crypto_sentiment_spark.schemas import MEDIA_SCHEMA
    sq = np.tile(np.array([[16384], [-16384]], dtype=np.int16),
                 (2000, 1))
    t = np.arange(8000)
    sine = np.round(16384 * np.sin(2 * np.pi * 440 * t / 8000)) \
        .astype(np.int16)[:, None]

    def flac(sr, total):
        u64 = (sr << 44) | (1 << 41) | (15 << 36) | total
        return (b"fLaC" + b"\x80" + (34).to_bytes(3, "big")
                + b"\x00" * 10 + u64.to_bytes(8, "big") + b"\x00" * 16)

    rows = [
        (1, "audio", _wav(sq, rate=8000), "audio/wav", None, None,
         None),
        (2, "audio", _wav(sine, rate=8000), "audio/wav", None, None,
         None),
        (3, "audio", flac(44100, 44100 * 3), "audio/flac", None, None,
         None),
        (4, "audio", b"who knows what this is", "audio/???", None,
         None, None),
        (5, "audio", _wav(sq)[:-3], "audio/wav", None, None, None),
        (6, "image", _wav(sq), "audio/wav", None, None, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r for r in extract_audio_features(df).collect()}
    assert 6 not in out                         # non-audio filtered

    r1 = out[1]
    assert r1.audio_status == "decoded"
    assert (r1.sample_rate, r1.channels, r1.n_frames) == (8000, 1,
                                                          4000)
    assert r1.duration_ms == 500
    assert r1.rms == 0.5 and r1.peak == 0.5
    assert r1.zero_crossing_rate == pytest.approx(1.0, abs=1e-3)

    r2 = out[2]
    assert r2.audio_status == "decoded"
    # sine: rms = A/sqrt(2) with A = 0.5 full scale; zcr = 2f/rate
    assert r2.rms == pytest.approx(0.5 / np.sqrt(2), abs=2e-3)
    assert r2.zero_crossing_rate == pytest.approx(2 * 440 / 8000,
                                                  abs=2e-3)

    assert out[3].audio_status == "metadata"
    assert out[3].duration_ms == 3000 and out[3].rms is None
    assert out[4].audio_status == "fake"
    assert out[4].duration_ms is not None      # sha-derived stub
    assert out[5].audio_status == "corrupt"
