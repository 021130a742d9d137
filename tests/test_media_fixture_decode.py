"""Pins for the r13 driver-hash media fixtures: the spec-built
deterministic encoders in operators/media_fixtures.py must decode
BIT-EXACTLY through the real decoders (that equivalence is what the
audio_features / media_frames oracle hashes now certify), and the
WAV and FLAC encodings of the same closed-form samples must yield
identical audio features.
"""

import numpy as np

from big_data_crypto_sentiment_spark.operators import media_fixtures as MF
from big_data_crypto_sentiment_spark.operators.multimodal import (
    decode_flac_samples,
    decode_video_frames,
    decode_wav_samples,
)

DOCS = (1, 4, 13, 58, 121, 400)


def test_wav_fixture_roundtrips_bit_exact():
    for d in DOCS:
        ref = np.array(MF.fixture_samples(d), dtype=np.int64)
        s, rate = decode_wav_samples(MF.wav_pcm_bytes(d))
        assert rate == MF.AUDIO_RATE
        assert s.shape == (len(ref), 1)
        assert (s[:, 0] == ref).all()


def test_flac_fixture_roundtrips_bit_exact():
    for d in DOCS:
        ref = np.array(MF.fixture_samples(d), dtype=np.int64)
        s, rate, bps = decode_flac_samples(MF.flac_bytes(d))
        assert rate == MF.AUDIO_RATE and bps == 16
        assert s.shape == (len(ref), 1)
        assert (s[:, 0].astype(np.int64) == ref).all()


def test_gif_fixture_frames_and_timestamps_exact():
    pal = MF.gif_palette()
    for d in (2, 5, 44, 398):
        frames, ts = decode_video_frames(MF.gif_animated_bytes(d), 4)
        assert ts == [0, 100, 200, 300]
        for f, img in enumerate(frames):
            assert img.shape == (MF.GIF_H, MF.GIF_W, 3)
            exp = np.array([pal[i] for i in MF.gif_frame_indices(d, f)],
                           dtype=np.uint8).reshape(MF.GIF_H, MF.GIF_W, 3)
            assert (img == exp).all()


def test_wav_and_flac_fixture_features_agree(spark):
    """Same closed-form samples through two different real decoders →
    identical feature rows (the decoder-equivalence certificate the
    driver hash pins at scale)."""
    from big_data_crypto_sentiment_spark.operators.multimodal import (
        extract_audio_features,
    )
    rows = [(d, "audio", MF.wav_pcm_bytes(d), None, None, None, None)
            for d in DOCS]
    rows += [(d + 1000, "audio", MF.flac_bytes(d), None, None, None,
              None) for d in DOCS]
    df = spark.createDataFrame(
        rows, "media_id long, kind string, payload binary, mime string,"
              " width int, height int, duration_ms long")
    got = {r.media_id: r for r in extract_audio_features(df).collect()}
    for d in DOCS:
        w, f = got[d], got[d + 1000]
        assert w.audio_status == f.audio_status == "decoded"
        assert (w.sample_rate, w.channels, w.n_frames, w.duration_ms,
                w.rms, w.peak, w.zero_crossing_rate) \
            == (f.sample_rate, f.channels, f.n_frames, f.duration_ms,
                f.rms, f.peak, f.zero_crossing_rate)
        assert w.n_frames == MF.fixture_sample_count(d)
