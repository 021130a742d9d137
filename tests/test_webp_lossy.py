"""Lossy-WebP decode via the gated system-libwebp path (r13), plus the
independent cross-validation it unlocks for the from-scratch VP8L
decoder: libwebp's lossless ENCODER produces real-world VP8L streams
our pure-Python decoder must reproduce bit-exactly.

The test-side encoder below calls the public WebPEncode* C API through
ctypes — an independent producer of genuine VP8 bitstreams (mode
decisions, probability updates, token partitions all chosen by
libwebp, none of it visible to the decode path under test).
"""

import ctypes

import numpy as np
import pytest

from big_data_crypto_sentiment_spark.operators.multimodal import (
    _libwebp,
    decode_image_pixels,
    decode_webp_pixels,
)

pytestmark = pytest.mark.skipif(
    _libwebp() is None, reason="system libwebp not installed")


def _encode(pixels: np.ndarray, quality: float | None) -> bytes:
    """RGBA pixels -> WebP bytes via libwebp (lossy at `quality`,
    lossless when quality is None)."""
    lib = ctypes.CDLL("libwebp.so.7")
    h, w = pixels.shape[:2]
    rgba = np.ascontiguousarray(pixels).tobytes()
    out = ctypes.c_void_p()
    if quality is None:
        fn = lib.WebPEncodeLosslessRGBA
        fn.restype = ctypes.c_size_t
        fn.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                       ctypes.c_int, ctypes.POINTER(ctypes.c_void_p)]
        size = fn(rgba, w, h, w * 4, ctypes.byref(out))
    else:
        fn = lib.WebPEncodeRGBA
        fn.restype = ctypes.c_size_t
        fn.argtypes = [ctypes.c_char_p, ctypes.c_int, ctypes.c_int,
                       ctypes.c_int, ctypes.c_float,
                       ctypes.POINTER(ctypes.c_void_p)]
        size = fn(rgba, w, h, w * 4, ctypes.c_float(quality),
                  ctypes.byref(out))
    assert size > 0, "libwebp encode failed"
    try:
        return ctypes.string_at(out, size)
    finally:
        lib.WebPFree(out)


def _smooth_rgba(h, w, seed=0):
    """Low-frequency pixels (lossy codecs track these closely)."""
    y, x = np.mgrid[0:h, 0:w]
    r = (128 + 100 * np.sin(x / 7.0)).astype(np.uint8)
    g = (128 + 100 * np.cos(y / 9.0)).astype(np.uint8)
    b = ((x * 2 + y * 3) % 200).astype(np.uint8)
    a = np.full((h, w), 255, np.uint8)
    return np.stack([r, g, b, a], axis=-1)


def test_lossy_webp_decodes_with_correct_dims_and_content():
    src = _smooth_rgba(40, 56)
    payload = _encode(src, quality=90.0)
    assert payload[:4] == b"RIFF" and payload[8:12] == b"WEBP"
    got = decode_webp_pixels(payload)
    assert got.shape == (40, 56, 4)
    # lossy: content tracks the smooth source closely at q=90
    err = np.abs(got[:, :, :3].astype(int)
                 - src[:, :, :3].astype(int)).mean()
    assert err < 8.0, err
    assert (got[:, :, 3] == 255).all()


def test_lossy_webp_through_magic_dispatch():
    payload = _encode(_smooth_rgba(16, 16), quality=80.0)
    assert decode_image_pixels(payload).shape == (16, 16, 4)


def test_vp8l_pure_decoder_cross_validated_against_libwebp():
    """The r12 from-scratch VP8L decoder against an INDEPENDENT
    real-world encoder: libwebp's lossless output must decode
    bit-exactly (libwebp chooses transforms/meta-prefixes/cache sizes
    on its own — none of our encoder-side assumptions apply)."""
    rng = np.random.default_rng(3)
    for shape in ((8, 8), (21, 13), (48, 31)):
        # mix structured + noisy content so libwebp picks varied
        # transform combinations
        base = _smooth_rgba(*shape, seed=1)
        noise = rng.integers(0, 256, size=base.shape).astype(np.uint8)
        for src in (base, noise):
            src = src.copy()
            src[:, :, 3] = 255
            payload = _encode(src, quality=None)
            got = decode_webp_pixels(payload)
            assert got.shape == src.shape
            assert (got == src).all()


def test_lossy_webp_resize_tier_is_resampled(spark):
    """The r12 gap closed: lossy WebP rows move from decoded-dims to
    the resampled/passthrough tiers in the media_resize matrix."""
    from big_data_crypto_sentiment_spark.operators.multimodal import (
        resize_images,
    )
    big = _encode(_smooth_rgba(300, 260), quality=85.0)
    small = _encode(_smooth_rgba(30, 26), quality=85.0)
    df = spark.createDataFrame(
        [(1, "image", bytearray(big), None, None, None, None),
         (2, "image", bytearray(small), None, None, None, None)],
        "media_id long, kind string, payload binary, mime string,"
        " width int, height int, duration_ms long")
    out = {r.media_id: r for r in
           resize_images(df, max_dim=224, use_real_codec=True).collect()}
    assert out[1].resize_status == "resampled" and out[1].resized
    assert (out[1].src_width, out[1].src_height) == (260, 300)
    assert out[2].resize_status == "passthrough" and not out[2].resized


def test_corrupt_and_truncated_lossy_streams_raise_valueerror():
    payload = _encode(_smooth_rgba(24, 24), quality=75.0)
    with pytest.raises(ValueError):
        decode_webp_pixels(payload[:20])       # truncated header
    bad = bytearray(payload)
    bad[30] ^= 0xFF                            # damage the VP8 chunk
    try:
        decode_webp_pixels(bytes(bad))
    except (ValueError, NotImplementedError):
        pass                                   # loud tier, both fine


def test_mutation_fuzz_lossy_webp_contract_exceptions_only():
    """Bounded byte-flip/truncation fuzz over a valid lossy seed:
    only the tier-contract exceptions may escape (libwebp returns
    error codes; our wrapper maps them to ValueError)."""
    import signal

    payload = _encode(_smooth_rgba(20, 20), quality=70.0)
    rng = np.random.default_rng(7)

    def alarm(_sig, _frm):
        raise AssertionError("lossy-webp decode hung on mutated bytes")

    old = signal.signal(signal.SIGALRM, alarm)
    try:
        for _ in range(2000):
            buf = bytearray(payload)
            op = rng.integers(0, 3)
            if op == 0:
                buf[rng.integers(0, len(buf))] ^= int(
                    rng.integers(1, 256))
            elif op == 1:
                buf = buf[:rng.integers(1, len(buf))]
            else:
                buf[rng.integers(0, len(buf)):rng.integers(
                    0, len(buf))] = b"\x00" * int(rng.integers(0, 9))
            signal.alarm(5)
            try:
                decode_webp_pixels(bytes(buf))
            except (ValueError, NotImplementedError):
                pass
            finally:
                signal.alarm(0)
    finally:
        signal.signal(signal.SIGALRM, old)
