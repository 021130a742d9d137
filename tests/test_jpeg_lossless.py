"""Lossless JPEG (T.81 Annex H, r14) pinned against an INDEPENDENT
spec-built encoder: every assertion is EXACT equality (lossless means
lossless) across all seven predictors, both 8- and 16-bit precision,
the point transform, and the first-sample/first-line/first-column
boundary rules.
"""

import struct

import numpy as np
import pytest

from big_data_crypto_sentiment_spark.operators.multimodal import (
    decode_jpeg_pixels,
)


class _W:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, nbits):
        self.acc = (self.acc << nbits) | (value & ((1 << nbits) - 1))
        self.n += nbits
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)

    def done(self):
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)
        return bytes(self.buf)


def _canonical(counts, symbols):
    out, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


# categories 0..16 all at length 5 (17 symbols fit 32 codes)
_DC_COUNTS = [0, 0, 0, 0, 17] + [0] * 11
_DC_SYMS = list(range(17))
_DC_ENC = _canonical(_DC_COUNTS, _DC_SYMS)


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) \
        + body


def _predict(p, y, x, sel, default):
    if y == 0 and x == 0:
        return default
    if y == 0:
        return int(p[0, x - 1])
    if x == 0:
        return int(p[y - 1, 0])
    ra, rb, rc = int(p[y, x - 1]), int(p[y - 1, x]), int(p[y - 1, x - 1])
    return (ra, rb, rc, ra + rb - rc, ra + ((rb - rc) >> 1),
            rb + ((ra - rc) >> 1), (ra + rb) >> 1)[sel - 1]


def _encode_lossless(planes, prec=8, sel=1, pt=0):
    """Independent Annex H encoder over full-precision planes (the
    point-transformed samples are planes >> pt)."""
    ncomp = len(planes)
    h, w = planes[0].shape
    out = bytearray(b"\xff\xd8")
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS)
                + bytes(_DC_SYMS))
    sof = bytes([prec]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])
    out += _seg(0xC3, sof)
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([sel, 0, pt])
    out += _seg(0xDA, sos)
    wtr = _W()
    default = 1 << (prec - pt - 1)
    shifted = [np.asarray(p, np.int64) >> pt for p in planes]
    recon = [np.zeros((h, w), np.int64) for _ in planes]
    for y in range(h):
        for x in range(w):
            for ci in range(ncomp):
                want = int(shifted[ci][y, x])
                pred = _predict(recon[ci], y, x, sel, default)
                diff = (want - pred) & 0xFFFF
                if diff >= 0x8000 and diff != 0x8000:
                    diff -= 0x10000            # smallest-magnitude rep
                if diff == 0x8000:
                    code, ln = _DC_ENC[16]
                    wtr.put(code, ln)
                else:
                    s = int(abs(diff)).bit_length()
                    code, ln = _DC_ENC[s]
                    wtr.put(code, ln)
                    if s:
                        wtr.put(diff if diff >= 0
                                else diff + (1 << s) - 1, s)
                recon[ci][y, x] = (pred + diff) & 0xFFFF
    out += wtr.done()
    out += b"\xff\xd9"
    expected = [(r << pt) for r in recon]
    return bytes(out), expected


def _img(h, w, seed, prec=8):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 1 << prec, size=(h, w)).astype(np.int64)


@pytest.mark.parametrize("sel", [1, 2, 3, 4, 5, 6, 7])
def test_lossless_grey_every_predictor_exact(sel):
    img = _img(9, 13, sel)
    stream, expected = _encode_lossless([img], sel=sel)
    out = decode_jpeg_pixels(stream)
    assert out.shape == (9, 13, 1)
    assert np.array_equal(out[:, :, 0], expected[0])
    assert np.array_equal(out[:, :, 0], img)   # lossless = exact


def test_lossless_16bit_high_byte_emit():
    img = _img(6, 7, 42, prec=16)
    stream, expected = _encode_lossless([img], prec=16, sel=4)
    out = decode_jpeg_pixels(stream)
    assert np.array_equal(out[:, :, 0], expected[0] >> 8)
    assert np.array_equal(out[:, :, 0], img >> 8)


def test_lossless_point_transform():
    img = _img(5, 8, 7)
    stream, expected = _encode_lossless([img], sel=7, pt=2)
    out = decode_jpeg_pixels(stream)
    # decoded = (img >> 2) << 2, exact in the transformed domain
    assert np.array_equal(out[:, :, 0], expected[0])
    assert np.array_equal(out[:, :, 0], (img >> 2) << 2)


def test_lossless_color_exact_through_ycbcr():
    planes = [_img(6, 6, 20 + i) for i in range(3)]
    stream, expected = _encode_lossless(planes, sel=5)
    y, cb, cr = (expected[0].astype(float),
                 expected[1].astype(float) - 128.0,
                 expected[2].astype(float) - 128.0)
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=2)
    want = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    out = decode_jpeg_pixels(stream)
    assert out.shape == (6, 6, 3)
    assert np.array_equal(out, want)


def test_lossless_corruption_and_loud_tiers():
    img = _img(8, 8, 9)
    stream, _ = _encode_lossless([img], sel=1)
    sos_at = stream.index(b"\xff\xda")
    sel_at = sos_at + 2 + 2 + 1 + 2    # marker+len+ns+(cs,td) → Ss
    assert stream[sel_at] == 1 and stream[sel_at + 2] == 0
    b = bytearray(stream)
    b[sel_at] = 0                      # predictor selector 0
    with pytest.raises(ValueError, match="predictor"):
        decode_jpeg_pixels(bytes(b))
    b = bytearray(stream)
    b[sel_at + 2] = 9                  # point transform >= precision
    with pytest.raises(ValueError, match="point transform"):
        decode_jpeg_pixels(bytes(b))
    # truncated entropy stream dies as corrupt, not a crash
    with pytest.raises(ValueError):
        decode_jpeg_pixels(stream[:len(stream) - 8] + b"\xff\xd9")
    # restart markers stay loud
    dri = _seg(0xDD, struct.pack(">H", 4))
    with pytest.raises(NotImplementedError, match="restart"):
        decode_jpeg_pixels(stream[:sos_at] + dri + stream[sos_at:])
    # subsampled lossless stays loud
    sof_at = stream.index(b"\xff\xc3")
    hv_at = sof_at + 4 + 6 + 1         # marker+len, prec+dims+ncomp, id
    assert stream[hv_at] == 0x11
    b = bytearray(stream)
    b[hv_at] = 0x21
    with pytest.raises(NotImplementedError, match="subsampling"):
        decode_jpeg_pixels(bytes(b))
    # 4-bit lossless precision stays loud
    b = bytearray(stream)
    assert b[sof_at + 4] == 8
    b[sof_at + 4] = 4
    with pytest.raises(NotImplementedError, match="precision"):
        decode_jpeg_pixels(bytes(b))
