"""12-bit baseline JPEG decode (r13): the precision gate widens to
P=12 — level shift 2048, clip to 4095, emit the high 8 bits (the
TIFF 16→8 convention) — pinned against an independent spec-built
12-bit encoder (canonical Huffman, q=1 so the expected pixels are an
exact numpy replay of the rounded-coefficient IDCT).
"""

import struct

import numpy as np
import pytest

from big_data_crypto_sentiment_spark.operators.multimodal import (
    decode_jpeg_pixels,
)


class _BitStuffWriter:
    """MSB-first bit packer with JPEG FF00 byte stuffing."""

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
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)  # 1-pad
        return bytes(self.buf)


def _canonical(counts, symbols):
    """symbol -> (code, length) in canonical order (the encode-side
    twin of the decoder's table builder)."""
    out, code, i = {}, 0, 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[i]] = (code, length)
            code += 1
            i += 1
        code <<= 1
    return out


# DC: symbols 0..15 at length 5; AC: rs bytes 0..254 at length 9 and
# 0xFF at length 10 (a DHT count byte caps at 255)
_DC_COUNTS = [0, 0, 0, 0, 16] + [0] * 11
_DC_SYMS = list(range(16))
_AC_COUNTS = [0] * 8 + [255, 1] + [0] * 6
_AC_SYMS = list(range(256))
_DC_ENC = _canonical(_DC_COUNTS, _DC_SYMS)
_AC_ENC = _canonical(_AC_COUNTS, _AC_SYMS)

_ZZ = []
r = c = 0
up = True
for _ in range(64):
    _ZZ.append(r * 8 + c)
    if up:
        if c == 7:
            r, up = r + 1, False
        elif r == 0:
            c, up = c + 1, False
        else:
            r, c = r - 1, c + 1
    else:
        if r == 7:
            c, up = c + 1, True
        elif c == 0:
            r, up = r + 1, True
        else:
            r, c = r + 1, c - 1


def _dct_blocks(img, prec=12):
    """(by, bx, 8, 8) rounded orthonormal-DCT coefficients (q=1)."""
    h, w = img.shape
    k = np.arange(8)[:, None]
    nn = np.arange(8)[None, :]
    C = np.cos((2 * nn + 1) * k * np.pi / 16) \
        * np.where(k == 0, np.sqrt(1 / 8), np.sqrt(2 / 8))
    x = img.astype(np.float64) - (1 << (prec - 1))
    blocks = x.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    F = np.einsum("ij,vhjk,kl->vhil", C, blocks, C.T)
    return np.round(F).astype(np.int64)


def _emit_block(w, coef_zz, pred):
    diff = int(coef_zz[0]) - pred
    s = int(abs(diff)).bit_length()
    code, ln = _DC_ENC[s]
    w.put(code, ln)
    if s:
        w.put(diff if diff >= 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = max([i for i in range(1, 64) if coef_zz[i]] or [0])
    for ki in range(1, 64):
        v = int(coef_zz[ki])
        if ki > last_nz:
            code, ln = _AC_ENC[0x00]           # EOB
            w.put(code, ln)
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = _AC_ENC[0xF0]           # ZRL
            w.put(code, ln)
            run -= 16
        sz = int(abs(v)).bit_length()
        code, ln = _AC_ENC[(run << 4) | sz]
        w.put(code, ln)
        w.put(v if v >= 0 else v + (1 << sz) - 1, sz)
        run = 0
    return int(coef_zz[0])


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _encode12(planes):
    """Baseline 12-bit JPEG from 1 or 3 full-resolution planes
    (no subsampling), q=1 everywhere."""
    ncomp = len(planes)
    h, w = planes[0].shape
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))   # DQT q=1
    sof = bytes([12]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS)
                + bytes(_DC_SYMS))
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_COUNTS)
                + bytes(_AC_SYMS))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    wtr = _BitStuffWriter()
    coefs = [_dct_blocks(p) for p in planes]
    nby, nbx = coefs[0].shape[:2]
    preds = [0] * ncomp
    for by in range(nby):
        for bx in range(nbx):
            for ci in range(ncomp):
                zzc = coefs[ci][by, bx].reshape(-1)[_ZZ]
                preds[ci] = _emit_block(wtr, zzc, preds[ci])
    out += wtr.done()
    out += b"\xff\xd9"
    return bytes(out), coefs


def _expected(coefs, prec=12):
    """Exact numpy replay of the decoder's math on the SAME rounded
    coefficients: IDCT + level shift + clip + high-byte emit."""
    k = np.arange(8)[:, None]
    nn = np.arange(8)[None, :]
    C = np.cos((2 * nn + 1) * k * np.pi / 16) \
        * np.where(k == 0, np.sqrt(1 / 8), np.sqrt(2 / 8))
    planes = []
    for F in coefs:
        sp = np.einsum("ij,vhjk,kl->vhil", C.T,
                       F.astype(np.float64), C) + (1 << (prec - 1))
        nby, nbx = F.shape[:2]
        planes.append(sp.transpose(0, 2, 1, 3).reshape(nby * 8,
                                                       nbx * 8))
    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, 4095).astype(np.int32)
        return (g >> 4).astype(np.uint8)[:, :, None]
    y, cb, cr = planes[0], planes[1] - 2048.0, planes[2] - 2048.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=2)
    return (np.clip(np.round(rgb), 0, 4095)
              .astype(np.int32) >> 4).astype(np.uint8)


def _grad12(h, w, seed):
    y, x = np.mgrid[0:h, 0:w]
    return ((x * 251 + y * 397 + seed * 811) % 4096).astype(np.int64)


def test_12bit_grey_bit_exact():
    img = _grad12(16, 8, 1)
    payload, coefs = _encode12([img])
    got = decode_jpeg_pixels(payload)
    assert got.shape == (16, 8, 1)
    assert (got == _expected(coefs)).all()


def test_12bit_rgb_bit_exact():
    planes = [_grad12(8, 16, s) for s in (2, 3, 4)]
    payload, coefs = _encode12(planes)
    got = decode_jpeg_pixels(payload)
    assert got.shape == (8, 16, 3)
    assert (got == _expected(coefs)).all()


def test_12bit_full_scale_values_survive():
    """Constant extreme planes: 0 and 4095 map to 0 and 255 exactly
    through the 12-bit level shift + high-byte emit."""
    lo = np.zeros((8, 8), np.int64)
    hi = np.full((8, 8), 4095, np.int64)
    for img, want in ((lo, 0), (hi, 255)):
        payload, _ = _encode12([img])
        got = decode_jpeg_pixels(payload)
        assert int(got.min()) == int(got.max()) == want


def test_precision_gate_still_loud_for_16bit():
    img = _grad12(8, 8, 5)
    payload, _ = _encode12([img])
    bad = bytearray(payload)
    i = bad.index(b"\xff\xc0") + 4             # SOF0 precision byte
    bad[i] = 16
    with pytest.raises(NotImplementedError, match="precision"):
        decode_jpeg_pixels(bytes(bad))


def test_12bit_jpeg_resize_tier_is_real(spark):
    """12-bit JPEGs now ride the real-pixel tiers in resize_images
    (passthrough when small, resampled when large) instead of
    decoded-dims."""
    from big_data_crypto_sentiment_spark.operators.multimodal import (
        resize_images,
    )
    small, _ = _encode12([_grad12(16, 16, 6)])
    big, _ = _encode12([_grad12(256, 256, 7)])
    df = spark.createDataFrame(
        [(1, "image", bytearray(small), None, None, None, None),
         (2, "image", bytearray(big), None, None, None, None)],
        "media_id long, kind string, payload binary, mime string,"
        " width int, height int, duration_ms long")
    out = {r.media_id: r for r in
           resize_images(df, max_dim=224, use_real_codec=True).collect()}
    assert out[1].resize_status == "passthrough"
    assert out[2].resize_status == "resampled" and out[2].resized
