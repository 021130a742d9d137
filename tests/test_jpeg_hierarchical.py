"""Hierarchical JPEG (T.81 Annex J, r14) pinned against an
INDEPENDENT spec-built encoder: a non-differential base frame, EXP
×2 bilinear reference expansion (§J.1.1.2 rounding, edge replication,
odd-dimension cropping), and differential SOF5 frames whose signed
corrections add to the integer reference. The encoder reconstructs
the pyramid itself (own DCT/IDCT/doubling code), so every assertion
is exact uint8 equality on the decoder's output — not a tolerance.
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

_K = np.arange(8)[:, None]
_N = np.arange(8)[None, :]
_C = np.cos((2 * _N + 1) * _K * np.pi / 16) \
    * np.where(_K == 0, np.sqrt(1 / 8), np.sqrt(2 / 8))


def _pad_to_blocks(img):
    h, w = img.shape
    ph, pw = -(-h // 8) * 8, -(-w // 8) * 8
    out = np.empty((ph, pw), np.float64)
    out[:h, :w] = img
    out[h:, :w] = img[-1:, :]
    out[:, w:] = out[:, w - 1:w]
    return out


def _fdct(img):
    """(by, bx, 8, 8) rounded q=1 coefficients of an edge-padded
    float image (caller applies any level shift beforehand)."""
    p = _pad_to_blocks(np.asarray(img, np.float64))
    h, w = p.shape
    blocks = p.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    F = np.einsum("ij,vhjk,kl->vhil", _C, blocks, _C.T)
    return np.round(F).astype(np.int64)


def _idct(coefs):
    blocks = coefs.astype(np.float64)
    s = np.einsum("ij,vhjk,kl->vhil", _C.T, blocks, _C)
    nby, nbx = coefs.shape[:2]
    return s.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)


def _double(a, eh, ev):
    """Independent §J.1.1.2 doubling: even=sample, odd=(l+r+1)>>1,
    edge replication."""
    if eh:
        out = np.empty((a.shape[0], a.shape[1] * 2), a.dtype)
        out[:, 0::2] = a
        out[:, 1:-1:2] = (a[:, :-1] + a[:, 1:] + 1) >> 1
        out[:, -1] = a[:, -1]
        a = out
    if ev:
        out = np.empty((a.shape[0] * 2, a.shape[1]), a.dtype)
        out[0::2] = a
        out[1:-1:2] = (a[:-1] + a[1:] + 1) >> 1
        out[-1] = a[-1]
        a = out
    return a


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) \
        + body


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
            code, ln = _AC_ENC[0x00]
            w.put(code, ln)
            break
        if v == 0:
            run += 1
            continue
        while run > 15:
            code, ln = _AC_ENC[0xF0]
            w.put(code, ln)
            run -= 16
        sz = int(abs(v)).bit_length()
        code, ln = _AC_ENC[(run << 4) | sz]
        w.put(code, ln)
        w.put(v if v >= 0 else v + (1 << sz) - 1, sz)
        run = 0
    return int(coef_zz[0])


def _tables():
    out = bytearray()
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS)
                + bytes(_DC_SYMS))
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_COUNTS)
                + bytes(_AC_SYMS))
    return bytes(out)


def _sof(marker, h, w, ncomp):
    body = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        body += bytes([ci + 1, 0x11, 0])
    return _seg(marker, body)


def _frame(marker, coef_list, h, w):
    """One frame: SOF + interleaved SOS over the given per-component
    coefficient grids (1x1 sampling everywhere)."""
    out = bytearray(_sof(marker, h, w, len(coef_list)))
    sos = bytes([len(coef_list)])
    for ci in range(len(coef_list)):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    wtr = _W()
    nby, nbx = coef_list[0].shape[:2]
    preds = [0] * len(coef_list)
    for by in range(nby):
        for bx in range(nbx):
            for ci, coefs in enumerate(coef_list):
                zzc = coefs[by, bx].reshape(-1)[_ZZ]
                preds[ci] = _emit_block(wtr, zzc, preds[ci])
    out += wtr.done()
    return bytes(out)


def _dhp(h, w, ncomp):
    return _sof(0xDE, h, w, ncomp)[:]


def _hier_grey(full):
    """Encode `full` as base-at-half-resolution + EXP + one SOF5
    differential frame; return (stream, expected uint8 plane) with
    the expectation computed by the ENCODER's own reconstruction."""
    full = np.asarray(full, np.int64)
    h, w = full.shape
    lo = full[::2, ::2]
    lh, lw = lo.shape
    c0 = _fdct(lo - 128)
    r0 = np.clip(np.round(_idct(c0))[:lh, :lw] + 128, 0, 255) \
        .astype(np.int64)
    r0e = _double(r0, 1, 1)[:h, :w]
    diff = full - r0e
    c1 = _fdct(diff)
    d1 = np.round(_idct(c1))[:h, :w].astype(np.int64)
    expected = np.clip(r0e + d1, 0, 255).astype(np.uint8)
    stream = (b"\xff\xd8" + _tables() + _dhp(h, w, 1)
              + _frame(0xC0, [c0], lh, lw)
              + _seg(0xDF, bytes([0x11]))
              + _frame(0xC5, [c1], h, w)
              + b"\xff\xd9")
    return stream, expected


def _smooth(h, w, seed):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w]
    base = (128 + 60 * np.sin(xx / 5) + 40 * np.cos(yy / 4)
            + rng.integers(-6, 7, size=(h, w)))
    return np.clip(base, 0, 255).astype(np.int64)


def test_hierarchical_grey_two_level_exact():
    full = _smooth(16, 24, 1)
    stream, expected = _hier_grey(full)
    out = decode_jpeg_pixels(stream)
    assert out.shape == (16, 24, 1)
    assert np.array_equal(out[:, :, 0], expected)
    # the pyramid converges on the source (q=1: only DCT rounding)
    assert int(np.abs(expected.astype(int) - full).max()) <= 3


def test_hierarchical_odd_dims_crop_after_exp():
    full = _smooth(15, 9, 2)
    stream, expected = _hier_grey(full)
    out = decode_jpeg_pixels(stream)
    assert out.shape == (15, 9, 1)
    assert np.array_equal(out[:, :, 0], expected)


def test_hierarchical_color_exact():
    h, w = 16, 16
    planes = [_smooth(h, w, 10 + i) for i in range(3)]
    los = [p[::2, ::2] for p in planes]
    c0s = [_fdct(p - 128) for p in los]
    r0s = [np.clip(np.round(_idct(c))[:8, :8] + 128, 0, 255)
           .astype(np.int64) for c in c0s]
    r0es = [_double(r, 1, 1)[:h, :w] for r in r0s]
    c1s = [_fdct(planes[i] - r0es[i]) for i in range(3)]
    d1s = [np.round(_idct(c))[:h, :w].astype(np.int64) for c in c1s]
    refs = [np.clip(r0es[i] + d1s[i], 0, 255).astype(np.float64)
            for i in range(3)]
    y, cb, cr = refs[0], refs[1] - 128.0, refs[2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=2)
    expected = np.clip(np.round(rgb), 0, 255).astype(np.uint8)
    stream = (b"\xff\xd8" + _tables() + _dhp(h, w, 3)
              + _frame(0xC0, c0s, 8, 8)
              + _seg(0xDF, bytes([0x11]))
              + _frame(0xC5, c1s, h, w)
              + b"\xff\xd9")
    out = decode_jpeg_pixels(stream)
    assert out.shape == (h, w, 3)
    assert np.array_equal(out, expected)


def test_hierarchical_three_levels_horizontal_only_exp():
    """Two EXP steps, the second horizontal-only — each level's
    reference doubles exactly per the §J filter."""
    full = _smooth(8, 32, 3)
    l2 = full[:, ::4]                           # 8x8
    l1 = full[:, ::2]                           # 8x16
    c0 = _fdct(l2 - 128)
    r = np.clip(np.round(_idct(c0))[:8, :8] + 128, 0, 255) \
        .astype(np.int64)
    r = _double(r, 1, 0)
    c1 = _fdct(l1 - r)
    r = np.clip(r + np.round(_idct(c1))[:8, :16].astype(np.int64),
                0, 255)
    r = _double(r, 1, 0)
    c2 = _fdct(full - r)
    expected = np.clip(
        r + np.round(_idct(c2))[:8, :32].astype(np.int64),
        0, 255).astype(np.uint8)
    stream = (b"\xff\xd8" + _tables() + _dhp(8, 32, 1)
              + _frame(0xC0, [c0], 8, 8)
              + _seg(0xDF, bytes([0x10]))
              + _frame(0xC5, [c1], 8, 16)
              + _seg(0xDF, bytes([0x10]))
              + _frame(0xC5, [c2], 8, 32)
              + b"\xff\xd9")
    out = decode_jpeg_pixels(stream)
    assert np.array_equal(out[:, :, 0], expected)


def test_hierarchical_corruption_and_loud_tiers():
    full = _smooth(16, 16, 4)
    stream, _ = _hier_grey(full)
    lo = full[::2, ::2]
    c0 = _fdct(lo - 128)
    head = b"\xff\xd8" + _tables() + _dhp(16, 16, 1)
    # differential frame with no reference yet
    with pytest.raises(ValueError, match="without a reference"):
        decode_jpeg_pixels(head + _frame(0xC5, [c0], 8, 8)
                           + b"\xff\xd9")
    # EXP factor out of range
    with pytest.raises(ValueError, match="EXP factors"):
        decode_jpeg_pixels(head + _frame(0xC0, [c0], 8, 8)
                           + _seg(0xDF, bytes([0x22]))
                           + _frame(0xC5, [c0], 16, 16) + b"\xff\xd9")
    # frame dims that cannot come from the expanded reference
    with pytest.raises(ValueError, match="dimension mismatch"):
        decode_jpeg_pixels(head + _frame(0xC0, [c0], 8, 8)
                           + _frame(0xC5, [c0], 8, 8).replace(
                               _sof(0xC5, 8, 8, 1),
                               _sof(0xC5, 6, 6, 1))
                           + b"\xff\xd9")
    # lossless and arithmetic stay loud inside hierarchical mode
    with pytest.raises(NotImplementedError, match="lossless"):
        decode_jpeg_pixels(head + _sof(0xC3, 8, 8, 1) + b"\xff\xd9")
    with pytest.raises(NotImplementedError, match="arithmetic"):
        decode_jpeg_pixels(head + _sof(0xC9, 8, 8, 1) + b"\xff\xd9")
    # repeated DHP is structural corruption
    with pytest.raises(ValueError, match="repeated DHP"):
        decode_jpeg_pixels(head + _dhp(16, 16, 1) + b"\xff\xd9")
    # hierarchical frame without scans
    with pytest.raises(ValueError, match="without scans"):
        decode_jpeg_pixels(head + _sof(0xC0, 8, 8, 1)
                           + _seg(0xDF, bytes([0x11])) + b"\xff\xd9")
    # the happy path still decodes after all that
    assert decode_jpeg_pixels(stream).shape == (16, 16, 1)


def test_hierarchical_exp_bomb_is_bounded():
    """Dozens of EXP markers must die at the decode cap, not allocate
    2^n reference planes."""
    full = _smooth(16, 16, 5)
    lo = full[::2, ::2]
    c0 = _fdct(lo - 128)
    head = (b"\xff\xd8" + _tables() + _dhp(16, 16, 1)
            + _frame(0xC0, [c0], 8, 8))
    bomb = head + _seg(0xDF, bytes([0x11])) * 40 + b"\xff\xd9"
    with pytest.raises(ValueError, match="decode cap"):
        decode_jpeg_pixels(bomb)


def test_hierarchical_resize_tier_is_real(spark):
    """Hierarchical JPEGs ride the real-pixel resize tiers now
    (passthrough when small, resampled when large), not decoded-dims."""
    from big_data_crypto_sentiment_spark.operators.multimodal import (
        resize_images,
    )
    small, _ = _hier_grey(_smooth(16, 24, 6))
    big, _ = _hier_grey(_smooth(260, 300, 7))
    df = spark.createDataFrame(
        [(1, "image", bytearray(small), None, None, None, None),
         (2, "image", bytearray(big), None, None, None, None)],
        "media_id long, kind string, payload binary, mime string,"
        " width int, height int, duration_ms long")
    out = {r.media_id: r for r in
           resize_images(df, max_dim=224, use_real_codec=True).collect()}
    assert out[1].resize_status == "passthrough"
    assert out[2].resize_status == "resampled" and out[2].resized
    assert (out[2].src_width, out[2].src_height) == (300, 260)


def test_hierarchical_partial_component_scan_is_corrupt():
    """A color frame whose SOS covers only one component must die
    loudly instead of finalizing zero planes for the others."""
    h, w = 16, 16
    planes = [_smooth(h, w, 30 + i)[::2, ::2] for i in range(3)]
    c0s = [_fdct(p - 128) for p in planes]
    full = _frame(0xC0, c0s, 8, 8)
    # rebuild the frame with a single-component SOS over component 1
    sof = _sof(0xC0, 8, 8, 3)
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    wtr = _W()
    pred = 0
    for by in range(c0s[0].shape[0]):
        for bx in range(c0s[0].shape[1]):
            pred = _emit_block(wtr, c0s[0][by, bx].reshape(-1)[_ZZ],
                               pred)
    partial = sof + _seg(0xDA, sos) + wtr.done()
    stream = (b"\xff\xd8" + _tables() + _dhp(h, w, 3) + partial
              + b"\xff\xd9")
    with pytest.raises(ValueError, match="missing component scans"):
        decode_jpeg_pixels(stream)
    assert full  # the complete frame above remains a valid building block


def test_hierarchical_differential_progressive_without_scans_loud():
    """SOF6 decodes for real as of r15 (tests/test_jpeg_sof6.py pins
    it with an independent encoder); a SOF6 frame WITHOUT scans is
    structural corruption, same as every other frame kind."""
    full = _smooth(16, 16, 8)
    c0 = _fdct(full[::2, ::2] - 128)
    head = (b"\xff\xd8" + _tables() + _dhp(16, 16, 1)
            + _frame(0xC0, [c0], 8, 8) + _seg(0xDF, bytes([0x11])))
    with pytest.raises(ValueError, match="without scans"):
        decode_jpeg_pixels(head + _sof(0xC6, 16, 16, 1) + b"\xff\xd9")
