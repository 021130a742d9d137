"""Partially-interleaved sequential JPEG (T.81 §A.2.3), r13 — the last
multi-scan baseline form that was still a loud tier: scans carrying a
SUBSET of the frame components in MCU order, mixed with
single-component scans, pinned bit-exactly against an independent
spec-built encoder (q=1 so the expected pixels replay the rounded
coefficients exactly).
"""

import struct

import numpy as np
import pytest

from big_data_crypto_sentiment_spark.operators.multimodal import (
    decode_jpeg_pixels,
)
from tests.test_jpeg_12bit import (
    _AC_COUNTS,
    _AC_ENC,
    _AC_SYMS,
    _DC_COUNTS,
    _DC_ENC,
    _DC_SYMS,
    _ZZ,
    _BitStuffWriter,
    _emit_block,
    _seg,
)


def _dct_blocks8(plane):
    k = np.arange(8)[:, None]
    nn = np.arange(8)[None, :]
    C = np.cos((2 * nn + 1) * k * np.pi / 16) \
        * np.where(k == 0, np.sqrt(1 / 8), np.sqrt(2 / 8))
    h, w = plane.shape
    x = plane.astype(np.float64) - 128.0
    blocks = x.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    return np.round(np.einsum("ij,vhjk,kl->vhil", C, blocks,
                              C.T)).astype(np.int64)


def _encode_partial(planes, samplings, scans):
    """8-bit sequential JPEG with a SCAN SCRIPT: `planes[i]` at its own
    resolution, `samplings[i]` = (h, v), `scans` = list of
    component-index lists (len>1 → MCU-interleaved subset scan,
    len==1 → non-interleaved scan in the component's own grid)."""
    ncomp = len(planes)
    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    H = planes[0].shape[0] * vmax // samplings[0][1]
    W = planes[0].shape[1] * hmax // samplings[0][0]
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = bytes([8]) + struct.pack(">HH", H, W) + bytes([ncomp])
    for ci in range(ncomp):
        h, v = samplings[ci]
        sof += bytes([ci + 1, (h << 4) | v, 0])
    out += _seg(0xC0, sof)
    out += _seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS)
                + bytes(_DC_SYMS))
    out += _seg(0xC4, bytes([0x10]) + bytes(_AC_COUNTS)
                + bytes(_AC_SYMS))
    coefs = [_dct_blocks8(p) for p in planes]
    mcux = -(-W // (8 * hmax))
    mcuy = -(-H // (8 * vmax))
    for script in scans:
        sos = bytes([len(script)])
        for ci in script:
            sos += bytes([ci + 1, 0x00])
        sos += bytes([0, 63, 0])
        out += _seg(0xDA, sos)
        w = _BitStuffWriter()
        preds = {ci: 0 for ci in script}
        if len(script) == 1:
            ci = script[0]
            nby, nbx = coefs[ci].shape[:2]
            for by in range(nby):
                for bx in range(nbx):
                    zzc = coefs[ci][by, bx].reshape(-1)[_ZZ]
                    preds[ci] = _emit_block(w, zzc, preds[ci])
        else:
            for my in range(mcuy):
                for mx in range(mcux):
                    for ci in script:
                        hs, vs = samplings[ci]
                        for by in range(vs):
                            for bx in range(hs):
                                zzc = coefs[ci][my * vs + by,
                                                mx * hs + bx] \
                                    .reshape(-1)[_ZZ]
                                preds[ci] = _emit_block(w, zzc,
                                                        preds[ci])
        out += w.done()
    out += b"\xff\xd9"
    return bytes(out), coefs


def _expected_rgb(coefs, samplings):
    k = np.arange(8)[:, None]
    nn = np.arange(8)[None, :]
    C = np.cos((2 * nn + 1) * k * np.pi / 16) \
        * np.where(k == 0, np.sqrt(1 / 8), np.sqrt(2 / 8))
    hmax = max(s[0] for s in samplings)
    vmax = max(s[1] for s in samplings)
    planes = []
    for F, (hs, vs) in zip(coefs, samplings):
        sp = np.einsum("ij,vhjk,kl->vhil", C.T,
                       F.astype(np.float64), C) + 128.0
        nby, nbx = F.shape[:2]
        p = sp.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8)
        planes.append(np.repeat(np.repeat(p, vmax // vs, axis=0),
                                hmax // hs, axis=1))
    y, cb, cr = planes[0], planes[1] - 128.0, planes[2] - 128.0
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=2)
    return np.clip(np.round(rgb), 0, 255).astype(np.uint8)


def _grad(h, w, seed):
    y, x = np.mgrid[0:h, 0:w]
    return ((x * 13 + y * 29 + seed * 71) % 256).astype(np.int64)


def test_partial_interleave_1x1_two_plus_one():
    """(Y,Cb) MCU-interleaved, then Cr alone — all 1x1 sampling."""
    planes = [_grad(16, 24, s) for s in (1, 2, 3)]
    payload, coefs = _encode_partial(
        planes, [(1, 1)] * 3, [[0, 1], [2]])
    got = decode_jpeg_pixels(payload)
    assert got.shape == (16, 24, 3)
    assert (got == _expected_rgb(coefs, [(1, 1)] * 3)).all()


def test_partial_interleave_subsampled_y_pair():
    """Y at 2x2 with Cr in one partial scan (4+1 blocks per MCU),
    then Cb non-interleaved in its own grid."""
    sampl = [(2, 2), (1, 1), (1, 1)]
    planes = [_grad(32, 16, 4), _grad(16, 8, 5), _grad(16, 8, 6)]
    payload, coefs = _encode_partial(planes, sampl, [[0, 2], [1]])
    got = decode_jpeg_pixels(payload)
    assert got.shape == (32, 16, 3)
    assert (got == _expected_rgb(coefs, sampl)).all()


def test_single_component_scans_still_work_in_any_order():
    planes = [_grad(8, 8, s) for s in (7, 8, 9)]
    payload, coefs = _encode_partial(
        planes, [(1, 1)] * 3, [[2], [0], [1]])
    got = decode_jpeg_pixels(payload)
    assert (got == _expected_rgb(coefs, [(1, 1)] * 3)).all()


def test_repeated_component_scan_is_corrupt():
    planes = [_grad(8, 8, s) for s in (1, 2, 3)]
    payload, _ = _encode_partial(
        planes, [(1, 1)] * 3, [[0, 1], [2], [1]])
    with pytest.raises(ValueError, match="repeats a component"):
        decode_jpeg_pixels(payload)


def test_missing_component_scan_is_corrupt():
    planes = [_grad(8, 8, s) for s in (1, 2, 3)]
    payload, _ = _encode_partial(planes, [(1, 1)] * 3, [[0, 1]])
    with pytest.raises(ValueError, match="missing component"):
        decode_jpeg_pixels(payload)
