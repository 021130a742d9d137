"""SOF6 — hierarchical DIFFERENTIAL PROGRESSIVE JPEG (T.81 Annex J +
§G composed) — r15 tier. Deliberately kept LOUD through r14 because
the scan machinery would have accepted it unexercised; this file adds
the independent encoder that pins it: the hierarchical pyramid
encoder (test_jpeg_hierarchical's base-frame + EXP math) carrying its
differential frame as SOF6 with a full progressive scan script
(DC-first / AC-first / DC-refine / AC-refine through
test_jpeg_progressive's §G.1 entropy coder — complete successive
approximation, so the delivered coefficients are EXACT and the
decode must be bit-identical to the SOF5 sequential twin built from
the same pyramid)."""

import struct

import numpy as np
import pytest

from big_data_crypto_sentiment_spark.operators.multimodal import (
    decode_jpeg_pixels,
)
from tests.test_jpeg_hierarchical import (
    _dhp,
    _double,
    _fdct,
    _frame,
    _hier_grey,
    _idct,
    _seg,
    _smooth,
    _sof,
    _tables,
)
from tests.test_jpeg_progressive import (
    _ScanOps,
    _ac_first,
    _ac_refine,
    _dc_first,
    _dc_refine,
)

# complete successive-approximation script over one grey component:
# every coefficient bit is delivered, so reconstruction is exact
_SOF6_SCANS = [(0, 0, 0, 1), (1, 63, 0, 1), (0, 0, 1, 0), (1, 63, 1, 0)]


def _prog_diff_frame(coefs, h, w, scans=_SOF6_SCANS):
    """SOF6 frame: per-scan fixed-length DHT + SOS + entropy data for
    one grey component's differential coefficient grid (natural-order
    8x8 blocks, the hierarchical encoder's layout)."""
    out = bytearray(_sof(0xC6, h, w, 1))
    nby, nbx = coefs.shape[:2]
    blocks = [coefs[by, bx] for by in range(nby) for bx in range(nbx)]
    for ss, se, ah, al in scans:
        ops = _ScanOps()
        if ss == 0:
            named = ((0, b) for b in blocks)
            if ah == 0:
                _dc_first(ops, named, al)
            else:
                _dc_refine(ops, named, al)
            tc = 0
        else:
            if ah == 0:
                _ac_first(ops, blocks, ss, se, al)
            else:
                _ac_refine(ops, blocks, ss, se, al)
            ops.flush_eobrun()
            tc = 1
        counts, symbols, data = ops.assemble()
        dht = bytes([(tc << 4) | 0]) + bytes(counts) + bytes(symbols)
        sos = (bytes([1, 1, 0x00])
               + bytes([ss, se, (ah << 4) | al]))
        out += _seg(0xC4, dht) + _seg(0xDA, sos) + data
    return bytes(out)


def _hier_grey_sof6(full):
    """Same pyramid as test_jpeg_hierarchical._hier_grey, but the
    differential frame rides as SOF6 progressive scans."""
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
              + _prog_diff_frame(c1, h, w)
              + b"\xff\xd9")
    return stream, expected


def test_sof6_two_level_grey_exact():
    full = _smooth(24, 32, 5)
    stream, expected = _hier_grey_sof6(full)
    got = decode_jpeg_pixels(stream)
    assert got.shape == (24, 32, 1)
    assert np.array_equal(got[:, :, 0], expected)


def test_sof6_matches_sof5_sequential_twin():
    """Decoder equivalence: the SAME pyramid's differential frame
    encoded SOF5-sequential and SOF6-progressive must decode to
    IDENTICAL pixels (both carry the exact same coefficients)."""
    full = _smooth(16, 24, 11)
    s5, expected = _hier_grey(full)
    s6, expected6 = _hier_grey_sof6(full)
    assert np.array_equal(expected, expected6)
    assert np.array_equal(decode_jpeg_pixels(s5), decode_jpeg_pixels(s6))


def test_sof6_odd_dims_crop_after_exp():
    full = _smooth(17, 23, 3)
    stream, expected = _hier_grey_sof6(full)
    got = decode_jpeg_pixels(stream)
    assert got.shape == (17, 23, 1)
    assert np.array_equal(got[:, :, 0], expected)


def test_sof6_spectral_band_split_script():
    """Band-split AC scans (1-5, 6-63) with refinements still deliver
    every coefficient bit — same exact reconstruction."""
    full = _smooth(16, 16, 7)
    full = np.asarray(full, np.int64)
    lo = full[::2, ::2]
    c0 = _fdct(lo - 128)
    r0 = np.clip(np.round(_idct(c0))[:8, :8] + 128, 0, 255) \
        .astype(np.int64)
    r0e = _double(r0, 1, 1)[:16, :16]
    c1 = _fdct(full - r0e)
    d1 = np.round(_idct(c1))[:16, :16].astype(np.int64)
    expected = np.clip(r0e + d1, 0, 255).astype(np.uint8)
    scans = [(0, 0, 0, 1), (1, 5, 0, 1), (6, 63, 0, 1),
             (0, 0, 1, 0), (1, 5, 1, 0), (6, 63, 1, 0)]
    stream = (b"\xff\xd8" + _tables() + _dhp(16, 16, 1)
              + _frame(0xC0, [c0], 8, 8)
              + _seg(0xDF, bytes([0x11]))
              + _prog_diff_frame(c1, 16, 16, scans)
              + b"\xff\xd9")
    assert np.array_equal(decode_jpeg_pixels(stream)[:, :, 0], expected)


def test_sof6_structural_gates():
    full = _smooth(16, 16, 2)
    stream, _ = _hier_grey_sof6(full)
    # truncating away the EOI/scans is loud
    with pytest.raises(ValueError):
        decode_jpeg_pixels(stream[:len(stream) // 2])
    # a SOF6 frame before any reference exists is corrupt
    c1 = _fdct(np.zeros((16, 16)))
    bad = (b"\xff\xd8" + _tables() + _dhp(16, 16, 1)
           + _prog_diff_frame(c1, 16, 16) + b"\xff\xd9")
    with pytest.raises(ValueError, match="without a reference"):
        decode_jpeg_pixels(bad)
