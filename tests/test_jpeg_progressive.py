"""Progressive JPEG (SOF2) decode — r11 verdict stretch #8.

The encoder here is an INDEPENDENT test-side implementation of T.81
§G.1 (the libjpeg-compatible progressive entropy coder): spectral
selection, successive approximation (DC and AC first + refinement
passes, point transforms, EOB runs with buffered correction bits),
per-scan Huffman tables emitted as mid-stream DHTs. A correct decoder
must reproduce EXACTLY the same pixels as the baseline twin built from
the same quantized coefficients (_quantize_ref's reference
reconstruction).
"""

import struct

import numpy as np
import pytest

from big_data_crypto_sentiment_spark.operators.multimodal import (
    decode_jpeg_pixels,
)
from tests.test_sinks_multimodal import (
    _BitWriter,
    _fixed_len_huff,
    _jpeg_encode,
    _quantize_ref,
    _test_image,
    _zigzag_nat,
)

# libjpeg's standard scan script for YCbCr (jcparam.c), component
# indices into the 3-component frame: spectral selection AND
# successive approximation, DC and AC refinements all exercised
STD_SCANS = [
    ((0, 1, 2), 0, 0, 0, 1),       # DC first, Al=1
    ((0,), 1, 5, 0, 2),            # Y AC band 1-5 first, Al=2
    ((2,), 1, 63, 0, 1),           # Cr full band first, Al=1
    ((1,), 1, 63, 0, 1),           # Cb full band first, Al=1
    ((0,), 6, 63, 0, 2),           # Y AC band 6-63 first, Al=2
    ((0,), 1, 63, 2, 1),           # Y AC refine Al 2->1
    ((0, 1, 2), 0, 0, 1, 0),       # DC refine Al 1->0
    ((2,), 1, 63, 1, 0),           # Cr AC refine
    ((1,), 1, 63, 1, 0),           # Cb AC refine
    ((0,), 1, 63, 1, 0),           # Y AC refine Al 1->0
]

SPECTRAL_ONLY_SCANS = [
    ((0, 1, 2), 0, 0, 0, 0),
    ((0,), 1, 5, 0, 0),
    ((0,), 6, 63, 0, 0),
    ((1,), 1, 63, 0, 0),
    ((2,), 1, 63, 0, 0),
]


class _ScanOps:
    """Symbol/bit op buffer: two passes (collect symbols to size the
    Huffman table, then emit) without duplicating the scan walk."""

    def __init__(self):
        self.ops = []                # ("sym", s) | ("bits", v, n)
        self.eobrun = 0
        self.be_bits = []            # correction bits owed to the run

    def sym(self, s):
        self.ops.append(("sym", s))

    def bits(self, v, n):
        if n:
            self.ops.append(("bits", v, n))

    def flush_eobrun(self):
        if self.eobrun == 0 and not self.be_bits:
            return
        if self.eobrun > 0:
            r = self.eobrun.bit_length() - 1
            self.sym(r << 4)
            self.bits(self.eobrun - (1 << r), r)
            self.eobrun = 0
        for b in self.be_bits:
            self.bits(b, 1)
        self.be_bits = []

    def assemble(self):
        """(huffman table DHT payload pieces, entropy bytes)."""
        syms = [s for kind, *p in self.ops if kind == "sym"
                for s in [p[0]]]
        counts, symbols, codes = _fixed_len_huff(syms or [0])
        bw = _BitWriter()
        for op in self.ops:
            if op[0] == "sym":
                length, code = codes[op[1]]
                bw.put(code, length)
            else:
                bw.put(op[1], op[2])
        bw.align_ones()
        return counts, symbols, bytes(bw.out)


def _dc_first(ops, blocks_iter, al):
    pred = {}
    for name, blk in blocks_iter:
        dc = int(blk.reshape(-1)[0]) >> al      # arithmetic shift
        diff = dc - pred.get(name, 0)
        pred[name] = dc
        s = abs(diff).bit_length()
        ops.sym(s)
        ops.bits(diff if diff >= 0 else diff + (1 << s) - 1, s)


def _dc_refine(ops, blocks_iter, al):
    for _, blk in blocks_iter:
        ops.bits((int(blk.reshape(-1)[0]) >> al) & 1, 1)


def _ac_first(ops, blocks, ss, se, al):
    zz = _zigzag_nat()
    for blk in blocks:
        seq = [int(blk.reshape(-1)[zz[k]]) for k in range(64)]
        r = 0
        for k in range(ss, se + 1):
            t = seq[k]
            if t == 0:
                r += 1
                continue
            mag = (t if t >= 0 else -t) >> al
            if mag == 0:
                r += 1
                continue
            ops.flush_eobrun()
            while r > 15:
                ops.sym(0xF0)
                r -= 16
            s = mag.bit_length()
            ops.sym((r << 4) | s)
            enc = mag if t >= 0 else (~mag & ((1 << s) - 1))
            ops.bits(enc, s)
            r = 0
        if r > 0:
            ops.eobrun += 1
            if ops.eobrun == 0x7FFF:
                ops.flush_eobrun()


def _ac_refine(ops, blocks, ss, se, al):
    zz = _zigzag_nat()
    p_hist = 1 << (al + 1)          # anything >= this was already set
    del p_hist
    for blk in blocks:
        seq = [int(blk.reshape(-1)[zz[k]]) for k in range(64)]
        absval = {}
        eob = ss - 1
        for k in range(ss, se + 1):
            a = (seq[k] if seq[k] >= 0 else -seq[k]) >> al
            absval[k] = a
            if a == 1:
                eob = k
        r = 0
        br = []
        for k in range(ss, se + 1):
            t = absval[k]
            if t == 0:
                r += 1
                continue
            if t > 1:                # history coefficient: correction
                br.append(t & 1)
                continue
            while r > 15 and k <= eob:
                ops.flush_eobrun()
                ops.sym(0xF0)
                r -= 16
                for b in br:
                    ops.bits(b, 1)
                br = []
            ops.flush_eobrun()
            ops.sym((r << 4) | 1)
            ops.bits(1 if seq[k] >= 0 else 0, 1)
            for b in br:
                ops.bits(b, 1)
            br = []
            r = 0
        if r > 0 or br:
            ops.eobrun += 1
            ops.be_bits.extend(br)
            if ops.eobrun == 0x7FFF:
                ops.flush_eobrun()


def _nonint_grid(w, h, comp, hmax, vmax):
    cw = -(-w * comp[2] // hmax)
    ch = -(-h * comp[3] // vmax)
    return -(-cw // 8), -(-ch // 8)


def _encode_progressive(img, scans, q=16, subsample=False):
    """Progressive SOF2 encoder. Returns (payload, reference_rgb) —
    the reference is the SAME reconstruction as the baseline twin's
    (identical quantized coefficients)."""
    h, w = img.shape[:2]
    comps, quantized, ref, mcux, mcuy, qtab, hmax, vmax = \
        _quantize_ref(img, q, subsample)
    zz = _zigzag_nat()

    def seg(marker, body):
        return (bytes((0xFF, marker)) + struct.pack(">H", 2 + len(body))
                + body)

    dqt = bytes([0x00]) + bytes(int(qtab.reshape(-1)[i]) for i in zz)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for i, (name, plane, ch_, cv) in enumerate(comps):
        sof += bytes([i + 1, (ch_ << 4) | cv, 0])
    payload = b"\xff\xd8" + seg(0xDB, dqt) + seg(0xC2, sof)

    for comp_idx, ss, se, ah, al in scans:
        ops = _ScanOps()
        scan_comps = [comps[i] for i in comp_idx]
        if ss == 0:
            def mcu_blocks():
                for my in range(mcuy):
                    for mx in range(mcux):
                        for name, plane, ch_, cv in scan_comps:
                            for by in range(cv):
                                for bx in range(ch_):
                                    yield name, quantized[name][
                                        (my * cv + by, mx * ch_ + bx)]

            if len(scan_comps) == 1:
                name, plane, ch_, cv = scan_comps[0]
                wb, hb = _nonint_grid(w, h, scan_comps[0], hmax, vmax)

                def mcu_blocks():
                    for by in range(hb):
                        for bx in range(wb):
                            yield name, quantized[name][(by, bx)]
            if ah == 0:
                _dc_first(ops, mcu_blocks(), al)
            else:
                _dc_refine(ops, mcu_blocks(), al)
            tc = 0
        else:
            assert len(scan_comps) == 1
            name, plane, ch_, cv = scan_comps[0]
            wb, hb = _nonint_grid(w, h, scan_comps[0], hmax, vmax)
            blocks = [quantized[name][(by, bx)]
                      for by in range(hb) for bx in range(wb)]
            if ah == 0:
                _ac_first(ops, blocks, ss, se, al)
            else:
                _ac_refine(ops, blocks, ss, se, al)
            ops.flush_eobrun()
            tc = 1
        # per-scan fixed-length table as table id 0, emitted mid-stream
        counts, symbols, data = ops.assemble()
        dht = bytes([(tc << 4) | 0]) + bytes(counts) + bytes(symbols)
        sos = bytes([len(scan_comps)])
        for i in comp_idx:
            sos += bytes([i + 1, 0x00])        # td=0, ta=0
        sos += bytes([ss, se, (ah << 4) | al])
        # DC refinement reads raw bits only, but a DHT still rides
        # along (legal; exercises table redefinition between scans)
        payload += seg(0xC4, dht) + seg(0xDA, sos) + data
    return payload + b"\xff\xd9", ref


def test_progressive_std_script_matches_baseline_twin():
    img = _test_image(24, 17, seed=9)
    base_payload, ref = _jpeg_encode(img, q=16)
    prog_payload, ref2 = _encode_progressive(img, STD_SCANS, q=16)
    assert (ref == ref2).all()
    base = decode_jpeg_pixels(base_payload)
    prog = decode_jpeg_pixels(prog_payload)
    assert prog.shape == (24, 17, 3)
    assert (prog == base).all()       # same coefficients, same pixels
    assert int(np.abs(prog.astype(int) - ref.astype(int)).max()) <= 1


def test_progressive_420_subsampled_nonint_grids():
    """4:2:0: Y's non-interleaved AC grid covers 2x2 blocks per MCU
    while chroma scans address the smaller ceil-divided grid — the
    T.81 A.2.2 split the padded store must honor."""
    img = _test_image(24, 20, seed=13)
    prog_payload, ref = _encode_progressive(img, STD_SCANS, q=16,
                                            subsample=True)
    prog = decode_jpeg_pixels(prog_payload)
    assert prog.shape == (24, 20, 3)
    assert int(np.abs(prog.astype(int) - ref.astype(int)).max()) <= 1
    base_payload, _ = _jpeg_encode(img, q=16, subsample=True)
    assert (prog == decode_jpeg_pixels(base_payload)).all()


def test_progressive_spectral_selection_only():
    img = _test_image(16, 16, seed=21)
    prog_payload, ref = _encode_progressive(img, SPECTRAL_ONLY_SCANS,
                                            q=16)
    prog = decode_jpeg_pixels(prog_payload)
    base_payload, _ = _jpeg_encode(img, q=16)
    assert (prog == decode_jpeg_pixels(base_payload)).all()


def test_progressive_eob_runs_span_blocks():
    """A mostly-flat image makes whole bands zero across many blocks —
    the encoder accumulates cross-block EOB runs (with correction bits
    buffered through refinement) and the decoder must walk them."""
    img = np.full((32, 32, 3), 77, dtype=np.uint8)
    img[0, 0] = (200, 10, 10)          # one busy corner block
    prog_payload, ref = _encode_progressive(img, STD_SCANS, q=16)
    prog = decode_jpeg_pixels(prog_payload)
    base_payload, _ = _jpeg_encode(img, q=16)
    assert (prog == decode_jpeg_pixels(base_payload)).all()
    assert int(np.abs(prog.astype(int) - ref.astype(int)).max()) <= 1


def test_progressive_structural_gates():
    img = _test_image(16, 16, seed=5)
    payload, _ = _encode_progressive(img, STD_SCANS, q=16)
    # truncated mid-scan entropy data -> ValueError
    with pytest.raises(ValueError):
        decode_jpeg_pixels(payload[:len(payload) // 2])
    # an AC scan claiming two components is structurally invalid
    sos_positions = []
    at = 0
    while True:
        at = payload.find(b"\xff\xda", at + 1)
        if at < 0:
            break
        sos_positions.append(at)
    ac_sos = sos_positions[1]          # scan 2 is a single-comp AC scan
    bad = bytearray(payload)
    bad[ac_sos + 4] = 2                # ns=2 on an AC scan
    with pytest.raises(ValueError):
        decode_jpeg_pixels(bytes(bad))


def test_progressive_through_resize_tier(spark):
    """A progressive payload now rides the REAL 'resampled' tier."""
    from big_data_crypto_sentiment_spark.operators.multimodal import (
        area_resample,
        decode_png_pixels,
        resize_images,
    )
    from big_data_crypto_sentiment_spark.schemas import MEDIA_SCHEMA
    img = _test_image(16, 16, seed=5)
    payload, _ = _encode_progressive(img, STD_SCANS, q=16)
    df = spark.createDataFrame(
        [(1, "image", payload, "image/jpeg", None, None, None)],
        MEDIA_SCHEMA)
    (r,) = resize_images(df, max_dim=8, use_real_codec=True).collect()
    assert r.resize_status == "resampled" and r.resized
    back = decode_png_pixels(bytes(r.payload))
    want = area_resample(decode_jpeg_pixels(payload), 8, 8)
    assert (back == want).all()
