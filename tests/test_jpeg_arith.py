"""Arithmetic-coded JPEG (T.81 Annex D coder) — r15 tier: SOF9
sequential (§F.2.4 decode procedures) AND SOF10 progressive (§G.4
successive approximation). The encoder here is INDEPENDENT of the
decoder: it drives the Annex D interval arithmetic with an exact
big-integer code register (carries resolve inside the integer, no
byte windowing) and re-derives the DC/AC decision trees from the spec
(F.1.4), sharing only the Table D.3 constants — which ARE the spec.
Decode is pinned by exact uint8 equality against a numpy replay of
the decoder's own math on the same rounded coefficients (the
test_jpeg_12bit discipline).

Also pins the coder core itself: multi-context random decision
round-trips, all 113 adaptive states reachable, measured bits/symbol
tracks binary entropy within the QM coder's known overhead, and the
fixed AC-sign state never adapts."""

import math
import random
import struct

import numpy as np
import pytest

from big_data_crypto_sentiment_spark.operators.multimodal import (
    _JPEG_ARITH_TAB,
    _JPEG_ARITH_FIXED,
    _JpegArithDecoder,
    _zigzag_order,
    decode_jpeg_pixels,
)

_ZZ = _zigzag_order()


class _ArithEnc:
    """Annex D encoder over an exact big-int C register: CODELPS /
    CODEMPS / RENORME per D.3-D.5, CLEARBITS flush per D.15, then
    byte assembly with JPEG 0xFF 0x00 stuffing."""

    def __init__(self):
        self.a = 0x10000
        self.c = 0
        self.shifts = 0

    def encode(self, stats: bytearray, i: int, d: int) -> None:
        sv = stats[i]
        qe, nlps, nmps, sw = _JPEG_ARITH_TAB[sv & 0x7F]
        mps = sv >> 7
        if d == mps:                           # CODEMPS
            self.a -= qe
            if self.a & 0x8000:
                return
            if self.a < qe:
                self.c += self.a
                self.a = qe
            stats[i] = (mps << 7) | nmps
        else:                                  # CODELPS
            self.a -= qe
            if self.a >= qe:
                self.c += self.a
                self.a = qe
            stats[i] = ((mps ^ sw) << 7) | nlps
        while not (self.a & 0x8000):           # RENORME
            self.a <<= 1
            self.c <<= 1
            self.shifts += 1

    def flush(self) -> bytes:
        t = (self.c + self.a - 1) & ~0xFFFF    # CLEARBITS
        if t < self.c:
            t += 0x8000
        self.c = t
        nbits = self.shifts + 16
        nbytes = (nbits + 7) // 8
        raw = (self.c << (nbytes * 8 - nbits)).to_bytes(nbytes, "big")
        out = bytearray()
        for b in raw:
            out.append(b)
            if b == 0xFF:
                out.append(0x00)
        return bytes(out)


def _enc_dc(enc, stats, ctx, cond, diff):
    """F.1.4.1 mirror of the decoder's DC tree; returns next ctx."""
    low, up = cond
    st = ctx
    if diff == 0:
        enc.encode(stats, st, 0)
        return 0
    enc.encode(stats, st, 1)
    sign = 1 if diff < 0 else 0
    enc.encode(stats, st + 1, sign)
    st += 2 + sign
    v = -diff if sign else diff
    w = v - 1
    if w == 0:
        enc.encode(stats, st, 0)
        m = 0
    else:
        enc.encode(stats, st, 1)
        t = w.bit_length() - 1
        st = 20
        for _ in range(t):
            enc.encode(stats, st, 1)
            st += 1
        enc.encode(stats, st, 0)
        m = 1 << t
    if m < (1 << low) >> 1:
        nctx = 0
    elif m > (1 << up) >> 1:
        nctx = 12 + 4 * sign
    else:
        nctx = 4 + 4 * sign
    st += 14
    mm = m
    while mm >> 1:
        mm >>= 1
        enc.encode(stats, st, 1 if w & mm else 0)
    return nctx


def _enc_block(enc, dc_stats, ac_stats, fixed, zzc, dc_state, cond, kx):
    diff = int(zzc[0]) - dc_state[0]
    dc_state[1] = _enc_dc(enc, dc_stats, dc_state[1], cond, diff)
    dc_state[0] = int(zzc[0])
    nz = [i for i in range(1, 64) if zzc[i]]
    last = nz[-1] if nz else 0
    k = 1
    while k <= 63:
        st = 3 * (k - 1)
        if k > last:
            enc.encode(ac_stats, st, 1)        # EOB
            return
        enc.encode(ac_stats, st, 0)
        while not zzc[k]:
            enc.encode(ac_stats, st + 1, 0)
            st += 3
            k += 1
        enc.encode(ac_stats, st + 1, 1)
        coef = int(zzc[k])
        sign = 1 if coef < 0 else 0
        enc.encode(fixed, 0, sign)
        st += 2
        v = -coef if sign else coef
        w = v - 1
        if w == 0:
            enc.encode(ac_stats, st, 0)
            m = 0
        elif w == 1:
            enc.encode(ac_stats, st, 1)
            enc.encode(ac_stats, st, 0)
            m = 1
        else:
            enc.encode(ac_stats, st, 1)
            enc.encode(ac_stats, st, 1)
            t = w.bit_length() - 1
            st = 189 if k <= kx else 217
            for _ in range(t - 1):
                enc.encode(ac_stats, st, 1)
                st += 1
            enc.encode(ac_stats, st, 0)
            m = 1 << t
        st += 14
        mm = m
        while mm >> 1:
            mm >>= 1
            enc.encode(ac_stats, st, 1 if w & mm else 0)
        k += 1
    # all 63 AC coefficients present: no EOB decision after k=63


def _seg(marker, body):
    return bytes([0xFF, marker]) + struct.pack(">H", len(body) + 2) + body


def _dct_blocks(img, prec=8):
    h, w = img.shape
    k = np.arange(8)[:, None]
    nn = np.arange(8)[None, :]
    C = np.cos((2 * nn + 1) * k * np.pi / 16) \
        * np.where(k == 0, np.sqrt(1 / 8), np.sqrt(2 / 8))
    x = img.astype(np.float64) - (1 << (prec - 1))
    blocks = x.reshape(h // 8, 8, w // 8, 8).transpose(0, 2, 1, 3)
    return np.round(np.einsum("ij,vhjk,kl->vhil", C, blocks,
                              C.T)).astype(np.int64)


def _encode_arith(planes, prec=8, restart=0, dac=None):
    """SOF9 stream from full-resolution planes (q=1, no subsampling);
    `dac` = optional list of (tc, tb, value) DAC conditioning entries;
    `restart` = MCUs per restart interval (fresh coder + statistics
    per segment, RSTn between)."""
    ncomp = len(planes)
    h, w = planes[0].shape
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = bytes([prec]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])
    out += _seg(0xC9, sof)
    dc_cond, kx = (0, 1), 5
    if dac:
        body = b"".join(bytes([(tc << 4) | tb, v]) for tc, tb, v in dac)
        out += _seg(0xCC, body)
        for tc, tb, v in dac:
            if tc == 0 and tb == 0:
                dc_cond = (v & 0x0F, v >> 4)
            if tc == 1 and tb == 0:
                kx = v
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += _seg(0xDA, sos)
    coefs = [_dct_blocks(p, prec) for p in planes]
    nby, nbx = coefs[0].shape[:2]

    def fresh():
        return (_ArithEnc(), bytearray(64), bytearray(256),
                bytearray([_JPEG_ARITH_FIXED]),
                [[0, 0] for _ in range(ncomp)])

    enc, dcs, acs, fixed, states = fresh()
    mcu = 0
    rst = 0
    for by in range(nby):
        for bx in range(nbx):
            if restart and mcu and mcu % restart == 0:
                out += enc.flush()
                out += bytes([0xFF, 0xD0 + (rst % 8)])
                rst += 1
                enc, dcs, acs, fixed, states = fresh()
            for ci in range(ncomp):
                zzc = coefs[ci][by, bx].reshape(-1)[_ZZ]
                _enc_block(enc, dcs, acs, fixed, zzc, states[ci],
                           dc_cond, kx)
            mcu += 1
    out += enc.flush()
    out += b"\xff\xd9"
    return bytes(out), coefs


def _expected(coefs, prec=8):
    """Exact numpy replay of the decoder's math on the SAME rounded
    coefficients (IDCT + level shift + clip, high-byte emit at 12)."""
    k = np.arange(8)[:, None]
    nn = np.arange(8)[None, :]
    C = np.cos((2 * nn + 1) * k * np.pi / 16) \
        * np.where(k == 0, np.sqrt(1 / 8), np.sqrt(2 / 8))
    mx = (1 << prec) - 1
    planes = []
    for Fc in coefs:
        sp = np.einsum("ij,vhjk,kl->vhil", C.T, Fc.astype(np.float64),
                       C) + (1 << (prec - 1))
        nby, nbx = Fc.shape[:2]
        planes.append(sp.transpose(0, 2, 1, 3).reshape(nby * 8, nbx * 8))
    shift = prec - 8
    if len(planes) == 1:
        g = np.clip(np.round(planes[0]), 0, mx).astype(np.int32)
        return (g >> shift).astype(np.uint8)[:, :, None]
    half = float(1 << (prec - 1))
    y, cb, cr = planes[0], planes[1] - half, planes[2] - half
    rgb = np.stack([y + 1.402 * cr,
                    y - 0.344136 * cb - 0.714136 * cr,
                    y + 1.772 * cb], axis=2)
    return (np.clip(np.round(rgb), 0, mx)
              .astype(np.int32) >> shift).astype(np.uint8)


def _img(h, w, seed, prec=8):
    y, x = np.mgrid[0:h, 0:w]
    return ((x * 37 + y * 101 + seed * 53) % (1 << prec)).astype(np.int64)


# --- coder-core pins ---

def test_state_table_structure():
    assert len(_JPEG_ARITH_TAB) == 114
    assert all(0 <= l < 114 and 0 <= m < 114
               for _, l, m, _ in _JPEG_ARITH_TAB)
    seen, stack = {0}, [0]
    while stack:
        i = stack.pop()
        for t in _JPEG_ARITH_TAB[i][1:3]:
            if t not in seen and t < 113:
                seen.add(t)
                stack.append(t)
    assert len(seen) == 113                    # every adaptive state
    qe, nlps, nmps, sw = _JPEG_ARITH_TAB[113]  # fixed ~0.5 sign state
    assert (nlps, nmps, sw) == (113, 113, 0)


def test_random_decision_round_trips():
    rng = random.Random(7)
    for _ in range(60):
        n_ctx = rng.randint(1, 6)
        probs = [rng.random() for _ in range(n_ctx)]
        seq = [(i % n_ctx,
                1 if rng.random() < probs[i % n_ctx] else 0)
               for i in range(rng.randint(1, 600))]
        enc = _ArithEnc()
        st_e = bytearray(n_ctx)
        for ctx, d in seq:
            enc.encode(st_e, ctx, d)
        # the decoder consumes DESTUFFED segment bytes (the marker
        # walk's _jpeg_entropy_segments strips the 0xFF 0x00 stuffing)
        dec = _JpegArithDecoder(enc.flush().replace(b"\xff\x00",
                                                    b"\xff"))
        st_d = bytearray(n_ctx)
        for ctx, d in seq:
            assert dec.decode(st_d, ctx) == d


def test_coder_efficiency_tracks_entropy():
    rng = random.Random(1)
    for p in (0.8, 0.95, 0.99):
        n = 20000
        seq = [1 if rng.random() < p else 0 for _ in range(n)]
        enc = _ArithEnc()
        st = bytearray(1)
        for d in seq:
            enc.encode(st, 0, d)
        rate = len(enc.flush()) * 8 / n
        ent = -(p * math.log2(p) + (1 - p) * math.log2(1 - p))
        assert rate < ent * 1.25 + 0.01        # QM overhead bound


def test_fixed_sign_state_never_adapts():
    enc = _ArithEnc()
    fixed = bytearray([_JPEG_ARITH_FIXED])
    for d in (0, 1, 1, 0, 1, 0, 0, 1):
        enc.encode(fixed, 0, d)
    assert fixed[0] & 0x7F == _JPEG_ARITH_FIXED


# --- full SOF9 decode pins ---

def test_arith_grey_bit_exact():
    img = _img(24, 40, 3)
    payload, coefs = _encode_arith([img])
    got = decode_jpeg_pixels(payload)
    assert got.shape == (24, 40, 1)
    assert np.array_equal(got, _expected(coefs))


def test_arith_color_bit_exact():
    planes = [_img(16, 24, s) for s in (1, 2, 9)]
    payload, coefs = _encode_arith(planes)
    got = decode_jpeg_pixels(payload)
    assert got.shape == (16, 24, 3)
    assert np.array_equal(got, _expected(coefs))


def test_arith_restart_markers_reset_everything():
    img = _img(40, 48, 5)
    payload, coefs = _encode_arith([img], restart=3)
    assert b"\xff\xd0" in payload or b"\xff\xd1" in payload
    got = decode_jpeg_pixels(payload)
    assert np.array_equal(got, _expected(coefs))


def test_arith_custom_dac_conditioning():
    img = _img(24, 24, 11)
    payload, coefs = _encode_arith(
        [img], dac=[(0, 0, (2 << 4) | 1), (1, 1, 0)][:1] +
                   [(1, 0, 12)])           # DC (L=1,U=2), AC Kx=12
    got = decode_jpeg_pixels(payload)
    assert np.array_equal(got, _expected(coefs))


def test_arith_12bit_full_depth():
    img = _img(16, 16, 7, prec=12)
    payload, coefs = _encode_arith([img], prec=12)
    got = decode_jpeg_pixels(payload)
    assert np.array_equal(got, _expected(coefs, prec=12))


def test_arith_corruption_is_loud_not_wrong():
    img = _img(16, 16, 2)
    payload, _ = _encode_arith([img])
    # truncation ahead of EOI: the marker walk must not return pixels
    with pytest.raises((ValueError, NotImplementedError)):
        decode_jpeg_pixels(payload[:len(payload) // 2])
    # a sequential stream relabeled SOF10 is a structurally-invalid
    # progressive file (its scan claims the DC band with Se=63)
    bad = payload.replace(b"\xff\xc9", b"\xff\xca", 1)
    with pytest.raises(ValueError):
        decode_jpeg_pixels(bad)
    # arithmetic lossless (SOF11) stays the loud tier
    bad2 = payload.replace(b"\xff\xc9", b"\xff\xcb", 1)
    with pytest.raises(NotImplementedError):
        decode_jpeg_pixels(bad2)


def test_arith_compresses_smooth_content():
    """A smooth low-frequency image (mostly-zero AC) must decode
    bit-exact AND compress well below 1 byte/pixel — a sanity check
    that the adaptive coder actually compresses (a broken state
    machine would still round-trip but at ~1 bit/decision)."""
    y, x = np.mgrid[0:48, 0:48]
    img = ((x // 8 + y // 8) * 8 + 96).astype(np.int64)  # flat blocks
    payload, coefs = _encode_arith([img])
    got = decode_jpeg_pixels(payload)
    assert np.array_equal(got, _expected(coefs))
    assert len(payload) < img.size // 4       # < 2 bits/pixel


# --- SOF10: progressive arithmetic (T.81 §G.4) ---

def _enc_dc_first(enc, dcs, state, cond, dc, al):
    v = dc >> al                               # arithmetic shift
    state[1] = _enc_dc(enc, dcs, state[1], cond, v - state[0])
    state[0] = v


def _enc_ac_first(enc, acs, fixed, zzc, ss, se, al, kx):
    ke = se
    while ke >= ss and (abs(int(zzc[ke])) >> al) == 0:
        ke -= 1
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        enc.encode(acs, st, 0)                 # not EOB
        while (abs(int(zzc[k])) >> al) == 0:
            enc.encode(acs, st + 1, 0)
            st += 3
            k += 1
        enc.encode(acs, st + 1, 1)
        coef = int(zzc[k])
        sign = 1 if coef < 0 else 0
        enc.encode(fixed, 0, sign)
        st += 2
        v = abs(coef) >> al
        w = v - 1
        if w == 0:
            enc.encode(acs, st, 0)
            m = 0
        elif w == 1:
            enc.encode(acs, st, 1)
            enc.encode(acs, st, 0)
            m = 1
        else:
            enc.encode(acs, st, 1)
            enc.encode(acs, st, 1)
            t = w.bit_length() - 1
            st = 189 if k <= kx else 217
            for _ in range(t - 1):
                enc.encode(acs, st, 1)
                st += 1
            enc.encode(acs, st, 0)
            m = 1 << t
        st += 14
        mm = m
        while mm >> 1:
            mm >>= 1
            enc.encode(acs, st, 1 if w & mm else 0)
        k += 1
    if ke < se:
        enc.encode(acs, 3 * (k - 1), 1)        # EOB


def _enc_ac_refine(enc, acs, fixed, zzc, ss, se, al):
    kex = se
    while kex >= ss and (abs(int(zzc[kex])) >> (al + 1)) == 0:
        kex -= 1
    ke = se
    while ke >= ss and (abs(int(zzc[ke])) >> al) == 0:
        ke -= 1
    k = ss
    while k <= ke:
        st = 3 * (k - 1)
        if k > kex:
            enc.encode(acs, st, 0)             # not EOB
        while True:
            coef = int(zzc[k])
            a = abs(coef)
            if a >> (al + 1):                  # previously nonzero
                enc.encode(acs, st + 2, (a >> al) & 1)
                break
            if a >> al:                        # newly nonzero
                enc.encode(acs, st + 1, 1)
                enc.encode(fixed, 0, 1 if coef < 0 else 0)
                break
            enc.encode(acs, st + 1, 0)
            st += 3
            k += 1
        k += 1
    if ke < se:
        enc.encode(acs, 3 * (k - 1), 1)        # EOB


def _encode_arith_progressive(planes, prec=8, restart=0):
    """SOF10 stream: DC-first (interleaved, Al=1) -> per-component
    AC-first split bands (Al=1) -> DC refine (fixed bin, Al=0) ->
    per-component AC refine (Al=0). Complete successive approximation,
    so the decoded coefficients are EXACT."""
    ncomp = len(planes)
    h, w = planes[0].shape
    out = bytearray(b"\xff\xd8")
    out += _seg(0xDB, bytes([0x00]) + bytes([1] * 64))
    sof = bytes([prec]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0])
    out += _seg(0xCA, sof)
    if restart:
        out += _seg(0xDD, struct.pack(">H", restart))
    coefs = [_dct_blocks(p, prec) for p in planes]
    nby, nbx = coefs[0].shape[:2]
    zzs = [[[coefs[ci][by, bx].reshape(-1)[_ZZ]
             for bx in range(nbx)] for by in range(nby)]
           for ci in range(ncomp)]

    def sos(comps, ss, se, ah, al):
        body = bytes([len(comps)])
        for ci in comps:
            body += bytes([ci + 1, 0x00])
        body += bytes([ss, se, (ah << 4) | al])
        return _seg(0xDA, body)

    def dc_scan(ah, al):
        nonlocal out
        out += sos(list(range(ncomp)), 0, 0, ah, al)
        enc = _ArithEnc()
        dcs = bytearray(64)
        fixed = bytearray([_JPEG_ARITH_FIXED])
        states = [[0, 0] for _ in range(ncomp)]
        mcu, rst = 0, 0
        entropy = bytearray()
        for by in range(nby):
            for bx in range(nbx):
                if restart and mcu and mcu % restart == 0:
                    entropy += enc.flush()
                    entropy += bytes([0xFF, 0xD0 + (rst % 8)])
                    rst += 1
                    enc = _ArithEnc()
                    dcs = bytearray(64)
                    fixed = bytearray([_JPEG_ARITH_FIXED])
                    states = [[0, 0] for _ in range(ncomp)]
                for ci in range(ncomp):
                    dc = int(zzs[ci][by][bx][0])
                    if ah == 0:
                        _enc_dc_first(enc, dcs, states[ci],
                                      (0, 1), dc, al)
                    else:
                        enc.encode(fixed, 0, (dc >> al) & 1)
                mcu += 1
        entropy += enc.flush()
        out += entropy

    def ac_scan(ci, ss, se, ah, al):
        nonlocal out
        out += sos([ci], ss, se, ah, al)
        enc = _ArithEnc()
        acs = bytearray(256)
        fixed = bytearray([_JPEG_ARITH_FIXED])
        i, rst = 0, 0
        entropy = bytearray()
        for by in range(nby):
            for bx in range(nbx):
                if restart and i and i % restart == 0:
                    entropy += enc.flush()
                    entropy += bytes([0xFF, 0xD0 + (rst % 8)])
                    rst += 1
                    enc = _ArithEnc()
                    acs = bytearray(256)
                    fixed = bytearray([_JPEG_ARITH_FIXED])
                zzc = zzs[ci][by][bx]
                if ah == 0:
                    _enc_ac_first(enc, acs, fixed, zzc, ss, se, al, 5)
                else:
                    _enc_ac_refine(enc, acs, fixed, zzc, ss, se, al)
                i += 1
        entropy += enc.flush()
        out += entropy

    dc_scan(0, 1)
    for ci in range(ncomp):
        ac_scan(ci, 1, 5, 0, 1)
        ac_scan(ci, 6, 63, 0, 1)
    dc_scan(1, 0)
    for ci in range(ncomp):
        ac_scan(ci, 1, 63, 1, 0)
    out += b"\xff\xd9"
    return bytes(out), coefs


def test_arith_progressive_grey_bit_exact():
    img = _img(24, 32, 4)
    payload, coefs = _encode_arith_progressive([img])
    got = decode_jpeg_pixels(payload)
    assert got.shape == (24, 32, 1)
    assert np.array_equal(got, _expected(coefs))


def test_arith_progressive_color_bit_exact():
    planes = [_img(16, 16, s) for s in (3, 6, 8)]
    payload, coefs = _encode_arith_progressive(planes)
    got = decode_jpeg_pixels(payload)
    assert np.array_equal(got, _expected(coefs))


def test_arith_progressive_restart_markers():
    img = _img(32, 40, 9)
    payload, coefs = _encode_arith_progressive([img], restart=2)
    assert any(bytes([0xFF, 0xD0 + j]) in payload for j in range(8))
    got = decode_jpeg_pixels(payload)
    assert np.array_equal(got, _expected(coefs))


def test_arith_progressive_structural_gates():
    img = _img(16, 16, 1)
    payload, _ = _encode_arith_progressive([img])
    # truncation ahead of EOI stays loud
    with pytest.raises((ValueError, NotImplementedError)):
        decode_jpeg_pixels(payload[:len(payload) // 3])
