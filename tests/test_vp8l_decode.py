"""WebP-lossless (VP8L, RFC 9649) decode pins against an INDEPENDENT
spec-built encoder: LSB-first bit packing, canonical prefix codes via
the 19-symbol code-length code, the simple 1/2-symbol code form,
LZ77 backward references (raw scan-line distances AND the proximity
map's first entries), the color cache, meta-prefix groups, and all
four transforms (predictor, cross-color, subtract-green, palette with
sub-byte bundling).
"""

import heapq
import struct

import numpy as np
import pytest

from big_data_crypto_sentiment_spark.operators.multimodal import (
    _VP8L_DIST_MAP,
    decode_image_pixels,
    decode_media,
    decode_webp_pixels,
)

CLC_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12,
             13, 14, 15)


class _LsbWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, value, nbits):
        self.acc |= (value & ((1 << nbits) - 1)) << self.n
        self.n += nbits
        while self.n >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.n -= 8

    def put_code(self, code, length):
        """Canonical prefix code: MSB of the code goes first."""
        for i in range(length - 1, -1, -1):
            self.put((code >> i) & 1, 1)

    def done(self):
        if self.n:
            self.buf.append(self.acc & 0xFF)
            self.acc, self.n = 0, 0
        return bytes(self.buf)


def _huff_lengths(freqs: dict[int, int]) -> dict[int, int]:
    """Code lengths from symbol frequencies (plain Huffman; alphabets
    here are small enough that lengths stay well under 15)."""
    if len(freqs) == 1:
        return {next(iter(freqs)): 1}
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    depth: dict[int, int] = {s: 0 for s in freqs}
    ticket = len(heap)
    while len(heap) > 1:
        f1, _, s1 = heapq.heappop(heap)
        f2, _, s2 = heapq.heappop(heap)
        for s in s1 + s2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, ticket, s1 + s2))
        ticket += 1
    return depth


def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple]:
    """symbol -> (code, length), DEFLATE-canonical (length, symbol)."""
    out = {}
    code = 0
    prev = None
    for ln, sym in sorted((ln, s) for s, ln in lengths.items() if ln):
        if prev is not None:
            code = (code + 1) << (ln - prev)
        prev = ln
        out[sym] = (code, ln)
    return out


def _write_code(w: _LsbWriter, lengths: dict[int, int],
                alphabet: int):
    """One prefix code in the code-length-code form (no repeats —
    every length is a literal CLC symbol; zeros included)."""
    syms = sorted(lengths)
    if len(syms) <= 2 and all(s < 256 for s in syms):
        w.put(1, 1)                            # simple form
        w.put(len(syms) - 1, 1)
        first8 = 0 if syms[0] <= 1 else 1
        w.put(first8, 1)
        w.put(syms[0], 8 if first8 else 1)
        if len(syms) == 2:
            w.put(syms[1], 8)
        return
    w.put(0, 1)
    full = [lengths.get(s, 0) for s in range(alphabet)]
    # trim trailing zeros via max_symbol? keep it simple: emit all.
    clc_freq: dict[int, int] = {}
    for v in full:
        clc_freq[v] = clc_freq.get(v, 0) + 1
    clc_len = _huff_lengths(clc_freq)
    # CLC lengths must fit 3 bits (0-7): alphabets here are tiny
    assert all(v <= 7 for v in clc_len.values())
    num_codes = max(i for i, s in enumerate(CLC_ORDER)
                    if s in clc_len) + 1
    num_codes = max(num_codes, 4)
    w.put(num_codes - 4, 4)
    for i in range(num_codes):
        w.put(clc_len.get(CLC_ORDER[i], 0), 3)
    w.put(0, 1)                                # no max_symbol limit
    codes = _canonical_codes(clc_len)
    for v in full:
        c, ln = codes[v]
        w.put_code(c, ln)


class _Vp8lEncoder:
    """Literal/backref/cache token stream -> one entropy-coded image.
    Tokens: ("lit", a, r, g, b), ("copy", length, raw_distance),
    ("cache", a, r, g, b) — the encoder tracks the cache state to
    find the key."""

    def __init__(self, cache_bits=0):
        self.cache_bits = cache_bits
        self.cache = [0] * (1 << cache_bits) if cache_bits else None

    def _key(self, px):
        argb = (px[0] << 24) | (px[1] << 16) | (px[2] << 8) | px[3]
        return (0x1E35A7BD * argb & 0xFFFFFFFF) >> (32 - self.cache_bits)

    def _prefix(self, value):
        """value -> (prefix_code, extra_bits, n_extra)."""
        assert value >= 1
        if value <= 4:
            return value - 1, 0, 0
        v = value - 1
        extra = v.bit_length() - 2
        base = (2 + ((v >> extra) & 1)) << extra
        code = 2 * extra + 2 + ((v >> extra) & 1)
        return code, value - base - 1, extra

    def encode(self, w, tokens, is_main=True):
        # first pass: symbol streams
        green, red, blue, alpha, dist = {}, {}, {}, {}, {}
        seq = []
        for tok in tokens:
            if tok[0] == "lit":
                _, a, r, g, b = tok
                seq.append(("g", g))
                seq.append(("r", r))
                seq.append(("b", b))
                seq.append(("a", a))
                for d, s in ((green, g), (red, r), (blue, b),
                             (alpha, a)):
                    d[s] = d.get(s, 0) + 1
            elif tok[0] == "copy":
                _, length, rawd = tok
                lc, lx, ln = self._prefix(length)
                dc, dx, dn = self._prefix(rawd)
                gsym = 256 + lc
                green[gsym] = green.get(gsym, 0) + 1
                dist[dc] = dist.get(dc, 0) + 1
                seq.append(("G", gsym))
                seq.append(("x", lx, ln))
                seq.append(("D", dc))
                seq.append(("x", dx, dn))
            else:
                _, a, r, g, b = tok
                key = self._key((a, r, g, b))
                gsym = 256 + 24 + key
                green[gsym] = green.get(gsym, 0) + 1
                seq.append(("G", gsym))
        if not red:
            red[0] = 1
        if not blue:
            blue[0] = 1
        if not alpha:
            alpha[0] = 1
        if not dist:
            dist[0] = 1
        galpha = 256 + 24 + ((1 << self.cache_bits)
                             if self.cache_bits else 0)
        lens = {k: _huff_lengths(v) for k, v in
                (("g", green), ("r", red), ("b", blue), ("a", alpha),
                 ("d", dist))}
        codes = {k: _canonical_codes(v) for k, v in lens.items()}
        for k, ln in lens.items():
            if len(ln) == 1:                   # 0-bit tree: the
                sym = next(iter(ln))           # decoder reads nothing
                codes[k] = {sym: (0, 0)}
        # cache bit + codes
        if self.cache_bits:
            w.put(1, 1)
            w.put(self.cache_bits, 4)
        else:
            w.put(0, 1)
        if is_main:
            w.put(0, 1)                        # no meta prefix codes
        for key, alph in (("g", galpha), ("r", 256), ("b", 256),
                          ("a", 256), ("d", 40)):
            _write_code(w, lens[key], alph)
        for item in seq:
            kind = item[0]
            if kind == "x":
                _, v, nb = item
                if nb:
                    w.put(v, nb)
            elif kind in ("g", "r", "b", "a"):
                c, ln = codes[kind][item[1]]
                w.put_code(c, ln)
            elif kind == "G":
                c, ln = codes["g"][item[1]]
                w.put_code(c, ln)
            else:
                c, ln = codes["d"][item[1]]
                w.put_code(c, ln)


def _tokens_with_cache(pixels_argb, enc):
    """Greedy literal/cache tokenizer mirroring the decoder's cache."""
    toks = []
    for px in pixels_argb:
        if enc.cache is not None:
            key = enc._key(px)
            if enc.cache[key] == px:
                toks.append(("cache", *px))
                continue
            enc.cache[key] = px
        toks.append(("lit", *px))
    return toks


def _vp8l_container(w, h, body_fn, cache_bits=0,
                    transforms_fn=None) -> bytes:
    bw = _LsbWriter()
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)                               # alpha hint
    bw.put(0, 3)                               # version
    if transforms_fn is not None:
        transforms_fn(bw)
    bw.put(0, 1)                               # no (more) transforms
    body_fn(bw)
    payload = b"\x2f" + bw.done()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload \
        + (b"\x00" if len(payload) & 1 else b"")
    return b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" \
        + chunk


def _rand_argb(rng, n, lim=256):
    return [tuple(int(v) for v in rng.integers(0, lim, size=4))
            for _ in range(n)]


def test_vp8l_literals_roundtrip():
    rng = np.random.default_rng(0)
    w, h = 9, 5
    pixels = _rand_argb(rng, w * h)
    enc = _Vp8lEncoder()
    payload = _vp8l_container(
        w, h, lambda bw: enc.encode(bw, [("lit", *p) for p in pixels]))
    got = decode_webp_pixels(payload)
    assert got.shape == (h, w, 4)
    want = np.array([[p[1], p[2], p[3], p[0]] for p in pixels],
                    np.uint8).reshape(h, w, 4)
    assert (got == want).all()
    assert (decode_image_pixels(payload) == got).all()
    # the header tier reads the same dims
    meta = decode_media(payload, "image")
    assert (meta["width"], meta["height"]) == (w, h)


def test_vp8l_simple_codes_two_tone():
    # every channel uses <= 2 values -> all five codes take the
    # 1/2-symbol simple form
    w, h = 8, 3
    pixels = [(255, 200, 10, 0) if (i % 3) else (255, 0, 10, 77)
              for i in range(w * h)]
    enc = _Vp8lEncoder()
    payload = _vp8l_container(
        w, h, lambda bw: enc.encode(bw, [("lit", *p) for p in pixels]))
    got = decode_webp_pixels(payload)
    want = np.array([[p[1], p[2], p[3], p[0]] for p in pixels],
                    np.uint8).reshape(h, w, 4)
    assert (got == want).all()


def test_vp8l_backward_refs_raw_and_mapped():
    w, h = 8, 6
    rng = np.random.default_rng(1)
    row = _rand_argb(rng, w)
    # rows 1..5 copy row 0 via backrefs
    enc = _Vp8lEncoder()
    toks = [("lit", *p) for p in row]
    # raw scan-line distance w (code = w + 120)
    toks.append(("copy", w, w + 120))
    # mapped distance code 1 = (0, 1) -> one row above
    toks.append(("copy", 4 * w, 1))
    payload = _vp8l_container(w, h, lambda bw: enc.encode(bw, toks))
    got = decode_webp_pixels(payload)
    want_row = np.array([[p[1], p[2], p[3], p[0]] for p in row],
                        np.uint8)
    for y in range(h):
        assert (got[y] == want_row).all()
    # sanity on the map itself
    assert _VP8L_DIST_MAP[0] == (0, 1) and _VP8L_DIST_MAP[1] == (1, 0)


def test_vp8l_color_cache():
    w, h = 16, 4
    rng = np.random.default_rng(2)
    base = _rand_argb(rng, 8)
    pixels = [base[i % 8] for i in range(w * h)]
    enc = _Vp8lEncoder(cache_bits=6)
    toks = _tokens_with_cache(pixels, enc)
    assert any(t[0] == "cache" for t in toks)
    payload = _vp8l_container(
        w, h, lambda bw: enc.encode(bw, toks), cache_bits=6)
    got = decode_webp_pixels(payload)
    want = np.array([[p[1], p[2], p[3], p[0]] for p in pixels],
                    np.uint8).reshape(h, w, 4)
    assert (got == want).all()


def test_vp8l_subtract_green_transform():
    w, h = 6, 4
    rng = np.random.default_rng(3)
    pixels = _rand_argb(rng, w * h)
    # forward subtract-green on the residual stream
    resid = [(a, (r - g) & 0xFF, g, (b - g) & 0xFF)
             for a, r, g, b in pixels]
    enc = _Vp8lEncoder()

    def transforms(bw):
        bw.put(1, 1)                           # a transform follows
        bw.put(2, 2)                           # subtract green

    payload = _vp8l_container(
        w, h, lambda bw: enc.encode(bw, [("lit", *p) for p in resid]),
        transforms_fn=transforms)
    got = decode_webp_pixels(payload)
    want = np.array([[p[1], p[2], p[3], p[0]] for p in pixels],
                    np.uint8).reshape(h, w, 4)
    assert (got == want).all()


def test_vp8l_predictor_transform_modes():
    # block size 4 (size_bits=2): a 8x4 image has a 2x1 mode grid.
    # left block mode 1 (L), right block mode 2 (T).
    w, h = 8, 4
    rng = np.random.default_rng(4)
    img = [[None] * w for _ in range(h)]
    for y in range(h):
        for x in range(w):
            img[y][x] = tuple(int(v) for v in rng.integers(0, 256, 4))

    def predicted(x, y):
        if x == 0 and y == 0:
            return (255, 0, 0, 0)
        if y == 0:
            return img[0][x - 1]
        if x == 0:
            return img[y - 1][0]
        mode = 1 if x < 4 else 2
        if mode == 1:
            return img[y][x - 1]
        return img[y - 1][x]

    resid = []
    for y in range(h):
        for x in range(w):
            p = predicted(x, y)
            resid.append(tuple((v - pv) & 0xFF
                               for v, pv in zip(img[y][x], p)))
    enc = _Vp8lEncoder()
    mode_enc = _Vp8lEncoder()

    def transforms(bw):
        bw.put(1, 1)
        bw.put(0, 2)                           # predictor
        bw.put(0, 3)                           # size_bits = 2
        # 2x1 mode image: modes in the GREEN channel
        mode_enc.encode(bw, [("lit", 255, 0, 1, 0),
                             ("lit", 255, 0, 2, 0)], is_main=False)

    payload = _vp8l_container(
        w, h, lambda bw: enc.encode(bw, [("lit", *p) for p in resid]),
        transforms_fn=transforms)
    got = decode_webp_pixels(payload)
    want = np.array([[(p[1], p[2], p[3], p[0]) for p in row]
                     for row in img], np.uint8)
    assert (got == want).all()


def test_vp8l_color_indexing_with_bundling():
    # 3-color palette -> width_bits=2 (4 indices per green byte)
    w, h = 10, 3
    palette = [(255, 250, 10, 3), (255, 0, 128, 200), (128, 9, 9, 9)]
    rng = np.random.default_rng(5)
    idx = rng.integers(0, 3, size=(h, w))
    packed_w = -(-w // 4)
    packed = []
    for y in range(h):
        for bx in range(packed_w):
            g = 0
            for j in range(4):
                x = bx * 4 + j
                if x < w:
                    g |= int(idx[y, x]) << (2 * j)
            packed.append((255, 0, g, 0))
    pal_enc = _Vp8lEncoder()
    enc = _Vp8lEncoder()

    def transforms(bw):
        bw.put(1, 1)
        bw.put(3, 2)                           # color indexing
        bw.put(len(palette) - 1, 8)
        # palette entries are DELTA-coded component-wise
        prev = (0, 0, 0, 0)
        toks = []
        for p in palette:
            toks.append(("lit", *[(a - b) & 0xFF
                                  for a, b in zip(p, prev)]))
            prev = p
        pal_enc.encode(bw, toks, is_main=False)

    # the container carries the REAL dims; the decoder derives the
    # packed width from the palette size itself
    payload = _vp8l_container(
        w, h,
        lambda bw: enc.encode(bw, [("lit", *p) for p in packed]),
        transforms_fn=transforms)
    got = decode_webp_pixels(payload)
    want = np.array(
        [[(palette[idx[y, x]][1], palette[idx[y, x]][2],
           palette[idx[y, x]][3], palette[idx[y, x]][0])
          for x in range(w)] for y in range(h)], np.uint8)
    assert got.shape == (h, w, 4)
    assert (got == want).all()


def test_vp8l_meta_prefix_groups():
    # 8x4 image, meta bits 2 -> 2x1 meta grid: group 0 left, group 1
    # right, with disjoint literal alphabets
    w, h = 8, 4
    left = [(255, 10, 20, 30)] * 4
    right = [(255, 200, 210, 220)] * 4
    pixels = []
    for y in range(h):
        pixels += left + right

    bw = _LsbWriter()
    bw.put(w - 1, 14)
    bw.put(h - 1, 14)
    bw.put(0, 1)
    bw.put(0, 3)
    bw.put(0, 1)                               # no transforms
    bw.put(0, 1)                               # no color cache
    bw.put(1, 1)                               # meta prefix present
    bw.put(0, 3)                               # meta_bits = 2
    meta_enc = _Vp8lEncoder()
    # meta image 2x1: green channel = group index (red = high byte)
    meta_enc.encode(bw, [("lit", 0, 0, 0, 0), ("lit", 0, 0, 1, 0)],
                    is_main=False)
    g0 = _Vp8lEncoder()
    g1 = _Vp8lEncoder()
    # group 0 codes then group 1 codes — but encode() writes the
    # cache bit; the group layout wants raw code sets. Build them by
    # hand: each group's five codes as simple forms.
    def simple(bwr, syms, alphabet):
        lens = {s: 1 for s in syms} if len(syms) > 1 else {syms[0]: 1}
        _write_code(bwr, lens, alphabet)

    simple(bw, [20], 280)                      # g0: green literal 20
    simple(bw, [10], 256)                      # red
    simple(bw, [30], 256)                      # blue
    simple(bw, [255], 256)                     # alpha
    simple(bw, [0], 40)                        # distance (unused)
    simple(bw, [210], 280)                     # g1 codes
    simple(bw, [200], 256)
    simple(bw, [220], 256)
    simple(bw, [255], 256)
    simple(bw, [0], 40)
    # all symbols are 0-bit codes: the pixel stream is EMPTY bits
    payload = b"\x2f" + bw.done()
    chunk = b"VP8L" + struct.pack("<I", len(payload)) + payload \
        + (b"\x00" if len(payload) & 1 else b"")
    webp = b"RIFF" + struct.pack("<I", 4 + len(chunk)) + b"WEBP" \
        + chunk
    got = decode_webp_pixels(webp)
    want = np.array([[(p[1], p[2], p[3], p[0]) for p in row]
                     for row in [pixels[y * w:(y + 1) * w]
                                 for y in range(h)]], np.uint8)
    assert (got == want).all()


def test_vp8l_corruption_raises():
    # truncated stream
    rng = np.random.default_rng(6)
    pixels = _rand_argb(rng, 12)
    enc = _Vp8lEncoder()
    good = _vp8l_container(
        4, 3, lambda bw: enc.encode(bw, [("lit", *p) for p in pixels]))
    with pytest.raises(ValueError):
        decode_webp_pixels(good[:24])
    # bad signature byte
    bad = bytearray(good)
    at = bad.index(b"VP8L") + 8
    bad[at] = 0x00
    with pytest.raises(ValueError, match="signature"):
        decode_webp_pixels(bytes(bad))
    # a VP8L body mislabeled as lossy VP8 stays loud either way:
    # with the system libwebp present (r13) it is rejected as a
    # corrupt lossy stream (ValueError); without it the lossy tier
    # is the documented NotImplementedError
    from big_data_crypto_sentiment_spark.operators.multimodal import (
        _libwebp,
    )
    lossy = bytearray(good)
    i = lossy.index(b"VP8L")
    lossy[i:i + 4] = b"VP8 "
    expected = ValueError if _libwebp() is not None \
        else NotImplementedError
    with pytest.raises(expected):
        decode_webp_pixels(bytes(lossy))


def test_vp8l_cross_color_transform():
    w, h = 8, 4
    rng = np.random.default_rng(7)
    img = [[tuple(int(v) for v in rng.integers(0, 256, 4))
            for _ in range(w)] for y in range(h)]
    # one 8x8 block (size_bits=3): single transform element
    g2r, g2b, r2b = 40, -30, 17                # signed deltas

    def s8(v):
        return v - 256 if v >= 128 else v

    def delta(t, c):
        cs = c - 256 if c >= 128 else c
        return (t * cs) >> 5

    resid = []
    for y in range(h):
        for x in range(w):
            a, r, g, b = img[y][x]
            # forward: subtract the deltas the decoder adds back
            r2 = (r - delta(g2r, g)) & 0xFF
            b2 = (b - delta(g2b, g) - delta(r2b, r)) & 0xFF
            resid.append((a, r2, g, b2))
    el_enc = _Vp8lEncoder()
    enc = _Vp8lEncoder()

    def transforms(bw):
        bw.put(1, 1)
        bw.put(1, 2)                           # cross-color
        bw.put(1, 3)                           # size_bits = 3
        # element: blue=g2r, green=g2b, red=r2b (all as uint8)
        el_enc.encode(bw, [("lit", 255, r2b & 0xFF, g2b & 0xFF,
                            g2r & 0xFF)], is_main=False)

    payload = _vp8l_container(
        w, h, lambda bw: enc.encode(bw, [("lit", *p) for p in resid]),
        transforms_fn=transforms)
    got = decode_webp_pixels(payload)
    want = np.array([[(p[1], p[2], p[3], p[0]) for p in row]
                     for row in img], np.uint8)
    assert (got == want).all()


def _spec_predict(mode, L, T, TL, TR):
    """Independent implementation of the 14 predictor modes from the
    RFC 9649 pseudocode (average2 trees, Select, the two
    clamp-add-subtract forms)."""
    def avg2(a, b):
        return tuple((x + y) >> 1 for x, y in zip(a, b))

    def clamp(v):
        return min(255, max(0, v))

    if mode == 0:
        return (255, 0, 0, 0)
    if mode == 1:
        return L
    if mode == 2:
        return T
    if mode == 3:
        return TR
    if mode == 4:
        return TL
    if mode == 5:
        return avg2(avg2(L, TR), T)
    if mode == 6:
        return avg2(L, TL)
    if mode == 7:
        return avg2(L, T)
    if mode == 8:
        return avg2(TL, T)
    if mode == 9:
        return avg2(T, TR)
    if mode == 10:
        return avg2(avg2(L, TL), avg2(T, TR))
    if mode == 11:
        p = tuple(lv + tv - tlv for lv, tv, tlv in zip(L, T, TL))
        pl = sum(abs(pc - lc) for pc, lc in zip(p, L))
        pt = sum(abs(pc - tc) for pc, tc in zip(p, T))
        return L if pl < pt else T
    if mode == 12:
        return tuple(clamp(lv + tv - tlv)
                     for lv, tv, tlv in zip(L, T, TL))
    ave = avg2(L, T)
    out = []
    for av, c in zip(ave, TL):
        d = av - c
        q = abs(d) >> 1
        out.append(clamp(av + (-q if d < 0 else q)))
    return tuple(out)


@pytest.mark.parametrize("mode", list(range(14)))
def test_vp8l_every_predictor_mode(mode):
    w, h = 8, 8                                # one 8x8 mode block
    rng = np.random.default_rng(100 + mode)
    img = [[tuple(int(v) for v in rng.integers(0, 256, 4))
            for _ in range(w)] for _ in range(h)]
    resid = []
    for y in range(h):
        for x in range(w):
            if x == 0 and y == 0:
                p = (255, 0, 0, 0)
            elif y == 0:
                p = img[0][x - 1]
            elif x == 0:
                p = img[y - 1][0]
            else:
                L, T, TL = img[y][x - 1], img[y - 1][x], \
                    img[y - 1][x - 1]
                TR = img[y - 1][x + 1] if x + 1 < w else img[y][0]
                p = _spec_predict(mode, L, T, TL, TR)
            resid.append(tuple((v - pv) & 0xFF
                               for v, pv in zip(img[y][x], p)))
    enc = _Vp8lEncoder()
    mode_enc = _Vp8lEncoder()

    def transforms(bw):
        bw.put(1, 1)
        bw.put(0, 2)
        bw.put(1, 3)                           # size_bits = 3
        mode_enc.encode(bw, [("lit", 255, 0, mode, 0)],
                        is_main=False)

    payload = _vp8l_container(
        w, h, lambda bw: enc.encode(bw, [("lit", *p) for p in resid]),
        transforms_fn=transforms)
    got = decode_webp_pixels(payload)
    want = np.array([[(p[1], p[2], p[3], p[0]) for p in row]
                     for row in img], np.uint8)
    assert (got == want).all(), f"mode {mode}"
