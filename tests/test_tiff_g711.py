"""Pins for the late-r12 decoders: baseline-TIFF pixel decode
(uncompressed / PackBits / LZW strips, grey / RGB / palette,
horizontal-differencing predictor, both byte orders) against an
independent spec-built writer, and G.711 mu-law / A-law WAV expansion
against the standard's known code points.
"""

import struct

import numpy as np
import pytest

from big_data_crypto_sentiment_spark.operators.multimodal import (
    decode_image_pixels,
    decode_tiff_pixels,
    decode_wav_samples,
)


# --- independent TIFF writer -------------------------------------
def _entry(bo, tag, typ, vals, heap, heap_base):
    size = {1: 1, 3: 2, 4: 4}[typ]
    fmt = {1: "B", 3: "H", 4: "I"}[typ]
    packed = b"".join(struct.pack(bo + fmt, v) for v in vals)
    e = struct.pack(bo + "HHI", tag, typ, len(vals))
    if len(packed) <= 4:
        return e + packed.ljust(4, b"\x00"), heap
    off = heap_base + len(heap)
    return e + struct.pack(bo + "I", off), heap + packed


def _tiff(width, height, strips, bo="<", compression=1, photo=1,
          spp=1, extra_tags=(), bits=8):
    """One-IFD TIFF: header, IFD, value heap, strip data. `bits` may
    be a list for per-sample depths (mixed-depth scans)."""
    rps = -(-height // len(strips))
    bps = list(bits) if isinstance(bits, (list, tuple)) \
        else [bits] * spp
    tags = [(256, 4, [width]), (257, 4, [height]),
            (258, 3, bps), (259, 3, [compression]),
            (262, 3, [photo]), (277, 3, [spp]), (278, 4, [rps])]
    tags += list(extra_tags)
    n = len(tags) + 2                     # + offsets/counts below
    ifd_at = 8
    heap_base = ifd_at + 2 + 12 * n + 4
    # strip data goes after the heap; two passes to fix offsets
    for _pass in range(2):
        heap = b""
        entries = []
        data_at = None
        offs, cnts = [], []
        at = heap_base
        # reserve heap for any >4-byte tag values first
        probe_heap = b""
        for tag, typ, vals in sorted(tags + [
                (273, 4, [0] * len(strips)),
                (279, 4, [len(s) for s in strips])]):
            size = {1: 1, 3: 2, 4: 4}[typ]
            if size * len(vals) > 4:
                probe_heap += b"\x00" * (size * len(vals))
        data_at = heap_base + len(probe_heap)
        off = data_at
        for s in strips:
            offs.append(off)
            cnts.append(len(s))
            off += len(s)
        all_tags = sorted(tags + [(273, 4, offs), (279, 4, cnts)])
        for tag, typ, vals in all_tags:
            e, heap = _entry(bo, tag, typ, vals, heap, heap_base)
            entries.append(e)
    hdr = (b"II*\x00" if bo == "<" else b"MM\x00*") \
        + struct.pack(bo + "I", ifd_at)
    ifd = struct.pack(bo + "H", n) + b"".join(entries) \
        + struct.pack(bo + "I", 0)
    assert heap_base == ifd_at + len(ifd)
    return hdr + ifd + heap.ljust(len(probe_heap), b"\x00") \
        + b"".join(strips)


def _packbits_encode(data: bytes) -> bytes:
    out = bytearray()
    i = 0
    while i < len(data):
        run = 1
        while (i + run < len(data) and run < 128
               and data[i + run] == data[i]):
            run += 1
        if run >= 2:
            out += bytes([257 - run, data[i]])
            i += run
        else:
            j = i + 1
            while (j < len(data) and j - i < 128
                   and not (j + 1 < len(data)
                            and data[j] == data[j + 1])):
                j += 1
            out += bytes([j - i - 1]) + data[i:j]
            i = j
    return bytes(out)


class _MsbWriter:
    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, width):
        self.acc = (self.acc << width) | code
        self.n += width
        while self.n >= 8:
            self.n -= 8
            self.buf.append((self.acc >> self.n) & 0xFF)

    def done(self):
        if self.n:
            self.buf.append((self.acc << (8 - self.n)) & 0xFF)
        return bytes(self.buf)


def _tiff_lzw_encode(data: bytes) -> bytes:
    """libtiff-convention LZW: MSB-first, clear at start, EARLY
    CHANGE (width bumps when the next free code passes 2^w - 1)."""
    w = _MsbWriter()
    width = 9
    table = {bytes([i]): i for i in range(256)}
    next_code = 258
    w.put(256, width)                     # clear
    cur = b""
    for b in data:
        wc = cur + bytes([b])
        if wc in table:
            cur = wc
            continue
        w.put(table[cur], width)
        table[wc] = next_code
        next_code += 1
        if next_code > (1 << width) - 1 and width < 12:
            width += 1
        cur = bytes([b])
    if cur:
        w.put(table[cur], width)
    w.put(257, width)                     # EOI
    return w.done()


def test_tiff_uncompressed_grey_both_byte_orders():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, size=(5, 7)).astype(np.uint8)
    for bo in ("<", ">"):
        p = _tiff(7, 5, [img.tobytes()], bo=bo)
        got = decode_tiff_pixels(p)
        assert got.shape == (5, 7, 1)
        assert (got[:, :, 0] == img).all()
        assert (decode_image_pixels(p) == got).all()


def test_tiff_white_is_zero_inverts():
    img = np.arange(12, dtype=np.uint8).reshape(3, 4)
    p = _tiff(4, 3, [img.tobytes()], photo=0)
    assert (decode_tiff_pixels(p)[:, :, 0] == 255 - img).all()


def test_tiff_rgb_multi_strip():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, size=(6, 4, 3)).astype(np.uint8)
    strips = [img[:3].tobytes(), img[3:].tobytes()]
    p = _tiff(4, 6, strips, photo=2, spp=3)
    assert (decode_tiff_pixels(p) == img).all()


def test_tiff_packbits_roundtrip():
    img = np.repeat(np.arange(8, dtype=np.uint8) * 30, 5) \
        .reshape(4, 10)
    raw = img.tobytes()
    p = _tiff(10, 4, [_packbits_encode(raw)], compression=32773)
    assert (decode_tiff_pixels(p)[:, :, 0] == img).all()


def test_tiff_lzw_roundtrip_grey_and_rgb():
    rng = np.random.default_rng(2)
    # enough data to push the code width past 9 bits and exercise
    # real dictionary hits (repeating structure)
    base = rng.integers(0, 8, size=(40, 50)).astype(np.uint8) * 16
    p = _tiff(50, 40, [_tiff_lzw_encode(base.tobytes())],
              compression=5)
    assert (decode_tiff_pixels(p)[:, :, 0] == base).all()

    img = rng.integers(0, 256, size=(9, 6, 3)).astype(np.uint8)
    p = _tiff(6, 9, [_tiff_lzw_encode(img.tobytes())],
              compression=5, photo=2, spp=3)
    assert (decode_tiff_pixels(p) == img).all()


def test_tiff_lzw_with_horizontal_predictor():
    rng = np.random.default_rng(3)
    img = np.cumsum(rng.integers(0, 4, size=(5, 12, 3)), axis=1) \
        .astype(np.uint8)
    diffed = np.empty_like(img, dtype=np.int64)
    diffed[:, 0] = img[:, 0]
    diffed[:, 1:] = (img[:, 1:].astype(np.int64)
                     - img[:, :-1].astype(np.int64))
    raw = (diffed & 0xFF).astype(np.uint8).tobytes()
    p = _tiff(12, 5, [_tiff_lzw_encode(raw)], compression=5,
              photo=2, spp=3, extra_tags=[(317, 3, [2])])
    assert (decode_tiff_pixels(p) == img).all()


def test_tiff_palette_colormap():
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8)
    # ColorMap: 3 planes of 4 16-bit values (R, G, B)
    cmap = ([0, 65535, 32768, 256] + [256, 0, 65535, 32768]
            + [32768, 256, 0, 65535])
    p = _tiff(2, 2, [idx.tobytes()], photo=3,
              extra_tags=[(320, 3, cmap)])
    got = decode_tiff_pixels(p)
    want_r = np.array([[0, 255], [128, 1]], np.uint8)
    assert (got[:, :, 0] == want_r).all()
    assert got[0, 0].tolist() == [0, 1, 128]


def test_tiff_corruption_raises_valueerror():
    img = np.zeros((3, 3), np.uint8)
    good = _tiff(3, 3, [img.tobytes()])
    with pytest.raises(ValueError):           # strip out of range
        decode_tiff_pixels(good[:-4])
    with pytest.raises(ValueError):           # palette without map
        decode_tiff_pixels(_tiff(3, 3, [img.tobytes()], photo=3))
    with pytest.raises(NotImplementedError):  # exotic compression
        decode_tiff_pixels(_tiff(3, 3, [img.tobytes()],
                                 compression=7))


# --- sub-8-bit (r14): 1/2/4-bit samples, MSB-first, byte-aligned
#     rows — packed by an INDEPENDENT packer, never the decoder's ---
def _pack_row(vals, bits):
    out, acc, n = bytearray(), 0, 0
    for v in vals:
        acc = (acc << bits) | int(v)
        n += bits
        if n == 8:
            out.append(acc)
            acc, n = 0, 0
    if n:
        out.append(acc << (8 - n))
    return bytes(out)


def _pack_img(img, bits):
    return b"".join(_pack_row(row, bits) for row in img)


def test_tiff_1bit_bilevel_both_polarities_and_row_padding():
    # width 10: rows pad to 2 bytes, pad bits must be ignored
    img = (np.arange(50).reshape(5, 10) % 2).astype(np.uint8)
    raw = _pack_img(img, 1)
    assert len(raw) == 5 * 2
    out = decode_tiff_pixels(_tiff(10, 5, [raw], bits=1, photo=1))
    assert out.shape == (5, 10, 1)
    assert np.array_equal(out[:, :, 0], img * 255)
    inv = decode_tiff_pixels(_tiff(10, 5, [raw], bits=1, photo=0))
    assert np.array_equal(inv[:, :, 0], 255 - img * 255)


def test_tiff_2bit_and_4bit_grey_rescale_both_byte_orders():
    for bits, scale in ((2, 85), (4, 17)):
        img = (np.arange(21).reshape(3, 7) % (1 << bits)) \
            .astype(np.uint8)
        raw = _pack_img(img, bits)
        for bo in ("<", ">"):
            out = decode_tiff_pixels(
                _tiff(7, 3, [raw], bo=bo, bits=bits))
            assert np.array_equal(out[:, :, 0], img * scale)


def test_tiff_4bit_palette_keeps_raw_indices():
    img = (np.arange(12).reshape(3, 4) % 5).astype(np.uint8)
    cmap = []
    for ch in range(3):
        cmap += [(i * 13 + ch * 7) % 256 * 257 for i in range(16)]
    out = decode_tiff_pixels(
        _tiff(4, 3, [_pack_img(img, 4)], bits=4, photo=3,
              extra_tags=[(320, 3, cmap)]))
    assert out.shape == (3, 4, 3)
    for ch in range(3):
        exp = (img.astype(int) * 13 + ch * 7) % 256
        assert np.array_equal(out[:, :, ch], exp)


def test_tiff_1bit_multistrip_lzw_and_4bit_packbits():
    img = ((np.arange(128).reshape(16, 8) // 3) % 2).astype(np.uint8)
    strips = [_tiff_lzw_encode(_pack_img(img[i:i + 4], 1))
              for i in range(0, 16, 4)]
    out = decode_tiff_pixels(
        _tiff(8, 16, strips, bits=1, compression=5))
    assert np.array_equal(out[:, :, 0], img * 255)
    img4 = (np.arange(36).reshape(6, 6) % 16).astype(np.uint8)
    out4 = decode_tiff_pixels(
        _tiff(6, 6, [_packbits_encode(_pack_img(img4, 4))],
              bits=4, compression=32773))
    assert np.array_equal(out4[:, :, 0], img4 * 17)


def _rev_bytes(data: bytes) -> bytes:
    return bytes(int(f"{b:08b}"[::-1], 2) for b in data)


def test_tiff_sub8_fillorder2_decodes():
    """r15: FillOrder 2 (bits lowest-first within each byte) on
    uncompressed sub-8 scans — the fax-style layout — decodes by
    per-byte bit reversal, bit-exact for bilevel AND 4-bit grey."""
    img1 = ((np.arange(30).reshape(5, 6) * 7) % 2).astype(np.uint8)
    raw = b"".join(_rev_bytes(_pack_row(r, 1)) for r in img1)
    out = decode_tiff_pixels(_tiff(6, 5, [raw], bits=1,
                                   extra_tags=[(266, 3, [2])]))
    assert np.array_equal(out[:, :, 0], img1 * 255)
    img4 = ((np.arange(24).reshape(4, 6) * 5) % 16).astype(np.uint8)
    raw4 = b"".join(_rev_bytes(_pack_row(r, 4)) for r in img4)
    out4 = decode_tiff_pixels(_tiff(6, 4, [raw4], bits=4,
                                    extra_tags=[(266, 3, [2])]))
    assert np.array_equal(out4[:, :, 0], img4 * 17)


def test_tiff_fillorder2_compressed_decodes():
    """r16 (VERDICT r15 #6): FillOrder 2 on LZW and PackBits scans —
    the writer packs pixel bits lowest-first (bit-reversed bytes) and
    compresses THAT; the decoder decompresses the MSB-first
    codestream, then reverses the decoded bytes (libtiff's
    post-decode convention). Packed by the independent packer,
    compressed by the independent encoders, never the decoder's."""
    img1 = ((np.arange(70).reshape(7, 10) * 3) % 2).astype(np.uint8)
    f2 = b"".join(_rev_bytes(_pack_row(r, 1)) for r in img1)
    out = decode_tiff_pixels(_tiff(10, 7, [_tiff_lzw_encode(f2)],
                                   bits=1, compression=5,
                                   extra_tags=[(266, 3, [2])]))
    assert np.array_equal(out[:, :, 0], img1 * 255)
    img4 = ((np.arange(42).reshape(6, 7) * 5) % 16).astype(np.uint8)
    f24 = b"".join(_rev_bytes(_pack_row(r, 4)) for r in img4)
    out4 = decode_tiff_pixels(_tiff(7, 6, [_packbits_encode(f24)],
                                    bits=4, compression=32773,
                                    extra_tags=[(266, 3, [2])]))
    assert np.array_equal(out4[:, :, 0], img4 * 17)


# --- mixed/multi-sample packed depths (r16): rows packed by an
#     INDEPENDENT per-pixel bit-sequencer, never the decoder's ---
def _pack_row_mixed(pixels, bps):
    out, acc, n = bytearray(), 0, 0
    for px in pixels:
        for v, b in zip(px, bps):
            acc = (acc << b) | int(v)
            n += b
            while n >= 8:
                n -= 8
                out.append((acc >> n) & 0xFF)
    if n:
        out.append((acc << (8 - n)) & 0xFF)
    return bytes(out)


def _pack_img_mixed(img, bps):
    return b"".join(_pack_row_mixed(row, bps) for row in img)


def test_tiff_mixed_depth_rgb_decodes():
    """r16: per-sample depths (4,8,2) in one chunky MSB-first row
    stream — each channel unpacks at its own width and rescales by
    its own exact 255/(2^b−1)."""
    bps = (4, 8, 2)
    rng = np.random.default_rng(5)
    img = np.stack([rng.integers(0, 1 << b, (5, 9)) for b in bps],
                   axis=2).astype(np.uint8)
    raw = _pack_img_mixed(img, bps)
    out = decode_tiff_pixels(_tiff(9, 5, [raw], bits=list(bps), spp=3,
                                   photo=2))
    mult = np.array([255 // ((1 << b) - 1) for b in bps], np.uint16)
    assert np.array_equal(out, (img.astype(np.uint16)
                                * mult).astype(np.uint8))


def test_tiff_uniform_sub8_rgb_decodes():
    """r16: uniform sub-8 multi-sample (4,4,4) RGB — previously the
    loud tier — decodes through the same generic unpacker."""
    bps = (4, 4, 4)
    img = ((np.arange(90).reshape(5, 6, 3) * 7) % 16).astype(np.uint8)
    raw = _pack_img_mixed(img, bps)
    out = decode_tiff_pixels(_tiff(6, 5, [raw], bits=list(bps), spp=3,
                                   photo=2))
    assert np.array_equal(out, img * 17)


def test_tiff_mixed_depth_grey_alpha_decodes():
    """r16: 2-sample (4,1) grey+alpha packed rows."""
    bps = (4, 1)
    rng = np.random.default_rng(9)
    img = np.stack([rng.integers(0, 16, (4, 11)),
                    rng.integers(0, 2, (4, 11))], axis=2) \
        .astype(np.uint8)
    raw = _pack_img_mixed(img, bps)
    out = decode_tiff_pixels(_tiff(11, 4, [raw], bits=list(bps),
                                   spp=2, photo=1))
    assert np.array_equal(out[:, :, 0], img[:, :, 0] * 17)
    assert np.array_equal(out[:, :, 1], img[:, :, 1] * 255)


def test_tiff_mixed_depth_predictor2_decodes():
    """r16: horizontal differencing on mixed depths — each sample
    accumulates modulo ITS OWN 2^bits (the libtiff per-sample
    convention)."""
    bps = (4, 8, 2)
    rng = np.random.default_rng(13)
    img = np.stack([rng.integers(0, 1 << b, (5, 8)) for b in bps],
                   axis=2).astype(np.uint8)
    diffed = img.astype(np.int64).copy()
    for c, b in enumerate(bps):
        diffed[:, 1:, c] = (img[:, 1:, c].astype(np.int64)
                            - img[:, :-1, c].astype(np.int64)) \
            % (1 << b)
    raw = _pack_img_mixed(diffed.astype(np.uint8), bps)
    out = decode_tiff_pixels(_tiff(8, 5, [raw], bits=list(bps), spp=3,
                                   photo=2, extra_tags=[(317, 3, [2])]))
    mult = np.array([255 // ((1 << b) - 1) for b in bps], np.uint16)
    assert np.array_equal(out, (img.astype(np.uint16)
                                * mult).astype(np.uint8))


def test_tiff_mixed_depth_fillorder2_lzw_decodes():
    """r16: the composed corner — mixed depths, FillOrder 2, LZW —
    decodes bit-exactly (reverse-then-pack by the independent side,
    decompress-then-reverse-then-unpack by the decoder)."""
    bps = (2, 4, 2)
    rng = np.random.default_rng(17)
    img = np.stack([rng.integers(0, 1 << b, (6, 7)) for b in bps],
                   axis=2).astype(np.uint8)
    f2 = b"".join(_rev_bytes(_pack_row_mixed(row, bps)) for row in img)
    out = decode_tiff_pixels(_tiff(7, 6, [_tiff_lzw_encode(f2)],
                                   bits=list(bps), spp=3, photo=2,
                                   compression=5,
                                   extra_tags=[(266, 3, [2])]))
    mult = np.array([255 // ((1 << b) - 1) for b in bps], np.uint16)
    assert np.array_equal(out, (img.astype(np.uint16)
                                * mult).astype(np.uint8))


def test_tiff_sub8_predictor2_decodes():
    """r15: horizontal differencing below 8 bits — libtiff's
    modulo-2^bits accumulate — decodes 2-bit and 4-bit grey exactly."""
    for bits in (2, 4):
        mod = 1 << bits
        img = ((np.arange(35).reshape(5, 7) * 3) % mod).astype(np.uint8)
        diffed = img.astype(np.int64).copy()
        diffed[:, 1:] = (img[:, 1:].astype(np.int64)
                         - img[:, :-1].astype(np.int64)) % mod
        raw = b"".join(_pack_row(r, bits)
                       for r in diffed.astype(np.uint8))
        out = decode_tiff_pixels(_tiff(7, 5, [raw], bits=bits,
                                       extra_tags=[(317, 3, [2])]))
        assert np.array_equal(out[:, :, 0],
                              img * (255 // (mod - 1)))


def test_tiff_sub8_loud_tiers_and_corruption():
    img = (np.arange(16).reshape(4, 4) % 2).astype(np.uint8)
    raw = _pack_img(img, 1)
    with pytest.raises(NotImplementedError):  # FillOrder 2 + 8-bit
        decode_tiff_pixels(_tiff(2, 2, [bytes(4)],
                                 extra_tags=[(266, 3, [2])]))
    with pytest.raises(ValueError):           # FillOrder 3 invalid
        decode_tiff_pixels(_tiff(4, 4, [raw], bits=1,
                                 extra_tags=[(266, 3, [3])]))
    with pytest.raises(NotImplementedError):  # 3-bit stays loud
        decode_tiff_pixels(_tiff(4, 4, [raw], bits=3))
    with pytest.raises(NotImplementedError):  # 16-bit in a packed mix
        decode_tiff_pixels(_tiff(2, 2, [bytes(16)], bits=[16, 8, 8],
                                 spp=3, photo=2))
    with pytest.raises(ValueError):           # strip short of rows
        decode_tiff_pixels(_tiff(4, 4, [raw[:1]], bits=1))
    with pytest.raises(ValueError):           # palette idx out of map
        decode_tiff_pixels(
            _tiff(4, 4, [_pack_img(img * 3, 4)], bits=4, photo=3,
                  extra_tags=[(320, 3, [0, 0, 0])]))


# --- G.711 -------------------------------------------------------
def _wav_g711(codes: bytes, tag: int, rate=8000, ch=1) -> bytes:
    fmt = struct.pack("<HHIIHH", tag, ch, rate, rate * ch, ch, 8)
    return (b"RIFF" + struct.pack("<I", 28 + 8 + len(codes)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(codes)) + codes)


def test_mulaw_known_code_points():
    s, rate = decode_wav_samples(_wav_g711(bytes([0x00, 0xFF, 0x7F]),
                                           tag=7))
    assert rate == 8000
    # G.711 mu-law: 0x00 is the negative extreme, 0xFF/0x7F are zero
    assert s[:, 0].tolist() == [-32124, 0, 0]


def test_alaw_known_code_points():
    s, _ = decode_wav_samples(_wav_g711(bytes([0x55, 0xD5, 0x2A]),
                                        tag=6))
    # A-law: 0x55 -> -8, 0xD5 -> +8, 0x2A -> the negative extreme
    assert s[0, 0] == -8 and s[1, 0] == 8
    assert s[2, 0] == -32256


def test_g711_mulaw_alaw_symmetry_and_range():
    s_mu, _ = decode_wav_samples(_wav_g711(bytes(range(256)), tag=7))
    s_a, _ = decode_wav_samples(_wav_g711(bytes(range(256)), tag=6))
    for s in (s_mu[:, 0], s_a[:, 0]):
        v = s.astype(np.int64)
        assert int(np.abs(v).max()) <= 32256
        # each code's complement-sign twin decodes to the negation
    mu = s_mu[:, 0].astype(np.int64)
    assert all(mu[c] == -mu[c ^ 0x80] for c in range(256))
    al = s_a[:, 0].astype(np.int64)
    assert all(al[c] == -al[c ^ 0x80] for c in range(256))


def test_g711_stereo_shapes_and_features_scale():
    codes = bytes([0x00, 0xFF] * 10)          # L extreme, R silence
    s, _ = decode_wav_samples(_wav_g711(codes, tag=7, ch=2))
    assert s.shape == (10, 2)
    assert (s[:, 0] == -32124).all() and (s[:, 1] == 0).all()


# --- IMA ADPCM ----------------------------------------------------
_STEPS = (
    7, 8, 9, 10, 11, 12, 13, 14, 16, 17, 19, 21, 23, 25, 28, 31, 34,
    37, 41, 45, 50, 55, 60, 66, 73, 80, 88, 97, 107, 118, 130, 143,
    157, 173, 190, 209, 230, 253, 279, 307, 337, 371, 408, 449, 494,
    544, 598, 658, 724, 796, 876, 963, 1060, 1166, 1282, 1411, 1552,
    1707, 1878, 2066, 2272, 2499, 2749, 3024, 3327, 3660, 4026, 4428,
    4871, 5358, 5894, 6484, 7132, 7845, 8630, 9493, 10442, 11487,
    12635, 13899, 15289, 16818, 18500, 20350, 22385, 24623, 27086,
    29794, 32767)
_ADJ = (-1, -1, -1, -1, 2, 4, 6, 8)


def _ima_encode_mono(samples, block_align=256):
    """Canonical IMA ADPCM compressor (test-side reference): 4-byte
    block header (sample 0 + step index), then low-nibble-first
    4-bit codes."""
    out = bytearray()
    per_block = 1 + (block_align - 4) * 2
    i = 0
    idx = 0
    while i < len(samples):
        blk = samples[i:i + per_block]
        i += per_block
        pred = int(blk[0])
        out += struct.pack("<hBB", pred, idx, 0)
        nibs = []
        for s in blk[1:]:
            step = _STEPS[idx]
            diff = int(s) - pred
            nib = 0
            if diff < 0:
                nib = 8
                diff = -diff
            if diff >= step:
                nib |= 4
                diff -= step
            if diff >= step >> 1:
                nib |= 2
                diff -= step >> 1
            if diff >= step >> 2:
                nib |= 1
            # decoder-mirror update
            d = step >> 3
            if nib & 1:
                d += step >> 2
            if nib & 2:
                d += step >> 1
            if nib & 4:
                d += step
            if nib & 8:
                d = -d
            pred = max(-32768, min(32767, pred + d))
            idx = max(0, min(88, idx + _ADJ[nib & 7]))
            nibs.append(nib)
        while len(nibs) < (block_align - 4) * 2:
            nibs.append(0)                     # pad the final block
        for j in range(0, len(nibs), 2):
            out.append(nibs[j] | (nibs[j + 1] << 4))
    return bytes(out)


def _wav_ima(data: bytes, block_align, rate=8000, ch=1) -> bytes:
    fmt = struct.pack("<HHIIHH", 0x11, ch, rate,
                      rate * block_align // 256, block_align, 4)
    return (b"RIFF" + struct.pack("<I", 28 + 8 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def test_ima_adpcm_tracks_a_sine():
    t = np.arange(505)
    sine = np.round(12000 * np.sin(2 * np.pi * 13 * t / 505)) \
        .astype(np.int16)
    data = _ima_encode_mono(sine, block_align=256)
    s, rate = decode_wav_samples(_wav_ima(data, 256))
    got = s[:len(sine), 0].astype(np.int64)
    # ADPCM is lossy with slope-overload during the startup ramp (the
    # step index climbs from 0 against a steep sine); once adapted
    # (~sample 50) the decoder tracks the encoder's own prediction and
    # error is bounded by the quantizer step
    err = np.abs(got - sine.astype(np.int64))
    assert int(err[50:].max()) <= 1024
    assert float(np.corrcoef(got, sine)[0, 1]) > 0.995


def test_ima_adpcm_exact_hand_block():
    # header: sample0 = 100, index 0 (step 7); nibbles 0x1 then 0x8
    # nib 1: diff = 7>>3 + 7>>2 = 0+1 -> pred 101, idx -1 -> 0
    # nib 8: diff = -(7>>3) = 0 -> pred 101
    blk = struct.pack("<hBB", 100, 0, 0) + bytes([0x81]) + bytes(3)
    s, _ = decode_wav_samples(_wav_ima(blk, 8))
    assert s[:3, 0].tolist() == [100, 101, 101]


def test_ima_adpcm_bad_index_is_corrupt():
    blk = struct.pack("<hBB", 0, 99, 0) + bytes(4)
    with pytest.raises(ValueError, match="step index"):
        decode_wav_samples(_wav_ima(blk, 8))


# --- MS-ADPCM ------------------------------------------------------
_MS_COEFS = ((256, 0), (512, -256), (0, 0), (192, 64), (240, 0),
             (460, -208), (392, -232))
_MS_ADAPT = (230, 230, 230, 230, 307, 409, 512, 614,
             768, 614, 512, 409, 307, 230, 230, 230)


def _ms_encode_mono(samples, block_align=256, pred=0,
                    init_delta=128):
    """Canonical MS-ADPCM compressor (test-side reference): per-block
    header (predictor, delta, s1, s2), then high-nibble-first codes,
    mirroring the decoder's exact update path."""
    out = bytearray()
    per_block = 2 + (block_align - 7) * 2
    i = 0
    while i < len(samples):
        blk = [int(v) for v in samples[i:i + per_block]]
        i += per_block
        while len(blk) < 2:
            blk.append(0)
        s2, s1 = blk[0], blk[1]
        delta = init_delta
        out += bytes([pred])
        out += struct.pack("<h", delta)
        out += struct.pack("<h", s1)
        out += struct.pack("<h", s2)
        nibs = []
        c1, c2 = _MS_COEFS[pred]
        for s in blk[2:]:
            p = (s1 * c1 + s2 * c2) >> 8
            err = s - p
            code = max(-8, min(7, int(round(err / delta))))
            nib = code + 16 if code < 0 else code
            samp = max(-32768, min(32767, p + code * delta))
            s2, s1 = s1, samp
            delta = max(16, (_MS_ADAPT[nib] * delta) >> 8)
            nibs.append(nib)
        while len(nibs) < (block_align - 7) * 2:
            nibs.append(0)
        for j in range(0, len(nibs), 2):
            out.append((nibs[j] << 4) | nibs[j + 1])
    return bytes(out)


def _wav_ms(data: bytes, block_align, rate=8000, ch=1) -> bytes:
    fmt = struct.pack("<HHIIHH", 2, ch, rate,
                      rate * block_align // 256, block_align, 4)
    return (b"RIFF" + struct.pack("<I", 28 + 8 + len(data)) + b"WAVE"
            + b"fmt " + struct.pack("<I", 16) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


def test_ms_adpcm_tracks_a_sine():
    t = np.arange(500)
    sine = np.round(9000 * np.sin(2 * np.pi * 7 * t / 500)) \
        .astype(np.int16)
    data = _ms_encode_mono(sine, block_align=256)
    s, rate = decode_wav_samples(_wav_ms(data, 256))
    got = s[:len(sine), 0].astype(np.int64)
    err = np.abs(got - sine.astype(np.int64))
    # the decoder must track the encoder's own prediction chain; the
    # residual is bounded by the adaptive quantizer once settled
    assert int(err[20:].max()) <= 2048
    assert float(np.corrcoef(got, sine)[0, 1]) > 0.995


def test_ms_adpcm_exact_hand_block():
    # predictor 0 (c1=256, c2=0): pred = s1; warmup s2=10, s1=20.
    # nibble +1 -> 20 + 1*64 = 84, delta -> max(16, 230*64>>8)=57
    # nibble 15 (=-1) -> pred 84 -> 84 - 57 = 27
    blk = (bytes([0]) + struct.pack("<h", 64) + struct.pack("<h", 20)
           + struct.pack("<h", 10) + bytes([0x1F]))
    s, _ = decode_wav_samples(_wav_ms(blk, 8))
    assert s[:4, 0].tolist() == [10, 20, 84, 27]


def test_ms_adpcm_bad_predictor_is_corrupt():
    blk = bytes([9]) + bytes(7)
    with pytest.raises(ValueError, match="predictor"):
        decode_wav_samples(_wav_ms(blk, 8))


# --- r13 ADVICE regressions --------------------------------------
def _zero_ifd_count(payload: bytes, target_tag: int) -> bytes:
    """Rewrite one IFD entry's count field to 0 (little-endian one-IFD
    TIFFs from _tiff)."""
    buf = bytearray(payload)
    nent = int.from_bytes(buf[8:10], "little")
    for i in range(nent):
        e = 10 + 12 * i
        if int.from_bytes(buf[e:e + 2], "little") == target_tag:
            buf[e + 4:e + 8] = (0).to_bytes(4, "little")
            return bytes(buf)
    raise AssertionError(f"tag {target_tag} not in fixture")


def test_tiff_count_zero_entry_is_missing_tag_not_indexerror():
    """count=0 IFD entries must map to the absent-tag path: a
    required tag (width) with count 0 raises the missing-tag
    ValueError, and an optional tag (compression) with count 0 falls
    back to its default and still decodes — never IndexError."""
    img = np.arange(9, dtype=np.uint8).reshape(3, 3)
    good = _tiff(3, 3, [img.tobytes()])
    with pytest.raises(ValueError, match="missing required tag"):
        decode_tiff_pixels(_zero_ifd_count(good, 256))
    got = decode_tiff_pixels(_zero_ifd_count(good, 259))
    assert (got[:, :, 0] == img).all()


def test_tiff_lzw_eoi_less_stream_final_codes_in_last_two_bytes():
    """An EOI-less LZW stream whose final code sits inside the last
    two bytes decodes exactly: the 3-byte chunk read must not
    silently shorten (and misalign the shift) near the buffer end."""
    from big_data_crypto_sentiment_spark.operators.multimodal import (
        _tiff_lzw_decode,
    )

    w = _MsbWriter()
    w.put(256, 9)                         # clear
    for b in b"ABC":                      # 3 literals, NO EOI
        w.put(b, 9)
    stream = w.done()
    # 4 codes x 9 bits = 36 bits -> 5 bytes; final code's 3-byte
    # read starts at byte 3 with only 2 real bytes left
    assert len(stream) == 5
    assert _tiff_lzw_decode(stream, 3) == b"ABC"


# --- r13: tiled TIFF (TIFF6 §15) ---------------------------------
def _tiff_tiled(width, height, tile_w, tile_h, tiles, bo="<",
                compression=1, photo=1, spp=1, extra_tags=()):
    """One-IFD TILED TIFF from pre-encoded tile byte strings (row-major
    tile grid; caller pads edge tiles to full size per spec)."""
    tags = [(256, 4, [width]), (257, 4, [height]),
            (258, 3, [8] * spp), (259, 3, [compression]),
            (262, 3, [photo]), (277, 3, [spp]),
            (322, 4, [tile_w]), (323, 4, [tile_h])]
    tags += list(extra_tags)
    n = len(tags) + 2
    ifd_at = 8
    heap_base = ifd_at + 2 + 12 * n + 4
    probe_heap = b""
    for tag, typ, vals in sorted(tags + [(324, 4, [0] * len(tiles)),
                                         (325, 4, [len(t) for t in tiles])]):
        size = {1: 1, 3: 2, 4: 4}[typ]
        if size * len(vals) > 4:
            probe_heap += b"\x00" * (size * len(vals))
    data_at = heap_base + len(probe_heap)
    offs, off = [], data_at
    for t in tiles:
        offs.append(off)
        off += len(t)
    heap = b""
    entries = []
    for tag, typ, vals in sorted(tags + [(324, 4, offs),
                                         (325, 4, [len(t) for t in tiles])]):
        e, heap = _entry(bo, tag, typ, vals, heap, heap_base)
        entries.append(e)
    hdr = (b"II*\x00" if bo == "<" else b"MM\x00*") \
        + struct.pack(bo + "I", ifd_at)
    ifd = struct.pack(bo + "H", n) + b"".join(entries) \
        + struct.pack(bo + "I", 0)
    assert heap_base == ifd_at + len(ifd)
    return hdr + ifd + heap.ljust(len(probe_heap), b"\x00") \
        + b"".join(tiles)


def _tile_grid(img, tile_h, tile_w):
    """Spec-padded row-major tiles of an (h, w[, c]) array."""
    import numpy as np
    if img.ndim == 2:
        img = img[:, :, None]
    h, w, c = img.shape
    out = []
    for y0 in range(0, h, tile_h):
        for x0 in range(0, w, tile_w):
            t = np.zeros((tile_h, tile_w, c), np.uint8)
            blk = img[y0:y0 + tile_h, x0:x0 + tile_w]
            t[:blk.shape[0], :blk.shape[1]] = blk
            out.append(t)
    return out


def test_tiff_tiled_grey_uncompressed_with_edge_padding():
    rng = np.random.default_rng(10)
    img = rng.integers(0, 256, size=(10, 13)).astype(np.uint8)
    tiles = [t.tobytes() for t in _tile_grid(img, 4, 5)]
    p = _tiff_tiled(13, 10, 5, 4, tiles)
    assert (decode_tiff_pixels(p)[:, :, 0] == img).all()


def test_tiff_tiled_rgb_lzw_with_predictor():
    rng = np.random.default_rng(11)
    img = np.cumsum(rng.integers(0, 4, size=(9, 11, 3)), axis=1) \
        .astype(np.uint8)
    tiles = []
    for t in _tile_grid(img, 4, 6):
        diffed = np.empty_like(t, dtype=np.int64)
        diffed[:, 0] = t[:, 0]
        diffed[:, 1:] = (t[:, 1:].astype(np.int64)
                         - t[:, :-1].astype(np.int64))
        tiles.append(_tiff_lzw_encode(
            (diffed & 0xFF).astype(np.uint8).tobytes()))
    p = _tiff_tiled(11, 9, 6, 4, tiles, compression=5, photo=2,
                    spp=3, extra_tags=[(317, 3, [2])])
    assert (decode_tiff_pixels(p) == img).all()


def test_tiff_tiled_packbits_palette():
    idx = np.arange(12, dtype=np.uint8).reshape(3, 4) % 4
    cmap = ([0, 65535, 32768, 256] + [256, 0, 65535, 32768]
            + [32768, 256, 0, 65535])
    tiles = [_packbits_encode(t.tobytes())
             for t in _tile_grid(idx, 2, 2)]
    p = _tiff_tiled(4, 3, 2, 2, tiles, compression=32773, photo=3,
                    extra_tags=[(320, 3, cmap)])
    got = decode_tiff_pixels(p)
    exp = (np.array(cmap, dtype=np.int64).reshape(3, 4).T
           >> 8).astype(np.uint8)[idx]
    assert (got == exp).all()


def test_tiff_tiled_corruption_raises():
    img = np.zeros((4, 4), np.uint8)
    tiles = [t.tobytes() for t in _tile_grid(img, 4, 4)]
    good = _tiff_tiled(4, 4, 4, 4, tiles)
    with pytest.raises(ValueError):            # tile data out of range
        decode_tiff_pixels(good[:-3])
    with pytest.raises(ValueError, match="grid"):
        decode_tiff_pixels(_tiff_tiled(9, 9, 4, 4, tiles))
    with pytest.raises(ValueError, match="zero tile"):
        decode_tiff_pixels(_zero_ifd_count(
            _tiff_tiled(4, 4, 4, 4, tiles), 322)
            .replace(b"II*\x00", b"II*\x00"))


# --- r13: 16-bit samples ------------------------------------------
def test_tiff_16bit_grey_both_byte_orders():
    rng = np.random.default_rng(20)
    img16 = rng.integers(0, 65536, size=(6, 9)).astype(np.uint16)
    for bo, fmt in (("<", "<u2"), (">", ">u2")):
        p = _tiff16(9, 6, [img16.astype(fmt).tobytes()], bo=bo)
        got = decode_tiff_pixels(p)
        assert (got[:, :, 0] == (img16 >> 8).astype(np.uint8)).all(), bo


def _tiff16(width, height, strips, bo="<", compression=1, photo=1,
            spp=1, extra_tags=()):
    """Like _tiff but with BitsPerSample=16 (reuses the writer by
    swapping the 258 tag)."""
    # _tiff hardcodes bps=8; clone its tag list with 16s
    rps = -(-height // len(strips))
    tags = [(256, 4, [width]), (257, 4, [height]),
            (258, 3, [16] * spp), (259, 3, [compression]),
            (262, 3, [photo]), (277, 3, [spp]), (278, 4, [rps])]
    tags += list(extra_tags)
    n = len(tags) + 2
    ifd_at = 8
    heap_base = ifd_at + 2 + 12 * n + 4
    probe_heap = b""
    for tag, typ, vals in sorted(tags + [(273, 4, [0] * len(strips)),
                                         (279, 4, [len(s) for s in strips])]):
        size = {1: 1, 3: 2, 4: 4}[typ]
        if size * len(vals) > 4:
            probe_heap += b"\x00" * (size * len(vals))
    data_at = heap_base + len(probe_heap)
    offs, off = [], data_at
    for s in strips:
        offs.append(off)
        off += len(s)
    heap = b""
    entries = []
    for tag, typ, vals in sorted(tags + [(273, 4, offs),
                                         (279, 4, [len(s) for s in strips])]):
        e, heap = _entry(bo, tag, typ, vals, heap, heap_base)
        entries.append(e)
    hdr = (b"II*\x00" if bo == "<" else b"MM\x00*") \
        + struct.pack(bo + "I", ifd_at)
    ifd = struct.pack(bo + "H", n) + b"".join(entries) \
        + struct.pack(bo + "I", 0)
    assert heap_base == ifd_at + len(ifd)
    return hdr + ifd + heap.ljust(len(probe_heap), b"\x00") \
        + b"".join(strips)


def test_tiff_16bit_rgb_lzw_with_predictor():
    rng = np.random.default_rng(21)
    img16 = np.cumsum(rng.integers(0, 1024, size=(5, 7, 3)),
                      axis=1).astype(np.uint16)
    diffed = np.empty_like(img16, dtype=np.int64)
    diffed[:, 0] = img16[:, 0]
    diffed[:, 1:] = (img16[:, 1:].astype(np.int64)
                     - img16[:, :-1].astype(np.int64))
    raw = (diffed & 0xFFFF).astype("<u2").tobytes()
    p = _tiff16(7, 5, [_tiff_lzw_encode(raw)], compression=5,
                photo=2, spp=3, extra_tags=[(317, 3, [2])])
    assert (decode_tiff_pixels(p)
            == (img16 >> 8).astype(np.uint8)).all()


def test_tiff_16bit_white_is_zero_and_multi_strip():
    img16 = (np.arange(24, dtype=np.uint16) * 2730).reshape(4, 6)
    strips = [img16[:2].astype("<u2").tobytes(),
              img16[2:].astype("<u2").tobytes()]
    p = _tiff16(6, 4, strips, photo=0)
    got = decode_tiff_pixels(p)
    assert (got[:, :, 0]
            == 255 - (img16 >> 8).astype(np.uint8)).all()


def test_tiff_16bit_palette_stays_loud():
    img16 = np.zeros((2, 2), np.uint16)
    p = _tiff16(2, 2, [img16.tobytes()], photo=3)
    with pytest.raises(NotImplementedError, match="16-bit palette"):
        decode_tiff_pixels(p)


def test_tiff_mixed_depth_stays_loud():
    # bps = (8, 16, 8): neither all-8 nor all-16
    img = np.zeros((2, 2, 3), np.uint8)
    rps = 2
    tags = [(256, 4, [2]), (257, 4, [2]), (258, 3, [8, 16, 8]),
            (259, 3, [1]), (262, 3, [2]), (277, 3, [3]), (278, 4, [rps])]
    # reuse _tiff's machinery is awkward here; hand-build via _tiff16's
    # shape with a patched bps list
    n = len(tags) + 2
    ifd_at = 8
    heap_base = ifd_at + 2 + 12 * n + 4
    probe_heap = b""
    strips = [img.tobytes()]
    for tag, typ, vals in sorted(tags + [(273, 4, [0]), (279, 4, [len(strips[0])])]):
        size = {1: 1, 3: 2, 4: 4}[typ]
        if size * len(vals) > 4:
            probe_heap += b"\x00" * (size * len(vals))
    data_at = heap_base + len(probe_heap)
    heap = b""
    entries = []
    for tag, typ, vals in sorted(tags + [(273, 4, [data_at]),
                                         (279, 4, [len(strips[0])])]):
        e, heap = _entry("<", tag, typ, vals, heap, heap_base)
        entries.append(e)
    p = (b"II*\x00" + struct.pack("<I", ifd_at)
         + struct.pack("<H", n) + b"".join(entries)
         + struct.pack("<I", 0)
         + heap.ljust(len(probe_heap), b"\x00") + strips[0])
    with pytest.raises(NotImplementedError, match="outside the 1/2/4/8/16"):
        decode_tiff_pixels(p)


def test_tiled_and_16bit_tiff_resize_tier_is_real(spark):
    """Tiled and 16-bit TIFFs ride the real-pixel resize tiers now."""
    from big_data_crypto_sentiment_spark.operators.multimodal import (
        resize_images,
    )
    rng = np.random.default_rng(30)
    big = rng.integers(0, 256, size=(300, 260)).astype(np.uint8)
    tiles = [t.tobytes() for t in _tile_grid(big, 64, 64)]
    tiled = _tiff_tiled(260, 300, 64, 64, tiles)
    img16 = rng.integers(0, 65536, size=(20, 30)).astype(np.uint16)
    deep = _tiff16(30, 20, [img16.astype("<u2").tobytes()])
    df = spark.createDataFrame(
        [(1, "image", bytearray(tiled), None, None, None, None),
         (2, "image", bytearray(deep), None, None, None, None)],
        "media_id long, kind string, payload binary, mime string,"
        " width int, height int, duration_ms long")
    out = {r.media_id: r for r in
           resize_images(df, max_dim=224, use_real_codec=True).collect()}
    assert out[1].resize_status == "resampled" and out[1].resized
    assert (out[1].src_width, out[1].src_height) == (260, 300)
    assert out[2].resize_status == "passthrough"
