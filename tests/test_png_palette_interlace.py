"""r12 multimodal coverage expansion: palette PNG (depths 1/2/4/8,
optional tRNS alpha), Adam7 interlacing, and WebP/TIFF header decode.
Every payload is built by an independent spec-forward encoder in the
test, never by the code under test."""

import struct
import zlib

import numpy as np
import pytest

from big_data_crypto_sentiment_spark.operators.multimodal import (
    decode_media,
    decode_png_pixels,
)

_ADAM7 = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
          (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))


def _chunk(ctype, data):
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


def _pack_row(values, depth):
    """MSB-first bit packing of one scanline of palette indices."""
    bits = []
    for v in values:
        for i in range(depth - 1, -1, -1):
            bits.append((int(v) >> i) & 1)
    while len(bits) % 8:
        bits.append(0)
    out = bytearray()
    for i in range(0, len(bits), 8):
        b = 0
        for j in range(8):
            b = (b << 1) | bits[i + j]
        out.append(b)
    return bytes(out)


def _palette_png(idx, palette, depth, trns=None, interlace=False):
    """Spec-forward palette PNG builder: filter-0 scanlines (packed at
    `depth` bits), optional Adam7 pass split, PLTE (+tRNS) chunks."""
    idx = np.asarray(idx)
    h, w = idx.shape
    raw = bytearray()
    if not interlace:
        for y in range(h):
            raw += b"\x00" + _pack_row(idx[y], depth)
    else:
        for x0, y0, dx, dy in _ADAM7:
            sub = idx[y0::dy, x0::dx]
            if sub.size == 0:
                continue
            for row in sub:
                raw += b"\x00" + _pack_row(row, depth)
    plte = b"".join(bytes(c) for c in palette)
    out = (b"\x89PNG\r\n\x1a\n"
           + _chunk(b"IHDR", struct.pack(">IIBBBBB", w, h, depth, 3,
                                         0, 0, 1 if interlace else 0))
           + _chunk(b"PLTE", plte))
    if trns is not None:
        out += _chunk(b"tRNS", bytes(trns))
    return (out + _chunk(b"IDAT", zlib.compress(bytes(raw)))
            + _chunk(b"IEND", b""))


PAL = [(255, 0, 0), (0, 255, 0), (0, 0, 255), (9, 8, 7),
       (40, 50, 60), (1, 2, 3), (200, 100, 0), (7, 7, 7)]


@pytest.mark.parametrize("depth", [1, 2, 4, 8])
def test_palette_png_all_depths(depth):
    n_colors = min(len(PAL), 1 << depth)
    idx = (np.arange(5 * 7).reshape(5, 7) * 3) % n_colors
    got = decode_png_pixels(_palette_png(idx, PAL, depth))
    want = np.array(PAL, dtype=np.uint8)[idx]
    assert got.shape == (5, 7, 3)
    assert (got == want).all()


def test_palette_png_trns_alpha():
    idx = np.array([[0, 1, 2, 3], [3, 2, 1, 0]])
    got = decode_png_pixels(_palette_png(idx, PAL, 8,
                                         trns=[255, 0, 128]))
    assert got.shape == (2, 4, 4)
    assert (got[:, :, :3] == np.array(PAL, np.uint8)[idx]).all()
    # alpha: entry 0 -> 255, 1 -> 0, 2 -> 128, 3 (past tRNS) -> 255
    assert (got[:, :, 3] == np.array([[255, 0, 128, 255],
                                      [255, 128, 0, 255]])).all()


def test_palette_index_out_of_range_is_corrupt():
    idx = np.full((2, 2), 7)                  # palette has 8 entries,
    p = _palette_png(idx, PAL[:4], 8)         # ...this one only 4
    with pytest.raises(ValueError):
        decode_png_pixels(p)


def test_adam7_interlaced_palette_png():
    rng = np.random.default_rng(5)
    idx = rng.integers(0, 8, size=(13, 11))   # odd dims: partial passes
    got = decode_png_pixels(_palette_png(idx, PAL, 8, interlace=True))
    assert (got == np.array(PAL, np.uint8)[idx]).all()
    # sub-8-bit interlaced too (per-pass rows repack at 2 bits)
    idx2 = rng.integers(0, 4, size=(9, 5))
    got2 = decode_png_pixels(_palette_png(idx2, PAL[:4], 2,
                                          interlace=True))
    assert (got2 == np.array(PAL[:4], np.uint8)[idx2]).all()


def test_adam7_interlaced_rgb_png():
    """Interlaced truecolour: forward-apply Adam7 + per-pass filter 0
    independently of the decoder."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(10, 9, 3)).astype(np.uint8)
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7:
        sub = img[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        for row in sub:
            raw += b"\x00" + row.tobytes()
    payload = (b"\x89PNG\r\n\x1a\n"
               + _chunk(b"IHDR", struct.pack(">IIBBBBB", 9, 10, 8, 2,
                                             0, 0, 1))
               + _chunk(b"IDAT", zlib.compress(bytes(raw)))
               + _chunk(b"IEND", b""))
    got = decode_png_pixels(payload)
    assert (got == img).all()


def test_16bit_png_still_gated():
    payload = (b"\x89PNG\r\n\x1a\n"
               + _chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 16, 2,
                                             0, 0, 0))
               + _chunk(b"IDAT", zlib.compress(b"\x00" * 26))
               + _chunk(b"IEND", b""))
    with pytest.raises(NotImplementedError):
        decode_png_pixels(payload)


def _webp(chunks):
    body = b"WEBP" + b"".join(
        cid + struct.pack("<I", len(d)) + d + (b"\x00" if len(d) & 1
                                               else b"")
        for cid, d in chunks)
    return b"RIFF" + struct.pack("<I", len(body)) + body


def test_webp_header_dimensions_all_three_forms():
    # VP8 lossy keyframe: 3-byte tag, start code, 14-bit dims
    vp8 = (b"\x00\x00\x00" + b"\x9d\x01\x2a"
           + struct.pack("<HH", 320, 240) + b"\x00" * 4)
    m = decode_media(_webp([(b"VP8 ", vp8)]), "image")
    assert (m["width"], m["height"]) == (320, 240)
    # VP8L lossless: signature + packed dims-1
    b32 = (639 & 0x3FFF) | ((479 & 0x3FFF) << 14)
    vp8l = b"\x2f" + struct.pack("<I", b32)
    m = decode_media(_webp([(b"VP8L", vp8l)]), "image")
    assert (m["width"], m["height"]) == (640, 480)
    # VP8X extended: 24-bit canvas dims-1
    vp8x = (b"\x00\x00\x00\x00"
            + (99).to_bytes(3, "little") + (49).to_bytes(3, "little"))
    m = decode_media(_webp([(b"VP8X", vp8x)]), "image")
    assert (m["width"], m["height"]) == (100, 50)
    # corrupt: missing start code
    with pytest.raises(ValueError):
        decode_media(_webp([(b"VP8 ", b"\x00" * 10)]), "image")


def _tiff(bo, entries):
    e = "<" if bo == "II" else ">"
    head = (b"II*\x00" if bo == "II" else b"MM\x00*") \
        + struct.pack(e + "I", 8)
    body = struct.pack(e + "H", len(entries))
    for tag, typ, val in entries:
        if typ == 3:
            v = struct.pack(e + "HH", val, 0) if bo == "II" \
                else struct.pack(e + "HH", val, 0)
        else:
            v = struct.pack(e + "I", val)
        body += struct.pack(e + "HHI", tag, typ, 1) + v
    return head + body + struct.pack(e + "I", 0)


def test_tiff_header_dimensions_both_orders_and_types():
    for bo in ("II", "MM"):
        m = decode_media(_tiff(bo, [(256, 3, 800), (257, 3, 600)]),
                         "image")
        assert (m["width"], m["height"]) == (800, 600)
        m = decode_media(_tiff(bo, [(256, 4, 70000), (257, 4, 2)]),
                         "image")
        assert (m["width"], m["height"]) == (70000, 2)
    with pytest.raises(ValueError):
        decode_media(_tiff("II", [(256, 3, 8)]), "image")  # no length


def test_resize_tiering_webp_tiff_land_decoded_dims(spark):
    from big_data_crypto_sentiment_spark.operators.multimodal import (
        resize_images,
    )
    from big_data_crypto_sentiment_spark.schemas import MEDIA_SCHEMA
    vp8 = (b"\x00\x00\x00" + b"\x9d\x01\x2a"
           + struct.pack("<HH", 320, 240) + b"\x00" * 4)
    rows = [
        (1, "image", _webp([(b"VP8 ", vp8)]), "image/webp",
         None, None, None),
        (2, "image", _tiff("MM", [(256, 4, 640), (257, 4, 480)]),
         "image/tiff", None, None, None),
    ]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r
           for r in resize_images(df, use_real_codec=True).collect()}
    assert out[1].resize_status == "decoded-dims"
    assert (out[1].src_width, out[1].src_height) == (320, 240)
    assert (out[1].width, out[1].height) == (224, 168)
    assert out[2].resize_status == "decoded-dims"
    assert (out[2].width, out[2].height) == (224, 168)


def test_flac_streaminfo_duration():
    def flac(sr, total):
        u64 = (sr << 44) | (1 << 41) | (15 << 36) | total
        body = (b"\x00" * 10 + u64.to_bytes(8, "big") + b"\x00" * 16)
        return b"fLaC" + b"\x80" + (34).to_bytes(3, "big") + body

    m = decode_media(flac(44100, 44100 * 7), "audio")
    assert m["duration_ms"] == 7000 and m["width"] is None
    # unknown length (total_samples = 0): valid container, None duration
    assert decode_media(flac(48000, 0), "audio")["duration_ms"] is None
    with pytest.raises(ValueError):
        decode_media(flac(0, 1000), "audio")       # zero sample rate
    with pytest.raises(ValueError):
        decode_media(b"fLaC\x80" + b"\x00" * 10, "audio")  # truncated
