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


def test_16bit_png_decodes_high_bytes():
    """16-bit RGB: big-endian sample pairs strip to the high byte
    (libpng's strip_16)."""
    rng = np.random.default_rng(3)
    img16 = rng.integers(0, 1 << 16, size=(3, 4, 3)).astype(">u2")
    raw = b"".join(b"\x00" + img16[y].tobytes() for y in range(3))
    payload = (b"\x89PNG\r\n\x1a\n"
               + _chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 16, 2,
                                             0, 0, 0))
               + _chunk(b"IDAT", zlib.compress(raw))
               + _chunk(b"IEND", b""))
    got = decode_png_pixels(payload)
    assert got.shape == (3, 4, 3)
    assert (got == (img16 >> 8).astype(np.uint8)).all()


def test_sub8_greyscale_png_rescales_to_full_range():
    """Depth-2 greyscale: samples 0..3 map to 0/85/170/255."""
    g = np.array([[0, 1, 2, 3, 3], [3, 2, 1, 0, 0],
                  [1, 1, 2, 2, 0]])
    raw = b"".join(b"\x00" + _pack_row(row, 2) for row in g)
    payload = (b"\x89PNG\r\n\x1a\n"
               + _chunk(b"IHDR", struct.pack(">IIBBBBB", 5, 3, 2, 0,
                                             0, 0, 0))
               + _chunk(b"IDAT", zlib.compress(raw))
               + _chunk(b"IEND", b""))
    got = decode_png_pixels(payload)
    assert got.shape == (3, 5, 1)
    assert (got[:, :, 0] == g * 85).all()


def test_illegal_depth_colour_combo_is_corrupt():
    # depth 2 truecolour and depth 16 palette are not legal spec
    # combinations -> ValueError (corrupt), never a wrong decode
    for depth, colour in ((2, 2), (16, 3)):
        payload = (b"\x89PNG\r\n\x1a\n"
                   + _chunk(b"IHDR",
                            struct.pack(">IIBBBBB", 2, 2, depth,
                                        colour, 0, 0, 0))
                   + _chunk(b"IDAT", zlib.compress(b"\x00" * 16))
                   + _chunk(b"IEND", b""))
        with pytest.raises(ValueError):
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


def _bmp(width, height, bits, rows_bytes, palette=None,
         compression=0, pixel_bytes=None, clr_used=None):
    """Spec-forward BITMAPINFOHEADER builder. rows_bytes = raw pixel
    area (already aligned) for uncompressed; pixel_bytes overrides it
    for RLE streams. biClrUsed declares the stored palette size
    (0 would mean the full 2^bits table)."""
    pal = b""
    if palette is not None:
        pal = b"".join(bytes((b, g, r, 0)) for r, g, b in palette)
        if clr_used is None:
            clr_used = len(palette)
    clr_used = clr_used or 0
    data = pixel_bytes if pixel_bytes is not None else rows_bytes
    data_off = 14 + 40 + len(pal)
    hdr = (b"BM" + struct.pack("<IHHI", data_off + len(data), 0, 0,
                               data_off)
           + struct.pack("<IiiHHIIiiII", 40, width, height, 1, bits,
                         compression, len(data), 0, 0, clr_used, 0))
    return hdr + pal + data


def test_bmp_8bit_palette_bottom_up():
    from big_data_crypto_sentiment_spark.operators.multimodal import (
        decode_bmp_pixels,
    )
    # 3x2, row stride 4 (3 + 1 pad); file rows bottom-up
    rows = bytes([3, 4, 5, 0]) + bytes([0, 1, 2, 0])  # bottom, top
    p = _bmp(3, 2, 8, rows, palette=PAL)
    got = decode_bmp_pixels(p)
    want = np.array(PAL, np.uint8)[np.array([[0, 1, 2], [3, 4, 5]])]
    assert (got == want).all()
    # out-of-range index -> corrupt
    bad = _bmp(3, 2, 8, rows, palette=PAL[:4])
    with pytest.raises(ValueError):
        decode_bmp_pixels(bad)


def test_bmp_4bit_and_1bit_palette():
    from big_data_crypto_sentiment_spark.operators.multimodal import (
        decode_bmp_pixels,
    )
    # 4-bit, 3x1: indices 7,0,2 -> nibbles 70 20, padded to 4 bytes
    p4 = _bmp(3, 1, 4, bytes([0x70, 0x20, 0, 0]), palette=PAL)
    got = decode_bmp_pixels(p4)
    assert (got[0] == np.array(PAL, np.uint8)[[7, 0, 2]]).all()
    # 1-bit, 10x1: bits 1010101010 -> 0xAA 0x80, padded
    p1 = _bmp(10, 1, 1, bytes([0xAA, 0x80, 0, 0]), palette=PAL[:2])
    got = decode_bmp_pixels(p1)
    want = np.array(PAL[:2], np.uint8)[[1, 0] * 5]
    assert (got[0] == want).all()


def test_bmp_rle8_runs_absolute_delta_eol():
    from big_data_crypto_sentiment_spark.operators.multimodal import (
        decode_bmp_pixels,
    )
    # 6x3 canvas. Bottom row: run of 4 index 1, then 2 index 2, EOL.
    # Middle row: absolute mode 3 literals [3,4,5] (padded), delta
    # (+2,+1) -> skips to top row x=5, run 1 of index 6, EOB.
    rle = (bytes([4, 1, 2, 2, 0, 0])            # runs + EOL
           + bytes([0, 3, 3, 4, 5, 0])          # absolute 3 + pad
           + bytes([0, 2, 2, 1])                # delta +2 x, +1 y
           + bytes([1, 6])                      # run 1 of idx 6
           + bytes([0, 1]))                     # end of bitmap
    p = _bmp(6, 3, 8, b"", palette=PAL, compression=1,
             pixel_bytes=rle)
    got = decode_bmp_pixels(p)
    pal = np.array(PAL, np.uint8)
    # file y=0 is the BOTTOM row; undisturbed cells are index 0
    assert (got[2] == pal[[1, 1, 1, 1, 2, 2]]).all()      # bottom
    assert (got[1] == pal[[3, 4, 5, 0, 0, 0]]).all()      # middle
    assert (got[0] == pal[[0, 0, 0, 0, 0, 6]]).all()      # top
    # RLE4 decodes as of late r12: a 0x00 0x01 stream is an immediate
    # end-of-bitmap -> an all-background raster, not a gate
    p4 = _bmp(4, 1, 4, b"", palette=PAL, compression=2,
              pixel_bytes=bytes([0, 1]))
    assert (decode_bmp_pixels(p4)
            == np.array(PAL, np.uint8)[0]).all()
    # truncated RLE stream (no EOB) -> corrupt
    p_bad = _bmp(6, 3, 8, b"", palette=PAL, compression=1,
                 pixel_bytes=bytes([4, 1]))
    with pytest.raises(ValueError):
        decode_bmp_pixels(p_bad)


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=25, deadline=None)
@given(h=st.integers(1, 12), w=st.integers(1, 12),
       depth=st.sampled_from([1, 2, 4, 8]),
       interlace=st.booleans(), seed=st.integers(0, 2**31))
def test_palette_png_roundtrip_property(h, w, depth, interlace, seed):
    """Any palette raster at any legal depth, interlaced or not,
    decodes back to exactly its palette-mapped pixels."""
    rng = np.random.default_rng(seed)
    n_colors = min(len(PAL), 1 << depth)
    idx = rng.integers(0, n_colors, size=(h, w))
    got = decode_png_pixels(_palette_png(idx, PAL, depth,
                                         interlace=interlace))
    assert (got == np.array(PAL, np.uint8)[idx]).all()


@settings(max_examples=20, deadline=None)
@given(h=st.integers(1, 10), w=st.integers(1, 10),
       ch=st.sampled_from([1, 2, 3, 4]), seed=st.integers(0, 2**31))
def test_encode_decode_roundtrip_property(h, w, ch, seed):
    from big_data_crypto_sentiment_spark.operators.multimodal import (
        encode_png,
    )
    rng = np.random.default_rng(seed)
    img = rng.integers(0, 256, size=(h, w, ch)).astype(np.uint8)
    back = decode_png_pixels(encode_png(img))
    assert back.shape == img.shape and (back == img).all()


def test_bmp_rle4_runs_absolute_delta_eol():
    from big_data_crypto_sentiment_spark.operators.multimodal import (
        decode_bmp_pixels,
    )
    # 6x2 canvas, 4-bit RLE. Bottom row: encoded run of 5 with nibble
    # pair (1,2) -> 1,2,1,2,1; then EOL. Top row: absolute 3 literals
    # [3,4,5] (two bytes 0x34 0x50, word-padded), delta (+1,0), run 2
    # of (6,7) -> 6,7 at x=4..5, EOB.
    rle = (bytes([5, 0x12, 0, 0])               # run 5 alternating + EOL
           + bytes([0, 3, 0x34, 0x50])          # absolute 3 literals
           + bytes([0, 2, 1, 0])                # delta +1 x
           + bytes([2, 0x67])                   # run 2 alternating
           + bytes([0, 1]))                     # end of bitmap
    p = _bmp(6, 2, 4, b"", palette=PAL, compression=2,
             pixel_bytes=rle)
    got = decode_bmp_pixels(p)
    pal = np.array(PAL, np.uint8)
    assert (got[1] == pal[[1, 2, 1, 2, 1, 0]]).all()      # bottom
    assert (got[0] == pal[[3, 4, 5, 0, 6, 7]]).all()      # top


def test_bmp_16bit_555_default_masks():
    from big_data_crypto_sentiment_spark.operators.multimodal import (
        decode_bmp_pixels,
    )
    # 2x1 plain 16-bit (compression 0): 555 masks. Pixel values:
    # pure red (31<<10) and mid green (16<<5)
    px = struct.pack("<HH", 31 << 10, 16 << 5)
    p = _bmp(2, 1, 16, px)                      # stride 4, no pad
    got = decode_bmp_pixels(p)
    assert got.shape == (1, 2, 3)
    assert (got[0, 0] == [255, 0, 0]).all()
    assert (got[0, 1] == [0, 16 * 255 // 31, 0]).all()


def test_bmp_bitfields_565_and_argb32():
    from big_data_crypto_sentiment_spark.operators.multimodal import (
        decode_bmp_pixels,
    )
    # 16-bit BI_BITFIELDS with 565 masks: masks sit at file offset 54,
    # data follows
    masks = struct.pack("<III", 0xF800, 0x07E0, 0x001F)
    px = struct.pack("<HH", 0xF800, 0x07E0)     # red, green
    data_off = 14 + 40 + 12
    hdr = (b"BM" + struct.pack("<IHHI", data_off + len(px), 0, 0,
                               data_off)
           + struct.pack("<IiiHHIIiiII", 40, 2, 1, 1, 16, 3,
                         len(px), 0, 0, 0, 0))
    got = decode_bmp_pixels(hdr + masks + px)
    assert (got[0, 0] == [255, 0, 0]).all()
    assert (got[0, 1] == [0, 255, 0]).all()

    # 32-bit V4-header BITFIELDS with an alpha mask: biSize=108 means
    # the four masks live at the same offsets (54..70) inside the
    # header; build the 108-byte header with masks embedded
    v4_extra = (struct.pack("<IIII", 0x00FF0000, 0x0000FF00,
                            0x000000FF, 0xFF000000)
                + b"\x00" * (108 - 40 - 16))
    px32 = struct.pack("<II", 0x80FF00FF,      # A=0x80, R=FF, B=FF
                       0xFF00FF00)             # A=FF, G=FF
    data_off = 14 + 108
    hdr = (b"BM" + struct.pack("<IHHI", data_off + len(px32), 0, 0,
                               data_off)
           + struct.pack("<IiiHHIIiiII", 108, 2, 1, 1, 32, 3,
                         len(px32), 0, 0, 0, 0))
    got = decode_bmp_pixels(hdr + v4_extra + px32)
    assert got.shape == (1, 2, 4)
    assert (got[0, 0] == [255, 0, 255, 0x80]).all()  # red+blue, A=0x80
    assert (got[0, 1] == [0, 255, 0, 255]).all()


def test_bmp_bitfields_malformed_masks_raise():
    from big_data_crypto_sentiment_spark.operators.multimodal import (
        decode_bmp_pixels,
    )
    # non-contiguous mask -> corrupt, not silently wrong scaling
    masks = struct.pack("<III", 0b101 << 10, 0x07E0, 0x001F)
    px = struct.pack("<HH", 0, 0)
    data_off = 14 + 40 + 12
    hdr = (b"BM" + struct.pack("<IHHI", data_off + len(px), 0, 0,
                               data_off)
           + struct.pack("<IiiHHIIiiII", 40, 2, 1, 1, 16, 3,
                         len(px), 0, 0, 0, 0))
    with pytest.raises(ValueError, match="contiguous"):
        decode_bmp_pixels(hdr + masks + px)
