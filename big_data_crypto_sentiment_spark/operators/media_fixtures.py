"""Deterministic media payload builders for the driver-hash fixtures
(r12 verdict #2): REAL container bytes — WAV PCM16, FLAC (verbatim
subframes), animated GIF — whose decoded content is a CLOSED FORM of
the row key, so a DuckDB oracle can replay the decoder's output
exactly. Planting these into the media queries' payload columns makes
the real decode tiers (decode_wav_samples / decode_flac_samples /
decode_gif_frames, operators/multimodal.py) driver-hash-visible
instead of pytest-only.

Everything here is spec-built from public format documentation (RIFF
WAVE, FLAC format spec, GIF89a) with stdlib only; the encodings favor
bit-level simplicity over compression (FLAC verbatim subframes, GIF
LZW with a clear code before every literal so the code width never
grows) — they are FIXTURE generators, not production encoders.

Closed forms (replayed by the SQL twins in queries/media.py):
  * audio: n = 64 + (doc_id % 61) mono samples at 8000 Hz,
    s_i = ((doc_id*7919 + i*104729) % 65536) − 32768  (int16 range);
  * gif: 4 full-screen 8×6 frames over a 256-entry global palette
    palette[i] = (i, (i*3)%256, (i*7)%256),
    index(x, y, frame, doc) = (doc*13 + frame*29 + y*8 + x) % 256,
    delay 100 ms per frame, disposal 1 (leave in place), opaque —
    so coalesced frame f is exactly its own pixels.
"""

from __future__ import annotations

import struct

AUDIO_RATE = 8000
GIF_W, GIF_H, GIF_FRAMES = 8, 6, 4
GIF_DELAY_MS = 100


def fixture_sample_count(doc_id: int) -> int:
    return 64 + doc_id % 61


def fixture_samples(doc_id: int) -> list[int]:
    """Closed-form int16 mono samples for one doc."""
    return [((doc_id * 7919 + i * 104729) % 65536) - 32768
            for i in range(fixture_sample_count(doc_id))]


def wav_pcm_bytes(doc_id: int) -> bytes:
    """RIFF/WAVE, linear PCM, 16-bit little-endian, mono, 8000 Hz."""
    data = b"".join(struct.pack("<h", s) for s in fixture_samples(doc_id))
    fmt = struct.pack("<HHIIHH", 1, 1, AUDIO_RATE, AUDIO_RATE * 2, 2, 16)
    return (b"RIFF" + struct.pack("<I", 4 + 8 + len(fmt) + 8 + len(data))
            + b"WAVE"
            + b"fmt " + struct.pack("<I", len(fmt)) + fmt
            + b"data" + struct.pack("<I", len(data)) + data)


class _MsbBitWriter:
    """MSB-first bit packer (FLAC bit order)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        value &= (1 << n) - 1
        self.acc = (self.acc << n) | value
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            self.buf.append((self.acc >> self.nbits) & 0xFF)

    def align(self):
        if self.nbits:
            self.write(0, 8 - self.nbits)

    def bytes(self) -> bytes:
        assert self.nbits == 0
        return bytes(self.buf)


def _crc8(data: bytes) -> int:
    """CRC-8 poly 0x07 (the FLAC frame-header CRC)."""
    crc = 0
    for b in data:
        crc ^= b
        for _ in range(8):
            crc = ((crc << 1) ^ 0x07) & 0xFF if crc & 0x80 \
                else (crc << 1) & 0xFF
    return crc


def flac_bytes(doc_id: int) -> bytes:
    """Minimal spec-valid FLAC: STREAMINFO + ONE fixed-blocking frame
    holding the same closed-form samples as the WAV twin, encoded as a
    16-bit mono VERBATIM subframe (every sample stored raw — the
    bit-exact no-prediction form)."""
    samples = fixture_samples(doc_id)
    n = len(samples)
    # STREAMINFO: min/max block size, zeros for frame sizes, packed
    # rate/channels/bps/total, zero MD5
    u64 = (AUDIO_RATE << 44) | (0 << 41) | (15 << 36) | n
    si = (struct.pack(">HH", 16, 65535) + b"\x00" * 6
          + u64.to_bytes(8, "big") + b"\x00" * 16)
    out = bytearray(b"fLaC" + b"\x80" + (34).to_bytes(3, "big") + si)
    # frame header: sync, fixed blocking, 8-bit block size at end,
    # rate/size from STREAMINFO, mono, frame number 0
    w = _MsbBitWriter()
    w.write(0b11111111111110, 14)
    w.write(0, 1)          # reserved
    w.write(0, 1)          # fixed blocking
    w.write(6, 4)          # block size: 8-bit at end
    w.write(0, 4)          # rate from STREAMINFO
    w.write(0, 4)          # mono
    w.write(0, 3)          # sample size from STREAMINFO
    w.write(0, 1)          # reserved
    w.write(0, 8)          # frame number 0 (single-byte UTF-8)
    w.write(n - 1, 8)
    hdr = w.bytes()
    out += hdr + bytes([_crc8(hdr)])
    body = _MsbBitWriter()
    body.write(0, 1)       # subframe header: zero bit
    body.write(1, 6)       # type: verbatim
    body.write(0, 1)       # no wasted bits
    for s in samples:
        body.write(s & 0xFFFF, 16)
    body.align()
    out += body.bytes()
    out += b"\x00\x00"     # frame CRC-16 (present; not rechecked)
    return bytes(out)


class _LsbBitWriter:
    """LSB-first bit packer (GIF LZW bit order)."""

    def __init__(self):
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, n: int):
        self.acc |= (value & ((1 << n) - 1)) << self.nbits
        self.nbits += n
        while self.nbits >= 8:
            self.buf.append(self.acc & 0xFF)
            self.acc >>= 8
            self.nbits -= 8

    def bytes(self) -> bytes:
        if self.nbits:
            self.buf.append(self.acc & 0xFF)
            self.acc, self.nbits = 0, 0
        return bytes(self.buf)


def _gif_lzw(indices: list[int]) -> bytes:
    """GIF LZW stream for 8-bit indices, width pinned at 9 bits by
    emitting a CLEAR code before every literal (legal, uncompressed)."""
    clear, eoi = 256, 257
    w = _LsbBitWriter()
    w.write(clear, 9)
    for idx in indices:
        w.write(idx, 9)
        w.write(clear, 9)
    w.write(eoi, 9)
    return w.bytes()


def _sub_blocks(data: bytes) -> bytes:
    out = bytearray()
    for i in range(0, len(data), 255):
        chunk = data[i:i + 255]
        out.append(len(chunk))
        out += chunk
    out.append(0)
    return bytes(out)


def gif_palette() -> list[tuple[int, int, int]]:
    return [(i, (i * 3) % 256, (i * 7) % 256) for i in range(256)]


def gif_frame_indices(doc_id: int, frame: int) -> list[int]:
    return [(doc_id * 13 + frame * 29 + y * GIF_W + x) % 256
            for y in range(GIF_H) for x in range(GIF_W)]


def gif_animated_bytes(doc_id: int) -> bytes:
    """4-frame full-screen animated GIF89a: global 256-color table,
    per-frame GCE (disposal 1, 100 ms delay, opaque), no local tables,
    no interlace — coalesced frame f is exactly frame f's pixels."""
    out = bytearray(b"GIF89a")
    out += struct.pack("<HH", GIF_W, GIF_H)
    out.append(0xF7)       # GCT present, 8 bits/color, size 256
    out.append(0)          # background index
    out.append(0)          # aspect
    for r, g, b in gif_palette():
        out += bytes((r, g, b))
    delay_cs = GIF_DELAY_MS // 10
    for f in range(GIF_FRAMES):
        out += bytes((0x21, 0xF9, 0x04))          # GCE
        out.append(0x04)                          # disposal 1, opaque
        out += struct.pack("<H", delay_cs)
        out += bytes((0x00, 0x00))                # no transparent; term
        out += b"\x2C" + struct.pack("<HHHH", 0, 0, GIF_W, GIF_H)
        out.append(0x00)                          # no LCT
        out.append(8)                             # LZW min code size
        out += _sub_blocks(_gif_lzw(gif_frame_indices(doc_id, f)))
    out.append(0x3B)
    return bytes(out)
