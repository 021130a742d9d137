"""Long-run mutation fuzz for the decode surface (the out-of-band
companion to tests/test_decoder_hardening.py's bounded smoke): seeds
from every family the repo can self-encode, tens of thousands of
byte-level mutations, a SIGALRM watchdog per call, and the tier
contract asserted — ONLY ValueError / NotImplementedError (or a
successful decode) may escape any entry point.

Usage: python tools/fuzz_decoders.py [iterations] [seed]
"""

from __future__ import annotations

import importlib.util
import os
import random
import signal
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OK_TYPES = (ValueError, NotImplementedError)
TIMEOUT_S = 5


def _load(name: str):
    p = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tests", name)
    spec = importlib.util.spec_from_file_location(
        name.removesuffix(".py"), p)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def build_seeds() -> list[bytes]:
    import numpy as np
    from big_data_crypto_sentiment_spark.operators import (
        media_fixtures as MF,
    )
    from big_data_crypto_sentiment_spark.operators.multimodal import (
        encode_png,
    )
    seeds = []
    hier = _load("test_jpeg_hierarchical.py")
    seeds.append(hier._hier_grey(hier._smooth(16, 16, 9))[0])
    seeds.append(hier._hier_grey(hier._smooth(15, 9, 2))[0])
    ll = _load("test_jpeg_lossless.py")
    seeds.append(ll._encode_lossless([ll._img(8, 8, 3)], sel=4)[0])
    seeds.append(ll._encode_lossless([ll._img(6, 7, 4)],
                                     prec=16, sel=7)[0])
    s6 = _load("test_jpeg_sof6.py")
    seeds.append(s6._hier_grey_sof6(s6._smooth(16, 16, 3))[0])
    ar = _load("test_jpeg_arith.py")
    seeds.append(ar._encode_arith([ar._img(16, 16, 5)])[0])
    seeds.append(ar._encode_arith([ar._img(16, 24, s)
                                   for s in (1, 2, 9)],
                                  restart=2)[0])
    seeds.append(ar._encode_arith_progressive([ar._img(16, 16, 4)])[0])
    tg = _load("test_tiff_g711.py")

    def pack_img(img, bits):
        def row(vals):
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
        return b"".join(row(r) for r in img)

    img1 = (np.arange(50).reshape(5, 10) % 2).astype(np.uint8)
    seeds.append(tg._tiff(10, 5, [pack_img(img1, 1)], bits=1))
    seeds.append(tg._tiff(10, 5, [tg._rev_bytes(pack_img(img1, 1))],
                          bits=1, extra_tags=[(266, 3, [2])]))
    img4 = (np.arange(36).reshape(6, 6) % 16).astype(np.uint8)
    seeds.append(tg._tiff(6, 6, [tg._packbits_encode(pack_img(img4, 4))],
                          bits=4, compression=32773))
    # r16 tiers: FillOrder-2 LZW and mixed-depth packed samples
    f2 = b"".join(tg._rev_bytes(tg._pack_row(r, 4)) for r in img4)
    seeds.append(tg._tiff(6, 6, [tg._tiff_lzw_encode(f2)], bits=4,
                          compression=5, extra_tags=[(266, 3, [2])]))
    imgm = np.stack([np.arange(30).reshape(5, 6) % (1 << b)
                     for b in (4, 8, 2)], axis=2).astype(np.uint8)
    seeds.append(tg._tiff(6, 5, [tg._pack_img_mixed(imgm, (4, 8, 2))],
                          bits=[4, 8, 2], spp=3, photo=2))
    img = (np.arange(147) % 256).astype(np.uint8).reshape(7, 7, 3)
    seeds.append(encode_png(img))
    seeds += [MF.flac_bytes(13), MF.gif_animated_bytes(7),
              MF.wav_pcm_bytes(31)]
    return seeds


def main() -> int:
    from big_data_crypto_sentiment_spark.operators.multimodal import (
        decode_flac_samples,
        decode_gif_frames,
        decode_image_pixels,
        decode_media,
        decode_video_frames,
        decode_wav_samples,
    )
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    rng = random.Random(int(sys.argv[2]) if len(sys.argv) > 2 else 99)
    seeds = build_seeds()
    entries = [lambda p: decode_media(p, "image"), decode_image_pixels,
               decode_gif_frames, decode_video_frames,
               decode_wav_samples, decode_flac_samples]

    def alarm(_s, _f):
        raise TimeoutError("decoder exceeded the watchdog")

    signal.signal(signal.SIGALRM, alarm)
    bad = 0
    for it in range(iters):
        base = bytearray(seeds[rng.randrange(len(seeds))])
        for _ in range(rng.randrange(1, 8)):
            op = rng.random()
            if op < 0.6 and base:
                base[rng.randrange(len(base))] = rng.getrandbits(8)
            elif op < 0.8 and len(base) > 4:
                del base[rng.randrange(len(base)):]
            else:
                at = rng.randrange(len(base) + 1)
                base[at:at] = bytes(rng.getrandbits(8)
                                    for _ in range(rng.randrange(1, 4)))
        p = bytes(base)
        for fn in entries:
            signal.alarm(TIMEOUT_S)
            try:
                fn(p)
            except OK_TYPES:
                pass
            except BaseException as ex:   # noqa: BLE001 — the report
                bad += 1
                print(f"ESCAPE iter={it} fn={fn} "
                      f"{type(ex).__name__}: {ex}", flush=True)
                with open(f"/tmp/fuzz_escape_{bad}.bin", "wb") as f:
                    f.write(p)
            finally:
                signal.alarm(0)
        if it and it % 2000 == 0:
            print(f"{it}/{iters} mutations, {bad} escapes", flush=True)
    print(f"done: {iters} mutations, {bad} escapes")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
