"""Pins for the four r11 ADVICE findings closed in r12.

1. (medium) zero-dimension PNG/BMP payloads must raise ValueError in
   the pixel decoders — previously a width=0, height>max_dim PNG
   decoded to shape (h, 0, 1) and crashed area_resample with an
   IndexError the resize tiering doesn't catch, failing the whole
   Spark task on one adversarial row.
2. (medium) a non-interleaved multi-scan baseline JPEG (first SOS
   covering fewer components than the frame declares) must never be
   silently committed as the Y scan alone. Originally closed by a
   loud NotImplementedError; late-r12 the shape DECODES FOR REAL
   (sequential per-component scans accumulate into the progressive
   coefficient store, finalize requires every component scanned), so
   the pin now asserts the real decode matches the interleaved twin
   and that an INCOMPLETE stream (Y scan only, no Cb/Cr) still raises
   loudly instead of producing a grey image.
3. (low) the multimodal module/tier docs must state baseline JPEG is
   fully decoded (checked here so they can't silently regress).
4. (low) _genstore.run_id_for_checkpoint must never return an empty
   run id: the marker is now published atomically WITH its content
   (temp-file + hard link), and a legacy empty marker is repaired.
"""

import os
import struct
import zlib

import pytest

from big_data_crypto_sentiment_spark.jobs._genstore import (
    RUN_ID_FILE,
    run_id_for_checkpoint,
)
from big_data_crypto_sentiment_spark.operators.multimodal import (
    decode_bmp_pixels,
    decode_gif_pixels,
    decode_jpeg_pixels,
    decode_png_pixels,
)


def _png_chunk(ctype, data):
    return (struct.pack(">I", len(data)) + ctype + data
            + struct.pack(">I", zlib.crc32(ctype + data)))


def _zero_width_png(h=300):
    """CRC-valid PNG claiming width=0 (spec-invalid) — the exact
    ADVICE repro shape: height over max_dim so the old decode produced
    (h, 0, 1) and area_resample raised IndexError."""
    return (b"\x89PNG\r\n\x1a\n"
            + _png_chunk(b"IHDR", struct.pack(">IIBBBBB", 0, h, 8, 0,
                                              0, 0, 0))
            + _png_chunk(b"IDAT", zlib.compress(b"\x00" * h))
            + _png_chunk(b"IEND", b""))


def _zero_width_bmp(h=5):
    hdr = bytearray(54)
    hdr[0:2] = b"BM"
    hdr[10:14] = (54).to_bytes(4, "little")
    hdr[14:18] = (40).to_bytes(4, "little")
    hdr[18:22] = (0).to_bytes(4, "little", signed=True)   # width 0
    hdr[22:26] = h.to_bytes(4, "little", signed=True)
    hdr[26:28] = (1).to_bytes(2, "little")
    hdr[28:30] = (24).to_bytes(2, "little")
    return bytes(hdr)


def test_zero_dimension_images_raise_valueerror():
    with pytest.raises(ValueError):
        decode_png_pixels(_zero_width_png())
    with pytest.raises(ValueError):
        decode_bmp_pixels(_zero_width_bmp())
    # GIF gets the same gate (image descriptor claiming 0xN)
    from tests.test_sinks_multimodal import _gif, PALETTE
    g = bytearray(_gif(4, 3, [0] * 12, PALETTE))
    desc = g.index(0x2C)
    g[desc + 5:desc + 9] = struct.pack("<HH", 0, 3)
    with pytest.raises(ValueError):
        decode_gif_pixels(bytes(g))


def test_zero_width_png_falls_to_decoded_dims_tier_not_task_failure(
        spark):
    """End-to-end through resize_images(use_real_codec=True): one
    adversarial zero-width row must land in the decoded-dims marker
    tier, never fail the Spark task (the ADVICE reproduction)."""
    from big_data_crypto_sentiment_spark.operators.multimodal import (
        RESIZE_STUB_MAGIC,
        resize_images,
    )
    from big_data_crypto_sentiment_spark.schemas import MEDIA_SCHEMA
    rows = [(1, "image", _zero_width_png(), "image/png", None, None,
             None),
            (2, "image", _zero_width_bmp(), "image/bmp", None, None,
             None)]
    df = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = {r.media_id: r
           for r in resize_images(df, use_real_codec=True).collect()}
    assert out[1].resize_status == "decoded-dims"
    assert out[2].resize_status == "decoded-dims"
    assert (out[1].src_width, out[1].src_height) == (0, 300)
    assert bytes(out[1].payload).startswith(RESIZE_STUB_MAGIC)


def _encode_noninterleaved(img, q=16, subsample=False):
    """Independent NON-INTERLEAVED baseline encoder (test-side
    reference): same front half as the interleaved twin
    (_quantize_ref), then one single-component SOS per component,
    blocks in each component's own ceil-divided grid (T.81 A.2.2 —
    NOT the MCU-padded grid), shared fixed-length Huffman tables.
    Returns (payload, reference_rgb)."""
    from tests.test_sinks_multimodal import (
        _BitWriter,
        _fixed_len_huff,
        _quantize_ref,
        _zigzag_nat,
    )
    h, w = img.shape[:2]
    comps, quantized, ref, mcux, mcuy, qtab, hmax, vmax = \
        _quantize_ref(img, q, subsample)
    zz_nat = _zigzag_nat()

    def block_symbols(blk, pred):
        dc = int(blk.reshape(-1)[0]) - pred
        s = abs(dc).bit_length()
        dcv = dc if dc >= 0 else dc + (1 << s) - 1
        seq = [int(blk.reshape(-1)[i]) for i in zz_nat[1:]]
        last_nz = -1
        for i, v in enumerate(seq):
            if v:
                last_nz = i
        acs, run = [], 0
        for i, v in enumerate(seq):
            if i > last_nz:
                break
            if v == 0:
                run += 1
                continue
            while run > 15:
                acs.append((0xF0, 0, 0))
                run -= 16
            sz = abs(v).bit_length()
            vv = v if v >= 0 else v + (1 << sz) - 1
            acs.append(((run << 4) | sz, vv, sz))
            run = 0
        if last_nz < len(seq) - 1:
            acs.append((0x00, 0, 0))
        return (s, dcv), acs, int(blk.reshape(-1)[0])

    # per-component symbol streams in the NON-INTERLEAVED grid
    scans = []
    for name, plane, ch, cv in comps:
        cw = -(-w * ch // hmax)
        chh = -(-h * cv // vmax)
        wb, hb = -(-cw // 8), -(-chh // 8)
        pred, blocks = 0, []
        for by in range(hb):
            for bx in range(wb):
                (s, dcv), acs, dc_abs = block_symbols(
                    quantized[name][(by, bx)], pred)
                pred = dc_abs
                blocks.append((s, dcv, acs))
        scans.append(blocks)

    dc_syms = [b[0] for sc in scans for b in sc]
    ac_syms = [a[0] for sc in scans for b in sc for a in b[2]]
    dcc, dcs, dccodes = _fixed_len_huff(dc_syms)
    acc_, acs_, accodes = _fixed_len_huff(ac_syms)

    def seg(marker, body):
        return bytes((0xFF, marker)) \
            + struct.pack(">H", 2 + len(body)) + body

    dqt = bytes([0x00]) + bytes(int(qtab.reshape(-1)[i])
                                for i in zz_nat)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([3])
    for i, (name, plane, ch, cv) in enumerate(comps):
        sof += bytes([i + 1, (ch << 4) | cv, 0])
    dht = bytes([0x00]) + bytes(dcc) + bytes(dcs) \
        + bytes([0x10]) + bytes(acc_) + bytes(acs_)
    payload = b"\xff\xd8" + seg(0xDB, dqt) + seg(0xC0, sof) \
        + seg(0xC4, dht)
    for i, blocks in enumerate(scans):
        bw = _BitWriter()
        for s, dcv, acs in blocks:
            L, code = dccodes[s]
            bw.put(code, L)
            if s:
                bw.put(dcv, s)
            for sym, vv, sz in acs:
                L, code = accodes[sym]
                bw.put(code, L)
                if sz:
                    bw.put(vv, sz)
        bw.align_ones()
        sos = bytes([1, i + 1, 0x00, 0, 63, 0])
        payload += seg(0xDA, sos) + bytes(bw.out)
    return payload + b"\xff\xd9", ref


def test_jpeg_non_interleaved_multiscan_decodes_for_real():
    import numpy as np

    from tests.test_sinks_multimodal import _test_image
    img = _test_image(10, 14)
    payload, ref = _encode_noninterleaved(img, q=16)
    out = decode_jpeg_pixels(payload)
    assert out.shape == ref.shape
    assert int(np.abs(out.astype(int) - ref.astype(int)).max()) <= 1


def test_jpeg_non_interleaved_subsampled_decodes_for_real():
    import numpy as np

    from tests.test_sinks_multimodal import _test_image
    img = _test_image(18, 20)          # nonint grid != padded MCU grid
    payload, ref = _encode_noninterleaved(img, q=16, subsample=True)
    out = decode_jpeg_pixels(payload)
    assert out.shape == ref.shape
    assert int(np.abs(out.astype(int) - ref.astype(int)).max()) <= 1


def test_jpeg_incomplete_multiscan_raises_not_silent_grey():
    # only the Y scan present (Cb/Cr scans stripped): finalize must
    # refuse — never commit a grey Y-only image as "the picture"
    from tests.test_sinks_multimodal import _test_image
    payload, _ = _encode_noninterleaved(_test_image(8, 8), q=16)
    first_sos = payload.index(b"\xff\xda")
    second_sos = payload.index(b"\xff\xda", first_sos + 2)
    truncated = payload[:second_sos] + b"\xff\xd9"
    with pytest.raises(ValueError, match="missing component"):
        decode_jpeg_pixels(truncated)


def test_jpeg_scan_with_unknown_component_raises_valueerror():
    from tests.test_sinks_multimodal import _jpeg_encode, _test_image
    payload, _ = _jpeg_encode(_test_image(8, 8), q=16)
    sos_at = payload.index(b"\xff\xda")
    bad = bytearray(payload)
    bad[sos_at + 5] = 9                       # scan comp id 9: no match
    with pytest.raises(ValueError):
        decode_jpeg_pixels(bytes(bad))


def test_multimodal_docs_state_baseline_jpeg_is_decoded():
    """ADVICE (low): the module header and resize tier docs said JPEG
    'remains header-only' while the dispatcher ran the real decoder.
    Pin the re-synced statements so docs and behavior can't diverge
    silently again."""
    from big_data_crypto_sentiment_spark.operators import multimodal
    assert "baseline JPEG" in multimodal.__doc__
    assert "remains header-only" not in multimodal.__doc__
    tier_doc = multimodal.resize_images.__doc__
    assert "baseline JPEG" in tier_doc
    assert "documented remaining stub" not in tier_doc


def test_run_id_never_empty_and_marker_atomic(tmp_path):
    cp = str(tmp_path / "cp")
    rid = run_id_for_checkpoint(cp)
    assert rid and rid == run_id_for_checkpoint(cp)
    # marker content is complete the moment the file exists
    with open(os.path.join(cp, RUN_ID_FILE)) as f:
        assert f.read().strip() == rid
    # no temp droppings left behind
    assert [p for p in os.listdir(cp)
            if p.startswith(RUN_ID_FILE)] == [RUN_ID_FILE]

    # legacy crash remnant: marker exists but is EMPTY (the retired
    # open('x')-then-write scheme's window) — must be repaired to a
    # fresh non-empty id, not returned as "" (gen keys 'gen_b_-0')
    cp2 = str(tmp_path / "cp2")
    os.makedirs(cp2)
    open(os.path.join(cp2, RUN_ID_FILE), "w").close()
    rid2 = run_id_for_checkpoint(cp2)
    assert rid2
    assert rid2 == run_id_for_checkpoint(cp2)
    with open(os.path.join(cp2, RUN_ID_FILE)) as f:
        assert f.read().strip() == rid2


def test_frozen_pca_basis_matches_a_fresh_fit(spark):
    """Provenance pin for PCA_FROZEN_COMPONENTS (r11 verdict #3): the
    frozen literals are one embed_pca fit on sf0.001, frozen to 1e-6
    integer units. A fresh fit must reproduce each component up to
    sign (eigenvector sign is arbitrary): |cos| >= 0.999. Guards both
    against literal rot (fixture regenerated, literals stale) and
    against the constant being edited into something that is no longer
    PCA."""
    import numpy as np

    from big_data_crypto_sentiment_spark.queries._util import table
    from big_data_crypto_sentiment_spark.queries.similarity import (
        PCA_FROZEN_COMPONENTS,
        embed_pca,
    )
    e = table(spark, "/root/testdata/sf0.001", "embeddings") \
        .select("vec_id", "embedding")
    model, _, _ = embed_pca(e)
    refit = model.pc.toArray().T                     # (k, d)
    frozen = np.array(PCA_FROZEN_COMPONENTS, dtype=np.float64) / 1e6
    assert frozen.shape == refit.shape == (8, 64)
    for k in range(8):
        cos = abs(float(frozen[k] @ refit[k])
                  / (np.linalg.norm(frozen[k])
                     * np.linalg.norm(refit[k])))
        assert cos >= 0.999, (k, cos)
    # magnitude headroom the exactness argument rests on:
    # |c| < 2^19 per component entry
    assert np.abs(np.array(PCA_FROZEN_COMPONENTS)).max() < (1 << 19)


def test_embed_pca_frozen_projection_is_exact_integer_math(spark):
    """The registered projection equals a numpy integer matmul of the
    frozen vectors against the frozen basis, divided by 1e12 — no
    float-accumulation slack anywhere."""
    import numpy as np

    from big_data_crypto_sentiment_spark.queries.similarity import (
        PCA_FROZEN_COMPONENTS,
        q_embed_pca_frozen,
    )
    rows = q_embed_pca_frozen(spark, "/root/testdata/sf0.001") \
        .orderBy("vec_id").limit(20).collect()
    import duckdb
    emb = dict(duckdb.sql(
        "SELECT vec_id, embedding FROM "
        "'/root/testdata/sf0.001/embeddings.parquet' "
        "ORDER BY vec_id LIMIT 20").fetchall())
    comp = np.array(PCA_FROZEN_COMPONENTS, dtype=np.int64)
    for r in rows:
        x8 = np.round(np.array(emb[r.vec_id], dtype=np.float64)
                      * 1e6).astype(np.int64)
        want = (comp @ x8).astype(np.float64) / 1e12
        got = np.array([getattr(r, f"p{k}") for k in range(8)])
        assert (got == want).all(), r.vec_id   # bit-exact, not approx


def test_two_level_semdedup_matches_exhaustive_on_separated_clusters(
        spark):
    """semdedup_assign_routed (O(N·√k·d) two-level routing — the fix
    for the exhaustive assignment's N·k·d term going quadratic under
    the k ∝ N rule) must agree with the exhaustive path wherever
    routing picks the same centroid. On well-separated clusters it
    picks the same centroid EVERYWHERE, so the full SemDeDup outputs
    are identical row for row."""
    import numpy as np

    from big_data_crypto_sentiment_spark.queries.similarity import (
        _freeze_vectors,
        _semdedup_pairs,
        freeze_kmeans_centroids,
        semdedup,
        semdedup_assign_routed,
    )
    rng = np.random.default_rng(7)
    k, n_per, d = 12, 25, 16
    centers = rng.normal(size=(k, d)) * 50        # far apart
    rows = []
    vid = 0
    for c in range(k):
        for _ in range(n_per):
            v = centers[c] + 0.05 * rng.normal(size=d)
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    vecs = spark.createDataFrame(rows,
                                 "vec_id long, embedding array<float>")
    cents_list = [(c, [float(x) for x in centers[c]]) for c in range(k)]
    frozen = _freeze_vectors(vecs)
    exhaustive = semdedup(frozen,
                          freeze_kmeans_centroids(spark, cents_list))
    routed_assigned = semdedup_assign_routed(spark, frozen, cents_list,
                                             kc=4)
    routed = _semdedup_pairs(frozen, routed_assigned, 0.35)
    a = {r.vec_id: (r.cid, r.cos_to_centroid, r.is_kept)
         for r in exhaustive.collect()}
    b = {r.vec_id: (r.cid, r.cos_to_centroid, r.is_kept)
         for r in routed.collect()}
    assert a == b and len(a) == k * n_per
    # the dedup did real work (planted tight clusters -> drops)
    assert sum(1 for _, _, kept in a.values() if not kept) > 0


def test_semdedup_kmeans_auto_threshold_wiring(spark):
    """Below TWO_LEVEL_MIN_K the default path stays exhaustive (the
    recorded bench series depends on it); explicit two_level=True
    forces routing and still returns the same schema."""
    from big_data_crypto_sentiment_spark.queries._util import table
    from big_data_crypto_sentiment_spark.queries.similarity import (
        TWO_LEVEL_MIN_K,
        semdedup_k_for,
        semdedup_kmeans,
    )
    # every size the RECORDED series actually runs semdedup_kmeans at
    # stays below the auto threshold (sf0.1's 2k embeddings; the
    # x10 curate funnel's 20k) — so the r10-r12 bench numbers compare
    # like for like; the x30 corpus would cross it but the funnel
    # deliberately doesn't run there (BASELINE.md §r12)
    assert semdedup_k_for(2_000) < TWO_LEVEL_MIN_K
    assert semdedup_k_for(20_000) < TWO_LEVEL_MIN_K
    # ... and the rule reaches the threshold where routing should kick
    # in (k = N/100 ≥ 256 from N = 25,600 embedded docs)
    assert semdedup_k_for(TWO_LEVEL_MIN_K * 100) >= TWO_LEVEL_MIN_K
    e = table(spark, "/root/testdata/sf0.001", "embeddings") \
        .select("vec_id", "embedding")
    out = semdedup_kmeans(spark, e, k=8, two_level=True)
    assert out.columns == ["vec_id", "cid", "cos_to_centroid",
                           "is_kept"]
    assert out.count() == e.count()


def test_semdedup_fit_cap_samples_the_kmeans_input(spark):
    """Past fit_cap rows the KMeans fit runs on a hash-sample while
    the ASSIGNMENT still covers every row — output cardinality and
    schema are unchanged and drops still happen on planted dups."""
    import numpy as np

    from big_data_crypto_sentiment_spark.queries.similarity import (
        SEMDEDUP_FIT_CAP,
        semdedup_kmeans,
    )
    rng = np.random.default_rng(3)
    centers = rng.normal(size=(4, 8)) * 30
    rows = []
    for i in range(400):
        v = centers[i % 4] + 0.05 * rng.normal(size=8)
        rows.append((i, [float(x) for x in v]))
    vecs = spark.createDataFrame(rows,
                                 "vec_id long, embedding array<float>")
    out = semdedup_kmeans(spark, vecs, k=4, fit_cap=100).collect()
    assert len(out) == 400
    assert sum(1 for r in out if not r.is_kept) > 0
    # nothing the recorded series runs crosses the default cap
    assert SEMDEDUP_FIT_CAP >= 100_000
