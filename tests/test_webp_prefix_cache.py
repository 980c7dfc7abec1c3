"""The VP8L prefix-code memo must be a pure cache: identical table bit
spans reuse the parsed code, different spans at the same offset can
never alias (r6 optimization: table parsing dominated decode_webp on
corpus payloads that re-use one encoder's tables)."""

import struct

import numpy as np

from dd_ops_ocr_spark.operators import webp as W


def _single_code_stream(w, h, g, r, b):
    """Hand-built literal-only VP8L stream whose five prefix codes are
    all single-symbol (0 bits per pixel) — a DIFFERENT table section
    from encode_webp_lossless's fixed-8 one, at the same bit offset."""
    bw = W._BitWriter()
    bw.write_bits(w - 1, 14)
    bw.write_bits(h - 1, 14)
    bw.write_bits(0, 1)
    bw.write_bits(0, 3)
    bw.write_bits(0, 1)
    bw.write_bits(0, 1)
    bw.write_bits(0, 1)
    for sym in (g, r, b, 255, 0):  # green, red, blue, alpha, distance
        W._write_single_symbol_code(bw, sym)
    body = b"\x2f" + bw.tobytes()
    vp8l = W.chunk(b"VP8L", body)
    return b"RIFF" + struct.pack("<I", 4 + len(vp8l)) + b"WEBP" + vp8l


def test_prefix_cache_no_aliasing():
    W._PREFIX_CACHE.clear()
    rng = np.random.default_rng(9)
    px = rng.integers(0, 256, (11, 13, 3), dtype=np.uint8)
    fixed = W.encode_webp_lossless(px)
    flat = _single_code_stream(13, 11, 10, 20, 30)
    flat2 = _single_code_stream(13, 11, 99, 98, 97)
    # interleave so every decode after the first runs against a warm
    # cache holding the OTHER stream's candidates at the same offsets
    for _ in range(3):
        assert np.array_equal(W.decode_webp(fixed), px)
        a = W.decode_webp(flat)
        assert (a.reshape(-1, 3) == [20, 10, 30]).all()
        b = W.decode_webp(flat2)
        assert (b.reshape(-1, 3) == [98, 99, 97]).all()


def test_cached_equals_fresh_parse():
    from dd_ops_ocr_spark.operators.multimodal import synth_webp_payload

    payloads = [synth_webp_payload(f"media_{i:06d}.bin") for i in range(20)]
    W._PREFIX_CACHE.clear()
    fresh = [W.decode_webp(p) for p in payloads]
    warm = [W.decode_webp(p) for p in payloads]
    for f, w_ in zip(fresh, warm):
        assert np.array_equal(f, w_)
