"""Property tests for the pure-numpy image codecs (no Spark session —
these run fast and hammer the bit-level paths)."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from dd_ops_ocr_spark.operators.jpeg import (
    decode_jpeg,
    encode_jpeg,
    jpeg_dimensions,
)
from dd_ops_ocr_spark.operators.multimodal import ahash64, decode_bmp, encode_bmp
from dd_ops_ocr_spark.operators.png import decode_png, encode_png, png_dimensions


def _image(w: int, h: int, seed: int, smooth: bool) -> np.ndarray:
    if smooth:
        # genuinely low-frequency content (a few counts per pixel of
        # slope, no wraparound) — JPEG's friendly case at ANY size;
        # linspace(0,255) over tiny dims would be high-contrast, not smooth
        y = np.arange(h, dtype=np.float64)[:, None]
        x = np.arange(w, dtype=np.float64)[None, :]
        r = np.minimum(3 * x + 2 * y, 255.0)
        g = np.minimum(64 + 2 * x + 3 * y, 255.0)
        b = np.full((h, w), (seed * 37) % 200 + 20, dtype=np.float64)
        return np.stack([r, g, b], axis=2).astype(np.uint8)
    idx = np.arange(h * w * 3, dtype=np.uint64) + np.uint64(seed)
    v = (idx * np.uint64(0x9E3779B97F4A7C15)) >> np.uint64(33)
    return (v & np.uint64(0xFF)).astype(np.uint8).reshape(h, w, 3)


dims = st.tuples(st.integers(1, 40), st.integers(1, 40))


@settings(max_examples=25, deadline=None)
@given(dims, st.integers(0, 2**31), st.booleans())
def test_png_roundtrip_exact(wh, seed, smooth):
    w, h = wh
    px = _image(w, h, seed, smooth)
    data = encode_png(px)
    assert png_dimensions(data) == (w, h)
    assert (decode_png(data) == px).all()


@settings(max_examples=25, deadline=None)
@given(dims, st.integers(0, 2**31), st.booleans())
def test_bmp_roundtrip_exact(wh, seed, smooth):
    w, h = wh
    px = _image(w, h, seed, smooth)
    data = encode_bmp(px)
    out = decode_bmp(data)
    assert (out == px).all()
    assert 0 <= ahash64(out) < (1 << 63)


@settings(max_examples=15, deadline=None)
@given(dims, st.integers(0, 2**31),
       st.sampled_from(["4:4:4", "4:2:0"]),
       st.sampled_from([50, 75, 95, 100]))
def test_jpeg_roundtrip_dims_and_bound(wh, seed, sub, q):
    """JPEG is lossy: dimensions must be exact for every geometry /
    sampling / quality combination; pixel error must stay within the
    lossy envelope (structured content at q100 4:4:4 is near-exact)."""
    w, h = wh
    px = _image(w, h, seed, smooth=True)
    data = encode_jpeg(px, quality=q, subsampling=sub)
    assert jpeg_dimensions(data) == (w, h)
    out = decode_jpeg(data)
    assert out.shape == px.shape
    err = np.abs(out.astype(int) - px.astype(int)).mean()
    # tight bounds (post zigzag-dequant fix): smooth content reconstructs to
    # within a couple of counts at every quality; a quant-table ordering
    # regression pushes these to ~10-35 and must fail loudly
    if q == 100 and sub == "4:4:4":
        assert err < 0.5, err
    elif q >= 75:
        assert err < 3.0, (err, q, sub)
    else:
        assert err < 6.0, (err, q, sub)


def test_jpeg_noise_q95_tight_bound():
    """High-frequency noise at q95 4:4:4 — the case that exposed the
    zigzag/raster dequantization mix-up (err 35.4 broken vs 3.2 fixed)."""
    px = _image(37, 29, 123, smooth=False)
    out = decode_jpeg(encode_jpeg(px, quality=95, subsampling="4:4:4"))
    err = np.abs(out.astype(int) - px.astype(int)).mean()
    assert err < 8.0, err


@settings(max_examples=15, deadline=None)
@given(dims, st.integers(0, 2**31))
def test_jpeg_decode_deterministic(wh, seed):
    w, h = wh
    px = _image(w, h, seed, smooth=False)
    data = encode_jpeg(px, quality=80, subsampling="4:2:0")
    assert decode_jpeg(data).tobytes() == decode_jpeg(data).tobytes()


def test_jpeg_fill_bytes_before_marker():
    """T.81 B.1.1.2: 0xFF fill bytes may pad the entropy data up to any
    marker. A fill run before EOI must neither truncate the scan nor leak
    padding bytes into the decoded data (ADVICE r4: FF-FF was classified
    as the scan terminator)."""
    px = _image(48, 64, 11, smooth=False)
    data = encode_jpeg(px, quality=90, subsampling="4:4:4")
    assert data[-2:] == b"\xff\xd9"
    filled = data[:-2] + b"\xff\xff" + data[-2:]
    assert np.array_equal(decode_jpeg(filled), decode_jpeg(data))


def test_jpeg_truncated_scan_raises_eoferror():
    """A scan cut mid-entropy-data must surface as EOFError with a clear
    message, not an IndexError from the bitstream window list."""
    import pytest

    px = _image(48, 64, 13, smooth=False)
    data = encode_jpeg(px, quality=90, subsampling="4:2:0")
    # cut deep into the scan: a small tail cut can decode "cleanly" from
    # the zero padding, which is acceptable — the guarantee under test is
    # that when the bitstream DOES run out, the error is EOFError
    for frac in (2, 3, 4):
        with pytest.raises(EOFError, match="truncated JPEG scan"):
            decode_jpeg(data[: len(data) // frac])


def test_jpeg_corrupt_bytes_raise_clean_exceptions():
    """Seeded single-byte corruption across the entropy segment: every
    outcome is either a decoded image or a clean (EOFError, ValueError) —
    never 'negative shift count' from a (run,0) AC symbol (treated as a
    zero coefficient per T.81 extend(0,0)=0) and never a raw IndexError."""
    px = _image(40, 56, 17, smooth=False)
    data = encode_jpeg(px, quality=85, subsampling="4:2:0")
    rng = np.random.default_rng(7)
    start = len(data) // 2
    for _ in range(60):
        b = bytearray(data)
        i = int(rng.integers(start, len(data) - 2))
        b[i] = int(rng.integers(0, 256))
        try:
            out = decode_jpeg(bytes(b))
            assert out.shape == px.shape
        except (EOFError, ValueError) as e:
            assert "negative shift" not in str(e)


@settings(max_examples=25, deadline=None)
@given(dims, st.integers(0, 2**31), st.booleans())
def test_png_adam7_roundtrip_exact(wh, seed, smooth):
    """Adam7-interlaced encode -> decode is pixel-exact at every
    geometry, including sub-8x8 images where most passes are empty."""
    w, h = wh
    px = _image(w, h, seed, smooth)
    data = encode_png(px, interlace=True)
    assert png_dimensions(data) == (w, h)
    assert (decode_png(data) == px).all()
    # same pixels either way: the interlace flag changes the byte
    # layout, never the image
    assert (decode_png(encode_png(px)) == decode_png(data)).all()


def test_png_adam7_grid_is_a_partition():
    """The seven pass grids tile the image exactly once (PNG spec §8.2) —
    the invariant the scatter-based decoder relies on."""
    from dd_ops_ocr_spark.operators.png import _ADAM7

    for w, h in [(1, 1), (2, 3), (7, 5), (8, 8), (9, 10), (40, 33)]:
        cov = np.zeros((h, w), dtype=int)
        for x0, y0, dx, dy in _ADAM7:
            cov[y0::dy, x0::dx] += 1
        assert (cov == 1).all(), (w, h)


def test_progressive_encoder_bit_identical_to_baseline():
    """The numpy progressive ENCODER (SOF2, DC scan + per-component AC
    bands): decoding its output must be bit-identical to decoding the
    baseline encoding of the same pixels — through the numpy decoder
    AND (when present) libjpeg, since both encodings carry the same
    quantized coefficients."""
    import numpy as np

    from dd_ops_ocr_spark.operators.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )
    from dd_ops_ocr_spark import native
    from dd_ops_ocr_spark.operators.multimodal import (
        _synth_pixels,
        synth_page_pixels,
    )

    cases = [
        (synth_page_pixels(83, 57), "4:2:0", 90),   # partial MCUs
        (synth_page_pixels(96, 120), "4:4:4", 95),
        (_synth_pixels("m1"), "4:2:0", 95),          # md5 noise
        (np.full((17, 23, 3), 200, np.uint8), "4:2:0", 85),  # flat
    ]
    for px, sub, q in cases:
        base = encode_jpeg(px, quality=q, subsampling=sub)
        prog = encode_jpeg_progressive(px, quality=q, subsampling=sub)
        # genuinely SOF2 (the frame marker follows the two DQT segments)
        assert b"\xff\xc2" in prog[:200] and b"\xff\xc2" not in base[:200]
        assert np.array_equal(decode_jpeg(base), decode_jpeg(prog))
        if native.available():
            assert np.array_equal(
                native.decode_jpeg_native(base),
                native.decode_jpeg_native(prog),
            )


def test_jpeg_unsupported_shapes_raise_loudly():
    """4-component (CMYK) and multi-scan baseline JPEGs are documented
    seams: they must raise NotImplementedError, never entropy-decode to
    silently wrong pixels (the K plane would be dropped) or misalign
    the Huffman stream into a bogus corrupt-file error."""
    import struct as _struct

    import numpy as np
    import pytest

    from dd_ops_ocr_spark.operators.jpeg import decode_jpeg, encode_jpeg

    px = np.full((16, 16, 3), 128, dtype=np.uint8)
    good = bytearray(encode_jpeg(px))

    # patch SOF0 to claim 4 components (header-level: the guard must
    # fire before any entropy work)
    sof_at = bytes(good).find(b"\xff\xc0")
    nc_at = sof_at + 4 + 5  # marker(2) + len(2) + prec(1) + h(2) + w(2)
    bad = bytes(good[:nc_at]) + b"\x04" + bytes(good[nc_at + 1:])
    with pytest.raises(NotImplementedError, match="CMYK"):
        decode_jpeg(bad)

    # patch SOS to claim a single-component scan of the 3-component SOF
    sos_at = bytes(good).find(b"\xff\xda")
    ln = _struct.unpack_from(">H", good, sos_at + 2)[0]
    patched = bytearray(good)
    patched[sos_at + 2:sos_at + 4] = _struct.pack(">H", ln - 4)
    patched[sos_at + 4] = 1  # ns = 1, keep only comp 1's entry
    del patched[sos_at + 7:sos_at + 11]  # drop comps 2-3 entries
    with pytest.raises(NotImplementedError, match="multi-scan"):
        decode_jpeg(bytes(patched))


def test_webp_simple_code_duplicate_symbol_rejected():
    """A 2-symbol VP8L simple prefix code that repeats its symbol would
    collapse to a 0-bit single-symbol code and desynchronize the whole
    decode — the reader must reject it loudly."""
    import pytest

    from dd_ops_ocr_spark.operators.webp import _BitReader, _read_prefix_code

    # bits (LSB-first): 1 (simple), 1 (two symbols), 0 (1-bit first
    # symbol), symbol0 = 1, then symbol1 = 1 over 8 bits -> duplicate
    bits = [1, 1, 0, 1] + [1, 0, 0, 0, 0, 0, 0, 0]
    by = bytearray(2)
    for i, b in enumerate(bits):
        by[i // 8] |= b << (i % 8)
    with pytest.raises(ValueError, match="repeats its symbol"):
        _read_prefix_code(_BitReader(bytes(by)), 256)


def test_sample_indices_zero_requested_returns_none():
    from dd_ops_ocr_spark.operators.video import sample_indices

    assert sample_indices(10, 0) == []
    assert sample_indices(10, -3) == []
    assert sample_indices(0, 3) == []
    assert sample_indices(10, 1) == [0]
