"""WebP codec: pure VP8L subset (operators/webp.py) cross-validated
against native libwebp (native/webp.py) in BOTH directions.

Lossless means bit-exact — unlike the JPEG pair there is no
IDCT-rounding tolerance: the pure encoder's streams must decode
identically through the pure decoder and libwebp, and libwebp's own
lossless output must round-trip exactly through the native decoder.
The container dims parser is decoder-independent and must read all
three layouts (VP8L, lossy VP8, VP8X extended)."""

import struct

import numpy as np
import pytest

from dd_ops_ocr_spark.native import webp as nwebp
from dd_ops_ocr_spark.operators.multimodal import (
    decode_image,
    detect_format,
    synth_webp_payload,
)
from dd_ops_ocr_spark.operators.riff import chunk
from dd_ops_ocr_spark.operators.webp import (
    decode_webp,
    encode_webp_lossless,
    webp_dims,
)

needs_native = pytest.mark.skipif(
    not nwebp.available(),
    reason=f"libwebp unavailable: {nwebp.load_error()}",
)


def _noise(w, h, seed):
    rng = np.random.default_rng(seed)
    return rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)


SIZES = [(1, 1), (5, 3), (32, 25), (1, 17), (16, 1), (33, 40), (129, 64)]


def test_pure_roundtrip_exact():
    for i, (w, h) in enumerate(SIZES):
        img = _noise(w, h, i)
        payload = encode_webp_lossless(img)
        assert detect_format(payload) == "webp"
        assert webp_dims(payload) == (w, h)
        assert np.array_equal(decode_webp(payload), img), (w, h)


def test_decode_image_routes_webp():
    img = _noise(9, 7, 42)
    assert np.array_equal(decode_image(encode_webp_lossless(img)), img)


def test_synth_payload_matches_md5_geometry():
    from dd_ops_ocr_spark.operators.multimodal import synth_geometry

    for ref in ("m-000001", "m-000002", "media/x/17"):
        payload = synth_webp_payload(ref)
        assert webp_dims(payload) == synth_geometry(ref)
        assert decode_webp(payload).shape[2] == 3


def test_truncated_stream_raises_eof():
    payload = encode_webp_lossless(_noise(20, 20, 9))
    with pytest.raises((EOFError, ValueError)):
        decode_webp(payload[:40])


def test_non_webp_rejected():
    with pytest.raises(ValueError):
        webp_dims(b"RIFF\x04\x00\x00\x00WAVE")
    with pytest.raises(ValueError):
        decode_webp(b"\x89PNG\r\n\x1a\nnope")


def test_vp8x_extended_canvas_dims():
    # hand-built extended container: VP8X carries the canvas geometry
    w, h = 300, 200
    vp8x = chunk(
        b"VP8X",
        b"\x00\x00\x00\x00"
        + (w - 1).to_bytes(3, "little")
        + (h - 1).to_bytes(3, "little"),
    )
    body = vp8x + chunk(b"VP8L", b"\x2f\x00\x00\x00\x00")
    payload = b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WEBP" + body
    assert webp_dims(payload) == (w, h)


@needs_native
def test_native_decodes_pure_streams_bit_exact():
    """The pure encoder emits spec-valid bitstreams: libwebp must
    reproduce every pixel, at every geometry parity (odd/1-pixel
    edges exercise the 14-bit header fields and row packing)."""
    for i, (w, h) in enumerate(SIZES):
        img = _noise(w, h, 100 + i)
        nat = nwebp.decode_webp_native(encode_webp_lossless(img))
        assert np.array_equal(nat, img), (w, h)


@needs_native
def test_native_lossless_roundtrip_and_pure_dims():
    """libwebp's own lossless output: bit-exact through the native
    decoder, and the pure container parser reads its geometry (libwebp
    chooses transforms/caches the pure pixel decoder declines — that's
    the documented seam, the dims surface is still ours)."""
    img = _noise(47, 31, 7)
    payload = nwebp.encode_webp_native(img)
    assert detect_format(payload) == "webp"
    assert webp_dims(payload) == (47, 31)
    assert np.array_equal(nwebp.decode_webp_native(payload), img)


@needs_native
def test_native_lossy_vp8_dims_and_fidelity():
    """Lossy VP8 covers the 'VP8 ' branch of the dims parser; on a
    smooth gradient q95 must stay visually faithful (and the channel
    correlation pins RGB order through the ctypes boundary)."""
    y, x = np.mgrid[0:32, 0:48]
    img = np.stack(
        [(x * 5).astype(np.uint8), (y * 7).astype(np.uint8),
         np.full_like(x, 128, dtype=np.uint8)],
        axis=2,
    )
    payload = nwebp.encode_webp_native(img, quality=95.0)
    assert webp_dims(payload) == (48, 32)
    out = nwebp.decode_webp_native(payload)
    diff = np.abs(out.astype(int) - img.astype(int))
    assert diff.mean() < 3 and diff.max() <= 16, (diff.mean(), diff.max())
    assert np.corrcoef(out[:, :, 0].ravel(), img[:, :, 0].ravel())[0, 1] > 0.99
    assert np.corrcoef(out[:, :, 1].ravel(), img[:, :, 1].ravel())[0, 1] > 0.99


@needs_native
def test_native_corrupt_payload_raises():
    payload = bytearray(nwebp.encode_webp_native(_noise(30, 20, 3)))
    with pytest.raises((EOFError, ValueError)):
        nwebp.decode_webp_native(bytes(payload[:24]))


@needs_native
def test_native_batch_decoder_covers_webp():
    """native.native_decode_batch routes webp payloads through libwebp
    and returns the same metadata columns the pure path does."""
    import pandas as pd

    from dd_ops_ocr_spark import native
    from dd_ops_ocr_spark.operators.multimodal import real_decode_batch

    payloads = pd.Series([synth_webp_payload(f"m-{i:06d}") for i in range(5)])
    nat = native.native_decode_batch(payloads)
    pure = real_decode_batch(payloads)
    pd.testing.assert_frame_equal(nat, pure)
    assert set(nat["format"]) == {"webp"}
