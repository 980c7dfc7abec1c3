"""The multi-lane batch JPEG decoder must be pixel-exact AND
exception-class-exact against the serial decoder it accelerates (r6
optimization: decode_jpeg_batch keeps one lane of state per payload and
decodes one Huffman symbol per active lane per numpy step; anything the
fast path does not model falls back to decode_jpeg, which stays the
authority on both pixels and errors)."""

import numpy as np

from dd_ops_ocr_spark.operators import jpeg as J
from dd_ops_ocr_spark.operators.multimodal import (
    decode_images_batch,
    synth_jpeg_payload,
)


def _mixed_payloads():
    rng = np.random.default_rng(20260821)
    out = []
    for t in range(80):
        h = int(rng.integers(1, 70))
        w = int(rng.integers(1, 70))
        q = int(rng.choice([10, 50, 75, 95, 100]))
        sub = str(rng.choice(["4:4:4", "4:2:0"]))
        if t % 3 == 0:
            px = rng.integers(0, 256, (h, w, 3), dtype=np.uint8)
        elif t % 3 == 1:
            px = np.full((h, w, 3), int(rng.integers(0, 256)), np.uint8)
        else:
            px = (
                np.add.outer(np.arange(h), np.arange(w))[:, :, None]
                * np.array([3, 5, 7]) % 256
            ).astype(np.uint8)
        out.append(J.encode_jpeg(px, quality=q, subsampling=sub))
    return out


def test_batch_decode_pixel_exact():
    payloads = _mixed_payloads() + [
        synth_jpeg_payload(f"media_{i:06d}.bin") for i in range(40)
    ]
    serial = [J.decode_jpeg(p) for p in payloads]
    batch = J.decode_jpeg_batch(payloads)
    assert len(batch) == len(serial)
    for s, b in zip(serial, batch):
        assert isinstance(b, np.ndarray)
        assert np.array_equal(s, b)


def test_batch_decode_exception_class_parity():
    good = _mixed_payloads()[0]
    corrupt = bytearray(good)
    corrupt[len(good) // 2] ^= 0xFF
    malformed = [
        good[: len(good) // 2],      # truncated mid-scan
        good[:30],                   # truncated header
        b"\xff\xd8\xff\xd9",         # no SOS
        b"notajpeg",
        bytes(corrupt),              # bit-flipped entropy data
    ]
    for m in malformed:
        try:
            J.decode_jpeg(m)
            expect = None
        except Exception as exc:
            expect = type(exc)
        got = J.decode_jpeg_batch([m, good])
        if expect is None:
            assert isinstance(got[0], np.ndarray)
        else:
            assert isinstance(got[0], expect), (expect, got[0])
        # a bad lane never poisons its neighbors
        assert isinstance(got[1], np.ndarray)
        assert np.array_equal(got[1], J.decode_jpeg(good))


def test_batch_decode_progressive_falls_back():
    rng = np.random.default_rng(5)
    px = rng.integers(0, 256, (17, 23, 3), dtype=np.uint8)
    prog = J.encode_jpeg_progressive(px, quality=95, subsampling="4:2:0")
    assert J._parse_baseline_for_batch(prog) is None  # SOF2 -> serial
    got = J.decode_jpeg_batch([prog])
    assert isinstance(got[0], np.ndarray)
    assert np.array_equal(got[0], J.decode_jpeg(prog))


def test_decode_images_batch_raises_first_in_order():
    good = synth_jpeg_payload("media_000001.bin")
    bad = good[: len(good) // 2]
    try:
        decode_images_batch([good, bad, b"nope"])
        raise AssertionError("expected EOFError")
    except EOFError:
        pass  # the FIRST failing payload's class, not the later one
