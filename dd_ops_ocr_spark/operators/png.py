"""Pure-numpy+stdlib PNG codec (no external image libraries).

PNG's compression is zlib — in the Python standard library — so unlike
JPEG nothing exotic is needed: chunk parsing, inflate, and scanline
unfiltering (the five filters of the PNG spec, RFC 2083). Completes the
native-codec set of the multimodal path (BMP + baseline JPEG in
operators/jpeg.py + PNG here); video remains the documented injection
seam.

Supported on decode: 8-bit gray (0), RGB (2), palette (3), gray+alpha
(4), RGBA (6), non-interlaced. 16-bit and Adam7 interlace raise
NotImplementedError. Encode emits 8-bit RGB, filter 0.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body)) + tag + body
        + struct.pack(">I", zlib.crc32(tag + body) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> PNG bytes (8-bit truecolor, filter 0)."""
    h, w, _ = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
    raw[:, 1:] = pixels.reshape(h, w * 3)  # filter byte 0 per scanline
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _chunk(b"IEND", b"")
    )


def png_dimensions(payload: bytes) -> tuple[int, int]:
    """(width, height) from IHDR — no inflate."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG payload")
    w, h = struct.unpack_from(">II", payload, 16)
    return w, h


def _paeth(a: np.ndarray, b: np.ndarray, c: np.ndarray) -> np.ndarray:
    p = a.astype(np.int32) + b.astype(np.int32) - c.astype(np.int32)
    pa = np.abs(p - a)
    pb = np.abs(p - b)
    pc = np.abs(p - c)
    return np.where((pa <= pb) & (pa <= pc), a, np.where(pb <= pc, b, c)).astype(
        np.uint8
    )


def _unfilter(raw: np.ndarray, h: int, stride: int, bpp: int) -> np.ndarray:
    """Undo per-scanline filtering: raw is (h, 1+stride) filter-prefixed
    rows; returns (h, stride) reconstructed bytes."""
    out = np.zeros((h, stride), dtype=np.uint8)
    for y in range(h):
        ft = int(raw[y, 0])
        line = raw[y, 1:].copy()
        prev = out[y - 1] if y > 0 else np.zeros(stride, dtype=np.uint8)
        if ft == 0:  # None
            out[y] = line
        elif ft == 1:  # Sub — per-channel prefix sum mod 256
            cols = line.reshape(-1, bpp) if stride % bpp == 0 else None
            if cols is not None:
                out[y] = (
                    np.cumsum(cols.astype(np.uint64), axis=0) % 256
                ).astype(np.uint8).reshape(-1)
            else:  # fallback (never for the supported layouts)
                acc = np.zeros(bpp, dtype=np.uint8)
                for i in range(stride):
                    acc[i % bpp] = (int(line[i]) + int(acc[i % bpp])) & 0xFF
                    out[y, i] = acc[i % bpp]
        elif ft == 2:  # Up
            out[y] = line + prev  # uint8 wraps mod 256
        elif ft == 3:  # Average — sequential along the row
            for i in range(stride):
                a = out[y, i - bpp] if i >= bpp else 0
                out[y, i] = (int(line[i]) + ((int(a) + int(prev[i])) >> 1)) & 0xFF
        elif ft == 4:  # Paeth — sequential along the row
            for i in range(stride):
                a = out[y, i - bpp] if i >= bpp else np.uint8(0)
                c = prev[i - bpp] if i >= bpp else np.uint8(0)
                pr = _paeth(
                    np.asarray(a, dtype=np.uint8),
                    np.asarray(prev[i], dtype=np.uint8),
                    np.asarray(c, dtype=np.uint8),
                )
                out[y, i] = (int(line[i]) + int(pr)) & 0xFF
        else:
            raise ValueError(f"invalid PNG filter type {ft}")
    return out


def decode_png(payload: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3) uint8 RGB (alpha dropped, palette resolved,
    gray replicated)."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG payload")
    pos = 8
    idat = bytearray()
    plte: np.ndarray | None = None
    w = h = depth = ctype = interlace = None
    while pos + 8 <= len(payload):
        (ln,) = struct.unpack_from(">I", payload, pos)
        tag = payload[pos + 4: pos + 8]
        body = payload[pos + 8: pos + 8 + ln]
        pos += 12 + ln
        if tag == b"IHDR":
            w, h, depth, ctype, _comp, _filt, interlace = struct.unpack(
                ">IIBBBBB", body
            )
        elif tag == b"PLTE":
            plte = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif tag == b"IDAT":
            idat += body
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("no IHDR chunk")
    if depth != 8:
        raise NotImplementedError(f"PNG bit depth {depth} (only 8)")
    if interlace:
        raise NotImplementedError("Adam7 interlaced PNG")
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"invalid PNG color type {ctype}")
    bpp = channels
    stride = w * channels
    data = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if len(data) != h * (1 + stride):
        raise ValueError("PNG scanline data size mismatch")
    px = _unfilter(data.reshape(h, 1 + stride), h, stride, bpp).reshape(
        h, w, channels
    )
    if ctype == 2:
        return np.ascontiguousarray(px)
    if ctype == 6:
        return np.ascontiguousarray(px[:, :, :3])
    if ctype == 0:
        return np.repeat(px, 3, axis=2)
    if ctype == 4:
        return np.repeat(px[:, :, :1], 3, axis=2)
    # palette
    if plte is None:
        raise ValueError("palette PNG without PLTE chunk")
    return plte[px[:, :, 0]]
