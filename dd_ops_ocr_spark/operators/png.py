"""Pure-numpy+stdlib PNG codec (no external image libraries).

PNG's compression is zlib — in the Python standard library — so unlike
JPEG nothing exotic is needed: chunk parsing, inflate, and scanline
unfiltering (the five filters of the PNG spec, RFC 2083). Completes the
native-codec set of the multimodal path (BMP + baseline JPEG in
operators/jpeg.py + PNG here); video remains the documented injection
seam.

Supported on decode: 8-bit gray (0), RGB (2), palette (3), gray+alpha
(4), RGBA (6); both non-interlaced and Adam7-interlaced streams (each
of the seven passes is an independently filtered sub-image scattered
back on the pass grid). 16-bit depth raises NotImplementedError.
Encode emits 8-bit RGB, filter 0, optionally Adam7-interlaced.
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


# Adam7 pass grid: (x_start, y_start, x_step, y_step) per PNG spec §8.2
# (starting_col/row = [0,4,0,2,0,1,0] / [0,0,4,0,2,0,1])
_ADAM7 = [
    (0, 0, 8, 8),
    (4, 0, 8, 8),
    (0, 4, 4, 8),
    (2, 0, 4, 4),
    (0, 2, 2, 4),
    (1, 0, 2, 2),
    (0, 1, 1, 2),
]


def encode_png(pixels: np.ndarray, interlace: bool = False) -> bytes:
    """(h, w, 3) uint8 RGB -> PNG bytes (8-bit truecolor, filter 0;
    ``interlace`` emits the seven Adam7 sub-images in pass order)."""
    h, w, _ = pixels.shape
    # IHDR field order: depth, color type, compression, filter, interlace
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 1 if interlace else 0)
    if interlace:
        parts = []
        for x0, y0, dx, dy in _ADAM7:
            sub = pixels[y0::dy, x0::dx]
            ph, pw, _ = sub.shape
            if ph == 0 or pw == 0:
                continue
            raw = np.zeros((ph, 1 + pw * 3), dtype=np.uint8)
            raw[:, 1:] = sub.reshape(ph, pw * 3)
            parts.append(raw.tobytes())
        body = b"".join(parts)
    else:
        raw = np.zeros((h, 1 + w * 3), dtype=np.uint8)
        raw[:, 1:] = pixels.reshape(h, w * 3)  # filter byte 0 per scanline
        body = raw.tobytes()
    return (
        _SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(body, 6))
        + _chunk(b"IEND", b"")
    )


def png_dimensions(payload: bytes) -> tuple[int, int]:
    """(width, height) from IHDR — no inflate."""
    if payload[:8] != _SIG:
        raise ValueError("not a PNG payload")
    w, h = struct.unpack_from(">II", payload, 16)
    return w, h


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
            # plain int arithmetic: the numpy-scalar _paeth form built
            # three arrays + two np.where per BYTE, and filter 4 is the
            # commonest filter real encoders emit — this loop is the
            # foreign-PNG decode hot spot
            for i in range(stride):
                a = int(out[y, i - bpp]) if i >= bpp else 0
                b = int(prev[i])
                c = int(prev[i - bpp]) if i >= bpp else 0
                p = a + b - c
                pa = p - a if p >= a else a - p
                pb = p - b if p >= b else b - p
                pc = p - c if p >= c else c - p
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                out[y, i] = (int(line[i]) + pr) & 0xFF
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
    channels = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}.get(ctype)
    if channels is None:
        raise ValueError(f"invalid PNG color type {ctype}")
    bpp = channels
    data = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if interlace:
        # Adam7: seven independently filtered sub-images in pass order,
        # each scattered back onto its (x0::dx, y0::dy) grid
        px = np.zeros((h, w, channels), dtype=np.uint8)
        pos2 = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw == 0 or ph == 0:
                continue
            pstride = pw * channels
            need = ph * (1 + pstride)
            if pos2 + need > len(data):
                raise ValueError("PNG interlaced scanline data truncated")
            raw = data[pos2: pos2 + need].reshape(ph, 1 + pstride)
            pos2 += need
            px[y0::dy, x0::dx] = _unfilter(raw, ph, pstride, bpp).reshape(
                ph, pw, channels
            )
        if pos2 != len(data):
            raise ValueError("PNG scanline data size mismatch")
    else:
        stride = w * channels
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
