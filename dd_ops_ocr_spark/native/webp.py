"""Native libwebp binding for the multimodal injection seam.

Unlike the jpeg shim (jpegshim.c, which needs a one-time gcc compile),
libwebp's public C API is directly ctypes-callable — ``WebPGetInfo`` /
``WebPDecodeRGB`` / ``WebPEncodeLosslessRGB`` take flat buffers and
ints — so this binding loads the stock shared library with no
toolchain at all. It closes the pure decoder's documented seams
(operators/webp.py raises NotImplementedError on VP8 lossy, VP8L
transforms / color cache / backward references; libwebp decodes all of
them) exactly as libjpeg closes the progressive-JPEG seam.

Cross-validation contract (tests/test_webp.py): the pure encoder's
literal-only VP8L streams decode bit-exactly through libwebp, and
libwebp's own lossless output round-trips bit-exactly back through
``decode_webp_native`` — lossless means the two codecs must agree on
every byte, with no IDCT-rounding tolerance like the JPEG pair needs.
"""

from __future__ import annotations

import ctypes
import ctypes.util

import numpy as np

_SONAMES = ("libwebp.so.7", "libwebp.so", "libwebp.7.dylib", "libwebp.dylib")

_lib = None
_load_error: str | None = None

MAX_DIM = 32768  # defense against forged headers claiming huge frames


def _bind(lib: ctypes.CDLL) -> ctypes.CDLL:
    lib.WebPGetInfo.restype = ctypes.c_int
    lib.WebPGetInfo.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.WebPDecodeRGB.restype = ctypes.c_void_p  # malloc'd buffer
    lib.WebPDecodeRGB.argtypes = [
        ctypes.c_char_p, ctypes.c_size_t,
        ctypes.POINTER(ctypes.c_int), ctypes.POINTER(ctypes.c_int),
    ]
    lib.WebPEncodeLosslessRGB.restype = ctypes.c_size_t
    lib.WebPEncodeLosslessRGB.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_void_p),
    ]
    lib.WebPEncodeRGB.restype = ctypes.c_size_t
    lib.WebPEncodeRGB.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_float, ctypes.POINTER(ctypes.c_void_p),
    ]
    # WebPFree exists since libwebp 0.5; buffers are plain malloc/free,
    # so fall back to libc free on ancient libs rather than leaking.
    if not hasattr(lib, "WebPFree"):
        libc = ctypes.CDLL(None)
        lib.WebPFree = libc.free
    lib.WebPFree.restype = None
    lib.WebPFree.argtypes = [ctypes.c_void_p]
    return lib


def _load() -> ctypes.CDLL | None:
    global _lib, _load_error
    if _lib is not None:
        return _lib
    if _load_error is not None:
        return None
    names = list(_SONAMES)
    found = ctypes.util.find_library("webp")
    if found:
        names.insert(0, found)
    last: Exception | None = None
    for name in names:
        try:
            _lib = _bind(ctypes.CDLL(name))
            return _lib
        except (OSError, AttributeError) as e:
            last = e
    _load_error = f"{type(last).__name__}: {last}" if last else "not found"
    return None


def available() -> bool:
    return _load() is not None


def load_error() -> str | None:
    _load()
    return _load_error


def decode_webp_native(payload: bytes) -> np.ndarray:
    """WebP bytes -> (h, w, 3) uint8 RGB via libwebp. Same contract as
    operators.webp.decode_webp, covering every WebP layout (lossy VP8,
    transform/cache/LZ77 VP8L) the pure subset decoder declines."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native webp binding unavailable: {_load_error}")
    w = ctypes.c_int()
    h = ctypes.c_int()
    if not lib.WebPGetInfo(payload, len(payload),
                           ctypes.byref(w), ctypes.byref(h)):
        raise ValueError("not a decodable WebP payload")
    if not (0 < w.value <= MAX_DIM and 0 < h.value <= MAX_DIM):
        raise ValueError(f"implausible WebP dimensions {w.value}x{h.value}")
    buf = lib.WebPDecodeRGB(payload, len(payload),
                            ctypes.byref(w), ctypes.byref(h))
    if not buf:
        raise EOFError("truncated or corrupt WebP stream")
    try:
        raw = ctypes.string_at(buf, w.value * h.value * 3)
    finally:
        lib.WebPFree(buf)
    return np.frombuffer(raw, dtype=np.uint8).reshape(h.value, w.value, 3)


def encode_webp_native(img: np.ndarray, quality: float | None = None) -> bytes:
    """(h, w, 3) uint8 RGB -> WebP bytes via libwebp: lossless VP8L when
    ``quality`` is None (the default — matches the pure encoder's
    contract so round-trips are bit-exact), else lossy VP8 at that
    quality."""
    lib = _load()
    if lib is None:
        raise RuntimeError(f"native webp binding unavailable: {_load_error}")
    img = np.ascontiguousarray(img, dtype=np.uint8)
    h, w, c = img.shape
    if c != 3:
        raise ValueError("expected (h, w, 3) RGB")
    out = ctypes.c_void_p()
    data = img.ctypes.data_as(ctypes.c_void_p)
    if quality is None:
        size = lib.WebPEncodeLosslessRGB(data, w, h, w * 3, ctypes.byref(out))
    else:
        size = lib.WebPEncodeRGB(data, w, h, w * 3, float(quality),
                                 ctypes.byref(out))
    if not size or not out:
        raise ValueError("WebP encode failed")
    try:
        return ctypes.string_at(out, size)
    finally:
        lib.WebPFree(out)
