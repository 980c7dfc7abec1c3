"""Pure-Python WebP codec: VP8L lossless encode/decode + container
dims parsing.

WebP is the reference pipeline's "other" web image format (the media
spans a 100 TB interleaved corpus carries alongside the JPEG page
renders of src/modules/step1/03_image_converter.py). Like the JPEG/PNG
codecs (operators/jpeg.py, operators/png.py) this implements the PUBLIC
spec — RFC 9649 (WebP container + VP8L lossless bitstream) — in the
repo's integer-numpy idiom, and exists so real pixels flow through the
multimodal plumbing with zero native dependencies:

* ``encode_webp_lossless``: a spec-complete VP8L writer restricted to
  the always-valid simple shape — no transforms, no color cache, no
  meta-prefix groups, literal-only coding with fixed canonical 8-bit
  codes per channel (alpha collapses to a 0-bit single-symbol code).
  libwebp decodes these streams bit-exactly (tests/test_webp.py
  cross-checks when the native lib is present).
* ``decode_webp``: a VP8L reader covering the full prefix-code grammar
  (simple codes, code-length-coded codes incl. 16/17/18 repeats and
  the max-symbol shortcut) over literal-only streams. Transforms,
  color cache, meta-prefix and LZ77 backward references — what a
  size-optimizing encoder like libwebp emits — raise
  NotImplementedError: that is the documented seam the native libwebp
  binding (native/webp.py) closes, exactly like libjpeg closes the
  progressive-JPEG seam.
* ``webp_dims``: container-level geometry for ALL three layouts (VP8X
  extended canvas, VP8L lossless, VP8 lossy) — metadata extraction
  never needs pixel work, mirroring the AVI container walk
  (operators/video.py).

The container is RIFF, so the chunk grammar is shared with AVI/WAV via
operators/riff.py.
"""

from __future__ import annotations

import struct

import numpy as np

from dd_ops_ocr_spark.operators.riff import chunk, container_end, iter_chunks

MAX_VP8L_DIM = 1 << 14  # 14-bit width/height fields

# DEFLATE-style code-length-code transmission order (RFC 9649 §6.2.2).
_CL_ORDER = (17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15)
_GREEN_ALPHABET = 256 + 24  # literals + LZ77 length codes (no color cache)
_DIST_ALPHABET = 40


# ----------------------------------------------------------------- bit IO
# VP8L packs bits LSB-first within bytes; prefix-code bits are the one
# exception — they enter the stream MSB-of-code-first (the zlib/DEFLATE
# convention libwebp's table decoder inherits).

class _BitWriter:
    def __init__(self) -> None:
        self._chunks: list[np.ndarray] = []

    def write_bits(self, value: int, n: int) -> None:
        """n bits of value, LSB first (plain VP8L values)."""
        bits = (value >> np.arange(n, dtype=np.uint32)) & 1
        self._chunks.append(bits.astype(np.uint8))

    def write_code(self, code: int, length: int) -> None:
        """A canonical prefix code, MSB first."""
        bits = (code >> np.arange(length - 1, -1, -1, dtype=np.uint32)) & 1
        self._chunks.append(bits.astype(np.uint8))

    def write_bit_array(self, bits: np.ndarray) -> None:
        """Bulk append of pre-computed bits in stream order."""
        self._chunks.append(bits.astype(np.uint8, copy=False))

    def tobytes(self) -> bytes:
        bits = np.concatenate(self._chunks) if self._chunks else np.empty(
            0, np.uint8
        )
        return np.packbits(bits, bitorder="little").tobytes()


class _BitReader:
    def __init__(self, data: bytes) -> None:
        self._bits = np.unpackbits(
            np.frombuffer(data, dtype=np.uint8), bitorder="little"
        )
        self.pos = 0

    def read_bits(self, n: int) -> int:
        """n bits, LSB first."""
        if self.pos + n > len(self._bits):
            raise EOFError("truncated VP8L stream")
        w = self._bits[self.pos: self.pos + n]
        self.pos += n
        return int(w @ (1 << np.arange(n, dtype=np.uint32)))

    def read_bit(self) -> int:
        if self.pos >= len(self._bits):
            raise EOFError("truncated VP8L stream")
        b = int(self._bits[self.pos])
        self.pos += 1
        return b


# ------------------------------------------------------- canonical codes

def _canonical_codes(lengths: dict[int, int]) -> dict[int, tuple[int, int]]:
    """RFC 1951 §3.2.2 canonical code assignment: symbol -> (code, len).
    ``lengths`` maps symbol -> nonzero code length."""
    max_len = max(lengths.values())
    bl_count = [0] * (max_len + 1)
    for ln in lengths.values():
        bl_count[ln] += 1
    next_code = [0] * (max_len + 2)
    code = 0
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out: dict[int, tuple[int, int]] = {}
    for sym in sorted(lengths):
        ln = lengths[sym]
        out[sym] = (next_code[ln], ln)
        next_code[ln] += 1
    return out


class _PrefixCode:
    """Decoder-side prefix code: bit-at-a-time walk keyed by the
    accumulated MSB-first code (matches the canonical assignment)."""

    def __init__(self, lengths: dict[int, int]) -> None:
        if not lengths:
            raise ValueError("empty prefix code")
        if len(lengths) == 1:
            self.single: int | None = next(iter(lengths))
            self.by_code: dict[tuple[int, int], int] = {}
            self.max_len = 0
            return
        kraft = sum(2 ** -ln for ln in lengths.values())
        if abs(kraft - 1.0) > 1e-12:
            raise ValueError(f"incomplete/oversubscribed prefix code ({kraft})")
        self.single = None
        codes = _canonical_codes(lengths)
        self.by_code = {(ln, code): sym for sym, (code, ln) in codes.items()}
        self.max_len = max(lengths.values())

    def read(self, br: _BitReader) -> int:
        if self.single is not None:
            return self.single
        code = 0
        for ln in range(1, self.max_len + 1):
            code = (code << 1) | br.read_bit()
            sym = self.by_code.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid prefix code in VP8L stream")


# ------------------------------------------------------------- encoding

def _write_fixed8_code(bw: _BitWriter, alphabet_size: int) -> None:
    """Transmit the fixed canonical code 'symbols 0..255 all length 8'
    (complete: 256 * 2^-8 == 1; symbols >= 256 get length 0) via the
    normal code-length path. Code-length code: symbols {0, 8} at one
    bit each — '8' emits bit 1, '0' emits bit 0."""
    bw.write_bits(0, 1)  # not a simple code
    # cover order positions up to symbol 8 (position 11) -> 12 entries
    bw.write_bits(12 - 4, 4)
    for sym in _CL_ORDER[:12]:
        bw.write_bits(1 if sym in (0, 8) else 0, 3)
    bw.write_bits(0, 1)  # no max-symbol shortcut: emit all lengths
    ones = np.ones(256, dtype=np.uint8)  # 256 x '8' (code 1)
    bw.write_bit_array(ones)
    if alphabet_size > 256:  # green tail: explicit zero lengths (code 0)
        bw.write_bit_array(np.zeros(alphabet_size - 256, dtype=np.uint8))


def _write_single_symbol_code(bw: _BitWriter, symbol: int) -> None:
    """Simple prefix code with one symbol: decodes with zero bits per
    read (used for the constant-alpha and never-read distance codes)."""
    bw.write_bits(1, 1)  # simple
    bw.write_bits(0, 1)  # num_symbols - 1 = 0
    if symbol in (0, 1):
        bw.write_bits(0, 1)  # 1-bit first symbol
        bw.write_bits(symbol, 1)
    else:
        bw.write_bits(1, 1)  # 8-bit first symbol
        bw.write_bits(symbol, 8)


def encode_webp_lossless(pixels: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> lossless WebP (VP8L) bytes.

    Literal-only coding with fixed 8-bit codes: each pixel costs exactly
    24 bits (G, R, B — MSB first per DEFLATE convention; the constant
    opaque alpha is a 0-bit single-symbol code), so the bulk bitstream
    is a pure byte-reorder computed with one vectorized
    ``np.unpackbits``/``packbits`` pair — no per-pixel Python."""
    pixels = np.ascontiguousarray(pixels, dtype=np.uint8)
    h, w, c = pixels.shape
    if c != 3:
        raise ValueError("expected (h, w, 3) RGB")
    if not (0 < w <= MAX_VP8L_DIM and 0 < h <= MAX_VP8L_DIM):
        raise ValueError(f"VP8L dimensions out of range: {w}x{h}")
    bw = _BitWriter()
    bw.write_bits(w - 1, 14)
    bw.write_bits(h - 1, 14)
    bw.write_bits(0, 1)  # alpha hint: unused
    bw.write_bits(0, 3)  # version 0
    bw.write_bits(0, 1)  # no transforms
    bw.write_bits(0, 1)  # no color cache
    bw.write_bits(0, 1)  # no meta-prefix groups
    _write_fixed8_code(bw, _GREEN_ALPHABET)  # green + length codes
    _write_fixed8_code(bw, 256)  # red
    _write_fixed8_code(bw, 256)  # blue
    _write_single_symbol_code(bw, 255)  # alpha: constant opaque
    _write_single_symbol_code(bw, 0)  # distance: present but never read
    # Pixel section: per pixel the stream is exactly the MSB-first bits
    # of G, R, B — i.e. unpackbits(big-endian) over the GRB byte order.
    grb = pixels.reshape(-1, 3)[:, (1, 0, 2)]
    bw.write_bit_array(np.unpackbits(grb, axis=None))
    body = b"\x2f" + bw.tobytes()
    vp8l = chunk(b"VP8L", body)
    return b"RIFF" + struct.pack("<I", 4 + len(vp8l)) + b"WEBP" + vp8l


# ------------------------------------------------------------- decoding

def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    """Full RFC 9649 §6.2 prefix-code grammar: simple (1-2 symbols) or
    code-length-coded with 16/17/18 repeats and the max-symbol field."""
    if br.read_bit():  # simple
        num_symbols = br.read_bit() + 1
        first_8bits = br.read_bit()
        sym0 = br.read_bits(8 if first_8bits else 1)
        lengths = {sym0: 1}
        if num_symbols == 2:
            sym1 = br.read_bits(8)
            if sym1 == sym0:
                # a duplicate would collapse the dict to ONE symbol and
                # _PrefixCode's single-symbol path then consumes 0 bits
                # per read — the decoder desynchronizes and emits a
                # full-size garbage image instead of failing loudly
                raise ValueError(
                    "VP8L simple prefix code repeats its symbol"
                )
            lengths[sym1] = 1
        return _PrefixCode(lengths)
    num_cl = 4 + br.read_bits(4)
    cl_lengths: dict[int, int] = {}
    for sym in _CL_ORDER[:num_cl]:
        ln = br.read_bits(3)
        if ln:
            cl_lengths[sym] = ln
    cl_code = _PrefixCode(cl_lengths)
    if br.read_bit():  # max-symbol shortcut
        length_nbits = 2 + 2 * br.read_bits(3)
        max_symbol = 2 + br.read_bits(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = {}
    symbol = 0
    prev_len = 8  # spec default
    while symbol < alphabet_size:
        if max_symbol == 0:
            break
        max_symbol -= 1
        code_len = cl_code.read(br)
        if code_len < 16:
            if code_len:
                lengths[symbol] = code_len
                prev_len = code_len
            symbol += 1
        else:
            slot = code_len - 16
            repeat = br.read_bits((2, 3, 7)[slot]) + (3, 3, 11)[slot]
            fill = prev_len if code_len == 16 else 0
            for _ in range(repeat):
                if symbol >= alphabet_size:
                    raise ValueError("VP8L code-length repeat overruns")
                if fill:
                    lengths[symbol] = fill
                symbol += 1
    return _PrefixCode(lengths)


_PREFIX_CACHE: dict[tuple[int, int], list[tuple[np.ndarray, _PrefixCode]]] = {}


def _read_prefix_code_cached(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    """Memoized ``_read_prefix_code``: a corpus re-uses a handful of
    encoder table sections (and the stream's code section starts at a
    deterministic bit offset), so after the first payload the per-stream
    table parse collapses to one bit-window compare. Keyed by
    (alphabet_size, start bit); each candidate stores the EXACT bit span
    it was parsed from, so a stream with different tables can never
    alias — it misses, parses fresh, and becomes its own candidate.
    Parse failures propagate unchanged and are never cached."""
    key = (alphabet_size, br.pos)
    cands = _PREFIX_CACHE.get(key)
    if cands:
        seg = br._bits
        p = br.pos
        for bits, code in cands:
            n = bits.size
            if p + n <= seg.size and np.array_equal(seg[p: p + n], bits):
                br.pos = p + n
                return code
    start = br.pos
    code = _read_prefix_code(br, alphabet_size)
    if len(_PREFIX_CACHE) > 256:  # bound worker-lifetime memory
        _PREFIX_CACHE.clear()
        cands = None
    if cands is None:
        cands = _PREFIX_CACHE.setdefault(key, [])
    if len(cands) < 8:  # degenerate table diversity just re-parses
        cands.append((br._bits[start: br.pos].copy(), code))
    return code


def _is_fixed8(code: _PrefixCode) -> bool:
    """True when the code is exactly the encoder's fixed canonical
    8-bit code (code(s) == s for 0..255) — the vectorized decode path."""
    return (
        code.single is None
        and code.max_len == 8
        and len(code.by_code) == 256
        and all(code.by_code.get((8, s)) == s for s in (0, 1, 254, 255))
    )


def decode_webp(payload: bytes) -> np.ndarray:
    """WebP bytes -> (h, w, 3) uint8 RGB.

    Covers VP8L literal-only streams (any prefix-code shape). Transforms,
    color cache, meta-prefix groups, LZ77 backward references and lossy
    VP8 raise NotImplementedError — decode those through the native
    libwebp binding (native/webp.py), the same injection seam every
    media operator exposes."""
    kind, body = _image_chunk(payload)
    if kind != b"VP8L":
        raise NotImplementedError(
            "lossy VP8 decode needs the native libwebp seam (native/webp.py)"
        )
    if body[:1] != b"\x2f":
        raise ValueError("bad VP8L signature")
    br = _BitReader(body[1:])
    w = br.read_bits(14) + 1
    h = br.read_bits(14) + 1
    br.read_bits(1)  # alpha hint
    if br.read_bits(3) != 0:
        raise ValueError("unknown VP8L version")
    if br.read_bit():
        raise NotImplementedError(
            "VP8L transforms: use the native libwebp seam (native/webp.py)"
        )
    if br.read_bit():
        raise NotImplementedError(
            "VP8L color cache: use the native libwebp seam (native/webp.py)"
        )
    if br.read_bit():
        raise NotImplementedError(
            "VP8L meta-prefix groups: use the native libwebp seam"
        )
    green = _read_prefix_code_cached(br, _GREEN_ALPHABET)
    red = _read_prefix_code_cached(br, 256)
    blue = _read_prefix_code_cached(br, 256)
    alpha = _read_prefix_code_cached(br, 256)
    _read_prefix_code_cached(br, _DIST_ALPHABET)  # distance (never read)
    n = w * h
    if (
        _is_fixed8(green) and _is_fixed8(red) and _is_fixed8(blue)
        and alpha.single is not None
    ):
        # Encoder-shaped stream: 24 bits/pixel, vectorized inverse of
        # encode_webp_lossless's bulk pack.
        need = n * 24
        bits = br._bits[br.pos: br.pos + need]
        if len(bits) < need:
            raise EOFError("truncated VP8L pixel stream")
        grb = np.packbits(bits.reshape(n, 3, 8), axis=-1, bitorder="big")
        return np.ascontiguousarray(grb.reshape(n, 3)[:, (1, 0, 2)]
                                    .reshape(h, w, 3))
    out = np.empty((n, 3), dtype=np.uint8)
    for i in range(n):
        g = green.read(br)
        if g >= 256:
            raise NotImplementedError(
                "VP8L backward references: use the native libwebp seam"
            )
        out[i, 1] = g
        out[i, 0] = red.read(br)
        out[i, 2] = blue.read(br)
        alpha.read(br)
    return out.reshape(h, w, 3)


# ------------------------------------------------------------- geometry

def _image_chunk(payload: bytes) -> tuple[bytes, bytes]:
    """First image-bearing chunk (VP8L / 'VP8 ') in the container."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    for tag, s, e in iter_chunks(payload, 12, container_end(payload)):
        if tag in (b"VP8L", b"VP8 "):
            return tag, payload[s:e]
    raise ValueError("WebP container has no image chunk")


def webp_dims(payload: bytes) -> tuple[int, int]:
    """(width, height) from the container headers alone — no pixel work.
    VP8X extended canvas takes precedence; else VP8L's 14-bit fields or
    the VP8 lossy frame header (RFC 9649 §4 / VP8 RFC 6386 §9.1)."""
    if payload[:4] != b"RIFF" or payload[8:12] != b"WEBP":
        raise ValueError("not a WebP payload")
    for tag, s, e in iter_chunks(payload, 12, container_end(payload)):
        body = payload[s:e]
        if tag == b"VP8X":
            if len(body) < 10:
                raise ValueError("truncated VP8X header")
            w = int.from_bytes(body[4:7], "little") + 1
            h = int.from_bytes(body[7:10], "little") + 1
            return w, h
        if tag == b"VP8L":
            if len(body) < 5 or body[:1] != b"\x2f":
                raise ValueError("bad VP8L header")
            v = int.from_bytes(body[1:5], "little")
            return (v & 0x3FFF) + 1, ((v >> 14) & 0x3FFF) + 1
        if tag == b"VP8 ":
            if len(body) < 10 or body[3:6] != b"\x9d\x01\x2a":
                raise ValueError("bad VP8 frame header")
            (w,) = struct.unpack_from("<H", body, 6)
            (h,) = struct.unpack_from("<H", body, 8)
            return w & 0x3FFF, h & 0x3FFF
    raise ValueError("WebP container has no image chunk")
