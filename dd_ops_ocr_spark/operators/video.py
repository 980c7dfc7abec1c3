"""MJPEG-in-AVI video container codec (pure stdlib struct parsing).

Closes the multimodal path's "video" seam with a REAL container format:
AVI is RIFF chunks (Microsoft AVI spec / OpenDML), and an MJPEG stream's
frame chunks are plain baseline JPEGs — so the existing JPEG codecs
(pure-numpy operators/jpeg.py, native libjpeg shim) decode the frames
with no new pixel code. Container-level work is exactly what a 100 TB
video corpus needs first: enumerate frames, sample k of them evenly,
decode only the sampled ones.

The reference pipeline is image-only (its media are page renders,
src/modules/step1/03_image_converter.py); this extends the multimodal
column surface the way SURVEY §6 prescribes for training-data pipelines
(frame-sample as a first-class one-to-many operator). Codecs beyond
MJPEG (H.264 etc.) remain the documented injection seam — those are
entropy-coded inter-frame formats, not something a from-scratch numpy
codec should pretend to cover.

Writer emits: RIFF(AVI ) / LIST hdrl [avih, LIST strl [strh vids MJPG,
strf BITMAPINFOHEADER]] / LIST movi [00dc JPEG ...] / idx1. Reader
walks the chunk tree tolerantly: it needs only the RIFF signature and
the movi LIST, accepts 00db (uncompressed-named) chunks and rec LISTs,
and ignores everything else — real-world AVIs vary.
"""

from __future__ import annotations

import struct

from dd_ops_ocr_spark.operators.riff import chunk as _chunk
from dd_ops_ocr_spark.operators.riff import container_end, iter_chunks

_AVIF_HASINDEX = 0x00000010


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """JPEG frame payloads -> MJPEG AVI bytes (one 'vids'/'MJPG' stream,
    frame chunks '00dc', idx1 index)."""
    n = len(frames)
    if n == 0:
        raise ValueError("AVI needs at least one frame")
    avih = struct.pack(
        "<14I",
        1_000_000 // fps,  # dwMicroSecPerFrame
        0,  # dwMaxBytesPerSec
        0,  # dwPaddingGranularity
        _AVIF_HASINDEX,
        n,  # dwTotalFrames
        0,  # dwInitialFrames
        1,  # dwStreams
        0,  # dwSuggestedBufferSize
        width,
        height,
        0, 0, 0, 0,  # dwReserved
    )
    strh = (
        b"vids"
        + b"MJPG"
        + struct.pack(
            "<IHHIIIIIIII4H",
            0,  # dwFlags
            0, 0,  # wPriority, wLanguage
            0,  # dwInitialFrames
            1, fps,  # dwScale, dwRate -> fps frames/sec
            0,  # dwStart
            n,  # dwLength (frames)
            0,  # dwSuggestedBufferSize
            0xFFFFFFFF,  # dwQuality (default)
            0,  # dwSampleSize (0: variable, one frame per chunk)
            0, 0, width, height,  # rcFrame
        )
    )
    strf = struct.pack(
        "<IiiHH4sIiiII",
        40, width, height, 1, 24, b"MJPG", width * height * 3, 0, 0, 0, 0,
    )
    hdrl = _list(
        b"hdrl", _chunk(b"avih", avih) + _list(b"strl", _chunk(b"strh", strh) + _chunk(b"strf", strf))
    )
    movi_items = [_chunk(b"00dc", f) for f in frames]
    movi = _list(b"movi", b"".join(movi_items))
    # idx1: one entry per frame chunk, offsets relative to the movi
    # LIST's data start (the conventional AVI 1.0 base)
    idx_entries = []
    off = 4  # past the 'movi' kind fourcc
    for f, item in zip(frames, movi_items):
        idx_entries.append(
            struct.pack("<4sIII", b"00dc", 0x10, off, len(f))  # AVIIF_KEYFRAME
        )
        off += len(item)
    idx1 = _chunk(b"idx1", b"".join(idx_entries))
    return _chunk(b"RIFF", b"AVI " + hdrl + movi + idx1)


def is_avi(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"AVI "


def avi_frames(payload: bytes) -> list[bytes]:
    """MJPEG AVI bytes -> list of JPEG frame payloads, in stream order.

    Tolerant reader: finds the movi LIST, collects ##dc/##db chunks
    (descending into 'rec ' grouping LISTs), ignores everything else.
    Raises ValueError on a non-AVI payload or a structurally broken
    chunk tree."""
    if not is_avi(payload):
        raise ValueError("not an AVI payload")

    frames: list[bytes] = []

    def walk(start: int, end: int, in_movi: bool) -> None:
        for tag, body_start, body_end in iter_chunks(payload, start, end):
            if tag == b"LIST":
                kind = payload[body_start: body_start + 4]
                walk(
                    body_start + 4,
                    body_end,
                    in_movi or kind in (b"movi", b"rec "),
                )
            elif in_movi and len(tag) == 4 and tag[2:4] in (b"dc", b"db"):
                frames.append(payload[body_start:body_end])

    walk(12, container_end(payload), False)
    return frames


def avi_geometry(payload: bytes) -> tuple[int, int, int]:
    """(width, height, n_frames) from the avih main header — a
    structured walk of the chunk tree (top level, then inside LIST
    hdrl), never a raw byte search: the 4-byte pattern 'avih' can
    legitimately occur inside entropy-coded frame data. No frame
    decode, no movi descent."""
    if not is_avi(payload):
        raise ValueError("not an AVI payload")

    def find_avih(start: int, end: int, depth: int) -> tuple[int, int] | None:
        for tag, body_start, body_end in iter_chunks(payload, start, end):
            if tag == b"avih":
                return body_start, body_end
            if tag == b"LIST" and depth < 2:
                kind = payload[body_start: body_start + 4]
                if kind == b"hdrl":
                    hit = find_avih(body_start + 4, body_end, depth + 1)
                    if hit is not None:
                        return hit
        return None

    hit = find_avih(12, container_end(payload), 0)
    if hit is None or hit[1] - hit[0] < 56:
        raise ValueError("AVI without avih header")
    vals = struct.unpack_from("<14I", payload, hit[0])
    return vals[8], vals[9], vals[4]


def sample_indices(n_src: int, k: int) -> list[int]:
    """Evenly spaced frame indices: k samples over [0, n_src-1],
    endpoints included (k=1 picks the first frame). Pure integer
    round-half-up — NOT Python round(), whose banker's rounding has no
    SQL twin — so the exact same arithmetic is statable in DuckDB:
    idx = (2*i*(n_src-1) + (k-1)) // (2*(k-1))."""
    if n_src <= 0:
        return []
    k = min(k, n_src)  # never emit duplicate frames
    if k <= 1:
        return [0]
    return [(2 * i * (n_src - 1) + (k - 1)) // (2 * (k - 1)) for i in range(k)]
