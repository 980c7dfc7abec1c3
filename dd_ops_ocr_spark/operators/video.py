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
_AVIIF_KEYFRAME = 0x00000010


def _list(kind: bytes, body: bytes) -> bytes:
    return _chunk(b"LIST", kind + body)


def encode_avi_mjpeg(
    frames: list[bytes], width: int, height: int, fps: int = 10
) -> bytes:
    """JPEG frame payloads -> MJPEG AVI bytes (one 'vids'/'MJPG' stream,
    frame chunks '00dc', idx1 index). Every MJPEG frame is
    self-contained, so every idx1 entry carries AVIIF_KEYFRAME."""
    return encode_avi(frames, width, height, b"MJPG",
                      [True] * len(frames), fps)


def encode_avi(
    frames: list[bytes],
    width: int,
    height: int,
    fourcc: bytes,
    keyframe: list[bool],
    fps: int = 10,
) -> bytes:
    """Codec-agnostic AVI writer: frame payloads + per-frame keyframe
    flags -> one 'vids' stream with an idx1 index whose AVIIF_KEYFRAME
    bits record which frames are independently decodable — the flag an
    inter-frame decoder seeks by."""
    n = len(frames)
    if n == 0:
        raise ValueError("AVI needs at least one frame")
    if len(keyframe) != n:
        raise ValueError("one keyframe flag per frame")
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
        + fourcc
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
        40, width, height, 1, 24, fourcc, width * height * 3, 0, 0, 0, 0,
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
    for f, item, key in zip(frames, movi_items, keyframe):
        idx_entries.append(
            struct.pack(
                "<4sIII", b"00dc",
                _AVIIF_KEYFRAME if key else 0, off, len(f),
            )
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


def avi_frame_index(payload: bytes) -> list[tuple[int, int, bool]]:
    """Parse the idx1 index chunk: (body_start, body_end, is_keyframe)
    per frame chunk, in stream order. This is the random-access surface
    an inter-frame decoder needs — seek to the governing keyframe
    WITHOUT scanning the stream. Offsets are resolved against the movi
    LIST (the AVI 1.0 convention), falling back to absolute file offsets
    (the other convention in the wild) when the chunk tag check fails.
    Raises ValueError when the container carries no idx1."""
    if not is_avi(payload):
        raise ValueError("not an AVI payload")
    movi_start = None
    idx_span = None
    for tag, body_start, body_end in iter_chunks(
        payload, 12, container_end(payload)
    ):
        if tag == b"LIST" and payload[body_start: body_start + 4] == b"movi":
            movi_start = body_start
        elif tag == b"idx1":
            idx_span = (body_start, body_end)
    if movi_start is None or idx_span is None:
        raise ValueError("AVI without movi/idx1")
    out: list[tuple[int, int, bool]] = []
    i0, i1 = idx_span
    for pos in range(i0, i1 - 15, 16):
        tag, flags, off, size = struct.unpack_from("<4sIII", payload, pos)
        if tag[2:4] not in (b"dc", b"db"):
            continue
        start = movi_start + off
        if payload[start: start + 4] != tag:
            start = off  # absolute-offset convention
            if payload[start: start + 4] != tag:
                raise ValueError("idx1 offset resolves to no chunk")
        body = start + 8
        if body + size > len(payload):
            raise ValueError("idx1 entry overruns payload")
        out.append((body, body + size, bool(flags & _AVIIF_KEYFRAME)))
    return out


def encode_avi_png_delta(
    frames_px: list, kf_interval: int, fps: int = 10
) -> bytes:
    """Pixel frames -> inter-frame-coded AVI: every kf_interval-th frame
    is a keyframe (PNG of the frame itself, AVIIF_KEYFRAME set), the
    rest are delta frames (PNG of the mod-256 pixel difference vs the
    previous frame). Wraparound subtraction is exactly invertible and
    PNG is lossless, so decode is bit-exact — a real temporal-prediction
    codec without the entropy-model weight of H.264. Deltas of similar
    frames are near-constant images, which PNG's filters compress hard:
    the same reason real video codecs predict temporally."""
    import numpy as np

    from dd_ops_ocr_spark.operators.png import encode_png

    if kf_interval < 1:
        raise ValueError("kf_interval must be >= 1")
    if not frames_px:
        raise ValueError("AVI needs at least one frame")
    h, w, _ = frames_px[0].shape
    payloads, keys = [], []
    for i, px in enumerate(frames_px):
        if px.shape != (h, w, 3):
            raise ValueError("all frames must share one geometry")
        key = i % kf_interval == 0
        img = px if key else (
            px.astype(np.uint8) - frames_px[i - 1].astype(np.uint8)
        )
        payloads.append(encode_png(img.astype(np.uint8)))
        keys.append(key)
    return encode_avi(payloads, w, h, b"MPNG", keys, fps)


def decode_sampled_delta_frames(
    payload: bytes, k: int,
    geometry: tuple[int, int, int] | None = None,
) -> list[tuple[int, int, "object"]]:
    """Sample k frames evenly from an inter-frame-coded AVI and decode
    ONLY what each sample needs: seek to the governing keyframe via the
    idx1 flags, then accumulate mod-256 deltas forward. Work per sampled
    frame is bounded by the keyframe interval — independent of where in
    a long stream the sample lands — and consecutive samples reuse the
    running reconstruction when their chains overlap. Returns
    (src_idx, key_idx, pixels) triples. Pass ``geometry`` (a prior
    avi_geometry result) to skip re-walking the container."""
    import numpy as np

    from dd_ops_ocr_spark.operators.png import decode_png

    _w, _h, n = geometry if geometry is not None else avi_geometry(payload)
    index = avi_frame_index(payload)
    if len(index) != n:
        raise ValueError("idx1 frame count disagrees with avih")
    picks = sample_indices(n, k)
    out: list[tuple[int, int, object]] = []
    cache_pos = -1
    cache_px: object = None
    for i in picks:
        key = next(
            (j for j in range(i, -1, -1) if index[j][2]), None
        )
        if key is None:
            raise ValueError("no keyframe at or before sampled frame")
        if key <= cache_pos <= i:
            start, px = cache_pos + 1, cache_px
        else:
            b0, b1, _ = index[key]
            px = decode_png(payload[b0:b1])
            start = key + 1
        for j in range(start, i + 1):
            b0, b1, _ = index[j]
            px = (px + decode_png(payload[b0:b1])).astype(np.uint8)
        cache_pos, cache_px = i, px
        out.append((i, key, px))
    return out


def sample_indices(n_src: int, k: int) -> list[int]:
    """Evenly spaced frame indices: k samples over [0, n_src-1],
    endpoints included (k=1 picks the first frame). Pure integer
    round-half-up — NOT Python round(), whose banker's rounding has no
    SQL twin — so the exact same arithmetic is statable in DuckDB:
    idx = (2*i*(n_src-1) + (k-1)) // (2*(k-1))."""
    if n_src <= 0 or k <= 0:
        return []  # zero samples requested = zero frames decoded
    k = min(k, n_src)  # never emit duplicate frames
    if k == 1:
        return [0]
    return [(2 * i * (n_src - 1) + (k - 1)) // (2 * (k - 1)) for i in range(k)]
