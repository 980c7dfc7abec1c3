"""Shared RIFF chunk grammar (Microsoft RIFF: AVI containers in
operators/video.py, WAV audio in operators/audio.py).

One writer and one walker so alignment/overrun fixes can never drift
between the two formats: a chunk is tag(4) + length(LE u32) + body +
one pad byte when the body length is odd.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator


def chunk(tag: bytes, body: bytes) -> bytes:
    pad = b"\x00" if len(body) % 2 else b""
    return tag + struct.pack("<I", len(body)) + body + pad


def iter_chunks(
    data: bytes, start: int, end: int
) -> Iterator[tuple[bytes, int, int]]:
    """Yield (tag, body_start, body_end) for each chunk in
    data[start:end], honoring word alignment; raises ValueError when a
    chunk overruns its parent."""
    pos = start
    while pos + 8 <= end:
        tag = data[pos: pos + 4]
        (ln,) = struct.unpack_from("<I", data, pos + 4)
        body_start = pos + 8
        body_end = body_start + ln
        if body_end > end:
            raise ValueError("RIFF chunk overruns its parent")
        yield tag, body_start, body_end
        pos = body_end + (ln & 1)


def container_end(payload: bytes) -> int:
    """End offset of the top-level RIFF container's payload."""
    (riff_len,) = struct.unpack_from("<I", payload, 4)
    return min(8 + riff_len, len(payload))
