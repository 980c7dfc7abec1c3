"""PCM WAV audio codec (pure stdlib struct + numpy, no audio libs).

Completes the multimodal triple (image / video / AUDIO) with a real
byte-level format: WAV is RIFF (the same chunk grammar as the AVI
container in operators/video.py) holding a ``fmt `` header and a
``data`` chunk of interleaved little-endian PCM samples. 16-bit and
8-bit integer PCM decode natively; float/ADPCM/extensible formats raise
NotImplementedError — they are the injection seam for a real
soundfile/ffmpeg deployment, exactly like exotic image codecs.

The reference pipeline is image-only (its media are PDF page renders);
audio support follows SURVEY §6's training-data-pipeline mandate: treat
media as opaque binary columns with typed metadata, and make the
decode / feature-extract plumbing real and tested even where the
reference has no counterpart.
"""

from __future__ import annotations

import struct

import numpy as np


from dd_ops_ocr_spark.operators.riff import chunk as _chunk
from dd_ops_ocr_spark.operators.riff import container_end, iter_chunks


def encode_wav(samples: np.ndarray, rate: int) -> bytes:
    """int16 samples of shape (n,) or (n, channels) -> PCM WAV bytes."""
    if samples.ndim == 1:
        samples = samples[:, None]
    if samples.dtype != np.int16:
        raise ValueError("encode_wav takes int16 samples")
    n, ch = samples.shape
    block_align = ch * 2
    fmt = struct.pack(
        "<HHIIHH", 1, ch, rate, rate * block_align, block_align, 16
    )
    data = np.ascontiguousarray(samples, dtype="<i2").tobytes()
    return _chunk(
        b"RIFF",
        b"WAVE" + _chunk(b"fmt ", fmt) + _chunk(b"data", data),
    )


def is_wav(payload: bytes) -> bool:
    return payload[:4] == b"RIFF" and payload[8:12] == b"WAVE"


def _walk_chunks(payload: bytes) -> dict[bytes, tuple[int, int]]:
    """Tolerant RIFF walk: (body_start, body_end) spans of the first
    ``fmt `` and ``data`` chunks; everything else (LIST/INFO/fact/cue
    ...) is skipped. Spans, not slices — the metadata path must stay
    O(header), never copying the sample bytes."""
    found: dict[bytes, tuple[int, int]] = {}
    for tag, body_start, body_end in iter_chunks(
        payload, 12, container_end(payload)
    ):
        if tag in (b"fmt ", b"data") and tag not in found:
            found[tag] = (body_start, body_end)
    return found


def _parse(payload: bytes) -> tuple[int, int, int, tuple[int, int]]:
    """(sample_rate, channels, bits, data_span) with fmt validated.
    Malformed containers raise ValueError; format gaps (float PCM,
    ADPCM, exotic depths) raise NotImplementedError — the module's
    whole error contract, kept narrow so Spark-task callers can
    classify failures."""
    if not is_wav(payload):
        raise ValueError("not a WAV payload")
    found = _walk_chunks(payload)
    if b"fmt " not in found or b"data" not in found:
        raise ValueError("WAV without fmt/data chunk")
    f0, f1 = found[b"fmt "]
    if f1 - f0 < 16:
        raise ValueError("WAV fmt chunk truncated")
    audio_fmt, ch, rate, _br, block_align, bits = struct.unpack_from(
        "<HHIIHH", payload, f0
    )
    if audio_fmt != 1:
        raise NotImplementedError(
            f"WAV audio format {audio_fmt} (only integer PCM)"
        )
    if bits not in (8, 16):
        raise NotImplementedError(f"PCM bit depth {bits} (only 8/16)")
    if ch == 0 or rate == 0 or block_align != ch * bits // 8:
        raise ValueError("WAV fmt header inconsistent")
    return rate, ch, bits, found[b"data"]


def wav_info(payload: bytes) -> tuple[int, int, int]:
    """(sample_rate, channels, n_samples) from the headers — O(header),
    no sample materialization (the cheap metadata path, like
    avi_geometry)."""
    rate, ch, bits, (d0, d1) = _parse(payload)
    return rate, ch, (d1 - d0) // (ch * bits // 8)


def decode_wav(payload: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes -> (int16 samples of shape (n, channels), sample_rate).
    8-bit PCM (unsigned per spec) is widened to int16."""
    rate, ch, bits, (d0, d1) = _parse(payload)
    n = (d1 - d0) // (ch * bits // 8)
    if bits == 8:
        raw = np.frombuffer(payload, dtype=np.uint8, count=n * ch, offset=d0)
        samples = ((raw.astype(np.int16) - 128) << 8).reshape(n, ch)
    else:
        raw = np.frombuffer(payload, dtype="<i2", count=n * ch, offset=d0)
        samples = raw.astype(np.int16).reshape(n, ch)
    return samples, rate


def audio_features(payload: bytes) -> dict[str, int]:
    """Decode and reduce to the SQL-statable feature surface: geometry
    (rate / channels / count / integer-ms duration) plus channel-0
    signal statistics (peak magnitude, rounded RMS, sign-change count).
    All integers — float reductions stay deterministic across hosts."""
    samples, rate = decode_wav(payload)
    x = samples[:, 0].astype(np.float64)
    n = len(x)
    # abs in int32: np.abs(int16(-32768)) overflows back to -32768
    peak = int(np.abs(samples[:, 0].astype(np.int32)).max()) if n else 0
    rms = int(round(float(np.sqrt(np.mean(x * x))))) if n else 0
    sign = np.signbit(samples[:, 0])
    zc = int(np.count_nonzero(sign[1:] != sign[:-1])) if n > 1 else 0
    return {
        "sample_rate": rate,
        "n_channels": samples.shape[1],
        "n_samples": n,
        "duration_ms": n * 1000 // rate,
        "peak": peak,
        "rms": rms,
        "zero_crossings": zc,
    }
