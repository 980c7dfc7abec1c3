"""Multimodal (image/audio/video) column plumbing.

Media payloads are opaque ``binary`` columns with typed metadata, exactly
as a 100 TB interleaved corpus stores them (the reference's equivalent is
JPEG page images on disk, step1/03_image_converter.py). The Spark-side
plumbing — schema, Arrow batch shape, mapInPandas signatures, partition
behavior — is real and tested; the pixel-level decode itself is STUBBED
(image/audio libraries are not in this container): ``decode_image``
raises NotImplementedError unless a decoder is injected, and the default
injected decoder is a deterministic fake that derives metadata from the
payload bytes (clearly marked, reproducible for tests).
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession, functions as F

from dd_ops_ocr_spark.corpus import mix64

MEDIA_META_DDL = (
    "media_ref string, n_bytes long, format string, width int, height int,"
    " phash long"
)


def synth_payload(media_ref: str, n_bytes: int = 64) -> bytes:
    """Deterministic fake binary payload derived from the ref string."""
    seed = mix64(int.from_bytes(media_ref.encode()[:8].ljust(8, b"\0"), "little"))
    out = bytearray()
    h = seed
    while len(out) < n_bytes:
        h = mix64(h)
        out += h.to_bytes(8, "little")
    return bytes(out[:n_bytes])


def decode_image(payload: bytes):  # pragma: no cover - real decode stubbed
    """Real decode path — requires an image library not present in this
    environment. Kept as the integration point; tests and the default
    pipeline use ``fake_decode_batch``."""
    raise NotImplementedError(
        "image decoding requires PIL/opencv, not available in this container; "
        "inject a decoder into media_metadata(decoder=...)"
    )


def fake_decode_batch(payloads: pd.Series) -> pd.DataFrame:
    """DETERMINISTIC FAKE decoder (vectorized): metadata derived from the
    payload bytes so the whole path is reproducible without image libs.
    Mirrors what a real Arrow-batched decoder returns: format, dims,
    perceptual hash."""
    n = len(payloads)
    n_bytes = np.fromiter((len(p) for p in payloads), dtype=np.int64, count=n)
    head = np.fromiter(
        (int.from_bytes(p[:8], "little") if len(p) >= 8 else 0 for p in payloads),
        dtype=np.uint64,
        count=n,
    )
    fmts = np.array(["jpeg", "png", "webp"], dtype=object)
    return pd.DataFrame(
        {
            "n_bytes": n_bytes,
            "format": fmts[(head % 3).astype(np.int64)],
            "width": (256 + (head >> 8) % 1792).astype(np.int32),
            "height": (256 + (head >> 24) % 2304).astype(np.int32),
            "phash": (head >> 1).astype(np.int64),
        }
    )


def media_metadata(
    media_df: DataFrame,
    decoder: Callable[[pd.Series], pd.DataFrame] = fake_decode_batch,
) -> DataFrame:
    """(media_ref, payload:binary) -> typed metadata via mapInPandas.

    The decode is per-Arrow-batch and vectorized; at scale this is the
    standard shape for feature extraction / resize / frame-sample UDFs:
    binary in, struct out, no shuffle."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            meta = decoder(pdf["payload"])
            meta.insert(0, "media_ref", pdf["media_ref"].to_numpy())
            yield meta

    return media_df.mapInPandas(run, schema=MEDIA_META_DDL)


def q_media_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query: synthesize media refs + payloads from the corpus
    generator's media spans, then run the metadata extraction path.
    Rows-only (binary plumbing is not SQL-expressible); pytest checks
    determinism and batch shape."""
    from dd_ops_ocr_spark import corpus

    spans = corpus.build_spans_df_cached(spark, sf_dir)
    media = (
        spans.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
    )

    def add_payload(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [synth_payload(r) for r in pdf["media_ref"]]
            yield pdf

    with_payload = media.mapInPandas(
        add_payload, schema="media_ref string, payload binary"
    )
    return media_metadata(with_payload)


def fake_resize_batch(payloads: pd.Series, target_w: int, target_h: int) -> pd.DataFrame:
    """DETERMINISTIC FAKE resize: real implementations decode, resample,
    re-encode; the fake derives a new payload from (payload, target dims)
    so determinism, batch shape, and schema flow are testable. The binary
    out/in contract is exactly what a real Pillow/OpenCV kernel plugs
    into."""
    out_payload = [
        synth_payload(f"{mix64(int.from_bytes(p[:8], 'little')) ^ (target_w << 16 | target_h):x}")
        for p in payloads
    ]
    return pd.DataFrame(
        {
            "payload": out_payload,
            "width": np.full(len(payloads), target_w, dtype=np.int32),
            "height": np.full(len(payloads), target_h, dtype=np.int32),
        }
    )


def media_resize(media_df: DataFrame, target_w: int = 1024,
                 target_h: int = 1280) -> DataFrame:
    """(media_ref, payload) -> resized payload + dims, Arrow-batched.
    The reference's equivalent is the 2x re-render + scaled-DPI path
    (step2/02_image_reprocessor.py:68-133)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out = fake_resize_batch(pdf["payload"], target_w, target_h)
            out.insert(0, "media_ref", pdf["media_ref"].to_numpy())
            yield out

    return media_df.mapInPandas(
        run, schema="media_ref string, payload binary, width int, height int"
    )


def media_frame_sample(media_df: DataFrame, n_frames: int = 4) -> DataFrame:
    """Video-style frame sampling: one binary payload -> n_frames rows of
    (frame_idx, frame payload). One-to-many Arrow-batched expansion — the
    multimodal analogue of posexplode (real decoder: pyAV/ffmpeg)."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            n = len(pdf)
            if n == 0:
                continue
            refs = np.repeat(pdf["media_ref"].to_numpy(), n_frames)
            idx = np.tile(np.arange(n_frames, dtype=np.int32), n)
            frames = [
                synth_payload(f"{r}#f{i}", n_bytes=32)
                for r, i in zip(refs, idx)
            ]
            yield pd.DataFrame(
                {"media_ref": refs, "frame_idx": idx, "frame": frames}
            )

    return media_df.mapInPandas(
        run, schema="media_ref string, frame_idx int, frame binary"
    )


def _media_with_payload(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_ops_ocr_spark import corpus

    spans = corpus.build_spans_df_cached(spark, sf_dir)
    media = (
        spans.select(F.explode("spans").alias("s"))
        .filter(F.col("s.kind") == "media")
        .select(F.col("s.media_ref").alias("media_ref"))
    )

    def add_payload(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            pdf = pdf.copy()
            pdf["payload"] = [synth_payload(r) for r in pdf["media_ref"]]
            yield pdf

    return media.mapInPandas(
        add_payload, schema="media_ref string, payload binary"
    )


def q_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = media_resize(_media_with_payload(spark, sf_dir))
    return out.select(
        "media_ref", "width", "height",
        F.length("payload").cast("long").alias("payload_bytes"),
    )


def q_media_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    out = media_frame_sample(_media_with_payload(spark, sf_dir))
    return out.select(
        "media_ref", "frame_idx",
        F.length("frame").cast("long").alias("frame_bytes"),
    )


QUERIES = {
    "media_metadata": q_media_metadata,
    "media_resize": q_media_resize,
    "media_frame_sample": q_media_frame_sample,
}
ORACLE_SQL: dict[str, str] = {}
