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


QUERIES = {"media_metadata": q_media_metadata}
ORACLE_SQL: dict[str, str] = {}
