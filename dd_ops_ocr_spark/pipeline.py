"""Flagship extraction pipeline — vectorized Spark implementation.

The whole per-document reference dataflow (render -> judge -> rotate ->
split -> OCR -> integrate; reference src/main_pipeline.py:330-441) becomes
ONE shuffle-free DataFrame program: the input table carries one row per
document, so every per-doc computation is row-local and runs inside a
single ``mapInPandas`` over Arrow batches. No groupBy, no join, no shuffle
— partition parallelism is the executor's job (reference X2 asyncio
fan-out, step2/04:94-118).

Scale notes (100 TB design):
  * one row = one doc => doc never straddles partitions; ``maxPartitionBytes``
    controls task granularity at the scan.
  * skewed multi-page docs (north_rule) are handled by the salted variant in
    ``dd_ops_ocr_spark.plans.salting`` which explodes tail docs by page and
    reassembles with an ordered fold.
  * all kernels are numpy/pandas over flat arrays — zero per-row Python in
    the hot path (input_hint mandate).

The kernel ``extract_flat_pandas`` is shared by the mapInPandas path, the
pre-exploded ``applyInPandas`` path, and the salted path, so all three are
oracle-checked by the same tests.
"""

from __future__ import annotations

import math
from itertools import chain
from typing import Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame

from dd_ops_ocr_spark.schema import (
    BOILERPLATE_FRAC,
    CX,
    FOOTER_ZONE,
    GUTTER_HALF,
    HEADER_ZONE,
    MIN_PAGES_BOILERPLATE,
    OUT_SPANS_DDL,
    PAGE_H,
    PAGE_W,
    STRIDE,
    TWOUP_MIN_SIDE,
)

_EMPTY_OUT = pd.DataFrame(
    {
        "doc_id": pd.Series(dtype=object),
        "kind": pd.Series(dtype=object),
        "text": pd.Series(dtype=object),
        "media_ref": pd.Series(dtype=object),
        "order": pd.Series(dtype="int32"),
    }
)


def extract_flat_pandas(flat: pd.DataFrame) -> pd.DataFrame:
    """Vectorized extraction over a flat span batch.

    ``flat`` columns: doc_id(str), kind(str), text(str|None),
    media_ref(str|None), offset(int). Every doc present must be complete
    (all its spans in this batch). Returns OUT_SPANS_DDL columns.

    Implements the same spec as ``oracle.extract_doc`` (see that module's
    docstring for the step-by-step semantics and reference citations), but
    as whole-batch numpy/pandas operations.
    """
    if len(flat) == 0:
        return _EMPTY_OUT.copy()

    off = flat["offset"].to_numpy(dtype=np.int64)
    page = off // STRIDE
    rem = off % STRIDE
    y = rem // PAGE_W
    x = rem % PAGE_W

    kind = flat["kind"].to_numpy(dtype=object)
    is_text = kind == "text"

    # C14 whitespace normalization (vectorized pandas str ops).
    norm = (
        flat["text"]
        .fillna("")
        .str.replace(r"\n{2,}", "\n", regex=True)
        .str.strip()
        .to_numpy(dtype=object)
    )

    keep = ~is_text | (norm != "")
    df = pd.DataFrame(
        {
            "doc_id": flat["doc_id"].to_numpy(dtype=object)[keep],
            "kind": kind[keep],
            "text": np.where(is_text[keep], norm[keep], None),
            "media_ref": flat["media_ref"].to_numpy(dtype=object)[keep],
            "page": page[keep],
            "y": y[keep],
            "x": x[keep],
        }
    )
    if len(df) == 0:
        return _EMPTY_OUT.copy()

    # Two-up detection per (doc, page): empty gutter + >=N spans per side.
    xv = df["x"].to_numpy()
    df["_left"] = (xv < CX - GUTTER_HALF).astype(np.int32)
    df["_right"] = (xv >= CX + GUTTER_HALF).astype(np.int32)
    df["_gutter"] = ((xv >= CX - GUTTER_HALF) & (xv < CX + GUTTER_HALF)).astype(
        np.int32
    )
    gp = df.groupby(["doc_id", "page"], sort=False)
    two_up = (
        (gp["_gutter"].transform("sum") == 0)
        & (gp["_left"].transform("sum") >= TWOUP_MIN_SIDE)
        & (gp["_right"].transform("sum") >= TWOUP_MIN_SIDE)
    ).to_numpy()
    df["side"] = np.where(two_up & (xv >= CX), 1, 0).astype(np.int32)
    df.drop(columns=["_left", "_right", "_gutter"], inplace=True)

    # Boilerplate strip: normalized text repeating in the header/footer zone
    # on >= ceil(BOILERPLATE_FRAC * n_pages) pages of a >=3-page doc.
    yv = df["y"].to_numpy()
    zone = np.where(yv < HEADER_ZONE, 1, np.where(yv >= PAGE_H - FOOTER_ZONE, 2, 0))
    zone = np.where(df["kind"].to_numpy() == "text", zone, 0)
    df["_zone"] = zone

    n_pages = (
        df[["doc_id", "page"]]
        .drop_duplicates()
        .groupby("doc_id", sort=False)
        .size()
    )
    doc_n_pages = df["doc_id"].map(n_pages).to_numpy()
    cand = df[df["_zone"] > 0]
    if len(cand):
        zc = (
            cand.groupby(["doc_id", "_zone", "text"], sort=False)["page"]
            .nunique()
            .rename("zpages")
        )
        zpages = (
            df[["doc_id", "_zone", "text"]]
            .join(zc, on=["doc_id", "_zone", "text"])["zpages"]
            .fillna(0)
            .to_numpy()
        )
        thresh = np.ceil(BOILERPLATE_FRAC * doc_n_pages)
        boiler = (
            (df["_zone"].to_numpy() > 0)
            & (doc_n_pages >= MIN_PAGES_BOILERPLATE)
            & (zpages >= thresh)
        )
        df = df[~boiler]
    df = df.drop(columns=["_zone"])
    if len(df) == 0:
        return _EMPTY_OUT.copy()

    # Reading-order sort within doc; order = 1-based rank.
    df = df.sort_values(
        ["doc_id", "page", "side", "y", "x"], kind="mergesort", ignore_index=True
    )
    order = df.groupby("doc_id", sort=False).cumcount().to_numpy() + 1
    return pd.DataFrame(
        {
            "doc_id": df["doc_id"],
            "kind": df["kind"],
            "text": df["text"],
            "media_ref": df["media_ref"],
            "order": order.astype("int32"),
        }
    )


def flatten_nested_batch(pdf: pd.DataFrame) -> pd.DataFrame:
    """(doc_id, spans:list[dict]) batch -> flat span DataFrame."""
    spans_lists = pdf["spans"].tolist()
    counts = np.fromiter((len(s) for s in spans_lists), dtype=np.int64,
                         count=len(spans_lists))
    doc_rep = np.repeat(pdf["doc_id"].to_numpy(dtype=object), counts)
    all_spans = list(chain.from_iterable(spans_lists))
    if not all_spans:
        return pd.DataFrame(
            {"doc_id": [], "kind": [], "text": [], "media_ref": [], "offset": []}
        )
    sdf = pd.DataFrame(all_spans)
    sdf.insert(0, "doc_id", doc_rep)
    return sdf


def extract(df: DataFrame) -> DataFrame:
    """Nested (doc_id, spans) -> exploded reading-order span sequence.

    Shuffle-free: each input row is a whole doc, so batches are always
    doc-complete and the kernel runs per Arrow batch.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            yield extract_flat_pandas(flatten_nested_batch(pdf))

    return df.mapInPandas(run, schema=OUT_SPANS_DDL)


def extract_exploded(flat_df: DataFrame) -> DataFrame:
    """Same extraction over a pre-exploded span table
    (doc_id, kind, text, media_ref, offset) — one shuffle to co-locate docs.

    Use when the source is already flat (e.g. a landing table of spans);
    the nested path (``extract``) is preferred at scale because it needs
    no shuffle at all.
    """

    def run(key: tuple, pdf: pd.DataFrame) -> pd.DataFrame:
        return extract_flat_pandas(pdf)

    return flat_df.groupBy("doc_id").applyInPandas(run, schema=OUT_SPANS_DDL)


def metrics(out_df: DataFrame) -> DataFrame:
    """Per-doc extraction metrics (north_rule lineage columns):
    spans_emitted + blocks_classified from the output, cheap JVM-side agg."""
    from pyspark.sql import functions as F

    return out_df.groupBy("doc_id").agg(
        F.count("*").alias("spans_emitted"),
        F.sum((F.col("kind") == "text").cast("long")).alias("text_blocks"),
        F.sum((F.col("kind") != "text").cast("long")).alias("media_blocks"),
    )


def expected_output_pandas(documents: pd.DataFrame) -> pd.DataFrame:
    """Oracle expected output for a documents batch, flat rows
    (doc_id, kind, text, media_ref, order). Test-side helper."""
    from dd_ops_ocr_spark import corpus, oracle

    rows: list[tuple] = []
    for doc_key, text in zip(documents["doc_id"], documents["text"]):
        did = corpus.doc_id_str(int(doc_key))
        for s in oracle.extract_doc(corpus.doc_spans(int(doc_key), text or "")):
            rows.append((did, s["kind"], s["text"], s["media_ref"], s["order"]))
    return pd.DataFrame(
        rows, columns=["doc_id", "kind", "text", "media_ref", "order"]
    )
