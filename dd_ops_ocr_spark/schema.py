"""Schemas and geometry constants for the interleaved-spans data model.

The reference pipeline renders PDF pages to images targeting 2048x2560 px
(reference: config.yml:29-35, src/modules/step1/02_dpi_calculator.py:27-59).
We keep that page geometry as the synthetic coordinate space: a span's
``offset`` encodes (page, y, x) as

    offset = page * STRIDE + y * PAGE_W + x,   STRIDE = PAGE_W * PAGE_H

which makes offsets monotonically increasing in reading order within a doc
(FIXTURES.md §1: "page boundaries derivable from offset gaps") while staying
inside int32 for docs up to 409 pages.
"""

from __future__ import annotations

from pyspark.sql import types as T

# Reference target render geometry (config.yml:29-35).
PAGE_W = 2048
PAGE_H = 2560
STRIDE = PAGE_W * PAGE_H  # 5_242_880

# Two-up (left/right spread) detection — deterministic replacement for the
# reference's LLM page-count judgment (step4/01_page_count_evaluator.py:55-232):
# a page is two-up iff no span falls in the central gutter band and both
# sides carry at least TWOUP_MIN_SIDE spans.
CX = PAGE_W // 2          # 1024, split midpoint (step4/02_page_splitter.py:47-59)
GUTTER_HALF = 64          # gutter band = [CX-64, CX+64)
TWOUP_MIN_SIDE = 4

# Header/footer boilerplate strip — deterministic replacement for the
# reference's prompt-delegated cleanup (llm_prompts.yaml:160-164;
# utils/clean_ocr_result.py:103-140): a normalized text that repeats in the
# top/bottom zone on >= BOILERPLATE_FRAC of a doc's pages is stripped.
HEADER_ZONE = 128         # y < 128
FOOTER_ZONE = 128         # y >= PAGE_H - 128
BOILERPLATE_FRAC = 0.8
MIN_PAGES_BOILERPLATE = 3

# Band-split parameters (reference: config.yml:133-138,
# src/modules/step5/01_image_splitter.py:31-69).
NUM_SPLITS = 5
OVERLAP_RATIO = 0.1
MIN_BAND_HEIGHT = 100

# DPI calculation parameters (reference: config.yml:29-35,
# src/modules/step1/02_dpi_calculator.py:27-59).
TARGET_W_PX = 2048
TARGET_H_PX = 2560
DPI_MIN = 50
DPI_MAX = 600

SPAN_STRUCT = T.StructType(
    [
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("offset", T.IntegerType()),
    ]
)

SPANS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("spans", T.ArrayType(SPAN_STRUCT), False),
    ]
)

# Flagship output: one row per emitted span, reading-order ranked.
OUT_SPANS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("kind", T.StringType()),
        T.StructField("text", T.StringType()),
        T.StructField("media_ref", T.StringType()),
        T.StructField("order", T.IntegerType(), False),
    ]
)

OUT_SPANS_DDL = "doc_id string, kind string, text string, media_ref string, order int"

METRICS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("pages_processed", T.LongType()),
        T.StructField("blocks_classified", T.LongType()),
        T.StructField("spans_emitted", T.LongType()),
    ]
)


# C14 whitespace normalization, JVM-expression form, shared by the
# sql/bounded plans. Semantically identical to
#   regexp_replace(regexp_replace(text, "\n{2,}", "\n"),
#                  r"(?U)(^\s+)|(\s+$)", "")
# but ~2.5x cheaper per pass (measured at sf0.1 x64):
#   * the newline-run collapse only runs its regex on rows that CONTAIN
#     "\n\n" (strings without a run are fixed points of the collapse);
#   * the Unicode trim is btrim over the explicit White_Space set —
#     Java's (?U)\s is exactly \p{IsWhite_Space} (25 code points), and
#     regexp_replace of (^\s+)|(\s+$) with "" removes exactly the
#     leading and trailing runs of that set, which is btrim's contract.
UNICODE_WS = "".join(
    chr(c)
    for c in (
        list(range(0x09, 0x0E))        # TAB..CR
        + [0x20, 0x85, 0xA0, 0x1680]
        + list(range(0x2000, 0x200B))  # EN QUAD..HAIR SPACE
        + [0x2028, 0x2029, 0x202F, 0x205F, 0x3000]
    )
)


def norm_text_expr(col):
    """Column expression: collapse \\n runs, strip Unicode whitespace."""
    from pyspark.sql import functions as F

    c = F.col(col) if isinstance(col, str) else col
    collapsed = F.when(
        c.contains("\n\n"), F.regexp_replace(c, "\n{2,}", "\n")
    ).otherwise(c)
    return F.btrim(collapsed, F.lit(UNICODE_WS))
