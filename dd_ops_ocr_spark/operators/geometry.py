"""Geometry / DPI / band-split operators (SURVEY §2.7 C1-C5, §2.8 K9/K10).

All pure JVM-side column arithmetic — no UDFs, full whole-stage codegen.
Derived inputs are deterministic functions of testdata columns so the
DuckDB oracle computes the identical values.

Reference semantics:
  C1-C4  src/modules/step1/02_dpi_calculator.py:27-192  (clamp, zoom, guard)
  K10    src/modules/step5/01_image_splitter.py:31-69   (band regions)
  K9     src/modules/step4/02_page_splitter.py:47-59    (L/R overlap bounds)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dd_ops_ocr_spark.schema import (
    DPI_MAX,
    DPI_MIN,
    MIN_BAND_HEIGHT,
    NUM_SPLITS,
    OVERLAP_RATIO,
    TARGET_H_PX,
    TARGET_W_PX,
)


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_dpi_clamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C1-C4: optimal DPI = floor(min(2048*72/w_pt, 2560*72/h_pt)) clamped
    to [50, 600]; zoom = dpi/72; output px = floor(pt*dpi/72); memory guard
    shrinks DPI so dpi^2 * 8.5 <= 10M px."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        (F.lit(300) + F.col("n_chars") % 400).alias("w_pt"),
        (F.lit(420) + (F.col("n_chars") * 3) % 500).alias("h_pt"),
    )
    raw = F.least(
        F.lit(float(TARGET_W_PX * 72)) / F.col("w_pt"),
        F.lit(float(TARGET_H_PX * 72)) / F.col("h_pt"),
    )
    dpi = F.least(F.greatest(F.floor(raw), F.lit(DPI_MIN)), F.lit(DPI_MAX))
    guard = F.floor(F.sqrt(F.lit(10_000_000.0 / 8.5)))
    return d.select(
        "doc_id",
        "w_pt",
        "h_pt",
        dpi.alias("dpi"),
        (dpi.cast("double") / F.lit(72.0)).alias("zoom"),
        F.floor(F.col("w_pt") * dpi / F.lit(72)).alias("out_w_px"),
        F.floor(F.col("h_pt") * dpi / F.lit(72)).alias("out_h_px"),
        F.least(dpi, guard).alias("guarded_dpi"),
    )


SQL_DPI_CLAMP = f"""
WITH d AS (
  SELECT doc_id,
         300 + n_chars % 400 AS w_pt,
         420 + (n_chars * 3) % 500 AS h_pt
  FROM documents
), e AS (
  SELECT doc_id, w_pt, h_pt,
         LEAST(GREATEST(FLOOR(LEAST({TARGET_W_PX * 72.0} / w_pt,
                                     {TARGET_H_PX * 72.0} / h_pt)),
                        {DPI_MIN}), {DPI_MAX}) AS dpi
  FROM d
)
SELECT doc_id, w_pt, h_pt, CAST(dpi AS BIGINT) AS dpi,
       dpi / 72.0 AS zoom,
       CAST(FLOOR(w_pt * dpi / 72) AS BIGINT) AS out_w_px,
       CAST(FLOOR(h_pt * dpi / 72) AS BIGINT) AS out_h_px,
       CAST(LEAST(dpi, FLOOR(SQRT(10000000.0 / 8.5))) AS BIGINT) AS guarded_dpi
FROM e
"""


def q_band_regions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K10: 5-way overlapping band regions with min-height fallback.

    base = H div splits; if H div 5 < 100 the split count falls back to
    max(1, H div 100); ov = int(base*0.1); band i spans
    [max(0, i*base - ov), min(H, (i+1)*base + ov)) and the last band is
    extended to H — exactly the reference formulas
    (step5/01_image_splitter.py:41-69)."""
    d = _docs(spark, sf_dir).select(
        "doc_id", (F.lit(80) + (F.col("n_chars") * 7) % 3000).alias("h")
    )
    d = d.withColumn(
        "splits",
        F.when(
            F.expr(f"h div {NUM_SPLITS}") < MIN_BAND_HEIGHT,
            F.greatest(F.lit(1), F.expr(f"h div {MIN_BAND_HEIGHT}")),
        ).otherwise(F.lit(NUM_SPLITS).cast("long")),
    )
    d = d.withColumn("base", F.expr("h div splits"))
    d = d.withColumn(
        "ov", F.floor(F.col("base") * F.lit(OVERLAP_RATIO)).cast("long")
    )
    d = d.select(
        "doc_id",
        "h",
        "splits",
        "base",
        "ov",
        F.explode(F.sequence(F.lit(0).cast("long"), F.col("splits") - 1)).alias(
            "band"
        ),
    )
    return d.select(
        "doc_id",
        "h",
        "splits",
        "band",
        F.greatest(F.lit(0).cast("long"), F.col("band") * F.col("base") - F.col("ov")).alias(
            "start_y"
        ),
        F.when(F.col("band") == F.col("splits") - 1, F.col("h"))
        .otherwise(F.least(F.col("h"), (F.col("band") + 1) * F.col("base") + F.col("ov")))
        .alias("end_y"),
    )


SQL_BAND_REGIONS = f"""
WITH d AS (
  SELECT doc_id, 80 + (n_chars * 7) % 3000 AS h FROM documents
), p AS (
  SELECT doc_id, h,
         CASE WHEN h // {NUM_SPLITS} < {MIN_BAND_HEIGHT}
              THEN GREATEST(1, h // {MIN_BAND_HEIGHT})
              ELSE {NUM_SPLITS} END AS splits
  FROM d
), q AS (
  SELECT doc_id, h, splits, h // splits AS base FROM p
), r AS (
  SELECT doc_id, h, splits, base,
         CAST(FLOOR(base * {OVERLAP_RATIO}) AS BIGINT) AS ov
  FROM q
)
SELECT doc_id, h, splits, t.i AS band,
       GREATEST(0, t.i * base - ov) AS start_y,
       CASE WHEN t.i = splits - 1 THEN h
            ELSE LEAST(h, (t.i + 1) * base + ov) END AS end_y
FROM r, UNNEST(range(0, r.splits)) AS t(i)
"""


def q_twoup_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K9: left/right split bounds with overlap — left = [0, cx + ov/2),
    right = [cx - ov/2, W), ov = int(W * 0.1)
    (step4/02_page_splitter.py:47-59)."""
    d = _docs(spark, sf_dir).select(
        "doc_id", (F.lit(1000) + F.col("n_chars") % 2000).alias("w")
    )
    cx = F.expr("w div 2")
    ov = F.floor(F.col("w") * F.lit(OVERLAP_RATIO)).cast("long")
    return d.select(
        "doc_id",
        "w",
        cx.alias("cx"),
        ov.alias("ov"),
        (cx + F.expr(f"cast(floor(w * {OVERLAP_RATIO}) as long) div 2")).alias("left_end"),
        (cx - F.expr(f"cast(floor(w * {OVERLAP_RATIO}) as long) div 2")).alias("right_start"),
    )


SQL_TWOUP_BOUNDS = f"""
WITH d AS (
  SELECT doc_id, 1000 + n_chars % 2000 AS w FROM documents
)
SELECT doc_id, w, w // 2 AS cx,
       CAST(FLOOR(w * {OVERLAP_RATIO}) AS BIGINT) AS ov,
       w // 2 + CAST(FLOOR(w * {OVERLAP_RATIO}) AS BIGINT) // 2 AS left_end,
       w // 2 - CAST(FLOOR(w * {OVERLAP_RATIO}) AS BIGINT) // 2 AS right_start
FROM d
"""


QUERIES = {
    "dpi_clamp": q_dpi_clamp,
    "band_regions": q_band_regions,
    "twoup_bounds": q_twoup_bounds,
}

ORACLE_SQL = {
    "dpi_clamp": SQL_DPI_CLAMP,
    "band_regions": SQL_BAND_REGIONS,
    "twoup_bounds": SQL_TWOUP_BOUNDS,
}
