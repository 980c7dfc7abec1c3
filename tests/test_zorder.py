"""Z-order clustering: prove the multi-dimensional data-skipping claim
against REAL parquet footers — a filter on EITHER dimension must skip
most files of a Z-clustered write, while a linear (x-sorted) write
skips only on x and reads everything for a y-filter."""

from __future__ import annotations

import glob
import os

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from dd_ops_ocr_spark.operators.catalogops import zorder_key16

N_FILES = 16
DOMAIN = 65536
BAND = DOMAIN // 16  # a 1/16-wide predicate band on one dimension


def _file_bounds(path: str, col: str) -> list[tuple[int, int]]:
    out = []
    for f in sorted(glob.glob(os.path.join(path, "*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.to_arrow_schema().get_field_index(col)
        los, his = [], []
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            los.append(st.min)
            his.append(st.max)
        out.append((min(los), max(his)))
    return out


def _files_hit(bounds: list[tuple[int, int]], lo: int, hi: int) -> int:
    """Files a [lo, hi) predicate cannot skip by min/max alone."""
    return sum(1 for b_lo, b_hi in bounds if b_hi >= lo and b_lo < hi)


@pytest.fixture(scope="module")
def layouts(spark, tmp_path_factory):
    base = str(tmp_path_factory.mktemp("zorder"))
    rows = spark.range(20_000).select(
        ((F.col("id") * 2654435761) % DOMAIN).alias("x"),
        ((F.col("id") * 40503 + 17) % DOMAIN).alias("y"),
    )
    z = rows.withColumn("zkey", zorder_key16(F.col("x"), F.col("y")))
    zpath, lpath = f"{base}/z", f"{base}/linear"
    (z.repartitionByRange(N_FILES, "zkey").sortWithinPartitions("zkey")
     .write.parquet(zpath))
    (rows.repartitionByRange(N_FILES, "x").sortWithinPartitions("x")
     .write.parquet(lpath))
    return zpath, lpath


def test_zorder_prunes_on_both_dimensions(layouts):
    zpath, _ = layouts
    for col in ("x", "y"):
        bounds = _file_bounds(zpath, col)
        hit = _files_hit(bounds, 0, BAND)
        # 16 z-range files tile a ~4x4 grid over (x, y): a 1/16 band on
        # either axis intersects ~one grid row/column = ~4 files
        assert hit <= N_FILES // 2, (col, hit, bounds)


def test_linear_clustering_prunes_only_its_own_dimension(layouts):
    _, lpath = layouts
    x_hit = _files_hit(_file_bounds(lpath, "x"), 0, BAND)
    y_hit = _files_hit(_file_bounds(lpath, "y"), 0, BAND)
    assert x_hit <= 2  # x-sorted files: the band lives in ~1 file
    assert y_hit == N_FILES  # every file spans the full y domain


def test_zorder_key_bit_interleave_exact(spark):
    """Hand-checked Morton values pin the bit layout (y on odd bits)."""
    rows = [(0, 0, 0), (1, 0, 1), (0, 1, 2), (1, 1, 3),
            (3, 0, 5), (0, 3, 10), (65535, 0, 0x55555555),
            (0, 65535, 0xAAAAAAAA), (65535, 65535, 0xFFFFFFFF)]
    df = spark.createDataFrame(
        [(x, y) for x, y, _ in rows], "x long, y long"
    ).withColumn("z", zorder_key16(F.col("x"), F.col("y")))
    got = [(r.x, r.y, r.z) for r in df.collect()]
    assert sorted(got) == sorted(rows)
