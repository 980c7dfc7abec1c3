"""Catalog-surface queries: data-skipping scans, compaction, time travel.

The reference stores session state in GCS directories and re-lists them
per run (``src/api/main.py:1717-1847``, ``step0/06_directory_manager.py``);
at 100 TB the equivalent engine needs a table format that (a) plans
scans from metadata instead of file listings, (b) prunes data files by
column bounds before opening them, and (c) compacts the small files that
per-bucket/streaming commits accumulate. catalog.py implements those
three on plain parquet (no Iceberg jars in the sandbox); the queries
here put each behavior behind the driver's DuckDB oracle:

  * ``catalog_skip_scan`` — a date-range aggregate over a range-
    clustered catalog table read through ``read_table(where=...)``:
    footer-stats pruning must be semantically invisible (conservative
    superset + real filter on top), so the oracle is the plain SQL over
    the original parquet.
  * ``catalog_time_travel`` — the same rows read from the PRE-compaction
    snapshot id: compaction must never change a time-traveled result.

Both queries share one cached fixture table (two snapshots: 8-file
range-clustered overwrite, then a 2-file ``compact``), built once per
sf under .bench_cache with the same atomic tmp+rename protocol as
``registry._landed_cache``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

# bump to invalidate cached fixture tables when the layout changes
_FIXTURE_VERSION = 1

_LO, _HI = "1996-01-01", "1997-01-01"


def _fixture_table(spark: SparkSession, sf_dir: str) -> str:
    """Build-once catalog table over orders: snapshot 1 = overwrite,
    8 files range-clustered by o_orderdate (tight footer bounds =
    prunable); snapshot 2 = compact to 2 files, still date-sorted.
    Build/publish protocol shared with registry._landed_cache
    (fixture_cache.cached_fixture)."""
    from dd_ops_ocr_spark import catalog
    from dd_ops_ocr_spark.fixture_cache import cached_fixture

    name = os.path.basename(sf_dir.rstrip("/"))
    cache = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".bench_cache")
    path = os.path.join(cache, f"catalog_orders_{name}_v{_FIXTURE_VERSION}")

    def build(tmp: str) -> None:
        orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
        clustered = orders.repartitionByRange(
            8, "o_orderdate"
        ).sortWithinPartitions("o_orderdate")
        catalog.write_snapshot(clustered, tmp, operation="overwrite")
        catalog.compact(spark, tmp, num_files=2, sort_by=["o_orderdate"])

    return cached_fixture(path, build)


def _year_agg(df: DataFrame) -> DataFrame:
    """The shared aggregate: 1996 orders by priority. The real filter is
    applied HERE — file pruning only narrows what Spark opens."""
    return (
        df.filter(
            (F.col("o_orderdate") >= F.to_timestamp(F.lit(_LO)))
            & (F.col("o_orderdate") < F.to_timestamp(F.lit(_HI)))
        )
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.sum("o_orderkey").alias("sum_key"),
        )
    )


def q_catalog_skip_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-range aggregate through footer-stats file pruning: the
    ``where=`` conjuncts skip data files whose [min,max] o_orderdate
    cannot intersect 1996 (catalog.plan_scan), and the identical real
    filter runs on the survivors. Values must equal the plain full-scan
    SQL — pruning is an access-path optimization, never a semantic
    one."""
    from dd_ops_ocr_spark import catalog

    tbl = _fixture_table(spark, sf_dir)
    df = catalog.read_table(
        spark, tbl,
        where=[
            ("o_orderdate", ">=", f"{_LO}T00:00:00"),
            ("o_orderdate", "<", f"{_HI}T00:00:00"),
        ],
    )
    return _year_agg(df)


def q_catalog_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same aggregate against snapshot 1 — the PRE-compaction 8-file
    layout — read by explicit snapshot id. Compaction rewrote the
    current snapshot's files; time travel must still serve the original
    row set bit-for-bit."""
    from dd_ops_ocr_spark import catalog

    tbl = _fixture_table(spark, sf_dir)
    return _year_agg(catalog.read_table(spark, tbl, snapshot_id=1))


_ORACLE = f"""
SELECT o_orderpriority,
       COUNT(*) AS n_orders,
       CAST(SUM(o_orderkey) AS BIGINT) AS sum_key
FROM orders
WHERE o_orderdate >= TIMESTAMP '{_LO} 00:00:00'
  AND o_orderdate <  TIMESTAMP '{_HI} 00:00:00'
GROUP BY o_orderpriority
"""

QUERIES = {
    "catalog_skip_scan": q_catalog_skip_scan,
    "catalog_time_travel": q_catalog_time_travel,
}
ORACLE_SQL = {
    "catalog_skip_scan": _ORACLE,
    "catalog_time_travel": _ORACLE,
}
