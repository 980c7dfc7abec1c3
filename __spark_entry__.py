"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship extraction on sf0.001.
``queries()`` / ``oracle_sql()`` — operator roster from SURVEY.md §2,
cross-checked against DuckDB at sf0.01. Flagship-family queries whose
inputs are the synthesized spans table have no SQL oracle (the generator is
seeded Python) and are covered instead by the pytest span-equality suite
(tests/test_flagship.py) — the driver records a rows-only check for those.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_SMOKE = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from dd_ops_ocr_spark import corpus, pipeline

    spans_df = corpus.build_spans_df(spark, SF_SMOKE)
    return pipeline.extract(spans_df)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from dd_ops_ocr_spark.registry import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL per query key (omitted for non-SQL ops)."""
    from dd_ops_ocr_spark.registry import ORACLE_SQL

    return dict(ORACLE_SQL)
