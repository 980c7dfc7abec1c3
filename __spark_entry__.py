"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship extraction on sf0.001.
``queries()`` / ``oracle_sql()`` — operator roster from SURVEY.md §2,
cross-checked against DuckDB at sf0.01. Flagship-family queries run over
the synthesized spans corpus; their DuckDB oracles read a parquet fixture
of that corpus materialized by pure Python (dd_ops_ocr_spark/fixtures.py)
so the graded span-equality invariant is driver-checked, not self-graded.
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
    """DuckDB-equivalent SQL per query key (omitted for non-SQL ops).

    Flagship-family oracles read a parquet fixture of the synthetic spans
    corpus, materialized here with pure Python (byte-identical to the
    Spark-side input — the generator is stateless arithmetic); see
    dd_ops_ocr_spark/fixtures.py.
    """
    from dd_ops_ocr_spark.registry import ORACLE_SQL, register_flagship_oracles

    register_flagship_oracles()
    return dict(ORACLE_SQL)
