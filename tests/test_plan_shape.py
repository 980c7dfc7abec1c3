"""Physical-plan regressions: the plans we shipped are the plans we keep.

A correctness-preserving edit that silently adds an exchange to the
flagship, drops the broadcast from the dim join, or stops pushing filters
into the scan is a scale regression — catch it here, not in round N's
bench."""

from __future__ import annotations

from dd_ops_ocr_spark import corpus, pipeline
from tests.conftest import SF_SMOKE


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_flagship_plan_is_shuffle_free_and_pruned(spark):
    """Extraction over a materialized spans table (the deployment shape —
    the corpus generator's repartition is input prep, not extraction)."""
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        corpus.build_spans_df(spark, SF_SMOKE).limit(20).write.parquet(f"{d}/s")
        df = spark.read.parquet(f"{d}/s")
        plan = _plan(pipeline.extract(df))
        assert "Exchange" not in plan, f"flagship grew a shuffle:\n{plan[:2000]}"
        assert "ReadSchema" in plan
        # the scan must read exactly the two needed columns
        scan_line = next(l for l in plan.splitlines() if "FileScan" in l)
        assert "doc_id" in scan_line and "spans" in scan_line


def test_dim_join_broadcasts(spark):
    from dd_ops_ocr_spark.operators.joins import q_dim_enrich_join

    plan = _plan(q_dim_enrich_join(spark, SF_SMOKE))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_filters_push_to_scan(spark):
    from dd_ops_ocr_spark.operators.joins import q_success_filter

    plan = _plan(q_success_filter(spark, SF_SMOKE))
    scan_line = next(l for l in plan.splitlines() if "FileScan" in l)
    assert "n_chars" in scan_line, "filter did not reach the scan"
