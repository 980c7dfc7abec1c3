"""Bucketed tables: prove the co-located join claim against the real
physical plan — two tables bucketBy'd on the join key must SortMergeJoin
with NO exchange and NO sort on either input, where the same join over
plain parquet shuffles both sides."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_SMOKE


@pytest.fixture()
def no_broadcast(spark):
    """Force SMJ so the bucketing effect is visible (AQE would broadcast
    the tiny test dim and sidestep the layout entirely)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def _join_plan(spark, orders, customer) -> str:
    j = orders.join(customer, orders.o_custkey == customer.c_custkey)
    return j._jdf.queryExecution().executedPlan().toString()


def test_bucketed_join_is_exchange_free(spark, no_broadcast):
    """No Exchange on either side — the buckets ARE the partitioning,
    so the corpus never crosses the wire. A LOCAL Sort node remains:
    since SPARK-28632 the scan does not report the sortBy ordering by
    default (multi-file-bucket safety), so Spark re-sorts each bucket
    in place — linear, shuffle-free, and irrelevant next to the two
    eliminated corpus shuffles (the legacy bucketedTableScan
    .outputOrdering conf restores sort elimination when every bucket
    is one file, as these are)."""
    from dd_ops_ocr_spark.operators.catalogops import _bucketed_pair

    ot, ct = _bucketed_pair(spark, SF_SMOKE)
    plan = _join_plan(spark, spark.table(ot), spark.table(ct))
    assert "SortMergeJoin" in plan
    assert "Exchange" not in plan       # buckets ARE the partitioning
    assert "Bucketed: true" in plan


def test_plain_parquet_join_shuffles_both_sides(spark, no_broadcast):
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    plan = _join_plan(spark, o, c)
    assert "SortMergeJoin" in plan
    assert plan.count("Exchange") >= 2  # both sides shuffle


def test_bucketed_enrich_matches_plain_join(spark):
    """The layout must never change values: bucketed-table aggregation
    equals the plain-parquet aggregation row for row."""
    from dd_ops_ocr_spark.operators.catalogops import (
        _bucketed_pair,
        bucketed_enrich,
    )

    ot, ct = _bucketed_pair(spark, SF_SMOKE)
    got = {r.segment: (r.n_orders, r.sum_cents)
           for r in bucketed_enrich(spark.table(ot),
                                    spark.table(ct)).collect()}
    o = spark.read.parquet(f"{SF_SMOKE}/orders.parquet")
    c = spark.read.parquet(f"{SF_SMOKE}/customer.parquet")
    want = {r.segment: (r.n_orders, r.sum_cents)
            for r in bucketed_enrich(o, c).collect()}
    assert got == want and len(got) > 0


def test_bucket_pruning_point_lookup(spark, no_broadcast):
    """A point predicate on the bucket key must open ~1/k of the files:
    the scan reports SelectedBucketsCount 1 out of k — the secondary-
    index-free point lookup bucketing buys."""
    from dd_ops_ocr_spark.operators.catalogops import _BUCKETS, _bucketed_pair

    ot, _ = _bucketed_pair(spark, SF_SMOKE)
    o = spark.table(ot)
    key = o.select(F.min("o_custkey")).first()[0]
    # autoBucketedScan drops the bucketed layout when no operator needs
    # the distribution — a bare filter qualifies, so pin it on to show
    # the pruning the layout enables
    conf = "spark.sql.sources.bucketing.autoBucketedScan.enabled"
    old = spark.conf.get(conf)
    try:
        spark.conf.set(conf, "false")
        q = o.filter(F.col("o_custkey") == key)
        plan = q._jdf.queryExecution().executedPlan().toString()
        assert f"SelectedBucketsCount: 1 out of {_BUCKETS}" in plan
        assert q.count() > 0
    finally:
        spark.conf.set(conf, old)
