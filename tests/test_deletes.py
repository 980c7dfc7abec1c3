"""Merge-on-read positional deletes (catalog.delete_where): mask
semantics, time travel, append/compact/expire interactions."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest

from dd_ops_ocr_spark import catalog
from pyspark.sql import functions as F


@pytest.fixture()
def table(spark):
    d = tempfile.mkdtemp(prefix="cat_del_")
    df = spark.range(100).withColumn("grp", F.col("id") % 10)
    catalog.write_snapshot(df.repartition(4), d, operation="overwrite")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def _ids(spark, d, **kw):
    return sorted(
        r.id for r in catalog.read_table(spark, d, **kw).collect()
    )


def test_delete_masks_without_rewriting_data(spark, table):
    m0 = catalog._read_manifest(table, catalog.current_snapshot_id(table))
    sid = catalog.delete_where(spark, table, "id % 3 = 0")
    m1 = catalog._read_manifest(table, sid)
    assert m1["operation"] == "delete"
    assert m1["files"] == m0["files"]  # data untouched
    assert m1["delete_files"] and m1["properties"]["deleted_rows"] == 34
    assert _ids(spark, table) == [i for i in range(100) if i % 3 != 0]
    # pruned reads apply the mask too
    sub = catalog.read_table(spark, table, where=[("id", ">=", 0)])
    assert sorted(r.id for r in sub.collect()) == _ids(spark, table)


def test_time_travel_predates_delete(spark, table):
    base = catalog.current_snapshot_id(table)
    catalog.delete_where(spark, table, "id < 50")
    assert len(_ids(spark, table)) == 50
    assert _ids(spark, table, snapshot_id=base) == list(range(100))


def test_redelete_is_noop_and_deletes_union(spark, table):
    s1 = catalog.delete_where(spark, table, "id % 3 = 0")
    # same predicate again: everything already masked -> no new snapshot
    assert catalog.delete_where(spark, table, "id % 3 = 0") == s1
    s2 = catalog.delete_where(spark, table, "id % 5 = 1")
    m = catalog._read_manifest(table, s2)
    assert len(m["delete_files"]) == 2  # masks union
    assert _ids(spark, table) == [
        i for i in range(100) if i % 3 != 0 and i % 5 != 1
    ]


def test_append_carries_deletes(spark, table):
    catalog.delete_where(spark, table, "id < 10")
    extra = spark.range(100, 110).withColumn("grp", F.col("id") % 10)
    catalog.write_snapshot(extra, table, operation="append")
    assert _ids(spark, table) == list(range(10, 110))


def test_compact_purges_deletes_and_expire_reclaims(spark, table):
    catalog.delete_where(spark, table, "id % 2 = 0")
    want = _ids(spark, table)
    del_files = catalog._read_manifest(
        table, catalog.current_snapshot_id(table)
    )["delete_files"]
    assert del_files
    catalog.compact(spark, table, num_files=2)
    m = catalog._read_manifest(table, catalog.current_snapshot_id(table))
    assert m["delete_files"] == []  # rewrite folded the mask in
    assert _ids(spark, table) == want
    # pre-compact snapshots expired -> their delete files are reclaimed
    catalog.expire_snapshots(table, keep_last=1)
    data = os.path.join(table, "data")
    for f in del_files:
        assert not os.path.exists(os.path.join(data, f))


def test_expire_keeps_referenced_delete_files(spark, table):
    catalog.delete_where(spark, table, "id = 7")
    catalog.expire_snapshots(table, keep_last=1)
    m = catalog._read_manifest(table, catalog.current_snapshot_id(table))
    data = os.path.join(table, "data")
    for f in m["delete_files"]:
        assert os.path.exists(os.path.join(data, f))
    assert 7 not in _ids(spark, table)
    assert len(_ids(spark, table)) == 99


def test_delete_column_name_collision(spark):
    """A table with its own (file, pos) columns must not break the
    positional machinery."""
    d = tempfile.mkdtemp(prefix="cat_del_coll_")
    try:
        df = spark.range(20).select(
            F.col("id"),
            F.concat(F.lit("f"), F.col("id")).alias("file"),
            (F.col("id") * 2).alias("pos"),
        )
        catalog.write_snapshot(df.repartition(2), d, operation="overwrite")
        catalog.delete_where(spark, d, "pos >= 20")
        got = catalog.read_table(spark, d)
        assert sorted(r.id for r in got.collect()) == list(range(10))
        assert set(got.columns) == {"id", "file", "pos"}
    finally:
        shutil.rmtree(d, ignore_errors=True)
