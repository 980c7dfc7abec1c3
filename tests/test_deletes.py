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


def test_upsert_replaces_by_key_atomically(spark, table):
    """One snapshot = equality-delete incoming keys + append new rows.
    Updated keys show the NEW values (the upsert's own rows survive
    the delete via sequence scoping); untouched keys are intact."""
    up = spark.createDataFrame(
        [(5, 500), (6, 600), (200, 200)], "id long, grp long"
    )
    sid = catalog.upsert(spark, table, up, keys=["id"])
    m = catalog._read_manifest(table, sid)
    assert m["operation"] == "upsert"
    assert len(m["eq_delete_files"]) == 1
    name, cols, seq = m["eq_delete_files"][0]
    assert cols == ["id"] and seq == sid
    got = {r.id: r.grp for r in catalog.read_table(spark, table).collect()}
    assert len(got) == 101  # 100 originals - 2 replaced + 3 (one new)
    assert got[5] == 500 and got[6] == 600 and got[200] == 200
    assert got[7] == 7 % 10  # untouched


def test_upsert_then_append_same_key_survives(spark, table):
    """Sequence scoping: rows appended AFTER an upsert carry the same
    key and must NOT be masked by the earlier equality delete."""
    catalog.upsert(
        spark, table,
        spark.createDataFrame([(5, 555)], "id long, grp long"), keys=["id"]
    )
    catalog.write_snapshot(
        spark.createDataFrame([(5, 999)], "id long, grp long"),
        table, operation="append",
    )
    grps = sorted(
        r.grp for r in catalog.read_table(spark, table)
        .filter("id = 5").collect()
    )
    assert grps == [555, 999]


def test_upsert_stacks_with_positional_delete_and_compacts(spark, table):
    catalog.delete_where(spark, table, "id < 10")
    catalog.upsert(
        spark, table,
        spark.createDataFrame([(50, 5050)], "id long, grp long"),
        keys=["id"],
    )
    want = {r.id: r.grp for r in catalog.read_table(spark, table).collect()}
    assert 0 not in want and want[50] == 5050 and len(want) == 90
    catalog.compact(spark, table, num_files=2)
    m = catalog._read_manifest(table, catalog.current_snapshot_id(table))
    assert m["delete_files"] == [] and m["eq_delete_files"] == []
    got = {r.id: r.grp for r in catalog.read_table(spark, table).collect()}
    assert got == want


def test_upsert_into_empty_table_is_first_snapshot(spark):
    d = tempfile.mkdtemp(prefix="cat_ups_empty_")
    try:
        sid = catalog.upsert(
            spark, d,
            spark.createDataFrame([(1, 10)], "id long, grp long"),
            keys=["id"],
        )
        m = catalog._read_manifest(d, sid)
        assert m["eq_delete_files"] == []
        assert [tuple(r) for r in
                catalog.read_table(spark, d).collect()] == [(1, 10)]
        # the staged-but-unreferenced key file was reclaimed
        data = os.path.join(d, "data")
        assert sorted(os.listdir(data)) == sorted(m["files"])
    finally:
        shutil.rmtree(d, ignore_errors=True)


def test_time_travel_predates_upsert(spark, table):
    base = catalog.current_snapshot_id(table)
    catalog.upsert(
        spark, table,
        spark.createDataFrame([(5, 555)], "id long, grp long"), keys=["id"]
    )
    old = {r.id: r.grp
           for r in catalog.read_table(spark, table,
                                       snapshot_id=base).collect()}
    assert old[5] == 5 % 10 and len(old) == 100


def test_schema_evolution_add_column_on_append(spark, table):
    """Appending data with an extra column evolves the manifest schema
    (parent union new); old files read the new column as NULL, the
    pre-evolution snapshot keeps the old schema, and a same-name
    different-type append is refused."""
    base = catalog.current_snapshot_id(table)
    extra = spark.createDataFrame(
        [(100, 0, "hello")], "id long, grp long, note string"
    )
    catalog.write_snapshot(extra, table, operation="append")
    cur = catalog.read_table(spark, table)
    assert cur.columns == ["id", "grp", "note"]
    notes = {r.id: r.note for r in cur.filter("id in (0, 100)").collect()}
    assert notes == {0: None, 100: "hello"}
    # time travel: the old snapshot never grew the column
    old = catalog.read_table(spark, table, snapshot_id=base)
    assert old.columns == ["id", "grp"]
    # type conflict refused
    bad = spark.createDataFrame([(1, "x")], "id long, grp string")
    with pytest.raises(ValueError, match="schema evolution conflict"):
        catalog.write_snapshot(bad, table, operation="append")


def test_schema_evolution_through_upsert_and_delete(spark, table):
    """Upserts union schemas too, and delete_where predicates can
    reference an evolved column (NULL on pre-evolution files)."""
    catalog.upsert(
        spark, table,
        spark.createDataFrame(
            [(5, 50, "v2")], "id long, grp long, tag string"
        ),
        keys=["id"],
    )
    got = {r.id: (r.grp, r.tag)
           for r in catalog.read_table(spark, table)
           .filter("id in (4, 5)").collect()}
    assert got == {4: (4, None), 5: (50, "v2")}
    catalog.delete_where(spark, table, "tag = 'v2'")
    assert 5 not in {r.id for r in
                     catalog.read_table(spark, table).collect()}


def test_delete_where_skips_rows_masked_by_upsert(spark, table):
    """Rows replaced by an upsert's equality delete are invisible to
    readers — delete_where must not find them either: re-counting a
    masked row double-reports deleted_rows and commits a snapshot for
    rows nobody could see."""
    new = spark.createDataFrame([(7, 99)], "id long, grp long")
    catalog.upsert(spark, table, new, keys=["id"])
    # one LIVE row has id=7 (the upserted one); the original is masked
    sid = catalog.delete_where(spark, table, "id = 7")
    m = catalog._read_manifest(table, sid)
    assert m["properties"]["deleted_rows"] == 1  # not 2
    assert 7 not in _ids(spark, table)

    # deleting rows that are ALL already masked commits nothing
    cur = catalog.current_snapshot_id(table)
    assert catalog.delete_where(spark, table, "id = 7") == cur


def test_schema_evolution_tolerates_container_nullability(spark):
    """array<string> containsNull=False (a collect_list result) vs
    containsNull=True (the same data read back from parquet) is the
    same logical type — the append must succeed, not raise a
    'conflict' between two identical simpleStrings. A REAL element-type
    change still raises."""
    d = tempfile.mkdtemp(prefix="cat_nul_")
    try:
        base = spark.range(5).groupBy((F.col("id") % 2).alias("k")).agg(
            F.collect_list(F.col("id").cast("string")).alias("tags")
        )
        assert not base.schema["tags"].dataType.containsNull
        catalog.write_snapshot(base, d, "overwrite")
        roundtrip = catalog.read_table(spark, d)  # parquet: containsNull=True
        assert roundtrip.schema["tags"].dataType.containsNull
        catalog.write_snapshot(roundtrip, d, "append")
        assert catalog.read_table(spark, d).count() == 4

        bad = spark.range(2).select(
            F.col("id").alias("k"),
            F.array(F.col("id")).alias("tags"),  # array<bigint>: real change
        )
        with pytest.raises(ValueError, match="schema evolution conflict"):
            catalog.write_snapshot(bad, d, "append")
    finally:
        shutil.rmtree(d, ignore_errors=True)
