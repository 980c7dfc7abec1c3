"""Catalog change-feed streaming source (operators/catalogsource.py):
snapshot-id offsets, added-files-only batches, schema stability across
evolution, compact/delete silence, exactly-once restart."""

from __future__ import annotations

import shutil
import tempfile

import pandas as pd
import pytest
from pyspark.sql import functions as F

from dd_ops_ocr_spark import catalog
from dd_ops_ocr_spark.operators import catalogsource as cs


def _run_feed(spark, table, ckpt):
    batches = []
    q = (
        spark.readStream.format("ddops_catalog").load(table)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _eid: batches.append(df.toPandas()))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = [b for b in batches if len(b)]
    return pd.concat(out) if out else pd.DataFrame()


def test_change_feed_emits_appends_once(spark, tmp_path):
    cs.ensure_registered(spark)
    table, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ck")
    catalog.write_snapshot(
        spark.range(5).withColumn("grp", F.col("id") % 2),
        table, operation="overwrite",
    )
    got1 = _run_feed(spark, table, ckpt)
    assert sorted(got1.id) == list(range(5))
    # append -> only the new rows form the next batch
    catalog.write_snapshot(
        spark.range(5, 8).withColumn("grp", F.lit(9).cast("long")),
        table, operation="append",
    )
    got2 = _run_feed(spark, table, ckpt)
    assert sorted(got2.id) == [5, 6, 7]
    # nothing new -> empty batch, no replay
    assert len(_run_feed(spark, table, ckpt)) == 0


def test_compact_and_delete_are_silent_upsert_emits_updates(
    spark, tmp_path
):
    cs.ensure_registered(spark)
    table, ckpt = str(tmp_path / "tbl"), str(tmp_path / "ck")
    catalog.write_snapshot(
        spark.range(10).withColumn("grp", F.col("id") % 2),
        table, operation="overwrite",
    )
    _run_feed(spark, table, ckpt)  # consume the initial rows
    catalog.delete_where(spark, table, "id = 3")
    catalog.compact(spark, table, num_files=1)
    assert len(_run_feed(spark, table, ckpt)) == 0  # no inserts happened
    catalog.upsert(
        spark, table,
        spark.createDataFrame([(4, 44)], "id long, grp long"), keys=["id"],
    )
    got = _run_feed(spark, table, ckpt)
    assert [(r.id, r.grp) for r in got.itertuples()] == [(4, 44)]


def test_feed_schema_across_evolution(spark, tmp_path):
    """Each query RUN resolves the feed schema from the current
    manifest: a restart after an add-column evolution adopts the
    evolved schema (reading only the new offsets), and a fresh
    subscription replays history with pre-evolution batches
    NULL-filled in the added column."""
    cs.ensure_registered(spark)
    table = str(tmp_path / "tbl")
    ck1, ck2 = str(tmp_path / "ck1"), str(tmp_path / "ck2")
    catalog.write_snapshot(
        spark.range(3).withColumn("grp", F.col("id") % 2),
        table, operation="overwrite",
    )
    got1 = _run_feed(spark, table, ck1)
    assert list(got1.columns) == ["id", "grp"]
    catalog.write_snapshot(
        spark.createDataFrame([(7, 0, "n")], "id long, grp long, note string"),
        table, operation="append",
    )
    got2 = _run_feed(spark, table, ck1)  # restart: evolved schema
    assert list(got2.columns) == ["id", "grp", "note"]
    assert sorted(got2.id) == [7]
    fresh = _run_feed(spark, table, ck2)  # full replay, NULL-filled
    assert list(fresh.columns) == ["id", "grp", "note"]
    notes = {r.id: r.note for r in fresh.itertuples()}
    assert notes[7] == "n" and notes[0] is None


def test_batch_read_refuses_with_guidance(spark, tmp_path):
    cs.ensure_registered(spark)
    table = str(tmp_path / "tbl")
    catalog.write_snapshot(spark.range(3), table, operation="overwrite")
    with pytest.raises(Exception, match="read_table"):
        spark.read.format("ddops_catalog").load(table).count()


def test_cdc_sink_to_change_feed_roundtrip(spark, tmp_path):
    """End-to-end incremental loop: a CDC stream lands in the catalog
    via stream_upsert_sink (atomic MERGE per epoch), and a downstream
    change-feed subscription receives exactly the rows each upsert
    APPENDED — the update images, never replays of the base table."""
    import glob
    import shutil as sh

    from dd_ops_ocr_spark.streaming.jobs import stream_upsert_sink

    land = str(tmp_path / "land")
    table = str(tmp_path / "tbl")
    ck_in, ck_out = str(tmp_path / "ck_in"), str(tmp_path / "ck_out")
    schema = "id long, val string, seq long"
    import os

    os.makedirs(land)

    def write_file(name, rows):
        df = spark.createDataFrame(rows, schema).coalesce(1)
        tmp = f"{land}/_tmp"
        df.write.mode("overwrite").parquet(tmp)
        sh.copy(glob.glob(f"{tmp}/part-*.parquet")[0],
                f"{land}/{name}.parquet")
        sh.rmtree(tmp)

    cs.ensure_registered(spark)
    write_file("f1", [(1, "a", 1), (2, "b", 1)])
    stream_upsert_sink(
        spark, land, ck_in, table, keys=["id"], schema=schema
    ).awaitTermination(120)
    got1 = _run_feed(spark, table, ck_out)
    assert sorted(got1.id) == [1, 2]
    # second CDC epoch: one update, one insert -> the feed sees exactly
    # those two change rows
    write_file("f2", [(2, "b2", 2), (3, "c", 2)])
    stream_upsert_sink(
        spark, land, ck_in, table, keys=["id"], schema=schema
    ).awaitTermination(120)
    got2 = _run_feed(spark, table, ck_out)
    assert sorted((r.id, r.val) for r in got2.itertuples()) == [
        (2, "b2"), (3, "c")
    ]
    # the table itself converged to last-write-wins
    vals = {r.id: r.val
            for r in catalog.read_table(spark, table).collect()}
    assert vals == {1: "a", 2: "b2", 3: "c"}


def _run_feed_opts(spark, table, ckpt, **opts):
    batches = []
    reader = spark.readStream.format("ddops_catalog")
    for k, v in opts.items():
        reader = reader.option(k, v)
    q = (
        reader.load(table)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _eid: batches.append(df.toPandas()))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = [b for b in batches if len(b)]
    return pd.concat(out) if out else pd.DataFrame()


def test_feed_survives_expire_snapshots(spark, tmp_path):
    """A table maintained with expire_snapshots must not permanently
    brick the change feed. Default: hitting an expired snapshot raises
    with recovery guidance. starting_snapshot='earliest': a fresh
    subscriber backfills the oldest SURVIVING snapshot's full state
    (its parent manifest is gone, so the full file list IS the delta)
    and then follows new commits. allow_data_loss: expired snapshots
    are skipped."""
    cs.ensure_registered(spark)
    table = str(tmp_path / "tbl")
    catalog.write_snapshot(spark.range(3).selectExpr("id"), table,
                           operation="overwrite")
    catalog.write_snapshot(spark.range(3, 6).selectExpr("id"), table,
                           operation="append")
    catalog.write_snapshot(spark.range(6, 9).selectExpr("id"), table,
                           operation="append")
    catalog.expire_snapshots(table, keep_last=1)

    # default from snapshot 0: loud, actionable failure
    with pytest.raises(Exception, match="expired"):
        _run_feed_opts(spark, table, str(tmp_path / "ck_fail"))

    # earliest: backfill = the surviving snapshot's complete row set
    got = _run_feed_opts(spark, table, str(tmp_path / "ck_early"),
                         starting_snapshot="earliest")
    assert sorted(got["id"]) == list(range(9))

    # and the same subscription keeps receiving NEW commits incrementally
    catalog.write_snapshot(spark.range(9, 11).selectExpr("id"), table,
                           operation="append")
    inc = _run_feed_opts(spark, table, str(tmp_path / "ck_early"),
                         starting_snapshot="earliest")
    assert sorted(inc["id"]) == [9, 10]

    # allow_data_loss from 0: expired snapshots skipped, survivors emit
    got2 = _run_feed_opts(spark, table, str(tmp_path / "ck_adl"),
                          allow_data_loss="true")
    assert sorted(got2["id"]) == list(range(11))

    # latest: future changes only
    got3 = _run_feed_opts(spark, table, str(tmp_path / "ck_latest"),
                          starting_snapshot="latest")
    assert len(got3) == 0
    catalog.write_snapshot(spark.range(11, 12).selectExpr("id"), table,
                           operation="append")
    got4 = _run_feed_opts(spark, table, str(tmp_path / "ck_latest"),
                          starting_snapshot="latest")
    assert sorted(got4["id"]) == [11]
