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
