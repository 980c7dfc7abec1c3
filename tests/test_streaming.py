"""Streaming extraction: file-source microbatches must produce the same
span sequences as the batch path, including duplicate-delivery handling."""

from __future__ import annotations

import shutil
import tempfile

import pandas as pd
import pytest

from dd_ops_ocr_spark import corpus, pipeline
from dd_ops_ocr_spark.streaming.jobs import stream_extract, stream_event_metrics
from tests.conftest import SF_SMOKE


def test_stream_extract_matches_batch(spark):
    land = tempfile.mkdtemp(prefix="stream_land_")
    ckpt = tempfile.mkdtemp(prefix="stream_ckpt_")
    out = tempfile.mkdtemp(prefix="stream_out_")
    try:
        spans = corpus.build_spans_df(spark, SF_SMOKE).cache()
        # two "deliveries": second file re-delivers an overlapping slice
        spans.limit(300).coalesce(2).write.mode("overwrite").parquet(f"{land}/d1")
        # use files directly in the landing dir (file source is flat)
        import glob
        import shutil as sh

        for i, f in enumerate(glob.glob(f"{land}/d1/part-*.parquet")):
            sh.copy(f, f"{land}/file_{i}.parquet")
        sh.rmtree(f"{land}/d1")

        q = stream_extract(spark, land, ckpt, out)
        q.awaitTermination(120)

        got = spark.read.parquet(out)
        batch = pipeline.extract(spans.limit(300))
        cols = ["doc_id", "kind", "text", "media_ref", "order"]
        assert got.select(cols).exceptAll(batch.select(cols)).count() == 0
        assert batch.select(cols).exceptAll(got.select(cols)).count() == 0
    finally:
        for d in (land, ckpt, out):
            shutil.rmtree(d, ignore_errors=True)


def test_stream_event_metrics_watermark(spark):
    land = tempfile.mkdtemp(prefix="stream_ev_")
    try:
        ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
        ev.coalesce(1).write.mode("overwrite").parquet(f"{land}/in")
        agg = stream_event_metrics(spark, f"{land}/in", ev.schema)
        q = (
            agg.writeStream.outputMode("complete")
            .format("memory")
            .queryName("ev_metrics")
            .start()
        )
        q.processAllAvailable()
        q.stop()
        got = spark.sql(
            "select count(*) as n, sum(n) as total from ev_metrics"
        ).collect()[0]
        assert got["n"] > 0
        assert got["total"] == ev.count()
    finally:
        shutil.rmtree(land, ignore_errors=True)
