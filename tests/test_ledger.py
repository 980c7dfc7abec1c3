"""Resume-partition-exactly: kill after k buckets, rerun, output must be
identical to an uninterrupted run and only the missing buckets reprocess."""

from __future__ import annotations

import shutil
import tempfile

import pytest

from dd_ops_ocr_spark import corpus, ledger
from tests.conftest import SF_SMOKE

N_BUCKETS = 8


@pytest.fixture()
def spans(spark):
    return corpus.build_spans_df(spark, SF_SMOKE).cache()


def test_crash_and_resume_exact(spark, spans):
    full_dir = tempfile.mkdtemp(prefix="ledger_full_")
    crash_dir = tempfile.mkdtemp(prefix="ledger_crash_")
    try:
        ledger.run_with_ledger(spark, spans, full_dir, "run_full",
                               n_buckets=N_BUCKETS)

        with pytest.raises(RuntimeError, match="injected failure"):
            ledger.run_with_ledger(spark, spans, crash_dir, "run_a",
                                   n_buckets=N_BUCKETS, fail_after=3)
        assert len(ledger.committed_buckets(spark, crash_dir)) == 3

        summary = ledger.run_with_ledger(spark, spans, crash_dir, "run_b",
                                         n_buckets=N_BUCKETS)
        assert summary["buckets_resumed_from"] == 3
        assert summary["buckets_processed"] == N_BUCKETS - 3

        a = ledger.read_output(spark, full_dir)
        b = ledger.read_output(spark, crash_dir)
        assert a.count() == b.count()
        cols = ["doc_id", "kind", "text", "media_ref", "order"]
        assert (
            a.select(cols).exceptAll(b.select(cols)).count() == 0
            and b.select(cols).exceptAll(a.select(cols)).count() == 0
        )

        led = ledger.read_ledger(spark, crash_dir).toPandas()
        assert len(led) == N_BUCKETS
        assert set(led[led.committed_at_run == "run_a"].bucket) == set(range(3)) or \
            len(led[led.committed_at_run == "run_a"]) == 3
        assert led["spans_emitted"].sum() == a.count()
    finally:
        shutil.rmtree(full_dir, ignore_errors=True)
        shutil.rmtree(crash_dir, ignore_errors=True)


def test_one_pass_crash_then_loop_resume(spark, spans):
    """One-pass writes all data in a single job; a crash in the marker
    window (data written, markers partial) must resume cleanly on EITHER
    path and end identical to an uninterrupted loop run — the two ledger
    variants compose."""
    full_dir = tempfile.mkdtemp(prefix="ledger_full1_")
    op_dir = tempfile.mkdtemp(prefix="ledger_op_")
    op2_dir = tempfile.mkdtemp(prefix="ledger_op2_")
    try:
        ledger.run_with_ledger(spark, spans, full_dir, "run_full",
                               n_buckets=N_BUCKETS)

        # one-pass, crash after 3 markers -> resume with the bucket LOOP
        with pytest.raises(RuntimeError, match="injected failure"):
            ledger.run_one_pass(spark, spans, op_dir, "run_a",
                                n_buckets=N_BUCKETS, fail_after=3)
        assert len(ledger.committed_buckets(spark, op_dir)) == 3
        s = ledger.run_with_ledger(spark, spans, op_dir, "run_b",
                                   n_buckets=N_BUCKETS)
        assert s["buckets_resumed_from"] == 3

        # loop, crash after 2 -> resume with ONE-PASS
        with pytest.raises(RuntimeError, match="injected failure"):
            ledger.run_with_ledger(spark, spans, op2_dir, "run_c",
                                   n_buckets=N_BUCKETS, fail_after=2)
        s = ledger.run_one_pass(spark, spans, op2_dir, "run_d",
                                n_buckets=N_BUCKETS)
        assert s["buckets_resumed_from"] == 2
        assert s["buckets_processed"] == N_BUCKETS - 2

        a = ledger.read_output(spark, full_dir)
        cols = ["doc_id", "kind", "text", "media_ref", "order"]
        for d in (op_dir, op2_dir):
            b = ledger.read_output(spark, d)
            assert a.count() == b.count()
            assert (
                a.select(cols).exceptAll(b.select(cols)).count() == 0
                and b.select(cols).exceptAll(a.select(cols)).count() == 0
            )
            led = ledger.read_ledger(spark, d).toPandas()
            assert len(led) == N_BUCKETS
            assert led["spans_emitted"].sum() == a.count()
    finally:
        for d in (full_dir, op_dir, op2_dir):
            shutil.rmtree(d, ignore_errors=True)


def test_bucket_assignment_deterministic(spark, spans):
    b1 = spans.select("doc_id", ledger.bucket_col(N_BUCKETS).alias("b"))
    b2 = spans.select("doc_id", ledger.bucket_col(N_BUCKETS).alias("b"))
    assert b1.exceptAll(b2).count() == 0
    n = b1.select("b").distinct().count()
    assert n == N_BUCKETS


def test_one_pass_crash_before_any_marker(spark, spans):
    """Worst crash window: data fully written, zero markers — the resume
    must reprocess everything and converge to the uninterrupted result."""
    d = tempfile.mkdtemp(prefix="ledger_zero_")
    ref = tempfile.mkdtemp(prefix="ledger_zref_")
    try:
        ledger.run_one_pass(spark, spans, ref, "run_ref", n_buckets=N_BUCKETS)
        with pytest.raises(RuntimeError, match="injected failure"):
            ledger.run_one_pass(spark, spans, d, "run_x",
                                n_buckets=N_BUCKETS, fail_after=0)
        assert ledger.committed_buckets(spark, d) == set()
        s = ledger.run_one_pass(spark, spans, d, "run_y", n_buckets=N_BUCKETS)
        assert s["buckets_processed"] == N_BUCKETS
        a = ledger.read_output(spark, ref)
        b = ledger.read_output(spark, d)
        cols = ["doc_id", "kind", "text", "media_ref", "order"]
        assert a.count() == b.count()
        assert a.select(cols).exceptAll(b.select(cols)).count() == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)
        shutil.rmtree(ref, ignore_errors=True)


def test_parquet_nonempty_uri_scheme(spark, tmp_path):
    """ADVICE r4: _parquet_nonempty on a URI path must go through the
    Hadoop FileSystem API, not os.walk (which silently yields nothing for
    'scheme://...' strings and would downgrade every remote bucket to a
    zero-count marker). Exercised via file:// — same code path as
    hdfs://s3a://, resolvable in the sandbox."""
    from dd_ops_ocr_spark.ledger import _hadoop_parquet_nonempty, _parquet_nonempty

    d = tmp_path / "data"
    spark.range(5).write.mode("overwrite").parquet(str(d))
    assert _parquet_nonempty(str(d))                       # local walk
    assert _parquet_nonempty(f"file://{d}")                # URI -> Hadoop FS
    assert _hadoop_parquet_nonempty(f"file://{d}")
    empty = tmp_path / "empty"
    empty.mkdir()
    assert not _parquet_nonempty(f"file://{empty}")
    assert not _hadoop_parquet_nonempty(f"file://{tmp_path}/missing")


def test_observed_lineage_single_pass_and_docs_invariant(spark, spans):
    """The commit markers' metrics now come from df.observe on the
    write pass itself. Two claims pinned here: (1) the extraction runs
    ONCE per bucket (the old snapshot path ran it twice — once for
    .agg().collect(), once for the write); (2) the observe-compatible
    docs metric (rows with order == 0) equals countDistinct(doc_id)."""
    from dd_ops_ocr_spark import pipeline
    from pyspark.sql import functions as F

    acc = spark.sparkContext.accumulator(0)

    def counting_extractor(df):
        out = pipeline.extract(df)

        def bump(batches):
            for pdf in batches:
                acc.add(len(pdf))
                yield pdf

        return out.mapInPandas(bump, out.schema)

    out_dir = tempfile.mkdtemp(prefix="ledger_obs_")
    try:
        ledger.run_with_ledger(spark, spans, out_dir, "run_obs",
                               n_buckets=4,
                               extractor=counting_extractor)
        written = spark.read.parquet(f"{out_dir}/data")
        total_rows = written.count()
        # single pass: every output row crossed the kernel exactly once
        assert acc.value == total_rows
        # marker metrics equal an independent recompute per bucket
        markers = spark.read.parquet(f"{out_dir}/ledger").toPandas()
        recompute = (
            written.groupBy("bucket")
            .agg(F.countDistinct("doc_id").alias("docs"),
                 F.count("*").alias("spans_emitted"))
            .toPandas().set_index("bucket")
        )
        got = markers.set_index("bucket")[["docs", "spans_emitted"]]
        for b in recompute.index:
            assert got.loc[b, "docs"] == recompute.loc[b, "docs"]
            assert (got.loc[b, "spans_emitted"]
                    == recompute.loc[b, "spans_emitted"])
    finally:
        shutil.rmtree(out_dir, ignore_errors=True)


def test_committed_buckets_survives_torn_first_marker(spark, tmp_path):
    """A crash during the very FIRST ledger write leaves the ledger dir
    with only uncommitted litter (_temporary attempts, _SUCCESS). The
    resume probe must answer set() — not crash spark.read.parquet with
    'Unable to infer schema' and kill the resume path outright."""
    out = tmp_path / "out"
    lg = out / "ledger"
    (lg / "_temporary" / "0" / "task").mkdir(parents=True)
    # a parquet-named attempt file that Spark readers would ignore
    (lg / "_temporary" / "0" / "task" / "part-0.parquet").write_bytes(
        b"not parquet"
    )
    (lg / "_SUCCESS").write_bytes(b"")
    from dd_ops_ocr_spark.ledger import committed_buckets

    assert committed_buckets(spark, str(out)) == set()
