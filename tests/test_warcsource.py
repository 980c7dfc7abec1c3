"""The Python-DataSource WARC surface (operators/warcsource.py):
writer commit protocol, index-driven split planning, filter pushdown,
and per-member permissive quarantine — each pinned at the API level,
independent of the oracle-checked queries (which test_oracle_sql.py
covers like every other query)."""

from __future__ import annotations

import hashlib
import json
import os

import pytest
from pyspark.sql.datasource import EqualTo, GreaterThan, In

from dd_ops_ocr_spark.operators import warcsource as ws


def _pages(spark, n=6):
    rows = [
        (i, f"http://ex{i}.com/", f"<html><body>doc {i} body</body></html>")
        for i in range(n)
    ]
    return spark.createDataFrame(rows, "doc_id long, uri string, html string")


def _write(spark, path, n=6, mode="overwrite", shards=2):
    ws.ensure_registered(spark)
    (
        _pages(spark, n)
        .repartition(shards, "doc_id")
        .write.format("ddops_warc")
        .mode(mode)
        .save(path)
    )


def _manifest(path):
    m, _ver = ws._load_manifest(path)
    return m["files"]


def test_roundtrip_and_manifest(spark, tmp_path):
    path = str(tmp_path / "arch")
    _write(spark, path)
    files = _manifest(path)
    assert files and all(f.startswith("shard-") for f in files)
    # every shard has its sidecar index and nothing else is in the dir
    for f in files:
        assert os.path.exists(os.path.join(path, f + ".idx.json"))
    pdf = (
        spark.read.format("ddops_warc").load(path)
        .toPandas()
    )
    # one warcinfo per shard + (response, metadata) per doc
    assert len(pdf) == len(files) + 6 * 2
    resp = pdf[pdf.warc_type == "response"].sort_values("target_uri")
    assert len(resp) == 6
    want_md5 = [
        hashlib.md5(
            f"<html><body>doc {i} body</body></html>".encode()
        ).hexdigest()
        for i in range(6)
    ]
    assert resp.body_md5.tolist() == want_md5
    assert (pdf[pdf.warc_type == "metadata"].http_status == 0).all()


def test_split_planning_is_index_driven(spark, tmp_path):
    path = str(tmp_path / "arch")
    _write(spark, path, shards=2)
    big = spark.read.format("ddops_warc").load(path)  # default 4 MiB
    small = (
        spark.read.format("ddops_warc").option("split_bytes", 128).load(path)
    )
    n_files = len(_manifest(path))
    assert big.rdd.getNumPartitions() == n_files
    # 128-byte target -> roughly one split per member, far more tasks
    # than files, and the union of splits still reads every record
    assert small.rdd.getNumPartitions() > n_files * 3
    assert small.count() == big.count()


def test_pushdown_accepts_only_type_predicates():
    r = ws.WarcArchiveReader({"path": "/nonexistent"})
    rest = list(r.pushFilters([
        EqualTo(("warc_type",), "response"),
        In(("warc_type",), ("response", "metadata")),
        GreaterThan(("body_len",), 3),       # unsupported op
        EqualTo(("target_uri",), "http://"),  # unsupported column
    ]))
    assert r.type_preds == [("eq", "response"),
                            ("in", frozenset({"response", "metadata"}))]
    assert len(rest) == 2


def test_pushed_filter_matches_post_scan_filter(spark, tmp_path):
    path = str(tmp_path / "arch")
    _write(spark, path)
    full = spark.read.format("ddops_warc").load(path).toPandas()
    pushed = (
        spark.read.format("ddops_warc").load(path)
        .filter("warc_type = 'response'")
        .toPandas()
    )
    want = full[full.warc_type == "response"].sort_values(
        "record_id", ignore_index=True
    )
    got = pushed.sort_values("record_id", ignore_index=True)
    assert got.equals(want)


def test_append_unions_overwrite_sweeps(spark, tmp_path):
    path = str(tmp_path / "arch")
    _write(spark, path, n=4)
    first = set(_manifest(path))
    _write(spark, path, n=4, mode="append")
    assert set(_manifest(path)) > first  # old shards retained
    n_appended = spark.read.format("ddops_warc").load(path).count()
    assert n_appended == 2 * (4 * 2) + len(_manifest(path))
    _write(spark, path, n=4, mode="overwrite")
    files = set(_manifest(path))
    assert files.isdisjoint(first)
    # commit() itself deletes nothing (a sweep there would race a
    # concurrent job's uncommitted shards); the explicit vacuum()
    # maintenance call reclaims superseded shards + manifest versions
    assert ws.vacuum(path)["data_files"] > 0
    on_disk = {
        f for f in os.listdir(path) if not f.startswith("_MANIFEST")
    }
    assert on_disk == files | {f + ".idx.json" for f in files}


def test_uncommitted_stray_file_is_invisible(spark, tmp_path):
    path = str(tmp_path / "arch")
    _write(spark, path)
    before = spark.read.format("ddops_warc").load(path).count()
    # a crashed task's leftover: present on disk, absent from manifest
    stray = os.path.join(path, "shard-99999-0.warc.gz")
    with open(stray, "wb") as f:
        f.write(b"\x1f\x8bgarbage")
    assert spark.read.format("ddops_warc").load(path).count() == before


def test_permissive_quarantines_only_rotten_members(spark, tmp_path):
    path = str(tmp_path / "arch")
    _write(spark, path)
    ws._corrupt_metadata_members(path)  # md5-gated docs' metadata CRC
    gated = [
        i for i in range(6)
        if int(hashlib.md5(str(i).encode()).hexdigest()[2], 16) % 2 == 0
    ]
    assert gated, "fixture must gate at least one doc"
    strict = spark.read.format("ddops_warc").load(path)
    with pytest.raises(Exception, match="zlib|Error|error"):
        strict.count()
    perm = (
        spark.read.format("ddops_warc")
        .option("permissive", "true").load(path)
        .toPandas()
    )
    corrupt = perm[perm.warc_type == ws._CORRUPT_TYPE]
    assert len(corrupt) == len(gated)
    # every healthy member of the same splits still decoded
    assert (perm.warc_type == "response").sum() == 6
    assert (perm.warc_type == "metadata").sum() == 6 - len(gated)


def _run_stream(spark, path, ckpt, qname):
    # memory sink can't recover from a checkpoint; foreachBatch can —
    # and it's the engine's standard sink (streaming/jobs.py)
    import pandas as pd

    batches = []
    q = (
        spark.readStream.format("ddops_warc")
        .option("split_bytes", 256)
        .load(path)
        .writeStream.outputMode("append")
        .foreachBatch(lambda df, _eid: batches.append(df.toPandas()))
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    cols = ["record_id", "warc_type", "target_uri", "content_length",
            "http_status", "body_len", "body_md5"]
    out = [b for b in batches if len(b)]
    return pd.concat(out) if out else pd.DataFrame(columns=cols)


def test_stream_reads_commit_epochs_exactly_once(spark, tmp_path):
    path, ckpt = str(tmp_path / "arch"), str(tmp_path / "ckpt")
    _write(spark, path, n=4)
    got1 = _run_stream(spark, path, ckpt, "warc_stream_1")
    n_files1 = len(_manifest(path))
    assert len(got1) == 4 * 2 + n_files1
    # second commit epoch: only the appended shards form the next batch
    _write(spark, path, n=4, mode="append")
    got2 = _run_stream(spark, path, ckpt, "warc_stream_2")
    new_files = len(_manifest(path)) - n_files1
    # exactly the second epoch's rows: 2 records per doc + one
    # warcinfo per NEW shard (the epoch-1 shards were not re-read —
    # same docs, so ids repeat by construction; counts are the proof)
    assert len(got2) == 4 * 2 + new_files
    assert (got2.warc_type == "warcinfo").sum() == new_files
    # nothing new -> an availableNow run sees an empty batch, not a replay
    got3 = _run_stream(spark, path, ckpt, "warc_stream_3")
    assert len(got3) == 0


def test_stream_replay_from_fresh_checkpoint_is_deterministic(
    spark, tmp_path
):
    path = str(tmp_path / "arch")
    _write(spark, path, n=3)
    _write(spark, path, n=3, mode="append")
    a = _run_stream(spark, path, str(tmp_path / "c1"), "warc_replay_a")
    b = _run_stream(spark, path, str(tmp_path / "c2"), "warc_replay_b")
    key = ["record_id", "warc_type", "body_md5"]
    assert sorted(map(tuple, a[key].values.tolist())) == sorted(
        map(tuple, b[key].values.tolist())
    )


def test_empty_write_publishes_empty_manifest(spark, tmp_path):
    """A job whose every task saw zero rows must still commit: an empty
    manifest in a driver-created directory, readable as zero rows —
    not a FileNotFoundError from the manifest tmp write."""
    from dd_ops_ocr_spark.operators import warcsource

    warcsource.ensure_registered(spark)
    out = str(tmp_path / "empty_archive")
    (
        spark.createDataFrame([], "doc_id long, uri string, html string")
        .write.format("ddops_warc").mode("overwrite").save(out)
    )
    assert spark.read.format("ddops_warc").load(out).count() == 0


def test_permissive_covers_post_inflate_malformation(spark, tmp_path):
    """A member that inflates with a valid CRC but holds a response
    whose payload is not well-formed HTTP must quarantine under
    permissive reads (and still fail loudly under strict reads) — the
    try must cover the whole parse-to-row path, not just the gzip
    layer."""
    import gzip as _gzip
    import json as _json

    from dd_ops_ocr_spark.operators import warcsource
    from dd_ops_ocr_spark.operators.warc import _record, gzip_member

    warcsource.ensure_registered(spark)
    path = str(tmp_path / "arch")
    (
        spark.createDataFrame([(1, "http://x/1", "<p>ok</p>")],
                              "doc_id long, uri string, html string")
        .coalesce(1)
        .write.format("ddops_warc").mode("overwrite").save(path)
    )
    # append one VALID-gzip member whose response payload is junk HTTP
    bad = gzip_member(_record(
        "response",
        [("WARC-Date", "2024-01-01T00:00:00Z"),
         ("WARC-Record-ID", "<urn:uuid:bad>")],
        b"NOT-HTTP-AT-ALL",
    ))
    manifest, _ver = warcsource._load_manifest(path)
    shard = manifest["files"][0]
    fpath = os.path.join(path, shard)
    off = os.path.getsize(fpath)
    with open(fpath, "ab") as f:
        f.write(bad)
    with open(fpath + ".idx.json") as f:
        idx = _json.load(f)
    idx["members"].append([off, len(bad)])
    with open(fpath + ".idx.json", "w") as f:
        _json.dump(idx, f)

    strict = spark.read.format("ddops_warc").load(path)
    with pytest.raises(Exception):
        strict.count()

    perm = (
        spark.read.format("ddops_warc")
        .option("permissive", "true").load(path)
    )
    rows = perm.collect()
    kinds = sorted(r.warc_type for r in rows)
    assert "__corrupt__" in kinds
    # the shard's other members still decoded
    assert "response" in kinds and "metadata" in kinds


def test_concurrent_appends_both_land(spark, tmp_path):
    """Two append jobs committing at once must BOTH publish: the loser
    of the manifest-version link-CAS re-reads and re-merges — a
    read-modify-replace would silently drop one job's files (and its
    old sweep could even delete the other's data)."""
    from concurrent.futures import ThreadPoolExecutor

    ws.ensure_registered(spark)
    path = str(tmp_path / "arch")
    _write(spark, path, n=2)
    base_files = set(_manifest(path))

    def append(i):
        (
            spark.createDataFrame(
                [(100 + i, f"http://x/{100 + i}", f"<p>{i}</p>")],
                "doc_id long, uri string, html string",
            )
            .coalesce(1)
            .write.format("ddops_warc").mode("append").save(path)
        )

    with ThreadPoolExecutor(max_workers=2) as ex:
        list(ex.map(append, range(2)))

    files = set(_manifest(path))
    assert base_files < files
    # each append added 1 shard (1 task): base + 2 survive the merge
    assert len(files) == len(base_files) + 2
    # and every committed row is readable (2 docs * 2 records each + 2
    # new docs * 2 + one warcinfo per shard)
    n = spark.read.format("ddops_warc").load(path).count()
    assert n == (2 + 2) * 2 + len(files)


def test_parse_member_matches_decode_warc():
    """The scan path's specialized single-record parse must classify
    and extract exactly like decode_warc + the len==1 check, for valid
    records and for every malformed-input class the permissive reader
    quarantines."""
    from dd_ops_ocr_spark.operators.warc import (
        _record, decode_warc, warc_record_set,
    )

    valid = warc_record_set(7, "http://x/7", "<p>seven</p>")
    mutants = [
        b"",                                    # empty
        b"WARC/9.9\r\nA: b\r\n\r\nx\r\n\r\n",   # bad version
        b"WARC/1.0\r\nNoColonHere\r\n\r\n",     # malformed header line
        b"WARC/1.0\r\n\r\n\r\n\r\n",            # no headers at all
        b"WARC/1.0\r\nContent-Length: zz\r\n\r\n\r\n\r\n",  # garbage CL
        b"WARC/1.0\r\nContent-Length: 99\r\n\r\nshort\r\n\r\n",  # overrun
        b"WARC/1.0\r\nWARC-Type: x\r\nContent-Length: 1\r\n\r\nXno-term",
        # non-UTF8 header block
        b"WARC/1.0\r\nWARC-Type: \xff\xfe\r\nContent-Length: 0\r\n\r\n\r\n\r\n",
        # two records in one member
        valid[1] + valid[2],
        # trailing garbage after a valid record
        valid[1] + b"junk",
    ]
    for raw in list(valid) + mutants:
        try:
            recs = decode_warc(raw)
            if len(recs) != 1:
                raise ValueError("member holds != 1 record")
            want = ("ok", recs[0][0], recs[0][1], recs[0][2])
        except (ValueError, KeyError, IndexError, UnicodeDecodeError):
            want = ("err",)
        try:
            wtype, hdrs, payload, clen = ws._parse_member(raw)
            got = ("ok", wtype, hdrs, payload)
            assert clen == int(hdrs["Content-Length"])
        except (ValueError, KeyError, IndexError, UnicodeDecodeError):
            got = ("err",)
        assert got[0] == want[0], f"classification differs for {raw[:40]!r}"
        if want[0] == "ok":
            assert got[1:] == want[1:], f"fields differ for {raw[:40]!r}"


def test_range_planning_matches_index_planning(spark, tmp_path):
    """Stats-driven byte-range splits must read exactly the member set
    the legacy index-driven splits read, at any split size."""
    path = str(tmp_path / "arch")
    _write(spark, path, n=9, shards=3)
    manifest, _ver = ws._load_manifest(path)
    assert manifest.get("stats"), "new writer must stamp per-file stats"
    for sb in (64, 1024, 1 << 20):
        ranged = ws._plan_splits(
            path, manifest["files"], sb, manifest["stats"])
        legacy = ws._plan_splits(path, manifest["files"], sb, None)
        assert all(isinstance(s, ws._RangeSplit) for s in ranged)
        assert all(isinstance(s, ws._MemberSplit) for s in legacy)
        got = sorted(
            tuple(m) for s in ranged for m in ws._resolve_members(s))
        want = sorted(tuple(m) for s in legacy for m in s.members)
        assert got == want
