"""WARC codec: framing semantics the oracle-hash gate can't reach —
hand-built malformed files, the truncation sweep, byte determinism,
and bodies that would fool a separator-scanning parser."""

from __future__ import annotations

import hashlib

import pytest

from dd_ops_ocr_spark.operators.warc import (
    _http_split,
    decode_warc,
    encode_warc,
)

URI = "https://www.d1.com/p/7"


def test_round_trip_recovers_body_bit_exactly():
    html = "<html><body>hello &amp; goodbye</body></html>"
    recs = decode_warc(encode_warc(7, URI, html))
    types = [r[0] for r in recs]
    assert types == ["warcinfo", "response", "metadata"]
    status, body = _http_split(recs[1][2])
    assert status == 200
    assert body == html.encode("utf-8")
    assert recs[1][1]["WARC-Target-URI"] == URI


def test_body_containing_record_separator_frames_correctly():
    """A body that CONTAINS the record terminator and a fake version
    line — only Content-Length framing survives this; separator
    scanning would split mid-body."""
    html = "a\r\n\r\nWARC/1.0\r\n\r\nb"
    recs = decode_warc(encode_warc(1, URI, html))
    assert len(recs) == 3
    _s, body = _http_split(recs[1][2])
    assert body == html.encode("utf-8")


def test_non_ascii_body_framed_by_bytes():
    html = "<p>café — résumé</p>"
    recs = decode_warc(encode_warc(2, URI, html))
    _s, body = _http_split(recs[1][2])
    assert body.decode("utf-8") == html
    # Content-Length counted the UTF-8 bytes, not the characters
    assert int(recs[1][1]["Content-Length"]) > len(
        "HTTP/1.1 200 OK"
    ) + len(html)


def test_deterministic_bytes():
    assert encode_warc(9, URI, "<p>x</p>") == encode_warc(9, URI, "<p>x</p>")


def test_truncation_sweep_no_silent_corruption():
    """Every proper prefix either raises ValueError or is a shorter
    VALID archive (cut exactly on a record boundary — a legal WARC
    file). No prefix may parse to 3 records or to damaged payloads.
    The quarantine gate's cut of 7 bytes can never hit a boundary
    (records end with a 4-byte terminator), so it must always raise."""
    data = encode_warc(3, URI, "<p>short</p>")
    whole = decode_warc(data)
    boundary_cuts = 0
    for cut in range(1, len(data)):
        try:
            recs = decode_warc(data[:cut])
        except ValueError:
            continue
        boundary_cuts += 1
        assert recs == whole[: len(recs)] and len(recs) < 3
    assert boundary_cuts == 2  # after record 1 and after record 2
    with pytest.raises(ValueError):
        decode_warc(data[:-7])


def test_malformed_files_rejected():
    good = encode_warc(4, URI, "<p>y</p>")
    with pytest.raises(ValueError):
        decode_warc(b"WARC/0.9" + good[8:])        # wrong version
    with pytest.raises(ValueError):
        decode_warc(b"")                            # empty file
    with pytest.raises(ValueError):
        decode_warc(good + b"garbage trailing")     # trailing junk
    # header line without a colon
    broken = good.replace(b"WARC-Type: warcinfo", b"WARC-Type warcinfo", 1)
    with pytest.raises(ValueError):
        decode_warc(broken)


def test_spark_records_match_codec(spark):
    """The Spark query's rows are exactly what the local codec reports
    for the same (doc_id, uri, html) inputs."""
    from tests.conftest import SF_SMOKE

    from dd_ops_ocr_spark.operators.warc import _pages, warc_records

    pages = _pages(spark, SF_SMOKE).limit(20).cache()
    got = {
        (r.doc_id, r.rec_idx): r
        for r in warc_records(pages).collect()
    }
    for p in pages.collect():
        recs = decode_warc(encode_warc(p.doc_id, p.uri, p.html))
        for i, (wtype, hdrs, payload) in enumerate(recs, start=1):
            row = got[(p.doc_id, i)]
            assert row.warc_type == wtype
            body = _http_split(payload)[1] if wtype == "response" \
                else payload
            assert row.body_md5 == hashlib.md5(body).hexdigest()
            assert row.content_length == int(hdrs["Content-Length"])
    pages.unpersist()


def test_plan_shape_no_exchange(spark):
    """Writer+reader round trip is one narrow mapInPandas stage — the
    full codec adds zero exchanges."""
    from tests.conftest import SF_SMOKE

    from dd_ops_ocr_spark.operators.warc import q_warc_records

    plan = q_warc_records(spark, SF_SMOKE)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
    assert "CartesianProduct" not in plan


# ----------------------------------------------------- gzip members

def test_gz_members_align_with_records():
    """One gzip member per record (Annex-D invariant), boundaries
    exact, raw bytes identical to the uncompressed encoding."""
    import zlib

    from dd_ops_ocr_spark.operators.warc import (
        encode_warc_gz,
        split_gzip_members,
        warc_record_set,
    )

    html = "<html><body>compressed &amp; framed</body></html>"
    recs = warc_record_set(9, URI, html)
    data = encode_warc_gz(9, URI, html)
    members = split_gzip_members(data)
    assert len(members) == 3
    assert [m[2] for m in members] == recs
    # offsets/lengths tile the file exactly
    pos = 0
    for off, clen, _raw in members:
        assert off == pos
        pos += clen
    assert pos == len(data)
    # the concatenation is ALSO a single valid gzip stream to a naive
    # multi-member reader (gzip.decompress handles member concat)
    import gzip as _gzip
    assert _gzip.decompress(data) == b"".join(recs)
    del zlib


def test_gz_random_access_one_member():
    """Seek to member 2's offset and recover ONLY the response record
    — the range-GET path an object-store archive reader uses."""
    from dd_ops_ocr_spark.operators.warc import (
        encode_warc_gz,
        read_member_at,
        split_gzip_members,
    )

    html = "a\r\n\r\nWARC/1.0\r\n\r\nb"
    data = encode_warc_gz(3, URI, html)
    off = split_gzip_members(data)[1][0]
    raw = read_member_at(data, off)
    recs = decode_warc(raw)
    assert len(recs) == 1 and recs[0][0] == "response"
    assert _http_split(recs[0][2])[1] == html.encode("utf-8")


def test_gz_deterministic_bytes():
    from dd_ops_ocr_spark.operators.warc import encode_warc_gz

    a = encode_warc_gz(5, URI, "<html>x</html>")
    assert a == encode_warc_gz(5, URI, "<html>x</html>")
    assert a[:4] == b"\x1f\x8b\x08\x00"  # MTIME bytes start zeroed


def test_gz_corruption_and_truncation_rejected():
    import zlib

    import pytest as _pytest

    from dd_ops_ocr_spark.operators.warc import (
        encode_warc_gz,
        split_gzip_members,
    )

    data = encode_warc_gz(11, URI, "<html>y</html>")
    # CRC trailer bit-flip on the middle member: deflate still
    # inflates, only the checksum layer catches it
    off3 = split_gzip_members(data)[2][0]
    bad = (data[:off3 - 8] + bytes([data[off3 - 8] ^ 0x01])
           + data[off3 - 7:])
    with _pytest.raises(zlib.error):
        split_gzip_members(bad)
    # truncation mid-member
    with _pytest.raises(ValueError):
        split_gzip_members(data[:-6])
    # trailing non-gzip junk
    with _pytest.raises(zlib.error):
        split_gzip_members(data + b"junk")
    # empty file
    with _pytest.raises(ValueError):
        split_gzip_members(b"")


def test_gz_spark_parity_with_uncompressed(spark):
    """warc_records_gz must produce row-identical output to
    warc_records — the compressed framing layer is invisible."""
    from tests.conftest import SF_SMOKE

    from dd_ops_ocr_spark.operators.warc import (
        _pages,
        warc_records,
        warc_records_gz,
    )

    pages = _pages(spark, SF_SMOKE).limit(20).cache()
    plain = sorted(map(tuple, warc_records(pages).collect()))
    gz = sorted(map(tuple, warc_records_gz(pages).collect()))
    assert plain == gz
    pages.unpersist()


def test_gz_quarantine_boundary(spark):
    """n3-even docs (flipped response CRC) quarantine; odd docs report
    full totals — exact md5 boundary, mirroring warc_quarantine."""
    from tests.conftest import SF_SMOKE

    from dd_ops_ocr_spark.operators.warc import (
        _pages,
        warc_gz_quarantine,
    )

    pages = _pages(spark, SF_SMOKE).limit(40).cache()
    n3 = {p.doc_id: p.n3 for p in pages.collect()}
    for r in warc_gz_quarantine(pages).collect():
        if n3[r.doc_id] % 2 == 0:
            assert (r.ok, r.n_records, r.n_body_bytes) == (False, 0, 0)
        else:
            assert r.ok and r.n_records == 3 and r.n_body_bytes > 0
    pages.unpersist()
