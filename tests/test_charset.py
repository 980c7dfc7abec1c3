"""charset referees: the planted bytes really are the gated encodings
(Python codecs referee for both directions), the sniff matches an
independent Python reimplementation, and the pass is exchange-free."""

import hashlib

from tests.conftest import SF_SMOKE


def _py_sniff(raw: bytes):
    if raw[:2] == b"\xff\xfe":
        return "utf-16le", raw[2:].decode("utf-16-le")
    try:
        return "utf-8", raw.decode("utf-8", errors="strict")
    except UnicodeDecodeError:
        return "iso-8859-1", raw.decode("iso-8859-1")


def test_charset_round_trip_matches_python(spark):
    from dd_ops_ocr_spark.operators.charset import (
        _MARKER,
        q_charset_transcode,
        plant_encoded,
    )

    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet").select(
        "doc_id", "text"
    )
    raws = {r.doc_id: bytes(r.raw)
            for r in plant_encoded(docs).collect()}
    texts = {r.doc_id: r.text for r in docs.collect()}

    got = {r.doc_id: (r.charset, r.text)
           for r in q_charset_transcode(spark, SF_SMOKE).collect()}
    assert set(got) == set(raws)

    seen = set()
    for did, raw in raws.items():
        want_cs, want_txt = _py_sniff(raw)
        assert got[did] == (want_cs, want_txt), did
        # lossless round trip back to the original text
        assert want_txt == texts[did] + _MARKER, did
        # the gate really drove the encoding
        nib = hashlib.md5(str(did).encode()).hexdigest()
        want_gate = ("utf-16le" if nib[14] in "02468ace"
                     else "iso-8859-1" if nib[15] in "02468ace"
                     else "utf-8")
        assert want_cs == want_gate, did
        seen.add(want_cs)
    assert seen == {"utf-16le", "iso-8859-1", "utf-8"}


def test_charset_plan_is_narrow(spark):
    from dd_ops_ocr_spark.operators.charset import q_charset_transcode

    plan = q_charset_transcode(spark, SF_SMOKE)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Exchange" not in plan
