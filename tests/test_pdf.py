"""Byte-real PDF codec: round trip, operator-state semantics, corrupt
input classification, and the Spark text-span surface."""

from __future__ import annotations

import zlib

import pytest

from dd_ops_ocr_spark.operators.pdf import (
    _extract_text,
    decode_pdf,
    encode_pdf,
    page_count,
    pdf_doc_audit,
    pdf_text_spans,
)

PAGES = [
    [(72, 720, "hello (world) \\ back", "td"), (100, 680, "tm line", "tm")],
    [(72, 720, "split across TJ", "tj"), (90, 650, "tail", "td")],
]


def test_roundtrip_exact():
    b = encode_pdf(PAGES)
    assert b.startswith(b"%PDF-1.4") and b.rstrip().endswith(b"%%EOF")
    assert page_count(b) == 2
    got = decode_pdf(b)
    want = [
        (p + 1, float(x), float(y), t)
        for p, runs in enumerate(PAGES)
        for (x, y, t, _m) in runs
    ]
    assert got == want
    # deterministic bytes
    assert encode_pdf(PAGES) == b


def test_td_is_relative_and_octal_escapes():
    # hand-written content stream: TD accumulates, octal decodes
    content = (b"BT /F1 12 Tf 10 700 Td (first) Tj "
               b"5 -20 TD (\\101\\102 ok) Tj ET")
    got = _extract_text(content, 3)
    assert got == [(3, 10.0, 700.0, "first"), (3, 15.0, 680.0, "AB ok")]


def test_tm_resets_absolute_and_bt_resets():
    content = (b"BT 50 50 Td 1 0 0 1 200 400 Tm (abs) Tj ET "
               b"BT (origin) Tj ET")
    got = _extract_text(content, 1)
    assert got == [(1, 200.0, 400.0, "abs"), (1, 0.0, 0.0, "origin")]


def test_truncation_always_raises_cleanly():
    b = encode_pdf(PAGES)
    for k in range(0, len(b) - 1, 7):
        with pytest.raises((ValueError, EOFError, zlib.error)):
            decode_pdf(b[:k])


def test_uncompressed_stream_supported():
    # splice an uncompressed contents object: rebuild a minimal file
    content = b"BT /F1 12 Tf 72 700 Td (plain) Tj ET"
    body = [
        b"<< /Type /Catalog /Pages 2 0 R >>",
        b"<< /Type /Pages /Kids [4 0 R] /Count 1 >>",
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
        b"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
        b"/Resources << /Font << /F1 3 0 R >> >> /Contents 5 0 R >>",
        b"<< /Length " + str(len(content)).encode() + b" >>\nstream\n"
        + content + b"\nendstream",
    ]
    out = bytearray(b"%PDF-1.4\n")
    offs = {}
    for i, obj in enumerate(body, start=1):
        offs[i] = len(out)
        out += f"{i} 0 obj\n".encode() + obj + b"\nendobj\n"
    xref_at = len(out)
    out += f"xref\n0 {len(body) + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for i in range(1, len(body) + 1):
        out += f"{offs[i]:010d} 00000 n \n".encode()
    out += (f"trailer\n<< /Size {len(body) + 1} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode()
    assert decode_pdf(bytes(out)) == [(1, 72.0, 700.0, "plain")]


def test_unsupported_features_are_loud():
    b = encode_pdf(PAGES)
    # a damaged xref keyword is triaged as corruption, not as a feature
    with pytest.raises(ValueError, match="corrupt offset"):
        decode_pdf(b.replace(b"xref\n", b"xrEf\n", 1))
    # startxref pointing at an object header IS the 1.5+ layout
    xref_at = int(b.rsplit(b"startxref", 1)[1].split(b"%%EOF")[0])
    stream15 = b.replace(
        f"startxref\n{xref_at}".encode(), b"startxref\n9", 1
    )  # offset 9 = "1 0 obj" right after the %PDF-1.4 header line
    with pytest.raises(ValueError, match="cross-reference streams"):
        decode_pdf(stream15)
    with pytest.raises(ValueError, match="%PDF header"):
        decode_pdf(b"not a pdf at all")
    # structural damage inside objects stays in the ValueError contract
    with pytest.raises(ValueError, match="catalog has no /Pages"):
        decode_pdf(b.replace(b"/Pages 2 0 R", b"/Pager 2 0 R", 1))


def _nibs(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id long, n1 int, n2 int, n3 int"
    )


def test_spark_reading_order(spark):
    out = pdf_text_spans(_nibs(spark, [(5, 2, 1, 1)])).collect()
    # n1=2 -> 3 pages; runs(p) = 2 + (1+p)%3
    by_order = sorted(out, key=lambda r: r.reading_order)
    assert [r.reading_order for r in by_order] == list(range(1, len(out) + 1))
    # within a page, order follows descending y (top of page first)
    pg1 = [r for r in by_order if r.page == 1]
    assert all(a.y > b.y for a, b in zip(pg1, pg1[1:]))
    assert [r.page for r in by_order] == sorted(r.page for r in by_order)


def test_spark_audit_quarantines_even_n3(spark):
    rows = {r.doc_id: r for r in pdf_doc_audit(
        _nibs(spark, [(1, 1, 1, 2), (2, 1, 1, 3)])).collect()}
    assert not rows[1].ok and rows[1].n_pages == 0 and rows[1].n_spans == 0
    assert rows[2].ok and rows[2].n_pages == 2 and rows[2].n_spans > 0


def test_spans_plan_single_exchange(spark):
    import re

    from dd_ops_ocr_spark.operators.pdf import _docs_nibs

    df = pdf_text_spans(_docs_nibs(spark, "/root/testdata/sf0.001"))
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    n = len(re.findall(r"\(\d+\) Exchange", plan))
    assert n == 1, f"reading-order window should be the only shuffle:\n{plan[:2000]}"


def test_stream_on_non_dict_object_raises_valueerror():
    """A corrupt body where the object before 'stream' parses as an
    array (not the stream's dict) must fail as ValueError — the
    quarantine contract — not AttributeError from .get() on a list."""
    # minimal standalone corrupt doc with a computed xref so the
    # failure is isolated to the object body, not the table
    head = b"%PDF-1.4\n"
    obj = b"1 0 obj [1 2]\nstream\nxxxx\nendstream\nendobj\n"
    xref_at = len(head) + len(obj)
    doc = (
        head + obj
        + b"xref\n0 2\n0000000000 65535 f \n"
        + b"%010d 00000 n \n" % len(head)
        + b"trailer << /Root 1 0 R /Size 2 >>\n"
        + b"startxref\n%d\n%%%%EOF\n" % xref_at
    )
    from dd_ops_ocr_spark.operators.pdf import _load_obj, _xref_offsets

    offsets, _trailer = _xref_offsets(doc)
    with pytest.raises(ValueError, match="not a dict"):
        _load_obj(doc, offsets, 1)
