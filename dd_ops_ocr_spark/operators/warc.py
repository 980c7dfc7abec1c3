"""WARC/1.0 record codec — the web-archive source format, from scratch.

A web-scale extraction corpus arrives as WARC files (ISO 28500 / the
public WARC 1.0 spec): length-framed records whose payload for
``response`` records is a raw HTTP message wrapping the page bytes.
The reference pipeline's source side opens PDFs and quarantines broken
ones (`src/modules/step1/01_pdf_reader.py:41-66`,
`src/api/main.py` warn-and-continue); this module is the web twin of
that source stage: a byte-real WARC **writer** and **reader** with the
same quarantine contract.

Codec scope (the subset a crawler emits for every page):

* writer: ``warcinfo`` + ``response`` (HTTP/1.1 message around the
  page body) + ``metadata`` records, CRLF header blocks,
  ``Content-Length`` byte framing, ``\\r\\n\\r\\n`` record terminator;
* reader: strict framing — version line must be ``WARC/1.0``, headers
  parsed to a dict, payload taken as EXACTLY Content-Length bytes
  (never by scanning for separators: HTML bodies legally contain
  ``\\r\\n\\r\\n``), terminator required; any deviation raises
  ``ValueError`` for the quarantine path.

Per-record gzip members (``.warc.gz``) are implemented below
(`encode_warc_gz` / `split_gzip_members`): the WARC spec's Annex-D
record-at-time compression, one independent gzip member per record so
a reader can seek to a member offset and decompress exactly one record
without touching the rest of the file — the property that makes
petabyte crawl archives randomly accessible. Still out of scope:
``revisit``/``continuation`` record types (documented seam).

Scale shape: one ``mapInPandas`` over (doc_id, uri, html) — writer and
reader run back-to-back per row inside one Arrow batch, so the full
round trip costs zero exchanges; the only shuffle any consumer adds is
its own aggregation. Records-per-file fan-out (3x here) happens inside
the kernel, not through an explode.

Oracle: the synthesized file is a closed-form function of the planted
page (``htmlops._SQL_PLANT``) and canonical URL
(``htmlops._sql_canonical``), so every reader-reported field —
Content-Length arithmetic included — is restated in DuckDB SQL and the
driver hash-check pins BOTH codec directions bit-exactly (``body_md5``
is md5 over the recovered payload bytes, which must equal md5 of the
planted page). The planted corpus is pure ASCII, so SQL ``length()``
(chars) equals the writer's byte counts; the writer itself frames by
UTF-8 bytes and stays correct for non-ASCII bodies.
"""

from __future__ import annotations

import hashlib
import struct
import zlib
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession, functions as F

_CRLF = b"\r\n"
_VERSION = b"WARC/1.0"
# Fixed bodies/headers restated in the oracle (keep in sync with the
# SQL fragments at the bottom of this file).
_INFO_BODY = "software: dd-ops-ocr-spark\r\nformat: WARC File Format 1.0\r\n"
_HTTP_PRE = "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\nContent-Length: "
_WARC_DATE = "2026-01-01T00:00:00Z"


# ------------------------------------------------------------ writer

def _record(warc_type: str, headers: list, payload: bytes) -> bytes:
    """One WARC record: version line, headers (Content-Length last),
    blank line, payload, record terminator."""
    out = [_VERSION + _CRLF]
    out.append(b"WARC-Type: " + warc_type.encode("ascii") + _CRLF)
    for name, value in headers:
        out.append(f"{name}: {value}".encode("utf-8") + _CRLF)
    out.append(b"Content-Length: " + str(len(payload)).encode("ascii")
               + _CRLF)
    out.append(_CRLF)
    out.append(payload)
    out.append(_CRLF + _CRLF)
    return b"".join(out)


def warc_record_set(doc_id: int, uri: str, html: str) -> list:
    """The 3 records for one crawled page as separate byte strings:
    warcinfo, response (HTTP/1.1 message around the page), metadata.
    Record IDs are deterministic (md5 of doc_id + record index) — no
    wall-clock anywhere, same bytes on every run."""
    body = html.encode("utf-8")
    http = (_HTTP_PRE + str(len(body))).encode("ascii") \
        + _CRLF + _CRLF + body

    def rid(i: int) -> str:
        h = hashlib.md5(f"{doc_id}:{i}".encode()).hexdigest()
        return f"<urn:uuid:{h[:8]}-{h[8:12]}-{h[12:16]}-{h[16:20]}-{h[20:32]}>"

    common = [("WARC-Date", _WARC_DATE)]
    info = _record(
        "warcinfo",
        common + [("WARC-Record-ID", rid(1))],
        _INFO_BODY.encode("ascii"),
    )
    resp = _record(
        "response",
        common + [("WARC-Record-ID", rid(2)), ("WARC-Target-URI", uri),
                  ("Content-Type", "application/http;msgtype=response")],
        http,
    )
    meta = _record(
        "metadata",
        common + [("WARC-Record-ID", rid(3)), ("WARC-Target-URI", uri)],
        f"docId: {doc_id}\r\nvia: crawler\r\n".encode("ascii"),
    )
    return [info, resp, meta]


def encode_warc(doc_id: int, uri: str, html: str) -> bytes:
    """One crawled page as an uncompressed 3-record WARC file."""
    return b"".join(warc_record_set(doc_id, uri, html))


# ------------------------------------------------------------ reader

def decode_warc(data: bytes) -> list:
    """Parse a WARC file into [(warc_type, headers: dict, payload:
    bytes), ...]. Strict: raises ValueError on any framing violation —
    the quarantine path's contract (reference analogue: PdfReader's
    open/validate errors, `src/modules/step1/01_pdf_reader.py:41-66`).
    """
    records = []
    pos = 0
    n = len(data)
    while pos < n:
        end = data.find(_CRLF, pos)
        if end < 0 or data[pos:end] != _VERSION:
            raise ValueError(f"bad WARC version line at byte {pos}")
        pos = end + 2
        headers: dict[str, str] = {}
        while True:
            end = data.find(_CRLF, pos)
            if end < 0:
                raise ValueError("truncated WARC header block")
            line = data[pos:end]
            pos = end + 2
            if not line:
                break
            name, sep, value = line.partition(b":")
            if not sep:
                raise ValueError(f"malformed WARC header {line!r}")
            headers[name.decode("utf-8").strip()] = \
                value.decode("utf-8").strip()
        if "Content-Length" not in headers:
            raise ValueError("WARC record without Content-Length")
        clen = int(headers["Content-Length"])
        if clen < 0 or pos + clen + 4 > n:
            raise ValueError("WARC payload overruns file")
        payload = data[pos:pos + clen]
        pos += clen
        if data[pos:pos + 4] != _CRLF + _CRLF:
            raise ValueError("missing WARC record terminator")
        pos += 4
        wtype = headers.get("WARC-Type")
        if not wtype:
            raise ValueError("WARC record without WARC-Type")
        records.append((wtype, headers, payload))
    if not records:
        raise ValueError("empty WARC file")
    return records


def _http_split(payload: bytes) -> tuple[int, bytes]:
    """(status, body) out of an HTTP/1.1 response message. The header/
    body boundary is the FIRST CRLFCRLF — correct because HTTP headers
    cannot contain a blank line; the body may contain anything."""
    sep = payload.find(_CRLF + _CRLF)
    if sep < 0 or not payload.startswith(b"HTTP/1.1 "):
        raise ValueError("malformed HTTP response payload")
    status = int(payload[9:payload.find(b" ", 9)])
    return status, payload[sep + 4:]


# ---------------------------------------------- gzip members (.warc.gz)
#
# WARC Annex D record-at-time compression: each record is its own gzip
# MEMBER and members are concatenated, so (a) the file is still a valid
# single gzip stream to naive tools, and (b) a reader holding a member
# offset can decompress exactly one record — the random-access property
# a 100 TB archive on object storage depends on (range-GET one member,
# never the file). The member header is fixed (MTIME=0, XFL=0, OS=255)
# so encoding stays byte-deterministic across runs and hosts.

_GZ_HEADER = b"\x1f\x8b\x08\x00\x00\x00\x00\x00\x00\xff"


def gzip_member(raw: bytes) -> bytes:
    """One deterministic gzip member: fixed 10-byte header, raw-deflate
    body, CRC32 + ISIZE trailer (RFC 1952)."""
    co = zlib.compressobj(6, zlib.DEFLATED, -15)
    body = co.compress(raw) + co.flush()
    return _GZ_HEADER + body + struct.pack(
        "<II", zlib.crc32(raw) & 0xFFFFFFFF, len(raw) & 0xFFFFFFFF
    )


def encode_warc_gz(doc_id: int, uri: str, html: str) -> bytes:
    """One crawled page as a .warc.gz file: one gzip member per record."""
    return b"".join(
        gzip_member(r) for r in warc_record_set(doc_id, uri, html)
    )


def split_gzip_members(data: bytes) -> list:
    """[(offset, comp_len, raw_bytes)] for each gzip member in ``data``.

    Sequential boundary discovery: inflate with wbits=31 stops at the
    first member's end and reports the remainder via ``unused_data``;
    zlib verifies each member's CRC32 and ISIZE trailer itself, so a
    corrupted member surfaces as ``zlib.error`` — same quarantine
    contract as the framing ``ValueError``s above. Raises on a
    truncated member (``eof`` never reached) or non-gzip trailing
    bytes. Per-file memory is one member's tail slice — fine at the
    records-per-file counts a crawler emits; a whole-archive reader
    would feed chunks instead."""
    out = []
    pos = 0
    n = len(data)
    while pos < n:
        d = zlib.decompressobj(31)
        raw = d.decompress(data[pos:])
        raw += d.flush()
        if not d.eof:
            raise ValueError(f"truncated gzip member at byte {pos}")
        comp_len = n - pos - len(d.unused_data)
        out.append((pos, comp_len, raw))
        pos += comp_len
    if not out:
        raise ValueError("empty warc.gz file")
    return out


def read_member_at(data: bytes, offset: int) -> bytes:
    """Random access: decompress exactly the member starting at
    ``offset`` (as found by `split_gzip_members`), ignoring everything
    after it — the seek path a record index enables."""
    d = zlib.decompressobj(31)
    raw = d.decompress(data[offset:])
    raw += d.flush()
    if not d.eof:
        raise ValueError(f"truncated gzip member at byte {offset}")
    return raw


# ------------------------------------------------------------ queries

def _pages(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, uri, html, n3): planted page + canonical URL riding one
    narrow pipeline (the link-graph idiom — no join), n3 the quarantine
    gate nibble."""
    from dd_ops_ocr_spark.operators.htmlops import plant_html
    from dd_ops_ocr_spark.operators.urlops import (
        normalize_urls,
        plant_messy_urls,
    )

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    md = F.md5(F.col("doc_id").cast("string"))
    return normalize_urls(plant_messy_urls(plant_html(docs))).select(
        "doc_id",
        F.col("normalized_url").alias("uri"),
        "html",
        (F.instr(F.lit("0123456789abcdef"), F.substring(md, 3, 1)) - 1)
        .cast("int").alias("n3"),
    )


def warc_records(pages: DataFrame) -> DataFrame:
    """Full round trip per page: encode_warc -> decode_warc -> one row
    per record with every reader-visible field. body_md5 is md5 over
    the RECOVERED payload bytes (for responses: the HTTP body), so a
    single mis-framed byte anywhere flips the driver hash."""

    import pandas as pd

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            rows = []
            for doc_id, uri, html in zip(
                pdf_b["doc_id"], pdf_b["uri"], pdf_b["html"]
            ):
                data = encode_warc(int(doc_id), str(uri), str(html))
                for i, (wtype, hdrs, payload) in enumerate(
                    decode_warc(data), start=1
                ):
                    if wtype == "response":
                        status, body = _http_split(payload)
                    else:
                        status, body = 0, payload
                    rows.append((
                        int(doc_id), i, wtype,
                        hdrs.get("WARC-Target-URI", ""),
                        int(hdrs["Content-Length"]),
                        status, len(body),
                        hashlib.md5(body).hexdigest(),
                    ))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "rec_idx", "warc_type", "target_uri",
                "content_length", "http_status", "body_len", "body_md5",
            ])

    return pages.mapInPandas(
        work,
        schema=("doc_id long, rec_idx long, warc_type string, "
                "target_uri string, content_length long, "
                "http_status long, body_len long, body_md5 string"),
    )


def warc_quarantine(pages: DataFrame) -> DataFrame:
    """Warn-and-continue over a damaged archive: md5-gated files (n3
    even) are truncated 7 bytes short — the final record loses its
    terminator, so strict framing MUST reject the file (ok=false, zero
    counts, one row) while healthy files report record/byte totals.
    Truncating by 7 can never land on a record boundary (every record
    ends with the 4-byte terminator preceded by payload/headers), so
    the gate is exact."""

    import pandas as pd

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            rows = []
            for doc_id, uri, html, n3 in zip(
                pdf_b["doc_id"], pdf_b["uri"], pdf_b["html"], pdf_b["n3"]
            ):
                data = encode_warc(int(doc_id), str(uri), str(html))
                if int(n3) % 2 == 0:
                    data = data[:-7]
                try:
                    recs = decode_warc(data)
                    body_bytes = 0
                    for wtype, _h, payload in recs:
                        if wtype == "response":
                            _s, body = _http_split(payload)
                            body_bytes += len(body)
                    rows.append((int(doc_id), True, len(recs),
                                 body_bytes))
                except ValueError:
                    rows.append((int(doc_id), False, 0, 0))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "ok", "n_records", "n_body_bytes",
            ])

    return pages.mapInPandas(
        work,
        schema="doc_id long, ok boolean, n_records long, n_body_bytes long",
    )


def warc_records_gz(pages: DataFrame) -> DataFrame:
    """The `warc_records` round trip through the compressed framing
    layer: encode_warc_gz -> split_gzip_members -> per-member
    decode_warc. Each member must hold EXACTLY one record (Annex-D
    invariant — a member spanning two records breaks random access)
    and the member's raw bytes must re-parse identically to the
    uncompressed path, so the output shares `warc_records`' oracle:
    any drift in the gzip layer (boundary, CRC, ordering) flips the
    driver hash."""

    import pandas as pd

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            rows = []
            for doc_id, uri, html in zip(
                pdf_b["doc_id"], pdf_b["uri"], pdf_b["html"]
            ):
                data = encode_warc_gz(int(doc_id), str(uri), str(html))
                for i, (_off, _clen, raw) in enumerate(
                    split_gzip_members(data), start=1
                ):
                    recs = decode_warc(raw)
                    if len(recs) != 1:
                        raise ValueError(
                            f"gzip member {i} holds {len(recs)} records"
                        )
                    wtype, hdrs, payload = recs[0]
                    if wtype == "response":
                        status, body = _http_split(payload)
                    else:
                        status, body = 0, payload
                    rows.append((
                        int(doc_id), i, wtype,
                        hdrs.get("WARC-Target-URI", ""),
                        int(hdrs["Content-Length"]),
                        status, len(body),
                        hashlib.md5(body).hexdigest(),
                    ))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "rec_idx", "warc_type", "target_uri",
                "content_length", "http_status", "body_len", "body_md5",
            ])

    return pages.mapInPandas(
        work,
        schema=("doc_id long, rec_idx long, warc_type string, "
                "target_uri string, content_length long, "
                "http_status long, body_len long, body_md5 string"),
    )


def warc_gz_quarantine(pages: DataFrame) -> DataFrame:
    """Warn-and-continue over a bit-rotted compressed archive: for
    md5-gated files (n3 even) one byte of the response member's CRC32
    trailer is flipped — the deflate stream still inflates, so ONLY
    the checksum layer can catch it (zlib raises on the trailer
    check); the framing layer alone would pass the corrupt file.
    Healthy files report record/byte totals, damaged ones quarantine
    with zero counts — the integrity twin of `warc_quarantine`'s
    framing gate."""

    import pandas as pd

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            rows = []
            for doc_id, uri, html, n3 in zip(
                pdf_b["doc_id"], pdf_b["uri"], pdf_b["html"], pdf_b["n3"]
            ):
                data = encode_warc_gz(int(doc_id), str(uri), str(html))
                if int(n3) % 2 == 0:
                    # locate the response (2nd) member and flip a CRC bit
                    offs = [o for o, _c, _r in split_gzip_members(data)]
                    crc_pos = offs[2] - 8  # member 2's trailer CRC32
                    data = (data[:crc_pos]
                            + bytes([data[crc_pos] ^ 0x01])
                            + data[crc_pos + 1:])
                try:
                    body_bytes = 0
                    n_rec = 0
                    for _o, _c, raw in split_gzip_members(data):
                        for wtype, _h, payload in decode_warc(raw):
                            n_rec += 1
                            if wtype == "response":
                                _s, body = _http_split(payload)
                                body_bytes += len(body)
                    rows.append((int(doc_id), True, n_rec, body_bytes))
                except (ValueError, zlib.error):
                    rows.append((int(doc_id), False, 0, 0))
            yield pd.DataFrame(rows, columns=[
                "doc_id", "ok", "n_records", "n_body_bytes",
            ])

    return pages.mapInPandas(
        work,
        schema="doc_id long, ok boolean, n_records long, n_body_bytes long",
    )


def q_warc_records(spark: SparkSession, sf_dir: str) -> DataFrame:
    return warc_records(_pages(spark, sf_dir))


def q_warc_records_gz(spark: SparkSession, sf_dir: str) -> DataFrame:
    return warc_records_gz(_pages(spark, sf_dir))


def q_warc_gz_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return warc_gz_quarantine(_pages(spark, sf_dir))


def q_warc_quarantine(spark: SparkSession, sf_dir: str) -> DataFrame:
    return warc_quarantine(_pages(spark, sf_dir))


# ------------------------------------------------------------ oracles
#
# Closed forms of what the reader must report, per record:
#   rec 1 warcinfo: fixed body -> constant length + constant md5;
#   rec 2 response: Content-Length = len(HTTP preamble) + digits of the
#     body length + 4 (CRLFCRLF) + body length; body is the planted
#     page itself, so body_md5 = md5(html);
#   rec 3 metadata: body = 'docId: <id>\r\nvia: crawler\r\n'.
# The planted corpus is ASCII, so length(html) (chars) == bytes.

def _sql() -> tuple[str, str]:
    from dd_ops_ocr_spark.operators.htmlops import (
        _SQL_PLANT,
        _sql_canonical,
    )

    info_len = len(_INFO_BODY)
    info_md5 = hashlib.md5(_INFO_BODY.encode("ascii")).hexdigest()
    http_pre_len = len(_HTTP_PRE)
    crlf = "chr(13) || chr(10)"
    meta_body = f"'docId: ' || doc_id::VARCHAR || {crlf} || 'via: crawler' || {crlf}"
    base = f"""
WITH pages AS ({_SQL_PLANT}),
uri AS (
  SELECT doc_id, {_sql_canonical("doc_id")} AS uri FROM documents
),
src AS (
  SELECT p.doc_id, u.uri, p.html,
    (strpos('0123456789abcdef',
            substring(md5(p.doc_id::VARCHAR), 3, 1)) - 1) AS n3
  FROM pages p JOIN uri u ON p.doc_id = u.doc_id
)
"""
    records = base + f"""
SELECT doc_id, rec_idx, warc_type, target_uri, content_length,
       http_status, body_len, body_md5
FROM (
  SELECT doc_id, 1::BIGINT AS rec_idx, 'warcinfo' AS warc_type,
    '' AS target_uri, {info_len}::BIGINT AS content_length,
    0::BIGINT AS http_status, {info_len}::BIGINT AS body_len,
    '{info_md5}' AS body_md5
  FROM src
  UNION ALL
  SELECT doc_id, 2, 'response', uri,
    ({http_pre_len} + length(length(html)::VARCHAR) + 4
     + length(html))::BIGINT,
    200, length(html)::BIGINT, md5(html)
  FROM src
  UNION ALL
  SELECT doc_id, 3, 'metadata', uri,
    (23 + length(doc_id::VARCHAR))::BIGINT,
    0, (23 + length(doc_id::VARCHAR))::BIGINT,
    md5({meta_body})
  FROM src
)
"""
    quarantine = base + """
SELECT doc_id, (n3 % 2 <> 0) AS ok,
  CASE WHEN n3 % 2 <> 0 THEN 3 ELSE 0 END::BIGINT AS n_records,
  CASE WHEN n3 % 2 <> 0 THEN length(html) ELSE 0 END::BIGINT
    AS n_body_bytes
FROM src
"""
    return records, quarantine


SQL_WARC_RECORDS, SQL_WARC_QUARANTINE = _sql()

QUERIES = {
    "warc_records": q_warc_records,
    "warc_quarantine": q_warc_quarantine,
    # the compressed framing layer must be INVISIBLE in the output:
    # both gz queries share the uncompressed oracles bit-for-bit
    "warc_records_gz": q_warc_records_gz,
    "warc_gz_quarantine": q_warc_gz_quarantine,
}
ORACLE_SQL = {
    "warc_records": SQL_WARC_RECORDS,
    "warc_quarantine": SQL_WARC_QUARANTINE,
    "warc_records_gz": SQL_WARC_RECORDS,
    "warc_gz_quarantine": SQL_WARC_QUARANTINE,
}
