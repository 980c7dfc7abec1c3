"""Minimal byte-real PDF text codec — the "PDF/layout parse" leg of the
north rule, at the same byte level the repo's image/audio/video codecs
work at.

The reference opens PDFs with PyMuPDF and walks pages
(`src/modules/step1/01_pdf_reader.py:41-66` fitz.open / page_count /
get_page; `src/modules/step1/04_pdf_processor.py` drives the per-page
loop). This module replaces that dependency with a from-scratch
implementation of the public PDF 1.4 file format (ISO 32000 subset):

* ``encode_pdf``: a deterministic writer — catalog / page tree / Type1
  font objects, one FlateDecode-compressed content stream per page,
  text placed with ``Td``, ``Tm`` or ``TJ`` show operators, correct
  xref byte offsets and trailer.
* ``decode_pdf``: a reader that parses the xref table from
  ``startxref``, resolves the trailer → catalog → page tree, inflates
  each page's content stream, and evaluates the text operators
  (BT/ET, Td/TD/Tm positioning state, Tj/TJ shows, literal-string
  escapes incl. octal) into ``(page, x, y, text)`` tuples.

Scope (documented seams, mirroring the codec-family convention):
single xref table (no incremental /Prev chains), PDF<=1.4 xref TABLES
only (1.5+ cross-reference / object streams raise), FlateDecode or
uncompressed streams, literal strings (hex strings raise), text
operators only (no font subsetting — bytes are Latin-1 text, exactly
what the writer emits). Corrupt input raises ValueError/EOFError with
a clear message so the quarantine path can classify it.

Reading order downstream is the north star's ``(page, y, x)`` sort
(PDF y grows upward, so top-to-bottom is descending y) — done
Spark-side in the query, not here: the codec reports geometry, the
plan owns ordering.
"""

from __future__ import annotations

import re
import zlib

# ------------------------------------------------------------ writer

_ESCAPE = {ord("\\"): "\\\\", ord("("): "\\(", ord(")"): "\\)"}


def _esc(s: str) -> str:
    return s.translate(_ESCAPE)


def _run_ops(run: tuple) -> str:
    """One text run -> content-stream fragment. run = (x, y, text, mode),
    mode in {'td','tm','tj'}; 'tj' splits the text into two TJ chunks
    with a kerning number between them (extraction must re-concatenate).
    """
    x, y, text, mode = run
    if mode == "tm":
        return f"BT /F1 12 Tf 1 0 0 1 {x} {y} Tm ({_esc(text)}) Tj ET\n"
    if mode == "tj":
        mid = max(1, len(text) // 2)
        a, b = text[:mid], text[mid:]
        return (f"BT /F1 12 Tf {x} {y} Td "
                f"[({_esc(a)}) -250 ({_esc(b)})] TJ ET\n")
    return f"BT /F1 12 Tf {x} {y} Td ({_esc(text)}) Tj ET\n"


def encode_pdf(pages: list) -> bytes:
    """pages = [[(x:int, y:int, text:str, mode:str), ...], ...] -> a
    complete single-xref PDF 1.4 file with one flate content stream per
    page and a shared Helvetica /F1."""
    if not pages:
        raise ValueError("encode_pdf: at least one page required")
    objs: dict[int, bytes] = {}
    n_pages = len(pages)
    page_ids = [4 + 2 * i for i in range(n_pages)]
    kids = " ".join(f"{i} 0 R" for i in page_ids)
    objs[1] = b"<< /Type /Catalog /Pages 2 0 R >>"
    objs[2] = (f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
               ).encode("latin-1")
    objs[3] = (b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    for i, runs in enumerate(pages):
        pid, cid = page_ids[i], page_ids[i] + 1
        objs[pid] = (
            f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
            f"/Resources << /Font << /F1 3 0 R >> >> "
            f"/Contents {cid} 0 R >>"
        ).encode("latin-1")
        content = "".join(_run_ops(r) for r in runs).encode("latin-1")
        flate = zlib.compress(content)
        objs[cid] = (
            f"<< /Length {len(flate)} /Filter /FlateDecode >>\nstream\n"
            .encode("latin-1") + flate + b"\nendstream"
        )
    out = bytearray(b"%PDF-1.4\n")
    offsets: dict[int, int] = {}
    for num in sorted(objs):
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode("latin-1")
        out += objs[num]
        out += b"\nendobj\n"
    xref_at = len(out)
    n_obj = max(objs) + 1
    out += f"xref\n0 {n_obj}\n".encode("latin-1")
    out += b"0000000000 65535 f \n"
    for num in range(1, n_obj):
        out += f"{offsets[num]:010d} 00000 n \n".encode("latin-1")
    out += (f"trailer\n<< /Size {n_obj} /Root 1 0 R >>\n"
            f"startxref\n{xref_at}\n%%EOF\n").encode("latin-1")
    return bytes(out)


# ------------------------------------------------------------ reader

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"
_NUM_RE = re.compile(rb"[+-]?\d+(\.\d*)?")


class _Lexer:
    """Token reader over PDF syntax: numbers, names, strings, dict/array
    delimiters, keywords, R-references resolved by the caller."""

    def __init__(self, data: bytes, pos: int = 0):
        self.d = data
        self.p = pos

    def _skip_ws(self) -> None:
        d, p = self.d, self.p
        while p < len(d):
            if d[p] in _WS:
                p += 1
            elif d[p] == 0x25:  # % comment
                while p < len(d) and d[p] not in b"\r\n":
                    p += 1
            else:
                break
        self.p = p

    def next_token(self):
        self._skip_ws()
        d, p = self.d, self.p
        if p >= len(d):
            raise EOFError("decode_pdf: unexpected end of data")
        c = d[p]
        if c == 0x3C:  # <
            if p + 1 < len(d) and d[p + 1] == 0x3C:
                self.p = p + 2
                return ("<<", None)
            raise ValueError("decode_pdf: hex strings not supported "
                             "(documented seam)")
        if c == 0x3E and p + 1 < len(d) and d[p + 1] == 0x3E:
            self.p = p + 2
            return (">>", None)
        if c in b"[]":
            self.p = p + 1
            return (chr(c), None)
        if c == 0x2F:  # /Name
            q = p + 1
            while q < len(d) and d[q] not in _WS and d[q] not in _DELIM:
                q += 1
            self.p = q
            return ("name", d[p + 1:q].decode("latin-1"))
        if c == 0x28:  # (string)
            return ("str", self._string())
        m = _NUM_RE.match(d, p)
        if m and m.start() == p:
            self.p = m.end()
            t = m.group().decode("latin-1")
            return ("num", float(t) if "." in t else int(t))
        q = p
        while q < len(d) and d[q] not in _WS and d[q] not in _DELIM:
            q += 1
        if q == p:
            raise ValueError(f"decode_pdf: bad syntax at byte {p}")
        self.p = q
        return ("kw", d[p:q].decode("latin-1"))

    def _string(self) -> str:
        d = self.d
        p = self.p + 1
        out = bytearray()
        depth = 1
        while p < len(d):
            c = d[p]
            if c == 0x5C:  # backslash
                p += 1
                if p >= len(d):
                    break
                e = d[p]
                if e in b"nrtbf":
                    out.append({0x6E: 10, 0x72: 13, 0x74: 9,
                                0x62: 8, 0x66: 12}[e])
                    p += 1
                elif 0x30 <= e <= 0x37:  # octal, up to 3 digits
                    oct_s, k = 0, 0
                    while k < 3 and p < len(d) and 0x30 <= d[p] <= 0x37:
                        oct_s = oct_s * 8 + (d[p] - 0x30)
                        p += 1
                        k += 1
                    out.append(oct_s & 0xFF)
                else:  # \( \) \\ and unknown escapes -> literal char
                    out.append(e)
                    p += 1
                continue
            if c == 0x28:
                depth += 1
            elif c == 0x29:
                depth -= 1
                if depth == 0:
                    self.p = p + 1
                    return out.decode("latin-1")
            out.append(c)
            p += 1
        raise EOFError("decode_pdf: unterminated string")

    def value(self):
        """Parse one object value (dict / array / scalar / N 0 R)."""
        kind, tok = self.next_token()
        if kind == "<<":
            dct = {}
            while True:
                k, t = self.next_token()
                if k == ">>":
                    return dct
                if k != "name":
                    raise ValueError("decode_pdf: dict key must be a name")
                dct[t] = self.value()
        if kind == "[":
            arr = []
            while True:
                save = self.p
                k, _t = self.next_token()
                if k == "]":
                    return arr
                self.p = save
                arr.append(self.value())
        if kind == "num":
            # lookahead for "G R" indirect reference
            save = self.p
            try:
                k2, t2 = self.next_token()
                k3, t3 = self.next_token()
                if k2 == "num" and k3 == "kw" and t3 == "R":
                    return ("ref", int(tok))
            except (EOFError, ValueError):
                pass
            self.p = save
            return tok
        if kind in ("name", "str"):
            return tok
        if kind == "kw" and tok in ("true", "false", "null"):
            return {"true": True, "false": False, "null": None}[tok]
        raise ValueError(f"decode_pdf: unexpected token {kind}:{tok!r}")


def _xref_offsets(data: bytes) -> tuple[dict[int, int], dict]:
    tail = data[-256:]
    m = re.search(rb"startxref\s+(\d+)\s+%%EOF", tail)
    if not m:
        raise ValueError("decode_pdf: startxref/%%EOF not found")
    xref_at = int(m.group(1))
    if data[xref_at:xref_at + 4] != b"xref":
        # honest triage: an object header at the target IS the PDF 1.5+
        # cross-reference-stream layout; anything else is plain damage
        if re.match(rb"\d+\s+\d+\s+obj", data[xref_at:xref_at + 24]):
            raise ValueError("decode_pdf: cross-reference streams "
                             "(PDF 1.5+) not supported (documented seam)")
        raise ValueError("decode_pdf: startxref does not point at an "
                         "xref table (corrupt offset)")
    lx = _Lexer(data, xref_at + 4)
    offsets: dict[int, int] = {}
    while True:
        kind, tok = lx.next_token()
        if kind == "kw" and tok == "trailer":
            break
        if kind != "num":
            raise ValueError("decode_pdf: malformed xref section")
        _k, count = lx.next_token()
        start = int(tok)
        lx._skip_ws()
        for i in range(int(count)):
            entry = data[lx.p:lx.p + 20]
            if len(entry) < 18:
                raise EOFError("decode_pdf: truncated xref entry")
            if entry[17:18] == b"n":
                offsets[start + i] = int(entry[:10])
            lx.p += 20
    trailer = lx.value()
    if not isinstance(trailer, dict) or "Root" not in trailer:
        raise ValueError("decode_pdf: trailer /Root missing")
    return offsets, trailer


def _require(obj, key: str, what: str):
    """Structural access that keeps the corrupt-input contract: missing
    keys or non-dict nodes raise ValueError, never KeyError/
    AttributeError, so the quarantine path can classify them."""
    if not isinstance(obj, dict) or key not in obj:
        raise ValueError(f"decode_pdf: {what} has no /{key}")
    return obj[key]


def _load_obj(data: bytes, offsets: dict[int, int], num: int):
    if num not in offsets:
        raise ValueError(f"decode_pdf: object {num} not in xref")
    lx = _Lexer(data, offsets[num])
    k1, n1 = lx.next_token()
    k2, _g = lx.next_token()
    k3, t3 = lx.next_token()
    if k1 != "num" or int(n1) != num or k3 != "kw" or t3 != "obj":
        raise ValueError(f"decode_pdf: object header mismatch for {num}")
    val = lx.value()
    save = lx.p
    try:
        k, t = lx.next_token()
    except (EOFError, ValueError):
        return val, None
    if k == "kw" and t == "stream":
        if not isinstance(val, dict):
            # a stream's object body must be its dict; an array/scalar
            # followed by 'stream' is corrupt input, and .get() on it
            # would raise AttributeError past the quarantine contract
            raise ValueError(
                f"decode_pdf: stream object {num} body is not a dict"
            )
        # EOL after 'stream' is CRLF or LF
        p = lx.p
        if data[p:p + 2] == b"\r\n":
            p += 2
        elif data[p:p + 1] == b"\n":
            p += 1
        length = val.get("Length")
        if not isinstance(length, int):
            raise ValueError("decode_pdf: stream /Length must be direct")
        raw = data[p:p + length]
        if len(raw) < length:
            raise EOFError("decode_pdf: truncated stream")
        filt = val.get("Filter")
        if filt == "FlateDecode":
            try:
                raw = zlib.decompress(raw)
            except zlib.error as e:
                raise ValueError(
                    f"decode_pdf: corrupt flate stream ({e})") from e
        elif filt is not None:
            raise ValueError(f"decode_pdf: filter {filt!r} not supported")
        return val, raw
    lx.p = save
    return val, None


def _deref(data, offsets, v):
    if isinstance(v, tuple) and v and v[0] == "ref":
        return _load_obj(data, offsets, v[1])[0]
    return v


def _extract_text(content: bytes, page: int) -> list:
    """Evaluate the text operators of one content stream."""
    lx = _Lexer(content)
    out = []
    stack: list = []
    tx = ty = 0.0
    in_text = False
    while True:
        try:
            kind, tok = lx.next_token()
        except EOFError:
            break
        if kind in ("num", "str", "name"):
            stack.append(tok)
            continue
        if kind == "[":
            arr = []
            while True:
                k, t = lx.next_token()
                if k == "]":
                    break
                if k in ("num", "str"):
                    arr.append(t)
            stack.append(arr)
            continue
        if kind != "kw":
            stack.clear()
            continue
        if tok == "BT":
            in_text, tx, ty = True, 0.0, 0.0
        elif tok == "ET":
            in_text = False
        elif tok in ("Td", "TD") and len(stack) >= 2:
            ty += float(stack[-1])
            tx += float(stack[-2])
        elif tok == "Tm" and len(stack) >= 6:
            tx, ty = float(stack[-2]), float(stack[-1])
        elif tok == "Tj" and stack and in_text:
            if isinstance(stack[-1], str):
                out.append((page, tx, ty, stack[-1]))
        elif tok == "TJ" and stack and in_text:
            arr = stack[-1]
            if isinstance(arr, list):
                text = "".join(s for s in arr if isinstance(s, str))
                out.append((page, tx, ty, text))
        stack.clear()
    return out


def decode_pdf(data: bytes) -> list:
    """PDF bytes -> [(page, x, y, text), ...] in content-stream order
    (1-based pages; x/y are unsorted text-space coordinates — reading
    order is the caller's (page, -y, x) sort)."""
    if not data.startswith(b"%PDF-"):
        raise ValueError("decode_pdf: missing %PDF header")
    offsets, trailer = _xref_offsets(data)
    root = _deref(data, offsets, trailer["Root"])
    pages_node = _deref(data, offsets,
                        _require(root, "Pages", "catalog"))
    kids = _require(pages_node, "Kids", "page tree")
    out = []
    for i, kid in enumerate(kids):
        page_obj = _deref(data, offsets, kid)
        if not isinstance(page_obj, dict) or page_obj.get("Type") != "Page":
            raise ValueError("decode_pdf: nested page trees not supported "
                             "(documented seam)")
        contents = page_obj.get("Contents")
        if contents is None:
            continue
        if isinstance(contents, tuple) and contents[0] == "ref":
            _cv, raw = _load_obj(data, offsets, contents[1])
        else:
            raise ValueError("decode_pdf: /Contents must be a stream ref")
        if raw is None:
            raise ValueError("decode_pdf: /Contents object has no stream")
        out.extend(_extract_text(raw, i + 1))
    return out


def page_count(data: bytes) -> int:
    """The reference's page_count surface (01_pdf_reader.py:62-66)."""
    offsets, trailer = _xref_offsets(data)
    root = _deref(data, offsets, trailer["Root"])
    pages_node = _deref(data, offsets,
                        _require(root, "Pages", "catalog"))
    n = _require(pages_node, "Count", "page tree")
    if not isinstance(n, int):
        raise ValueError("decode_pdf: /Count missing on page tree")
    return n


# ------------------------------------------------------------ Spark

from collections.abc import Iterator  # noqa: E402

import pandas as pd  # noqa: E402
from pyspark.sql import DataFrame, SparkSession, Window, functions as F  # noqa: E402

_HEX = "0123456789abcdef"


def _nib(md, i: int):
    return F.instr(F.lit(_HEX), F.substring(md, i, 1)) - F.lit(1)


def _runs_for(doc_id: int, n1: int, n2: int, n3: int) -> list:
    """Deterministic per-doc text-run geometry from md5 nibbles — the
    same arithmetic the oracle states in SQL, so the driver hash-check
    pins the writer+reader round trip bit-exactly."""
    pages = []
    for p in range(1, 2 + (n1 % 3)):
        runs = []
        for r in range(1, 3 + ((n2 + p) % 3)):
            x = 60 + 10 * ((p * 7 + r * 3) % 9)
            y = 720 - 40 * r
            text = f"doc {doc_id} pg {p} run {r}"
            if (n3 + p + r) % 2 == 0:
                text += " (note)"
            mode = ("td", "tm", "tj")[(p + r) % 3]
            runs.append((x, y, text, mode))
        pages.append(runs)
    return pages


def _docs_nibs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    md = F.md5(F.col("doc_id").cast("string"))
    return d.select(
        "doc_id",
        _nib(md, 1).cast("int").alias("n1"),
        _nib(md, 2).cast("int").alias("n2"),
        _nib(md, 3).cast("int").alias("n3"),
    )


def pdf_text_spans(nibs: DataFrame) -> DataFrame:
    """(doc_id, n1, n2, n3) -> decoded text spans with reading order.
    The full codec runs per row: synthesize runs -> encode_pdf ->
    decode_pdf; the (page, -y, x) reading-order sort is Spark-side."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            rows = []
            for doc_id, n1, n2, n3 in zip(
                pdf_b["doc_id"], pdf_b["n1"], pdf_b["n2"], pdf_b["n3"]
            ):
                payload = encode_pdf(
                    _runs_for(int(doc_id), int(n1), int(n2), int(n3))
                )
                for page, x, y, text in decode_pdf(payload):
                    rows.append(
                        (int(doc_id), int(page), int(x), int(y), text)
                    )
            yield pd.DataFrame(
                rows, columns=["doc_id", "page", "x", "y", "text"]
            )

    decoded = nibs.mapInPandas(
        work,
        schema="doc_id long, page long, x long, y long, text string",
    )
    w = Window.partitionBy("doc_id").orderBy(
        "page", F.col("y").desc(), "x", "text"
    )
    return decoded.withColumn(
        "reading_order", F.row_number().over(w).cast("long")
    )


def pdf_doc_audit(nibs: DataFrame) -> DataFrame:
    """Warn-and-continue audit: payloads for md5-gated docs (n3 even)
    are truncated AFTER encoding; decode must quarantine those (ok=false,
    zero counts) while healthy docs report page/span/char totals."""

    def work(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf_b in batches:
            rows = []
            for doc_id, n1, n2, n3 in zip(
                pdf_b["doc_id"], pdf_b["n1"], pdf_b["n2"], pdf_b["n3"]
            ):
                payload = encode_pdf(
                    _runs_for(int(doc_id), int(n1), int(n2), int(n3))
                )
                if int(n3) % 2 == 0:
                    payload = payload[: len(payload) // 2]
                try:
                    spans = decode_pdf(payload)
                    npg = page_count(payload)
                    rows.append(
                        (int(doc_id), True, npg, len(spans),
                         sum(len(t) for *_xy, t in spans))
                    )
                except (ValueError, EOFError, zlib.error):
                    rows.append((int(doc_id), False, 0, 0, 0))
            yield pd.DataFrame(
                rows,
                columns=["doc_id", "ok", "n_pages", "n_spans", "n_chars"],
            )

    return nibs.mapInPandas(
        work,
        schema=("doc_id long, ok boolean, n_pages long, "
                "n_spans long, n_chars long"),
    )


def q_pdf_text_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pdf_text_spans(_docs_nibs(spark, sf_dir))


def q_pdf_doc_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pdf_doc_audit(_docs_nibs(spark, sf_dir))


# ------------------------------------------------------------ oracles

_SQL_NIBS = """
SELECT doc_id,
  (strpos('0123456789abcdef', substring(md5(doc_id::VARCHAR), 1, 1)) - 1)
    AS n1,
  (strpos('0123456789abcdef', substring(md5(doc_id::VARCHAR), 2, 1)) - 1)
    AS n2,
  (strpos('0123456789abcdef', substring(md5(doc_id::VARCHAR), 3, 1)) - 1)
    AS n3
FROM documents
"""

_SQL_RUNS = f"""
WITH nibs AS ({_SQL_NIBS}),
pg AS (
  SELECT doc_id, n2, n3,
    unnest(generate_series(1, 1 + (n1 % 3)))::BIGINT AS page
  FROM nibs
),
runs AS (
  SELECT doc_id, n3, page,
    unnest(generate_series(1, 2 + ((n2 + page) % 3)))::BIGINT AS r
  FROM pg
)
SELECT doc_id, page,
  (60 + 10 * ((page * 7 + r * 3) % 9))::BIGINT AS x,
  (720 - 40 * r)::BIGINT AS y,
  'doc ' || doc_id::VARCHAR || ' pg ' || page::VARCHAR
    || ' run ' || r::VARCHAR
    || CASE WHEN (n3 + page + r) % 2 = 0 THEN ' (note)' ELSE '' END
    AS text
FROM runs
"""

SQL_PDF_TEXT_SPANS = f"""
WITH spans AS ({_SQL_RUNS})
SELECT doc_id, page, x, y, text,
  row_number() OVER (
    PARTITION BY doc_id ORDER BY page, y DESC, x, text
  )::BIGINT AS reading_order
FROM spans
"""

SQL_PDF_DOC_AUDIT = f"""
WITH spans AS ({_SQL_RUNS}),
nibs AS ({_SQL_NIBS})
SELECT n.doc_id,
  (n.n3 % 2 <> 0) AS ok,
  CASE WHEN n.n3 % 2 <> 0 THEN 1 + (n.n1 % 3) ELSE 0 END::BIGINT
    AS n_pages,
  CASE WHEN n.n3 % 2 <> 0 THEN count(s.text) ELSE 0 END::BIGINT
    AS n_spans,
  CASE WHEN n.n3 % 2 <> 0 THEN coalesce(sum(length(s.text)), 0)
       ELSE 0 END::BIGINT AS n_chars
FROM nibs n LEFT JOIN spans s ON n.doc_id = s.doc_id
GROUP BY n.doc_id, n.n1, n.n3
"""


QUERIES = {
    "pdf_text_spans": q_pdf_text_spans,
    "pdf_doc_audit": q_pdf_doc_audit,
}
ORACLE_SQL = {
    "pdf_text_spans": SQL_PDF_TEXT_SPANS,
    "pdf_doc_audit": SQL_PDF_DOC_AUDIT,
}
