"""Charset sniffing + transcoding — web pages arrive as BYTES in mixed
encodings; a crawl-scale extraction pipeline must detect the encoding
and normalize to UTF-8 before any text operator runs.

Reference analogue: the byte-level MIME/type sniffing before routing in
`src/modules/step0/01_pre_check.py` — decide what the bytes ARE before
touching their content; here the decision is the encoding, made by the
standard two-probe heuristic real browsers/crawlers use first:

1. UTF-16LE BOM (FF FE) prefix  -> UTF-16LE, strip BOM;
2. else bytes decode as VALID UTF-8 (no U+FFFD replacement) -> UTF-8;
3. else -> ISO-8859-1 (latin-1 never fails, the classic web fallback).

The plant encodes each document's text (plus a fixed non-ASCII marker,
so every branch genuinely exercises multi-byte/high-byte paths) in an
md5-gated charset; the operator sniffs and decodes the bytes back. The
oracle states the ROUND TRIP in closed form — original text + marker,
charset from the gate — so a sniffing bug (BOM missed, validity probe
inverted) or a lossy decode hash-mismatches immediately.

Scale shape: pure per-row column math (encode/decode/substring are
JVM built-ins), zero exchanges, rides the scan at any corpus size.

Seams (documented): UTF-16BE / UTF-32 BOMs, charset= hints from HTTP
headers or <meta> (those arrive via the WARC HTTP split and would
simply override the sniff), windows-1252's 0x80-0x9F remapping.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dd_ops_ocr_spark.operators.urlops import _EVEN_IN, _EVEN_NIBBLES

_U16_NIB, _LAT_NIB = 15, 16      # free in the md5(doc_id) keyspace
# ' école' — 0xE9 in latin-1 (an INVALID UTF-8 prefix when followed by
# ASCII, which is what makes branch 3 detectable), two-byte 0xC3 0xA9
# in UTF-8 (valid multi-byte, exercising branch 2's validity probe).
_MARKER = " école"
_BOM_LE = bytes([0xFF, 0xFE])


def plant_encoded(docs: DataFrame) -> DataFrame:
    """(doc_id, text) -> (doc_id, raw binary): text+marker encoded in
    the gated charset — nibble 15 even: BOM + UTF-16LE; else nibble 16
    even: ISO-8859-1; else UTF-8.

    PLANT-ONLY dependence (same standard as warc._pages): the latin-1
    branch requires the corpus text be Latin-1-encodable — a non-Latin-1
    character on a nibble-16-even doc raises MALFORMED_CHARACTER_CODING
    under Spark 4's codified encode (and would break the closed-form
    round-trip oracle either way). The generated documents table is
    ASCII, which satisfies this; ``sniff_decode`` itself has no such
    restriction."""
    md = F.md5(F.col("doc_id").cast("string"))
    txt = F.concat(F.col("text"), F.lit(_MARKER))
    raw = (
        F.when(
            F.substring(md, _U16_NIB, 1).isin(_EVEN_NIBBLES),
            F.concat(F.lit(_BOM_LE), F.encode(txt, "UTF-16LE")),
        )
        .when(
            F.substring(md, _LAT_NIB, 1).isin(_EVEN_NIBBLES),
            F.encode(txt, "ISO-8859-1"),
        )
        .otherwise(F.encode(txt, "UTF-8"))
    )
    return docs.select("doc_id", raw.alias("raw"))


def sniff_decode(pages: DataFrame) -> DataFrame:
    """(doc_id, raw) -> (doc_id, charset, text): the two-probe sniff
    then the matching decode. The UTF-8 validity probe is Spark 4's
    ``is_valid_utf8`` over the raw bytes (binary->string cast wraps the
    bytes unvalidated) — NOT ``decode(raw, 'UTF-8')``, which under
    Spark 4's codified behavior RAISES MALFORMED_CHARACTER_CODING on
    invalid input instead of substituting U+FFFD, so probing with it
    would crash on exactly the rows the probe exists to detect."""
    bom = F.substring("raw", 1, 2) == F.lit(_BOM_LE)
    # substring on binary is byte-indexed; length() is octet length
    body16 = F.expr("substring(raw, 3, length(raw) - 2)")
    valid8 = F.is_valid_utf8(F.col("raw").cast("string"))
    charset = (
        F.when(bom, F.lit("utf-16le"))
        .when(valid8, F.lit("utf-8"))
        .otherwise(F.lit("iso-8859-1"))
    )
    text = (
        F.when(bom, F.decode(body16, "UTF-16LE"))
        .when(valid8, F.col("raw").cast("string"))
        .otherwise(F.decode("raw", "ISO-8859-1"))
    )
    return pages.select(
        "doc_id", charset.alias("charset"), text.alias("text")
    )


def q_charset_transcode(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    return sniff_decode(plant_encoded(docs))


def _sql() -> str:
    u16 = f"substring(md5(doc_id::VARCHAR), {_U16_NIB}, 1) IN ({_EVEN_IN})"
    lat = f"substring(md5(doc_id::VARCHAR), {_LAT_NIB}, 1) IN ({_EVEN_IN})"
    return f"""
SELECT doc_id,
  CASE WHEN {u16} THEN 'utf-16le'
       WHEN {lat} THEN 'iso-8859-1'
       ELSE 'utf-8' END AS charset,
  text || ' école' AS text
FROM documents
"""


SQL_CHARSET_TRANSCODE = _sql()

QUERIES = {
    "charset_transcode": q_charset_transcode,
}
ORACLE_SQL = {
    "charset_transcode": SQL_CHARSET_TRANSCODE,
}
