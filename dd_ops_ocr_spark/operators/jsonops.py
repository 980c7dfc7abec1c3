"""JSON / base64 / timestamp scalar operators (SURVEY §2.7 C6, C12, C13).

The reference leniently parses LLM JSON replies (C6,
step2/01_llm_judgment.py:111-160), base64-decodes PubSub payloads (C12,
api/main.py:532-547), and stamps session ids (C13,
main_pipeline.py:343-345). All JVM-side here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6: JSON field extraction with lenient fallback — parse props.k;
    if the payload is not valid JSON the value is null (the reference's
    three-pattern fallback chain collapses to null-propagation here)."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    k = F.get_json_object("props", "$.k").cast("long")
    return e.select(
        "event_id",
        k.alias("k"),
        F.when(k.isNull(), "fallback_raw").otherwise("parsed").alias("parse_mode"),
    )


SQL_JSON_EXTRACT = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k,
       CASE WHEN json_extract(props, '$.k') IS NULL
            THEN 'fallback_raw' ELSE 'parsed' END AS parse_mode
FROM events
"""


def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C6 through Spark's VARIANT type (the engine-native semi-
    structured path): try_parse_json once into an open-schema variant
    column, typed variant_get extraction, then a grouped report over
    the extracted field. try_parse_json (NOT parse_json, which is
    strict and would kill the query on one malformed payload in 10^12
    rows) keeps C6's lenient null-fallback contract; the binary
    variant encoding parses the JSON ONCE per row and serves every
    later path extraction from the encoded form — the right shape
    when many fields are pulled from one payload (get_json_object
    re-parses the string per call). DuckDB's JSON type plays the same
    role in the oracle."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    v = F.try_parse_json("props")
    k = F.variant_get(v, "$.k", "long")
    return (
        e.select(F.pmod(k, F.lit(10)).alias("k_mod"), k.alias("k"))
        .groupBy("k_mod")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.sum("k").cast("long").alias("k_sum"),
        )
    )


SQL_VARIANT_EXTRACT = """
SELECT CAST(json_extract(props, '$.k') AS BIGINT) % 10 AS k_mod,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(json_extract(props, '$.k') AS BIGINT)) AS BIGINT)
         AS k_sum
FROM events
GROUP BY 1
"""


def q_base64_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C12: base64 encode/decode roundtrip of the doc text (PubSub payload
    decode; api/main.py:532-547)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    b64 = F.base64(F.col("text").cast("binary"))
    return d.select(
        "doc_id",
        F.substring(b64, 1, 24).alias("b64_prefix"),
        F.length(F.unbase64(b64).cast("string")).cast("long").alias("decoded_len"),
        (F.unbase64(b64).cast("string") == F.col("text")).cast("int")
        .alias("roundtrip_ok"),
    )


SQL_BASE64_ROUNDTRIP = """
SELECT doc_id,
       SUBSTR(to_base64(encode(text)), 1, 24) AS b64_prefix,
       LENGTH(decode(from_base64(to_base64(encode(text))))) AS decoded_len,
       CAST(decode(from_base64(to_base64(encode(text)))) = text AS INT)
         AS roundtrip_ok
FROM documents
"""


def q_session_id_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C13: session-id timestamp formatting (strftime('%Y%m%d_%H%M%S');
    main_pipeline.py:343-345). Event ts stands in for the wall clock so
    the output is deterministic."""
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    ts = F.col("ts").cast("timestamp")
    return e.select(
        "event_id",
        F.date_format(ts, "yyyyMMdd_HHmmss").alias("session_id"),
        F.date_format(ts, "yyyy-MM-dd").alias("day"),
    )


SQL_SESSION_ID_FORMAT = """
SELECT event_id,
       strftime(ts, '%Y%m%d_%H%M%S') AS session_id,
       strftime(ts, '%Y-%m-%d') AS day
FROM events
"""


def q_id_generation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C17: deterministic id generation — the reference's
    '{epoch_ms}-{rand6}' risk ids (api/main.py:1169-1183) become content
    hashes (reproducible across retries, the property the reference's
    random ids lack)."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return d.select(
        "doc_id",
        F.substring(
            F.md5(F.concat_ws("|", F.col("doc_id").cast("string"), "text")), 1, 16
        ).alias("stable_id"),
    )


SQL_ID_GENERATION = """
SELECT doc_id,
       SUBSTR(md5(doc_id || '|' || text), 1, 16) AS stable_id
FROM documents
"""


QUERIES = {
    "id_generation": q_id_generation,
    "json_extract": q_json_extract,
    "variant_extract": q_variant_extract,
    "base64_roundtrip": q_base64_roundtrip,
    "session_id_format": q_session_id_format,
}

ORACLE_SQL = {
    "id_generation": SQL_ID_GENERATION,
    "json_extract": SQL_JSON_EXTRACT,
    "variant_extract": SQL_VARIANT_EXTRACT,
    "base64_roundtrip": SQL_BASE64_ROUNDTRIP,
    "session_id_format": SQL_SESSION_ID_FORMAT,
}
