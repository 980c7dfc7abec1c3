"""Scalar / window text operators (SURVEY §2.5-§2.7).

C14 whitespace collapse, C7 angle normalization, C16 sentinel split,
C9 filename templating, C15 MIME sniff, C11 object-name parse,
W1 reading-order rank, O5 top-1 detection. All JVM-side expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def q_whitespace_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C14: strip + collapse blank-line runs to one newline
    (step6/02_text_result_manager.py:57-61). Newlines are manufactured from
    the plain-text corpus first so the collapse is exercised."""
    d = _docs(spark, sf_dir).select(
        "doc_id", F.regexp_replace("text", "e", "\n\n").alias("noisy")
    )
    return d.select(
        "doc_id",
        F.trim(F.regexp_replace("noisy", "\n{2,}", "\n")).alias("collapsed"),
        F.length(F.trim(F.regexp_replace("noisy", "\n{2,}", "\n"))).cast("long")
        .alias("collapsed_len"),
    )


SQL_WHITESPACE_COLLAPSE = """
WITH d AS (
  SELECT doc_id, regexp_replace(text, 'e', chr(10) || chr(10), 'g') AS noisy
  FROM documents
)
SELECT doc_id,
       TRIM(regexp_replace(noisy, '\\n{2,}', chr(10), 'g')) AS collapsed,
       LENGTH(TRIM(regexp_replace(noisy, '\\n{2,}', chr(10), 'g')))
         AS collapsed_len
FROM d
"""


def q_angle_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C7: normalize arbitrary degree values into {0, 90, -90, 180} via
    +/-45-degree bands (step3/01_orientation_detector.py:221-275)."""
    e = _events(spark, sf_dir).select(
        "event_id", ((F.col("event_id") * 37) % 360 - 180).alias("deg")
    )
    angle = (
        F.when((F.col("deg") >= -45) & (F.col("deg") <= 45), 0)
        .when((F.col("deg") > 45) & (F.col("deg") <= 135), 90)
        .when((F.col("deg") >= -135) & (F.col("deg") < -45), -90)
        .otherwise(180)
    )
    return e.select("event_id", "deg", angle.alias("angle"))


SQL_ANGLE_NORMALIZE = """
WITH e AS (
  SELECT event_id, (event_id * 37) % 360 - 180 AS deg FROM events
)
SELECT event_id, deg,
       CASE WHEN deg >= -45 AND deg <= 45 THEN 0
            WHEN deg > 45 AND deg <= 135 THEN 90
            WHEN deg >= -135 AND deg < -45 THEN -90
            ELSE 180 END AS angle
FROM e
"""


def q_sentinel_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C16: partition an ordered stream into contracts at sentinel markers
    via a running-sum window (api/main.py:970-1009). Sentinel = 'signup'
    events; contract index = cumulative sentinel count per user."""
    e = _events(spark, sf_dir)
    w = (
        W.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    idx = F.sum((F.col("event_type") == "signup").cast("long")).over(w)
    return (
        e.select("user_id", "event_id", idx.alias("contract_idx"))
        .groupBy("user_id", "contract_idx")
        .agg(F.count("*").alias("n_events"), F.min("event_id").alias("first_event"))
    )


SQL_SENTINEL_SPLIT = """
WITH idx AS (
  SELECT user_id, event_id,
         CAST(SUM(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS contract_idx
  FROM events
)
SELECT user_id, contract_idx, COUNT(*) AS n_events,
       MIN(event_id) AS first_event
FROM idx
GROUP BY user_id, contract_idx
"""


def q_reading_order_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W1: reading-order rank — row_number within partition by sort key
    (the final span `order` assignment; step7/01:50-52)."""
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "user_id", "event_id", F.row_number().over(w).cast("long").alias("rank")
    )


SQL_READING_ORDER_RANK = """
SELECT user_id, event_id,
       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rank
FROM events
"""


def q_top1_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5: top-1 per group by descending confidence (YOLO best-box pick,
    step2/03_dewarping_engine.py:79-103), threshold 0.6 of max value."""
    e = _events(spark, sf_dir)
    w = W.partitionBy("user_id").orderBy(F.desc("value"), "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter((F.col("rn") == 1) & (F.col("value") > 0.6))
        .select("user_id", "event_id", "value")
    )


SQL_TOP1_DETECTION = """
WITH ranked AS (
  SELECT user_id, event_id, value,
         ROW_NUMBER() OVER (PARTITION BY user_id
                            ORDER BY value DESC, event_id) AS rn
  FROM events
)
SELECT user_id, event_id, value FROM ranked WHERE rn = 1 AND value > 0.6
"""


def q_filename_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9: zero-padded filename templating (page_{n:03d}_mask{m};
    step5/03_step5_processor.py:73) — kept only for media_refs, ordering
    always uses numeric columns."""
    d = _docs(spark, sf_dir)
    return d.select(
        "doc_id",
        F.format_string(
            "page_%03d_mask%d", (F.col("doc_id") % 1000).cast("int"),
            (F.col("doc_id") % 5).cast("int")
        ).alias("group_key"),
    )


SQL_FILENAME_FORMAT = """
SELECT doc_id,
       printf('page_%03d_mask%d', CAST(doc_id % 1000 AS INT),
              CAST(doc_id % 5 AS INT)) AS group_key
FROM documents
"""


def q_mime_sniff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C15: extension -> MIME ladder (step6/04:111-116)."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat(
            F.lit("f"),
            F.col("doc_id").cast("string"),
            F.element_at(
                F.lit([".jpg", ".png", ".pdf", ".txt"]),
                (F.col("doc_id") % 4).cast("int") + 1,
            ),
        ).alias("fname"),
    )
    mime = (
        F.when(F.col("fname").endswith(".jpg"), "image/jpeg")
        .when(F.col("fname").endswith(".png"), "image/png")
        .when(F.col("fname").endswith(".pdf"), "application/pdf")
        .otherwise("application/octet-stream")
    )
    return d.select("doc_id", "fname", mime.alias("mime"))


SQL_MIME_SNIFF = """
WITH d AS (
  SELECT doc_id,
         'f' || doc_id ||
         (['.jpg', '.png', '.pdf', '.txt'])[CAST(doc_id % 4 AS INT) + 1]
           AS fname
  FROM documents
)
SELECT doc_id, fname,
       CASE WHEN fname LIKE '%.jpg' THEN 'image/jpeg'
            WHEN fname LIKE '%.png' THEN 'image/png'
            WHEN fname LIKE '%.pdf' THEN 'application/pdf'
            ELSE 'application/octet-stream' END AS mime
FROM d
"""


def q_object_name_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C11: split 'workspace/project/filename' object names on '/'
    (api/main.py:580-590)."""
    d = _docs(spark, sf_dir).select(
        "doc_id",
        F.concat_ws(
            "/",
            F.concat(F.lit("ws"), (F.col("doc_id") % 7).cast("string")),
            F.col("source"),
            F.concat(F.col("doc_id").cast("string"), F.lit(".pdf")),
        ).alias("object_name"),
    )
    parts = F.split("object_name", "/")
    return d.select(
        "doc_id",
        "object_name",
        F.element_at(parts, 1).alias("workspace"),
        F.element_at(parts, 2).alias("project"),
        F.element_at(parts, 3).alias("filename"),
    )


SQL_OBJECT_NAME_PARSE = """
WITH d AS (
  SELECT doc_id,
         'ws' || (doc_id % 7) || '/' || source || '/' || doc_id || '.pdf'
           AS object_name
  FROM documents
)
SELECT doc_id, object_name,
       str_split(object_name, '/')[1] AS workspace,
       str_split(object_name, '/')[2] AS project,
       str_split(object_name, '/')[3] AS filename
FROM d
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization: session index = running count of gaps > 30 minutes
    per user (lag + cumulative sum) — the batch equivalent of
    session_window; exercises stacked window functions."""
    e = _events(spark, sf_dir)
    w_order = W.partitionBy("user_id").orderBy("ts", "event_id")
    # parquet gives TIMESTAMP_NTZ, which can't cast straight to long;
    # go via timestamp (session TZ is pinned UTC, so this is exact)
    epoch = F.col("ts").cast("timestamp").cast("long")
    gap = epoch - F.lag(epoch).over(w_order)
    e = e.withColumn(
        "new_session",
        F.when(gap.isNull() | (gap > 1800), 1).otherwise(0),
    )
    w_run = w_order.rowsBetween(W.unboundedPreceding, 0)
    e = e.withColumn("session_idx", F.sum("new_session").over(w_run))
    return e.groupBy("user_id", "session_idx").agg(
        F.count("*").alias("n_events"),
        F.min("event_id").alias("first_event"),
        F.max("event_id").alias("last_event"),
    )


SQL_SESSIONIZE = """
WITH g AS (
  SELECT user_id, event_id, ts,
         CASE WHEN LAG(ts) OVER w IS NULL
                   OR epoch(ts) - epoch(LAG(ts) OVER w) > 1800
              THEN 1 ELSE 0 END AS new_session
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), s AS (
  SELECT user_id, event_id,
         CAST(SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                     ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_idx
  FROM g
)
SELECT user_id, session_idx, COUNT(*) AS n_events,
       MIN(event_id) AS first_event, MAX(event_id) AS last_event
FROM s
GROUP BY user_id, session_idx
"""




def q_filename_parse_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C10 + F8/F9/F10: the reference's filename-coupled session-directory
    sweep as one declarative pass. Per doc, a deterministic 5-file listing
    is synthesized (two valid engine results, a metadata JSON, a page
    render, and another doc's file); then

      F8  — keep only names containing the doc basename
            (api/main.py:887-890),
      F9  — exclude integration_metadata*.json (api/main.py:891-901),
      F10 — keep only *_integrated_*.txt engine results (the glob pair,
            step7/01_text_integration_engine.py:47-48,117-118),
      C10 — parse the engine + (\\d{8}_\\d{6}) timestamp with the
            reference's validation regex and check the two engines'
            timestamps agree (utils/clean_ocr_result.py:142-193).
    """
    d = _docs(spark, sf_dir).select("doc_id")
    base = F.format_string("doc%06d", F.col("doc_id").cast("int"))
    other = F.format_string("doc%06d", (F.col("doc_id") + 1).cast("int"))
    ts = F.format_string(
        "%08d_%06d",
        (F.col("doc_id") * 37 % 100000000).cast("int"),
        (F.col("doc_id") * 13 % 1000000).cast("int"),
    )
    files = F.array(
        F.concat(base, F.lit("_document_ai_integrated_"), ts, F.lit(".txt")),
        F.concat(base, F.lit("_gemini_integrated_"), ts, F.lit(".txt")),
        F.concat(base, F.lit("_integration_metadata_"), ts, F.lit(".json")),
        F.concat(base, F.lit("_p001_mask1.png")),
        F.concat(other, F.lit("_gemini_integrated_"), ts, F.lit(".txt")),
    )
    listing = d.select("doc_id", base.alias("base"), F.explode(files).alias("fname"))
    kept = listing.filter(
        F.col("fname").contains(F.col("base"))                       # F8
        & ~(
            F.col("fname").contains("integration_metadata")
            & F.col("fname").endswith(".json")
        )                                                            # F9
        & F.col("fname").rlike(
            "_(document_ai|gemini)_integrated_.*\\.txt$"
        )                                                            # F10
    )
    parsed = kept.select(
        "doc_id",
        F.regexp_extract("fname", "_(document_ai|gemini)_integrated_", 1)
        .alias("engine"),
        F.regexp_extract(
            "fname", "_integrated_(\\d{8}_\\d{6})\\.txt$", 1
        ).alias("ts"),                                               # C10
    )
    per_doc = parsed.groupBy("doc_id").agg(
        F.count("*").alias("n_kept"),
        F.max(F.when(F.col("engine") == "document_ai", F.col("ts")))
        .alias("doc_ai_ts"),
        F.max(F.when(F.col("engine") == "gemini", F.col("ts")))
        .alias("gemini_ts"),
    )
    return per_doc.select(
        "doc_id",
        "n_kept",
        "doc_ai_ts",
        "gemini_ts",
        (F.col("doc_ai_ts") == F.col("gemini_ts")).alias("ts_valid"),
        F.when(F.col("doc_ai_ts") == F.col("gemini_ts"), F.col("doc_ai_ts"))
        .alias("common_id"),
    )


SQL_FILENAME_PARSE_FILTER = """
WITH d AS (
  SELECT doc_id,
         printf('doc%06d', CAST(doc_id AS INT)) AS base,
         printf('doc%06d', CAST(doc_id + 1 AS INT)) AS other,
         printf('%08d_%06d', CAST(doc_id * 37 % 100000000 AS INT),
                CAST(doc_id * 13 % 1000000 AS INT)) AS ts
  FROM documents
),
listing AS (
  SELECT doc_id, base, UNNEST([
    base || '_document_ai_integrated_' || ts || '.txt',
    base || '_gemini_integrated_' || ts || '.txt',
    base || '_integration_metadata_' || ts || '.json',
    base || '_p001_mask1.png',
    other || '_gemini_integrated_' || ts || '.txt'
  ]) AS fname
  FROM d
),
kept AS (
  SELECT doc_id, fname FROM listing
  WHERE contains(fname, base)
    AND NOT (contains(fname, 'integration_metadata')
             AND fname LIKE '%.json')
    AND regexp_matches(fname, '_(document_ai|gemini)_integrated_.*\\.txt$')
),
parsed AS (
  SELECT doc_id,
         regexp_extract(fname, '_(document_ai|gemini)_integrated_', 1)
           AS engine,
         regexp_extract(fname, '_integrated_(\\d{8}_\\d{6})\\.txt$', 1)
           AS ts
  FROM kept
),
per_doc AS (
  SELECT doc_id, COUNT(*) AS n_kept,
         MAX(CASE WHEN engine = 'document_ai' THEN ts END) AS doc_ai_ts,
         MAX(CASE WHEN engine = 'gemini' THEN ts END) AS gemini_ts
  FROM parsed GROUP BY doc_id
)
SELECT doc_id, n_kept, doc_ai_ts, gemini_ts,
       doc_ai_ts = gemini_ts AS ts_valid,
       CASE WHEN doc_ai_ts = gemini_ts THEN doc_ai_ts END AS common_id
FROM per_doc
"""




def q_progress_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2: the per-group progress index the reference logs
    (group_index = keys.index(k)+1 of i_total, step6/03:256) — a
    row_number window in group-key order plus the completion percentage.
    Log-only in the reference; here it doubles as the lineage column a
    monitoring sink would consume."""
    d = _docs(spark, sf_dir).select("doc_id")
    key = F.format_string(
        "page_%03d_mask%d",
        (F.col("doc_id") % 1000).cast("int"),
        (F.col("doc_id") % 5).cast("int"),
    )
    groups = d.select("doc_id", key.alias("group_key"))
    w = W.partitionBy(F.col("doc_id") % 10).orderBy("group_key", "doc_id")
    wtot = W.partitionBy(F.col("doc_id") % 10)
    return groups.select(
        (F.col("doc_id") % 10).cast("long").alias("batch"),
        "doc_id",
        "group_key",
        F.row_number().over(w).cast("long").alias("group_index"),
        F.count("*").over(wtot).alias("n_groups"),
        F.round(
            F.row_number().over(w) * 100.0 / F.count("*").over(wtot), 2
        ).alias("pct_done"),
    )


SQL_PROGRESS_INDEX = """
WITH g AS (
  SELECT doc_id % 10 AS batch, doc_id,
         printf('page_%03d_mask%d', CAST(doc_id % 1000 AS INT),
                CAST(doc_id % 5 AS INT)) AS group_key
  FROM documents
)
SELECT batch, doc_id, group_key,
       ROW_NUMBER() OVER (PARTITION BY batch ORDER BY group_key, doc_id)
         AS group_index,
       COUNT(*) OVER (PARTITION BY batch) AS n_groups,
       ROUND(ROW_NUMBER() OVER (PARTITION BY batch
                                ORDER BY group_key, doc_id)
             * 100.0 / COUNT(*) OVER (PARTITION BY batch), 2) AS pct_done
FROM g
"""


QUERIES = {
    "progress_index": q_progress_index,
    "filename_parse_filter": q_filename_parse_filter,
    "sessionize": q_sessionize,
    "whitespace_collapse": q_whitespace_collapse,
    "angle_normalize": q_angle_normalize,
    "sentinel_split": q_sentinel_split,
    "reading_order_rank": q_reading_order_rank,
    "top1_detection": q_top1_detection,
    "filename_format": q_filename_format,
    "mime_sniff": q_mime_sniff,
    "object_name_parse": q_object_name_parse,
}

ORACLE_SQL = {
    "progress_index": SQL_PROGRESS_INDEX,
    "filename_parse_filter": SQL_FILENAME_PARSE_FILTER,
    "sessionize": SQL_SESSIONIZE,
    "whitespace_collapse": SQL_WHITESPACE_COLLAPSE,
    "angle_normalize": SQL_ANGLE_NORMALIZE,
    "sentinel_split": SQL_SENTINEL_SPLIT,
    "reading_order_rank": SQL_READING_ORDER_RANK,
    "top1_detection": SQL_TOP1_DETECTION,
    "filename_format": SQL_FILENAME_FORMAT,
    "mime_sniff": SQL_MIME_SNIFF,
    "object_name_parse": SQL_OBJECT_NAME_PARSE,
}
