"""W3: overlap trimming between adjacent band texts.

The reference splits pages into 5 overlapping bands (10% overlap,
step5/01_image_splitter.py:55-69) and delegates the duplicate-text
removal at band seams to an LLM prompt (llm_prompts.yaml:167-194
``ocr_combination``). Deterministic replacement: for each adjacent pair
(band i, band i+1) within a page, trim from band i+1 its longest prefix
that equals a suffix of band i (the classic seam-dedup rule).

Spark shape: window ``lag(text)`` over (doc, page) ordered by band, then
a vectorized pandas UDF computing the longest suffix-prefix overlap per
pair. The LCS-style scan is not SQL-expressible; the driver records a
rows-only check and pytest verifies against a pure-Python oracle.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import DataFrame, SparkSession, Window as W, functions as F


def _suffix_prefix_overlap_quadratic(prev: str, cur: str) -> int:
    """Reference implementation (O(k^2) worst case) — kept as the fallback
    for pathological inputs containing every separator candidate, and as
    the equivalence oracle for the KMP version below."""
    k = min(len(prev), len(cur))
    for n in range(k, 0, -1):
        if prev[-n:] == cur[:n]:
            return n
    return 0


_SEPS = ("\x00", "\x01", "\x02")


def suffix_prefix_overlap(prev: str, cur: str) -> int:
    """Length of the longest prefix of ``cur`` equal to a suffix of
    ``prev`` (bounded by the shorter string). O(k) via the KMP failure
    function of ``cur[:k] + sep + prev[-k:]`` — the failure value at the
    end is exactly the longest prefix-of-cur == suffix-of-prev (the
    separator guarantees it never exceeds k)."""
    k = min(len(prev), len(cur))
    if k == 0:
        return 0
    a, b = cur[:k], prev[-k:]
    for sep in _SEPS:
        if sep not in a and sep not in b:
            break
    else:  # pragma: no cover - input contains every control separator
        return _suffix_prefix_overlap_quadratic(prev, cur)
    s = a + sep + b
    fail = [0] * len(s)
    j = 0
    for i in range(1, len(s)):
        while j and s[i] != s[j]:
            j = fail[j - 1]
        if s[i] == s[j]:
            j += 1
        fail[i] = j
    return fail[-1]


def trim_overlap_py(prev: str | None, cur: str) -> str:
    if not prev:
        return cur
    return cur[suffix_prefix_overlap(prev, cur) :]


def _make_trim_udf():
    # built lazily: pandas_udf needs an active session to parse its DDL
    @F.pandas_udf("string")
    def _trim_udf(prev: pd.Series, cur: pd.Series) -> pd.Series:
        out = []
        for p, c in zip(prev, cur):
            if c is None:
                out.append(None)
            elif p is None:
                out.append(c)
            else:
                out.append(trim_overlap_py(p, c))
        return pd.Series(out, dtype=object)

    return _trim_udf


def q_overlap_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Band texts synthesized from documents (band i = a window of the doc
    text with 20% overlap), then seam-deduped. Returns the trimmed band
    texts with their lengths."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text", F.length("text").alias("n")
    ).filter(F.col("n") >= 50)
    bands = d.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("band"),
        F.expr(
            "substring(text, cast(band * (n div 5) + 1 as int),"
            " cast((n div 5) + (n div 25) as int))"
        ).alias("band_text"),
    )
    w = W.partitionBy("doc_id").orderBy("band")
    trim_udf = _make_trim_udf()
    trimmed = bands.withColumn("prev_text", F.lag("band_text").over(w)).withColumn(
        "trimmed", trim_udf(F.col("prev_text"), F.col("band_text"))
    )
    return trimmed.select(
        "doc_id",
        "band",
        F.length("band_text").cast("long").alias("raw_len"),
        F.length("trimmed").cast("long").alias("trimmed_len"),
        "trimmed",
    )


# DuckDB twin: the longest suffix-prefix overlap as a list comprehension
# (max n in 1..k with suffix(prev, n) == prefix(cur, n)) — quadratic in
# SQL where the Spark side runs the O(k) KMP kernel, but value-identical.
SQL_OVERLAP_TRIM = """
WITH d AS (
  SELECT doc_id, text, LENGTH(text) AS n FROM documents
  WHERE LENGTH(text) >= 50
),
bands AS (
  SELECT doc_id, CAST(t.b AS INT) AS band,
         substr(text, CAST(t.b * (n // 5) + 1 AS INT),
                CAST((n // 5) + (n // 25) AS INT)) AS band_text
  FROM d, UNNEST(range(0, 4)) AS t(b)
),
paired AS (
  SELECT doc_id, band, band_text,
         LAG(band_text) OVER (PARTITION BY doc_id ORDER BY band) AS prev_text
  FROM bands
),
ov AS (
  SELECT doc_id, band, band_text,
    CASE WHEN prev_text IS NULL THEN 0 ELSE COALESCE(list_max(
      [CAST(n AS INT) FOR n IN
         range(1, LEAST(LENGTH(prev_text), LENGTH(band_text)) + 1)
       IF substr(prev_text, CAST(LENGTH(prev_text) - n + 1 AS INT))
          = substr(band_text, 1, CAST(n AS INT))]), 0) END AS k
  FROM paired
)
SELECT doc_id, band,
       LENGTH(band_text) AS raw_len,
       LENGTH(band_text) - k AS trimmed_len,
       substr(band_text, CAST(k + 1 AS INT)) AS trimmed
FROM ov
"""

QUERIES = {"overlap_trim": q_overlap_trim}
ORACLE_SQL: dict[str, str] = {"overlap_trim": SQL_OVERLAP_TRIM}
