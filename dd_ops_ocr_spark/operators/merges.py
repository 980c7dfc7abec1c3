"""Merge / aggregation operators (SURVEY §2.4 A1-A16).

The reference merges per-page judgment results across split images
(step4/03_step4_processor.py:144-251); here the same semantics run as
hash aggregates over testdata tables. All JVM-side built-ins — map-side
partial aggregation and whole-stage codegen apply; at 100 TB these are
single-shuffle hash aggs on the group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def _li(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/lineitem.parquet")


def _docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def q_judgment_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1+A2+A3+A4: per 'page' (l_orderkey), merge per-image judgments:
      * page_count: sum of per-image counts clamped to [1,3]
        (step4/03:171-221)
      * has_table_elements: boolean OR, stringified 'True'/'False'
        (step4/03:160-169 — the reference stringifies the merged bool)
      * readability: worst-of none<minor<major (step4/03:179-233)
      * confidence: mean rounded to 3 (step4/03:195-231)
    """
    li = _li(spark, sf_dir).select(
        "l_orderkey",
        (F.lit(1) + (F.col("l_linenumber") % 3)).alias("img_page_count"),
        (F.col("l_quantity") > 25).alias("img_has_tables"),
        (F.col("l_linenumber") % 3).alias("read_ord"),
        (F.col("l_discount")).alias("img_conf"),
    )
    merged = li.groupBy("l_orderkey").agg(
        F.least(
            F.greatest(F.sum("img_page_count"), F.lit(1).cast("long")),
            F.lit(3).cast("long"),
        ).alias("page_count"),
        F.when(F.max(F.col("img_has_tables").cast("int")) == 1, "True")
        .otherwise("False")
        .alias("has_table_elements"),
        F.element_at(
            F.lit(["none", "minor", "major"]), F.max("read_ord").cast("int") + 1
        ).alias("readability"),
        F.round(F.avg("img_conf"), 3).alias("confidence"),
    )
    return merged


SQL_JUDGMENT_MERGE = """
SELECT l_orderkey,
       CAST(LEAST(GREATEST(SUM(1 + (l_linenumber % 3)), 1), 3) AS BIGINT) AS page_count,
       CASE WHEN BOOL_OR(l_quantity > 25) THEN 'True' ELSE 'False' END
         AS has_table_elements,
       (['none', 'minor', 'major'])[MAX(l_linenumber % 3) + 1] AS readability,
       ROUND(AVG(l_discount), 3) AS confidence
FROM lineitem
GROUP BY l_orderkey
"""


def q_comment_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5: newline-joined comments with img{i}: prefixes, ordered by image
    index (step4/03:204-235, exact "img{i}: " prefix). Ordered string-agg = sort_array(collect_list)
    + transform + array_join — bounded per group, no sort-based agg."""
    li = _li(spark, sf_dir)
    return li.groupBy("l_orderkey").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("l_linenumber", "l_returnflag"))
                ),
                lambda s: F.concat(
                    F.lit("img"),
                    s["l_linenumber"].cast("string"),
                    F.lit(": "),
                    s["l_returnflag"],
                ),
            ),
            "\n",
        ).alias("comments")
    )


SQL_COMMENT_AGG = """
SELECT l_orderkey,
       STRING_AGG('img' || l_linenumber || ': ' || l_returnflag, chr(10)
                  ORDER BY l_linenumber, l_returnflag) AS comments
FROM lineitem
GROUP BY l_orderkey
"""


def q_ordered_fold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A13+A14: the two-level ordered text fold at the heart of span
    assembly. Level 1 (intra-group, reference '\\n\\n' join in
    (original, split_1..k) order — step6/04:226-272): items joined by
    '\\n\\n' ordered by l_linenumber within group = l_linenumber div 4.
    Level 2 (inter-group, effective '\\n\\n\\n' separator, groups in
    zero-padded key order — step7/01:220-243): groups joined by
    '\\n\\n\\n' ordered by group index."""
    li = _li(spark, sf_dir).select(
        "l_orderkey",
        "l_linenumber",
        F.expr("l_linenumber div 4").alias("grp"),
        F.col("l_returnflag").alias("txt"),
    )
    lvl1 = li.groupBy("l_orderkey", "grp").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("l_linenumber", "txt"))),
                lambda s: s["txt"],
            ),
            "\n\n",
        ).alias("group_text")
    )
    return lvl1.groupBy("l_orderkey").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("grp", "group_text"))),
                lambda s: s["group_text"],
            ),
            "\n\n\n",
        ).alias("integrated_text"),
        F.count("*").alias("n_groups"),
    )


SQL_ORDERED_FOLD = """
WITH lvl1 AS (
  SELECT l_orderkey, l_linenumber // 4 AS grp,
         STRING_AGG(l_returnflag, chr(10) || chr(10)
                    ORDER BY l_linenumber, l_returnflag) AS group_text
  FROM lineitem
  GROUP BY l_orderkey, l_linenumber // 4
)
SELECT l_orderkey,
       STRING_AGG(group_text, chr(10) || chr(10) || chr(10)
                  ORDER BY grp) AS integrated_text,
       COUNT(*) AS n_groups
FROM lvl1
GROUP BY l_orderkey
"""


def q_step_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6/A7/A8: histogram-style step summaries — counts per readability
    level (groupBy + count; reference step2/04:256-290, step4/03:345-386)."""
    li = _li(spark, sf_dir).select(
        F.element_at(
            F.lit(["none", "minor", "major"]),
            (F.col("l_linenumber") % 3).cast("int") + 1,
        ).alias("readability")
    )
    return li.groupBy("readability").agg(F.count("*").alias("n_pages"))


SQL_STEP_SUMMARY = """
SELECT (['none', 'minor', 'major'])[(l_linenumber % 3) + 1] AS readability,
       COUNT(*) AS n_pages
FROM lineitem
GROUP BY 1
"""


def q_group_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A10/A11/A16: per-source OCR-group style summary — group count,
    total/avg text length (step6/02_text_result_manager.py:176-207)."""
    d = _docs(spark, sf_dir)
    return d.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum(F.length("text")).alias("total_chars"),
        F.round(F.avg(F.length("text")), 3).alias("avg_chars"),
        F.sum((F.col("n_chars") > 300).cast("long")).alias("n_long_docs"),
    )


SQL_GROUP_SUMMARY = """
SELECT source,
       COUNT(*) AS n_docs,
       CAST(SUM(LENGTH(text)) AS BIGINT) AS total_chars,
       ROUND(AVG(LENGTH(text)), 3) AS avg_chars,
       CAST(SUM(CASE WHEN n_chars > 300 THEN 1 ELSE 0 END) AS BIGINT) AS n_long_docs
FROM documents
GROUP BY source
"""


def q_total_page_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15: total pages = sum over the per-doc page-count distribution
    (api/main.py:148-188) — global rollup of the A1 merge."""
    merged = q_judgment_merge(spark, sf_dir)
    return merged.agg(
        F.sum("page_count").alias("total_pages"),
        F.count("*").alias("n_docs"),
    )


SQL_TOTAL_PAGE_COUNT = """
WITH merged AS (
  SELECT l_orderkey,
         CAST(LEAST(GREATEST(SUM(1 + (l_linenumber % 3)), 1), 3) AS BIGINT) AS page_count
  FROM lineitem GROUP BY l_orderkey
)
SELECT CAST(SUM(page_count) AS BIGINT) AS total_pages, COUNT(*) AS n_docs FROM merged
"""


QUERIES = {
    "judgment_merge": q_judgment_merge,
    "comment_agg": q_comment_agg,
    "ordered_fold": q_ordered_fold,
    "step_summary": q_step_summary,
    "group_summary": q_group_summary,
    "total_page_count": q_total_page_count,
}

ORACLE_SQL = {
    "judgment_merge": SQL_JUDGMENT_MERGE,
    "comment_agg": SQL_COMMENT_AGG,
    "ordered_fold": SQL_ORDERED_FOLD,
    "step_summary": SQL_STEP_SUMMARY,
    "group_summary": SQL_GROUP_SUMMARY,
    "total_page_count": SQL_TOTAL_PAGE_COUNT,
}
