"""Join-shaped operators (SURVEY §2.3) and remaining scalar/agg rows.

The reference has no relational joins; its join-shaped patterns are a
build/probe dict lookup (J1), an enrichment against a small dimension
(J5), and positional zips (J3). Spark-first: broadcast the dimension,
never shuffle the fact side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F


def q_dim_enrich_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5/J1: fact x small-dimension enrichment — broadcast hash join on
    the dim (api/main.py:1038-1098 risk enrichment). The fact side never
    shuffles; only the post-join aggregation does."""
    li = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    part = spark.read.parquet(f"{sf_dir}/part.parquet")
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey)
        .groupBy("p_type")
        .agg(
            F.count("*").alias("n_items"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2)
            .alias("revenue"),
        )
    )


SQL_DIM_ENRICH_JOIN = """
SELECT p.p_type AS p_type, COUNT(*) AS n_items,
       ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
GROUP BY p.p_type
"""


def q_success_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """F1/F2/F7: the filter ladder — successful pages, present media refs,
    .pdf extension (step2/04:69-86, api/main.py:597-599) — composed as one
    pushed-down scan filter."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    return (
        d.filter(
            (F.col("n_chars") > 0)
            & F.col("text").isNotNull()
            & (F.col("doc_id") % 7 != 3)
        )
        .select("doc_id", "lang", "n_chars")
    )


SQL_SUCCESS_FILTER = """
SELECT doc_id, lang, n_chars
FROM documents
WHERE n_chars > 0 AND text IS NOT NULL AND doc_id % 7 <> 3
"""


def q_lenient_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C8: lenient to_bool/to_int coercion ladders
    (step0/00_type_utils.py:9-85) as when() ladders over derived strings."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.element_at(
            F.lit(["true", "True", "1", "yes", "false", "0", "no", ""]),
            (F.col("doc_id") % 8).cast("int") + 1,
        ).alias("raw"),
    )
    as_bool = (
        F.when(F.lower("raw").isin("true", "1", "yes"), True)
        .when(F.lower("raw").isin("false", "0", "no"), False)
        .otherwise(F.lit(None).cast("boolean"))
    )
    return d.select("doc_id", "raw", as_bool.alias("as_bool"))


SQL_LENIENT_COERCION = """
WITH d AS (
  SELECT doc_id,
         (['true','True','1','yes','false','0','no',''])
           [CAST(doc_id % 8 AS INT) + 1] AS raw
  FROM documents
)
SELECT doc_id, raw,
       CASE WHEN LOWER(raw) IN ('true','1','yes') THEN TRUE
            WHEN LOWER(raw) IN ('false','0','no') THEN FALSE
            ELSE NULL END AS as_bool
FROM d
"""


def q_array_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A12: mean over an array column (token-confidence mean,
    step6/04:135-147) via an IN-ORDER float64 fold — engine-exact."""
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet").select(
        "vec_id", F.col("embedding").cast("array<double>").alias("v")
    )
    total = F.aggregate("v", F.lit(0.0), lambda acc, x: acc + x)
    return e.select(
        "vec_id",
        F.round(total / F.size("v"), 9).alias("mean_val"),
        F.size("v").cast("long").alias("n_vals"),
    )


SQL_ARRAY_MEAN = """
WITH e AS (
  SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
)
SELECT vec_id,
       ROUND(list_sum(v) / LEN(v), 9) AS mean_val,
       LEN(v) AS n_vals
FROM e
"""


def q_positional_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J3: positional zip of two parallel arrays (zip(paths, angles),
    step3/02_image_rotator.py:204-216) -> arrays_zip + explode."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id",
        F.expr(
            "transform(sequence(0, cast(doc_id % 4 as int)),"
            " i -> concat('p', cast(i as string)))"
        ).alias("paths"),
        F.expr(
            "transform(sequence(0, cast(doc_id % 4 as int)),"
            " i -> (doc_id * (i + 1)) % 360)"
        ).alias("angles"),
    )
    z = d.select(
        "doc_id",
        F.posexplode(F.arrays_zip("paths", "angles")).alias("idx", "pair"),
    )
    return z.select(
        "doc_id",
        F.col("idx").cast("long").alias("idx"),
        F.col("pair.paths").alias("path"),
        F.col("pair.angles").alias("angle"),
    )


SQL_POSITIONAL_ZIP = """
WITH d AS (
  SELECT doc_id, CAST(doc_id % 4 AS INT) AS k FROM documents
)
SELECT doc_id, t.i AS idx,
       'p' || t.i AS path,
       (doc_id * (t.i + 1)) % 360 AS angle
FROM d, UNNEST(range(0, d.k + 1)) AS t(i)
"""




def q_engine_dual_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K12: a REAL second extraction engine reconciled with the primary.

    The reference runs two OCR engines over the same pages — the primary
    LLM path and a DocumentAI pass restricted to the field mask
    `text,pages.pageNumber` (step6/04_document_ai_ocr_engine.py:62-177),
    gathered per group and merged (step6/03_step6_processor.py:250-282).
    Here both engines actually run over the corpus:

      * primary = the flagship kernel's integrated text per doc
        (normalization, boilerplate strip, two-up ordering — the full
        pipeline.extract + integrate fold);
      * alt = the raw pass: every non-null text span as-is, one char
        count + distinct-page count per doc (exactly the DocumentAI
        field mask: text and page numbers, no preprocessing).

    The engines genuinely diverge — whitespace-only docs with no media
    vanish from the primary (kernel drops empty normalized spans) but
    keep an alt row; media-only docs keep a primary row ([media:] markers
    integrate) but have no alt row — so the full-outer pairing classes
    arise from engine behavior, not planted arithmetic. Reconciliation
    prefers the primary engine and falls back to alt, the reference's
    merge order. Both sides are per-doc aggregates before the join, so
    at 100 TB the shuffle carries two ~doc-count tables, not spans."""
    from dd_ops_ocr_spark import corpus

    return engine_dual_extract(corpus.build_spans_df_cached(spark, sf_dir))


def engine_dual_extract(spans: DataFrame) -> DataFrame:
    """Core of q_engine_dual_extract over any nested-spans DataFrame —
    see that query's docstring for the dual-engine semantics."""
    from dd_ops_ocr_spark import pipeline
    from dd_ops_ocr_spark.operators.integrate import integrate_text
    from dd_ops_ocr_spark.schema import STRIDE

    primary = integrate_text(
        pipeline.extract(spans, include_page=True)
    ).select(
        "doc_id",
        F.col("total_characters").alias("primary_chars"),
        F.col("pages_integrated").alias("primary_pages"),
    )
    alt = (
        spans.select("doc_id", F.explode("spans").alias("s"))
        .filter((F.col("s.kind") == "text") & F.col("s.text").isNotNull())
        .groupBy("doc_id")
        .agg(
            # chars of the alt transcript = span chars + one "\n" between
            # consecutive spans (counted, never materialized)
            (F.sum(F.length("s.text")) + F.count("*") - 1).alias("alt_chars"),
            F.countDistinct(F.expr(f"s.offset DIV {STRIDE}")).alias("alt_pages"),
        )
    )
    j = primary.join(alt, "doc_id", "full_outer")
    pairing = (
        F.when(F.col("primary_chars").isNull(), "alt_only")
        .when(F.col("alt_chars").isNull(), "primary_only")
        .otherwise("both")
    )
    engine_used = F.when(
        F.col("primary_chars").isNotNull(), "primary"
    ).otherwise("alt")
    return j.select(
        "doc_id",
        pairing.alias("pairing"),
        engine_used.alias("engine_used"),
        "primary_chars",
        "primary_pages",
        "alt_chars",
        "alt_pages",
        F.coalesce("primary_chars", "alt_chars").alias("reconciled_chars"),
    )


def q_engine_zip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J2: the dual-engine result pairing (Gemini + DocumentAI results for
    the same group_key, paired by construction via asyncio.gather —
    step6/03_step6_processor.py:254-278) as a full-outer join with
    per-engine success flags. Our production design is single-engine
    (SURVEY §7), so this implements the pairing semantics over two
    deterministic synthetic engine tables: each engine misses some groups
    and fails some others, exactly the outcome space the reference's
    success/failure collections partition."""
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    key = F.format_string(
        "page_%03d_mask%d",
        (F.col("doc_id") % 1000).cast("int"),
        (F.col("doc_id") % 5).cast("int"),
    )
    gemini = (
        d.filter(F.col("doc_id") % 7 != 2)       # groups gemini never saw
        .select(
            "doc_id",
            key.alias("group_key"),
            (F.col("doc_id") % 11 != 3).alias("gemini_ok"),
            (F.col("doc_id") * 31 % 997).alias("gemini_chars"),
        )
    )
    docai = (
        d.filter(F.col("doc_id") % 5 != 1)       # groups docai never saw
        .select(
            "doc_id",
            key.alias("group_key"),
            (F.col("doc_id") % 13 != 5).alias("docai_ok"),
            (F.col("doc_id") * 17 % 997).alias("docai_chars"),
        )
    )
    paired = gemini.join(docai, ["doc_id", "group_key"], "full_outer")
    pairing = (
        F.when(F.col("gemini_ok").isNull(), "docai_only")
        .when(F.col("docai_ok").isNull(), "gemini_only")
        .otherwise("both")
    )
    return paired.select(
        "doc_id",
        "group_key",
        "gemini_ok",
        "docai_ok",
        pairing.alias("pairing"),
        F.coalesce("gemini_chars", F.lit(0)).alias("gemini_chars"),
        F.coalesce("docai_chars", F.lit(0)).alias("docai_chars"),
    )


SQL_ENGINE_ZIP = """
WITH d AS (SELECT doc_id FROM documents),
k AS (
  SELECT doc_id,
         printf('page_%03d_mask%d', CAST(doc_id % 1000 AS INT),
                CAST(doc_id % 5 AS INT)) AS group_key
  FROM d
),
gemini AS (
  SELECT doc_id, group_key,
         doc_id % 11 <> 3 AS gemini_ok,
         doc_id * 31 % 997 AS gemini_chars
  FROM k WHERE doc_id % 7 <> 2
),
docai AS (
  SELECT doc_id, group_key,
         doc_id % 13 <> 5 AS docai_ok,
         doc_id * 17 % 997 AS docai_chars
  FROM k WHERE doc_id % 5 <> 1
)
SELECT COALESCE(g.doc_id, a.doc_id) AS doc_id,
       COALESCE(g.group_key, a.group_key) AS group_key,
       g.gemini_ok, a.docai_ok,
       CASE WHEN g.gemini_ok IS NULL THEN 'docai_only'
            WHEN a.docai_ok IS NULL THEN 'gemini_only'
            ELSE 'both' END AS pairing,
       COALESCE(g.gemini_chars, 0) AS gemini_chars,
       COALESCE(a.docai_chars, 0) AS docai_chars
FROM gemini g FULL OUTER JOIN docai a
  ON g.doc_id = a.doc_id AND g.group_key = a.group_key
"""


QUERIES = {
    "engine_zip": q_engine_zip,
    "engine_dual_extract": q_engine_dual_extract,
    "dim_enrich_join": q_dim_enrich_join,
    "success_filter": q_success_filter,
    "lenient_coercion": q_lenient_coercion,
    "array_mean": q_array_mean,
    "positional_zip": q_positional_zip,
}

ORACLE_SQL = {
    "engine_zip": SQL_ENGINE_ZIP,
    "dim_enrich_join": SQL_DIM_ENRICH_JOIN,
    "success_filter": SQL_SUCCESS_FILTER,
    "lenient_coercion": SQL_LENIENT_COERCION,
    "array_mean": SQL_ARRAY_MEAN,
    "positional_zip": SQL_POSITIONAL_ZIP,
}
