"""Pure-JVM (DataFrame-expression) implementation of the flagship spec.

A third, fully independent implementation of the extraction semantics —
no Python UDFs at all: normalization is Java-regex, and ALL group
statistics (boilerplate distinct-page counts, two-up page stats, the
reading-order rank) are window functions over ONE doc_id hash
partitioning — a single shuffle exchange, no joins, one pass over the
input. Everything else stays inside whole-stage codegen. The Arrow
kernel (zero shuffles) remains the production path — this one exists to
(a) triangulate the spec (oracle == pandas == Arrow == SQL), and
(b) serve deployments that forbid Python workers.

Unicode note: Java's ``\\s`` is ASCII-only, so the strip/empty-drop uses
``(?U)`` (UNICODE_CHARACTER_CLASS), matching Python ``str.strip`` on all
Unicode whitespace. Known corner: U+001C-U+001F are stripped by Python's
``isspace`` but are not Unicode White_Space, so this path would differ on
those control characters — they cannot appear in the spans corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window as W, functions as F

from dd_ops_ocr_spark.schema import (
    BOILERPLATE_FRAC,
    CX,
    FOOTER_ZONE,
    GUTTER_HALF,
    HEADER_ZONE,
    MIN_PAGES_BOILERPLATE,
    PAGE_H,
    PAGE_W,
    STRIDE,
    TWOUP_MIN_SIDE,
    norm_text_expr,
)


def extract_sql(df: DataFrame) -> DataFrame:
    """Nested (doc_id, spans) -> reading-order span sequence, JVM-only."""
    flat = df.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id", "s.kind", "s.text", "s.media_ref", "s.offset"
    )

    # 1-3: geometry, C14 normalize (schema.norm_text_expr — equivalent
    # to the regex pair, ~2.5x cheaper; tests/test_textnorm.py), empty-drop
    norm = norm_text_expr("text")
    flat = (
        flat.withColumn(
            "norm", F.when(F.col("kind") == "text", norm).otherwise(F.lit(None))
        )
        .filter((F.col("kind") != "text") | (F.col("norm") != ""))
        .withColumn("page", F.expr(f"offset div {STRIDE}"))
        .withColumn("y", F.expr(f"(offset % {STRIDE}) div {PAGE_W}"))
        .withColumn("x", F.expr(f"offset % {PAGE_W}"))
    )

    # 4: boilerplate strip — entirely as WINDOW distinct-counts, no
    # groupBy/join: the previous agg + broadcast-anti-join shape made
    # Catalyst plan THREE branches, each re-running the explode +
    # normalization with its own exchange (column pruning below the
    # exchanges defeats reuse). A distinct count becomes a
    # row_number-==-1 indicator summed over the coarser window, so the
    # whole query is ONE hash-exchange on doc_id, a few co-partitioned
    # sorts, and a single pass over the input.
    zone = (
        F.when(F.col("y") < HEADER_ZONE, 1)
        .when(F.col("y") >= PAGE_H - FOOTER_ZONE, 2)
        .otherwise(0)
    )
    flat = flat.withColumn(
        "zone", F.when(F.col("kind") == "text", zone).otherwise(F.lit(0))
    )
    # boilerplate key = xxhash64(norm): fixed-width in the sort (a
    # collision would need two distinct header/footer strings in one
    # doc+zone with equal 64-bit hashes)
    flat = flat.withColumn(
        "th",
        F.when(F.col("zone") > 0, F.xxhash64("norm")).otherwise(F.lit(None)),
    )
    # the ONE exchange: doc_id hash-partitioning satisfies every window
    # below (all partition keys have doc_id as a prefix)
    flat = flat.repartition("doc_id")
    w_kp = W.partitionBy("doc_id", "zone", "th", "page").orderBy(F.lit(1))
    w_key = W.partitionBy("doc_id", "zone", "th")
    w_dp1 = W.partitionBy("doc_id", "page").orderBy(F.lit(1))
    w_doc = W.partitionBy("doc_id")
    flat = (
        flat.withColumn("_fkp", (F.row_number().over(w_kp) == 1).cast("int"))
        .withColumn("zp", F.sum("_fkp").over(w_key))     # distinct pages / key
        .withColumn("_fdp", (F.row_number().over(w_dp1) == 1).cast("int"))
        .withColumn("np", F.sum("_fdp").over(w_doc))     # distinct pages / doc
    )
    boiler = (
        (F.col("zone") > 0)
        & (F.col("np") >= MIN_PAGES_BOILERPLATE)
        & (F.col("zp") >= F.ceil(F.lit(BOILERPLATE_FRAC) * F.col("np")))
    )
    kept = flat.filter(~boiler).drop("_fkp", "_fdp", "zp", "np", "th")
    wp = W.partitionBy("doc_id", "page")
    left = F.sum((F.col("x") < CX - GUTTER_HALF).cast("int")).over(wp)
    right = F.sum((F.col("x") >= CX + GUTTER_HALF).cast("int")).over(wp)
    gutter = F.sum(
        ((F.col("x") >= CX - GUTTER_HALF) & (F.col("x") < CX + GUTTER_HALF))
        .cast("int")
    ).over(wp)
    two_up = (gutter == 0) & (left >= TWOUP_MIN_SIDE) & (right >= TWOUP_MIN_SIDE)
    kept = kept.withColumn(
        "side", F.when(two_up & (F.col("x") >= CX), 1).otherwise(0)
    )

    # 6-7: reading-order rank and emit
    wr = W.partitionBy("doc_id").orderBy("page", "side", "y", "x")
    return kept.select(
        "doc_id",
        "kind",
        F.when(F.col("kind") == "text", F.col("norm")).otherwise(F.lit(None))
        .alias("text"),
        "media_ref",
        F.row_number().over(wr).cast("int").alias("order"),
    )
