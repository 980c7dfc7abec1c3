"""Pure-JVM (DataFrame-expression) implementation of the flagship spec.

A third, fully independent implementation of the extraction semantics —
no Python UDFs at all: normalization is Java-regex, group statistics are
window functions, boilerplate keys are an aggregate + broadcast anti-join,
and the order is a window rank. Everything stays inside whole-stage
codegen; the price is three shuffles (two window partitionings + the
rank), which is why the Arrow kernel (zero shuffles) is the production
path — this one exists to (a) triangulate the spec (oracle == pandas ==
Arrow == SQL), and (b) serve deployments that forbid Python workers.

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
)


def extract_sql(df: DataFrame) -> DataFrame:
    """Nested (doc_id, spans) -> reading-order span sequence, JVM-only."""
    flat = df.select("doc_id", F.explode("spans").alias("s")).select(
        "doc_id", "s.kind", "s.text", "s.media_ref", "s.offset"
    )

    # 1-3: geometry, C14 normalize ((?U) = unicode \s), empty-drop
    norm = F.regexp_replace(
        F.regexp_replace("text", "\n{2,}", "\n"), r"(?U)(^\s+)|(\s+$)", ""
    )
    flat = (
        flat.withColumn(
            "norm", F.when(F.col("kind") == "text", norm).otherwise(F.lit(None))
        )
        .filter((F.col("kind") != "text") | (F.col("norm") != ""))
        .withColumn("page", F.expr(f"offset div {STRIDE}"))
        .withColumn("y", F.expr(f"(offset % {STRIDE}) div {PAGE_W}"))
        .withColumn("x", F.expr(f"offset % {PAGE_W}"))
    )

    # 4: boilerplate strip — key aggregation + broadcast anti-join
    zone = (
        F.when(F.col("y") < HEADER_ZONE, 1)
        .when(F.col("y") >= PAGE_H - FOOTER_ZONE, 2)
        .otherwise(0)
    )
    flat = flat.withColumn(
        "zone", F.when(F.col("kind") == "text", zone).otherwise(F.lit(0))
    )
    n_pages = flat.groupBy("doc_id").agg(F.countDistinct("page").alias("np"))
    # aggregate and anti-join on xxhash64(norm), not the raw string — the
    # shuffle and broadcast carry fixed-width keys (same trick as the
    # salted path; a collision would need two distinct header/footer
    # strings in one doc+zone with equal 64-bit hashes)
    flat = flat.withColumn(
        "th",
        F.when(F.col("zone") > 0, F.xxhash64("norm")).otherwise(F.lit(None)),
    )
    keys = (
        flat.filter(F.col("zone") > 0)
        .groupBy("doc_id", "zone", "th")
        .agg(F.countDistinct("page").alias("zp"))
        .join(n_pages, "doc_id")
        .filter(
            (F.col("np") >= MIN_PAGES_BOILERPLATE)
            & (F.col("zp") >= F.ceil(F.lit(BOILERPLATE_FRAC) * F.col("np")))
        )
        .select("doc_id", "zone", "th")
    )
    kept = flat.join(
        F.broadcast(keys), ["doc_id", "zone", "th"], "left_anti"
    ).drop("th")

    # 5: two-up detection — window aggregates per (doc, page).
    # One explicit repartition on doc_id serves BOTH windows: hash
    # clustering on doc_id satisfies the (doc, page) distribution (equal
    # (doc, page) rows co-locate) and the rank window's (doc) one, so
    # Catalyst inserts no further exchange — one wide shuffle, two sorts.
    kept = kept.repartition("doc_id")
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
