"""Integrated-text assembly — the reference's final text product (S9).

The reference's step 7 folds per-group OCR texts into one document text:
texts within a group joined by "\\n\\n" (intra-group,
step6/04_document_ai_ocr_engine.py:226-272) and groups joined by the
effective "\\n\\n\\n" separator in zero-padded key order
(step7/01_text_integration_engine.py:29,220-243). Here the group unit is
the page, the inputs are the REAL flagship-pipeline spans (extracted with
``include_page=True``), and the fold is sort_array(collect_list) +
array_join — the A13/A14 pattern applied to the live output, not a
synthetic table. Media spans become inline ``[media:ref]`` markers so
nothing is silently dropped.

Also emits the reference's integration metadata: total_characters
(step7/01:88,158), spans and pages processed.

Not SQL-expressible (requires the extraction pipeline), so the driver
records a rows-only check; pytest compares against a pure-Python fold
over the oracle's span sequences (tests/test_integrate.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

INTRA_SEP = "\n\n"
INTER_SEP = "\n\n\n"


def _payload():
    return F.when(F.col("kind") == "text", F.col("text")).otherwise(
        F.concat(F.lit("[media:"), F.col("media_ref"), F.lit("]"))
    )


def integrate_text(out_spans_with_page: DataFrame) -> DataFrame:
    """(doc_id, kind, text, media_ref, order, page) -> one row per doc."""
    spans = out_spans_with_page.withColumn("payload", _payload())
    lvl1 = spans.groupBy("doc_id", "page").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("order", "payload"))),
                lambda s: s["payload"],
            ),
            INTRA_SEP,
        ).alias("page_text"),
        F.count("*").alias("n_spans"),
    )
    lvl2 = lvl1.groupBy("doc_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("page", "page_text"))),
                lambda s: s["page_text"],
            ),
            INTER_SEP,
        ).alias("integrated_text"),
        F.sum("n_spans").alias("spans_integrated"),
        F.count("*").alias("pages_integrated"),
    )
    return lvl2.withColumn(
        "total_characters", F.length("integrated_text").cast("long")
    )


def integrate_python(out_spans: list[dict]) -> str:
    """Pure-Python twin of ``integrate_text`` for one doc's oracle output
    (spans must carry ``page``)."""
    pages: dict[int, list[tuple[int, str]]] = {}
    for s in out_spans:
        payload = (
            s["text"] if s["kind"] == "text" else f"[media:{s['media_ref']}]"
        )
        pages.setdefault(s["page"], []).append((s["order"], payload))
    parts = []
    for pg in sorted(pages):
        items = [p for _, p in sorted(pages[pg])]
        parts.append(INTRA_SEP.join(items))
    return INTER_SEP.join(parts)


def q_integrated_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    from dd_ops_ocr_spark import corpus, pipeline

    out = pipeline.extract(
        corpus.build_spans_df_cached(spark, sf_dir), include_page=True
    )
    return integrate_text(out)


def q_contract_articles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Downstream structuring (§3.2: convert_local_text_to_contract_schema,
    api/main.py:1276-1489 + risk enrichment :1194-1273), deterministic:
    the integrated text splits into 'articles' at the inter-group
    separator; each article gets an index, a title (first line), a content
    length, and a rule-based risk class joined from a broadcast dimension
    (the reference classifies via LLM function-calling; the structural
    join is the same)."""
    ints = q_integrated_text(spark, sf_dir)
    arts = ints.select(
        "doc_id",
        F.posexplode(F.split("integrated_text", INTER_SEP)).alias(
            "article_number", "content"
        ),
    ).withColumn("article_number", F.col("article_number").cast("long") + 1)
    arts = arts.select(
        "doc_id",
        "article_number",
        F.substring(F.split(F.col("content"), "\n").getItem(0), 1, 40).alias(
            "title"
        ),
        F.length("content").cast("long").alias("content_len"),
        (F.length("content") % 4).cast("int").alias("risk_type"),
    )
    risks = spark.createDataFrame(
        [(0, "none"), (1, "payment"), (2, "liability"), (3, "termination")],
        "risk_type int, risk_label string",
    )
    return arts.join(F.broadcast(risks), "risk_type").select(
        "doc_id", "article_number", "title", "content_len", "risk_label"
    )


QUERIES = {
    "integrated_text": q_integrated_text,
    "contract_articles": q_contract_articles,
}
ORACLE_SQL: dict[str, str] = {}
