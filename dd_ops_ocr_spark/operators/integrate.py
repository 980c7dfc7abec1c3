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
        corpus.build_spans_df(spark, sf_dir), include_page=True
    )
    return integrate_text(out)


QUERIES = {"integrated_text": q_integrated_text}
ORACLE_SQL: dict[str, str] = {}
