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

Driver-checked: the DuckDB oracles (fixtures.integrated_oracle_sql and
friends) re-state the extraction + fold over the materialized spans
fixture; pytest additionally compares against a pure-Python fold over
the oracle's span sequences (tests/test_integrate.py).
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


# Risk dimension — deterministic stand-in for the reference's "Risk"
# table read (api/main.py:93-146): default execution takes the rows with
# workspaceId IS NULL ordered by id; a custom execution takes an explicit
# id subset, still id-ordered.
RISK_DIM: list[tuple[int, str, int | None]] = [
    (1, "payment terms", None),
    (2, "liability cap", None),
    (3, "termination", None),
    (4, "confidentiality", None),
    (5, "indemnification", None),
    (6, "ws custom alpha", 42),
    (7, "ws custom beta", 42),
    (8, "ws custom gamma", 42),
]


def read_risk_dim(spark: SparkSession, selected_ids: list[int] | None = None):
    """Reference get_risks_from_db semantics (api/main.py:93-146):
    selected ids -> that subset; else the workspace-null defaults;
    always ORDER BY id ASC."""
    dim = spark.createDataFrame(
        RISK_DIM, "id int, title string, workspace_id int"
    )
    if selected_ids:
        dim = dim.filter(F.col("id").isin(selected_ids))
    else:
        dim = dim.filter(F.col("workspace_id").isNull())
    return dim.orderBy("id").select("id", "title")


RISK_DIM_DEFAULT_SQL = "SELECT * FROM (VALUES " + ", ".join(
    f"({i}, '{t}')" for i, t, ws in RISK_DIM if ws is None
) + ") r(id, title)"


def q_contract_schema(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's full contract JSON shape — {success, info{title,
    party, start_date, end_date, conclusion_date}, result{articles[
    {article_number, title, content, table_number}]}, risks{contracts[
    {targetCompany, articleCount, risks[{id,title}]}]}} per
    api/main.py:1306-1357 + add_risks_to_contract_data (:1194-1273) —
    emitted as one JSON string per document with deterministic stand-ins
    for the LLM steps: info.title = first article's first line,
    party/targetCompany derived from doc_id (targetCompany is the first
    comma-separated party, main.py:1210), and a risk "fires" for a doc
    iff total_characters % (risk_id + 2) == 0. The risk list is the
    id-ordered default dimension read (read_risk_dim)."""
    ints = q_integrated_text(spark, sf_dir)
    arts = ints.select(
        "doc_id",
        "total_characters",
        F.posexplode(F.split("integrated_text", INTER_SEP)).alias("i", "content"),
    ).select(
        "doc_id",
        "total_characters",
        (F.col("i") + 1).alias("ord"),
        F.coalesce(
            F.substring(F.split("content", "\n").getItem(0), 1, 40), F.lit("")
        ).alias("title"),
        "content",
    )
    per_doc = arts.groupBy("doc_id", "total_characters").agg(
        F.transform(
            F.array_sort(
                F.collect_list(
                    F.struct(
                        F.col("ord"),
                        F.struct(
                            F.col("ord").cast("string").alias("article_number"),
                            "title",
                            "content",
                            F.lit("").alias("table_number"),
                        ).alias("a"),
                    )
                )
            ),
            lambda s: s["a"],
        ).alias("articles")
    )
    fired = (
        per_doc.select("doc_id", "total_characters")
        .join(
            F.broadcast(read_risk_dim(spark)),
            F.col("total_characters") % (F.col("id") + 2) == 0,
        )
        .groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(F.struct("id", "title"))).alias("risks_arr"))
    )
    joined = per_doc.join(fired, "doc_id", "left").withColumn(
        "risks_arr",
        F.coalesce(
            "risks_arr", F.array().cast("array<struct<id:int,title:string>>")
        ),
    )
    party = F.concat(
        F.lit("Company_"), F.substring("doc_id", 5, 10), F.lit(",Counterparty KK")
    )
    target = F.split(party, ",").getItem(0)
    # coalesce to '' — Spark's to_json OMITS null struct fields while
    # DuckDB's json_object emits "key":null, so a null here would silently
    # break the byte-identity the oracle asserts; both sides coalesce.
    info = F.struct(
        F.coalesce(F.element_at("articles", 1)["title"], F.lit("")).alias("title"),
        party.alias("party"),
        F.lit("").alias("start_date"),
        F.lit("").alias("end_date"),
        F.lit("").alias("conclusion_date"),
    )
    contract = F.struct(
        target.alias("targetCompany"),
        F.size("articles").alias("articleCount"),
        F.col("risks_arr").alias("risks"),
    )
    return joined.select(
        "doc_id",
        F.to_json(
            F.struct(
                F.lit(True).alias("success"),
                info.alias("info"),
                F.struct(F.col("articles").alias("articles")).alias("result"),
                F.struct(F.array(contract).alias("contracts")).alias("risks"),
            )
        ).alias("contract_json"),
    )


QUERIES = {
    "integrated_text": q_integrated_text,
    "contract_articles": q_contract_articles,
    "contract_schema": q_contract_schema,
}
ORACLE_SQL: dict[str, str] = {}
