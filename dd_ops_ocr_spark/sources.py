"""Sources and sinks (SURVEY §2.1).

The reference opens PDFs from disk, rejects corrupt/empty ones
(S1, step1/01_pdf_reader.py:145-186), and writes per-session directories.
Spark-first: one scan with a validity predicate; invalid rows are routed
to a quarantine output instead of aborting the job (X1 warn-and-continue
becomes row-level quarantine).

At scale both outputs come from ONE pass: the validity flag is a cheap
column, and Catalyst prunes the scan to (doc_id, spans) either way.
Iceberg-table variants are gated behind an import-try (no Iceberg jars in
this sandbox); plain parquet + the run ledger (ledger.py) stand in for
snapshot isolation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dd_ops_ocr_spark.schema import SPANS_SCHEMA


def read_spans(spark: SparkSession, path: str) -> DataFrame:
    """Scan the interleaved-spans table with a declared schema (no
    inference — S1's validate step becomes the schema contract)."""
    return spark.read.schema(SPANS_SCHEMA).parquet(path)


def read_spans_jsonl(spark: SparkSession, path: str) -> DataFrame:
    """Same table from a JSON-lines landing format (one doc per line,
    ``{"doc_id": ..., "spans": [{kind,text,media_ref,offset}, ...]}``) —
    the shape an upstream ingestion service typically drops. Declared
    schema (no inference scan); a malformed line surfaces as a null-id
    row (PERMISSIVE mode with an explicit corrupt-record column — without
    one Spark silently drops unparseable lines) and lands in quarantine
    via ``split_valid`` instead of failing the job (S1
    warn-and-continue)."""
    from pyspark.sql import types as T

    with_corrupt = T.StructType(
        [T.StructField(f.name, f.dataType, True) for f in SPANS_SCHEMA.fields]
        + [T.StructField("_corrupt_record", T.StringType(), True)]
    )
    return (
        spark.read.schema(with_corrupt)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .drop("_corrupt_record")
    )


def invalid_reason() -> F.Column:
    """The single validity predicate for span documents, as a reason
    column: NULL means valid; otherwise one of ``null_doc_id`` /
    ``null_spans`` / ``empty_spans`` / ``bad_offset`` (first failing
    rule wins). ``split_valid`` and the streaming DLQ both derive from
    this expression so the batch and streaming quarantine rules cannot
    drift. Every WHEN branch is null-safe (the bad_offset predicate maps
    a null element offset to true, not null), so the chain is NULL
    exactly when the doc passes all rules."""
    return (
        F.when(F.col("doc_id").isNull(), "null_doc_id")
        .when(F.col("spans").isNull(), "null_spans")
        .when(F.size("spans") == 0, "empty_spans")
        .when(
            F.exists(
                "spans", lambda s: s["offset"].isNull() | (s["offset"] < 0)
            ),
            "bad_offset",
        )
    )


def split_valid(
    df: DataFrame, with_reason: bool = False
) -> tuple[DataFrame, DataFrame]:
    """(valid, quarantine): a doc is invalid when it has no spans, a null
    doc_id, or any span whose offset is negative (corrupt geometry) —
    the reference's corrupt-PDF rejection, row-level. The rules live in
    ``invalid_reason`` (shared with the streaming DLQ).

    ``with_reason=True`` keeps the already-computed classification on
    the quarantine side as a ``reason`` column (no second evaluation,
    and no way for routing and labeling to disagree).

    Input contract: one row per doc_id. Duplicate doc_ids are the
    ingestion layer's job (streaming.stream_dedup_stateful /
    dropDuplicates) — this validity check is deliberately shuffle-free,
    so it cannot see cross-row duplicates."""
    # reason NULL <=> valid; both filters are on the same expression, so
    # every row lands exactly one side (no NULL three-way leak).
    flagged = df.withColumn("_reason", invalid_reason())
    valid = flagged.filter(F.col("_reason").isNull()).drop("_reason")
    quarantine = flagged.filter(F.col("_reason").isNotNull())
    quarantine = (
        quarantine.withColumnRenamed("_reason", "reason")
        if with_reason else quarantine.drop("_reason")
    )
    return valid, quarantine


def write_output(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """Final span-sequence sink, partitioned by a doc_id hash bucket so a
    downstream reader can prune (S9's result sink, keyed not file-named)."""
    out = df.withColumn("bucket", F.pmod(F.xxhash64("doc_id"), F.lit(64)))
    out.write.mode(mode).partitionBy("bucket").parquet(path)


def read_dimension_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str | None = None,
    num_partitions: int = 8,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    **options: str,
) -> DataFrame:
    """S12's real connector shape: the reference reads its Risk dimension
    from Postgres (reference: src/api/main.py:93-146). This is the
    deployment reader — `spark.read.jdbc` with bounded parallel partitions
    when a numeric split column is given (without one, a JDBC read is a
    SINGLE task hammering the database; never do that for a big table).
    The sandbox ships no JDBC driver jar, so absence surfaces as a clear
    NotImplementedError and the in-repo queries use the broadcast
    dimension stand-in (operators/integrate.read_risk_dim) instead."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError("partitioned JDBC read needs lower/upper bounds")
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("numPartitions", str(num_partitions))
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
        )
    for k, v in options.items():
        reader = reader.option(k, v)
    try:
        return reader.load()
    except Exception as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "no JDBC driver on the classpath in this environment; pass "
            "--jars <driver.jar> at spark-submit, or use the broadcast "
            "dimension stand-in (operators.integrate.read_risk_dim)"
        ) from exc


def try_iceberg_writer(df: DataFrame, table: str):
    """Iceberg append when the runtime has the catalog; otherwise a clear
    error — the sandbox has no Iceberg jars (stub per environment note)."""
    try:
        return df.writeTo(table).append()
    except Exception as exc:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "Iceberg catalog not available in this environment; use "
            "write_output() + ledger.run_with_ledger() for snapshot-style "
            "commits"
        ) from exc


def q_doc_validity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query for the quarantine boundary itself (F1-class rules;
    reference: step1/01_pdf_reader.py's corrupt-PDF rejection): plant
    every invalidity class IN SPARK SQL over the documents table — the
    md5 leading nibble of doc_id picks the defect ('0' null doc_id, '1'
    null spans, '2' empty spans, '3' a negative and a null offset;
    everything else stays valid) — then run the REAL ``split_valid`` and
    emit (src_id, reason, valid). The oracle restates only the planting
    rule, so a misrouted class (e.g. empty spans slipping through as
    valid, the exact defect the streaming DLQ once had) hash-mismatches.
    """
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    nib = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 1)
    good = F.expr(
        "array("
        " named_struct('kind','text','text',text,"
        "              'media_ref',CAST(NULL AS STRING),'offset',0),"
        " named_struct('kind','text','text',text,"
        "              'media_ref',CAST(NULL AS STRING),'offset',1))"
    )
    bad = F.expr(
        "array("
        " named_struct('kind','text','text',text,"
        "              'media_ref',CAST(NULL AS STRING),'offset',-1),"
        " named_struct('kind','text','text',text,"
        "              'media_ref',CAST(NULL AS STRING),'offset',"
        "              CAST(NULL AS INT)))"
    )
    planted = docs.select(
        F.col("doc_id").alias("src_id"),
        F.when(nib == "0", F.lit(None)).otherwise(F.col("doc_id"))
        .alias("doc_id"),
        F.when(nib == "1", F.lit(None))
        .when(nib == "2", F.slice(good, 1, 0))  # typed empty array
        .when(nib == "3", bad)
        .otherwise(good)
        .alias("spans"),
    )
    valid, quarantine = split_valid(planted, with_reason=True)
    return valid.select(
        "src_id",
        F.lit(None).cast("string").alias("reason"),
        F.lit(True).alias("valid"),
    ).unionByName(
        # reason comes from the SAME evaluation that routed the row —
        # label and side cannot disagree
        quarantine.select(
            "src_id", "reason", F.lit(False).alias("valid"),
        )
    )


# ------------------------------------------------------- S13 model artifact

ARTIFACT_NAME = "ddops_heuristic_weights_v1.json"
ARTIFACT_SLOTS = 8


def synth_model_artifact_bytes() -> bytes:
    """Deterministic ASCII weights manifest — the stand-in for the
    reference's YOLO .pt blob (S13, api/model_downloader.py:25-131). The
    north_star design needs no learned weights (deterministic
    heuristics), so the artifact's CONTENT is a fixed integer manifest;
    its DISTRIBUTION mechanics below are the real S13 surface. UTF-8 by
    construction so DuckDB's read_blob -> decode() digest is exact."""
    import json

    weights = [(i * 2654435761) % 1000003 for i in range(256)]
    doc = {"name": "ddops-heuristic-weights", "version": 1,
           "weights": weights}
    return json.dumps(doc, separators=(",", ":"), sort_keys=True).encode()


def ensure_model_artifact(cache_dir: str | None = None) -> str:
    """Write the artifact once (atomic tmp+rename, concurrent-safe) and
    return its absolute path — the 'ensure_models_available' half of
    S13: idempotent localization before use, never a per-task fetch.
    An existing cache file is VALIDATED against the canonical bytes and
    rewritten on mismatch (a truncated or stale driver-side copy would
    otherwise become the 'expected' digest and self-verify everywhere,
    silently defeating the executor check)."""
    import os

    from dd_ops_ocr_spark import fixtures

    cache_dir = cache_dir or fixtures.FIXTURE_DIR
    path = os.path.join(cache_dir, ARTIFACT_NAME)
    want = synth_model_artifact_bytes()
    try:
        with open(path, "rb") as f:
            if f.read() == want:
                return os.path.abspath(path)
    except OSError:
        pass  # missing/unreadable — (re)write below
    os.makedirs(cache_dir, exist_ok=True)
    tmp = f"{path}.tmp.{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(want)
    os.replace(tmp, path)
    return os.path.abspath(path)


def fetch_model_artifact(
    spark: SparkSession, path: str, n_slots: int = ARTIFACT_SLOTS
) -> DataFrame:
    """S13 Spark-first: ``sc.addFile`` ships the artifact to every
    executor ONCE (torrent-style at cluster scale, never per task —
    the reference's lazy GCS download with a local cache has exactly
    this once-per-node semantics); each task localizes it via
    ``SparkFiles.get`` and verifies the sha256 digest against the
    driver-side expectation, so a corrupt or stale copy on any node is
    a visible ``ok=false`` row, not a silently wrong model. Same
    shipping mechanism the native codec shim uses (--files)."""
    import hashlib
    import os

    import pandas as pd

    with open(path, "rb") as f:
        expected = hashlib.sha256(f.read()).hexdigest()
    spark.sparkContext.addFile(path)
    name = os.path.basename(path)

    def probe(batches):
        from pyspark import SparkFiles

        with open(SparkFiles.get(name), "rb") as f:
            data = f.read()
        digest = hashlib.sha256(data).hexdigest()
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "slot": pdf["slot"].astype("int64"),
                    "n_bytes": len(data),
                    "sha256": digest,
                    "ok": digest == expected,
                }
            )

    base = spark.range(0, n_slots, 1, n_slots).select(
        F.col("id").alias("slot")
    )
    return base.mapInPandas(
        probe, schema="slot long, n_bytes long, sha256 string, ok boolean"
    )


def q_model_artifact_fetch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver query (S13): distribute the weights manifest and verify
    its digest on every task slot. The oracle reads the SAME file with
    DuckDB's read_blob and hashes it independently."""
    return fetch_model_artifact(spark, ensure_model_artifact())


def model_artifact_oracle_sql(path: str) -> str:
    return f"""
WITH a AS (
  SELECT CAST(size AS BIGINT) AS n_bytes,
         sha256(decode(content)) AS sha256
  FROM read_blob('{path}')
)
SELECT CAST(t.i AS BIGINT) AS slot, a.n_bytes, a.sha256, true AS ok
FROM a, range(0, {ARTIFACT_SLOTS}) t(i)
"""


QUERIES = {
    "doc_validity_audit": q_doc_validity_audit,
    "model_artifact_fetch": q_model_artifact_fetch,
}
ORACLE_SQL = {
    "doc_validity_audit": """
        SELECT doc_id AS src_id,
               CASE substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
                 WHEN '0' THEN 'null_doc_id'
                 WHEN '1' THEN 'null_spans'
                 WHEN '2' THEN 'empty_spans'
                 WHEN '3' THEN 'bad_offset'
               END AS reason,
               substring(md5(CAST(doc_id AS VARCHAR)), 1, 1) NOT IN ('0','1','2','3') AS valid
        FROM documents
    """,
}
