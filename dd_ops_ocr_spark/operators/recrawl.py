"""Recrawl snapshot diff — classify every URL across two crawl
snapshots as new / changed / unchanged / gone by content digest.

The web-corpus twin of the repo's result-dir probing and stale-result
reprocessing (`incremental.py`, reference skip logic in
`src/api/main.py`): an incremental ingestion pipeline recrawls, diffs
against the previous snapshot, and feeds only `new` + `changed` rows
downstream — at 10^12 pages the diff IS the cost gate, because a
typical recrawl changes a few percent of the corpus.

Snapshot B is planted deterministically off snapshot A (the documents
table), all md5/modulo gates on doc_id so both engines agree:

* ``doc_id % 17 == 0``  -> dropped from B (status ``gone``);
* md5(doc_id) nibble 14 even -> B's text gains a revision marker
  (status ``changed``); odd -> byte-identical (``unchanged``);
* ``doc_id % 13 == 0``  -> B additionally carries a brand-new page at
  the /n/<id> path (status ``new``).

Scale shape: ONE full-outer hash join on url (both sides corpus-sized,
deliberately unhinted so AQE picks the strategy and splits skew — the
frontier anti-join posture), with per-row digest compare; digests are
computed map-side, so the shuffle carries (url, 32-hex) rows, not
documents. No window, no collect.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from dd_ops_ocr_spark.operators.urlops import (
    _EVEN_IN,
    _EVEN_NIBBLES,
    SQL_HOST_ID,
    host_id_col,
    normalize_urls,
    plant_messy_urls,
)

_GONE_MOD = 17
_NEW_MOD = 13
_REV_NIB = 14          # disjoint from url plants (1-2, 8-13) and
                       # robots gates (3-4 of the HOST-id keyspace)
_REV_MARK = " [rev2]"


def _canon(docs: DataFrame) -> DataFrame:
    """(doc_id, ...) -> + url (canonical, via plant->normalize — the
    oracle restates the closed form, cross-checking url_normalize)."""
    return (
        normalize_urls(plant_messy_urls(docs))
        .drop("url", "changed")          # the messy plant, now consumed
        .withColumnRenamed("normalized_url", "url")
    )


def snapshot_b(docs: DataFrame) -> DataFrame:
    """Plant snapshot B: (url, digest) — survivors with possibly-
    revised text, plus the new /n/<id> pages."""
    md = F.md5(F.col("doc_id").cast("string"))
    rev = F.substring(md, _REV_NIB, 1).isin(_EVEN_NIBBLES)
    keep = _canon(docs.filter(F.col("doc_id") % _GONE_MOD != 0))
    b_keep = keep.select(
        "url",
        F.md5(
            F.when(rev, F.concat(F.col("text"), F.lit(_REV_MARK)))
             .otherwise(F.col("text"))
        ).alias("digest"),
    )
    host_id = host_id_col()
    b_new = docs.filter(F.col("doc_id") % _NEW_MOD == 0).select(
        F.concat(
            F.lit("https://www.d"), host_id.cast("string"),
            F.lit(".com/n/"), F.col("doc_id").cast("string"),
        ).alias("url"),
        F.md5(F.concat(F.lit("new:"), F.col("text"))).alias("digest"),
    )
    return b_keep.unionAll(b_new)


def recrawl_delta(a: DataFrame, b: DataFrame) -> DataFrame:
    """(url, digest) x (url, digest) -> (url, status, digest_old,
    digest_new). Full-outer hash join on url, per-row classification;
    digests coalesce to '' so the output schema is null-free.

    new/gone classify by JOIN-KEY presence (explicit marker columns),
    not by digest NULLness — a row whose digest is genuinely NULL
    (md5 of a NULL text on real data) is still PRESENT in its
    snapshot, and the SQL twin's ``a.url IS NULL`` test agrees with
    presence, not with digests; NULL-digest matched rows classify as
    changed (NULL = unknown content, eqNullSafe would call two
    unknowns 'unchanged')."""
    a = a.select(
        "url", F.col("digest").alias("digest_old"),
        F.lit(True).alias("_in_a"),
    )
    b = b.select(
        "url", F.col("digest").alias("digest_new"),
        F.lit(True).alias("_in_b"),
    )
    j = a.join(b, "url", "full_outer")
    status = (
        F.when(F.col("_in_a").isNull(), F.lit("new"))
        .when(F.col("_in_b").isNull(), F.lit("gone"))
        .when(F.col("digest_old") == F.col("digest_new"),
              F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return j.select(
        "url",
        status.alias("status"),
        F.coalesce("digest_old", F.lit("")).alias("digest_old"),
        F.coalesce("digest_new", F.lit("")).alias("digest_new"),
    )


def q_recrawl_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )
    a = _canon(docs).select("url", F.md5("text").alias("digest"))
    return recrawl_delta(a, snapshot_b(docs))


def _sql() -> str:
    from dd_ops_ocr_spark.operators.htmlops import _sql_canonical

    k = SQL_HOST_ID
    rev = (
        f"substring(md5(doc_id::VARCHAR), {_REV_NIB}, 1) IN ({_EVEN_IN})"
    )
    return f"""
WITH a AS (
  SELECT {_sql_canonical("doc_id")} AS url, md5(text) AS digest
  FROM documents
),
b AS (
  SELECT {_sql_canonical("doc_id")} AS url,
    md5(CASE WHEN {rev} THEN text || '{_REV_MARK}' ELSE text END)
      AS digest
  FROM documents WHERE doc_id % {_GONE_MOD} <> 0
  UNION ALL
  SELECT 'https://www.d' || {k}::VARCHAR || '.com/n/'
           || doc_id::VARCHAR AS url,
    md5('new:' || text) AS digest
  FROM documents WHERE doc_id % {_NEW_MOD} = 0
)
SELECT
  coalesce(a.url, b.url) AS url,
  CASE WHEN a.url IS NULL THEN 'new'
       WHEN b.url IS NULL THEN 'gone'
       WHEN a.digest = b.digest THEN 'unchanged'
       ELSE 'changed' END AS status,
  coalesce(a.digest, '') AS digest_old,
  coalesce(b.digest, '') AS digest_new
FROM a FULL JOIN b ON a.url = b.url
"""


SQL_RECRAWL_DELTA = _sql()

QUERIES = {
    "recrawl_delta": q_recrawl_delta,
}
ORACLE_SQL = {
    "recrawl_delta": SQL_RECRAWL_DELTA,
}
