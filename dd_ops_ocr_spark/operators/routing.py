"""Rendezvous (highest-random-weight) shard routing.

The stable-assignment primitive a 10^12-row pipeline needs wherever
rows map to long-lived resources — bucketed output tables, per-shard
caches, downstream service lanes: shard(doc) = argmax over shards of
h(shard, doc). Unlike mod-N, adding or removing a shard moves ONLY the
keys that win (or lose) against the changed shard — expected 1/N of
the corpus — so a shard-count change does not re-land everything
(Thaler & Ravishankar's HRW, the scheme consistent hashing rings
approximate). The reference pins its bucket routing at land time
(`src/api/main.py` bucket dirs); this is the operator form.

Determinism: h = md5(shard || ':' || doc_id) compared as the hex
string — identical in Spark and DuckDB, no float weights, no seed.
Ties would need an md5 collision between two 1-byte-different inputs.

Scale shape: pure per-row column math (transform + array_max over a
struct — max orders by hash first) — zero shuffles, zero state; the
shard table is a literal. The same expression works as a partitioning
key for `repartition`/bucketed writes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

N_SHARDS = 8


def _hrw_expr(key_col, n_shards: int):
    """Column: winning shard id for key_col under HRW."""
    return F.array_max(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_shards - 1)),
            lambda s: F.struct(
                F.md5(
                    F.concat(
                        s.cast("string"), F.lit(":"),
                        key_col.cast("string"),
                    )
                ).alias("h"),
                s.alias("shard"),
            ),
        )
    )["shard"]


def shard_assign(
    rows: DataFrame, key_col: str = "doc_id", n_shards: int = N_SHARDS
) -> DataFrame:
    """(key, shard): HRW assignment of every row's key."""
    return rows.select(
        F.col(key_col),
        _hrw_expr(F.col(key_col), n_shards).cast("int").alias("shard"),
    )


def q_shard_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spark.read.parquet(f"{sf_dir}/documents.parquet").select("doc_id")
    return shard_assign(d)


SQL_SHARD_ASSIGN = f"""
SELECT doc_id, CAST(shard AS INT) AS shard
FROM (
  SELECT doc_id, s.s AS shard,
         ROW_NUMBER() OVER (
           PARTITION BY doc_id
           ORDER BY md5(s.s::VARCHAR || ':' || doc_id::VARCHAR) DESC
         ) AS rn
  FROM documents, generate_series(0, {N_SHARDS - 1}) AS s(s)
)
WHERE rn = 1
"""

QUERIES = {
    "shard_assign": q_shard_assign,
}

ORACLE_SQL = {
    "shard_assign": SQL_SHARD_ASSIGN,
}
