"""Non-equi joins made hash-joinable: AS-OF join and interval (range)
join — the two classic operators vanilla Spark SQL lacks a native form
for (DataFrame non-equi conditions fall back to BroadcastNestedLoopJoin
/ CartesianProduct, which dies at corpus scale).

* ``asof_join``: every left row picks the LATEST right row with
  right_ts <= left_ts per key (SCD-2 dimension lookup, "what was the
  user's tier when this event happened"). Implemented as the
  union-tag-window plan: tag both sides, union, one window per key
  ordered by (ts, side) carrying ``last(attr, ignorenulls=True)``
  forward — ONE shuffle on the key, zero range explosion, task size
  bounded by rows-per-key. The tag sorts snapshots BEFORE events at
  equal ts, making the match inclusive (ts >= snap_ts), exactly
  DuckDB's ASOF JOIN semantics (the oracle uses the native ASOF).
* ``interval_join``: left rows matched to dimension intervals
  [lo, hi) by value. Implemented by BINNING: each interval explodes to
  the fixed-width bins it covers, rows key by floor(value/step), a
  plain equi-join on the bin, then the exact lo<=v<hi post-filter — a
  hash join Catalyst can shuffle/broadcast, never a nested loop
  (plan-asserted). Bin width trades replication (wide intervals cover
  many bins) against join fan-in; for static band dimensions the
  replication is the dimension's size, i.e. free.

Both caveats documented: asof attrs must be non-null on the right side
(a null attr would make last(ignorenulls) reach one snapshot further
back) and (key, right_ts) must be unique; interval dimensions must not
overlap if exactly-one-match is expected (the operator itself supports
overlap — each match emits a row).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

BIN_STEP = 25.0


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    attrs: list[str],
) -> DataFrame:
    """Left as-of join: left's columns plus ``attrs`` and ``right_ts``
    from the latest right row at-or-before each left row's ``left_ts``
    (null attrs when no right row precedes)."""
    carried = list(attrs) + [right_ts]
    l_tagged = left.withColumn("_side", F.lit(1)).withColumn(
        "_ats", F.col(left_ts)
    )
    r_tagged = right.select(
        F.col(key),
        F.lit(0).alias("_side"),
        F.col(right_ts).alias("_ats"),
        *[F.col(c) for c in carried if c != right_ts],
        F.col(right_ts),
    )
    u = l_tagged.unionByName(r_tagged, allowMissingColumns=True)
    w = (
        Window.partitionBy(key)
        .orderBy("_ats", "_side")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    for c in carried:
        u = u.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return u.filter(F.col("_side") == 1).drop("_side", "_ats")


def interval_join(
    rows: DataFrame,
    intervals: DataFrame,
    value_col: str,
    step: float = BIN_STEP,
) -> DataFrame:
    """Rows x intervals(lo, hi, label) by lo <= value < hi, as a binned
    equi-join (hash join, no nested loop). Rows matching no interval
    are dropped (inner semantics)."""
    binned_iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col("lo") / step).cast("long"),
                F.floor(F.col("hi") / step).cast("long"),
            )
        ),
    )
    binned_rows = rows.withColumn(
        "_bin", F.floor(F.col(value_col) / step).cast("long")
    )
    return (
        binned_rows.join(binned_iv, "_bin")
        .filter((F.col(value_col) >= F.col("lo")) & (F.col(value_col) < F.col("hi")))
        .drop("_bin")
    )


# ------------------------------------------------------------- oracled corpus
# Snapshots: every event user gets weekly tier snapshots k=0..4 from
# 2024-01-01 (the events table spans Jan 1-30), tier = (user_id + k)%4 —
# so the correct as-of answer CHANGES over each event's month and a
# latest-overall or earliest match hash-mismatches. Bands: seven
# literal value intervals partitioning [0, 500) (events' value range).

N_SNAPSHOT_WEEKS = 5
BANDS = [
    (0.0, 2.0, "b0"),
    (2.0, 5.0, "b1"),
    (5.0, 10.0, "b2"),
    (10.0, 25.0, "b3"),
    (25.0, 60.0, "b4"),
    (60.0, 150.0, "b5"),
    (150.0, 500.0, "b6"),
]


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/events.parquet")


def _snapshots(spark: SparkSession, sf_dir: str) -> DataFrame:
    users = _events(spark, sf_dir).select("user_id").distinct()
    ks = spark.range(N_SNAPSHOT_WEEKS).select(F.col("id").alias("k"))
    return users.crossJoin(ks).select(
        "user_id",
        F.expr(
            "timestamp '2024-01-01 00:00:00' + k * INTERVAL 7 DAY"
        ).alias("snap_ts"),
        F.pmod(F.col("user_id") + F.col("k"), F.lit(4)).cast("int").alias("tier"),
    )


def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).select("event_id", "user_id", "ts")
    s = _snapshots(spark, sf_dir)
    out = asof_join(e, s, key="user_id", left_ts="ts", right_ts="snap_ts",
                    attrs=["tier"])
    return out.select("event_id", "user_id", "ts", "tier", "snap_ts")


def q_interval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = _events(spark, sf_dir).select("event_id", "value")
    iv = spark.createDataFrame(BANDS, "lo double, hi double, label string")
    out = interval_join(e, F.broadcast(iv), value_col="value")
    return out.select("event_id", "value", "label", "lo", "hi")


SQL_ASOF_JOIN = f"""
WITH users AS (SELECT DISTINCT user_id FROM events),
snaps AS (
  SELECT user_id,
         TIMESTAMP '2024-01-01 00:00:00' + CAST(u.k AS INT) * INTERVAL 7 DAY
           AS snap_ts,
         CAST((user_id + u.k) % 4 AS INT) AS tier
  FROM users, UNNEST(range(0, {N_SNAPSHOT_WEEKS})) AS u(k)
)
SELECT e.event_id, e.user_id, e.ts, s.tier, s.snap_ts
FROM events e ASOF LEFT JOIN snaps s
  ON e.user_id = s.user_id AND e.ts >= s.snap_ts
"""

_SQL_BANDS = " UNION ALL ".join(
    f"SELECT CAST({lo} AS DOUBLE) AS lo, CAST({hi} AS DOUBLE) AS hi,"
    f" '{lb}' AS label"
    for lo, hi, lb in BANDS
)

SQL_INTERVAL_JOIN = f"""
WITH iv AS ({_SQL_BANDS})
SELECT e.event_id, e.value, iv.label, iv.lo, iv.hi
FROM events e JOIN iv ON e.value >= iv.lo AND e.value < iv.hi
"""

QUERIES = {
    "asof_join": q_asof_join,
    "interval_join": q_interval_join,
}

ORACLE_SQL = {
    "asof_join": SQL_ASOF_JOIN,
    "interval_join": SQL_INTERVAL_JOIN,
}
