"""Group-wise EXACT quantile statistics over the events table.

The profiling op every pipeline runs before setting thresholds (quality
cutoffs, band edges, cap sizes): per event_type — count, sum, exact
median and p95 with linear interpolation (the quantile_cont definition
both engines implement: Spark `percentile`, DuckDB `quantile_cont`).

Exact-vs-approximate is a deliberate scale statement: Spark's
`approx_percentile` (KLL-sketch) is the 10^12-row default because its
state is O(1/eps) per group, but its outputs are engine-specific and
unverifiable against an oracle. The exact `percentile` aggregate holds
each group's values in memory — correct while groups are bounded
(here: a handful of event types over millions of rows each is NOT
bounded; the honest production shape is approx_percentile for
monitoring and this exact op for bounded-cardinality audits or sampled
slices). Both forms share the groupBy plan; swapping the aggregate is
one line, so the oracle-checked exact op IS the audit of the approx
one's plan.

Float note: interpolation a + (b-a)*f can differ between engines in the
last ulp; the driver's canonicalization rounds to 9 decimals, and a
pytest pins a hand-computed interpolated value exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

QUANTILES = (0.5, 0.95)


def group_quantiles(
    rows: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """(group, n, v_sum, p50, p95) with exact linear-interpolated
    quantiles per group."""
    return rows.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").cast("long").alias("n"),
        F.round(F.sum(value_col), 2).alias("v_sum"),
        F.expr(f"percentile({value_col}, 0.5)").alias("p50"),
        F.expr(f"percentile({value_col}, 0.95)").alias("p95"),
    )


def group_cardinality(
    rows: DataFrame, group_col: str, key_col: str
) -> DataFrame:
    """(grp, n_rows, n_distinct) — exact distinct-key count per group,
    the oracle-checkable half of cardinality profiling. The 10^12-row
    production twin is ``approx_count_distinct`` (HyperLogLog++: O(1)
    state per group instead of a distinct-shuffle of every key) on the
    SAME groupBy plan; its output is engine- and seed-specific, so the
    audit contract is split: this exact op goes through the driver
    hash gate, and the approx one is pinned in pytest against the
    exact result with HLL's published error bound (rsd default 5%).

    Plan note: countDistinct rewrites to a two-phase expand-aggregate
    (partial distinct per partition, then merge) — one shuffle keyed
    (grp, key), one keyed grp; no row ever carries more than its own
    key."""
    return rows.groupBy(F.col(group_col).alias("grp")).agg(
        F.count("*").cast("long").alias("n_rows"),
        F.countDistinct(key_col).cast("long").alias("n_distinct"),
    )


def q_event_user_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return group_cardinality(e, "event_type", "user_id").select(
        F.col("grp").alias("event_type"), "n_rows", "n_distinct"
    )


HIST_BIN_CENTS = 50_00  # 50.00-wide value bins
HIST_N_BINS = 10


def group_histogram(
    rows: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """(grp, bin, n): fixed-width histogram per group — the third leg
    of the profiling family (quantiles give thresholds, cardinality
    gives key spread, histograms give SHAPE). Values quantize to
    integer cents first (the rolling_window idiom), so a bin edge can
    never fall between two float representations of the same printed
    value; the cents/width quotient is exact in double (inputs ≪ 2^53)
    and is FLOORED, so negative values land in their own negative bin
    ids instead of silently merging into bin 0 (cast-truncation would;
    both engines state floor explicitly). Last bin open-ended above
    (least(_, N-1)). One groupBy shuffle on (grp, bin); output is
    groups × bins regardless of corpus size."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    bin_ = F.least(
        F.floor(cents / F.lit(HIST_BIN_CENTS)).cast("long"),
        F.lit(HIST_N_BINS - 1),
    )
    return (
        rows.select(F.col(group_col).alias("grp"),
                    bin_.cast("int").alias("bin"))
        .groupBy("grp", "bin")
        .agg(F.count("*").cast("long").alias("n"))
    )


def q_event_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return group_histogram(e, "event_type", "value").select(
        F.col("grp").alias("event_type"), "bin", "n"
    )


OUTLIER_SIGMAS = 3


def value_outliers(
    rows: DataFrame, group_col: str, value_col: str
) -> DataFrame:
    """Rows more than OUTLIER_SIGMAS population standard deviations
    from their group mean — the data-quality gate every ingest runs —
    WITHOUT computing a float mean or stddev: on integer cents,

        |v - s/n| > k·σ   ⟺   (v·n − s)² > k²·(n·Σv² − s²)

    (multiply both sides by n²; σ² = (n·Σv² − s²)/n²). Every quantity
    is int64, so the verdict is bit-exact across engines — stddev_pop
    differs in the last ulp between engines and a boundary row would
    flip the hash. Headroom: (v·n − s)² needs v·n < ~3e9, i.e.
    n < ~10^5 groups-rows at 5-digit cents; past that lift to
    decimal(38,0)/HUGEINT (the collocations note).

    Plan: one group agg (n, s, Σv²) joined back UNHINTED (group table
    is data-dependent; AQE broadcasts real ones), verdict is per-row
    integer math."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    base = rows.select(
        "event_id", F.col(group_col).alias("grp"), cents.alias("v")
    )
    stats = base.groupBy("grp").agg(
        F.count("*").alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    )
    lhs = (F.col("v") * F.col("n") - F.col("s"))
    rhs = (
        F.lit(OUTLIER_SIGMAS * OUTLIER_SIGMAS)
        * (F.col("n") * F.col("ss") - F.col("s") * F.col("s"))
    )
    return (
        base.join(stats, "grp")
        .filter(lhs * lhs > rhs)
        .select(
            "event_id",
            F.col("grp"),
            F.col("v").alias("v_cents"),
            F.col("n").cast("long").alias("n_group"),
        )
    )


def q_event_value_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return value_outliers(e, "event_type", "value").select(
        "event_id", F.col("grp").alias("event_type"), "v_cents", "n_group"
    )


def q_event_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return group_quantiles(e, "event_type", "value").select(
        F.col("grp").alias("event_type"), "n", "v_sum", "p50", "p95"
    )


SQL_EVENT_VALUE_QUANTILES = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       round(SUM(value), 2) AS v_sum,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.95) AS p95
FROM events GROUP BY event_type
"""

SQL_EVENT_VALUE_HISTOGRAM = f"""
SELECT event_type, CAST(bin AS INT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n
FROM (
  SELECT event_type,
         LEAST(CAST(floor(CAST(round(value * 100) AS BIGINT)
                          / {HIST_BIN_CENTS}.0) AS BIGINT),
               {HIST_N_BINS - 1}) AS bin
  FROM events
)
GROUP BY event_type, bin
"""

SQL_EVENT_VALUE_OUTLIERS = f"""
WITH base AS (
  SELECT event_id, event_type AS grp,
         CAST(round(value * 100) AS BIGINT) AS v
  FROM events
),
st AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(v) AS BIGINT) AS s,
         CAST(SUM(v * v) AS BIGINT) AS ss
  FROM base GROUP BY grp
)
SELECT event_id, grp AS event_type, v AS v_cents, n AS n_group
FROM base JOIN st USING (grp)
WHERE (v * n - s) * (v * n - s)
      > {OUTLIER_SIGMAS * OUTLIER_SIGMAS} * (n * ss - s * s)
"""

SQL_EVENT_USER_CARDINALITY = """
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_distinct
FROM events GROUP BY event_type
"""

QUERIES = {
    "event_value_quantiles": q_event_value_quantiles,
    "event_user_cardinality": q_event_user_cardinality,
    "event_value_histogram": q_event_value_histogram,
    "event_value_outliers": q_event_value_outliers,
}

ORACLE_SQL = {
    "event_value_quantiles": SQL_EVENT_VALUE_QUANTILES,
    "event_user_cardinality": SQL_EVENT_USER_CARDINALITY,
    "event_value_histogram": SQL_EVENT_VALUE_HISTOGRAM,
    "event_value_outliers": SQL_EVENT_VALUE_OUTLIERS,
}
