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

QUERIES = {
    "event_value_quantiles": q_event_value_quantiles,
}

ORACLE_SQL = {
    "event_value_quantiles": SQL_EVENT_VALUE_QUANTILES,
}
