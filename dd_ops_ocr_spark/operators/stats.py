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


_US_PER_DAY = 86_400_000_000


def _epoch_day(ts_col: str):
    """Integer epoch-day from a timestamp column: INTEGER floor-div of
    epoch microseconds — engine-identical by construction (date_trunc /
    DATE casts drag in engine week/tz conventions — the session_stats
    lesson applied to days; and int64 epoch-us exceeds 2^53, so a
    float division could mis-bin a boundary row — `div` stays in
    int64). Positive epochs make truncation == floor."""
    return F.expr(
        f"unix_micros(cast({ts_col} as timestamp)) div {_US_PER_DAY}"
    ).cast("long")


def rollup_report(rows: DataFrame, dim1: str, day_col, value_col: str
                  ) -> DataFrame:
    """(d1, day, lvl, n, v_cents): the reporting layer's hierarchy
    query — per-(type, day) cells PLUS per-type subtotals PLUS the
    grand total in ONE pass, via ROLLUP. lvl = grouping_id (0 = leaf
    cell, 1 = day aggregated, 3 = grand total) disambiguates a
    subtotal row from a genuinely-NULL dimension value — the marker
    both engines define identically (bit i set ⟺ argument i
    aggregated).

    Plan/scale note: Spark compiles rollup to Expand (each input row
    replicated once per grouping set, here 3×) feeding the SAME
    hash-aggregate as a flat groupBy — partial aggregation is still
    map-side, the single exchange carries only per-(set, key) partials,
    and output is hierarchy-sized. At 10^12 rows the 3× Expand is
    map-local CPU, not wire; beyond ~5 grouping sets the replication
    factor is the knob to watch (split the report, or AQE's partial
    pushdown)."""
    cents = F.round(F.col(value_col) * 100).cast("long")
    base = rows.select(F.col(dim1).alias("d1"), day_col.alias("day"),
                       cents.alias("v"))
    return base.rollup("d1", "day").agg(
        F.grouping_id().cast("int").alias("lvl"),
        F.count("*").cast("long").alias("n"),
        F.sum("v").alias("v_cents"),
    )


def q_event_rollup_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return rollup_report(e, "event_type", _epoch_day("ts"), "value").select(
        F.col("d1").alias("event_type"), "day", "lvl", "n", "v_cents"
    )


def timeseries_gap_fill(rows: DataFrame, dim1: str, day_col) -> DataFrame:
    """(d1, day, n): daily counts per dimension with missing days
    ZERO-FILLED — the dense grid every downstream charting/anomaly
    layer assumes, which a plain groupBy cannot produce (absent keys
    emit no row). The dense day axis is GENERATED, not scanned:
    sequence(min_day, max_day) on the 1-row global-extent aggregate,
    exploded, cross-joined against the distinct dimension values —
    both sides are output-sized (days × dims), so the cross join is a
    broadcast of two tiny relations, never corpus × corpus. One
    corpus shuffle (the counts agg); the left join that fills zeros
    joins two hierarchy-sized tables."""
    base = rows.select(F.col(dim1).alias("d1"), day_col.alias("day"))
    counts = base.groupBy("d1", "day").agg(
        F.count("*").cast("long").alias("n"))
    days = (
        base.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("day"))
    )
    dims = base.select("d1").distinct()
    grid = dims.crossJoin(days)
    return (
        grid.join(counts, ["d1", "day"], "left")
        .select("d1", "day", F.coalesce("n", F.lit(0)).cast("long").alias("n"))
    )


def q_event_daily_dense(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return timeseries_gap_fill(e, "event_type", _epoch_day("ts")).select(
        F.col("d1").alias("event_type"), "day", "n"
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

# integer epoch-day (DuckDB // floors; epochs positive): exact twin of
# _epoch_day without touching floats (epoch-us exceeds 2^53)
def trend_report(rows: DataFrame, dim1: str, day_col) -> DataFrame:
    """(d1, week, n, prev_n, delta, delta_permille): weekly counts per
    dimension with week-over-week change — the reporting shape where
    the WINDOW runs over the AGGREGATE's output, not the corpus: one
    corpus shuffle (the weekly agg), then lag() over partitions that
    are dimension-sized (weeks per dim), so the window stage costs
    nothing at any corpus scale. Weeks are integer epoch-day div 7
    (engine week-start conventions avoided); delta_permille is integer
    floor-div against the previous week (NULL on the first week and on
    a zero base), so the hash gate is exact."""
    base = rows.select(F.col(dim1).alias("d1"),
                       (day_col / F.lit(7)).cast("long").alias("week"))
    weekly = base.groupBy("d1", "week").agg(
        F.count("*").cast("long").alias("n"))
    from pyspark.sql.window import Window

    w = Window.partitionBy("d1").orderBy("week")
    prev = F.lag("n").over(w)
    delta = F.col("n") - prev
    permille = F.when(
        prev > 0,
        F.floor(delta * F.lit(1000) / prev).cast("long"),
    )
    return weekly.select(
        "d1", "week", "n",
        prev.alias("prev_n"),
        delta.alias("delta"),
        permille.alias("delta_permille"),
    )


def q_event_weekly_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return trend_report(e, "event_type", _epoch_day("ts")).select(
        F.col("d1").alias("event_type"), "week", "n", "prev_n", "delta",
        "delta_permille",
    )


HOP_WIN_MIN = 60   # window length (minutes)
HOP_SLIDE_MIN = 15  # hop (minutes); WIN/SLIDE windows cover each event


def hopping_counts(rows: DataFrame, dim1: str) -> DataFrame:
    """(d1, win_start_us, n): sliding/hopping-window counts in BATCH —
    Spark's built-in F.window(slideDuration=...) explodes each event
    into the WIN/SLIDE windows covering it (map-local), then one
    (dim, window) shuffle; the dashboard query behind every
    'requests in the trailing hour, refreshed per quarter hour'. The
    output key is unix_micros(window.start) so the hash gate compares
    integers, not timestamp renderings. Spark aligns hop starts to the
    epoch (starts are multiples of the slide) — the oracle restates
    exactly that arithmetic, so the query also PINS the engine's
    window-alignment semantics."""
    w = F.window("ts", f"{HOP_WIN_MIN} minutes", f"{HOP_SLIDE_MIN} minutes")
    return (
        rows.select(F.col(dim1).alias("d1"), w.alias("w"))
        # parquet ts is TIMESTAMP_NTZ; session tz is pinned UTC so the
        # cast is epoch-identical (the sessionize pattern)
        .select("d1", F.unix_micros(F.col("w.start").cast("timestamp"))
                .alias("win_start_us"))
        .groupBy("d1", "win_start_us")
        .agg(F.count("*").cast("long").alias("n"))
    )


def q_event_hopping_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return hopping_counts(e, "event_type").select(
        F.col("d1").alias("event_type"), "win_start_us", "n"
    )


NTILE_K = 4


def equidepth_profile(rows: DataFrame, dim1: str, value_col: str
                      ) -> DataFrame:
    """(d1, tile, n, lo_cents, hi_cents): equi-depth value profile —
    the quantile-bucket twin of the fixed-width histogram (equal
    POPULATION per bucket, data-driven edges). NTILE's split is SQL
    standard (first n MOD k tiles get the extra row) and identical in
    both engines; ordering by (cents, event_id) makes ties
    deterministic, so bucket EDGES hash-check too. One (dim) window
    shuffle + an output-sized agg; at 10^12 rows per-dimension NTILE
    serializes a dimension through one task — the honest scale
    statement is approx_percentile edges for monitoring (the
    group_quantiles contract), this exact op for bounded-cardinality
    audits."""
    from pyspark.sql.window import Window

    cents = F.round(F.col(value_col) * 100).cast("long")
    w = Window.partitionBy("d1").orderBy("v", "event_id")
    tiled = rows.select(
        F.col(dim1).alias("d1"), "event_id", cents.alias("v")
    ).withColumn("tile", F.ntile(NTILE_K).over(w).cast("int"))
    return tiled.groupBy("d1", "tile").agg(
        F.count("*").cast("long").alias("n"),
        F.min("v").alias("lo_cents"),
        F.max("v").alias("hi_cents"),
    )


def q_event_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return equidepth_profile(e, "event_type", "value").select(
        F.col("d1").alias("event_type"), "tile", "n", "lo_cents", "hi_cents"
    )


def table_profile(rows: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    """(column, n_rows, n_null, n_distinct, min_str, max_str) — the
    ANALYZE-style per-column profile every ingest/data-contract check
    runs: null share, exact cardinality, and lexicographic bounds over
    the STRING rendering of each column (one canonical domain, so a
    bigint and a varchar column profile through identical semantics
    and the result hash-checks cross-engine).

    Plan: ONE corpus scan — the per-column profiles are parallel
    aggregate expressions, not per-column passes; count(DISTINCT a),
    count(DISTINCT b), ... in one agg compiles to a single Expand
    (one input-row replica per column, map-local) feeding one
    exchange, exactly the rollup_report cost model. The unpivot to
    one row per column happens AFTER aggregation (output-sized
    stack). At 10^12 rows the exact distincts are the audit form;
    approx_count_distinct on the same plan is the monitoring twin
    (the group_cardinality contract)."""
    aggs = [F.count("*").cast("long").alias("n_rows")]
    for c in cols:
        s = F.col(c).cast("string")
        aggs += [
            F.sum(s.isNull().cast("long")).cast("long").alias(f"null_{c}"),
            F.countDistinct(s).cast("long").alias(f"nd_{c}"),
            F.min(s).alias(f"min_{c}"),
            F.max(s).alias(f"max_{c}"),
        ]
    one = rows.agg(*aggs)
    stack = ", ".join(
        f"'{c}', null_{c}, nd_{c}, min_{c}, max_{c}" for c in cols
    )
    return one.selectExpr(
        f"stack({len(cols)}, {stack}) AS "
        "(column, n_null, n_distinct, min_str, max_str)",
        "n_rows",
    ).select("column", "n_rows", "n_null", "n_distinct", "min_str", "max_str")


# integer/varchar columns only: their string rendering is identical in
# both engines; float/timestamp columns render with engine-specific
# scientific-notation/trailing-zero conventions, so their profile
# belongs in pytest, not the hash gate
_PROFILE_COLS = ("event_id", "user_id", "event_type", "props")


def q_table_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return table_profile(e, _PROFILE_COLS)


_SQL_EPOCH_DAY = "CAST(epoch_us(ts) // 86400000000 AS BIGINT)"

SQL_EVENT_ROLLUP_REPORT = f"""
SELECT event_type, {_SQL_EPOCH_DAY} AS day,
       CAST(GROUPING(event_type, {_SQL_EPOCH_DAY}) AS INT) AS lvl,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS v_cents
FROM events
GROUP BY ROLLUP (event_type, {_SQL_EPOCH_DAY})
"""

SQL_EVENT_DAILY_DENSE = f"""
WITH base AS (
  SELECT event_type AS d1, {_SQL_EPOCH_DAY} AS day FROM events
),
ext AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM base),
days AS (
  SELECT unnest(generate_series(lo, hi)) AS day FROM ext
),
counts AS (SELECT d1, day, CAST(COUNT(*) AS BIGINT) AS n
           FROM base GROUP BY d1, day)
SELECT dims.d1 AS event_type, days.day,
       COALESCE(counts.n, 0) AS n
FROM (SELECT DISTINCT d1 FROM base) dims
CROSS JOIN days
LEFT JOIN counts ON counts.d1 = dims.d1 AND counts.day = days.day
"""

_SQL_PROFILE_ONE = """
  SELECT '{c}' AS column, CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           AS n_null,
         CAST(COUNT(DISTINCT {c}::VARCHAR) AS BIGINT) AS n_distinct,
         MIN({c}::VARCHAR) AS min_str, MAX({c}::VARCHAR) AS max_str
  FROM events
"""

SQL_TABLE_PROFILE = "\nUNION ALL\n".join(
    _SQL_PROFILE_ONE.format(c=c) for c in _PROFILE_COLS
)

# FLOOR over the same double division Spark runs (identical IEEE
# inputs -> identical rounding -> identical floor), NULL on first week
SQL_EVENT_WEEKLY_TREND = f"""
WITH weekly AS (
  SELECT event_type, ({_SQL_EPOCH_DAY}) // 7 AS week,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events GROUP BY 1, 2
),
t AS (
  SELECT event_type, week, n,
         LAG(n) OVER (PARTITION BY event_type ORDER BY week) AS prev_n
  FROM weekly
)
SELECT event_type, CAST(week AS BIGINT) AS week, n,
       CAST(prev_n AS BIGINT) AS prev_n,
       CAST(n - prev_n AS BIGINT) AS delta,
       CASE WHEN prev_n > 0
            THEN CAST(FLOOR(CAST((n - prev_n) * 1000 AS DOUBLE) / prev_n)
                      AS BIGINT) END AS delta_permille
FROM t
"""

# each event's covering hop windows: starts are the multiples of the
# slide in (us - WIN, us] — exactly Spark's epoch-aligned expansion
_HOP_US = HOP_SLIDE_MIN * 60 * 1_000_000
_WIN_US = HOP_WIN_MIN * 60 * 1_000_000

SQL_EVENT_HOPPING_COUNTS = f"""
WITH e AS (SELECT event_type, epoch_us(ts) AS us FROM events),
x AS (
  SELECT e.event_type,
         (e.us // {_HOP_US} - r.j) * {_HOP_US} AS win_start_us
  FROM e, range({_WIN_US // _HOP_US}) r(j)
  WHERE (e.us // {_HOP_US} - r.j) * {_HOP_US} > e.us - {_WIN_US}
)
SELECT event_type, CAST(win_start_us AS BIGINT) AS win_start_us,
       CAST(COUNT(*) AS BIGINT) AS n
FROM x GROUP BY 1, 2
"""

SQL_EVENT_EQUIDEPTH = f"""
WITH t AS (
  SELECT event_type AS d1, event_id,
         CAST(round(value * 100) AS BIGINT) AS v,
         NTILE({NTILE_K}) OVER (PARTITION BY event_type
                                ORDER BY CAST(round(value * 100) AS BIGINT),
                                         event_id) AS tile
  FROM events
)
SELECT d1 AS event_type, CAST(tile AS INT) AS tile,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(v) AS lo_cents, MAX(v) AS hi_cents
FROM t GROUP BY 1, 2
"""

# ------------------------------------------------------------- pivot
#
# Long -> wide: the report shape every BI surface asks for, and the
# inverse of table_profile's stack() unpivot. Spark-first scale note:
# the built-in DataFrame.pivot is the WRONG physical shape twice over —
# without a value list it runs a hidden collect-distinct job over the
# pivot column (an extra corpus pass and an unbounded-width schema
# hazard at 10^12 rows), and even WITH pinned values it plans a
# two-phase aggregate: Exchange on (key, pivot) then a second Exchange
# on key for pivot_first (measured here: 2 hash exchanges). Pinned
# values admit the strictly better plan — plain conditional aggregates
# (count(when ...)) in ONE groupBy: map-side CASE WHEN partials, a
# single key exchange, dense zeros for free. That is also exactly the
# COUNT(*) FILTER form the oracle states.


def pivot_counts(df: DataFrame, row_key: str, pivot_col: str,
                 values: list[str]) -> DataFrame:
    """Wide count table: one row per row_key, one column per pinned
    pivot value (absent combinations are 0, not null, so the wide
    table is dense and engine-portable)."""
    return df.groupBy(row_key).agg(*[
        F.count(F.when(F.col(pivot_col) == v, True))
        .cast("long").alias(f"n_{v.lower()}")
        for v in values
    ])


def q_status_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders pivoted: priority rows x status columns (O/F/P pinned —
    the TPC-H status domain), count per cell."""
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    return pivot_counts(
        orders.select(
            F.col("o_orderpriority").alias("priority"), "o_orderstatus"
        ),
        "priority", "o_orderstatus", ["F", "O", "P"],
    )


SQL_STATUS_PIVOT = """
SELECT o_orderpriority AS priority,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS BIGINT) AS n_f,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS BIGINT) AS n_o,
       CAST(COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS BIGINT) AS n_p
FROM orders
GROUP BY o_orderpriority
"""

QUERIES = {
    "event_value_quantiles": q_event_value_quantiles,
    "event_user_cardinality": q_event_user_cardinality,
    "event_value_histogram": q_event_value_histogram,
    "event_value_outliers": q_event_value_outliers,
    "event_rollup_report": q_event_rollup_report,
    "event_daily_dense": q_event_daily_dense,
    "table_profile": q_table_profile,
    "event_weekly_trend": q_event_weekly_trend,
    "event_hopping_counts": q_event_hopping_counts,
    "event_equidepth": q_event_equidepth,
    "status_pivot": q_status_pivot,
}

ORACLE_SQL = {
    "event_value_quantiles": SQL_EVENT_VALUE_QUANTILES,
    "event_user_cardinality": SQL_EVENT_USER_CARDINALITY,
    "event_value_histogram": SQL_EVENT_VALUE_HISTOGRAM,
    "event_value_outliers": SQL_EVENT_VALUE_OUTLIERS,
    "event_rollup_report": SQL_EVENT_ROLLUP_REPORT,
    "event_daily_dense": SQL_EVENT_DAILY_DENSE,
    "table_profile": SQL_TABLE_PROFILE,
    "event_weekly_trend": SQL_EVENT_WEEKLY_TREND,
    "event_hopping_counts": SQL_EVENT_HOPPING_COUNTS,
    "event_equidepth": SQL_EVENT_EQUIDEPTH,
    "status_pivot": SQL_STATUS_PIVOT,
}
