"""Window-function surface: ranking, analytic, frames, top-k per group.

All orderings include a unique tie-break column so results are deterministic
on both engines (SURVEY §2.2 window rows).
"""

from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .base import dec, load, query


@query("window_rank", oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rn FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
                            ORDER BY o_totalprice DESC, o_orderkey) AS rn
  FROM orders) t
WHERE rn <= 3
""")
def window_rank(spark, sf_dir):
    """Top-3 orders per customer — the row_number<=k idiom (QUALIFY)."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rn")
    )


@query("window_rank_kinds", oracle="""
SELECT o_custkey, o_orderkey,
  CAST(rank()       OVER w AS BIGINT) AS rnk,
  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
  CAST(ntile(4)     OVER w AS BIGINT) AS tile,
  percent_rank()    OVER w AS prnk,
  cume_dist()       OVER w AS cdist
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderstatus, o_orderkey)
""")
def window_rank_kinds(spark, sf_dir):
    """rank / dense_rank (real ties via o_orderstatus) + ntile +
    percent_rank/cume_dist (small-integer rationals — identical doubles on
    both engines)."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderstatus", "o_orderkey")
    return orders.select(
        "o_custkey", "o_orderkey",
        F.rank().over(w).cast("long").alias("rnk"),
        F.dense_rank().over(w).cast("long").alias("drnk"),
        F.ntile(4).over(w).cast("long").alias("tile"),
        F.percent_rank().over(w).alias("prnk"),
        F.cume_dist().over(w).alias("cdist"),
    )


@query("window_running", oracle="""
SELECT o_custkey, o_orderkey,
  CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2)))
       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
       AS DOUBLE) AS running_spend
FROM orders
""")
def window_running(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey", "o_orderkey",
        F.sum(dec("o_totalprice", 14)).over(w).cast("double").alias("running_spend"),
    )


@query("window_lag_lead", oracle="""
SELECT o_custkey, o_orderkey,
  lag(o_totalprice)  OVER w AS prev_price,
  lead(o_totalprice) OVER w AS next_price,
  first_value(o_totalprice) OVER w AS first_price,
  last_value(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_price
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey)
""")
def window_lag_lead(spark, sf_dir):
    """lag/lead/first/last per customer ordered by the globally-unique
    order key (unique ordering => engine-portable results)."""
    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return orders.select(
        "o_custkey", "o_orderkey",
        F.lag("o_totalprice").over(w).alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("first_price"),
        F.last("o_totalprice").over(w_full).alias("last_price"),
    )


@query("window_moving_avg", oracle="""
SELECT event_id, user_id,
  CAST(SUM(CAST(value AS DECIMAL(12,2))) OVER w AS DOUBLE)
    / COUNT(*) OVER w AS moving_avg
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
""")
def window_moving_avg(spark, sf_dir):
    """Moving average over a rows frame; exact decimal sum / count instead
    of engine-native avg (see base.py float policy)."""
    ev = load(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return ev.select(
        "event_id", "user_id",
        (F.sum(dec("value")).over(w).cast("double")
         / F.count(F.lit(1)).over(w)).alias("moving_avg"),
    )


@query("window_range_frame", oracle="""
SELECT o_orderkey, o_custkey,
  COUNT(*) OVER (PARTITION BY o_custkey ORDER BY epoch(o_orderdate)
                 RANGE BETWEEN 7776000 PRECEDING AND CURRENT ROW) AS n_90d
FROM orders
""")
def window_range_frame(spark, sf_dir):
    """RANGE frame: orders by the same customer in the trailing 90 days
    (range frames need a numeric key — epoch seconds on both engines)."""
    orders = load(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp(F.col("o_orderdate").cast("timestamp")))
        .rangeBetween(-90 * 24 * 3600, Window.currentRow)
    )
    return orders.select(
        "o_orderkey", "o_custkey",
        F.count(F.lit(1)).over(w).alias("n_90d"),
    )


@query("window_ntile_cume", oracle="""
SELECT l_suppkey, l_orderkey, l_linenumber,
  CAST(ntile(7) OVER w AS BIGINT) AS tile7,
  nth_value(l_extendedprice, 2) OVER w AS second_price,
  cume_dist() OVER w AS cdist
FROM lineitem
WINDOW w AS (PARTITION BY l_suppkey ORDER BY l_orderkey, l_linenumber)
""")
def window_ntile_cume(spark, sf_dir):
    """ntile + nth_value + cume_dist per supplier over the fact table.
    nth_value honors the default running frame on both engines (NULL until
    the 2nd row enters); the ordering is unique so frames agree exactly."""
    li = load(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_suppkey").orderBy("l_orderkey", "l_linenumber")
    return li.select(
        "l_suppkey", "l_orderkey", "l_linenumber",
        F.ntile(7).over(w).cast("long").alias("tile7"),
        F.nth_value("l_extendedprice", 2).over(w).alias("second_price"),
        F.cume_dist().over(w).alias("cdist"),
    )


@query("window_interval_range", oracle="""
SELECT event_id, event_type, ts,
  CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
  CAST(SUM(CAST(value AS DECIMAL(28,12))) OVER w AS DOUBLE)
    AS sum_last_hour
FROM events
WHERE user_id IS NOT NULL AND user_id % 50 = 0
WINDOW w AS (PARTITION BY event_type ORDER BY ts
             RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW)
ORDER BY event_type, ts, event_id
""")
def window_interval_range(spark, sf_dir):
    """Time-interval RANGE frame — the rolling-hour window every
    telemetry rollup needs (`window_range_frame` is its numeric
    twin): per type, events and exact-decimal value sum over the
    trailing hour BY EVENT TIME, ties sharing a timestamp all see the
    same frame (the RANGE-vs-ROWS distinction that matters). Pure
    SQL on both engines; the decimal sum makes the frame fold
    order-free."""
    ev = _view(spark, sf_dir)
    return spark.sql(f"""
        SELECT event_id, event_type, ts,
          CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
          CAST(SUM(CAST(value AS DECIMAL(28,12))) OVER w AS DOUBLE)
            AS sum_last_hour
        FROM {ev}
        WHERE user_id IS NOT NULL AND user_id % 50 = 0
        WINDOW w AS (PARTITION BY event_type ORDER BY ts
                     RANGE BETWEEN INTERVAL 1 HOUR PRECEDING
                           AND CURRENT ROW)
        ORDER BY event_type, ts, event_id
    """)


def _view(spark, sf_dir):
    name = "pbs_win_events"
    load(spark, sf_dir, "events").createOrReplaceTempView(name)
    return name


@query("window_running_distinct", oracle="""
WITH s AS (SELECT user_id, ts, event_id, event_type,
    CASE WHEN ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                 ORDER BY ts, event_id) = 1
         THEN 1 ELSE 0 END AS first_seen
  FROM events WHERE user_id IS NOT NULL AND user_id % 50 = 0)
SELECT user_id, event_id,
  CAST(SUM(first_seen) OVER (PARTITION BY user_id
       ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING
       AND CURRENT ROW) AS BIGINT) AS n_distinct_types
FROM s ORDER BY user_id, event_id
""")
def window_running_distinct(spark, sf_dir):
    """Running DISTINCT count per user — the window surface SQL
    engines refuse directly (COUNT(DISTINCT) OVER is unsupported on
    both): rewritten as the cumulative sum of first-occurrence
    markers, two stacked windows sharing one exchange. The
    'how many distinct actions had this user taken by each event'
    engagement primitive."""
    from pyspark.sql.window import Window as W

    ev = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & (F.col("user_id") % 50 == 0))
    w1 = W.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    w2 = (W.partitionBy("user_id").orderBy("ts", "event_id")
          .rowsBetween(W.unboundedPreceding, W.currentRow))
    s = ev.select(
        "user_id", "ts", "event_id",
        F.when(F.row_number().over(w1) == 1, 1).otherwise(0)
        .alias("first_seen"))
    return (
        s.select("user_id", "event_id",
                 F.sum("first_seen").over(w2).cast("long")
                 .alias("n_distinct_types"))
        .orderBy("user_id", "event_id")
    )


@query("feature_trailing_windows", oracle="""
WITH base AS (SELECT user_id, event_id, ts,
        CAST(round(CAST(value AS DOUBLE), 9) AS DECIMAL(28,9)) AS v
      FROM events
      WHERE user_id IS NOT NULL AND user_id % 50 = 0
        AND value IS NOT NULL)
SELECT user_id, event_id,
  CAST(COUNT(*) OVER w1 AS BIGINT) AS n_1d,
  CAST(COUNT(*) OVER w7 AS BIGINT) AS n_7d,
  CAST(COUNT(*) OVER w30 AS BIGINT) AS n_30d,
  CAST(SUM(v) OVER w7 AS DOUBLE) AS sum_7d,
  round(CAST(SUM(v) OVER w30 AS DOUBLE) / COUNT(*) OVER w30, 6)
    AS mean_30d
FROM base
WINDOW
  w1 AS (PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND CURRENT ROW),
  w7 AS (PARTITION BY user_id ORDER BY ts
         RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW),
  w30 AS (PARTITION BY user_id ORDER BY ts
          RANGE BETWEEN INTERVAL 30 DAY PRECEDING AND CURRENT ROW)
ORDER BY user_id, event_id
""")
def feature_trailing_windows(spark, sf_dir):
    """Point-in-time feature computation (the feature-store backfill
    primitive): trailing 1/7/30-day activity counts and decimal-exact
    value aggregates AT EVERY EVENT, three event-time RANGE frames
    sharing ONE exchange (same partitioning + ordering — Catalyst
    plans one Window operator stack, no re-shuffle per horizon). The
    as-of discipline that prevents training-serving skew: each row
    sees only its own past."""
    ev = _view(spark, sf_dir)
    return spark.sql(f"""
        WITH base AS (SELECT user_id, event_id, ts,
            CAST(round(CAST(value AS DOUBLE), 9) AS DECIMAL(28,9)) AS v
          FROM {ev}
          WHERE user_id IS NOT NULL AND user_id % 50 = 0
            AND value IS NOT NULL)
        SELECT user_id, event_id,
          CAST(COUNT(*) OVER w1 AS BIGINT) AS n_1d,
          CAST(COUNT(*) OVER w7 AS BIGINT) AS n_7d,
          CAST(COUNT(*) OVER w30 AS BIGINT) AS n_30d,
          CAST(SUM(v) OVER w7 AS DOUBLE) AS sum_7d,
          round(CAST(SUM(v) OVER w30 AS DOUBLE) / COUNT(*) OVER w30, 6)
            AS mean_30d
        FROM base
        WINDOW
          w1 AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND CURRENT ROW),
          w7 AS (PARTITION BY user_id ORDER BY ts
                 RANGE BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW),
          w30 AS (PARTITION BY user_id ORDER BY ts
                  RANGE BETWEEN INTERVAL 30 DAY PRECEDING
                  AND CURRENT ROW)
        ORDER BY user_id, event_id
    """)


@query("window_rolling_median", oracle="""
WITH b AS (SELECT user_id, event_id, ts,
             CAST(value AS DECIMAL(18,2)) AS v
           FROM events WHERE user_id IS NOT NULL AND value IS NOT NULL),
m AS (SELECT user_id, event_id,
        quantile_disc(v, 0.5) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS med,
        CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id
          ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) AS INT) AS n_in_frame
      FROM b)
SELECT user_id, event_id, n_in_frame, CAST(med AS DOUBLE) AS rolling_median
FROM m
""")
def window_rolling_median(spark, sf_dir):
    """Exact rolling median over a 7-row trailing frame — the robust
    smoother dashboards use where a rolling MEAN chases spikes. Spark
    has no windowed median, so the frame materializes as a sorted
    array and the median is its middle element (lower median at even
    counts — exactly DuckDB's windowed ``quantile_disc(0.5)``, which
    the oracle uses directly): ``sort_array(collect_list(v) OVER
    frame)[(n+1)/2]``. Values snap to DECIMAL(18,2) so the sort and
    pick are exact; ONE keyed window, frame arrays bounded at 7
    elements — never a per-key collect."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("user_id").isNotNull() & F.col("value").isNotNull()
    ).select(
        "user_id", "event_id", "ts",
        F.col("value").cast("decimal(18,2)").alias("v"),
    )
    from pyspark.sql import Window

    w = (
        Window.partitionBy("user_id").orderBy("ts", "event_id")
        .rowsBetween(-6, 0)
    )
    frame = F.sort_array(F.collect_list("v").over(w))
    n = F.size(frame)
    med = F.element_at(frame, ((n + 1) / 2).cast("int"))
    return ev.select(
        "user_id", "event_id",
        n.cast("int").alias("n_in_frame"),
        med.cast("double").alias("rolling_median"),
    )
