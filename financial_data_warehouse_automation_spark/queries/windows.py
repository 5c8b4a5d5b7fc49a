"""Window/analytic operators (SURVEY.md §2.6 W4/W5, §2.10 ranking band).

The reference's keep-last upsert is a window in disguise
(build_warehouse.py:167 ``keep="last"`` ≡ W4 row_number-by-recency), and
the sample warehouse's ``YTD`` column (Final!L) is a cumulative window
sum (W5). Everything here is native ``Window`` spec — one shuffle on the
partition key, no Python. At 100 TB the partition keys (custkey,
segment, year) are high-cardinality or low-skew, so the shuffle scales;
none of these windows are unpartitioned (a global ORDER BY window would
serialize on one task — deliberately avoided).

Determinism: ORDER BY keys always extend to a unique tie-break
(orderkey) so ROWS frames agree between engines; sums run over exact
decimals (see registry.py rules).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from financial_data_warehouse_automation_spark.queries._helpers import money, sql_money
from financial_data_warehouse_automation_spark.registry import query
from financial_data_warehouse_automation_spark.tables import load_table


# ---------------------------------------------------------------------------
# W5 — YTD running total: the sample warehouse's Final!L column
# (cumulative Amount within (GL, Dept, Year) by month) re-expressed over
# the driver tables as revenue per (custkey, year) cumulative by month.
# ---------------------------------------------------------------------------
@query(
    "ytd_running_total",
    headline=True,
    tags=("window", "ytd"),
    oracle=f"""
WITH monthly AS (
  SELECT o_custkey AS custkey,
         EXTRACT(YEAR FROM o_orderdate) AS year,
         EXTRACT(MONTH FROM o_orderdate) AS month,
         CAST(SUM({sql_money('o_totalprice')}) AS DOUBLE) AS month_spend
  FROM orders
  GROUP BY 1, 2, 3
)
SELECT custkey, year, month, month_spend,
       CAST(SUM(month_spend) OVER (
         PARTITION BY custkey, year ORDER BY month
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS ytd_spend
FROM monthly
WHERE custkey % 100 = 0
ORDER BY custkey, year, month
""",
)
def ytd_running_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W5: pre-aggregate to (custkey, year, month) grain, then cumulative
    sum — the pre-agg makes every window row unique so the ROWS frame is
    deterministic. (Double addition over the already-exact month sums is
    order-defined by the frame, hence engine-stable.)"""
    o = load_table(spark, sf_dir, "orders")
    monthly = (
        o.groupBy(
            F.col("o_custkey").alias("custkey"),
            F.year("o_orderdate").cast("long").alias("year"),
            F.month("o_orderdate").cast("long").alias("month"),
        )
        .agg(F.sum(money("o_totalprice")).cast("double").alias("month_spend"))
    )
    w = (
        Window.partitionBy("custkey", "year")
        .orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        monthly.withColumn("ytd_spend", F.sum("month_spend").over(w).cast("double"))
        .where(F.col("custkey") % 100 == 0)
        # no final ORDER BY (r15): order-insensitive gate; the global
        # sort was a range exchange + sampling pass (guide §2.4).
    )


# ---------------------------------------------------------------------------
# Ranking trio — row_number / rank / dense_rank per customer.
# ---------------------------------------------------------------------------
@query(
    "rank_orders_per_customer",
    tags=("window", "rank"),
    oracle="""
SELECT o_custkey AS custkey, o_orderkey AS orderkey, o_totalprice AS totalprice,
       ROW_NUMBER() OVER w AS rn,
       RANK() OVER w AS rnk,
       DENSE_RANK() OVER w AS drnk
FROM orders
WHERE o_custkey % 200 = 0
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)
ORDER BY custkey, rn
""",
)
def rank_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number/rank/dense_rank share one window spec → one shuffle +
    one sort; the orderkey tie-break makes row_number deterministic."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") % 200 == 0)
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
    )


# ---------------------------------------------------------------------------
# lag / lead — month-over-month revenue deltas per segment.
# ---------------------------------------------------------------------------
@query(
    "lag_lead_segment_revenue",
    tags=("window", "lag"),
    oracle=f"""
WITH monthly AS (
  SELECT c.c_mktsegment AS segment,
         EXTRACT(YEAR FROM o.o_orderdate) AS year,
         EXTRACT(MONTH FROM o.o_orderdate) AS month,
         CAST(SUM({sql_money('o.o_totalprice')}) AS DOUBLE) AS revenue
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2, 3
)
SELECT segment, year, month, revenue,
       LAG(revenue) OVER w AS prev_revenue,
       LEAD(revenue) OVER w AS next_revenue,
       revenue - COALESCE(LAG(revenue) OVER w, 0.0) AS mom_delta
FROM monthly
WINDOW w AS (PARTITION BY segment ORDER BY year, month)
ORDER BY segment, year, month
""",
)
def lag_lead_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over a pre-aggregated monthly series (unique rows per
    partition+order key → deterministic offsets)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    monthly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.year("o_orderdate").cast("long").alias("year"),
            F.month("o_orderdate").cast("long").alias("month"),
        )
        .agg(F.sum(money("o_totalprice")).cast("double").alias("revenue"))
    )
    w = Window.partitionBy("segment").orderBy("year", "month")
    return (
        monthly.select(
            "segment", "year", "month", "revenue",
            F.lag("revenue").over(w).alias("prev_revenue"),
            F.lead("revenue").over(w).alias("next_revenue"),
            (F.col("revenue") - F.coalesce(F.lag("revenue").over(w), F.lit(0.0))).alias("mom_delta"),
        )
    )


# ---------------------------------------------------------------------------
# Moving average — trailing 3-month window per segment.
# ---------------------------------------------------------------------------
@query(
    "moving_avg_3m_segment",
    tags=("window", "movavg"),
    oracle=f"""
WITH monthly AS (
  SELECT c.c_mktsegment AS segment,
         EXTRACT(YEAR FROM o.o_orderdate) AS year,
         EXTRACT(MONTH FROM o.o_orderdate) AS month,
         SUM({sql_money('o.o_totalprice')}) AS revenue_dec
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2, 3
)
SELECT segment, year, month,
       CAST(revenue_dec AS DOUBLE) AS revenue,
       CAST(SUM(revenue_dec) OVER w AS DOUBLE) / COUNT(*) OVER w AS avg_3m
FROM monthly
WINDOW w AS (PARTITION BY segment ORDER BY year, month
             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
ORDER BY segment, year, month
""",
)
def moving_avg_3m_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 3-row mean, computed as exact-decimal window SUM divided
    by window COUNT in double (AVG result scales differ between engines;
    the sum/count split is bit-stable — registry.py rules)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    monthly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            F.year("o_orderdate").cast("long").alias("year"),
            F.month("o_orderdate").cast("long").alias("month"),
        )
        .agg(F.sum(money("o_totalprice")).alias("revenue_dec"))
    )
    w = (
        Window.partitionBy("segment")
        .orderBy("year", "month")
        .rowsBetween(-2, Window.currentRow)
    )
    return (
        monthly.select(
            "segment", "year", "month",
            F.col("revenue_dec").cast("double").alias("revenue"),
            (F.sum("revenue_dec").over(w).cast("double")
             / F.count(F.lit(1)).over(w)).alias("avg_3m"),
        )
    )


# ---------------------------------------------------------------------------
# Top-k per group — §2.10's per-group variant of O3.
# ---------------------------------------------------------------------------
@query(
    "top3_orders_per_segment",
    headline=True,
    tags=("window", "topk"),
    oracle="""
SELECT segment, orderkey, totalprice, rn
FROM (
  SELECT c.c_mktsegment AS segment, o.o_orderkey AS orderkey,
         o.o_totalprice AS totalprice,
         ROW_NUMBER() OVER (PARTITION BY c.c_mktsegment
                            ORDER BY o.o_totalprice DESC, o.o_orderkey) AS rn
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
)
WHERE rn <= 3
ORDER BY segment, rn
""",
)
def top3_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """row_number ≤ k per group. Spark pushes a per-partition rank limit
    (WindowGroupLimit) below the shuffle, so each map task only keeps k
    rows per group — the 100 TB-safe formulation of per-group top-k."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_mktsegment").alias("segment"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_totalprice").alias("totalprice"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") <= 3)
        # no final ORDER BY (r15): the top-k semantics live in the
        # WindowGroupLimit + rn filter; the gate is order-insensitive.
    )


# ---------------------------------------------------------------------------
# W4 — keep-last-per-key as a window: the reference's upsert dedupe
# (build_warehouse.py:167, Code.gs:271-273) in its oracle-checkable form.
# ---------------------------------------------------------------------------
@query(
    "latest_order_per_customer",
    tags=("window", "keep-last", "w4"),
    oracle="""
SELECT custkey, orderkey, orderdate, totalprice
FROM (
  SELECT o_custkey AS custkey, o_orderkey AS orderkey,
         CAST(o_orderdate AS DATE) AS orderdate, o_totalprice AS totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_custkey
                            ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
)
WHERE rn = 1
ORDER BY custkey
""",
)
def latest_order_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 keep-last: row_number by recency (orderkey desc tie-break) = 1.
    This exact shape is the A2 upsert's dedupe step (warehouse module)."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_orderdate"), F.desc("o_orderkey")
    )
    return (
        o.select(
            F.col("o_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_orderdate").cast("date").alias("orderdate"),
            F.col("o_totalprice").alias("totalprice"),
            F.row_number().over(w).alias("rn"),
        )
        .where(F.col("rn") == 1)
        .drop("rn")
    )


@query(
    "ntile_acctbal_quartiles",
    tags=("window", "ntile", "distribution"),
    oracle="""
WITH ranked AS (
  SELECT c_mktsegment AS segment,
         c_acctbal,
         ntile(4) OVER w AS quartile,
         percent_rank() OVER w AS prank,
         cume_dist() OVER w AS cdist
  FROM customer
  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
)
SELECT segment, quartile,
       COUNT(*) AS n,
       CAST(MIN(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS min_bal,
       CAST(MAX(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS max_bal,
       MAX(prank) AS max_prank,
       MAX(cdist) AS max_cdist
FROM ranked
GROUP BY 1, 2
ORDER BY segment, quartile
""",
)
def ntile_acctbal_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution windows: ntile quartile assignment + percent_rank +
    cume_dist per segment, summarized to quartile boundary stats. ORDER
    BY extends to custkey so ties are broken identically in both
    engines; the rank ratios are integer divisions in double (exact)."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    ranked = c.select(
        F.col("c_mktsegment").alias("segment"),
        "c_acctbal",
        F.ntile(4).over(w).alias("quartile"),
        F.percent_rank().over(w).alias("prank"),
        F.cume_dist().over(w).alias("cdist"),
    )
    return (
        ranked.groupBy("segment", "quartile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min(money("c_acctbal")).cast("double").alias("min_bal"),
            F.max(money("c_acctbal")).cast("double").alias("max_bal"),
            F.max("prank").alias("max_prank"),
            F.max("cdist").alias("max_cdist"),
        )
    )


@query(
    "gap_fill_pending_revenue",
    tags=("window", "gap-fill", "ffill", "spine"),
    oracle=f"""
WITH bounds AS (
  SELECT date_trunc('month', MIN(o_orderdate)) AS lo,
         date_trunc('month', MAX(o_orderdate)) AS hi
  FROM orders
), spine AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE) AS month
  FROM bounds
), prios AS (
  SELECT DISTINCT o_orderpriority AS priority FROM orders
), monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         o_orderpriority AS priority,
         CAST(SUM({sql_money('o_totalprice')}) AS DOUBLE) AS revenue_raw
  FROM orders
  WHERE o_orderstatus = 'P'
  GROUP BY 1, 2
)
SELECT s.month AS month, p.priority AS priority,
       m.revenue_raw AS revenue_raw,
       COALESCE(last_value(m.revenue_raw IGNORE NULLS) OVER (
         PARTITION BY p.priority ORDER BY s.month
         ROWS UNBOUNDED PRECEDING), 0.0) AS revenue_ffill,
       CAST(m.revenue_raw IS NULL AS BOOLEAN) AS is_gap
FROM spine s CROSS JOIN prios p
LEFT JOIN monthly m ON m.month = s.month AND m.priority = p.priority
ORDER BY s.month, p.priority
""",
)
def gap_fill_pending_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap fill: a generated month spine (sequence + explode)
    cross-joined with the priority axis, left-joined against sparse
    monthly revenue (status 'P' orders exist only in a narrow band, so
    most months are gaps), then forward-filled with last(ignorenulls) —
    the reference's W1 sentinel forward-fill re-expressed on a time
    axis. The spine grows with calendar time, not data volume, so the
    cross join stays tiny at any scale."""
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.date_trunc("month", F.min("o_orderdate")).cast("date").alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).cast("date").alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 MONTH"))).alias("month")
    )
    prios = o.select(F.col("o_orderpriority").alias("priority")).distinct()
    monthly = (
        o.where(F.col("o_orderstatus") == "P")
        .groupBy(
            F.date_trunc("month", "o_orderdate").cast("date").alias("month"),
            F.col("o_orderpriority").alias("priority"),
        )
        .agg(F.sum(money("o_totalprice")).cast("double").alias("revenue_raw"))
    )
    axis = spine.crossJoin(F.broadcast(prios))
    w = (
        Window.partitionBy("priority")
        .orderBy("month")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        axis.join(monthly, ["month", "priority"], "left")
        .select(
            "month",
            "priority",
            "revenue_raw",
            F.coalesce(
                F.last("revenue_raw", ignorenulls=True).over(w), F.lit(0.0)
            ).alias("revenue_ffill"),
            F.col("revenue_raw").isNull().alias("is_gap"),
        )
    )


@query(
    "pctrank_top_customers",
    tags=("windows", "percent_rank", "cume_dist", "nth_value"),
    oracle="""
WITH ranked AS (
  SELECT c_mktsegment AS segment, c_custkey,
         ROUND(CAST(c_acctbal AS DOUBLE), 2) AS acctbal,
         percent_rank() OVER w AS pr,
         cume_dist() OVER w AS cd,
         nth_value(c_custkey, 3) OVER (
           PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS third_richest
  FROM customer
  WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey)
)
SELECT segment, c_custkey, acctbal,
       ROUND(pr, 6) AS pct_rank, ROUND(cd, 6) AS cume_dist, third_richest
FROM ranked
WHERE pr <= 0.01
ORDER BY segment, pct_rank, c_custkey
""",
)
def pctrank_top_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-position window breadth: percent_rank + cume_dist
    locate each customer inside their segment's balance distribution
    (top 1% kept), nth_value surfaces the running 3rd-richest key.
    Ratios of small ints rounded to 6 places hash-match across engines;
    the tie-free ORDER BY (balance, key) makes RANGE and ROWS frames
    agree, pinned with an explicit ROWS frame on both sides."""
    c = load_table(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    wrows = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ranked = c.select(
        F.col("c_mktsegment").alias("segment"),
        "c_custkey",
        F.round(F.col("c_acctbal").cast("double"), 2).alias("acctbal"),
        F.percent_rank().over(w).alias("pr"),
        F.cume_dist().over(w).alias("cd"),
        F.nth_value("c_custkey", 3).over(wrows).alias("third_richest"),
    )
    return (
        ranked.where(F.col("pr") <= 0.01)
        .select(
            "segment",
            "c_custkey",
            "acctbal",
            F.round("pr", 6).alias("pct_rank"),
            F.round("cd", 6).alias("cume_dist"),
            "third_richest",
        )
    )


@query(
    "interpolate_monthly_revenue",
    tags=("window", "interpolation", "time-series"),
    oracle=f"""
WITH bounds AS (
  SELECT date_trunc('month', MIN(o_orderdate)) AS lo,
         date_trunc('month', MAX(o_orderdate)) AS hi
  FROM orders
), spine AS (
  SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE) AS month
  FROM bounds
), monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
         CAST(SUM({sql_money('o_totalprice')}) AS DOUBLE) AS revenue_raw
  FROM orders
  WHERE o_orderstatus = 'P'
  GROUP BY 1
), axis AS (
  SELECT s.month AS month, m.revenue_raw AS revenue_raw,
         ROW_NUMBER() OVER (ORDER BY s.month) AS rn
  FROM spine s LEFT JOIN monthly m ON m.month = s.month
), ctx AS (
  SELECT month, revenue_raw, rn,
         last_value(revenue_raw IGNORE NULLS) OVER w_back AS prev_val,
         last_value(CASE WHEN revenue_raw IS NOT NULL THEN rn END IGNORE NULLS)
             OVER w_back AS prev_rn,
         first_value(revenue_raw IGNORE NULLS) OVER w_fwd AS next_val,
         first_value(CASE WHEN revenue_raw IS NOT NULL THEN rn END IGNORE NULLS)
             OVER w_fwd AS next_rn
  FROM axis
  WINDOW w_back AS (ORDER BY rn ROWS UNBOUNDED PRECEDING),
         w_fwd AS (ORDER BY rn ROWS BETWEEN CURRENT ROW
                   AND UNBOUNDED FOLLOWING)
)
SELECT month, revenue_raw,
       CASE WHEN revenue_raw IS NOT NULL THEN revenue_raw
            WHEN prev_val IS NULL THEN next_val
            WHEN next_val IS NULL THEN prev_val
            ELSE ROUND(prev_val + (next_val - prev_val)
                 * (CAST(rn - prev_rn AS DOUBLE)
                    / CAST(next_rn - prev_rn AS DOUBLE)), 6)
       END AS revenue_interp,
       CAST(revenue_raw IS NULL AS BOOLEAN) AS is_gap
FROM ctx ORDER BY month
""",
)
def interpolate_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear interpolation across time-series gaps (the companion to
    gap_fill_pending_revenue's forward-fill): each missing month gets
    prev + (next-prev) * gap_fraction, edges clamp to the nearest
    known value. Deterministic without decimal sums: the gap fraction
    is a ratio of exact integers, and +,-,*,/ on identical doubles are
    IEEE-identical in both engines (no reordered float accumulation
    anywhere). Plan: month spine + one monthly aggregate, then two
    frame-bounded window passes over the calendar axis — cardinality
    grows with time, not data volume."""
    o = load_table(spark, sf_dir, "orders")
    bounds = o.agg(
        F.date_trunc("month", F.min("o_orderdate")).cast("date").alias("lo"),
        F.date_trunc("month", F.max("o_orderdate")).cast("date").alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("INTERVAL 1 MONTH"))).alias("month")
    )
    monthly = (
        o.where(F.col("o_orderstatus") == "P")
        .groupBy(F.date_trunc("month", "o_orderdate").cast("date").alias("month"))
        .agg(F.sum(money("o_totalprice")).cast("double").alias("revenue_raw"))
    )
    w_rn = Window.orderBy("month")
    axis = (
        spine.join(monthly, "month", "left")
        .withColumn("rn", F.row_number().over(w_rn))
    )
    w_back = Window.orderBy("rn").rowsBetween(Window.unboundedPreceding, 0)
    w_fwd = Window.orderBy("rn").rowsBetween(0, Window.unboundedFollowing)
    rn_if_val = F.when(F.col("revenue_raw").isNotNull(), F.col("rn"))
    ctx = axis.select(
        "month", "revenue_raw", "rn",
        F.last("revenue_raw", ignorenulls=True).over(w_back).alias("prev_val"),
        F.last(rn_if_val, ignorenulls=True).over(w_back).alias("prev_rn"),
        F.first("revenue_raw", ignorenulls=True).over(w_fwd).alias("next_val"),
        F.first(rn_if_val, ignorenulls=True).over(w_fwd).alias("next_rn"),
    )
    frac = (F.col("rn") - F.col("prev_rn")).cast("double") / (
        F.col("next_rn") - F.col("prev_rn")
    ).cast("double")
    interp = (
        F.when(F.col("revenue_raw").isNotNull(), F.col("revenue_raw"))
        .when(F.col("prev_val").isNull(), F.col("next_val"))
        .when(F.col("next_val").isNull(), F.col("prev_val"))
        .otherwise(
            F.round(
                F.col("prev_val")
                + (F.col("next_val") - F.col("prev_val")) * frac,
                6,
            )
        )
    )
    return ctx.select(
        "month",
        "revenue_raw",
        interp.alias("revenue_interp"),
        F.col("revenue_raw").isNull().alias("is_gap"),
    )


@query(
    "trailing_30d_customer_revenue",
    tags=("window", "range-frame", "date"),
    oracle=f"""
WITH daily AS (
  SELECT o_custkey AS custkey,
         CAST(o_orderdate AS DATE) AS day,
         SUM({sql_money('o_totalprice')}) AS day_rev
  FROM orders
  WHERE o_custkey % 100 = 0
  GROUP BY 1, 2
)
SELECT custkey,
       day,
       CAST(day_rev AS DOUBLE) AS day_rev,
       CAST(SUM(day_rev) OVER (
         PARTITION BY custkey ORDER BY day
         RANGE BETWEEN INTERVAL 29 DAY PRECEDING AND CURRENT ROW
       ) AS DOUBLE) AS rev_30d
FROM daily
ORDER BY custkey, day
""",
)
def trailing_30d_customer_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-30-day revenue per customer — a RANGE frame, not ROWS:
    the window is bounded by the ORDER-BY *value* (calendar distance),
    so sparse order histories aggregate the correct interval no matter
    how many rows fall in it (a ROWS frame would silently widen the
    lookback for infrequent buyers). Spark expresses value ranges over
    a numeric sort key — epoch days — with rangeBetween(-29, 0), the
    exact algebra of DuckDB's RANGE BETWEEN INTERVAL 29 DAY PRECEDING.
    Exact decimal day-revenues make the frame sums order-independent.
    Scale: day-grain pre-aggregate, then one customer-keyed window."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_custkey") % 100 == 0)
    daily = o.groupBy(
        F.col("o_custkey").alias("custkey"),
        F.to_date("o_orderdate").alias("day"),
    ).agg(F.sum(money("o_totalprice")).alias("day_rev"))
    w = (
        Window.partitionBy("custkey")
        .orderBy(F.unix_date(F.col("day")))
        .rangeBetween(-29, 0)
    )
    return daily.select(
        "custkey",
        "day",
        F.col("day_rev").cast("double").alias("day_rev"),
        F.sum("day_rev").over(w).cast("double").alias("rev_30d"),
    )


@query(
    "rolling_median_monthly_revenue",
    tags=("window", "percentile", "date"),
    oracle=f"""
WITH monthly AS (
  SELECT c.c_mktsegment AS segment,
         EXTRACT(YEAR FROM o.o_orderdate) * 12 + EXTRACT(MONTH FROM o.o_orderdate) AS mkey,
         CAST(SUM({sql_money('o.o_totalprice')}) AS DOUBLE) AS rev
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
)
SELECT segment,
       CAST(mkey AS BIGINT) AS mkey,
       rev,
       quantile_cont(rev, 0.5) OVER (
         PARTITION BY segment ORDER BY mkey
         ROWS BETWEEN 5 PRECEDING AND CURRENT ROW
       ) AS median_6m
FROM monthly
ORDER BY segment, mkey
""",
)
def rolling_median_monthly_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 6-month median of monthly revenue per segment — an
    ordered-set aggregate (exact interpolated percentile) evaluated
    inside a window frame, the robust-trend statistic a reporting layer
    uses where a mean would chase outliers. Spark's exact percentile()
    and DuckDB's quantile_cont share the sorted-linear-interpolation
    rule, and the month revenues entering the frame are exact decimal
    sums cast to double, so the interpolated medians agree bitwise.
    Scale: month-grain pre-aggregate first; the window runs over
    (#segments × #months) rows only."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    monthly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            (F.year("o_orderdate") * 12 + F.month("o_orderdate"))
            .cast("long").alias("mkey"),
        )
        .agg(F.sum(money("o_totalprice")).cast("double").alias("rev"))
    )
    w = Window.partitionBy("segment").orderBy("mkey").rowsBetween(-5, 0)
    return monthly.select(
        "segment", "mkey", "rev",
        F.expr("percentile(rev, 0.5)").over(w).alias("median_6m"),
    )
