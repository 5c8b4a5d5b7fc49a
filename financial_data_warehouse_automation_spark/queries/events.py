"""Event-stream queries: date/time functions, JSON extraction, tumbling
windows, sessionization, as-of join (SURVEY §2.10 date/JSON/window band).

The ``events`` table (event_id, ts, user_id, event_type, value, props)
is the driver's stand-in for a stream; everything here is the *batch*
form of the streaming wrapper in ``streaming/`` (same expressions run
under ``readStream`` — tumbling windows via ``F.window`` are
watermark-compatible as-is).

Determinism: timestamps never appear raw in final schemas — bucketed
epochs (BIGINT) and DATE columns only (registry.py rules).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from financial_data_warehouse_automation_spark.operators.asof import asof_join_last, asof_join_next
from financial_data_warehouse_automation_spark.queries._helpers import money
from financial_data_warehouse_automation_spark.functions.scalars import md5_prefix_int
from financial_data_warehouse_automation_spark.registry import query
from financial_data_warehouse_automation_spark.tables import load_table


@query(
    "events_daily_stats",
    tags=("events", "date", "agg"),
    oracle="""
SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
       event_type,
       COUNT(*) AS n_events,
       COUNT(DISTINCT user_id) AS n_users,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events
GROUP BY 1, 2
ORDER BY day, event_type
""",
)
def events_daily_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """date_trunc to day grain + per-type counts/distincts/sums — the
    'daily dashboard' aggregation."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(
            F.date_trunc("day", "ts").cast("date").alias("day"),
            "event_type",
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.countDistinct("user_id").alias("n_users"),
            F.sum(money("value")).cast("double").alias("total_value"),
        )
    )


@query(
    "events_json_extract",
    tags=("events", "json"),
    oracle="""
SELECT event_type,
       CAST(MIN(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS max_k,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       COUNT(*) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def events_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """get_json_object over the props JSON-string column (SURVEY §2.10);
    integer aggregation keeps the hash exact."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return (
        e.groupBy("event_type")
        .agg(
            F.min(k).cast("long").alias("min_k"),
            F.max(k).cast("long").alias("max_k"),
            F.sum(k).cast("long").alias("sum_k"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "events_from_json_struct",
    tags=("events", "json", "struct"),
    oracle="""
WITH parsed AS (
  SELECT event_type,
         CAST(json_extract(props, '$.k') AS INTEGER) AS k,
         value
  FROM events
)
SELECT event_type,
       k // 10 AS k_decade,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM parsed
GROUP BY 1, 2
ORDER BY event_type, k_decade
""",
)
def events_from_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed JSON parsing via from_json with an explicit schema (vs the
    path-at-a-time get_json_object in events_json_extract): parse once
    into a struct, then project fields. At scale one from_json per row
    beats N get_json_object calls — the JSON is tokenized once."""
    e = load_table(spark, sf_dir, "events")
    parsed = e.select(
        "event_type",
        "value",
        F.from_json("props", "k INT").alias("p"),
    )
    return (
        parsed.groupBy(
            "event_type",
            F.floor(F.col("p.k") / 10).alias("k_decade"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(money("value")).cast("double").alias("total_value"),
        )
    )


@query(
    "order_interval_math",
    tags=("date", "interval", "functions"),
    oracle="""
SELECT o_orderpriority AS priority,
       COUNT(*) AS n_orders,
       CAST(SUM(date_diff('day', o_orderdate, DATE '1998-08-02')) AS DOUBLE)
         / COUNT(*) AS avg_days_to_anchor,
       date_diff('month', MIN(o_orderdate), MAX(o_orderdate)) AS months_span,
       CAST(MAX(o_orderdate) + INTERVAL 6 MONTH AS DATE) AS max_plus_6m,
       CAST(MIN(o_orderdate) - INTERVAL 1 WEEK AS DATE) AS min_minus_1w
FROM orders
GROUP BY 1
ORDER BY priority
""",
)
def order_interval_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-arithmetic breadth: day diffs to an anchor date,
    whole-month span via month-boundary counting (months_between over
    truncated dates ≡ DuckDB date_diff('month', ...)), add_months with
    end-of-month clamping, week subtraction. Integer day-sums divide in
    double so the average is bit-identical across engines."""
    o = load_table(spark, sf_dir, "orders")
    anchor = F.lit("1998-08-02").cast("date")
    return (
        o.groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            (
                F.sum(F.datediff(anchor, "o_orderdate")).cast("double")
                / F.count(F.lit(1))
            ).alias("avg_days_to_anchor"),
            F.months_between(
                F.trunc(F.max("o_orderdate"), "MM"),
                F.trunc(F.min("o_orderdate"), "MM"),
            ).cast("long").alias("months_span"),
            F.add_months(F.max("o_orderdate"), 6).alias("max_plus_6m"),
            F.date_sub(F.min("o_orderdate").cast("date"), 7).alias("min_minus_1w"),
        )
    )


@query(
    "events_tumbling_15min",
    tags=("events", "window", "tumbling"),
    oracle="""
SELECT CAST(epoch(time_bucket(INTERVAL '15 minutes', ts)) AS BIGINT) AS bucket_start,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM events
WHERE event_type = 'click'
GROUP BY 1
ORDER BY bucket_start
""",
)
def events_tumbling_15min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling event-time window via F.window — the exact expression a
    streaming job uses after withWatermark; emitted as epoch seconds
    (both engines align 15-min buckets to the epoch grid)."""
    e = load_table(spark, sf_dir, "events").where(F.col("event_type") == "click")
    return (
        e.groupBy(F.window("ts", "15 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(money("value")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
            "n_events",
            "total_value",
        )
    )


@query(
    "events_sessionization_30min",
    headline=True,
    tags=("events", "window", "session"),
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800 * 1000000
                   OR LAG(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts, event_id,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       epoch_us(MIN(ts)) AS session_start,
       epoch_us(MAX(ts)) AS session_end,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
)
def events_sessionization_30min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min inactivity): lag → new-session
    flag → running sum = session id. The batch equivalent of
    session_window(ts, '30 minutes'); expressed via plain windows so the
    DuckDB oracle can replicate it bit-for-bit. ``spread_by`` on
    user_id pre-satisfies the window's clustering, so the lag/cumsum
    run without a second exchange on the harness's single-row-group
    scan (plan no-op on a split table)."""
    e = load_table(spark, sf_dir, "events", spread_by=("user_id",))
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull()
        | (F.unix_micros("ts") - F.unix_micros(prev) > 1800 * 1_000_000),
        1,
    ).otherwise(0)
    return (
        e.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(wrun))
        .groupBy("user_id", "session_id")
        .agg(
            F.min(F.unix_micros("ts")).alias("session_start"),
            F.max(F.unix_micros("ts")).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        # no final ORDER BY (r15): order-insensitive gate; the global
        # sort was a range exchange + sampling pass (guide §2.4).
    )


@query(
    "events_sessionization_two_phase",
    tags=("events", "window", "session", "skew"),
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800 * 1000000
                   OR LAG(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts, event_id,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM flagged
)
SELECT user_id, session_id,
       epoch_us(MIN(ts)) AS session_start,
       epoch_us(MAX(ts)) AS session_end,
       COUNT(*) AS n_events
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_id
""",
)
def events_sessionization_two_phase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKEW-RESILIENT sessionization, bit-identical to
    events_sessionization_30min (same oracle SQL; equality also pinned
    in tests/test_sessionization_two_phase.py, including a
    multi-midnight bot chain). The plain formulation partitions the
    window by user_id alone — at 100 TB a single bot/service account
    with years of events serializes one executor and can OOM it, and
    no AQE setting splits a window partition. Two exact passes fix the
    bound:

    1. Window over (user_id, DAY(ts)): each task holds at most one
       user-day of events, whatever one user's total volume is.
       Produces provisional sessions (contiguous event runs).
    2. Merge at SESSION grain: consecutive provisional sessions of a
       user merge iff the boundary gap <= 30 min. Exact because
       sessions are contiguous runs, so the gap between provisional
       session k's last event and k+1's first event IS a true
       consecutive-event gap; within-chunk neighbors never merge (their
       gap exceeded the threshold in pass 1), cross-midnight chains
       merge transitively through the cumulative sum. The second
       window runs on session-grain rows — orders of magnitude fewer
       than events for any realistic cadence (a 1-event-per-second bot
       compresses its whole day into one row), which is the skew bound.

    This is the window-skew analogue of operators/skew.salted_join:
    day is the salt, and the merge pass is the exact un-salting.

    ``spread_by`` is deliberately event_id, NOT user_id: a user_id
    hash-partitioning would SATISFY the pass-1 window's
    (user_id, chunk) clustering (subset rule), suppressing the
    chunk-level exchange and re-serializing a hot user in one task —
    exactly the bound this query exists to break (review finding,
    round 6). Spreading on event_id leaves the window to add its own
    (user_id, chunk) exchange, which is the skew-splitting shape."""
    e = load_table(spark, sf_dir, "events", spread_by=("event_id",))
    gap_us = 1800 * 1_000_000
    w1 = Window.partitionBy("user_id", "chunk").orderBy("ts", "event_id")
    prev = F.lag("ts").over(w1)
    is_new = F.when(
        prev.isNull() | (F.unix_micros("ts") - F.unix_micros(prev) > gap_us), 1
    ).otherwise(0)
    ev = (
        e.withColumn("chunk", F.date_trunc("DAY", F.col("ts")))
        .withColumn("is_new", is_new)
        .withColumn(
            "sid1",
            F.sum("is_new").over(
                w1.rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
    )
    prov = ev.groupBy("user_id", "chunk", "sid1").agg(
        F.min(F.unix_micros("ts")).alias("start"),
        F.max(F.unix_micros("ts")).alias("end"),
        F.count(F.lit(1)).alias("n"),
    )
    w2 = Window.partitionBy("user_id").orderBy("start", "end")
    prev_end = F.lag("end").over(w2)
    new2 = F.when(
        prev_end.isNull() | (F.col("start") - prev_end > gap_us), 1
    ).otherwise(0)
    merged = prov.withColumn("new2", new2).withColumn(
        "session_id",
        F.sum("new2").over(
            w2.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    return (
        merged.groupBy("user_id", "session_id")
        .agg(
            F.min("start").alias("session_start"),
            F.max("end").alias("session_end"),
            F.sum("n").alias("n_events"),
        )
    )


@query(
    "events_asof_last_order",
    headline=True,
    tags=("events", "asof", "join", "interval"),
    oracle="""
WITH probes AS (
  SELECT event_id, user_id, ts - INTERVAL 28 YEAR AS probe_ts
  FROM events WHERE event_type = 'purchase'
), quotes AS (
  SELECT o_custkey AS user_id, o_orderdate AS ots, MAX(o_orderkey) AS last_orderkey
  FROM orders GROUP BY 1, 2
)
SELECT p.event_id, p.user_id,
       epoch_us(p.probe_ts) AS probe_epoch,
       q.last_orderkey,
       CAST(q.ots AS DATE) AS last_orderdate
FROM probes p ASOF LEFT JOIN quotes q
  ON p.user_id = q.user_id AND p.probe_ts >= q.ots
ORDER BY event_id
""",
)
def events_asof_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (merge formulation, operators/asof.py): each purchase
    event — shifted 28 years back into the orders era (interval
    arithmetic) — picks up the user's most recent order at that instant.
    Right side pre-deduped per (key, ts) so ties are well-defined in
    both engines."""
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    probes = e.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 28 YEARS")).alias("probe_ts"),
    )
    quotes = o.groupBy(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("ots"),
    ).agg(F.max("o_orderkey").alias("last_orderkey"))
    joined = asof_join_last(
        probes,
        quotes.withColumn("last_orderdate", F.col("ots").cast("date")),
        on=["user_id"],
        left_ts=F.col("probe_ts"),
        right_ts=F.col("ots"),
        right_cols=["last_orderkey", "last_orderdate"],
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("probe_ts").alias("probe_epoch"),
        "last_orderkey",
        "last_orderdate",
    )  # no final ORDER BY (r15): order-insensitive gate (guide §2.4)


@query(
    "order_date_parts",
    tags=("date", "functions"),
    oracle="""
SELECT EXTRACT(YEAR FROM o_orderdate) AS year,
       EXTRACT(QUARTER FROM o_orderdate) AS quarter,
       EXTRACT(DOW FROM o_orderdate) AS dow,
       COUNT(*) AS n_orders,
       CAST(MIN(CAST(o_orderdate AS DATE) + 90) AS DATE) AS min_due,
       CAST(MAX(date_trunc('month', o_orderdate)) AS DATE) AS max_month_start
FROM orders
GROUP BY 1, 2, 3
ORDER BY year, quarter, dow
""",
)
def order_date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-function breadth: extract year/quarter/day-of-week, date
    arithmetic (+90 days), month truncation. Spark's dayofweek is
    1=Sunday vs DuckDB DOW 0=Sunday — normalized here."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.year("o_orderdate").cast("long").alias("year"),
            F.quarter("o_orderdate").cast("long").alias("quarter"),
            (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min(F.date_add(F.col("o_orderdate").cast("date"), 90)).alias("min_due"),
            F.max(F.date_trunc("month", "o_orderdate").cast("date")).alias("max_month_start"),
        )
    )


@query(
    "events_range_join_quarters",
    tags=("events", "range-join", "interval"),
    oracle="""
WITH periods AS (
  SELECT DISTINCT EXTRACT(YEAR FROM o_orderdate) AS year,
         EXTRACT(QUARTER FROM o_orderdate) AS quarter,
         CAST(date_trunc('quarter', o_orderdate) AS DATE) AS q_start,
         CAST(date_trunc('quarter', o_orderdate) AS DATE) + INTERVAL 3 MONTH AS q_end
  FROM orders
), probes AS (
  SELECT event_id, ts - INTERVAL 28 YEAR AS probe_ts, value
  FROM events WHERE event_type = 'view'
)
SELECT p2.year, p2.quarter,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(p.value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM probes p JOIN periods p2
  ON p.probe_ts >= p2.q_start AND p.probe_ts < p2.q_end
GROUP BY 1, 2
ORDER BY year, quarter
""",
)
def events_range_join_quarters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (non-equi) join: probe timestamps against quarter
    [start, end) intervals. The period side is bounded (a few dozen
    rows at any scale) and broadcast, so the non-equi join is a
    broadcast nested-loop over a tiny build side — never a shuffle of
    the big side."""
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    periods = (
        o.select(
            F.year("o_orderdate").cast("long").alias("year"),
            F.quarter("o_orderdate").cast("long").alias("quarter"),
            F.date_trunc("quarter", "o_orderdate").cast("date").alias("q_start"),
            F.add_months(
                F.date_trunc("quarter", "o_orderdate").cast("date"), 3
            ).alias("q_end"),
        )
        .distinct()
    )
    probes = e.where(F.col("event_type") == "view").select(
        "event_id",
        (F.col("ts") - F.expr("INTERVAL 28 YEARS")).alias("probe_ts"),
        "value",
    )
    return (
        probes.join(
            F.broadcast(periods),
            (F.col("probe_ts") >= F.col("q_start").cast("timestamp"))
            & (F.col("probe_ts") < F.col("q_end").cast("timestamp")),
        )
        .groupBy("year", "quarter")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
    )


@query(
    "events_sliding_30m_15m",
    tags=("events", "window", "sliding"),
    oracle="""
WITH b AS (
  SELECT event_type, value,
         unnest([time_bucket(INTERVAL '15 minutes', ts),
                 time_bucket(INTERVAL '15 minutes', ts) - INTERVAL 15 MINUTES]) AS bucket_start
  FROM events
  WHERE event_type IN ('click', 'purchase')
)
SELECT CAST(epoch(bucket_start) AS BIGINT) AS bucket_start,
       event_type,
       COUNT(*) AS n_events,
       CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) AS total_value
FROM b
GROUP BY 1, 2
ORDER BY bucket_start, event_type
""",
)
def events_sliding_30m_15m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding event-time windows (30-min length, 15-min slide): every
    event lands in two overlapping buckets. Spark's F.window handles the
    duplication natively; the oracle unnests the two bucket starts
    explicitly. (epoch() on a 15-min-aligned bucket is integral, so the
    BIGINT cast is exact here.)"""
    e = load_table(spark, sf_dir, "events").where(
        F.col("event_type").isin("click", "purchase")
    )
    return (
        e.groupBy(
            F.window("ts", "30 minutes", "15 minutes").alias("w"), "event_type"
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(money("value")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
            "event_type", "n_events", "total_value",
        )
    )


@query(
    "events_asof_next_order",
    tags=("events", "asof", "join", "interval", "tolerance"),
    oracle="""
WITH probes AS (
  SELECT event_id, user_id, ts - INTERVAL 28 YEAR AS probe_ts
  FROM events WHERE event_type = 'view'
), quotes AS (
  SELECT o_custkey AS user_id, o_orderdate AS ots, MIN(o_orderkey) AS next_orderkey
  FROM orders GROUP BY 1, 2
), u AS (
  SELECT user_id, probe_ts AS ts, 0 AS side, event_id,
         NULL::BIGINT AS ok, NULL::DATE AS od
  FROM probes
  UNION ALL
  SELECT user_id, CAST(ots AS TIMESTAMP), 1, NULL,
         next_orderkey, CAST(ots AS DATE)
  FROM quotes
), m AS (
  SELECT *,
         first_value(ok IGNORE NULLS) OVER w AS m_ok,
         first_value(od IGNORE NULLS) OVER w AS m_od
  FROM u
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, side
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
)
SELECT event_id, user_id,
       epoch_us(ts) AS probe_epoch,
       CASE WHEN CAST(m_od AS TIMESTAMP) <= ts + INTERVAL 90 DAY
            THEN m_ok END AS next_orderkey,
       CASE WHEN CAST(m_od AS TIMESTAMP) <= ts + INTERVAL 90 DAY
            THEN m_od END AS next_orderdate
FROM m WHERE side = 0
ORDER BY event_id
""",
)
def events_asof_next_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of with tolerance (operators/asof.py asof_join_next):
    each view event — shifted into the orders era — picks up the user's
    NEXT order on/after that instant, but only within 90 days (pandas
    merge_asof direction='forward' + tolerance semantics). The oracle
    mirrors the merge formulation itself (union + forward-looking
    first_value IGNORE NULLS) — same algebra, two engines."""
    e = load_table(spark, sf_dir, "events")
    o = load_table(spark, sf_dir, "orders")
    probes = e.where(F.col("event_type") == "view").select(
        "event_id",
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 28 YEARS")).alias("probe_ts"),
    )
    quotes = o.groupBy(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("ots"),
    ).agg(F.min("o_orderkey").alias("next_orderkey"))
    joined = asof_join_next(
        probes,
        quotes.withColumn("next_orderdate", F.col("ots").cast("date")),
        on=["user_id"],
        left_ts=F.col("probe_ts"),
        right_ts="ots",
        right_cols=["next_orderkey", "next_orderdate"],
        tolerance=F.expr("INTERVAL 90 DAYS"),
    )
    return joined.select(
        "event_id",
        "user_id",
        F.unix_micros("probe_ts").alias("probe_epoch"),
        "next_orderkey",
        "next_orderdate",
    )


@query(
    "user_state_scd2",
    tags=("events", "scd2", "cdc", "window"),
    oracle="""
WITH ordered AS (
  SELECT user_id, ts, event_id, event_type,
         LAG(event_type) OVER w AS prev_type
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), changes AS (
  SELECT user_id, ts, event_id, event_type
  FROM ordered
  WHERE prev_type IS NULL OR event_type <> prev_type
)
SELECT user_id, event_type AS state,
       epoch_us(ts) AS valid_from,
       epoch_us(LEAD(ts) OVER w2) AS valid_to,
       ROW_NUMBER() OVER w2 AS version
FROM changes
WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
ORDER BY user_id, version
""",
)
def user_state_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 history from a change log (CDC compression): collapse each
    user's event stream to rows where the state (event_type) actually
    changed — lag-based change detection — then stamp validity
    intervals [valid_from, valid_to) with lead, NULL valid_to marking
    the current state. This is the slowly-changing-dimension builder
    the reference's GL-dim QA ledger implies but never materializes:
    two partitioned window passes, no self-join, linear at any scale."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.withColumn("prev_type", F.lag("event_type").over(w))
        .where(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select("user_id", "ts", "event_id", "event_type")
    )
    w2 = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        changes.select(
            "user_id",
            F.col("event_type").alias("state"),
            F.unix_micros("ts").alias("valid_from"),
            F.unix_micros(F.lead("ts").over(w2)).alias("valid_to"),
            F.row_number().over(w2).alias("version"),
        )
    )


@query(
    "session_funnel_conversion",
    tags=("events", "funnel", "session", "conditional"),
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id, event_type,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800 * 1000000
                   OR LAG(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts, event_type,
         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS BIGINT)
           AS session_id
  FROM flagged
), per_session AS (
  SELECT user_id, session_id,
         MIN(epoch_us(ts)) FILTER (WHERE event_type = 'view') AS t_view,
         MIN(epoch_us(ts)) FILTER (WHERE event_type = 'click') AS t_click,
         MIN(epoch_us(ts)) FILTER (WHERE event_type = 'purchase') AS t_purchase
  FROM sessions
  GROUP BY 1, 2
)
SELECT COUNT(*) AS n_sessions,
       COUNT(*) FILTER (WHERE t_view IS NOT NULL) AS n_view,
       COUNT(*) FILTER (WHERE t_view IS NOT NULL AND t_click >= t_view)
         AS n_view_click,
       COUNT(*) FILTER (WHERE t_view IS NOT NULL AND t_click >= t_view
                          AND t_purchase >= t_click) AS n_full_funnel
FROM per_session
""",
)
def session_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel over gap-sessionized streams: per session, the
    first view / click / purchase timestamps (conditional MIN), then
    step counts requiring each stage to follow the previous one. The
    canonical product-analytics query, composed from sessionization +
    FILTER-style conditional aggregation — two window passes and one
    rollup, no joins at all."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("ts").over(w)
    is_new = F.when(
        prev.isNull()
        | (F.unix_micros("ts") - F.unix_micros(prev) > 1800 * 1_000_000),
        1,
    ).otherwise(0)

    def first_ts(t: str):
        return F.min(
            F.when(F.col("event_type") == t, F.unix_micros("ts"))
        )

    per_session = (
        e.withColumn("is_new", is_new)
        .withColumn("session_id", F.sum("is_new").over(wrun))
        .groupBy("user_id", "session_id")
        .agg(
            first_ts("view").alias("t_view"),
            first_ts("click").alias("t_click"),
            first_ts("purchase").alias("t_purchase"),
        )
    )
    seen_view = F.col("t_view").isNotNull()
    view_click = seen_view & (F.col("t_click") >= F.col("t_view"))
    full = view_click & (F.col("t_purchase") >= F.col("t_click"))
    return per_session.agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.count_if(seen_view).alias("n_view"),
        F.count_if(view_click).alias("n_view_click"),
        F.count_if(full).alias("n_full_funnel"),
    )


@query(
    "events_map_breadth",
    tags=("events", "map", "hof"),
    oracle="""
WITH d AS (
  SELECT user_id, CAST(day(ts) AS INTEGER) AS day, COUNT(*) AS n
  FROM events GROUP BY 1, 2
)
SELECT user_id,
       COUNT(*) AS n_days,
       COALESCE(array_to_string(list(day ORDER BY day) FILTER (WHERE n >= 5),
                                ','), '') AS busy_days,
       CAST(SUM(n) AS BIGINT) AS total_events,
       CAST(MAX(n) AS BIGINT) AS peak_day_events
FROM d GROUP BY user_id
ORDER BY user_id
""",
)
def events_map_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-typed column surface: per user, build a day→count map with
    map_from_entries over a SORTED entry array (map entry order is the
    one engine-portable ordering), then drive every downstream stat
    through map functions — map_filter for busy days, map_keys for the
    key list, and fold/max HOFs over map_values. Integer-only values
    keep the hash exact; the map never leaves the plan, and the busy-day
    list is emitted as a comma-joined string because the driver's
    canonicalizer (pandas sort) can't order list cells and raw map
    output has no cross-engine ordering contract."""
    e = load_table(spark, sf_dir, "events")
    d = (
        e.groupBy("user_id", F.dayofmonth("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    per_user = d.groupBy("user_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("day", "n")))
        ).alias("m")
    )
    busy = F.map_keys(F.map_filter("m", lambda k, v: v >= F.lit(5)))
    total = F.aggregate(
        F.map_values("m"), F.lit(0).cast("long"), lambda acc, x: acc + x
    )
    return (
        per_user.select(
            "user_id",
            F.size("m").alias("n_days"),
            F.array_join(busy.cast("array<string>"), ",").alias("busy_days"),
            total.alias("total_events"),
            F.array_max(F.map_values("m")).cast("long").alias("peak_day_events"),
        )
    )


@query(
    "events_retention_cohorts",
    tags=("events", "cohort", "retention"),
    oracle="""
WITH activity AS (
  SELECT DISTINCT user_id, CAST(day(ts) AS INTEGER) AS day FROM events
), cohorts AS (
  SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY user_id
), sized AS (
  SELECT cohort_day, COUNT(*) AS cohort_size FROM cohorts GROUP BY cohort_day
)
SELECT c.cohort_day AS cohort_day,
       a.day - c.cohort_day AS day_offset,
       COUNT(*) AS n_active,
       s.cohort_size AS cohort_size,
       CAST(COUNT(*) AS DOUBLE) / s.cohort_size AS retention
FROM activity a
JOIN cohorts c ON a.user_id = c.user_id
JOIN sized s ON c.cohort_day = s.cohort_day
GROUP BY c.cohort_day, a.day - c.cohort_day, s.cohort_size
ORDER BY cohort_day, day_offset
""",
)
def events_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users bucketed by first-active day; each
    (cohort, day-offset) cell counts distinct users still active —
    the standard retention-triangle query. All counts are exact
    integers and the rate is one exact division, so the hash matches
    across engines. Scale shape: activity distinct + per-user min are
    user-keyed aggregates (one shuffle, map-side combine); the cohort
    and size joins broadcast — cohort cardinality is bounded by
    calendar days, not data volume."""
    e = load_table(spark, sf_dir, "events")
    activity = e.select(
        "user_id", F.dayofmonth("ts").alias("day")
    ).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    sized = cohorts.groupBy("cohort_day").agg(
        F.count(F.lit(1)).alias("cohort_size")
    )
    return (
        activity.join(cohorts, "user_id")
        .join(F.broadcast(sized), "cohort_day")
        .groupBy(
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).alias("day_offset"),
            "cohort_size",
        )
        .agg(F.count(F.lit(1)).alias("n_active"))
        .select(
            "cohort_day", "day_offset", "n_active", "cohort_size",
            (F.col("n_active").cast("double") / F.col("cohort_size")).alias(
                "retention"
            ),
        )
    )


@query(
    "events_zscore_anomalies",
    tags=("events", "window", "anomaly", "stats"),
    oracle="""
WITH daily AS (
  SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
         event_type,
         COUNT(*) AS n
  FROM events GROUP BY 1, 2
), walled AS (
  SELECT day, event_type, n,
         COUNT(*)        OVER w AS w_cnt,
         SUM(n)          OVER w AS w_sum,
         SUM(n * n)      OVER w AS w_sumsq
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
), scored AS (
  SELECT day, event_type, n,
         (CAST(w_sumsq AS DOUBLE)
          - CAST(w_sum AS DOUBLE) * CAST(w_sum AS DOUBLE) / w_cnt)
         / (w_cnt - 1) AS variance,
         CAST(w_sum AS DOUBLE) / w_cnt AS mean
  FROM walled WHERE w_cnt = 7
)
SELECT day, event_type, n AS n_events,
       ROUND((n - mean) / sqrt(variance), 6) AS zscore
FROM scored
WHERE variance > 0.0 AND abs((n - mean) / sqrt(variance)) > 2.0
ORDER BY day, event_type
""",
)
def events_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly detection: per event type, each day's count is
    z-scored against the trailing 7 complete days; |z| > 2 rows
    surface. The moments are exact BIGINT window sums (count / sum /
    sum-of-squares — order-independent integer adds), converted to
    double only in the final mean/variance arithmetic, which both
    engines evaluate with the identical IEEE expression tree — the
    determinism discipline that makes streaming-style monitoring
    oracle-checkable. Scale: one day-grain pre-aggregate (tiny), then
    a per-type ordered window over days — thousands of rows at any
    corpus size; the heavy lifting stays in the first groupBy."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        F.date_trunc("day", "ts").cast("date").alias("day"),
        "event_type",
    ).agg(F.count(F.lit(1)).alias("n"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(-7, -1)
    )
    walled = daily.select(
        "day", "event_type", "n",
        F.count(F.lit(1)).over(w).alias("w_cnt"),
        F.sum("n").over(w).alias("w_sum"),
        F.sum(F.col("n") * F.col("n")).over(w).alias("w_sumsq"),
    ).where(F.col("w_cnt") == 7)
    mean = F.col("w_sum").cast("double") / F.col("w_cnt")
    variance = (
        F.col("w_sumsq").cast("double")
        - F.col("w_sum").cast("double") * F.col("w_sum").cast("double")
        / F.col("w_cnt")
    ) / (F.col("w_cnt") - 1)
    z = (F.col("n") - mean) / F.sqrt(variance)
    return (
        walled.select("day", "event_type", F.col("n").alias("n_events"),
                      F.round(z, 6).alias("zscore"),
                      variance.alias("_var"), z.alias("_z"))
        .where((F.col("_var") > 0.0) & (F.abs(F.col("_z")) > 2.0))
        .drop("_var", "_z")
    )


@query(
    "events_variant_extract",
    tags=("events", "json", "variant"),
    oracle="""
SELECT event_type,
       CAST(SUM(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS sum_k,
       CAST(COUNT(CAST(json_extract(props, '$.k') AS INTEGER)) AS BIGINT) AS n_k,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events
GROUP BY event_type
ORDER BY event_type
""",
)
def events_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured access through Spark 4's VARIANT type:
    ``parse_json`` converts the props string to the binary variant
    encoding once, ``variant_get`` path-extracts with a target type.
    Same answers as the string-path ``events_json_extract`` twin, but
    at 100 TB the variant encoding is parsed once at ingest (shredded,
    column-pruned) instead of re-tokenizing JSON text per access —
    this query pins the API surface and its value semantics against
    the DuckDB JSON oracle."""
    e = load_table(spark, sf_dir, "events")
    k = F.variant_get(F.try_parse_json("props"), "$.k", "int")
    return (
        e.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.sum("k").cast("long").alias("sum_k"),
            F.count("k").cast("long").alias("n_k"),
            F.count(F.lit(1)).cast("long").alias("n"),
        )
    )


@query(
    "events_rolling_distinct_users",
    tags=("events", "window", "distinct", "rolling"),
    oracle="""
WITH active AS (
  SELECT DISTINCT event_type,
         CAST(date_trunc('day', ts) AS DATE) AS day,
         user_id
  FROM events
), days AS (
  SELECT DISTINCT CAST(date_trunc('day', ts) AS DATE) AS day FROM events
), contrib AS (
  SELECT DISTINCT a.event_type, d.day, a.user_id
  FROM active a JOIN days d
    ON d.day >= a.day AND d.day <= a.day + INTERVAL 6 DAY
)
SELECT event_type, day, COUNT(*) AS wau
FROM contrib
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def events_rolling_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct users (WAU) per event type. Spark has no
    COUNT(DISTINCT) OVER, and the collect_set-over-window fallback
    holds every frame's users in one task — the scalable formulation
    dedupes to (type, user, day) grain, explodes each activity into
    the 7 report days it supports (sequence + explode: pure map work,
    no join), equi-joins the observed-day spine to drop phantom tail
    days, dedupes again, and counts: key-partitioned shuffles of
    bounded rows (7× the active grain), no per-frame state. The oracle
    mirrors the same set algebra with a range join."""
    e = load_table(spark, sf_dir, "events")
    active = e.select(
        "event_type",
        F.date_trunc("day", "ts").cast("date").alias("day"),
        "user_id",
    ).distinct()
    days = e.select(
        F.date_trunc("day", "ts").cast("date").alias("rday")
    ).distinct()
    contrib = (
        active.select(
            "event_type",
            "user_id",
            F.explode(
                F.sequence(F.col("day"), F.date_add(F.col("day"), 6))
            ).alias("day"),
        )
        .join(F.broadcast(days), F.col("day") == F.col("rday"))
        .select("event_type", "day", "user_id")
        .distinct()
    )
    return (
        contrib.groupBy("event_type", "day")
        .agg(F.count(F.lit(1)).alias("wau"))
    )


@query(
    "events_mad_anomalies",
    tags=("events", "robust-stats", "percentile", "anomaly"),
    oracle="""
WITH ranked AS (
  SELECT event_type, value, event_id,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY value, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM events
), med AS (
  SELECT event_type, MAX(CASE WHEN rn = (n + 1) // 2 THEN value END) AS med
  FROM ranked GROUP BY 1
), dev AS (
  SELECT e.event_type, e.event_id, e.value,
         ABS(e.value - m.med) AS adev, m.med
  FROM events e JOIN med m ON e.event_type = m.event_type
), dranked AS (
  SELECT event_type, event_id, value, adev, med,
         ROW_NUMBER() OVER (PARTITION BY event_type
                            ORDER BY adev, event_id) AS rn,
         COUNT(*) OVER (PARTITION BY event_type) AS n
  FROM dev
), mad AS (
  SELECT event_type, MAX(CASE WHEN rn = (n + 1) // 2 THEN adev END) AS mad
  FROM dranked GROUP BY 1
)
SELECT d.event_id, d.event_type, d.value, d.med, m.mad,
       ROUND(d.adev / m.mad, 6) AS mad_ratio
FROM dev d JOIN mad m ON d.event_type = m.event_type
WHERE d.adev > 5 * m.mad
ORDER BY d.event_type, d.event_id
""",
)
def events_mad_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: events whose value deviates from the
    per-type median by more than 5x the median absolute deviation.
    Unlike the z-score variant (events_zscore_anomalies), median/MAD
    don't move when the outliers themselves get bigger — the estimator
    the anomalies can't poison. Medians are exact nearest-rank picks
    (rank ceil(n/2) in integer arithmetic, the order_price_percentiles
    pattern) — no interpolation, so both engines select the SAME stored
    double and every downstream subtraction/division is bit-identical.
    Shape: two window passes partitioned by event_type + two broadcast
    joins of the 5-row stats; at scale the only exchanges are the two
    per-type window shuffles over the same key."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("event_type").orderBy("value", "event_id")
    wn = Window.partitionBy("event_type")
    ranked = e.select(
        "event_type", "value", "event_id",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    # exact integer ceil(n/2) via floor((n + 1) / 2)
    med = ranked.groupBy(F.col("event_type").alias("m_type")).agg(
        F.max(
            F.when(F.col("rn") == F.floor((F.col("n") + 1) / 2), F.col("value"))
        ).alias("med")
    )
    dev = (
        e.join(F.broadcast(med), e.event_type == F.col("m_type"))
        .select(
            "event_type", "event_id", "value", "med",
            F.abs(F.col("value") - F.col("med")).alias("adev"),
        )
    )
    dw = Window.partitionBy("event_type").orderBy("adev", "event_id")
    dwn = Window.partitionBy("event_type")
    dranked = dev.select(
        "event_type", "adev",
        F.row_number().over(dw).alias("rn"),
        F.count(F.lit(1)).over(dwn).alias("n"),
    )
    mad = dranked.groupBy(F.col("event_type").alias("d_type")).agg(
        F.max(
            F.when(F.col("rn") == F.floor((F.col("n") + 1) / 2), F.col("adev"))
        ).alias("mad")
    )
    return (
        dev.join(F.broadcast(mad), dev.event_type == F.col("d_type"))
        .where(F.col("adev") > 5 * F.col("mad"))
        .select(
            "event_id", "event_type", "value", "med", "mad",
            F.round(F.col("adev") / F.col("mad"), 6).alias("mad_ratio"),
        )
    )


@query(
    "events_ewma_daily",
    tags=("events", "timeseries", "window", "range-join"),
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS cents
  FROM events GROUP BY 1, 2
)
SELECT d.event_type, d.day,
       CAST(MAX(d.cents) AS BIGINT) AS day_cents,
       CAST(COUNT(*) AS BIGINT) AS n_days,
       CAST(SUM((CAST(1 AS BIGINT) << (7 - DATEDIFF('day', p.day, d.day)))
                * p.cents) AS BIGINT) AS wsum,
       CAST(SUM(CAST(1 AS BIGINT) << (7 - DATEDIFF('day', p.day, d.day)))
         AS BIGINT) AS wtot
FROM daily d
JOIN daily p ON p.event_type = d.event_type
            AND p.day <= d.day
            AND p.day >= d.day - INTERVAL 7 DAY
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing-8-day exponentially weighted moving average of daily
    event value per type, computed EXACTLY: weights are the integers
    2^7..2^0 (alpha = 1/2, truncated at 8 days) and the daily values
    integer cents, so the weighted sum is pure int64 arithmetic — the
    caller divides wsum/wtot for the EWMA with no float-accumulation
    nondeterminism anywhere (a float pow(alpha, k) chain would be
    engine-order dependent). Shape: the day grain collapses the event
    stream first (tiny), then a banded self range-join — equi on
    event_type plus a bounded 8-day range — so the join fan-out is at
    most 8 rows per day regardless of event volume; at 100 TB the
    heavy lifting is the first aggregate, which map-side combines."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("cents"))
    d = daily.alias("d")
    p = daily.alias("p")
    diff = F.datediff(F.col("d.day"), F.col("p.day"))
    # weight 2^(7-diff) via literal lookup (shiftleft needs a static
    # shift amount); index 1-based on diff in [0, 7]
    w = F.element_at(
        F.array(*[F.lit(1 << (7 - k)).cast("bigint") for k in range(8)]),
        (diff + 1).cast("int"),
    )
    return (
        d.join(
            p,
            (F.col("p.event_type") == F.col("d.event_type"))
            & (F.col("p.day") <= F.col("d.day"))
            & (F.col("p.day") >= F.date_sub(F.col("d.day"), 7)),
        )
        .groupBy(F.col("d.event_type").alias("event_type"), F.col("d.day").alias("day"))
        .agg(
            F.max("d.cents").cast("long").alias("day_cents"),
            F.count(F.lit(1)).alias("n_days"),
            F.sum(w * F.col("p.cents")).alias("wsum"),
            F.sum(w).alias("wtot"),
        )
    )


@query(
    "events_markov_transitions",
    tags=("events", "sequence", "window", "markov"),
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) AS prev_type
  FROM events
), trans AS (
  SELECT prev_type, event_type, COUNT(*) AS n_trans
  FROM seq WHERE prev_type IS NOT NULL
  GROUP BY 1, 2
), tot AS (
  SELECT prev_type, SUM(n_trans) AS n_from FROM trans GROUP BY 1
)
SELECT t.prev_type, t.event_type,
       CAST(t.n_trans AS BIGINT) AS n_trans,
       ROUND(CAST(t.n_trans AS DOUBLE) / o.n_from, 6) AS p_trans
FROM trans t JOIN tot o ON t.prev_type = o.prev_type
ORDER BY t.prev_type, t.event_type
""",
)
def events_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of event types per user —
    the sequence statistic behind next-action models and session
    simulators. One lag window partitioned by user (ordered ts then
    event_id so same-timestamp rows sequence deterministically), one
    (prev, curr) aggregate, and the row-normalizer re-reduces that
    aggregate instead of re-scanning. p_trans divides two exact longs
    in double and rounds to 6 — bit-stable in both engines. At scale:
    the user-partitioned window is the only corpus-sized shuffle; the
    transition matrix itself is |types|^2."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    trans = (
        e.select("user_id", "event_type", F.lag("event_type").over(w).alias("prev_type"))
        .where(F.col("prev_type").isNotNull())
        .groupBy("prev_type", "event_type")
        .agg(F.count(F.lit(1)).alias("n_trans"))
    )
    tot = trans.groupBy(F.col("prev_type").alias("t_prev")).agg(
        F.sum("n_trans").alias("n_from")
    )
    return (
        trans.join(F.broadcast(tot), trans.prev_type == F.col("t_prev"))
        .select(
            "prev_type",
            "event_type",
            "n_trans",
            F.round(F.col("n_trans").cast("double") / F.col("n_from"), 6).alias(
                "p_trans"
            ),
        )
    )


@query(
    "events_cusum_drift",
    tags=("events", "timeseries", "window", "anomaly"),
    oracle="""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS cents
  FROM events GROUP BY 1, 2
), target AS (
  SELECT event_type AS t_type,
         SUM(cents) // COUNT(*) AS target_cents  -- integer division: exact
  FROM daily GROUP BY 1
), s AS (
  SELECT d.event_type, d.day, d.cents, t.target_cents,
         SUM(d.cents - t.target_cents) OVER (
           PARTITION BY d.event_type ORDER BY d.day) AS run
  FROM daily d JOIN target t ON d.event_type = t.t_type
), c AS (
  SELECT event_type, day, cents, run,
         MIN(run) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS min_prev
  FROM s
)
SELECT event_type, day,
       CAST(cents AS BIGINT) AS day_cents,
       -- C_t = max(0, S_t - min(0, S_0..S_{t-1})): the 0 is S at t=-1
       CAST(GREATEST(run - LEAST(COALESCE(min_prev, 0), 0), 0) AS BIGINT)
         AS cusum_cents
FROM c
ORDER BY event_type, day
""",
)
def events_cusum_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-sided CUSUM drift statistic per event type over the daily
    value series — the sequential change detector (alarm when
    cusum_cents exceeds a control limit). The textbook recurrence
    C_t = max(0, C_{t-1} + (x_t - target)) looks inherently sequential,
    but has the closed form C_t = max(0, S_t - min(0, S_0..S_{t-1})) with
    S = running sum of deviations — so it runs as TWO stacked window
    passes over the SAME (type, day) partitioning: one cumulative sum,
    one running min. No recursion, no UDF, no driver loop; at 100 TB
    the day grain collapses first and both windows share one shuffle.
    The target is the integer-division mean (exact in both engines);
    everything stays int64 cents."""
    e = load_table(spark, sf_dir, "events")
    daily = e.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("cents"))
    target = daily.groupBy(F.col("event_type").alias("t_type")).agg(
        F.sum("cents").alias("_s"), F.count(F.lit(1)).alias("_n")
    ).select(
        "t_type", F.expr("_s DIV _n").alias("target_cents")  # exact int div
    )
    w_sum = Window.partitionBy("event_type").orderBy("day")
    w_min = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    s = (
        daily.join(F.broadcast(target), daily.event_type == F.col("t_type"))
        .select(
            "event_type", "day", "cents",
            F.sum(F.col("cents") - F.col("target_cents")).over(w_sum).alias("run"),
        )
    )
    min_prev = F.coalesce(F.min("run").over(w_min), F.lit(0))
    return (
        s.select(
            "event_type", "day",
            F.col("cents").alias("day_cents"),
            # C_t = max(0, S_t - min(0, S_0..S_{t-1})); 0 is S at t=-1
            F.greatest(
                F.col("run") - F.least(min_prev, F.lit(0)), F.lit(0)
            ).cast("long").alias("cusum_cents"),
        )
    )


@query(
    "events_session_window_builtin",
    tags=("events", "window", "session", "builtin"),
    oracle="""
WITH flagged AS (
  SELECT user_id, ts, event_id,
         CASE WHEN epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800 * 1000000
                   OR LAG(ts) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT user_id, ts,
         SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_id
  FROM flagged
)
SELECT user_id,
       CAST(epoch_us(MIN(ts)) AS BIGINT) AS session_start,
       CAST(COUNT(*) AS BIGINT) AS n_events
FROM sessions
GROUP BY user_id, session_id
ORDER BY user_id, session_start
""",
)
def events_session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization via Spark's BUILT-IN ``F.session_window`` (the
    dedicated operator, vs the portable lag+cumsum recurrence of
    events_sessionization_30min — both registered so the gate proves
    the two formulations agree with the oracle AND each other).
    session_window merges rows whose gaps stay under 30 minutes inside
    a single aggregate — no window-function pass at all, and under
    readStream the SAME expression becomes a watermark-evicted
    streaming sessionizer, which is the operator's real 100 TB appeal.
    Emitted as (user, session_start, n_events): session_start is the
    min event time, identical to the recurrence's MIN(ts); the builtin
    window END extends gap minutes past the last event, so the
    portable recurrence's MAX(ts) is intentionally not compared."""
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(
            "user_id",
            F.unix_micros(F.col("w.start")).alias("session_start"),
            "n_events",
        )
    )


@query(
    "events_top_paths_3step",
    tags=("events", "sequence", "window", "topk"),
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LAG(event_type, 1) OVER w AS p1,
         LAG(event_type, 2) OVER w AS p2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
)
SELECT p2 || '>' || p1 || '>' || event_type AS path,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users
FROM seq WHERE p2 IS NOT NULL
GROUP BY 1
ORDER BY n DESC, path
LIMIT 25
""",
)
def events_top_paths_3step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Most common 3-step user journeys (event-type trigrams over each
    user's time-ordered stream) — the path-mining query behind funnel
    discovery, here as two stacked lags in ONE window pass (same
    partitioning, so one shuffle serves both) + a trigram census with
    per-path user reach. Top-25 cut rides (n desc, path) — fully
    deterministic — and plans as TakeOrderedAndProject. Scale: the
    user-partitioned window is the only corpus shuffle; the path
    census is at most |types|^3 keys."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(
        "user_id",
        "event_type",
        F.lag("event_type", 1).over(w).alias("p1"),
        F.lag("event_type", 2).over(w).alias("p2"),
    ).where(F.col("p2").isNotNull())
    return (
        seq.select(
            F.concat_ws(">", "p2", "p1", "event_type").alias("path"), "user_id"
        )
        .groupBy("path")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("user_id").alias("n_users"),
        )
        .orderBy(F.desc("n"), "path")
        .limit(25)
    )


@query(
    "events_attribution_last_touch",
    tags=("events", "asof", "attribution", "funnel"),
    oracle="""
WITH probes AS (
  SELECT event_id, user_id, ts,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), quotes AS (
  SELECT user_id, ts AS cts, MAX(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
), j AS (
  SELECT p.event_id, p.cents, p.ts, q.cts
  FROM probes p ASOF LEFT JOIN quotes q
    ON p.user_id = q.user_id AND p.ts >= q.cts
)
SELECT CASE WHEN cts IS NOT NULL AND cts >= ts - INTERVAL 7 DAY
            THEN strftime(cts, '%Y-%m-%d') ELSE 'none' END AS click_day,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM j GROUP BY 1 ORDER BY 1
""",
)
def events_attribution_last_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase's revenue is
    credited to the user's most recent click, but only within a 7-day
    lookback window (older or absent clicks fall into the 'none'
    bucket) — the standard conversion-credit rule, built on the same
    merge-formulated as-of join as events_asof_last_order (one shuffle
    on user_id, zero row explosion; a join-then-filter formulation is
    |purchases| x |clicks per user| and dies on hot users at scale).
    The attribution window check runs AFTER the as-of match — the
    as-of picks the latest click unconditionally, then the 7-day rule
    classifies, so tolerance costs nothing extra. Clicks pre-deduped
    per (user, ts) keep-max-id so ties are engine-independent; output
    is the day-grain credited-revenue ledger."""
    e = load_table(spark, sf_dir, "events")
    probes = e.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    quotes = e.where(F.col("event_type") == "click").groupBy(
        "user_id", F.col("ts").alias("cts")
    ).agg(F.max("event_id").alias("click_id"))
    j = asof_join_last(
        probes,
        quotes,
        on=["user_id"],
        left_ts=F.col("ts"),
        right_ts=F.col("cts"),
        right_cols=["click_id", "cts"],
    )
    attributed = F.col("cts").isNotNull() & (
        F.col("cts") >= F.col("ts") - F.expr("INTERVAL 7 DAYS")
    )
    return (
        j.select(
            F.when(attributed, F.date_format("cts", "yyyy-MM-dd"))
            .otherwise("none")
            .alias("click_day"),
            "cents",
        )
        .groupBy("click_day")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.sum("cents").alias("cents"),
        )
    )


@query(
    "events_scd2_point_in_time",
    tags=("events", "scd2", "temporal-join", "cdc"),
    oracle="""
WITH states AS (
  SELECT * FROM events WHERE event_type <> 'purchase'
), ordered AS (
  SELECT user_id, ts, event_id, event_type,
         LAG(event_type) OVER w AS prev_type
  FROM states
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), changes AS (
  SELECT user_id, ts, event_id, event_type
  FROM ordered
  WHERE prev_type IS NULL OR event_type <> prev_type
), scd2 AS (
  SELECT user_id, event_type AS state,
         epoch_us(ts) AS valid_from,
         epoch_us(LEAD(ts) OVER w2) AS valid_to
  FROM changes
  WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
), probes AS (
  SELECT user_id, epoch_us(ts) AS pts,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
)
SELECT s.state,
       CAST(COUNT(*) AS BIGINT) AS n_purchases,
       CAST(COUNT(DISTINCT p.user_id) AS BIGINT) AS n_users,
       CAST(SUM(p.cents) AS BIGINT) AS cents
FROM probes p
JOIN scd2 s
  ON p.user_id = s.user_id
 AND s.valid_from <= p.pts
 AND (s.valid_to IS NULL OR p.pts < s.valid_to)
GROUP BY 1 ORDER BY 1
""",
)
def events_scd2_point_in_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time (temporal) join against the SCD2 dimension: each
    purchase picks up the state whose validity interval
    [valid_from, valid_to) contains its instant — the canonical
    warehouse question ('what was the customer's state WHEN they
    bought') that naive latest-state joins answer wrongly. The
    dimension tracks the user's BROWSING state (the non-purchase event
    types), so a purchase attributes to the activity it interrupted —
    purchases before any browsing event simply have no interval and
    drop out, like any fact preceding its dimension's history. The
    dimension is user_state_scd2's lag/lead CDC compression inline;
    the join is an EQUI join on user_id with the interval predicate as
    a residual condition, so it plans as a keyed sort-merge join (one
    shuffle per side), never a nested loop — intervals per user are
    non-overlapping by construction, so each probe matches exactly one
    row and the join cannot explode. Ties-include on valid_from means
    a purchase that itself opens a state interval lands in that
    interval (matching SQL ASOF semantics). Census by state; exact
    int64 cents."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = (
        e.where(F.col("event_type") != "purchase")
        .withColumn("prev_type", F.lag("event_type").over(w))
        .where(
            F.col("prev_type").isNull()
            | (F.col("event_type") != F.col("prev_type"))
        )
        .select("user_id", "ts", "event_id", "event_type")
    )
    scd2 = changes.select(
        F.col("user_id").alias("s_user"),
        F.col("event_type").alias("state"),
        F.unix_micros("ts").alias("valid_from"),
        F.unix_micros(F.lead("ts").over(w)).alias("valid_to"),
    )
    probes = e.where(F.col("event_type") == "purchase").select(
        "user_id",
        F.unix_micros("ts").alias("pts"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    j = probes.join(
        scd2,
        (F.col("user_id") == F.col("s_user"))
        & (F.col("valid_from") <= F.col("pts"))
        & (F.col("valid_to").isNull() | (F.col("pts") < F.col("valid_to"))),
    )
    return (
        j.groupBy("state")
        .agg(
            F.count(F.lit(1)).alias("n_purchases"),
            F.count_distinct("user_id").alias("n_users"),
            F.sum("cents").alias("cents"),
        )
    )


@query(
    "events_ab_test_zscore",
    tags=("events", "stats", "experiment"),
    oracle="""
WITH u AS (
  SELECT user_id,
         CASE WHEN CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)),
                                      1, 1)) AS BIGINT) % 2 = 0
              THEN 'A' ELSE 'B' END AS variant,
         CASE WHEN COUNT(*) FILTER (event_type = 'purchase') >= 14
              THEN 1 ELSE 0 END AS converted
  FROM events GROUP BY 1
), s AS (
  SELECT
    CAST(COUNT(*) FILTER (variant = 'A') AS BIGINT) AS n_a,
    CAST(SUM(converted) FILTER (variant = 'A') AS BIGINT) AS c_a,
    CAST(COUNT(*) FILTER (variant = 'B') AS BIGINT) AS n_b,
    CAST(SUM(converted) FILTER (variant = 'B') AS BIGINT) AS c_b
  FROM u
)
SELECT n_a, c_a, n_b, c_b,
       CAST(ROUND(
         (CAST(c_a AS DOUBLE) / n_a - CAST(c_b AS DOUBLE) / n_b)
         / sqrt((CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                * (1 - CAST(c_a + c_b AS DOUBLE) / (n_a + n_b))
                * (1.0 / n_a + 1.0 / n_b)), 6) AS DOUBLE) AS z_score
FROM s
""",
)
def events_ab_test_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: hash-bucketed variant assignment (the
    content-addressed split every experimentation platform uses — a
    user keeps their variant on any cluster, any partition count, any
    re-run), per-user conversion (>= 14 purchase events — the
    threshold is LOAD-BEARING: "any purchase" converts 100% of this
    dataset and collapses the pooled variance to a DIVIDE_BY_ZERO
    under ANSI mode; 14 splits users both ways at every SF), and the
    pooled two-proportion z-statistic.

    Cross-engine determinism without a transcendental gap: the z-score
    is divisions, multiplications and ONE sqrt — all IEEE-754
    correctly-rounded operations (unlike ln/pow, sqrt is exact per the
    standard), so both engines produce the identical double and the
    statistic itself hash-verifies at round-6 (unit scale).

    Shape: one user-keyed aggregate (conversion flag collapses each
    user's events map-side), then a single global conditional
    aggregate — no join, no window; the variant split is a column
    expression, not a shuffle."""
    e = load_table(spark, sf_dir, "events")
    variant = F.when(
        md5_prefix_int(F.col("user_id").cast("string").cast("binary"), 1) % 2
        == 0,
        "A",
    ).otherwise("B")
    u = (
        e.groupBy("user_id")
        .agg(
            (
                F.sum(
                    F.when(F.col("event_type") == "purchase", 1).otherwise(0)
                )
                >= 14
            )
            .cast("int")
            .alias("converted")
        )
        .select("user_id", "converted", variant.alias("variant"))
    )
    a = F.col("variant") == "A"
    s = u.agg(
        F.sum(F.when(a, 1).otherwise(0)).cast("long").alias("n_a"),
        F.sum(F.when(a, F.col("converted")).otherwise(0)).cast("long").alias("c_a"),
        F.sum(F.when(~a, 1).otherwise(0)).cast("long").alias("n_b"),
        F.sum(F.when(~a, F.col("converted")).otherwise(0)).cast("long").alias("c_b"),
    )
    pool = (F.col("c_a") + F.col("c_b")).cast("double") / (
        F.col("n_a") + F.col("n_b")
    )
    z = (
        F.col("c_a").cast("double") / F.col("n_a")
        - F.col("c_b").cast("double") / F.col("n_b")
    ) / F.sqrt(
        pool
        * (F.lit(1.0) - pool)
        * (F.lit(1.0) / F.col("n_a") + F.lit(1.0) / F.col("n_b"))
    )
    return s.select(
        "n_a", "c_a", "n_b", "c_b", F.round(z, 6).alias("z_score")
    )


@query(
    "events_attribution_linear",
    tags=("events", "attribution", "range-join", "funnel"),
    oracle="""
WITH p AS (
  SELECT event_id, user_id, ts,
         CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
  FROM events WHERE event_type = 'purchase'
), c AS (
  SELECT user_id, ts AS cts, MAX(event_id) AS click_id
  FROM events WHERE event_type = 'click' GROUP BY 1, 2
), j AS (
  SELECT p.event_id, p.cents, c.cts, c.click_id
  FROM p LEFT JOIN c
    ON p.user_id = c.user_id
   AND c.cts <= p.ts AND c.cts > p.ts - INTERVAL 7 DAY
), k AS (
  SELECT event_id, cents, cts,
         COUNT(cts) OVER (PARTITION BY event_id) AS n,
         ROW_NUMBER() OVER (PARTITION BY event_id
                            ORDER BY cts DESC, click_id DESC) AS rn
  FROM j
)
SELECT CASE WHEN cts IS NULL THEN 'none'
            ELSE strftime(cts, '%Y-%m-%d') END AS click_day,
       CAST(SUM(CASE WHEN cts IS NULL THEN cents
                ELSE cents // n
                     + CASE WHEN rn = 1 THEN cents % n ELSE 0 END
                END) AS BIGINT) AS credited_cents,
       CAST(COUNT(*) AS BIGINT) AS n_credits
FROM k GROUP BY 1 ORDER BY 1
""",
)
def events_attribution_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear (equal-split) multi-touch attribution, the sibling of
    events_attribution_last_touch: every click in the 7-day lookback
    shares a purchase's revenue equally. Credit is allocated in EXACT
    integer cents — each touch gets cents div n and the most recent
    click absorbs the remainder (the installments-UDTF reconciliation
    trick), so the credited ledger sums to the purchase total to the
    cent, with no 1/n floating-point drift for the oracle to disagree
    about.

    Negative cents (refund purchases) are SAFE here: Spark's ``div``/
    ``%`` and DuckDB's ``//``/``%`` both truncate toward zero with
    remainder following the dividend (verified on every sign
    combination — tests/test_attribution.py pins it), so the per-
    bucket split stays engine-identical; either way div*n + rem ==
    cents, so totals could never drift.

    Shape: a keyed range join (user equi key + 7-day interval
    predicate — the row explosion is bounded by clicks-per-user-per-
    week, never |purchases| x |clicks|), then two windows partitioned
    by purchase id (partition size = that purchase's touch count).
    Purchases with no in-window click keep full credit in the 'none'
    bucket."""
    e = load_table(spark, sf_dir, "events")
    p = e.where(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        "ts",
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    c = (
        e.where(F.col("event_type") == "click")
        .groupBy(F.col("user_id").alias("c_user"), F.col("ts").alias("cts"))
        .agg(F.max("event_id").alias("click_id"))
    )
    j = p.join(
        c,
        (F.col("user_id") == F.col("c_user"))
        & (F.col("cts") <= F.col("ts"))
        & (F.col("cts") > F.col("ts") - F.expr("INTERVAL 7 DAYS")),
        "left",
    )
    w = Window.partitionBy("event_id")
    wr = Window.partitionBy("event_id").orderBy(
        F.desc("cts"), F.desc("click_id")
    )
    k = j.select(
        "event_id",
        "cents",
        "cts",
        F.count("cts").over(w).alias("n"),
        F.row_number().over(wr).alias("rn"),
    )
    credit = F.when(F.col("cts").isNull(), F.col("cents")).otherwise(
        F.expr("cents div n")
        + F.when(F.col("rn") == 1, F.expr("cents % n")).otherwise(F.lit(0))
    )
    return (
        k.select(
            F.when(F.col("cts").isNull(), "none")
            .otherwise(F.date_format("cts", "yyyy-MM-dd"))
            .alias("click_day"),
            credit.alias("credit"),
        )
        .groupBy("click_day")
        .agg(
            F.sum("credit").cast("bigint").alias("credited_cents"),
            F.count(F.lit(1)).alias("n_credits"),
        )
    )


@query(
    "events_kmv_weekly_merge",
    tags=("events", "sketch", "merge", "reaggregation", "approx"),
    oracle="""
WITH dh AS (
  SELECT DISTINCT CAST(ts AS DATE) AS day,
         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM events
), day_sketch AS (
  SELECT day, h,
         ROW_NUMBER() OVER (PARTITION BY day ORDER BY h) AS rn
  FROM dh
), stored AS (
  SELECT day, h FROM day_sketch WHERE rn <= 32
), merged AS (
  SELECT DISTINCT CAST(date_trunc('week', day) AS DATE) AS week, h
  FROM stored
), ranked AS (
  SELECT week, h, ROW_NUMBER() OVER (PARTITION BY week ORDER BY h) AS rn
  FROM merged
)
SELECT week,
       CAST(COUNT(*) AS BIGINT) AS n_in_sketch,
       CAST(MAX(CASE WHEN rn = 32 THEN h END) AS BIGINT) AS kth_hash,
       CAST(ROUND(CASE
         WHEN COUNT(*) < 32 THEN CAST(COUNT(*) AS DOUBLE)
         ELSE 31.0 * 1152921504606846976.0
              / CAST(MAX(CASE WHEN rn = 32 THEN h END) AS DOUBLE)
       END, 4) AS DOUBLE) AS est_users
FROM ranked WHERE rn <= 32 GROUP BY week ORDER BY week
""",
)
def events_kmv_weekly_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch RE-AGGREGATION — the one sketch move the registry's
    band didn't yet demonstrate: every other sketch query builds its
    sketch from raw data inside one plan, but the 100 TB pattern is to
    STORE per-partition sketches (here: per-day KMV user sketches,
    k=32 smallest md5-hashes — the stage this query's `stored` frame
    stands in for) and answer coarser-grain questions by MERGING
    sketches, never rescanning events. KMV merge = union the hash
    sets, re-take the k smallest: any hash among a week's k smallest
    is, within its own day, ranked at least as high, so it survived
    the day sketch — k-min(∪ day k-mins) = k-min(week's full set),
    which makes the merged weekly estimate IDENTICAL to a
    direct-from-raw weekly KMV (pinned by test_kmv_merge_equals_direct
    and, bit-for-bit, by the DuckDB oracle replaying both stages).

    Merge cost is k x 7 rows per week — independent of event volume.
    The k-min windows need NO salt stage: Spark's WindowGroupLimit
    rewrite (rank-limit pushdown; pinned structurally in
    tests/test_plan_hygiene.py) caps each window to its k smallest
    PER INPUT PARTITION before the exchange, so a day's final-rank
    task receives <= k x n_map_partitions rows, never the day's full
    distinct-hash set — the funnel the older salted two-pass idiom
    (approx_distinct_parts_kmv's original form) guarded against is
    already bounded by the engine, and the measured A/B says the salt
    is pure overhead now (PERF.md round 10, ~15-20% at sf1). Weeks
    under k distinct users fall back to the exact count (the sketch
    holds the whole set; NULL kth_hash in both engines — exercised at
    sf0.001 where every week is exact, while sf0.01+ exercises the
    estimator branch)."""
    k = 32
    m_double = float(1 << 60)
    e = load_table(spark, sf_dir, "events")
    dh = e.select(
        F.to_date("ts").alias("day"),
        md5_prefix_int(
            F.col("user_id").cast("string").cast("binary")
        ).alias("h"),
    ).distinct()
    w2 = Window.partitionBy("day").orderBy("h")
    stored = (
        dh.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") <= k)
        .select("day", "h")
    )
    merged = stored.select(
        F.date_trunc("week", "day").cast("date").alias("week"), "h"
    ).distinct()
    w3 = Window.partitionBy("week").orderBy("h")
    ranked = (
        merged.withColumn("rn", F.row_number().over(w3))
        .where(F.col("rn") <= k)
    )
    n = F.count(F.lit(1))
    kth = F.max(F.when(F.col("rn") == k, F.col("h")))
    est = F.when(n < k, n.cast("double")).otherwise(
        F.lit((k - 1) * m_double) / kth.cast("double")
    )
    return (
        ranked.groupBy("week")
        .agg(
            n.cast("long").alias("n_in_sketch"),
            kth.cast("long").alias("kth_hash"),
            F.round(est, 4).cast("double").alias("est_users"),
        )
    )


@query(
    "events_schema_evolution_union",
    tags=("ingest", "schema-evolution", "mergeSchema", "layout"),
    oracle="""
SELECT CAST(CASE WHEN EXTRACT(day FROM ts) <= 15 THEN 1 ELSE 2 END
            AS BIGINT) AS v,
       CAST(COUNT(*) AS BIGINT) AS n_events,
       CAST(SUM(CASE WHEN EXTRACT(day FROM ts) <= 15 THEN 1
                     WHEN event_type IS NULL THEN 1 ELSE 0 END)
            AS BIGINT) AS n_missing_type,
       CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
       CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents
FROM events GROUP BY 1 ORDER BY v
""",
)
def events_schema_evolution_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCHEMA EVOLUTION at read time — the mixed-generation reality of
    any long-lived ingest directory: files written before a producer
    upgrade lack columns the new files carry (here: the first half of
    the month predates event_type/props), and the reader must union
    both generations WITHOUT a migration rewrite. The query writes the
    two generations as they would have landed (v=1 four columns, v=2
    six), reads the directory once with ``mergeSchema=true`` — Spark
    unions the parquet footers into the superset schema, null-filling
    absent columns per file, and surfaces the generation as a
    discovered partition column — then aggregates per generation. The
    oracle replays the generation split on the ORIGINAL table, so a
    hash-match proves no rows, keys, or cents were lost or duplicated
    across the evolution boundary and that exactly the old-generation
    rows read back with a NULL event_type. At 100 TB this is the
    pattern that makes producer upgrades deployable without rewriting
    petabytes: evolve by adding nullable columns, let the footer
    union + partition discovery do the rest (reference parity: the
    header-synonym tolerance of the Excel ingest,
    python_version/build_warehouse.py:36-55, solves the same
    generations problem one file-format down)."""
    from financial_data_warehouse_automation_spark.queries._helpers import scratch_dir

    work = scratch_dir("schema_evo_demo_")
    e = load_table(spark, sf_dir, "events")
    old_gen = F.dayofmonth("ts") <= 15
    (
        e.where(old_gen)
        .select("event_id", "ts", "user_id", "value")
        .write.mode("overwrite")
        .parquet(os.path.join(work, "v=1"))
    )
    (
        e.where(~old_gen)
        .select("event_id", "ts", "user_id", "value", "event_type", "props")
        .write.mode("overwrite")
        .parquet(os.path.join(work, "v=2"))
    )
    merged = spark.read.option("mergeSchema", "true").parquet(work)
    return (
        merged.groupBy(F.col("v").cast("bigint").alias("v"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_events"),
            F.sum(F.when(F.col("event_type").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("n_missing_type"),
            F.countDistinct("user_id").cast("long").alias("n_users"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("cents"),
        )
    )


@query(
    "events_quantile_sketch_merge",
    tags=("events", "sketch", "quantile", "merge", "reaggregation"),
    oracle="""
WITH ev AS (
  SELECT CAST(ts AS DATE) AS day,
         CAST(concat('0x', substr(md5(CAST(event_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h,
         value
  FROM events
), day_rank AS (
  SELECT day, h, value,
         ROW_NUMBER() OVER (PARTITION BY day ORDER BY h, value) AS rn
  FROM ev
), stored AS (
  SELECT day, h, value FROM day_rank WHERE rn <= 64
), wk AS (
  SELECT CAST(date_trunc('week', day) AS DATE) AS week, h, value FROM stored
), week_rank AS (
  SELECT week, h, value,
         ROW_NUMBER() OVER (PARTITION BY week ORDER BY h, value) AS rn
  FROM wk
), samp AS (
  SELECT week, value,
         ROW_NUMBER() OVER (PARTITION BY week ORDER BY value, h) AS rv,
         COUNT(*) OVER (PARTITION BY week) AS n
  FROM week_rank WHERE rn <= 64
), est AS (
  SELECT week,
         CAST(MAX(n) AS BIGINT) AS n_sample,
         MAX(CASE WHEN rv = CAST(CEIL(0.5 * n) AS BIGINT) THEN value END)
           AS est_p50,
         MAX(CASE WHEN rv = CAST(CEIL(0.9 * n) AS BIGINT) THEN value END)
           AS est_p90
  FROM samp GROUP BY week
), raw AS (
  SELECT CAST(date_trunc('week', CAST(ts AS DATE)) AS DATE) AS week, value
  FROM events
), raw_rank AS (
  SELECT week, value,
         ROW_NUMBER() OVER (PARTITION BY week ORDER BY value) AS rv,
         COUNT(*) OVER (PARTITION BY week) AS n
  FROM raw
), exact AS (
  SELECT week,
         MAX(CASE WHEN rv = CAST(CEIL(0.5 * n) AS BIGINT) THEN value END)
           AS exact_p50,
         MAX(CASE WHEN rv = CAST(CEIL(0.9 * n) AS BIGINT) THEN value END)
           AS exact_p90
  FROM raw_rank GROUP BY week
)
SELECT e.week, e.n_sample, e.est_p50, e.est_p90, x.exact_p50, x.exact_p90
FROM est e JOIN exact x USING (week) ORDER BY week
""",
)
def events_quantile_sketch_merge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGEABLE QUANTILE SKETCH — closes the sketch family's last gap
    (cardinality: KMV; frequency: Count-Min; membership: Bloom;
    quantiles: this). The sketch is a bottom-k-by-hash uniform sample
    (k=64 rows with the smallest md5(event_id) per day, each carrying
    its ``value``) — the sampling formulation of a mergeable quantile
    summary: KLL/GK compact deterministically-weighted levels, but
    their compaction paths are engine-internal and unreplayable by an
    oracle, while bottom-k has the SAME merge algebra (k-min of a
    union of per-day k-mins == k-min of the week, the KMV argument
    applied to (h, value) rows — pinned bit-for-bit by
    test_quantile_sketch_merge_equals_direct) and a standard sample-
    quantile error bound O(1/sqrt(k)). Quantile selection is explicit
    rank arithmetic — value at row_number ceil(p*n) ordered by value
    — NOT percentile_disc, so both engines replay the identical
    selection with zero off-by-one ambiguity, and the emitted value
    is a raw untouched double (bit-identical across engines by
    construction).

    Why it matters at 100 TB: per-day sketches are k rows REGARDLESS
    of day volume; weekly/monthly/any-coarser quantiles come from
    merging stored sketches — k x 7 rows per week — never rescanning
    events, the same re-aggregation contract as
    events_kmv_weekly_merge. The exact_p50/exact_p90 twin columns
    (full-scan rank selection, the error-visibility companion the
    approx_distinct twin convention uses) exist so the oracle
    certifies BOTH paths and the sample error is observable in the
    output itself; a production rollup stores only the sketch
    columns. The k-min windows ride WindowGroupLimit (rank-limit
    pushdown caps each partition to k rows before the exchange — no
    salt needed, the r10-measured result)."""
    k = 64
    e = load_table(spark, sf_dir, "events").select(
        F.to_date("ts").alias("day"),
        md5_prefix_int(
            F.col("event_id").cast("string").cast("binary")
        ).alias("h"),
        "value",
    )
    w_day = Window.partitionBy("day").orderBy("h", "value")
    stored = (
        e.withColumn("rn", F.row_number().over(w_day))
        .where(F.col("rn") <= k)
        .select("day", "h", "value")
    )
    wk = stored.select(
        F.date_trunc("week", "day").cast("date").alias("week"), "h", "value"
    )
    w_week = Window.partitionBy("week").orderBy("h", "value")
    merged = (
        wk.withColumn("rn", F.row_number().over(w_week))
        .where(F.col("rn") <= k)
    )
    w_val = Window.partitionBy("week").orderBy("value", "h")
    w_all = Window.partitionBy("week")
    samp = merged.select(
        "week",
        "value",
        F.row_number().over(w_val).alias("rv"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    sel50 = F.col("rv") == F.ceil(F.col("n") * 0.5)
    sel90 = F.col("rv") == F.ceil(F.col("n") * 0.9)
    est = samp.groupBy("week").agg(
        F.max("n").cast("long").alias("n_sample"),
        F.max(F.when(sel50, F.col("value"))).alias("est_p50"),
        F.max(F.when(sel90, F.col("value"))).alias("est_p90"),
    )
    raw = load_table(spark, sf_dir, "events").select(
        F.date_trunc("week", F.to_date("ts")).cast("date").alias("week"),
        "value",
    )
    w_rval = Window.partitionBy("week").orderBy("value")
    raw_rank = raw.select(
        "week",
        "value",
        F.row_number().over(w_rval).alias("rv"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    exact = raw_rank.groupBy("week").agg(
        F.max(F.when(sel50, F.col("value"))).alias("exact_p50"),
        F.max(F.when(sel90, F.col("value"))).alias("exact_p90"),
    )
    return est.join(exact, "week")


@query(
    "events_kmv_set_ops",
    tags=("events", "sketch", "set-ops", "theta", "approx"),
    oracle="""
WITH uh AS (
  SELECT DISTINCT event_type AS cohort,
         CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM events WHERE event_type IN ('click', 'purchase')
), ranked AS (
  SELECT cohort, h,
         ROW_NUMBER() OVER (PARTITION BY cohort ORDER BY h) AS rn,
         COUNT(*) OVER (PARTITION BY cohort) AS n_cohort
  FROM uh
), kept AS (
  SELECT cohort, h, n_cohort FROM ranked WHERE rn <= 64
), thetas AS (
  SELECT cohort,
         CASE WHEN MAX(n_cohort) < 64
              THEN 1152921504606846976 ELSE MAX(h) END AS theta_x,
         CAST(COUNT(*) AS BIGINT) AS n_sketch,
         CASE WHEN MAX(n_cohort) < 64 THEN CAST(COUNT(*) AS DOUBLE)
              ELSE 63.0 * 1152921504606846976.0 / CAST(MAX(h) AS DOUBLE)
         END AS est_x
  FROM kept GROUP BY cohort
), theta AS (
  SELECT MIN(theta_x) AS t FROM thetas
), below AS (
  SELECT k.h,
         MAX(CASE WHEN k.cohort = 'click' THEN 1 ELSE 0 END) AS in_a,
         MAX(CASE WHEN k.cohort = 'purchase' THEN 1 ELSE 0 END) AS in_b
  FROM kept k, theta t WHERE k.h <= t.t GROUP BY k.h
), ops AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_union_kept,
         CAST(SUM(in_a * in_b) AS BIGINT) AS n_inter_kept
  FROM below
)
SELECT
  CAST((SELECT n_sketch FROM thetas WHERE cohort = 'click') AS BIGINT)
    AS n_a_sketch,
  CAST((SELECT n_sketch FROM thetas WHERE cohort = 'purchase') AS BIGINT)
    AS n_b_sketch,
  CAST((SELECT t FROM theta) AS BIGINT) AS theta,
  CAST(ROUND((SELECT est_x FROM thetas WHERE cohort = 'click'), 4)
       AS DOUBLE) AS est_a,
  CAST(ROUND((SELECT est_x FROM thetas WHERE cohort = 'purchase'), 4)
       AS DOUBLE) AS est_b,
  CAST(ROUND(o.n_union_kept * 1152921504606846976.0
             / CAST((SELECT t FROM theta) AS DOUBLE), 4) AS DOUBLE)
    AS est_union,
  CAST(ROUND(o.n_inter_kept * 1152921504606846976.0
             / CAST((SELECT t FROM theta) AS DOUBLE), 4) AS DOUBLE)
    AS est_inter,
  CAST(ROUND(CAST(o.n_inter_kept AS DOUBLE) / o.n_union_kept, 6)
       AS DOUBLE) AS est_jaccard
FROM ops o
""",
)
def events_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SKETCH SET ALGEBRA (Theta-sketch style) — the capability the
    KMV family gains on top of plain cardinality: estimate the UNION,
    INTERSECTION, and Jaccard of two cohorts from their k=64 KMV
    sketches alone, never materializing either user set. The rule is
    the standard Theta min-theta composition: each cohort's sketch
    retains its k smallest hashes with threshold theta_X = k-th
    smallest (or the full hash range when the cohort holds < k
    distinct users — the exact regime); set ops restrict BOTH
    retained sets to h <= theta = min(theta_A, theta_B), where each
    surviving hash represents theta-fraction sampling of the
    underlying set, so |kept| / (theta / M) estimates the true
    cardinality of the composed set (M = 2^60, the md5-prefix hash
    range; per-cohort estimates keep the unbiased KMV (k-1)M/h_k
    form). sf0.001 exercises the exact branch end to end (15 users
    per cohort < k: theta = M, every estimate IS the exact count);
    sf0.01+ exercises the estimator branch (150+ users). Accuracy vs
    the true overlap is property-tested in tests/test_round4_ops.py.

    Why it matters at 100 TB: cohort-overlap questions (audience
    intersection, retention across products, dedup across sources)
    otherwise need a distinct-pair shuffle over the raw data per
    question; stored per-cohort sketches answer every pairwise
    composition at k rows per cohort. Plan shape: one events scan →
    distinct (cohort, hash) → per-cohort k-min window
    (WindowGroupLimit-bounded, no salt) → all remaining algebra on
    <= 2k rows with one-row broadcast scalars — no second scan, no
    doc x doc anywhere. ``kept`` (<= 2k rows) is lineage-cut because
    downstream frames reuse it; without the cut each reuse re-scans
    and re-distincts events (measured: 5 FileScans -> 1). Both
    cohorts' thresholds/counts/estimates come from ONE grouping-free
    conditional aggregate over ``kept`` so every broadcast side is
    PROVABLY single-row (test_no_accidental_cartesian_anywhere's
    structural proof; a per-cohort groupBy+filter would be 1-row in
    fact but not in proof)."""
    from financial_data_warehouse_automation_spark.lineage import cut

    k = 64
    m_int = 1 << 60
    e = load_table(spark, sf_dir, "events")
    uh = (
        e.where(F.col("event_type").isin("click", "purchase"))
        .select(
            F.col("event_type").alias("cohort"),
            md5_prefix_int(
                F.col("user_id").cast("string").cast("binary")
            ).alias("h"),
        )
        .distinct()
    )
    w_rank = Window.partitionBy("cohort").orderBy("h")
    w_all = Window.partitionBy("cohort")
    kept = cut(
        uh.select(
            "cohort",
            "h",
            F.row_number().over(w_rank).alias("rn"),
            F.count(F.lit(1)).over(w_all).alias("n_cohort"),
        )
        .where(F.col("rn") <= k),
        eager=False,
    )
    isa = F.col("cohort") == "click"
    isb = F.col("cohort") == "purchase"

    def _cohort_scalars(side, tag):
        n_sketch = F.count(F.when(side, 1)).cast("long")
        n_cohort = F.max(F.when(side, F.col("n_cohort")))
        hk = F.max(F.when(side, F.col("h")))
        return [
            n_sketch.alias(f"n_{tag}_sketch"),
            F.when(n_cohort < k, F.lit(m_int))
            .otherwise(hk)
            .alias(f"theta_{tag}"),
            F.when(n_cohort < k, n_sketch.cast("double"))
            .otherwise(F.lit(float(k - 1) * float(m_int)) / hk.cast("double"))
            .alias(f"est_{tag}_raw"),
        ]

    sc = kept.agg(*_cohort_scalars(isa, "a"), *_cohort_scalars(isb, "b")).select(
        "*", F.least("theta_a", "theta_b").alias("t")
    )
    below = (
        kept.crossJoin(F.broadcast(sc.select("t")))
        .where(F.col("h") <= F.col("t"))
        .groupBy("h")
        .agg(
            F.max(isa.cast("int")).alias("in_a"),
            F.max(isb.cast("int")).alias("in_b"),
        )
    )
    ops = below.agg(
        F.count(F.lit(1)).cast("long").alias("n_union_kept"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("long").alias("n_inter_kept"),
    )
    scale = F.lit(float(m_int)) / F.col("t").cast("double")
    return (
        ops.crossJoin(F.broadcast(sc))
        .select(
            "n_a_sketch",
            "n_b_sketch",
            F.col("t").cast("long").alias("theta"),
            F.round(F.col("est_a_raw"), 4).cast("double").alias("est_a"),
            F.round(F.col("est_b_raw"), 4).cast("double").alias("est_b"),
            F.round(F.col("n_union_kept") * scale, 4)
            .cast("double")
            .alias("est_union"),
            F.round(F.col("n_inter_kept") * scale, 4)
            .cast("double")
            .alias("est_inter"),
            F.round(
                F.col("n_inter_kept").cast("double") / F.col("n_union_kept"),
                6,
            )
            .cast("double")
            .alias("est_jaccard"),
        )
    )
