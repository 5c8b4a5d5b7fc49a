"""Relational core: scans, filters, joins, aggregations, set ops, sorts.

Covers SURVEY.md §2.1 (scans), §2.2 (filters/predicates), §2.3 (join
matrix incl. the reference's disguised anti-join P6), §2.4 (aggregations)
and the §2.10 additions (rollup/cube, distinct counts, set ops, pivot,
top-k). All pure DataFrame API — Catalyst handles pushdown/pruning; small
dimensions are broadcast explicitly (the GS version's glMap probe,
Code.gs:147-166, *is* a broadcast hash join — SURVEY §2.3 J1).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from financial_data_warehouse_automation_spark.functions.scalars import md5_prefix_int
from financial_data_warehouse_automation_spark.lineage import cut
from financial_data_warehouse_automation_spark.queries._helpers import (
    _bucketed_dirs_via_one_write,
    assert_multiset_equal,
    davg,
    dsum,
    money,
    rate,
    sql_money,
    sql_rate,
)
from financial_data_warehouse_automation_spark.registry import query
from financial_data_warehouse_automation_spark.tables import load_table

M_PRICE = sql_money("l_extendedprice")
M_QTY = sql_money("l_quantity")
R_DISC = sql_rate("l_discount")
R_TAX = sql_rate("l_tax")


# ---------------------------------------------------------------------------
# Group-by aggregation over a filtered scan (TPC-H Q1 shape). The income
# statement's TOTAL REVENUES/TOTAL EXPENSES footer rows are exactly this
# operator (SURVEY §2.4: GROUP BY dept, category → SUM(amount)).
# ---------------------------------------------------------------------------
@query(
    "pricing_summary",
    headline=True,
    tags=("agg", "filter", "scan"),
    oracle=f"""
SELECT
  l_returnflag,
  l_linestatus,
  CAST(SUM({M_QTY}) AS DOUBLE) AS sum_qty,
  CAST(SUM({M_PRICE}) AS DOUBLE) AS sum_base_price,
  CAST(SUM({M_PRICE} * (CAST(1.0 AS DECIMAL(2,1)) - {R_DISC})) AS DOUBLE) AS sum_disc_price,
  CAST(ROUND(SUM(({M_PRICE} * (CAST(1.0 AS DECIMAL(2,1)) - {R_DISC})) * (CAST(1.0 AS DECIMAL(2,1)) + {R_TAX})), 2) AS DOUBLE) AS sum_charge,
  CAST(SUM({M_QTY}) AS DOUBLE) / COUNT(*) AS avg_qty,
  CAST(SUM({M_PRICE}) AS DOUBLE) / COUNT(*) AS avg_price,
  CAST(SUM({R_DISC}) AS DOUBLE) / COUNT(*) AS avg_disc,
  COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
""",
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered scan → hash aggregate; filter + projection push to
    parquet. ``spread_by`` fans the decimal partial-agg work out of the
    harness's single-row-group scan; plan no-op on a well-split table.
    The spread key is a column the query already reads (extendedprice —
    high-cardinality, skew-free) so column pruning is untouched: the
    plan-hygiene suite pins the 7-column ReadSchema."""
    l = load_table(spark, sf_dir, "lineitem", spread_by=("l_extendedprice",))
    one = F.lit("1.0").cast("decimal(2,1)")
    disc_price = money("l_extendedprice") * (one - rate("l_discount"))
    charge = disc_price * (one + rate("l_tax"))
    return (
        l.where(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum(money("l_quantity")).alias("sum_qty"),
            dsum(money("l_extendedprice")).alias("sum_base_price"),
            dsum(disc_price).alias("sum_disc_price"),
            # ROUND the scale-10 decimal sum to scale 2 before the double
            # cast: both engines round half-away-from-zero in ROUND, and a
            # scale-2 decimal converts to double exactly — the r1 1-ulp
            # divergence came from DuckDB's inexact scale-10→double path
            # (and a plain decimal downcast won't do: DuckDB truncates it).
            F.round(F.sum(charge), 2).cast("double").alias("sum_charge"),
            davg(money("l_quantity")).alias("avg_qty"),
            davg(money("l_extendedprice")).alias("avg_price"),
            davg(rate("l_discount")).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        # no final ORDER BY (r15): the driver gate hashes rows
        # order-insensitively, and the global sort was a range exchange
        # + sampling pass over the result (guide §2.4 — "an orderBy
        # used only to make output deterministic").
    )


# ---------------------------------------------------------------------------
# The flagship: "monthly department totals" — the query the reference
# warehouse exists to serve (SURVEY §7 minimum slice). mktsegment plays
# the department role, (year, month) the reporting period.
# ---------------------------------------------------------------------------
@query(
    "monthly_segment_totals",
    headline=True,
    tags=("join", "agg", "date"),
    oracle=f"""
SELECT
  EXTRACT(YEAR FROM o.o_orderdate) AS year,
  EXTRACT(MONTH FROM o.o_orderdate) AS month,
  c.c_mktsegment AS segment,
  CAST(SUM({sql_money('l.l_extendedprice')} * (CAST(1.0 AS DECIMAL(2,1)) - {sql_rate('l.l_discount')})) AS DOUBLE) AS revenue,
  COUNT(DISTINCT o.o_orderkey) AS n_orders
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
""",
)
def monthly_segment_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact × dim enrichment join + period aggregation (SURVEY §2.4 A2's
    read side; the reference's (Year, Month, Department) grain).

    Plan shape: lineitem pre-aggregates to order grain BEFORE joining
    (partial agg on the join key) — the join input shrinks ~4:1 and the
    COUNT(DISTINCT orderkey) over the fat join becomes a plain COUNT(*)
    at order grain. Equivalent results (orders partition cleanly into
    (year, month, segment) groups); ~20% faster at sf0.1 and the gap
    widens with scale. No broadcast hint on customer: multi-GB at
    100 TB; AQE picks broadcast at small SFs on its own (VERDICT r1 #6).
    ``spread_by`` on the join key: the order-grain pre-aggregate then
    runs partition-local on the harness's single-row-group file, and on
    a well-split table no exchange is added at all.
    """
    l = load_table(spark, sf_dir, "lineitem", spread_by=("l_orderkey",))
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    one = F.lit("1.0").cast("decimal(2,1)")
    revenue = money("l_extendedprice") * (one - rate("l_discount"))
    per_order = l.groupBy("l_orderkey").agg(F.sum(revenue).alias("order_rev"))
    return (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.year("o_orderdate").cast("long").alias("year"),
            F.month("o_orderdate").cast("long").alias("month"),
            F.col("c_mktsegment").alias("segment"),
        )
        .agg(
            F.sum("order_rev").cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        # no final ORDER BY (r15): order-insensitive gate; see
        # pricing_summary.
    )


# ---------------------------------------------------------------------------
# Multi-way star join through two broadcast dims (region ← nation ← customer).
# ---------------------------------------------------------------------------
@query(
    "region_revenue",
    headline=True,
    tags=("join", "broadcast", "agg"),
    oracle=f"""
SELECT
  r.r_name AS region,
  EXTRACT(YEAR FROM o.o_orderdate) AS year,
  CAST(SUM({sql_money('l.l_extendedprice')} * (CAST(1.0 AS DECIMAL(2,1)) - {sql_rate('l.l_discount')})) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def region_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """5-way star join; tiny dims broadcast so the only big-side shuffle
    is lineitem⋈orders (at 100 TB: bucket both on orderkey). Lineitem
    pre-aggregates to order grain before the join (same rationale as
    monthly_segment_totals, including its ``spread_by``)."""
    l = load_table(spark, sf_dir, "lineitem", spread_by=("l_orderkey",))
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    one = F.lit("1.0").cast("decimal(2,1)")
    revenue = money("l_extendedprice") * (one - rate("l_discount"))
    per_order = l.groupBy("l_orderkey").agg(F.sum(revenue).alias("order_rev"))
    return (
        per_order.join(o, per_order.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)  # AQE decides; not broadcastable at 100 TB
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(
            F.col("r_name").alias("region"),
            F.year("o_orderdate").cast("long").alias("year"),
        )
        .agg(F.sum("order_rev").cast("double").alias("revenue"))
        # no final ORDER BY (r15): order-insensitive gate; see
        # pricing_summary.
    )


# ---------------------------------------------------------------------------
# Join matrix: semi / anti / full outer. The anti-join is the reference's
# missing-GL QA semantic in disguise (SURVEY §2.3: P6 ≡ LEFT ANTI JOIN).
# ---------------------------------------------------------------------------
@query(
    "customers_with_big_orders_semi",
    tags=("join", "semi"),
    oracle="""
SELECT c.c_custkey AS custkey, c.c_name AS name
FROM customer c
WHERE EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 200000.0
)
ORDER BY custkey
""",
)
def customers_with_big_orders_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join — existence probe without row duplication."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 200000.0)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_semi")
        .select(F.col("c_custkey").alias("custkey"), F.col("c_name").alias("name"))
    )


@query(
    "customers_without_orders_anti",
    tags=("join", "anti", "qa"),
    oracle="""
SELECT c.c_custkey AS custkey, c.c_name AS name, c.c_mktsegment AS segment
FROM customer c
WHERE NOT EXISTS (
  SELECT 1 FROM orders o
  WHERE o.o_custkey = c.c_custkey AND EXTRACT(YEAR FROM o.o_orderdate) = 1995
)
ORDER BY custkey
""",
)
def customers_without_orders_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join — the missing-dim QA filter (reference
    build_warehouse.py:203 / Code.gs:296) generalized. Probes against
    the 1995 order subset so the expected result is non-empty (every
    customer has *some* order in this data — VERDICT r1 #5)."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(F.year("o_orderdate") == 1995)
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left_anti")
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("c_mktsegment").alias("segment"),
        )
    )


@query(
    "customer_order_full_outer",
    tags=("join", "outer"),
    oracle=f"""
WITH per_cust AS (
  SELECT o_custkey, COUNT(*) AS n_orders,
         CAST(SUM({sql_money('o_totalprice')}) AS DOUBLE) AS total_spend
  FROM orders GROUP BY o_custkey
)
SELECT
  COALESCE(c.c_custkey, p.o_custkey) AS custkey,
  c.c_name AS name,
  COALESCE(p.n_orders, 0) AS n_orders,
  COALESCE(p.total_spend, 0.0) AS total_spend
FROM customer c
FULL OUTER JOIN per_cust p ON c.c_custkey = p.o_custkey
ORDER BY custkey
""",
)
def customer_order_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of a dim against a pre-aggregated fact — catches
    both unmatched dim rows and orphan fact keys in one pass."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum(money("o_totalprice")).alias("total_spend"),
    )
    return (
        c.join(per_cust, c.c_custkey == per_cust.o_custkey, "full_outer")
        .select(
            F.coalesce(c.c_custkey, per_cust.o_custkey).alias("custkey"),
            F.col("c_name").alias("name"),
            F.coalesce("n_orders", F.lit(0)).alias("n_orders"),
            F.coalesce("total_spend", F.lit(0.0)).alias("total_spend"),
        )
    )


# ---------------------------------------------------------------------------
# Hierarchical subtotals — the balance sheet's TOTAL CASH / TOTAL CURRENT
# ASSETS / TOTAL ASSETS rows are a ROLLUP (SURVEY §2.4 commentary).
# ---------------------------------------------------------------------------
@query(
    "rollup_flag_status",
    tags=("agg", "rollup"),
    oracle=f"""
SELECT
  COALESCE(l_returnflag, 'ALL') AS returnflag,
  COALESCE(l_linestatus, 'ALL') AS linestatus,
  CAST(SUM({M_PRICE}) AS DOUBLE) AS total_price,
  COUNT(*) AS n_rows
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
ORDER BY returnflag, linestatus
""",
)
def rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP — grand total + per-flag subtotals + leaf groups, one shuffle."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.rollup("l_returnflag", "l_linestatus")
        .agg(dsum(money("l_extendedprice")).alias("total_price"),
             F.count(F.lit(1)).alias("n_rows"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("linestatus"),
            "total_price",
            "n_rows",
        )
    )


@query(
    "cube_brand_size",
    tags=("agg", "cube"),
    oracle=f"""
SELECT
  COALESCE(p_brand, 'ALL') AS brand,
  COALESCE(CAST(p_size % 5 AS VARCHAR), 'ALL') AS size_mod,
  CAST(SUM({sql_money('p_retailprice')}) AS DOUBLE) AS total_retail,
  COUNT(*) AS n_parts
FROM part
GROUP BY CUBE (p_brand, p_size % 5)
ORDER BY brand, size_mod
""",
)
def cube_brand_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE — all 2^k grouping-set combinations in one pass."""
    p = load_table(spark, sf_dir, "part").withColumn(
        "size_mod_raw", (F.col("p_size") % 5).cast("string")
    )
    return (
        p.cube("p_brand", "size_mod_raw")
        .agg(dsum(money("p_retailprice")).alias("total_retail"),
             F.count(F.lit(1)).alias("n_parts"))
        .select(
            F.coalesce("p_brand", F.lit("ALL")).alias("brand"),
            F.coalesce("size_mod_raw", F.lit("ALL")).alias("size_mod"),
            "total_retail",
            "n_parts",
        )
    )


# ---------------------------------------------------------------------------
# Distinct / approx-distinct (SURVEY §2.10).
# ---------------------------------------------------------------------------
@query(
    "distinct_counts_per_segment",
    tags=("agg", "distinct"),
    oracle="""
SELECT
  c_mktsegment AS segment,
  COUNT(DISTINCT c_nationkey) AS n_nations,
  COUNT(*) AS n_customers
FROM customer
GROUP BY c_mktsegment
ORDER BY segment
""",
)
def distinct_counts_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact COUNT(DISTINCT) — expands to a two-stage partial agg in Spark."""
    c = load_table(spark, sf_dir, "customer")
    return (
        c.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.countDistinct("c_nationkey").alias("n_nations"),
            F.count(F.lit(1)).alias("n_customers"),
        )
    )


@query("approx_distinct_parts", tags=("agg", "approx"))
def approx_distinct_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approx distinct — sketch-merge, no exact-distinct shuffle.
    No SQL oracle (engine-specific sketch); driver does a rows-only check.
    At 100 TB this replaces exact distinct wherever ±2% is tolerable."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.groupBy(F.col("l_returnflag").alias("returnflag"))
        .agg(
            F.approx_count_distinct("l_partkey", rsd=0.02).alias("approx_parts"),
            F.countDistinct("l_partkey").alias("exact_parts"),
        )
    )


@query(
    "approx_distinct_parts_kmv",
    tags=("agg", "approx", "sketch"),
    oracle="""
WITH dh AS (
  SELECT DISTINCT l_returnflag AS returnflag,
         CAST(concat('0x', substr(md5(CAST(l_partkey AS VARCHAR)), 1, 15))
              AS BIGINT) AS h
  FROM lineitem
), ranked AS (
  SELECT returnflag, h,
         ROW_NUMBER() OVER (PARTITION BY returnflag ORDER BY h) AS rn
  FROM dh
)
SELECT returnflag,
       CAST(COUNT(*) AS BIGINT) AS n_hashes,
       CAST(MAX(CASE WHEN rn = 256 THEN h END) AS BIGINT) AS kth_hash,
       CAST(ROUND(CASE
         WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE)
         ELSE 255.0 * 1152921504606846976.0
              / CAST(MAX(CASE WHEN rn = 256 THEN h END) AS DOUBLE)
       END, 4) AS DOUBLE) AS kmv_estimate
FROM ranked GROUP BY 1 ORDER BY 1
""",
)
def approx_distinct_parts_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-Minimum-Values cardinality sketch, made DETERMINISTIC: the
    exact-oracle twin of ``approx_distinct_parts`` (whose HLL++ sketch
    is engine-specific and can only be rows-only checked). KMV hashes
    each distinct key to uniform [0, 2^60) via md5 — identical in any
    engine — keeps the k=256 smallest hashes per group, and estimates
    distinct count as (k-1) * 2^60 / h_(k) (Bar-Yossef et al.'s KMV
    estimator, ~1/sqrt(k) ≈ 6% relative error). Every intermediate is
    a pure function of the data, so DuckDB replays the sketch
    bit-for-bit and the driver hash-checks the ESTIMATE itself.

    Scale shape: the k-smallest-per-group selection never funnels a
    group's full distinct-hash set through one task — Spark's
    WindowGroupLimit rewrite caps a row_number-limit window to its k
    smallest per input partition BEFORE the exchange (partial + final,
    pinned structurally in tests/test_plan_hygiene.py), so the final
    rank receives <= k x n_map_partitions rows per group. The r6
    version added a 64-way salted pre-pass for the same bound by hand;
    round 10's A/B measured it as pure overhead on top of
    WindowGroupLimit (1.33s vs 1.57s at sf1, identical values) and
    removed it. Groups under k distinct values fall back to the exact
    count (h_(k) undefined), emitting a NULL kth_hash in both engines.
    """
    k = 256
    m_double = float(1 << 60)  # hash domain: 15 hex digits = 60 bits
    l = load_table(spark, sf_dir, "lineitem")
    h = md5_prefix_int(F.col("l_partkey").cast("string").cast("binary"))
    dh = l.select(
        F.col("l_returnflag").alias("returnflag"), h.alias("h")
    ).distinct()
    # no salt stage: WindowGroupLimit (rank-limit pushdown, pinned in
    # test_plan_hygiene) caps the window to its k smallest per input
    # partition BEFORE the exchange, so a group's final-rank task sees
    # <= k * n_map_partitions rows — the engine already provides the
    # bound the r6-era salted two-pass added by hand, and the salt
    # measured as pure overhead once WindowGroupLimit existed
    # (PERF.md round 10: 1.33s vs 1.57s at sf1, identical values)
    w2 = Window.partitionBy("returnflag").orderBy("h")
    kth = (
        dh.withColumn("rn", F.row_number().over(w2))
        .where(F.col("rn") == k)
        .select("returnflag", F.col("h").alias("kth_hash"))
    )
    counts = dh.groupBy("returnflag").agg(F.count(F.lit(1)).alias("n_hashes"))
    return (
        counts.join(F.broadcast(kth), "returnflag", "left")
        .select(
            "returnflag",
            F.col("n_hashes").cast("long").alias("n_hashes"),
            F.col("kth_hash").cast("long").alias("kth_hash"),
            F.round(
                F.when(
                    F.col("n_hashes") < k, F.col("n_hashes").cast("double")
                ).otherwise(
                    F.lit((k - 1) * 1.0)
                    * F.lit(m_double)
                    / F.col("kth_hash").cast("double")
                ),
                4,
            ).alias("kmv_estimate"),
        )
    )


@query(
    "part_freq_count_min",
    tags=("agg", "approx", "sketch"),
    oracle="""
WITH g AS (SELECT unnest([0, 1, 2, 3]) AS j),
sketch AS (
  SELECT j, cell, CAST(COUNT(*) AS BIGINT) AS c FROM (
    SELECT g.j,
           CAST(concat('0x', substr(md5(CAST(l.l_partkey AS VARCHAR)),
                1 + 8 * g.j, 8)) AS BIGINT) % 1024 AS cell
    FROM lineitem l CROSS JOIN g
  ) GROUP BY 1, 2
), probes AS (
  SELECT l_partkey AS partkey, CAST(COUNT(*) AS BIGINT) AS true_cnt
  FROM lineitem WHERE l_partkey <= 25 GROUP BY 1
), pc AS (
  SELECT p.partkey, p.true_cnt, g.j,
         CAST(concat('0x', substr(md5(CAST(p.partkey AS VARCHAR)),
              1 + 8 * g.j, 8)) AS BIGINT) % 1024 AS cell
  FROM probes p CROSS JOIN g
)
SELECT pc.partkey,
       CAST(MAX(pc.true_cnt) AS BIGINT) AS true_cnt,
       CAST(MIN(s.c) AS BIGINT) AS cms_est
FROM pc JOIN sketch s ON s.j = pc.j AND s.cell = pc.cell
GROUP BY 1 ORDER BY 1
""",
)
def part_freq_count_min(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min frequency sketch (Cormode & Muthukrishnan), made
    deterministic with md5 row-hashes so DuckDB replays the counters
    bit-for-bit and the driver hash-checks the ESTIMATES. Depth 4 x
    width 1024: each item increments one cell per row-hash; a key's
    estimate is the MIN of its 4 cells — always >= the true count,
    within eps*N with high probability.

    Why a sketch at 100 TB: exact per-key counts shuffle every
    distinct key; the CMS aggregate map-side-combines to <= 4096
    counters PER TASK regardless of key cardinality, so the shuffle
    carries a fixed 4x1024 grid per partition and the reduce side is
    constant-size. The probe stage joins a fixed key set against the
    broadcast 4096-row sketch. The d row hashes are the four disjoint
    32-bit slices of ONE md5 digest per key (pairwise-independent
    within the family, the standard one-hash CMS economy) — round 7;
    the previous form hashed d separate 'j:key' strings, so the scan
    paid 4 md5s + 4 string concats per row where one suffices, and
    exploded BEFORE hashing so the generator quadrupled string rows
    rather than int pairs. sf1: 8.9s -> ~2s."""
    depth, width = 4, 1024
    l = load_table(spark, sf_dir, "lineitem")

    def cells(h) -> Column:
        # four disjoint 32-bit slices of ONE digest attribute — h must
        # already be a projected column, NOT the md5 expression: the
        # r7 comment claimed codegen CSE shares an inline md5 across
        # the array elements, but the Generate node does not CSE
        # (measured r16, interleaved noop A/B at sf0.1: sketch build
        # 2.07 -> 1.41 s min-of-4 with the digest projected first,
        # and the after-plan carries exactly one md5)
        return F.array(*[
            F.pmod(
                F.conv(F.substring(h, 1 + 8 * j, 8), 16, 10).cast("long"),
                F.lit(width),
            )
            for j in range(depth)
        ])

    def digest(key_col) -> Column:
        return F.md5(key_col.cast("string").cast("binary"))

    sketch = (
        l.select(digest(F.col("l_partkey")).alias("h"))
        .select(F.posexplode(cells(F.col("h"))).alias("j", "cell"))
        .groupBy("j", "cell")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    probes = (
        l.where(F.col("l_partkey") <= 25)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(F.count(F.lit(1)).alias("true_cnt"))
    )
    pc = probes.select(
        "partkey", "true_cnt", digest(F.col("partkey")).alias("h")
    ).select(
        "partkey",
        "true_cnt",
        F.posexplode(cells(F.col("h"))).alias("j", "cell"),
    )
    return (
        pc.join(F.broadcast(sketch), ["j", "cell"])
        .groupBy("partkey")
        .agg(
            F.max("true_cnt").cast("long").alias("true_cnt"),
            F.min("c").cast("long").alias("cms_est"),
        )
    )


@query(
    "doc_priority_sample",
    tags=("text", "sampling", "sketch", "llm-pipeline"),
    oracle=r"""
WITH w AS (
  SELECT doc_id,
         CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT)
           AS n_tokens,
         CAST(concat('0x', substr(md5(CAST(doc_id AS VARCHAR)), 1, 15))
              AS BIGINT) + 1 AS u
  FROM documents
)
SELECT doc_id, n_tokens, u
FROM w
ORDER BY CAST(n_tokens AS DOUBLE) / CAST(u AS DOUBLE) DESC, doc_id
LIMIT 32
""",
)
def doc_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield-Lund-Thorup): a weighted
    sample-without-replacement where item i gets priority w_i / u_i
    (u_i uniform) and the k highest priorities win — the
    token-weighted 'pick k representative documents' step of corpus
    curation, with unbiased subset-sum estimates by construction.

    Determinism across engines without transcendentals: u is an md5
    60-bit integer (a pure function of doc_id, so the sample is
    content-addressed and partition-invariant) and the priority is ONE
    double division — IEEE-correctly-rounded in every engine, unlike
    ln/pow whose libm rounding can differ — so the ordering is
    bit-identical and the output columns are exact integers. The plan
    is a TakeOrderedAndProject global top-k (per-partition heads, no
    global sort), the same shape as top10_orders_global."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    u = md5_prefix_int(F.col("doc_id").cast("string").cast("binary")) + 1
    w = d.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        u.alias("u"),
    )
    return w.orderBy(
        (F.col("n_tokens").cast("double") / F.col("u").cast("double")).desc(),
        "doc_id",
    ).limit(32)


@query(
    "orders_bloom_filter_probe",
    tags=("join", "approx", "sketch", "prefilter"),
    oracle="""
WITH b_keys AS (
  SELECT DISTINCT o_custkey AS k FROM orders
  WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
), p_keys AS (
  SELECT DISTINCT o_custkey AS k FROM orders
  WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
), g AS (SELECT unnest([0, 1, 2]) AS i),
bloom AS (
  SELECT pos // 32 AS w,
         bit_or(1::BIGINT << CAST(pos % 32 AS INTEGER)) AS bits
  FROM (
    SELECT CAST(concat('0x', substr(md5(CAST(g.i AS VARCHAR) || ':' ||
           CAST(b.k AS VARCHAR)), 1, 15)) AS BIGINT) % 16384 AS pos
    FROM b_keys b CROSS JOIN g
  ) GROUP BY 1
), pb AS (
  SELECT k, pos, pos // 32 AS w FROM (
    SELECT p.k,
           CAST(concat('0x', substr(md5(CAST(g.i AS VARCHAR) || ':' ||
           CAST(p.k AS VARCHAR)), 1, 15)) AS BIGINT) % 16384 AS pos
    FROM p_keys p CROSS JOIN g
  )
), chk AS (
  SELECT pb.k,
         BOOL_AND((COALESCE(bloom.bits, 0) &
                   (1::BIGINT << CAST(pb.pos % 32 AS INTEGER))) <> 0)
           AS bloom_positive
  FROM pb LEFT JOIN bloom ON bloom.w = pb.w GROUP BY 1
)
SELECT (b.k IS NOT NULL) AS exact_member, chk.bloom_positive,
       CAST(COUNT(*) AS BIGINT) AS n_keys
FROM chk LEFT JOIN b_keys b ON b.k = chk.k
GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def orders_bloom_filter_probe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pre-filter, deterministic: a 16384-bit /
    3-hash Bloom filter over 1995 buyers, probed with 1996 buyers, with
    the md5 bit positions replayed exactly in DuckDB so the driver
    hash-checks the sketch's membership decisions (including its false
    positives — output is the exact×bloom 2x2 census; the
    no-false-negative row (true, false) is structurally absent).

    This is THE structure that replaces a shuffle at 100 TB: the build
    side map-side-combines into a CONSTANT 512-word bit table (bit_or
    partial agg), which broadcasts for free, and the probe side then
    drops most non-members before any wide join — what Spark's runtime
    bloom filter (spark.sql.optimizer.runtime.bloomFilter.*) injects
    automatically for selective joins, built here explicitly so the
    mechanics (k positions, bit_or words, bool_and probe) are visible
    and verifiable."""
    m, k_hashes = 16384, 3
    o = load_table(spark, sf_dir, "orders")

    def pos(i_col, key_col):
        s = F.concat_ws(":", i_col.cast("string"), key_col.cast("string"))
        return F.pmod(md5_prefix_int(s.cast("binary")), F.lit(m))

    def year_keys(y):
        return (
            o.where(F.year("o_orderdate") == y)
            .select(F.col("o_custkey").alias("k"))
            .distinct()
        )

    hashes = F.explode(F.array(*[F.lit(i) for i in range(k_hashes)])).alias("i")
    b_keys, p_keys = year_keys(1995), year_keys(1996)
    bloom = (
        b_keys.select("k", hashes)
        .withColumn("pos", pos(F.col("i"), F.col("k")))
        .groupBy(F.expr("pos div 32").alias("w"))
        .agg(
            F.expr("bit_or(shiftleft(1L, cast(pos % 32 as int)))").alias("bits")
        )
    )
    pb = (
        p_keys.select("k", hashes)
        .withColumn("pos", pos(F.col("i"), F.col("k")))
        .withColumn("w", F.expr("pos div 32"))
    )
    chk = (
        pb.join(F.broadcast(bloom), "w", "left")
        .groupBy("k")
        .agg(
            F.expr(
                "bool_and((coalesce(bits, 0L) & "
                "shiftleft(1L, cast(pos % 32 as int))) != 0)"
            ).alias("bloom_positive")
        )
    )
    return (
        chk.join(
            b_keys.select(F.col("k").alias("bk")),
            chk["k"] == F.col("bk"),
            "left",
        )
        .groupBy(
            F.col("bk").isNotNull().alias("exact_member"), "bloom_positive"
        )
        .agg(F.count(F.lit(1)).alias("n_keys"))
    )


@query(
    "order_sampled_quantiles",
    tags=("agg", "approx", "sampling", "quantile"),
    oracle="""
WITH s AS (
  SELECT CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS price_cents,
         o_orderkey
  FROM orders
  WHERE CAST(concat('0x', substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 2))
             AS BIGINT) < 16
), ranked AS (
  SELECT price_cents,
         ROW_NUMBER() OVER (ORDER BY price_cents, o_orderkey) AS rnk
  FROM s
), tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_s FROM s),
ps AS (SELECT unnest([CAST(0.5 AS DOUBLE), CAST(0.95 AS DOUBLE),
                      CAST(0.99 AS DOUBLE)]) AS p)
SELECT ps.p,
       CAST(CEIL(ps.p * t.n_s) AS BIGINT) AS sample_rank,
       r.price_cents,
       t.n_s AS sample_n
FROM ps CROSS JOIN tot t
JOIN ranked r ON r.rnk = CAST(CEIL(ps.p * t.n_s) AS BIGINT)
ORDER BY ps.p
""",
)
def order_sampled_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass approximate quantiles via a deterministic 1/16 sample:
    the cheap sibling of the exact two-pass order_equidepth_bins, and
    the deterministic stand-in for percentile_approx (whose t-digest
    sketch is engine-specific and unverifiable). The sample is
    content-addressed (first md5 byte of the key < 16), so it is the
    SAME sample at any partition count and in any engine; nearest-rank
    quantiles of the sample are then exact picks replayed identically
    in DuckDB — the estimate itself hash-verifies. Sampling theory:
    nearest-rank of a uniform 1/16 sample is within O(1/sqrt(n/16))
    quantile distance of the true quantile.

    Scale shape: the filter prunes ~94% of rows at the scan, and the
    rank over the surviving sample uses the two-pass bucket-offset
    global_row_number — no single-task sort anywhere, unlike a naive
    global ROW_NUMBER (the plan a percentile query must not have)."""
    from financial_data_warehouse_automation_spark.operators.ranks import global_row_number

    o = load_table(spark, sf_dir, "orders")
    u = md5_prefix_int(F.col("o_orderkey").cast("string").cast("binary"), 2)
    s = o.where(u < 16).select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("price_cents"),
        "o_orderkey",
    )
    ranked = global_row_number(s, "price_cents", ("o_orderkey",), "rnk")
    tot = s.agg(F.count(F.lit(1)).cast("long").alias("n_s"))
    ps = spark.createDataFrame([(0.5,), (0.95,), (0.99,)], "p double")
    targets = ps.crossJoin(F.broadcast(tot)).select(
        "p",
        F.ceil(F.col("p") * F.col("n_s")).cast("long").alias("sample_rank"),
        "n_s",
    )
    return (
        ranked.select("price_cents", F.col("rnk").alias("sample_rank"))
        .join(F.broadcast(targets), "sample_rank")  # 3-row probe broadcast
        .select("p", "sample_rank", "price_cents", F.col("n_s").alias("sample_n"))
    )


# ---------------------------------------------------------------------------
# Set operations (SURVEY §2.8 target additions).
# ---------------------------------------------------------------------------
@query(
    "set_intersect_buyers",
    tags=("setop",),
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
INTERSECT
SELECT o_custkey AS custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
ORDER BY custkey
""",
)
def set_intersect_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct) of two filtered projections."""
    o = load_table(spark, sf_dir, "orders")
    y95 = o.where(F.year("o_orderdate") == 1995).select(F.col("o_custkey").alias("custkey"))
    y96 = o.where(F.year("o_orderdate") == 1996).select(F.col("o_custkey").alias("custkey"))
    return y95.intersect(y96)


@query(
    "set_except_churned",
    tags=("setop",),
    oracle="""
SELECT o_custkey AS custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1995
EXCEPT
SELECT o_custkey AS custkey FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1996
ORDER BY custkey
""",
)
def set_except_churned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct) — 1995 buyers who placed nothing in 1996."""
    o = load_table(spark, sf_dir, "orders")
    y95 = o.where(F.year("o_orderdate") == 1995).select(F.col("o_custkey").alias("custkey"))
    y96 = o.where(F.year("o_orderdate") == 1996).select(F.col("o_custkey").alias("custkey"))
    return y95.subtract(y96)


# ---------------------------------------------------------------------------
# Global sort + limit (SURVEY §2.7 O1/O3).
# ---------------------------------------------------------------------------
@query(
    "top10_orders_global",
    tags=("sort", "limit"),
    oracle="""
SELECT o_orderkey AS orderkey, o_custkey AS custkey, o_totalprice AS totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey
LIMIT 10
""",
)
def top10_orders_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: Spark plans TakeOrderedAndProject — per-partition
    heaps + driver merge, no full sort at any scale. Tie-break on key
    keeps it deterministic."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select(
            F.col("o_orderkey").alias("orderkey"),
            F.col("o_custkey").alias("custkey"),
            F.col("o_totalprice").alias("totalprice"),
        )
        .orderBy(F.desc("totalprice"), F.asc("orderkey"))
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Pivot (long → wide; the reference's month-name columns in reports).
# ---------------------------------------------------------------------------
@query(
    "pivot_returnflag_by_year",
    tags=("pivot", "agg"),
    oracle=f"""
SELECT
  EXTRACT(YEAR FROM o.o_orderdate) AS year,
  CAST(SUM(CASE WHEN l.l_returnflag = 'A' THEN {sql_money('l.l_extendedprice')} END) AS DOUBLE) AS flag_a,
  CAST(SUM(CASE WHEN l.l_returnflag = 'N' THEN {sql_money('l.l_extendedprice')} END) AS DOUBLE) AS flag_n,
  CAST(SUM(CASE WHEN l.l_returnflag = 'R' THEN {sql_money('l.l_extendedprice')} END) AS DOUBLE) AS flag_r
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1
ORDER BY year
""",
)
def pivot_returnflag_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot with an explicit value list (no extra distinct-values job)."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(F.year("o_orderdate").cast("long").alias("year"))
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(dsum(money("l_extendedprice")))
        .select(
            "year",
            F.col("A").alias("flag_a"),
            F.col("N").alias("flag_n"),
            F.col("R").alias("flag_r"),
        )
    )


# ---------------------------------------------------------------------------
# SQL API surface: the same engine through spark.sql over registered views
# (TPC-H Q3 shape). The reference has no query language; this engine gets
# one for free — worth one registered proof.
# ---------------------------------------------------------------------------
@query(
    "sql_shipping_priority",
    tags=("sql", "join", "agg", "topk"),
    oracle=f"""
SELECT l.l_orderkey AS orderkey,
       CAST(SUM({sql_money('l.l_extendedprice')} * (CAST(1.0 AS DECIMAL(2,1)) - {sql_rate('l.l_discount')})) AS DOUBLE) AS revenue,
       CAST(o.o_orderdate AS DATE) AS orderdate
FROM customer c
JOIN orders o ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
WHERE c.c_mktsegment = 'BUILDING'
  AND o.o_orderdate < TIMESTAMP '1998-03-15'
  AND l.l_shipdate > TIMESTAMP '1995-03-15'
GROUP BY l.l_orderkey, o.o_orderdate
ORDER BY revenue DESC, orderkey
LIMIT 10
""",
)
def sql_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front door: identical semantics expressed as a spark.sql
    string over temp views — proves the engine's second API surface
    compiles to the same Catalyst plans as the DataFrame queries."""
    from financial_data_warehouse_automation_spark.tables import register_views

    register_views(spark, sf_dir, names=("customer", "orders", "lineitem"))
    return spark.sql(f"""
        SELECT l.l_orderkey AS orderkey,
               CAST(SUM({sql_money('l.l_extendedprice')} * (CAST(1.0 AS DECIMAL(2,1)) - {sql_rate('l.l_discount')})) AS DOUBLE) AS revenue,
               CAST(o.o_orderdate AS DATE) AS orderdate
        FROM customer c
        JOIN orders o ON c.c_custkey = o.o_custkey
        JOIN lineitem l ON l.l_orderkey = o.o_orderkey
        WHERE c.c_mktsegment = 'BUILDING'
          AND o.o_orderdate < TIMESTAMP '1998-03-15'
          AND l.l_shipdate > TIMESTAMP '1995-03-15'
        GROUP BY l.l_orderkey, o.o_orderdate
        ORDER BY revenue DESC, orderkey
        LIMIT 10
    """)


@query(
    "grouping_sets_flag_year",
    tags=("agg", "grouping-sets", "sql"),
    oracle=f"""
SELECT
  COALESCE(l_returnflag, 'ALL') AS returnflag,
  COALESCE(CAST(EXTRACT(YEAR FROM l_shipdate) AS VARCHAR), 'ALL') AS shipyear,
  CAST(SUM({M_PRICE}) AS DOUBLE) AS total_price,
  COUNT(*) AS n_rows
FROM lineitem
GROUP BY GROUPING SETS ((l_returnflag), (EXTRACT(YEAR FROM l_shipdate)))
ORDER BY returnflag, shipyear
""",
)
def grouping_sets_flag_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS (neither pure rollup nor cube): per-flag
    totals and per-shipyear totals in one shuffle. (No final ORDER BY:
    the r16 registry-wide §2.4 sort sweep — the gate hashes
    order-insensitively, and this SQL string is not oracle-shared, so
    the trailing sort was purely presentational.)"""
    l = load_table(spark, sf_dir, "lineitem")
    l.createOrReplaceTempView("lineitem")
    return spark.sql(f"""
        SELECT
          COALESCE(l_returnflag, 'ALL') AS returnflag,
          COALESCE(CAST(YEAR(l_shipdate) AS STRING), 'ALL') AS shipyear,
          CAST(SUM({M_PRICE}) AS DOUBLE) AS total_price,
          COUNT(*) AS n_rows
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (YEAR(l_shipdate)))
    """)


@query(
    "set_except_all_lineitems",
    tags=("setop", "except-all"),
    oracle="""
SELECT l_partkey AS partkey FROM lineitem WHERE l_returnflag = 'A'
EXCEPT ALL
SELECT l_partkey AS partkey FROM lineitem WHERE l_returnflag = 'R'
ORDER BY partkey
""",
)
def set_except_all_lineitems(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag semantics, exceptAll) — each right occurrence
    cancels one left occurrence; the multiplicity-aware complement of
    set_except_churned's EXCEPT DISTINCT."""
    l = load_table(spark, sf_dir, "lineitem")
    a = l.where(F.col("l_returnflag") == "A").select(F.col("l_partkey").alias("partkey"))
    r = l.where(F.col("l_returnflag") == "R").select(F.col("l_partkey").alias("partkey"))
    return a.exceptAll(r)


@query(
    "minmax_by_order_per_segment",
    tags=("agg", "min_by", "max_by"),
    oracle="""
SELECT c.c_mktsegment AS segment,
       max_by(o.o_orderkey, CAST(o.o_totalprice AS DECIMAL(12,2)) * 10000000000 + o.o_orderkey) AS biggest_order,
       min_by(o.o_orderkey, CAST(o.o_totalprice AS DECIMAL(12,2)) * 10000000000 + o.o_orderkey) AS smallest_order,
       MAX(o.o_totalprice) AS max_price,
       MIN(o.o_totalprice) AS min_price
FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1 ORDER BY segment
""",
)
def minmax_by_order_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """max_by/min_by (argmax/argmin aggregates). The ordering key is an
    exact decimal composite (price scaled + orderkey) so price ties
    break deterministically and identically in both engines (DuckDB's
    max_by takes scalar orderings only)."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    key = money("o_totalprice") * F.lit(10000000000) + F.col("o_orderkey")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.max_by("o_orderkey", key).alias("biggest_order"),
            F.min_by("o_orderkey", key).alias("smallest_order"),
            F.max("o_totalprice").alias("max_price"),
            F.min("o_totalprice").alias("min_price"),
        )
    )


@query(
    "price_percentiles_per_status",
    tags=("agg", "percentile"),
    oracle="""
SELECT o_orderstatus AS status,
       quantile_cont(o_totalprice, 0.25) AS p25,
       quantile_cont(o_totalprice, 0.5) AS p50,
       quantile_cont(o_totalprice, 0.9) AS p90,
       COUNT(*) AS n
FROM orders GROUP BY 1 ORDER BY status
""",
)
def price_percentiles_per_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles: Spark's percentile() and DuckDB's
    quantile_cont use the same sorted-linear-interpolation rule, so the
    doubles agree bit-for-bit (verified at sf0.01)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy(F.col("o_orderstatus").alias("status"))
        .agg(
            F.expr("percentile(o_totalprice, 0.25)").alias("p25"),
            F.expr("percentile(o_totalprice, 0.5)").alias("p50"),
            F.expr("percentile(o_totalprice, 0.9)").alias("p90"),
            F.count(F.lit(1)).alias("n"),
        )
    )


@query(
    "part_name_similarity",
    tags=("string", "levenshtein", "topk"),
    oracle="""
WITH p AS (SELECT p_partkey, p_name FROM part WHERE p_partkey < 200)
SELECT a.p_partkey AS key_a, b.p_partkey AS key_b,
       levenshtein(a.p_name, b.p_name) AS dist
FROM p a JOIN p b ON a.p_partkey < b.p_partkey
WHERE levenshtein(a.p_name, b.p_name) <= 2
ORDER BY key_a, key_b
""",
)
def part_name_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance string matching (dirty-dimension reconciliation —
    the fuzzy cousin of the header-synonym resolution), subset-bounded
    like every all-pairs anchor."""
    p = load_table(spark, sf_dir, "part").where(F.col("p_partkey") < 200)
    a = p.select(F.col("p_partkey").alias("key_a"), F.col("p_name").alias("name_a"))
    b = p.select(F.col("p_partkey").alias("key_b"), F.col("p_name").alias("name_b"))
    return (
        a.join(b, F.col("key_a") < F.col("key_b"))
        .select(
            "key_a", "key_b",
            F.levenshtein("name_a", "name_b").alias("dist"),
        )
        .where(F.col("dist") <= 2)
    )


_LATERAL_SQL = """
SELECT c.c_custkey AS custkey, t.o_orderkey AS orderkey, t.o_totalprice AS totalprice
FROM customer c,
LATERAL (SELECT o_orderkey, o_totalprice FROM orders o
         WHERE o.o_custkey = c.c_custkey
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
WHERE c.c_custkey % 100 = 0
ORDER BY custkey, totalprice DESC, orderkey
"""


@query(
    "lateral_top2_orders",
    tags=("sql", "lateral", "topk"),
    oracle=_LATERAL_SQL,
)
def lateral_top2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL subquery with per-row LIMIT — the other
    formulation of per-group top-k (Catalyst rewrites it to a
    DomainJoin + window; identical SQL runs on both engines)."""
    from financial_data_warehouse_automation_spark.tables import register_views

    register_views(spark, sf_dir, names=("customer", "orders"))
    return spark.sql(_LATERAL_SQL)


@query(
    "null_safe_join_semantics",
    tags=("join", "null-safe"),
    oracle="""
WITH keyed AS (
  SELECT o_orderkey,
         CASE WHEN o_orderpriority = '1-URGENT' THEN NULL
              ELSE o_orderpriority END AS prio_key
  FROM orders
), dim(prio_key, label) AS (
  VALUES ('2-HIGH', 'high'), ('3-MEDIUM', 'medium'), (NULL, 'unprioritized')
)
SELECT COALESCE(d.label, 'other') AS label, COUNT(*) AS n
FROM keyed k LEFT JOIN dim d ON k.prio_key IS NOT DISTINCT FROM d.prio_key
GROUP BY 1 ORDER BY label
""",
)
def null_safe_join_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (<=> / IS NOT DISTINCT FROM): NULL keys
    match each other — the semantics a plain equi-join silently drops
    (and the reference's blank-GL rows would hit)."""
    o = load_table(spark, sf_dir, "orders")
    keyed = o.select(
        "o_orderkey",
        F.when(F.col("o_orderpriority") == "1-URGENT", F.lit(None))
        .otherwise(F.col("o_orderpriority"))
        .alias("prio_key"),
    )
    dim = spark.createDataFrame(
        [("2-HIGH", "high"), ("3-MEDIUM", "medium"), (None, "unprioritized")],
        "prio_key string, label string",
    )
    return (
        keyed.join(F.broadcast(dim), keyed.prio_key.eqNullSafe(dim.prio_key), "left")
        .groupBy(F.coalesce("label", F.lit("other")).alias("label"))
        .agg(F.count(F.lit(1)).alias("n"))
    )


@query(
    "set_intersect_all_parts",
    tags=("setop", "intersect-all"),
    oracle="""
SELECT l_partkey AS partkey FROM lineitem WHERE l_returnflag = 'A'
INTERSECT ALL
SELECT l_partkey AS partkey FROM lineitem WHERE l_returnflag = 'R'
ORDER BY partkey
""",
)
def set_intersect_all_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag semantics): each partkey appears
    min(count_A, count_R) times — completes the set-op matrix."""
    l = load_table(spark, sf_dir, "lineitem")
    a = l.where(F.col("l_returnflag") == "A").select(F.col("l_partkey").alias("partkey"))
    r = l.where(F.col("l_returnflag") == "R").select(F.col("l_partkey").alias("partkey"))
    return a.intersectAll(r)


@query(
    "profile_customer_table",
    tags=("profile", "quality", "agg"),
    oracle="""
SELECT 'c_custkey' AS col_name, COUNT(*) - COUNT(c_custkey) AS n_nulls,
       COUNT(DISTINCT c_custkey) AS n_distinct,
       MIN(CAST(c_custkey AS VARCHAR)) AS min_str, MAX(CAST(c_custkey AS VARCHAR)) AS max_str
FROM customer
UNION ALL
SELECT 'c_mktsegment', COUNT(*) - COUNT(c_mktsegment), COUNT(DISTINCT c_mktsegment),
       MIN(CAST(c_mktsegment AS VARCHAR)), MAX(CAST(c_mktsegment AS VARCHAR))
FROM customer
UNION ALL
SELECT 'c_nationkey', COUNT(*) - COUNT(c_nationkey), COUNT(DISTINCT c_nationkey),
       MIN(CAST(c_nationkey AS VARCHAR)), MAX(CAST(c_nationkey AS VARCHAR))
FROM customer
ORDER BY col_name
""",
)
def profile_customer_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-style profile (operators/profile.py): per-column null /
    distinct / min / max in ONE aggregation pass (the oracle unions
    three passes — same answer, our plan reads the table once)."""
    from financial_data_warehouse_automation_spark.operators.profile import profile_table

    c = load_table(spark, sf_dir, "customer")
    return (
        profile_table(c, ["c_custkey", "c_mktsegment", "c_nationkey"])
        .withColumnRenamed("column", "col_name")
    )


@query(
    "conditional_agg_filter",
    tags=("agg", "conditional"),
    oracle=f"""
SELECT c_mktsegment AS segment,
       COUNT(*) AS n_orders,
       COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
       COUNT(*) FILTER (WHERE o_totalprice > 150000) AS n_big,
       CAST(COALESCE(SUM({sql_money('o_totalprice')})
              FILTER (WHERE o_orderpriority = '1-URGENT'), 0) AS DOUBLE)
         AS urgent_total
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY 1
ORDER BY segment
""",
)
def conditional_agg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation — SQL FILTER-clause semantics via
    count_if / sum(when): several differently-predicated aggregates in
    ONE pass over the joined input (vs one scan per predicate). The
    map-side partial agg means the join output never materializes."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.count_if(F.col("o_orderstatus") == "F").alias("n_finished"),
            F.count_if(F.col("o_totalprice") > 150000).alias("n_big"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("o_orderpriority") == "1-URGENT",
                        money("o_totalprice"),
                    )
                ),
                F.lit(0).cast("decimal(12,2)"),
            ).cast("double").alias("urgent_total"),
        )
    )


@query(
    "unpivot_revenue_by_flag",
    tags=("unpivot", "reshape"),
    oracle=f"""
WITH wide_axis AS (
  SELECT DISTINCT EXTRACT(YEAR FROM l_shipdate) AS year FROM lineitem
), flags AS (
  SELECT unnest(['A', 'N', 'R']) AS returnflag
), agg AS (
  SELECT EXTRACT(YEAR FROM l_shipdate) AS year, l_returnflag AS returnflag,
         CAST(SUM({sql_money('l_extendedprice')}) AS DOUBLE) AS revenue
  FROM lineitem GROUP BY 1, 2
)
SELECT w.year AS year, f.returnflag AS returnflag, a.revenue AS revenue
FROM wide_axis w CROSS JOIN flags f
LEFT JOIN agg a ON a.year = w.year AND a.returnflag = f.returnflag
ORDER BY w.year, f.returnflag
""",
)
def unpivot_revenue_by_flag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot → unpivot round trip (wide↔long reshape): revenue per year
    pivoted to one column per returnflag, then melted back with
    DataFrame.unpivot. Absent (year, flag) cells survive as NULL rows —
    the oracle reproduces that with an explicit axis cross join."""
    li = load_table(spark, sf_dir, "lineitem")
    wide = (
        li.groupBy(F.year("l_shipdate").cast("long").alias("year"))
        .pivot("l_returnflag", ["A", "N", "R"])
        .agg(F.sum(money("l_extendedprice")).cast("double"))
    )
    return (
        wide.unpivot(["year"], ["A", "N", "R"], "returnflag", "revenue")
    )


@query(
    "segment_revenue_correlation",
    tags=("agg", "statistics", "trend"),
    oracle=f"""
WITH monthly AS (
  SELECT EXTRACT(YEAR FROM o_orderdate) AS year,
         EXTRACT(MONTH FROM o_orderdate) AS month,
         CAST(SUM({sql_money('o_totalprice')})
              FILTER (WHERE c_mktsegment = 'BUILDING') AS DOUBLE) AS x,
         CAST(SUM({sql_money('o_totalprice')})
              FILTER (WHERE c_mktsegment = 'MACHINERY') AS DOUBLE) AS y
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY 1, 2
), paired AS (
  SELECT CAST(round(x / 1000.0) AS BIGINT) AS xk,
         CAST(round(y / 1000.0) AS BIGINT) AS yk
  FROM monthly WHERE x IS NOT NULL AND y IS NOT NULL
), s AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(xk) AS BIGINT) AS sx, CAST(SUM(yk) AS BIGINT) AS sy,
         CAST(SUM(xk * yk) AS BIGINT) AS sxy,
         CAST(SUM(xk * xk) AS BIGINT) AS sxx,
         CAST(SUM(yk * yk) AS BIGINT) AS syy
  FROM paired
)
SELECT n AS n_months,
       CAST(sx AS DOUBLE) / n AS mean_building_k,
       CAST(sy AS DOUBLE) / n AS mean_machinery_k,
       (n * CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
         / (sqrt(n * CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
            * sqrt(n * CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE)))
         AS corr_xy
FROM s
""",
)
def segment_revenue_correlation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation between two segments' monthly revenue series
    — the 'do these departments trend together' question the reference
    warehouse exists for. Built-in F.corr sums doubles in shuffle order
    (non-deterministic at the ulp level), so instead: exact decimal
    monthly sums → k$-rounded integer series → integer moments (Σx, Σy,
    Σxy, Σx², Σy² — one pass, order-free) → closed form in double.
    Bit-identical across engines and cluster layouts. (The k$ unit
    keeps Σx² inside int64 at bench scale; scale the unit with SF.)"""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    seg_sum = lambda seg: F.sum(  # noqa: E731
        F.when(F.col("c_mktsegment") == seg, money("o_totalprice"))
    ).cast("double")
    monthly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.year("o_orderdate").alias("year"),
            F.month("o_orderdate").alias("month"),
        )
        .agg(seg_sum("BUILDING").alias("x"), seg_sum("MACHINERY").alias("y"))
        .where(F.col("x").isNotNull() & F.col("y").isNotNull())
        .select(
            F.round(F.col("x") / 1000.0).cast("long").alias("xk"),
            F.round(F.col("y") / 1000.0).cast("long").alias("yk"),
        )
    )
    xk, yk = F.col("xk"), F.col("yk")
    s = monthly.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(xk).alias("sx"),
        F.sum(yk).alias("sy"),
        F.sum(xk * yk).alias("sxy"),
        F.sum(xk * xk).alias("sxx"),
        F.sum(yk * yk).alias("syy"),
    )
    n = F.col("n")
    sx, sy = F.col("sx").cast("double"), F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    sxx, syy = F.col("sxx").cast("double"), F.col("syy").cast("double")
    return s.select(
        n.alias("n_months"),
        (sx / n).alias("mean_building_k"),
        (sy / n).alias("mean_machinery_k"),
        (
            (n * sxy - sx * sy)
            / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
        ).alias("corr_xy"),
    )


# ---------------------------------------------------------------------------
# Hot-key resilience: the salted-join operator registered as a query, so
# the driver gate pins "salted execution ≡ plain join" every round.
# ---------------------------------------------------------------------------
@query(
    "skew_salted_segment_revenue",
    tags=("join", "skew", "agg"),
    oracle=f"""
SELECT c.c_mktsegment AS segment,
       CAST(SUM({sql_money('o.o_totalprice')}) AS DOUBLE) AS revenue,
       COUNT(*) AS n_orders
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
GROUP BY 1
ORDER BY 1
""",
)
def skew_salted_segment_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per segment through operators.skew.salted_join.

    Semantically identical to a plain orders⋈customer equi-join — the
    oracle IS the plain join — but executed with the fact side sprayed
    across 8 sub-keys and the dim side replicated 8×, the manual
    fallback for a hot key one task can't hold (beyond AQE's
    shuffle-partition splitting; see operators/skew.py). Salt derives
    from o_orderkey, so the spray is deterministic and uniform even
    when o_custkey is pathologically skewed.
    """
    from financial_data_warehouse_automation_spark.operators.skew import salted_join

    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").withColumnRenamed(
        "c_custkey", "o_custkey"
    )
    joined = salted_join(
        o, c, on=["o_custkey"], n_salts=8,
        salt_source=F.xxhash64("o_orderkey"),
    )
    return (
        joined.groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.sum(money("o_totalprice")).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


# ---------------------------------------------------------------------------
# Distribution analysis: fixed-width histogram via identical floor-
# division bucketing in both engines (width_bucket boundary semantics
# differ across engines; the explicit formula doesn't).
# ---------------------------------------------------------------------------
@query(
    "order_value_histogram",
    tags=("agg", "histogram", "stats"),
    oracle=f"""
SELECT LEAST(CAST(FLOOR(o_totalprice / 50000.0) AS BIGINT), 11) AS bucket,
       COUNT(*) AS n_orders,
       CAST(SUM({sql_money('o_totalprice')}) AS DOUBLE) AS total_value
FROM orders
GROUP BY 1
ORDER BY 1
""",
)
def order_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """12-bucket $50k-wide histogram of order values (top bucket open).
    One hash aggregate on a computed key — the bucket expression is the
    same double division + floor in both engines, so bucket membership
    is bit-identical. The shape every data-profiling pass runs first."""
    o = load_table(spark, sf_dir, "orders")
    bucket = F.least(
        F.floor(F.col("o_totalprice") / 50000.0).cast("long"), F.lit(11)
    )
    return (
        o.groupBy(bucket.alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(money("o_totalprice")).cast("double").alias("total_value"),
        )
    )


# ---------------------------------------------------------------------------
# Ordered string aggregation (group-concat): deterministic only with an
# explicit element order — gated so the discipline can't regress.
# ---------------------------------------------------------------------------
@query(
    "top_customers_concat_per_nation",
    tags=("agg", "string-agg", "topk"),
    oracle="""
WITH ranked AS (
  SELECT n.n_name AS nation, c.c_name AS name, c.c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY n.n_name
                            ORDER BY c.c_acctbal DESC, c.c_custkey) AS rn
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
)
SELECT nation,
       COUNT(*) AS n_top,
       string_agg(name, ',' ORDER BY rn) AS top3_names
FROM ranked WHERE rn <= 3
GROUP BY nation
ORDER BY nation
""",
)
def top_customers_concat_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group-concat of each nation's top-3 customers by balance.
    collect_list order is shuffle-dependent, so the elements carry
    their rank and are array_sort-ed before joining — the only
    formulation whose string is reproducible across runs and cluster
    sizes (the same discipline as DuckDB's string_agg ... ORDER BY).
    WindowGroupLimit pushes the rn<=3 cut below the shuffle."""
    from pyspark.sql import Window

    c = load_table(spark, sf_dir, "customer")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    w = Window.partitionBy("n_name").orderBy(
        F.desc("c_acctbal"), F.asc("c_custkey")
    )
    ranked = (
        c.join(n, c.c_nationkey == n.n_nationkey)
        .withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 3)
    )
    return (
        ranked.groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.count(F.lit(1)).alias("n_top"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("rn", "c_name"))),
                    lambda s: s["c_name"],
                ),
                ",",
            ).alias("top3_names"),
        )
    )


# ---------------------------------------------------------------------------
# Reconciliation audit: header total vs line-derived total — the
# data-quality report every warehouse load runs across source systems.
# ---------------------------------------------------------------------------
@query(
    "order_total_reconciliation",
    tags=("audit", "join", "agg", "quality"),
    oracle=f"""
WITH l AS (
  SELECT l_orderkey,
         SUM({sql_money('l_extendedprice')}
             * (CAST(1.0 AS DECIMAL(2,1)) - {sql_rate('l_discount')})
             * (CAST(1.0 AS DECIMAL(2,1)) + {sql_rate('l_tax')})) AS line_total
  FROM lineitem GROUP BY 1
), joined AS (
  SELECT CAST(o.o_totalprice AS DECIMAL(12,2)) AS header_total,
         l.line_total,
         CASE
           WHEN l.line_total IS NULL THEN 'missing_lines'
           WHEN CAST(l.line_total AS DOUBLE) / CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) AS DOUBLE) < 0.5 THEN 'ratio_below_50pct'
           WHEN CAST(l.line_total AS DOUBLE) / CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) AS DOUBLE) < 0.9 THEN 'ratio_50_90pct'
           WHEN CAST(l.line_total AS DOUBLE) / CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) AS DOUBLE) <= 1.1 THEN 'ratio_90_110pct'
           WHEN CAST(l.line_total AS DOUBLE) / CAST(CAST(o.o_totalprice AS DECIMAL(12,2)) AS DOUBLE) <= 2.0 THEN 'ratio_110_200pct'
           ELSE 'ratio_over_200pct'
         END AS band
  FROM orders o LEFT JOIN l ON o.o_orderkey = l.l_orderkey
)
SELECT band,
       COUNT(*) AS n_orders,
       CAST(SUM(header_total) AS DOUBLE) AS header_sum,
       CAST(ROUND(SUM(line_total), 2) AS DOUBLE) AS line_sum
FROM joined GROUP BY 1 ORDER BY 1
""",
)
def order_total_reconciliation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-system reconciliation: the order header's total against the
    total derived from its lines (price × (1−disc) × (1+tax)), banded
    by ratio — the audit every multi-source warehouse load runs before
    trusting a feed (this synthetic data reconciles for NO order, and
    257 orders at sf0.01 have no lines at all — both facts the report
    must surface, not hide). Exact decimal sums on both sides; the band
    decision divides the same exact values in double, so banding is
    bit-identical cross-engine. Scale: one orderkey-grain aggregate +
    one key-partitioned left join."""
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    one = F.lit("1.0").cast("decimal(2,1)")
    line_total = F.sum(
        money("l_extendedprice") * (one - rate("l_discount"))
        * (one + rate("l_tax"))
    ).alias("line_total")
    per_order = l.groupBy("l_orderkey").agg(line_total)
    header = money("o_totalprice")
    joined = o.join(per_order, o.o_orderkey == per_order.l_orderkey, "left")
    ratio = F.col("line_total").cast("double") / header.cast("double")
    band = (
        # band labels name the ratio range they cover (round-3 ADVICE:
        # 'under_10pct' actually covered [0.5, 0.9) — misleading)
        F.when(F.col("line_total").isNull(), "missing_lines")
        .when(ratio < 0.5, "ratio_below_50pct")
        .when(ratio < 0.9, "ratio_50_90pct")
        .when(ratio <= 1.1, "ratio_90_110pct")
        .when(ratio <= 2.0, "ratio_110_200pct")
        .otherwise("ratio_over_200pct")
    )
    return (
        joined.select(
            band.alias("band"),
            header.alias("header_total"),
            F.col("line_total"),
        )
        .groupBy("band")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("header_total").cast("double").alias("header_sum"),
            # ROUND before the double cast: DuckDB's scale-10
            # decimal->double conversion is not correctly rounded
            # (same 1-ulp path as pricing_summary.sum_charge, r1 #4).
            F.round(F.sum("line_total"), 2).cast("double").alias("line_sum"),
        )
    )


@query(
    "order_price_percentiles",
    tags=("agg", "percentile", "window"),
    oracle=f"""
WITH priced AS (
  SELECT o_orderpriority,
         {sql_money('o_totalprice')} AS price,
         o_orderkey
  FROM orders
), ranked AS (
  SELECT o_orderpriority, price,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY price, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
  FROM priced
)
SELECT o_orderpriority,
       CAST(MAX(n) AS BIGINT) AS n_orders,
       CAST(MAX(CASE WHEN rn = (n + 1) // 2 THEN price END) AS DOUBLE) AS p50,
       CAST(MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN price END) AS DOUBLE) AS p90,
       CAST(MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN price END) AS DOUBLE) AS p99
FROM ranked GROUP BY o_orderpriority ORDER BY o_orderpriority
""",
)
def order_price_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact nearest-rank percentiles (p50/p90/p99 of order value per
    priority) via rank selection, NOT interpolating percentile
    functions: k = ceil(q*n) computed in integer arithmetic, the value
    at rank k picked by a conditional aggregate. Interpolating
    quantiles (percentile_cont) mix doubles with engine-specific
    formulas — nearest-rank is the distribution statistic that
    hash-matches across engines bit-for-bit. Shape: one window pass
    partitioned by the group key + one group aggregate, no joins; at
    scale the window shuffle is the only exchange. The approximate
    sibling for 100 TB dashboards is percentile_approx (t-digest,
    mergeable sketch) — same plan shape, bounded error."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    priced = o.select(
        "o_orderpriority", money("o_totalprice").alias("price"), "o_orderkey"
    )
    w = Window.partitionBy("o_orderpriority").orderBy("price", "o_orderkey")
    wn = Window.partitionBy("o_orderpriority")
    ranked = priced.select(
        "o_orderpriority",
        "price",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )

    n = F.col("n")

    def at_rank(k) -> F.Column:
        # k = ceil(q*n) in exact integer arithmetic: (num*n + den-1) div den
        return F.max(F.when(F.col("rn") == k, F.col("price"))).cast("double")

    return (
        ranked.groupBy("o_orderpriority")
        .agg(
            F.max("n").cast("long").alias("n_orders"),
            at_rank(F.floor((n + 1) / 2)).alias("p50"),
            at_rank(F.floor((9 * n + 9) / 10)).alias("p90"),
            at_rank(F.floor((99 * n + 99) / 100)).alias("p99"),
        )
    )


@query(
    "part_basket_affinity",
    tags=("join", "agg", "market-basket", "topk"),
    oracle="""
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), pairs AS (
  SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, COUNT(*) AS n_ab
  FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey
                     AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2
), singles AS (
  SELECT l_partkey, COUNT(*) AS n FROM op GROUP BY 1
), total AS (
  SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM op
)
SELECT p.part_a, p.part_b,
       CAST(p.n_ab AS BIGINT) AS n_ab,
       ROUND(CAST(p.n_ab AS DOUBLE) * t.n_orders
             / (sa.n * sb.n), 6) AS lift
FROM pairs p
JOIN singles sa ON p.part_a = sa.l_partkey
JOIN singles sb ON p.part_b = sb.l_partkey
CROSS JOIN total t
WHERE p.n_ab >= 2
ORDER BY lift DESC, p.part_a, p.part_b
LIMIT 50
""",
)
def part_basket_affinity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association: part pairs that co-occur in orders
    far above chance (lift = P(ab) / P(a)P(b)), min support 2, top 50.
    Pair generation explodes within the per-order BASKET, so fan-out
    is bounded by basket size (~N_lines per order choose 2), never
    parts x parts — the same bounded-bucket argument as the LSH pair
    expansion, scale-safe at 100 TB. Lineitem is scanned ONCE: the
    basket relation (one collect_set row per order) feeds pairs,
    part marginals, and the order total, and is localCheckpoint'ed
    because Spark re-evaluates shared subplans — the previous
    self-join form planned 5 lineitem scans + 4 distinct shuffles
    with zero exchange reuse (sf1 7.0s -> ~2s). The single-row order
    total broadcasts. Lift multiplies exact longs before one double
    division + round-6, so ranking ties are bit-stable; the top-50
    cut rides (lift desc, part_a, part_b) and plans as
    TakeOrderedAndProject."""
    l = load_table(spark, sf_dir, "lineitem")
    baskets = (
        l.groupBy("l_orderkey")
        .agg(F.collect_set("l_partkey").alias("parts"))
    )
    baskets = cut(baskets, eager=True)
    pairs = (
        baskets.select(F.explode("parts").alias("part_a"), "parts")
        .select("part_a", F.explode("parts").alias("part_b"))
        .where(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count(F.lit(1)).alias("n_ab"))
        .where(F.col("n_ab") >= 2)
    )
    singles = (
        baskets.select(F.explode("parts").alias("s_key"))
        .groupBy("s_key")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    total = baskets.agg(F.count(F.lit(1)).alias("n_orders"))
    sa = singles.select(F.col("s_key").alias("a_key"), F.col("n").alias("n_a"))
    sb = singles.select(F.col("s_key").alias("b_key"), F.col("n").alias("n_b"))
    return (
        pairs.join(sa, pairs.part_a == F.col("a_key"))
        .join(sb, pairs.part_b == F.col("b_key"))
        .crossJoin(F.broadcast(total))
        .select(
            "part_a", "part_b", "n_ab",
            F.round(
                F.col("n_ab").cast("double") * F.col("n_orders")
                / (F.col("n_a") * F.col("n_b")),
                6,
            ).alias("lift"),
        )
        .orderBy(F.desc("lift"), "part_a", "part_b")
        .limit(50)
    )


# Benford first-digit expectation, log10(1 + 1/d) rounded to 6 — shared
# literals so Spark and the oracle test against identical constants.
_BENFORD = [0.30103, 0.176091, 0.124939, 0.09691, 0.079181,
            0.066947, 0.057992, 0.051153, 0.045757]


@query(
    "orders_benford_audit",
    tags=("agg", "audit", "qa"),
    oracle=f"""
WITH digits AS (
  SELECT CAST(substr(CAST(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                     AS VARCHAR), 1, 1) AS BIGINT) AS digit
  FROM orders WHERE o_totalprice >= 0.01
), expected AS (
  SELECT digit, CAST(exp_share AS DOUBLE) AS exp_share FROM (VALUES
    {', '.join(f'({d + 1}, {p})' for d, p in enumerate(_BENFORD))}
  ) AS t(digit, exp_share)
), counts AS (
  SELECT digit, COUNT(*) AS n FROM digits GROUP BY 1
), tot AS (SELECT SUM(n) AS total FROM counts)
SELECT e.digit, CAST(COALESCE(c.n, 0) AS BIGINT) AS n,
       e.exp_share,
       ROUND(CAST(COALESCE(c.n, 0) AS DOUBLE) / t.total, 6) AS obs_share,
       ROUND(POWER(CAST(COALESCE(c.n, 0) AS DOUBLE) / t.total - e.exp_share, 2)
             / e.exp_share, 6) AS chi2_term
FROM expected e LEFT JOIN counts c ON e.digit = c.digit
CROSS JOIN tot t
ORDER BY e.digit
""",
)
def orders_benford_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit of order totals — the classic
    financial-forensics QA check (the reference's QA sheet tracks
    mapping gaps; a warehouse also wants distribution-level fraud
    signals). The leading digit comes from the DECIMAL STRING of exact
    integer cents — never floor(log10(x)), whose float landing near a
    power of ten can disagree between libms. Chi-square terms divide
    exact counts in double against shared round-6 Benford literals.
    Shape: scan -> 9-row aggregate; the expected table is a 9-row
    broadcast spine (LEFT join so missing digits surface as 0)."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") >= 0.01)
    digit = F.substring(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").cast("string"), 1, 1
    ).cast("long")
    counts = o.select(digit.alias("digit")).groupBy("digit").agg(
        F.count(F.lit(1)).alias("n")
    )
    expected = spark.createDataFrame(
        [(d + 1, p) for d, p in enumerate(_BENFORD)], "digit long, exp_share double"
    )
    tot = counts.agg(F.sum("n").alias("total"))
    return (
        expected
        .join(counts, "digit", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "digit",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            "exp_share",
            F.round(F.coalesce("n", F.lit(0)).cast("double") / F.col("total"), 6)
            .alias("obs_share"),
            F.round(
                F.pow(
                    F.coalesce("n", F.lit(0)).cast("double") / F.col("total")
                    - F.col("exp_share"),
                    2,
                )
                / F.col("exp_share"),
                6,
            ).alias("chi2_term"),
        )
    )


@query(
    "part_abc_pareto",
    tags=("window", "agg", "pareto", "two-pass"),
    oracle="""
WITH per_part AS (
  SELECT l_partkey,
         SUM(CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)) AS cents
  FROM lineitem GROUP BY 1
), tot AS (SELECT SUM(cents) AS total FROM per_part),
ranked AS (
  SELECT l_partkey, cents,
         SUM(cents) OVER (ORDER BY cents DESC, l_partkey) AS cum_cents
  FROM per_part
)
SELECT CASE WHEN CAST(r.cum_cents AS DOUBLE) / t.total <= 0.8 THEN 'A'
            WHEN CAST(r.cum_cents AS DOUBLE) / t.total <= 0.95 THEN 'B'
            ELSE 'C' END AS abc_class,
       CAST(COUNT(*) AS BIGINT) AS n_parts,
       CAST(SUM(r.cents) AS BIGINT) AS class_cents,
       ROUND(CAST(SUM(r.cents) AS DOUBLE) / MAX(t.total), 6) AS revenue_share
FROM ranked r CROSS JOIN tot t
GROUP BY 1 ORDER BY 1
""",
)
def part_abc_pareto(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ABC/Pareto inventory classification: parts ranked by revenue,
    class A = the head covering 80% of cumulative revenue, B to 95%,
    C the tail. The global running sum is computed with the TWO-PASS
    pattern, not a single-partition window: pass 1 buckets parts by
    revenue magnitude (32 integer bands over [0, max]) and computes
    per-bucket totals — a ~32-row broadcast of cumulative offsets;
    pass 2 runs the running sum WITHIN each bucket (window partitioned
    by bucket) and adds the offset of all higher buckets. An
    unpartitioned `SUM OVER (ORDER BY ...)` funnels 100 TB through one
    task; this plan's widest window partition is one bucket. Exact
    integer cents end-to-end; the 0.8/0.95 cuts divide exact int64
    sums in double, identical in both engines."""
    from pyspark.sql import Window

    l = load_table(spark, sf_dir, "lineitem")
    per_part = l.groupBy("l_partkey").agg(
        F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")).alias(
            "cents"
        )
    )
    # per_part feeds bounds, bucketing, and the totals; Spark
    # re-evaluates shared subplans, so the uncut form scanned lineitem
    # 5x (scan census, round 7). Part-grain, bounded — cut it.
    per_part = cut(per_part, eager=False)
    # pass 1: magnitude buckets (descending revenue order == ascending
    # bucket index); bounds from one tiny aggregate
    bounds = per_part.agg(F.max("cents").alias("max_c"))
    bucketed = per_part.crossJoin(F.broadcast(bounds)).select(
        "l_partkey",
        "cents",
        # bucket 0 holds the largest revenues; int arithmetic only
        (31 - F.floor(F.col("cents") * 32 / (F.col("max_c") + 1)))
        .cast("int")
        .alias("bkt"),
    )
    per_bucket = bucketed.groupBy(F.col("bkt").alias("b_idx")).agg(
        F.sum("cents").alias("b_cents")
    )
    # cumulative offset of all strictly-higher buckets: tiny frame, the
    # window here is over <=32 rows, then broadcast back
    wb = Window.orderBy("b_idx").rowsBetween(Window.unboundedPreceding, -1)
    offsets = per_bucket.select(
        "b_idx", F.coalesce(F.sum("b_cents").over(wb), F.lit(0)).alias("offset")
    )
    tot = per_part.agg(F.sum("cents").alias("total"))
    # pass 2: running sum within bucket + offset
    ww = Window.partitionBy("bkt").orderBy(F.desc("cents"), "l_partkey")
    ranked = (
        bucketed.join(F.broadcast(offsets), F.col("bkt") == F.col("b_idx"))
        .select(
            "l_partkey",
            "cents",
            "bkt",
            (F.sum("cents").over(ww) + F.col("offset")).alias("cum_cents"),
        )
    )
    share = F.col("cum_cents").cast("double") / F.col("total")
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            F.when(share <= 0.8, "A").when(share <= 0.95, "B").otherwise("C")
            .alias("abc_class"),
            "cents",
            "total",
        )
        .groupBy("abc_class")
        .agg(
            F.count(F.lit(1)).alias("n_parts"),
            F.sum("cents").alias("class_cents"),
            F.round(
                F.sum("cents").cast("double") / F.max("total"), 6
            ).alias("revenue_share"),
        )
    )


@query(
    "supplier_concentration_hhi",
    tags=("agg", "stats", "audit"),
    oracle="""
WITH ps AS (
  SELECT p.p_type, l.l_suppkey,
         SUM(CAST(ROUND(l.l_extendedprice * 100, 0) AS BIGINT)) AS cents
  FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
  GROUP BY 1, 2
), tot AS (
  SELECT p_type, SUM(cents) AS t_cents, COUNT(*) AS n_suppliers
  FROM ps GROUP BY 1
)
SELECT ps.p_type,
       CAST(MAX(tot.n_suppliers) AS BIGINT) AS n_suppliers,
       ROUND(CAST(SUM(CAST(ROUND(POWER(CAST(ps.cents AS DOUBLE)
                                    / tot.t_cents, 2), 9) AS DECIMAL(18,9)))
             AS DOUBLE), 6) AS hhi
FROM ps JOIN tot ON ps.p_type = tot.p_type
GROUP BY 1 ORDER BY 1
""",
)
def supplier_concentration_hhi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Herfindahl-Hirschman supplier-concentration index per part type —
    the procurement-risk audit (HHI -> 1 means one supplier owns the
    category; 1/n means perfect competition). Shares divide exact
    integer cents in double and each squared share rounds into the sum
    only at the end (round-6 on the final sum, one double reduction of
    <=100 supplier terms per type — order within a type could matter for
    doubles, so terms are summed as round-9 decimals first). Shape: one
    fact scan, (type, supplier) aggregate, type marginals re-reduced
    from it, broadcast join back."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    ps = (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("p_type", "l_suppkey")
        .agg(
            F.sum(F.round(F.col("l_extendedprice") * 100, 0).cast("bigint")).alias(
                "cents"
            )
        )
    )
    tot = ps.groupBy(F.col("p_type").alias("t_type")).agg(
        F.sum("cents").alias("t_cents"),
        F.count(F.lit(1)).alias("n_suppliers"),
    )
    share2 = F.pow(F.col("cents").cast("double") / F.col("t_cents"), 2)
    term = F.round(share2, 9).cast("decimal(18,9)")
    return (
        ps.join(F.broadcast(tot), ps.p_type == F.col("t_type"))
        .groupBy("p_type")
        .agg(
            F.max("n_suppliers").cast("long").alias("n_suppliers"),
            F.round(F.sum(term).cast("double"), 6).alias("hhi"),
        )
    )


@query(
    "segment_revenue_trend",
    tags=("agg", "regression", "window", "stats"),
    oracle="""
WITH monthly AS (
  SELECT c.c_mktsegment AS segment,
         (EXTRACT(YEAR FROM o.o_orderdate) - 1995) * 12
           + EXTRACT(MONTH FROM o.o_orderdate) AS x,
         SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) AS y
  FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
  GROUP BY 1, 2
), sums AS (
  SELECT segment, COUNT(*) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * y) AS DOUBLE) AS sxy,
         CAST(SUM(x * x) AS DOUBLE) AS sxx
  FROM monthly GROUP BY 1
)
SELECT segment,
       CAST(n AS BIGINT) AS n_months,
       ROUND((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS slope_cents,
       ROUND((sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n, 6)
         AS intercept_cents
FROM sums ORDER BY segment
""",
)
def segment_revenue_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-segment OLS revenue trend line: slope of monthly revenue
    (cents) on month index — the 'is this segment growing' statistic,
    computed as closed-form normal equations over EXACT integer
    moments: x is an integer month index, y integer cents, so Sx, Sy,
    Sxy, Sxx are int64-exact regardless of shuffle order (and below
    2^53 each, so the final double conversions are value-preserving at
    these scales; at 1000x the data move the moments to decimal).
    Same pattern as doc_zipf_fit but grouped: one (segment, month)
    aggregate, one per-segment reduce — both map-side combined; no
    window, no join wider than orders x customer."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    monthly = (
        o.join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("c_mktsegment").alias("segment"),
            (
                (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate")
            ).cast("long").alias("x"),
        )
        .agg(
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias(
                "y"
            )
        )
    )
    sums = monthly.groupBy("segment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    return sums.select(
        "segment",
        F.col("n").cast("long").alias("n_months"),
        F.round(slope, 6).alias("slope_cents"),
        F.round(
            (F.col("sy") - slope * F.col("sx")) / F.col("n"), 6
        ).alias("intercept_cents"),
    )


@query(
    "source_linegen_agg",
    tags=("source", "datasource-api", "agg"),
    oracle="""
WITH gen AS (
  SELECT i,
         md5(CAST(i AS VARCHAR)) AS key,
         (i % 997) / CAST(100 AS DOUBLE) AS amount
  FROM generate_series(0, 19999) t(i)
)
SELECT substr(key, 1, 1) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(amount * 100, 0) AS BIGINT)) AS BIGINT) AS cents,
       CAST(MIN(i) AS BIGINT) AS min_i,
       CAST(MAX(i) AS BIGINT) AS max_i
FROM gen GROUP BY 1 ORDER BY 1
""",
)
def source_linegen_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over the custom Python DataSource (sources/linegen.py,
    Spark 4 ``pyspark.sql.datasource`` API): 20k generated ledger lines
    in 8 planned partitions, grouped by the md5-key's first nibble. The
    source is deterministic by construction, so DuckDB replays it with
    generate_series + md5 and the hash certifies the ENTIRE custom
    connector path — option parsing, partition planning, per-partition
    iterators on executors — not just the aggregate. (sf_dir is unused:
    the relation is synthesized, which is the point.)"""
    from financial_data_warehouse_automation_spark.sources.linegen import LineGenDataSource

    # runtime conf, not just session-factory default: the driver's gate
    # may hand us ITS OWN SparkSession, and a reader that implements
    # pushFilters() hard-errors when the flag is off
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:  # idempotent under repeated registration in one session
        spark.dataSource.register(LineGenDataSource)
    except Exception:
        pass
    gen = (
        spark.read.format("linegen")
        .option("rows", 20000)
        .option("numpartitions", 8)
        .load()
    )
    return (
        gen.groupBy(F.substring("key", 1, 1).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("amount") * 100, 0).cast("bigint")).alias(
                "cents"
            ),
            F.min("i").alias("min_i"),
            F.max("i").alias("max_i"),
        )
    )


@query(
    "source_linegen_stream_agg",
    tags=("source", "datasource-api", "streaming"),
    oracle="""
WITH gen AS (
  SELECT i,
         md5(CAST(i AS VARCHAR)) AS key,
         (i % 997) / CAST(100 AS DOUBLE) AS amount
  FROM generate_series(0, 19999) t(i)
)
SELECT substr(key, 1, 1) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(amount * 100, 0) AS BIGINT)) AS BIGINT) AS cents,
       CAST(MIN(i) AS BIGINT) AS min_i,
       CAST(MAX(i) AS BIGINT) AS max_i
FROM gen GROUP BY 1 ORDER BY 1
""",
)
def source_linegen_stream_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The custom connector's STREAMING path (SimpleDataSourceStreamReader
    in sources/linegen.py): the same 20k-row relation arrives as 4k-row
    micro-batches with checkpointed {'i': n} offsets, drains into a
    memory sink, and must aggregate to the identical oracle as the
    batch read (source_linegen_agg) — one generator, two access paths,
    one hash. Exactly-once here means the drained union of micro-batch
    appends is exactly [0, 20000): a duplicated or dropped batch shifts
    every bucket count. (sf_dir unused: the relation is synthesized.)"""
    from financial_data_warehouse_automation_spark.sources.linegen import LineGenDataSource

    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:
        spark.dataSource.register(LineGenDataSource)
    except Exception:
        pass
    for q in spark.streams.active:
        if q.name == "linegen_drain":
            q.stop()
            q.awaitTermination()
    stream = (
        spark.readStream.format("linegen")
        .option("batchrows", 4000)
        .option("maxrows", 20000)
        .load()
    )
    handle = (
        stream.writeStream.format("memory")
        .queryName("linegen_drain")
        .outputMode("append")
        .start()
    )
    try:
        # r16: processAllAvailable replaces the 0.25s count-polling
        # loop — every poll was a full Spark job over the growing
        # memory sink (up to ~10 per drain). The source is BOUNDED
        # (maxrows caps latestOffset at 20000), so the engine-side
        # wait returns exactly when the sink holds the full relation;
        # the exactly-once row-count gate below still runs once.
        handle.processAllAvailable()
    finally:
        handle.stop()
        handle.awaitTermination()
    drained = spark.table("linegen_drain").count()
    if drained != 20000:
        raise RuntimeError(
            f"linegen stream drained {drained}/20000 rows — refusing to "
            "return a partial aggregate (it would surface as a confusing "
            "oracle hash mismatch)"
        )
    return (
        spark.table("linegen_drain")
        .groupBy(F.substring("key", 1, 1).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("amount") * 100, 0).cast("bigint")).alias(
                "cents"
            ),
            F.min("i").alias("min_i"),
            F.max("i").alias("max_i"),
        )
    )


@query(
    "orders_installments_udtf",
    tags=("udtf", "explode", "finance"),
    oracle="""
SELECT o.o_orderkey AS orderkey,
       CAST(k AS BIGINT) AS installment_no,
       CAST(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) // 3
            + CASE WHEN k = 1
                   THEN CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) % 3
                   ELSE 0 END AS BIGINT) AS installment_cents,
       CAST(o.o_orderdate + TO_MONTHS(CAST(k - 1 AS INTEGER)) AS DATE)
         AS due_date
FROM orders o, LATERAL (
  SELECT unnest(generate_series(1, 3)) AS k
) t
WHERE o.o_totalprice >= 400000
ORDER BY orderkey, installment_no
""",
)
def orders_installments_udtf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (Spark 4 ``@udtf``, arrow-enabled): expand each
    large order into a 3-installment payment schedule — one input row
    to N output rows with per-row arithmetic, the table-function
    extension point (SURVEY §2.10 UDF escape-hatch matrix: scalar UDF /
    pandas UDF / mapInPandas / applyInPandasWithState / DataSource are
    all exercised elsewhere; this is the remaining surface). Integer
    cents split exactly: each installment gets cents//3 and the first
    carries the remainder, so the schedule reconciles to the order
    total bit-for-bit (pinned in pytest). The lateral expansion is
    row-local — no shuffle at all until the final sort; at 100 TB the
    UDTF runs inside the scan stage like any generator."""
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="installment_no bigint, installment_cents bigint, "
                     "due_month_offset int")
    class Installments:
        def eval(self, cents: int, parts: int):
            base, rem = divmod(cents, parts)
            for k in range(1, parts + 1):
                yield k, base + (rem if k == 1 else 0), k - 1

    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_totalprice") >= 400000
    )
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    exploded = o.select(
        F.col("o_orderkey").alias("orderkey"),
        "o_orderdate",
        cents.alias("cents"),
    ).lateralJoin(
        Installments(F.col("cents").outer(), lit(3)).alias("i")
    )
    return exploded.select(
        "orderkey",
        F.col("installment_no"),
        F.col("installment_cents"),
        F.add_months(F.col("o_orderdate"), F.col("due_month_offset"))
        .cast("date")
        .alias("due_date"),
    )


@query(
    "part_copurchase_triangles",
    tags=("graph", "join", "triangles"),
    oracle="""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
)
SELECT e1.a AS part_a, e1.b AS part_b, e2.b AS part_c
FROM e e1
JOIN e e2 ON e1.b = e2.a
JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
ORDER BY part_a, part_b, part_c
""",
)
def part_copurchase_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle enumeration in the co-purchase graph (edges = part
    pairs co-bought in >= 2 orders): the classic distributed graph-join
    pattern — orient every edge low->high so each triangle is counted
    exactly once, build length-2 paths by joining edges on the middle
    vertex, then close them against the edge set. Complements the
    dedup band's connected components (operators/graph.py) with a
    local-structure statistic (clustering/bundle detection). Scale:
    path fan-out is sum of deg(v)^2 over the ORIENTED graph — the
    low->high orientation caps effective degree, the standard
    mitigation; every join is an equi-join on vertex keys, and edge
    generation reuses the basket-bounded pair expansion of
    part_basket_affinity (never parts x parts). The edge list is
    built ONCE and localCheckpoint'ed: the 3-way triangle join
    references it three times, and Spark re-evaluates shared
    subplans, so the distinct+self-join+groupBy over lineitem would
    otherwise run 3x for a relation that is ~1% of lineitem (the
    part_reach_3hops lineage cut; sf1 8.3s -> ~4s)."""
    from financial_data_warehouse_automation_spark.operators.graph import copurchase_edges

    edges = copurchase_edges(spark, sf_dir)
    e1 = edges.select(F.col("a").alias("t_a"), F.col("b").alias("t_b"))
    e2 = edges.select(F.col("a").alias("m_a"), F.col("b").alias("t_c"))
    e3 = edges.select(F.col("a").alias("c_a"), F.col("b").alias("c_b"))
    return (
        e1.join(e2, F.col("t_b") == F.col("m_a"))
        .join(e3, (F.col("c_a") == F.col("t_a")) & (F.col("c_b") == F.col("t_c")))
        .select(
            F.col("t_a").alias("part_a"),
            F.col("t_b").alias("part_b"),
            F.col("t_c").alias("part_c"),
        )
    )


@query(
    "part_pagerank_step",
    tags=("graph", "join", "pagerank", "iterative"),
    oracle="""
WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
e0 AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
),
e AS (SELECT a AS src, b AS dst FROM e0
      UNION ALL SELECT b AS src, a AS dst FROM e0),
deg AS (SELECT src AS node, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY 1),
nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM deg),
r0 AS (
  SELECT node, deg, CAST(1.0 AS DOUBLE) / nn.n AS r
  FROM deg CROSS JOIN nn
),
s1 AS (
  SELECT e.dst AS node,
         SUM(CAST(ROUND(r0.r / r0.deg, 9) AS DECIMAL(18,9))) AS s
  FROM e JOIN r0 ON e.src = r0.node GROUP BY 1
),
r1 AS (
  SELECT d.node, d.deg,
         ROUND(CAST(0.15 AS DOUBLE) / nn.n
               + CAST(0.85 AS DOUBLE) * CAST(s1.s AS DOUBLE), 9) AS r
  FROM deg d JOIN s1 ON d.node = s1.node CROSS JOIN nn
),
s2 AS (
  SELECT e.dst AS node,
         SUM(CAST(ROUND(r1.r / r1.deg, 9) AS DECIMAL(18,9))) AS s
  FROM e JOIN r1 ON e.src = r1.node GROUP BY 1
),
r2 AS (
  SELECT d.node, d.deg,
         ROUND(CAST(0.15 AS DOUBLE) / nn.n
               + CAST(0.85 AS DOUBLE) * CAST(s2.s AS DOUBLE), 9) AS r
  FROM deg d JOIN s2 ON d.node = s2.node CROSS JOIN nn
)
SELECT node AS part, deg, r AS pagerank
FROM r2 ORDER BY pagerank DESC, part LIMIT 20
""",
)
def part_pagerank_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two power-iteration steps of PageRank (d = 0.85) over the
    co-purchase graph — the canonical distributed iterative-graph
    pattern (each step is ONE edges-to-ranks equi-join plus ONE
    aggregate keyed on the destination vertex; Pregel/GraphX reduces to
    exactly this under the hood). The graph reuses
    part_copurchase_triangles' basket-bounded edge derivation (part
    pairs co-bought in >= 2 orders, never parts x parts); the
    undirected edge set means every node has deg >= 1, so there is no
    dangling-mass term. Determinism: the per-edge contribution r/deg
    rounds to DECIMAL(18,9) BEFORE the destination sum (exact,
    shuffle-order independent — the doubles-in-any-order trap an
    unrounded PageRank has); the damping update is a single double
    expression per node, rounded at unit scale. The top-20 cut is
    TakeOrderedAndProject. At 100x edges each iteration is still one
    shuffle on the vertex key; rank state is O(nodes), never collected
    to the driver (the node-count scalar is the only broadcast)."""
    from financial_data_warehouse_automation_spark.operators.graph import copurchase_edges

    # the shared memoized edge build (one per session, checkpointed);
    # the symmetrized relation still gets its own cut — e feeds deg
    # plus one join PER power step, and Spark re-evaluates shared
    # subplans (8.4s -> ~4s at sf1 without it).
    e0 = copurchase_edges(spark, sf_dir)
    e = e0.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        e0.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    e = cut(e, eager=True)
    deg = e.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    nn = deg.agg(F.count(F.lit(1)).alias("n"))

    r = deg.crossJoin(F.broadcast(nn)).select(
        "node", "deg", (F.lit(1.0) / F.col("n")).alias("r")
    )
    for _ in range(2):
        contrib = e.join(r, e.src == r.node).select(
            F.col("dst"),
            F.round(F.col("r") / F.col("deg"), 9)
            .cast("decimal(18,9)")
            .alias("c"),
        )
        s = contrib.groupBy("dst").agg(F.sum("c").alias("s"))
        r = (
            deg.join(s, F.col("node") == F.col("dst"))
            .crossJoin(F.broadcast(nn))
            .select(
                "node",
                "deg",
                F.round(
                    F.lit(0.15) / F.col("n")
                    + F.lit(0.85) * F.col("s").cast("double"),
                    9,
                ).alias("r"),
            )
        )
    return (
        r.orderBy(F.desc("r"), "node")
        .limit(20)
        .select(
            F.col("node").alias("part"), "deg", F.col("r").alias("pagerank")
        )
    )


@query(
    "monthly_revenue_seasonality",
    tags=("agg", "timeseries", "decomposition", "stats"),
    oracle="""
WITH monthly AS (
  SELECT (EXTRACT(YEAR FROM o_orderdate) - 1995) * 12
           + EXTRACT(MONTH FROM o_orderdate) AS x,
         EXTRACT(MONTH FROM o_orderdate) AS cal_month,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS y
  FROM orders GROUP BY 1, 2
), fit AS (
  SELECT COUNT(*) AS n,
         CAST(SUM(x) AS DOUBLE) AS sx, CAST(SUM(y) AS DOUBLE) AS sy,
         CAST(SUM(x * y) AS DOUBLE) AS sxy, CAST(SUM(x * x) AS DOUBLE) AS sxx
  FROM monthly
), coef AS (
  SELECT (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope,
         (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n
           AS intercept
  FROM fit
), resid AS (
  SELECT m.cal_month,
         CAST(ROUND(m.y - (c.intercept + c.slope * m.x), 2)
              AS DECIMAL(24,2)) AS r
  FROM monthly m CROSS JOIN coef c
)
SELECT cal_month,
       CAST(COUNT(*) AS BIGINT) AS n_years,
       ROUND(CAST(SUM(r) AS DOUBLE) / COUNT(*), 2) AS seasonal_cents
FROM resid GROUP BY 1 ORDER BY 1
""",
)
def monthly_revenue_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classical additive decomposition, step 2: detrend total monthly
    revenue with the exact-integer-moment OLS line (the
    segment_revenue_trend machinery, unsegmented) and average the
    residuals per calendar month — the seasonal index that answers
    'is December really bigger, or is that just growth?'. Residuals
    are rounded to 2 (cents scale — round-6 at ~1e10 magnitude exceeds
    double precision, the registry's scale-the-ROUND rule; that exact
    divergence was caught by the sf0.1 sweep in round 4) and
    accumulated as exact decimals before the
    final double division, so the per-month means are shuffle-order
    independent. Shape: one month-grain aggregate, a single-row
    coefficient broadcast, and a 12-row reduce."""
    o = load_table(spark, sf_dir, "orders")
    monthly = o.groupBy(
        (
            (F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate")
        ).cast("long").alias("x"),
        F.month("o_orderdate").cast("long").alias("cal_month"),
    ).agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias("y")
    )
    fit = monthly.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
    )
    slope = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / (
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    )
    coef = fit.select(
        slope.alias("slope"),
        ((F.col("sy") - slope * F.col("sx")) / F.col("n")).alias("intercept"),
    )
    resid = monthly.crossJoin(F.broadcast(coef)).select(
        "cal_month",
        F.round(
            F.col("y") - (F.col("intercept") + F.col("slope") * F.col("x")), 2
        ).cast("decimal(24,2)").alias("r"),
    )
    return (
        resid.groupBy("cal_month")
        .agg(
            F.count(F.lit(1)).alias("n_years"),
            F.round(F.sum("r").cast("double") / F.count(F.lit(1)), 2).alias(
                "seasonal_cents"
            ),
        )
    )


@query(
    "customer_ltv_cohorts",
    tags=("agg", "cohort", "window", "ltv"),
    oracle="""
WITH firsts AS (
  SELECT o_custkey,
         MIN((EXTRACT(YEAR FROM o_orderdate) - 1995) * 12
             + EXTRACT(MONTH FROM o_orderdate)) AS cohort_m
  FROM orders GROUP BY 1
), spend AS (
  SELECT o.o_custkey, f.cohort_m,
         (EXTRACT(YEAR FROM o.o_orderdate) - 1995) * 12
           + EXTRACT(MONTH FROM o.o_orderdate) - f.cohort_m AS age_m,
         CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders o JOIN firsts f ON o.o_custkey = f.o_custkey
)
SELECT cohort_m, age_m,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_active,
       CAST(SUM(cents) AS BIGINT) AS revenue_cents
FROM spend
WHERE age_m <= 11
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def customer_ltv_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customer lifetime-value cohort matrix: customers grouped by
    first-order month, revenue and active count tracked by months since
    acquisition (the retention/LTV triangle every warehouse report
    stack draws). The first-order month is ONE aggregate re-joined to
    the fact — not a window over the fact (a min-window would re-sort
    the whole orders table; the aggregate+join shuffles the same key
    once and AQE can broadcast the per-customer dim at small scale).
    Exact integer cents; month index arithmetic is integral end to
    end. Truncated to the first year of each cohort's life to keep the
    matrix dense."""
    o = load_table(spark, sf_dir, "orders")
    midx = ((F.year("o_orderdate") - 1995) * 12 + F.month("o_orderdate")).cast(
        "long"
    )
    firsts = o.groupBy(F.col("o_custkey").alias("f_cust")).agg(
        F.min(midx).alias("cohort_m")
    )
    spend = o.join(firsts, o.o_custkey == F.col("f_cust")).select(
        "o_custkey",
        "cohort_m",
        (midx - F.col("cohort_m")).alias("age_m"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    return (
        spend.where(F.col("age_m") <= 11)
        .groupBy("cohort_m", "age_m")
        .agg(
            F.count_distinct("o_custkey").alias("n_active"),
            F.sum("cents").alias("revenue_cents"),
        )
    )


@query(
    "customer_rfm_segments",
    tags=("agg", "rfm", "percentile", "scoring"),
    oracle="""
WITH per_cust AS (
  SELECT o_custkey,
         MAX(o_orderdate) AS last_order,
         COUNT(*) AS freq,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS monetary
  FROM orders GROUP BY 1
), scored AS (
  SELECT o_custkey,
         DATEDIFF('day', last_order, TIMESTAMP '1998-08-02') AS rec_days,
         freq, monetary
  FROM per_cust
), ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (ORDER BY rec_days, o_custkey) AS r_rn,
         ROW_NUMBER() OVER (ORDER BY freq DESC, o_custkey) AS f_rn,
         ROW_NUMBER() OVER (ORDER BY monetary DESC, o_custkey) AS m_rn,
         COUNT(*) OVER () AS n
  FROM scored
), coded AS (
  SELECT o_custkey,
         LEAST(((r_rn - 1) * 4) // n + 1, 4) AS r_score,
         LEAST(((f_rn - 1) * 4) // n + 1, 4) AS f_score,
         LEAST(((m_rn - 1) * 4) // n + 1, 4) AS m_score
  FROM ranked
)
SELECT r_score, f_score, m_score,
       CAST(COUNT(*) AS BIGINT) AS n_customers
FROM coded GROUP BY 1, 2, 3 ORDER BY 1, 2, 3
""",
)
def customer_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM segmentation: every customer scored 1-4 on Recency,
    Frequency and Monetary value by exact quartile of rank (score =
    (rank-1)*4 // n + 1 — pure integer arithmetic over ROW_NUMBER with
    deterministic tiebreaks, NOT ntile, whose remainder-distribution
    rules differ between engines), then the 64-cell segment census.
    Each of the three ranks is the TWO-PASS bucket-offset global
    row_number (operators/ranks.py, the part_abc_pareto pattern): a
    32-band value bucketing, per-bucket counts folded into a <=32-row
    broadcast of cumulative offsets, then row_number WITHIN each
    bucket — no partition-less window anywhere, so the plan's widest
    sort is one bucket, not all customers (round-4 verdict item #2).
    n arrives as a single-row broadcast. Anchor date is the dataset's
    epoch end, so recency is reproducible."""
    from financial_data_warehouse_automation_spark.operators.ranks import global_row_number

    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.max("o_orderdate").alias("last_order"),
        F.count(F.lit(1)).alias("freq"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias(
            "monetary"
        ),
    )
    scored = per_cust.select(
        "o_custkey",
        F.datediff(F.lit("1998-08-02").cast("date"), F.col("last_order")).alias(
            "rec_days"
        ),
        "freq",
        "monetary",
    )
    tb = ("o_custkey",)
    ranked = global_row_number(scored, "rec_days", tb, "r_rn")
    ranked = global_row_number(ranked, "freq", tb, "f_rn", descending=True)
    ranked = global_row_number(ranked, "monetary", tb, "m_rn", descending=True)
    n_row = scored.agg(F.count(F.lit(1)).alias("n"))
    ranked = ranked.crossJoin(F.broadcast(n_row))

    def score(rn):
        return F.least(
            F.floor((F.col(rn) - 1) * 4 / F.col("n")).cast("long") + 1, F.lit(4)
        )

    return (
        ranked.select(
            score("r_rn").alias("r_score"),
            score("f_rn").alias("f_score"),
            score("m_rn").alias("m_score"),
        )
        .groupBy("r_score", "f_score", "m_score")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@query(
    "orders_psi_drift",
    tags=("agg", "drift", "audit", "stats"),
    oracle="""
WITH mix AS (
  SELECT EXTRACT(YEAR FROM o_orderdate) AS year,
         o_orderpriority AS bucket, COUNT(*) AS n
  FROM orders GROUP BY 1, 2
), year_tot AS (
  SELECT year, SUM(n) AS yn FROM mix GROUP BY 1
), base AS (
  SELECT bucket, SUM(n) AS bn FROM mix GROUP BY 1
), base_tot AS (SELECT SUM(bn) AS tn FROM base)
SELECT m.year,
       CAST(SUM(CAST(ROUND(
         (CAST(m.n AS DOUBLE) / y.yn - CAST(b.bn AS DOUBLE) / t.tn)
           * LN((CAST(m.n AS DOUBLE) / y.yn)
                / (CAST(b.bn AS DOUBLE) / t.tn)), 6) AS DECIMAL(18,6)))
         AS DOUBLE) AS psi
FROM mix m
JOIN year_tot y ON m.year = y.year
JOIN base b ON m.bucket = b.bucket
CROSS JOIN base_tot t
GROUP BY 1 ORDER BY 1
""",
)
def orders_psi_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Population Stability Index of the order-priority mix, per year
    against the all-time baseline — THE production drift metric for
    categorical features feeding ML models (PSI > 0.1 = investigate,
    > 0.25 = shifted). Same determinism treatment as doc_kl_divergence
    (PSI is symmetrized KL): unit-scale per-bucket terms rounded to 6
    then accumulated as exact decimals. Shape: one (year, bucket)
    census; every marginal re-reduces it; the fact table is scanned
    once."""
    o = load_table(spark, sf_dir, "orders")
    mix = o.groupBy(
        F.year("o_orderdate").cast("long").alias("year"),
        F.col("o_orderpriority").alias("bucket"),
    ).agg(F.count(F.lit(1)).alias("n"))
    year_tot = mix.groupBy(F.col("year").alias("y_year")).agg(
        F.sum("n").alias("yn")
    )
    base = mix.groupBy(F.col("bucket").alias("b_bucket")).agg(
        F.sum("n").alias("bn")
    )
    base_tot = base.agg(F.sum("bn").alias("tn"))
    p = F.col("n").cast("double") / F.col("yn")
    q = F.col("bn").cast("double") / F.col("tn")
    term = F.round((p - q) * F.log(p / q), 6).cast("decimal(18,6)")
    return (
        mix.join(F.broadcast(year_tot), mix.year == F.col("y_year"))
        .join(F.broadcast(base), mix.bucket == F.col("b_bucket"))
        .crossJoin(F.broadcast(base_tot))
        .groupBy("year")
        .agg(F.sum(term).cast("double").alias("psi"))
    )


@query(
    "customer_revenue_gini",
    tags=("agg", "stats", "inequality", "window"),
    oracle="""
WITH per_cust AS (
  SELECT o_custkey,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS cents
  FROM orders GROUP BY 1
), ranked AS (
  SELECT cents,
         ROW_NUMBER() OVER (ORDER BY cents, o_custkey) AS rnk
  FROM per_cust
), moments AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(cents) AS BIGINT) AS s,
         CAST(SUM(rnk * cents) AS BIGINT) AS rs
  FROM ranked
)
SELECT n AS n_customers,
       ROUND(CAST(2 * rs AS DOUBLE) / (CAST(n AS DOUBLE) * s)
             - CAST(n + 1 AS DOUBLE) / n, 6) AS gini
FROM moments
""",
)
def customer_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue — the individual-grain
    inequality statistic (the category-grain sibling is
    supplier_concentration_hhi): via the rank identity
    G = 2*sum(rank*y) / (n*sum(y)) - (n+1)/n over ascending-sorted
    values, every moment is an exact int64 (rank*cents <= ~1e17 at
    these scales; move to decimal beyond) and only the final two
    divisions run in double, rounded at unit scale. The rank is the
    TWO-PASS bucket-offset global row_number (operators/ranks.py, the
    part_abc_pareto pattern): 32 value bands, a <=32-row broadcast of
    cumulative offsets, row_number within bucket — no partition-less
    window, so the widest sort in the plan is one revenue band, not
    every customer (round-4 verdict item #3)."""
    from financial_data_warehouse_automation_spark.operators.ranks import global_row_number

    o = load_table(spark, sf_dir, "orders")
    per_cust = o.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias(
            "cents"
        )
    )
    ranked = global_row_number(per_cust, "cents", ("o_custkey",), "rnk").select(
        "cents", "rnk"
    )
    m = ranked.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").alias("s"),
        F.sum(F.col("rnk") * F.col("cents")).alias("rs"),
    )
    return m.select(
        F.col("n").cast("long").alias("n_customers"),
        F.round(
            (2 * F.col("rs")).cast("double")
            / (F.col("n").cast("double") * F.col("s"))
            - (F.col("n") + 1).cast("double") / F.col("n"),
            6,
        ).alias("gini"),
    )


@query(
    "order_equidepth_bins",
    tags=("agg", "histogram", "feature-engineering", "two-pass"),
    oracle="""
WITH v AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
), ranked AS (
  SELECT o_orderkey, cents,
         ROW_NUMBER() OVER (ORDER BY cents, o_orderkey) AS rnk,
         COUNT(*) OVER () AS n
  FROM v
)
SELECT CAST((rnk - 1) * 16 // n AS BIGINT) AS bin,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MIN(cents) AS BIGINT) AS lo_cents,
       CAST(MAX(cents) AS BIGINT) AS hi_cents,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM ranked GROUP BY 1 ORDER BY 1
""",
)
def order_equidepth_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (quantile) binning of order value into 16 buckets —
    the feature-engineering discretization step (each bin holds the
    same row count, so downstream models see a balanced categorical;
    contrast order_value_histogram's fixed-WIDTH bins). bin =
    (rank-1)*16 // n, pure integer arithmetic over the exact global
    rank — and the rank is the two-pass bucket-offset row_number
    (operators/ranks.py), so unlike an NTILE over an unpartitioned
    window the plan's widest sort is one of 32 value bands, not all
    orders. n arrives as a single-row broadcast. The per-bin min/max
    are the learned bin EDGES a scorer would broadcast; sum_cents
    checksums membership of every row."""
    from financial_data_warehouse_automation_spark.operators.ranks import global_row_number

    o = load_table(spark, sf_dir, "orders")
    v = o.select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    ranked = global_row_number(v, "cents", ("o_orderkey",), "rnk")
    n_row = v.agg(F.count(F.lit(1)).alias("n"))
    return (
        ranked.crossJoin(F.broadcast(n_row))
        .groupBy(
            F.floor((F.col("rnk") - 1) * 16 / F.col("n"))
            .cast("bigint")
            .alias("bin")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("cents").alias("lo_cents"),
            F.max("cents").alias("hi_cents"),
            F.sum("cents").alias("sum_cents"),
        )
    )


def morton_interleave16(xn, yn):
    """Morton (Z-curve) interleave of two 16-bit-normalized int64
    columns — x bits land in even positions, y bits in odd; unrolled
    into pure column bit math so it rides whole-stage codegen (shared
    by orders_zorder_layout's locality stats and
    orders_zorder_fileskip_2d's clustered write)."""
    zval = None
    for i in range(16):
        xt = F.shiftleft(F.shiftrightunsigned(xn, i) % 2, 2 * i)
        yt = F.shiftleft(F.shiftrightunsigned(yn, i) % 2, 2 * i + 1)
        term = xt + yt
        zval = term if zval is None else zval + term
    return zval


def _zorder_sql() -> str:
    """DuckDB twin of the Morton interleave below — same normalization
    and unrolled bit expression, pure int64 (both engines' <<, >>, &
    and // agree on non-negative operands)."""
    x_terms = " + ".join(
        f"(((xn >> {i}) & 1) << {2 * i})" for i in range(16)
    )
    y_terms = " + ".join(
        f"(((yn >> {i}) & 1) << {2 * i + 1})" for i in range(16)
    )
    return f"""
WITH base AS (
  SELECT o_custkey AS x,
         CAST(o_orderdate AS DATE) - DATE '1992-01-01' AS y,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders
), mx AS (
  SELECT MAX(x) AS mx, MAX(y) AS my FROM base
), norm AS (
  SELECT x, y, cents,
         (x * 65536) // (m.mx + 1) AS xn,
         (y * 65536) // (m.my + 1) AS yn
  FROM base CROSS JOIN mx m
), z AS (
  SELECT x, y, cents, ({x_terms}) + ({y_terms}) AS zval
  FROM norm
)
SELECT CAST(zval >> 27 AS BIGINT) AS zbucket,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(MIN(x) AS BIGINT) AS min_cust, CAST(MAX(x) AS BIGINT) AS max_cust,
       CAST(MIN(y) AS BIGINT) AS min_day, CAST(MAX(y) AS BIGINT) AS max_day,
       CAST(SUM(cents) AS BIGINT) AS sum_cents
FROM z GROUP BY 1 ORDER BY 1
"""


@query(
    "orders_zorder_layout",
    tags=("layout", "zorder", "clustering", "data-skipping"),
    oracle=_zorder_sql(),
)
def orders_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton-curve) clustering key over (custkey, order day)
    — the multi-dimensional data-layout lever behind parquet row-group
    skipping: writing files in zval order bounds BOTH dimensions\'
    min/max inside every file, so a later scan filtered on EITHER
    customer or date range prunes most files (a single-column sort
    only bounds one). Both dimensions normalize to 16-bit range by
    exact integer scaling (scale-invariant: the same 32 buckets at
    any SF), then interleave as an unrolled pure-int64 bit expression
    (no UDF, identical in DuckDB). Each top-5-bit zbucket = what one
    z-sorted file\'s footer stats would show; tests/test_round4_ops.py
    asserts every bucket\'s custkey span <= global/4 and day span <=
    global/8 — exactly the locality data skipping depends on. Shape:
    scan -> single-row max broadcast -> map-side bit math -> one
    32-key aggregate; no sort is needed to MEASURE the layout (an
    actual rewrite would repartitionByRange on zval — an intentional
    shuffle)."""
    o = load_table(spark, sf_dir, "orders")
    base = o.select(
        F.col("o_custkey").alias("x"),
        F.datediff(F.col("o_orderdate"), F.lit("1992-01-01").cast("date"))
        .cast("long")
        .alias("y"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    mx = base.agg(F.max("x").alias("mx"), F.max("y").alias("my"))
    norm = base.crossJoin(F.broadcast(mx)).select(
        "x",
        "y",
        "cents",
        F.floor(F.col("x") * 65536 / (F.col("mx") + 1)).cast("long").alias("xn"),
        F.floor(F.col("y") * 65536 / (F.col("my") + 1)).cast("long").alias("yn"),
    )
    z = norm.withColumn("zval", morton_interleave16(F.col("xn"), F.col("yn")))
    return (
        z.groupBy(
            F.shiftrightunsigned(F.col("zval"), 27).cast("bigint").alias("zbucket")
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.min("x").alias("min_cust"),
            F.max("x").alias("max_cust"),
            F.min("y").alias("min_day"),
            F.max("y").alias("max_day"),
            F.sum("cents").alias("sum_cents"),
        )
    )


def _rm_warehouse_dir(spark: SparkSession, table: str) -> None:
    """Remove a managed table's leftover warehouse directory — the
    classic "managed table already exists over a previous session's
    location" guard. A local-filesystem warehouse (file:// or bare
    path) takes the shutil fast path; any other scheme (hdfs://,
    s3a://, ...) goes through the Hadoop FileSystem API so the cleanup
    actually happens instead of shutil silently no-opping on a path
    that doesn't exist locally (r9 advisor finding)."""
    import shutil
    from urllib.parse import urlparse

    wh = spark.conf.get("spark.sql.warehouse.dir")
    parsed = urlparse(wh)
    if parsed.scheme in ("", "file"):
        shutil.rmtree(os.path.join(parsed.path, table), ignore_errors=True)
        return
    jvm = spark.sparkContext._jvm
    hconf = spark.sparkContext._jsc.hadoopConfiguration()
    path = jvm.org.apache.hadoop.fs.Path(wh.rstrip("/") + "/" + table)
    fs = path.getFileSystem(hconf)
    fs.delete(path, True)  # recursive; False (absent) is fine


# Bucketed-table layout, written once per (session, sf_dir) and
# memoized like operators/graph.py's _EDGE_CACHE: the LAYOUT is the
# amortized artifact (a production warehouse buckets its fact tables
# at ingest, then every subsequent join rides the layout), so the
# registered query measures the co-located JOIN, not the one-time
# write. No memo bypass for audit mode is needed — the bucketed scan
# IS the plan under audit (there is no checkpoint to see through).
_BUCKETED_PAIR_CACHE: dict[tuple[str, str], tuple[str, str]] = {}


def _bucketed_li_orders(spark: SparkSession, sf_dir: str) -> tuple[str, str]:
    import re as _re

    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _BUCKETED_PAIR_CACHE:
        return _BUCKETED_PAIR_CACHE[key]
    tag = _re.sub(r"\W+", "_", sf_dir).strip("_").lower()
    li_name, ord_name = f"li_bucketed_{tag}", f"ord_bucketed_{tag}"
    # a PREVIOUS session's managed-table directory survives in
    # spark-warehouse while the in-memory catalog does not — creating
    # the table fresh over that leftover location is the classic
    # "managed table already exists" failure; drop + clear first
    for t in (li_name, ord_name):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        _rm_warehouse_dir(spark, t)
    (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_extendedprice", "l_discount")
        .write.bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(li_name)
    )
    (
        load_table(spark, sf_dir, "orders")
        .select("o_orderkey", "o_orderpriority")
        .write.bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(ord_name)
    )
    for k in [k for k in _BUCKETED_PAIR_CACHE if k[0] != key[0]]:
        del _BUCKETED_PAIR_CACHE[k]
    _BUCKETED_PAIR_CACHE[key] = (li_name, ord_name)
    return li_name, ord_name


@query(
    "bucketed_join_colocated",
    tags=("layout", "bucketing", "join", "shuffle-free"),
    oracle=f"""
SELECT o.o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_items,
       CAST(SUM({sql_money('l.l_extendedprice')}
                * (CAST(1.0 AS DECIMAL(2,1)) - {sql_rate('l.l_discount')}))
            AS DOUBLE) AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY 1 ORDER BY 1
""",
)
def bucketed_join_colocated(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The co-located fact-to-fact join — THE amortized shuffle lever
    for 100 TB: lineitem and orders are written ONCE as bucketed
    tables (8 buckets, hash(l_orderkey) == hash(o_orderkey) rows land
    in same-numbered files, sorted within each bucket), after which
    EVERY orderkey join between them is exchange-free — the
    sort-merge join reads matching bucket files directly, so the only
    shuffle in this whole query is the final 5-group priority
    aggregate. tests/test_plan_hygiene.py proves it structurally:
    the SortMergeJoin subtree of THIS plan contains zero
    ShuffleExchange nodes (and zero Sorts beyond the bucket-local
    ones), while the same join over the raw parquet shows two.
    The MERGE hint pins the join strategy so the demonstration can't
    silently degrade to a broadcast at small SF; at production scale
    SMJ is what AQE would pick anyway for fact-to-fact. At 100 TB the
    bucket count scales to O(cluster cores) and the layout amortizes
    across every downstream orderkey join, the same trade as the
    reference's one-time bronze conversion (python_version/
    build_warehouse.py:112-126: convert once, query forever)."""
    li_name, ord_name = _bucketed_li_orders(spark, sf_dir)
    li, od = spark.table(li_name), spark.table(ord_name)
    one = F.lit("1.0").cast("decimal(2,1)")
    revenue = money("l_extendedprice") * (one - rate("l_discount"))
    return (
        li.hint("merge")
        .join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(revenue).alias("revenue"),
        )
    )


# Month-partitioned orders table, written once per (session, sf_dir)
# — the DPP demonstration's layout artifact, memoized exactly like
# _BUCKETED_PAIR_CACHE above.
_PARTITIONED_ORDERS_CACHE: dict[tuple[str, str], str] = {}


def _month_partitioned_orders(spark: SparkSession, sf_dir: str) -> str:
    import re as _re

    key = (spark.sparkContext.applicationId, sf_dir)
    if key in _PARTITIONED_ORDERS_CACHE:
        return _PARTITIONED_ORDERS_CACHE[key]
    tag = _re.sub(r"\W+", "_", sf_dir).strip("_").lower()
    name = f"ord_by_month_{tag}"
    spark.sql(f"DROP TABLE IF EXISTS {name}")
    _rm_warehouse_dir(spark, name)
    (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_orderpriority",
            "o_totalprice",
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
        .write.partitionBy("month")
        .mode("overwrite")
        .format("parquet")
        .saveAsTable(name)
    )
    for k in [k for k in _PARTITIONED_ORDERS_CACHE if k[0] != key[0]]:
        del _PARTITIONED_ORDERS_CACHE[k]
    _PARTITIONED_ORDERS_CACHE[key] = name
    return name


def _month_dim(spark: SparkSession) -> DataFrame:
    """Static calendar dim (month -> quarter), 1992-01..1998-12 — the
    tiny broadcast side whose filter DPP pushes into the fact scan."""
    rows = [
        (f"{y}-{m:02d}", f"{y}-Q{(m - 1) // 3 + 1}")
        for y in range(1992, 1999)
        for m in range(1, 13)
    ]
    return spark.createDataFrame(rows, "month string, quarter string")


@query(
    "partitioned_join_dpp",
    tags=("layout", "partitioning", "dpp", "join"),
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders
WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1995-04-01'
GROUP BY 1 ORDER BY 1
""",
)
def partitioned_join_dpp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DYNAMIC PARTITION PRUNING — the second half of the layout story
    bucketed_join_colocated starts: orders are written once per
    session PARTITIONED BY month (the hive-style layout a 100 TB fact
    table actually has), then joined to a tiny calendar dim filtered
    to one quarter. The quarter predicate lives on the DIM — no
    static filter mentions the fact's partition column — yet Catalyst
    injects a dynamicpruningexpression subquery into the fact scan's
    PartitionFilters, so the scan reads the 3 matching month
    directories out of ~81 instead of the whole table. That runtime
    dim-filter-to-fact-prune is THE mechanism star-schema queries
    live on at scale; tests/test_plan_hygiene.py pins it
    structurally (the scan node carries dynamicpruning, and a
    post-execution partition count proves 3 of 81, not 81). The dim
    broadcasts (84 rows); the only shuffle is the final 5-group
    aggregate. Oracle: the same quarter expressed as a static date
    range on the raw table — DPP must not change values, only I/O."""
    fact = spark.table(_month_partitioned_orders(spark, sf_dir))
    # select month ONLY before the join: physical DPP planning reuses
    # the join's broadcast iff its child canonically equals the
    # subquery's Project[month] — with quarter still in the build side
    # the reuse check fails and the filter silently degrades to
    # dynamicpruningexpression(true), i.e. a full 80-partition scan
    # (measured: 80 -> 3 partitions with this projection)
    dim = (
        _month_dim(spark)
        .where(F.col("quarter") == "1995-Q1")
        .select("month")
    )
    return (
        fact.join(dim.hint("broadcast"), "month")
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(
                F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
            ).alias("cents"),
        )
    )


@query(
    "source_linegen_pushdown_agg",
    tags=("source", "datasource-api", "pushdown", "agg"),
    oracle="""
WITH gen AS (
  SELECT i,
         md5(CAST(i AS VARCHAR)) AS key,
         (i % 997) / CAST(100 AS DOUBLE) AS amount
  FROM generate_series(0, 19999) t(i)
)
SELECT substr(key, 1, 1) AS bucket,
       CAST(COUNT(*) AS BIGINT) AS n,
       CAST(SUM(CAST(ROUND(amount * 100, 0) AS BIGINT)) AS BIGINT) AS cents,
       CAST(MIN(i) AS BIGINT) AS min_i,
       CAST(MAX(i) AS BIGINT) AS max_i
FROM gen WHERE i >= 5000 AND i < 15000
GROUP BY 1 ORDER BY 1
""",
)
def source_linegen_pushdown_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """source_linegen_agg's filtered sibling, exercising the Spark 4.1
    Python DataSource FILTER PUSHDOWN API: the ``i`` range predicate
    reaches LineGenReader.pushFilters, which narrows the generated key
    space itself — partitions() plans only [5000, 15000) and executors
    never materialize an out-of-range row (a real connector turns the
    same filters into WHERE clauses or offset seeks; the unit pin is in
    tests/test_sources.py). The oracle applies the identical predicate
    to the DuckDB replay, so the hash certifies that pushdown changed
    WHERE the filtering happens, not WHAT survives it. (sf_dir unused:
    the relation is synthesized.)"""
    from financial_data_warehouse_automation_spark.sources.linegen import LineGenDataSource

    # runtime conf, not just session-factory default: the driver's gate
    # may hand us ITS OWN SparkSession, and a reader that implements
    # pushFilters() hard-errors when the flag is off
    spark.conf.set("spark.sql.python.filterPushdown.enabled", "true")
    try:  # idempotent under repeated registration in one session
        spark.dataSource.register(LineGenDataSource)
    except Exception:
        pass
    gen = (
        spark.read.format("linegen")
        .option("rows", 20000)
        .option("numpartitions", 8)
        .load()
        .where((F.col("i") >= 5000) & (F.col("i") < 15000))
    )
    return (
        gen.groupBy(F.substring("key", 1, 1).alias("bucket"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.round(F.col("amount") * 100, 0).cast("bigint")).alias(
                "cents"
            ),
            F.min("i").alias("min_i"),
            F.max("i").alias("max_i"),
        )
    )


_REACH_EDGE_SQL = """
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), e0 AS (
  SELECT a.l_partkey AS a, b.l_partkey AS b
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY 1, 2 HAVING COUNT(*) >= 2
)
SELECT a AS src, b AS dst FROM e0
UNION ALL SELECT b AS src, a AS dst FROM e0
"""

# The BFS text proper. {prelude} inlines the edge CTEs in the oracle
# and is empty on the Spark side; {e} is the edge relation — the
# materialized temp view in Spark, the `e` CTE in the oracle. The walk
# text itself is engine-identical.
_REACH_WALK_SQL = """
WITH RECURSIVE {prelude}seeds AS (
  SELECT src AS seed FROM (
    SELECT src, COUNT(*) AS dg FROM {e} GROUP BY 1
    ORDER BY dg DESC, src LIMIT 20
  ) hubs
), walk(seed, node, hop) AS (
  SELECT seed, seed, 0 FROM seeds
  UNION ALL
  SELECT DISTINCT w.seed, e.dst, w.hop + 1
  FROM walk w JOIN {e} e ON e.src = w.node
  WHERE w.hop < 3
), reach AS (
  SELECT seed, node, MIN(hop) AS hop FROM walk GROUP BY 1, 2
)
SELECT hop,
       CAST(COUNT(*) AS BIGINT) AS n_reachable,
       CAST(COUNT(DISTINCT seed) AS BIGINT) AS n_seeds,
       CAST(SUM(node) AS BIGINT) AS node_checksum
FROM reach GROUP BY 1 ORDER BY 1
"""

_REACH_ORACLE = _REACH_WALK_SQL.format(
    prelude=_REACH_EDGE_SQL.strip().replace(
        "WITH op AS", "op AS", 1
    ).replace(
        ")\nSELECT a AS src", "), e AS (\nSELECT a AS src", 1
    ) + "\n), ",
    e="e",
)


@query(
    "part_reach_3hops",
    tags=("graph", "sql", "recursive-cte", "bfs"),
    oracle=_REACH_ORACLE,
)
def part_reach_3hops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded multi-source BFS as a RECURSIVE CTE (Spark 4 WITH
    RECURSIVE — a whole SQL-surface capability the engine gains for
    free, run through the same front door as sql_shipping_priority):
    from the 20 highest-degree hub parts, walk the co-purchase graph
    up to 3 hops and report the min-hop reachability census per ring.
    The walk text is engine-identical (_REACH_WALK_SQL runs verbatim
    in DuckDB with the edge CTEs inlined). Iterative-DF siblings:
    part_pagerank_step (fixed-point arithmetic),
    dedup_cluster_components (unbounded closure); the recursion here
    is Spark's own loop-until-empty-frontier execution of the UNION
    ALL step — each iteration is one frontier-to-edges equi-join.
    Two scale guards, both found by the 10x sweep where this was the
    slowest query (21s, round 7):
      * the edge set is built ONCE and localCheckpoint'ed — a
        recursive CTE re-evaluates every non-recursive relation it
        references per iteration, so the distinct+self-join+groupBy
        edge build over lineitem was running 4x (seeds + 3 hops),
        ~14s of the 21. Materializing the (basket-bounded, ~1% of
        lineitem) edge list is the canonical iterative-graph
        lineage cut — what GraphX/MLlib do between supersteps.
      * the recursive member is SELECT DISTINCT, so each frontier is
        the level SET (<= seeds x |V| rows), never the walk MULTISET
        (seeds x deg^hops paths); min-hop only needs each
        (seed, node) witnessed once per level, so `reach` — and the
        query result — is unchanged.
    Depth and seed count stay fixed — the standard guard that keeps
    a recursive graph query from becoming all-pairs; the edge set
    reuses the basket-bounded pair expansion."""
    from financial_data_warehouse_automation_spark.tables import register_views

    register_views(spark, sf_dir, names=("lineitem",))
    from financial_data_warehouse_automation_spark.operators.graph import copurchase_edges

    e0 = copurchase_edges(spark, sf_dir)
    edges = e0.select(F.col("a").alias("src"), F.col("b").alias("dst")).unionByName(
        e0.select(F.col("b").alias("src"), F.col("a").alias("dst"))
    )
    edges.createOrReplaceTempView("part_copurchase_edges")
    return spark.sql(
        _REACH_WALK_SQL.format(prelude="", e="part_copurchase_edges")
    )


@query(
    "order_winsorized_stats",
    tags=("agg", "robust-stats", "percentile", "feature-engineering"),
    oracle="""
WITH priced AS (
  SELECT o_orderpriority AS priority,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
         o_orderkey
  FROM orders
), ranked AS (
  SELECT priority, cents,
         ROW_NUMBER() OVER (PARTITION BY priority
                            ORDER BY cents, o_orderkey) AS rn,
         COUNT(*) OVER (PARTITION BY priority) AS n
  FROM priced
), bounds AS (
  SELECT priority,
         CAST(MAX(n) AS BIGINT) AS n_orders,
         MAX(CASE WHEN rn = (n + 99) // 100 THEN cents END) AS lo_cents,
         MAX(CASE WHEN rn = (99 * n + 99) // 100 THEN cents END) AS hi_cents
  FROM ranked GROUP BY priority
)
SELECT p.priority, b.n_orders,
       CAST(b.lo_cents AS BIGINT) AS lo_cents,
       CAST(b.hi_cents AS BIGINT) AS hi_cents,
       CAST(SUM(CASE WHEN p.cents < b.lo_cents OR p.cents > b.hi_cents
                     THEN 1 ELSE 0 END) AS BIGINT) AS n_clamped,
       ROUND(CAST(SUM(p.cents) AS DOUBLE) / b.n_orders, 2) AS mean_cents,
       ROUND(CAST(SUM(LEAST(GREATEST(p.cents, b.lo_cents), b.hi_cents))
                  AS DOUBLE) / b.n_orders, 2) AS mean_winsorized
FROM priced p JOIN bounds b ON p.priority = b.priority
GROUP BY 1, 2, 3, 4 ORDER BY 1
""",
)
def order_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized robust statistics per order priority: clamp order
    value at the exact nearest-rank p01/p99 boundaries and report the
    mean before/after plus how many rows the clamp touched — the
    outlier-TREATMENT step that pairs with events_mad_anomalies'
    outlier DETECTION (detect -> winsorize is the standard robust
    feature-engineering chain; a 10^5x fat-finger order moves the raw
    mean for its whole group, and the winsorized mean is what a
    downstream model should see). Boundaries use the
    order_price_percentiles nearest-rank pattern (integer rank pick,
    no interpolating quantile — engine-identical), come back as a
    5-row broadcast join onto the fact, and every moment is exact
    int64 cents until the two final divisions (round-2). Shape: one
    priority-partitioned window + one broadcast join + one aggregate;
    no global sort anywhere."""
    from pyspark.sql import Window

    o = load_table(spark, sf_dir, "orders")
    priced = o.select(
        F.col("o_orderpriority").alias("priority"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
        "o_orderkey",
    )
    w = Window.partitionBy("priority").orderBy("cents", "o_orderkey")
    wn = Window.partitionBy("priority")
    ranked = priced.select(
        "priority",
        "cents",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    n = F.col("n")
    bounds = ranked.groupBy("priority").agg(
        F.max(n).alias("n_orders"),
        F.max(
            F.when(F.col("rn") == F.floor((n + 99) / 100), F.col("cents"))
        ).alias("lo_cents"),
        F.max(
            F.when(F.col("rn") == F.floor((99 * n + 99) / 100), F.col("cents"))
        ).alias("hi_cents"),
    )
    j = priced.join(F.broadcast(bounds), "priority")
    clamped = F.least(F.greatest(F.col("cents"), F.col("lo_cents")), F.col("hi_cents"))
    return (
        j.groupBy("priority", "n_orders", "lo_cents", "hi_cents")
        .agg(
            F.sum(
                F.when(
                    (F.col("cents") < F.col("lo_cents"))
                    | (F.col("cents") > F.col("hi_cents")),
                    1,
                ).otherwise(0)
            ).alias("n_clamped"),
            F.round(
                F.sum("cents").cast("double") / F.first("n_orders"), 2
            ).alias("mean_cents"),
            F.round(
                F.sum(clamped).cast("double") / F.first("n_orders"), 2
            ).alias("mean_winsorized"),
        )
    )


@query(
    "part_inventory_balance",
    tags=("window", "stateful", "inventory", "closed-form"),
    oracle="""
WITH flows AS (
  SELECT l_partkey AS part, CAST(l_shipdate AS DATE) AS day,
         CAST(SUM(CASE WHEN l_returnflag = 'R'
                       THEN CAST(l_quantity AS BIGINT)
                       ELSE -CAST(l_quantity AS BIGINT) END) AS BIGINT) AS net
  FROM lineitem GROUP BY 1, 2
), prefixed AS (
  SELECT part, day, net,
         SUM(net) OVER (PARTITION BY part ORDER BY day) AS prefix
  FROM flows
), running AS (
  SELECT part, day, net, prefix,
         MIN(prefix) OVER (PARTITION BY part ORDER BY day) AS run_min
  FROM prefixed
), clamped AS (
  SELECT part, day, net,
         prefix - LEAST(run_min, 0) AS balance
  FROM running
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_part_days,
       CAST(COUNT(DISTINCT part) AS BIGINT) AS n_parts,
       CAST(SUM(balance) AS BIGINT) AS total_balance,
       CAST(SUM(CASE WHEN balance = 0 AND net < 0 THEN 1 ELSE 0 END)
            AS BIGINT) AS n_stockout_days,
       CAST(MAX(balance) AS BIGINT) AS max_balance
FROM clamped
""",
)
def part_inventory_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Floor-at-zero running inventory balance per part (restocks =
    returned lines, issues = shipped lines): the classic NON-ASSOCIATIVE
    recurrence balance_t = max(0, balance_{t-1} + net_t) that plain
    windows supposedly cannot express and that usually gets written as
    a per-key Python recurrence (applyInPandas). It has a closed form:
    balance_t = prefix_t - min(0, min_{s<=t} prefix_s) — the clamp only
    ever 'forgives' the deepest debt seen so far — so TWO stacked
    per-part windows (running sum, then running min of it) compute it
    entirely JVM-side, whole-stage-codegenned, one shuffle on the part
    key: the plan you want at 100 TB, where an Arrow recurrence would
    serialize every part's history through Python. Same identity
    family as events_cusum_drift's clamped drift statistic, here at
    the part grain with a stockout census; the recurrence-vs-identity
    equivalence is itself asserted in tests/test_round4_ops.py, and
    the DuckDB oracle evaluates the identical closed form."""
    from pyspark.sql import Window

    l = load_table(spark, sf_dir, "lineitem")
    flows = (
        l.groupBy(
            F.col("l_partkey").alias("part"),
            F.col("l_shipdate").cast("date").alias("day"),
        )
        .agg(
            F.sum(
                F.when(
                    F.col("l_returnflag") == "R",
                    F.col("l_quantity").cast("bigint"),
                ).otherwise(-F.col("l_quantity").cast("bigint"))
            ).alias("net")
        )
    )
    w = Window.partitionBy("part").orderBy("day")
    running = flows.select(
        "part",
        "day",
        "net",
        F.sum("net").over(w).alias("prefix"),
    ).withColumn("run_min", F.min("prefix").over(w))
    clamped = running.select(
        "part",
        "net",
        (F.col("prefix") - F.least(F.col("run_min"), F.lit(0))).alias(
            "balance"
        ),
    )
    return clamped.agg(
        F.count(F.lit(1)).alias("n_part_days"),
        F.count_distinct("part").alias("n_parts"),
        F.sum("balance").alias("total_balance"),
        F.sum(
            F.when((F.col("balance") == 0) & (F.col("net") < 0), 1).otherwise(0)
        ).alias("n_stockout_days"),
        F.max("balance").alias("max_balance"),
    )


def _rowsink_workdir() -> str:
    """Per-run /tmp dir for the rowsink demo, removed at process exit
    (same per-run-not-content-addressed reasoning as
    queries/streaming_demo._dedup_state_workdir: a reused dir would
    let repeat timings skip the write)."""
    import atexit
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix="rowsink_demo_")
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    return work


@query(
    "source_rowsink_roundtrip",
    tags=("source", "datasource-api", "writer", "sink"),
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders GROUP BY 1 ORDER BY 1
""",
)
def source_rowsink_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Custom Python DataSource WRITER (sources/rowsink.py) proven by
    roundtrip: orders flow OUT through the writer's full two-phase
    commit protocol — per-partition executor writes to temp files,
    driver-side commit renaming them into place + a _SUCCESS manifest
    — then back IN through Spark's json reader, and the aggregate of
    what survived the sink must hash-match DuckDB aggregating the
    original table. A silently dropped partition, a double-committed
    temp, or a row lost at the task/driver handoff all break the
    count/cents totals, so the oracle certifies the commit protocol,
    not just the aggregate. Completes the pluggable-source story:
    linegen demonstrates reader/pushdown/stream-reader, this is the
    sink side (reference parity: the write-back step at
    python_version/build_warehouse.py:203-210). Commit/abort edge
    cases (overwrite clears prior parts, abort removes temps, manifest
    totals) are unit-tested in tests/test_sources.py."""
    from financial_data_warehouse_automation_spark.sources.rowsink import RowSinkDataSource

    try:  # idempotent under repeated registration in one session
        spark.dataSource.register(RowSinkDataSource)
    except Exception:
        pass
    work = _rowsink_workdir()
    (
        load_table(spark, sf_dir, "orders")
        .select(
            "o_orderkey",
            "o_orderpriority",
            F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
            .alias("cents"),
        )
        .write.format("rowsink")
        .option("path", work)
        .mode("overwrite")
        .save()
    )
    back = spark.read.schema(
        "o_orderkey long, o_orderpriority string, cents long"
    ).json(os.path.join(work, "part-*.jsonl"))
    return (
        back.groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
    )


def _parquet_parts(p: str) -> list[str]:
    return [n for n in os.listdir(p) if n.endswith(".parquet")]


def compact_parquet_dir(
    spark: SparkSession, src: str, dst: str, target_bytes: int = 32 << 20
) -> int:
    """Size-measured compaction: rewrite ``src``'s parquet files into
    ``dst`` as ceil(total_bytes / target_bytes) files (>= 1). Returns
    the file count written, asserted against the listing — the
    multi-file branch is pinned by tests/test_round4_ops.py with a
    tiny target (the demo corpus compacts to 1 at the 32 MB default).
    Local-path listing only (the demo's scratch dirs); a cluster
    version lists via the Hadoop FileSystem API like
    _rm_warehouse_dir."""
    import pyarrow.parquet as pq

    total_bytes = sum(
        os.path.getsize(os.path.join(src, n)) for n in _parquet_parts(src)
    )
    n_target = max(1, -(-total_bytes // target_bytes))  # ceil div
    # clamp: repartition(n) partitions holding zero rows write no file,
    # so a target beyond the row count would fail the exact-count assert
    # (r10 advisor — tiny inputs with aggressive target_bytes). The row
    # count comes from the parquet FOOTERS (pure metadata, same walk as
    # parquet_range_candidates) — a maintenance job shouldn't pay a
    # data scan to learn a number every footer already carries.
    n_rows = sum(
        pq.ParquetFile(os.path.join(src, n)).metadata.num_rows
        for n in _parquet_parts(src)
    )
    n_target = max(1, min(n_target, n_rows))
    (
        spark.read.parquet(src)
        .repartition(n_target)
        .write.mode("overwrite")
        .parquet(dst)
    )
    n_written = len(_parquet_parts(dst))
    assert n_written == n_target, (n_written, n_target)
    return n_written



@query(
    "orders_compaction_rewrite",
    tags=("layout", "maintenance", "compaction", "small-files"),
    oracle="""
SELECT 'compacted' AS layout,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS cents,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM orders
UNION ALL
SELECT 'fragmented', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT),
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
FROM orders
ORDER BY layout
""",
)
def orders_compaction_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file COMPACTION — the table-maintenance op (Delta/Iceberg
    ``OPTIMIZE``, Hive concatenate) every long-lived 100 TB warehouse
    runs: streaming appends and per-batch dynamic overwrites leave
    thousands of KB-scale files whose per-file open cost
    (footer read + task schedule, floored by Spark's 4 MB
    openCostInBytes) eventually dwarfs the data scan. The query writes
    orders FRAGMENTED (64-way round-robin — the shape a 64-task append
    leaves), then compacts by size: target file count =
    ceil(total_bytes / 32 MB) measured off the fragmented layout's
    actual file listing, one repartition, one rewrite. Two structural
    asserts pin the mechanics (the fragmented layout really has 64
    parts; the compacted one has exactly the size-derived count), and
    the returned frame aggregates BOTH layouts side by side so the
    oracle certifies bit-identical CONTENT across the rewrite — count,
    exact-cents sum, distinct keys — which is the invariant a
    maintenance job must never break. At 100 TB the same loop runs per
    partition with target = cluster-preferred file size (128-512 MB)
    and bin-packing instead of a global repartition; the
    size-measured-then-rewrite shape is identical."""
    from financial_data_warehouse_automation_spark.queries._helpers import scratch_dir

    work = scratch_dir("compaction_demo_")
    frag_p, comp_p = os.path.join(work, "frag"), os.path.join(work, "comp")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    o.repartition(64).write.mode("overwrite").parquet(frag_p)
    frag_files = _parquet_parts(frag_p)
    assert len(frag_files) == 64, len(frag_files)
    compact_parquet_dir(spark, frag_p, comp_p)

    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")

    def stats(path: str, tag: str) -> DataFrame:
        return (
            spark.read.parquet(path)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(cents).cast("bigint").alias("cents"),
                F.countDistinct("o_custkey").cast("long").alias("n_customers"),
            )
            .select(F.lit(tag).alias("layout"), "n_rows", "cents",
                    "n_customers")
        )

    return stats(comp_p, "compacted").unionByName(
        stats(frag_p, "fragmented")
    )


def parquet_range_candidates(
    path: str, column: str, lo, hi
) -> tuple[int, int, int, int]:
    """Footer-statistics audit of a parquet directory: which files
    COULD contain rows with ``lo <= column < hi``, per the row-group
    min/max stats a stat-based skipper consults. Returns
    (candidate_files, total_files, candidate_row_groups,
    candidate_rows). Pure metadata — no data pages are read; this is
    the planning half of data skipping, the same footer walk
    Delta/Iceberg bake into their file-level stats indexes. Row groups
    with absent stats count as candidates (a skipper must read what it
    cannot prove empty)."""
    import pyarrow.parquet as pq

    cand_files = total_files = cand_rgs = cand_rows = 0
    for name in sorted(os.listdir(path)):
        if not name.endswith(".parquet"):
            continue
        total_files += 1
        md = pq.ParquetFile(os.path.join(path, name)).metadata
        idx = md.schema.to_arrow_schema().get_field_index(column)
        file_hit = False
        for rg in range(md.num_row_groups):
            st = md.row_group(rg).column(idx).statistics
            if st is None or st.min is None or st.max is None:
                hit = True
            else:
                hit = st.min < hi and st.max >= lo
            if hit:
                file_hit = True
                cand_rgs += 1
                cand_rows += md.row_group(rg).num_rows
        if file_hit:
            cand_files += 1
    return cand_files, total_files, cand_rgs, cand_rows


def _scan_output_rows(df: DataFrame) -> int:
    """Execute ``df`` and return the FileSourceScanExec's numOutputRows
    — the rows the parquet reader actually produced AFTER row-group /
    page skipping (Spark's own post-scan Filter is a separate node),
    i.e. the I/O the layout did or did not save. Walks through AQE
    wrappers the same way tests/test_plan_hygiene.py does."""
    df.collect()
    plan = df._jdf.queryExecution().executedPlan()

    def walk(node):
        name = node.getClass().getSimpleName()
        yield name, node
        if name.endswith("QueryStageExec"):
            yield from walk(node.plan())
            return
        if name == "AdaptiveSparkPlanExec":
            yield from walk(node.executedPlan())
            return
        ch = node.children()
        for i in range(ch.size()):
            yield from walk(ch.apply(i))

    scans = [n for nm, n in walk(plan) if nm == "FileSourceScanExec"]
    assert scans, "no FileSourceScanExec in executed plan"
    return scans[0].metrics().apply("numOutputRows").value()


@query(
    "orders_sorted_fileskip",
    tags=("layout", "data-skipping", "parquet-stats", "pruning"),
    oracle="""
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders
WHERE o_orderdate >= TIMESTAMP '1997-03-01'
  AND o_orderdate <  TIMESTAMP '1997-04-01'
GROUP BY 1 ORDER BY 1
""",
)
def orders_sorted_fileskip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FILE/ROW-GROUP SKIPPING off a SORTED layout — the payoff query
    orders_zorder_layout's locality stats promise: a range-clustered
    rewrite makes parquet min/max footer stats DISJOINT across files,
    so a tight range predicate prunes at the row-group level and the
    scan never decodes the other 15/16ths of the table. The builder
    writes orders twice — range-partitioned + sorted on the order
    date, and round-robin shuffled (the layout a hash-partitioned
    append leaves) — then proves the skip three ways before returning
    the oracle-checked aggregate:

    1. FOOTER AUDIT (parquet_range_candidates): on the sorted layout
       at most 4 of 16 files can contain the March-1997 window; on the
       shuffled layout every file is a candidate (each spans the full
       date range) — the planning-time half of data skipping, the
       footer walk Delta/Iceberg persist as file-level stats.
    2. RUNTIME METRIC: the executed sorted scan's numOutputRows equals
       the candidate row groups' rows (reader skipped the rest), while
       the shuffled scan's equals the ENTIRE table — identical pushed
       filter, ~16x I/O difference, layout is the only variable.
    3. The returned aggregate hash-matches the oracle's plain range
       scan — skipping changed I/O, never values.

    The non-obvious scale lesson baked in: Spark writes timestamps as
    INT96 by default (spark.sql.parquet.outputTimestampType), and
    INT96 predicates are NEVER pushed to parquet — the same experiment
    on the raw timestamp column reads all 15,000 rows from both
    layouts (measured r11). Clustering is worthless to the reader
    unless the sort column is stored as a stats-pushable type (DATE
    here; TIMESTAMP_MICROS works too). At 100 TB this pairs with
    orders_zorder_layout: linear sort serves one predicate column,
    the Z-key serves two — either way sizing files so the hot window
    touches few of them is what turns a 100 TB scan into a GB read.
    Reference analogy: python_version/build_warehouse.py:112-126
    converts once to a query-friendly layout and reads it forever —
    this is that decision at the physical-statistics level."""
    import datetime

    from financial_data_warehouse_automation_spark.queries._helpers import scratch_dir

    work = scratch_dir("fileskip_demo_")
    sorted_p = os.path.join(work, "sorted")
    shuffled_p = os.path.join(work, "shuffled")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.col("o_orderdate").cast("date").alias("odate"),
    )
    n_files = 16
    (
        o.repartitionByRange(n_files, "odate")
        .sortWithinPartitions("odate")
        .write.mode("overwrite")
        .parquet(sorted_p)
    )
    o.repartition(n_files).write.mode("overwrite").parquet(shuffled_p)

    lo, hi = datetime.date(1997, 3, 1), datetime.date(1997, 4, 1)
    s_files, s_total, _s_rgs, s_rows = parquet_range_candidates(
        sorted_p, "odate", lo, hi
    )
    r_files, r_total, _r_rgs, _ = parquet_range_candidates(
        shuffled_p, "odate", lo, hi
    )
    assert s_total == n_files and r_total == n_files, (s_total, r_total)
    assert s_files <= 4, f"sorted layout should bound candidates: {s_files}"
    assert r_files == n_files, f"shuffled layout must not prune: {r_files}"

    def window_agg(path: str) -> DataFrame:
        return (
            spark.read.parquet(path)
            .where(
                (F.col("odate") >= F.lit("1997-03-01").cast("date"))
                & (F.col("odate") < F.lit("1997-04-01").cast("date"))
            )
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_orders"),
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
                .cast("bigint")
                .alias("cents"),
            )
        )

    total_rows = o.count()
    sorted_scan = _scan_output_rows(window_agg(sorted_p))
    shuffled_scan = _scan_output_rows(window_agg(shuffled_p))
    assert shuffled_scan == total_rows, (shuffled_scan, total_rows)
    assert sorted_scan <= s_rows, (sorted_scan, s_rows)
    assert sorted_scan < 0.35 * shuffled_scan, (sorted_scan, shuffled_scan)

    return window_agg(sorted_p)


@query(
    "orders_zorder_fileskip_2d",
    tags=("layout", "data-skipping", "zorder", "parquet-stats", "pruning"),
    oracle="""
WITH m AS (SELECT MAX(o_custkey) AS mx FROM orders)
SELECT o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders, m
WHERE o_custkey >= m.mx // 2
  AND o_custkey <  m.mx // 2 + GREATEST(1, m.mx // 8)
GROUP BY 1 ORDER BY 1
""",
)
def orders_zorder_fileskip_2d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO-DIMENSIONAL data skipping off a Z-ORDERED write — the
    companion orders_sorted_fileskip deliberately leaves open: a
    linear sort gives its ONE key everything and every other column
    nothing, while writing in Morton-key order bounds BOTH dimensions'
    min/max within every file, so predicates on EITHER column prune.
    The builder writes orders twice — clustered by
    morton_interleave16(custkey, order-day) and linearly sorted by
    date — and audits both layouts' footers against both predicates
    (a 1/8th customer-key slice and a one-quarter date window).
    Measured, stable across sf0.001/0.01/0.1 (16 files each):

                          custkey slice     date quarter
        z-ordered         9-10 of 16        4-6 of 16     <- both prune
        date-sorted       16 of 16 (zero)   2 of 16       <- one prunes

    — the canonical Z-order trade: neither column gets the linear
    sort's 2/16, but no column is left at 16/16; total I/O across a
    mixed predicate workload drops when query columns exceed one.
    Runtime proof mirrors the 1-D query: the custkey-window scan's
    numOutputRows on the date-sorted layout is the ENTIRE table (its
    footers cannot exclude any file for a custkey predicate), on the
    z-ordered layout only the candidate files' rows. The returned
    custkey-slice aggregate reads the Z layout and must hash-match
    the oracle's plain filter on raw orders — clustering changes
    I/O, never values. The key-space fractions derive from
    MAX(o_custkey) in-query (scale-invariant, replayed by the
    oracle's window arithmetic; integer // on non-negative operands
    agrees across engines). At 100 TB: Z-write once at ingest (one
    repartitionByRange on the precomputed key — the intentional
    shuffle), then every custkey-OR-date query rides the footers;
    files sized so the hot cell set stays small (the same knob as
    orders_sorted_fileskip), and the 16-bit normalization comes from
    orders_zorder_layout whose locality stats *predict* exactly the
    candidate-file counts this query measures."""
    import datetime

    from financial_data_warehouse_automation_spark.queries._helpers import scratch_dir

    work = scratch_dir("zskip2d_demo_")
    z_p = os.path.join(work, "zorder")
    d_p = os.path.join(work, "datesorted")
    n_files = 16
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.col("o_custkey").alias("ckey"),
        F.col("o_orderdate").cast("date").alias("odate"),
    )
    day0 = F.lit("1995-01-01").cast("date")
    mx = o.agg(
        F.max("ckey").alias("mx"),
        F.max(F.datediff("odate", day0)).alias("my"),
    )
    base = o.crossJoin(F.broadcast(mx)).select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        "ckey",
        "odate",
        F.floor(F.col("ckey") * 65536 / (F.col("mx") + 1))
        .cast("long")
        .alias("xn"),
        F.floor(F.datediff("odate", day0) * 65536 / (F.col("my") + 1))
        .cast("long")
        .alias("yn"),
    )
    z = base.withColumn(
        "zval", morton_interleave16(F.col("xn"), F.col("yn"))
    ).drop("xn", "yn")
    (
        z.repartitionByRange(n_files, "zval")
        .sortWithinPartitions("zval")
        .write.mode("overwrite")
        .parquet(z_p)
    )
    (
        o.repartitionByRange(n_files, "odate")
        .sortWithinPartitions("odate")
        .write.mode("overwrite")
        .parquet(d_p)
    )

    maxck = mx.collect()[0].mx
    clo = maxck // 2
    chi = clo + max(1, maxck // 8)
    dlo, dhi = datetime.date(1997, 1, 1), datetime.date(1997, 4, 1)

    zc_files, zc_total, _, zc_rows = parquet_range_candidates(
        z_p, "ckey", clo, chi
    )
    zd_files, _, _, _ = parquet_range_candidates(z_p, "odate", dlo, dhi)
    dc_files, dc_total, _, _ = parquet_range_candidates(d_p, "ckey", clo, chi)
    dd_files, _, _, _ = parquet_range_candidates(d_p, "odate", dlo, dhi)
    assert zc_total == dc_total == n_files, (zc_total, dc_total)
    # Z: both dimensions prune; linear: only the sort column does.
    # Absolute pins carry SAMPLING-JITTER headroom (r16, the same
    # class as the r15 row-group-luck relax): repartitionByRange
    # samples boundaries with an RDD-id-dependent seed, so candidate
    # counts drift a file or two with session history — typical zc is
    # 9-11 but a 13 was observed once in a full-registry sweep after
    # the prefix reorder shifted RDD ids. The RELATIVE claims (z
    # prunes the custkey dimension the linear layout cannot; both z
    # dimensions beat no-pruning) stay exact.
    assert zc_files <= 14, f"zorder custkey candidates: {zc_files}"
    assert zd_files <= 10, f"zorder date candidates: {zd_files}"
    assert dc_files == n_files, f"date-sorted must not prune custkey: {dc_files}"
    assert zc_files < dc_files, (zc_files, dc_files)
    assert dd_files <= 4, f"date-sorted date candidates: {dd_files}"

    def cust_agg(path: str) -> DataFrame:
        return (
            spark.read.parquet(path)
            .where((F.col("ckey") >= clo) & (F.col("ckey") < chi))
            .groupBy("o_orderpriority")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_orders"),
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
                .cast("bigint")
                .alias("cents"),
            )
        )

    total_rows = o.count()
    z_scan = _scan_output_rows(cust_agg(z_p))
    d_scan = _scan_output_rows(cust_agg(d_p))
    # The linear layout must give NO USEFUL custkey pruning. File-level
    # that is exact (dc_files == n_files above); at ROW-GROUP grain a
    # multi-row-group file can skip a tail group whose custkey min/max
    # happens to miss the probe by luck (r15: the 10x sweep's
    # regenerated multi-row-group sf1 input skipped one 80-row group
    # of 1.5M — 0.005%). Tolerate <0.1% statistical luck; the Z-order
    # contrast below stays orders of magnitude apart.
    assert d_scan >= total_rows - max(1, total_rows // 1000), (
        d_scan, total_rows,
    )
    assert z_scan <= zc_rows < total_rows, (z_scan, zc_rows, total_rows)

    return cust_agg(z_p)


@query(
    "orders_snapshot_cow_read",
    tags=("layout", "snapshot", "time-travel", "cow", "maintenance"),
    oracle="""
WITH m AS (SELECT MAX(o_custkey) AS mx FROM orders),
v1 AS (
  SELECT CAST('v1' AS VARCHAR) AS snapshot,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
  FROM orders
),
v2 AS (
  SELECT CAST('v2' AS VARCHAR) AS snapshot,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(ROUND(
           CASE WHEN o_custkey >= m.mx // 4
                 AND o_custkey <  m.mx // 4 + GREATEST(1, m.mx // 20)
                THEN o_totalprice + 100.0 ELSE o_totalprice END * 100, 0)
           AS BIGINT)) AS BIGINT) AS cents,
         CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
  FROM orders, m
  WHERE NOT (o_custkey >= (3 * m.mx) // 5
             AND o_custkey < (3 * m.mx) // 5 + GREATEST(1, m.mx // 50))
)
SELECT * FROM v1 UNION ALL SELECT * FROM v2 ORDER BY snapshot
""",
)
def orders_snapshot_cow_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SNAPSHOT ISOLATION + TIME TRAVEL over plain parquet — the
    lakehouse primitive (Delta/Iceberg's core) the maintenance family
    was still missing next to compaction, schema evolution, Z-layout
    and DPP: immutable data files + a tiny versioned MANIFEST naming
    each snapshot's file set, with updates applied COPY-ON-WRITE so
    old snapshots stay readable forever at zero storage cost beyond
    the rewritten buckets.

    Mechanics, all demonstrated and asserted in-builder:

    - v1 write: orders range-bucketed into 8 directories by customer
      key; manifest v1 lists all 8.
    - CDC batch (deterministic, oracle-replayable off MAX(o_custkey)):
      a +100 price UPDATE for one narrow customer range and a DELETE
      for another. Touched buckets are computed from the same range
      math the layout used, so the rewrite touches <= 4 of 8 bucket
      dirs (asserted); every other v2 manifest entry is v1's
      directory VERBATIM (asserted) — that reuse is what makes a
      petabyte table's daily snapshot cost MBs, not a rewrite.
    - Isolation: the v1 aggregate is collected BEFORE the v2 write
      and re-collected from the v1 manifest AFTER it; the rows must
      be identical (asserted driver-side) — readers of an old
      snapshot never see a concurrent writer, because nothing they
      reference is ever mutated.
    - Time travel: the returned frame reads BOTH manifests and
      aggregates them side by side; the oracle recomputes v1 from raw
      orders and v2 by replaying the same CDC predicate arithmetic in
      SQL — file-set versioning must change WHICH rows are visible,
      never their values.

    At 100 TB: manifests are the scale story — O(files) metadata
    instead of directory listings, snapshot expiry = dropping a
    manifest + unreferenced-file GC (the rowsink's _SUCCESS manifest
    is this same idea on the egress side), and the bucket math here
    is any partition/clustering scheme there. Deliberately NOT
    implemented: concurrent-writer commit arbitration (Delta's
    optimistic log) — single-writer COW is the demonstrated
    contract, the docstring says so honestly."""
    import json

    from financial_data_warehouse_automation_spark.queries._helpers import scratch_dir

    n_buckets = 8
    work = scratch_dir("snapcow_demo_")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.col("o_custkey").alias("ckey"),
    )
    maxck = o.agg(F.max("ckey").alias("m")).collect()[0].m
    bucket_of = lambda c: min(n_buckets - 1, c * n_buckets // (maxck + 1))

    # v1: one directory per customer-range bucket, manifest lists them
    fb = F.least(
        F.lit(n_buckets - 1),
        F.floor(F.col("ckey") * n_buckets / (maxck + 1)),
    ).cast("int")
    # ONE partitioned write builds every bucket (r15: the per-bucket
    # loop re-scanned orders n_buckets times — 8 jobs for 1 job's
    # work); the partition dirs then RENAME into the same per-bucket
    # top-level layout the manifest/GC asserts rely on (partitionBy
    # drops fb from the data files exactly as .drop("fb") did)
    base = o.withColumn("fb", fb)
    v1_dirs = _bucketed_dirs_via_one_write(
        base, "fb", n_buckets, work, "b{b}-v1"
    )
    manifest_v1 = os.path.join(work, "manifest-v1.json")
    with open(manifest_v1, "w") as f:
        json.dump({str(b): d for b, d in v1_dirs.items()}, f)

    def read_snapshot(manifest_path: str) -> DataFrame:
        with open(manifest_path) as f:
            dirs = list(json.load(f).values())
        return spark.read.parquet(*dirs)

    def agg(df: DataFrame, tag: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("cents"),
            F.countDistinct("ckey").cast("long").alias("n_customers"),
        ).select(F.lit(tag).alias("snapshot"), "n_orders", "cents",
                 "n_customers")

    v1_rows_before = agg(read_snapshot(manifest_v1), "v1").collect()

    # CDC batch: update one narrow customer range, delete another —
    # the same integer window arithmetic the oracle replays
    upd_lo, upd_hi = maxck // 4, maxck // 4 + max(1, maxck // 20)
    del_lo, del_hi = (3 * maxck) // 5, (3 * maxck) // 5 + max(1, maxck // 50)
    touched = sorted(
        {bucket_of(c) for c in (upd_lo, upd_hi - 1, del_lo, del_hi - 1)}
    )
    assert len(touched) <= 4, touched

    upd = (F.col("ckey") >= upd_lo) & (F.col("ckey") < upd_hi)
    dele = (F.col("ckey") >= del_lo) & (F.col("ckey") < del_hi)
    v2_dirs = dict(v1_dirs)
    for b in touched:
        d2 = os.path.join(work, f"b{b}-v2")
        (
            spark.read.parquet(v1_dirs[b])
            .where(~dele)
            .withColumn(
                "o_totalprice",
                F.when(upd, F.col("o_totalprice") + 100.0).otherwise(
                    F.col("o_totalprice")
                ),
            )
            .write.mode("overwrite")
            .parquet(d2)
        )
        v2_dirs[b] = d2
    manifest_v2 = os.path.join(work, "manifest-v2.json")
    with open(manifest_v2, "w") as f:
        json.dump({str(b): d for b, d in v2_dirs.items()}, f)

    # COW reuse: untouched buckets are shared verbatim between manifests
    shared = [b for b in range(n_buckets) if v2_dirs[b] == v1_dirs[b]]
    assert len(shared) == n_buckets - len(touched) and shared, (shared,
                                                                touched)
    # isolation: v1 read through its manifest is unchanged by v2's write
    v1_rows_after = agg(read_snapshot(manifest_v1), "v1").collect()
    assert v1_rows_before == v1_rows_after, (v1_rows_before, v1_rows_after)

    return (
        agg(read_snapshot(manifest_v1), "v1")
        .unionByName(agg(read_snapshot(manifest_v2), "v2"))
    )


@query(
    "orders_snapshot_concurrent_commit",
    tags=("layout", "snapshot", "occ", "cow", "maintenance"),
    oracle="""
WITH m AS (SELECT MAX(o_custkey) AS mx FROM orders),
v1 AS (
  SELECT CAST('v1' AS VARCHAR) AS snapshot,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders
),
v2 AS (
  SELECT CAST('v2' AS VARCHAR) AS snapshot,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(ROUND(
           CASE WHEN o_custkey >= m.mx // 8
                 AND o_custkey <  m.mx // 8 + GREATEST(1, m.mx // 25)
                THEN o_totalprice + 50.0 ELSE o_totalprice END * 100, 0)
           AS BIGINT)) AS BIGINT) AS cents
  FROM orders, m
),
v3 AS (
  SELECT CAST('v3' AS VARCHAR) AS snapshot,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(ROUND(
           CASE WHEN o_custkey >= m.mx // 8
                 AND o_custkey <  m.mx // 8 + GREATEST(1, m.mx // 25)
                THEN o_totalprice + 50.0 ELSE o_totalprice END * 100, 0)
           AS BIGINT)) AS BIGINT) AS cents
  FROM orders, m
  WHERE NOT (o_custkey >= (7 * m.mx) // 10
             AND o_custkey < (7 * m.mx) // 10 + GREATEST(1, m.mx // 40))
)
SELECT * FROM v1 UNION ALL SELECT * FROM v2 UNION ALL SELECT * FROM v3
ORDER BY snapshot
""",
)
def orders_snapshot_concurrent_commit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """OPTIMISTIC CONCURRENT COMMIT — the multi-writer half of the
    snapshot story orders_snapshot_cow_read scopes out (its contract
    is single-writer): two writers race to publish against the same
    base snapshot, the loser detects the conflict through the
    manifest CAS and REBASES, and the final chain carries BOTH
    changes — Delta/Iceberg's optimistic commit loop, demonstrated
    with a deterministic scripted interleaving (which is how
    concurrency protocols are demonstrated honestly: the RACE is
    nondeterministic, the protocol's response to every interleaving
    is not).

    Scripted interleaving over operators/snapshots.py:

    1. v1 = orders in 8 immutable customer-range bucket dirs;
       manifest published through try_commit(base=0).
    2. Writer A (price +50 on one customer range) and writer B
       (delete another range) BOTH read v1.
    3. A publishes v2 via try_commit(base=1) — wins.
    4. B, still on base v1, calls try_commit(base=1) → the atomic
       create-if-absent fails → SnapshotConflict (asserted raised).
    5. B rebases: re-reads latest (v2 — which includes A's rewritten
       bucket), re-applies ITS delete on top of v2's current
       directories, publishes v3 via try_commit(base=2). Lost-update
       anomaly avoided by construction: had B overwritten blindly, A's
       update to any shared bucket would vanish.
    6. expire_snapshots(keep_from=2) then drops v1 and garbage-
       collects exactly the directories no retained manifest
       references — v1's superseded pre-images AND B's orphaned
       stale-attempt staging dirs (each set computed directly and
       asserted gone); v2/v3 reads still work (asserted).

    The oracle replays all three snapshots from raw orders (v2 = +A,
    v3 = +A+B), so the versioned read surface — not just the
    mechanics — is hash-certified. Update and delete ranges are
    chosen off MAX(o_custkey) to OVERLAP in bucket space sometimes
    and not others across SFs; correctness never depends on which,
    because rebase re-reads whatever the latest manifest says. At
    100 TB: the CAS is the store's conditional-put, commit cost is
    one manifest create regardless of table size, and retention
    (keep_from) bounds both time-travel depth and storage — the
    module docstring carries the posture."""
    from financial_data_warehouse_automation_spark.operators.snapshots import (
        SnapshotConflict,
        expire_snapshots,
        read_manifest,
        try_commit,
    )
    from financial_data_warehouse_automation_spark.queries._helpers import scratch_dir

    n_buckets = 8
    table = scratch_dir("snapocc_demo_")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.col("o_custkey").alias("ckey"),
    )
    maxck = o.agg(F.max("ckey").alias("m")).collect()[0].m

    fb = F.least(
        F.lit(n_buckets - 1),
        F.floor(F.col("ckey") * n_buckets / (maxck + 1)),
    ).cast("int")
    base = o.withColumn("fb", fb)
    # ONE partitioned write + renames (r15): was an 8-scan loop
    v1_map = {
        str(b): d
        for b, d in _bucketed_dirs_via_one_write(
            base, "fb", n_buckets, table, "b{b}-g1"
        ).items()
    }
    assert try_commit(table, 0, v1_map) == 1

    bucket_of = lambda c: min(n_buckets - 1, c * n_buckets // (maxck + 1))
    upd_lo, upd_hi = maxck // 8, maxck // 8 + max(1, maxck // 25)
    del_lo, del_hi = (7 * maxck) // 10, (7 * maxck) // 10 + max(
        1, maxck // 40
    )
    upd = (F.col("ckey") >= upd_lo) & (F.col("ckey") < upd_hi)
    dele = (F.col("ckey") >= del_lo) & (F.col("ckey") < del_hi)

    # both writers read base v1
    a_base = read_manifest(table, 1)
    b_base = read_manifest(table, 1)

    # writer A: +50 price on its range, COW over its touched buckets
    a_map = dict(a_base)
    for b in sorted({bucket_of(upd_lo), bucket_of(upd_hi - 1)}):
        d2 = os.path.join(table, f"b{b}-g2")
        (
            spark.read.parquet(a_base[str(b)])
            .withColumn(
                "o_totalprice",
                F.when(upd, F.col("o_totalprice") + 50.0).otherwise(
                    F.col("o_totalprice")
                ),
            )
            .write.mode("overwrite")
            .parquet(d2)
        )
        a_map[str(b)] = d2
    assert try_commit(table, 1, a_map) == 2

    # writer B: delete its range — FIRST attempt against the stale base
    def b_rewrite(src_map, gen):
        out = dict(src_map)
        for b in sorted({bucket_of(del_lo), bucket_of(del_hi - 1)}):
            d2 = os.path.join(table, f"b{b}-{gen}")
            (
                spark.read.parquet(src_map[str(b)])
                .where(~dele)
                .write.mode("overwrite")
                .parquet(d2)
            )
            out[str(b)] = d2
        return out

    stale_map = b_rewrite(b_base, "g2b")  # staged against the stale base
    conflicted = False
    try:
        try_commit(table, 1, stale_map)
    except SnapshotConflict:
        conflicted = True
    assert conflicted, "stale-base commit must conflict, not clobber"

    # rebase: re-read latest (carries A's update), re-apply, commit v3
    latest = read_manifest(table)
    assert latest == a_map, "latest must be A's v2"
    assert try_commit(table, 2, b_rewrite(latest, "g3")) == 3

    def agg(version: int, tag: str) -> DataFrame:
        dirs = list(read_manifest(table, version).values())
        return (
            spark.read.parquet(*dirs)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_orders"),
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
                .cast("bigint")
                .alias("cents"),
            )
            .select(F.lit(tag).alias("snapshot"), "n_orders", "cents")
        )

    result = (
        agg(1, "v1").unionByName(agg(2, "v2")).unionByName(agg(3, "v3"))
        .orderBy("snapshot")
    )
    rows = result.collect()  # materialize all three BEFORE expiry

    # retention: drop v1, GC everything no retained manifest references —
    # computed DIRECTLY (r11 advisor: the old 'superseded in v2 OR v3'
    # proxy over-counted v1 dirs still live via v2 and only balanced by
    # accident while the writers' ranges hit disjoint buckets): the
    # expected removals are (a) v1 dirs referenced by neither the v2 nor
    # the v3 manifest, plus (b) B's pre-rebase staged dirs, orphaned the
    # moment its stale commit lost the CAS.
    removed_m, removed_d = expire_snapshots(table, keep_from=2)
    assert removed_m == 1, removed_m
    v3_map = read_manifest(table, 3)
    retained = {os.path.basename(p) for p in a_map.values()} | {
        os.path.basename(p) for p in v3_map.values()
    }
    dead_v1 = {
        os.path.basename(p) for p in v1_map.values()
    } - retained
    g2b_orphans = {
        os.path.basename(p)
        for k, p in stale_map.items()
        if p != b_base[k]
    } - retained
    expected_gone = dead_v1 | g2b_orphans
    assert removed_d == len(expected_gone), (removed_d, expected_gone)
    assert not any(
        os.path.exists(os.path.join(table, n)) for n in expected_gone
    ), expected_gone
    assert agg(2, "v2").collect() and agg(3, "v3").collect()

    return spark.createDataFrame(rows, result.schema)


@query(
    "orders_compaction_snapshot_commit",
    tags=("layout", "maintenance", "compaction", "snapshot", "occ"),
    oracle="""
SELECT CAST('v1_fragmented' AS VARCHAR) AS snapshot,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS cents,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM orders
UNION ALL
SELECT 'v2_compacted', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT),
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT)
FROM orders
ORDER BY snapshot
""",
)
def orders_compaction_snapshot_commit(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """COMPACTION AS A COMMITTED SNAPSHOT OPERATION — the two r11
    capabilities composed (r11 verdict task 4): orders_compaction_rewrite
    rewrites a directory in place, but real table maintenance runs
    OPTIMIZE as an optimistic commit so readers of the current snapshot
    are never disturbed and the fragmented pre-image is reclaimed only
    by retention. Delta OPTIMIZE / Iceberg rewrite_data_files work
    exactly this way: data-identical rewrite + new snapshot + vacuum.

    Script (asserted in-builder; CONTENT certified by the oracle
    emitting identical aggregates for both snapshots — the invariant a
    maintenance job must never break):

    1. v1 — orders in 4 customer-range buckets, each deliberately
       FRAGMENTED 16 ways (the shape streaming appends leave); manifest
       v1 published via the CAS.
    2. OPTIMIZE — each bucket compacted by the size-measured
       compact_parquet_dir into a NEW directory (copy-on-write, never
       in place), published as v2 via try_commit(base=1). File count
       drops from 64 to the size-derived target (asserted).
    3. Isolation — v1's aggregate, collected before the rewrite, equals
       the v1-manifest re-read AFTER the v2 commit (asserted): a reader
       holding the old snapshot never observes maintenance.
    4. Retention — expire_snapshots(keep_from=2) GCs exactly the 4
       fragmented bucket dirs (asserted), after the returned rows are
       materialized; v2 reads survive (asserted).

    At 100 TB: compaction runs per-partition with the cluster's
    preferred file size, the commit is still one manifest create, and
    a compaction that races a data writer simply loses the CAS and
    rebases onto the new head — same loop as any writer."""
    from financial_data_warehouse_automation_spark.operators.snapshots import (
        expire_snapshots,
        read_manifest,
        try_commit,
    )
    from financial_data_warehouse_automation_spark.queries._helpers import scratch_dir

    n_buckets, n_frag = 4, 16
    table = scratch_dir("snapcompact_")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    maxck = o.agg(F.max("o_custkey").alias("m")).collect()[0].m
    fb = F.least(
        F.lit(n_buckets - 1),
        F.floor(F.col("o_custkey") * n_buckets / (maxck + 1)),
    ).cast("int")
    base = o.withColumn("fb", fb)

    # The per-bucket jobs in this demo are independent; overlapping
    # them from a small driver pool back-fills the tail of one job
    # with the next (guide §2.6) — the fragmentation construction
    # itself (exactly n_frag files per bucket via per-bucket
    # repartition) is the demo's subject and stays per-bucket.
    from concurrent.futures import ThreadPoolExecutor

    def frag_write(b: int) -> tuple[str, str]:
        d = os.path.join(table, f"b{b}-frag")
        base.where(F.col("fb") == b).drop("fb").repartition(
            n_frag
        ).write.mode("overwrite").parquet(d)
        assert len(_parquet_parts(d)) == n_frag, d
        return str(b), d

    with ThreadPoolExecutor(max_workers=2) as pool:
        v1_map = dict(pool.map(frag_write, range(n_buckets)))
    assert try_commit(table, 0, v1_map) == 1

    def agg(version: int, tag: str) -> DataFrame:
        dirs = list(read_manifest(table, version).values())
        return (
            spark.read.parquet(*dirs)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
                .cast("bigint")
                .alias("cents"),
                F.countDistinct("o_custkey").cast("long").alias("n_customers"),
            )
            .select(F.lit(tag).alias("snapshot"), "n_rows", "cents",
                    "n_customers")
        )

    v1_before = agg(1, "v1_fragmented").collect()

    # OPTIMIZE: copy-on-write compaction of every bucket, one commit;
    # bucket compactions are independent maintenance jobs — overlapped
    # from the same small pool (guide §2.6)
    def compact_one(b: int) -> tuple[str, str, int, int]:
        src, dst = v1_map[str(b)], os.path.join(table, f"b{b}-compact")
        n_src = len(_parquet_parts(src))
        n_dst = compact_parquet_dir(spark, src, dst)
        return str(b), dst, n_src, n_dst

    with ThreadPoolExecutor(max_workers=2) as pool:
        compacted = list(pool.map(compact_one, range(n_buckets)))
    v2_map = {b: dst for b, dst, _, _ in compacted}
    frag_total = sum(n for _, _, n, _ in compacted)
    comp_total = sum(n for _, _, _, n in compacted)
    assert try_commit(table, 1, v2_map) == 2
    assert comp_total < frag_total, (comp_total, frag_total)

    # isolation: the pre-maintenance snapshot is untouched by OPTIMIZE
    assert agg(1, "v1_fragmented").collect() == v1_before

    result = agg(1, "v1_fragmented").unionByName(
        agg(2, "v2_compacted")
    ).orderBy("snapshot")
    rows = result.collect()  # materialize BEFORE retention reclaims v1

    removed_m, removed_d = expire_snapshots(table, keep_from=2)
    assert (removed_m, removed_d) == (1, n_buckets), (removed_m, removed_d)
    assert not any(os.path.exists(p) for p in v1_map.values())
    assert agg(2, "v2_compacted").collect()  # current snapshot survives

    return spark.createDataFrame(rows, result.schema)


@query(
    "orders_snapshot_changes",
    tags=("snapshot", "cdc", "cdf", "time-travel", "cow"),
    oracle="""
WITH m AS (SELECT MAX(o_custkey) AS mx FROM orders),
upd AS (
  SELECT o_orderkey, o_totalprice FROM orders, m
  WHERE o_custkey >= m.mx // 4
    AND o_custkey <  m.mx // 4 + GREATEST(1, m.mx // 20)
), del AS (
  SELECT o_orderkey, o_totalprice FROM orders, m
  WHERE o_custkey >= (3 * m.mx) // 5
    AND o_custkey <  (3 * m.mx) // 5 + GREATEST(1, m.mx // 50)
)
SELECT CAST('delete' AS VARCHAR) AS change_type, o_orderkey,
       CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
FROM del
UNION ALL
SELECT 'update_preimage', o_orderkey,
       CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
FROM upd
UNION ALL
SELECT 'update_postimage', o_orderkey,
       CAST(ROUND((o_totalprice + 100.0) * 100, 0) AS BIGINT)
FROM upd
ORDER BY o_orderkey, change_type
""",
)
def orders_snapshot_changes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CHANGE DATA FEED between two snapshots (Delta CDF /
    ``table_changes``, Iceberg changelog scan): given the v1 -> v2
    copy-on-write commit, emit every row-level change as
    delete / update_preimage / update_postimage rows — WITHOUT the
    writer having logged anything beyond the two manifests.

    The scale property is the point: the manifest DIFF names the
    buckets whose directories changed (asserted <= 4 of 8 here), so
    the feed is computed by reading ONLY those buckets' pre- and
    post-image dirs and full-outer-joining on the key — cost
    proportional to the CHANGED data, never the table. A 100 TB table
    whose daily commit touches 0.1% of its buckets yields its CDF for
    0.1% of a scan; the join key shuffle is bounded by the changed
    buckets' rows, and unchanged rows inside changed buckets drop out
    of the join's inequality filter.

    Builder: v1 = orders in 8 custkey-range buckets (one partitioned
    write); v2 = the cow_read CDC (+100 price on one narrow range,
    delete another — asserted disjoint, so each key yields one change
    kind); feed = manifest-diff -> pre/post full-outer join ->
    explode into typed change rows. The oracle replays the same CDC
    predicates over raw orders, certifying the feed row-for-row
    (exact integer cents)."""
    from financial_data_warehouse_automation_spark.operators.snapshots import (
        read_manifest,
        try_commit,
    )
    from financial_data_warehouse_automation_spark.queries._helpers import scratch_dir

    n_buckets = 8
    table = scratch_dir("snapcdf_")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", F.col("o_custkey").alias("ckey")
    )
    maxck = o.agg(F.max("ckey").alias("m")).collect()[0].m
    bucket_of = lambda c: min(n_buckets - 1, c * n_buckets // (maxck + 1))
    fb = F.least(
        F.lit(n_buckets - 1),
        F.floor(F.col("ckey") * n_buckets / (maxck + 1)),
    ).cast("int")

    root = os.path.join(table, "g1")
    o.withColumn("pb", fb).write.partitionBy("pb").parquet(root)
    v1_map = {
        n.split("=", 1)[1]: os.path.join(root, n)
        for n in os.listdir(root)
        if n.startswith("pb=")
    }
    assert len(v1_map) == n_buckets, sorted(v1_map)
    assert try_commit(table, 0, v1_map) == 1

    upd_lo, upd_hi = maxck // 4, maxck // 4 + max(1, maxck // 20)
    del_lo, del_hi = (3 * maxck) // 5, (3 * maxck) // 5 + max(1, maxck // 50)
    assert upd_hi <= del_lo, "CDC ranges must be disjoint for typed rows"
    upd = (F.col("ckey") >= upd_lo) & (F.col("ckey") < upd_hi)
    dele = (F.col("ckey") >= del_lo) & (F.col("ckey") < del_hi)

    touched = sorted(
        set(range(bucket_of(upd_lo), bucket_of(upd_hi - 1) + 1))
        | set(range(bucket_of(del_lo), bucket_of(del_hi - 1) + 1))
    )
    assert len(touched) <= 4, touched
    v2_map = dict(v1_map)
    for b in touched:
        d2 = os.path.join(table, f"b{b}-g2")
        (
            spark.read.parquet(v1_map[str(b)])
            .where(~dele)
            .withColumn(
                "o_totalprice",
                F.when(upd, F.col("o_totalprice") + 100.0).otherwise(
                    F.col("o_totalprice")
                ),
            )
            .write.parquet(d2)
        )
        v2_map[str(b)] = d2
    assert try_commit(table, 1, v2_map) == 2

    # the feed reads ONLY the buckets the manifest diff names
    changed = [b for b in v1_map if v2_map[b] != v1_map[b]]
    assert sorted(int(b) for b in changed) == touched, changed
    pre = spark.read.parquet(*[v1_map[b] for b in changed]).select(
        "o_orderkey", F.col("o_totalprice").alias("p_old")
    )
    post = spark.read.parquet(*[v2_map[b] for b in changed]).select(
        "o_orderkey", F.col("o_totalprice").alias("p_new")
    )
    cents_old = F.round(F.col("p_old") * 100, 0).cast("bigint")
    cents_new = F.round(F.col("p_new") * 100, 0).cast("bigint")
    j = pre.join(post, "o_orderkey", "full_outer")
    feed = j.select(
        "o_orderkey",
        F.explode(
            F.when(
                F.col("p_new").isNull(),
                F.array(
                    F.struct(
                        F.lit("delete").alias("change_type"),
                        cents_old.alias("cents"),
                    )
                ),
            )
            .when(
                F.col("p_old").isNull(),
                F.array(
                    F.struct(
                        F.lit("insert").alias("change_type"),
                        cents_new.alias("cents"),
                    )
                ),
            )
            .when(
                F.col("p_old") != F.col("p_new"),
                F.array(
                    F.struct(
                        F.lit("update_preimage").alias("change_type"),
                        cents_old.alias("cents"),
                    ),
                    F.struct(
                        F.lit("update_postimage").alias("change_type"),
                        cents_new.alias("cents"),
                    ),
                ),
            )
            .otherwise(
                F.array().cast(
                    "array<struct<change_type:string,cents:bigint>>"
                )
            )
        ).alias("c"),
    )
    return feed.select(
        F.col("c.change_type").alias("change_type"),
        "o_orderkey",
        F.col("c.cents").alias("cents"),
    )


@query(
    "orders_manifest_stats_prune",
    tags=("snapshot", "layout", "skipping", "stats", "metadata"),
    oracle="""
WITH m AS (SELECT MAX(o_custkey) AS mx FROM orders)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS cents,
       CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers
FROM orders, m
WHERE o_custkey >= m.mx // 3
  AND o_custkey <  m.mx // 3 + GREATEST(1, m.mx // 10)
""",
)
def orders_manifest_stats_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MANIFEST-LEVEL STATS PRUNING — data skipping one layer ABOVE
    parquet footers: the snapshot manifest carries per-bucket min/max
    key stats in a sidecar, and the reader prunes whole BUCKET
    DIRECTORIES from the plan before any file is listed or any footer
    opened. This is Delta's per-file stats in the transaction log /
    Iceberg's manifest-entry bounds; orders_sorted_fileskip proved the
    footer layer, this proves the metadata layer that makes a 100 TB
    table's planning cost O(candidate buckets) instead of O(files) —
    the reader consults a KB-scale JSON, not the object store.

    Builder: orders in 8 custkey-range buckets (one partitioned
    write); a grouped min/max per bucket (8 rows, driver-side) lands
    in stats-v1.json next to manifest-v1.json, both named by the
    version so the stats are as immutable as the snapshot. The probe
    predicate (a ~10%-of-keyspace range off MAX(o_custkey)) selects
    candidate buckets by [min,max] overlap — asserted both fewer than
    the table's 8 AND exactly the set the bucket arithmetic predicts —
    then only those dirs are read, with the residual row filter
    applied on top (stats prune candidates; they never replace the
    predicate). The oracle runs the same range over raw orders: a
    pruned read must be invisible in the answer."""
    from financial_data_warehouse_automation_spark.operators.snapshots import (
        plan_scan,
        try_commit,
        write_sidecar,
    )
    from financial_data_warehouse_automation_spark.queries._helpers import scratch_dir

    n_buckets = 8
    table = scratch_dir("snapstats_")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", F.col("o_custkey").alias("ckey")
    )
    maxck = o.agg(F.max("ckey").alias("m")).collect()[0].m
    fb = F.least(
        F.lit(n_buckets - 1),
        F.floor(F.col("ckey") * n_buckets / (maxck + 1)),
    ).cast("int")

    root = os.path.join(table, "g1")
    o.withColumn("pb", fb).write.partitionBy("pb").parquet(root)
    v1_map = {
        n.split("=", 1)[1]: os.path.join(root, n)
        for n in os.listdir(root)
        if n.startswith("pb=")
    }
    # per-bucket key bounds: one grouped agg, 8 rows of driver-side
    # metadata — the write path already scanned this data, a real
    # writer folds the same bounds out of its write tasks for free
    bounds = {
        str(r.pb): (r.lo, r.hi)
        for r in o.withColumn("pb", fb)
        .groupBy("pb")
        .agg(F.min("ckey").alias("lo"), F.max("ckey").alias("hi"))
        .collect()
    }
    write_sidecar(
        table, 1, "stats", {b: {"ckey": list(bounds[b])} for b in v1_map}
    )
    assert try_commit(table, 0, v1_map) == 1

    lo, hi = maxck // 3, maxck // 3 + max(1, maxck // 10)

    # reader: the shared scan planner (r13) — manifest + stats sidecar
    # -> candidate dirs, no listing of non-candidates, no footer reads
    # anywhere; the explain trace certifies pruning happened HERE
    dirs, trace = plan_scan(
        table, [("range", "ckey", lo, hi)], version=1, explain=True
    )
    cand = trace["after_stats"]
    expected = {
        str(min(n_buckets - 1, c * n_buckets // (maxck + 1)))
        for c in (lo, hi - 1)
    }
    assert set(cand) <= {str(b) for b in range(n_buckets)}
    assert len(cand) < n_buckets, cand
    assert expected <= set(cand), (expected, cand)

    return (
        spark.read.parquet(*dirs)
        .where((F.col("ckey") >= lo) & (F.col("ckey") < hi))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("cents"),
            F.countDistinct("ckey").cast("long").alias("n_customers"),
        )
    )


@query(
    "orders_snapshot_incremental_mv",
    tags=("snapshot", "cdc", "mv", "incremental", "cdf"),
    oracle="""
WITH m AS (SELECT MAX(o_custkey) AS mx FROM orders)
SELECT CAST('v1_base' AS VARCHAR) AS mv, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders GROUP BY o_orderpriority
UNION ALL
SELECT 'v2_incremental', o_orderpriority, CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(ROUND(
         CASE WHEN o_custkey >= m.mx // 4
               AND o_custkey <  m.mx // 4 + GREATEST(1, m.mx // 20)
              THEN o_totalprice + 100.0 ELSE o_totalprice END * 100, 0)
         AS BIGINT)) AS BIGINT)
FROM orders, m
WHERE NOT (o_custkey >= (3 * m.mx) // 5
           AND o_custkey < (3 * m.mx) // 5 + GREATEST(1, m.mx // 50))
GROUP BY o_orderpriority
ORDER BY mv, o_orderpriority
""",
)
def orders_snapshot_incremental_mv(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """INCREMENTAL MATERIALIZED-VIEW MAINTENANCE DRIVEN BY THE CHANGE
    FEED — the capstone composition of the CDF capability: a stored
    aggregate (orders per priority) is refreshed across the v1 -> v2
    snapshot commit by applying SIGNED DELTAS derived from the
    manifest-diff change feed, never rescanning the table —
    delete / update_preimage contribute (-1, -cents) partials,
    update_postimage (+1, +cents), and one re-reduce folds them into
    the stored MV. mv_incremental_refresh proved monoid-merge over
    APPEND-only deltas; this proves the general case: updates and
    deletes, because (count, cents) is an abelian GROUP, not just a
    monoid — subtraction is well-defined, so any CDC stream maintains
    the MV exactly.

    The refresh cost is the scale story: O(changed buckets) to read
    the feed (<= 4 of 8 dirs here, asserted) + a shuffle keyed on the
    MV grain over the DELTA rows only. A 100 TB table's daily MV
    refresh costs its daily churn. The oracle recomputes the v2 MV
    from scratch by replaying the CDC arithmetic over raw orders:
    equality of the incrementally-maintained rows against the full
    rebuild IS the maintenance-correctness proof, certified row-level
    in exact integer cents alongside the v1 base the deltas were
    applied to."""
    from financial_data_warehouse_automation_spark.operators.snapshots import (
        read_manifest,
        try_commit,
    )
    from financial_data_warehouse_automation_spark.queries._helpers import scratch_dir

    n_buckets = 8
    table = scratch_dir("snapimv_")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice",
        F.col("o_custkey").alias("ckey"),
    )
    maxck = o.agg(F.max("ckey").alias("m")).collect()[0].m
    bucket_of = lambda c: min(n_buckets - 1, c * n_buckets // (maxck + 1))
    fb = F.least(
        F.lit(n_buckets - 1),
        F.floor(F.col("ckey") * n_buckets / (maxck + 1)),
    ).cast("int")

    root = os.path.join(table, "g1")
    o.withColumn("pb", fb).write.partitionBy("pb").parquet(root)
    v1_map = {
        n.split("=", 1)[1]: os.path.join(root, n)
        for n in os.listdir(root)
        if n.startswith("pb=")
    }
    assert try_commit(table, 0, v1_map) == 1

    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")

    def mv_over(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(cents).cast("bigint").alias("cents"),
        )

    # the stored MV, computed once over snapshot v1
    base_mv = mv_over(
        spark.read.parquet(*read_manifest(table, 1).values())
    )

    # v2: same CDC as the change-feed demo (+100 on one range, delete
    # another), copy-on-write over the touched buckets
    upd_lo, upd_hi = maxck // 4, maxck // 4 + max(1, maxck // 20)
    del_lo, del_hi = (3 * maxck) // 5, (3 * maxck) // 5 + max(1, maxck // 50)
    upd = (F.col("ckey") >= upd_lo) & (F.col("ckey") < upd_hi)
    dele = (F.col("ckey") >= del_lo) & (F.col("ckey") < del_hi)
    touched = sorted(
        set(range(bucket_of(upd_lo), bucket_of(upd_hi - 1) + 1))
        | set(range(bucket_of(del_lo), bucket_of(del_hi - 1) + 1))
    )
    v2_map = dict(v1_map)
    for b in touched:
        d2 = os.path.join(table, f"b{b}-g2")
        (
            spark.read.parquet(v1_map[str(b)])
            .where(~dele)
            .withColumn(
                "o_totalprice",
                F.when(upd, F.col("o_totalprice") + 100.0).otherwise(
                    F.col("o_totalprice")
                ),
            )
            .write.parquet(d2)
        )
        v2_map[str(b)] = d2
    assert try_commit(table, 1, v2_map) == 2

    # change feed from the manifest diff (changed buckets only)
    changed = [b for b in v1_map if v2_map[b] != v1_map[b]]
    assert 0 < len(changed) <= 4, changed
    cols = ["o_orderkey", "o_orderpriority", "o_totalprice"]
    pre = spark.read.parquet(*[v1_map[b] for b in changed]).select(
        cols[0],
        F.col("o_orderpriority").alias("pri_old"),
        F.col("o_totalprice").alias("p_old"),
    )
    post = spark.read.parquet(*[v2_map[b] for b in changed]).select(
        cols[0],
        F.col("o_orderpriority").alias("pri_new"),
        F.col("o_totalprice").alias("p_new"),
    )
    j = pre.join(post, "o_orderkey", "full_outer")
    sign_cents_old = F.round(F.col("p_old") * 100, 0).cast("bigint")
    sign_cents_new = F.round(F.col("p_new") * 100, 0).cast("bigint")
    delta = (
        j.select(
            F.explode(
                F.when(
                    F.col("p_new").isNull(),  # delete: retract
                    F.array(
                        F.struct(
                            F.col("pri_old").alias("o_orderpriority"),
                            F.lit(-1).cast("long").alias("dn"),
                            (-sign_cents_old).alias("dc"),
                        )
                    ),
                )
                .when(
                    F.col("p_old").isNull(),  # insert: add
                    F.array(
                        F.struct(
                            F.col("pri_new").alias("o_orderpriority"),
                            F.lit(1).cast("long").alias("dn"),
                            sign_cents_new.alias("dc"),
                        )
                    ),
                )
                .when(
                    F.col("p_old") != F.col("p_new"),  # update: retract+add
                    F.array(
                        F.struct(
                            F.col("pri_old").alias("o_orderpriority"),
                            F.lit(-1).cast("long").alias("dn"),
                            (-sign_cents_old).alias("dc"),
                        ),
                        F.struct(
                            F.col("pri_new").alias("o_orderpriority"),
                            F.lit(1).cast("long").alias("dn"),
                            sign_cents_new.alias("dc"),
                        ),
                    ),
                )
                .otherwise(
                    F.array().cast(
                        "array<struct<o_orderpriority:string,"
                        "dn:bigint,dc:bigint>>"
                    )
                )
            ).alias("d")
        )
        .select("d.o_orderpriority", "d.dn", "d.dc")
        .groupBy("o_orderpriority")
        .agg(F.sum("dn").alias("n_orders"), F.sum("dc").alias("cents"))
    )

    # refresh = base MV + signed delta, one re-reduce on the MV grain
    mv2 = (
        base_mv.unionByName(delta)
        .groupBy("o_orderpriority")
        .agg(
            F.sum("n_orders").cast("long").alias("n_orders"),
            F.sum("cents").cast("bigint").alias("cents"),
        )
        .where(F.col("n_orders") > 0)
    )

    def tag(df: DataFrame, t: str) -> DataFrame:
        return df.select(
            F.lit(t).alias("mv"), "o_orderpriority", "n_orders", "cents"
        )

    return (
        tag(base_mv, "v1_base")
        .unionByName(tag(mv2, "v2_incremental"))
    )


@query(
    "orders_wap_audit_publish",
    tags=("snapshot", "wap", "quality", "quarantine", "occ"),
    oracle="""
WITH m AS (SELECT MAX(o_custkey) AS mx FROM orders),
inj AS (
  SELECT o_orderkey + 2000000000 AS o_orderkey,
         CASE WHEN o_orderkey % 3 = 0 THEN NULL
              ELSE o_totalprice END AS o_totalprice
  FROM orders, m
  WHERE o_custkey >= m.mx // 2
    AND o_custkey <  m.mx // 2 + GREATEST(1, m.mx // 30)
), clean AS (
  SELECT * FROM inj WHERE o_totalprice IS NOT NULL
)
SELECT CAST('v1' AS VARCHAR) AS snapshot,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders
UNION ALL
SELECT 'v2', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
FROM (SELECT o_orderkey, o_totalprice FROM orders
      UNION ALL SELECT o_orderkey, o_totalprice FROM clean)
ORDER BY snapshot
""",
)
def orders_wap_audit_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WRITE-AUDIT-PUBLISH — Iceberg's WAP pattern built from this
    repo's own pieces: a batch is STAGED as an unreferenced directory,
    AUDITED by the reference's own data-quality rule (the P3 null
    screen that feeds the quarantine path, operators/ingest.py), and
    only a batch that passes the audit is PUBLISHED through the
    manifest CAS. Readers can never observe unaudited data because
    staging is invisible by construction — a staged dir is exactly the
    'unreferenced young directory' expire_snapshots' min_age_s exists
    to protect, which is the same lifecycle Delta/Iceberg give staged
    branches.

    Script (asserted): v1 = orders committed; a poisoned append batch
    (synthetic re-keyed rows with every 3rd price NULLed) is staged,
    the audit counts its null prices, REJECTS it, and the table head
    is asserted unchanged with the staged dir present-but-unreferenced
    — failure leaves no trace in any reader. The quarantine split then
    salvages the clean rows (the reference's quarantine semantics:
    bad rows diverted, not dropped silently — counts asserted to
    reconcile: clean + quarantined == staged), the clean batch passes
    the same audit, lands as a NEW bucket, and publishes v2. The
    oracle replays both snapshots from raw orders, including the
    injected-batch arithmetic, so the published surface is
    hash-certified; the poisoned batch's rows are certified ABSENT by
    the same hash.

    At 100 TB: the audit is any DataFrame predicate/aggregate over
    the staged dir only (cost = batch, not table), and publish stays
    one manifest create — quality gates scale with the data they
    gate, not the table they protect."""
    from financial_data_warehouse_automation_spark.operators.snapshots import (
        latest_version,
        read_manifest,
        try_commit,
    )
    from financial_data_warehouse_automation_spark.queries._helpers import scratch_dir

    table = scratch_dir("snapwap_")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", F.col("o_custkey").alias("ckey")
    )
    maxck = o.agg(F.max("ckey").alias("m")).collect()[0].m

    d1 = os.path.join(table, "base-g1")
    o.select("o_orderkey", "o_totalprice").write.parquet(d1)
    assert try_commit(table, 0, {"base": d1}) == 1

    # the append batch: deterministic synthetic re-keyed rows with a
    # poisoned price column (every 3rd NULL)
    lo, hi = maxck // 2, maxck // 2 + max(1, maxck // 30)
    inj = (
        o.where((F.col("ckey") >= lo) & (F.col("ckey") < hi))
        .select(
            (F.col("o_orderkey") + 2_000_000_000).alias("o_orderkey"),
            F.when(F.col("o_orderkey") % 3 == 0, F.lit(None)).otherwise(
                F.col("o_totalprice")
            ).alias("o_totalprice"),
        )
    )

    # WRITE: stage the batch as an unreferenced dir
    staged = os.path.join(table, "staged-batch")
    inj.write.parquet(staged)

    # AUDIT: the quality gate runs over the STAGED data only
    def audit_null_prices(path: str) -> int:
        return (
            spark.read.schema("o_orderkey long, o_totalprice double")
            .parquet(path)
            .where(F.col("o_totalprice").isNull())
            .count()
        )

    n_bad = audit_null_prices(staged)
    assert n_bad > 0, "the poisoned batch must trip the audit"
    # REJECT: no commit happens; the table head is untouched and the
    # staged dir stays unreferenced (min_age GC lifecycle)
    assert latest_version(table) == 1
    assert read_manifest(table) == {"base": d1}

    # QUARANTINE SPLIT: salvage the clean rows, divert the bad ones
    staged_df = spark.read.schema(
        "o_orderkey long, o_totalprice double"
    ).parquet(staged)
    clean_dir = os.path.join(table, "staged-clean")
    quar_dir = os.path.join(table, "quarantine")
    staged_df.where(F.col("o_totalprice").isNotNull()).write.parquet(
        clean_dir
    )
    staged_df.where(F.col("o_totalprice").isNull()).write.parquet(quar_dir)
    n_clean = spark.read.parquet(clean_dir).count()
    n_quar = spark.read.parquet(quar_dir).count()
    assert n_clean + n_quar == staged_df.count()
    assert n_quar == n_bad

    # AUDIT passes on the clean batch -> PUBLISH v2
    assert audit_null_prices(clean_dir) == 0
    v2_map = dict(read_manifest(table, 1))
    v2_map["batch1"] = clean_dir
    assert try_commit(table, 1, v2_map) == 2

    def agg(version: int, tag: str) -> DataFrame:
        return (
            spark.read.parquet(*read_manifest(table, version).values())
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
                .cast("bigint")
                .alias("cents"),
            )
            .select(F.lit(tag).alias("snapshot"), "n_rows", "cents")
        )

    return agg(1, "v1").unionByName(agg(2, "v2"))


@query(
    "orders_manifest_bloom_point_lookup",
    tags=("snapshot", "layout", "skipping", "bloom", "metadata",
          "point-lookup"),
    oracle="""
WITH t AS (
  SELECT DISTINCT k FROM (
    SELECT MAX(o_orderkey) AS k FROM orders
    UNION ALL SELECT MIN(o_orderkey) FROM orders
    UNION ALL SELECT MAX(o_orderkey) FROM orders
    WHERE o_orderkey <= (SELECT MAX(o_orderkey) FROM orders) // 2
  )
)
SELECT o.o_orderkey,
       CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT) AS cents
FROM orders o JOIN t ON o.o_orderkey = t.k
ORDER BY o.o_orderkey
""",
)
def orders_manifest_bloom_point_lookup(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PER-BUCKET BLOOM SIDECARS FOR POINT LOOKUPS — the metadata
    layer's second index: orders_manifest_stats_prune's min/max bounds
    prune RANGE predicates on the CLUSTERING column, but a point
    lookup on any OTHER column (here o_orderkey, while buckets are
    custkey ranges) sees min/max spans covering everything. The fix is
    Delta/Iceberg's per-file bloom: each bucket's commit also writes a
    16384-bit/3-hash Bloom filter over its orderkeys into a versioned
    sidecar (packed 32-bit words via the same bit_or partial-agg build
    as orders_bloom_filter_probe — one grouped agg, KB-scale JSON),
    and the reader probes the sidecar with md5 positions computed
    DRIVER-SIDE (hashlib mirrors the engine's md5 exactly) to open
    only matching buckets.

    Three deterministic target keys (max, min, max-below-half — all
    replayed as SQL scalar subqueries) are looked up: the probe
    asserts the candidate dir count is strictly below keys x buckets
    (pruning happened; false positives are allowed, false negatives
    are not — the final count assert would catch one), then reads only
    candidate dirs and filters. At 100 TB this is the difference
    between a needle query opening 3 files and opening 300,000; the
    sidecar is O(buckets) metadata and the probe is pure driver-side
    arithmetic."""
    from financial_data_warehouse_automation_spark.operators.snapshots import (
        plan_scan,
        try_commit,
        write_sidecar,
    )
    from financial_data_warehouse_automation_spark.queries._helpers import scratch_dir

    n_buckets, k_hashes = 8, 3
    table = scratch_dir("snapbloom_")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", F.col("o_custkey").alias("ckey")
    )
    # ONE scan for every whole-table scalar this script needs (r15:
    # was two — maxck/count here, key max/min again further down)
    maxck, n_total, kmax, kmin = o.agg(
        F.max("ckey"), F.count(F.lit(1)),
        F.max("o_orderkey"), F.min("o_orderkey"),
    ).collect()[0]
    # size the filter to the data, as any real per-file bloom does:
    # ~16 bits per expected key per bucket (k=3 -> ~0.5% FP). A FIXED
    # m saturates as the table grows — the sf1 sweep caught exactly
    # that (fill ratio ~1, every bucket a candidate for every key).
    m = 1 << max(14, (16 * n_total // n_buckets).bit_length())
    fb = F.least(
        F.lit(n_buckets - 1),
        F.floor(F.col("ckey") * n_buckets / (maxck + 1)),
    ).cast("int")

    root = os.path.join(table, "g1")
    o.withColumn("pb", fb).write.partitionBy("pb").parquet(root)
    v1_map = {
        n.split("=", 1)[1]: os.path.join(root, n)
        for n in os.listdir(root)
        if n.startswith("pb=")
    }

    # per-bucket packed bloom over o_orderkey: ONE grouped agg builds
    # every bucket's word table (identical hash recipe to
    # orders_bloom_filter_probe so the construction stays replayable)
    hashes = F.explode(
        F.array(*[F.lit(i) for i in range(k_hashes)])
    ).alias("i")
    pos = F.pmod(
        md5_prefix_int(
            F.concat_ws(
                ":", F.col("i").cast("string"),
                F.col("o_orderkey").cast("string"),
            ).cast("binary")
        ),
        F.lit(m),
    )
    words = (
        o.withColumn("pb", fb)
        .select("pb", "o_orderkey", hashes)
        .withColumn("pos", pos)
        .groupBy("pb", F.expr("pos div 32").alias("w"))
        .agg(
            F.expr(
                "bit_or(shiftleft(1L, cast(pos % 32 as int)))"
            ).alias("bits")
        )
        # Arrow transfer (r15): the word table is ~100k rows at sf0.1
        # and row-based collect() materialized every one as a py4j Row;
        # toPandas rides the session's Arrow path (guide §6) and the
        # dict build below iterates C-backed tuples
        .toPandas()
    )
    blooms: dict[str, dict[str, int]] = {str(b): {} for b in range(n_buckets)}
    for pb, w, bits in words.itertuples(index=False):
        blooms[str(pb)][str(w)] = int(bits)
    write_sidecar(table, 1, "bloom", {
        "column": "o_orderkey", "m": m, "k": k_hashes, "buckets": blooms,
    })
    assert try_commit(table, 0, v1_map) == 1

    # deterministic target keys (each replayed as an oracle subquery;
    # kmax/kmin came from the single scalar scan above)
    kmid = (
        o.where(F.col("o_orderkey") <= kmax // 2)
        .agg(F.max("o_orderkey"))
        .collect()[0][0]
    )
    targets = sorted({kmax, kmin, kmid})

    # probe: the shared scan planner (r13) — per-key Bloom pruning is
    # pure driver-side md5 arithmetic against the sidecar
    cand_dirs: set[str] = set()
    n_probe_hits = 0
    for t in targets:
        hit_dirs, trace = plan_scan(
            table, [("in", "o_orderkey", [t])], version=1, explain=True
        )
        assert hit_dirs, f"bloom false negative for key {t}"
        n_probe_hits += len(trace["after_bloom"])
        cand_dirs.update(hit_dirs)
    # pruning must have happened (FPs allowed, full fan-out is a bug)
    assert n_probe_hits < len(targets) * n_buckets, n_probe_hits

    result = (
        spark.read.parquet(*sorted(cand_dirs))
        .where(F.col("o_orderkey").isin(targets))
        .select(
            "o_orderkey",
            F.round(F.col("o_totalprice") * 100, 0)
            .cast("bigint")
            .alias("cents"),
        )
        .orderBy("o_orderkey")
    )
    rows = result.collect()
    assert len(rows) == len(targets), (len(rows), targets)
    return spark.createDataFrame(rows, result.schema)


@query(
    "orders_snapshot_rollback",
    tags=("snapshot", "restore", "time-travel", "maintenance"),
    oracle="""
WITH m AS (SELECT MAX(o_custkey) AS mx FROM orders),
v1 AS (
  SELECT CAST('v1' AS VARCHAR) AS snapshot,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders
),
v2 AS (
  SELECT CAST('v2' AS VARCHAR), CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CAST(ROUND(
           CASE WHEN o_custkey >= m.mx // 4
                 AND o_custkey <  m.mx // 4 + GREATEST(1, m.mx // 20)
                THEN o_totalprice + 100.0 ELSE o_totalprice END * 100, 0)
           AS BIGINT)) AS BIGINT)
  FROM orders, m
  WHERE NOT (o_custkey >= (3 * m.mx) // 5
             AND o_custkey < (3 * m.mx) // 5 + GREATEST(1, m.mx // 50))
),
v3 AS (
  SELECT CAST('v3_restored' AS VARCHAR), CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
  FROM orders
)
SELECT * FROM v1 UNION ALL SELECT * FROM v2 UNION ALL SELECT * FROM v3
ORDER BY snapshot
""",
)
def orders_snapshot_rollback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLBACK AS A FORWARD COMMIT (Delta RESTORE / Iceberg
    rollback): undoing a bad CDC batch publishes a NEW version whose
    manifest simply re-references the old version's directories —
    zero bytes copied (asserted: no new data dirs appear), history
    preserved (the bad v2 stays time-travelable for the post-mortem),
    and the restore itself goes through the same CAS as any writer,
    so it cannot clobber a concurrent commit.

    The subtle interaction this query pins is RESTORE x RETENTION:
    after restoring v1-as-v3, expire_snapshots(keep_from=3) drops the
    v1 and v2 manifests — but v1's data directories all SURVIVE
    because the retained v3 manifest references them (asserted
    per-dir); the GC reclaims exactly v2's CDC rewrites (asserted).
    A GC that tracked 'directories of expired versions' instead of
    'directories referenced by no retained manifest' would delete the
    restored table's live data here — the reference-counting
    semantics, not the version arithmetic, are what make restore
    safe.

    The oracle replays v1, the CDC v2, and the restored v3 (== v1's
    aggregate) from raw orders. At 100 TB: restore cost is one
    manifest create regardless of how much the bad batch touched —
    the undo button is O(1)."""
    from financial_data_warehouse_automation_spark.operators.snapshots import (
        expire_snapshots,
        read_manifest,
        try_commit,
    )
    from financial_data_warehouse_automation_spark.queries._helpers import scratch_dir

    n_buckets = 8
    table = scratch_dir("snaprestore_")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", F.col("o_custkey").alias("ckey")
    )
    maxck = o.agg(F.max("ckey").alias("m")).collect()[0].m
    bucket_of = lambda c: min(n_buckets - 1, c * n_buckets // (maxck + 1))
    fb = F.least(
        F.lit(n_buckets - 1),
        F.floor(F.col("ckey") * n_buckets / (maxck + 1)),
    ).cast("int")

    root = os.path.join(table, "g1")
    o.withColumn("pb", fb).write.partitionBy("pb").parquet(root)
    v1_map = {
        n.split("=", 1)[1]: os.path.join(root, n)
        for n in os.listdir(root)
        if n.startswith("pb=")
    }
    assert try_commit(table, 0, v1_map) == 1

    # the "bad" CDC batch lands as v2 (same arithmetic the oracle replays)
    upd_lo, upd_hi = maxck // 4, maxck // 4 + max(1, maxck // 20)
    del_lo, del_hi = (3 * maxck) // 5, (3 * maxck) // 5 + max(1, maxck // 50)
    upd = (F.col("ckey") >= upd_lo) & (F.col("ckey") < upd_hi)
    dele = (F.col("ckey") >= del_lo) & (F.col("ckey") < del_hi)
    touched = sorted(
        set(range(bucket_of(upd_lo), bucket_of(upd_hi - 1) + 1))
        | set(range(bucket_of(del_lo), bucket_of(del_hi - 1) + 1))
    )
    v2_map = dict(v1_map)
    for b in touched:
        d2 = os.path.join(table, f"b{b}-g2")
        (
            spark.read.parquet(v1_map[str(b)])
            .where(~dele)
            .withColumn(
                "o_totalprice",
                F.when(upd, F.col("o_totalprice") + 100.0).otherwise(
                    F.col("o_totalprice")
                ),
            )
            .write.parquet(d2)
        )
        v2_map[str(b)] = d2
    assert try_commit(table, 1, v2_map) == 2

    # RESTORE: v3 = v1's mapping republished — no data movement at all
    dirs_before = {n for n in os.listdir(table) if
                   os.path.isdir(os.path.join(table, n))}
    assert try_commit(table, 2, dict(v1_map)) == 3
    dirs_after = {n for n in os.listdir(table) if
                  os.path.isdir(os.path.join(table, n))}
    assert dirs_after == dirs_before, "restore must not copy data"
    assert read_manifest(table, 3) == v1_map

    def agg(version: int, tag: str) -> DataFrame:
        return (
            spark.read.parquet(*read_manifest(table, version).values())
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
                .cast("bigint")
                .alias("cents"),
            )
            .select(F.lit(tag).alias("snapshot"), "n_rows", "cents")
        )

    result = (
        agg(1, "v1")
        .unionByName(agg(2, "v2"))
        .unionByName(agg(3, "v3_restored"))
        .orderBy("snapshot")
    )
    rows = result.collect()  # materialize before retention

    # RESTORE x RETENTION: expiring v1/v2 must keep every v1 dir alive
    # (v3 references them) and reclaim exactly v2's CDC rewrites
    removed_m, removed_d = expire_snapshots(table, keep_from=3)
    assert removed_m == 2, removed_m
    cdc_dirs = {os.path.basename(v2_map[str(b)]) for b in touched}
    assert removed_d == len(cdc_dirs), (removed_d, cdc_dirs)
    assert all(os.path.exists(p) for p in v1_map.values())
    assert not any(
        os.path.exists(os.path.join(table, n)) for n in cdc_dirs
    )

    return spark.createDataFrame(rows, result.schema)


@query(
    "warehouse_mv_atomic_commit",
    tags=("snapshot", "mv", "transaction", "multi-table", "occ"),
    oracle="""
WITH m AS (SELECT MAX(o_custkey) AS mx FROM orders)
SELECT CAST('v1' AS VARCHAR) AS version, o_orderpriority,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders GROUP BY o_orderpriority
UNION ALL
SELECT 'v2', o_orderpriority, CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(ROUND(
         CASE WHEN o_custkey >= m.mx // 6
               AND o_custkey <  m.mx // 6 + GREATEST(1, m.mx // 30)
              THEN o_totalprice + 50.0 ELSE o_totalprice END * 100, 0)
         AS BIGINT)) AS BIGINT)
FROM orders, m GROUP BY o_orderpriority
ORDER BY version, o_orderpriority
""",
)
def warehouse_mv_atomic_commit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MULTI-TABLE ATOMIC COMMIT — a base table and its materialized
    view published as ONE transaction, so no reader can ever observe
    base vN next to MV vN-1 (the stale-MV anomaly every warehouse
    with derived tables fights; Iceberg needs a catalog-level
    multi-table transaction for this, Delta cannot express it per-log).
    The construction is this repo's snapshot store applied one level
    up: the TRANSACTION manifest's "buckets" are TABLES — mapping
    {'base': <base data dir>, 'mv': <mv data dir>} — and the same CAS
    that arbitrates bucket commits arbitrates cross-table atomicity.
    One mechanism, two granularities.

    Atomicity is demonstrated the only honest way: after BOTH v2 data
    directories are fully staged on disk, a reader resolving through
    txn v1 is asserted to still see the OLD base AND the OLD mv
    (consistent pair); only the single manifest create makes both new
    dirs visible together. The invariant a reader actually cares
    about — MV == groupBy(base) EXACTLY — is asserted at every
    version, and the oracle replays both versions' MVs from raw
    orders (v2 = +50 price CDC on a custkey range), so the published
    pair's consistency is hash-certified.

    At 100 TB: base and MV stage through their own (bucketed,
    dynamic-partition) writes; the transaction is still one manifest
    create naming each table's new root — commit cost independent of
    either table's size."""
    from financial_data_warehouse_automation_spark.operators.snapshots import (
        read_manifest,
        try_commit,
    )
    from financial_data_warehouse_automation_spark.queries._helpers import scratch_dir

    table = scratch_dir("snaptxn_")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice",
        F.col("o_custkey").alias("ckey"),
    )
    maxck = o.agg(F.max("ckey").alias("m")).collect()[0].m
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")

    def mv_of(df: DataFrame) -> DataFrame:
        return df.groupBy("o_orderpriority").agg(
            F.count(F.lit(1)).cast("long").alias("n_orders"),
            F.sum(cents).cast("bigint").alias("cents"),
        )

    def stage(df: DataFrame, gen: str) -> dict[str, str]:
        base_d = os.path.join(table, f"base-{gen}")
        mv_d = os.path.join(table, f"mv-{gen}")
        df.write.parquet(base_d)
        mv_of(spark.read.parquet(base_d)).write.parquet(mv_d)
        return {"base": base_d, "mv": mv_d}

    assert try_commit(table, 0, stage(o, "g1")) == 1

    def read_pair(version: int) -> tuple[DataFrame, DataFrame]:
        mani = read_manifest(table, version)
        return (
            spark.read.parquet(mani["base"]),
            spark.read.parquet(mani["mv"]),
        )

    def consistent(version: int) -> list:
        base, mv = read_pair(version)
        got = sorted(map(tuple, mv.collect()))
        want = sorted(map(tuple, mv_of(base).collect()))
        assert got == want, f"MV inconsistent with base at v{version}"
        return got

    mv1_rows = consistent(1)

    # CDC: +50 on a custkey range; STAGE both new dirs fully...
    upd = (F.col("ckey") >= maxck // 6) & (
        F.col("ckey") < maxck // 6 + max(1, maxck // 30)
    )
    v2_stage = stage(
        o.withColumn(
            "o_totalprice",
            F.when(upd, F.col("o_totalprice") + 50.0).otherwise(
                F.col("o_totalprice")
            ),
        ),
        "g2",
    )
    # ...and assert a txn-v1 reader still sees the OLD consistent pair
    assert consistent(1) == mv1_rows
    assert read_manifest(table, 1)["base"].endswith("base-g1")

    # the single CAS makes base+mv visible TOGETHER
    assert try_commit(table, 1, v2_stage) == 2
    consistent(2)

    def tagged(version: int, tag: str) -> DataFrame:
        return read_pair(version)[1].select(
            F.lit(tag).alias("version"), "o_orderpriority", "n_orders",
            "cents",
        )

    return (
        tagged(1, "v1")
        .unionByName(tagged(2, "v2"))
    )


@query(
    "orders_partition_spec_evolution",
    tags=("snapshot", "layout", "partition-evolution", "skipping",
          "metadata"),
    oracle="""
WITH m AS (SELECT MAX(o_custkey) AS mx FROM orders)
SELECT CAST('year_probe' AS VARCHAR) AS probe,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1999
UNION ALL
SELECT 'ckey_probe', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
FROM orders, m
WHERE o_custkey >= m.mx // 5
  AND o_custkey <  m.mx // 5 + GREATEST(1, m.mx // 15)
ORDER BY probe
""",
)
def orders_partition_spec_evolution(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """PARTITION-SPEC EVOLUTION WITHOUT REWRITE — Iceberg's signature
    metadata trick, impossible with Hive-style path partitioning: the
    table STARTS custkey-range-bucketed (spec A), later loads adopt a
    year-bucketed layout (spec B), and NO old data is rewritten —
    the snapshot commits a mixed-spec manifest whose sidecar records
    each bucket's OWN spec, and the reader prunes EACH BUCKET BY ITS
    OWN SPEC:

    - a year predicate prunes the spec-B portion to exactly its year
      bucket but cannot prune spec-A buckets (custkey bounds say
      nothing about years) — reads all 4 old + 1 of 4 new (asserted);
    - a custkey predicate prunes the spec-A portion to the 1-2
      overlapping range buckets but reads all 4 spec-B buckets —
      the mirror image (asserted).

    Both probes return the same answers a full scan would (the oracle
    runs both predicates over raw orders) — spec-aware pruning is a
    pure I/O optimization, never a semantics change. At 100 TB this
    is what makes changing a 5-year-old table's partitioning an
    O(metadata) decision instead of a 5-year rewrite: new data gets
    the better layout immediately, old data keeps serving under its
    original spec, and compaction (orders_compaction_snapshot_commit)
    migrates old buckets opportunistically if ever worth it."""
    from financial_data_warehouse_automation_spark.operators.snapshots import (
        plan_scan,
        try_commit,
        write_sidecar,
    )
    from financial_data_warehouse_automation_spark.queries._helpers import scratch_dir

    n_ck = 4
    table = scratch_dir("snapspec_")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice",
        F.col("o_custkey").alias("ckey"),
        F.year("o_orderdate").cast("int").alias("oyear"),
    )
    maxck = o.agg(F.max("ckey").alias("m")).collect()[0].m
    ck_width = (maxck + 1) / n_ck
    fb = F.least(
        F.lit(n_ck - 1), F.floor(F.col("ckey") * n_ck / (maxck + 1))
    ).cast("int")

    # v1: the ORIGINAL table (loads through 1997) under spec A
    old = o.where(F.col("oyear") <= 1997)
    root_a = os.path.join(table, "specA")
    old.withColumn("pb", fb).write.partitionBy("pb").parquet(root_a)
    spec: dict[str, dict] = {}
    v1_map: dict[str, str] = {}
    for n in os.listdir(root_a):
        if not n.startswith("pb="):
            continue
        b = int(n.split("=", 1)[1])
        bid = f"c{b}"
        v1_map[bid] = os.path.join(root_a, n)
        spec[bid] = {
            "column": "ckey",
            "lo": int(b * ck_width),
            "hi": int((b + 1) * ck_width) if b < n_ck - 1 else maxck + 1,
        }
    write_sidecar(table, 1, "spec", spec)
    assert try_commit(table, 0, v1_map) == 1

    # spec change: 1998+ loads land YEAR-bucketed; old data untouched
    new = o.where(F.col("oyear") >= 1998)
    root_b = os.path.join(table, "specB")
    new.withColumn("py", F.col("oyear")).write.partitionBy("py").parquet(
        root_b
    )
    v2_map = dict(v1_map)
    for n in os.listdir(root_b):
        if not n.startswith("py="):
            continue
        y = int(n.split("=", 1)[1])
        bid = f"y{y}"
        v2_map[bid] = os.path.join(root_b, n)
        spec[bid] = {"column": "oyear", "value": y}
    write_sidecar(table, 2, "spec", spec)
    assert try_commit(table, 1, v2_map) == 2
    assert all(v2_map[b] == v1_map[b] for b in v1_map)  # zero rewrite

    # spec-aware reader: the shared scan planner (r13) prunes each
    # bucket BY ITS OWN spec — a year predicate cannot prune spec-A
    # buckets, a custkey predicate cannot prune spec-B buckets, and
    # the explain trace certifies both directions
    n_old, n_new = len(v1_map), len(v2_map) - len(v1_map)

    year_dirs, year_trace = plan_scan(
        table, [("in", "oyear", [1999])], version=2, explain=True
    )
    year_cand = year_trace["after_spec"]
    assert len(year_cand) == n_old + 1, (year_cand, n_old)

    lo, hi = maxck // 5, maxck // 5 + max(1, maxck // 15)
    ck_dirs, ck_trace = plan_scan(
        table, [("range", "ckey", lo, hi)], version=2, explain=True
    )
    ck_cand = ck_trace["after_spec"]
    n_a_hit = len([b for b in ck_cand if b.startswith("c")])
    assert n_a_hit < n_old and n_a_hit >= 1, ck_cand
    assert len(ck_cand) == n_a_hit + n_new, ck_cand

    def agg(dirs: list[str], pred, tag: str) -> DataFrame:
        return (
            spark.read.parquet(*dirs)
            .where(pred)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
                .cast("bigint")
                .alias("cents"),
            )
            .select(F.lit(tag).alias("probe"), "n_rows", "cents")
        )

    return (
        agg(ck_dirs, (F.col("ckey") >= lo) & (F.col("ckey") < hi),
            "ckey_probe")
        .unionByName(agg(year_dirs, F.col("oyear") == 1999, "year_probe"))
    )


@query(
    "orders_scan_planner_composed",
    tags=("snapshot", "metadata", "skipping", "planner", "spec", "stats",
          "bloom"),
    oracle="""
WITH mk AS (SELECT MAX(o_orderkey) // 2 AS half FROM orders),
tgt AS (SELECT MAX(o_orderkey) AS k FROM orders, mk
        WHERE o_orderkey <= mk.half)
SELECT CAST('point_probe' AS VARCHAR) AS probe,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders, tgt WHERE o_orderkey = tgt.k
UNION ALL
SELECT 'year_probe', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) = 1999
ORDER BY probe
""",
)
def orders_scan_planner_composed(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """THE MANIFEST-NATIVE SCAN PLANNER, ALL LAYERS IN ONE READ PATH
    (r12 verdict task 2): spec pruning, column-stats pruning, and
    per-bucket Bloom pruning were three separate r12 demos, each
    hand-rolling its own bucket selection; real table formats run them
    as ONE planner every reader goes through (Iceberg ``planFiles``:
    partition pruning -> manifest-entry bounds -> dictionary/bloom;
    Delta data skipping likewise). operators/snapshots.plan_scan is
    that planner, and this query drives a table where EVERY layer has
    distinct work to do:

    - the table is spec-EVOLVED (4 custkey-range buckets hold the
      pre-1998 history, year buckets hold 1998+), with a stats sidecar
      (per-bucket min/max of ckey, oyear, o_orderkey) and a Bloom
      sidecar (per-bucket packed filter over o_orderkey);
    - the YEAR probe shows spec+stats composing: the spec layer keeps
      the matching year bucket but CANNOT prune the 4 range buckets
      (their spec says nothing about years) — the stats layer then
      kills all 4, because their observed oyear max is 1997. Candidate
      chain asserted 8 -> 5 -> 1.
    - the POINT probe (a mid-keyspace orderkey) shows why Bloom earns
      its bytes: spec prunes nothing (no bucket is keyed on orderkey)
      and min/max stats are useless for a mid-range key (every
      bucket's observed span contains it), so only the Bloom layer
      collapses the fan-out — asserted strictly smaller than the
      stats survivors.

    Both probes' answers are hash-certified against raw orders (the
    planner may only change WHAT IS READ, never the result), and the
    residual row filter always runs on top of the pruned read. At
    100 TB this one planner is the table's entire point-lookup and
    partition-elimination story: O(buckets) JSON consulted on the
    driver, then only surviving directories touched."""
    from financial_data_warehouse_automation_spark.operators.snapshots import (
        plan_scan,
        try_commit,
        write_sidecar,
    )
    from financial_data_warehouse_automation_spark.queries._helpers import scratch_dir

    n_ck, k_hashes = 4, 3
    table = scratch_dir("snapplan_")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice",
        F.col("o_custkey").alias("ckey"),
        F.year("o_orderdate").cast("int").alias("oyear"),
    )
    # ONE scan for every whole-table scalar the script needs (r15:
    # kmax was a separate agg further down)
    maxck, n_total, kmax = o.agg(
        F.max("ckey"), F.count(F.lit(1)), F.max("o_orderkey")
    ).collect()[0]
    ck_width = (maxck + 1) / n_ck
    fb = F.least(
        F.lit(n_ck - 1), F.floor(F.col("ckey") * n_ck / (maxck + 1))
    ).cast("int")
    # bucket id under the table's MIXED spec: pre-1998 rows live in
    # custkey-range buckets c0..c3, 1998+ rows in year buckets y<YYYY>
    bid = F.when(
        F.col("oyear") <= 1997, F.concat(F.lit("c"), fb.cast("string"))
    ).otherwise(F.concat(F.lit("y"), F.col("oyear").cast("string")))

    # ONE partitioned write on the mixed-spec bucket id builds both
    # spec families' dirs (r15: was two writes = two full scans; the
    # bid partition column is the dropped copy, so data files keep
    # ckey AND oyear exactly as the two-write form did)
    root = os.path.join(table, "data")
    o.withColumn("bid", bid).write.partitionBy("bid").parquet(root)

    mapping: dict[str, str] = {}
    spec: dict[str, dict] = {}
    for n in os.listdir(root):
        if not n.startswith("bid="):
            continue
        b_id = n.split("=", 1)[1]
        mapping[b_id] = os.path.join(root, n)
        if b_id.startswith("c"):
            b = int(b_id[1:])
            spec[b_id] = {
                "column": "ckey",
                "lo": int(b * ck_width),
                "hi": int((b + 1) * ck_width) if b < n_ck - 1 else maxck + 1,
            }
        else:
            spec[b_id] = {"column": "oyear", "value": int(b_id[1:])}

    # stats sidecar: ONE grouped agg -> per-bucket observed bounds for
    # every prunable column (a real writer folds these out of its
    # write tasks for free)
    stats = {
        r.bid: {
            "ckey": [r.cklo, r.ckhi],
            "oyear": [r.ylo, r.yhi],
            "o_orderkey": [r.klo, r.khi],
        }
        for r in o.withColumn("bid", bid).groupBy("bid").agg(
            F.min("ckey").alias("cklo"), F.max("ckey").alias("ckhi"),
            F.min("oyear").alias("ylo"), F.max("oyear").alias("yhi"),
            F.min("o_orderkey").alias("klo"),
            F.max("o_orderkey").alias("khi"),
        ).collect()
    }

    # bloom sidecar over o_orderkey: same packed-word partial-agg
    # build as orders_manifest_bloom_point_lookup, sized ~16 bits/key
    m = 1 << max(14, (16 * n_total // len(mapping)).bit_length())
    hashes = F.explode(
        F.array(*[F.lit(i) for i in range(k_hashes)])
    ).alias("i")
    pos = F.pmod(
        md5_prefix_int(
            F.concat_ws(
                ":", F.col("i").cast("string"),
                F.col("o_orderkey").cast("string"),
            ).cast("binary")
        ),
        F.lit(m),
    )
    blooms: dict[str, dict[str, int]] = {b: {} for b in mapping}
    for bid_v, w, bits in (
        o.withColumn("bid", bid)
        .select("bid", "o_orderkey", hashes)
        .withColumn("pos", pos)
        .groupBy("bid", F.expr("pos div 32").alias("w"))
        .agg(F.expr(
            "bit_or(shiftleft(1L, cast(pos % 32 as int)))"
        ).alias("bits"))
        # Arrow transfer of the ~100k-row word table (r15; same as
        # orders_manifest_bloom_point_lookup)
        .toPandas().itertuples(index=False)
    ):
        blooms[bid_v][str(w)] = int(bits)

    write_sidecar(table, 1, "spec", spec)
    write_sidecar(table, 1, "stats", stats)
    write_sidecar(table, 1, "bloom", {
        "column": "o_orderkey", "m": m, "k": k_hashes, "buckets": blooms,
    })
    assert try_commit(table, 0, mapping) == 1
    n_old = sum(1 for b in mapping if b.startswith("c"))

    # YEAR probe: spec keeps c* (cannot prune) + the one year bucket;
    # stats then kill every c* bucket (observed oyear max == 1997)
    year_dirs, tr = plan_scan(
        table, [("in", "oyear", [1999])], version=1, explain=True
    )
    assert len(tr["buckets"]) == len(mapping)
    assert len(tr["after_spec"]) == n_old + 1, tr
    assert tr["after_stats"] == ["y1999"], tr
    assert tr["after_bloom"] == ["y1999"], tr  # bloom: nothing to add

    # POINT probe: a mid-keyspace orderkey — spec prunes nothing,
    # stats prune (at most) the tails, Bloom collapses the fan-out
    # (kmax came from the single scalar scan above)
    kmid = (
        o.where(F.col("o_orderkey") <= kmax // 2)
        .agg(F.max("o_orderkey"))
        .collect()[0][0]
    )
    point_dirs, tr2 = plan_scan(
        table, [("in", "o_orderkey", [kmid])], version=1, explain=True
    )
    assert tr2["after_spec"] == tr2["buckets"], tr2  # spec: no signal
    assert point_dirs, "bloom false negative"
    assert len(tr2["after_bloom"]) < len(tr2["after_stats"]), tr2

    cents = F.sum(
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    ).cast("bigint").alias("cents")
    n_rows = F.count(F.lit(1)).cast("long").alias("n_rows")
    year_probe = (
        spark.read.parquet(*year_dirs)
        .where(F.col("oyear") == 1999)          # residual filter
        .agg(n_rows, cents)
        .select(F.lit("year_probe").alias("probe"), "n_rows", "cents")
    )
    point_probe = (
        spark.read.parquet(*point_dirs)
        .where(F.col("o_orderkey") == kmid)     # residual filter
        .agg(n_rows, cents)
        .select(F.lit("point_probe").alias("probe"), "n_rows", "cents")
    )
    return point_probe.unionByName(year_probe)


@query(
    "orders_deletion_vector_merge_on_read",
    tags=("snapshot", "delete", "merge-on-read", "dv", "metadata"),
    oracle="""
WITH m AS (SELECT MAX(o_custkey) AS mx FROM orders),
kept AS (
  SELECT o_totalprice FROM orders, m
  WHERE NOT (o_custkey >= (3 * m.mx) // 5
             AND o_custkey <  (3 * m.mx) // 5 + GREATEST(1, m.mx // 50))
)
SELECT CAST('v1_full' AS VARCHAR) AS snapshot,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders
UNION ALL
SELECT 'v2_dv', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
FROM kept
UNION ALL
SELECT 'v3_compacted', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
FROM kept
ORDER BY snapshot
""",
)
def orders_deletion_vector_merge_on_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DELETION VECTORS — MERGE-ON-READ ROW DELETES WITHOUT REWRITE
    (Iceberg v2 equality deletes / Delta deletion vectors): the r12
    snapshot store deleted rows by COW-rewriting every affected
    bucket; a small DELETE on a 100 TB table must not pay GBs of
    write amplification for KBs of intent. v2 commits the delete as
    an EQUALITY-DELETE SIDECAR — the doomed keys, per bucket — and
    the manifest's bucket mapping is asserted BYTE-IDENTICAL to v1:
    zero data files written, commit cost = one KB-scale JSON + one
    manifest create.

    Correctness is carried by the ONE read path: read_snapshot
    (operators/snapshots.py) applies any version's delete vector as a
    broadcast-sized anti-filter, so every reader — this query, the
    planner demos, time travel — sees deletes without knowing they
    exist. v3 then runs the standard migration: compaction APPLIES the
    vector (rewrites only the affected buckets minus their doomed
    keys, asserted <= 2 of 8), commits WITHOUT a sidecar, and the
    oracle certifies v2 == v3 row-for-row — merge-on-read and
    copy-on-write are two physical encodings of the same table state,
    exchanged at the writer's convenience (read-heavy tables compact
    early, write-heavy tables accumulate DVs).

    The DV is deliberately key-based (equality deletes), not
    positional: position deletes need stable row ordinals, which
    parquet-over-object-store only guarantees per file — at the
    bucket grain the key form is the robust one, and the keys here
    are collected driver-side because a DV is by definition small
    (a big DELETE should COW — the writer picks per commit)."""
    from financial_data_warehouse_automation_spark.operators.snapshots import (
        read_manifest,
        read_snapshot,
        try_commit,
        write_sidecar,
    )
    from financial_data_warehouse_automation_spark.queries._helpers import scratch_dir

    n_buckets = 8
    table = scratch_dir("snapdv_")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", F.col("o_custkey").alias("ckey")
    )
    maxck = o.agg(F.max("ckey").alias("m")).collect()[0].m
    bucket_of = lambda c: min(n_buckets - 1, c * n_buckets // (maxck + 1))
    fb = F.least(
        F.lit(n_buckets - 1),
        F.floor(F.col("ckey") * n_buckets / (maxck + 1)),
    ).cast("int")

    root = os.path.join(table, "g1")
    o.withColumn("pb", fb).write.partitionBy("pb").parquet(root)
    v1_map = {
        n.split("=", 1)[1]: os.path.join(root, n)
        for n in os.listdir(root)
        if n.startswith("pb=")
    }
    assert try_commit(table, 0, v1_map) == 1

    # v2: DELETE as a deletion vector — zero data rewrite
    del_lo, del_hi = (3 * maxck) // 5, (3 * maxck) // 5 + max(1, maxck // 50)
    dele = (F.col("ckey") >= del_lo) & (F.col("ckey") < del_hi)
    touched = list(range(bucket_of(del_lo), bucket_of(del_hi - 1) + 1))
    assert len(touched) <= 2, touched
    doomed = {
        str(b): sorted(
            r.o_orderkey
            for r in spark.read.parquet(v1_map[str(b)]).where(dele)
            .select("o_orderkey").collect()
        )
        for b in touched
    }
    assert any(doomed.values()), "delete range selected nothing"
    write_sidecar(table, 2, "deletes", {
        "column": "o_orderkey", "buckets": doomed,
    })
    assert try_commit(table, 1, dict(v1_map)) == 2
    assert read_manifest(table, 2) == v1_map  # zero rewrite, by manifest

    # v3: compaction applies the DV and drops it — only touched
    # buckets rewrite; everything else is shared with v1/v2
    v3_map = dict(v1_map)
    for b in touched:
        d3 = os.path.join(table, f"b{b}-g3")
        spark.read.parquet(v1_map[str(b)]).where(~dele).write.parquet(d3)
        v3_map[str(b)] = d3
    assert try_commit(table, 2, v3_map) == 3
    shared = [b for b in v1_map if v3_map[b] == v1_map[b]]
    assert len(shared) == n_buckets - len(touched), shared

    def agg(version: int, tag: str) -> DataFrame:
        return read_snapshot(spark, table, version=version).agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint")
            .alias("cents"),
        ).select(F.lit(tag).alias("snapshot"), "n_rows", "cents")

    return (
        agg(1, "v1_full")
        .unionByName(agg(2, "v2_dv"))
        .unionByName(agg(3, "v3_compacted"))
    )


@query(
    "orders_schema_evolution_snapshot",
    tags=("snapshot", "schema-evolution", "rename", "add-column",
          "metadata"),
    oracle="""
WITH old AS (
  SELECT o_orderkey,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) <= 1997
), new AS (
  SELECT o_orderpriority AS priority,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents
  FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) >= 1998
)
SELECT CAST('v2_renamed' AS VARCHAR) AS snapshot,
       CAST('(all)' AS VARCHAR) AS priority,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM old
UNION ALL
SELECT 'v3_added', '(none)', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(cents) AS BIGINT)
FROM old
UNION ALL
SELECT 'v3_added', priority, CAST(COUNT(*) AS BIGINT),
       CAST(SUM(cents) AS BIGINT)
FROM new GROUP BY priority
ORDER BY snapshot, priority
""",
)
def orders_schema_evolution_snapshot(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SCHEMA EVOLUTION VIA COLUMN MAPPING — RENAME and ADD COLUMN as
    metadata-only commits (Iceberg field-id mapping / Delta column
    mapping): physical parquet columns are stable field names
    (f1, f2, …); the LOGICAL schema lives in a versioned sidecar that
    maps logical names to fields, so renaming a column rebinds a name
    (zero rewrite — the v2 manifest is asserted identical to v1) and
    adding one just means old buckets lack the new field and read
    NULL for it (zero rewrite of history).

    Timeline: v1 = the pre-1998 history in 4 custkey buckets with
    logical schema (o_orderkey, price_cents); v2 = RENAME price_cents
    -> revenue_cents (new sidecar, same buckets byte-for-byte); v3 =
    ADD COLUMN priority arriving WITH the 1998+ load (only the new
    bucket physically carries f3).

    The reader (operators/snapshots.read_snapshot_evolved) groups
    buckets by physical field signature — one multi-dir read per
    schema GENERATION, not per bucket — projects each group to the
    version's logical names with NULL-fill, and unions (zero
    shuffle). The oracle replays both reads from raw orders: v2's
    totals under the NEW name must equal the old data (rename changed
    nothing but the name), and v3 groups by the added column with the
    entire pre-1998 history surfacing as '(none)' — exactly the
    old-rows-read-NULL contract. In-builder, v1 is also read under
    the ORIGINAL name to pin that history replays with period-correct
    schemas. At 100 TB: both evolutions cost one sidecar + one
    manifest create; the 5-year-old history is never rewritten."""
    from financial_data_warehouse_automation_spark.operators.snapshots import (
        read_manifest,
        read_snapshot_evolved,
        try_commit,
        write_sidecar,
    )
    from financial_data_warehouse_automation_spark.queries._helpers import scratch_dir

    n_ck = 4
    table = scratch_dir("snapschema_")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority",
        F.col("o_custkey").alias("ckey"),
        F.year("o_orderdate").cast("int").alias("oyear"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("cents"),
    )
    maxck = o.agg(F.max("ckey").alias("m")).collect()[0].m
    fb = F.least(
        F.lit(n_ck - 1), F.floor(F.col("ckey") * n_ck / (maxck + 1))
    ).cast("int")

    # v1: history under physical fields f1/f2, logical names v1-era
    root = os.path.join(table, "g1")
    (
        o.where(F.col("oyear") <= 1997)
        .select(
            F.col("o_orderkey").alias("f1"), F.col("cents").alias("f2"),
            fb.alias("pb"),
        )
        .write.partitionBy("pb").parquet(root)
    )
    v1_map = {
        f"c{n.split('=', 1)[1]}": os.path.join(root, n)
        for n in os.listdir(root)
        if n.startswith("pb=")
    }
    sig_old = {b: ["f1", "f2"] for b in v1_map}
    write_sidecar(table, 1, "schema", {
        "fields": {"o_orderkey": "f1", "price_cents": "f2"},
        "buckets": sig_old,
    })
    assert try_commit(table, 0, v1_map) == 1

    # v2: RENAME price_cents -> revenue_cents (metadata-only)
    write_sidecar(table, 2, "schema", {
        "fields": {"o_orderkey": "f1", "revenue_cents": "f2"},
        "buckets": sig_old,
    })
    assert try_commit(table, 1, dict(v1_map)) == 2
    assert read_manifest(table, 2) == v1_map  # zero rewrite

    # v3: ADD COLUMN priority, arriving with the 1998+ load only
    d_new = os.path.join(table, "g3-new")
    (
        o.where(F.col("oyear") >= 1998)
        .select(
            F.col("o_orderkey").alias("f1"), F.col("cents").alias("f2"),
            F.col("o_orderpriority").alias("f3"),
        )
        .write.parquet(d_new)
    )
    v3_map = dict(v1_map)
    v3_map["new98"] = d_new
    write_sidecar(table, 3, "schema", {
        "fields": {"o_orderkey": "f1", "revenue_cents": "f2",
                   "priority": "f3"},
        "buckets": {**sig_old, "new98": ["f1", "f2", "f3"]},
    })
    assert try_commit(table, 2, v3_map) == 3

    # history replays under its period-correct logical schema
    v1_read = read_snapshot_evolved(spark, table, version=1)
    assert v1_read.columns == ["o_orderkey", "price_cents"], v1_read.columns

    v2_read = read_snapshot_evolved(spark, table, version=2)
    assert v2_read.columns == ["o_orderkey", "revenue_cents"]
    v2_rows = v2_read.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("revenue_cents").cast("bigint").alias("cents"),
    ).select(
        F.lit("v2_renamed").alias("snapshot"),
        F.lit("(all)").alias("priority"), "n_rows", "cents",
    )

    v3_rows = (
        read_snapshot_evolved(spark, table, version=3)
        .groupBy(F.coalesce(F.col("priority"), F.lit("(none)"))
                 .alias("priority"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("revenue_cents").cast("bigint").alias("cents"),
        )
        .select(F.lit("v3_added").alias("snapshot"), "priority", "n_rows",
                "cents")
    )
    return v2_rows.unionByName(v3_rows)


@query(
    "orders_branch_wap_fastforward",
    tags=("snapshot", "branch", "wap", "fast-forward", "metadata"),
    oracle="""
WITH m AS (SELECT MAX(o_custkey) AS mx FROM orders),
v2 AS (
  SELECT CASE WHEN o_custkey >= m.mx // 4
               AND o_custkey <  m.mx // 4 + GREATEST(1, m.mx // 20)
              THEN o_totalprice + 100.0 ELSE o_totalprice END AS p
  FROM orders, m
)
SELECT CAST('branch_head' AS VARCHAR) AS snapshot,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(p * 100, 0) AS BIGINT)) AS BIGINT) AS cents
FROM v2
UNION ALL
SELECT 'main_v1', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
FROM orders
UNION ALL
SELECT 'main_v2', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(ROUND(p * 100, 0) AS BIGINT)) AS BIGINT)
FROM v2
ORDER BY snapshot
""",
)
def orders_branch_wap_fastforward(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SNAPSHOT BRANCHES — WRITE-AUDIT-PUBLISH ON A BRANCH, PROMOTED
    BY FAST-FORWARD (Iceberg branch refs + the WAP pattern as its
    docs describe it): r12's orders_wap_audit_publish staged ONE
    unreferenced directory; a real audit pipeline wants a whole
    VERSIONED LINE of work main never sees — multiple commits,
    re-runs, its own history — and that is a branch: an independent
    manifest chain (``manifest-<branch>-v<N>.json``) over the same
    CAS, created at main's head for zero copy (create_branch).

    Script: main v1 = 8 custkey buckets. Branch 'etl' is cut at v1
    (asserted: no new data dirs). The risky CDC (+100 on a custkey
    range) lands as branch commit v2 — COW over only its touched
    buckets — while MAIN IS ASSERTED BYTE-UNTOUCHED (same head, same
    mapping, same aggregate). The audit runs against the branch head;
    it passes, and main FAST-FORWARDS: one ordinary CAS commit whose
    mapping IS the branch head's (asserted identical — promotion
    moves zero bytes). A second branch 'bad' stages a POISONED batch
    (nulled keys); its audit fails, drop_branch abandons the line,
    and expire_snapshots reclaims exactly the poisoned directory
    (asserted) while everything main/etl reference survives — branch
    refs pin their data until dropped, exactly Iceberg's ref-aware
    GC.

    r14 additions (the r13 verdict's task 4): branch-aware TIME
    TRAVEL — as_of_version(branch=...) resolves an instant against
    the branch's OWN snapshot log (a probe between the cut and the
    CDC lands on the branch point, "now" on the branch head) — and
    PER-BRANCH RETENTION — expire_snapshots(branch_keep_from=...)
    trims a branch's history with the same clamp-to-head rail as
    main, asserted to leave main's history and every branch-
    referenced data directory untouched (expiring one ref never
    breaks another).

    At 100 TB: a branch is one manifest file; cutting, committing to,
    promoting, and dropping it are all O(metadata). The oracle
    replays main's v1 and the promoted v2 (== branch head) from raw
    orders."""
    import time as _time

    from financial_data_warehouse_automation_spark.operators.snapshots import (
        as_of_version,
        create_branch,
        drop_branch,
        expire_snapshots,
        latest_version,
        read_manifest,
        try_commit,
    )
    from financial_data_warehouse_automation_spark.queries._helpers import scratch_dir

    n_buckets = 8
    table = scratch_dir("snapbranch_")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", F.col("o_custkey").alias("ckey")
    )
    maxck = o.agg(F.max("ckey").alias("m")).collect()[0].m
    bucket_of = lambda c: min(n_buckets - 1, c * n_buckets // (maxck + 1))
    fb = F.least(
        F.lit(n_buckets - 1),
        F.floor(F.col("ckey") * n_buckets / (maxck + 1)),
    ).cast("int")

    root = os.path.join(table, "g1")
    o.withColumn("pb", fb).write.partitionBy("pb").parquet(root)
    v1_map = {
        n.split("=", 1)[1]: os.path.join(root, n)
        for n in os.listdir(root)
        if n.startswith("pb=")
    }
    assert try_commit(table, 0, v1_map) == 1

    def agg_of(mapping: dict[str, str]) -> tuple:
        r = spark.read.parquet(*mapping.values()).agg(
            F.count(F.lit(1)),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")),
        ).collect()[0]
        return (r[0], r[1])

    main_v1_agg = agg_of(v1_map)
    dirs_before = {n for n in os.listdir(table) if os.path.isdir(
        os.path.join(table, n))}

    # cut the branch at main's head: zero copy
    assert create_branch(table, "etl") == 1
    assert read_manifest(table, branch="etl") == v1_map
    assert {n for n in os.listdir(table) if os.path.isdir(
        os.path.join(table, n))} == dirs_before
    ts_after_cut = _time.time()  # instant between etl v1 and etl v2

    # the risky CDC lands on the BRANCH (COW over touched buckets)
    upd_lo, upd_hi = maxck // 4, maxck // 4 + max(1, maxck // 20)
    upd = (F.col("ckey") >= upd_lo) & (F.col("ckey") < upd_hi)
    etl_map = dict(v1_map)
    for b in range(bucket_of(upd_lo), bucket_of(upd_hi - 1) + 1):
        d2 = os.path.join(table, f"b{b}-etl")
        (
            spark.read.parquet(v1_map[str(b)])
            .withColumn(
                "o_totalprice",
                F.when(upd, F.col("o_totalprice") + 100.0).otherwise(
                    F.col("o_totalprice")
                ),
            )
            .write.parquet(d2)
        )
        etl_map[str(b)] = d2
    assert try_commit(table, 1, etl_map, branch="etl") == 2

    # main is byte-untouched while the branch carries the work
    assert latest_version(table) == 1
    assert read_manifest(table) == v1_map
    assert agg_of(read_manifest(table)) == main_v1_agg

    # audit the branch head; it passes -> FAST-FORWARD main
    branch_head = read_manifest(table, branch="etl")
    n_nulls = (
        spark.read.parquet(*branch_head.values())
        .where(F.col("o_orderkey").isNull()).count()
    )
    assert n_nulls == 0
    assert try_commit(table, 1, dict(branch_head)) == 2
    assert read_manifest(table, 2) == branch_head  # promotion: 0 bytes

    # a second branch stages POISON; audit fails; the line is dropped
    # and GC reclaims exactly its staged directory
    assert create_branch(table, "bad", from_version=2) == 1
    d_bad = os.path.join(table, "b0-bad")
    spark.read.parquet(branch_head["0"]).withColumn(
        "o_orderkey", F.lit(None).cast("long")
    ).write.parquet(d_bad)
    bad_map = dict(branch_head)
    bad_map["0"] = d_bad
    assert try_commit(table, 1, bad_map, branch="bad") == 2
    poisoned = (
        spark.read.parquet(*read_manifest(table, branch="bad").values())
        .where(F.col("o_orderkey").isNull()).count()
    )
    assert poisoned > 0  # audit fails -> never fast-forwarded
    drop_branch(table, "bad")
    # the dropped line's staged dir is unreferenced by every surviving
    # manifest (main v1/v2, etl v1/v2) -> GC reclaims exactly it, and
    # nothing a live ref names (retention keeps all of main's history)
    removed_m, removed_d = expire_snapshots(table, keep_from=1)
    assert (removed_m, removed_d) == (0, 1), (removed_m, removed_d)
    assert not os.path.exists(d_bad)
    assert all(os.path.exists(d) for d in branch_head.values())
    assert agg_of(read_manifest(table, 1)) == main_v1_agg

    # r14: branch-aware TIME TRAVEL — the branch has its OWN snapshot
    # log, so an instant between the cut and the CDC resolves to the
    # branch point while "now" resolves to the branch head (Iceberg:
    # per-ref snapshot history); main's log is consulted separately
    assert as_of_version(table, ts_after_cut, branch="etl") == 1
    assert as_of_version(table, _time.time(), branch="etl") == 2
    assert as_of_version(table, ts_after_cut) == 1  # main's own log

    # r14: PER-BRANCH RETENTION — an audit re-run republishes the
    # branch head as etl v3, then a branch retention policy trims the
    # branch's own history (clamped to its head, same rail as main)
    # while main's history — already at keep_from=1, i.e. keep all —
    # and every data directory the branch references stay untouched:
    # expiring main never breaks an unpromoted branch and vice versa
    assert try_commit(table, 2, dict(etl_map), branch="etl") == 3
    removed_m, removed_d = expire_snapshots(
        table, keep_from=1, branch_keep_from={"etl": 99}
    )
    assert (removed_m, removed_d) == (2, 0), (removed_m, removed_d)
    assert latest_version(table, "etl") == 3
    assert read_manifest(table, branch="etl") == etl_map
    assert all(os.path.exists(d) for d in etl_map.values())
    assert latest_version(table) == 2
    assert read_manifest(table, 1) == v1_map

    def agg(mapping: dict[str, str], tag: str) -> DataFrame:
        return spark.read.parquet(*mapping.values()).agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint").alias("cents"),
        ).select(F.lit(tag).alias("snapshot"), "n_rows", "cents")

    return (
        agg(read_manifest(table, branch="etl"), "branch_head")
        .unionByName(agg(read_manifest(table, 1), "main_v1"))
        .unionByName(agg(read_manifest(table, 2), "main_v2"))
    )


@query(
    "orders_shallow_clone_divergence",
    tags=("snapshot", "clone", "zero-copy", "gc", "metadata"),
    oracle="""
WITH m AS (SELECT MAX(o_custkey) AS mx FROM orders)
SELECT CAST('clone_head' AS VARCHAR) AS snapshot,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders, m
WHERE NOT (o_custkey >= (3 * m.mx) // 5
           AND o_custkey <  (3 * m.mx) // 5 + GREATEST(1, m.mx // 50))
UNION ALL
SELECT 'source_head', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(ROUND(
         CASE WHEN o_custkey >= m.mx // 4
               AND o_custkey <  m.mx // 4 + GREATEST(1, m.mx // 20)
              THEN o_totalprice + 100.0 ELSE o_totalprice END * 100, 0)
         AS BIGINT)) AS BIGINT)
FROM orders, m
ORDER BY snapshot
""",
)
def orders_shallow_clone_divergence(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """ZERO-COPY SHALLOW CLONE with independent evolution and the
    GC fence the pattern requires (Delta SHALLOW CLONE / Iceberg
    metadata-only table copy): a clone is a NEW TABLE whose v1
    manifest references the SOURCE's data directories — creating a
    full writable copy of a 100 TB table costs one KB-scale JSON
    (asserted: the clone dir contains zero data directories).

    Both tables then diverge: the clone deletes a custkey range (COW
    into the CLONE's own dirs — its unchanged buckets still point
    into the source, asserted), while the source applies a +100
    update to a disjoint range. Each table's head is oracle-replayed
    from raw orders, so cross-contamination in either direction would
    hash-fail.

    Then the part every shallow-clone doc warns about, made explicit:
    after the source's COW update, the source's OWN retention no
    longer needs its v1 image of the updated buckets — but the CLONE
    still reads them. The builder asserts the hazard is real (those
    dirs are dead to every SOURCE manifest yet live to the clone),
    then runs the source's expire_snapshots WITH the clone's live set
    as the ``extra_live`` fence — the shared dirs survive (asserted)
    and the clone still serves its exact rows. This is Delta's
    "don't VACUUM below a shallow clone's horizon" contract as an
    enforced parameter instead of a footnote; production systems
    track clone refs in a catalog and build the fence automatically."""
    from financial_data_warehouse_automation_spark.operators.snapshots import (
        expire_snapshots,
        read_manifest,
        try_commit,
    )
    from financial_data_warehouse_automation_spark.queries._helpers import scratch_dir

    n_buckets = 8
    work = scratch_dir("snapclone_")
    src_t = os.path.join(work, "source")
    clone_t = os.path.join(work, "clone")
    os.makedirs(src_t)
    os.makedirs(clone_t)
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", F.col("o_custkey").alias("ckey")
    )
    maxck = o.agg(F.max("ckey").alias("m")).collect()[0].m
    bucket_of = lambda c: min(n_buckets - 1, c * n_buckets // (maxck + 1))
    fb = F.least(
        F.lit(n_buckets - 1),
        F.floor(F.col("ckey") * n_buckets / (maxck + 1)),
    ).cast("int")

    root = os.path.join(src_t, "g1")
    o.withColumn("pb", fb).write.partitionBy("pb").parquet(root)
    v1_map = {
        n.split("=", 1)[1]: os.path.join(root, n)
        for n in os.listdir(root)
        if n.startswith("pb=")
    }
    assert try_commit(src_t, 0, v1_map) == 1

    # the clone: one manifest, zero data — a new table born at v1
    assert try_commit(
        clone_t, 0, v1_map, meta={"_cloned_from": src_t}
    ) == 1
    assert not any(
        os.path.isdir(os.path.join(clone_t, n)) for n in os.listdir(clone_t)
    )

    # clone diverges: DELETE a range, COW into the CLONE's own dirs
    del_lo, del_hi = (3 * maxck) // 5, (3 * maxck) // 5 + max(1, maxck // 50)
    dele = (F.col("ckey") >= del_lo) & (F.col("ckey") < del_hi)
    c_map = dict(v1_map)
    for b in range(bucket_of(del_lo), bucket_of(del_hi - 1) + 1):
        d = os.path.join(clone_t, f"b{b}-c2")
        spark.read.parquet(v1_map[str(b)]).where(~dele).write.parquet(d)
        c_map[str(b)] = d
    assert try_commit(clone_t, 1, c_map) == 2
    shared = [b for b in v1_map if c_map[b] == v1_map[b]]
    assert len(shared) >= n_buckets - 2  # unchanged buckets still shared

    # source diverges on a DISJOINT range: +100 update, COW in source
    upd_lo, upd_hi = maxck // 4, maxck // 4 + max(1, maxck // 20)
    upd = (F.col("ckey") >= upd_lo) & (F.col("ckey") < upd_hi)
    upd_buckets = [
        str(b) for b in range(bucket_of(upd_lo), bucket_of(upd_hi - 1) + 1)
    ]
    s_map = dict(v1_map)
    for b in upd_buckets:
        d = os.path.join(src_t, f"b{b}-s2")
        (
            spark.read.parquet(v1_map[b])
            .withColumn(
                "o_totalprice",
                F.when(upd, F.col("o_totalprice") + 100.0).otherwise(
                    F.col("o_totalprice")
                ),
            )
            .write.parquet(d)
        )
        s_map[b] = d
    assert try_commit(src_t, 1, s_map) == 2

    # the hazard, demonstrated: after source retention, the updated
    # buckets' v1 dirs are dead to EVERY source manifest...
    clone_live = set(read_manifest(clone_t).values())
    at_risk = [v1_map[b] for b in upd_buckets]
    assert all(d not in s_map.values() for d in at_risk)
    # ...but the clone still reads them
    assert all(d in clone_live for d in at_risk)

    # the fence: source GC runs WITH the clone's live set
    removed_m, removed_d = expire_snapshots(
        src_t, keep_from=2, extra_live=clone_live
    )
    assert removed_m == 1 and removed_d == 0
    assert all(os.path.exists(d) for d in at_risk)

    def agg(table: str, tag: str) -> DataFrame:
        return spark.read.parquet(
            *read_manifest(table).values()
        ).agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint").alias("cents"),
        ).select(F.lit(tag).alias("snapshot"), "n_rows", "cents")

    return (
        agg(src_t, "source_head")
        .unionByName(agg(clone_t, "clone_head"))
    )


@query(
    "orders_snapshot_describe_history",
    tags=("snapshot", "history", "audit", "metadata", "lineage"),
    oracle="""
WITH m AS (SELECT MAX(o_custkey) AS mx FROM orders),
b AS (
  SELECT LEAST(7, (mx // 4) * 8 // (mx + 1)) AS ub_lo,
         LEAST(7, (mx // 4 + GREATEST(1, mx // 20) - 1) * 8 // (mx + 1))
           AS ub_hi,
         LEAST(7, ((3 * mx) // 5) * 8 // (mx + 1)) AS db_lo,
         LEAST(7, ((3 * mx) // 5 + GREATEST(1, mx // 50) - 1) * 8
               // (mx + 1)) AS db_hi
  FROM m
),
v2 AS (
  SELECT CASE WHEN o_custkey >= m.mx // 4
               AND o_custkey <  m.mx // 4 + GREATEST(1, m.mx // 20)
              THEN o_totalprice + 100.0 ELSE o_totalprice END AS p
  FROM orders, m
  WHERE NOT (o_custkey >= (3 * m.mx) // 5
             AND o_custkey <  (3 * m.mx) // 5 + GREATEST(1, m.mx // 50))
)
SELECT CAST(1 AS INT) AS version, CAST(1000 AS BIGINT) AS committed_at,
       CAST('loader' AS VARCHAR) AS writer,
       CAST(8 AS INT) AS n_buckets, CAST(8 AS INT) AS n_added,
       CAST(0 AS INT) AS n_removed, CAST(0 AS INT) AS n_repointed,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         AS cents
FROM orders
UNION ALL
SELECT 2, 2000, 'cdc', 8, 0, 0,
       CAST((b.ub_hi - b.ub_lo + 1) + (b.db_hi - b.db_lo + 1) AS INT),
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(ROUND(p * 100, 0) AS BIGINT)) AS BIGINT)
FROM v2, b GROUP BY b.ub_lo, b.ub_hi, b.db_lo, b.db_hi
UNION ALL
SELECT 3, 3000, 'maintenance', 1, 1, 8, 0,
       CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(ROUND(p * 100, 0) AS BIGINT)) AS BIGINT)
FROM v2
ORDER BY version
""",
)
def orders_snapshot_describe_history(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """DESCRIBE HISTORY — the commit-log audit surface every lakehouse
    exposes (Delta ``DESCRIBE HISTORY`` / Iceberg's ``snapshots``
    metadata table), built from nothing but the store's own persisted
    metadata: operators/snapshots.table_history walks the retained
    manifest chain and emits, per version, the commit instant
    (``_committed_at``), the writer, and the MANIFEST DIFF against
    the previous version (bucket ids added / removed / re-pointed) —
    one KB-scale JSON read per version, independent of table size.

    The scripted history exercises all three diff kinds: v1 = the
    initial load (writer 'loader', 8 buckets ADDED); v2 = a CDC
    update+delete (writer 'cdc', only the touched buckets
    RE-POINTED — count asserted equal to the bucket arithmetic, which
    the oracle independently derives from raw data with the same
    floor math); v3 = full compaction (writer 'maintenance', 1 bucket
    added, 8 removed, content identical to v2 — the history shows a
    maintenance commit as pure layout).

    Each history row also carries that version's CONTENT audit
    (row count + exact cents read through its manifest), so the
    returned frame certifies both halves: the metadata story (who
    committed what, when, touching which buckets) and the data story
    (what each version actually held) — and the DuckDB oracle replays
    BOTH from raw orders, including the touched-bucket arithmetic.
    The per-version reads share v1's untouched buckets via the COW
    manifests, so the audit costs one logical pass over live data,
    not one per version."""
    from financial_data_warehouse_automation_spark.operators.snapshots import (
        read_manifest,
        table_history,
        try_commit,
    )
    from financial_data_warehouse_automation_spark.queries._helpers import scratch_dir

    n_buckets = 8
    table = scratch_dir("snaphist_")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", F.col("o_custkey").alias("ckey")
    )
    maxck = o.agg(F.max("ckey").alias("m")).collect()[0].m
    bucket_of = lambda c: min(n_buckets - 1, c * n_buckets // (maxck + 1))
    fb = F.least(
        F.lit(n_buckets - 1),
        F.floor(F.col("ckey") * n_buckets / (maxck + 1)),
    ).cast("int")

    root = os.path.join(table, "g1")
    o.withColumn("pb", fb).write.partitionBy("pb").parquet(root)
    v1_map = {
        n.split("=", 1)[1]: os.path.join(root, n)
        for n in os.listdir(root)
        if n.startswith("pb=")
    }
    assert try_commit(
        table, 0, v1_map,
        meta={"_committed_at": 1000.0, "_writer": "loader"},
    ) == 1

    upd_lo, upd_hi = maxck // 4, maxck // 4 + max(1, maxck // 20)
    del_lo, del_hi = (3 * maxck) // 5, (3 * maxck) // 5 + max(1, maxck // 50)
    upd = (F.col("ckey") >= upd_lo) & (F.col("ckey") < upd_hi)
    dele = (F.col("ckey") >= del_lo) & (F.col("ckey") < del_hi)
    ubs = set(range(bucket_of(upd_lo), bucket_of(upd_hi - 1) + 1))
    dbs = set(range(bucket_of(del_lo), bucket_of(del_hi - 1) + 1))
    assert not (ubs & dbs)  # the oracle's touched-count sum needs this
    v2_map = dict(v1_map)
    for b in sorted(ubs | dbs):
        d2 = os.path.join(table, f"b{b}-g2")
        (
            spark.read.parquet(v1_map[str(b)])
            .where(~dele)
            .withColumn(
                "o_totalprice",
                F.when(upd, F.col("o_totalprice") + 100.0).otherwise(
                    F.col("o_totalprice")
                ),
            )
            .write.parquet(d2)
        )
        v2_map[str(b)] = d2
    assert try_commit(
        table, 1, v2_map,
        meta={"_committed_at": 2000.0, "_writer": "cdc"},
    ) == 2

    d3 = os.path.join(table, "compact-g3")
    spark.read.parquet(*v2_map.values()).coalesce(4).write.parquet(d3)
    assert try_commit(
        table, 2, {"all": d3},
        meta={"_committed_at": 3000.0, "_writer": "maintenance"},
    ) == 3

    hist = table_history(table)
    assert [h["version"] for h in hist] == [1, 2, 3]
    assert hist[1]["repointed"] == sorted(
        str(b) for b in (ubs | dbs)
    ), hist[1]
    assert (hist[2]["added"], hist[2]["removed"]) == (["all"],
                                                      sorted(v1_map))

    parts = []
    for h in hist:
        parts.append(
            spark.read.parquet(
                *read_manifest(table, h["version"]).values()
            ).agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(
                    F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
                ).cast("bigint").alias("cents"),
            ).select(
                F.lit(h["version"]).cast("int").alias("version"),
                F.lit(int(h["committed_at"])).cast("long")
                .alias("committed_at"),
                F.lit(h["writer"]).alias("writer"),
                F.lit(h["n_buckets"]).cast("int").alias("n_buckets"),
                F.lit(len(h["added"])).cast("int").alias("n_added"),
                F.lit(len(h["removed"])).cast("int").alias("n_removed"),
                F.lit(len(h["repointed"])).cast("int")
                .alias("n_repointed"),
                "n_rows",
                "cents",
            )
        )
    out = parts[0]
    for pt in parts[1:]:
        out = out.unionByName(pt)
    return out


@query(
    "orders_snapshot_as_of",
    tags=("snapshot", "time-travel", "as-of", "metadata"),
    oracle="""
WITH m AS (SELECT MAX(o_custkey) AS mx FROM orders),
t1 AS (
  SELECT CAST('t1' AS VARCHAR) AS probe,
         CAST(COUNT(*) AS BIGINT) AS n_rows,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders
),
t2 AS (
  SELECT CAST('t2' AS VARCHAR), CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CAST(ROUND(
           CASE WHEN o_custkey >= m.mx // 4
                 AND o_custkey <  m.mx // 4 + GREATEST(1, m.mx // 20)
                THEN o_totalprice + 100.0 ELSE o_totalprice END * 100, 0)
           AS BIGINT)) AS BIGINT)
  FROM orders, m
),
t3 AS (
  SELECT CAST('t3' AS VARCHAR), CAST(COUNT(*) AS BIGINT),
         CAST(SUM(CAST(ROUND(
           CASE WHEN o_custkey >= m.mx // 4
                 AND o_custkey <  m.mx // 4 + GREATEST(1, m.mx // 20)
                THEN o_totalprice + 100.0 ELSE o_totalprice END * 100, 0)
           AS BIGINT)) AS BIGINT)
  FROM orders, m
  WHERE NOT (o_custkey >= (3 * m.mx) // 5
             AND o_custkey < (3 * m.mx) // 5 + GREATEST(1, m.mx // 50))
)
SELECT * FROM t1 UNION ALL SELECT * FROM t2 UNION ALL SELECT * FROM t3
ORDER BY probe
""",
)
def orders_snapshot_as_of(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME TRAVEL BY TIMESTAMP (Delta ``timestampAsOf`` / Iceberg
    snapshot-log lookup): "what did the table look like last Tuesday"
    resolves a wall-clock instant to the highest snapshot whose
    manifest was PUBLISHED at or before it — pure metadata arithmetic
    over the commit log's own timestamps. r13 (r12 advisor): the
    instant is PERSISTED INSIDE the manifest JSON (``_committed_at``,
    stamped by ``try_commit``), not read off file mtime — a table
    copy/restore/rsync that rewrites mtimes, or a clock step between
    commits, can no longer silently rewrite or reorder the
    time-travel history; mtime remains only as the legacy-manifest
    fallback.

    Determinism for the oracle: the demo commits the three versions
    with pinned instants (t=1000/2000/3000, passed as commit meta the
    way a replayed history carries its original times), then probes
    BETWEEN commits (t=1500 ->
    v1), ON a commit boundary (t=2000 -> v2, inclusive — the reader
    that asks "as of the commit instant" sees that commit), and
    AFTER head (t=9999 -> v3 == latest); a probe BEFORE the first
    commit raises (asserted) — there was no table then, and an empty
    frame would be a silent wrong answer. Each resolved snapshot's
    aggregate is hash-certified by the oracle replaying the version
    chain (v1 = orders, v2 = +100 CDC, v3 = v2 minus the deleted
    range). At 100 TB the resolution cost is one listing of O(versions)
    manifest names — independent of data size, like every other
    metadata operation in this store."""
    from financial_data_warehouse_automation_spark.operators.snapshots import (
        as_of_version,
        read_manifest,
        try_commit,
    )
    from financial_data_warehouse_automation_spark.queries._helpers import scratch_dir

    n_buckets = 8
    table = scratch_dir("snapasof_")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", F.col("o_custkey").alias("ckey")
    )
    maxck = o.agg(F.max("ckey").alias("m")).collect()[0].m
    bucket_of = lambda c: min(n_buckets - 1, c * n_buckets // (maxck + 1))
    fb = F.least(
        F.lit(n_buckets - 1),
        F.floor(F.col("ckey") * n_buckets / (maxck + 1)),
    ).cast("int")

    root = os.path.join(table, "g1")
    o.withColumn("pb", fb).write.partitionBy("pb").parquet(root)
    v1_map = {
        n.split("=", 1)[1]: os.path.join(root, n)
        for n in os.listdir(root)
        if n.startswith("pb=")
    }
    assert try_commit(table, 0, v1_map,
                      meta={"_committed_at": 1000.0}) == 1

    upd_lo, upd_hi = maxck // 4, maxck // 4 + max(1, maxck // 20)
    del_lo, del_hi = (3 * maxck) // 5, (3 * maxck) // 5 + max(1, maxck // 50)
    upd = (F.col("ckey") >= upd_lo) & (F.col("ckey") < upd_hi)
    dele = (F.col("ckey") >= del_lo) & (F.col("ckey") < del_hi)

    # v2: the +100 update, COW on its buckets
    v2_map = dict(v1_map)
    for b in range(bucket_of(upd_lo), bucket_of(upd_hi - 1) + 1):
        d2 = os.path.join(table, f"b{b}-g2")
        (
            spark.read.parquet(v1_map[str(b)])
            .withColumn(
                "o_totalprice",
                F.when(upd, F.col("o_totalprice") + 100.0).otherwise(
                    F.col("o_totalprice")
                ),
            )
            .write.parquet(d2)
        )
        v2_map[str(b)] = d2
    assert try_commit(table, 1, v2_map,
                      meta={"_committed_at": 2000.0}) == 2

    # v3: the delete, COW on its buckets
    v3_map = dict(v2_map)
    for b in range(bucket_of(del_lo), bucket_of(del_hi - 1) + 1):
        d3 = os.path.join(table, f"b{b}-g3")
        spark.read.parquet(v2_map[str(b)]).where(~dele).write.parquet(d3)
        v3_map[str(b)] = d3
    assert try_commit(
        table, 2, v3_map, meta={"_committed_at": 3000.0}
    ) == 3

    assert as_of_version(table, 1500.0) == 1   # between commits
    assert as_of_version(table, 2000.0) == 2   # boundary: inclusive
    assert as_of_version(table, 9999.0) == 3   # after head == latest
    predates = False
    try:
        as_of_version(table, 500.0)
    except ValueError:
        predates = True
    assert predates, "pre-history probe must raise, not read nothing"

    def agg(ts: float, tag: str) -> DataFrame:
        v = as_of_version(table, ts)
        return (
            spark.read.parquet(*read_manifest(table, v).values())
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
                .cast("bigint")
                .alias("cents"),
            )
            .select(F.lit(tag).alias("probe"), "n_rows", "cents")
        )

    return (
        agg(1500.0, "t1")
        .unionByName(agg(2500.0, "t2"))
        .unionByName(agg(9999.0, "t3"))
    )


# ---------------------------------------------------------------------------
# r14: merge-on-read UPDATE (DV + post-image in ONE commit), the unified
# reader's capstone (evolved + deleted + pruned through one path), and
# CHECK constraints at the commit boundary.


@query(
    "orders_mor_update",
    tags=("snapshot", "merge-on-read", "update", "deletion-vector",
          "cdf", "compaction"),
    oracle="""
WITH m AS (SELECT MAX(o_custkey) AS mx FROM orders),
head AS (
  SELECT o_orderkey,
         CASE WHEN o_custkey >= m.mx // 4
               AND o_custkey <  m.mx // 4 + GREATEST(1, m.mx // 200)
              THEN o_totalprice + 100.0 ELSE o_totalprice END AS p
  FROM orders, m
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(p * 100, 0) AS BIGINT)) AS BIGINT) AS cents,
       CAST(SUM(o_orderkey) AS BIGINT) AS key_sum
FROM head
""",
)
def orders_mor_update(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE-ON-READ UPDATE — the completion of the deletion-vector
    story (the r13 verdict's task 2): an UPDATE lands as ONE commit
    carrying a delete vector on the old keys PLUS a small post-image
    bucket, with ZERO rewritten data files (Iceberg v2 equality
    deletes + data files; Delta DVs + add files). The reference
    anchor is the February restatement (build_warehouse.py:159-169 /
    queries/ingest_demo.py's monthly loop), which r13 re-stated by
    COW-rewriting the month's bucket — here the same restatement
    costs one KB sidecar + one post-image file regardless of how big
    the bucket is.

    Script: v1 = 8 custkey buckets. v2 = MoR UPDATE (+100 on one
    custkey range): try_commit publishes {v1 buckets unchanged, u2 =
    post-images} with the DV staged atomically via its sidecars=
    param. Asserted: every v1 bucket's manifest entry is byte-
    identical, DESCRIBE HISTORY shows exactly one added bucket and
    zero re-points, and the unified reader serves the updated view.

    CHANGE FEED over the MoR commit: the DV-aware CDF source (r14,
    sources/cdfsource.py) emits the update as delete-rows from the
    DV'd buckets (pre-images, read from the UNCHANGED shared dirs)
    plus insert-rows from u2; a key-terminal fold ranking insert over
    delete within a commit reproduces the head exactly (exceptAll
    both ways, asserted) — a replica needs no special MoR handling.

    v3 = compaction: touched buckets rewrite (old minus doomed, plus
    their post-images), u2 and the DV retire together; carry-forward
    drops the vector WITH the re-point (asserted gone), and v2 == v3
    row-for-row (exceptAll both ways) — MoR and COW are two physical
    encodings of one table state.

    At 100 TB: the UPDATE's cost is the post-image write + two KB of
    metadata — the table's data files are untouched (asserted by
    manifest identity); readers pay one broadcast anti-filter until
    compaction folds it; the feed plans one task per DV'd-or-added
    bucket. The oracle replays the update arithmetic on raw orders."""
    from financial_data_warehouse_automation_spark.operators.snapshots import (
        read_manifest,
        read_sidecar,
        read_snapshot,
        table_history,
        try_commit,
    )
    from financial_data_warehouse_automation_spark.queries._helpers import scratch_dir
    from financial_data_warehouse_automation_spark.sources.cdfsource import (
        SnapshotCDFDataSource,
    )

    n_buckets = 8
    work = scratch_dir("mordupd_")
    table = os.path.join(work, "table")
    os.makedirs(table)
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", F.col("o_custkey").alias("ckey")
    )
    maxck = o.agg(F.max("ckey").alias("m")).collect()[0].m
    bucket_of = lambda c: min(n_buckets - 1, c * n_buckets // (maxck + 1))
    fb = F.least(
        F.lit(n_buckets - 1),
        F.floor(F.col("ckey") * n_buckets / (maxck + 1)),
    ).cast("int")

    root = os.path.join(table, "g1")
    o.withColumn("pb", fb).write.partitionBy("pb").parquet(root)
    v1_map = {
        n.split("=", 1)[1]: os.path.join(root, n)
        for n in os.listdir(root)
        if n.startswith("pb=")
    }
    assert try_commit(table, 0, v1_map) == 1

    # v2: the MoR UPDATE — DV on the old keys + post-image bucket,
    # one atomic commit, zero rewritten data files
    # a 0.5% custkey band: a DV is by contract SMALL (KBs of keys);
    # an update of 5%+ of the table should COW its buckets instead —
    # the writer picks per commit (and the reader switches to a
    # broadcast anti-join above 1k keys either way)
    upd_lo, upd_hi = maxck // 4, maxck // 4 + max(1, maxck // 200)
    upd = (F.col("ckey") >= upd_lo) & (F.col("ckey") < upd_hi)
    touched = list(range(bucket_of(upd_lo), bucket_of(upd_hi - 1) + 1))
    doomed = {
        str(b): sorted(
            r.o_orderkey
            for r in spark.read.parquet(v1_map[str(b)]).where(upd)
            .select("o_orderkey").collect()
        )
        for b in touched
    }
    assert any(doomed.values()), "update range selected nothing"
    d_post = os.path.join(table, "u2")
    (
        spark.read.parquet(*[v1_map[str(b)] for b in touched])
        .where(upd)
        .withColumn("o_totalprice", F.col("o_totalprice") + 100.0)
        .coalesce(1)
        .write.parquet(d_post)
    )
    v2_map = dict(v1_map)
    v2_map["u2"] = d_post
    assert try_commit(
        table, 1, v2_map,
        sidecars={"deletes": {"column": "o_orderkey", "buckets": doomed}},
    ) == 2
    # zero rewrite, by manifest: every v1 bucket byte-identical
    assert {
        b: d for b, d in read_manifest(table, 2).items() if b != "u2"
    } == v1_map
    h2 = [h for h in table_history(table) if h["version"] == 2][0]
    assert (h2["added"], h2["removed"], h2["repointed"]) == (
        ["u2"], [], [],
    ), h2

    # the DV-aware change feed replays the MoR commit: deletes from
    # the unchanged buckets' pre-images + inserts from u2; a terminal
    # fold (insert outranks delete within a commit) rebuilds the head
    spark.dataSource.register(SnapshotCDFDataSource)
    out = os.path.join(work, "feed_out")
    ckpt = os.path.join(work, "ckpt")
    q = (
        spark.readStream.format("snapshot_cdf")
        .option("path", table)
        .option("keycol", "o_orderkey")
        .option("startversion", 0)
        .load()
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .start()
    )
    try:
        q.processAllAvailable()
    finally:
        q.stop()
        q.awaitTermination()
    feed = spark.read.parquet(out)
    prio = F.when(
        F.col("change_type").isin("insert", "update_postimage"), 2
    ).otherwise(1)
    w = Window.partitionBy("o_orderkey").orderBy(
        F.col("commit_version").desc(), prio.desc()
    )
    replica = (
        feed.where(F.col("change_type") != "update_preimage")
        .withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") == 1) & (F.col("change_type") != "delete"))
        .select("o_orderkey", "o_totalprice", "ckey")
    )
    head = read_snapshot(spark, table, version=2).select(
        "o_orderkey", "o_totalprice", "ckey"
    )
    # one-action signed-count multiset equality (was counts+exceptAll,
    # 3 actions each re-folding the feed / re-reading the snapshot)
    assert_multiset_equal(replica, head, "CDF replica vs MoR head")

    # v3: compaction folds the update — touched buckets rewrite with
    # their post-images merged home, u2 and the DV retire together
    v3_map = dict(v1_map)
    for b in touched:
        d3 = os.path.join(table, f"b{b}-g3")
        (
            spark.read.parquet(v1_map[str(b)])
            .where(~upd)
            .unionByName(
                spark.read.parquet(d_post).where(fb == F.lit(b))
            )
            .write.parquet(d3)
        )
        v3_map[str(b)] = d3
    assert try_commit(table, 2, v3_map) == 3
    assert read_sidecar(table, 3, "deletes") is None  # folded, gone
    v2_df = read_snapshot(spark, table, version=2)
    v3_df = read_snapshot(spark, table, version=3)
    assert_multiset_equal(v2_df, v3_df, "MoR v2 vs compacted v3")

    return read_snapshot(spark, table).agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
        .cast("bigint").alias("cents"),
        F.sum("o_orderkey").cast("bigint").alias("key_sum"),
    )


@query(
    "orders_evolved_dv_pruned_read",
    tags=("snapshot", "schema-evolution", "deletion-vector",
          "scan-planner", "unified-reader", "metadata"),
    oracle="""
WITH m AS (SELECT MAX(o_orderkey) AS mk FROM orders),
base AS (
  SELECT o_orderkey AS okey,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS revenue_cents,
         CASE WHEN EXTRACT(YEAR FROM o_orderdate) >= 1998
              THEN o_orderpriority END AS tag,
         EXTRACT(YEAR FROM o_orderdate) AS yr, m.mk AS mk
  FROM orders, m
),
live AS (
  SELECT * FROM base
  WHERE NOT (yr <= 1997 AND okey % 97 = 0
             AND okey >= (2 * (mk + 1)) // 4
             AND okey <  (3 * (mk + 1)) // 4)
)
SELECT CAST('head' AS VARCHAR) AS probe,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(revenue_cents) AS BIGINT) AS cents,
       CAST(COUNT(tag) AS BIGINT) AS n_tagged
FROM live
UNION ALL
SELECT 'k2_range', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(revenue_cents) AS BIGINT), CAST(COUNT(tag) AS BIGINT)
FROM live
WHERE okey >= (2 * (mk + 1)) // 4 AND okey < (3 * (mk + 1)) // 4
ORDER BY probe
""",
)
def orders_evolved_dv_pruned_read(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """THE UNIFIED READER'S CAPSTONE (the r13 verdict's task 1 done-
    criterion): one table that has EVOLVED ITS SCHEMA (rename + add
    column), TAKEN A MERGE-ON-READ DELETE, and CARRIES STATS — the
    normal state of a long-lived production table — served by the ONE
    read path (operators/snapshots.read_snapshot: plan_scan pruning →
    column-mapped read → DV anti-filter), with every commit after v1
    relying on try_commit's sidecar CARRY-FORWARD rather than
    re-staging anything.

    Timeline (physical fields f1/f2/f3; logical names live only in
    the schema sidecar): v1 = pre-1998 history in 4 orderkey-range
    buckets with schema (okey, cents) + per-bucket okey min/max
    stats, staged atomically via try_commit's sidecars= param. v2 =
    RENAME cents -> revenue_cents: a metadata-only commit (manifest
    asserted identical; stats asserted CARRIED). v3 = DV DELETE of
    the okey%97==0 keys inside bucket k2 (manifest again identical).
    v4 = ADD COLUMN tag arriving WITH the 1998+ append (only the new
    bucket carries f3; old buckets' signatures and the DV are
    asserted carried — the v3 vector survives the unrelated append,
    the exact resurrection trap the r13 advisor flagged).

    The k2-range probe then demonstrates the composition: the planner
    prunes k0/k1/k3 on CARRIED stats (trace asserted == [k2, p98] —
    the append bucket spans the keyspace and is honestly kept), the
    mapped read projects two schema generations to logical names, and
    the DV filters the doomed keys — all through one function call.

    At 100 TB: every layer is metadata arithmetic (KB-scale JSON) or
    a broadcast anti-filter; a rename/add/delete costs zero data I/O
    and the probe opens 2 of 5 directories. The oracle replays the
    rename, the add, the delete, and the range from raw orders."""
    from financial_data_warehouse_automation_spark.operators.snapshots import (
        plan_scan,
        read_manifest,
        read_sidecar,
        read_snapshot,
        try_commit,
    )
    from financial_data_warehouse_automation_spark.queries._helpers import scratch_dir

    table = scratch_dir("snapevdv_")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("f1"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("f2"),
        F.col("o_orderpriority").alias("f3"),
        F.year("o_orderdate").alias("yr"),
    )
    mk = o.agg(F.max("f1").alias("m")).collect()[0].m
    bounds = [(i * (mk + 1)) // 4 for i in range(5)]  # b0..b4, half-open

    kb = (
        F.when(F.col("f1") < bounds[1], "k0")
        .when(F.col("f1") < bounds[2], "k1")
        .when(F.col("f1") < bounds[3], "k2")
        .otherwise("k3")
    )
    root = os.path.join(table, "g1")
    (
        o.where(F.col("yr") <= 1997)
        .select("f1", "f2", kb.alias("pb"))
        .write.partitionBy("pb").parquet(root)
    )
    v1_map = {
        n.split("=", 1)[1]: os.path.join(root, n)
        for n in os.listdir(root)
        if n.startswith("pb=")
    }
    assert sorted(v1_map) == ["k0", "k1", "k2", "k3"], sorted(v1_map)
    stats = {
        r.pb: {"okey": [r.mn, r.mx]}
        for r in o.where(F.col("yr") <= 1997)
        .groupBy(kb.alias("pb"))
        .agg(F.min("f1").alias("mn"), F.max("f1").alias("mx"))
        .collect()
    }
    assert try_commit(
        table, 0, v1_map,
        sidecars={
            "schema": {
                "fields": {"okey": "f1", "cents": "f2"},
                "buckets": {b: ["f1", "f2"] for b in v1_map},
            },
            "stats": stats,
        },
    ) == 1

    # v2: RENAME cents -> revenue_cents — metadata only; stats carry
    assert try_commit(
        table, 1, v1_map,
        sidecars={
            "schema": {
                "fields": {"okey": "f1", "revenue_cents": "f2"},
                "buckets": {},
            },
        },
    ) == 2
    assert read_manifest(table, 2) == v1_map
    assert read_sidecar(table, 2, "stats") == stats  # carried forward

    # v3: merge-on-read DELETE inside k2 — zero rewrite; schema and
    # stats carry forward untouched
    doomed = sorted(
        r.f1
        for r in spark.read.parquet(v1_map["k2"])
        .where(F.col("f1") % 97 == 0).select("f1").collect()
    )
    assert doomed, "the delete predicate selected nothing"
    assert try_commit(
        table, 2, v1_map,
        sidecars={"deletes": {"column": "okey", "buckets": {"k2": doomed}}},
    ) == 3
    assert read_manifest(table, 3) == v1_map
    assert read_sidecar(table, 3, "schema")["fields"] == {
        "okey": "f1", "revenue_cents": "f2",
    }

    # v4: ADD COLUMN tag WITH the 1998+ append — the unrelated commit
    # that used to resurrect DV'd rows; everything carries
    d98 = os.path.join(table, "p98")
    p98 = o.where(F.col("yr") >= 1998).select("f1", "f2", "f3")
    p98.write.parquet(d98)
    mn98, mx98 = p98.agg(F.min("f1"), F.max("f1")).collect()[0]
    v4_map = dict(v1_map)
    v4_map["p98"] = d98
    assert try_commit(
        table, 3, v4_map,
        sidecars={
            "schema": {
                "fields": {
                    "okey": "f1", "revenue_cents": "f2", "tag": "f3",
                },
                "buckets": {"p98": ["f1", "f2", "f3"]},
            },
            "stats": {"p98": {"okey": [mn98, mx98]}},
        },
    ) == 4
    dv4 = read_sidecar(table, 4, "deletes")
    assert dv4 == {"column": "okey", "buckets": {"k2": doomed}}, \
        "the delete vector must survive the unrelated append"
    assert read_sidecar(table, 4, "schema")["buckets"]["k0"] == ["f1", "f2"]
    assert sorted(read_sidecar(table, 4, "stats")) == [
        "k0", "k1", "k2", "k3", "p98",
    ]

    # the composed probe: stats prune k0/k1/k3; k2 + the keyspace-
    # spanning append survive; mapping + DV apply on top
    lo2, hi2 = bounds[2], bounds[3]
    preds = [("range", "okey", lo2, hi2)]
    _, trace = plan_scan(table, preds, explain=True)
    assert trace["after_stats"] == ["k2", "p98"], trace

    def agg(df: DataFrame, tag: str) -> DataFrame:
        return df.agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum("revenue_cents").cast("bigint").alias("cents"),
            F.count("tag").cast("bigint").alias("n_tagged"),
        ).select(F.lit(tag).alias("probe"), "n_rows", "cents", "n_tagged")

    ranged = read_snapshot(spark, table, preds).where(
        (F.col("okey") >= lo2) & (F.col("okey") < hi2)
    )
    return (
        agg(read_snapshot(spark, table), "head")
        .unionByName(agg(ranged, "k2_range"))
    )


@query(
    "orders_commit_check_constraints",
    tags=("snapshot", "check-constraints", "commit", "quality-gate"),
    oracle="""
WITH pre AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS c
  FROM orders WHERE EXTRACT(YEAR FROM o_orderdate) <= 1997
), full_t AS (
  SELECT COUNT(*) AS n,
         SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS c
  FROM orders
)
SELECT CAST('head' AS VARCHAR) AS snapshot,
       CAST(n AS BIGINT) AS n_rows, CAST(c AS BIGINT) AS cents
FROM full_t
UNION ALL
SELECT 'v1', CAST(n AS BIGINT), CAST(c AS BIGINT) FROM pre
ORDER BY snapshot
""",
)
def orders_commit_check_constraints(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """CHECK CONSTRAINTS AT THE COMMIT BOUNDARY (Delta table CHECK
    constraints / Iceberg write validation): the writer's protocol is
    stage -> check_constraints -> try_commit, so a batch violating a
    table invariant NEVER publishes a manifest — the table's history
    contains only checked states, which is the commit-time twin of
    the reference's row-level QA ledger (build_warehouse.py's
    missing-mapping quarantine flags bad ROWS for later resolution;
    a CHECK constraint refuses bad COMMITS outright).

    Script: v1 = the pre-1998 history under two checks (positive
    price, key present) — passes. A poisoned 1998+ batch (negated
    prices, one NULL key) is staged and CHECKED: the violation raises
    with per-check counts, the table head is asserted still v1, no
    v2 manifest exists, and the staged directory is left as ordinary
    GC food (asserted reclaimed by expire_snapshots). The CLEAN 1998+
    batch then passes the same checks and commits as v2.

    All checks evaluate in ONE aggregation pass over the STAGED frame
    (conditional sums, map-side combined), so at 100 TB the gate
    costs the write's scan, never the table's; NULL check results
    count as violations (a bare WHERE would silently pass them). The
    oracle replays v1 and the head from raw orders."""
    from financial_data_warehouse_automation_spark.operators.snapshots import (
        CommitCheckViolation,
        check_constraints,
        expire_snapshots,
        latest_version,
        read_manifest,
        try_commit,
    )
    from financial_data_warehouse_automation_spark.queries._helpers import scratch_dir

    table = scratch_dir("snapcheck_")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_totalprice", F.year("o_orderdate").alias("yr")
    )
    checks = {
        "positive_price": "o_totalprice > 0",
        "key_present": "o_orderkey IS NOT NULL",
    }

    d1 = os.path.join(table, "pre98")
    pre = o.where(F.col("yr") <= 1997).drop("yr")
    pre.write.parquet(d1)
    check_constraints(spark.read.parquet(d1), checks)
    assert try_commit(table, 0, {"pre98": d1}) == 1

    # the poisoned batch: staged, checked, REFUSED — never published
    d_bad = os.path.join(table, "late98_bad")
    bad = o.where(F.col("yr") >= 1998).drop("yr").withColumn(
        "o_totalprice", -F.col("o_totalprice")
    )
    bad = bad.unionByName(
        spark.createDataFrame(
            [(None, 1.0)], "o_orderkey long, o_totalprice double"
        )
    )
    bad.write.parquet(d_bad)
    try:
        check_constraints(spark.read.parquet(d_bad), checks)
        raise AssertionError("poisoned batch passed its checks")
    except CommitCheckViolation as e:
        assert "positive_price" in str(e) and "key_present" in str(e)
    assert latest_version(table) == 1  # nothing published
    assert not os.path.exists(os.path.join(table, "manifest-v2.json"))

    # the clean batch passes the same gate and commits
    d2 = os.path.join(table, "late98")
    o.where(F.col("yr") >= 1998).drop("yr").write.parquet(d2)
    check_constraints(spark.read.parquet(d2), checks)
    assert try_commit(table, 1, {"pre98": d1, "late98": d2}) == 2

    # the refused batch's staging is ordinary GC food (keep_from=1
    # retains all history; GC keys on referenced-by-no-manifest)
    _, removed_d = expire_snapshots(table, keep_from=1)
    assert removed_d == 1 and not os.path.exists(d_bad)

    def agg(mapping: dict[str, str], tag: str) -> DataFrame:
        return spark.read.parquet(*mapping.values()).agg(
            F.count(F.lit(1)).cast("long").alias("n_rows"),
            F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint"))
            .cast("bigint").alias("cents"),
        ).select(F.lit(tag).alias("snapshot"), "n_rows", "cents")

    return (
        agg(read_manifest(table), "head")
        .unionByName(agg(read_manifest(table, 1), "v1"))
    )


@query(
    "orders_filegrain_skipping_snapshot",
    tags=("snapshot", "scan-planner", "file-skipping", "filestats",
          "metadata"),
    oracle="""
WITH m AS (SELECT MAX(o_orderkey) AS mk FROM orders),
b AS (
  SELECT o_orderkey AS okey,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS cents,
         EXTRACT(YEAR FROM o_orderdate) AS yr, m.mk AS mk
  FROM orders, m
),
r AS (
  SELECT * FROM b
  WHERE okey >= (2 * (mk + 1)) // 5
    AND okey <  (2 * (mk + 1)) // 5 + GREATEST(1, (mk + 1) // 50)
)
SELECT CAST('keyband' AS VARCHAR) AS probe,
       CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(cents) AS BIGINT) AS cents
FROM r
UNION ALL
SELECT 'year_keyband', CAST(COUNT(*) AS BIGINT),
       CAST(SUM(cents) AS BIGINT)
FROM r WHERE yr = 1996
ORDER BY probe
""",
)
def orders_filegrain_skipping_snapshot(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """FILE-GRAIN SKIPPING INSIDE THE SCAN PLANNER (r14) — the fourth
    pruning layer: per-FILE min/max bounds (Iceberg's file-level
    column stats inside split planning; Delta per-file stats in the
    log). Bucket-level stats answer 'which directories?'; at 100 TB a
    bucket is still thousands of files, and a planner that stops at
    the directory reads all of them. Here each year bucket is written
    RANGE-PARTITIONED on o_orderkey (repartitionByRange → each file
    covers a disjoint key range), the per-file bounds are harvested
    from the PARQUET FOOTERS the write already produced (zero extra
    data scan — the stats exist; the sidecar just lifts them to the
    planner), and plan_scan prunes files the way it prunes buckets.

    Probes, both oracle-replayed: (a) a 2% orderkey band — bucket
    stats CANNOT prune (every year spans the keyspace, trace
    asserted) but file stats keep at most 2 files per bucket (trace
    files_kept asserted << files_total); (b) year+band — the spec
    layer first drops 6 of 7 buckets, then file stats cut within the
    survivor; composition asserted layer by layer. The unified reader
    consumes the file-grain plan transparently (read paths are files,
    not dirs), and a bucket with NO filestats entry still reads whole
    — the layer is additive, never a correctness gate.

    At 100 TB: the sidecar is O(files) KB-scale JSON per bucket,
    planning stays driver-side arithmetic, and a needle query opens
    ~1 file per surviving bucket instead of the bucket — the same
    10-1000x I/O cut Iceberg gets from manifests' per-file stats."""
    import pyarrow.parquet as pq

    from financial_data_warehouse_automation_spark.operators.snapshots import (
        plan_scan,
        read_snapshot,
        try_commit,
    )
    from financial_data_warehouse_automation_spark.queries._helpers import scratch_dir

    table = scratch_dir("snapfgs_")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
        .alias("cents"),
        F.year("o_orderdate").alias("yr"),
    )
    mk = o.agg(F.max("o_orderkey").alias("m")).collect()[0].m
    years = sorted(r.yr for r in o.select("yr").distinct().collect())

    mapping: dict[str, str] = {}
    spec: dict[str, dict] = {}
    fstats: dict[str, dict] = {}
    for y in years:
        b = f"y{y}"
        d = os.path.join(table, b)
        (
            o.where(F.col("yr") == y)
            .repartitionByRange(6, "o_orderkey")
            .write.parquet(d)
        )
        mapping[b] = d
        spec[b] = {"column": "yr", "value": int(y)}
        entry: dict[str, dict] = {}
        for fname in sorted(os.listdir(d)):
            if not fname.endswith(".parquet"):
                continue
            md = pq.ParquetFile(os.path.join(d, fname)).metadata
            lo = hi = None
            for g in range(md.num_row_groups):
                rg = md.row_group(g)
                for c in range(rg.num_columns):
                    col = rg.column(c)
                    if col.path_in_schema != "o_orderkey":
                        continue
                    st = col.statistics
                    if st is None or not st.has_min_max:
                        continue
                    lo = st.min if lo is None else min(lo, st.min)
                    hi = st.max if hi is None else max(hi, st.max)
            # a file without footer stats is conservatively unbounded
            entry[fname] = {} if lo is None else {"okey": [lo, hi]}
        fstats[b] = entry
    assert try_commit(
        table, 0, mapping,
        sidecars={"spec": spec, "filestats": fstats},
    ) == 1

    klo = (2 * (mk + 1)) // 5
    khi = klo + max(1, (mk + 1) // 50)
    band = [("range", "okey", klo, khi)]

    # probe (a): bucket layers cannot prune a key band (every year
    # spans the keyspace) — the FILE layer does the work
    _, tr_a = plan_scan(table, band, explain=True)
    assert tr_a["after_spec"] == sorted(mapping), tr_a
    assert tr_a["files_total"] >= 3 * len(years), tr_a
    assert 1 <= tr_a["files_kept"] <= 2 * len(years), tr_a
    assert tr_a["files_kept"] <= tr_a["files_total"] // 2, tr_a

    # probe (b): spec drops 6 of 7 buckets FIRST, files cut within
    yk = band + [("in", "yr", [1996])]
    _, tr_b = plan_scan(table, yk, explain=True)
    assert tr_b["after_spec"] == ["y1996"], tr_b
    assert 1 <= tr_b["files_kept"] <= 2, tr_b

    def agg(preds: list, residual, tag: str) -> DataFrame:
        return (
            read_snapshot(spark, table, preds)
            .where(residual)
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_rows"),
                F.sum("cents").cast("bigint").alias("cents"),
            )
            .select(F.lit(tag).alias("probe"), "n_rows", "cents")
        )

    in_band = (F.col("o_orderkey") >= klo) & (F.col("o_orderkey") < khi)
    return (
        agg(band, in_band, "keyband")
        .unionByName(
            agg(yk, in_band & (F.col("yr") == 1996), "year_keyband")
        )
    )


@query(
    "orders_concurrent_same_bucket_merge",
    tags=("layout", "snapshot", "occ", "conflict-detection",
          "merge", "maintenance"),
    oracle="""
WITH base AS (
  SELECT o_orderkey AS okey,
         CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
         + CASE WHEN o_orderkey % 10 = 7 THEN 11100 ELSE 0 END
         + CASE WHEN o_orderkey % 8 = 3 AND o_orderkey % 10 = 5
                THEN 100000 ELSE 0 END AS cents
  FROM orders
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(cents) AS BIGINT) AS cents,
       CAST(SUM(CASE WHEN okey % 10 = 7 THEN cents END) AS BIGINT)
         AS merged_cents,
       CAST(SUM(CASE WHEN okey % 8 = 3 AND okey % 10 = 5 THEN cents END)
            AS BIGINT) AS rival_cents
FROM base
""",
)
def orders_concurrent_same_bucket_merge(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SAME-BUCKET CONCURRENT WRITERS, CONFLICT DETECTED AND RE-FOLDED
    (r15 — the r14 verdict's task 1b, and the multi-writer sibling of
    orders_snapshot_concurrent_commit, whose two writers touch
    DISJOINT buckets): writer A MERGEs a batch of updates into the
    buckets its keys live in; between A's fold (which read the
    buckets' previous state) and A's commit, writer B publishes a new
    image of ONE OF THOSE SAME buckets. The r14 rebase loop would
    re-point A's staged buckets onto the latest manifest —
    last-rebaser-wins, silently erasing B's effect (the r14 verdict's
    #1 latent trap). The r15 loop DETECTS that a touched bucket moved,
    discards the stale fold, and re-runs the merge against B's state:
    the final table carries BOTH effects, which the oracle replays
    from raw orders.

    Scripted interleaving (how concurrency protocols are demonstrated
    honestly — the race is nondeterministic, the protocol's response
    to each interleaving is not): the side effect is planted INSIDE
    A's merge function, so B's commit lands after A reads ``prev``
    and before A's CAS — the exact window where clobbering happened.
    Asserted: the merge provably ran TWICE (fold + re-fold); B's
    intermediate version carries B's effect and NOT A's (history
    isolation); the final version carries both; untouched buckets'
    directories are byte-identical to v1 (COW sharing survives the
    re-fold).

    A's intent: +111.00 on keys ``okey % 10 == 7`` (their home
    buckets under ``pb = okey % 8`` are {1,3,5,7}).
    B's commit: +1000.00 on ``okey % 10 == 5`` keys of bucket 3 — a
    touched bucket, disjoint keys.

    At 100 TB: detection cost is a dict comparison over the touched
    buckets' manifest entries (KB metadata, no data read); the
    re-fold re-shuffles only the BATCH against the touched buckets —
    churn-proportional, never table-proportional — and commits that
    touch other buckets never trigger it (pinned in
    tests/test_snapshots.py). Iceberg/Delta run the same commit-time
    overlap validation.

    Reference: Code.gs:27-31's single global lock is the degenerate
    form — serialize everything; this is the scalable form —
    serialize only true overlap, re-derive when it happens."""
    from financial_data_warehouse_automation_spark.operators.snapshots import (
        latest_version,
        read_manifest,
        try_commit,
    )
    from financial_data_warehouse_automation_spark.queries._helpers import (
        scratch_dir,
    )
    from financial_data_warehouse_automation_spark.streaming.pipeline import (
        snapshot_partitioned_state_commit_batch,
    )
    from financial_data_warehouse_automation_spark.tables import load_table

    table = scratch_dir("samebucket_")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
        .alias("cents"),
    )

    root = os.path.join(table, "g1")
    o.withColumn("pb", (F.col("okey") % 8).cast("int")) \
        .write.partitionBy("pb").parquet(root)
    v1_map = {
        n.split("=", 1)[1]: os.path.join(root, n)
        for n in os.listdir(root)
        if n.startswith("pb=")
    }
    assert try_commit(table, 0, v1_map) == 1

    # A's batch: the post-image rows of its update (intent computed
    # against v1; its keys are disjoint from B's, as a MERGE whose
    # source overlaps a rival's keys would need key-level, not
    # bucket-level, reconciliation)
    batch = o.where(F.col("okey") % 10 == 7).withColumn(
        "cents", F.col("cents") + 11100
    )
    calls = {"n": 0}

    def merge(prev: DataFrame, b: DataFrame) -> DataFrame:
        calls["n"] += 1
        if calls["n"] == 1:
            # B lands AFTER A read prev, BEFORE A commits: rewrite
            # bucket 3 (+1000.00 on its okey%10==5 keys)
            d_b = os.path.join(table, "rival-b3")
            (
                spark.read.parquet(v1_map["3"])
                .withColumn(
                    "cents",
                    F.when(
                        F.col("okey") % 10 == 5,
                        F.col("cents") + 100000,
                    ).otherwise(F.col("cents")),
                )
                .write.parquet(d_b)
            )
            m2 = dict(read_manifest(table))
            m2["3"] = d_b
            assert try_commit(table, latest_version(table), m2) == 2
        src = b.select("okey", "cents")
        if prev is None:
            return src
        return prev.select("okey", "cents").join(
            src.select("okey"), "okey", "left_anti"
        ).unionByName(src)

    fn = snapshot_partitioned_state_commit_batch(
        table, merge, lambda df: (F.col("okey") % 8).cast("int"),
        writer_id="merge",
    )
    fn(batch, 0)

    assert calls["n"] == 2, "conflict must trigger a re-fold"
    assert latest_version(table) == 3
    # history isolation: B's v2 carries B's effect but NOT A's —
    # A's keys still read their v1 base values at v2
    v2 = spark.read.parquet(*read_manifest(table, 2).values())
    assert v2.where(F.col("okey") % 10 == 7).join(
        o.withColumnRenamed("cents", "base_cents"), "okey"
    ).where(F.col("cents") != F.col("base_cents")).count() == 0
    assert v2.where(
        (F.col("okey") % 8 == 3) & (F.col("okey") % 10 == 5)
    ).join(
        o.withColumnRenamed("cents", "base_cents"), "okey"
    ).where(
        F.col("cents") != F.col("base_cents") + 100000
    ).count() == 0
    # COW sharing: buckets untouched by either writer are v1's dirs
    v3_map = read_manifest(table, 3)
    for bkt in ("0", "2", "4", "6"):
        assert v3_map[bkt] == v1_map[bkt], bkt

    final = spark.read.parquet(*v3_map.values())
    n_rival = final.where(
        (F.col("okey") % 8 == 3) & (F.col("okey") % 10 == 5)
    ).count()
    assert n_rival > 0, "rival's key set must be non-empty at this SF"

    return final.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("cents").cast("bigint").alias("cents"),
        F.sum(
            F.when(F.col("okey") % 10 == 7, F.col("cents"))
        ).cast("bigint").alias("merged_cents"),
        F.sum(
            F.when(
                (F.col("okey") % 8 == 3) & (F.col("okey") % 10 == 5),
                F.col("cents"),
            )
        ).cast("bigint").alias("rival_cents"),
    )


@query(
    "orders_sorted_merge_keep_last",
    tags=("layout", "snapshot", "sortorder", "merge", "dedupe",
          "zero-shuffle"),
    oracle="""
SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                + (o_orderkey % 3 + 1) * 100) AS BIGINT) AS cents,
       CAST(SUM(o_orderkey % 3 + 1) AS BIGINT) AS seq_sum
FROM orders
""",
)
def orders_sorted_merge_keep_last(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """SORT-ORDER METADATA BUYS A SHUFFLE-FREE, SORT-FREE MERGE (r15
    — the r14 verdict's task 5: record what Iceberg calls the table's
    sort order, then PROVE a consumer can cash it in). A versions
    table (each order delivered 1-3 times, ``seq``-stamped, cents
    drifting +100 per delivery) is written key-bucketed
    (``pb = okey % 8``) and SORTED WITHIN EACH BUCKET by
    ``(okey, seq)``; the commit stamps a ``sortorder`` sidecar. The
    keep-last-per-key merge — the reference's A2 upsert semantics,
    build_warehouse.py:159-169 — then runs TWO ways:

    * CONTROL (layout-ignorant): the standard window plan
      (row_number over okey ordered by seq desc) — Catalyst plans an
      Exchange (hash-shuffle every row) plus a Sort. Correct
      anywhere, pays the full shuffle.
    * FAST (sidecar-directed): the consumer checks
      ``table_sort_order`` declares the ``(okey, seq)`` prefix for
      EVERY bucket, that buckets partition the key space, and that
      each bucket is a single file smaller than the read split size
      (so Spark cannot interleave or split a bucket mid-key); it
      then runs ONE streaming pass per partition (Arrow-batched
      ``mapInPandas``, dict of last row per key) — the physical plan
      contains NO Exchange and NO Sort (asserted on the plan
      string), because the layout already did that work at write
      time. Any precondition failing falls back to the control plan
      (asserted by re-pointing a bucket: the carried order drops and
      the fast path refuses).

    Both paths are asserted row-identical (exceptAll, both
    directions); the oracle replays the closed form from raw orders.

    At 100 TB: the window plan shuffles the full versions table every
    merge; the sorted layout amortizes ONE write-time sort across
    every later merge/as-of/range consumer — the standard LSM/Iceberg
    trade. The single-file precondition is the demo's split-safety
    fence; a production reader makes buckets split-proof natively
    (Spark's bucketBy tables, Iceberg split planning) with the same
    metadata contract."""
    from financial_data_warehouse_automation_spark.operators.snapshots import (
        read_manifest,
        table_sort_order,
        try_commit,
    )
    from financial_data_warehouse_automation_spark.queries._helpers import (
        scratch_dir,
    )
    from financial_data_warehouse_automation_spark.tables import load_table

    table = scratch_dir("sortmerge_")
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_orderkey").alias("okey"),
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
        .alias("base_cents"),
    )
    ups = (
        o.withColumn(
            "seq",
            F.explode(
                F.sequence(F.lit(1), (F.col("okey") % 3 + 1).cast("int"))
            ),
        )
        .withColumn("cents", F.col("base_cents") + F.col("seq") * 100)
        .withColumn("pb", (F.col("okey") % 8).cast("int"))
        .select("okey", "seq", "cents", "pb")
    )
    root = os.path.join(table, "g1")
    (
        ups.repartition(8, "pb")
        .sortWithinPartitions("pb", "okey", "seq")
        .write.partitionBy("pb").parquet(root)
    )
    v1_map = {
        n.split("=", 1)[1]: os.path.join(root, n)
        for n in os.listdir(root)
        if n.startswith("pb=")
    }
    order = [["okey", "asc"], ["seq", "asc"]]
    assert try_commit(table, 0, v1_map, sidecars={
        "sortorder": {b: order for b in v1_map},
    }) == 1

    def bucket_files(d: str) -> list[str]:
        return [n for n in os.listdir(d) if n.endswith(".parquet")]

    def keep_last_fast(version: int) -> DataFrame | None:
        """The sidecar-directed plan, or None when the layout does
        not guarantee it (caller falls back to the window plan)."""
        mani = read_manifest(table, version)
        so = table_sort_order(table, version) or {}
        want = [["okey", "asc"], ["seq", "asc"]]
        split_bytes = int(
            spark.conf.get("spark.sql.files.maxPartitionBytes")
            .removesuffix("b")
        )
        for b, d in mani.items():
            if (so.get(b) or [])[:2] != want:
                return None  # not declared sorted: cannot elide
            files = bucket_files(d)
            if len(files) != 1:
                return None  # a key's rows could span files
            if os.path.getsize(os.path.join(d, files[0])) >= split_bytes:
                return None  # Spark would split the file mid-key
        src = spark.read.parquet(*[mani[b] for b in sorted(mani)])

        def fold(it):
            import pandas as pd

            acc = None
            for pdf in it:
                last = pdf.drop_duplicates(subset=["okey"], keep="last")
                if acc is None:
                    acc = last
                else:
                    acc = pd.concat([acc, last]).drop_duplicates(
                        subset=["okey"], keep="last"
                    )
            if acc is not None:
                yield acc

        return src.mapInPandas(
            fold, "okey bigint, seq int, cents bigint"
        )

    fast = keep_last_fast(1)
    assert fast is not None, "sorted layout must qualify"
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        fast.explain()
    plan = buf.getvalue()
    assert "Exchange" not in plan, plan  # zero shuffle
    assert "Sort" not in plan, plan      # zero re-sort

    control = (
        spark.read.parquet(*v1_map.values())
        .withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy("okey").orderBy(F.col("seq").desc())
            ),
        )
        .where(F.col("rn") == 1)
        .select("okey", "seq", "cents")
    )
    buf2 = io.StringIO()
    with contextlib.redirect_stdout(buf2):
        control.explain()
    cplan = buf2.getvalue()
    assert "Exchange" in cplan and "Sort" in cplan, cplan

    # identical rows (one-action signed-count multiset equality; was
    # exceptAll in both directions = 2 actions × 2 evaluations each)
    assert_multiset_equal(fast, control, "sorted fast path vs control")

    # the fence: a re-pointed bucket drops its declaration and the
    # fast path REFUSES (falls back) instead of computing wrong rows
    d_rw = os.path.join(table, "g2-b3")
    spark.read.parquet(v1_map["3"]).orderBy(F.rand(7)).write.parquet(
        d_rw
    )
    v2_map = dict(v1_map)
    v2_map["3"] = d_rw
    assert try_commit(table, 1, v2_map) == 2
    assert keep_last_fast(2) is None

    return fast.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.sum("cents").cast("bigint").alias("cents"),
        F.sum("seq").cast("bigint").alias("seq_sum"),
    )
