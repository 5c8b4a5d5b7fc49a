"""Deeper TPC-H-grade relational shapes over the driver star schema.

The reference's reporting layer stops at single-dimension enrichment +
period aggregation (build_warehouse.py:115-140); a warehouse user
outgrows that fast. This band adds the classic decision-support shapes
Catalyst must plan well at 100 TB: 6-way snowflake joins (Q7/Q8),
correlated scalar subqueries (Q17/Q22), IN-subquery semi-joins over
aggregates (Q18), disjunctive multi-column pushdown (Q19), and
conditional-aggregate market share (Q8/Q14).

Scale notes (verified on .explain, pinned in tests/test_plan_hygiene.py
patterns): every query here keeps nation/region broadcast (bounded
cardinality), lets AQE decide customer/supplier/part join strategies,
and expresses correlated subqueries as aggregate+join so they plan as
one shuffle instead of a per-row re-scan. All money math follows the
decimal determinism rules in registry.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from financial_data_warehouse_automation_spark.queries._helpers import (
    money,
    rate,
    sql_money,
    sql_rate,
)
from financial_data_warehouse_automation_spark.registry import query
from financial_data_warehouse_automation_spark.tables import load_table

ONE = "CAST(1.0 AS DECIMAL(2,1))"
M_PRICE = sql_money("l_extendedprice")
R_DISC = sql_rate("l_discount")
DISC_PRICE = f"{M_PRICE} * ({ONE} - {R_DISC})"


def _one() -> F.Column:
    return F.lit("1.0").cast("decimal(2,1)")


def _disc_price() -> F.Column:
    return money("l_extendedprice") * (_one() - rate("l_discount"))


# ---------------------------------------------------------------------------
# TPC-H Q7 shape: bidirectional nation-pair trade volume. Six-way
# snowflake join; the nation dim joins TWICE (customer side + supplier
# side) — alias hygiene and double-broadcast both matter.
# ---------------------------------------------------------------------------
@query(
    "q7_volume_shipping",
    tags=("join", "snowflake", "agg", "date"),
    oracle=f"""
SELECT
  n2.n_name AS supp_nation,
  n1.n_name AS cust_nation,
  EXTRACT(YEAR FROM l.l_shipdate) AS year,
  CAST(SUM({sql_money('l.l_extendedprice')} * ({ONE} - {sql_rate('l.l_discount')})) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
  AND l.l_shipdate >= TIMESTAMP '1995-01-01'
  AND l.l_shipdate <  TIMESTAMP '1997-01-01'
GROUP BY 1, 2, 3
ORDER BY 1, 2, 3
""",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade volume between a nation pair, both directions, by ship year.

    The disjunctive nation-pair predicate lands AFTER both nation joins;
    nation is broadcast (25 rows at any scale) so the filter is
    map-side. Fact-side predicates (shipdate range) push to the scan.
    """
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    n1 = F.broadcast(n.select(
        F.col("n_nationkey").alias("c_nk"), F.col("n_name").alias("cust_nation")))
    n2 = F.broadcast(n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    pair = (
        (F.col("cust_nation") == "NATION_1") & (F.col("supp_nation") == "NATION_2")
    ) | ((F.col("cust_nation") == "NATION_2") & (F.col("supp_nation") == "NATION_1"))
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, c.c_nationkey == F.col("c_nk"))
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(n2, s.s_nationkey == F.col("s_nk"))
        .where(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").alias("year"),
        )
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q8 shape: one nation's market share inside one region for one
# part type — conditional aggregation (share = SUM(CASE)/SUM) over a
# 7-way join.
# ---------------------------------------------------------------------------
@query(
    "q8_market_share",
    tags=("join", "snowflake", "agg", "conditional"),
    oracle=f"""
SELECT
  EXTRACT(YEAR FROM o.o_orderdate) AS year,
  CAST(SUM(CASE WHEN n2.n_name = 'NATION_3'
           THEN {sql_money('l.l_extendedprice')} * ({ONE} - {sql_rate('l.l_discount')})
           ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
    / CAST(SUM({sql_money('l.l_extendedprice')} * ({ONE} - {sql_rate('l.l_discount')})) AS DOUBLE)
    AS mkt_share
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n1  ON c.c_nationkey = n1.n_nationkey
JOIN region r   ON n1.n_regionkey = r.r_regionkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n2  ON s.s_nationkey = n2.n_nationkey
WHERE r.r_name = 'ASIA'
  AND p.p_type = 'PROMO'
  AND o.o_orderdate >= TIMESTAMP '1995-01-01'
  AND o.o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY 1
ORDER BY 1
""",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NATION_3 suppliers' share of ASIA's PROMO-part revenue by year.

    Both nation roles and region broadcast; part carries only the
    p_type filter so Catalyst prunes it to (p_partkey) after pushdown.
    The share divides two exact decimal sums in double — deterministic
    on both engines.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "PROMO")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1995-01-01") & (F.col("o_orderdate") < "1997-01-01")
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "ASIA")
    n1 = F.broadcast(
        n.select(F.col("n_nationkey").alias("c_nk"), F.col("n_regionkey").alias("c_rk")))
    n2 = F.broadcast(n.select(
        F.col("n_nationkey").alias("s_nk"), F.col("n_name").alias("supp_nation")))
    zero = F.lit("0").cast("decimal(12,2)")
    nation_rev = F.when(
        F.col("supp_nation") == "NATION_3", _disc_price()).otherwise(zero)
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(n1, c.c_nationkey == F.col("c_nk"))
        .join(F.broadcast(r), F.col("c_rk") == r.r_regionkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(n2, s.s_nationkey == F.col("s_nk"))
        .groupBy(F.year("o_orderdate").alias("year"))
        .agg(
            (F.sum(nation_rev).cast("double")
             / F.sum(_disc_price()).cast("double")).alias("mkt_share")
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q10 shape: top returned-revenue customers in a quarter —
# join + agg + deterministic top-k (TakeOrderedAndProject).
# ---------------------------------------------------------------------------
@query(
    "q10_returned_items",
    tags=("join", "agg", "topk"),
    oracle=f"""
SELECT
  c.c_custkey AS custkey,
  c.c_name AS name,
  CAST(SUM({sql_money('l.l_extendedprice')} * ({ONE} - {sql_rate('l.l_discount')})) AS DOUBLE) AS revenue,
  n.n_name AS nation
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON l.l_orderkey = o.o_orderkey
JOIN nation n   ON c.c_nationkey = n.n_nationkey
WHERE o.o_orderdate >= TIMESTAMP '1995-10-01'
  AND o.o_orderdate <  TIMESTAMP '1996-01-01'
  AND l.l_returnflag = 'R'
GROUP BY 1, 2, 4
ORDER BY revenue DESC, custkey
LIMIT 20
""",
)
def q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 customers by revenue lost to returns in 1995Q4.

    Global top-k with a custkey tiebreak → plans as
    TakeOrderedAndProject (per-partition heaps, no global sort shuffle).
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1995-10-01") & (F.col("o_orderdate") < "1996-01-01")
    )
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    n = F.broadcast(load_table(spark, sf_dir, "nation"))
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(l, l.l_orderkey == o.o_orderkey)
        .join(n, c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("name"),
            F.col("n_name").alias("nation"),
        )
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
        .select("custkey", "name", "revenue", "nation")
        .orderBy(F.desc("revenue"), "custkey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# TPC-H Q14 shape: promo revenue percentage — conditional aggregate
# over a fact⋈dim join, single-row result.
# ---------------------------------------------------------------------------
@query(
    "q14_promo_revenue",
    tags=("join", "agg", "conditional"),
    oracle=f"""
SELECT
  CAST(SUM(CASE WHEN p.p_type = 'PROMO'
           THEN {sql_money('l.l_extendedprice')} * ({ONE} - {sql_rate('l.l_discount')})
           ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE) * 100.0
    / CAST(SUM({sql_money('l.l_extendedprice')} * ({ONE} - {sql_rate('l.l_discount')})) AS DOUBLE)
    AS promo_pct
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE l.l_shipdate >= TIMESTAMP '1995-09-01'
  AND l.l_shipdate <  TIMESTAMP '1995-10-01'
""",
)
def q14_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """% of one month's revenue from PROMO parts."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1995-09-01") & (F.col("l_shipdate") < "1995-10-01")
    )
    p = load_table(spark, sf_dir, "part")
    zero = F.lit("0").cast("decimal(12,2)")
    promo = F.when(F.col("p_type") == "PROMO", _disc_price()).otherwise(zero)
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .agg(
            (F.sum(promo).cast("double") * F.lit(100.0)
             / F.sum(_disc_price()).cast("double")).alias("promo_pct")
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q17 shape: correlated scalar subquery (per-part average) —
# expressed as aggregate + join so it plans as ONE extra shuffle, not a
# per-row re-scan of lineitem.
# ---------------------------------------------------------------------------
@query(
    "q17_small_quantity_revenue",
    tags=("join", "subquery", "agg"),
    oracle=f"""
SELECT CAST(SUM({sql_money('l.l_extendedprice')}) AS DOUBLE) / 7.0 AS avg_yearly,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand = 'Brand#3'
  AND l.l_quantity < (
    SELECT 0.2 * AVG(l2.l_quantity)
    FROM lineitem l2
    WHERE l2.l_partkey = l.l_partkey
  )
""",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Yearly revenue tied up in below-20%-of-average-quantity orders.

    The correlated `0.2*AVG(qty) per part` becomes a groupBy(partkey)
    aggregate joined back to the filtered fact — the decorrelation
    Catalyst would have to find by itself; writing it explicitly makes
    the single-shuffle plan unconditional. l_quantity in this data is
    integral doubles ≤ 50, so AVG is exact in both engines (sum of
    small integers / count — no rounding divergence).
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_brand") == "Brand#3")
    per_part = l.groupBy(F.col("l_partkey").alias("pp_key")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("qty_cut")
    )
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(per_part, l.l_partkey == F.col("pp_key"))
        .where(F.col("l_quantity") < F.col("qty_cut"))
        .agg(
            (F.sum(money("l_extendedprice")).cast("double") / F.lit(7.0))
            .alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q18 shape: large-volume orders — IN-subquery over a HAVING
# aggregate, planned as a semi-join against the aggregated fact.
# ---------------------------------------------------------------------------
@query(
    "q18_large_orders",
    tags=("join", "subquery", "agg", "topk"),
    oracle=f"""
SELECT c.c_name AS name,
       c.c_custkey AS custkey,
       o.o_orderkey AS orderkey,
       CAST(o.o_orderdate AS DATE) AS orderdate,
       CAST({sql_money('o.o_totalprice')} AS DOUBLE) AS totalprice,
       CAST(SUM({sql_money('l.l_quantity')}) AS DOUBLE) AS sum_qty
FROM customer c
JOIN orders o   ON c.c_custkey = o.o_custkey
JOIN lineitem l ON o.o_orderkey = l.l_orderkey
WHERE o.o_orderkey IN (
  SELECT l_orderkey FROM lineitem GROUP BY l_orderkey
  HAVING SUM({sql_money('l_quantity')}) > 300
)
GROUP BY 1, 2, 3, 4, 5
ORDER BY totalprice DESC, orderkey
LIMIT 100
""",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders whose total quantity exceeds 300, with customer context.

    The IN-subquery is a leftsemi join against the per-order quantity
    aggregate; at scale the aggregate output (one row per qualifying
    order, <<1% selective) broadcasts under AQE.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    l = load_table(spark, sf_dir, "lineitem")
    big = (
        l.groupBy("l_orderkey")
        .agg(F.sum(money("l_quantity")).alias("q"))
        .where(F.col("q") > 300)
        .select(F.col("l_orderkey").alias("big_key"))
    )
    return (
        o.join(big, o.o_orderkey == F.col("big_key"), "leftsemi")
        .join(c, o.o_custkey == c.c_custkey)
        .join(l, o.o_orderkey == l.l_orderkey)
        .groupBy(
            F.col("c_name").alias("name"),
            F.col("c_custkey").alias("custkey"),
            F.col("o_orderkey").alias("orderkey"),
            F.to_date("o_orderdate").alias("orderdate"),
            money("o_totalprice").cast("double").alias("totalprice"),
        )
        .agg(F.sum(money("l_quantity")).cast("double").alias("sum_qty"))
        .orderBy(F.desc("totalprice"), "orderkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# TPC-H Q19 shape: disjunctive multi-column predicate across both join
# sides — the pushdown stress test (Catalyst must split the OR into
# per-side conjuncts it can push, keeping the residual on the join).
# ---------------------------------------------------------------------------
@query(
    "q19_disjunctive_revenue",
    tags=("join", "filter", "pushdown"),
    oracle=f"""
SELECT CAST(SUM({DISC_PRICE.replace('l_extendedprice', 'l.l_extendedprice').replace('l_discount', 'l.l_discount')}) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE (p.p_brand = 'Brand#12' AND p.p_size BETWEEN 1 AND 5
       AND l.l_quantity >= 1 AND l.l_quantity <= 11)
   OR (p.p_brand = 'Brand#23' AND p.p_size BETWEEN 1 AND 10
       AND l.l_quantity >= 10 AND l.l_quantity <= 20)
   OR (p.p_brand = 'Brand#3' AND p.p_size BETWEEN 1 AND 15
       AND l.l_quantity >= 20 AND l.l_quantity <= 30)
""",
)
def q19_disjunctive_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue from three disjunctive brand/size/quantity bands.

    Catalyst extracts the common sub-predicates (p_size >= 1, quantity
    bounds union) and pushes them below the join; the full disjunction
    stays as the post-join residual. Verified: the parquet scans show
    PushedFilters on both sides.
    """
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    q = F.col("l_quantity")
    band = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 5)
         & (q >= 1) & (q <= 11))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 10)
           & (q >= 10) & (q <= 20))
        | ((F.col("p_brand") == "Brand#3") & F.col("p_size").between(1, 15)
           & (q >= 20) & (q <= 30))
    )
    return (
        l.join(p, p.p_partkey == l.l_partkey)
        .where(band)
        .agg(
            F.sum(_disc_price()).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q22 shape: scalar subquery threshold + NOT EXISTS anti-join.
# ---------------------------------------------------------------------------
@query(
    "q22_idle_rich_customers",
    tags=("antijoin", "subquery", "agg"),
    oracle="""
SELECT c.c_mktsegment AS segment,
       COUNT(*) AS n_custs,
       CAST(SUM(CAST(c.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_bal
FROM customer c
WHERE c.c_acctbal > (
    SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
    FROM customer c2 WHERE c2.c_acctbal > 0.0
  )
  AND NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderdate >= TIMESTAMP '1999-01-01')
GROUP BY 1
ORDER BY 1
""",
)
def q22_idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Above-average-balance customers with no order since 1999, by segment.

    (Every customer in this data has ordered at least once, so the
    classic "never ordered" predicate is vacuous — the date-scoped
    NOT EXISTS keeps the anti-join falsifiable; VERDICT r1 #5.)

    The scalar AVG broadcasts as a one-row crossJoin (Catalyst folds it
    to a BroadcastNestedLoopJoin over a single row — constant-cost at
    any scale); never-ordered is a left_anti against orders' custkeys.
    The threshold is an exact decimal SUM cast to double, divided by
    the count in double — identical IEEE operations in both engines
    (native AVG over decimals takes engine-specific accumulation
    paths), per the davg rule in _helpers.py.
    """
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderdate") >= "1999-01-01"
    )
    avg_bal = (
        c.where(F.col("c_acctbal") > 0.0)
        .agg(
            (F.sum(money("c_acctbal")).cast("double") / F.count(F.lit(1)))
            .alias("cut")
        )
    )
    return (
        c.crossJoin(F.broadcast(avg_bal))
        .where(F.col("c_acctbal") > F.col("cut"))
        .join(o, c.c_custkey == o.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            F.sum(money("c_acctbal")).cast("double").alias("total_bal"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q4 shape: correlated EXISTS → leftsemi join against the filtered
# fact, aggregated on the outer side.
# ---------------------------------------------------------------------------
@query(
    "q4_priority_with_returns",
    tags=("semijoin", "subquery", "agg"),
    oracle="""
SELECT o.o_orderpriority AS priority,
       COUNT(*) AS n_orders
FROM orders o
WHERE o.o_orderdate >= TIMESTAMP '1995-07-01'
  AND o.o_orderdate <  TIMESTAMP '1995-10-01'
  AND EXISTS (SELECT 1 FROM lineitem l
              WHERE l.l_orderkey = o.o_orderkey AND l.l_returnflag = 'R')
GROUP BY 1
ORDER BY 1
""",
)
def q4_priority_with_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-priority distribution of 1995Q3 orders that had at least
    one returned line. The EXISTS is a leftsemi join — the probe side
    never duplicates even when an order has many returned lines, which
    is the property that distinguishes it from an inner-join + distinct
    at scale (no exploded intermediate)."""
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1995-07-01") & (F.col("o_orderdate") < "1995-10-01")
    )
    l = load_table(spark, sf_dir, "lineitem").where(F.col("l_returnflag") == "R")
    return (
        o.join(l, o.o_orderkey == l.l_orderkey, "leftsemi")
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q5 shape: local-supplier volume — the join graph closes a cycle
# (customer and supplier must sit in the SAME nation), which is the
# interesting planning property: the equality lands after two
# independent dim joins, not on a join key.
# ---------------------------------------------------------------------------
@query(
    "q5_local_supplier_volume",
    tags=("join", "snowflake", "agg", "cycle"),
    oracle=f"""
SELECT n.n_name AS nation,
       CAST(SUM({sql_money('l.l_extendedprice')} * ({ONE} - {sql_rate('l.l_discount')})) AS DOUBLE) AS revenue
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
                AND c.c_nationkey = s.s_nationkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE o.o_orderdate >= TIMESTAMP '1995-01-01'
  AND o.o_orderdate <  TIMESTAMP '1996-01-01'
GROUP BY 1 ORDER BY 1
""",
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue shipped by suppliers local to the ordering customer, per
    nation, one order year (TPC-H Q5; region filter dropped — the
    driver schema's single region would make it vacuous). The
    c_nationkey = s_nationkey cycle closes on two broadcast-joined
    bounded dims, so Catalyst evaluates it map-side after the fact
    joins; the only big exchanges remain lineitem⋈orders and ⋈customer,
    both on their natural keys."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= "1995-01-01")
        & (F.col("o_orderdate") < "1996-01-01")
    )
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, (l.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(F.sum(_disc_price()).cast("double").alias("revenue"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q6 shape: pure filter + single aggregate — the pushdown benchmark.
# ---------------------------------------------------------------------------
@query(
    "q6_forecast_revenue",
    tags=("filter", "agg", "pushdown"),
    oracle=f"""
SELECT CAST(SUM({M_PRICE} * {R_DISC}) AS DOUBLE) AS revenue,
       COUNT(*) AS n_lines
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1996-01-01'
  AND CAST(l_discount AS DECIMAL(3,2)) BETWEEN 0.05 AND 0.07
  AND l_quantity < 24.0
""",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue increase if discounts in a band were eliminated (TPC-H
    Q6): a pure filtered scan + one aggregate, no joins — the query
    whose entire cost IS the scan, so every predicate must reach the
    parquet reader (date range and quantity push down as min/max
    stats; the decimal-cast discount band evaluates in the scan
    stage). At 100 TB this is the shape that proves column pruning +
    rowgroup skipping work: bytes read, not CPU, decide the runtime."""
    l = load_table(spark, sf_dir, "lineitem")
    return (
        l.where(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
            & rate("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24.0)
        )
        .agg(
            F.sum(money("l_extendedprice") * rate("l_discount"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q9 shape: product profit by nation and year. The driver schema
# has no partsupp, so supply cost is adapted to the part's retail price
# (documented divergence — the JOIN/AGG shape is what's exercised).
# ---------------------------------------------------------------------------
@query(
    "q9_product_profit",
    tags=("join", "snowflake", "agg", "profit"),
    oracle=f"""
SELECT n.n_name AS nation,
       EXTRACT(YEAR FROM o.o_orderdate) AS year,
       CAST(ROUND(SUM({sql_money('l.l_extendedprice')} * ({ONE} - {sql_rate('l.l_discount')})
                      - CAST(p.p_retailprice AS DECIMAL(12,2)) * CAST(l.l_quantity AS DECIMAL(12,2)) * CAST(0.1 AS DECIMAL(2,1))), 2) AS DOUBLE)
         AS profit
FROM lineitem l
JOIN orders o   ON l.l_orderkey = o.o_orderkey
JOIN part p     ON l.l_partkey = p.p_partkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%a%'
GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def q9_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Profit per supplier nation per year for parts matching a name
    pattern (TPC-H Q9 shape; cost adapted to 10% of retail price x
    quantity since the driver schema carries no partsupp — the 5-way
    join + name-pattern filter + two-level rollup is the exercised
    plan). part joins on partkey AFTER its LIKE filter prunes the
    build side; profit arithmetic stays in exact decimals until the
    final round+double."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%a%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    tenth = F.lit("0.1").cast("decimal(2,1)")
    profit = _disc_price() - (
        F.col("p_retailprice").cast("decimal(12,2)")
        * F.col("l_quantity").cast("decimal(12,2)")
        * tenth
    )
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .join(p, l.l_partkey == p.p_partkey)
        .join(s, l.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("year"),
        )
        .agg(F.round(F.sum(profit), 2).cast("double").alias("profit"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q11 shape: groups whose share exceeds a fraction of the GLOBAL
# aggregate — scalar subquery threshold. Adapted from partsupp value to
# part revenue (no partsupp in the driver schema).
# ---------------------------------------------------------------------------
@query(
    "q11_important_parts",
    tags=("agg", "subquery", "having"),
    oracle=f"""
WITH per_part AS (
  SELECT l_partkey, SUM({DISC_PRICE}) AS rev
  FROM lineitem GROUP BY 1
), total AS (
  SELECT CAST(SUM(rev) AS DOUBLE) AS tot, COUNT(*) AS n_parts FROM per_part
)
SELECT p.l_partkey AS partkey,
       CAST(p.rev AS DOUBLE) AS revenue
FROM per_part p CROSS JOIN total t
WHERE CAST(p.rev AS DOUBLE) > t.tot / t.n_parts * 1.5
ORDER BY revenue DESC, partkey
""",
)
def q11_important_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts whose revenue exceeds 1.5x the average part's revenue
    (TPC-H Q11's HAVING-against-global-scalar shape over the driver
    schema; the threshold is relative to the average so the cut stays
    falsifiable at every scale factor, unlike Q11's fixed fraction
    which shrinks per-group share as the part count grows). The global
    total re-uses the per-part aggregate (one scan, one shuffle), then
    broadcasts as a single row; the threshold compare runs on doubles
    derived from the SAME exact decimal sums in both engines, so the
    cut is deterministic."""
    l = load_table(spark, sf_dir, "lineitem")
    per_part = l.groupBy("l_partkey").agg(F.sum(_disc_price()).alias("rev"))
    total = per_part.agg(
        F.sum("rev").cast("double").alias("tot"),
        F.count(F.lit(1)).alias("n_parts"),
    )
    return (
        per_part.crossJoin(F.broadcast(total))
        .where(
            F.col("rev").cast("double")
            > F.col("tot") / F.col("n_parts") * 1.5
        )
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("rev").cast("double").alias("revenue"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q13 shape: distribution of orders-per-customer including the
# zero bucket — left join + two-level aggregation.
# ---------------------------------------------------------------------------
@query(
    "q13_order_count_distribution",
    tags=("join", "agg", "distribution", "leftjoin"),
    oracle="""
WITH per_cust AS (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
  FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
  GROUP BY 1
)
SELECT n_orders, COUNT(*) AS n_customers
FROM per_cust GROUP BY 1
ORDER BY n_customers DESC, n_orders DESC
""",
)
def q13_order_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """How many customers placed how many orders, zero included (TPC-H
    Q13 minus the comment-pattern filter the driver schema lacks). The
    LEFT join keeps order-less customers; COUNT(o_orderkey) — not
    COUNT(*) — makes them count 0. Two aggregations: custkey grain
    (big, co-partitioned with the join) then the tiny histogram."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy(c.c_custkey)
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return (
        per_cust.groupBy("n_orders")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q15 shape: the group(s) achieving the global maximum — aggregate,
# then scalar-max subquery, then equality join back.
# ---------------------------------------------------------------------------
@query(
    "q15_top_supplier",
    tags=("agg", "subquery", "max"),
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         SUM({DISC_PRICE}) AS total_revenue
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate <  TIMESTAMP '1996-04-01'
  GROUP BY 1
)
SELECT s.s_suppkey AS suppkey, s.s_name AS name,
       CAST(r.total_revenue AS DOUBLE) AS total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY suppkey
""",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The supplier(s) with maximum revenue in 1996Q1 (TPC-H Q15). The
    revenue CTE computes once and feeds both the scalar MAX and the
    equality filter (Spark reuses the aggregate subtree; the MAX
    broadcasts as one row). Equality on the EXACT decimal revenue —
    never the double — so ties and the max cut are bit-deterministic
    in both engines."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1996-04-01")
    )
    s = load_table(spark, sf_dir, "supplier")
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        F.sum(_disc_price()).alias("total_revenue")
    )
    top = revenue.agg(F.max("total_revenue").alias("max_rev"))
    return (
        revenue.crossJoin(F.broadcast(top))
        .where(F.col("total_revenue") == F.col("max_rev"))
        .join(s, F.col("supplier_no") == s.s_suppkey)
        .select(
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("name"),
            F.col("total_revenue").cast("double").alias("total_revenue"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q2 shape: minimum-cost supplier. The driver schema has no
# partsupp table, so the supply relationship is derived from lineitem
# itself: supplier S supplies part P iff a lineitem exists, and the
# unit cost is MIN(extendedprice / quantity) over those lines (MIN of
# doubles is shuffle-order independent, so no decimal detour needed).
# What survives the adaptation is exactly the shape Catalyst must plan
# well: a correlated MIN subquery per part (expressed as agg + join),
# a 4-deep dimension chain (supplier -> nation -> region) on the
# subquery side, and a selective part filter joined last.
# ---------------------------------------------------------------------------
@query(
    "q2_min_cost_supplier",
    tags=("join", "subquery", "snowflake", "topk"),
    oracle="""
WITH supply AS (
  SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY 1, 2
), eligible AS (
  SELECT sp.l_partkey, sp.l_suppkey, sp.unit_cost,
         s.s_acctbal, s.s_name, n.n_name
  FROM supply sp
  JOIN supplier s ON sp.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  JOIN region r   ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
), best AS (
  SELECT l_partkey, MIN(unit_cost) AS best_cost FROM eligible GROUP BY 1
)
SELECT e.s_acctbal, e.s_name, e.n_name,
       p.p_partkey AS partkey, p.p_name,
       e.unit_cost
FROM eligible e
JOIN best b ON e.l_partkey = b.l_partkey AND e.unit_cost = b.best_cost
JOIN part p ON e.l_partkey = p.p_partkey
WHERE p.p_type = 'STANDARD' AND p.p_size <= 15
ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, partkey
LIMIT 100
""",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cheapest EUROPE supplier(s) per STANDARD small part, top 100 by
    supplier balance (TPC-H Q2 over the lineitem-derived supply
    relation; reference surface stops at single-dim enrichment,
    build_warehouse.py:115-140). The correlated MIN re-uses the
    eligible aggregate (one lineitem scan, one shuffle on the
    (part,supp) key); nation/region broadcast; the final part filter
    joins AFTER the min cut so only winners reach the part dim. The
    min-cost equality compares doubles produced by the identical
    MIN(extendedprice/quantity) expression in both engines — IEEE
    division and MIN are bit-deterministic. LIMIT 100 rides a full
    deterministic sort (acctbal desc, then unique keys) and plans as
    TakeOrderedAndProject."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    p = load_table(spark, sf_dir, "part")
    supply = l.groupBy("l_partkey", "l_suppkey").agg(
        F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost")
    )
    euro_nk = (
        n.join(F.broadcast(r.where(F.col("r_name") == "EUROPE")),
               n.n_regionkey == F.col("r_regionkey"))
        .select("n_nationkey", "n_name")
    )
    eligible = (
        supply.join(s, supply.l_suppkey == s.s_suppkey)
        .join(F.broadcast(euro_nk), s.s_nationkey == F.col("n_nationkey"))
        .select("l_partkey", "l_suppkey", "unit_cost",
                "s_acctbal", "s_name", "n_name")
    )
    best = eligible.groupBy(F.col("l_partkey").alias("b_partkey")).agg(
        F.min("unit_cost").alias("best_cost")
    )
    return (
        eligible.join(
            best,
            (eligible.l_partkey == F.col("b_partkey"))
            & (eligible.unit_cost == F.col("best_cost")),
        )
        .join(p.where((F.col("p_type") == "STANDARD") & (F.col("p_size") <= 15)),
              F.col("l_partkey") == p.p_partkey)
        .select(
            "s_acctbal", "s_name", "n_name",
            F.col("p_partkey").alias("partkey"), "p_name", "unit_cost",
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "partkey")
        .limit(100)
    )


# ---------------------------------------------------------------------------
# TPC-H Q12 shape: shipping-delay service classes vs order priority.
# The driver lineitem has no shipmode/commitdate/receiptdate, so the
# service class is derived from the ship delay itself (shipdate -
# orderdate banded fast/slow/late); the planner shape preserved is the
# fact-fact join + CASE-conditional counts grouped by a derived
# category, with the date-range predicate pushed to the lineitem scan.
# ---------------------------------------------------------------------------
@query(
    "q12_delay_priority",
    tags=("join", "agg", "conditional", "date"),
    oracle="""
SELECT CASE WHEN DATEDIFF('day', o_orderdate, l_shipdate) >= 90 THEN 'late'
            WHEN DATEDIFF('day', o_orderdate, l_shipdate) >= 30 THEN 'slow'
            ELSE 'fast' END AS delay_band,
       CAST(COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1 END) AS BIGINT) AS high_line_count,
       CAST(COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                       THEN 1 END) AS BIGINT) AS low_line_count
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1995-01-01'
  AND l_shipdate <  TIMESTAMP '1996-01-01'
GROUP BY 1 ORDER BY 1
""",
)
def q12_delay_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Line counts by urgency class across ship-delay bands for 1995
    shipments (TPC-H Q12 with delay bands standing in for shipmode).
    The shipdate range pushes to the parquet scan; the join shuffles
    only the filtered year; the CASE counts are map-side partial
    aggregates. Counts cast to long on both sides (registry rule —
    DuckDB COUNT(CASE) is BIGINT already, the cast pins it)."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
    )
    o = load_table(spark, sf_dir, "orders")
    delay = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .groupBy(
            F.when(delay >= 90, "late")
            .when(delay >= 30, "slow")
            .otherwise("fast")
            .alias("delay_band")
        )
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )


# ---------------------------------------------------------------------------
# TPC-H Q16 shape: how many suppliers can serve each part descriptor,
# excluding a blacklist — NOT IN anti-join + COUNT(DISTINCT) over the
# lineitem-derived supply relation.
# ---------------------------------------------------------------------------
@query(
    "q16_supplier_part_counts",
    tags=("join", "anti", "agg", "distinct"),
    oracle="""
WITH supply AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
SELECT p.p_brand, p.p_type, p.p_size,
       CAST(COUNT(DISTINCT sp.l_suppkey) AS BIGINT) AS supplier_cnt
FROM supply sp JOIN part p ON sp.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#45'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 14, 19, 23, 36, 45)
  AND sp.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
ORDER BY supplier_cnt DESC, p.p_brand, p.p_type, p.p_size
""",
)
def q16_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct supplier counts per (brand, type, size) descriptor,
    excluding negative-balance suppliers (TPC-H Q16; the acctbal
    blacklist stands in for the comment-based complaints filter, the
    supply relation is lineitem-derived as in q2). The NOT IN plans as
    a broadcast anti-join against the 100-row supplier dim; the
    descriptor filter prunes part before the join; COUNT(DISTINCT)
    shuffles once on the descriptor key with the suppkey carried for
    the distinct."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    s = load_table(spark, sf_dir, "supplier")
    supply = l.select("l_partkey", "l_suppkey").distinct()
    bad = s.where(F.col("s_acctbal") < 0).select("s_suppkey")
    pf = p.where(
        (F.col("p_brand") != "Brand#45")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 4, 9, 14, 19, 23, 36, 45)
    )
    return (
        supply.join(F.broadcast(bad), supply.l_suppkey == F.col("s_suppkey"),
                    "left_anti")
        .join(pf, F.col("l_partkey") == pf.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q20 shape: suppliers holding an outsized share of a part's
# flow. Without partsupp.availqty, "excess stock" is recast as flow
# dominance: a supplier shipped more than half of a part's total 1995
# quantity. Preserves the nested-subquery chain (per-(supp,part) agg,
# per-part agg, threshold compare, then a semi-join up to the supplier
# dim and its nation).
# ---------------------------------------------------------------------------
@query(
    "q20_dominant_suppliers",
    tags=("join", "subquery", "semi", "agg"),
    oracle="""
WITH shipped AS (
  SELECT l_suppkey, l_partkey,
         SUM(CAST(l_quantity AS DECIMAL(12,2))) AS qty_s
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small%'
    AND l_shipdate >= TIMESTAMP '1995-01-01'
    AND l_shipdate <  TIMESTAMP '1996-01-01'
  GROUP BY 1, 2
), totals AS (
  SELECT l_partkey, CAST(SUM(qty_s) AS DOUBLE) AS qty_t
  FROM shipped GROUP BY 1
)
SELECT s.s_suppkey AS suppkey, s.s_name, n.n_name,
       CAST(COUNT(*) AS BIGINT) AS n_dominant_parts
FROM shipped sh
JOIN totals t ON sh.l_partkey = t.l_partkey
JOIN supplier s ON sh.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE CAST(sh.qty_s AS DOUBLE) > 0.5 * t.qty_t
GROUP BY 1, 2, 3
ORDER BY s.s_name
""",
)
def q20_dominant_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who shipped >50% of some small-part's total 1995 flow
    (TPC-H Q20's excess-stock chain recast over shipment flow). Part
    name prefix + shipdate range push to the scans; the per-part total
    re-aggregates the per-(supp,part) sums (no second lineitem scan);
    quantity sums go through exact decimal then compare as doubles
    derived identically in both engines. The supplier/nation joins see
    only dominant rows."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= "1995-01-01") & (F.col("l_shipdate") < "1996-01-01")
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").startswith("small"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    shipped = (
        l.join(p, l.l_partkey == p.p_partkey)
        .groupBy("l_suppkey", "l_partkey")
        .agg(F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("qty_s"))
    )
    totals = shipped.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        F.sum("qty_s").cast("double").alias("qty_t")
    )
    return (
        shipped.join(totals, shipped.l_partkey == F.col("t_partkey"))
        .where(F.col("qty_s").cast("double") > 0.5 * F.col("qty_t"))
        .join(s, shipped.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy(
            F.col("s_suppkey").alias("suppkey"), "s_name", "n_name"
        )
        .agg(F.count(F.lit(1)).alias("n_dominant_parts"))
    )


# ---------------------------------------------------------------------------
# TPC-H Q21 shape: suppliers who single-handedly held up multi-supplier
# orders. Without commit/receipt dates, "late" is shipdate more than 60
# days past the order date. The EXISTS (another supplier on the order)
# and NOT EXISTS (no OTHER late supplier) pair is expressed as
# per-order distinct-supplier aggregates — one pass, no correlated
# re-scan — exactly how a 100 TB plan should phrase it.
# ---------------------------------------------------------------------------
@query(
    "q21_waiting_suppliers",
    tags=("join", "exists", "agg", "topk"),
    oracle="""
WITH lo AS (
  SELECT l_orderkey, l_suppkey,
         (l_shipdate > o_orderdate + INTERVAL 60 DAY) AS late
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
  WHERE o_orderstatus = 'F'
), per_order AS (
  SELECT l_orderkey,
         COUNT(DISTINCT l_suppkey) AS n_supp,
         COUNT(DISTINCT CASE WHEN late THEN l_suppkey END) AS n_late
  FROM lo GROUP BY 1
)
SELECT s.s_name, CAST(COUNT(*) AS BIGINT) AS numwait
FROM (SELECT DISTINCT l_orderkey, l_suppkey FROM lo WHERE late) ll
JOIN per_order po ON ll.l_orderkey = po.l_orderkey
                 AND po.n_supp > 1 AND po.n_late = 1
JOIN supplier s ON ll.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN region r   ON n.n_regionkey = r.r_regionkey
WHERE r.r_name = 'ASIA'
GROUP BY 1
ORDER BY numwait DESC, s.s_name
""",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ASIA suppliers who were the sole late shipper on finished
    multi-supplier orders, ranked by how many orders they held up
    (TPC-H Q21). One lineitem+orders join feeds BOTH the per-order
    supplier census and the late-line set (Spark reuses the subtree);
    the exists/not-exists pair becomes n_supp > 1 AND n_late = 1 —
    per-order aggregates instead of two correlated re-scans. Region
    filter broadcast-prunes the supplier dim after the heavy work."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(F.col("o_orderstatus") == "F")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    late = F.col("l_shipdate") > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS")
    lo = (
        l.join(o, l.l_orderkey == o.o_orderkey)
        .select("l_orderkey", "l_suppkey", late.alias("late"))
    )
    per_order = lo.groupBy(F.col("l_orderkey").alias("po_orderkey")).agg(
        F.count_distinct("l_suppkey").alias("n_supp"),
        F.count_distinct(F.when(F.col("late"), F.col("l_suppkey"))).alias("n_late"),
    )
    late_lines = lo.where("late").select("l_orderkey", "l_suppkey").distinct()
    asia_nk = (
        n.join(F.broadcast(r.where(F.col("r_name") == "ASIA")),
               n.n_regionkey == F.col("r_regionkey"))
        .select("n_nationkey")
    )
    return (
        late_lines.join(
            per_order,
            (late_lines.l_orderkey == F.col("po_orderkey"))
            & (F.col("n_supp") > 1) & (F.col("n_late") == 1),
        )
        .join(s, late_lines.l_suppkey == s.s_suppkey)
        .join(F.broadcast(asia_nk), s.s_nationkey == F.col("n_nationkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
