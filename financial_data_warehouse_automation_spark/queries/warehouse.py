"""Warehouse-semantics queries: the reference's A1/A2/A3 operators
instantiated over the driver tables for the oracle harness.

The operator implementations live in ``operators/warehouse.py``; these
queries bind them to orders/customer/part data so the driver can
hash-check them against DuckDB. The run-twice idempotency fixed point
(SURVEY §2.11 D4) is asserted in ``tests/test_warehouse_ops.py``.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from financial_data_warehouse_automation_spark.operators.warehouse import (
    dedupe_keep_first,
    qa_ledger_merge,
    upsert_keep_last,
)
from financial_data_warehouse_automation_spark.queries._helpers import money, sql_money
from financial_data_warehouse_automation_spark.registry import query
from financial_data_warehouse_automation_spark.tables import load_table


def _monthly_spend(o: DataFrame, src: str) -> DataFrame:
    return o.groupBy(
        F.col("o_custkey").alias("custkey"),
        F.year("o_orderdate").cast("long").alias("year"),
        F.month("o_orderdate").cast("long").alias("month"),
    ).agg(
        F.sum(money("o_totalprice")).cast("double").alias("amount"),
        F.lit(src).alias("src"),
    )


_MONTHLY_SQL = """
  SELECT o_custkey AS custkey,
         EXTRACT(YEAR FROM o_orderdate) AS year,
         EXTRACT(MONTH FROM o_orderdate) AS month,
         CAST(SUM({money}) AS DOUBLE) AS amount,
         '{src}' AS src
  FROM orders WHERE {pred}
  GROUP BY 1, 2, 3
""".strip()


@query(
    "upsert_keep_last",
    headline=True,
    tags=("warehouse", "upsert", "a2"),
    oracle=f"""
WITH existing AS (
  {_MONTHLY_SQL.format(money=sql_money('o_totalprice'), src='old',
                       pred="o_orderdate < TIMESTAMP '1996-01-01'")}
), updates AS (
  {_MONTHLY_SQL.format(money=sql_money('o_totalprice'), src='new',
                       pred="EXTRACT(YEAR FROM o_orderdate) >= 1995")}
), unioned AS (
  SELECT *, 0 AS pri FROM existing
  UNION ALL
  SELECT *, 1 AS pri FROM updates
)
SELECT custkey, year, month, amount, src
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY custkey, year, month
                               ORDER BY pri DESC) AS rn
  FROM unioned
)
WHERE rn = 1
ORDER BY custkey, year, month
""",
)
def upsert_keep_last_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2: 'existing' warehouse (loads through 1995) upserted with a
    re-delivered 1995+ batch — overlapping keys (year 1995) must come
    out with src='new', proving last-write-wins; the src column is in
    the hash so a wrong survivor fails loudly.

    Plan shape (r15): in this harness both "deliveries" are overlapping
    filters of the SAME fact table, so the union + row_number form
    scanned and shuffled orders twice (the per-branch pushed filters
    make the two exchanges non-reusable) and then sorted the union for
    the keep-last window. One conditional aggregate computes both
    branch sums in a single scan + single shuffle and picks the A2
    survivor per key — optimization-guide §2.3 (aggregate before you
    shuffle) + §8 (use what you know: the deliveries share a source).
    Oracle-identical to the union+window form (verified exact at both
    SFs); the generic ``upsert_keep_last`` OPERATOR (union + W4 window
    over genuinely distinct frames) remains the A2 anchor in
    warehouse_upsert_snapshot, both monthly loops, and
    tests/test_warehouse_ops.py. ``spread_by`` on custkey: hash(custkey)
    satisfies the (custkey, year, month) clustering, so the aggregate
    runs partition-local on the harness's single-row-group scan (plan
    no-op on a split table)."""
    o = load_table(spark, sf_dir, "orders", spread_by=("o_custkey",))
    merged = (
        o.groupBy(
            F.col("o_custkey").alias("custkey"),
            F.year("o_orderdate").cast("long").alias("year"),
            F.month("o_orderdate").cast("long").alias("month"),
        )
        .agg(
            F.sum(
                F.when(
                    F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp"),
                    money("o_totalprice"),
                )
            ).cast("double").alias("_amt_old"),
            F.sum(
                F.when(F.year("o_orderdate") >= 1995, money("o_totalprice"))
            ).cast("double").alias("_amt_new"),
        )
        # a key has an update iff ANY of its rows lies in the re-delivered
        # range; the exact-decimal branch sums make either survivor
        # bit-identical to the union+window form's
        .selectExpr(
            "custkey", "year", "month",
            "CASE WHEN _amt_new IS NOT NULL THEN _amt_new ELSE _amt_old END"
            " AS amount",
            "CASE WHEN _amt_new IS NOT NULL THEN 'new' ELSE 'old' END AS src",
        )
    )
    # no final ORDER BY (r15): order-insensitive gate; the global sort
    # was a range exchange + sampling pass (guide §2.4).
    return merged


@query(
    "warehouse_upsert_snapshot",
    tags=("warehouse", "upsert", "a2", "snapshot", "occ", "cow",
          "time-travel"),
    oracle=f"""
WITH existing AS (
  {_MONTHLY_SQL.format(money=sql_money('o_totalprice'), src='old',
                       pred="o_orderdate < TIMESTAMP '1998-01-01'")}
), updates AS (
  {_MONTHLY_SQL.format(money=sql_money('o_totalprice'), src='new',
                       pred="EXTRACT(YEAR FROM o_orderdate) >= 1997"
                            " AND o_custkey % 2 = 1")}
), merged AS (
  SELECT custkey, year, month, amount, src FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY custkey, year, month
                                 ORDER BY pri DESC) AS rn
    FROM (SELECT *, 0 AS pri FROM existing
          UNION ALL
          SELECT *, 1 AS pri FROM updates)
  ) WHERE rn = 1
)
SELECT CAST('v1' AS VARCHAR) AS snapshot, year, src,
       CAST(COUNT(*) AS BIGINT) AS n_keys,
       CAST(SUM(CAST(ROUND(amount * 100, 0) AS BIGINT)) AS BIGINT) AS cents
FROM existing GROUP BY year, src
UNION ALL
SELECT 'v2', year, src, CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(ROUND(amount * 100, 0) AS BIGINT)) AS BIGINT)
FROM merged GROUP BY year, src
UNION ALL
SELECT 'v3', year, src, CAST(COUNT(*) AS BIGINT),
       CAST(SUM(CAST(ROUND(amount * 100, 0) AS BIGINT)) AS BIGINT)
FROM merged WHERE NOT (custkey % 7 = 0 AND year = 1997)
GROUP BY year, src
ORDER BY snapshot, year, src
""",
)
def warehouse_upsert_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE AS A SNAPSHOT COMMIT — the round-11 MVCC primitives
    (operators/snapshots.py) composed with the engine's actual write
    path: the reference's idempotent monthly load
    (build_warehouse.py:159-169 ``keep="last"``; Code.gs:264-274 map
    overwrite) executed as a copy-on-write commit against a versioned
    manifest table, so the warehouse gains time travel, snapshot
    isolation, and multi-writer safety without changing the A2
    operator at all.

    Script (every step asserted in-builder, every snapshot's CONTENT
    hash-certified by the oracle's replay from raw orders):

    1. v1 — the existing warehouse (monthly spend through 1997),
       written ONCE with ``partitionBy`` on the year and published as
       manifest v1 mapping period buckets '1995'..'1997' to the
       partition directories.
    2. Writer A — a re-delivered correction batch (odd custkeys,
       1997+) runs ``upsert_keep_last`` against ONLY the buckets it
       touches: bucket '1997' is read, merged, rewritten COW; buckets
       '1998'..'2001' are brand-new manifest keys; '1995'/'1996' are
       carried VERBATIM (asserted) — the monthly load touches its
       month, never the table.
    3. Writer B — a concurrent data-quality delete (custkey % 7 = 0
       in 1997) staged against the SAME base v1 loses the manifest
       CAS (SnapshotConflict asserted). Note what blind clobbering
       would have lost: B's stale manifest lacks A's 1998-2001
       buckets entirely — manifest-granularity lost update, not just
       row-level.
    4. B REBASES: re-reads latest (asserted == A's v2, so the delete
       re-applies on top of A's merged bucket), rewrites '1997',
       commits v3.
    5. Time travel: v1's aggregate, collected before any writer ran,
       equals the v1-manifest re-read AFTER v3 (asserted) — last
       month's warehouse stays auditable forever.

    The returned frame aggregates all three snapshots (year x src
    grain, exact integer cents) through their manifests — the
    versioned read surface itself is what the driver hash-checks.
    At 100 TB: the bucket key is (year, month) and the staged write
    is dynamic-partition-sized, commit cost stays one manifest
    create; this is Delta/Iceberg MERGE + optimistic commit with the
    log-entry swap spelled out (snapshots.py docstring carries the
    conditional-put mapping)."""
    from financial_data_warehouse_automation_spark.operators.snapshots import (
        SnapshotConflict,
        read_manifest,
        try_commit,
    )
    from financial_data_warehouse_automation_spark.queries._helpers import scratch_dir

    table = scratch_dir("wh_snap_")
    o = load_table(spark, sf_dir, "orders")
    existing = _monthly_spend(
        o.where(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp")),
        "old",
    )
    updates = _monthly_spend(
        o.where(
            (F.year("o_orderdate") >= 1997) & (F.col("o_custkey") % 2 == 1)
        ),
        "new",
    )

    def write_partitioned(df: DataFrame, gen: str) -> dict[str, str]:
        """One partitioned write; returns bucket-id -> partition dir.
        ``py`` duplicates ``year`` so the data files keep the year
        column (reading a single partition dir sees file columns
        only)."""
        root = os.path.join(table, gen)
        df.withColumn("py", F.col("year")).write.partitionBy("py").parquet(
            root
        )
        return {
            n.split("=", 1)[1]: os.path.join(root, n)
            for n in os.listdir(root)
            if n.startswith("py=")
        }

    v1_map = write_partitioned(existing, "g1")
    assert try_commit(table, 0, v1_map) == 1

    def agg(version: int, tag: str) -> DataFrame:
        dirs = list(read_manifest(table, version).values())
        return (
            spark.read.parquet(*dirs)
            .groupBy("year", "src")
            .agg(
                F.count(F.lit(1)).cast("long").alias("n_keys"),
                F.sum(F.round(F.col("amount") * 100, 0).cast("bigint"))
                .cast("bigint")
                .alias("cents"),
            )
            .select(F.lit(tag).alias("snapshot"), "year", "src", "n_keys",
                    "cents")
        )

    v1_before = sorted(map(tuple, agg(1, "v1").collect()))

    # writer A: the A2 merge, COW over only the buckets updates touch
    a_base = read_manifest(table, 1)
    merged_a = upsert_keep_last(
        spark.read.parquet(a_base["1997"]), updates,
        ["custkey", "year", "month"],
    )
    a_map = dict(a_base)
    a_map.update(write_partitioned(merged_a, "g2"))
    assert try_commit(table, 1, a_map) == 2
    shared = [b for b in v1_map if a_map[b] == v1_map[b]]
    assert sorted(shared) == ["1995", "1996"], shared
    assert sorted(a_map) == [str(y) for y in range(1995, 2002)], a_map

    # writer B: concurrent quality delete staged against the SAME base
    dele = (F.col("custkey") % 7 == 0) & (F.col("year") == 1997)

    def b_rewrite(src_map: dict[str, str], gen: str) -> dict[str, str]:
        out = dict(src_map)
        d = os.path.join(table, gen)
        spark.read.parquet(src_map["1997"]).where(~dele).write.parquet(d)
        out["1997"] = d
        return out

    conflicted = False
    try:
        try_commit(table, 1, b_rewrite(a_base, "g2b"))
    except SnapshotConflict:
        conflicted = True
    assert conflicted, "stale-base merge must conflict, not clobber"

    latest = read_manifest(table)
    assert latest == a_map, "rebase must see A's committed merge"
    assert try_commit(table, 2, b_rewrite(latest, "g3")) == 3

    # time travel: the pre-writer warehouse is still byte-stable
    assert sorted(map(tuple, agg(1, "v1").collect())) == v1_before

    return (
        agg(1, "v1")
        .unionByName(agg(2, "v2"))
        .unionByName(agg(3, "v3"))
    )


@query(
    "qa_ledger_snapshot_history",
    tags=("warehouse", "qa", "a3", "snapshot", "time-travel", "stateful"),
    oracle="""
WITH inactive96 AS (
  SELECT c_custkey AS custkey FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                    AND EXTRACT(YEAR FROM o.o_orderdate) = 1996)
), inactive97 AS (
  SELECT c_custkey AS custkey FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                    AND EXTRACT(YEAR FROM o.o_orderdate) = 1997)
), inactive98 AS (
  SELECT c_custkey AS custkey FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                    AND EXTRACT(YEAR FROM o.o_orderdate) = 1998)
), led1 AS (
  SELECT custkey, CAST('Open' AS VARCHAR) AS status,
         DATE '1997-01-01' AS last_seen
  FROM inactive96
), led2 AS (
  SELECT COALESCE(m.custkey, l.custkey) AS custkey,
         CASE WHEN m.custkey IS NOT NULL THEN 'Open' ELSE 'Resolved' END
           AS status,
         CASE WHEN m.custkey IS NOT NULL THEN DATE '1998-01-01'
              ELSE l.last_seen END AS last_seen
  FROM inactive97 m FULL OUTER JOIN led1 l ON m.custkey = l.custkey
), led3 AS (
  SELECT COALESCE(m.custkey, l.custkey) AS custkey,
         CASE WHEN m.custkey IS NOT NULL THEN 'Open' ELSE 'Resolved' END
           AS status,
         CASE WHEN m.custkey IS NOT NULL THEN DATE '1999-01-01'
              ELSE l.last_seen END AS last_seen
  FROM inactive98 m FULL OUTER JOIN led2 l ON m.custkey = l.custkey
)
SELECT CAST('v1' AS VARCHAR) AS version, custkey, status, last_seen
FROM led1
UNION ALL SELECT 'v2', custkey, status, last_seen FROM led2
UNION ALL SELECT 'v3', custkey, status, last_seen FROM led3
ORDER BY version, custkey
""",
)
def qa_ledger_snapshot_history(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 QA LEDGER AS A VERSIONED SNAPSHOT CHAIN: each run's
    Open/Resolved state machine transition (Code.gs:283-317) lands as
    an immutable snapshot commit, so the ledger's full revision
    history — the thing the reference's Google Sheet gives its users
    for free via sheet version history — is a first-class,
    time-travelable read surface.

    Three runs over successive activity years: v1 = customers
    inactive in 1996 (all Open); v2 = ``qa_ledger_merge`` with 1997's
    misses (Resolved keys keep their old last_seen — asserted by the
    oracle's replay); v3 = the 1998 run ON TOP of the v2 SNAPSHOT
    READ — the state feeding each transition is the committed
    previous version, not an in-memory frame, which is what makes
    the pipeline restartable at any version. Keys can flip
    Open -> Resolved -> Open across the chain (re-inactive
    customers); the returned frame is every version's FULL ledger
    tagged by version, so the driver hashes the entire history, and
    the v1 re-read after v3 is asserted unchanged (isolation).

    Scale: the ledger is per-issue-key metadata (millions of rows at
    most, one bucket here); the snapshot cost is O(ledger), never
    O(warehouse) — and each transition is the one full-outer join
    qa_ledger_merge already pays."""
    from financial_data_warehouse_automation_spark.operators.snapshots import (
        read_manifest,
        try_commit,
    )
    from financial_data_warehouse_automation_spark.queries._helpers import scratch_dir

    table = scratch_dir("qa_snap_")
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")

    def inactive_in(year: int) -> DataFrame:
        yr = o.where(F.year("o_orderdate") == year)
        return c.join(yr, c.c_custkey == yr.o_custkey, "left_anti").select(
            F.col("c_custkey").alias("custkey")
        )

    def commit_ledger(df: DataFrame, base: int, gen: str) -> int:
        d = os.path.join(table, gen)
        df.select("custkey", "status", "last_seen").write.parquet(d)
        return try_commit(table, base, {"ledger": d})

    def read_ledger(version: int) -> DataFrame:
        return spark.read.schema("custkey long, status string, last_seen date").parquet(
            read_manifest(table, version)["ledger"]
        )

    led1 = inactive_in(1996).select(
        "custkey",
        F.lit("Open").alias("status"),
        F.lit("1997-01-01").cast("date").alias("last_seen"),
    )
    assert commit_ledger(led1, 0, "g1") == 1
    v1_before = sorted(map(tuple, read_ledger(1).collect()))

    led2 = qa_ledger_merge(
        read_ledger(1), inactive_in(1997), ["custkey"],
        seen_col=F.lit("1998-01-01").cast("date"),
    )
    assert commit_ledger(led2, 1, "g2") == 2
    led3 = qa_ledger_merge(
        read_ledger(2), inactive_in(1998), ["custkey"],
        seen_col=F.lit("1999-01-01").cast("date"),
    )
    assert commit_ledger(led3, 2, "g3") == 3

    assert sorted(map(tuple, read_ledger(1).collect())) == v1_before

    def tagged(version: int, tag: str) -> DataFrame:
        return read_ledger(version).select(
            F.lit(tag).alias("version"), "custkey", "status", "last_seen"
        )

    return (
        tagged(1, "v1")
        .unionByName(tagged(2, "v2"))
        .unionByName(tagged(3, "v3"))
    )


@query(
    "dim_dedupe_first",
    tags=("warehouse", "dedupe", "a1"),
    oracle="""
SELECT brand, container, partkey, name
FROM (
  SELECT p_brand AS brand, p_type AS container,
         p_partkey AS partkey, p_name AS name,
         ROW_NUMBER() OVER (PARTITION BY p_brand, p_type
                            ORDER BY p_partkey) AS rn
  FROM part
)
WHERE rn = 1
ORDER BY brand, container
""",
)
def dim_dedupe_first_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1: deterministic keep-first dedupe of a dirty dimension —
    (brand, container) plays the GL-code key, lowest partkey is 'first'
    (the reference's file order made explicit; §2.11 D5)."""
    p = load_table(spark, sf_dir, "part").select(
        F.col("p_brand").alias("brand"),
        F.col("p_type").alias("container"),
        F.col("p_partkey").alias("partkey"),
        F.col("p_name").alias("name"),
    )
    return dedupe_keep_first(
        p, ["brand", "container"], [F.asc("partkey")]
    )


@query(
    "qa_ledger_transitions",
    tags=("warehouse", "qa", "a3", "stateful"),
    oracle="""
WITH ledger AS (
  SELECT c_custkey AS custkey, 'Open' AS status, DATE '1996-01-01' AS last_seen
  FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                    AND EXTRACT(YEAR FROM o.o_orderdate) = 1995)
), misses AS (
  SELECT c_custkey AS custkey FROM customer c
  WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
                    AND EXTRACT(YEAR FROM o.o_orderdate) = 1996)
)
SELECT COALESCE(m.custkey, l.custkey) AS custkey,
       CASE WHEN m.custkey IS NOT NULL THEN 'Open' ELSE 'Resolved' END AS status,
       CASE WHEN m.custkey IS NOT NULL THEN DATE '1997-01-01'
            ELSE l.last_seen END AS last_seen
FROM misses m FULL OUTER JOIN ledger l ON m.custkey = l.custkey
ORDER BY custkey
""",
)
def qa_ledger_transitions_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3: Open/Resolved lifecycle. Ledger = customers inactive in 1995
    (the 'missing GL codes' of the driver schema); current misses =
    customers inactive in 1996. Keys present only in the ledger flip to
    Resolved and keep their old last_seen; active misses stamp the new
    run date — exactly Code.gs:283-317's transitions."""
    c = load_table(spark, sf_dir, "customer")
    o = load_table(spark, sf_dir, "orders")

    def inactive_in(year: int) -> DataFrame:
        yr = o.where(F.year("o_orderdate") == year)
        return c.join(yr, c.c_custkey == yr.o_custkey, "left_anti").select(
            F.col("c_custkey").alias("custkey")
        )

    ledger = inactive_in(1995).select(
        "custkey",
        F.lit("Open").alias("status"),
        F.lit("1996-01-01").cast("date").alias("last_seen"),
    )
    misses = inactive_in(1996)
    merged = qa_ledger_merge(
        ledger, misses, ["custkey"],
        seen_col=F.lit("1997-01-01").cast("date"),
    )
    return merged


@query(
    "merge_with_tombstones",
    tags=("warehouse", "upsert", "cdc", "delete"),
    oracle=f"""
WITH existing AS (
  {_MONTHLY_SQL.format(money=sql_money('o_totalprice'), src='old',
                       pred="o_orderdate < TIMESTAMP '1996-01-01'")}
), changes AS (
  SELECT *, CASE WHEN custkey % 7 = 0 THEN 'D' ELSE 'U' END AS op
  FROM ({_MONTHLY_SQL.format(money=sql_money('o_totalprice'), src='new',
                             pred="EXTRACT(YEAR FROM o_orderdate) >= 1995")})
), unioned AS (
  SELECT custkey, year, month, amount, src, 'U' AS op, 0 AS pri FROM existing
  UNION ALL
  SELECT custkey, year, month, amount, src, op, 1 AS pri FROM changes
), merged AS (
  SELECT * FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY custkey, year, month
                                 ORDER BY pri DESC) AS rn
    FROM unioned
  ) WHERE rn = 1
)
SELECT custkey, year, month, amount, src
FROM merged WHERE op <> 'D'
ORDER BY custkey, year, month
""",
)
def merge_with_tombstones_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC merge: an A2 upsert whose change feed carries delete
    tombstones (op='D') alongside updates — the shape every
    change-data-capture load reduces to (Delta/Iceberg MERGE WHEN
    MATCHED AND op='D' THEN DELETE; here the format-agnostic window
    form). A tombstone must beat the existing row AND erase the key
    from the output — keys present only as tombstones stay absent.
    Same single key-shuffle as upsert_keep_last; the delete filter is
    free post-window. Synthetic feed: every 7th custkey's 1995+ rows
    arrive as deletes."""
    o = load_table(spark, sf_dir, "orders")
    existing = _monthly_spend(
        o.where(F.col("o_orderdate") < F.lit("1996-01-01").cast("timestamp")), "old"
    ).withColumn("op", F.lit("U"))
    changes = _monthly_spend(
        o.where(F.year("o_orderdate") >= 1995), "new"
    ).withColumn(
        "op",
        F.when(F.col("custkey") % 7 == 0, F.lit("D")).otherwise(F.lit("U")),
    )
    merged = upsert_keep_last(existing, changes, key=("custkey", "year", "month"))
    return (
        merged.where(F.col("op") != "D")
        .select("custkey", "year", "month", "amount", "src")
    )


_SNAP_SQL = """
  SELECT o_custkey AS custkey,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
           AS cents
  FROM orders WHERE o_orderdate < TIMESTAMP '{cutoff}'
  GROUP BY 1
""".strip()


@query(
    "warehouse_snapshot_diff",
    tags=("warehouse", "audit", "diff", "cdc"),
    oracle=f"""
WITH snap_a AS (
  {_SNAP_SQL.format(cutoff='1996-01-01')}
), snap_b AS (
  {_SNAP_SQL.format(cutoff='1997-01-01')}
)
SELECT COALESCE(b.custkey, a.custkey) AS custkey,
       CASE WHEN a.custkey IS NULL THEN 'added' ELSE 'changed' END
         AS change_type,
       CAST(COALESCE(b.n_orders, 0) - COALESCE(a.n_orders, 0) AS BIGINT)
         AS delta_orders,
       CAST(COALESCE(b.cents, 0) - COALESCE(a.cents, 0) AS BIGINT)
         AS delta_cents
FROM snap_a a FULL OUTER JOIN snap_b b ON a.custkey = b.custkey
WHERE a.custkey IS NULL
   OR b.n_orders <> a.n_orders OR b.cents <> a.cents
ORDER BY custkey
""",
)
def warehouse_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audit diff between two warehouse snapshots (per-customer order
    count + spend as of 1996-01-01 vs 1997-01-01): who appeared, whose
    totals moved, and by how much — the reconciliation report the
    reference's QA sheet implies but never materializes
    (build_warehouse.py's Open/Resolved ledger tracks only missing
    mappings). Money is summed as exact integer cents so the equality
    test between snapshots cannot be poisoned by double addition order.
    Shape: the cutoffs are NESTED (every pre-1996 order is also
    pre-1997), so BOTH snapshots come from ONE conditional aggregate
    over one scan — no second scan, no full-outer join, one
    customer-key shuffle total. Round 5 replaced the two-aggregate +
    full-outer formulation: its docstring claimed Spark would reuse
    the exchange, but the differing cutoff filters make the subtrees
    non-identical, so the executed plan actually ran 4 scans and 6
    exchanges (now 1 and 1 — pinned in test_plan_hygiene.py). A
    customer 'added' between snapshots is one whose pre-A order count
    is zero. The DuckDB oracle keeps the textbook two-snapshot FULL
    OUTER JOIN formulation, so the hash also proves the rewrite
    equivalent. At 100 TB with NON-nested snapshots, stored aggregates
    + one co-partitioned join is the fallback."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    in_a = F.col("o_orderdate") < "1996-01-01"
    per_cust = (
        o.where(F.col("o_orderdate") < "1997-01-01")
        .groupBy(F.col("o_custkey").alias("custkey"))
        .agg(
            F.count(F.when(in_a, 1)).alias("a_n"),
            F.coalesce(F.sum(F.when(in_a, cents)), F.lit(0)).alias("a_cents"),
            F.count(F.lit(1)).alias("b_n"),
            F.sum(cents).alias("b_cents"),
        )
    )
    return (
        per_cust.where(
            (F.col("a_n") == 0)
            | (F.col("b_n") != F.col("a_n"))
            | (F.col("b_cents") != F.col("a_cents"))
        )
        .select(
            "custkey",
            F.when(F.col("a_n") == 0, "added")
            .otherwise("changed")
            .alias("change_type"),
            (F.col("b_n") - F.col("a_n")).cast("long").alias("delta_orders"),
            (F.col("b_cents") - F.col("a_cents"))
            .cast("long")
            .alias("delta_cents"),
        )
    )


@query(
    "mv_incremental_refresh",
    tags=("warehouse", "mv", "incremental", "agg"),
    oracle="""
SELECT EXTRACT(YEAR FROM o_orderdate) AS year,
       EXTRACT(MONTH FROM o_orderdate) AS month,
       CAST(COUNT(*) AS BIGINT) AS n_orders,
       CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
         / 100.0 AS revenue
FROM orders
GROUP BY 1, 2 ORDER BY 1, 2
""",
)
def mv_incremental_refresh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Materialized-view maintenance by partial-aggregate merge: the
    monthly revenue MV is refreshed by unioning the stored base
    aggregate (orders before 1997) with a partial aggregate of only the
    new partition (1997+) and re-reducing — never rescanning history.
    Works because count/sum are commutative monoids; the oracle is the
    full recompute, proving merge == rebuild. Integer-cent sums make
    the merge exact regardless of partition order. At 100 TB the base
    side is a stored table a few million rows wide (month grain), so
    the refresh cost is O(delta) + a shuffle keyed on the MV grain —
    this query IS the incremental plan, with the base partial standing
    in for the stored MV."""
    o = load_table(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    grain = [
        F.year("o_orderdate").cast("long").alias("year"),
        F.month("o_orderdate").cast("long").alias("month"),
    ]

    def partial(pred) -> DataFrame:
        return (
            o.where(pred)
            .groupBy(*grain)
            .agg(F.count(F.lit(1)).alias("n"), F.sum(cents).alias("c"))
        )

    base = partial(F.col("o_orderdate") < "1997-01-01")       # stored MV
    delta = partial(F.col("o_orderdate") >= "1997-01-01")     # new data
    return (
        base.unionByName(delta)
        .groupBy("year", "month")
        .agg(
            F.sum("n").alias("n_orders"),
            (F.sum("c") / F.lit(100.0)).alias("revenue"),
        )
    )


@query(
    "warehouse_referential_audit",
    tags=("warehouse", "audit", "qa", "anti"),
    oracle="""
SELECT 'lineitem->orders' AS relationship,
       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT) AS n_child,
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE l.l_orderkey NOT IN (SELECT o_orderkey FROM orders))
            AS BIGINT) AS n_orphans
UNION ALL
SELECT 'orders->customer',
       CAST((SELECT COUNT(*) FROM orders) AS BIGINT),
       CAST((SELECT COUNT(*) FROM orders o
             WHERE o.o_custkey NOT IN (SELECT c_custkey FROM customer))
            AS BIGINT)
UNION ALL
SELECT 'lineitem->part',
       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE l.l_partkey NOT IN (SELECT p_partkey FROM part))
            AS BIGINT)
UNION ALL
SELECT 'lineitem->supplier',
       CAST((SELECT COUNT(*) FROM lineitem) AS BIGINT),
       CAST((SELECT COUNT(*) FROM lineitem l
             WHERE l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier))
            AS BIGINT)
UNION ALL
SELECT 'customer->nation',
       CAST((SELECT COUNT(*) FROM customer) AS BIGINT),
       CAST((SELECT COUNT(*) FROM customer c
             WHERE c.c_nationkey NOT IN (SELECT n_nationkey FROM nation))
            AS BIGINT)
ORDER BY relationship
""",
)
def warehouse_referential_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Referential-integrity audit across the star schema: orphan
    counts for every FK relationship in one report — the structural
    extension of the reference's missing-GL-mapping QA (its ledger
    tracks exactly one such relationship; build_warehouse.py:86-99).
    All of a child table's checks run in ONE streamed pass (round 7;
    the per-check anti-join form scanned lineitem SIX times — 2 scans
    x 3 relationships): left-join every parent's DISTINCT key set
    (distinct makes the n:1 row-preservation provable, so COUNT(*) is
    still n_child), then one conditional aggregate counts NULL parent
    keys per relationship. At 100 TB that is one fact scan + k dim
    joins (broadcast when bounded, AQE decides otherwise) instead of
    2k fact scans; no NOT IN correlated re-scan anywhere."""
    checks = [
        ("lineitem->orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("orders->customer", "orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem->part", "lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem->supplier", "lineitem", "l_suppkey", "supplier", "s_suppkey"),
        ("customer->nation", "customer", "c_nationkey", "nation", "n_nationkey"),
    ]
    by_child: dict[str, list[tuple[str, str, str, str]]] = {}
    for rel, child, ck, parent, pk in checks:
        by_child.setdefault(child, []).append((rel, ck, parent, pk))
    reports = []
    for child, chks in by_child.items():
        joined = load_table(spark, sf_dir, child)
        for i, (rel, ck, parent, pk) in enumerate(chks):
            p = (
                load_table(spark, sf_dir, parent)
                .select(F.col(pk).alias(f"__pk{i}"))
                .distinct()
            )
            joined = joined.join(p, joined[ck] == F.col(f"__pk{i}"), "left")
        agg = joined.agg(
            F.count(F.lit(1)).alias("n_child"),
            *[
                F.count(
                    F.when(F.col(f"__pk{i}").isNull(), F.lit(1))
                ).alias(f"__orph{i}")
                for i in range(len(chks))
            ],
        )
        # all of this child's report rows from the ONE agg row (a
        # select-per-relationship would re-reference agg and re-run
        # the fact scan per row — the trap this rewrite removes)
        reports.append(
            agg.select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(rel).alias("relationship"),
                                F.col("n_child").alias("n_child"),
                                F.col(f"__orph{i}").alias("n_orphans"),
                            )
                            for i, (rel, ck, parent, pk) in enumerate(chks)
                        ]
                    )
                ).alias("r")
            ).select("r.relationship", "r.n_child", "r.n_orphans")
        )
    out = reports[0]
    for r in reports[1:]:
        out = out.unionByName(r)
    return out


@query(
    "events_day_gaps",
    tags=("events", "audit", "freshness", "window"),
    oracle="""
WITH daily AS (
  SELECT DISTINCT event_type, CAST(ts AS DATE) AS day FROM events
), gaps AS (
  SELECT event_type, day,
         LAG(day) OVER (PARTITION BY event_type ORDER BY day) AS prev_day
  FROM daily
)
SELECT event_type,
       prev_day AS gap_start,
       day AS gap_end,
       CAST(DATEDIFF('day', prev_day, day) - 1 AS BIGINT) AS missing_days
FROM gaps
WHERE DATEDIFF('day', prev_day, day) > 1
ORDER BY event_type, gap_start
""",
)
def events_day_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness/completeness audit: calendar gaps in each event type's
    daily coverage (a pipeline that silently dropped a day of data
    shows up here, not in totals). Distinct day grain first (tiny),
    one lag window per type; emits each gap's bounds and size. The
    no-gap case returns an empty frame with a stable schema — the
    'green' state of a completeness monitor."""
    from pyspark.sql import Window

    e = load_table(spark, sf_dir, "events")
    daily = e.select("event_type", F.to_date("ts").alias("day")).distinct()
    w = Window.partitionBy("event_type").orderBy("day")
    gaps = daily.select(
        "event_type", "day", F.lag("day").over(w).alias("prev_day")
    ).where(F.datediff("day", "prev_day") > 1)
    return gaps.select(
        "event_type",
        F.col("prev_day").alias("gap_start"),
        F.col("day").alias("gap_end"),
        (F.datediff("day", "prev_day") - 1).cast("long").alias("missing_days"),
    )
