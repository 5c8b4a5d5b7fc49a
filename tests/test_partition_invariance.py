"""Partition-count invariance — the cluster-portability contract: a
deterministic pipeline must produce IDENTICAL results whether the
shuffle fans out over 3 partitions or 32 (a laptop or a 1000-executor
cluster). Queries built on hash coins, two-pass ranks, or rounded
decimal accumulation claim exactly this; queries accidentally
depending on partition layout (rand(), monotonically_increasing_id,
unrounded double accumulation, first() without ordering) break here
long before they break an oracle run at a fixed parallelism."""

from __future__ import annotations

import pytest

from financial_data_warehouse_automation_spark.registry import load_all

# the determinism-critical representatives: hash-coin sampling, the
# two-pass global rank, banded-LSH candidate generation replayed via
# md5, exact-decimal double reductions, and the winsorize clamp
CASES = (
    "doc_shuffle_order",
    "doc_importance_resample",
    "customer_rfm_segments",
    "part_abc_pareto",
    "monthly_revenue_seasonality",
    "order_winsorized_stats",
    # round-6 content-addressed operators: the md5 sketch family and
    # hash-bucketed experiment split claim layout independence outright
    "approx_distinct_parts_kmv",
    "part_freq_count_min",
    "doc_priority_sample",
    "order_sampled_quantiles",
    "events_ab_test_zscore",
    # round-11 sketch additions: bottom-k quantile sample and Theta
    # set algebra are hash-addressed, so layout-independent by claim
    "events_quantile_sketch_merge",
    "events_kmv_set_ops",
    # round-11 layout/storage additions: explicit repartitionByRange
    # writes + manifest reads claim independence from the session's
    # shuffle-partition setting outright
    "orders_sorted_fileskip",
    "orders_snapshot_cow_read",
)


def _rows(spark, name, sf_dir, n_parts: int):
    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", str(n_parts))
    try:
        df = load_all()[name].builder(spark, sf_dir)
        return sorted(tuple(r) for r in df.collect())
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


@pytest.mark.parametrize("name", CASES)
def test_result_invariant_under_shuffle_partition_count(spark, sf_dir, name):
    assert _rows(spark, name, sf_dir, 3) == _rows(spark, name, sf_dir, 17)


def test_kmv_merge_equals_direct(spark, sf_dir):
    """The capability events_kmv_weekly_merge exists to demonstrate:
    merging stored per-day KMV sketches (union, re-take k smallest)
    yields BIT-IDENTICAL weekly estimates to building the weekly KMV
    directly from raw events — so a warehouse can keep day-grain
    sketches and re-aggregate to any coarser grain without rescanning.
    (k-min of a union of per-day k-mins = k-min of the union: a hash
    among the week's k smallest ranks at least as high within its own
    day, so the day sketch kept it.)"""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from financial_data_warehouse_automation_spark.functions.scalars import md5_prefix_int
    from financial_data_warehouse_automation_spark.registry import load_all
    from financial_data_warehouse_automation_spark.tables import load_table

    merged = sorted(
        tuple(r)
        for r in load_all()["events_kmv_weekly_merge"]
        .builder(spark, sf_dir)
        .collect()
    )

    k = 32
    e = load_table(spark, sf_dir, "events")
    dh = e.select(
        F.date_trunc("week", F.to_date("ts")).cast("date").alias("week"),
        md5_prefix_int(
            F.col("user_id").cast("string").cast("binary")
        ).alias("h"),
    ).distinct()
    w = Window.partitionBy("week").orderBy("h")
    ranked = dh.withColumn("rn", F.row_number().over(w)).where(F.col("rn") <= k)
    n = F.count(F.lit(1))
    kth = F.max(F.when(F.col("rn") == k, F.col("h")))
    est = F.when(n < k, n.cast("double")).otherwise(
        F.lit((k - 1) * float(1 << 60)) / kth.cast("double")
    )
    direct = sorted(
        tuple(r)
        for r in ranked.groupBy("week")
        .agg(
            n.cast("long").alias("n_in_sketch"),
            kth.cast("long").alias("kth_hash"),
            F.round(est, 4).cast("double").alias("est_users"),
        )
        .orderBy("week")
        .collect()
    )
    assert merged == direct


def test_kmv_weekly_merge_hypothesis_matches_python(spark, tmp_path):
    """Property: for ANY activity multiset (hypothesis-generated
    (day, user) pairs over a 5-week span, duplicates included),
    events_kmv_weekly_merge equals a pure-Python KMV computed OUTSIDE
    Spark — day-sketch capping, merge dedup, the k-th-hash estimator
    and the under-k exact fallback all re-derived independently."""
    import datetime
    import hashlib
    import os
    import shutil

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from financial_data_warehouse_automation_spark import tables
    from financial_data_warehouse_automation_spark.queries.events import (
        events_kmv_weekly_merge,
    )

    K = 32
    base = datetime.datetime(1995, 3, 6)  # a Monday

    @settings(
        max_examples=8,
        deadline=None,
        suppress_health_check=[HealthCheck.too_slow],
    )
    @given(
        pairs=st.lists(
            st.tuples(
                st.integers(min_value=0, max_value=34),   # day offset
                st.integers(min_value=0, max_value=120),  # user id
            ),
            min_size=1,
            max_size=300,
        )
    )
    def check(pairs):
        rows = [
            (i, base + datetime.timedelta(days=d, hours=i % 24), u, "x", 1.0,
             "{}")
            for i, (d, u) in enumerate(pairs)
        ]
        df = spark.createDataFrame(
            rows,
            "event_id long, ts timestamp, user_id long, "
            "event_type string, value double, props string",
        )
        d = str(tmp_path / "hyp_events")
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d)
        df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "w2"))
        src = [
            f for f in os.listdir(str(tmp_path / "w2"))
            if f.endswith(".parquet")
        ][0]
        shutil.copy(
            os.path.join(str(tmp_path / "w2"), src),
            os.path.join(d, "events.parquet"),
        )
        tables._RELATION_CACHE.clear()
        got = {
            str(r.week): (r.n_in_sketch, r.kth_hash, r.est_users)
            for r in events_kmv_weekly_merge(spark, d).collect()
        }
        tables._RELATION_CACHE.clear()
        # pure-Python reference
        def h(u: int) -> int:
            return int(hashlib.md5(str(u).encode()).hexdigest()[:15], 16)

        day_sets: dict[datetime.date, set[int]] = {}
        for dd, u in pairs:
            day = (base + datetime.timedelta(days=dd)).date()
            day_sets.setdefault(day, set()).add(h(u))
        week_sets: dict[datetime.date, set[int]] = {}
        for day, hs in day_sets.items():
            week = day - datetime.timedelta(days=day.weekday())
            week_sets.setdefault(week, set()).update(sorted(hs)[:K])
        want = {}
        for week, hs in week_sets.items():
            top = sorted(hs)[:K]
            if len(top) < K:
                est = float(len(top))
                kth = None
            else:
                kth = top[K - 1]
                est = (K - 1) * float(1 << 60) / float(kth)
            want[str(week)] = (len(top), kth, round(est, 4))
        assert got == want

    check()


def test_quantile_sketch_merge_equals_direct(spark, sf_dir):
    """The capability events_quantile_sketch_merge exists to
    demonstrate: merging stored per-day bottom-k (hash, value) samples
    (union, re-take k smallest by hash) yields BIT-IDENTICAL weekly
    quantile estimates to building the weekly bottom-k sample directly
    from raw events — same argument as KMV, applied to rows that carry
    a payload column. Direct path re-derived here without the per-day
    stage."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from financial_data_warehouse_automation_spark.functions.scalars import md5_prefix_int
    from financial_data_warehouse_automation_spark.tables import load_table

    merged = sorted(
        tuple(r)
        for r in load_all()["events_quantile_sketch_merge"]
        .builder(spark, sf_dir)
        .collect()
    )

    k = 64
    e = load_table(spark, sf_dir, "events").select(
        F.date_trunc("week", F.to_date("ts")).cast("date").alias("week"),
        md5_prefix_int(
            F.col("event_id").cast("string").cast("binary")
        ).alias("h"),
        "value",
    )
    w_week = Window.partitionBy("week").orderBy("h", "value")
    direct_sample = (
        e.withColumn("rn", F.row_number().over(w_week))
        .where(F.col("rn") <= k)
    )
    w_val = Window.partitionBy("week").orderBy("value", "h")
    w_all = Window.partitionBy("week")
    samp = direct_sample.select(
        "week",
        "value",
        F.row_number().over(w_val).alias("rv"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    sel50 = F.col("rv") == F.ceil(F.col("n") * 0.5)
    sel90 = F.col("rv") == F.ceil(F.col("n") * 0.9)
    direct_est = {
        r.week: (r.n_sample, r.est_p50, r.est_p90)
        for r in samp.groupBy("week")
        .agg(
            F.max("n").cast("long").alias("n_sample"),
            F.max(F.when(sel50, F.col("value"))).alias("est_p50"),
            F.max(F.when(sel90, F.col("value"))).alias("est_p90"),
        )
        .collect()
    }
    got = {r[0]: (r[1], r[2], r[3]) for r in merged}
    assert got == direct_est


def test_quantile_sketch_estimates_bracket_exact(spark, sf_dir):
    """Sample-quantile sanity: each week's p50/p90 estimate must land
    within the week's observed value range, and the estimate's rank in
    the raw week must be within the standard O(1/sqrt(k)) band of the
    target quantile (3 sigma; k=64 -> half-width ~0.19)."""
    from pyspark.sql import functions as F

    from financial_data_warehouse_automation_spark.tables import load_table

    rows = (
        load_all()["events_quantile_sketch_merge"]
        .builder(spark, sf_dir)
        .collect()
    )
    raw = (
        load_table(spark, sf_dir, "events")
        .select(
            F.date_trunc("week", F.to_date("ts")).cast("date").alias("week"),
            "value",
        )
        .collect()
    )
    by_week: dict = {}
    for r in raw:
        by_week.setdefault(r.week, []).append(r.value)
    for r in rows:
        vals = sorted(by_week[r.week])
        for est, p in ((r.est_p50, 0.5), (r.est_p90, 0.9)):
            assert vals[0] <= est <= vals[-1]
            # empirical CDF position of the estimate in the raw week
            import bisect

            pos = bisect.bisect_right(vals, est) / len(vals)
            assert abs(pos - p) <= 3 * (p * (1 - p)) ** 0.5 / 8 + 2 / len(vals), (
                r.week, p, pos,
            )
