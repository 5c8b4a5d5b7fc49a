"""Stat-based data skipping — the payoff of a sorted layout, proven at
the parquet-footer level and at the executed-scan level. Companion to
test_dpp.py (partition pruning) and test_bucketing.py (exchange-free
joins): the third physical-layout lever, row-group min/max pruning."""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_data_warehouse_automation_spark.queries.relational import (
    _scan_output_rows,
    parquet_range_candidates,
)


def test_footer_audit_on_manufactured_layouts(spark, tmp_path):
    """parquet_range_candidates must find disjoint stats on a sorted
    write (few candidate files) and full-range stats on a shuffled one
    (every file a candidate) for the same window."""
    df = spark.range(4000).select(
        F.col("id"), F.date_add(F.lit("2000-01-01").cast("date"),
                                (F.col("id") % 400).cast("int")).alias("d")
    )
    sp, rp = str(tmp_path / "sorted"), str(tmp_path / "shuffled")
    df.repartitionByRange(8, "d").sortWithinPartitions("d").write.parquet(sp)
    df.repartition(8).write.parquet(rp)
    import datetime

    lo, hi = datetime.date(2000, 3, 1), datetime.date(2000, 3, 21)
    s_files, s_total, s_rgs, s_rows = parquet_range_candidates(sp, "d", lo, hi)
    r_files, r_total, _, _ = parquet_range_candidates(rp, "d", lo, hi)
    assert s_total == r_total == 8
    assert s_files <= 2, s_files
    assert r_files == 8
    assert s_rows < 4000

    # runtime: the reader actually skips the non-candidate row groups
    def agg(path):
        return (
            spark.read.parquet(path)
            .where((F.col("d") >= F.lit(str(lo)).cast("date"))
                   & (F.col("d") < F.lit(str(hi)).cast("date")))
            .agg(F.count(F.lit(1)).alias("n"))
        )

    sorted_scan = _scan_output_rows(agg(sp))
    shuffled_scan = _scan_output_rows(agg(rp))
    assert shuffled_scan == 4000
    assert sorted_scan <= s_rows < shuffled_scan
    # identical values either way
    assert agg(sp).collect() == agg(rp).collect()


def test_int96_timestamp_defeats_skipping(spark, tmp_path):
    """The negative result the fileskip query's docstring warns about:
    the same sorted layout keyed on a raw TIMESTAMP column (Spark
    default INT96 on write) is NOT pruned — predicates on INT96 are
    never pushed to parquet, so the scan reads every row. Pinned so a
    future default change (or a well-meaning 'simplify to timestamp'
    edit) is noticed."""
    assert spark.conf.get("spark.sql.parquet.outputTimestampType") == "INT96"
    df = spark.range(4000).select(
        F.col("id"),
        (F.lit("2000-01-01 00:00:00").cast("timestamp")
         + F.make_interval(days=(F.col("id") % 400).cast("int"))).alias("t"),
    )
    sp = str(tmp_path / "sorted_ts")
    df.repartitionByRange(8, "t").sortWithinPartitions("t").write.parquet(sp)
    q = (
        spark.read.parquet(sp)
        .where((F.col("t") >= F.lit("2000-03-01").cast("timestamp"))
               & (F.col("t") < F.lit("2000-03-21").cast("timestamp")))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    assert _scan_output_rows(q) == 4000  # nothing skipped
    assert q.collect()[0].n == 200


def test_registered_fileskip_query_runs_green(spark, sf_dir):
    """The registered query's own structural asserts (footer bound,
    shuffled==total, sorted<=candidates) must hold at the test SF."""
    from financial_data_warehouse_automation_spark.registry import load_all

    rows = load_all()["orders_sorted_fileskip"].builder(spark, sf_dir).collect()
    assert len(rows) == 5  # one per order priority
    assert all(r.n_orders > 0 for r in rows)


def test_zorder_2d_query_runs_green(spark, sf_dir):
    """orders_zorder_fileskip_2d's builder carries the structural
    asserts (both-dimension footer bounds on the Z layout, zero
    custkey pruning on the linear layout, runtime scan-metric
    ordering); running it green at the test SF is the pin."""
    from financial_data_warehouse_automation_spark.registry import load_all

    rows = (
        load_all()["orders_zorder_fileskip_2d"].builder(spark, sf_dir).collect()
    )
    assert len(rows) == 5
    assert all(r.n_orders > 0 for r in rows)


def test_morton_interleave_matches_python(spark):
    """The unrolled column bit math equals a reference Python Morton
    interleave on random 16-bit pairs."""
    import random

    from financial_data_warehouse_automation_spark.queries.relational import (
        morton_interleave16,
    )

    rnd = random.Random(7)
    pairs = [(rnd.randrange(65536), rnd.randrange(65536)) for _ in range(200)]
    df = spark.createDataFrame(pairs, "xn long, yn long")
    got = {
        (r.xn, r.yn): r.z
        for r in df.select(
            "xn", "yn", morton_interleave16(F.col("xn"), F.col("yn")).alias("z")
        ).collect()
    }

    def ref(x, y):
        z = 0
        for i in range(16):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(x, y): ref(x, y) for x, y in pairs}
