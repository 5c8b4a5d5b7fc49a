"""Attribution ledger invariants: credit is a conservative reallocation
of revenue — nothing created, nothing lost, regardless of how touches
share it."""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_data_warehouse_automation_spark.registry import load_all


def _total_purchase_cents(spark, sf_dir) -> int:
    e = spark.read.parquet(f"{sf_dir}/events.parquet")
    return (
        e.where(F.col("event_type") == "purchase")
        .agg(
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("c")
        )
        .first()
        .c
    )


def test_linear_attribution_conserves_revenue_to_the_cent(spark, sf_dir):
    """Equal-split credit uses integer div + remainder-to-latest-touch,
    so the credited ledger must sum EXACTLY to total purchase revenue
    (a 1/n double split would drift and the books would not close)."""
    q = load_all()["events_attribution_linear"].builder
    credited = sum(r.credited_cents for r in q(spark, sf_dir).collect())
    assert credited == _total_purchase_cents(spark, sf_dir)


def test_last_touch_attribution_conserves_revenue(spark, sf_dir):
    """Last-touch credits each purchase exactly once (to a click day or
    to 'none'), so its ledger must also sum to total revenue."""
    q = load_all()["events_attribution_last_touch"].builder
    credited = sum(r.cents for r in q(spark, sf_dir).collect())
    assert credited == _total_purchase_cents(spark, sf_dir)


def test_integer_division_semantics_match_duckdb(spark):
    """events_attribution_linear splits credit with Spark `div`/`%`
    and replays with DuckDB `//`/`%`. Both must truncate toward zero
    with remainder following the dividend on EVERY sign combination —
    refund purchases (negative cents) would otherwise silently desync
    the oracle. Pins the engine pair's semantics so an upgrade that
    changes either side fails here, not in a driver hash-mismatch."""
    import duckdb

    cases = [(7, 2), (-7, 2), (7, -2), (-7, -2), (1, 3), (-1, 3)]
    got_spark = spark.sql(
        "SELECT " + ", ".join(
            f"{a} div ({b}) AS d{i}, {a} % ({b}) AS m{i}"
            for i, (a, b) in enumerate(cases)
        )
    ).collect()[0]
    got_duck = duckdb.sql(
        "SELECT " + ", ".join(
            f"{a} // ({b}) AS d{i}, {a} % ({b}) AS m{i}"
            for i, (a, b) in enumerate(cases)
        )
    ).fetchone()
    assert tuple(got_spark) == got_duck
    # and both reconcile: div*b + rem == a
    for i, (a, b) in enumerate(cases):
        assert got_spark[2 * i] * b + got_spark[2 * i + 1] == a
