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
