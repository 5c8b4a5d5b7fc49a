"""Physical-plan hygiene pins (the scale contract, SURVEY §4):
pushdown reaches the parquet scan, projections prune the read schema,
and no query force-broadcasts a table that grows with scale. These
fail when a refactor silently de-optimizes a plan even though results
stay correct."""

from __future__ import annotations

from financial_data_warehouse_automation_spark.registry import load_all


def _plan(spark, name, sf_dir) -> str:
    df = load_all()[name].builder(spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_pricing_summary_pushdown_and_pruning(spark, sf_dir):
    plan = _plan(spark, "pricing_summary", sf_dir)
    # shipdate filter reaches the parquet reader
    assert "PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate" in plan
    # only the 7 referenced columns are read, not all 11
    read = plan.split("ReadSchema: ")[1].splitlines()[0]
    assert "l_orderkey" not in read and "l_partkey" not in read
    assert "l_quantity" in read and "l_tax" in read


def test_no_forced_broadcast_of_growing_tables(spark, sf_dir):
    # customer/part grow with SF: only region/nation may carry an
    # explicit broadcast hint (VERDICT r1 #6). AQE may still *choose*
    # broadcast at tiny SF — the pin is on the logical hint, so inspect
    # the analyzed (pre-AQE) optimized plan for ResolvedHint.
    for name in ("monthly_segment_totals", "region_revenue"):
        df = load_all()[name].builder(spark, sf_dir)
        analyzed = df._jdf.queryExecution().analyzed().toString()
        for line in analyzed.splitlines():
            if "ResolvedHint" in line:
                ctx = analyzed[analyzed.index(line):][:2000]
                assert "c_custkey" not in ctx.split("Relation")[1], (
                    f"{name}: broadcast hint reaches customer"
                )


def test_global_topk_plans_take_ordered(spark, sf_dir):
    plan = _plan(spark, "top10_orders_global", sf_dir)
    assert "TakeOrderedAndProject" in plan  # no full global sort


def test_asof_join_is_single_shuffle_window(spark, sf_dir):
    # the merge-formulated as-of must not contain a join of events
    # against orders (no row explosion) — only union + window
    plan = _plan(spark, "events_asof_last_order", sf_dir)
    assert "Union" in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan


def test_lsh_join_is_bucketed_not_cartesian(spark, sf_dir):
    plan = _plan(spark, "doc_minhash_lsh_pairs", sf_dir)
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
