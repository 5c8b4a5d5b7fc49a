"""Bucketed co-located join (SURVEY §4 / README scale posture): writing
both join sides bucketed by the join key lets a sort-merge join run
with NO shuffle exchange — the 100 TB fact⋈fact strategy. At harness
scale AQE would rather broadcast, so the merge join is forced by hint
to make the bucket layout observable in the plan."""

from __future__ import annotations

import pytest


@pytest.fixture()
def bucketed_tables(spark, sf_dir, tmp_path):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet")
    l = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    (o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
       .option("path", str(tmp_path / "b_orders")).saveAsTable("b_orders"))
    (l.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
       .option("path", str(tmp_path / "b_lineitem")).saveAsTable("b_lineitem"))
    yield
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_has_no_shuffle(spark, bucketed_tables):
    bo = spark.table("b_orders")
    bl = spark.table("b_lineitem")
    joined = bl.hint("merge").join(bo, bl.l_orderkey == bo.o_orderkey)
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" in plan
    assert "Bucketed: true" in plan
    # no exchange anywhere: both scans feed the merge join bucket-aligned
    assert "Exchange hashpartitioning" not in plan
    # sanity: same row count as the plain unbucketed join
    o = spark.read.parquet(
        spark.table("b_orders").inputFiles()[0].rsplit("/", 1)[0]
    )
    expected = bl.join(bo, bl.l_orderkey == bo.o_orderkey).count()
    assert joined.count() == expected
