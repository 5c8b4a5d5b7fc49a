"""Dynamic partition pruning — the scan lever a partitioned 100 TB
fact table lives or dies by: a selective filter on the DIM side of a
star join must prune the fact table's partition directories at
RUNTIME (the values aren't known at plan time), so the fact scan reads
only the partitions the dim rows can join to. Spark injects a
DynamicPruningExpression subquery into the fact scan when the fact is
partitioned on the join key and the dim side is broadcastable — this
test pins that the repo's (year)-partitioned warehouse layout actually
triggers it, the same way test_bucketing.py pins zero-exchange joins."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F


@pytest.fixture(scope="module")
def partitioned_orders(spark, sf_dir):
    work = tempfile.mkdtemp(prefix="dpp_orders_")
    path = os.path.join(work, "orders_by_year")
    (
        spark.read.parquet(f"{sf_dir}/orders.parquet")
        .withColumn("year", F.year("o_orderdate"))
        .write.mode("overwrite")
        .partitionBy("year")
        .parquet(path)
    )
    yield path
    shutil.rmtree(work, ignore_errors=True)


def test_dim_filter_prunes_fact_partitions_at_runtime(spark, partitioned_orders):
    fact = spark.read.parquet(partitioned_orders)
    # dim: a tiny year-attribute table; the filter selects 2 of 7 years
    years = spark.createDataFrame(
        [(y, "open" if y >= 1997 else "closed") for y in range(1992, 1999)],
        "year int, phase string",
    )
    j = (
        fact.join(years.where(F.col("phase") == "open"), "year")
        .groupBy("year")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    plan = j._jdf.queryExecution().executedPlan().toString()
    assert "dynamicpruningexpression" in plan.lower(), (
        "no DynamicPruningExpression on the fact scan — partition "
        f"pruning would read every year at scale:\n{plan[:1500]}"
    )
    # and the result is correct: only 1997-1998 orders survive
    got = {r.year for r in j.collect()}
    assert got == {1997, 1998}


def test_static_partition_filter_prunes_at_plan_time(spark, partitioned_orders):
    """The static sibling: a literal predicate on the partition column
    must show up as a partition filter on the scan (no data read from
    other years at all), not as a post-scan filter."""
    fact = spark.read.parquet(partitioned_orders)
    q = fact.where(F.col("year") == 1995).groupBy("o_orderpriority").count()
    plan = q._jdf.queryExecution().executedPlan().toString()
    scan = plan[plan.index("FileScan"):][:800]
    assert "PartitionFilters" in scan and "1995" in scan.split("PushedFilters")[0]
