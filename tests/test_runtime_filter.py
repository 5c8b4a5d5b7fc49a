"""Runtime bloom-filter injection — the automatic sibling of the
explicit sketch in queries/relational.py::orders_bloom_filter_probe.

For a selective dim-side filter joining a large un-partitioned fact,
Spark can build a bloom filter over the dim join keys at RUNTIME and
push a might_contain probe into the fact scan, dropping most fact rows
before the shuffle — on a 100 TB fact this is the difference between
shuffling the table and shuffling the match set. The default
size thresholds (creation side 10 MB, application side 10 GB) exist to
keep the optimization off for small inputs, so the test lowers them to
force injection at test scale and pins the plan shape the repo relies
on being available at real scale."""

from __future__ import annotations

import contextlib

import pytest
from pyspark.sql import functions as F


@contextlib.contextmanager
def _confs(spark, pairs):
    old = {}
    for k, v in pairs.items():
        try:
            old[k] = spark.conf.get(k)
        except Exception:
            old[k] = None
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_selective_dim_join_injects_bloom_filter(spark, sf_dir):
    lineitem = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    orders = spark.read.parquet(f"{sf_dir}/orders.parquet")
    sel = orders.where(F.col("o_orderpriority") == "1-URGENT").select(
        "o_orderkey", "o_orderdate"
    )
    with _confs(
        spark,
        {
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            # thresholds exist to skip tiny inputs; force at test scale
            "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
            "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
            # keep the join a shuffle join: a broadcast join needs no
            # runtime filter (the broadcast side IS the filter)
            "spark.sql.autoBroadcastJoinThreshold": "-1",
            "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        },
    ):
        j = (
            lineitem.join(sel, lineitem["l_orderkey"] == sel["o_orderkey"])
            .groupBy("o_orderdate")
            .agg(F.sum("l_quantity").cast("long").alias("qty"))
        )
        plan = j._jdf.queryExecution().executedPlan().toString().lower()
        assert "might_contain" in plan or "bloomfilter" in plan, (
            "no runtime bloom filter on the fact side — the selective "
            f"dim filter would not prune the fact scan at scale:\n{plan[:1500]}"
        )
        n_filtered = j.count()

    # correctness unchanged by the rewrite: same result with the
    # optimization off
    with _confs(
        spark, {"spark.sql.optimizer.runtime.bloomFilter.enabled": "false"}
    ):
        j2 = (
            lineitem.join(sel, lineitem["l_orderkey"] == sel["o_orderkey"])
            .groupBy("o_orderdate")
            .agg(F.sum("l_quantity").cast("long").alias("qty"))
        )
        assert j2.count() == n_filtered


def test_bloom_probe_query_has_no_false_negative_row(spark, sf_dir):
    """Structural Bloom guarantee on the explicit sketch query: the
    (exact_member=true, bloom_positive=false) cell must be absent, and
    every member must probe positive."""
    from financial_data_warehouse_automation_spark.registry import load_all

    q = load_all()["orders_bloom_filter_probe"].builder
    rows = {(r.exact_member, r.bloom_positive): r.n_keys for r in q(spark, sf_dir).collect()}
    assert (True, False) not in rows
    assert rows.get((True, True), 0) > 0
