"""Contract tests for tables.load_table: relation memoization and the
scale-guarded ``spread_by`` fan-out.

The guard's whole point is captured here mechanically: a well-split
parquet (many row groups) must see NO repartition exchange — that is
the 100 TB shape — while the harness's single-row-group files must fan
out to the session's parallelism.
"""

from __future__ import annotations

import pandas as pd
import pytest

from financial_data_warehouse_automation_spark.tables import (
    _scan_parallelism,
    load_table,
)


def _executed_plan(df) -> str:
    df.collect()
    return df._jdf.queryExecution().executedPlan().toString()


def test_relation_is_memoized_per_session(spark, sf_dir):
    a = load_table(spark, sf_dir, "orders")
    b = load_table(spark, sf_dir, "orders")
    assert a is b, "same (session, sf_dir, name) must return the cached relation"


def test_unknown_table_rejected(spark, sf_dir):
    with pytest.raises(KeyError):
        load_table(spark, sf_dir, "nope")


def test_spread_by_fans_out_single_row_group(spark, sf_dir):
    # The generator writes one row group per file, so the scan alone
    # can never exceed 1 task; spread_by must add the hash exchange.
    assert _scan_parallelism(f"{sf_dir}/orders.parquet") == 1
    df = load_table(spark, sf_dir, "orders", spread_by=("o_custkey",))
    assert "hashpartitioning(o_custkey" in df._jdf.queryExecution().executedPlan().toString().lower()
    n = df.rdd.getNumPartitions()
    assert n == spark.sparkContext.defaultParallelism


def test_spread_by_noop_on_well_split_table(spark, tmp_path):
    # Build a documents.parquet with MORE row groups than the session's
    # parallelism: the guard must add no exchange (the cluster shape).
    import pyarrow as pa
    import pyarrow.parquet as pq

    target = spark.sparkContext.defaultParallelism
    pdf = pd.DataFrame(
        {"doc_id": range(256), "text": ["w " * 4] * 256, "source": ["s"] * 256}
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        str(tmp_path / "documents.parquet"),
        row_group_size=max(1, 256 // (target + 1)),
    )
    assert _scan_parallelism(str(tmp_path / "documents.parquet")) >= target
    df = load_table(spark, str(tmp_path), "documents", spread_by=("doc_id",))
    plan = df._jdf.queryExecution().executedPlan().toString().lower()
    assert "exchange" not in plan, (
        "spread_by must be a plan no-op when the scan already splits "
        f"to >= {target} tasks:\n{plan}"
    )


def test_spread_by_preserves_rows(spark, sf_dir):
    plain = load_table(spark, sf_dir, "customer")
    spread = load_table(spark, sf_dir, "customer", spread_by=("c_custkey",))
    assert plain.count() == spread.count()
    a = sorted(r.c_custkey for r in plain.select("c_custkey").collect())
    b = sorted(r.c_custkey for r in spread.select("c_custkey").collect())
    assert a == b
