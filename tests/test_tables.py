"""Contract tests for tables.load_table: relation memoization and the
scale-guarded ``spread_by`` fan-out.

The guard's whole point is captured here mechanically: a parquet whose
footer metadata AND byte size support the session's parallelism must
see NO repartition exchange — that is the 100 TB shape — while files
that cannot split that far (single row group, OR many row groups under
Spark's 4 MB openCost split floor) must fan out.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest

from financial_data_warehouse_automation_spark.tables import (
    _scan_parallelism,
    load_table,
)


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
    assert _scan_parallelism(spark, f"{sf_dir}/orders.parquet") == 1
    df = load_table(spark, sf_dir, "orders", spread_by=("o_custkey",))
    plan = df._jdf.queryExecution().executedPlan().toString().lower()
    assert "hashpartitioning(o_custkey" in plan
    assert df.rdd.getNumPartitions() == spark.sparkContext.defaultParallelism


def _write_docs(path, n_rows: int, payload_bytes: int, row_groups: int) -> None:
    import pyarrow as pa
    import pyarrow.parquet as pq

    rng = np.random.default_rng(7)
    # incompressible hex payload so parquet size tracks payload size
    text = [
        rng.bytes(payload_bytes // 2).hex() for _ in range(n_rows)
    ]
    pdf = pd.DataFrame(
        {"doc_id": range(n_rows), "text": text, "source": ["s"] * n_rows}
    )
    pq.write_table(
        pa.Table.from_pandas(pdf, preserve_index=False),
        str(path),
        row_group_size=max(1, n_rows // row_groups),
        compression="none",
    )


def test_spread_by_noop_on_well_split_table(spark, tmp_path):
    # Enough row groups AND enough bytes that Spark's split planner
    # (openCost floor 4 MB) reaches the session's parallelism: the
    # guard must add no exchange — the cluster shape.
    target = spark.sparkContext.defaultParallelism
    # target splits need > target * 4 MB of file bytes
    n_rows = 2 * target * 16
    _write_docs(tmp_path / "documents.parquet", n_rows,
                payload_bytes=300_000, row_groups=2 * target)
    assert _scan_parallelism(
        spark, str(tmp_path / "documents.parquet")) >= target
    df = load_table(spark, str(tmp_path), "documents", spread_by=("doc_id",))
    plan = df._jdf.queryExecution().executedPlan().toString().lower()
    assert "exchange" not in plan, (
        "spread_by must be a plan no-op when the scan already splits "
        f"to >= {target} tasks:\n{plan}"
    )


def test_spread_by_fires_on_small_many_row_group_file(spark, tmp_path):
    # Review finding: many row groups in a SMALL file still plan few
    # tasks (openCost floor), so row-group count alone over-reports
    # parallelism. A 16-row-group file of a few hundred KB must spread.
    target = spark.sparkContext.defaultParallelism
    _write_docs(tmp_path / "documents.parquet", 2 * target * 16,
                payload_bytes=64, row_groups=2 * target)
    assert _scan_parallelism(
        spark, str(tmp_path / "documents.parquet")) < target
    df = load_table(spark, str(tmp_path), "documents", spread_by=("doc_id",))
    plan = df._jdf.queryExecution().executedPlan().toString().lower()
    assert "hashpartitioning(doc_id" in plan


def test_spread_by_preserves_rows(spark, sf_dir):
    plain = load_table(spark, sf_dir, "customer")
    spread = load_table(spark, sf_dir, "customer", spread_by=("c_custkey",))
    assert plain.count() == spread.count()
    a = sorted(r.c_custkey for r in plain.select("c_custkey").collect())
    b = sorted(r.c_custkey for r in spread.select("c_custkey").collect())
    assert a == b
