"""S9–S13 sink/DDL semantics: sibling-table preservation, first-run
empty reads, create-if-not-exists."""

from __future__ import annotations

from financial_data_warehouse_automation_spark.operators.sinks import (
    ensure_table,
    overwrite_table,
    read_table_or_empty,
)


def test_overwrite_preserves_siblings(spark, tmp_path):
    final = str(tmp_path / "final")
    qa = str(tmp_path / "qa")
    a = spark.createDataFrame([(1, "x")], "k int, v string")
    b = spark.createDataFrame([(9, "q")], "k int, v string")
    overwrite_table(a, final)
    overwrite_table(b, qa)
    overwrite_table(a.withColumn("v", a.v.substr(1, 1)), final)  # rewrite one
    assert spark.read.parquet(qa).collect()[0].v == "q"  # sibling untouched
    assert spark.read.parquet(final).count() == 1


def test_read_table_or_empty_first_run(spark, tmp_path):
    schema = spark.createDataFrame([(1, "x")], "k int, v string").schema
    df = read_table_or_empty(spark, str(tmp_path / "missing"), schema)
    assert df.count() == 0
    assert df.schema == schema


def test_ensure_table_idempotent(spark, tmp_path):
    path = str(tmp_path / "t")
    schema = spark.createDataFrame([(1, "x")], "k int, v string").schema
    ensure_table(spark, path, schema)
    assert spark.read.parquet(path).count() == 0
    spark.createDataFrame([(5, "y")], schema).write.mode("append").parquet(path)
    ensure_table(spark, path, schema)  # must not clobber existing data
    assert spark.read.parquet(path).count() == 1
