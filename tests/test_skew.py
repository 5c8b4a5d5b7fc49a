"""salted_join must be semantically identical to the plain join."""

from __future__ import annotations


from financial_data_warehouse_automation_spark.operators.skew import salted_join


def _sorted(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_join_equals_plain_join(spark, sf_dir):
    o = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        "o_orderkey", "o_custkey", "o_totalprice"
    )
    c = spark.read.parquet(f"{sf_dir}/customer.parquet").select(
        "c_custkey", "c_mktsegment"
    ).withColumnRenamed("c_custkey", "o_custkey")
    plain = o.join(c, ["o_custkey"])
    salted = salted_join(o, c, ["o_custkey"], n_salts=4)
    assert _sorted(salted.select(*plain.columns)) == _sorted(plain)


def test_salted_left_join_keeps_unmatched(spark):
    left = spark.createDataFrame([("k1", 1), ("k2", 2)], "k string, v int")
    right = spark.createDataFrame([("k1", "x")], "k string, p string")
    out = salted_join(left, right, ["k"], n_salts=3, how="left")
    rows = {r.k: r.p for r in out.collect()}
    assert rows == {"k1": "x", "k2": None}
