from __future__ import annotations

from decimal import Decimal

from pyspark.sql import functions as F

from financial_data_warehouse_automation_spark.functions import (
    clean_amount,
    currency_string,
    dept_from_sheet_name,
    is_gl_code_strict,
    month_name,
    month_num_from_name,
    normalize_gl_code,
    normalize_header,
    period_from_filename,
    resolve_columns,
)


def _col_vals(spark, values, expr):
    df = spark.createDataFrame([(v,) for v in values], ["x"])
    return [r[0] for r in df.select(expr.alias("y")).collect()]


def test_clean_amount(spark):
    cases = {
        "1234.5": Decimal("1234.50"),
        "$1,234.56": Decimal("1234.56"),
        "(250.00)": Decimal("-250.00"),
        "($2,500.00)": Decimal("-2500.00"),
        " 42 ": Decimal("42.00"),
        "": None,
        "   ": None,
        "n/a": None,
        None: None,
        "()": None,
    }
    got = _col_vals(spark, list(cases), clean_amount("x"))
    assert got == list(cases.values())


def test_currency_roundtrip(spark):
    vals = ["1234.56", "-250.00", "0.01", "-1000000.99"]
    df = spark.createDataFrame([(v,) for v in vals], ["s"]).select(
        F.col("s").cast("decimal(18,2)").alias("x")
    )
    out = df.select("x", clean_amount(currency_string("x")).alias("back")).collect()
    for row in out:
        assert row["x"] == row["back"]


def test_normalize_gl_code(spark):
    cases = {
        "1111": "1111",
        " 42 ": "0042",
        "7": "0007",
        "123.0": "0123",
        "12345": None,
        "12a4": None,
        "": None,
        None: None,
    }
    got = _col_vals(spark, list(cases), normalize_gl_code("x"))
    assert got == list(cases.values())


def test_is_gl_code_strict(spark):
    got = _col_vals(spark, ["1111", "111", " 4444 ", "44444", None], is_gl_code_strict("x"))
    assert got == [True, False, True, False, None]


def test_period_from_filename(spark):
    m, y = period_from_filename("x")
    df = spark.createDataFrame(
        [("03.2024 Depts Income Statement.xlsx",),
         ("13.2024 bogus.xlsx",),
         ("no period here.xlsx",)],
        ["x"],
    )
    rows = df.select(m.alias("m"), y.alias("y")).collect()
    assert (rows[0]["m"], rows[0]["y"]) == (3, 2024)
    assert (rows[1]["m"], rows[1]["y"]) == (None, None)
    assert (rows[2]["m"], rows[2]["y"]) == (None, None)


def test_dept_from_sheet_name(spark):
    cases = {
        "DEPARTMENT 123-F": "123",
        "department 130–F": "130",   # en dash
        "DEPARTMENT 125—F": "125",   # em dash
        "Summary": None,
        None: None,
    }
    got = _col_vals(spark, list(cases), dept_from_sheet_name("x"))
    assert got == list(cases.values())


def test_month_name_inverse(spark):
    df = spark.createDataFrame([(i,) for i in range(1, 13)], ["x"])
    rows = df.select(
        month_name("x").alias("name"),
        month_num_from_name(month_name("x")).alias("back"),
        "x",
    ).collect()
    assert [r["back"] for r in rows] == [r["x"] for r in rows]
    assert rows[0]["name"] == "January" and rows[11]["name"] == "December"


def test_header_resolution():
    assert normalize_header("  GL   Code ") == "gl code"
    roles = resolve_columns(["GL#", "Account Description", "GROUP", "junk"])
    assert roles == {"gl_code": "GL#", "description": "Account Description", "group": "GROUP"}
    roles = resolve_columns(["nothing", "useful"])
    assert roles["gl_code"] is None and roles["description"] is None


def test_checked_cast_passes_and_raises(spark):
    from financial_data_warehouse_automation_spark.functions.scalars import checked_cast

    ok = spark.createDataFrame([("12",), (None,)], "v string").select(
        checked_cast("v", "int").alias("out")
    )
    assert [r.out for r in ok.collect()] == [12, None]

    import pytest
    from py4j.protocol import Py4JJavaError
    from pyspark.errors.exceptions.captured import SparkRuntimeException

    bad = spark.createDataFrame([("June",)], "v string").select(
        checked_cast("v", "int").alias("out")
    )
    with pytest.raises((Py4JJavaError, SparkRuntimeException)):
        bad.collect()


def test_composite_key_null_disambiguation(spark):
    from financial_data_warehouse_automation_spark.functions.scalars import composite_key

    df = spark.createDataFrame(
        [("a", None), ("a", ""), ("a", "x")], "k1 string, k2 string"
    ).select(composite_key("k1", "k2").alias("key"))
    assert [r.key for r in df.collect()] == ["a|NULL", "a|", "a|x"]
