"""Golden tests for the reference-shaped ingest parse (FIXTURES.md §A).

The oracle harness hash-checks full outputs; these tests pin the
*semantics* a reader should be able to rely on: which quirk rows
survive, how codes are padded, that re-running the build is a fixed
point (the idempotency the Python reference violates, SURVEY §2.11 D4).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_data_warehouse_automation_spark.ingest.fixtures import spark_df
from financial_data_warehouse_automation_spark.operators.ingest import (
    parse_balance_sheet,
    parse_income_statement,
)


def test_income_parse_quirks(spark):
    facts = parse_income_statement(spark_df(spark, "income_lines"))
    rows = {
        (r.gl_code, r.year, r.month, r.department): (r.category, float(r.amount))
        for r in facts.collect()
    }
    # header at row 4 + en-dash sheet name still parsed
    assert rows[("1113", 2024, 1, "124")] == ("Revenue", 75.25)
    # currency symbols/commas stripped
    assert rows[("1111", 2024, 1, "123")] == ("Revenue", 1000.00)
    # parenthesized negative
    assert rows[("2111", 2024, 1, "123")] == ("Expenses", -400.00)
    # 3-digit code zero-padded (Code.gs:251-256)
    assert rows[("0123", 2024, 1, "123")] == ("Expenses", 42.00)
    # junk amount 'n/a' dropped; empty amount dropped
    assert ("2112", 2024, 1, "123") not in rows
    assert ("2112", 2024, 1, "124") not in rows
    # non-department SUMMARY sheet skipped entirely
    assert facts.where(F.col("amount") == 999.99).count() == 0
    # footer rows (NULL col_a) never parsed
    assert facts.count() == 10


def test_balance_parse_state_machine(spark):
    facts = parse_balance_sheet(spark_df(spark, "balance_lines"))
    cats = {r.gl_code: r.category for r in facts.collect()}
    assert cats == {
        "3111": "Assets", "3112": "Assets", "3999": "Assets",
        "4111": "Liability", "5111": "Equity",
    }
    # department is the empty string for balance rows (Code.gs:231)
    assert facts.select("department").distinct().collect()[0][0] == ""


def test_warehouse_build_fixed_point(spark):
    from financial_data_warehouse_automation_spark.registry import load_all

    build = load_all()["ingest_warehouse_build"].builder
    once = sorted(tuple(r) for r in build(spark, "").collect())
    twice = sorted(tuple(r) for r in build(spark, "").collect())
    assert once == twice
    # duplicate delivery of file 1 collapsed: the 5-col key is unique
    df = build(spark, "")
    key = ["gl_code", "year", "month", "department", "category"]
    assert df.count() == df.select(*key).distinct().count()
    # unmapped GLs flagged, mapped GLs enriched
    flags = {r.gl_code: r.missing_in_reference for r in df.collect()}
    assert flags["2999"] is True and flags["3999"] is True
    assert flags["1111"] is False


def test_income_parse_scales_across_many_files(spark):
    """The order-dependent windows (W1/W2) partition by (file, sheet):
    fan the fixture out to 100 synthetic periods and verify per-period
    results are byte-identical to the single-period parse — the
    multi-file distribution property the GS loop has (Code.gs:34-50)."""
    lines = spark_df(spark, "income_lines")
    base = {
        ((r.gl_code, r.department, r.category), float(r.amount))
        for r in parse_income_statement(
            lines.where(F.col("file_name").startswith("01.2024"))
        ).collect()
    }
    periods = spark.createDataFrame(
        [(m, y) for y in range(2000, 2010) for m in range(1, 11)],
        "m int, y int",
    )
    fan = (
        lines.where(F.col("file_name").startswith("01.2024"))
        .crossJoin(periods)
        .withColumn(
            "file_name",
            F.format_string("%02d.%04d Depts Income Statement.xlsx", "m", "y"),
        )
        .drop("m", "y")
    )
    facts = parse_income_statement(fan)
    assert facts.count() == 100 * len(base)
    # spot-check one fanned period equals the base parse exactly
    one = {
        ((r.gl_code, r.department, r.category), float(r.amount))
        for r in facts.where(
            (F.col("year") == 2005) & (F.col("month") == 7)
        ).collect()
    }
    assert one == base
