"""Statement-parsing operators: the reference's order-dependent ingest
windows (SURVEY §2.6 W1–W3, §2.2 P2/P5/P7, §2.5 F1–F4) as pure
DataFrame transforms.

Row order inside a sheet is data here, carried by an explicit
``row_idx`` column (the Excel adapter emits it; fixtures ship it).
Every window partitions by (file_name, sheet_name) — thousands of
independent small partitions at scale, no global sort anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from financial_data_warehouse_automation_spark.functions.scalars import (
    clean_amount,
    dept_from_sheet_name,
    normalize_gl_code,
    period_from_filename,
)

_SHEET_PART = ("file_name", "sheet_name")


def _sheet_window() -> Window:
    return Window.partitionBy(*_SHEET_PART)


def _running(w=None):
    return (
        Window.partitionBy(*_SHEET_PART)
        .orderBy("row_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )


def discover_header_rows(
    df: DataFrame, col_a: str = "col_a", col_b: str = "col_b"
) -> DataFrame:
    """W2/P7 (Code.gs:175-186): find the first row per sheet where
    A=NUMBER ∧ B=DESCRIPTION; keep only later rows. Sheets with no
    header row drop out entirely (the GS loop never starts)."""
    is_header = (F.upper(F.trim(col_a)) == "NUMBER") & (
        F.upper(F.trim(col_b)) == "DESCRIPTION"
    )
    hdr_idx = F.min(F.when(is_header, F.col("row_idx"))).over(_sheet_window())
    return (
        df.withColumn("_hdr_idx", hdr_idx)
        .where(F.col("_hdr_idx").isNotNull() & (F.col("row_idx") > F.col("_hdr_idx")))
        .drop("_hdr_idx")
    )


def forward_fill_category(df: DataFrame, col_a: str = "col_a") -> DataFrame:
    """W1/P4 (build_warehouse.py:91-94; Code.gs:185-191): REVENUES /
    EXPENSES sentinel rows set the category for all following rows."""
    sentinel = F.when(F.upper(F.trim(col_a)) == "REVENUES", "Revenue").when(
        F.upper(F.trim(col_a)) == "EXPENSES", "Expenses"
    )
    return df.withColumn(
        "category", F.last(sentinel, ignorenulls=True).over(_running())
    )


def balance_section_category(df: DataFrame, desc_col: str = "col_c") -> DataFrame:
    """W3 (Code.gs:215-223): category starts Assets, flips to Liability
    after TOTAL ASSETS and to Equity after TOTAL LIABILITIES. Sentinel
    rows themselves are dropped later by the subtotal filter (P5), so an
    inclusive running frame is safe."""
    boundary = F.when(
        F.upper(F.trim(desc_col)).isin("TOTAL ASSETS", "TOTAL LIABILITIES"), 1
    ).otherwise(0)
    cnt = F.sum(boundary).over(_running())
    return df.withColumn(
        "category",
        F.when(cnt == 0, "Assets").when(cnt == 1, "Liability").otherwise("Equity"),
    )


def parse_income_statement(lines: DataFrame) -> DataFrame:
    """Full income-statement parse (build_warehouse.py:86-105 +
    Code.gs:168-204): header discovery → category forward-fill → GL-row
    filter (zero-padded, Code.gs:251-256) → amount parse → null-amount
    drop → period/department stamping.

    Output grain: (gl_code, year, month, department, category) facts.
    """
    month, year = period_from_filename("file_name")
    dept = dept_from_sheet_name("sheet_name")
    body = forward_fill_category(discover_header_rows(lines))
    return (
        body.withColumn("department", dept)
        .where(F.col("department").isNotNull())  # skip non-dept sheets
        .withColumn("gl_code", normalize_gl_code("col_a"))
        .where(F.col("gl_code").isNotNull())     # P2: data rows only
        .withColumn("amount", clean_amount("col_c"))
        .where(F.col("amount").isNotNull())      # P3 (+ quarantine-able)
        .withColumn("month", month)
        .withColumn("year", year)
        .select(
            "gl_code",
            F.trim("col_b").alias("description_raw"),
            "category", "year", "month", "department", "amount",
        )
    )


def parse_balance_sheet(lines: DataFrame) -> DataFrame:
    """Balance-sheet parse (Code.gs:211-235): section state machine →
    subtotal/blank-description skip (P5, Code.gs:224) → GL/amount parse.
    Department is the empty string (Code.gs:231)."""
    month, year = period_from_filename("file_name")
    desc = F.trim("col_c")
    sectioned = balance_section_category(lines)
    return (
        sectioned.where(
            desc.isNotNull()
            & (desc != "")
            & ~F.upper(desc).startswith("TOTAL ")
        )
        .withColumn("gl_code", normalize_gl_code("col_b"))
        .where(F.col("gl_code").isNotNull())
        .withColumn("amount", clean_amount("col_e"))
        .where(F.col("amount").isNotNull())
        .withColumn("month", month)
        .withColumn("year", year)
        .select(
            "gl_code",
            desc.alias("description_raw"),
            "category", "year", "month",
            F.lit("").alias("department"),
            "amount",
        )
    )
