"""FIXTURES.md §A reference-shaped fixture data (deterministic,
handcrafted to hit every parsing quirk the reference handles).

Quirk coverage map (reference cites):
  * currency strings ``$1,000.00`` / parenthesized negatives /
    empty / ``n/a`` junk            — build_warehouse.py:37-51
  * 1–3 digit GL codes needing zero-pad — Code.gs:251-256
  * header row at varying depth     — Code.gs:175-183
  * en-dash department sheet names  — Code.gs:14
  * non-department sheets skipped   — build_warehouse.py:116-118
  * dim duplicates w/ conflicting descriptions — build_warehouse.py:82
  * fact GLs absent from dim (QA)   — build_warehouse.py:133
  * balance-sheet section sentinels — Code.gs:222-223
  * ``TOTAL ...`` subtotal rows     — Code.gs:224

The same literal rows feed Spark (``spark_df``) and the DuckDB oracle
(``sql_values``), so ingest queries are hash-checkable end to end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

# (row_idx, c1, c2, c3); row 1 is the header row with synonym/whitespace
# variants that S8 must resolve (gl# / account description / group).
GL_LINES = [
    (1, " GL# ", " Account Description ", "Group"),
    (2, "1111", "Product Revenue", "Revenue Group"),
    (3, "1112", "Service Revenue", "Revenue Group"),
    (4, "1113", "Other Revenue", None),
    (5, "2111", "Salaries", "General Administrative"),
    (6, "2112", "Rent", "General Administrative"),
    (7, "2113", "Utilities", "Other Expense"),
    (8, "2113", "Utilities DUPLICATE", "Other Expense"),
    (9, "0123", "Petty Cash", "Other Expense"),
    (10, "3111", "Cash", "General Administrative"),
    (11, "3112", "Receivables", None),
    (12, "4111", "Payables", None),
    (13, "5111", "Retained Earnings", None),
]
GL_SCHEMA = "row_idx int, c1 string, c2 string, c3 string"

DEPT_CODES = [(str(d), f"dept{d - 122}") for d in range(123, 131)]
DEPT_SCHEMA = "dept string, name string"

_F1 = "01.2024 Depts Income Statement.xlsx"
_F2 = "02.2024 Depts Income Statement.xlsx"

# (file_name, sheet_name, row_idx, col_a, col_b, col_c)
INCOME_LINES = [
    # file 1, DEPARTMENT 123-F — header at row 2
    (_F1, "DEPARTMENT 123-F", 1, "Company Inc", None, None),
    (_F1, "DEPARTMENT 123-F", 2, "NUMBER", "DESCRIPTION", "ACTUAL"),
    (_F1, "DEPARTMENT 123-F", 3, "REVENUES", None, None),
    (_F1, "DEPARTMENT 123-F", 4, "1111", "Product Revenue", "$1,000.00"),
    (_F1, "DEPARTMENT 123-F", 5, "1112", "Service Revenue", "250.50"),
    (_F1, "DEPARTMENT 123-F", 6, None, "TOTAL REVENUES", "1250.50"),
    (_F1, "DEPARTMENT 123-F", 7, "EXPENSES", None, None),
    (_F1, "DEPARTMENT 123-F", 8, "2111", "Salaries", "(400.00)"),
    (_F1, "DEPARTMENT 123-F", 9, "123", "Petty Cash Expense", "42.00"),
    (_F1, "DEPARTMENT 123-F", 10, "2999", "Mystery Expense", "13.37"),
    (_F1, "DEPARTMENT 123-F", 11, "2112", "Rent", "n/a"),
    (_F1, "DEPARTMENT 123-F", 12, None, "OPERATING PROFIT/LOSS", "903.87"),
    # file 1, DEPARTMENT 124–F (en dash) — header buried at row 4
    (_F1, "DEPARTMENT 124–F", 1, "Company Inc", None, None),
    (_F1, "DEPARTMENT 124–F", 2, "For the period ending", None, None),
    (_F1, "DEPARTMENT 124–F", 3, None, None, None),
    (_F1, "DEPARTMENT 124–F", 4, "NUMBER", "DESCRIPTION", "ACTUAL"),
    (_F1, "DEPARTMENT 124–F", 5, "REVENUES", None, None),
    (_F1, "DEPARTMENT 124–F", 6, "1113", "Other Revenue", "$75.25"),
    (_F1, "DEPARTMENT 124–F", 7, "EXPENSES", None, None),
    (_F1, "DEPARTMENT 124–F", 8, "2113", "Utilities", "(15.75)"),
    (_F1, "DEPARTMENT 124–F", 9, "2112", "Rent", ""),
    # file 1, SUMMARY — must be skipped (sheet name doesn't match)
    (_F1, "SUMMARY", 1, "NUMBER", "DESCRIPTION", "ACTUAL"),
    (_F1, "SUMMARY", 2, "1111", "Would Double-Count", "999.99"),
    # file 2 — next period, dept 123 only
    (_F2, "DEPARTMENT 123-F", 1, "Company Inc", None, None),
    (_F2, "DEPARTMENT 123-F", 2, "NUMBER", "DESCRIPTION", "ACTUAL"),
    (_F2, "DEPARTMENT 123-F", 3, "REVENUES", None, None),
    (_F2, "DEPARTMENT 123-F", 4, "1111", "Product Revenue", "$1,100.00"),
    (_F2, "DEPARTMENT 123-F", 5, "EXPENSES", None, None),
    (_F2, "DEPARTMENT 123-F", 6, "2111", "Salaries", "(450.00)"),
    (_F2, "DEPARTMENT 123-F", 7, "2999", "Mystery Expense", "14.00"),
]
INCOME_SCHEMA = (
    "file_name string, sheet_name string, row_idx int, "
    "col_a string, col_b string, col_c string"
)

# The MARCH drop (r13, ingest_monthly_snapshot_loop): the 03.2024 file
# plus a RESTATED February delivery — same 02.2024 file name (the
# period key comes from the name), corrected Product Revenue — which
# the A2 merge must last-write-win while time travel preserves the
# originally-reported February. 2998 is deliberately unmapped (QA
# Open) and 2999 is absent (QA Resolved). Kept as a SEPARATE fixture:
# it is a separate month's delivery, and the period-1/2 queries'
# oracles keep reading exactly the rows those periods delivered.
_F3 = "03.2024 Depts Income Statement.xlsx"
INCOME_LINES_P3 = [
    (_F3, "DEPARTMENT 123-F", 1, "Company Inc", None, None),
    (_F3, "DEPARTMENT 123-F", 2, "NUMBER", "DESCRIPTION", "ACTUAL"),
    (_F3, "DEPARTMENT 123-F", 3, "REVENUES", None, None),
    (_F3, "DEPARTMENT 123-F", 4, "1111", "Product Revenue", "$1,200.00"),
    (_F3, "DEPARTMENT 123-F", 5, "1112", "Service Revenue", "300.00"),
    (_F3, "DEPARTMENT 123-F", 6, "EXPENSES", None, None),
    (_F3, "DEPARTMENT 123-F", 7, "2111", "Salaries", "(475.00)"),
    (_F3, "DEPARTMENT 123-F", 8, "2998", "New Mystery Expense", "21.00"),
    # restatement of February, delivered with the March drop
    (_F2, "DEPARTMENT 123-F", 1, "Company Inc", None, None),
    (_F2, "DEPARTMENT 123-F", 2, "NUMBER", "DESCRIPTION", "ACTUAL"),
    (_F2, "DEPARTMENT 123-F", 3, "REVENUES", None, None),
    (_F2, "DEPARTMENT 123-F", 4, "1111", "Product Revenue", "$1,150.00"),
]

_BF = "01.2024 Company Name Balance Sheet.xlsx"
_BSHEET = "COMPANY BALANCE SHEET COMPARA"

# (file_name, sheet_name, row_idx, col_b, col_c, col_e)
BALANCE_LINES = [
    (_BF, _BSHEET, 1, None, "Company Balance Sheet", None),
    (_BF, _BSHEET, 2, "3111", "Cash", "$500.00"),
    (_BF, _BSHEET, 3, "3112", "Receivables", "120.00"),
    (_BF, _BSHEET, 4, None, "TOTAL CASH", "620.00"),
    (_BF, _BSHEET, 5, "3999", "Mystery Asset", "33.00"),
    (_BF, _BSHEET, 6, None, "TOTAL ASSETS", "653.00"),
    (_BF, _BSHEET, 7, "4111", "Payables", "(200.00)"),
    (_BF, _BSHEET, 8, None, "TOTAL LIABILITIES", "(200.00)"),
    (_BF, _BSHEET, 9, "5111", "Retained Earnings", "453.00"),
    (_BF, _BSHEET, 10, None, "TOTAL LIABILITIES AND EQUITY", "253.00"),
]
BALANCE_SCHEMA = (
    "file_name string, sheet_name string, row_idx int, "
    "col_b string, col_c string, col_e string"
)

# (file_name, mtime) — the drop-folder inventory for S4/S5/S6/P8/O2/O3:
# valid monthly workbooks out of order, the warehouse file itself, a
# non-xlsx temp file, and period-less / bad-month names to reject.
FILE_LISTING = [
    ("02.2024 Depts Income Statement.xlsx", 1900),
    ("01.2024 Depts Income Statement.xlsx", 2000),  # newest mtime, older period
    ("12.2023 Depts Income Statement.xlsx", 1700),
    ("13.2023 Depts Income Statement.xlsx", 1650),  # month 13 → invalid
    ("Example_Company Data Warehouse.xlsx", 1600),  # the warehouse itself
    ("notes about 01.2024.txt", 1500),              # not a workbook
    ("Depts Income Statement draft.xlsx", 1400),    # no MM.YYYY period
    ("01.2024 Company Name Balance Sheet.xlsx", 1300),
]
FILE_LISTING_SCHEMA = "file_name string, mtime int"

_FIXTURES = {
    "gl_lines": (GL_LINES, GL_SCHEMA),
    "dept_codes": (DEPT_CODES, DEPT_SCHEMA),
    "income_lines": (INCOME_LINES, INCOME_SCHEMA),
    "income_lines_p3": (INCOME_LINES_P3, INCOME_SCHEMA),
    "balance_lines": (BALANCE_LINES, BALANCE_SCHEMA),
    "file_listing": (FILE_LISTING, FILE_LISTING_SCHEMA),
}


# Per-session memo of the fixture frames, .cache()d: the warehouse
# build assembles ~10 tiny stages from these literals, and re-creating
# + re-evaluating a local relation per query made the ingest headline
# latency-bound (bench: ingest_warehouse_build was co-heaviest at
# 1.74s, almost entirely fixture-stage setup). The frames are a few
# dozen literal rows, so caching is free; keyed by applicationId so a
# fresh session never sees another session's cached plan, and entries
# from any OTHER session are evicted on insert — a process that
# creates/stops sessions repeatedly must not pin dead sessions (and
# their JVM-side cached blocks) for its lifetime (review finding).
_DF_CACHE: dict[tuple[str, str], DataFrame] = {}


def spark_df(spark: SparkSession, name: str) -> DataFrame:
    app = spark.sparkContext.applicationId
    key = (app, name)
    df = _DF_CACHE.get(key)
    if df is None:
        for k in [k for k in _DF_CACHE if k[0] != app]:
            del _DF_CACHE[k]
        rows, schema = _FIXTURES[name]
        df = spark.createDataFrame(rows, schema).cache()
        _DF_CACHE[key] = df
    return df


def _sql_lit(v) -> str:
    if v is None:
        return "NULL"
    if isinstance(v, int):
        return str(v)
    return "'" + str(v).replace("'", "''") + "'"


def sql_values(name: str) -> str:
    """``(col, ...) AS (VALUES ...)`` body for a WITH clause — the same
    rows the Spark side reads, so oracles replay identical input."""
    rows, schema = _FIXTURES[name]
    cols = ", ".join(part.strip().split()[0] for part in schema.split(","))
    body = ",\n    ".join(
        "(" + ", ".join(_sql_lit(v) for v in row) + ")" for row in rows
    )
    return f"({cols}) AS (VALUES\n    {body})"
