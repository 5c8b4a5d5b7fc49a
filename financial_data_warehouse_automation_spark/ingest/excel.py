"""S1/S2 Excel workbook adapter (SURVEY §2.1, §4.3).

Reads ``*.xlsx`` workbooks into the line-table shape the parsing
operators consume: one row per cell-row with ``file_name``,
``sheet_name``, ``row_idx`` metadata (row order is data — SURVEY §1.1).

Workbooks are driver-side small files in the reference's world (≤ a few
hundred rows per sheet); the bronze boundary converts them to Parquet
once, and everything downstream is distributed Spark. For bulk backfills
of many workbooks, ``paths`` can instead be parallelized with
``spark.sparkContext.parallelize(paths).flatMap(_read_workbook_rows)`` —
still no Excel bytes ever cross a shuffle.

openpyxl is not present in the verification container, so the adapter is
import-gated; the parsing operators themselves are exercised through the
FIXTURES.md tables (ingest/fixtures.py), which reproduce every layout
quirk of the sample workbooks.
"""

from __future__ import annotations

from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession

try:  # pragma: no cover - container has no openpyxl
    import openpyxl  # type: ignore
except ImportError:  # pragma: no cover
    openpyxl = None

LINE_SCHEMA = (
    "file_name string, sheet_name string, row_idx int, "
    "col_a string, col_b string, col_c string, col_d string, col_e string"
)
_N_COLS = 5


def _require_openpyxl() -> None:
    if openpyxl is None:
        raise ImportError(
            "openpyxl is required for Excel ingest; convert workbooks to "
            "parquet at the bronze boundary or install openpyxl. The "
            "parsing operators are independently testable via "
            "financial_data_warehouse_automation_spark.ingest.fixtures."
        )


def _read_workbook_rows(path: str) -> Iterator[tuple]:
    _require_openpyxl()
    wb = openpyxl.load_workbook(path, read_only=True, data_only=True)
    fname = path.rsplit("/", 1)[-1]
    for ws in wb.worksheets:
        for i, row in enumerate(ws.iter_rows(values_only=True), start=1):
            cells = [
                (str(v).strip() if v is not None else None)
                for v in (row[:_N_COLS] + (None,) * max(0, _N_COLS - len(row)))
            ]
            yield (fname, ws.title, i, *cells)


def read_workbooks(spark: SparkSession, paths: Sequence[str]) -> DataFrame:
    """Open each workbook (S1), emit the positional line table (S2/S3).
    Cell values arrive as trimmed strings — type recovery is the
    parsing operators' job (F1/F2), matching the reference's
    string-first semantics (Code.gs:219-227)."""
    rows = [r for p in paths for r in _read_workbook_rows(p)]
    return spark.createDataFrame(rows, LINE_SCHEMA)
