"""S1/S2 Excel workbook adapter (SURVEY §2.1, §4.3).

Reads ``*.xlsx`` workbooks into the line-table shape the parsing
operators consume: one row per cell-row with ``file_name``,
``sheet_name``, ``row_idx`` metadata (row order is data — SURVEY §1.1).

The reader is stdlib-only (``zipfile`` + ``xml.etree``): an ``.xlsx``
is a zip of SpreadsheetML XML parts, so no third-party dependency is
required and the path is exercisable in any container. Coverage:
shared strings, inline strings, cached formula strings, booleans, and
numbers (rendered the way ``str()`` of the Python value would — the
reference's string-first semantics, Code.gs:219-227); sheet order
follows the workbook part, row/column gaps are preserved as ``None``
so ``row_idx`` stays positional.

Workbooks are driver-side small files in the reference's world (≤ a few
hundred rows per sheet); the bronze boundary converts them to Parquet
once, and everything downstream is distributed Spark. For bulk backfills
of many workbooks, ``paths`` can instead be parallelized with
``spark.sparkContext.parallelize(paths).flatMap(_read_workbook_rows)`` —
the reader is a pure function of the file bytes and pickles cleanly;
still no Excel bytes ever cross a shuffle.
"""

from __future__ import annotations

import re
import zipfile
import xml.etree.ElementTree as ET
from collections.abc import Iterator, Sequence

from pyspark.sql import DataFrame, SparkSession

LINE_SCHEMA = (
    "file_name string, sheet_name string, row_idx int, "
    "col_a string, col_b string, col_c string, col_d string, col_e string"
)
_N_COLS = 5

_M = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
_PKG_REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"
_RID = (
    "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}id"
)


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    # an <si> may be plain (<t>) or rich-text runs (<r><t>..</t></r>);
    # concatenating every descendant <t> covers both
    return [
        "".join(t.text or "" for t in si.iter(f"{_M}t"))
        for si in root.iter(f"{_M}si")
    ]


def _sheet_parts(zf: zipfile.ZipFile) -> list[tuple[str, str]]:
    """(sheet name, zip member) in workbook order."""
    rels = {
        rel.get("Id"): rel.get("Target")
        for rel in ET.fromstring(
            zf.read("xl/_rels/workbook.xml.rels")
        ).iter(f"{_PKG_REL}Relationship")
    }
    out = []
    for sheet in ET.fromstring(zf.read("xl/workbook.xml")).iter(f"{_M}sheet"):
        target = rels[sheet.get(_RID)]
        member = target.lstrip("/") if target.startswith("/") else f"xl/{target}"
        out.append((sheet.get("name"), member))
    return out


def _render_number(raw: str) -> str:
    """Render a numeric cell the way ``str()`` of the Python value
    would (int when integral, shortest-repr float otherwise) so the
    stdlib reader and an openpyxl-style reader agree."""
    if re.fullmatch(r"-?\d+", raw):
        return raw
    try:
        return str(float(raw))
    except ValueError:
        return raw


def _cell_value(cell: ET.Element, shared: list[str]) -> str | None:
    kind = cell.get("t", "n")
    if kind == "inlineStr":
        holder = cell.find(f"{_M}is")
        if holder is None:
            return None
        return "".join(t.text or "" for t in holder.iter(f"{_M}t"))
    v = cell.find(f"{_M}v")
    if v is None or v.text is None:
        return None
    raw = v.text
    if kind == "s":
        return shared[int(raw)]
    if kind == "b":
        return "True" if raw.strip() == "1" else "False"
    if kind in ("str", "e"):  # cached formula string / error literal
        return raw
    return _render_number(raw)


def _col_index(ref: str | None, fallback: int) -> int:
    """0-based column from an A1-style cell ref; ``fallback`` when the
    ref attribute is absent (writers may omit it — cells then advance
    one column at a time)."""
    if not ref:
        return fallback
    idx = 0
    for ch in ref:
        if not ch.isalpha():
            break
        idx = idx * 26 + (ord(ch.upper()) - ord("A") + 1)
    return idx - 1 if idx else fallback


def _read_workbook_rows(path: str) -> Iterator[tuple]:
    fname = path.rsplit("/", 1)[-1]
    with zipfile.ZipFile(path) as zf:
        shared = _shared_strings(zf)
        for sheet_name, member in _sheet_parts(zf):
            rows: dict[int, list[str | None]] = {}
            for i, row in enumerate(
                ET.fromstring(zf.read(member)).iter(f"{_M}row"), start=1
            ):
                r_idx = int(row.get("r", i))
                cells: list[str | None] = [None] * _N_COLS
                next_col = 0
                for cell in row.iter(f"{_M}c"):
                    c_idx = _col_index(cell.get("r"), next_col)
                    next_col = c_idx + 1
                    if c_idx >= _N_COLS:
                        continue
                    v = _cell_value(cell, shared)
                    cells[c_idx] = v.strip() if v is not None else None
                rows[r_idx] = cells
            # positional row_idx is data (S5 ordering): emit 1..max_row
            # with all-None padding for skipped row elements, matching
            # what a dimension-faithful reader yields
            for r_idx in range(1, max(rows, default=0) + 1):
                yield (
                    fname,
                    sheet_name,
                    r_idx,
                    *rows.get(r_idx, [None] * _N_COLS),
                )


def read_workbooks(spark: SparkSession, paths: Sequence[str]) -> DataFrame:
    """Open each workbook (S1), emit the positional line table (S2/S3).
    Cell values arrive as trimmed strings — type recovery is the
    parsing operators' job (F1/F2), matching the reference's
    string-first semantics (Code.gs:219-227)."""
    rows = [r for p in paths for r in _read_workbook_rows(p)]
    return spark.createDataFrame(rows, LINE_SCHEMA)
