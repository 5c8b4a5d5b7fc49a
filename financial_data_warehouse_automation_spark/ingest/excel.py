"""S1/S2 Excel workbook adapter (SURVEY §2.1, §4.3).

Reads ``*.xlsx`` workbooks into the line-table shape the parsing
operators consume: one row per cell-row with ``file_name``,
``sheet_name``, ``row_idx`` metadata (row order is data — SURVEY §1.1).

The reader is stdlib-only (``zipfile`` + ``xml.etree``): an ``.xlsx``
is a zip of SpreadsheetML XML parts, so no third-party dependency is
required and the path is exercisable in any container. Coverage:
shared strings, inline strings, cached formula strings, booleans,
numbers (rendered the way ``str()`` of the Python value would — the
reference's string-first semantics, Code.gs:219-227), and
date/time-styled serials (styles.xml numFmt detection → rendered as
``str()`` of the datetime, matching what openpyxl ``data_only``
yielded); sheet order follows the workbook part, row/column gaps are
preserved as ``None`` so ``row_idx`` stays positional (implicit
``<row>``/``<c>`` elements continue from the previous position).

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


def _rich_text(holder: ET.Element) -> str:
    """Text of an <si> or <is>: a plain <t>, or rich-text runs
    (<r><t>..</t></r>). Only top-level <t> and <r>/<t> children count —
    iterating every DESCENDANT <t> would also pick up <rPh> phonetic
    guide runs (furigana in East-Asian workbooks), appending phonetic
    text that Excel and openpyxl never surface (advisor finding)."""
    parts = []
    t = holder.find(f"{_M}t")
    if t is not None:
        parts.append(t.text or "")
    for r in holder.findall(f"{_M}r"):
        rt = r.find(f"{_M}t")
        if rt is not None:
            parts.append(rt.text or "")
    return "".join(parts)


def _shared_strings(zf: zipfile.ZipFile) -> list[str]:
    try:
        root = ET.fromstring(zf.read("xl/sharedStrings.xml"))
    except KeyError:
        return []
    return [_rich_text(si) for si in root.iter(f"{_M}si")]


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


# Built-in numFmtIds Excel renders as dates/times (ECMA-376 §18.8.30,
# the same set openpyxl treats as dates); custom formats are detected
# by date tokens in the format code.
_BUILTIN_DATE_FMTS = frozenset(
    list(range(14, 23)) + list(range(27, 37)) + list(range(45, 48))
    + list(range(50, 59))
)
_EXCEL_EPOCH_ORDINAL = 693594  # datetime(1899, 12, 30).toordinal()
_EXCEL_1904_ORDINAL = 695056   # datetime(1904, 1, 1).toordinal()


def _date1904(zf: zipfile.ZipFile) -> bool:
    """Mac-origin workbooks declare <workbookPr date1904="1"/> — their
    serials count from 1904-01-01, ~4 years after the default epoch.
    Ignoring the flag silently mis-renders every date (advisor
    finding); openpyxl honors it, so the stdlib reader must too."""
    try:
        root = ET.fromstring(zf.read("xl/workbook.xml"))
    except KeyError:
        return False
    pr = root.find(f"{_M}workbookPr")
    return pr is not None and pr.get("date1904", "0").lower() in ("1", "true")


def _date_styles(zf: zipfile.ZipFile) -> frozenset[int]:
    """cellXfs indices whose number format is a date/time format.

    openpyxl (data_only) converted these serials to datetimes; the
    stdlib reader must not silently surface raw serial strings instead
    (review finding). Styles are optional — workbooks without
    xl/styles.xml have no date styles."""
    try:
        root = ET.fromstring(zf.read("xl/styles.xml"))
    except KeyError:
        return frozenset()
    custom_date: set[int] = set()
    for fmt in root.iter(f"{_M}numFmt"):
        code = fmt.get("formatCode", "")
        # strip quoted literals and [] sections, then look for date tokens
        bare = re.sub(r'"[^"]*"|\[[^\]]*\]|\\.', "", code)
        if re.search(r"[ymdhsYMDHS]", bare):
            custom_date.add(int(fmt.get("numFmtId", "-1")))
    styles: set[int] = set()
    cell_xfs = root.find(f"{_M}cellXfs")
    if cell_xfs is not None:
        for i, xf in enumerate(cell_xfs.iter(f"{_M}xf")):
            fmt_id = int(xf.get("numFmtId", "0"))
            if fmt_id in _BUILTIN_DATE_FMTS or fmt_id in custom_date:
                styles.add(i)
    return frozenset(styles)


def _render_serial_datetime(raw: str, epoch_ordinal: int = _EXCEL_EPOCH_ORDINAL) -> str:
    """Render a date-styled serial the way ``str()`` of openpyxl's
    datetime/time would: 1899-12-30 epoch (1904-01-01 for date1904
    workbooks), day fraction = time; pure time formats (serial < 1)
    render as a bare time."""
    import datetime as _dt

    serial = float(raw)
    days = int(serial)
    frac = round((serial - days) * 86400 * 1_000_000)  # µs in the day
    if frac >= 86_400_000_000:
        # rounding can land exactly on midnight (serial within ~0.5µs
        # below a day boundary) — carry into the date instead of
        # emitting 00:00:00 on the PREVIOUS day (advisor finding)
        days += 1
        frac = 0
    tm = (_dt.datetime.min + _dt.timedelta(microseconds=frac)).time()
    if 0 <= serial < 1:
        # pure-time serials stay bare times even when the carry fires:
        # openpyxl returns a time object for ANY 0 <= serial < 1 (its
        # timedelta normalizes the ~1-day µs total to days=1/time 00:00
        # and days_to_time reads only the sub-day fields), so parity
        # demands '00:00:00', not a datetime on the epoch date
        # (advisor finding, round 8).
        return str(tm)
    d = _dt.date.fromordinal(epoch_ordinal + days)
    return str(_dt.datetime.combine(d, tm))


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


def _cell_value(
    cell: ET.Element, shared: list[str],
    date_styles: frozenset[int] = frozenset(),
    epoch_ordinal: int = _EXCEL_EPOCH_ORDINAL,
) -> str | None:
    kind = cell.get("t", "n")
    if kind == "inlineStr":
        holder = cell.find(f"{_M}is")
        if holder is None:
            return None
        return _rich_text(holder)
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
    if int(cell.get("s", "-1")) in date_styles:
        try:
            return _render_serial_datetime(raw, epoch_ordinal)
        except (ValueError, OverflowError):
            return _render_number(raw)
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
        date_styles = _date_styles(zf)
        epoch = _EXCEL_1904_ORDINAL if _date1904(zf) else _EXCEL_EPOCH_ORDINAL
        for sheet_name, member in _sheet_parts(zf):
            rows: dict[int, list[str | None]] = {}
            # r is optional on <row> just like on <c>: an implicit row
            # continues from the PREVIOUS row's position + 1, not from
            # its enumeration index (a '<row r="5">…</row><row>…</row>'
            # sheet puts the second row at 6, not 2 — review finding)
            next_row = 1
            for row in ET.fromstring(zf.read(member)).iter(f"{_M}row"):
                r_idx = int(row.get("r", next_row))
                next_row = r_idx + 1
                cells: list[str | None] = [None] * _N_COLS
                next_col = 0
                for cell in row.iter(f"{_M}c"):
                    c_idx = _col_index(cell.get("r"), next_col)
                    next_col = c_idx + 1
                    if c_idx >= _N_COLS:
                        continue
                    v = _cell_value(cell, shared, date_styles, epoch)
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
