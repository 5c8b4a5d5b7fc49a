"""The stdlib xlsx adapter (ingest/excel.py) against REAL workbooks.

A test-only SpreadsheetML writer builds genuine ``.xlsx`` zips, then the
golden FIXTURES.md line tables round-trip through actual workbook bytes:
write fixture → read_workbooks → identical line table → identical parse.
This closes the gap the openpyxl-gated adapter left: the S1 surface is
now exercised end-to-end in-container (reference behavior at
python_version/build_warehouse.py:112-126)."""

from __future__ import annotations

import zipfile
from xml.sax.saxutils import escape

from pyspark.sql import functions as F

from financial_data_warehouse_automation_spark.ingest.excel import read_workbooks
from financial_data_warehouse_automation_spark.ingest.fixtures import (
    BALANCE_LINES,
    INCOME_LINES,
    spark_df,
)
from financial_data_warehouse_automation_spark.operators.ingest import (
    parse_balance_sheet,
    parse_income_statement,
)

_MAIN = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
_RELNS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
_PKGREL = "http://schemas.openxmlformats.org/package/2006/relationships"


def _write_xlsx(path: str, sheets) -> None:
    """Minimal test-only xlsx writer. ``sheets`` is a list of
    ``(name, rows)``; each row is ``(row_idx, cells)`` where cells is
    either a dict {0-based col: value} (cells carry A1 refs) or a list
    (cells emitted WITHOUT refs, exercising the reader's sequential
    fallback). Values: str → shared string, int/float → number,
    bool → boolean, ("inline", s) → inline string, ("str", s) → cached
    formula string, ("rich", runs) → rich-text shared string."""
    shared: list[str] = []
    seen: dict[str, int] = {}

    def si(fragment: str) -> int:
        if fragment not in seen:
            seen[fragment] = len(shared)
            shared.append(fragment)
        return seen[fragment]

    def cell(ref_attr: str, v) -> str:
        if isinstance(v, tuple) and v[0] == "inline":
            return (
                f"<c{ref_attr} t=\"inlineStr\"><is>"
                f"<t xml:space=\"preserve\">{escape(v[1])}</t></is></c>"
            )
        if isinstance(v, tuple) and v[0] == "str":
            return f"<c{ref_attr} t=\"str\"><f>IGNORED()</f><v>{escape(v[1])}</v></c>"
        if isinstance(v, tuple) and v[0] == "rich":
            frag = "".join(
                f"<r><t xml:space=\"preserve\">{escape(run)}</t></r>"
                for run in v[1]
            )
            return f"<c{ref_attr} t=\"s\"><v>{si(frag)}</v></c>"
        if isinstance(v, tuple) and v[0] == "date":
            return f"<c{ref_attr} s=\"1\"><v>{v[1]!r}</v></c>"
        if isinstance(v, bool):
            return f"<c{ref_attr} t=\"b\"><v>{1 if v else 0}</v></c>"
        if isinstance(v, (int, float)):
            return f"<c{ref_attr}><v>{v!r}</v></c>"
        frag = f"<t xml:space=\"preserve\">{escape(v)}</t>"
        return f"<c{ref_attr} t=\"s\"><v>{si(frag)}</v></c>"

    sheet_xmls = []
    for _, rows in sheets:
        body = []
        for r_idx, cells in rows:
            if isinstance(cells, dict):
                cs = "".join(
                    cell(f' r="{chr(ord("A") + c)}{r_idx}"', cells[c])
                    for c in sorted(cells)
                )
            else:  # list: sequential cells without refs; None = empty cell
                cs = "".join(
                    "<c/>" if v is None else cell("", v) for v in cells
                )
            body.append(f'<row r="{r_idx}">{cs}</row>')
        sheet_xmls.append(
            f'<worksheet xmlns="{_MAIN}"><sheetData>'
            + "".join(body)
            + "</sheetData></worksheet>"
        )

    n = len(sheets)
    names = "".join(
        f'<sheet name="{escape(name, {chr(34): "&quot;"})}" sheetId="{i}" '
        f'r:id="rId{i}"/>'
        for i, (name, _) in enumerate(sheets, 1)
    )
    workbook = (
        f'<workbook xmlns="{_MAIN}" xmlns:r="{_RELNS}">'
        f"<sheets>{names}</sheets></workbook>"
    )
    wb_rels = (
        f'<Relationships xmlns="{_PKGREL}">'
        + "".join(
            f'<Relationship Id="rId{i}" Type="{_RELNS}/worksheet" '
            f'Target="worksheets/sheet{i}.xml"/>'
            for i in range(1, n + 1)
        )
        + f'<Relationship Id="rId{n + 1}" Type="{_RELNS}/sharedStrings" '
        f'Target="sharedStrings.xml"/></Relationships>'
    )
    pkg_rels = (
        f'<Relationships xmlns="{_PKGREL}"><Relationship Id="rId1" '
        f'Type="{_RELNS}/officeDocument" Target="xl/workbook.xml"/>'
        "</Relationships>"
    )
    overrides = "".join(
        f'<Override PartName="/xl/worksheets/sheet{i}.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
        'worksheet+xml"/>'
        for i in range(1, n + 1)
    )
    content_types = (
        '<Types xmlns="http://schemas.openxmlformats.org/package/2006/'
        'content-types">'
        '<Default Extension="rels" ContentType="application/vnd.'
        'openxmlformats-package.relationships+xml"/>'
        '<Default Extension="xml" ContentType="application/xml"/>'
        '<Override PartName="/xl/workbook.xml" ContentType="application/'
        'vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>'
        '<Override PartName="/xl/sharedStrings.xml" ContentType='
        '"application/vnd.openxmlformats-officedocument.spreadsheetml.'
        'sharedStrings+xml"/>' + overrides + "</Types>"
    )
    shared_xml = (
        f'<sst xmlns="{_MAIN}" count="{len(shared)}" '
        f'uniqueCount="{len(shared)}">'
        + "".join(f"<si>{s}</si>" for s in shared)
        + "</sst>"
    )
    decl = '<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
    with zipfile.ZipFile(path, "w", zipfile.ZIP_DEFLATED) as zf:
        zf.writestr("[Content_Types].xml", decl + content_types)
        zf.writestr("_rels/.rels", decl + pkg_rels)
        zf.writestr("xl/workbook.xml", decl + workbook)
        zf.writestr("xl/_rels/workbook.xml.rels", decl + wb_rels)
        zf.writestr("xl/sharedStrings.xml", decl + shared_xml)
        styles = (
            f'<styleSheet xmlns="{_MAIN}"><cellXfs count="2">'
            '<xf numFmtId="0"/><xf numFmtId="14" applyNumberFormat="1"/>'
            "</cellXfs></styleSheet>"
        )
        zf.writestr("xl/styles.xml", decl + styles)
        for i, xml in enumerate(sheet_xmls, 1):
            zf.writestr(f"xl/worksheets/sheet{i}.xml", decl + xml)


def _books_from_lines(lines, col_map):
    """fixture rows -> {file_name: [(sheet, [(row_idx, {col: val})])]}
    preserving fixture order; ``col_map`` maps tuple position to the
    0-based worksheet column."""
    books: dict[str, list] = {}
    for row in lines:
        fname, sheet, r_idx, *vals = row
        cells = {
            col_map[i]: v for i, v in enumerate(vals) if v is not None
        }
        sheets = books.setdefault(fname, [])
        if not sheets or sheets[-1][0] != sheet:
            sheets.append((sheet, []))
        sheets[-1][1].append((r_idx, cells))
    return books


def test_income_golden_through_real_workbooks(spark, tmp_path):
    """FIXTURES.md income lines written to two genuine .xlsx files must
    read back as the identical line table, and the parsed facts must be
    byte-identical to the fixture-driven parse (the oracle-checked
    path) — real-workbook S1 parity, not just fixture parity."""
    books = _books_from_lines(INCOME_LINES, {0: 0, 1: 1, 2: 2})
    paths = []
    for fname, sheets in books.items():
        p = str(tmp_path / fname)
        _write_xlsx(p, sheets)
        paths.append(p)

    got = read_workbooks(spark, paths)
    got_rows = sorted(
        tuple(r)
        for r in got.select(
            "file_name", "sheet_name", "row_idx", "col_a", "col_b", "col_c"
        ).collect()
    )
    assert got_rows == sorted(INCOME_LINES)
    # the untouched tail columns stay NULL
    assert got.where(
        F.col("col_d").isNotNull() | F.col("col_e").isNotNull()
    ).count() == 0

    want = sorted(
        tuple(r)
        for r in parse_income_statement(spark_df(spark, "income_lines"))
        .collect()
    )
    have = sorted(tuple(r) for r in parse_income_statement(got).collect())
    assert have == want and len(have) == 10


def test_balance_golden_through_real_workbook(spark, tmp_path):
    """Balance fixture lives in columns B/C/E — exercises the reader's
    A1-ref column gaps — and must parse identically to the fixture."""
    books = _books_from_lines(BALANCE_LINES, {0: 1, 1: 2, 2: 4})
    (fname, sheets), = books.items()
    p = str(tmp_path / fname)
    _write_xlsx(p, sheets)

    got = read_workbooks(spark, [p])
    got_rows = sorted(
        tuple(r)
        for r in got.select(
            "file_name", "sheet_name", "row_idx", "col_b", "col_c", "col_e"
        ).collect()
    )
    assert got_rows == sorted(BALANCE_LINES)
    assert got.where(
        F.col("col_a").isNotNull() | F.col("col_d").isNotNull()
    ).count() == 0

    want = sorted(
        tuple(r)
        for r in parse_balance_sheet(spark_df(spark, "balance_lines"))
        .collect()
    )
    have = sorted(tuple(r) for r in parse_balance_sheet(got).collect())
    assert have == want and len(have) == 5


def test_cell_type_and_layout_coverage(spark, tmp_path):
    """Every SpreadsheetML cell encoding the reader claims: numbers
    (int/float/scientific), booleans, inline strings, cached formula
    strings, rich-text shared strings, row gaps (padded as None rows),
    ref-less sequential cells, and columns beyond E (dropped)."""
    rows = [
        (1, {0: 1000, 1: 250.5, 2: True, 3: False}),
        (2, {0: ("inline", "  pad me  "), 1: ("str", "CACHED"),
             2: ("rich", ("Rich", " Text"))}),
        # rows 3-4 skipped entirely -> all-None padding
        (5, {0: "after gap", 5: "column F is dropped"}),
        (6, ["no-ref-a", None, "no-ref-c"]),
        (7, {0: 1e3}),
    ]
    p = str(tmp_path / "01.2024 Depts Income Statement.xlsx")
    _write_xlsx(p, [("DEPARTMENT 123-F", rows)])

    got = {
        r.row_idx: (r.col_a, r.col_b, r.col_c, r.col_d, r.col_e)
        for r in read_workbooks(spark, [p]).collect()
    }
    assert got == {
        1: ("1000", "250.5", "True", "False", None),
        2: ("pad me", "CACHED", "Rich Text", None, None),
        3: (None, None, None, None, None),
        4: (None, None, None, None, None),
        5: ("after gap", None, None, None, None),
        6: ("no-ref-a", None, "no-ref-c", None, None),
        7: ("1000.0", None, None, None, None),
    }


def test_date_styled_serials_render_as_datetimes(spark, tmp_path):
    """A date-formatted numeric cell must surface as the datetime
    string openpyxl (data_only) produced, never the raw Excel serial
    (review finding: the stdlib rewrite silently dropped number-format
    handling)."""
    path = str(tmp_path / "dates.xlsx")
    _write_xlsx(path, [
        ("S", [(1, {0: ("date", 45306), 1: ("date", 45306.5), 2: 45306})]),
    ])
    from financial_data_warehouse_automation_spark.ingest.excel import read_workbooks

    row = read_workbooks(spark, [path]).collect()[0]
    assert row.col_a == "2024-01-15 00:00:00"
    assert row.col_b == "2024-01-15 12:00:00"
    assert row.col_c == "45306", "unstyled numbers stay raw"


def test_implicit_row_continues_from_previous_position(spark, tmp_path):
    """A <row> without r continues from the previous row's position + 1
    (review finding: the enumeration-index fallback put it at its
    element index, overwriting earlier rows)."""
    import zipfile as _zf

    path = str(tmp_path / "rows.xlsx")
    _write_xlsx(path, [("S", [(5, {0: "at5"})])])
    # patch the sheet: append an implicit row AFTER the r="5" row
    with _zf.ZipFile(path) as z:
        parts = {n: z.read(n) for n in z.namelist()}
    sheet = parts["xl/worksheets/sheet1.xml"].decode()
    sheet = sheet.replace(
        "</sheetData>",
        '<row><c t="inlineStr"><is><t>implicit</t></is></c></row></sheetData>',
    )
    parts["xl/worksheets/sheet1.xml"] = sheet.encode()
    with _zf.ZipFile(path, "w") as z:
        for n, b in parts.items():
            z.writestr(n, b)

    from financial_data_warehouse_automation_spark.ingest.excel import read_workbooks

    rows = {r.row_idx: r.col_a for r in read_workbooks(spark, [path]).collect()}
    assert rows[5] == "at5"
    assert rows[6] == "implicit", f"implicit row must land at 6, got {rows}"


def test_phonetic_runs_excluded():
    """<rPh> phonetic guide runs (furigana) must not leak into cell
    text — Excel and openpyxl surface only the base runs."""
    import xml.etree.ElementTree as ET

    from financial_data_warehouse_automation_spark.ingest.excel import _rich_text

    si = ET.fromstring(
        f'<si xmlns="{_MAIN}"><r><t>漢字</t></r>'
        "<rPh sb=\"0\" eb=\"2\"><t>かんじ</t></rPh>"
        '<phoneticPr fontId="1"/></si>'
    )
    assert _rich_text(si) == "漢字"
    plain = ET.fromstring(f'<si xmlns="{_MAIN}"><t>plain</t></si>')
    assert _rich_text(plain) == "plain"


def test_serial_midnight_carry():
    """A serial within ~0.5µs below midnight rounds to exactly 24h of
    microseconds; the day must carry instead of rendering 00:00:00 on
    the previous date. Exact midnight time-only serials still render
    as a bare time."""
    import datetime as dt

    from financial_data_warehouse_automation_spark.ingest.excel import (
        _EXCEL_EPOCH_ORDINAL,
        _render_serial_datetime,
    )

    out = _render_serial_datetime("45000.999999999999")
    expect = dt.datetime.combine(
        dt.date.fromordinal(_EXCEL_EPOCH_ORDINAL + 45001), dt.time()
    )
    assert out == str(expect), out
    assert _render_serial_datetime("0.0") == "00:00:00"
    # pure-time serial that carries stays a BARE midnight time:
    # openpyxl returns a time object for any 0 <= serial < 1 (its
    # timedelta normalization folds the carried day away), so parity
    # means '00:00:00', not a datetime on the epoch date (advisor
    # finding, round 8)
    assert _render_serial_datetime("0.999999999999") == "00:00:00"


def test_date1904_epoch(tmp_path):
    """Workbooks flagged <workbookPr date1904="1"/> count serials from
    1904-01-01; the flag must be read and the epoch switched."""
    import datetime as dt
    import zipfile as zfmod

    from financial_data_warehouse_automation_spark.ingest.excel import (
        _EXCEL_1904_ORDINAL,
        _date1904,
        _render_serial_datetime,
    )

    p = str(tmp_path / "wb.zip")
    with zfmod.ZipFile(p, "w") as zf:
        zf.writestr(
            "xl/workbook.xml",
            f'<workbook xmlns="{_MAIN}"><workbookPr date1904="1"/>'
            "<sheets/></workbook>",
        )
    with zfmod.ZipFile(p) as zf:
        assert _date1904(zf) is True
    with zfmod.ZipFile(p, "w") as zf:
        zf.writestr(
            "xl/workbook.xml",
            f'<workbook xmlns="{_MAIN}"><sheets/></workbook>',
        )
    with zfmod.ZipFile(p) as zf:
        assert _date1904(zf) is False
    out = _render_serial_datetime("100.5", _EXCEL_1904_ORDINAL)
    assert out == str(
        dt.datetime.combine(
            dt.date.fromordinal(_EXCEL_1904_ORDINAL + 100), dt.time(12)
        )
    )
