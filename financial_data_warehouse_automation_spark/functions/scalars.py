"""Scalar column-expression library (SURVEY.md §2.5, F1–F12).

Every function here is a *native* Catalyst column expression — no Python
UDFs — so the hot path stays inside whole-stage codegen and works
identically on a 1000-executor cluster. Reference parity citations point
into the read-only tree at /root/reference.
"""

from __future__ import annotations

import re
from typing import Iterable, Mapping

from pyspark.sql import Column
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# F1 — currency-string parse
# ---------------------------------------------------------------------------


def clean_amount(col: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Parse a currency-formatted string into a signed decimal.

    Semantics match ``clean_amount`` (reference
    python_version/build_warehouse.py:37-51) and ``parseAmount_``
    (google_sheets_version/Code.gs:237-249): strip ``$`` and thousands
    separators, treat ``(x)`` as ``-x``, trim whitespace; empty or
    unparseable input yields NULL (callers quarantine instead of crash).
    """
    c = F.trim(F.col(col).cast("string") if isinstance(col, str) else col.cast("string"))
    stripped = F.trim(F.regexp_replace(c, r"[$,]", ""))
    is_neg = stripped.rlike(r"^\(.*\)$")
    inner = F.trim(F.regexp_replace(stripped, r"^\((.*)\)$", "$1"))
    magnitude = inner.try_cast(f"decimal({precision},{scale})")
    return F.when(is_neg, -magnitude).otherwise(magnitude)


def currency_string(col: Column | str) -> Column:
    """Inverse-ish of :func:`clean_amount` for round-trip property tests:
    render a numeric as ``$1,234.56`` (or ``($1,234.56)`` when negative).
    """
    c = F.col(col) if isinstance(col, str) else col
    body = F.concat(F.lit("$"), F.format_number(F.abs(c), 2))
    return F.when(c < 0, F.concat(F.lit("("), body, F.lit(")"))).otherwise(body)


# ---------------------------------------------------------------------------
# F2 — GL-code normalization
# ---------------------------------------------------------------------------


def normalize_gl_code(col: Column | str) -> Column:
    """Trim, validate 1–4 digits, zero-pad to width 4.

    Adopts the Apps Script semantic (google_sheets_version/Code.gs:251-256
    — ``padStart(4, "0")`` incl. numeric cells) over the strict-4-digit
    Python variant (build_warehouse.py:54-57), per SURVEY §2.11 D3:
    leading zeros are significant, numeric spreadsheet cells lose them.
    Accepts an optional trailing ``.0`` (numeric cell rendered as float).
    NULL when not a 1–4 digit code.
    """
    c = F.trim(F.col(col).cast("string") if isinstance(col, str) else col.cast("string"))
    digits = F.regexp_extract(c, r"^(\d{1,4})(?:\.0+)?$", 1)
    return F.when(digits != "", F.lpad(digits, 4, "0"))


def is_gl_code_strict(col: Column | str) -> Column:
    """Python-reference predicate: exactly four digits
    (build_warehouse.py:54-57)."""
    c = F.trim(F.col(col).cast("string") if isinstance(col, str) else col.cast("string"))
    return c.rlike(r"^\d{4}$")


# ---------------------------------------------------------------------------
# F3 / F4 — period + department extraction from names
# ---------------------------------------------------------------------------


def period_from_filename(col: Column | str) -> tuple[Column, Column]:
    """Extract ``(month, year)`` ints from an ``MM.YYYY`` filename token.

    Reference: build_warehouse.py:20-29 (validates month 1–12) and
    Code.gs:126-132. Returns NULL month when out of range — callers
    filter rather than raise, so one bad filename can't fail a 100 TB job.
    """
    c = F.col(col) if isinstance(col, str) else col
    month = F.regexp_extract(c, r"(\d{2})\.(\d{4})", 1).try_cast("int")
    year = F.regexp_extract(c, r"(\d{2})\.(\d{4})", 2).try_cast("int")
    month = F.when((month >= 1) & (month <= 12), month)
    year = F.when(month.isNotNull(), year)
    return month, year


def dept_from_sheet_name(col: Column | str) -> Column:
    """``DEPARTMENT 123-F`` → ``123``; accepts en/em dashes like the GS
    regex (Code.gs:14); NULL for non-matching sheet names
    (build_warehouse.py:32-34 skips them)."""
    c = F.trim(F.col(col).cast("string") if isinstance(col, str) else col.cast("string"))
    d = F.regexp_extract(c, r"(?i)^DEPARTMENT\s+(\d+)[-–—]F$", 1)
    return F.when(d != "", d)


# ---------------------------------------------------------------------------
# F5 — month number ↔ English name
# ---------------------------------------------------------------------------


def month_name(col: Column | str) -> Column:
    """1 → ``January`` … 12 → ``December`` (build_warehouse.py:202)."""
    c = (F.col(col) if isinstance(col, str) else col).cast("int")
    return F.date_format(F.make_date(F.lit(2000), c, F.lit(1)), "MMMM")


def month_num_from_name(col: Column | str) -> Column:
    """Inverse of :func:`month_name` (Code.gs:139-145)."""
    c = F.trim(F.col(col).cast("string") if isinstance(col, str) else col.cast("string"))
    return F.month(F.to_date(c, "MMMM"))


# ---------------------------------------------------------------------------
# F6 / S8 — header normalization + synonym resolution (driver-side)
# ---------------------------------------------------------------------------

GL_CODE_HEADER_SYNONYMS = frozenset(
    {"gl", "gl code", "glcode", "gl#", "number", "account",
     "account number", "account#", "account #"}
)
DESCRIPTION_HEADER_SYNONYMS = frozenset(
    {"description", "account description", "gl description", "name"}
)
GROUP_HEADER_SYNONYMS = frozenset({"group", "gl group", "account group"})


def normalize_header(header: str) -> str:
    """Lowercase, trim, collapse internal whitespace
    (build_warehouse.py:63; Code.gs:150)."""
    return re.sub(r"\s+", " ", str(header)).strip().lower()


def resolve_columns(
    headers: Iterable[str],
    synonym_sets: Mapping[str, frozenset[str]] | None = None,
) -> dict[str, str | None]:
    """Map logical column roles to physical headers by synonym match.

    Driver-side schema resolution for the GL dimension ingest
    (build_warehouse.py:60-76; Code.gs:147-154). Returns
    ``{role: matched_header_or_None}``; first match wins per role.

    Deliberate divergence from the reference: build_warehouse.py:60-76
    reassigns on every hit (last-match-wins) because its loop has no
    None guard. First-match-wins is chosen here as the deterministic,
    position-stable semantic (leftmost column claims the role); the
    extra synonyms (``gl#``, ``gl group``) widen coverage of real-world
    header spellings beyond the Python reference's set.
    """
    if synonym_sets is None:
        synonym_sets = {
            "gl_code": GL_CODE_HEADER_SYNONYMS,
            "description": DESCRIPTION_HEADER_SYNONYMS,
            "group": GROUP_HEADER_SYNONYMS,
        }
    out: dict[str, str | None] = {role: None for role in synonym_sets}
    for header in headers:
        norm = normalize_header(header)
        for role, synonyms in synonym_sets.items():
            if out[role] is None and norm in synonyms:
                out[role] = header
    return out


# ---------------------------------------------------------------------------
# F10 — join-miss flag
# ---------------------------------------------------------------------------


def gl_missing_flag(description_col: Column | str) -> Column:
    """``description IS NULL`` after the dim join ⇒ unmapped GL
    (build_warehouse.py:133)."""
    c = F.col(description_col) if isinstance(description_col, str) else description_col
    return c.isNull()


# ---------------------------------------------------------------------------
# F8 — numeric cast with error raise; F9 — composite key construction
# ---------------------------------------------------------------------------


def checked_cast(col: Column | str, dtype: str) -> Column:
    """F8: cast that *fails the job* when a non-null value doesn't parse
    (``pd.to_numeric(errors="raise")``, build_warehouse.py:163-164) —
    for columns where silent NULLs would corrupt the warehouse key.
    NULL input stays NULL; junk input raises. The quarantine pattern
    (try_cast + capture, SURVEY §1.4) is preferred on 100 TB inputs;
    this is the strict variant for trusted-but-critical columns."""
    c = F.col(col) if isinstance(col, str) else col
    casted = c.try_cast(dtype)
    return F.when(
        c.isNotNull() & casted.isNull(),
        F.raise_error(
            F.concat(F.lit(f"checked_cast({dtype}) failed for value: "), c.cast("string"))
        ).cast(dtype),
    ).otherwise(casted)


def composite_key(*cols: Column | str, sep: str = "|") -> Column:
    """F9: serialized composite key (``fields.join("|")``, Code.gs:268).
    Spark operators should PARTITION BY the columns directly (no
    serialization needed — SURVEY §2.5 F9); this exists for parity and
    for sinks that want a single-string key, with NULLs rendered
    explicitly so k1|NULL ≠ k1|''."""
    rendered = [
        F.coalesce(
            (F.col(c) if isinstance(c, str) else c).cast("string"), F.lit("NULL")
        )
        for c in cols
    ]
    return F.concat_ws(sep, *rendered)


def md5_prefix_int(c: Column, n_hex: int = 15) -> Column:
    """First ``n_hex`` hex digits of md5(``c``) as a non-negative int64
    — the repo's deterministic, engine-replayable uniform hash (DuckDB
    mirror: ``CAST(concat('0x', substr(md5(x), 1, n)) AS ...)`` or
    equivalent). Used for KMV/Count-Min/Bloom sketch cells, content-
    addressed sampling, shuffle keys, and fake perceptual hashes.
    ``n_hex <= 15`` keeps the value under 2^60, inside int64 with
    headroom for modular arithmetic under ANSI mode. The caller
    supplies the exact input column (including any ``cast("string")
    .cast("binary")`` wrapping) so oracle SQL stays bit-identical."""
    if not 1 <= n_hex <= 15:
        raise ValueError(f"n_hex={n_hex} outside int64-safe 1..15")
    return F.conv(F.substring(F.md5(c), 1, n_hex), 16, 10).cast("long")
