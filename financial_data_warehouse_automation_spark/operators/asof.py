"""As-of (most-recent-match) join — a SURVEY §2.10 target operator the
reference lacks and Spark has no built-in for.

Implemented as the *merge* formulation, not join-then-filter:

    union(left probes, right quotes) sorted by (key, ts)
    → last(right payload IGNORE NULLS) over a running window
    → keep probe rows

One shuffle on the key, no row explosion: the naive
``join ON key AND r.ts <= l.ts`` + ``row_number`` produces |L|×|matching R|
intermediate rows (quadratic for hot keys) — at 100 TB the merge form is
the difference between a linear sort-merge pass and an OOM. Equal
timestamps: the right row sorts *before* the probe (ties-include
semantics, ``ts_right <= ts_left``), matching SQL ASOF / DuckDB.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TS = "_asof_ts"
_SIDE = "_asof_side"       # 0 = right (quote), 1 = left (probe)
_PAYLOAD = "_asof_payload"


def asof_join_last(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: Column,
    right_ts: Column,
    right_cols: Sequence[str],
    right_tie_break: Sequence[Column] = (),
) -> DataFrame:
    """For each left row, attach ``right_cols`` from the latest right row
    of the same ``on`` key with ``right_ts <= left_ts`` (NULLs when no
    such row — left-outer semantics).

    ``right_tie_break``: ordering among right rows sharing (key, ts);
    the *last* under this ordering wins (pass e.g. ``[F.asc("id")]`` to
    make the max-id row win deterministically). The payload travels as
    one struct so all columns come from the same winning row.
    """
    lcols = left.columns
    # payload struct type from the cached schema objects (r15): the
    # probe-DataFrame formulation (right.select(struct(...)).schema)
    # created + analyzed an extra frame per build for a type both
    # sides' schemas already hold.
    from pyspark.sql.types import StructField, StructType

    rschema = right.schema
    payload_type = StructType(
        [StructField(c, rschema[c].dataType, True) for c in right_cols]
    )
    l_side = left.select(
        *lcols,
        left_ts.alias(_TS),
        F.lit(1).alias(_SIDE),
        F.lit(None).cast(payload_type).alias(_PAYLOAD),
    )
    lschema = left.schema
    r_side = right.select(
        *[
            F.col(c) if c in on
            else F.lit(None).cast(lschema[c].dataType).alias(c)
            for c in lcols
        ],
        right_ts.alias(_TS),
        F.lit(0).alias(_SIDE),
        F.struct(*right_cols).alias(_PAYLOAD),
    )

    unioned = l_side.unionByName(r_side)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.asc(_TS), F.asc(_SIDE), *right_tie_break)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = unioned.withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    )
    return (
        matched.where(F.col(_SIDE) == 1)
        .select(*lcols, *[F.col(f"{_PAYLOAD}.{c}").alias(c) for c in right_cols])
    )


def asof_join_next(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: Column,
    right_ts: str | Column,
    right_cols: Sequence[str],
    tolerance: Column | None = None,
    right_tie_break: Sequence[Column] = (),
) -> DataFrame:
    """Forward as-of: attach ``right_cols`` from the *earliest* right row
    with ``right_ts >= left_ts`` (ties include equality), NULLs when none
    — or when the match lies beyond ``left_ts + tolerance`` (pandas
    merge_asof's direction='forward' + tolerance, at shuffle scale).

    Same merge formulation as :func:`asof_join_last`, mirrored: probes
    sort *before* equal-ts quotes and the running window looks forward
    (``first IGNORE NULLS`` over CURRENT ROW → UNBOUNDED FOLLOWING).
    Still one shuffle, still no row explosion.
    """
    rts = "_asof_rts"
    lcols = left.columns
    # payload struct type from cached schemas, single ordered select per
    # side (r15) — same rationale as asof_join_last above. The rts field
    # needs one analyzed probe only for right_ts's type, which a Column
    # expression cannot give statically; when the caller passes a plain
    # column NAME (r16, advisor: the r15 form string-matched the private
    # Column._jc rendering against field names, which an expression
    # whose rendered form coincides with a field could spoof) the type
    # reads straight off the schema, any Column falls back to the probe.
    from pyspark.sql.types import StructField, StructType

    rschema = right.schema
    if isinstance(right_ts, str):
        rts_type = rschema[right_ts].dataType
        right_ts = F.col(right_ts)
    else:
        rts_type = (
            right.select(right_ts.alias(rts)).schema[rts].dataType
        )
    payload_t = StructType(
        [StructField(c, rschema[c].dataType, True) for c in right_cols]
        + [StructField(rts, rts_type, True)]
    )
    lschema = left.schema
    l_side = left.select(
        *lcols,
        left_ts.alias(_TS),
        F.lit(0).alias(_SIDE),
        F.lit(None).cast(payload_t).alias(_PAYLOAD),
    )
    r_side = right.select(
        *[
            F.col(c) if c in on
            else F.lit(None).cast(lschema[c].dataType).alias(c)
            for c in lcols
        ],
        right_ts.alias(_TS),
        F.lit(1).alias(_SIDE),
        F.struct(*right_cols, right_ts.alias(rts)).alias(_PAYLOAD),
    )

    unioned = l_side.unionByName(r_side)
    w = (
        Window.partitionBy(*on)
        .orderBy(F.asc(_TS), F.asc(_SIDE), *right_tie_break)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    matched = unioned.withColumn(
        _PAYLOAD, F.first(_PAYLOAD, ignorenulls=True).over(w)
    )
    in_tol = (
        F.lit(True)
        if tolerance is None
        else F.col(f"{_PAYLOAD}.{rts}") <= F.col(_TS) + tolerance
    )
    gated = F.when(in_tol, F.col(_PAYLOAD))
    return (
        matched.where(F.col(_SIDE) == 0)
        .withColumn(_PAYLOAD, gated)
        .select(*lcols, *[F.col(f"{_PAYLOAD}.{c}").alias(c) for c in right_cols])
    )
