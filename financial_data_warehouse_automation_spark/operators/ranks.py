"""Distributed exact global ranking — the two-pass bucket-offset
pattern, factored out of ``part_abc_pareto`` so every query needing a
total order over a large frame shares one scale-safe implementation.

An unpartitioned ``ROW_NUMBER() OVER (ORDER BY ...)`` funnels the whole
frame through a single task — the canonical 100 TB killer. The two-pass
plan computes the SAME exact rank with no global sort:

pass 1: range-bucket rows by the numeric sort key into ``n_buckets``
        integer bands between the key's min and max (one tiny
        aggregate), count rows per bucket, and turn the counts into
        cumulative offsets with a window over <= ``n_buckets`` rows;
pass 2: ``row_number`` WITHIN each bucket (window partitioned by the
        bucket id) plus the broadcast offset of all earlier buckets.

Because the buckets are VALUE ranges, every row in bucket b sorts
strictly after all rows of earlier buckets, so offset + in-bucket rank
is exactly the global rank. Ties need a deterministic tiebreak column
(same requirement the single-window formulation has). The widest
window partition is one bucket (~N/n_buckets rows in the uniform case;
a skewed key still caps the damage at its bucket's population instead
of the whole frame).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from financial_data_warehouse_automation_spark.lineage import cut


def global_row_number(
    df: DataFrame,
    value_col: str,
    tiebreak_cols: tuple[str, ...],
    out_col: str = "rnk",
    *,
    descending: bool = False,
    n_buckets: int = 32,
) -> DataFrame:
    """Add ``out_col`` = exact global ROW_NUMBER of each row under
    ``ORDER BY value_col [DESC], *tiebreak_cols`` without a global sort.

    ``value_col`` must be integral and NON-NULL (a NULL would form a
    null bucket that shifts every real bucket's offset and then drops
    out of the bucket equi-join — silent corruption; the operator
    raises per-row instead). The bucket arithmetic is exact int64:
    keys must lie in ±2^62 and span at most 2^63/n_buckets values
    (~2.8e17 at 32 buckets — any cents-scale key qualifies); a wider
    range raises loudly rather than wrapping in non-ANSI mode and
    silently breaking bucket monotonicity. ``tiebreak_cols`` sort
    ascending and must make the full ordering total, or ranks are
    nondeterministic.

    The input is lazily localCheckpoint'ed first: this operator
    consumes ``df`` three times (bounds aggregate, bucket counts, the
    ranked join), Spark re-evaluates shared subplans, and call sites
    CHAIN ranks (customer_rfm_segments ranks three keys, so an
    uncached input re-evaluates up to 3^3 times — measured 5.6s for a
    per-customer frame at sf1, ~1s cached). Lazy, not eager, so
    building the plan costs nothing; the first action materializes
    once. Caching the frame being ranked is the intended trade: it is
    read three times regardless, and the cache is the ranked frame
    itself, not its (usually much larger) upstream.
    """
    df = cut(df, eager=False)
    bkt, b_idx, off = f"__{out_col}_bkt", f"__{out_col}_bidx", f"__{out_col}_off"
    i64_max = (1 << 63) - 1
    # Both guards are load-bearing branches of columns the plan must
    # evaluate (not standalone assert columns Catalyst could prune):
    # NULL value -> per-row raise; out-of-range span -> raise on the
    # single bounds row. In the span check the conjuncts don't
    # short-circuit, but if __hi - __lo wraps, the ±2^62 conjuncts are
    # already false and the AND stays false, so the wrap is harmless.
    val = F.when(
        F.col(value_col).isNotNull(), F.col(value_col)
    ).otherwise(
        F.raise_error(
            F.lit(
                f"global_row_number: NULL in {value_col!r} — ranks over "
                "a nullable key are undefined; filter or coalesce first"
            )
        )
    )
    span_ok = F.col("__lo").isNull() | (  # NULL bounds = empty input
        (F.col("__lo") >= -(1 << 62))
        & (F.col("__hi") <= (1 << 62) - 1)
        & ((F.col("__hi") - F.col("__lo") + 1) <= i64_max // n_buckets)
    )
    bounds = df.agg(
        F.min(value_col).alias("__lo"), F.max(value_col).alias("__hi")
    ).select(
        F.when(span_ok, F.col("__lo"))
        .otherwise(
            F.raise_error(
                F.lit(
                    f"global_row_number: {value_col!r} range exceeds the "
                    f"exact-int64 bucket bound (keys must lie in ±2^62 "
                    f"and span <= 2^63/{n_buckets} values)"
                )
            )
        )
        .alias("__lo"),
        F.col("__hi"),
    )
    # bucket index ascending in SORT order: for descending ranks the
    # largest value lands in bucket 0. span+1 keeps the max in-range.
    span = F.col("__hi") - F.col("__lo") + 1
    pos = (F.col("__hi") - val) if descending else (val - F.col("__lo"))
    bucketed = df.crossJoin(F.broadcast(bounds)).withColumn(
        bkt, F.floor(pos * n_buckets / span).cast("int")
    )
    counts = bucketed.groupBy(F.col(bkt).alias(b_idx)).agg(
        F.count(F.lit(1)).alias("__n")
    )
    # cumulative count of all earlier buckets: window over <= n_buckets
    # rows, then broadcast back
    wb = Window.orderBy(b_idx).rowsBetween(Window.unboundedPreceding, -1)
    offsets = counts.select(
        b_idx, F.coalesce(F.sum("__n").over(wb), F.lit(0)).alias(off)
    )
    order: list[Column] = [
        F.desc(value_col) if descending else F.asc(value_col)
    ] + [F.asc(c) for c in tiebreak_cols]
    ww = Window.partitionBy(bkt).orderBy(*order)
    return (
        bucketed.join(F.broadcast(offsets), F.col(bkt) == F.col(b_idx))
        .withColumn(out_col, F.row_number().over(ww) + F.col(off))
        .drop(bkt, b_idx, off, "__lo", "__hi")
    )
