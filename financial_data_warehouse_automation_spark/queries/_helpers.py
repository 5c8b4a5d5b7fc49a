"""Shared column helpers for oracle-checkable queries.

See the determinism rules in ``registry.py``: money-like doubles are cast
to ``decimal(12,2)`` (rates to ``decimal(6,4)``) before any aggregation so
Spark's shuffle-order-dependent double addition can't diverge from the
DuckDB oracle; final aggregates are cast back to double.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def money(col: str | Column) -> Column:
    """Money-ish double → exact decimal(12,2) for order-independent sums."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(12,2)")


def rate(col: str | Column) -> Column:
    """Unit-interval rate (discount/tax) → decimal(6,4)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast("decimal(6,4)")


def dsum(col: Column) -> Column:
    """Exact decimal sum, emitted as double."""
    return F.sum(col).cast("double")


def davg(col: Column) -> Column:
    """Deterministic average: exact decimal sum / count, divided in double.

    (Spark's and DuckDB's AVG over decimals pick different result scales;
    a double division of exact operands is bit-identical in both.)
    """
    return F.sum(col).cast("double") / F.count(F.lit(1))


# SQL-side equivalents (DuckDB), kept textually adjacent so the two
# formulations stay in sync.
SQL_MONEY = "CAST({c} AS DECIMAL(12,2))"
SQL_RATE = "CAST({c} AS DECIMAL(6,4))"


def sql_money(c: str) -> str:
    return SQL_MONEY.format(c=c)


def sql_rate(c: str) -> str:
    return SQL_RATE.format(c=c)


def assert_multiset_equal(a, b, what: str = "frames") -> None:
    """Assert two DataFrames are multiset-equal (same rows, same
    multiplicities) in ONE Spark action.

    The protocol demos' original idiom —
    ``assert a.count() == b.count()`` plus one or two
    ``a.exceptAll(b).count() == 0`` — costs two to four actions, each
    re-evaluating its input's whole lineage (a snapshot read, a feed
    fold). The signed-count form computes the identical predicate in a
    single pass: tag every ``a`` row +1 and every ``b`` row −1, group
    by the full row, and any group whose weights don't cancel is a
    difference. One union, one aggregation, one action; map-side
    partial aggregation collapses duplicates before the only shuffle,
    and NULL grouping keys compare equal (as exceptAll treats them) —
    a null-safe full-outer-join formulation would need per-column
    ``<=>`` plumbing to get that right (guide §2.4: fewer passes; §5:
    the driver orchestrates one job instead of three).

    ``b`` is projected to ``a``'s columns, so column ORDER may differ;
    types must match as they must for exceptAll. Column SETS must match
    exactly (r16, advisor): the projection would silently drop an extra
    ``b`` column before comparing, so a replica that gained a column
    would pass the gate on the projected subset — exceptAll failed
    loudly on that drift, and so does this.
    """
    cols = a.columns
    assert set(cols) == set(b.columns), (
        f"{what}: column sets differ — a-only={sorted(set(cols) - set(b.columns))} "
        f"b-only={sorted(set(b.columns) - set(cols))}"
    )
    tagged = a.select(*cols).withColumn("_w", F.lit(1)).unionByName(
        b.select(*cols).withColumn("_w", F.lit(-1))
    )
    n_diff = (
        tagged.groupBy(*cols)
        .agg(F.sum("_w").alias("_d"))
        .where(F.col("_d") != 0)
        .count()
    )
    assert n_diff == 0, f"{what}: {n_diff} row-groups differ in multiplicity"


def _bucketed_dirs_via_one_write(
    df, bucket_col: str, n_buckets: int, root: str, name_fmt: str,
) -> dict[str, str]:
    """Write ``df`` into ``n_buckets`` per-bucket TOP-LEVEL directories
    (``root/<name_fmt.format(b=i)>``) with ONE Spark job.

    The snapshot demos' original per-bucket loop
    (``df.where(bucket == b).write...`` × n) re-scanned the source
    once per bucket — n jobs for one job's work (guide §2.4). A single
    ``partitionBy`` write produces the same per-bucket file sets
    (``partitionBy`` drops the bucket column from the data files,
    exactly as the loop's ``.drop()`` did); the partition dirs then
    RENAME into the flat per-bucket layout the demos' manifest + GC
    asserts rely on (GC granularity is top-level entries — a nested
    ``pb=*/`` layout would change what expire_snapshots counts).
    Renames are same-filesystem metadata ops. Returns {bucket:int ->
    dir}. A bucket with zero rows raises: the demos' later per-bucket
    COW rewrites read these dirs unconditionally, and the loop form
    produced an unreadable _SUCCESS-only dir in that case anyway —
    loud beats silent."""
    import os
    import shutil

    stage = os.path.join(root, "_stage_" + name_fmt.format(b="x"))
    df.write.partitionBy(bucket_col).mode("overwrite").parquet(stage)
    out: dict[int, str] = {}
    for b in range(n_buckets):
        src = os.path.join(stage, f"{bucket_col}={b}")
        if not os.path.isdir(src):
            raise AssertionError(
                f"bucket {b} of {n_buckets} got zero rows — the demo's "
                "bucket math assumes a populated key range"
            )
        dst = os.path.join(root, name_fmt.format(b=b))
        os.rename(src, dst)
        out[b] = dst
    shutil.rmtree(stage)  # _SUCCESS marker and the emptied stage root
    return out


def scratch_dir(prefix: str) -> str:
    """Per-run /tmp scratch dir, removed at process exit — for queries
    that demonstrate a WRITE-side capability (compaction, schema
    evolution, custom sinks) and so must produce fresh files each run:
    content-addressed reuse would let repeat timings skip the work the
    query exists to measure (same reasoning as
    streaming_demo._dedup_state_workdir)."""
    import atexit
    import shutil
    import tempfile

    work = tempfile.mkdtemp(prefix=prefix)
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    return work
