"""Loaders for the driver-generated parquet tables (TESTDATA.md).

Tables: region nation customer supplier part orders lineitem events
documents embeddings — one parquet file per table under
``/root/testdata/sf{sf}/``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)

# Dimensions small enough to broadcast at ANY scale (region/nation are
# bounded-cardinality). customer/part/supplier grow with SF — multi-GB
# at 100 TB — so they get NO forced hint; AQE's sort-merge→broadcast
# switch handles them when they happen to be small.
SMALL_DIMS = ("region", "nation")


# Memoized analyzed relations. ``spark.read.parquet`` does file listing
# + footer schema inference eagerly in the JVM (~70-125 ms per call on
# this harness); a basket of queries re-loading the same immutable
# tables pays it dozens of times. On a real cluster these tables live
# in a catalog/metastore and the analyzed relation is resolved once —
# this cache is the local-mode equivalent. Keyed by applicationId so a
# restarted session (tests stop/start Spark) never sees a stale plan,
# and other sessions' entries are evicted on insert so stopped
# sessions aren't pinned for process lifetime; the testdata files
# themselves are read-only, so the listing can't go stale within a
# session.
_RELATION_CACHE: dict[tuple[str, str, str], DataFrame] = {}
# Keyed by (applicationId, path): the computed split count depends on
# session confs (openCostInBytes / maxPartitionBytes) and
# defaultParallelism, so a later session with different settings must
# not reuse a stale fan-out decision (perf-only, never correctness —
# advisor finding). Conf changes WITHIN a session are not tracked:
# reading confs per call would put py4j round trips on every
# load_table, and the repo never varies them mid-session.
_SPLIT_CACHE: dict[tuple[str, str], int] = {}


def _scan_parallelism(spark: SparkSession, path: str) -> int:
    """Number of tasks a parquet scan of ``path`` will actually fan out
    to — the MIN of two independent limits Spark applies:

    1. Row groups: parquet splits only at row-group boundaries, so a
       single-row-group file (exactly what the harness generator
       writes) is one task no matter how many cores exist.
    2. Split planning: ``maxSplitBytes = min(maxPartitionBytes,
       max(openCostInBytes, totalSize / defaultParallelism))`` — the
       4 MB openCost floor means a 20 MB file plans ~5 splits even
       with 32 cores and 16 row groups, so counting row groups alone
       over-reports the parallelism (review finding, round 6).

    Footer metadata + session confs answer both cheaply on the driver;
    falls back to 1 split when pyarrow can't read the footer
    (conservative: may fan out when it didn't strictly need to)."""
    app = spark.sparkContext.applicationId
    key = (app, path)
    n = _SPLIT_CACHE.get(key)
    if n is None:
        for k in [k for k in _SPLIT_CACHE if k[0] != app]:
            del _SPLIT_CACHE[k]
        try:
            import os

            import pyarrow.parquet as pq

            row_groups = max(1, pq.ParquetFile(path).num_row_groups)
            size = os.path.getsize(path)
            open_cost = int(spark.conf.get(
                "spark.sql.files.openCostInBytes", "4194304"))
            max_part = int(spark.conf.get(
                "spark.sql.files.maxPartitionBytes", "134217728"))
            par = spark.sparkContext.defaultParallelism
            max_split = min(max_part, max(open_cost, size // max(par, 1)))
            n_splits = max(1, -(-size // max(max_split, 1)))
            n = min(row_groups, n_splits)
        except Exception:
            n = 1
        _SPLIT_CACHE[key] = n
    return n


def load_table(
    spark: SparkSession,
    sf_dir: str,
    name: str,
    spread_by: tuple[str, ...] | None = None,
) -> DataFrame:
    """Load a testdata table; the analyzed relation is memoized.

    ``spread_by``: columns to hash-repartition on — APPLIED ONLY when
    the underlying parquet cannot split to the session's parallelism
    (see ``_scan_parallelism``). On a real cluster the table arrives in
    thousands of row groups and this is a plan no-op (no exchange is
    added), so CPU-heavy projections above the scan (shingling,
    decimal arithmetic, decode) keep their shuffle-free shape at
    100 TB; on the single-row-group harness files it spreads that work
    across cores instead of leaving the whole scan stage on one
    thread. Hash (not round-robin) partitioning so row placement is
    content-addressed — deterministic at any partition count, which
    the partition-invariance suite relies on."""
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    app = spark.sparkContext.applicationId
    key = (app, sf_dir, name)
    df = _RELATION_CACHE.get(key)
    if df is None:
        for k in [k for k in _RELATION_CACHE if k[0] != app]:
            del _RELATION_CACHE[k]
        if name == "events":
            df = _load_events(spark, sf_dir)
        else:
            df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        _RELATION_CACHE[key] = df
    if spread_by:
        target = spark.sparkContext.defaultParallelism
        if _scan_parallelism(spark, f"{sf_dir}/{name}.parquet") < target:
            return df.repartition(target, *spread_by)
    return df


def _load_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Load events with ``ts`` normalized to micros-since-epoch-UTC
    TimestampType regardless of how the generator wrote it.

    The driver's generator has produced both TIMESTAMP(NANOS) (which the
    Spark vectorized reader rejects — read raw int64 and floor-divide to
    micros, matching DuckDB's nanos→micros narrowing) and TIMESTAMP(MICROS,
    isAdjustedToUTC=false) (which Spark ≥3.4 infers as TIMESTAMP_NTZ —
    disable the inference so the stored micros load as a plain timestamp,
    the same treat-naive-as-UTC reading DuckDB's ``epoch_us`` uses).
    """
    from pyspark.sql import functions as F

    import contextlib

    @contextlib.contextmanager
    def scoped_conf(key: str, value: str):
        # The reader consults these confs at analysis time, so they must
        # be session-level — but only for THIS read: restore the prior
        # value so an unrelated NTZ/nanos parquet source in the same
        # session keeps its default reading.
        try:
            prior = spark.conf.get(key)
        except Exception:
            prior = None
        spark.conf.set(key, value)
        try:
            yield
        finally:
            if prior is None:
                spark.conf.unset(key)
            else:
                spark.conf.set(key, prior)

    path = f"{sf_dir}/events.parquet"
    try:
        import pyarrow.parquet as pq

        ts_type = str(pq.read_schema(path).field("ts").type)
    except Exception:
        ts_type = "timestamp[us]"
    if ts_type in ("int64", "timestamp[ns]"):
        with scoped_conf("spark.sql.legacy.parquet.nanosAsLong", "true"):
            df = spark.read.parquet(path)
            if dict(df.dtypes).get("ts") == "bigint":
                df = df.withColumn(
                    "ts", F.timestamp_micros(F.expr("ts div 1000"))
                )
        return df
    with scoped_conf("spark.sql.parquet.inferTimestampNTZ.enabled", "false"):
        df = spark.read.parquet(path)
        if dict(df.dtypes).get("ts") == "timestamp_ntz":
            # Inference config didn't take (already-analyzed reader);
            # reinterpret the naive wall-clock as UTC explicitly so epoch
            # math matches DuckDB.
            df = df.withColumn("ts", F.to_utc_timestamp("ts", "UTC"))
    return df


def register_views(spark: SparkSession, sf_dir: str, names=TABLE_NAMES) -> None:
    """Register each table as a temp view so operators can use spark.sql."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
