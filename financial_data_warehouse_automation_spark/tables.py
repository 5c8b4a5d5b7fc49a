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


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    if name not in TABLE_NAMES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLE_NAMES}")
    if name == "events":
        return _load_events(spark, sf_dir)
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


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
