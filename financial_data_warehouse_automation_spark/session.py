"""SparkSession factory tuned for this harness and for scale-out.

Local harness: one JVM, ``local[$SPARK_GRAFT_CPUS]`` threads. The same
configs are the right defaults on a real cluster: AQE for runtime
re-planning (partition coalescing, skew-join splitting, join-strategy
switch), Arrow for any pandas exchange, UTC session time so parquet
timestamps compare deterministically against external oracles.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SF_DIR = "/root/testdata/sf0.1"


def cpu_count() -> int:
    return int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 8))


def sf_dir() -> str:
    return os.environ.get("SPARK_GRAFT_SF_DIR", DEFAULT_SF_DIR)


def get_spark(app_name: str = "financial_data_warehouse_automation_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    """Build (or reuse) the session.

    ``spark.sql.shuffle.partitions`` is sized to the executor-thread
    count: at 100 TB on a 1000-executor cluster this knob is instead
    left to AQE (``coalescePartitions``) with a high initial value; on
    local[N] a small fixed value avoids tiny-partition overhead.
    """
    n = cpu_count()
    builder = (
        SparkSession.builder.master(f"local[{n}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or n))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
        .config("spark.sql.python.filterPushdown.enabled", "true")
        # Spark 4's PySpark call-site capture (DataFrame debugging) adds
        # a conf-read RPC + origin set/clear RPCs + a Python stack walk
        # to EVERY DataFrame API call — pure driver-side overhead in the
        # hot build path (profiled: ~650 py4j round trips per basket
        # query build, a visible slice of them from this wrapper; builds
        # 0.10-0.25s -> 0.04-0.17s with it off). Cost grows with driver
        # RPC latency, so the win is LARGER on a real cluster (remote
        # driver<->gateway) than on local[N]. Trade-off: error messages
        # lose the Python call-site line; acceptable for a production
        # engine, and exceptions keep their full JVM context.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        # InferFiltersFromGenerate copies each explode's input expression
        # into a `size(e) > 0 AND e IS NOT NULL` filter that predicate
        # pushdown then sinks below the spread_by exchange — for this
        # engine's explodes the input is always a DERIVED array (split /
        # shingle / band / sequence), so the "filter" re-evaluates the
        # full array construction once per row in the narrowest stage of
        # the plan (the single-row-group scan) and prunes nothing: a
        # size() predicate on a computed array cannot reach parquet as a
        # PushedFilter at any scale. Measured at sf0.1:
        # doc_minhash_lsh_pairs 2.2-2.9s -> 1.7s (the shingle expression
        # had been evaluated twice, once serialized on the scan task);
        # every other text query flat-to-faster. Rule exclusion is
        # semantics-preserving by contract (only excludable optimizer
        # rules honor this conf).
        .config(
            "spark.sql.optimizer.excludedRules",
            "org.apache.spark.sql.catalyst.optimizer.InferFiltersFromGenerate",
        )
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
