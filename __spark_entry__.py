"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

All queries live in ``financial_data_warehouse_automation_spark.registry.REGISTRY``; this
module is a thin adapter over ``registry.load_all()``.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (monthly_segment_totals) on sf0.001; rows > 0."""
    from financial_data_warehouse_automation_spark.registry import load_all

    spec = load_all()["monthly_segment_totals"]
    return spec.builder(spark, SMOKE_SF_DIR)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from financial_data_warehouse_automation_spark.registry import load_all

    return {name: spec.builder for name, spec in load_all().items()}


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for every oracle-checkable query.

    Queries without an oracle (approx sketches, LSH, stateful streaming)
    are omitted; the driver records a weaker rows-only check for those.
    """
    from financial_data_warehouse_automation_spark.registry import load_all

    return {
        name: spec.oracle
        for name, spec in load_all().items()
        if spec.oracle is not None
    }
