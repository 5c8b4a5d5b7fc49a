"""Table profiling (ANALYZE-style data-quality summary): one output row
per column with null/distinct/min/max stats — the engine-side version
of the reference's manual QA eyeballing, and the statistics feed for
capacity planning at scale (one pass, all columns aggregated together).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile_table(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """One aggregation pass computing per-column stats, then unpivoted
    to (column, n_nulls, n_distinct, min_str, max_str) rows. min/max are
    rendered as strings so heterogeneous column types share one schema.
    """
    cols = columns or df.columns
    aggs = []
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nn_{c}"),
            F.countDistinct(c).alias(f"__nd_{c}"),
            F.min(F.col(c).cast("string")).alias(f"__mn_{c}"),
            F.max(F.col(c).cast("string")).alias(f"__mx_{c}"),
        ]
    row = df.agg(*aggs)
    stacked = row.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col(f"__nn_{c}").cast("long").alias("n_nulls"),
                    F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
                    F.col(f"__mn_{c}").alias("min_str"),
                    F.col(f"__mx_{c}").alias("max_str"),
                )
                for c in cols
            ])
        ).alias("s")
    )
    return stacked.select("s.*")
