"""financial_data_warehouse_automation_spark — a PySpark-native analytics engine.

A from-scratch, Spark-first re-expression of the capabilities of the
reference financial-warehouse ETL pipeline (see SURVEY.md), generalized
into a reusable library of composable DataFrame operators, plus the
large-scale training-data-pipeline operators (dedup, similarity search,
text analysis, multimodal columns) required for 100 TB-scale workloads.

Layout:
    session      — SparkSession builder tuned for the local[CPUS] harness
    tables       — parquet table loaders for the driver test tables
    functions/   — scalar column-expression library (no UDFs on hot paths)
    operators/   — composable relational / ingest / upsert / text / dedup /
                   similarity / multimodal operators
    plans/       — plan-inspection helpers (explain audits)
    streaming/   — Structured Streaming wrappers over the batch operators
"""

__version__ = "0.1.0"
