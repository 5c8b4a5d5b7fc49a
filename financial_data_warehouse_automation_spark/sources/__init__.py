from financial_data_warehouse_automation_spark.sources.linegen import LineGenDataSource

__all__ = ["LineGenDataSource"]
