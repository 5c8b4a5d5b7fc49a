from financial_data_warehouse_automation_spark.functions.scalars import (  # noqa: F401
    clean_amount,
    currency_string,
    dept_from_sheet_name,
    gl_missing_flag,
    is_gl_code_strict,
    month_name,
    month_num_from_name,
    normalize_gl_code,
    normalize_header,
    period_from_filename,
    resolve_columns,
)
