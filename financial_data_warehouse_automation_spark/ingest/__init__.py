"""Bronze ingest layer: reference-shaped statement parsing.

``fixtures``    — deterministic FIXTURES.md §A tables, renderable both
                  as Spark DataFrames and as SQL VALUES (so DuckDB
                  oracles replay the identical input).
``excel``       — the S1 workbook adapter (openpyxl-gated; the harness
                  container ships no Excel libs, so parsing operators
                  are exercised through the fixtures instead).
"""
