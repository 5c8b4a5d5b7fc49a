"""Reusable DataFrame operators — the engine's library surface.

Each module generalizes one band of the reference's dataflow
(SURVEY.md §2) into composable functions over arbitrary DataFrames;
``queries/`` instantiates them over the driver tables for the oracle
harness.
"""
