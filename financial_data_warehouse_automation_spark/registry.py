"""Query registry: the single source of truth for the driver contract.

Every operator family from SURVEY.md §2 registers one or more named
queries here. ``__spark_entry__.py`` re-exports the registry as
``queries()`` / ``oracle_sql()``; ``bench.py`` runs the subset marked
``headline``. Keeping registration declarative means the coverage
checklist (SURVEY §2) maps 1:1 onto ``REGISTRY`` keys.

Determinism rules for oracle hash-matching (both engines must produce
bit-identical values):

* Never SUM/AVG raw doubles — shuffle order makes double addition
  non-deterministic. Cast to a small-scale decimal first (exact,
  order-independent), then cast the final aggregate back to double.
* Keep decimal scale low (≤4 for money, ≤10 for unit-scale products):
  the two engines take different double→decimal conversion paths
  (shortest-repr vs exact-binary), which can disagree only within
  ~1 ulp of a rounding midpoint — vanishingly rare at low scale.
* Emit doubles / longs / strings, not decimals or timestamps, in final
  schemas; render timestamps with an explicit format string.
* Alias every computed column identically in Spark and SQL.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    builder: QueryFn
    oracle: str | None = None     # DuckDB SQL over the pre-registered views
    headline: bool = False        # included in bench.py
    tags: tuple[str, ...] = field(default_factory=tuple)
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def query(
    name: str,
    oracle: str | None = None,
    headline: bool = False,
    tags: tuple[str, ...] = (),
) -> Callable[[QueryFn], QueryFn]:
    """Register ``fn(spark, sf_dir) -> DataFrame`` under ``name``."""

    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        REGISTRY[name] = QuerySpec(
            name=name, builder=fn, oracle=oracle, headline=headline,
            tags=tags, doc=(fn.__doc__ or "").strip(),
        )
        return fn

    return deco


def load_all() -> dict[str, QuerySpec]:
    """Import every query module so registration side effects run."""
    from financial_data_warehouse_automation_spark import queries as _q  # noqa: F401

    return REGISTRY
