"""Custom Python DataSource (Spark 4 ``pyspark.sql.datasource`` API):
a deterministic ledger-line generator with real partition planning.

The reference ingests from a fixed drop of spreadsheet files; a Spark
engine also wants *pluggable* sources — REST pagers, queue snapshots,
synthetic load generators — and Spark 4's Python DataSource API is the
sanctioned extension point (no JVM code). This source demonstrates the
full surface: options, schema, ``partitions()`` splitting the key
space, and a per-partition ``read()`` iterator that executors run in
parallel.

Determinism is the point: row ``i`` maps to
``(i, md5(str(i)), (i % 997) / 100)``, so the exact same relation is
reproducible in DuckDB via ``generate_series`` + ``md5`` — the custom
source's output is oracle-checkable like every other query
(``source_linegen_agg``).

Scale: generation is embarrassingly parallel — ``partitions()`` returns
``numPartitions`` contiguous ranges and each executor materializes only
its slice (nothing is built on the driver). A real connector would put
its split planning (file ranges, shard ids, partition offsets) exactly
here.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)


class _Range(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class LineGenReader(DataSourceReader):
    def __init__(self, options):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("numpartitions", 4))
        self.lo = 0          # narrowed by pushFilters
        self.hi = self.n_rows

    def pushFilters(self, filters):
        """Native range pushdown (Spark 4.1 DataSource filter API): the
        generator's id column IS its key space, so comparison filters
        on ``i`` narrow the generated range itself — the planner then
        splits only [lo, hi) and executors never materialize filtered
        rows at all (the same move a database connector makes turning
        predicates into WHERE clauses, or a queue source into offset
        seeks). Unhandled filters are returned for Spark to evaluate;
        handled ones are fully consumed here. Pinned by
        tests/test_sources.py: a narrowed plan generates ZERO
        out-of-range rows, not filter-after-the-fact."""
        from pyspark.sql.datasource import (
            EqualTo,
            GreaterThan,
            GreaterThanOrEqual,
            LessThan,
            LessThanOrEqual,
        )

        remaining = []
        for f in filters:
            attr = tuple(getattr(f, "attribute", ()) or ())
            if attr == ("i",) and isinstance(getattr(f, "value", None), int):
                if isinstance(f, GreaterThanOrEqual):
                    self.lo = max(self.lo, f.value)
                    continue
                if isinstance(f, GreaterThan):
                    self.lo = max(self.lo, f.value + 1)
                    continue
                if isinstance(f, LessThan):
                    self.hi = min(self.hi, f.value)
                    continue
                if isinstance(f, LessThanOrEqual):
                    self.hi = min(self.hi, f.value + 1)
                    continue
                if isinstance(f, EqualTo):
                    self.lo = max(self.lo, f.value)
                    self.hi = min(self.hi, f.value + 1)
                    continue
            remaining.append(f)
        return remaining

    def partitions(self):
        lo, hi = self.lo, max(self.lo, self.hi)
        span = hi - lo
        if span == 0:
            return [_Range(0, 0)]
        step = -(-span // self.n_parts)  # ceil div
        return [
            _Range(s, min(s + step, hi)) for s in range(lo, hi, step)
        ]

    def read(self, partition: _Range):
        import hashlib

        for i in range(partition.start, partition.end):
            key = hashlib.md5(str(i).encode()).hexdigest()
            yield (i, key, (i % 997) / 100)


class LineGenDataSource(DataSource):
    """``spark.read.format("linegen").option("rows", N)`` after
    ``spark.dataSource.register(LineGenDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "linegen"

    def schema(self) -> str:
        return "i bigint, key string, amount double"

    def reader(self, schema) -> LineGenReader:
        return LineGenReader(self.options)

    def simpleStreamReader(self, schema) -> "LineGenStreamReader":
        return LineGenStreamReader(self.options)


class LineGenStreamReader(SimpleDataSourceStreamReader):
    """Streaming flavor of the generator: each micro-batch emits the
    next ``batchrows`` ids until ``maxrows``. Offsets are ``{"i": n}``
    dictionaries Spark checkpoints; ``readBetweenOffsets`` replays any
    committed range deterministically — the contract that makes the
    source exactly-once under failure/restart (a real connector would
    put its cursor/sequence-number logic exactly here)."""

    def __init__(self, options):
        self.batch_rows = int(options.get("batchrows", 100))
        self.max_rows = int(options.get("maxrows", 1000))

    def initialOffset(self) -> dict:
        return {"i": 0}

    @staticmethod
    def _rows(start: int, end: int):
        import hashlib

        for i in range(start, end):
            yield (i, hashlib.md5(str(i).encode()).hexdigest(), (i % 997) / 100)

    def read(self, start: dict):
        s = start["i"]
        e = min(s + self.batch_rows, self.max_rows)
        # a picklable ITERATOR: Spark's simple-reader prefetches the
        # batch on the driver and pickles it out to executors — a bare
        # generator can't pickle, a bare list isn't an iterator;
        # a list_iterator is both
        return iter(list(self._rows(s, e))), {"i": e}

    def readBetweenOffsets(self, start: dict, end: dict):
        return self._rows(start["i"], end["i"])


