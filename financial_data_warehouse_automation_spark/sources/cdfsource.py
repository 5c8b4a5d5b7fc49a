"""Change-data-feed STREAMING source over the snapshot store: a Spark
4 Python ``DataSourceStreamReader`` whose offsets ARE snapshot
versions — Delta's ``readChangeFeed`` / Iceberg's incremental scan as
a custom source (r12 verdict task 3: make the batch CDF of
``orders_snapshot_changes`` a subscription).

Contract:

* ``initialOffset`` = ``{"version": startversion}`` (default 1: the
  base snapshot is history, not change rows — Delta's
  ``startingVersion`` semantics).
* ``latestOffset`` = the table's highest published manifest version;
  a micro-batch covers every commit between the checkpointed offset
  and head, and a consumer that keeps the stream running sees each
  new commit as it publishes (the subscription).
* ``partitions(start, end)`` — planned DRIVER-SIDE from metadata
  only: for each version step (v-1, v] in the range, diff the two
  manifests (KB-scale JSON) and emit ONE InputPartition per CHANGED
  bucket. Cost of planning is O(buckets) per commit; unchanged
  buckets never appear in the plan, so the feed costs its churn,
  never the table.
* ``read(partition)`` — runs ON EXECUTORS: reads the one bucket's
  pre- and post-image directories (pyarrow), diffs them by key, and
  emits typed rows ``(commit_version, change_type, key, value)`` —
  ``insert`` / ``delete`` / ``update_preimage`` / ``update_postimage``.
  Correct because the store's buckets partition the KEY SPACE: a row
  never migrates buckets across a COW commit, so each bucket's diff
  is complete and local — the diff of a 100 TB table distributes as
  one task per changed bucket with zero shuffle.
* Replays are deterministic: the same (start, end) range plans the
  same partitions over the same immutable directories, so a restarted
  query re-reading a committed range reproduces it byte-for-byte, and
  a checkpoint at head re-plans nothing (no-op) — pinned by the
  registered query's second run.

The module is deliberately self-contained (stdlib + pyarrow, no
package imports): Spark runs stream-reader planning in a separate
Python worker process, and executors only ever see the pickled
partition values.

Reference analogy: the reference's monthly re-pull re-reads EVERY
spreadsheet to find what changed (build_warehouse.py:159-169 replays
the whole drop); this source hands a downstream consumer exactly the
rows a commit changed, which is what makes incremental MV maintenance
(orders_snapshot_incremental_mv) a subscription instead of a diff job.
"""

from __future__ import annotations

import json
import os
import re

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
)

_MANIFEST_RE = re.compile(r"manifest-v(\d+)\.json$")


def _latest_version(table_dir: str) -> int:
    best = 0
    for name in os.listdir(table_dir):
        m = _MANIFEST_RE.fullmatch(name)
        if m:
            best = max(best, int(m.group(1)))
    return best


def _buckets(table_dir: str, version: int) -> dict[str, str]:
    with open(os.path.join(table_dir, f"manifest-v{version}.json")) as f:
        return {
            k: v for k, v in json.load(f).items() if not k.startswith("_")
        }


class _BucketDiff(InputPartition):
    def __init__(self, version: int, pre_dir: str | None,
                 post_dir: str | None, key_col: str, val_col: str):
        self.version = version
        self.pre_dir = pre_dir
        self.post_dir = post_dir
        self.key_col = key_col
        self.val_col = val_col


class SnapshotCDFStreamReader(DataSourceStreamReader):
    def __init__(self, options):
        self.table_dir = options.get("path")
        if not self.table_dir:
            raise ValueError("snapshot_cdf requires a 'path' option")
        self.key_col = options.get("keycol", "key")
        self.val_col = options.get("valcol", "value")
        self.start_version = int(options.get("startversion", 1))

    def initialOffset(self) -> dict:
        return {"version": self.start_version}

    def latestOffset(self) -> dict:
        return {"version": max(_latest_version(self.table_dir),
                               self.start_version)}

    def partitions(self, start: dict, end: dict):
        out = []
        for v in range(start["version"] + 1, end["version"] + 1):
            # startversion=0 bootstraps: the v0 -> v1 step has no pre
            # image, so the whole base snapshot arrives as inserts — a
            # consumer can build a replica from nothing but the feed
            pre = _buckets(self.table_dir, v - 1) if v > 1 else {}
            post = _buckets(self.table_dir, v)
            for b in sorted(set(pre) | set(post)):
                if pre.get(b) != post.get(b):  # manifest diff = churn
                    out.append(_BucketDiff(
                        v, pre.get(b), post.get(b),
                        self.key_col, self.val_col,
                    ))
        return out

    def read(self, partition: _BucketDiff):
        def load(d: str | None) -> dict:
            if d is None:
                return {}
            import pyarrow.parquet as pq

            kv: dict = {}
            for name in sorted(os.listdir(d)):
                if not name.endswith(".parquet"):
                    continue
                t = pq.read_table(
                    os.path.join(d, name),
                    columns=[partition.key_col, partition.val_col],
                )
                for k, v in zip(
                    t.column(partition.key_col).to_pylist(),
                    t.column(partition.val_col).to_pylist(),
                ):
                    kv[k] = v
            return kv

        def changed(a, b) -> bool:
            # NaN-safe inequality: a NaN-valued row that did not
            # change must not emit a spurious update pair (NaN != NaN
            # is True under IEEE compare)
            if a != a and b != b:
                return False
            return a != b

        pre, post = load(partition.pre_dir), load(partition.post_dir)
        for k in sorted(set(pre) | set(post)):
            if k not in post:
                yield (partition.version, "delete", k, pre[k])
            elif k not in pre:
                yield (partition.version, "insert", k, post[k])
            elif changed(pre[k], post[k]):
                yield (partition.version, "update_preimage", k, pre[k])
                yield (partition.version, "update_postimage", k, post[k])

    def commit(self, end: dict) -> None:
        pass  # offsets are durable table versions; nothing to ack

    def stop(self) -> None:
        pass


class SnapshotCDFDataSource(DataSource):
    """``spark.readStream.format("snapshot_cdf").option("path", table)
    .option("keycol", ...).option("valcol", ...).load()`` after
    ``spark.dataSource.register(SnapshotCDFDataSource)``."""

    @classmethod
    def name(cls) -> str:
        return "snapshot_cdf"

    def schema(self) -> str:
        return ("commit_version int, change_type string, "
                "key bigint, value double")

    def streamReader(self, schema) -> SnapshotCDFStreamReader:
        return SnapshotCDFStreamReader(self.options)
