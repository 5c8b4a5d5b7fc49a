"""Custom Python DataSource WRITER (Spark 4 ``pyspark.sql.datasource``
API) — the sink-side twin of sources/linegen.py's reader.

The reference's sink side is "write the warehouse sheet back"
(python_version/build_warehouse.py:203-210, Code.gs:317-320); this
engine's parquet sinks (operators/sinks.py) cover that, but §2's
source/sink surface also wants the PLUGGABLE case: pushing results to
a system Spark has no connector for (a REST endpoint, a queue, a
bespoke file format). Spark 4's ``DataSourceWriter`` is the sanctioned
extension point, and this module demonstrates its full two-phase
commit protocol:

- ``write(iterator)`` runs ONCE PER PARTITION on executors, streams
  the partition's rows to a temp file (``_tmp-<uuid>.jsonl``) and
  returns a ``WriterCommitMessage`` carrying the temp name + row
  count — no data, messages must stay small and picklable;
- ``commit(messages)`` runs on the DRIVER only after every task
  succeeded: it renames each temp to its final ``part-NNNNN`` name and
  writes a ``_SUCCESS`` manifest with per-file row counts (readers of
  the sink treat a missing manifest as an incomplete job);
- ``abort(messages)`` deletes the temps, so a failed job leaves no
  partial output visible.

That temp-then-rename-on-commit shape is exactly the Hadoop
FileOutputCommitter contract; in local mode executors and driver share
/tmp, and at cluster scale the path points at shared storage where
rename-on-commit has the same semantics. The driver-side commit uses
``os.rename``/``os.listdir`` directly, which assumes a POSIX-rename
filesystem visible to the driver; an object-store egress would swap
these few calls for the Hadoop FileSystem API the engine already uses
elsewhere (see ``_rm_warehouse_dir`` in queries/relational.py — same
``jvm.org.apache.hadoop.fs.FileSystem.get(...)`` pattern works for
rename/listStatus/create on the driver, where the py4j gateway is
available; executor-side ``write()`` keeps plain file I/O because
Python workers have no JVM gateway, which is why production object
stores pair this protocol with a multipart-upload transport instead
of rename). Rows are serialized as newline-delimited JSON via the
stdlib — deterministic for the int/string columns the demo writes (a
production sink would map the full type surface; the protocol, not
the format, is what this demonstrates).
"""

from __future__ import annotations

import json
import os
import uuid
from dataclasses import dataclass

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    DataSourceWriter,
    WriterCommitMessage,
)


@dataclass
class _SinkCommit(WriterCommitMessage):
    tmp_name: str
    n_rows: int


class RowSinkWriter(DataSourceWriter):
    def __init__(self, options, schema, overwrite: bool):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("rowsink requires a 'path' option")
        self.cols = [f.name for f in schema.fields]
        self.overwrite = overwrite

    def write(self, iterator):
        tmp = f"_tmp-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, tmp), "w") as f:
            for row in iterator:
                f.write(json.dumps(dict(zip(self.cols, row)), sort_keys=True))
                f.write("\n")
                n += 1
        return _SinkCommit(tmp_name=tmp, n_rows=n)

    def commit(self, messages) -> None:
        manifest = {}
        if self.overwrite:
            for name in os.listdir(self.path):
                if name.startswith("part-") or name == "_SUCCESS":
                    os.remove(os.path.join(self.path, name))
        else:
            # append mode: carry the prior jobs' file map forward so the
            # rewritten _SUCCESS still reconciles with the directory
            # (r10 advisor: dropping it silently orphaned earlier parts).
            # Only a MISSING _SUCCESS means "first append into this dir";
            # a corrupt/unreadable one must raise — swallowing it would
            # silently restart the manifest and orphan every earlier part,
            # the same reconciliation failure behind a different door
            # (r11 advisor).
            try:
                with open(os.path.join(self.path, "_SUCCESS")) as f:
                    manifest = dict(json.load(f).get("files", {}))
            except FileNotFoundError:
                manifest = {}
        job = uuid.uuid4().hex[:8]
        for i, m in enumerate(messages):
            if m is None:  # a task with no data still commits the job
                continue
            final = f"part-{i:05d}-{job}.jsonl"
            os.rename(
                os.path.join(self.path, m.tmp_name),
                os.path.join(self.path, final),
            )
            manifest[final] = m.n_rows
        with open(os.path.join(self.path, "_SUCCESS"), "w") as f:
            json.dump({"files": manifest, "total": sum(manifest.values())}, f)

    def abort(self, messages) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.tmp_name))
                except OSError:
                    pass


class RowSinkDataSource(DataSource):
    """Register with ``spark.dataSource.register(RowSinkDataSource)``,
    then ``df.write.format("rowsink").option("path", d).mode(...)
    .save()``."""

    @classmethod
    def name(cls) -> str:
        return "rowsink"

    def _prepared_path(self) -> str:
        # validate BEFORE makedirs: a missing 'path' must surface as the
        # rowsink ValueError, not makedirs('') -> FileNotFoundError('').
        path = self.options.get("path")
        if not path:
            raise ValueError("rowsink requires a 'path' option")
        os.makedirs(path, exist_ok=True)
        return path

    def writer(self, schema, overwrite: bool) -> RowSinkWriter:
        self._prepared_path()
        return RowSinkWriter(self.options, schema, overwrite)

    def streamWriter(self, schema, overwrite: bool) -> "RowSinkStreamWriter":
        self._prepared_path()
        return RowSinkStreamWriter(self.options, schema)


class RowSinkStreamWriter(DataSourceStreamWriter):
    """Streaming twin of :class:`RowSinkWriter` — the per-MICRO-BATCH
    commit protocol (``commit(messages, batchId)``): each epoch's task
    temps rename to ``part-b<batchId>-NNNNN`` only after every task in
    that epoch succeeded, and the ``_SUCCESS`` manifest is REWRITTEN
    cumulatively so a reader always sees the set of fully-committed
    batches (an aborted epoch leaves no visible files — its temps are
    deleted, the manifest never mentions it). Exactly-once rests on
    the engine replaying a failed batchId: a replayed epoch re-renames
    over its own deterministic names, and the manifest keyed by
    batchId overwrites rather than double-counts."""

    def __init__(self, options, schema):
        self.path = options.get("path")
        if not self.path:
            raise ValueError("rowsink requires a 'path' option")
        self.cols = [f.name for f in schema.fields]

    def write(self, iterator):
        tmp = f"_tmp-{uuid.uuid4().hex}.jsonl"
        n = 0
        with open(os.path.join(self.path, tmp), "w") as f:
            for row in iterator:
                f.write(json.dumps(dict(zip(self.cols, row)), sort_keys=True))
                f.write("\n")
                n += 1
        return _SinkCommit(tmp_name=tmp, n_rows=n)

    def _manifest_path(self) -> str:
        return os.path.join(self.path, "_SUCCESS")

    def commit(self, messages, batchId: int) -> None:
        # a replayed epoch overwrites its own files: deterministic names
        for name in os.listdir(self.path):
            if name.startswith(f"part-b{batchId:05d}-"):
                os.remove(os.path.join(self.path, name))
        files = {}
        for i, m in enumerate(messages):
            if m is None:
                continue
            final = f"part-b{batchId:05d}-{i:05d}.jsonl"
            os.rename(
                os.path.join(self.path, m.tmp_name),
                os.path.join(self.path, final),
            )
            files[final] = m.n_rows
        try:
            with open(self._manifest_path()) as f:
                manifest = json.load(f)
        except (OSError, ValueError):
            manifest = {"batches": {}}
        manifest.setdefault("batches", {})[str(batchId)] = files
        manifest["total"] = sum(
            n for b in manifest["batches"].values() for n in b.values()
        )
        with open(self._manifest_path(), "w") as f:
            json.dump(manifest, f)

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None:
                try:
                    os.remove(os.path.join(self.path, m.tmp_name))
                except OSError:
                    pass
