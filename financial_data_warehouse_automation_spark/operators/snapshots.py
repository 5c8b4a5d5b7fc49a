"""Versioned-manifest snapshot store: the commit/expiry half of the
lakehouse MVCC primitive (queries/relational.py's
orders_snapshot_cow_read demonstrates the read/COW half inline).

A *table* here is a directory holding immutable data directories plus
``manifest-v<N>.json`` files, each mapping a bucket id to the data
directory that version reads. Snapshots are immutable; writers never
mutate data files — they write NEW directories and try to publish a
new manifest.

Commit protocol — optimistic concurrency via filesystem CAS: a writer
that read version B publishes version B+1 by creating
``manifest-v<B+1>.json`` with ``open(..., 'x')`` (O_CREAT|O_EXCL —
atomic create-if-absent on POSIX; object stores use if-none-match /
precondition puts, same contract). If another writer already published
B+1, the create fails and :class:`SnapshotConflict` tells the loser to
REBASE: re-read the now-latest manifest, re-apply its changes on top,
try again. This is exactly Delta's optimistic commit loop with the
log-entry rename swapped for the local-FS primitive (reference
analogy: the reference's single-writer Apps Script lock,
Code.gs:27-31, is the degenerate form — one global mutex instead of
retry-on-conflict).

Expiry — ``expire_snapshots`` drops old manifests and then deletes
data directories no REMAINING manifest references (unreferenced-file
GC). Time travel is exactly as durable as the retention window, and
storage cost is bounded by it; a COW-shared directory survives as long
as any retained manifest names it.

Scale posture: manifests are O(buckets) JSON — metadata, not data;
commit cost is one small file create regardless of table size; GC
compares two string sets. The known non-goal (documented, not hidden):
``open('x')`` needs a filesystem with atomic exclusive create — NFS
pre-v3 and some blob mounts don't have it; production swaps this one
call for the store's conditional-put, the protocol is unchanged.
"""

from __future__ import annotations

import json
import os
import re
import shutil
import time

_MANIFEST_RE = re.compile(r"manifest-v(\d+)\.json$")


class SnapshotConflict(Exception):
    """Another writer published the version this writer tried to
    create; re-read the latest manifest, rebase, retry."""


def manifest_path(table_dir: str, version: int) -> str:
    return os.path.join(table_dir, f"manifest-v{version}.json")


def latest_version(table_dir: str) -> int:
    """Highest published manifest version (0 = no snapshot yet)."""
    best = 0
    for name in os.listdir(table_dir):
        m = _MANIFEST_RE.fullmatch(name)
        if m:
            best = max(best, int(m.group(1)))
    return best


def read_manifest(table_dir: str, version: int | None = None) -> dict[str, str]:
    """Bucket-id -> data-dir mapping for ``version`` (default latest)."""
    if version is None:
        version = latest_version(table_dir)
        if version == 0:
            raise FileNotFoundError(f"no manifest in {table_dir}")
    with open(manifest_path(table_dir, version)) as f:
        return json.load(f)


def try_commit(
    table_dir: str, base_version: int, mapping: dict[str, str]
) -> int:
    """Publish ``mapping`` as version ``base_version + 1``.

    Atomic create-if-absent: raises :class:`SnapshotConflict` if that
    version already exists (a concurrent writer won the race — rebase
    and retry). Returns the committed version number."""
    version = base_version + 1
    path = manifest_path(table_dir, version)
    try:
        fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
    except FileExistsError:
        raise SnapshotConflict(
            f"version {version} already published in {table_dir}; "
            "re-read latest and rebase"
        ) from None
    with os.fdopen(fd, "w") as f:
        json.dump(mapping, f)
    return version


def expire_snapshots(
    table_dir: str, keep_from: int, min_age_s: float = 0.0
) -> tuple[int, int]:
    """Drop manifests with version < ``keep_from``, then delete data
    directories referenced by NO remaining manifest. Returns
    (manifests_removed, data_dirs_removed).

    Safety rails (r11 advisor):

    * ``keep_from`` is CLAMPED to the latest published version, so the
      newest manifest and everything it references always survive — a
      retention argument beyond head can never empty the table (Delta/
      Iceberg retention likewise always retains the current snapshot).
      A table with no manifest at all raises ``ValueError`` instead of
      GC-ing against an empty live set.
    * ``min_age_s``: data directories younger than this (by mtime) are
      exempt from GC even when unreferenced — a concurrent writer's
      STAGED-but-uncommitted directories look exactly like garbage to
      a reader of manifests, and deleting them loses that writer's
      work before its ``try_commit``. Delta/Iceberg vacuum uses the
      same age cutoff (default 7 days there); the default here is 0
      (single-writer maintenance window — the demos run with all
      writers quiesced), and any multi-writer deployment MUST pass a
      retention-scale age or otherwise fence GC from in-flight
      writers.
    """
    latest = latest_version(table_dir)
    if latest == 0:
        raise ValueError(
            f"no manifest in {table_dir}: refusing to GC an empty live set"
        )
    keep_from = min(keep_from, latest)
    removed_m = 0
    for name in list(os.listdir(table_dir)):
        m = _MANIFEST_RE.fullmatch(name)
        if m and int(m.group(1)) < keep_from:
            os.remove(os.path.join(table_dir, name))
            removed_m += 1
    live: set[str] = set()
    for name in os.listdir(table_dir):
        if _MANIFEST_RE.fullmatch(name):
            with open(os.path.join(table_dir, name)) as f:
                live.update(
                    os.path.normpath(p) for p in json.load(f).values()
                )

    def is_live(path: str) -> bool:
        # liveness is PREFIX-based, not identity-based: a manifest may
        # reference a subdirectory of a top-level entry (a partitioned
        # write's root holds pb=*/ partition dirs — r12: identity
        # matching rmtree'd such a root, deleting live data under it),
        # so a top-level entry survives if it IS a referenced path or
        # CONTAINS one. GC granularity stays top-level entries; a
        # partially-dead partitioned root is kept whole (conservative:
        # never delete live data to reclaim dead neighbors).
        p = os.path.normpath(path)
        return any(q == p or q.startswith(p + os.sep) for q in live)

    now = time.time()
    removed_d = 0
    for name in list(os.listdir(table_dir)):
        full = os.path.join(table_dir, name)
        if not os.path.isdir(full) or is_live(full):
            continue
        if min_age_s > 0 and now - os.path.getmtime(full) < min_age_s:
            continue  # possibly a concurrent writer's staged dir
        shutil.rmtree(full)
        removed_d += 1
    return removed_m, removed_d


def as_of_version(table_dir: str, ts: float) -> int:
    """Resolve a point in time to a snapshot version: the highest
    version whose manifest was published at or before ``ts`` (Delta's
    ``timestampAsOf`` / Iceberg's snapshot-log lookup). The commit
    instant IS the manifest file's mtime — the CAS create stamps it
    atomically with publication, so no separate timestamp log is
    needed; an object store would read the blob's creation time the
    same way. Raises ``ValueError`` when ``ts`` predates the first
    commit (there is no table to read at that instant — the honest
    answer, not an empty frame)."""
    best = 0
    for name in os.listdir(table_dir):
        m = _MANIFEST_RE.fullmatch(name)
        if not m:
            continue
        v = int(m.group(1))
        if os.path.getmtime(os.path.join(table_dir, name)) <= ts:
            best = max(best, v)
    if best == 0:
        raise ValueError(
            f"no snapshot in {table_dir} at or before ts={ts}"
        )
    return best
