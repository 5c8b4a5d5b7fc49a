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

Manifest record format (r13): bucket-id -> data-dir entries, plus
COMMIT METADATA under reserved keys starting with ``_`` —
``_committed_at`` (the commit instant, stamped inside the JSON at
``try_commit`` time so time travel survives copies/rsyncs that do not
preserve mtimes — the r12 advisor's finding), ``_writer`` / ``_txn``
(streaming idempotence ledger, Delta's txnAppId/txnVersion).
:func:`read_manifest` returns buckets only; :func:`read_manifest_meta`
returns the metadata. Manifests written before r13 carry no meta keys
and fall back to file mtime for time travel (legacy path).

Expiry — ``expire_snapshots`` drops old manifests and then deletes
data directories no REMAINING manifest references (unreferenced-file
GC). Time travel is exactly as durable as the retention window, and
storage cost is bounded by it; a COW-shared directory survives as long
as any retained manifest names it.

Scan planning — :func:`plan_scan` is the ONE read path that composes
every metadata pruning layer this store knows, the way Iceberg's
``planFiles`` / Delta data skipping run partition pruning, column
stats, and Bloom dictionaries in a single planner every reader goes
through: per-bucket partition SPEC pruning (``spec-v<N>.json`` — each
bucket prunes by its OWN spec, so evolved tables mix layouts), column
min/max STATS pruning (``stats-v<N>.json``), and per-bucket BLOOM
point-key pruning (``bloom-v<N>.json``). All three sidecars are
versioned next to the manifest — as immutable as the snapshot — and
pruning is pure driver-side arithmetic over KB-scale JSON: at 100 TB
the planner consults metadata, never the object store, and a needle
query opens 3 directories instead of 300,000.

Scale posture: manifests are O(buckets) JSON — metadata, not data;
commit cost is one small file create regardless of table size; GC
compares two string sets. The known non-goal (documented, not hidden):
``open('x')`` needs a filesystem with atomic exclusive create — NFS
pre-v3 and some blob mounts don't have it; production swaps this one
call for the store's conditional-put, the protocol is unchanged.
"""

from __future__ import annotations

import hashlib
import json
import os
import re
import shutil
import time

# manifest-v<N>.json              — the default branch ("main")
# manifest-<branch>-v<N>.json     — a named branch's version chain
_MANIFEST_RE = re.compile(r"manifest(?:-([A-Za-z0-9_]+))?-v(\d+)\.json$")
_BRANCH_NAME_RE = re.compile(r"[A-Za-z0-9_]+")


class SnapshotConflict(Exception):
    """Another writer published the version this writer tried to
    create; re-read the latest manifest, rebase, retry."""


def _check_branch(branch: str) -> None:
    if branch == "main":
        return
    if not _BRANCH_NAME_RE.fullmatch(branch) or re.fullmatch(
        r"v\d+", branch
    ):
        raise ValueError(f"invalid branch name {branch!r}")


def manifest_path(table_dir: str, version: int, branch: str = "main") -> str:
    _check_branch(branch)
    infix = "" if branch == "main" else f"-{branch}"
    return os.path.join(table_dir, f"manifest{infix}-v{version}.json")


def _manifest_branch(match: re.Match) -> str:
    return match.group(1) or "main"


def latest_version(table_dir: str, branch: str = "main") -> int:
    """Highest published manifest version on ``branch`` (0 = none)."""
    best = 0
    for name in os.listdir(table_dir):
        m = _MANIFEST_RE.fullmatch(name)
        if m and _manifest_branch(m) == branch:
            best = max(best, int(m.group(2)))
    return best


def _load_record(
    table_dir: str, version: int | None, branch: str = "main"
) -> dict:
    if version is None:
        version = latest_version(table_dir, branch)
        if version == 0:
            raise FileNotFoundError(
                f"no manifest on branch {branch!r} in {table_dir}"
            )
    with open(manifest_path(table_dir, version, branch)) as f:
        return json.load(f)


def read_manifest(
    table_dir: str, version: int | None = None, branch: str = "main"
) -> dict[str, str]:
    """Bucket-id -> data-dir mapping for ``version`` (default latest).
    Reserved ``_``-prefixed commit-metadata keys are stripped — every
    value returned here is a readable data directory."""
    return {
        k: v for k, v in _load_record(table_dir, version, branch).items()
        if not k.startswith("_")
    }


def read_manifest_meta(
    table_dir: str, version: int | None = None, branch: str = "main"
) -> dict:
    """Commit metadata (``_committed_at``, ``_writer``, ``_txn``, …)
    for ``version`` (default latest). Legacy manifests return {}."""
    return {
        k: v for k, v in _load_record(table_dir, version, branch).items()
        if k.startswith("_")
    }


def try_commit(
    table_dir: str,
    base_version: int,
    mapping: dict[str, str],
    meta: dict | None = None,
    branch: str = "main",
) -> int:
    """Publish ``mapping`` as version ``base_version + 1``.

    Atomic create-if-absent: raises :class:`SnapshotConflict` if that
    version already exists (a concurrent writer won the race — rebase
    and retry). Returns the committed version number.

    ``meta`` — optional commit metadata, keys MUST start with ``_``;
    ``_committed_at`` is stamped automatically (wall clock) unless the
    caller provides it (a replayed history carries its original
    instants). The metadata lives INSIDE the manifest JSON so it
    survives copies that do not preserve file mtimes."""
    bad = [k for k in mapping if k.startswith("_")]
    if bad:
        raise ValueError(f"bucket ids may not start with '_': {bad}")
    if meta is not None:
        bad = [k for k in meta if not k.startswith("_")]
        if bad:
            raise ValueError(f"meta keys must start with '_': {bad}")
    record = dict(mapping)
    record.update(meta or {})
    record.setdefault("_committed_at", time.time())
    version = base_version + 1
    path = manifest_path(table_dir, version, branch)
    try:
        fd = os.open(path, os.O_WRONLY | os.O_CREAT | os.O_EXCL)
    except FileExistsError:
        raise SnapshotConflict(
            f"version {version} of branch {branch!r} already published "
            f"in {table_dir}; re-read latest and rebase"
        ) from None
    with os.fdopen(fd, "w") as f:
        json.dump(record, f)
    return version


def create_branch(
    table_dir: str, name: str, from_version: int | None = None
) -> int:
    """Create branch ``name`` at the state of main's ``from_version``
    (default: main's head) — Iceberg branch refs as this store builds
    them: the branch's v1 is a normal manifest REFERENCING the exact
    same data directories (zero copy), carrying ``_from`` so lineage
    is auditable. Commits on the branch then version independently of
    main; GC liveness spans every branch's manifests, so branch work
    is protected until :func:`drop_branch`."""
    _check_branch(name)
    if name == "main":
        raise ValueError("'main' always exists; cannot create it")
    if latest_version(table_dir, name) != 0:
        raise ValueError(f"branch {name!r} already exists in {table_dir}")
    if from_version is None:
        from_version = latest_version(table_dir)
    base = read_manifest(table_dir, from_version)
    return try_commit(
        table_dir, 0, base,
        meta={"_from": ["main", from_version]}, branch=name,
    )


def table_history(table_dir: str, branch: str = "main") -> list[dict]:
    """DESCRIBE HISTORY for the snapshot store (Delta's
    ``DESCRIBE HISTORY`` / Iceberg's ``snapshots`` metadata table):
    one record per retained version, oldest first, each carrying the
    commit instant, the commit metadata (writer, txn ledger, branch
    lineage), and the MANIFEST DIFF against the previous retained
    version — which bucket ids were added, removed, or re-pointed.
    Pure metadata: the cost is one JSON read per retained version,
    independent of table size; a reader can reconstruct what every
    commit did without touching a data file."""
    versions = sorted(
        int(m.group(2))
        for m in (
            _MANIFEST_RE.fullmatch(n) for n in os.listdir(table_dir)
        )
        if m and _manifest_branch(m) == branch
    )
    out: list[dict] = []
    prev: dict[str, str] = {}
    for v in versions:
        buckets = read_manifest(table_dir, v, branch)
        meta = read_manifest_meta(table_dir, v, branch)
        out.append({
            "version": v,
            "committed_at": meta.get("_committed_at"),
            "writer": meta.get("_writer"),
            "meta": meta,
            "n_buckets": len(buckets),
            "added": sorted(b for b in buckets if b not in prev),
            "removed": sorted(b for b in prev if b not in buckets),
            "repointed": sorted(
                b for b in buckets if b in prev and buckets[b] != prev[b]
            ),
        })
        prev = buckets
    return out


def drop_branch(table_dir: str, name: str) -> int:
    """Delete branch ``name``'s manifests (the abandoned-WAP path).
    Its data directories become unreferenced and the NEXT
    :func:`expire_snapshots` reclaims whichever of them no surviving
    manifest (main or other branches) still names. Refuses 'main'."""
    _check_branch(name)
    if name == "main":
        raise ValueError("cannot drop 'main'")
    removed = 0
    for fname in list(os.listdir(table_dir)):
        m = _MANIFEST_RE.fullmatch(fname)
        if m and _manifest_branch(m) == name:
            os.remove(os.path.join(table_dir, fname))
            removed += 1
    return removed


def expire_snapshots(
    table_dir: str,
    keep_from: int,
    min_age_s: float = 0.0,
    extra_live: set[str] | None = None,
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
    * Liveness comparison runs over ``os.path.realpath`` on BOTH sides
      (r12 advisor): a manifest recording absolute paths must protect
      data even when GC is invoked through a relative ``table_dir`` or
      a symlinked mount (/tmp vs /private/tmp) — lexical normpath
      equality would call live directories dead and rmtree committed
      data on the safety-critical path.
    * ``keep_from`` expires MAIN's history only; named branches keep
      every manifest until :func:`drop_branch`, but their referenced
      directories count as live here — branch work is never GC'd out
      from under the branch (Iceberg: refs pin snapshots).
    * ``extra_live``: directories to treat as live even though no
      manifest of THIS table references them — the shallow-clone
      contract (a clone table's manifests point into this table's
      dirs; the owner's GC must be fenced with the clone's live set,
      exactly Delta's vacuum-vs-shallow-clone caveat made explicit).
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
        if m and _manifest_branch(m) == "main" and int(m.group(2)) < keep_from:
            os.remove(os.path.join(table_dir, name))
            removed_m += 1
    live: set[str] = {os.path.realpath(p) for p in (extra_live or set())}
    for name in os.listdir(table_dir):
        if _MANIFEST_RE.fullmatch(name):
            with open(os.path.join(table_dir, name)) as f:
                live.update(
                    os.path.realpath(p)
                    for k, p in json.load(f).items()
                    if not k.startswith("_")
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
        p = os.path.realpath(path)
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
    version whose commit instant is at or before ``ts`` (Delta's
    ``timestampAsOf`` / Iceberg's snapshot-log lookup). The instant is
    the ``_committed_at`` the manifest JSON carries (stamped at
    ``try_commit`` — survives copies/rsyncs/clock-stepped restores
    that rewrite file mtimes, the r12 advisor's finding); manifests
    written before that field existed fall back to file mtime. Raises
    ``ValueError`` when ``ts`` predates the first commit (there is no
    table to read at that instant — the honest answer, not an empty
    frame)."""
    best = 0
    for name in os.listdir(table_dir):
        m = _MANIFEST_RE.fullmatch(name)
        if not m or _manifest_branch(m) != "main":
            continue  # time travel resolves against main's history
        v = int(m.group(2))
        full = os.path.join(table_dir, name)
        with open(full) as f:
            instant = json.load(f).get("_committed_at")
        if instant is None:
            instant = os.path.getmtime(full)  # legacy manifest
        if instant <= ts:
            best = max(best, v)
    if best == 0:
        raise ValueError(
            f"no snapshot in {table_dir} at or before ts={ts}"
        )
    return best


# --------------------------------------------------------------------
# Sidecars + the manifest-native scan planner (r13)
# --------------------------------------------------------------------
#
# Sidecar formats, one JSON file per (kind, version), immutable like
# the manifest they annotate:
#
#   spec-v<N>.json   {bucket: {"column": c, "lo": int, "hi": int}      (range transform, half-open)
#                     | {"column": c, "value": v}}                     (identity transform)
#   stats-v<N>.json  {bucket: {column: [min, max]}}                    (inclusive observed bounds)
#   bloom-v<N>.json  {"column": c, "m": bits, "k": hashes,
#                     "buckets": {bucket: {word_idx: bits_int}}}       (packed 32-bit words)
#
# Predicates are conjunctive tuples:
#   ("range", column, lo, hi)   — half-open [lo, hi)
#   ("in", column, [keys])      — point-key membership
#
# Every layer answers "MAY this bucket match?" — false positives are
# allowed (the residual row filter runs on top), false negatives never
# (a missing sidecar entry keeps the bucket). Pruning is an I/O
# optimization, never a semantics change.

Pred = tuple

_SIDECAR_KINDS = ("spec", "stats", "bloom", "deletes", "schema")


def sidecar_path(table_dir: str, version: int, kind: str) -> str:
    if kind not in _SIDECAR_KINDS:
        raise ValueError(f"unknown sidecar kind {kind!r}")
    return os.path.join(table_dir, f"{kind}-v{version}.json")


def write_sidecar(
    table_dir: str, version: int, kind: str, payload: dict
) -> str:
    """Stage a sidecar for the version about to be committed (write it
    BEFORE ``try_commit`` so no reader ever sees a manifest without
    its stats — the same stage-then-publish order as the data)."""
    path = sidecar_path(table_dir, version, kind)
    with open(path, "w") as f:
        json.dump(payload, f)
    return path


def read_sidecar(table_dir: str, version: int, kind: str) -> dict | None:
    path = sidecar_path(table_dir, version, kind)
    if not os.path.exists(path):
        return None
    with open(path) as f:
        return json.load(f)


def bloom_positions(key, k: int, m: int) -> list[int]:
    """The store's Bloom hash recipe: md5 over ``"<i>:<key>"``, first
    15 hex digits, mod m — hashlib here mirrors the engine-side
    ``md5_prefix_int`` expression exactly, so filters BUILT by a Spark
    aggregate are PROBED by pure driver arithmetic."""
    return [
        int(hashlib.md5(f"{i}:{key}".encode()).hexdigest()[:15], 16) % m
        for i in range(k)
    ]


def _spec_may_match(entry: dict | None, preds: list[Pred]) -> bool:
    if not entry:
        return True  # bucket with no declared spec: cannot prune
    col = entry.get("column")
    for p in preds:
        if p[1] != col:
            continue
        if "value" in entry:
            v = entry["value"]
            if p[0] == "range" and not (p[2] <= v < p[3]):
                return False
            if p[0] == "in" and v not in p[2]:
                return False
        else:
            lo, hi = entry["lo"], entry["hi"]
            if p[0] == "range" and not (lo < p[3] and hi > p[2]):
                return False
            if p[0] == "in" and not any(lo <= k < hi for k in p[2]):
                return False
    return True


def _stats_may_match(entry: dict | None, preds: list[Pred]) -> bool:
    if not entry:
        return True
    for p in preds:
        bounds = entry.get(p[1])
        if bounds is None:
            continue  # no stats for this column in this bucket
        lo, hi = bounds  # inclusive observed min/max
        if p[0] == "range" and not (lo < p[3] and hi >= p[2]):
            return False
        if p[0] == "in" and not any(lo <= k <= hi for k in p[2]):
            return False
    return True


def _bloom_may_match(side: dict, bucket: str, preds: list[Pred]) -> bool:
    words = side["buckets"].get(bucket)
    if words is None:
        return True
    m, k = side["m"], side["k"]

    def maybe_has(key) -> bool:
        return all(
            (words.get(str(p // 32), 0) >> (p % 32)) & 1
            for p in bloom_positions(key, k, m)
        )

    for p in preds:
        if p[0] == "in" and p[1] == side["column"]:
            if not any(maybe_has(key) for key in p[2]):
                return False
    return True


def plan_scan(
    table_dir: str,
    predicates: list[Pred],
    version: int | None = None,
    explain: bool = False,
):
    """THE read path: resolve ``version``'s manifest, then prune its
    buckets through every sidecar layer in order — partition spec →
    column stats → Bloom — and return the surviving data dirs (sorted
    by bucket id). With ``explain=True`` also returns the per-layer
    candidate trace ``{"buckets", "after_spec", "after_stats",
    "after_bloom"}`` so callers (and tests) can assert WHERE pruning
    happened, the way Iceberg's scan reports skipped manifests/files.

    Layers a version does not carry are skipped (trace repeats the
    previous set) — a table with only stats still plans through the
    one planner; composition is additive, not configured."""
    if version is None:
        version = latest_version(table_dir)
    mani = read_manifest(table_dir, version)
    cand = set(mani)
    trace: dict[str, list[str]] = {"buckets": sorted(cand)}

    spec = read_sidecar(table_dir, version, "spec")
    if spec:
        cand = {b for b in cand if _spec_may_match(spec.get(b), predicates)}
    trace["after_spec"] = sorted(cand)

    stats = read_sidecar(table_dir, version, "stats")
    if stats:
        cand = {b for b in cand if _stats_may_match(stats.get(b), predicates)}
    trace["after_stats"] = sorted(cand)

    bloom = read_sidecar(table_dir, version, "bloom")
    if bloom:
        cand = {b for b in cand if _bloom_may_match(bloom, b, predicates)}
    trace["after_bloom"] = sorted(cand)

    dirs = [mani[b] for b in sorted(cand)]
    return (dirs, trace) if explain else dirs


def read_snapshot(
    spark,
    table_dir: str,
    predicates: list[Pred] | None = None,
    version: int | None = None,
):
    """Read a snapshot THROUGH the scan planner: only the dirs
    :func:`plan_scan` keeps are opened. The caller still applies the
    row-level residual filter — pruning selects candidate buckets, it
    never replaces the predicate. A fully-pruned plan (the predicate
    provably selects nothing) returns an empty frame with the table's
    schema (footer read of one bucket, zero data rows).

    MERGE-ON-READ: a version carrying a ``deletes`` sidecar
    (equality-delete vector, ``{"column": c, "buckets": {bucket:
    [keys]}}``) has those keys filtered out here — EVERY reader goes
    through the one function, so a deletion-vector commit is
    correct-by-construction for all of them (Iceberg v2 equality
    deletes / Delta deletion vectors). The filter is an ``isin`` over
    the sidecar's keys — literally a broadcast anti-semi-join, sized
    KB per commit; compaction later folds DVs into data and drops the
    sidecar."""
    from pyspark.sql import functions as F

    if version is None:
        version = latest_version(table_dir)
    preds = predicates or []
    dirs = plan_scan(table_dir, preds, version=version)
    if dirs:
        df = spark.read.parquet(*dirs)
    else:
        mani = read_manifest(table_dir, version)
        df = spark.read.parquet(next(iter(mani.values()))).limit(0)
    dv = read_sidecar(table_dir, version, "deletes")
    if dv:
        deleted = sorted({k for ks in dv["buckets"].values() for k in ks})
        if deleted:
            col = F.col(dv["column"])
            # NULL-keyed rows must SURVIVE: ~NULL.isin(...) is NULL,
            # which a bare filter silently drops — a delete of keys
            # must never delete rows that have no key
            df = df.where(~col.isin(deleted) | col.isNull())
    return df


def read_snapshot_evolved(spark, table_dir: str, version: int | None = None):
    """Read a snapshot whose versions carry a COLUMN-MAPPING schema
    sidecar (``schema`` kind)::

        {"fields":  {logical_name: physical_field},
         "buckets": {bucket: [physical fields present]}}

    Physical parquet columns are stable FIELD names (f1, f2, …);
    logical names live only in the sidecar — Iceberg's field-id
    column mapping, which is what makes RENAME COLUMN a metadata-only
    commit (rebind a logical name to the same field) and ADD COLUMN a
    zero-rewrite commit (old buckets simply lack the new field and
    read NULL for it, exactly Iceberg/Delta add-column semantics).

    Scale: buckets are grouped by their physical field signature and
    each group is ONE multi-dir parquet read + one projection — the
    read fans out per schema GENERATION (a handful), never per bucket,
    and the union is a zero-shuffle plan node."""
    from pyspark.sql import functions as F

    if version is None:
        version = latest_version(table_dir)
    side = read_sidecar(table_dir, version, "schema")
    if side is None:
        raise ValueError(
            f"version {version} of {table_dir} has no schema sidecar"
        )
    mani = read_manifest(table_dir, version)
    groups: dict[tuple[str, ...], list[str]] = {}
    for b, d in mani.items():
        sig = tuple(sorted(side["buckets"][b]))
        groups.setdefault(sig, []).append(d)
    parts = []
    for sig, dirs in sorted(groups.items()):
        present = set(sig)
        df = spark.read.parquet(*sorted(dirs))
        parts.append(df.select(*[
            F.col(phys).alias(logical) if phys in present
            else F.lit(None).alias(logical)
            for logical, phys in side["fields"].items()
        ]))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out
