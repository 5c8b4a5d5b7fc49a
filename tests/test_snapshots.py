"""operators/snapshots.py — the manifest CAS, conflict, and expiry
protocol objects, exercised without Spark (pure filesystem), plus the
registered OCC query's end-to-end run at the test SF."""

from __future__ import annotations

import json
import os

import pytest

from financial_data_warehouse_automation_spark.operators.snapshots import (
    SnapshotConflict,
    expire_snapshots,
    latest_version,
    read_manifest,
    try_commit,
)


def _mkdata(table, name):
    d = os.path.join(table, name)
    os.makedirs(d)
    with open(os.path.join(d, "part-0.parquet"), "w") as f:
        f.write("x")
    return d


def test_cas_publishes_and_conflicts(tmp_path):
    table = str(tmp_path)
    d1 = _mkdata(table, "b0-g1")
    assert latest_version(table) == 0
    assert try_commit(table, 0, {"0": d1}) == 1
    assert latest_version(table) == 1
    assert read_manifest(table) == {"0": d1}
    # second writer against the same base loses atomically
    d2 = _mkdata(table, "b0-g2")
    assert try_commit(table, 1, {"0": d2}) == 2
    d3 = _mkdata(table, "b0-g2b")
    with pytest.raises(SnapshotConflict):
        try_commit(table, 1, {"0": d3})
    # the losing attempt must not have clobbered the winner
    assert read_manifest(table, 2) == {"0": d2}


def test_conflict_leaves_no_partial_manifest(tmp_path):
    table = str(tmp_path)
    d1 = _mkdata(table, "b0-g1")
    try_commit(table, 0, {"0": d1})
    winner = read_manifest(table, 1)
    with pytest.raises(SnapshotConflict):
        try_commit(table, 0, {"0": "other"})
    with open(os.path.join(table, "manifest-v1.json")) as f:
        assert json.load(f) == winner  # byte-level intact


def test_expiry_gc_removes_only_unreferenced(tmp_path):
    table = str(tmp_path)
    shared = _mkdata(table, "shared-g1")
    old = _mkdata(table, "b1-g1")
    new = _mkdata(table, "b1-g2")
    try_commit(table, 0, {"0": shared, "1": old})
    try_commit(table, 1, {"0": shared, "1": new})
    removed_m, removed_d = expire_snapshots(table, keep_from=2)
    assert (removed_m, removed_d) == (1, 1)
    assert not os.path.exists(old)       # only v1 referenced it
    assert os.path.exists(shared)        # still referenced by v2
    assert os.path.exists(new)
    assert read_manifest(table) == {"0": shared, "1": new}
    with pytest.raises(FileNotFoundError):
        read_manifest(table, 1)


def test_expiry_clamps_keep_from_to_latest(tmp_path):
    """keep_from beyond head must clamp, not expire every manifest and
    then GC the whole table against an empty live set (r11 advisor,
    medium): the newest snapshot and its data always survive."""
    table = str(tmp_path)
    d1 = _mkdata(table, "b0-g1")
    d2 = _mkdata(table, "b0-g2")
    try_commit(table, 0, {"0": d1})
    try_commit(table, 1, {"0": d2})
    removed_m, removed_d = expire_snapshots(table, keep_from=999)
    assert (removed_m, removed_d) == (1, 1)  # same effect as keep_from=2
    assert read_manifest(table) == {"0": d2}
    assert os.path.exists(d2)


def test_expiry_refuses_table_without_manifest(tmp_path):
    """No manifest at all -> ValueError, never 'live set is empty so
    delete every data directory'."""
    table = str(tmp_path)
    survivor = _mkdata(table, "b0-g1")
    with pytest.raises(ValueError, match="no manifest"):
        expire_snapshots(table, keep_from=1)
    assert os.path.exists(survivor)


def test_expiry_min_age_protects_staged_dirs(tmp_path):
    """An unreferenced-but-YOUNG directory is a concurrent writer's
    staged output, not garbage; min_age_s must exempt it (r11 advisor:
    GC racing a writer otherwise loses its uncommitted work). Aging the
    dir past the cutoff makes it collectable again."""
    table = str(tmp_path)
    d1 = _mkdata(table, "b0-g1")
    try_commit(table, 0, {"0": d1})
    staged = _mkdata(table, "b0-staged")  # uncommitted writer output
    removed_m, removed_d = expire_snapshots(table, keep_from=1,
                                            min_age_s=3600)
    assert (removed_m, removed_d) == (0, 0)
    assert os.path.exists(staged)
    # simulate the writer having died long ago: age the dir out
    old = os.path.getmtime(staged) - 7200
    os.utime(staged, (old, old))
    _, removed_d = expire_snapshots(table, keep_from=1, min_age_s=3600)
    assert removed_d == 1
    assert not os.path.exists(staged)
    assert os.path.exists(d1)


def test_registered_occ_query_runs_green(spark, sf_dir):
    """The scripted interleaving's own asserts (conflict raised, rebase
    == latest, GC counts) must hold at the test SF; v3 carries both
    writers' effects (fewer rows than v1 via B's delete, more cents
    than would-be-pure-delete via A's +50)."""
    from financial_data_warehouse_automation_spark.registry import load_all

    rows = {
        r.snapshot: r
        for r in load_all()["orders_snapshot_concurrent_commit"]
        .builder(spark, sf_dir)
        .collect()
    }
    assert set(rows) == {"v1", "v2", "v3"}
    assert rows["v2"].n_orders == rows["v1"].n_orders  # A only updates
    assert rows["v2"].cents > rows["v1"].cents
    assert rows["v3"].n_orders < rows["v1"].n_orders   # B's delete landed
