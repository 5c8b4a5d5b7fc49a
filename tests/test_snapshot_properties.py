"""Property tests for the snapshot protocol (operators/snapshots.py,
streaming/pipeline.snapshot_commit_batch): the invariants that make
MVCC safe are quantified-over-inputs claims, so hypothesis drives
them instead of one scripted example.

1. GC SAFETY: for ANY chain of manifests over ANY layout mix
   (top-level data dirs AND subdirectories of a shared partitioned
   root — the shape that exposed the r12 identity-matching bug) and
   ANY keep_from (including beyond head), expire_snapshots never
   deletes a path a retained manifest references, and always removes
   top-level entries that neither are nor contain one.
2. EXACTLY-ONCE: for ANY split of a row set into micro-batches and
   ANY replay schedule (including replays carrying poisoned payloads),
   the committed table holds each row exactly once.
"""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from financial_data_warehouse_automation_spark.operators.snapshots import (
    expire_snapshots,
    latest_version,
    read_manifest,
    try_commit,
)


@settings(max_examples=40, deadline=None)
@given(data=st.data())
def test_gc_safety_and_liveness_property(tmp_path_factory, data):
    table = str(tmp_path_factory.mktemp("gcprop"))

    # dir pool: 6 top-level dirs + 4 subdirs of one partitioned root
    pool = []
    for i in range(6):
        d = os.path.join(table, f"top{i}")
        os.makedirs(d)
        open(os.path.join(d, "p.parquet"), "w").write("x")
        pool.append(d)
    root = os.path.join(table, "root0")
    for i in range(4):
        d = os.path.join(root, f"pb={i}")
        os.makedirs(d)
        open(os.path.join(d, "p.parquet"), "w").write("x")
        pool.append(d)

    n_versions = data.draw(st.integers(1, 4), label="n_versions")
    n_buckets = data.draw(st.integers(1, 3), label="n_buckets")
    manifests = []
    for v in range(n_versions):
        mapping = {
            str(b): pool[
                data.draw(st.integers(0, len(pool) - 1), label=f"v{v}b{b}")
            ]
            for b in range(n_buckets)
        }
        assert try_commit(table, v, mapping) == v + 1
        manifests.append(mapping)

    keep_from = data.draw(st.integers(1, 8), label="keep_from")
    expire_snapshots(table, keep_from=keep_from)

    eff = min(keep_from, n_versions)  # the clamp under test
    retained = set()
    for v in range(eff, n_versions + 1):
        assert read_manifest(table, v) == manifests[v - 1]
        retained.update(os.path.normpath(p) for p in manifests[v - 1].values())
    for v in range(1, eff):
        assert not os.path.exists(
            os.path.join(table, f"manifest-v{v}.json")
        )

    # SAFETY: every retained-referenced path still exists
    for p in retained:
        assert os.path.exists(p), p
    # LIVENESS: top-level entries neither being nor containing a
    # retained path are gone; others survive whole
    for name in [f"top{i}" for i in range(6)] + ["root0"]:
        full = os.path.normpath(os.path.join(table, name))
        live = any(
            q == full or q.startswith(full + os.sep) for q in retained
        )
        assert os.path.exists(full) == live, (name, live)


@settings(
    max_examples=6, deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
)
@given(
    cuts=st.lists(st.integers(1, 11), max_size=3, unique=True),
    replays=st.lists(st.integers(0, 3), max_size=4),
)
def test_stream_snapshot_commit_exactly_once_property(
    spark, tmp_path_factory, cuts, replays
):
    """ANY batch split x ANY replay schedule (poisoned payloads) ==
    each row exactly once."""
    from financial_data_warehouse_automation_spark.streaming.pipeline import (
        snapshot_commit_batch,
    )

    table = str(tmp_path_factory.mktemp("eoprop"))
    fn = snapshot_commit_batch(table)
    rows = list(range(12))
    bounds = [0, *sorted(cuts), 12]
    batches = [
        rows[bounds[i]:bounds[i + 1]]
        for i in range(len(bounds) - 1)
        if rows[bounds[i]:bounds[i + 1]]
    ]
    poison = spark.range(100, 130).selectExpr("id")
    for bid, batch in enumerate(batches):
        for r in replays:
            if r < bid:  # replay an EARLIER batch with poisoned data
                fn(poison, r)
        fn(spark.createDataFrame([(v,) for v in batch], "id long"), bid)
    for r in replays:  # tail replays after the stream drained
        if r < len(batches):
            fn(poison, r)

    assert latest_version(table) == len(batches)
    got = sorted(
        r.id
        for r in spark.read.parquet(
            *read_manifest(table).values()
        ).collect()
    )
    assert got == rows, got


@settings(max_examples=30, deadline=None)
@given(data=st.data())
def test_dv_carry_forward_never_resurrects_property(tmp_path_factory, data):
    """3. DELETE DURABILITY (r14): for ANY sequence of commits — each
    either an unrelated append (new bucket), a re-point of an existing
    bucket (a compaction, which legitimately folds that bucket's
    vector), or a fresh DV delete — the set of keys a reader must see
    per bucket is exactly the model's: a DV'd key stays deleted until
    ITS bucket is rewritten, no matter how many commits of any kind
    intervene and none of which re-stage anything."""
    from financial_data_warehouse_automation_spark.operators.snapshots import (
        read_sidecar,
        write_sidecar,
    )

    table = str(tmp_path_factory.mktemp("dvprop"))
    mk = 0

    def mkdir(name):
        d = os.path.join(table, name)
        os.makedirs(d)
        with open(os.path.join(d, "p.parquet"), "w") as f:
            f.write("x")
        return d

    # model: bucket -> (generation tag, set of deleted keys)
    mapping = {"b0": mkdir("b0-g0")}
    model = {"b0": set()}
    try_commit(table, 0, dict(mapping))
    version = 1

    n_steps = data.draw(st.integers(min_value=1, max_value=8))
    for step in range(n_steps):
        op = data.draw(st.sampled_from(["append", "repoint", "delete"]))
        if op == "append":
            b = f"b{len(mapping)}"
            mapping[b] = mkdir(f"{b}-g{step}")
            model[b] = set()
            try_commit(table, version, dict(mapping))
        elif op == "repoint":
            b = data.draw(st.sampled_from(sorted(mapping)))
            mapping[b] = mkdir(f"{b}-r{step}")
            model[b] = set()  # rewrite folds the bucket's vector
            try_commit(table, version, dict(mapping))
        else:
            b = data.draw(st.sampled_from(sorted(mapping)))
            ks = set(data.draw(st.lists(
                st.integers(min_value=0, max_value=9),
                min_size=1, max_size=3,
            )))
            model[b] |= ks
            write_sidecar(table, version + 1, "deletes", {
                "column": "k",
                "buckets": {b: sorted(ks)},
            })
            try_commit(table, version, dict(mapping))
        version += 1

        # the reader's effective vector must equal the model exactly:
        # no resurrection (missing carried keys) and no stale deletes
        # (keys surviving a re-point)
        side = read_sidecar(table, version, "deletes")
        got = {
            b: set(ks)
            for b, ks in (side or {}).get("buckets", {}).items()
        }
        want = {b: ks for b, ks in model.items() if ks}
        assert got == want, (step, op, got, want)
