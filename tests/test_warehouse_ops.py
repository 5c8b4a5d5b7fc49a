"""Unit + property tests for operators/warehouse.py — in particular the
run-twice idempotency fixed point the Python reference violates
(SURVEY §2.11 D4: build_warehouse.py:164 crashes on its own output)."""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_data_warehouse_automation_spark.operators.warehouse import (
    dedupe_keep_first,
    qa_ledger_merge,
    upsert_keep_last,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_upsert_updates_beat_existing(spark):
    existing = spark.createDataFrame(
        [("a", 1, 10.0), ("b", 1, 20.0)], "k string, p int, v double"
    )
    updates = spark.createDataFrame(
        [("b", 1, 99.0), ("c", 1, 30.0)], "k string, p int, v double"
    )
    out = _rows(upsert_keep_last(existing, updates, ["k", "p"]))
    assert out == [("a", 1, 10.0), ("b", 1, 99.0), ("c", 1, 30.0)]


def test_upsert_is_idempotent_fixed_point(spark):
    existing = spark.createDataFrame(
        [("a", 1, 10.0), ("b", 1, 20.0)], "k string, p int, v double"
    )
    updates = spark.createDataFrame(
        [("b", 1, 99.0), ("c", 1, 30.0)], "k string, p int, v double"
    )
    once = upsert_keep_last(existing, updates, ["k", "p"])
    twice = upsert_keep_last(once, updates, ["k", "p"])
    assert _rows(once) == _rows(twice)


def test_upsert_intra_batch_tiebreak(spark):
    existing = spark.createDataFrame([], "k string, v double, ts int")
    updates = spark.createDataFrame(
        [("a", 1.0, 1), ("a", 2.0, 2)], "k string, v double, ts int"
    )
    out = _rows(upsert_keep_last(existing, updates, ["k"], [F.desc("ts")]))
    assert out == [("a", 2.0, 2)]


def test_dedupe_keep_first_deterministic(spark):
    df = spark.createDataFrame(
        [("g1", 3, "z"), ("g1", 1, "x"), ("g1", 2, "y"), ("g2", 7, "q")],
        "k string, ord int, payload string",
    )
    out = _rows(dedupe_keep_first(df, ["k"], [F.asc("ord")]))
    assert out == [("g1", 1, "x"), ("g2", 7, "q")]


def test_qa_ledger_transitions(spark):
    ledger = spark.createDataFrame(
        [("k1", "Open", "2024-01-01"), ("k2", "Open", "2024-01-01")],
        "gl string, status string, last_seen string",
    ).withColumn("last_seen", F.col("last_seen").cast("date"))
    misses = spark.createDataFrame([("k2",), ("k3",)], "gl string")
    out = qa_ledger_merge(
        ledger, misses, ["gl"], seen_col=F.lit("2024-02-01").cast("date")
    )
    rows = {r.gl: (r.status, str(r.last_seen)) for r in out.collect()}
    assert rows == {
        "k1": ("Resolved", "2024-01-01"),   # gone from misses → Resolved, seen kept
        "k2": ("Open", "2024-02-01"),       # still missing → Open, seen bumped
        "k3": ("Open", "2024-02-01"),       # new miss → Open
    }


def test_qa_ledger_reopen_resolved(spark):
    # A Resolved key that reappears flips back to Open (Code.gs:295-299
    # upserts regardless of prior status).
    ledger = spark.createDataFrame(
        [("k1", "Resolved", "2024-01-01")],
        "gl string, status string, last_seen string",
    ).withColumn("last_seen", F.col("last_seen").cast("date"))
    misses = spark.createDataFrame([("k1",)], "gl string")
    out = qa_ledger_merge(
        ledger, misses, ["gl"], seen_col=F.lit("2024-03-01").cast("date")
    )
    rows = {r.gl: (r.status, str(r.last_seen)) for r in out.collect()}
    assert rows == {"k1": ("Open", "2024-03-01")}


def test_qa_ledger_resolve_backfill(spark):
    # Resolved rows come back enriched from the current dim
    # (Code.gs:301-310 back-fill); Open rows stay unenriched.
    ledger = spark.createDataFrame(
        [("k1", "Open", "2024-01-01"), ("k2", "Open", "2024-01-01")],
        "gl string, status string, last_seen string",
    ).withColumn("last_seen", F.col("last_seen").cast("date"))
    misses = spark.createDataFrame([("k2",)], "gl string")
    dim = spark.createDataFrame([("k1", "now mapped")], "gl string, description string")
    out = qa_ledger_merge(
        ledger, misses, ["gl"],
        seen_col=F.lit("2024-02-01").cast("date"),
        resolve_backfill=dim,
    )
    rows = {r.gl: (r.status, r.description) for r in out.collect()}
    assert rows == {"k1": ("Resolved", "now mapped"), "k2": ("Open", None)}


def _merge_tombstones(state, changes, key):
    """The merge_with_tombstones recipe as a reusable transform: changes
    beat state per key, op='D' survivors are erased."""
    merged = upsert_keep_last(state.withColumn("op", F.lit("U")), changes, key)
    return merged.where(F.col("op") != "D").drop("op")


def test_tombstone_merge_deletes_and_upserts(spark):
    state = spark.createDataFrame(
        [("a", 10.0), ("b", 20.0), ("c", 30.0)], "k string, v double"
    )
    changes = spark.createDataFrame(
        [("b", 99.0, "U"), ("c", 0.0, "D"), ("d", 40.0, "U")],
        "k string, v double, op string",
    )
    out = _rows(_merge_tombstones(state, changes, ["k"]))
    assert out == [("a", 10.0), ("b", 99.0), ("d", 40.0)]


def test_tombstone_merge_is_idempotent_fixed_point(spark):
    """Re-delivering the same CDC batch must be a no-op — including the
    deletes: a tombstone for an already-absent key stays absent."""
    state = spark.createDataFrame(
        [("a", 10.0), ("b", 20.0), ("c", 30.0)], "k string, v double"
    )
    changes = spark.createDataFrame(
        [("b", 99.0, "U"), ("c", 0.0, "D"), ("d", 40.0, "U")],
        "k string, v double, op string",
    )
    once = _merge_tombstones(state, changes, ["k"])
    twice = _merge_tombstones(once, changes, ["k"])
    assert _rows(once) == _rows(twice)


def test_tombstone_only_key_never_materializes(spark):
    state = spark.createDataFrame([("a", 10.0)], "k string, v double")
    changes = spark.createDataFrame(
        [("ghost", 1.0, "D")], "k string, v double, op string"
    )
    out = _rows(_merge_tombstones(state, changes, ["k"]))
    assert out == [("a", 10.0)]
