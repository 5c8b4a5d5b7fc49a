"""events_sessionization_two_phase must be BIT-IDENTICAL to the plain
single-window formulation — the whole point of the two-pass shape is
that it changes the skew bound, never the answer."""

from __future__ import annotations

import datetime as dt

from financial_data_warehouse_automation_spark.queries.events import (
    events_sessionization_30min,
    events_sessionization_two_phase,
)


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_two_phase_equals_plain_on_corpus(spark, sf_dir):
    assert _rows(events_sessionization_two_phase(spark, sf_dir)) == _rows(
        events_sessionization_30min(spark, sf_dir)
    )


def test_two_phase_merges_multi_midnight_chain(spark, tmp_path):
    # user 1: 20-min cadence for 300 events crossing four midnights —
    # ONE session end to end; the chunked pass produces 5 provisional
    # day-sessions that must chain back together transitively.
    # user 2: one event per day at noon — every event its own session.
    base = dt.datetime(2024, 1, 1, 22, 0, 0)
    rows = [
        (i, base + dt.timedelta(minutes=20 * i), 1, "click", 1.0, "{}")
        for i in range(300)
    ]
    rows += [
        (1000 + d, dt.datetime(2024, 2, 1 + d, 12, 0, 0), 2, "click", 1.0, "{}")
        for d in range(5)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    df.write.parquet(str(tmp_path / "events.parquet"))

    got = {
        (r.user_id, r.session_id): (r.session_start, r.session_end, r.n_events)
        for r in events_sessionization_two_phase(spark, str(tmp_path)).collect()
    }
    want = {
        (r.user_id, r.session_id): (r.session_start, r.session_end, r.n_events)
        for r in events_sessionization_30min(spark, str(tmp_path)).collect()
    }
    assert got == want
    assert len([k for k in got if k[0] == 1]) == 1, "bot chain must be one session"
    assert got[(1, 1)][2] == 300
    assert len([k for k in got if k[0] == 2]) == 5


def test_two_phase_pass1_exchanges_on_user_and_chunk(spark, sf_dir):
    """The skew bound is a PLAN property: pass 1 must exchange on
    (user_id, chunk), not inherit a user_id-only partitioning — a
    user_id spread would satisfy the window's clustering via the
    subset rule and re-serialize a hot user in one task (round-6
    review finding)."""
    import re

    df = events_sessionization_two_phase(spark, sf_dir)
    df.collect()
    plan = df._jdf.queryExecution().executedPlan().toString().lower()
    assert re.search(r"hashpartitioning\(user_id[^)]*chunk", plan), plan
