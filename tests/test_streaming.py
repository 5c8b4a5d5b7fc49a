"""Streaming wrapper tests (SURVEY §2.9): file-arrival ingest with
exactly-once + idempotent upsert, and watermarked window aggregation
equal to its batch twin."""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from financial_data_warehouse_automation_spark.ingest.fixtures import INCOME_LINES
from financial_data_warehouse_automation_spark.streaming.pipeline import (
    event_window_counts_stream,
    run_statement_ingest,
)

_COLS = ["file_name", "sheet_name", "row_idx", "col_a", "col_b", "col_c"]


def _write_drop_file(drop_dir: str, name: str, rows) -> None:
    os.makedirs(drop_dir, exist_ok=True)
    with open(os.path.join(drop_dir, name), "w") as f:
        for r in rows:
            rec = dict(zip(_COLS, r))
            # excel.LINE_SCHEMA carries col_d/col_e; income fixtures don't
            rec["col_d"] = None
            rec["col_e"] = None
            f.write(json.dumps(rec) + "\n")


@pytest.fixture()
def dirs(tmp_path):
    return (
        str(tmp_path / "drop"),
        str(tmp_path / "warehouse"),
        str(tmp_path / "ckpt"),
    )


def test_stream_ingest_exactly_once_and_idempotent(spark, dirs):
    drop, wh, ckpt = dirs
    f1 = [r for r in INCOME_LINES if r[0].startswith("01.")]
    f2 = [r for r in INCOME_LINES if r[0].startswith("02.")]
    _write_drop_file(drop, "f1.json", f1)

    q = run_statement_ingest(spark, drop, wh, ckpt)
    q.awaitTermination()
    first = spark.read.parquet(wh)
    n1 = first.count()
    assert n1 == 7  # period-1 parsed facts (dept 123: 5, dept 124: 2)

    # second run: f1 already consumed (checkpoint), f2 new, f1 also
    # re-dropped under a new name — the upsert collapses the re-delivery
    # capture period-1 partition files before run 2 (which only adds f2)
    p1_dir = os.path.join(wh, "year=2024", "month=1")
    assert os.path.isdir(p1_dir)  # (year, month)-partitioned layout
    p1_before = {
        f: os.path.getmtime(os.path.join(p1_dir, f))
        for f in os.listdir(p1_dir)
    }

    _write_drop_file(drop, "f2.json", f2)
    q = run_statement_ingest(spark, drop, wh, ckpt)
    q.awaitTermination()
    final = spark.read.parquet(wh)
    assert final.count() == 10  # 7 + 3 period-2 facts, no dup keys
    key = ["gl_code", "year", "month", "department", "category"]
    assert final.select(*key).distinct().count() == 10
    # partition-scoped merge: period 1 untouched by the period-2 batch
    p1_after = {
        f: os.path.getmtime(os.path.join(p1_dir, f))
        for f in os.listdir(p1_dir)
    }
    assert p1_after == p1_before

    # re-delivery of f1 (same data, new file) is an idempotent no-op
    _write_drop_file(drop, "f1_redelivered.json", f1)
    q = run_statement_ingest(spark, drop, wh, ckpt)
    q.awaitTermination()
    final2 = spark.read.parquet(wh)
    assert final2.count() == 10
    assert final2.select(*key).distinct().count() == 10


def test_upsert_batch_fails_loudly_on_poisoned_warehouse(spark, tmp_path):
    """A warehouse read failure that is NOT the missing-path case must
    fail the batch (foreachBatch re-runs it), never be treated as
    'first batch: no warehouse yet' — that misread would make the
    dynamic partition overwrite truncate every period in the batch to
    only the new facts."""
    from financial_data_warehouse_automation_spark.ingest.excel import LINE_SCHEMA
    from financial_data_warehouse_automation_spark.streaming.pipeline import _upsert_batch

    f1 = [r for r in INCOME_LINES if r[0].startswith("01.")]
    batch_dir = str(tmp_path / "batch")
    _write_drop_file(batch_dir, "f1.json", f1)
    batch = spark.read.schema(LINE_SCHEMA).json(batch_dir)

    # sanity: the genuinely-missing path still initializes an empty
    # warehouse and writes the first batch
    fresh = str(tmp_path / "fresh_wh")
    _upsert_batch(fresh)(batch, 0)
    assert spark.read.parquet(fresh).count() == 7

    # corrupt footer: read fails with a non-PATH error -> batch raises,
    # the poisoned file is left untouched (no overwrite happened)
    poisoned = tmp_path / "poisoned_wh"
    poisoned.mkdir()
    garbage = poisoned / "part-00000.snappy.parquet"
    garbage.write_bytes(b"this is not a parquet footer")
    with pytest.raises(Exception):
        _upsert_batch(str(poisoned))(batch, 0)
    assert garbage.read_bytes() == b"this is not a parquet footer"
    assert sorted(p.name for p in poisoned.iterdir()) == [garbage.name]

    # empty dir: AnalysisException UNABLE_TO_INFER_SCHEMA, not
    # PATH_NOT_FOUND -> must also raise (exercises _missing_path's
    # condition check on a real AnalysisException), dir left empty
    empty = tmp_path / "empty_wh"
    empty.mkdir()
    with pytest.raises(Exception):
        _upsert_batch(str(empty))(batch, 0)
    assert list(empty.iterdir()) == []


def test_event_stream_window_equals_batch(spark, sf_dir, tmp_path):
    from financial_data_warehouse_automation_spark.tables import load_table

    batch_events = load_table(spark, sf_dir, "events")
    # materialize a small slice as the streaming source
    src = str(tmp_path / "events_src")
    batch_events.where(F.col("event_id") < 500).write.parquet(src)

    stream = (
        spark.readStream.schema(batch_events.schema).parquet(src)
    )
    out = (
        event_window_counts_stream(stream)
        .writeStream.format("memory")
        .queryName("ewc")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    out.awaitTermination()
    got = {
        (r.bucket_start, r.event_type): (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM ewc").collect()
    }
    expected_df = (
        batch_events.where(F.col("event_id") < 500)
        .groupBy(F.window("ts", "15 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.col("value").cast("decimal(12,2)")).cast("double").alias("total_value"),
        )
        .select(
            F.unix_timestamp(F.col("w.start")).alias("bucket_start"),
            "event_type", "n_events", "total_value",
        )
    )
    expected = {
        (r.bucket_start, r.event_type): (r.n_events, r.total_value)
        for r in expected_df.collect()
    }
    assert got == expected


def test_stream_stream_interval_join_equals_batch(spark, sf_dir, tmp_path):
    """Watermarked stream-stream self-join (click→purchase attribution
    within 60 min) must emit exactly the batch interval-join's rows once
    the bounded source drains."""
    from financial_data_warehouse_automation_spark.streaming.pipeline import purchase_attribution_stream
    from financial_data_warehouse_automation_spark.tables import load_table

    events = load_table(spark, sf_dir, "events").where(F.col("user_id") < 30)
    src = str(tmp_path / "events_src")
    # two chronological files → matches split across micro-batches, so
    # the join must buffer clicks in state to pair later purchases
    cut = events.agg(
        F.expr("percentile_approx(unix_micros(ts), 0.5)")
    ).collect()[0][0]
    events.where(F.unix_micros("ts") <= cut).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    events.where(F.unix_micros("ts") > cut).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        purchase_attribution_stream(stream)
        .writeStream.format("memory")
        .queryName("attr")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {tuple(r) for r in spark.sql(
        "SELECT user_id, click_id, purchase_id FROM attr"
    ).collect()}

    c = events.where(F.col("event_type") == "click").select(
        F.col("user_id").alias("cu"), F.col("ts").alias("cts"),
        F.col("event_id").alias("click_id"),
    )
    p = events.where(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("pu"), F.col("ts").alias("pts"),
        F.col("event_id").alias("purchase_id"),
    )
    batch = c.join(
        p,
        (F.col("cu") == F.col("pu"))
        & (F.col("pts") >= F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 60 MINUTES")),
    ).select("cu", "click_id", "purchase_id")
    expected = {tuple(r) for r in batch.collect()}
    assert got == expected
    assert len(got) > 0  # non-trivial fixture


def test_stream_dedup_within_watermark_equals_batch(spark, sf_dir, tmp_path):
    """Re-delivered events (same file content dropped twice, consumed in
    separate micro-batches) collapse to one row per event_id, matching
    batch dropDuplicates — the dedup horizon exceeds the data span so no
    state is evicted mid-test."""
    from financial_data_warehouse_automation_spark.streaming.pipeline import dedup_events_stream
    from financial_data_warehouse_automation_spark.tables import load_table

    events = load_table(spark, sf_dir, "events").where(F.col("user_id") < 20)
    src = str(tmp_path / "events_src")
    events.coalesce(1).write.mode("append").parquet(src)
    events.coalesce(1).write.mode("append").parquet(src)  # re-delivery

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        dedup_events_stream(stream, within="40 days")
        .writeStream.format("memory")
        .queryName("dedup")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_stream = spark.sql("SELECT count(*) AS n FROM dedup").collect()[0].n
    ids_stream = spark.sql(
        "SELECT count(DISTINCT event_id) AS n FROM dedup"
    ).collect()[0].n
    n_batch = events.dropDuplicates(["event_id"]).count()
    assert n_stream == ids_stream == n_batch
    assert n_batch > 0


@pytest.mark.parametrize("provider", ["hdfs", "rocksdb"])
def test_stateful_sessionize_stream_equals_batch(
    spark, sf_dir, tmp_path, provider
):
    """applyInPandasWithState sessionizer vs the batch lag+cumsum query:
    state carries open sessions across micro-batches, so the final
    (closed ∪ last-open-snapshot) set must equal batch sessionization
    run over all the data at once. Parametrized over BOTH state-store
    providers: the default HDFS-backed store and RocksDB — the
    provider a 100 TB deployment runs (state spills off-heap instead
    of living in executor JVM memory), exercised here so the repo's
    canonical stateful operator is known-good on it."""
    from pyspark.sql import Window

    from financial_data_warehouse_automation_spark.streaming.pipeline import sessionize_stream
    from financial_data_warehouse_automation_spark.tables import load_table

    key = "spark.sql.streaming.stateStore.providerClass"
    old = spark.conf.get(key)
    if provider == "rocksdb":
        spark.conf.set(
            key,
            "org.apache.spark.sql.execution.streaming.state."
            "RocksDBStateStoreProvider",
        )

    events = load_table(spark, sf_dir, "events").where(F.col("user_id") < 40)
    # two chronological files → two micro-batches splitting sessions
    cut = events.agg(
        F.expr("percentile_approx(unix_micros(ts), 0.5)")
    ).collect()[0][0]
    src = str(tmp_path / "events_src")
    events.where(F.unix_micros("ts") <= cut).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    events.where(F.unix_micros("ts") > cut).coalesce(1).write.mode(
        "append"
    ).parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    try:
        q = (
            sessionize_stream(stream)
            .writeStream.format("memory")
            .queryName(f"sess_{provider}")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set(key, old)

    emitted = spark.sql(f"SELECT * FROM sess_{provider}")
    # closed sessions, plus the final snapshot of each still-open one
    # (an open session re-emitted in a later batch supersedes earlier
    # snapshots — same (user, start), larger n_events)
    w = Window.partitionBy("user_id", "session_start").orderBy(
        F.desc("n_events"), F.desc("closed")
    )
    final = (
        emitted.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("user_id", "session_start", "session_end", "n_events")
    )

    wb = Window.partitionBy("user_id").orderBy("ts", "event_id")
    wrun = wb.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    prev = F.lag("ts").over(wb)
    is_new = F.when(
        prev.isNull()
        | (F.unix_micros("ts") - F.unix_micros(prev) > 1800 * 1_000_000),
        1,
    ).otherwise(0)
    batch = (
        events.withColumn("is_new", is_new)
        .withColumn("sid", F.sum("is_new").over(wrun))
        .groupBy("user_id", "sid")
        .agg(
            F.min(F.unix_micros("ts")).alias("session_start"),
            F.max(F.unix_micros("ts")).alias("session_end"),
            F.count(F.lit(1)).alias("n_events"),
        )
        .select("user_id", "session_start", "session_end", "n_events")
    )
    got = {tuple(r) for r in final.collect()}
    expected = {tuple(r) for r in batch.collect()}
    assert got == expected


def test_stream_static_enrichment_equals_batch(spark, sf_dir, tmp_path):
    """Stream-static dim join: streamed events enriched with the
    customer segment must equal the same join run in batch."""
    from financial_data_warehouse_automation_spark.streaming.pipeline import (
        enrich_events_stream,
    )
    from financial_data_warehouse_automation_spark.tables import load_table

    events = load_table(spark, sf_dir, "events").where(F.col("event_id") < 500)
    # drop some dim keys so the left join exercises both the matched
    # and the UNKNOWN (dim-less) path
    customer = load_table(spark, sf_dir, "customer").where(
        F.col("c_custkey") % 7 != 0
    )
    src = str(tmp_path / "events_src")
    events.write.parquet(src)

    stream = spark.readStream.schema(events.schema).parquet(src)
    q = (
        enrich_events_stream(stream, customer)
        .writeStream.format("memory")
        .queryName("enriched")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    got = {
        (r.event_id, r.segment)
        for r in spark.sql("SELECT event_id, segment FROM enriched").collect()
    }
    expected = {
        (r.event_id, r.segment)
        for r in enrich_events_stream(events, customer).collect()
    }
    assert len(got) == events.count()
    assert got == expected
    # the fixture guarantees both matched and UNKNOWN (dim-less) rows
    assert any(s == "UNKNOWN" for _, s in got)
    assert any(s != "UNKNOWN" for _, s in got)


def test_stream_mv_refresh_multibatch_and_retry_idempotent(
    spark, sf_dir, tmp_path
):
    """The MV merge must (a) reconstruct the full batch aggregate when
    the stream arrives as MANY micro-batches, and (b) be a no-op when a
    batch is re-applied with the same batch_id (foreachBatch retry
    semantics) — the double-count hazard the last_batch_id guard
    exists for."""
    from financial_data_warehouse_automation_spark.streaming.pipeline import (
        mv_merge_batch,
        run_event_mv_refresh,
    )
    from financial_data_warehouse_automation_spark.tables import load_table

    events = load_table(spark, sf_dir, "events")
    # split the source into 5 files so availableNow sees >=1 batches
    # with maxFilesPerTrigger=1 forcing one batch per file
    src_dir = str(tmp_path / "ev_parts")
    events.repartition(5).write.parquet(src_dir)
    stream = (
        spark.readStream.schema(spark.read.parquet(src_dir).schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    mv_path = str(tmp_path / "mv")
    q = run_event_mv_refresh(spark, stream, mv_path, str(tmp_path / "ckpt"))
    q.awaitTermination()

    mv = spark.read.parquet(mv_path)
    want = (
        events.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias(
                "cents"
            ),
        )
    )
    got = {
        (r.event_type, r.day): (r.n_events, r.cents) for r in mv.collect()
    }
    exp = {
        (r.event_type, r.day): (r.n_events, r.cents) for r in want.collect()
    }
    assert got == exp
    # multiple batches actually ran (one per file)
    assert mv.agg(F.max("last_batch_id")).collect()[0][0] >= 4

    # retry: re-apply the LAST batch id with a slice of the data — the
    # guard must skip every month it already merged at that id
    before = got
    last_id = mv.agg(F.max("last_batch_id")).collect()[0][0]
    mv_merge_batch(mv_path)(events.limit(500), last_id)
    after = {
        (r.event_type, r.day): (r.n_events, r.cents)
        for r in spark.read.parquet(mv_path).collect()
    }
    assert after == before, "same-batch-id re-application must be a no-op"

    # a NEW batch id with new rows must still merge (the guard is not a
    # permanent freeze)
    one_day = events.limit(100)
    add = one_day.groupBy().count().collect()[0][0]
    mv_merge_batch(mv_path)(one_day, last_id + 1)
    total_after = sum(
        v[0] for v in (
            (r.n_events,) for r in spark.read.parquet(mv_path).collect()
        )
    )
    assert total_after == sum(v[0] for v in before.values()) + add


def test_stream_left_outer_join_multibatch_equals_batch(spark, sf_dir, tmp_path):
    """LEFT OUTER stream-stream join across MULTIPLE micro-batches:
    unmatched clicks must surface as NULL rows exactly when the global
    watermark passes their match window — splitting the source into
    chronological files forces the watermark to advance batch by batch,
    so eviction (not end-of-stream cleanup) produces the NULL rows.
    Within the terminal-watermark boundary the drained output must
    equal the batch left join row-for-row."""
    from financial_data_warehouse_automation_spark.tables import load_table

    events = load_table(spark, sf_dir, "events").where(F.col("user_id") < 40)
    src = str(tmp_path / "ev_lj_src")
    ts_us = F.unix_micros("ts")
    cuts = events.agg(
        F.expr("percentile_approx(unix_micros(ts), array(0.33, 0.66))")
    ).collect()[0][0]
    events.where(ts_us <= cuts[0]).coalesce(1).write.mode("append").parquet(src)
    events.where((ts_us > cuts[0]) & (ts_us <= cuts[1])).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    events.where(ts_us > cuts[1]).coalesce(1).write.mode("append").parquet(src)

    stream = (
        spark.readStream.schema(events.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    clicks = (
        stream.where(F.col("event_type") == "click")
        .select(
            F.col("event_id").alias("click_id"),
            "user_id",
            F.col("ts").alias("click_ts"),
        )
        .withWatermark("click_ts", "1 hour")
    )
    purchases = (
        stream.where(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"),
            F.col("user_id").alias("p_user"),
            F.col("ts").alias("purchase_ts"),
        )
        .withWatermark("purchase_ts", "1 hour")
    )
    joined = clicks.join(
        purchases,
        F.expr(
            "user_id = p_user AND purchase_ts >= click_ts "
            "AND purchase_ts <= click_ts + interval 30 minutes"
        ),
        "left_outer",
    ).select("click_id", "purchase_id", "click_ts")
    q = (
        joined.writeStream.format("memory")
        .queryName("lj_mb")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()

    wm = events.agg(
        (
            F.least(
                F.max(F.when(F.col("event_type") == "click", F.col("ts"))),
                F.max(F.when(F.col("event_type") == "purchase", F.col("ts"))),
            )
            - F.expr("INTERVAL 1 HOUR")
        ).alias("w")
    ).collect()[0][0]

    drained = spark.table("lj_mb")
    got = {
        (r.click_id, r.purchase_id)
        for r in drained.where(
            F.col("purchase_id").isNotNull()
            | (
                F.col("click_ts") + F.expr("INTERVAL 30 MINUTES")
                <= F.lit(wm) - F.expr("INTERVAL 1 MINUTE")
            )
        ).collect()
    }

    c = events.where(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"),
        F.col("user_id").alias("cu"),
        F.col("ts").alias("cts"),
    )
    p = events.where(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        F.col("user_id").alias("pu"),
        F.col("ts").alias("pts"),
    )
    batch = c.join(
        p,
        (F.col("cu") == F.col("pu"))
        & (F.col("pts") >= F.col("cts"))
        & (F.col("pts") <= F.col("cts") + F.expr("INTERVAL 30 MINUTES")),
        "left",
    )
    expected = {
        (r.click_id, r.purchase_id)
        for r in batch.where(
            F.col("purchase_id").isNotNull()
            | (
                F.col("cts") + F.expr("INTERVAL 30 MINUTES")
                <= F.lit(wm) - F.expr("INTERVAL 1 MINUTE")
            )
        ).collect()
    }
    assert got == expected
    # the multi-batch split actually produced evicted NULL rows
    assert any(p is None for _, p in got)


def test_transform_with_state_user_stats_equals_batch(spark, sf_dir, tmp_path):
    """transformWithStateInPandas (Spark 4 arbitrary-stateful API):
    the last emission per user must equal the batch per-user aggregate.
    The API's Python runner needs protobuf; where it is absent this
    XFAILS (visible in the report, unlike a skip) rather than passing
    vacuously. The canonical stateful path in this repo is the
    applyInPandasWithState sessionizer (streaming/pipeline.py), which
    covers the same arbitrary-state semantics with a driver-green
    record and no extra dependency; transformWithState is the breadth
    twin for Spark-4-native state TTL/timers."""
    from financial_data_warehouse_automation_spark.streaming.pipeline import (
        _tws_available,
        user_stats_tws,
    )

    if not _tws_available():
        pytest.xfail("google.protobuf not installed: transformWithState "
                     "Python runner unavailable in this environment")

    from financial_data_warehouse_automation_spark.tables import load_table

    events = load_table(spark, sf_dir, "events").where(F.col("user_id") < 50)
    src = str(tmp_path / "tws_src")
    events.coalesce(1).write.mode("append").parquet(src)
    stream = spark.readStream.schema(events.schema).parquet(src)

    old = spark.conf.get("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    try:
        q = (
            user_stats_tws(stream)
            .writeStream.format("memory")
            .queryName("tws_stats")
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        spark.conf.set("spark.sql.streaming.stateStore.providerClass", old)

    final = (
        spark.table("tws_stats")
        .groupBy("user_id")
        .agg(F.max_by(F.struct("n_events", "cents", "n_purchases"), "n_events").alias("s"))
        .select("user_id", "s.*")
    )
    got = {tuple(r) for r in final.collect()}
    want = {
        tuple(r)
        for r in events.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("cents"),
            F.sum(
                F.when(F.col("event_type") == "purchase", 1).otherwise(0)
            ).alias("n_purchases"),
        )
        .collect()
    }
    assert got == want

def test_watermark_drops_late_rows_and_accounts_for_them(spark, tmp_path):
    """Late-data semantics pinned end to end. Spark drops a late row
    only once its window's state has been EVICTED (a row arriving late
    while the window is still live merges in — allowed lateness), so
    the scenario needs three ordered micro-batches: fill a window,
    advance the watermark past it (finalizing+evicting it), then send
    a row for the dead window. That row must be (a) excluded from the
    emitted aggregate and (b) visible in numRowsDroppedByWatermark —
    silent late-drop is the classic streaming surprise, so the repo
    pins that the drop is both real and observable."""
    import json as _json
    import time

    from financial_data_warehouse_automation_spark.streaming.pipeline import (
        event_window_counts_stream,
    )

    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double"
    )
    # The watermark computed from batch N's max event time is APPLIED
    # during batch N+1, and eviction also happens during a batch — so
    # the evicting batch and the late arrival must be SEPARATE batches:
    files = [
        # batch 0: the 12:00-12:15 window gets 3 events
        [(i, f"2024-03-01 12:{m:02d}:00") for i, m in enumerate([0, 5, 10])],
        # batch 1: 13:00 events; wm is still 11:40 during this batch,
        # 12:35 is computed at its end
        [(10, "2024-03-01 13:00:00"), (11, "2024-03-01 13:05:00")],
        # batch 2: runs WITH wm=12:35 -> evicts+emits the 12:00 window
        [(12, "2024-03-01 13:10:00")],
        # batch 3: late row for the now-dead window -> dropped+counted
        [(99, "2024-03-01 12:05:00")],
    ]
    src = str(tmp_path / "late_src")
    for rows in files:
        (
            spark.createDataFrame(
                [(e, t, 1, "click", 1.0) for e, t in rows],
                "event_id long, ts string, user_id long, "
                "event_type string, value double",
            )
            .withColumn("ts", F.to_timestamp("ts"))
            .select("event_id", "ts", "user_id", "event_type", "value")
            .coalesce(1)
            .write.mode("append")
            .parquet(src)
        )
        time.sleep(1.1)  # distinct mtimes: file order = batch order

    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        event_window_counts_stream(stream)
        .writeStream.format("memory")
        .queryName("late_counts")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    dropped = sum(
        op.get("numRowsDroppedByWatermark", 0)
        for p in q.recentProgress
        for op in _json.loads(p.json).get("stateOperators", [])
    )
    assert dropped == 1, f"late row not dropped by watermark (dropped={dropped})"

    emitted = {
        r.bucket_start: r.n_events
        for r in spark.sql("SELECT * FROM late_counts").collect()
    }
    # 2024-03-01 12:00:00 UTC; the late 12:05 row must NOT be in it
    assert emitted.get(1709294400) == 3, emitted


def test_doc_dedup_state_multibatch_min_takeover_and_retry(
    spark, sf_dir, tmp_path
):
    """The dedup-state merge must (a) reconstruct the full GROUP BY
    (min, count) aggregate when documents arrive as MANY micro-batches
    in an order where a LATER batch carries a smaller doc_id for an
    already-stored key (the min-takeover an insert-only first-writer
    table gets wrong), and (b) be a no-op on same-batch-id
    re-application — re-merging would double n_copies."""
    from financial_data_warehouse_automation_spark.operators.text import norm_text
    from financial_data_warehouse_automation_spark.streaming.pipeline import (
        dedup_state_merge_batch,
    )
    from financial_data_warehouse_automation_spark.tables import load_table

    base = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    # the sf0.001 corpus has no exact dups under norm_text — synthesize
    # copies of the 5 LOWEST ids at ids above the whole corpus, so the
    # descending split below delivers each copy in batch 0 and its
    # original (the true min) in the LAST batch: the takeover path, not
    # just the insert path, is what reconstructs the aggregate
    dups = base.orderBy("doc_id").limit(5).withColumn(
        "doc_id", F.col("doc_id") + 1_000_000
    )
    docs = base.unionByName(dups)
    state = str(tmp_path / "dedup_state")
    merge = dedup_state_merge_batch(state)
    # batches DESCENDING by doc_id: every key whose copies span batches
    # gets its min delivered last
    n = docs.count()
    cuts = [2 * n // 3, n // 3, -1]
    prev = None
    for bid, lo in enumerate(cuts):
        batch = docs.where(F.col("doc_id") > lo)
        if prev is not None:
            batch = batch.where(F.col("doc_id") <= prev)
        prev = lo
        merge(batch, bid)
    got = {
        (r.dedup_key): (r.kept_doc_id, r.n_copies)
        for r in spark.read.parquet(state).collect()
    }
    want = {
        r.dedup_key: (r.kept_doc_id, r.n_copies)
        for r in docs.select(
            F.md5(norm_text("text").cast("binary")).alias("dedup_key"),
            "doc_id",
        )
        .groupBy("dedup_key")
        .agg(
            F.min("doc_id").alias("kept_doc_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
        .collect()
    }
    assert got == want
    # the split really exercised cross-batch keys (some key's copies
    # arrived in different batches) — otherwise the test proves nothing
    assert any(c > 1 for _, c in got.values())

    # retry with the last batch id: must be a no-op for every bucket
    merge(docs.limit(50), len(cuts) - 1)
    after = {
        (r.dedup_key): (r.kept_doc_id, r.n_copies)
        for r in spark.read.parquet(state).collect()
    }
    assert after == got, "same-batch-id re-application must be a no-op"

    # a NEW batch id with a duplicate of an existing doc must bump
    # n_copies by exactly one and keep the min
    one = docs.orderBy("doc_id").limit(1)
    key = one.select(
        F.md5(norm_text("text").cast("binary")).alias("k")
    ).collect()[0].k
    merge(one.withColumn("doc_id", F.col("doc_id") + 10_000_000), len(cuts))
    final = {
        r.dedup_key: (r.kept_doc_id, r.n_copies)
        for r in spark.read.parquet(state).collect()
    }
    assert final[key] == (got[key][0], got[key][1] + 1)
    assert {k: v for k, v in final.items() if k != key} == {
        k: v for k, v in got.items() if k != key
    }


def test_doc_dedup_state_property_any_split(spark, tmp_path):
    """Property (hypothesis): for ANY corpus of (doc_id, text) rows —
    duplicate texts, duplicate-free, singletons — and ANY ordered
    partition of it into micro-batches, folding the batches through
    dedup_state_merge_batch yields exactly the one-shot
    GROUP BY (min doc_id, count) state. This is the monoid claim the
    docstring makes, checked mechanically rather than on curated
    shapes."""
    import shutil

    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from financial_data_warehouse_automation_spark.operators.text import norm_text
    from financial_data_warehouse_automation_spark.streaming.pipeline import (
        dedup_state_merge_batch,
    )

    texts = st.sampled_from(
        ["alpha beta", "Alpha  Beta!", "gamma", "delta epsilon zeta", "eta"]
    )
    corpora = st.lists(texts, min_size=1, max_size=10).flatmap(
        lambda ts: st.permutations(list(enumerate(ts))).flatmap(
            lambda rows: st.lists(
                st.integers(min_value=1, max_value=max(len(rows), 1)),
                min_size=0, max_size=3,
            ).map(lambda cut_sizes: (rows, cut_sizes))
        )
    )

    run_id = [0]

    @settings(max_examples=6, deadline=None,
              suppress_health_check=[HealthCheck.function_scoped_fixture])
    @given(corpora)
    def run(case):
        rows, cut_sizes = case
        run_id[0] += 1
        state = str(tmp_path / f"st_{run_id[0]}")
        shutil.rmtree(state, ignore_errors=True)
        merge = dedup_state_merge_batch(state)
        df = spark.createDataFrame(rows, "doc_id long, text string")
        # split rows into batches by the generated cut sizes (remainder
        # = final batch); empty cut list = single batch
        batches, rest = [], rows
        for c in cut_sizes:
            batches.append(rest[:c])
            rest = rest[c:]
        batches.append(rest)
        for bid, b in enumerate(x for x in batches if x):
            merge(
                spark.createDataFrame(b, "doc_id long, text string"), bid
            )
        got = {
            r.dedup_key: (r.kept_doc_id, r.n_copies)
            for r in spark.read.parquet(state).collect()
        }
        want = {
            r.dedup_key: (r.kept_doc_id, r.n_copies)
            for r in df.select(
                F.md5(norm_text("text").cast("binary")).alias("dedup_key"),
                "doc_id",
            )
            .groupBy("dedup_key")
            .agg(
                F.min("doc_id").alias("kept_doc_id"),
                F.count(F.lit(1)).alias("n_copies"),
            )
            .collect()
        }
        assert got == want

    run()


def test_doc_dedup_state_bucket_width_shrinks_rewrite(spark, sf_dir, tmp_path):
    """bucket_width is the documented 100 TB knob ("widen the prefix to
    2-3 hex chars so a rewrite touches key ranges") — now a parameter,
    not prose. Two properties: (a) the terminal state is identical at
    width 1 and width 2 (the partitioning is an implementation detail
    of the merge, invisible in values); (b) a small delta batch merged
    into an existing state REWRITES strictly fewer pre-existing rows at
    width 2 — dynamic partition overwrite rewrites whole touched
    buckets, and 256-way buckets hold ~1/16th the rows of 16-way ones,
    so the touched fraction of state shrinks even though the touched
    bucket COUNT may grow."""
    from financial_data_warehouse_automation_spark.operators.text import norm_text
    from financial_data_warehouse_automation_spark.streaming.pipeline import (
        dedup_state_merge_batch,
    )
    from financial_data_warehouse_automation_spark.tables import load_table

    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    delta_ids = [r.doc_id for r in docs.orderBy("doc_id").limit(3).collect()]
    delta = docs.where(F.col("doc_id").isin(delta_ids))
    base = docs.where(~F.col("doc_id").isin(delta_ids))

    terminal, rewritten = {}, {}
    for width in (1, 2):
        state = str(tmp_path / f"state_w{width}")
        merge = dedup_state_merge_batch(state, bucket_width=width)
        merge(base, 0)
        stored = spark.read.parquet(state)
        touched = [
            r.b
            for r in delta.select(
                F.substring(
                    F.md5(norm_text("text").cast("binary")), 1, width
                ).alias("b")
            )
            .distinct()
            .collect()
        ]
        rewritten[width] = stored.where(F.col("bucket").isin(touched)).count()
        merge(delta, 1)
        terminal[width] = sorted(
            (r.dedup_key, r.kept_doc_id, r.n_copies)
            for r in spark.read.parquet(state).collect()
        )
    assert terminal[1] == terminal[2]
    assert 0 < rewritten[2] < rewritten[1]


def test_kmv_state_split_invariant_and_replay_idempotent(spark, sf_dir, tmp_path):
    """kmv_state_merge_batch's semilattice claims, exercised directly:
    (a) two different micro-batch arrangements of the same events give
    byte-identical terminal state; (b) re-applying an already-folded
    batch (foreachBatch retry semantics) changes nothing — the reason
    this state, unlike the (min,count) dedup state, carries no
    last_batch_id guard; and (c) the terminal state IS the batch
    bottom-k per day."""
    from pyspark.sql import Window

    from financial_data_warehouse_automation_spark.functions.scalars import md5_prefix_int
    from financial_data_warehouse_automation_spark.streaming.pipeline import (
        kmv_state_merge_batch,
    )
    from financial_data_warehouse_automation_spark.tables import load_table

    k = 8  # small k so the cap is exercised on the test corpus
    events = load_table(spark, sf_dir, "events").select("ts", "user_id")

    def terminal(state_path, splits):
        apply = kmv_state_merge_batch(str(state_path), k=k)
        for i, part in enumerate(splits):
            apply(part, i)
        rows = (
            spark.read.schema("h long, day string")
            .parquet(str(state_path))
            .collect()
        )
        return sorted((r.day, r.h) for r in rows)

    s1 = terminal(tmp_path / "s1", [events])  # one batch
    by_parity = [
        events.where(F.col("user_id") % 2 == p) for p in (0, 1)
    ]
    s2 = terminal(tmp_path / "s2", by_parity)  # two skewed batches
    assert s1 == s2

    # replay: fold the full corpus AGAIN onto s1's state — no change
    apply = kmv_state_merge_batch(str(tmp_path / "s1"), k=k)
    apply(events, 99)
    s1_replayed = sorted(
        (r.day, r.h)
        for r in spark.read.schema("h long, day string")
        .parquet(str(tmp_path / "s1"))
        .collect()
    )
    assert s1_replayed == s1

    # terminal state == batch-computed per-day bottom-k
    dh = events.select(
        F.date_format(F.to_date("ts"), "yyyy-MM-dd").alias("day"),
        md5_prefix_int(
            F.col("user_id").cast("string").cast("binary")
        ).alias("h"),
    ).distinct()
    w = Window.partitionBy("day").orderBy("h")
    want = sorted(
        (r.day, r.h)
        for r in dh.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= k)
        .collect()
    )
    assert s1 == want
