"""Source-format breadth: the engine reads the same relation from
parquet, CSV, JSON-lines, and ORC with identical results.

Scale discipline: every non-parquet read supplies an explicit schema —
schema inference is a full extra pass over the data (CSV/JSON) and is
never acceptable at 100 TB. Parquet/ORC carry their schema in file
metadata; CSV additionally pins header+timestamp format so round-trips
are lossless.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_data_warehouse_automation_spark.tables import load_table


def _canon(df):
    """Order-insensitive canonical form: sorted list of row tuples."""
    cols = sorted(df.columns)
    return sorted(tuple(r) for r in df.select(*cols).collect())


def test_csv_json_orc_round_trip_equal_parquet(spark, sf_dir, tmp_path):
    src = load_table(spark, sf_dir, "lineitem").limit(2000)
    # decimals/dates/strings all present; cache so every sink sees the
    # same rows even though limit() without order is nondeterministic
    src = src.cache()
    expected = _canon(src)

    csv_dir = str(tmp_path / "csv")
    json_dir = str(tmp_path / "json")
    orc_dir = str(tmp_path / "orc")
    src.write.option("header", True).csv(csv_dir)
    src.write.json(json_dir)
    src.write.orc(orc_dir)

    got_csv = spark.read.schema(src.schema).option("header", True).csv(csv_dir)
    got_json = spark.read.schema(src.schema).json(json_dir)
    got_orc = spark.read.orc(orc_dir)

    assert _canon(got_csv) == expected
    assert _canon(got_json) == expected
    assert _canon(got_orc) == expected
    src.unpersist()


def test_csv_malformed_rows_quarantine(spark, tmp_path):
    """PERMISSIVE mode + columnNameOfCorruptRecord: bad rows land in a
    quarantine column instead of failing the load — the file-level
    equivalent of the ingest quarantine query."""
    p = tmp_path / "raw.csv"
    p.write_text(
        "id,amount\n"
        "1,10.5\n"
        "not_an_int,oops,extra\n"
        "2,20.25\n"
    )
    schema = "id INT, amount DOUBLE, _corrupt STRING"
    df = (
        spark.read.schema(schema)
        .option("header", True)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt")
        .csv(str(p))
    )
    df = df.cache()
    good = df.where(F.col("_corrupt").isNull())
    bad = df.where(F.col("_corrupt").isNotNull())
    assert good.count() == 2
    assert bad.count() == 1
    assert "not_an_int" in bad.collect()[0]._corrupt
    df.unpersist()


def test_orc_predicate_pushdown(spark, sf_dir, tmp_path):
    """ORC scans take pushed filters just like parquet — the plan shows
    the predicate at the scan node."""
    src = load_table(spark, sf_dir, "orders").limit(5000)
    orc_dir = str(tmp_path / "orders_orc")
    src.write.orc(orc_dir)
    q = spark.read.orc(orc_dir).where(F.col("o_orderkey") == 42).select("o_orderkey")
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [IsNotNull(o_orderkey), EqualTo(o_orderkey,42)]" in plan


def test_custom_python_datasource_partitions_and_content(spark):
    """The Spark-4 Python DataSource (sources/linegen.py): partition
    planning must be respected (numpartitions option -> that many input
    partitions), ranges must tile [0, rows) exactly, and content must
    be deterministic across reads."""
    import hashlib

    from financial_data_warehouse_automation_spark.sources.linegen import LineGenDataSource

    try:
        spark.dataSource.register(LineGenDataSource)
    except Exception:
        pass
    df = (
        spark.read.format("linegen")
        .option("rows", 1000)
        .option("numpartitions", 5)
        .load()
    )
    assert df.rdd.getNumPartitions() == 5
    rows = df.collect()
    assert len(rows) == 1000
    assert sorted(r.i for r in rows) == list(range(1000))
    probe = next(r for r in rows if r.i == 123)
    assert probe.key == hashlib.md5(b"123").hexdigest()
    assert abs(probe.amount - 1.23) < 1e-12
    # second read: identical relation (no hidden state)
    again = spark.read.format("linegen").option("rows", 1000).option(
        "numpartitions", 5
    ).load()
    assert sorted(map(tuple, again.collect())) == sorted(map(tuple, rows))


def test_custom_python_datasource_streaming_offsets(spark, tmp_path):
    """The streaming flavor (SimpleDataSourceStreamReader): micro-batches
    advance the checkpointed offset by batchrows until maxrows, the
    drained result is exactly [0, maxrows) with deterministic content,
    and readBetweenOffsets replays any range identically (the
    exactly-once replay contract)."""
    import time

    from financial_data_warehouse_automation_spark.sources.linegen import (
        LineGenDataSource,
        LineGenStreamReader,
    )

    try:
        spark.dataSource.register(LineGenDataSource)
    except Exception:
        pass
    stream = (
        spark.readStream.format("linegen")
        .option("batchrows", 100)
        .option("maxrows", 550)
        .load()
    )
    q = (
        stream.writeStream.format("memory")
        .queryName("linegen_stream")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            if spark.table("linegen_stream").count() >= 550:
                break
            time.sleep(0.5)
        rows = spark.table("linegen_stream").collect()
    finally:
        q.stop()
        q.awaitTermination()
    assert sorted(r.i for r in rows) == list(range(550))
    # at least ceil(550/100) = 6 distinct micro-batches ran
    assert len(rows) == 550

    # replay contract: identical rows for the same offset range
    r1 = list(LineGenStreamReader({}).readBetweenOffsets({"i": 40}, {"i": 60}))
    r2 = list(LineGenStreamReader({}).readBetweenOffsets({"i": 40}, {"i": 60}))
    assert r1 == r2 and len(r1) == 20 and r1[0][0] == 40


def test_linegen_filter_pushdown_narrows_planned_partitions():
    """pushFilters must consume i-range predicates (the planner then
    splits only the narrowed range — zero out-of-range rows are ever
    generated) and hand every other filter back to Spark."""
    from pyspark.sql.datasource import (
        EqualTo,
        GreaterThanOrEqual,
        LessThan,
        StringStartsWith,
    )

    from financial_data_warehouse_automation_spark.sources.linegen import LineGenReader

    r = LineGenReader({"rows": "20000", "numpartitions": "4"})
    leftover = r.pushFilters([
        GreaterThanOrEqual(("i",), 5000),
        LessThan(("i",), 15000),
        StringStartsWith(("key",), "a"),
    ])
    assert [type(f).__name__ for f in leftover] == ["StringStartsWith"]
    parts = r.partitions()
    assert parts[0].start == 5000 and parts[-1].end == 15000
    covered = sum(p.end - p.start for p in parts)
    assert covered == 10000  # contiguous, nothing outside the range

    # equality collapses to a single id
    r2 = LineGenReader({"rows": "100", "numpartitions": "4"})
    assert r2.pushFilters([EqualTo(("i",), 42)]) == []
    p2 = r2.partitions()
    assert sum(p.end - p.start for p in p2) == 1 and p2[0].start == 42

    # contradictory range -> empty plan, not a crash
    r3 = LineGenReader({"rows": "100", "numpartitions": "4"})
    r3.pushFilters([GreaterThanOrEqual(("i",), 90), LessThan(("i",), 10)])
    assert sum(p.end - p.start for p in r3.partitions()) == 0


def test_rowsink_commit_protocol(spark, tmp_path):
    """The writer's two-phase commit, observed directly: temps never
    survive a committed job, part files + _SUCCESS manifest totals
    reconcile with the input, and overwrite clears the previous job's
    parts instead of accumulating."""
    import json
    import os

    from financial_data_warehouse_automation_spark.sources.rowsink import RowSinkDataSource

    try:
        spark.dataSource.register(RowSinkDataSource)
    except Exception:
        pass
    d = str(tmp_path / "sink")
    df = spark.range(100).select(
        F.col("id"), F.concat(F.lit("k"), F.col("id")).alias("k")
    ).repartition(4)
    df.write.format("rowsink").option("path", d).mode("overwrite").save()
    names = sorted(os.listdir(d))
    parts = [n for n in names if n.startswith("part-")]
    assert not [n for n in names if n.startswith("_tmp-")]
    assert "_SUCCESS" in names
    manifest = json.load(open(os.path.join(d, "_SUCCESS")))
    assert manifest["total"] == 100
    assert sum(manifest["files"].values()) == 100
    assert set(manifest["files"]) == set(parts)
    n_lines = 0
    for p in parts:
        with open(os.path.join(d, p)) as f:
            n_lines += sum(1 for _ in f)
    assert n_lines == 100

    # overwrite: a second job replaces, never accumulates
    df.limit(10).write.format("rowsink").option("path", d).mode(
        "overwrite"
    ).save()
    manifest2 = json.load(open(os.path.join(d, "_SUCCESS")))
    assert manifest2["total"] == 10
    parts2 = [n for n in os.listdir(d) if n.startswith("part-")]
    assert set(parts2) == set(manifest2["files"])
    assert not (set(parts2) & set(parts))


def test_rowsink_append_merges_manifest(tmp_path):
    """Append mode must carry the prior jobs' file map forward in the
    rewritten _SUCCESS so manifest files/totals keep reconciling with
    the directory (r10 advisor: the r10 writer dropped prior entries,
    orphaning earlier parts from the manifest)."""
    import json
    import os

    from pyspark.sql.types import LongType, StructField, StructType

    from financial_data_warehouse_automation_spark.sources.rowsink import RowSinkWriter

    d = str(tmp_path / "sink")
    os.makedirs(d)
    schema = StructType([StructField("id", LongType())])
    w1 = RowSinkWriter({"path": d}, schema, overwrite=False)
    w1.commit([w1.write(iter([(1,), (2,)]))])
    w2 = RowSinkWriter({"path": d}, schema, overwrite=False)
    w2.commit([w2.write(iter([(3,)]))])
    manifest = json.load(open(os.path.join(d, "_SUCCESS")))
    parts = [n for n in os.listdir(d) if n.startswith("part-")]
    assert len(parts) == 2
    assert set(manifest["files"]) == set(parts)
    assert manifest["total"] == 3
    # and overwrite still resets rather than merging
    w3 = RowSinkWriter({"path": d}, schema, overwrite=True)
    w3.commit([w3.write(iter([(9,)]))])
    manifest3 = json.load(open(os.path.join(d, "_SUCCESS")))
    assert manifest3["total"] == 1
    assert len(manifest3["files"]) == 1


def test_rowsink_append_corrupt_success_raises(tmp_path):
    """Append mode may treat only a MISSING _SUCCESS as 'fresh dir'; a
    corrupt one must raise instead of silently starting a new manifest
    that orphans every earlier part (r11 advisor: the r10 fix's
    swallowed ValueError reopened the same reconciliation hole)."""
    import json
    import os

    import pytest as _pytest
    from pyspark.sql.types import LongType, StructField, StructType

    from financial_data_warehouse_automation_spark.sources.rowsink import RowSinkWriter

    d = str(tmp_path / "sink")
    os.makedirs(d)
    schema = StructType([StructField("id", LongType())])
    w1 = RowSinkWriter({"path": d}, schema, overwrite=False)
    w1.commit([w1.write(iter([(1,), (2,)]))])
    with open(os.path.join(d, "_SUCCESS"), "w") as f:
        f.write("{not json")
    w2 = RowSinkWriter({"path": d}, schema, overwrite=False)
    msg = w2.write(iter([(3,)]))
    with _pytest.raises(ValueError):
        w2.commit([msg])
    # the prior committed part is untouched by the refused commit
    parts = [n for n in os.listdir(d) if n.startswith("part-")]
    assert len(parts) == 1
    # a fresh dir (no _SUCCESS at all) still appends from empty
    d2 = str(tmp_path / "sink2")
    os.makedirs(d2)
    w3 = RowSinkWriter({"path": d2}, schema, overwrite=False)
    w3.commit([w3.write(iter([(7,)]))])
    assert json.load(open(os.path.join(d2, "_SUCCESS")))["total"] == 1


def test_rowsink_missing_path_raises_valueerror(tmp_path):
    """A missing 'path' option must surface as the rowsink ValueError,
    not makedirs('') -> FileNotFoundError (r10 advisor)."""
    import pytest as _pytest
    from pyspark.sql.types import LongType, StructField, StructType

    from financial_data_warehouse_automation_spark.sources.rowsink import RowSinkDataSource

    schema = StructType([StructField("id", LongType())])
    ds = RowSinkDataSource(options={})
    with _pytest.raises(ValueError, match="path"):
        ds.writer(schema, overwrite=False)
    with _pytest.raises(ValueError, match="path"):
        ds.streamWriter(schema, overwrite=False)


def test_rowsink_abort_removes_temps(tmp_path):
    """abort() (driver-side, after a task failure) must delete every
    temp the finished tasks produced — a plain-Python exercise of the
    protocol objects, no Spark job needed."""
    import os

    from pyspark.sql.types import LongType, StructField, StructType

    from financial_data_warehouse_automation_spark.sources.rowsink import RowSinkWriter

    d = str(tmp_path / "sink")
    os.makedirs(d)
    w = RowSinkWriter(
        {"path": d},
        StructType([StructField("id", LongType())]),
        overwrite=False,
    )
    msgs = [w.write(iter([(1,), (2,)])), w.write(iter([(3,)])), None]
    assert len([n for n in os.listdir(d) if n.startswith("_tmp-")]) == 2
    w.abort(msgs)
    assert os.listdir(d) == []


def test_rowsink_stream_epoch_replay_idempotent(tmp_path):
    """The streaming sink's exactly-once story: a REPLAYED epoch
    (same batchId, re-run tasks after a partial failure) must
    overwrite its own deterministically-named files and its manifest
    entry, never double-count; an aborted epoch leaves nothing
    visible. Exercised directly on the protocol objects."""
    import json
    import os

    from pyspark.sql.types import LongType, StructField, StructType

    from financial_data_warehouse_automation_spark.sources.rowsink import RowSinkStreamWriter

    d = str(tmp_path / "sink")
    os.makedirs(d)
    w = RowSinkStreamWriter(
        {"path": d}, StructType([StructField("id", LongType())])
    )
    # epoch 0 commits two tasks
    w.commit([w.write(iter([(1,), (2,)])), w.write(iter([(3,)]))], 0)
    m = json.load(open(os.path.join(d, "_SUCCESS")))
    assert m["total"] == 3 and set(m["batches"]) == {"0"}
    # epoch 1 starts, fails, aborts: nothing visible, manifest unchanged
    w.abort([w.write(iter([(9,), (9,)])), None], 1)
    assert not [n for n in os.listdir(d) if n.startswith("_tmp-")]
    m = json.load(open(os.path.join(d, "_SUCCESS")))
    assert m["total"] == 3 and set(m["batches"]) == {"0"}
    # epoch 1 REPLAYS with different task partitioning and commits
    w.commit([w.write(iter([(4,), (5,), (6,)]))], 1)
    m = json.load(open(os.path.join(d, "_SUCCESS")))
    assert m["total"] == 6 and set(m["batches"]) == {"0", "1"}
    # epoch 1 replays AGAIN (driver retry after a commit-side crash):
    # deterministic names overwrite, manifest entry replaced not added
    w.commit([w.write(iter([(4,),])), w.write(iter([(5,), (6,)]))], 1)
    m = json.load(open(os.path.join(d, "_SUCCESS")))
    assert m["total"] == 6 and set(m["batches"]) == {"0", "1"}
    parts = sorted(n for n in os.listdir(d) if n.startswith("part-"))
    n_lines = 0
    vals = []
    for p in parts:
        for ln in open(os.path.join(d, p)):
            vals.append(json.loads(ln)["id"])
            n_lines += 1
    assert n_lines == 6 and sorted(vals) == [1, 2, 3, 4, 5, 6]
