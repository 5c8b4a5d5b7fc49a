"""Invariant tests for the round-4 operator batch, independent of the
DuckDB oracles (which check engine parity, not algorithmic truth):

* embedding_gram_matrix  == numpy X^T X on the quantized matrix
* events_ewma_daily      == pandas recurrence over the daily series
* doc_kl_divergence      >= 0 (Gibbs), and 0 for a single-source corpus
* warehouse_snapshot_diff emits no spurious rows and balances totals
* mv_incremental_refresh == full recompute (merge-vs-rebuild fixed point)
* events_mad_anomalies   rows actually exceed 5x MAD recomputed in pandas
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from financial_data_warehouse_automation_spark.registry import load_all


def _run(spark, sf_dir, name):
    return load_all()[name].builder(spark, sf_dir).toPandas()


def test_gram_matrix_matches_numpy(spark, sf_dir):
    got = _run(spark, sf_dir, "embedding_gram_matrix")
    emb = pd.read_parquet(f"{sf_dir}/embeddings.parquet")
    X = np.stack(emb["embedding"].to_numpy())
    # same quantization: round-half-up milli-units as int64
    Q = np.floor(np.abs(X.astype("float64")) * 1000 + 0.5).astype("int64")
    Q *= np.sign(X).astype("int64")
    G = Q.T @ Q
    assert len(got) == 64 * 65 // 2
    for _, r in got.sample(n=200, random_state=7).iterrows():
        i, j = int(r.dim_i) - 1, int(r.dim_j) - 1
        assert i <= j
        assert int(r.gram_milli) == int(G[i, j]), (i, j)
        assert int(r.n_vecs) == len(emb)


def test_ewma_matches_pandas_recurrence(spark, sf_dir):
    got = _run(spark, sf_dir, "events_ewma_daily")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = ev["ts"].dt.normalize()
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    daily = ev.groupby(["event_type", "day"], as_index=False)["cents"].sum()
    for _, r in got.sample(n=min(50, len(got)), random_state=3).iterrows():
        day = pd.Timestamp(r.day)
        win = daily[
            (daily.event_type == r.event_type)
            & (daily.day <= day)
            & (daily.day >= day - pd.Timedelta(days=7))
        ]
        diffs = (day - win.day).dt.days.to_numpy()
        w = np.left_shift(1, 7 - diffs).astype("int64")
        assert int(r.wsum) == int((w * win.cents.to_numpy()).sum())
        assert int(r.wtot) == int(w.sum())
        assert int(r.n_days) == len(win)


def test_kl_divergence_matches_pandas(spark, sf_dir):
    got = _run(spark, sf_dir, "doc_kl_divergence").set_index("source")
    # Gibbs: KL >= 0 (per-term round-6 can push an exact 0 a hair under)
    assert (got["kl_nats"] >= -1e-4).all(), got
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")
    tok = docs.assign(token=docs["text"].str.strip().str.split(r"\s+")).explode(
        "token"
    )
    st = tok.groupby(["source", "token"]).size().rename("n_st").reset_index()
    n_s = st.groupby("source")["n_st"].transform("sum")
    n_t = st.groupby("token")["n_st"].transform("sum")
    big_n = st["n_st"].sum()
    p, q = st["n_st"] / n_s, n_t / big_n
    st["term"] = (p * np.log(p / q)).round(6)
    kl = st.groupby("source")["term"].sum()
    for src, want in kl.items():
        assert abs(float(got.loc[src, "kl_nats"]) - want) < 1e-6, src


def test_snapshot_diff_balances(spark, sf_dir):
    got = _run(spark, sf_dir, "warehouse_snapshot_diff")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["cents"] = (o["o_totalprice"] * 100).round().astype("int64")
    a = o[o.o_orderdate < "1996-01-01"].groupby("o_custkey")["cents"].agg(
        ["count", "sum"]
    )
    b = o[o.o_orderdate < "1997-01-01"].groupby("o_custkey")["cents"].agg(
        ["count", "sum"]
    )
    # every diff row is a real change, and the deltas reconcile exactly
    assert (got.delta_orders > 0).all()  # orders only ever accumulate
    total_delta = int(got.delta_cents.sum())
    assert total_delta == int(b["sum"].sum() - a["sum"].sum())
    added = set(got[got.change_type == "added"].custkey)
    assert added == set(b.index) - set(a.index)


def test_mv_refresh_equals_rebuild(spark, sf_dir):
    got = _run(spark, sf_dir, "mv_incremental_refresh").set_index(
        ["year", "month"]
    )
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o["cents"] = (o["o_totalprice"] * 100).round().astype("int64")
    full = o.groupby(
        [o.o_orderdate.dt.year.rename("year"), o.o_orderdate.dt.month.rename("month")]
    )["cents"].agg(["count", "sum"])
    assert len(got) == len(full)
    for (y, m), r in full.iterrows():
        assert int(got.loc[(y, m), "n_orders"]) == int(r["count"])
        assert abs(float(got.loc[(y, m), "revenue"]) - r["sum"] / 100.0) < 1e-9


def test_mad_anomalies_exceed_threshold(spark, sf_dir):
    got = _run(spark, sf_dir, "events_mad_anomalies")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    for etype, grp in ev.groupby("event_type"):
        g = grp.sort_values(["value", "event_id"]).reset_index(drop=True)
        med = g["value"].iloc[(len(g) + 1) // 2 - 1]
        adev = (grp["value"] - med).abs().sort_values().reset_index(drop=True)
        mad = adev.iloc[(len(adev) + 1) // 2 - 1]
        sub = got[got.event_type == etype]
        expect = grp[(grp["value"] - med).abs() > 5 * mad]
        assert set(sub.event_id) == set(expect.event_id)
        if len(sub):
            assert (sub.mad_ratio > 5).all()


def test_abc_pareto_partitions_and_shares(spark, sf_dir):
    got = _run(spark, sf_dir, "part_abc_pareto").set_index("abc_class")
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    li["cents"] = (li["l_extendedprice"] * 100).round().astype("int64")
    per_part = li.groupby("l_partkey")["cents"].sum().sort_values(
        ascending=False
    )
    # classes partition the part population and the revenue exactly
    assert int(got["n_parts"].sum()) == per_part.index.nunique()
    assert int(got["class_cents"].sum()) == int(per_part.sum())
    assert abs(float(got["revenue_share"].sum()) - 1.0) < 1e-5
    # the two-pass cumulative must agree with the straightforward one
    cum = per_part.cumsum() / per_part.sum()
    want_a = int((cum <= 0.8).sum())
    assert int(got.loc["A", "n_parts"]) == want_a


def test_hhi_bounds(spark, sf_dir):
    got = _run(spark, sf_dir, "supplier_concentration_hhi")
    # 1/n <= HHI <= 1 for every category
    assert ((got.hhi <= 1.0 + 1e-9) & (got.hhi >= 1.0 / got.n_suppliers - 1e-9)).all()


def test_cusum_matches_sequential_recurrence(spark, sf_dir):
    got = _run(spark, sf_dir, "events_cusum_drift")
    ev = pd.read_parquet(f"{sf_dir}/events.parquet")
    ev["day"] = ev["ts"].dt.normalize()
    ev["cents"] = (ev["value"] * 100).round().astype("int64")
    daily = ev.groupby(["event_type", "day"])["cents"].sum()
    for etype, series in daily.groupby(level=0):
        s = series.droplevel(0).sort_index()
        target = int(s.sum()) // len(s)  # integer-division mean
        c, out = 0, {}
        for day, x in s.items():
            c = max(0, c + (int(x) - target))  # the textbook recurrence
            out[day] = c
        sub = got[got.event_type == etype].set_index("day")
        assert len(sub) == len(out)
        for day, want in out.items():
            assert int(sub.loc[day.date(), "cusum_cents"]) == want, (etype, day)


def test_day_gap_detector_fires_on_manufactured_gap(spark, sf_dir, tmp_path):
    """The production data has no gaps (the query's green state); carve
    three days out of one event type and the detector must report
    exactly that hole."""
    from pyspark.sql import functions as F

    from financial_data_warehouse_automation_spark.registry import load_all
    from financial_data_warehouse_automation_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    days = sorted(
        r.day for r in ev.select(F.to_date("ts").alias("day")).distinct().collect()
    )
    assert len(days) >= 7, "need a week of data to carve a hole"
    hole = set(days[2:5])  # remove 3 consecutive days for one type
    carved = ev.where(
        ~((F.col("event_type") == "click") & F.to_date("ts").isin(list(hole)))
    )
    gap_dir = str(tmp_path / "gapped")
    import os
    os.makedirs(gap_dir, exist_ok=True)
    carved.write.parquet(f"{gap_dir}/events.parquet")

    got = load_all()["events_day_gaps"].builder(spark, gap_dir).toPandas()
    clicks = got[got.event_type == "click"]
    assert len(clicks) == 1
    r = clicks.iloc[0]
    assert r.gap_start == days[1] and r.gap_end == days[5]
    assert int(r.missing_days) == 3
    # other types untouched -> no gaps reported for them
    assert (got.event_type == "click").all()


def test_installments_reconcile_to_order_totals(spark, sf_dir):
    """Every order's 3 installments must sum exactly to its integer-cent
    total (the UDTF's split-with-remainder contract)."""
    got = _run(spark, sf_dir, "orders_installments_udtf")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet")
    o = o[o.o_totalprice >= 400000]
    o["cents"] = (o["o_totalprice"] * 100).round().astype("int64")
    per_order = got.groupby("orderkey")["installment_cents"].agg(["sum", "count"])
    want = o.set_index("o_orderkey")["cents"]
    assert len(per_order) == len(want)
    assert (per_order["count"] == 3).all()
    for k, row in per_order.iterrows():
        assert int(row["sum"]) == int(want.loc[k]), k


def test_approx_percentile_within_rank_error(spark, sf_dir):
    """The approximate-quantile path (percentile_approx, the 100 TB
    dashboard sibling of the exact nearest-rank queries): with accuracy
    parameter A, the returned value's RANK must be within n/A of the
    target rank — the t-digest/GK guarantee the scale story relies on."""
    from pyspark.sql import functions as F

    from financial_data_warehouse_automation_spark.tables import load_table

    o = load_table(spark, sf_dir, "orders")
    acc = 100
    got = o.agg(
        F.percentile_approx("o_totalprice", [0.5, 0.9, 0.99], acc).alias("q")
    ).collect()[0]["q"]
    vals = sorted(r.o_totalprice for r in o.select("o_totalprice").collect())
    n = len(vals)
    import bisect

    for q, v in zip([0.5, 0.9, 0.99], got):
        lo = bisect.bisect_left(vals, v)
        hi = bisect.bisect_right(vals, v)
        target = q * n
        # rank interval of the returned value must overlap the allowed band
        assert lo - n / acc <= target <= hi + n / acc, (q, v, lo, hi, n)


def test_seasonality_residuals_sum_to_zero(spark, sf_dir):
    """OLS residuals sum to ~0, so the month-weighted seasonal indices
    must too (up to round-6 noise) — the internal-consistency check of
    the additive decomposition."""
    got = _run(spark, sf_dir, "monthly_revenue_seasonality")
    weighted = (got.seasonal_cents * got.n_years).sum()
    assert abs(weighted) < 1.0, weighted  # cents-scale values, ~1e9 magnitude


def test_zorder_buckets_bound_both_dimensions(spark, sf_dir):
    """The locality property data skipping depends on: every z-bucket's
    span in EACH dimension is a bounded fraction of the global span
    (top-5 z-bits = 2 custkey bits + 3 day bits -> spans <= 1/4 and
    <= 1/8 of the global range, + 1 normalization-rounding slack)."""
    got = _run(spark, sf_dir, "orders_zorder_layout")
    orders = pd.read_parquet(f"{sf_dir}/orders.parquet")
    days = (
        pd.to_datetime(orders["o_orderdate"]).dt.normalize()
        - pd.Timestamp("1992-01-01")
    ).dt.days
    # bounds follow the normalization denominators (max+1), not the
    # observed span: top-5 z-bits fix 2 custkey bits and 3 day bits
    cust_bound = (orders["o_custkey"].max() + 1) / 4 + 1
    day_bound = (days.max() + 1) / 8 + 1
    assert len(got) >= 8  # the curve actually fans out
    for _, r in got.iterrows():
        assert r.max_cust - r.min_cust <= cust_bound, r
        assert r.max_day - r.min_day <= day_bound, r
    # and together the buckets cover every order exactly once
    assert got.n_orders.sum() == len(orders)


def test_clamped_balance_identity_matches_recurrence(spark, sf_dir):
    """The closed form balance_t = prefix_t - min(0, running_min) used
    by part_inventory_balance must equal the literal recurrence
    balance_t = max(0, balance_{t-1} + net_t), evaluated in pandas per
    part — validating the IDENTITY itself, independent of the DuckDB
    oracle (which evaluates the same closed form)."""
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet")
    li["day"] = pd.to_datetime(li["l_shipdate"]).dt.normalize()
    li["net"] = li.apply(
        lambda r: int(r.l_quantity)
        if r.l_returnflag == "R"
        else -int(r.l_quantity),
        axis=1,
    )
    flows = (
        li.groupby(["l_partkey", "day"], as_index=False)["net"].sum()
        .sort_values(["l_partkey", "day"])
    )
    total = n_stockout = 0
    for _, g in flows.groupby("l_partkey"):
        bal = 0
        for net in g["net"]:
            bal = max(0, bal + net)
            total += bal
            if bal == 0 and net < 0:
                n_stockout += 1
    from financial_data_warehouse_automation_spark.registry import load_all

    got = load_all()["part_inventory_balance"].builder(spark, sf_dir).first()
    assert got.total_balance == total
    assert got.n_stockout_days == n_stockout
    assert got.n_part_days == len(flows)


def test_compaction_sizing_multi_file(spark, sf_dir, tmp_path):
    """compact_parquet_dir's size-derived target: with a target well
    under the data size the rewrite must land on ceil(bytes/target)
    files (> 1), and with the default 32 MB target this corpus lands
    on exactly 1 — both branches of the sizing, content preserved."""
    import os

    from pyspark.sql import functions as F

    from financial_data_warehouse_automation_spark.queries.relational import (
        _parquet_parts,
        compact_parquet_dir,
    )
    from financial_data_warehouse_automation_spark.tables import load_table

    src = str(tmp_path / "frag")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    o.repartition(8).write.parquet(src)
    total = sum(
        os.path.getsize(os.path.join(src, n)) for n in _parquet_parts(src)
    )
    target = max(1, total // 3)
    dst_multi = str(tmp_path / "multi")
    n = compact_parquet_dir(spark, src, dst_multi, target_bytes=target)
    assert n == -(-total // target) and n > 1
    dst_one = str(tmp_path / "one")
    assert compact_parquet_dir(spark, src, dst_one) == 1
    base = sorted(r.o_orderkey for r in o.collect())
    for d in (dst_multi, dst_one):
        got = sorted(r.o_orderkey for r in spark.read.parquet(d).collect())
        assert got == base


def test_compaction_clamps_target_to_row_count(spark, tmp_path):
    """r10 advisor: a target_bytes small enough that ceil(bytes/target)
    exceeds the row count must clamp (zero-row repartition slices write
    no file) instead of tripping the exact-count assert."""
    import os

    from financial_data_warehouse_automation_spark.queries.relational import (
        compact_parquet_dir,
    )

    src = str(tmp_path / "tiny")
    spark.range(5).coalesce(1).write.parquet(src)
    n = compact_parquet_dir(spark, src, str(tmp_path / "out"), target_bytes=1)
    assert n == 5  # clamped to the row count, not ceil(bytes/1)
    got = sorted(
        r.id for r in spark.read.parquet(str(tmp_path / "out")).collect()
    )
    assert got == [0, 1, 2, 3, 4]


def _exact_cohort_sets(spark, sf_dir):
    from pyspark.sql import functions as F

    from financial_data_warehouse_automation_spark.tables import load_table

    rows = (
        load_table(spark, sf_dir, "events")
        .where(F.col("event_type").isin("click", "purchase"))
        .select("event_type", "user_id")
        .distinct()
        .collect()
    )
    a = {r.user_id for r in rows if r.event_type == "click"}
    b = {r.user_id for r in rows if r.event_type == "purchase"}
    return a, b


def test_kmv_set_ops_exact_branch(spark, sf_dir):
    """At sf0.001 both cohorts hold < k=64 distinct users, so theta is
    the full hash range and every Theta-composition estimate must BE
    the exact count — the degenerate-to-exact contract."""
    from financial_data_warehouse_automation_spark.registry import load_all

    r = load_all()["events_kmv_set_ops"].builder(spark, sf_dir).collect()[0]
    a, b = _exact_cohort_sets(spark, sf_dir)
    if max(len(a), len(b)) >= 64:  # only the sf0.001 shape qualifies
        import pytest as _pytest

        _pytest.skip("cohorts exceed k; exact branch not reachable here")
    assert r.est_a == float(len(a))
    assert r.est_b == float(len(b))
    assert r.est_union == float(len(a | b))
    assert r.est_inter == float(len(a & b))


def test_kmv_set_ops_estimator_accuracy(spark):
    """At sf0.01 the 150-user cohorts exceed k=64, so the estimator
    branch runs; Theta composition at k=64 carries ~1/sqrt(k-2) ~ 13%
    relative sigma — require every estimate within 3 sigma (40%) of
    truth, and the Jaccard estimate within 0.3 absolute."""
    from financial_data_warehouse_automation_spark.registry import load_all

    sf = "/root/testdata/sf0.01"
    r = load_all()["events_kmv_set_ops"].builder(spark, sf).collect()[0]
    a, b = _exact_cohort_sets(spark, sf)
    assert max(len(a), len(b)) >= 64, "estimator branch requires big cohorts"
    for est, true in (
        (r.est_a, len(a)),
        (r.est_b, len(b)),
        (r.est_union, len(a | b)),
        (r.est_inter, len(a & b)),
    ):
        assert abs(est - true) <= 0.40 * true, (est, true)
    true_j = len(a & b) / len(a | b)
    assert abs(r.est_jaccard - true_j) <= 0.3, (r.est_jaccard, true_j)


def test_snapshot_cow_deltas_reconcile_with_raw(spark, sf_dir):
    """orders_snapshot_cow_read's v1->v2 deltas re-derived from the raw
    table: row delta == deleted-range count, customer delta == deleted
    distinct customers, cents delta == 100_00 * surviving updated rows
    minus deleted cents — the CDC arithmetic cross-checked outside the
    manifest machinery (the builder's own asserts cover COW reuse and
    isolation)."""
    from pyspark.sql import functions as F

    from financial_data_warehouse_automation_spark.registry import load_all
    from financial_data_warehouse_automation_spark.tables import load_table

    rows = {
        r.snapshot: r
        for r in load_all()["orders_snapshot_cow_read"]
        .builder(spark, sf_dir)
        .collect()
    }
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("ckey"), "o_totalprice"
    )
    mx = o.agg(F.max("ckey")).collect()[0][0]
    upd_lo, upd_hi = mx // 4, mx // 4 + max(1, mx // 20)
    del_lo, del_hi = (3 * mx) // 5, (3 * mx) // 5 + max(1, mx // 50)
    upd = (F.col("ckey") >= upd_lo) & (F.col("ckey") < upd_hi)
    dele = (F.col("ckey") >= del_lo) & (F.col("ckey") < del_hi)
    stats = o.agg(
        F.count(F.when(dele, 1)).alias("n_del"),
        F.sum(F.when(dele, F.round(F.col("o_totalprice") * 100, 0)
                     .cast("bigint"))).alias("del_cents"),
        F.count(F.when(upd & ~dele, 1)).alias("n_upd"),
        F.countDistinct(F.when(dele, F.col("ckey"))).alias("n_del_cust"),
    ).collect()[0]
    v1, v2 = rows["v1"], rows["v2"]
    assert v1.n_orders - v2.n_orders == stats.n_del
    assert v1.n_customers - v2.n_customers == stats.n_del_cust
    assert v2.cents - v1.cents == 100 * 100 * stats.n_upd - (
        stats.del_cents or 0
    )
