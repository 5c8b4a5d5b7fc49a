"""Statistical validity of the deterministic samplers: the estimates
must land where sampling theory puts them (the data is fixed, so these
are deterministic assertions, not flaky statistics)."""

from __future__ import annotations

import math

from pyspark.sql import functions as F


def test_sampled_quantiles_near_true_quantiles(spark, sf_dir):
    """For each sampled quantile value v_p, the true CDF position of
    v_p over the FULL data must be within 4 binomial standard errors
    of p — the nearest-rank-of-a-uniform-sample guarantee."""
    from financial_data_warehouse_automation_spark.registry import load_all

    q = load_all()["order_sampled_quantiles"].builder
    got = {r.p: (r.price_cents, r.sample_n) for r in q(spark, sf_dir).collect()}
    assert set(got) == {0.5, 0.95, 0.99}

    full = spark.read.parquet(f"{sf_dir}/orders.parquet").select(
        F.round(F.col("o_totalprice") * 100, 0).cast("long").alias("c")
    )
    n_full = full.count()
    for p, (v, n_s) in got.items():
        below = full.where(F.col("c") <= v).count()
        f_hat = below / n_full
        se = math.sqrt(p * (1 - p) / n_s)
        assert abs(f_hat - p) <= 4 * se + 1 / n_s, (
            f"p={p}: sample value sits at true CDF {f_hat:.3f}, "
            f"outside 4 standard errors ({se:.3f}) of the target"
        )


def test_priority_sample_favors_heavy_docs(spark, sf_dir):
    """Priority sampling must be weight-biased: the token mass per
    sampled doc should exceed the corpus average (that is the point of
    weighting), and the sample must be exactly k distinct docs."""
    from financial_data_warehouse_automation_spark.registry import load_all

    q = load_all()["doc_priority_sample"].builder
    rows = q(spark, sf_dir).collect()
    assert len(rows) == len({r.doc_id for r in rows}) == 32

    d = spark.read.parquet(f"{sf_dir}/documents.parquet")
    avg_tokens = (
        d.select(F.size(F.split(F.trim("text"), r"\s+")).alias("n"))
        .agg(F.avg("n"))
        .first()[0]
    )
    sample_avg = sum(r.n_tokens for r in rows) / len(rows)
    assert sample_avg > avg_tokens


def test_count_min_never_underestimates(spark, sf_dir):
    """The Count-Min invariant: a key's estimate is the MIN of d
    counter cells it hashes into, each of which counts AT LEAST every
    occurrence of the key itself — so cms_est >= true_cnt for every
    probe, with equality when no other key collides in all d cells.
    Also pins the one-hash slicing (round 7): the d cells come from
    disjoint 32-bit slices of one md5, so a regression that reuses the
    same slice d times would collapse the sketch's independence and
    show up here as gross overestimates on this small table."""
    from financial_data_warehouse_automation_spark.queries.relational import part_freq_count_min

    rows = part_freq_count_min(spark, sf_dir).collect()
    assert rows, "probe set is empty"
    for r in rows:
        assert r.cms_est >= r.true_cnt, (
            f"CMS underestimated key {r.partkey}: {r.cms_est} < {r.true_cnt}"
        )
    # error bound: eps = e/width with prob 1-(1/e)^d; at width 1024 and
    # this table's N the slack is tiny — allow 2*N/width absolute.
    n_total = sum(r.true_cnt for r in rows)
    # N here is the full column count, not just probes
    from financial_data_warehouse_automation_spark.tables import load_table
    n_all = load_table(spark, sf_dir, "lineitem").count()
    for r in rows:
        assert r.cms_est - r.true_cnt <= max(2 * n_all / 1024, 8), (
            f"CMS estimate for {r.partkey} beyond the eps*N bound"
        )
