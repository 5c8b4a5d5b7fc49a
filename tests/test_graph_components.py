"""connected_components_two_phase (large-star/small-star, Kiveris et
al. SoCC'14) — the O(log² n)-round components variant for graphs whose
DIAMETER defeats min-label propagation's O(diameter) rounds.

Three pins: bit-equality with the propagation operator on shallow
graphs (seeded random + bridged cliques), ground truth on a path graph
whose diameter EXCEEDS propagation's default iteration cap (the exact
case this operator exists for), and isolated-vertex handling."""

from __future__ import annotations

import random


def _labels(df) -> dict:
    return {r["id"]: r["component"] for r in df.collect()}


def _truth(n_vertices, edges) -> dict:
    parent = list(range(n_vertices))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # component label = min id reachable
    comp = {}
    for v in range(n_vertices):
        r = find(v)
        comp.setdefault(r, []).append(v)
    return {v: min(vs) for r, vs in comp.items() for v in vs}


def test_two_phase_equals_propagation_on_shallow_graphs(spark):
    from financial_data_warehouse_automation_spark.operators.graph import (
        connected_components,
        connected_components_two_phase,
    )

    rng = random.Random(7)
    n = 80
    edges = sorted({(rng.randrange(n), rng.randrange(n)) for _ in range(90)})
    edges = [(a, b) for a, b in edges if a != b]
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got_prop = _labels(connected_components(verts, edf))
    got_two = _labels(connected_components_two_phase(verts, edf))
    assert got_two == got_prop == _truth(n, edges)


def test_two_phase_survives_high_diameter_path(spark):
    """A 60-node path has diameter 59 > propagation's default 25
    rounds; star contraction needs O(log² n) and must still produce
    the exact answer (everything labeled 0)."""
    from financial_data_warehouse_automation_spark.operators.graph import (
        connected_components_two_phase,
    )

    n = 60
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edf = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    got = _labels(connected_components_two_phase(verts, edf, max_iters=12))
    assert got == {i: 0 for i in range(n)}


def test_two_phase_raises_on_iteration_exhaustion(spark):
    """If max_iters is exhausted before the star-forest fixpoint, the
    edge set can hold multiple (node, label) rows per node and the
    final join would fan out into duplicate ids with non-minimum
    labels — the operator must fail loudly instead of returning a
    malformed frame (advisor finding, round 8)."""
    import pytest

    from financial_data_warehouse_automation_spark.operators.graph import (
        connected_components_two_phase,
    )

    n = 60
    verts = spark.createDataFrame([(i,) for i in range(n)], "id long")
    edf = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="fixpoint"):
        connected_components_two_phase(verts, edf, max_iters=1)


def test_two_phase_bridged_cliques_and_isolates(spark):
    from financial_data_warehouse_automation_spark.operators.graph import (
        connected_components,
        connected_components_two_phase,
    )

    # two 5-cliques {0..4} and {10..14} bridged by (4, 10); isolates 20, 21
    edges = [(a, b) for a in range(5) for b in range(a + 1, 5)]
    edges += [(a, b) for a in range(10, 15) for b in range(a + 1, 15)]
    edges += [(4, 10)]
    ids = list(range(5)) + list(range(10, 15)) + [20, 21]
    verts = spark.createDataFrame([(i,) for i in ids], "id long")
    edf = spark.createDataFrame(edges, "src long, dst long")
    got_two = _labels(connected_components_two_phase(verts, edf))
    got_prop = _labels(connected_components(verts, edf))
    want = {i: 0 for i in list(range(5)) + list(range(10, 15))}
    want.update({20: 20, 21: 21})
    assert got_two == got_prop == want


def test_two_phase_matches_pipeline_dedup_clusters(spark, sf_dir):
    """Integration: on the REAL near-dup pair graph the registry's
    dedup_cluster_components query builds (bounded 100-doc Jaccard
    edges), star contraction must produce the exact per-doc component
    labels the propagation-backed query returns."""
    from pyspark.sql import functions as F

    from financial_data_warehouse_automation_spark.operators.graph import (
        connected_components_two_phase,
    )
    from financial_data_warehouse_automation_spark.operators.text import jaccard, tokens
    from financial_data_warehouse_automation_spark.queries.text import dedup_cluster_components
    from financial_data_warehouse_automation_spark.tables import load_table

    want = {
        r["doc_id"]: r["component"]
        for r in dedup_cluster_components(spark, sf_dir).collect()
    }
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") < 100)
    t = d.select("doc_id", F.array_distinct(tokens("text")).alias("toks"))
    a = t.select(F.col("doc_id").alias("id_a"), F.col("toks").alias("ta"))
    b = t.select(F.col("doc_id").alias("id_b"), F.col("toks").alias("tb"))
    edges = (
        a.join(b, F.col("id_a") < F.col("id_b"))
        .where(jaccard(F.col("ta"), F.col("tb")) >= 0.65)
        .select("id_a", "id_b")
    )
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components_two_phase(
            t.select("doc_id"), edges,
            id_col="doc_id", src_col="id_a", dst_col="id_b",
        ).collect()
    }
    assert got == want


def test_copurchase_edges_memoized_per_session(spark, sf_dir):
    """The shared edge build returns the SAME checkpointed DataFrame on
    repeat calls within a session (one build for the driver gate / the
    sweep), and audit mode bypasses the memo so plan sweeps never see
    a mode-mismatched cached plan."""
    import os

    from financial_data_warehouse_automation_spark.operators.graph import copurchase_edges

    e1 = copurchase_edges(spark, sf_dir)
    e2 = copurchase_edges(spark, sf_dir)
    assert e1 is e2
    os.environ["SPARK_GRAFT_PLAN_AUDIT"] = "1"
    try:
        e3 = copurchase_edges(spark, sf_dir)
        assert e3 is not e1
        assert "ExistingRDD" not in e3._jdf.queryExecution(
        ).executedPlan().toString()
    finally:
        os.environ.pop("SPARK_GRAFT_PLAN_AUDIT", None)
    # values identical either way
    assert sorted(map(tuple, e3.collect())) == sorted(map(tuple, e1.collect()))
