"""Connected components via iterative min-label propagation.

The last stage of a fuzzy-dedup pipeline: near-dup *pairs* (from LSH /
brute verification) must collapse into *clusters* so one canonical doc
per cluster survives. Pairs form an undirected graph; components are
found by propagating the minimum node id along edges until fixpoint —
the standard shuffle-friendly formulation (each iteration is one join +
one aggregate; O(diameter) iterations, and near-dup graphs are
shallow). No driver-side graph state: the only driver traffic is the
per-iteration convergence counter, and ``localCheckpoint`` cuts the
lineage so plans don't grow with iterations.

At 100 TB: edges are the (bounded) LSH-verified pairs, node count is
the corpus; every iteration shuffles on node id — same key each time,
so AQE reuses the layout. For adversarial high-diameter graphs swap in
large-star/small-star; for dedup graphs plain propagation converges in
a handful of rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from financial_data_warehouse_automation_spark.lineage import cut


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    id_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iters: int = 25,
) -> DataFrame:
    """Return ``(id, component)`` where component = min node id reachable.

    ``vertices``: one column ``id_col`` (isolated nodes become their own
    component). ``edges``: undirected pairs in ``src_col``/``dst_col``.
    """
    sym = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .union(edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst")))
        .distinct()
    )
    labels = vertices.select(
        F.col(id_col).alias("node"), F.col(id_col).alias("component")
    )
    labels = cut(labels, eager=True)

    for _ in range(max_iters):
        neighbor = (
            sym.join(labels, sym.dst == labels.node)
            .select(F.col("src").alias("node"), "component")
        )
        new_labels = (
            labels.unionByName(neighbor)
            .groupBy("node")
            .agg(F.min("component").alias("component"))
        )
        new_labels = cut(new_labels, eager=True)
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "node")
            .where(F.col("n.component") != F.col("o.component"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node").alias(id_col), "component")


# One definition of the co-purchase graph instead of three copies: the
# edge build (distinct order->part, basket-bounded self-join, >= 2
# shared orders) is the expensive prefix of part_reach_3hops,
# part_copurchase_triangles AND part_pagerank_step. Memoized per
# (applicationId, sf_dir) like tables._RELATION_CACHE, so a session
# running several graph queries — the driver gate, the sweep — builds
# and checkpoints it once. No memo in plan-audit mode: the cached
# DataFrame would pin whichever mode populated it first, and the
# audit must see the raw build.
_EDGE_CACHE: dict[tuple[str, str, int], "DataFrame"] = {}


def copurchase_edges(spark, sf_dir: str, min_orders: int = 2) -> DataFrame:
    """Oriented (a < b) part pairs co-bought in >= ``min_orders``
    orders — built once, localCheckpoint'ed (the relation is ~1% of
    lineitem and every consumer references it multiple times)."""
    import os

    from financial_data_warehouse_automation_spark.lineage import cut
    from financial_data_warehouse_automation_spark.tables import load_table

    audit = os.environ.get("SPARK_GRAFT_NO_CHECKPOINT") == "1"
    key = (spark.sparkContext.applicationId, sf_dir, min_orders)
    if not audit and key in _EDGE_CACHE:
        return _EDGE_CACHE[key]
    l = load_table(spark, sf_dir, "lineitem")
    op = l.select("l_orderkey", "l_partkey").distinct()
    o1 = op.select(F.col("l_orderkey").alias("k"), F.col("l_partkey").alias("pa"))
    o2 = op.select(F.col("l_orderkey").alias("k2"), F.col("l_partkey").alias("pb"))
    edges = (
        o1.join(o2, (F.col("k") == F.col("k2")) & (F.col("pa") < F.col("pb")))
        .groupBy(F.col("pa").alias("a"), F.col("pb").alias("b"))
        .agg(F.count(F.lit(1)).alias("n_ord"))
        .where(F.col("n_ord") >= min_orders)
        .select("a", "b")
    )
    edges = cut(edges, eager=True)
    if not audit:
        for k in [k for k in _EDGE_CACHE if k[0] != key[0]]:
            del _EDGE_CACHE[k]
        _EDGE_CACHE[key] = edges
    return edges
