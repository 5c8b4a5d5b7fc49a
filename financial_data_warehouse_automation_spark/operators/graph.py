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
