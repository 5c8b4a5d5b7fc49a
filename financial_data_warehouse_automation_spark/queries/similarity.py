"""Similarity-search queries over ``embeddings`` (SURVEY §2.10).

Brute-force cosine top-k is the oracle-checked anchor (deterministic
left-fold arithmetic — see operators/vectors.py); RHP-LSH and IVF are
the sublinear scale paths, rows-only checked with recall anchored by
the brute-force variant (tests/test_similarity.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from financial_data_warehouse_automation_spark.operators.vectors import (
    brute_force_topk,
    cosine,
    dot,
    l2_norm,
    rademacher_signs,
    rhp_bucket,
)
from financial_data_warehouse_automation_spark.lineage import cut
from financial_data_warehouse_automation_spark.registry import query
from financial_data_warehouse_automation_spark.tables import load_table

# Deterministic left-fold SQL fragments (DuckDB): list_reduce folds
# left-to-right, matching Spark's F.aggregate.
_SQL_DOT = (
    "list_reduce(list_transform(generate_series(1, len({a})), "
    "i -> CAST({a}[i] AS DOUBLE) * CAST({b}[i] AS DOUBLE)), (x, y) -> x + y)"
)


def _sql_dot(a: str, b: str) -> str:
    return _SQL_DOT.format(a=a, b=b)


def _sql_norm(a: str) -> str:
    return f"sqrt({_sql_dot(a, a)})"


@query(
    "embedding_norms",
    tags=("similarity", "vectors"),
    oracle=f"""
SELECT vec_id, label,
       len(embedding) AS dim,
       {_sql_norm('embedding')} AS l2
FROM embeddings
WHERE vec_id % 25 = 0
ORDER BY vec_id
""",
)
def embedding_norms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-vector L2 norm via fold — proves the cross-engine-exact
    vector arithmetic on which the ANN oracle rests."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") % 25 == 0)
    return e.select(
        "vec_id", "label",
        F.size("embedding").alias("dim"),
        l2_norm(F.col("embedding")).alias("l2"),
    )


@query(
    "ann_cosine_topk_brute",
    headline=True,
    tags=("similarity", "ann", "brute"),
    oracle=f"""
WITH probes AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id % 50 = 0
), scored AS (
  SELECT p.qid, e.vec_id,
         {_sql_dot('p.qvec', 'e.embedding')}
           / ({_sql_norm('p.qvec')} * {_sql_norm('e.embedding')}) AS cos
  FROM embeddings e CROSS JOIN probes p
  WHERE p.qid != e.vec_id
)
SELECT qid, rank, vec_id, cos FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
  FROM scored
)
WHERE rank <= 5
ORDER BY qid, rank
""",
)
def ann_cosine_topk_brute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 for a probe subset: broadcast probes over the
    corpus scan, windowed rank. The O(|Q|·n) correctness baseline —
    at 100 TB this shape is for small Q (reranking, eval); bulk ANN goes
    through the LSH/IVF paths."""
    e = load_table(spark, sf_dir, "embeddings")
    probes = e.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    return brute_force_topk(probes, e, k=5).select(
        "qid", "rank", "vec_id", "cos"
    )  # no final ORDER BY (r15): order-insensitive gate (guide §2.4)


def _sql_rhp_oracle() -> str:
    """DuckDB replay of the RHP pipeline: the ±1 hyperplane matrices are
    deterministic (md5 parity, operators/vectors.rademacher_signs), so
    the SAME matrices inline as literals and the bucket assignment —
    sign bit of a left-fold dot product — is bit-identical cross-engine."""
    tables = [rademacher_signs(4, 64, seed=f"rhp{t}") for t in range(8)]

    def plane_dot(plane: list[float]) -> str:
        lits = "[" + ", ".join("1.0" if s > 0 else "-1.0" for s in plane) + "]"
        return (
            f"list_reduce(list_transform(generate_series(1, 64), "
            f"j -> ({lits}::DOUBLE[])[j] * CAST(embedding[j] AS DOUBLE)), "
            f"(x, y) -> x + y)"
        )

    selects = []
    for t, planes in enumerate(tables):
        bucket = " + ".join(
            f"CASE WHEN {plane_dot(p)} >= 0 THEN {1 << i} ELSE 0 END"
            for i, p in enumerate(planes)
        )
        selects.append(
            f"SELECT vec_id, {t} AS table_idx, {bucket} AS bucket FROM embeddings"
        )
    bucketed = "\nUNION ALL\n".join(selects)
    return f"""
WITH bucketed AS (
{bucketed}
), cand AS (
  SELECT DISTINCT p.vec_id AS qid, c.vec_id AS vid
  FROM bucketed p
  JOIN bucketed c ON p.table_idx = c.table_idx AND p.bucket = c.bucket
  WHERE p.vec_id % 50 = 0 AND p.vec_id <> c.vec_id
), scored AS (
  SELECT cand.qid, cand.vid AS vec_id,
         {_sql_dot('q.embedding', 'v.embedding')}
           / ({_sql_norm('q.embedding')} * {_sql_norm('v.embedding')}) AS cos
  FROM cand
  JOIN embeddings q ON q.vec_id = cand.qid
  JOIN embeddings v ON v.vec_id = cand.vid
)
SELECT qid, rank, vec_id, cos FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= 5
ORDER BY qid, rank
"""


@query(
    "ann_cosine_topk_rhp",
    tags=("similarity", "ann", "lsh"),
    oracle=_sql_rhp_oracle(),
)
def ann_cosine_topk_rhp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Random-hyperplane LSH ANN: 8 tables × 4 sign-bits; candidate =
    shares a bucket with the probe in any table; exact cosine + rank
    only over candidates. The join is per (table, bucket) — cost follows
    bucket occupancy, never |Q|×n. The hyperplanes are md5-derived
    constants, so the full pipeline (bucket assignment included) replays
    in DuckDB with the same sign matrices inlined as literals and
    hash-matches; recall vs brute force is additionally asserted in
    tests/test_similarity.py. ``spread_by``: candidate cosines ride the
    corpus-side scan partitioning through the broadcast joins — fan it
    out when the file can't split (no-op on a well-split corpus)."""
    e = load_table(spark, sf_dir, "embeddings", spread_by=("vec_id",))
    tables = [rademacher_signs(4, 64, seed=f"rhp{t}") for t in range(8)]

    def with_buckets(df: DataFrame, id_alias: str) -> DataFrame:
        # Slim bucket rows: id + (table, bucket) ONLY. The candidate
        # join and the (qid, vec_id) dedup then shuffle 3 scalars per
        # row instead of two 64-float vectors — the bucket join's
        # volume is L x n rows regardless of dimension, and the
        # vectors are fetched once per UNIQUE candidate afterwards.
        buckets = F.array(*[rhp_bucket("embedding", planes) for planes in tables])
        return df.select(
            F.col("vec_id").alias(id_alias),
            F.posexplode(buckets).alias("table_idx", "bucket"),
        )

    probe_ids = with_buckets(e.where(F.col("vec_id") % 50 == 0), "qid")
    corpus_ids = with_buckets(e, "cid")
    cand_ids = (
        probe_ids.join(corpus_ids, ["table_idx", "bucket"])
        .where(F.col("qid") != F.col("cid"))
        .select("qid", F.col("cid").alias("vec_id"))
        .dropDuplicates(["qid", "vec_id"])
    )
    # Vectors + pair-invariant norms join back by key: the corpus side
    # is a keyed shuffle join (never a broadcast of a growing table),
    # the probe side broadcasts. One fold per unique pair — cosine()
    # here would refold both norms per pair; the division keeps
    # cosine()'s (qnorm * cnorm) operand order so the hash is
    # unchanged.
    corpus_v = e.select(
        "vec_id", F.col("embedding").alias("cvec"),
        l2_norm(F.col("embedding")).alias("cnorm"),
    )
    probes_v = e.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"),
        l2_norm(F.col("embedding")).alias("qnorm"),
    )
    scored = (
        cand_ids.join(corpus_v, "vec_id")
        .join(F.broadcast(probes_v), "qid")
        .select(
            "qid", "vec_id",
            (
                dot(F.col("qvec"), F.col("cvec"))
                / (F.col("qnorm") * F.col("cnorm"))
            ).alias("cos"),
        )
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("qid", "rank", "vec_id", "cos")
    )


_SQL_IVF = f"""
WITH dims AS (
  SELECT label, i AS pos,
         CAST(ROUND(CAST(embedding[i] AS DOUBLE), 6) AS DECIMAL(18,6)) AS v
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
), cent AS (
  SELECT label AS cell, pos, CAST(SUM(v) AS DOUBLE) / COUNT(*) AS c
  FROM dims GROUP BY 1, 2
), centroids AS (
  SELECT cell, list(c ORDER BY pos) AS centroid FROM cent GROUP BY cell
), probes AS (
  SELECT vec_id AS qid, embedding AS qvec FROM embeddings WHERE vec_id % 50 = 0
), probe_cells AS (
  SELECT qid, qvec, cell FROM (
    SELECT p.qid, p.qvec, cc.cell,
           ROW_NUMBER() OVER (
             PARTITION BY p.qid
             ORDER BY {_sql_dot('p.qvec', 'cc.centroid')}
                      / ({_sql_norm('p.qvec')} * {_sql_norm('cc.centroid')}) DESC,
                      cc.cell
           ) AS cell_rn
    FROM probes p CROSS JOIN centroids cc
  ) WHERE cell_rn <= 3
), scored AS (
  SELECT pc.qid, e.vec_id,
         {_sql_dot('pc.qvec', 'e.embedding')}
           / ({_sql_norm('pc.qvec')} * {_sql_norm('e.embedding')}) AS cos
  FROM probe_cells pc JOIN embeddings e ON e.label = pc.cell
  WHERE pc.qid <> e.vec_id
)
SELECT qid, rank, vec_id, cos FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
  FROM scored
) WHERE rank <= 5
ORDER BY qid, rank
"""


def _ivf_probe_cells(e: DataFrame) -> DataFrame:
    """Shared IVF coarse-quantizer stage: per-label round-6-decimal
    centroids (reduction-order independent — the
    embedding_label_centroids discipline), probes = vec_id % 50,
    each probe keeps its top-3 cells by centroid cosine. Returns
    (qid, qvec, qnorm, cell), 3 rows per probe. Factored verbatim out
    of ann_cosine_topk_ivf (round 9) so the staged rerank query runs
    the IDENTICAL coarse stage — expressions unchanged, so the
    registered IVF query's plan and hash are unaffected."""
    dims = e.select("vec_id", "label", F.posexplode("embedding").alias("pos", "v"))
    v6 = F.round(F.col("v").cast("double"), 6).cast("decimal(18,6)")
    centroids = (
        dims.groupBy("label", "pos")
        .agg((F.sum(v6).cast("double") / F.count(F.lit(1))).alias("c"))
        .groupBy("label")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "c"))),
                lambda s: s["c"],
            ).alias("centroid")
        )
        .select(F.col("label").alias("cell"), "centroid")
    )
    probes = e.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"),
        l2_norm(F.col("embedding")).alias("qnorm"),
    )
    cell_rank = Window.partitionBy("qid").orderBy(F.desc("cell_cos"), F.asc("cell"))
    return (
        probes.crossJoin(F.broadcast(centroids))
        .select(
            "qid", "qvec", "qnorm", "cell",
            cosine(F.col("qvec"), F.col("centroid")).alias("cell_cos"),
        )
        .withColumn("cell_rn", F.row_number().over(cell_rank))
        .where(F.col("cell_rn") <= 3)
        .select("qid", "qvec", "qnorm", "cell")
    )


@query(
    "ann_cosine_topk_ivf",
    tags=("similarity", "ann", "ivf"),
    oracle=_SQL_IVF,
)
def ann_cosine_topk_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: coarse cells = per-label mean centroids (one
    groupBy build); each probe ranks cells by centroid cosine, searches
    the top-3 cells only (nprobe=3). Scan cost = nprobe/ncells of the
    corpus. The centroid build accumulates round-6 decimals (the
    embedding_label_centroids discipline) instead of a float AVG, so
    cell assignment is reduction-order independent and the whole
    pipeline — coarse quantizer included — hash-matches the DuckDB
    replay.

    ``spread_by``: the candidate join broadcasts the (tiny) probe
    side, so without it every candidate cosine + window partial runs
    INSIDE the corpus scan stage — one task on a single-row-group
    file (measured 46s vs 6s at the 10× scale point; see PERF.md's
    scaling section). Guarded no-op on a well-split corpus."""
    e = load_table(spark, sf_dir, "embeddings", spread_by=("vec_id",))
    probe_cells = _ivf_probe_cells(e)
    # Corpus norm once per row at scan; the nprobe-cell candidate
    # stage then does one fold per pair, not three (pair-invariant
    # norms, bit-identical division — see brute_force_topk).
    cands = probe_cells.join(
        e.select(
            F.col("vec_id"), F.col("label").alias("cell"), F.col("embedding"),
            l2_norm(F.col("embedding")).alias("cnorm"),
        ),
        "cell",
    ).where(F.col("qid") != F.col("vec_id"))
    scored = cands.select(
        "qid", "vec_id",
        (
            dot(F.col("qvec"), F.col("embedding"))
            / (F.col("qnorm") * F.col("cnorm"))
        ).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("qid", "rank", "vec_id", "cos")
    )


@query(
    "embedding_near_dup_pairs",
    tags=("similarity", "dedup", "threshold"),
    oracle=f"""
WITH t AS (
  SELECT vec_id, embedding FROM embeddings WHERE vec_id < 200
), scored AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         {_sql_dot('a.embedding', 'b.embedding')}
           / ({_sql_norm('a.embedding')} * {_sql_norm('b.embedding')}) AS cos
  FROM t a JOIN t b ON a.vec_id < b.vec_id
)
SELECT id_a, id_b, cos FROM scored WHERE cos >= 0.35
ORDER BY id_a, id_b
""",
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup detection: all pairs above a cosine
    threshold (subset-bounded here; the full-corpus path buckets by RHP
    signature first — ann_cosine_topk_rhp's join — so thresholding never
    goes all-pairs). This synthetic corpus has no true dups (max pair
    cosine ≈ 0.44), so the 0.35 threshold exercises the operator on its
    closest pairs."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") < 200)
    a = e.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"),
        l2_norm(F.col("embedding")).alias("na"),
    )
    b = e.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"),
        l2_norm(F.col("embedding")).alias("nb"),
    )
    return (
        a.join(b, F.col("id_a") < F.col("id_b"))
        # per-row norms, 1 fold per pair — same bit-identical division
        # as the rest of the ANN band (round 7)
        .select(
            "id_a", "id_b",
            (
                dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
            ).alias("cos"),
        )
        .where(F.col("cos") >= 0.35)
    )


@query("ann_cosine_topk_ivf_kmeans", tags=("similarity", "ann", "ivf", "mllib"))
def ann_cosine_topk_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with *learned* cells: MLlib KMeans (k=8, fixed seed) builds
    the coarse quantizer instead of trusting the label column; probes
    search their top-2 cells by centroid cosine. The production IVF
    shape — train once, assign in one pass, search nprobe/k of the
    corpus. Rows-only (cluster assignments are model-dependent)."""
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    e = load_table(spark, sf_dir, "embeddings", spread_by=("vec_id",))
    vecs = e.select("vec_id", "embedding", array_to_vector("embedding").alias("features"))
    km = KMeans(k=8, seed=42, featuresCol="features", predictionCol="cell")
    model = km.fit(vecs)
    assigned = model.transform(vecs).select("vec_id", "embedding", "cell")
    centroids = spark.createDataFrame(
        [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
        "cell int, centroid array<double>",
    )
    probes = assigned.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"),
        l2_norm(F.col("embedding")).alias("qnorm"),
    )
    cell_rank = Window.partitionBy("qid").orderBy(F.desc("cell_cos"), F.asc("cell"))
    probe_cells = (
        probes.crossJoin(F.broadcast(centroids))
        .select(
            "qid", "qvec", "qnorm", "cell",
            cosine(F.col("qvec"), F.col("centroid")).alias("cell_cos"),
        )
        .withColumn("cell_rn", F.row_number().over(cell_rank))
        .where(F.col("cell_rn") <= 2)
        .select("qid", "qvec", "qnorm", "cell")
    )
    cands = probe_cells.join(
        assigned.withColumn("cnorm", l2_norm(F.col("embedding"))), "cell"
    ).where(F.col("qid") != F.col("vec_id"))
    scored = cands.select(
        "qid", "vec_id",
        (
            dot(F.col("qvec"), F.col("embedding"))
            / (F.col("qnorm") * F.col("cnorm"))
        ).alias("cos"),
    )
    w = Window.partitionBy("qid").orderBy(F.desc("cos"), F.asc("vec_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= 5)
        .select("qid", "rank", "vec_id", "cos")
    )


@query(
    "embedding_hof_breadth",
    tags=("similarity", "vectors", "hof"),
    oracle="""
SELECT vec_id, label,
       len(list_filter(embedding, x -> x > 0)) AS n_pos,
       len(list_filter(embedding, x -> x > 2)) > 0 AS any_gt2,
       CAST(list_max(list_transform(embedding, x -> abs(x))) AS DOUBLE) AS max_abs,
       list_reduce(list_transform(generate_series(1, len(embedding)),
         i -> CAST(embedding[i] AS DOUBLE)
              * CAST(embedding[len(embedding) + 1 - i] AS DOUBLE)),
         (x, y) -> x + y) AS rev_dot
FROM embeddings
WHERE vec_id % 20 = 0
ORDER BY vec_id
""",
)
def embedding_hof_breadth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order-function breadth over array columns: filter (count
    positives), exists (threshold test), transform+array_max (abs peak),
    zip_with+aggregate (dot with the reversed self). All JVM-side
    lambda expressions — no Python in the loop; products widen float32 →
    double before multiplying so both engines fold identical values."""
    e = load_table(spark, sf_dir, "embeddings").where(F.col("vec_id") % 20 == 0)
    c = F.col("embedding")
    rev_dot = F.aggregate(
        F.zip_with(c, F.reverse(c), lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return e.select(
        "vec_id",
        "label",
        F.size(F.filter(c, lambda x: x > 0)).alias("n_pos"),
        F.exists(c, lambda x: x > 2).alias("any_gt2"),
        F.array_max(F.transform(c, lambda x: F.abs(x))).cast("double").alias("max_abs"),
        rev_dot.alias("rev_dot"),
    )


_SQL_Q = (
    "list_transform({v}, x -> CAST(round(CAST(x AS DOUBLE) * "
    "(127.0 / greatest(list_max(list_transform({v}, y -> abs(CAST(y AS DOUBLE)))), 1e-30))"
    ") AS BIGINT))"
)
_SQL_IDOT = (
    "list_reduce(list_transform(generate_series(1, len({a})), "
    "i -> {a}[i] * {b}[i]), (x, y) -> x + y)"
)


@query(
    "ann_cosine_topk_quantized",
    tags=("similarity", "ann", "quantized", "int8"),
    oracle=f"""
WITH probes AS (
  SELECT vec_id AS qid, embedding AS qvec, {_SQL_Q.format(v='embedding')} AS qq
  FROM embeddings WHERE vec_id % 50 = 0
), corpus AS (
  SELECT vec_id, embedding, {_SQL_Q.format(v='embedding')} AS cq
  FROM embeddings
), cand AS (
  SELECT p.qid, c.vec_id, p.qvec, c.embedding,
         ROW_NUMBER() OVER (
           PARTITION BY p.qid
           ORDER BY {_SQL_IDOT.format(a='p.qq', b='c.cq')} DESC, c.vec_id
         ) AS crank
  FROM probes p JOIN corpus c ON p.qid != c.vec_id
), rescored AS (
  SELECT qid, vec_id,
         {_sql_dot('qvec', 'embedding')}
           / ({_sql_norm('qvec')} * {_sql_norm('embedding')}) AS cos
  FROM cand WHERE crank <= 20
)
SELECT qid, rank, vec_id, cos FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
  FROM rescored
)
WHERE rank <= 5
ORDER BY qid, rank
""",
)
def ann_cosine_topk_quantized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-stage quantized search: int8-quantize the corpus (4× lighter
    candidate generation — integer dots), take the top-20 candidates per
    probe by exact integer score, then rescore only those 20 in full
    precision for the final top-5. Because the quantization arithmetic
    is bit-identical across engines (operators/vectors.py
    quantize_int8), the whole path — including the candidate cut — is
    hash-checkable, unlike hash-sketch ANN variants.

    Scale shape (reworked round 7, was 16.2s at sf1 — slower than
    brute): the candidate rank previously carried BOTH float vectors
    and BOTH int8 arrays per (probe, candidate) row through the qid
    exchange — ~2 KB/row × |Q|·n, where brute ships 3 scalars. Now the
    rank stage is scalars only (qid, vec_id, iscore) — WindowGroupLimit
    takes partial top-20s map-side before the exchange — and the
    full-precision vectors are joined back ONLY for the 20·|Q|
    survivors (broadcast of the tiny id set against the corpus scan,
    no corpus shuffle). Norms are per-row scan columns, not per-pair
    folds. Same iscore ordering + vec_id tie-break ⇒ identical
    candidate set, identical rescore arithmetic, identical hash."""
    from financial_data_warehouse_automation_spark.operators.vectors import int_dot, quantize_int8

    e = load_table(spark, sf_dir, "embeddings", spread_by=("vec_id",))
    q, _ = quantize_int8(F.col("embedding"))
    probes = (
        e.where(F.col("vec_id") % 50 == 0)
        .select(
            F.col("vec_id").alias("qid"),
            F.col("embedding").alias("qvec"),
            l2_norm(F.col("embedding")).alias("qnorm"),
            q.alias("qq"),
        )
    )
    par = spark.sparkContext.defaultParallelism
    cand_ids = (
        e.select("vec_id", q.alias("cq"))
        .repartition(par)
        .crossJoin(F.broadcast(probes.select("qid", "qq")))
        .where(F.col("qid") != F.col("vec_id"))
        .select(
            "qid", "vec_id",
            int_dot(F.col("qq"), F.col("cq")).alias("iscore"),
        )
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(
                    F.desc("iscore"), F.col("vec_id")
                )
            ),
        )
        .where(F.col("crank") <= 20)
        .select("qid", "vec_id")
    )
    rescored = (
        e.select(
            "vec_id", "embedding", l2_norm(F.col("embedding")).alias("cnorm")
        )
        .join(F.broadcast(cand_ids), "vec_id")
        .join(F.broadcast(probes.select("qid", "qvec", "qnorm")), "qid")
        .select(
            "qid", "vec_id",
            (
                dot(F.col("qvec"), F.col("embedding"))
                / (F.col("qnorm") * F.col("cnorm"))
            ).alias("cos"),
        )
    )
    return (
        rescored.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("cos"), "vec_id")
            ),
        )
        .where(F.col("rank") <= 5)
        .select("qid", "rank", "vec_id", "cos")
    )


_SQL_IVF_RERANK = f"""
WITH dims AS (
  SELECT label, i AS pos,
         CAST(ROUND(CAST(embedding[i] AS DOUBLE), 6) AS DECIMAL(18,6)) AS v
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
), cent AS (
  SELECT label AS cell, pos, CAST(SUM(v) AS DOUBLE) / COUNT(*) AS c
  FROM dims GROUP BY 1, 2
), centroids AS (
  SELECT cell, list(c ORDER BY pos) AS centroid FROM cent GROUP BY cell
), probes AS (
  SELECT vec_id AS qid, embedding AS qvec,
         {_SQL_Q.format(v='embedding')} AS qq
  FROM embeddings WHERE vec_id % 50 = 0
), probe_cells AS (
  SELECT qid, qq, cell FROM (
    SELECT p.qid, p.qq, cc.cell,
           ROW_NUMBER() OVER (
             PARTITION BY p.qid
             ORDER BY {_sql_dot('p.qvec', 'cc.centroid')}
                      / ({_sql_norm('p.qvec')} * {_sql_norm('cc.centroid')}) DESC,
                      cc.cell
           ) AS cell_rn
    FROM probes p CROSS JOIN centroids cc
  ) WHERE cell_rn <= 3
), corpus AS (
  SELECT vec_id, label, {_SQL_Q.format(v='embedding')} AS cq FROM embeddings
), cand AS (
  SELECT pc.qid, e.vec_id,
         ROW_NUMBER() OVER (
           PARTITION BY pc.qid
           ORDER BY {_SQL_IDOT.format(a='pc.qq', b='e.cq')} DESC,
                    e.vec_id
         ) AS crank
  FROM probe_cells pc JOIN corpus e
    ON e.label = pc.cell AND pc.qid <> e.vec_id
), rescored AS (
  SELECT c.qid, c.vec_id,
         {_sql_dot('p.qvec', 'e.embedding')}
           / ({_sql_norm('p.qvec')} * {_sql_norm('e.embedding')}) AS cos
  FROM cand c
  JOIN embeddings e ON e.vec_id = c.vec_id
  JOIN probes p ON p.qid = c.qid
  WHERE c.crank <= 20
)
SELECT qid, rank, vec_id, cos FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY qid ORDER BY cos DESC, vec_id) AS rank
  FROM rescored
) WHERE rank <= 5
ORDER BY qid, rank
"""


@query(
    "ann_cosine_topk_ivf_rerank",
    tags=("similarity", "ann", "ivf", "rerank", "int8"),
    oracle=_SQL_IVF_RERANK,
)
def ann_cosine_topk_ivf_rerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Staged retrieval funnel — the production shape a retrieval
    pipeline actually runs (new round 9, verdict task 5): coarse IVF
    cell probe → CHEAP candidate rank → exact rerank of survivors →
    top-k. Three stages, each cutting the work of the next:

    1. coarse quantizer: the ladder's IVF cells (per-label round-6
       decimal centroids, nprobe=3 via _ivf_probe_cells — expressions
       shared verbatim with the registered ann_cosine_topk_ivf), so
       the scan is nprobe/ncells of the corpus;
    2. cheap rank: int8-quantized integer dot (exact, bit-identical
       across engines — operators/vectors.py quantize_int8) over only
       the nprobe-cell candidates, scalars-only through the qid
       exchange (WindowGroupLimit takes partial top-20s map-side),
       keep top-20 per probe;
    3. exact rerank: full-precision cosine for just 20·|Q| survivor
       pairs (vectors joined back via two broadcasts — the corpus is
       never shuffled), final top-5.

    vs brute: brute exact-scores n−1 candidates per probe; this
    funnel exact-scores 20 (and integer-scores only the ~3/ncells
    fraction the cells admit) — the candidates-per-probe numbers are
    in PERF.md. Every stage is deterministic (cosine/int-dot
    tie-broken by id), so unlike hash-sketch ANN the WHOLE funnel —
    coarse cut included — hash-matches the DuckDB replay."""
    from financial_data_warehouse_automation_spark.operators.vectors import int_dot, quantize_int8

    e = load_table(spark, sf_dir, "embeddings", spread_by=("vec_id",))
    probe_cells = _ivf_probe_cells(e)
    qq, _ = quantize_int8(F.col("qvec"))
    pc_q = probe_cells.select("qid", "cell", qq.alias("qq"))
    cq, _ = quantize_int8(F.col("embedding"))
    corpus_q = e.select("vec_id", F.col("label").alias("cell"), cq.alias("cq"))
    cand_ids = (
        corpus_q.join(F.broadcast(pc_q), "cell")
        .where(F.col("qid") != F.col("vec_id"))
        .select("qid", "vec_id", int_dot(F.col("qq"), F.col("cq")).alias("iscore"))
        .withColumn(
            "crank",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("iscore"), F.col("vec_id"))
            ),
        )
        .where(F.col("crank") <= 20)
        .select("qid", "vec_id")
    )
    probes = e.where(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec"),
        l2_norm(F.col("embedding")).alias("qnorm"),
    )
    rescored = (
        e.select("vec_id", "embedding", l2_norm(F.col("embedding")).alias("cnorm"))
        .join(F.broadcast(cand_ids), "vec_id")
        .join(F.broadcast(probes), "qid")
        .select(
            "qid", "vec_id",
            (
                dot(F.col("qvec"), F.col("embedding"))
                / (F.col("qnorm") * F.col("cnorm"))
            ).alias("cos"),
        )
    )
    return (
        rescored.withColumn(
            "rank",
            F.row_number().over(
                Window.partitionBy("qid").orderBy(F.desc("cos"), "vec_id")
            ),
        )
        .where(F.col("rank") <= 5)
        .select("qid", "rank", "vec_id", "cos")
    )


@query(
    "embedding_label_centroids",
    tags=("similarity", "vectors", "centroids", "llm-pipeline"),
    oracle="""
WITH dims AS (
  SELECT label, i AS dim,
         CAST(ROUND(CAST(embedding[i] AS DOUBLE), 6) AS DECIMAL(18,6)) AS v
  FROM embeddings, unnest(generate_series(1, len(embedding))) AS t(i)
)
SELECT label, dim, COUNT(*) AS n_vecs, CAST(SUM(v) AS DOUBLE) AS dim_sum
FROM dims GROUP BY label, dim
ORDER BY label, dim
""",
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-label centroid accumulation — the reduce step of distributed
    k-means expressed relationally: posexplode each vector to
    (label, dim, value), sum per (label, dim). Values are rounded to 6
    and summed as DECIMAL(18,6), so the aggregate is exact and
    shuffle-order independent (float sums are not); the centroid mean
    is dim_sum / n_vecs at the caller. Scale shape: one scan, map-side
    partial aggregation, and a shuffle keyed on (label, dim) whose
    cardinality is labels x dims — tiny regardless of corpus size."""
    e = load_table(spark, sf_dir, "embeddings")
    dims = e.select(
        "label", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "label",
        (F.col("pos") + 1).alias("dim"),
        F.round(F.col("val").cast("double"), 6).cast("decimal(18,6)").alias("v"),
    )
    return (
        dims.groupBy("label", "dim")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            # exact decimal sum, one double conversion on both sides
            F.sum("v").cast("double").alias("dim_sum"),
        )
    )


@query(
    "kmeans_lloyd_step",
    tags=("similarity", "vectors", "kmeans", "iterative"),
    oracle="""
WITH c AS (
  SELECT vec_id AS cid, embedding AS cvec FROM embeddings WHERE vec_id < 8
), d AS (
  SELECT e.vec_id, c.cid,
         list_reduce(list_transform(generate_series(1, len(e.embedding)),
           i -> (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE))
              * (CAST(e.embedding[i] AS DOUBLE) - CAST(c.cvec[i] AS DOUBLE))),
           (x, y) -> x + y) AS dist2
  FROM embeddings e CROSS JOIN c
), a AS (
  SELECT vec_id, cid,
         ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist2, cid) AS rn
  FROM d
), asg AS (
  SELECT vec_id, cid FROM a WHERE rn = 1
), dims AS (
  SELECT asg.cid, i AS dim,
         CAST(ROUND(CAST(e.embedding[i] AS DOUBLE), 6) AS DECIMAL(18,6)) AS v
  FROM asg JOIN embeddings e USING (vec_id),
       unnest(generate_series(1, len(e.embedding))) AS t(i)
)
SELECT cid, dim, COUNT(*) AS n_assigned, CAST(SUM(v) AS DOUBLE) AS dim_sum
FROM dims GROUP BY cid, dim
ORDER BY cid, dim
""",
)
def kmeans_lloyd_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One exact Lloyd iteration of k-means (k=8, centroids seeded from
    the first 8 vectors): assign each vector to its nearest centroid by
    left-fold squared-L2 (every subtract/multiply/add is IEEE-identical
    across engines, ties broken by centroid id), then emit the update
    step as per-(centroid, dim) counts and exact DECIMAL(18,6) value
    sums — the same reduce discipline as embedding_label_centroids.
    This is the oracle-checked anchor for the rows-only MLlib k-means /
    IVF variants: their convergence loop is THIS step iterated. Scale
    shape: broadcast k centroids across the corpus (no shuffle for
    assignment), one (cid, dim)-keyed shuffle for the update."""
    e = load_table(spark, sf_dir, "embeddings")
    cents = e.where(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cvec")
    )
    diff2 = F.zip_with(
        F.col("embedding"),
        F.col("cvec"),
        lambda x, y: (x.cast("double") - y.cast("double"))
        * (x.cast("double") - y.cast("double")),
    )
    dist2 = F.aggregate(diff2, F.lit(0.0), lambda acc, x: acc + x)
    d = (
        e.repartition(32, "vec_id")
        .crossJoin(F.broadcast(cents))
        .select("vec_id", "embedding", "cid", dist2.alias("dist2"))
    )
    w = Window.partitionBy("vec_id").orderBy("dist2", "cid")
    asg = (
        d.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select("vec_id", "embedding", "cid")
    )
    dims = asg.select(
        "cid", F.posexplode("embedding").alias("pos", "val")
    ).select(
        "cid",
        (F.col("pos") + 1).alias("dim"),
        F.round(F.col("val").cast("double"), 6).cast("decimal(18,6)").alias("v"),
    )
    return (
        dims.groupBy("cid", "dim")
        .agg(
            F.count(F.lit(1)).alias("n_assigned"),
            # exact decimal sum, one double conversion on both sides
            F.sum("v").cast("double").alias("dim_sum"),
        )
    )


_CLF_DIM = 64
_CLF_W = [((j * 37) % 19 - 9) / 10.0 for j in range(_CLF_DIM)]
_CLF_B = -0.05
_SQL_CLF_W = "[" + ", ".join(str(v) for v in _CLF_W) + "]::DOUBLE[]"


@query(
    "embedding_quality_classifier",
    tags=("similarity", "inference", "classifier", "llm-pipeline"),
    oracle=f"""
WITH scored AS (
  SELECT label,
         list_reduce(list_transform(generate_series(1, len(embedding)),
           i -> ({_SQL_CLF_W})[i] * CAST(embedding[i] AS DOUBLE)),
           (x, y) -> x + y) + {_CLF_B} AS z
  FROM embeddings
)
SELECT label,
       (z > 0.0) AS keep,
       COUNT(*) AS n,
       CAST(SUM(CAST(ROUND(1.0 / (1.0 + exp(-z)), 6) AS DECIMAL(9,6)))
            AS DOUBLE) AS sum_score
FROM scored
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def embedding_quality_classifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Classifier-based curation filter run as pure column expressions —
    the fastText-style quality gate every LLM data pipeline applies,
    and the ICDE'25 'ML inference in SQL via operator fusion' shape:
    a fixed linear model (deterministic weights) scores each embedding
    with the left-fold dot product, sigmoid for the score, sign of the
    logit for the keep decision. No UDF, no model server — the whole
    inference fuses into the scan projection, so at 100 TB it runs at
    scan speed with zero shuffle before the tiny per-(label, keep)
    aggregate. The keep decision compares the exact logit to 0 (no
    transcendental on the decision path); the reported score sum rounds
    sigmoid to 6 decimals into an exact decimal accumulation."""
    e = load_table(spark, sf_dir, "embeddings")
    w = F.array(*[F.lit(v) for v in _CLF_W])
    z = dot(w, F.col("embedding")) + F.lit(_CLF_B)
    score = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("z")))
    return (
        e.select("label", z.alias("z"))
        .select("label", (F.col("z") > 0.0).alias("keep"),
                F.round(score, 6).cast("decimal(9,6)").alias("s"))
        .groupBy("label", "keep")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("s").cast("double").alias("sum_score"),
        )
    )


@query(
    "embedding_gram_matrix",
    tags=("similarity", "vectors", "pca", "llm-pipeline"),
    oracle="""
WITH q AS (
  SELECT vec_id,
         list_transform(embedding,
           x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS qv
  FROM embeddings
)
SELECT i AS dim_i, j AS dim_j,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(SUM(qv[i] * qv[j]) AS BIGINT) AS gram_milli
FROM q,
     unnest(generate_series(1, len(qv))) AS ti(i),
     unnest(generate_series(1, len(qv))) AS tj(j)
WHERE j >= i
GROUP BY 1, 2
ORDER BY 1, 2
""",
)
def embedding_gram_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Upper-triangle Gram/covariance accumulation X^T X — the reduce
    step of distributed PCA (the covariance matrix is gram/n minus the
    centroid outer product, both derivable from this output plus
    embedding_label_centroids). Values are quantized to milli-units as
    int64 BEFORE multiplying, so every product and sum is exact integer
    arithmetic — shuffle-order independent with no decimal machinery
    (|q| <= ~5e3, so a cell overflows int64 only past ~3e11 rows).

    Scale shape: NO self-join — each row expands its own dim*(dim+1)/2
    upper-triangle products via nested array transforms in one
    projection, and the aggregate map-side-combines to at most 2,080
    cells (dim=64) per partition before a shuffle whose cardinality is
    dim^2, independent of corpus size. The alternative posexplode +
    self-join on vec_id shuffles the whole corpus twice; this plans as
    scan -> generate -> partial agg -> tiny exchange. ``spread_by``
    fans the dim^2 expansion out of a single-row-group scan (guarded
    no-op on a well-split corpus)."""
    e = load_table(spark, sf_dir, "embeddings", spread_by=("vec_id",))
    pairs = F.expr("""
      flatten(transform(sequence(0, size(qv) - 1), i ->
        transform(sequence(i, size(qv) - 1), j ->
          struct(i + 1 AS dim_i, j + 1 AS dim_j,
                 qv[i] * qv[j] AS prod))))
    """)
    return (
        e.select(
            F.transform(
                "embedding",
                lambda x: F.round(x.cast("double") * 1000, 0).cast("bigint"),
            ).alias("qv")
        )
        .select(F.explode(pairs).alias("p"))
        .select("p.dim_i", "p.dim_j", "p.prod")
        .groupBy("dim_i", "dim_j")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.sum("prod").alias("gram_milli"),
        )
    )


def _sql_semdedup_oracle() -> str:
    """DuckDB replay of the SemDeDup pipeline: same md5-derived sign
    matrices inlined as literals (the _sql_rhp_oracle technique), same
    left-fold cosine, same min-id drop rule."""
    tables = [rademacher_signs(4, 64, seed=f"semdedup{t}") for t in range(2)]

    def plane_dot(plane: list[float]) -> str:
        lits = "[" + ", ".join("1.0" if s > 0 else "-1.0" for s in plane) + "]"
        return (
            f"list_reduce(list_transform(generate_series(1, 64), "
            f"j -> ({lits}::DOUBLE[])[j] * CAST(embedding[j] AS DOUBLE)), "
            f"(x, y) -> x + y)"
        )

    selects = []
    for t, planes in enumerate(tables):
        bucket = " + ".join(
            f"CASE WHEN {plane_dot(p)} >= 0 THEN {1 << i} ELSE 0 END"
            for i, p in enumerate(planes)
        )
        selects.append(
            f"SELECT vec_id, label, {t} AS tbl, {bucket} AS bucket "
            f"FROM embeddings"
        )
    bucketed = "\nUNION ALL\n".join(selects)
    return f"""
WITH bucketed AS (
{bucketed}
), cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bucketed a JOIN bucketed b
    ON a.tbl = b.tbl AND a.bucket = b.bucket AND a.label = b.label
   AND a.vec_id < b.vec_id
), dropped AS (
  SELECT DISTINCT c.id_b
  FROM cand c
  JOIN embeddings x ON x.vec_id = c.id_a
  JOIN embeddings y ON y.vec_id = c.id_b
  WHERE {_sql_dot('x.embedding', 'y.embedding')}
        / ({_sql_norm('x.embedding')} * {_sql_norm('y.embedding')}) >= 0.25
)
SELECT e.label,
       CAST(COUNT(*) AS BIGINT) AS n_vecs,
       CAST(COUNT(d.id_b) AS BIGINT) AS n_dropped,
       CAST(COALESCE(SUM(CASE WHEN d.id_b IS NOT NULL THEN e.vec_id END), 0)
            AS BIGINT) AS drop_checksum
FROM embeddings e LEFT JOIN dropped d ON e.vec_id = d.id_b
GROUP BY 1 ORDER BY 1
"""


@query(
    "embedding_semantic_dedup",
    tags=("similarity", "dedup", "semdedup", "llm-pipeline"),
    oracle=_sql_semdedup_oracle(),
)
def embedding_semantic_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup-style embedding-space dedup (Abbas et al. 2023, public):
    prune vectors that have an epsilon-near neighbor inside their
    coarse cluster, keeping one representative. Cells are
    (label, 4-bit RHP bucket) x 2 hash tables — the cluster bounds the
    candidate set semantically, the RHP sub-bucket bounds it
    COMBINATORIALLY (within-cell pairs grow with the square of cell
    population; sub-bucketing caps the quadratic term the same way the
    MinHash band join does for documents, and multiple tables recover
    recall exactly as in ann_cosine_topk_rhp). Drop rule: a vector is
    dropped iff some candidate neighbor with a LOWER vec_id clears the
    cosine threshold — the deterministic keep-first analogue of the
    paper's keep-one-per-ball, engine-replayable because both the
    md5-derived hyperplanes and the left-fold cosine are bit-identical
    in DuckDB. The synthetic corpus has no true near-dups (max pair
    cosine ~0.47), so the threshold is 0.25 to exercise the drop path;
    the operator is threshold-agnostic. Output: per-label census with
    a dropped-id checksum, so every drop decision is hash-verified."""
    e = load_table(spark, sf_dir, "embeddings")
    tables = [rademacher_signs(4, 64, seed=f"semdedup{t}") for t in range(2)]
    bucketed = None
    for t, planes in enumerate(tables):
        part = e.select(
            "vec_id",
            "label",
            F.lit(t).alias("tbl"),
            rhp_bucket("embedding", planes).alias("bucket"),
        )
        bucketed = part if bucketed is None else bucketed.unionByName(part)
    # both self-join sides reference bucketed, and Spark re-evaluates
    # shared subplans — without the cut the 2-table x 4-plane RHP fold
    # runs twice per vector (7 embeddings scans in the executed plan,
    # found by the round-7 duplicate-scan census)
    bucketed = cut(bucketed, eager=False)
    a = bucketed.select(
        F.col("tbl"), F.col("bucket"), F.col("label"),
        F.col("vec_id").alias("id_a"),
    )
    b = bucketed.select(
        F.col("tbl").alias("tbl2"), F.col("bucket").alias("bucket2"),
        F.col("label").alias("label2"), F.col("vec_id").alias("id_b"),
    )
    cand = (
        a.join(
            b,
            (F.col("tbl") == F.col("tbl2"))
            & (F.col("bucket") == F.col("bucket2"))
            & (F.col("label") == F.col("label2"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .distinct()
    )
    ex = e.select(
        F.col("vec_id").alias("id_a"), F.col("embedding").alias("va"),
        l2_norm(F.col("embedding")).alias("na"),
    )
    ey = e.select(
        F.col("vec_id").alias("id_b"), F.col("embedding").alias("vb"),
        l2_norm(F.col("embedding")).alias("nb"),
    )
    dropped = (
        cand.join(ex, "id_a")
        .join(ey, "id_b")
        # pair-invariant norms at scan: 1 fold per verify pair, not 3
        # (same bit-identical division as the ANN band, round 7)
        .where(
            dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
            >= 0.25
        )
        .select(F.col("id_b"))
        .distinct()
    )
    return (
        e.join(dropped, e.vec_id == dropped.id_b, "left")
        .groupBy("label")
        .agg(
            F.count(F.lit(1)).alias("n_vecs"),
            F.count("id_b").alias("n_dropped"),
            F.coalesce(
                F.sum(F.when(F.col("id_b").isNotNull(), F.col("vec_id"))),
                F.lit(0),
            ).alias("drop_checksum"),
        )
    )


@query(
    "embedding_power_iteration",
    tags=("similarity", "vectors", "pca", "llm-pipeline"),
    oracle="""
WITH q AS (
  SELECT list_transform(embedding,
           x -> CAST(ROUND(CAST(x AS DOUBLE) * 1000, 0) AS BIGINT)) AS qv
  FROM embeddings
), s AS (
  SELECT qv, CAST(list_sum(qv) AS BIGINT) AS sv FROM q
), t AS (
  SELECT j AS dim_idx, CAST(SUM(qv[j] * sv) AS BIGINT) AS t_milli
  FROM s, unnest(generate_series(1, len(qv))) AS tj(j)
  GROUP BY 1
), m AS (SELECT MAX(ABS(t_milli)) AS mx FROM t)
SELECT t.dim_idx, t.t_milli,
       CAST(ROUND(CAST(t.t_milli AS DOUBLE) / CAST(m.mx AS DOUBLE), 6)
            AS DOUBLE) AS v_next
FROM t CROSS JOIN m ORDER BY 1
""",
)
def embedding_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One power-iteration step toward the principal component:
    t = X^T (X v0) with v0 = the ones vector, computed the way
    distributed PCA actually does it — TWO passes over the rows (a
    per-row dot product s_i = x_i . v0, then the s_i-weighted column
    sum), never materializing X^T X. Compare embedding_gram_matrix,
    which materializes the dim^2 Gram cells; the matvec form is what
    scales when dim is too large for a dim^2 shuffle.

    Exactness: milli-unit int64 quantization (the gram-matrix
    discipline) keeps every product and sum integer, so the aggregate
    is shuffle-order independent; the result vector normalizes by its
    max-|component| (an exact integer) instead of the L2 norm — the
    L2 norm squared exceeds 2^53 and DuckDB's decimal->double cast is
    not correctly rounded, while int/int division of exact values is
    IEEE-identical everywhere. |t_j| <= ~1.6e9 per row, so int64
    holds to ~5e9 rows (document-scale bound, same class as the gram
    cell bound).

    Shape: per-row fold for s_i (no shuffle), explode to (dim, prod)
    with map-side combine to <= 64 cells per task, one dim-keyed
    exchange of 64 groups, then a broadcast single-row max.

    Empty-vector rows are filtered up front: Spark's sequence(1, 0)
    yields a DESCENDING [1, 0] while DuckDB's generate_series(1, 0)
    is empty, so an unguarded empty embedding would emit spurious
    dim_idx 0/1 NULL rows only on the Spark side (review finding)."""
    e = load_table(spark, sf_dir, "embeddings").where(F.size("embedding") > 0)
    q = e.select(
        F.transform(
            "embedding",
            lambda x: F.round(x.cast("double") * 1000, 0).cast("bigint"),
        ).alias("qv")
    )
    s = q.withColumn("sv", F.expr("aggregate(qv, 0L, (a, x) -> a + x)"))
    t = (
        s.select(
            F.explode(
                F.expr(
                    "transform(sequence(1, size(qv)), "
                    "j -> struct(j AS dim_idx, qv[j - 1] * sv AS prod))"
                )
            ).alias("p")
        )
        .select("p.dim_idx", "p.prod")
        .groupBy("dim_idx")
        .agg(F.sum("prod").alias("t_milli"))
    )
    m = t.agg(F.max(F.abs(F.col("t_milli"))).alias("mx"))
    return (
        t.crossJoin(F.broadcast(m))
        .select(
            "dim_idx",
            "t_milli",
            F.round(
                F.col("t_milli").cast("double") / F.col("mx").cast("double"), 6
            ).alias("v_next"),
        )
    )
