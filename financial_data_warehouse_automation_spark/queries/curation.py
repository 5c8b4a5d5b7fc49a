"""Training-data curation queries over ``documents`` — round-5 depth
additions to the LLM-pipeline band (SURVEY §2.10 extensions): the data
ordering / mixing / tokenizer-training steps that sit between the
dedup+quality gates (queries/text.py) and the packing step
(operators/packing.py) in a real pretraining pipeline.

Determinism across engines is the usual registry contract: hashes are
pure int64 arithmetic (no engine-specific hash builtins), moments
accumulate as exact decimals, and transcendentals run on identical
doubles and round before any reduction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from financial_data_warehouse_automation_spark.operators.ranks import global_row_number
from financial_data_warehouse_automation_spark.registry import query
from financial_data_warehouse_automation_spark.tables import load_table

_SQL_TOKS = "string_split_regex(trim(text), '\\s+')"

# Knuth multiplicative hash (golden-ratio constant), kept in int64: a
# portable deterministic permutation both engines compute bit-identically
# — engine hash builtins (xxhash64, duckdb hash()) differ, so shuffle
# ORDER would be engine-defined and unverifiable.
#
# doc_id is masked to 31 bits BEFORE the multiply: (2^31-1) * KNUTH
# ≈ 5.7e18 < int64 max, so the product can never overflow — without
# the mask, doc_id >= ~3.48e9 (well within a 100 TB corpus) wraps
# silently in non-ANSI Spark while DuckDB raises, and the two engines
# diverge instead of failing. For doc_id < 2^31 the mask is the
# identity, so small-scale results are unchanged. doc_id must be
# non-negative (Spark % and DuckDB % agree only there; testdata and
# any sane surrogate key satisfy it).
_KNUTH = 2654435761


def _hkey_spark(col: str = "doc_id") -> F.Column:
    return ((F.col(col) % 2147483648) * _KNUTH) % 2147483648


_HKEY_SQL = f"((doc_id % 2147483648) * {_KNUTH}) % 2147483648"


@query(
    "doc_shuffle_order",
    tags=("text", "shuffle", "ordering", "llm-pipeline"),
    oracle=f"""
WITH h AS (
  SELECT doc_id, {_HKEY_SQL} AS hkey
  FROM documents
), ranked AS (
  SELECT doc_id, hkey,
         ROW_NUMBER() OVER (ORDER BY hkey, doc_id) AS rnk
  FROM h
)
SELECT rnk % 16 AS slot,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(doc_id) AS BIGINT) AS sum_doc_id,
       CAST(SUM(rnk) AS BIGINT) AS sum_rank,
       CAST(MIN(hkey) AS BIGINT) AS min_hkey
FROM ranked GROUP BY 1 ORDER BY 1
""",
)
def doc_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle order for training reproducibility:
    every document gets a total-order position under a seeded
    multiplicative hash — the 'shuffle the corpus once, identically,
    on any cluster size' step every pretraining run needs (an RNG-based
    shuffle is partition-count dependent; a hash order is not). The
    rank is the two-pass bucket-offset global row_number
    (operators/ranks.py) — the multiplicative hash spreads doc_ids
    uniformly over the value range, so the 32 range buckets are
    near-equal and the widest sort in the plan is ~N/32 rows, not N.
    Output folds every rank into 16 residue-class checksums: any
    single rank being off moves a doc across classes and breaks two
    sums, so the oracle proves the entire permutation, not a sample."""
    d = load_table(spark, sf_dir, "documents")
    h = d.select("doc_id", _hkey_spark().alias("hkey"))
    ranked = global_row_number(h, "hkey", ("doc_id",), "rnk")
    return (
        ranked.groupBy((F.col("rnk") % 16).alias("slot"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("doc_id").alias("sum_doc_id"),
            F.sum("rnk").alias("sum_rank"),
            F.min("hkey").alias("min_hkey"),
        )
    )


@query(
    "doc_source_mixing_weights",
    tags=("text", "mixing", "sampling", "llm-pipeline"),
    oracle=f"""
WITH st AS (
  SELECT source, CAST(SUM(len({_SQL_TOKS})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
), p AS (
  SELECT source, n_tokens,
         CAST(ROUND(POWER(CAST(n_tokens AS DOUBLE), 0.5), 6)
              AS DECIMAL(24,6)) AS pw
  FROM st
), tot AS (
  SELECT SUM(pw) AS sum_pw, SUM(n_tokens) AS sum_tok FROM p
)
SELECT p.source, p.n_tokens,
       ROUND(CAST(p.pw AS DOUBLE) / CAST(t.sum_pw AS DOUBLE), 6) AS weight,
       ROUND((CAST(p.pw AS DOUBLE) / CAST(t.sum_pw AS DOUBLE))
             / (CAST(p.n_tokens AS DOUBLE) / t.sum_tok), 4) AS boost
FROM p CROSS JOIN tot t ORDER BY p.source
""",
)
def doc_source_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (alpha = 0.5): the sampling
    weight per corpus source is n_tokens^alpha renormalized — the
    standard multilingual/multi-source rebalancing rule (alpha < 1
    upsamples small sources, alpha = 1 is natural sampling). ``boost``
    is the resulting up/down-sampling factor vs the natural token
    share, i.e. what the data loader multiplies each source's
    per-epoch pass count by. Determinism: token counts are exact
    int64; each n^0.5 runs on an identical double in both engines and
    rounds to DECIMAL(24,6) BEFORE the normalizing sum (exact, order
    independent); the final two divisions are single double
    expressions over exact operands, rounded at unit scale. Shape: one
    token-count aggregate keyed on source (map-side combined), then a
    |sources|-row frame — corpus volume touches only the first scan."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    st = d.groupBy("source").agg(F.sum(F.size(toks)).alias("n_tokens"))
    p = st.select(
        "source",
        "n_tokens",
        F.round(F.pow(F.col("n_tokens").cast("double"), 0.5), 6)
        .cast("decimal(24,6)")
        .alias("pw"),
    )
    tot = p.agg(
        F.sum("pw").alias("sum_pw"), F.sum("n_tokens").alias("sum_tok")
    )
    w = F.col("pw").cast("double") / F.col("sum_pw").cast("double")
    nat = F.col("n_tokens").cast("double") / F.col("sum_tok")
    return (
        p.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_tokens",
            F.round(w, 6).alias("weight"),
            F.round(w / nat, 4).alias("boost"),
        )
    )


@query(
    "doc_bpe_pair_step",
    tags=("text", "tokenizer", "bpe", "llm-pipeline"),
    oracle=f"""
WITH words AS (
  SELECT unnest({_SQL_TOKS}) AS w FROM documents
), pairs AS (
  SELECT substr(w, CAST(i.i AS INTEGER), 2) AS pair
  FROM words, LATERAL (SELECT unnest(range(1, len(w))) AS i) i
  WHERE len(w) >= 2
)
SELECT pair, CAST(COUNT(*) AS BIGINT) AS n
FROM pairs GROUP BY 1
ORDER BY n DESC, pair LIMIT 20
""",
)
def doc_bpe_pair_step(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE-training iteration's pair census: count adjacent symbol
    pairs (here the character-level step 0) across every word
    occurrence in the corpus and surface the top merge candidates —
    the inner loop of byte-pair-encoding tokenizer training, which at
    corpus scale is exactly this distributed count. Shape: the
    canonical word-frequency-table formulation (what every BPE
    trainer builds first) — count occurrences per DISTINCT word (one
    map-side-combined aggregate whose reduce side is vocabulary-
    sized, Zipf-tiny next to the corpus), THEN expand each vocab
    entry's len-1 adjacent 2-char offsets once and sum the word
    counts per pair. Identical census to expanding every occurrence
    (pair count per word x occurrences = sum of counts), but the
    substr/explode work is per vocab entry, not per corpus word —
    ~150x fewer generated rows at sf1 (round 7). The pair keyspace
    is bounded (alphabet^2), so the final shuffle is tiny regardless
    of corpus size; successive merge rounds would re-run the same
    plan over the re-segmented vocabulary."""
    d = load_table(spark, sf_dir, "documents")
    vocab = (
        d.select(F.explode(F.split(F.trim(F.col("text")), r"\s+")).alias("w"))
        .where(F.length("w") >= 2)
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("n_occ"))
    )
    pairs = vocab.select(
        "n_occ",
        F.explode(
            F.expr("transform(sequence(1, length(w) - 1), i -> substring(w, i, 2))")
        ).alias("pair"),
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("n_occ").alias("n"))
        .orderBy(F.desc("n"), "pair")
        .limit(20)
    )


@query(
    "doc_importance_resample",
    tags=("text", "mixing", "sampling", "llm-pipeline"),
    oracle=f"""
WITH st AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len({_SQL_TOKS})) AS BIGINT) AS n_tokens
  FROM documents GROUP BY 1
), p AS (
  SELECT source, n_docs, n_tokens,
         CAST(ROUND(POWER(CAST(n_tokens AS DOUBLE), 0.5), 6)
              AS DECIMAL(24,6)) AS pw
  FROM st
), tot AS (
  SELECT SUM(pw) AS sum_pw, CAST(SUM(n_docs) AS BIGINT) AS n_total FROM p
), keep_p AS (
  SELECT p.source, p.n_docs,
         LEAST(CAST(1.0 AS DOUBLE),
               ROUND(CAST(p.pw AS DOUBLE) / CAST(t.sum_pw AS DOUBLE), 6)
               * ((t.n_total + 1) // 2) / p.n_docs) AS pk
  FROM p CROSS JOIN tot t
), decided AS (
  SELECT d.doc_id, d.source,
         (CAST(((d.doc_id % 2147483648) * {_KNUTH}) % 2147483648 AS DOUBLE)
          / CAST(2147483648 AS DOUBLE)) < k.pk AS kept
  FROM documents d JOIN keep_p k ON d.source = k.source
)
SELECT source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       CAST(COALESCE(SUM(CASE WHEN kept THEN doc_id END), 0) AS BIGINT)
         AS kept_checksum
FROM decided GROUP BY 1 ORDER BY 1
""",
)
def doc_importance_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The sampling step that CONSUMES doc_source_mixing_weights: draw
    a half-epoch corpus whose source mixture follows the temperature
    weights, with a DETERMINISTIC per-document coin — u(doc) =
    Knuth-hash(doc_id)/2^31 compared against the source's keep
    probability (quota weight*T over source population, capped at 1).
    A rand()-based sampler gives a different corpus per run and per
    partition layout; the hash coin gives the same corpus on any
    cluster, which is what makes ablations reproducible. Determinism
    across engines: the keep probability chain is rounded at each
    transcendental (the mixing-weights contract) and both u and pk are
    single double expressions over exact int64 — no accumulation.
    Shape: one source-grain aggregate, a |sources|-row broadcast onto
    the doc scan, one output aggregate; per-doc work is a hash and a
    compare. Output: per-source census + kept-id checksum, so every
    individual keep/drop decision is hash-verified."""
    d = load_table(spark, sf_dir, "documents")
    toks = F.split(F.trim(F.col("text")), r"\s+")
    st = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(toks)).alias("n_tokens"),
    )
    p = st.select(
        "source",
        "n_docs",
        F.round(F.pow(F.col("n_tokens").cast("double"), 0.5), 6)
        .cast("decimal(24,6)")
        .alias("pw"),
    )
    tot = p.agg(
        F.sum("pw").alias("sum_pw"),
        F.sum("n_docs").cast("bigint").alias("n_total"),
    )
    keep_p = p.crossJoin(F.broadcast(tot)).select(
        "source",
        F.least(
            F.lit(1.0),
            F.round(F.col("pw").cast("double") / F.col("sum_pw").cast("double"), 6)
            * F.floor((F.col("n_total") + 1) / 2)
            / F.col("n_docs"),
        ).alias("pk"),
    )
    u = _hkey_spark().cast("double") / F.lit(2147483648.0)
    decided = d.join(F.broadcast(keep_p), "source").select(
        "doc_id", "source", (u < F.col("pk")).alias("kept")
    )
    return (
        decided.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("kept"), 1).otherwise(0)).alias("n_kept"),
            F.coalesce(
                F.sum(F.when(F.col("kept"), F.col("doc_id"))), F.lit(0)
            ).alias("kept_checksum"),
        )
    )
