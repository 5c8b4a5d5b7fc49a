"""Sequence packing for LLM training-data pipelines.

Two formulations over ``documents``:

* **Concat-and-chunk** (``chunk_assignments``): within a deterministic
  shard, documents are concatenated in doc_id order and cut into
  fixed-budget token chunks; a document can straddle a chunk boundary.
  This is the standard pretraining packing scheme, and it is pure
  window algebra (prefix sum + floor division + interval explode), so
  it runs JVM-side and is oracle-checkable.

* **Greedy bins** (``greedy_pack``): whole-document first-fit into
  budget-bounded bins (no splitting — the instruction-tuning variant).
  The bin recurrence (bin resets depend on the running remainder) is
  not window algebra, so it runs as a grouped ``applyInPandas`` over
  shards — Arrow-batched, one pandas pass per shard.

Sharding is ``doc_id % n_shards`` in both: membership is a pure
function of the key, so packing is stable across runs, partitionings
and cluster sizes. At 100 TB each shard's pass is independent — the
only shuffle is the shard hash-partition; shard count scales with the
cluster, and no shard ever needs global state.

Token counts use the ``n_chars / 4`` proxy (≈ bytes-per-BPE-token);
swap in ``bpe_ish_token_count`` (operators/text.py) when exact counts
matter — the packing algebra is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def token_proxy(n_chars: F.Column | str) -> F.Column:
    """Deterministic token-count proxy: max(1, n_chars // 4)."""
    c = F.col(n_chars) if isinstance(n_chars, str) else n_chars
    return F.greatest(F.lit(1), (c / 4).cast("long"))


def chunk_assignments(
    docs: DataFrame, budget: int, n_shards: int = 32
) -> DataFrame:
    """Concat-and-chunk: (shard, chunk_id, doc_id, tok_in_chunk) rows.

    A doc whose token interval [cum - tok, cum) crosses chunk borders
    contributes a clipped slice to every chunk it touches.
    """
    from pyspark.sql import Window

    w = Window.partitionBy("shard").orderBy("doc_id").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    b = F.lit(budget)
    toks = docs.select(
        "doc_id",
        (F.col("doc_id") % n_shards).alias("shard"),
        token_proxy("n_chars").alias("tok"),
    ).withColumn("cum", F.sum("tok").over(w))
    # integer div, not double division: token prefix sums at 100 TB
    # (~1e12 per shard) sit safely in int64 but not in a double mantissa
    lo = F.expr(f"(cum - tok) div {budget}")
    hi = F.expr(f"(cum - 1) div {budget}")
    spanned = toks.withColumn("chunk_id", F.explode(F.sequence(lo, hi)))
    start = F.greatest(F.col("chunk_id") * b, F.col("cum") - F.col("tok"))
    end = F.least((F.col("chunk_id") + 1) * b, F.col("cum"))
    return spanned.select(
        "shard", "chunk_id", "doc_id", (end - start).alias("tok_in_chunk")
    )


GREEDY_OUT_SCHEMA = (
    "shard BIGINT, bin_id BIGINT, n_docs BIGINT, total_tokens BIGINT, "
    "max_doc_tokens BIGINT"
)


def greedy_pack(docs: DataFrame, budget: int, n_shards: int = 32) -> DataFrame:
    """Greedy whole-document packing: per shard, docs in doc_id order
    drop into the current bin until the budget would overflow, then a
    new bin opens (an oversized doc gets a bin of its own). Returns one
    row per bin with occupancy stats."""
    import pandas as pd

    toks = docs.select(
        "doc_id",
        (F.col("doc_id") % n_shards).alias("shard"),
        token_proxy("n_chars").alias("tok"),
    )

    def pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        shard = int(pdf["shard"].iloc[0])
        bins: list[list[int]] = []  # [n_docs, total, max_tok]
        used = 0
        for tok in pdf["tok"].astype("int64"):
            tok = int(tok)
            if not bins or used + tok > budget:
                bins.append([0, 0, 0])
                used = 0
            bins[-1][0] += 1
            bins[-1][1] += tok
            bins[-1][2] = max(bins[-1][2], tok)
            used += tok
        return pd.DataFrame(
            [(shard, i, b[0], b[1], b[2]) for i, b in enumerate(bins)],
            columns=["shard", "bin_id", "n_docs", "total_tokens", "max_doc_tokens"],
        )

    return toks.groupBy("shard").applyInPandas(pack, GREEDY_OUT_SCHEMA)
