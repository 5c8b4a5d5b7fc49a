"""Sequence-packing invariants (operators/packing.py): budgets hold,
no document is lost, chunk algebra is exact."""

from __future__ import annotations

from pyspark.sql import functions as F

from financial_data_warehouse_automation_spark.operators.packing import (
    chunk_assignments,
    greedy_pack,
    token_proxy,
)
from financial_data_warehouse_automation_spark.tables import load_table

BUDGET = 1024


def test_chunk_assignments_exact_cover(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    chunks = chunk_assignments(d, budget=BUDGET, n_shards=8).cache()
    toks = d.select(token_proxy("n_chars").alias("tok"))

    # every token lands in exactly one chunk slice
    assert (
        chunks.agg(F.sum("tok_in_chunk")).collect()[0][0]
        == toks.agg(F.sum("tok")).collect()[0][0]
    )
    # all chunks except each shard's last hold exactly BUDGET tokens
    per_chunk = chunks.groupBy("shard", "chunk_id").agg(
        F.sum("tok_in_chunk").alias("n")
    )
    last = per_chunk.groupBy("shard").agg(F.max("chunk_id").alias("last_id"))
    full = per_chunk.join(
        last,
        (per_chunk.shard == last.shard) & (per_chunk.chunk_id < last.last_id),
    )
    assert full.where(F.col("n") != BUDGET).count() == 0
    chunks.unpersist()


def test_greedy_pack_invariants(spark, sf_dir):
    d = load_table(spark, sf_dir, "documents")
    bins = greedy_pack(d, budget=BUDGET, n_shards=8).cache()

    # no doc lost, token mass preserved
    assert bins.agg(F.sum("n_docs")).collect()[0][0] == d.count()
    toks = d.select(token_proxy("n_chars").alias("tok"))
    assert (
        bins.agg(F.sum("total_tokens")).collect()[0][0]
        == toks.agg(F.sum("tok")).collect()[0][0]
    )
    # budget respected except single-oversized-doc bins
    over = bins.where(
        (F.col("total_tokens") > BUDGET)
        & ~((F.col("n_docs") == 1) & (F.col("max_doc_tokens") > BUDGET))
    )
    assert over.count() == 0
    # deterministic: a second run packs identically
    again = greedy_pack(d, budget=BUDGET, n_shards=8)
    assert bins.exceptAll(again).count() == 0
    assert again.exceptAll(bins).count() == 0
    bins.unpersist()
