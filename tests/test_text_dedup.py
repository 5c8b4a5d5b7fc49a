"""Fuzzy-dedup recall: the MinHash-LSH pipeline must recover the pairs
its exact anchor finds.

Both queries measure 3-gram shingle Jaccard at the same 0.5 threshold —
the anchor exactly (within a length-blocked compare set), LSH
approximately (banded signatures). A missed pair can only be an LSH
candidate-generation miss, so the ratio IS the banding recall. MinHash
is deterministic given the data, so this is a fixed number per SF, not
a flaky statistic: 16 bands × 4 rows detect a true 0.5-Jaccard pair
with p≈0.64 at the threshold boundary and p→1 above ~0.7, and the
synthetic near-dups sit far above threshold.
"""

from __future__ import annotations


def test_lsh_recall_vs_blocked_anchor(spark, sf_dir):
    from financial_data_warehouse_automation_spark.queries.text import (
        doc_minhash_lsh_pairs,
        doc_shingle_jaccard_blocked,
    )

    brute = {
        (r.id_a, r.id_b)
        for r in doc_shingle_jaccard_blocked(spark, sf_dir).collect()
    }
    lsh = {(r.id_a, r.id_b) for r in doc_minhash_lsh_pairs(spark, sf_dir).collect()}
    assert len(brute) > 0, "anchor found no near-dup pairs — trivial fixture"
    recall = len(brute & lsh) / len(brute)
    assert recall >= 0.9, f"LSH recall {recall:.2f} over {len(brute)} anchor pairs"
    # precision side: every LSH pair is exact-verified at >=0.5, so any
    # pair NOT in the anchor must have slipped the length window
    extras = lsh - brute
    assert len(extras) <= len(lsh) * 0.2
