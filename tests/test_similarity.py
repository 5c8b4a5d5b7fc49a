"""Recall anchors for the approximate ANN paths: the sublinear variants
must retrieve a meaningful fraction of the exact brute-force top-5.
Thresholds are deliberately below measured values (0.72 / 0.52 at
sf0.01) — they catch broken bucketing, not parameter drift."""

from __future__ import annotations

import pytest

from financial_data_warehouse_automation_spark.registry import load_all


@pytest.fixture(scope="module")
def topk_pairs(spark, sf_dir):
    q = load_all()

    def pairs(name):
        return {(r.qid, r.vec_id) for r in q[name].builder(spark, sf_dir).collect()}

    return pairs


def test_rhp_recall(topk_pairs):
    brute = topk_pairs("ann_cosine_topk_brute")
    rhp = topk_pairs("ann_cosine_topk_rhp")
    assert brute, "brute-force anchor returned nothing"
    assert len(brute & rhp) / len(brute) >= 0.4


def test_ivf_recall(topk_pairs):
    brute = topk_pairs("ann_cosine_topk_brute")
    ivf = topk_pairs("ann_cosine_topk_ivf")
    assert brute, "brute-force anchor returned nothing"
    assert len(brute & ivf) / len(brute) >= 0.2


def test_kmeans_ivf_recall(topk_pairs):
    brute = topk_pairs("ann_cosine_topk_brute")
    km = topk_pairs("ann_cosine_topk_ivf_kmeans")
    assert brute
    assert len(brute & km) / len(brute) >= 0.2
