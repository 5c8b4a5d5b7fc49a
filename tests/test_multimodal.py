"""Exactness check for the byte-histogram feature extractor: the
mapInPandas output must equal a pure-python recompute on the same
payload bytes (the rows-only query can't see value regressions)."""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from financial_data_warehouse_automation_spark.operators.multimodal import (
    FEATURE_BINS,
    decode_features,
    synth_media_table,
)


def test_feature_histogram_exact(spark, sf_dir):
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .where(F.col("doc_id") % 100 == 0)
    )
    texts = {r.doc_id: r.text for r in docs.collect()}
    feats = decode_features(synth_media_table(docs)).collect()
    assert len(feats) == len(texts)
    for row in feats:
        payload = texts[row.media_id].encode("utf-8")
        hist = [0] * FEATURE_BINS
        for b in payload:
            hist[b % FEATURE_BINS] += 1
        expected = [h / max(len(payload), 1) for h in hist]
        assert row.n_bytes == len(payload)
        assert row.checksum == hashlib.md5(payload).hexdigest()
        assert list(row.features) == expected


def test_unknown_mime_raises(spark):
    import pandas as pd
    import pytest

    from financial_data_warehouse_automation_spark.operators.multimodal import decode_media

    batch = pd.DataFrame(
        [{"media_id": 1, "mime": "image/png", "payload": b"\x89PNG"}]
    )
    with pytest.raises(NotImplementedError):
        decode_media(batch)
