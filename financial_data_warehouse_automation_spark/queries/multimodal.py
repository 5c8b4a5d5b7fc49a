"""Multimodal queries (SURVEY §2.10): binary payload + typed-metadata
plumbing over a deterministic media table derived from ``documents``.

Because the payload is the documents' utf-8 bytes, even the
pandas-UDF outputs (md5 digests, frame slices) have exact DuckDB
oracles — the Arrow plumbing is verified end to end, not just
rows-counted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from financial_data_warehouse_automation_spark.operators.multimodal import (
    decode_features,
    sample_frames,
    synth_media_table,
)
from financial_data_warehouse_automation_spark.functions.scalars import md5_prefix_int
from financial_data_warehouse_automation_spark.lineage import cut
from financial_data_warehouse_automation_spark.registry import query
from financial_data_warehouse_automation_spark.tables import load_table


@query(
    "media_metadata_stats",
    tags=("multimodal", "binary", "agg"),
    oracle="""
WITH media AS (
  SELECT doc_id AS media_id,
         ['image', 'audio', 'video'][CAST(doc_id % 3 AS INTEGER) + 1] AS media_type,
         strlen(text) AS n_bytes,
         CAST(64 + (doc_id % 8) * 16 AS INTEGER) AS width,
         CAST(48 + (doc_id % 5) * 16 AS INTEGER) AS height
  FROM documents
)
SELECT media_type,
       COUNT(*) AS n_items,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       CAST(MAX(width) AS BIGINT) AS max_width,
       CAST(MIN(height) AS BIGINT) AS min_height
FROM media GROUP BY media_type ORDER BY media_type
""",
)
def media_metadata_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payloads flow through scan→agg untouched; stats come from
    the payload length and the typed metadata struct."""
    d = load_table(spark, sf_dir, "documents")
    m = synth_media_table(d)
    return (
        m.groupBy("media_type")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum(F.length("payload")).alias("total_bytes"),
            F.max("meta.width").cast("long").alias("max_width"),
            F.min("meta.height").cast("long").alias("min_height"),
        )
    )


@query(
    "media_decode_checksums",
    tags=("multimodal", "pandas-udf", "mapInPandas"),
    oracle="""
SELECT doc_id AS media_id,
       strlen(text) AS n_bytes,
       md5(text) AS checksum
FROM documents
WHERE doc_id % 10 = 0
ORDER BY media_id
""",
)
def media_decode_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The mapInPandas decode path (Arrow batches → python → Arrow),
    hash-checked externally: md5-over-payload must equal DuckDB's
    md5-over-text since the payload IS the utf-8 text."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    m = synth_media_table(d)
    return (
        decode_features(m)
        .select("media_id", "n_bytes", "checksum")
    )


@query(
    "media_feature_histograms",
    tags=("multimodal", "features", "pandas-udf"),
    oracle=r"""
WITH media AS (
  SELECT doc_id AS media_id, text FROM documents WHERE doc_id % 25 = 0
), chars AS (
  SELECT media_id, strlen(text) AS n_bytes, ascii(x) % 16 AS bin
  FROM media, LATERAL unnest(regexp_extract_all(text, '.')) AS t(x)
)
SELECT media_id, n_bytes, CAST(bin AS INTEGER) AS bin, COUNT(*) AS n
FROM chars
GROUP BY 1, 2, 3
ORDER BY media_id, bin
""",
)
def media_feature_histograms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-histogram features (16-bin) per payload via mapInPandas —
    the feature-extraction UDF shape (decode → vector) with a
    deterministic fake extractor. The L1-normalized vector is
    de-normalized back to exact integer bin counts (round(f·n_bytes)
    recovers the integer exactly for payloads ≪ 2^26 bytes), so the
    whole UDF path — Arrow batch in, vector out — hash-checks against
    a DuckDB per-character recompute; empty bins drop on both sides."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 25 == 0)
    feats = decode_features(synth_media_table(d))
    ex = feats.select(
        "media_id", "n_bytes", F.posexplode("features").alias("bin", "f")
    )
    return (
        ex.select(
            "media_id",
            "n_bytes",
            F.col("bin").cast("int").alias("bin"),
            F.round(F.col("f") * F.col("n_bytes")).cast("long").alias("n"),
        )
        .where(F.col("n") > 0)
    )


@query(
    "media_frame_samples",
    tags=("multimodal", "frames", "pandas-udf"),
    oracle="""
WITH media AS (
  SELECT doc_id AS media_id, text FROM documents
  WHERE ['image', 'audio', 'video'][CAST(doc_id % 3 AS INTEGER) + 1] = 'video'
    AND doc_id % 10 = 0
), frames AS (
  SELECT media_id,
         CAST(i AS INTEGER) AS frame_idx,
         md5(substring(text, i * 256 + 1, 256)) AS frame_md5
  FROM media, LATERAL (
    SELECT unnest(generate_series(0, greatest(strlen(text) - 1, 0) // 256)) AS i
  ) u
)
SELECT media_id, frame_idx, frame_md5 FROM frames
ORDER BY media_id, frame_idx
""",
)
def media_frame_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling of 'video' payloads: fixed 256-byte frames, one
    row per frame with digest, via mapInPandas — digests hash-checked
    against DuckDB slicing the same bytes."""
    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    m = synth_media_table(d).where(F.col("media_type") == "video")
    return sample_frames(m, frame_bytes=256)


@query(
    "media_grouped_stats_udaf",
    tags=("multimodal", "udaf", "applyInPandas"),
    oracle="""
WITH media AS (
  SELECT doc_id AS media_id,
         ['image', 'audio', 'video'][CAST(doc_id % 3 AS INTEGER) + 1] AS media_type,
         strlen(text) AS n_bytes,
         md5(text) AS checksum
  FROM documents
)
SELECT media_type,
       COUNT(*) AS n_items,
       CAST(SUM(n_bytes) AS BIGINT) AS total_bytes,
       COUNT(DISTINCT checksum) AS n_distinct_payloads
FROM media GROUP BY media_type ORDER BY media_type
""",
)
def media_grouped_stats_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The UDAF escape hatch (SURVEY §2.10): a custom grouped aggregation
    via applyInPandas — each media_type's rows arrive as one pandas
    DataFrame (Arrow), python computes the aggregate, Arrow returns it.
    Integer outputs keep it exactly oracle-checkable. At scale: the
    shuffle groups by media_type; skewed groups bound worker memory, so
    real pipelines pre-aggregate or salt before a pandas UDAF — noted
    here because this is the one operator family where Spark can't
    partial-aggregate for you."""
    import hashlib

    import pandas as pd

    d = load_table(spark, sf_dir, "documents")
    m = synth_media_table(d)

    def agg(pdf: pd.DataFrame) -> pd.DataFrame:
        checks = {hashlib.md5(p).hexdigest() for p in pdf["payload"]}
        return pd.DataFrame(
            [
                {
                    "media_type": pdf["media_type"].iloc[0],
                    "n_items": len(pdf),
                    "total_bytes": int(pdf["payload"].map(len).sum()),
                    "n_distinct_payloads": len(checks),
                }
            ]
        )

    schema = (
        "media_type string, n_items bigint, total_bytes bigint, "
        "n_distinct_payloads bigint"
    )
    return (
        m.select("media_type", "payload")
        .groupBy("media_type")
        .applyInPandas(agg, schema)
    )


@query(
    "media_resize",
    tags=("multimodal", "resize", "pandas-udf"),
    oracle="""
WITH media AS (
  SELECT doc_id AS media_id, text,
         CAST(64 + (doc_id % 8) * 16 AS INTEGER) AS width,
         CAST(48 + (doc_id % 5) * 16 AS INTEGER) AS height
  FROM documents WHERE doc_id % 20 = 0
)
SELECT media_id,
       width // 2 AS new_width,
       height // 2 AS new_height,
       CAST((strlen(text) + 1) // 2 AS BIGINT) AS n_bytes,
       md5(array_to_string(list_transform(
         generate_series(1, strlen(text), 2),
         i -> substring(text, CAST(i AS INTEGER), 1)), '')) AS resized_md5
FROM media ORDER BY media_id
""",
)
def media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resize via mapInPandas: every-2nd-byte downsample + halved dims —
    the resize-UDF plumbing with the codec faked deterministically, so
    even the resized payload digest is hash-checked against DuckDB
    slicing the same characters."""
    import hashlib

    from financial_data_warehouse_automation_spark.operators.multimodal import resize_media

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 20 == 0)
    m = synth_media_table(d)
    resized = resize_media(m, factor=2)
    digest = F.md5(F.col("payload"))
    return resized.select(
        "media_id", "new_width", "new_height", "n_bytes",
        digest.alias("resized_md5"),
    )


@query(
    "media_audio_energy",
    tags=("multimodal", "audio", "pandas-udf"),
    oracle=r"""
WITH media AS (
  SELECT doc_id AS media_id, text FROM documents
  WHERE ['image', 'audio', 'video'][CAST(doc_id % 3 AS INTEGER) + 1] = 'audio'
    AND doc_id % 10 = 0
), windows AS (
  SELECT media_id,
         CAST(i AS INTEGER) AS window_idx,
         substring(text, i * 256 + 1, 256) AS w
  FROM media, LATERAL (
    SELECT unnest(generate_series(0, greatest(strlen(text) - 1, 0) // 256)) AS i
  ) u
)
SELECT media_id, window_idx,
       CAST(strlen(w) AS INTEGER) AS n_samples,
       CAST(list_reduce(list_prepend(0, list_transform(
              regexp_extract_all(w, '.'), x -> ascii(x))),
            (a, b) -> a + b) AS BIGINT) AS energy,
       CAST(list_reduce(list_prepend(0, list_transform(
              regexp_extract_all(w, '.'), x -> ascii(x))),
            (a, b) -> greatest(a, b)) AS INTEGER) AS peak
FROM windows
ORDER BY media_id, window_idx
""",
)
def media_audio_energy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Loudness profiling of 'audio' payloads: fixed 256-sample windows,
    exact integer energy (sum of u8 samples) and peak per window via
    mapInPandas + numpy — the VAD/silence-trim shape with a byte-exact
    DuckDB oracle (payload bytes are the ASCII text bytes, so
    ascii-per-char reproduces them)."""
    from financial_data_warehouse_automation_spark.operators.multimodal import audio_energy_windows

    d = load_table(spark, sf_dir, "documents").where(F.col("doc_id") % 10 == 0)
    m = synth_media_table(d).where(F.col("media_type") == "audio")
    return audio_energy_windows(m, window_bytes=256)


@query(
    "media_shared_frame_neardup",
    tags=("multimodal", "dedup", "frames", "bitops"),
    oracle="""
WITH media AS (
  SELECT doc_id AS media_id, text FROM documents
), frames AS (
  SELECT media_id,
         md5(substring(text, i * 256 + 1, 256)) AS frame_md5
  FROM media, LATERAL (
    SELECT unnest(generate_series(0, greatest(strlen(text) - 1, 0) // 256)) AS i
  ) u
), pairs AS (
  SELECT a.media_id AS id_a, b.media_id AS id_b,
         COUNT(*) AS n_shared_frames
  FROM frames a JOIN frames b
    ON a.frame_md5 = b.frame_md5 AND a.media_id < b.media_id
  GROUP BY 1, 2
), phash AS (
  SELECT media_id,
         CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) AS phash
  FROM media
)
SELECT p.id_a, p.id_b,
       CAST(p.n_shared_frames AS BIGINT) AS n_shared_frames,
       CAST(bit_count(xor(ha.phash, hb.phash)) AS BIGINT) AS payload_hamming
FROM pairs p
JOIN phash ha ON p.id_a = ha.media_id
JOIN phash hb ON p.id_b = hb.media_id
ORDER BY id_a, id_b
""",
)
def media_shared_frame_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shot-level media dedup: candidate pairs = media sharing at least
    one identical 256-byte frame digest (the join keys on the FRAME
    hash, so fan-out is bounded by duplicate-frame group sizes — the
    same banded argument as MinHash-LSH, never media x media), then
    each pair is scored with the Hamming distance between the media's
    60-bit payload hashes via XOR + bit_count — the bit-ops plumbing a
    real perceptual-hash (pHash/dHash) verify stage runs, here over
    md5-derived bits since codecs are stubbed (operators/multimodal.py
    docstring). Exact-duplicate payloads score 0; distinct payloads
    ~30/60 bits. At 100 TB: one frame explode (Arrow-batched
    mapInPandas), one shuffle on the frame hash, broadcast-scale hash
    dim joined back per pair."""
    d = load_table(spark, sf_dir, "documents")
    m = synth_media_table(d)
    # both self-join sides reference frames, and Spark re-evaluates
    # shared subplans — without the cut the Arrow-batched frame
    # extraction (the Python-worker stage, the expensive part) runs
    # TWICE. Cached relation: (media_id, frame hash) scalars.
    frames = cut(sample_frames(m, frame_bytes=256), eager=False)
    a = frames.select(
        F.col("media_id").alias("id_a"), F.col("frame_md5").alias("h_a")
    )
    b = frames.select(
        F.col("media_id").alias("id_b"), F.col("frame_md5").alias("h_b")
    )
    pairs = (
        a.join(b, (F.col("h_a") == F.col("h_b")) & (F.col("id_a") < F.col("id_b")))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared_frames"))
    )
    phash = m.select(
        F.col("media_id").alias("p_id"),
        md5_prefix_int(F.col("payload")).alias("phash"),
    )
    ha = phash.select(F.col("p_id").alias("a_id"), F.col("phash").alias("ph_a"))
    hb = phash.select(F.col("p_id").alias("b_id"), F.col("phash").alias("ph_b"))
    return (
        pairs.join(ha, pairs.id_a == F.col("a_id"))
        .join(hb, pairs.id_b == F.col("b_id"))
        .select(
            "id_a", "id_b", "n_shared_frames",
            F.bit_count(
                F.col("ph_a").bitwiseXOR(F.col("ph_b"))
            ).cast("long").alias("payload_hamming"),
        )
    )
