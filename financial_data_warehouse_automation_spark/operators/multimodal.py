"""Multimodal-column operators (SURVEY §2.10): opaque ``binary``
payloads + typed metadata structs, processed with Arrow-batched
pandas UDFs (``mapInPandas``) — the plumbing an image/audio/video
pipeline needs, with the codec layer stubbed.

Container constraint: no image/audio libraries ship in this
environment, so ``decode_media`` is a clearly-marked stub — real
codecs raise ``NotImplementedError``; the ``application/synthetic``
mime type decodes deterministically (byte-level features), keeping the
Spark-side schema/partitioning/batch plumbing real and testable.

Scale notes: payloads stay opaque bytes end to end (no base64 blowup,
no driver collect); ``mapInPandas`` streams Arrow record batches —
bound memory per task by ``spark.sql.execution.arrow.maxRecordsPerBatch``
when payloads are large (set it in the session for real media, e.g.
64–256 rows/batch at 1–10 MB per payload).
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA_DOC = (
    "media_id bigint, media_type string, payload binary, "
    "meta struct<width:int, height:int, duration_ms:int, mime:string>"
)

FEATURE_BINS = 16

_TYPES = ["image", "audio", "video"]


def synth_media_table(docs: DataFrame) -> DataFrame:
    """Derive a deterministic multimodal table from ``documents``: the
    utf-8 text bytes play the opaque payload, metadata is formula-driven
    — so every downstream op has an external oracle while exercising
    real binary/struct plumbing."""
    t = F.element_at(
        F.array(*[F.lit(x) for x in _TYPES]), (F.col("doc_id") % 3 + 1).cast("int")
    )
    return docs.select(
        F.col("doc_id").alias("media_id"),
        t.alias("media_type"),
        F.encode("text", "utf-8").alias("payload"),
        F.struct(
            (64 + (F.col("doc_id") % 8) * 16).cast("int").alias("width"),
            (48 + (F.col("doc_id") % 5) * 16).cast("int").alias("height"),
            ((F.col("n_chars") * 40) % 90000).cast("int").alias("duration_ms"),
            F.lit("application/synthetic").alias("mime"),
        ).alias("meta"),
    )


def decode_media(batch_df: pd.DataFrame) -> pd.DataFrame:
    """Per-batch 'decode': synthetic mime → byte stats; real codecs are
    out of scope for this container (STUB)."""
    out = []
    for _, row in batch_df.iterrows():
        if row["mime"] != "application/synthetic":
            raise NotImplementedError(
                f"codec for mime {row['mime']!r} not available in this "
                "environment — plug a real decoder (PIL/ffmpeg) here"
            )
        payload: bytes = row["payload"]
        out.append(
            {
                "media_id": row["media_id"],
                "n_bytes": len(payload),
                "checksum": hashlib.md5(payload).hexdigest(),
            }
        )
    return pd.DataFrame(out)


def decode_features(df: DataFrame) -> DataFrame:
    """Arrow-batched feature extraction: 16-bin byte histogram per
    payload, L1-normalized — a real (if crude) content feature that
    needs no codec. ``mapInPandas`` so one Python worker call handles a
    whole Arrow batch (never row-at-a-time)."""
    schema = (
        "media_id bigint, n_bytes bigint, checksum string, "
        f"features array<double>"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, row in b.iterrows():
                payload: bytes = row["payload"]
                hist = [0] * FEATURE_BINS
                for byte in payload:
                    hist[byte % FEATURE_BINS] += 1
                total = max(len(payload), 1)
                rows.append(
                    {
                        "media_id": row["media_id"],
                        "n_bytes": len(payload),
                        "checksum": hashlib.md5(payload).hexdigest(),
                        "features": [h / total for h in hist],
                    }
                )
            yield pd.DataFrame(rows)

    return df.select("media_id", "payload").mapInPandas(run, schema)


def sample_frames(df: DataFrame, frame_bytes: int = 256) -> DataFrame:
    """'Video' frame sampling: slice the payload into fixed-size chunks
    and emit one row per frame with its digest — the shape a real
    frame-sampler (ffmpeg keyframes) would produce. Arrow-batched."""
    schema = "media_id bigint, frame_idx int, frame_md5 string"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, row in b.iterrows():
                payload: bytes = row["payload"]
                for i in range(0, max(len(payload), 1), frame_bytes):
                    rows.append(
                        {
                            "media_id": row["media_id"],
                            "frame_idx": i // frame_bytes,
                            "frame_md5": hashlib.md5(
                                payload[i : i + frame_bytes]
                            ).hexdigest(),
                        }
                    )
            yield pd.DataFrame(rows)

    return df.select("media_id", "payload").mapInPandas(run, schema)


def resize_media(df: DataFrame, factor: int = 2) -> DataFrame:
    """'Resize' = deterministic downsample: keep every ``factor``-th byte
    of the payload and scale the metadata dims — the shape of a real
    image-resize UDF (payload in, smaller payload + new dims out)
    without a codec. Arrow-batched; payload stays bytes end to end."""
    schema = (
        "media_id bigint, payload binary, "
        "new_width int, new_height int, n_bytes bigint"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, row in b.iterrows():
                resized = row["payload"][::factor]
                rows.append(
                    {
                        "media_id": row["media_id"],
                        "payload": resized,
                        "new_width": row["width"] // factor,
                        "new_height": row["height"] // factor,
                        "n_bytes": len(resized),
                    }
                )
            yield pd.DataFrame(rows)

    return df.select(
        "media_id", "payload", "meta.width", "meta.height"
    ).mapInPandas(run, schema)


def audio_energy_windows(df: DataFrame, window_bytes: int = 256) -> DataFrame:
    """'Audio' energy profile: treat the payload as unsigned 8-bit PCM,
    slice into fixed windows, and emit exact integer moments per window
    (sum and peak of sample values) — the shape a real loudness/VAD
    pass produces (RMS thresholds, silence trimming). Integer math so
    the result is byte-exact against an external oracle. Arrow-batched
    ``mapInPandas``; numpy vectorizes the per-window fold."""
    import numpy as np

    schema = (
        "media_id bigint, window_idx int, n_samples int, "
        "energy bigint, peak int"
    )

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            rows = []
            for _, row in b.iterrows():
                samples = np.frombuffer(row["payload"], dtype=np.uint8)
                for i in range(0, max(len(samples), 1), window_bytes):
                    w = samples[i : i + window_bytes]
                    rows.append(
                        {
                            "media_id": row["media_id"],
                            "window_idx": i // window_bytes,
                            "n_samples": int(w.size),
                            "energy": int(w.astype(np.int64).sum()),
                            "peak": int(w.max()) if w.size else 0,
                        }
                    )
            yield pd.DataFrame(rows)

    return df.select("media_id", "payload").mapInPandas(run, schema)
