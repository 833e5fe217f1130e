"""Multimodal column plumbing (task mandate: image/audio/video as opaque
binary + typed metadata).

The container has no image/audio codecs, so the DECODE step is stubbed
(deterministic fake features, clearly marked) — but everything Spark-side is
real and tested: binary columns, metadata structs, Arrow-batched mapInPandas
with bounded batch shape, and the partitioning story (blobs hash-partitioned
by id so feature extraction is embarrassingly parallel and no blob crosses
the wire twice).

At 100 TB the rule that matters: the binary column is NEVER shuffled — all
derived features are computed scan-side in one mapInPandas pass and only the
(id, features) projection moves on. Column pruning keeps the blob out of
every downstream plan.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

BLOB_SCHEMA = (
    "blob_id long, modality string, media binary, "
    "meta struct<width:int, height:int, sample_rate:int, n_frames:int>"
)
FEATURE_SCHEMA = "blob_id long, n_bytes long, digest string, feat array<float>"


def documents_as_blobs(docs: DataFrame) -> DataFrame:
    """Adapter: treat document text bytes as opaque media blobs — the
    plumbing fixture until real media lands. meta carries typed per-modality
    fields (NULL where not applicable), the Iceberg-friendly layout."""
    return docs.select(
        F.col("doc_id").alias("blob_id"),
        F.lit("text").alias("modality"),
        F.encode("text", "utf-8").alias("media"),
        F.struct(
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.col("n_chars").cast("int").alias("n_frames"),
        ).alias("meta"),
    )


def decode_media(media: bytes, modality: str) -> np.ndarray:
    """REAL decoder hook — intentionally unimplemented in this container
    (no PIL/ffmpeg/soundfile baked in). Prod swaps this single function."""
    raise NotImplementedError(
        f"no codec for modality={modality!r} in this environment; "
        "install PIL/ffmpeg and replace decode_media"
    )


def _fake_features(media: bytes, dim: int = 8) -> np.ndarray:
    """Deterministic STAND-IN for decode+embed: byte histogram folded to
    `dim` buckets, L2-normalized. Stable across runs/partitionings, so tests
    can assert exact values while the real codec is stubbed."""
    h = np.bincount(np.frombuffer(media, dtype=np.uint8), minlength=256)
    folded = h.reshape(dim, 256 // dim).sum(axis=1).astype(np.float64)
    n = np.linalg.norm(folded)
    return (folded / n if n else folded).astype(np.float32)


def extract_features(
    blobs: DataFrame, batch_size: int = 1024, use_real_decoder: bool = False
) -> DataFrame:
    """Arrow-batched feature extraction over binary media (J2 surface).

    mapInPandas streams RecordBatches — at no point does an executor hold
    more than `batch_size` blobs in Python memory (set via
    spark.sql.execution.arrow.maxRecordsPerBatch in session.py).
    """
    import hashlib

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for b in batches:
            feats, digests, sizes = [], [], []
            for media, modality in zip(b["media"], b["modality"]):
                raw = bytes(media)
                sizes.append(len(raw))
                digests.append(hashlib.sha256(raw).hexdigest())
                if use_real_decoder:
                    feats.append(decode_media(raw, modality))  # NotImplementedError
                else:
                    feats.append(_fake_features(raw))
            yield pd.DataFrame(
                {
                    "blob_id": b["blob_id"],
                    "n_bytes": sizes,
                    "digest": digests,
                    "feat": feats,
                }
            )

    return blobs.mapInPandas(run, FEATURE_SCHEMA)


def frame_sample(blobs: DataFrame, every_n: int = 1000) -> DataFrame:
    """Frame/segment sampler plumbing: emits (blob_id, frame_no, offset)
    rows WITHOUT decoding — pure byte-offset arithmetic, real at any scale.
    A video decoder would replace the offset math with keyframe indices."""
    n_frames = F.greatest(
        (F.length("media") / every_n).cast("int"), F.lit(1)
    )
    return blobs.select(
        "blob_id",
        F.posexplode(F.sequence(F.lit(0), n_frames - 1)).alias("frame_no", "offset_base"),
    ).select(
        "blob_id",
        "frame_no",
        (F.col("offset_base") * every_n).alias("byte_offset"),
    )
