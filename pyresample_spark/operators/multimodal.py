"""Multimodal column plumbing: image/audio/video as opaque ``binary``
columns + typed metadata, processed with Arrow-batched ``mapInPandas``.

The decode kernels themselves are STUBBED (the image/audio libraries are
not in this container — see :func:`decode_image`); everything Spark-side
is real and tested: schemas, batch iteration, partitioning, and the
deterministic fake feature extractor used by q_multimodal_meta.

Scale notes: binary payloads ride the Arrow channel in batches
(``spark.sql.execution.arrow.maxRecordsPerBatch`` bounds batch memory);
heavy decode work should be partition-parallel (``repartition(n)``
before ``mapInPandas`` if payload sizes are skewed). Frame sampling /
resizing emit one row per frame via the iterator protocol — no
collect, no driver involvement.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "doc_id long, payload binary, media_type string, "
    "n_bytes long, fake_width long, fake_height long, checksum long"
)


def decode_image(payload: bytes):
    """Decode an image payload to HxWxC pixels.

    STUB: no imaging library is available in this environment. On a
    real cluster, plug Pillow/torchvision here; the surrounding Spark
    plumbing (schema, batching, partitioning) is unchanged.
    """
    raise NotImplementedError(
        "image decode requires an imaging library (e.g. Pillow); "
        "not available in this environment"
    )


def sample_frames(payload: bytes, every_n: int = 10):
    """Sample video frames. STUB — see :func:`decode_image`."""
    raise NotImplementedError("video decode not available in this environment")


def _fake_features(payload: bytes) -> tuple:
    """Deterministic stand-in for feature extraction: derive metadata
    purely from the bytes so tests (and the DuckDB oracle) can verify
    the plumbing end-to-end."""
    n = len(payload)
    checksum = sum(payload[:64]) if n else 0
    return n, (n * 7) % 640 + 1, (n * 13) % 480 + 1, checksum


def extract_media_meta(media: DataFrame) -> DataFrame:
    """mapInPandas feature extraction over (doc_id, payload, media_type).

    Arrow-batched; one output row per input row. Swap
    :func:`_fake_features` for a real decoder on a cluster with the
    media libraries installed.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            feats = pdf["payload"].map(_fake_features)
            out = pdf[["doc_id", "payload", "media_type"]].copy()
            out["n_bytes"] = [f[0] for f in feats]
            out["fake_width"] = [f[1] for f in feats]
            out["fake_height"] = [f[2] for f in feats]
            out["checksum"] = [f[3] for f in feats]
            yield out

    return media.mapInPandas(run, MEDIA_SCHEMA)


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Treat document text bytes as an opaque payload column — the
    schema/partitioning shape of a real image table."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text/plain").alias("media_type"),
    )


FRAME_SCHEMA = (
    "doc_id long, frame_idx long, frame_bytes long, frame_checksum long"
)


def sample_frames_df(
    media: DataFrame, every_n: int = 10, frame_size: int = 256
) -> DataFrame:
    """Frame-sampling plumbing: each payload emits ONE ROW PER SAMPLED
    FRAME (1→N through the mapInPandas iterator — the shape a real
    video decoder needs; :func:`sample_frames` is where ffmpeg/pyav
    would plug in). The deterministic fake treats the payload as
    fixed-size byte frames and keeps every ``every_n``-th, so the
    whole 1→N pipeline — batching, row amplification, per-frame
    metadata — is verifiable end-to-end by the q_frame_sample oracle.

    Scale: amplification happens executor-side inside Arrow batches
    (never on the driver); a downstream ``repartition`` can rebalance
    if per-payload frame counts are skewed.
    """

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, sizes, sums = [], [], [], []
            for doc_id, payload in zip(pdf["doc_id"], pdf["payload"]):
                n = len(payload)
                total = (n + frame_size - 1) // frame_size
                for f in range(0, total, every_n):
                    chunk = payload[f * frame_size : (f + 1) * frame_size]
                    ids.append(doc_id)
                    idxs.append(f)
                    sizes.append(len(chunk))
                    sums.append(sum(chunk[:16]))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame_bytes": pd.Series(sizes, dtype="int64"),
                    "frame_checksum": pd.Series(sums, dtype="int64"),
                }
            )

    return media.mapInPandas(run, FRAME_SCHEMA)
