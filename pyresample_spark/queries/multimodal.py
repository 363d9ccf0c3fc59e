"""Multimodal plumbing query (SURVEY.md §2.10 extension): binary
payload + mapInPandas feature extraction, hash-verified against a
byte-math oracle."""

from __future__ import annotations

from pyresample_spark.operators.multimodal import (
    documents_as_media,
    extract_media_meta,
)
from pyresample_spark.queries import register, table


@register(
    "q_multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST((octet_length(encode(text)) * 7) % 640 + 1 AS BIGINT) AS fake_width,
           CAST((octet_length(encode(text)) * 13) % 480 + 1 AS BIGINT) AS fake_height,
           CAST(CASE WHEN length(text) = 0 THEN 0 ELSE
             list_aggregate(list_transform(range(1, LEAST(64, length(text)) + 1),
                                           i -> ascii(substr(text, CAST(i AS INT), 1))), 'sum')
           END AS BIGINT) AS checksum
    FROM documents
    """,
)
def q_multimodal_meta(spark, sf_dir):
    """Binary-column pipeline: text bytes as an opaque payload →
    Arrow-batched mapInPandas feature extraction (deterministic fake
    decode; real decoders are stubbed — operators/multimodal.py)."""
    d = table(spark, sf_dir, "documents")
    media = documents_as_media(d)
    out = extract_media_meta(media)
    return out.select(
        "doc_id", "n_bytes", "fake_width", "fake_height", "checksum"
    )


@register(
    "q_frame_sample",
    oracle="""
    WITH frames AS (
      SELECT doc_id, text, octet_length(encode(text)) AS n,
             unnest(range(0,
                          CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT),
                          2)) AS f
      FROM documents
    )
    SELECT doc_id, f AS frame_idx,
           CAST(LEAST(64, n - f * 64) AS BIGINT) AS frame_bytes,
           CAST(list_aggregate(list_transform(
                 range(CAST(f * 64 + 1 AS BIGINT),
                       CAST(LEAST(f * 64 + 16, n) + 1 AS BIGINT)),
                 i -> ascii(substr(text, CAST(i AS INT), 1))),
               'sum') AS BIGINT) AS frame_checksum
    FROM frames
    """,
)
def q_frame_sample(spark, sf_dir):
    """Video-style frame sampling over binary payloads: every 2nd
    64-byte frame of each payload emits one row with per-frame
    metadata — the 1→N mapInPandas amplification a real decoder
    (sample_frames stub) plugs into; the fake-frame arithmetic lets
    DuckDB replay it exactly (operators/multimodal.py
    sample_frames_df)."""
    from pyresample_spark.operators.multimodal import sample_frames_df

    d = table(spark, sf_dir, "documents")
    media = documents_as_media(d)
    return sample_frames_df(media, every_n=2, frame_size=64)
