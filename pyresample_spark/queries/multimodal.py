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
