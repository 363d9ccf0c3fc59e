"""Deduplication operators for large-scale text pipelines (SURVEY.md
§2.10 extension ops; built from the same join/agg primitives as the geo
core — MinHash banding IS the cell-bucketed join pattern of
operators/knn.py applied to hash space).

Engine-portable hashing: every hash is ``bigint(first 15 hex chars of
md5(...))`` — identical in Spark (``conv(substr(md5(x),1,15),16,10)``)
and DuckDB (``cast('0x'||substr(md5(x),1,15) as bigint)``), unlike the
engines' built-in ``hash()`` functions which differ. 60-bit positive.

Scale notes:
- Exact dedup: one shuffle on the text hash; at 100 TB hash first
  (map-side) so the shuffle moves 8-byte keys, never full documents.
- MinHash: explode to (doc, shingle, seed) rows → two-level min-agg →
  band-signature equi-self-join. The self-join shuffles on
  (band, signature); hot signatures (boilerplate dups) are exactly the
  skewed-cell case — AQE skew-join splits them.
- SimHash: one groupBy(doc) with 16 conditional sums — map-side partial
  agg makes this a single cheap pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

N_HASHES = 16
BAND_SIZE = 4  # → 4 bands of 4 rows
SIMHASH_BITS = 16


def md5_bigint(col):
    """Portable 60-bit hash of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("bigint")


def md5_bigint_sql(expr: str) -> str:
    return f"CAST(concat('0x', substr(md5({expr}), 1, 15)) AS BIGINT)"


def words_col(text_col="text"):
    return F.split(F.col(text_col), " ")


def shingle_concat_expr(n: int, ws_var: str = "ws") -> str:
    """SQL text of one word-``n``-gram at lambda index ``i`` over the
    word array ``ws_var`` — THE single definition of the shingle text
    that shingles(), minhash_bands_inrow() and (via shingles_sql's
    DuckDB twin) every oracle must agree on. One copy, zero drift.

    ``array_join(slice(...))`` rather than ``concat`` over 2·n−1
    ``element_at`` nodes: higher-order ``transform()`` lambdas are
    CodegenFallback, so every node in the lambda body is evaluated
    interpreted PER SHINGLE (guide §4.1); this form has 2 interpreted
    nodes instead of 2·n−1 and produces the byte-identical
    space-joined string (split() never yields NULL elements, so
    array_join's null-skip can never diverge from concat)."""
    return f"array_join(slice({ws_var}, i + 1, {n}), ' ')"


def band_stack_expr(
    n_hashes: int, band_size: int, mh_prefix: str
) -> str:
    """``stack`` expression turning wide mh columns into (band, sig)
    rows — shared by the aggregated and in-row signature passes so the
    band layout can never diverge between them."""
    n_bands = n_hashes // band_size
    args = ", ".join(
        f"{b}, concat_ws(',', "
        + ", ".join(
            f"cast({mh_prefix}{b * band_size + k} as string)"
            for k in range(band_size)
        )
        + ")"
        for b in range(n_bands)
    )
    return f"stack({n_bands}, {args}) AS (band, sig)"


def shingles(df: DataFrame, n: int = 3, text_col="text", distinct: bool = False) -> DataFrame:
    """(doc_id, shingle) rows: word n-grams.

    ``distinct=False`` by default: MinHash takes a min over the shingle
    multiset, so deduplicating first would only add a full shuffle of
    shingle strings for identical results.
    """
    ws = words_col(text_col)
    concat_expr = shingle_concat_expr(n)
    sh = (
        df.withColumn("ws", ws)
        .filter(F.size("ws") >= n)
        .withColumn(
            "shingle",
            F.explode(
                F.expr(
                    f"transform(sequence(0, size(ws) - {n}), i -> {concat_expr})"
                )
            ),
        )
        .select("doc_id", "shingle")
    )
    return sh.distinct() if distinct else sh


def shingles_sql(n: int = 3) -> str:
    """DuckDB twin of :func:`shingles` over the documents view."""
    concat = " || ' ' || ".join(f"ws[i + {k + 1}]" for k in range(n))
    return f"""
      SELECT doc_id, shingle FROM (
        SELECT doc_id,
               unnest(list_transform(range(0, len(ws) - {n - 1}),
                                     i -> {concat})) AS shingle
        FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
        WHERE len(ws) >= {n}
      )
    """


def _seed_constants(n: int) -> list:
    """Deterministic 60-bit XOR mixers, one per hash function."""
    import hashlib as _hl

    return [
        int(_hl.md5(f"seed{j}".encode()).hexdigest()[:15], 16)
        for j in range(n)
    ]


def minhash_signatures(sh: DataFrame, n_hashes: int = N_HASHES) -> DataFrame:
    """(doc_id, j, minhash): min over shingles of hash_j(shingle).

    One md5 per shingle; the per-seed family is h0 XOR C_j (XOR with a
    fixed 60-bit constant is a bit permutation — the standard cheap
    minhash family). 16× fewer md5 evaluations than hashing
    (seed, shingle) pairs, and XOR never overflows (ANSI-safe).
    """
    consts = _seed_constants(n_hashes)
    arr = F.array(*[F.lit(c) for c in consts])
    seeded = (
        sh.withColumn("h0", md5_bigint(F.col("shingle")))
        .withColumn("cs", arr)
        .select(
            "doc_id",
            "h0",
            F.posexplode("cs").alias("j", "c"),
        )
        .withColumn("h", F.expr("h0 ^ c"))
    )
    return seeded.groupBy("doc_id", "j").agg(F.min("h").alias("mh"))


def seed_constants_sql(n: int = N_HASHES) -> str:
    """DuckDB VALUES list of (j, c) seed constants."""
    consts = _seed_constants(n)
    return ", ".join(f"({j}, {c})" for j, c in enumerate(consts))


def band_signatures(mh: DataFrame, band_size: int = BAND_SIZE) -> DataFrame:
    """(doc_id, band, sig): ordered concat of the band's minhashes."""
    banded = mh.withColumn("band", F.expr(f"j div {band_size}"))
    return banded.groupBy("doc_id", "band").agg(
        F.expr(
            "array_join(transform(array_sort(collect_list(struct(j, "
            "cast(mh as string) as m))), x -> x.m), ',')"
        ).alias("sig")
    )


def minhash_bands_wide(
    sh: DataFrame,
    n_hashes: int = N_HASHES,
    band_size: int = BAND_SIZE,
) -> DataFrame:
    """(doc_id, band, sig) via ONE wide aggregation: 16 ``min(h0 ^ Cj)``
    columns in a single groupBy(doc_id), then band signatures by direct
    ``concat_ws`` over each band's 4 columns, unpivoted with ``stack``.

    Same output as band_signatures(minhash_signatures(sh)) but without
    the 16× seed explode and the second (doc, j) aggregation — the
    shingle table is scanned once and the only shuffle carries one row
    per document with 16 bigints. At corpus scale that is the difference
    between shuffling 16·|shingles| rows and |docs| rows."""
    consts = _seed_constants(n_hashes)
    wide = (
        sh.withColumn("h0", md5_bigint(F.col("shingle")))
        .groupBy("doc_id")
        .agg(
            *[
                F.min(F.expr(f"h0 ^ {c}")).alias(f"mh{j}")
                for j, c in enumerate(consts)
            ]
        )
    )
    return wide.select(
        "doc_id",
        F.expr(band_stack_expr(n_hashes, band_size, "mh")),
    )


def minhash_candidates(docs: DataFrame, n: int = 3) -> DataFrame:
    """Candidate near-dup pairs: docs sharing ≥1 LSH band signature.

    Uses the AGGREGATED signature pass deliberately: a self-join
    consumes the signatures twice, and the agg's exchange materializes
    them once, whereas the map-only in-row pass is recomputed per join
    side (measured at sf0.1: wide 1.13 s vs in-row 1.39 s, and
    repartition() does not win the exchange back under AQE). The
    in-row pass wins when each side is computed exactly once — the
    incremental index probe and the streaming gate."""
    sigs = minhash_bands_wide(shingles(docs, n))
    a = sigs.select(
        F.col("doc_id").alias("doc1"), "band", "sig"
    )
    b = sigs.select(F.col("doc_id").alias("doc2"), "band", "sig")
    pairs = a.join(b, ["band", "sig"]).filter(F.col("doc1") < F.col("doc2"))
    return pairs.groupBy("doc1", "doc2").agg(
        F.count(F.lit(1)).alias("n_shared_bands")
    )


def simhash(docs: DataFrame, bits: int = SIMHASH_BITS) -> DataFrame:
    """(doc_id, simhash): sign-of-weighted-bit-sums fingerprint over the
    document's words (with multiplicity)."""
    w = (
        docs.withColumn("word", F.explode(words_col()))
        .withColumn("h", md5_bigint(F.col("word")))
    )
    aggs = [
        F.sum(
            F.when(F.expr(f"(h >> {k}) & 1") == 1, 1).otherwise(-1)
        ).alias(f"s{k}")
        for k in range(bits)
    ]
    sums = w.groupBy("doc_id").agg(*aggs)
    fp = None
    for k in range(bits):
        term = F.when(F.col(f"s{k}") > 0, F.lit(1 << k)).otherwise(F.lit(0))
        fp = term if fp is None else fp + term
    return sums.select("doc_id", fp.cast("bigint").alias("simhash"))


def simhash_sql(bits: int = SIMHASH_BITS) -> str:
    sum_cols = ", ".join(
        f"SUM(CASE WHEN (h >> {k}) & 1 = 1 THEN 1 ELSE -1 END) AS s{k}"
        for k in range(bits)
    )
    fp = " + ".join(
        f"CASE WHEN s{k} > 0 THEN {1 << k} ELSE 0 END" for k in range(bits)
    )
    return f"""
      SELECT doc_id, CAST({fp} AS BIGINT) AS simhash FROM (
        SELECT doc_id, {sum_cols}
        FROM (
          SELECT doc_id, {md5_bigint_sql('word')} AS h
          FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS word
                FROM documents)
        ) GROUP BY doc_id
      )
    """


def bloom_literal_flag(hashes, k: int = 4, m: int = 1024,
                       h_col: str = "h0"):
    """Pack ``hashes`` (portable 60-bit md5 bigints, e.g. an eval
    set's n-gram hashes) into a k×(m/64)-bigint-word Bloom filter
    embedded as PLAN LITERALS, and return the membership predicate
    Column over ``h_col`` — a pure map-side prefilter with NO join
    (zero false negatives by the Bloom guarantee; follow with a
    broadcast exact verify to drop false positives). Shared by the
    batch q_bloom_decontaminate and the streaming twin
    (streaming/windows.py streaming_decontaminate)."""
    words = m // 64
    seeds = _seed_constants(k)
    flag = None
    for c in seeds:
        mask = [0] * words
        for h0 in hashes:
            b = (h0 ^ c) % m
            mask[b >> 6] |= 1 << (b & 63)
        # two's-complement: bigint literals must be signed
        signed = [w - (1 << 64) if w >= (1 << 63) else w for w in mask]
        arr = "array(" + ", ".join(f"{w}L" for w in signed) + ")"
        bkt = f"(({h_col} ^ {c}L) % {m})"
        probe = (
            f"(shiftright(element_at({arr},"
            f" CAST(shiftright({bkt}, 6) AS INT) + 1),"
            f" CAST(({bkt} & 63) AS INT)) & 1) = 1"
        )
        e = F.expr(probe)
        flag = e if flag is None else (flag & e)
    return flag


def minhash_bands_inrow(
    docs: DataFrame,
    n: int = 3,
    n_hashes: int = N_HASHES,
    band_size: int = BAND_SIZE,
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, band, sig) computed ENTIRELY in-row: the shingle set,
    its md5⊕seed hashes, and the per-seed minima are array expressions
    over the document's own words — no shingle explode, no groupBy,
    ZERO shuffle before the band join. Bit-identical signatures to
    :func:`minhash_bands_wide` (same concat text, same hash, same
    mins), proven by pytest equality.

    Two consequences: (a) the batch banding pass becomes map-only —
    the only shuffle in LSH dedup is the band equi-join itself; (b)
    the signature computation is legal in a STREAMING map stage
    (stateless), which is what makes the incremental-dedup stream
    probe possible (streaming/windows.py streaming_lsh_probe)."""
    from pyresample_spark.functions.exprs import let_expr as _let

    consts = _seed_constants(n_hashes)
    shingle = shingle_concat_expr(n, ws_var="w.ws")
    h0 = (
        f"transform(sequence(0, size(w.ws) - {n}), i -> "
        f"CAST(conv(substr(md5({shingle}), 1, 15), 16, 10) AS BIGINT))"
    )
    ns = ", ".join(
        f"'mh{j}', array_min(transform(z.h0, x -> x ^ {c}L))"
        for j, c in enumerate(consts)
    )
    wide_expr = _let(
        [("ws", f"split({text_col}, ' ')")],
        "w",
        _let([("h0", h0)], "z", f"named_struct({ns})"),
    )
    wide = (
        docs.filter(F.size(F.split(F.col(text_col), " ")) >= n)
        .selectExpr("doc_id", wide_expr + " AS m")
    )
    return wide.select(
        "doc_id",
        F.expr(band_stack_expr(n_hashes, band_size, "m.mh")),
    )


def lsh_probe_pairs(new_sigs: DataFrame, index: DataFrame) -> DataFrame:
    """(new_doc, matched_doc, band): join a batch's band signatures
    against an index's — THE single probe topology shared by the batch
    incremental dedup, the streaming gate, and the scale probe."""
    return new_sigs.select(
        F.col("doc_id").alias("new_doc"), "band", "sig"
    ).join(
        index.select(F.col("doc_id").alias("matched_doc"), "band", "sig"),
        ["band", "sig"],
    ).select("new_doc", "matched_doc", "band")
