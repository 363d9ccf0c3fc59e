"""Embedding similarity search (SURVEY.md §2.10): brute-force cosine
top-k as the exact baseline, IVF (inverted-file) and sign-LSH bucketing
as the scale paths.

The kNN-over-embeddings machinery is the d-dimensional generalization
of the geo kNN join (operators/knn.py): bucket → equi-join → rank.

All vector math is built-in column expressions (``zip_with`` products +
``aggregate`` fold — JVM-side, no Python), with float→double widening
before any arithmetic so results are engine-portable.

Scale notes:
- Brute force: probes broadcast, corpus scanned once; cost O(P·N·d).
  Fine for P ≤ ~10⁴ probes on any corpus Spark can scan.
- IVF: centroid assignment is a broadcast join vs ≤ ~10⁵ centroids; the
  probe search shuffles only its own cluster's rows (partition by
  centroid id = partition pruning). This is the 100 TB ANN path.
- Sign-LSH: bucket id from component signs; candidates co-bucket only —
  one equi-join, same shape as MinHash banding.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def dot(a, b) -> Column:
    """Sequential-fold dot product with double widening."""
    prods = F.zip_with(
        a, b, lambda x, y: x.cast("double") * y.cast("double")
    )
    return F.aggregate(prods, F.lit(0.0), lambda acc, v: acc + v)


def norm(a) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a, b, norm_a=None, norm_b=None) -> Column:
    na = norm_a if norm_a is not None else norm(a)
    nb = norm_b if norm_b is not None else norm(b)
    return dot(a, b) / (na * nb)


def with_norm(df: DataFrame, vec_col="embedding") -> DataFrame:
    return df.withColumn("vnorm", norm(F.col(vec_col)))


# Packed cosine ranking key: c9 = round(cos·1e9) ∈ [−1e9, 1e9] maps the
# order (round(cos,9) DESC, id ASC) onto one ascending BIGINT
# (1e9 − c9)·PACK + id. PACK sized so the key never overflows 2^62;
# ids must sit in [0, PACK) — verified per group (same contract as
# operators/knn.py's packed key, ADVICE r1).
_COS_SCALE = 1_000_000_000
_COS_PACK = (1 << 62) // (2 * _COS_SCALE + 1)
_COS_ERR = (
    "packed cosine top-k: id outside [0, pack) — remap ids with "
    "operators.ids.with_compact_id"
)


def topk_by_cosine(
    pairs: DataFrame,
    k: int,
    group_col: str = "probe_id",
    id_col: str = "vec_id",
    cos_col: str = "cos",
) -> DataFrame:
    """Top-k candidates per group by (round(cos,9) DESC, id ASC) as a
    HashAggregate — ``array_sort(collect_list(struct(key, cos)))[1:k]``
    instead of a row_number window. The window plan shuffle-SORTS the
    whole candidate table by (group, cos), concentrating N·P rows on P
    reducers; the hash-agg plan combines map-side and sorts only each
    group's own candidate list (operators/knn.py:191-214 idiom, applied
    per VERDICT r1 #4). The raw cosine rides in the struct's second
    field so callers see full precision (no double rounding).

    Returns (group_col, id_col, cos_col, rank) with rank ∈ [1, k].
    """
    c9 = F.round(F.col(cos_col) * _COS_SCALE, 0).cast("bigint")
    key = (F.lit(_COS_SCALE) - c9) * F.lit(_COS_PACK) + F.col(id_col)
    g = pairs.groupBy(group_col).agg(
        F.slice(
            F.array_sort(F.collect_list(F.struct(key.alias("k"), F.col(cos_col).alias("c")))),
            1,
            k,
        ).alias("ks"),
        F.min(id_col).alias("_id_lo"),
        F.max(id_col).alias("_id_hi"),
    )
    ok = (F.col("_id_lo") >= 0) & (F.col("_id_hi") < F.lit(_COS_PACK))
    guard = F.assert_true(ok, F.lit(_COS_ERR))
    return g.select(
        group_col, F.posexplode("ks").alias("rank0", "kc"), guard.alias("_g")
    ).select(
        group_col,
        F.when(F.col("_g").isNull(), F.col("kc.k") % _COS_PACK).alias(id_col),
        F.col("kc.c").alias(cos_col),
        (F.col("rank0") + 1).cast("int").alias("rank"),
    )


def cosine_topk(
    corpus: DataFrame,
    probes: DataFrame,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact brute-force cosine top-k: broadcast probes × corpus scan.

    Ranking orders by (round(cos, 9) DESC, vec_id ASC): the 1e-9 snap
    absorbs cross-engine summation-order ulps; the id breaks true ties.
    Top-k is a packed-key HashAggregate (:func:`topk_by_cosine`), not a
    window sort.
    """
    c = with_norm(corpus, vec_col).select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).alias("c_vec"),
        F.col("vnorm").alias("c_norm"),
    )
    p = with_norm(probes, vec_col).select(
        F.col(id_col).alias("probe_id"),
        F.col(vec_col).alias("p_vec"),
        F.col("vnorm").alias("p_norm"),
    )
    pairs = c.crossJoin(F.broadcast(p)).filter(
        F.col("vec_id") != F.col("probe_id")
    )
    cos = dot(F.col("c_vec"), F.col("p_vec")) / (
        F.col("c_norm") * F.col("p_norm")
    )
    return topk_by_cosine(pairs.withColumn("cos", cos), k)


def ivf_assign(
    corpus: DataFrame, centroids: DataFrame, vec_col="embedding",
    carry_vec: bool = False,
) -> DataFrame:
    """Assign every vector to its max-cosine centroid. Deterministic:
    (round(cos,9) DESC, centroid_id ASC).

    Argmax as ``min()`` of the packed key — a map-side-partial
    HashAggregate, NOT a row_number window: the window plan shuffle+
    sorts all N×C assignment pairs by vec_id (VERDICT r1 "What's wrong"
    #1); the min() plan reduces each vector's C candidates to one row
    inside the scan task, so only N rows reach the shuffle.

    ``carry_vec=True`` also returns the vector and its norm
    (``vec_col``, ``vnorm``), letting callers that need the embedding
    next to the assignment (SemDeDup's in-cluster pair search) skip a
    whole second corpus pass + re-join on vec_id (r17-opt). The vector
    rides as an extra GROUP KEY, not an aggregate: it is constant
    within the vec_id group (so the groups are identical), and array
    columns are valid UnsafeRow grouping keys while a first(array)
    AGGREGATE has no mutable buffer and would demote the whole
    aggregate to SortAggregate — the key form keeps the map-side
    partial a codegen'd HashAggregate."""
    c = with_norm(corpus, vec_col).select(
        "vec_id", F.col(vec_col).alias("v"), F.col("vnorm").alias("vn")
    )
    cen = with_norm(centroids, vec_col).select(
        F.col("vec_id").alias("centroid_id"),
        F.col(vec_col).alias("cv"),
        F.col("vnorm").alias("cvn"),
    )
    pairs = c.crossJoin(F.broadcast(cen))
    cos = dot(F.col("v"), F.col("cv")) / (F.col("vn") * F.col("cvn"))
    c9 = F.round(cos * _COS_SCALE, 0).cast("bigint")
    key = (F.lit(_COS_SCALE) - c9) * F.lit(_COS_PACK) + F.col("centroid_id")
    group_keys = ["vec_id", "v", "vn"] if carry_vec else ["vec_id"]
    best = pairs.groupBy(*group_keys).agg(
        F.min(key).alias("bk"),
        F.min("centroid_id").alias("_id_lo"),
        F.max("centroid_id").alias("_id_hi"),
    )
    ok = (F.col("_id_lo") >= 0) & (F.col("_id_hi") < F.lit(_COS_PACK))
    guard = F.assert_true(ok, F.lit(_COS_ERR))
    return best.select(
        "vec_id",
        F.when(guard.isNull(), F.col("bk") % _COS_PACK).alias("centroid_id"),
        *(
            [F.col("v").alias(vec_col), F.col("vn").alias("vnorm")]
            if carry_vec
            else []
        ),
    )


def sign_lsh_bucket(vec_col="embedding", bits: int = 8) -> Column:
    """Axis-aligned sign-LSH bucket: bit i = (component i > 0)."""
    bucket = F.lit(0)
    for i in range(bits):
        bucket = bucket + F.when(
            F.element_at(F.col(vec_col), i + 1).cast("double") > 0.0,
            F.lit(1 << i),
        ).otherwise(F.lit(0))
    return bucket.cast("bigint")


def sign_lsh_bucket_sql(vec: str = "embedding", bits: int = 8) -> str:
    terms = " + ".join(
        f"CASE WHEN CAST({vec}[{i + 1}] AS DOUBLE) > 0.0 THEN {1 << i} ELSE 0 END"
        for i in range(bits)
    )
    return f"CAST({terms} AS BIGINT)"
