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
from pyspark.sql.window import Window as W


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
    ranked = pairs.withColumn("cos", cos).withColumn(
        "rank",
        F.row_number().over(
            W.partitionBy("probe_id").orderBy(
                F.round(F.col("cos"), 9).desc(), F.col("vec_id").asc()
            )
        ),
    )
    return ranked.filter(F.col("rank") <= k).select(
        "probe_id", "vec_id", "cos", "rank"
    )


def ivf_assign(
    corpus: DataFrame, centroids: DataFrame, vec_col="embedding"
) -> DataFrame:
    """Assign every vector to its max-cosine centroid (broadcast join +
    top-1 window). Deterministic: (round(cos,9) DESC, centroid_id ASC)."""
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
    w = W.partitionBy("vec_id").orderBy(
        F.round(cos, 9).desc(), F.col("centroid_id").asc()
    )
    return (
        pairs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("vec_id", "centroid_id")
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
