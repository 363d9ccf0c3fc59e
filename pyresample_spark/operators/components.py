"""Connected components over an overlap graph — the engine-native
GetNonOverlapUnions (reference: pyresample/spherical_utils.py:28-131,
which merges mutually-overlapping polygons into disjoint groups by
repeated pairwise set-merging on the driver).

Spark-first replacement: the overlap relation is an edge DataFrame and
group discovery is iterative **min-label propagation** — each node
repeatedly takes the minimum label over its neighborhood (edges are
symmetrized and self-loops added, so a node always sees its own label).
Convergence after O(graph diameter) rounds; every round is one
shuffle-join + one hash aggregation, so the algorithm scales to edge
sets far beyond the reference's driver-side set merging. Lineage is
truncated every round with localCheckpoint so plan depth stays constant.

For web-scale graphs (billions of edges) the same loop accepts the
large-star/small-star optimization (Kiveris et al., "Connected
Components in MapReduce and Beyond", SoCC'14) — swap the propagation
step; the driver-side convergence check is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 50,
) -> DataFrame:
    """Return (id, component) where component = min node id reachable.

    ``edges`` is treated as undirected: it is symmetrized and self-loops
    are added, so isolated nodes present in either endpoint column keep
    their own id as the component label.
    """
    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    sym = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .union(
            e.select("src", F.col("src").alias("dst"))
            .union(e.select(F.col("dst").alias("src"), "dst"))
        )
        .distinct()
    )
    sym = sym.localCheckpoint(eager=True)
    labels = sym.select(F.col("src").alias("id")).distinct().select(
        "id", F.col("id").alias("comp")
    )
    labels = labels.localCheckpoint(eager=True)
    for _ in range(max_iter):
        prop = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("comp").alias("comp"))
            .select(F.col("src").alias("id"), "comp")
        )
        prop = prop.localCheckpoint(eager=True)
        changed = (
            prop.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.comp") != F.col("o.comp"))
            .count()
        )
        labels = prop
        if changed == 0:
            break
    return labels
