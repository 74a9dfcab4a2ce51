"""Distributed Lloyd's k-means over the full embedding corpus.

The codebook trainers (similarity.ivf_kmeans_codebook, pq_codebooks) run
Lloyd on a driver-side hash sample — the right call when only the
CENTROIDS matter, because the problem is bounded. This module is the
complementary shape for when the ASSIGNMENTS matter for every row (cluster
labels feeding SemDeDup-style pruning, corpus bucketing, per-cluster
sampling quotas): iterations stay fully distributed, so the corpus is
never sampled and never collected.

Cost structure per iteration — the canonical distributed k-means plan:
  assign  : one Arrow-batched matmul map over the rows (no shuffle); the
            k x dim centroid matrix rides into tasks as a closure
            (broadcast-sized by construction: k and dim are parameters,
            not data-dependent).
  update  : ONE groupBy("cluster") aggregate with map-side partials —
            per-dim sums + counts + the objective, k x (dim + 2) doubles
            to the driver. The only shuffle, and its width is k, not n.
Total: O(iters) passes, each reading the (cached) vectors once. At 100 TB
the vectors should be persisted before calling; nothing else grows with n.

Lloyd's monotonicity (the textbook argument): re-assignment can only lower
the objective for fixed centroids, and the mean minimizes within-cluster
squared distance for fixed assignment — so the objective recorded at each
assignment step is non-increasing, which the correctness gate asserts as
an invariant alongside argmin-consistency and centroid=mean recomputation.
"""

from __future__ import annotations

from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ophidia_server_spark.functions.lits import const_double_array


class KMeansResult(NamedTuple):
    """assignments: input columns + cluster (1-based) + dist2 vs the final
    centroids. centroids: k x dim floats. objectives: total squared
    distance recorded at each assignment step (non-increasing).
    prev_centroids: the centroids the LAST update step assigned against —
    the update equation `centroids[j] = mean of rows nearest
    prev_centroids[j]` holds exactly (the gate's invariant), while
    `centroids = means of the final assignment` only holds at convergence.
    converged: the last update moved every coordinate <= tol."""

    assignments: DataFrame
    centroids: list
    objectives: list
    prev_centroids: list
    converged: bool


def _assign_udf(centroids):
    """Arrow-batched assignment: squared-L2 argmin against the current
    centroids via one (batch x dim) @ (dim x k) matmul — the sanctioned
    Pandas-UDF path for dense numeric kernels (same shape, and same
    measured ~6x margin over per-centroid column folds, as
    similarity.ivf_assign). Returns struct(cluster 1-based, dist2)."""
    import numpy as np
    import pandas as pd

    C = np.asarray(centroids, dtype="float64")  # (k, dim)
    cc = (C * C).sum(axis=1)  # (k,)

    def _fn(v):
        X = np.stack(v.to_numpy()).astype("float64")  # (batch, dim)
        xx = (X * X).sum(axis=1, keepdims=True)
        d2 = xx - 2.0 * (X @ C.T) + cc[None, :]  # (batch, k)
        best = d2.argmin(axis=1)
        return pd.DataFrame(
            {
                "cluster": best + 1,
                "dist2": np.maximum(d2[np.arange(len(best)), best], 0.0),
            }
        )

    _fn.__annotations__ = {"v": pd.Series, "return": pd.DataFrame}
    return F.pandas_udf(_fn, "cluster int, dist2 double")


def kmeans_lloyd(
    df: DataFrame,
    k: int = 8,
    iters: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    tol: float = 1e-9,
) -> KMeansResult:
    """Full-corpus Lloyd's k-means — see KMeansResult for the fields.

    Deterministic throughout: initial centroids are the k lowest-id
    vectors (the semantic_leaders convention), updates aggregate exact
    per-dim sums, and ties in the argmin break to the lowest cluster
    index. Empty clusters keep their previous centroid."""
    arr = F.col(vec_col).cast("array<double>")
    first = df.select(F.size(vec_col).alias("d")).first()
    if first is None:
        raise ValueError("kmeans_lloyd: empty input")
    dim = first["d"]

    seeds = (
        df.orderBy(id_col)
        .limit(k)
        .select(arr.alias("__v"))
        .collect()
    )
    if len(seeds) < k:
        raise ValueError(f"kmeans_lloyd: need at least k={k} rows")
    centroids = [list(r["__v"]) for r in seeds]

    objectives: list[float] = []
    dim_sums = [
        F.sum(F.element_at(F.col("__v"), i + 1)).alias(f"s{i}")
        for i in range(dim)
    ]
    prev = [list(c) for c in centroids]
    converged = False
    for _ in range(iters):
        assigned = df.select(
            arr.alias("__v"), _assign_udf(centroids)(F.col(vec_col)).alias("__a")
        )
        stats = (
            assigned.groupBy(F.col("__a.cluster").alias("__c"))
            .agg(
                F.count(F.lit(1)).alias("n"),
                F.sum("__a.dist2").alias("obj"),
                *dim_sums,
            )
            .collect()
        )
        objectives.append(float(sum(r["obj"] for r in stats)))
        new_centroids = [list(c) for c in centroids]
        for r in stats:
            j = r["__c"] - 1
            new_centroids[j] = [r[f"s{i}"] / r["n"] for i in range(dim)]
        shift = max(
            abs(a - b)
            for row_a, row_b in zip(new_centroids, centroids)
            for a, b in zip(row_a, row_b)
        )
        prev = centroids
        centroids = new_centroids
        if shift <= tol:
            converged = True
            break

    out = df.withColumn("__a", _assign_udf(centroids)(F.col(vec_col)))
    assignments = out.select(
        *df.columns,
        F.col("__a.cluster").alias("cluster"),
        F.col("__a.dist2").alias("dist2"),
    )
    return KMeansResult(assignments, centroids, objectives, prev, converged)


def kmeans_recompute_dist2(
    df: DataFrame, centroids, vec_col: str = "embedding"
):
    """Independent JVM recomputation of the per-centroid squared distances
    (higher-order-function fold, no Arrow, different summation order than
    the matmul path) — the cross-check the gate grades the assignment
    against. Adds `jvm_dist2` = array of k distances (1-based by index)."""
    arr = F.col(vec_col).cast("array<double>")
    dists = F.array(
        *[
            F.aggregate(
                F.zip_with(arr, const_double_array(c),
                           lambda a, b: (a - b) * (a - b)),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            for c in centroids
        ]
    )
    return df.withColumn("jvm_dist2", dists)
