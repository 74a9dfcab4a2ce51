"""Distributed Lloyd's k-means tests: planted-cluster recovery, the
monotone objective, determinism, and degenerate inputs."""

import pytest

from pyspark.sql import functions as F

from ophidia_server_spark.pipeline import clustering as cl


def _blobs(spark):
    """Three well-separated 2-d blobs; ids 0/1/2 land one per blob so the
    lowest-id init starts every blob with its own seed."""
    centers = [(0.0, 0.0), (10.0, 10.0), (-10.0, 5.0)]
    rows = []
    i = 0
    for round_ in range(8):
        for b, (cx, cy) in enumerate(centers):
            dx = ((i * 7) % 5 - 2) * 0.1
            dy = ((i * 11) % 5 - 2) * 0.1
            rows.append((i, [cx + dx, cy + dy]))
            i += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_recovers_planted_clusters(spark):
    df = _blobs(spark)
    res = cl.kmeans_lloyd(df, k=3, iters=10, vec_col="embedding", id_col="vec_id")
    centroids = res.centroids
    got = {r["vec_id"]: r["cluster"] for r in res.assignments.collect()}
    # every planted blob (vec_id % 3) maps to exactly one cluster label
    blob_to_cluster = {}
    for vid, c in got.items():
        blob = vid % 3
        assert blob_to_cluster.setdefault(blob, c) == c
    assert len(set(blob_to_cluster.values())) == 3
    # centroids sit near the planted centers
    flat = sorted((round(c[0]), round(c[1])) for c in centroids)
    assert flat == [(-10, 5), (0, 0), (10, 10)]


def test_objective_is_nonincreasing_and_deterministic(spark, tables):
    emb = tables["embeddings"].limit(200)
    r1 = cl.kmeans_lloyd(emb, k=4, iters=5)
    assert all(b <= a + 1e-9 for a, b in zip(r1.objectives, r1.objectives[1:]))
    r2 = cl.kmeans_lloyd(emb, k=4, iters=5)
    assert r1.centroids == r2.centroids and r1.objectives == r2.objectives


def test_assignment_matches_jvm_recompute(spark, tables):
    emb = tables["embeddings"].limit(150)
    res = cl.kmeans_lloyd(emb, k=4, iters=3)
    checked = cl.kmeans_recompute_dist2(res.assignments, res.centroids)
    bad = checked.filter(
        F.element_at("jvm_dist2", F.col("cluster"))
        > F.array_min("jvm_dist2") + F.lit(1e-9)
    ).count()
    assert bad == 0


def test_empty_cluster_keeps_centroid(spark):
    # 5 identical points, k=3: clusters 2 and 3 go empty after the first
    # assignment; their centroids must hold (no NaNs, no crash)
    df = spark.createDataFrame(
        [(i, [1.0, 2.0]) for i in range(5)], "vec_id long, embedding array<double>"
    )
    res = cl.kmeans_lloyd(df, k=3, iters=4)
    assert all(all(x == x for x in c) for c in res.centroids)  # no NaN
    assert [r["cluster"] for r in res.assignments.collect()] == [1] * 5
    assert res.objectives[-1] == 0.0 and res.converged


def test_too_few_rows_raises(spark):
    df = spark.createDataFrame(
        [(1, [0.0])], "vec_id long, embedding array<double>"
    )
    with pytest.raises(ValueError, match="at least k"):
        cl.kmeans_lloyd(df, k=2)
