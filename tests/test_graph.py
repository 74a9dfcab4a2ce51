"""PageRank (pipeline/graph.py): analytic fixed points, dangling mass,
and the invariants the gate grades."""

from pyspark.sql import functions as F

from ophidia_server_spark.pipeline.graph import pagerank


def test_two_node_cycle_is_the_fixed_point(spark):
    # a <-> b is already stationary: every iteration returns rank 1.0
    edges = spark.createDataFrame([(1, 2), (2, 1)], "src long, dst long")
    ranks, _, residuals = pagerank(edges, iters=5)
    got = {r["node"]: r["rank"] for r in ranks.collect()}
    assert got == {1: 1.0, 2: 1.0}
    assert all(r < 1e-12 for r in residuals)


def test_dangling_sink_conserves_mass_and_outranks_source(spark):
    # a -> b with b dangling: total mass stays N, and the sink outranks
    # the source (it receives the source's share plus teleport)
    edges = spark.createDataFrame([(1, 2)], "src long, dst long")
    ranks, _, residuals = pagerank(edges, iters=20)
    got = {r["node"]: r["rank"] for r in ranks.collect()}
    assert abs(sum(got.values()) - 2.0) < 1e-9
    assert got[2] > got[1] > 0
    # contraction: successive residuals shrink by at least the damping
    assert all(b <= a * 0.85 + 1e-9 for a, b in zip(residuals[1:], residuals[2:]))


def test_pagerank_deterministic_under_repartitioning(spark):
    import itertools

    pairs = [(a, b) for a, b in itertools.product(range(12), range(12))
             if (a * 7 + b) % 5 == 0 and a != b]
    edges = spark.createDataFrame(pairs, "src long, dst long")
    r1, _, _ = pagerank(edges, iters=4)
    r2, _, _ = pagerank(edges.repartition(9), iters=4)
    a = {(r["node"], round(r["rank"], 9)) for r in r1.collect()}
    b = {(r["node"], round(r["rank"], 9)) for r in r2.collect()}
    assert a == b


def test_triangle_counts_handcrafted_graph(spark):
    from ophidia_server_spark.pipeline.graph import triangle_counts

    # K4 on {1,2,3,4} (every node in C(3,2)=3 triangles) plus a pendant
    # node 5 and a duplicate/reversed/self-loop noise set
    edges = [(1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4),
             (4, 5), (2, 1), (3, 1), (1, 1)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = {r["node"]: r["n_triangles"] for r in triangle_counts(df).collect()}
    assert got == {1: 3, 2: 3, 3: 3, 4: 3}


def test_triangle_counts_triangle_free_graph_is_empty(spark):
    from ophidia_server_spark.pipeline.graph import triangle_counts

    # a 4-cycle has wedges but no triangles
    df = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 1)], "src long, dst long"
    )
    assert triangle_counts(df).count() == 0
