"""Interleaved A/B: degree-carrying PageRank state (worktree graph.py) vs
the committed fa5736d loop (deg joined+broadcast per iteration). Loads the
old module from a git-extracted copy under a different module name so both
variants run in ONE session, alternating.

Usage: git show fa5736d:ophidia_server_spark/pipeline/graph.py > /tmp/graph_old.py
       SPARK_GRAFT_CPUS=32 python scripts/ab_pagerank_deg.py [sf_dir] [reps]
"""
from __future__ import annotations

import importlib.util
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ophidia_server_spark.registry import _t  # noqa: E402
from ophidia_server_spark.session import get_spark  # noqa: E402
from ophidia_server_spark.pipeline import graph as gnew  # noqa: E402


def _load_old():
    spec = importlib.util.spec_from_file_location("graph_old", "/tmp/graph_old.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def run(mod, spark, sf_dir) -> float:
    li = _t(spark, sf_dir)["lineitem"]
    edges = li.select(
        F.col("l_orderkey").alias("src"),
        (F.col("l_partkey") + F.lit(10_000_000)).alias("dst"),
    )
    t0 = time.perf_counter()
    ranks, _, _ = mod.pagerank(edges, iters=6)
    ranks.agg(
        F.count(F.lit(1)).alias("nodes"),
        F.round(F.sum("rank"), 3).alias("total_rank"),
    ).collect()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("ab_pagerank")
    gold = _load_old()
    run(gnew, spark, sf_dir)  # warm
    a, b = [], []
    for _ in range(reps):
        a.append(run(gold, spark, sf_dir))
        b.append(run(gnew, spark, sf_dir))
    print("old (deg joins):", [round(x, 2) for x in a], "min", round(min(a), 2))
    print("new (deg state):", [round(x, 2) for x in b], "min", round(min(b), 2))


if __name__ == "__main__":
    main()
