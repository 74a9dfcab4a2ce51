"""Interleaved A/B: ALS fused one-job broadcast gate vs two init counts.

Usage: SPARK_GRAFT_CPUS=32 python scripts/ab_als_gate.py [sf_dir] [reps]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ophidia_server_spark.registry import _t  # noqa: E402
from ophidia_server_spark.session import get_spark  # noqa: E402
from ophidia_server_spark.pipeline import als as alsm  # noqa: E402


def run_once(spark, sf_dir) -> float:
    li = _t(spark, sf_dir)["lineitem"]
    orders = _t(spark, sf_dir)["orders"]
    t0 = time.perf_counter()
    ratings = (
        li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy(F.col("o_custkey").alias("user"),
                 F.col("l_partkey").alias("item"))
        .agg(F.sum(F.col("l_quantity").cast("decimal(18,2)"))
             .cast("double").alias("rating"))
        .persist()
    )
    res = alsm.als(ratings, k=4, iters=3, reg=0.1)
    alsm.predict(res, ratings).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("prediction"), 6).alias("avg_pred"),
    ).collect()
    ratings.unpersist()
    return time.perf_counter() - t0


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 4
    spark = get_spark("ab_als_gate")
    run_once(spark, sf_dir)  # warm
    a, b = [], []
    for _ in range(reps):
        os.environ["SPARK_GRAFT_ALS_FUSED_GATE"] = "0"
        a.append(run_once(spark, sf_dir))
        os.environ["SPARK_GRAFT_ALS_FUSED_GATE"] = "1"
        b.append(run_once(spark, sf_dir))
    os.environ.pop("SPARK_GRAFT_ALS_FUSED_GATE", None)
    print("two-counts:", [round(x, 2) for x in a], "min", round(min(a), 2))
    print("fused-gate:", [round(x, 2) for x in b], "min", round(min(b), 2))


if __name__ == "__main__":
    main()
