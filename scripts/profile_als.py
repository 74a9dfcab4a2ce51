"""Phase-profile the ALS bench variant (ml_als_grade's raw-operator twin)
at sf0.1: where do the ~10 s go? Times each driver-visible phase of
als() by replaying its exact job sequence with perf_counter fences.

Usage: SPARK_GRAFT_CPUS=32 python scripts/profile_als.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ophidia_server_spark.session import get_spark  # noqa: E402
from ophidia_server_spark.registry import _t  # noqa: E402
from ophidia_server_spark.pipeline import als as alsm  # noqa: E402
from ophidia_server_spark.ckpt import checkpoint as _ckpt  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile_als")
    t = _t(spark, sf_dir)
    li, orders = t["lineitem"], t["orders"]

    def ratings_df():
        return (
            li.join(orders, li["l_orderkey"] == orders["o_orderkey"])
            .groupBy(
                F.col("o_custkey").alias("user"),
                F.col("l_partkey").alias("item"),
            )
            .agg(
                F.sum(F.col("l_quantity").cast("decimal(18,2)"))
                .cast("double").alias("rating")
            )
        )

    # warm-up: full bench-variant run once (JIT + page cache)
    r0 = ratings_df().persist()
    res0 = alsm.als(r0, k=4, iters=3, reg=0.1)
    alsm.predict(res0, r0).agg(F.count(F.lit(1))).collect()
    r0.unpersist()

    phases: list[tuple[str, float]] = []

    def fence(name, fn):
        t0 = time.perf_counter()
        out = fn()
        phases.append((name, time.perf_counter() - t0))
        return out

    k, reg = 4, 0.1
    ratings = ratings_df().persist()
    fence("ratings_materialize", lambda: ratings.count())
    r = ratings.select(
        F.col("user"), F.col("item"), F.col("rating").cast("double")
    ).persist()
    fence("r_materialize", lambda: r.count())
    vf = fence("init_items_ckpt", lambda: _ckpt(alsm._init_factors(
        r.select("item").distinct(), "item", k, "als:item")))
    uf = fence("init_users_ckpt", lambda: _ckpt(alsm._init_factors(
        r.select("user").distinct(), "user", k, "als:user")))
    n_items = fence("count_items", lambda: vf.count())
    n_users = fence("count_users", lambda: uf.count())
    bc_i = alsm._fits_broadcast(n_items, k)
    bc_u = alsm._fits_broadcast(n_users, k)
    for it in range(3):
        uf2 = fence(f"half_user_{it}", lambda: alsm._half_step(
            r, vf, "user", "item", k, reg, bc_i))
        fence(f"obj_user_{it}", lambda: uf2.agg(
            F.coalesce(F.sum("__obj"), F.lit(0.0))).first())
        uf = uf2.drop("__obj")
        vf2 = fence(f"half_item_{it}", lambda: alsm._half_step(
            r, uf, "item", "user", k, reg, bc_u))
        fence(f"obj_item_{it}", lambda: vf2.agg(
            F.coalesce(F.sum("__obj"), F.lit(0.0))).first())
        vf = vf2.drop("__obj")
    r.unpersist()
    if bc_u:
        uf = F.broadcast(uf)
    if bc_i:
        vf = F.broadcast(vf)
    res = alsm.ALSResult(uf, vf, vf, [])
    fence("predict_agg", lambda: alsm.predict(res, ratings).agg(
        F.count(F.lit(1)).alias("n"),
        F.round(F.avg("prediction"), 6).alias("avg_pred"),
    ).collect())
    ratings.unpersist()

    total = sum(s for _, s in phases)
    print(f"\n{'phase':28s} {'sec':>8s}")
    for name, s in phases:
        print(f"{name:28s} {s:8.3f}")
    print(f"{'TOTAL':28s} {total:8.3f}")
    print(f"n_users={n_users} n_items={n_items} bc_items={bc_i} bc_users={bc_u}")


if __name__ == "__main__":
    main()
