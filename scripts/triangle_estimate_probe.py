"""Triangle auto-chunk ESTIMATE probe — the K decision without the count.

The sf10 full run costs ~18 minutes; at sf30+ the wedge-closure join is an
hour-plus and the POINT of `chunks="auto"` is that its K comes from a cheap
pre-pass (exact Σ d·(d−1)/2 over the oriented out-degrees). This probe runs
exactly that pre-pass over the graph_triangle_counts gate's edge
construction and reports the wedge total plus the K auto would choose at
the given scratch budget — the decade check for prediction 5 of the
round-12 pre-registration (BASELINE.md) with none of the quadratic work.

Usage: python scripts/triangle_estimate_probe.py <sf_dir> [budget_gb]
Prints one JSON line
  {"sf_dir":..., "edges": N, "wedges": N, "budget_gb": G, "auto_k": K,
   "estimate_sec": S}
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

from pyspark.sql import functions as F  # noqa: E402


def main() -> None:
    from ophidia_server_spark.pipeline.graph import _WEDGE_SPILL_BYTES
    from ophidia_server_spark.session import get_spark, load_tables

    sf_dir = sys.argv[1]
    budget_gb = float(sys.argv[2]) if len(sys.argv) > 2 else float(
        os.environ.get("SPARK_GRAFT_TRIANGLE_SCRATCH_GB", "32")
    )
    spark = get_spark("triangle_estimate_probe")
    li = load_tables(spark, sf_dir)["lineitem"].select(
        "l_orderkey", "l_partkey"
    )
    a, b = li.alias("a"), li.alias("b")
    edges = a.join(
        b,
        (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.col("a.l_partkey").alias("src"), F.col("b.l_partkey").alias("dst")
    )
    t0 = time.time()
    # the estimate pre-pass, verbatim from triangle_counts(chunks="auto"):
    # clean -> degree -> orient -> Σ d·(d−1)/2 over oriented out-degrees
    und = edges.select(
        F.least("src", "dst").alias("__a"), F.greatest("src", "dst").alias("__b")
    ).filter(F.col("__a") != F.col("__b")).distinct()
    deg = (
        und.select(F.col("__a").alias("node"))
        .unionByName(und.select(F.col("__b").alias("node")))
        .groupBy("node").agg(F.count(F.lit(1)).alias("__deg"))
    )
    da = deg.select(F.col("node").alias("__a"), F.col("__deg").alias("__dega"))
    db = deg.select(F.col("node").alias("__b"), F.col("__deg").alias("__degb"))
    keyed = und.join(da, "__a").join(db, "__b")
    fwd = F.struct("__dega", "__a") < F.struct("__degb", "__b")
    oriented = keyed.select(
        F.when(fwd, F.col("__a")).otherwise(F.col("__b")).alias("__lo"),
    )
    agg = oriented.groupBy("__lo").agg(
        F.count(F.lit(1)).alias("__d")
    ).agg(
        F.sum(F.col("__d") * (F.col("__d") - 1) / F.lit(2)).alias("__w"),
        F.sum("__d").alias("__e"),
    ).first()
    wedges = float(agg["__w"] or 0)
    n_edges = int(agg["__e"] or 0)
    k = max(1, math.ceil(wedges * _WEDGE_SPILL_BYTES / (budget_gb * 1e9)))
    print(json.dumps({
        "sf_dir": sf_dir, "edges": n_edges, "wedges": int(wedges),
        "budget_gb": budget_gb, "auto_k": k,
        "estimate_sec": round(time.time() - t0, 1),
    }))


if __name__ == "__main__":
    main()
