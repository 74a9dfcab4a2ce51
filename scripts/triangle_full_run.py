"""Full chunked triangle count at a decade replica — the timed run the
estimate probe predicts (scripts/triangle_estimate_probe.py reports the K
that `chunks="auto"` would pick; THIS script actually executes the rounds
and records what the chunk law promises: wall time and the disk
high-water staying inside the scratch budget).

Usage: python scripts/triangle_full_run.py <sf_dir> [budget_gb]

Drains to scalars (Σ n_triangles, node count) — driver traffic is two
longs, the honest engine-side shape (the round-12 noop-sink lesson).
Disk high-water is sampled from the filesystem holding the Spark local
dirs every 5 s in a daemon thread. Prints one JSON line:
  {"sf_dir":..., "auto_k":..., "wedges":..., "nodes":...,
   "triangle_sum":..., "wall_sec":..., "disk_high_water_gb":...,
   "budget_gb":...}
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import threading
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    from pyspark.sql import functions as F

    from ophidia_server_spark.pipeline.graph import (
        auto_chunks, clean_and_orient, triangle_counts, wedge_total,
    )
    from ophidia_server_spark.registry import triangle_gate_edges
    from ophidia_server_spark.session import get_spark

    sf_dir = sys.argv[1]
    budget_gb = float(sys.argv[2]) if len(sys.argv) > 2 else None
    if budget_gb is not None:
        os.environ["SPARK_GRAFT_TRIANGLE_SCRATCH_GB"] = str(budget_gb)
    spark = get_spark("triangle_full_run")
    local_dir = spark.conf.get("spark.local.dir", "/tmp")

    # disk high-water sampler: used bytes on the scratch filesystem,
    # relative to the baseline at start (so pre-existing data never counts)
    base_used = shutil.disk_usage(local_dir).used
    high_water = {"bytes": 0}
    stop = threading.Event()

    def sample() -> None:
        while not stop.is_set():
            used = shutil.disk_usage(local_dir).used - base_used
            if used > high_water["bytes"]:
                high_water["bytes"] = used
            stop.wait(5.0)

    t = threading.Thread(target=sample, daemon=True)
    t.start()

    edges = triangle_gate_edges(spark, sf_dir)
    # Run the auto pre-pass HERE so its numbers land in the record, then
    # hand the chosen K to the operator. DISK_ONLY-persisting `oriented`
    # first means the operator's own identical-plan clean_and_orient
    # (CacheManager dedups by plan) reuses this one materialization — the
    # pre-pass is paid exactly once, same as the operator's internal
    # chunks="auto" path.
    from pyspark.storagelevel import StorageLevel

    t0 = time.time()
    _, oriented = clean_and_orient(edges)
    oriented = oriented.persist(StorageLevel.DISK_ONLY)
    wedges = wedge_total(oriented)
    k = auto_chunks(wedges)
    counts = triangle_counts(edges, chunks=k)
    row = counts.agg(
        F.sum("n_triangles").alias("s"), F.count(F.lit(1)).alias("n")
    ).first()
    wall = time.time() - t0
    stop.set()
    t.join(timeout=10)
    print(json.dumps({
        "sf_dir": sf_dir,
        "auto_k": k,
        "wedges": int(wedges),
        "nodes": int(row["n"]),
        "triangle_sum": int(row["s"]),
        "wall_sec": round(wall, 1),
        "disk_high_water_gb": round(high_water["bytes"] / 1e9, 2),
        "budget_gb": budget_gb or float(
            os.environ.get("SPARK_GRAFT_TRIANGLE_SCRATCH_GB", "32")
        ),
    }))


if __name__ == "__main__":
    main()
