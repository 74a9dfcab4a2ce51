"""Per-query job census: run each named query warm and report wall time
plus the number of Spark JOBS it launched (driver round-trips are the
job-overhead lever the iterative/lifecycle family pays at cluster
latencies). Uses the bench variant when one exists — the same plan the
bench times.

Usage: SPARK_GRAFT_CPUS=32 python scripts/profile_jobs.py <query> [...]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from ophidia_server_spark.registry import BENCH_VARIANTS, QUERIES  # noqa: E402
from ophidia_server_spark.session import get_spark  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("profile_jobs")
    sc = spark.sparkContext
    for name in names:
        fn = BENCH_VARIANTS.get(name, QUERIES[name])
        fn(spark, sf_dir).collect()  # warm
        tracker = sc.statusTracker()
        before = set(tracker.getJobIdsForGroup(None) or [])
        sc.setJobGroup(f"prof_{name}", name)
        t0 = time.perf_counter()
        fn(spark, sf_dir).collect()
        dt = time.perf_counter() - t0
        jobs = tracker.getJobIdsForGroup(f"prof_{name}") or []
        sc.setJobGroup(None, None)
        print(f"{name}: {dt:.2f}s jobs={len(jobs)}", flush=True)


if __name__ == "__main__":
    main()
