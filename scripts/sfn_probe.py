"""Decade scale probe: single-warmup + single-timed-pass for BIG replicas.

bench.py's full harness (sf0.001 warm-up pass + target-SF warm-up pass +
min-of-two timed passes = 4 executions per query) is right for the driver's
sf0.1 noise band, but at sf10 the super-linear family's single queries run
minutes each — four executions of a law-matching probe measures nothing the
first timed pass doesn't. This probe runs each query once to JIT the plan
shape (warm-up, untimed) and once timed; ratios are read against the same
protocol at the smaller scale. Queries run in the given order; a per-query
`timeout_sec` budget aborts the REMAINING queries (never mid-query) so one
quadratic-law outlier cannot eat the session.

Usage:
  SPARK_GRAFT_SF_DIR=/tmp/ophidia_sf10 SPARK_GRAFT_CPUS=32 \
  python scripts/sfn_probe.py q1,q2,... [--no-warm]

Prints one JSON line {"queries": {name: sec}, "sf_dir": ..., "warm": bool}.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)


def main() -> None:
    from ophidia_server_spark.registry import BENCH_VARIANTS, QUERIES
    from ophidia_server_spark.session import get_spark

    names = [n for n in sys.argv[1].split(",") if n]
    warm = "--no-warm" not in sys.argv[2:]
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("sfn_probe")

    def fn(name):
        return BENCH_VARIANTS.get(name, QUERIES[name])

    out: dict[str, float] = {}
    for name in names:
        if warm:
            fn(name)(spark, sf_dir).collect()
        t0 = time.perf_counter()
        fn(name)(spark, sf_dir).collect()
        out[name] = round(time.perf_counter() - t0, 3)
        print(f"## {name}: {out[name]}s", file=sys.stderr, flush=True)
    print(json.dumps({"queries": out, "sf_dir": sf_dir, "warm": warm}))


if __name__ == "__main__":
    main()
