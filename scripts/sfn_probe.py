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
  python scripts/sfn_probe.py q1,q2,... [--no-warm] [--timeout=SEC]

Prints one JSON line {"queries": {name: sec}, "errors": {name: msg},
"skipped": [...], "sf_dir": ..., "warm": bool}. `errors` records queries
whose run raised (a named scale guard firing IS a probe result — e.g.
BlockCardinalityError at a decade the blocking key wasn't sized for);
`skipped` lists the queries abandoned after one query's warm-up+timed wall
time exceeded the --timeout budget.
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
    timeout = None
    for arg in sys.argv[2:]:
        if arg.startswith("--timeout="):
            timeout = float(arg.split("=", 1)[1])
    unknown = [n for n in names if n not in QUERIES]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("sfn_probe")

    def fn(name):
        return BENCH_VARIANTS.get(name, QUERIES[name])

    def drain(df) -> None:
        # round-12 decade lesson: gate results can be DATA-PROPORTIONAL
        # (events_interpolate_linear returns the interpolated series —
        # ~100M rows at sf100), and .collect() then measures
        # driver-serialization until spark.driver.maxResultSize kills it,
        # not the engine. The noop sink computes every operator and drops
        # rows executor-side — the same drain a real 100 TB job's sink
        # provides. Ratios stay probe-vs-probe: all decade numbers from
        # round 12 on use this drain at every scale.
        df.write.format("noop").mode("overwrite").save()

    out: dict[str, float] = {}
    errors: dict[str, str] = {}
    skipped: list[str] = []
    for pos, name in enumerate(names):
        wall0 = time.perf_counter()
        try:
            if warm:
                drain(fn(name)(spark, sf_dir))
            t0 = time.perf_counter()
            drain(fn(name)(spark, sf_dir))
        except Exception as exc:  # noqa: BLE001 — a named guard firing at
            # this scale IS a probe result (e.g. BlockCardinalityError);
            # record it and keep probing the rest of the list
            errors[name] = f"{type(exc).__name__}: {exc}"
            print(f"## {name}: ERROR {errors[name][:200]}",
                  file=sys.stderr, flush=True)
        else:
            out[name] = round(time.perf_counter() - t0, 3)
            print(f"## {name}: {out[name]}s", file=sys.stderr, flush=True)
        # budget check AFTER the query completes OR raises (never abort
        # mid-query): an erroring query can burn just as much wall time as a
        # completing one — e.g. a spill-bound join that dies on disk-full
        # after 20 minutes — so both paths count against the budget and
        # forfeit the rest of the list, loudly
        if timeout is not None and time.perf_counter() - wall0 > timeout:
            skipped = names[pos + 1:]
            if skipped:
                print(f"## budget exceeded by {name}; skipping {skipped}",
                      file=sys.stderr, flush=True)
            break
    print(json.dumps({"queries": out, "errors": errors, "skipped": skipped,
                      "sf_dir": sf_dir, "warm": warm}))


if __name__ == "__main__":
    main()
