"""Sustained micro-batch streaming bench — the steady-state ingest number.

Every streaming GATE runs AvailableNow over a fixed backlog and grades
semantics (exactly-once, watermark drops, backfill replay); none of them
measures steady-state throughput or per-batch commit latency for the
maintained-state paths. This fixture does: it splits the events table into
N one-file micro-batches, drives them through BOTH maintained-state sinks
with maxFilesPerTrigger=1 (each file = one micro-batch, so the cadence is
real), and derives per-batch commit latency from the commit artifacts the
sinks already write — snapshot-manifest mtimes for the versioned-table
sink, generation `_batch` marker mtimes for the rollup-state sink — so the
measurement adds zero instrumentation to the ingest path itself.

Prints ONE JSON line:
  {"metric": "streaming_sustained", "unit": "sec", "value": <total>,
   "sf": ..., "batches": N,
   "window_upsert":   {rows, batches, total_sec, rows_per_sec,
                       batch_commit_p50_sec, batch_commit_max_sec},
   "maintain_state":  {same keys}}

The recorded numbers live in BASELINE.md ("Sustained streaming ingest") —
the regression bar for the ingest path.

Usage: SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 python scripts/bench_streaming.py
"""

from __future__ import annotations

import json
import os
import shutil
import statistics
import sys
import tempfile
import time

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

N_BATCHES = 16


def _percentiles(lats: list[float]) -> tuple[float, float]:
    if not lats:
        return 0.0, 0.0
    return round(statistics.median(lats), 3), round(max(lats), 3)


def main() -> None:
    from pyspark.sql import functions as F

    from ophidia_server_spark import layout
    from ophidia_server_spark.functions import incremental as inc
    from ophidia_server_spark.session import get_spark, load_tables

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark("bench_streaming")
    ev = load_tables(spark, sf_dir)["events"].select(
        "event_id", "event_type",
        F.col("ts").cast("timestamp").alias("ts"),
        F.col("value").cast("double").alias("value"),
    )
    n_rows = ev.count()

    scratch = os.path.join(
        tempfile.gettempdir(), f"ophspark_sbench_{os.getpid()}"
    )
    shutil.rmtree(scratch, ignore_errors=True)
    src = os.path.join(scratch, "src")
    # one file per micro-batch, split by EVENT TIME so the backlog drains
    # in arrival order — the workload a sustained ingest actually sees
    # (round 10's hash-split put every window into every batch, i.e. the
    # pathological every-batch-rewrites-all-state shape; that measured the
    # full-table merge, not steady-state cadence). Files land before the
    # stream starts (a fixed backlog — arrival jitter is not what this
    # measures) and are written oldest-first, so the file source's
    # mtime-ordered listing replays them chronologically.
    # epoch bounds computed IN SPARK (UTC session): collecting naive
    # datetimes and calling .timestamp() would re-interpret them in the
    # OS timezone and silently mis-slot (or drop) rows on non-UTC hosts
    b = ev.agg(
        F.min(F.col("ts").cast("double")).alias("lo"),
        F.max(F.col("ts").cast("double")).alias("hi"),
    ).first()
    lo, hi = float(b["lo"]), float(b["hi"])
    span = (hi - lo) or 1.0
    slot = F.least(
        F.lit(N_BATCHES - 1),
        F.floor(
            (F.col("ts").cast("double") - F.lit(lo))
            / F.lit(span) * N_BATCHES
        ).cast("int"),
    )
    for i in range(N_BATCHES):
        ev.filter(slot == i).coalesce(1).write.mode("append").parquet(src)
    schema = "event_id long, event_type string, ts timestamp, value double"

    out: dict = {
        "metric": "streaming_sustained", "unit": "sec", "sf": sf,
        "batches": N_BATCHES,
    }

    # -- sink 1: watermarked windowed aggregation into the snapshot store --
    table = os.path.join(scratch, "wtable")
    t0 = time.perf_counter()
    # generous watermark = zero drops (rows/s integrity); with the
    # time-ordered backlog each batch still only UPDATES its own window
    # span, so the merge is the pruned steady-state path. state_partitions
    # sized to the ~5k-key window state (the documented latency knob) —
    # 32 state tasks for 6k-row batches is pure per-task overhead.
    layout.stream_window_upsert_to_snapshots(
        spark, src, schema, table, watermark="3650 days",
        state_partitions=8,
    )
    w_total = round(time.perf_counter() - t0, 3)
    man_dir = os.path.join(table, "_manifests")
    mtimes = sorted(
        os.path.getmtime(os.path.join(man_dir, f))
        for f in os.listdir(man_dir)
        if f.startswith("v") and f.endswith(".json")
    )
    w_lats = [round(b - a, 3) for a, b in zip(mtimes, mtimes[1:])]
    p50, mx = _percentiles(w_lats)
    out["window_upsert"] = {
        "rows": n_rows, "batches": len(mtimes), "total_sec": w_total,
        "rows_per_sec": round(n_rows / w_total, 1),
        "batch_commit_p50_sec": p50, "batch_commit_max_sec": mx,
    }

    # -- sink 2: generation-committed rollup state (maintain_state) --------
    state = os.path.join(scratch, "state")
    t0 = time.perf_counter()
    inc.stream_maintain_state(
        spark, src, schema, state, ["event_type"], "value",
        max_files_per_trigger=1,
    )
    s_total = round(time.perf_counter() - t0, 3)
    marks = sorted(
        os.path.getmtime(os.path.join(state, d, "_batch"))
        for d in os.listdir(state)
        if d.startswith("g") and d[1:].isdigit()
        and os.path.exists(os.path.join(state, d, "_batch"))
    )
    s_lats = [round(b - a, 3) for a, b in zip(marks, marks[1:])]
    p50, mx = _percentiles(s_lats)
    out["maintain_state"] = {
        "rows": n_rows, "batches": len(marks), "total_sec": s_total,
        "rows_per_sec": round(n_rows / s_total, 1),
        "batch_commit_p50_sec": p50, "batch_commit_max_sec": mx,
    }

    out["value"] = round(w_total + s_total, 3)
    shutil.rmtree(scratch, ignore_errors=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
