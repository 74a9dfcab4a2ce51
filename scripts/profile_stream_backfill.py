"""Phase-profile the layout_stream_backfill lifecycle at sf0.1.

Times each lifecycle phase (source write, first stream run, checkpoint
wipe + replay run, final read) separately so the optimization target is
the measured phase, not a guess. Usage:
  SPARK_GRAFT_CPUS=32 python scripts/profile_stream_backfill.py [repeats]
"""

from __future__ import annotations

import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ophidia_server_spark import layout as lay2  # noqa: E402
from ophidia_server_spark.registry import _t  # noqa: E402
from ophidia_server_spark.session import get_spark  # noqa: E402


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    repeats = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    spark = get_spark("profile_stream_backfill")
    ev = _t(spark, sf_dir)["events"].filter("event_id < 4000").select(
        "event_id", "event_type", F.col("ts").cast("timestamp").alias("ts"),
        F.col("value").cast("double").alias("value"),
    )
    for rep in range(repeats):
        tag = f"profile_{os.getpid()}_{rep}"
        src = f"/tmp/ophidia_wstream_src_{tag}"
        table = f"/tmp/ophidia_wstream_tbl_{tag}"
        for p in (src, table, table + "_ckpt"):
            shutil.rmtree(p, ignore_errors=True)
        t0 = time.perf_counter()
        for i in range(2):
            ev.filter(F.pmod("event_id", F.lit(2)) == i).coalesce(1).write.mode(
                "append"
            ).parquet(src)
        t1 = time.perf_counter()
        schema = "event_id long, event_type string, ts timestamp, value double"
        lay2.stream_window_upsert_to_snapshots(
            spark, src, schema, table, watermark="3650 days",
        )
        t2 = time.perf_counter()
        shutil.rmtree(table + "_ckpt")
        lay2.stream_window_upsert_to_snapshots(
            spark, src, schema, table, watermark="3650 days",
        )
        t3 = time.perf_counter()
        n = lay2.snapshot_read(spark, table).count()
        t4 = time.perf_counter()
        print(
            f"rep={rep} src_write={t1-t0:.2f} stream1={t2-t1:.2f} "
            f"replay={t3-t2:.2f} read={t4-t3:.2f} total={t4-t0:.2f} rows={n}",
            flush=True,
        )
        for p in (src, table, table + "_ckpt"):
            shutil.rmtree(p, ignore_errors=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
