"""Phase-profile the sim_index_append_lsh_recall lifecycle at sf0.1 and
A/B the parquet directory-listing path: with 384 partition directories the
default spark.sql.sources.parallelPartitionDiscovery.threshold (32) makes
every fresh store open run a DISTRIBUTED listing job; above the threshold
the driver lists the local directories itself.

Usage: SPARK_GRAFT_CPUS=32 python scripts/profile_lsh_lifecycle.py [sf_dir]
"""
from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from ophidia_server_spark.registry import _recall_rounds, _t  # noqa: E402
from ophidia_server_spark.session import get_spark  # noqa: E402
from ophidia_server_spark.pipeline import vector_store as vs  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("profile_lsh")
    emb = _t(spark, sf_dir)["embeddings"]
    emb.count()  # warm page cache / JIT

    def lifecycle(tag: str) -> None:
        n = emb.count()
        half = n // 2
        path = os.path.join(
            tempfile.gettempdir(), f"ophspark_prof_lsh_{os.getpid()}_{tag}"
        )
        shutil.rmtree(path, ignore_errors=True)
        phases: list[tuple[str, float]] = []

        def fence(name, fn):
            t0 = time.perf_counter()
            out = fn()
            phases.append((name, time.perf_counter() - t0))
            return out

        idx = fence("build", lambda: vs.lsh_build(
            emb.filter(F.col("vec_id") < half), path, bits=5, tables=12))
        fence("append", lambda: vs.index_append(
            emb.filter(F.col("vec_id") >= half), idx))
        rep = fence("compact", lambda: vs.index_compact(spark, idx))
        fence("distinct", lambda: idx.stored_df(spark)
              .select("vec_id").distinct().count())
        fence("recall_rounds", lambda: _recall_rounds(
            spark, emb,
            lambda qv: vs.lsh_probe(spark, idx, qv, k=10, hamming=2), 0.5))
        total = sum(t for _, t in phases)
        print(f"[{tag}] total={total:.2f}s rows={rep['rows']} "
              + " ".join(f"{n}={t:.2f}" for n, t in phases), flush=True)
        shutil.rmtree(path, ignore_errors=True)

    # interleaved A/B: default threshold vs driver-side listing
    for rep in range(3):
        spark.conf.unset("spark.sql.sources.parallelPartitionDiscovery.threshold")
        lifecycle(f"default_r{rep}")
        spark.conf.set(
            "spark.sql.sources.parallelPartitionDiscovery.threshold", "1024")
        lifecycle(f"thresh1024_r{rep}")
    spark.conf.unset("spark.sql.sources.parallelPartitionDiscovery.threshold")


if __name__ == "__main__":
    main()
