"""Configurable lineage-truncation backend for the iterative family.

Every iterative operator in this engine (PageRank, k-core, multi-source
BFS, connected components, ALS, the exact-ECDF rank family) must truncate
lineage each round or the accumulated plan grows without bound. HOW it
truncates is a deployment decision, not an algorithm decision:

- ``localCheckpoint`` (the default) materializes the truncated blocks on
  the executors that computed them — fastest, zero configuration, exactly
  right on local[32] or a static cluster.  But the blocks live and die
  with their executors: on a preemptible / dynamic-allocation cluster
  (the 100 TB deployment story) ONE executor loss mid-iteration fails the
  whole job, because a localCheckpoint cuts the lineage needed to
  recompute the lost blocks.
- reliable ``df.checkpoint()`` writes the blocks to the SparkContext's
  checkpoint directory (HDFS/S3/GCS on a real cluster) — survives any
  executor loss at the cost of one durable write + read of the iteration
  state per truncation.

The switch is Spark's own, not an engine-specific knob: call
``spark.sparkContext.setCheckpointDir(...)`` (cluster deployments set this
anyway) and every truncation point in the engine upgrades itself to the
reliable backend; leave it unset and the fast local path is used.  Both
backends are result-identical — the pytest suite pins that, plus that the
reliable blocks really are re-readable after the source data disappears
(the executor-loss survival property localCheckpoint cannot offer).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def checkpoint(df: DataFrame, eager: bool = True) -> DataFrame:
    """Truncate `df`'s lineage with the configured durability backend.

    Reliable ``df.checkpoint`` when the context has a checkpoint directory
    (``sc.setCheckpointDir`` was called), else ``df.localCheckpoint``.
    `eager=False` defers materialization to the first action — callers use
    it when the very next statement is a count() that materializes anyway
    (one job per round instead of two)."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        return df.checkpoint(eager=eager)
    return df.localCheckpoint(eager=eager)
