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
    (one job per round instead of two); the deferral applies to the LOCAL
    backend only (see below).

    Reliable-mode cost shape: a bare ``df.checkpoint()`` computes the plan
    TWICE (the caller's action plus ReliableRDDCheckpointData's separate
    file-write job), so the reliable branch persists first — the
    checkpoint write job then reads the cached blocks — and unpersists as
    soon as the files are down. That forces eager materialization (the
    persist must be released deterministically), which is why eager=False
    is a local-mode-only optimization.

    Reliable-mode retention: checkpoint files are deleted by Spark's
    ContextCleaner when the checkpointed RDD is garbage-collected ONLY
    under ``spark.cleaner.referenceTracking.cleanCheckpoints=true``
    (default false). session.get_spark sets it; a deployment that builds
    its own SparkSession must set it too, or every iteration of the
    graph/ALS/dedup family leaks one O(state) directory to the checkpoint
    store for the life of the application."""
    sc = df.sparkSession.sparkContext
    if sc.getCheckpointDir() is not None:
        from pyspark import StorageLevel

        df = df.persist(StorageLevel.MEMORY_AND_DISK)
        out = df.checkpoint(eager=True)
        df.unpersist()
        return out
    return df.localCheckpoint(eager=eager)
