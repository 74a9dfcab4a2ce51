"""Skew mitigation utilities — the 100 TB join toolbox.

Order of preference on a real cluster:
  1. broadcast() the small side (dimension tables) — no shuffle at all;
  2. AQE skew-join splitting (on by default in session.py) — handles skewed
     *partitions* at runtime;
  3. explicit salting (this module) — for pathological single-key skew where
     one join key exceeds an executor (AQE splits partitions, but a single
     giant key still lands in one task on the build side of a SMJ).

Salting trades a |salt|-fold replication of the right side for an even
redistribution of the left: correct for any 1:N join where the right side is
modest (catalog/metadata scale) but above the broadcast threshold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def salted_join(
    left: DataFrame, right: DataFrame, on: list[str], n_salt: int = 8, how: str = "inner"
) -> DataFrame:
    """Join with the left (big, skewed) side salted into n_salt shards per key.

    Each left row gets a deterministic-per-row shard; the right side is
    replicated across all shards so every (key, salt) pair finds its match.
    Result equals the plain join, but the heaviest key's rows spread over
    n_salt tasks instead of one.
    """
    if how not in ("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi"):
        # right/full outer would emit one null-extended row per *salt* for
        # unmatched right keys — not equal to the plain join
        raise ValueError(f"salted_join supports inner/left/left_semi, not {how!r}")
    salts = F.array(*[F.lit(i) for i in range(n_salt)])
    lsalt = left.withColumn(
        "__salt", F.pmod(F.monotonically_increasing_id(), F.lit(n_salt)).cast("int")
    )
    rsalt = right.withColumn("__salt", F.explode(salts))
    return lsalt.join(rsalt, on=on + ["__salt"], how=how).drop("__salt")


def skew_stats(df: DataFrame, keys: list[str], top: int = 10) -> DataFrame:
    """Diagnostic: per-key row counts and the share of the heaviest keys —
    run before choosing a join strategy. One partial-agg shuffle."""
    counts = df.groupBy(*keys).agg(F.count("*").alias("n_rows"))
    total = df.count()
    return (
        counts.orderBy(F.desc("n_rows"))
        .limit(top)
        .withColumn("share", F.round(F.col("n_rows") / F.lit(total), 6))
    )


def ensure_min_partitions(df: DataFrame) -> DataFrame:
    """Fan out an under-partitioned input to the session's default
    parallelism — the guard in front of map-heavy stages (b-fold
    explodes, per-shingle hashing) that a single-file source would
    otherwise serialize on one core. A no-op when the input already has
    enough splits (the real-scale case), so it never adds a shuffle
    where partitioning is healthy."""
    spark = df.sparkSession
    want = spark.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df
