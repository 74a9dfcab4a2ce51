"""Incremental aggregate maintenance: mergeable exact per-group states.

The 100 TB problem this solves: a dashboard / rollup table over an
append-only fact stream should NOT rescan history on every batch. The
classic answer (Gray et al.'s distributive/algebraic aggregate taxonomy,
and every materialized-view maintenance engine since) is to keep a
PER-GROUP STATE of distributive components — count, sum, min, max, sum of
squares — which

  * each batch computes with one map-side-combined groupBy over ITSELF,
  * merges associatively with the stored state (+ for count/sum/sumsq,
    min/max for the extrema),
  * finalizes into the algebraic metrics (avg, variance) only at read time.

Exactness contract: sums are carried as DECIMAL(38,6), so merging is
EXACT and order-independent — state(A union B) == merge(state(A), state(B))
bit-for-bit, which the correctness gate hashes (double sums would drift by
summation order). The state table is O(groups), not O(rows); the fact
table is read once per batch, never re-read.

This generalizes the sketch ingest chain (functions/sketches.py merges
approximate states the same way) to exact aggregates, and the same shape
backs streaming: windows.py's stateful aggregations are this state kept by
the engine instead of a table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_DEC = "decimal(38,6)"
# the input cast: narrow enough that v*v stays inside DECIMAL(38,*) in
# BOTH engines (DuckDB multiplies 18+18 -> 36 digits; 38,6 squared would
# overflow its 38-digit cap), wide enough for any fact measure
_VDEC = "decimal(18,2)"


def aggregate_state(df: DataFrame, keys: list[str], value_col: str) -> DataFrame:
    """One batch's per-group state over `value_col`: (keys..., n, s, s2,
    mn, mx). One grouped aggregate with map-side partials; decimal sums
    keep the state exact and merge-order-independent."""
    v = F.col(value_col).cast(_VDEC)
    return df.groupBy(*keys).agg(
        F.count(value_col).cast("long").alias("n"),
        F.sum(v).cast(_DEC).alias("s"),
        F.sum(v * v).cast(_DEC).alias("s2"),
        F.min(v).cast(_DEC).alias("mn"),
        F.max(v).cast(_DEC).alias("mx"),
    )


def merge_states(keys: list[str], *states: DataFrame) -> DataFrame:
    """Associative merge of state tables: counts/sums add, extrema
    min/max. Each input is O(groups) rows, so the merge never touches the
    fact data — this is the append-batch refresh."""
    out = states[0]
    for t in states[1:]:
        out = out.unionByName(t)
    return out.groupBy(*keys).agg(
        F.sum("n").cast("long").alias("n"),
        F.sum("s").cast(_DEC).alias("s"),
        F.sum("s2").cast(_DEC).alias("s2"),
        F.min("mn").cast(_DEC).alias("mn"),
        F.max("mx").cast(_DEC).alias("mx"),
    )


def finalize_state(state: DataFrame, keys: list[str]) -> DataFrame:
    """Algebraic read-time metrics from the distributive state: count,
    sum, min, max exact; avg and population variance derived as
    exact-sum / count in double, ROUND(6) (the repo's cross-engine float
    convention). A pure map over the O(groups) state table."""
    n = F.col("n").cast("double")
    s = F.col("s").cast("double")
    s2 = F.col("s2").cast("double")
    avg = F.when(F.col("n") > 0, s / n).otherwise(F.lit(None))
    var = F.when(F.col("n") > 0, s2 / n - (s / n) * (s / n)).otherwise(
        F.lit(None)
    )
    return state.select(
        *keys,
        F.col("n").alias("count"),
        F.col("s").cast("double").alias("sum"),
        F.col("mn").cast("double").alias("min"),
        F.col("mx").cast("double").alias("max"),
        F.round(avg, 6).alias("avg"),
        F.round(F.greatest(var, F.lit(0.0)), 6).alias("variance"),
    )


def stream_maintain_state(
    spark,
    src_path: str,
    schema: str,
    state_path: str,
    keys: list[str],
    value_col: str,
) -> None:
    """Structured-Streaming maintenance of the rollup state: a parquet
    file stream feeds foreachBatch, each micro-batch computes ITS OWN
    O(groups) state and merges it with the stored table, and the merge is
    committed as a new generation directory (read-after-swap — readers
    always see a complete generation; the single-writer manifest
    convention this repo uses everywhere). History is never rescanned:
    per micro-batch cost is one grouped aggregate over the batch plus a
    state-sized merge. availableNow processes the backlog and stops, so
    the call is batch-job-shaped; a live deployment drops that trigger."""
    import os as _os

    def _latest_gen() -> int:
        if not _os.path.isdir(state_path):
            return 0
        gens = [
            int(d[1:]) for d in _os.listdir(state_path)
            if d.startswith("g") and d[1:].isdigit()
        ]
        return max(gens, default=0)


    def _last_batch() -> int:
        marker = _os.path.join(state_path, "_last_batch")
        if not _os.path.exists(marker):
            return -1
        with open(marker) as fh:
            return int(fh.read().strip())

    def _merge_batch(batch_df, batch_id: int) -> None:
        # foreachBatch is AT-LEAST-ONCE: a batch whose generation committed
        # but whose checkpoint didn't may replay — the batch-id marker makes
        # the merge idempotent (skip what's already folded in), which is
        # exactly how foreachBatch sinks are supposed to dedupe
        if batch_id <= _last_batch():
            return
        new = aggregate_state(batch_df, keys, value_col)
        gen = _latest_gen()
        if gen > 0:
            stored = batch_df.sparkSession.read.parquet(
                _os.path.join(state_path, f"g{gen}")
            )
            new = merge_states(keys, stored, new)
        new.write.mode("overwrite").parquet(
            _os.path.join(state_path, f"g{gen + 1}")
        )
        marker = _os.path.join(state_path, "_last_batch")
        with open(marker + ".tmp", "w") as fh:
            fh.write(str(batch_id))
        _os.replace(marker + ".tmp", marker)

    (
        spark.readStream.schema(schema).parquet(src_path)
        .writeStream.foreachBatch(_merge_batch)
        .option("checkpointLocation", state_path + "_ckpt")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def read_state(spark, state_path: str):
    """The newest committed state generation."""
    import os as _os

    gens = [
        int(d[1:]) for d in _os.listdir(state_path)
        if d.startswith("g") and d[1:].isdigit()
    ]
    if not gens:
        raise FileNotFoundError(f"no state generations under {state_path}")
    return spark.read.parquet(_os.path.join(state_path, f"g{max(gens)}"))
