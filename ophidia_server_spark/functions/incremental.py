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
# overflow its 38-digit cap). NOTE the rounding contract this implies:
# inputs are ROUNDED to `value_decimals` places before any sum — the state
# is exact over the ROUNDED values, not over arbitrary-precision doubles.
_VDEC = "decimal(18,{d})"


def aggregate_state(
    df: DataFrame, keys: list[str], value_col: str, value_decimals: int = 2,
) -> DataFrame:
    """One batch's per-group state over `value_col`: (keys..., n, s, s2,
    mn, mx). One grouped aggregate with map-side partials; decimal sums
    keep the state exact and merge-order-independent.

    ROUNDING CONTRACT: the value column is cast to
    DECIMAL(18, `value_decimals`) first — half-up rounding at that scale —
    so every downstream exact claim (merge law, finalize avg/variance,
    features.standardize_by_group / minmax_by_group) holds over the
    rounded values. The default (2) suits currency-like fact measures;
    raise it (up to 6: s2 must stay inside DECIMAL(38,6) both engines)
    for finer measures, and use the SAME value everywhere a state table
    is merged — states built at different scales must never be merged."""
    if not 0 <= int(value_decimals) <= 6:
        raise ValueError("value_decimals must be in [0, 6] "
                         "(s2 must fit DECIMAL(38,6) in both engines)")
    v = F.col(value_col).cast(_VDEC.format(d=int(value_decimals)))
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


def maintain_state_from_diff(
    prev_state: DataFrame,
    diff: DataFrame,
    latest: DataFrame,
    group_col: str,
    value_col: str,
    value_decimals: int = 2,
) -> DataFrame:
    """INCREMENTAL VIEW MAINTENANCE over a CDC diff — the 100 TB rollup
    refresh that never re-aggregates the table: `prev_state` is the
    aggregate_state table for the OLD version, `diff` a
    layout.snapshot_diff(..., carry_cols=[group_col, value_col]) between
    the old and new versions, `latest` the new version's rows (for the
    extrema repair only — read with predicate/file pruning, it is touched
    solely for changed groups). Returns the exact aggregate_state of the
    NEW version:

      * count/sum/sumsq are SELF-MAINTAINABLE (Gray et al. distributive
        aggregates): add every inserted/updated-new (group, value),
        subtract every deleted/updated-old one — exact decimals make the
        arithmetic order-free, and updates that MOVE a row between groups
        fall out naturally (subtract from the old group, add to the new);
      * min/max are NOT self-maintainable under deletes, so the touched
        groups — bounded by the diff, not the table — get their extrema
        recomputed from `latest`; untouched groups keep theirs.

    Cost: one diff-sized aggregate, a state-sized merge join, and one
    scan of the touched groups' rows. Groups whose non-null-measure count
    reaches zero drop out of the state — the state tracks groups BY their
    measure (aggregate_state's n = count(value_col) convention), so a
    group holding only NULL measures is absent here, while aggregate_state
    of the raw table would list it with n=0."""
    dec = _VDEC.format(d=int(value_decimals))
    og, ng = f"old_{group_col}", f"new_{group_col}"
    ov, nv = f"old_{value_col}", f"new_{value_col}"
    removed = diff.filter(F.col("change_type").isin("delete", "update")).select(
        F.col(og).alias("__g"), F.col(ov).cast(dec).alias("__v"),
        F.lit(-1).alias("__sgn"),
    )
    added = diff.filter(F.col("change_type").isin("insert", "update")).select(
        F.col(ng).alias("__g"), F.col(nv).cast(dec).alias("__v"),
        F.lit(1).alias("__sgn"),
    )
    # conditional negation, not sign multiplication: v*v already sits at
    # decimal(37, 2d); another multiply would push past 38 digits and force
    # a rounding Spark/DuckDB may disagree on — negation keeps scale exact
    pos = F.col("__sgn") > 0
    sv = F.when(pos, F.col("__v")).otherwise(-F.col("__v"))
    vv = F.col("__v") * F.col("__v")
    sv2 = F.when(pos, vv).otherwise(-vv)
    # n mirrors aggregate_state's F.count(value_col): NULL measures are
    # not counted, so a NULL-valued insert/delete must not drift the count
    dn = F.when(F.col("__v").isNotNull(), F.col("__sgn")).otherwise(F.lit(0))
    delta = removed.unionByName(added).groupBy("__g").agg(
        F.sum(dn).cast("long").alias("__dn"),
        F.sum(sv).cast(_DEC).alias("__ds"),
        F.sum(sv2).cast(_DEC).alias("__ds2"),
    )
    merged = prev_state.join(
        delta, prev_state[group_col].eqNullSafe(delta["__g"]), "full_outer"
    ).select(
        F.coalesce(prev_state[group_col], delta["__g"]).alias(group_col),
        (F.coalesce(F.col("n"), F.lit(0)) + F.coalesce(F.col("__dn"), F.lit(0)))
        .cast("long").alias("n"),
        (F.coalesce(F.col("s"), F.lit(0).cast(_DEC))
         + F.coalesce(F.col("__ds"), F.lit(0).cast(_DEC))).cast(_DEC).alias("s"),
        (F.coalesce(F.col("s2"), F.lit(0).cast(_DEC))
         + F.coalesce(F.col("__ds2"), F.lit(0).cast(_DEC))).cast(_DEC).alias("s2"),
        F.col("mn"), F.col("mx"),
        F.col("__dn").isNotNull().alias("__touched"),
    )
    v = F.col(value_col).cast(dec)
    ext = latest.join(
        delta.select(F.col("__g")),
        latest[group_col].eqNullSafe(F.col("__g")), "left_semi"
    ).groupBy(group_col).agg(
        F.min(v).cast(_DEC).alias("__mn2"),
        F.max(v).cast(_DEC).alias("__mx2"),
    ).withColumnRenamed(group_col, "__eg")
    return (
        merged.join(
            ext, F.col(group_col).eqNullSafe(F.col("__eg")), "left"
        )
        .filter(F.col("n") > 0)
        .select(
            group_col,
            "n",
            "s",
            "s2",
            F.when(F.col("__touched"), F.col("__mn2"))
            .otherwise(F.col("mn")).cast(_DEC).alias("mn"),
            F.when(F.col("__touched"), F.col("__mx2"))
            .otherwise(F.col("mx")).cast(_DEC).alias("mx"),
        )
    )


def _committed_gens(state_path: str) -> list[int]:
    """Generations with BOTH commit markers: the parquet job's _SUCCESS and
    the `_batch` file written strictly after it. Anything else is a crash
    remnant and invisible."""
    import os as _os

    if not _os.path.isdir(state_path):
        return []
    out = []
    for d in _os.listdir(state_path):
        if d.startswith("g") and d[1:].isdigit():
            full = _os.path.join(state_path, d)
            if _os.path.exists(_os.path.join(full, "_batch")) and (
                _os.path.exists(_os.path.join(full, "_SUCCESS"))
            ):
                out.append(int(d[1:]))
    return sorted(out)


def make_batch_folder(
    state_path: str,
    keys: list[str],
    value_col: str,
    value_decimals: int = 2,
):
    """The foreachBatch body of stream_maintain_state, exposed so the
    at-least-once replay contract is directly testable: folding batch N is
    idempotent BECAUSE the folded-in batch id is part of the generation
    commit itself (the `_batch` marker lands after the parquet write), and
    the previous state is always read from the newest COMMITTED generation
    — a crash remnant g{N+1} without its marker is ignored and overwritten
    on replay, never double-merged (ADVICE r7)."""
    import os as _os

    def _batch_of(gen: int) -> int:
        with open(_os.path.join(state_path, f"g{gen}", "_batch")) as fh:
            return int(fh.read().strip())

    def _merge_batch(batch_df, batch_id: int) -> None:
        gens = _committed_gens(state_path)
        gen = gens[-1] if gens else 0
        if gens and batch_id <= _batch_of(gen):
            return  # already folded into a committed generation
        new = aggregate_state(batch_df, keys, value_col, value_decimals)
        if gen > 0:
            stored = batch_df.sparkSession.read.parquet(
                _os.path.join(state_path, f"g{gen}")
            )
            new = merge_states(keys, stored, new)
        gen_dir = _os.path.join(state_path, f"g{gen + 1}")
        new.write.mode("overwrite").parquet(gen_dir)
        # the commit: only now does g{gen+1} become readable/latest
        with open(_os.path.join(gen_dir, "_batch.tmp"), "w") as fh:
            fh.write(str(batch_id))
        _os.replace(
            _os.path.join(gen_dir, "_batch.tmp"),
            _os.path.join(gen_dir, "_batch"),
        )

    return _merge_batch


def stream_maintain_state(
    spark,
    src_path: str,
    schema: str,
    state_path: str,
    keys: list[str],
    value_col: str,
    value_decimals: int = 2,
    max_files_per_trigger: int | None = None,
) -> None:
    """Structured-Streaming maintenance of the rollup state: a parquet
    file stream feeds foreachBatch, each micro-batch computes ITS OWN
    O(groups) state and merges it with the stored table, and the merge is
    committed as a new generation directory (read-after-swap — readers
    always see a complete generation; the single-writer manifest
    convention this repo uses everywhere). History is never rescanned:
    per micro-batch cost is one grouped aggregate over the batch plus a
    state-sized merge. availableNow processes the backlog and stops, so
    the call is batch-job-shaped; a live deployment drops that trigger.

    Idempotency: foreachBatch is AT-LEAST-ONCE, so the folded-in batch id
    is part of the GENERATION COMMIT itself — a `_batch` file written into
    the generation dir strictly after the parquet job (and its _SUCCESS)
    lands. A generation without both markers is an uncommitted crash
    remnant: replays ignore it, derive the last folded batch from the
    newest COMMITTED generation, and overwrite the remnant. A separate
    last-batch marker would reintroduce the double-merge window between
    the data write and the marker write (ADVICE r7)."""
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        # one source file per micro-batch: the sustained-ingest bench (and
        # any latency measurement) needs the per-batch commit cadence, not
        # one availableNow mega-batch over the whole backlog
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    (
        reader.parquet(src_path)
        .writeStream.foreachBatch(
            make_batch_folder(state_path, keys, value_col, value_decimals)
        )
        .option("checkpointLocation", state_path + "_ckpt")
        .trigger(availableNow=True)
        .start()
        .awaitTermination()
    )


def read_state(spark, state_path: str):
    """The newest COMMITTED state generation (both the parquet _SUCCESS and
    the `_batch` commit marker present — a crash mid-write never becomes
    'latest')."""
    import os as _os

    gens = _committed_gens(state_path)
    if not gens:
        raise FileNotFoundError(f"no committed state generations under {state_path}")
    return spark.read.parquet(_os.path.join(state_path, f"g{max(gens)}"))
