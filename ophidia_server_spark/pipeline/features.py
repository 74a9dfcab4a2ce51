"""Feature-engineering transforms for training tables.

The trio a tabular/feature pipeline runs after cleaning: standardize
(z-score) or min-max scale numeric columns per group, and encode
categorical vocabularies to dense ids. All deterministic and engine-
portable: moments come from the exact-decimal incremental states
(functions/incremental.py), vocabulary ids from a frequency-then-name
total order — no RNG, no driver-side fitting state beyond O(groups) /
O(vocabulary) tables.

Scale shape: every transform is one grouped aggregate (groups- or
vocab-sized result) + a join back that AQE broadcasts when small + a pure
map. Nothing data-sized is ever collected.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ophidia_server_spark.ckpt import checkpoint as _ckpt
from ophidia_server_spark.functions.incremental import aggregate_state


def standardize_by_group(
    df: DataFrame,
    value_col: str,
    group_col: str,
    eps: float = 1e-12,
) -> DataFrame:
    """z-score per group: (v - mean_g) / sqrt(var_g + eps), with the
    moments computed EXACTLY (decimal sums, functions/incremental.py) so
    the result is reproducible across engines and partitionings. Groups
    with zero variance standardize to 0. Adds `zscore` ROUND(6)."""
    # UNROUNDED moments straight from the exact-decimal state (finalize's
    # ROUND(6) is a display convention — rounding an intermediate would
    # poison every z-score's 6th decimal)
    st = aggregate_state(df, [group_col], value_col)
    n = F.col("n").cast("double")
    m = F.col("s").cast("double") / n
    var = F.greatest(
        F.col("s2").cast("double") / n - m * m, F.lit(0.0)
    )
    stats = st.select(group_col, m.alias("__m"), var.alias("__var"))
    v = F.col(value_col).cast("double")
    z = F.when(
        F.col("__var") > 0,
        (v - F.col("__m")) / F.sqrt(F.col("__var") + F.lit(float(eps))),
    ).otherwise(F.lit(0.0))
    return (
        df.join(stats, group_col)
        .withColumn("zscore", F.round(z, 6))
        .drop("__m", "__var")
    )


def minmax_by_group(
    df: DataFrame, value_col: str, group_col: str,
) -> DataFrame:
    """Min-max scale per group into [0, 1] (constant groups scale to 0).
    Adds `scaled` ROUND(6)."""
    st = aggregate_state(df, [group_col], value_col)
    stats = st.select(
        group_col,
        F.col("mn").cast("double").alias("__lo"),
        F.col("mx").cast("double").alias("__hi"),
    )
    v = F.col(value_col).cast("double")
    span = F.col("__hi") - F.col("__lo")
    s = F.when(span > 0, (v - F.col("__lo")) / span).otherwise(F.lit(0.0))
    return (
        df.join(stats, group_col)
        .withColumn("scaled", F.round(s, 6))
        .drop("__lo", "__hi")
    )


def string_index(
    df: DataFrame, col: str, start: int = 0,
    max_window_vocab: int = 65536,
) -> tuple[DataFrame, DataFrame]:
    """Deterministic vocabulary encoding (the StringIndexer shape without
    RNG or fitting state): ids assigned by (frequency DESC, value ASC) —
    the most frequent value gets `start`, ties break lexicographically,
    so the same data always yields the same ids on any engine. Returns
    (df + `<col>_idx` with NULL for NULL values, vocabulary DataFrame
    (value, n, idx)).

    The vocabulary table is O(distinct values). Up to `max_window_vocab`
    distinct values the ranking is one unpartitioned window over that
    table; above it (id-like columns whose "vocabulary" is the corpus)
    ids come from range-repartitioning the vocab on (n DESC, value ASC) —
    globally ordered partitions — plus a bounded per-partition-count
    collect and partition-offset + local row_number (the dedup.py id-map
    pattern), so no single task ever sorts the whole vocabulary. Both
    paths assign IDENTICAL ids."""
    from pyspark.sql import Window

    # checkpoint (eager), not persist: the count/offset collects and
    # every later consumer read the SAME materialized snapshot (no
    # recompute-drift risk for the offset math), and the blocks free with
    # the DataFrame instead of pinning executor storage forever
    counts = _ckpt(
        df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    n_vocab = counts.count()
    if n_vocab <= max_window_vocab:
        vocab = counts.withColumn(
            "idx",
            F.row_number().over(
                Window.partitionBy().orderBy(F.desc("n"), F.asc("value"))
            ).cast("long") + F.lit(int(start) - 1),
        )
    else:
        spark = df.sparkSession
        ranged = _ckpt(
            counts.repartitionByRange(F.desc("n"), F.asc("value"))
            .withColumn("__pid", F.spark_partition_id())
        )
        per_part = {
            r["__pid"]: r["cnt"]
            for r in ranged.groupBy("__pid")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .collect()
        }
        offs, acc = [], 0
        for pid in sorted(per_part):
            offs.append((pid, acc))
            acc += per_part[pid]
        off_df = spark.createDataFrame(offs or [(0, 0)], "__pid int, __off long")
        win = Window.partitionBy("__pid").orderBy(F.desc("n"), F.asc("value"))
        vocab = (
            ranged.join(F.broadcast(off_df), "__pid")
            .withColumn(
                "idx",
                (F.row_number().over(win).cast("long")
                 + F.col("__off") + F.lit(int(start) - 1)),
            )
            .select("value", "n", "idx")
        )
    out = df.join(
        vocab.select(F.col("value").alias(col), F.col("idx").alias(f"{col}_idx")),
        col,
        "left",
    )
    return out, vocab


class EcdfCardinalityError(RuntimeError):
    """Raised when an exact ECDF would materialize a distinct-value table
    above the caller's `max_distinct` budget — the named signal that the
    data is near-continuous at this scale and the caller should switch to
    `percentile_rank_bucketed` (bounded window, bounded join) or pass
    `auto_bucket=True` to let this function switch for them."""


def percentile_rank_by_group(
    df: DataFrame, value_col: str, group_col: str,
    max_distinct: int | None = 50_000_000,
    auto_bucket: bool = False,
    buckets: int = 1000,
) -> DataFrame:
    """Empirical-CDF feature: each row's percentile within its group
    (cume_dist — the fraction of group rows with value <= this row's).

    NOT a per-group window over the raw rows (a group holding an
    sf-proportional slice would sort in one task): aggregate to
    (group, value, count) first, run the cumulative sum over THAT
    distinct-value table — bounded by value cardinality, and exact for
    ties by definition (running count / group total == cume_dist) — and
    join back. Same result, shuffles instead of single-task sorts; the
    residual window is per (group, distinct value), and nulls sort first
    exactly as Spark's cume_dist would. Adds `pct_rank` ROUND(6).

    Residual cost profile (named in BASELINE.md's sf1 adjudication): for
    NEAR-CONTINUOUS values the distinct-value table grows with the data,
    so the per-group running sum grows with it — exact ECDF at 10x data
    measured 6.3x (sub-linear, vs a single full-group task sort before).
    That lever is now EXECUTABLE, not prose: `max_distinct` (default
    50M, ~a few GB of ECDF state) is checked with one
    approx_count_distinct pass before the exact plan runs; above it,
    either EcdfCardinalityError names `percentile_rank_bucketed` as the
    way out, or — with `auto_bucket=True` — this function runs the
    bucketed plan itself (result column stays `pct_rank`; `buckets`
    controls the grid). Pass max_distinct=None to skip the guard pass
    entirely (exact plan, no extra job)."""
    if max_distinct is not None:
        g = F.col(group_col)
        v0 = F.col(value_col).cast("double")
        approx = df.agg(
            F.approx_count_distinct(F.struct(g, v0)).alias("__nd")
        ).first()["__nd"]
        if approx > int(max_distinct):
            if not auto_bucket:
                raise EcdfCardinalityError(
                    f"exact ECDF would rank ~{approx:,} distinct "
                    f"(group, value) pairs (> max_distinct="
                    f"{int(max_distinct):,}) — near-continuous values at "
                    "this scale; use percentile_rank_bucketed (bounded "
                    "window) or pass auto_bucket=True / max_distinct=None"
                )
            return percentile_rank_bucketed(
                df, value_col, group_col, buckets=buckets
            ).withColumnRenamed("pct_rank_bucketed", "pct_rank").drop("bucket")
    v = F.col(value_col).cast("double")
    ranked = _group_ecdf(df, value_col, group_col).select(
        "__g", "__v",
        (F.col("__cum").cast("double") / F.col("__tot").cast("double"))
        .alias("__pr"),
    )
    return (
        df.join(
            ranked,
            F.col(group_col).eqNullSafe(F.col("__g")) & v.eqNullSafe(F.col("__v")),
        )
        .withColumn("pct_rank", F.round("__pr", 6))
        .drop("__g", "__v", "__pr")
    )


def _group_ecdf(df: DataFrame, value_col: str, group_col) -> DataFrame:
    """The shared distinct-value ECDF table behind every exact rank/
    quantile transform here: (__g, __v, __c, __cum, __tot) — one grouped
    aggregate, a running sum over the DISTINCT-value table (bounded by
    value cardinality, never a raw-row window), nulls first like Spark's
    cume_dist. `group_col` may be a column name or a Column expression
    (pass F.lit(0) for an ungrouped ECDF)."""
    from pyspark.sql import Window

    g = F.col(group_col) if isinstance(group_col, str) else group_col
    v = F.col(value_col).cast("double")
    per_val = df.groupBy(
        g.alias("__g"), v.alias("__v")
    ).agg(F.count(F.lit(1)).alias("__c"))
    w = (
        Window.partitionBy("__g")
        .orderBy(F.asc_nulls_first("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy("__g")
    return per_val.select(
        "__g", "__v", "__c",
        F.sum("__c").over(w).alias("__cum"),
        F.sum("__c").over(wt).alias("__tot"),
    )


def quantile_bins(
    df: DataFrame, value_col: str, group_col: str, q: int = 10,
) -> DataFrame:
    """Equal-FREQUENCY binning (the QuantileDiscretizer shape, exact):
    bin = ceil(ECDF(v) * q) clamped into [1, q], computed from the
    distinct-value ECDF table — every bin holds ~1/q of its group's rows
    (exactly, up to ties, which always share a bin). Deterministic and
    engine-portable; the binning join is (group, distinct value)-sized.
    Adds `bin` (int)."""
    from ophidia_server_spark.session import sized_repartition

    # CPU-size the (group, value) shuffle from the input row count: the
    # binning join and the ECDF aggregate both reuse this one exchange,
    # and the sf10 decade measured this query 2x slow purely from the
    # session's fixed width (only ever widens; no-op at bench scale).
    # The value leg carries the SAME cast the ECDF groupBy key uses, so
    # the partitioning satisfies the aggregate's clustering for any
    # numeric value type, not just doubles.
    df = sized_repartition(
        df, F.col(group_col), F.col(value_col).cast("double")
    )
    ecdf = _group_ecdf(df, value_col, group_col)
    binned = ecdf.select(
        "__g", "__v",
        F.least(
            F.lit(int(q)),
            F.greatest(
                F.lit(1),
                F.ceil(
                    F.col("__cum").cast("double")
                    / F.col("__tot").cast("double") * F.lit(int(q))
                ),
            ),
        ).cast("int").alias("bin"),
    )
    v = F.col(value_col).cast("double")
    return df.join(
        binned,
        F.col(group_col).eqNullSafe(F.col("__g")) & v.eqNullSafe(F.col("__v")),
    ).drop("__g", "__v")


def robust_scale_by_group(
    df: DataFrame, value_col: str, group_col: str,
) -> DataFrame:
    """Median/IQR scaling (the RobustScaler shape, outlier-resistant where
    z-scores are not): scaled = (v - median) / (q3 - q1), with the three
    cuts defined as the SMALLEST value whose ECDF reaches 0.5 / 0.25 /
    0.75 — pure INTEGER threshold comparisons on the distinct-value table
    (cum*4 >= tot etc.), so there is no float quantile interpolation to
    disagree on across engines. Zero-IQR groups scale to 0. Adds `median`,
    `iqr`, `robust_scaled` ROUND(6)."""
    ecdf = _group_ecdf(df, value_col, group_col)
    cuts = ecdf.groupBy("__g").agg(
        F.min(F.when(F.col("__cum") * 4 >= F.col("__tot"), F.col("__v")))
        .alias("__q1"),
        F.min(F.when(F.col("__cum") * 2 >= F.col("__tot"), F.col("__v")))
        .alias("__med"),
        F.min(F.when(F.col("__cum") * 4 >= F.col("__tot") * 3, F.col("__v")))
        .alias("__q3"),
    )
    v = F.col(value_col).cast("double")
    iqr = F.col("__q3") - F.col("__q1")
    scaled = F.when(iqr > 0, (v - F.col("__med")) / iqr).otherwise(F.lit(0.0))
    return (
        df.join(cuts, F.col(group_col).eqNullSafe(F.col("__g")))
        .withColumn("median", F.round("__med", 6))
        .withColumn("iqr", F.round(iqr, 6))
        .withColumn("robust_scaled", F.round(scaled, 6))
        .drop("__g", "__q1", "__med", "__q3")
    )


def percentile_rank_bucketed(
    df: DataFrame,
    value_col: str,
    group_col: str,
    buckets: int = 1000,
) -> DataFrame:
    """The 100 TB ECDF path for NEAR-CONTINUOUS values (the lever named in
    percentile_rank_by_group's docstring): quantize each group's value
    range into `buckets` equal-width cells first, then rank CELLS — the
    running-sum window runs over at most `buckets` rows per group no
    matter how many distinct values the data holds. pct_rank_bucketed is
    the exact fraction of group rows in cells <= this row's cell: a
    deterministic, engine-portable coarsening of cume_dist whose error is
    bounded by the widest cell's mass (and which EQUALS cume_dist whenever
    ties only occur within cells). Three bounded aggregates + one
    broadcastable join back; constant groups rank 1.0. Adds `bucket` and
    `pct_rank_bucketed` ROUND(6)."""
    from pyspark.sql import Window

    v = F.col(value_col).cast("double")
    rng = df.groupBy(F.col(group_col).alias("__g")).agg(
        F.min(v).alias("__lo"), F.max(v).alias("__hi"),
        F.count(F.lit(1)).alias("__n"),
    )
    tagged = df.join(
        rng, F.col(group_col).eqNullSafe(F.col("__g"))
    )
    span = F.col("__hi") - F.col("__lo")
    # NULL values take cell -1 (below every real cell — the nulls-first
    # convention of percentile_rank_by_group); F.least would otherwise
    # send them to the TOP cell because least() skips NULL arguments
    cell = (
        F.when(v.isNull(), F.lit(-1))
        .when(
            span > 0,
            F.least(
                F.lit(buckets - 1),
                F.floor((v - F.col("__lo")) / span * buckets),
            ),
        )
        .otherwise(F.lit(0))
    ).cast("long")
    tagged = tagged.withColumn("bucket", cell)
    per_cell = tagged.groupBy("__g", "bucket").agg(
        F.count(F.lit(1)).alias("__c")
    )
    w = (
        Window.partitionBy("__g").orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ranked = per_cell.select(
        "__g", "bucket", F.sum("__c").over(w).alias("__cum")
    )
    return (
        tagged.join(ranked, ["__g", "bucket"])
        .withColumn(
            "pct_rank_bucketed",
            F.round(F.col("__cum").cast("double") / F.col("__n").cast("double"), 6),
        )
        .drop("__g", "__lo", "__hi", "__n", "__cum")
    )


def target_encode(
    df: DataFrame,
    cat_col: str,
    label_col: str,
    smoothing: float = 10.0,
) -> DataFrame:
    """Smoothed target encoding (the classic categorical feature for
    gradient-boosted/linear models): category c maps to

        (sum_c + prior * smoothing) / (n_c + smoothing)

    — the Bayesian-shrunk category mean, pulling rare categories toward
    the global prior so they can't memorize. Sums ride on exact decimals,
    so the encoding is engine-portable; the category table is
    O(vocabulary) and the encode join broadcasts. Adds `te_<cat_col>`
    ROUND(6)."""
    lab = F.col(label_col).cast("decimal(18,2)")
    totals = df.agg(
        F.sum(lab).cast("double").alias("__ts"),
        F.count(label_col).cast("double").alias("__tn"),
    )
    per_cat = df.groupBy(cat_col).agg(
        F.sum(lab).cast("double").alias("__s"),
        F.count(label_col).cast("double").alias("__n"),
    )
    enc = per_cat.join(F.broadcast(totals)).select(
        cat_col,
        (
            (F.col("__s") + (F.col("__ts") / F.col("__tn")) * F.lit(float(smoothing)))
            / (F.col("__n") + F.lit(float(smoothing)))
        ).alias("__te"),
    )
    return df.join(enc, cat_col).withColumn(
        f"te_{cat_col}", F.round("__te", 6)
    ).drop("__te")


def quantile_normalize(
    df: DataFrame, value_col: str, group_col: str,
    max_distinct: int | None = 50_000_000,
    quantize: int | None = None,
) -> DataFrame:
    """Quantile normalization across groups — map every row's value to the
    GLOBAL distribution's value at the same within-group quantile, so all
    groups share one distribution afterwards (the microarray-normalization
    classic, and the cross-source feature aligner: source A's "score 0.8"
    and source B's "score 3.1" both become whatever the pooled corpus has
    at that rank). Exact and deterministic: within-group rank is the
    distinct-value ECDF (cume_dist semantics, ties share a rank), the
    global target position k = ceil(rank * N_global) is computed in
    DECIMAL integer arithmetic (no float near the ceil boundary), and the
    mapped value is the k-th global order statistic. NULLs pass through
    unmapped. Adds `qnorm` (double R6).

    Shape at scale: two bounded distinct-value ECDF tables (group and
    global), one positions table exploded to N rows (the one linear-sized
    intermediate — an equi-join on the integer position instead of a
    range join), and two keyed joins. The GLOBAL running sum is one
    unpartitioned window over the distinct-value table, so the same
    `max_distinct` guard as percentile_rank_by_group runs first (one
    approx_count_distinct pass): above budget, EcdfCardinalityError names
    the way out — and that lever is EXECUTABLE: `quantize=B` snaps every
    value to the midpoint of its cell on a GLOBAL equal-width B-cell grid
    (percentile_rank_bucketed's grid shape) BEFORE the exact machinery
    runs, so every distinct-value table is bounded by B+1 rows no matter
    the data; the result is the exact quantile normalization of the
    coarsened values (error bounded by cell mass, like the bucketed ECDF
    twin). max_distinct=None skips the guard pass."""
    v = F.col(value_col).cast("double")
    if quantize is not None:
        b = int(quantize)
        if b < 1:
            raise ValueError(f"quantize must be >= 1, got {quantize}")
        # NaN-safe range: double max() returns NaN if ANY value is NaN,
        # which would silently dead-end the lever into the exact path —
        # whose guard then tells the caller to pass the quantize= they
        # already passed. NaNs keep their NaN rep below (one extra
        # distinct value; the exact path already orders NaN last).
        finite = ~F.isnan(v) & v.isNotNull()
        rng = df.filter(finite).agg(
            F.min(v).alias("__lo"), F.max(v).alias("__hi")
        ).first()
        lo, hi = rng["__lo"], rng["__hi"]
        span = (hi - lo) if (lo is not None and hi is not None) else 0.0
        if span and span > 0:
            cell = F.least(F.lit(b - 1), F.floor((v - F.lit(lo)) / F.lit(span) * b))
            rep = F.round(
                F.lit(lo) + (cell.cast("double") + F.lit(0.5)) * F.lit(span) / F.lit(b),
                6,
            )
            qdf = df.withColumn(
                "__qv", F.when(v.isNull(), F.lit(None)).otherwise(rep)
            )
            out = quantile_normalize(
                qdf, "__qv", group_col, max_distinct=None
            )
            return out.drop("__qv")
        # degenerate range (all-equal, all-null, or all-NaN): exact path
        # is bounded by construction
    nn = df.filter(v.isNotNull())
    if max_distinct is not None:
        approx = nn.agg(
            F.approx_count_distinct(v).alias("__nd")
        ).first()["__nd"]
        if approx > int(max_distinct):
            raise EcdfCardinalityError(
                f"quantile_normalize would run a single-task global "
                f"running sum over ~{approx:,} distinct values (> "
                f"max_distinct={int(max_distinct):,}) — near-continuous "
                "at this scale; pass quantize= (the bounded global-grid "
                "coarsening, percentile_rank_bucketed's shape) or "
                "max_distinct=None"
            )
    # The global ECDF derives from the per-(group, value) count table
    # instead of re-scanning the raw rows (round-13 opt, guide §2.4): sum
    # of per-group counts == the global per-value count, row-for-row what
    # _group_ecdf(nn, ..., F.lit(0)) computed with a second O(rows) scan
    # + aggregate (the doubled scan in
    # plans/r13/events_quantile_normalize_before.txt; raw scans 4 -> 1).
    # `pv` is deliberately NOT checkpointed: an eager materialization
    # barrier measured slower than letting the 2-3 consumer branches
    # recompute the aggregate concurrently (A/B at sf0.1, min-of-6:
    # no-ckpt 2.40 s / ckpt 2.83 s — guide §1 re-measure).
    from pyspark.sql import Window

    gcol = F.col(group_col) if isinstance(group_col, str) else group_col
    pv = (
        nn.groupBy(gcol.alias("__g"), v.alias("__v"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    w_g = (
        Window.partitionBy("__g")
        .orderBy(F.asc_nulls_first("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt_g = Window.partitionBy("__g")
    src = pv.select(
        "__g", "__v",
        F.sum("__c").over(w_g).cast("decimal(38,0)").alias("__cs"),
        F.sum("__c").over(wt_g).cast("decimal(38,0)").alias("__ts"),
    )
    gpv = pv.groupBy("__v").agg(F.sum("__c").alias("__c")).select(
        F.lit(0).alias("__g"), "__v", "__c"
    )
    glob = gpv.select(
        "__g", "__v", "__c",
        F.sum("__c").over(w_g).alias("__cum"),
        F.sum("__c").over(wt_g).alias("__tot"),
    ).select(F.col("__v").alias("__gv"), "__c", "__cum", "__tot")
    # k-th order statistic lookup table: global value at positions
    # (cum - c + 1) .. cum — N rows, one integer-keyed equi-join
    pos = glob.select(
        "__gv",
        F.explode(
            F.sequence(
                (F.col("__cum") - F.col("__c") + 1).cast("long"),
                F.col("__cum").cast("long"),
            )
        ).alias("__k"),
    )
    n_glob = glob.agg(F.max("__tot").cast("decimal(38,0)").alias("__n"))
    # k = ceil(cum * N / tot) in EXACT integer arithmetic: subtract the
    # remainder first so the final decimal division is exact — a plain
    # floor(a/b) on decimals rounds the quotient to scale 6 before
    # flooring, which can cross an integer boundary once tot > 2e6
    num = F.col("__cs") * F.col("__n") + F.col("__ts") - 1
    k = ((num - F.pmod(num, F.col("__ts"))) / F.col("__ts")).cast("long")
    mapped = (
        src.crossJoin(F.broadcast(n_glob))
        .select("__g", "__v", k.alias("__k"))
        .join(pos, "__k")
        .select(
            "__g", "__v", F.round(F.col("__gv").cast("double"), 6).alias("qnorm")
        )
    )
    return (
        df.join(
            mapped,
            F.col(group_col).eqNullSafe(F.col("__g")) & v.eqNullSafe(F.col("__v")),
            "left",
        )
        .drop("__g", "__v")
    )
