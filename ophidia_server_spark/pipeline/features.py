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
) -> tuple[DataFrame, DataFrame]:
    """Deterministic vocabulary encoding (the StringIndexer shape without
    RNG or fitting state): ids assigned by (frequency DESC, value ASC) —
    the most frequent value gets `start`, ties break lexicographically,
    so the same data always yields the same ids on any engine. Returns
    (df + `<col>_idx` with NULL for NULL values, vocabulary DataFrame
    (value, n, idx)). The vocabulary table is O(distinct values); its
    ranking window runs over THAT table only."""
    from pyspark.sql import Window

    vocab = (
        df.filter(F.col(col).isNotNull())
        .groupBy(F.col(col).alias("value"))
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn(
            "idx",
            F.row_number().over(
                Window.partitionBy().orderBy(F.desc("n"), F.asc("value"))
            ).cast("long") + F.lit(int(start) - 1),
        )
    )
    out = df.join(
        vocab.select(F.col("value").alias(col), F.col("idx").alias(f"{col}_idx")),
        col,
        "left",
    )
    return out, vocab


def percentile_rank_by_group(
    df: DataFrame, value_col: str, group_col: str,
) -> DataFrame:
    """Empirical-CDF feature: each row's percentile within its group
    (cume_dist — the fraction of group rows with value <= this row's).
    One group-partitioned window; ties share a rank by definition. Adds
    `pct_rank` ROUND(6)."""
    from pyspark.sql import Window

    w = Window.partitionBy(group_col).orderBy(F.col(value_col).cast("double"))
    return df.withColumn("pct_rank", F.round(F.cume_dist().over(w), 6))


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
