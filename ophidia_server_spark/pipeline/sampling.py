"""Deterministic sampling / splitting / corpus-mixing operators.

The selection primitive everywhere is a content-addressed coin flip:

    keep(key)  ⟺  substr(md5(key || ':' || salt), 1, 8) < hex_threshold(frac)

md5 produces identical lowercase hex in Spark and DuckDB, and hex strings
over [0-9a-f] order lexicographically exactly like their numeric value — so
every operator here is an exact DuckDB-oracle query, needs no RNG state, is
reproducible across engines/runs/cluster sizes, and re-samples stably when
documents are added (a doc's fate depends only on its key and the salt).

Scale shape: pure map-stage filters (one md5 per row, no shuffle, no
collect), so Catalyst fuses them into the scan's codegen span and the same
plan holds at 100 TB. Changing the mix = changing literal thresholds.

Reference parity note: the reference server has no sampling operators —
these extend the surface for LLM training-data pipelines (corpus mixing and
held-out splits), per the project's extension mandate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_HEX_SPAN = 16 ** 8  # first 8 md5 hex chars = 32 uniform bits


def _threshold_hex(frac: float) -> str:
    """Zero-padded 8-char lowercase hex threshold for a fraction in [0, 1].
    frac >= 1 returns 'g', which sorts above every hex string — keep-all
    without a boundary case at 'ffffffff'."""
    if not 0.0 <= frac <= 1.0:
        raise ValueError(f"fraction must be in [0, 1], got {frac}")
    if frac >= 1.0:
        return "g"
    return format(int(frac * _HEX_SPAN), "08x")


def _coin(key: Column, salt: str) -> Column:
    """The 8-hex-char uniform draw for a key column (the shared
    functions/hashing.py primitive — one home for the cross-engine md5
    contract)."""
    from ophidia_server_spark.functions.hashing import coin_hex8

    return coin_hex8(key, salt)


def hash_sample(
    df: DataFrame, frac: float, key_col: str = "doc_id", salt: str = ""
) -> DataFrame:
    """Deterministic Bernoulli sample: keeps ~frac of rows, decided purely by
    md5(key, salt). Unlike df.sample(), membership is stable across runs,
    engines, and partitionings — the property a training pipeline needs so a
    re-run reproduces the same corpus."""
    if frac >= 1.0:
        return df
    if frac <= 0.0:
        return df.filter(F.lit(False))
    return df.filter(_coin(F.col(key_col), salt) < _threshold_hex(frac))


def split_column(
    key: Column, val_frac: float, test_frac: float, salt: str = "split"
) -> Column:
    """'train' / 'val' / 'test' assignment from one draw: the unit interval is
    carved [0, val) -> val, [val, val+test) -> test, rest -> train."""
    if val_frac < 0 or test_frac < 0 or val_frac + test_frac > 1.0:
        raise ValueError("need val_frac, test_frac >= 0 and val+test <= 1")
    h = _coin(key, salt)
    return (
        F.when(h < F.lit(_threshold_hex(val_frac)), F.lit("val"))
        .when(h < F.lit(_threshold_hex(val_frac + test_frac)), F.lit("test"))
        .otherwise(F.lit("train"))
    )


def train_val_test_split(
    df: DataFrame,
    val_frac: float = 0.1,
    test_frac: float = 0.1,
    key_col: str = "doc_id",
    salt: str = "split",
) -> DataFrame:
    """Tag every row with a deterministic, disjoint 'split' column. One draw
    per row decides all three buckets, so the split is exhaustive and
    membership never migrates between buckets when fractions change only at
    the carved boundaries."""
    return df.withColumn(
        "split", split_column(F.col(key_col), val_frac, test_frac, salt)
    )


def stratified_sample(
    df: DataFrame,
    fracs: dict[str, float],
    strata_col: str = "source",
    key_col: str = "doc_id",
    default_frac: float = 0.0,
    salt: str = "mix",
) -> DataFrame:
    """Corpus mixing: keep a per-stratum fraction of rows (e.g. upweight
    curated sources, downsample web crawl). fracs maps stratum value ->
    fraction; strata not listed get default_frac. One md5 per row, threshold
    chosen by a literal CASE on the stratum — no shuffle, no per-stratum
    scans."""
    thr = F.lit(_threshold_hex(default_frac))
    for value, frac in sorted(fracs.items()):
        thr = F.when(F.col(strata_col) == value, F.lit(_threshold_hex(frac))).otherwise(thr)
    return df.filter(_coin(F.col(key_col), salt) < thr)


def mix_report(
    df: DataFrame, mixed: DataFrame, strata_col: str = "source"
) -> DataFrame:
    """Per-stratum before/after counts and achieved rate for a mixing pass —
    the audit table a pipeline logs next to the mixed corpus."""
    before = df.groupBy(strata_col).agg(F.count("*").alias("n_before"))
    after = mixed.groupBy(strata_col).agg(F.count("*").alias("n_after"))
    return (
        before.join(after, strata_col, "left")
        .select(
            strata_col,
            "n_before",
            F.coalesce("n_after", F.lit(0)).cast("long").alias("n_after"),
            F.round(
                F.coalesce("n_after", F.lit(0)) / F.col("n_before"), 4
            ).alias("achieved_rate"),
        )
    )


def fixed_k_sample(
    df: DataFrame, k: int, key_col: str = "doc_id", salt: str = "resv"
) -> DataFrame:
    """Deterministic fixed-size sample ("reservoir" semantics without the
    sequential state): rank every row by its content-addressed coin and keep
    the k smallest. Equivalent in distribution to reservoir sampling over
    any arrival order, but stable across runs/engines/partitionings and
    fully parallel — TakeOrdered keeps k per partition then merges k on the
    driver, so the cost is O(rows) scan + O(k) memory regardless of corpus
    size (the property a 100 TB "give me exactly k docs" needs)."""
    if k <= 0:
        return df.filter(F.lit(False))
    coin = _coin(F.col(key_col), salt)
    return (
        df.withColumn("__coin", coin)
        .orderBy("__coin", key_col)
        .limit(k)
        .drop("__coin")
    )


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    key_col: str = "doc_id",
    salt: str = "wsample",
    cap: float = 1.0,
) -> DataFrame:
    """Importance sampling: keep each row with probability weight/cap
    (weights above `cap` always keep) — how pipelines upsample high-quality
    documents using a per-row score (e.g. quality_logistic's probability)
    instead of one flat rate per stratum.

    The coin is the same content-addressed md5 draw as hash_sample, compared
    numerically against weight/cap * 2^32 (the first 8 hex chars as an
    integer), so membership is deterministic, engine-portable, and
    monotone in the weight: raising a doc's score can only add it to the
    sample, never evict others. Pure map-stage filter, zero shuffle."""
    if cap <= 0:
        raise ValueError(f"cap must be positive, got {cap}")
    from ophidia_server_spark.functions.hashing import hex8_long

    coin32 = hex8_long(F.col(key_col), salt)
    p = F.least(F.col(weight_col).cast("double") / cap, F.lit(1.0))
    return df.filter(coin32 < p * _HEX_SPAN)


def group_fixed_k_sample(
    df: DataFrame, k: int, group_col: str, key_col: str = "doc_id",
    salt: str = "gresv",
) -> DataFrame:
    """Per-group fixed-k sample: every group keeps its k coin-smallest rows
    — the quota sampler of a balanced corpus mix (equal documents per
    source / language / k-means cluster regardless of how skewed the
    group sizes are; pair with clustering.kmeans_lloyd's `cluster` column
    for cluster-balanced training mixes).

    Same content-addressed md5 coin as fixed_k_sample, ranked inside each
    group by row_number over (coin, key): deterministic, engine-portable,
    stable across partitionings. One shuffle (the window's partition by
    group); with bounded k the per-task heap stays tiny, so group skew
    costs sort time, not memory."""
    from pyspark.sql import Window

    if k <= 0:
        return df.filter(F.lit(False))
    w = Window.partitionBy(group_col).orderBy("__coin", key_col)
    return (
        df.withColumn("__coin", _coin(F.col(key_col), salt))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .drop("__coin", "__rn")
    )


def temperature_quotas(
    df: DataFrame, total: int, alpha: float = 0.5, group_col: str = "source",
) -> DataFrame:
    """Per-group document quotas for a temperature-flattened corpus mix
    (the multilingual-sampling rule of mBERT/XLM-R/UniMax, all public):
    group g with n_g documents gets

        quota_g = min( n_g,  floor( total * n_g^alpha / sum_h n_h^alpha ) )

    alpha=1 keeps natural proportions, alpha=0 is uniform across groups,
    and the usual 0.2-0.7 range up-samples tail groups without letting any
    head group dominate. Deterministic floor rounding means the quotas sum
    to <= total (never over-draw).

    One grouped count collapses the corpus to a groups-sized table; the
    share normalization is a window over THAT table only — never over the
    data. Returns (group, n_rows, quota)."""
    counts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    from pyspark.sql import Window

    denom = F.sum(F.pow(F.col("n_rows").cast("double"), F.lit(float(alpha)))).over(
        Window.partitionBy()
    )
    share = F.pow(F.col("n_rows").cast("double"), F.lit(float(alpha))) / denom
    # ROUND before FLOOR: the share denominator is a float sum whose
    # summation order varies by engine/partitioning; rounding to 6 decimals
    # keeps floor() from flipping on a last-ulp difference at an integer
    # boundary, so quotas are reproducible everywhere
    return counts.select(
        F.col("grp").alias(group_col),
        "n_rows",
        F.least(
            F.col("n_rows"),
            F.floor(F.round(F.lit(int(total)) * share, 6)).cast("long"),
        ).alias("quota"),
    )


def temperature_sample(
    df: DataFrame,
    total: int,
    alpha: float = 0.5,
    group_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "temp",
) -> DataFrame:
    """Materialize the temperature mix: each group keeps its quota_g
    coin-smallest rows (same deterministic rank as group_fixed_k_sample,
    but with a PER-GROUP k carried in by a join against the quotas table).
    The quotas side is groups-sized — bounded by the label vocabulary, not
    the data — so AQE broadcasts it; the window is the one data-sized
    shuffle."""
    from pyspark.sql import Window

    quotas = temperature_quotas(df, total, alpha, group_col)
    w = Window.partitionBy(group_col).orderBy("__coin", key_col)
    return (
        df.join(quotas.select(group_col, "quota"), group_col)
        .withColumn("__coin", _coin(F.col(key_col), salt))
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= F.col("quota"))
        .drop("__coin", "__rn", "quota")
    )


def interleave_groups(
    df: DataFrame,
    group_col: str = "source",
    key_col: str = "doc_id",
    salt: str = "ilv",
) -> DataFrame:
    """Deterministic round-robin training order across groups: adds
    `train_pos` such that ranking by it visits groups in rotation
    (g0 r1, g1 r1, ..., gN r1, g0 r2, ...) — the interleaving a training
    run wants so consecutive batches never come from one source, computed
    WITHOUT a global shuffle of the data:

        train_pos = (rank_within_group - 1) * n_groups + group_index

    rank_within_group orders by the md5 coin (stable, content-addressed);
    group_index is the group's rank in lexicographic group order. Groups
    that exhaust early leave gaps in train_pos — harmless, since the
    loader orders by train_pos, it never requires density. One window per
    group (the only data-sized shuffle) + a groups-sized join AQE
    broadcasts."""
    from pyspark.sql import Window

    groups = (
        df.select(F.col(group_col).alias("grp"))
        .distinct()
        .withColumn(
            "__gidx",
            F.row_number().over(Window.partitionBy().orderBy("grp")) - 1,
        )
    )
    n_groups = groups.groupBy().agg(F.count(F.lit(1)).alias("__ng"))
    w = Window.partitionBy(group_col).orderBy("__coin", key_col)
    return (
        df.join(
            groups.select(F.col("grp").alias(group_col), "__gidx"), group_col
        )
        .join(F.broadcast(n_groups))
        .withColumn("__coin", _coin(F.col(key_col), salt))
        .withColumn("__rn", F.row_number().over(w))
        .withColumn(
            "train_pos",
            ((F.col("__rn") - 1) * F.col("__ng") + F.col("__gidx")).cast("long"),
        )
        .drop("__coin", "__rn", "__gidx", "__ng")
    )


def neyman_allocation(
    df: DataFrame, stratum_col: str, value_col: str, total_n: int,
) -> DataFrame:
    """Neyman-optimal stratified sample allocation (the public survey-
    sampling formula: n_h proportional to N_h * sigma_h, which minimizes
    the variance of the stratified mean at fixed budget): per stratum,
    population count, exact population standard deviation (decimal
    sums), and the integer allocation via largest-remainder rounding
    (floor the shares, hand the leftover to the largest fractional
    parts, ties to the smaller stratum). Degenerate corpora where every
    sigma is 0 fall back to proportional allocation. One stratum-keyed
    aggregate + two windows over the STRATA table (bounded by stratum
    cardinality). Returns (stratum, n_pop, sigma R6, n_alloc)."""
    from pyspark.sql import Window

    if total_n < 0:
        raise ValueError(f"total_n must be >= 0, got {total_n}")
    x = F.col(value_col).cast("decimal(18,2)")
    per = df.groupBy(F.col(stratum_col).alias("stratum")).agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum(x).cast("double").alias("__s"),
        F.sum(x * x).cast("double").alias("__s2"),
    )
    var = F.greatest(
        F.col("__s2") / F.col("__n")
        - (F.col("__s") / F.col("__n")) * (F.col("__s") / F.col("__n")),
        F.lit(0.0),
    )
    w = per.select(
        "stratum", "__n", F.sqrt(var).alias("__sig")
    ).withColumn("__w", F.col("__n") * F.col("__sig"))
    tot = Window.partitionBy()
    share = F.when(
        F.sum("__w").over(tot) > 0, F.col("__w") / F.sum("__w").over(tot)
    ).otherwise(F.col("__n") / F.sum("__n").over(tot))
    exact = share * F.lit(float(total_n))
    based = w.select(
        "stratum", "__n", "__sig",
        F.floor(exact).cast("long").alias("__base"),
        (exact - F.floor(exact)).alias("__frac"),
    )
    rem = F.lit(int(total_n)) - F.sum("__base").over(tot)
    rk = F.row_number().over(Window.orderBy(F.desc("__frac"), F.col("stratum")))
    return based.select(
        "stratum",
        F.col("__n").cast("long").alias("n_pop"),
        F.round("__sig", 6).alias("sigma"),
        (F.col("__base") + (rk <= rem).cast("long")).cast("long")
        .alias("n_alloc"),
    )


def weighted_reservoir_topk(
    df: DataFrame,
    weight_col: str,
    k: int,
    key_col: str = "doc_id",
    salt: str = "reservoir",
) -> DataFrame:
    """Weighted sampling WITHOUT replacement, exact size k — the
    Efraimidis-Spirakis A-ES scheme (Inf. Process. Lett. 97(5), 2006):
    every row draws u ~ U(0,1] from its content-addressed md5 coin and
    starts an exponential clock -ln(u)/w; the k SMALLEST clocks form an
    exact-size weighted sample without replacement (P(row first) =
    w_i / sum w). Complements `weighted_sample` (per-row Bernoulli,
    random size) when a pipeline needs exactly k quality-weighted
    documents.

    Deterministic and engine-portable: the coin is (hex8+1)/2^32 so
    u is never 0, the emitted clock is ROUND(6) and the selection ranks
    the ROUNDED clock with the id as tie-break (rank what you emit —
    near-ulp engine drift cannot reorder the boundary). Rows with
    weight <= 0 can never win (clock = +inf semantics; they are filtered
    out before ranking).

    Shape at scale: pure map to compute clocks, then a global
    TakeOrdered-style top-k (orderBy + limit k) — no full sort, no
    single-partition window; the k-row rank assignment runs on the
    selected rows only. Returns the winning rows + `clock` R6 +
    `sample_rank` (1-based)."""
    from pyspark.sql import Window

    from ophidia_server_spark.functions.hashing import hex8_long

    if k < 1:
        raise ValueError(f"k must be >= 1, got {k}")
    w = F.col(weight_col).cast("double")
    u = (hex8_long(F.col(key_col), salt) + F.lit(1)).cast("double") / F.lit(
        float(1 << 32)
    )
    clock = F.round(-F.log(u) / w, 6)
    picked = (
        df.filter(w > 0)
        .withColumn("clock", clock)
        .orderBy(F.asc("clock"), F.asc(key_col))
        .limit(int(k))
    )
    rk = Window.orderBy(F.asc("clock"), F.asc(key_col))
    return picked.withColumn(
        "sample_rank", F.row_number().over(rk).cast("long")
    )


def token_budget_select(
    df: DataFrame,
    budget_tokens: int,
    source_col: str = "source",
    tokens_col: str = "n_tokens",
    quality_col: str | None = None,
    key_col: str = "doc_id",
) -> DataFrame:
    """Greedy per-source selection under a TOKEN budget — the data-mixing
    primitive behind "x billion tokens of source S, best first": within
    each source, documents rank by (quality desc, id) and are kept while
    the running token total stays within `budget_tokens`; the first
    overflow document is also kept when the budget is not yet exhausted
    (standard knapsack-greedy closure, so every source reaches >= its
    budget unless it runs out of documents). Without a quality column the
    ranking is id order (reproducible corpus order). Adds `cum_tokens`
    and `selected` (0/1); callers filter on selected.

    Shape at scale: ONE per-source window (rank + running sum). A source
    IS an sf-proportional partition, so this window grows with the data —
    the same trade as the exact ECDF family, and the same escape hatch
    applies: at true 100 TB, pre-aggregate to (source, quality-bucket)
    grain, pick the budget-crossing bucket from the bounded cumulative
    table, and run this exact selection only inside the boundary bucket.
    The greedy-closure semantics here are the contract either path must
    reproduce."""
    from pyspark.sql import Window

    if budget_tokens < 0:
        raise ValueError(f"budget_tokens must be >= 0, got {budget_tokens}")
    order = (
        [F.desc(quality_col)] if quality_col else []
    ) + [F.asc(key_col)]
    w = (
        Window.partitionBy(source_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(F.col(tokens_col).cast("long")).over(w)
    out = df.withColumn("cum_tokens", cum)
    prev = F.col("cum_tokens") - F.col(tokens_col).cast("long")
    return out.withColumn(
        "selected",
        (prev < F.lit(int(budget_tokens))).cast("long"),
    )
