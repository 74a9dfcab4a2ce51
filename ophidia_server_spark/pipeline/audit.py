"""Declarative data-quality audit: evaluate a rule list over a table in ONE
aggregate pass and report per-rule violation counts — the
expectations/contract check a pipeline runs before (and after) every
transform stage, next to mix_report's distribution audit.

Rules are (name, kind, params) tuples compiled to JVM boolean expressions;
the whole audit is a single map + one scalar aggregate per rule batch (no
shuffle beyond the final one-row combine), so auditing 100 TB costs one
scan. `unique` rules are the exception — uniqueness is a global property,
so each one adds a distinct-count aggregate (still one shuffle, keyed on
the audited column).

Reference parity note: the reference has no data-quality operators — this
extends the surface for LLM training-data pipelines per the project's
extension mandate (same status as pipeline/sampling.py).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _rule_violation(kind: str, params: dict) -> Column:
    """Boolean column: True where the row VIOLATES the rule."""
    col = F.col(params["col"])
    if kind == "not_null":
        return col.isNull()
    if kind == "in_range":
        lo, hi = params.get("lo"), params.get("hi")
        bad = F.lit(False)
        if lo is not None:
            bad = bad | (col < lo)
        if hi is not None:
            bad = bad | (col > hi)
        return col.isNotNull() & bad
    if kind == "in_set":
        return col.isNotNull() & ~col.isin(*params["values"])
    if kind == "matches":
        return col.isNotNull() & ~col.rlike(params["pattern"])
    if kind == "min_length":
        return col.isNotNull() & (F.length(col) < int(params["n"]))
    raise ValueError(f"unknown audit rule kind: {kind}")


def corpus_audit(
    df: DataFrame, rules: list[tuple[str, str, dict]],
    max_violation_frac: float = 0.0,
) -> DataFrame:
    """Evaluate every rule and return one row per rule:
    (rule, kind, n_rows, n_violations, violation_frac, passed) — `passed`
    compares the fraction against `max_violation_frac` (0 = strict).

    Row-local rules fold into ONE aggregate over one scan regardless of the
    rule count; each `unique` rule adds one count/countDistinct pair on its
    column. The single aggregate row is collected driver-side (it is one
    row by construction) and the report emitted as a literal DataFrame —
    an earlier per-rule union of selects over the lazy aggregate re-ran
    the source scan once per rule, because column pruning specialized each
    branch and defeated exchange reuse. The result is rule-count rows —
    the audit table a pipeline writes next to its output."""
    if not rules:
        raise ValueError("corpus_audit needs at least one rule")
    names = [r[0] for r in rules]
    if len(set(names)) != len(names):
        raise ValueError("rule names must be unique")
    row_aggs, uniq_rules = [], []
    for name, kind, params in rules:
        if kind == "unique":
            uniq_rules.append((name, params))
        else:
            row_aggs.append(
                F.sum(_rule_violation(kind, params).cast("long")).alias(f"__v_{name}")
            )
    for name, params in uniq_rules:
        c = params["col"]
        row_aggs.append(
            (F.count(c) - F.countDistinct(c)).cast("long").alias(f"__v_{name}")
        )
    base = df.agg(F.count("*").alias("__n"), *row_aggs).first()
    n = int(base["__n"])
    rows = []
    for name, kind, _params in rules:
        v = int(base[f"__v_{name}"] or 0)
        frac = round(v / max(n, 1), 6)
        rows.append((name, kind, n, v, frac, int(frac <= max_violation_frac)))
    return df.sparkSession.createDataFrame(
        rows,
        "rule string, kind string, n_rows long, n_violations long, "
        "violation_frac double, passed int",
    )


def profile_table(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """Column-profile report — the data-sheet/debugging table every corpus
    release ships (one row per column): row count, null count + fraction,
    EXACT distinct count, lexicographic min/max (values cast to string so
    one report covers mixed types), and the MODE (most frequent value,
    ties to the smaller string) with its count.

    Cost: one multi-distinct aggregate pass for the counts (Spark expands
    k distinct aggregates into a k-way scan — at 100 TB swap in
    approx_count_distinct per the docstring's scale note if exact distinct
    is not worth k shuffles) plus one groupBy per column for the mode,
    each keyed on that column. Deterministic and engine-portable."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        aggs += [
            F.count(c).alias(f"__nn_{c}"),
            F.countDistinct(c).alias(f"__nd_{c}"),
            F.min(F.col(c).cast("string")).alias(f"__mn_{c}"),
            F.max(F.col(c).cast("string")).alias(f"__mx_{c}"),
        ]
    base = df.agg(*aggs)
    modes = None
    for c in cols:
        m = (
            df.filter(F.col(c).isNotNull())
            .groupBy(F.col(c).cast("string").alias("__v"))
            .agg(F.count(F.lit(1)).alias("__c"))
            .orderBy(F.desc("__c"), F.asc("__v"))
            .limit(1)
            .select(
                F.lit(c).alias("column"),
                F.col("__v").alias("mode_value"),
                F.col("__c").cast("long").alias("mode_count"),
            )
        )
        modes = m if modes is None else modes.unionByName(m)
    per_col = None
    for c in cols:
        row = base.select(
            F.lit(c).alias("column"),
            F.col("__n").cast("long").alias("n_rows"),
            (F.col("__n") - F.col(f"__nn_{c}")).cast("long").alias("n_nulls"),
            F.round(
                (F.col("__n") - F.col(f"__nn_{c}")).cast("double")
                / F.greatest(F.col("__n"), F.lit(1)).cast("double"), 6
            ).alias("null_frac"),
            F.col(f"__nd_{c}").cast("long").alias("n_distinct"),
            F.col(f"__mn_{c}").alias("min_str"),
            F.col(f"__mx_{c}").alias("max_str"),
        )
        per_col = row if per_col is None else per_col.unionByName(row)
    return per_col.join(modes, "column", "left")


def fk_integrity(
    fact: DataFrame, dim: DataFrame, fk: str, pk: str,
) -> DataFrame:
    """Referential-integrity audit between a fact table's foreign key and
    a dimension's primary key — the join-health check a pipeline runs
    before trusting any enrichment join: one row with fact/dim sizes,
    orphan fact rows (fk with no dim match; NULL fks counted separately),
    and unused dim rows. ONE fact-side pass (left join + aggregate —
    never four separate count() rescans of the fact source) plus one
    dim-side aggregate, combined in-plan; the result stays a lazy
    one-row DataFrame with nothing collected."""
    fkc = fact.select(F.col(fk).alias("__fk"))
    pkc = dim.select(F.col(pk).alias("__fk")).distinct()
    hit = pkc.withColumn("__hit", F.lit(1))
    fact_agg = (
        fkc.join(hit, "__fk", "left")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_fact"),
            F.sum(F.col("__fk").isNull().cast("long"))
            .cast("long").alias("n_null_fk"),
            F.sum(
                (F.col("__fk").isNotNull() & F.col("__hit").isNull())
                .cast("long")
            ).cast("long").alias("n_orphans"),
        )
    )
    used = fkc.filter(F.col("__fk").isNotNull()).distinct().withColumn(
        "__used", F.lit(1)
    )
    dim_agg = pkc.join(used, "__fk", "left").agg(
        F.count(F.lit(1)).cast("long").alias("n_dim"),
        F.sum(F.col("__used").isNull().cast("long"))
        .cast("long").alias("n_unused_dim"),
    )
    return fact_agg.crossJoin(F.broadcast(dim_agg)).select(
        "n_fact", "n_null_fk", "n_orphans",
        F.round(
            F.col("n_orphans")
            / F.greatest(F.col("n_fact") - F.col("n_null_fk"), F.lit(1)), 6
        ).alias("orphan_frac"),
        "n_dim", "n_unused_dim",
    )


def source_scorecard(df: DataFrame, source_col: str = "source") -> DataFrame:
    """Per-source corpus scorecard — the one-table answer to "which feed
    is hurting the training mix": document count, mean quality score,
    exact-duplicate share (md5(text) groups), encoding-damage share, and
    mean token count, per source, in ONE lazy plan. Quality scores are
    averaged through 1e-6-quantized integer sums so partitioning cannot
    perturb a bit; the other figures are integer-derived.

    Shape at scale: the explicit price of REUSING the verified
    quality/artifact primitives is three scans of the corpus and two
    doc-keyed joins (Catalyst does not fuse self-joins into one scan);
    the dup check is one md5-keyed count joined back and the rollup one
    source-keyed aggregate. Inlining the expressions would save the
    rescans at the cost of duplicating verified logic."""
    from ophidia_server_spark.pipeline.text import encoding_artifacts, quality_score

    q = quality_score(df).select("doc_id", "n_tokens", "quality")
    e = encoding_artifacts(df).select("doc_id", "suspect")
    dup = (
        df.groupBy(F.md5("text").alias("__h"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    flagged = df.select(
        "doc_id", F.col(source_col).alias("source"), F.md5("text").alias("__h")
    ).join(dup, "__h")
    joined = flagged.join(q, "doc_id").join(e, "doc_id")
    return joined.groupBy("source").agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        (
            F.sum(F.round(F.col("quality") * 1e6).cast("long"))
            .cast("double")
            / (F.count(F.lit(1)) * 1e6)
        ).alias("__aq"),
        F.sum((F.col("__c") > 1).cast("long")).cast("long").alias("__nd"),
        F.sum("suspect").cast("long").alias("__ns"),
        F.sum("n_tokens").cast("long").alias("__nt"),
    ).select(
        "source", "n_docs",
        F.round("__aq", 6).alias("avg_quality"),
        F.round(F.col("__nd") / F.col("n_docs"), 6).alias("dup_frac"),
        F.round(F.col("__ns") / F.col("n_docs"), 6).alias("suspect_frac"),
        F.round(F.col("__nt") / F.col("n_docs"), 6).alias("avg_tokens"),
    )


def fulfillment_lag(
    fact: DataFrame,
    dim: DataFrame,
    fact_key: str,
    dim_key: str,
    start_col: str,
    end_col: str,
    group_expr: Column,
    sla_days: int = 90,
) -> DataFrame:
    """Order-to-ship SLA report: per group (e.g. order month), the exact
    integer day lag between an order's placement and each line's ship
    date — mean, max, and the share breaching `sla_days` — the
    supply-chain health table. Integer datediffs make every figure
    exact; one fact-dim equi-join + one grouped aggregate. Returns
    (group, n_lines, mean_lag_days R6, max_lag_days, sla_breach_frac
    R6)."""
    j = fact.join(dim, fact[fact_key] == dim[dim_key])
    lag = F.datediff(F.col(end_col), F.col(start_col))
    return (
        j.select(group_expr.alias("grp"), lag.alias("__l"))
        .groupBy("grp")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_lines"),
            F.round(
                F.sum("__l") / F.greatest(F.count(F.lit(1)), F.lit(1)), 6
            ).alias("mean_lag_days"),
            F.max("__l").cast("long").alias("max_lag_days"),
            F.round(
                F.sum((F.col("__l") > sla_days).cast("long"))
                / F.greatest(F.count(F.lit(1)), F.lit(1)), 6
            ).alias("sla_breach_frac"),
        )
    )


def price_volume_mix(
    df: DataFrame,
    key_col: str,
    period_col: str,
    qty_col: str,
    revenue_col: str,
) -> DataFrame:
    """Price-volume-mix decomposition (the standard FP&A bridge between
    two periods): per key, with p = revenue/qty and periods 0 -> 1,

        delta_revenue = (q1 - q0) * p0   (volume effect)
                      + (p1 - p0) * q1   (price effect)
                      + residual

    where the residual is 0 whenever prices are well-defined (every
    period with revenue has positive quantity) and otherwise absorbs
    what the decomposition cannot attribute — e.g. a zero-quantity
    period carrying contra-revenue (returns/credits), where no price
    exists to split the delta. The three effect columns therefore ALWAYS
    sum to rev1 - rev0. Keys present in only one period contribute a
    pure volume effect. All sums are exact decimals; prices divide once
    in double. Returns (key, rev0 R2, rev1 R2, volume_effect R6,
    price_effect R6, residual R6, delta R2). One keyed aggregate + one
    pivot — nothing beyond the key grain."""
    per = df.groupBy(
        F.col(key_col).alias("key"), F.col(period_col).alias("__p")
    ).agg(
        F.sum(F.col(qty_col).cast("decimal(18,2)")).alias("__q"),
        F.sum(F.col(revenue_col).cast("decimal(18,2)")).alias("__r"),
    )

    def side(p: int, col: str):
        return F.min(F.when(F.col("__p") == p, F.col(col)))

    piv = per.groupBy("key").agg(
        F.coalesce(side(0, "__q"), F.lit(0)).cast("double").alias("q0"),
        F.coalesce(side(0, "__r"), F.lit(0)).cast("double").alias("r0"),
        F.coalesce(side(1, "__q"), F.lit(0)).cast("double").alias("q1"),
        F.coalesce(side(1, "__r"), F.lit(0)).cast("double").alias("r1"),
    )
    p0 = F.when(F.col("q0") > 0, F.col("r0") / F.col("q0")).otherwise(
        F.when(F.col("q1") > 0, F.col("r1") / F.col("q1")).otherwise(F.lit(0.0))
    )
    p1 = F.when(F.col("q1") > 0, F.col("r1") / F.col("q1")).otherwise(p0)
    vol = (F.col("q1") - F.col("q0")) * p0
    price = (p1 - p0) * F.col("q1")
    resid = (F.col("r1") - F.col("r0")) - vol - price
    return piv.select(
        "key",
        F.round("r0", 2).alias("rev0"),
        F.round("r1", 2).alias("rev1"),
        F.round(vol, 6).alias("volume_effect"),
        F.round(price, 6).alias("price_effect"),
        # + 0.0 canonicalizes IEEE -0.0 (DuckDB's ROUND emits it; Spark's
        # does not — a one-character hash mismatch otherwise)
        (F.round(resid, 6) + F.lit(0.0)).alias("residual"),
        F.round(F.col("r1") - F.col("r0"), 2).alias("delta"),
    )


def source_overlap(
    df: DataFrame, source_col: str = "source", text_col: str = "text",
) -> DataFrame:
    """Cross-source duplicate overlap matrix — the mirror-site /
    re-crawl detector: for every source pair, how many distinct exact
    texts (md5) both sources carry. One (hash, source) distinct, one
    hash-keyed self-join (fan-in bounded by sources-per-text), one
    pair rollup. Returns (source_a, source_b, n_shared_texts) for
    a < b."""
    hs = df.select(
        F.md5(F.col(text_col)).alias("__h"),
        F.col(source_col).alias("__s"),
    ).distinct()
    a = hs.select("__h", F.col("__s").alias("source_a"))
    b = hs.select("__h", F.col("__s").alias("source_b"))
    return (
        a.join(b, "__h")
        .filter(F.col("source_a") < F.col("source_b"))
        .groupBy("source_a", "source_b")
        .agg(F.countDistinct("__h").cast("long").alias("n_shared_texts"))
    )


def fd_check(df: DataFrame, det_col: str, dep_col: str) -> DataFrame:
    """Functional-dependency audit (does `det_col` determine `dep_col`?)
    — the schema-discovery / key-sanity check run before trusting a
    column as a join key or a dimension attribute. One determinant-keyed
    exact-distinct aggregate; returns one row (n_keys, n_violating,
    max_dep_per_key, holds)."""
    per = df.groupBy(F.col(det_col).alias("__k")).agg(
        F.countDistinct(F.col(dep_col)).alias("__d")
    )
    return per.agg(
        F.count(F.lit(1)).cast("long").alias("n_keys"),
        F.sum((F.col("__d") > 1).cast("long")).cast("long")
        .alias("n_violating"),
        F.max("__d").cast("long").alias("max_dep_per_key"),
        (F.max("__d") <= 1).cast("int").alias("holds"),
    )


def rate_spikes(
    df: DataFrame,
    ts_col: str = "ts",
    bucket_minutes: int = 1,
    z_threshold: float = 3.0,
) -> DataFrame:
    """Volume-anomaly detection on an event stream: bucket events into
    fixed windows, z-score each bucket's count against the WHOLE series'
    exact-decimal mean/variance, flag |z| >= threshold — the ops-page
    'traffic spike' alarm. One grouped count + one scalar-moment
    aggregate + a pure map; counts are integers so the moments are exact
    and the z-scores engine-portable. Returns (bucket_start, n_events,
    zscore ROUND(6), is_spike)."""
    secs = int(bucket_minutes) * 60
    b = (F.unix_timestamp(F.col(ts_col)) / secs).cast("long") * secs
    counts = df.groupBy(b.alias("__b")).agg(
        F.count(F.lit(1)).cast("long").alias("n_events")
    )
    mom = counts.agg(
        F.count(F.lit(1)).cast("double").alias("__k"),
        F.sum("n_events").cast("double").alias("__s"),
        F.sum(F.col("n_events") * F.col("n_events")).cast("double").alias("__s2"),
    )
    mean = F.col("__s") / F.col("__k")
    var = F.greatest(
        F.col("__s2") / F.col("__k") - mean * mean, F.lit(0.0)
    )
    z = F.when(
        var > 0, (F.col("n_events").cast("double") - mean) / F.sqrt(var)
    ).otherwise(F.lit(0.0))
    return (
        counts.crossJoin(F.broadcast(mom))
        .select(
            F.col("__b").alias("bucket_start"),
            "n_events",
            F.round(z, 6).alias("zscore"),
            (F.abs(z) >= F.lit(float(z_threshold))).cast("int").alias("is_spike"),
        )
    )


def _poisson1_cdf_literals() -> list:
    """Cumulative Poisson(1) CDF thresholds P(W <= k), k = 0..6 — shared
    double literals for the bootstrap weight lookup on both engines."""
    import math as _m

    cum, out, fact = 0.0, [], 1.0
    for k in range(7):
        if k > 0:
            fact *= k
        cum += _m.exp(-1.0) / fact
        out.append(cum)
    return out


def poisson_bootstrap_ci(
    df: DataFrame,
    value_col: str,
    id_col: str,
    b: int = 64,
    salt: str = "boot",
) -> DataFrame:
    """Distributed bootstrap confidence interval for the mean via the
    POISSON bootstrap (the public single-pass formulation used for
    resampling at scale: multinomial resample weights are approximated
    by iid Poisson(1) per (row, replicate), so no replicate ever needs a
    global sample): every row contributes a content-addressed Poisson
    weight to each of `b` replicates, replicate means use exact-decimal
    sums, and the CI is the empirical [rank floor(a/2*b)+1, rank
    b-floor(a/2*b)] band of the b means at a = 0.05. Deterministic end
    to end: the weight is an inverse-CDF lookup of the md5 coin against
    shared double literals.

    Shape at scale: one explode by b (map-side), ONE b-row groupBy with
    map-side partials, then ranking over the b-row table. The input is
    fanned out to the session's default parallelism when it arrives in
    fewer partitions (a single parquet file would otherwise serialize
    the b-fold explode on one core — measured 18s -> 2s at sf0.1); at
    real scale the input already has enough splits and the guard is a
    no-op. Returns one row (n_rows, mean, ci_lo, ci_hi,
    n_replicates)."""
    from ophidia_server_spark.functions.skew import ensure_min_partitions

    # The fan-out guard applies to the REPS branch only (round-13 opt,
    # guide §2.4): it exists to parallelize the b-fold explode + per-row
    # md5 work, but applied to `df` itself it also forced a RoundRobin
    # shuffle of the whole input under the base count/mean aggregate —
    # Exchange (2) in plans/r13/events_bootstrap_ci_before.txt — which
    # partial aggregation never needed.
    fanned = ensure_min_partitions(df)
    # hex-string thresholds (the house md5-coin convention: compare the
    # first 8 md5 chars against format(int(frac * 16**8), '08x') — no
    # float division anywhere near the boundary)
    hexes = [format(int(c * 16 ** 8), "08x") for c in _poisson1_cdf_literals()]
    rep = F.explode(F.sequence(F.lit(0), F.lit(int(b) - 1))).alias("__r")
    h = F.substring(
        F.md5(
            F.concat(
                F.col(id_col).cast("string"),
                F.lit(":"),
                F.col("__r").cast("string"),
                F.lit(":" + salt),
            )
        ),
        1, 8,
    )
    # Materialize the coin ONCE per (row, replicate) in its own projection
    # (round-13 opt, guide §2.3): inlined, the md5+substring appeared 16x
    # per row in the weight Project (8 nested WHEN conditions x the __wx
    # and __w copies) and codegen's subexpression elimination does not
    # reach into conditional branches. CollapseProject keeps the split
    # because the producer expression is non-cheap and multiply-referenced;
    # the weight CASE chain then compares the __h COLUMN against the same
    # literals — identical values, one hash per coin.
    w = F.lit(7)
    for k in range(6, -1, -1):
        w = F.when(F.col("__h") < F.lit(hexes[k]), F.lit(k)).otherwise(w)
    x = F.col(value_col).cast("decimal(18,2)")
    reps = (
        fanned.select(F.col(id_col), x.alias("__x"), rep)
        .select(F.col("__r"), F.col("__x"), h.alias("__h"))
        .select("__r", (w * F.col("__x")).alias("__wx"), w.alias("__w"))
        .groupBy("__r")
        .agg(
            F.sum("__wx").alias("__swx"),
            F.sum("__w").cast("double").alias("__sw"),
        )
        .select(
            F.when(
                F.col("__sw") > 0,
                F.col("__swx").cast("double") / F.col("__sw"),
            ).otherwise(F.lit(0.0)).alias("__m")
        )
    )
    rk = F.row_number().over(Window.orderBy("__m"))
    lo_rank = int(0.025 * b) + 1
    hi_rank = b - int(0.025 * b)
    ranked = reps.select("__m", rk.alias("__rk"))
    base = df.agg(
        F.count(F.lit(1)).cast("long").alias("n_rows"),
        F.round(
            F.sum(x).cast("double")
            / F.greatest(F.count(F.lit(1)), F.lit(1)).cast("double"), 6
        ).alias("mean"),
    )
    band = ranked.agg(
        F.round(
            F.min(F.when(F.col("__rk") == lo_rank, F.col("__m"))), 6
        ).alias("ci_lo"),
        F.round(
            F.min(F.when(F.col("__rk") == hi_rank, F.col("__m"))), 6
        ).alias("ci_hi"),
    )
    return base.crossJoin(F.broadcast(band)).select(
        "n_rows", "mean", "ci_lo", "ci_hi",
        F.lit(int(b)).cast("long").alias("n_replicates"),
    )


def abc_classification(
    df: DataFrame, key_col: str, value_col: str,
    a_cut: float = 0.8, b_cut: float = 0.95,
) -> DataFrame:
    """ABC / Pareto analysis: keys ranked by their exact-decimal value
    share, classed A while the cumulative share (INCLUDING the key) is
    <= a_cut, B up to b_cut, C above — the 80/20 inventory & revenue
    concentration report. Ties in value break by key, so the ranking is
    total. Returns (key, total ROUND(2), share R6, cum_share R6, class).

    Shape at scale: one key aggregate (map-side partials), then one
    global window over the KEY AGGREGATES — bounded by distinct-key
    cardinality, never raw rows; the cumulative sum is an exact decimal
    so the class boundary can never drift with partitioning."""
    per = df.groupBy(F.col(key_col).alias("key")).agg(
        F.sum(F.col(value_col).cast("decimal(18,2)")).alias("__v")
    )
    w = Window.orderBy(F.desc("__v"), F.col("key")).rowsBetween(
        Window.unboundedPreceding, 0
    )
    tot = Window.partitionBy()
    cum = F.sum("__v").over(w).cast("double") / F.sum("__v").over(tot).cast(
        "double"
    )
    share = F.col("__v").cast("double") / F.sum("__v").over(tot).cast("double")
    cls = (
        F.when(cum <= a_cut, "A").when(cum <= b_cut, "B").otherwise("C")
    )
    return per.select(
        "key",
        F.round(F.col("__v").cast("double"), 2).alias("total"),
        F.round(share, 6).alias("share"),
        F.round(cum, 6).alias("cum_share"),
        cls.alias("abc_class"),
    )


def gini_coefficient(df: DataFrame, key_col: str, value_col: str) -> DataFrame:
    """Gini concentration index of a value across keys (revenue/usage
    inequality — the whale-dependence audit): with per-key totals x
    sorted ascending (ties by key) and 1-based rank i,
    G = (2 * sum(i * x_i) / (n * sum(x)) - (n + 1) / n). Exact-decimal
    sums feed one fixed double expression, so the figure is
    engine-portable. One key aggregate + one window over key aggregates
    + a scalar rollup; returns one row (n_keys, total R2, gini R6)."""
    per = df.groupBy(F.col(key_col).alias("key")).agg(
        # re-narrow to (18,2): keeps rank * value inside DECIMAL(38,x)
        # exactly in BOTH engines (DuckDB errors when p1+p2 > 38)
        F.sum(F.col(value_col).cast("decimal(18,2)"))
        .cast("decimal(18,2)").alias("__v")
    )
    i = F.row_number().over(Window.orderBy(F.col("__v"), F.col("key")))
    ranked = per.select("__v", i.alias("__i"))
    agg = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        F.sum("__v").cast("double").alias("__s"),
        F.sum(F.col("__i") * F.col("__v")).cast("double").alias("__is"),
    )
    g = (
        2.0 * F.col("__is") / (F.col("__n") * F.col("__s"))
        - (F.col("__n") + 1.0) / F.col("__n")
    )
    return agg.select(
        F.col("__n").cast("long").alias("n_keys"),
        F.round("__s", 2).alias("total"),
        F.round(g, 6).alias("gini"),
    )


def benford_digits(df: DataFrame, col: str) -> DataFrame:
    """Benford's-law audit of a positive measure: the distribution of
    first significant digits vs the expected log10(1 + 1/d), plus the
    chi-square statistic — the classic fabricated-data / corrupted-feed
    detector for financial and metering columns.

    The first digit is extracted through a DECIMAL(18,2)->string cast and
    a [^1-9] strip (never float log10, whose power-of-ten boundaries can
    disagree across engines); expected fractions are injected as Python
    double literals; and the chi-square sum is accumulated in exact
    integer micro-units (round(term * 1e6) summed as BIGINT) so the
    cross-row addition order cannot perturb the double. One grouped count
    + one 9-row rollup — a pure aggregate pass."""
    s = F.regexp_replace(
        F.col(col).cast("decimal(18,2)").cast("string"), "[^1-9]", ""
    )
    d = F.substring(s, 1, 1)
    observed = (
        df.select(d.alias("digit"))
        .filter(F.col("digit") != "")
        .groupBy("digit")
        .agg(F.count(F.lit(1)).cast("long").alias("__o"))
    )
    # ALWAYS report all nine digits: an ABSENT digit contributes its full
    # (0 - N*e_d)^2 / (N*e_d) chi-square term — dropping it understates
    # the statistic exactly when the data is most anomalous
    all_digits = df.sparkSession.createDataFrame(
        [(str(dig),) for dig in range(1, 10)], "digit string"
    )
    counts = all_digits.join(observed, "digit", "left").select(
        "digit", F.coalesce("__o", F.lit(0)).cast("long").alias("n")
    )
    expected = F.lit(None).cast("double")
    for dig in range(9, 0, -1):
        expected = F.when(
            F.col("digit") == str(dig), F.lit(float(math.log10(1 + 1 / dig)))
        ).otherwise(expected)
    with_exp = counts.select(
        "digit", "n", expected.alias("__e"),
        F.sum("n").over(Window.partitionBy()).cast("double").alias("__N"),
    )
    term = F.when(
        F.col("__N") > 0,
        (F.col("n").cast("double") - F.col("__N") * F.col("__e")) ** 2
        / (F.col("__N") * F.col("__e")),
    ).otherwise(F.lit(0.0))
    chi2 = (
        F.sum(F.round(term * 1e6).cast("long")).over(Window.partitionBy())
        / 1e6
    )
    return with_exp.select(
        "digit",
        "n",
        F.round(
            F.col("n") / F.greatest(F.col("__N"), F.lit(1.0)), 6
        ).alias("frac"),
        F.round("__e", 6).alias("expected_frac"),
        F.round(chi2, 6).alias("chi2"),
    )


def ks_two_sample(
    df_ref: DataFrame,
    df_new: DataFrame,
    value_col: str,
) -> DataFrame:
    """EXACT two-sample Kolmogorov-Smirnov statistic between a reference
    batch and a new batch over a numeric column — the distribution-drift
    test that needs no binning choices (the PSI's non-parametric sibling;
    public formula):

        D = max over observed v of |ECDF_ref(v) - ECDF_new(v)|

    computed on the UNION of both samples' distinct values: per-value
    counts for each side (one grouped aggregate), running sums over the
    distinct-value table, max of the absolute difference. Exact because
    the supremum of two step functions is attained at a step. Returns ONE
    row: (ks_stat ROUND(6), n_ref, n_new). ECDF fractions are single
    divisions of exact integers — engine-portable.

    Scale shape: one union + one grouped count, a running sum over the
    distinct-value table (bounded by value cardinality), one max. For
    near-continuous 100 TB columns, quantize first, as with any exact
    ECDF (see features.percentile_rank_bucketed)."""
    from pyspark.sql import Window

    v = F.col(value_col).cast("double")
    both = df_ref.select(v.alias("__v"), F.lit(1).alias("__ref")).unionByName(
        df_new.select(v.alias("__v"), F.lit(0).alias("__ref"))
    )
    per_val = both.groupBy("__v").agg(
        F.sum("__ref").cast("long").alias("__ca"),
        F.sum(F.lit(1) - F.col("__ref")).cast("long").alias("__cb"),
    )
    w = (
        Window.partitionBy().orderBy(F.asc_nulls_first("__v"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wt = Window.partitionBy()
    d = per_val.select(
        (
            F.abs(
                F.sum("__ca").over(w).cast("double")
                / F.sum("__ca").over(wt).cast("double")
                - F.sum("__cb").over(w).cast("double")
                / F.sum("__cb").over(wt).cast("double")
            )
        ).alias("__d"),
        F.sum("__ca").over(wt).alias("__na"),
        F.sum("__cb").over(wt).alias("__nb"),
    )
    return d.agg(
        F.round(F.max("__d"), 6).alias("ks_stat"),
        F.max("__na").alias("n_ref"),
        F.max("__nb").alias("n_new"),
    )


def drift_report(
    df_ref: DataFrame,
    df_new: DataFrame,
    value_col: str,
    n_buckets: int = 10,
    eps: float = 1e-6,
) -> DataFrame:
    """Population Stability Index between a reference batch and a new batch
    over a numeric column — the standard production drift alarm (banking
    scorecard lineage, public formula):

        PSI = sum_b (p_new[b] - p_ref[b]) * ln(p_new[b] / p_ref[b])

    over equal-width buckets fixed by the REFERENCE min/max (out-of-range
    new values clamp into the edge buckets, so a shifted distribution
    shows up instead of disappearing); rates are eps-smoothed so empty
    buckets stay finite. < 0.1 reads stable, 0.1-0.25 moderate, > 0.25
    action. Returns one row per bucket (ref_rate, new_rate, contribution)
    plus the total in `psi` on every row — a <= n_buckets-row table.

    Scale shape: one aggregate over EACH batch (min/max on the reference,
    then two map-side-combined bucket counts) and an n_buckets-row join —
    nothing data-sized ever shuffles beyond the two grouped counts."""
    stats = df_ref.agg(
        F.min(F.col(value_col).cast("double")).alias("lo"),
        F.max(F.col(value_col).cast("double")).alias("hi"),
    ).first()
    lo, hi = stats["lo"], stats["hi"]
    if lo is None:
        raise ValueError("drift_report: reference batch has no values")
    span = (hi - lo) or 1.0

    def bucket_of(df):
        b = F.floor(
            (F.col(value_col).cast("double") - F.lit(lo)) / F.lit(span)
            * n_buckets
        )
        b = F.least(F.lit(n_buckets - 1), F.greatest(F.lit(0), b))
        return df.filter(F.col(value_col).isNotNull()).select(
            b.cast("int").alias("bucket")
        )

    def rates(df, name):
        # total = window sum over the <= n_buckets count rows — no second
        # scan of the batch for the denominator
        from pyspark.sql import Window

        counts = bucket_of(df).groupBy("bucket").agg(
            F.count(F.lit(1)).alias("__c")
        )
        total = F.sum("__c").over(Window.partitionBy())
        return counts.select(
            "bucket",
            (F.col("__c").cast("double") / total.cast("double")).alias(name),
        )

    spark = df_ref.sparkSession
    base = spark.range(n_buckets).select(F.col("id").cast("int").alias("bucket"))
    joined = (
        base.join(rates(df_ref, "ref_rate"), "bucket", "left")
        .join(rates(df_new, "new_rate"), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("ref_rate", F.lit(0.0)).alias("ref_rate"),
            F.coalesce("new_rate", F.lit(0.0)).alias("new_rate"),
        )
    )
    p = F.col("ref_rate") + F.lit(eps)
    q = F.col("new_rate") + F.lit(eps)
    contrib = (q - p) * F.log(q / p)
    per = joined.select(
        "bucket",
        F.round("ref_rate", 6).alias("ref_rate"),
        F.round("new_rate", 6).alias("new_rate"),
        F.round(contrib, 6).alias("contribution"),
    )
    total = joined.agg(F.round(F.sum(contrib), 6).alias("psi"))
    return per.join(F.broadcast(total))


def k_anonymity(
    df: DataFrame, quasi_cols: list[str], k: int = 5,
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier set — the re-identification
    risk check a dataset must pass before release (Sweeney 2002): every
    row whose quasi-identifier combination is shared by fewer than k rows
    is individually distinguishable. Returns one row per equivalence
    class: the quasi columns, `n` (class size, bigint) and `at_risk`
    (1 when n < k). The released-data policy decision (suppress /
    generalize / drop) stays with the caller; this is the measurement.

    Shape at scale: ONE grouped aggregate keyed on the quasi columns —
    the class table is bounded by quasi-combination cardinality, never
    raw rows; no window, no join."""
    if not quasi_cols:
        raise ValueError("need at least one quasi-identifier column")
    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n")
    ).withColumn(
        "at_risk", (F.col("n") < k).cast("long")
    )


def l_diversity(
    df: DataFrame, quasi_cols: list[str], sensitive_col: str, l: int = 2,
) -> DataFrame:
    """l-diversity audit (Machanavajjhala et al. 2007) — k-anonymity's
    necessary complement: a class can be large (k-anonymous) yet leak the
    sensitive attribute completely when every member shares one value
    (the homogeneity attack). Reports, per quasi-identifier equivalence
    class, the class size, the number of DISTINCT sensitive values, and
    `at_risk` (1 when distinct sensitive values < l). NULL sensitive
    values count as a value of their own (knowing "it is missing" is
    itself a disclosure).

    Shape at scale: one exact distinct-aggregate keyed on the quasi
    columns — the class table is bounded by quasi-combination
    cardinality; no window, no join."""
    if not quasi_cols:
        raise ValueError("need at least one quasi-identifier column")
    if l < 2:
        raise ValueError(f"l must be >= 2, got {l}")
    # NULL counts as its own value WITHOUT a string sentinel (a sentinel
    # would collide with a genuine value equal to it): exact distinct over
    # the non-NULLs, plus 1 when the class contains any NULL
    s = F.col(sensitive_col)
    return df.groupBy(*quasi_cols).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (
            F.countDistinct(s)
            + F.max(s.isNull().cast("long"))
        ).cast("long").alias("n_sensitive"),
    ).withColumn("at_risk", (F.col("n_sensitive") < l).cast("long"))
