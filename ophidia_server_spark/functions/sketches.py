"""Deterministic, engine-portable sketches.

Spark's built-in approx_count_distinct / approx_percentile are the production
sketches (exposed as gate queries events_user_approx_distinct /
lineitem_approx_quantiles), but their register hashing is engine-internal —
the oracle can only check them rows-only. This module implements the SAME
HyperLogLog mechanics over a content-addressed md5 hash, so Spark and DuckDB
compute bit-identical registers and the gate can hash-match the whole
sketch + estimate. That also demonstrates the property that makes sketches
the 100 TB answer for distinct-counting: registers are tiny (m counters),
built with one map + one m-row aggregate, and MERGEABLE — per-partition /
per-day sketches max-combine into the global sketch with no re-scan.

Mechanics (standard HLL, Flajolet et al. 2007): register index = first
p bits of the hash; rho = leading-zero count of the next 64 bits + 1;
estimate = alpha_m * m^2 / sum(2^-M_j) with the linear-counting small-range
correction. The leading-zero count is computed with string ops on the hex
digest (a run of '0' digits + a CASE on the first non-zero digit) because
both engines agree exactly on strings, while float log2 tricks can differ
in the last ulp.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _rho(tail: Column) -> Column:
    """Leading-zero bits of a 16-hex-char (64-bit) string, + 1."""
    zrun = F.length(F.regexp_extract(tail, "^(0*)", 1))
    first = tail.substr(zrun + 1, F.lit(1))
    extra = (
        F.when(first == "1", 3)
        .when(first.isin("2", "3"), 2)
        .when(first.isin("4", "5", "6", "7"), 1)
        .otherwise(0)
    )
    return F.when(zrun == 16, F.lit(65)).otherwise(4 * zrun + extra + 1)


def _register_exprs(key_col: str, p: int, salt: str) -> tuple[Column, Column]:
    """(register index, rho) expressions for one key column."""
    if p % 4 != 0 or not 4 <= p <= 16:
        raise ValueError(f"p must be a multiple of 4 in [4, 16], got {p}")
    from ophidia_server_spark.functions.hashing import md5_of

    hex_digits = p // 4
    h = md5_of(F.col(key_col), salt)
    reg = F.conv(F.substring(h, 1, hex_digits), 16, 10).cast("long")
    tail = F.substring(h, hex_digits + 1, 16)
    return reg, _rho(tail)


def hll_registers(
    df: DataFrame, key_col: str, p: int = 8, salt: str = "hll"
) -> DataFrame:
    """The m = 2^p HLL registers for a key column: (reg, rho) with
    rho = max over keys hashing to the register. One map stage + one
    m-row hash aggregate (map-side partials shrink each partition's
    contribution to m rows before the shuffle — the sketch property)."""
    reg, rho = _register_exprs(key_col, p, salt)
    return (
        df.select(reg.alias("reg"), rho.alias("__r"))
        .groupBy("reg")
        .agg(F.max("__r").cast("long").alias("rho"))
    )


def hll_registers_by(
    df: DataFrame, key_col: str, split_col: Column, p: int = 8,
    salt: str = "hll",
) -> DataFrame:
    """Per-split register tables in ONE aggregate: (split, reg, rho). The
    grouped form of hll_registers — how a 100 TB job sketches every
    partition/day in a single pass (m rows of state per split), ready to
    hll_merge into coarser periods with no re-scan."""
    reg, rho = _register_exprs(key_col, p, salt)
    return (
        df.select(split_col.alias("split"), reg.alias("reg"), rho.alias("__r"))
        .groupBy("split", "reg")
        .agg(F.max("__r").cast("long").alias("rho"))
    )


def hll_estimate(registers: DataFrame, p: int = 8) -> DataFrame:
    """Estimate from a (reg, rho) table: alpha_m * m^2 / sum(2^-M_j) over
    ALL m registers (absent ones count rho = 0), with the linear-counting
    correction below 2.5m. Returns one row (m, n_zero_regs, estimate)."""
    m = 1 << p
    # Flajolet et al. 2007 give exact bias constants for the small register
    # counts; the 0.7213/(1+1.079/m) form is the asymptote for m >= 128.
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1.0 + 1.079 / m))
    spark = registers.sparkSession
    full = (
        spark.range(m)
        .select(F.col("id").alias("reg"))
        .join(registers, "reg", "left")
        .select(F.coalesce("rho", F.lit(0)).alias("rho"))
    )
    agg = full.agg(
        F.sum(F.pow(F.lit(2.0), -F.col("rho"))).alias("__denom"),
        F.sum((F.col("rho") == 0).cast("long")).alias("n_zero_regs"),
    )
    raw = F.lit(alpha * m * m) / F.col("__denom")
    v = F.col("n_zero_regs")
    est = F.when(
        (raw <= 2.5 * m) & (v > 0), F.lit(float(m)) * F.log(F.lit(float(m)) / v)
    ).otherwise(raw)
    return agg.select(
        F.lit(m).cast("long").alias("m"),
        v.cast("long").alias("n_zero_regs"),
        F.round(est, 4).alias("estimate"),
    )


def hll_merge(*register_tables: DataFrame) -> DataFrame:
    """Union per-shard/per-period register tables and max-combine — the
    mergeability that lets 1000 executors (or 365 daily jobs) sketch
    independently and combine in m rows of work."""
    out = register_tables[0]
    for t in register_tables[1:]:
        out = out.unionByName(t)
    return out.groupBy("reg").agg(F.max("rho").cast("long").alias("rho"))


def hll_distinct_report(
    df: DataFrame, key_col: str, split_col: Column | None = None,
    p: int = 8, salt: str = "hll",
) -> DataFrame:
    """One-row sketch report: the global HLL estimate, the estimate from
    merging per-`split_col` sketches (equal registers by construction —
    emitted to exercise the real merge path), the exact distinct count,
    and the relative error. The exact count is affordable at gate scale;
    at 100 TB only the sketch paths run."""
    global_regs = hll_registers(df, key_col, p=p, salt=salt)
    est = hll_estimate(global_regs, p=p)
    if split_col is not None:
        # per-split sketches in one grouped aggregate, max-combined back to
        # the global register table — all lazy, no driver-side split list
        parts = hll_registers_by(df, key_col, split_col, p=p, salt=salt)
        merged = parts.groupBy("reg").agg(F.max("rho").cast("long").alias("rho"))
        merged_est = hll_estimate(merged, p=p).select(
            F.col("estimate").alias("est_merged")
        )
    else:
        merged_est = est.select(F.col("estimate").alias("est_merged"))
    exact = df.agg(F.countDistinct(key_col).cast("long").alias("n_exact"))
    return (
        est.join(F.broadcast(exact))
        .join(F.broadcast(merged_est))
        .select(
            "m",
            "n_zero_regs",
            "estimate",
            "est_merged",
            "n_exact",
            F.round(
                F.abs(F.col("estimate") - F.col("n_exact"))
                / F.greatest(F.col("n_exact"), F.lit(1)),
                4,
            ).alias("rel_err"),
        )
    )


# ---------------------------------------------------------------------------
# Count-min sketch: deterministic heavy-hitter / frequency estimation
# ---------------------------------------------------------------------------


def _cms_bucket(key_col: str, row: int, w: int, salt: str) -> Column:
    from ophidia_server_spark.functions.hashing import md5_bucket

    return md5_bucket(F.col(key_col), w, f"{salt}{row}")


def cms_sketch(
    df: DataFrame, key_col: str, d: int = 4, w: int = 1024, salt: str = "cms"
) -> DataFrame:
    """Count-min sketch (Cormode/Muthukrishnan 2005) over a key column:
    d salted md5 hash rows x w counters, returned as (row, bucket, c) —
    at most d*w rows regardless of input size. Same deterministic-hash
    contract as the HLL module, so the whole sketch is DuckDB-oracle-exact;
    sketches MERGE by (row, bucket) counter addition (sum, vs HLL's max),
    so per-shard/per-day tables combine with no re-scan. One explode to
    d rows per input + one hash aggregate with map-side partials."""
    if d < 1 or w < 1:
        raise ValueError(f"need d >= 1 and w >= 1, got d={d}, w={w}")
    buckets = F.array(*[_cms_bucket(key_col, r, w, salt) for r in range(d)])
    return (
        df.select(F.posexplode(buckets).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count("*").cast("long").alias("c"))
    )


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Counter-wise addition of count-min sketches (the CMS merge law)."""
    out = sketches[0]
    for t in sketches[1:]:
        out = out.unionByName(t)
    return out.groupBy("row", "bucket").agg(F.sum("c").cast("long").alias("c"))


def cms_point_estimates(
    sketch: DataFrame, keys: list, d: int = 4, w: int = 1024, salt: str = "cms"
) -> DataFrame:
    """Point frequency estimates for literal probe keys: min over the d
    rows of each key's counter (the CMS guarantee: never an undercount;
    overcount bounded by collisions ~ n/w per row). The probe table is
    d*len(keys) literal rows joined against the d*w-row sketch — both tiny,
    so the whole probe broadcasts regardless of corpus size."""
    import hashlib

    spark = sketch.sparkSession
    probe = spark.createDataFrame(
        [
            (
                str(k),
                r,
                int(hashlib.md5(f"{k}:{salt}{r}".encode()).hexdigest()[:8], 16) % w,
            )
            for k in keys
            for r in range(d)
        ],
        "key string, row int, bucket long",
    )
    return (
        F.broadcast(probe)
        .join(sketch, ["row", "bucket"], "left")
        .groupBy("key")
        .agg(F.min(F.coalesce("c", F.lit(0))).cast("long").alias("est"))
    )


# ---------------------------------------------------------------------------
# DDSketch: deterministic relative-error quantile estimation
# ---------------------------------------------------------------------------


def dds_sketch(
    df: DataFrame, value_col: str, alpha: float = 0.01
) -> DataFrame:
    """DDSketch (Masson et al., VLDB 2019) over a positive value column:
    log-spaced buckets bucket = ceil(ln(x)/ln(gamma)) with
    gamma = (1+alpha)/(1-alpha), so any quantile read back from the bucket
    table has RELATIVE error <= alpha. No hashing at all — the bucket is a
    pure function of the value — so the sketch is deterministic, merges by
    counter addition, and holds O(log(max/min)/alpha) rows regardless of
    input size (the third classic sketch family next to HLL and count-min:
    distinct-count / frequency / quantiles). Zeros count in their own
    sentinel bucket (-(2^62)); a NEGATIVE value raises a named error at
    execution (F.log of a negative is silently NULL in Spark, which would
    otherwise smuggle a poisoned NULL bucket into the cumulative walk and
    skew every quantile)."""
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    import math

    gamma = (1 + alpha) / (1 - alpha)
    x = F.col(value_col).cast("double")
    bucket = (
        F.when(x == 0, F.lit(-(2**62)))
        .when(
            x < 0,
            F.raise_error(
                F.concat(
                    F.lit("dds_sketch requires non-negative values, got "),
                    x.cast("string"),
                )
            ).cast("long"),
        )
        .otherwise(F.ceil(F.log(x) / math.log(gamma)))
    )
    return (
        df.select(bucket.cast("long").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count("*").cast("long").alias("c"))
    )


def dds_merge(*sketches: DataFrame) -> DataFrame:
    """Counter-wise addition of DDSketches (same merge law as count-min)."""
    out = sketches[0]
    for t in sketches[1:]:
        out = out.unionByName(t)
    return out.groupBy("bucket").agg(F.sum("c").cast("long").alias("c"))


def dds_quantiles(
    sketch: DataFrame, qs: list[float], alpha: float = 0.01
) -> DataFrame:
    """Quantile estimates from a DDSketch bucket table: for each q, find
    the first bucket whose cumulative count reaches ceil(q * n) (rank
    semantics — engine-portable, no interpolation ambiguity) and return
    the bucket's midpoint value 2*gamma^b/(gamma+1), which is within
    alpha of every value the bucket holds.

    ONE plan, ONE pass over the sketch for every requested quantile: the
    cumulative walk and the total both come from windows over the bucket
    table, the q list rides in as an exploded literal array (no join at
    all), and each q's answer is the MIN qualifying bucket — an earlier
    per-q union re-ran the whole upstream sketch (and its source scan)
    once per quantile."""
    import math

    from pyspark.sql import Window

    gamma = (1 + alpha) / (1 - alpha)
    w = Window.orderBy("bucket").rowsBetween(Window.unboundedPreceding, 0)
    total = Window.partitionBy()  # one global frame over the tiny table
    # windows FIRST, explode in a separate projection: mixing both in one
    # select puts the Generate node under the Window, so the cumulative
    # sums would triple-count over the exploded rows
    cum = sketch.select(
        "bucket",
        F.sum("c").over(w).alias("__cum"),
        F.sum("c").over(total).alias("__n"),
    ).select(
        "bucket", "__cum", "__n",
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
    )
    rank = F.ceil(F.col("q") * F.col("__n"))
    best = (
        cum.filter(F.col("__cum") >= F.greatest(rank, F.lit(1)))
        .groupBy("q")
        .agg(F.min("bucket").alias("__b"))
    )
    return best.select(
        "q",
        F.when(F.col("__b") == -(2**62), F.lit(0.0))
        .otherwise(
            F.round(2.0 * F.pow(F.lit(gamma), F.col("__b")) / (gamma + 1), 6)
        )
        .alias("est"),
    )


# ---------------------------------------------------------------------------
# Bloom filter: deterministic, mergeable set membership
# ---------------------------------------------------------------------------
#
# The fourth member of the sketch family (Bloom 1970, "Space/time trade-offs
# in hash coding with allowable errors"): an m-bit array with k hash
# positions per key. Same engine-portable convention as the HLL above —
# position j of a key is 8 hex chars of md5(key + ':' + salt + '#' + j)
# mod m, so Spark and DuckDB compute bit-identical filters and the gate can
# hash-match the whole bit table AND every membership verdict. The 100 TB
# properties it demonstrates:
#   build  — one map (k position exprs) + one distinct aggregate whose
#            output is <= m rows (map-side partials collapse each partition
#            to set bits before the shuffle);
#   merge  — bitwise OR == union-distinct of set-bit rows: per-partition /
#            per-day filters combine with no re-scan;
#   serve  — membership is a k-way explode + ONE broadcast-or-hash semi
#            join against the tiny bit table; the canonical use is
#            scan-side pruning of a huge probe table before an expensive
#            join (no false negatives, bounded false-positive rate
#            (1 - e^{-kn/m})^k).


def _bloom_positions(key: Column, m_bits: int, k: int, salt: str) -> list[Column]:
    # one expression site: hashing.md5_bucket IS the Spark half of the
    # cross-engine contract (DuckDB mirror: registry._HEX8)
    from ophidia_server_spark.functions.hashing import md5_bucket

    return [md5_bucket(key, m_bits, f"{salt}#{j}") for j in range(k)]


def bloom_bits(
    df: DataFrame, key_col: str, m_bits: int = 8192, k: int = 4,
    salt: str = "bloom",
) -> DataFrame:
    """Build the filter: the distinct set-bit positions (one `pos` column,
    <= m_bits rows). One map + one distinct — the sketch shape."""
    key = F.col(key_col)
    pos = F.explode(F.array(*_bloom_positions(key, m_bits, k, salt)))
    return df.select(pos.alias("pos")).distinct()


def bloom_merge(*bit_tables: DataFrame) -> DataFrame:
    """Bitwise OR == union-distinct of set-bit rows (mergeability)."""
    out = bit_tables[0]
    for t in bit_tables[1:]:
        out = out.unionByName(t)
    return out.distinct()


def bloom_contains(
    bits: DataFrame, probes: DataFrame, key_col: str,
    m_bits: int = 8192, k: int = 4, salt: str = "bloom",
) -> DataFrame:
    """Membership verdict per DISTINCT probe key: might_contain = 1 iff
    ALL k positions are set. Plan: dedup the probe keys (so repeated keys
    can never sum their hits past k and read as a false negative — the
    one error class a Bloom filter must never make), explode each to its
    k positions, ONE join against the bit table (broadcastable:
    <= m_bits rows), count hits per key — no Python, no collect."""
    key = F.col(key_col)
    exploded = probes.select(key.alias(key_col)).distinct().select(
        key.alias(key_col),
        F.explode(F.array(*_bloom_positions(key, m_bits, k, salt))).alias("pos"),
    )
    hits = (
        exploded.join(F.broadcast(bits.withColumn("__set", F.lit(1))), "pos", "left")
        .groupBy(key_col)
        .agg(F.sum(F.coalesce(F.col("__set"), F.lit(0))).alias("__hits"))
    )
    return hits.select(
        key_col,
        (F.col("__hits") == k).cast("int").alias("might_contain"),
    )


def bloom_prejoin_filter(
    fact: DataFrame, dim_bits: DataFrame, key_col: str,
    m_bits: int = 8192, k: int = 4, salt: str = "bloom",
) -> DataFrame:
    """The canonical serving use: prune a huge fact table against a dim's
    Bloom filter BEFORE the real join — rows whose keys cannot be in the
    dim (any unset position) are dropped at scan time by a broadcast
    semi-join shape, shrinking the expensive join's shuffle. No false
    negatives: every surviving row is a superset of the true matches."""
    verdict = bloom_contains(
        dim_bits, fact.select(key_col).distinct(), key_col, m_bits, k, salt
    ).filter(F.col("might_contain") == 1).select(key_col)
    # no broadcast hint: the surviving-key set grows with the data (it's a
    # superset of the dim keys over the fact's key domain) — AQE broadcasts
    # when it measures small, shuffles when it isn't (repo join-hint policy)
    return fact.join(verdict, key_col, "left_semi")


def hll_intersect_report(
    df: DataFrame, key_col: str, split_col: Column, a: str, b: str,
    p: int = 8, salt: str = "hll",
) -> DataFrame:
    """Sketch SET ALGEBRA over two splits: estimate |A|, |B|, |A u B| from
    per-split register tables and |A n B| by inclusion-exclusion — the
    standard HLL intersection (HLL sketches union natively via max-merge;
    intersection has no native sketch, so every production system derives
    it exactly this way). One grouped aggregate builds both splits'
    registers in a single pass; the union is an m-row max-merge — no
    second scan of the source anywhere. The exact intersection count
    column is affordable at gate scale only; at 100 TB just the three
    sketch estimates run."""
    two = df.filter(split_col.isin(a, b))
    parts = hll_registers_by(two, key_col, split_col, p=p, salt=salt)
    reg_a = parts.filter(F.col("split") == a).select("reg", "rho")
    reg_b = parts.filter(F.col("split") == b).select("reg", "rho")
    est_a = hll_estimate(reg_a, p=p).select(F.col("estimate").alias("est_a"))
    est_b = hll_estimate(reg_b, p=p).select(F.col("estimate").alias("est_b"))
    est_u = hll_estimate(hll_merge(reg_a, reg_b), p=p).select(
        F.col("estimate").alias("est_union")
    )
    ka, kb = [
        df.filter(split_col == s).select(F.col(key_col).alias("k")).distinct()
        for s in (a, b)
    ]
    exact = ka.join(kb, "k").agg(
        F.count("*").cast("long").alias("n_exact_intersect")
    )
    return (
        est_a.join(F.broadcast(est_b))
        .join(F.broadcast(est_u))
        .join(F.broadcast(exact))
        .select(
            "est_a", "est_b", "est_union",
            F.round(
                F.col("est_a") + F.col("est_b") - F.col("est_union"), 4
            ).alias("est_intersect"),
            "n_exact_intersect",
        )
    )


def cms_join_cardinality(
    sketch_a: DataFrame, sketch_b: DataFrame,
) -> DataFrame:
    """Sketch-estimated equi-join output size — the count-min INNER-PRODUCT
    estimate (Cormode/Muthukrishnan 2005 §4.2): for two sketches of the
    join keys of A and B built with the same (d, w, salt),

        |A JOIN B on k|  ~=  min over rows r of  sum_b  a[r,b] * b[r,b]

    never an undercount; overcount bounded by ||a||_1 ||b||_1 / w per row.
    This is the planning primitive a 100 TB pipeline runs BEFORE a join to
    decide strategy (broadcast vs shuffle vs pre-filter): both inputs are
    d*w-row tables, so the estimate costs two map-side sketch passes that
    can be maintained incrementally (cms_merge) instead of a dry-run join.
    Returns one row: (est_join_rows,)."""
    prod = sketch_a.alias("a").join(
        sketch_b.alias("b"), ["row", "bucket"]
    ).select("row", (F.col("a.c") * F.col("b.c")).alias("p"))
    per_row = prod.groupBy("row").agg(F.sum("p").alias("ip"))
    return per_row.agg(F.min("ip").cast("long").alias("est_join_rows"))


def dds_sketch_by(
    df: DataFrame, value_col: str, split_col, alpha: float = 0.01
) -> DataFrame:
    """Per-group DDSketch: (split, bucket, c) — the per-service /
    per-tenant latency-quantile shape. One grouped aggregate; the table
    holds O(groups * log(max/min)/alpha) rows, each group's sketch merges
    independently by counter addition (dds_merge grouped by split). Same
    value semantics (zero sentinel, negative raises) as dds_sketch."""
    if not 0 < alpha < 1:
        raise ValueError(f"alpha must be in (0, 1), got {alpha}")
    import math

    gamma = (1 + alpha) / (1 - alpha)
    x = F.col(value_col).cast("double")
    bucket = (
        F.when(x == 0, F.lit(-(2**62)))
        .when(
            x < 0,
            F.raise_error(
                F.concat(
                    F.lit("dds_sketch_by requires non-negative values, got "),
                    x.cast("string"),
                )
            ).cast("long"),
        )
        .otherwise(F.ceil(F.log(x) / math.log(gamma)))
    )
    split = split_col if not isinstance(split_col, str) else F.col(split_col)
    return (
        df.select(split.alias("split"), bucket.cast("long").alias("bucket"))
        .groupBy("split", "bucket")
        .agg(F.count("*").cast("long").alias("c"))
    )


def dds_quantiles_by(
    sketch: DataFrame, qs: list[float], alpha: float = 0.01
) -> DataFrame:
    """(split, q, est): quantiles per group from a dds_sketch_by table —
    the same rank-semantics walk as dds_quantiles, with every window
    PARTITIONED BY split, so the cumulative sums stay group-local and the
    plan scales with the number of groups instead of moving everything to
    one partition."""
    import math

    from pyspark.sql import Window

    gamma = (1 + alpha) / (1 - alpha)
    w = (
        Window.partitionBy("split")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    total = Window.partitionBy("split")
    cum = sketch.select(
        "split", "bucket",
        F.sum("c").over(w).alias("__cum"),
        F.sum("c").over(total).alias("__n"),
    ).select(
        "split", "bucket", "__cum", "__n",
        F.explode(F.array(*[F.lit(float(q)) for q in qs])).alias("q"),
    )
    rank = F.ceil(F.col("q") * F.col("__n"))
    best = (
        cum.filter(F.col("__cum") >= F.greatest(rank, F.lit(1)))
        .groupBy("split", "q")
        .agg(F.min("bucket").alias("__b"))
    )
    return best.select(
        "split", "q",
        F.when(F.col("__b") == -(2**62), F.lit(0.0))
        .otherwise(
            F.round(2.0 * F.pow(F.lit(gamma), F.col("__b")) / (gamma + 1), 6)
        )
        .alias("est"),
    )


def winsorize_by_group(
    df: DataFrame,
    value_col: str,
    split_col,
    lower_q: float = 0.01,
    upper_q: float = 0.99,
    alpha: float = 0.01,
) -> DataFrame:
    """Outlier clipping per group: clamp `value_col` into the group's
    [lower_q, upper_q] DDSketch quantile band — the winsorization pass a
    feature pipeline runs before normalization, per service/tenant/source.
    Cost: ONE grouped sketch pass (O(groups * log/alpha) rows), a
    quantile walk over that tiny table, and a groups-sized join back that
    AQE broadcasts; the clip itself is a pure map. Adds `clipped` (the
    clamped value) and `was_clipped`.

    `split_col` must be a COLUMN NAME (the join back keys on it); for a
    computed split, materialize it as a column first —
    df.withColumn("grp", expr) — and pass "grp"."""
    if not isinstance(split_col, str):
        raise TypeError(
            "winsorize_by_group needs a column NAME for split_col (the "
            "bounds join keys on it); withColumn a computed split first"
        )
    sk = dds_sketch_by(df, value_col, split_col, alpha)
    cuts = dds_quantiles_by(sk, [lower_q, upper_q], alpha)
    bounds = cuts.groupBy("split").agg(
        F.min(F.when(F.col("q") == lower_q, F.col("est"))).alias("__lo"),
        F.min(F.when(F.col("q") == upper_q, F.col("est"))).alias("__hi"),
    )
    v = F.col(value_col).cast("double")
    clipped = F.least(F.greatest(v, F.col("__lo")), F.col("__hi"))
    return (
        df.join(
            bounds.withColumnRenamed("split", split_col), split_col
        )
        .withColumn("clipped", F.round(clipped, 6))
        .withColumn(
            "was_clipped", ((v < F.col("__lo")) | (v > F.col("__hi"))).cast("int")
        )
        .drop("__lo", "__hi")
    )


def hll_rolling_distinct(
    df: DataFrame,
    key_col: str,
    ts_col: str = "ts",
    days: int = 7,
    p: int = 8,
    salt: str = "hll",
) -> DataFrame:
    """Rolling distinct count (the WAU/MAU dashboard number) from DAILY
    HLL sketches: one pass builds per-day register tables, and each day's
    trailing-N estimate is a register-wise MAX over its window — the
    mergeability of HLL means history is NEVER rescanned; a year of WAU
    is 365 sketch merges of m rows each. Per-register rolling max runs as
    a RANGE window on the day number over the dense (day x m) grid
    (days*m rows — tiny), then one grouped estimate per day using the
    same bias-corrected formula as hll_estimate. Returns
    (day, estimate) for every active day."""
    from pyspark.sql import Window

    m = 1 << p
    alpha = {16: 0.673, 32: 0.697, 64: 0.709}.get(m, 0.7213 / (1.0 + 1.079 / m))
    spark = df.sparkSession
    daily = hll_registers_by(
        df, key_col, F.to_date(F.col(ts_col)), p=p, salt=salt
    ).withColumnRenamed("split", "day")
    grid = (
        daily.select("day").distinct()
        .crossJoin(spark.range(m).select(F.col("id").alias("reg")))
    )
    dense = grid.join(daily, ["day", "reg"], "left").select(
        "day", "reg", F.coalesce("rho", F.lit(0)).alias("rho")
    )
    dnum = F.datediff(F.col("day"), F.lit("1970-01-01"))
    w = (
        Window.partitionBy("reg")
        .orderBy(dnum)
        .rangeBetween(-(days - 1), 0)
    )
    rolled = dense.withColumn("__roll", F.max("rho").over(w))
    agg = rolled.groupBy("day").agg(
        F.sum(F.pow(F.lit(2.0), -F.col("__roll"))).alias("__denom"),
        F.sum((F.col("__roll") == 0).cast("long")).alias("__v"),
    )
    raw = F.lit(alpha * m * m) / F.col("__denom")
    v = F.col("__v")
    est = F.when(
        (raw <= 2.5 * m) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v),
    ).otherwise(raw)
    return agg.select(
        F.col("day").cast("string").alias("day"),
        F.round(est, 4).alias("estimate"),
    )
