"""Feature-engineering transforms (pipeline/features.py)."""

from pyspark.sql import functions as F

from ophidia_server_spark.pipeline.features import (
    minmax_by_group,
    standardize_by_group,
    string_index,
)


def test_standardize_moments_and_constant_group(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 3.0), ("b", 5.0), ("b", 5.0)],
        "g string, v double",
    )
    out = {(r["g"], r["v"]): r["zscore"] for r in
           standardize_by_group(df, "v", "g").collect()}
    import math

    sd = math.sqrt(2.0 / 3.0 + 1e-12)
    assert abs(out[("a", 1.0)] - round(-1.0 / sd, 6)) < 1e-9
    assert abs(out[("a", 2.0)]) < 1e-9
    assert out[("b", 5.0)] == 0.0  # zero-variance group
    # per-group standardized mean is ~0
    zs = [v for (g, _), v in out.items() if g == "a"]
    assert abs(sum(zs)) < 1e-6


def test_minmax_by_group(spark):
    df = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("a", 30.0), ("b", 7.0)],
        "g string, v double",
    )
    out = {(r["g"], r["v"]): r["scaled"] for r in
           minmax_by_group(df, "v", "g").collect()}
    assert out[("a", 10.0)] == 0.0 and out[("a", 30.0)] == 1.0
    assert out[("a", 20.0)] == 0.5
    assert out[("b", 7.0)] == 0.0  # constant group


def test_string_index_frequency_then_name_order(spark):
    df = spark.createDataFrame(
        [("x",), ("x",), ("y",), ("z",), ("z",), (None,)], "c string"
    )
    out, vocab = string_index(df, "c")
    v = {r["value"]: (r["n"], r["idx"]) for r in vocab.collect()}
    # x and z tie at 2 -> x first lexicographically; y last
    assert v["x"] == (2, 0) and v["z"] == (2, 1) and v["y"] == (1, 2)
    rows = out.collect()
    assert {r["c_idx"] for r in rows if r["c"] == "x"} == {0}
    assert [r["c_idx"] for r in rows if r["c"] is None] == [None]
    # stable under repartitioning
    out2, _ = string_index(df.repartition(5), "c")
    assert {(r["c"], r["c_idx"]) for r in rows} == {
        (r["c"], r["c_idx"]) for r in out2.collect()
    }


def test_percentile_rank_laws(spark):
    df = spark.createDataFrame(
        [("a", 1.0), ("a", 2.0), ("a", 2.0), ("a", 4.0), ("b", 9.0)],
        "g string, v double",
    )
    from ophidia_server_spark.pipeline.features import percentile_rank_by_group

    got = [
        (r["g"], r["v"], r["pct_rank"])
        for r in percentile_rank_by_group(df, "v", "g").collect()
    ]
    by = {}
    for g, v, p in got:
        by.setdefault((g, v), set()).add(p)
    assert by[("a", 1.0)] == {0.25}
    assert by[("a", 2.0)] == {0.75}   # ties share cume_dist
    assert by[("a", 4.0)] == {1.0}
    assert by[("b", 9.0)] == {1.0}    # singleton group tops its own CDF


def test_percentile_rank_cardinality_guard_crossover(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from ophidia_server_spark.pipeline.features import (
        EcdfCardinalityError, percentile_rank_by_group,
    )

    # 5000 distinct doubles in one group: near-continuous at this scale
    df = spark.range(5000).select(
        F.lit("g").alias("g"), (F.col("id") * 1.0 + 0.5).alias("v")
    )
    # budget comfortably above the cardinality -> exact plan runs
    exact = percentile_rank_by_group(df, "v", "g", max_distinct=100_000)
    assert exact.count() == 5000
    # budget below -> the named error points at the bucketed lever
    with _pytest.raises(EcdfCardinalityError, match="percentile_rank_bucketed"):
        percentile_rank_by_group(df, "v", "g", max_distinct=1000)
    # auto_bucket crossover: same rows, same output column, bounded plan;
    # with buckets >= distinct values the bucketed rank equals the exact
    # cume_dist (ties only within cells), so the two paths agree exactly
    auto = percentile_rank_by_group(
        df, "v", "g", max_distinct=1000, auto_bucket=True, buckets=5000
    )
    assert auto.columns == exact.columns
    a = {r["v"]: r["pct_rank"] for r in auto.collect()}
    e = {r["v"]: r["pct_rank"] for r in exact.collect()}
    assert a == e
    # max_distinct=None skips the guard entirely
    assert percentile_rank_by_group(
        df, "v", "g", max_distinct=None
    ).count() == 5000


def test_target_encode_shrinks_rare_categories(spark):
    from ophidia_server_spark.pipeline.features import target_encode

    rows = [("big", 1)] * 50 + [("big", 0)] * 50 + [("rare", 1)]
    df = spark.createDataFrame(rows, "c string, label int")
    out = {r["c"]: r["te_c"] for r in target_encode(df, "c", "label", 10.0).collect()}
    prior = 51 / 101
    # big: near its own 0.5 mean; rare: pulled hard toward the prior
    assert abs(out["big"] - (50 + prior * 10) / 110) < 1e-6
    assert abs(out["rare"] - (1 + prior * 10) / 11) < 1e-6
    assert out["rare"] < 1.0  # a single positive cannot memorize to 1


def test_quantile_bins_are_equal_frequency_up_to_ties(spark):
    from pyspark.sql import functions as F

    from ophidia_server_spark.pipeline.features import quantile_bins

    df = spark.range(1000).select(
        F.lit("g").alias("g"), (F.col("id") % 500 / 2.0).alias("v")
    )
    out = quantile_bins(df, "v", "g", q=10)
    sizes = {r["bin"]: r["n"] for r in
             out.groupBy("bin").agg(F.count("*").alias("n")).collect()}
    assert set(sizes) == set(range(1, 11))
    assert all(s == 100 for s in sizes.values())
    # order-respecting: a higher value never lands in a lower bin
    pairs = out.select("v", "bin").distinct().collect()
    by_v = sorted((r["v"], r["bin"]) for r in pairs)
    assert all(b1 <= b2 for (_, b1), (_, b2) in zip(by_v, by_v[1:]))
    # deterministic under repartitioning
    again = quantile_bins(df.repartition(7), "v", "g", q=10)
    assert {(r["v"], r["bin"]) for r in again.select("v", "bin").collect()} \
        == {(r["v"], r["bin"]) for r in out.select("v", "bin").collect()}


def test_robust_scale_median_iqr_contract(spark):
    from pyspark.sql import functions as F

    from ophidia_server_spark.pipeline.features import robust_scale_by_group

    # values 1..100: lower median (F >= .5) = 50, q1 = 25, q3 = 75
    df = spark.range(1, 101).select(
        F.lit("g").alias("g"), F.col("id").cast("double").alias("v")
    )
    out = robust_scale_by_group(df, "v", "g")
    r = out.filter("v = 75.0").first()
    assert r["median"] == 50.0 and r["iqr"] == 50.0
    assert r["robust_scaled"] == 0.5
    # constant group scales to zero with iqr 0
    const = spark.range(10).select(
        F.lit("c").alias("g"), F.lit(7.0).alias("v")
    )
    rc = robust_scale_by_group(const, "v", "g").first()
    assert rc["iqr"] == 0.0 and rc["robust_scaled"] == 0.0


def test_ks_two_sample_limits(spark):
    from pyspark.sql import functions as F

    from ophidia_server_spark.pipeline.audit import ks_two_sample

    a = spark.range(500).select((F.col("id") % 100).cast("double").alias("v"))
    # identical distributions: D = 0
    same = ks_two_sample(a, a, "v").first()
    assert same["ks_stat"] == 0.0
    assert same["n_ref"] == same["n_new"] == 500
    # disjoint supports: D = 1
    b = a.select((F.col("v") + 1000).alias("v"))
    far = ks_two_sample(a, b, "v").first()
    assert far["ks_stat"] == 1.0
    # a known half-shift: shifting half the mass by +0.5 inside the grid
    c = a.select(
        F.when(F.col("v") < 50, F.col("v")).otherwise(F.col("v") + 200).alias("v")
    )
    mid = ks_two_sample(a, c, "v").first()
    assert 0.0 < mid["ks_stat"] <= 0.5


def test_profile_table_handcrafted_columns(spark):
    from ophidia_server_spark.pipeline.audit import profile_table

    df = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, None), (4, "b"), (5, "a"), (6, "b")],
        "id long, tag string",
    )
    rows = {r["column"]: r for r in profile_table(df).collect()}
    t = rows["tag"]
    assert t["n_rows"] == 6 and t["n_nulls"] == 1
    assert t["null_frac"] == round(1 / 6, 6)
    assert t["n_distinct"] == 2
    assert t["min_str"] == "a" and t["max_str"] == "b"
    assert t["mode_value"] == "b" and t["mode_count"] == 3
    i = rows["id"]
    assert i["n_distinct"] == 6 and i["n_nulls"] == 0
    # all-distinct mode: ties break to the smaller string ("1")
    assert i["mode_value"] == "1" and i["mode_count"] == 1


def test_fk_integrity_counts(spark):
    from ophidia_server_spark.pipeline.audit import fk_integrity

    fact = spark.createDataFrame(
        [(1,), (1,), (2,), (9,), (None,)], "k long")
    dim = spark.createDataFrame([(1,), (2,), (3,)], "pk long")
    r = fk_integrity(fact, dim, "k", "pk").first()
    assert r["n_fact"] == 5 and r["n_null_fk"] == 1
    assert r["n_orphans"] == 1  # the 9
    assert r["orphan_frac"] == 0.25  # 1 of 4 non-null
    assert r["n_dim"] == 3 and r["n_unused_dim"] == 1  # the 3


def test_rate_spikes_flags_the_constructed_burst(spark):
    from pyspark.sql import functions as F

    from ophidia_server_spark.pipeline.audit import rate_spikes

    # 60 one-minute buckets of 10 events + one bucket of 600
    base = spark.range(600).select(
        F.timestamp_seconds(1700000000 + (F.col("id") % 60) * 60).alias("ts")
    )
    burst = spark.range(590).select(
        F.timestamp_seconds(F.lit(1700000000 + 61 * 60)).alias("ts")
    )
    out = rate_spikes(base.unionByName(burst), "ts", bucket_minutes=1)
    rows = {r["bucket_start"]: r for r in out.collect()}
    burst_bucket = ((1700000000 + 61 * 60) // 60) * 60
    spike = rows[burst_bucket]
    assert spike["n_events"] == 590 and spike["is_spike"] == 1
    assert sum(r["is_spike"] for r in rows.values()) == 1
    assert all(abs(r["zscore"]) < 3 for b, r in rows.items()
               if b != burst_bucket)


def test_quantile_normalize_aligns_groups_exactly(spark):
    from ophidia_server_spark.pipeline.features import quantile_normalize

    rows = [("a", 1.0), ("a", 2.0), ("a", 3.0),
            ("b", 10.0), ("b", 20.0), ("b", 30.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    got = {(r["g"], r["v"]): r["qnorm"]
           for r in quantile_normalize(df, "v", "g").collect()}
    # global sorted: [1,2,3,10,20,30]; within-group ranks 1/3, 2/3, 1
    # -> order statistics at positions 2, 4, 6 for BOTH groups: after
    # normalization the two groups share one distribution exactly
    assert [got[("a", v)] for v in (1.0, 2.0, 3.0)] == [2.0, 10.0, 30.0]
    assert [got[("b", v)] for v in (10.0, 20.0, 30.0)] == [2.0, 10.0, 30.0]


def test_quantile_normalize_ties_and_nulls(spark):
    from ophidia_server_spark.pipeline.features import quantile_normalize

    rows = [("a", 1.0), ("a", 1.0), ("a", 3.0), ("b", None), ("b", 5.0)]
    df = spark.createDataFrame(rows, "g string, v double")
    out = quantile_normalize(df, "v", "g").collect()
    got = {(r["g"], r["v"]): r["qnorm"] for r in out}
    # group a: tied 1.0s share rank 2/3 -> k = ceil(2/3 * 4) = 3 -> 3.0;
    # 3.0 at rank 1 -> k=4 -> 5.0. group b: 5.0 at rank 1 -> 5.0.
    assert got[("a", 1.0)] == 3.0 and got[("a", 3.0)] == 5.0
    assert got[("b", 5.0)] == 5.0
    # NULL passes through unmapped and the row is kept
    assert got[("b", None)] is None and len(out) == 5


def test_quantile_normalize_cardinality_guard(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from ophidia_server_spark.pipeline.features import (
        EcdfCardinalityError, quantile_normalize,
    )

    df = spark.range(5000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") * 1.0).alias("v"),
    )
    with _pytest.raises(EcdfCardinalityError, match="pass quantize="):
        quantile_normalize(df, "v", "g", max_distinct=1000)
    assert quantile_normalize(df, "v", "g", max_distinct=None).count() == 5000


def test_quantile_normalize_quantize_lever(spark):
    # round-10: the 'pre-quantize' lever is executable — quantize=B runs
    # the exact machinery over a bounded global grid; results equal the
    # exact path run on the hand-quantized values, NULLs pass through,
    # and a tiny max_distinct budget no longer trips (the whole point)
    import pytest as _pytest

    from pyspark.sql import functions as F

    from ophidia_server_spark.pipeline.features import (
        EcdfCardinalityError, quantile_normalize,
    )

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b",
          float(i) + (0.001 * i if i % 3 else 0.0)) for i in range(200)]
        + [(900, "a", None)],
        "id long, g string, v double",
    )
    # exact path over-budget: names quantize= as the way out
    with _pytest.raises(EcdfCardinalityError, match="quantize"):
        quantile_normalize(df, "v", "g", max_distinct=10)
    got = quantile_normalize(df, "v", "g", max_distinct=10, quantize=8)
    rows = {r["id"]: r["qnorm"] for r in got.collect()}
    assert rows[900] is None            # NULL passes through unmapped
    assert len(rows) == 201
    # self-consistency: equals the exact path on hand-quantized values
    lo, hi = df.agg(F.min("v"), F.max("v")).first()
    span = hi - lo
    cell = F.least(F.lit(7), F.floor((F.col("v") - F.lit(lo)) / F.lit(span) * 8))
    rep = F.round(F.lit(lo) + (cell.cast("double") + F.lit(0.5)) * F.lit(span) / F.lit(8), 6)
    hand = df.withColumn("qv", F.when(F.col("v").isNull(), None).otherwise(rep))
    expect = {
        r["id"]: r["qnorm"]
        for r in quantile_normalize(hand, "qv", "g").collect()
    }
    assert rows == expect
    # boundedness: at most 8 distinct qnorm outputs (global grid cells)
    assert len({v for v in rows.values() if v is not None}) <= 8


def test_quantile_normalize_quantize_degenerate_range(spark):
    from ophidia_server_spark.pipeline.features import quantile_normalize

    df = spark.createDataFrame(
        [(1, "a", 5.0), (2, "b", 5.0)], "id long, g string, v double"
    )
    got = {r["id"]: r["qnorm"]
           for r in quantile_normalize(df, "v", "g", quantize=4).collect()}
    assert got == {1: 5.0, 2: 5.0}


def test_quantile_normalize_quantize_survives_nan(spark):
    # NaN in the column must not dead-end the lever (double max() is NaN):
    # the grid comes from the finite values; NaN rows keep a NaN-derived
    # rep and the call succeeds under a tiny exact-path budget
    from pyspark.sql import functions as F

    from ophidia_server_spark.pipeline.features import quantile_normalize

    df = spark.createDataFrame(
        [(i, "a" if i % 2 == 0 else "b", float(i)) for i in range(50)],
        "id long, g string, v double",
    ).union(
        spark.createDataFrame([(999, "a", float("nan"))],
                              "id long, g string, v double")
    )
    got = {r["id"]: r["qnorm"]
           for r in quantile_normalize(df, "v", "g", max_distinct=5,
                                       quantize=4).collect()}
    assert len(got) == 51
    finite = {v for k, v in got.items() if k != 999}
    assert all(v is not None for v in finite)
    assert len(finite) <= 4
