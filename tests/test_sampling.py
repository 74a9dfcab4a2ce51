"""Deterministic sampling / splitting / corpus-mixing semantics."""

import pytest
from pyspark.sql import functions as F

from ophidia_server_spark.pipeline import sampling as smp


def test_hash_sample_deterministic_and_stable(tables):
    docs = tables["documents"]
    a = {r.doc_id for r in smp.hash_sample(docs, 0.25).select("doc_id").collect()}
    b = {r.doc_id for r in smp.hash_sample(docs, 0.25).select("doc_id").collect()}
    assert a == b
    # membership survives repartitioning (content-addressed, not positional)
    c = {
        r.doc_id
        for r in smp.hash_sample(docs.repartition(13), 0.25).select("doc_id").collect()
    }
    assert a == c
    # roughly the requested rate (binomial tolerance on the small fixture)
    n = docs.count()
    assert 0.1 * n < len(a) < 0.45 * n


def test_hash_sample_monotone_in_frac(tables):
    docs = tables["documents"]
    small = {r.doc_id for r in smp.hash_sample(docs, 0.1).select("doc_id").collect()}
    big = {r.doc_id for r in smp.hash_sample(docs, 0.5).select("doc_id").collect()}
    # growing the fraction only ADDS documents (stable re-sampling)
    assert small <= big


def test_hash_sample_edges(tables):
    docs = tables["documents"]
    assert smp.hash_sample(docs, 1.0).count() == docs.count()
    assert smp.hash_sample(docs, 0.0).count() == 0
    with pytest.raises(ValueError):
        smp._threshold_hex(1.5)


def test_split_disjoint_exhaustive(tables):
    docs = tables["documents"]
    tagged = smp.train_val_test_split(docs, 0.1, 0.1)
    counts = {r.split: r.n for r in tagged.groupBy("split").agg(F.count("*").alias("n")).collect()}
    assert sum(counts.values()) == docs.count()
    assert set(counts) == {"train", "val", "test"}
    assert counts["train"] > counts["val"] and counts["train"] > counts["test"]


def test_split_salt_independence(tables):
    docs = tables["documents"]
    s1 = {(r.doc_id, r.split) for r in smp.train_val_test_split(docs, 0.2, 0.2, salt="a").collect()}
    s2 = {(r.doc_id, r.split) for r in smp.train_val_test_split(docs, 0.2, 0.2, salt="b").collect()}
    # different salts draw different coins
    assert s1 != s2


def test_stratified_mix_rates(tables):
    docs = tables["documents"]
    mixed = smp.stratified_sample(docs, {"src0": 1.0, "src1": 0.0}, default_frac=0.3)
    per = {r.source: r.n for r in mixed.groupBy("source").agg(F.count("*").alias("n")).collect()}
    full = {r.source: r.n for r in docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    assert per["src0"] == full["src0"]  # frac 1.0 keeps every row
    assert "src1" not in per  # frac 0.0 keeps none
    report = smp.mix_report(docs, mixed)
    row = {r.source: r for r in report.collect()}
    assert row["src0"].achieved_rate == 1.0
    assert row["src1"].n_after == 0 and row["src1"].achieved_rate == 0.0


def test_sampling_is_one_map_stage(tables):
    # scale shape: the filter must reach the scan side (no shuffle, no UDF)
    docs = tables["documents"]
    plan = smp.hash_sample(docs, 0.25)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "pythonUDF" not in plan


def test_resize_raw_rgb_nearest_neighbor(spark):
    import numpy as np

    from ophidia_server_spark.pipeline.multimodal import resize_raw_rgb

    # 4x4 gradient image, known bytes; plus one poison payload
    img = np.arange(4 * 4 * 3, dtype="uint8").reshape(4, 4, 3)
    df = spark.createDataFrame(
        [(1, bytearray(img.tobytes())), (2, bytearray(b"\x00\x01"))],
        "doc_id long, payload binary",
    )
    out = {r.doc_id: r for r in resize_raw_rgb(df, 4, 4, 2, 2).collect()}
    assert out[2].ok == 0 and bytes(out[2].resized) == b""
    got = np.frombuffer(bytes(out[1].resized), dtype="uint8").reshape(2, 2, 3)
    ys = (np.arange(2) * 4 // 2)
    xs = (np.arange(2) * 4 // 2)
    want = img[np.ix_(ys, xs)]
    assert np.array_equal(got, want)


def test_weighted_sample_monotone_and_exact(spark):
    import hashlib

    from pyspark.sql import functions as F

    rows = [(i, (i % 11) / 10.0) for i in range(200)]
    df = spark.createDataFrame(rows, "doc_id long, w double")
    kept = {r.doc_id for r in smp.weighted_sample(df, "w").collect()}
    # exact contract: coin32 < w * 2^32, python-side mirror
    want = set()
    for i, w in rows:
        coin = int(hashlib.md5(f"{i}:wsample".encode()).hexdigest()[:8], 16)
        if coin < min(w, 1.0) * 16 ** 8:
            want.add(i)
    assert kept == want
    # weight 0 rows never keep; weight 1.0 rows always keep
    assert not {i for i, w in rows if w == 0.0} & kept
    assert {i for i, w in rows if w == 1.0} <= kept
    # monotone: doubling every weight only ADDS members
    kept2 = {
        r.doc_id
        for r in smp.weighted_sample(
            df.withColumn("w", F.least(F.col("w") * 2, F.lit(1.0))), "w"
        ).collect()
    }
    assert kept <= kept2


def test_weighted_sample_rejects_bad_cap(spark):
    df = spark.createDataFrame([(1, 0.5)], "doc_id long, w double")
    with pytest.raises(ValueError):
        smp.weighted_sample(df, "w", cap=0)


def test_group_fixed_k_quota_and_determinism(spark, tables):
    from pyspark.sql import functions as F

    from ophidia_server_spark.pipeline.sampling import group_fixed_k_sample

    docs = tables["documents"]
    got = group_fixed_k_sample(docs, 7, "source")
    sizes = {r["source"]: r["n"] for r in
             got.groupBy("source").agg(F.count("*").alias("n")).collect()}
    full = {r["source"]: r["n"] for r in
            docs.groupBy("source").agg(F.count("*").alias("n")).collect()}
    for src, n in sizes.items():
        assert n == min(7, full[src])
    # stable across partitionings
    a = sorted(r["doc_id"] for r in got.collect())
    b = sorted(
        r["doc_id"]
        for r in group_fixed_k_sample(docs.repartition(13), 7, "source").collect()
    )
    assert a == b
    # k=0 -> empty
    assert group_fixed_k_sample(docs, 0, "source").count() == 0


def test_group_fixed_k_balances_kmeans_clusters(spark, tables):
    from pyspark.sql import functions as F

    from ophidia_server_spark.pipeline.clustering import kmeans_lloyd
    from ophidia_server_spark.pipeline.sampling import group_fixed_k_sample

    emb = tables["embeddings"].limit(300)
    assigned = kmeans_lloyd(emb, k=4, iters=3).assignments
    took = group_fixed_k_sample(assigned, 5, "cluster", key_col="vec_id")
    per = took.groupBy("cluster").agg(F.count("*").alias("n")).collect()
    assert all(r["n"] <= 5 for r in per)
    assert took.count() == sum(r["n"] for r in per)


def test_leakage_free_split_keeps_dup_groups_together(spark, tables):
    from pyspark.sql import functions as F

    from ophidia_server_spark.pipeline.sampling import split_column

    d = tables["documents"].select("doc_id", "text")
    docs = d.unionByName(
        d.filter("doc_id % 10 = 0").select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    groups = docs.select("doc_id", F.md5("text").alias("h"))
    rep = groups.groupBy("h").agg(F.min("doc_id").alias("rep_id"))
    split = groups.join(rep, "h").select(
        "h", "doc_id", split_column(F.col("rep_id"), 0.1, 0.1, "lsplit").alias("split")
    )
    # no content-hash group spans two splits
    spans = (
        split.groupBy("h").agg(F.countDistinct("split").alias("k"))
        .filter("k > 1").count()
    )
    assert spans == 0
    # and the split is non-degenerate
    names = {r["split"] for r in split.select("split").distinct().collect()}
    assert "train" in names and len(names) >= 2


def test_neyman_allocation_favors_high_variance_strata(spark):
    from ophidia_server_spark.pipeline.sampling import neyman_allocation

    rows = (
        # stratum "wild": 100 rows alternating 0/100 (sigma 50)
        [("wild", float(0 if i % 2 else 100)) for i in range(100)]
        # stratum "calm": 100 rows all 10 (sigma 0)
        + [("calm", 10.0) for _ in range(100)]
        # stratum "mid": 200 rows alternating 9/11 (sigma 1)
        + [("mid", float(9 if i % 2 else 11)) for i in range(200)]
    )
    df = spark.createDataFrame(rows, "s string, v double")
    got = {r["stratum"]: r for r in neyman_allocation(df, "s", "v", 100).collect()}
    assert got["calm"]["n_alloc"] == 0 and got["calm"]["sigma"] == 0.0
    # weights: wild 100*50=5000, mid 200*1=200 -> ~96/4 split
    assert got["wild"]["n_alloc"] + got["mid"]["n_alloc"] == 100
    assert got["wild"]["n_alloc"] >= 95 and got["mid"]["n_alloc"] >= 3
    assert got["wild"]["sigma"] == 50.0 and got["mid"]["sigma"] == 1.0


def test_neyman_allocation_all_flat_falls_back_proportional(spark):
    from ophidia_server_spark.pipeline.sampling import neyman_allocation

    rows = [("a", 5.0)] * 30 + [("b", 7.0)] * 10
    df = spark.createDataFrame(rows, "s string, v double")
    got = {r["stratum"]: r["n_alloc"] for r in neyman_allocation(df, "s", "v", 8).collect()}
    assert got == {"a": 6, "b": 2}  # proportional to 30/10


def test_neyman_allocation_rejects_negative_budget(spark):
    import pytest as _pytest

    from ophidia_server_spark.pipeline.sampling import neyman_allocation

    df = spark.createDataFrame([("a", 1.0)], "s string, v double")
    with _pytest.raises(ValueError):
        neyman_allocation(df, "s", "v", -1)


def test_weighted_reservoir_topk_laws(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from ophidia_server_spark.pipeline.sampling import weighted_reservoir_topk

    df = spark.range(200).select(
        F.col("id").alias("doc_id"), (F.col("id") % 7 + 1.0).alias("w")
    )
    out = weighted_reservoir_topk(df, "w", 20, key_col="doc_id")
    rows = out.collect()
    # exactly k winners, ranks 1..k aligned with (clock, id) order
    assert len(rows) == 20
    assert sorted(r["sample_rank"] for r in rows) == list(range(1, 21))
    ordered = sorted(rows, key=lambda r: (r["clock"], r["doc_id"]))
    assert [r["sample_rank"] for r in ordered] == list(range(1, 21))
    # deterministic: a rerun returns byte-identical winners
    again = weighted_reservoir_topk(df, "w", 20, key_col="doc_id").collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))
    # a row with overwhelming weight is (essentially) always selected:
    # its clock is -ln(u)/1e9 ~ 0
    boosted = df.withColumn(
        "w", F.when(F.col("doc_id") == 137, 1e9).otherwise(F.col("w"))
    )
    top = weighted_reservoir_topk(boosted, "w", 5, key_col="doc_id").collect()
    assert any(r["doc_id"] == 137 for r in top)
    # weight <= 0 can never win
    z = df.withColumn(
        "w", F.when(F.col("doc_id") < 190, 0.0).otherwise(F.col("w"))
    )
    zw = weighted_reservoir_topk(z, "w", 20, key_col="doc_id").collect()
    assert len(zw) == 10 and all(r["doc_id"] >= 190 for r in zw)
    with _pytest.raises(ValueError):
        weighted_reservoir_topk(df, "w", 0)


def test_weighted_reservoir_inclusion_is_weight_biased(spark):
    # statistical sanity at fixed seed-space: among 1000 rows where ids
    # >= 500 carry 10x the weight, the heavy half must dominate the
    # k=100 sample (binomial argument: p_light << p_heavy)
    from pyspark.sql import functions as F

    from ophidia_server_spark.pipeline.sampling import weighted_reservoir_topk

    df = spark.range(1000).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") >= 500, 10.0).otherwise(1.0).alias("w"),
    )
    got = weighted_reservoir_topk(df, "w", 100, key_col="doc_id").collect()
    heavy = sum(1 for r in got if r["doc_id"] >= 500)
    assert heavy >= 75  # E[heavy] ~ 91 under A-ES; 75 is ~5 sigma slack


def test_token_budget_select_greedy_closure(spark):
    import pytest as _pytest
    from pyspark.sql import functions as F

    from ophidia_server_spark.pipeline.sampling import token_budget_select

    rows = [
        # source a, quality-ordered tokens: 40, 30, 50, 10
        (1, "a", 40, 9.0), (2, "a", 30, 8.0), (3, "a", 50, 7.0), (4, "a", 10, 6.0),
        # source b: single huge doc still selected (budget not yet touched)
        (5, "b", 999, 1.0),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, n_tokens long, q double")
    got = {r["doc_id"]: (r["cum_tokens"], r["selected"]) for r in
           token_budget_select(df, 100, quality_col="q").collect()}
    # a: 40 (in), 70 (in), 120 (in — crosses the line, greedy closure),
    #    130 (out — budget already exhausted before it)
    assert got[1] == (40, 1) and got[2] == (70, 1)
    assert got[3] == (120, 1) and got[4] == (130, 0)
    # b: first doc always in while budget > 0
    assert got[5] == (999, 1)
    # zero budget selects nothing
    none = token_budget_select(df, 0, quality_col="q").collect()
    assert all(r["selected"] == 0 for r in none)
    with _pytest.raises(ValueError):
        token_budget_select(df, -1)
