"""Deterministic-HLL sketch checks: accuracy envelope on known
cardinalities, exact mergeability, and the md5 register contract."""

import hashlib

import pytest
from pyspark.sql import functions as F

from ophidia_server_spark.functions import sketches as sk


def _keys(spark, n, prefix="k"):
    return spark.createDataFrame([(f"{prefix}{i}",) for i in range(n)], "k string")


@pytest.mark.parametrize("n", [40, 1000])
def test_hll_estimate_within_envelope(spark, n):
    regs = sk.hll_registers(_keys(spark, n), "k")
    est = sk.hll_estimate(regs).first()
    # standard error for m=256 is ~1.04/sqrt(256) = 6.5%; allow 4 sigma
    assert abs(est.estimate - n) / n < 0.26


def test_hll_registers_match_python_md5(spark):
    df = _keys(spark, 50)
    got = {(r.reg, r.rho) for r in sk.hll_registers(df, "k").collect()}
    regs = {}
    for i in range(50):
        h = hashlib.md5(f"k{i}:hll".encode()).hexdigest()
        reg = int(h[:2], 16)
        tail = h[2:18]
        bits = bin(int(tail, 16))[2:].zfill(64)
        rho = len(bits) - len(bits.lstrip("0")) + 1
        regs[reg] = max(regs.get(reg, 0), rho)
    assert got == set(regs.items())


def test_hll_merge_equals_global(spark):
    a, b = _keys(spark, 300, "a"), _keys(spark, 300, "b")
    both = a.unionByName(b)
    merged = sk.hll_merge(
        sk.hll_registers(a, "k"), sk.hll_registers(b, "k")
    )
    g = {(r.reg, r.rho) for r in sk.hll_registers(both, "k").collect()}
    m = {(r.reg, r.rho) for r in merged.collect()}
    assert g == m
    # overlapping inputs merge idempotently (a union a == a)
    dup = sk.hll_merge(sk.hll_registers(a, "k"), sk.hll_registers(a, "k"))
    assert {(r.reg, r.rho) for r in dup.collect()} == {
        (r.reg, r.rho) for r in sk.hll_registers(a, "k").collect()
    }


def test_hll_rejects_bad_precision(spark):
    with pytest.raises(ValueError):
        sk.hll_registers(_keys(spark, 5), "k", p=10)  # not a hex multiple


def test_cms_never_undercounts_and_merges_by_addition(spark):
    rows = [(f"k{i % 7}",) for i in range(700)] + [("hot",)] * 300
    df = spark.createDataFrame(rows, "k string")
    sketch = sk.cms_sketch(df, "k", d=4, w=64)
    est = {r.key: r.est for r in
           sk.cms_point_estimates(sketch, ["hot", "k0", "absent"], d=4, w=64).collect()}
    assert est["hot"] >= 300
    assert est["k0"] >= 100
    # collision noise is bounded: n/w per row, min over 4 rows stays sane
    assert est["hot"] <= 300 + 1000
    # merge = counter addition: sketch(a) + sketch(a) doubles every estimate
    doubled = sk.cms_merge(sketch, sketch)
    est2 = {r.key: r.est for r in
            sk.cms_point_estimates(doubled, ["hot"], d=4, w=64).collect()}
    assert est2["hot"] == 2 * est["hot"]


def test_cms_rejects_bad_shape(spark):
    df = spark.createDataFrame([("a",)], "k string")
    with pytest.raises(ValueError):
        sk.cms_sketch(df, "k", d=0)


def test_dds_quantiles_within_relative_error(spark):
    import numpy as np

    vals = np.random.RandomState(7).lognormal(2.0, 1.0, 5000).tolist()
    df = spark.createDataFrame([(float(v),) for v in vals], "value double")
    sketch = sk.dds_sketch(df, "value", alpha=0.02)
    out = {r.q: r.est for r in
           sk.dds_quantiles(sketch, [0.5, 0.9, 0.99], alpha=0.02).collect()}
    s = sorted(vals)
    for q, est in out.items():
        exact = s[min(len(s) - 1, max(0, -(-int(q * len(s)) // 1) - 1))]
        assert abs(est - exact) / exact <= 0.02 + 1e-9, (q, est, exact)


def test_dds_merge_equals_whole(spark):
    a = spark.createDataFrame([(float(i),) for i in range(1, 501)], "value double")
    b = spark.createDataFrame([(float(i),) for i in range(500, 1000)], "value double")
    both = a.unionByName(b)
    merged = sk.dds_merge(sk.dds_sketch(a, "value"), sk.dds_sketch(b, "value"))
    g = {(r.bucket, r.c) for r in sk.dds_sketch(both, "value").collect()}
    m = {(r.bucket, r.c) for r in merged.collect()}
    assert g == m


def test_dds_rejects_bad_alpha(spark):
    df = spark.createDataFrame([(1.0,)], "value double")
    with pytest.raises(ValueError):
        sk.dds_sketch(df, "value", alpha=1.5)


def test_hll_registers_stream_equals_batch(spark, tables, tmp_path):
    # the sketch aggregate is streaming-compatible: the same register
    # expressions over readStream (complete mode, AvailableNow) must land
    # on exactly the batch register table — continuous distinct-count
    # monitoring from the identical code path
    events = tables["events"]
    src = str(tmp_path / "ev_hll_src")
    events.write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    reg, rho = sk._register_exprs("user_id", 8, "hll")
    agg = (
        stream.select(reg.alias("reg"), rho.alias("__r"))
        .groupBy("reg")
        .agg(F.max("__r").cast("long").alias("rho"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("hll_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.reg, r.rho) for r in spark.table("hll_sink").collect()}
    want = {(r.reg, r.rho) for r in sk.hll_registers(events, "user_id").collect()}
    assert got == want and len(got) > 0


def test_dds_rejects_negative_values_at_execution(spark):
    df = spark.createDataFrame([(1.0,), (-2.0,)], "value double")
    with pytest.raises(Exception, match="non-negative"):
        sk.dds_sketch(df, "value").collect()


def test_cms_sketch_stream_equals_batch(spark, tables, tmp_path):
    # count-min is an additive aggregate, so the identical expression over
    # readStream (complete mode) must land on the batch counter table
    events = tables["events"]
    src = str(tmp_path / "ev_cms_src")
    events.write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    buckets = F.array(*[sk._cms_bucket("user_id", r, 256, "cms") for r in range(4)])
    agg = (
        stream.select(F.posexplode(buckets).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count("*").cast("long").alias("c"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("cms_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {(r.row, r.bucket, r.c) for r in spark.table("cms_sink").collect()}
    want = {(r.row, r.bucket, r.c)
            for r in sk.cms_sketch(events, "user_id", d=4, w=256).collect()}
    assert got == want and len(got) > 0


def test_bloom_merge_law_and_no_false_negatives(spark):
    from ophidia_server_spark.functions import sketches as sk

    a = spark.range(0, 500).select(F.col("id").alias("k"))
    b = spark.range(500, 1000).select(F.col("id").alias("k"))
    both = a.unionByName(b)
    # merge law: bloom(A union B) == bloom(A) | bloom(B)
    direct = {r.pos for r in sk.bloom_bits(both, "k").collect()}
    merged = {
        r.pos
        for r in sk.bloom_merge(
            sk.bloom_bits(a, "k"), sk.bloom_bits(b, "k")
        ).collect()
    }
    assert direct == merged
    # no false negatives: every true member reads might_contain = 1
    bits = sk.bloom_bits(both, "k")
    verdicts = sk.bloom_contains(bits, both, "k")
    assert verdicts.filter(F.col("might_contain") == 0).count() == 0


def test_bloom_false_positive_rate_within_bound(spark):
    from ophidia_server_spark.functions import sketches as sk

    members = spark.range(0, 1000).select(F.col("id").alias("k"))
    bits = sk.bloom_bits(members, "k", m_bits=8192, k=4)
    non = spark.range(1_000_000, 1_002_000).select(F.col("id").alias("k"))
    fp = (
        sk.bloom_contains(bits, non, "k", m_bits=8192, k=4)
        .filter(F.col("might_contain") == 1)
        .count()
    )
    # theoretical fpr (1 - e^{-kn/m})^k ~ 0.024 at n=1000,m=8192,k=4;
    # allow generous slack over 2000 trials
    assert fp / 2000 < 0.06


def test_bloom_prejoin_filter_is_lossless_superset(spark):
    from ophidia_server_spark.functions import sketches as sk

    fact = spark.range(0, 20_000).select(
        (F.col("id") % 4000).alias("k"), F.col("id").alias("v")
    )
    dim = spark.range(0, 4000, 13).select(F.col("id").alias("k"))
    bits = sk.bloom_bits(dim, "k")
    pruned = sk.bloom_prejoin_filter(fact, bits, "k")
    # superset of the true join rows, and exact after the real join
    exact = fact.join(dim, "k")
    assert pruned.count() >= exact.count()
    assert pruned.join(dim, "k").count() == exact.count()
    # pruning actually prunes at this density
    assert pruned.count() < fact.count()


def test_bloom_bits_stream_equals_batch(spark, tables, tmp_path):
    # set-bit positions are a distinct aggregate, so the identical
    # expression over readStream (complete mode) must land on the batch
    # bit table — the continuous-filter-building shape
    from ophidia_server_spark.functions import sketches as sk

    events = tables["events"]
    src = str(tmp_path / "ev_bloom_src")
    events.write.parquet(src)
    schema = spark.read.parquet(src).schema
    stream = spark.readStream.schema(schema).parquet(src)
    pos = F.explode(
        F.array(*sk._bloom_positions(F.col("user_id"), 8192, 4, "bloom"))
    )
    agg = stream.select(pos.alias("pos")).groupBy("pos").agg(
        F.count("*").alias("__n")
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("bloom_sink")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {r.pos for r in spark.table("bloom_sink").collect()}
    want = {r.pos for r in sk.bloom_bits(events, "user_id").collect()}
    assert got == want and len(got) > 0


def test_hll_intersect_inclusion_exclusion_envelope(spark):
    # two overlapping key sets: the inclusion-exclusion intersection
    # estimate must land within the union of the three sketches' error
    # envelopes of the true overlap
    from ophidia_server_spark.functions import sketches as sk

    a = spark.range(0, 3000).select(F.col("id").alias("k"), F.lit("a").alias("s"))
    b = spark.range(2000, 6000).select(F.col("id").alias("k"), F.lit("b").alias("s"))
    df = a.unionByName(b)
    rep = sk.hll_intersect_report(df, "k", F.col("s"), "a", "b", p=8).first()
    assert rep.n_exact_intersect == 1000
    # ~6.5% stderr at p=8 per sketch; inclusion-exclusion compounds the
    # absolute errors of |A|, |B|, |A u B|, so allow their sum
    slack = 0.065 * (3000 + 4000 + 5000)
    assert abs(rep.est_intersect - 1000) <= slack, rep
    # deterministic md5 draws: this particular one lands ~20% high on the
    # union (3 sigma at p=8's 6.5% stderr), so bound each at 25%
    assert abs(rep.est_a - 3000) / 3000 < 0.25
    assert abs(rep.est_b - 4000) / 4000 < 0.25
    assert abs(rep.est_union - 5000) / 5000 < 0.25


def test_cms_join_cardinality_never_undercounts(spark):
    from ophidia_server_spark.functions import sketches as sk

    a = spark.createDataFrame([(i % 7,) for i in range(200)], "k string")
    b = spark.createDataFrame([(i % 5,) for i in range(150)], "k string")
    exact = a.join(b, "k").count()
    ska = sk.cms_sketch(a, "k", d=4, w=256, salt="jt")
    skb = sk.cms_sketch(b, "k", d=4, w=256, salt="jt")
    est = sk.cms_join_cardinality(ska, skb).first()["est_join_rows"]
    assert est >= exact
    # wide sketch on few distinct keys: collisions vanish, estimate is exact
    ska2 = sk.cms_sketch(a, "k", d=4, w=4096, salt="jt")
    skb2 = sk.cms_sketch(b, "k", d=4, w=4096, salt="jt")
    est2 = sk.cms_join_cardinality(ska2, skb2).first()["est_join_rows"]
    assert est2 == exact


def test_cms_join_cardinality_respects_merge_law(spark):
    from ophidia_server_spark.functions import sketches as sk

    a1 = spark.createDataFrame([(i % 3,) for i in range(60)], "k string")
    a2 = spark.createDataFrame([(i % 4,) for i in range(80)], "k string")
    b = spark.createDataFrame([(i % 3,) for i in range(50)], "k string")
    merged = sk.cms_merge(
        sk.cms_sketch(a1, "k", d=4, w=512, salt="jm"),
        sk.cms_sketch(a2, "k", d=4, w=512, salt="jm"),
    )
    whole = sk.cms_sketch(a1.unionByName(a2), "k", d=4, w=512, salt="jm")
    skb = sk.cms_sketch(b, "k", d=4, w=512, salt="jm")
    em = sk.cms_join_cardinality(merged, skb).first()["est_join_rows"]
    ew = sk.cms_join_cardinality(whole, skb).first()["est_join_rows"]
    assert em == ew


def test_dds_by_group_matches_per_group_global_sketch(spark, tables):
    from ophidia_server_spark.functions import sketches as sk

    ev = tables["events"]
    by = sk.dds_quantiles_by(
        sk.dds_sketch_by(ev, "value", "event_type"), [0.5, 0.99]
    )
    got = {(r["split"], r["q"]): r["est"] for r in by.collect()}
    for t in [r["event_type"] for r in ev.select("event_type").distinct().collect()]:
        solo = sk.dds_quantiles(
            sk.dds_sketch(ev.filter(F.col("event_type") == t), "value"),
            [0.5, 0.99],
        )
        for r in solo.collect():
            assert got[(t, r["q"])] == r["est"], (t, r["q"])


def test_dds_by_group_merge_law(spark, tables):
    from ophidia_server_spark.functions import sketches as sk

    ev = tables["events"]
    a = sk.dds_sketch_by(ev.filter("event_id % 2 = 0"), "value", "event_type")
    b = sk.dds_sketch_by(ev.filter("event_id % 2 = 1"), "value", "event_type")
    merged = (
        a.unionByName(b).groupBy("split", "bucket")
        .agg(F.sum("c").cast("long").alias("c"))
    )
    whole = sk.dds_sketch_by(ev, "value", "event_type")
    assert {tuple(r) for r in merged.collect()} == {tuple(r) for r in whole.collect()}


def test_winsorize_by_group_clamps_into_band(spark, tables):
    from ophidia_server_spark.functions import sketches as sk

    ev = tables["events"]
    out = sk.winsorize_by_group(ev, "value", "event_type", 0.05, 0.95)
    assert out.count() == ev.count()
    rows = out.collect()
    # per group: clipped values span a narrower range than raw, flags match
    by_grp = {}
    for r in rows:
        by_grp.setdefault(r["event_type"], []).append(r)
    for grp, rs in by_grp.items():
        clipped = [r["clipped"] for r in rs]
        raw = [r["value"] for r in rs]
        assert min(clipped) >= min(raw) and max(clipped) <= max(raw)
        for r in rs:
            if r["was_clipped"]:
                assert r["clipped"] != r["value"]
            else:
                assert abs(r["clipped"] - r["value"]) < 1e-9
    flagged = sum(r["was_clipped"] for r in rows)
    assert 0 < flagged < len(rows)  # p05/p95 band clips the tails only


def test_rolling_wau_equals_windowed_exact_merge(spark, tables):
    import datetime as dt

    from ophidia_server_spark.functions import sketches as sk

    ev = tables["events"]
    rolled = {r["day"]: r["estimate"] for r in
              sk.hll_rolling_distinct(ev, "user_id", days=7).collect()}
    # law: each day's rolling estimate equals the plain HLL estimate over
    # the trailing 7 days' raw events (merge-of-days == sketch-of-union)
    days = sorted(rolled)
    for day in (days[0], days[len(days) // 2], days[-1]):
        d = dt.date.fromisoformat(day)
        lo = d - dt.timedelta(days=6)
        window_events = ev.filter(
            (F.to_date("ts") >= F.lit(lo)) & (F.to_date("ts") <= F.lit(d))
        )
        direct = sk.hll_estimate(
            sk.hll_registers(window_events, "user_id")
        ).first()["estimate"]
        assert rolled[day] == direct, (day, rolled[day], direct)
