"""Data-quality audit rules: per-kind violation semantics, null handling
(only not_null counts nulls — other rules skip them), and the
single-aggregate shape."""

import pytest

from ophidia_server_spark.pipeline import audit as aud


def _df(spark):
    rows = [
        (1, "hello world", "en", "web", 11),
        (2, None, "en", "web", 0),            # null text
        (3, "short", "xx", "Web_1", 5),       # bad lang, bad source, short
        (4, "another document here", "de", "books", 21),
        (4, "dup id", "fr", "web", 6),        # duplicate doc_id, short
        (5, "fine text content", None, None, 200000),  # nulls skip rules; n_chars high
    ]
    return spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )


RULES = [
    ("text_not_null", "not_null", {"col": "text"}),
    ("chars_range", "in_range", {"col": "n_chars", "lo": 1, "hi": 100000}),
    ("lang_set", "in_set", {"col": "lang", "values": ["en", "de", "fr"]}),
    ("source_shape", "matches", {"col": "source", "pattern": "^[a-z_]+$"}),
    ("text_min_len", "min_length", {"col": "text", "n": 10}),
    ("doc_id_unique", "unique", {"col": "doc_id"}),
]


def test_rule_violation_counts(spark):
    out = {r.rule: r for r in aud.corpus_audit(_df(spark), RULES).collect()}
    assert out["text_not_null"].n_violations == 1          # row 2
    assert out["chars_range"].n_violations == 2            # rows 2 (0) and 6 (200000)
    assert out["lang_set"].n_violations == 1               # row 3; row 6's NULL skips
    assert out["source_shape"].n_violations == 1           # row 3; NULL skips
    assert out["text_min_len"].n_violations == 2           # rows 3 and 5
    assert out["doc_id_unique"].n_violations == 1          # one duplicated id
    assert all(r.n_rows == 6 for r in out.values())
    # strict threshold: everything with violations fails
    assert all(r.passed == 0 for r in out.values())


def test_threshold_and_validation(spark):
    out = {r.rule: r.passed for r in
           aud.corpus_audit(_df(spark), RULES, max_violation_frac=0.5).collect()}
    assert all(v == 1 for v in out.values())   # 2/6 max frac clears 0.5
    with pytest.raises(ValueError, match="unknown audit rule"):
        aud.corpus_audit(_df(spark), [("x", "nope", {"col": "text"})]).collect()
    with pytest.raises(ValueError, match="at least one"):
        aud.corpus_audit(_df(spark), [])
    with pytest.raises(ValueError, match="unique"):
        aud.corpus_audit(_df(spark), [RULES[0], RULES[0]])


def test_drift_psi_zero_for_identical_batches(spark, tables):
    from ophidia_server_spark.pipeline.audit import drift_report

    ev = tables["events"]
    out = drift_report(ev, ev, "value").collect()
    assert len(out) == 10
    assert all(abs(r["psi"]) < 1e-9 for r in out)
    assert all(r["ref_rate"] == r["new_rate"] for r in out)


def test_drift_psi_detects_a_shift(spark):
    from pyspark.sql import functions as F

    from ophidia_server_spark.pipeline.audit import drift_report

    ref = spark.range(1000).select((F.col("id") % 100).cast("double").alias("v"))
    shifted = ref.select((F.col("v") + 80.0).alias("v"))  # clamps into top bucket
    out = drift_report(ref, shifted, "v")
    psi = out.first()["psi"]
    assert psi > 0.25  # "action" territory for a gross shift
    # out-of-range values land in the edge bucket, not nowhere
    rates = {r["bucket"]: r["new_rate"] for r in out.collect()}
    assert rates[9] > 0.5


def test_drift_psi_empty_reference_raises(spark, tables):
    import pytest as _pytest

    from ophidia_server_spark.pipeline.audit import drift_report

    ev = tables["events"]
    with _pytest.raises(ValueError):
        drift_report(ev.filter("1=0"), ev, "value")


def test_benford_digits_counts_and_chi2(spark):
    import math

    from ophidia_server_spark.pipeline.audit import benford_digits

    # first digits: 1 x3, 2 x2, 9 x1; zero row is dropped
    vals = [1.23, 12.0, 0.19, 2.5, 0.02, 900.0, 0.0]
    df = spark.createDataFrame([(v,) for v in vals], "v double")
    rows = {r["digit"]: r for r in benford_digits(df, "v").collect()}
    # all nine digits ALWAYS report — absent ones with n=0 still owe
    # their (0 - N*e)^2/(N*e) chi-square term
    assert set(rows) == {str(d) for d in range(1, 10)}
    assert rows["1"]["n"] == 3 and rows["1"]["frac"] == 0.5
    assert rows["2"]["n"] == 2 and rows["9"]["n"] == 1
    assert rows["3"]["n"] == 0 and rows["3"]["frac"] == 0.0
    assert rows["1"]["expected_frac"] == round(math.log10(2), 6)
    # chi2 recomputed by hand over ALL nine digit cells
    n, tot = {str(d): 0 for d in range(1, 10)}, 6
    n.update({"1": 3, "2": 2, "9": 1})
    chi2 = sum(
        round(
            (c - tot * math.log10(1 + 1 / int(d))) ** 2
            / (tot * math.log10(1 + 1 / int(d))) * 1e6
        )
        for d, c in n.items()
    ) / 1e6
    assert rows["1"]["chi2"] == round(chi2, 6)
    assert rows["1"]["chi2"] == rows["9"]["chi2"]


def test_abc_classification_hand_ranked(spark):
    from ophidia_server_spark.pipeline.audit import abc_classification

    # totals: a=70, b=20, c=6, d=4 (grand 100)
    rows = [("a", 40.0), ("a", 30.0), ("b", 20.0), ("c", 6.0), ("d", 4.0)]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {r["key"]: r for r in abc_classification(df, "k", "v").collect()}
    assert got["a"]["abc_class"] == "A" and got["a"]["cum_share"] == 0.7
    assert got["b"]["abc_class"] == "B" and got["b"]["cum_share"] == 0.9
    assert got["c"]["abc_class"] == "C" and got["c"]["cum_share"] == 0.96
    assert got["d"]["abc_class"] == "C" and got["d"]["share"] == 0.04


def test_gini_extremes(spark):
    from ophidia_server_spark.pipeline.audit import gini_coefficient

    # perfect equality -> 0
    eq = spark.createDataFrame(
        [(k, 10.0) for k in "abcd"], "k string, v double"
    )
    assert gini_coefficient(eq, "k", "v").first()["gini"] == 0.0
    # total concentration on one of n keys -> (n-1)/n
    conc = spark.createDataFrame(
        [("a", 0.0), ("b", 0.0), ("c", 0.0), ("d", 100.0)],
        "k string, v double",
    )
    r = gini_coefficient(conc, "k", "v").first()
    assert r["gini"] == round(3 / 4, 6) and r["n_keys"] == 4


def test_poisson_bootstrap_ci_brackets_mean_and_is_deterministic(spark):
    from ophidia_server_spark.pipeline.audit import poisson_bootstrap_ci

    df = spark.createDataFrame(
        [(i, float(10 + (i % 5))) for i in range(200)], "id long, v double"
    )
    r1 = poisson_bootstrap_ci(df, "v", "id", b=64).first()
    r2 = poisson_bootstrap_ci(df, "v", "id", b=64).first()
    assert r1 == r2  # content-addressed coins: exact rerun stability
    assert r1["n_rows"] == 200 and r1["n_replicates"] == 64
    assert r1["ci_lo"] <= r1["mean"] <= r1["ci_hi"]
    # the band is tight around 12 for this low-variance fixture
    assert 11.0 < r1["ci_lo"] and r1["ci_hi"] < 13.0
    # a different salt moves the replicate draws but not the mean
    r3 = poisson_bootstrap_ci(df, "v", "id", b=64, salt="other").first()
    assert r3["mean"] == r1["mean"]
    assert (r3["ci_lo"], r3["ci_hi"]) != (r1["ci_lo"], r1["ci_hi"])


def test_fd_check_holds_and_violations(spark):
    from ophidia_server_spark.pipeline.audit import fd_check

    df = spark.createDataFrame(
        [(1, "a"), (1, "a"), (2, "b"), (2, "c"), (3, "d")],
        "k long, v string",
    )
    r = fd_check(df, "k", "v").first()
    assert r["n_keys"] == 3 and r["n_violating"] == 1
    assert r["max_dep_per_key"] == 2 and r["holds"] == 0
    ok = fd_check(df.filter("k != 2"), "k", "v").first()
    assert ok["holds"] == 1 and ok["n_violating"] == 0


def test_source_scorecard_hand_built_sources(spark):
    from ophidia_server_spark.pipeline.audit import source_scorecard

    good = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
            "the a of and to in is it more words here now")
    rows = [
        (1, "s1", good),
        (2, "s1", good),            # exact dup of 1
        (3, "s1", "mojibake Ã" + " x" * 20),
        (4, "s2", "unique text " + "y z " * 10),
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["source"]: r for r in source_scorecard(df).collect()}
    s1 = got["s1"]
    assert s1["n_docs"] == 3
    assert s1["dup_frac"] == round(2 / 3, 6)
    assert s1["suspect_frac"] == round(1 / 3, 6)
    s2 = got["s2"]
    assert s2["n_docs"] == 1 and s2["dup_frac"] == 0.0
    assert s2["suspect_frac"] == 0.0
    assert s2["avg_tokens"] == 22.0  # "unique text" + 20 y/z tokens


def test_source_overlap_counts_shared_texts(spark):
    from ophidia_server_spark.pipeline.audit import source_overlap

    rows = [
        ("s1", "shared one"), ("s2", "shared one"),
        ("s1", "shared two"), ("s2", "shared two"), ("s3", "shared two"),
        ("s1", "only in s1"),
        ("s2", "shared one"),  # duplicate within s2: counts once
    ]
    df = spark.createDataFrame(rows, "source string, text string")
    got = {(r["source_a"], r["source_b"]): r["n_shared_texts"]
           for r in source_overlap(df).collect()}
    assert got[("s1", "s2")] == 2
    assert got[("s1", "s3")] == 1 and got[("s2", "s3")] == 1
    assert len(got) == 3


def test_price_volume_mix_identity_and_effects(spark):
    from ophidia_server_spark.pipeline.audit import price_volume_mix

    rows = [
        # part A: 10 @ 2.0 -> 20 @ 3.0 (volume +10*2=20, price +1*20=20)
        ("A", 0, 10.0, 20.0), ("A", 1, 20.0, 60.0),
        # part B: only period 0 (pure negative volume effect at p0)
        ("B", 0, 5.0, 50.0),
        # part C: only period 1 (pure positive volume effect at p1)
        ("C", 1, 4.0, 12.0),
    ]
    df = spark.createDataFrame(rows, "k string, p int, q double, r double")
    got = {r["key"]: r for r in price_volume_mix(df, "k", "p", "q", "r").collect()}
    a = got["A"]
    assert a["volume_effect"] == 20.0 and a["price_effect"] == 20.0
    assert a["delta"] == 40.0
    b = got["B"]
    assert b["volume_effect"] == -50.0 and b["price_effect"] == 0.0
    c = got["C"]
    assert c["volume_effect"] == 12.0 and c["price_effect"] == 0.0
    # the bridge closes exactly for every key (residual 0 here)
    for r in got.values():
        assert r["residual"] == 0.0
        assert abs(r["volume_effect"] + r["price_effect"] - r["delta"]) < 1e-6
    # degenerate: contra-revenue with zero quantity -> residual carries it
    deg = spark.createDataFrame(
        [("D", 0, 0.0, 50.0), ("D", 1, 10.0, 100.0)],
        "k string, p int, q double, r double",
    )
    rd = price_volume_mix(deg, "k", "p", "q", "r").first()
    assert rd["delta"] == 50.0
    assert abs(
        rd["volume_effect"] + rd["price_effect"] + rd["residual"] - 50.0
    ) < 1e-6
    assert rd["residual"] != 0.0  # the unattributable slice is explicit


def test_fulfillment_lag_hand_computed(spark):
    import datetime as dt

    from pyspark.sql import functions as F

    from ophidia_server_spark.pipeline.audit import fulfillment_lag

    d = dt.date
    orders = spark.createDataFrame(
        [(1, d(2024, 1, 5)), (2, d(2024, 1, 20))], "ok long, od date"
    )
    lines = spark.createDataFrame(
        [(1, d(2024, 1, 15)), (1, d(2024, 5, 1)), (2, d(2024, 1, 25))],
        "lk long, sd date",
    )
    out = fulfillment_lag(
        lines, orders, "lk", "ok", "od", "sd",
        F.lit("all"), sla_days=90,
    ).first()
    # lags: 10, 117, 5 -> mean 44, max 117, breach 1/3
    assert out["n_lines"] == 3
    assert out["mean_lag_days"] == round(132 / 3, 6)
    assert out["max_lag_days"] == 117
    assert out["sla_breach_frac"] == round(1 / 3, 6)


def test_k_anonymity_flags_small_classes(spark):
    import pytest as _pytest

    from ophidia_server_spark.pipeline.audit import k_anonymity

    rows = (
        [("us", "a")] * 6 + [("us", "b")] * 2 + [("de", "a")] * 5
        + [("de", "c")]
    )
    df = spark.createDataFrame(rows, "country string, seg string")
    got = {
        (r["country"], r["seg"]): (r["n"], r["at_risk"])
        for r in k_anonymity(df, ["country", "seg"], k=5).collect()
    }
    assert got == {
        ("us", "a"): (6, 0), ("us", "b"): (2, 1),
        ("de", "a"): (5, 0), ("de", "c"): (1, 1),
    }
    with _pytest.raises(ValueError):
        k_anonymity(df, [], k=5)
    with _pytest.raises(ValueError):
        k_anonymity(df, ["country"], k=1)


def test_l_diversity_homogeneity_attack(spark):
    import pytest as _pytest

    from ophidia_server_spark.pipeline.audit import l_diversity

    rows = (
        [("us", "cancer")] * 5            # k-anonymous but homogeneous
        + [("de", "flu"), ("de", "cold"), ("de", "flu")]
        + [("fr", None), ("fr", None)]    # NULL is itself a value
    )
    df = spark.createDataFrame(rows, "country string, dx string")
    got = {r["country"]: (r["n"], r["n_sensitive"], r["at_risk"])
           for r in l_diversity(df, ["country"], "dx", l=2).collect()}
    assert got["us"] == (5, 1, 1)   # big class, one value -> at risk
    assert got["de"] == (3, 2, 0)
    assert got["fr"] == (2, 1, 1)   # all-NULL is homogeneous too
    with _pytest.raises(ValueError):
        l_diversity(df, ["country"], "dx", l=1)


def test_l_diversity_sentinel_collision(spark):
    from ophidia_server_spark.pipeline.audit import l_diversity

    # NULL and the literal string '__null__' are DIFFERENT disclosures —
    # a string sentinel would merge them (review finding, round 9)
    rows = [("g", None), ("g", "__null__"), ("h", None), ("h", None)]
    df = spark.createDataFrame(rows, "country string, dx string")
    got = {r["country"]: (r["n_sensitive"], r["at_risk"])
           for r in l_diversity(df, ["country"], "dx", l=2).collect()}
    assert got["g"] == (2, 0)
    assert got["h"] == (1, 1)
