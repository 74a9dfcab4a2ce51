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
