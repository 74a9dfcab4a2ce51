"""Cube operator semantics on a tiny hand-built cube (golden expectations)."""

import pytest
from pyspark.sql import functions as F

from ophidia_server_spark.cube import build_cube
from ophidia_server_spark.functions import primitives as prim
from ophidia_server_spark.operators import cube_ops as C


@pytest.fixture(scope="module")
def small(spark):
    rows = [
        # (g, t, v)
        ("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 3.0),
        ("b", 1, 10.0), ("b", 3, 30.0),
    ]
    df = spark.createDataFrame(rows, "g string, t int, v double")
    return build_cube(df, ["g"], "t", F.col("v"), measure="v")


def as_map(df, *cols):
    return {tuple(r[c] for c in cols[:-1]): r[cols[-1]] for r in df.collect()}


def test_build_packs_sorted(small):
    rows = {r.g: (list(r["__dim"]), list(r["__m"])) for r in small.df.collect()}
    assert rows["a"] == ([1, 2, 3], [1.0, 2.0, 3.0])
    assert rows["b"] == ([1, 3], [10.0, 30.0])


def test_reduce_ops(small):
    assert as_map(C.oph_reduce(small, "sum", "s"), "g", "s") == {("a",): 6.0, ("b",): 40.0}
    assert as_map(C.oph_reduce(small, "max", "s"), "g", "s") == {("a",): 3.0, ("b",): 30.0}
    assert as_map(C.oph_reduce(small, "count", "s"), "g", "s") == {("a",): 3, ("b",): 2}


def test_subset_index_is_position(small):
    # positions 1,3 of each array — NOT coordinate values
    c = C.oph_subset(small, {"t": "1,3"}, "index")
    rows = {r.g: list(r["__m"]) for r in c.df.collect()}
    assert rows["a"] == [1.0, 3.0]
    assert rows["b"] == [10.0]  # only 2 elements: position 3 absent


def test_subset_coord_is_value(small):
    c = C.oph_subset(small, {"t": "3"}, "coord")
    rows = {r.g: list(r["__m"]) for r in c.df.collect()}
    assert rows == {"a": [3.0], "b": [30.0]}


def test_aggregate_elementwise_across_rows(small):
    a = C.oph_aggregate(small, "sum", ["g"])
    long = as_map(a.long(), "t", "v")
    assert long == {(1,): 11.0, (2,): 2.0, (3,): 33.0}


def test_drilldown_roundtrip(small):
    lf = small.long()
    assert lf.count() == 5
    assert set(lf.columns) == {"g", "t", "v"}


def test_rollup_packs_explicit(small):
    ru = C.oph_rollup(small, "g")
    assert ru.explicit_dims == ()
    row = ru.df.collect()[0]
    assert len(row["__m"]) == 5
    assert ru.implicit_dims == ("g", "t")


def test_intercube_zip(small):
    doubled = C.oph_apply(small, prim.scale(2.0), "v2")
    ic = C.oph_intercube(doubled, small, "sub", "d")
    vals = as_map(ic.long(), "g", "t", "d")
    assert vals == {("a", 1): 1.0, ("a", 2): 2.0, ("a", 3): 3.0, ("b", 1): 10.0, ("b", 3): 30.0}


def test_apply_moving_avg(small):
    ap = C.oph_apply(small, prim.moving_avg(2), "ma")
    vals = {(r.g, r.t): r.ma for r in ap.long().collect()}
    assert vals[("a", 1)] == 1.0
    assert vals[("a", 2)] == pytest.approx(1.5)
    assert vals[("a", 3)] == pytest.approx(2.5)


def test_permute_reorders(small):
    ru = C.oph_rollup(small, "g")
    pm = C.oph_permute(ru, ["t", "g"])
    first = pm.df.collect()[0]["__dim"][0]
    assert first["t"] == 1 and first["g"] == "a"
