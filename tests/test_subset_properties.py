"""Property-based checks (hypothesis) for the subset algebra: the parser, the
SQL rendering, and the Column predicate must agree on membership for any
generated subset string — the same three-way consistency the reference's
golden suite asserts case-by-case (oph_server_test.c oph_filters suite)."""

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from ophidia_server_spark.subset import parse_subset, subset_sql

MAX_IDX = 40


def _member(clauses, x):
    return any(
        c.start <= x <= c.end and (x - c.start) % c.stride == 0 for c in clauses
    )


clause_st = st.one_of(
    st.integers(1, MAX_IDX).map(str),                                   # single
    st.tuples(st.integers(1, MAX_IDX), st.integers(0, 10)).map(
        lambda t: f"{t[0]}:{t[0] + t[1]}"
    ),                                                                  # start:end
    st.tuples(st.integers(1, MAX_IDX), st.integers(1, 5), st.integers(0, 10)).map(
        lambda t: f"{t[0]}:{t[1]}:{t[0] + t[2]}"
    ),                                                                  # s:st:e
)
subset_st = st.lists(clause_st, min_size=1, max_size=4).map(",".join)


@settings(max_examples=200, deadline=None)
@given(subset_st)
def test_sql_rendering_matches_python_membership(ss):
    clauses = [c.resolved(MAX_IDX) for c in parse_subset(ss)]
    sql = subset_sql("x", ss, max_index=MAX_IDX)
    got = {
        r[0]
        for r in duckdb.sql(
            f"SELECT x FROM range(1, {MAX_IDX + 1}) t(x) WHERE {sql}"
        ).fetchall()
    }
    want = {x for x in range(1, MAX_IDX + 1) if _member(clauses, x)}
    assert got == want


@settings(max_examples=50, deadline=None)
@given(subset_st, st.integers(0, 3))
def test_offset_widening_is_superset(ss, off):
    base = subset_sql("x", ss, max_index=MAX_IDX)
    wide = subset_sql("x", ss, max_index=MAX_IDX, offset=off)
    q = (
        f"SELECT count(*) FROM range(1, {MAX_IDX + 1}) t(x) "
        f"WHERE ({base}) AND NOT ({wide})"
    )
    # everything matched without offset stays matched with it
    assert duckdb.sql(q).fetchone()[0] == 0


def test_parse_rejects_bad_strings():
    for bad in ("", "1::", "a:b", "1:0:5", "end:3", "1,,2"):
        with pytest.raises(ValueError):
            parse_subset(bad)


# -- massive-filter grammar robustness (hypothesis) ---------------------------

filter_key_st = st.sampled_from(
    ["level", "measure", "container", "cube_filter", "path", "metadata_key", "anyfree"]
)
filter_val_st = st.text(
    alphabet="abcdefghij0123456789:_/", min_size=1, max_size=12
).filter(lambda s: s.strip(":") != "")


@settings(max_examples=150, deadline=None)
@given(st.lists(st.tuples(filter_key_st, filter_val_st), min_size=1, max_size=4))
def test_parse_massive_never_crashes(pairs):
    from ophidia_server_spark.filters import parse_massive

    arg = "[" + ";".join(f"{k}={v}" for k, v in pairs) + "]"
    groups, pids = parse_massive(arg)
    assert len(groups) == 1 and pids == []
    # every key survives parsing (last value wins on duplicates)
    assert set(groups[0]).issubset({k for k, _ in pairs})


@settings(max_examples=100, deadline=None)
@given(filter_val_st)
def test_parse_massive_bare_value_is_cube_filter(v):
    from ophidia_server_spark.filters import parse_massive

    groups, _ = parse_massive(f"[{v}]")
    assert groups == [{"cube_filter": v}]
