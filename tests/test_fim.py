"""fim_split (pipeline/packing.py): deterministic fill-in-the-middle cuts."""

import pytest

from ophidia_server_spark.pipeline.packing import fim_split


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_split_partitions_the_token_stream(spark):
    rows = [(i, " ".join(f"t{i}_{j}" for j in range(10 + i))) for i in range(6)]
    out = {r.doc_id: r for r in fim_split(_df(spark, rows)).collect()}
    for i, text in rows:
        toks = text.split()
        r = out[i]
        assert r.fim and r.n_tokens == len(toks)
        rebuilt = (r.prefix.split() if r.prefix else []) \
            + r.middle.split() + (r.suffix.split() if r.suffix else [])
        assert rebuilt == toks, f"doc {i} not a partition"
        assert len(r.middle.split()) == max(1, int(len(toks) * 0.3))


def test_short_docs_pass_through_whole(spark):
    out = fim_split(_df(spark, [(1, "a b c")])).collect()[0]
    assert (out.fim, out.prefix, out.middle, out.suffix) == \
        (False, "a b c", "", "")
    assert out.n_tokens == 3


def test_deterministic_and_salt_sensitive(spark):
    rows = [(i, " ".join(f"w{j}" for j in range(40))) for i in range(30)]
    df = _df(spark, rows)
    a = {r.doc_id: r.middle for r in fim_split(df).collect()}
    b = {r.doc_id: r.middle for r in fim_split(df).collect()}
    assert a == b
    c = {r.doc_id: r.middle for r in fim_split(df, salt="fim2").collect()}
    assert any(a[k] != c[k] for k in a), "salt did not move any cut"


def test_middle_frac_and_validation(spark):
    df = _df(spark, [(1, " ".join(f"w{j}" for j in range(20)))])
    r = fim_split(df, middle_frac=0.5).collect()[0]
    assert len(r.middle.split()) == 10
    with pytest.raises(ValueError, match="middle_frac"):
        fim_split(df, middle_frac=1.0)
    with pytest.raises(ValueError, match="min_tokens"):
        fim_split(df, min_tokens=1)
