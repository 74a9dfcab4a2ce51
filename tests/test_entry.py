"""Driver-contract smoke: entry() runs on a plain session, queries() and
oracle_sql() stay consistent."""

import __spark_entry__ as entry


def test_entry_returns_rows(spark):
    df = entry.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert "sum_qty" in df.columns


def test_every_oracle_has_query():
    qs = entry.queries()
    os_ = entry.oracle_sql()
    missing = set(os_) - set(qs)
    assert not missing, f"oracles without queries: {missing}"


def test_inventory_size():
    # coverage floor: keep the declared surface from shrinking silently
    assert len(entry.queries()) >= 55
    assert len(entry.oracle_sql()) >= 50
