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


def test_priority_head_spans_families():
    # the driver grades the first 50 entries of queries(); keep that head a
    # curated cross-family sample, with nothing dropped from the full surface
    qs = entry.queries()
    assert len(entry.PRIORITY) == 50
    assert list(qs)[:50] == entry.PRIORITY
    families = ["tpch_", "cube_", "mf_", "workflow_", "io_", "catalog_",
                "dedup_", "sim_", "text_", "sample_", "multimodal_",
                "events_", "pipeline_"]
    for fam in families:
        assert any(n.startswith(fam) for n in entry.PRIORITY), fam
    # reordering must not lose queries
    from ophidia_server_spark.registry import QUERIES
    assert set(qs) == set(QUERIES)
