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


def test_bench_headline_and_priority_names_resolve():
    import importlib.util
    import os

    from ophidia_server_spark.registry import BENCH_VARIANTS, ORACLES, QUERIES

    spec = importlib.util.spec_from_file_location(
        "benchmod", os.path.join(os.path.dirname(__file__), "..", "bench.py")
    )
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)
    unknown = [n for n in bench.HEADLINE if n not in QUERIES]
    assert not unknown, f"bench HEADLINE names not in QUERIES: {unknown}"
    assert len(set(bench.HEADLINE)) == len(bench.HEADLINE), "duplicate rows"
    import __spark_entry__ as e

    bad = [n for n in e.PRIORITY if n not in QUERIES]
    assert not bad, f"PRIORITY names not in QUERIES: {bad}"
    # every bench variant shadows a real gate entry
    assert set(BENCH_VARIANTS) <= set(QUERIES)
    # the driver-graded head must be fully oracle-backed
    head = list(e.queries())[:50]
    assert all(n in ORACLES for n in head)
