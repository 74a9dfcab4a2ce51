"""Plan-regression guard for the headline queries.

PLANS.md records each query's executed-plan shape per round, but nothing
FAILED when a plan regressed — the funnel's O(k^2) scan blow-up shipped a
whole round before the audit caught it. These bars pin the flagship
queries' scan and shuffle counts at their recorded values (sf0.001, AQE
final plan, same counter as scripts/plan_audit.py): a refactor that adds
a rescan or an extra exchange fails here first. Bars are EXACT ceilings
from the committed PLANS.md; loosening one is a deliberate, reviewed act.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "scripts"),
)

from plan_audit import audit_plan  # noqa: E402

from ophidia_server_spark.registry import QUERIES  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR_SMALL", "/root/testdata/sf0.001")

# query -> (max scans, max shuffles); ceilings = the committed PLANS.md row
BARS = {
    "events_funnel_conversion": (3, 1),
    "tpch_q1_pricing_summary": (1, 1),
    "tpch_q9_product_profit": (6, 2),
    "pipeline_corpus_end_to_end": (5, 6),
    "pipeline_release_end_to_end": (4, 5),
    "dsir_logweights": (2, 3),
    "events_rolling_wau": (2, 4),
    "events_hll_sketch": (3, 4),
    "text_repeated_ngrams": (3, 4),
    # round-8 flagships, ceilings = the committed round-8 PLANS.md rows
    "events_percentile_rank": (2, 2),
    "events_percentile_rank_bucketed": (4, 4),
    "events_quantile_bins": (2, 2),
    "events_robust_scale": (2, 2),
    "events_drift_ks": (2, 1),
    "layout_snapshot_pruned_read": (1, 0),
    "layout_stream_append": (1, 1),
    "text_strip_markup": (1, 0),
    "multimodal_decode_jpeg": (1, 0),
    # round-8 second half: ceilings from the measured sf0.001 AQE plans
    # unique-set collapse + member expansion (round-8 sf1 fix)
    "dedup_jaccard_join": (10, 8),
    "dedup_containment_join": (9, 6),
    # +1 shuffle headroom: AQE sometimes BHJs the wedge-closure join and
    # sometimes exchanges it, depending on runtime stats of the prior run
    "graph_triangle_counts": (4, 6),
    "graph_item_similarity": (2, 5),
    "sim_int8_topk": (2, 1),
    "sim_random_project": (1, 0),
    "events_attribution_last_touch": (2, 2),
    # +1 shuffle: the deliberate fan-out repartition before the b-fold
    # explode (single-file inputs would otherwise run it on one core)
    "events_bootstrap_ci": (2, 2),
    "text_collocations": (3, 2),
    "text_chi2_by_source": (3, 3),
    # +1 scan: the stub-doc left join reads the batch id column once more
    # (the self-review fix that keeps sub-k-token docs in the report)
    "text_ngram_novelty": (3, 2),
    "orders_abc_classification": (1, 1),
    "events_transition_matrix": (1, 3),
    "events_forward_fill": (1, 1),
    "events_ewma_daily": (1, 2),
    "corpus_profile_documents": (8, 8),
    # round-8 final waves, ceilings from the measured sf0.001 AQE plans
    "events_did_estimate": (2, 2),
    "events_neyman_allocation": (1, 1),
    "events_cuped": (2, 3),
    "events_kaplan_meier": (1, 2),
    "events_attribution_position": (2, 2),
    "events_debounce": (1, 1),
    "parts_price_volume_mix": (1, 2),
    "sim_label_separation": (1, 2),
    "corpus_source_overlap": (2, 2),
    # round-9 wave: measured sf0.001 AQE plans (+shuffle headroom where an
    # AQE BHJ->SMJ flip would add exchanges)
    "sample_weighted_reservoir": (1, 0),   # TakeOrdered top-k: NO shuffle
    "audit_k_anonymity": (1, 1),
    "dedup_blocked_link": (2, 3),
    "multimodal_dhash_pairs": (2, 3),
    "text_template_prefixes": (2, 3),
    # one key-partitioned window pair over one scan (the analyze query's
    # returned frame is driver-built rows — nothing to bar there)
    "events_interpolate_linear": (1, 2),
    "sample_token_budget": (1, 2),
    "text_canonical_urls": (1, 0),   # pure map + explode: NO shuffle
    "audit_l_diversity": (1, 2),     # one distinct-aggregate (expand)
    # two ECDF tables + positions equi-join + map-back; no range join
    "events_quantile_normalize": (4, 8),
}


@pytest.mark.parametrize("name", sorted(BARS))
def test_flagship_plan_stays_at_its_bar(spark, name):
    df = QUERIES[name](spark, SF_DIR)
    df.collect()  # audit the AQE FINAL plan, not the initial guess
    m = audit_plan(df)
    max_scans, max_shuffles = BARS[name]
    assert m["scans"] <= max_scans, (
        f"{name}: {m['scans']} scans > recorded bar {max_scans} — "
        "a rescan crept into the plan (see PLANS.md)"
    )
    assert m["shuffles"] <= max_shuffles, (
        f"{name}: {m['shuffles']} shuffles > recorded bar {max_shuffles} — "
        "an extra exchange crept into the plan (see PLANS.md)"
    )


# -- audit_plan counting contract (the metrics the bars above rely on) -------

import pyspark.sql.functions as F  # noqa: E402


def test_reused_exchange_not_counted_as_shuffle(spark):
    # a self-join of one aggregate produces 1 real exchange + 1
    # ReusedExchange in the final plan; the old lookbehind regex matched
    # the ', Exchange hashpartitioning' embedded in the ReusedExchange
    # line and reported 2
    base = spark.range(10_000).select((F.col("id") % 100).alias("k"))
    agg = base.groupBy("k").agg(F.count("*").alias("n"))
    j = agg.alias("a").join(
        agg.alias("b"), F.col("a.k") == F.col("b.k")
    ).select(F.col("a.k"), (F.col("a.n") + F.col("b.n")).alias("s"))
    j.collect()
    m = audit_plan(j)
    assert m["final"]
    assert m["shuffles"] == 1, m


def test_initial_plan_smj_not_reported(spark, tables):
    # two sf-fixture tables joined without hints: the initial plan may
    # carry SortMergeJoin, but AQE converts to broadcast at this size —
    # the audit must report the EXECUTED join strategy
    li = tables["lineitem"].select("l_orderkey", "l_quantity")
    orders = tables["orders"].select("o_orderkey", "o_orderdate")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey).groupBy().count()
    j.collect()
    m = audit_plan(j)
    assert m["final"]
    assert m["smj"] == 0
    assert m["bhj"] >= 1
    # scans counted once each (not doubled by the Initial Plan section)
    assert m["scans"] == 2


# -- iteration-plan bars for the iterative family (round-9 judge item 7) -----
# graph_triangle_counts / dedup_jaccard_join are barred above through their
# registry entries; pagerank and ALS hide their per-iteration plans behind
# localCheckpoint, so their factored-out plan constructors are barred here —
# the queries where a silent plan regression costs the most (the shape runs
# once per iteration x sweeps).


def _grade_edges(tables):
    return tables["lineitem"].select(
        F.col("l_orderkey").alias("src"),
        (F.col("l_partkey") + F.lit(10_000_000)).alias("dst"),
    )


def test_pagerank_iteration_plan_bar(spark, tables):
    from ophidia_server_spark.pipeline import graph as G

    e = _grade_edges(tables).select(
        F.col("src").alias("__s"), F.col("dst").alias("__d")
    )
    nodes = (
        e.select(F.col("__s").alias("node"))
        .unionByName(e.select(F.col("__d").alias("node")))
        .distinct().persist()
    )
    n = nodes.count()
    deg = e.groupBy("__s").agg(F.count(F.lit(1)).alias("__deg"))
    ranks = nodes.select("node", F.lit(1.0).alias("rank")).localCheckpoint()
    it1 = G._pagerank_iteration(nodes, e, deg, ranks, n, 0.85)
    it1.collect()
    m = audit_plan(it1)
    # measured sf0.001 AQE plan: 2 scans / 1 shuffle (+headroom for AQE
    # join-strategy flips at runtime); the crossJoin is the sanctioned
    # one-row dangling-mass broadcast — exactly one, never more
    assert m["scans"] <= 3, m
    assert m["shuffles"] <= 3, m
    assert m["cartesian"] <= 1, m
    assert m["python"] == 0, f"pagerank iteration must stay JVM-side: {m}"
    # the loop's ACTUAL shape (round-14): degree-carrying rank state and
    # the dangling mass as a plan literal picked up by the previous
    # residual job — the per-iteration deg joins AND the anti-join
    # +aggregate subtree with its one-row crossJoin must be GONE
    nodes_deg = nodes.join(
        deg.select(F.col("__s").alias("node"), "__deg"), "node", "left"
    ).persist()
    ranks2 = nodes_deg.select(
        "node", "__deg", F.lit(1.0).alias("rank")
    ).localCheckpoint()
    it2 = G._pagerank_iteration(nodes_deg, e, deg, ranks2, n, 0.85,
                                dangling_mass=float(n))
    it2.collect()
    m2 = audit_plan(it2)
    nodes.unpersist()
    nodes_deg.unpersist()
    assert m2["cartesian"] == 0, m2
    assert m2["scans"] <= m["scans"], (m2, m)
    assert m2["shuffles"] <= m["shuffles"], (m2, m)
    assert m2["python"] == 0, m2


def _als_half_plan(spark, tables, regress=False):
    from ophidia_server_spark.pipeline import als as A

    ratings = tables["lineitem"].select(
        F.col("l_orderkey").alias("user"), F.col("l_partkey").alias("item"),
        F.col("l_quantity").cast("double").alias("rating"),
    )
    if regress:
        # the deliberate regression: an extra exchange before the gather
        # join (the kind of refactor slip these bars exist to catch)
        ratings = ratings.repartition(64, "rating")
    k = 4
    uf = A._init_factors(ratings.select("user").distinct(), "user", k, "u")
    return A._half_step_plan(ratings, uf, "item", "user", k, 0.05)


ALS_HALF_BAR = (2, 2)  # measured sf0.001 AQE plan: 2 scans, 2 shuffles


def test_als_half_step_plan_bar(spark, tables):
    hp = _als_half_plan(spark, tables)
    hp.collect()
    m = audit_plan(hp)
    assert m["scans"] <= ALS_HALF_BAR[0], m
    assert m["shuffles"] <= ALS_HALF_BAR[1], m
    # ZERO python stages (round-13 opt): at gate k the ridge solve is the
    # closed-form JVM Cholesky (als._jvm_solve_col) — the bar tightened
    # from the one sanctioned Arrow stage to none; any Python stage
    # creeping back in fails here first
    assert m["python"] == 0, m


def test_als_half_step_bar_catches_deliberate_regression(spark, tables):
    # canary for the bar mechanism itself: inject one extra exchange and
    # the same audit MUST exceed the committed bar — proving a silent plan
    # regression cannot pass these tests unnoticed
    hp = _als_half_plan(spark, tables, regress=True)
    hp.collect()
    m = audit_plan(hp)
    assert m["shuffles"] > ALS_HALF_BAR[1], (
        f"canary expected the injected repartition to exceed the "
        f"{ALS_HALF_BAR[1]}-shuffle bar, measured {m}"
    )
