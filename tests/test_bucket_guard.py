"""Candidate-volume guard for the banded near-dup family.

The sf10 campaign showed banded pair APIs can silently plant C(n,2)-per-
bucket candidate joins (19.5B for dHash under clone cliques) discoverable
only via a side probe script; round 11 promotes the probe's aggregate into
the APIs themselves: an O(buckets) Σ C(n,2) pre-pass, a named
BucketCardinalityError above `max_candidates`, and a `cap_bucket` lever
with exact dropped-candidate accounting — mirroring blocked_link's
executable hot-block guard (dedup.py BlockCardinalityError).
"""

import pytest

from ophidia_server_spark.pipeline import dedup as dd
from ophidia_server_spark.pipeline.dedup import BucketCardinalityError
from ophidia_server_spark.pipeline.multimodal import dhash_near_dup


def _clone_docs(spark, n=30, text="alpha beta gamma delta epsilon zeta"):
    return spark.createDataFrame(
        [(i, text) for i in range(n)], "doc_id long, text string"
    )


def _varied_docs(spark):
    rows = [
        (0, "the quick brown fox jumps over the lazy dog"),
        (1, "the quick brown fox jumps over the lazy cat"),
        (2, "pack my box with five dozen liquor jugs"),
        (3, "pack my box with five dozen liquor mugs"),
        (4, "sphinx of black quartz judge my vow"),
        (5, "how vexingly quick daft zebras jump"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_guard_raises_on_clone_clique(spark):
    # 30 identical docs share every band bucket: 8 bands x C(30,2) = 3,480
    # candidates; budget 1,000 -> named error listing hot buckets
    docs = _clone_docs(spark)
    with pytest.raises(BucketCardinalityError, match=r"~3,480 candidate"):
        dd.minhash_lsh_pairs(docs, max_candidates=1000)


def test_minhash_cap_bucket_bounds_and_counts_drops(spark):
    # cap_bucket=5 bounds every bucket to C(5,2)=10 -> 8 x 10 = 80 capped,
    # 3,400 dropped (exact); survivors are the 5 smallest-id clones
    docs = _clone_docs(spark)
    with pytest.warns(UserWarning, match=r"3,400 candidate pairs dropped"):
        pairs = {
            (r.doc_a, r.doc_b)
            for r in dd.minhash_lsh_pairs(
                docs, max_candidates=1000, cap_bucket=5
            ).collect()
        }
    assert pairs == {(a, b) for a in range(5) for b in range(a + 1, 5)}


def test_minhash_guard_under_budget_is_invisible(spark):
    docs = _varied_docs(spark)
    on = {
        (r.doc_a, r.doc_b, r.est_jaccard)
        for r in dd.minhash_lsh_pairs(docs, jaccard_threshold=0.3).collect()
    }
    off = {
        (r.doc_a, r.doc_b, r.est_jaccard)
        for r in dd.minhash_lsh_pairs(
            docs, jaccard_threshold=0.3, max_candidates=None
        ).collect()
    }
    assert on == off and on  # identical, and non-vacuous


def test_simhash_guard_raises_and_caps(spark):
    # identical docs -> identical simhash -> 4 bands x C(30,2) = 1,740
    docs = _clone_docs(spark)
    with pytest.raises(BucketCardinalityError, match=r"~1,740 candidate"):
        dd.simhash_pairs(docs, max_candidates=1000)
    with pytest.warns(UserWarning, match=r"1,700 candidate pairs dropped"):
        pairs = {
            (r.doc_a, r.doc_b, r.hamming)
            for r in dd.simhash_pairs(
                docs, max_candidates=1000, cap_bucket=5
            ).collect()
        }
    assert pairs == {(a, b, 0) for a in range(5) for b in range(a + 1, 5)}


def test_simhash_guard_under_budget_is_invisible(spark):
    docs = _varied_docs(spark)
    on = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dd.simhash_pairs(docs, max_hamming=20).collect()
    }
    off = {
        (r.doc_a, r.doc_b, r.hamming)
        for r in dd.simhash_pairs(
            docs, max_hamming=20, max_candidates=None
        ).collect()
    }
    assert on == off


def test_ngram_jaccard_guard_raises(spark):
    docs = _clone_docs(spark)
    with pytest.raises(
        BucketCardinalityError, match="ngram_jaccard_pairs would generate"
    ):
        dd.ngram_jaccard_pairs(docs, max_candidates=1000)


def test_dhash_guard_raises_and_caps(spark):
    # 30 flat images hash to code 0: 4 bands x C(30,2) = 1,740 candidates —
    # the exact sf10 clone-clique shape, now a named sub-second error
    codes = spark.createDataFrame(
        [(i, 0, 0, 1) for i in range(30)],
        "doc_id long, code_lo int, code_hi int, ok int",
    )
    with pytest.raises(BucketCardinalityError, match=r"~1,740 candidate"):
        dhash_near_dup(codes, max_candidates=1000)
    with pytest.warns(UserWarning, match=r"1,700 candidate pairs dropped"):
        pairs = {
            (r.id_a, r.id_b, r.hamming)
            for r in dhash_near_dup(
                codes, max_candidates=1000, cap_bucket=5
            ).collect()
        }
    assert pairs == {(a, b, 0) for a in range(5) for b in range(a + 1, 5)}


def test_dhash_guard_under_budget_is_invisible(spark):
    codes = spark.createDataFrame(
        [(0, 7, 9, 1), (1, 7, 9, 1), (2, 7, 8, 1), (3, -1, -1, 0),
         (4, 1 << 20, 3, 1)],
        "doc_id long, code_lo int, code_hi int, ok int",
    )
    on = {
        (r.id_a, r.id_b, r.hamming)
        for r in dhash_near_dup(codes, max_hamming=3).collect()
    }
    off = {
        (r.id_a, r.id_b, r.hamming)
        for r in dhash_near_dup(
            codes, max_hamming=3, max_candidates=None
        ).collect()
    }
    assert on == off == {(0, 1, 0), (0, 2, 1), (1, 2, 1)}


def test_cap_bucket_validation(spark):
    docs = _clone_docs(spark, n=3)
    with pytest.raises(ValueError, match="cap_bucket must be >= 1"):
        dd.minhash_lsh_pairs(docs, cap_bucket=0)


def test_salt_bucket_restores_budget_and_keeps_clique_recall(spark):
    """The round-12 lever for hot-but-LEGITIMATE buckets: 30 identical
    docs are a real near-dup clique; cap_bucket=5 keeps only the C(5,2)
    pairs among the 5 smallest ids (10 of 435 clique pairs — the
    documented deterministic loss), while salt_bucket=4 re-bands the
    bucket so the budget holds AND every pair still collides in >= 1 of
    its 8 shared bands with probability 1-(3/4)^8 ~ 0.90 — measured here
    on the fixed ids (xxhash64 is deterministic), not asserted."""
    docs = _clone_docs(spark)  # 435 true pairs; unsalted volume 3,480
    pairs = {
        (r.doc_a, r.doc_b)
        for r in dd.minhash_lsh_pairs(
            docs, max_candidates=1000, salt_bucket=4
        ).collect()
    }
    all_pairs = {(a, b) for a in range(30) for b in range(a + 1, 30)}
    assert pairs <= all_pairs
    recall = len(pairs) / len(all_pairs)
    # expected 0.899 at s=4, k=8; the deterministic fixture draw must sit
    # well inside [0.75, 1.0] — far above cap_bucket=5's 10/435 = 0.023
    assert recall >= 0.75
    # the salted volume must actually clear the 1,000 budget that the
    # unsalted run (3,480) violates — proven by it NOT raising above


def test_salt_bucket_composes_with_cap_and_validates(spark):
    docs = _clone_docs(spark, n=10)
    with pytest.raises(ValueError, match="salt_bucket must be >= 2"):
        dd.minhash_lsh_pairs(docs, salt_bucket=1)
    # salting + cap: budget check runs on the salted-then-capped sizes
    pairs = dd.minhash_lsh_pairs(
        docs, max_candidates=None, cap_bucket=3, salt_bucket=2
    )
    got = {(r.doc_a, r.doc_b) for r in pairs.collect()}
    assert got <= {(a, b) for a in range(10) for b in range(a + 1, 10)}


def test_salt_bucket_no_false_positives_on_varied_docs(spark):
    """Salting only ever REMOVES candidates: the salted pair set is a
    subset of the unsalted one on a mixed corpus."""
    docs = _varied_docs(spark)
    base = {
        (r.doc_a, r.doc_b)
        for r in dd.minhash_lsh_pairs(
            docs, jaccard_threshold=0.3, max_candidates=None
        ).collect()
    }
    salted = {
        (r.doc_a, r.doc_b)
        for r in dd.minhash_lsh_pairs(
            docs, jaccard_threshold=0.3, max_candidates=None, salt_bucket=3
        ).collect()
    }
    assert salted <= base


def test_salt_bucket_simhash_and_dhash_paths(spark):
    docs = _clone_docs(spark)
    # simhash: clique volume 1,740 > budget 1,000; salt_bucket=4 restores
    pairs = {
        (r.doc_a, r.doc_b)
        for r in dd.simhash_pairs(
            docs, max_candidates=1000, salt_bucket=4
        ).collect()
    }
    all_pairs = {(a, b) for a in range(30) for b in range(a + 1, 30)}
    assert pairs and pairs <= all_pairs
    # dhash: 30 identical codes, 4 bands -> 1,740 candidates > 1,000
    codes = spark.createDataFrame(
        [(i, 12345, 67890, 1) for i in range(30)],
        "doc_id long, code_lo long, code_hi long, ok int",
    )
    got = {
        (r.id_a, r.id_b)
        for r in dhash_near_dup(
            codes, max_candidates=1000, salt_bucket=4
        ).collect()
    }
    assert got and got <= all_pairs


def test_salt_bucket_ngram_jaccard_path(spark):
    docs = _clone_docs(spark)
    got = {
        (r.doc_a, r.doc_b)
        for r in dd.ngram_jaccard_pairs(
            docs, max_candidates=700, salt_bucket=4
        ).collect()
    }
    all_pairs = {(a, b) for a in range(30) for b in range(a + 1, 30)}
    assert got and got <= all_pairs


def test_salt_bucket_auto_matches_manual_on_clique(spark):
    """salt_bucket="auto" (round 13): the pre-pass totals 3,480 raw
    candidates against budget 1,000; the smallest power of two with
    raw/s <= budget is s=4 — exactly the manual choice the round-12
    recall test pins — so auto and manual must return the SAME pairs
    (xxhash64 salting is deterministic)."""
    docs = _clone_docs(spark)
    with pytest.warns(UserWarning, match=r"salting hot buckets with s=4"):
        auto = {
            (r.doc_a, r.doc_b)
            for r in dd.minhash_lsh_pairs(
                docs, max_candidates=1000, salt_bucket="auto"
            ).collect()
        }
    manual = {
        (r.doc_a, r.doc_b)
        for r in dd.minhash_lsh_pairs(
            docs, max_candidates=1000, salt_bucket=4
        ).collect()
    }
    assert auto == manual
    # clique recall stays the salted dial, not the cap cliff
    assert len(auto) / 435 >= 0.75


def test_salt_bucket_auto_is_noop_under_budget(spark):
    """Under budget auto applies NO salt: result identical to unsalted."""
    docs = _varied_docs(spark)
    base = {
        (r.doc_a, r.doc_b)
        for r in dd.minhash_lsh_pairs(docs, jaccard_threshold=0.3).collect()
    }
    auto = {
        (r.doc_a, r.doc_b)
        for r in dd.minhash_lsh_pairs(
            docs, jaccard_threshold=0.3, salt_bucket="auto"
        ).collect()
    }
    assert auto == base and base


def test_salt_bucket_auto_requires_budget(spark):
    docs = _clone_docs(spark, n=3)
    with pytest.raises(ValueError, match="needs a max_candidates budget"):
        dd.minhash_lsh_pairs(
            docs, max_candidates=None, salt_bucket="auto"
        )


def test_salt_bucket_auto_all_four_apis(spark):
    """Auto mode must clear the same budgets manual salting clears on all
    four banded pair APIs (simhash/dhash cliques: 1,740 raw; s=2)."""
    docs = _clone_docs(spark)
    all_pairs = {(a, b) for a in range(30) for b in range(a + 1, 30)}
    sh = {
        (r.doc_a, r.doc_b)
        for r in dd.simhash_pairs(
            docs, max_candidates=1000, salt_bucket="auto"
        ).collect()
    }
    assert sh and sh <= all_pairs
    ng = {
        (r.doc_a, r.doc_b)
        for r in dd.ngram_jaccard_pairs(
            docs, max_candidates=700, salt_bucket="auto"
        ).collect()
    }
    assert ng and ng <= all_pairs
    codes = spark.createDataFrame(
        [(i, 0, 0, 1) for i in range(30)],
        "doc_id long, code_lo int, code_hi int, ok int",
    )
    dh = {
        (r.id_a, r.id_b)
        for r in dhash_near_dup(
            codes, max_candidates=1000, salt_bucket="auto"
        ).collect()
    }
    assert dh and dh <= all_pairs


def test_pair_api_cleanup_releases_prepass_cache(spark):
    """The guard-eagerness contract keeps the pre-pass signature cache
    persisted; round 13 adds the release handle: after draining the
    returned frame, .cleanup() empties the cache manager, and re-running
    an action on the frame stays correct (lazy recompute)."""
    spark.catalog.clearCache()
    cm = spark._jsparkSession.sharedState().cacheManager()
    docs = _varied_docs(spark)
    out = dd.minhash_lsh_pairs(docs, jaccard_threshold=0.3)
    n = out.count()
    assert not cm.isEmpty()
    out.cleanup()
    assert cm.isEmpty()
    assert out.count() == n  # correct after release


def test_pair_api_cleanup_on_simhash_ngram_dhash(spark):
    spark.catalog.clearCache()
    cm = spark._jsparkSession.sharedState().cacheManager()
    docs = _varied_docs(spark)
    codes = spark.createDataFrame(
        [(0, 7, 9, 1), (1, 7, 9, 1), (2, 7, 8, 1)],
        "doc_id long, code_lo int, code_hi int, ok int",
    )
    # built one at a time: guard eagerness persists at CONSTRUCTION, so
    # building all three up front would overlap their cache lifetimes
    for build in (
        lambda: dd.simhash_pairs(docs, max_hamming=20),
        lambda: dd.ngram_jaccard_pairs(docs, threshold=0.2),
        lambda: dhash_near_dup(codes, max_hamming=3),
    ):
        out = build()
        out.count()
        assert not cm.isEmpty()
        out.cleanup()
        assert cm.isEmpty()
