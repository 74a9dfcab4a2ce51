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
