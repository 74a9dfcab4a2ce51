"""Cross-document duplicate spans (pipeline/dedup.py duplicate_spans /
duplicate_span_coverage): hand-built corpora with known maximal spans."""

import pytest

from ophidia_server_spark.pipeline.dedup import (
    duplicate_span_coverage,
    duplicate_spans,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _spans(df, **kw):
    out = duplicate_spans(df, **kw)
    return sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_dup_grams)
        for r in out.collect()
    )


def test_single_shared_run_marks_both_docs(spark):
    # d2 embeds d1's tokens a..h at offset 2: with k=4 the five shared
    # 4-grams merge into ONE maximal span per doc
    df = _df(spark, [
        (1, "a b c d e f g h i j"),
        (2, "x x a b c d e f g h z z"),
    ])
    got = _spans(df, k=4)
    assert got == [
        (1, 0, 8, 8, 5),
        (2, 2, 10, 8, 5),
    ]


def test_gap_splits_islands_and_contiguity_merges(spark):
    # In doc 1 the shared grams sit at offsets 0 and 3 (k=3): exactly
    # contiguous coverage -> ONE span [0, 6). In doc 2 they sit at offsets
    # 0 and 5: gap > k -> TWO spans.
    df = _df(spark, [
        (1, "a b c x y z"),
        (2, "a b c p p x y z"),
    ])
    got = _spans(df, k=3)
    assert got == [
        (1, 0, 6, 6, 2),
        (2, 0, 3, 3, 1),
        (2, 5, 8, 3, 1),
    ]


def test_boundary_gap_k_plus_one_separates(spark):
    # shared grams at offsets 0 and 4 with k=3 leave token 3 uncovered:
    # two spans, not one
    df = _df(spark, [
        (1, "a b c q x y z"),
        (2, "a b c w w w x y z"),
    ])
    got = _spans(df, k=3)
    assert (1, 0, 3, 3, 1) in got and (1, 4, 7, 3, 1) in got
    assert not any(r[0] == 1 and r[3] == 7 for r in got)


def test_within_doc_repetition_alone_is_not_duplication(spark):
    # doc 1 repeats its own 4-gram twice but shares nothing cross-doc:
    # min_docs counts DISTINCT documents, so no spans anywhere
    df = _df(spark, [
        (1, "a b c d q q a b c d"),
        (2, "entirely different tokens here now"),
    ])
    assert _spans(df, k=4) == []


def test_short_and_clean_docs_report_zero_coverage(spark):
    df = _df(spark, [
        (1, "a b c d e f g h"),
        (2, "z z a b c d e f g h"),
        (3, "too short"),
        (4, "totally unrelated content with many clean tokens here"),
    ])
    cov = {
        r.doc_id: (r.n_tokens, r.dup_tokens, r.dup_fraction)
        for r in duplicate_span_coverage(df, k=4).collect()
    }
    assert set(cov) == {1, 2, 3, 4}
    assert cov[1] == (8, 8, 1.0)
    assert cov[2] == (10, 8, 0.8)
    assert cov[3] == (2, 0, 0.0)
    assert cov[4] == (8, 0, 0.0)


def test_hash_key_lever_matches_string_path(spark):
    df = _df(spark, [
        (1, "a b c d e f g h i j"),
        (2, "x x a b c d e f g h z z"),
        (3, "a b c p p x y z"),
        (4, "unrelated words only here"),
    ])
    assert _spans(df, k=4, hash_key=True) == _spans(df, k=4)


def test_validation(spark):
    df = _df(spark, [(1, "a b c")])
    with pytest.raises(ValueError, match="k must be >= 2"):
        duplicate_spans(df, k=1)
    with pytest.raises(ValueError, match="min_docs must be >= 2"):
        duplicate_spans(df, min_docs=1)


def _clean(spark, rows, **kw):
    from ophidia_server_spark.pipeline.dedup import excise_duplicate_spans

    out = excise_duplicate_spans(_df(spark, rows), **kw)
    return {
        r.doc_id: (r.text_clean, r.n_tokens, r.n_removed)
        for r in out.collect()
    }


def test_excise_keeps_min_doc_copy_and_cuts_the_rest(spark):
    got = _clean(spark, [
        (1, "a b c d e f g h i j"),
        (2, "x x a b c d e f g h z z"),
    ], k=4)
    assert got[1] == ("a b c d e f g h i j", 10, 0)
    assert got[2] == ("x x z z", 12, 8)


def test_excise_full_duplicate_empties_the_later_doc(spark):
    got = _clean(spark, [(1, "a b c d"), (2, "a b c d")], k=4)
    assert got[1] == ("a b c d", 4, 0)
    assert got[2] == ("", 4, 4)


def test_excise_mixed_keepers_per_doc(spark):
    # doc 2 is NOT the keeper of "p q r s" (doc 1 is) but IS the keeper of
    # "m n o t" (vs doc 3): it loses the first passage, keeps the second
    got = _clean(spark, [
        (1, "p q r s"),
        (2, "p q r s m n o t"),
        (3, "m n o t"),
    ], k=4)
    assert got[1] == ("p q r s", 4, 0)
    assert got[2] == ("m n o t", 8, 4)
    assert got[3] == ("", 4, 4)


def test_excise_clean_corpus_is_identity_on_tokens(spark):
    rows = [(1, "alpha beta gamma delta"), (2, "five six seven eight")]
    got = _clean(spark, rows, k=3)
    assert got[1] == ("alpha beta gamma delta", 4, 0)
    assert got[2] == ("five six seven eight", 4, 0)


def test_excise_validation(spark):
    from ophidia_server_spark.pipeline.dedup import excise_duplicate_spans

    df = _df(spark, [(1, "a b c")])
    with pytest.raises(ValueError, match="k must be >= 2"):
        excise_duplicate_spans(df, k=1)
    with pytest.raises(ValueError, match="min_docs must be >= 2"):
        excise_duplicate_spans(df, min_docs=1)


def _cspans(spark, batch_rows, ref_texts, **kw):
    from ophidia_server_spark.pipeline.text import contamination_spans

    ref = spark.createDataFrame([(t,) for t in ref_texts], "text string")
    out = contamination_spans(_df(spark, batch_rows), ref, **kw)
    return sorted(
        (r.doc_id, r.span_start, r.span_end, r.span_tokens, r.n_hit_grams)
        for r in out.collect()
    )


def test_contamination_span_locates_the_quoted_passage(spark):
    # doc 1 quotes the eval passage "a b c d e" at token offset 3: with
    # k=3 the three hit grams merge into exactly that window
    got = _cspans(spark, [
        (1, "x y z a b c d e q q"),
        (2, "totally clean content here now"),
    ], ["a b c d e"], k=3)
    assert got == [(1, 3, 8, 5, 3)]


def test_contamination_two_passages_two_spans(spark):
    got = _cspans(spark, [
        (1, "a b c m m m m x y z"),
    ], ["a b c", "x y z"], k=3)
    assert got == [(1, 0, 3, 3, 1), (1, 7, 10, 3, 1)]


def test_contamination_hash_key_matches(spark):
    rows = [(1, "x y z a b c d e q q"), (2, "clean here")]
    assert _cspans(spark, rows, ["a b c d e"], k=3, hash_key=True) == \
        _cspans(spark, rows, ["a b c d e"], k=3)


def test_contamination_validation(spark):
    from ophidia_server_spark.pipeline.text import contamination_spans

    df = _df(spark, [(1, "a b c")])
    ref = _df(spark, [(9, "a b c")]).select("text")
    with pytest.raises(ValueError, match="k must be >= 2"):
        contamination_spans(df, ref, k=1)
