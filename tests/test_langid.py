"""Trained char-n-gram language ID (pipeline/langid.py)."""

from pyspark.sql import functions as F

from ophidia_server_spark.pipeline import langid


def _corpus(spark):
    rows = []
    for i in range(40):
        en = f"the quick brown fox number {i} jumps over the lazy dog"
        rows.append((i * 2, "en", en))
        rows.append((i * 2 + 1, "rev", " ".join(t[::-1] for t in en.split())))
    return spark.createDataFrame(rows, "doc_id long, lang string, text string")


def test_nb_train_predict_separates_languages(spark):
    corpus = _corpus(spark)
    model = langid.nb_train(corpus.filter(F.col("doc_id") % 5 != 0))
    assert model["langs"] == ["en", "rev"]
    assert all(len(model["weights"][lang]) == 256 for lang in model["langs"])
    evl = corpus.filter(F.col("doc_id") % 5 == 0)
    joined = evl.join(langid.nb_predict(evl, model), "doc_id")
    rows = joined.collect()
    assert rows and all(r["lang"] == r["pred_lang"] for r in rows)
    assert all(r["margin"] > 0 for r in rows)


def test_nb_predict_empty_text_uses_prior_and_tiebreak(spark):
    corpus = _corpus(spark)
    model = langid.nb_train(corpus)
    empty = spark.createDataFrame([(999, "")], "doc_id long, text string")
    got = langid.nb_predict(empty, model).collect()[0]
    # no grams -> prior-only scores; equal class sizes -> tie -> the
    # heuristic can't vote 'en' on empty text -> alphabetically first lang
    assert got["pred_lang"] == "en" and got["margin"] == 0


def test_char_gram_buckets_short_text_has_no_phantom_grams(spark):
    df = spark.createDataFrame(
        [(1, ""), (2, "a"), (3, "ab")], "doc_id long, text string"
    )
    got = {
        r["doc_id"]: r["n"]
        for r in df.select(
            "doc_id",
            F.size(langid.char_gram_buckets(F.col("text"))).alias("n"),
        ).collect()
    }
    assert got == {1: 0, 2: 0, 3: 1}


def test_nb_predict_is_pure_map(spark):
    corpus = _corpus(spark)
    model = langid.nb_train(corpus)
    plan = (
        langid.nb_predict(corpus, model)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "Exchange" not in plan
    assert "PythonUDF" not in plan and "ArrowEval" not in plan


def test_nb_separates_non_latin_script(spark):
    # round-12 hardening: Cyrillic-mapped docs (multi-byte UTF-8 chars
    # through the byte-level md5 gram hash) must classify cleanly
    cyr_map = str.maketrans(
        "abcdefghijklmnopqrstuvwxyz", "абвгдежзийклмнопрстуфхцчшщ"
    )
    rows = []
    for i in range(40):
        en = f"the quick brown fox number {i} jumps over the lazy dog"
        rows.append((i * 2, "en", en))
        rows.append((i * 2 + 1, "cyr", en.translate(cyr_map)))
    corpus = spark.createDataFrame(rows, "doc_id long, lang string, text string")
    model = langid.nb_train(corpus.filter(F.col("doc_id") % 5 != 0))
    assert model["langs"] == ["cyr", "en"]
    evl = corpus.filter(F.col("doc_id") % 5 == 0)
    got = evl.join(langid.nb_predict(evl, model), "doc_id").collect()
    assert got and all(r["lang"] == r["pred_lang"] for r in got)


def test_nb_predict_abstain_margin(spark):
    corpus = _corpus(spark)
    model = langid.nb_train(corpus)
    mixed = spark.createDataFrame(
        [(999, ""), (1000, "the quick brown fox jumps over the lazy dog")],
        "doc_id long, text string",
    )
    got = {
        r["doc_id"]: r
        for r in langid.nb_predict(mixed, model, abstain_margin=100_000)
        .collect()
    }
    # empty text: prior-only scores, margin 0 (equal class sizes) -> und;
    # the raw margin column still carries the gap for auditing
    assert got[999]["pred_lang"] == "und" and got[999]["margin"] == 0
    # a real sentence's margin is orders of magnitude above the threshold
    assert got[1000]["pred_lang"] == "en"
    assert got[1000]["margin"] > 1_000_000


def test_lang12_fixture_accuracy_and_abstention(spark):
    """The 12-language corpus-realism fixture (round 13): held-out
    accuracy 1.0 on every class INCLUDING the en/vsw vowel-shift
    confusable; zero-evidence snippets abstain at the re-pinned 100k
    margin while every full-length doc clears it with orders-of-magnitude
    headroom (the measured floor is 4.7e7)."""
    from pyspark.sql import functions as F

    from ophidia_server_spark.pipeline import langid
    from ophidia_server_spark.registry import (
        _LANG12_ABSTAIN, _lang12_corpus, _lang12_degenerates,
    )

    sf = "/root/testdata/sf0.001"
    corpus = _lang12_corpus(spark, sf).persist()
    model = langid.nb_train(corpus.filter(F.col("doc_id") % 5 != 0))
    assert len(model["langs"]) == 12 and "vsw" in model["langs"]
    evl = corpus.filter(F.col("doc_id") % 5 == 0)
    pred = langid.nb_predict(evl, model, abstain_margin=_LANG12_ABSTAIN)
    joined = evl.select("doc_id", F.col("lang").alias("t")).join(pred, "doc_id")
    per = {
        r["t"]: (r["ok"], r["n"], r["mn"])
        for r in joined.groupBy("t").agg(
            F.sum((F.col("t") == F.col("pred_lang")).cast("long")).alias("ok"),
            F.count(F.lit(1)).alias("n"),
            F.min("margin").alias("mn"),
        ).collect()
    }
    assert set(per) == set(model["langs"])
    for lang, (ok, n, mn) in per.items():
        assert ok == n, f"{lang}: {ok}/{n}"
        # no full-length doc ever abstains: margins clear the pin hugely
        assert mn > 100 * _LANG12_ABSTAIN, f"{lang}: min margin {mn}"
    deg = _lang12_degenerates(spark, sf)
    dp = langid.nb_predict(deg, model, abstain_margin=_LANG12_ABSTAIN).join(
        deg.select("doc_id", F.col("lang").alias("t")), "doc_id"
    )
    # every 1-char snippet (zero bigrams -> prior-only evidence) abstains
    snip = dp.filter(F.col("t") == "und")
    assert snip.filter(F.col("pred_lang") != "und").count() == 0
    assert snip.count() > 0
    corpus.unpersist()
