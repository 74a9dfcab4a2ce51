"""BPE training + application (pipeline/bpe.py): the Sennrich et al. 2016
algorithm — driver merge learning checked against hand-computed merges on
the paper's tiny-vocabulary style example, Spark application checked for
losslessness, vocabulary closure, and determinism."""

from pyspark.sql import functions as F

from ophidia_server_spark.pipeline import bpe


def test_train_merges_hand_example():
    # vocab in the style of the paper's {low, lower, newest, widest}:
    # frequencies chosen so the merge order is hand-computable
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe.train_merges(wf, num_merges=4)
    # pair counts round 1: ('e','s') = 6+3 = 9 and ('s','t') = 9 tie;
    # ('e','s') < ('s','t') lexicographically -> ('e','s') first, then the
    # merged 'es' pairs with 't' at 9, beating everything else
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    # 'est' + EOW occurs 9 times next (ties with nothing higher);
    # ('est', EOW) vs ('l','o')=7, ('n','e')=6 ... EOW='\n' sorts before
    # letters so lexicographic order is irrelevant here (9 > 7)
    assert merges[2] == ("est", bpe.EOW)
    assert merges[3] == ("l", "o")


def test_train_is_deterministic_and_saturates():
    wf = [("ab", 3), ("ba", 2)]
    m1 = bpe.train_merges(wf, num_merges=50)
    m2 = bpe.train_merges(wf, num_merges=50)
    assert m1 == m2
    # tiny vocab saturates: every word collapses to one symbol, then stop
    assert 0 < len(m1) < 50


def test_apply_roundtrip_and_closure(spark):
    docs = spark.createDataFrame(
        [
            (0, "low low lower newest widest"),
            (1, "  the newest   lowest\twidest "),
            (2, ""),
            (3, "zq"),  # word with chars unseen in the training slice
        ],
        "doc_id long, text string",
    )
    merges = bpe.bpe_train(docs, num_merges=20)
    enc = bpe.bpe_apply(docs, merges)
    rows = {r["doc_id"]: r for r in enc.collect()}
    # lossless: stripping EOW markers and rejoining reproduces the
    # whitespace-normalized text for every doc, including empty and unseen
    for did, txt in [(0, "low low lower newest widest"),
                     (1, "the newest lowest widest"), (2, ""), (3, "zq")]:
        toks = rows[did]["tokens"]
        words = [w for w in "".join(toks).split(bpe.EOW) if w]
        assert " ".join(words) == txt, did
        assert rows[did]["n_tokens"] == len(toks)
    # every token is a char, char+EOW, or a learned merge product
    vocab = {a + b for a, b in merges}
    for r in rows.values():
        for t in r["tokens"]:
            base = t[:-1] if t.endswith(bpe.EOW) else t
            assert t in vocab or len(base) <= 1, t


def test_word_frequencies_cap_and_order(spark):
    docs = spark.createDataFrame(
        [(i, "aa bb aa cc aa bb") for i in range(3)], "doc_id long, text string"
    )
    wf = bpe.word_frequencies(docs, max_words=2)
    assert wf == [("aa", 9), ("bb", 6)]


def test_apply_is_pure_map_stage(spark):
    # the tokenizer must not shuffle: its plan is scan -> mapInPandas only
    docs = spark.createDataFrame(
        [(0, "a b c")], "doc_id long, text string"
    )
    enc = bpe.bpe_apply(docs, [("a", bpe.EOW)])
    plan = enc._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "MapInPandas" in plan
