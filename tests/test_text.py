

def test_strip_markup_drops_scripts_tags_entities(spark):
    from pyspark.sql import functions as F

    from ophidia_server_spark.pipeline.text import strip_markup

    rows = [
        (1, '<p>Hello <b>world</b></p><script>if (1 < 2) alert("x");</script>'),
        (2, 'A &amp; B &lt;tag&gt; &quot;q&quot; &#39;s&#39; &nbsp;end'),
        (3, '<style type="text/css">body { x: 1; }</style>plain'),
        (4, 'no markup at all'),
        (5, 'multi\n\nline\t text  here'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in strip_markup(df).collect()}
    assert out[1]["clean_text"] == "Hello world"
    assert out[2]["clean_text"] == 'A & B <tag> "q" \'s\' end'
    assert out[3]["clean_text"] == "plain"
    assert out[4]["clean_text"] == "no markup at all"
    assert out[4]["chars_removed"] == 0
    assert out[5]["clean_text"] == "multi line text here"
    for r in out.values():
        assert r["chars_removed"] >= 0


def test_collocations_lift_hand_computed(spark):
    from ophidia_server_spark.pipeline.text import collocations

    # tokens: a x3, b x6, c x2 -> T=11; adjacent pairs: (a,b) x3,
    # (b,c) x2, (b,b) x2 -> B=7
    df = spark.createDataFrame(
        [(0, "a b c"), (1, "a b c"), (2, "a b"), (3, "b b b")],
        "doc_id long, text string",
    )
    got = {(r["w1"], r["w2"]): r for r in collocations(df, min_count=2).collect()}
    t, b = 11.0, 7.0
    assert got[("a", "b")]["n_pair"] == 3
    assert got[("a", "b")]["lift"] == round(3 * t * t / (b * 3 * 6), 6)
    assert got[("b", "c")]["n_pair"] == 2
    assert got[("b", "c")]["lift"] == round(2 * t * t / (b * 6 * 2), 6)
    assert got[("b", "b")]["n_pair"] == 2  # "b b b": 2 adjacent (b,b) pairs
    assert ("c", "a") not in got  # never adjacent


def test_chi2_token_label_contingency(spark):
    from ophidia_server_spark.pipeline.text import chi2_token_label

    # token "x" present in ALL label-p docs, absent from label-q docs
    rows = [(i, "p", "x y") for i in range(5)] + [
        (i + 5, "q", "y z") for i in range(5)
    ]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {
        (r["label"], r["token"]): r
        for r in chi2_token_label(df, "source", min_docs=1).collect()
    }
    # perfect association: chi2 = N = 10
    assert got[("p", "x")]["chi2"] == 10.0
    assert got[("p", "x")]["n_label_docs_with_token"] == 5
    # "y" in every doc: degenerate margin -> guarded to 0
    assert got[("p", "y")]["chi2"] == 0.0
    assert got[("q", "z")]["chi2"] == 10.0


def test_ngram_novelty_counts(spark):
    from ophidia_server_spark.pipeline.text import ngram_novelty

    ref = spark.createDataFrame(
        [(0, "a b c d e")], "doc_id long, text string"
    )
    # doc 10 repeats ref shingles (novelty 0); doc 11 is half-new;
    # doc 12 is all-new; doc 13 is a sub-k stub and must STILL report
    batch = spark.createDataFrame(
        [(10, "a b c d"), (11, "c d e f"), (12, "x y z w"), (13, "hi")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r for r in ngram_novelty(batch, ref).collect()}
    assert got[10]["novelty"] == 0.0 and got[10]["n_shingles"] == 2
    assert got[11]["n_shingles"] == 2 and got[11]["n_novel"] == 1
    assert got[11]["novelty"] == 0.5
    assert got[12]["novelty"] == 1.0
    assert got[13]["n_shingles"] == 0 and got[13]["novelty"] == 0.0


def test_encoding_artifacts_flags_constructed_damage(spark):
    from ophidia_server_spark.pipeline.text import encoding_artifacts

    rows = [
        (1, "clean ascii text"),
        (2, "mojibake Ã© here and â€™ there"),
        (3, "repl � and ctrl \x07"),
        (4, "café naïve"),  # non-ASCII but NOT damage markers
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in encoding_artifacts(df).collect()}
    assert got[1]["suspect"] == 0 and got[1]["n_non_ascii"] == 0
    assert got[2]["n_mojibake"] == 2 and got[2]["suspect"] == 1
    assert got[3]["n_replacement"] == 1 and got[3]["n_control"] == 1
    assert got[3]["suspect"] == 1
    assert got[4]["suspect"] == 0 and got[4]["n_non_ascii"] == 2


def test_url_domains_extraction(spark):
    from ophidia_server_spark.pipeline.text import url_domains

    rows = [
        (1, "go to https://A.Example.com/x and http://b.net/y?z=1"),
        (2, "again https://a.example.com/other plus no url here"),
        (3, "nothing"),
        # adversarial shapes: uppercase scheme, userinfo@host
        (4, "HTTPS://Evil.com/x and https://login@evil.com/phish"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["domain"]: r for r in url_domains(df).collect()}
    assert got["a.example.com"]["n_mentions"] == 2
    assert got["a.example.com"]["n_docs"] == 2
    assert got["b.net"]["n_mentions"] == 1
    # scheme case must not hide a URL; userinfo must not become the host
    assert got["evil.com"]["n_mentions"] == 2 and got["evil.com"]["n_docs"] == 1
    assert "login" not in got
    assert len(got) == 3


def test_zipf_fit_exact_power_law(spark):
    import math

    from ophidia_server_spark.pipeline.text import zipf_fit

    # construct frequencies freq(rank) = round(1000 * rank^-1): an
    # almost-perfect Zipf corpus -> exponent near -1, r near -1
    rows = []
    for rank in range(1, 21):
        tok = f"w{rank:02d}"
        for _ in range(round(1000 / rank)):
            rows.append((tok,))
    df = spark.createDataFrame(rows, "text string")
    r = zipf_fit(df, max_rank=20).first()
    assert r["n_ranked"] == 20
    assert abs(r["zipf_exponent"] + 1.0) < 0.02
    assert r["pearson_r"] < -0.999
    assert math.isfinite(r["zipf_exponent"])


def test_canonical_urls_normalization_rules(spark):
    from ophidia_server_spark.pipeline.text import canonical_urls

    df = spark.createDataFrame(
        [(1, "x HTTP://Ex.COM/KeepCase?utm_source=a&id=3&gclid=z#f y"),
         (2, "see https://a.org/p?utm_campaign=q only"),
         (3, "plain http://b.net/q#frag end"),
         (4, "no urls at all here")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: r["canon_url"] for r in canonical_urls(df).collect()}
    # host lowercased, path case kept, tracking stripped, real param kept
    assert got[1] == "http://ex.com/KeepCase?id=3"
    # emptied query string dropped entirely
    assert got[2] == "https://a.org/p"
    # fragment dropped
    assert got[3] == "http://b.net/q"
    assert 4 not in got
    # identical canon for visually-different trackers (the dedup key claim)
    two = spark.createDataFrame(
        [(1, "http://s.io/a?utm_x=1"), (2, "HTTP://S.IO/a#top")],
        "doc_id long, text string",
    )
    urls = canonical_urls(two).collect()
    assert urls[0]["canon_url"] == urls[1]["canon_url"] == "http://s.io/a"


def test_template_prefixes_keeps_null_source_rows(spark):
    from ophidia_server_spark.pipeline.text import template_prefixes

    rows = [
        (1, "terms of service apply here", None),
        (2, "terms of service apply there", None),
        (3, "terms of service apply anywhere", None),
        (4, "something else entirely written", "a"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {r["doc_id"]: (r["n_sharing"], r["is_template"])
           for r in template_prefixes(df, k_tokens=4, min_docs=3).collect()}
    # NULL source is a real provenance group, not dropped rows
    assert len(got) == 4
    assert got[1] == (3, 1) and got[2] == (3, 1) and got[3] == (3, 1)
    assert got[4] == (1, 0)
