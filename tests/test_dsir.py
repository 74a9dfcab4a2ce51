"""DSIR importance resampling (pipeline/dsir.py) + the temperature-mix and
interleave samplers added alongside it (pipeline/sampling.py)."""

from pyspark.sql import functions as F

from ophidia_server_spark.pipeline import dsir
from ophidia_server_spark.pipeline.sampling import (
    interleave_groups,
    temperature_quotas,
    temperature_sample,
)


def test_gram_counts_unigrams_plus_bigrams(spark):
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "solo"), (3, ""), (4, None)],
        "doc_id int, text string",
    )
    gc = dsir.hashed_gram_counts(df, m=64)
    per_doc = {
        r["doc_id"]: r["n"]
        for r in gc.groupBy("doc_id").agg(F.sum("c").alias("n")).collect()
    }
    # 3 unigrams + 2 bigrams; single token -> 1 unigram; empty/null -> no rows
    assert per_doc == {1: 5, 2: 1}


def test_target_docs_outweigh_off_target(spark):
    rows = [(i, "alpha beta gamma delta", "t") for i in range(10)] + [
        (100 + i, "zig zag zog zug", "r") for i in range(10)
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string, grp string")
    w = dsir.dsir_logweights(df, F.col("grp") == "t", m=128)
    got = {r["doc_id"]: r["dsir_logweight"] for r in w.collect()}
    t_avg = sum(v for k, v in got.items() if k < 100) / 10
    r_avg = sum(v for k, v in got.items() if k >= 100) / 10
    assert t_avg > r_avg
    sel = dsir.dsir_select(df, 10, F.col("grp") == "t", m=128)
    assert {r["doc_id"] for r in sel.select("doc_id").collect()} == set(range(10))


def test_empty_doc_weight_zero_and_llr_table_size(spark):
    df = spark.createDataFrame(
        [(1, "x y", "t"), (2, "", "r")], "doc_id int, text string, grp string"
    )
    w = dsir.dsir_logweights(df, F.col("grp") == "t", m=32)
    got = {r["doc_id"]: r["dsir_logweight"] for r in w.collect()}
    assert got[2] == 0.0
    gc = dsir.hashed_gram_counts(df, m=32)
    llr = dsir.bucket_logratios(gc, df.filter("grp = 't'").select("doc_id"), m=32)
    assert llr.count() == 32


def test_gumbel_variant_is_deterministic(spark, tables):
    docs = tables["documents"].limit(60)
    a = dsir.dsir_select(
        docs, 15, F.col("lang") == "en", m=64, gumbel_scale=1.0
    )
    b = dsir.dsir_select(
        docs.repartition(7), 15, F.col("lang") == "en", m=64, gumbel_scale=1.0
    )
    sa = sorted(r["doc_id"] for r in a.select("doc_id").collect())
    sb = sorted(r["doc_id"] for r in b.select("doc_id").collect())
    assert sa == sb and len(sa) == 15


def test_temperature_quotas_sum_and_extremes(spark, tables):
    docs = tables["documents"]
    for alpha in (0.0, 0.5, 1.0):
        q = temperature_quotas(docs, 100, alpha, "source").collect()
        assert sum(r["quota"] for r in q) <= 100
        assert all(r["quota"] <= r["n_rows"] for r in q)
    # alpha=0 is uniform across groups (equal quotas up to floor rounding)
    q0 = temperature_quotas(docs, 100, 0.0, "source").collect()
    quotas = {r["quota"] for r in q0}
    assert len(quotas) == 1


def test_temperature_sample_honors_quotas(spark, tables):
    docs = tables["documents"]
    quotas = {
        r["source"]: r["quota"]
        for r in temperature_quotas(docs, 60, 0.5, "source").collect()
    }
    kept = (
        temperature_sample(docs, 60, 0.5, "source")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    )
    for r in kept:
        assert r["n"] == quotas[r["source"]]


def test_interleave_rotates_groups(spark, tables):
    docs = tables["documents"]
    out = interleave_groups(docs)
    rows = sorted(
        out.select("source", "train_pos").collect(), key=lambda r: r["train_pos"]
    )
    n_groups = docs.select("source").distinct().count()
    # positions are unique, and the first full rotation hits every source once
    assert len({r["train_pos"] for r in rows}) == len(rows)
    first = [r["source"] for r in rows[:n_groups]]
    assert len(set(first)) == n_groups
    # stable under repartitioning
    again = interleave_groups(docs.repartition(11))
    a = {(r["doc_id"], r["train_pos"]) for r in out.select("doc_id", "train_pos").collect()}
    b = {(r["doc_id"], r["train_pos"]) for r in again.select("doc_id", "train_pos").collect()}
    assert a == b


def test_contrastive_triplets_pick_twins_as_positives(spark, tables):
    from pyspark.sql import functions as F

    from ophidia_server_spark.pipeline.contrastive import contrastive_triplets
    from ophidia_server_spark.pipeline.dedup import ngram_jaccard_exact

    d = tables["documents"].select("doc_id", "text").filter("doc_id < 100")
    corpus = d.unionByName(
        d.filter("doc_id % 10 = 0").select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    pairs = ngram_jaccard_exact(corpus, threshold=0.5)
    trip = contrastive_triplets(corpus, pairs, n_buckets=4)
    rows = {r["anchor"]: r for r in trip.collect()}
    # every injected twin anchors a triplet whose positive is its twin
    for r in rows.values():
        assert r["negative"] not in (r["anchor"], r["positive"])
    for base in [k for k in rows if k >= 100000]:
        assert rows[base]["positive"] == base - 100000
        assert rows[base]["pos_jaccard"] == 1.0
    # deterministic under repartitioning
    again = contrastive_triplets(corpus.repartition(7), pairs, n_buckets=4)
    assert {tuple(r) for r in trip.collect()} == {tuple(r) for r in again.collect()}


def test_hard_negative_triplets_prefer_the_confusable_band(spark, tables):
    from pyspark.sql import functions as F

    from ophidia_server_spark.pipeline.contrastive import (
        contrastive_triplets_hard,
    )
    from ophidia_server_spark.pipeline.dedup import ngram_jaccard_exact

    d = tables["documents"].select("doc_id", "text").filter("doc_id < 100")
    corpus = d.unionByName(
        d.filter("doc_id % 10 = 0").select(
            (F.col("doc_id") + 100000).alias("doc_id"), "text"
        )
    )
    pos = ngram_jaccard_exact(corpus, threshold=0.5)
    # the hard band: similar-but-not-duplicate pairs
    all_pairs = ngram_jaccard_exact(corpus, threshold=0.01)
    hard = all_pairs.filter("jaccard < 0.5")
    trip = contrastive_triplets_hard(corpus, pos, hard)
    rows = trip.collect()
    assert rows
    for r in rows:
        assert r["negative"] not in (r["anchor"], r["positive"])
        assert r["neg_source"] in ("hard", "random")
    # the hard band is dense on this corpus: most anchors get a hard negative
    n_hard = sum(1 for r in rows if r["neg_source"] == "hard")
    assert n_hard >= len(rows) // 2


def test_canonicalize_agrees_with_duckdb_on_real_unicode(spark):
    # composed vs decomposed accents, NBSP, compatibility chars, case —
    # the Python-unicodedata path must match DuckDB's native nfc_normalize
    import duckdb

    from ophidia_server_spark.pipeline.text import canonicalize, dedup_canonical

    samples = [
        (1, "Café  au  lait"),            # composed e-acute
        (2, "Café au lait"),              # decomposed e + combining acute
        (3, "CAFÉ AU LAIT"),     # upper + NBSP separators
        (4, "straße und STRASSE"),         # sharp s (NOT folded by NFC)
        (5, "Å vs Å"),                # angstrom sign vs A-ring
        (6, None),
        (7, "  plain   ascii  TEXT "),
    ]
    df = spark.createDataFrame(samples, "doc_id int, text string")
    got = {r["doc_id"]: r["canon_text"] for r in canonicalize(df).collect()}
    con = duckdb.connect()
    for i, raw in samples:
        want = (
            None if raw is None else con.execute(
                r"SELECT nfc_normalize(lower(trim(regexp_replace(?, '\s+', ' ', 'g'))))",
                [raw],
            ).fetchone()[0]
        )
        assert got[i] == want, (i, got[i], want)
    # composed == decomposed after canonicalization -> dedup keeps one
    kept = dedup_canonical(df.filter("doc_id IN (1, 2)"))
    assert [r["doc_id"] for r in kept.collect()] == [1]
    # angstrom sign normalizes to A-ring: the two halves become equal
    assert got[5].split(" vs ") [0] == got[5].split(" vs ")[1]


def test_dsir_degenerate_targets(spark):
    # empty target slice and all-target slice both stay finite and defined
    df = spark.createDataFrame(
        [(1, "a b c", "x"), (2, "c d e", "y")],
        "doc_id int, text string, grp string",
    )
    none_t = dsir.dsir_logweights(df, F.col("grp") == "nope", m=32)
    all_t = dsir.dsir_logweights(df, F.lit(True), m=32)
    for out in (none_t, all_t):
        rows = out.collect()
        assert len(rows) == 2
        for r in rows:
            assert r["dsir_logweight"] == r["dsir_logweight"]  # not NaN
    # all-target: p == q per bucket, so every weight is exactly 0
    assert all(r["dsir_logweight"] == 0.0 for r in all_t.collect())


def test_temperature_sample_zero_budget_and_single_group(spark):
    from ophidia_server_spark.pipeline.sampling import temperature_sample

    df = spark.createDataFrame(
        [(i, "only") for i in range(10)], "doc_id int, source string"
    )
    assert temperature_sample(df, 0, 0.5, "source").count() == 0
    got = temperature_sample(df, 5, 0.5, "source")
    assert got.count() == 5


def test_interleave_empty_and_single_group(spark):
    from ophidia_server_spark.pipeline.sampling import interleave_groups

    df = spark.createDataFrame([], "doc_id int, source string")
    assert interleave_groups(df).count() == 0
    one = spark.createDataFrame(
        [(i, "s") for i in range(4)], "doc_id int, source string"
    )
    pos = sorted(r["train_pos"] for r in interleave_groups(one).collect())
    assert pos == [0, 1, 2, 3]  # single group -> dense sequential order
