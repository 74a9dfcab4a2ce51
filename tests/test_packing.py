"""Semantic checks for the training-batch preparation operators
(pipeline/packing.py) and SemDeDup (pipeline/similarity.semantic_dedup):
the invariants a loader relies on, independent of the DuckDB parity gate.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from ophidia_server_spark.pipeline import packing as pk
from ophidia_server_spark.pipeline import similarity as sim


def _docs(spark, texts):
    return spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )


def test_pack_sequences_offsets_are_contiguous_per_bucket(spark):
    texts = [" ".join(["w"] * n) for n in (5, 300, 0, 128, 129, 64, 200, 1)]
    out = pk.pack_sequences(_docs(spark, texts), seq_len=128, n_buckets=2)
    rows = sorted(out.collect(), key=lambda r: (r.bucket, r.doc_id))
    by_bucket = {}
    for r in rows:
        by_bucket.setdefault(r.bucket, []).append(r)
    for bucket, rs in by_bucket.items():
        # concat layout: each doc starts exactly where the previous ended
        off = 0
        for r in rs:
            assert r.start_offset == off, (bucket, r)
            off += r.n_tokens
    for r in rows:
        if r.n_tokens == 0:
            assert r.n_seqs_spanned == 0
        else:
            assert r.first_seq == r.start_offset // 128
            assert r.last_seq == (r.start_offset + r.n_tokens - 1) // 128
            assert r.n_seqs_spanned == r.last_seq - r.first_seq + 1


def test_pack_sequences_rejects_nonpositive_seq_len(spark):
    with pytest.raises(ValueError):
        pk.pack_sequences(_docs(spark, ["a"]), seq_len=0)


def test_global_shuffle_positions_are_dense_and_salt_sensitive(spark):
    df = _docs(spark, ["x"] * 40)
    a = pk.global_shuffle(df, n_shards=4, salt="epoch0").collect()
    b = pk.global_shuffle(df, n_shards=4, salt="epoch1").collect()
    # every row appears once; positions within a shard are 0..n-1 dense
    assert len(a) == 40
    by_shard = {}
    for r in a:
        by_shard.setdefault(r.shard, []).append(r.pos)
    for shard, ps in by_shard.items():
        assert sorted(ps) == list(range(len(ps)))
    # the order is reproducible run-to-run ...
    a2 = pk.global_shuffle(df, n_shards=4, salt="epoch0").collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, a2))
    # ... and a different salt gives a different permutation
    assert sorted(map(tuple, a)) != sorted(map(tuple, b))
    # shard assignment matches the content-addressed md5 contract
    for r in a:
        h = hashlib.md5(f"{r.doc_id}:epoch0:shard".encode()).hexdigest()[:8]
        assert r.shard == int(h, 16) % 4


def test_repeated_ngram_stats_flags_shared_spans(spark):
    shared = "alpha beta gamma delta"
    texts = [
        shared + " one two three",
        shared + " four five six",
        "seven eight nine ten eleven",
        "ab",  # < k tokens -> zero grams
    ]
    out = {r.doc_id: r for r in
           pk.repeated_ngram_stats(_docs(spark, texts), k=3, min_docs=2).collect()}
    # docs 0/1 share the two 3-grams inside "alpha beta gamma delta"
    for d in (0, 1):
        assert out[d].n_repeated == 2
        assert 0 < out[d].repeated_frac < 1
    assert out[2].n_repeated == 0 and out[2].repeated_frac == 0.0
    assert out[3].n_grams == 0 and out[3].repeated_frac == 0.0


def test_quality_logistic_monotone_in_stopword_ratio(spark):
    # same token count / token lengths, more stopwords -> higher probability
    low = " ".join(["zz"] * 50)
    high = " ".join(["the"] * 25 + ["zz"] * 25)
    out = {r.doc_id: r.quality_prob for r in
           pk.quality_logistic(_docs(spark, [low, high])).collect()}
    assert out[1] > out[0]
    probs = pk.quality_logistic(_docs(spark, [low, high])).collect()
    assert all(0.0 <= r.quality_prob <= 1.0 for r in probs)
    assert all(r.keep == int(r.quality_prob >= 0.5) for r in probs)


def _emb(spark, vecs):
    return spark.createDataFrame(
        [(i, [float(x) for x in v]) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<double>",
    )


def test_semantic_dedup_keeps_lowest_id_per_near_dup_group(spark):
    # two tight groups near orthogonal axes + one isolated vector
    vecs = [
        [1.0, 0.0, 0.0],        # leader 0
        [0.0, 1.0, 0.0],        # leader 1
        [0.999, 0.01, 0.0],     # near-dup of 0 -> dropped
        [0.0, 0.995, 0.02],     # near-dup of 1 -> dropped
        [0.0, 0.0, 1.0],        # isolated (own direction) -> kept
    ]
    out = {r.vec_id: r for r in
           sim.semantic_dedup(_emb(spark, vecs), n_clusters=2, threshold=0.95).collect()}
    assert out[0].kept == 1 and out[1].kept == 1
    assert out[2].kept == 0 and out[3].kept == 0
    assert out[4].kept == 1
    # cluster ids come from the leader table (lowest-id vectors)
    assert out[2].cluster_id == 0 and out[3].cluster_id == 1


def test_semantic_dedup_full_corpus_partition(spark):
    # every vector is assigned exactly one cluster and one verdict
    vecs = [[float(i % 3 == j) + 0.01 * i for j in range(3)] for i in range(30)]
    out = sim.semantic_dedup(_emb(spark, vecs), n_clusters=3, threshold=0.9999)
    rows = out.collect()
    assert len(rows) == 30
    assert {r.vec_id for r in rows} == set(range(30))
    # with an impossible threshold nothing is dropped
    assert all(r.kept == 1 for r in rows)


def test_remove_repeated_spans_cuts_shared_spans_only(spark):
    texts = [
        "alpha beta gamma delta one two three",
        "alpha beta gamma delta four five six",
        "seven eight nine ten eleven",
        "ab",
    ]
    out = {r.doc_id: r for r in
           pk.remove_repeated_spans(_docs(spark, texts), k=3, min_docs=2).collect()}
    # the shared 4-token prefix is covered by two flagged 3-grams -> cut
    assert out[0].n_removed == 4 and out[0].clean_text == "one two three"
    assert out[1].n_removed == 4 and out[1].clean_text == "four five six"
    # unique docs pass through untouched
    assert out[2].n_removed == 0 and out[2].clean_text == texts[2]
    assert out[3].n_removed == 0 and out[3].clean_text == "ab"


def test_remove_repeated_spans_full_coverage_empties_doc(spark):
    texts = ["same same same same", "same same same same"]
    out = {r.doc_id: r for r in
           pk.remove_repeated_spans(_docs(spark, texts), k=3, min_docs=2).collect()}
    for d in (0, 1):
        assert out[d].n_removed == 4
        assert out[d].clean_text == ""


def test_semantic_dedup_accepts_trained_codebook_leaders(spark):
    # the 100 TB path: leaders come from the spherical-KMeans codebook
    # (ivf_kmeans_codebook) instead of the deterministic lowest-id stand-in;
    # the operator contract (full partition, keep-lowest-id per cluster)
    # must hold either way
    import numpy as np

    rng = np.random.RandomState(3)
    centers = np.eye(4)
    vecs = [
        (centers[i % 4] + 0.05 * rng.randn(4)).tolist() for i in range(80)
    ]
    df = _emb(spark, vecs)
    books = sim.ivf_kmeans_codebook(df, n_cells=4, sample_frac=1.0)
    leaders = [(i, c) for i, c in enumerate(books)]
    out = sim.semantic_dedup(df, threshold=0.995, leaders=leaders)
    rows = out.collect()
    assert len(rows) == 80 and {r.vec_id for r in rows} == set(range(80))
    assert {r.cluster_id for r in rows} <= {0, 1, 2, 3}
    # trained centroids recover the 4 planted clusters (each gets ~20)
    sizes = sorted(
        out.groupBy("cluster_id").count().toPandas()["count"].tolist()
    )
    assert len(sizes) == 4 and min(sizes) >= 10
    # every dropped member has a lower-id near-dup in ITS cluster
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        kept_ids = {r.vec_id for r in members if r.kept}
        assert min(m.vec_id for m in members) in kept_ids


def test_gopher_rules_per_rule_cases(spark):
    from ophidia_server_spark.pipeline.text import gopher_quality_flags

    rows = [
        (1, "the cat likes to be part of and that we have fun with " * 4),
        (2, "### ### ### word " * 10),          # symbol ratio fails
        (3, "- one\n- two\n- three\n- four"),   # bullet lines fail
        (4, "we go on...\nand on...\nmore..."),  # ellipsis lines fail
        (5, "1 2 3 4 5 6 7 8 9 10 " * 3),       # alpha-word ratio fails
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {
        r["doc_id"]: r.asDict()
        for r in gopher_quality_flags(df, min_words=5).collect()
    }
    assert got[1]["keep"] == 1
    assert got[2]["ok_symbol_ratio"] == 0 and got[2]["keep"] == 0
    assert got[3]["ok_bullet"] == 0
    assert got[4]["ok_ellipsis"] == 0
    assert got[5]["ok_alpha_words"] == 0
    assert got[6]["ok_word_count"] == 0 and got[6]["keep"] == 0


def test_dedup_lines_corpus_and_doc_scopes(spark):
    from ophidia_server_spark.pipeline.packing import dedup_lines

    rows = [
        (1, "alpha\nFOOTER\nalpha"),
        (2, "beta\nFOOTER\nbeta"),
        (3, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    corpus = {r["doc_id"]: r for r in dedup_lines(df).collect()}
    # footer kept only at its first occurrence (doc 1); within-doc repeats die
    assert corpus[1]["dedup_text"] == "alpha\nFOOTER"
    assert corpus[2]["dedup_text"] == "beta"
    assert corpus[3]["dedup_text"] == "" and corpus[3]["n_lines"] == 0
    assert corpus[1]["n_lines"] == 3 and corpus[1]["n_lines_kept"] == 2
    doc = {r["doc_id"]: r for r in dedup_lines(df, scope="doc").collect()}
    # doc scope: both docs keep their own footer copy, lose their repeat
    assert doc[1]["dedup_text"] == "alpha\nFOOTER"
    assert doc[2]["dedup_text"] == "beta\nFOOTER"
    import pytest as _pytest

    with _pytest.raises(ValueError):
        dedup_lines(df, scope="nope")


def test_dedup_lines_whitespace_only_documents(spark):
    from ophidia_server_spark.pipeline.packing import dedup_lines

    df = spark.createDataFrame(
        [(1, "\n\n\n"), (2, "  \n  "), (3, "real line")],
        "doc_id int, text string",
    )
    out = {r["doc_id"]: r for r in dedup_lines(df).collect()}
    assert out[1]["n_lines"] == 0 and out[1]["dedup_text"] == ""
    assert out[2]["n_lines"] == 0
    assert out[3]["dedup_text"] == "real line"


def test_pack_bins_ffd_handcrafted_layout(spark):
    # lengths 6,5,4,3,2 with max_len 8 in ONE bucket: FFD places
    # 6 -> bin0, 5 -> bin1, 4 -> bin2(6+4>8? no: bin0 cap 2, bin1 cap 3,
    # so 4 opens bin2), 3 -> bin1 (cap 3 fits), 2 -> bin0 (cap 2 fits)
    from pyspark.sql import functions as F

    from ophidia_server_spark.pipeline.packing import pack_bins

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * n)) for i, n in
         [(1, 6), (2, 5), (3, 4), (4, 3), (5, 2)]],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in
           pack_bins(docs, max_len=8, n_buckets=1).collect()}
    assert out[1]["bin_id"] == 0 and out[1]["bin_offset"] == 0
    assert out[2]["bin_id"] == 1 and out[2]["bin_offset"] == 0
    assert out[3]["bin_id"] == 2 and out[3]["bin_offset"] == 0
    assert out[4]["bin_id"] == 1 and out[4]["bin_offset"] == 5
    assert out[5]["bin_id"] == 0 and out[5]["bin_offset"] == 6
    assert all(r["oversize"] == 0 for r in out.values())

    # an oversize document gets its own flagged bin and blocks nothing
    docs2 = spark.createDataFrame(
        [(1, " ".join(["w"] * 20)), (2, " ".join(["w"] * 4)),
         (3, " ".join(["w"] * 4))],
        "doc_id long, text string",
    )
    o2 = {r["doc_id"]: r for r in
          pack_bins(docs2, max_len=8, n_buckets=1).collect()}
    assert o2[1]["oversize"] == 1
    assert o2[2]["bin_id"] == o2[3]["bin_id"] != o2[1]["bin_id"]
