"""Scale smoke: representative operators over millions of generated rows.

Not a benchmark — a guard against accidental driver-side materialization
(collect/toPandas in a hot path) and against plans that only work at fixture
size. Sizes are chosen to finish in seconds on local[8] while being ~50x the
sf0.1 fixtures; the operators under test are the ones whose scale story the
README claims (cube build -> reduce, sessionize, minhash signatures,
deterministic sampling)."""

import pytest
from pyspark.sql import functions as F

N_EVENTS = 2_000_000
N_DOCS = 30_000


@pytest.fixture(scope="module")
def big_events(spark):
    # 2M synthetic events across 5k users / 30 days, built distributed
    return (
        spark.range(N_EVENTS)
        .select(
            F.col("id").alias("event_id"),
            (F.timestamp_seconds(F.lit(1700000000) + (F.col("id") % 2_592_000))).alias("ts"),
            (F.col("id") % 5000).alias("user_id"),
            F.concat(F.lit("t"), (F.col("id") % 7).cast("string")).alias("event_type"),
            (F.col("id") % 1000 / 10.0).alias("value"),
        )
    )


def test_cube_build_reduce_at_scale(spark, big_events):
    from ophidia_server_spark.cube import build_cube
    from ophidia_server_spark.operators import cube_ops as C

    c = build_cube(
        big_events.withColumn("day", F.dayofmonth("ts")),
        ["event_type", "user_id"], "day", F.col("value"), measure="v",
    )
    out = C.oph_reduce(c, "sum")
    # 7 types x 5000 users rows, nothing collected until here
    assert out.count() == 35_000


def test_sessionize_at_scale(spark, big_events):
    from ophidia_server_spark.streaming import windows as win

    n = win.sessionize(big_events, gap_minutes=30).count()
    assert n >= 5000  # at least one session per user


def test_minhash_signatures_at_scale(spark):
    from ophidia_server_spark.pipeline.dedup import minhash_signatures

    words = F.array(*[F.lit(f"w{i}") for i in range(50)])
    docs = spark.range(N_DOCS).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(
            " ",
            F.transform(
                F.sequence(F.lit(1), F.lit(30)),
                lambda i: F.element_at(words, ((F.col("id") + i * 7) % 50 + 1).cast("int")),
            ),
        ).alias("text"),
    )
    sigs = minhash_signatures(docs)
    assert sigs.count() == N_DOCS
    row = sigs.first()
    assert len(row.sig) == 32


def test_sampling_at_scale_rate(spark):
    from ophidia_server_spark.pipeline.sampling import hash_sample

    df = spark.range(1_000_000).select(F.col("id").alias("doc_id"))
    got = hash_sample(df, 0.2).count()
    # binomial(1M, 0.2): 3 sigma ~ 1200
    assert abs(got - 200_000) < 5_000


def test_connected_components_distributed_at_scale(spark):
    # 400k edges (> DRIVER_CC_MAX_EDGES) -> the large-star/small-star path
    # runs with no driver-side edge materialization; clusters of 100 nodes
    # built as star+chain so convergence exercises both rules.
    from ophidia_server_spark.pipeline import dedup as dd

    n = 200_000
    nodes = spark.range(n)
    star = nodes.filter("id % 100 != 0").select(
        F.col("id").alias("doc_a"), (F.col("id") - F.col("id") % 100).alias("doc_b")
    )
    chain = nodes.filter("id % 100 != 0").select(
        F.col("id").alias("doc_a"), (F.col("id") - 1).alias("doc_b")
    )
    out = dd.cluster_pairs(star.union(chain))
    assert out.count() == n
    wrong = out.filter(
        F.col("cluster_rep") != F.col("doc_id") - F.col("doc_id") % 100
    ).count()
    assert wrong == 0


def test_vector_store_build_probe_at_scale(spark, tmp_path):
    # 100k synthetic 32-dim vectors (50x the sf0.1 fixture): the build must
    # produce byte-scaled writer output (no per-bucket file explosion) and
    # the probe plan must scan ONLY the probed partitions — the
    # import-once/query-many contract the README claims
    import os

    from ophidia_server_spark.pipeline import vector_store as vs

    n, dim, cells = 100_000, 32, 16
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(dim)),
            lambda i: F.sin(F.col("id") % 997 * i).cast("float"),
        ).alias("embedding"),
    )
    path = str(tmp_path / "big_ivf")
    idx = vs.ivf_build(emb, path, n_cells=cells)
    data_files = [
        os.path.join(dp, f)
        for dp, _, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    ]
    # 100k x 32 floats ~ 26MB raw < one 128MB target file per... the byte
    # policy floors at ceil(16/32)=1 writer: bounded small-file count
    assert len(data_files) <= cells
    q = [0.5] * dim
    top = vs.ivf_probe(spark, idx, q, k=5, nprobe=4)
    assert top.count() == 5
    # partition pruning: the scan must carry a __cell partition filter
    explained = top._jdf.queryExecution().toString()
    assert "__cell" in explained


def test_pack_and_shuffle_at_scale(spark):
    # training-batch prep over 200k docs: the only shuffles are the
    # per-bucket/per-shard windows — nothing collects, file-count-many
    # parallel streams
    from ophidia_server_spark.pipeline.packing import global_shuffle, pack_sequences

    docs = spark.range(200_000).select(
        F.col("id").alias("doc_id"),
        F.concat_ws(" ", F.array_repeat(F.lit("tok"), (F.col("id") % 50 + 1).cast("int")))
        .alias("text"),
    )
    packed = pack_sequences(docs, seq_len=2048, n_buckets=256)
    assert packed.count() == 200_000
    # offsets are dense: total tokens == last end offset summed per bucket
    totals = packed.groupBy("bucket").agg(
        F.max(F.col("start_offset") + F.col("n_tokens")).alias("hi"),
        F.sum("n_tokens").alias("n"),
    )
    assert totals.filter(F.col("hi") != F.col("n")).count() == 0
    sh = global_shuffle(docs, n_shards=256)
    assert sh.count() == 200_000
    assert sh.select("shard").distinct().count() == 256


def test_sketch_triad_at_scale(spark, big_events):
    # 2M events -> three sketches; each result is bounded rows, no collect
    from ophidia_server_spark.functions import sketches as sk

    regs = sk.hll_registers(big_events, "user_id")
    assert regs.count() <= 256
    est = sk.hll_estimate(regs).first()
    assert abs(est.estimate - 5000) / 5000 < 0.26
    cms = sk.cms_sketch(big_events, "user_id", d=4, w=2048)
    assert cms.count() <= 4 * 2048
    dds = sk.dds_sketch(big_events.filter(F.col("value") > 0), "value")
    assert dds.count() < 3000  # log-spaced buckets, not value cardinality


def test_repeated_ngram_hot_gram_at_scale(spark):
    # One boilerplate trigram planted in 50% of 60k docs — the hot-key shape
    # a gram-partitioned window would serialize into a single straggler
    # task. The groupBy-based document frequency must digest it via map-side
    # partials without skew (and get the counts right).
    from ophidia_server_spark.pipeline.packing import repeated_ngram_stats

    docs = spark.range(60_000).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 2 == 0,
            F.concat(F.lit("one of the boiler plates u"), F.col("id").cast("string")),
        )
        .otherwise(F.concat(F.lit("unique text piece v"), F.col("id").cast("string")))
        .alias("text"),
    )
    out = repeated_ngram_stats(docs, k=3, min_docs=2)
    assert out.count() == 60_000
    # hot docs: 4 trigrams ("one of the", "of the boiler", "the boiler plates",
    # "boiler plates uN"), the first three shared by all 30k hot docs
    hot = out.filter(F.col("doc_id") % 2 == 0)
    assert hot.filter(F.col("n_grams") != 4).count() == 0
    assert hot.filter(F.col("n_repeated") != 3).count() == 0
    # cold docs: 2 trigrams, "unique text piece" shared by all 30k of them
    # (a second hot gram), "text piece vN" unique
    cold = out.filter(F.col("doc_id") % 2 == 1)
    assert cold.filter(F.col("n_grams") != 2).count() == 0
    assert cold.filter(F.col("n_repeated") != 1).count() == 0


def test_dedup_lines_hot_boilerplate_at_scale(spark):
    # The same hot-key shape for line dedup: one footer line in 50% of 60k
    # docs. The min-struct first-owner aggregation must absorb it map-side
    # and keep the footer in exactly one document.
    from ophidia_server_spark.pipeline.packing import dedup_lines

    docs = spark.range(60_000).select(
        F.col("id").alias("doc_id"),
        F.when(
            F.col("id") % 2 == 0,
            F.concat(
                F.lit("unique line u"), F.col("id").cast("string"),
                F.lit("\nHOT FOOTER LINE"),
            ),
        )
        .otherwise(F.concat(F.lit("solo line v"), F.col("id").cast("string")))
        .alias("text"),
    )
    out = dedup_lines(docs)
    assert out.count() == 60_000
    kept_footer = out.filter(
        F.col("dedup_text").contains("HOT FOOTER LINE")
    ).count()
    assert kept_footer == 1
    # the first owner by (doc_id, line_no) is doc 0
    first = out.filter(F.col("doc_id") == 0).first()
    assert "HOT FOOTER LINE" in first["dedup_text"]
    # every hot doc keeps its unique line
    lost = out.filter(
        (F.col("doc_id") % 2 == 0) & (F.col("n_lines_kept") < 1)
    ).count()
    assert lost == 0


def test_percentile_rank_hot_group_at_scale(spark):
    # One event_type holds 90% of 2M rows. The agg+join ECDF must not sort
    # the hot group in a single task: the residual window runs over the
    # (group, distinct value) table — 1000 distinct values here — while the
    # old raw-row cume_dist window would put 1.8M rows in one partition.
    from ophidia_server_spark.pipeline.features import percentile_rank_by_group

    ev = spark.range(2_000_000).select(
        F.col("id").alias("event_id"),
        F.when(F.col("id") % 10 < 9, F.lit("hot"))
        .otherwise(F.lit("cold")).alias("event_type"),
        (F.col("id") % 1000 / 10.0).alias("value"),
    )
    out = percentile_rank_by_group(ev, "value", "event_type")
    assert out.count() == 2_000_000
    # ECDF endpoints: the max value ranks 1.0 in both groups
    top = out.filter(F.col("value") == 99.9).select("pct_rank").distinct().collect()
    assert [r["pct_rank"] for r in top] == [1.0]
    # no raw-event-sized window partition in the plan: the only window
    # operators run over the aggregated distinct-value table
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "cume_dist" not in plan


def test_contrastive_negative_fanin_is_anchor_bounded(spark):
    # A 1M-document pool with 3 pair anchors: the negative-sampling join
    # must touch the <=3-rows-per-bucket shortlist, not the n/8 bucket
    # membership (which would be 125k candidate rows per anchor here).
    from ophidia_server_spark.pipeline.contrastive import contrastive_triplets

    pool = spark.range(1_000_000).select(F.col("id").alias("doc_id"))
    pairs = spark.createDataFrame(
        [(1, 2, 0.9), (10, 11, 0.8), (500_000, 500_001, 0.7)],
        "id_a long, id_b long, jaccard double",
    )
    trip = contrastive_triplets(pool, pairs, n_buckets=8)
    rows = trip.collect()
    # every anchor (both pair directions) gets a valid negative
    assert len(rows) == 6
    for r in rows:
        assert r["negative"] not in (r["anchor"], r["positive"])
    # deterministic under repartitioning
    again = contrastive_triplets(pool.repartition(13), pairs, n_buckets=8)
    assert {tuple(r) for r in rows} == {tuple(r) for r in again.collect()}


def test_string_index_large_vocab_path_matches_window_path(spark):
    # Same ids from the range-repartition path and the unpartitioned-window
    # path on a shared 5k-distinct column, then the large path alone on a
    # 1M-distinct id-like column (the shape the window path must never see).
    from ophidia_server_spark.pipeline.features import string_index

    small = spark.range(50_000).select(
        F.concat(F.lit("v"), (F.col("id") % 5000).cast("string")).alias("k")
    )
    _, via_window = string_index(small, "k", max_window_vocab=100_000)
    _, via_range = string_index(small, "k", max_window_vocab=100)
    a = {(r["value"], r["n"], r["idx"]) for r in via_window.collect()}
    b = {(r["value"], r["n"], r["idx"]) for r in via_range.collect()}
    assert a == b and len(a) == 5000

    big = spark.range(1_000_000).select(
        F.concat(F.lit("id"), F.col("id").cast("string")).alias("k")
    )
    out, vocab = string_index(big, "k", max_window_vocab=65536)
    assert vocab.count() == 1_000_000
    # all-distinct: frequency ties everywhere, ids follow value ASC
    assert vocab.agg(F.min("idx"), F.max("idx")).first() == (0, 999_999)
    first = vocab.orderBy("idx").first()
    assert first["value"] == "id0" and first["idx"] == 0
