"""Property-based checks for pipeline primitives: the zip_with-folded shingle
construction must agree with the naive Python definition for arbitrary token
lists, and the deterministic sampling coin must agree with a Python md5
re-implementation (the portability contract the DuckDB oracles rely on)."""

import hashlib

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from ophidia_server_spark.pipeline import sampling as smp
from ophidia_server_spark.pipeline.dedup import _shingles

token_st = st.text(
    alphabet=st.characters(whitelist_categories=("Ll", "Lu", "Nd")),
    min_size=1, max_size=6,
)
doc_st = st.lists(token_st, min_size=0, max_size=12)


def _naive_shingles(toks, k):
    return [" ".join(toks[i : i + k]) for i in range(max(0, len(toks) - k + 1))]


@settings(max_examples=20, deadline=None)
@given(st.lists(doc_st, min_size=1, max_size=8), st.integers(1, 4))
def test_shingles_match_naive_python(spark, docs, k):
    df = spark.createDataFrame(
        [(i, " ".join(toks)) for i, toks in enumerate(docs)],
        "doc_id int, text string",
    )
    got = {
        r.doc_id: list(r.s)
        for r in df.select("doc_id", _shingles("text", k).alias("s")).collect()
    }
    for i, toks in enumerate(docs):
        assert got[i] == _naive_shingles(toks, k), (toks, k)


@settings(max_examples=20, deadline=None)
@given(
    st.lists(st.integers(0, 10**9), min_size=1, max_size=30, unique=True),
    st.floats(0.05, 0.95),
    st.text(alphabet="abcxyz", max_size=4),
)
def test_sampling_coin_matches_python_md5(spark, keys, frac, salt):
    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    got = {r.doc_id for r in smp.hash_sample(df, frac, salt=salt).collect()}
    thr = smp._threshold_hex(frac)
    want = {
        k
        for k in keys
        if hashlib.md5(f"{k}:{salt}".encode()).hexdigest()[:8] < thr
    }
    assert got == want


@settings(max_examples=20, deadline=None)
@given(st.lists(st.integers(0, 10**9), min_size=1, max_size=30, unique=True))
def test_split_fractions_partition_the_keys(spark, keys):
    df = spark.createDataFrame([(k,) for k in keys], "doc_id long")
    tagged = smp.train_val_test_split(df, 0.3, 0.3).collect()
    assert len(tagged) == len(keys)
    assert {r.split for r in tagged} <= {"train", "val", "test"}
    # same keys, same salt, different call -> identical assignment
    again = {r.doc_id: r.split for r in smp.train_val_test_split(df, 0.3, 0.3).collect()}
    assert {r.doc_id: r.split for r in tagged} == again


def test_repetition_signals_flags_degenerate_docs(spark):
    from ophidia_server_spark.pipeline.text import repetition_signals

    docs = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam spam spam"),  # one token repeated
            (2, "go go go go stop stop stop stop go go go go"),  # duplicate bigrams
            (3, "alpha beta gamma delta epsilon zeta eta theta iota kappa "
                "lambda mu nu xi omicron pi rho sigma tau upsilon"),  # all distinct
            (4, ""),  # empty -> zero fractions, unflagged
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_signals(docs).collect()}
    assert got[1].flagged == 1 and got[1].top_token_frac == 1.0
    assert got[2].flagged == 1 and got[2].dup_bigram_frac > 0.5
    assert got[3].flagged == 0 and got[3].dup_bigram_frac == 0.0
    assert got[4].flagged == 0
    assert got[4].dup_bigram_frac == 0.0 and got[4].top_token_frac == 0.0


def test_pii_signals_and_redaction(spark):
    from ophidia_server_spark.pipeline import text as tx

    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@sub.example.org now"),
            (2, "server 192.168.0.1 and 10.0.0.255 up"),
            (3, "call +1 (415) 555-2671 or 555-867-5309"),
            (4, "ssn 123-45-6789 leaked"),
            (5, "clean text with numbers 12345 and v1.2 only"),
        ],
        "doc_id long, text string",
    )
    sig = {r["doc_id"]: r for r in tx.pii_signals(df).collect()}
    assert sig[1]["n_email"] == 1 and sig[1]["has_pii"]
    assert sig[2]["n_ipv4"] == 2
    assert sig[3]["n_phone"] == 2
    assert sig[4]["n_ssn"] == 1
    assert not sig[5]["has_pii"] and sig[5]["n_phone"] == 0

    red = {r["doc_id"]: r["text_redacted"] for r in tx.redact_pii(df).collect()}
    assert red[1] == "mail [EMAIL] now"
    assert red[2] == "server [IPV4] and [IPV4] up"
    assert red[4] == "ssn [SSN] leaked"  # SSN placeholder wins over phone
    assert red[5] == "clean text with numbers 12345 and v1.2 only"
    assert "[PHONE]" in red[3]


def test_bigram_logprob_no_forced_broadcast(spark, tables):
    # scale guard (round-6 item): the corpus-derived bigram stats tables are
    # joined WITHOUT a broadcast hint, so the join strategy is AQE's size
    # decision, not ours. With the broadcast threshold forced off the plan
    # must degrade to shuffled joins (the 100-TB shape, where the bigram
    # vocabulary outgrows every executor) and produce identical scores.
    from ophidia_server_spark.pipeline.text import bigram_logprob

    docs = tables["documents"].limit(300).cache()
    baseline = {
        r["doc_id"]: r["bigram_logprob"]
        for r in bigram_logprob(docs).collect()
    }
    thr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        df = bigram_logprob(docs)
        rows = {r["doc_id"]: r["bigram_logprob"] for r in df.collect()}
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, "hint would defeat the guard"
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thr)
    assert rows == baseline


def test_minhash_index_incremental_matches_batch_pairs(spark, tmp_path):
    # the incremental probe against a materialized index must reach the
    # same verdicts the one-shot pair generator reaches on the combined
    # corpus (restricted to cross-set pairs)
    import pyspark.sql.functions as F

    from ophidia_server_spark.pipeline import dedup as dd

    base = spark.createDataFrame(
        [(i, f"alpha beta gamma delta epsilon zeta{i % 7} eta theta") for i in range(40)],
        "doc_id long, text string",
    )
    idx = str(tmp_path / "mhidx")
    dd.minhash_index_build(base, idx)
    # batch: 5 verbatim copies + 5 novel token streams
    copies = base.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 1000).alias("doc_id"), "text"
    )
    novel = spark.createDataFrame(
        [(2000 + i, f"q{i}w{i}e{i} r{i}t{i}y{i} u{i}i{i}o{i} p{i}a{i}s{i}") for i in range(5)],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in dd.dedup_incremental(
        copies.unionByName(novel), idx
    ).collect()}
    for i in range(5):
        assert out[1000 + i]["is_novel"] == 0
        assert out[1000 + i]["est_jaccard"] == 1.0
    for i in range(5):
        assert out[2000 + i]["is_novel"] == 1
        assert out[2000 + i]["dup_of"] is None
    # growing the index = APPENDING only the batch's own banded rows (the
    # historical corpus is never re-shingled); after the append,
    # re-probing the same copies still flags them (idempotent), and the
    # appended novel docs are now known (no longer novel)
    dd.minhash_index_append(copies.unionByName(novel), idx)
    again = copies.unionByName(novel)
    out2 = {r["doc_id"]: r for r in dd.dedup_incremental(again, idx).collect()}
    assert all(out2[1000 + i]["is_novel"] == 0 for i in range(5))
    assert all(out2[2000 + i]["is_novel"] == 0 for i in range(5))
    assert all(out2[2000 + i]["est_jaccard"] == 1.0 for i in range(5))


def test_perplexity_buckets_sketch_agrees_with_ntile(spark):
    # the two formulations must assign near-identical tiers: the sketch
    # path's cutoffs are within alpha of the exact tertile boundaries, so
    # only boundary-adjacent docs may differ
    import pyspark.sql.functions as F

    from ophidia_server_spark.pipeline.text import perplexity_buckets

    # varying doc lengths + vocab give 300 DISTINCT scores: with heavy
    # score ties, ntile splits a tie group across tiers by doc_id while
    # thresholds keep it whole, and no agreement bound is meaningful
    docs = spark.createDataFrame(
        [(i, " ".join(f"t{(i * j * j + j) % 50}" for j in range(10 + i % 37)))
         for i in range(300)],
        "doc_id long, text string",
    )
    exact = perplexity_buckets(docs, method="ntile")
    approx = perplexity_buckets(docs, method="sketch")
    j = exact.select("doc_id", F.col("bucket").alias("b1")).join(
        approx.select("doc_id", F.col("bucket").alias("b2")), "doc_id"
    )
    n = j.count()
    agree = j.filter(F.col("b1") == F.col("b2")).count()
    assert n == 300
    assert agree / n > 0.9, (agree, n)
    # tier populations stay balanced (each within 25% of n/3)
    sizes = {r["bucket"]: r["cnt"] for r in
             approx.groupBy("bucket").agg(F.count("*").alias("cnt")).collect()}
    assert set(sizes) == {"head", "middle", "tail"}
    assert all(abs(v - 100) <= 25 for v in sizes.values()), sizes
    # the sketch path has no global-sort window over the corpus
    plan = approx._jdf.queryExecution().optimizedPlan().toString()
    assert "ntile" not in plan.lower()


def test_patchify_means_match_numpy_reference(spark):
    import numpy as np
    import pandas as pd  # noqa: F401

    from ophidia_server_spark.pipeline.multimodal import patchify_rgb

    rng = np.random.default_rng(7)
    frames = [rng.integers(0, 256, size=(8, 8, 3), dtype=np.uint8) for _ in range(3)]
    rows = [(i, f.tobytes()) for i, f in enumerate(frames)] + [(99, b"short")]
    df = spark.createDataFrame(rows, "doc_id long, payload binary")
    got = patchify_rgb(df, 8, 8, 4).collect()
    by_key = {(r["doc_id"], r["patch_row"], r["patch_col"]): r for r in got}
    for i, f in enumerate(frames):
        grid = f.reshape(2, 4, 2, 4, 3).astype("float64").mean(axis=(1, 3))
        for r in range(2):
            for c in range(2):
                row = by_key[(i, r, c)]
                assert row["ok"] == 1
                assert abs(row["mean_r"] - grid[r, c, 0]) < 1e-9
                assert abs(row["mean_b"] - grid[r, c, 2]) < 1e-9
    assert by_key[(99, -1, -1)]["ok"] == 0

    import pytest as _pytest

    with _pytest.raises(ValueError):
        patchify_rgb(df, 8, 7, 4)


def test_jaccard_join_prefix_equals_bruteforce(spark):
    """The prefix filter is LOSSLESS: against a corpus constructed with
    boilerplate-heavy near-dups, the prefix join returns exactly the
    brute-force all-pairs result."""
    from ophidia_server_spark.pipeline.dedup import (
        jaccard_join_prefix,
        ngram_jaccard_exact,
    )

    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [
        (0, base),
        (1, base + " extra"),                      # near-dup of 0
        (2, "one two three four five six seven"),
        (3, "one two three four five six eight"),  # near-dup of 2
        (4, "totally different words here now"),
        # boilerplate shared by everything (hot shingles)
        (5, "the quick brown fox " + base),
        (6, "lorem ipsum dolor sit amet " + "x y z " * 5),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    for t in (0.3, 0.5, 0.8):
        got = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in jaccard_join_prefix(df, threshold=t).collect()
        }
        exact = {
            (r["id_a"], r["id_b"], r["jaccard"])
            for r in ngram_jaccard_exact(df, threshold=t).collect()
        }
        assert got == exact, f"threshold {t}: {got ^ exact}"


def test_jaccard_join_prefix_rejects_bad_threshold(spark):
    import pytest as _pytest

    from ophidia_server_spark.pipeline.dedup import jaccard_join_prefix

    df = spark.createDataFrame([(0, "a b c d")], "doc_id long, text string")
    with _pytest.raises(ValueError):
        jaccard_join_prefix(df, threshold=0.0)


def test_dedup_keep_best_picks_highest_score_smallest_id(spark):
    from ophidia_server_spark.pipeline.dedup import dedup_keep_best

    rows = [(1, "k1", 10), (2, "k1", 30), (3, "k1", 30),  # tie -> id 2
            (4, "k2", 5)]
    df = spark.createDataFrame(rows, "doc_id long, key string, score long")
    got = {r["dup_key"]: r for r in dedup_keep_best(df, "key", "score").collect()}
    assert got["k1"]["kept_id"] == 2 and got["k1"]["kept_score"] == 30
    assert got["k1"]["n_dropped"] == 2
    assert got["k2"]["kept_id"] == 4 and got["k2"]["n_dropped"] == 0


def test_containment_join_prefix_equals_bruteforce_and_is_directional(spark):
    from pyspark.sql import functions as F

    from ophidia_server_spark.pipeline.dedup import (
        containment_join_prefix,
        shingle_sets,
    )

    big = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    docs = [
        (0, big),
        (1, "alpha beta gamma delta epsilon"),  # contained in 0
        (2, "zzz yyy xxx www"),
        (3, big + " " + big),                   # same shingle set as 0 + joins
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r["id_a"], r["id_b"]): r["containment"]
        for r in containment_join_prefix(df, threshold=0.8).collect()
    }
    # brute force over full shingle sets
    sh = {r["doc_id"]: set(r["shingles"]) for r in shingle_sets(df).collect()}
    exact = {}
    for a in sh:
        for b in sh:
            if a != b and sh[a]:
                c = len(sh[a] & sh[b]) / len(sh[a])
                if c >= 0.8:
                    exact[(a, b)] = round(c, 6)
    assert got == exact
    # directionality: 1 is contained in 0, not vice versa
    assert (1, 0) in got and (0, 1) not in got


def test_dhash_gray_known_pattern_and_poison(spark):
    from ophidia_server_spark.pipeline.multimodal import dhash_gray

    # left-bright / right-dark gradient: every brighter-than-right bit
    # fires -> all 64 bits set -> both words = 2^32 - 1
    grad = bytes(
        255 - (c // 2) * 20 for _ in range(16) for c in range(18)
    )
    flat = bytes(7 for _ in range(288))  # no bit fires
    poison = b"short"
    df = spark.createDataFrame(
        [(1, grad), (2, flat), (3, poison)], "doc_id long, payload binary"
    )
    got = {r["doc_id"]: r for r in dhash_gray(df, 18, 16).collect()}
    assert got[1]["ok"] == 1
    assert got[1]["code_lo"] == 2**32 - 1 and got[1]["code_hi"] == 2**32 - 1
    assert got[2]["code_lo"] == 0 and got[2]["code_hi"] == 0
    assert got[3]["ok"] == 0 and got[3]["code_lo"] is None
    # near-dup invariance: one-pixel noise keeps the hash
    noisy = bytearray(grad)
    noisy[40] = max(0, noisy[40] - 3)
    df2 = spark.createDataFrame(
        [(9, bytes(noisy))], "doc_id long, payload binary"
    )
    r9 = dhash_gray(df2, 18, 16).first()
    assert (r9["code_lo"], r9["code_hi"]) == (
        got[1]["code_lo"], got[1]["code_hi"]
    )


def test_dhash_gray_rejects_bad_grid(spark):
    import pytest as _pytest

    from ophidia_server_spark.pipeline.multimodal import dhash_gray

    df = spark.createDataFrame([(1, b"")], "doc_id long, payload binary")
    with _pytest.raises(ValueError):
        dhash_gray(df, 10, 16)


def test_dedup_keep_best_string_ids(spark):
    from ophidia_server_spark.pipeline.dedup import dedup_keep_best

    rows = [("docB", "k1", 10), ("docA", "k1", 10), ("docC", "k1", 30)]
    df = spark.createDataFrame(rows, "doc_id string, key string, score long")
    r = dedup_keep_best(df, "key", "score").first()
    assert r["kept_id"] == "docC" and r["kept_score"] == 30
    # tie among string ids goes to the lexicographically smallest
    tie = dedup_keep_best(df.filter("doc_id != 'docC'"), "key", "score").first()
    assert tie["kept_id"] == "docA"


def test_unique_shingle_sets_separator_cannot_collide(spark):
    """Two DIFFERENT shingle sets whose concat could be ambiguous under a
    separator-based key must land in different rep groups (the key is
    md5-of-per-shingle-md5s, fixed width per element)."""
    from ophidia_server_spark.pipeline.dedup import _unique_shingle_sets

    # tokens may legally contain \x01 (whitespace split keeps it)
    d1 = "a b c\x01d e f g h i"
    d2 = "a b c d\x01e f g h i"
    df = spark.createDataFrame(
        [(1, d1), (2, d2)], "doc_id long, text string"
    )
    members, reps = _unique_shingle_sets(df, "text", 3, "doc_id")
    assert reps.count() == 2  # distinct sets -> distinct rep keys


def test_jaccard_join_prefix_custom_id_col(spark):
    from ophidia_server_spark.pipeline.dedup import jaccard_join_prefix

    df = spark.createDataFrame(
        [(100, "one two three four five"), (200, "one two three four five")],
        "my_id long, text string",
    )
    got = jaccard_join_prefix(df, threshold=0.5, id_col="my_id").collect()
    assert len(got) == 1
    r = got[0]
    assert (r["id_a"], r["id_b"], r["jaccard"]) == (100, 200, 1.0)


def test_random_project_excludes_mismatched_width(spark):
    from ophidia_server_spark.pipeline.similarity import random_project

    df = spark.createDataFrame(
        [(1, [0.5] * 64), (2, [0.5] * 63)],  # 2 is corrupt
        "vec_id long, embedding array<float>",
    )
    out = random_project(df, out_dim=16, in_dim=64)
    ids = {r["vec_id"] for r in out.collect()}
    assert ids == {1}


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.integers(0, 3),                  # day offset
            st.floats(0.5, 99.5),               # value
        ),
        min_size=1, max_size=24,
    ),
    st.sampled_from([0.3, 0.5, 0.8]),
)
def test_ewma_matches_python_recurrence(spark, points, alpha):
    import datetime as dt

    from ophidia_server_spark.streaming.windows import ewma_by_key

    base = dt.datetime(2024, 1, 1)
    rows = [
        ("k", base + dt.timedelta(days=d), round(v, 2)) for d, v in points
    ]
    df = spark.createDataFrame(rows, "event_type string, ts timestamp, value double")
    got = {r["day"][:10]: r["ewma"] for r in ewma_by_key(df, alpha=alpha, k=8).collect()}
    # python recompute over the observed-day series
    from collections import defaultdict
    from decimal import Decimal

    daily = defaultdict(Decimal)
    for d, v in points:
        daily[d] += Decimal(str(round(v, 2)))
    days = sorted(daily)
    series = [float(daily[d]) for d in days]
    for i, d in enumerate(days):
        num, den = series[i], 1.0
        for j in range(1, min(8, i + 1)):
            w = (1.0 - alpha) ** j
            num, den = num + series[i - j] * w, den + w
        key = (base + dt.timedelta(days=d)).strftime("%Y-%m-%d")
        assert got[key] == round(num / den, 6), (points, alpha, d)


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.tuples(st.integers(1, 3), st.integers(0, 50),
                  st.sampled_from("abc")),
        min_size=2, max_size=40, unique_by=lambda t: (t[0], t[1]),
    )
)
def test_transition_matrix_matches_python(spark, events):
    import datetime as dt
    from collections import Counter, defaultdict

    from ophidia_server_spark.streaming.windows import transition_matrix

    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, u, base + dt.timedelta(minutes=m), t)
        for i, (u, m, t) in enumerate(events)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, user_id long, ts timestamp, event_type string"
    )
    got = {
        (r["from_type"], r["to_type"]): (r["n"], r["prob"])
        for r in transition_matrix(df, gap_minutes=30).collect()
    }
    # python recompute: per user ordered by (ts, event_id), 30-min gaps break
    per_user = defaultdict(list)
    for i, (u, m, t) in enumerate(events):
        per_user[u].append((m * 60, i, t))
    counts = Counter()
    for seq in per_user.values():
        seq.sort()
        for (s0, _, t0), (s1, _, t1) in zip(seq, seq[1:]):
            if s1 - s0 <= 1800:
                counts[(t0, t1)] += 1
    tot = Counter()
    for (a, _), c in counts.items():
        tot[a] += c
    want = {
        k: (c, round(c / tot[k[0]], 6)) for k, c in counts.items()
    }
    assert got == want, events


def test_blocked_link_best_match_and_blocking_contract(spark):
    from ophidia_server_spark.pipeline.dedup import blocked_link

    left = spark.createDataFrame(
        [(1, "jonathan smith", "j"), (2, "mary jones", "m"),
         (3, "zz totally unique", "z")],
        "left_id long, left_text string, block string",
    )
    right = spark.createDataFrame(
        [(10, "jonathan smyth", "j"),   # dist 1 to left 1
         (11, "jonathan smith", "j"),   # dist 0 to left 1 -> best
         (12, "mary jonez", "m"),       # dist 1 to left 2
         (13, "mary jones", "x"),       # TRUE match, WRONG block: unseen
         (14, "zz wholly distinct", "z")],  # dist > 2: cut
        "right_id long, right_text string, block string",
    )
    got = {
        r["left_id"]: (r["right_id"], r["edit_distance"])
        for r in blocked_link(left, right, max_edit=2).collect()
    }
    # best match per left row: exact beats dist-1; ties broken by right id
    assert got == {1: (11, 0), 2: (12, 1)}
    # left 3's only same-block candidate is beyond max_edit -> no row;
    # left 2's PERFECT match in another block was never compared (the
    # documented blocking contract)
    assert 3 not in got


def test_blocked_link_tiebreak_min_right_id(spark):
    from ophidia_server_spark.pipeline.dedup import blocked_link

    left = spark.createDataFrame(
        [(1, "abcd", "b")], "left_id long, left_text string, block string"
    )
    right = spark.createDataFrame(
        [(20, "abcx", "b"), (10, "abcy", "b")],
        "right_id long, right_text string, block string",
    )
    got = blocked_link(left, right, max_edit=2).collect()
    assert [(r["left_id"], r["right_id"], r["edit_distance"]) for r in got] == [
        (1, 10, 1)
    ]


def test_dhash_near_dup_lossless_bands(spark):
    import pytest as _pytest

    from ophidia_server_spark.pipeline.multimodal import dhash_near_dup

    # constructed 64-bit codes with known pairwise Hamming distances:
    #   1 vs 2: 0   (identical)
    #   1 vs 3: 3   (three bits in ONE band — the worst case banding must
    #                still catch via the other three equal bands)
    #   1 vs 4: 4   (one bit flipped in EVERY band -> no equal band, and
    #                correctly outside the <=3 radius anyway)
    #   5: ok=0 poison — never pairs despite being identical to 1
    base_lo, base_hi = 0x12345678, 0x0ABCDEF0
    rows = [
        (1, 1, base_lo, base_hi),
        (2, 1, base_lo, base_hi),
        (3, 1, base_lo ^ 0b111, base_hi),
        (4, 1, base_lo ^ 0x00010001, base_hi ^ 0x00010001),
        (5, 0, base_lo, base_hi),
    ]
    codes = spark.createDataFrame(
        rows, "doc_id long, ok int, code_lo long, code_hi long"
    )
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in dhash_near_dup(codes, max_hamming=3).collect()
    }
    assert got == {(1, 2): 0, (1, 3): 3, (2, 3): 3}
    with _pytest.raises(ValueError, match="lossless"):
        dhash_near_dup(codes, max_hamming=4)


def test_template_prefixes_counts_and_short_docs(spark):
    from ophidia_server_spark.pipeline.text import template_prefixes

    rows = [
        (1, "terms of service apply to everything here", "a"),
        (2, "terms of service apply again and again", "a"),
        (3, "terms of service apply forever", "a"),
        (4, "terms of service apply elsewhere", "b"),  # other source
        (5, "completely original writing", "a"),
        (6, "tiny doc", "a"),   # shorter than k_tokens: whole text is prefix
        (7, "tiny doc", "a"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    got = {
        r["doc_id"]: (r["n_sharing"], r["is_template"])
        for r in template_prefixes(df, k_tokens=4, min_docs=3).collect()
    }
    # the three source-a banner docs share the 4-token prefix; source b's
    # copy counts separately (per-source grouping)
    assert got[1] == (3, 1) and got[2] == (3, 1) and got[3] == (3, 1)
    assert got[4] == (1, 0)
    assert got[5] == (1, 0)
    # short docs: whole token list as prefix; two copies < min_docs
    assert got[6] == (2, 0) and got[7] == (2, 0)


def test_blocked_link_hot_block_guard_raises(spark):
    import pytest as _pytest

    from ophidia_server_spark.pipeline.dedup import (
        BlockCardinalityError, blocked_link,
    )

    # one hot block: 40 x 40 = 1600 candidates, budget 1000 -> named error
    left = spark.createDataFrame(
        [(i, f"name {i}", "hot") for i in range(40)],
        "left_id long, left_text string, block string",
    )
    right = spark.createDataFrame(
        [(i, f"name {i}", "hot") for i in range(40)],
        "right_id long, right_text string, block string",
    )
    with _pytest.raises(BlockCardinalityError, match="'hot': 40 x 40"):
        blocked_link(left, right, max_block_product=1000)


def test_blocked_link_cap_blocks_restores_budget_and_warns(spark):
    import pytest as _pytest

    from ophidia_server_spark.pipeline.dedup import blocked_link

    # hot block (40x40) + a small clean block; cap_blocks=5 bounds the hot
    # block to 5x5 — capped total 25 + 1 <= budget, the warning carries the
    # exact dropped count, and the clean block's match is untouched
    left = spark.createDataFrame(
        [(i, f"aaaa{i:02d}", "hot") for i in range(40)]
        + [(100, "mary jones", "m")],
        "left_id long, left_text string, block string",
    )
    right = spark.createDataFrame(
        [(i, f"aaaa{i:02d}", "hot") for i in range(40)]
        + [(200, "mary jonez", "m")],
        "right_id long, right_text string, block string",
    )
    with _pytest.warns(UserWarning, match="1,575 candidate pairs dropped"):
        got = {
            r["left_id"]: (r["right_id"], r["edit_distance"])
            for r in blocked_link(
                left, right, max_block_product=1000, cap_blocks=5
            ).collect()
        }
    # clean block unaffected; hot block keeps its 5 smallest-id rows per
    # side (ids 0-4 on both), whose exact matches survive
    assert got[100] == (200, 1)
    assert {k for k in got if k < 100} == {0, 1, 2, 3, 4}
    assert all(got[k] == (k, 0) for k in range(5))


def test_blocked_link_guard_under_budget_is_invisible(spark):
    from ophidia_server_spark.pipeline.dedup import blocked_link

    # default budget never trips on sane blocks, and results are identical
    # with the guard disabled entirely
    left = spark.createDataFrame(
        [(1, "jonathan smith", "j"), (2, "mary jones", "m")],
        "left_id long, left_text string, block string",
    )
    right = spark.createDataFrame(
        [(10, "jonathan smyth", "j"), (12, "mary jonez", "m")],
        "right_id long, right_text string, block string",
    )
    guarded = sorted(
        tuple(r) for r in blocked_link(left, right).collect()
    )
    unguarded = sorted(
        tuple(r)
        for r in blocked_link(
            left, right, max_block_product=None, cap_blocks=None
        ).collect()
    )
    assert guarded == unguarded == [(1, 10, 1), (2, 12, 1)]
