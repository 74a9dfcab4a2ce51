"""Text-analysis operators over a documents table.

All hot paths are JVM-side expressions (split/filter/aggregate higher-order
functions) — no Python UDFs — so they scale linearly over 100 TB of text with
zero shuffle (pure map stages; Catalyst fuses them into one WholeStageCodegen
span per scan).

Deterministic by construction so every operator is DuckDB-oracle checkable.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small English function-word list for the language-ID / quality heuristics
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

TOKEN_SPLIT = r"\s+"

FINGERPRINT_MOD = 1_000_000_007
FINGERPRINT_BASE = 31


def tokens(col: Column) -> Column:
    """Whitespace tokenization of trimmed text; empty text -> empty array."""
    return F.filter(F.split(F.trim(col), TOKEN_SPLIT), lambda t: t != "")


def token_count(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Token counting (whitespace tokenizer): doc_id, n_tokens, n_chars."""
    return df.select(
        "doc_id",
        F.size(tokens(F.col(text_col))).cast("long").alias("n_tokens"),
        F.length(text_col).cast("long").alias("n_chars_measured"),
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality scoring: length/stopword/mean-token-length features plus a
    composite score. Mirrors common LLM-corpus quality filters (doc length,
    stopword ratio, token-length sanity).

    Staged selects are deliberate: each stage aliases a non-trivial expression
    (tokenize, then per-feature array traversals) so Catalyst's CollapseProject
    keeps ONE copy of each — inlining everything into one projection would
    re-tokenize per feature (~4x slower, measured at sf0.1)."""
    toked = df.select("doc_id", tokens(F.col(text_col)).alias("__toks"))
    toks = F.col("__toks")
    feats = toked.select(
        "doc_id",
        F.size(toks).alias("__n"),
        F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS))).alias("__stop"),
        F.aggregate(
            F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
        ).alias("__chars"),
    )
    n = F.col("__n")
    ratios = feats.select(
        "doc_id",
        n,
        F.when(n > 0, F.col("__stop").cast("double") / n.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("__sr"),
        F.when(n > 0, F.col("__chars").cast("double") / n.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("__mt"),
    )
    sr, mt = F.col("__sr"), F.col("__mt")
    score = (
        F.when((n >= 10) & (n <= 1000), F.lit(1.0)).otherwise(F.lit(0.0))
        + F.when((sr >= 0.01) & (sr <= 0.5), F.lit(1.0)).otherwise(F.lit(0.0))
        + F.when((mt >= 2.0) & (mt <= 12.0), F.lit(1.0)).otherwise(F.lit(0.0))
    ) / F.lit(3.0)
    return ratios.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        F.round(sr, 6).alias("stopword_ratio"),
        F.round(mt, 6).alias("mean_token_len"),
        F.round(score, 6).alias("quality"),
    )


def lang_id(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Language ID heuristic: English function-word hit ratio. Predicts 'en'
    when >= 3% of tokens are English stopwords, else 'unknown'. (A real n-gram
    model slots in behind the same signature; the point is the distributed
    shape: pure map, no shuffle.)"""
    toked = df.select("doc_id", tokens(F.col(text_col)).alias("__toks"))
    toks = F.col("__toks")
    feats = toked.select(
        "doc_id",
        F.size(toks).alias("__n"),
        F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS))).alias("__stop"),
    )
    n = F.col("__n")
    ratio = F.when(n > 0, F.col("__stop").cast("double") / n.cast("double")).otherwise(F.lit(0.0))
    return feats.select(
        "doc_id",
        F.when(ratio >= 0.03, F.lit("en")).otherwise(F.lit("unknown")).alias("pred_lang"),
    )


def fingerprint(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Document fingerprinting: polynomial rolling hash over token codes.

    code(tok) = length(tok)*131 + ascii(first char); fp = fold over tokens of
    (acc*31 + code) mod 1e9+7. Deterministic, engine-portable (plain BIGINT
    arithmetic — the DuckDB oracle reproduces it with list_reduce)."""
    toks = tokens(F.col(text_col))
    codes = F.transform(toks, lambda t: (F.length(t) * 131 + F.ascii(t)).cast("long"))
    fp = F.aggregate(
        codes,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * FINGERPRINT_BASE + c) % FINGERPRINT_MOD,
    )
    return df.select("doc_id", fp.alias("fingerprint"))


BPE_ISH = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def token_count_bpe(df: DataFrame, text_col: str = "text") -> DataFrame:
    """BPE-ish token counting: alphabetic runs, digit runs, and individual
    punctuation marks each count as one token (the pre-tokenization split most
    BPE vocabularies start from). Engine-portable regex (no lookarounds), one
    map stage."""
    toks = F.regexp_extract_all(F.col(text_col), F.lit(BPE_ISH), 0)
    return df.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_bpe_tokens"),
        # tokens-per-whitespace-word ratio: fragmentation signal used by
        # quality filters (high ratio = digit/punct heavy text)
        F.round(
            F.size(toks) / F.greatest(F.size(tokens(F.col(text_col))), F.lit(1)), 4
        ).alias("fragmentation"),
    )


def contamination_flags(
    df: DataFrame,
    probe_shingles: "list[str] | DataFrame",
    text_col: str = "text",
    shingle_k: int = 3,
) -> DataFrame:
    """Benchmark-contamination check: flag documents sharing any k-token
    shingle with a probe set (eval-set leakage detection, a standard
    training-corpus hygiene pass).

    Scale path: explode per-doc distinct shingles and broadcast-semi-join the
    probe set (a DataFrame with a string column `s`, or a driver-side list
    parallelized into one). The corpus side never shuffles raw shingles — the
    only exchange is the per-doc hit count (map-side partial count), and the
    probe table (an eval set, ~MBs) broadcasts. This replaces an earlier
    literal-`array_intersect` plan that embedded the probe in every task's
    expression tree (plan-size blowup, ~5x slower at sf0.1)."""
    from ophidia_server_spark.pipeline.dedup import _shingles

    if isinstance(probe_shingles, DataFrame):
        probe_df = probe_shingles.select(F.col(probe_shingles.columns[0]).alias("s"))
    else:
        probe_df = df.sparkSession.createDataFrame(
            [(s,) for s in sorted(set(probe_shingles))], "s string"
        )
    ex = df.select(
        "doc_id", F.explode(F.array_distinct(_shingles(text_col, shingle_k))).alias("s")
    )
    hits = (
        ex.join(F.broadcast(probe_df.distinct()), "s", "left_semi")
        .groupBy("doc_id")
        .agg(F.count("*").alias("__hits"))
    )
    n = F.coalesce(F.col("__hits"), F.lit(0))
    return (
        df.select("doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            n.cast("long").alias("n_shared_shingles"),
            (n > 0).alias("contaminated"),
        )
    )


def contamination_spans(
    df: DataFrame,
    ref: DataFrame,
    text_col: str = "text",
    k: int = 8,
    doc_col: str = "doc_id",
    hash_key: bool = True,
) -> DataFrame:
    """WHERE the contamination is: maximal token spans of each batch
    document covered by k-gram shingles that appear anywhere in `ref`
    (the eval/benchmark corpus) — the span-grain sibling of
    `contamination_flags` (which only says THAT a doc is contaminated).
    The spans feed targeted excision or human review instead of dropping
    whole documents whose overlap is one quoted sentence.

    Returns (doc_col, span_start, span_end, span_tokens, n_hit_grams) —
    0-based token offsets, end exclusive; clean docs produce no rows.

    Scale shape: the reference collapses to a distinct-shingle table once
    (eval sets are small, but the plan does not rely on it: the mark is a
    shingle-keyed semi-join, both sides shuffled on the key, no broadcast
    requirement); the island merge is dedup.py's per-document window over
    marked offsets only. `hash_key=True` (default since round 11, same
    measured lever as duplicate_spans — 5.4x fewer key bytes, 2.1x faster
    at sf10) shuffles xxhash64 codes instead of k-token strings;
    hash_key=False restores collision-free string keys."""
    from ophidia_server_spark.pipeline.dedup import (
        _merge_marked_offsets,
        _occurrences,
    )

    if k < 2:
        raise ValueError(f"k must be >= 2, got {k}")
    occ = _occurrences(df, text_col, k, doc_col, hash_key)
    ref_occ = _occurrences(
        ref.select(F.lit(0).alias("__rid"), F.col(text_col)),
        text_col, k, "__rid", hash_key,
    ).select("__key").distinct()
    marked = occ.join(ref_occ, "__key", "semi").select("__d", "__pos")
    return _merge_marked_offsets(marked, k).select(
        F.col("__d").alias(doc_col),
        "span_start",
        "span_end",
        (F.col("span_end") - F.col("span_start")).alias("span_tokens"),
        F.col("n_dup_grams").alias("n_hit_grams"),
    )


def chunk_documents(
    df: DataFrame, chunk_tokens: int = 64, overlap_tokens: int = 16,
    text_col: str = "text",
) -> DataFrame:
    """Split documents into fixed-size token windows with overlap — the
    context-window chunking step of an LLM training/RAG pipeline. Emits
    (doc_id, chunk_no, n_tokens, chunk_text); the final partial window is
    kept. Pure array exprs: tokenize once, slice per chunk start.
    """
    step = chunk_tokens - overlap_tokens
    if step <= 0:
        raise ValueError("overlap must be smaller than the chunk size")
    staged = df.select("doc_id", tokens(F.col(text_col)).alias("__toks"))
    n = F.size("__toks")
    # starts: 1, 1+step, ... while start <= n (1-based); empty docs get none
    starts = F.sequence(F.lit(1), F.greatest(n, F.lit(1)), F.lit(step))
    exploded = staged.filter(n > 0).select(
        "doc_id", "__toks", F.posexplode(starts).alias("chunk_no", "__start")
    )
    piece = F.slice("__toks", F.col("__start"), chunk_tokens)
    return exploded.select(
        "doc_id",
        F.col("chunk_no").cast("long").alias("chunk_no"),
        F.size(piece).cast("long").alias("n_tokens"),
        F.concat_ws(" ", piece).alias("chunk_text"),
    )


def repetition_signals(
    df: DataFrame, text_col: str = "text",
    dup_bigram_max: float = 0.05, top_token_max: float = 0.12,
) -> DataFrame:
    """Gopher-style repetition filters: duplicate-bigram fraction and
    most-frequent-token fraction per document, with a composite `flagged`
    verdict. High values mark boilerplate / degenerate generations — a
    standard pre-training quality gate alongside quality_score.

    All JVM expressions: the bigram list reuses the zip_with shingle fold
    (no explode for the dup fraction); the top-token fraction runs one
    explode + two-level hash aggregate with map-side partials, so the plan
    is O(tokens) with no per-doc state on the driver.
    """
    from ophidia_server_spark.pipeline.dedup import _shingles

    toks = tokens(F.col(text_col))
    bg = _shingles(text_col, 2)
    n_bg = F.size(bg)
    dup_frac = F.when(n_bg <= 0, F.lit(0.0)).otherwise(
        1.0 - F.size(F.array_distinct(bg)).cast("double") / n_bg
    )
    base = df.select(
        "doc_id",
        F.size(toks).cast("long").alias("n_tokens"),
        F.round(dup_frac, 6).alias("dup_bigram_frac"),
    )
    counts = (
        df.select("doc_id", F.explode(tokens(F.col(text_col))).alias("__t"))
        .groupBy("doc_id", "__t")
        .agg(F.count("*").alias("__c"))
        .groupBy("doc_id")
        .agg(F.max("__c").alias("__top"))
    )
    out = (
        base.join(counts, "doc_id", "left")
        .select(
            "doc_id",
            "dup_bigram_frac",
            F.round(
                F.coalesce(F.col("__top") / F.col("n_tokens"), F.lit(0.0)), 6
            ).alias("top_token_frac"),
        )
    )
    return out.withColumn(
        "flagged",
        (
            (F.col("dup_bigram_frac") > dup_bigram_max)
            | (F.col("top_token_frac") > top_token_max)
        ).cast("int"),
    )


def token_entropy(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Shannon entropy of each document's token distribution (nats, round 6)
    — the lexical-diversity signal quality pipelines pair with
    repetition_signals (low entropy = degenerate/boilerplate text). One
    explode + two hash aggregates, map-side partials both times; no window
    function, no Python."""
    counts = (
        df.select("doc_id", F.explode(tokens(F.col(text_col))).alias("__t"))
        .groupBy("doc_id", "__t")
        .agg(F.count("*").alias("__c"))
    )
    ent = (
        counts.groupBy("doc_id")
        .agg(
            F.sum("__c").alias("__n"),
            F.sum(F.col("__c") * F.log(F.col("__c").cast("double"))).alias("__clogc"),
        )
        # H = ln(n) - (1/n) * sum(c * ln c)
        .select(
            "doc_id",
            F.round(
                F.log(F.col("__n").cast("double")) - F.col("__clogc") / F.col("__n"), 6
            ).alias("entropy"),
        )
    )
    return (
        df.select("doc_id")
        .join(ent, "doc_id", "left")
        .select("doc_id", F.coalesce("entropy", F.lit(0.0)).alias("entropy"))
    )


# PII patterns shared by detection and redaction. Kept to the regex subset
# with identical semantics in Java regex (Spark) and RE2 (DuckDB oracle):
# no lookaround, no backreferences.
PII_PATTERNS = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "ipv4": r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
    "phone": r"\b(?:\+?\d{1,2}[-. ]?)?\(?\d{3}\)?[-. ]?\d{3}[-. ]?\d{4}\b",
    "ssn": r"\b\d{3}-\d{2}-\d{4}\b",
}


def pii_signals(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Per-document PII hit counts (emails / IPv4s / phone numbers / SSNs) +
    a has_pii gate — the scrub-before-training signal every corpus pipeline
    needs. Pure JVM regexp_count expressions: map-only, zero shuffle,
    whole-stage codegen'd; at 100 TB this is a single pushed-projection scan."""
    out = df.select(
        "doc_id",
        *[
            F.regexp_count(F.col(text_col), F.lit(p)).cast("long").alias(f"n_{k}")
            for k, p in PII_PATTERNS.items()
        ],
    )
    total = None
    for k in PII_PATTERNS:
        c = F.col(f"n_{k}")
        total = c if total is None else total + c
    return out.withColumn("has_pii", total > 0)


def redact_pii(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Replace every PII span with a typed placeholder ([EMAIL], [IPV4], ...),
    longest-pattern-class first so phone digits inside an SSN-shaped span
    don't double-fire. Chained JVM regexp_replace — still map-only."""
    redacted = F.col(text_col)
    for k in ("email", "ssn", "ipv4", "phone"):
        redacted = F.regexp_replace(redacted, PII_PATTERNS[k], f"[{k.upper()}]")
    return df.withColumn(f"{text_col}_redacted", redacted)


def bigram_logprob(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Corpus-self bigram log-probability per document — the perplexity-proxy
    quality signal (CCNet-style): score(doc) = avg over its bigrams of
    ln P(w2|w1), with P estimated from the corpus itself (bigram count /
    prefix count), so every observed bigram has P > 0 and no smoothing is
    needed. Low scores = improbable token transitions (garbled/boilerplate
    text); filtering on a score quantile is the standard gate.

    Shape at scale: one explode to bigrams, two hash aggregates for the
    stats (map-side partials shrink each to distinct-bigram size), one
    shuffle join of the doc bigrams against the stats on the bigram key
    (uniformly distributed by construction), one final per-doc aggregate.
    All JVM expressions — no Python, no window functions."""
    toks = df.select("doc_id", tokens(F.col(text_col)).alias("__t"))
    n = F.size("__t")
    bg = toks.filter(n >= 2).select(
        "doc_id",
        F.explode(
            F.arrays_zip(
                F.slice("__t", 1, n - 1).alias("w1"),
                F.slice("__t", 2, n - 1).alias("w2"),
            )
        ).alias("__b"),
    ).select("doc_id", F.col("__b.w1").alias("w1"), F.col("__b.w2").alias("w2"))
    bgc = bg.groupBy("w1", "w2").agg(F.count("*").alias("__c12"))
    pc = bg.groupBy("w1").agg(F.count("*").alias("__c1"))
    scored = (
        bg.join(bgc, ["w1", "w2"])
        .join(pc, ["w1"])
        .groupBy("doc_id")
        .agg(
            F.round(
                F.avg(F.log(F.col("__c12").cast("double") / F.col("__c1"))), 6
            ).alias("bigram_logprob")
        )
    )
    return (
        df.select("doc_id")
        .join(scored, "doc_id", "left")
        .select(
            "doc_id", F.coalesce("bigram_logprob", F.lit(0.0)).alias("bigram_logprob")
        )
    )


def bm25_scores(
    df: DataFrame, query_terms: list[str], k1: float = 1.2, b: float = 0.75,
    text_col: str = "text", top_k: int = 20,
) -> DataFrame:
    """BM25 ranked retrieval over the corpus for one query (Robertson/
    Sparck Jones; the standard lexical relevance function — what a corpus
    search/inspection tool runs against a training-data lake).

      score(d) = sum_t idf(t) * tf * (k1+1) / (tf + k1*(1 - b + b*dl/avgdl))
      idf(t)   = ln(1 + (N - df + 0.5) / (df + 0.5))

    Shape at scale: tokenize once; per-doc term frequencies for the QUERY
    TERMS only (a map-side filter — no full postings list is ever built),
    one tiny aggregate for the per-term document frequencies and the corpus
    N/avgdl scalars (both broadcast back), one final per-doc aggregate.
    Everything is JVM expressions; the only shuffles are the two hash
    aggregates, each keyed on (doc_id, term) and term.
    """
    toks = df.select("doc_id", tokens(F.col(text_col)).alias("__t"))
    lens = toks.select("doc_id", F.size("__t").alias("dl"))
    tf = (
        toks.select("doc_id", F.explode("__t").alias("term"))
        .filter(F.col("term").isin(query_terms))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    scalars = lens.agg(
        F.count("*").alias("n_docs"), F.avg("dl").alias("avgdl")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "term")
        .join(lens, "doc_id")
        .join(F.broadcast(scalars))
        .withColumn(
            "idf",
            F.log(
                F.lit(1.0)
                + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
            ),
        )
        .withColumn(
            "w",
            F.col("idf") * F.col("tf") * (k1 + 1)
            / (
                F.col("tf")
                + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
            ),
        )
        .groupBy("doc_id")
        .agg(F.round(F.sum("w"), 4).alias("bm25"))
    )
    return scored.orderBy(F.desc("bm25"), "doc_id").limit(top_k)


def tfidf_top_terms(
    df: DataFrame, top_n: int = 3, text_col: str = "text"
) -> DataFrame:
    """Keyword extraction: each document's top-N terms by tf-idf
    (tf * ln(N/df)) — the standard corpus-exploration/labeling primitive.

    Shape at scale: explode to (doc, term) once, two hash aggregates (tf and
    df — both with map-side partials), a term-keyed join (uniform key
    distribution; the vocabulary is NOT broadcast because at corpus scale
    unique tokens outgrow the driver), a one-row N broadcast, and a per-doc
    window for the top-N cut. All JVM expressions."""
    from pyspark.sql import Window

    toks = df.select("doc_id", F.explode(tokens(F.col(text_col))).alias("term"))
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.countDistinct("doc_id").alias("df"))
    n = df.agg(F.countDistinct("doc_id").alias("n_docs"))
    scored = (
        tf.join(dfreq, "term")
        .join(F.broadcast(n))
        .withColumn(
            "tfidf",
            F.round(F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 4),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("tfidf"), "term")
    return (
        scored.withColumn("rank", F.row_number().over(w).cast("long"))
        .filter(F.col("rank") <= top_n)
        .select("doc_id", "term", "tfidf", "rank")
    )


def perplexity_buckets(
    df: DataFrame, n_buckets: int = 3, text_col: str = "text",
    method: str = "ntile",
) -> DataFrame:
    """CCNet-style quality bucketing (Wenzek et al. 2020): score every
    document with the corpus bigram log-probability (the perplexity proxy
    bigram_logprob computes) and split the corpus into n quality tiers —
    head (most fluent), middle, tail. Pipelines keep head+middle for
    pretraining and route tail to extra filtering.

    method="ntile" (gate-exact): ntile over (score desc, doc_id) — a
    total order both engines define identically. The global sort is
    affordable at gate scale and on corpora up to ~billions of rows.

    method="sketch" (the 100 TB path): cutoffs read off a DDSketch over
    the NEGATED score (perplexity-like, non-negative; dds buckets are
    log-spaced over positives), then bucket assignment is a pure map
    against the <= n_buckets-1 collected thresholds — one O(log/alpha)-row
    sketch pass instead of a global sort, which is exactly how CCNet
    applies its pretrained thresholds. Tier boundaries are within the
    sketch's alpha of the exact ones; both methods agree on every doc
    whose score sits away from a boundary."""
    from pyspark.sql import Window

    scored = bigram_logprob(df, text_col)

    def name_of(t):
        if n_buckets == 3:
            return (
                F.when(t == 1, "head").when(t == 2, "middle").otherwise("tail")
            )
        return F.concat(F.lit("q"), t.cast("string"))

    if method == "sketch":
        from ophidia_server_spark.functions import sketches as sk

        neg = scored.select(
            (-F.col("bigram_logprob")).alias("__nscore")
        )
        cuts = sk.dds_quantiles(
            sk.dds_sketch(neg, "__nscore", alpha=0.001),
            [i / n_buckets for i in range(1, n_buckets)],
            alpha=0.001,
        ).orderBy("q").collect()  # <= n_buckets-1 rows
        thresholds = [float(r["est"]) for r in cuts]
        t = F.lit(1)
        for thr in thresholds:
            t = t + (-F.col("bigram_logprob") > thr).cast("int")
        return scored.select(
            "doc_id", "bigram_logprob", name_of(t).alias("bucket")
        )
    if method != "ntile":
        raise ValueError(f"unknown method {method!r} (ntile|sketch)")
    w = Window.orderBy(F.desc("bigram_logprob"), F.asc("doc_id"))
    tiered = scored.withColumn("__t", F.ntile(n_buckets).over(w))
    return tiered.select(
        "doc_id", "bigram_logprob", name_of(F.col("__t")).alias("bucket")
    )


GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality_flags(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 50,
    max_words: int = 100_000,
) -> DataFrame:
    """The Gopher document-quality rule set (Rae et al. 2021, appendix
    A1.1 — the public heuristic battery most pretraining pipelines start
    from), one boolean flag per rule plus the conjunctive `keep`:

      ok_word_count   word count in [min_words, max_words]
      ok_mean_len     mean word length in [3, 10] characters
      ok_symbol_ratio '#' + '...' occurrences <= 0.1 per word
      ok_bullet       <= 90% of lines start with a bullet
      ok_ellipsis     <= 30% of lines end with an ellipsis
      ok_alpha_words  >= 80% of words contain an alphabetic character
      ok_stop_words   contains >= 2 of Gopher's eight stop words

    Complements repetition_signals (the paper's repetition rules) and
    quality_score (ratio features). Every rule is a JVM expression over
    ONE tokenization and ONE line split — a pure map stage with no
    shuffle, so the filter fuses into the scan at any corpus size."""
    toks = tokens(F.col(text_col))
    txt = F.col(text_col)
    lines = F.filter(F.split(txt, "\n"), lambda ln: F.trim(ln) != "")
    n = F.size(toks)
    n_lines = F.size(lines)
    chars = F.aggregate(
        F.transform(toks, lambda t: F.length(t)), F.lit(0), lambda a, x: a + x
    )
    mean_len = F.when(n > 0, chars.cast("double") / n.cast("double")).otherwise(0.0)
    hashes = F.length(txt) - F.length(F.replace(txt, F.lit("#"), F.lit("")))
    dots = (
        F.length(txt) - F.length(F.replace(txt, F.lit("..."), F.lit("")))
    ) / F.lit(3)
    sym_ratio = F.when(
        n > 0, (hashes + dots).cast("double") / n.cast("double")
    ).otherwise(0.0)
    bullet_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                lines,
                lambda ln: F.trim(ln).startswith("•")
                | F.trim(ln).startswith("- ")
                | F.trim(ln).startswith("* "),
            )
        ).cast("double")
        / n_lines.cast("double"),
    ).otherwise(0.0)
    ellipsis_frac = F.when(
        n_lines > 0,
        F.size(
            F.filter(
                lines,
                lambda ln: F.trim(ln).endswith("...") | F.trim(ln).endswith("…"),
            )
        ).cast("double")
        / n_lines.cast("double"),
    ).otherwise(0.0)
    alpha_frac = F.when(
        n > 0,
        F.size(F.filter(toks, lambda t: t.rlike("[A-Za-z]"))).cast("double")
        / n.cast("double"),
    ).otherwise(0.0)
    low = F.transform(toks, lambda t: F.lower(t))
    stop_hits = sum(
        (F.array_contains(low, w).cast("int") for w in GOPHER_STOPWORDS),
        F.lit(0),
    )
    flags = {
        "ok_word_count": (n >= min_words) & (n <= max_words),
        "ok_mean_len": (mean_len >= 3.0) & (mean_len <= 10.0),
        "ok_symbol_ratio": sym_ratio <= 0.1,
        "ok_bullet": bullet_frac <= 0.9,
        "ok_ellipsis": ellipsis_frac <= 0.3,
        "ok_alpha_words": alpha_frac >= 0.8,
        "ok_stop_words": stop_hits >= 2,
    }
    keep = None
    for c in flags.values():
        keep = c if keep is None else (keep & c)
    return df.select(
        "doc_id",
        *[v.cast("int").alias(k) for k, v in flags.items()],
        keep.cast("int").alias("keep"),
    )


def strip_markup(df: DataFrame, text_col: str = "text") -> DataFrame:
    """HTML/boilerplate removal — the first pass every web-crawl training
    pipeline runs (the WET-extraction shape): drop <script>/<style> blocks
    wholesale, strip remaining tags to spaces, unescape the six common
    entities, collapse ASCII whitespace runs, trim. Pure JVM expressions
    (regexp_replace + replace chains) — codegen'd, no UDF; the regexes are
    deliberately RE2-safe (no \\s, no lookaround) so the DuckDB oracle can
    run the IDENTICAL patterns. Adds `clean_text` and `chars_removed`.

    This is the honest 80% cut (tags, scripts, entities), not a DOM-aware
    readability extractor — at corpus scale the remaining boilerplate is
    what dedup_lines / repeated-span removal strip next."""
    t = F.col(text_col)
    no_blocks = F.regexp_replace(
        F.regexp_replace(t, r"(?is)<script[^>]*>.*?</script>", " "),
        r"(?is)<style[^>]*>.*?</style>", " ",
    )
    no_tags = F.regexp_replace(no_blocks, r"<[^>]*>", " ")
    ent = no_tags
    for k, v in (("&nbsp;", " "), ("&lt;", "<"), ("&gt;", ">"),
                 ("&quot;", '"'), ("&#39;", "'"), ("&amp;", "&")):
        ent = F.replace(ent, F.lit(k), F.lit(v))
    clean = F.trim(F.regexp_replace(ent, r"[ \t\r\n\f\v]+", " "))
    return df.withColumn("clean_text", clean).withColumn(
        "chars_removed",
        (F.length(t) - F.length(clean)).cast("long"),
    )


def zipf_fit(
    df: DataFrame, text_col: str = "text", max_rank: int = 1000,
) -> DataFrame:
    """Zipf-law fit of the token frequency distribution: OLS of ln(freq)
    on ln(rank) over the top `max_rank` tokens — natural language sits
    near exponent -1, so a corpus whose exponent drifts far from it is
    template spam, tables, or badly-parsed markup (a standard corpus
    health number). Every OLS sufficient statistic is accumulated in
    1e-6-quantized integer units (round(term * 1e6) summed as BIGINT)
    so the cross-row addition order cannot perturb a bit; the slope and
    Pearson r divide once in double. Returns ONE row (n_ranked,
    zipf_exponent R6, pearson_r R6).

    Shape at scale: one term-keyed count, one ranking window over the
    VOCABULARY table (bounded by distinct tokens, never raw rows),
    one scalar aggregate."""
    from pyspark.sql import Window

    freq = (
        df.select(F.explode(tokens(F.col(text_col))).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    rank = F.row_number().over(
        Window.orderBy(F.desc("__c"), F.col("w"))
    )
    ranked = (
        freq.withColumn("__r", rank)
        .filter(F.col("__r") <= max_rank)
        .select(
            F.log(F.col("__r").cast("double")).alias("__x"),
            F.log(F.col("__c").cast("double")).alias("__y"),
        )
    )

    def micro(col):
        return F.sum(F.round(col * 1e6).cast("long")).cast("double") / 1e6

    s = ranked.agg(
        F.count(F.lit(1)).cast("double").alias("__n"),
        micro(F.col("__x")).alias("__sx"),
        micro(F.col("__y")).alias("__sy"),
        micro(F.col("__x") * F.col("__y")).alias("__sxy"),
        micro(F.col("__x") * F.col("__x")).alias("__sxx"),
        micro(F.col("__y") * F.col("__y")).alias("__syy"),
    )
    n = F.col("__n")
    dx = n * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    dy = n * F.col("__syy") - F.col("__sy") * F.col("__sy")
    num = n * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    return s.select(
        n.cast("long").alias("n_ranked"),
        F.round(
            F.when(dx > 0, num / dx).otherwise(F.lit(0.0)), 6
        ).alias("zipf_exponent"),
        F.round(
            F.when((dx > 0) & (dy > 0), num / F.sqrt(dx * dy)).otherwise(
                F.lit(0.0)
            ), 6
        ).alias("pearson_r"),
    )


def encoding_artifacts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Mojibake / encoding-damage detection — the crawl-hygiene pass that
    catches double-decoded UTF-8 and binary bleed before a document
    poisons a tokenizer: per doc, counts of U+FFFD replacement chars,
    the classic UTF-8-as-Latin-1 mojibake markers ('Ã', 'â€', 'Â'),
    C0 control characters (except tab/newline/CR), the non-ASCII char
    count, and a `suspect` flag when any damage marker fires. Pure map
    stage — fixed-string and ASCII-class regex counts only, no Unicode
    regex classes (RE2/Java \\s semantics differ; see the parity notes).
    """
    s = F.col(text_col)

    def cnt_fixed(marker: str) -> Column:
        return (
            F.length(s) - F.length(F.replace(s, F.lit(marker), F.lit("")))
        ) / len(marker)

    ctrl = F.length(s) - F.length(
        F.regexp_replace(s, "[\\x00-\\x08\\x0b\\x0c\\x0e-\\x1f]", "")
    )
    ascii_kept = F.length(F.regexp_replace(s, "[^\\x20-\\x7e\\t\\r\\n]", ""))
    non_ascii = F.length(s) - ascii_kept
    repl = cnt_fixed("�")
    moji = cnt_fixed("Ã") + cnt_fixed("â€") + cnt_fixed("Â")
    return df.select(
        "doc_id",
        repl.cast("long").alias("n_replacement"),
        moji.cast("long").alias("n_mojibake"),
        ctrl.cast("long").alias("n_control"),
        non_ascii.cast("long").alias("n_non_ascii"),
        ((repl > 0) | (moji > 0) | (ctrl > 0)).cast("int").alias("suspect"),
    )


def url_domains(df: DataFrame, text_col: str = "text") -> DataFrame:
    """URL/domain inventory of a text corpus — the blocklist/source-mix
    table of every web-crawl pipeline: extract http(s) URLs
    (case-insensitive scheme; optional userinfo@ is skipped so
    'login@evil.com' counts under evil.com, not login), lowercase the
    host, count mentions and distinct documents per domain. One
    regex-extract map + explode + one domain-keyed count (term-keyed
    shuffle, no vocabulary broadcast). ASCII character classes only —
    RE2 and Java agree on them."""
    urls = F.regexp_extract_all(
        F.col(text_col),
        F.lit(r"(?i)https?://(?:[a-zA-Z0-9._%:+-]+@)?([a-zA-Z0-9.-]+)"),
        1,
    )
    ex = df.select(
        "doc_id", F.explode(urls).alias("__h")
    ).select("doc_id", F.lower("__h").alias("domain"))
    return ex.groupBy("domain").agg(
        F.count(F.lit(1)).cast("long").alias("n_mentions"),
        F.countDistinct("doc_id").cast("long").alias("n_docs"),
    )


def ngram_novelty(
    df: DataFrame, ref: DataFrame, text_col: str = "text",
    shingle_k: int = 3,
) -> DataFrame:
    """N-gram novelty vs a reference corpus: per document, the fraction
    of its distinct k-token shingles that appear NOWHERE in `ref` — the
    memorization/freshness audit run before adding a crawl snapshot to a
    training mix (novelty ~0 means the batch re-states the corpus).

    Shape at scale: the reference collapses to a distinct shingle table
    once; the batch explodes per-doc distinct shingles and LEFT-joins
    the reference on the shingle — both sides shuffle keyed on the
    term, no broadcast of a corpus-sized set — then one per-doc count.
    EVERY batch document reports, including sub-k-token stubs (they
    carry n_shingles = 0 and novelty 0.0 — a doc with nothing to judge
    is not silently missing from the audit). Returns (doc_id,
    n_shingles, n_novel, novelty ROUND(6))."""
    from ophidia_server_spark.pipeline.dedup import _shingles

    seen = (
        ref.select(F.explode(_shingles(text_col, shingle_k)).alias("__s"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    ex = df.select(
        "doc_id",
        F.explode(F.array_distinct(_shingles(text_col, shingle_k))).alias("__s"),
    )
    per = (
        ex.join(seen, "__s", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("__ns"),
            F.sum(F.when(F.col("__hit").isNull(), 1).otherwise(0))
            .cast("long").alias("__nn"),
        )
    )
    return (
        df.select("doc_id")
        .join(per, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce("__ns", F.lit(0)).cast("long").alias("n_shingles"),
            F.coalesce("__nn", F.lit(0)).cast("long").alias("n_novel"),
            F.round(
                F.coalesce("__nn", F.lit(0))
                / F.greatest(F.coalesce("__ns", F.lit(0)), F.lit(1)), 6
            ).alias("novelty"),
        )
    )


def collocations(
    df: DataFrame, text_col: str = "text", min_count: int = 5,
) -> DataFrame:
    """Bigram collocation mining by LIFT (the PMI ratio before the log:
    P(w1 w2) / (P(w1) P(w2)) — same ranking, but a pure integer-derived
    double, so it is bit-deterministic across engines where log's last
    ulp is not). lift = n_pair * n_tokens^2 / (n_bigrams * c1 * c2) with
    unigram counts over all tokens and bigram counts over adjacent
    pairs; pairs below `min_count` are noise and dropped.

    Shape at scale: one explode per grain (token, adjacent pair), two
    grouped counts keyed on the term — map-side partials, no vocabulary
    broadcast — and two bounded joins of the pair table against the
    unigram table. Returns (w1, w2, n_pair, lift ROUND(6))."""
    toks = tokens(F.col(text_col))
    uni = (
        df.select(F.explode(toks).alias("w"))
        .groupBy("w")
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    pairs_arr = F.zip_with(
        toks, F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.struct(a.alias("w1"), b.alias("w2")),
    )
    bi = (
        df.select(
            F.explode(
                F.slice(
                    pairs_arr, 1,
                    F.greatest(F.size(toks) - 1, F.lit(0)),
                )
            ).alias("p")
        )
        .select(F.col("p.w1").alias("w1"), F.col("p.w2").alias("w2"))
        .groupBy("w1", "w2")
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .filter(F.col("n_pair") >= min_count)
    )
    tot = df.select(
        F.sum(F.size(toks)).cast("double").alias("__t"),
        F.sum(F.greatest(F.size(toks) - 1, F.lit(0)))
        .cast("double").alias("__b"),
    )
    c1 = uni.select(F.col("w").alias("w1"), F.col("__c").alias("__c1"))
    c2 = uni.select(F.col("w").alias("w2"), F.col("__c").alias("__c2"))
    lift = (
        F.col("n_pair").cast("double") * F.col("__t") * F.col("__t")
        / (F.col("__b") * F.col("__c1").cast("double")
           * F.col("__c2").cast("double"))
    )
    return (
        bi.join(c1, "w1").join(c2, "w2")
        .crossJoin(F.broadcast(tot))
        .select(
            "w1", "w2", F.col("n_pair").cast("long").alias("n_pair"),
            F.round(lift, 6).alias("lift"),
        )
    )


def chi2_token_label(
    df: DataFrame, label_col: str, text_col: str = "text",
    min_docs: int = 5,
) -> DataFrame:
    """Chi-square feature selection: how strongly each token's document
    presence associates with each label (one-vs-rest 2x2 contingency per
    (token, label)) — the classic pick-discriminative-vocabulary pass
    before training a classifier. chi2 = N(ad-bc)^2 / ((a+b)(c+d)(a+c)
    (b+d)) from exact integer counts (IEEE products are rounded
    identically everywhere given the fixed expression order). Tokens in
    fewer than `min_docs` documents are dropped.

    Shape at scale: one distinct (doc, token) explode, one token-keyed
    count per (token, label) + one per token, one bounded label-count
    table joined back — term-keyed shuffles, no vocabulary broadcast.
    Returns (label, token, n_label_docs_with_token, chi2 ROUND(6))."""
    # distinct token presence per document via array_distinct pre-explode
    pres = df.select(
        F.col(label_col).alias("__l"),
        F.explode(F.array_distinct(tokens(F.col(text_col)))).alias("token"),
    )
    n_docs = df.count()
    label_tot = df.groupBy(F.col(label_col).alias("__l")).agg(
        F.count(F.lit(1)).alias("__nl")
    )
    tok_tot = pres.groupBy("token").agg(F.count(F.lit(1)).alias("__nt"))
    tl = pres.groupBy("token", "__l").agg(F.count(F.lit(1)).alias("__a"))
    j = (
        tl.join(tok_tot.filter(F.col("__nt") >= min_docs), "token")
        .join(F.broadcast(label_tot), "__l")
    )
    a = F.col("__a").cast("double")
    b = (F.col("__nt") - F.col("__a")).cast("double")
    c = (F.col("__nl") - F.col("__a")).cast("double")
    n = F.lit(float(n_docs))
    d = n - a - b - c
    den = (a + b) * (c + d) * (a + c) * (b + d)
    chi2 = F.when(
        den > 0, n * (a * d - b * c) * (a * d - b * c) / den
    ).otherwise(F.lit(0.0))
    return j.select(
        F.col("__l").alias("label"),
        "token",
        F.col("__a").cast("long").alias("n_label_docs_with_token"),
        F.round(chi2, 6).alias("chi2"),
    )


def canonicalize(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Canonical text key for dedup: collapse whitespace runs to single
    spaces, trim, lowercase, then Unicode NFC (UAX #15) — the
    normalization every real dedup pass runs FIRST so visually-identical
    documents ("café" composed vs decomposed, NBSP vs space after the
    collapse step, case variants) hash to the same key. Returns the input
    plus `canon_text` and `canon_key` (md5 of the canonical form).

    NFC needs the Unicode tables, so this is an Arrow-batched pandas_udf
    over Python's unicodedata (the one C-backed implementation in the
    container) — a pure map stage, no shuffle; the DuckDB oracle
    recomputes the identical pipeline with its native nfc_normalize, so
    the two independent UAX #15 implementations cross-check each other
    (tests/test_dsir.py asserts agreement on composed/decomposed/compat
    unicode directly)."""
    import pandas as pd

    def _canon(s: "pd.Series") -> "pd.Series":
        import re as _re
        import unicodedata as _ud

        def one(x):
            if x is None:
                return None
            # ASCII whitespace only — the cross-engine contract: DuckDB's
            # RE2 \s is ASCII-only, Python's is Unicode-aware, so the
            # Python side pins itself to RE2 semantics (NBSP et al. pass
            # through and are normalized only by NFC)
            collapsed = _re.sub(r"[ \t\r\n\f\v]+", " ", x).strip().lower()
            return _ud.normalize("NFC", collapsed)

        return s.map(one)

    _canon.__annotations__ = {"s": pd.Series, "return": pd.Series}
    canon = F.pandas_udf(_canon, "string")(F.col(text_col))
    out = df.withColumn("canon_text", canon)
    return out.withColumn("canon_key", F.md5(F.col("canon_text")))


def dedup_canonical(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
) -> DataFrame:
    """Exact dedup on the CANONICAL key: keep the lowest-id document of
    every canonical-equivalence class. Same keep-first shape as
    dedup.dedup_exact, with normalization folded in front."""
    from pyspark.sql import Window

    c = canonicalize(df, text_col, id_col)
    w = Window.partitionBy("canon_key").orderBy(id_col)
    return (
        c.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "canon_text", "canon_key")
    )


def template_prefixes(
    df: DataFrame,
    k_tokens: int = 5,
    min_docs: int = 3,
    text_col: str = "text",
    by_col: str = "source",
) -> DataFrame:
    """Cross-document TEMPLATE detection: documents that open with the same
    first `k_tokens` tokens within one source are template instances —
    nav headers, ToS banners, form letters, scraped boilerplate — the
    cross-doc complement of repetition_signals' within-doc check (and the
    cheap precursor to full near-dup: a shared opening is how crawl
    boilerplate usually announces itself). A doc shorter than k_tokens
    uses its whole token list as the prefix. Adds `n_sharing` (docs of
    the same source with this prefix, bigint) and `is_template`
    (n_sharing >= min_docs).

    Shape at scale: one grouped count on (source, prefix) — bounded by
    distinct prefixes, never raw rows — joined back on the same key; no
    window, no self-join."""
    if k_tokens < 1:
        raise ValueError(f"k_tokens must be >= 1, got {k_tokens}")
    pre = F.concat_ws(" ", F.slice(tokens(F.col(text_col)), 1, int(k_tokens)))
    keyed = df.withColumn("__prefix", pre)
    counts = keyed.groupBy(
        F.col(by_col).alias("__src"), F.col("__prefix").alias("__p")
    ).agg(F.count(F.lit(1)).cast("long").alias("n_sharing"))
    return (
        keyed.join(
            counts,
            # eqNullSafe: a NULL source (missing provenance) is a real
            # group — plain equality would silently DROP those documents
            F.col(by_col).eqNullSafe(F.col("__src"))
            & F.col("__prefix").eqNullSafe(F.col("__p")),
        )
        .withColumn(
            "is_template", (F.col("n_sharing") >= int(min_docs)).cast("long")
        )
        .drop("__src", "__p", "__prefix")
    )


def canonical_urls(df: DataFrame, text_col: str = "text") -> DataFrame:
    """URL canonicalization — the dedup/blocklist normalizer every
    web-crawl pipeline runs before keying on URLs: extract http(s) URLs,
    lowercase scheme+host (path/query case is preserved — it is
    significant), drop the #fragment, strip the tracking parameters
    (utm_*, gclid, fbclid, msclkid, ref), and drop an emptied query
    string entirely — so 'HTTP://Example.com/A?utm_source=x#top' and
    'http://example.com/A' key identically while '/A?id=3' keeps its
    meaningful parameter. Returns exploded (doc_id, url, canon_url).

    All JVM column algebra (regexp_extract_all + higher-order
    filter/transform over the split query string); ASCII character
    classes only, so RE2 (DuckDB) and Java regex agree. One map +
    explode, no shuffle."""
    url_re = r"(?i)https?://[a-zA-Z0-9._%:@+/?&=#~-]+"
    urls = F.regexp_extract_all(F.col(text_col), F.lit(url_re), 0)
    ex = df.select("doc_id", F.explode(urls).alias("url"))
    nofrag = F.substring_index(F.col("url"), "#", 1)
    base = F.substring_index(nofrag, "?", 1)
    # scheme://host[:port] lowercased; everything after stays verbatim.
    # path/query are carved from the SAME nofrag/base/head columns (one
    # spelling of each regex — an edited host class cannot desync offsets)
    head = F.regexp_extract(base, r"(?i)^(https?://[a-zA-Z0-9._%:@-]+)", 1)
    path = base.substr(F.length(head) + F.lit(1), F.length(base))
    has_q = F.instr(nofrag, "?") > 0
    query = F.when(
        has_q, nofrag.substr(F.instr(nofrag, "?") + F.lit(1), F.length(nofrag))
    ).otherwise(F.lit(""))
    kept = F.filter(
        F.split(query, "&"),
        lambda p: (p != "") & ~p.rlike(
            "^(?i)(utm_[a-zA-Z0-9_]*|gclid|fbclid|msclkid|ref)="
        ),
    )
    canon = F.concat(
        F.lower(head),
        path,
        F.when(F.size(kept) > 0,
               F.concat(F.lit("?"), F.array_join(kept, "&"))
        ).otherwise(F.lit("")),
    )
    return ex.select("doc_id", "url", canon.alias("canon_url"))
