"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
arXiv:2302.03169), the hashed-n-gram importance weighting used to pick
pretraining data that "looks like" a target domain.

Method (all public): featurize every document as a bag of hashed n-grams
(unigrams + bigrams hashed into m buckets), fit two smoothed bag-of-words
models — p over a TARGET slice, q over the RAW corpus — and give each
document the importance log-weight

    log w(doc) = sum_b  c_doc[b] * ( log p[b] - log q[b] )

then keep the top-k (the paper's deterministic "top-k selection"; its
Gumbel-resampling variant adds noise drawn per-document, which here comes
from the repo's content-addressed md5 coin so selection stays deterministic
and engine-portable).

Scale shape (the 100 TB contract):
  featurize : one explode of the token array into (doc_id, bucket) rows —
              map-side, no join;
  fit       : TWO grouped aggregates over the same gram rows (target slice
              and full corpus), each collapsing to at most m rows — m is a
              PARAMETER (default 1024), not data-dependent, so the
              log-ratio table is broadcast-sized by construction;
  weight    : one join of gram rows against the m-row ratio table (AQE
              broadcasts it) + one groupBy(doc_id) sum — the only
              data-sized shuffle in the pipeline;
  select    : global top-k = TakeOrdered, no full sort.

Everything is built-in column algebra over the md5 contract in
functions/hashing.py, so the DuckDB oracle reproduces the weights bit-for-
bit (registry `dsir_*` entries).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ophidia_server_spark.functions.hashing import hex8_long, md5_bucket
from ophidia_server_spark.pipeline.text import tokens


def _grams(text_col: Column) -> Column:
    """Unigrams + space-joined bigrams of the whitespace tokenization —
    the paper's feature set. Documents with < 2 tokens contribute their
    unigrams only."""
    t = tokens(text_col)
    bigrams = F.when(
        F.size(t) >= 2,
        F.transform(
            F.slice(t, 1, F.size(t) - 1),
            lambda x, i: F.concat(x, F.lit(" "), F.element_at(t, i + 2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return F.concat(t, bigrams)


def hashed_gram_counts(
    df: DataFrame,
    m: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir",
) -> DataFrame:
    """(id, bucket, c): per-document hashed n-gram bucket counts — one
    explode, one map-side-combined groupBy. Empty documents yield no rows
    (their weight is 0 by the sum convention, restored at join time)."""
    return (
        df.select(F.col(id_col), F.explode(_grams(F.col(text_col))).alias("__g"))
        .select(id_col, md5_bucket(F.col("__g"), m, salt).alias("bucket"))
        .groupBy(id_col, "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )


def bucket_logratios(
    gram_counts: DataFrame,
    target_ids: DataFrame,
    m: int = 1024,
    alpha: float = 1.0,
    id_col: str = "doc_id",
) -> DataFrame:
    """(bucket, llr): smoothed log( p_target[b] / q_raw[b] ) for every one
    of the m buckets. `target_ids` is a one-column frame of document ids
    defining the target slice (a semi-join predicate, so the target never
    needs a second tokenization pass). Laplace-alpha smoothing keeps every
    bucket finite; buckets unseen in both corpora get llr = log of the
    totals ratio's complement, which cancels in ranking. Exactly m rows."""
    spark = gram_counts.sparkSession
    tgt = (
        gram_counts.join(target_ids.select(id_col).distinct(), id_col, "left_semi")
        .groupBy("bucket")
        .agg(F.sum("c").alias("tc"))
    )
    raw = gram_counts.groupBy("bucket").agg(F.sum("c").alias("rc"))
    base = spark.range(m).select(F.col("id").cast("long").alias("bucket"))
    joined = (
        base.join(tgt, "bucket", "left")
        .join(raw, "bucket", "left")
        .select(
            "bucket",
            F.coalesce(F.col("tc"), F.lit(0)).cast("double").alias("tc"),
            F.coalesce(F.col("rc"), F.lit(0)).cast("double").alias("rc"),
        )
    )
    # the totals are scalar aggregates (one row) — the sanctioned
    # broadcast-nested-loop of a literal row, same as every *_SQL total
    totals = joined.agg(
        F.sum("tc").alias("tt"), F.sum("rc").alias("rt")
    )
    am = float(alpha) * m
    return (
        joined.join(F.broadcast(totals))
        .select(
            "bucket",
            (
                F.log((F.col("tc") + F.lit(float(alpha))) / (F.col("tt") + F.lit(am)))
                - F.log((F.col("rc") + F.lit(float(alpha))) / (F.col("rt") + F.lit(am)))
            ).alias("llr"),
        )
    )


def dsir_logweights(
    df: DataFrame,
    target_pred: Column,
    m: int = 1024,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir",
) -> DataFrame:
    """Every input row + `dsir_logweight` = the importance log-weight of
    the document against the target slice `target_pred` selects. ONE
    tokenization pass feeds both model fits and the weighting join; the
    ratio table is m rows (AQE broadcasts it)."""
    from pyspark.storagelevel import StorageLevel

    # three consumers (target fit, raw fit, weighting join) read the gram
    # counts — persist so the tokenization explode runs ONCE, the same
    # cache discipline ngram_jaccard_pairs applies to its shingle sets
    gc = hashed_gram_counts(df, m, text_col, id_col, salt).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    target_ids = df.filter(target_pred).select(id_col)
    llr = bucket_logratios(gc, target_ids, m, alpha, id_col)
    w = (
        gc.join(llr, "bucket")
        .groupBy(id_col)
        .agg(F.sum(F.col("c") * F.col("llr")).alias("dsir_logweight"))
    )
    return df.join(w, id_col, "left").withColumn(
        "dsir_logweight", F.coalesce(F.col("dsir_logweight"), F.lit(0.0))
    )


def dsir_select(
    df: DataFrame,
    k: int,
    target_pred: Column,
    m: int = 1024,
    alpha: float = 1.0,
    gumbel_scale: float = 0.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    salt: str = "dsir",
) -> DataFrame:
    """Keep the k documents most target-like. gumbel_scale=0 is the
    paper's deterministic top-k; > 0 adds the Gumbel perturbation
    `scale * -ln(-ln(u))` with u the content-addressed md5 uniform, which
    reproduces the paper's importance RESAMPLING while staying
    deterministic per (document, salt). Ties break on id. Global top-k is
    a TakeOrdered — no full sort at any scale."""
    scored = dsir_logweights(df, target_pred, m, alpha, text_col, id_col, salt)
    key = F.col("dsir_logweight")
    if gumbel_scale > 0.0:
        u = (hex8_long(F.col(id_col), salt + ":gumbel") + 0.5) / float(1 << 32)
        key = key + F.lit(float(gumbel_scale)) * (-F.log(-F.log(u)))
    # round the sort key: double sums carry ~1e-13 summation-order noise, so
    # an unrounded order could differ between engines/partitionings right at
    # the k boundary; at 9 decimals the order is reproducible everywhere
    key = F.round(key, 9)
    return (
        scored.withColumn("__sel", key)
        .orderBy(F.desc("__sel"), F.asc(id_col))
        .limit(k)
        .drop("__sel")
    )
