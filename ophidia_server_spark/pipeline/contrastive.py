"""Contrastive training-pair mining: (anchor, positive, negative) triplets.

Embedding models (sentence encoders, retrieval bi-encoders) train on
triplets: an anchor document, a POSITIVE that should embed nearby, and a
NEGATIVE that should embed far. Mining those from a raw corpus is a
standard data-prep stage (the public SimCSE / Sentence-BERT / DPR recipe):
positives come from near-duplicate detection, negatives from random
sampling — here all content-addressed so the same corpus always yields the
same triplets on any engine or cluster.

Decoupled from the pair source on purpose: `pairs` is any
(id_a, id_b, jaccard)-shaped DataFrame — the LSH-pruned
dedup.ngram_jaccard_pairs at corpus scale, the exact bounded
ngram_jaccard_exact for oracle work, or an embedding-similarity pair list.

Scale shape:
  positive : one window per anchor over the PAIR table (pairs-sized, far
             smaller than the corpus) picks the highest-Jaccard partner;
  negative : the corpus is hash-bucketed once (md5, n_buckets) and each
             bucket is pre-reduced to a 3-candidate shortlist BEFORE any
             anchor joins it — first a map-side-combinable min-struct per
             (bucket, sub-bucket), then a window over the <=n_subs
             sub-minima per bucket — so the anchor join fans in at
             anchors x 3 regardless of corpus size or n_buckets. Nothing
             in the negative path sorts an sf-proportional partition.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ophidia_server_spark.functions.hashing import coin_hex8, md5_bucket


def contrastive_triplets(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    n_buckets: int = 8,
    salt: str = "ctr",
    n_subs: int = 64,
) -> DataFrame:
    """(anchor, positive, pos_jaccard, negative) per anchor that has at
    least one pair partner. Positive = the anchor's highest-Jaccard
    partner (ties break on the lower partner id). Negative = the
    coin-smallest entry of the anchor's pick-bucket SHORTLIST, excluding
    the anchor and its positive.

    The shortlist is each bucket's 3 coin-smallest sub-bucket minima
    (coin = content-addressed md5 of the candidate alone): a groupBy over
    (bucket, sub-bucket) — a true partial aggregate, no per-bucket sort —
    then a row_number window over the <=n_subs minima per bucket. The
    anchor join is against a <=3-rows-per-bucket table, so the candidate
    row count is O(anchors) at ANY corpus size; the two exclusions can
    never empty a 3-entry shortlist, so anchors drop out only when their
    whole bucket holds fewer than 3 sub-bucket minima (tiny corpora)."""
    from pyspark.sql import Window

    sym = pairs.select(
        F.col("id_a").alias("anchor"),
        F.col("id_b").alias("positive"),
        F.col("jaccard").alias("pos_jaccard"),
    ).unionByName(
        pairs.select(
            F.col("id_b").alias("anchor"),
            F.col("id_a").alias("positive"),
            F.col("jaccard").alias("pos_jaccard"),
        )
    )
    w = Window.partitionBy("anchor").orderBy(
        F.desc("pos_jaccard"), F.asc("positive")
    )
    best = (
        sym.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    pool = df.select(
        F.col(id_col).alias("__cand"),
        md5_bucket(F.col(id_col), n_buckets, salt + "pool").alias("__b"),
        md5_bucket(F.col(id_col), n_subs, salt + "sub").alias("__sub"),
        coin_hex8(F.col(id_col), salt + "neg").alias("__coin"),
    )
    sub_min = (
        pool.groupBy("__b", "__sub")
        .agg(F.min(F.struct("__coin", "__cand")).alias("__m"))
        .select("__b", F.col("__m.__coin").alias("__coin"),
                F.col("__m.__cand").alias("__cand"))
    )
    ws = Window.partitionBy("__b").orderBy("__coin", "__cand")
    shortlist = (
        sub_min.withColumn("__rn", F.row_number().over(ws))
        .filter(F.col("__rn") <= 3)
        .drop("__rn")
    )
    picked = best.withColumn(
        "__b", md5_bucket(F.col("anchor"), n_buckets, salt + "pick")
    )
    cand = picked.join(shortlist, "__b").filter(
        (F.col("__cand") != F.col("anchor"))
        & (F.col("__cand") != F.col("positive"))
    )
    w2 = Window.partitionBy("anchor").orderBy("__coin", "__cand")
    return (
        cand.withColumn("__rn", F.row_number().over(w2))
        .filter(F.col("__rn") == 1)
        .select(
            "anchor", "positive",
            F.round("pos_jaccard", 6).alias("pos_jaccard"),
            F.col("__cand").alias("negative"),
        )
    )


def contrastive_triplets_hard(
    df: DataFrame,
    pairs: DataFrame,
    hard_pairs: DataFrame,
    id_col: str = "doc_id",
    n_buckets: int = 8,
    salt: str = "ctr",
) -> DataFrame:
    """Triplets with HARD negatives (the DPR/ANCE recipe): `hard_pairs`
    holds moderately-similar pairs (a lower Jaccard band, or an ANN
    shortlist) — similar enough to be confusable, dissimilar enough to be
    wrong. Each anchor's negative becomes its highest-scoring hard
    partner (ties to the lower id); anchors without a hard partner fall
    back to the random-bucket negative, so the output covers every anchor
    the base miner covers. Adds `neg_source` ('hard' | 'random')."""
    from pyspark.sql import Window

    base = contrastive_triplets(df, pairs, id_col, n_buckets, salt)
    sym = hard_pairs.select(
        F.col("id_a").alias("anchor"),
        F.col("id_b").alias("__hn"),
        F.col("jaccard").alias("__hj"),
    ).unionByName(
        hard_pairs.select(
            F.col("id_b").alias("anchor"),
            F.col("id_a").alias("__hn"),
            F.col("jaccard").alias("__hj"),
        )
    )
    w = Window.partitionBy("anchor").orderBy(F.desc("__hj"), F.asc("__hn"))
    best_hard = (
        sym.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("anchor", "__hn")
    )
    return (
        base.join(best_hard, "anchor", "left")
        .select(
            "anchor", "positive", "pos_jaccard",
            F.coalesce(
                # a hard negative must not equal the positive
                F.when(F.col("__hn") != F.col("positive"), F.col("__hn")),
                F.col("negative"),
            ).alias("negative"),
            F.when(
                F.col("__hn").isNotNull() & (F.col("__hn") != F.col("positive")),
                F.lit("hard"),
            ).otherwise(F.lit("random")).alias("neg_source"),
        )
    )
