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
  negative : the corpus is hash-gridded once into n_buckets x n_subs
             CELLS and each cell pre-reduced to its coin-smallest member
             (a map-side-combinable min-struct — no per-bucket sort);
             each anchor then draws its own cell deterministically (plus
             two fallback cells for exclusion safety) and joins a
             1-row-per-cell table — anchors x 3 candidate rows at ANY
             corpus size, with negative DIVERSITY of n_buckets x n_subs
             distinct candidates corpus-wide (raise n_subs to scale it).
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
    representative of the anchor's OWN pick-cell in the corpus hash grid,
    excluding the anchor and its positive.

    The grid: candidates hash into n_buckets x n_subs cells, and each
    cell reduces to its coin-smallest member (one groupBy with map-side
    partials — no per-bucket sort). Each anchor deterministically picks a
    cell from ITS OWN hashes (bucket from one salt, sub-cell from
    another) and takes that cell's representative; the next two sub-cells
    serve as fallbacks so the anchor/positive exclusions can never starve
    an anchor whose three cells are populated. The candidate join is
    <= 3 rows per anchor at ANY corpus size, and distinct negatives scale
    with the grid (n_buckets * n_subs cells — raise n_subs for larger
    corpora), not with a fixed shortlist."""
    from pyspark.sql import Window

    # both pair directions from ONE evaluation of the pair subtree
    # (round-14 opt, guide §2.4 — same explode-over-union fix as
    # graph.cooccurrence_similarity): the union referenced `pairs` twice,
    # and with an expensive pair source (the exact-Jaccard self-join) the
    # whole subtree ran once per branch; the struct explode emits the
    # identical row multiset from a single instance, no barrier needed
    sym = pairs.select(
        F.explode(F.array(
            F.struct(
                F.col("id_a").alias("anchor"),
                F.col("id_b").alias("positive"),
            ),
            F.struct(
                F.col("id_b").alias("anchor"),
                F.col("id_a").alias("positive"),
            ),
        )).alias("__p"),
        F.col("jaccard").alias("pos_jaccard"),
    ).select("__p.anchor", "__p.positive", "pos_jaccard")
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
        .select("__b", "__sub", F.col("__m.__cand").alias("__cand"))
    )
    picked = best.withColumn(
        "__b", md5_bucket(F.col("anchor"), n_buckets, salt + "pick")
    ).withColumn(
        "__s0", md5_bucket(F.col("anchor"), n_subs, salt + "picksub")
    )
    tries = picked.withColumn(
        "__k", F.explode(F.array(F.lit(0), F.lit(1), F.lit(2)))
    ).withColumn("__sub", F.pmod(F.col("__s0") + F.col("__k"), F.lit(n_subs)))
    cand = tries.join(sub_min, ["__b", "__sub"]).filter(
        (F.col("__cand") != F.col("anchor"))
        & (F.col("__cand") != F.col("positive"))
    )
    w2 = Window.partitionBy("anchor").orderBy("__k")
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
    # single-evaluation symmetric expansion — same explode-over-union
    # rationale as contrastive_triplets above
    sym = hard_pairs.select(
        F.explode(F.array(
            F.struct(
                F.col("id_a").alias("anchor"), F.col("id_b").alias("__hn")
            ),
            F.struct(
                F.col("id_b").alias("anchor"), F.col("id_a").alias("__hn")
            ),
        )).alias("__p"),
        F.col("jaccard").alias("__hj"),
    ).select("__p.anchor", "__p.__hn", "__hj")
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
