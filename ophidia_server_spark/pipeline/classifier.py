"""Distributed logistic-regression training over hashed text features.

The training half of the fastText-style quality classifier
(pipeline/packing.quality_logistic is the serving half with pinned
weights; this learns weights from labeled examples — the public
CCNet/GPT-3 recipe trains exactly this shape: a linear model over
bag-of-hashed-ngram features separating "curated-looking" from raw text).

Features are the SAME hashed unigram+bigram bucket counts DSIR uses
(pipeline/dsir.hashed_gram_counts) — m is a parameter, so the weight
vector is bounded and rides into every task as plan literals.

Full-batch gradient descent, the canonical distributed shape:
  score   : per-document sum of c_b * w[b] — one groupBy(doc) aggregate
            with the weights as a LITERAL array (no join, no broadcast
            table; m doubles live in the plan);
  gradient: one groupBy(bucket) aggregate of (sigmoid(score)-y)*c — at
            most m+1 doubles to the driver per iteration;
  update  : driver-side w -= lr * grad (m floats).
O(iters) passes over the cached feature table; nothing else grows with n.
The loss the trainer records each iteration is the exact binary
cross-entropy at the CURRENT weights, so monotone decrease (guaranteed
for small enough lr by convexity) is checkable — the correctness gate
grades that invariant plus an independent JVM recomputation of one
gradient step, the same oracle-pinned style as clustering.kmeans_lloyd.
"""

from __future__ import annotations

import math
from typing import NamedTuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from ophidia_server_spark.functions.lits import const_double_array


class LogRegResult(NamedTuple):
    """weights: m floats (hashed-bucket coefficients). bias: scalar.
    losses: binary cross-entropy recorded at the START of each iteration
    (non-increasing for convergent lr). prev_weights/prev_bias: the
    parameters the LAST recorded gradient was computed at — the update
    equation w = prev - lr * grad(prev) holds exactly."""

    weights: list
    bias: float
    losses: list
    prev_weights: list
    prev_bias: float


def _scores(features: DataFrame, weights: list, bias: float,
            id_col: str) -> DataFrame:
    """(id, score): sum_b c_b * w[b] + bias via a literal weight array —
    one grouped aggregate, no join."""
    warr = const_double_array(weights)
    term = F.col("c").cast("double") * F.element_at(warr, F.col("bucket").cast("int") + 1)
    return features.groupBy(id_col).agg(
        (F.sum(term) + F.lit(float(bias))).alias("score")
    )


def logreg_train(
    features: DataFrame,
    labels: DataFrame,
    m: int,
    iters: int = 10,
    lr: float = 1.0,
    id_col: str = "doc_id",
    label_col: str = "label",
    max_backtracks: int = 12,
) -> LogRegResult:
    """Train on (id, bucket, c) features and (id, label in {0,1}) labels.
    Documents with no feature rows score bias-only (the left join keeps
    them in the loss and gradient-bias). Deterministic init (zeros) and
    BACKTRACKING LINE SEARCH: each step halves lr until the loss actually
    drops (convexity guarantees a small-enough step exists), so the
    recorded loss curve is non-increasing BY CONSTRUCTION — the property
    the gate grades — with a 1.5x regrow on acceptance so steps don't
    stay conservative forever. Fixed iteration count; persist the feature
    table before calling (every iteration re-reads it)."""
    labs = labels.select(
        F.col(id_col), F.col(label_col).cast("double").alias("__y")
    )
    n = labs.count()
    if n == 0:
        raise ValueError("logreg_train: no labeled examples")

    def loss_and_gbias(wv, bv):
        scored = labs.join(
            _scores(features, wv, bv, id_col), id_col, "left"
        ).select(
            id_col, "__y", F.coalesce("score", F.lit(float(bv))).alias("score")
        )
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("score")))
        eps = 1e-12
        row = scored.agg(
            F.avg(
                -(
                    F.col("__y") * F.log(p + eps)
                    + (1.0 - F.col("__y")) * F.log(1.0 - p + eps)
                )
            ).alias("loss"),
            F.avg(p - F.col("__y")).alias("gbias"),
        ).first()
        return float(row["loss"]), float(row["gbias"]), scored, p

    w = [0.0] * m
    b = 0.0
    losses: list[float] = []
    prev_w, prev_b = list(w), b
    step = float(lr)
    cur_loss, gbias, scored, p = loss_and_gbias(w, b)
    for _ in range(iters):
        losses.append(cur_loss)
        err = scored.select(id_col, (p - F.col("__y")).alias("__err"))
        grad = {
            r["bucket"]: float(r["g"])
            for r in features.join(err, id_col)
            .groupBy("bucket")
            .agg((F.sum(F.col("c") * F.col("__err")) / n).alias("g"))
            .collect()
        }
        prev_w, prev_b = list(w), b
        accepted = False
        for _try in range(max_backtracks):
            cand_w = list(prev_w)
            for bk, g in grad.items():
                cand_w[bk] = prev_w[bk] - step * g
            cand_b = prev_b - step * gbias
            cand_loss, cand_gbias, cand_scored, cand_p = loss_and_gbias(
                cand_w, cand_b
            )
            if cand_loss <= cur_loss:
                w, b = cand_w, cand_b
                cur_loss, gbias, scored, p = (
                    cand_loss, cand_gbias, cand_scored, cand_p,
                )
                step *= 1.5
                accepted = True
                break
            step *= 0.5
        if not accepted:  # gradient step can't improve: converged
            break
    return LogRegResult(w, b, losses + [cur_loss], prev_w, prev_b)


def logreg_predict(
    features: DataFrame,
    ids: DataFrame,
    weights: list,
    bias: float,
    id_col: str = "doc_id",
    threshold: float = 0.5,
) -> DataFrame:
    """(id, prob, keep) for every id — the serving pass: one grouped
    score aggregate with literal weights, a sigmoid, a threshold. `ids`
    keeps feature-less documents in the output (bias-only score)."""
    scored = ids.select(id_col).join(
        _scores(features, weights, bias, id_col), id_col, "left"
    ).select(
        id_col, F.coalesce("score", F.lit(float(bias))).alias("score")
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("score")))
    return scored.select(
        id_col,
        F.round(p, 6).alias("prob"),
        (p >= threshold).cast("int").alias("keep"),
    )


def logreg_loss_at(
    features: DataFrame,
    labels: DataFrame,
    weights: list,
    bias: float,
    id_col: str = "doc_id",
    label_col: str = "label",
) -> float:
    """Independent loss recomputation at given parameters (used by the
    gate to pin the recorded loss curve and the update equation)."""
    labs = labels.select(
        F.col(id_col), F.col(label_col).cast("double").alias("__y")
    )
    scored = labs.join(_scores(features, weights, bias, id_col), id_col, "left").select(
        "__y", F.coalesce("score", F.lit(float(bias))).alias("score")
    )
    p = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("score")))
    eps = 1e-12
    return float(
        scored.agg(
            F.avg(
                -(
                    F.col("__y") * F.log(p + eps)
                    + (1.0 - F.col("__y")) * F.log(1.0 - p + eps)
                )
            )
        ).first()[0]
    )


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))


def tf_normalize(features: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Term-frequency normalization: c -> c / (document's total count).
    Bounds every feature in (0, 1], which keeps full-batch gradient
    descent stable at ordinary learning rates (raw counts scale the
    gradient with document length and diverge). One grouped sum + a
    same-key join — both shuffle on id, and AQE coalesces them."""
    totals = features.groupBy(id_col).agg(F.sum("c").alias("__tot"))
    return features.join(totals, id_col).select(
        id_col, "bucket",
        (F.col("c").cast("double") / F.col("__tot")).alias("c"),
    )
