"""Distributed logistic regression (pipeline/classifier.py)."""

from pyspark.sql import functions as F

from ophidia_server_spark.pipeline import classifier as clf
from ophidia_server_spark.pipeline.dsir import hashed_gram_counts


def _marker_corpus(tables, n=200):
    docs = tables["documents"].filter(f"doc_id < {n}")
    return docs.select(
        "doc_id",
        F.when(
            F.col("doc_id") % 2 == 1,
            F.concat(F.lit("curated marker phrase "), F.col("text")),
        ).otherwise(F.col("text")).alias("text"),
        (F.col("doc_id") % 2).cast("int").alias("label"),
    )


def test_line_search_makes_loss_monotone_and_model_learns(spark, tables):
    corpus = _marker_corpus(tables)
    gc = (
        hashed_gram_counts(corpus, m=128)
        .select("doc_id", "bucket", F.lit(1.0).alias("c"))
        .distinct()
        .persist()
    )
    labels = corpus.select("doc_id", "label")
    try:
        res = clf.logreg_train(gc, labels, m=128, iters=8, lr=1.0)
        assert all(
            res.losses[i + 1] <= res.losses[i] + 1e-12
            for i in range(len(res.losses) - 1)
        ), res.losses
        assert res.losses[-1] < res.losses[0]
        pred = clf.logreg_predict(gc, corpus.select("doc_id"), res.weights, res.bias)
        j = pred.join(labels, "doc_id")
        acc = j.filter("keep = label").count() / j.count()
        assert acc >= 0.75
        # independent loss recomputation pins the curve's last point
        assert abs(
            clf.logreg_loss_at(gc, labels, res.weights, res.bias) - res.losses[-1]
        ) < 1e-9
    finally:
        gc.unpersist()


def test_featureless_docs_score_bias_only(spark):
    feats = spark.createDataFrame(
        [(1, 0, 1.0), (1, 3, 1.0), (2, 0, 1.0)], "doc_id int, bucket int, c double"
    )
    labels = spark.createDataFrame(
        [(1, 1), (2, 0), (3, 1)], "doc_id int, label int"
    )
    res = clf.logreg_train(feats, labels, m=4, iters=3, lr=1.0)
    ids = labels.select("doc_id")
    pred = {r["doc_id"]: r for r in clf.logreg_predict(feats, ids, res.weights, res.bias).collect()}
    assert set(pred) == {1, 2, 3}
    assert abs(pred[3]["prob"] - round(clf.sigmoid(res.bias), 6)) < 1e-9


def test_tf_normalize_bounds_and_sums(spark):
    feats = spark.createDataFrame(
        [(1, 0, 3.0), (1, 1, 1.0), (2, 2, 5.0)], "doc_id int, bucket int, c double"
    )
    rows = clf.tf_normalize(feats).collect()
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], 0.0)
        per_doc[r["doc_id"]] += r["c"]
        assert 0 < r["c"] <= 1.0
    assert abs(per_doc[1] - 1.0) < 1e-12 and abs(per_doc[2] - 1.0) < 1e-12


def test_empty_labels_raise(spark):
    feats = spark.createDataFrame([(1, 0, 1.0)], "doc_id int, bucket int, c double")
    labels = spark.createDataFrame([], "doc_id int, label int")
    import pytest as _pytest

    with _pytest.raises(ValueError):
        clf.logreg_train(feats, labels, m=4)
