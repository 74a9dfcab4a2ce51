"""Trained character-n-gram language identification.

The serving-quality replacement for pipeline/text.py `lang_id`'s
stop-word heuristic (which stays as the tie-break fallback): a multinomial
Naive Bayes over hashed character n-gram counts — the classic compact
langid shape (langid.py's model family; fastText's is the logistic sibling
classifier.py already provides). NB is chosen over the GD trainer for the
language task because its weights are CLOSED-FORM from one grouped count —
log((c_{l,b}+1)/(T_l+m)) — which makes the whole model, margins included,
independently recomputable by the DuckDB oracle: the gate is hash-exact,
not a verdict.

Cross-engine exactness: weights and priors are quantized to integer
micro-logits (round(1e6 * ln(...))), so a document's per-language score is
an ORDER-INDEPENDENT INTEGER sum — immune to float fold-order, identical
in Spark and DuckDB. Gram hashing rides the repo's md5 bucket contract
(functions/hashing.md5_bucket / registry._HEX8).

Scale shape: training is one explode + one (lang, bucket) grouped count —
k x m bounded rows to the driver (k languages, m buckets; never corpus-
sized). Serving is a PURE MAP: the k weight arrays ride the plan as
literals and each document folds its gram-bucket array through
element_at + sum — no join, no shuffle, no Python.
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ophidia_server_spark.functions.hashing import md5_bucket
from ophidia_server_spark.pipeline.text import STOPWORDS, tokens

QUANT = 1_000_000  # micro-logit quantization (see module docstring)
GRAM_SALT = "langid"


def char_gram_buckets(text_col: Column, n: int = 2, m: int = 256) -> Column:
    """Array of hashed bucket ids, one per overlapping n-char gram of the
    raw text (length < n -> empty array). All JVM expressions."""
    txt = text_col
    # guard the sequence: F.sequence(1, 0) yields DESCENDING [1, 0], not
    # empty — a text shorter than n would fabricate phantom grams
    idxs = F.when(
        F.length(txt) >= n, F.sequence(F.lit(1), F.length(txt) - (n - 1))
    ).otherwise(F.array().cast("array<int>"))
    grams = F.transform(idxs, lambda i: F.substring(txt, i, n))
    return F.transform(grams, lambda g: md5_bucket(g, m, GRAM_SALT))


def nb_train(
    df: DataFrame,
    label_col: str = "lang",
    text_col: str = "text",
    n: int = 2,
    m: int = 256,
) -> dict:
    """Train the multinomial NB: one grouped count over exploded gram
    buckets plus per-language document counts. Returns
    {"langs": sorted labels, "n": n, "m": m,
     "weights": {lang: [m quantized log-likelihoods]},
     "priors": {lang: quantized log prior}}."""
    ex = df.select(
        F.col(label_col).alias("__l"),
        F.explode(char_gram_buckets(F.col(text_col), n, m)).alias("__b"),
    )
    counts = {
        (r["__l"], r["__b"]): r["c"]
        for r in ex.groupBy("__l", "__b").agg(F.count(F.lit(1)).alias("c")).collect()
    }
    docs = {
        r["__l"]: r["c"]
        for r in df.groupBy(F.col(label_col).alias("__l"))
        .agg(F.count(F.lit(1)).alias("c"))
        .collect()
    }
    langs = sorted(docs)
    n_docs = sum(docs.values())
    totals = {
        lang: sum(counts.get((lang, b), 0) for b in range(m)) for lang in langs
    }
    weights = {
        lang: [
            round(QUANT * math.log((counts.get((lang, b), 0) + 1)
                                   / (totals[lang] + m)))
            for b in range(m)
        ]
        for lang in langs
    }
    priors = {
        lang: round(QUANT * math.log(docs[lang] / n_docs)) for lang in langs
    }
    return {"langs": langs, "n": n, "m": m, "weights": weights,
            "priors": priors}


def nb_predict(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    abstain_margin: int | None = None,
) -> DataFrame:
    """Score every document against every language — pure map, weights as
    plan literals. Returns (id, pred_lang, margin): margin is the
    integer micro-logit gap between the best and second-best language.

    `abstain_margin` (round-12 hardening): a prediction whose integer
    margin falls below it is relabeled 'und' — the honest output for
    short/degenerate texts where the model is guessing, and what a
    corpus mix table should count rather than a coin-flip language. The
    margin column keeps the raw gap either way, so the caller can audit
    the abstention boundary. Purely a map over the integer margin — the
    oracle mirrors it with one CASE.

    Tie-break is the HEURISTIC'S VOTE (the round-11 contract: the old
    stop-word rule survives as fallback): languages rank by
    (score desc, heuristic-en boost desc, lang asc), so when two
    languages score identically — degenerate/empty texts — an 'en'
    candidate wins exactly when the stop-word ratio rule would have said
    'en', else the alphabetically first tied language."""
    langs = model["langs"]
    n, m = model["n"], model["m"]
    buckets = char_gram_buckets(F.col(text_col), n, m)
    toks = tokens(F.col(text_col))
    n_tok = F.size(toks)
    stop_hits = F.size(F.filter(toks, lambda t: F.lower(t).isin(*STOPWORDS)))
    heur_en = (
        (n_tok > 0)
        & (stop_hits.cast("double") / n_tok.cast("double") >= 0.03)
    ).cast("int")
    scores = []
    for idx, lang in enumerate(langs):
        warr = F.array(
            *[F.lit(int(w)).cast("long") for w in model["weights"][lang]]
        )
        s = F.aggregate(
            buckets,
            F.lit(int(model["priors"][lang])).cast("long"),
            lambda acc, b: acc + F.element_at(warr, b.cast("int") + 1),
        )
        boost = heur_en if lang == "en" else F.lit(0)
        scores.append((idx, lang, s, boost))
    ranked = F.array_max(
        F.array(
            *[
                F.struct(
                    s.alias("s"), b.alias("boost"),
                    F.lit(-idx).alias("negidx"),
                )
                for idx, _, s, b in scores
            ]
        )
    )
    langs_lit = F.array(*[F.lit(lang) for lang in langs])
    sorted_scores = F.array_sort(F.array(*[s for _, _, s, _ in scores]))
    margin = (
        F.element_at(sorted_scores, -1) - F.element_at(sorted_scores, -2)
        if len(langs) > 1
        else F.lit(0).cast("long")
    )
    pred = F.element_at(langs_lit, -ranked["negidx"] + 1)
    # abstention needs a COMPETING language to measure confidence against:
    # a single-language model's margin is degenerately 0 (no second-best),
    # and relabeling its every prediction 'und' would be absurd
    if abstain_margin is not None and len(langs) > 1:
        pred = F.when(
            margin < F.lit(int(abstain_margin)), F.lit("und")
        ).otherwise(pred)
    return df.select(
        F.col(id_col),
        pred.alias("pred_lang"),
        margin.alias("margin"),
    )
