"""Hashed-feature linear quality classifier (fastText-shaped, no MLlib).

The canonical quality-filtering step in a training-data pipeline (GPT-3 /
CCNet style): train a linear classifier that separates a high-quality
reference corpus from raw crawl, score every document, keep a pacing
threshold. Here: logistic regression over hashed bag-of-token features,
trained by full-batch gradient descent expressed entirely in DataFrame
aggregations.

Scale structure (per epoch):

    features (doc, bucket, tf) — cached, 12 bytes/posting, computed once
    -> margin: element_at(broadcast weight array, bucket) * tf, groupBy(doc)
       — one shuffle on doc id
    -> err = sigmoid(margin) - label, joined back to features on doc id
       (co-partitioned with the margin shuffle)
    -> gradient: groupBy(bucket) of err*tf — ONE result row per feature
       dimension, so the driver collects `dim` doubles, never rows

The corpus never leaves the executors; the driver holds the weight vector
(dim + 1 floats). At 100 TB the epoch cost is two shuffles of the posting
list, the same shape as a word-count — no parameter server needed below
~10M features.

Determinism: every distributed sum that feeds the weights is accumulated in
DECIMAL(28,12) (exact, order-independent), and weights are quantized to
12 dp after each update — training produces bit-identical weights under ANY
partitioning of the input (pinned by test_classifier_deterministic).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEC = "DECIMAL(28,12)"


def hashed_token_features(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 256,
    mode: str = "presence",
) -> DataFrame:
    """-> (id, bucket, tf): hashed bag-of-tokens postings.

    Tokens = lowercased alpha runs; bucket = xxhash64(token) mod dim (the
    hashing trick — fixed dimensionality, no vocabulary broadcast).
    ``mode='presence'`` (default) emits 1.0 per present bucket — the
    strong-signal featurization for keyword-gate classifiers;
    ``mode='l1'`` emits token count / doc length. Either way the value is
    exact DECIMAL so downstream sums are order-independent.
    """
    toks = (
        docs.select(
            F.col(id_col).alias("id"),
            F.explode(F.split(F.lower(F.col(text_col)), "[^a-z]+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
    )
    counts = toks.groupBy("id", F.pmod(F.xxhash64("tok"), F.lit(dim)).alias("bucket")).agg(
        F.count("*").alias("n")
    )
    if mode == "presence":
        return counts.select(
            "id",
            F.col("bucket").cast("int").alias("bucket"),
            F.lit(1).cast(DEC).alias("tf"),
        )
    totals = counts.groupBy("id").agg(F.sum("n").alias("total"))
    return counts.join(totals, "id").select(
        "id",
        F.col("bucket").cast("int").alias("bucket"),
        (F.col("n").cast(DEC) / F.col("total")).cast(DEC).alias("tf"),
    )


def _weight_expr(weights: list[float]) -> Column:
    return F.array(*[F.lit(float(w)).cast("double") for w in weights])


def _margins(features: DataFrame, weights: list[float], bias: float) -> DataFrame:
    """(id, margin): dot(w, x) + b. The weight array is a broadcast literal;
    the per-posting product is exact decimal, summed per doc."""
    w = _weight_expr(weights)
    contrib = (F.element_at(w, F.col("bucket") + 1) * F.col("tf").cast("double")).cast(DEC)
    return features.groupBy("id").agg(
        (F.sum(contrib).cast("double") + F.lit(float(bias))).alias("margin")
    )


def train_quality_classifier(
    docs: DataFrame,
    label: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    dim: int = 256,
    epochs: int = 8,
    lr: float = 0.3,
) -> tuple[list[float], float, list[float]]:
    """Full-batch logistic regression -> (weights, bias, loss history).

    ``label`` is a boolean/0-1 Column over ``docs`` (e.g. F.col('lang') ==
    'en' to learn an English-vs-rest quality gate, or a curated-corpus
    membership flag).
    """
    labeled = docs.select(F.col(id_col).alias("id"), label.cast("double").alias("y"))
    features = hashed_token_features(docs, text_col, id_col, dim).cache()
    n_docs = labeled.count()
    weights = [0.0] * dim
    bias = 0.0
    loss_hist: list[float] = []
    for _ in range(epochs):
        m = _margins(features, weights, bias).join(labeled, "id")
        # p = sigmoid(margin); logloss + per-doc error in one pass
        p = F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin")))
        errs = m.select(
            "id",
            (p - F.col("y")).alias("err"),
            (-(F.col("y") * F.log(F.greatest(p, F.lit(1e-12)))
               + (1 - F.col("y")) * F.log(F.greatest(1 - p, F.lit(1e-12))))).cast(DEC).alias("ll"),
        )
        agg = errs.agg(
            F.sum("ll").cast("double").alias("loss"),
            F.sum(F.col("err").cast(DEC)).cast("double").alias("bias_grad"),
        ).collect()[0]
        loss_hist.append(agg["loss"] / n_docs)
        grad_rows = (
            errs.join(features, "id")
            .groupBy("bucket")
            .agg(F.sum((F.col("err") * F.col("tf").cast("double")).cast(DEC)).alias("g"))
            .collect()
        )
        grad = {r["bucket"]: float(r["g"]) for r in grad_rows}
        weights = [
            round(w - lr * grad.get(j, 0.0) / n_docs, 12) for j, w in enumerate(weights)
        ]
        bias = round(bias - lr * agg["bias_grad"] / n_docs, 12)
    features.unpersist()
    return weights, bias, loss_hist


def score_documents(
    docs: DataFrame,
    weights: list[float],
    bias: float,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, score): sigmoid(dot(w, x) + b) per document, distributed —
    the inference pass that gates the corpus at scale."""
    feats = hashed_token_features(docs, text_col, id_col, dim=len(weights))
    m = _margins(feats, weights, bias)
    return m.select(
        "id",
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin"))), 6).alias("score"),
    )


def sigmoid(x: float) -> float:
    return 1.0 / (1.0 + math.exp(-x))


def score_expr(
    weights: list[float], bias: float, text_col: str = "text"
) -> Column:
    """Pure-EXPRESSION scorer: sigmoid(dot(w, presence-features) + b) as a
    single higher-order-function column — tokenize, hash to buckets,
    distinct, look each bucket up in the broadcast weight-array literal,
    fold. No explode, no groupBy, NO SHUFFLE — which is what makes the
    trained gate applicable to a STREAMING dataframe (append mode needs
    stateless projections) and saves the batch path a per-doc aggregation.
    Matches score_documents exactly for mode='presence' features (pinned by
    test_score_expr_equals_scored)."""
    dim = len(weights)
    w = _weight_expr(weights)
    toks = F.filter(
        F.split(F.lower(F.col(text_col)), "[^a-z]+"), lambda t: t != ""
    )
    buckets = F.array_distinct(F.transform(toks, lambda t: F.pmod(F.xxhash64(t), F.lit(dim))))
    margin = F.aggregate(
        buckets,
        F.lit(0.0),
        lambda acc, b: acc + F.element_at(w, b.cast("int") + 1),
    ) + F.lit(float(bias))
    return F.lit(1.0) / (F.lit(1.0) + F.exp(-margin))
