"""Learned document-quality classifier — the GPT-3 / CCNet recipe.

The public curation pipelines that go beyond rule filters train a cheap
linear classifier to score "does this look like the high-quality
reference corpus?": GPT-3 trained a logistic-regression filter with
hashed features of WebText-vs-CommonCrawl (Brown et al. 2020, App. A);
CCNet ships a fastText linear classifier for the same job (Wenzek 2020).
This module is that step, Spark-first and bit-deterministic so the
driver's DuckDB/Python oracle can replay training exactly.

Shape:

* **features** — hashed unigram counts (`dsir.hashed_ngram_features`
  with n=1: md5-bucket construction, engine-portable), length-normalized
  per document (count / total — the fastText mean-pooling analog).
* **training** — full-batch logistic regression, fixed iteration count,
  learning rate, and L2 (no data-dependent stopping: determinism).
  Size-dispatched: labeled sets up to ``driver_train_max`` docs stream
  their bounded feature rows to the driver once and run the loop
  in-process (curated filter-training sets are 10^4–10^5 docs; each
  iteration is then microseconds); larger sets run each iteration as ONE
  Arrow-batched pass — a single pandas UDF computes the per-document
  probability, error, and loss and emits every gradient addend (plus
  bias/loss sentinel buckets) in one array, so one explode + one
  groupBy(bucket) finishes the iteration. Gradient addends are cast to
  DECIMAL(30,15) before the shuffle sum so partitioning cannot perturb
  the result; the d+2 summed values come to the driver (bounded by
  num_buckets) and the weight update is plain Python. Both paths
  implement identical arithmetic and are equality-tested — the dispatch
  never changes the model.
* **scoring** — one projection per document against the broadcast
  weights; no shuffle, no joins. At 10^12 docs this is scan-speed.

Determinism contract (what the oracle replays): probabilities come from
the numerically-stable sigmoid (``exp(acc)/(1+exp(acc))`` for negative
``acc`` — no overflow at any weight scale) of a float64 fold over
buckets in ASCENDING order; for the gradient/loss they are clamped to
``[1e-12, 1 - 1e-12]`` so a saturated document never produces log(0)
(both paths, same clamp); addends quantize to DECIMAL(30,15) HALF_UP
and sum exactly; updates ``w -= lr * (g/n + l2*w)`` in Python floats.

Why not spark.ml LogisticRegression: LBFGS's line search makes results
depend on partitioning/threading — unverifiable by a value oracle. The
fixed-schedule GD here is deterministic to the last bit, and for the
~10^3-bucket filters these pipelines use, converges comfortably.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from readur_spark.operators.dsir import hashed_ngram_features

#: probability clamp for log/gradient terms — keeps a fully-saturated
#: document finite instead of log(0) (identical in every path + replica)
P_EPS = 1e-12


def _sigmoid(acc: float) -> float:
    """Numerically-stable logistic — THE formula every path and the
    oracle replica share (the two algebraic forms round differently, so
    mixing them would break bit parity)."""
    if acc >= 0.0:
        return 1.0 / (1.0 + math.exp(-acc))
    e = math.exp(acc)
    return e / (1.0 + e)


def _doc_features(
    docs: DataFrame, num_buckets: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, fs array<struct<bucket,cnt>> sorted by bucket, total) — the
    per-document feature rows. Sorting fixes the fold order so the
    float64 dot product is reproducible."""
    feats = hashed_ngram_features(
        docs, n=1, num_buckets=num_buckets, id_col=id_col, text_col=text_col
    )
    return feats.groupBy("id").agg(
        F.array_sort(
            F.collect_list(F.struct("bucket", "cnt"))
        ).alias("fs"),
        F.sum("cnt").alias("total"),
    )


def _score_udf(weights: list[float], bias: float):
    w = np.asarray(weights, dtype=np.float64)
    b = float(bias)

    @F.pandas_udf("double")
    def score(fs: pd.Series, total: pd.Series) -> pd.Series:
        out = []
        for row, tot in zip(fs, total):
            acc = b
            t = float(tot)
            for item in row:  # ascending bucket order — fixed fold
                acc += (item["cnt"] / t) * w[item["bucket"]]
            out.append(_sigmoid(acc))
        return pd.Series(out)

    return score


def _grad_udf(weights: list[float], bias: float):
    """One pass per document: probability, clamped error/loss, and ALL
    gradient addends (bucket -1 = bias, -2 = loss) as one array — the
    iteration's only UDF evaluation."""
    w = np.asarray(weights, dtype=np.float64)
    b = float(bias)

    @F.pandas_udf("array<struct<bucket:int,g:double>>")
    def grad(fs: pd.Series, total: pd.Series, y: pd.Series) -> pd.Series:
        rows = []
        for row, tot, yy in zip(fs, total, y):
            acc = b
            t = float(tot)
            for item in row:
                acc += (item["cnt"] / t) * w[item["bucket"]]
            p = min(max(_sigmoid(acc), P_EPS), 1.0 - P_EPS)
            err = p - yy
            out = [
                {"bucket": int(item["bucket"]), "g": err * item["cnt"] / t}
                for item in row
            ]
            out.append({"bucket": -1, "g": err})
            out.append(
                {"bucket": -2,
                 "g": -(yy * math.log(p) + (1.0 - yy) * math.log(1.0 - p))}
            )
            rows.append(out)
        return pd.Series(rows)

    return grad


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    num_buckets: int = 1024,
    iters: int = 30,
    lr: float = 2.0,
    l2: float = 1e-4,
    id_col: str = "doc_id",
    text_col: str = "text",
    driver_train_max: int = 20_000,
) -> dict:
    """Train the filter: ``positive`` = reference-quality docs,
    ``negative`` = raw/web sample. Returns
    ``{"weights": [...], "bias": float, "num_buckets": int, "losses": [...]}``
    — plain Python, broadcastable, serializable.

    ``driver_train_max`` bounds the driver-path memory: 20k docs of
    ordinary web text carry ~10^7 (bucket, cnt) pairs ≈ low hundreds of
    MB materialized through ``toLocalIterator`` (one partition in flight,
    rows converted to plain tuples as they stream). Above the bound the
    distributed loop runs instead — same model either way."""
    labeled = positive.select(
        F.col(id_col).alias(id_col), F.col(text_col).alias(text_col),
        F.lit(1.0).alias("__y__"),
    ).unionByName(
        negative.select(
            F.col(id_col).alias(id_col), F.col(text_col).alias(text_col),
            F.lit(0.0).alias("__y__"),
        )
    )
    # Guard: _doc_features groups the UNION by id, so a doc_id appearing
    # in both sides (or twice in one) would silently merge two documents'
    # features into one row and the label join would then emit that
    # corrupted row once per label — double-counted gradient. Fail fast
    # instead; the check is one metadata-scale aggregate.
    dup = (
        labeled.groupBy(id_col)
        .count()
        .filter(F.col("count") > 1)
        .limit(1)
        .collect()
    )
    if dup:
        raise ValueError(
            f"train_quality_classifier: {id_col}={dup[0][id_col]!r} appears "
            "more than once across positive+negative — ids must be unique "
            "and the two sides disjoint"
        )
    fs = _doc_features(labeled, num_buckets, id_col, text_col)
    data = (
        fs.join(labeled.select(F.col(id_col).alias("id"), "__y__"), "id")
        .select("id", "fs", "total", "__y__")
        .persist()
    )
    try:
        n = data.count()
        if n == 0:
            return {
                "weights": [0.0] * num_buckets, "bias": 0.0,
                "num_buckets": num_buckets, "losses": [],
            }
        if n <= driver_train_max:
            local = [
                (
                    [(int(f["bucket"]), int(f["cnt"])) for f in r["fs"]],
                    float(r["total"]),
                    float(r["__y__"]),
                )
                for r in data.toLocalIterator()
            ]
            return _train_local(local, num_buckets, iters, lr, l2)

        w = [0.0] * num_buckets
        bias = 0.0
        losses: list[float] = []
        dec = "decimal(30,15)"
        for _ in range(iters):
            items = _grad_udf(w, bias)(
                F.col("fs"), F.col("total"), F.col("__y__")
            )
            rows = (
                data.select(F.explode(items).alias("it"))
                .groupBy(F.col("it.bucket").alias("bucket"))
                .agg(F.sum(F.col("it.g").cast(dec)).alias("g"))
                .collect()
            )
            grad = [0.0] * num_buckets
            gb = loss_tot = 0.0
            for r in rows:
                b = int(r["bucket"])
                if b == -1:
                    gb = float(r["g"] or 0.0)
                elif b == -2:
                    loss_tot = float(r["g"] or 0.0)
                else:
                    grad[b] = float(r["g"])
            losses.append(round(loss_tot / n, 9))
            w = [
                wi - lr * (gi / n + l2 * wi) for wi, gi in zip(w, grad)
            ]
            bias -= lr * (gb / n)
        return {
            "weights": w, "bias": bias,
            "num_buckets": num_buckets, "losses": losses,
        }
    finally:
        data.unpersist()


def _train_local(data, num_buckets: int, iters: int, lr: float, l2: float) -> dict:
    """Driver-side twin of the distributed loop — byte-for-byte the same
    arithmetic (stable sigmoid, [P_EPS, 1-P_EPS] clamp, float64
    ascending-bucket folds, DECIMAL(30,15) HALF_UP quantized gradient
    addends summed exactly, Python float updates)."""
    from decimal import ROUND_HALF_UP, Decimal

    q15 = Decimal("1e-15")

    def dec15(x: float) -> Decimal:
        return Decimal(repr(x)).quantize(q15, rounding=ROUND_HALF_UP)

    w = [0.0] * num_buckets
    bias = 0.0
    n = len(data)
    losses: list[float] = []
    for _ in range(iters):
        grad = [Decimal(0)] * num_buckets
        gb = Decimal(0)
        loss = Decimal(0)
        for fs, total, y in data:
            acc = bias
            for b, c in fs:
                acc += (c / total) * w[b]
            p = min(max(_sigmoid(acc), P_EPS), 1.0 - P_EPS)
            err = p - y
            for b, c in fs:
                grad[b] += dec15(err * c / total)
            gb += dec15(err)
            loss += dec15(-(y * math.log(p) + (1.0 - y) * math.log(1.0 - p)))
        losses.append(round(float(loss) / n, 9))
        w = [wi - lr * (float(gi) / n + l2 * wi) for wi, gi in zip(w, grad)]
        bias -= lr * (float(gb) / n)
    return {
        "weights": w, "bias": bias,
        "num_buckets": num_buckets, "losses": losses,
    }


def score_quality(
    docs: DataFrame,
    model: dict,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(id_col, quality_prob) for every document with ≥1 token — the
    corpus-wide linear pass. Docs whose tokens all miss (empty text)
    produce no row; gate those on length filters."""
    fs = _doc_features(docs, int(model["num_buckets"]), id_col, text_col)
    p = _score_udf(model["weights"], model["bias"])(
        F.col("fs"), F.col("total")
    )
    return fs.select(
        F.col("id").alias(id_col), F.round(p, 6).alias("quality_prob")
    )


def quality_filter(
    docs: DataFrame,
    model: dict,
    min_prob: float = 0.5,
    id_col: str = "doc_id",
    **kwargs,
) -> DataFrame:
    """Keep documents the classifier scores at/above ``min_prob``
    (unscored short docs survive by absence from the drop set — same
    convention as perplexity_filter)."""
    scores = score_quality(docs, model, id_col=id_col, **kwargs)
    dropped = scores.filter(F.col("quality_prob") < min_prob).select(id_col)
    return docs.join(dropped, id_col, "left_anti")
