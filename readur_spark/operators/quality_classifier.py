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
  Each iteration is ONE Arrow-batched scoring pass (per-doc dot against
  the broadcast weight vector, folded over buckets in ascending order —
  a fixed float64 reduction order) + ONE groupBy(bucket) gradient
  aggregation whose addends are cast to DECIMAL(30,15) so the shuffle's
  summation order cannot perturb the result. The d+1 gradient values
  come to the driver (bounded by num_buckets — metadata scale), the
  weight update is plain Python. The labeled set is the small side (a
  curated positive corpus vs a raw sample); corpus-wide SCORING is the
  linear pass.
* **scoring** — one projection per document against the broadcast
  weights; no shuffle, no joins. At 10^12 docs this is scan-speed.

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
            out.append(1.0 / (1.0 + math.exp(-acc)))
        return pd.Series(out)

    return score


def train_quality_classifier(
    positive: DataFrame,
    negative: DataFrame,
    num_buckets: int = 1024,
    iters: int = 30,
    lr: float = 2.0,
    l2: float = 1e-4,
    id_col: str = "doc_id",
    text_col: str = "text",
    driver_train_max: int = 100_000,
) -> dict:
    """Train the filter: ``positive`` = reference-quality docs,
    ``negative`` = raw/web sample. Returns
    ``{"weights": [...], "bias": float, "num_buckets": int, "losses": [...]}``
    — plain Python, broadcastable, serializable.

    Determinism contract (what the oracle replays): per-doc probability
    folds (cnt/total)·w over buckets ascending in float64; per-bucket
    gradient addends are ``CAST((p - y) * cnt / total AS DECIMAL(30,15))``
    summed exactly; updates ``w -= lr * (g / n + l2 * w)`` in Python.

    Size dispatch: labeled sets up to ``driver_train_max`` docs collect
    their (bounded) feature rows once and run the identical loop on the
    driver — iteration cost becomes microseconds instead of a Spark
    action (quality-filter training sets are curated samples, usually
    10^4–10^5 docs). Larger sets train distributed; BOTH paths implement
    the same decimal-quantized arithmetic and are equality-tested
    (tests/test_quality_classifier.py), so the dispatch never changes
    the model."""
    labeled = positive.select(
        F.col(id_col).alias(id_col), F.col(text_col).alias(text_col),
        F.lit(1.0).alias("__y__"),
    ).unionByName(
        negative.select(
            F.col(id_col).alias(id_col), F.col(text_col).alias(text_col),
            F.lit(0.0).alias("__y__"),
        )
    )
    fs = _doc_features(labeled, num_buckets, id_col, text_col)
    data = (
        fs.join(labeled.select(F.col(id_col).alias("id"), "__y__"), "id")
        .select("id", "fs", "total", "__y__")
        .persist()
    )
    n = data.count()
    if n == 0:
        data.unpersist()
        return {
            "weights": [0.0] * num_buckets, "bias": 0.0,
            "num_buckets": num_buckets, "losses": [],
        }
    if n <= driver_train_max:
        rows = data.collect()
        data.unpersist()
        local = [
            (
                [(int(f["bucket"]), int(f["cnt"])) for f in r["fs"]],
                float(r["total"]),
                float(r["__y__"]),
            )
            for r in rows
        ]
        return _train_local(local, num_buckets, iters, lr, l2)

    w = [0.0] * num_buckets
    bias = 0.0
    losses: list[float] = []
    dec = "decimal(30,15)"
    for _ in range(iters):
        p = _score_udf(w, bias)(F.col("fs"), F.col("total"))
        scored = data.select(
            "fs", "total", (p - F.col("__y__")).alias("err"),
            (-(F.col("__y__") * F.log(p)
               + (1.0 - F.col("__y__")) * F.log(1.0 - p))).alias("nll"),
        )
        # ONE action per iteration: per-bucket gradient rows unioned with
        # two sentinel buckets (-1 = bias gradient, -2 = loss total) so
        # the whole update is a single groupBy-collect
        per_bucket = scored.select(
            F.explode("fs").alias("f"),
            (F.col("err") * F.col("f.cnt") / F.col("total"))
            .cast(dec).alias("g"),
        ).select(F.col("f.bucket").alias("bucket"), "g")
        sentinels = scored.select(
            F.lit(-1).alias("bucket"), F.col("err").cast(dec).alias("g")
        ).unionByName(
            scored.select(
                F.lit(-2).alias("bucket"), F.col("nll").cast(dec).alias("g")
            )
        )
        rows = (
            per_bucket.unionByName(sentinels)
            .groupBy("bucket")
            .agg(F.sum("g").alias("g"))
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
    data.unpersist()
    return {
        "weights": w, "bias": bias,
        "num_buckets": num_buckets, "losses": losses,
    }


def _train_local(data, num_buckets: int, iters: int, lr: float, l2: float) -> dict:
    """Driver-side twin of the distributed loop — byte-for-byte the same
    arithmetic (float64 ascending-bucket folds, DECIMAL(30,15) HALF_UP
    quantized gradient addends summed exactly, Python float updates)."""
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
            p = 1.0 / (1.0 + math.exp(-acc))
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
