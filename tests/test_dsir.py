"""DSIR importance resampling (Xie et al. 2023)."""

import pytest
from pyspark.sql import functions as F

from readur_spark.operators.dsir import dsir_resample, dsir_weights


def _mk(spark, rows):
    return spark.createDataFrame(rows, "doc_id string, text string")


def test_target_like_docs_get_higher_weights(spark):
    """Docs sharing the target's vocabulary outweigh off-domain docs."""
    target = _mk(
        spark,
        [(f"t{i}", "medical clinical trial patient dosage outcome study")
         for i in range(5)],
    )
    raw = _mk(
        spark,
        [
            ("in", "clinical trial patient dosage outcome measured today"),
            ("out", "football match score goal referee stadium crowd"),
            ("mid", "patient outcome and football score mixed content here"),
        ],
    )
    w = {r["doc_id"]: r["log_w"] for r in dsir_weights(raw, target, num_buckets=512).collect()}
    assert w["in"] > w["mid"] > w["out"]


def test_weights_deterministic_and_scale_free(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tgt = docs.filter(F.col("doc_id") % 5 == 0)
    a = {tuple(r) for r in dsir_weights(docs, tgt, num_buckets=1024).collect()}
    b = {tuple(r) for r in dsir_weights(docs, tgt, num_buckets=1024).collect()}
    assert a == b and a


def test_resample_prefers_target_like_and_is_deterministic(spark):
    target = _mk(
        spark,
        [(f"t{i}", "quantum physics particle momentum wave function energy")
         for i in range(4)],
    )
    rows = [(f"phys{i}", "particle momentum energy wave measured in lab") for i in range(6)]
    rows += [(f"cook{i}", "recipe butter flour sugar oven baking tray") for i in range(6)]
    raw = _mk(spark, rows)
    picked = {
        r["doc_id"]
        for r in dsir_resample(raw, target, k=5, num_buckets=512,
                               temperature=0.05).collect()
    }
    assert len(picked) == 5
    assert sum(d.startswith("phys") for d in picked) >= 4  # near-argmax at low T
    again = {
        r["doc_id"]
        for r in dsir_resample(raw, target, k=5, num_buckets=512,
                               temperature=0.05).collect()
    }
    assert picked == again  # pure function of (corpus, salt)


def test_resample_plan_is_distributed_topk(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tgt = docs.filter(F.col("doc_id") % 5 == 0)
    from readur_spark.operators.dsir import dsir_weights as dw
    from readur_spark.operators.sampling import hash_uniform_col

    weights = dw(docs, tgt, num_buckets=1024)
    u = hash_uniform_col(F.col("doc_id"), "x")
    keyed = weights.withColumn("k", F.col("log_w") + -F.log(-F.log(u)))
    plan = (
        keyed.orderBy(F.desc("k")).limit(10)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "TakeOrderedAndProject" in plan, plan


def test_resample_rejects_nonpositive_temperature(spark):
    from readur_spark.operators.dsir import dsir_resample

    docs = _mk(spark, [("1", "a b c")])
    with pytest.raises(ValueError, match="temperature"):
        dsir_resample(docs, docs, k=1, temperature=0)


def test_dsir_self_target_gives_zero_weights(spark):
    """When the target IS the raw corpus, both bucket distributions are
    identical, every log-ratio is exactly 0, and all weights vanish —
    the importance-sampling identity."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    rows = dsir_weights(docs, docs, num_buckets=1024).collect()
    assert rows and all(r["log_w"] == 0.0 for r in rows)


def test_resample_threshold_path_equals_takeordered(spark):
    """r4 verdict #3: above driver_topk_max the selection switches to
    approxQuantile threshold + bounded boundary band; the selected set
    must be IDENTICAL to the TakeOrdered answer."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tgt = docs.filter(F.col("doc_id") % 5 == 0)
    for k in (7, 40, 150):
        small = {
            r["doc_id"]
            for r in dsir_resample(
                docs, tgt, k=k, num_buckets=1024,
                driver_topk_max=10**9,
            ).collect()
        }
        large = {
            r["doc_id"]
            for r in dsir_resample(
                docs, tgt, k=k, num_buckets=1024,
                driver_topk_max=0, boundary_band=64,
            ).collect()
        }
        assert large == small, (k, sorted(large ^ small))
        assert len(large) == k


def test_resample_threshold_path_has_no_k_row_limit(spark):
    """The large-k plan must contain no k-row limit / TakeOrdered over
    the keyed corpus — only the bounded boundary-band limit (< k)."""
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    tgt = docs.filter(F.col("doc_id") % 5 == 0)
    k = 150
    out = dsir_resample(
        docs, tgt, k=k, num_buckets=1024,
        driver_topk_max=0, boundary_band=64,
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert f"TakeOrderedAndProject(limit={k}" not in plan, plan
    assert f"GlobalLimit {k}" not in plan, plan


def test_resample_k_at_least_corpus_returns_all_weighted(spark):
    docs = _mk(spark, [(f"d{i}", "alpha beta gamma delta") for i in range(8)])
    out = dsir_resample(
        docs, docs, k=100, num_buckets=64, driver_topk_max=0
    ).collect()
    assert len(out) == 8
