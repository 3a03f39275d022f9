"""Checkpoint/resume semantics (SURVEY §2.8: Q3/Q6/Q7/Q11 analogs)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from readur_spark.corpus import docs_dataframe
from readur_spark.plans.checkpoint import CheckpointTable
from readur_spark.plans.pipeline import run_extraction

N_PARTS = 8


@pytest.fixture()
def dirs():
    d = tempfile.mkdtemp(prefix="readur_ckpt_")
    yield f"{d}/out", f"{d}/ckpt"
    shutil.rmtree(d, ignore_errors=True)


def test_full_run_then_noop_resume(spark, dirs):
    out, ckpt_path = dirs
    docs = docs_dataframe(spark, 80, seed=5)
    s1 = run_extraction(spark, docs, out, ckpt_path, num_partitions=N_PARTS)
    assert s1["partitions_processed"] == N_PARTS
    assert s1["docs_processed"] == 80

    result = spark.read.parquet(out)
    assert result.count() == 80

    # resume with everything completed → no work
    s2 = run_extraction(spark, docs, out, ckpt_path, num_partitions=N_PARTS)
    assert s2["partitions_processed"] == 0
    assert s2["partitions_skipped"] == N_PARTS
    assert spark.read.parquet(out).count() == 80


def test_crash_resume_reprocesses_only_incomplete(spark, dirs):
    out, ckpt_path = dirs
    docs = docs_dataframe(spark, 80, seed=5)
    run_extraction(spark, docs, out, ckpt_path, num_partitions=N_PARTS)
    full = {
        (r["doc_id"]): [tuple(s) for s in r["spans"]]
        for r in spark.read.parquet(out).collect()
    }

    # simulate a crashed run: drop the COMPLETED rows of partitions 2 and 5
    # (the claim rows survive, as they would after a real mid-run crash)
    ckpt = CheckpointTable(spark, ckpt_path)
    kept = ckpt.read().filter(
        ~(F.col("partition_id").isin([2, 5]) & (F.col("status") == "completed"))
    )
    rows = kept.collect()
    shutil.rmtree(ckpt_path)
    ckpt.append([r.asDict() for r in rows])

    s = run_extraction(spark, docs, out, ckpt_path, num_partitions=N_PARTS)
    assert s["partitions_processed"] == 2
    assert s["partitions_skipped"] == N_PARTS - 2

    resumed = {
        (r["doc_id"]): [tuple(s) for s in r["spans"]]
        for r in spark.read.parquet(out).collect()
    }
    assert resumed == full  # byte-identical output after resume

    # attempts incremented for the reprocessed partitions
    att = ckpt.attempts_so_far()
    assert att[2] == 2 and att[5] == 2
    assert att[0] == 1


def test_lineage_metrics(spark, dirs):
    out, ckpt_path = dirs
    docs = docs_dataframe(spark, 60, seed=11)
    run_extraction(spark, docs, out, ckpt_path, num_partitions=4)
    ckpt = CheckpointTable(spark, ckpt_path)
    stats = {r["status"]: r for r in ckpt.stats().collect()}
    assert stats["completed"]["n"] == 4
    assert stats["completed"]["docs_processed"] == 60
