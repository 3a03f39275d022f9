"""Streaming watch-folder ingest: backlog catch-up + incremental pickup."""

import shutil
import tempfile

import pytest

from readur_spark.corpus import DOCS_SCHEMA, generate_docs
from readur_spark.streaming.watch import watch_and_extract


@pytest.fixture()
def dirs():
    d = tempfile.mkdtemp(prefix="readur_stream_")
    yield f"{d}/in", f"{d}/out", f"{d}/ckpt"
    shutil.rmtree(d, ignore_errors=True)


def _drop(spark, in_dir, docs):
    spark.createDataFrame(docs, DOCS_SCHEMA).coalesce(1).write.mode("append").parquet(in_dir)


def test_available_now_catchup_and_resume(spark, dirs):
    in_dir, out_dir, ckpt = dirs
    _drop(spark, in_dir, generate_docs(30, seed=1))

    q = watch_and_extract(spark, in_dir, out_dir, ckpt, available_now=True)
    q.awaitTermination(120)
    first = spark.read.parquet(out_dir)
    assert first.count() == 30
    assert set(first.columns) >= {"doc_id", "spans", "status", "word_count"}

    # new files arrive while no query runs; restart processes ONLY the delta
    _drop(spark, in_dir, generate_docs(12, seed=2))
    q2 = watch_and_extract(spark, in_dir, out_dir, ckpt, available_now=True)
    q2.awaitTermination(120)
    after = spark.read.parquet(out_dir)
    assert after.count() == 42  # 30 + 12, no reprocessing duplicates
