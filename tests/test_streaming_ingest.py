"""Continuous ingest with history dedup: watcher → extract →
dedup-vs-committed → idempotent batch-partitioned commit."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from readur_spark.corpus import DOCS_SCHEMA, generate_docs
from readur_spark.streaming.ingest import ingest_with_history_dedup


@pytest.fixture()
def dirs():
    d = tempfile.mkdtemp(prefix="readur_ingest_")
    yield (f"{d}/in", f"{d}/corpus", f"{d}/history", f"{d}/ckpt")
    shutil.rmtree(d, ignore_errors=True)


def _drop(spark, in_dir, docs):
    spark.createDataFrame(docs, DOCS_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(in_dir)


def _run(spark, dirs):
    in_dir, corpus, history, ckpt = dirs
    q = ingest_with_history_dedup(spark, in_dir, corpus, history, ckpt)
    q.awaitTermination(180)


def test_second_sync_drops_already_committed_content(spark, dirs):
    in_dir, corpus, history, _ = dirs
    batch1 = generate_docs(20, seed=5)
    _drop(spark, in_dir, batch1)
    _run(spark, dirs)
    first = spark.read.parquet(corpus)
    n1 = first.count()
    assert 0 < n1 <= 20  # completed extractions, in-batch dups collapsed

    # second drop: 10 docs with BYTE-IDENTICAL content to batch 1 (same
    # seed, shifted ids) + 15 genuinely new docs
    dupes = [
        {**d, "doc_id": d["doc_id"] + "-dup"} for d in generate_docs(10, seed=5)
    ]
    fresh = generate_docs(15, seed=77)
    _drop(spark, in_dir, dupes + fresh)
    _run(spark, dirs)
    after = spark.read.parquet(corpus)
    # none of the duplicate-content docs survive; the id namespace shows it
    assert after.filter(F.col("doc_id").endswith("-dup")).count() == 0
    n2 = after.count()
    assert n1 < n2 <= n1 + 15

    # history holds one fingerprint row per committed doc
    hist = spark.read.parquet(history)
    assert hist.select("fingerprint").distinct().count() == n2


def test_batch_partitioned_commit_is_idempotent(spark, dirs):
    """Replaying a batch id must reproduce the identical survivor set and
    overwrite the same partition — the crash-replay contract."""
    in_dir, corpus, history, _ = dirs
    _drop(spark, in_dir, generate_docs(12, seed=9))
    _run(spark, dirs)
    before = sorted(
        r["doc_id"] for r in spark.read.parquet(corpus).collect()
    )

    # simulate the replay: re-run commit logic for batch 0 by hand
    from readur_spark.streaming.ingest import _text_of
    from readur_spark.functions.textstats import fingerprint_col
    from readur_spark.operators.dedup import dedup_against_history
    from readur_spark.operators.extract import extract_spans

    batch_df = spark.createDataFrame(generate_docs(12, seed=9), DOCS_SCHEMA)
    texts = _text_of(extract_spans(batch_df))
    hist = spark.read.parquet(history).filter(F.col("batch_id") < 0)
    fresh = dedup_against_history(texts, hist)
    fresh.select(
        fingerprint_col(F.col("text")).alias("fingerprint")
    ).write.mode("overwrite").parquet(f"{history}/batch_id=0")
    fresh.write.mode("overwrite").parquet(f"{corpus}/batch_id=0")

    after = sorted(r["doc_id"] for r in spark.read.parquet(corpus).collect())
    assert after == before  # identical survivors, no duplication, no loss


def test_history_read_failure_propagates_not_swallowed(spark, dirs):
    """Only a legitimately-missing history table may fall back to empty
    history; any other read failure (corrupt footer here) must fail the
    batch so it retries — swallowing it would silently disable
    dedup-against-committed and commit duplicates."""
    import os

    in_dir, corpus, history, ckpt = dirs
    _drop(spark, in_dir, generate_docs(5, seed=9))
    os.makedirs(history, exist_ok=True)
    with open(f"{history}/batch_id=0", "w") as f:
        f.write("not a parquet partition")
    from pyspark.errors import StreamingQueryException

    q = ingest_with_history_dedup(spark, in_dir, corpus, history, ckpt)
    with pytest.raises(StreamingQueryException):
        q.awaitTermination(180)


def test_empty_history_dir_recovers_instead_of_wedging(spark, dirs):
    """A crash during the first batch's history write can leave the
    history directory existing but holding no readable parquet; the
    replayed batch must fall back to empty history and make progress,
    not fail on 'unable to infer schema' forever (review finding)."""
    import os

    in_dir, corpus, history, _ = dirs
    os.makedirs(f"{history}/batch_id=0/_temporary", exist_ok=True)
    _drop(spark, in_dir, generate_docs(8, seed=9))
    _run(spark, dirs)
    assert spark.read.parquet(corpus).count() > 0
    assert spark.read.parquet(history).count() > 0


def test_history_missing_batch_id_column_fails_loudly(spark, dirs):
    """A history dir holding READABLE parquet whose schema lacks
    batch_id is corruption, not a fresh start: the batch_id filter
    raising at analysis time must propagate, not be swallowed into the
    empty-history fallback (which would silently disable
    dedup-against-committed — advisor finding, r6)."""
    import os

    in_dir, corpus, history, ckpt = dirs
    _drop(spark, in_dir, generate_docs(5, seed=11))
    os.makedirs(history, exist_ok=True)
    spark.createDataFrame(
        [("deadbeef",)], "fingerprint string"
    ).write.mode("overwrite").parquet(history)
    from pyspark.errors import StreamingQueryException

    q = ingest_with_history_dedup(spark, in_dir, corpus, history, ckpt)
    with pytest.raises(StreamingQueryException):
        q.awaitTermination(180)
