"""End-to-end curation funnel: stage monotonicity, dedup efficacy,
deterministic output, both input shapes."""

import pytest
from pyspark.sql import functions as F

from readur_spark.plans.curation import curate, curate_to_parquet

SF = "/root/testdata/sf0.001"
STOPS = ("the", "a", "table", "value", "row", "key")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


def test_funnel_monotone_and_deduped(spark, docs):
    chunks, m = curate(
        docs, require_gopher=True, gopher_stopwords=STOPS, chunk_words=40,
        overlap_words=8,
    )
    assert m["input_docs"] >= m["after_quality_filter"] >= m["after_exact_dedup"]
    assert m["after_exact_dedup"] >= m["after_near_dedup"] > 0
    assert m["chunks"] >= m["after_near_dedup"]  # every survivor chunks
    # near-dup pass must actually remove the planted near-duplicates
    assert m["after_near_dedup"] < m["after_exact_dedup"]
    got = chunks.select("doc_id", "chunk_no", "chunk_text", "lang", "quality")
    assert got.filter(F.col("chunk_text") == "").count() == 0


def test_interleaved_input_shape(spark):
    from readur_spark.sources.tables import interleaved_docs

    inter = interleaved_docs(spark, SF, with_html=False)
    chunks, m = curate(
        inter, require_gopher=False, chunk_words=40, overlap_words=8
    )
    assert m["input_docs"] > 0 and m["chunks"] > 0


def test_curate_deterministic(spark, docs):
    a = curate(docs, require_gopher=True, gopher_stopwords=STOPS)[1]
    b = curate(docs, require_gopher=True, gopher_stopwords=STOPS)[1]
    assert a == b


def test_curate_to_parquet_partitioned_by_lang(spark, docs, tmp_path):
    out = str(tmp_path / "chunks")
    m = curate_to_parquet(
        spark, docs, out, require_gopher=False, chunk_words=40, overlap_words=8
    )
    back = spark.read.parquet(out)
    assert back.count() == m["chunks"]
    # partition pruning on lang reaches the scan
    plan = (
        back.filter(F.col("lang") == "en")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters")[1][:200]
