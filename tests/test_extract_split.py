"""Mega-doc span-split extraction: equality with the unsplit path."""

import pytest
from pyspark.sql import functions as F

from readur_spark.corpus import docs_dataframe
from readur_spark.operators.extract import extract_spans, extract_spans_split


def _key(rows):
    return {
        r["doc_id"]: (
            [tuple(s) for s in r["spans"]],
            r["status"],
            r["failure_reason"],
            r["word_count"],
        )
        for r in rows
    }


@pytest.mark.parametrize("threshold", [4, 64])
def test_split_path_equals_unsplit(spark, threshold):
    # corpus mixing normal docs and mega docs (forced above any threshold)
    docs = docs_dataframe(
        spark, 30, seed=31, mega_fraction=0.3, mega_span_range=(80, 120)
    )
    base = _key(extract_spans(docs, num_partitions=4).collect())
    split = _key(
        extract_spans_split(
            docs, num_partitions=4, split_threshold_spans=threshold
        ).collect()
    )
    assert split == base


def test_giant_single_doc_parallelizes(spark):
    """One 500-span doc: the split path produces > 1 span-level task input
    and still reassembles the exact sequence."""
    docs = docs_dataframe(spark, 1, seed=7, mega_fraction=1.0, mega_span_range=(500, 500))
    base = _key(extract_spans(docs).collect())
    split = _key(extract_spans_split(docs, num_partitions=8, split_threshold_spans=32).collect())
    assert split == base
    (doc,) = split.values()
    spans, status, _, _ = doc
    assert status == "completed"
    assert [s[3] for s in spans] == list(range(len(spans)))  # gap-free orders


def test_media_only_mega_doc(spark):
    rows = [
        {
            "doc_id": "m",
            "spans": [
                {"kind": "media", "text": "", "media_ref": f"m://{i}", "offset": i}
                for i in range(100)
            ],
        }
    ]
    from readur_spark.corpus import DOCS_SCHEMA

    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    out = extract_spans_split(docs, split_threshold_spans=10).collect()[0]
    assert out["status"] == "completed"
    assert len(out["spans"]) == 100
    assert [s["media_ref"] for s in out["spans"]] == [f"m://{i}" for i in range(100)]


def test_all_text_gated_mega_doc_fails(spark):
    from readur_spark.corpus import DOCS_SCHEMA

    rows = [
        {
            "doc_id": "junk",
            "spans": [
                {"kind": "text", "text": "!@#$%^&*()_+-=[]{}|;':\",./<>?", "media_ref": "", "offset": i}
                for i in range(40)
            ],
        }
    ]
    docs = spark.createDataFrame(rows, DOCS_SCHEMA)
    out = extract_spans_split(docs, split_threshold_spans=10).collect()[0]
    assert out["status"] == "failed"
    assert out["failure_reason"] == "low_ocr_confidence"
    assert out["spans"] == []
