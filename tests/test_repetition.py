"""Gopher/MassiveText repetition filters (rules C.2)."""

import pytest

from readur_spark.operators.repetition import THRESHOLDS, repetition_metrics


@pytest.fixture(scope="module")
def metrics(spark):
    rows = [
        (
            "clean",
            "first line here\nsecond line there\nthird distinct line\n\n"
            "new paragraph talks about other things entirely",
        ),
        ("dupl", "same line\nsame line\nsame line\nunique one"),
        ("stuffed", "buy cheap buy cheap buy cheap buy cheap buy cheap"),
        ("paras", "alpha block\n\nalpha block\n\nalpha block\n\nbeta block"),
        ("empty", ""),
    ]
    df = spark.createDataFrame(rows, "doc_id string, text string")
    return {r["doc_id"]: r for r in repetition_metrics(df).collect()}


def test_clean_doc_passes(metrics):
    r = metrics["clean"]
    assert r["rep_pass"] is True
    assert r["dup_line_frac"] == 0.0
    # single-occurrence n-grams are NOT repetition
    assert r["top3_char_frac"] == 0.0


def test_duplicate_lines_flagged(metrics):
    r = metrics["dupl"]
    assert r["dup_line_frac"] == pytest.approx(0.75)  # 3 of 4 lines duplicated
    assert r["dup_line_char_frac"] == pytest.approx(27 / 37, abs=1e-5)
    assert r["rep_pass"] is False


def test_ngram_stuffing_flagged_and_clamped(metrics):
    r = metrics["stuffed"]
    assert r["top2_char_frac"] > THRESHOLDS["top2_char_frac"]
    # overlapping occurrences nominally cover >100% — must clamp at 1
    assert r["top4_char_frac"] <= 1.0
    assert r["rep_pass"] is False


def test_duplicate_paragraphs_flagged(metrics):
    r = metrics["paras"]
    assert r["dup_para_frac"] == pytest.approx(0.75)
    assert r["rep_pass"] is False


def test_empty_doc_passes_with_zeros(metrics):
    r = metrics["empty"]
    assert r["rep_pass"] is True
    assert all(
        r[c] == 0.0
        for c in (
            "dup_line_frac",
            "dup_para_frac",
            "top2_char_frac",
            "top3_char_frac",
            "top4_char_frac",
        )
    )


def test_mega_document_linear(spark):
    """Regression: the n-gram builders must stay LINEAR on mega documents.
    The former array-HOF formulation re-evaluated the tokenization per
    gram (no CSE in interpreted lambdas) and a ~100k-token doc effectively
    hung. Budget: well under a minute for 100k tokens, here asserted
    loosely to stay host-noise-proof."""
    import time

    from readur_spark.operators.dedup import minhash_signatures, ngram_jaccard_pairs

    mega = " ".join(f"tok{i % 9973} w{i % 331}" for i in range(50_000))  # 100k tokens
    docs = spark.createDataFrame(
        [(1, mega), (2, "small doc body"), (3, mega[: len(mega) // 2])],
        "doc_id long, text string",
    )
    t0 = time.time()
    n = repetition_metrics(docs).count()
    rep_s = time.time() - t0
    t0 = time.time()
    m = minhash_signatures(docs, num_hashes=16, n=3).count()
    mh_s = time.time() - t0
    t0 = time.time()
    p = ngram_jaccard_pairs(docs, threshold=0.3, n=3).count()
    ng_s = time.time() - t0
    assert n == 3 and m == 3
    assert p >= 1  # doc 3 is a prefix of doc 1
    assert rep_s < 60 and mh_s < 60 and ng_s < 90, (rep_s, mh_s, ng_s)
