"""Quality-gate boundary matrix, mirroring
/root/reference/tests/integration_enhanced_ocr_tests.rs:293-863 and the gate
code at src/ocr/enhanced.rs:1770-1828 / :1027-1082."""

from readur_spark.kernels.quality import (
    classify_ocr_error,
    pdf_text_quality_sufficient,
    validate_ocr_quality,
)


class TestValidateOcrQuality:
    def test_accepts_normal(self):
        assert validate_ocr_quality("Hello world 123", 95.0, 3) is None

    def test_hard_confidence_floor(self):
        err = validate_ocr_quality("fine text", 4.9, 2)
        assert err and "critically low" in err

    def test_confidence_exactly_at_floor_passes(self):
        assert validate_ocr_quality("fine text", 5.0, 2) is None

    def test_low_confidence_above_floor_accepted(self):
        # below the user min (30) is warn-only in the reference
        assert validate_ocr_quality("fine text", 10.0, 2) is None

    def test_empty_text_checked_before_word_count(self):
        err = validate_ocr_quality("", 90.0, 0)
        assert err == "OCR result contains no characters"

    def test_zero_words(self):
        err = validate_ocr_quality("!!!", 90.0, 0)
        assert err == "No words detected in OCR output"

    def test_alnum_ratio_below_10_percent(self):
        # 1 alnum char out of 20 bytes = 5% < 10%
        err = validate_ocr_quality("a" + "!" * 19, 90.0, 1)
        assert err and "too little meaningful content" in err

    def test_alnum_ratio_exactly_10_percent_passes(self):
        assert validate_ocr_quality("ab" + "!" * 18, 90.0, 1) is None

    def test_numeric_documents_accepted(self):
        # digits count as content (bills/receipts), enhanced.rs:1806
        assert validate_ocr_quality("12345 67890", 80.0, 2) is None


class TestPdfQualityGate:
    def test_zero_words_insufficient(self):
        assert not pdf_text_quality_sufficient("", 0, 1000)

    def test_low_alnum_ratio_insufficient(self):
        text = "a!!!!!!!!!" * 10  # 10% alnum < 30%
        assert not pdf_text_quality_sufficient(text, 10, 1000)

    def test_small_file_single_word_ok(self):
        assert pdf_text_quality_sufficient("hello", 1, 10_000)

    def test_substantial_words_ok(self):
        text = "word " * 50
        assert pdf_text_quality_sufficient(text, 50, 10_000_000)

    def test_large_sparse_insufficient(self):
        # big file, few words, low density → image-based PDF
        assert not pdf_text_quality_sufficient("word word word", 3, 1_000_000)

    def test_density_above_threshold_ok(self):
        # 40 words in 50KB → insufficient density path not triggered via
        # small-file rule (file >= 50_000); density = 40/(51200/1024)=0.8 <5
        # and wc 40 >= 10 so rule doesn't reject → accepted
        assert pdf_text_quality_sufficient("w " * 40, 40, 51_200)


class TestClassifyOcrError:
    def test_mapping_order(self):
        assert classify_ocr_error("bad font encoding")[0] == "pdf_parsing_error"
        assert classify_ocr_error("file is corrupted")[0] == "file_corrupted"
        assert classify_ocr_error("operation timed out")[0] == "ocr_timeout"
        assert classify_ocr_error("out of memory")[0] == "ocr_memory_limit"
        assert classify_ocr_error("thread panic")[0] == "pdf_parsing_error"
        assert classify_ocr_error("unsupported format")[0] == "unsupported_format"
        assert classify_ocr_error("file too large")[0] == "file_too_large"
        assert classify_ocr_error("No extractable text found (0 words)")[0] == "low_ocr_confidence"
        assert classify_ocr_error("validation failed")[0] == "other"
        assert classify_ocr_error("???")[0] == "other"

    def test_corrupted_beats_timeout(self):
        # first-match-wins order from queue.rs:1282-1304
        assert classify_ocr_error("corrupted after timeout")[0] == "file_corrupted"


def test_search_ranked_ts_escapes_regex_metacharacters(spark):
    """User query terms are literals: 'c++' or '(test' must not throw a
    pattern-compile error, and '.' must not wildcard-match (round-3 fix —
    plainto_tsquery sanitizes its input the same way)."""
    from readur_spark.operators.search import search_ranked_ts

    rows = [
        ("d1", "we write c++ here and more c++ daily", 37),
        ("d2", "plain prose with no plus signs at all", 37),
        ("d3", "cxx is not a literal match for the query", 40),
    ]
    docs = spark.createDataFrame(rows, "doc_id string, text string, n_chars int")
    got = {r["doc_id"] for r in search_ranked_ts(docs, "c++").collect()}
    assert got == {"d1"}
    # '(test' would be an unclosed group without escaping
    rows2 = [("p1", "some (test material here", 24), ("p2", "no parens", 9)]
    docs2 = spark.createDataFrame(rows2, "doc_id string, text string, n_chars int")
    got2 = {r["doc_id"] for r in search_ranked_ts(docs2, "(test").collect()}
    assert got2 == {"p1"}


def test_gopher_stopwords_escaped(spark):
    """Caller-supplied stopwords with regex metacharacters must be treated
    literally, not compiled as patterns."""
    from pyspark.sql import functions as F

    from readur_spark.functions.textstats import gopher_flags_cols

    body = ("c++ and e.g. appear here " + "solid prose word " * 20).strip()
    df = spark.createDataFrame([("d1", body)], "doc_id string, text string")
    out = df.select(
        *gopher_flags_cols(F.col("text"), stopwords=("c++", "e.g."))
    ).collect()[0]
    assert out["ok_stopwords"] is True
