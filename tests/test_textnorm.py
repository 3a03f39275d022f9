"""Golden tests for the normalization kernels.

Expectations mirror the reference behavior at
/root/reference/src/ocr/xml_extractor.rs:1169-1197 (clean_extracted_text),
:500-516 (remove_null_bytes) and src/ocr/enhanced.rs:1637-1679 (plain text).
"""

from readur_spark.kernels.textnorm import (
    MAX_TEXT_CONTENT_SIZE,
    TEXT_TRUNCATION_SUFFIX,
    clean_extracted_text,
    plain_text_read,
    remove_null_bytes,
    repair_hyphenation,
)


class TestCleanExtractedText:
    def test_camelcase_boundary(self):
        # xml_extractor.rs:1181-1186 — "ExecutiveSummary" → "Executive Summary"
        assert clean_extracted_text("ExecutiveSummary") == "Executive Summary"

    def test_camelcase_nonoverlapping(self):
        assert clean_extracted_text("aBcD") == "a Bc D"

    def test_three_plus_spaces(self):
        assert clean_extracted_text("a    b") == "a b"

    def test_three_plus_newlines(self):
        assert clean_extracted_text("a\n\n\n\nb") == "a\n\nb"

    def test_space_around_newlines(self):
        assert clean_extracted_text("a   \n  b") == "a\nb"

    def test_tabs_to_space(self):
        assert clean_extracted_text("a\t \tb") == "a b"

    def test_tab_before_newline_survives_as_space(self):
        # Pass-order artifact preserved from the reference: " +\n" runs
        # before "[ \t]+" so a tab-newline becomes " \n" (space survives).
        assert clean_extracted_text("a\t\nb") == "a \nb"

    def test_messy_fixture(self):
        # FIXTURES.md §3 "messy whitespace" class
        assert clean_extracted_text("A    B\n\n\n\nC   \n  D\t \tE") == "A B\n\nC\nD E"

    def test_trim(self):
        assert clean_extracted_text("  x  ") == "x"

    def test_empty(self):
        assert clean_extracted_text("") == ""


class TestRemoveNullBytes:
    def test_strip(self):
        assert remove_null_bytes("Test\0with\0null\0bytes") == "Testwithnullbytes"

    def test_noop(self):
        s = "clean text"
        assert remove_null_bytes(s) is s


class TestRepairHyphenation:
    def test_join(self):
        assert repair_hyphenation("extrac-\ntion pipeline") == "extraction pipeline"

    def test_preserves_real_hyphen(self):
        assert repair_hyphenation("state-of-the-art") == "state-of-the-art"

    def test_no_join_before_punct(self):
        assert repair_hyphenation("dash-\n— stays") == "dash-\n— stays"


class TestPlainTextRead:
    def test_simple_trim(self):
        content, err = plain_text_read("  hello world \n")
        assert err is None
        assert content == "hello world"

    def test_null_strip(self):
        content, err = plain_text_read("a\0b")
        assert err is None
        assert content == "ab"

    def test_truncation_marker(self):
        big = "x" * (MAX_TEXT_CONTENT_SIZE + 10)
        content, err = plain_text_read(big)
        assert err is None
        assert content.endswith(TEXT_TRUNCATION_SUFFIX)
        assert len(content) == MAX_TEXT_CONTENT_SIZE + len(TEXT_TRUNCATION_SUFFIX)

    def test_too_large_errors(self):
        big = "y" * (50 * 1024 * 1024 + 1)
        _, err = plain_text_read(big)
        assert err is not None and "too large" in err


def test_scrub_pii_redacts_each_kind(spark):
    from pyspark.sql import functions as F

    from readur_spark.functions.textstats import pii_counts_cols, scrub_pii_col

    text = (
        "write to jane.doe+spam@mail.example.co.uk from 192.168.1.200 "
        "or call +1 (555) 867-5309; order #123456 ships 2024-01-02"
    )
    df = spark.createDataFrame([(text,)], "text string")
    row = df.select(
        scrub_pii_col(F.col("text")).alias("s"), *pii_counts_cols(F.col("text"))
    ).collect()[0]
    assert "<EMAIL>" in row["s"] and "jane.doe" not in row["s"]
    assert "<IP>" in row["s"] and "192.168.1.200" not in row["s"]
    assert "<PHONE>" in row["s"] and "867-5309" not in row["s"]
    assert (row["n_emails"], row["n_ips"], row["n_phones"]) == (1, 1, 1)
    # non-PII digits survive: order id and ISO date untouched
    assert "#123456" in row["s"] and "2024-01-02" in row["s"]


def test_sentence_stats(spark):
    from pyspark.sql import functions as F

    from readur_spark.functions.textstats import (
        sentence_stats_cols,
        sentences_col,
    )

    rows = [
        (1, "First sentence. Second one is longer here! Third?  Tail without terminal"),
        (2, "No terminators at all just one run of words"),
        (3, 'He said "stop." Then (quietly.) left.'),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    sents = {
        r["doc_id"]: r["s"]
        for r in df.select(
            "doc_id", sentences_col(F.col("text")).alias("s")
        ).collect()
    }
    assert sents[1] == [
        "First sentence.",
        "Second one is longer here!",
        "Third?",
        "Tail without terminal",
    ]
    assert sents[2] == ["No terminators at all just one run of words"]
    got = {
        r["doc_id"]: r
        for r in df.select(
            "doc_id", *sentence_stats_cols(F.col("text"))
        ).collect()
    }
    assert got[1]["n_sentences"] == 4
    assert got[1]["max_sentence_words"] == 5
    assert got[1]["terminal_punct_ratio"] == 0.75
    assert got[2]["n_sentences"] == 1
    assert got[2]["terminal_punct_ratio"] == 0.0
    # terminator inside closing quote/paren still counts as terminal
    assert got[3]["n_sentences"] == 3
    assert got[3]["terminal_punct_ratio"] == 1.0
