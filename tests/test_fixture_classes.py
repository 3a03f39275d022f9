"""FIXTURES.md §3/§4 content classes — explicit golden expectations for
every class the corpus generator draws from (the span-equality contract,
class by class)."""

from readur_spark.kernels.extractor import extract_document
from readur_spark.kernels.textnorm import MAX_TEXT_CONTENT_SIZE, TEXT_TRUNCATION_SUFFIX


def text_doc(s):
    return [{"kind": "text", "text": s, "media_ref": "", "offset": 0}]


def one_span_text(res):
    assert res["status"] == "completed", res["failure_reason"]
    assert len(res["spans"]) == 1
    return res["spans"][0]["text"]


class TestTextClasses:
    def test_normal_prose(self):
        res = extract_document(text_doc("Hello world this is a test document with normal spacing"))
        assert one_span_text(res) == "Hello world this is a test document with normal spacing"
        assert res["word_count"] == 10

    def test_continuous_text(self):
        res = extract_document(text_doc("SOCLogixNDAConfidentialityAgreement"))
        # camelCase boundary splitting applies: SOC Logix NDAConfidentiality...
        # x→N and y→A boundaries get spaces
        assert one_span_text(res) == "SOCLogix NDAConfidentiality Agreement"
        assert res["word_count"] == 3

    def test_mixed_alphanumeric(self):
        res = extract_document(text_doc("ABC123DEF456"))
        assert one_span_text(res) == "ABC123DEF456"
        assert res["word_count"] == 1  # 12 bytes ≤ 15: not continuous

    def test_all_caps(self):
        res = extract_document(text_doc("THISISALLCAPSTEXT"))
        assert one_span_text(res) == "THISISALLCAPSTEXT"
        assert res["word_count"] == 3  # 17 alnum // 5

    def test_dot_separated(self):
        res = extract_document(text_doc("Text.With.Dots.Between"))
        assert one_span_text(res) == "Text.With.Dots.Between"
        assert res["word_count"] == 3  # continuous path, 19 alnum // 5

    def test_punctuation_only_fails_gate(self):
        res = extract_document(text_doc("!@#$%^&*()_+-=[]{}|;':\",./<>?"))
        assert res["status"] == "failed"
        assert res["failure_reason"] == "low_ocr_confidence"

    def test_empty_whitespace(self):
        res = extract_document(text_doc("   \n\t  "))
        assert res["status"] == "failed"
        assert res["failure_reason"] == "low_ocr_confidence"

    def test_null_bytes(self):
        res = extract_document(text_doc("Test\0with\0null\0bytes"))
        assert "\0" not in one_span_text(res)

    def test_messy_whitespace(self):
        res = extract_document(text_doc("A    B\n\n\n\nC   \n  D\t \tE"))
        assert one_span_text(res) == "A B\n\nC\nD E"

    def test_camelcase_concatenation(self):
        res = extract_document(text_doc("ExecutiveSummary"))
        assert one_span_text(res) == "Executive Summary"

    def test_hyphenated_linebreak(self):
        res = extract_document(text_doc("extrac-\ntion pipeline"))
        assert one_span_text(res) == "extraction pipeline"
        res_off = extract_document(text_doc("extrac-\ntion pipeline"), repair_hyphens=False)
        assert one_span_text(res_off) == "extrac-\ntion pipeline"

    def test_oversized_text_truncated(self):
        body = ("word " * 8)  # keeps alnum ratio fine
        big = body * ((MAX_TEXT_CONTENT_SIZE // len(body)) + 10)
        res = extract_document(text_doc(big))
        assert res["status"] == "completed"
        assert res["spans"][0]["text"].endswith(TEXT_TRUNCATION_SUFFIX)

    def test_large_for_sampling_word_count(self):
        # >1 MB combined text → office 3-sample extrapolation, capped 10M
        big = "alpha beta gamma " * 70_000  # ~1.2 MB
        res = extract_document(text_doc(big))
        assert res["status"] == "completed"
        true_count = 210_000
        assert abs(res["word_count"] - true_count) / true_count < 0.01

    def test_multilingual(self):
        res = extract_document(
            text_doc("el rapido zorro marron salta sobre un perro perezoso")
        )
        assert res["word_count"] == 9

    def test_unicode_edges(self):
        res = extract_document(text_doc("naïve café résumé — σπαν ordering 测试"))
        assert res["status"] == "completed"
        assert "naïve" in res["spans"][0]["text"]


class TestHtmlClasses:
    def html_doc(self, s):
        return [{"kind": "html", "text": s, "media_ref": "", "offset": 0}]

    def test_article_page(self):
        html = (
            "<html><body><nav><a href='/'>home link here</a></nav>"
            "<article><p>Real article content paragraph long enough to keep "
            "for sure today.</p></article>"
            "<footer><a href='/c'>contact link text</a></footer></body></html>"
        )
        res = extract_document(self.html_doc(html))
        assert [s["kind"] for s in res["spans"]] == ["text"]
        assert res["spans"][0]["text"].startswith("Real article content")

    def test_trivial_page(self):
        res = extract_document(
            self.html_doc("<html><body><p>only text but long enough to pass here</p></body></html>")
        )
        assert len(res["spans"]) == 1

    def test_inline_media_order(self):
        html = (
            "<body><article>"
            "<p>Leading paragraph long enough to be kept by the classifier.</p>"
            "<img src='ref-1'>"
            "<p>Trailing paragraph long enough to be kept by the classifier.</p>"
            "</article></body>"
        )
        res = extract_document(self.html_doc(html))
        assert [(s["kind"], s["order"]) for s in res["spans"]] == [
            ("text", 0),
            ("media", 1),
            ("text", 2),
        ]
        assert res["spans"][1]["media_ref"] == "ref-1"
