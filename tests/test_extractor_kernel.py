"""Document-level extraction kernel tests (span-sequence golden cases)."""

from readur_spark.kernels.extractor import extract_document


def span(kind, text="", media_ref="", offset=0):
    return {"kind": kind, "text": text, "media_ref": media_ref, "offset": offset}


class TestTextSpans:
    def test_simple_text(self):
        res = extract_document([span("text", "Hello world this is fine")])
        assert res["status"] == "completed"
        assert res["spans"] == [
            {"kind": "text", "text": "Hello world this is fine", "media_ref": "", "order": 0}
        ]
        assert res["word_count"] == 5
        assert res["confidence"] == 100.0

    def test_null_bytes_removed(self):
        res = extract_document([span("text", "Test\0with\0null\0bytes")])
        assert "\0" not in res["spans"][0]["text"]

    def test_messy_whitespace_normalized(self):
        res = extract_document([span("text", "A    B\n\n\n\nC   \n  D\t \tE")])
        assert res["spans"][0]["text"] == "A B\n\nC\nD E"

    def test_hyphenation_repair_flag(self):
        src = [span("text", "extrac-\ntion pipeline")]
        on = extract_document(src, repair_hyphens=True)
        off = extract_document(src, repair_hyphens=False)
        assert on["spans"][0]["text"] == "extraction pipeline"
        assert off["spans"][0]["text"] == "extrac-\ntion pipeline"

    def test_punctuation_only_fails_gate(self):
        res = extract_document([span("text", "!@#$%^&*()_+-=[]{}|;':\",./<>?")])
        assert res["status"] == "failed"
        assert res["failure_reason"] == "low_ocr_confidence"
        assert res["spans"] == []

    def test_empty_whitespace_fails(self):
        res = extract_document([span("text", "   \n\t  ")])
        assert res["status"] == "failed"
        assert res["failure_reason"] == "low_ocr_confidence"

    def test_oversized_text_classified_too_large(self):
        res = extract_document([span("text", "y" * (50 * 1024 * 1024 + 1))])
        assert res["status"] == "failed"
        assert res["failure_reason"] == "file_too_large"


class TestOrdering:
    def test_offset_order_not_input_order(self):
        res = extract_document(
            [
                span("text", "second span content here ok", offset=1),
                span("text", "first span content here yes", offset=0),
            ]
        )
        assert [s["text"] for s in res["spans"]] == [
            "first span content here yes",
            "second span content here ok",
        ]
        assert [s["order"] for s in res["spans"]] == [0, 1]

    def test_media_interleaved(self):
        res = extract_document(
            [
                span("text", "alpha text block", offset=0),
                span("media", media_ref="m://1", offset=1),
                span("text", "omega text block", offset=2),
            ]
        )
        assert [(s["kind"], s["order"]) for s in res["spans"]] == [
            ("text", 0),
            ("media", 1),
            ("text", 2),
        ]

    def test_orders_gap_free_after_filtering(self):
        res = extract_document(
            [
                span("text", "good text span number one", offset=0),
                span("text", "!!!", offset=1),  # gated out
                span("media", media_ref="m://2", offset=2),
            ]
        )
        assert [s["order"] for s in res["spans"]] == [0, 1]


class TestHtmlSpans:
    def test_html_emits_interleaved(self):
        html = (
            "<body><article><p>Long enough leading paragraph for the "
            "classifier to keep today.</p>"
            '<img src="m://pic"><p>Long enough trailing paragraph for the '
            "classifier to keep too.</p></article></body>"
        )
        res = extract_document([span("html", html)])
        assert [s["kind"] for s in res["spans"]] == ["text", "media", "text"]
        assert res["status"] == "completed"

    def test_boilerplate_only_html_fails(self):
        html = "<body><nav><a href='/'>home link text</a></nav></body>"
        res = extract_document([span("html", html)])
        assert res["status"] == "failed"
        assert res["failure_reason"] == "low_ocr_confidence"


class TestMediaOnly:
    def test_media_only_completed(self):
        res = extract_document([span("media", media_ref="m://only")])
        assert res["status"] == "completed"
        assert res["word_count"] == 0
        assert res["spans"][0]["media_ref"] == "m://only"

    def test_empty_doc_fails(self):
        res = extract_document([])
        assert res["status"] == "failed"

    def test_unsupported_kind_only_fails(self):
        res = extract_document([span("videoX", "x")])
        assert res["status"] == "failed"
        assert res["failure_reason"] == "unsupported_format"

    def test_unsupported_kind_alongside_text_ok(self):
        res = extract_document(
            [span("videoX", "x", offset=0), span("text", "real content here ok", offset=1)]
        )
        assert res["status"] == "completed"

    def test_failed_doc_keeps_media(self):
        res = extract_document(
            [
                span("text", "!!!", offset=0),
                span("media", media_ref="m://keep", offset=1),
            ]
        )
        assert res["status"] == "failed"
        assert [s["media_ref"] for s in res["spans"]] == ["m://keep"]
        assert res["spans"][0]["order"] == 0
