"""P6 page rendering + P7 per-page OCR assembly with the pluggable engine
(enhanced.rs:1402-1508 semantics)."""

import numpy as np
import pytest

from readur_spark.kernels.minipdf import (
    build_pdf,
    pdf_media_boxes,
    render_pdf_pages,
)
from readur_spark.kernels.ocr_engine import FakeOcrEngine, OcrEngineError
from readur_spark.kernels.pdfextract import PAGE_BREAK, extract_pdf_with_engine
from readur_spark.kernels.pixels import OcrSettings

THREE_PAGES = build_pdf(
    [
        [(72.0, 720.0, "first page text line"), (72.0, 700.0, "second line")],
        [(72.0, 720.0, "middle page content")],
        [(72.0, 720.0, "final page words")],
    ]
)


# --------------------------------------------------------------------------
# P6: rendering
# --------------------------------------------------------------------------


def test_media_boxes_default_letter():
    assert pdf_media_boxes(THREE_PAGES) == [(612.0, 792.0)] * 3


def test_render_page_count_and_dims():
    pages = render_pdf_pages(THREE_PAGES, dpi=72)
    assert len(pages) == 3
    for img in pages:
        assert img.shape == (792, 612)
        assert img.dtype == np.uint8


def test_render_dpi_scales_raster():
    (img,) = render_pdf_pages(build_pdf([[(10.0, 700.0, "x")]]), dpi=144)
    assert img.shape == (1584, 1224)  # 2x 72-dpi dims


def test_render_ink_at_run_positions():
    pages = render_pdf_pages(THREE_PAGES, dpi=72)
    img = pages[0]
    # PDF y-up: run at x=72, y=720 -> raster baseline row 792-720=72,
    # ink rows 60..72, cols from 72
    assert img[66, 80] == 0
    assert img[66, 30] == 255  # left margin blank
    assert img[400, 300] == 255  # middle of page blank
    # second line at y=700 -> rows 80..92 also inked
    assert img[86, 80] == 0
    # page 2 has only one run (no second line)
    assert render_pdf_pages(THREE_PAGES, dpi=72)[1][86, 80] == 255


def test_render_empty_page_blank():
    (img,) = render_pdf_pages(build_pdf([[]]), dpi=72)
    assert img.min() == 255


# --------------------------------------------------------------------------
# P7: per-page OCR assembly
# --------------------------------------------------------------------------


class PageCountingEngine(FakeOcrEngine):
    """Engine returning fixed text/confidence per call, recording calls."""

    def __init__(self, text="page words here", conf=88.0, fail_calls=()):
        super().__init__()
        self.text, self.conf = text, conf
        self.fail_calls = set(fail_calls)
        self.calls = 0

    def recognize(self, img, lang, psm="auto", oem="default"):
        self.calls += 1
        if self.calls in self.fail_calls:
            raise OcrEngineError("synthetic page failure", recoverable=False)
        return self.text, self.conf


def _settings():
    # skip enhancement so each page OCRs once (no preprocessing variance)
    return OcrSettings(ocr_skip_enhancement=True, ocr_detect_orientation=False)


def test_pdf_ocr_assembles_with_page_breaks():
    eng = PageCountingEngine(conf=90.0)
    res = extract_pdf_with_engine(THREE_PAGES, eng, settings=_settings(), render_dpi=36)
    assert res["error"] is None
    # text-layer path loses to OCR? No: this PDF has no images and a good
    # text layer -> fast path wins at 95.0
    assert res["preprocessing"] == ["PDF text extraction (text-layer)"]
    assert eng.calls == 0


def test_pdf_with_images_goes_through_page_ocr():
    pdf = build_pdf(
        [[(72.0, 720.0, "alpha")], [(72.0, 720.0, "beta")]], with_image=True
    )
    eng = PageCountingEngine(text="ocr words from page", conf=80.0)
    res = extract_pdf_with_engine(pdf, eng, settings=_settings(), render_dpi=36)
    assert res["error"] is None
    assert eng.calls == 2
    assert res["text"].count(PAGE_BREAK.strip()) == 1  # between 2 pages
    assert res["confidence"] == pytest.approx(80.0)
    assert res["preprocessing"] == ["PDF page-to-image OCR (2 pages)"]


def test_failed_page_skipped_and_mean_confidence():
    pdf = build_pdf(
        [[(72.0, 720.0, "a")], [(72.0, 720.0, "b")], [(72.0, 720.0, "c")]],
        with_image=True,
    )

    class VaryingEngine(PageCountingEngine):
        def recognize(self, img, lang, psm="auto", oem="default"):
            self.calls += 1
            if self.calls == 2:
                raise OcrEngineError("synthetic page failure", recoverable=False)
            return "page text ok", 70.0 if self.calls == 1 else 90.0

    eng = VaryingEngine()
    res = extract_pdf_with_engine(pdf, eng, settings=_settings(), render_dpi=36)
    assert res["error"] is None
    assert res["confidence"] == pytest.approx(80.0)  # mean of 70 and 90
    assert res["preprocessing"] == ["PDF page-to-image OCR (2 pages)"]
    assert res["text"].count(PAGE_BREAK.strip()) == 1


def test_all_pages_fail_falls_back_to_text_layer_gate():
    pdf = build_pdf([[(72.0, 720.0, "tiny")]], with_image=True)
    eng = PageCountingEngine(fail_calls={1, 2, 3})
    res = extract_pdf_with_engine(pdf, eng, settings=_settings(), render_dpi=36)
    # OCR produced nothing; text layer 'tiny' has <= 5 words -> salvage or
    # error; either way not a silent success at OCR confidence
    assert res["preprocessing"] != ["PDF page-to-image OCR (1 pages)"]


def test_oversize_pdf_guarded():
    res = extract_pdf_with_engine(b"%PDF-1.4" + b"0" * 100, FakeOcrEngine(), max_pdf_size=50)
    assert res["error"] is not None and "too large" in res["error"]
