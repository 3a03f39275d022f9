"""Quality gates and failure classification (reference parity).

* ``validate_ocr_quality``        — src/ocr/enhanced.rs:1770-1828 (W3)
* ``pdf_text_quality_sufficient`` — src/ocr/enhanced.rs:1027-1082 (P3)
* ``classify_ocr_error``          — src/ocr/queue.rs:1282-1304 (W4)

Failure-reason strings follow the reference enum
(src/models/document.rs:51-87).
"""

from __future__ import annotations

from readur_spark.kernels.util import count_alnum

HARD_MINIMUM_CONFIDENCE = 5.0  # enhanced.rs:1776
MIN_CONTENT_RATIO = 0.10  # enhanced.rs:1812
DEFAULT_MIN_CONFIDENCE = 30.0  # src/models/settings.rs:351 (warn-only)

PDF_MIN_ALNUM_RATIO = 0.30  # enhanced.rs:1050
PDF_SMALL_FILE_BYTES = 50_000  # enhanced.rs:1056
PDF_MIN_WORD_DENSITY = 5.0  # words/KB, enhanced.rs:1068
PDF_MIN_WORDS_LARGE = 10  # enhanced.rs:1069
PDF_SUBSTANTIAL_WORDS = 50  # enhanced.rs:1070


def validate_ocr_quality(text: str, confidence: float, word_count: int) -> str | None:
    """Document-level acceptance gate (src/ocr/enhanced.rs:1770-1828).

    Returns ``None`` when acceptable, else an error message (classifiable by
    :func:`classify_ocr_error`). Check order matters and matches the
    reference: hard confidence → empty text → zero words → content ratio.

    ``content_ratio`` is alphanumeric *chars* over UTF-8 *byte* length —
    the reference divides a char count by ``str::len()``; reproduced as-is.
    """
    if confidence < HARD_MINIMUM_CONFIDENCE:
        return (
            f"OCR confidence critically low: {confidence:.1f}% "
            f"(absolute minimum: {HARD_MINIMUM_CONFIDENCE:.1f}%) - likely corrupted input"
        )
    total_bytes = len(text.encode("utf-8", errors="surrogatepass"))
    if total_bytes == 0:
        return "OCR result contains no characters"
    if word_count == 0:
        return "No words detected in OCR output"
    content_chars = count_alnum(text)
    content_ratio = content_chars / total_bytes
    if content_ratio < MIN_CONTENT_RATIO:
        return (
            f"OCR result has too little meaningful content: "
            f"{content_ratio * 100.0:.1f}% content (letters+digits)"
        )
    return None


def pdf_text_quality_sufficient(text: str, word_count: int, file_size: int) -> bool:
    """Text-layer sufficiency gate deciding extract-vs-OCR for PDFs
    (src/ocr/enhanced.rs:1027-1082)."""
    if word_count == 0:
        return False
    total_bytes = len(text.encode("utf-8", errors="surrogatepass"))
    alnum = count_alnum(text)
    ratio = (alnum / total_bytes) if total_bytes else 0.0
    if ratio < PDF_MIN_ALNUM_RATIO:
        return False
    if file_size < PDF_SMALL_FILE_BYTES and word_count >= 1:
        return True
    if word_count >= PDF_SUBSTANTIAL_WORDS:
        return True
    density = word_count / (file_size / 1024.0) if file_size else 0.0
    if density < PDF_MIN_WORD_DENSITY and word_count < PDF_MIN_WORDS_LARGE:
        return False
    return True


def classify_ocr_error(error_str: str) -> tuple[str, bool]:
    """Substring → (failure_reason, suppress_noise) mapping
    (src/ocr/queue.rs:1282-1304). First match wins, in reference order."""
    if "font encoding" in error_str or "missing unicode map" in error_str:
        return ("pdf_parsing_error", True)
    if "corrupted internal structure" in error_str or "corrupted" in error_str:
        return ("file_corrupted", True)
    if "timeout" in error_str or "timed out" in error_str:
        return ("ocr_timeout", False)
    if "memory" in error_str or "out of memory" in error_str:
        return ("ocr_memory_limit", False)
    if "panic" in error_str:
        return ("pdf_parsing_error", True)
    if "unsupported" in error_str:
        return ("unsupported_format", False)
    if "too large" in error_str or "file size" in error_str:
        return ("file_too_large", False)
    if "No extractable text" in error_str or "0 words" in error_str:
        return ("low_ocr_confidence", False)
    if "validation" in error_str or "document may have been modified" in error_str:
        return ("other", False)
    return ("other", False)
