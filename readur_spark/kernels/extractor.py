"""Per-document span extraction (the engine's core unit of work).

Takes one interleaved document — ``(doc_id, spans[])`` with spans of kind
``text`` / ``html`` / ``media`` — and produces readur's extraction unit
generalized to ordered spans (reference ``OcrResult``,
/root/reference/src/ocr/enhanced.rs:83-91):

* ``text`` spans  → plain-text pipeline: size guard + null strip
  (enhanced.rs:1637-1679) → optional hyphenation repair (north-rule
  extension) → whitespace/boundary normalization
  (xml_extractor.rs:1169-1197) → span-level content gate (the alnum <0.10
  rejection of enhanced.rs:1812, applied per span = the north rule's
  "confidence-gated span filtering").
* ``html`` spans  → main-content extraction (kernels.htmlmain) emitting
  interleaved text + media spans in DOM order; text blocks then pass the
  same normalization + gate.
* ``media`` spans → passed through (opaque ``media_ref``).

Document-level acceptance mirrors readur's empty-result handling
(src/ocr/queue.rs:541-579): a document whose text/html inputs yield no
surviving text span is ``failed`` with
``failure_reason='low_ocr_confidence'``; reasons for size/unsupported errors
come from the reference classifier (queue.rs:1282-1304). Word counts use the
office-variant safe counter over the combined text.

This function is pure Python with no Spark imports: the Spark operator calls
it from inside an Arrow-batched ``mapInPandas`` stage (one call per document,
many documents per Arrow batch — never per-row Spark serde), and unit tests
call it directly as the golden oracle.
"""

from __future__ import annotations

from readur_spark.kernels.htmlmain import extract_main_content
from readur_spark.kernels.quality import (
    MIN_CONTENT_RATIO,
    classify_ocr_error,
    validate_ocr_quality,
)
from readur_spark.kernels.util import count_alnum
from readur_spark.kernels.textnorm import (
    clean_extracted_text,
    plain_text_read,
    repair_hyphenation,
)
from readur_spark.kernels.wordcount import count_words_safely_office

PREP_PLAIN_TEXT = "Plain text read"
PREP_HTML_MAIN = "HTML main-content extraction"
PREP_HYPHEN = "Hyphenation repair"
PREP_MEDIA = "Media passthrough"

STATUS_COMPLETED = "completed"
STATUS_FAILED = "failed"


def _passes_span_gate(cleaned: str) -> bool:
    """Span-level content gate: non-empty and ≥10% alphanumeric
    (ratio = alnum chars / UTF-8 bytes, matching enhanced.rs:1806-1812)."""
    if not cleaned:
        return False
    total = len(cleaned.encode("utf-8", errors="surrogatepass"))
    alnum = count_alnum(cleaned)
    return (alnum / total) >= MIN_CONTENT_RATIO


def _normalize_text(text: str, repair_hyphens: bool) -> str:
    if repair_hyphens:
        text = repair_hyphenation(text)
    return clean_extracted_text(text)


def extract_document(spans: list[dict], repair_hyphens: bool = True) -> dict:
    """Extract one interleaved document.

    ``spans``: list of ``{"kind", "text", "media_ref", "offset"}`` dicts
    (offset may arrive unsorted; processing order is ascending offset, ties
    broken by input position — deterministic, derived from input structure
    only, never from execution order).

    Returns ``{"spans": [{kind,text,media_ref,order}], "confidence",
    "word_count", "status", "failure_reason", "preprocessing_applied"}``.
    """
    ordered = sorted(enumerate(spans), key=lambda p: (p[1].get("offset") or 0, p[0]))

    out_spans: list[dict] = []
    text_parts: list[str] = []
    prep: list[str] = []
    first_error: str | None = None
    had_text_input = False

    def note(step: str) -> None:
        if step not in prep:
            prep.append(step)

    for _, span in ordered:
        kind = span.get("kind") or ""
        if kind == "text":
            had_text_input = True
            content, err = plain_text_read(span.get("text") or "")
            if err is not None:
                if first_error is None:
                    first_error = err
                continue
            note(PREP_PLAIN_TEXT)
            if repair_hyphens:
                note(PREP_HYPHEN)
            cleaned = _normalize_text(content, repair_hyphens)
            if _passes_span_gate(cleaned):
                out_spans.append(
                    {"kind": "text", "text": cleaned, "media_ref": "", "order": len(out_spans)}
                )
                text_parts.append(cleaned)
        elif kind == "html":
            had_text_input = True
            note(PREP_HTML_MAIN)
            for item in extract_main_content(span.get("text") or ""):
                if item["kind"] == "text":
                    cleaned = _normalize_text(item["text"], repair_hyphens)
                    if _passes_span_gate(cleaned):
                        out_spans.append(
                            {
                                "kind": "text",
                                "text": cleaned,
                                "media_ref": "",
                                "order": len(out_spans),
                            }
                        )
                        text_parts.append(cleaned)
                else:
                    out_spans.append(
                        {
                            "kind": "media",
                            "text": "",
                            "media_ref": item["media_ref"],
                            "order": len(out_spans),
                        }
                    )
        elif kind == "media":
            ref = span.get("media_ref") or ""
            if ref:
                note(PREP_MEDIA)
                out_spans.append(
                    {"kind": "media", "text": "", "media_ref": ref, "order": len(out_spans)}
                )
        else:
            if first_error is None:
                first_error = f"unsupported span kind: {kind!r}"

    combined = "\n\n".join(text_parts)
    word_count = count_words_safely_office(combined)
    confidence = 100.0  # direct extraction — enhanced.rs:1673, xml_extractor confidence

    status = STATUS_COMPLETED
    failure_reason: str | None = None

    if had_text_input and not text_parts:
        status = STATUS_FAILED
        msg = first_error or "No extractable text found in document (0 words)"
        failure_reason, _ = classify_ocr_error(msg)
    elif len(spans) == 0:  # len() not truthiness: spans may be a numpy array
        status = STATUS_FAILED
        failure_reason, _ = classify_ocr_error(
            "No extractable text found in document (0 words)"
        )
    elif not out_spans:
        # No text/html input, nothing emitted (e.g. only unsupported span
        # kinds, or media spans with empty refs) — a document that produced
        # nothing is failed, like readur's empty-result path
        # (src/ocr/queue.rs:541-579).
        status = STATUS_FAILED
        msg = first_error or "No extractable text found in document (0 words)"
        failure_reason, _ = classify_ocr_error(msg)
    elif text_parts:
        err = validate_ocr_quality(combined, confidence, word_count)
        if err is not None:
            status = STATUS_FAILED
            failure_reason, _ = classify_ocr_error(err)

    if status == STATUS_COMPLETED:
        final_spans = out_spans
    else:
        # A failed document retains only its media spans (text was judged
        # garbage); orders are re-packed so the sequence stays gap-free.
        final_spans = [s for s in out_spans if s["kind"] == "media"]
        for i, s in enumerate(final_spans):
            s["order"] = i

    return {
        "spans": final_spans,
        "confidence": confidence,
        "word_count": word_count,
        "status": status,
        "failure_reason": failure_reason,
        "preprocessing_applied": prep,
    }
