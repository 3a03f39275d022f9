"""OCR swap interface (I1–I4): language-combo builder, PSM/OEM config
mapping, confidence gating, per-document timeout contract, and the
reduced-quality retry ladder — around a pluggable engine.

The container ships no tesseract, so the ENGINE is pluggable:
``FakeOcrEngine`` is a deterministic stand-in (reproducible word stream +
stat-derived confidence) that lets the full distributed image path
(decode → preprocess → OCR → W3 gate → commit / dead-letter) run and be
tested end-to-end. A real deployment swaps in a tesseract-backed engine
with the same two-method contract; nothing else changes.

Reference parity:
* language combination I4: /root/reference/src/ocr/enhanced.rs:342-360
  (primary first, preferred joined with '+', ocr_language fallback)
* PSM/OEM mapping: enhanced.rs:366-409
* confidence clamp: enhanced.rs:414-428 (mean conf clamped to [0,100])
* validation + limits + timeout + low-confidence error + retry ladder
  I3: src/ocr/image_ocr.rs:12-241 (max 10000×10000, 120 s timeout,
  min confidence 60.0, recoverable → reduced-quality retry at max-dim
  2000 Lanczos3)
"""

from __future__ import annotations

import hashlib
import time
from dataclasses import dataclass

import numpy as np

from readur_spark.kernels.pixels import (
    OcrSettings,
    PngError,
    decode_image,
    preprocess_image,
    resize_lanczos3,
    to_luma,
)

# ---------------------------------------------------------------------------
# I4: language combination (enhanced.rs:342-360)
# ---------------------------------------------------------------------------


def build_language_combination(settings: OcrSettings) -> str:
    if len(settings.preferred_languages) > 1:
        languages = [l for l in settings.preferred_languages if l != settings.primary_language]
        languages.insert(0, settings.primary_language)
        return "+".join(languages)
    if settings.preferred_languages:
        return settings.preferred_languages[0]
    return settings.ocr_language


# ---------------------------------------------------------------------------
# PSM / OEM config mapping (enhanced.rs:366-409)
# ---------------------------------------------------------------------------

PSM_MODES = {
    0: "osd_only",
    1: "auto_osd",
    2: "auto_only",
    3: "auto",
    4: "single_column",
    5: "single_block_vert_text",
    6: "single_block",
    7: "single_line",
    8: "single_word",
    9: "circle_word",
    10: "single_char",
    11: "sparse_text",
    12: "sparse_text_osd",
    13: "raw_line",
}

OEM_MODES = {
    0: "tesseract_only",
    1: "lstm_only",
    2: "tesseract_lstm_combined",
    3: "default",
}


def psm_name(mode: int) -> str:
    return PSM_MODES.get(mode, "auto")  # default fallback like the match arm


def oem_name(mode: int) -> str:
    return OEM_MODES.get(mode, "default")


def clamp_confidence(conf: float) -> float:
    """enhanced.rs:414-428: clamp to [0, 100]."""
    return max(0.0, min(100.0, float(conf)))


# ---------------------------------------------------------------------------
# Engine contract + deterministic fake
# ---------------------------------------------------------------------------


class OcrEngineError(RuntimeError):
    """Engine-level failure; ``recoverable`` drives the I3 retry ladder
    (image_ocr.rs OcrError::is_recoverable)."""

    def __init__(self, message: str, recoverable: bool = False):
        super().__init__(message)
        self.recoverable = recoverable


_FAKE_VOCAB = (
    "the quick brown fox jumps over lazy dog table spark window merge "
    "batch document text scanner page image quality value data"
).split()


@dataclass
class FakeOcrEngine:
    """Deterministic stand-in engine (picklable → ships to executors).

    * text: a reproducible word stream seeded by the pixel-content hash —
      the same image always "reads" the same text, on any worker;
    * confidence: mean brightness mapped to [0,100] — dim images score low,
      so tests can drive the confidence gate and retry ladder with real
      pixel inputs;
    * ``delay_s``: optional artificial latency for timeout-contract tests.
    """

    words_per_kilopixel: float = 2.0
    delay_s: float = 0.0

    def recognize(
        self, img: np.ndarray, lang: str, psm: str = "auto", oem: str = "default"
    ) -> tuple[str, float]:
        if self.delay_s:
            time.sleep(self.delay_s)
        seed = hashlib.blake2b(
            img.tobytes() + lang.encode() + psm.encode(), digest_size=16
        ).digest()
        n_words = max(1, int(img.size / 1000.0 * self.words_per_kilopixel))
        n_words = min(n_words, 5000)
        rnd = np.random.RandomState(int.from_bytes(seed[:4], "big"))
        words = [_FAKE_VOCAB[i] for i in rnd.randint(0, len(_FAKE_VOCAB), size=n_words)]
        confidence = clamp_confidence(float(img.mean()) / 255.0 * 100.0)
        return " ".join(words), confidence


# ---------------------------------------------------------------------------
# The service: validate → preprocess → OCR (+ retry ladder) → gate
# ---------------------------------------------------------------------------


@dataclass
class ImageOcrLimits:
    """image_ocr.rs:20-28 defaults."""

    max_image_width: int = 10000
    max_image_height: int = 10000
    ocr_timeout_seconds: float = 120.0
    min_confidence_threshold: float = 60.0


def _run_engine(engine, img, settings: OcrSettings, limits: ImageOcrLimits):
    """One engine pass with the confidence gate and (soft) timeout
    contract. The reference wraps the blocking call in tokio::timeout; in
    a batch executor we enforce the budget by checking elapsed wall time —
    a slow engine surfaces as ocr_timeout either way."""
    lang = build_language_combination(settings)
    psm = psm_name(settings.ocr_page_segmentation_mode)
    oem = oem_name(settings.ocr_engine_mode)
    t0 = time.perf_counter()
    text, confidence = engine.recognize(img, lang, psm=psm, oem=oem)
    if time.perf_counter() - t0 > limits.ocr_timeout_seconds:
        raise OcrEngineError(
            f"OCR timed out after {limits.ocr_timeout_seconds} seconds", recoverable=False
        )
    confidence = clamp_confidence(confidence)
    if confidence < limits.min_confidence_threshold:
        raise OcrEngineError(
            f"OCR confidence too low: {confidence:.1f} below threshold "
            f"{limits.min_confidence_threshold:.1f}",
            recoverable=True,  # LowConfidence is recoverable (image_ocr.rs)
        )
    return text.strip(), confidence


def ocr_image_bytes(
    data: bytes,
    engine,
    settings: OcrSettings | None = None,
    limits: ImageOcrLimits | None = None,
) -> dict:
    """Full image-OCR ladder for one document. Returns
    {text, confidence, word_count, preprocessing_applied, status,
    failure_reason, processing_time_ms} — the OcrResult shape
    (enhanced.rs:190-199) + queue-side status classification."""
    from readur_spark.kernels.quality import classify_ocr_error

    settings = settings or OcrSettings()
    limits = limits or ImageOcrLimits()
    t0 = time.perf_counter()

    def fail(msg: str) -> dict:
        reason, _quiet = classify_ocr_error(msg)
        return {
            "text": None,
            "confidence": 0.0,
            "word_count": 0,
            "preprocessing_applied": [],
            "status": "failed",
            "failure_reason": reason,
            "processing_time_ms": int((time.perf_counter() - t0) * 1000),
        }

    try:
        img = decode_image(data)
    except Exception as e:
        # any decode failure on untrusted bytes degrades like the
        # reference's InvalidImageFormat (image_ocr.rs:90-95)
        return fail(f"Invalid image format: {e}")
    out = ocr_image_array(img, engine, settings=settings, limits=limits)
    out["processing_time_ms"] = int((time.perf_counter() - t0) * 1000)
    return out


def ocr_image_array(
    img: np.ndarray,
    engine,
    settings: OcrSettings | None = None,
    limits: ImageOcrLimits | None = None,
) -> dict:
    """The ladder from decoded pixels onward (shared by the single-image
    path and the per-page PDF path, which renders its own rasters)."""
    from readur_spark.kernels.quality import classify_ocr_error, validate_ocr_quality
    from readur_spark.kernels.wordcount import count_words_safely_enhanced

    settings = settings or OcrSettings()
    limits = limits or ImageOcrLimits()
    t0 = time.perf_counter()

    def fail(msg: str) -> dict:
        reason, _quiet = classify_ocr_error(msg)
        return {
            "text": None,
            "confidence": 0.0,
            "word_count": 0,
            "preprocessing_applied": [],
            "status": "failed",
            "failure_reason": reason,
            "processing_time_ms": int((time.perf_counter() - t0) * 1000),
        }

    h, w = img.shape[0], img.shape[1]
    if w > limits.max_image_width or h > limits.max_image_height:
        return fail(
            f"Image too large: {w}x{h} exceeds maximum "
            f"{limits.max_image_width}x{limits.max_image_height}"
        )

    processed, applied, _stats = preprocess_image(img, settings)
    try:
        text, confidence = _run_engine(engine, processed, settings, limits)
    except OcrEngineError as e:
        if e.recoverable:
            # I3: reduced-quality retry — downsample to max-dim 2000 and
            # run once more (image_ocr.rs:187-241)
            gray = to_luma(img)
            gh, gw = gray.shape
            if max(gw, gh) > 2000:
                scale = 2000.0 / max(gw, gh)
                gray = resize_lanczos3(gray, int(gw * scale), int(gh * scale))
            try:
                text, confidence = _run_engine(engine, gray, settings, limits)
                applied = applied + ["Reduced-quality retry"]
            except OcrEngineError as e2:
                return fail(str(e2))
        else:
            return fail(str(e))

    word_count = count_words_safely_enhanced(text)
    err = validate_ocr_quality(text, confidence, word_count)
    if err is not None:
        out = fail(err)
        out["confidence"] = confidence
        out["preprocessing_applied"] = applied
        return out
    return {
        "text": text,
        "confidence": confidence,
        "word_count": word_count,
        "preprocessing_applied": applied,
        "status": "completed",
        "failure_reason": None,
        "processing_time_ms": int((time.perf_counter() - t0) * 1000),
    }
