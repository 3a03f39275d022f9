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


_PSM_NUMBERS = {name: num for num, name in PSM_MODES.items()}
_OEM_NUMBERS = {name: num for num, name in OEM_MODES.items()}


# ---------------------------------------------------------------------------
# GlyphOcrEngine: actually READS pages rendered with the built-in 5×7 font
# ---------------------------------------------------------------------------

_GLYPH_TEMPLATES: dict[int, tuple[dict[bytes, str], list[tuple[str, "np.ndarray"]]]] = {}


def _glyph_templates(k: int):
    """(exact-match dict, char list, stacked template array) of 7k×5k
    glyph-area bitmaps at font pixel size k, built from the same font the
    renderer stamps with. The stacked array vectorizes nearest-Hamming."""
    got = _GLYPH_TEMPLATES.get(k)
    if got is None:
        from readur_spark.kernels.font5x7 import FONT, glyph_cell

        exact: dict[bytes, str] = {}
        chars: list[str] = []
        mats: list[np.ndarray] = []
        for c in FONT:
            if c == " ":
                continue
            area = glyph_cell(c, k)[:, : 5 * k]
            key = np.packbits(area).tobytes()
            exact.setdefault(key, c)
            chars.append(c)
            mats.append(area)
        got = (exact, chars, np.stack(mats))
        _GLYPH_TEMPLATES[k] = got
    return got


@dataclass
class GlyphOcrEngine:
    """A real (if minimal) OCR engine for pages rendered by
    ``render_pdf_pages``: it segments ink into lines and words, recovers
    the character-cell grid (horizontal phase + baseline offset are
    unknown — both are searched over the font-pixel lattice and scored by
    exact template hits), and classifies each cell against the built-in
    5×7 font, falling back to nearest-Hamming for degraded cells.

    This is genuine reading — the engine shares only the font tables with
    the renderer, not the text. Confidence = % of cells matched exactly,
    so noise/degradation lowers it and drives the I2/I3 gates honestly.
    Deterministic and picklable like the other engines.

    Known limits (documented, not load-bearing for the pipeline): glyph
    pairs closer than one cell but separated by ≥5 blank font columns
    (e.g. ``!!``) read as two words, and text not rendered on this font's
    lattice (photographs, third-party rasters) yields low confidence
    rather than text — exactly how the confidence gate should treat it.
    """

    dpi: int = 300
    ink_threshold: int = 128

    def recognize(
        self, img: np.ndarray, lang: str, psm: str = "auto", oem: str = "default"
    ) -> tuple[str, float]:
        from readur_spark.kernels.font5x7 import CELL_H, CELL_W

        k = max(1, int(round(self.dpi / 72.0)))
        a = np.asarray(img)
        if a.ndim == 3:
            a = a.mean(axis=2)
        ink = a < self.ink_threshold
        ink_rows = np.flatnonzero(ink.any(axis=1))
        if ink_rows.size == 0:
            return "", 0.0
        templates = _glyph_templates(k)
        # line bands: ink-row groups separated by > 3k blank rows (adjacent
        # 12 pt lines leave a 5k gap; intra-glyph blanks never exceed ~2k)
        bands: list[tuple[int, int]] = []
        start = prev = int(ink_rows[0])
        for r in ink_rows[1:]:
            r = int(r)
            if r - prev > 3 * k:
                bands.append((start, prev))
                start = r
            prev = r
        bands.append((start, prev))
        lines: list[str] = []
        n_cells = 0
        sim_total = 0.0
        for rtop, rbot in bands:
            text, cells, sim = self._read_line(ink, rtop, rbot, k, templates)
            lines.append(text)
            n_cells += cells
            sim_total += sim
        # confidence = mean per-character similarity (1.0 for an exact
        # template hit, 1 − hamming/(|obs|+|tmpl|) for degraded cells) —
        # graded like a real engine's mean word confidence
        confidence = clamp_confidence(100.0 * sim_total / n_cells) if n_cells else 0.0
        return "\n".join(lines), confidence

    def _read_line(self, ink, rtop, rbot, k, templates):
        from readur_spark.kernels.font5x7 import CELL_H, CELL_W

        cols_any = np.flatnonzero(ink[rtop : rbot + 1].any(axis=0))
        if cols_any.size == 0:
            return "", 0, 0
        # word blobs: blank column runs ≥ 5k separate words (a space cell
        # guarantees ≥ 7k; intra-word blanks reach at most ~5k for the
        # sparsest glyph pairs)
        blobs: list[tuple[int, int]] = []
        bstart = bprev = int(cols_any[0])
        for c in cols_any[1:]:
            c = int(c)
            if c - bprev >= 5 * k:
                blobs.append((bstart, bprev))
                bstart = c
            bprev = c
        blobs.append((bstart, bprev))
        words: list[str] = []
        spans: list[tuple[int, int]] = []  # (cell_start, n_cells) per word
        t_cells = 0
        t_sim = 0.0
        for c0, c1 in blobs:
            word, s, ncells, cells, sim = self._read_word(
                ink, rtop, rbot, c0, c1, k, templates
            )
            words.append(word)
            spans.append((s, ncells))
            t_cells += cells
            t_sim += sim
        # reassemble with space counts derived from inter-word cell gaps
        out = words[0]
        for i in range(1, len(words)):
            prev_end = spans[i - 1][0] + spans[i - 1][1] * CELL_W * k
            gap = spans[i][0] - prev_end
            out += " " * max(1, int(round(gap / (CELL_W * k)))) + words[i]
        return out, t_cells, t_sim

    def _read_word(self, ink, rtop, rbot, c0, c1, k, templates):
        from readur_spark.kernels.font5x7 import CELL_H, CELL_W

        exact, t_chars, t_stack = templates
        wrows = np.flatnonzero(ink[rtop : rbot + 1, c0 : c1 + 1].any(axis=1))
        wbot = rtop + int(wrows[-1])  # bottom ink row of THIS word
        word_ink = int(ink[rtop : rbot + 1, c0 : c1 + 1].sum())
        best = None
        # joint grid search: horizontal phase (leading blank columns of the
        # first glyph, 0..4) × baseline offset (bottom ink row may be any
        # font row 0..6 — '-' is mid-cell). The score is TOTAL Hamming
        # distance across cells (0 for an exact render at the true grid);
        # scoring exact hits alone would let one lucky sliver match (a
        # misplaced grid cropping the top of a glyph looks like ' or `)
        # beat a globally-consistent alignment on degraded pages.
        for m in range(5):
            s = c0 - m * k
            ncells = max(1, int(np.ceil((c1 + 1 - s) / (CELL_W * k))))
            for v in range(CELL_H):
                base = wbot + 1 + v * k
                chars: list[str] = []
                hits = nonblank = 0
                total_ham = 0
                covered = 0
                sim_sum = 0.0
                for j in range(ncells):
                    cell_l = s + j * CELL_W * k
                    area = self._crop(ink, base - CELL_H * k, cell_l, CELL_H * k, 5 * k)
                    if not area.any():
                        chars.append(" ")
                        continue
                    obs_ink = int(area.sum())
                    covered += obs_ink
                    nonblank += 1
                    key = np.packbits(area).tobytes()
                    ch = exact.get(key)
                    if ch is not None:
                        chars.append(ch)
                        hits += 1
                        sim_sum += 1.0
                    else:
                        # vectorized nearest-Hamming over all templates
                        dists = (t_stack != area[None, :, :]).sum(axis=(1, 2))
                        i = int(dists.argmin())
                        chars.append(t_chars[i])
                        d = int(dists[i])
                        total_ham += d
                        tmpl_ink = int(t_stack[i].sum())
                        # Jaccard of ink sets: |A∩B|/|A∪B| — 1.0 exact,
                        # ~|B|/|A| for a solid-ink garbage cell (low, so
                        # the 60.0 confidence gate rejects unreadable
                        # pages instead of waving them through)
                        union = obs_ink + tmpl_ink + d
                        sim_sum += max(0.0, (obs_ink + tmpl_ink - d) / max(1, union))
                # ink the grid fails to cover (wrong baseline crops the
                # word's rows; wrong phase leaves ink in the gap columns)
                # is as wrong as mismatched ink — penalize it equally
                score = -(total_ham + max(0, word_ink - covered))
                cand = (
                    (score, hits, -v, -m),
                    "".join(chars).strip(),
                    s,
                    ncells,
                    nonblank,
                    sim_sum,
                )
                if best is None or cand[0] > best[0]:
                    best = cand
                if score == 0 and hits == nonblank:
                    break
            if best[0][0] == 0:  # perfect grid found
                break
        _, word, s, ncells, nonblank, sim_sum = best
        return word, s, ncells, nonblank, sim_sum

    @staticmethod
    def _crop(ink, top, left, h, w):
        """h×w bool crop padded with False outside the image."""
        out = np.zeros((h, w), dtype=bool)
        y0, x0 = max(0, top), max(0, left)
        y1, x1 = min(ink.shape[0], top + h), min(ink.shape[1], left + w)
        if y1 > y0 and x1 > x0:
            out[y0 - top : y1 - top, x0 - left : x1 - left] = ink[y0:y1, x0:x1]
        return out


@dataclass
class TesseractEngine:
    """Real tesseract adapter behind the same two-method contract as
    ``FakeOcrEngine`` — swap it in and nothing else changes.

    Drives the ``tesseract`` CLI (the reference's rusty-tesseract binding is
    also a process-call wrapper — /root/reference/src/ocr/enhanced.rs:138-208,
    src/ocr/image_ocr.rs:12-180): the image is piped as PNM on stdin, output
    requested as TSV so per-word confidences are available, text is
    reassembled in reading order and confidence is the mean over word rows —
    matching tesseract's own `mean_conf`. Only config fields are stored, so
    the engine pickles and ships to executors exactly like the fake.

    The container this repo is developed in has no tesseract binary; use
    ``TesseractEngine.available()`` to gate (the contract tests mirror the
    reference's #[ignore]-style real-engine tests,
    src/tests/ocr_tests.rs:107-136, and skip when absent).
    """

    binary: str = "tesseract"
    timeout_s: float = 120.0

    @staticmethod
    def available(binary: str = "tesseract") -> bool:
        import shutil

        return shutil.which(binary) is not None

    @staticmethod
    def _to_pnm(img: np.ndarray) -> bytes:
        """Loss-free PNM encode (P5 gray / P6 RGB) — stdlib-only, and
        leptonica reads PNM natively so no codec dependency is added."""
        a = np.ascontiguousarray(img.astype(np.uint8))
        if a.ndim == 2:
            header = b"P5 %d %d 255\n" % (a.shape[1], a.shape[0])
        elif a.ndim == 3 and a.shape[2] == 3:
            header = b"P6 %d %d 255\n" % (a.shape[1], a.shape[0])
        elif a.ndim == 3 and a.shape[2] == 4:
            a = a[:, :, :3]
            header = b"P6 %d %d 255\n" % (a.shape[1], a.shape[0])
        else:
            raise OcrEngineError(f"unsupported image shape {a.shape}")
        return header + a.tobytes()

    def recognize(
        self, img: np.ndarray, lang: str, psm: str = "auto", oem: str = "default"
    ) -> tuple[str, float]:
        import subprocess

        cmd = [
            self.binary,
            "stdin",
            "stdout",
            "-l",
            lang or "eng",
            "--psm",
            str(_PSM_NUMBERS.get(psm, 3)),
            "--oem",
            str(_OEM_NUMBERS.get(oem, 3)),
            "tsv",
        ]
        try:
            proc = subprocess.run(
                cmd,
                input=self._to_pnm(img),
                capture_output=True,
                timeout=self.timeout_s,
            )
        except subprocess.TimeoutExpired:
            raise OcrEngineError(
                f"OCR timed out after {self.timeout_s} seconds", recoverable=False
            )
        except OSError as e:
            raise OcrEngineError(f"tesseract invocation failed: {e}", recoverable=False)
        if proc.returncode != 0:
            raise OcrEngineError(
                f"tesseract exited {proc.returncode}: "
                f"{proc.stderr.decode('utf-8', 'replace')[:500]}",
                recoverable=False,
            )
        words: list[str] = []
        confs: list[float] = []
        last_line_key = None
        lines = proc.stdout.decode("utf-8", "replace").splitlines()
        for row in lines[1:]:  # header: level page_num block_num ... conf text
            cols = row.split("\t")
            if len(cols) < 12 or cols[0] != "5":
                continue
            word = cols[11].strip()
            if not word:
                continue
            line_key = tuple(cols[1:5])  # page, block, par, line
            if words and line_key != last_line_key:
                words.append("\n")
            elif words:
                words.append(" ")
            last_line_key = line_key
            words.append(word)
            try:
                confs.append(float(cols[10]))
            except ValueError:
                pass
        text = "".join(words)
        confidence = clamp_confidence(sum(confs) / len(confs)) if confs else 0.0
        return text, confidence


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
