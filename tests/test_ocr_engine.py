"""OCR swap interface (I1–I4): language combos, PSM/OEM mapping,
confidence gate, timeout contract, reduced-quality retry ladder — driven
end-to-end with the deterministic fake engine on real PNG bytes."""

import numpy as np
import pytest

from readur_spark.kernels import ocr_engine as O
from readur_spark.kernels.pixels import OcrSettings, png_encode

RNG = np.random.RandomState(7)


def _png(mean: int, shape=(350, 320)) -> bytes:
    """Bright or dim PNG with mild texture (keeps FakeOcrEngine confidence
    ≈ mean/255*100)."""
    lo, hi = max(0, mean - 20), min(255, mean + 20)
    return png_encode(RNG.randint(lo, hi + 1, size=shape).astype(np.uint8))


# --------------------------------------------------------------------------
# I4 language combination (enhanced.rs:342-360)
# --------------------------------------------------------------------------


def test_language_combination_multi_primary_first():
    s = OcrSettings(
        preferred_languages=["spa", "eng", "deu"], primary_language="eng", ocr_language="fra"
    )
    assert O.build_language_combination(s) == "eng+spa+deu"


def test_language_combination_single_preferred():
    s = OcrSettings(preferred_languages=["spa"], primary_language="eng", ocr_language="fra")
    assert O.build_language_combination(s) == "spa"


def test_language_combination_fallback_to_ocr_language():
    s = OcrSettings(preferred_languages=[], primary_language="eng", ocr_language="fra")
    assert O.build_language_combination(s) == "fra"


def test_psm_oem_mapping_and_fallback():
    assert O.psm_name(3) == "auto"
    assert O.psm_name(6) == "single_block"
    assert O.psm_name(13) == "raw_line"
    assert O.psm_name(99) == "auto"  # default fallback arm
    assert O.oem_name(1) == "lstm_only"
    assert O.oem_name(42) == "default"


def test_confidence_clamp():
    assert O.clamp_confidence(-5.0) == 0.0
    assert O.clamp_confidence(123.0) == 100.0
    assert O.clamp_confidence(55.5) == 55.5


# --------------------------------------------------------------------------
# Fake engine determinism
# --------------------------------------------------------------------------


def test_fake_engine_deterministic():
    img = RNG.randint(0, 256, size=(64, 64)).astype(np.uint8)
    e = O.FakeOcrEngine()
    t1, c1 = e.recognize(img, "eng")
    t2, c2 = e.recognize(img, "eng")
    assert (t1, c1) == (t2, c2)
    t3, _ = e.recognize(img, "deu")  # language participates in the seed
    assert t3 != t1


# --------------------------------------------------------------------------
# Full ladder on PNG bytes
# --------------------------------------------------------------------------


def test_ocr_bright_image_completes():
    res = O.ocr_image_bytes(_png(180), O.FakeOcrEngine(), settings=OcrSettings())
    assert res["status"] == "completed"
    assert res["confidence"] > 60.0
    assert res["word_count"] > 0
    assert res["text"]
    assert res["processing_time_ms"] >= 0


def test_ocr_dim_image_retries_then_fails_classified():
    # mean ~30 -> confidence ~12 < 60 -> recoverable -> retry (still dim)
    # -> fail; the low-confidence message classifies via W4
    res = O.ocr_image_bytes(_png(30), O.FakeOcrEngine(), settings=OcrSettings())
    assert res["status"] == "failed"
    assert res["failure_reason"] == "other"  # "confidence too low" has no
    # W4 keyword -> other (queue.rs:1282-1304 falls through)


def test_ocr_retry_ladder_recovers_when_reduced_quality_wins():
    """Engine whose confidence jumps for images ≤ 2000 px wide: the first
    (preprocessed, upscaled) pass fails the gate, the reduced-quality retry
    passes — exercising the I3 ladder's success arm."""

    class SizeBiasedEngine(O.FakeOcrEngine):
        def recognize(self, img, lang, psm="auto", oem="default"):
            text, _ = super().recognize(img, lang, psm, oem)
            conf = 90.0 if max(img.shape) <= 2000 else 10.0
            return text, conf

    # 4096-wide dim-ish image: preprocess upscales/keeps > 2000 wide ->
    # first pass conf 10 -> retry downsamples to 2000 -> conf 90
    img = RNG.randint(100, 140, size=(900, 4096)).astype(np.uint8)
    res = O.ocr_image_bytes(
        png_encode(img), SizeBiasedEngine(), settings=OcrSettings(ocr_detect_orientation=False)
    )
    assert res["status"] == "completed"
    assert "Reduced-quality retry" in res["preprocessing_applied"]


def test_ocr_timeout_classified():
    limits = O.ImageOcrLimits(ocr_timeout_seconds=0.01)
    res = O.ocr_image_bytes(
        _png(180), O.FakeOcrEngine(delay_s=0.05), settings=OcrSettings(), limits=limits
    )
    assert res["status"] == "failed"
    assert res["failure_reason"] == "ocr_timeout"


def test_ocr_image_too_large_rejected():
    limits = O.ImageOcrLimits(max_image_width=100, max_image_height=100)
    res = O.ocr_image_bytes(_png(180, shape=(200, 200)), O.FakeOcrEngine(), limits=limits)
    assert res["status"] == "failed"
    assert res["failure_reason"] == "file_too_large"


def test_ocr_garbage_bytes_invalid_format():
    res = O.ocr_image_bytes(b"\xff\xd8\xff definitely not decodable", O.FakeOcrEngine())
    assert res["status"] == "failed"
    assert res["failure_reason"] == "other"  # "Invalid image format" has no
    # W4 keyword -> other, like the reference's error string would classify


def test_ocr_empty_text_engine_fails_w3_gate():
    class EmptyEngine:
        def recognize(self, img, lang, psm="auto", oem="default"):
            return "", 95.0

    res = O.ocr_image_bytes(_png(180), EmptyEngine(), settings=OcrSettings())
    assert res["status"] == "failed"
    # W3: empty text -> "OCR result contains no characters" -> other
    assert res["failure_reason"] == "other"
    assert res["confidence"] == 95.0


def test_ocr_punctuation_only_fails_content_ratio():
    class JunkEngine:
        def recognize(self, img, lang, psm="auto", oem="default"):
            return "!!! ??? ... ---" * 10, 95.0

    res = O.ocr_image_bytes(_png(180), JunkEngine(), settings=OcrSettings())
    assert res["status"] == "failed"


# --------------------------------------------------------------------------
# Engine contract, parametrized over both engines (the real one skips when
# the binary is absent — the #[ignore] mirror of ocr_tests.rs:107-136)
# --------------------------------------------------------------------------

_ENGINES = [
    pytest.param(O.FakeOcrEngine(), id="fake"),
    pytest.param(
        O.TesseractEngine(),
        id="tesseract",
        marks=pytest.mark.skipif(
            not O.TesseractEngine.available(), reason="no tesseract binary in container"
        ),
    ),
]


@pytest.mark.parametrize("engine", _ENGINES)
def test_engine_contract_recognize_shape(engine):
    """Every engine returns (str, float-in-[0,100]) from an ndarray + lang,
    and is deterministic for the same input."""
    img = RNG.randint(150, 230, size=(120, 200)).astype(np.uint8)
    text, conf = engine.recognize(img, "eng", psm="auto", oem="default")
    assert isinstance(text, str)
    assert 0.0 <= conf <= 100.0
    text2, conf2 = engine.recognize(img, "eng", psm="auto", oem="default")
    assert (text, conf) == (text2, conf2)


@pytest.mark.parametrize("engine", _ENGINES)
def test_engine_contract_is_picklable(engine):
    """Engines ship to executors — they must pickle."""
    import pickle

    clone = pickle.loads(pickle.dumps(engine))
    assert type(clone) is type(engine)


def test_tesseract_engine_psm_oem_name_mapping():
    """Name→number mapping drives the CLI flags (no binary needed)."""
    assert O._PSM_NUMBERS["single_block"] == 6
    assert O._PSM_NUMBERS["auto"] == 3
    assert O._OEM_NUMBERS["lstm_only"] == 1


def test_tesseract_pnm_encoding():
    """PNM encode is loss-free for gray and RGB, and RGBA drops alpha."""
    gray = np.arange(12, dtype=np.uint8).reshape(3, 4)
    pnm = O.TesseractEngine._to_pnm(gray)
    assert pnm.startswith(b"P5 4 3 255\n") and pnm.endswith(gray.tobytes())
    rgb = np.arange(36, dtype=np.uint8).reshape(3, 4, 3)
    pnm = O.TesseractEngine._to_pnm(rgb)
    assert pnm.startswith(b"P6 4 3 255\n") and pnm.endswith(rgb.tobytes())
    rgba = np.arange(48, dtype=np.uint8).reshape(3, 4, 4)
    assert O.TesseractEngine._to_pnm(rgba).endswith(rgba[:, :, :3].tobytes())


def test_tesseract_missing_binary_raises_engine_error():
    """A missing binary surfaces as a non-recoverable OcrEngineError (the
    ladder classifies it), never an uncaught OSError."""
    eng = O.TesseractEngine(binary="definitely-not-a-real-binary-xyz")
    img = np.full((40, 60), 200, dtype=np.uint8)
    with pytest.raises(O.OcrEngineError) as ei:
        eng.recognize(img, "eng")
    assert not ei.value.recoverable


def test_tesseract_tsv_parsing_via_fake_binary(tmp_path):
    """End-to-end recognize() against a stub 'tesseract' executable that
    emits a fixed TSV: exercises arg construction, stdin piping, TSV word
    assembly (line breaks on line-key change) and mean confidence."""
    import os
    import stat

    stub = tmp_path / "tesseract"
    tsv = (
        "level\tpage_num\tblock_num\tpar_num\tline_num\tword_num\tleft\ttop\twidth\theight\tconf\ttext\n"
        "1\t1\t0\t0\t0\t0\t0\t0\t100\t50\t-1\t\n"
        "5\t1\t1\t1\t1\t1\t0\t0\t30\t10\t91.5\thello\n"
        "5\t1\t1\t1\t1\t2\t35\t0\t30\t10\t88.5\tworld\n"
        "5\t1\t1\t1\t2\t1\t0\t12\t30\t10\t96.0\tagain\n"
    )
    stub.write_text(
        "#!/bin/sh\n"
        "cat > /dev/null\n"  # drain stdin (the piped PNM)
        f"printf '%s' {repr(tsv)!r} > /dev/null 2>&1\n"
        f"cat <<'TSVEOF'\n{tsv}TSVEOF\n"
    )
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    eng = O.TesseractEngine(binary=str(stub))
    img = np.full((40, 60), 200, dtype=np.uint8)
    text, conf = eng.recognize(img, "eng", psm="single_block")
    assert text == "hello world\nagain"
    assert conf == pytest.approx((91.5 + 88.5 + 96.0) / 3)


def test_tesseract_adapter_encodes_real_glyph_page(tmp_path):
    """Bridge test: a page RENDERED by the glyph raster path (the same
    pixels the GlyphOcrEngine reads back) goes through the tesseract
    adapter's _to_pnm + stdin pipe to a stub binary that verifies it
    received a well-formed P5 of the page's exact dimensions — so the
    adapter's image-encoding leg is exercised on real rendered pages,
    not just synthetic arrays, even without a tesseract binary."""
    import stat

    from readur_spark.kernels.minipdf import build_pdf, render_pdf_pages

    (img,) = render_pdf_pages(
        build_pdf([[(72.0, 720.0, "verify glyph page")]]), dpi=72
    )
    assert img.ndim == 2 and img.size > 0 and img.min() < 128  # real ink
    stub = tmp_path / "tesseract"
    stub.write_text(
        "#!/bin/sh\n"
        # verify the piped PNM header, then emit one TSV word row
        'read -r magic w h maxv\n'
        f'[ "$magic" = "P5" ] || exit 9\n'
        f'[ "$w" = "{img.shape[1]}" ] || exit 9\n'
        f'[ "$h" = "{img.shape[0]}" ] || exit 9\n'
        "cat > /dev/null\n"
        'printf "level\\tp\\tb\\tpa\\tl\\tw\\tle\\tt\\twi\\th\\tconf\\ttext\\n"\n'
        'printf "5\\t1\\t1\\t1\\t1\\t1\\t0\\t0\\t9\\t9\\t90.0\\tok\\n"\n'
    )
    stub.chmod(stub.stat().st_mode | stat.S_IEXEC)
    eng = O.TesseractEngine(binary=str(stub))
    text, conf = eng.recognize(img, "eng")
    assert text == "ok" and conf == pytest.approx(90.0)
