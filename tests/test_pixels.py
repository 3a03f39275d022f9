"""Pixel layer: PNG codec roundtrips, I8-I16 preprocessing math against
the reference threshold matrix (enhanced.rs:478-901), EXIF apply."""

import numpy as np
import pytest

from readur_spark.kernels import pixels as P

RNG = np.random.RandomState(1234)


# --------------------------------------------------------------------------
# PNG codec
# --------------------------------------------------------------------------


@pytest.mark.parametrize("shape", [(7, 5), (16, 16), (3, 9, 3), (4, 6, 4)])
def test_png_roundtrip(shape):
    arr = RNG.randint(0, 256, size=shape).astype(np.uint8)
    assert np.array_equal(P.png_decode(P.png_encode(arr)), arr)


def _forward_filter(raw: np.ndarray, ftype: int, channels: int) -> bytes:
    """Reference forward filtering (PNG spec §9) to exercise the decoder's
    unfiltering of types 1-4 (our encoder only emits type 0)."""
    h, w = raw.shape[0], raw.shape[1] // 1
    stride = raw.shape[1]
    bpp = channels
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = raw[y].astype(np.int32)
        line = np.zeros(stride, dtype=np.int32)
        for i in range(stride):
            a = cur[i - bpp] if i >= bpp else 0
            b = prev[i]
            c = prev[i - bpp] if i >= bpp else 0
            if ftype == 0:
                line[i] = cur[i]
            elif ftype == 1:
                line[i] = cur[i] - a
            elif ftype == 2:
                line[i] = cur[i] - b
            elif ftype == 3:
                line[i] = cur[i] - ((a + b) >> 1)
            else:
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pr = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                line[i] = cur[i] - pr
        out.append(ftype)
        out.extend((line & 0xFF).astype(np.uint8).tobytes())
        prev = cur
    return bytes(out)


@pytest.mark.parametrize("ftype", [0, 1, 2, 3, 4])
def test_png_decode_all_filter_types(ftype):
    import struct
    import zlib

    arr = RNG.randint(0, 256, size=(9, 7)).astype(np.uint8)
    filtered = _forward_filter(arr, ftype, channels=1)
    ihdr = struct.pack(">IIBBBBB", 7, 9, 8, 0, 0, 0, 0)
    data = (
        b"\x89PNG\r\n\x1a\n"
        + P._chunk(b"IHDR", ihdr)
        + P._chunk(b"IDAT", zlib.compress(filtered))
        + P._chunk(b"IEND", b"")
    )
    assert np.array_equal(P.png_decode(data), arr)


def test_png_decode_rejects_garbage():
    with pytest.raises(P.PngError):
        P.png_decode(b"JFIF not a png")


# --------------------------------------------------------------------------
# I8 luma
# --------------------------------------------------------------------------


def test_luma_integer_coefficients():
    rgb = np.array([[[255, 0, 0], [0, 255, 0], [0, 0, 255], [255, 255, 255]]], dtype=np.uint8)
    out = P.to_luma(rgb)
    assert out.tolist() == [[(2126 * 255) // 10000, (7152 * 255) // 10000, (722 * 255) // 10000, 255]]


# --------------------------------------------------------------------------
# I9 quality analysis
# --------------------------------------------------------------------------


def test_quality_uniform_image():
    img = np.full((64, 64), 77, dtype=np.uint8)
    s = P.analyze_quality(img)
    assert s.average_brightness == 77.0
    assert s.contrast_ratio == 0.0
    assert s.noise_level == 0.0
    assert s.sharpness == 0.0


def test_quality_full_stats_match_numpy():
    img = RNG.randint(0, 256, size=(50, 40)).astype(np.uint8)
    s = P.analyze_quality(img)
    f = img.astype(np.float64)
    assert s.average_brightness == pytest.approx(f.mean())
    assert s.contrast_ratio == pytest.approx(np.sqrt(((f - f.mean()) ** 2).mean()) / 255.0)


def test_quality_sampled_above_4mp():
    # 2100x2100 = 4.41 Mpx > 4 Mpx -> every-10th-pixel sampling
    img = np.tile(np.arange(2100, dtype=np.uint32) % 256, (2100, 1)).astype(np.uint8)
    s = P.analyze_quality(img)
    sample = img[::10, ::10].astype(np.float64)
    assert s.average_brightness == pytest.approx(sample.mean())
    var = ((sample - sample.mean()) ** 2).mean()
    assert s.contrast_ratio == pytest.approx(np.sqrt(var) / 255.0)


def test_noise_estimate_single_hot_pixel():
    img = np.zeros((25, 25), dtype=np.uint8)
    # hot pixel exactly on the sampling grid (y=5, x=15)
    img[5, 15] = 80
    s = P.analyze_quality(img)
    # sampled centers: (5,5), (5,15), (15,5), (15,15); only (5,15) deviates
    assert s.noise_level == pytest.approx((80.0 / 255.0) / 4.0)


# --------------------------------------------------------------------------
# I10/I11 decision + brightness tiers (enhanced.rs:306-341, 642-681)
# --------------------------------------------------------------------------


def test_needs_enhancement_matrix():
    neutral = P.neutral_settings()
    good = P.ImageQualityStats(120.0, 0.5, 0.1, 0.5)
    assert not P.needs_enhancement(good, neutral)
    assert P.needs_enhancement(P.ImageQualityStats(0.2, 0.5, 0.1, 0.5), neutral)  # dim
    assert P.needs_enhancement(P.ImageQualityStats(120, 0.1, 0.1, 0.5), neutral)  # flat
    assert P.needs_enhancement(P.ImageQualityStats(120, 0.5, 0.8, 0.5), neutral)  # noisy
    assert P.needs_enhancement(P.ImageQualityStats(120, 0.5, 0.1, 0.1), neutral)  # blurry
    # reference DEFAULTS force user_wants_enhancement (boost 1.0 > 0)
    assert P.needs_enhancement(good, P.OcrSettings())
    skip = P.OcrSettings(ocr_skip_enhancement=True)
    assert not P.needs_enhancement(P.ImageQualityStats(0.2, 0.1, 0.9, 0.1), skip)


@pytest.mark.parametrize(
    "brightness,expected_boost",
    [(30.0, 30.0), (49.9, 10.1), (50.0, 30.0), (70.0, 20.0), (80.0, 0.0), (200.0, 0.0)],
)
def test_brightness_boost_tiers(brightness, expected_boost):
    img = np.full((4, 4), 100, dtype=np.uint8)
    stats = P.ImageQualityStats(brightness, 0.5, 0.0, 0.5)  # contrast>0.4 -> mult 1.2
    out = P.enhance_brightness_contrast(img, stats, P.neutral_settings())
    expect = min(255, round((100 + expected_boost) * 1.2))
    assert int(out[0, 0]) == expect


@pytest.mark.parametrize("contrast,mult", [(0.1, 2.5), (0.3, 1.8), (0.5, 1.2)])
def test_contrast_multiplier_tiers(contrast, mult):
    img = np.full((4, 4), 90, dtype=np.uint8)
    stats = P.ImageQualityStats(150.0, contrast, 0.0, 0.5)  # no boost tier
    out = P.enhance_brightness_contrast(img, stats, P.neutral_settings())
    assert int(out[0, 0]) == min(255, round(90 * mult))


# --------------------------------------------------------------------------
# I12 noise removal
# --------------------------------------------------------------------------


def test_median_filter_removes_salt():
    img = np.zeros((9, 9), dtype=np.uint8)
    img[4, 4] = 255
    assert P.median_filter(img, 1, 1).max() == 0


def test_gaussian_blur_preserves_constant():
    img = np.full((12, 12), 91, dtype=np.uint8)
    assert np.array_equal(P.gaussian_blur(img, 0.8), img)


def test_noise_removal_levels():
    img = RNG.randint(0, 256, size=(16, 16)).astype(np.uint8)
    s = P.neutral_settings()
    heavy = P.adaptive_noise_removal(img, P.ImageQualityStats(100, 0.5, 0.3, 0.5), s)
    light = P.adaptive_noise_removal(img, P.ImageQualityStats(100, 0.5, 0.05, 0.5), s)
    assert np.array_equal(light, P.median_filter(img, 1, 1))
    assert np.array_equal(heavy, P.gaussian_blur(P.median_filter(img, 2, 2), 0.8))


# --------------------------------------------------------------------------
# I13 adaptive threshold
# --------------------------------------------------------------------------


def test_adaptive_threshold_binary_output():
    img = RNG.randint(0, 256, size=(20, 20)).astype(np.uint8)
    out = P.adaptive_threshold(img, 3)
    assert set(np.unique(out)) <= {0, 255}


def test_adaptive_threshold_splits_gradient():
    img = np.tile(np.arange(0, 40, dtype=np.uint8) * 6, (10, 1))
    out = P.adaptive_threshold(img, 20)
    # left half below window mean -> 0; right half above -> 255
    assert out[5, 0] == 0 and out[5, 39] == 255


def test_threshold_window_selection_odd_forced():
    s = P.neutral_settings()
    low = P.ImageQualityStats(100, 0.1, 0.0, 0.5)
    good = P.ImageQualityStats(100, 0.5, 0.0, 0.5)
    # min_dim 400: low contrast -> clamp(400/20=20, 11, 31) = 20 -> odd 21
    assert P.select_threshold_window(400, 500, low, s) == 21
    # good contrast -> clamp(400/15=26, 15, 41) = 26 -> odd 27
    assert P.select_threshold_window(400, 500, good, s) == 27
    cfg = P.OcrSettings(ocr_adaptive_threshold_window_size=14)
    assert P.select_threshold_window(400, 500, good, cfg) == 15


def test_adaptive_contrast_large_image_falls_back_to_histeq():
    img = np.tile(np.arange(256, dtype=np.uint8), (6000, 1))  # 1.536 Mpx
    stats = P.ImageQualityStats(127.5, 0.5, 0.0, 0.5)
    out = P.adaptive_contrast_enhancement(img, stats, P.neutral_settings())
    assert np.array_equal(out, P.histogram_equalization(img))


# --------------------------------------------------------------------------
# I14 histogram equalization + stretch
# --------------------------------------------------------------------------


def test_histogram_equalization_two_level():
    img = np.array([[10] * 8 + [200] * 8], dtype=np.uint8)
    out = P.histogram_equalization(img)
    # cdf(10)=0.5 -> 127, cdf(200)=1.0 -> 255
    assert set(np.unique(out)) == {127, 255}


def test_contrast_stretch_full_range():
    img = np.array([[50, 100, 150]], dtype=np.uint8)
    out = P.contrast_stretch(img)
    assert out[0, 0] == 0 and out[0, 2] == 255
    flat = np.full((3, 3), 9, dtype=np.uint8)
    assert np.array_equal(P.contrast_stretch(flat), flat)


# --------------------------------------------------------------------------
# I15 unsharp mask
# --------------------------------------------------------------------------


def test_sharpen_matches_naive_convolution():
    img = RNG.randint(0, 256, size=(8, 10)).astype(np.uint8)
    out = P.sharpen(img)
    k = [[0, -1, 0], [-1, 5, -1], [0, -1, 0]]
    for y in range(1, 7):
        for x in range(1, 9):
            sv = sum(
                float(img[y + ky - 1, x + kx - 1]) * k[ky][kx]
                for ky in range(3)
                for kx in range(3)
            )
            import math

            expect = min(255, max(0, int(math.floor(abs(sv) + 0.5) * (1 if sv >= 0 else -1))))
            assert int(out[y, x]) == expect, (y, x, sv)
    # borders copied unchanged
    assert np.array_equal(out[0], img[0]) and np.array_equal(out[:, 0], img[:, 0])


# --------------------------------------------------------------------------
# I16 morphology
# --------------------------------------------------------------------------


def test_morphology_open_removes_speck():
    img = np.zeros((9, 9), dtype=np.uint8)
    img[4, 4] = 255
    assert P.morphological_open_close(img).max() == 0


def test_morphology_close_fills_gap_in_block():
    img = np.full((9, 9), 255, dtype=np.uint8)
    img[4, 4] = 0  # pinhole in solid text block
    assert P.morphological_open_close(img).min() == 255


# --------------------------------------------------------------------------
# I5 EXIF apply + I6 + I7
# --------------------------------------------------------------------------


def test_exif_group_properties():
    img = np.arange(6, dtype=np.uint8).reshape(2, 3)
    # 1 = identity
    assert np.array_equal(P.apply_orientation(img, 1), img)
    # flip_h twice = identity; 180 twice = identity
    assert np.array_equal(P.apply_orientation(P.apply_orientation(img, 2), 2), img)
    assert np.array_equal(P.apply_orientation(P.apply_orientation(img, 3), 3), img)
    # 3 == 2 then 4 (fliph + flipv = rotate180)
    assert np.array_equal(
        P.apply_orientation(P.apply_orientation(img, 2), 4), P.apply_orientation(img, 3)
    )
    # rotate90 four times = identity
    r = img
    for _ in range(4):
        r = P.apply_orientation(r, 6)
    assert np.array_equal(r, img)
    # 6 then 8 = identity (cw then ccw)
    assert np.array_equal(P.apply_orientation(P.apply_orientation(img, 6), 8), img)
    # reflections are involutions
    for o in (5, 7):
        assert np.array_equal(P.apply_orientation(P.apply_orientation(img, o), o), img)


@pytest.mark.parametrize("orientation", range(1, 9))
def test_exif_dims_match_transform_table(orientation):
    from readur_spark.kernels.media_meta import orientation_transform

    img = np.arange(12, dtype=np.uint8).reshape(3, 4)  # h=3, w=4
    out = P.apply_orientation(img, orientation)
    expect = orientation_transform(orientation, 4, 3)
    assert (out.shape[1], out.shape[0]) == (expect["width"], expect["height"])


def test_orientation_heuristic_rotates_wide():
    wide = np.zeros((10, 30), dtype=np.uint8)
    out, rotated = P.detect_and_correct_orientation(wide)
    assert rotated and out.shape == (30, 10)
    ok, rotated2 = P.detect_and_correct_orientation(np.zeros((10, 15), dtype=np.uint8))
    assert not rotated2 and ok.shape == (10, 15)


def test_lanczos_resize_constant_and_dims():
    img = np.full((40, 60), 133, dtype=np.uint8)
    out = P.resize_lanczos3(img, 30, 20)
    assert out.shape == (20, 30)
    assert np.all(out == 133)  # normalized weights preserve constants


def test_lanczos_downscale_preserves_ramp():
    ramp = np.tile(np.arange(0, 200, dtype=np.uint8), (20, 1))
    out = P.resize_lanczos3(ramp, 100, 20)
    mid = out[10, 40:60].astype(float)
    # linear ramp downsampled 2x: values ~ 2x the column index
    assert np.all(np.abs(mid - (np.arange(40, 60) * 2 + 0.5)) < 3.0)


def test_smart_resize_pixel_paths():
    big = np.zeros((1000, 4096), dtype=np.uint8)
    out, op = P.smart_resize(big)
    assert op == "downscale" and max(out.shape) == 2048
    small = np.zeros((100, 400), dtype=np.uint8)
    out2, op2 = P.smart_resize(small)
    assert op2 == "upscale" and min(out2.shape) == 600
    mid = np.zeros((500, 500), dtype=np.uint8)
    assert P.smart_resize(mid)[1] is None


# --------------------------------------------------------------------------
# Pipeline orchestration (enhanced.rs:210-290)
# --------------------------------------------------------------------------


def test_preprocess_good_image_untouched():
    # smooth vertical ramp: bright, contrasty, zero local noise; sharpness
    # is low in absolute terms, so gate it with the user-configurable
    # threshold knob (a real reference setting) — all gates then pass
    img = np.tile((np.arange(400) * 255 // 399).astype(np.uint8)[:, None], (1, 350))
    s = P.neutral_settings()
    s.ocr_quality_threshold_sharpness = 0.001
    out, applied, stats = P.preprocess_image(img, s)
    assert stats.noise_level < 0.25 and stats.contrast_ratio >= 0.2
    assert applied == []
    assert np.array_equal(out, img)


def test_preprocess_dim_image_gets_brightness_then_contrast():
    img = RNG.randint(0, 40, size=(400, 350)).astype(np.uint8)  # dim + flat
    out, applied, stats = P.preprocess_image(img, P.neutral_settings())
    assert "Brightness/contrast correction" in applied
    assert stats.average_brightness < 50.0
    assert out.mean() > img.mean()


def test_preprocess_default_settings_user_forced():
    img = RNG.randint(100, 200, size=(400, 350)).astype(np.uint8)
    out, applied, _ = P.preprocess_image(img, P.OcrSettings())
    # reference defaults: boost 1.0 -> brightness step; enhance_contrast +
    # window 15 -> contrast step
    assert "Brightness/contrast correction" in applied
    assert "Contrast enhancement" in applied


@pytest.mark.parametrize("o", range(1, 9))
def test_exif_roundtrip_all_orientations(o):
    """document_ingestion.rs:566-886 shape: store the image pre-distorted
    with the inverse transform, apply the orientation's correction, get
    the upright original back — for all 8 cases."""
    INV = {1: 1, 2: 2, 3: 3, 4: 4, 5: 5, 6: 8, 7: 7, 8: 6}
    upright = np.arange(12, dtype=np.uint8).reshape(3, 4)
    stored = P.apply_orientation(upright, INV[o])
    assert np.array_equal(P.apply_orientation(stored, o), upright)


# --------------------------------------------------------------------------
# GIF decoder
# --------------------------------------------------------------------------


def test_gif_roundtrip_exact():
    a = RNG.randint(0, 128, size=(23, 31)).astype(np.uint8)
    rgb = P.gif_decode(P.gif_encode(a))
    assert rgb.shape == (23, 31, 3)
    assert np.array_equal(rgb[:, :, 0], a * 2)  # ramp palette: idx i -> 2i
    assert np.array_equal(rgb[:, :, 0], rgb[:, :, 1])


def test_gif_decode_rejects_garbage_and_truncation():
    import pytest as _pytest

    with _pytest.raises(P.PngError):
        P.gif_decode(b"GIF87a" + b"\x00" * 4)
    full = P.gif_encode(np.zeros((8, 8), dtype=np.uint8))
    with _pytest.raises(Exception):
        P.gif_decode(full[: len(full) // 2])


def test_gif_through_decode_image_and_distributed(spark=None):
    from readur_spark.kernels.pixels import decode_image

    a = RNG.randint(0, 128, size=(10, 12)).astype(np.uint8)
    img = decode_image(P.gif_encode(a))
    assert img.shape == (10, 12, 3)


# --------------------------------------------------------------------------
# TIFF decoder
# --------------------------------------------------------------------------


def test_tiff_roundtrips():
    g = RNG.randint(0, 256, size=(19, 27)).astype(np.uint8)
    assert np.array_equal(P.tiff_decode(P.tiff_encode(g)), g)
    assert np.array_equal(P.tiff_decode(P.tiff_encode(g, 32773)), g)
    rgb = RNG.randint(0, 256, size=(11, 13, 3)).astype(np.uint8)
    assert np.array_equal(P.tiff_decode(P.tiff_encode(rgb)), rgb)


def test_tiff_lzw_with_predictor():
    """Hand-assemble an LZW + horizontal-predictor strip and decode it."""
    import struct as _s

    row = np.array([100, 101, 103, 106, 110], dtype=np.uint8)
    # predictor 2 stores the first sample raw, then per-sample differences
    diff = np.concatenate([row[:1], np.diff(row.astype(np.int16)).astype(np.uint8)])

    # TIFF LZW-encode `diff` with CLEAR + literals + EOI (9-bit codes)
    bits = []
    def put(code, width=9):
        bits.extend(int(b) for b in format(code, f"0{width}b"))
    put(256)
    for v in diff:
        put(int(v))
    put(257)
    while len(bits) % 8:
        bits.append(0)
    stream = bytes(
        int("".join(map(str, bits[i : i + 8])), 2) for i in range(0, len(bits), 8)
    )
    # minimal LE TIFF with predictor 2, compression 5
    entries = [
        (256, 3, 1, 5), (257, 3, 1, 1), (258, 3, 1, 8), (259, 3, 1, 5),
        (262, 3, 1, 1), (273, 4, 1, 0), (277, 3, 1, 1), (278, 3, 1, 1),
        (279, 4, 1, len(stream)), (317, 3, 1, 2),
    ]
    body = bytearray(_s.pack("<H", len(entries)))
    strip_pos = None
    for tag, dt, cnt, val in entries:
        body += _s.pack("<HHI", tag, dt, cnt)
        if tag == 273:
            strip_pos = len(body)
            body += _s.pack("<I", 0)
        elif dt == 3:
            body += _s.pack("<HH", val, 0)
        else:
            body += _s.pack("<I", val)
    body += _s.pack("<I", 0)
    pixel_off = 8 + len(body)
    _s.pack_into("<I", body, strip_pos, pixel_off)
    data = b"II*\x00" + _s.pack("<I", 8) + bytes(body) + stream
    out = P.tiff_decode(data)
    assert np.array_equal(out, row.reshape(1, 5))


def test_tiff_rejects_unsupported():
    import pytest as _pytest

    with _pytest.raises(P.PngError):
        P.tiff_decode(b"II*\x00" + b"\x00" * 20)  # IFD at offset 0 -> nonsense


def test_bmp_decode_24bit_and_gray_palette():
    import struct as _s

    rng = np.random.RandomState(2)
    h, w = 7, 5
    rgb = rng.randint(0, 256, size=(h, w, 3)).astype(np.uint8)
    row_bytes = (w * 3 + 3) & ~3
    body = bytearray()
    for y in range(h - 1, -1, -1):
        row = bytearray()
        for x in range(w):
            r, g, b = rgb[y, x]
            row += bytes([b, g, r])
        row += b"\x00" * (row_bytes - len(row))
        body += row
    hdr = b"BM" + _s.pack("<IHHI", 54 + len(body), 0, 0, 54)
    hdr += _s.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    assert np.array_equal(P.bmp_decode(hdr + bytes(body)), rgb)

    # 8-bit gray palette
    gray = rng.randint(0, 256, size=(4, 6)).astype(np.uint8)
    row_bytes = (6 + 3) & ~3
    body = bytearray()
    for y in range(3, -1, -1):
        body += bytes(gray[y]) + b"\x00" * (row_bytes - 6)
    palette = b"".join(bytes([i, i, i, 0]) for i in range(256))
    off = 54 + 1024
    hdr = b"BM" + _s.pack("<IHHI", off + len(body), 0, 0, off)
    hdr += _s.pack("<IiiHHIIiiII", 40, 6, 4, 1, 8, 0, len(body), 2835, 2835, 256, 0)
    out = P.bmp_decode(hdr + palette + bytes(body))
    assert out.ndim == 2 and np.array_equal(out, gray)

    with pytest.raises(P.PngError):
        P.bmp_decode(b"BM" + b"\x00" * 10)


def _adam7_encode(a, filter_type=0):
    """Hand-build an Adam7 interlaced PNG for decoder tests: each pass is
    an independently-filtered sub-image (filter 0 or 2 here)."""
    import struct
    import zlib

    from readur_spark.kernels.pixels import _ADAM7_PASSES, _PNG_SIG, _chunk

    if a.ndim == 2:
        channels, color_type = 1, 0
        a3 = a[:, :, None]
    else:
        channels, color_type = a.shape[2], {3: 2, 4: 6}[a.shape[2]]
        a3 = a
    h, w = a.shape[0], a.shape[1]
    raw = bytearray()
    for x0, y0, dx, dy in _ADAM7_PASSES:
        sub = a3[y0::dy, x0::dx]
        ph, pw = sub.shape[0], sub.shape[1]
        if ph == 0 or pw == 0:
            continue
        flat = sub.reshape(ph, pw * channels).astype(np.int32)
        for y in range(ph):
            raw.append(filter_type)
            if filter_type == 0:
                raw.extend(flat[y].astype(np.uint8).tobytes())
            elif filter_type == 2:  # Up
                prev = flat[y - 1] if y > 0 else np.zeros_like(flat[y])
                raw.extend(((flat[y] - prev) & 0xFF).astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 1)
    return (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(bytes(raw), 6))
        + _chunk(b"IEND", b"")
    )


def test_png_adam7_interlaced_roundtrip():
    """Adam7 decode reconstructs the exact pixels for gray and RGB, odd
    dims included (passes with empty sub-images must be skipped), and for
    per-pass Up-filtered scanlines (each pass filters independently)."""
    from readur_spark.kernels.pixels import png_decode

    for h, w in [(16, 16), (13, 11), (7, 5), (1, 1), (2, 3)]:
        gray = ((np.arange(h * w) * 37 + 11) % 251).astype(np.uint8).reshape(h, w)
        assert np.array_equal(png_decode(_adam7_encode(gray)), gray), (h, w)
        rgb = np.stack([gray, gray.T[:h, :w] if gray.T.shape == gray.shape else (gray + 7) % 251, (gray * 3) % 251], axis=2).astype(np.uint8)
        assert np.array_equal(png_decode(_adam7_encode(rgb)), rgb), (h, w)
    g = ((np.arange(9 * 10) * 5) % 256).astype(np.uint8).reshape(9, 10)
    assert np.array_equal(png_decode(_adam7_encode(g, filter_type=2)), g)


def test_png_adam7_truncated_raises():
    from readur_spark.kernels.pixels import PngError, png_decode

    g = np.zeros((8, 8), np.uint8)
    data = _adam7_encode(g)
    # re-compress a truncated raw stream so zlib still inflates cleanly
    import struct
    import zlib

    from readur_spark.kernels.pixels import _PNG_SIG, _chunk

    ihdr = struct.pack(">IIBBBBB", 8, 8, 8, 0, 0, 0, 1)
    bad = (
        _PNG_SIG
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(b"\x00" * 5, 6))
        + _chunk(b"IEND", b"")
    )
    with pytest.raises(PngError):
        png_decode(bad)
