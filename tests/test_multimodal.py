"""Multimodal plumbing: header parsing, EXIF table, resize math, stubs."""

import struct

import pytest

from readur_spark.kernels.media_meta import (
    EXIF_TRANSFORMS,
    orientation_transform,
    parse_exif_orientation,
    parse_image_meta,
    smart_resize_dims,
)


def make_png(w: int, h: int) -> bytes:
    return (
        b"\x89PNG\r\n\x1a\n" + struct.pack(">I", 13) + b"IHDR"
        + struct.pack(">II", w, h) + b"\x08\x00\x00\x00\x00" + b"\x00" * 8
    )


def make_gif(w: int, h: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", w, h) + b"\x00" * 10


def make_jpeg(w: int, h: int, exif_orientation: int | None = None) -> bytes:
    out = b"\xff\xd8"
    if exif_orientation is not None:
        tiff = (
            b"II*\x00" + struct.pack("<I", 8)
            + struct.pack("<H", 1)
            + struct.pack("<HHI", 0x0112, 3, 1) + struct.pack("<HH", exif_orientation, 0)
            + struct.pack("<I", 0)
        )
        app1 = b"Exif\x00\x00" + tiff
        out += b"\xff\xe1" + struct.pack(">H", len(app1) + 2) + app1
    sof = b"\x08" + struct.pack(">HH", h, w) + b"\x03" + b"\x00" * 9
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    out += b"\xff\xda\x00\x02" + b"\x00" * 16 + b"\xff\xd9"
    return out


class TestHeaderParsing:
    def test_png(self):
        m = parse_image_meta(make_png(640, 480))
        assert m == {"format": "png", "width": 640, "height": 480}

    def test_gif(self):
        m = parse_image_meta(make_gif(100, 50))
        assert m == {"format": "gif", "width": 100, "height": 50}

    def test_jpeg_sof(self):
        m = parse_image_meta(make_jpeg(1920, 1080))
        assert m == {"format": "jpeg", "width": 1920, "height": 1080}

    def test_not_an_image(self):
        assert parse_image_meta(b"plain text, definitely not pixels") is None


class TestExif:
    def test_orientation_read(self):
        assert parse_exif_orientation(make_jpeg(10, 10, exif_orientation=6)) == 6

    def test_orientation_default(self):
        assert parse_exif_orientation(make_jpeg(10, 10)) == 1

    @pytest.mark.parametrize("o", range(1, 9))
    def test_all_eight_cases(self, o):
        # document_ingestion.rs:389-399 matrix: 5-8 swap dimensions
        t = orientation_transform(o, 400, 300)
        if o in (5, 6, 7, 8):
            assert (t["width"], t["height"]) == (300, 400)
        else:
            assert (t["width"], t["height"]) == (400, 300)
        assert t["ops"] == EXIF_TRANSFORMS[o][0]


class TestSmartResize:
    def test_downscale_long_side(self):
        w, h, op = smart_resize_dims(4096, 2048)
        assert (w, h, op) == (2048, 1024, "downscale")

    def test_upscale_small(self):
        w, h, op = smart_resize_dims(200, 400)
        assert op == "upscale" and w == 600 and h == 1200

    def test_no_change(self):
        assert smart_resize_dims(800, 600) == (800, 600, None)


def test_distributed_image_metadata(spark):
    from readur_spark.operators.multimodal import decode_images, image_metadata

    rows = [
        ("m1", bytearray(make_png(3000, 1500))),
        ("m2", bytearray(make_jpeg(640, 480, exif_orientation=6))),
        ("m3", bytearray(b"not an image")),
    ]
    df = spark.createDataFrame(rows, "doc_id string, content binary")
    got = {r["doc_id"]: r for r in image_metadata(df).collect()}
    assert got["m1"]["format"] == "png"
    assert got["m1"]["resize_op"] == "downscale"
    assert (got["m1"]["target_width"], got["m1"]["target_height"]) == (2048, 1024)
    assert got["m2"]["exif_orientation"] == 6
    assert got["m2"]["rotate_ops"] == ["rotate90"]
    # rotate90 swaps → 480x640, min dim 480 ≥ 300 → no resize
    assert (got["m2"]["target_width"], got["m2"]["target_height"]) == (480, 640)
    assert got["m3"]["format"] is None

    dec = {r["doc_id"]: r for r in decode_images(df).collect()}
    assert dec["m1"]["decode_stub"] is True
    assert dec["m1"]["channels"] == 1
    assert len(dec["m1"]["pixels"]) == 65536  # capped fake buffer
    # determinism of the stub
    dec2 = {r["doc_id"]: r for r in decode_images(df).collect()}
    assert bytes(dec["m2"]["pixels"]) == bytes(dec2["m2"]["pixels"])


def test_frame_sampling(spark):
    from readur_spark.operators.multimodal import sample_frames

    df = spark.createDataFrame(
        [("v1", "media://video/abc"), ("v2", "media://video/def")],
        "doc_id string, media_ref string",
    )
    empty = spark.createDataFrame(
        [("e1", ""), ("e2", None)], "doc_id string, media_ref string"
    )
    assert sample_frames(empty).count() == 0

    frames = sample_frames(df, every_n=30, max_frames=4).collect()
    assert all(f["frame_ref"].endswith(f"#frame={f['frame_no']}") for f in frames)
    by_doc = {}
    for f in frames:
        by_doc.setdefault(f["doc_id"], []).append(f["frame_no"])
    for nos in by_doc.values():
        assert nos == sorted(nos) and len(nos) <= 4
