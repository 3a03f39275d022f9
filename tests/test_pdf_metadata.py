"""P12 PDF metadata extraction (metadata_extraction.rs:84-136 parity)."""

from readur_spark.kernels.minipdf import build_pdf, pdf_metadata


def test_basic_fields():
    pdf = build_pdf([[(72, 720, "one")], [(72, 720, "two")]])
    m = pdf_metadata(pdf)
    assert m["pdf_version"] == "1.4"
    assert m["page_count"] == 2
    assert m["encrypted"] is False
    assert m["has_fonts"] is True
    assert m["has_images"] is False
    assert m["creation_date"] is None


def test_image_flag():
    pdf = build_pdf([[(72, 720, "x")]], with_image=True)
    assert pdf_metadata(pdf)["has_images"] is True


def test_creation_date_and_encrypt_scan():
    pdf = build_pdf([[(72, 720, "x")]])
    doctored = pdf.replace(
        b"endobj\n2 0 obj",
        b"endobj\n9 0 obj\n<< /CreationDate (D:20240101120000Z) /Encrypt 7 0 R >>\nendobj\n2 0 obj",
        1,
    )
    m = pdf_metadata(doctored)
    assert m["creation_date"] == "D:20240101120000Z"
    assert m["encrypted"] is True
