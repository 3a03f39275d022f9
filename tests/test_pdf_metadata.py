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


# ------------------------------------------------------------- XY-cut layout
def _col_lines(texts, x, y0=700, dy=14):
    return [(x, y0 - i * dy, t) for i, t in enumerate(texts)]


def test_layout_two_columns_read_column_major():
    from readur_spark.kernels.minipdf import (
        build_pdf,
        extract_text_layer,
        extract_text_layout,
    )

    left = [f"left line {i}" for i in range(5)]
    right = [f"right line {i}" for i in range(5)]
    page = _col_lines(left, x=50) + _col_lines(right, x=350)
    pdf = build_pdf([page])
    naive = extract_text_layer(pdf)[0].splitlines()
    layout = extract_text_layout(pdf)[0].splitlines()
    # naive y-sort interleaves the columns line by line...
    assert naive[0] == "left line 0 right line 0"
    # ...the XY cut reads the left column fully, then the right column
    assert layout == left + right


def test_layout_title_spans_columns_read_first():
    from readur_spark.kernels.minipdf import build_pdf, extract_text_layout

    title = [(120, 760, "A Title Spanning Both Columns")]
    left = _col_lines([f"l{i} body words" for i in range(4)], x=50)
    right = _col_lines([f"r{i} body words" for i in range(4)], x=350)
    pdf = build_pdf([title + right + left])
    lines = extract_text_layout(pdf)[0].splitlines()
    assert lines[0] == "A Title Spanning Both Columns"
    assert lines[1:] == [f"l{i} body words" for i in range(4)] + [
        f"r{i} body words" for i in range(4)
    ]


def test_layout_single_column_degenerates_to_line_order():
    from readur_spark.kernels.minipdf import (
        build_pdf,
        extract_text_layer,
        extract_text_layout,
    )

    page = _col_lines([f"only column line {i}" for i in range(8)], x=72)
    pdf = build_pdf([page])
    assert extract_text_layout(pdf) == extract_text_layer(pdf)


def test_layout_nested_blocks_and_empty_page():
    from readur_spark.kernels.minipdf import build_pdf, extract_text_layout

    # top block: two columns; bottom block (after a wide band): full width
    top_l = _col_lines(["tl one", "tl two"], x=50, y0=740)
    top_r = _col_lines(["tr one", "tr two"], x=350, y0=740)
    bottom = _col_lines(["footer paragraph after the band"], x=50, y0=300)
    pdf = build_pdf([top_l + top_r + bottom, []])
    pages = extract_text_layout(pdf)
    assert pages[0].splitlines() == [
        "tl one", "tl two", "tr one", "tr two",
        "footer paragraph after the band",
    ]
    assert pages[1] == ""
