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


def test_layout_three_columns_read_left_to_right():
    from readur_spark.kernels.minipdf import build_pdf, extract_text_layout

    cols = [
        [f"c{j}line{i}" for i in range(4)] for j in range(3)
    ]
    page = (
        _col_lines(cols[0], x=50)
        + _col_lines(cols[1], x=250)
        + _col_lines(cols[2], x=450)
    )
    pdf = build_pdf([page])
    lines = extract_text_layout(pdf)[0].splitlines()
    assert lines == cols[0] + cols[1] + cols[2]


def test_layout_nested_bands_of_unequal_columns():
    # top band: THREE columns; middle band: TWO columns; bottom: full
    # width — the recursive case a one-shot split cannot represent.
    from readur_spark.kernels.minipdf import build_pdf, extract_text_layout

    t = [[f"t{j}l{i}" for i in range(3)] for j in range(3)]
    m = [[f"m{j}l{i}" for i in range(3)] for j in range(2)]
    page = (
        _col_lines(t[0], x=50, y0=740)
        + _col_lines(t[1], x=250, y0=740)
        + _col_lines(t[2], x=450, y0=740)
        + _col_lines(m[0], x=50, y0=600)
        + _col_lines(m[1], x=350, y0=600)
        + _col_lines(["footer across the whole page width below"], x=50, y0=440)
    )
    pdf = build_pdf([page])
    lines = extract_text_layout(pdf)[0].splitlines()
    assert lines == (
        t[0] + t[1] + t[2] + m[0] + m[1]
        + ["footer across the whole page width below"]
    )


def test_layout_fuzz_random_nested_regions():
    """Randomized band/column trees with a known reading order: bands
    stack with ≥20pt gaps, columns sit side by side with ≥30pt gutters
    and hold line-dense leaves (aligned baselines, so sibling columns
    never share a spurious band gap). The XY cut must reproduce the
    generation order exactly — 40 layouts, depth ≤ 3, 2-3 way splits."""
    import random

    from readur_spark.kernels.minipdf import build_pdf, extract_text_layout

    CHAR_W, LINE_H, DY = 6.0, 10.0, 12.0

    def leaf(rng, x0, x1, y0, y1, out, counter):
        w = x1 - x0
        n_chars = max(4, int((w - 6) / CHAR_W))
        n_lines = max(1, int((y1 - y0 - LINE_H) // DY) + 1)
        n_lines = min(n_lines, rng.randint(1, 6))
        for i in range(n_lines):
            tag = f"t{counter[0]:03d}"
            counter[0] += 1
            text = (tag + "x" * n_chars)[:n_chars]
            out.append((x0, y1 - LINE_H - i * DY, text))

    def gen(rng, x0, x1, y0, y1, depth, out, counter, in_column):
        w, h = x1 - x0, y1 - y0
        kinds = ["leaf"]
        if depth > 0 and not in_column:
            if h >= 120:
                kinds.append("band")
            if w >= 200:
                kinds.append("col")
        kind = rng.choice(kinds)
        if kind == "leaf":
            leaf(rng, x0, x1, y0, y1, out, counter)
        elif kind == "band":
            k = rng.choice([2, 3]) if h >= 220 else 2
            gap = rng.uniform(22, 40)
            usable = h - gap * (k - 1)
            cuts = sorted(rng.uniform(0.25, 0.75) for _ in range(k - 1))
            heights = []
            prev = 0.0
            for c in cuts + [1.0]:
                heights.append(max(30.0, (c - prev) * usable))
                prev = c
            top = y1
            for hh in heights:  # top band first = reading order
                gen(rng, x0, x1, top - hh, top, depth - 1, out, counter, False)
                top -= hh + gap
        else:  # columns: children are dense aligned leaves only
            k = rng.choice([2, 3]) if w >= 360 else 2
            gut = rng.uniform(34, 60)
            cw = (w - gut * (k - 1)) / k
            left = x0
            for _ in range(k):
                gen(rng, left, left + cw, y0, y1, 0, out, counter, True)
                left += cw + gut

    rng = random.Random(616)
    for trial in range(40):
        out: list = []
        gen(rng, 40, 572, 80, 760, 3, out, [0], False)
        expected = [t for _, _, t in out]
        shuffled = out[:]
        rng.shuffle(shuffled)
        pdf = build_pdf([shuffled])
        lines = extract_text_layout(pdf)[0].splitlines()
        assert lines == expected, (trial, lines[:6], expected[:6])
