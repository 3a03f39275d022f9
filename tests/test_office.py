"""DOCX/XLSX extraction golden tests, mirroring the reference suite
(/root/reference/tests/integration_office_document_extraction_tests.rs)."""

from fixtures import (
    build_docx,
    build_xlsx,
    build_zip_bomb_entries,
    build_zip_traversal,
    p,
)

from readur_spark.kernels.office import (
    extract_docx,
    extract_xlsx,
    validate_zip_entry_name,
)


class TestDocx:
    def test_simple_paragraphs(self):
        # office tests :157-162 — content contained, paragraphs separated
        text, err = extract_docx(build_docx(p("Hello World") + p("Second paragraph")))
        assert err is None
        assert "Hello World" in text and "Second paragraph" in text
        # end-of-paragraph → \n\n, then clean collapses to exactly two
        assert text == "Hello World\n\nSecond paragraph"

    def test_tab_br_cr_mapping(self):
        body = (
            "<w:p><w:r><w:t>A</w:t><w:tab/><w:t>B</w:t><w:br/><w:t>C</w:t>"
            "<w:cr/><w:t>D</w:t></w:r></w:p>"
        )
        text, err = extract_docx(build_docx(body))
        assert err is None
        # raw: "A\tB\nC\rD\n\n"; clean: tab→space, \r preserved
        assert text == "A B\nC\rD"

    def test_table_rows_and_cells(self):
        body = (
            "<w:tbl><w:tr><w:tc><w:p><w:r><w:t>Cell1</w:t></w:r></w:p></w:tc>"
            "<w:tc><w:p><w:r><w:t>Cell2</w:t></w:r></w:p></w:tc></w:tr></w:tbl>"
        )
        text, err = extract_docx(build_docx(body))
        assert err is None
        assert "Cell1" in text and "Cell2" in text

    def test_structure_preservation(self):
        # office tests :265-273 — Line1/Line2/Tabbed lines all present
        body = p("Line1") + p("Line2") + p("Tabbed\tcontent") + p("Indented line")
        text, err = extract_docx(build_docx(body))
        assert err is None
        for needle in ["Line1", "Line2", "Tabbed", "content", "Indented line"]:
            assert needle in text

    def test_null_bytes_absent(self):
        # office tests :228-234
        text, err = extract_docx(build_docx(p("with&#0;null")))
        assert err is None or "\0" not in (text or "")

    def test_empty_document_error(self):
        # office tests :304-306 — "No text content found"
        text, err = extract_docx(build_docx(""))
        assert text is None and "No text content" in err

    def test_corrupted_zip_error(self):
        text, err = extract_docx(b"this is not a zip file at all")
        assert text is None and "corrupted" in err

    def test_missing_document_xml(self):
        import io
        import zipfile

        buf = io.BytesIO()
        with zipfile.ZipFile(buf, "w") as z:
            z.writestr("other.xml", "<x/>")
        text, err = extract_docx(buf.getvalue())
        assert text is None and "word/document.xml" in err

    def test_camelcase_cleaning_applied(self):
        text, err = extract_docx(build_docx(p("ExecutiveSummary")))
        assert err is None
        assert text == "Executive Summary"

    def test_w_space_count(self):
        body = '<w:p><w:r><w:t>A</w:t><w:space w:count="4"/><w:t>B</w:t></w:r></w:p>'
        text, err = extract_docx(build_docx(body))
        assert err is None
        # 4 spaces → "  " (3+→2) → " " (mixed collapse)
        assert text == "A B"


class TestXlsx:
    def test_shared_strings(self):
        # office tests :193-197 — text.trim() == expected
        data = build_xlsx(["Alpha", "Beta"], [("s", "0"), ("s", "1")])
        text, err = extract_xlsx(data)
        assert err is None
        assert text.strip() == "Alpha Beta"

    def test_inline_values(self):
        data = build_xlsx(["X"], [("s", "0"), ("", "42"), ("", "3.14")])
        text, err = extract_xlsx(data)
        assert err is None
        assert text.strip() == "X 42 3.14"

    def test_multiple_sheets(self):
        data = build_xlsx(["S"], [("s", "0")], sheets=2)
        text, err = extract_xlsx(data)
        assert err is None
        assert text.strip() == "S S"

    def test_bad_shared_index_skipped(self):
        data = build_xlsx(["Only"], [("s", "99"), ("s", "0")])
        text, err = extract_xlsx(data)
        assert err is None
        assert text.strip() == "Only"

    def test_empty_error(self):
        data = build_xlsx([], [])
        text, err = extract_xlsx(data)
        assert text is None and "No text content" in err

    def test_corrupted(self):
        text, err = extract_xlsx(b"\x00\x01\x02 not a zip")
        assert text is None and "corrupted" in err


class TestZipGuards:
    def test_too_many_entries(self):
        text, err = extract_docx(build_zip_bomb_entries(1001))
        assert text is None and "too many entries" in err

    def test_traversal_entry_rejected(self):
        text, err = extract_docx(build_zip_traversal())
        assert text is None and "traversal" in err

    def test_entry_name_rules(self):
        # xml_extractor.rs:519-563 matrix
        assert validate_zip_entry_name("a" * 256) is not None
        assert validate_zip_entry_name("../x") is not None
        assert validate_zip_entry_name("/abs") is not None
        assert validate_zip_entry_name("C:stuff") is not None
        assert validate_zip_entry_name("bad<name>") is not None
        assert validate_zip_entry_name("word/document.xml") is None
