"""Fixture builders: in-memory DOCX/XLSX/PDF files for extraction tests
(the analog of the reference's create_test_pdfs.py / test_files corpus)."""

from __future__ import annotations

import io
import zipfile

W_NS = "http://schemas.openxmlformats.org/wordprocessingml/2006/main"
S_NS = "http://schemas.openxmlformats.org/spreadsheetml/2006/main"
R_NS = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"


def build_docx(body_xml: str) -> bytes:
    """Minimal DOCX: just word/document.xml (all the extractor reads)."""
    doc = (
        f'<?xml version="1.0" encoding="UTF-8" standalone="yes"?>'
        f'<w:document xmlns:w="{W_NS}"><w:body>{body_xml}</w:body></w:document>'
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("word/document.xml", doc)
    return buf.getvalue()


def p(text: str) -> str:
    return f"<w:p><w:r><w:t>{text}</w:t></w:r></w:p>"


def build_xlsx(shared: list[str], cells: list[tuple[str, str]], sheets: int = 1) -> bytes:
    """Minimal XLSX: sharedStrings + workbook + sheet1..N with given cells.
    ``cells``: list of (type, value) where type 's' means shared-string
    index, '' means inline numeric value."""
    sst = (
        f'<sst xmlns="{S_NS}" count="{len(shared)}" uniqueCount="{len(shared)}">'
        + "".join(f"<si><t>{s}</t></si>" for s in shared)
        + "</sst>"
    )
    rows = "".join(
        f'<row r="{i + 1}"><c r="A{i + 1}"{" t=" + chr(34) + t + chr(34) if t else ""}>'
        f"<v>{v}</v></c></row>"
        for i, (t, v) in enumerate(cells)
    )
    sheet = f'<worksheet xmlns="{S_NS}"><sheetData>{rows}</sheetData></worksheet>'
    wb_sheets = "".join(
        f'<sheet name="S{i}" sheetId="{i}" r:id="rId{i}"/>' for i in range(1, sheets + 1)
    )
    wb = (
        f'<workbook xmlns="{S_NS}" xmlns:r="{R_NS}">'
        f"<sheets>{wb_sheets}</sheets></workbook>"
    )
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w", zipfile.ZIP_DEFLATED) as z:
        z.writestr("[Content_Types].xml", "<Types/>")
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/sharedStrings.xml", sst)
        for i in range(1, sheets + 1):
            z.writestr(f"xl/worksheets/sheet{i}.xml", sheet)
    return buf.getvalue()


def build_zip_bomb_entries(n: int) -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        for i in range(n):
            z.writestr(f"e{i}.txt", "x")
    return buf.getvalue()


def build_zip_traversal() -> bytes:
    buf = io.BytesIO()
    with zipfile.ZipFile(buf, "w") as z:
        z.writestr("../evil.txt", "x")
        z.writestr("word/document.xml", "<w:document/>")
    return buf.getvalue()
