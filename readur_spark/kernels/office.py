"""DOCX/XLSX extraction (reference parity) over stdlib zipfile + ElementTree.

Reproduces readur's XML-event→string tables verbatim:

* DOCX — /root/reference/src/ocr/xml_extractor.rs:689-865. Text lives in
  ``w:t``; empty elements map ``w:tab``→TAB, ``w:br``→LF, ``w:cr``→CR,
  ``w:space[w:count]``→spaces; element *ends* map ``w:p``→"\\n\\n",
  ``w:tr``→"\\n", ``w:tc``→TAB, ``w:sectPr``/``w:lastRenderedPageBreak``→
  "\\n\\n". Output then goes through clean_extracted_text + null strip, and
  the office word counter.
* XLSX — xml_extractor.rs:868-1066. sharedStrings ``t`` elements; worksheet
  names resolved from workbook.xml ``sheet[r:id=rIdN]``→``sheetN.xml`` with
  a 1..50 sequential fallback (:426-496); cells ``c[@t="s"]`` look up the
  shared string, other ``v`` values are taken raw; all joined with single
  spaces. Null strip; NO clean_extracted_text (the reference only cleans
  DOCX).
* ZIP-bomb guards — xml_extractor.rs:164-273,519-613: ≤1000 entries,
  ≤10 MB per XML, ≤100 MB total decompressed, ratio ≤1000:1, entry-name
  validation (length ≤255, no '..', no absolute paths, no drive letters,
  no ``< > | * ?``).

Errors are returned as ``(None, message)`` so the Spark operator can route
them to the dead-letter path with the reference's failure classifier.
"""

from __future__ import annotations

import io
import zipfile
import xml.etree.ElementTree as ET

from readur_spark.kernels.textnorm import clean_extracted_text, remove_null_bytes

MAX_ZIP_ENTRIES = 1000
MAX_XML_SIZE = 10 * 1024 * 1024
MAX_TOTAL_DECOMPRESSED = 100 * 1024 * 1024
MAX_COMPRESSION_RATIO = 1000.0
MAX_ENTRY_NAME_LENGTH = 255
MAX_WORKSHEETS_TO_CHECK = 50

_SUSPICIOUS = set("<>|*?")


def validate_zip_entry_name(name: str) -> str | None:
    """Entry-name validation (xml_extractor.rs:519-563). Returns an error
    message or None."""
    if len(name) > MAX_ENTRY_NAME_LENGTH:
        return f"ZIP entry name too long ({len(name)})"
    if ".." in name:
        return f"ZIP entry contains directory traversal sequence '..': '{name}'"
    if name.startswith("/") or name.startswith("\\"):
        return f"ZIP entry contains absolute path: '{name}'"
    if len(name) >= 2 and name[1] == ":":
        return f"ZIP entry contains Windows drive letter: '{name}'"
    if any(c in _SUSPICIOUS for c in name):
        return f"ZIP entry contains suspicious characters: '{name}'"
    return None


class _BombGuard:
    """Running decompressed-size + ratio accounting
    (ExtractionContext, xml_extractor.rs:164-245)."""

    def __init__(self, compressed_size: int):
        self.total = 0
        self.compressed = compressed_size

    def add(self, n: int) -> str | None:
        self.total += n
        if self.total > MAX_TOTAL_DECOMPRESSED:
            return "ZIP bomb protection: decompressed size limit exceeded"
        if self.compressed > 0:
            ratio = self.total / self.compressed
            if ratio > MAX_COMPRESSION_RATIO:
                return (
                    f"Document compression ratio is suspiciously high: "
                    f"{ratio:.1f}:1 (limit: {MAX_COMPRESSION_RATIO:.1f}:1)"
                )
        return None


def _open_archive(data: bytes) -> tuple[zipfile.ZipFile | None, str | None]:
    try:
        z = zipfile.ZipFile(io.BytesIO(data))
    except zipfile.BadZipFile:
        return None, "corrupted internal structure: not a valid ZIP archive"
    infos = z.infolist()
    if len(infos) > MAX_ZIP_ENTRIES:
        return None, f"ZIP archive contains too many entries ({len(infos)})"
    for info in infos:
        err = validate_zip_entry_name(info.filename)
        if err:
            return None, err
    return z, None


def _read_entry(z: zipfile.ZipFile, name: str, guard: _BombGuard) -> tuple[bytes | None, str | None]:
    """Size-limited streaming read (read_zip_entry_safely,
    xml_extractor.rs:566-613)."""
    try:
        f = z.open(name)
    except KeyError:
        return None, f"missing {name} - required component not found"
    except zipfile.BadZipFile:
        return None, "corrupted internal structure: bad ZIP entry"
    chunks = []
    total = 0
    while True:
        chunk = f.read(8192)
        if not chunk:
            break
        total += len(chunk)
        if total > MAX_XML_SIZE:
            return None, "ZIP entry content exceeds maximum allowed size"
        err = guard.add(len(chunk))
        if err:
            return None, err
        chunks.append(chunk)
    return b"".join(chunks), None


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def extract_docx(data: bytes) -> tuple[str | None, str | None]:
    """DOCX → text (xml_extractor.rs:689-865). Returns (text, error)."""
    z, err = _open_archive(data)
    if err:
        return None, err
    guard = _BombGuard(len(data))
    xml, err = _read_entry(z, "word/document.xml", guard)
    if err:
        return None, err

    parts: list[str] = []
    in_text = False
    try:
        for event, elem in ET.iterparse(io.BytesIO(xml), events=("start", "end")):
            name = _local(elem.tag)
            if event == "start":
                if name == "t":
                    in_text = True
                elif name == "tab":
                    parts.append("\t")
                elif name == "br":
                    parts.append("\n")
                elif name == "cr":
                    parts.append("\r")
                elif name == "space":
                    count = 1
                    for k, v in elem.attrib.items():
                        if _local(k) == "count":
                            try:
                                count = int(v)
                            except ValueError:
                                count = 1
                    parts.append(" " * count)
            else:  # end
                if name == "t":
                    if in_text and elem.text:
                        parts.append(elem.text)
                    in_text = False
                elif name == "p":
                    parts.append("\n\n")
                elif name == "tr":
                    parts.append("\n")
                elif name == "tc":
                    parts.append("\t")
                elif name in ("sectPr", "lastRenderedPageBreak"):
                    parts.append("\n\n")
                elem.clear()
    except ET.ParseError as e:
        return None, f"corrupted internal structure: XML parsing error - {e}"

    raw = "".join(parts)
    cleaned = clean_extracted_text(raw)
    if cleaned.strip() == "":
        return None, "No text content found in document"
    return remove_null_bytes(cleaned), None


def _worksheet_names(z: zipfile.ZipFile, guard: _BombGuard) -> list[str]:
    """Sheet discovery from workbook.xml rId refs, sequential fallback
    (xml_extractor.rs:426-496)."""
    fallback = [f"sheet{i}.xml" for i in range(1, MAX_WORKSHEETS_TO_CHECK + 1)]
    if "xl/workbook.xml" not in z.namelist():
        return fallback
    xml, err = _read_entry(z, "xl/workbook.xml", guard)
    if err:
        return fallback
    names: list[str] = []
    try:
        for _, elem in ET.iterparse(io.BytesIO(xml), events=("end",)):
            if _local(elem.tag) == "sheet":
                for k, v in elem.attrib.items():
                    if _local(k) == "id" and v.startswith("rId"):
                        names.append(f"sheet{v[3:]}.xml")
            elem.clear()
    except ET.ParseError:
        return fallback
    return names or fallback


def extract_xlsx(data: bytes) -> tuple[str | None, str | None]:
    """XLSX → text (xml_extractor.rs:868-1066). Returns (text, error)."""
    z, err = _open_archive(data)
    if err:
        return None, err
    guard = _BombGuard(len(data))

    shared: list[str] = []
    if "xl/sharedStrings.xml" in z.namelist():
        xml, err = _read_entry(z, "xl/sharedStrings.xml", guard)
        if err:
            return None, err
        try:
            # reference semantics: each <t> contributes one shared string
            for _, elem in ET.iterparse(io.BytesIO(xml), events=("end",)):
                if _local(elem.tag) == "t":
                    shared.append(elem.text or "")
                elem.clear()
        except ET.ParseError as e:
            return None, f"corrupted internal structure: shared strings XML parsing error - {e}"

    all_text: list[str] = []
    n_sheets = 0
    entries = set(z.namelist())
    for sheet in _worksheet_names(z, guard):
        path = f"xl/worksheets/{sheet}"
        if path not in entries:
            continue
        n_sheets += 1
        xml, err = _read_entry(z, path, guard)
        if err:
            return None, err
        cell_type = ""
        try:
            for event, elem in ET.iterparse(io.BytesIO(xml), events=("start", "end")):
                name = _local(elem.tag)
                if event == "start":
                    if name == "c":
                        cell_type = elem.attrib.get("t", "")
                elif event == "end" and name == "v":
                    value = elem.text or ""
                    if cell_type == "s":
                        try:
                            idx = int(value)
                        except ValueError:
                            idx = -1
                        if 0 <= idx < len(shared):
                            all_text.append(shared[idx])
                    else:
                        all_text.append(value)
                    elem.clear()
        except ET.ParseError as e:
            return None, f"corrupted internal structure: worksheet XML parsing error - {e}"

    if n_sheets == 0:
        return None, "corrupted internal structure: no worksheets found"
    raw = " ".join(all_text)
    if raw.strip() == "":
        return None, "No text content found in document"
    return remove_null_bytes(raw), None
