"""MIME / format detection (reference parity).

* magic-byte detection   — /root/reference/src/mime_detection.rs:197-241
  (the ``infer`` crate's signature table, reproduced for the formats the
  engine handles)
* extension fallback     — mime_detection.rs:272-294
* server-type trust      — mime_detection.rs:300-308
* compatibility predicate— mime_detection.rs:314-332
* PDF header validation  — src/ocr/enhanced.rs:1854-1871 (scan the first
  1 KB for ``%PDF-``, tolerating leading garbage)
"""

from __future__ import annotations

#: (signature bytes, offset, mime) — order matters (first match wins).
_MAGIC: list[tuple[bytes, int, str]] = [
    (b"%PDF-", 0, "application/pdf"),
    (b"\x89PNG\r\n\x1a\n", 0, "image/png"),
    (b"\xff\xd8\xff", 0, "image/jpeg"),
    (b"GIF87a", 0, "image/gif"),
    (b"GIF89a", 0, "image/gif"),
    (b"II*\x00", 0, "image/tiff"),
    (b"MM\x00*", 0, "image/tiff"),
    (b"BM", 0, "image/bmp"),
    (b"RIFF", 0, "riff"),  # refined below (webp/wav)
    (b"PK\x03\x04", 0, "zip"),  # refined below (ooxml vs plain zip)
    (b"\xd0\xcf\x11\xe0\xa1\xb1\x1a\xe1", 0, "application/msword"),  # OLE2
    (b"{\\rtf", 0, "application/rtf"),
    (b"\x1f\x8b", 0, "application/gzip"),
]

_UNTRUSTED_SERVER_TYPES = {
    "application/octet-stream",
    "application/binary",
    "binary/octet-stream",
    "",
    "unknown",
}

_EXT_MAP = {
    "pdf": "application/pdf",
    "txt": "text/plain",
    "text": "text/plain",
    "md": "text/markdown",
    "html": "text/html",
    "htm": "text/html",
    "xml": "application/xml",
    "json": "application/json",
    "csv": "text/csv",
    "png": "image/png",
    "jpg": "image/jpeg",
    "jpeg": "image/jpeg",
    "gif": "image/gif",
    "tif": "image/tiff",
    "tiff": "image/tiff",
    "bmp": "image/bmp",
    "webp": "image/webp",
    "doc": "application/msword",
    "docx": "application/vnd.openxmlformats-officedocument.wordprocessingml.document",
    "xls": "application/vnd.ms-excel",
    "xlsx": "application/vnd.openxmlformats-officedocument.spreadsheetml.sheet",
    "pptx": "application/vnd.openxmlformats-officedocument.presentationml.presentation",
    "rtf": "application/rtf",
    "zip": "application/zip",
}

DOCX_MIME = _EXT_MAP["docx"]
XLSX_MIME = _EXT_MAP["xlsx"]
PPTX_MIME = _EXT_MAP["pptx"]


def _refine_zip(content: bytes, filename: str = "") -> str:
    """OOXML containers are ZIPs holding a format directory — the same
    containment check the ``infer`` crate does, via a real entry listing.
    A ZIP that won't even list (truncated/corrupted) falls back to the
    OOXML extension when present, so a corrupted .docx still routes to the
    DOCX extractor and reports ``file_corrupted`` (the reference's office
    tests feed corrupted archives through the office path,
    tests/integration_office_document_extraction_tests.rs:336-339)."""
    import io
    import zipfile

    try:
        names = zipfile.ZipFile(io.BytesIO(content)).namelist()
        joined = "\n".join(names[:200])
        if "word/" in joined:
            return DOCX_MIME
        if "xl/" in joined:
            return XLSX_MIME
        if "ppt/" in joined:
            return PPTX_MIME
        return "application/zip"
    except Exception:
        ext = detect_extension(filename or "")
        if ext in (DOCX_MIME, XLSX_MIME, PPTX_MIME):
            return ext
        return "application/zip"


def _refine_riff(content: bytes) -> str:
    if content[8:12] == b"WEBP":
        return "image/webp"
    if content[8:12] == b"WAVE":
        return "audio/wav"
    return "application/octet-stream"


def detect_magic(content: bytes, filename: str = "") -> str | None:
    """M1: magic-byte sniffing; None when no signature matches."""
    if not content:
        return None
    for sig, off, mime in _MAGIC:
        if content[off : off + len(sig)] == sig:
            if mime == "zip":
                return _refine_zip(content, filename)
            if mime == "riff":
                return _refine_riff(content)
            return mime
    return None


def detect_extension(filename: str) -> str | None:
    """M2: extension fallback."""
    if "." not in filename:
        return None
    return _EXT_MAP.get(filename.rsplit(".", 1)[-1].lower())


def is_trusted_server_type(mime: str | None) -> bool:
    """M3 (mime_detection.rs:300-308)."""
    return mime is not None and mime not in _UNTRUSTED_SERVER_TYPES


def are_compatible(type1: str, type2: str) -> bool:
    """M4 (mime_detection.rs:314-332): jpeg≡jpg, tiff≡tif, plain≡txt,
    else same primary type."""
    if type1 == type2:
        return True
    pairs = {
        ("image/jpeg", "image/jpg"),
        ("image/jpg", "image/jpeg"),
        ("image/tiff", "image/tif"),
        ("image/tif", "image/tiff"),
        ("text/plain", "text/txt"),
        ("text/txt", "text/plain"),
    }
    if (type1, type2) in pairs:
        return True
    p1, p2 = type1.split("/"), type2.split("/")
    return len(p1) == 2 and len(p2) == 2 and p1[0] == p2[0]


def detect_mime(content: bytes, filename: str, server_type: str | None = None) -> str:
    """Full detection ladder (mime_detection.rs:197-241): magic bytes
    (content overrides server), trusted server type, extension,
    octet-stream fallback."""
    magic = detect_magic(content, filename)
    if magic is not None:
        return magic
    if is_trusted_server_type(server_type):
        return server_type  # type: ignore[return-value]
    ext = detect_extension(filename)
    if ext is not None:
        return ext
    return "application/octet-stream"


def is_valid_pdf(header: bytes) -> bool:
    """M5: scan the first 1 KB for %PDF- (enhanced.rs:1854-1871) —
    tolerates leading null bytes / garbage before the header."""
    return b"%PDF-" in header[:1024]
