"""Snippet + highlight generation (F10 reference parity).

Mirrors /root/reference/src/db/documents/search.rs:190-260 exactly:

* terms = whitespace-split query; case-insensitive substring matches;
* snippet window starts ``snippet_length/2`` before the match, snapped
  BACK to a word boundary (whitespace or ASCII punctuation,
  helpers.rs:80-104), and ends ``snippet_length`` after the snapped start,
  snapped FORWARD;
* highlight range is relative to the snippet;
* scan resumes after each match; generation stops at 3 snippets while
  scanning (the reference checks ``snippets.len() >= 3`` inside the term
  loop — a global cap, quirky but reproduced) and the final list is
  truncated to 5.

Byte offsets follow the reference (Rust ``find``/slicing on UTF-8 bytes);
this implementation works on byte positions too so offsets agree on
multi-byte text.
"""

from __future__ import annotations


def _is_word_boundary(b: int) -> bool:
    # char.is_whitespace() || char.is_ascii_punctuation() — for ASCII bytes;
    # multi-byte chars are never boundaries (faithful: is_ascii_punctuation
    # is false for them, unicode whitespace beyond ASCII is rare in fixtures)
    c = chr(b)
    return c.isspace() or (33 <= b <= 47 or 58 <= b <= 64 or 91 <= b <= 96 or 123 <= b <= 126)


def _find_word_boundary(raw: bytes, position: int, forward: bool) -> int:
    n = len(raw)
    if n == 0:
        return 0
    pos = min(position, n - 1)
    if forward:
        for i in range(pos, n):
            if _is_word_boundary(raw[i]):
                return i
        return n
    for i in range(pos, -1, -1):
        if _is_word_boundary(raw[i]):
            return i
    return 0


def generate_snippets(text: str, query: str, snippet_length: int = 200) -> list[dict]:
    """Returns [{text, start_offset, end_offset, highlight_start,
    highlight_end}] following the reference algorithm."""
    snippets: list[dict] = []
    if not text:
        return snippets
    raw = text.encode("utf-8", errors="surrogatepass")
    raw_lower = text.lower().encode("utf-8", errors="surrogatepass")
    for term in query.split():
        term_raw = term.lower().encode("utf-8", errors="surrogatepass")
        start_pos = 0
        while True:
            match_pos = raw_lower.find(term_raw, start_pos)
            if match_pos == -1:
                break
            if match_pos >= snippet_length // 2:
                snip_start = _find_word_boundary(raw, match_pos - snippet_length // 2, False)
            else:
                snip_start = 0
            desired_end = snip_start + snippet_length
            snip_end = (
                _find_word_boundary(raw, desired_end, True)
                if desired_end < len(raw)
                else len(raw)
            )
            snippets.append(
                {
                    "text": raw[snip_start:snip_end].decode("utf-8", errors="replace"),
                    "start_offset": snip_start,
                    "end_offset": snip_end,
                    "highlight_start": match_pos - snip_start,
                    "highlight_end": match_pos - snip_start + len(term.encode("utf-8")),
                }
            )
            start_pos = match_pos + len(term_raw)
            if len(snippets) >= 3:
                break
    return snippets[:5]
