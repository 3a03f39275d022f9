"""Text normalization and analysis as pure Catalyst Column expressions.

Everything here compiles to JVM-side generated code (whole-stage codegen):
regexp chains, counts, ratios. These are the hot-path versions of the
normalization kernels — byte-identical semantics to the Python kernels for
the operations they cover, but with zero Python in the plan, so they scale
to 100 TB scans untouched.

* ``normalize_text_col``  — readur's clean_extracted_text regex chain
  (/root/reference/src/ocr/xml_extractor.rs:1169-1197) as 6 chained
  ``regexp_replace`` (Catalyst folds them into one codegen stage).
* ``strip_null_bytes_col`` — xml_extractor.rs:500-516.
* ``word_count_col``       — whitespace word count (the fast path of
  enhanced.rs:1713-1716).
* language ID / quality scoring / token counting / fingerprinting — the
  training-data-pipeline text analysis suite, built on the ``documents``
  table.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F


def strip_null_bytes_col(c: Column) -> Column:
    return F.regexp_replace(c, "\x00", "")


def repair_hyphenation_col(c: Column) -> Column:
    """North-rule hyphenation repair: join ``word-\\nword``."""
    return F.regexp_replace(c, r"(\w)-\n(\w)", r"$1$2")


def normalize_text_col(c: Column) -> Column:
    """readur's clean_extracted_text as a Catalyst chain — same pass order
    as the Python kernel (camelCase boundary, space/newline collapse, mixed
    whitespace, trim)."""
    c = F.regexp_replace(c, "([a-z])([A-Z])", r"$1 $2")
    c = F.regexp_replace(c, " {3,}", "  ")
    c = F.regexp_replace(c, r"\n{3,}", "\n\n")
    c = F.regexp_replace(c, r" +\n", "\n")
    c = F.regexp_replace(c, r"\n +", "\n")
    c = F.regexp_replace(c, r"[ \t]+", " ")
    return F.trim(c)


def word_count_col(c: Column) -> Column:
    """Whitespace word count (split_whitespace semantics: leading/trailing
    runs produce no empty tokens)."""
    trimmed = F.trim(c)
    return F.when(trimmed == "", F.lit(0)).otherwise(
        F.size(F.split(trimmed, r"\s+"))
    )


def token_count_col(c: Column) -> Column:
    """BPE-ish token count: runs of letters, runs of digits, or single
    non-alnum-non-space chars — the standard pre-tokenizer regex shape."""
    return F.regexp_count(c, F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))


def alnum_ratio_col(c: Column) -> Column:
    """Alphanumeric chars / total chars (ASCII classes — engine-portable)."""
    total = F.length(c)
    alnum = F.length(F.regexp_replace(c, "[^A-Za-z0-9]", ""))
    return F.when(total == 0, F.lit(0.0)).otherwise(alnum / total)


#: Stopword markers for the n-gram language-ID heuristic. Deliberately tiny
#: and deterministic: these are high-frequency function words; the same
#: lists are embedded in the DuckDB oracle SQL.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "a"],
    "es": ["el", "la", "de", "que", "un"],
    "fr": ["le", "la", "les", "et", "une"],
    "de": ["der", "die", "und", "das", "ein"],
}


def _marker_hits(c: Column, words: list[str]) -> Column:
    pat = r"\b(" + "|".join(words) + r")\b"
    return F.regexp_count(F.lower(c), F.lit(pat))


def lang_id_col(c: Column) -> Column:
    """Stopword-hit language ID with deterministic tie-break (en > es > fr >
    de > und). A text with zero marker hits is 'und' (undetermined)."""
    hits = {lang: _marker_hits(c, ws) for lang, ws in LANG_MARKERS.items()}
    best = F.greatest(*hits.values())
    return (
        F.when(best == 0, F.lit("und"))
        .when(hits["en"] == best, F.lit("en"))
        .when(hits["es"] == best, F.lit("es"))
        .when(hits["fr"] == best, F.lit("fr"))
        .otherwise(F.lit("de"))
    )


def quality_score_col(c: Column) -> Column:
    """Document quality score in [0,1]: mean of three bounded signals —
    length (saturating at 1000 chars), alnum ratio, and whitespace balance
    (words per 6 chars, capped). Deterministic, engine-portable arithmetic."""
    length_sig = F.least(F.length(c) / F.lit(1000.0), F.lit(1.0))
    alnum_sig = alnum_ratio_col(c)
    wpc = word_count_col(c) * F.lit(6.0) / F.greatest(F.length(c), F.lit(1))
    ws_sig = F.least(wpc, F.lit(1.0))
    return F.round((length_sig + alnum_sig + ws_sig) / 3.0, 6)


def text_metadata_cols(c: Column) -> list[Column]:
    """O9: text metadata (metadata_extraction.rs:139-178) as native columns:
    character/word/line counts, unicode flag, xml/json/html format sniff,
    naive English detection (substring hits of 12 common words > 5% of the
    word count — reproduced verbatim, including that ``matches`` counts
    substrings, not whole words)."""
    char_count = F.length(c)
    word_count = word_count_col(c)
    # Rust str::lines(): split on \n, trailing empty line not counted
    line_count = F.when(c == "", F.lit(0)).otherwise(
        F.size(F.split(F.regexp_replace(c, r"\n$", ""), r"\n"))
    )
    contains_unicode = c.rlike(r"[^\x00-\x7F]")
    stripped = F.ltrim(c)
    text_format = (
        F.when(stripped.startswith("<?xml"), F.lit("xml"))
        .when(
            stripped.startswith("{") | stripped.startswith("["), F.lit("json")
        )
        .when(
            c.contains("<!DOCTYPE html") | c.contains("<html"), F.lit("html")
        )
        .otherwise(F.lit(None).cast("string"))
    )
    english_words = [
        "the", "and", "or", "but", "in", "on", "at", "to", "for", "of", "with", "by",
    ]
    hits = None
    for w in english_words:
        h = F.regexp_count(F.lower(c), F.lit(re.escape(w)))
        hits = h if hits is None else hits + h
    # Rust `word_count / 20` is integer division — floor to match exactly
    likely_english = hits > F.floor(word_count / F.lit(20))
    return [
        char_count.cast("long").alias("character_count"),
        word_count.cast("long").alias("word_count"),
        line_count.cast("long").alias("line_count"),
        contains_unicode.alias("contains_unicode"),
        text_format.alias("text_format"),
        likely_english.alias("likely_english"),
    ]


def fingerprint_bytes_col(c: Column) -> Column:
    """D1 exact parity: lowercase-hex SHA-256 of the RAW bytes —
    the reference's calculate_file_hash
    (/root/reference/src/ingestion/document_ingestion.rs:342-347). Use on
    the binary ingest path (content column); :func:`fingerprint_col` below
    is the normalized-text variant for post-extraction dedup."""
    return F.sha2(c.cast("binary"), 256)


def fingerprint_col(c: Column) -> Column:
    """Deterministic document fingerprint: md5 hex of the
    whitespace-normalized lowercased text — the exact-dedup key (D1 analog,
    /root/reference/src/ingestion/document_ingestion.rs:341-347 uses
    SHA-256 of bytes; md5 here because both Spark and DuckDB expose it with
    identical hex output)."""
    norm = F.lower(F.regexp_replace(F.trim(c), r"\s+", " "))
    return F.md5(norm)


#: Gopher's required-stopword list (Rae et al. 2021 A1.1)
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_flags_cols(c: Column, stopwords: tuple[str, ...] = GOPHER_STOPWORDS) -> list[Column]:
    """Gopher-style document quality rules (Rae et al. 2021, "Scaling
    Language Models", table A1 — the standard web-corpus filter set),
    entirely Catalyst-native so the filter sweep is a codegen'd projection
    at 100 TB. Returns boolean flag columns + the conjunction:

    * 50 ≤ word_count ≤ 100000
    * 3 ≤ mean word length ≤ 10
    * symbol-to-word ratio (#, …, ...) ≤ 0.1
    * ≤ 90% of lines start with a bullet
    * ≤ 30% of lines end with an ellipsis
    * ≥ 80% of words contain an alphabetic character
    * ≥ 2 distinct required stopwords present (``stopwords`` — Gopher's
      English list by default; pass a corpus-appropriate list for other
      domains, e.g. the synthetic technical corpus in testdata)
    """
    words = F.filter(F.split(F.trim(c), r"\s+"), lambda w: w != "")
    wc = F.size(words)
    safe_wc = F.greatest(wc, F.lit(1))
    total_len = F.aggregate(words, F.lit(0), lambda acc, w: acc + F.length(w))
    mean_wl = total_len / safe_wc
    ok_word_count = (wc >= 50) & (wc <= 100_000)
    ok_mean_wl = (mean_wl >= 3.0) & (mean_wl <= 10.0)
    symbols = (
        F.regexp_count(c, F.lit(r"#"))
        + F.regexp_count(c, F.lit(r"\.\.\."))
        + F.regexp_count(c, F.lit("…"))
    )
    ok_symbol_ratio = (symbols / safe_wc) <= 0.1
    lines = F.split(c, r"\n")
    n_lines = F.greatest(F.size(lines), F.lit(1))
    bullet = F.size(
        F.filter(lines, lambda l: F.trim(l).rlike(r"^([-*•])"))
    )
    ok_bullets = (bullet / n_lines) <= 0.9
    ellipsis = F.size(F.filter(lines, lambda l: F.rtrim(l).rlike(r"(\.\.\.|…)$")))
    ok_ellipsis = (ellipsis / n_lines) <= 0.3
    alpha_words = F.size(F.filter(words, lambda w: w.rlike("[A-Za-z]")))
    ok_alpha = (alpha_words / safe_wc) >= 0.8
    stops = list(stopwords)
    stop_hits = None
    low = F.lower(c)
    for s in stops:
        # caller-supplied stopwords are literals — escape before embedding.
        # Lookarounds instead of \b: identical for word-edged terms, but \b
        # never matches at a punctuation-edged term boundary ('c++' ).
        pat = rf"(?<!\w){re.escape(s)}(?!\w)"
        hit = F.when(low.rlike(pat), F.lit(1)).otherwise(F.lit(0))
        stop_hits = hit if stop_hits is None else stop_hits + hit
    ok_stops = stop_hits >= 2
    passes = (
        ok_word_count & ok_mean_wl & ok_symbol_ratio & ok_bullets & ok_ellipsis
        & ok_alpha & ok_stops
    )
    return [
        ok_word_count.alias("ok_word_count"),
        ok_mean_wl.alias("ok_mean_word_length"),
        ok_symbol_ratio.alias("ok_symbol_ratio"),
        ok_bullets.alias("ok_bullet_lines"),
        ok_ellipsis.alias("ok_ellipsis_lines"),
        ok_alpha.alias("ok_alpha_words"),
        ok_stops.alias("ok_stopwords"),
        passes.alias("gopher_pass"),
    ]


# --------------------------------------------------------------------------
# PII scrubbing (training-data hygiene: redact contact identifiers before
# the corpus ships — the standard email/IP/phone pass, pure Catalyst)
# --------------------------------------------------------------------------

# Engine-portable patterns (no lookaround, valid in both Java regex and
# RE2, so the DuckDB oracle applies the identical expressions). Order
# matters: emails first (they contain dots and digits), then IPv4, then
# phone shapes — each later pass sees the earlier tokens, never raw PII.
PII_PATTERNS: tuple[tuple[str, str], ...] = (
    (r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    (r"\b(\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
    # +country / (area) / separator-tolerant 7+ digit phone shapes,
    # anchored on word boundaries so ids and timestamps survive
    (r"\b\+?\d{1,3}[-. ]\(?\d{2,4}\)?[-. ]\d{3,4}[-. ]?\d{0,4}\b", "<PHONE>"),
)


def scrub_pii_col(c: Column) -> Column:
    """Redact emails, IPv4 addresses, and phone-shaped digit runs with
    typed placeholder tokens. Whole-stage-codegen regexp chain — zero
    Python in the hot path; at 100 TB this is a projection."""
    for pattern, token in PII_PATTERNS:
        c = F.regexp_replace(c, pattern, token)
    return c


def pii_counts_cols(c: Column) -> list[Column]:
    """Per-kind match counts (audit surface for the scrub pass)."""
    return [
        F.regexp_count(c, F.lit(PII_PATTERNS[0][0])).alias("n_emails"),
        F.regexp_count(c, F.lit(PII_PATTERNS[1][0])).alias("n_ips"),
        F.regexp_count(c, F.lit(PII_PATTERNS[2][0])).alias("n_phones"),
    ]


#: sentence terminator followed by whitespace — kept lookaround-free so
#: the DuckDB oracle (RE2: no lookbehind) can mirror it exactly: both
#: engines insert \x1e after the terminator and split on it
_SENT_BREAK = r"([.!?][\"')\]]*)\s+"
_SENT_SEP = "\x1e"


def sentences_col(c: Column) -> Column:
    """array<string> of sentences: split after terminator+whitespace
    runs ([.!?]\\s+), empties dropped. A heuristic segmenter by design
    (abbreviations split — the corpus-statistics scope line); its value
    is being EXPRESSIBLE identically in Catalyst and the SQL oracle, so
    sentence-count quality gates are value-checkable end to end."""
    marked = F.regexp_replace(c, _SENT_BREAK, "$1" + _SENT_SEP)
    return F.filter(
        F.transform(F.split(marked, _SENT_SEP), lambda s: F.trim(s)),
        lambda s: s != "",
    )


def sentence_stats_cols(c: Column) -> list[Column]:
    """Sentence-level quality features (the C4 '>=3 sentences' family):
    n_sentences, mean/max sentence length in words, and the share of
    sentences ending in a terminal mark (C4 keeps only lines ending in
    punctuation). One codegen'd pass — higher-order functions over the
    split array, no UDF, no shuffle."""
    sents = sentences_col(c)
    wc = F.transform(
        sents, lambda s: F.size(F.split(F.trim(s), r"\s+"))
    )
    n = F.size(sents)
    total = F.aggregate(wc, F.lit(0), lambda a, x: a + x)
    terminal = F.size(
        F.filter(sents, lambda s: s.rlike(r"[.!?][\"')\]]*$"))
    )
    return [
        n.cast("long").alias("n_sentences"),
        F.when(n > 0, F.round(total / n, 6))
        .otherwise(F.lit(0.0))
        .alias("mean_sentence_words"),
        F.when(n > 0, F.array_max(wc)).otherwise(F.lit(0))
        .cast("long")
        .alias("max_sentence_words"),
        F.when(n > 0, F.round(terminal / n, 6))
        .otherwise(F.lit(0.0))
        .alias("terminal_punct_ratio"),
    ]
