"""Deterministic synthetic interleaved-document corpus.

Generates the engine's primary input table
``docs(doc_id string, spans array<struct<kind,text,media_ref,offset>>)``
per FIXTURES.md §1: span kinds drawn text:html:media ≈ 5:3:2, 1–12 spans per
doc, ~1% mega-docs (many spans, long text) to exercise skew handling.

Text spans sample the content classes of FIXTURES.md §3 (mirroring the
reference's word-count / quality-gate fixtures, e.g.
/root/reference/tests/integration_pdf_word_count_tests.rs:316-331); HTML
spans sample the boilerplate classes of §4. Everything is derived from a
seeded ``random.Random`` — same seed, same corpus, on any machine.
"""

from __future__ import annotations

import random

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

DOCS_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField(
            "spans",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("kind", T.StringType(), True),
                        T.StructField("text", T.StringType(), True),
                        T.StructField("media_ref", T.StringType(), True),
                        T.StructField("offset", T.IntegerType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)

_EN = (
    "the quick brown fox jumps over a lazy dog while data pipelines stream "
    "ordered spans through vectorized batch extraction stages at scale"
).split()
_ES = "el rapido zorro marron salta sobre un perro perezoso mientras datos".split()
_CAMEL = [
    "SOCLogixNDAConfidentialityAgreement",
    "ThisIsATestDocumentWithCamelCase",
    "ExecutiveSummary",
    "InternalRevenueService",
]
_MIXED = ["ABC123DEF456", "ABC123xyz789DefGhi456", "Invoice2024Total991"]
_ALLCAPS = ["THISISALLCAPSTEXT", "CONFIDENTIALDONOTDISTRIBUTE"]
_DOTTED = ["Text.With.Dots.Between", "Section.One.Two.Three"]
_PUNCT = "!@#$%^&*()_+-=[]{}|;':\",./<>?"


def _prose(rng: random.Random, words: list[str], n: int) -> str:
    return " ".join(rng.choice(words) for _ in range(n))


def _text_span(rng: random.Random, mega: bool = False) -> str:
    roll = rng.random()
    scale = rng.randint(10, 100) if mega else 1
    if roll < 0.45:  # normal prose
        return _prose(rng, _EN, rng.randint(8, 60) * scale)
    if roll < 0.55:  # messy whitespace
        parts = [_prose(rng, _EN, rng.randint(2, 6)) for _ in range(rng.randint(2, 5) * scale)]
        seps = ["    ", "\n\n\n\n", "   \n  ", "\t \t", "  "]
        out = []
        for p in parts:
            out.append(p)
            out.append(rng.choice(seps))
        return "".join(out)
    if roll < 0.63:  # continuous / camelCase
        return rng.choice(_CAMEL)
    if roll < 0.68:  # mixed alphanumeric
        return rng.choice(_MIXED)
    if roll < 0.72:  # all caps run
        return rng.choice(_ALLCAPS)
    if roll < 0.76:  # dotted
        return rng.choice(_DOTTED)
    if roll < 0.80:  # punctuation-only → must fail the content gate
        return _PUNCT
    if roll < 0.84:  # empty / whitespace
        return rng.choice(["", "   \n\t  ", " \n "])
    if roll < 0.88:  # embedded null bytes
        return "Test\0with\0null\0bytes and " + _prose(rng, _EN, 6)
    if roll < 0.92:  # hyphenated line break
        return "the extrac-\ntion pipeline handles hyphen-\nated words " + _prose(
            rng, _EN, rng.randint(4, 12)
        )
    if roll < 0.96:  # multilingual
        return _prose(rng, _ES, rng.randint(8, 30) * scale)
    # unicode edges
    return "naïve café résumé — σπαν ordering 测试 " + _prose(rng, _EN, 8)


def _html_span(rng: random.Random, doc_idx: int, mega: bool = False) -> str:
    roll = rng.random()
    nav = (
        "<nav><ul>"
        + "".join(f'<li><a href="/p{i}">nav link {i}</a></li>' for i in range(5))
        + "</ul></nav>"
    )
    footer = '<footer><a href="/about">about</a> <a href="/contact">contact</a></footer>'
    paras = "".join(
        f"<p>{_prose(rng, _EN, rng.randint(10, 40))}</p>"
        for _ in range(rng.randint(2, 6) * (rng.randint(5, 20) if mega else 1))
    )
    if roll < 0.35:  # article page
        return f"<html><body>{nav}<article>{paras}</article>{footer}</body></html>"
    if roll < 0.50:  # link farm only → everything dropped
        farm = "".join(
            f'<div><a href="/x{i}">{_prose(rng, _EN, rng.randint(3, 8))}</a></div>'
            for i in range(8)
        )
        return f"<html><body>{farm}</body></html>"
    if roll < 0.62:  # short-block noise between long paragraphs
        noise = "".join(f"<div>ok {i}</div>" for i in range(4))
        return f"<html><body>{paras}{noise}{paras}</body></html>"
    if roll < 0.74:  # table layout
        cells = "".join(
            f"<td>{_prose(rng, _EN, rng.randint(8, 20))}</td>" for _ in range(3)
        )
        return f"<html><body>{nav}<table><tr>{cells}</tr></table></body></html>"
    if roll < 0.88:  # inline media inside the article
        img = f'<img src="media://img/{doc_idx}-{rng.randint(0, 999)}">'
        return (
            f"<html><body>{nav}<article><p>{_prose(rng, _EN, 30)}</p>{img}"
            f"<p>{_prose(rng, _EN, 25)}</p></article>{footer}</body></html>"
        )
    # trivial page
    return f"<html><body><p>{_prose(rng, _EN, rng.randint(10, 30))}</p></body></html>"


def generate_docs(
    n_docs: int,
    seed: int = 42,
    mega_fraction: float = 0.01,
    mega_span_range: tuple[int, int] = (100, 300),
) -> list[dict]:
    """Generate ``n_docs`` interleaved documents as plain Python rows."""
    rng = random.Random(seed)
    rows = []
    for i in range(n_docs):
        doc_id = f"doc-{i:012d}"
        mega = rng.random() < mega_fraction
        n_spans = rng.randint(*mega_span_range) if mega else rng.randint(1, 12)
        spans = []
        for off in range(n_spans):
            kind_roll = rng.random()
            if kind_roll < 0.5:
                spans.append(
                    {
                        "kind": "text",
                        "text": _text_span(rng, mega=mega),
                        "media_ref": "",
                        "offset": off,
                    }
                )
            elif kind_roll < 0.8:
                spans.append(
                    {
                        "kind": "html",
                        "text": _html_span(rng, i, mega=mega),
                        "media_ref": "",
                        "offset": off,
                    }
                )
            else:
                spans.append(
                    {
                        "kind": "media",
                        "text": "",
                        "media_ref": f"media://obj/{i}-{off}",
                        "offset": off,
                    }
                )
        rows.append({"doc_id": doc_id, "spans": spans})
    return rows


def docs_dataframe(
    spark: SparkSession,
    n_docs: int,
    seed: int = 42,
    num_partitions: int | None = None,
    **kwargs,
) -> DataFrame:
    """Synthetic corpus as a Spark DataFrame with the FIXTURES.md §1 schema."""
    rows = generate_docs(n_docs, seed=seed, **kwargs)
    df = spark.createDataFrame(rows, schema=DOCS_SCHEMA)
    if num_partitions:
        df = df.repartition(num_partitions)
    return df


def quality_png_bytes(doc_id: int, w: int = 34, h: int = 26) -> bytes:
    """Deterministic synthetic grayscale PNG for the image-pipeline
    correctness gates: pixel(x, y) = (doc_id % 200) + (x % 17) + (y % 13).

    With w a multiple of 17 and h a multiple of 13 the stats are closed
    form (no mod wraparound, max pixel ≤ 199+16+12 = 227 < 256):
    brightness = doc_id % 200 + 14 exactly (mean of x%17 = 8, y%13 = 6),
    variance = (17²−1)/12 + (13²−1)/12 = 24 + 14 = 38 exactly, so
    contrast_ratio = sqrt(38)/255 — lets a DuckDB oracle compute the
    expected quality stats with pure arithmetic on doc_id."""
    import numpy as np

    from readur_spark.kernels.pixels import png_encode

    base = int(doc_id) % 200
    xs = np.arange(w, dtype=np.uint16) % 17
    ys = np.arange(h, dtype=np.uint16) % 13
    img = (base + xs[None, :] + ys[:, None]).astype(np.uint8)
    return png_encode(img)
