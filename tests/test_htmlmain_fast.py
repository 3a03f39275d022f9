"""Cross-validation: the fast regex tokenizer produces identical output to
the html.parser reference implementation on corpus HTML and tag soup."""

import random

from readur_spark.corpus import _html_span
from readur_spark.kernels.htmlmain import (
    extract_main_content,
    extract_main_content_reference,
)

EDGES = [
    "",
    "<",
    "a < b",
    "<p>unterminated paragraph long enough to be kept for sure",
    "<script>var x = '<p>not content</p>';</script>"
    "<p>Real paragraph long enough to keep here.</p>",
    "<!-- comment --><p>After a comment, a long enough paragraph to keep.</p>",
    "<body><p>Fish &amp; chips &#65; &lt;tag&gt; long enough paragraph here.</p></body>",
    "<IMG SRC='m://upper'><p>Case-insensitive img attr with a long paragraph to keep.</p>",
    "<a/>self closing anchor<p>then a long enough paragraph to keep around here</p>",
    '<img src="m://q" alt="x/y"><p>attr containing slash, long enough paragraph to keep</p>',
    "<style>.c{}</style><td>cell content long enough to be kept by the classifier</td>",
]

_SOUP = [
    "<p>", "</p>", "<div>", "</div>", "<a href='/x'>", "</a>",
    "<img src='m://f'>", "<nav>", "</nav>", "<br>",
    "text chunk with words ", "&amp;", "< ", ">", "<script>", "</script>", "x",
]


def test_corpus_html_identical():
    rng = random.Random(99)
    for i in range(400):
        h = _html_span(rng, i)
        assert extract_main_content(h) == extract_main_content_reference(h), h[:200]


def test_edge_cases_identical():
    for h in EDGES:
        assert extract_main_content(h) == extract_main_content_reference(h), h


def test_tag_soup_fuzz_identical():
    rng = random.Random(4242)
    for _ in range(500):
        h = "".join(rng.choice(_SOUP) for _ in range(rng.randint(0, 40)))
        assert extract_main_content(h) == extract_main_content_reference(h), h
