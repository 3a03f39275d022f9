"""Property tests: the fast paths are semantically identical to the naive
reference forms they replaced."""

import random
import re

from hypothesis import given, settings
from hypothesis import strategies as st

from readur_spark.kernels.util import count_alnum
from readur_spark.kernels.wordcount import count_words_optimized

text_st = st.text(
    alphabet=st.characters(codec="utf-8"),
    max_size=300,
)


@given(text_st)
@settings(max_examples=300, deadline=None)
def test_count_alnum_matches_isalnum(s):
    assert count_alnum(s) == sum(1 for c in s if c.isalnum())


def _reference_state_machine(text: str) -> int:
    # the literal Rust port (xml_extractor.rs:1267-1290)
    count = 0
    in_word = False
    for ch in text:
        if ch.isspace():
            if in_word:
                count += 1
                in_word = False
        elif ch.isalnum():
            in_word = True
    if in_word:
        count += 1
    return count


@given(text_st)
@settings(max_examples=300, deadline=None)
def test_optimized_counter_matches_state_machine(s):
    assert count_words_optimized(s) == _reference_state_machine(s)


def test_alnum_regex_class_equivalence_over_bmp():
    """[^\\W_] (used for token presence tests) agrees with str.isalnum over
    the first 0x2500 codepoints plus CJK/digit samples."""
    alnum_re = re.compile(r"[^\W_]")
    probes = list(range(32, 0x2500)) + [0x4E00, 0x0663, 0x00B2, 0x00BE, 0x2162]
    for cp in probes:
        c = chr(cp)
        assert c.isalnum() == bool(alnum_re.fullmatch(c)), hex(cp)


def _clean_chain_reference(text: str) -> str:
    # the literal 6-pass chain with no pre-scan shortcut
    import re as _re

    c = _re.sub(r"([a-z])([A-Z])", r"\1 \2", text)
    c = _re.sub(r" {3,}", "  ", c)
    c = _re.sub(r"\n{3,}", "\n\n", c)
    c = _re.sub(r" +\n", "\n", c)
    c = _re.sub(r"\n +", "\n", c)
    c = _re.sub(r"[ \t]+", " ", c)
    return c.strip()


@given(text_st)
@settings(max_examples=300, deadline=None)
def test_clean_shortcut_matches_chain(s):
    from readur_spark.kernels.textnorm import clean_extracted_text

    assert clean_extracted_text(s) == _clean_chain_reference(s)


def test_fuzz_against_corpus_like_text():
    rng = random.Random(7)
    alphabet = "abc XYZ 012 .!?\n\t_²½測試naïve\0-"
    for _ in range(500):
        s = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 120)))
        assert count_alnum(s) == sum(1 for c in s if c.isalnum())
        assert count_words_optimized(s) == _reference_state_machine(s)
