"""Byte-level BPE tokenizer — train + encode, from scratch, stdlib-only.

The public GPT-2 algorithm (Radford 2019; Sennrich 2016 for the merge
loop): text is pre-tokenized with a contraction-aware regex, each
pre-token becomes its UTF-8 byte sequence (ids 0..255), and training
iteratively merges the most frequent adjacent id pair into a new id
(256, 257, ...). Encoding applies the learned merge rules to each
pre-token; the classic equivalence holds that applying rules in learned
rank order equals iteratively merging the lowest-rank pair present, and
tests/test_bpe.py pins both formulations against each other.

Why this module exists (round-5 verdict #1): ``token_count_col`` counts
pre-tokenizer regex matches, so packing manifests measured "tokens" no
trainer reproduces. This tokenizer closes that gap: ``pack_sequences``
now accepts a BPE token counter, and the operators layer
(operators/bpe.py) trains the merge table distributed and encodes in
Arrow-batched pandas UDFs.

Determinism contract (everything the DuckDB oracle replays):
* pre-tokenizer = ``PRETOKEN_PATTERN`` exactly;
* pair counting counts ALL adjacent positions (overlaps included:
  ``aaa`` contributes (a,a) twice), weighted by word frequency;
* merge selection = highest count, ties broken by the SMALLEST (a, b)
  id pair;
* merge application = single left-to-right non-overlapping pass.

Reference analog: readur has no tokenizer — this is LLM-pipeline scope;
the nearest reference behavior is word counting
(/root/reference/src/utils/word_count.rs), which stays available as the
cheap pure-Catalyst path (functions/textstats.py).
"""

from __future__ import annotations

import re
from collections import Counter
from collections.abc import Iterable

#: GPT-2-shaped pre-tokenizer, ASCII classes for engine portability (the
#: original uses \p{L}/\p{N}; ASCII keeps Python re, pandas, and the
#: oracle's replay byte-identical on any locale). Order matters: the
#: contraction alternatives must precede the word branch.
PRETOKEN_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?[A-Za-z]+"
    r"| ?[0-9]+"
    r"| ?[^\sA-Za-z0-9]+"
    r"|\s+(?!\S)"
    r"|\s+"
)
_PRETOK_RE = re.compile(PRETOKEN_PATTERN)


def pretokenize(text: str) -> list[bytes]:
    """Split text into pre-tokens (UTF-8 byte strings). BPE merges never
    cross pre-token boundaries — the property that keeps encoding
    embarrassingly parallel."""
    return [m.group().encode("utf-8") for m in _PRETOK_RE.finditer(text)]


def word_counts(texts: Iterable[str]) -> Counter:
    """Pre-token frequency table of a corpus — the training input. The
    distributed twin is operators/bpe.py::word_count_table (one
    map-side-combining shuffle); this sequential form feeds tests and the
    driver-side merge loop."""
    wc: Counter = Counter()
    for text in texts:
        wc.update(pretokenize(text))
    return wc


def _merge_word(ids: tuple[int, ...], pair: tuple[int, int], new_id: int) -> tuple[int, ...]:
    """One left-to-right non-overlapping replacement pass of ``pair``."""
    a, b = pair
    out: list[int] = []
    i = 0
    n = len(ids)
    while i < n:
        if i + 1 < n and ids[i] == a and ids[i + 1] == b:
            out.append(new_id)
            i += 2
        else:
            out.append(ids[i])
            i += 1
    return tuple(out)


def _pair_counter(ids: tuple[int, ...]) -> Counter:
    """All adjacent positions of one word (overlaps included)."""
    return Counter(zip(ids, ids[1:]))


def train_bpe(
    word_freqs: dict[bytes, int] | Counter,
    num_merges: int,
) -> list[tuple[int, int]]:
    """Learn ``num_merges`` merge rules from a pre-token frequency table.

    Incremental pair-count maintenance: a global pair Counter plus an
    inverted index pair -> word ids, so each merge touches only the words
    actually containing the chosen pair (Zipf makes that cheap). The
    naive full-recount formulation lives in tests/test_bpe.py and must
    produce identical rules. Stops early (shorter rule list) when no
    pair repeats."""
    words: list[tuple[int, ...]] = []
    freqs: list[int] = []
    for w, c in sorted(word_freqs.items()):
        ids = tuple(w)
        if len(ids) >= 2:
            words.append(ids)
            freqs.append(int(c))

    pair_counts: Counter = Counter()
    where: dict[tuple[int, int], set[int]] = {}
    for wi, ids in enumerate(words):
        for p, k in _pair_counter(ids).items():
            pair_counts[p] += k * freqs[wi]
            where.setdefault(p, set()).add(wi)

    merges: list[tuple[int, int]] = []
    for step in range(num_merges):
        best = None
        best_count = 0
        for p, c in pair_counts.items():
            if c > best_count or (c == best_count and best is not None and p < best):
                best, best_count = p, c
        if best is None or best_count < 2:
            break  # nothing repeats: further merges are vocabulary padding
        new_id = 256 + step
        merges.append(best)
        for wi in sorted(where.get(best, ())):
            old = words[wi]
            new = _merge_word(old, best, new_id)
            f = freqs[wi]
            for p, k in _pair_counter(old).items():
                pair_counts[p] -= k * f
                if pair_counts[p] <= 0:
                    del pair_counts[p]
                s = where.get(p)
                if s is not None:
                    s.discard(wi)
                    if not s:
                        del where[p]
            for p, k in _pair_counter(new).items():
                pair_counts[p] += k * f
                where.setdefault(p, set()).add(wi)
            words[wi] = new
    return merges


class BpeTokenizer:
    """Frozen merge table + encoder. Cheap to pickle (the merge list), so
    Spark closures ship it to executors directly; the per-word memo cache
    rebuilds empty on each worker."""

    def __init__(self, merges: list[tuple[int, int]]):
        self.merges = [tuple(p) for p in merges]
        self.ranks = {p: r for r, p in enumerate(self.merges)}
        self.vocab_size = 256 + len(self.merges)
        self._cache: dict[bytes, tuple[int, ...]] = {}

    # -- persistence (one "a b" line per rule, rank = line order) --------
    def to_lines(self) -> str:
        return "\n".join(f"{a} {b}" for a, b in self.merges)

    @classmethod
    def from_lines(cls, text: str) -> "BpeTokenizer":
        merges = []
        for ln in text.splitlines():
            ln = ln.strip()
            if ln:
                a, b = ln.split()
                merges.append((int(a), int(b)))
        return cls(merges)

    def token_bytes(self) -> tuple[bytes, ...]:
        """Vocabulary id -> byte string (256 singles, then merges).
        Cached and returned as an immutable tuple: decode-heavy paths
        (token-boundary chunking) call this per chunk, and a mutable
        shared list would let one caller corrupt every later decode."""
        vocab = getattr(self, "_vocab", None)
        if vocab is None:
            build = [bytes([i]) for i in range(256)]
            for a, b in self.merges:
                build.append(build[a] + build[b])
            vocab = self._vocab = tuple(build)
        return vocab

    def _encode_word(self, word: bytes) -> tuple[int, ...]:
        cached = self._cache.get(word)
        if cached is not None:
            return cached
        ids = tuple(word)
        ranks = self.ranks
        while len(ids) >= 2:
            best_rank = None
            best_pair = None
            for p in zip(ids, ids[1:]):
                r = ranks.get(p)
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, p
            if best_pair is None:
                break
            ids = _merge_word(ids, best_pair, 256 + best_rank)
        if len(self._cache) < 200_000:  # bounded: zipfian corpora reuse words
            self._cache[word] = ids
        return ids

    def encode(self, text: str) -> list[int]:
        out: list[int] = []
        for w in pretokenize(text):
            out.extend(self._encode_word(w))
        return out

    def decode(self, ids: Iterable[int]) -> str:
        vocab = self.token_bytes()
        return b"".join(vocab[i] for i in ids).decode("utf-8", "replace")

    def count(self, text: str) -> int:
        return sum(len(self._encode_word(w)) for w in pretokenize(text))


def train_bpe_from_texts(texts: Iterable[str], num_merges: int) -> BpeTokenizer:
    """Convenience sequential path: corpus -> tokenizer in one call."""
    return BpeTokenizer(train_bpe(word_counts(texts), num_merges))
