"""Byte-pair-encoding tokenizer training kernel (T90) — the pure-Python
semantics oracle for the distributed trainer in ``operators/bpe.py``.

Sennrich, Haddow & Birch (ACL 2016): BPE learns a subword vocabulary by
repeatedly merging the most frequent adjacent symbol pair.  The critical
scale property (and the reason BPE suits Spark at 100 TB) is that training
never touches the corpus after ONE pass: it runs on the **word-type
frequency table** (Zipf: millions of types for trillions of tokens), and
each merge only rewrites the word types that contain the pair.

Deterministic contract (shared bit-for-bit by this kernel, the Spark
trainer, and the DuckDB oracle of the first iteration):

- a word type is its characters plus a terminal ``</w>`` marker;
- pair counts weight each ADJACENT POSITION by the word's corpus frequency
  (so ``'aaaa'`` contributes 3 to ``('a','a')``);
- the merge chosen each round is the (count DESC, pair ASC) minimum —
  lexicographic pair order breaks count ties, so training is a pure
  function of the frequency table;
- merging rewrites every word leftmost-first and non-overlapping
  (``a a a`` + merge ``('a','a')`` → ``aa a``, not ``a aa``).

Reference analogue: none (the reference never tokenizes —
pdor/pdor_out.py renders text verbatim); Table-D training-data-pipeline
scope.  Stdlib only.
"""

from __future__ import annotations

__all__ = [
    "word_symbols",
    "pair_counts",
    "best_pair",
    "apply_merge",
    "train_bpe",
    "encode_word",
]

END = "</w>"


def word_symbols(word: str) -> tuple[str, ...]:
    """Initial symbol sequence of a word type: characters + terminal."""
    return tuple(word) + (END,)


def pair_counts(
    vocab: dict[tuple[str, ...], int],
) -> dict[tuple[str, str], int]:
    """Adjacent-position pair counts over the symbolized vocabulary,
    weighted by word-type frequency."""
    counts: dict[tuple[str, str], int] = {}
    for syms, freq in vocab.items():
        for i in range(len(syms) - 1):
            p = (syms[i], syms[i + 1])
            counts[p] = counts.get(p, 0) + freq
    return counts


def best_pair(counts: dict[tuple[str, str], int]) -> tuple[str, str] | None:
    """The (count DESC, pair ASC) winner; None on an empty count table."""
    if not counts:
        return None
    return min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]


def apply_merge(
    syms: tuple[str, ...], pair: tuple[str, str]
) -> tuple[str, ...]:
    """Rewrite one symbol sequence: every leftmost-first non-overlapping
    occurrence of ``pair`` becomes the concatenated symbol."""
    a, b = pair
    out: list[str] = []
    i = 0
    n = len(syms)
    while i < n:
        if i + 1 < n and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def train_bpe(
    word_freqs: dict[str, int], n_merges: int
) -> list[tuple[str, str]]:
    """Learn up to ``n_merges`` merges from a word-type frequency table.
    Stops early when no adjacent pair remains (every word fully merged)."""
    if n_merges < 0:
        raise ValueError(f"n_merges must be >= 0, got {n_merges}")
    vocab = {word_symbols(w): f for w, f in word_freqs.items() if w}
    merges: list[tuple[str, str]] = []
    for _ in range(n_merges):
        p = best_pair(pair_counts(vocab))
        if p is None:
            break
        merges.append(p)
        vocab = _merge_vocab(vocab, p)
    return merges


def _merge_vocab(
    vocab: dict[tuple[str, ...], int], pair: tuple[str, str]
) -> dict[tuple[str, ...], int]:
    out: dict[tuple[str, ...], int] = {}
    for syms, freq in vocab.items():
        ns = apply_merge(syms, pair)
        out[ns] = out.get(ns, 0) + freq
    return out


def encode_word(word: str, merges: list[tuple[str, str]]) -> list[str]:
    """Tokenize one word with a learned merge list, applying merges in
    training order (the standard BPE inference rule)."""
    syms = word_symbols(word)
    for p in merges:
        if len(syms) == 1:
            break
        syms = apply_merge(syms, p)
    return list(syms)
