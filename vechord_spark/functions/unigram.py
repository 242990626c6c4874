"""Unigram language-model tokenizer (SentencePiece's default
algorithm, Kudo 2018 "Subword Regularization" §3) — the third member
of the production tokenizer family beside byte-level BPE
(functions/bpe.py) and WordPiece (functions/wordpiece.py); the
reference's tokenizer surface is the WordPiece analog
(vechord/spec.py:258-295), so all three here exceed parity.

Where BPE GROWS a vocabulary bottom-up by merging, unigram PRUNES one
top-down: seed with the frequent substrings of the corpus, fit piece
probabilities by EM under the independence model
``P(word) = max_seg prod_i P(piece_i)``, and repeatedly drop the
lowest-probability pieces (never the single characters, which keep
every word encodable) until the target size. Encoding is the Viterbi
best segmentation under the final probabilities.

This implementation uses the hard-EM (Viterbi-EM) variant: the E-step
counts pieces along each word's single BEST segmentation instead of
the full forward-backward expectations — the standard simplification,
deterministic and monotone in practice, and exact for the corpora
whose best segmentation is unambiguous (the convergence property the
suite oracle pins).

Scale shape (same contract as train_bpe): the ONE distributed step is
the pre-token frequency count (bounded by distinct vocabulary, Heaps'
law); seeding, EM, and pruning run driver-side over that bounded
table; encoding is an Arrow-batched scan with the final piece table
in the UDF closure.
"""

from __future__ import annotations

import json
import math
from typing import Iterable, Sequence

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F, types as T

from vechord_spark.functions.bpe import pretokenize, word_frequencies


def _viterbi(word: str, logp: dict[str, float], max_len: int) -> list[str]:
    """Best segmentation of ``word`` into known pieces: classic O(n *
    max_piece_len) DP; ``logp`` must contain every single character of
    the word (the char floor guarantees it for trained models)."""
    n = len(word)
    best = [0.0] + [-math.inf] * n
    back = [0] * (n + 1)
    for i in range(1, n + 1):
        for j in range(max(0, i - max_len), i):
            piece = word[j:i]
            lp = logp.get(piece)
            if lp is None:
                continue
            cand = best[j] + lp
            if cand > best[i]:
                best[i] = cand
                back[i] = j
    if best[n] == -math.inf:  # unseen character: fall back per char
        return list(word)
    out: list[str] = []
    i = n
    while i > 0:
        j = back[i]
        out.append(word[j:i])
        i = j
    out.reverse()
    return out


class UnigramTokenizer:
    """A trained unigram LM: piece -> log probability."""

    def __init__(self, logp: dict[str, float]):
        if not logp:
            raise ValueError("empty unigram vocabulary")
        self.logp = dict(logp)
        self.max_len = max(len(p) for p in self.logp)

    @property
    def vocab(self) -> list[str]:
        return sorted(self.logp)

    def save(self, path: str) -> None:
        with open(path, "w") as fh:
            json.dump(self.logp, fh, sort_keys=True)

    @classmethod
    def load(cls, path: str) -> "UnigramTokenizer":
        with open(path) as fh:
            return cls(json.load(fh))

    def encode_word(self, word: str) -> list[str]:
        return _viterbi(word, self.logp, self.max_len)

    def encode(self, text: str) -> list[str]:
        out: list[str] = []
        for w in pretokenize(text):
            out.extend(self.encode_word(w))
        return out

    def token_count(self, text: str) -> int:
        return len(self.encode(text))

    # --- Bm25Index tokenizer protocol (operators/bm25.py:67-80): the
    # reference persists the tokenizer as a per-index model choice
    # (vechord/spec.py:258-295, client.py:230-238) — any trained
    # tokenizer must be usable as a keyword index's corpus/query
    # tokenizer, so Unigram exposes the same column()/tokenize()
    # surface as WordPieceTokenizer.
    def tokenize(self, text: str) -> list[str]:
        """Query-side tokenization — same pieces as the corpus path
        (``encode``), so query terms meet the postings exactly."""
        return self.encode(text)

    def column(self, col: Column | str) -> Column:
        """Corpus-side tokenization as an Arrow-batched array<string>
        column; the piece table rides in the UDF closure."""
        logp, max_len = self.logp, self.max_len

        @F.pandas_udf(T.ArrayType(T.StringType()))
        def _tok(texts: pd.Series) -> pd.Series:
            out = []
            for t in texts:
                toks: list[str] = []
                for w in pretokenize(t or ""):
                    toks.extend(_viterbi(w, logp, max_len))
                out.append(toks)
            return pd.Series(out)

        return _tok(F.col(col) if isinstance(col, str) else col)

    def token_count_column(self, col: Column | str) -> Column:
        """Arrow-batched token counting; the piece table rides in the
        UDF closure (same shape as BpeTokenizer.token_count_column)."""
        logp, max_len = self.logp, self.max_len

        @F.pandas_udf(T.IntegerType())
        def _cnt(texts: pd.Series) -> pd.Series:
            out = []
            for t in texts:
                n = 0
                for w in pretokenize(t or ""):
                    n += len(_viterbi(w, logp, max_len))
                out.append(n)
            return pd.Series(out, dtype="int32")

        return _cnt(F.col(col) if isinstance(col, str) else col)


def train_from_frequencies(
    word_freqs: Iterable[tuple[str, int]],
    vocab_size: int = 1000,
    max_piece_len: int = 8,
    seed_factor: int = 4,
    em_iters: int = 3,
    prune_frac: float = 0.25,
) -> UnigramTokenizer:
    """The driver-side fit over a (bounded) word-frequency table.

    1. SEED: every substring of every pre-token up to
       ``max_piece_len``, weighted by word frequency; keep the
       ``seed_factor * vocab_size`` heaviest plus every single
       character (the encodability floor).
    2. EM (hard/Viterbi variant): E — count pieces along each word's
       best segmentation under the current probabilities, weighted by
       word frequency; M — renormalize counts into probabilities
       (Laplace-smoothed so a piece that lost every count this round
       survives to the prune step rather than dividing by zero).
    3. PRUNE: drop the ``prune_frac`` lowest-probability multi-char
       pieces, re-run one EM pass, repeat until ``vocab_size``.

    Deterministic: ties break lexicographically everywhere.
    """
    words: list[tuple[str, int]] = [
        (w, int(f)) for w, f in word_freqs if w
    ]
    if not words:
        raise ValueError("cannot train a unigram model on an empty corpus")
    chars = {c for w, _ in words for c in w}

    # 1. seed by substring mass
    sub_mass: dict[str, float] = {}
    for w, f in words:
        n = len(w)
        for i in range(n):
            for j in range(i + 1, min(n, i + max_piece_len) + 1):
                piece = w[i:j]
                sub_mass[piece] = sub_mass.get(piece, 0.0) + f
    seed_n = max(vocab_size * seed_factor, len(chars))
    seeded = sorted(sub_mass.items(), key=lambda kv: (-kv[1], kv[0]))[:seed_n]
    pieces = {p for p, _ in seeded} | chars
    total = sum(sub_mass[p] for p in pieces)
    logp = {p: math.log(sub_mass[p] / total) for p in pieces}

    def em_pass() -> dict[str, float]:
        max_len = max(len(p) for p in logp)
        counts: dict[str, float] = {}
        for w, f in words:
            for piece in _viterbi(w, logp, max_len):
                counts[piece] = counts.get(piece, 0.0) + f
        # Laplace floor keeps zero-count pieces alive until the prune
        # step decides their fate deterministically
        tot = sum(counts.values()) + len(logp)
        return {
            p: math.log((counts.get(p, 0.0) + 1.0) / tot) for p in logp
        }

    for _ in range(max(1, em_iters)):
        logp = em_pass()

    # 3. prune to size (chars are never dropped)
    while sum(1 for p in logp) > max(vocab_size, len(chars)):
        multi = sorted(
            ((lp, p) for p, lp in logp.items() if len(p) > 1),
        )
        if not multi:
            break
        n_drop = max(
            1,
            min(
                int(len(multi) * prune_frac),
                len(logp) - max(vocab_size, len(chars)),
            ),
        )
        for _, p in multi[:n_drop]:
            del logp[p]
        logp = em_pass()
    return UnigramTokenizer(logp)


def train_unigram(
    df: DataFrame,
    text_col: str = "text",
    vocab_size: int = 1000,
    max_piece_len: int = 8,
    em_iters: int = 3,
    max_words: int = 1 << 20,
) -> UnigramTokenizer:
    """End-to-end distributed training: one word-count shuffle, then
    the bounded driver-side seed/EM/prune loop (the same bounded-fit
    class as train_bpe and the IVF centroid fits)."""
    rows = word_frequencies(df, text_col, max_words=max_words).collect()
    return train_from_frequencies(
        ((r["word"], r["freq"]) for r in rows),
        vocab_size=vocab_size,
        max_piece_len=max_piece_len,
        em_iters=em_iters,
    )
