"""WordPiece tokenizer — the ``bert_base_uncased`` tokenizer analog.

The reference's Keyword columns declare a tokenizer model
(``bert_base_uncased`` | ``wiki_tocken``, vechord/spec.py:258-295) and
the actual tokenization happens inside the vchord-bm25 Postgres
extension. This module implements the published BERT WordPiece
algorithm (Devlin et al. 2019; greedy longest-match-first subword
segmentation with ``##`` continuations) so keyword search can run with
real WordPiece parity when a vocabulary file is supplied:

- basic pass: NFD accent stripping + lowercasing (uncased models),
  CJK/punctuation isolation, whitespace split;
- wordpiece pass: per word, repeatedly take the LONGEST vocab prefix
  (continuations looked up with the ``##`` prefix); words with no
  segmentation become ``[UNK]``.

No vocabulary ships in this environment — load one with
``WordPieceTokenizer.from_vocab_file`` (the standard one-token-per-line
format) or pass any dict/list. The engine default tokenizer remains the
documented simple regex (functions/text.tokenize); wire this in via
``Bm25Index(tokenizer=...)`` for model parity.
"""

from __future__ import annotations

import unicodedata
from typing import Iterable, Mapping

import pandas as pd  # module-top: pandas-UDF string type hints resolve here

from pyspark.sql import Column
from pyspark.sql import types as T


def _is_punct(ch: str) -> bool:
    cp = ord(ch)
    # ASCII ranges BERT treats as punctuation even where unicodedata
    # does not (e.g. $, +, <, =, >, ^, `, |, ~)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(ch: str) -> bool:
    cp = ord(ch)
    return (
        0x4E00 <= cp <= 0x9FFF
        or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF
        or 0xF900 <= cp <= 0xFAFF
    )


class WordPieceTokenizer:
    """Greedy longest-match-first WordPiece over a supplied vocab."""

    def __init__(
        self,
        vocab: Mapping[str, int] | Iterable[str],
        unk_token: str = "[UNK]",
        lowercase: bool = True,
        max_input_chars_per_word: int = 100,
    ) -> None:
        if isinstance(vocab, Mapping):
            self.vocab = set(vocab)
        else:
            self.vocab = set(vocab)
        self.unk_token = unk_token
        self.lowercase = lowercase
        self.max_input_chars_per_word = max_input_chars_per_word

    @classmethod
    def from_vocab_file(cls, path: str, **kwargs) -> "WordPieceTokenizer":
        """Standard vocab.txt format: one token per line, line number =
        token id."""
        with open(path, encoding="utf-8") as f:
            return cls([line.rstrip("\n") for line in f], **kwargs)

    # ---------------------------------------------------------- basic pass
    def _basic(self, text: str) -> list[str]:
        if self.lowercase:
            text = text.lower()
            text = unicodedata.normalize("NFD", text)
            text = "".join(c for c in text if unicodedata.category(c) != "Mn")
        out: list[str] = []
        word: list[str] = []
        for ch in text:
            if ch.isspace():
                if word:
                    out.append("".join(word))
                    word = []
            elif _is_punct(ch) or _is_cjk(ch):
                if word:
                    out.append("".join(word))
                    word = []
                out.append(ch)
            else:
                word.append(ch)
        if word:
            out.append("".join(word))
        return out

    # ------------------------------------------------------ wordpiece pass
    def _wordpiece(self, word: str) -> list[str]:
        if len(word) > self.max_input_chars_per_word:
            return [self.unk_token]
        pieces: list[str] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                piece = word[start:end]
                if start > 0:
                    piece = "##" + piece
                if piece in self.vocab:
                    cur = piece
                    break
                end -= 1
            if cur is None:
                return [self.unk_token]
            pieces.append(cur)
            start = end
        return pieces

    def tokenize(self, text: str) -> list[str]:
        out: list[str] = []
        for word in self._basic(text or ""):
            out.extend(self._wordpiece(word))
        return out

    # ---------------------------------------------------------- Spark path
    def column(self, col: Column | str) -> Column:
        """Arrow-batched column form: text -> array<string> of word
        pieces. The vocab set rides into executors inside the UDF
        closure (broadcast once per worker)."""
        from pyspark.sql import functions as F
        from pyspark.sql.functions import pandas_udf

        tok = self

        @pandas_udf(T.ArrayType(T.StringType()))
        def _tok(texts: pd.Series) -> pd.Series:
            return texts.map(tok.tokenize)

        return _tok(F.col(col) if isinstance(col, str) else col)
