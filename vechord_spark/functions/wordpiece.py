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


# ---------------------------------------------------------------------------
# Vectorized basic pass: the per-character predicates above, compiled
# ONCE into regex character classes by a single lazy scan of the code
# space (~0.5 s, once per Python worker). The batch path then does the
# whole basic pass with three pandas str ops instead of a Python loop
# per character — byte-identical to the scalar pass by construction
# (the classes are generated FROM the scalar predicates).
# ---------------------------------------------------------------------------

_BASIC_REGEXES: dict | None = None


def _char_class(codepoints: list[int]) -> str:
    """Compact regex character class from sorted codepoints (ranges)."""
    parts = []
    i = 0
    while i < len(codepoints):
        j = i
        while j + 1 < len(codepoints) and codepoints[j + 1] == codepoints[j] + 1:
            j += 1
        a, b = codepoints[i], codepoints[j]
        if b - a >= 2:
            parts.append(f"\\U{a:08X}-\\U{b:08X}")
        elif b - a == 1:
            parts.append(f"\\U{a:08X}\\U{b:08X}")
        else:
            parts.append(f"\\U{a:08X}")
        i = j + 1
    return "".join(parts)


def _basic_regexes() -> dict:
    """{'mn_table': combining-mark deletion table, 'split'/'ascii_split':
    tokenizing regexes, 'nonascii': fast-path mask} generated from the
    exact scalar predicates (one scan, cached)."""
    global _BASIC_REGEXES
    if _BASIC_REGEXES is not None:
        return _BASIC_REGEXES
    import re

    mn, pc, ws = [], [], []
    for cp in range(0x110000):
        if 0xD800 <= cp <= 0xDFFF:  # unpaired surrogates can't occur in str
            continue
        ch = chr(cp)
        if unicodedata.category(ch) == "Mn":
            mn.append(cp)
        if _is_punct(ch) or _is_cjk(ch):
            pc.append(cp)
        if ch.isspace():
            ws.append(cp)
    pc_cls = _char_class(pc)
    # ASCII-specialized split for the common fast path (rows proven
    # ASCII skip the huge Unicode classes) — generated from the SAME
    # scalar predicates restricted to the ASCII range
    pc_a = _char_class([c for c in pc if c < 128])
    ws_a = _char_class([c for c in ws if c < 128])
    _BASIC_REGEXES = {
        # str.translate deletion table: 4x faster than a regex replace
        # with the ~300-range Mn class (measured on mixed-script rows)
        "mn_table": dict.fromkeys(mn),
        # one isolated punct/CJK char, or a run of word characters
        "split": re.compile(f"[{pc_cls}]|[^{_char_class(ws)}{pc_cls}]+"),
        "ascii_split": re.compile(f"[{pc_a}]|[^{ws_a}{pc_a}]+"),
        "nonascii": re.compile(r"[^\x00-\x7f]"),
    }
    return _BASIC_REGEXES


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
        # greedy-match bounds: the longest first-piece / continuation in
        # the vocab caps where the downward prefix scan STARTS, so a
        # 100-char word doesn't probe 100 impossible prefixes per step
        self._max_first = max(
            (len(t) for t in self.vocab if not t.startswith("##")), default=0
        )
        self._max_cont = max(
            (len(t) - 2 for t in self.vocab if t.startswith("##")), default=0
        )
        # per-word memo for the batch path: corpora are Zipf-heavy, so
        # most words in a batch are repeats of an already-segmented one
        self._word_memo: dict[str, list[str]] = {}

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

    def _wordpiece_bounded(self, word: str) -> list[str]:
        """Same greedy longest-match as :meth:`_wordpiece` (parity
        pinned by tests) but the downward prefix scan starts at the
        longest piece the vocab can possibly hold — O(word *
        max_piece) instead of O(word²) on long out-of-vocab words."""
        if len(word) > self.max_input_chars_per_word:
            return [self.unk_token]
        vocab = self.vocab
        pieces: list[str] = []
        start = 0
        n = len(word)
        while start < n:
            bound = self._max_cont if start > 0 else self._max_first
            end = min(n, start + bound)
            cur = None
            while start < end:
                piece = word[start:end]
                if start > 0:
                    piece = "##" + piece
                if piece in vocab:
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

    # ----------------------------------------------------------- batch path
    def tokenize_batch(self, texts: "pd.Series") -> "pd.Series":
        """Vectorized tokenize for Arrow batches: the basic pass runs as
        three pandas str ops (lower+NFD, strip combining marks, regex
        findall — character classes compiled once from the exact scalar
        predicates, see ``_basic_regexes``), and the wordpiece pass is
        memoized per distinct word (Zipf: most words in a batch are
        repeats) with the greedy scan bounded by the longest vocab
        piece. Output is element-wise identical to the scalar
        :meth:`tokenize` (parity fuzz-pinned in tests)."""
        rx = _basic_regexes()
        s = texts.fillna("").astype(str)
        if self.lowercase:
            s = s.str.lower()
        # ASCII fast path: rows with no non-ASCII char need neither the
        # NFD/Mn accent strip (it is the identity on ASCII) nor the
        # full-Unicode split classes. Checked AFTER lowercasing, so the
        # rare non-ASCII->ASCII lowerings (e.g. Kelvin sign) land on
        # the fast path with identical output.
        nonascii = s.str.contains(rx["nonascii"], regex=True)
        if nonascii.any():
            sub = s[nonascii]
            if self.lowercase:
                mn_table = rx["mn_table"]
                sub = sub.str.normalize("NFD").map(
                    lambda x: x.translate(mn_table)
                )
            s = s.copy()
            s[nonascii] = sub
            word_lists = pd.Series(index=s.index, dtype=object)
            word_lists[~nonascii] = s[~nonascii].str.findall(rx["ascii_split"])
            word_lists[nonascii] = s[nonascii].str.findall(rx["split"])
        else:
            word_lists = s.str.findall(rx["ascii_split"])
        memo = self._word_memo
        seg = self._wordpiece_bounded
        out = []
        for words in word_lists:
            toks: list[str] = []
            for w in words:
                got = memo.get(w)
                if got is None:
                    got = seg(w)
                    if len(memo) < 1_000_000:  # bound worker memory
                        memo[w] = got
                toks.extend(got)
            out.append(toks)
        return pd.Series(out, index=texts.index)

    # ---------------------------------------------------------- Spark path
    def column(self, col: Column | str) -> Column:
        """Arrow-batched column form: text -> array<string> of word
        pieces (the vectorized ``tokenize_batch``). The vocab set rides
        into executors inside the UDF closure (broadcast once per
        worker); the per-word memo accumulates per worker across
        batches."""
        from pyspark.sql import functions as F
        from pyspark.sql.functions import pandas_udf

        tok = self

        @pandas_udf(T.ArrayType(T.StringType()))
        def _tok(texts: pd.Series) -> pd.Series:
            return tok.tokenize_batch(texts)

        return _tok(F.col(col) if isinstance(col, str) else col)
