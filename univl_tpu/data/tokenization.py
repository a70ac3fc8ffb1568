"""BERT WordPiece tokenizer, dependency-free.

Implements the standard BERT tokenization algorithm (basic tokenization:
cleanup, CJK spacing, optional lowercasing + accent stripping, punctuation
splitting; then greedy longest-match-first WordPiece with '##' continuation).
Functionally equivalent to the reference's modules/tokenization.py (which is
the stock Google implementation); written from the published algorithm.
"""

from __future__ import annotations

import collections
import os
import unicodedata
from typing import Dict, List, Sequence

SPECIAL_TOKENS = ("[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]")


def load_vocab(vocab_file: str) -> "collections.OrderedDict[str, int]":
    vocab = collections.OrderedDict()
    with open(vocab_file, "r", encoding="utf-8") as f:
        for i, line in enumerate(f):
            tok = line.rstrip("\n")
            # NOTE: a blank line becomes a vocab[""] entry at its index —
            # intentionally matching the reference loader, whose
            # readline loop also strips and keeps blank lines
            # (tokenization.py:51-63; its `if not token: break` fires
            # only at EOF, which plain iteration handles already).
            vocab[tok.strip()] = i
    return vocab


def _is_whitespace(ch: str) -> bool:
    if ch in (" ", "\t", "\n", "\r"):
        return True
    return unicodedata.category(ch) == "Zs"


def _is_control(ch: str) -> bool:
    if ch in ("\t", "\n", "\r"):
        return False
    return unicodedata.category(ch).startswith("C")


def _is_punctuation(ch: str) -> bool:
    cp = ord(ch)
    # ASCII ranges treated as punctuation even when unicode disagrees
    # (e.g. '$', '^', '`'), per the original algorithm.
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith("P")


def _is_cjk(cp: int) -> bool:
    return (
        0x4E00 <= cp <= 0x9FFF
        or 0x3400 <= cp <= 0x4DBF
        or 0x20000 <= cp <= 0x2A6DF
        or 0x2A700 <= cp <= 0x2B73F
        or 0x2B740 <= cp <= 0x2B81F
        or 0x2B820 <= cp <= 0x2CEAF
        or 0xF900 <= cp <= 0xFAFF
        or 0x2F800 <= cp <= 0x2FA1F
    )


class BasicTokenizer:
    def __init__(
        self,
        do_lower_case: bool = True,
        never_split: Sequence[str] = ("[UNK]", "[SEP]", "[MASK]", "[CLS]"),
    ):
        self.do_lower_case = do_lower_case
        self.never_split = set(never_split)

    def tokenize(self, text: str) -> List[str]:
        text = self._clean(text)
        text = self._space_cjk(text)
        out: List[str] = []
        for tok in text.split():
            if tok in self.never_split:
                out.append(tok)
                continue
            if self.do_lower_case:
                tok = self._strip_accents(tok.lower())
            out.extend(self._split_punct(tok))
        return " ".join(out).split()

    @staticmethod
    def _clean(text: str) -> str:
        buf = []
        for ch in text:
            cp = ord(ch)
            if cp == 0 or cp == 0xFFFD or _is_control(ch):
                continue
            buf.append(" " if _is_whitespace(ch) else ch)
        return "".join(buf)

    @staticmethod
    def _space_cjk(text: str) -> str:
        buf = []
        for ch in text:
            if _is_cjk(ord(ch)):
                buf.append(f" {ch} ")
            else:
                buf.append(ch)
        return "".join(buf)

    @staticmethod
    def _strip_accents(text: str) -> str:
        return "".join(
            ch
            for ch in unicodedata.normalize("NFD", text)
            if unicodedata.category(ch) != "Mn"
        )

    @staticmethod
    def _split_punct(tok: str) -> List[str]:
        pieces: List[List[str]] = []
        new_word = True
        for ch in tok:
            if _is_punctuation(ch):
                pieces.append([ch])
                new_word = True
            else:
                if new_word:
                    pieces.append([])
                    new_word = False
                pieces[-1].append(ch)
        return ["".join(p) for p in pieces]


class GreedyWordpiece:
    def __init__(self, vocab: Dict[str, int], unk_token: str = "[UNK]",
                 max_chars_per_word: int = 100):
        self.vocab = vocab
        self.unk_token = unk_token
        self.max_chars_per_word = max_chars_per_word

    def tokenize(self, word: str) -> List[str]:
        if len(word) > self.max_chars_per_word:
            return [self.unk_token]
        pieces: List[str] = []
        start = 0
        n = len(word)
        while start < n:
            end = n
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = sub
                    break
                end -= 1
            if cur is None:
                return [self.unk_token]
            pieces.append(cur)
            start = end
        return pieces


class WordPieceTokenizer:
    """End-to-end tokenizer with the reference BertTokenizer's interface.

    Uses the native C++ fast path (csrc/wordpiece.cc via ctypes) for ASCII
    inputs when available; falls back to the pure-Python implementation for
    Unicode text or when the toolchain is absent. Disable the native path
    with UNIVL_TPU_NO_NATIVE=1.
    """

    # the reference's from_pretrained never_split set (the one every
    # reference main actually runs with): modules/tokenization.py:157.
    # Note it includes [PAD], unlike the bare-ctor default (:78).
    PRETRAINED_NEVER_SPLIT = ("[UNK]", "[SEP]", "[PAD]", "[CLS]", "[MASK]")

    def __init__(
        self,
        vocab_file: str,
        do_lower_case: bool = True,
        never_split: Sequence[str] = PRETRAINED_NEVER_SPLIT,
    ):
        if not os.path.isfile(vocab_file):
            raise ValueError(f"vocab file not found: {vocab_file}")
        self.vocab = load_vocab(vocab_file)
        missing = [t for t in SPECIAL_TOKENS if t not in self.vocab]
        if missing:
            raise ValueError(
                f"vocab {vocab_file} is missing special tokens {missing}; "
                f"expected a BERT WordPiece vocab with {SPECIAL_TOKENS}"
            )
        self.ids_to_tokens = {i: t for t, i in self.vocab.items()}
        if set(self.ids_to_tokens) != set(range(len(self.vocab))):
            raise ValueError(
                f"vocab {vocab_file} contains duplicate tokens; "
                "some ids would have no reverse mapping"
            )
        self.basic = BasicTokenizer(
            do_lower_case=do_lower_case, never_split=never_split
        )
        self.wordpiece = GreedyWordpiece(self.vocab)
        self._vocab_tokens = list(self.vocab.keys())
        self._native = None
        if not os.environ.get("UNIVL_TPU_NO_NATIVE"):
            try:
                from univl_tpu.data.native import NativeWordPiece

                self._native = NativeWordPiece(
                    self._vocab_tokens, do_lower_case,
                    never_split=list(never_split),
                )
            except Exception:
                self._native = None

    def __len__(self) -> int:
        return len(self.vocab)

    def tokenize(self, text: str) -> List[str]:
        if self._native is not None:
            ids = self._native.tokenize_ids(text)
            if ids is not None:
                return [self._vocab_tokens[i] for i in ids]
        out: List[str] = []
        for tok in self.basic.tokenize(text):
            out.extend(self.wordpiece.tokenize(tok))
        return out

    def convert_tokens_to_ids(self, tokens: Sequence[str]) -> List[int]:
        unk = self.vocab["[UNK]"]
        return [self.vocab.get(t, unk) for t in tokens]

    def convert_ids_to_tokens(self, ids: Sequence[int]) -> List[str]:
        return [self.ids_to_tokens[int(i)] for i in ids]

    def random_token(self, rng) -> str:
        """Uniform random vocab token (for the MLM 10%-random branch)."""
        return self._vocab_tokens[int(rng.randint(0, len(self._vocab_tokens)))]

    # token id shorthands (beam search constants, reference beam.py:10-28)
    @property
    def pad_id(self) -> int:
        return self.vocab["[PAD]"]

    @property
    def unk_id(self) -> int:
        return self.vocab["[UNK]"]

    @property
    def bos_id(self) -> int:  # BOS == [CLS]
        return self.vocab["[CLS]"]

    @property
    def eos_id(self) -> int:  # EOS == [SEP]
        return self.vocab["[SEP]"]
