"""Native C++ tokenizer: parity with the Python implementation + fallback."""

import os

import numpy as np
import pytest

from univl_tpu.data import fixtures
from univl_tpu.data.tokenization import WordPieceTokenizer


@pytest.fixture(scope="module")
def vocab_file(tmp_path_factory):
    return fixtures.make_vocab(str(tmp_path_factory.mktemp("v") / "vocab.txt"))


@pytest.fixture(scope="module")
def native_tok(vocab_file):
    tok = WordPieceTokenizer(vocab_file)
    if tok._native is None:
        pytest.skip("native tokenizer unavailable (no g++?)")
    return tok


@pytest.fixture(scope="module")
def python_tok(vocab_file, monkeypatch_module=None):
    os.environ["UNIVL_TPU_NO_NATIVE"] = "1"
    try:
        tok = WordPieceTokenizer(vocab_file)
    finally:
        del os.environ["UNIVL_TPU_NO_NATIVE"]
    assert tok._native is None
    return tok


CASES = [
    "Add the chopped onions, then STIR well!",
    "heat some olive oil in a pan",
    "a" * 150,  # > max chars per word -> UNK
    "mix   flour\tand water\n",
    "salt... pepper?! (garlic)",
    "",
    "   ",
    "add-the-onions",
    "123 mix 45x",
    "zzz unknownword qqq",
]


def test_native_matches_python(native_tok, python_tok):
    for text in CASES:
        got = native_tok.tokenize(text)
        expect = python_tok.tokenize(text)
        assert got == expect, (text, got, expect)


def test_native_never_split_parity(native_tok, python_tok):
    """Whitespace-delimited special tokens skip lowercasing/punct splitting
    (BasicTokenizer.never_split). Regression: the native path used to split
    '[SEP]' into '[', 'sep', ']'."""
    cases = [
        "hello [UNK] world",
        "add [SEP] salt",
        "[CLS] mix [MASK] stir [SEP]",
        "a [MASK]!",        # attached punctuation -> NOT protected (both split)
        "[SEP]x",           # not whitespace-delimited -> NOT protected
        "[PAD] is protected (from_pretrained 5-token set)",
        "x\t[SEP]\ny",
    ]
    for text in cases:
        assert native_tok.tokenize(text) == python_tok.tokenize(text), text


def test_custom_never_split_passes_through_to_native(vocab_file):
    """ADVICE r1: a custom never_split set must reach the C++ tokenizer,
    not silently fall back to its compiled-in default."""
    default = WordPieceTokenizer(vocab_file)
    custom = WordPieceTokenizer(vocab_file, never_split=("[UNK]",))
    if default._native is None:
        pytest.skip("native tokenizer unavailable (no g++?)")
    assert custom._native is not None

    # default (from_pretrained set): [SEP] protected -> survives whole
    assert "[SEP]" in default.tokenize("add [SEP] salt")
    # custom set without [SEP]: lowercased + punctuation-split
    got = custom.tokenize("add [SEP] salt")
    assert "[SEP]" not in got, got  # split to '['->UNK, 'sep' pieces, ']'->UNK
    # and the native path agrees with the Python fallback for the same set
    os.environ["UNIVL_TPU_NO_NATIVE"] = "1"
    try:
        py = WordPieceTokenizer(vocab_file, never_split=("[UNK]",))
    finally:
        del os.environ["UNIVL_TPU_NO_NATIVE"]
    assert got == py.tokenize("add [SEP] salt")


def test_native_unicode_parity(native_tok, python_tok):
    """The native path handles full UTF-8 (lowercase, NFD accent stripping,
    CJK spacing, unicode punctuation) identically to the Python path."""
    cases = [
        "café olé", "添加洋葱 then stir", "naïve mix", "ÜBER Äpfel",
        "İstanbul", "ЖИЗНЬ хорошо", "crème brûlée!", "ñoño 한국어",
        "ＦＵＬＬＷＩＤＴＨ text", "[SEP] café [UNK]", "𝔘𝔫𝔦𝔠𝔬𝔡𝔢",
        "em—dash and … ellipsis", "«guillemets»",
    ]
    for text in cases:
        assert native_tok.tokenize(text) == python_tok.tokenize(text), text


def test_native_unicode_fallback_paths(native_tok, python_tok):
    """Cases the per-codepoint tables cannot express return None from the
    native layer (the wrapper falls back) and stay correct end-to-end:
    context-sensitive sigma lowercasing, codepoints beyond the table."""
    cases = ["ΣΟΦΟΣ σοφος", "beyond \U00030001 table",
             "lone \ud800 surrogate"]  # unencodable -> must not crash
    for text in cases:
        assert native_tok._native.tokenize_ids(text) is None
        assert native_tok.tokenize(text) == python_tok.tokenize(text)


def test_native_random_unicode_fuzz(native_tok, python_tok, rng):
    """Random codepoint soup: parity wherever the native path answers, no
    crashes anywhere."""
    for i in range(150):
        n = rng.randint(1, 30)
        hi = 0x110000 if i % 5 == 0 else 0x3000
        cps = rng.randint(1, hi, n)
        s = "".join(chr(c) for c in cps if not (0xD800 <= c <= 0xDFFF))
        assert native_tok.tokenize(s) == python_tok.tokenize(s), ascii(s)


def test_native_random_corpus(native_tok, python_tok, rng):
    words = list(python_tok.vocab.keys())[5:40] + ["stirring", "xyzzy", "a1b2"]
    for _ in range(200):
        n = rng.randint(1, 12)
        text = " ".join(words[i] for i in rng.randint(0, len(words), n))
        assert native_tok.tokenize(text) == python_tok.tokenize(text)


def test_native_is_faster(native_tok, python_tok):
    """Informational speed check; asserts only a sane lower bound."""
    import time

    text = "add the chopped onions and stir well then pour some olive oil " * 5
    for tok, label in ((native_tok, "native"), (python_tok, "python")):
        t0 = time.perf_counter()
        for _ in range(300):
            tok.tokenize(text)
        dt = time.perf_counter() - t0
        if label == "native":
            native_t = dt
        else:
            python_t = dt
    # native should not be slower; typically 10-50x faster
    assert native_t < python_t, (native_t, python_t)


def test_native_thread_safety(native_tok, python_tok):
    """Concurrent tokenization from many threads must be corruption-free
    (the Batcher tokenizes from a thread pool; regression test for a shared
    output-buffer race)."""
    from concurrent.futures import ThreadPoolExecutor

    texts = [f"add the chopped onions {i} and stir well then pour" for i in range(64)]
    expect = [python_tok.tokenize(t) for t in texts]
    for _ in range(20):
        with ThreadPoolExecutor(max_workers=16) as ex:
            got = list(ex.map(native_tok.tokenize, texts))
        assert got == expect


def test_native_nul_byte_falls_back_to_python(native_tok, python_tok):
    """Embedded NUL bytes: c_char_p is NUL-terminated, so the C side used
    to silently truncate 'add\\x00salt' to ['add'] while the Python path
    drops the control char and tokenizes the rest (round-5 review
    finding, violating the byte-identical invariant). tokenize_ids now
    declines such inputs and the wrapper takes the Python path."""
    for text in ("add\x00salt", "\x00", "mix\x00", "\x00stir the pot"):
        assert native_tok.tokenize(text) == python_tok.tokenize(text), text
