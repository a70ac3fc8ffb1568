"""ctypes bindings for the native (C++) data-path components.

Builds csrc/wordpiece.cc on first use into a cached shared library
(~/.cache/univl_tpu). No pybind11 dependency — plain C ABI + ctypes.

The native tokenizer is an ASCII fast path with exact BERT semantics;
non-ASCII strings return -1 and callers fall back to the Python tokenizer
(univl_tpu/data/tokenization.py), so results are always identical.
"""

from __future__ import annotations

import ctypes
import hashlib
import os
import subprocess
import threading
from typing import List, Optional

_CSRC = os.path.join(os.path.dirname(__file__), "..", "..", "csrc")
_LOCK = threading.Lock()
_LIB = None
_BUILD_FAILED = False

# ---------------------------------------------------------------- #
# Unicode tables for the native UTF-8 path. Python's unicodedata is the
# source of truth, so the C++ tokenizer agrees with the Python one by
# construction; the blob is generated once and cached on disk.
#
# Per codepoint (0 .. _TABLE_MAX):
#   flags byte: 1 whitespace (incl. Zl/Zp, which str.split treats as
#     separators), 2 drop (NUL / U+FFFD / control), 4 punctuation,
#     8 CJK, 16 needs-python (context-sensitive lowercasing [final sigma]
#     or a non-Mn combining char whose canonical reordering could cross
#     character boundaries — the C++ path rejects the string and the
#     caller falls back)
#   mapping: the composed lower() -> NFD -> strip-Mn output sequence used
#     when do_lower_case=True (index -1 = identity).
# ---------------------------------------------------------------- #

_TABLE_MAX = 0x30000  # covers BMP + all CJK extension ranges the algo names
_TABLE_VERSION = 1


def _build_unicode_blob() -> bytes:
    import struct
    import unicodedata

    from univl_tpu.data import tokenization as T

    flags = bytearray(_TABLE_MAX)
    map_off = []
    map_len = bytearray(_TABLE_MAX)
    pool: list[int] = []

    for cp in range(_TABLE_MAX):
        ch = chr(cp)
        f = 0
        if T._is_whitespace(ch) or (ch.isspace() and not T._is_control(ch)):
            f |= 1
        if cp == 0 or cp == 0xFFFD or T._is_control(ch):
            f |= 2
        if T._is_punctuation(ch):
            f |= 4
        if T._is_cjk(cp):
            f |= 8
        if cp == 0x03A3:  # capital sigma: str.lower() is context-sensitive
            f |= 16
        if unicodedata.combining(ch) != 0 and unicodedata.category(ch) != "Mn":
            f |= 16  # non-Mn combiner: NFD reordering may cross characters
        flags[cp] = f

        out = [
            c
            for c in unicodedata.normalize("NFD", ch.lower())
            if unicodedata.category(c) != "Mn"
        ]
        out_cps = [ord(c) for c in out]
        if any(o >= _TABLE_MAX for o in out_cps):
            flags[cp] |= 16  # mapping escapes the table -> python fallback
            f |= 16
        if out_cps == [cp]:
            map_off.append(-1)
            map_len[cp] = 0
        else:
            if len(out_cps) > 255:  # impossible in practice
                out_cps = out_cps[:255]
            map_off.append(len(pool))
            map_len[cp] = len(out_cps)
            pool.extend(out_cps)

    head = struct.pack("<IIII", 0x55544B31, _TABLE_VERSION, _TABLE_MAX, len(pool))
    body = (
        bytes(flags)
        + b"".join(struct.pack("<i", o) for o in map_off)
        + bytes(map_len)
        + b"".join(struct.pack("<I", c) for c in pool)
    )
    return head + body


def _unicode_blob_path() -> str:
    import unicodedata

    return os.path.join(
        os.path.expanduser("~/.cache/univl_tpu"),
        f"unicode-{_TABLE_VERSION}-{unicodedata.unidata_version}.bin",
    )


def _load_unicode_blob() -> bytes:
    path = _unicode_blob_path()
    if os.path.exists(path):
        with open(path, "rb") as f:
            return f.read()
    blob = _build_unicode_blob()
    os.makedirs(os.path.dirname(path), exist_ok=True)
    tmp = path + f".tmp{os.getpid()}"
    with open(tmp, "wb") as f:
        f.write(blob)
    os.replace(tmp, path)
    return blob


def _build_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _BUILD_FAILED
    with _LOCK:
        if _LIB is not None or _BUILD_FAILED:
            return _LIB
        src = os.path.abspath(os.path.join(_CSRC, "wordpiece.cc"))
        if not os.path.exists(src):
            _BUILD_FAILED = True
            return None
        with open(src, "rb") as f:
            tag = hashlib.sha256(f.read()).hexdigest()[:16]
        cache = os.path.join(
            os.path.expanduser("~/.cache/univl_tpu"), f"wordpiece-{tag}.so"
        )
        def compile_to(dest):
            # pid-suffixed tmp (like _load_unicode_blob): two cold-cache
            # processes racing the same tmp path would interleave g++
            # output and os.replace a corrupt half-written .so into the
            # cache, silently losing the native path forever
            tmp = dest + f".tmp{os.getpid()}"
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", tmp],
                check=True, capture_output=True,
            )
            os.replace(tmp, dest)

        if not os.path.exists(cache):
            os.makedirs(os.path.dirname(cache), exist_ok=True)
            try:
                compile_to(cache)
            except Exception:
                _BUILD_FAILED = True
                return None
        try:
            lib = ctypes.CDLL(cache)
        except OSError:
            # a stale/corrupt cached .so (e.g. from a pre-fix racing
            # build): rebuild once in place before giving up
            try:
                compile_to(cache)
                lib = ctypes.CDLL(cache)
            except Exception:
                _BUILD_FAILED = True
                return None
        lib.wp_create.restype = ctypes.c_void_p
        lib.wp_create.argtypes = [ctypes.c_char_p, ctypes.c_int]
        lib.wp_create_utf8.restype = ctypes.c_void_p
        lib.wp_create_utf8.argtypes = [
            ctypes.c_char_p, ctypes.c_int, ctypes.c_char_p, ctypes.c_int64,
        ]
        lib.wp_set_never_split.argtypes = [ctypes.c_void_p, ctypes.c_char_p]
        lib.wp_free.argtypes = [ctypes.c_void_p]
        lib.wp_tokenize.restype = ctypes.c_int
        lib.wp_tokenize.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ]
        _LIB = lib
        return _LIB


class NativeWordPiece:
    """Native tokenizer handle. Returns None from tokenize_ids when the
    input needs the Python fallback (rare unicode corners, invalid UTF-8,
    or token-count overflow).

    Thread-safe: the tokenizer handle is immutable after construction and
    the output buffer is thread-local (dataset readers tokenize from the
    Batcher's thread pool concurrently)."""

    MAX_TOKENS = 4096

    def __init__(
        self,
        vocab_tokens: List[str],
        do_lower_case: bool = True,
        never_split: Optional[List[str]] = None,
    ):
        lib = _build_lib()
        if lib is None:
            raise RuntimeError("native wordpiece unavailable")
        self._lib = lib
        vocab_blob = "\n".join(vocab_tokens).encode("utf-8")
        handle = None
        try:
            tables = _load_unicode_blob()
            handle = lib.wp_create_utf8(
                vocab_blob, 1 if do_lower_case else 0, tables, len(tables)
            )
        except Exception:
            handle = None
        if not handle:  # tables unavailable -> ASCII-only tokenizer
            handle = lib.wp_create(vocab_blob, 1 if do_lower_case else 0)
        if never_split is not None:
            # mirror the Python tokenizer's configured set so the native and
            # fallback paths can never diverge (reference from_pretrained
            # uses 5 tokens incl. [PAD], modules/tokenization.py:157)
            lib.wp_set_never_split(
                handle, "\n".join(never_split).encode("utf-8")
            )
        self._handle = handle
        self._tls = threading.local()

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.wp_free(self._handle)
        except Exception:
            pass

    def tokenize_ids(self, text: str) -> Optional[List[int]]:
        try:
            raw = text.encode("utf-8")
        except UnicodeEncodeError:  # lone surrogates etc. -> Python path
            return None
        if b"\x00" in raw:
            # c_char_p is NUL-terminated: the C side would silently
            # truncate at the embedded NUL while the Python path drops
            # the control char and tokenizes the rest -> divergent ids.
            # Rare enough to just take the Python fallback.
            return None
        buf = getattr(self._tls, "buf", None)
        if buf is None:
            buf = (ctypes.c_int32 * self.MAX_TOKENS)()
            self._tls.buf = buf
        n = self._lib.wp_tokenize(self._handle, raw, buf, self.MAX_TOKENS)
        if n < 0:
            return None
        return list(buf[:n])


def available() -> bool:
    return _build_lib() is not None
