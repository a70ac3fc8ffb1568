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
        if not os.path.exists(cache):
            os.makedirs(os.path.dirname(cache), exist_ok=True)
            tmp = cache + ".tmp"
            try:
                subprocess.run(
                    ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", src, "-o", tmp],
                    check=True, capture_output=True,
                )
                os.replace(tmp, cache)
            except Exception:
                _BUILD_FAILED = True
                return None
        try:
            lib = ctypes.CDLL(cache)
        except OSError:
            _BUILD_FAILED = True
            return None
        lib.wp_create.restype = ctypes.c_void_p
        lib.wp_create.argtypes = [ctypes.c_char_p, ctypes.c_int]
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
    input needs the Python fallback (non-ASCII or overflow).

    Thread-safe: the tokenizer handle is immutable after construction and
    the output buffer is thread-local (dataset readers tokenize from the
    Batcher's thread pool concurrently)."""

    MAX_TOKENS = 4096

    def __init__(self, vocab_tokens: List[str], do_lower_case: bool = True):
        lib = _build_lib()
        if lib is None:
            raise RuntimeError("native wordpiece unavailable")
        self._lib = lib
        blob = "\n".join(vocab_tokens).encode("utf-8")
        self._handle = lib.wp_create(blob, 1 if do_lower_case else 0)
        self._tls = threading.local()

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.wp_free(self._handle)
        except Exception:
            pass

    def tokenize_ids(self, text: str) -> Optional[List[int]]:
        try:
            raw = text.encode("ascii")
        except UnicodeEncodeError:
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
