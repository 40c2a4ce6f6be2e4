"""ctypes binding for the native C++ BPE tokenizer.

Builds `leaf_tpu/tokenizer/native/libbpe_tokenizer.so` on first use
(g++ -O2; ~1s) and caches it next to the source.  The native path
handles lower/whitespace-cleaned ASCII text — the attack hot loop's
entire workload; the Python tokenizer remains the source of truth and
the fallback (see `bpe.py`).  Parity: tests/test_native_tokenizer.py.
"""
from __future__ import annotations

import ctypes
import functools
import gzip
import logging
import os
import subprocess
from typing import Optional, Sequence

import numpy as np

LOG = logging.getLogger(__name__)

_NATIVE_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "native")
_SRC = os.path.join(_NATIVE_DIR, "bpe_tokenizer.cpp")
_SO = os.path.join(_NATIVE_DIR, "libbpe_tokenizer.so")
_MERGES = os.path.join(_NATIVE_DIR, "merges.txt")


def _ensure_merges(bpe_gz_path: str) -> str:
    """Extract the merge table; keyed by SOURCE path so a tokenizer
    built with a custom vocab never gets the default table."""
    import hashlib
    key = hashlib.sha1(os.path.abspath(bpe_gz_path).encode()).hexdigest()[:12]
    merges = (_MERGES if os.path.abspath(bpe_gz_path).endswith(
        "bpe_simple_vocab_16e6.txt.gz") else
        os.path.join(_NATIVE_DIR, f"merges_{key}.txt"))
    if not os.path.exists(merges):
        with gzip.open(bpe_gz_path, "rt", encoding="utf-8") as f:
            lines = f.read().split("\n")
        tmp = f"{merges}.{os.getpid()}.tmp"   # unique: no cross-proc race
        with open(tmp, "w", encoding="utf-8") as f:
            f.write("\n".join(lines[1:48894 + 1]))
        os.replace(tmp, merges)
    return merges


def _ensure_built() -> Optional[str]:
    try:
        if os.path.exists(_SO) and (not os.path.exists(_SRC)
                                    or os.path.getmtime(_SO)
                                    >= os.path.getmtime(_SRC)):
            # a prebuilt .so without sources is a valid deployment
            return _SO
        # compile to a unique temp name + atomic rename: a concurrent
        # process must never dlopen a partially written library
        tmp = f"{_SO}.{os.getpid()}.tmp"
        subprocess.run(
            ["g++", "-O2", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", tmp],
            check=True, capture_output=True, timeout=120)
        os.replace(tmp, _SO)
        return _SO
    except Exception as e:  # noqa: BLE001
        LOG.warning("native tokenizer build failed (%r); using Python path", e)
        return None


class NativeBPE:
    """Thin wrapper over the shared library; returns None from
    `create()` when unavailable."""

    def __init__(self, lib, handle):
        self._lib = lib
        self._h = handle

    @classmethod
    def create(cls, bpe_gz_path: str) -> Optional["NativeBPE"]:
        so = _ensure_built()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError as e:  # pragma: no cover
            LOG.warning("cannot load native tokenizer (%r)", e)
            return None
        lib.bpe_create.restype = ctypes.c_void_p
        lib.bpe_create.argtypes = [ctypes.c_char_p]
        lib.bpe_destroy.argtypes = [ctypes.c_void_p]
        lib.bpe_encode_batch.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.c_int, ctypes.POINTER(ctypes.c_int32)]
        lib.bpe_encode_one.restype = ctypes.c_int
        lib.bpe_encode_one.argtypes = [
            ctypes.c_void_p, ctypes.c_char_p,
            ctypes.POINTER(ctypes.c_int32), ctypes.c_int]
        lib.bpe_encode_edits.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32)]
        merges = _ensure_merges(bpe_gz_path)
        h = lib.bpe_create(merges.encode())
        if not h:
            LOG.warning("native tokenizer init failed")
            return None
        return cls(lib, h)

    def encode_batch(self, texts: Sequence[str], context_length: int
                     ) -> np.ndarray:
        n = len(texts)
        out = np.zeros((n, context_length), dtype=np.int32)
        arr = (ctypes.c_char_p * n)(*[t.encode("utf-8") for t in texts])
        self._lib.bpe_encode_batch(
            self._h, arr, n, context_length,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out

    def encode_edits(self, sentences: Sequence[str], zs: np.ndarray,
                     cps: np.ndarray, context_length: int,
                     alternative: int = -1) -> np.ndarray:
        """Fused k=1 edit + tokenize: sentences [B], zs/cps [B, rho] →
        tokens [B*rho, ctx] (see bpe_tokenizer.cpp::bpe_encode_edits)."""
        B, rho = zs.shape
        out = np.zeros((B * rho, context_length), dtype=np.int32)
        arr = (ctypes.c_char_p * B)(*[s.encode("utf-8") for s in sentences])
        zs32 = np.ascontiguousarray(zs, dtype=np.int32)
        cps32 = np.ascontiguousarray(cps, dtype=np.int32)
        self._lib.bpe_encode_edits(
            self._h, arr, B,
            zs32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cps32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            rho, alternative, context_length,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
        return out

    def encode(self, text: str) -> list:
        cap = 1024
        buf = (ctypes.c_int32 * cap)()
        n = self._lib.bpe_encode_one(self._h, text.encode("utf-8"), buf, cap)
        return list(buf[:min(n, cap)])

    def __del__(self):  # pragma: no cover
        try:
            self._lib.bpe_destroy(self._h)
        except Exception:  # noqa: BLE001
            pass


@functools.lru_cache()
def get_native(bpe_gz_path: str) -> Optional[NativeBPE]:
    if os.environ.get("LEAF_TPU_NO_NATIVE_TOKENIZER"):
        return None
    return NativeBPE.create(bpe_gz_path)


class NativeWordDict:
    """Native distinct-dictionary-word validity checker for the
    constrained attack (see bpe_tokenizer.cpp::wc_valid_edits)."""

    def __init__(self, lib, handle):
        self._lib = lib
        self._h = handle

    @classmethod
    def create(cls, words) -> Optional["NativeWordDict"]:
        if os.environ.get("LEAF_TPU_NO_NATIVE_TOKENIZER"):
            return None
        so = _ensure_built()
        if so is None:
            return None
        try:
            lib = ctypes.CDLL(so)
        except OSError:  # pragma: no cover
            return None
        if not hasattr(lib, "wc_create"):  # stale .so
            return None
        lib.wc_create.restype = ctypes.c_void_p
        lib.wc_create.argtypes = [ctypes.c_char_p]
        lib.wc_destroy.argtypes = [ctypes.c_void_p]
        lib.wc_valid_edits.argtypes = [
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
            ctypes.POINTER(ctypes.c_int32), ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)]
        import hashlib
        ascii_words = sorted(w for w in words if w.isascii())
        digest = hashlib.sha256(
            "\n".join(ascii_words).encode()).hexdigest()[:16]
        path = os.path.join(_NATIVE_DIR, f"words_{digest}.txt")
        if not os.path.exists(path):
            tmp = path + ".tmp"
            with open(tmp, "w") as f:
                f.write("\n".join(ascii_words))
            os.replace(tmp, path)
        h = lib.wc_create(path.encode())
        if not h:
            return None
        return cls(lib, h)

    def valid_edits(self, sentences: Sequence[str], zs: np.ndarray,
                    cps: np.ndarray, alternative: int = -1) -> np.ndarray:
        """sentences [B], zs/cps [B, rho] → bool mask [B, rho]: True iff
        the edit strictly decreases the distinct-dict-word count."""
        B, rho = zs.shape
        out = np.zeros((B * rho,), dtype=np.uint8)
        arr = (ctypes.c_char_p * B)(*[s.encode() for s in sentences])
        zs32 = np.ascontiguousarray(zs, dtype=np.int32)
        cps32 = np.ascontiguousarray(cps, dtype=np.int32)
        self._lib.wc_valid_edits(
            self._h, arr, B,
            zs32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            cps32.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            rho, alternative,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)))
        return out.reshape(B, rho).astype(bool)

    def __del__(self):  # pragma: no cover
        try:
            self._lib.wc_destroy(self._h)
        except Exception:  # noqa: BLE001
            pass
