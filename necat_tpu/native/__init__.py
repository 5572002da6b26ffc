"""Native (C++) runtime components, loaded via ctypes.

The reference's runtime is entirely native C/C++ (SURVEY.md §2); here the
device compute is JAX/Pallas, and the host-side IO/runtime hot paths live in
this package: a kseq-equivalent FASTA/FASTQ/gz parser + 2-bit encoder
(seqio_native.cpp). The shared library is built on demand with g++ (no
pybind11/pip in this environment) and cached next to the sources; set
NECAT_TPU_NO_NATIVE=1 to force the pure-Python fallbacks.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import List, Optional, Tuple

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRCS = [os.path.join(_DIR, "seqio_native.cpp"),
         os.path.join(_DIR, "kmer_index_native.cpp")]
_SO = os.path.join(_DIR, "_necat_native.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        src_m = max(os.path.getmtime(s) for s in _SRCS)
        if os.path.exists(_SO) and os.path.getmtime(_SO) >= src_m:
            return True
        cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", *_SRCS,
               "-lz", "-lpthread", "-o", _SO + ".tmp"]
        subprocess.run(cmd, check=True, capture_output=True, timeout=300)
        os.replace(_SO + ".tmp", _SO)
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    if _lib is not None or _tried:
        return _lib
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if os.environ.get("NECAT_TPU_NO_NATIVE"):
            return None
        if not _build():
            return None
        try:
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.nt_parse_seq_file.restype = ctypes.c_int
        lib.nt_parse_seq_file.argtypes = [
            ctypes.c_char_p,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_uint8)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.POINTER(ctypes.c_int64),
        ]
        lib.nt_free.restype = None
        lib.nt_free.argtypes = [ctypes.c_void_p]
        lib.ntk_build_kmer_index.restype = ctypes.c_int
        lib.ntk_build_kmer_index.argtypes = [
            ctypes.POINTER(ctypes.c_uint8), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int64), ctypes.c_int64,
            ctypes.c_int, ctypes.c_int, ctypes.c_int,
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int32)),
            ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.POINTER(ctypes.c_int64)),
        ]
        lib.ntk_free.restype = None
        lib.ntk_free.argtypes = [ctypes.c_void_p]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def read_seq_file(path: str) -> Optional[Tuple[List[str], np.ndarray, np.ndarray]]:
    """Parse FASTA/FASTQ(.gz) natively. Returns (names, bases u8, offsets i64),
    or None when the native library is unavailable (caller falls back)."""
    lib = _load()
    if lib is None:
        return None
    bases_p = ctypes.POINTER(ctypes.c_uint8)()
    total = ctypes.c_int64()
    offs_p = ctypes.POINTER(ctypes.c_int64)()
    n_reads = ctypes.c_int64()
    names_p = ctypes.c_char_p()
    names_len = ctypes.c_int64()
    rc = lib.nt_parse_seq_file(os.fspath(path).encode(),
                               ctypes.byref(bases_p), ctypes.byref(total),
                               ctypes.byref(offs_p), ctypes.byref(n_reads),
                               ctypes.byref(names_p), ctypes.byref(names_len))
    if rc != 0:
        return None
    try:
        n = int(n_reads.value)
        t = int(total.value)
        bases = np.ctypeslib.as_array(bases_p, shape=(max(t, 1),))[:t].copy()
        offsets = np.ctypeslib.as_array(offs_p, shape=(n + 1,)).copy()
        blob = ctypes.string_at(names_p, int(names_len.value)).decode()
        names = blob.split("\n") if blob else ([""] * n if n else [])
    finally:
        lib.nt_free(ctypes.cast(bases_p, ctypes.c_void_p))
        lib.nt_free(ctypes.cast(offs_p, ctypes.c_void_p))
        lib.nt_free(ctypes.cast(names_p, ctypes.c_void_p))
    return names, bases, offsets


def build_kmer_index(bases: np.ndarray, offsets: np.ndarray, k: int,
                     n_bucket_bits: int, n_threads: int = 0
                     ) -> Optional[Tuple[np.ndarray, np.ndarray, np.ndarray]]:
    """Sorted (hashes i32, positions i32, bucket_starts i64) of all k-mers, or
    None when the native library is unavailable (caller falls back to numpy).
    Multithreaded LSD radix sort — the role of the reference's
    hash_list_bucket_sort.c (see kmer_index_native.cpp)."""
    lib = _load()
    if lib is None:
        return None
    bases = np.ascontiguousarray(bases, dtype=np.uint8)
    offsets = np.ascontiguousarray(offsets, dtype=np.int64)
    oh = ctypes.POINTER(ctypes.c_int32)()
    op = ctypes.POINTER(ctypes.c_int32)()
    n = ctypes.c_int64()
    bs = ctypes.POINTER(ctypes.c_int64)()
    rc = lib.ntk_build_kmer_index(
        bases.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)), len(bases),
        offsets.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        len(offsets) - 1, k, n_bucket_bits, n_threads,
        ctypes.byref(oh), ctypes.byref(op), ctypes.byref(n), ctypes.byref(bs))
    if rc != 0:
        return None
    try:
        m = int(n.value)
        hashes = np.ctypeslib.as_array(oh, shape=(max(m, 1),))[:m].copy()
        positions = np.ctypeslib.as_array(op, shape=(max(m, 1),))[:m].copy()
        nbk = (1 << n_bucket_bits) + 1
        bucket_starts = np.ctypeslib.as_array(bs, shape=(nbk,)).copy()
    finally:
        lib.ntk_free(ctypes.cast(oh, ctypes.c_void_p))
        lib.ntk_free(ctypes.cast(op, ctypes.c_void_p))
        lib.ntk_free(ctypes.cast(bs, ctypes.c_void_p))
    return hashes, positions, bucket_starts
