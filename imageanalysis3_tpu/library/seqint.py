"""DNA 2-bit k-mer packing: ctypes bindings for the native kernel.

Behavior target: reference library_tools/C_Tools/seqint.pyx:1-56
(seq2Int / seq2Int_rc) — the only compiled extension in the reference.
Here the kernel is C++ (native/seqint.cpp), compiled on first use with
g++ into a cached shared library and loaded via ctypes; a vectorized
NumPy fallback keeps everything working without a toolchain.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import tempfile
from typing import Optional, Tuple

import numpy as np

_SRC = os.path.join(os.path.dirname(__file__), "native", "seqint.cpp")

_BASE_LUT = np.zeros(256, np.uint64)
for b, v in (("C", 1), ("G", 2), ("T", 3)):
    _BASE_LUT[ord(b)] = v
    _BASE_LUT[ord(b.lower())] = v
_BASE_LUT_RC = np.zeros(256, np.uint64)
for b, v in (("A", 3), ("C", 2), ("G", 1)):
    _BASE_LUT_RC[ord(b)] = v
    _BASE_LUT_RC[ord(b.lower())] = v

_lib = None
_lib_tried = False


def _cache_path() -> str:
    """User-owned 0700 cache directory (never a world-writable tmpdir:
    a pre-planted .so there would be CDLL'd with this process's
    privileges)."""
    base = os.environ.get("XDG_CACHE_HOME",
                          os.path.join(os.path.expanduser("~"), ".cache"))
    d = os.path.join(base, "ia3tpu")
    os.makedirs(d, mode=0o700, exist_ok=True)
    return os.path.join(d, "seqint.so")


def _build_lib() -> Optional[ctypes.CDLL]:
    global _lib, _lib_tried
    if _lib is not None or _lib_tried:
        return _lib
    _lib_tried = True
    try:
        cache = _cache_path()
        if (not os.path.exists(cache)
                or os.path.getmtime(cache) < os.path.getmtime(_SRC)):
            # compile to a private temp file, then atomically publish
            fd, tmp = tempfile.mkstemp(suffix=".so",
                                       dir=os.path.dirname(cache))
            os.close(fd)
            subprocess.run(
                ["g++", "-O3", "-shared", "-fPIC", "-o", tmp, _SRC],
                check=True, capture_output=True)
            os.replace(tmp, cache)
        st = os.stat(cache)
        if st.st_uid != os.getuid() or (st.st_mode & 0o022):
            raise PermissionError("seqint cache not exclusively "
                                  "user-owned; refusing to load")
        lib = ctypes.CDLL(cache)
        lib.seq2int.restype = ctypes.c_uint64
        lib.seq2int.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.seq2int_rc.restype = ctypes.c_uint64
        lib.seq2int_rc.argtypes = [ctypes.c_char_p, ctypes.c_int64]
        lib.seq_to_kmers.restype = ctypes.c_int64
        lib.seq_to_kmers.argtypes = [
            ctypes.c_char_p, ctypes.c_int64, ctypes.c_int,
            ctypes.POINTER(ctypes.c_uint64),
            ctypes.POINTER(ctypes.c_uint64)]
        lib.count_kmers_dense.restype = None
        lib.count_kmers_dense.argtypes = [
            ctypes.POINTER(ctypes.c_uint64), ctypes.c_int64,
            ctypes.POINTER(ctypes.c_uint16), ctypes.c_uint64]
        _lib = lib
    except Exception:
        _lib = None
    return _lib


def _as_bytes(seq) -> bytes:
    if isinstance(seq, bytes):
        return seq
    return str(seq).encode()


def seq2int(seq) -> int:
    """Pack a sequence into a 2-bit integer (reference seq2Int)."""
    b = _as_bytes(seq)
    lib = _build_lib()
    if lib is not None:
        return int(lib.seq2int(b, len(b)))
    codes = _BASE_LUT[np.frombuffer(b, np.uint8)]
    v = 0
    for c in codes:
        v = (v << 2) | int(c)
    return v


def seq2int_rc(seq) -> int:
    """Pack the reverse complement (reference seq2Int_rc)."""
    b = _as_bytes(seq)
    lib = _build_lib()
    if lib is not None:
        return int(lib.seq2int_rc(b, len(b)))
    codes = _BASE_LUT_RC[np.frombuffer(b, np.uint8)][::-1]
    v = 0
    for c in codes:
        v = (v << 2) | int(c)
    return v


def seq_to_kmer_ints(seq, word: int,
                     with_rc: bool = True
                     ) -> Tuple[np.ndarray, Optional[np.ndarray]]:
    """All k-mer codes of `seq` -> (fw (N,), rc (N,) or None), uint64.

    Native rolling kernel when available; otherwise a vectorized NumPy
    sliding-window dot with the 4^j weight vector.
    """
    b = _as_bytes(seq)
    n = len(b)
    if n < word:
        empty = np.zeros(0, np.uint64)
        return empty, (empty.copy() if with_rc else None)
    m = n - word + 1
    lib = _build_lib()
    if lib is not None:
        fw = np.empty(m, np.uint64)
        rc = np.empty(m, np.uint64) if with_rc else None
        lib.seq_to_kmers(
            b, n, word,
            fw.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            rc.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))
            if with_rc else None)
        return fw, rc
    arr = np.frombuffer(b, np.uint8)
    codes = _BASE_LUT[arr].astype(np.uint64)
    weights = (4 ** np.arange(word - 1, -1, -1)).astype(np.uint64)
    win = np.lib.stride_tricks.sliding_window_view(codes, word)
    fw = (win * weights[None]).sum(axis=1).astype(np.uint64)
    if not with_rc:
        return fw, None
    codes_rc = _BASE_LUT_RC[arr].astype(np.uint64)
    w_rc = (4 ** np.arange(word)).astype(np.uint64)
    win_rc = np.lib.stride_tricks.sliding_window_view(codes_rc, word)
    rc = (win_rc * w_rc[None]).sum(axis=1).astype(np.uint64)
    return fw, rc


def count_kmers_dense(kmers: np.ndarray, table: np.ndarray) -> None:
    """Saturating scatter-add of k-mer codes into a dense uint16 table."""
    kmers = np.ascontiguousarray(kmers, np.uint64)
    lib = _build_lib()
    if lib is not None:
        lib.count_kmers_dense(
            kmers.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64)),
            len(kmers),
            table.ctypes.data_as(ctypes.POINTER(ctypes.c_uint16)),
            table.size)
        return
    pos, cts = np.unique(kmers, return_counts=True)
    pos = pos[pos < table.size]
    cts = cts[:len(pos)]
    merged = table[pos].astype(np.uint32) + cts
    table[pos] = np.clip(merged, 0, 65535).astype(np.uint16)


def native_available() -> bool:
    return _build_lib() is not None
