"""ctypes bindings for the native C++ data layer (native/sgdnet_native.cpp).

Builds the shared library on first use with g++ (cached next to the source);
every entry point has a pure-numpy fallback so the framework works without a
compiler.  See native/sgdnet_native.cpp for what lives natively and why.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_LOCK = threading.Lock()
_LIB = None
_TRIED = False

_SRC = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    "native",
    "sgdnet_native.cpp",
)
_SO = os.path.join(os.path.dirname(_SRC), "_sgdnet_native.so")


class _ParseResult(ctypes.Structure):
    _fields_ = [
        ("n_rows", ctypes.c_int64),
        ("n_cols", ctypes.c_int64),
        ("nnz", ctypes.c_int64),
        ("indptr", ctypes.POINTER(ctypes.c_int64)),
        ("indices", ctypes.POINTER(ctypes.c_int32)),
        ("values", ctypes.POINTER(ctypes.c_double)),
        ("labels", ctypes.POINTER(ctypes.c_double)),
        ("error", ctypes.c_char_p),
    ]


def _build() -> bool:
    if not os.path.exists(_SRC):
        return False
    if os.path.exists(_SO) and os.path.getmtime(_SO) >= os.path.getmtime(_SRC):
        return True
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-std=c++17", "-shared", "-fPIC", "-pthread", _SRC, "-o", _SO],
            check=True,
            capture_output=True,
        )
        return True
    except (subprocess.CalledProcessError, FileNotFoundError):
        return False


def get_lib():
    """Load (building if needed) the native library, or None."""
    global _LIB, _TRIED
    with _LOCK:
        if _TRIED:
            return _LIB
        _TRIED = True
        if not _build():
            return None
        lib = ctypes.CDLL(_SO)
        lib.sgdnet_parse_libsvm.restype = ctypes.POINTER(_ParseResult)
        lib.sgdnet_parse_libsvm.argtypes = [ctypes.c_char_p, ctypes.c_int64, ctypes.c_int32]
        lib.sgdnet_free_parse_result.argtypes = [ctypes.POINTER(_ParseResult)]
        lib.sgdnet_pack_padded.argtypes = [
            np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float64),
            ctypes.c_int64,
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float32),
            np.ctypeslib.ndpointer(np.int32),
            ctypes.c_int32,
        ]
        lib.sgdnet_csr_column_stats.argtypes = [
            np.ctypeslib.ndpointer(np.int64),
            np.ctypeslib.ndpointer(np.int32),
            np.ctypeslib.ndpointer(np.float64),
            ctypes.c_int64,
            ctypes.c_int64,
            np.ctypeslib.ndpointer(np.float64),
            np.ctypeslib.ndpointer(np.float64),
        ]
        _LIB = lib
        return _LIB


def load_libsvm(path_or_bytes, n_threads: int = 0):
    """Parse a libsvm/svmlight file -> (scipy CSR, labels).

    Uses the multithreaded native parser when available, else
    sklearn/pure-python fallback.
    """
    import scipy.sparse as sp

    if isinstance(path_or_bytes, (str, os.PathLike)):
        with open(path_or_bytes, "rb") as f:
            buf = f.read()
    else:
        buf = bytes(path_or_bytes)

    lib = get_lib()
    if lib is None:
        from sklearn.datasets import load_svmlight_file
        import io

        x, y = load_svmlight_file(io.BytesIO(buf))
        return x.tocsr(), y

    res = lib.sgdnet_parse_libsvm(buf, len(buf), n_threads)
    try:
        r = res.contents
        if r.error:
            raise ValueError(f"libsvm parse error: {r.error.decode()}")
        n, p, nnz = r.n_rows, r.n_cols, r.nnz
        indptr = np.ctypeslib.as_array(r.indptr, (n + 1,)).copy()
        indices = np.ctypeslib.as_array(r.indices, (max(nnz, 1),))[:nnz].copy()
        values = np.ctypeslib.as_array(r.values, (max(nnz, 1),))[:nnz].copy()
        labels = np.ctypeslib.as_array(r.labels, (max(n, 1),))[:n].copy()
        x = sp.csr_matrix((values, indices, indptr), shape=(n, p))
        return x, labels
    finally:
        lib.sgdnet_free_parse_result(res)


def pack_padded(x_csr, row_width: int, n_threads: int = 0):
    """CSR -> (indices (n, L) int32, values (n, L) f32, nnz (n,) int32)."""
    n = x_csr.shape[0]
    indptr = np.ascontiguousarray(x_csr.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(x_csr.indices, dtype=np.int32)
    values = np.ascontiguousarray(x_csr.data, dtype=np.float64)
    out_i = np.zeros((n, row_width), np.int32)
    out_v = np.zeros((n, row_width), np.float32)
    out_n = np.zeros((n,), np.int32)

    lib = get_lib()
    if lib is None:
        nnz = np.diff(indptr)
        rows = np.repeat(np.arange(n), nnz)
        pos = np.arange(len(values)) - np.repeat(indptr[:-1], nnz)
        keep = pos < row_width
        out_i[rows[keep], pos[keep]] = indices[keep]
        out_v[rows[keep], pos[keep]] = values[keep]
        out_n[:] = np.minimum(nnz, row_width)
        return out_i, out_v, out_n

    lib.sgdnet_pack_padded(indptr, indices, values, n, row_width, out_i, out_v, out_n, n_threads)
    return out_i, out_v, out_n


def csr_column_stats(x_csr):
    """Sparse-aware per-column (mean, population SD counting zeros)."""
    n, p = x_csr.shape
    lib = get_lib()
    indptr = np.ascontiguousarray(x_csr.indptr, dtype=np.int64)
    indices = np.ascontiguousarray(x_csr.indices, dtype=np.int32)
    values = np.ascontiguousarray(x_csr.data, dtype=np.float64)
    if lib is None:
        mean = np.asarray(x_csr.sum(axis=0)).ravel() / n
        sq = np.asarray(x_csr.multiply(x_csr).sum(axis=0)).ravel() / n
        var = np.maximum(sq - mean**2, 0.0)
        sd = np.where(var == 0.0, 1.0, np.sqrt(var))
        return mean, sd
    mean = np.zeros(p)
    sd = np.zeros(p)
    lib.sgdnet_csr_column_stats(indptr, indices, values, n, p, mean, sd)
    return mean, sd
