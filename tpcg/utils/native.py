"""Host-side native (C++) fast paths with numpy fallbacks.

The reference's runtime-around-the-kernel is host C++ (interface.cuh's
alloc/copy/launch orchestration). tpcg's equivalent host layer is the packing
/ ingestion code here: a small C++ library (csrc/cbtd.cpp, built to
``libtpcg_host.so``) loaded via ctypes, with bit-identical numpy fallbacks so
the package works unbuilt.

Exposed ops:
  * csr_to_cbtd  — CSR -> canonical cbtd blocks (the ingestion the reference
    stubbed out at interface.cuh:9-20).
  * refflat_to_cbtd — reference flat layout -> canonical blocks.
"""

from __future__ import annotations

import ctypes
import os

import numpy as np

_LIB = None
_TRIED = False


def _find_lib():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    pkg = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    here = os.path.dirname(pkg)
    # wheel installs ship the library INSIDE the package (setup.py builds
    # csrc/cbtd.cpp to tpcg/libtpcg_host.so); source checkouts build it in
    # csrc/ via make
    for cand in (os.path.join(pkg, "libtpcg_host.so"),
                 os.path.join(here, "csrc", "libtpcg_host.so"),
                 os.path.join(here, "libtpcg_host.so")):
        if os.path.exists(cand):
            try:
                lib = ctypes.CDLL(cand)
                lib.tpcg_csr_to_cbtd.restype = ctypes.c_int
                lib.tpcg_csr_to_cbtd.argtypes = [
                    ctypes.POINTER(ctypes.c_int64),   # row_ptr
                    ctypes.POINTER(ctypes.c_int64),   # col_ind
                    ctypes.POINTER(ctypes.c_double),  # val
                    ctypes.c_int64,                   # n
                    ctypes.c_int64,                   # K
                    ctypes.POINTER(ctypes.c_double),  # out blocks
                ]
                _f64p = ctypes.POINTER(ctypes.c_double)
                for fname in ("tpcg_refflat_to_cbtd", "tpcg_cbtd_to_refflat",
                              "tpcg_dense_to_cbtd"):
                    f = getattr(lib, fname)
                    f.restype = ctypes.c_int
                    f.argtypes = [_f64p, ctypes.c_int64, ctypes.c_int64,
                                  _f64p]
                lib.tpcg_validate_cbtd.restype = ctypes.c_int
                lib.tpcg_validate_cbtd.argtypes = [
                    _f64p, ctypes.c_int64, ctypes.c_int64, ctypes.c_double]
                _LIB = lib
            except OSError:
                _LIB = None
            break
    return _LIB


def have_native() -> bool:
    return _find_lib() is not None


def csr_to_cbtd(row_ptr, col_ind, val, n: int, K: int) -> np.ndarray:
    """CSR -> blocks (K, 3, n, n), float64 host array. Raises ValueError on
    entries outside the block-tridiagonal band."""
    lib = _find_lib()
    row_ptr = np.ascontiguousarray(row_ptr, dtype=np.int64)
    col_ind = np.ascontiguousarray(col_ind, dtype=np.int64)
    val64 = np.ascontiguousarray(val, dtype=np.float64)
    if lib is not None:
        out = np.zeros((K, 3, n, n), dtype=np.float64)
        rc = lib.tpcg_csr_to_cbtd(
            row_ptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            col_ind.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
            val64.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n, K,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        if rc == 1:
            raise ValueError("CSR entry outside the block-tridiagonal band")
        if rc != 0:
            raise ValueError(
                "CSR column index out of range "
                f"(native converter error code {rc})")
        return out.astype(np.asarray(val).dtype, copy=False)
    return _csr_to_cbtd_numpy(row_ptr, col_ind, val64, n, K).astype(
        np.asarray(val).dtype, copy=False)


def _csr_to_cbtd_numpy(row_ptr, col_ind, val, n: int, K: int) -> np.ndarray:
    out = np.zeros((K, 3, n, n), dtype=np.float64)
    rows = np.repeat(np.arange(K * n), np.diff(row_ptr))
    cols = col_ind
    if cols.size and (cols.min() < 0 or cols.max() >= K * n):
        raise ValueError("CSR column index out of range "
                         "(native converter error code 2)")
    brow, r = rows // n, rows % n
    bcol, c = cols // n, cols % n
    d = bcol - brow + 1  # 0=left, 1=diag, 2=right
    bad = (d < 0) | (d > 2)
    if np.any(bad & (val != 0)):
        raise ValueError("CSR entry outside the block-tridiagonal band")
    ok = ~bad
    out[brow[ok], d[ok], r[ok], c[ok]] = val[ok]
    return out


def validate_cbtd(blocks, tol: float = 0.0) -> int:
    """Structural validation (native when available): 0 ok, 1 nonzero pad
    slots, 3 asymmetric off-diagonals. Numpy fallback mirrors the C++."""
    b = np.ascontiguousarray(blocks, dtype=np.float64)
    K, _, n, _ = b.shape
    lib = _find_lib()
    if lib is not None:
        return lib.tpcg_validate_cbtd(
            b.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, K,
            ctypes.c_double(tol))
    if np.any(b[0, 0] != 0) or np.any(b[-1, 2] != 0):
        return 1
    if K > 1 and np.max(np.abs(b[:-1, 2] -
                               np.swapaxes(b[1:, 0], -1, -2))) > tol:
        return 3
    return 0


def dense_to_cbtd(dense, n: int, K: int) -> np.ndarray:
    """Dense (K*n, K*n) row-major -> canonical blocks, on host (native fast
    path; numpy fallback). Raises ValueError on nonzeros outside the band —
    matching the C++ (csrc/cbtd.cpp:tpcg_dense_to_cbtd)."""
    lib = _find_lib()
    d64 = np.ascontiguousarray(dense, dtype=np.float64)
    N = K * n
    if d64.shape != (N, N):
        raise ValueError(f"dense must be ({N}, {N}), got {d64.shape}")
    if lib is not None:
        out = np.zeros((K, 3, n, n), dtype=np.float64)
        rc = lib.tpcg_dense_to_cbtd(
            d64.ctypes.data_as(ctypes.POINTER(ctypes.c_double)), n, K,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
        if rc != 0:
            raise ValueError("dense matrix has nonzeros outside the block "
                             "tridiagonal band (native error code "
                             f"{rc})")
        return out.astype(np.asarray(dense).dtype, copy=False)
    # numpy fallback mirroring the C++
    out = np.zeros((K, 3, n, n), dtype=np.float64)
    tiles = d64.reshape(K, n, K, n).transpose(0, 2, 1, 3)  # (K, K, n, n)
    for d, off in ((0, -1), (1, 0), (2, 1)):
        idx = np.arange(max(0, -off), K - max(0, off))
        out[idx, d] = tiles[idx, idx + off]
    mask = np.abs(np.arange(K)[:, None] - np.arange(K)[None, :]) > 1
    if K > 1 and np.any(tiles[mask] != 0):
        raise ValueError("dense matrix has nonzeros outside the block "
                         "tridiagonal band (native error code 1)")
    return out.astype(np.asarray(dense).dtype, copy=False)


def refflat_to_cbtd(flat, n: int, K: int) -> np.ndarray:
    """Reference flat (column-major blocks) -> canonical blocks, on host."""
    lib = _find_lib()
    flat64 = np.ascontiguousarray(flat, dtype=np.float64)
    if lib is not None:
        out = np.zeros((K, 3, n, n), dtype=np.float64)
        lib.tpcg_refflat_to_cbtd(
            flat64.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
            n, K,
            out.ctypes.data_as(ctypes.POINTER(ctypes.c_double)))
    else:
        out = flat64.reshape(K, 3, n, n).swapaxes(-1, -2).copy()
        out[0, 0] = 0
        out[-1, 2] = 0
    return out.astype(np.asarray(flat).dtype, copy=False)
