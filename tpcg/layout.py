"""Layout converters for compressed block-tridiagonal (cbtd) matrices.

The reference's data contract (SURVEY.md §2): ``S`` is a flat array of
``3 * state_size^2 * knot_points`` elements — per block row, three contiguous
dense blocks ``[left, diag, right]``, **column-major within each block**
(``s_mat[b_dim*c + r]``, /root/reference/include/utils.cuh:62,71,80), with the
row-0 left slot and row-(K-1) right slot zero-padded
(examples/pcg_solve.cu:14-22, allocation at interface.cuh:41).

tpcg's canonical form is ``(knot_points, 3, state_size, state_size)`` with
row-major blocks (tpcg/types.py:BlockTridiag). This module converts between:

* the reference flat layout  <->  canonical cbtd
* dense ``(K*n, K*n)``       <->  canonical cbtd
* CSR (row_ptr/col_ind/val)   ->  canonical cbtd — the ingestion path the
  reference declared but left NOT IMPLEMENTED (interface.cuh:9-20, exit(12)).

Host-side packing has an optional native C++ fast path (tpcg/utils/native.py,
csrc/cbtd.cpp) used automatically for large numpy inputs.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from tpcg.types import BlockTridiag


def from_reference_flat(flat, state_size: int, knot_points: int) -> BlockTridiag:
    """Reference flat cbtd (column-major blocks) -> canonical BlockTridiag.

    ``flat`` has ``3*state_size^2*knot_points`` elements; element
    ``k*3*n^2 + d*n^2 + c*n + r`` is block (k, d) entry (row=r, col=c)
    (indexing from pcg.cuh:108 + utils.cuh:62).
    """
    n, K = state_size, knot_points
    arr = jnp.asarray(flat).reshape(K, 3, n, n)
    # stored (k, d, col, row) -> canonical (k, d, row, col)
    blocks = jnp.swapaxes(arr, -1, -2)
    blocks = zero_pad_slots(blocks)
    return BlockTridiag(blocks)


def to_reference_flat(bt: BlockTridiag) -> jnp.ndarray:
    """Canonical BlockTridiag -> reference flat layout (column-major blocks)."""
    return jnp.swapaxes(bt.blocks, -1, -2).reshape(-1)


def zero_pad_slots(blocks):
    """Zero the structurally-absent corner slots (row 0 left, row K-1 right)."""
    blocks = blocks.at[..., 0, 0, :, :].set(0)
    blocks = blocks.at[..., -1, 2, :, :].set(0)
    return blocks


def dense_to_cbtd(dense, state_size: int) -> BlockTridiag:
    """Dense ``(K*n, K*n)`` -> canonical cbtd. Off-tridiagonal blocks must be
    zero (validated); raises ``ValueError`` otherwise."""
    n = state_size
    dense = jnp.asarray(dense)
    N = dense.shape[-1]
    if dense.shape[-2] != N or N % n != 0:
        raise ValueError(f"dense must be square with side divisible by n={n}, "
                         f"got {dense.shape}")
    K = N // n
    # (K, n, K, n): block (i, j) = tiles[i, :, j, :]
    tiles = dense.reshape(*dense.shape[:-2], K, n, K, n)
    tiles = jnp.moveaxis(tiles, -2, -3)  # (..., K, K, n, n)
    # Validate block-tridiagonal structure.
    mask = np.abs(np.arange(K)[:, None] - np.arange(K)[None, :]) > 1
    if K > 1 and bool(jnp.any(jnp.abs(tiles[..., mask, :, :]) > 0)):
        raise ValueError("dense matrix has nonzeros outside the block "
                         "tridiagonal band")
    idx = np.arange(K)
    diag = tiles[..., idx, idx, :, :]
    left = jnp.zeros_like(diag)
    right = jnp.zeros_like(diag)
    if K > 1:
        left = left.at[..., 1:, :, :].set(tiles[..., idx[1:], idx[:-1], :, :])
        right = right.at[..., :-1, :, :].set(tiles[..., idx[:-1], idx[1:], :, :])
    return BlockTridiag(jnp.stack([left, diag, right], axis=-3))


def cbtd_to_dense(blocks) -> jnp.ndarray:
    """Canonical cbtd blocks ``(..., K, 3, n, n)`` -> dense ``(..., K*n, K*n)``."""
    blocks = jnp.asarray(blocks)
    K, n = blocks.shape[-4], blocks.shape[-1]
    batch = blocks.shape[:-4]
    out = jnp.zeros((*batch, K, n, K, n), blocks.dtype)
    idx = np.arange(K)
    out = out.at[..., idx, :, idx, :].set(
        jnp.moveaxis(blocks[..., :, 1, :, :], -3, 0) if batch else blocks[:, 1])
    if K > 1:
        lo = blocks[..., 1:, 0, :, :]
        hi = blocks[..., :-1, 2, :, :]
        out = out.at[..., idx[1:], :, idx[:-1], :].set(
            jnp.moveaxis(lo, -3, 0) if batch else lo)
        out = out.at[..., idx[:-1], :, idx[1:], :].set(
            jnp.moveaxis(hi, -3, 0) if batch else hi)
    return out.reshape(*batch, K * n, K * n)


def from_csr(row_ptr, col_ind, val, state_size: int, knot_points: int,
             ) -> BlockTridiag:
    """CSR -> canonical cbtd (the reference's NOT IMPLEMENTED entry point,
    interface.cuh:9-20).

    Entries outside the block-tridiagonal band raise ``ValueError``. Runs on
    host (numpy); uses the native C++ kernel when available for large inputs.
    """
    n, K = state_size, knot_points
    row_ptr = np.asarray(row_ptr)
    col_ind = np.asarray(col_ind)
    val = np.asarray(val)
    N = K * n
    if row_ptr.shape != (N + 1,):
        raise ValueError(f"row_ptr must have shape ({N+1},), got {row_ptr.shape}")

    from tpcg.utils import native
    blocks = native.csr_to_cbtd(row_ptr, col_ind, val, n, K)
    return BlockTridiag(jnp.asarray(blocks))


def random_spd_cbtd(key, state_size: int, knot_points: int,
                    dtype=jnp.float32, diag_boost: float = None) -> BlockTridiag:
    """Generate a random SPD block-tridiagonal system (test/bench utility;
    SURVEY.md §4's "random SPD block-tridiagonal" fixture recipe).

    Builds ``S = B @ B.T + c*I`` with ``B`` block *lower bidiagonal* so that
    ``S`` is exactly block tridiagonal and SPD.
    """
    import jax

    n, K = state_size, knot_points
    kd, kl = jax.random.split(key)
    D = jax.random.normal(kd, (K, n, n), dtype=jnp.float32)
    L = jax.random.normal(kl, (K - 1, n, n), dtype=jnp.float32) * 0.5
    if diag_boost is None:
        diag_boost = 0.1 * n
    # S_kk = D_k D_k^T + L_{k-1} L_{k-1}^T + c I ;  S_{k,k-1} = L_{k-1} D_{k-1}^T
    diag = jnp.einsum('kij,kmj->kim', D, D)
    diag = diag.at[1:].add(jnp.einsum('kij,kmj->kim', L, L))
    diag = diag + diag_boost * jnp.eye(n, dtype=jnp.float32)
    sub = jnp.einsum('kij,kmj->kim', L, D[:-1])  # S_{k+1,k}, shape (K-1,n,n)
    left = jnp.zeros((K, n, n), jnp.float32).at[1:].set(sub)
    right = jnp.zeros((K, n, n), jnp.float32).at[:-1].set(
        jnp.swapaxes(sub, -1, -2))
    blocks = jnp.stack([left, diag, right], axis=1).astype(dtype)
    return BlockTridiag(blocks)
