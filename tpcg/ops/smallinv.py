"""Batched small-matrix linear algebra in lane-major layout, for use INSIDE
Pallas kernels.

These are the primitives that let the preconditioner be CONSTRUCTED inside
the fused solve kernel (tpcg/ops/fused_pcg.py) instead of in a separate XLA
region: K dense ``n x n`` inversions and products, vectorized over the
128-wide lane (knot) axis with the tiny state dims unrolled. In the
reference's ecosystem this construction work is what MPCGPU's own kernels do
with the §2.7 block helpers before calling the solver; here it fuses into
the same kernel launch.

All functions are pure jnp on VALUES (not refs), so they can be called from
kernel bodies and from regular jitted code (and therefore unit-tested in
interpret mode against numpy).

Mosaic constraints honored (probed on hardware): 3D leading-dim and sublane
broadcasts are supported; 4D broadcasts and in-kernel ``.at[].set`` row
scatter are not — Gauss-Jordan row updates use broadcasted-iota row masks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _eye_pages(n: int, K: int, dtype):
    """(n, n, K) stack of identity matrices built from int32 iota — NOT
    jnp.eye, which lowers through a 64-bit iota under jax_enable_x64 and
    aborts the Mosaic compiler inside kernels."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n, K), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n, K), 1)
    return (r == c).astype(dtype)


def gj_inverse_lane_major(M, n: int, K: int, unroll: bool = True):
    """Invert K matrices stored lane-major: ``M (n, n, K)`` with
    ``M[r, c, k]`` = entry (r, c) of matrix k. Returns ``(n, n, K)``.

    Gauss-Jordan WITHOUT pivoting — intended for the SPD diagonal blocks of
    trajectory-opt KKT systems (same assumption the symmetric-stair/
    block-Jacobi preconditioners make; a zero pivot would mean a singular
    diagonal block and a meaningless preconditioner anyway). ~6n ops on
    (n, n, K) pages total.

    ``unroll=True`` (default): Python-unrolled steps with static row
    indexing — fastest, but inside a Pallas kernel the ~n generations of
    (n, n, K) temporaries inflate the scoped-VMEM peak (measured on chip).
    ``unroll=False``: a ``fori_loop`` with a carried (M, inv) pair forces
    stack-slot reuse — the lean form the fused kernel selects near the VMEM
    ceiling; row selects become iota==i masks (no dynamic-slice scatter,
    which Mosaic rejects).
    """
    if unroll:
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n, K), 0)
        inv = _eye_pages(n, K, M.dtype)
        for i in range(n):
            is_row_i = row_ids == i                   # (n, n, K) mask
            inv_piv = 1.0 / M[i, i, :]                # (K,)
            scale = inv_piv[None, None, :]
            M = jnp.where(is_row_i, M * scale, M)
            inv = jnp.where(is_row_i, inv * scale, inv)
            # eliminate column i from every other row
            col_full = M[:, i, :]                 # (n, K), row i zeroed
            col = jnp.where(
                jax.lax.broadcasted_iota(jnp.int32, (n, K), 0) == i,
                jnp.zeros_like(col_full), col_full)
            M = M - col[:, None, :] * M[i, :, :][None, :, :]
            inv = inv - col[:, None, :] * inv[i, :, :][None, :, :]
        return inv

    row_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n, K), 0)
    col_ids3 = jax.lax.broadcasted_iota(jnp.int32, (n, n, K), 1)
    inv0 = _eye_pages(n, K, M.dtype)

    def step(i, carry):
        M, inv = carry
        is_row_i = row_ids == i                       # (n, n, K) mask
        # pivot M[i, i, :] by masked reduction (no scalar dynamic indexing)
        diag_mask = jnp.logical_and(is_row_i, col_ids3 == i)
        piv = jnp.sum(jnp.where(diag_mask, M, jnp.zeros_like(M)),
                      axis=(0, 1))                             # (K,)
        scale = (1.0 / piv)[None, None, :]
        M = jnp.where(is_row_i, M * scale, M)
        inv = jnp.where(is_row_i, inv * scale, inv)
        # row i of M/inv as (n, K) pages, again by masked reduction
        Mi = jnp.sum(jnp.where(is_row_i, M, jnp.zeros_like(M)),
                     axis=0)                                    # (n, K)
        invi = jnp.sum(jnp.where(is_row_i, inv, jnp.zeros_like(inv)),
                       axis=0)
        # column i of M as an (n, K) page, with row i zeroed
        col_full = jnp.sum(jnp.where(col_ids3 == i, M,
                                     jnp.zeros_like(M)), axis=1)
        col_ids = jax.lax.broadcasted_iota(jnp.int32, (n, K), 0)
        col = jnp.where(col_ids == i, jnp.zeros_like(col_full), col_full)
        M = M - col[:, None, :] * Mi[None, :, :]
        inv = inv - col[:, None, :] * invi[None, :, :]
        return (M, inv)

    _, inv = jax.lax.fori_loop(0, n, step, (M, inv0))
    return inv


def matmul_lane_major(A, B, n: int, K: int):
    """``C[r, c, k] = sum_j A[r, j, k] B[j, c, k]`` for ``(n, n, K)``
    operands — K independent n x n matmuls as n outer-product accumulations
    (MXU cannot batch over lanes; at n <= 14 the VPU form wins)."""
    C = jnp.zeros((n, n, K), A.dtype)
    for j in range(n):
        C = C + A[:, j, :][:, None, :] * B[j, :, :][None, :, :]
    return C


def blockdiag_mv_lane_major(Dt, x, n: int, K: int):
    """``y[r, k] = sum_c Dt[c, r, k] x[c, k]`` — K independent block-diagonal
    matvecs in the STORED (transposed, column-first) convention shared with
    ``S_lm`` (the block-Jacobi apply: n FMA pages instead of the full
    bdmv's 3n)."""
    return jnp.sum(Dt * x[:, None, :], axis=0)


def shift_mats_down(D, n: int, K: int):
    """``out[:, :, k] = D[:, :, k-1]``, zeros at k=0 (lane-axis roll +
    boundary mask, like the vector halo shifts in tpcg/ops/bdmv.py)."""
    if K == 1:
        return jnp.zeros_like(D)
    rolled = jnp.roll(D, 1, axis=2)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n, K), 2)
    return jnp.where(k_ids == 0, jnp.zeros_like(rolled), rolled)


def shift_mats_up(D, n: int, K: int):
    """``out[:, :, k] = D[:, :, k+1]``, zeros at k=K-1."""
    if K == 1:
        return jnp.zeros_like(D)
    rolled = jnp.roll(D, -1, axis=2)
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (n, n, K), 2)
    return jnp.where(k_ids == K - 1, jnp.zeros_like(rolled), rolled)


def apply_symmetric_stair_factored(S_lm, Dinv_t, v, n: int, K: int):
    """Apply the symmetric-stair Phi^-1 WITHOUT materializing its blocks:

      (Phi^-1 v)_k = Dinv_k [ v_k - L_k (Dinv v)_{k-1} - R_k (Dinv v)_{k+1} ]

    Cost: 2 block-diagonal matvecs + the two off-diagonal matvec terms
    (~4n FMA pages vs 3n for the materialized form), but needs only
    ``Dinv_t (n, n, K)`` in VMEM instead of the full 3-block Phi^-1 and
    skips the 4 setup matmuls entirely."""
    from tpcg.ops.bdmv import _lane_shift_down, _lane_shift_up

    w = blockdiag_mv_lane_major(Dinv_t, v, n, K)      # (Dinv v)
    w_dn = _lane_shift_down(w, n, K)
    w_up = _lane_shift_up(w, n, K)
    # off-diagonal terms: L_k w_{k-1} and R_k w_{k+1}; stored-transpose
    # pages S_lm[0]=L^T, S_lm[2]=R^T -> y[r,k] = sum_c S_lm[d][c,r,k] w[c,k]
    t = v - (jnp.sum(S_lm[0] * w_dn[:, None, :], axis=0) +
             jnp.sum(S_lm[2] * w_up[:, None, :], axis=0))
    return blockdiag_mv_lane_major(Dinv_t, t, n, K)


def build_pinv_lane_major(S_lm, kind: str, n: int, K: int):
    """Construct Phi^-1 in lane-major cbtd form ``(3, n_col, n_row, K)``
    from ``S_lm`` of the same layout, entirely with VPU ops.

    Mirrors tpcg/precond (the XLA builders) block-for-block:
      block_jacobi:    [0, D^-1, 0]
      symmetric_stair: [-D^-1 L D_dn^-1, D^-1, -D^-1 R D_up^-1]

    Layout note: lane-major stores blocks (column, row)-indexed
    (``lm[d, c, r, k] = blocks[k, d, r, c]``), i.e. each ``S_lm[d]`` is the
    TRANSPOSE of the math block per lane. Products are computed in
    transposed space: ``(XY)^T = Y^T X^T``.
    """
    if kind not in ("block_jacobi", "symmetric_stair"):
        raise ValueError(f"unsupported in-kernel preconditioner {kind!r}")
    Dt = S_lm[1]                                   # D^T per lane, (n, n, K)
    Dinv_t = gj_inverse_lane_major(Dt, n, K)       # (D^-1)^T = (D^T)^-1
    zeros = jnp.zeros_like(Dinv_t)
    if kind == "block_jacobi":
        return jnp.stack([zeros, Dinv_t, zeros])
    Lt = S_lm[0]                                   # L^T per lane
    Rt = S_lm[2]
    Dinv_t_dn = shift_mats_down(Dinv_t, n, K)      # (D_{k-1}^-1)^T at k
    Dinv_t_up = shift_mats_up(Dinv_t, n, K)
    # left_k  = -Dinv_k L_k Dinv_{k-1}; transposed:
    # left^T  = -Dinv_{k-1}^T L^T Dinv_k^T
    left_t = -matmul_lane_major(
        matmul_lane_major(Dinv_t_dn, Lt, n, K), Dinv_t, n, K)
    right_t = -matmul_lane_major(
        matmul_lane_major(Dinv_t_up, Rt, n, K), Dinv_t, n, K)
    return jnp.stack([left_t, Dinv_t, right_t])
