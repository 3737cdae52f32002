"""Lane-major small symmetric-definite linear algebra: unrolled LDL^T
solve/inverse.

TPU XLA lowers ``jnp.linalg.inv`` / ``jnp.linalg.solve`` over stacks of
tiny matrices as batched LU with pivoting — measured ~700 µs for the
(128,14,14)+(127,7,7) inverses of one LQR-KKT assembly on v5e, which
dominated the entire NMPC QP core. These helpers instead transpose the
batch to the TRAILING (lane) axis and unroll the n x n factorization in
Python: every emitted op is an elementwise multiply/add/divide on a
``(B,)`` lane vector, the whole chain fuses into a few VPU loops, and the
batch fills the 128-lane dimension. ~1.5k ops for n=14 — microseconds,
not hundreds.

The factorization is LDL^T (root-free), not Cholesky: it needs no sqrt,
so it handles symmetric DEFINITE blocks of either sign — positive (mass
matrices with armature, SPD cost blocks) or negative (the diagonal blocks
of the reference's golden Schur system are negative definite; PCG itself
is sign-invariant). No pivoting: inputs must be sign-definite; a zero
pivot (genuinely indefinite block) produces inf/nan rather than a wrong
answer. Unrolling is O(n^3) in trace size, so ``spd_inverse``/
``spd_solve`` fall back to ``jnp.linalg`` above ``_MAX_UNROLL_N``.

Used by: tpcg/precond (stair builds), tpcg/models/lqr_kkt.py (Schur
assembly + primal recovery), tpcg/models/rbd_lane.py (mass solve).
Parity: tests/test_lanelin.py checks against ``jnp.linalg`` on random
SPD and negative-definite stacks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MAX_UNROLL_N = 32


def _ldl_lane(M, n):
    """LDL^T of ``M`` given as indexable ``M[i, j] -> (B,)`` lanes.
    Returns (L, d, dinv): unit-lower L, diagonal d, and 1/d — all Python
    lists of lane vectors. Root-free, so sign-definite inputs of either
    sign factor exactly."""
    L = [[None] * n for _ in range(n)]
    d = [None] * n
    dinv = [None] * n
    for j in range(n):
        s = M[j, j]
        for k in range(j):
            s = s - L[j][k] * L[j][k] * d[k]
        d[j] = s
        dinv[j] = 1.0 / s
        L[j][j] = None  # unit diagonal, never materialized
        for i in range(j + 1, n):
            t = M[i, j]
            for k in range(j):
                t = t - L[i][k] * L[j][k] * d[k]
            L[i][j] = t * dinv[j]
    return L, d, dinv


def chol_solve_lane(M, rhs):
    """Solve ``M x = rhs`` for symmetric definite ``M (n,n,B)``,
    ``rhs (n,B)`` — pure elementwise lane ops (no batched LU). Root-free
    LDL^T under the hood (the name is historical: the SPD use sites)."""
    n = rhs.shape[0]
    L, _, dinv = _ldl_lane(M, n)
    y = [None] * n
    for i in range(n):
        s = rhs[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i] * dinv[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s
    return jnp.stack(x)


def spd_inverse_lane(M):
    """Inverse of symmetric definite ``M (n,n,B)`` -> ``(n,n,B)`` via
    unrolled ``A^-1 = L^-T D^-1 L^-1`` (unit-lower L)."""
    n = M.shape[0]
    L, _, dinv = _ldl_lane(M, n)
    # forward-substitute unit columns: Linv unit lower triangular
    Linv = [[None] * n for _ in range(n)]
    for j in range(n):
        for i in range(j + 1, n):
            s = L[i][j]
            for k in range(j + 1, i):
                s = s + L[i][k] * Linv[k][j]
            Linv[i][j] = -s
    # Ainv[i][j] = sum_{k >= max(i,j)} Linv[k][i] dinv[k] Linv[k][j]
    # (Linv[k][k] = 1 implicit)
    rows = []
    cache = {}
    for i in range(n):
        row = []
        for j in range(n):
            lo, hi = (i, j) if i <= j else (j, i)
            if (lo, hi) not in cache:
                s = dinv[hi] if lo == hi else Linv[hi][lo] * dinv[hi]
                for k in range(hi + 1, n):
                    s = s + Linv[k][lo] * Linv[k][hi] * dinv[k]
                cache[(lo, hi)] = s
            row.append(cache[(lo, hi)])
        rows.append(jnp.stack(row))
    return jnp.stack(rows)


def matmul_lane(A, B):
    """Lane-major small matmul: ``A (n, m, *lanes)``, ``B (m, p, *lanes)``
    -> ``C (n, p, *lanes)`` with ``C[i,j] = sum_k A[i,k] * B[k,j]``
    elementwise over the trailing lane axes. Outer-product accumulation:
    m broadcast-FMAs over full ``(n, p, *lanes)`` tensors — no
    ``dot_general`` (XLA lowers stacks of tiny matmuls as padded MXU
    batches; measured ~3 ms for the two stair triple-products over a
    (256,32) fleet of 14x14 blocks vs ~0.1 ms lane-major), and an
    m-length op chain rather than an n*m*p unroll, so the trace stays
    small and every op fills the VPU."""
    m = A.shape[1]
    C = A[:, 0, None] * B[None, 0]
    for k in range(1, m):
        C = C + A[:, k, None] * B[None, k]
    return C


def matmul_lane_nt(A, B):
    """Lane-major small matmul against a TRANSPOSED right factor:
    ``A (n, m, *lanes)``, ``B (p, m, *lanes)`` -> ``C (n, p, *lanes)`` with
    ``C[i,j] = sum_k A[i,k] * B[j,k]`` (i.e. ``A @ B^T``) — the same
    outer-product FMA chain as :func:`matmul_lane`, saving the explicit
    sublane transpose of ``B`` (common in symmetric products like
    ``A Q^-1 A'``)."""
    m = A.shape[1]
    C = A[:, 0, None] * B[None, :, 0]
    for k in range(1, m):
        C = C + A[:, k, None] * B[None, :, k]
    return C


def matvec_lane(A, v):
    """Lane-major small mat-vec: ``A (n, m, *lanes)``, ``v (m, *lanes)``
    -> ``(n, *lanes)`` with ``out[i] = sum_k A[i,k] * v[k]`` elementwise
    over the lane axes."""
    m = A.shape[1]
    r = A[:, 0] * v[None, 0]
    for k in range(1, m):
        r = r + A[:, k] * v[None, k]
    return r


def _to_lane(Mb):
    """``(..., n, n) -> (n, n, B)`` plus the restore function."""
    n = Mb.shape[-1]
    lead = Mb.shape[:-2]
    Mt = jnp.moveaxis(Mb.reshape((-1, n, n)), 0, -1)

    def restore(out_t):
        return jnp.moveaxis(out_t, -1, 0).reshape(lead + (n, n))

    return Mt, restore


def spd_inverse(Mb):
    """Batched inverse of a symmetric-definite stack ``(..., n, n)`` —
    drop-in for ``jnp.linalg.inv`` on sign-definite symmetric inputs,
    lane-major unrolled LDL^T under the hood (falls back to
    ``jnp.linalg.inv`` for n > 32)."""
    n = Mb.shape[-1]
    if n > _MAX_UNROLL_N:
        with jax.default_matmul_precision("highest"):
            return jnp.linalg.inv(Mb)
    Mt, restore = _to_lane(Mb)
    return restore(spd_inverse_lane(Mt))


def spd_solve(Mb, rhs):
    """Batched solve ``M x = rhs`` for symmetric definite ``M (..., n, n)``,
    ``rhs (..., n)`` — drop-in for ``jnp.linalg.solve`` on sign-definite
    symmetric inputs."""
    n = Mb.shape[-1]
    if n > _MAX_UNROLL_N:
        with jax.default_matmul_precision("highest"):
            return jnp.linalg.solve(Mb, rhs)
    Mt, _ = _to_lane(Mb)
    rt = jnp.moveaxis(rhs.reshape((-1, n)), 0, -1)
    out = chol_solve_lane(Mt, rt)
    return jnp.moveaxis(out, -1, 0).reshape(rhs.shape)
