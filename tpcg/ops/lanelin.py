"""Lane-major small-SPD linear algebra: unrolled Cholesky solve/inverse.

TPU XLA lowers ``jnp.linalg.inv`` / ``jnp.linalg.solve`` over stacks of
tiny matrices as batched LU with pivoting — measured ~700 µs for the
(128,14,14)+(127,7,7) inverses of one LQR-KKT assembly on v5e, which
dominated the entire NMPC QP core. These helpers instead transpose the
batch to the TRAILING (lane) axis and unroll the n x n factorization in
Python: every emitted op is an elementwise multiply/add/rsqrt on a
``(B,)`` lane vector, the whole chain fuses into a few VPU loops, and the
batch fills the 128-lane dimension. ~1.5k ops for n=14 — microseconds,
not hundreds.

No pivoting: inputs must be SPD (mass matrices with armature, SPD cost
blocks, SPD block-tridiagonal diagonals — everything this library feeds
here is SPD by construction). Unrolling is O(n^3) in trace size, so
``spd_inverse``/``spd_solve`` fall back to ``jnp.linalg`` above
``_MAX_UNROLL_N``.

Used by: tpcg/precond (stair builds), tpcg/models/lqr_kkt.py (Schur
assembly + primal recovery), tpcg/models/rbd_lane.py (mass solve).
Parity: tests/test_lanelin.py checks against ``jnp.linalg`` on random
SPD stacks.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_MAX_UNROLL_N = 32


def _chol_lane(M, n):
    """Cholesky of ``M`` given as indexable ``M[i, j] -> (B,)`` lanes.
    Returns (L, inv_diag) as Python lists of lane vectors."""
    L = [[None] * n for _ in range(n)]
    inv = [None] * n
    for j in range(n):
        d = M[j, j]
        for k in range(j):
            d = d - L[j][k] * L[j][k]
        Ljj = jnp.sqrt(d)
        inv[j] = 1.0 / Ljj
        L[j][j] = Ljj
        for i in range(j + 1, n):
            s = M[i, j]
            for k in range(j):
                s = s - L[i][k] * L[j][k]
            L[i][j] = s * inv[j]
    return L, inv


def chol_solve_lane(M, rhs):
    """Solve ``M x = rhs`` for SPD ``M (n,n,B)``, ``rhs (n,B)`` — pure
    elementwise lane ops (no batched LU)."""
    n = rhs.shape[0]
    L, inv = _chol_lane(M, n)
    y = [None] * n
    for i in range(n):
        s = rhs[i]
        for k in range(i):
            s = s - L[i][k] * y[k]
        y[i] = s * inv[i]
    x = [None] * n
    for i in reversed(range(n)):
        s = y[i]
        for k in range(i + 1, n):
            s = s - L[k][i] * x[k]
        x[i] = s * inv[i]
    return jnp.stack(x)


def spd_inverse_lane(M):
    """Inverse of SPD ``M (n,n,B)`` -> ``(n,n,B)`` via unrolled
    ``A^-1 = L^-T L^-1``."""
    n = M.shape[0]
    L, inv = _chol_lane(M, n)
    # forward-substitute unit columns: Linv lower, Linv[j][j] = 1/L[j][j]
    Linv = [[None] * n for _ in range(n)]
    for j in range(n):
        Linv[j][j] = inv[j]
        for i in range(j + 1, n):
            s = L[i][j] * Linv[j][j]
            for k in range(j + 1, i):
                s = s + L[i][k] * Linv[k][j]
            Linv[i][j] = -s * inv[i]
    # Ainv[i][j] = sum_{k >= max(i,j)} Linv[k][i] Linv[k][j]
    rows = []
    cache = {}
    for i in range(n):
        row = []
        for j in range(n):
            lo, hi = (i, j) if i <= j else (j, i)
            if (lo, hi) not in cache:
                s = Linv[hi][lo] * Linv[hi][hi]
                for k in range(hi + 1, n):
                    s = s + Linv[k][lo] * Linv[k][hi]
                cache[(lo, hi)] = s
            row.append(cache[(lo, hi)])
        rows.append(jnp.stack(row))
    return jnp.stack(rows)


def _to_lane(Mb):
    """``(..., n, n) -> (n, n, B)`` plus the restore function."""
    n = Mb.shape[-1]
    lead = Mb.shape[:-2]
    Mt = jnp.moveaxis(Mb.reshape((-1, n, n)), 0, -1)

    def restore(out_t):
        return jnp.moveaxis(out_t, -1, 0).reshape(lead + (n, n))

    return Mt, restore


def spd_inverse(Mb):
    """Batched inverse of an SPD stack ``(..., n, n)`` — drop-in for
    ``jnp.linalg.inv`` on SPD inputs, lane-major unrolled Cholesky under
    the hood (falls back to ``jnp.linalg.inv`` for n > 32 or on
    non-static ranks)."""
    n = Mb.shape[-1]
    if n > _MAX_UNROLL_N:
        with jax.default_matmul_precision("highest"):
            return jnp.linalg.inv(Mb)
    Mt, restore = _to_lane(Mb)
    return restore(spd_inverse_lane(Mt))


def spd_solve(Mb, rhs):
    """Batched solve ``M x = rhs`` for SPD ``M (..., n, n)``,
    ``rhs (..., n)`` — drop-in for ``jnp.linalg.solve`` on SPD inputs."""
    n = Mb.shape[-1]
    if n > _MAX_UNROLL_N:
        with jax.default_matmul_precision("highest"):
            return jnp.linalg.solve(Mb, rhs)
    Mt, _ = _to_lane(Mb)
    rt = jnp.moveaxis(rhs.reshape((-1, n)), 0, -1)
    out = chol_solve_lane(Mt, rt)
    return jnp.moveaxis(out, -1, 0).reshape(rhs.shape)
