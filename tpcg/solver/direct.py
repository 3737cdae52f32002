"""Block cyclic reduction (BCR): an exact direct solver for the same
block-tridiagonal systems.

The reference is iterative-only; its paper baseline is a CPU direct solver
(QDLDL). BCR is the TPU-friendly direct method: where the classic block-
Thomas elimination is a sequential O(K) chain (hostile to wide vector
units), cyclic reduction eliminates all odd block rows simultaneously —
``log2(K)`` levels, each a BATCH of small ``n x n`` inversions and matmuls
over the surviving rows, which XLA vectorizes exactly like the
preconditioner builders.

Use it when iteration counts are the problem (ill-conditioned systems where
PCG needs hundreds of iterations, or hard real-time bounds that cannot
tolerate data-dependent solve times): one pass, no tolerance, no
preconditioner.

Level recurrence (eliminating odd rows; even row k with odd neighbors):
  D'_k = D_k - L_k D_{k-1}^-1 R_{k-1} - R_k D_{k+1}^-1 L_{k+1}
  L'_k = -L_k D_{k-1}^-1 L_{k-1}
  R'_k = -R_k D_{k+1}^-1 R_{k+1}
  b'_k = b_k - L_k D_{k-1}^-1 b_{k-1} - R_k D_{k+1}^-1 b_{k+1}
Back-substitution per level: x_odd = D^-1 (b - L x_left - R x_right).

K is padded to a power of two with identity rows (D=I, off=0, b=0), which
decouple and recover x=0 in the pad — the original rows are unaffected.
SPD block-tridiagonal systems keep all level diagonals invertible (each is
a principal Schur complement of an SPD matrix).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from tpcg.types import PCGResult


# TPU f32 matmuls default to bf16-grade MXU passes (observed: 8% relative
# solution error at cond(S)=323); direct elimination needs true f32.
_PREC = jax.lax.Precision.HIGHEST


def _mm(A, B):
    return jnp.einsum('kij,kjm->kim', A, B, precision=_PREC)


def _mv(A, x):
    return jnp.einsum('kij,kj->ki', A, x, precision=_PREC)


def _pad_pow2(L, D, R, b):
    K, n = b.shape
    K2 = 1 << max(1, (K - 1).bit_length())
    if K2 == K:
        return L, D, R, b, K
    pad = K2 - K
    eye = jnp.broadcast_to(jnp.eye(n, dtype=D.dtype), (pad, n, n))
    zer = jnp.zeros((pad, n, n), D.dtype)
    return (jnp.concatenate([L, zer]), jnp.concatenate([D, eye]),
            jnp.concatenate([R, zer]),
            jnp.concatenate([b, jnp.zeros((pad, n), b.dtype)]), K)


@jax.jit
def bcr_solve_blocks(blocks, gamma):
    """Exact solve of ``S x = gamma`` by block cyclic reduction.

    ``blocks (K, 3, n, n)`` canonical cbtd, ``gamma (K, n)``. Returns ``x``.
    """
    with jax.default_matmul_precision("highest"):
        return _bcr_impl(blocks, gamma)


def _bcr_impl(blocks, gamma):
    L0 = blocks[:, 0]
    D0 = blocks[:, 1]
    R0 = blocks[:, 2]
    L, D, R, b, K_orig = _pad_pow2(L0, D0, R0, gamma)

    # --- forward reduction: record each level's odd-row data for the
    # back-substitution (shapes shrink by half per level -> Python loop,
    # all static under jit) ---
    levels = []
    while b.shape[0] > 1:
        Le, De, Re, be = L[0::2], D[0::2], R[0::2], b[0::2]   # even rows
        Lo, Do, Ro, bo = L[1::2], D[1::2], R[1::2], b[1::2]   # odd rows
        Do_inv = jnp.linalg.inv(Do)
        levels.append((Lo, Do_inv, Ro, bo))

        # even row k couples to odd row k-1 (the odd row ABOVE: index
        # j = k//2 - 1 in the odd arrays) and odd row k+1 (j = k//2).
        DinvL = _mm(Do_inv, Lo)
        DinvR = _mm(Do_inv, Ro)
        Dinvb = _mv(Do_inv, bo)
        # "up": odd-row-above quantities land at even index j via a shift
        # (absent for even row 0)
        up = lambda a: jnp.concatenate([jnp.zeros_like(a[:1]), a[:-1]])
        D_new = De - _mm(Le, up(DinvR)) - _mm(Re, DinvL)
        L_new = -_mm(Le, up(DinvL))
        R_new = -_mm(Re, DinvR)
        b_new = be - _mv(Le, up(Dinvb)) - _mv(Re, Dinvb)

        L, D, R, b = L_new, D_new, R_new, b_new

    # --- root solve ---
    x = jnp.linalg.solve(D[0], b[0])[None]   # (1, n)

    # --- back-substitution (reusing each level's Do_inv) ---
    for Lo, Do_inv, Ro, bo in reversed(levels):
        # interleave: evens are the solved x; odds from their neighbors
        # odd row j sits between even rows j (above) and j+1 (below)
        x_above = x                                           # (m, n)
        x_below = jnp.concatenate([x[1:], jnp.zeros_like(x[:1])])
        x_odd = _mv(Do_inv, bo - _mv(Lo, x_above) - _mv(Ro, x_below))
        out = jnp.zeros((2 * x.shape[0], x.shape[1]), x.dtype)
        out = out.at[0::2].set(x)
        out = out.at[1::2].set(x_odd)
        x = out

    return x[:K_orig]


def bcr_solve(S, gamma) -> PCGResult:
    """Direct-solve convenience wrapper returning the same structured
    result type as the iterative solvers: ``iters=0``, ``converged`` =
    the solution is finite (a singular/indefinite S NaNs the elimination —
    nothing validates SPD up front), ``eta`` = true residual inner product
    (computed at full matmul precision, like the solve itself).
    """
    from tpcg.ops.bdmv import bdmv
    from tpcg.solver.api import _as_bt

    S = _as_bt(S)
    gamma = jnp.asarray(gamma)
    x = bcr_solve_blocks(S.blocks, gamma)
    with jax.default_matmul_precision("highest"):
        r = gamma - bdmv(S.blocks, x)
    eta = jnp.sum(r * r)
    ok = jnp.logical_and(jnp.all(jnp.isfinite(x)), jnp.isfinite(eta))
    return PCGResult(lam=x, iters=jnp.zeros((), jnp.int32),
                     converged=ok, eta=eta)
