"""Block preconditioned conjugate gradients: R right-hand sides sharing ONE
Krylov space (O'Leary 1980), vs tpcg/ops/multirhs.py which runs R coupled-
but-independent recurrences.

Beyond-reference capability (the reference solves one vector per launch,
/root/reference/include/interface.cuh:93-144): each block iteration performs
an R-dimensional subspace minimization — the search directions ``P`` span
R vectors per pass, so information discovered by one right-hand side's
residual accelerates all of them. On clustered spectra (trajopt Schur
complements are exactly that: D-dominant with radius-1 coupling) the block
method needs fewer iterations than the best single-vector method whenever
the right-hand sides are not mutually orthogonal-in-A.

Cost per iteration vs multirhs: the sweep (R bdmv + R preconditioner
applies) is identical; the scalars grow from R dots to two R x R Gram
matrices plus two R x R eigh-based solves. Measured on chip (iiwa n=14
K=128, symmetric_stair, tol 1e-6, R=4/8): the strong preconditioner
already clusters the spectrum, so the block method saves only ~1
iteration (33 vs 34) while the XLA-path Gram/eigh machinery costs
150-220 us/rhs against the fused multirhs kernel's 7-11 — use this for
robustness on weakly preconditioned correlated batches, not for latency
(docs/ROADMAP.md item 8).

Semantics: the per-column exit test matches the reference's absolute
``|eta_jj| < tol`` on the preconditioned residual inner product
(pcg.cuh:195 applied to the Gram diagonal); per-column ``iters`` report the
pass on which that column first satisfied it (the block keeps iterating —
and keeps improving every column — until ALL satisfy it or ``max_iter``).
Converged columns are not frozen: freezing would shrink the shared basis
(the whole point of the method), and extra passes only polish them.

Breakdown policy: the R x R Grams are singular whenever the right-hand
sides are linearly dependent (e.g. gamma and 2*gamma) or once columns
converge, and a plain solve NaNs out — observed, not hypothetical. The
alpha/beta solves therefore go through a spectral pseudo-inverse
(``eigh`` + eigenvalue cutoff at ``rcond * |w|_max``): rank-deficient
directions contribute nothing instead of breaking down (the
pseudoinverse variant of breakdown-free block CG), and dependent columns
simply ride along with the span.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpcg.ops.bdmv import bdmv
from tpcg.types import PCGResult

_HIGH = jax.lax.Precision.HIGHEST


def _gram(A, B):
    """(R, K, n) x (R, K, n) -> (R, R) = A_r . B_s."""
    return jnp.einsum("rkn,skn->rs", A, B, precision=_HIGH)


def _colcomb(P, coeff):
    """(R, K, n) x (R, R) -> (R, K, n): out_j = sum_r P_r coeff[r, j]."""
    return jnp.einsum("rkn,rj->jkn", P, coeff, precision=_HIGH)


def _pinv_solve(G, B, rcond=1e-6):
    """Pseudo-solve ``G X = B`` for a symmetric R x R Gram via ``eigh``
    with an eigenvalue cutoff — exact on the well-conditioned subspace,
    zero (instead of NaN) on the null space. G is symmetric by
    construction (``P^T S P`` / ``R^T M^{-1} R`` with S, M SPD)."""
    with jax.default_matmul_precision("highest"):
        w, V = jnp.linalg.eigh(G)
        cutoff = jnp.max(jnp.abs(w)) * jnp.asarray(rcond, G.dtype)
        winv = jnp.where(jnp.abs(w) > cutoff, 1.0 / w, 0.0)
        return V @ (winv[:, None] * (V.T @ B))


@functools.partial(jax.jit, static_argnames=("max_iter", "identity_pinv"))
def pcg_block_jnp(S_blocks, Pinv_blocks, Gamma, Lam0, *, exit_tol,
                  max_iter: int, identity_pinv: bool = False) -> PCGResult:
    """Block-PCG solve of ``S lam_j = gamma_j`` for R joint right-hand
    sides. ``S_blocks``/``Pinv_blocks`` canonical ``(K, 3, n, n)``;
    ``Gamma``/``Lam0`` are ``(R, K, n)``. Returns a per-column
    ``PCGResult`` (leading R axis on every field)."""
    R = Gamma.shape[0]
    exit_tol = jnp.asarray(exit_tol, Gamma.dtype)
    mv = jax.vmap(lambda v: bdmv(S_blocks, v))
    if identity_pinv:
        apply_pinv = lambda V: V
    else:
        apply_pinv = jax.vmap(lambda v: bdmv(Pinv_blocks, v))

    Res = Gamma - mv(Lam0)
    Z = apply_pinv(Res)
    P = Z
    eta = _gram(Res, Z)                               # (R, R)

    def cond(c):
        _X, _Res, _P, _eta, _iters, conv, step = c
        return jnp.logical_and(step < max_iter, ~jnp.all(conv))

    def body(c):
        X, Res, P, eta, iters, conv, step = c
        W = mv(P)
        theta = _gram(P, W)
        alpha = _pinv_solve(theta, eta)              # (R, R)
        X = X + _colcomb(P, alpha)
        Res = Res - _colcomb(W, alpha)
        Z = apply_pinv(Res)
        eta_new = _gram(Res, Z)
        conv_now = jnp.abs(jnp.diag(eta_new)) < exit_tol   # per column
        beta = _pinv_solve(eta, eta_new)
        P = Z + _colcomb(P, beta)
        iters = iters + (~conv).astype(jnp.int32)     # count to first pass
        conv = conv | conv_now
        return (X, Res, P, eta_new, iters, conv, step + 1)

    conv0 = jnp.abs(jnp.diag(eta)) < exit_tol
    init = (Lam0, Res, P, eta, jnp.zeros((R,), jnp.int32), conv0,
            jnp.zeros((), jnp.int32))
    X, Res, P, eta, iters, conv, _ = jax.lax.while_loop(cond, body, init)
    return PCGResult(lam=X, iters=iters, converged=conv,
                     eta=jnp.diag(eta))
