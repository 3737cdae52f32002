"""Pure-jnp PCG backend — the algorithmic oracle.

Reimplements, update-for-update, the algorithm of the reference's persistent
cooperative kernel (/root/reference/include/pcg.cuh:54-218; walked in
SURVEY.md §3.2), as straight-line XLA under ``lax.while_loop``:

* same update order (upsilon, alpha, lambda/r update, r_tilde, eta_new, exit
  test, beta, p update),
* same *absolute* exit test ``|eta_new| < exit_tol`` on the preconditioned
  residual inner product (pcg.cuh:195),
* same iteration-count semantics: convergence on 0-based loop pass ``i``
  reports ``i+1``; exhausting ``max_iter`` reports ``max_iter`` with
  ``converged=False`` (pcg.cuh:154,195,212 — ``max_iter_exit`` negated),
* lambda/r are updated on the converging pass *before* the test fires,
  exactly like the reference (pcg.cuh:172-176 precede :195).

The reference needs 4 grid-wide barriers per iteration (pcg.cuh:166,178,190,
207) because thread-blocks race on halo segments and scalar reductions; on a
single TPU core the dataflow is sequential, so every barrier disappears —
XLA's dependence order *is* the synchronization.

This backend is the correctness oracle for the fused Pallas backend, the CPU
CI fallback, and — vmapped — a strong XLA baseline for batched solves. It is
also the only backend for float64 (TPU Pallas is f32-native; XLA emulates
f64).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpcg.ops import blas
from tpcg.ops.bdmv import bdmv
from tpcg.types import BlockTridiag, PCGResult


class _Carry(NamedTuple):
    lam: jax.Array
    r: jax.Array
    p: jax.Array
    eta: jax.Array
    iters: jax.Array
    converged: jax.Array


def _vdot(a, b):
    return jnp.sum(a * b, axis=(-2, -1))


def classic_pcg_step(S_blocks, apply_pinv, lam, r, p, eta):
    """One classic PCG iteration (pcg.cuh:157-206 order), shared by the
    solver loop and the diagnostics scan so the reference-parity algorithm
    has exactly one implementation. The vector updates go through the
    GLASS-vocabulary primitives (tpcg/ops/blas.py) — the same role
    glass::dot / the strided AXPY loops play in the reference kernel.
    Returns (lam, r, p, eta_new)."""
    ups = bdmv(S_blocks, p)                      # upsilon = S p
    alpha = eta / _vdot(p, ups)                  # pcg.cuh:163-169
    lam = blas.axpy(alpha, p, lam)               # pcg.cuh:172-176
    r = blas.axpy(-alpha, ups, r)
    r_tilde = apply_pinv(r)                      # pcg.cuh:181-184
    eta_new = _vdot(r, r_tilde)                  # pcg.cuh:187-193
    beta = eta_new / eta                         # pcg.cuh:199-206
    p = blas.axpy(beta, p, r_tilde)
    return lam, r, p, eta_new


@functools.partial(jax.jit, static_argnames=("max_iter", "identity_pinv",
                                              "stop_on_nonfinite",
                                              "precond_refine"))
def pcg_jnp(S_blocks, Pinv_blocks, gamma, lam0, *, exit_tol,
            max_iter: int, identity_pinv: bool = False,
            stop_on_nonfinite: bool = False,
            precond_refine: int = 0) -> PCGResult:
    """Run PCG to the reference's semantics. All arrays canonical layout:
    ``S_blocks``/``Pinv_blocks`` ``(K, 3, n, n)``, vectors ``(K, n)``.

    With ``identity_pinv=True`` the preconditioner multiply is elided
    (``r_tilde = r``) — the fast path the reference's ``empty_pinv`` flag
    promised but never delivered (SURVEY.md §3.1).

    ``precond_refine > 0`` applies Neumann refinement steps
    ``z <- z + Pinv (v - S z)`` per preconditioner apply — a stronger
    effective preconditioner that cuts iteration counts (PCGConfig doc);
    this is the oracle for the sharded solver's use of it.
    """
    S = BlockTridiag(S_blocks)
    exit_tol = jnp.asarray(exit_tol, dtype=gamma.dtype)

    def apply_pinv(v):
        if identity_pinv:
            return v
        z = bdmv(Pinv_blocks, v)
        for _ in range(precond_refine):
            z = z + bdmv(Pinv_blocks, v - bdmv(S_blocks, z))
        return z

    # --- init (pcg.cuh:118-149) ---
    r = gamma - bdmv(S.blocks, lam0)
    r_tilde = apply_pinv(r)
    p = r_tilde
    eta = _vdot(r, r_tilde)

    def cond(c: _Carry):
        go = jnp.logical_and(c.iters < max_iter,
                             jnp.logical_not(c.converged))
        if stop_on_nonfinite:
            go = jnp.logical_and(go, jnp.isfinite(c.eta))
        return go

    def body(c: _Carry):
        lam, r, p, eta_new = classic_pcg_step(S.blocks, apply_pinv,
                                              c.lam, c.r, c.p, c.eta)
        # exit test (pcg.cuh:195); on the converged path p/eta are dead
        converged = jnp.abs(eta_new) < exit_tol
        return _Carry(lam, r, p, eta_new, c.iters + 1, converged)

    # Deviation from the reference (quirk policy, SURVEY.md §7): if the
    # warm start already satisfies the tolerance, report 0 iterations
    # instead of entering the loop with eta=0 and computing alpha=0/0=NaN
    # (which is what pcg.cuh:154-169 would do — it never checks before the
    # first pass).
    init = _Carry(lam0, r, p, eta,
                  jnp.zeros((), jnp.int32), jnp.abs(eta) < exit_tol)
    out = jax.lax.while_loop(cond, body, init)
    return PCGResult(lam=out.lam, iters=out.iters, converged=out.converged,
                     eta=out.eta)


@functools.partial(jax.jit, static_argnames=("max_iter", "identity_pinv",
                                             "stop_on_nonfinite",
                                             "precond_refine"))
def pcg_fixed_jnp(S_blocks, Pinv_blocks, gamma, lam0, *, exit_tol,
                  max_iter: int, identity_pinv: bool = False,
                  stop_on_nonfinite: bool = False,
                  precond_refine: int = 0) -> PCGResult:
    """Fixed-budget PCG oracle (``PCGConfig.method='fixed'``): exactly
    ``max_iter`` passes of the classic recurrence with no per-iteration
    exit test — the jnp mirror of the fused kernel's zero-sync mode.
    ``iters`` reports the budget; ``converged`` whether the final eta met
    ``exit_tol``. ``stop_on_nonfinite`` is accepted for signature parity
    (there is no early exit of any kind in this mode). The +tiny
    denominators keep an already-converged warm start at alpha ~ 0
    instead of NaN (the loop cannot stop early)."""
    del stop_on_nonfinite
    exit_tol = jnp.asarray(exit_tol, dtype=gamma.dtype)
    tiny = jnp.asarray(1e-30, gamma.dtype)

    def apply_pinv(v):
        if identity_pinv:
            return v
        z = bdmv(Pinv_blocks, v)
        for _ in range(precond_refine):
            z = z + bdmv(Pinv_blocks, v - bdmv(S_blocks, z))
        return z

    r = gamma - bdmv(S_blocks, lam0)
    rt = apply_pinv(r)
    eta0 = _vdot(r, rt)

    def body(_, c):
        lam, r, p, eta = c
        ups = bdmv(S_blocks, p)
        alpha = eta / (_vdot(p, ups) + tiny)
        lam = lam + alpha * p
        r = r - alpha * ups
        rt = apply_pinv(r)
        eta_new = _vdot(r, rt)
        beta = eta_new / (eta + tiny)
        p = rt + beta * p
        return (lam, r, p, eta_new)

    lam, r, p, eta = jax.lax.fori_loop(0, max_iter, body,
                                       (lam0, r, rt, eta0))
    return PCGResult(lam=lam, iters=jnp.asarray(max_iter, jnp.int32),
                     converged=jnp.abs(eta) < exit_tol, eta=eta)
