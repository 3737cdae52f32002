"""Convergence diagnostics.

The reference's only observability is a (partially lost) iteration count
(SURVEY.md §5.5). tpcg's solves return structured results; this module adds
the next level: the full eta trajectory of a solve — ``eta_k = r_k . Pinv
r_k`` per iteration, the quantity the exit test watches (pcg.cuh:195) —
for tolerance tuning, preconditioner comparison, and divergence forensics.

Implemented as a fixed-length ``lax.scan`` over the classic iteration (jnp
ops, any platform); iterations after convergence hold eta constant, so the
curve is flat past the exit point the solver would have taken.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from tpcg.ops.bdmv import bdmv
from tpcg.types import BlockTridiag, PCGConfig


@functools.partial(jax.jit, static_argnames=("max_iter", "identity_pinv"))
def _eta_scan(S_blocks, Pinv_blocks, gamma, lam0, *, exit_tol,
              max_iter: int, identity_pinv: bool):
    apply_pinv = ((lambda v: v) if identity_pinv
                  else (lambda v: bdmv(Pinv_blocks, v)))
    r = gamma - bdmv(S_blocks, lam0)
    rt = apply_pinv(r)
    p = rt
    eta = jnp.sum(r * rt)

    def step(carry, _):
        lam, r, p, eta, done = carry
        ups = bdmv(S_blocks, p)
        alpha = eta / jnp.sum(p * ups)
        lam_n = lam + alpha * p
        r_n = r - alpha * ups
        rt = apply_pinv(r_n)
        eta_n = jnp.sum(r_n * rt)
        p_n = rt + (eta_n / eta) * p
        done_n = jnp.logical_or(done, jnp.abs(eta_n) < exit_tol)
        # freeze once converged so the recorded curve is flat afterwards
        lam = jnp.where(done, lam, lam_n)
        r = jnp.where(done, r, r_n)
        p = jnp.where(done, p, p_n)
        eta = jnp.where(done, eta, eta_n)
        return (lam, r, p, eta, done_n), eta

    init = (lam0, r, p, eta, jnp.abs(eta) < exit_tol)
    (lam, *_), etas = jax.lax.scan(step, init, None, length=max_iter)
    return lam, eta, etas


def eta_history(S, gamma, lam0=None, *, config: Optional[PCGConfig] = None,
                Pinv: Optional[BlockTridiag] = None):
    """Run a solve and return ``(lam, etas)`` where ``etas`` has shape
    ``(max_iter,)`` — eta after each iteration (flat after convergence).
    Uses the classic method on the jnp backend regardless of platform."""
    from tpcg import precond
    from tpcg.solver.api import _as_bt

    S = _as_bt(S)
    gamma = jnp.asarray(gamma)
    lam0 = jnp.zeros_like(gamma) if lam0 is None else jnp.asarray(lam0)
    config = config or PCGConfig()
    identity = config.preconditioner == "identity" and Pinv is None
    pblocks = (S.blocks if identity
               else precond.materialize(S, config, Pinv).blocks)
    lam, _, etas = _eta_scan(S.blocks, pblocks, gamma, lam0,
                             exit_tol=config.exit_tol,
                             max_iter=config.max_iter,
                             identity_pinv=identity)
    return lam, etas


def iterations_to_tolerance(etas, exit_tol: float) -> int:
    """Iteration count implied by an eta curve under the reference's exit
    semantics (first k with |eta_k| < tol, 1-based; len(etas) if never)."""
    import numpy as np

    below = np.abs(np.asarray(etas)) < exit_tol
    return int(np.argmax(below)) + 1 if below.any() else len(etas)
