"""Implicit differentiation through the PCG solve.

Nothing like this exists in the reference (it is a forward solver only), but
a TPU-native framework's solver should be a differentiable JAX citizen — for
learning-based MPC, differentiable trajectory optimization, and solver-in-
the-loop training. We use the implicit function theorem on ``S lam = gamma``
(the converged solution does not depend on the warm start or the
preconditioner, which only shape the iteration path):

  forward:   lam = S^{-1} gamma          (run PCG)
  backward:  given lam_bar,
             w       = S^{-1} lam_bar    (S symmetric -> S^{-T} = S^{-1};
                                          run PCG again, same preconditioner)
             gamma_bar = w
             S_bar[k, d] = -w_k  x_{k+d-1}^T   for d in {left, diag, right}

The S cotangent is assembled directly in cbtd block structure — each stored
block's gradient is an outer product of a ``w`` row with a (shifted) ``lam``
row; entries outside the tridiagonal band have zero gradient by structure.

Both solves run through the same backend, so the VJP is itself fused /
batched / shardable.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from tpcg.ops.bdmv import shift_down, shift_up
from tpcg.types import BlockTridiag, PCGConfig, PCGResult


def _cbtd_outer_grad(w, lam):
    """S_bar blocks ``(..., K, 3, n, n)`` from ``-w_k x_{k+d-1}^T``."""
    xs = (shift_down(lam), lam, shift_up(lam))
    grads = [-jnp.einsum('...kn,...km->...knm', w, x) for x in xs]
    g = jnp.stack(grads, axis=-3)
    # pad slots are structurally absent: zero their gradient
    g = g.at[..., 0, 0, :, :].set(0)
    g = g.at[..., -1, 2, :, :].set(0)
    return g


def make_differentiable_solve(config: PCGConfig, backend: str = "auto"):
    """Build ``solve(S_blocks, gamma) -> lam`` differentiable w.r.t. both
    arguments via implicit diff. The preconditioner is rebuilt per call from
    ``config`` (it must not be differentiated through — it isn't: only the
    fixed point matters)."""
    from tpcg.solver.api import pcg_solve

    def _solve_primal(S_blocks, gamma):
        res = pcg_solve(BlockTridiag(S_blocks), gamma, config=config,
                        backend=backend)
        return res.lam

    @jax.custom_vjp
    def solve(S_blocks, gamma):
        return _solve_primal(S_blocks, gamma)

    def fwd(S_blocks, gamma):
        lam = _solve_primal(S_blocks, gamma)
        return lam, (S_blocks, lam)

    def bwd(residuals, lam_bar):
        S_blocks, lam = residuals
        w = _solve_primal(S_blocks, lam_bar)   # S symmetric
        return _cbtd_outer_grad(w, lam), w

    solve.defvjp(fwd, bwd)
    return solve


def pcg_solve_grad(S, gamma, *, config: Optional[PCGConfig] = None,
                   backend: str = "auto"):
    """Convenience: differentiable solve returning just ``lam``.

    ``jax.grad`` of any scalar function of the returned ``lam`` w.r.t.
    ``S.blocks`` and ``gamma`` is exact at the fixed point (up to the
    forward/backward solve tolerances)."""
    from tpcg.solver.api import _as_bt

    S = _as_bt(S)
    cfg = config or PCGConfig()
    return make_differentiable_solve(cfg, backend)(S.blocks,
                                                   jnp.asarray(gamma))
