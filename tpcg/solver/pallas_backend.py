"""Pallas backend: canonical-layout wrappers over the fused persistent kernel
(tpcg/ops/fused_pcg.py). Layout transposes to/from lane-major happen inside
jit and fuse with neighboring ops; for MPC loops, :class:`tpcg.solver.api.
PCGSolver` keeps everything jitted so they run on-device every step."""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from tpcg.ops.bdmv import to_lane_major, vec_to_lane_major
from tpcg.ops.fused_pcg import (fused_pcg_lane_major,
                                fused_pcg_lane_major_batched)
from tpcg.types import PCGResult


@functools.partial(jax.jit,
                   static_argnames=("max_iter", "precond",
                                    "stop_on_nonfinite", "method",
                                    "interpret"))
def pcg_pallas(S_blocks, Pinv_blocks, gamma, lam0, *, exit_tol,
               max_iter: int, precond: str = None,
               stop_on_nonfinite: bool = False, method: str = "classic",
               interpret: bool = False) -> PCGResult:
    """Single-system fused solve; canonical layout in/out.

    ``Pinv_blocks=None`` selects the identity-preconditioner fast path —
    unless ``precond`` names ``"block_jacobi"``/``"symmetric_stair"``, in
    which case Phi^-1 is CONSTRUCTED inside the kernel from S (one launch
    for build + solve).
    """
    from tpcg.utils.feasibility import pick_fused_variant
    lean = pick_fused_variant(
        S_blocks.shape[-1], S_blocks.shape[-4], S_blocks.dtype,
        identity_pinv=Pinv_blocks is None, precond=precond, method=method)
    S_lm = to_lane_major(S_blocks)
    Pinv_lm = None if Pinv_blocks is None else to_lane_major(
        Pinv_blocks)
    gamma_lm = vec_to_lane_major(gamma)
    lam0_lm = vec_to_lane_major(lam0)
    lam_lm, iters, conv, eta = fused_pcg_lane_major(
        S_lm, Pinv_lm, gamma_lm, lam0_lm, exit_tol=exit_tol,
        max_iter=max_iter, precond=precond, method=method,
        stop_on_nonfinite=stop_on_nonfinite, lean=lean,
        interpret=interpret)
    return PCGResult(lam=jnp.swapaxes(lam_lm, -1, -2), iters=iters,
                     converged=conv, eta=eta)


@functools.partial(jax.jit,
                   static_argnames=("max_iter", "precond",
                                    "stop_on_nonfinite", "method",
                                    "interpret"))
def pcg_pallas_batched(S_blocks, Pinv_blocks, gamma, lam0, *, exit_tol,
                       max_iter: int, precond: str = None,
                       stop_on_nonfinite: bool = False,
                       method: str = "classic",
                       interpret: bool = False) -> PCGResult:
    """Batched fused solve: ``S_blocks (B, K, 3, n, n)``, vectors
    ``(B, K, n)``. VMEM holds one system per grid step."""
    from tpcg.utils.feasibility import pick_fused_variant
    lean = pick_fused_variant(
        S_blocks.shape[-1], S_blocks.shape[-4], S_blocks.dtype,
        identity_pinv=Pinv_blocks is None, precond=precond, method=method)
    to_lm = jax.vmap(to_lane_major)
    S_lm = to_lm(S_blocks)
    Pinv_lm = None if Pinv_blocks is None else to_lm(Pinv_blocks)
    gamma_lm = jnp.swapaxes(gamma, -1, -2)
    lam0_lm = jnp.swapaxes(lam0, -1, -2)
    lam_lm, iters, conv, eta = fused_pcg_lane_major_batched(
        S_lm, Pinv_lm, gamma_lm, lam0_lm, exit_tol=exit_tol,
        max_iter=max_iter, precond=precond, method=method,
        stop_on_nonfinite=stop_on_nonfinite, lean=lean,
        interpret=interpret)
    return PCGResult(lam=jnp.swapaxes(lam_lm, -1, -2), iters=iters,
                     converged=conv, eta=eta)
