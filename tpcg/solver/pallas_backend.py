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
                                    "precond_refine", "debug_eta",
                                    "spec_budget", "replace_every",
                                    "interpret"))
def pcg_pallas(S_blocks, Pinv_blocks, gamma, lam0, *, exit_tol,
               max_iter: int, precond: str = None,
               stop_on_nonfinite: bool = False, method: str = "classic",
               precond_refine: int = 0, debug_eta: bool = False,
               spec_budget: int = 0, replace_every: int = 16,
               interpret: bool = False):
    """Single-system fused solve; canonical layout in/out.

    ``Pinv_blocks=None`` selects the identity-preconditioner fast path —
    unless ``precond`` names ``"block_jacobi"``/``"symmetric_stair"``, in
    which case Phi^-1 is CONSTRUCTED inside the kernel from S (one launch
    for build + solve).

    ``debug_eta=True`` returns ``(PCGResult, etas)`` with the per-pass eta
    trace written from the kernel itself (tpcg/ops/fused_pcg.py) — on-chip
    convergence forensics over the production arithmetic.
    """
    from tpcg.utils.feasibility import pick_fused_variant
    lean = pick_fused_variant(
        S_blocks.shape[-1], S_blocks.shape[-4], S_blocks.dtype,
        identity_pinv=Pinv_blocks is None, precond=precond, method=method,
        pinv_pages=3 if Pinv_blocks is None else Pinv_blocks.shape[-3])
    S_lm = to_lane_major(S_blocks)
    Pinv_lm = None if Pinv_blocks is None else to_lane_major(
        Pinv_blocks)
    gamma_lm = vec_to_lane_major(gamma)
    lam0_lm = vec_to_lane_major(lam0)
    out = fused_pcg_lane_major(
        S_lm, Pinv_lm, gamma_lm, lam0_lm, exit_tol=exit_tol,
        max_iter=max_iter, precond=precond, method=method,
        stop_on_nonfinite=stop_on_nonfinite, lean=lean,
        precond_refine=precond_refine, debug_eta=debug_eta,
        spec_budget=spec_budget, replace_every=replace_every,
        interpret=interpret)
    lam_lm, iters, conv, eta = out[:4]
    res = PCGResult(lam=jnp.swapaxes(lam_lm, -1, -2), iters=iters,
                    converged=conv, eta=eta)
    return (res, out[4]) if debug_eta else res


@functools.partial(jax.jit,
                   static_argnames=("max_iter", "precond", "interpret"))
def pcg_pallas_compensated(S_blocks, Pinv_blocks, gamma, lam0, *, exit_tol,
                           max_iter: int, precond: str = None,
                           interpret: bool = False) -> PCGResult:
    """Single-system compensated-accumulation solve (PCGConfig.accumulate
    = 'compensated'); canonical layout in/out. f32 storage, double-float
    recurrence/dot accumulation in-kernel (tpcg/ops/compensated.py) — the
    TPU-native fp64 story."""
    from tpcg.ops.compensated import fused_pcg_compensated_lane_major
    from tpcg.utils.feasibility import check_fused_fits

    # DF pairs roughly double the vector working set; rhs=2 charges that
    # in the calibrated model (matrix terms are unchanged)
    check_fused_fits(S_blocks.shape[-1], S_blocks.shape[-4],
                     S_blocks.dtype,
                     identity_pinv=Pinv_blocks is None, precond=precond,
                     rhs=2, lean=False,
                     pinv_pages=3 if Pinv_blocks is None
                     else Pinv_blocks.shape[-3])
    S_lm = to_lane_major(S_blocks)
    Pinv_lm = None if Pinv_blocks is None else to_lane_major(Pinv_blocks)
    hi_lm, lo_lm, iters, conv, eta = fused_pcg_compensated_lane_major(
        S_lm, Pinv_lm, vec_to_lane_major(gamma), vec_to_lane_major(lam0),
        exit_tol=exit_tol, max_iter=max_iter, precond=precond,
        interpret=interpret)
    # recombine the DF pair OUTSIDE the kernel. With jax_enable_x64 the
    # result is genuine float64 carrying the full ~48-bit iterate (the
    # whole point of the mode); without it JAX clamps to f32 — the best
    # single-float rounding of the same iterate.
    lam = (jnp.swapaxes(hi_lm, -1, -2).astype(jnp.float64)
           + jnp.swapaxes(lo_lm, -1, -2).astype(jnp.float64))
    return PCGResult(lam=lam, iters=iters, converged=conv, eta=eta)


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
    ``(B, K, n)``.

    Routing: the lane-packed kernel (tpcg/ops/packed.py — P systems jointly
    per grid step, per-iteration latency amortized over the pack, idle
    lanes at K < 128 filled) whenever a lane-aligned pack fits VMEM; the
    one-system-per-grid-step kernel otherwise (large K — its grid blocks
    need K % 128 == 0). All three methods (classic/pipelined/fixed) and
    ``stop_on_nonfinite`` run lane-packed.
    """
    from tpcg.ops.packed import pad_systems, pcg_pallas_packed, plan_pack
    from tpcg.utils.feasibility import pick_fused_variant

    B, K = gamma.shape[0], gamma.shape[1]
    n = gamma.shape[2]
    plan = plan_pack(B, K, n, S_blocks.dtype,
                     precond=precond,
                     identity_pinv=Pinv_blocks is None and
                     precond in (None, "identity"),
                     method=method,
                     pinv_pages=3 if Pinv_blocks is None
                     else Pinv_blocks.shape[-3])
    if plan is not None and plan[0] == 1 and K % 128 == 0:
        plan = None  # no amortization to gain; the grid kernel is leaner
    if plan is not None:
        P, K_pad, B_pad, stream = plan
        if stream and interpret:
            stream = False  # manual DMA has no interpret support
            P = P // 2      # back to the buffered-fast width
            B_pad = -(-B // P) * P
        S_p, P_p, g_p, l_p = pad_systems(S_blocks, Pinv_blocks, gamma,
                                         lam0, K_pad, B_pad)
        res = pcg_pallas_packed(S_p, P_p, g_p, l_p, exit_tol=exit_tol,
                                max_iter=max_iter, precond=precond,
                                method=method, P=P, stream=stream,
                                stop_on_nonfinite=stop_on_nonfinite,
                                interpret=interpret)
        return PCGResult(lam=res.lam[:B, :K], iters=res.iters[:B],
                         converged=res.converged[:B], eta=res.eta[:B])

    if K % 128 != 0:
        raise ValueError(
            f"no lane-aligned pack fits VMEM for n={n}, K={K}, and the "
            "fallback grid-batched kernel needs K % 128 == 0; use "
            "backend='jnp' or shard the knot axis")
    lean = pick_fused_variant(
        S_blocks.shape[-1], S_blocks.shape[-4], S_blocks.dtype,
        identity_pinv=Pinv_blocks is None, precond=precond, method=method,
        pinv_pages=3 if Pinv_blocks is None else Pinv_blocks.shape[-3])
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
