"""Compensated-precision fused PCG: f32 storage, double-float accumulation.

The reference ships an fp64 kernel instantiation
(/root/reference/examples/pcg_solve_dp.cu:1-45 instantiates
``pcg<double, ...>``); TPU f64 is XLA-emulated, and the f64 fallback
measured 423 µs on the 3-knot golden system (BENCH_r02) — 31x the f32
kernel. This kernel serves the same capability TPU-natively: inputs and
outputs stay f32, but every accumulation that sets the achievable residual
floor runs in double-float (~48-bit) arithmetic (tpcg/ops/df.py):

* the SpMV products feeding the residual recurrence (``S p``, ``S lam0``)
  accumulate term-by-term in DF;
* lambda and r are CARRIED as DF pairs across iterations (the recurrence
  error floor, not the representation of the final answer, is what stalls
  f32 CG near 1e-7-relative residuals);
* the two dot products reduce through an exact-add pairwise lane tree;
* alpha/beta come from DF divisions.

The preconditioner apply stays plain f32 on the rounded residual — apply
error only perturbs the preconditioner (changing iteration counts
slightly), never the computed residual, so it cannot floor the achievable
tolerance. The search direction p likewise stays f32 (standard
mixed-precision CG: direction rounding perturbs the minimization
subspace, which CG absorbs; residual/iterate accumulation cannot be).

Loop semantics are the classic method's, update-for-update
(pcg.cuh:154-212: absolute ``|eta| < tol`` exit on the DF eta's head,
lambda/r updated on the converging pass, iter-count parity rules).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpcg.ops import df as dfa
from tpcg.ops.bdmv import _lane_shift_down, _lane_shift_up, bdmv_lane_major


def _mv_df(S, v, n, K):
    """cbtd SpMV with double-float term accumulation: every of the 3n
    broadcast-FMA terms of ``bdmv_lane_major`` becomes a two_prod +
    df_add. ~19x the plain op count — still VPU-cheap at trajopt sizes,
    and the loop is scalar-latency dominated anyway."""
    xs = (_lane_shift_down(v, n, K), v, _lane_shift_up(v, n, K))
    zeros = jnp.zeros((n, K), v.dtype)
    acc = (zeros, zeros)
    for d in range(3):
        x = xs[d]
        for c in range(n):
            p, e = dfa.two_prod(S[d, c], x[c:c + 1, :])
            acc = dfa.df_add(acc, (p, e))
    return acc


def _dot_df(x_pair, y, shape):
    """Compensated ``sum(x * y)`` with DF ``x`` and f32 ``y`` -> (1,1) DF."""
    return dfa.df_dot(x_pair, y, shape)


def _pcg_comp_kernel(tol_ref, S_ref, pinv_ref, gamma_ref, lam0_ref,
                     lam_ref, lamlo_ref, iters_ref, conv_ref, eta_ref,
                     *, n, K, max_iter, precond):
    from tpcg.ops.smallinv import (apply_symmetric_stair_factored,
                                   blockdiag_mv_lane_major,
                                   gj_inverse_lane_major)

    S = S_ref[...]
    gamma = gamma_ref[...]
    lam0 = lam0_ref[...]
    tol = tol_ref[0]

    if precond == "identity":
        apply_pinv = lambda v: v
    elif precond == "explicit":
        Pinv = pinv_ref[...]
        apply_pinv = lambda v: bdmv_lane_major(Pinv, v, n=n, K=K)
    elif precond == "block_jacobi":
        Dinv_t = gj_inverse_lane_major(S[1], n, K, unroll=True)
        apply_pinv = lambda v: blockdiag_mv_lane_major(Dinv_t, v, n, K)
    elif precond == "symmetric_stair":
        Dinv_t = gj_inverse_lane_major(S[1], n, K, unroll=True)
        apply_pinv = lambda v: apply_symmetric_stair_factored(
            S, Dinv_t, v, n, K)
    else:
        raise ValueError(f"bad precond {precond!r}")

    shape = (n, K)

    # --- init: r = gamma - S lam0 (DF), rt/p f32, eta DF ---
    r = dfa.df_sub(dfa.df(gamma), _mv_df(S, lam0, n, K))
    rt = apply_pinv(dfa.df_to_f(r))
    p = rt
    eta = _dot_df(r, rt, shape)
    lam = dfa.df(lam0)

    def cond(c):
        (_lh, _ll, _rh, _rl, _p, eta_hi, _el, iters, converged) = c
        return jnp.logical_and(iters < max_iter,
                               jnp.logical_not(converged))

    def body(c):
        lam_hi, lam_lo, r_hi, r_lo, p, eta_hi, eta_lo, iters, _ = c
        lam = (lam_hi, lam_lo)
        r = (r_hi, r_lo)
        eta = (eta_hi, eta_lo)
        ups = _mv_df(S, p, n, K)                      # DF  (S p)
        denom = _dot_df(ups, p, shape)                # (1,1) DF
        alpha = dfa.df_div(eta, denom)                # (1,1) DF
        # (1,1) -> true scalars: Mosaic supports scalar*array broadcasts
        # but not a (1,1) vector broadcast over both sublanes and lanes
        # (this mode is accuracy-first; the two scalar reads per iteration
        # match the classic kernel's sync structure anyway)
        alpha_s = (alpha[0][0, 0], alpha[1][0, 0])
        # lam += alpha p (p f32, alpha DF -> DF term)
        lam = dfa.df_add(lam, dfa.df_mul_f(alpha_s, p))
        # r -= alpha ups (both DF)
        r = dfa.df_sub(r, dfa.df_mul(alpha_s, ups))
        rt = apply_pinv(dfa.df_to_f(r))
        eta_new = _dot_df(r, rt, shape)
        converged = jnp.abs(eta_new[0][0, 0]) < tol   # pcg.cuh:195, DF head
        beta = dfa.df_to_f(dfa.df_div(eta_new, eta))  # f32 is plenty for p
        p = rt + beta[0, 0] * p
        return (lam[0], lam[1], r[0], r[1], p, eta_new[0], eta_new[1],
                iters + 1, converged)

    init = (lam[0], lam[1], r[0], r[1], p, eta[0], eta[1],
            jnp.zeros((), jnp.int32), jnp.abs(eta[0][0, 0]) < tol)
    out = jax.lax.while_loop(cond, body, init)
    lam_hi, lam_lo = out[0], out[1]
    eta_hi = out[5]
    iters, converged = out[7], out[8]

    # the DF pair goes out UNROUNDED (hi + lo would clamp the deliverable
    # accuracy back to one f32 ulp); the wrapper recombines in f64
    lam_ref[:, :] = lam_hi
    lamlo_ref[:, :] = lam_lo
    iters_ref[0] = iters
    conv_ref[0] = converged.astype(jnp.int32)
    eta_ref[0] = eta_hi[0, 0]


def _pcg_comp_kernel_nopinv(tol_ref, S_ref, gamma_ref, lam0_ref,
                            *out_refs, **kw):
    _pcg_comp_kernel(tol_ref, S_ref, None, gamma_ref, lam0_ref,
                     *out_refs, **kw)


@functools.partial(jax.jit,
                   static_argnames=("max_iter", "precond", "interpret"))
def fused_pcg_compensated_lane_major(S_lm, Pinv_lm, gamma_lm, lam0_lm, *,
                                     exit_tol, max_iter: int,
                                     precond: str = None,
                                     interpret: bool = False):
    """Compensated fused solve on lane-major f32 inputs; same contract as
    ``fused_pcg_lane_major`` (classic method only)."""
    _, n, _, K = S_lm.shape
    dtype = S_lm.dtype
    if dtype != jnp.float32:
        raise ValueError("the compensated kernel is f32-storage by "
                         f"definition, got {dtype}")
    if precond is None:
        precond = "identity" if Pinv_lm is None else "explicit"
    if precond != "explicit" and Pinv_lm is not None:
        raise ValueError(f"Pinv_lm must be None with precond={precond!r}")
    tol = jnp.asarray([exit_tol], dtype=dtype)
    kw = dict(n=n, K=K, max_iter=max_iter, precond=precond)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    if precond == "explicit":
        kernel = functools.partial(_pcg_comp_kernel, **kw)
        in_specs = [smem, vmem, vmem, vmem, vmem]
        operands = (tol, S_lm, Pinv_lm, gamma_lm, lam0_lm)
    else:
        kernel = functools.partial(_pcg_comp_kernel_nopinv, **kw)
        in_specs = [smem, vmem, vmem, vmem]
        operands = (tol, S_lm, gamma_lm, lam0_lm)
    with jax.enable_x64(False):
        lam_hi, lam_lo, iters, conv, eta = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((n, K), dtype),
                jax.ShapeDtypeStruct((n, K), dtype),
                jax.ShapeDtypeStruct((1,), jnp.int32),
                jax.ShapeDtypeStruct((1,), jnp.int32),
                jax.ShapeDtypeStruct((1,), dtype),
            ),
            in_specs=in_specs,
            out_specs=(vmem, vmem, smem, smem, smem),
            interpret=interpret,
        )(*operands)
    return lam_hi, lam_lo, iters[0], conv[0] != 0, eta[0]
