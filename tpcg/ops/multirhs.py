"""Multi-right-hand-side fused PCG: one system matrix, R right-hand sides,
solved JOINTLY in one kernel.

Neither the reference nor its downstream consumers support this (one vector
per launch); on TPU it is nearly free: vectors become ``(R, n, K)`` with the
small R axis unrolled over VPU ops (which are underutilized at ``(n, K)``
tile sizes anyway), S stays shared in VMEM, and all R solves share each
iteration's sweep. Per-rhs scalars (alpha/beta/eta) are length-R vectors;
converged systems are frozen with ``jnp.where`` masks (NOT 0/1 multiplies —
an rhs converged at entry has alpha = 0/0 = NaN and ``0 * NaN = NaN``), and
the loop runs until every rhs converges or ``max_iter``.

Use cases: covariance/sensitivity propagation (solve against several
perturbation directions), multi-target MPC, and block-Krylov
experimentation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpcg.ops.bdmv import bdmv_lane_major, to_lane_major
from tpcg.types import PCGResult


def _multirhs_kernel(tol_ref, S_ref, gamma_ref, lam0_ref,
                     lam_ref, iters_ref, conv_ref, eta_ref,
                     *, n, K, R, max_iter, precond, method="classic",
                     lean=False):
    from tpcg.ops.fused_pcg import _apply_stair_from_ref, _bdmv_from_ref
    from tpcg.ops.smallinv import (apply_symmetric_stair_factored,
                                   blockdiag_mv_lane_major,
                                   gj_inverse_lane_major)

    gamma = gamma_ref[...]
    lam0 = lam0_ref[...]
    tol = tol_ref[0]

    # lean: matrix pages sliced off the ref at use + fori Gauss-Jordan
    # (lower scoped-VMEM peak, slower per iteration) — same tradeoff as
    # tpcg/ops/fused_pcg.py, selected by the caller near the VMEM ceiling
    if lean:
        mv1 = lambda v: _bdmv_from_ref(S_ref, v, n, K)
        diag = lambda: S_ref[1]
        stair = lambda Dinv_t, v: _apply_stair_from_ref(
            S_ref, Dinv_t, v, n, K)
    else:
        S = S_ref[...]
        mv1 = lambda v: bdmv_lane_major(S, v, n=n, K=K)
        diag = lambda: S[1]
        stair = lambda Dinv_t, v: apply_symmetric_stair_factored(
            S, Dinv_t, v, n, K)

    if precond == "identity":
        apply1 = lambda v: v
    elif precond == "block_jacobi":
        Dinv_t = gj_inverse_lane_major(diag(), n, K, unroll=not lean)
        apply1 = lambda v: blockdiag_mv_lane_major(Dinv_t, v, n, K)
    elif precond == "symmetric_stair":
        Dinv_t = gj_inverse_lane_major(diag(), n, K, unroll=not lean)
        apply1 = lambda v: stair(Dinv_t, v)
    else:
        raise ValueError(f"bad precond {precond!r}")

    mv = lambda X: jnp.stack([mv1(X[i]) for i in range(R)])
    apply_pinv = lambda X: jnp.stack([apply1(X[i]) for i in range(R)])
    # per-rhs scalars are kept 2-D (R, 1), and NO rank-1 intermediate is
    # ever formed: Mosaic CHECK-fails (layout.h: arr.size() >=
    # layout_rank) on rank-1 vector values
    vdot = lambda a, b: jnp.sum(jnp.sum(a * b, axis=2), axis=1,
                                keepdims=True)                 # (R, 1)

    if method not in ("classic", "pipelined", "fixed", "fixed_pipelined"):
        raise ValueError(f"bad method {method!r}")

    # (R, 1, 1)-shaped per-rhs scalars broadcast directly against the
    # (R, n, K) vectors — the fixed-budget bodies need no masks at all
    vdot3 = lambda a, b: jnp.sum(jnp.sum(a * b, axis=2, keepdims=True),
                                 axis=1, keepdims=True)

    if method == "fixed_pipelined":
        from tpcg.solver.pipelined import fixed_pipelined_body
        lam, eta3 = fixed_pipelined_body(mv, apply_pinv, vdot3, gamma,
                                         lam0, max_iter)
        lam_ref[...] = lam
        for i in range(R):
            iters_ref[i] = jnp.int32(max_iter)
            conv_ref[i] = (jnp.abs(eta3[i, 0, 0]) < tol).astype(jnp.int32)
            eta_ref[i] = eta3[i, 0, 0]
        return

    if method == "fixed":
        tiny = jnp.asarray(1e-30, gamma.dtype)
        r = gamma - mv(lam0)
        rt = apply_pinv(r)
        eta = vdot3(r, rt)

        def fbody(_, c):
            lam, r, p, eta = c
            ups = mv(p)
            alpha = eta / (vdot3(p, ups) + tiny)
            lam = lam + alpha * p
            r = r - alpha * ups
            rt = apply_pinv(r)
            eta_new = vdot3(r, rt)
            beta = eta_new / (eta + tiny)
            p = rt + beta * p
            return (lam, r, p, eta_new)

        lam, r, p, eta3 = jax.lax.fori_loop(0, max_iter, fbody,
                                            (lam0, r, rt, eta))
        lam_ref[...] = lam
        for i in range(R):
            iters_ref[i] = jnp.int32(max_iter)
            conv_ref[i] = (jnp.abs(eta3[i, 0, 0]) < tol).astype(jnp.int32)
            eta_ref[i] = eta3[i, 0, 0]
        return

    if method == "pipelined":
        lam, iters, conv32, eta = _multirhs_pipelined_loop(
            mv, apply_pinv, vdot, gamma, lam0, tol, max_iter, R)
        lam_ref[...] = lam
        for i in range(R):
            iters_ref[i] = iters[i, 0]
            conv_ref[i] = conv32[i, 0]
            eta_ref[i] = eta[i, 0]
        return

    r = gamma - mv(lam0)
    rt = apply_pinv(r)
    p = rt
    eta = vdot(r, rt)

    # converged is carried as int32 (Mosaic can't yield i1 vectors from
    # scf.while); bool masks are derived as loop-local temporaries
    def cond(c):
        lam, r, p, eta, iters, conv32, step = c
        # min-reduce, NOT jnp.sum: integer sums promote to i64 under x64
        return jnp.logical_and(step < max_iter,
                               jnp.min(conv32) < jnp.int32(1))

    def body(c):
        lam, r, p, eta, iters, conv32, step = c
        active = conv32 == 0                          # (R, 1) bool temp
        am = active[:, :, None]                       # (R, 1, 1)
        ups = mv(p)
        alpha = (eta / vdot(p, ups))[:, :, None]
        lam = jnp.where(am, lam + alpha * p, lam)
        r = jnp.where(am, r - alpha * ups, r)
        rt = apply_pinv(r)
        eta_new = jnp.where(active, vdot(r, rt), eta)
        conv_new = (jnp.abs(eta_new) < tol).astype(jnp.int32)
        beta = (eta_new / eta)[:, :, None]
        p = jnp.where(am, rt + beta * p, p)
        iters = iters + active.astype(jnp.int32)
        return (lam, r, p, eta_new, iters,
                jnp.maximum(conv32, conv_new), step + 1)

    conv0 = (jnp.abs(eta) < tol).astype(jnp.int32)
    init = (lam0, r, p, eta, jnp.zeros((R, 1), jnp.int32), conv0,
            jnp.zeros((), jnp.int32))
    lam, r, p, eta, iters, conv32, _ = jax.lax.while_loop(cond, body, init)
    lam_ref[...] = lam
    for i in range(R):  # SMEM stores must be scalar-at-a-time
        iters_ref[i] = iters[i, 0]
        conv_ref[i] = conv32[i, 0]
        eta_ref[i] = eta[i, 0]


def _multirhs_pipelined_loop(mv, apply_pinv, vdot, gamma, lam0, tol,
                             max_iter, R, replace_every: int = 16):
    """Pipelined (Ghysels-Vanroose) iteration for R joint right-hand sides:
    per-rhs scalars are (R, 1) arrays, converged rhs are frozen with
    jnp.where masks, and both dots share one sync point per iteration. Same
    residual-replacement cadence as tpcg/solver/pipelined.py (the fp32
    recurrences drift without it).

    Measured on chip (R=8, iiwa K=128): 62.8 us vs 59.7 us classic — at
    R >= 8 the joint iteration is VECTOR-bound (R x the VPU work), so
    merging the sync points buys nothing while the 4 extra recurrences per
    rhs cost real work. Offered for completeness/small R; classic stays
    the multi-RHS default."""
    r = gamma - mv(lam0)
    u = apply_pinv(r)
    w = mv(u)
    zeros = jnp.zeros_like(r)
    eta0 = vdot(r, u)                               # (R, 1)

    def cond(c):
        step = c[-1]
        conv32 = c[-2]
        # min-reduce, NOT jnp.sum: integer sums promote to i64 under x64
        return jnp.logical_and(step < max_iter,
                               jnp.min(conv32) < jnp.int32(1))

    def body(c):
        (x, r, u, w, z, q, s, p, eta_prev, alpha_prev, iters, conv32,
         step) = c
        active = conv32 == 0                        # (R, 1)
        am = active[:, :, None]
        eta = jnp.where(active, vdot(r, u), eta_prev)
        delta = vdot(w, u)
        m = apply_pinv(w)
        nn = mv(m)
        first = step == 0
        beta = jnp.where(first, jnp.zeros_like(eta), eta / eta_prev)
        alpha = jnp.where(first, eta / delta,
                          eta / (delta - beta * eta / alpha_prev))
        b3 = beta[:, :, None]
        a3 = alpha[:, :, None]
        z = jnp.where(am, nn + b3 * z, z)
        q = jnp.where(am, m + b3 * q, q)
        s = jnp.where(am, w + b3 * s, s)
        p = jnp.where(am, u + b3 * p, p)
        x = jnp.where(am, x + a3 * p, x)
        r = jnp.where(am, r - a3 * s, r)
        u = jnp.where(am, u - a3 * q, u)
        w = jnp.where(am, w - a3 * z, w)
        if replace_every:
            def replace(args):
                x, p, r, u, w, s, q, z = args
                r = gamma - mv(x)
                u = apply_pinv(r)
                w = mv(u)
                s = mv(p)
                q = apply_pinv(s)
                z = mv(q)
                return (x, p, r, u, w, s, q, z)

            re32 = jnp.int32(replace_every)  # i64-safe under x64
            do_replace = jnp.logical_and(
                step % re32 == re32 - jnp.int32(1), step > jnp.int32(0))
            x, p, r, u, w, s, q, z = jax.lax.cond(
                do_replace, replace, lambda args: args,
                (x, p, r, u, w, s, q, z))
        conv_new = (jnp.abs(eta) < tol).astype(jnp.int32)
        iters = iters + active.astype(jnp.int32)
        return (x, r, u, w, z, q, s, p, eta, alpha, iters,
                jnp.maximum(conv32, conv_new), step + 1)

    conv0 = (jnp.abs(eta0) < tol).astype(jnp.int32)
    ones = jnp.ones_like(eta0)
    init = (lam0, r, u, w, zeros, zeros, zeros, zeros, eta0, ones,
            jnp.zeros((R, 1), jnp.int32), conv0, jnp.zeros((), jnp.int32))
    out = jax.lax.while_loop(cond, body, init)
    x, iters, conv32, eta = out[0], out[10], out[11], out[8]
    return x, iters, conv32, eta


@functools.partial(jax.jit, static_argnames=("max_iter", "precond",
                                             "method", "lean", "interpret"))
def pcg_pallas_multirhs(S_blocks, gamma, lam0, *, exit_tol, max_iter: int,
                        precond: str = "symmetric_stair",
                        method: str = "classic", lean: bool = False,
                        interpret: bool = False) -> PCGResult:
    """Solve ``S lam_i = gamma_i`` for R right-hand sides jointly.

    ``S_blocks (K, 3, n, n)``; ``gamma``/``lam0`` ``(R, K, n)``. Returns
    per-rhs ``PCGResult`` with leading R axis on every field. The
    preconditioner (identity / block_jacobi / symmetric_stair) is built
    in-kernel from S."""
    R, K, n = gamma.shape
    dtype = S_blocks.dtype
    from tpcg.utils.feasibility import pick_fused_variant
    if not lean:  # honor an explicit lean=True; else pick by VMEM model
        lean = pick_fused_variant(n, K, dtype, precond=precond, rhs=R,
                                  method=method)

    S_lm = to_lane_major(S_blocks)
    g_lm = jnp.swapaxes(gamma, -1, -2)      # (R, n, K)
    l_lm = jnp.swapaxes(lam0, -1, -2)
    tol = jnp.asarray([exit_tol], dtype)
    kernel = functools.partial(_multirhs_kernel, n=n, K=K, R=R,
                               max_iter=max_iter, precond=precond,
                               method=method, lean=lean)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    with jax.enable_x64(False):
        lam, iters, conv, eta = pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct((R, n, K), dtype),
                jax.ShapeDtypeStruct((R,), jnp.int32),
                jax.ShapeDtypeStruct((R,), jnp.int32),
                jax.ShapeDtypeStruct((R,), dtype),
            ),
            in_specs=[smem, vmem, vmem, vmem],
            out_specs=(vmem, smem, smem, smem),
            interpret=interpret,
        )(tol, S_lm, g_lm, l_lm)
    return PCGResult(lam=jnp.swapaxes(lam, -1, -2), iters=iters,
                     converged=conv != 0, eta=eta)
