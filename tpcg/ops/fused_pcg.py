"""The fused persistent PCG solve kernel.

TPU-native equivalent of the reference's single cooperative-groups kernel
(/root/reference/include/pcg.cuh:54-218): the *entire* solve — residual init,
preconditioner applies, both dot products, AXPYs, and the absolute
``|eta_new| < exit_tol`` convergence exit — runs in ONE ``pallas_call``, with
a ``lax.while_loop`` inside the kernel replacing the persistent loop + the 7
``grid.sync()`` barriers (SURVEY.md §5.8). On a TPU core the dataflow is
sequential, so every barrier, halo spill (pcg.cuh:125,139,175,205), and
hand-rolled global-memory all-reduce (pcg.cuh:144-149,163-169,187-193) simply
vanishes: partial dots are a VPU reduction, halos are lane shifts.

Layout: everything lane-major — blocks ``(3, n, n, K)``, vectors ``(n, K)`` —
so the knot axis (large: 32..512) sits on the 128-wide lane dimension and the
tiny ``state_size`` axis (2..14) on sublanes. Every op in the iteration then
vectorizes over knots, which is the same work distribution as the reference's
one-thread-block-per-knot decomposition (interface.cuh:132), minus the
synchronization. HBM traffic per solve is one read of S/Pinv/gamma/lam0 and
one write of lam: all iteration state lives in VMEM/registers, the analog of
the reference keeping its working set in shared memory (pcg.cuh:79-96).

Early exit: ``lax.while_loop`` predicated on
``(iter < max_iter) & ~converged`` reproduces pcg.cuh:154,195 exactly,
including the reference's update of lambda/r on the converging pass and its
``iter+1`` reporting semantics.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpcg.ops.banded import banded_mv_lane_major
from tpcg.ops.bdmv import (_lane_shift_down, _lane_shift_up,
                           bdmv_lane_major)


def _bdmv_from_ref(S_ref, v, n, K):
    """Lane-major bdmv reading each diagonal page straight off the VMEM ref.

    Loading the whole ``(3, n, n, K)`` S as one value (``S_ref[...]``) keeps
    a full S-sized copy live on the kernel stack for the lifetime of the
    while_loop — measured on chip as ~1x S of scoped VMEM on top of the
    operand buffer. Slice-at-use keeps only one ``(n, n, K)`` page live at a
    time, which is what sets the max feasible K."""
    xs = (_lane_shift_down(v, n, K), v, _lane_shift_up(v, n, K))
    acc = jnp.zeros((n, K), v.dtype)
    for d in range(3):
        acc = acc + jnp.sum(S_ref[d] * xs[d][:, None, :], axis=0)
    return acc


def _apply_stair_from_ref(S_ref, Dinv_t, v, n, K):
    """Factored symmetric-stair apply (tpcg/ops/smallinv.py:
    apply_symmetric_stair_factored) with the L/R pages read off the ref at
    use instead of captured as values."""
    from tpcg.ops.smallinv import blockdiag_mv_lane_major

    w = blockdiag_mv_lane_major(Dinv_t, v, n, K)
    w_dn = _lane_shift_down(w, n, K)
    w_up = _lane_shift_up(w, n, K)
    t = v - (jnp.sum(S_ref[0] * w_dn[:, None, :], axis=0) +
             jnp.sum(S_ref[2] * w_up[:, None, :], axis=0))
    return blockdiag_mv_lane_major(Dinv_t, t, n, K)


def _pcg_kernel(tol_ref, S_ref, pinv_ref, gamma_ref, lam0_ref,
                lam_ref, iters_ref, conv_ref, eta_ref, trace_ref=None,
                *, n, K, max_iter, precond, stop_on_nonfinite=False,
                method="classic", out_idx=0, lean=False,
                precond_refine=0, spec_budget=0, replace_every=16):
    """Kernel body.

    ``precond`` selects the preconditioner strategy:
      * ``"explicit"`` — apply the prebuilt ``pinv_ref`` (cbtd bdmv);
      * ``"identity"`` — elide the apply entirely (``pinv_ref`` unused; the
        reference's ``empty_pinv`` promise, actually kept);
      * ``"block_jacobi"`` / ``"symmetric_stair"`` — CONSTRUCT Phi^-1 inside
        the kernel from S (batched Gauss-Jordan inversions + products on the
        VPU, tpcg/ops/smallinv.py) — build + whole solve in one kernel
        launch, the full fusion of what MPCGPU does in separate
        assembly kernels before calling the reference solver.

    ``lean`` trades per-iteration latency for VMEM footprint: False loads
    S (and Pinv) as whole values once and unrolls the Gauss-Jordan — the
    fast form (headline scales); True re-slices matrix pages off the VMEM
    refs at every use and runs Gauss-Jordan as a fori_loop — measured
    ~1.4x S less scoped VMEM (tpcg/utils/feasibility.py), selected by the
    backend when the fast form would overflow.

    Scalar diagnostics are stored at ``out_idx`` in their SMEM refs (0 for
    the single-system kernel; ``program_id`` for the grid-batched one)."""
    from tpcg.ops.smallinv import (apply_symmetric_stair_factored,
                                   blockdiag_mv_lane_major,
                                   gj_inverse_lane_major)

    gamma = gamma_ref[:, :]
    lam0 = lam0_ref[:, :]
    tol = tol_ref[0]

    # The explicit-Pinv apply is width-general: 3 pages (cbtd) or 2b+1
    # pages (a materialized banded stair_refined Phi^-1) — same FMA form,
    # D diagonal pages (tpcg/ops/banded.py banded_mv_lane_major; for D=3
    # it computes exactly the sequence bdmv_lane_major does).
    if lean:
        mv = lambda v: _bdmv_from_ref(S_ref, v, n, K)
        diag = lambda: S_ref[1]
        stair = lambda Dinv_t, v: _apply_stair_from_ref(
            S_ref, Dinv_t, v, n, K)
        pinv_mv = lambda v: banded_mv_lane_major(pinv_ref, v, n, K)
    else:
        S = S_ref[:, :, :, :]
        mv = lambda v: bdmv_lane_major(S, v, n=n, K=K)
        diag = lambda: S[1]
        stair = lambda Dinv_t, v: apply_symmetric_stair_factored(
            S, Dinv_t, v, n, K)
        if precond == "explicit":
            Pinv = pinv_ref[...]
            pinv_mv = lambda v: banded_mv_lane_major(Pinv, v, n, K)

    if precond == "identity":
        apply_pinv = lambda v: v  # pinv_ref is None — no operand at all
    elif precond == "explicit":
        apply_pinv = pinv_mv
    elif precond == "block_jacobi":
        Dinv_t = gj_inverse_lane_major(diag(), n, K, unroll=not lean)
        apply_pinv = lambda v: blockdiag_mv_lane_major(Dinv_t, v, n, K)
    elif precond == "symmetric_stair":
        # factored apply: only Dinv lives across the loop; no setup matmuls
        Dinv_t = gj_inverse_lane_major(diag(), n, K, unroll=not lean)
        apply_pinv = lambda v: stair(Dinv_t, v)
    else:
        raise ValueError(f"bad precond {precond!r}")

    if precond_refine and precond != "identity":
        # Neumann refinement: z <- z + Pinv (v - S z) — stronger effective
        # preconditioner, fewer iterations (PCGConfig.precond_refine doc)
        base_pinv = apply_pinv

        def apply_pinv(v):
            z = base_pinv(v)
            for _ in range(precond_refine):
                z = z + base_pinv(v - mv(z))
            return z

    vdot = lambda a, b: jnp.sum(a * b)

    if method == "fixed":
        # Fixed-budget mode: exactly max_iter passes of the classic
        # recurrence with NO per-iteration convergence test and (1, 1)
        # vector scalars — the loop body contains not a single
        # vector->scalar round trip, so the scalar-sync chain that bounds
        # the adaptive kernels (~0.4-0.6 us/iter) disappears entirely.
        # Bounded latency is the real-time MPC contract (budget tuned
        # offline / from the warm-start history); convergence is VERIFIED
        # (eta against tol) once, after the loop.
        vdot11 = lambda a, b: jnp.sum(a * b, keepdims=True).reshape(1, 1)
        r = gamma - mv(lam0)
        rt = apply_pinv(r)
        eta0 = vdot11(r, rt)

        tiny = jnp.asarray(1e-30, gamma.dtype)
        if trace_ref is not None:
            trace_ref[0] = eta0[0, 0]

        def fbody(i, c):
            # the +tiny denominators keep a fully-converged iterate (r ~ 0
            # with no exit test to stop the loop) at alpha ~ 0/tiny = 0
            # instead of 0/0 = NaN; away from convergence they are
            # invisible at f32 scale
            lam, r, p, eta = c
            ups = mv(p)
            alpha = eta / (vdot11(p, ups) + tiny)
            lam = lam + alpha * p
            r = r - alpha * ups
            rt = apply_pinv(r)
            eta_new = vdot11(r, rt)
            if trace_ref is not None:
                trace_ref[i + jnp.int32(1)] = eta_new[0, 0]
            beta = eta_new / (eta + tiny)
            p = rt + beta * p
            return (lam, r, p, eta_new)

        lam, r, p, eta_v = jax.lax.fori_loop(
            0, max_iter, fbody, (lam0, r, rt, eta0))
        eta = eta_v[0, 0]
        lam_ref[:, :] = lam
        iters_ref[out_idx] = jnp.int32(max_iter)
        conv_ref[out_idx] = (jnp.abs(eta) < tol).astype(jnp.int32)
        eta_ref[out_idx] = eta
        return

    if method == "fixed_pipelined":
        # Fixed budget on the ONE-sync-point recurrence: with (1,1) dots
        # there is not a single vector->scalar round trip OR branch in the
        # loop body (the classic-form fixed mode kept the two dependent
        # dot chains and measured slower than adaptive pipelined —
        # docs/ROADMAP.md item 2; this removes the remaining exit-test
        # overhead from the faster recurrence).
        from tpcg.solver.pipelined import fixed_pipelined_body
        vdot11 = lambda a, b: jnp.sum(a * b, keepdims=True).reshape(1, 1)
        trace_store = None
        if trace_ref is not None:
            trace_store = lambda i, e: trace_ref.__setitem__(i, e[0, 0])
        lam, eta_v = fixed_pipelined_body(mv, apply_pinv, vdot11, gamma,
                                          lam0, max_iter,
                                          trace_store=trace_store)
        eta = eta_v[0, 0]
        lam_ref[:, :] = lam
        iters_ref[out_idx] = jnp.int32(max_iter)
        conv_ref[out_idx] = (jnp.abs(eta) < tol).astype(jnp.int32)
        eta_ref[out_idx] = eta
        if trace_ref is not None:
            trace_ref[max_iter] = eta
        return

    if method == "speculative":
        # zero-sync fixed sweep + adaptive pipelined top-up (the fastest
        # ADAPTIVE-contract form on chip when the budget guess is right —
        # tpcg/solver/pipelined.py speculative_pcg_body)
        from tpcg.solver.pipelined import (resolve_spec_budget,
                                           speculative_pcg_body)
        vdot11 = lambda a, b: jnp.sum(a * b, keepdims=True).reshape(1, 1)
        budget = resolve_spec_budget(max_iter, spec_budget)
        if trace_ref is not None:
            raise NotImplementedError(
                "debug_eta is not plumbed through the two-phase "
                "speculative mode; trace the pipelined method instead")
        lam, iters, converged, eta = speculative_pcg_body(
            mv, apply_pinv, vdot11, gamma, lam0, tol, max_iter, budget,
            stop_on_nonfinite)
        lam_ref[:, :] = lam
        iters_ref[out_idx] = iters
        conv_ref[out_idx] = converged.astype(jnp.int32)
        eta_ref[out_idx] = eta[0, 0]
        return

    if method == "pipelined":
        from tpcg.solver.pipelined import pipelined_pcg_body
        # (1,1)-shaped dots: alpha/beta stay vector values, skipping the
        # vector->scalar->vector round trip per sync point (measured ~0.9 us
        # per solve at iiwa14 scale; the classic loop does NOT benefit —
        # measured slightly slower — so it keeps scalar dots)
        vdot11 = lambda a, b: jnp.sum(a * b, keepdims=True).reshape(1, 1)
        trace_store = None
        if trace_ref is not None:
            # debug-only: the (1,1)->SMEM extract per pass reintroduces
            # exactly the scalar round trip the pipelined method avoids
            trace_store = lambda i, e: trace_ref.__setitem__(i, e[0, 0])
        lam, iters, converged, eta = pipelined_pcg_body(
            mv, apply_pinv, vdot11, gamma, lam0, tol, max_iter,
            stop_on_nonfinite, replace_every=replace_every,
            trace_store=trace_store)
        lam_ref[:, :] = lam
        iters_ref[out_idx] = iters
        conv_ref[out_idx] = converged.astype(jnp.int32)
        eta_ref[out_idx] = eta[0, 0]
        if trace_ref is not None:
            _flat_fill_trace(trace_ref, iters, eta[0, 0], max_iter)
        return

    # --- classic method (the reference's exact loop) ---
    # init: r = gamma - S lam0 ; r_tilde = Pinv r ; p = r_tilde ;
    #           eta = r . r_tilde   (pcg.cuh:118-149) ---
    r = gamma - mv(lam0)
    rt = apply_pinv(r)
    p = rt
    eta = vdot(r, rt)
    if trace_ref is not None:
        trace_ref[0] = eta

    def cond(c):
        _lam, _r, _p, eta, iters, converged = c
        go = jnp.logical_and(iters < max_iter, jnp.logical_not(converged))
        if stop_on_nonfinite:
            go = jnp.logical_and(go, jnp.isfinite(eta))
        return go

    def body(c):
        lam, r, p, eta, iters, _ = c
        ups = mv(p)                              # upsilon = S p
        alpha = eta / vdot(p, ups)               # pcg.cuh:163-169
        lam = lam + alpha * p                    # pcg.cuh:172-176
        r = r - alpha * ups
        rt = apply_pinv(r)                       # pcg.cuh:181-184
        eta_new = vdot(r, rt)                    # pcg.cuh:187-193
        if trace_ref is not None:
            trace_ref[iters + jnp.int32(1)] = eta_new
        converged = jnp.abs(eta_new) < tol       # pcg.cuh:195
        beta = eta_new / eta                     # pcg.cuh:199-206 (dead when
        p = rt + beta * p                        #  converged — loop exits)
        return (lam, r, p, eta_new, iters + 1, converged)

    # pre-loop tolerance check: already-converged warm starts report 0
    # iterations instead of NaN-ing through alpha=0/0 (deviation from
    # pcg.cuh:154-169; SURVEY.md §7 quirk policy)
    init = (lam0, r, p, eta, jnp.zeros((), jnp.int32), jnp.abs(eta) < tol)
    lam, r, p, eta, iters, converged = jax.lax.while_loop(cond, body, init)

    lam_ref[:, :] = lam
    iters_ref[out_idx] = iters
    conv_ref[out_idx] = converged.astype(jnp.int32)
    eta_ref[out_idx] = eta
    if trace_ref is not None:
        _flat_fill_trace(trace_ref, iters, eta, max_iter)


def _flat_fill_trace(trace_ref, iters, eta_final, max_iter):
    """Flatten the tail of a debug_eta trace past the exit point — the
    eta_history contract (tpcg/utils/diagnostics.py): the curve stays flat
    after the solver would have exited. Runs ONCE per solve."""
    def fill(i, acc):
        trace_ref[i] = eta_final
        return acc

    jax.lax.fori_loop(iters + jnp.int32(1), jnp.int32(max_iter + 1), fill,
                      jnp.int32(0))


def _scalar_spec():
    return pl.BlockSpec(memory_space=pltpu.SMEM)


def _pcg_kernel_nopinv(tol_ref, S_ref, gamma_ref, lam0_ref, *out_refs, **kw):
    """Signature without the Pinv operand, for the identity / in-kernel-build
    paths: passing S twice as a placeholder DMA'd a second full S into VMEM
    the kernel never read (and the feasibility model had to charge for it)."""
    _pcg_kernel(tol_ref, S_ref, None, gamma_ref, lam0_ref, *out_refs, **kw)


@functools.partial(jax.jit,
                   static_argnames=("max_iter", "precond",
                                    "stop_on_nonfinite", "method",
                                    "lean", "precond_refine", "debug_eta",
                                    "spec_budget", "replace_every",
                                    "interpret"))
def fused_pcg_lane_major(S_lm, Pinv_lm, gamma_lm, lam0_lm, *,
                         exit_tol, max_iter: int, precond: str = None,
                         stop_on_nonfinite: bool = False,
                         method: str = "classic", lean: bool = False,
                         precond_refine: int = 0, debug_eta: bool = False,
                         spec_budget: int = 0, replace_every: int = 16,
                         interpret: bool = False):
    """Run the fused solve on lane-major inputs.

    Args:
      S_lm: ``(3, n, n, K)`` float32.
      Pinv_lm: ``(3, n, n, K)`` or ``None`` for the identity-preconditioner
        fast path (implemented for real here; the reference's ``empty_pinv``
        never was — SURVEY.md §3.1).
      gamma_lm, lam0_lm: ``(n, K)``.
      precond: ``None`` (infer explicit/identity from ``Pinv_lm``) or one of
        ``"block_jacobi"`` / ``"symmetric_stair"`` to build Phi^-1 inside
        the kernel from S (``Pinv_lm`` must be None then).
      debug_eta: also return the per-pass eta trace ``(max_iter + 1,)``
        written FROM THE KERNEL (slot 0 = pre-loop eta, slot k = eta after
        pass k, flat past the exit point — the eta_history contract, but
        recording the production kernel's own arithmetic). Adds one SMEM
        scalar store per pass — a debug mode, not the perf path.
    Returns:
      ``(lam_lm (n, K), iters (), converged (), eta ())``, plus
      ``etas (max_iter + 1,)`` when ``debug_eta``.
    """
    _, n, _, K = S_lm.shape
    dtype = S_lm.dtype
    if precond is None:
        precond = "identity" if Pinv_lm is None else "explicit"
    if precond != "explicit" and Pinv_lm is not None:
        raise ValueError(f"Pinv_lm must be None with precond={precond!r}")

    tol = jnp.asarray([exit_tol], dtype=dtype)

    kw = dict(n=n, K=K, max_iter=max_iter, precond=precond, method=method,
              stop_on_nonfinite=stop_on_nonfinite, lean=lean,
              precond_refine=precond_refine, spec_budget=spec_budget,
              replace_every=replace_every)
    vmem = pl.BlockSpec(memory_space=pltpu.VMEM)
    if precond == "explicit":
        kernel = functools.partial(_pcg_kernel, **kw)
        in_specs = [_scalar_spec(), vmem, vmem, vmem, vmem]
        operands = (tol, S_lm, Pinv_lm, gamma_lm, lam0_lm)
    else:
        kernel = functools.partial(_pcg_kernel_nopinv, **kw)
        in_specs = [_scalar_spec(), vmem, vmem, vmem]
        operands = (tol, S_lm, gamma_lm, lam0_lm)
    out_shape = [
        jax.ShapeDtypeStruct((n, K), dtype),
        jax.ShapeDtypeStruct((1,), jnp.int32),
        jax.ShapeDtypeStruct((1,), jnp.int32),
        jax.ShapeDtypeStruct((1,), dtype),
    ]
    out_specs = [vmem, _scalar_spec(), _scalar_spec(), _scalar_spec()]
    if debug_eta:
        out_shape.append(jax.ShapeDtypeStruct((max_iter + 1,), dtype))
        out_specs.append(_scalar_spec())
    with jax.enable_x64(False):
        out = pl.pallas_call(
            kernel,
            out_shape=tuple(out_shape),
            in_specs=in_specs,
            out_specs=tuple(out_specs),
            interpret=interpret,
        )(*operands)
    lam, iters, conv, eta = out[:4]
    base = (lam, iters[0], conv[0] != 0, eta[0])
    return (*base, out[4]) if debug_eta else base


def _pcg_batched_kernel(tol_ref, S_ref, pinv_ref, gamma_ref, lam0_ref,
                        lam_ref, iters_ref, conv_ref, eta_ref,
                        *, n, K, max_iter, precond,
                        stop_on_nonfinite=False, method="classic",
                        lean=False):
    """Grid-over-batch variant: one grid step = one full solve. Pallas grid
    steps run sequentially on a core, mirroring how independent MPC systems
    would queue on the reference's single GPU — but with S/Pinv block DMA
    double-buffered across steps by the Pallas pipeline.

    Scalar diagnostics are full ``(B,)`` SMEM refs written at
    ``program_id`` (rank-1 SMEM outputs cannot be block-sliced per step)."""
    # operand/output refs arrive batch-squeezed (None in the BlockSpec
    # block shape): a nested ``ref.at[0][d]`` page read would lower to a
    # Mosaic memref slice over the PADDED sublane dim and fail alignment
    b = pl.program_id(0)
    _pcg_kernel(tol_ref,
                S_ref, pinv_ref, gamma_ref, lam0_ref,
                lam_ref, iters_ref, conv_ref, eta_ref,
                n=n, K=K, max_iter=max_iter, precond=precond,
                stop_on_nonfinite=stop_on_nonfinite, method=method,
                out_idx=b, lean=lean)


def _pcg_batched_kernel_nopinv(tol_ref, S_ref, gamma_ref, lam0_ref,
                               lam_ref, iters_ref, conv_ref, eta_ref,
                               *, n, K, max_iter, precond,
                               stop_on_nonfinite=False, method="classic",
                               lean=False):
    b = pl.program_id(0)
    _pcg_kernel(tol_ref,
                S_ref, None, gamma_ref, lam0_ref,
                lam_ref, iters_ref, conv_ref, eta_ref,
                n=n, K=K, max_iter=max_iter, precond=precond,
                stop_on_nonfinite=stop_on_nonfinite, method=method,
                out_idx=b, lean=lean)


@functools.partial(jax.jit,
                   static_argnames=("max_iter", "precond",
                                    "stop_on_nonfinite", "method",
                                    "lean", "interpret"))
def fused_pcg_lane_major_batched(S_lm, Pinv_lm, gamma_lm, lam0_lm, *,
                                 exit_tol, max_iter: int,
                                 precond: str = None,
                                 stop_on_nonfinite: bool = False,
                                 method: str = "classic",
                                 lean: bool = False,
                                 interpret: bool = False):
    """Batched fused solve: leading batch axis B on all operands.

    ``S_lm (B, 3, n, n, K)``, vectors ``(B, n, K)``. Returns per-system
    ``(lam (B, n, K), iters (B,), converged (B,), eta (B,))``.
    """
    B, _, n, _, K = S_lm.shape
    dtype = S_lm.dtype
    if precond is None:
        precond = "identity" if Pinv_lm is None else "explicit"
    if precond != "explicit" and Pinv_lm is not None:
        raise ValueError(f"Pinv_lm must be None with precond={precond!r}")

    tol = jnp.asarray([exit_tol], dtype=dtype)
    kw = dict(n=n, K=K, max_iter=max_iter, precond=precond,
              stop_on_nonfinite=stop_on_nonfinite, method=method, lean=lean)

    def block(shape):
        # None squeezes the batch dim: the kernel body sees the same ref
        # ranks as the single-system kernel (required for the lean page
        # reads — see _pcg_batched_kernel)
        return pl.BlockSpec((None, *shape), lambda b: (b, *([0] * len(shape))),
                            memory_space=pltpu.VMEM)

    smem_out = pl.BlockSpec(memory_space=pltpu.SMEM)  # full (B,), one slot/step
    if precond == "explicit":
        kernel = functools.partial(_pcg_batched_kernel, **kw)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                    block((3, n, n, K)),
                    block((Pinv_lm.shape[-4], n, n, K)),
                    block((n, K)), block((n, K))]
        operands = (tol, S_lm, Pinv_lm, gamma_lm, lam0_lm)
    else:
        kernel = functools.partial(_pcg_batched_kernel_nopinv, **kw)
        in_specs = [pl.BlockSpec(memory_space=pltpu.SMEM),
                    block((3, n, n, K)), block((n, K)), block((n, K))]
        operands = (tol, S_lm, gamma_lm, lam0_lm)
    with jax.enable_x64(False):
        lam, iters, conv, eta = pl.pallas_call(
            kernel,
            grid=(B,),
            out_shape=(
                jax.ShapeDtypeStruct((B, n, K), dtype),
                jax.ShapeDtypeStruct((B,), jnp.int32),
                jax.ShapeDtypeStruct((B,), jnp.int32),
                jax.ShapeDtypeStruct((B,), dtype),
            ),
            in_specs=in_specs,
            out_specs=(block((n, K)), smem_out, smem_out, smem_out),
            interpret=interpret,
        )(*operands)
    return lam, iters, conv != 0, eta
