"""Lane-packed multi-system fused PCG: P independent systems solved JOINTLY
in one kernel instance, concatenated along the 128-wide lane axis.

Why this exists (the TPU-shaped answer to batching, which the reference
cannot do at all — one launch per system, SURVEY.md §2 "parallelism"):

* The grid-batched kernel (tpcg/ops/fused_pcg.py) runs one system per grid
  step, so every system pays the full per-iteration latency (~0.4 us:
  scalar sync chains + loop overhead dominate at trajopt sizes, where an
  (n, K) page is only 1-4 vregs of vector work).
* Packing P systems side by side on lanes makes every VPU op process P
  systems at once: per-iteration overhead is paid ONCE per pack. At K < 128
  it also fills lanes a single system would waste (K=32 leaves 75% of every
  vreg idle — the "small-K cliff").

Layout: operands are lane-concatenated lane-major pages — S ``(3, n, n,
P*K)``, vectors ``(n, P*K)`` — i.e. P single-system lane-major layouts
abutted on the minor axis. Halo shifts become period-K masked rolls (the
segment boundary plays the role the chain boundary plays in
tpcg/ops/bdmv.py). Per-system dot products are segmented all-reduces: a
log-shift ladder of masked in-segment rolls (``_seg_allreduce``) leaves
every lane holding its own segment's sum, so alpha/beta/eta stay
lane-replicated vector values and no scalar extraction happens inside the
loop. (Round 1 used a ``(PK, PK)`` one-hot matmul for this; its
quadratically-growing segment matrix — 1 MiB of VMEM at PK=512 — was what
capped the pack width at 512 lanes. The ladder is O(PK log K) VPU work
with no VMEM footprint, lifting the cap to the operand-VMEM limit.)

Per-system semantics match independent solves (pcg.cuh:154-212 exit/count
rules): converged systems are frozen with jnp.where masks (NOT 0/1
multiplies — a system converged at entry has alpha = 0/0 = NaN), the pack
iterates until all systems converge or ``max_iter``, and per-system
``iters``/``converged``/``eta`` come back.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpcg.types import PCGResult


def _seg_shift_down(x, n, PK, K):
    """y[:, l] = x[:, l-1] within each K-lane segment, 0 at segment starts."""
    if K == 1:
        return jnp.zeros_like(x)
    shifted = jnp.roll(x, 1, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, PK), 1)
    # typed int32 scalars: Python-int %/== operands trace as i64 under
    # jax_enable_x64, which sends Mosaic's lowering into infinite recursion
    K32 = jnp.int32(K)
    return jnp.where(lane % K32 == jnp.int32(0), jnp.zeros_like(shifted),
                     shifted)


def _seg_shift_up(x, n, PK, K):
    """y[:, l] = x[:, l+1] within each K-lane segment, 0 at segment ends."""
    if K == 1:
        return jnp.zeros_like(x)
    shifted = jnp.roll(x, -1, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, PK), 1)
    K32 = jnp.int32(K)
    return jnp.where(lane % K32 == K32 - jnp.int32(1),
                     jnp.zeros_like(shifted), shifted)


def _seg_shift(x, n, PK, K, s: int):
    """Distance-``s`` in-segment shift: ``y[:, l] = x[:, l + s]`` when both
    lanes lie in the same K-lane segment, 0 otherwise — the banded
    generalization of ``_seg_shift_down``/``_seg_shift_up`` (matching
    tpcg/ops/banded.py ``_lane_shift`` with period-K boundaries)."""
    if s == 0:
        return x
    if abs(s) >= K:
        return jnp.zeros_like(x)
    shifted = jnp.roll(x, -s, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, (n, PK), 1)
    lmod = lane % jnp.int32(K)
    if s > 0:
        keep = lmod < jnp.int32(K - s)
    else:
        keep = lmod >= jnp.int32(-s)
    return jnp.where(keep, shifted, jnp.zeros_like(shifted))


def _bdmv_packed(S, x, n, PK, K):
    """Lane-major bdmv with period-K halo boundaries (tpcg/ops/bdmv.py
    bdmv_lane_major, segment-masked). ``S`` may be a loaded value or a VMEM
    ref — the lean variant passes the ref so only one (n, n, PK) diagonal
    page is live at a time (tpcg/ops/fused_pcg.py ``_bdmv_from_ref``)."""
    xs = (_seg_shift_down(x, n, PK, K), x, _seg_shift_up(x, n, PK, K))
    acc = jnp.zeros((n, PK), x.dtype)
    for d in range(3):
        acc = acc + jnp.sum(S[d] * xs[d][:, None, :], axis=0)
    return acc


def _banded_mv_packed(P_lm, x, n, PK, K):
    """Width-D banded SpMV with period-K boundaries — the packed analog of
    tpcg/ops/banded.py ``banded_mv_lane_major`` for banded explicit
    preconditioners (stair_refined) in the lane-packed kernel."""
    D = P_lm.shape[0]
    b = (D - 1) // 2
    acc = jnp.zeros((n, PK), x.dtype)
    for d in range(D):
        xs = _seg_shift(x, n, PK, K, d - b)
        acc = acc + jnp.sum(P_lm[d] * xs[:, None, :], axis=0)
    return acc


def _apply_stair_packed(S, Dinv_t, v, n, PK, K):
    """Factored symmetric-stair apply with period-K boundaries
    (tpcg/ops/smallinv.py apply_symmetric_stair_factored)."""
    from tpcg.ops.smallinv import blockdiag_mv_lane_major

    w = blockdiag_mv_lane_major(Dinv_t, v, n, PK)
    w_dn = _seg_shift_down(w, n, PK, K)
    w_up = _seg_shift_up(w, n, PK, K)
    t = v - (jnp.sum(S[0] * w_dn[:, None, :], axis=0) +
             jnp.sum(S[2] * w_up[:, None, :], axis=0))
    return blockdiag_mv_lane_major(Dinv_t, t, n, PK)


def _seg_allreduce(t, PK, K):
    """Per-segment lane sum of ``t (rows, PK)``, replicated to every lane of
    its K-lane segment, via a log-shift ladder of masked in-segment rolls.

    ``lad`` after j doublings holds cyclic-in-segment window sums of width
    2^j; the binary digits of K are combined with rolled ladder pieces so
    every lane ends up covering exactly its K segment lanes (works for any
    K, not just powers of two). Replaces the round-1 ``(PK, PK)`` one-hot
    matmul whose segment matrix capped the pack width (module docstring)."""
    if K == 1:
        return t
    rows = t.shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, PK), 1)
    lmod = lane % jnp.int32(K)  # typed int32: Python-int % traces i64 on x64

    def seg_roll(x, s):
        # y[l] = x[l+s cyclic within its K-lane segment], 0 < s < K
        a = jnp.roll(x, -s, axis=1)       # x[l+s] globally
        b = jnp.roll(x, K - s, axis=1)    # x[l+s-K] globally
        return jnp.where(lmod < jnp.int32(K - s), a, b)

    acc = None
    shift = 0
    lad = t
    w = 1
    while w <= K:
        if K & w:
            piece = lad if shift == 0 else seg_roll(lad, shift)
            acc = piece if acc is None else acc + piece
            shift += w
        if 2 * w <= K:
            lad = lad + seg_roll(lad, w)
        w *= 2
    return acc


def _pcg_packed_kernel(tol_ref, S_ref, pinv_ref, gamma_ref, lam0_ref,
                       lam_ref, iters_ref, conv_ref, eta_ref,
                       *, n, PK, K, P, max_iter, precond,
                       method="classic", lean=False,
                       stop_on_nonfinite=False):
    from tpcg.ops.smallinv import (blockdiag_mv_lane_major,
                                   gj_inverse_lane_major)

    # lean: keep S (and Pinv) as VMEM refs so only one (n, n, PK) diagonal
    # page is ever live on the kernel stack (the fused kernel's lean
    # variant, tpcg/ops/fused_pcg.py) — ~1.4x S less scoped VMEM, which
    # buys one more pack-width doubling at iiwa14 scale
    S = S_ref if lean else S_ref[...]
    gamma = gamma_ref[...]
    lam0 = lam0_ref[...]
    tol = tol_ref[0]

    mv = lambda v: _bdmv_packed(S, v, n, PK, K)
    if precond == "identity":
        apply_pinv = lambda v: v
    elif precond == "explicit":
        Pinv = pinv_ref if lean else pinv_ref[...]
        if pinv_ref.shape[0] == 3:
            apply_pinv = lambda v: _bdmv_packed(Pinv, v, n, PK, K)
        else:  # banded (stair_refined) pages
            apply_pinv = lambda v: _banded_mv_packed(Pinv, v, n, PK, K)
    elif precond == "block_jacobi":
        Dinv_t = gj_inverse_lane_major(S[1], n, PK, unroll=not lean)
        apply_pinv = lambda v: blockdiag_mv_lane_major(Dinv_t, v, n, PK)
    elif precond == "symmetric_stair":
        Dinv_t = gj_inverse_lane_major(S[1], n, PK, unroll=not lean)
        apply_pinv = lambda v: _apply_stair_packed(S, Dinv_t, v, n, PK, K)
    else:
        raise ValueError(f"bad precond {precond!r}")

    def vdot_seg(a, b):
        # (1, PK): lane l holds the dot of the system owning lane l, via the
        # log-shift segmented all-reduce (exact f32 pairwise adds on VPU)
        t = jnp.sum(a * b, axis=0, keepdims=True)
        return _seg_allreduce(t, PK, K)

    if method not in ("classic", "pipelined", "fixed", "fixed_pipelined"):
        raise ValueError(f"bad method {method!r}")

    if method == "fixed_pipelined":
        # the shared zero-sync body is already parameterized over vdot, so
        # the lane-replicated segmented dot drops straight in — per-system
        # (1, PK) "scalars", no tests, no freeze masks
        from tpcg.solver.pipelined import fixed_pipelined_body
        lam, eta_v = fixed_pipelined_body(mv, apply_pinv, vdot_seg, gamma,
                                          lam0, max_iter)
        iters_v = jnp.full((1, PK), max_iter, jnp.int32)
        conv_v = (jnp.abs(eta_v) < tol).astype(jnp.int32)
    elif method == "fixed":
        lam, iters_v, conv_v, eta_v = _packed_fixed_loop(
            mv, apply_pinv, vdot_seg, gamma, lam0, tol, max_iter, PK)
    elif method == "pipelined":
        lam, iters_v, conv_v, eta_v = _packed_pipelined_loop(
            mv, apply_pinv, vdot_seg, gamma, lam0, tol, max_iter, PK,
            stop_on_nonfinite=stop_on_nonfinite)
    else:
        lam, iters_v, conv_v, eta_v = _packed_classic_loop(
            mv, apply_pinv, vdot_seg, gamma, lam0, tol, max_iter, PK,
            stop_on_nonfinite=stop_on_nonfinite)

    lam_ref[...] = lam
    # typed int32 index arithmetic (Python-int operands promote the result
    # to i64 under jax_enable_x64, which Mosaic cannot return)
    base = pl.program_id(0) * jnp.int32(P)
    for p in range(P):  # SMEM stores are scalar-at-a-time; once per solve
        idx = base + jnp.int32(p)
        iters_ref[idx] = iters_v[0, p * K]
        conv_ref[idx] = conv_v[0, p * K]
        eta_ref[idx] = eta_v[0, p * K]


def _packed_classic_loop(mv, apply_pinv, vdot_seg, gamma, lam0, tol,
                         max_iter, PK, stop_on_nonfinite=False):
    """The reference's exact loop (pcg.cuh:154-208) with lane-replicated
    per-system scalars and masked freeze.

    ``stop_on_nonfinite``: a system whose eta goes nonfinite is FROZEN
    (stops iterating, keeps its last iterate, reports converged=False) —
    the per-system analog of the single-system kernel's loop-predicate
    guard (tpcg/ops/fused_pcg.py cond), so one diverging system cannot
    burn the whole pack's iteration budget. ``done32`` (stop mask) is
    tracked separately from ``conv32`` (converged output)."""
    r = gamma - mv(lam0)
    rt = apply_pinv(r)
    p = rt
    eta = vdot_seg(r, rt)                       # (1, PK)

    def cond(c):
        # min-reduce, NOT jnp.sum: integer sums promote to i64 under
        # jax_enable_x64 regardless of the dtype= argument
        return jnp.logical_and(c[-1] < max_iter,
                               jnp.min(c[-2]) < jnp.int32(1))

    def body(c):
        lam, r, p, eta, iters, conv32, done32, step = c
        active = done32 == jnp.int32(0)         # (1, PK) bool
        ups = mv(p)
        alpha = eta / vdot_seg(p, ups)
        lam = jnp.where(active, lam + alpha * p, lam)
        r = jnp.where(active, r - alpha * ups, r)
        rt = apply_pinv(r)
        eta_new = jnp.where(active, vdot_seg(r, rt), eta)
        conv_new = jnp.logical_and(active, jnp.abs(eta_new) < tol)
        beta = eta_new / eta
        p = jnp.where(active, rt + beta * p, p)
        iters = iters + active.astype(jnp.int32)
        conv32 = jnp.maximum(conv32, conv_new.astype(jnp.int32))
        done32 = jnp.maximum(done32, conv32)
        if stop_on_nonfinite:
            bad = jnp.logical_and(active,
                                  jnp.logical_not(jnp.isfinite(eta_new)))
            done32 = jnp.maximum(done32, bad.astype(jnp.int32))
        return (lam, r, p, eta_new, iters, conv32, done32, step + 1)

    conv0 = (jnp.abs(eta) < tol).astype(jnp.int32)
    done0 = conv0
    if stop_on_nonfinite:
        done0 = jnp.maximum(
            done0, jnp.logical_not(jnp.isfinite(eta)).astype(jnp.int32))
    init = (lam0, r, p, eta, jnp.zeros((1, PK), jnp.int32), conv0, done0,
            jnp.zeros((), jnp.int32))
    lam, r, p, eta, iters, conv32, _, _ = jax.lax.while_loop(
        cond, body, init)
    return lam, iters, conv32, eta


def _packed_fixed_loop(mv, apply_pinv, vdot_seg, gamma, lam0, tol,
                       max_iter, PK):
    """Fixed-budget mode, lane-packed: exactly ``max_iter`` passes of the
    classic recurrence with NO per-pass tests or freeze masks at all (the
    single-system kernel's method="fixed", tpcg/ops/fused_pcg.py:147-186,
    with lane-replicated per-system scalars). The +tiny denominators keep
    fully-converged systems (and the plan_pack dummy pads: zero rhs, zero
    residual) at alpha = 0/tiny = 0 instead of 0/0 = NaN. Convergence is
    VERIFIED per system (|eta| < tol) once, after the loop — the bounded-
    latency real-time contract, per-system."""
    tiny = jnp.asarray(1e-30, gamma.dtype)
    r = gamma - mv(lam0)
    rt = apply_pinv(r)
    eta0 = vdot_seg(r, rt)

    def fbody(_, c):
        lam, r, p, eta = c
        ups = mv(p)
        alpha = eta / (vdot_seg(p, ups) + tiny)
        lam = lam + alpha * p
        r = r - alpha * ups
        rt = apply_pinv(r)
        eta_new = vdot_seg(r, rt)
        beta = eta_new / (eta + tiny)
        p = rt + beta * p
        return (lam, r, p, eta_new)

    lam, r, p, eta = jax.lax.fori_loop(
        0, max_iter, fbody, (lam0, r, rt, eta0))
    iters = jnp.full((1, PK), max_iter, jnp.int32)
    conv = (jnp.abs(eta) < tol).astype(jnp.int32)
    return lam, iters, conv, eta


def _packed_pipelined_loop(mv, apply_pinv, vdot_seg, gamma, lam0, tol,
                           max_iter, PK, replace_every: int = 16,
                           stop_on_nonfinite=False):
    """Ghysels-Vanroose recurrences with lane-replicated per-system scalars
    (tpcg/solver/pipelined.py semantics, incl. the eta-guarded residual
    replacement). ``stop_on_nonfinite`` freezes per-system on nonfinite
    eta, like :func:`_packed_classic_loop`."""
    r = gamma - mv(lam0)
    u = apply_pinv(r)
    w = mv(u)
    zeros = jnp.zeros_like(r)
    eta0 = vdot_seg(r, u)

    def cond(c):
        return jnp.logical_and(c[-1] < max_iter,
                               jnp.min(c[-2]) < jnp.int32(1))

    def body(c):
        (x, r, u, w, z, q, s, p, eta_prev, alpha_prev, iters, conv32,
         done32, step) = c
        active = done32 == jnp.int32(0)
        eta = jnp.where(active, vdot_seg(r, u), eta_prev)
        delta = vdot_seg(w, u)
        m = apply_pinv(w)
        nn = mv(m)
        first = step == 0
        beta = jnp.where(first, jnp.zeros_like(eta), eta / eta_prev)
        alpha = jnp.where(first, eta / delta,
                          eta / (delta - beta * eta / alpha_prev))
        z = jnp.where(active, nn + beta * z, z)
        q = jnp.where(active, m + beta * q, q)
        s = jnp.where(active, w + beta * s, s)
        p = jnp.where(active, u + beta * p, p)
        x = jnp.where(active, x + alpha * p, x)
        r = jnp.where(active, r - alpha * s, r)
        u = jnp.where(active, u - alpha * q, u)
        w = jnp.where(active, w - alpha * z, w)
        if replace_every:
            # eta guard as in tpcg/solver/pipelined.py (replacements near
            # convergence inject fp32 noise-floor error) — but PER SYSTEM:
            # an all-systems guard silently DISABLED replacement for the
            # whole pack once any one system converged (its eta drops
            # under the guard forever), observed as packed-pipelined
            # stagnation at 1e-6 on warm-started NMPC fleets whose jnp
            # twin (per-solve cadence) converged fine
            need = jnp.logical_and(active,
                                   jnp.abs(eta) > 1000.0 * tol)  # (1, PK)

            def replace(args):
                x, p, r0, u0, w0, s0, q0, z0 = args
                r_n = gamma - mv(x)
                u_n = apply_pinv(r_n)
                w_n = mv(u_n)
                s_n = mv(p)
                q_n = apply_pinv(s_n)
                z_n = mv(q_n)
                blend = lambda new, old: jnp.where(need, new, old)
                return (x, p, blend(r_n, r0), blend(u_n, u0),
                        blend(w_n, w0), blend(s_n, s0), blend(q_n, q0),
                        blend(z_n, z0))

            re32 = jnp.int32(replace_every)  # i64-safe under x64
            do_replace = jnp.logical_and(
                step % re32 == re32 - jnp.int32(1), step > jnp.int32(0))
            # run the (whole-pack) replacement pass iff any system needs it
            any_need = jnp.max(need.astype(jnp.int32)) == jnp.int32(1)
            do_replace = jnp.logical_and(do_replace, any_need)
            x, p, r, u, w, s, q, z = jax.lax.cond(
                do_replace, replace, lambda args: args,
                (x, p, r, u, w, s, q, z))
        conv_new = jnp.logical_and(active, jnp.abs(eta) < tol)
        conv32 = jnp.maximum(conv32, conv_new.astype(jnp.int32))
        done32 = jnp.maximum(done32, conv32)
        if stop_on_nonfinite:
            bad = jnp.logical_and(active,
                                  jnp.logical_not(jnp.isfinite(eta)))
            done32 = jnp.maximum(done32, bad.astype(jnp.int32))
        alpha_prev = jnp.where(active, alpha, alpha_prev)
        iters = iters + active.astype(jnp.int32)
        return (x, r, u, w, z, q, s, p, eta, alpha_prev, iters, conv32,
                done32, step + 1)

    conv0 = (jnp.abs(eta0) < tol).astype(jnp.int32)
    done0 = conv0
    if stop_on_nonfinite:
        done0 = jnp.maximum(
            done0, jnp.logical_not(jnp.isfinite(eta0)).astype(jnp.int32))
    init = (lam0, r, u, w, zeros, zeros, zeros, zeros, eta0,
            jnp.ones_like(eta0), jnp.zeros((1, PK), jnp.int32), conv0,
            done0, jnp.zeros((), jnp.int32))
    out = jax.lax.while_loop(cond, body, init)
    x, eta, iters, conv32 = out[0], out[8], out[10], out[11]
    return x, iters, conv32, eta


def _fits_vmem(state_size, pk, dtype, identity_pinv, precond, method,
               lean=False, pinv_pages=3):
    from tpcg.utils.feasibility import _budget, packed_vmem_bytes

    need = packed_vmem_bytes(state_size, pk, dtype, identity_pinv,
                             precond, method, lean, pinv_pages)
    return need <= _budget()


def _fits_any(state_size, pk, dtype, identity_pinv, precond, method):
    """Fits in the fast variant, or failing that the lean one."""
    return (_fits_vmem(state_size, pk, dtype, identity_pinv, precond,
                       method, lean=False) or
            _fits_vmem(state_size, pk, dtype, identity_pinv, precond,
                       method, lean=True))


def _fits_vmem_stream(state_size, pk, dtype, identity_pinv, precond,
                      method, pinv_pages=3):
    """Stream variant VMEM: the fused (gridless) model — the manual DMA
    scratches ARE the operand buffers, no pipeline double-buffering — plus
    the small double-buffered vector windows."""
    from tpcg.utils.feasibility import _budget, fused_vmem_bytes

    itemsize = jnp.dtype(dtype).itemsize
    n_pad = -(-state_size // 8) * 8
    vec_windows = 3 * n_pad * pk * itemsize
    need = fused_vmem_bytes(state_size, pk, dtype, identity_pinv, precond,
                            1, method, lean=False,
                            pinv_pages=pinv_pages) + vec_windows
    return need <= _budget()


def pack_width(B: int, K: int, state_size: int, dtype=jnp.float32,
               precond: str = None, identity_pinv: bool = False,
               method: str = "classic", max_lanes: int = 2048,
               pinv_pages: int = 3) -> int:
    """Largest power-of-2 P dividing B with P*K <= max_lanes, P*K lane-tile
    aligned, and the packed working set within VMEM (with K -> P*K). The
    cap is the VMEM model, not ``max_lanes``: since the (PK, PK) segment
    matrix was replaced by the log-shift all-reduce, pack width is
    operand-limited only (``max_lanes`` remains as an escape hatch).

    Fast-fitting packs are preferred over wider lean-fitting ones — measured
    on chip (B=256, n=14, in-kernel symmetric_stair): K=128 pipelined P=4
    fast 15.6 µs/sys vs P=8 lean 16.4; K=32 P=16 fast 3.3 vs P=32 lean 4.4.
    The lean variant's re-sliced page reads cost more than the extra
    amortization saves, so lean is a fallback for when NO fast pack fits."""
    best_fast = best_lean = 0
    p = 1
    while p <= B and p * K <= max_lanes:
        if B % p == 0 and (p * K) % 128 == 0:
            if _fits_vmem(state_size, p * K, dtype, identity_pinv, precond,
                          method, lean=False, pinv_pages=pinv_pages):
                best_fast = p
            elif _fits_vmem(state_size, p * K, dtype, identity_pinv,
                            precond, method, lean=True,
                            pinv_pages=pinv_pages):
                best_lean = p
        p *= 2
    return best_fast or best_lean or 1


def plan_pack(B: int, K: int, state_size: int, dtype=jnp.float32,
              precond: str = None, identity_pinv: bool = False,
              method: str = "classic", max_lanes: int = 2048,
              pinv_pages: int = 3):
    """Choose ``(P, K_pad, B_pad)`` for an arbitrary batch.

    ``K_pad >= K``: each system's chain is extended with decoupled identity
    blocks (zero off-diagonals at the seam — the cbtd padding contract
    already guarantees the original last block's right slot is zero), zero
    rhs and zero warm start. The padded rows carry exactly zero residual
    forever, contribute zero to every dot, and therefore leave the Krylov
    iterates of the real system mathematically unchanged (fp32 drift is
    reduction-order ulps only) — pure direct-sum padding.
    ``B_pad >= B``: whole dummy identity systems with zero rhs (converged at
    entry, 0 iterations).

    The grid-blocked Pallas kernel requires lane-aligned block slices
    (P*K_pad % 128 == 0; the grid-batched kernel in tpcg/ops/fused_pcg.py
    simply cannot run at K < 128 for this reason), so candidates are scored
    by lane utilization K/K_pad first, then fast-variant fit (see
    :func:`pack_width` — a fast narrow pack measured faster than a lean
    wide one), then pack width P.

    Returns ``(P, K_pad, B_pad, stream)``. ``stream=True`` upgrades to the
    manual-DMA stream variant at DOUBLE the buffered-fast width when it
    fits and ``K_pad >= 128`` — the measured-win regime (K=128, B=256,
    in-kernel sym_stair: pipelined 14.5 vs 15.9 us/sys, classic 15.7 vs
    20.2; at K=32 stream measured a wash-to-loss, so short chains stay on
    the buffered pipeline). ``stream`` cannot serve explicit-Pinv packs
    (two matrix operands)."""
    def pow2_at_least(x):
        p = 1
        while p < x:
            p *= 2
        return p

    cands = []
    for K_pad in sorted({K, pow2_at_least(K), -(-K // 128) * 128}):
        if K_pad < K:
            continue
        p = 1
        while p * K_pad <= max_lanes:
            pk = p * K_pad
            if pk % 128 == 0:
                if _fits_vmem(state_size, pk, dtype, identity_pinv,
                              precond, method, lean=False,
                              pinv_pages=pinv_pages):
                    cands.append((K / K_pad, 1, p, K_pad))
                elif _fits_vmem(state_size, pk, dtype, identity_pinv,
                                precond, method, lean=True,
                                pinv_pages=pinv_pages):
                    cands.append((K / K_pad, 0, p, K_pad))
            p *= 2
    if not cands:
        return None  # nothing lane-aligned fits — caller falls back
    cands.sort()
    _, _, P, K_pad = cands[-1]
    stream = False
    if K_pad >= 128:
        P2 = P * 2  # B_pad below absorbs non-dividing batches
        if P2 * K_pad <= max_lanes and \
                _fits_vmem_stream(state_size, P2 * K_pad, dtype,
                                  identity_pinv, precond, method,
                                  pinv_pages=pinv_pages):
            P, stream = P2, True
    B_pad = -(-B // P) * P
    return P, K_pad, B_pad, stream


def pad_systems(S_blocks, Pinv_blocks, gamma, lam0, K_pad: int, B_pad: int):
    """Apply the plan_pack padding: identity tail blocks along K, dummy
    identity systems along B, zeros in gamma/lam0."""
    B, K, _, n, _ = S_blocks.shape
    # identity via int32 iota, not jnp.eye: eye lowers through an i64 iota
    # under jax_enable_x64, which the TPU AOT compiler rejects
    ri = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    eye = (ri == ci).astype(S_blocks.dtype)[None, None, :, :]

    def pad_blocks(blocks):
        # width-general (D = 3 cbtd or 2b+1 banded stair_refined pages):
        # identity pad rows put eye on the CENTER page, zeros elsewhere
        D = blocks.shape[-3]
        c = D // 2

        def id_rows(nb, nk):
            pages = [jnp.broadcast_to(eye, (nb, nk, 1, n, n)) if d == c
                     else jnp.zeros((nb, nk, 1, n, n), blocks.dtype)
                     for d in range(D)]
            return jnp.concatenate(pages, axis=2)

        if K_pad > K:
            blocks = jnp.concatenate([blocks, id_rows(B, K_pad - K)],
                                     axis=1)
        if B_pad > B:
            blocks = jnp.concatenate([blocks, id_rows(B_pad - B, K_pad)],
                                     axis=0)
        return blocks

    def pad_vec(v):
        if K_pad > K:
            v = jnp.concatenate(
                [v, jnp.zeros((B, K_pad - K, n), v.dtype)], axis=1)
        if B_pad > B:
            v = jnp.concatenate(
                [v, jnp.zeros((B_pad - B, K_pad, n), v.dtype)], axis=0)
        return v

    S_p = pad_blocks(S_blocks)
    P_p = None if Pinv_blocks is None else pad_blocks(Pinv_blocks)
    return S_p, P_p, pad_vec(gamma), pad_vec(lam0)


@functools.partial(jax.jit,
                   static_argnames=("max_iter", "precond", "method", "P",
                                    "lean", "stream", "stop_on_nonfinite",
                                    "interpret"))
def pcg_pallas_packed(S_blocks, Pinv_blocks, gamma, lam0, *, exit_tol,
                      max_iter: int, precond: str = None,
                      method: str = "classic", P: int = None,
                      lean: bool = None, stream: bool = False,
                      stop_on_nonfinite: bool = False,
                      interpret: bool = False) -> PCGResult:
    """Batched fused solve, P systems lane-packed per grid step.

    ``S_blocks (B, K, 3, n, n)``, vectors ``(B, K, n)``; ``B % P == 0``.
    ``P=None`` picks the widest feasible pack; ``lean=None`` picks the fast
    kernel variant when its working set fits VMEM and the slice-at-use lean
    one otherwise (mirroring tpcg/utils/feasibility.pick_fused_variant, but
    with the packed VMEM model). Returns per-system ``PCGResult`` with a
    leading B axis, iteration semantics identical to independent solves
    (frozen after convergence)."""
    from tpcg.ops.bdmv import to_lane_major

    B, K = gamma.shape[0], gamma.shape[1]
    n = gamma.shape[2]
    dtype = S_blocks.dtype
    if precond is None:
        precond = "identity" if Pinv_blocks is None else "explicit"
    if precond != "explicit" and Pinv_blocks is not None:
        raise ValueError(f"Pinv_blocks must be None with precond={precond!r}")
    identity_pinv = precond == "identity"
    if P is None:
        P = pack_width(B, K, n, dtype, precond=precond,
                       identity_pinv=identity_pinv, method=method)
    if B % P != 0:
        raise ValueError(f"batch {B} not divisible by pack width {P}")
    if lean is None:
        # stream has no pipeline buffers — judge by its own accounting
        lean = (False if stream else
                not _fits_vmem(n, P * K, dtype, identity_pinv, precond,
                               method, lean=False))
    G = B // P
    PK = P * K

    def pack_mats(blocks):  # (B, K, D, n, n) -> (G, D, n, n, P*K)
        D = blocks.shape[-3]
        lm = jax.vmap(to_lane_major)(blocks)          # (B, D, n, n, K)
        lm = lm.reshape(G, P, D, n, n, K)
        return jnp.moveaxis(lm, 1, -2).reshape(G, D, n, n, PK)

    def pack_vecs(v):                                  # (B, K, n) -> (G, n, P*K)
        v = jnp.swapaxes(v, -1, -2).reshape(G, P, n, K)
        return jnp.moveaxis(v, 1, -2).reshape(G, n, PK)

    S_p = pack_mats(S_blocks)
    gamma_p = pack_vecs(gamma)
    lam0_p = pack_vecs(lam0)
    tol = jnp.asarray([exit_tol], dtype)

    kw = dict(n=n, PK=PK, K=K, P=P, max_iter=max_iter, precond=precond,
              method=method, lean=lean,
              stop_on_nonfinite=stop_on_nonfinite)

    def block(shape):
        # None squeezes the batch dim away so the kernel sees a plain
        # (3, n, n, PK)/(n, PK) ref: lean's page reads (``S_ref[d]``) then
        # slice only the leading untiled dim, which Mosaic supports — a
        # nested ``S_ref.at[0][d]`` lowers to a memref slice over the
        # PADDED sublane dim (n=14 inside a 16-padded tile) and fails
        # "slice shape must be aligned to tiling"
        return pl.BlockSpec((None, *shape), lambda b: (b, *([0] * len(shape))),
                            memory_space=pltpu.VMEM)

    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    out_shape = (
        jax.ShapeDtypeStruct((G, n, PK), dtype),
        jax.ShapeDtypeStruct((B,), jnp.int32),
        jax.ShapeDtypeStruct((B,), jnp.int32),
        jax.ShapeDtypeStruct((B,), dtype),
    )
    if stream:
        if interpret:
            raise ValueError("stream=True needs the Mosaic backend "
                             "(manual HBM->VMEM DMA has no interpret "
                             "support); use stream=False off-chip")
        if lean:
            raise ValueError("stream=True implies the fast (value-loading) "
                             "kernel; lean ref-slicing cannot read a "
                             "value operand")
        n_pad8 = -(-n // 8) * 8
        S_ps = jnp.pad(S_p, ((0, 0), (0, 0), (0, 0), (0, n_pad8 - n),
                             (0, 0)))
        if precond == "explicit":
            # both matrix operands streamed: S and the (possibly banded
            # stair_refined) Pinv each get one VMEM scratch + manual DMA
            Dp = Pinv_blocks.shape[-3]
            P_ps = jnp.pad(pack_mats(Pinv_blocks),
                           ((0, 0), (0, 0), (0, 0), (0, n_pad8 - n),
                            (0, 0)))
            kernel = functools.partial(_pcg_packed_kernel_stream2, **kw)
            in_specs = [smem, pl.BlockSpec(memory_space=pltpu.ANY),
                        pl.BlockSpec(memory_space=pltpu.ANY),
                        block((n, PK)), block((n, PK))]
            operands = (tol, S_ps, P_ps, gamma_p, lam0_p)
            scratch = (pltpu.VMEM((3, n, n_pad8, PK), dtype),
                       pltpu.VMEM((Dp, n, n_pad8, PK), dtype),
                       pltpu.SemaphoreType.DMA,
                       pltpu.SemaphoreType.DMA)
        else:
            kernel = functools.partial(_pcg_packed_kernel_stream, **kw)
            in_specs = [smem, pl.BlockSpec(memory_space=pltpu.ANY),
                        block((n, PK)), block((n, PK))]
            operands = (tol, S_ps, gamma_p, lam0_p)
            scratch = (pltpu.VMEM((3, n, n_pad8, PK), dtype),
                       pltpu.SemaphoreType.DMA)
    elif precond == "explicit":
        kernel = functools.partial(_pcg_packed_kernel_pinv, **kw)
        P_p = pack_mats(Pinv_blocks)
        in_specs = [smem, block((3, n, n, PK)),
                    block((Pinv_blocks.shape[-3], n, n, PK)),
                    block((n, PK)), block((n, PK))]
        operands = (tol, S_p, P_p, gamma_p, lam0_p)
        scratch = ()
    else:
        kernel = functools.partial(_pcg_packed_kernel_nopinv, **kw)
        in_specs = [smem, block((3, n, n, PK)), block((n, PK)),
                    block((n, PK))]
        operands = (tol, S_p, gamma_p, lam0_p)
        scratch = ()

    with jax.enable_x64(False):
        lam_p, iters, conv, eta = pl.pallas_call(
            kernel,
            grid=(G,),
            out_shape=out_shape,
            in_specs=in_specs,
            out_specs=(block((n, PK)), smem, smem, smem),
            scratch_shapes=list(scratch),
            interpret=interpret,
        )(*operands)

    # unpack (G, n, P*K) -> (B, K, n)
    lam = jnp.moveaxis(lam_p.reshape(G, n, P, K), -2, 1).reshape(B, n, K)
    lam = jnp.swapaxes(lam, -1, -2)
    return PCGResult(lam=lam, iters=iters, converged=conv != 0, eta=eta)


def _pcg_packed_kernel_nopinv(tol_ref, S_ref, gamma_ref, lam0_ref,
                              lam_ref, iters_ref, conv_ref, eta_ref, **kw):
    # refs arrive batch-squeezed (None in the BlockSpec block shape)
    _pcg_packed_kernel(tol_ref, S_ref, None, gamma_ref,
                       lam0_ref, lam_ref, iters_ref, conv_ref,
                       eta_ref, **kw)


def _pcg_packed_kernel_stream(tol_ref, S_hbm, gamma_ref, lam0_ref,
                              lam_ref, iters_ref, conv_ref, eta_ref,
                              S_vmem, dma_sem, **kw):
    """Stream variant: S lives in HBM (memory_space=ANY, the FULL
    (G, 3, n, n_pad8, PK) array — the sublane dim is PRE-PADDED to the
    8-tile because a (…, 14, PK) memref slice fails Mosaic's tiling
    alignment) and the kernel DMAs its own pack's matrix into ONE VMEM
    scratch buffer before solving, then value-slices the pad rows off
    (value slicing has no tiling constraint). The grid pipeline would keep
    TWO windows resident (measured ~1.75x S of scoped VMEM,
    tpcg/utils/feasibility.packed_vmem_bytes); single-buffering trades the
    overlap away — a ~3.4 us DMA against a multi-hundred-us pack solve —
    to fit one more pack-width doubling."""
    b = pl.program_id(0)
    cp = pltpu.make_async_copy(S_hbm.at[b], S_vmem, dma_sem)
    cp.start()
    cp.wait()
    S_val = S_vmem[...][:, :, :kw["n"], :]
    _pcg_packed_kernel(tol_ref, S_val, None, gamma_ref, lam0_ref,
                       lam_ref, iters_ref, conv_ref, eta_ref, **kw)


def _pcg_packed_kernel_stream2(tol_ref, S_hbm, P_hbm, gamma_ref, lam0_ref,
                               lam_ref, iters_ref, conv_ref, eta_ref,
                               S_vmem, P_vmem, dma_sem, dma_sem2, **kw):
    """Two-operand stream variant (explicit Pinv, incl. banded
    stair_refined pages): S and Pinv both live in HBM and are DMA'd into
    single VMEM scratches concurrently before the solve — same padding/
    value-slice discipline as :func:`_pcg_packed_kernel_stream`."""
    b = pl.program_id(0)
    cp = pltpu.make_async_copy(S_hbm.at[b], S_vmem, dma_sem)
    cq = pltpu.make_async_copy(P_hbm.at[b], P_vmem, dma_sem2)
    cp.start()
    cq.start()
    cp.wait()
    cq.wait()
    S_val = S_vmem[...][:, :, :kw["n"], :]
    P_val = P_vmem[...][:, :, :kw["n"], :]
    _pcg_packed_kernel(tol_ref, S_val, P_val, gamma_ref, lam0_ref,
                       lam_ref, iters_ref, conv_ref, eta_ref, **kw)


def _pcg_packed_kernel_pinv(tol_ref, S_ref, pinv_ref, gamma_ref, lam0_ref,
                            lam_ref, iters_ref, conv_ref, eta_ref, **kw):
    _pcg_packed_kernel(tol_ref, S_ref, pinv_ref,
                       gamma_ref, lam0_ref, lam_ref,
                       iters_ref, conv_ref, eta_ref, **kw)
