"""Pipelined PCG (Ghysels & Vanroose) — an opt-in alternative method.

Standard PCG has TWO dependent scalar reductions per iteration
(alpha's denominator, then eta_new — the reference pays two
grid.sync+glass::reduce rounds for them, pcg.cuh:163-169,187-193; the fused
TPU kernel pays two vector->scalar->broadcast chains; the sharded solver
pays two psums over ICI). The pipelined reformulation computes both dots at
ONE point per iteration from the same pair of vectors, at the cost of three
extra vector recurrences:

    r0 = gamma - S x0 ; u0 = Pinv r0 ; w0 = S u0
    iterate:
      eta_k   = (r_k, u_k)          # same quantity as the reference's eta
      delta_k = (w_k, u_k)          # both dots together -> one sync point
      m = Pinv w_k ; nn = S m       # apply ops independent of the dots
      beta  = 0            (k = 0)  |  eta_k / eta_{k-1}        (k > 0)
      alpha = eta_k/delta_k (k = 0) |  eta_k / (delta_k - beta eta_k /
                                                alpha_{k-1})
      z <- nn + beta z ; q <- m + beta q ; s <- w + beta s ; p <- u + beta p
      x += alpha p ; r -= alpha s ; u -= alpha q ; w -= alpha z

Exit test: ``|eta_k| < exit_tol`` on the SAME preconditioned residual inner
product as the reference — but evaluated at the TOP of the iteration, so
iteration counts are not comparable 1:1 with the classic method (typically
reports one more, and fp drift of the recurrences can add occasional
iterations). This is a different METHOD, offered for latency, not a
reimplementation of the reference loop; the classic method remains the
default and the parity target.

Reference: Ghysels & Vanroose, "Hiding global synchronization latency in
the preconditioned Conjugate Gradient algorithm" (Parallel Computing 40,
2014); also surveyed in PAPERS.md ("Pipelined Conjugate Gradient Method on
Heterogeneous Architectures").
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from tpcg.ops.bdmv import bdmv
from tpcg.types import PCGResult


def all_true(b):
    """x64-safe jnp.all for kernel-shared code: jnp.all's lowering traces
    an f64 scalar that Mosaic rejects under jax_enable_x64 (probed on
    hardware); an int32 min-reduce lowers cleanly in both modes."""
    if b.ndim == 0:
        return b
    return jnp.min(b.astype(jnp.int32)) == jnp.int32(1)


class _Carry(NamedTuple):
    x: jax.Array
    r: jax.Array
    u: jax.Array
    w: jax.Array
    z: jax.Array
    q: jax.Array
    s: jax.Array
    p: jax.Array
    eta_prev: jax.Array
    alpha_prev: jax.Array
    iters: jax.Array
    converged: jax.Array


def pipelined_pcg_body(mv, apply_pinv, vdot, gamma, lam0, exit_tol,
                       max_iter: int, stop_on_nonfinite: bool = False,
                       replace_every: int = 16, trace_store=None):
    """Method core, parameterized over the operator applications so the jnp
    backend, the fused Pallas kernel, and the sharded solver all share one
    implementation. Returns ``(x, iters, converged, eta)``.

    NOTE: tpcg/ops/multirhs.py:_multirhs_pipelined_loop carries a masked
    per-rhs variant of these recurrences (scalars are (R,1), converged rhs
    frozen with jnp.where) that could not reuse this body; changes to the
    recurrence or the replacement cadence must be mirrored there.

    ``replace_every``: pipelined CG's recurrences drift in fp32 (observed on
    hardware: an iiwa-scale K=512 system stagnated above a 1e-6 tolerance
    the classic method reached in 36 iterations). Every ``replace_every``
    iterations the auxiliary vectors are recomputed from their definitions
    (r = gamma - S x, u = Pinv r, w = S u, s = S p, q = Pinv s, z = S q) —
    the residual-replacement strategy from the pipelined-CG literature. Set
    ``replace_every=0`` to disable."""
    r = gamma - mv(lam0)
    u = apply_pinv(r)
    w = mv(u)
    zeros = jnp.zeros_like(r)
    one = jnp.ones((), gamma.dtype)

    # ``vdot`` may return a scalar (jnp / sharded backends) or a (1, 1)
    # array (the fused Pallas kernel: keeping dots as vector values skips a
    # vector->scalar->vector round trip through the scalar core, measured
    # ~0.9 us/solve at iiwa14 scale) — scalar-context reductions below
    # normalize with jnp.all.
    def cond(c: _Carry):
        go = jnp.logical_and(c.iters < max_iter,
                             jnp.logical_not(c.converged))
        if stop_on_nonfinite:
            go = jnp.logical_and(go, all_true(jnp.isfinite(c.eta_prev)))
        return go

    body = functools.partial(pipelined_step, mv, apply_pinv, vdot, gamma,
                             exit_tol, replace_every,
                             trace_store=trace_store)

    # pre-loop tolerance check (same deviation as the classic backends):
    # an already-converged warm start reports 0 iterations instead of
    # computing alpha = 0/0
    eta0 = vdot(r, u)
    if trace_store is not None:
        trace_store(jnp.int32(0), eta0)
    init = _Carry(lam0, r, u, w, zeros, zeros, zeros, zeros,
                  eta0, jnp.ones_like(eta0) * one,
                  jnp.zeros((), jnp.int32),
                  all_true(jnp.abs(eta0) < exit_tol))
    out = jax.lax.while_loop(cond, body, init)
    return out.x, out.iters, out.converged, out.eta_prev


def pipelined_step(mv, apply_pinv, vdot, gamma, exit_tol, replace_every,
                   c: _Carry, trace_store=None) -> _Carry:
    """One pipelined iteration (the while-loop body), exposed so the
    diagnostics scan (tpcg/utils/diagnostics.py) runs the SAME recurrence
    the solver does — single source of truth, like classic_pcg_step.

    ``trace_store(idx, eta)``: optional side-effect hook (a Pallas SMEM
    store in the fused kernel's debug_eta mode) recording the pass's exit
    quantity; index ``c.iters + 1`` matches the diagnostics convention
    (slot 0 is the pre-loop eta)."""
    eta = vdot(c.r, c.u)
    if trace_store is not None:
        trace_store(c.iters + jnp.int32(1), eta)
    delta = vdot(c.w, c.u)          # both dots at one sync point
    m = apply_pinv(c.w)
    nn = mv(m)
    first = c.iters == 0
    beta = jnp.where(first, jnp.zeros_like(eta), eta / c.eta_prev)
    alpha = jnp.where(
        first, eta / delta,
        eta / (delta - beta * eta / c.alpha_prev))
    z = nn + beta * c.z
    q = m + beta * c.q
    s = c.w + beta * c.s
    p = c.u + beta * c.p
    x = c.x + alpha * p
    r = c.r - alpha * s
    u = c.u - alpha * q
    w = c.w - alpha * z
    if replace_every:
        def replace(args):
            x, p, *_ = args
            r = gamma - mv(x)
            u = apply_pinv(r)
            w = mv(u)
            s = mv(p)
            q = apply_pinv(s)
            z = mv(q)
            return (x, p, r, u, w, s, q, z)

        # Guard: only replace while eta is far from the exit tolerance.
        # Measured on chip (iiwa14 n=14): an UNGUARDED replacement firing
        # near convergence (cadence 32 -> first fire at iter 31, eta
        # ~1e-5) stagnates the solve at BOTH K=128 and K=512 — the
        # recomputed r = gamma - S x sits at the fp32 noise floor there,
        # and the recurrence inherits garbage eta ratios. Early firings
        # (eta large) are exactly the ones that fix the K=512 drift.
        # typed int32 scalars: Python-int operands of %/== trace as
        # i64 under jax_enable_x64, which Mosaic rejects in-kernel
        re32 = jnp.int32(replace_every)
        do_replace = jnp.logical_and(
            c.iters % re32 == re32 - jnp.int32(1),
            c.iters > jnp.int32(0))
        do_replace = jnp.logical_and(
            do_replace, all_true(jnp.abs(eta) > 1000.0 * exit_tol))
        x, p, r, u, w, s, q, z = jax.lax.cond(
            do_replace, replace, lambda args: args,
            (x, p, r, u, w, s, q, z))
    # exit on the NEXT eta (computed top of next pass) — test the
    # current one here so the reported count includes this pass
    converged = all_true(jnp.abs(eta) < exit_tol)
    return _Carry(x, r, u, w, z, q, s, p, eta, alpha,
                  c.iters + 1, converged)


def fixed_pipelined_body(mv, apply_pinv, vdot, gamma, lam0, max_iter: int,
                         trace_store=None):
    """Fixed-budget pipelined recurrence: exactly ``max_iter`` passes of
    the Ghysels-Vanroose iteration with NO per-pass tests of any kind —
    no exit reduce, no residual-replacement branch. Combined with
    (1,1)-shaped ``vdot`` in the fused kernel this removes every
    vector->scalar round trip from the loop: the bounded-latency mode
    (method="fixed") built on the one-sync-point recurrence instead of the
    classic two-chain one (round-2 measured the classic-form fixed loop
    SLOWER than adaptive pipelined because the two dependent dot chains,
    not the exit test, are the floor — this is the other half of that
    experiment).

    The +tiny denominators park converged/degenerate systems at alpha=0
    (r=0 -> eta=delta=0); ``alpha_prev`` substitutes 1 when alpha was
    parked so the ``beta*eta/alpha_prev`` term stays 0 instead of NaN.
    No residual replacement: fp32 recurrence drift over a fixed budget is
    bounded by the budget itself, and the post-hoc convergence check
    (|eta| < tol on the final iterates' true dot) is the contract.

    Returns ``(x, eta_final)`` with ``eta_final = (r, Pinv r)`` of the
    final iterates — the same verification quantity the classic fixed
    mode reports."""
    tiny = jnp.asarray(1e-30, gamma.dtype)
    r = gamma - mv(lam0)
    u = apply_pinv(r)
    w = mv(u)
    zeros = jnp.zeros_like(r)
    eta0 = vdot(r, u)
    if trace_store is not None:
        trace_store(jnp.int32(0), eta0)

    def fbody(i, c):
        x, r, u, w, z, q, s, p, eta_prev, alpha_prev = c
        eta = vdot(r, u)
        delta = vdot(w, u)
        m = apply_pinv(w)
        nn = mv(m)
        first = i == jnp.int32(0)
        beta = jnp.where(first, jnp.zeros_like(eta),
                         eta / (eta_prev + tiny))
        alpha = jnp.where(
            first, eta / (delta + tiny),
            eta / (delta - beta * eta / alpha_prev + tiny))
        if trace_store is not None:
            trace_store(i + jnp.int32(1), eta)
        z = nn + beta * z
        q = m + beta * q
        s = w + beta * s
        p = u + beta * p
        x = x + alpha * p
        r = r - alpha * s
        u = u - alpha * q
        w = w - alpha * z
        alpha_prev = jnp.where(jnp.abs(alpha) > 0, alpha,
                               jnp.ones_like(alpha))
        return (x, r, u, w, z, q, s, p, eta, alpha_prev)

    init = (lam0, r, u, w, zeros, zeros, zeros, zeros, eta0,
            jnp.ones_like(eta0))
    out = jax.lax.fori_loop(0, max_iter, fbody, init)
    x, r, u = out[0], out[1], out[2]
    return x, vdot(r, u)


def speculative_pcg_body(mv, apply_pinv, vdot, gamma, lam0, exit_tol,
                         max_iter: int, budget: int,
                         stop_on_nonfinite: bool = False,
                         trace_store=None):
    """Speculative mode: ``budget`` passes of the ZERO-SYNC fixed
    pipelined sweep (no vector->scalar round trips at all), then hand the
    iterate to the adaptive pipelined loop, which verifies and tops up to
    ``exit_tol``.

    When the budget guess is right (a warm-started MPC loop knows last
    step's count), the adaptive phase costs only its init (one mv + one
    apply + one mv + one dot — no loop passes) and the pre-loop exit
    check, so the whole solve runs at fixed-mode speed WITH the full
    adaptive-tolerance contract; a wrong guess degrades gracefully into
    the adaptive loop. Reported ``iters`` = budget + top-up passes
    (matching what the two phases actually executed)."""
    x, _ = fixed_pipelined_body(mv, apply_pinv, vdot, gamma, lam0, budget,
                                trace_store=trace_store)
    x, it2, conv, eta = pipelined_pcg_body(
        mv, apply_pinv, vdot, gamma, x, exit_tol, max_iter - budget,
        stop_on_nonfinite)
    return x, jnp.int32(budget) + it2, conv, eta


def resolve_spec_budget(max_iter: int, spec_budget: int) -> int:
    """0 = auto: three quarters of the cap (a conservative default when no
    warm-start iteration history exists)."""
    b = spec_budget if spec_budget else max(1, (3 * max_iter) // 4)
    if not 1 <= b < max_iter:
        raise ValueError(f"spec_budget must be in [1, max_iter), got {b} "
                         f"with max_iter={max_iter}")
    return b


@functools.partial(jax.jit, static_argnames=("max_iter", "identity_pinv",
                                             "stop_on_nonfinite",
                                             "precond_refine",
                                             "spec_budget"))
def pcg_speculative_jnp(S_blocks, Pinv_blocks, gamma, lam0, *, exit_tol,
                        max_iter: int, identity_pinv: bool = False,
                        stop_on_nonfinite: bool = False,
                        precond_refine: int = 0,
                        spec_budget: int = 0) -> PCGResult:
    """jnp oracle for ``PCGConfig(method='speculative')``."""
    exit_tol = jnp.asarray(exit_tol, dtype=gamma.dtype)
    mv = lambda v: bdmv(S_blocks, v)

    def apply_pinv(v):
        if identity_pinv:
            return v
        z = bdmv(Pinv_blocks, v)
        for _ in range(precond_refine):
            z = z + bdmv(Pinv_blocks, v - mv(z))
        return z

    vdot = lambda a, b: jnp.sum(a * b)
    budget = resolve_spec_budget(max_iter, spec_budget)
    x, iters, conv, eta = speculative_pcg_body(
        mv, apply_pinv, vdot, gamma, lam0, exit_tol, max_iter, budget,
        stop_on_nonfinite)
    return PCGResult(lam=x, iters=iters, converged=conv, eta=eta)


@functools.partial(jax.jit, static_argnames=("max_iter", "identity_pinv",
                                             "stop_on_nonfinite",
                                             "precond_refine"))
def pcg_fixed_pipelined_jnp(S_blocks, Pinv_blocks, gamma, lam0, *, exit_tol,
                            max_iter: int, identity_pinv: bool = False,
                            stop_on_nonfinite: bool = False,
                            precond_refine: int = 0) -> PCGResult:
    """Fixed-budget pipelined oracle (``PCGConfig.method=
    'fixed_pipelined'``): the jnp mirror of the fused kernel's zero-sync
    pipelined mode. ``iters`` reports the budget; ``converged`` whether
    the final eta met ``exit_tol``. ``stop_on_nonfinite`` accepted for
    signature parity only (no early exit exists in this mode)."""
    del stop_on_nonfinite
    exit_tol = jnp.asarray(exit_tol, dtype=gamma.dtype)
    mv = lambda v: bdmv(S_blocks, v)

    def apply_pinv(v):
        if identity_pinv:
            return v
        z = bdmv(Pinv_blocks, v)
        for _ in range(precond_refine):
            z = z + bdmv(Pinv_blocks, v - mv(z))
        return z

    vdot = lambda a, b: jnp.sum(a * b)
    x, eta = fixed_pipelined_body(mv, apply_pinv, vdot, gamma, lam0,
                                  max_iter)
    return PCGResult(lam=x, iters=jnp.asarray(max_iter, jnp.int32),
                     converged=jnp.abs(eta) < exit_tol, eta=eta)


@functools.partial(jax.jit, static_argnames=("max_iter", "identity_pinv",
                                             "stop_on_nonfinite",
                                             "precond_refine",
                                             "replace_every"))
def pcg_pipelined_jnp(S_blocks, Pinv_blocks, gamma, lam0, *, exit_tol,
                      max_iter: int, identity_pinv: bool = False,
                      stop_on_nonfinite: bool = False,
                      precond_refine: int = 0,
                      replace_every: int = 16) -> PCGResult:
    """Pipelined method on the jnp backend (oracle for the fused version)."""
    exit_tol = jnp.asarray(exit_tol, gamma.dtype)
    mv = lambda v: bdmv(S_blocks, v)

    def apply_pinv(v):
        if identity_pinv:
            return v
        z = bdmv(Pinv_blocks, v)
        for _ in range(precond_refine):
            z = z + bdmv(Pinv_blocks, v - mv(z))
        return z
    vdot = lambda a, b: jnp.sum(a * b)
    x, iters, conv, eta = pipelined_pcg_body(
        mv, apply_pinv, vdot, gamma, lam0, exit_tol, max_iter,
        stop_on_nonfinite, replace_every=replace_every)
    return PCGResult(lam=x, iters=iters, converged=conv, eta=eta)
