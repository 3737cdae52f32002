"""Timing / profiling utilities (SURVEY.md §5.1: the reference has no
tracing or timers at all — its only performance signal is the iteration
count; the rebuild provides wall-clock measurement and profiler hooks as
first-class utilities).

Measurement honesty on remote-attached TPUs: per-call host timings include
dispatch through whatever transport sits between host and chip, which can be
noisy. :func:`chain_solves` builds a jitted executor that runs R solves
back-to-back ON DEVICE with a true data dependence between them, so
``elapsed / R`` measures kernel throughput the way the reference's
device-resident expert path (SURVEY.md §3.3) is measured — and the
dependence chain prevents XLA from collapsing the repeats into one solve.
"""

from __future__ import annotations

import contextlib
import functools
import time
from typing import Callable

import jax
import jax.numpy as jnp


def wall_time(fn: Callable, *args, warmup: int = 3, reps: int = 20,
              best_of: bool = True, **kwargs) -> float:
    """Seconds per call of ``fn(*args, **kwargs)``, synchronized with
    ``block_until_ready``. Returns best-of (min) by default — the right
    estimator under one-sided dispatch noise."""
    r = None
    for _ in range(warmup):
        r = fn(*args, **kwargs)
    if r is not None:
        jax.block_until_ready(r)
    times = []
    for _ in range(reps):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
    return min(times) if best_of else sum(times) / len(times)


def chain_solves(solve_fn: Callable, repeats: int):
    """Wrap a solver ``solve_fn(S, Pinv, gamma, lam0) -> PCGResult`` into a
    single jitted executable running ``repeats`` dependent solves.

    The k-th solve's gamma AND S are perturbed by ``eta_{k-1} * 1e-20`` (a
    genuine data dependence, numerically inert at f32), so the chain cannot
    be CSE'd/hoisted and ``wall_time(chained)/repeats`` is device
    throughput. Nudging S matters as much as gamma: XLA's while-loop
    invariant code motion HOISTS any S-only computation (preconditioner
    construction, lane-major relayout) out of the chain if S is
    loop-invariant — measured 27.8 vs 610.7 µs/solve for the
    stair_refined build+solve before/after this fix. In the MPC setting S
    changes every control step, so per-solve cost must include the
    S-dependent pipeline.
    """

    @jax.jit
    def chained(S, Pinv, gamma, lam0):
        def body(_, carry):
            acc, lam = carry
            eps = acc * 1e-20
            res = solve_fn(S + eps.astype(S.dtype), Pinv,
                           gamma + eps.astype(gamma.dtype), lam0)
            return (jnp.sum(res.eta).astype(gamma.dtype), lam + 0 * res.lam)

        acc, lam = jax.lax.fori_loop(
            0, repeats, body, (jnp.zeros((), gamma.dtype), lam0))
        return acc, lam

    return chained


def device_solve_time(solve_fn: Callable, S, Pinv, gamma, lam0,
                      repeats: int = 2048, reps: int = 7,
                      lo_repeats: int = None) -> float:
    """Seconds per solve, measured on-device via :func:`chain_solves`.

    Methodology, forced by the remote-attached transport (see CLAUDE.md):

    * two-point slope between chain lengths ``lo`` and ``hi`` — per-call
      transport cost (phases of ~30 ms per dispatch were observed) appears
      in both and cancels;
    * every timed call receives a DIFFERENT scalar nudge folded into gamma —
      identical-input calls were observed to return in ~27 µs even for a
      32768-solve chain (result memoization somewhere in the transport), so
      repeat-timing identical calls measures nothing;
    * median over reps — robust to occasional slow-phase dispatches on
      either side.
    """
    import statistics

    hi = repeats
    lo = lo_repeats if lo_repeats is not None else max(1, hi // 8)

    def timed_chain(n_chain):
        chained = chain_solves(solve_fn, n_chain)

        @jax.jit
        def fn(S_, P_, g_, l_, idx):
            return chained(S_, P_, g_ + idx * 1e-30, l_)

        # Synchronize by FETCHING the scalar chain output, not
        # block_until_ready: the transport was observed to ack readiness
        # before execution completes, while a host fetch always waits.
        float(fn(S, Pinv, gamma, lam0, jnp.zeros((), gamma.dtype))[0])
        times = []
        for i in range(reps):
            idx = jnp.asarray(float(i + 1), gamma.dtype)
            t0 = time.perf_counter()
            float(fn(S, Pinv, gamma, lam0, idx)[0])
            times.append(time.perf_counter() - t0)
        return statistics.median(times)

    # The transport occasionally enters a mode where even multi-thousand
    # solve chains "complete" in ~30 µs (acks before execution?). A chained
    # call that fast is physically impossible for any nontrivial solve —
    # treat it as invalid and retry after a pause; bounded attempts.
    for attempt in range(3):
        t_lo = timed_chain(lo)
        t_hi = timed_chain(hi)
        plausible = t_hi >= hi * 1e-7  # no real solve beats 0.1 us
        if t_hi > t_lo and plausible:
            return (t_hi - t_lo) / (hi - lo)
        time.sleep(5.0)
    return t_hi / hi  # upper bound; transport never became sane


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Context manager wrapping ``jax.profiler`` tracing (view in
    TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
