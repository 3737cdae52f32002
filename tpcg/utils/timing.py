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
    for _ in range(warmup):
        r = fn(*args, **kwargs)
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

    The k-th solve's gamma is perturbed by ``eta_{k-1} * 1e-20`` (a genuine
    data dependence, numerically inert at f32), so the chain cannot be
    CSE'd/hoisted and ``wall_time(chained)/repeats`` is device throughput.
    """

    @jax.jit
    def chained(S, Pinv, gamma, lam0):
        def body(_, carry):
            acc, lam = carry
            res = solve_fn(S, Pinv, gamma + acc * 1e-20, lam0)
            return (jnp.sum(res.eta).astype(gamma.dtype), lam + 0 * res.lam)

        acc, lam = jax.lax.fori_loop(
            0, repeats, body, (jnp.zeros((), gamma.dtype), lam0))
        return acc, lam

    return chained


def device_solve_time(solve_fn: Callable, S, Pinv, gamma, lam0,
                      repeats: int = 256, reps: int = 12,
                      lo_repeats: int = None) -> float:
    """Seconds per solve, measured on-device via :func:`chain_solves`.

    Uses a two-point slope: times a chain of ``lo_repeats`` (default
    repeats//4) and one of ``repeats``; the per-solve time is
    ``(t_hi - t_lo) / (repeats - lo_repeats)``. Any per-dispatch transport
    cost (which on remote-attached chips can be large and phase-dependent)
    appears identically in both and cancels. Falls back to ``t_hi/repeats``
    if noise makes the slope non-positive (an upper bound)."""
    lo = lo_repeats if lo_repeats is not None else max(1, repeats // 4)
    t_lo = wall_time(chain_solves(solve_fn, lo), S, Pinv, gamma, lam0,
                     warmup=2, reps=reps)
    t_hi = wall_time(chain_solves(solve_fn, repeats), S, Pinv, gamma, lam0,
                     warmup=2, reps=reps)
    if t_hi > t_lo:
        return (t_hi - t_lo) / (repeats - lo)
    return t_hi / repeats


@contextlib.contextmanager
def profile_trace(logdir: str):
    """Context manager wrapping ``jax.profiler`` tracing (view in
    TensorBoard / xprof)."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
