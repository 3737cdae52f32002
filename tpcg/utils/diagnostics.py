"""Convergence diagnostics.

The reference's only observability is a (partially lost) iteration count
(SURVEY.md §5.5). tpcg's solves return structured results; this module adds
the next level: the full eta trajectory of a solve — ``eta_k = r_k . Pinv
r_k`` per iteration, the quantity the exit test watches (pcg.cuh:195) —
for tolerance tuning, preconditioner comparison, and divergence forensics.

Implemented as a fixed-length ``lax.scan`` whose per-iteration body is the
SAME ``classic_pcg_step`` the solver loop uses (single source of truth for
the reference-parity algorithm); iterations after convergence (or, with
``stop_on_nonfinite``, after divergence) hold eta constant, so the curve is
flat past the point the solver would have exited.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from tpcg.ops.bdmv import bdmv
from tpcg.solver.jnp_backend import classic_pcg_step
from tpcg.types import BlockTridiag, PCGConfig, check_system


@functools.partial(jax.jit, static_argnames=("max_iter", "identity_pinv",
                                             "stop_on_nonfinite"))
def _eta_scan_pipelined(S_blocks, Pinv_blocks, gamma, lam0, *, exit_tol,
                        max_iter: int, identity_pinv: bool,
                        stop_on_nonfinite: bool):
    """Pipelined-method eta curve: a fixed-length scan over the SAME
    ``pipelined_step`` the solver's while_loop runs (incl. the eta-guarded
    residual replacement), frozen past the exit point. ``etas[k]`` is the
    eta computed at the TOP of pass k+1 — the pipelined method's own exit
    quantity, which trails the classic curve by one pass by construction
    (tpcg/solver/pipelined.py module docstring)."""
    from tpcg.solver.pipelined import _Carry, pipelined_step

    apply_pinv = ((lambda v: v) if identity_pinv
                  else (lambda v: bdmv(Pinv_blocks, v)))
    mv = lambda v: bdmv(S_blocks, v)
    vdot = lambda a, b: jnp.sum(a * b)
    step1 = functools.partial(pipelined_step, mv, apply_pinv, vdot, gamma,
                              jnp.asarray(exit_tol, gamma.dtype), 16)

    r = gamma - mv(lam0)
    u = apply_pinv(r)
    w = mv(u)
    zeros = jnp.zeros_like(r)
    eta0 = vdot(r, u)

    def stop(c, done):
        done = jnp.logical_or(done, c.converged)
        if stop_on_nonfinite:
            done = jnp.logical_or(
                done, jnp.logical_not(jnp.isfinite(c.eta_prev)))
        return done

    def step(carry, _):
        c, done = carry
        c_n = step1(c)
        c = jax.tree_util.tree_map(
            lambda old, new: jnp.where(done, old, new), c, c_n)
        return (c, stop(c, done)), c.eta_prev

    init_c = _Carry(lam0, r, u, w, zeros, zeros, zeros, zeros, eta0,
                    jnp.ones((), gamma.dtype), jnp.zeros((), jnp.int32),
                    jnp.abs(eta0) < exit_tol)
    (c, _), etas = jax.lax.scan(step, (init_c, init_c.converged), None,
                                length=max_iter)
    return c.x, jnp.concatenate([eta0[None], etas])


@functools.partial(jax.jit, static_argnames=("max_iter", "identity_pinv",
                                             "stop_on_nonfinite"))
def _eta_scan(S_blocks, Pinv_blocks, gamma, lam0, *, exit_tol,
              max_iter: int, identity_pinv: bool,
              stop_on_nonfinite: bool):
    apply_pinv = ((lambda v: v) if identity_pinv
                  else (lambda v: bdmv(Pinv_blocks, v)))
    r = gamma - bdmv(S_blocks, lam0)
    rt = apply_pinv(r)
    p = rt
    eta = jnp.sum(r * rt)

    def stop(eta, done):
        done = jnp.logical_or(done, jnp.abs(eta) < exit_tol)
        if stop_on_nonfinite:
            done = jnp.logical_or(done, jnp.logical_not(jnp.isfinite(eta)))
        return done

    def step(carry, _):
        lam, r, p, eta, done = carry
        lam_n, r_n, p_n, eta_n = classic_pcg_step(S_blocks, apply_pinv,
                                                  lam, r, p, eta)
        # freeze once the solver would have exited: the curve stays flat
        lam = jnp.where(done, lam, lam_n)
        r = jnp.where(done, r, r_n)
        p = jnp.where(done, p, p_n)
        eta = jnp.where(done, eta, eta_n)
        return (lam, r, p, eta, stop(eta, done)), eta

    init = (lam0, r, p, eta, stop(eta, jnp.zeros((), bool)))
    (lam, *_), etas = jax.lax.scan(step, init, None, length=max_iter)
    return lam, jnp.concatenate([eta[None], etas])


def eta_history(S, gamma, lam0=None, *, config: Optional[PCGConfig] = None,
                Pinv=None, backend: str = "jnp"):
    """Run a solve and return ``(lam, etas)`` where ``etas`` has shape
    ``(max_iter + 1,)``: ``etas[0]`` is the pre-loop eta (the quantity the
    0-iteration fast path checks) and ``etas[k]`` is eta after iteration k
    (flat after the solver's exit point). Single-system inputs only —
    ``(K, 3, n, n)`` / ``(K, n)`` — validated like ``pcg_solve`` (a batched
    input would silently couple systems through the joint reductions).

    ``backend="jnp"`` (default): a fixed-length scan over the SAME step
    functions the jnp solver runs — platform-independent semantics, but
    not the fused kernel's reduction order. ``backend="pallas"``: the
    PRODUCTION fused kernel with its debug_eta trace (one SMEM store per
    pass, tpcg/ops/fused_pcg.py) — the curve records the kernel's actual
    on-chip arithmetic, for forensics on anomalies the jnp scan cannot
    reproduce. Supports classic/pipelined/fixed methods.

    The pipelined curve is its own exit quantity and trails classic by one
    pass by construction (tpcg/solver/pipelined.py)."""
    from tpcg import precond
    from tpcg.solver.api import _as_bt

    S = _as_bt(S)
    gamma = jnp.asarray(gamma)
    lam0 = jnp.zeros_like(gamma) if lam0 is None else jnp.asarray(lam0)
    config = config or PCGConfig()
    if S.blocks.ndim != 4:
        raise ValueError(f"eta_history takes one system: S.blocks must be "
                         f"(K, 3, n, n), got {S.blocks.shape}")
    check_system(S, gamma, lam0)
    if Pinv is not None:
        Pinv = _as_bt(Pinv)
    identity = config.preconditioner == "identity" and Pinv is None

    if backend == "pallas":
        from tpcg.solver import pallas_backend
        in_kernel = (Pinv is None and
                     config.preconditioner in ("block_jacobi",
                                               "symmetric_stair"))
        pinv_blocks = (None if (identity or in_kernel)
                       else precond.materialize(S, config, Pinv).blocks)
        refine = (0 if config.preconditioner == "stair_refined"
                  else config.precond_refine)
        res, etas = pallas_backend.pcg_pallas(
            S.blocks, pinv_blocks, gamma, lam0,
            exit_tol=config.exit_tol, max_iter=config.max_iter,
            precond=config.preconditioner if in_kernel else None,
            stop_on_nonfinite=config.stop_on_nonfinite,
            method=config.method, precond_refine=refine,
            debug_eta=True,
            interpret=jax.default_backend() != "tpu")
        return res.lam, etas
    if backend != "jnp":
        raise ValueError(f"backend must be 'jnp' or 'pallas', got "
                         f"{backend!r}")
    if config.method == "fixed":
        raise ValueError("the jnp eta_history scans classic/pipelined; for "
                         "method='fixed' use backend='pallas' (the kernel "
                         "traces its fori passes directly)")
    pblocks = (S.blocks if identity
               else precond.materialize(S, config, Pinv).blocks)
    scan = (_eta_scan_pipelined if config.method == "pipelined"
            else _eta_scan)
    lam, etas = scan(S.blocks, pblocks, gamma, lam0,
                     exit_tol=config.exit_tol,
                     max_iter=config.max_iter,
                     identity_pinv=identity,
                     stop_on_nonfinite=config.stop_on_nonfinite)
    return lam, etas


def iterations_to_tolerance(etas, exit_tol: float) -> int:
    """Iteration count implied by an eta curve from :func:`eta_history`
    under the solver's exit semantics: first index k (0-based, so the
    pre-loop check maps to 0) with ``|etas[k]| < exit_tol``, or
    ``len(etas) - 1`` (= max_iter) if never reached."""
    import numpy as np

    below = np.abs(np.asarray(etas)) < exit_tol
    return int(np.argmax(below)) if below.any() else len(etas) - 1


def fleet_summary(result) -> dict:
    """Aggregate a batched/multi-RHS ``PCGResult`` (leading batch axis on
    every field) into the metrics a fleet operator watches (SURVEY.md §5.5
    — per-solve results exist; this is the fleet roll-up): solve counts,
    convergence rate, iteration quartiles/extremes, worst-eta offenders.

    Returns a plain dict of Python scalars (JSON-ready for logging/metric
    pipelines) plus the indices of the straggler and any diverged systems
    — the actionable part of the summary.
    """
    import numpy as np

    iters = np.atleast_1d(np.asarray(result.iters))
    conv = np.atleast_1d(np.asarray(result.converged))
    eta = np.atleast_1d(np.asarray(result.eta))
    n = int(iters.shape[0])
    q = np.percentile(iters, [25, 50, 75])
    unconverged = np.nonzero(~conv)[0]
    nonfinite = np.nonzero(~np.isfinite(eta))[0]
    return {
        "n_systems": n,
        "n_converged": int(conv.sum()),
        "convergence_rate": float(conv.mean()),
        "iters_min": int(iters.min()),
        "iters_p25": float(q[0]),
        "iters_median": float(q[1]),
        "iters_p75": float(q[2]),
        "iters_max": int(iters.max()),
        "iters_mean": float(iters.mean()),
        "straggler_index": int(iters.argmax()),
        "eta_max_abs": float(np.abs(eta[np.isfinite(eta)]).max())
        if np.isfinite(eta).any() else float("nan"),
        "unconverged_indices": [int(i) for i in unconverged[:16]],
        "nonfinite_eta_indices": [int(i) for i in nonfinite[:16]],
    }
