"""Nonlinear trajectory optimization: an SQP outer loop around the PCG
solver — the full MPCGPU scope the reference serves.

The reference is the linear-system core of MPCGPU's real-time NMPC solver
(/root/reference/README.md:66-77, arXiv:2309.08079): an SQP loop that
linearizes nonlinear dynamics, quadratizes costs, forms the Schur
complement of the resulting LQR-KKT system, PCG-solves it for the dynamics
multipliers, recovers the primal step, and line-searches a merit function.
The reference repo ships only the PCG stage; this module supplies the loop
above it, TPU-natively:

* linearization = one ``jax.vmap(jax.jacfwd(...))`` over the horizon — the
  whole A_k/B_k stack in two batched traced passes, no per-knot autodiff
  loops;
* the QP subproblem is a delta-form ``LQRProblem`` assembled by
  tpcg/models/lqr_kkt.py (batched einsums) and solved by the fused Pallas
  PCG kernel through the public API;
* the merit line search evaluates all candidate step lengths in one
  vmapped rollout batch.

Method: Gauss-Newton SQP on direct multiple shooting. Decision variables
are the full state AND control trajectories; dynamics enter as defect
constraints ``f(x_k, u_k) - x_{k+1} = 0``, linearized each iteration. With
quadratic tracking costs the Gauss-Newton Hessian is exact, so the QP is
precisely the LQRProblem form (Q, q, R, r SPD by construction + optional
Levenberg regularization).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from tpcg.models.lqr_kkt import LQRProblem, recover_primal, schur_system
from tpcg.types import PCGConfig


class TrajOptProblem(NamedTuple):
    """Nonlinear trajectory-optimization problem.

    Attributes:
      dynamics: ``f(x (n,), u (m,)) -> x_next (n,)`` — discrete, nonlinear.
      Q, q: running state cost ``1/2 x'Qx + q'x`` per knot, shapes
        ``(K, n, n)`` / ``(K, n)`` (row K-1 is the terminal cost).
      R, r: control cost per stage, ``(K-1, m, m)`` / ``(K-1, m)``.
      x_init: fixed initial state ``(n,)``.
      linearize: optional ``(X, U) -> (A, B, F)`` trajectory linearizer
        overriding the generic jacfwd route — ``A (K-1,n,n)``,
        ``B (K-1,n,m)``, ``F (K-1,n)`` the primal rollout
        ``f(x_k, u_k)``. Model families with structure to exploit
        (:func:`tpcg.models.rbd_lane.make_lane_linearizer`) inject it
        here; semantics must match ``dynamics`` to f32 roundoff.
      rollout: optional ``(X, U) -> F (K-1, n)`` primal-only rollout
        (``f(x_k, u_k)`` with no tangents), same override contract as
        ``linearize``. Used where defects are needed WITHOUT fresh
        Jacobians — the lagged-Jacobian RTI mode
        (:func:`tpcg.models.nmpc.rti_setup_lagged`) recomputes defects
        exactly every control step while reusing A/B across steps, and
        the tangent pass is ~20/21 of the linearize cost.
    """
    dynamics: Callable
    Q: jax.Array
    q: jax.Array
    R: jax.Array
    r: jax.Array
    x_init: jax.Array
    linearize: Optional[Callable] = None
    rollout: Optional[Callable] = None


class SQPResult(NamedTuple):
    x: jax.Array          #: (K, n) optimized states
    u: jax.Array          #: (K-1, m) optimized controls
    iterations: int       #: SQP iterations executed
    converged: bool       #: step + defect tolerances met
    cost: float           #: final objective value
    defect: float         #: final max-norm dynamics defect
    history: list         #: per-iteration dicts (cost, defect, pcg_iters,
    #: step size) — observability the reference never had (SURVEY.md §5.5)
    max_violation: float = 0.0  #: final max control-bound violation
    #: (:func:`sqp_solve_bounded` only; 0 for unconstrained solves)


_HIGH = jax.lax.Precision.HIGHEST
# every einsum here is precision-pinned: TPU f32 einsums default to
# bf16-grade MXU passes, and ~1e-3-relative merit/gradient noise was
# observed to stall the line search at defect ~1e-3 (CLAUDE.md invariant)


def _objective(p: TrajOptProblem, X, U):
    cx = 0.5 * jnp.einsum('ki,kij,kj->', X, p.Q, X,
                          precision=_HIGH) + jnp.sum(p.q * X)
    cu = 0.5 * jnp.einsum('ki,kij,kj->', U, p.R, U,
                          precision=_HIGH) + jnp.sum(p.r * U)
    return cx + cu


def _defects(p: TrajOptProblem, X, U):
    """f(x_k, u_k) - x_{k+1} for k = 0..K-2, shape (K-1, n)."""
    if p.rollout is not None:
        return p.rollout(X, U) - X[1:]
    return jax.vmap(p.dynamics)(X[:-1], U) - X[1:]


def _al_terms(V, lo, hi, lam_lo, lam_hi, rho):
    """PHR augmented-Lagrangian terms for a box constraint
    ``lo <= V <= hi`` on any decision-variable block (controls or states):
    scalar penalty value, its gradient wrt V, and its (diagonal) Hessian.

    With one-sided violations ``g_hi = V - hi`` / ``g_lo = lo - V`` and
    multipliers ``lam_* >= 0``, each side contributes
    ``(max(0, lam + rho g)^2 - lam^2) / (2 rho)`` — smooth, piecewise
    quadratic, exact at ``rho -> inf`` and already exact for finite rho
    once the multipliers converge (the standard Powell-Hestenes-Rockafellar
    form). The inner Gauss-Newton QP sees it through its gradient (into
    ``r``/``q``) and active-set diagonal Hessian ``rho`` (into
    ``R``/``Q``)."""
    t_hi = jnp.maximum(0.0, lam_hi + rho * (V - hi))
    t_lo = jnp.maximum(0.0, lam_lo + rho * (lo - V))
    val = (jnp.sum(t_hi ** 2 - lam_hi ** 2) +
           jnp.sum(t_lo ** 2 - lam_lo ** 2)) / (2.0 * rho)
    grad = t_hi - t_lo
    hess_diag = rho * ((t_hi > 0) | (t_lo > 0)).astype(V.dtype)
    return val, grad, hess_diag


def _merit(p: TrajOptProblem, X, U, mu, bounds=None, al=None):
    """``bounds = (u_bounds, x_bounds)``, each ``(lo, hi)`` or None;
    ``al = (lam_u_lo, lam_u_hi, lam_x_lo, lam_x_hi, rho)`` (dummy zero
    arrays for an absent side). State bounds apply to ``X[1:]`` — row 0
    is the pinned initial state, which the optimizer cannot move."""
    m = _objective(p, X, U) + mu * jnp.sum(jnp.abs(_defects(p, X, U)))
    if bounds is not None:
        ub, xb = bounds
        lul, luh, lxl, lxh, rho = al
        if ub is not None:
            m = m + _al_terms(U, ub[0], ub[1], lul, luh, rho)[0]
        if xb is not None:
            m = m + _al_terms(X[1:], xb[0], xb[1], lxl, lxh, rho)[0]
    return m


def _linearize(p: TrajOptProblem, X, U):
    """Batched A_k = df/dx, B_k = df/du along the trajectory, plus the
    primal rollout f(x_k, u_k) — all from ONE forward-mode pass. A
    problem-supplied ``p.linearize`` (e.g. the lane-major rigid-body
    route, tpcg/models/rbd_lane.py) takes precedence.

    Measured (v5e, iiwa14 n=14 K=128, chained-dependent timing): two
    separate ``vmap(jacfwd(argnums=i))`` passes cost 9.8 ms — XLA does
    NOT CSE the duplicated tangent graphs across the two vmapped calls —
    while a single combined pass is 5.5 ms; extracting the primal from
    the same ``jax.linearize`` partial evaluation makes the defect
    rollout free (it otherwise re-runs the full dynamics, ~1.5 ms)."""
    if p.linearize is not None:
        return p.linearize(X, U)
    n = X.shape[-1]

    def ab_f(x, u):
        f0, lin = jax.linearize(p.dynamics, x, u)
        eye = jnp.eye(n + u.shape[-1], dtype=x.dtype)
        cols = jax.vmap(lambda e: lin(e[:n], e[n:]))(eye)  # (n+m, n)
        J = jnp.swapaxes(cols, 0, 1)                       # (n, n+m)
        return J[:, :n], J[:, n:], f0

    A, B, F = jax.vmap(ab_f)(X[:-1], U)
    return A, B, F


def _build_qp(p: TrajOptProblem, X, U, reg, bounds=None, al=None,
              x_init=None, _lin=None) -> LQRProblem:
    """Assemble the delta-form LQRProblem for one Gauss-Newton QP at the
    trajectory (X, U) — the pure (vmappable) half of :func:`_qp_step`;
    the fleet RTI path maps it over a robot batch and routes the stacked
    systems through the lane-packed batched solver."""
    if x_init is None:
        x_init = p.x_init
    n = X.shape[-1]
    m = U.shape[-1]
    if _lin is None:
        A, B, F = _linearize(p, X, U)
        d = F - X[1:]
    else:
        A, B, d = _lin
    # gradients of the quadratic costs at the current trajectory
    gx = jnp.einsum('kij,kj->ki', p.Q, X, precision=_HIGH) + p.q
    gu = jnp.einsum('kij,kj->ki', p.R, U, precision=_HIGH) + p.r
    R_eff = p.R
    Q_eff = p.Q
    if bounds is not None:
        # AL bound penalties enter the QP exactly: gradients into r/q,
        # diagonal active-set Hessians (rho per active coordinate) into R/Q
        ub, xb = bounds
        lul, luh, lxl, lxh, rho = al
        if ub is not None:
            _, pen_grad, pen_hess = _al_terms(U, ub[0], ub[1], lul, luh,
                                              rho)
            gu = gu + pen_grad
            eyeM = jnp.broadcast_to(jnp.eye(m, dtype=U.dtype), p.R.shape)
            R_eff = p.R + pen_hess[..., :, None] * eyeM
        if xb is not None:
            _, pen_grad, pen_hess = _al_terms(X[1:], xb[0], xb[1], lxl,
                                              lxh, rho)
            gx = gx.at[1:].add(pen_grad)
            eyeN = jnp.eye(n, dtype=X.dtype)
            Q_eff = Q_eff.at[1:].add(pen_hess[..., :, None] * eyeN)
    eyeK = jnp.broadcast_to(jnp.eye(n, dtype=X.dtype), p.Q.shape)
    dt = p.Q.dtype  # user dynamics may emit f64 under x64; pin to cost dtype
    return LQRProblem(Q=Q_eff + reg * eyeK, q=gx.astype(dt),
                      R=R_eff.astype(dt), r=gu.astype(dt), A=A.astype(dt),
                      B=B.astype(dt), c=d.astype(dt),
                      x_init=(x_init - X[0]).astype(dt))


def _qp_step(p: TrajOptProblem, X, U, reg, config, bounds=None, al=None,
             x_init=None, lam0=None, backend="auto", _lin=None, Pinv=None):
    """One Gauss-Newton QP: assemble the delta-form LQRProblem and PCG-solve
    its Schur complement. Returns (dx, du, pcg_result).

    ``x_init`` overrides ``p.x_init`` (the RTI-MPC loop re-anchors the QP
    at each measured state); ``lam0`` warm-starts the inner PCG solve (the
    reference's in/out ``h_lambda`` pattern, interface.cuh:58,76 — carried
    across MPC steps). ``_lin=(A, B, d)`` injects a precomputed
    linearization (bench/diagnostics: isolates the QP core — assembly +
    solve + recovery — from the dynamics-autodiff cost, which dominates
    the full step on TPU for deep rigid-body graphs). ``Pinv`` injects an
    explicit (possibly stale) preconditioner — a stale Phi^-1 changes only
    the inner iteration count, never the QP solution, so serving loops can
    rebuild it every k-th step (measured on the iiwa14 K=128 Schur system:
    a one-step-stale stair_refined Pinv costs ZERO extra iterations,
    scripts/exp_qp_refined.py)."""
    from tpcg.solver.api import pcg_solve

    qp = _build_qp(p, X, U, reg, bounds, al, x_init, _lin)
    S, gamma = schur_system(qp)
    res = pcg_solve(S, gamma, lam0, config=config, backend=backend,
                    Pinv=Pinv)
    dx, du = recover_primal(qp, res.lam)
    return dx, du, res


class _SQPFns(NamedTuple):
    """Jitted per-iteration pieces, built once and reused across SQP (and,
    for the bounded solver, across AL outer) iterations. All take the AL
    state ``(lam_lo, lam_hi, rho)`` as trailing TRACED arguments, so
    multiplier/penalty updates never retrace — with expensive dynamics one
    retrace costs more than the entire numeric solve."""
    qp: callable
    merit_batch: callable
    merit0: callable
    defect: callable
    obj: callable


def _build_fns(p: TrajOptProblem, reg, config, bounds,
               n_al: int) -> _SQPFns:
    def with_al(al):
        return tuple(al) if al else None

    qp = jax.jit(lambda X_, U_, *al: _qp_step(p, X_, U_, reg, config,
                                              bounds, with_al(al)))
    merit_batch = jax.jit(jax.vmap(
        lambda a, X_, U_, dx, du, mu, *al: _merit(
            p, X_ + a * dx, U_ + a * du, mu, bounds, with_al(al)),
        in_axes=(0,) + (None,) * (5 + n_al)))
    merit0 = jax.jit(lambda X_, U_, mu, *al: _merit(p, X_, U_, mu, bounds,
                                                    with_al(al)))
    defect = jax.jit(lambda X_, U_: jnp.max(jnp.abs(_defects(p, X_, U_))))
    obj = jax.jit(lambda X_, U_: _objective(p, X_, U_))
    return _SQPFns(qp, merit_batch, merit0, defect, obj)


def sqp_solve(p: TrajOptProblem, X0=None, U0=None, *,
              max_sqp_iters: int = 20, step_tol: float = 1e-4,
              defect_tol: float = 1e-4, merit_mu: float = 10.0,
              reg: float = 1e-6, n_alphas: int = 8,
              config: Optional[PCGConfig] = None,
              _bounds=None, _al=None, _fns=None) -> SQPResult:
    """Solve a nonlinear trajectory-optimization problem by SQP.

    Args:
      X0, U0: initial trajectory guess; defaults to a hover-style constant
        rollout of zeros (states pinned at x_init, controls zero).
      max_sqp_iters: outer-iteration cap.
      step_tol / defect_tol: convergence when max|step| and max|defect|
        both drop below these.
      merit_mu: l1 defect weight in the line-search merit function.
      reg: Levenberg regularization added to Q in the QP (keeps the Schur
        complement SPD away from the solution).
      n_alphas: candidate step sizes 2^0 .. 2^-(n-1), evaluated in one
        vmapped merit batch.
      config: PCGConfig for the inner linear solves (default: symmetric-
        stair, 1e-8, the fused kernel on TPU).
    """
    K, n = p.Q.shape[0], p.Q.shape[-1]
    m = p.R.shape[-1]
    X = (jnp.broadcast_to(p.x_init, (K, n)).astype(p.Q.dtype)
         if X0 is None else jnp.asarray(X0))
    U = jnp.zeros((K - 1, m), p.Q.dtype) if U0 is None else jnp.asarray(U0)
    config = config or PCGConfig(exit_tol=1e-8, max_iter=200,
                                 preconditioner="symmetric_stair")
    alphas = 2.0 ** -jnp.arange(n_alphas, dtype=p.Q.dtype)

    # jit every per-iteration piece ONCE (the Gauss-Newton QP — linearize +
    # assemble + PCG — would otherwise re-trace each SQP iteration, and
    # for expensive dynamics the re-trace costs more than the solve); the
    # AL state rides through as traced arguments so the bounded solver's
    # multiplier updates reuse the same executables
    al_args = (() if _al is None else
               tuple(jnp.asarray(a, p.Q.dtype) for a in _al))
    fns = _fns or _build_fns(p, reg, config, _bounds, len(al_args))

    history = []
    converged = False
    it = 0
    for it in range(1, max_sqp_iters + 1):
        dx, du, res = fns.qp(X, U, *al_args)
        # the l1 exact-penalty descent condition needs mu > |multipliers|_inf
        # (res.lam IS the dynamics-multiplier estimate); a fixed mu that is
        # too small rejects genuine QP steps — observed on the manipulator,
        # whose gravity torques put the multipliers at ~50 vs merit_mu=10
        mu_t = max(merit_mu, 2.0 * float(jnp.max(jnp.abs(res.lam))))
        merits = fns.merit_batch(alphas, X, U, dx, du, mu_t, *al_args)
        best = int(jnp.argmin(merits))
        m0 = float(fns.merit0(X, U, mu_t, *al_args))
        alpha = float(alphas[best]) if float(merits[best]) < m0 else 0.0
        X = X + alpha * dx
        U = U + alpha * du
        step = float(jnp.max(jnp.abs(alpha * dx))) if alpha else 0.0
        defect = float(fns.defect(X, U))
        history.append(dict(cost=float(fns.obj(X, U)), defect=defect,
                            pcg_iters=int(res.iters), alpha=alpha,
                            step=step))
        if alpha == 0.0:
            break  # no merit decrease along the step — at a local solution
        if step < step_tol and defect < defect_tol:
            converged = True
            break

    defect = float(fns.defect(X, U))
    converged = converged or defect < defect_tol
    return SQPResult(x=X, u=U, iterations=it, converged=converged,
                     cost=float(fns.obj(X, U)), defect=defect,
                     history=history)


def sqp_solve_bounded(p: TrajOptProblem, u_lo, u_hi, X0=None, U0=None, *,
                      x_lo=None, x_hi=None,
                      al_iters: int = 10, rho0: float = 10.0,
                      rho_mult: float = 5.0, viol_tol: float = 1e-4,
                      inner_iters: int = 10,
                      **sqp_kwargs) -> SQPResult:
    """SQP with control box bounds ``u_lo <= u <= u_hi`` — and optionally
    state box bounds ``x_lo <= x_k <= x_hi`` for k >= 1 (velocity limits,
    position corridors) — via an augmented-Lagrangian outer loop (the
    inequality layer MPCGPU adds above the reference's
    equality-constrained solve; /root/reference/README.md:66-77 — the PCG
    core stays untouched, the bounds enter through the QP's R/r and Q/q).

    Each outer iteration solves a smooth bound-penalized SQP subproblem
    (:func:`sqp_solve` with the PHR penalty of :func:`_al_terms` folded
    into its merit and QP), then performs the standard multiplier update
    ``lam <- max(0, lam + rho g)`` and increases ``rho`` when the maximum
    violation did not drop by 4x. Terminates when bound violation and
    dynamics defect are both within tolerance.

    Args:
      u_lo, u_hi: ``(m,)`` or ``(K-1, m)`` control bounds (broadcast).
      x_lo, x_hi: optional ``(n,)`` or ``(K-1, n)`` state bounds, applied
        to ``x_1 .. x_{K-1}`` (``x_0`` is the pinned initial state).
      al_iters: outer multiplier-update cap.
      rho0 / rho_mult: initial penalty weight and its escalation factor.
      viol_tol: max-norm bound-violation tolerance.
      inner_iters: ``max_sqp_iters`` for each inner subproblem.
      **sqp_kwargs: forwarded to :func:`sqp_solve`.
    """
    if al_iters < 1:
        raise ValueError(f"al_iters must be >= 1, got {al_iters} (the "
                         "fallthrough result is the last inner solve)")
    K, m = p.R.shape[0] + 1, p.R.shape[-1]
    n = p.Q.shape[-1]
    dt_ = p.R.dtype
    u_lo = jnp.broadcast_to(jnp.asarray(u_lo, dt_), (K - 1, m))
    u_hi = jnp.broadcast_to(jnp.asarray(u_hi, dt_), (K - 1, m))
    ub = (u_lo, u_hi)
    if (x_lo is None) != (x_hi is None):
        raise ValueError("pass both x_lo and x_hi, or neither")
    xb = None
    if x_lo is not None:
        xb = (jnp.broadcast_to(jnp.asarray(x_lo, dt_), (K - 1, n)),
              jnp.broadcast_to(jnp.asarray(x_hi, dt_), (K - 1, n)))
    lam_u_lo = jnp.zeros((K - 1, m), dt_)
    lam_u_hi = jnp.zeros((K - 1, m), dt_)
    lam_x_lo = jnp.zeros((K - 1, n), dt_)  # dummy zeros when xb is None
    lam_x_hi = jnp.zeros((K - 1, n), dt_)
    rho = rho0
    X, U = X0, U0
    defect_tol = sqp_kwargs.get("defect_tol", 1e-4)
    history = []
    viol_prev = jnp.inf
    res = None
    bounds = (ub, xb)
    # build the jitted SQP pieces ONCE; multipliers and rho are traced
    # arguments, so the outer AL updates reuse the same executables (one
    # build per outer iteration would pay the full dynamics re-trace 10x)
    fns = _build_fns(p, sqp_kwargs.get("reg", 1e-6),
                     sqp_kwargs.get("config") or PCGConfig(
                         exit_tol=1e-8, max_iter=200,
                         preconditioner="symmetric_stair"),
                     bounds, n_al=5)

    def max_violation(X_, U_):
        v = jnp.max(jnp.maximum(
            jnp.maximum(U_ - u_hi, u_lo - U_), 0.0))
        if xb is not None:
            v = jnp.maximum(v, jnp.max(jnp.maximum(
                jnp.maximum(X_[1:] - xb[1], xb[0] - X_[1:]), 0.0)))
        return float(v)

    for _ in range(al_iters):
        res = sqp_solve(p, X, U, max_sqp_iters=inner_iters,
                        _bounds=bounds,
                        _al=(lam_u_lo, lam_u_hi, lam_x_lo, lam_x_hi, rho),
                        _fns=fns, **sqp_kwargs)
        X, U = res.x, res.u
        viol = max_violation(X, U)
        history.append(dict(violation=viol, rho=rho, cost=res.cost,
                            defect=res.defect,
                            inner_iters=res.iterations,
                            inner=res.history))
        if viol < viol_tol and res.defect < defect_tol:
            return SQPResult(x=X, u=U, iterations=len(history),
                             converged=True, cost=res.cost,
                             defect=res.defect, history=history,
                             max_violation=viol)
        lam_u_hi = jnp.maximum(0.0, lam_u_hi + rho * (U - u_hi))
        lam_u_lo = jnp.maximum(0.0, lam_u_lo + rho * (u_lo - U))
        if xb is not None:
            lam_x_hi = jnp.maximum(0.0, lam_x_hi + rho * (X[1:] - xb[1]))
            lam_x_lo = jnp.maximum(0.0, lam_x_lo + rho * (xb[0] - X[1:]))
        if viol > 0.25 * viol_prev:
            rho *= rho_mult
        viol_prev = viol
    return SQPResult(x=X, u=U, iterations=len(history), converged=False,
                     cost=res.cost, defect=res.defect, history=history,
                     max_violation=max_violation(X, U))


def quadrotor_hover_problem(K: int = 32, dt: float = 0.05,
                            x_init=None, x_goal=None,
                            dtype=jnp.float32) -> TrajOptProblem:
    """Planar-quadrotor stabilization: fly from a displaced, tilted start
    to hover at the origin — the nonlinear benchmark shape of the MPCGPU
    stack (reference README.md:66-77)."""
    from tpcg.models.dynamics import planar_quadrotor_step

    n, m = 6, 2
    x_init = (jnp.asarray([1.0, -0.5, 0.4, 0.0, 0.0, 0.0], dtype)
              if x_init is None else jnp.asarray(x_init, dtype))
    x_goal = jnp.zeros(n, dtype) if x_goal is None else jnp.asarray(
        x_goal, dtype)
    Q = jnp.broadcast_to(jnp.diag(
        jnp.asarray([10., 10., 2., 1., 1., 0.5], dtype)), (K, n, n))
    Q = Q.at[-1].multiply(10.0)
    q = -jnp.einsum('kij,j->ki', Q, x_goal, precision=_HIGH)
    # penalize deviation from hover thrust (mg/2 per rotor)
    u_hover = jnp.asarray([9.81 / 2, 9.81 / 2], dtype)
    R = jnp.broadcast_to(0.1 * jnp.eye(m, dtype=dtype), (K - 1, m, m))
    r = -jnp.einsum('kij,j->ki', R, u_hover, precision=_HIGH)
    dyn = lambda x, u: planar_quadrotor_step(x, u, dt=dt)
    return TrajOptProblem(dynamics=dyn, Q=Q, q=q, R=R, r=r, x_init=x_init)
