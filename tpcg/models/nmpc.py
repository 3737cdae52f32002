"""Closed-loop nonlinear MPC via the real-time iteration (RTI) scheme —
the deployment pattern the reference's solver exists to serve (MPCGPU,
/root/reference/README.md:66-77): at every control step, ONE warm-started
Gauss-Newton QP (linearize at the carried trajectory guess, PCG-solve the
LQR-KKT Schur complement, full step), apply the first control, shift the
horizon.

What makes this fast — and what the reference's expert path
(interface.cuh:93-144) was designed around — is that everything persists
across steps:

* the trajectory guess (X, U) is shifted, not recomputed (after the
  transient, it already sits on the optimal manifold and the single QP
  per step tracks it);
* the PCG multipliers are carried and shifted (the reference's in/out
  ``h_lambda``, interface.cuh:58,76), so the inner Krylov solve starts
  near its solution;
* every jitted piece is built once (tpcg/models/sqp.py ``_build_fns``
  pattern) — a control step is a handful of device calls with no
  retracing.

API: :func:`rti_setup` compiles the per-step function bundle,
:func:`rti_step` advances one control period, and
:func:`simulate` runs a closed loop against a plant model (by default the
problem's own dynamics — use a different ``plant`` for model-mismatch
studies).
"""

from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from tpcg.models.sqp import (TrajOptProblem, _build_qp, _defects,
                             _objective, _qp_step)
from tpcg.types import PCGConfig


class RTIState(NamedTuple):
    """Carried across control steps. The trailing fields are the
    augmented-Lagrangian state for actuator bounds (zeros when
    unconstrained — they ride along untouched)."""
    X: jax.Array           #: (K, n) trajectory guess
    U: jax.Array           #: (K-1, m) control guess
    lam: jax.Array         #: (K, n) PCG multiplier warm start
    step: jax.Array        #: int32 control-step counter
    total_pcg_iters: jax.Array  #: cumulative inner-solve iterations
    lam_u_lo: jax.Array = None  #: (K-1, m) bound multipliers (lower)
    lam_u_hi: jax.Array = None  #: (K-1, m) bound multipliers (upper)


class RTIResult(NamedTuple):
    xs: jax.Array          #: (T, n) closed-loop states (after each step)
    us: jax.Array          #: (T, m) applied controls
    pcg_iters: jax.Array   #: (T,) inner PCG iterations per step
    defects: jax.Array     #: (T,) max dynamics defect of the guess
    state: RTIState        #: final carried state


def _shift_rows(a):
    return jnp.concatenate([a[1:], a[-1:]], axis=0)


def rti_setup(p: TrajOptProblem, *, config: Optional[PCGConfig] = None,
              reg: float = 1e-6, u_lo=None, u_hi=None, backend="auto"):
    """Build the jitted one-QP step: ``(X, U, x_measured, lam0[,
    lam_u_lo, lam_u_hi, rho]) -> (dx, du, PCGResult)``. Shapes are static;
    the measured state, the multiplier warm start, and (when actuator
    bounds are given) the AL bound state are traced — no retracing across
    control steps."""
    config = config or PCGConfig(exit_tol=1e-8, max_iter=200,
                                 preconditioner="symmetric_stair")
    if (u_lo is None) != (u_hi is None):
        raise ValueError("pass both u_lo and u_hi, or neither")
    if u_lo is None:
        qp = jax.jit(lambda X, U, xi, lam0: _qp_step(
            p, X, U, reg, config, x_init=xi, lam0=lam0, backend=backend))
    else:
        K, m = p.R.shape[0] + 1, p.R.shape[-1]
        dt_ = p.R.dtype
        ub = (jnp.broadcast_to(jnp.asarray(u_lo, dt_), (K - 1, m)),
              jnp.broadcast_to(jnp.asarray(u_hi, dt_), (K - 1, m)))
        zx = jnp.zeros((K - 1, p.Q.shape[-1]), dt_)  # no state bounds

        qp = jax.jit(lambda X, U, xi, lam0, lul, luh, rho: _qp_step(
            p, X, U, reg, config, bounds=(ub, None),
            al=(lul, luh, zx, zx, rho), x_init=xi, lam0=lam0,
            backend=backend))
    defect = jax.jit(lambda X, U: jnp.max(jnp.abs(_defects(p, X, U))))
    return qp, defect


def rti_setup_lagged(p: TrajOptProblem, *,
                     config: Optional[PCGConfig] = None,
                     reg: float = 1e-6, backend="auto",
                     lag_pinv: bool = False):
    """Build the LAGGED-JACOBIAN RTI step pair: Jacobians A/B are
    refreshed every k-th control step and REUSED (shifted along the
    horizon) in between, while the defect rollout — and with it the
    solution manifold — is recomputed exactly every step.

    This is the second classic inexact-Jacobian RTI trade (the first,
    cheap-integrator tangents, is ``jac_integrator="heun"``): Gauss-
    Newton only needs A/B to define the STEP OPERATOR, not the fixed
    point — defects entering the QP's constraint right-hand side are
    what the converged trajectory satisfies. A stale A/B perturbs the
    contraction rate, not the manifold; after a shift the carried
    trajectory changes little per step, so one linearize amortizes over
    k steps. The tangent pass is ~20/21 of the linearize cost
    (tpcg/models/rbd_lane.py), which is itself the dominant term of the
    full RTI step — measured step cost goes from
    ``linearize + core`` to ``rollout + core`` on reuse steps.

    Returns ``(lin, qp_reuse, defect)``:

    * ``lin(X, U) -> (A, B)`` — the full lane-major tangent pass;
    * ``qp_reuse(X, U, x_measured, lam0, A, B) -> (dx, du, res)`` — one
      warm-started QP with injected Jacobians and a FRESH exact defect
      rollout (``TrajOptProblem.rollout`` when provided, else
      ``vmap(dynamics)``);
    * ``defect(X, U)`` — max-norm defect diagnostic.

    With ``lag_pinv=True`` the PRECONDITIONER is lagged too: ``lin``
    additionally assembles the Schur system at the refresh trajectory and
    materializes a banded ``stair_refined`` Phi^-1 from it
    (tpcg.precond.stair_refined — page array returned alongside A/B), and
    ``qp_reuse`` takes those pages as a trailing argument. A stale Phi^-1
    changes only the inner iteration count, never the QP solution
    (preconditioning is semantics-free), and measured on the iiwa14 K=128
    Schur system a one-step-stale stair_refined costs ZERO extra
    iterations while cutting them 44 -> 33 vs the in-kernel stair
    (scripts/exp_qp_refined.py) — so reuse steps get the stronger
    spectrum without paying any build.

    Use via ``simulate(..., jac_refresh_every=k[, lag_pinv=True])`` or
    drive the pair directly for a serving loop."""
    from tpcg.models.sqp import _build_qp, _linearize
    from tpcg.models.lqr_kkt import schur_system

    config = config or PCGConfig(exit_tol=1e-8, max_iter=200,
                                 preconditioner="symmetric_stair")

    if lag_pinv:
        from tpcg import precond
        from tpcg.types import BlockBanded

        @jax.jit
        def lin(X, U, xi):
            A, B, F = _linearize(p, X, U)
            d = F - X[1:]
            qp = _build_qp(p, X, U, reg, x_init=xi, _lin=(A, B, d))
            S, _gamma = schur_system(qp)
            return A, B, precond.stair_refined(S, levels=1).pages

        @jax.jit
        def qp_reuse(X, U, xi, lam0, A, B, Pinv_pages):
            d = _defects(p, X, U)
            return _qp_step(p, X, U, reg, config, x_init=xi, lam0=lam0,
                            backend=backend, _lin=(A, B, d),
                            Pinv=BlockBanded(Pinv_pages))
    else:
        @jax.jit
        def lin(X, U):
            A, B, _F = _linearize(p, X, U)
            return A, B

        @jax.jit
        def qp_reuse(X, U, xi, lam0, A, B):
            d = _defects(p, X, U)
            return _qp_step(p, X, U, reg, config, x_init=xi, lam0=lam0,
                            backend=backend, _lin=(A, B, d))

    defect = jax.jit(lambda X, U: jnp.max(jnp.abs(_defects(p, X, U))))
    return lin, qp_reuse, defect


def rti_init(p: TrajOptProblem, x0) -> RTIState:
    K, n = p.Q.shape[0], p.Q.shape[-1]
    m = p.R.shape[-1]
    dt_ = p.Q.dtype
    x0 = jnp.asarray(x0, dt_)
    return RTIState(X=jnp.broadcast_to(x0, (K, n)).astype(dt_),
                    U=jnp.zeros((K - 1, m), dt_),
                    lam=jnp.zeros((K, n), dt_),
                    step=jnp.zeros((), jnp.int32),
                    total_pcg_iters=jnp.zeros((), jnp.int32),
                    lam_u_lo=jnp.zeros((K - 1, m), dt_),
                    lam_u_hi=jnp.zeros((K - 1, m), dt_))


def rti_step(qp, state: RTIState, x_measured, *, alpha: float = 1.0,
             bounds=None, rho: float = 50.0):
    """One control period: single warm-started QP at the measured state,
    full (or damped) step, pick ``u_0``, shift the horizon. With
    ``bounds=(u_lo, u_hi)`` (requires a :func:`rti_setup` built with the
    same bounds) the QP carries the PHR penalty and the bound multipliers
    get their AL update from the stepped trajectory — amortizing the AL
    outer loop across control steps, RTI-style. Returns
    ``(new_state, u_apply, pcg_result)``."""
    if bounds is None:
        dx, du, res = qp(state.X, state.U, x_measured, state.lam)
    else:
        dx, du, res = qp(state.X, state.U, x_measured, state.lam,
                         state.lam_u_lo, state.lam_u_hi,
                         jnp.asarray(rho, state.U.dtype))
    X = state.X + alpha * dx
    U = state.U + alpha * du
    u0 = U[0]
    lul, luh = state.lam_u_lo, state.lam_u_hi
    if bounds is not None:
        u_lo = jnp.broadcast_to(jnp.asarray(bounds[0], U.dtype), U.shape)
        u_hi = jnp.broadcast_to(jnp.asarray(bounds[1], U.dtype), U.shape)
        luh = _shift_rows(jnp.maximum(0.0, luh + rho * (U - u_hi)))
        lul = _shift_rows(jnp.maximum(0.0, lul + rho * (u_lo - U)))
        u0 = jnp.clip(u0, u_lo[0], u_hi[0])  # actuator saturation is real
    new = RTIState(X=_shift_rows(X), U=_shift_rows(U),
                   lam=_shift_rows(res.lam),
                   step=state.step + 1,
                   total_pcg_iters=state.total_pcg_iters + res.iters,
                   lam_u_lo=lul, lam_u_hi=luh)
    return new, u0, res


def rti_setup_fleet(p: TrajOptProblem, *,
                    config: Optional[PCGConfig] = None, reg: float = 1e-6,
                    backend: str = "auto"):
    """Build the jitted one-QP FLEET step: ``B`` robots sharing the
    problem structure (costs/dynamics/horizon) but each with its own
    carried trajectory, measured state, and multiplier warm start —
    multi-robot MPC serving on one chip.

    Returns ``(qp_fleet, defect_fleet)`` with
    ``qp_fleet(X (B,K,n), U (B,K-1,m), x_measured (B,n), lam0 (B,K,n))
    -> (dx, du, PCGResult)`` (leading ``B`` axis on every output; iters/
    converged are per-robot). The linearization and lane-major Schur
    assembly are ``vmap``-ed over the fleet (pure elementwise lane code —
    the batch dim just widens the VPU work), and the ``B`` Schur systems
    are solved JOINTLY by the lane-packed batched kernel
    (:func:`tpcg.pcg_solve_batched` — P systems per grid step, per-
    iteration scalar latency amortized across the pack), not by vmapping
    ``B`` single solves. Actuator bounds follow the single-robot pattern
    (:func:`rti_setup`) and are not yet plumbed here."""
    from tpcg.models.lqr_kkt import recover_primal, schur_system
    from tpcg.solver.api import pcg_solve_batched

    config = config or PCGConfig(exit_tol=1e-8, max_iter=200,
                                 preconditioner="symmetric_stair")

    @jax.jit
    def qp_fleet(X, U, x_measured, lam0):
        qp = jax.vmap(lambda X_, U_, xi_: _build_qp(p, X_, U_, reg,
                                                    x_init=xi_))(
            X, U, x_measured)
        S, gamma = jax.vmap(schur_system)(qp)
        res = pcg_solve_batched(S.blocks, gamma, lam0, config=config,
                                backend=backend)
        dx, du = jax.vmap(recover_primal)(qp, res.lam)
        return dx, du, res

    defect_fleet = jax.jit(jax.vmap(
        lambda X_, U_: jnp.max(jnp.abs(_defects(p, X_, U_)))))
    return qp_fleet, defect_fleet


def rti_setup_fleet_lagged(p: TrajOptProblem, *,
                           config: Optional[PCGConfig] = None,
                           reg: float = 1e-6, backend: str = "auto"):
    """Fleet analog of :func:`rti_setup_lagged`: ``B`` robots advance by
    one jointly-solved QP per control period with their trajectory
    Jacobians refreshed every k-th step and shifted/reused in between,
    while each robot's defect rollout stays exact every step (the
    manifold-preserving split — see :func:`rti_setup_lagged`).

    Returns ``(lin_fleet, qp_reuse_fleet, defect_fleet)``:

    * ``lin_fleet(X (B,K,n), U (B,K-1,m)) -> (A (B,K-1,n,n),
      Bm (B,K-1,n,m))`` — the vmapped lane-major tangent pass;
    * ``qp_reuse_fleet(X, U, x_measured (B,n), lam0 (B,K,n), A, Bm)
      -> (dx, du, PCGResult)`` — fresh exact defects per robot, the B
      Schur systems solved jointly in the lane-packed batched kernel;
    * ``defect_fleet(X, U) -> (B,)`` max-norm defects.

    Measured single-robot (scripts/exp_stepcheck.py): the reuse step is
    rollout + QP core instead of linearize + QP core, and the tangent
    pass is the dominant term — the same amortization per robot, with
    the packed kernel's joint-solve amortizing the scalar latency across
    the fleet."""
    from tpcg.models.lqr_kkt import recover_primal, schur_system
    from tpcg.models.sqp import _build_qp, _linearize
    from tpcg.solver.api import pcg_solve_batched

    config = config or PCGConfig(exit_tol=1e-8, max_iter=200,
                                 preconditioner="symmetric_stair")

    @jax.jit
    def lin_fleet(X, U):
        A, Bm, _F = jax.vmap(lambda X_, U_: _linearize(p, X_, U_))(X, U)
        return A, Bm

    @jax.jit
    def qp_reuse_fleet(X, U, x_measured, lam0, A, Bm):
        d = jax.vmap(lambda X_, U_: _defects(p, X_, U_))(X, U)
        qp = jax.vmap(
            lambda X_, U_, xi_, A_, B_, d_: _build_qp(
                p, X_, U_, reg, x_init=xi_, _lin=(A_, B_, d_)))(
            X, U, x_measured, A, Bm, d)
        S, gamma = jax.vmap(schur_system)(qp)
        res = pcg_solve_batched(S.blocks, gamma, lam0, config=config,
                                backend=backend)
        dx, du = jax.vmap(recover_primal)(qp, res.lam)
        return dx, du, res

    defect_fleet = jax.jit(jax.vmap(
        lambda X_, U_: jnp.max(jnp.abs(_defects(p, X_, U_)))))
    return lin_fleet, qp_reuse_fleet, defect_fleet


def simulate_fleet(p: TrajOptProblem, x0s, n_steps: int, *,
                   plant: Optional[Callable] = None,
                   config: Optional[PCGConfig] = None,
                   reg: float = 1e-6, alpha: float = 1.0,
                   backend: str = "auto",
                   jac_refresh_every: int = 1) -> RTIResult:
    """Closed-loop RTI-MPC for a fleet: ``x0s (B, n)`` initial states,
    one jointly-solved QP per control period for all ``B`` robots
    (:func:`rti_setup_fleet`). Returns an :class:`RTIResult` whose
    ``xs``/``us``/``pcg_iters`` carry shapes ``(T, B, n)`` / ``(T, B, m)``
    / ``(T, B)`` and whose state fields have a leading ``B`` axis.

    ``jac_refresh_every=k > 1`` lags the per-robot Jacobians
    (:func:`rti_setup_fleet_lagged`): refreshed jointly every k-th step,
    shifted with each robot's horizon in between, defects exact every
    step."""
    if jac_refresh_every < 1:
        raise ValueError(f"jac_refresh_every must be >= 1, "
                         f"got {jac_refresh_every}")
    plant = plant or p.dynamics
    plant_v = jax.jit(jax.vmap(plant))
    lagged = jac_refresh_every > 1
    if lagged:
        lin_f, qp_reuse_f, defect = rti_setup_fleet_lagged(
            p, config=config, reg=reg, backend=backend)
        shift_AB = jax.jit(lambda A, Bm: (
            jax.vmap(_shift_rows)(A), jax.vmap(_shift_rows)(Bm)))
    else:
        qp, defect = rti_setup_fleet(p, config=config, reg=reg,
                                     backend=backend)
    K, n = p.Q.shape[0], p.Q.shape[-1]
    m = p.R.shape[-1]
    dt_ = p.Q.dtype
    x = jnp.asarray(x0s, dt_)
    B = x.shape[0]
    X = jnp.broadcast_to(x[:, None, :], (B, K, n)).astype(dt_)
    U = jnp.zeros((B, K - 1, m), dt_)
    lam = jnp.zeros((B, K, n), dt_)
    total_iters = jnp.zeros((), jnp.int32)
    xs, us, iters, defs = [], [], [], []
    shift = jax.jit(jax.vmap(_shift_rows))
    A = Bm = None
    for i in range(n_steps):
        X = X.at[:, 0].set(x)  # re-anchor each robot at its measured state
        if lagged:
            if i % jac_refresh_every == 0:
                A, Bm = lin_f(X, U)
            else:
                A, Bm = shift_AB(A, Bm)
            dx, du, res = qp_reuse_f(X, U, x, lam, A, Bm)
        else:
            dx, du, res = qp(X, U, x, lam)
        Xn, Un = X + alpha * dx, U + alpha * du
        u0 = Un[:, 0]          # apply the FIRST control of the new plan
        X, U, lam = shift(Xn), shift(Un), shift(res.lam)
        x = plant_v(x, u0)
        total_iters = total_iters + jnp.sum(res.iters)
        xs.append(x)
        us.append(u0)
        iters.append(res.iters)
        defs.append(jnp.max(defect(X, U)))
    state = RTIState(X=X, U=U, lam=lam,
                     step=jnp.asarray(n_steps, jnp.int32),
                     total_pcg_iters=total_iters)
    return RTIResult(xs=jnp.stack(xs), us=jnp.stack(us),
                     pcg_iters=jnp.stack(iters), defects=jnp.stack(defs),
                     state=state)


def simulate(p: TrajOptProblem, x0, n_steps: int, *,
             plant: Optional[Callable] = None,
             config: Optional[PCGConfig] = None, reg: float = 1e-6,
             alpha: float = 1.0, warm_start_lam: bool = True,
             u_lo=None, u_hi=None, rho: float = 50.0,
             jac_refresh_every: int = 1,
             lag_pinv: bool = False) -> RTIResult:
    """Closed-loop RTI-MPC rollout: ``n_steps`` control periods of one QP
    each, applied to ``plant`` (default: the problem's own dynamics).

    ``u_lo``/``u_hi`` add actuator bounds: the per-step QP carries the PHR
    penalty with bound multipliers updated across control steps (the AL
    outer loop amortized RTI-style) and the applied control is clipped.

    ``warm_start_lam=False`` zeroes the carried multipliers each step —
    the ablation knob for measuring what the reference's h_lambda
    warm-start pattern is worth in inner iterations.

    ``jac_refresh_every=k > 1`` runs the LAGGED-JACOBIAN mode
    (:func:`rti_setup_lagged`): the trajectory linearization is computed
    on every k-th step and shifted/reused in between, while defects (and
    therefore the solution manifold) stay exact every step — the
    amortized serving trade for linearize-bound problems. ``lag_pinv``
    additionally lags a materialized ``stair_refined`` preconditioner
    built at each refresh (stronger spectrum on reuse steps at zero build
    cost; staleness only affects inner iteration counts). Not combinable
    with actuator bounds yet."""
    if jac_refresh_every < 1:
        raise ValueError(f"jac_refresh_every must be >= 1, "
                         f"got {jac_refresh_every}")
    if jac_refresh_every > 1 and u_lo is not None:
        raise ValueError("jac_refresh_every > 1 with actuator bounds is "
                         "not plumbed; use jac_refresh_every=1")
    if lag_pinv and jac_refresh_every == 1:
        raise ValueError("lag_pinv requires jac_refresh_every > 1 (it "
                         "lags the preconditioner across reuse steps)")
    plant = plant or p.dynamics
    plant_j = jax.jit(plant)
    x = jnp.asarray(x0, p.Q.dtype)
    xs, us, iters, defs = [], [], [], []

    if jac_refresh_every > 1:
        lin, qp_reuse, defect = rti_setup_lagged(p, config=config, reg=reg,
                                                 lag_pinv=lag_pinv)
        state = rti_init(p, x0)
        shift_AB = jax.jit(lambda A, B: (_shift_rows(A), _shift_rows(B)))
        A = B = Pp = None
        for i in range(n_steps):
            if not warm_start_lam:
                state = state._replace(lam=jnp.zeros_like(state.lam))
            state = state._replace(X=state.X.at[0].set(x))
            if i % jac_refresh_every == 0:
                if lag_pinv:
                    A, B, Pp = lin(state.X, state.U, x)
                else:
                    A, B = lin(state.X, state.U)
            else:
                # shift the cached Jacobians with the horizon: after the
                # RTI shift, knot k of the new guess is near knot k+1 of
                # the old one, so the shifted A/B are the closer stale
                # set. The lagged Pinv is NOT shifted: a preconditioner
                # need not track the system at all, and the banded pages'
                # boundary rows are knot-position-dependent (a shift
                # would corrupt the first/last bands).
                A, B = shift_AB(A, B)
            if lag_pinv:
                dx, du, res = qp_reuse(state.X, state.U, x, state.lam,
                                       A, B, Pp)
            else:
                dx, du, res = qp_reuse(state.X, state.U, x, state.lam,
                                       A, B)
            X = state.X + alpha * dx
            U = state.U + alpha * du
            u0 = U[0]
            state = RTIState(X=_shift_rows(X), U=_shift_rows(U),
                             lam=_shift_rows(res.lam),
                             step=state.step + 1,
                             total_pcg_iters=(state.total_pcg_iters
                                              + res.iters),
                             lam_u_lo=state.lam_u_lo,
                             lam_u_hi=state.lam_u_hi)
            x = plant_j(x, u0)
            xs.append(x)
            us.append(u0)
            iters.append(res.iters)
            defs.append(defect(state.X, state.U))
        return RTIResult(xs=jnp.stack(xs), us=jnp.stack(us),
                         pcg_iters=jnp.stack(iters),
                         defects=jnp.stack(defs), state=state)

    qp, defect = rti_setup(p, config=config, reg=reg, u_lo=u_lo, u_hi=u_hi)
    bounds = None if u_lo is None else (u_lo, u_hi)
    state = rti_init(p, x0)
    for _ in range(n_steps):
        if not warm_start_lam:
            state = state._replace(lam=jnp.zeros_like(state.lam))
        # re-anchor the carried guess at the measured state (the shifted
        # guess's X[0] is last step's x_1 prediction; under model mismatch
        # they differ)
        state = state._replace(X=state.X.at[0].set(x))
        state, u0, res = rti_step(qp, state, x, alpha=alpha,
                                  bounds=bounds, rho=rho)
        x = plant_j(x, u0)
        xs.append(x)
        us.append(u0)
        iters.append(res.iters)
        defs.append(defect(state.X, state.U))
    return RTIResult(xs=jnp.stack(xs), us=jnp.stack(us),
                     pcg_iters=jnp.stack(iters), defects=jnp.stack(defs),
                     state=state)
