"""Inexact-Jacobian RTI experiment (iiwa14 n=14, K=128): how much of the
NMPC full-step cost is the tangent pass, and what do cheaper variational
integrators (heun/euler for A,B; exact RK4 primal either way) buy — and
cost — in closed loop?

Run on the TPU:  timeout 600 python scripts/exp_linearize.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_enable_x64", True)

    from tpcg.models import nmpc
    from tpcg.models.rigid_body import manipulator_reach_problem
    from tpcg.types import PCGConfig, PCGResult
    from tpcg.utils.timing import device_solve_time

    cfg = PCGConfig(exit_tol=1e-8, max_iter=200,
                    preconditioner="symmetric_stair", method="pipelined")
    probs = {ji: manipulator_reach_problem(K=128, dt=0.01,
                                           jac_integrator=ji)
             for ji in ("rk4", "heun", "euler")}
    p0 = probs["rk4"]
    sim = nmpc.simulate(p0, p0.x_init, n_steps=4, config=cfg)
    st = sim.state
    g_carrier = jnp.broadcast_to(st.X[0], st.X.shape)

    # Jacobian error of the cheap tangents vs exact RK4
    A0, B0, F0 = jax.jit(probs["rk4"].linearize)(st.X, st.U)
    for ji in ("heun", "euler"):
        A1, B1, F1 = jax.jit(probs[ji].linearize)(st.X, st.U)
        ea = float(jnp.max(jnp.abs(A1 - A0)) / jnp.max(jnp.abs(A0)))
        eb = float(jnp.max(jnp.abs(B1 - B0)) / jnp.max(jnp.abs(B0)))
        ef = float(jnp.max(jnp.abs(F1 - F0)))
        print(f"# {ji}: relerr A {ea:.2e}  B {eb:.2e}  |F-F0| {ef:.1e} "
              f"(must be 0: primal stays RK4)", file=sys.stderr)

    def timeit(name, fn, *args, **kw):
        t = device_solve_time(fn, *args, repeats=kw.pop("repeats", 128),
                              lo_repeats=16, reps=5)
        print(f"{name:44s} {t * 1e6:10.1f} us", file=sys.stderr)
        return t

    # linearize alone, per integrator (nudge rides X via gamma slot)
    for ji, p in probs.items():
        lin_j = jax.jit(p.linearize)

        def lin_fn(X_, _P, g_, l_, lin_j=lin_j):
            A, B, F = lin_j(X_ + g_ * 1e-20, st.U)
            return PCGResult(lam=g_ + 0 * l_, iters=jnp.int32(0),
                             converged=jnp.bool_(True),
                             eta=jnp.sum(A) + jnp.sum(B) + jnp.sum(F))
        timeit(f"linearize alone ({ji})", lin_fn, st.X, st.X, g_carrier,
               jnp.zeros_like(g_carrier))

    # primal rollout alone (the floor)
    from tpcg.models.rbd_lane import _np_consts, _rk4_t
    from tpcg.models.rigid_body import iiwa14_like
    cs = _np_consts(iiwa14_like())

    def prim_fn(X_, _P, g_, l_):
        xu = (X_ + g_ * 1e-20)[:-1].T
        out = _rk4_t(cs, xu, st.U.T.astype(xu.dtype), 0.01)
        return PCGResult(lam=g_ + 0 * l_, iters=jnp.int32(0),
                         converged=jnp.bool_(True), eta=jnp.sum(out))
    timeit("primal RK4 rollout alone", prim_fn, st.X, st.X, g_carrier,
           jnp.zeros_like(g_carrier))

    # full RTI step per integrator
    for ji, p in probs.items():
        qp_j, _ = nmpc.rti_setup(p, config=cfg)

        def step_fn(X_, U_, g_, l_, qp_j=qp_j):
            dx, du, res = qp_j(X_ + g_ * 1e-20, U_, g_[0], l_)
            return res
        r = step_fn(st.X, st.U, g_carrier, st.lam)
        t = timeit(f"RTI full step ({ji} tangents)", step_fn, st.X, st.U,
                   g_carrier, st.lam)
        print(f"#   iters={int(r.iters)} conv={bool(r.converged)}",
              file=sys.stderr)

    # closed-loop quality: 30 steps from rest, report final goal distance
    # + worst defect per integrator (the real acceptance test)
    for ji, p in probs.items():
        simn = nmpc.simulate(p, p.x_init, n_steps=30, config=cfg)
        qg = np.asarray(probs["rk4"].q[0])  # unused; report state error
        x_fin = np.asarray(simn.xs[-1])
        print(f"# closed-loop {ji}: total_pcg="
              f"{int(simn.state.total_pcg_iters)} "
              f"max_defect={float(jnp.max(simn.defects)):.2e} "
              f"|qd|_fin={np.linalg.norm(x_fin[7:]):.3e}",
              file=sys.stderr)
        if ji == "rk4":
            x_ref = x_fin
        else:
            print(f"#   |x_fin - x_fin(rk4)| = "
                  f"{np.linalg.norm(x_fin - x_ref):.3e}", file=sys.stderr)


if __name__ == "__main__":
    main()
