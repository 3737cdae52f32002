"""Breakdown of the NMPC QP core at iiwa14 scale (n=14, K=128): where do
the microseconds go — Schur assembly, PCG solve, primal recovery?

Run on the TPU:  timeout 420 python scripts/exp_qpcore.py
Chained-dependent device timing throughout (tpcg/utils/timing.py); every
piece threads the nudge through its own S-equivalent operand so nothing
gets loop-hoisted.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import jax.numpy as jnp


def main():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(os.path.dirname(__file__), "..",
                                   ".jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    jax.config.update("jax_enable_x64", True)

    from tpcg.models import nmpc
    from tpcg.models.lqr_kkt import recover_primal, schur_system
    from tpcg.models.rigid_body import manipulator_reach_problem
    from tpcg.models.sqp import _linearize, _qp_step
    from tpcg.solver.api import pcg_solve
    from tpcg.types import PCGConfig, PCGResult
    from tpcg.utils.timing import device_solve_time

    p = manipulator_reach_problem(K=128, dt=0.01)
    cfg = PCGConfig(exit_tol=1e-8, max_iter=200,
                    preconditioner="symmetric_stair", method="pipelined")
    sim = nmpc.simulate(p, p.x_init, n_steps=4, config=cfg)
    st = sim.state

    A, B, F = jax.jit(lambda X, U: _linearize(p, X, U))(st.X, st.U)
    d = F - st.X[1:]

    # the assembled QP (delta form) exactly as _qp_step builds it
    qp_full = jax.jit(lambda A_, B_, d_, l_: _qp_step(
        p, st.X, st.U, 1e-6, cfg, x_init=st.X[0], lam0=l_,
        backend="auto", _lin=(A_, B_, d_)))
    dx, du, res = qp_full(A, B, d, st.lam)
    print("# qp core iters:", int(res.iters), "conv:", bool(res.converged),
          file=sys.stderr)

    def timeit(name, fn, *args, **kw):
        t = device_solve_time(fn, *args, repeats=kw.pop("repeats", 256),
                              lo_repeats=32, reps=5)
        print(f"{name:44s} {t * 1e6:10.1f} us", file=sys.stderr)
        return t

    # 1. full QP core (assembly + solve + recovery), nudge rides A and d
    def qp_core(A_, B_, d_, l_):
        return qp_full(A_, B_, d_, l_)[2]
    timeit("QP core total", qp_core, A, B, d, st.lam)

    # reproduce the internal LQRProblem for the piecewise measurements
    from tpcg.models.lqr_kkt import LQRProblem
    n, m = 14, 7
    gx = jnp.einsum('kij,kj->ki', p.Q, st.X,
                    precision=jax.lax.Precision.HIGHEST) + p.q
    gu = jnp.einsum('kij,kj->ki', p.R, st.U,
                    precision=jax.lax.Precision.HIGHEST) + p.r
    eyeK = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), p.Q.shape)
    dt32 = p.Q.dtype
    qp = LQRProblem(Q=(p.Q + 1e-6 * eyeK).astype(dt32), q=gx.astype(dt32),
                    R=p.R.astype(dt32), r=gu.astype(dt32),
                    A=A.astype(dt32), B=B.astype(dt32), c=d.astype(dt32),
                    x_init=(st.X[0] - st.X[0]).astype(dt32))

    # 2. assembly alone: nudge rides A (via the S slot) and c (gamma slot)
    def asm(A_, _P, c_, l_):
        S, gamma = schur_system(qp._replace(A=A_, c=c_))
        return PCGResult(lam=gamma + 0 * l_, iters=jnp.int32(0),
                         converged=jnp.bool_(True),
                         eta=jnp.sum(S.blocks) + jnp.sum(gamma))
    timeit("schur assembly alone", asm, qp.A, qp.A, qp.c, jnp.zeros_like(
        jnp.asarray(st.lam)))

    # 3. solve alone on the assembled (fixed) system
    S0, g0 = jax.jit(schur_system)(qp)

    def solve_only(S_, _P, g_, l_):
        from tpcg.types import BlockTridiag
        return pcg_solve(BlockTridiag(S_), g_, l_, config=cfg)
    timeit("pcg solve alone (warm lam)", solve_only, S0.blocks, S0.blocks,
           g0, st.lam)

    # 4. recovery alone: nudge rides A and lam (gamma slot)
    def rec(A_, _P, lam_, l_):
        x, u = recover_primal(qp._replace(A=A_), lam_)
        return PCGResult(lam=lam_ + 0 * l_, iters=jnp.int32(0),
                         converged=jnp.bool_(True),
                         eta=jnp.sum(x) + jnp.sum(u))
    timeit("primal recovery alone", rec, qp.A, qp.A, res.lam,
           jnp.zeros_like(res.lam))

    # 5. cost-gradient + LQRProblem packaging (the _qp_step preamble)
    def pre(X_, _P, g_, l_):
        gx_ = jnp.einsum('kij,kj->ki', p.Q, X_,
                         precision=jax.lax.Precision.HIGHEST) + p.q
        gu_ = jnp.einsum('kij,kj->ki', p.R, st.U,
                         precision=jax.lax.Precision.HIGHEST) + p.r
        return PCGResult(lam=g_ + 0 * l_, iters=jnp.int32(0),
                         converged=jnp.bool_(True),
                         eta=jnp.sum(gx_) + jnp.sum(gu_))
    timeit("cost-gradient preamble", pre, st.X, st.X, g0, jnp.zeros_like(g0))


if __name__ == "__main__":
    main()
