"""Can a stronger preconditioner cut the NMPC QP core's PCG time?

The QP core at iiwa14 K=128 (warm lam, tol 1e-6) runs ~85 pipelined
iterations with the in-kernel symmetric stair — 2.4x the headline solve's
~35 on trajopt-toy spectra, so there is iteration headroom here that the
single-solve headline (ROADMAP item 9) did not have. Candidate routes:

* ``stair_refined`` (materialized banded Neumann refinement,
  tpcg/precond + tpcg/ops/banded.py lane-major build): build+solve per
  step — within ONE control step S is fixed, so the build is paid once
  per QP; measured 29.6 us / 25 iters on the trajopt toy.
* the same with the build LAGGED across control steps (build from last
  step's S, reuse k steps): solve-only cost + build/k. PCG tolerates a
  stale preconditioner — it only changes the iteration count — so this
  is semantics-safe; what this script measures is the iteration count
  with a preconditioner built from a NEIGHBORING step's S (the shifted
  trajectory), i.e. the realistic staleness.
* ``fixed_pipelined`` at the warm iteration budget (zero sync points).

Run on the TPU:  timeout 600 python scripts/exp_qp_refined.py
Chained-dependent device timing throughout (tpcg/utils/timing.py).
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

    from tpcg import precond
    from tpcg.models import nmpc
    from tpcg.models.lqr_kkt import LQRProblem, schur_system
    from tpcg.models.rigid_body import manipulator_reach_problem
    from tpcg.models.sqp import _linearize
    from tpcg.solver.api import pcg_solve
    from tpcg.types import BlockTridiag, PCGConfig
    from tpcg.utils.timing import device_solve_time

    p = manipulator_reach_problem(K=128, dt=0.01)
    cfg = PCGConfig(exit_tol=1e-8, max_iter=200,
                    preconditioner="symmetric_stair", method="pipelined")
    sim = nmpc.simulate(p, p.x_init, n_steps=4, config=cfg)
    st = sim.state

    n, m = 14, 7

    def build_qp(X, U):
        A, B, F = jax.jit(lambda X_, U_: _linearize(p, X_, U_))(X, U)
        d = F - X[1:]
        gx = jnp.einsum('kij,kj->ki', p.Q, X,
                        precision=jax.lax.Precision.HIGHEST) + p.q
        gu = jnp.einsum('kij,kj->ki', p.R, U,
                        precision=jax.lax.Precision.HIGHEST) + p.r
        eyeK = jnp.broadcast_to(jnp.eye(n, dtype=jnp.float32), p.Q.shape)
        dt32 = p.Q.dtype
        return LQRProblem(
            Q=(p.Q + 1e-6 * eyeK).astype(dt32), q=gx.astype(dt32),
            R=p.R.astype(dt32), r=gu.astype(dt32), A=A.astype(dt32),
            B=B.astype(dt32), c=d.astype(dt32),
            x_init=(X[0] - X[0]).astype(dt32))

    qp_now = build_qp(st.X, st.U)
    S0, g0 = jax.jit(schur_system)(qp_now)
    # the PREVIOUS control step's trajectory: the realistic staleness for
    # a lagged preconditioner (one RTI shift apart)
    from tpcg.models.nmpc import _shift_rows
    X_prev = jnp.concatenate([st.X[:1], st.X[:-1]], axis=0)
    U_prev = jnp.concatenate([st.U[:1], st.U[:-1]], axis=0)
    S_prev, _ = jax.jit(schur_system)(build_qp(X_prev, U_prev))

    def timeit(name, fn, *args, **kw):
        r = fn(*args)
        t = device_solve_time(fn, *args, repeats=kw.pop("repeats", 256),
                              lo_repeats=32, reps=5)
        it = int(r.iters) if hasattr(r, "iters") else -1
        cv = bool(r.converged) if hasattr(r, "converged") else True
        print(f"{name:52s} {t * 1e6:9.1f} us  iters={it:4d} conv={cv}",
              file=sys.stderr, flush=True)
        return t

    tol, mi = 1e-6, 200

    # 1. baseline: in-kernel symmetric stair, pipelined, warm lam
    for meth in ("pipelined", "classic"):
        c = PCGConfig(exit_tol=tol, max_iter=mi, method=meth,
                      preconditioner="symmetric_stair")
        timeit(f"sym_stair in-kernel {meth} (warm)",
               lambda S_, _P, g_, l_, c=c: pcg_solve(
                   BlockTridiag(S_), g_, l_, config=c),
               S0.blocks, S0.blocks, g0, st.lam)

    # 1b. replace0 variant (safe at K<=128)
    c0 = PCGConfig(exit_tol=tol, max_iter=mi, method="pipelined",
                   preconditioner="symmetric_stair", replace_every=0)
    timeit("sym_stair in-kernel pipelined replace0 (warm)",
           lambda S_, _P, g_, l_: pcg_solve(
               BlockTridiag(S_), g_, l_, config=c0),
           S0.blocks, S0.blocks, g0, st.lam)

    # 2. stair_refined build+solve per step (fixed-S within the step)
    for lv in (1, 2):
        cr = PCGConfig(exit_tol=tol, max_iter=mi, method="pipelined",
                       preconditioner="stair_refined", replace_every=0)

        def refined_bs(S_, _P, g_, l_, lv=lv, cr=cr):
            Pb = precond.stair_refined(BlockTridiag(S_), levels=lv)
            return pcg_solve(BlockTridiag(S_), g_, l_, config=cr,
                             Pinv=Pb)
        timeit(f"stair_refined L={lv} BUILD+solve (warm)", refined_bs,
               S0.blocks, S0.blocks, g0, st.lam, repeats=128)

    # 3. stair_refined solve-only with a PREBUILT Pinv — (a) from the
    #    current S (the per-step fixed-S bound) and (b) from the PREVIOUS
    #    step's S (the lagged-preconditioner reality)
    cr = PCGConfig(exit_tol=tol, max_iter=mi, method="pipelined",
                   preconditioner="stair_refined", replace_every=0)
    for tag, S_src in (("current-S", S0), ("prev-step-S", S_prev)):
        Pb = precond.stair_refined(S_src, levels=1)

        def refined_solve(S_, _P, g_, l_, Pb=Pb):
            return pcg_solve(BlockTridiag(S_), g_, l_, config=cr, Pinv=Pb)
        timeit(f"stair_refined L=1 solve-only, Pinv from {tag}",
               refined_solve, S0.blocks, S0.blocks, g0, st.lam,
               repeats=128)

    # 4. zero-sync fixed budget at the warm iteration count + 1
    c_warm = PCGConfig(exit_tol=tol, max_iter=mi, method="pipelined",
                       preconditioner="symmetric_stair")
    r_warm = pcg_solve(S0, g0, st.lam, config=c_warm)
    budget = int(r_warm.iters) + 1
    cf = PCGConfig(exit_tol=tol, max_iter=budget,
                   method="fixed_pipelined",
                   preconditioner="symmetric_stair")
    timeit(f"sym_stair fixed_pipelined@{budget} (warm)",
           lambda S_, _P, g_, l_: pcg_solve(
               BlockTridiag(S_), g_, l_, config=cf),
           S0.blocks, S0.blocks, g0, st.lam)


if __name__ == "__main__":
    main()
