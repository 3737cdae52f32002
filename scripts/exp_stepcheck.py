"""Consistency check: full heun RTI step vs linearize-only vs reuse-only,
interleaved twice in ONE process, identical chain parameters."""
import os, sys
sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
jax.config.update("jax_enable_x64", True)
import jax.numpy as jnp
from tpcg.models import nmpc
from tpcg.models.rigid_body import manipulator_reach_problem
from tpcg.types import PCGConfig, PCGResult
from tpcg.utils.timing import device_solve_time

p_n = manipulator_reach_problem(K=128, dt=0.01)
cfg = PCGConfig(exit_tol=1e-8, max_iter=200,
                preconditioner="symmetric_stair", method="pipelined")
sim = nmpc.simulate(p_n, p_n.x_init, n_steps=4, config=cfg)
st = sim.state
g = jnp.broadcast_to(st.X[0], st.X.shape)

p_h = manipulator_reach_problem(K=128, dt=0.01, jac_integrator="heun")
qp_h, _ = nmpc.rti_setup(p_h, config=cfg)
lin, qp_reuse, _d = nmpc.rti_setup_lagged(p_h, config=cfg)
A0, B0 = lin(st.X, st.U)

def step_fn(X_, U_, g_, l_):
    dx, du, res = qp_h(X_ + g_ * 1e-20, U_, g_[0], l_)
    return res

def lin_fn(X_, _B, g_, l_):
    A, B = lin(X_ + g_ * 1e-20, st.U)
    return PCGResult(lam=l_ + 0.0 * g_, iters=jnp.int32(0),
                     converged=jnp.bool_(True),
                     eta=jnp.sum(A) + jnp.sum(B))

def reuse_fn(A_, B_, g_, l_):
    eps = g_[0, 0] - g[0, 0]
    dx, du, res = qp_reuse(st.X + g_ * 1e-20, st.U, g_[0], l_, A_, B_ + eps)
    return res

r = step_fn(st.X, st.U, g, st.lam); print("step iters:", int(r.iters), file=sys.stderr)
for rnd in range(2):
    for name, fn, args in (
        ("full heun step", step_fn, (st.X, st.U, g, st.lam)),
        ("linearize only", lin_fn, (st.X, B0, g, st.lam)),
        ("reuse (rollout+QP)", reuse_fn, (A0, B0, g, st.lam)),
    ):
        t = device_solve_time(fn, *args, repeats=128, lo_repeats=16, reps=5)
        print(f"round{rnd} {name:24s} {t*1e6:8.1f} us", file=sys.stderr)
