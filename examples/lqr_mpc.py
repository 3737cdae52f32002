"""End-to-end receding-horizon LQR MPC at iiwa14 scale.

The complete path the reference only provides the middle of:
problem data -> Schur complement assembly (tpcg.models.lqr_kkt) ->
fused PCG solve (warm-started across steps) -> primal trajectory.

Run: PYTHONPATH=. python examples/lqr_mpc.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import tpcg
from tpcg.models import lqr_kkt, mpc


def main():
    n, m, K, steps = 14, 7, 64, 8
    cfg = tpcg.PCGConfig(exit_tol=1e-8, max_iter=200,
                         preconditioner="symmetric_stair")
    p = lqr_kkt.random_lqr(jax.random.PRNGKey(0), n, m, K,
                           dtype=jnp.float32)

    state = mpc.init_state(K, n)
    x_init = p.x_init
    for step in range(steps):
        p = p._replace(x_init=x_init)
        S, gamma = lqr_kkt.schur_system(p)
        state, res = mpc.mpc_step(state, S, gamma, cfg, shift=False)
        x, u = lqr_kkt.recover_primal(p, res.lam)
        # apply the first control, roll the horizon forward one step
        x_init = p.A[0] @ x[0] + p.B[0] @ u[0] + p.c[0]
        print(f"step {step}: {int(res.iters):3d} PCG iters | "
              f"|u_0| = {float(jnp.linalg.norm(u[0])):.3f} | "
              f"|x_init| = {float(jnp.linalg.norm(x_init)):.3f} | "
              f"converged={bool(res.converged)}")
    print(f"total PCG iterations across {steps} MPC steps: "
          f"{int(state.total_iters)}")


if __name__ == "__main__":
    main()
