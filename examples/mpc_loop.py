"""Receding-horizon MPC demo: warm-started solves at iiwa14 scale.

The usage pattern the reference was built for (SURVEY.md §3.3): problem data
stays device-resident across MPC steps, each solve warm-starts from the
previous multipliers, and only scalar diagnostics come back to the host.

Run: PYTHONPATH=. python examples/mpc_loop.py
"""

import jax
import jax.numpy as jnp

import tpcg
from tpcg.models import mpc, trajopt


def main():
    n, K, steps = 14, 128, 10
    cfg = tpcg.PCGConfig(exit_tol=1e-6, max_iter=100,
                         preconditioner="symmetric_stair")
    S, gamma0 = trajopt.iiwa14_scale(knot_points=K)

    state = mpc.init_state(K, n)
    cold_iters = warm_iters = 0
    for step in range(steps):
        gamma = gamma0 + 0.02 * step  # slowly drifting target
        state, res = mpc.mpc_step(state, S, gamma, cfg, shift=False)
        warm_iters += int(res.iters)
        cold = tpcg.pcg_solve(S, gamma, config=cfg)
        cold_iters += int(cold.iters)
        print(f"step {step}: warm {int(res.iters):3d} iters | "
              f"cold {int(cold.iters):3d} iters | "
              f"converged={bool(res.converged)}")
    print(f"total: warm {warm_iters} vs cold {cold_iters} iters "
          f"({100 * (1 - warm_iters / cold_iters):.0f}% saved)")


if __name__ == "__main__":
    main()
