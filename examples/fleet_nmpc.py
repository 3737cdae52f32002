"""Multi-robot NMPC serving: a fleet of manipulators, one JOINTLY-solved
QP per control period for the whole fleet.

Each robot shares the problem structure (costs, dynamics, horizon) but
carries its own trajectory guess, measured state, and PCG-multiplier warm
start. Per period, the fleet step vmaps the lane-major rigid-body
linearization and LQR-KKT Schur assembly over the robots and solves all B
Schur systems in ONE launch of the lane-packed batched kernel
(tpcg.pcg_solve_batched) — per-iteration scalar latency amortized across
the pack, the serving-throughput shape of the reference's batched design
(interface.cuh solves one system per call; MPCGPU batches at the problem
level).

Run: PYTHONPATH=. python examples/fleet_nmpc.py
"""

import jax
import jax.numpy as jnp
import numpy as np

from tpcg.models import nmpc
from tpcg.models.rigid_body import manipulator_reach_problem
from tpcg.types import PCGConfig


def main():
    B, K = 8, 32
    p = manipulator_reach_problem(K=K, dt=0.01, jac_integrator="heun")
    cfg = PCGConfig(exit_tol=1e-6, max_iter=150,
                    preconditioner="symmetric_stair")
    rng = np.random.default_rng(0)
    # each robot starts from a different perturbed rest configuration
    x0s = jnp.asarray(rng.uniform(-0.3, 0.3, (B, 14)), jnp.float32)

    res = nmpc.simulate_fleet(p, x0s, n_steps=20, config=cfg)

    xs = np.asarray(res.xs)          # (T, B, n)
    iters = np.asarray(res.pcg_iters)  # (T, B)
    print(f"fleet of {B} robots, K={K} horizon, 20 control periods")
    print(f"{'step':>4s} {'max|qd|':>9s} {'pcg max':>7s} {'pcg mean':>8s}")
    for t in range(0, 20, 4):
        qd = np.abs(xs[t][:, 7:]).max()
        print(f"{t:4d} {qd:9.3f} {iters[t].max():7d} "
              f"{iters[t].mean():8.1f}")
    assert np.all(np.isfinite(xs))
    print(f"total inner PCG iterations (all robots): "
          f"{int(res.state.total_pcg_iters)}")


if __name__ == "__main__":
    main()
