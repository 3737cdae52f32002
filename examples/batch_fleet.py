"""Parallel-MPC fleet demo: 256 independent iiwa-scale systems in one
fused kernel launch (BASELINE.md config 5 — the capability the reference
cannot express: one system per CUDA launch).

Run: PYTHONPATH=. python examples/batch_fleet.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

import tpcg
from tpcg.models import trajopt


def _timed_call(S, gamma, cfg):
    t0 = time.perf_counter()
    res = tpcg.pcg_solve_batched(S, gamma, config=cfg)
    jax.block_until_ready(res.lam)
    return time.perf_counter() - t0


def main():
    B, n, K = 256, 14, 128
    S, gamma = trajopt.batch_systems(jax.random.PRNGKey(0), B, n, K)
    cfg = tpcg.PCGConfig(exit_tol=1e-6, max_iter=100,
                         preconditioner="symmetric_stair")

    res = tpcg.pcg_solve_batched(S, gamma, config=cfg)
    jax.block_until_ready(res.lam)
    # best-of-3: single host-timed calls on this hardware can absorb a
    # ~30 ms dispatch-phase hit; the rigorous number comes from bench.py
    dt = min(_timed_call(S, gamma, cfg) for _ in range(3))

    # the fleet roll-up a production deployment would log (JSON-ready)
    from tpcg.utils.diagnostics import fleet_summary
    s = fleet_summary(res)
    print(f"{B} systems (n={n}, K={K}): convergence rate "
          f"{s['convergence_rate']:.3f}")
    print(f"iterations: min {s['iters_min']}  median "
          f"{s['iters_median']:.0f}  p75 {s['iters_p75']:.0f}  max "
          f"{s['iters_max']} (straggler #{s['straggler_index']})")
    print(f"wall: {dt*1e3:.1f} ms total, {dt/B*1e6:.1f} us per system "
          f"(single launch, incl. host dispatch)")


if __name__ == "__main__":
    main()
