"""Lagged-Jacobian RTI serving: refresh the trajectory linearization every
k-th control step, reuse (shift) it in between, recompute defects exactly
every step.

The NMPC control step at iiwa14 scale is linearize-bound (~250 µs of the
~300 µs heun step is the tangent pass, scripts/exp_stepcheck.py). Stale
Jacobians perturb only the Gauss-Newton step OPERATOR — the defect
right-hand side, recomputed exactly each step through the lane-major
primal rollout (``TrajOptProblem.rollout``), pins the solution manifold —
so a k=4 refresh cadence serves at ~140 µs/step amortized (~2x the
per-step-refresh loop) with closed-loop trajectories matching the
exact-refresh loop (tests/test_nmpc.py).

Reference parity note: the CUDA reference's consumer (MPCGPU,
/root/reference/README.md:66-77) re-linearizes every control step; the
lagged mode is a TPU-era serving extension on top of that contract, with
the exact-refresh loop (``jac_refresh_every=1``, the default) preserving
the reference semantics.

Run: PYTHONPATH=. python examples/lagged_nmpc.py
"""

import numpy as np

from tpcg.models import nmpc
from tpcg.models.rigid_body import manipulator_reach_problem
from tpcg.types import PCGConfig


def main():
    K = 32  # keep the example quick; serving runs use K=128
    cfg = PCGConfig(exit_tol=1e-6, max_iter=150,
                    preconditioner="symmetric_stair", method="pipelined")
    p = manipulator_reach_problem(K=K, dt=0.01)

    exact = nmpc.simulate(p, p.x_init, n_steps=12, config=cfg)
    lag = nmpc.simulate(p, p.x_init, n_steps=12, config=cfg,
                        jac_refresh_every=4)

    xs_e, xs_l = np.asarray(exact.xs), np.asarray(lag.xs)
    print(f"{'step':>4s} {'|dq| exact':>11s} {'|dq| lagged':>12s} "
          f"{'traj diff':>10s} {'it_e':>5s} {'it_l':>5s}")
    for t in range(0, 12, 2):
        print(f"{t:4d} {np.abs(xs_e[t][:7]).max():11.4f} "
              f"{np.abs(xs_l[t][:7]).max():12.4f} "
              f"{np.abs(xs_l[t] - xs_e[t]).max():10.2e} "
              f"{int(exact.pcg_iters[t]):5d} {int(lag.pcg_iters[t]):5d}")

    drift = np.abs(xs_l - xs_e).max()
    scale = max(1.0, np.abs(xs_e).max())
    print(f"\nmax closed-loop divergence vs exact refresh: {drift:.3e} "
          f"(relative {drift / scale:.2e})")
    assert drift / scale < 2e-2
    assert np.all(np.isfinite(xs_l))
    print("lagged loop tracks the exact-refresh loop; on reuse steps the "
          "control period costs rollout + QP core instead of "
          "linearize + QP core.")


if __name__ == "__main__":
    main()
