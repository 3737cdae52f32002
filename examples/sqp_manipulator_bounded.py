"""Torque-limited nonlinear manipulator trajectory optimization — the
reference's benchmark domain (MPCGPU drives an iiwa14 arm, reference
README.md:66-77) at its benchmark shape (n=14 states, m=7 torques), with
the two layers the reference leaves to its consumer supplied by tpcg:

* nonlinear rigid-body dynamics via Lagrangian autodiff
  (tpcg/models/rigid_body.py, approximate iiwa14-class chain),
* control box bounds via the augmented-Lagrangian SQP wrapper
  (tpcg.models.sqp.sqp_solve_bounded) — PHR penalty inside the
  Gauss-Newton QP, multiplier updates outside.

Every inner QP is PCG-solved through the fused Pallas kernel on TPU.

Run: PYTHONPATH=. python examples/sqp_manipulator_bounded.py
"""

import numpy as np

from tpcg.models.rigid_body import manipulator_reach_problem
from tpcg.models.sqp import sqp_solve, sqp_solve_bounded


def main():
    p = manipulator_reach_problem(K=16, dt=0.03)

    free = sqp_solve(p, max_sqp_iters=15, defect_tol=1e-3, step_tol=1e-3)
    u_peak = float(np.abs(np.asarray(free.u)).max())
    print(f"unconstrained: defect {free.defect:.2e}, peak |torque| "
          f"{u_peak:.1f} Nm")

    # clamp torques below the unconstrained peak so the bound binds
    u_max = 0.6 * u_peak
    res = sqp_solve_bounded(p, -u_max, u_max, viol_tol=1e-3,
                            defect_tol=1e-3, step_tol=1e-3)
    print(f"{'outer':>5s} {'violation':>10s} {'rho':>8s} {'defect':>10s}")
    for i, h in enumerate(res.history, 1):
        print(f"{i:5d} {h['violation']:10.2e} {h['rho']:8.1f} "
              f"{h['defect']:10.2e}")
    print(f"bounded: converged={res.converged}, max violation "
          f"{res.max_violation:.2e}, defect {res.defect:.2e}, peak "
          f"|torque| {float(np.abs(np.asarray(res.u)).max()):.1f} "
          f"(limit {u_max:.1f})")
    assert res.max_violation < 1e-2
    assert float(np.abs(np.asarray(res.u)).max()) <= u_max * 1.01


if __name__ == "__main__":
    main()
