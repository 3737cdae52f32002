"""Nonlinear trajectory optimization by SQP: planar-quadrotor stabilization.

The FULL MPCGPU stack the reference is the core of (reference
README.md:66-77): linearize nonlinear dynamics (vmapped jacfwd), assemble
the LQR-KKT Schur complement, PCG-solve it with the fused kernel, recover
the primal step, merit line search, repeat. Converges to a dynamically
feasible hover trajectory in a handful of SQP iterations.

Run: PYTHONPATH=. python examples/sqp_quadrotor.py
"""

import jax.numpy as jnp

from tpcg.models.sqp import quadrotor_hover_problem, sqp_solve


def main():
    p = quadrotor_hover_problem(K=32)
    res = sqp_solve(p)

    print(f"{'it':>3s} {'cost':>10s} {'defect':>10s} {'alpha':>6s} "
          f"{'pcg_iters':>9s}")
    for i, h in enumerate(res.history, 1):
        print(f"{i:3d} {h['cost']:10.4f} {h['defect']:10.2e} "
              f"{h['alpha']:6.3f} {h['pcg_iters']:9d}")
    print(f"converged={res.converged} in {res.iterations} SQP iterations; "
          f"final defect {res.defect:.2e}")
    print("terminal state (-> hover at origin):",
          [round(float(v), 4) for v in res.x[-1]])
    assert res.converged and res.defect < 1e-4
    assert float(jnp.max(jnp.abs(res.x[-1][:3]))) < 0.1


if __name__ == "__main__":
    main()
