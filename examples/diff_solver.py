"""Differentiable solver demo: gradients THROUGH the PCG solve.

Implicit differentiation (tpcg.pcg_solve_grad) makes the solver a JAX
citizen: the backward pass is one more PCG solve, so gradients of any
scalar function of the multipliers w.r.t. the system matrix and right-hand
side are exact at the fixed point. Here: tune gamma by gradient descent so
the solution matches a target — the building block of learning-based MPC.

Run: PYTHONPATH=. python examples/diff_solver.py
"""

import jax
import jax.numpy as jnp

import tpcg


def main():
    n, K = 8, 32
    # well-conditioned SPD system so plain gradient descent converges fast
    # (the loss Hessian is S^-2; heavy diagonal keeps its spectrum tame)
    S = tpcg.random_spd_cbtd(jax.random.PRNGKey(0), n, K, diag_boost=5.0)
    gamma0 = jax.random.normal(jax.random.PRNGKey(1), (K, n),
                               dtype=S.dtype)
    cfg = tpcg.PCGConfig(exit_tol=1e-8, max_iter=200,
                         preconditioner="symmetric_stair")
    lam_target = tpcg.pcg_solve(S, gamma0, config=cfg).lam

    def loss(gamma):
        lam = tpcg.pcg_solve_grad(S, gamma, config=cfg)
        return 0.5 * jnp.sum((lam - lam_target) ** 2)

    grad_fn = jax.jit(jax.value_and_grad(loss))

    # The loss is quadratic with Hessian S^-2, so a single Newton step
    # Delta = -S^2 grad recovers gamma exactly — IF the implicit gradient
    # is exact. That's the demonstration.
    from tpcg.ops.bdmv import bdmv

    gamma = jnp.zeros_like(gamma0)
    val0, g = grad_fn(gamma)
    gamma = gamma - bdmv(S.blocks, bdmv(S.blocks, g))
    val1, _ = grad_fn(gamma)
    rel = float(jnp.linalg.norm(gamma - gamma0) / jnp.linalg.norm(gamma0))
    print(f"loss before Newton step: {float(val0):.6e}")
    print(f"loss after one Newton step (using the implicit gradient): "
          f"{float(val1):.3e}")
    print(f"recovered gamma relative error: {rel:.3e}")


if __name__ == "__main__":
    main()
