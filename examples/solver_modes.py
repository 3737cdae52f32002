"""Round-3 solver modes on one small system: the materialized
stair_refined preconditioner, the bounded-latency fixed_pipelined mode,
the speculative sweep+top-up mode, and the compensated double-float
kernel for deep tolerances.

Run: PYTHONPATH=. python examples/solver_modes.py
"""

import jax
import jax.numpy as jnp
import numpy as np

import tpcg


def main():
    n, K = 6, 24
    S = tpcg.random_spd_cbtd(jax.random.PRNGKey(0), n, K)
    gamma = jax.random.normal(jax.random.PRNGKey(1), (K, n), jnp.float32)
    x_true = np.linalg.solve(np.asarray(S.dense(), np.float64),
                             np.asarray(gamma, np.float64).reshape(-1))

    def report(name, res):
        err = np.abs(np.asarray(res.lam, np.float64).reshape(-1)
                     - x_true).max()
        print(f"{name:42s} iters={int(np.max(np.asarray(res.iters))):3d} "
              f"converged={bool(np.all(np.asarray(res.converged)))} "
              f"max|err|={err:.2e}")

    # adaptive, plain symmetric-stair (the round-2 headline config)
    report("symmetric_stair pipelined", tpcg.pcg_solve(
        S, gamma, config=tpcg.PCGConfig(
            exit_tol=1e-7, max_iter=100,
            preconditioner="symmetric_stair", method="pipelined")))

    # adaptive, MATERIALIZED refined-stair (round-3 headline: fewer
    # iterations at one-banded-SpMV apply cost)
    report("stair_refined pipelined", tpcg.pcg_solve(
        S, gamma, config=tpcg.PCGConfig(
            exit_tol=1e-7, max_iter=100,
            preconditioner="stair_refined", method="pipelined")))

    # bounded latency: exactly 30 passes, zero in-loop sync points,
    # post-hoc convergence verification
    report("fixed_pipelined @30", tpcg.pcg_solve(
        S, gamma, config=tpcg.PCGConfig(
            exit_tol=1e-7, max_iter=30,
            preconditioner="stair_refined", method="fixed_pipelined")))

    # speculative: a zero-sync sweep sized from a warm-start iteration
    # history, then an adaptive top-up to tolerance
    report("speculative (budget 20)", tpcg.pcg_solve(
        S, gamma, config=tpcg.PCGConfig(
            exit_tol=1e-7, max_iter=100, spec_budget=20,
            preconditioner="stair_refined", method="speculative")))

    # deep tolerance: f32 storage, double-float accumulation (fp64-grade
    # iterates on TPU hardware; see tpcg/ops/df.py for the CPU caveat)
    report("compensated DF @ tol 1e-12", tpcg.pcg_solve(
        S, gamma, config=tpcg.PCGConfig(
            exit_tol=1e-12, max_iter=100,
            preconditioner="symmetric_stair", accumulate="compensated")))


if __name__ == "__main__":
    main()
