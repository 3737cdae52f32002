"""fp64 example — the tpcg equivalent of the reference's
examples/pcg_solve_dp.cu (same 2x3 system in double precision), with a
symmetric-stair preconditioner (BASELINE.md config 2).

f64 uses the XLA while-loop backend (TPU Pallas is f32-native).

Run: PYTHONPATH=. python examples/pcg_solve_dp.py
"""

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

import tpcg  # noqa: E402
from tpcg.models import golden  # noqa: E402


def main():
    S, gamma, lam0 = golden.system(dtype=jnp.float64)
    config = tpcg.PCGConfig(exit_tol=1e-12, max_iter=25,
                            preconditioner="symmetric_stair")
    res = tpcg.pcg_solve(S, gamma, lam0, config=config, backend="jnp")

    print(f"tpcg (fp64) returned in {int(res.iters)} iters "
          f"(converged={bool(res.converged)}).")
    print("Lambda:")
    print(" ".join(f"{v:.10g}" for v in np.asarray(res.lam).reshape(-1)))
    truth = np.asarray(golden.dense_solution()).reshape(-1)
    err = np.abs(np.asarray(res.lam).reshape(-1) - truth).max()
    print(f"max |error| vs dense solve: {err:.3e}")


if __name__ == "__main__":
    main()
