"""fp32 example — the tpcg equivalent of the reference's
examples/pcg_solve.cu:9-44: solve the bundled stateSize=2, knotPoints=3
system and print the iteration count and lambda.

Unlike the reference (whose convenience wrapper discards the true iteration
count and returns 1, interface.cuh:88), the printed count here is real.

Run: PYTHONPATH=. python examples/pcg_solve.py
"""

import numpy as np

import tpcg
from tpcg.models import golden


def main():
    S, gamma, lam0 = golden.system()          # the pcg_solve.cu:14-25 data
    config = tpcg.PCGConfig()                 # defaults: tol=1e-6, 25 iters
    res = tpcg.pcg_solve(S, gamma, lam0, config=config)

    print(f"tpcg returned in {int(res.iters)} iters "
          f"(converged={bool(res.converged)}).")
    print("Lambda:")
    print(" ".join(f"{v:g}" for v in np.asarray(res.lam).reshape(-1)))


if __name__ == "__main__":
    main()
