"""Closed-loop nonlinear MPC on the planar quadrotor — the full real-time
pipeline the reference's solver is built for (MPCGPU, reference
README.md:66-77): every control period runs ONE warm-started Gauss-Newton
QP (PCG-solving the LQR-KKT Schur complement through the fused Pallas
kernel on TPU) and applies the first control.

Prints the closed-loop trace plus the per-step control latency after the
loop settles (all pieces jitted once — steady-state steps are pure device
execution).

Run: PYTHONPATH=. python examples/nmpc_quadrotor.py
"""

import time

import jax
import numpy as np

from tpcg.models import nmpc
from tpcg.models.sqp import quadrotor_hover_problem


def main():
    p = quadrotor_hover_problem(K=16)
    res = nmpc.simulate(p, p.x_init, n_steps=60)

    xs = np.asarray(res.xs)
    print(f"{'step':>4s} {'|pos|':>8s} {'tilt':>8s} {'pcg_it':>6s} "
          f"{'defect':>9s}")
    for t in range(0, 60, 6):
        print(f"{t:4d} {np.abs(xs[t][:2]).max():8.4f} {xs[t][2]:8.4f} "
              f"{int(res.pcg_iters[t]):6d} {float(res.defects[t]):9.2e}")
    assert np.abs(xs[-1][:3]).max() < 0.05

    # settled-phase control latency: re-run a single rti_step on the final
    # carried state (jit-compiled already), best-of to shed dispatch noise
    qp, _ = nmpc.rti_setup(p)
    state = res.state
    x = res.xs[-1]
    times = []
    for _ in range(20):
        t0 = time.perf_counter()
        _, u0, r = nmpc.rti_step(qp, state, x)
        jax.block_until_ready(u0)
        times.append(time.perf_counter() - t0)
    print(f"hovering; settled control step (1 QP, warm PCG "
          f"{int(r.iters)} iters): {min(times)*1e3:.2f} ms host round-trip")
    print("NOTE: on a remote-attached chip this is transport-dominated "
          "(the relay adds ~ms-scale dispatch phases; CLAUDE.md). Device "
          "solve time for the inner PCG at this scale is tens of us — "
          "see bench.py / docs/DESIGN.md §6 for the honest measurement "
          "methodology.")


if __name__ == "__main__":
    main()
