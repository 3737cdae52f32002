"""Round-3 on-chip experiment: materialized stair_refined preconditioner
vs the round-2 headline (in-kernel symmetric-stair build+solve).

NOTE: the numbers this script originally produced (stair_refined
build+solve 10.59 µs etc., quoted in docs/ROADMAP.md item 9) were
measured BEFORE tpcg/utils/timing.py learned to perturb S per chained
solve — XLA hoisted the S-only banded build out of the chain, so those
"build included" figures timed solve-only. Re-running it now (the timer
is fixed) gives the honest picture: build+solve ~130 µs.

Usage: python scripts/exp_refined.py   (on the TPU)
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import os
    d = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tpcg import precond
    from tpcg.models import trajopt
    from tpcg.solver import pallas_backend
    from tpcg.utils.timing import device_solve_time

    err = lambda *a: print(*a, file=sys.stderr, flush=True)
    err(f"# exp_refined on {jax.devices()[0]}")
    interp = jax.default_backend() != "tpu"

    S, g = trajopt.iiwa14_scale(knot_points=128)
    l0 = jnp.zeros_like(g)

    rows = []

    def run(name, fn, repeats=2048):
        r = fn(S.blocks, S.blocks, g, l0)
        t = device_solve_time(fn, S.blocks, S.blocks, g, l0,
                              repeats=repeats)
        rows.append((name, t * 1e6, int(r.iters), bool(r.converged)))
        err(f"{name:55s} {t*1e6:8.2f} us  iters={int(r.iters):3d} "
            f"conv={bool(r.converged)}")
        return t

    # round-2 headline variants (baselines)
    for meth in ("classic", "pipelined"):
        def ink(S_, P_, g_, l_, meth=meth):
            return pallas_backend.pcg_pallas(
                S_, None, g_, l_, exit_tol=1e-6, max_iter=100,
                precond="symmetric_stair", method=meth, interpret=interp)
        run(f"in-kernel sym_stair {meth}", ink)

    # materialized refined: build INSIDE the timed fn (S changes per MPC
    # step, so the build is part of the per-solve cost)
    for levels, band in [(1, 3), (1, 2), (2, 5), (2, 3), (3, 4)]:
        for meth in ("classic", "pipelined"):
            def ref_fn(S_, P_, g_, l_, levels=levels, band=band, meth=meth):
                from tpcg.types import BlockTridiag
                Pb = precond.stair_refined(BlockTridiag(S_), levels=levels,
                                           band=band).blocks
                return pallas_backend.pcg_pallas(
                    S_, Pb, g_, l_, exit_tol=1e-6, max_iter=100,
                    method=meth, interpret=interp)
            run(f"stair_refined L={levels} band={band} {meth} (build+solve)",
                ref_fn)

    err("#" * 70)
    for name, t, it, conv in rows:
        err(f"{name:55s} {t:8.2f} us  iters={it:3d} conv={conv}")


if __name__ == "__main__":
    main()
