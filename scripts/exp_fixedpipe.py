"""Round-3 on-chip experiment 2: fixed-budget pipelined mode + build-cost
split for the stair_refined headline route."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp


def main():
    d = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", d)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

    from tpcg import precond
    from tpcg.models import trajopt
    from tpcg.solver import pallas_backend
    from tpcg.types import BlockTridiag
    from tpcg.utils.timing import device_solve_time

    err = lambda *a: print(*a, file=sys.stderr, flush=True)
    err(f"# exp_fixedpipe on {jax.devices()[0]}")
    interp = jax.default_backend() != "tpu"

    S, g = trajopt.iiwa14_scale(knot_points=128)
    l0 = jnp.zeros_like(g)
    Pb_ref = precond.stair_refined(S, levels=1).blocks

    rows = []

    def run(name, fn, repeats=2048):
        r = fn(S.blocks, S.blocks, g, l0)
        t = device_solve_time(fn, S.blocks, S.blocks, g, l0,
                              repeats=repeats)
        rows.append((name, t * 1e6, int(r.iters), bool(r.converged)))
        err(f"{name:58s} {t*1e6:8.2f} us  iters={int(r.iters):3d} "
            f"conv={bool(r.converged)}")
        return t

    # adaptive refined baseline (same session)
    def ref_pipe(S_, P_, g_, l_):
        Pb = precond.stair_refined(BlockTridiag(S_), levels=1).blocks
        return pallas_backend.pcg_pallas(S_, Pb, g_, l_, exit_tol=1e-6,
                                         max_iter=100, method="pipelined",
                                         interpret=interp)
    run("stair_refined L1b3 pipelined (build+solve)", ref_pipe)

    # solve-only: prebuilt Pinv operand (quantifies the build share)
    def ref_pipe_prebuilt(S_, P_, g_, l_):
        return pallas_backend.pcg_pallas(S_, Pb_ref, g_, l_, exit_tol=1e-6,
                                         max_iter=100, method="pipelined",
                                         interpret=interp)
    run("stair_refined L1b3 pipelined (solve only)", ref_pipe_prebuilt)

    # fixed_pipelined at budget = adaptive count + 2 margin
    for budget in (27, 30):
        def ref_fp(S_, P_, g_, l_, budget=budget):
            Pb = precond.stair_refined(BlockTridiag(S_), levels=1).blocks
            return pallas_backend.pcg_pallas(
                S_, Pb, g_, l_, exit_tol=1e-6, max_iter=budget,
                method="fixed_pipelined", interpret=interp)
        run(f"stair_refined L1b3 fixed_pipelined@{budget} (build+solve)",
            ref_fp)

    # in-kernel stair fixed_pipelined (no build in XLA, budget 37)
    def ink_fp(S_, P_, g_, l_):
        return pallas_backend.pcg_pallas(
            S_, None, g_, l_, exit_tol=1e-6, max_iter=37,
            precond="symmetric_stair", method="fixed_pipelined",
            interpret=interp)
    run("in-kernel sym_stair fixed_pipelined@37", ink_fp)

    err("#" * 72)
    for name, t, it, conv in rows:
        err(f"{name:58s} {t:8.2f} us  iters={it:3d} conv={conv}")


if __name__ == "__main__":
    main()
