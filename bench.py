"""tpcg benchmark harness.

Prints ONE JSON line to stdout:
  {"metric": ..., "value": N, "unit": "us", "vs_baseline": N}

Headline metric (BASELINE.md): per-solve wall-time at iiwa14 scale
(stateSize=14, knotPoints=128, fp32, symmetric-stair preconditioner,
tol=1e-6) through the fused Pallas kernel on one TPU core, measured as
device throughput (chained dependent solves in one executable — the analog
of the reference's device-resident expert-path latency, SURVEY.md §3.3;
host dispatch on this remote-attached chip is reported separately and is
transport noise, not solver cost).

``vs_baseline``: the reference repo publishes no numbers (BASELINE.json
``published: {}``), so the baseline is the strongest same-chip alternative a
JAX user would otherwise write — the pure-XLA ``lax.while_loop`` solver
(tpcg's jnp backend) on identical inputs, measured identically. Reported as
speedup (baseline_time / fused_time; > 1 means the fused kernel is faster).

A detail table for every BASELINE.md config goes to stderr.
"""

from __future__ import annotations

import functools
import json
import sys

import jax
import jax.numpy as jnp
import numpy as np


def _enable_compile_cache():
    """Persistent compilation cache: the remote TPU compile helper costs
    ~20-40s per executable; caching makes bench reruns cheap."""
    import os
    d = os.environ.get("TPCG_COMPILE_CACHE",
                       os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                    ".jax_cache"))
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception as e:  # cache is an optimization, never fatal
        print(f"# compile cache disabled: {e}", file=sys.stderr)


def main():
    _enable_compile_cache()
    from tpcg import precond
    from tpcg.models import golden, trajopt
    from tpcg.solver import jnp_backend, pallas_backend
    from tpcg.utils.timing import device_solve_time, wall_time

    on_tpu = jax.default_backend() == "tpu"
    interp = not on_tpu
    err = lambda *a: print(*a, file=sys.stderr, flush=True)
    err(f"# tpcg bench on {jax.devices()[0]} (pallas interpret={interp})")

    def fused_fn(tol, mi):
        def f(S, P, g, l):
            return pallas_backend.pcg_pallas(S, P, g, l, exit_tol=tol,
                                             max_iter=mi, interpret=interp)
        return f

    def xla_fn(tol, mi):
        def f(S, P, g, l):
            return jnp_backend.pcg_jnp(S, P, g, l, exit_tol=tol, max_iter=mi,
                                       identity_pinv=False)
        return f

    rows = []

    def run_config(name, S, gamma, pre, tol=1e-6, mi=100, repeats=256):
        if pre == "identity":
            # chained timer needs a concrete Pinv operand; identity as cbtd
            Pb = precond.identity(S).blocks
        else:
            Pb = precond.build(S, pre).blocks
        l0 = jnp.zeros_like(gamma)
        res = pallas_backend.pcg_pallas(S.blocks, Pb, gamma, l0,
                                        exit_tol=tol, max_iter=mi,
                                        interpret=interp)
        t_f = device_solve_time(fused_fn(tol, mi), S.blocks, Pb, gamma, l0,
                                repeats=repeats)
        t_x = device_solve_time(xla_fn(tol, mi), S.blocks, Pb, gamma, l0,
                                repeats=repeats)
        rows.append((name, t_f * 1e6, int(res.iters), bool(res.converged),
                     t_x * 1e6))
        return t_f, t_x

    # configs 1+2: bundled golden example (BASELINE.md)
    S, g, _ = golden.system()
    run_config("golden n=2 K=3 identity", S, g, "identity", mi=25)
    run_config("golden n=2 K=3 sym_stair", S, g, "symmetric_stair", mi=25)

    # config 3: quadrotor scale
    S, g = trajopt.quadrotor_scale(knot_points=64)
    run_config("quadrotor n=12 K=64 block_jacobi", S, g, "block_jacobi")
    run_config("quadrotor n=12 K=64 sym_stair", S, g, "symmetric_stair")

    # config 4: iiwa14 scale (headline at K=128) + K=32, K=512
    headline_fused = headline_xla = None
    for K in (32, 128, 512):
        S, g = trajopt.iiwa14_scale(knot_points=K)
        t_f, t_x = run_config(f"iiwa14 n=14 K={K} sym_stair", S, g,
                              "symmetric_stair")
        if K == 128:
            headline_fused, headline_xla = t_f, t_x
            # fully-fused variant: preconditioner CONSTRUCTED inside the
            # solve kernel (Gauss-Jordan on VPU) — the end-to-end MPC step
            def fused_ink(S_, P_, g_, l_):
                return pallas_backend.pcg_pallas(
                    S_, None, g_, l_, exit_tol=1e-6, max_iter=100,
                    precond="symmetric_stair", interpret=interp)
            r_ink = fused_ink(S.blocks, None, g, jnp.zeros_like(g))
            t_ink = device_solve_time(fused_ink, S.blocks, S.blocks, g,
                                      jnp.zeros_like(g))
            rows.append(("iiwa14 K=128 in-kernel build+solve", t_ink * 1e6,
                         int(r_ink.iters), bool(r_ink.converged),
                         float("nan")))

            # pipelined method (one scalar sync point per iteration)
            def fused_pipe(S_, P_, g_, l_):
                return pallas_backend.pcg_pallas(
                    S_, None, g_, l_, exit_tol=1e-6, max_iter=100,
                    precond="symmetric_stair", method="pipelined",
                    interpret=interp)
            r_pipe = fused_pipe(S.blocks, None, g, jnp.zeros_like(g))
            t_pipe = device_solve_time(fused_pipe, S.blocks, S.blocks, g,
                                       jnp.zeros_like(g))
            rows.append(("iiwa14 K=128 pipelined build+solve", t_pipe * 1e6,
                         int(r_pipe.iters), bool(r_pipe.converged),
                         float("nan")))
            # only build-INCLUDED variants qualify for the headline (the
            # metric text says 'incl. in-kernel construction')
            headline_best = min(t_ink, t_pipe)
            # single-call host-side latency (includes dispatch transport)
            one = fused_fn(1e-6, 100)
            disp = wall_time(one, S.blocks,
                             precond.build(S, "symmetric_stair").blocks, g,
                             jnp.zeros_like(g), warmup=3, reps=20)
            rows.append(("iiwa14 K=128 single-call host latency",
                         disp * 1e6, -1, True, float("nan")))

    # config 5: 256-system batch, n=14, K=128 — grid-batched fused kernel,
    # pipelined method, preconditioner built in-kernel per system (the
    # fastest fleet configuration: measured 40% over classic)
    B, n, K = 256, 14, 128
    Sb, gb = trajopt.batch_systems(jax.random.PRNGKey(0), B, n, K)
    l0 = jnp.zeros_like(gb)

    def fused_batch(S, P, g, l):
        return pallas_backend.pcg_pallas_batched(
            S, None, g, l, exit_tol=1e-6, max_iter=100,
            precond="symmetric_stair", method="pipelined",
            interpret=interp)

    r_b = fused_batch(Sb.blocks, None, gb, l0)
    t_b = device_solve_time(fused_batch, Sb.blocks, Sb.blocks, gb, l0,
                            repeats=16, lo_repeats=4, reps=8)
    rows.append((f"batch B={B} n=14 K=128 pipelined in-kernel (per-system)",
                 t_b * 1e6 / B, int(np.asarray(r_b.iters).max()),
                 bool(np.asarray(r_b.converged).all()), float("nan")))

    err(f"{'config':48s} {'fused_us':>10s} {'iters':>6s} {'conv':>5s} "
        f"{'xla_us':>10s}")
    for name, tf, it, cv, tx in rows:
        err(f"{name:48s} {tf:10.1f} {it:6d} {str(cv):>5s} {tx:10.1f}")

    print(json.dumps({
        "metric": "iiwa14 per-solve device time to 1e-6 (n=14, K=128, fp32, "
                  "symmetric-stair incl. in-kernel construction; best of "
                  "classic/pipelined fused Pallas kernels; baseline = "
                  "pure-XLA while_loop PCG on the same chip)",
        "value": round(headline_best * 1e6, 2),
        "unit": "us",
        "vs_baseline": round(headline_xla / headline_best, 3),
    }))


if __name__ == "__main__":
    main()
