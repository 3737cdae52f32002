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
    # x64 enabled up front for BASELINE config 2 (fp64 golden); every other
    # config builds its arrays with explicit f32 dtypes
    jax.config.update("jax_enable_x64", True)
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

    def run_config(name, S, gamma, pre, tol=1e-6, mi=100, repeats=2048):
        # repeats sizes the chained-solve executable: short chains (256 was
        # used here once) put only ~1-5 ms of device work between the
        # two-point samples, which the relay's multi-minute ~30 ms
        # dispatch phases can swamp — observed as a bogus 2.5 us for a
        # 30-iteration solve that really takes ~19 us. 2048 dependent
        # solves keep the slope signal well above the phase noise.
        err(f"# running: {name}")
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

    # config 1: bundled golden example, fp32 (BASELINE.md)
    S, g, _ = golden.system()
    run_config("golden n=2 K=3 identity", S, g, "identity", mi=25)
    run_config("golden n=2 K=3 sym_stair", S, g, "symmetric_stair", mi=25)

    # config 2: golden example, fp64 (examples/pcg_solve_dp.cu shape).
    # The fused kernel is f32-native; fp64 runs the jnp/XLA backend on the
    # TPU's emulated f64 path. f64 linalg.inv is unsupported by the TPU
    # compiler, so the symmetric-stair Phi^-1 is BUILT on the host CPU and
    # shipped as an explicit operand — the honest split of the fp64 story.
    err("# running: golden fp64")
    if True:  # scoped block for the fp64 config's locals
        from tpcg.types import BlockTridiag
        S64 = jnp.asarray(np.asarray(S.blocks), jnp.float64)
        g64 = jnp.asarray(np.asarray(g), jnp.float64)
        l64 = jnp.zeros_like(g64)
        with jax.default_device(jax.devices("cpu")[0]):
            P64 = jnp.asarray(np.asarray(
                precond.build(BlockTridiag(S64), "symmetric_stair").blocks))
        f64_fn = lambda S_, P_, g_, l_: jnp_backend.pcg_jnp(
            S_, P_, g_, l_, exit_tol=1e-12, max_iter=25)
        r64 = f64_fn(S64, P64, g64, l64)
        t64 = device_solve_time(f64_fn, S64, P64, g64, l64, repeats=256)
        rows.append(("golden n=2 K=3 fp64 sym_stair (jnp/XLA)", t64 * 1e6,
                     int(r64.iters), bool(r64.converged), float("nan")))

        # round-3 (VERDICT r2 item 4): the compensated double-float kernel
        # serves the same deep-tolerance capability IN-KERNEL at f32
        # storage (fp64-grade iterates measured on chip: 5.6e-14 relative
        # at tol 1e-24, tests/test_tpu_hardware.py) — same config, same
        # tolerance, vs the 400+ us emulated-f64 XLA fallback above
        def comp_fn(S_, P_, g_, l_):
            r = pallas_backend.pcg_pallas_compensated(
                S_, None, g_, l_, exit_tol=1e-12, max_iter=25,
                precond="symmetric_stair", interpret=interp)
            # f32 lam keeps the timing chain's carry dtype stable (the f64
            # recombination is the API's job; timing measures the kernel)
            return r._replace(lam=r.lam.astype(S_.dtype))
        r_c = comp_fn(S.blocks, S.blocks, g, jnp.zeros_like(g))
        t_c = device_solve_time(comp_fn, S.blocks, S.blocks, g,
                                jnp.zeros_like(g), repeats=2048)
        rows.append(("golden n=2 K=3 compensated-DF kernel (tol 1e-12)",
                     t_c * 1e6, int(r_c.iters), bool(r_c.converged),
                     t64 * 1e6))

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

            # pipelined + residual-replacement cadence OFF: at K=128 the
            # recurrence drift never reaches the 1e-6 exit band (iterates
            # and true residual IDENTICAL to cadence 25 at K<=128;
            # replacement IS required at K=512 — measured divergence), so
            # dropping the in-loop guard is valid here and saves ~2 us.
            def fused_pipe0(S_, P_, g_, l_):
                import tpcg
                from tpcg.types import BlockTridiag, PCGConfig
                return tpcg.pcg_solve(
                    BlockTridiag(S_), g_, l_,
                    config=PCGConfig(exit_tol=1e-6, max_iter=100,
                                     preconditioner="symmetric_stair",
                                     method="pipelined", replace_every=0))
            r_p0 = fused_pipe0(S.blocks, None, g, jnp.zeros_like(g))
            t_p0 = device_solve_time(fused_pipe0, S.blocks, S.blocks, g,
                                     jnp.zeros_like(g))
            rows.append(("iiwa14 K=128 pipelined replace0 build+solve",
                         t_p0 * 1e6, int(r_p0.iters),
                         bool(r_p0.converged), float("nan")))

            # MATERIALIZED refined-stair preconditioner (stair_refined
            # L=1 band 3): fewer iterations (25 vs 35) but the XLA-level
            # build is ~130 us/solve — NOT a single-solve route. (An
            # earlier round-3 claim of 10.6 us here was a measurement
            # artifact: the chained timer nudged only gamma, so XLA's
            # while-loop invariant code motion hoisted the S-only build
            # out of the chain. chain_solves now nudges S too; see
            # tpcg/utils/timing.py.) The row stays as the honest record;
            # the build amortizes legitimately only when S is FIXED
            # across solves (multi-RHS, implicit-diff) — measured
            # ~28 us/solve in that regime.
            def fused_ref(S_, P_, g_, l_):
                import tpcg
                from tpcg.types import BlockTridiag, PCGConfig
                return tpcg.pcg_solve(
                    BlockTridiag(S_), g_, l_,
                    config=PCGConfig(exit_tol=1e-6, max_iter=100,
                                     preconditioner="stair_refined",
                                     method="pipelined",
                                     replace_every=0))
            r_ref = fused_ref(S.blocks, None, g, jnp.zeros_like(g))
            t_ref = device_solve_time(fused_ref, S.blocks, S.blocks, g,
                                      jnp.zeros_like(g), repeats=512,
                                      lo_repeats=64)
            rows.append(("iiwa14 K=128 stair_refined build+solve",
                         t_ref * 1e6, int(r_ref.iters),
                         bool(r_ref.converged), float("nan")))

            # zero-sync bounded-latency mode (NOT headline-eligible: a
            # fixed-budget contract, not the adaptive-tolerance one):
            # budget = the adaptive count + 1 margin, in-kernel stair
            budget_fp = int(r_pipe.iters) + 1

            def fused_fp(S_, P_, g_, l_):
                import tpcg
                from tpcg.types import BlockTridiag, PCGConfig
                return tpcg.pcg_solve(
                    BlockTridiag(S_), g_, l_,
                    config=PCGConfig(exit_tol=1e-6, max_iter=budget_fp,
                                     preconditioner="symmetric_stair",
                                     method="fixed_pipelined"))
            r_fp = fused_fp(S.blocks, None, g, jnp.zeros_like(g))
            t_fp = device_solve_time(fused_fp, S.blocks, S.blocks, g,
                                     jnp.zeros_like(g))
            rows.append((f"iiwa14 K=128 sym_stair fixed_pipelined@"
                         f"{budget_fp}", t_fp * 1e6, int(r_fp.iters),
                         bool(r_fp.converged), float("nan")))
            # only build-INCLUDED variants qualify for the headline (the
            # metric text says 'incl. construction')
            headline_best = min(t_ink, t_pipe, t_p0, t_ref)
            # single-call host-side latency (includes dispatch transport)
            one = fused_fn(1e-6, 100)
            disp = wall_time(one, S.blocks,
                             precond.build(S, "symmetric_stair").blocks, g,
                             jnp.zeros_like(g), warmup=3, reps=20)
            rows.append(("iiwa14 K=128 single-call host latency",
                         disp * 1e6, -1, True, float("nan")))

    # config 5: 256-system fleets, n=14, at K=128 and K=32 — the lane-packed
    # fused kernel (P systems jointly per grid step; at K=32 it also fills
    # the 75% of lanes a single solve wastes), preconditioner built
    # in-kernel per system. Baseline: the vmapped pure-XLA while-loop
    # solver with its Phi^-1 built inside the timed fn — the strongest
    # batched alternative a JAX user would write, measured to the same
    # build-included contract as the fused route (the honest S-nudged
    # chain makes per-solve builds visible on both sides).
    B, n = 256, 14
    for K_b in (128, 32):
        err(f"# running: batch K={K_b}")
        Sb, gb = trajopt.batch_systems(jax.random.PRNGKey(0), B, n, K_b)
        l0 = jnp.zeros_like(gb)

        # pipelined pays off on the lane-packed fused kernel at long K
        # (one sync point per iteration); short chains keep classic
        meth_b = "pipelined" if K_b >= 128 else "classic"

        def fused_batch(S, P, g, l):
            # the PUBLIC auto-routed batched API: with an in-kernel-built
            # preconditioner this routes lane-packed at every shape (the
            # build-honest crossover in tpcg/solver/api.py; the vmapped-
            # XLA route only wins wide-short fleets with a PREBUILT Pinv)
            import tpcg
            from tpcg.types import PCGConfig
            return tpcg.pcg_solve_batched(
                S, g, l, config=PCGConfig(
                    exit_tol=1e-6, max_iter=100,
                    preconditioner="symmetric_stair", method=meth_b))

        r_b = fused_batch(Sb.blocks, None, gb, l0)
        t_b = device_solve_time(fused_batch, Sb.blocks, Sb.blocks, gb, l0,
                                repeats=64, lo_repeats=8, reps=8)

        from tpcg.types import BlockTridiag as _BT
        xla_vm = jax.vmap(lambda s, p, g, l: jnp_backend.pcg_jnp(
            s, p, g, l, exit_tol=1e-6, max_iter=100))

        def xla_batch(S, P, g, l):
            Pb_ = precond.build(_BT(S), "symmetric_stair").blocks
            return xla_vm(S, Pb_, g, l)
        xb = xla_batch(Sb.blocks, None, gb, l0)
        t_xb = device_solve_time(xla_batch, Sb.blocks, Sb.blocks, gb, l0,
                                 repeats=64, lo_repeats=8, reps=8)
        rows.append((f"batch B={B} n=14 K={K_b} auto-routed {meth_b} "
                     "(per-system)",
                     t_b * 1e6 / B, int(np.asarray(r_b.iters).max()),
                     bool(np.asarray(r_b.converged).all()),
                     t_xb * 1e6 / B))

    # config 6 (round 3, VERDICT r2 item 6): the metric the reference's
    # downstream consumer actually reports (MPCGPU per-control-step,
    # README.md:66-77) — µs per warm-started RTI NMPC control step at
    # iiwa14 scale: linearize full rigid-body dynamics (vmapped jacfwd) +
    # assemble the LQR-KKT Schur system + PCG-solve + recover the primal
    # step, everything device-resident across steps (tpcg/models/nmpc.py).
    err("# running: NMPC RTI control step (iiwa14 n=14, K=128)")
    from tpcg.models import nmpc
    from tpcg.models.rigid_body import manipulator_reach_problem
    from tpcg.types import PCGConfig as _Cfg
    p_n = manipulator_reach_problem(K=128, dt=0.01)
    # in-kernel symmetric_stair pipelined is the honest-timer winner for
    # the per-step contract (S changes every step, so stair_refined's
    # XLA-level build is paid per step): measured QP core 75 vs 187 us,
    # full step 549 vs 655 us (same session, /tmp-exp 2026-08; the
    # higher iteration count — 151 vs 105 — is cheaper than the build)
    cfg_n = _Cfg(exit_tol=1e-8, max_iter=200,
                 preconditioner="symmetric_stair", method="pipelined")
    sim = nmpc.simulate(p_n, p_n.x_init, n_steps=4, config=cfg_n)
    st = sim.state
    g_carrier = jnp.broadcast_to(st.X[0], st.X.shape)  # row 0 = x_measured

    # (a) the FULL control step: lane-major rigid-body linearize
    # (tpcg/models/rbd_lane.py — K-trailing layout, one forward-mode
    # pass for A/B/defects; 0.59 ms vs 9.8 ms for the round-2 two-pass
    # jacfwd route) + assemble + warm-started PCG + recovery. Measured
    # v5e, device-chained: ~1.9 ms/step total (was 13.7 ms in round 2);
    # the QP core of row (b) now dominates the step.
    qp_n, _ = nmpc.rti_setup(p_n, config=cfg_n)

    def step_fn(X_, U_, g_, l_):
        # the chain nudge rides g_: folding it into X defeats XLA
        # hoisting the (trajectory-dependent) linearization out of the
        # chained-timing loop; g_[0] is the measured state
        dx, du, res = qp_n(X_ + g_ * 1e-20, U_, g_[0], l_)
        return res

    r_s = step_fn(st.X, st.U, g_carrier, st.lam)
    t_s = device_solve_time(step_fn, st.X, st.U, g_carrier, st.lam,
                            repeats=128, lo_repeats=16, reps=5)
    rows.append(("NMPC RTI full step iiwa14 K=128 (incl. linearize)",
                 t_s * 1e6, int(r_s.iters), bool(r_s.converged),
                 float("nan")))

    # (b) the QP CORE at a fixed linearization: LQR-KKT assembly + Schur
    # system + warm-started PCG + primal recovery — fused vs pure-XLA
    from tpcg.models.sqp import _linearize, _qp_step
    A_n, B_n, F_n = jax.jit(lambda X, U: _linearize(p_n, X, U))(st.X, st.U)
    d_n = F_n - st.X[1:]
    for name, bk in (("fused sym_stair", "auto"), ("pure-XLA", "jnp")):
        core = jax.jit(lambda A_, B_, d_, l_, bk=bk: _qp_step(
            p_n, st.X, st.U, 1e-6, cfg_n, x_init=st.X[0], lam0=l_,
            backend=bk, _lin=(A_, B_, d_))[2])
        r_c2 = core(A_n, B_n, d_n, st.lam)
        t_c2 = device_solve_time(
            lambda A_, B_, d_, l_: core(A_, B_, d_, l_),
            A_n, B_n, d_n, st.lam, repeats=256, lo_repeats=32, reps=5)
        rows.append((f"NMPC QP core iiwa14 K=128 ({name})", t_c2 * 1e6,
                     int(r_c2.iters), bool(r_c2.converged), float("nan")))

    err(f"{'config':48s} {'fused_us':>10s} {'iters':>6s} {'conv':>5s} "
        f"{'xla_us':>10s}")
    for name, tf, it, cv, tx in rows:
        err(f"{name:48s} {tf:10.1f} {it:6d} {str(cv):>5s} {tx:10.1f}")

    print(json.dumps({
        "metric": "iiwa14 per-solve device time to 1e-6 (n=14, K=128, fp32, "
                  "preconditioner construction INCLUDED per solve — the "
                  "timing chain perturbs S so S-dependent work cannot be "
                  "loop-hoisted; best of in-kernel symmetric-stair "
                  "classic/pipelined(/replace0) and materialized "
                  "stair_refined fused Pallas kernels; baseline = pure-XLA "
                  "while_loop PCG on the same chip)",
        "value": round(headline_best * 1e6, 2),
        "unit": "us",
        "vs_baseline": round(headline_xla / headline_best, 3),
    }))


if __name__ == "__main__":
    main()
