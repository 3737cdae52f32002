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

Stall-proofing (this cost round 3 its bench artifact): the TPU relay
OCCASIONALLY STALLS OUTRIGHT mid-execution — an already-compiled chained
executable hangs 10+ minutes at ~0% CPU, and a killed-and-restarted run
sails past the same config (CLAUDE.md). So this file is an ORCHESTRATOR:
each config group runs in a child ``python bench.py --stage NAME``
subprocess with a hard timeout and retries (a fresh process clears the
stall), the headline group runs FIRST and its JSON line is printed to
stdout the moment it completes (detail groups only write stderr), and the
whole run respects a global self-budget (TPCG_BENCH_BUDGET seconds,
default 900) so the driver's outer timeout never kills us mid-flight.

A detail table for every BASELINE.md config goes to stderr.
"""

from __future__ import annotations

import functools
import json
import os
import subprocess
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))


def _enable_compile_cache():
    """Persistent compilation cache: the remote TPU compile helper costs
    ~20-40s per executable; caching makes bench reruns cheap."""
    import jax
    d = os.environ.get("TPCG_COMPILE_CACHE", os.path.join(HERE, ".jax_cache"))
    try:
        os.makedirs(d, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", d)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
    except Exception as e:  # cache is an optimization, never fatal
        print(f"# compile cache disabled: {e}", file=sys.stderr)


def err(*a):
    print(*a, file=sys.stderr, flush=True)


# --------------------------------------------------------------------------
# stage workers (run in child processes; each appends JSON rows to --out)
# --------------------------------------------------------------------------

def _worker_setup():
    _enable_compile_cache()
    import jax
    # x64 enabled up front in EVERY worker (matching the committed compile
    # cache's trace keys); fp32 configs build arrays with explicit dtypes
    # and every pallas_call is wrapped in enable_x64(False) internally.
    jax.config.update("jax_enable_x64", True)
    on_tpu = jax.default_backend() == "tpu"
    return jax, not on_tpu


def _emit(out, row):
    """Append one result row (dict) to the --out file, one JSON per line."""
    with open(out, "a") as f:
        f.write(json.dumps(row) + "\n")


def _run_config(out, name, S, gamma, pre, interp, tol=1e-6, mi=100,
                repeats=2048):
    # repeats sizes the chained-solve executable: short chains put only
    # ~1-5 ms of device work between the two-point samples, which the
    # relay's multi-minute ~30 ms dispatch phases can swamp — observed as
    # a bogus 2.5 us for a 30-iteration solve that really takes ~19 us.
    # 2048 dependent solves keep the slope signal above the phase noise.
    import jax.numpy as jnp
    from tpcg import precond
    from tpcg.solver import jnp_backend, pallas_backend
    from tpcg.utils.timing import device_solve_time

    err(f"# running: {name}")
    if pre == "identity":
        Pb = precond.identity(S).blocks
    else:
        Pb = precond.build(S, pre).blocks
    l0 = jnp.zeros_like(gamma)

    def fused(S_, P_, g_, l_):
        return pallas_backend.pcg_pallas(S_, P_, g_, l_, exit_tol=tol,
                                         max_iter=mi, interpret=interp)

    def xla(S_, P_, g_, l_):
        return jnp_backend.pcg_jnp(S_, P_, g_, l_, exit_tol=tol, max_iter=mi,
                                   identity_pinv=False)

    res = fused(S.blocks, Pb, gamma, l0)
    t_f = device_solve_time(fused, S.blocks, Pb, gamma, l0, repeats=repeats)
    t_x = device_solve_time(xla, S.blocks, Pb, gamma, l0, repeats=repeats)
    _emit(out, {"name": name, "us": t_f * 1e6, "iters": int(res.iters),
                "conv": bool(res.converged), "xla_us": t_x * 1e6})
    return t_f, t_x


def stage_headline(out, quick=False):
    """iiwa14 n=14 K=128 — the headline config, plus its variant rows and
    the pure-XLA baseline. Runs first; everything else is detail."""
    jax, interp = _worker_setup()
    import jax.numpy as jnp
    import tpcg
    from tpcg import precond
    from tpcg.models import trajopt
    from tpcg.solver import jnp_backend, pallas_backend
    from tpcg.types import BlockTridiag, PCGConfig
    from tpcg.utils.timing import device_solve_time, wall_time

    reps = 3 if quick else 7
    rpt = 512 if quick else 2048
    S, g = trajopt.iiwa14_scale(knot_points=128)
    l0 = jnp.zeros_like(g)
    Pb = precond.build(S, "symmetric_stair").blocks

    def xla_fn(S_, P_, g_, l_):
        return jnp_backend.pcg_jnp(S_, P_, g_, l_, exit_tol=1e-6,
                                   max_iter=100, identity_pinv=False)

    def make(method, pre="symmetric_stair", replace_every=None, mi=100):
        cfg = dict(exit_tol=1e-6, max_iter=mi, preconditioner=pre,
                   method=method)
        if replace_every is not None:
            cfg["replace_every"] = replace_every

        def f(S_, P_, g_, l_):
            return tpcg.pcg_solve(BlockTridiag(S_), g_, l_,
                                  config=PCGConfig(**cfg))
        return f

    # XLA baseline FIRST: it is the stable anchor (its chained calls run
    # ~260 ms of device work each, far above the transport's ~ms-scale
    # timing artifacts — measured 127.9/130.9/128.9 us across sessions),
    # and having t_x up front lets the headline summary row be emitted
    # INCREMENTALLY after every variant, so a relay stall mid-stage still
    # leaves a publishable (conservative) headline in the rows file.
    err("# running: iiwa14 K=128 XLA baseline")
    t_x = device_solve_time(xla_fn, S.blocks, Pb, g, l0, repeats=rpt,
                            reps=reps)
    _emit(out, {"name": "iiwa14 n=14 K=128 pure-XLA while_loop (baseline)",
                "us": t_x * 1e6, "iters": -1, "conv": True,
                "xla_us": t_x * 1e6})

    variants = [
        ("iiwa14 K=128 in-kernel build+solve", make("classic")),
        ("iiwa14 K=128 pipelined build+solve", make("pipelined")),
        ("iiwa14 K=128 pipelined replace0 build+solve",
         make("pipelined", replace_every=0)),
    ]
    if not quick:
        # MATERIALIZED refined-stair preconditioner (stair_refined L=1
        # band 3): fewer iterations (25 vs 35) but the XLA-level build is
        # ~30 us/solve — NOT a single-solve route; stays as the honest
        # record. (Round 3 note: an earlier "~free" build claim was a
        # timing-chain hoisting artifact; chain_solves now perturbs S too.)
        variants.append(("iiwa14 K=128 stair_refined build+solve",
                         make("pipelined", pre="stair_refined",
                              replace_every=0)))

    best = None
    best_f = None
    for name, f in variants:
        err(f"# running: {name}")
        r = f(S.blocks, None, g, l0)
        kw = (dict(repeats=min(rpt, 512), lo_repeats=64, reps=reps)
              if "stair_refined" in name else dict(repeats=rpt, reps=reps))
        t = device_solve_time(f, S.blocks, S.blocks, g, l0, **kw)
        _emit(out, {"name": name, "us": t * 1e6, "iters": int(r.iters),
                    "conv": bool(r.converged), "xla_us": float("nan")})
        if best is None or t < best:
            best, best_f, best_name = t, f, name
        _emit(out, {"headline_fused_s": best, "headline_xla_s": t_x})

    # PHASE-ARTIFACT-ROBUST re-measure of the winner. The transport
    # occasionally slips call timing by ~ms-scale CONSTANTS (observed:
    # the same replace0 config measured 4.4 / 7.6 / 11.0 us across runs
    # at short chains, while the 260 ms-per-call XLA baseline never
    # moves); a 2048-solve chain of a ~10 us kernel is only ~20 ms of
    # device work, so such a slip corrupts the two-point slope by
    # several us. Re-measure the winning variant with the chain sized to
    # >= ~100 ms per call, bounding the artifact below ~1 us/solve, and
    # publish THAT value whether it is faster or slower.
    # quantized to powers of two so the chained executable's trace key is
    # stable across runs (the compile cache stays warm)
    rpt2 = 4096
    while rpt2 * best < 0.1 and rpt2 < 32768:
        rpt2 *= 2
    kw2 = (dict(repeats=min(rpt2, 4096), lo_repeats=256, reps=reps)
           if "stair_refined" in best_name
           else dict(repeats=rpt2, lo_repeats=max(64, rpt2 // 8),
                     reps=reps))
    t2 = device_solve_time(best_f, S.blocks, S.blocks, g, l0, **kw2)
    err(f"# headline re-measure [{best_name}] at chain {rpt2}: "
        f"{best * 1e6:.2f} -> {t2 * 1e6:.2f} us")
    _emit(out, {"name": f"headline re-measure ({best_name.split()[-2]} "
                        f"chain {rpt2})",
                "us": t2 * 1e6, "iters": -1, "conv": True,
                "xla_us": float("nan")})
    _emit(out, {"headline_fused_s": t2, "headline_xla_s": t_x})

    # zero-sync bounded-latency mode (NOT headline-eligible: a fixed-budget
    # contract, not the adaptive-tolerance one)
    r_pipe = make("pipelined")(S.blocks, None, g, l0)
    budget_fp = int(r_pipe.iters) + 1
    f_fp = make("fixed_pipelined", mi=budget_fp)
    r_fp = f_fp(S.blocks, None, g, l0)
    t_fp = device_solve_time(f_fp, S.blocks, S.blocks, g, l0,
                             repeats=rpt, reps=reps)
    _emit(out, {"name": f"iiwa14 K=128 sym_stair fixed_pipelined@{budget_fp}",
                "us": t_fp * 1e6, "iters": int(r_fp.iters),
                "conv": bool(r_fp.converged), "xla_us": float("nan")})

    # single-call host-side latency (includes dispatch transport)
    def one(S_, P_, g_, l_):
        return pallas_backend.pcg_pallas(S_, P_, g_, l_, exit_tol=1e-6,
                                         max_iter=100, interpret=interp)
    disp = wall_time(one, S.blocks, Pb, g, l0, warmup=3, reps=10)
    _emit(out, {"name": "iiwa14 K=128 single-call host latency",
                "us": disp * 1e6, "iters": -1, "conv": True,
                "xla_us": float("nan")})


def stage_golden(out):
    """Bundled golden example: fp32 identity/stair + the fp64 story."""
    jax, interp = _worker_setup()
    import jax.numpy as jnp
    import numpy as np
    from tpcg import precond
    from tpcg.models import golden
    from tpcg.solver import jnp_backend, pallas_backend
    from tpcg.types import BlockTridiag
    from tpcg.utils.timing import device_solve_time

    S, g, _ = golden.system()
    _run_config(out, "golden n=2 K=3 identity", S, g, "identity", interp,
                mi=25)
    _run_config(out, "golden n=2 K=3 sym_stair", S, g, "symmetric_stair",
                interp, mi=25)

    # fp64 config (examples/pcg_solve_dp.cu shape). The fused kernel is
    # f32-native; fp64 runs the jnp/XLA backend on the TPU's emulated f64
    # path. f64 linalg.inv is unsupported by the TPU compiler, so the
    # symmetric-stair Phi^-1 is BUILT on the host CPU and shipped as an
    # explicit operand — the honest split of the fp64 story.
    err("# running: golden fp64")
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
    _emit(out, {"name": "golden n=2 K=3 fp64 sym_stair (jnp/XLA)",
                "us": t64 * 1e6, "iters": int(r64.iters),
                "conv": bool(r64.converged), "xla_us": float("nan")})

    # the compensated double-float kernel serves the same deep-tolerance
    # capability IN-KERNEL at f32 storage (fp64-grade iterates measured on
    # chip: 5.6e-14 relative at tol 1e-24, tests/test_tpu_hardware.py) —
    # same config, same tolerance, vs the emulated-f64 XLA fallback above
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
    _emit(out, {"name": "golden n=2 K=3 compensated-DF kernel (tol 1e-12)",
                "us": t_c * 1e6, "iters": int(r_c.iters),
                "conv": bool(r_c.converged), "xla_us": t64 * 1e6})


def stage_scale(out):
    """Quadrotor K=64 + iiwa14 K=32 / K=512 scale sweep."""
    jax, interp = _worker_setup()
    from tpcg.models import trajopt

    S, g = trajopt.quadrotor_scale(knot_points=64)
    _run_config(out, "quadrotor n=12 K=64 block_jacobi", S, g,
                "block_jacobi", interp)
    _run_config(out, "quadrotor n=12 K=64 sym_stair", S, g,
                "symmetric_stair", interp)
    for K in (32, 512):
        S, g = trajopt.iiwa14_scale(knot_points=K)
        _run_config(out, f"iiwa14 n=14 K={K} sym_stair", S, g,
                    "symmetric_stair", interp)


def stage_fleet(out, K_b):
    """256-system fleet at knot count K_b — the lane-packed fused kernel
    (P systems jointly per grid step), preconditioner built in-kernel per
    system. Baseline: the vmapped pure-XLA while-loop solver with its
    Phi^-1 built inside the timed fn — the strongest batched alternative a
    JAX user would write, measured to the same build-included contract."""
    jax, interp = _worker_setup()
    import jax.numpy as jnp
    import numpy as np
    import tpcg
    from tpcg import precond
    from tpcg.models import trajopt
    from tpcg.solver import jnp_backend
    from tpcg.types import BlockTridiag, PCGConfig
    from tpcg.utils.timing import device_solve_time

    B, n = 256, 14
    err(f"# running: batch K={K_b}")
    Sb, gb = trajopt.batch_systems(jax.random.PRNGKey(0), B, n, K_b)
    l0 = jnp.zeros_like(gb)
    # pipelined pays off on the lane-packed fused kernel at long K (one
    # sync point per iteration); short chains keep classic
    meth_b = "pipelined" if K_b >= 128 else "classic"

    def fused_batch(S, P, g, l):
        return tpcg.pcg_solve_batched(
            S, g, l, config=PCGConfig(
                exit_tol=1e-6, max_iter=100,
                preconditioner="symmetric_stair", method=meth_b))

    r_b = fused_batch(Sb.blocks, None, gb, l0)
    t_b = device_solve_time(fused_batch, Sb.blocks, Sb.blocks, gb, l0,
                            repeats=64, lo_repeats=8, reps=8)

    xla_vm = jax.vmap(lambda s, p, g, l: jnp_backend.pcg_jnp(
        s, p, g, l, exit_tol=1e-6, max_iter=100))

    def xla_batch(S, P, g, l):
        Pb_ = precond.build(BlockTridiag(S), "symmetric_stair").blocks
        return xla_vm(S, Pb_, g, l)
    xla_batch(Sb.blocks, None, gb, l0)
    t_xb = device_solve_time(xla_batch, Sb.blocks, Sb.blocks, gb, l0,
                             repeats=64, lo_repeats=8, reps=8)
    _emit(out, {"name": f"batch B={B} n=14 K={K_b} auto-routed {meth_b} "
                        "(per-system)",
                "us": t_b * 1e6 / B,
                "iters": int(np.asarray(r_b.iters).max()),
                "conv": bool(np.asarray(r_b.converged).all()),
                "xla_us": t_xb * 1e6 / B})


def _nmpc_setup():
    """Shared NMPC-stage setup: problem, config, and a 4-step warm state.

    The NMPC group is split into FOUR stages (step / heun / fleet / core)
    because the monolithic stage's ~12 large executables (full RTI-step
    graphs chained 128 deep) exceed any single per-stage timeout when the
    compile cache is cold — round 4's driver bench stalled through both
    attempts and recorded no NMPC rows. Each split stage compiles 2-4
    executables; compile progress persists across stages and retries via
    the cache, so the group converges even from cold."""
    jax, interp = _worker_setup()
    import jax.numpy as jnp
    from tpcg.models import nmpc
    from tpcg.models.rigid_body import manipulator_reach_problem
    from tpcg.types import PCGConfig

    p_n = manipulator_reach_problem(K=128, dt=0.01)
    # in-kernel symmetric_stair pipelined is the honest-timer winner for
    # the per-step contract (S changes every step, so stair_refined's
    # XLA-level build is paid per step)
    cfg_n = PCGConfig(exit_tol=1e-8, max_iter=200,
                      preconditioner="symmetric_stair", method="pipelined")
    sim = nmpc.simulate(p_n, p_n.x_init, n_steps=4, config=cfg_n)
    st = sim.state
    g_carrier = jnp.broadcast_to(st.X[0], st.X.shape)  # row 0 = x_measured
    return jax, jnp, nmpc, p_n, cfg_n, st, g_carrier


def stage_nmpc_step(out):
    """µs per warm-started RTI NMPC control step at iiwa14 scale — the
    metric the reference's downstream consumer actually reports (MPCGPU
    per-control-step, README.md:66-77): linearize full rigid-body dynamics
    + assemble the LQR-KKT Schur system + PCG-solve + recover the primal
    step, everything device-resident across steps (tpcg/models/nmpc.py)."""
    jax, jnp, nmpc, p_n, cfg_n, st, g_carrier = _nmpc_setup()
    from tpcg.utils.timing import device_solve_time

    err("# running: NMPC RTI control step (iiwa14 n=14, K=128)")
    # the FULL control step: lane-major rigid-body linearize
    # (tpcg/models/rbd_lane.py) + assemble + warm-started PCG + recovery
    qp_n, _ = nmpc.rti_setup(p_n, config=cfg_n)

    def step_fn(X_, U_, g_, l_):
        # the chain nudge rides g_: folding it into X defeats XLA hoisting
        # the (trajectory-dependent) linearization out of the chained-
        # timing loop; g_[0] is the measured state
        dx, du, res = qp_n(X_ + g_ * 1e-20, U_, g_[0], l_)
        return res

    r_s = step_fn(st.X, st.U, g_carrier, st.lam)
    t_s = device_solve_time(step_fn, st.X, st.U, g_carrier, st.lam,
                            repeats=128, lo_repeats=16, reps=5)
    _emit(out, {"name": "NMPC RTI full step iiwa14 K=128 (incl. linearize)",
                "us": t_s * 1e6, "iters": int(r_s.iters),
                "conv": bool(r_s.converged), "xla_us": float("nan")})


def stage_nmpc_heun(out):
    """The RTI step with Heun TANGENTS (jac_integrator="heun",
    tpcg/models/rbd_lane.py): the defect rollout stays exact RK4, A/B
    carry a ~3e-4 relative discretization error that the RTI loop
    absorbs (closed-loop trajectory within 1.4e-4 of the exact-Jacobian
    loop, scripts/exp_linearize.py) — the linearize-bound step's
    cheap-Jacobian contract. (Euler tangents measured as a dead end at
    this tolerance: the QP solve stops converging.)"""
    jax, jnp, nmpc, p_n, cfg_n, st, g_carrier = _nmpc_setup()
    from tpcg.models.rigid_body import manipulator_reach_problem
    from tpcg.utils.timing import device_solve_time

    err("# running: NMPC RTI control step, heun tangents")
    p_h = manipulator_reach_problem(K=128, dt=0.01, jac_integrator="heun")
    qp_h, _ = nmpc.rti_setup(p_h, config=cfg_n)

    def step_fn_h(X_, U_, g_, l_):
        dx, du, res = qp_h(X_ + g_ * 1e-20, U_, g_[0], l_)
        return res

    r_h = step_fn_h(st.X, st.U, g_carrier, st.lam)
    t_h = device_solve_time(step_fn_h, st.X, st.U, g_carrier, st.lam,
                            repeats=128, lo_repeats=16, reps=5)
    _emit(out, {"name": "NMPC RTI full step iiwa14 K=128 (heun tangents)",
                "us": t_h * 1e6, "iters": int(r_h.iters),
                "conv": bool(r_h.converged), "xla_us": float("nan")})


def stage_nmpc_fleet(out):
    """FLEET RTI: B robots advanced by ONE jointly-solved QP per control
    period (tpcg/models/nmpc.py rti_setup_fleet — vmapped lane-major
    linearize + assembly, the B Schur systems solved in the lane-packed
    batched kernel). Per-robot cost is the serving metric."""
    jax, interp = _worker_setup()
    import jax.numpy as jnp
    import numpy as _np
    from tpcg.models import nmpc
    from tpcg.models.rigid_body import manipulator_reach_problem
    from tpcg.types import PCGConfig
    from tpcg.utils.timing import device_solve_time

    err("# running: NMPC fleet RTI step")
    B_f = 8
    p_h = manipulator_reach_problem(K=128, dt=0.01, jac_integrator="heun")
    # each robot starts at a small perturbation of the problem's rest
    # state (the single-robot rows' warmup pattern — large random starts
    # with zero controls give infeasible trajectories whose QPs genuinely
    # need >200 iterations at tol 1e-8; measured, not a kernel issue)
    x0s = p_h.x_init + jnp.asarray(_np.random.default_rng(0).uniform(
        -0.05, 0.05, (B_f, 14)), jnp.float32)
    # heun tangents + tol 1e-6: the serving configuration (the single-
    # robot rows keep the tighter 1e-8 research contract; at 1e-8 an
    # unlucky robot's QP sits at the f32 eta floor past 200 iterations —
    # measured, trajectory-dependent — while every robot converges
    # comfortably at the MPC-realistic 1e-6)
    cfg_f = PCGConfig(exit_tol=1e-6, max_iter=200,
                      preconditioner="symmetric_stair", method="pipelined")
    simf = nmpc.simulate_fleet(p_h, x0s, n_steps=8, config=cfg_f)
    qp_f, _ = nmpc.rti_setup_fleet(p_h, config=cfg_f)
    Xf, Uf, lamf = simf.state.X, simf.state.U, simf.state.lam
    gf = jnp.broadcast_to(Xf[:, :1], Xf.shape)

    def step_fleet(X_, U_, g_, l_):
        dx, du, res = qp_f(X_ + g_ * 1e-20, U_, g_[:, 0], l_)
        return res._replace(iters=jnp.max(res.iters),
                            converged=jnp.min(res.converged),
                            eta=jnp.sum(res.eta))

    r_f = step_fleet(Xf, Uf, gf, lamf)
    t_f = device_solve_time(step_fleet, Xf, Uf, gf, lamf,
                            repeats=64, lo_repeats=8, reps=5)
    _emit(out, {"name": f"NMPC fleet RTI step B={B_f} iiwa14 K=128 "
                        "tol 1e-6 (per-robot)",
                "us": t_f * 1e6 / B_f, "iters": int(r_f.iters),
                "conv": bool(r_f.converged), "xla_us": float("nan")})


def stage_nmpc_lagged(out):
    """LAGGED-JACOBIAN RTI serving (tpcg/models/nmpc.py
    rti_setup_lagged): A/B refreshed every k-th control step and
    shifted/reused in between, the defect rollout exact every step. The
    reuse step costs rollout + QP core instead of linearize + QP core —
    the amortized serving trade for the linearize-bound step."""
    jax, jnp, nmpc, p_n, cfg_n, st, g_carrier = _nmpc_setup()
    from tpcg.models.rigid_body import manipulator_reach_problem
    from tpcg.types import PCGConfig, PCGResult
    from tpcg.utils.timing import device_solve_time

    err("# running: NMPC lagged-Jacobian RTI")
    # serving configuration: heun tangents for the (amortized) refresh
    p_h = manipulator_reach_problem(K=128, dt=0.01, jac_integrator="heun")
    lin, qp_reuse, _defect = nmpc.rti_setup_lagged(p_h, config=cfg_n)
    A0, B0 = lin(st.X, st.U)

    # (a) the REUSE step: exact defect rollout + assembly + warm PCG +
    # recovery with injected (stale) A/B. Nudges: A_ rides the chain's
    # S slot, X/x_measured ride g_, and B picks up the chain dependence
    # through a g_-derived inert eps so its Schur contributions
    # (B R^-1 B^T) cannot be loop-hoisted.
    def reuse_fn(A_, B_, g_, l_):
        eps = g_[0, 0] - g_carrier[0, 0]
        dx, du, res = qp_reuse(st.X + g_ * 1e-20, st.U, g_[0], l_,
                               A_, B_ + eps)
        return res

    r_r = reuse_fn(A0, B0, g_carrier, st.lam)
    t_r = device_solve_time(reuse_fn, A0, B0, g_carrier, st.lam,
                            repeats=128, lo_repeats=16, reps=5)
    _emit(out, {"name": "NMPC lagged-RTI REUSE step iiwa14 K=128 "
                        "(rollout+QP, stale A/B)",
                "us": t_r * 1e6, "iters": int(r_r.iters),
                "conv": bool(r_r.converged), "xla_us": float("nan")})

    # (b) the refresh pass alone (heun tangents), amortized over k steps
    def lin_fn(X_, _B, g_, l_):
        A, B = lin(X_ + g_ * 1e-20, st.U)
        return PCGResult(lam=l_ + 0.0 * g_, iters=jnp.int32(0),
                         converged=jnp.bool_(True),
                         eta=jnp.sum(A) + jnp.sum(B))

    lin_fn(st.X, B0, g_carrier, st.lam)
    t_l = device_solve_time(lin_fn, st.X, B0, g_carrier, st.lam,
                            repeats=128, lo_repeats=16, reps=5)
    _emit(out, {"name": "NMPC lagged-RTI refresh pass (heun linearize)",
                "us": t_l * 1e6, "iters": -1, "conv": True,
                "xla_us": float("nan")})
    for k in (2, 4):
        _emit(out, {"name": f"NMPC lagged-RTI amortized step k={k} "
                            "(reuse + refresh/k)",
                    "us": (t_r + t_l / k) * 1e6, "iters": int(r_r.iters),
                    "conv": bool(r_r.converged), "xla_us": float("nan")})

    # (c) reuse step with the PRECONDITIONER lagged too (lag_pinv=True):
    # stale banded stair_refined Phi^-1 from the refresh trajectory —
    # stronger spectrum on reuse steps at zero build cost (Pinv is
    # genuinely loop-invariant in serving, so it rides the chain
    # unperturbed by design)
    lin_p, qp_reuse_p, _d2 = nmpc.rti_setup_lagged(p_h, config=cfg_n,
                                                   lag_pinv=True)
    A1, B1, Pp = lin_p(st.X, st.U, st.X[0])

    def reuse_pinv_fn(A_, B_, g_, l_):
        eps = g_[0, 0] - g_carrier[0, 0]
        dx, du, res = qp_reuse_p(st.X + g_ * 1e-20, st.U, g_[0], l_,
                                 A_, B_ + eps, Pp)
        return res

    r_p = reuse_pinv_fn(A1, B1, g_carrier, st.lam)
    t_p = device_solve_time(reuse_pinv_fn, A1, B1, g_carrier, st.lam,
                            repeats=128, lo_repeats=16, reps=5)
    _emit(out, {"name": "NMPC lagged-RTI REUSE step, lagged "
                        "stair_refined Pinv",
                "us": t_p * 1e6, "iters": int(r_p.iters),
                "conv": bool(r_p.converged), "xla_us": float("nan")})

    # (d) the SERVING contract: tol 1e-6 (the fleet rows' tolerance) +
    # replace_every=0 (validated convergent at this QP's depth,
    # scripts/exp_replace0_qp.py) — the per-robot reuse-step cost a
    # deployment actually pays
    cfg_s = PCGConfig(exit_tol=1e-6, max_iter=200,
                      preconditioner="symmetric_stair",
                      method="pipelined", replace_every=0)
    lin_s, qp_reuse_s, _d3 = nmpc.rti_setup_lagged(p_h, config=cfg_s)

    def reuse_serving_fn(A_, B_, g_, l_):
        eps = g_[0, 0] - g_carrier[0, 0]
        dx, du, res = qp_reuse_s(st.X + g_ * 1e-20, st.U, g_[0], l_,
                                 A_, B_ + eps)
        return res

    r_s2 = reuse_serving_fn(A0, B0, g_carrier, st.lam)
    t_s2 = device_solve_time(reuse_serving_fn, A0, B0, g_carrier, st.lam,
                             repeats=128, lo_repeats=16, reps=5)
    _emit(out, {"name": "NMPC lagged-RTI REUSE step, serving contract "
                        "(tol 1e-6, replace0)",
                "us": t_s2 * 1e6, "iters": int(r_s2.iters),
                "conv": bool(r_s2.converged), "xla_us": float("nan")})


def stage_nmpc_core(out):
    """The QP CORE at a fixed linearization: LQR-KKT assembly + Schur
    system + warm-started PCG + primal recovery — fused vs pure-XLA."""
    jax, jnp, nmpc, p_n, cfg_n, st, g_carrier = _nmpc_setup()
    from tpcg.models.sqp import _linearize, _qp_step
    from tpcg.utils.timing import device_solve_time

    err("# running: NMPC QP core")
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
        _emit(out, {"name": f"NMPC QP core iiwa14 K=128 ({name})",
                    "us": t_c2 * 1e6, "iters": int(r_c2.iters),
                    "conv": bool(r_c2.converged), "xla_us": float("nan")})


STAGES = {
    "headline": stage_headline,
    "headline_quick": functools.partial(stage_headline, quick=True),
    "golden": stage_golden,
    "scale": stage_scale,
    "fleet128": functools.partial(stage_fleet, K_b=128),
    "fleet32": functools.partial(stage_fleet, K_b=32),
    "nmpc_step": stage_nmpc_step,
    "nmpc_heun": stage_nmpc_heun,
    "nmpc_fleet": stage_nmpc_fleet,
    "nmpc_core": stage_nmpc_core,
    "nmpc_lagged": stage_nmpc_lagged,
}


# --------------------------------------------------------------------------
# orchestrator (parent process)
# --------------------------------------------------------------------------

HEADLINE_METRIC = (
    "iiwa14 per-solve device time to 1e-6 (n=14, K=128, fp32, "
    "preconditioner construction INCLUDED per solve — the timing chain "
    "perturbs S so S-dependent work cannot be loop-hoisted; best of "
    "in-kernel symmetric-stair classic/pipelined(/replace0) and "
    "materialized stair_refined fused Pallas kernels; baseline = pure-XLA "
    "while_loop PCG on the same chip)")

QUICK_METRIC = (
    "iiwa14 per-solve device time to 1e-6 (n=14, K=128, fp32, "
    "preconditioner construction INCLUDED per solve — the timing chain "
    "perturbs S so S-dependent work cannot be loop-hoisted; QUICK fallback "
    "after relay stalls: shorter chains, best of in-kernel symmetric-stair "
    "classic/pipelined/replace0 only — stair_refined NOT measured; "
    "baseline = pure-XLA while_loop PCG on the same chip)")


def _run_stage(name, out, timeout, tries):
    """Run one stage in a child process; kill+retry on stall/timeout
    (observed: a killed-and-restarted process sails past a relay stall)."""
    for attempt in range(tries):
        t0 = time.monotonic()
        err(f"## stage {name} (attempt {attempt + 1}/{tries}, "
            f"timeout {timeout:.0f}s)")
        try:
            p = subprocess.run(
                [sys.executable, os.path.abspath(__file__),
                 "--stage", name, "--out", out],
                timeout=timeout, cwd=HERE)
            if p.returncode == 0:
                err(f"## stage {name} ok in {time.monotonic() - t0:.0f}s")
                return True
            err(f"## stage {name} rc={p.returncode}")
        except subprocess.TimeoutExpired:
            err(f"## stage {name} STALLED past {timeout:.0f}s — killed; "
                f"retrying in a fresh process")
    return False


def main():
    budget = float(os.environ.get("TPCG_BENCH_BUDGET", "900"))
    deadline = time.monotonic() + budget
    out = os.path.join(HERE, ".bench_rows.jsonl")
    try:
        os.remove(out)
    except FileNotFoundError:
        pass

    err(f"# tpcg bench orchestrator (budget {budget:.0f}s, "
        f"per-stage subprocess isolation)")

    # headline first — retried hard; a quick (shorter-chain) fallback if
    # the full stage keeps stalling. Its JSON line goes to stdout the
    # moment it exists, so a driver-side kill later loses only detail rows.
    ok = _run_stage("headline", out, timeout=min(300, budget * 0.5),
                    tries=3)
    used_quick = False
    if not ok:
        ok = _run_stage("headline_quick", out, timeout=180, tries=2)
        used_quick = ok

    headline = None
    if os.path.exists(out):
        with open(out) as f:
            for line in f:
                d = json.loads(line)
                if "headline_fused_s" in d:
                    headline = d

    if headline is not None:
        metric = HEADLINE_METRIC
        if used_quick:
            # the quick fallback skips the stair_refined variant — the
            # metric text must not overstate what was measured
            metric = QUICK_METRIC
        headline_json = json.dumps({
            "metric": metric,
            "value": round(headline["headline_fused_s"] * 1e6, 2),
            "unit": "us",
            "vs_baseline": round(headline["headline_xla_s"]
                                 / headline["headline_fused_s"], 3),
        })
    else:
        # every attempt stalled — emit an explicit failure record rather
        # than nothing (the driver records SOME line; value null is the
        # honest statement that the relay never let a measurement finish)
        headline_json = json.dumps({
            "metric": HEADLINE_METRIC, "value": None, "unit": "us",
            "vs_baseline": None,
            "error": "relay stalled through all headline attempts",
        })
    print(headline_json, flush=True)

    # detail stages, budget permitting, most valuable first (the NMPC
    # rows are the reference's downstream-consumer metric). The NMPC group
    # is four small stages so each fits a per-stage timeout even with a
    # cold compile cache (the round-4 monolithic stage never finished).
    # nmpc_core gets a longer leash: its pure-XLA chained executable is
    # the slowest single compile in the suite (observed >280 s cold, so a
    # fixed 280 s timeout can never converge — the same compile restarts
    # from scratch each retry and dies at the same point)
    stage_cap = {"nmpc_core": 420}
    for name in ("nmpc_step", "nmpc_heun", "nmpc_core", "fleet128",
                 "golden", "nmpc_lagged", "nmpc_fleet", "scale",
                 "fleet32"):
        left = deadline - time.monotonic()
        if left < 90:
            err(f"## budget exhausted — skipping {name} and beyond")
            break
        _run_stage(name, out, timeout=min(stage_cap.get(name, 280),
                                          left - 10), tries=2)

    # a stage that stalls mid-flight leaves its pre-stall rows behind and
    # re-appends them on the retry — dedupe by name, keeping the LAST
    # (freshest) measurement of each config
    by_name = {}
    if os.path.exists(out):
        with open(out) as f:
            for line in f:
                d = json.loads(line)
                if "name" in d:
                    by_name[d["name"]] = d
    err(f"{'config':52s} {'fused_us':>10s} {'iters':>6s} {'conv':>5s} "
        f"{'xla_us':>10s}")
    for d in by_name.values():
        err(f"{d['name']:52s} {d['us']:10.1f} {d['iters']:6d} "
            f"{str(d['conv']):>5s} {d['xla_us']:10.1f}")

    # Re-print the headline JSON as the chronologically LAST line of
    # output: the driver captures stdout+stderr merged and parses the
    # final line (round 4 printed the JSON mid-run and the driver recorded
    # parsed=null with the detail table as the tail). The early print
    # above still guards against a driver-side kill mid-detail-stages.
    print(headline_json, flush=True)


if __name__ == "__main__":
    if "--stage" in sys.argv:
        i = sys.argv.index("--stage")
        name = sys.argv[i + 1]
        j = sys.argv.index("--out")
        STAGES[name](sys.argv[j + 1])
    else:
        main()
